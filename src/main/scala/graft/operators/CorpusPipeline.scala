package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.TextFunctions._

/** End-to-end training-corpus cleaning — the composition the individual
  * operators exist for: exact dedup → MinHash near-dup removal →
  * quality floor → language allowlist, emitting the surviving corpus
  * with per-doc stats.
  *
  * Near-dup keep rule: connected components over the verified pairs
  * ([[Components.minLabel]]), keep the min doc_id per cluster — one
  * survivor per transitive near-dup cluster, the standard corpus-dedup
  * semantics (the earlier greedy drop-every-db rule both over- and
  * under-dropped inside transitive clusters).
  *
  * Every stage is a shuffle on a key (fingerprint / band signature /
  * node id) or a map-only projection — nothing quadratic, nothing
  * driver-side.
  */
object CorpusPipeline {

  case class Config(minQuality: Double = 0.5,
                    langs: Seq[String] = Seq("en", "de", "es", "fr", "zh"))

  def clean(spark: SparkSession, dir: String, config: Config = Config()): DataFrame = {
    // one corpus read shared by the stats projection and the MinHash
    // near-dup stage (at 100 TB the scan dominates; never read twice)
    val d = Tables.loadSpread(spark, dir, "documents").cache()
    val norm = normalizeText(col("text"))
    val w = words(col("text"))

    // cached: the exact-dedup stage self-joins stats (groupBy + join),
    // and without the cache the regex/md5/langScores projection — the
    // most compute-heavy map stage in the pipeline — runs twice
    val stats = d.select(Seq(
        col("doc_id"),
        md5(norm).as("fp"),
        size(w).cast("long").as("ws_tokens"),
        qualityExpr(col("text")).as("quality")) ++
        langScores(words(lower(col("text")))): _*)
      .select(col("doc_id"), col("fp"), detectLangFromScores.as("lang"),
        col("ws_tokens"), col("quality"))
      .cache()

    // 1. exact dedup: keep the canonical (min doc_id) per fingerprint
    val canonical = stats.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
      .withColumnRenamed("fp", "cfp") // disambiguate the self-derived join
    val exactKept = stats.join(canonical,
      stats("fp") === col("cfp") && stats("doc_id") === col("keep_id"))
      .select(stats("doc_id"), stats("fp"), col("lang"), col("ws_tokens"), col("quality"))

    // 2. near-dup removal: union-find over verified pairs, keep the
    // min doc_id per connected cluster
    val dupIds = Components.dropIds(
        Dedup.minhashLshFrom(Dedup.shingleRowsOf(d)).select(col("da"), col("db")))
      .select(col("id").as("doc_id"))
    val deduped = exactKept.join(dupIds, Seq("doc_id"), "left_anti")

    // 3-4. quality floor + language allowlist
    deduped
      .filter(col("quality") >= config.minQuality)
      .filter(col("lang").isin(config.langs: _*))
      .orderBy(col("doc_id"))
  }
}
