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

  /** The pipeline's AUDIT view: classify every document by the FIRST
    * stage that would drop it — in [[clean]]'s stage order — and roll
    * up doc/token counts per reason. This is the funnel every
    * production corpus pipeline publishes next to the cleaned output
    * ("where did my 100 TB go"); because reasons are first-fail, the
    * counts partition the corpus exactly: Σ n_docs = |documents|, and
    * the `kept` row equals [[clean]]'s output cardinality by
    * construction. Same stage computations as [[clean]] (stats
    * projection, fingerprint canonical, LSH components), one extra
    * reason classification + a tiny reason-keyed aggregate. */
  def dropFunnel(spark: SparkSession, dir: String,
                 config: Config = Config()): DataFrame = {
    val d = Tables.loadSpread(spark, dir, "documents").cache()
    val norm = normalizeText(col("text"))
    val w = words(col("text"))
    val stats = d.select(Seq(
        col("doc_id"),
        md5(norm).as("fp"),
        size(w).cast("long").as("ws_tokens"),
        qualityExpr(col("text")).as("quality")) ++
        langScores(words(lower(col("text")))): _*)
      .select(col("doc_id"), col("fp"), detectLangFromScores.as("lang"),
        col("ws_tokens"), col("quality"))
    val canonical = stats.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
      .withColumnRenamed("fp", "cfp")
    val dupIds = Components.dropIds(
        Dedup.minhashLshFrom(Dedup.shingleRowsOf(d)).select(col("da"), col("db")))
      .select(col("id").as("doc_id"), lit(1).as("is_near_dup"))
    val reason = when(col("doc_id") =!= col("keep_id"), "1_exact_dup")
      .when(col("is_near_dup") === 1, "2_near_dup")
      .when(col("quality") < config.minQuality, "3_low_quality")
      .when(!col("lang").isin(config.langs: _*), "4_bad_lang")
      .otherwise("0_kept")
    stats
      .join(canonical, stats("fp") === col("cfp"))
      .join(dupIds, Seq("doc_id"), "left")
      .select(col("doc_id"), col("ws_tokens"), reason.as("reason"))
      .groupBy(col("reason"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ws_tokens")).as("tokens"))
      .orderBy(col("reason"))
  }

  /** The round-6 curation composition — the multimodal verdict a
    * pretraining data pipeline renders per document: structural
    * quality floor (q19's score), bigram-LM rarity cap (q99's
    * integer-exact perplexity analog), SemDeDup semantic near-dup
    * removal over the doc's EMBEDDING (q92 — a different modality
    * than [[clean]]'s lexical MinHash), and train-split membership
    * (q94's md5 nibble), aggregated per language. Each signal is the
    * gated operator reused verbatim; the joins are all id-keyed
    * (rarity LEFT — a sub-2-token doc has no bigrams and passes the
    * rarity cap by definition). */
  def curate(spark: SparkSession, dir: String,
             minQuality: Double = 0.6, maxRare: Long = 1L): DataFrame = {
    val d = Tables.loadSpread(spark, dir, "documents")
    val base = d.select(col("doc_id"), col("lang"),
      size(words(col("text"))).cast("long").as("toks"),
      qualityExpr(col("text")).as("quality"))
    val rar = TextAnalysis.bigramRarity(spark, dir)
      .select(col("doc_id"), col("n_rare"))
    val sdup = Vectors.semanticDedup(spark, dir)
      .select(col("vec_id").as("doc_id"), col("is_dup"))
    val kept = col("quality") >= minQuality &&
      coalesce(col("n_rare"), lit(0L)) <= maxRare &&
      col("is_dup") === 0L &&
      Sampling.hexBucket16(col("doc_id")) >= 2
    base.join(rar, Seq("doc_id"), "left")
      .join(sdup, Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        count(when(kept, 1)).as("n_kept"),
        coalesce(sum(when(kept, col("toks"))), lit(0L)).as("tokens_kept"))
      .orderBy(col("lang"))
  }
}
