package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.TextFunctions.normalizeText

/** Content-defined chunking (CDC) — the storage-dedup primitive
  * (rsync / LBFS / backup dedup): cut each document at positions
  * where a rolling window hash matches a boundary pattern, so chunk
  * boundaries survive insertions and deletions (unlike fixed-size
  * chunking, q64, where one inserted byte shifts every later chunk).
  * Identical passages in different documents then produce identical
  * chunks, and storing each distinct chunk once is the dedup saving.
  *
  * The boundary test is md5 of the [[WindowChars]]-char window
  * starting at the position, boundary when the first hex digit is '0'
  * (p = 1/16 → expected chunk ≈ 16 chars) — the same portable
  * md5-substring window the winnowing fingerprints use, so the DuckDB
  * oracle computes bit-identical boundaries. (A production build
  * would swap in a cheaper Rabin/Gear rolling hash; md5-per-position
  * keeps the cut points engine-portable for the gate, and the
  * asymptotics — O(len) windows per doc, map-only — are the same.)
  *
  * Canonical-occurrence accounting: every chunk occurrence except the
  * global keep-first one (min (doc_id, pos) per chunk hash — the
  * OrderedDedup discipline) is a saved copy. The report is per-doc:
  * chunk count, total bytes, duplicate-occurrence count, bytes saved.
  *
  * Scale shape: chunking is map-only (positions + window hashes per
  * doc, one per-doc window for the next-boundary lead); the only
  * shuffle is the chunk-hash group for canonical selection — keyed by
  * content hash, uniform by construction (a hash key can only be hot
  * if the same passage repeats corpus-wide, which is exactly the
  * boilerplate the q115/q167 caps handle upstream).
  */
object Cdc {

  /** Boundary-test window width in characters. */
  val WindowChars = 8

  /** Per-document CDC chunk rows: (doc_id, i, clen, chash). */
  def chunks(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id"), normalizeText(col("text")).as("norm"))
    // chunk start positions: 1, plus every i in [2, len-W+1] whose
    // window hash opens with hex '0'. The norm column is its own
    // projection (HOF free-variable hoist) and the sequence is
    // guarded against descending ranges on short docs.
    val starts = n.select(col("doc_id"), col("norm"), explode(
      when(length(col("norm")) >= WindowChars + 1,
        concat(array(lit(1)),
          filter(sequence(lit(2), length(col("norm")) - (WindowChars - 1)),
            i => md5(col("norm").substr(i, lit(WindowChars)))
              .startsWith("0"))))
        .otherwise(array(lit(1)))).as("i"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    starts
      .withColumn("nxt", lead(col("i"), 1).over(byDoc))
      .withColumn("clen", coalesce(col("nxt"), length(col("norm")) + 1) - col("i"))
      .withColumn("chash", md5(col("norm").substr(col("i"), col("clen"))))
      .select(col("doc_id"), col("i").cast("long").as("i"),
        col("clen").cast("long").as("clen"), col("chash"))
  }

  /** Per-doc dedup-savings report under global keep-first chunk
    * canonicalization. */
  def dedupSavings(spark: SparkSession, dir: String): DataFrame = {
    val byHash = Window.partitionBy(col("chash"))
      .orderBy(col("doc_id"), col("i"))
    chunks(spark, dir)
      .withColumn("rk", row_number().over(byHash))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("clen")).as("bytes_total"),
        sum(when(col("rk") > 1, 1L).otherwise(0L)).as("n_dupe_chunks"),
        sum(when(col("rk") > 1, col("clen")).otherwise(0L)).as("bytes_saved"))
      .select(col("doc_id"), col("n_chunks").cast("long").as("n_chunks"),
        col("bytes_total").cast("long").as("bytes_total"),
        col("n_dupe_chunks").cast("long").as("n_dupe_chunks"),
        col("bytes_saved").cast("long").as("bytes_saved"))
      .orderBy(col("doc_id"))
  }
}
