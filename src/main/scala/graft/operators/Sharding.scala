package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic training-order sharding: every document gets a
  * pseudo-random but reproducible (shard, position) — the "global
  * shuffle" step of LLM training-data prep, where the corpus must be
  * scattered into fixed shards whose internal order is stable across
  * reruns and engines.
  *
  * The shuffle key is md5 of the doc id (engine-portable, uniform),
  * the shard is the key's first 20 bits mod `shards`, and the
  * in-shard position is the rank of the key within the shard.
  *
  * Scale shape: a naive `row_number() OVER (PARTITION BY shard)`
  * puts an entire shard — corpus/shards rows — into ONE window
  * partition. Instead the rank is computed hierarchically, the same
  * trick as [[Packing.packByPrefix]]:
  *   1. a second-level bucket (next 2 hex chars → 256 buckets) splits
  *      each shard into 256 balanced slices;
  *   2. per-(shard, bucket) counts — tiny (shards×256 rows) — get
  *      cumulative start offsets from a per-shard window over ≤256
  *      rows;
  *   3. the corpus-sized window then partitions by (shard, bucket):
  *      shards×256 balanced partitions, each corpus/(shards·256) rows.
  * The in-shard ORDER key is the md5 suffix after the 5 shard chars,
  * so the bucket is a true prefix of the sort key and
  * offset + within-bucket rank equals the global in-shard rank
  * exactly (sorting by the FULL key would not decompose: within a
  * shard, chars 1-5 still vary and would dominate the order).
  */
object Sharding {

  /** (doc_id, shard, pos): deterministic shard assignment + 1-based
    * in-shard training order over the `documents` table. */
  def shardOrder(spark: SparkSession, dir: String, shards: Int = 16): DataFrame = {
    val d = Tables.loadSpread(spark, dir, "documents")
    val keyed = d.select(
      col("doc_id"),
      md5(concat(lit("s|"), col("doc_id").cast("string"))).as("skey"))
      .withColumn("shard",
        conv(substring(col("skey"), 1, 5), 16, 10).cast("long") % shards)
      // in-shard ORDER key = the md5 suffix AFTER the 5 shard chars:
      // the shard is a mod over chars 1-5, so keys within a shard share
      // no prefix there — ordering must start where the bucket can be a
      // true prefix of the sort key (chars 6-7), or offset+rank ≠ rank
      .withColumn("_okey", substring(col("skey"), 6, 27))
      .withColumn("_bucket", conv(substring(col("skey"), 6, 2), 16, 10).cast("long"))
    val counts = keyed.groupBy(col("shard"), col("_bucket"))
      .agg(count(lit(1)).as("_n"))
    // per-shard window over ≤256 bucket-count rows — bounded metadata
    val wB = Window.partitionBy(col("shard")).orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_n")).over(wB), lit(0L)))
      .select(col("shard"), col("_bucket"), col("_off"))
    // corpus-sized window partitioned by (shard, bucket): balanced
    val wIn = Window.partitionBy(col("shard"), col("_bucket"))
      .orderBy(col("_okey"), col("doc_id"))
    keyed.join(broadcast(offsets), Seq("shard", "_bucket"))
      .withColumn("pos", col("_off") + row_number().over(wIn).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }
}
