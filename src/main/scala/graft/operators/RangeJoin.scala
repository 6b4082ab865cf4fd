package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Range (interval) join — pairs of rows whose times fall within a
  * bounded window of each other. Spark plans a naive time-inequality
  * join as BroadcastNestedLoop (quadratic); the scalable form is
  * bucket-equi-join + exact filter: quantize time into window-sized
  * buckets, join each left row to right buckets {b, b+1} (covering
  * every candidate within one window length), then apply the exact
  * inequality. Join becomes a hash join on (key, bucket); work is
  * O(pairs within ±window), not O(n²) per key.
  */
object RangeJoin {
  val WindowSeconds = 300L

  /** q34: ordered same-user event pairs with 0 < t_b − t_a ≤ 5 min. */
  def eventPairsWithin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("us"))
    val winUs = WindowSeconds * 1000000L
    val left = e.select(col("user_id"), col("event_id").as("ea"), col("us").as("ua"))
      .withColumn("bucket", explode(array((col("ua") / winUs).cast("long"),
        (col("ua") / winUs).cast("long") + 1)))
    val right = e.select(col("user_id"), col("event_id").as("eb"), col("us").as("ub"))
      .withColumn("bucket", (col("ub") / winUs).cast("long"))
    left.join(right, Seq("user_id", "bucket"))
      .filter(col("ub") > col("ua") && col("ub") - col("ua") <= winUs)
      // no dedup needed: for any qualifying pair exactly one of the two
      // probed left buckets equals the right row's bucket
      .select(col("ea"), col("eb"), (col("ub") - col("ua")).as("gap_us"))
      .orderBy(col("ea"), col("eb"))
  }
}
