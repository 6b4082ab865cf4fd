package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — the shuffle-elimination path for repeated
  * large-to-large joins/aggregations on a stable key (the 100 TB
  * answer when neither side broadcasts): write both sides bucketed by
  * the join key into the session catalog; Spark then plans a
  * SortMergeJoin with **no Exchange** on either side.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table) // managed: under spark.sql.warehouse.dir

  /** Join two bucketed tables on their bucket key — shuffle-free when
    * both were bucketed with the same count on `key`. */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
