package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** As-of (point-in-time) join — for each left row, the latest right
  * row with the same key and time ≤ the left row's time.
  *
  * Spark has no native ASOF JOIN; the idiomatic composition (SURVEY
  * preference (a) — no custom SparkPlan needed) is the union-tag-scan
  * trick: tag right rows 0 and left rows 1, union, and run one window
  * over (key) ordered by (time, tag) carrying the last non-null right
  * value forward; left rows then hold their as-of match. One shuffle
  * on the key, linear scan per key — the same plan a native as-of
  * operator would produce, and it never materializes the quadratic
  * (left × right-history) pairing a naive range join creates.
  *
  * Tie rule: a right row at exactly the left row's time matches
  * (inclusive ≥, like DuckDB's ASOF JOIN); multiple right rows at the
  * same (key, time) must be pre-deduplicated by the caller for a
  * deterministic result.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String, rightValue: String): DataFrame = {
    // the carried value is wrapped in a struct so a right row whose
    // value is NULL still counts as the latest match (ASOF semantics:
    // match the latest row, return its value even if NULL) — a bare
    // last(value, ignoreNulls) would skip past it to an older row
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_tag", lit(1))
      .withColumn("_r", lit(null).cast(s"struct<v:${right.schema(rightValue).dataType.sql}>"))
    val r = right.select(col(key), col(rightTime).as("_t"),
      lit(0).as("_tag"), struct(col(rightValue).as("v")).as("_r"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof_value", last(col("_r"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("_tag") === 1)
      .drop("_tag", "_r", "_t")
  }

  /** q33: each click event matched to the same user's latest view
    * value at-or-before it (both sides derived from `events`). */
  def clicksWithLastView(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts")) // dedupe exact-ts duplicates
      .agg(max(col("value")).as("view_value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    asofJoin(clicks, views, "user_id", "ts", "ts", "view_value")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        col("value"), col("asof_value"))
      .orderBy(col("event_id"))
  }
}
