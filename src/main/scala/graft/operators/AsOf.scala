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

  /** `forward = true` flips the direction: for each left row, the
    * EARLIEST right row with time ≥ the left row's time (inclusive) —
    * the same single window scanned in reverse time order. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String, rightValue: String,
               forward: Boolean = false): DataFrame = {
    // temp columns get collision-free names (the caller may legitimately
    // own columns called _t/_tag/_r)
    def fresh(base: String): String = {
      var n = base
      while (left.columns.contains(n) || right.columns.contains(n)) n += "_"
      n
    }
    val tC = fresh("_t"); val tagC = fresh("_tag"); val rC = fresh("_r")
    // the carried value is wrapped in a struct so a right row whose
    // value is NULL still counts as the latest match (ASOF semantics:
    // match the latest row, return its value even if NULL) — a bare
    // last(value, ignoreNulls) would skip past it to an older row
    val l = left
      .withColumn(tC, col(leftTime))
      .withColumn(tagC, lit(1))
      .withColumn(rC, lit(null).cast(s"struct<v:${right.schema(rightValue).dataType.sql}>"))
    val r = right.select(col(key), col(rightTime).as(tC),
      lit(0).as(tagC), struct(col(rightValue).as("v")).as(rC))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val timeOrder = if (forward) col(tC).desc else col(tC).asc
    val w = Window.partitionBy(col(key)).orderBy(timeOrder, col(tagC))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      // NULL keys never match in SQL joins (and in DuckDB ASOF) — but
      // Window.partitionBy groups NULLs together, so mask them out
      .withColumn("asof_value",
        when(col(key).isNull, lit(null))
          .otherwise(last(col(rC), ignoreNulls = true).over(w).getField("v")))
      .filter(col(tagC) === 1)
      .drop(tagC, rC, tC)
  }

  /** q33: each click event matched to the same user's latest view
    * value at-or-before it (both sides derived from `events`). */
  def clicksWithLastView(spark: SparkSession, dir: String): DataFrame =
    clicksWithView(spark, dir, forward = false)

  /** q51: forward variant — each click matched to the same user's
    * EARLIEST view value at-or-after it. */
  def clicksWithNextView(spark: SparkSession, dir: String): DataFrame =
    clicksWithView(spark, dir, forward = true)

  private def clicksWithView(spark: SparkSession, dir: String, forward: Boolean): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts")) // dedupe exact-ts duplicates
      .agg(max(col("value")).as("view_value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    asofJoin(clicks, views, "user_id", "ts", "ts", "view_value", forward)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        col("value"), col("asof_value"))
      .orderBy(col("event_id"))
  }
}
