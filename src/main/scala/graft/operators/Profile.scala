package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Table profiling (the engine-side of DESCRIBE/data-quality
  * dashboards): per column — null count, exact distinct count, min
  * and max — computed in ONE scan. All per-column aggregates live in
  * a single Aggregate node (Spark plans the N distinct counts with
  * one Expand), so profiling cost is one pass over the table however
  * many columns it has — never a scan per column.
  *
  * Values are rendered to strings with type-dispatched formatting
  * (numeric via DECIMAL(18,2), dates as ISO) so the output schema is
  * column-count-independent and engine-portable.
  */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    val per = df.schema.fields.map { f =>
      val c = col(f.name)
      val (mn, mx) = f.dataType match {
        case DoubleType | FloatType =>
          (min(c).cast(DecimalType(18, 2)).cast("string"),
            max(c).cast(DecimalType(18, 2)).cast("string"))
        case DateType =>
          (date_format(min(c), "yyyy-MM-dd"), date_format(max(c), "yyyy-MM-dd"))
        case TimestampType | TimestampNTZType =>
          (date_format(min(c), "yyyy-MM-dd HH:mm:ss"),
            date_format(max(c), "yyyy-MM-dd HH:mm:ss"))
        case _ => (min(c).cast("string"), max(c).cast("string"))
      }
      struct(lit(f.name).as("column"),
        sum(when(c.isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(c).as("n_distinct"),
        mn.as("min_v"), mx.as("max_v"))
    }
    df.agg(count(lit(1)).as("n_rows"), array(per.toSeq: _*).as("cols"))
      .select(col("n_rows"), explode(col("cols")).as("c"))
      .select(col("c.column").as("column"), col("n_rows"), col("c.n_null").as("n_null"),
        col("c.n_distinct").as("n_distinct"), col("c.min_v").as("min_v"),
        col("c.max_v").as("max_v"))
      .orderBy(col("column"))
  }

  def ordersProfile(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.load(spark, dir, "orders"))

  /** Declarative expectation suite over the orders table (the
    * Great-Expectations pattern): each rule reports its violation
    * count and a pass flag in ONE report frame — the contract a
    * pipeline asserts before publishing a table. Row-local rules
    * (not-null, accepted-values, range) fold into a single
    * conditional-sum aggregate over one scan; uniqueness is one
    * key-count aggregate; referential integrity one anti-join against
    * the (broadcastable) parent keys. Nothing scans the table more
    * than the three shapes require, however many rules are added. */
  def expectations(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    def viol(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
    val rowLocal = o.agg(
      count(lit(1)).as("n_rows"),
      viol(col("o_orderkey").isNull).as("v_notnull"),
      viol(!col("o_orderstatus").isin("F", "O", "P")).as("v_accepted"),
      viol(col("o_totalprice") <= 0).as("v_range"))
    val dupRows = o.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).agg(coalesce(sum(col("c")), lit(0L)).as("v"))
      .select(col("v"))
    val orphans = o.join(
        Tables.load(spark, dir, "customer").select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
    val rl = rowLocal.head()
    val nRows = rl.getAs[Long]("n_rows")
    def row(rule: String, v: Long): DataFrame = {
      import spark.implicits._
      Seq((rule, nRows, v, v == 0L)).toDF("rule", "n_rows", "n_violations", "passed")
    }
    // the two non-row-local counts are single scalars — collecting
    // them is metadata, not data movement
    row("not_null:o_orderkey", rl.getAs[Long]("v_notnull"))
      .unionByName(row("accepted_values:o_orderstatus", rl.getAs[Long]("v_accepted")))
      .unionByName(row("range:o_totalprice>0", rl.getAs[Long]("v_range")))
      .unionByName(row("unique:o_orderkey", dupRows.head().getLong(0)))
      .unionByName(row("fk:o_custkey->customer", orphans.head().getLong(0)))
      .orderBy(col("rule"))
  }
}
