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
}
