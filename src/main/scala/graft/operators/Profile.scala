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

  /** One-row dataset datasheet ("data card") for the documents
    * corpus — the summary a dataset README publishes: sizes, language
    * mix, duplication and quality rates. Everything is integer-exact
    * (counts, integer sums, basis-point `div`s; the only float is the
    * per-row quality THRESHOLD compare, deterministic per document) —
    * so the card hash-gates like any other query. Two aggregates over
    * one corpus scan shape: a global roll-up and a fingerprint
    * distinct; both map-side combinable. */
  def dataCard(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.{normalizeText, qualityExpr, words}
    val d = graft.sources.Tables.loadSpread(spark, dir, "documents")
    val base = d.select(
      col("doc_id"),
      size(words(col("text"))).cast("long").as("toks"),
      length(col("text")).cast("long").as("chars"),
      col("lang"),
      (qualityExpr(col("text")) >= 0.5).cast("long").as("q_ok"),
      md5(normalizeText(col("text"))).as("fp"))
    val langCols = Seq("en", "de", "es", "fr", "zh").map(l =>
      sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"docs_$l"))
    val aggs = Seq(
      count(lit(1)).as("n_docs"),
      sum(col("toks")).as("n_tokens"),
      sum(col("chars")).as("n_chars"),
      countDistinct(col("fp")).as("n_distinct"),
      sum(col("q_ok")).as("n_quality_ok")) ++ langCols
    // the bp rates are 0 (not NULL / not an error) on an empty corpus
    base.agg(aggs.head, aggs.tail: _*)
      .select(col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(expr("(n_docs - n_distinct) * 10000 div n_docs"), lit(0L))
          .as("exact_dup_bp"),
        coalesce(expr("n_quality_ok * 10000 div n_docs"), lit(0L))
          .as("quality_ge50_bp"),
        coalesce(expr("n_tokens * 100 div n_docs"), lit(0L))
          .as("avg_doc_tokens_x100"),
        col("docs_en"), col("docs_de"), col("docs_es"), col("docs_fr"),
        col("docs_zh"))
  }
}
