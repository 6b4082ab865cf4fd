package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Featurization operators for model-input pipelines: categorical
  * dictionary building (the StringIndexer pattern) and smoothed
  * target encoding — the two encodings a tabular training-data
  * export needs before a model ever sees the data.
  *
  * Scale posture: both operators reduce the fact table to one
  * category-keyed aggregate first; every later step (ranking,
  * smoothing) runs on the category dictionary, which is orders of
  * magnitude smaller than the corpus and broadcasts back for the
  * encode join. Nothing corpus-sized crosses a window.
  */
object Featurize {

  /** Frequency-ordered categorical dictionary over `column`:
    * index 0 = most frequent (ties: lexicographically smaller value
    * first) — the StringIndexer contract. Returns (category, n, idx).
    * The window runs over the DICTIONARY (distinct categories), not
    * the corpus; encoding a fact table is then one broadcast join
    * against this frame. */
  def stringIndexer(spark: SparkSession, dir: String,
                    table: String = "part",
                    column: String = "p_type"): DataFrame = {
    val freq = Tables.load(spark, dir, table)
      .groupBy(col(column).as("category"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("n").desc, col("category"))
    freq.select(col("category"), col("n"),
        (row_number().over(w) - 1).cast("long").as("idx"))
      .orderBy(col("idx"))
  }

  /** m-estimate target encoding of `o_orderpriority` against the
    * order price: enc = (Σ target + m·prior) / (n + m), with the
    * prior the global mean. All arithmetic in integer cents with
    * floor division, so the encoding is bit-identical on every
    * engine (the double encodings differ in summation order); the
    * final column converts to currency units once. Returns per
    * category: n, raw mean (floor cents), smoothed encoding. */
  def targetEncode(spark: SparkSession, dir: String, m: Int = 10): DataFrame = {
    val d182 = org.apache.spark.sql.types.DecimalType(18, 2)
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("category"),
        (col("o_totalprice").cast(d182) * 100).cast("long").as("cents"))
    val per = o.groupBy(col("category"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
    val g = o.agg(sum(col("cents")).as("gs"), count(lit(1)).as("gn"))
    per.crossJoin(broadcast(g))
      .select(col("category"), col("n"),
        expr("s div n").as("mean_cents"),
        expr(s"(s + $m * (gs div gn)) div (n + $m)").as("enc_cents"))
      .orderBy(col("category"))
  }
}
