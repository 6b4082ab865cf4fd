package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Skyline (Pareto frontier) operator: the maximal points under
  * componentwise dominance — q dominates p iff q ≥ p in BOTH
  * dimensions with at least one strict; exact ties survive (no
  * strict part). Börzsönyi et al., "The Skyline Operator", ICDE'01.
  *
  * Distributed two-phase plan: dominance is transitive, so a point
  * dominated within ANY subset is not on the global frontier —
  * phase 1 computes local frontiers inside arbitrary hash partitions
  * (each a per-partition sort, no global order), phase 2 re-runs the
  * same kernel over the (small) union of survivors in one partition.
  * The only data-sized operations are one aggregation and one
  * repartition; the global pass touches candidates only. The
  * window kernel is O(n log n) vs the oracle's naive quadratic
  * NOT EXISTS — the gate proves them equal.
  */
object Skyline {

  /** Frontier kernel within each group of `part`: a point (v1, v2) is
    * dominated iff a same-group point has strictly larger v1 with
    * v2 ≥ mine, or the same v1 with strictly larger v2. Computed from
    * one row per distinct v1 (group max of v2, running max over
    * strictly-greater v1), joined back — no self-join. */
  private def frontierWithin(df: DataFrame, part: Column): DataFrame = {
    val g = df.groupBy(part.as("p"), col("v1")).agg(max(col("v2")).as("gmax"))
    val w = Window.partitionBy(col("p")).orderBy(col("v1").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bounds = g.withColumn("strictmax", max(col("gmax")).over(w))
    df.withColumn("p", part)
      .join(bounds, Seq("p", "v1"))
      .filter(col("v2") === col("gmax") &&
        (col("strictmax").isNull || col("v2") > col("strictmax")))
      .drop("p", "gmax", "strictmax")
  }

  /** Generic two-phase skyline over (v1, v2)-named columns. */
  def skyline(df: DataFrame, partitions: Int = 32): DataFrame = {
    val local = frontierWithin(df, pmod(hash(col("v1"), col("v2")), lit(partitions)))
    frontierWithin(local, lit(0))
  }

  /** Customer value frontier: maximize (total spend, order count) —
    * no other customer is at least as good on both axes and strictly
    * better on one. Spend compares as DECIMAL (exact); the output
    * casts to double for the driver contract. */
  def customerFrontier(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val pts = o.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("v1"),
        count(lit(1)).as("v2"))
    skyline(pts)
      .select(col("o_custkey"), col("v1").cast("double").as("spend"),
        col("v2").as("n_orders"))
      .orderBy(col("o_custkey"))
  }
}
