package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables
import graft.functions.Normalize

/** The reference's relational operator surface (SURVEY.md §2), mapped
  * onto the harness star schema (TESTDATA.md). Analogy, per FIXTURES.md
  * §B: transactions→lineitem/orders, dimensions→customer/part/nation,
  * daily date filter→o_orderdate, aggregate sinks→date-keyed aggregates.
  *
  * Determinism discipline for oracle parity: every money double is cast
  * to DECIMAL(18,2) (all harness doubles are exact 2-dp) before
  * arithmetic, so sums are exact and engine-order-independent; final
  * aggregates are cast back to DOUBLE, which both engines derive
  * identically from the same exact decimal.
  */
object Relational {
  private val D182 = DecimalType(18, 2)
  private def dec(c: Column): Column = c.cast(D182)

  /** #17 `agg_by_card` analog — hash group-by with COUNT + SUM over the
    * fact table (dag_datapelangan.py:188-198). */
  def aggPricing(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("pelanggan_count"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("amount_sum"),
        sum((dec(col("l_extendedprice")) * (lit(1).cast(D182) - dec(col("l_discount"))))
          .cast(DecimalType(30, 4))).cast("double").as("revenue"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** #9/#12 typed cleansing projection + selection filter pushed to the
    * scan (dag_datapelangan.py:68-86, 174-185): project/cast/filter a
    * daily slice of the fact table. */
  def cleanseProject(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    o.filter(col("o_orderstatus") === "F" &&
        col("o_orderdate").cast("date") >= lit("1996-01-01") &&
        col("o_orderdate").cast("date") < lit("1997-01-01"))
      .select(
        col("o_orderkey"),
        // date output serialized as ISO string: canonicalizes identically
        // in every oracle-compare path (pandas date objects vs datetime64
        // vs duckdb DATE all stringify differently; strings don't)
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("tanggal"),
        upper(col("o_orderpriority")).as("priority"),
        dec(col("o_totalprice")).cast("double").as("amount"))
      .orderBy(col("o_orderkey"))
  }

  /** #15/#16 left-outer dim lookup chain (dag_datapelangan.py:211,
    * 220-221): customer → nation → region with NULL-preserving groups.
    * Small dims broadcast (nation=25, region=5 rows). */
  def leftJoinDims(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val n = broadcast(Tables.load(spark, dir, "nation"))
    val r = broadcast(Tables.load(spark, dir, "region"))
    c.join(n, c("c_nationkey") === n("n_nationkey"), "left")
      .join(r, n("n_regionkey") === r("r_regionkey"), "left")
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("pelanggan_count"),
        sum(dec(col("c_acctbal"))).cast("double").as("amount_sum"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }
}
