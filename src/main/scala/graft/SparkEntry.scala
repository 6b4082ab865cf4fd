package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` has a matching DuckDB-SQL oracle in
  * `oracleSql` over the same parquet tables; column names and ordering
  * are aligned on both sides (the driver sorts columns by name and
  * hash-compares values).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggPricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_pricing"    -> Relational.aggPricing _,
    "q02_cleanse_filter" -> Relational.cleanseProject _,
    "q03_left_join_dims" -> Relational.leftJoinDims _,
  )

  /** DuckDB oracle SQL per query (driver substitutes table names onto
    * the same parquet files). */
  def oracleSql: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS pelanggan_count,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS amount_sum,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_cleanse_filter" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS tanggal,
        |  upper(o_orderpriority) AS priority,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS amount
        |FROM orders
        |WHERE o_orderstatus = 'F'
        |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        |ORDER BY o_orderkey""".stripMargin,
    "q03_left_join_dims" ->
      """SELECT r_name, n_name,
        |  count(*) AS pelanggan_count,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS amount_sum
        |FROM customer
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
  )
}
