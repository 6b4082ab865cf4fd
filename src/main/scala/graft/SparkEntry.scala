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
    "q04_union_agg"      -> Relational.unionAgg _,
    "q05_fanout_join"    -> Relational.fanoutJoin _,
    "q06_agg_tariff"     -> Relational.aggTariff _,
    "q07_norm_body"      -> Relational.normBodyQuery _,
    "q08_to_bool"        -> Relational.toBoolQuery _,
    "q09_date_dispatch"  -> Relational.dateDispatch _,
    "q10_merge_upsert"   -> Relational.mergeUpsert _,
    "q11_audit_counts"   -> Relational.auditCounts _,
    "q12_window_topk"    -> Relational.windowTopK _,
    "q13_events_window"  -> Relational.eventsWindow _,
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
    "q04_union_agg" ->
      """WITH u AS (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS period, l_returnflag AS kind,
        |         CAST(l_extendedprice AS DECIMAL(18,2)) AS amount FROM lineitem
        |  UNION ALL
        |  SELECT strftime(o_orderdate, '%Y-%m') AS period, o_orderstatus AS kind,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS amount FROM orders)
        |SELECT period, kind, count(*) AS pelanggan_count,
        |       CAST(sum(amount) AS DOUBLE) AS amount_sum
        |FROM u GROUP BY period, kind ORDER BY period, kind""".stripMargin,
    "q05_fanout_join" ->
      """WITH dim AS (SELECT DISTINCT l_partkey AS d_partkey, l_suppkey AS d_suppkey FROM lineitem),
        |facts AS (
        |  SELECT l_partkey, l_orderkey, CAST(l_extendedprice AS DECIMAL(18,2)) AS amount
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-03-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1997-03-08')
        |SELECT s_nationkey, count(*) AS pelanggan_count,
        |       CAST(sum(amount) AS DOUBLE) AS amount_sum
        |FROM facts
        |JOIN dim ON l_partkey = d_partkey
        |LEFT JOIN supplier ON d_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey NULLS FIRST""".stripMargin,
    "q06_agg_tariff" ->
      """SELECT CAST(l_quantity AS INT) AS tarif, l_linestatus = 'O' AS gate_in_boo,
        |       count(*) AS pelanggan_count
        |FROM lineitem GROUP BY 1, 2 ORDER BY tarif, gate_in_boo""".stripMargin,
    "q07_norm_body" ->
      """WITH n AS (SELECT
        |  CASE WHEN p_brand IS NULL OR trim(p_brand) = '' THEN NULL ELSE
        |    NULLIF(regexp_extract(upper(regexp_replace(p_brand, '[^A-Za-z0-9]', '', 'g')), '([A-Z]{3})', 1), '')
        |    || '-' ||
        |    lpad(NULLIF(regexp_extract(regexp_replace(p_brand, '[^A-Za-z0-9]', '', 'g'), '([0-9]{1,3})', 1), ''), 3, '0')
        |  END AS norm_brand,
        |  CASE WHEN p_name IS NULL OR trim(p_name) = '' THEN NULL ELSE
        |    NULLIF(regexp_extract(upper(regexp_replace(p_name, '[^A-Za-z0-9]', '', 'g')), '([A-Z]{3})', 1), '')
        |    || '-' ||
        |    lpad(NULLIF(regexp_extract(regexp_replace(p_name, '[^A-Za-z0-9]', '', 'g'), '([0-9]{1,3})', 1), ''), 3, '0')
        |  END AS norm_name
        |  FROM part)
        |SELECT norm_brand, norm_name, count(*) AS n FROM n
        |GROUP BY norm_brand, norm_name
        |ORDER BY norm_brand NULLS FIRST, norm_name NULLS FIRST""".stripMargin,
    "q08_to_bool" ->
      """WITH toks AS (SELECT
        |  CASE CAST(l_linenumber % 7 AS INT)
        |    WHEN 0 THEN 'TRUE' WHEN 1 THEN 'f' WHEN 2 THEN 'yes' WHEN 3 THEN ' '
        |    WHEN 4 THEN '0' WHEN 5 THEN 'garbage' WHEN 6 THEN 'Y' END AS tok
        |  FROM lineitem),
        |b AS (SELECT
        |  CASE
        |    WHEN upper(trim(coalesce(tok, ''))) IN ('TRUE','T','1','Y','YES') THEN TRUE
        |    WHEN upper(trim(coalesce(tok, ''))) IN ('FALSE','F','0','N','NO') THEN FALSE
        |    WHEN upper(trim(coalesce(tok, ''))) = '' THEN NULL
        |    ELSE TRY_CAST(tok AS BOOLEAN)
        |  END AS flag FROM toks)
        |SELECT flag, count(*) AS n FROM b GROUP BY flag ORDER BY flag NULLS FIRST""".stripMargin,
    "q09_date_dispatch" ->
      """WITH raw AS (SELECT o_orderkey % 3 AS fmt,
        |  CASE o_orderkey % 3
        |    WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
        |    WHEN 1 THEN strftime(o_orderdate, '%d/%m/%Y')
        |    ELSE strftime(o_orderdate, '%-m/%-d/%Y') END AS s
        |  FROM orders),
        |p AS (SELECT fmt,
        |  CASE
        |    WHEN regexp_matches(s, '^\d{4}-\d{2}-\d{2}$') THEN try_strptime(s, '%Y-%m-%d')
        |    WHEN regexp_matches(s, '^\d{2}/\d{2}/\d{4}$') THEN try_strptime(s, '%d/%m/%Y')
        |  END AS d FROM raw)
        |SELECT fmt, strftime(d, '%Y-%m') AS period, count(*) AS n
        |FROM p GROUP BY fmt, period ORDER BY fmt, period NULLS FIRST""".stripMargin,
    "q10_merge_upsert" ->
      """WITH existing AS (
        |  SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DECIMAL(18,2)) AS bal, 0 AS is_new FROM customer),
        |updates AS (
        |  SELECT c_custkey, 'UPGRADED' AS c_mktsegment,
        |         CAST(c_acctbal AS DECIMAL(18,2)) + CAST(100 AS DECIMAL(18,2)) AS bal, 1 AS is_new
        |  FROM customer WHERE c_mktsegment = 'BUILDING'),
        |merged AS (
        |  SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY is_new DESC) AS rn
        |  FROM (SELECT * FROM existing UNION ALL SELECT * FROM updates))
        |SELECT c_mktsegment, count(*) AS n, CAST(sum(bal) AS DOUBLE) AS bal_sum
        |FROM merged WHERE rn = 1
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q11_audit_counts" ->
      """SELECT
        |  (SELECT count(*) FROM lineitem) AS lineitem_rows,
        |  (SELECT count(*) FROM orders WHERE o_orderstatus = 'F') AS finished_orders,
        |  (SELECT count(*) FROM customer) AS customer_rows""".stripMargin,
    "q12_window_topk" ->
      """SELECT o_orderpriority, o_orderkey,
        |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS amount, rk
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_orderpriority
        |          ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey) AS rk
        |      FROM orders)
        |WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,
    "q13_events_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
  )
}
