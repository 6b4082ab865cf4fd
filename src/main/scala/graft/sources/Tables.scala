package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Table registry over the harness parquet layout (`TESTDATA.md`):
  * one parquet file per table under a scale-factor directory.
  *
  * Mirrors the reference's "connection registry" idea
  * (`/root/reference/dags/stage_csv_dims_to_pg.py:13-16`) as a config
  * object mapping logical table names → storage paths, instead of
  * Airflow connections. All reads are plain `spark.read.parquet`, so
  * Catalyst column pruning + predicate pushdown reach the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  /** Load + spread across all cores. Small single-file tables arrive
    * as ONE input split (one parquet row group), serializing any
    * compute-heavy per-row stage (regex, md5, shingling) onto a single
    * thread; an up-front round-robin repartition costs one tiny
    * shuffle and unlocks full parallelism. Use for compute-bound
    * pipelines over small-file tables — at real scale, scans have
    * natural splits and this becomes unnecessary (but stays cheap
    * relative to the downstream work it parallelizes). */
  def loadSpread(spark: SparkSession, dir: String, name: String): DataFrame =
    load(spark, dir, name).repartition(spark.sparkContext.defaultParallelism)

  /** Normalize `events.ts` to a proper `TimestampType` regardless of
    * the fixture's physical layout. The harness has shipped three over
    * time, and every event-time consumer (`unix_micros`, windowing,
    * range joins) requires `TimestampType`:
    *
    *   - TIMESTAMP(NANOS): with `spark.sql.legacy.parquet.nanosAsLong`
    *     the column arrives as long nanos → `timestamp_micros(ns/1000)`.
    *   - timestamp[us] without the UTC flag: Spark reads TIMESTAMP_NTZ
    *     → cast to TimestampType. The session TZ is pinned to UTC
    *     (GraftSession), so the wall-clock reinterpretation is exact.
    *   - timestamp[us] UTC: already TimestampType → pass through.
    *
    * Absorbing source-format drift at the scan (one choke point) rather
    * than in every consumer mirrors the reference's stage-then-cast
    * typing discipline (`stage_csv_dims_to_pg.py:79-98`). */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val e = load(spark, dir, "events")
    e.schema("ts").dataType match {
      case LongType         => e.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => e.withColumn("ts", col("ts").cast(TimestampType))
      case _                => e
    }
  }

  /** Register every table as a temp view so `spark.sql` queries match
    * the DuckDB oracle's table names 1:1. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") loadEvents(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

  /** Federated JDBC scan — the real analog of the reference's dblink
    * hop (`dag_datapelangan.py:172-186`): where the reference hand-
    * inlines `status='S' AND tanggal=ds` into the quoted remote query
    * text, here Catalyst pushes filters and column pruning into the
    * generated remote SQL automatically (`PushedFilters` on the scan).
    *
    * `table` may be a table name or a pushdown subquery
    * (`"(SELECT ... ) t"`). For parallel reads at scale pass the
    * standard partitioning options (partitionColumn/lowerBound/
    * upperBound/numPartitions) — each executor then issues its own
    * range-predicated remote query instead of one serial cursor. */
  def jdbc(spark: SparkSession, url: String, table: String,
           options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .load()

  /** All-string CSV reader reproducing the reference's text-typed
    * staging discipline (`stage_csv_dims_to_pg.py:79-98`): no schema
    * inference, types imposed later by explicit guarded casts
    * (SURVEY.md §1.3). */
  def csvAllString(spark: SparkSession, path: String, columns: Seq[String]): DataFrame = {
    val schema = StructType(columns.map(c => StructField(c, StringType, nullable = true)))
    spark.read.schema(schema).option("header", "true").csv(path)
  }
}
