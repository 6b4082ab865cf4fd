package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

/** End-to-end orchestration — the Spark driver-program replacement for
  * the reference's two Airflow DAGs (`a >> b >> c` linear task chains,
  * stage_csv_dims_to_pg.py:165, dag_datapelangan.py:250): sequential
  * stages in one driver run, per-stage reports instead of XCom, a
  * config object instead of the Airflow connection registry, and no
  * advisory locks (a single driver owns a run; writes are idempotent
  * dynamic-partition overwrites).
  */
object Pipeline {

  /** Logical-name → storage-path registry (replaces `pg_src`/`pg_dwh`
    * BaseHook connections, README.md:19-22). */
  case class Config(csvDir: String, dwhDir: String)

  case class Report(dims: Map[String, Long], daily: Daily.RunReport)

  /** Full run for one logical date `ds` (the `{{ ds }}` Airflow
    * parameter, dag_datapelangan.py:35-36). */
  def run(spark: SparkSession, conf: Config, ds: LocalDate): Report = {
    val dims = Dims.run(spark, conf.csvDir, conf.dwhDir)
    val daily = Daily.run(spark, conf.csvDir, conf.dwhDir, ds)
    Report(dims, daily)
  }

  /** Backfill a date range (the reference cannot: catchup=False and
    * append-only partitions; our partition overwrite makes replays
    * safe). */
  def backfill(spark: SparkSession, conf: Config, from: LocalDate, to: LocalDate): Seq[Report] =
    Iterator.iterate(from)(_.plusDays(1)).takeWhile(!_.isAfter(to))
      .map(ds => run(spark, conf, ds)).toSeq
}
