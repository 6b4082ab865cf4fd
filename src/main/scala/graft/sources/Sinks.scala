package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Write-side utilities for healthy table layout at scale.
  *
  * Two chronic 100 TB problems live on the write path: small-file
  * explosion (every shuffle partition becomes a file; a daily job with
  * 2000 reducers × 365 days = 730k files whose footers dominate
  * planning time) and unsorted row groups (parquet min/max stats span
  * the whole value range, so predicate pushdown prunes nothing).
  */
object Sinks {

  /** Write date-partitioned parquet, replacing exactly the partitions
    * present in `df` (dynamic overwrite — rerun-idempotent; see
    * etl.Daily). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  /** Write range-clustered parquet: one range exchange on `sortCols`
    * plus a local sort, so each output file covers a narrow,
    * near-disjoint value range — scans with a predicate on those
    * columns then skip whole files/row groups via parquet min/max
    * stats. (repartitionByRange + sortWithinPartitions, NOT a global
    * orderBy — same single exchange, no final merge.) */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String]): Unit =
    df.repartitionByRange(sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Compact a parquet directory to ~`targetMb` files: read, coalesce
    * to ceil(bytes/target) partitions (coalesce, not repartition — no
    * shuffle), rewrite atomically via a temp dir. */
  def compact(spark: SparkSession, path: String, targetMb: Int = 128): Long = {
    val hadoopPath = new Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hadoopPath).getLength
    val parts = math.max(1, math.ceil(bytes.toDouble / (targetMb.toLong << 20)).toInt)
    val tmp = new Path(hadoopPath.getParent, hadoopPath.getName + "._compacting")
    spark.read.parquet(path).coalesce(parts)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(hadoopPath, true)
    fs.rename(tmp, hadoopPath)
    parts.toLong
  }
}
