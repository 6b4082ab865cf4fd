package graft.sources

import java.io.IOException

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-committed versioned table ("Delta-lite") — the
  * reader-atomic complement to [[Sinks.atomicOverwrite]].
  *
  * `atomicOverwrite` is crash-safe but not reader-atomic: between its
  * two renames the live path briefly does not exist, so a concurrent
  * reader can fail transiently. This module removes that window with
  * the same commit protocol Delta/Iceberg use, at directory
  * granularity:
  *
  * {{{
  * table/
  *   v00000001/        immutable data version (parquet)
  *   v00000002/
  *   _CURRENT          manifest: single line naming the live version
  * }}}
  *
  * Commit = (1) write the FULL new version directory — the live
  * manifest is untouched, so readers are completely unaffected while
  * the (possibly hours-long, at 100 TB) write runs; (2) publish by
  * writing `_CURRENT.tmp` and renaming it onto `_CURRENT` with
  * `Options.Rename.OVERWRITE` — a single atomic metadata operation on
  * HDFS-like filesystems. A reader resolves the manifest once, then
  * reads an immutable directory: it can never observe a partial
  * version, and an in-flight commit or a writer crash at ANY step
  * leaves it on the previous complete snapshot. Old versions are
  * retained until [[vacuum]], so a long-running reader that resolved
  * the manifest before a commit still finishes against its snapshot
  * (time travel for free: `readVersion`).
  *
  * Concurrency contract: SINGLE WRITER (two concurrent committers can
  * both build vN+1 — last manifest rename wins and the loser's data
  * version leaks until vacuum), unlimited concurrent readers. A real
  * multi-writer table needs a compare-and-swap commit (Delta's
  * transaction log); this module deliberately stops at the
  * single-writer/many-reader point, which is what the reference's
  * truncate-reload and merge jobs need
  * (reference: stage_csv_dims_to_pg.py:125-140 — BEGIN; TRUNCATE;
  * COPY; COMMIT is exactly a reader-atomic whole-table swap).
  *
  * 100 TB posture: the commit cost is one manifest rename regardless of
  * data size; upserts rewrite the table (like the reference's reload)
  * — for partition-scoped deltas compose with
  * [[graft.etl.Dims.partitionScopedMerge]] inside a new version dir
  * instead of rewriting unchanged partitions.
  */
object Snapshots {

  private val Manifest = "_CURRENT"
  private val VersionRe = "^v(\\d{8})$".r

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Name of the live version (e.g. `v00000002`), if the table has at
    * least one published commit. */
  def currentVersion(spark: SparkSession, tableDir: String): Option[String] = {
    val fs = fsOf(spark, new Path(tableDir))
    val m = new Path(tableDir, Manifest)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      try {
        val line = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .nextOption().map(_.trim).getOrElse("")
        if (line.isEmpty) None else Some(line)
      } finally in.close()
    }
  }

  /** Read the live snapshot. Fails with a clear message when the table
    * has no published commit yet. */
  def read(spark: SparkSession, tableDir: String): DataFrame = {
    val v = currentVersion(spark, tableDir).getOrElse(
      throw new IOException(s"Snapshots.read: no committed version at $tableDir"))
    readVersion(spark, tableDir, v)
  }

  /** Read a specific immutable version (time travel / long-running
    * readers pinned to the snapshot they resolved). */
  def readVersion(spark: SparkSession, tableDir: String, version: String): DataFrame =
    spark.read.parquet(new Path(tableDir, version).toString)

  /** All published-or-orphaned version directory names, ascending. */
  private[graft] def listVersions(spark: SparkSession, tableDir: String): Seq[String] = {
    val dir = new Path(tableDir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n @ VersionRe(_) => n }
      .sorted
  }

  /** Publish `df` as the next version of the table: write the data
    * directory, then atomically swap the manifest. Returns the new
    * version name. Readers of the previous version are never
    * disturbed. */
  def commitOverwrite(spark: SparkSession, tableDir: String, df: DataFrame): String = {
    val dir = new Path(tableDir)
    val fs = fsOf(spark, dir)
    fs.mkdirs(dir)
    val next = listVersions(spark, tableDir)
      .lastOption.map { case VersionRe(n) => n.toInt + 1 }.getOrElse(1)
    val vName = f"v$next%08d"
    val vPath = new Path(dir, vName)
    // a crashed previous attempt may have left a partial dir with this
    // number (it was never published — the manifest still names the old
    // version), so Overwrite here is safe and self-cleaning
    df.write.mode(SaveMode.Overwrite).parquet(vPath.toString)
    publish(spark, dir, vName)
    vName
  }

  /** Atomic manifest swap: write `_CURRENT.tmp`, rename-with-OVERWRITE
    * onto `_CURRENT`. FileContext.rename(OVERWRITE) is the one-step
    * atomic replace on HDFS; on the local filesystem it maps to
    * rename(2), equally atomic. */
  private def publish(spark: SparkSession, dir: Path, vName: String): Unit = {
    val fs = fsOf(spark, dir)
    val tmp = new Path(dir, Manifest + ".tmp")
    val out = fs.create(tmp, true)
    try out.write((vName + "\n").getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(dir.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new Path(dir, Manifest), Options.Rename.OVERWRITE)
  }

  /** Merge `delta` into the live snapshot by `key` (delta wins on key
    * collision, unmatched delta rows are inserts) and publish the
    * result as a new version. On an empty table the delta becomes v1.
    *
    * The anti-join keeps base rows whose key is absent from the delta;
    * with a small delta Catalyst broadcasts its key set, so the base
    * scan is map-only — one full-table write, zero full-table
    * shuffles. */
  def commitUpsert(spark: SparkSession, tableDir: String, delta: DataFrame,
                   key: String): String =
    currentVersion(spark, tableDir) match {
      case None => commitOverwrite(spark, tableDir, delta)
      case Some(v) =>
        val base = readVersion(spark, tableDir, v)
        val merged = base.join(delta.select(col(key)).distinct(), Seq(key), "left_anti")
          .unionByName(delta)
        commitOverwrite(spark, tableDir, merged)
    }

  /** Drop all version directories except the newest `keep` AND the one
    * the manifest names (a reader pinned to the live version must
    * always survive). Returns the number of versions removed. Callers
    * choose a `keep` horizon longer than their longest reader. */
  def vacuum(spark: SparkSession, tableDir: String, keep: Int = 2): Int = {
    val fs = fsOf(spark, new Path(tableDir))
    val live = currentVersion(spark, tableDir)
    val versions = listVersions(spark, tableDir)
    val doomed = versions.dropRight(math.max(keep, 1)).filterNot(live.contains)
    doomed.foreach(v => fs.delete(new Path(new Path(tableDir), v), true))
    doomed.size
  }
}
