package graft.sources

import java.io.IOException

import org.apache.hadoop.fs.{FileAlreadyExistsException, FileContext, FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A concurrent commit attempt won a version number this writer's
  * read-modify-write commit was based on. The merge must be re-run
  * against the new live snapshot — retrying with the next number would
  * silently drop the other writer's rows (a lost update). */
class ConcurrentSnapshotCommitException(msg: String) extends IOException(msg)

/** A CHECK constraint rejected rows a commit tried to publish; nothing
  * was published (the written data dir is an orphan vacuum reclaims). */
class CheckConstraintViolationException(msg: String) extends IOException(msg)

/** An OCC auto-rebase found a REAL data conflict: the concurrent winner
  * changed partitions (or rows of this merge's keys) that this commit
  * also reads or writes, so replaying the delta against the new base
  * would not be serializable. The caller must re-derive its delta from
  * the live snapshot. Distinct from its parent, which only signals a
  * version-number race that [[Snapshots.commitMergePartitionedOcc]]
  * resolves automatically when the write sets are disjoint. */
class SnapshotWriteConflictException(msg: String)
  extends ConcurrentSnapshotCommitException(msg)

/** Manifest-committed versioned table ("Delta-lite") — the
  * reader-atomic, multi-writer-safe complement to
  * [[Sinks.atomicOverwrite]].
  *
  * Layout:
  * {{{
  * table/
  *   d-1a2b3c4d5e6f/          immutable data dirs (parquet; partition-
  *   d-0f9e8d7c6b5a/part=F/   scoped commits hold only touched parts)
  *   _commits/
  *     v00000001              one manifest FILE per version (see below)
  *     v00000002
  * }}}
  *
  * A manifest names the data dir(s) a version reads, plus metadata:
  *   - `schema=<StructType json>` — the version's declared read
  *     contract (column order/types; missing-in-file columns read as
  *     typed NULLs → add-column evolution without rewrites)
  *   - whole-table version:  `dir=d-1a2b3c4d5e6f`
  *   - partitioned version:  `partcol=o_orderstatus` then one
  *     `part:F=d-...` line per live partition value (value stored
  *     Hive-escaped, split on the LAST '='), each naming the data dir
  *     that OWNS that partition's files. A partition-scoped commit
  *     writes ONLY the touched partitions into a new data dir and
  *     re-points just those lines — untouched partitions keep
  *     referencing their existing files, so commit cost scales with
  *     the delta, not the table (the daily single-partition pattern:
  *     reference dags/dag_datapelangan.py:188-234).
  *   - `stat:<col>|<min>|<max>|<relPath>` — per-file numeric ranges
  *     (the data-skipping index, [[readVersionPrunedMulti]]); merge
  *     commits carry entries for still-referenced files forward
  *     verbatim and stat-scan only the new dir.
  *   - `dvkey=<col>` + `dv:<dvDir>|<targetDir>` — deletion vectors
  *     ([[commitDeleteVector]]): keys in `dvDir`'s parquet are
  *     anti-joined out of rows read from `targetDir`. Dir-scoped so a
  *     re-inserted key (which lands in a new dir) is never masked;
  *     rewrites carry entries forward while their target dir is still
  *     referenced; [[compact]] materializes and clears them.
  *
  * Commit protocol (the Delta/Iceberg optimistic-concurrency scheme at
  * file granularity): (1) write the new data dir under a fresh unique
  * name — readers are completely unaffected while the (possibly
  * hours-long, at 100 TB) write runs, because nothing references it;
  * (2) CLAIM the next version number by renaming a tmp manifest to
  * `_commits/vN` WITHOUT overwrite — a create-exclusive atomic
  * metadata operation on HDFS-like filesystems, so exactly one of two
  * concurrent committers can win any given number. The manifest rename
  * is the single commit point: a writer crash at ANY earlier step
  * leaves only an unreferenced data dir (reclaimed by [[vacuum]]'s
  * orphan sweep), never a partial version.
  *
  * Concurrency contract:
  *   - readers: unlimited; a reader resolves the max `_commits` entry
  *     once and then reads immutable dirs — it can never observe a
  *     partial version, and [[vacuum]] retention keeps a long-running
  *     reader's pinned snapshot alive ([[readVersion]] = time travel).
  *   - [[commitOverwrite]]: multi-writer safe — the payload does not
  *     depend on the base, so a claim collision just retries with the
  *     next number; concurrent overwriters serialize, last number wins.
  *   - [[commitUpsert]] / [[commitMergePartitioned]] (read-modify-
  *     write): optimistic CAS — the claim targets exactly base+1; if
  *     another writer got there first the commit FAILS with
  *     [[ConcurrentSnapshotCommitException]] and the caller re-runs
  *     against the new live snapshot. Retrying the stale merge under
  *     the next number would be a lost update, so it is never silent.
  *     (The reference serialized writers with pg advisory locks —
  *     stage_csv_dims_to_pg.py:30; CAS gives the same safety without a
  *     lock service.)
  */
object Snapshots {

  private val CommitDir = "_commits"
  private val VersionRe = "^v(\\d{8})$".r
  private val DirLine = "dir="
  private val PartColLine = "partcol="
  private val PartLine = "part:"
  private val SchemaLine = "schema="
  private val StatLine = "stat:"
  private val DvKeyLine = "dvkey="
  private val DvLine = "dv:"
  private val StatColRe = "^[A-Za-z_][A-Za-z0-9_]*$".r
  private val ChecksFile = "_checks"

  /** Virtual stats-column name: when included in a commit's
    * `statsCols`, every data file's ROW COUNT is recorded as a stat
    * line (min = max = count) — Delta-style add-file counts. Carried
    * forward and recomputed by exactly the same rules as the min/max
    * skipping index, and read back by [[metadataRowCounts]] without
    * touching any data file. */
  val RowCountCol = "_rows"

  /** Virtual stats-column PREFIX: `bitmap:<col>` in a commit's
    * `statsCols` records a per-file 4096-bit MEMBERSHIP BITMAP of
    * `<col>` (the native [[graft.plans.BitmapRegisters]] aggregate,
    * bucket = first 12 md5 bits of the value's string form) as a stat
    * line — the Delta-bloom-filter-index analogue. min/max skipping
    * needs the key CLUSTERED per file; the bitmap skips point lookups
    * under ANY layout (hash-distributed included): a file whose
    * bitmap bit for the probed key's bucket is 0 provably lacks the
    * key (no false negatives), so [[readVersionKeyPruned]] opens only
    * bit-hit files. ~1 KB of manifest per file per indexed column;
    * false-positive rate = bitmap fill ratio (n_keys/file vs 4096) —
    * size files accordingly, exactly like sizing a real bloom. */
  val BitmapStatPrefix = "bitmap:"

  /** The aggregate's bucket for a key: first 12 bits of md5 over the
    * UTF-8 string form — MUST mirror BitmapRegisters.update. */
  private[graft] def bitmapBucketOf(key: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xff) << 4) | ((d(1) & 0xff) >>> 4)
  }

  /** 4096-bit bitmap → 1024 hex chars; nibble b>>2 holds bit b&3. */
  private def bitmapHexOf(buckets: Seq[Int]): String = {
    val nibbles = new Array[Int](1024)
    buckets.foreach(b => nibbles(b >> 2) |= 1 << (b & 3))
    nibbles.map("0123456789abcdef".charAt).mkString
  }

  private def bitmapHas(hex: String, bucket: Int): Boolean = {
    val nib = bucket >> 2
    nib < hex.length &&
      (Character.digit(hex.charAt(nib), 16) & (1 << (bucket & 3))) != 0
  }

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def newDataDirName(): String =
    "d-" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  // ---------------------------------------------------------------- read

  /** Name of the live version (e.g. `v00000002`) = the highest claimed
    * commit, if the table has at least one published commit. */
  def currentVersion(spark: SparkSession, tableDir: String): Option[String] =
    listVersions(spark, tableDir).lastOption

  /** Number of DISTINCT data dirs the LIVE manifest references — the
    * fragmentation probe that tells maintenance whether [[compact]]
    * (a full live-set rewrite) would buy anything: 0 = no commit yet,
    * 1 = already consolidated (compacting again is pure write
    * amplification), N = a chain of N per-commit dirs that one
    * compact collapses. O(one manifest read); touches no data file. */
  def liveDataDirCount(spark: SparkSession, tableDir: String): Int =
    currentVersion(spark, tableDir) match {
      case None => 0
      case Some(v) =>
        val m = readManifest(spark, tableDir, v)
        m.dataDir match {
          case Some(_) => 1
          case None => m.partitions.map(_._2).distinct.size
        }
    }

  /** All published version names, ascending (bounded by [[vacuum]]
    * retention). */
  private[graft] def listVersions(spark: SparkSession, tableDir: String): Seq[String] = {
    val dir = new Path(tableDir, CommitDir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(_.isFile)
      .map(_.getPath.getName)
      .collect { case n @ VersionRe(_) => n }
      .sorted
  }

  /** Read the live snapshot. Fails with a clear message when the table
    * has no published commit yet. */
  def read(spark: SparkSession, tableDir: String): DataFrame = {
    val v = currentVersion(spark, tableDir).getOrElse(
      throw new IOException(s"Snapshots.read: no committed version at $tableDir"))
    readVersion(spark, tableDir, v)
  }

  /** Read a specific retained version (time travel / long-running
    * readers pinned to the snapshot they resolved). */
  def readVersion(spark: SparkSession, tableDir: String, version: String): DataFrame = {
    val m = readManifest(spark, tableDir, version)
    val raw = m.dataDir match {
      case Some(dd) => applyDv(spark, new Path(tableDir), m, dd,
        spark.read.parquet(new Path(tableDir, dd).toString))
      case None =>
        // one read per owning data dir with basePath so the partition
        // column is inferred exactly as for a plain partitioned-parquet
        // read, then union by name
        readPartitionsSubset(spark, tableDir, m, m.partitions.map(_._1)).get
    }
    // conform to the manifest's declared schema: stable column order,
    // typed NULLs for columns that postdate a dir's files
    manifestSchema(m).map(alignTo(raw, _)).getOrElse(raw)
  }

  /** The latest version committed at or before `tsMillis` — the
    * `TIMESTAMP AS OF` analog. A version's commit instant is its
    * manifest file's modification time: the create-exclusive rename
    * that published it is the single atomic commit point, so the
    * file's mtime IS the publish time (set by the filesystem, not
    * the writer — consistent even across writers with skewed
    * clocks). */
  def versionAt(spark: SparkSession, tableDir: String, tsMillis: Long): Option[String] = {
    val commits = new Path(tableDir, CommitDir)
    val fs = fsOf(spark, commits)
    if (!fs.exists(commits)) None
    else fs.listStatus(commits).toSeq.filter(_.isFile)
      .collect { case st if VersionRe.matches(st.getPath.getName) &&
          st.getModificationTime <= tsMillis => st.getPath.getName }
      .sorted.lastOption
  }

  /** Time travel by timestamp: read the snapshot as of `tsMillis`.
    * Fails loudly when no version existed yet (or the ones that did
    * were vacuumed — retention bounds how far back this reaches). */
  def readAsOf(spark: SparkSession, tableDir: String, tsMillis: Long): DataFrame =
    readVersion(spark, tableDir, versionAt(spark, tableDir, tsMillis).getOrElse(
      throw new IOException(
        s"Snapshots.readAsOf: no version of $tableDir committed at or before " +
          s"$tsMillis (earliest retained: ${listVersions(spark, tableDir).headOption
            .getOrElse("none")})")))

  /** DESCRIBE HISTORY analog: one row per retained version with its
    * commit instant (manifest mtime — the atomic claim), layout kind,
    * partition / data-dir / deletion-vector counts and the declared
    * schema's column count. Pure manifest metadata — no data files
    * are opened. */
  def history(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    val commits = new Path(tableDir, CommitDir)
    val fs = fsOf(spark, commits)
    listVersions(spark, tableDir).map { v =>
      val m = readManifest(spark, tableDir, v)
      val mtime = fs.getFileStatus(new Path(commits, v)).getModificationTime
      (v, new java.sql.Timestamp(mtime),
        if (m.dataDir.isDefined) "whole-table" else s"partitioned:${m.partCol}",
        m.partitions.size.toLong,
        (m.dataDir.toSeq ++ m.partitions.map(_._2)).distinct.size.toLong,
        m.dvs.size.toLong,
        manifestSchema(m).map(_.fields.length.toLong).getOrElse(0L))
    }.toDF("version", "committed_at", "layout", "n_partitions",
      "n_data_dirs", "n_dvs", "n_columns")
  }

  /** Incremental change consumption: the CDF of everything committed
    * after `sinceVersion` up to the live version — `(liveVersion,
    * changes)`; the caller checkpoints the returned version and
    * passes it back next poll (the foreachBatch-style incremental
    * reader over the commit log). No new commits → `(sinceVersion,
    * None)`. Retention bounds how far back a lagging consumer can
    * resume — a vacuumed `sinceVersion` fails loudly in
    * [[readManifest]] rather than silently skipping changes. */
  def pollChanges(spark: SparkSession, tableDir: String, sinceVersion: String,
                  key: String): (String, Option[DataFrame]) = {
    val live = currentVersion(spark, tableDir).getOrElse(
      throw new IOException(s"Snapshots.pollChanges: no committed version at $tableDir"))
    if (versionNumber(live) <= versionNumber(sinceVersion)) (sinceVersion, None)
    else (live, Some(changeFeed(spark, tableDir, sinceVersion, live, key)))
  }

  // ------------------------------------------------------------ manifest

  /** Parsed manifest: either a whole-table data dir, or a partition
    * map (value → owning data dir) with its partition column; plus the
    * version's declared schema (JSON `StructType`). The schema is the
    * read contract: after an add-column evolution, untouched
    * partitions' files still lack the new column physically, and
    * readers reconcile by name against the manifest schema (missing →
    * typed NULL). Manifests from before schema tracking parse with
    * `schemaJson = None` and read exactly as they always did. */
  private[graft] case class Manifest(dataDir: Option[String], partCol: String,
                                     partitions: Seq[(String, String)],
                                     schemaJson: Option[String] = None,
                                     stats: Seq[FileStat] = Nil,
                                     dvKey: String = "",
                                     dvs: Seq[(String, String)] = Nil)

  /** Per-file column range, the Iceberg-style data-skipping index:
    * `relPath` is the data file's path relative to the table root
    * (`d-…/…parquet`); `min`/`max` are decimal strings (numeric
    * columns only — exact at any magnitude, unlike doubles). A file
    * with no stat entry for a column is always read (conservative). */
  private[graft] case class FileStat(col: String, min: String, max: String,
                                     relPath: String)

  private def manifestSchema(m: Manifest): Option[org.apache.spark.sql.types.StructType] =
    m.schemaJson.map(j => org.apache.spark.sql.types.DataType.fromJson(j)
      .asInstanceOf[org.apache.spark.sql.types.StructType])

  /** Conform `df` to the declared schema: columns selected in schema
    * order, cast to schema types, columns physically absent from the
    * files (pre-evolution dirs) materialized as typed NULLs. */
  private def alignTo(df: DataFrame,
                      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(schema.fields.map(f =>
      (if (have.contains(f.name)) col(f.name).cast(f.dataType)
       else lit(null).cast(f.dataType)).as(f.name)).toSeq: _*)
  }

  private[graft] def readManifest(spark: SparkSession, tableDir: String,
                                  version: String): Manifest = {
    val p = new Path(new Path(tableDir, CommitDir), version)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) throw new IOException(
      s"Snapshots: version $version of $tableDir is not retained " +
        s"(vacuumed or never committed); retained: " +
        listVersions(spark, tableDir).mkString(", "))
    val in = fs.open(p)
    val lines = try
      scala.io.Source.fromInputStream(in, "UTF-8").getLines().map(_.trim)
        .filter(_.nonEmpty).toList
    finally in.close()
    val dir = lines.collectFirst { case l if l.startsWith(DirLine) => l.stripPrefix(DirLine) }
    val partCol = lines.collectFirst {
      case l if l.startsWith(PartColLine) => l.stripPrefix(PartColLine) }.getOrElse("")
    // values are stored Hive-escaped; the split is on the LAST '=' as
    // defense in depth (data dir names are d-<12 hex>, never '=')
    val parts = lines.collect { case l if l.startsWith(PartLine) =>
      val body = l.stripPrefix(PartLine)
      val eq = body.lastIndexOf('=')
      require(eq > 0, s"Snapshots: malformed manifest line '$l' in $version")
      (org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(body.substring(0, eq)), body.substring(eq + 1))
    }
    val schema = lines.collectFirst {
      case l if l.startsWith(SchemaLine) => l.stripPrefix(SchemaLine) }
    val stats = lines.collect { case l if l.startsWith(StatLine) =>
      val body = l.stripPrefix(StatLine)
      val ps = body.split("\\|", 4)
      require(ps.length == 4, s"Snapshots: malformed stat line '$l' in $version")
      FileStat(ps(0), ps(1), ps(2), ps(3))
    }
    val dvKey = lines.collectFirst {
      case l if l.startsWith(DvKeyLine) => l.stripPrefix(DvKeyLine) }.getOrElse("")
    val dvs = lines.collect { case l if l.startsWith(DvLine) =>
      val body = l.stripPrefix(DvLine)
      val ps = body.split("\\|", 2)
      require(ps.length == 2, s"Snapshots: malformed dv line '$l' in $version")
      (ps(0), ps(1))
    }
    require(dir.isDefined || parts.nonEmpty,
      s"Snapshots: empty manifest $version at $tableDir")
    Manifest(dir, partCol, parts, schema, stats, dvKey, dvs)
  }

  private def manifestBody(m: Manifest): String = {
    // StructType.json is a single line; the schema line (when present)
    // leads so humans diffing manifests see the contract first
    val schemaLines = m.schemaJson.map(SchemaLine + _).toSeq
    // stat cols are validated identifiers and min/max plain decimals,
    // so '|' is a safe separator; relPath (which may contain anything
    // printable except newline) goes LAST and absorbs the remainder
    val statLines = m.stats.sortBy(s => (s.relPath, s.col)).map { s =>
      // plain identifier, or a virtual bitmap:<identifier> stat
      val ident =
        if (s.col.startsWith(BitmapStatPrefix)) s.col.stripPrefix(BitmapStatPrefix)
        else s.col
      require(StatColRe.findFirstIn(ident).isDefined,
        s"Snapshots: stats column name '${s.col}' is not a plain identifier")
      s"$StatLine${s.col}|${s.min}|${s.max}|${s.relPath}"
    }
    // deletion-vector lines: dir names are d-<12 hex> ('|'-free), so
    // the 2-field split is unambiguous
    val dvLines = (if (m.dvKey.nonEmpty) Seq(DvKeyLine + m.dvKey) else Nil) ++
      m.dvs.sorted.map { case (dvDir, target) => s"$DvLine$dvDir|$target" }
    require(m.dvs.isEmpty || m.dvKey.nonEmpty,
      "Snapshots: dv entries require a dvkey line")
    val body = m.dataDir match {
      case Some(dd) => schemaLines ++ ((DirLine + dd) +: statLines) ++ dvLines
      case None =>
        // partition values are stored Hive-escaped so '=', newlines and
        // other line-format-hostile characters round-trip; empty values
        // are refused here (one choke point every commit passes through)
        // because partitionBy writes them as the null-sentinel dir and
        // they could not round-trip anyway
        m.partitions.foreach { case (v, _) =>
          require(v != null && v.nonEmpty,
            "Snapshots: empty-string partition values are not supported " +
              "(partitionBy conflates them with NULL) — filter or default them first")
        }
        schemaLines ++ ((PartColLine + m.partCol) +: m.partitions.sorted.map {
          case (v, d) =>
            s"$PartLine${org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .escapePathName(v)}=$d" }) ++ statLines ++ dvLines
    }
    body.mkString("", "\n", "\n")
  }

  /** Partition dir name with Spark/Hive escaping, so values containing
    * path-special characters round-trip exactly like a native
    * `partitionBy` write. */
  private def partDirName(partCol: String, value: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .getPartitionPathString(partCol, value)

  // --------------------------------------------------------------- claim

  private def versionNumber(v: String): Int = v match {
    case VersionRe(n) => n.toInt
    case other => throw new IllegalArgumentException(s"not a version name: $other")
  }
  private def versionName(n: Int): String = f"v$n%08d"

  /** Serializes same-JVM claimants. HDFS rejects a rename onto an
    * existing file atomically server-side, but the LOCAL filesystem
    * maps it to rename(2), which silently REPLACES the target — two
    * in-process claimants of the same number could both "succeed".
    * The lock closes the in-process race; the read-back below closes
    * (to a narrow window) the cross-process one on local filesystems.
    * On HDFS neither is needed and both are cheap. */
  private val claimLock = new Object

  // ------------------------------------------------- CHECK constraints

  /** Table-level CHECK constraints (name → boolean SQL expression),
    * stored in `tableDir/_checks` (one `name|expr` line each; the name
    * is a validated identifier, the expr absorbs the line remainder —
    * same framing as manifest stat lines). */
  def checks(spark: SparkSession, tableDir: String): Seq[(String, String)] = {
    val p = new Path(tableDir, ChecksFile)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return Nil
    val in = fs.open(p)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toList finally in.close()
    lines.map { l =>
      val bar = l.indexOf('|')
      require(bar > 0, s"Snapshots: malformed check line '$l' in $tableDir/$ChecksFile")
      (l.substring(0, bar), l.substring(bar + 1))
    }
  }

  private def writeChecks(spark: SparkSession, tableDir: String,
                          cs: Seq[(String, String)]): Unit = {
    val p = new Path(tableDir, ChecksFile)
    val fs = fsOf(spark, p)
    val tmp = new Path(tableDir, s".tmp-checks-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(cs.map { case (n, e) => s"$n|$e" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    require(fs.rename(tmp, p), s"Snapshots: could not publish $ChecksFile")
  }

  /** Add (or replace) a CHECK constraint. Like Delta's ADD CONSTRAINT,
    * the CURRENT snapshot must already satisfy it — otherwise this
    * throws and the constraint is not installed. From then on every
    * commit validates the data dirs it newly references and refuses
    * loudly on violation; a NULL check result counts as a violation
    * (CHECK must evaluate to true). */
  def setCheck(spark: SparkSession, tableDir: String, name: String,
               checkExpr: String): Unit = {
    require(StatColRe.findFirstIn(name).isDefined,
      s"Snapshots: check name '$name' is not a plain identifier")
    require(!checkExpr.contains("\n") && !checkExpr.contains("\r"),
      "Snapshots: check expressions must be single-line")
    currentVersion(spark, tableDir).foreach { v =>
      val bad = readVersion(spark, tableDir, v)
        .filter(!coalesce(expr(checkExpr), lit(false))).limit(1).collect()
      if (bad.nonEmpty) throw new CheckConstraintViolationException(
        s"Snapshots: existing data of $tableDir violates CHECK $name " +
          s"($checkExpr); offending row: ${bad.head}")
    }
    writeChecks(spark, tableDir,
      checks(spark, tableDir).filterNot(_._1 == name) :+ (name -> checkExpr))
  }

  def dropCheck(spark: SparkSession, tableDir: String, name: String): Unit =
    writeChecks(spark, tableDir, checks(spark, tableDir).filterNot(_._1 == name))

  /** Commit-time enforcement, run before any claim: rows in data dirs
    * the PREVIOUS version does not already reference must satisfy
    * every installed check. Dirs carried forward (partition refs,
    * restore targets, DV key dirs) are exempt — constraints gate data
    * entering the table from now on, they never retroactively poison
    * time travel or restore. A violation throws before the manifest is
    * written, so nothing is published and the new dir is a plain
    * vacuum-reclaimable orphan (the crash contract). */
  private def validateChecks(spark: SparkSession, tableDir: String,
                             manifest: Manifest): Unit = {
    val cs = checks(spark, tableDir)
    if (cs.isEmpty) return
    // exempt dirs referenced by ANY retained version: they are table
    // history, not new data (this is what keeps restore legal); note
    // compaction writes a NEW dir, so compacting restored
    // pre-constraint data re-validates — drop the check first if that
    // is intended
    val prevDirs: Set[String] =
      listVersions(spark, tableDir).flatMap { v =>
        val pm = readManifest(spark, tableDir, v)
        pm.dataDir.toSeq ++ pm.partitions.map(_._2)
      }.toSet
    val newDirs = (manifest.dataDir.toSeq ++ manifest.partitions.map(_._2))
      .distinct.filterNot(prevDirs.contains)
    newDirs.foreach { dd =>
      val df = spark.read.parquet(new Path(tableDir, dd).toString)
      cs.foreach { case (name, ce) =>
        val bad = df.filter(!coalesce(expr(ce), lit(false))).limit(1).collect()
        if (bad.nonEmpty) throw new CheckConstraintViolationException(
          s"Snapshots: commit to $tableDir rejected by CHECK $name ($ce); " +
            s"offending row: ${bad.head}")
      }
    }
  }

  /** Atomically claim version number `n`: write a tmp manifest and
    * rename it to `_commits/vN` WITHOUT overwrite, then read the
    * target back and verify it carries OUR body (data dir names are
    * attempt-unique, so bodies distinguish claimants). Exactly one of
    * two concurrent claimants of the same number wins. Returns false
    * when the number was already taken. */
  private[graft] def tryClaim(spark: SparkSession, tableDir: String, n: Int,
                              manifest: Manifest): Boolean = claimLock.synchronized {
    validateChecks(spark, tableDir, manifest)
    val commits = new Path(tableDir, CommitDir)
    val fs = fsOf(spark, commits)
    fs.mkdirs(commits)
    val target = new Path(commits, versionName(n))
    if (fs.exists(target)) return false // cheap pre-check; the rename is the gate
    val tmp = new Path(commits, s".tmp-${java.util.UUID.randomUUID()}")
    val body = manifestBody(manifest)
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(commits.toUri,
      spark.sparkContext.hadoopConfiguration)
    val renamed =
      try { fc.rename(tmp, target); true }
      catch {
        case _: FileAlreadyExistsException | _: org.apache.hadoop.fs.PathExistsException =>
          false
        case _: IOException if fs.exists(target) => // HDFS rename-to-existing variants
          false
      } finally {
        // any failure path (including transient IOExceptions that
        // propagate) must not leak the tmp manifest forever; vacuum
        // additionally sweeps aged .tmp-* strays as a backstop
        if (fs.exists(tmp)) fs.delete(tmp, false)
      }
    renamed && {
      // full read-back (short reads are legal for InputStream.read on
      // HDFS-like filesystems; a winner that misreports as loser would
      // double-publish or spuriously fail an already-landed commit)
      val in = fs.open(target)
      val readBack = try {
        val buf = new java.io.ByteArrayOutputStream()
        val bytes = new Array[Byte](8192)
        var n = in.read(bytes)
        while (n >= 0) { buf.write(bytes, 0, n); n = in.read(bytes) }
        buf.toString("UTF-8")
      } finally in.close()
      readBack == body // lost a cross-process replace race → behave as loser
    }
  }

  // ------------------------------------------------------------- commits

  /** Publish `df` as the next whole-table version. Safe under
    * concurrent writers: the payload is base-independent, so a claim
    * collision retries with the next number until it wins. Returns the
    * claimed version name. */
  def commitOverwrite(spark: SparkSession, tableDir: String, df: DataFrame,
                      statsCols: Seq[String] = Nil): String = {
    val dir = new Path(tableDir)
    fsOf(spark, dir).mkdirs(dir)
    val dd = newDataDirName()
    df.write.mode(SaveMode.ErrorIfExists).parquet(new Path(dir, dd).toString)
    // keep maintaining whatever skipping index the table already tracks
    val prevCols = currentVersion(spark, tableDir)
      .map(v => readManifest(spark, tableDir, v)).map(effectiveStatsCols(statsCols, _))
      .getOrElse(statsCols)
    val stats = computeFileStats(spark, dir, dd, prevCols)
    val m = Manifest(Some(dd), "", Nil, Some(df.schema.json), stats)
    var n = listVersions(spark, tableDir).lastOption.map(versionNumber).getOrElse(0) + 1
    while (!tryClaim(spark, tableDir, n, m)) n += 1
    versionName(n)
  }

  /** Conform `delta` to a declared base schema for a merge commit:
    * every base column must be present (cast to its declared type);
    * EXTRA delta columns are the add-column schema evolution — they
    * ride along and base rows read as typed NULLs for them. Dropping
    * or renaming columns is refused loudly. */
  private def evolveDeltaTo(sch: org.apache.spark.sql.types.StructType,
                            delta: DataFrame): DataFrame = {
    val missing = sch.fields.map(_.name).filterNot(delta.columns.contains)
    require(missing.isEmpty,
      s"Snapshots: delta is missing base columns ${missing.mkString(", ")}; " +
        "schema evolution supports only ADDING columns — dropping/renaming " +
        "requires an explicit commitOverwrite")
    val declared = sch.fields.map(f => col(f.name).cast(f.dataType).as(f.name))
    val added = delta.schema.fields.filterNot(f => sch.fieldNames.contains(f.name))
      .map(f => col(f.name))
    delta.select((declared ++ added).toSeq: _*)
  }

  /** Merge `delta` into the live snapshot by `key` (delta wins on key
    * collision, unmatched delta rows are inserts) and publish the
    * result as a new version; the whole table is rewritten (use
    * [[commitMergePartitioned]] when deltas are partition-local). On an
    * empty table the delta becomes v1.
    *
    * Read-modify-write: the claim targets exactly base+1 (or
    * `expectedVersion`+1 when the caller pins the snapshot it read) —
    * if another writer commits in between, this throws
    * [[ConcurrentSnapshotCommitException]] and the caller re-runs.
    *
    * The anti-join keeps base rows whose key is absent from the delta;
    * with a small delta Catalyst broadcasts its key set, so the base
    * scan is map-only — one full-table write, zero full-table
    * shuffles. */
  def commitUpsert(spark: SparkSession, tableDir: String, delta: DataFrame,
                   key: String, expectedVersion: Option[String] = None,
                   statsCols: Seq[String] = Nil): String = {
    val base = expectedVersion.orElse(currentVersion(spark, tableDir))
    base match {
      case None =>
        // bootstrap is CAS-protected too: claim EXACTLY v1 (not
        // retry-next-number) so of two concurrent first writers one
        // fails loudly instead of silently hiding the other's rows
        // behind a higher version; within-batch duplicate keys are
        // merged the same way a non-empty-table upsert would
        val dir = new Path(tableDir)
        fsOf(spark, dir).mkdirs(dir)
        val dd = newDataDirName()
        val deduped = graft.etl.Dims.upsert(None, delta, key)
        deduped.write.mode(SaveMode.ErrorIfExists).parquet(new Path(dir, dd).toString)
        claimExactly(spark, tableDir, 1,
          Manifest(Some(dd), "", Nil, Some(deduped.schema.json),
            computeFileStats(spark, dir, dd, statsCols)))
      case Some(v) =>
        val baseDf = readVersion(spark, tableDir, v)
        val aligned = evolveDeltaTo(baseDf.schema, delta)
        val merged = baseDf
          .join(aligned.select(col(key)).distinct(), Seq(key), "left_anti")
          // allowMissingColumns: an ADDED delta column reads as NULL on
          // the surviving base rows (add-column schema evolution)
          .unionByName(aligned, allowMissingColumns = true)
        val dd = newDataDirName()
        merged.write.mode(SaveMode.ErrorIfExists)
          .parquet(new Path(new Path(tableDir), dd).toString)
        val mPrev = readManifest(spark, tableDir, v)
        claimExactlyAfter(spark, tableDir, v,
          Manifest(Some(dd), "", Nil, Some(merged.schema.json),
            computeFileStats(spark, new Path(tableDir), dd,
              effectiveStatsCols(statsCols, mPrev))))
    }
  }

  /** Publish `df` as the next version of a PARTITIONED table: the data
    * dir is written `partitionBy(partCol)` and the manifest maps every
    * partition value to it. NULL partition values are refused (same
    * contract as [[graft.etl.Dims.partitionScopedMerge]]). */
  def commitOverwritePartitioned(spark: SparkSession, tableDir: String,
                                 df: DataFrame, partCol: String,
                                 statsCols: Seq[String] = Nil): String = {
    val dir = new Path(tableDir)
    val fs = fsOf(spark, dir)
    fs.mkdirs(dir)
    val dd = newDataDirName()
    val ddPath = new Path(dir, dd)
    df.write.mode(SaveMode.ErrorIfExists).partitionBy(partCol)
      .parquet(ddPath.toString)
    val values = listPartitionValues(fs, ddPath, partCol)
    require(values.nonEmpty, "commitOverwritePartitioned: empty dataframe")
    val m = Manifest(None, partCol, values.map(v => v -> dd), Some(df.schema.json),
      computeFileStats(spark, dir, dd, statsCols))
    var n = listVersions(spark, tableDir).lastOption.map(versionNumber).getOrElse(0) + 1
    while (!tryClaim(spark, tableDir, n, m)) n += 1
    versionName(n)
  }

  /** Partition-scoped merge commit: upsert `delta` by `key` into ONLY
    * the partitions it touches, inside a NEW data dir, and publish a
    * manifest where untouched partitions keep referencing their
    * existing files — which therefore stay byte-identical across the
    * commit (proved in SnapshotsSpec), while the reader-atomic
    * single-claim publish is unchanged. Commit cost scales with the
    * delta: at 100 TB, a daily one-partition delta rewrites one
    * partition, not the table.
    *
    * Cross-partition key moves are handled with full MERGE semantics
    * (delete-and-reinsert): a delta row whose key already lives in a
    * DIFFERENT partition pulls that partition into the rewrite and the
    * stale row is dropped, so a key is never duplicated across
    * partitions (proved in SnapshotsSpec). The detection scan reads
    * only the (key, partCol) columns of untouched partitions — when no
    * key moves (the daily-delta common case) nothing extra is
    * rewritten and untouched files stay byte-identical.
    *
    * Read-modify-write CAS semantics as [[commitUpsert]]. */
  /** Anti-join away the deletion-vector keys targeting rows that were
    * read from `owner`'s files. DVs are scoped to the data dir that
    * existed when the delete committed, so a later re-insert of the
    * same key — which lands in a NEW dir — is never masked (the
    * reason Delta/Iceberg DVs are file-scoped). The key frames are
    * delete-sized; Catalyst broadcasts them against the corpus side. */
  private def applyDv(spark: SparkSession, root: Path, m: Manifest,
                      owner: String, df: DataFrame): DataFrame = {
    val hits = m.dvs.filter(_._2 == owner).map(_._1).distinct
    if (hits.isEmpty) df
    else {
      val keys = hits.map(dv => spark.read.parquet(new Path(root, dv).toString))
        .reduce(_.unionByName(_)).select(col(m.dvKey)).distinct()
      df.join(keys, Seq(m.dvKey), "left_anti")
    }
  }

  /** Read a subset of a partitioned version's partitions from their
    * owning data dirs (partition pruning by construction — only those
    * dirs' partition subdirectories are ever listed), with each
    * owner's deletion vectors applied. */
  private def readPartitionsSubset(spark: SparkSession, tableDir: String,
                                   m: Manifest,
                                   values: Seq[String]): Option[DataFrame] = {
    val owned = m.partitions.toMap
    val present = values.filter(owned.contains)
    if (present.isEmpty) None else Some(
      present.groupBy(owned).map { case (ownerDir, vls) =>
        val ownerPath = new Path(new Path(tableDir), ownerDir)
        val paths = vls.map(vl =>
          new Path(ownerPath, partDirName(m.partCol, vl)).toString)
        applyDv(spark, new Path(tableDir), m, ownerDir,
          spark.read.option("basePath", ownerPath.toString).parquet(paths: _*))
        // allowMissingColumns: after an add-column evolution, dirs that
        // predate the new column union with NULLs for it
      }.reduce(_.unionByName(_, allowMissingColumns = true)))
  }

  def commitMergePartitioned(spark: SparkSession, tableDir: String,
                             delta: DataFrame, key: String, partCol: String,
                             tieBreak: Seq[Column] = Nil,
                             expectedVersion: Option[String] = None,
                             statsCols: Seq[String] = Nil): String = {
    val base = expectedVersion.orElse(currentVersion(spark, tableDir))
    base match {
      case None =>
        // bootstrap claims EXACTLY v1 (CAS) — see commitUpsert — and
        // merges within-batch duplicate keys like any later commit
        val dir = new Path(tableDir)
        val fs = fsOf(spark, dir)
        fs.mkdirs(dir)
        val dd = newDataDirName()
        val ddPath = new Path(dir, dd)
        val deduped = graft.etl.Dims.upsert(None, delta, key, tieBreak)
        deduped.write.mode(SaveMode.ErrorIfExists).partitionBy(partCol)
          .parquet(ddPath.toString)
        val values = listPartitionValues(fs, ddPath, partCol)
        require(values.nonEmpty, "commitMergePartitioned: empty bootstrap delta")
        claimExactly(spark, tableDir, 1,
          Manifest(None, partCol, values.map(_ -> dd), Some(deduped.schema.json),
            computeFileStats(spark, dir, dd, statsCols)))
      case Some(v) =>
        val m = readManifest(spark, tableDir, v)
        require(m.dataDir.isEmpty && m.partCol == partCol,
          s"commitMergePartitioned: version $v of $tableDir is not partitioned by $partCol")
        val touchedRaw = delta.select(col(partCol).cast("string")).distinct()
          .collect().map(_.getString(0)).toSeq
        require(!touchedRaw.contains(null) && !touchedRaw.contains(""),
          s"commitMergePartitioned: delta has NULL or empty $partCol values; " +
            "null partitions are not supported — filter or default them first")
        // empty delta: a no-op — don't publish an identical version
        if (touchedRaw.isEmpty) return v
        val owned = m.partitions.toMap
        // Cross-partition key moves (a delta row carrying an existing
        // key whose partition value CHANGED — the dimension-attribute
        // move): the stale row lives in a partition the delta does not
        // touch and must be deleted, or the table holds the key twice.
        // Detect by scanning ONLY (key, partCol) of the untouched
        // partitions — column pruning keeps this a narrow map-only
        // read — semi-joined against the broadcast delta key set; any
        // partition holding a moved key joins the touched set, and the
        // global delta-wins upsert below then drops its stale rows
        // (delete-and-reinsert, the Delta/Iceberg MERGE semantics).
        val deltaKeys = delta.select(col(key)).distinct()
        val untouchedVals = owned.keys.toSeq.filterNot(touchedRaw.contains)
        // When the manifest tracks file stats on the merge key, prune
        // the detection scan to files whose key range intersects the
        // delta's key range. This is SAFE: a stale row shares its key
        // with some delta row, so its file's [min,max] necessarily
        // contains a value inside [delta min, delta max] — a pruned
        // file cannot hold a moved key. At 100 TB this turns the
        // untouched scan into a handful of file opens.
        val keyStats = m.stats.filter(_.col == key).map(s => s.relPath -> s).toMap
        val untouchedScan: Option[DataFrame] =
          if (untouchedVals.isEmpty) None
          else if (keyStats.isEmpty)
            readPartitionsSubset(spark, tableDir, m, untouchedVals)
          else {
            val b = delta.agg(min(col(key)).cast("string"), max(col(key)).cast("string")).head
            if (b.isNullAt(0)) None // no non-null delta keys → nothing can move
            else {
              val files = filterByStats(keyStats,
                partitionFilesRel(spark, tableDir, m, untouchedVals),
                BigDecimal(b.getString(0)), BigDecimal(b.getString(1)))
              if (files.isEmpty) None
              else Some(readFilesByOwner(spark, new Path(tableDir), m, files))
            }
          }
        val movedParts = untouchedScan match {
          case None => Nil
          case Some(unt) => unt
            .select(col(key), col(partCol).cast("string").as("_p"))
            .join(broadcast(deltaKeys), Seq(key), "left_semi")
            .select(col("_p")).distinct()
            .collect().map(_.getString(0)).toSeq
        }
        val touched = (touchedRaw ++ movedParts).distinct.sorted
        val baseSubset = readPartitionsSubset(spark, tableDir, m, touched)
        // align the delta to the declared schema's exact column types
        // (arithmetic widens decimals; a forked schema would break
        // later reads); EXTRA delta columns are add-column evolution.
        // The declared schema comes from the manifest (new manifests),
        // falling back to the touched subset's physical schema
        val declared = manifestSchema(m).orElse(baseSubset.map(_.schema))
        val aligned = declared match {
          case Some(sch) => evolveDeltaTo(sch, delta)
          case None => delta
        }
        // pad the base subset: conform to the declared schema, then
        // materialize the delta's added columns as typed NULLs so the
        // in-partition merge unions cleanly
        val paddedBase = baseSubset.map { b =>
          val conformed = manifestSchema(m).map(alignTo(b, _)).getOrElse(b)
          aligned.schema.fields.filterNot(f => conformed.columns.contains(f.name))
            .foldLeft(conformed)((df, f) => df.withColumn(f.name, lit(null).cast(f.dataType)))
        }
        val merged = graft.etl.Dims.upsert(paddedBase, aligned, key, tieBreak)
        val dd = newDataDirName()
        val ddPath = new Path(new Path(tableDir), dd)
        merged.write.mode(SaveMode.ErrorIfExists).partitionBy(partCol)
          .parquet(ddPath.toString)
        // a moved-from partition can end up EMPTY (every row moved
        // out): it produces no dir in the new data dir and must drop
        // out of the manifest entirely, not point at a missing path
        val present = listPartitionValues(fsOf(spark, ddPath), ddPath, partCol)
        val newParts = ((owned -- touched) ++ present.map(_ -> dd)).toSeq
        // data-skipping stats: entries for files whose (dir, partition)
        // the new manifest still references carry forward verbatim
        // (immutable files, unchanged ranges); the new data dir gets a
        // fresh delta-sized stats scan
        val fresh = computeFileStats(spark, new Path(tableDir), dd,
          effectiveStatsCols(statsCols, m))
        val dvs = carriedDvs(m, newParts.map(_._2).toSet)
        claimExactlyAfter(spark, tableDir, v,
          Manifest(None, partCol, newParts, Some(merged.schema.json),
            carriedStats(m, newParts.toMap) ++ fresh,
            if (dvs.nonEmpty) m.dvKey else "", dvs))
    }
  }

  /** Partitions whose content differs between two versions, or None
    * when the range cannot be reasoned about partition-wise (an
    * unpartitioned commit in the range, treated as "everything
    * changed"). A partition differs when it appears/disappears, its
    * owning data dir is re-pointed, or the deletion vectors applied to
    * its owner change. Manifest-only — no data files are read. */
  private def changedPartitionsBetween(spark: SparkSession, tableDir: String,
                                       vOld: Option[String],
                                       vNew: String): Option[Seq[String]] = {
    val mN = readManifest(spark, tableDir, vNew)
    if (mN.dataDir.isDefined) return None
    def dvByOwner(m: Manifest): Map[String, Set[String]] =
      m.dvs.groupBy(_._2).map { case (o, s) => o -> s.map(_._1).toSet }
    vOld match {
      case None => Some(mN.partitions.map(_._1))
      case Some(v0) =>
        val m0 = readManifest(spark, tableDir, v0)
        if (m0.dataDir.isDefined) return None
        val (d0, dN) = (dvByOwner(m0), dvByOwner(mN))
        val (p0, pN) = (m0.partitions.toMap, mN.partitions.toMap)
        Some((p0.keySet ++ pN.keySet).toSeq.filter { v =>
          (p0.get(v), pN.get(v)) match {
            case (Some(a), Some(b)) =>
              a != b || d0.getOrElse(a, Set.empty) != dN.getOrElse(b, Set.empty)
            case _ => true
          }
        })
    }
  }

  /** [[commitMergePartitioned]] with Delta-style optimistic concurrency:
    * on losing the CAS race, diff the winning commits' changed
    * partitions (manifest-only) against this merge's read+write set —
    * the delta's partitions plus any changed partition now holding one
    * of the delta's keys. Disjoint → the two commits serialize in either
    * order, so rebase onto the new version and replay (no caller
    * involvement); overlapping → [[SnapshotWriteConflictException]],
    * because the delta may have been derived from a snapshot the winner
    * invalidated. At 100 TB this is the difference between "concurrent
    * per-region writers each retry their whole merge job" and "they
    * never see each other": the conflict check costs two manifest reads
    * plus, only when partitions changed at all, a key semi-join bounded
    * by the changed partitions' size. */
  def commitMergePartitionedOcc(spark: SparkSession, tableDir: String,
                                delta: DataFrame, key: String, partCol: String,
                                tieBreak: Seq[Column] = Nil,
                                statsCols: Seq[String] = Nil,
                                maxAttempts: Int = 5,
                                expectedVersion: Option[String] = None): String = {
    // `expectedVersion` pins the snapshot the delta was DERIVED from —
    // the conflict check then covers every commit that landed since,
    // not just ones racing the claim itself
    var base = expectedVersion.orElse(currentVersion(spark, tableDir))
    var attempt = 0
    while (true) {
      try return commitMergePartitioned(spark, tableDir, delta, key, partCol,
        tieBreak, base, statsCols)
      catch {
        case e: SnapshotWriteConflictException => throw e
        case e: ConcurrentSnapshotCommitException =>
          attempt += 1
          if (attempt >= maxAttempts) throw e
          val newBase = currentVersion(spark, tableDir)
          if (newBase == base) throw e // claim raced something non-commit-like
          val changed = changedPartitionsBetween(spark, tableDir, base, newBase.get)
            .getOrElse(throw new SnapshotWriteConflictException(
              s"Snapshots: concurrent UNPARTITIONED commit on $tableDir " +
                s"(${base.getOrElse("<empty>")} -> ${newBase.get}) conflicts with " +
                "a partition-scoped merge; re-derive the delta from the live snapshot"))
          val ours = delta.select(col(partCol).cast("string")).distinct()
            .collect().map(_.getString(0)).toSeq
          val overlap = changed.intersect(ours)
          if (overlap.nonEmpty) throw new SnapshotWriteConflictException(
            s"Snapshots: concurrent commit ${newBase.get} on $tableDir changed " +
              s"partition(s) ${overlap.sorted.mkString(", ")} this merge also " +
              "writes; re-derive the delta from the live snapshot")
          // key-level read-set check: a delta key now living in a
          // partition the winner changed means the winner wrote rows
          // this merge would delete-and-reinsert — order matters
          val mN = readManifest(spark, tableDir, newBase.get)
          val keyHits = readPartitionsSubset(spark, tableDir, mN,
            changed.filter(mN.partitions.toMap.contains)) match {
            case None => 0L
            case Some(ch) => ch.select(col(key))
              .join(broadcast(delta.select(col(key)).distinct()), Seq(key), "left_semi")
              .limit(1).count()
          }
          if (keyHits > 0) throw new SnapshotWriteConflictException(
            s"Snapshots: concurrent commit ${newBase.get} on $tableDir wrote rows " +
              s"carrying this merge's keys (in partitions ${changed.sorted.mkString(", ")}); " +
              "re-derive the delta from the live snapshot")
          base = newBase
      }
    }
    throw new IllegalStateException("unreachable")
  }

  // ---------------------------------------------------- delete / update

  /** Rows a SQL DELETE/UPDATE leaves untouched: predicate FALSE or
    * NULL (three-valued logic — only TRUE selects a row). */
  private def keepCond(predicate: Column): Column =
    !coalesce(predicate, lit(false))

  /** DELETE WHERE on the live snapshot, partition-scoped: only
    * partitions that actually CONTAIN matching rows are rewritten
    * (minus the deleted rows) into a new data dir; every other
    * partition keeps referencing its existing files byte-identically.
    * A partition whose every row matches drops out of the manifest. A
    * predicate matching nothing is a no-op — no identical version is
    * published. On a non-partitioned table the whole dir is rewritten
    * (one dir per version is the manifest granularity there).
    *
    * `prunePreds` (optional) bounds the detection scan with the
    * file-stats index: the caller asserts `predicate` can only hold
    * inside the conjunction of the (col, lo, hi) ranges, and the scan
    * that finds touched partitions then opens only files whose
    * recorded range intersects — at 100 TB a key-range delete finds
    * its partitions from a handful of file opens. Rows outside the
    * ranges are NEVER deleted, so an over-narrow bound silently
    * under-deletes: it is the caller's contract, not a hint.
    *
    * Read-modify-write CAS semantics as [[commitUpsert]]: concurrent
    * commit → [[ConcurrentSnapshotCommitException]], re-run. */
  def commitDelete(spark: SparkSession, tableDir: String, predicate: Column,
                   prunePreds: Seq[(String, BigDecimal, BigDecimal)] = Nil): String = {
    val v = currentVersion(spark, tableDir).getOrElse(
      throw new IOException(s"Snapshots.commitDelete: no committed version at $tableDir"))
    val m = readManifest(spark, tableDir, v)
    val statsCols = m.stats.map(_.col).distinct
    val detect =
      if (prunePreds.isEmpty) readVersion(spark, tableDir, v).filter(predicate)
      else readVersionPrunedMulti(spark, tableDir, v, prunePreds).filter(predicate)
    m.dataDir match {
      case Some(_) =>
        if (detect.isEmpty) return v // no match → no-op, don't publish a copy
        val kept = readVersion(spark, tableDir, v).filter(keepCond(predicate))
        val dd = newDataDirName()
        kept.write.mode(SaveMode.ErrorIfExists)
          .parquet(new Path(new Path(tableDir), dd).toString)
        claimExactlyAfter(spark, tableDir, v,
          Manifest(Some(dd), "", Nil, m.schemaJson,
            computeFileStats(spark, new Path(tableDir), dd, statsCols)))
      case None =>
        val touched = detect.select(col(m.partCol).cast("string")).distinct()
          .collect().map(_.getString(0)).toSeq.sorted
        if (touched.isEmpty) return v
        val owned = m.partitions.toMap
        val subset = readPartitionsSubset(spark, tableDir, m, touched)
          .getOrElse(return v)
        val conformed = manifestSchema(m).map(alignTo(subset, _)).getOrElse(subset)
        val kept = conformed.filter(keepCond(predicate))
        val dd = newDataDirName()
        val ddPath = new Path(new Path(tableDir), dd)
        kept.write.mode(SaveMode.ErrorIfExists).partitionBy(m.partCol)
          .parquet(ddPath.toString)
        // a fully-deleted partition writes no dir and leaves the manifest
        val present = listPartitionValues(fsOf(spark, ddPath), ddPath, m.partCol)
        val newParts = ((owned -- touched) ++ present.map(_ -> dd)).toSeq
        val dvs = carriedDvs(m, newParts.map(_._2).toSet)
        claimExactlyAfter(spark, tableDir, v,
          Manifest(None, m.partCol, newParts, m.schemaJson,
            carriedStats(m, newParts.toMap) ++
              computeFileStats(spark, new Path(tableDir), dd, statsCols),
            if (dvs.nonEmpty) m.dvKey else "", dvs))
    }
  }

  /** UPDATE ... SET ... WHERE on the live snapshot, partition-scoped.
    * `sets` maps existing columns to expressions; every right-hand
    * side is evaluated against the OLD row (SQL UPDATE semantics —
    * `SET a = b, b = a` swaps), and each result is cast to the
    * column's declared type so the schema never forks. Partitions
    * rewritten: those CONTAINING matching rows, plus — when `sets`
    * reassigns the partition column — the partitions updated rows
    * MOVE INTO (their existing rows are rewritten alongside, because
    * a manifest maps each partition to exactly one owning dir).
    * Everything else keeps its files byte-identically; a moved-out-of
    * partition left empty drops from the manifest; a no-match update
    * is a no-op. NULL/empty partition-column results are refused
    * (same contract as every partitioned commit).
    *
    * Read-modify-write CAS semantics as [[commitUpsert]]. */
  def commitUpdate(spark: SparkSession, tableDir: String, predicate: Column,
                   sets: Seq[(String, Column)]): String = {
    require(sets.nonEmpty, "Snapshots.commitUpdate: no SET assignments")
    val v = currentVersion(spark, tableDir).getOrElse(
      throw new IOException(s"Snapshots.commitUpdate: no committed version at $tableDir"))
    val m = readManifest(spark, tableDir, v)
    val statsCols = m.stats.map(_.col).distinct
    val setMap = sets.toMap
    require(setMap.size == sets.size,
      s"Snapshots.commitUpdate: duplicate SET column")
    // one select, every RHS against the old row, cast to declared types
    def applySets(df: DataFrame): DataFrame = {
      val bad = setMap.keySet.diff(df.columns.toSet)
      require(bad.isEmpty,
        s"Snapshots.commitUpdate: SET of unknown column(s) ${bad.mkString(", ")} — " +
          "UPDATE cannot add columns; use a merge commit for schema evolution")
      val hit = coalesce(predicate, lit(false))
      df.select(df.schema.fields.map { f =>
        setMap.get(f.name) match {
          case Some(e) => when(hit, e.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }.toSeq: _*)
    }
    m.dataDir match {
      case Some(_) =>
        if (readVersion(spark, tableDir, v).filter(predicate).isEmpty) return v
        val updated = applySets(readVersion(spark, tableDir, v))
        val dd = newDataDirName()
        updated.write.mode(SaveMode.ErrorIfExists)
          .parquet(new Path(new Path(tableDir), dd).toString)
        claimExactlyAfter(spark, tableDir, v,
          Manifest(Some(dd), "", Nil, m.schemaJson,
            computeFileStats(spark, new Path(tableDir), dd, statsCols)))
      case None =>
        val matched = readVersion(spark, tableDir, v).filter(predicate)
        val srcParts = matched.select(col(m.partCol).cast("string")).distinct()
          .collect().map(_.getString(0)).toSeq
        if (srcParts.isEmpty) return v
        // rows moving INTO a partition force its rewrite too — the
        // target's existing rows must land in the same owning dir
        val tgtParts =
          if (!setMap.contains(m.partCol)) Nil
          else applySets(matched).select(col(m.partCol).cast("string")).distinct()
            .collect().map(_.getString(0)).toSeq
        require(!tgtParts.contains(null) && !tgtParts.contains(""),
          s"Snapshots.commitUpdate: SET would assign NULL or empty ${m.partCol}; " +
            "null partitions are not supported")
        val owned = m.partitions.toMap
        val touched = (srcParts ++ tgtParts).distinct.filter(p =>
          owned.contains(p) || tgtParts.contains(p)).sorted
        val subset = readPartitionsSubset(spark, tableDir, m, touched)
          .getOrElse(return v)
        val conformed = manifestSchema(m).map(alignTo(subset, _)).getOrElse(subset)
        val updated = applySets(conformed)
        val dd = newDataDirName()
        val ddPath = new Path(new Path(tableDir), dd)
        updated.write.mode(SaveMode.ErrorIfExists).partitionBy(m.partCol)
          .parquet(ddPath.toString)
        val present = listPartitionValues(fsOf(spark, ddPath), ddPath, m.partCol)
        val newParts = ((owned -- touched) ++ present.map(_ -> dd)).toSeq
        val dvs = carriedDvs(m, newParts.map(_._2).toSet)
        claimExactlyAfter(spark, tableDir, v,
          Manifest(None, m.partCol, newParts, m.schemaJson,
            carriedStats(m, newParts.toMap) ++
              computeFileStats(spark, new Path(tableDir), dd, statsCols),
            if (dvs.nonEmpty) m.dvKey else "", dvs))
    }
  }

  /** DV entries of a previous manifest still valid under a new set of
    * referenced dirs: a deletion vector targets one data dir's rows
    * and survives iff that dir is still referenced. (A rewritten
    * partition's rows move to a new dir with the deletions already
    * applied — its old dir's DV rides along only while OTHER
    * partitions still read that dir.) */
  private def carriedDvs(m: Manifest, newDirs: Set[String]): Seq[(String, String)] =
    m.dvs.filter { case (_, target) => newDirs.contains(target) }

  /** O(delta) DELETE: record the (distinct) keys of `keys` as a
    * DELETION VECTOR — one delete-sized parquet write and a manifest
    * claim; NO data file is touched, unlike [[commitDelete]]'s
    * partition rewrite. Readers anti-join the vector against rows
    * from the dirs it targets (the dirs referenced when the delete
    * committed), so a later upsert RE-INSERTING a deleted key — which
    * lands in a new dir — is never masked. DVs accumulate across
    * deletes and merges; [[compact]] materializes the live rows and
    * clears them (the REWRITE step of the Delta DV lifecycle). All
    * DVs of a table must share one key column. Read-modify-write CAS
    * semantics as [[commitUpsert]]. */
  def commitDeleteVector(spark: SparkSession, tableDir: String, keys: DataFrame,
                         key: String): String = {
    val v = currentVersion(spark, tableDir).getOrElse(
      throw new IOException(s"Snapshots.commitDeleteVector: no committed version at $tableDir"))
    val m = readManifest(spark, tableDir, v)
    require(m.dvKey.isEmpty || m.dvKey == key,
      s"Snapshots.commitDeleteVector: existing deletion vectors use key '${m.dvKey}'")
    val k = keys.select(col(key)).distinct()
    if (k.isEmpty) return v
    val root = new Path(tableDir)
    val dd = newDataDirName()
    k.write.mode(SaveMode.ErrorIfExists).parquet(new Path(root, dd).toString)
    // target every dir the live version references — with per-file key
    // stats a future refinement could skip dirs whose ranges exclude
    // the keys, but an extra target is only a no-op anti-join
    val targets = (m.dataDir.toSeq ++ m.partitions.map(_._2)).distinct
    claimExactlyAfter(spark, tableDir, v,
      m.copy(dvKey = key, dvs = m.dvs ++ targets.map(dd -> _)))
  }

  /** Right-to-be-forgotten composition: logically delete `keys` NOW
    * (one [[commitDeleteVector]] — instant at any table size), then
    * physically erase them by materializing the live rows
    * ([[compact]]) and reclaiming every pre-compaction data dir and
    * manifest ([[vacuum]] with `keep = 1`, zero grace). After this
    * returns, no file under the table root contains the forgotten
    * rows' bytes (proved byte-level in SnapshotsSpec) — the erasure a
    * compliance delete needs, which a deletion vector alone
    * deliberately does NOT provide (old versions stay readable).
    * Collapses history to the single live version and assumes no
    * concurrent writers/pinned readers during the erasure window —
    * the caller serializes compliance jobs. */
  def forget(spark: SparkSession, tableDir: String, keys: DataFrame,
             key: String): String = {
    commitDeleteVector(spark, tableDir, keys, key)
    // even with no matching keys, compact+vacuum still runs: the
    // caller asked for physical erasure of whatever may linger in
    // old, still-readable versions
    val v = compact(spark, tableDir)
    vacuum(spark, tableDir, keep = 1, orphanGraceMs = 0L)
    v
  }

  /** Stat entries of a previous manifest still valid under a new
    * partition→dir map: files are immutable, so an entry survives iff
    * the new manifest still references its (dir, partition). */
  /** Stats entries whose (owning dir, partition value) the new
    * manifest still references. Matching is by dir PREFIX + the
    * partition subdir segment, not positional path segments, so
    * clone-borrowed absolute dirs carry their stats too. */
  private def carriedStats(m: Manifest,
                           newParts: Map[String, String]): Seq[FileStat] =
    m.stats.filter { st =>
      newParts.exists { case (value, dd) =>
        st.relPath.startsWith(dd + "/") && {
          val rest = st.relPath.substring(dd.length + 1).split("/")
          rest.length == 2 && {
            val eq = rest(0).lastIndexOf('=')
            eq > 0 && org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .unescapePathName(rest(0).substring(eq + 1)) == value
          }
        }
      }
    }

  // ------------------------------------------------------------- restore

  /** RESTORE the table to a retained `version`: publish that
    * version's manifest content as the NEW live version. Zero data is
    * copied or moved — the new manifest re-references the old
    * version's immutable dirs (which also re-pins them against
    * [[vacuum]], since retention keeps everything the live manifest
    * names). History is preserved: the rolled-back versions remain
    * readable until vacuumed, exactly like Delta's RESTORE. Restoring
    * a vacuumed version fails loudly in [[readManifest]]; restoring
    * the live version is a no-op. Read-modify-write CAS semantics as
    * [[commitUpsert]] — a concurrent commit between resolving the
    * live version and the claim throws, re-run. */
  def restore(spark: SparkSession, tableDir: String, version: String): String = {
    val live = currentVersion(spark, tableDir).getOrElse(
      throw new IOException(s"Snapshots.restore: no committed version at $tableDir"))
    if (version == live) return live
    val m = readManifest(spark, tableDir, version)
    val root = new Path(tableDir)
    val fs = fsOf(spark, root)
    val gone = (m.dataDir.toSeq ++ m.partitions.map(_._2) ++ m.dvs.map(_._1)).distinct
      .filterNot(dd => fs.exists(new Path(root, dd)))
    require(gone.isEmpty,
      s"Snapshots.restore: $version references vacuumed data dir(s) " +
        s"${gone.mkString(", ")} — restore a retained version instead")
    claimExactlyAfter(spark, tableDir, live, m)
  }

  /** Zero-copy SHALLOW CLONE — the `CREATE TABLE dst SHALLOW CLONE
    * src` analog (Delta/Iceberg snapshot-reference clones): publish,
    * as the clone's v1, the source's LIVE manifest with every
    * data-dir / deletion-vector / stat-file reference rewritten
    * relative to the clone root (`../src/d-…`). O(manifest) work,
    * zero data bytes copied — cloning a 100 TB table costs one small
    * file write. Every reader resolves dirs through the same
    * `new Path(tableDir, dir)` seam, so plain reads, time travel,
    * min/max- and bitmap-pruned reads and DV application all work on
    * the clone unchanged. Divergence is copy-on-write by
    * construction: commits to the clone write their OWN data dirs
    * under the clone root; commits to the source are invisible to the
    * clone (it pinned one manifest). The caveat is Delta's too:
    * vacuuming the SOURCE can reclaim dirs a live clone still
    * references — source retention policy must cover clones. */
  def shallowClone(spark: SparkSession, srcTableDir: String,
                   dstTableDir: String): String = {
    val srcLive = currentVersion(spark, srcTableDir).getOrElse(
      throw new IOException(s"Snapshots.shallowClone: no committed version at $srcTableDir"))
    val m = readManifest(spark, srcTableDir, srcLive)
    val rel = java.nio.file.Paths.get(dstTableDir).toAbsolutePath.normalize()
      .relativize(java.nio.file.Paths.get(srcTableDir).toAbsolutePath.normalize())
      .toString.replace(java.io.File.separatorChar, '/')
    def re(d: String) = s"$rel/$d"
    val cloned = m.copy(
      dataDir = m.dataDir.map(re),
      partitions = m.partitions.map { case (v, d) => (v, re(d)) },
      stats = m.stats.map(s => s.copy(relPath = re(s.relPath))),
      dvs = m.dvs.map { case (dv, owner) => (re(dv), re(owner)) })
    claimExactly(spark, dstTableDir, 1, cloned)
  }

  // --------------------------------------------------- change data feed

  /** Change-data-feed rows between two retained versions: one row per
    * CHANGE, with the full payload inline plus `_change_type` ∈
    * {insert, delete, update_preimage, update_postimage} — a changed
    * key emits its pre- and post-image as two rows (the Delta CDF
    * row shape), an unchanged key emits nothing. When both versions
    * are partitioned commits on the same column, partitions whose
    * manifest entries name the SAME immutable dir are skipped without
    * reading a row (the [[diffVersionsPartitioned]] pruning) — the
    * CDF of a daily one-partition merge on a 100 TB table reads two
    * copies of one partition. One full-outer shuffle on the key over
    * what survives pruning. */
  def changeFeed(spark: SparkSession, tableDir: String, vOld: String,
                 vNew: String, key: String): DataFrame = {
    val mo = readManifest(spark, tableDir, vOld)
    val mn = readManifest(spark, tableDir, vNew)
    val d =
      if (mo.dataDir.isEmpty && mn.dataDir.isEmpty && mo.partCol == mn.partCol)
        diffVersionsPartitioned(spark, tableDir, vOld, vNew, key)
      else diffVersions(spark, tableDir, vOld, vNew, key)
    val changed = d.filter(col("change") =!= "unchanged")
    def tagged(payload: Column, tag: String): Column =
      struct(payload.as("p"), lit(tag).as("t"))
    val events = changed.select(col(key), explode(
      when(col("change") === "added", array(tagged(col("_new"), "insert")))
        .when(col("change") === "removed", array(tagged(col("_old"), "delete")))
        .otherwise(array(tagged(col("_old"), "update_preimage"),
          tagged(col("_new"), "update_postimage")))).as("_e"))
    // payload columns in the new version's declared order (a
    // partitioned physical read surfaces the partition column last)
    val payload = events.select(col("_e.p.*")).columns.toSeq
    val ordered = manifestSchema(mn)
      .map(sch => sch.fieldNames.toSeq.filter(payload.contains) ++
        payload.filterNot(sch.fieldNames.contains))
      .getOrElse(payload)
    events.select(col(key) +: ordered.map(c => col(s"_e.p.$c").as(c))
      :+ col("_e.t").as("_change_type"): _*)
  }

  /** Consolidate the live version into ONE fresh data dir and publish
    * it as a new version — the table-rewrite/OPTIMIZE analog. A long
    * chain of partition-scoped merges leaves the live manifest
    * referencing one data dir per historical commit; every one of them
    * is pinned against [[vacuum]] for as long as any live partition
    * entry points at it. Compaction re-points every partition at a
    * single new dir, after which vacuum can reclaim the whole chain.
    * Readers are untouched until the one-claim publish (same protocol
    * as every commit); read-modify-write CAS semantics as
    * [[commitUpsert]] — a racing committer makes this throw, re-run.
    * Returns the new version name. */
  def compact(spark: SparkSession, tableDir: String): String = {
    val v = currentVersion(spark, tableDir).getOrElse(
      throw new IOException(s"Snapshots.compact: no committed version at $tableDir"))
    val m = readManifest(spark, tableDir, v)
    val dd = newDataDirName()
    val ddPath = new Path(new Path(tableDir), dd)
    val statsCols = m.stats.map(_.col).distinct
    m.dataDir match {
      case Some(_) =>
        readVersion(spark, tableDir, v)
          .write.mode(SaveMode.ErrorIfExists).parquet(ddPath.toString)
        claimExactlyAfter(spark, tableDir, v,
          Manifest(Some(dd), "", Nil, m.schemaJson,
            computeFileStats(spark, new Path(tableDir), dd, statsCols)))
      case None =>
        readVersion(spark, tableDir, v)
          .write.mode(SaveMode.ErrorIfExists).partitionBy(m.partCol)
          .parquet(ddPath.toString)
        val values = listPartitionValues(fsOf(spark, ddPath), ddPath, m.partCol)
        claimExactlyAfter(spark, tableDir, v,
          Manifest(None, m.partCol, values.map(_ -> dd), m.schemaJson,
            computeFileStats(spark, new Path(tableDir), dd, statsCols)))
    }
  }

  /** OPTIMIZE ZORDER analog: consolidate the live version into one
    * data dir CLUSTERED on the Morton key of (xCol, yCol) — domains
    * learned from one tiny agg, both columns scaled to the full code
    * range, one range exchange + local sort — with per-file stats
    * recorded on BOTH RAW columns. Each output file then covers a
    * small (x, y) rectangle, so [[readVersionPrunedMulti]] prunes 2D
    * box reads on both dimensions directly; no curve key is
    * materialized into the schema. Same CAS/read-modify-write
    * semantics as [[compact]]; existing stats columns stay tracked. */
  def compactZOrdered(spark: SparkSession, tableDir: String, xCol: String,
                      yCol: String, numFiles: Int): String = {
    val v = currentVersion(spark, tableDir).getOrElse(
      throw new IOException(s"Snapshots.compactZOrdered: no committed version at $tableDir"))
    val m = readManifest(spark, tableDir, v)
    val df = readVersion(spark, tableDir, v)
    val bits = 16
    val r = df.agg(min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head()
    val dd = newDataDirName()
    val ddPath = new Path(new Path(tableDir), dd)
    val clustered =
      if (r.isNullAt(0)) df
      else df.withColumn("_zkey", ZOrder.zkey2(
          ZOrder.scaled(col(xCol), r.getLong(0), r.getLong(1), bits),
          ZOrder.scaled(col(yCol), r.getLong(2), r.getLong(3), bits), bits))
        .repartitionByRange(numFiles, col("_zkey"))
        .sortWithinPartitions(col("_zkey"))
        .drop("_zkey")
    clustered.write.mode(SaveMode.ErrorIfExists).parquet(ddPath.toString)
    val statsCols = (m.stats.map(_.col) ++ Seq(xCol, yCol)).distinct
    claimExactlyAfter(spark, tableDir, v,
      Manifest(Some(dd), "", Nil, Some(df.schema.json),
        computeFileStats(spark, new Path(tableDir), dd, statsCols)))
  }

  /** Auto-OPTIMIZE policy: compact only when the live manifest
    * references more than `maxDirs` distinct data dirs — the point
    * where a long partition-scoped merge chain starts costing real
    * read fan-out (one basePath listing per dir) and pinning the whole
    * chain against [[vacuum]]. Cheap to call after every commit: the
    * check is one manifest read; below threshold nothing runs.
    * Returns the new version when a compaction was triggered. */
  def maybeCompact(spark: SparkSession, tableDir: String,
                   maxDirs: Int = 16): Option[String] =
    currentVersion(spark, tableDir).flatMap { v =>
      val m = readManifest(spark, tableDir, v)
      val nDirs = (m.dataDir.toSeq ++ m.partitions.map(_._2)).distinct.size
      if (nDirs > maxDirs) Some(compact(spark, tableDir)) else None
    }

  /** Zero-copy SHALLOW CLONE (Delta-style): publish `targetDir` as a
    * new snapshot table whose v1 manifest references the SOURCE
    * table's data files by absolute path — no bytes are copied, the
    * clone commits in manifest-write time however large the source.
    * Subsequent commits on the clone write their data dirs locally
    * and diverge freely: a partition-scoped merge rewrites only the
    * touched partitions into the clone's own dirs while untouched
    * partitions keep reading the source's files; the source never
    * observes any of it. File stats and deletion vectors are carried
    * (absolutized), so data skipping and DV masking survive the clone.
    *
    * Lifetime contract (same as Delta/Iceberg shallow clones): the
    * clone borrows the source's files, so a `vacuum` on the SOURCE
    * that drops the cloned version's dirs breaks the clone — pin the
    * source's retention for as long as the clone (or any of its
    * descendant versions) lives. `vacuum` on the CLONE is always safe:
    * it only ever deletes dirs under the clone's own root.
    *
    * The target must not already be a snapshot table (the bootstrap
    * claims exactly v1, CAS-protected like any bootstrap). */
  def cloneShallow(spark: SparkSession, sourceDir: String, targetDir: String,
                   version: Option[String] = None): String = {
    val v = version.getOrElse(currentVersion(spark, sourceDir).getOrElse(
      throw new IOException(s"cloneShallow: $sourceDir has no committed version")))
    val m = readManifest(spark, sourceDir, v)
    // fully-QUALIFIED source root (file:/… / hdfs://…): file listings
    // compare qualified paths, so borrowed-dir names must be stored in
    // the same form or stats/DV lookups would silently miss
    val srcRoot = fsOf(spark, new Path(sourceDir))
      .makeQualified(new Path(sourceDir)).toString
    def abs(d: String): String =
      if (d.startsWith("/") || d.contains(":/")) d else s"$srcRoot/$d"
    // the partition manifest line splits dir from value on the LAST
    // '=', so a borrowed DIR name must not contain one (file paths
    // inside stat lines are '|'-delimited and may — Hive partition
    // subdirs always do)
    def absDir(d: String): String = {
      val a = abs(d)
      require(!a.contains("=") && !a.contains("\n"),
        s"cloneShallow: source dir '$a' contains a manifest delimiter")
      a
    }
    val cloned = m.copy(
      dataDir = m.dataDir.map(absDir),
      partitions = m.partitions.map { case (value, dd) => (value, absDir(dd)) },
      stats = m.stats.map(s => s.copy(relPath = abs(s.relPath))),
      dvs = m.dvs.map { case (dv, owner) => (abs(dv), absDir(owner)) })
    val tgt = new Path(targetDir)
    // refuse a target with ANY commit history — a vacuumed table keeps
    // its later versions, and claiming a retired low number would
    // splice foreign history under them
    require(listVersions(spark, targetDir).isEmpty,
      s"cloneShallow: target $targetDir is already a snapshot table")
    fsOf(spark, tgt).mkdirs(tgt)
    claimExactly(spark, targetDir, 1, cloned)
  }

  /** Claim exactly base+1 or fail loudly (the read-modify-write CAS). */
  private def claimExactlyAfter(spark: SparkSession, tableDir: String,
                                baseVersion: String, m: Manifest): String =
    claimExactly(spark, tableDir, versionNumber(baseVersion) + 1, m)

  private def claimExactly(spark: SparkSession, tableDir: String, n: Int,
                           m: Manifest): String = {
    if (!tryClaim(spark, tableDir, n, m))
      throw new ConcurrentSnapshotCommitException(
        s"Snapshots: version ${versionName(n)} of $tableDir was claimed by a " +
          s"concurrent writer; re-run the merge against the new live snapshot")
    versionName(n)
  }

  private def listPartitionValues(fs: FileSystem, dataDir: Path,
                                  partCol: String): Seq[String] = {
    val prefix = partCol + "="
    val values = fs.listStatus(dataDir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith(prefix) =>
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(n.stripPrefix(prefix)) }
      .sorted
    // NULL and empty-string partition values both land in the Hive
    // default-partition dir and cannot round-trip as distinct values —
    // refuse before the claim (the written data dir stays an
    // unclaimed orphan; vacuum reclaims it)
    require(!values.contains(
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.DEFAULT_PARTITION_NAME),
      s"Snapshots: NULL or empty $partCol values are not supported — " +
        "filter or default them first")
    values
  }

  // ---------------------------------------------------------- file stats

  /** Compute per-file min/max for `statsCols` over a freshly written
    * data dir — one delta-sized scan of files that are still hot from
    * the write. Numeric data columns only (partition columns live in
    * dir names, not files). A file where a column is all-NULL gets no
    * entry and is conservatively always read. */
  private def computeFileStats(spark: SparkSession, tableDir: Path, dd: String,
                               statsCols: Seq[String]): Seq[FileStat] = {
    if (statsCols.isEmpty) return Nil
    val df = spark.read.parquet(new Path(tableDir, dd).toString)
    // RowCountCol and bitmap:<col> are VIRTUAL: per-file row counts
    // and membership bitmaps riding the same stat-line machinery
    // (and the same carry-forward rules) as the min/max skipping index
    val (virtual, rest) = statsCols.partition(_ == RowCountCol)
    val (bitmapTagged, real) = rest.partition(_.startsWith(BitmapStatPrefix))
    val bitmapCols = bitmapTagged.map(_.stripPrefix(BitmapStatPrefix))
    real.foreach { c =>
      require(StatColRe.findFirstIn(c).isDefined,
        s"Snapshots: stats column '$c' is not a plain identifier")
      require(df.schema.fields.exists(f => f.name == c &&
          f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]),
        s"Snapshots: stats column '$c' must be a numeric data column")
    }
    bitmapCols.foreach { c =>
      require(StatColRe.findFirstIn(c).isDefined,
        s"Snapshots: bitmap column '$c' is not a plain identifier")
      require(df.schema.fields.exists(_.name == c),
        s"Snapshots: bitmap column '$c' must be a data column")
    }
    val aggs = real.flatMap(c =>
      Seq(min(col(c)).as(s"_min_$c"), max(col(c)).as(s"_max_$c"))) ++
      bitmapCols.map(c =>
        call_function("bitmap_registers", col(c).cast("string")).as(s"_bm_$c")) ++
      (if (virtual.nonEmpty) Seq(count(lit(1)).as("_n_rows")) else Nil)
    df.groupBy(input_file_name().as("_file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect().toSeq.flatMap { r =>
        val file = r.getString(0)
        // the data dir name is attempt-unique, so locating it in the
        // URI is unambiguous regardless of scheme/authority spelling
        val at = file.indexOf("/" + dd + "/")
        require(at >= 0, s"Snapshots: file $file not under data dir $dd")
        val rel = file.substring(at + 1)
        real.zipWithIndex.flatMap { case (c, i) =>
          val lo = r.get(1 + 2 * i)
          val hi = r.get(2 + 2 * i)
          // NaN/Infinity (float columns) are not orderable decimals —
          // such a file simply gets no entry and is always read
          if (lo == null || hi == null) None
          else (scala.util.Try(BigDecimal(lo.toString)).toOption,
                scala.util.Try(BigDecimal(hi.toString)).toOption) match {
            case (Some(_), Some(_)) => Some(FileStat(c, lo.toString, hi.toString, rel))
            case _ => None
          }
        } ++ bitmapCols.zipWithIndex.map { case (c, j) =>
          val buckets = r.getSeq[Int](1 + 2 * real.length + j)
          // min = the hex bitmap, max = set-bucket count (diagnostic;
          // the BigDecimal range parse on `min` fails OPEN in
          // filterByStats, so a bitmap line can never break range
          // pruning on a like-named data column)
          FileStat(BitmapStatPrefix + c, bitmapHexOf(buckets),
            buckets.length.toString, rel)
        } ++ (if (virtual.nonEmpty) {
          val n = r.getLong(1 + 2 * real.length + bitmapCols.length).toString
          Seq(FileStat(RowCountCol, n, n, rel))
        } else Nil)
      }
  }

  /** The stats columns a follow-up commit should maintain: the
    * caller's explicit choice, else whatever the previous manifest
    * tracked — so the skipping index survives commits that don't
    * mention it. */
  private def effectiveStatsCols(statsCols: Seq[String], prev: Manifest): Seq[String] =
    if (statsCols.nonEmpty) statsCols else prev.stats.map(_.col).distinct

  /** List the parquet files under `p`, as paths relative to `root`. */
  private def listParquetRel(fs: FileSystem, root: Path, p: Path): Seq[String] = {
    if (!fs.exists(p)) return Nil
    val qualifiedRoot = fs.makeQualified(root).toString
    val it = fs.listFiles(p, true)
    val b = Seq.newBuilder[String]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        b += fs.makeQualified(st.getPath).toString
          .stripPrefix(qualifiedRoot).stripPrefix("/")
    }
    b.result()
  }

  /** Data files of a subset of a partitioned version's partitions,
    * relative to the table root. */
  private def partitionFilesRel(spark: SparkSession, tableDir: String,
                                m: Manifest, values: Seq[String]): Seq[String] = {
    val root = new Path(tableDir)
    val fs = fsOf(spark, root)
    val owned = m.partitions.toMap
    values.filter(owned.contains).flatMap { value =>
      listParquetRel(fs, root,
        new Path(new Path(root, owned(value)), partDirName(m.partCol, value)))
    }
  }

  /** List every data file of a version, relative to the table root. */
  private def versionFiles(spark: SparkSession, tableDir: String,
                           m: Manifest): Seq[String] = {
    val root = new Path(tableDir)
    val fs = fsOf(spark, root)
    m.dataDir match {
      case Some(dd) => listParquetRel(fs, root, new Path(root, dd))
      case None => partitionFilesRel(spark, tableDir, m, m.partitions.map(_._1))
    }
  }

  /** Keep the files whose recorded [min,max] for `statCol` intersects
    * [lower, upper]; files with no entry survive (conservative). */
  private def filterByStats(stats: Map[String, FileStat], files: Seq[String],
                            lower: BigDecimal, upper: BigDecimal): Seq[String] =
    files.filter { rel =>
      stats.get(rel) match {
        case Some(s) =>
          // a manifest hand-edited into an unparseable range must fail
          // OPEN (read the file), never fail the whole read
          scala.util.Try(
            BigDecimal(s.min) <= upper && BigDecimal(s.max) >= lower
          ).getOrElse(true)
        case None => true
      }
    }

  /** Read a set of relative file paths grouped by their owning data
    * dir, with basePath per owner so partition-column inference matches
    * the unpruned read; each owner's deletion vectors applied. */
  private def readFilesByOwner(spark: SparkSession, root: Path, m: Manifest,
                               rels: Seq[String]): DataFrame = {
    // resolve each file's owning dir against the manifest's dir set —
    // clone-borrowed dirs are absolute URIs, so "first path segment"
    // would misparse them
    val dirs = (m.dataDir.toSeq ++ m.partitions.map(_._2)).distinct
    def ownerOf(rel: String): String =
      dirs.find(d => rel.startsWith(d + "/")).getOrElse(rel.takeWhile(_ != '/'))
    rels.groupBy(ownerOf).map { case (owner, rs) =>
      applyDv(spark, root, m, owner,
        spark.read.option("basePath", new Path(root, owner).toString)
          .parquet(rs.map(new Path(root, _).toString): _*))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Range read with manifest-level data skipping: return the rows of
    * `version` where `statCol` ∈ [lower, upper], reading ONLY the
    * files whose recorded [min,max] intersects the range (plus any
    * file with no stat entry — conservative). With per-file stats on
    * a clustered column, a point/range read of a 100 TB snapshot
    * opens a handful of files instead of every file of every
    * referenced partition; the row-level filter still applies inside
    * the survivors, so results equal `readVersion(...).filter(...)`
    * exactly (proved in SnapshotsSpec with a scan-file assert). */
  def readVersionPruned(spark: SparkSession, tableDir: String, version: String,
                        statCol: String, lower: BigDecimal, upper: BigDecimal): DataFrame =
    readVersionPrunedMulti(spark, tableDir, version, Seq((statCol, lower, upper)))

  /** Conjunctive multi-column range read: rows where EVERY (col, lo,
    * hi) holds, reading only files whose recorded range intersects
    * every predicate's range. With a Z-ordered layout
    * ([[compactZOrdered]]) each file covers a small rectangle in the
    * clustered columns, so a 2D box prunes on BOTH dimensions without
    * materializing a curve key. Files lacking a stat for some column
    * survive that predicate (conservative); the row filter applies
    * inside survivors, so results equal the plain filtered read. */
  def readVersionPrunedMulti(spark: SparkSession, tableDir: String, version: String,
                             preds: Seq[(String, BigDecimal, BigDecimal)]): DataFrame = {
    require(preds.nonEmpty, "readVersionPrunedMulti: no predicates")
    val m = readManifest(spark, tableDir, version)
    val predicate = preds.map { case (c, lo, hi) =>
      col(c) >= lit(lo.underlying) && col(c) <= lit(hi.underlying)
    }.reduce(_ && _)
    if (m.stats.isEmpty) return readVersion(spark, tableDir, version).filter(predicate)
    val selected = preds.foldLeft(versionFiles(spark, tableDir, m)) {
      case (files, (c, lo, hi)) =>
        val colStats = m.stats.filter(_.col == c).map(s => s.relPath -> s).toMap
        filterByStats(colStats, files, lo, hi)
    }
    if (selected.isEmpty)
      return readVersion(spark, tableDir, version).filter(lit(false)).filter(predicate)
    val root = new Path(tableDir)
    val raw = m.dataDir match {
      case Some(dd) => applyDv(spark, root, m, dd,
        spark.read.parquet(selected.map(new Path(root, _).toString): _*))
      case None => readFilesByOwner(spark, root, m, selected)
    }
    manifestSchema(m).map(alignTo(raw, _)).getOrElse(raw).filter(predicate)
  }

  /** The files of `m` a key-set lookup must open: those whose
    * membership bitmap for `keyCol` has ANY probed key's bucket bit
    * set, plus files with no bitmap line (conservative — always
    * read). Package-private so specs can assert the skip count. */
  private[graft] def bitmapSelectedFiles(m: Manifest, files: Seq[String],
                                         keyCol: String,
                                         keys: Seq[String]): Seq[String] = {
    val bm = m.stats.filter(_.col == BitmapStatPrefix + keyCol)
      .map(s => s.relPath -> s.min).toMap
    val buckets = keys.map(bitmapBucketOf).distinct
    files.filter { rel =>
      bm.get(rel) match {
        case Some(hex) =>
          // a hand-mangled bitmap line fails OPEN (read the file)
          scala.util.Try(buckets.exists(b => bitmapHas(hex, b))).getOrElse(true)
        case None => true
      }
    }
  }

  /** Point/key-set lookup with bitmap file skipping: rows of
    * `version` where `keyCol` ∈ `keys`, opening ONLY the files whose
    * per-file membership bitmap ([[BitmapStatPrefix]] stat) hits a
    * probed bucket. Unlike [[readVersionPruned]]'s min/max ranges,
    * this skips under ANY physical layout — hash-distributed keys
    * included — because membership, not ordering, is what's indexed.
    * The row filter still applies inside survivors, so the result
    * equals `readVersion(...).filter(keyCol.isin(keys))` exactly;
    * bitmap false positives only cost IO, never correctness. */
  def readVersionKeyPruned(spark: SparkSession, tableDir: String, version: String,
                           keyCol: String, keys: Seq[Any]): DataFrame = {
    require(keys.nonEmpty, "readVersionKeyPruned: no keys")
    val m = readManifest(spark, tableDir, version)
    val predicate = col(keyCol).isin(keys: _*)
    // The per-file bitmaps were built from cast(col, 'string') —
    // SPARK's rendering. JVM String.valueOf differs for some types
    // (java.sql.Timestamp appends '.0', Float/Decimal edge forms), and
    // a probe hashed from the wrong string silently skips a file that
    // holds the key. Evaluate the probe strings through the same cast
    // (one local one-row projection, no job) so both sides of the
    // index agree for every key type.
    val probeStrings = {
      val cols = keys.zipWithIndex.map { case (k, i) =>
        lit(k).cast("string").as(s"_k$i")
      }
      val r = spark.range(1).select(cols: _*).head()
      // a key whose cast renders NULL can match no stored row (the
      // index stores only non-null renderings) — drop it from probes
      keys.indices.filterNot(r.isNullAt).map(r.getString)
    }
    if (probeStrings.isEmpty)
      return readVersion(spark, tableDir, version).filter(lit(false)).filter(predicate)
    val selected = bitmapSelectedFiles(m, versionFiles(spark, tableDir, m),
      keyCol, probeStrings)
    if (selected.isEmpty)
      return readVersion(spark, tableDir, version).filter(lit(false)).filter(predicate)
    val root = new Path(tableDir)
    val raw = m.dataDir match {
      case Some(dd) => applyDv(spark, root, m, dd,
        spark.read.parquet(selected.map(new Path(root, _).toString): _*))
      case None => readFilesByOwner(spark, root, m, selected)
    }
    manifestSchema(m).map(alignTo(raw, _)).getOrElse(raw).filter(predicate)
  }

  // ------------------------------------------------ write-audit-publish

  /** Stage `df` as an UNPUBLISHED data dir: bytes land on storage but
    * no manifest references them, so every reader — live, time-travel,
    * CDF — is oblivious. The write-audit-publish branch primitive:
    * audit the staged bytes with [[readStaged]] (expectations, row
    * counts, referential checks — the exact files that will serve
    * reads, not a copy), then either [[publishStaged]] (atomic CAS,
    * zero data movement) or [[abandonStaged]]. A stage that crashes
    * mid-audit is the already-handled orphan-dir case: invisible
    * forever, swept by [[vacuum]] after the grace window — so finish
    * (or abandon) an audit within `orphanGraceMs`, or raise it. */
  def stageOverwrite(spark: SparkSession, tableDir: String, df: DataFrame): String = {
    val dir = new Path(tableDir)
    fsOf(spark, dir).mkdirs(dir)
    val dd = newDataDirName()
    df.write.mode(SaveMode.ErrorIfExists).parquet(new Path(dir, dd).toString)
    dd
  }

  /** Read a staged (unpublished) data dir for auditing. */
  def readStaged(spark: SparkSession, tableDir: String, staged: String): DataFrame = {
    require(staged.startsWith("d-"),
      s"Snapshots.readStaged: '$staged' is not a staged data dir name")
    spark.read.parquet(new Path(new Path(tableDir), staged).toString)
  }

  /** Publish a staged dir as the next table version — the commit half
    * of write-audit-publish. Metadata-only: the manifest re-references
    * the audited files byte-identically (what was audited IS what
    * readers get). Installed CHECK constraints still gate the claim
    * ([[tryClaim]] → validateChecks), so a stale audit can't sneak a
    * violating batch in. Overwrite semantics are base-independent, so
    * a concurrent commit landing between stage and publish just bumps
    * the claimed number. */
  def publishStaged(spark: SparkSession, tableDir: String, staged: String,
                    statsCols: Seq[String] = Nil): String = {
    val dir = new Path(tableDir)
    val fs = fsOf(spark, dir)
    require(fs.exists(new Path(dir, staged)),
      s"Snapshots.publishStaged: staged dir $staged is gone (abandoned or vacuumed)")
    val df = readStaged(spark, tableDir, staged)
    val prevCols = currentVersion(spark, tableDir)
      .map(v => readManifest(spark, tableDir, v)).map(effectiveStatsCols(statsCols, _))
      .getOrElse(statsCols)
    val stats = computeFileStats(spark, dir, staged, prevCols)
    val m = Manifest(Some(staged), "", Nil, Some(df.schema.json), stats)
    var n = listVersions(spark, tableDir).lastOption.map(versionNumber).getOrElse(0) + 1
    while (!tryClaim(spark, tableDir, n, m)) n += 1
    versionName(n)
  }

  /** Drop a staged dir that failed its audit. Refuses to touch a dir
    * any retained manifest references (i.e. one that was published —
    * that is [[vacuum]]'s job, governed by retention). */
  def abandonStaged(spark: SparkSession, tableDir: String, staged: String): Unit = {
    require(staged.startsWith("d-"),
      s"Snapshots.abandonStaged: '$staged' is not a staged data dir name")
    val referenced = listVersions(spark, tableDir).flatMap { v =>
      val m = readManifest(spark, tableDir, v)
      m.dataDir.toSeq ++ m.partitions.map(_._2) ++ m.dvs.map(_._1)
    }.toSet
    require(!referenced.contains(staged),
      s"Snapshots.abandonStaged: $staged is referenced by a published version")
    fsOf(spark, new Path(tableDir)).delete(new Path(new Path(tableDir), staged), true)
  }

  /** COUNT(*) per partition from the MANIFEST alone — zero data files
    * opened. Requires the table to track [[RowCountCol]] stats and to
    * have no pending deletion vectors (DV rows are physically present
    * in the counted files; counting them would overcount — compact
    * first). Whole-table layouts report one row with partition "".
    *
    * Why this matters at 100 TB: a COUNT(*) / per-partition row-count
    * audit over a petabyte table becomes an O(manifest) driver read —
    * the same query as a scan costs a full pass over every file's
    * pages. This is the audit-count query (SURVEY §2 #8) at lakehouse
    * scale: the nightly "did every partition land" check runs in
    * milliseconds however large the table grows. */
  def metadataRowCounts(spark: SparkSession, tableDir: String,
                        version: String): DataFrame = {
    import spark.implicits._
    val m = readManifest(spark, tableDir, version)
    require(m.dvs.isEmpty,
      "Snapshots.metadataRowCounts: pending deletion vectors would make " +
        "file counts overcount; compact (or read the data path) first")
    val rows = m.stats.filter(_.col == RowCountCol)
    require(rows.nonEmpty,
      s"Snapshots.metadataRowCounts: version $version tracks no $RowCountCol " +
        "stats — commit with statsCols including Snapshots.RowCountCol")
    m.dataDir match {
      case Some(_) =>
        Seq(("", rows.map(s => s.min.toLong).sum)).toDF("partition", "n_rows")
      case None =>
        partitionRowCounts(m, rows).toDF("partition", "n_rows")
          .orderBy(col("partition"))
    }
  }

  /** Per-partition sums of `_rows` stat lines: each file attributed to
    * its (dir, partition) exactly like [[carriedStats]] — dir prefix +
    * the partition subdir segment. */
  /** Does stat line `st` belong to partition `value` owned by data
    * dir `dd`? Dir prefix + the partition subdir segment, exactly
    * like [[carriedStats]]. */
  private def statInPartition(st: FileStat, value: String, dd: String): Boolean =
    st.relPath.startsWith(dd + "/") && {
      val rest = st.relPath.substring(dd.length + 1).split("/")
      rest.length == 2 && {
        val eq = rest(0).lastIndexOf('=')
        eq > 0 && org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(rest(0).substring(eq + 1)) == value
      }
    }

  private def partitionRowCounts(m: Manifest,
                                 rows: Seq[FileStat]): Seq[(String, Long)] =
    m.partitions.map { case (value, dd) =>
      (value, rows.filter(statInPartition(_, value, dd)).map(_.min.toLong).sum)
    }

  /** Manifest-only MIN/MAX per partition for a tracked stats column:
    * min of the per-file mins / max of the per-file maxes — the
    * Iceberg-style aggregate pushdown that answers a MIN/MAX query
    * by reading O(manifest) bytes and ZERO data files. Same safety
    * rails as [[metadataRowCounts]]: pending deletion vectors could
    * have removed the extreme row, so they must be compacted first;
    * a version that doesn't track the column fails loudly. Decimal
    * strings parse back to the exact doubles the writer recorded, so
    * the answer is bit-identical to the data-path aggregate. */
  def metadataMinMax(spark: SparkSession, tableDir: String,
                     version: String, statCol: String): DataFrame = {
    import spark.implicits._
    val m = readManifest(spark, tableDir, version)
    require(m.dvs.isEmpty,
      "Snapshots.metadataMinMax: pending deletion vectors could have " +
        "removed the extreme row; compact (or read the data path) first")
    val sts = m.stats.filter(_.col == statCol)
    require(sts.nonEmpty,
      s"Snapshots.metadataMinMax: version $version tracks no '$statCol' " +
        "stats — commit with statsCols including it")
    def roll(group: Seq[FileStat]): (Double, Double) =
      (group.map(s => BigDecimal(s.min)).min.toDouble,
        group.map(s => BigDecimal(s.max)).max.toDouble)
    m.dataDir match {
      case Some(_) =>
        val (lo, hi) = roll(sts)
        Seq(("", lo, hi)).toDF("partition", "min_v", "max_v")
      case None =>
        m.partitions.flatMap { case (value, dd) =>
          val here = sts.filter(statInPartition(_, value, dd))
          if (here.isEmpty) None else {
            val (lo, hi) = roll(here)
            Some((value, lo, hi))
          }
        }.toDF("partition", "min_v", "max_v").orderBy(col("partition"))
    }
  }

  /** Partition-level drift between two retained versions, computed
    * from the two MANIFESTS alone (requires [[RowCountCol]] tracking
    * and no pending DVs on either side): per partition, the row counts
    * on each side, the delta, and the status — `added` / `removed` /
    * `rewritten` (owning dir changed) / `unchanged` (same immutable
    * dir, byte-identical files).
    *
    * The O(manifest) answer to "what did that commit touch, and how
    * big was it" — the pre-flight audit an incremental consumer (IVM
    * refresh, CDC poller, downstream retrain trigger) runs to decide
    * whether reading the actual delta is worth it. On a 100 TB table
    * this reads two manifest files; the data-path equivalent
    * ([[diffVersions]]) reads both versions end to end. */
  def metadataPartitionDrift(spark: SparkSession, tableDir: String,
                             vOld: String, vNew: String): DataFrame = {
    import spark.implicits._
    val mo = readManifest(spark, tableDir, vOld)
    val mn = readManifest(spark, tableDir, vNew)
    require(mo.dataDir.isEmpty && mn.dataDir.isEmpty && mo.partCol == mn.partCol,
      "Snapshots.metadataPartitionDrift: both versions must be partitioned " +
        "layouts over the same partition column")
    require(mo.dvs.isEmpty && mn.dvs.isEmpty,
      "Snapshots.metadataPartitionDrift: pending deletion vectors would make " +
        "file counts overcount; compact first")
    def rowsOf(m: Manifest): Seq[FileStat] = {
      val r = m.stats.filter(_.col == RowCountCol)
      require(r.nonEmpty,
        s"Snapshots.metadataPartitionDrift: no $RowCountCol stats tracked")
      r
    }
    val co = partitionRowCounts(mo, rowsOf(mo)).toMap
    val cn = partitionRowCounts(mn, rowsOf(mn)).toMap
    val dirO = mo.partitions.toMap
    val dirN = mn.partitions.toMap
    (co.keySet ++ cn.keySet).toSeq.sorted.map { p =>
      val status = (dirO.get(p), dirN.get(p)) match {
        case (None, Some(_))                  => "added"
        case (Some(_), None)                  => "removed"
        case (Some(a), Some(b)) if a == b     => "unchanged"
        case _                                => "rewritten"
      }
      (p, co.getOrElse(p, 0L), cn.getOrElse(p, 0L),
        cn.getOrElse(p, 0L) - co.getOrElse(p, 0L), status)
    }.toDF("partition", "old_rows", "new_rows", "delta", "status")
      .orderBy(col("partition"))
  }

  /** Schema drift between two retained versions from the MANIFESTS
    * alone: per column, `added` / `removed` / `type_changed` /
    * `unchanged` with both declared types. The companion audit to
    * [[metadataPartitionDrift]] — a downstream consumer checks its
    * read contract against the new version in O(manifest) before
    * touching data (manifests have carried the declared schema since
    * the add-column evolution work; versions predating schema
    * tracking are refused loudly). */
  def metadataSchemaDrift(spark: SparkSession, tableDir: String,
                          vOld: String, vNew: String): DataFrame = {
    import spark.implicits._
    def schemaOf(v: String): org.apache.spark.sql.types.StructType =
      manifestSchema(readManifest(spark, tableDir, v)).getOrElse(
        throw new IOException(
          s"Snapshots.metadataSchemaDrift: version $v carries no schema"))
    val so = schemaOf(vOld)
    val sn = schemaOf(vNew)
    val om = so.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val nm = sn.fields.map(f => f.name -> f.dataType.simpleString).toMap
    (om.keySet ++ nm.keySet).toSeq.sorted.map { c =>
      val status = (om.get(c), nm.get(c)) match {
        case (None, Some(_))              => "added"
        case (Some(_), None)              => "removed"
        case (Some(a), Some(b)) if a == b => "unchanged"
        case _                            => "type_changed"
      }
      (c, om.getOrElse(c, null), nm.getOrElse(c, null), status)
    }.toDF("column", "old_type", "new_type", "status")
      .orderBy(col("column"))
  }

  /** Incremental view maintenance for a grouped (count, sum)
    * aggregate: apply the vOld→vNew change feed as SIGNED deltas to a
    * previously materialized aggregate instead of rescanning the
    * table — inserts and update post-images add, deletes and update
    * pre-images subtract (count and sum are decomposable abelian
    * aggregates, so signed application is exact; decimal sums carry
    * no rounding). Work scales with the CHANGES — with the
    * manifest-pruned CDF, refreshing a daily aggregate over a 100 TB
    * table reads one partition's delta, not the table. Groups whose
    * count reaches zero drop out, exactly as a recompute would. */
  def maintainAggregate(spark: SparkSession, tableDir: String, vOld: String,
                        vNew: String, key: String, groupCol: String,
                        valCol: String, baseAgg: DataFrame): DataFrame = {
    val cdf = changeFeed(spark, tableDir, vOld, vNew, key)
    val sign = when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val delta = cdf.select(col(groupCol), sign.as("_sg"), col(valCol))
      .groupBy(col(groupCol))
      .agg(sum(col("_sg")).as("_dn"),
        sum(col(valCol) * col("_sg")).as("_dsum"))
    baseAgg.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("_dn"), lit(0L))).as("n"),
        (coalesce(col("value_sum"), lit(0)) + coalesce(col("_dsum"), lit(0)))
          .as("value_sum"))
      .filter(col("n") > 0)
  }

  /** Incremental maintenance of a two-table JOIN view's aggregate from
    * BOTH tables' change feeds — the join extension of
    * [[maintainAggregate]]. View: A ⋈ B on A.`fkCol` = B.`keyB`,
    * grouped by B.`groupCol`, aggregating count + sum(A.`valCol`).
    * The signed delta is the standard IVM expansion
    *   ΔV = ΔA⋈B₀ + A₀⋈ΔB + ΔA⋈ΔB
    * (signs multiply in the last term), applied to `baseAgg` — the
    * view at (vA0, vB0) — with a full-outer merge. Equals recomputing
    * the view at (vA1, vB1) exactly (gated: q137), at delta-join cost:
    * the only non-delta-sized input is one scan each of A₀ and B₀
    * pruned to the join/group columns, and the delta sides broadcast.
    * At 100 TB this is the difference between re-joining two fact
    * tables nightly and joining yesterday's changes. */
  def maintainJoinAggregate(spark: SparkSession,
                            dirA: String, vA0: String, vA1: String,
                            keyA: String, fkCol: String, valCol: String,
                            dirB: String, vB0: String, vB1: String,
                            keyB: String, groupCol: String,
                            baseAgg: DataFrame): DataFrame = {
    def signed(cdf: DataFrame): DataFrame = cdf.withColumn("_sg",
      when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
        .otherwise(lit(-1L)))
    val dA = signed(changeFeed(spark, dirA, vA0, vA1, keyA))
      .select(col(fkCol), col(valCol), col("_sg").as("_sa"))
    val dB = signed(changeFeed(spark, dirB, vB0, vB1, keyB))
      .select(col(keyB).as(fkCol), col(groupCol), col("_sg").as("_sb"))
    val a0 = readVersion(spark, dirA, vA0).select(col(fkCol), col(valCol))
    val b0 = readVersion(spark, dirB, vB0).select(col(keyB).as(fkCol), col(groupCol))
    val t1 = broadcast(dA).join(b0, Seq(fkCol))
      .select(col(groupCol), col("_sa").as("_sg"), col(valCol))
    val t2 = a0.join(broadcast(dB), Seq(fkCol))
      .select(col(groupCol), col("_sb").as("_sg"), col(valCol))
    val t3 = dA.join(dB, Seq(fkCol))
      .select(col(groupCol), (col("_sa") * col("_sb")).as("_sg"), col(valCol))
    val delta = t1.unionByName(t2).unionByName(t3)
      .groupBy(col(groupCol))
      .agg(sum(col("_sg")).as("_dn"),
        sum(col(valCol) * col("_sg")).as("_dsum"))
    baseAgg.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("_dn"), lit(0L))).as("n"),
        (coalesce(col("value_sum"), lit(0)) + coalesce(col("_dsum"), lit(0)))
          .as("value_sum"))
      .filter(col("n") > 0)
  }

  // ---------------------------------------------------------------- diff

  /** Row-level diff of two retained versions by `key`: one row per key
    * present in either version, labeled `added` (new only), `removed`
    * (old only), `changed` (payload differs, null-safe struct compare)
    * or `unchanged`. Columns: key, `_old`/`_new` payload structs,
    * `change`. One full-outer shuffle on the key — inherent for a
    * whole-table diff; use [[diffVersionsPartitioned]] when both
    * versions are partitioned commits. */
  def diffVersions(spark: SparkSession, tableDir: String, vOld: String,
                   vNew: String, key: String): DataFrame =
    diffFrames(readVersion(spark, tableDir, vOld),
      readVersion(spark, tableDir, vNew), key)

  /** As [[diffVersions]] but manifest-pruned: a partition whose entry
    * names the SAME data dir in both manifests is byte-identical by
    * construction (data dirs are immutable) and is skipped without
    * reading a row. After a daily single-partition
    * [[commitMergePartitioned]], diffing the two versions of a 100 TB
    * table reads two copies of ONE partition — the manifest does the
    * partition pruning that a naive diff would pay a full-table
    * full-outer join for. */
  def diffVersionsPartitioned(spark: SparkSession, tableDir: String, vOld: String,
                              vNew: String, key: String): DataFrame = {
    val mo = readManifest(spark, tableDir, vOld)
    val mn = readManifest(spark, tableDir, vNew)
    require(mo.dataDir.isEmpty && mn.dataDir.isEmpty && mo.partCol == mn.partCol,
      s"diffVersionsPartitioned: $vOld/$vNew of $tableDir are not partitioned commits " +
        "on the same column")
    val oldOwn = mo.partitions.toMap
    val newOwn = mn.partitions.toMap
    // same immutable dir ⇒ same bytes — but only with the SAME
    // deletion vectors targeting it; a DV delete between the versions
    // changes a partition's effective rows without re-pointing its dir
    def dvsFor(m: Manifest, dir: String): Set[String] =
      m.dvs.filter(_._2 == dir).map(_._1).toSet
    val changed = (oldOwn.keySet ++ newOwn.keySet)
      .filter(v => oldOwn.get(v) != newOwn.get(v) ||
        dvsFor(mo, oldOwn(v)) != dvsFor(mn, newOwn(v))).toSeq.sorted
    def side(m: Manifest, version: String): DataFrame =
      readPartitionsSubset(spark, tableDir, m, changed)
        .getOrElse(readVersion(spark, tableDir, version).filter(lit(false))) // schema-only
    diffFrames(side(mo, vOld), side(mn, vNew), key)
  }

  private def diffFrames(o0: DataFrame, n0: DataFrame, key: String): DataFrame = {
    require(o0.columns.contains(key) && n0.columns.contains(key),
      s"diff: key '$key' must exist in both versions")
    // columns present in only one version (add-column evolution) are
    // padded as typed NULLs on the other side, so a row whose new
    // column is NULL in the new version compares 'unchanged' — the
    // same reconciliation readVersion applies to pre-evolution files
    def pad(df: DataFrame, other: DataFrame): DataFrame =
      other.schema.fields.filterNot(f => df.columns.contains(f.name))
        .foldLeft(df)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
    val o = pad(o0, n0)
    val n = pad(n0, o0)
    val payload = (o0.columns ++ n0.columns.filterNot(o0.columns.contains))
      .filterNot(_ == key).toSeq
    val os = o.select(col(key), struct(payload.map(col): _*).as("_old"))
    val ns = n.select(col(key), struct(payload.map(col): _*).as("_new"))
    os.join(ns, Seq(key), "full_outer")
      .withColumn("change",
        when(col("_old").isNull, lit("added"))
          .when(col("_new").isNull, lit("removed"))
          .when(!(col("_old") <=> col("_new")), lit("changed"))
          .otherwise(lit("unchanged")))
  }

  // -------------------------------------------------------------- vacuum

  /** Retention: drop commit manifests except the newest `keep` (the
    * live one always survives), then delete data dirs no remaining
    * manifest references — EXCEPT unreferenced dirs younger than
    * `orphanGraceMs`, which may be a concurrent committer's in-flight
    * write (its claim hasn't landed yet). Callers choose `keep` longer
    * than their longest reader and a grace longer than their longest
    * write. Returns the number of versions (manifests) removed. */
  def vacuum(spark: SparkSession, tableDir: String, keep: Int = 2,
             orphanGraceMs: Long = 3600000L): Int = {
    val dir = new Path(tableDir)
    val fs = fsOf(spark, dir)
    val versions = listVersions(spark, tableDir)
    val kept = versions.takeRight(math.max(keep, 1))
    val doomed = versions.dropRight(math.max(keep, 1))
    doomed.foreach(v => fs.delete(new Path(new Path(tableDir, CommitDir), v), false))
    val referenced: Set[String] = kept.flatMap { v =>
      val m = readManifest(spark, tableDir, v)
      m.dataDir.toSeq ++ m.partitions.map(_._2) ++ m.dvs.map(_._1)
    }.toSet
    val cutoff = System.currentTimeMillis() - math.max(orphanGraceMs, 0L)
    if (fs.exists(dir)) fs.listStatus(dir).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("d-"))
      .filter(st => !referenced.contains(st.getPath.getName))
      .filter(st => st.getModificationTime < cutoff)
      .foreach(st => fs.delete(st.getPath, true))
    // stray .tmp-* manifests (a claimant that died between create and
    // rename) are invisible to readers but would otherwise accumulate
    // forever; aged ones are safe to sweep — an in-flight claim is
    // younger than the grace window by the same argument as data dirs
    val commits = new Path(dir, CommitDir)
    if (fs.exists(commits)) fs.listStatus(commits).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith(".tmp-"))
      .filter(st => st.getModificationTime < cutoff)
      .foreach(st => fs.delete(st.getPath, false))
    // same sweep for a dead setCheck's tmp file in the table root
    if (fs.exists(dir)) fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith(".tmp-checks-"))
      .filter(st => st.getModificationTime < cutoff)
      .foreach(st => fs.delete(st.getPath, false))
    doomed.size
  }
}
