package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** Manifest-committed versioned table: reader atomicity, upsert
  * semantics, crash behavior, vacuum retention. */
class SnapshotsSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_snap").toString + "/t"

  test("commitOverwrite publishes; read returns exactly the committed rows") {
    val dir = freshDir()
    val v1 = Snapshots.commitOverwrite(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    assert(v1 === "v00000001")
    assert(Snapshots.currentVersion(spark, dir) === Some("v00000001"))
    assert(Snapshots.read(spark, dir).orderBy("k").as[(Long, String)].collect()
      .toSeq === Seq((1L, "a"), (2L, "b")))
  }

  test("second commit advances the manifest; the old version stays readable (pinned reader)") {
    val dir = freshDir()
    Snapshots.commitOverwrite(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    // a long-running reader resolves the manifest BEFORE the next commit
    val pinned = Snapshots.currentVersion(spark, dir).get
    val v2 = Snapshots.commitOverwrite(spark, dir, Seq((1L, "A"), (3L, "c")).toDF("k", "v"))
    assert(v2 === "v00000002")
    // live readers see v2...
    assert(Snapshots.read(spark, dir).count() === 2)
    // ...while the pinned reader still reads its complete v1 snapshot
    assert(Snapshots.readVersion(spark, dir, pinned).as[(Long, String)].collect()
      .toSeq === Seq((1L, "a")))
  }

  test("a crashed commit (data written, manifest not swapped) leaves readers untouched; next commit skips past it") {
    val dir = freshDir()
    Snapshots.commitOverwrite(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    // simulate a writer that died after the data write, before publish:
    // the version dir exists but _CURRENT still names v1
    Seq((9L, "junk")).toDF("k", "v").write.parquet(s"$dir/v00000002")
    assert(Snapshots.currentVersion(spark, dir) === Some("v00000001"))
    assert(Snapshots.read(spark, dir).as[(Long, String)].collect().toSeq === Seq((1L, "a")))
    // the next commit allocates v3 (never reuses the orphan's number in
    // a way that could publish partial data) and publishes atomically
    val v3 = Snapshots.commitOverwrite(spark, dir, Seq((2L, "b")).toDF("k", "v"))
    assert(v3 === "v00000003")
    assert(Snapshots.read(spark, dir).as[(Long, String)].collect().toSeq === Seq((2L, "b")))
  }

  test("commitUpsert: delta wins on collision, inserts new keys, first commit bootstraps") {
    val dir = freshDir()
    Snapshots.commitUpsert(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "k")
    Snapshots.commitUpsert(spark, dir, Seq((2L, "B"), (3L, "c")).toDF("k", "v"), "k")
    assert(Snapshots.read(spark, dir).orderBy("k").as[(Long, String)].collect()
      .toSeq === Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("vacuum drops old versions, never the live one; read survives") {
    val dir = freshDir()
    (1 to 4).foreach(i => Snapshots.commitOverwrite(spark, dir, Seq((i.toLong, s"v$i")).toDF("k", "v")))
    assert(Snapshots.listVersions(spark, dir).size === 4)
    val removed = Snapshots.vacuum(spark, dir, keep = 2)
    assert(removed === 2)
    assert(Snapshots.listVersions(spark, dir) === Seq("v00000003", "v00000004"))
    assert(Snapshots.read(spark, dir).as[(Long, String)].collect().toSeq === Seq((4L, "v4")))
    // vacuum(keep=1) keeps only the live version
    assert(Snapshots.vacuum(spark, dir, keep = 1) === 1)
    assert(Snapshots.read(spark, dir).count() === 1)
  }
}
