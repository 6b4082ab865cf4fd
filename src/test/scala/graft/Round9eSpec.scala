package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Snapshots

/** Round-9 fifth batch: zero-copy shallow clone, seasonal-naive
  * forecast backtesting, and embedding distribution drift. */
class Round9eSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- q244

  test("shallow clone: zero-copy read equality, pinned against source advance, CoW divergence") {
    val root = Files.createTempDirectory("graft_clone").toString
    val src = s"$root/src"
    val dst = s"$root/dst"
    val base = (1L to 100L).map(k => (k, s"row$k", (k % 7).toDouble))
      .toDF("k", "name", "x")
    Snapshots.commitOverwrite(spark, src, base, statsCols = Seq("k"))
    val v1 = Snapshots.shallowClone(spark, src, dst)
    assert(v1 === "v00000001")
    // zero-copy: the clone dir holds ONLY the commit log, no data dirs
    val dstFiles = new java.io.File(dst).listFiles().map(_.getName).toSet
    assert(dstFiles === Set("_commits"), s"clone wrote data: $dstFiles")
    // read equality at clone time
    val srcRows = Snapshots.readVersion(spark, src, "v00000001")
      .orderBy("k").collect().map(_.toSeq)
    val cloneRows = Snapshots.readVersion(spark, dst, v1)
      .orderBy("k").collect().map(_.toSeq)
    assert(cloneRows.toSeq === srcRows.toSeq)
    // stats travel: a pruned read through the clone's rewritten
    // relPaths answers correctly
    val pruned = Snapshots.readVersionPruned(spark, dst, v1, "k",
      BigDecimal(10), BigDecimal(20)).collect()
    assert(pruned.map(_.getAs[Long]("k")).sorted.toSeq === (10L to 20L).toSeq)
    // source advances → the clone is pinned to what it cloned
    Snapshots.commitOverwrite(spark, src,
      base.filter(col("k") <= 50L), statsCols = Seq("k"))
    assert(Snapshots.readVersion(spark, dst, v1).count() === 100L)
    // clone diverges copy-on-write; the source's live stays at 50
    Snapshots.commitDelete(spark, dst, col("k") > 90L)
    val dstLive = Snapshots.currentVersion(spark, dst).get
    assert(Snapshots.readVersion(spark, dst, dstLive).count() === 90L)
    assert(Snapshots.readVersion(spark, src,
      Snapshots.currentVersion(spark, src).get).count() === 50L)
  }

  // ---------------------------------------------------------- q245

  test("forecast backtest: hand-computed seasonal-naive errors; calendar gaps don't slip the season") {
    val dir = Files.createTempDirectory("graft_fc").toString
    import java.sql.Date
    // Mondays 1/1, 1/8, 1/15 revenue 10, 12, 9 → errors +2, −3 on
    // the two scored days; a gap day (1/9 Tue) has no d−7 → unscored
    Seq(
      (1L, Date.valueOf("2024-01-01"), 10.0),
      (2L, Date.valueOf("2024-01-08"), 12.0),
      (3L, Date.valueOf("2024-01-15"), 9.0),
      (4L, Date.valueOf("2024-01-09"), 5.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = graft.operators.TimeSeries.forecastBacktest(spark, dir).collect()
    assert(out.length === 1) // only Mondays scored
    val r = out.head
    assert(r.getAs[Long]("dow") === 2L) // Spark dayofweek: Monday = 2
    assert(r.getAs[Long]("n_days") === 2L)
    assert(r.getAs[Long]("sum_abs_err_cents") === 500L) // |+200| + |−300|
    assert(r.getAs[Long]("sum_err_cents") === -100L)    // +200 − 300
    assert(r.getAs[Long]("mae_cents") === 250L)
  }

  // ---------------------------------------------------------- q246

  test("embedding drift: identical halves read zero; a planted shift reads the exact cross term") {
    val dir = Files.createTempDirectory("graft_drift").toString
    // even ids: all components 0.5; odd ids: dim 0 shifted to 0.75
    (0L until 8L).map { vid =>
      val emb = Array.tabulate(4)(i =>
        if (vid % 2 == 1 && i == 0) 0.75f else 0.5f)
      (vid, emb)
    }.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.operators.Vectors.embeddingDrift(spark, dir).collect()
      .map(r => r.getAs[Long]("dim") ->
        (r.getAs[Long]("n0"), r.getAs[Long]("n1"), r.getAs[Long]("abs_cross"))).toMap
    // dims 1..3: means equal → cross term exactly 0
    (1L to 3L).foreach(d => assert(out(d) === ((4L, 4L, 0L)), s"dim $d"))
    // dim 0: |4·500000·4 − 4·750000·4| = 4_000_000
    assert(out(0L) === ((4L, 4L, 4000000L)))
  }

  test("shallow clone carries deletion vectors") {
    val root = Files.createTempDirectory("graft_clone_dv").toString
    val src = s"$root/src"
    val dst = s"$root/dst"
    Snapshots.commitOverwrite(spark, src,
      (1L to 20L).map(k => (k, s"n$k")).toDF("k", "name"))
    Snapshots.commitDeleteVector(spark, src,
      Seq(3L, 4L, 5L).toDF("k"), "k")
    Snapshots.shallowClone(spark, src, dst)
    val ks = Snapshots.readVersion(spark, dst, "v00000001")
      .select("k").as[Long].collect().sorted.toSeq
    assert(ks === ((1L to 20L).filterNot(Set(3L, 4L, 5L))).toSeq)
  }
}
