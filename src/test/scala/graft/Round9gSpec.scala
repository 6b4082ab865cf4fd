package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Sampling, TextAnalysis, Vectors}

/** Round-9 seventh batch: kNN graph, IVF health stats, corpus
  * fingerprint, temporal embargo split. */
class Round9gSpec extends SparkSpec {
  import spark.implicits._

  private def clusteredEmb(): String = {
    val dir = Files.createTempDirectory("graft_r9g").toString
    (0L until 480L).map { vid =>
      val c = (vid % 4).toInt
      val emb = Array.tabulate(16) { i =>
        val base = if (i / 4 == c) 1.0f else 0.0f
        base + (((vid * 2654435761L + i * 97L) % 1000L) - 500L) / 10000.0f
      }
      (vid, emb)
    }.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  // ---------------------------------------------------------- q253

  test("knn graph: every vector's nearest neighbor shares its planted cluster; ranks dense, scores ordered") {
    val out = Vectors.knnGraph(spark, clusteredEmb()).collect()
    val bySrc = out.groupBy(_.getAs[Long]("src"))
    assert(bySrc.size === 480)
    bySrc.foreach { case (src, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rk"))
      assert(sorted.map(_.getAs[Long]("rk")).toSeq ===
        (1L to sorted.length.toLong), s"src=$src ranks")
      val cos = sorted.map(_.getAs[Double]("cos"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }, s"src=$src order")
      // top neighbor is a planted-cluster mate
      assert(sorted.head.getAs[Long]("dst") % 4 === src % 4, s"src=$src top")
    }
  }

  // ---------------------------------------------------------- q254

  test("ivf cell stats: loads sum to the corpus, ppm/mean/hot are the exact integer formulas") {
    val out = Vectors.ivfCellStats(spark, clusteredEmb()).collect()
    val nTotal = out.map(_.getAs[Long]("n_vecs")).sum
    assert(nTotal === 480L)
    val nCells = out.length.toLong
    out.foreach { r =>
      val n = r.getAs[Long]("n_vecs")
      assert(r.getAs[Long]("load_ppm") === 1000000L * n / nTotal)
      assert(r.getAs[Long]("mean_load") === nTotal / nCells)
      assert(r.getAs[Int]("hot") === (if (n * nCells > 2 * nTotal) 1 else 0))
    }
  }

  // ---------------------------------------------------------- q255

  test("corpus fingerprint: invariant to row order and partitioning; moved by any content change") {
    def write(dir: String, rows: Seq[(Long, String)], parts: Int): Unit =
      rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(parts)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = (0L until 50L).map(i => (i, s"text body $i"))
    val a = Files.createTempDirectory("graft_fp_a").toString
    val b = Files.createTempDirectory("graft_fp_b").toString
    val c = Files.createTempDirectory("graft_fp_c").toString
    write(a, rows, 1)
    write(b, scala.util.Random.shuffle(rows), 7) // order + layout differ
    write(c, rows.updated(13, (13L, "text body 13!")), 1) // one char changed
    def fp(dir: String) = TextAnalysis.corpusFingerprint(spark, dir)
      .collect().head.toSeq
    assert(fp(a) === fp(b))
    val (fa, fc) = (fp(a), fp(c))
    assert(fa(0) === fc(0))   // same row count
    assert(fa(1) !== fc(1))   // digest moved
  }

  // ---------------------------------------------------------- q256

  test("temporal embargo split: planted user splits exactly; gap is the audited train-to-test distance") {
    val dir = Files.createTempDirectory("graft_emb").toString
    val rows = Seq(
      (1L, 1L, "2024-01-20 10:00:00"), // train
      (2L, 1L, "2024-01-23 10:00:00"), // embargo zone
      (3L, 1L, "2024-01-25 10:00:00"), // test
      (4L, 2L, "2024-01-10 09:00:00")) // train-only user
    rows.map { case (eid, uid, ts) =>
      (eid, Timestamp.valueOf(ts), uid, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // expected parts derived from the same epoch arithmetic the
    // operator uses (robust to the JVM timezone of the fixture write)
    val tus = rows.map { case (eid, _, ts) =>
      eid -> Timestamp.valueOf(ts).getTime * 1000L }.toMap
    def partOf(t: Long): String =
      if (t >= Sampling.EmbargoCutoffUs) "test"
      else if (t >= Sampling.EmbargoCutoffUs - Sampling.EmbargoUs) "embargo"
      else "train"
    assert(partOf(tus(1L)) === "train" && partOf(tus(2L)) === "embargo" &&
      partOf(tus(3L)) === "test")
    val out = Sampling.temporalEmbargoSplit(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_train"), r.getAs[Long]("n_embargo"),
          r.getAs[Long]("n_test"),
          if (r.isNullAt(r.fieldIndex("gap_us"))) None
          else Some(r.getAs[Long]("gap_us")))).toMap
    assert(out(1L) === ((1L, 1L, 1L, Some(tus(3L) - tus(1L)))))
    assert(out(2L) === ((1L, 0L, 0L, None)))
    // the gap can never be below the embargo width when both sides exist
    assert(out(1L)._4.get >= Sampling.EmbargoUs)
  }
}
