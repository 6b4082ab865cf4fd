package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Sharding, TextAnalysis}

/** Degenerate-input hardening for the text/ordering operators behind
  * q73/q76/q77/q78: empty corpus, all-empty documents, MAD = 0
  * (constant-length corpus), shards ≫ occupied buckets. Expected
  * values are the closed forms the DuckDB oracle computes over the
  * same inputs — the planted cases assert the exact numbers, not just
  * absence of crashes. */
class DegenerateInputSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(docs: Seq[(Long, String, String, String, Long)]): String = {
    val dir = Files.createTempDirectory("graft_degen").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("empty corpus: length/oov/shard/bucket operators return zero rows, no errors") {
    val dir = corpus(Seq.empty)
    assert(TextAnalysis.lengthOutliers(spark, dir).count() === 0L)
    assert(TextAnalysis.oovScore(spark, dir).count() === 0L)
    assert(Sharding.shardOrder(spark, dir).count() === 0L)
    assert(TextAnalysis.lengthBuckets(spark, dir).count() === 0L)
  }

  test("all-empty documents: zero-token docs are excluded from OOV, constant under outliers") {
    val dir = corpus((0L until 5L).map(i => (i, "", "en", "src0", 0L)))
    // zero-token docs produce no explode rows → no OOV rows (documented)
    assert(TextAnalysis.oovScore(spark, dir).count() === 0L)
    // every doc has the same token count → med = toks, MAD = 0, and
    // |toks − med| = 0 is NOT > 3·0: zero outliers
    val out = TextAnalysis.lengthOutliers(spark, dir).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_docs") === 5L)
    assert(out.head.getAs[Long]("n_outliers") === 0L)
    assert(out.head.getAs[Double]("mad") === 0.0)
    // sharding still assigns every doc a contiguous 1-based position
    assert(Sharding.shardOrder(spark, dir).count() === 5L)
  }

  test("single source with MAD = 0: every doc off the median is flagged (strict > 0 boundary)") {
    // token counts 8,10,10,10,12: med = 10, deviations (2,0,0,0,2) →
    // MAD = median(0,0,0,2,2) = 0, so the 3-MAD rule degenerates to
    // |toks − med| > 0 — both off-median docs flag, the three exactly-
    // median docs do not. The oracle's quantile_cont computes the same
    // R-7 median over the same integers, so the engines agree exactly.
    def toks(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val dir = corpus(Seq(
      (0L, toks(8), "en", "src0", 10L),
      (1L, toks(10), "en", "src0", 10L),
      (2L, toks(10), "en", "src0", 10L),
      (3L, toks(10), "en", "src0", 10L),
      (4L, toks(12), "en", "src0", 10L)))
    val out = TextAnalysis.lengthOutliers(spark, dir).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Double]("med") === 10.0)
    assert(out.head.getAs[Double]("mad") === 0.0)
    assert(out.head.getAs[Long]("n_outliers") === 2L)
  }

  test("shards far beyond occupied buckets: positions stay contiguous 1-based per shard") {
    val dir = corpus((0L until 7L).map(i =>
      (i, s"alpha beta gamma doc$i", "en", "src0", 20L)))
    val rows = Sharding.shardOrder(spark, dir, shards = 64).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("pos"), r.getAs[Long]("doc_id")))
    assert(rows.length === 7)
    assert(rows.forall { case (s, _, _) => s >= 0 && s < 64 })
    // within every occupied shard, pos = 1..k with no gaps
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to rs.length).toSeq,
        s"shard $shard positions not contiguous: ${rs.mkString(",")}")
    }
    // determinism: a rerun yields the identical assignment
    val again = Sharding.shardOrder(spark, dir, shards = 64).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("pos"), r.getAs[Long]("doc_id")))
    assert(rows.sortBy(_._3).toSeq === again.sortBy(_._3).toSeq)
  }
}
