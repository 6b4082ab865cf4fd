package graft

import org.apache.spark.sql.functions._

import graft.operators.{Packing, Sampling}

/** Sequence packing: the distributed bucket-offset prefix sum must
  * equal the global running sum exactly, for any bucket size and
  * sparse/non-contiguous ids; sampling: md5-keyed membership is stable
  * under repartitioning. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed prefix sum equals the global running sum on sparse ids") {
    // non-contiguous ids, token counts crossing budget boundaries
    val docs = Seq((1L, 100L), (3L, 200L), (10L, 56L), (11L, 300L),
      (997L, 50L), (1005L, 10L), (2500L, 1L))
    val df = docs.toDF("doc_id", "tokens").repartition(5)
    for (bucketSize <- Seq(2L, 7L, 1000L)) {
      val got = Packing.packByPrefix(df, "doc_id", "tokens", budget = 256L, bucketSize)
        .select("doc_id", "start_offset", "seq_id", "offset_in_seq")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      var running = 0L
      docs.sortBy(_._1).foreach { case (id, toks) =>
        assert(got(id) === ((running, running / 256L, running % 256L)),
          s"doc $id bucketSize $bucketSize")
        running += toks
      }
    }
  }

  test("a doc starting exactly on a budget boundary opens the next sequence") {
    val df = Seq((0L, 256L), (1L, 1L)).toDF("doc_id", "tokens")
    val rows = Packing.packByPrefix(df, "doc_id", "tokens", budget = 256L)
      .select("doc_id", "seq_id", "offset_in_seq")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(0L) === ((0L, 0L)))
    assert(rows(1L) === ((1L, 0L)))
  }

  test("stratified sample membership is deterministic and repartition-stable") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def sampledIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter(Sampling.keep(col("doc_id"), col("lang"), Sampling.DocRates16))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = sampledIds(d)
    val b = sampledIds(d.repartition(13))
    assert(a === b && a.nonEmpty && a.size < d.count())
  }
}
