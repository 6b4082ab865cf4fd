package graft

import org.apache.spark.sql.functions._

import graft.operators.OrderedDedup
import graft.plans.TopK

/** Ordered dedup semantics + error paths of the small utility APIs. */
class OrderedDedupSpec extends SparkSpec {
  import spark.implicits._

  test("keepFirst keeps exactly the first row per key under the ordering") {
    val df = Seq(
      (1L, "2024-01-01", "old"), (1L, "2024-03-01", "new"), (1L, "2024-02-01", "mid"),
      (2L, "2024-05-05", "only")).toDF("k", "d", "v")
    val out = OrderedDedup.keepFirst(df, Seq("k"), Seq(col("d").desc))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out === Map(1L -> "new", 2L -> "only"))
  }

  test("keepFirst does not clobber a caller column named _rn") {
    val df = Seq((1L, 7, "a"), (1L, 9, "b")).toDF("k", "_rn", "v")
    val out = OrderedDedup.keepFirst(df, Seq("k"), Seq(col("v")))
    assert(out.columns.contains("_rn")) // caller's column survives
    assert(out.collect().head.getAs[Int]("_rn") === 7)
  }

  test("TopK.perGroup rejects k <= 0 eagerly") {
    val df = Seq((1L, 1.0)).toDF("k", "x")
    intercept[IllegalArgumentException] {
      TopK.perGroup(df, Seq("k"), "x", k = 0)
    }
  }

  test("missing table path raises an analysis error, not silent empty") {
    intercept[org.apache.spark.sql.AnalysisException] {
      graft.sources.Tables.load(spark, "/tmp/nonexistent_graft_dir", "lineitem").count()
    }
  }
}
