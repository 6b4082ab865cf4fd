package graft

import java.nio.file.Files

import graft.operators.{Relational, TextAnalysis}

/** Semantic tests for the round-6 audit/readability operators on
  * planted data with hand-computed ground truth. */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  test("fk audit: orphans, NULL keys and clean edges counted per FK edge") {
    val dir = Files.createTempDirectory("graft_fk").toString
    def w(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    w(Seq(1L).toDF("r_regionkey"), "region")
    // nation 2 points at a missing region
    w(Seq((1L, 1L), (2L, 9L)).toDF("n_nationkey", "n_regionkey"), "nation")
    w(Seq((1L, 1L)).toDF("c_custkey", "c_nationkey"), "customer")
    w(Seq((1L, 1L)).toDF("s_suppkey", "s_nationkey"), "supplier")
    w(Seq(1L).toDF("p_partkey"), "part")
    // order 2 points at a missing customer
    w(Seq((1L, 1L), (2L, 99L)).toDF("o_orderkey", "o_custkey"), "orders")
    // one orphan per lineitem FK + one NULL l_orderkey
    w(Seq[(Option[Long], Long, Long)](
        (Some(1L), 1L, 1L), (Some(7L), 1L, 1L), (Some(1L), 8L, 1L),
        (Some(1L), 1L, 9L), (None, 1L, 1L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey"), "lineitem")
    val out = Relational.fkAudit(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out === Map(
      "lineitem.l_orderkey>orders" -> ((5L, 1L, 1L)),
      "lineitem.l_partkey>part" -> ((5L, 0L, 1L)),
      "lineitem.l_suppkey>supplier" -> ((5L, 0L, 1L)),
      "orders.o_custkey>customer" -> ((2L, 0L, 1L)),
      "customer.c_nationkey>nation" -> ((1L, 0L, 0L)),
      "supplier.s_nationkey>nation" -> ((1L, 0L, 0L)),
      "nation.n_regionkey>region" -> ((2L, 0L, 1L))))
  }

  test("readability: hand-computed Flesch, sentence clamp, empty docs excluded") {
    val dir = Files.createTempDirectory("graft_read").toString
    Seq(
      (0L, "The cat sat. The dog ran!", "en", "s", 25L),
      (1L, "no punctuation here", "en", "s", 19L),
      (2L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.readability(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L)) // empty doc excluded
    val d0 = rows(0)
    // 6 words, 2 sentences, 6 vowel groups
    assert((d0.getLong(1), d0.getLong(2), d0.getLong(3)) === ((6L, 2L, 6L)))
    assert(d0.getDouble(4) === 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0))
    assert(d0.getString(5) === "easy")
    val d1 = rows(1)
    // no [.!?] at all → sentence count clamps to 1; 3 words, 6 vowel
    // groups (no→o; punctuation→u,ua,io; here→e,e)
    assert((d1.getLong(1), d1.getLong(2), d1.getLong(3)) === ((3L, 1L, 6L)))
    assert(d1.getString(5) === "hard")
  }
}
