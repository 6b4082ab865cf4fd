package graft

import org.apache.spark.sql.functions._

import graft.operators.Scd

/** SCD Type 2 merge semantics: close-and-reopen on drift, no-ops,
  * brand-new keys, NULL drift, convergence under replay. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "A", "2020-01-01", null.asInstanceOf[String], true),
    (2L, "B", "2020-01-01", null.asInstanceOf[String], true),
    // key 3 already carries history: a closed row plus its current row
    (3L, "C0", "2019-01-01", "2020-01-01", false),
    (3L, "C1", "2020-01-01", null.asInstanceOf[String], true)
  ).toDF("k", "attr", "valid_from", "valid_to", "is_current")

  test("drift closes the current row and reopens; history and no-ops untouched; new keys insert") {
    val delta = Seq(
      (1L, "A2"), // drift → close + reopen
      (2L, "B"),  // identical → no-op
      (4L, "D")   // brand-new key
    ).toDF("k", "attr")
    val out = Scd.scd2Merge(base, delta, "k", Seq("attr"), "2024-06-01")
      .orderBy("k", "valid_from")
      .as[(Long, String, String, String, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, "A", "2020-01-01", "2024-06-01", false),
      (1L, "A2", "2024-06-01", null, true),
      (2L, "B", "2020-01-01", null, true),
      (3L, "C0", "2019-01-01", "2020-01-01", false), // history intact
      (3L, "C1", "2020-01-01", null, true),
      (4L, "D", "2024-06-01", null, true)))
  }

  test("NULL attribute drift counts both directions; replaying the same delta converges") {
    val withNull = Seq((1L, null.asInstanceOf[String], "2020-01-01",
      null.asInstanceOf[String], true)).toDF("k", "attr", "valid_from", "valid_to", "is_current")
    // NULL → value is drift
    val v1 = Scd.scd2Merge(withNull, Seq((1L, "X")).toDF("k", "attr"),
      "k", Seq("attr"), "2024-01-01")
    assert(v1.filter(col("is_current")).select("attr").as[String].head() === "X")
    assert(v1.count() === 2)
    // replaying the identical delta is a no-op (current attr matches)
    val v2 = Scd.scd2Merge(v1, Seq((1L, "X")).toDF("k", "attr"),
      "k", Seq("attr"), "2024-02-01")
    assert(v2.count() === 2)
    // value → NULL is drift too
    val v3 = Scd.scd2Merge(v2, Seq((1L, null.asInstanceOf[String])).toDF("k", "attr"),
      "k", Seq("attr"), "2024-03-01")
    assert(v3.count() === 3)
    assert(v3.filter(col("is_current")).select("attr").as[String].head() === null)
  }
}
