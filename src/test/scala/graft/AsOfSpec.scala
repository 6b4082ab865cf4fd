package graft

import java.sql.Timestamp

import graft.operators.AsOf

/** As-of join semantics on a hand-built fixture with known ground
  * truth: inclusive time match, forward carry, no-match null, key
  * isolation. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("asofJoin picks the latest right row at-or-before each left row") {
    val updates = Seq(
      (1L, ts(0), 10.0), (1L, ts(10), 20.0), (1L, ts(30), 30.0),
      (2L, ts(5), 99.0)).toDF("user_id", "ts", "view_value")
    val probes = Seq(
      (1L, ts(4), 100L),   // after ts(0) → 10.0
      (1L, ts(10), 101L),  // exactly at ts(10) → inclusive → 20.0
      (1L, ts(40), 102L),  // after all → 30.0
      (2L, ts(4), 103L),   // before user 2's first update → null
      (2L, ts(6), 104L))   // → 99.0 (never user 1's values)
      .toDF("user_id", "ts", "event_id")
    val out = AsOf.asofJoin(probes, updates, "user_id", "ts", "ts", "view_value")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble)).toMap
    assert(out(100L) === Some(10.0))
    assert(out(101L) === Some(20.0))
    assert(out(102L) === Some(30.0))
    assert(out(103L) === None)
    assert(out(104L) === Some(99.0))
  }

  test("a NULL-valued right row is still the latest match (ASOF semantics)") {
    val updates = Seq(
      (1L, ts(0), Some(5.0)), (1L, ts(10), Option.empty[Double]))
      .toDF("user_id", "ts", "view_value")
    val probes = Seq((1L, ts(20), 200L)).toDF("user_id", "ts", "event_id")
    val out = AsOf.asofJoin(probes, updates, "user_id", "ts", "ts", "view_value").collect()
    // matched row IS ts(10); its value is NULL — must not fall back to 5.0
    assert(out.length === 1 && out.head.isNullAt(out.head.fieldIndex("asof_value")))
  }

  test("forward asofJoin picks the earliest right row at-or-after each left row") {
    val updates = Seq(
      (1L, ts(10), 20.0), (1L, ts(30), 30.0),
      (2L, ts(5), 99.0)).toDF("user_id", "ts", "view_value")
    val probes = Seq(
      (1L, ts(4), 100L),   // next update at ts(10) → 20.0
      (1L, ts(10), 101L),  // exactly at ts(10) → inclusive → 20.0
      (1L, ts(40), 102L),  // after all updates → null
      (2L, ts(4), 103L))   // → 99.0
      .toDF("user_id", "ts", "event_id")
    val out = AsOf.asofJoin(probes, updates, "user_id", "ts", "ts", "view_value",
        forward = true)
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("asof_value")).map(_.toDouble)).toMap
    assert(out(100L) === Some(20.0))
    assert(out(101L) === Some(20.0))
    assert(out(102L) === None)
    assert(out(103L) === Some(99.0))
  }
}
