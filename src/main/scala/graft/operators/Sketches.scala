package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Mergeable-sketch operators. The sketch math lives in native
  * Catalyst aggregates under graft.plans; these wrappers shape the
  * gated queries.
  */
object Sketches {

  /** Per-event-type distinct-user HLL sketch, emitted as the full
    * (event_type, bucket, register) matrix — the registers are
    * integer-exact and md5-derived, so the DuckDB oracle reproduces
    * every one nibble-by-nibble (the float estimate stays in
    * [[graft.plans.HllRegisters.estimate]] and its spec).
    *
    * Scale posture: the aggregate ships 256 bytes per (event_type ×
    * map partition) instead of shuffling every distinct (event_type,
    * user) pair the way COUNT(DISTINCT) must — and sketches of
    * disjoint slices merge associatively later (day × shard rollups
    * without re-reading either side). */
  def hllDistinctUsers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
      .select(col("event_type"), col("user_id").cast("string").as("u"))
    e.groupBy(col("event_type"))
      .agg(call_function("hll_registers", col("u")).as("regs"))
      .select(col("event_type"), posexplode(col("regs")).as(Seq("bucket", "register")))
      .orderBy(col("event_type"), col("bucket"))
  }
}
