package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Build a ×N scaled replica of a testdata directory for SCALE-SLOPE
  * measurement (never for correctness gating — the oracle runs on the
  * driver-generated tables only).
  *
  * Method: each fact/entity table is the union of N copies with every
  * key-like column shifted by `copy · (max_key + 1)` — so key
  * cardinalities, join fan-outs, and group counts all scale ×N while
  * per-key densities stay exactly sf0.1-shaped (N disjoint key shards
  * sharing the fixed `nation`/`region` dims, which is also what a
  * genuinely larger generated SF looks like). Shifting preserves FK
  * integrity within each shard; dates/values/text are left verbatim.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> <copies>
  */
object ScaleUp {

  /** Key columns to shift per table; tables absent from the map are
    * copied once, unshifted (fixed dims). */
  private val keyCols: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val allTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val Array(src, dst, copiesStr) = args
    val copies = copiesStr.toInt
    val spark = GraftSession.get()
    for (t <- allTables) {
      val base = spark.read.parquet(s"$src/$t.parquet")
      val scaled: DataFrame = keyCols.get(t) match {
        case None => base
        case Some(keys) =>
          // one shift unit per key column: max + 1 over the source
          val units = keys.map { k =>
            k -> (base.agg(max(col(k))).head().getLong(0) + 1L)
          }.toMap
          (0 until copies).map { i =>
            keys.foldLeft(base) { (df, k) =>
              df.withColumn(k, col(k) + lit(i * units(k)))
            }
          }.reduce(_ unionByName _)
      }
      scaled.write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t: ${if (keyCols.contains(t)) s"x$copies" else "dim, x1"}")
    }
    spark.stop()
  }
}
