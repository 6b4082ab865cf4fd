package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys — the 100 TB posture for
  * aggregations and joins whose key distribution is Zipfian (a handful
  * of keys holding a large share of rows, which AQE's skew-join split
  * handles for sort-merge joins but not for hash aggregations or
  * broadcast-side explosions).
  */
object Skew {

  /** Two-phase salted aggregation: add a random-ish salt derived
    * deterministically from a spread column, partially aggregate on
    * (key, salt), then finish on key. The first shuffle spreads a hot
    * key over `buckets` reducers; the second is tiny (one row per
    * key × salt). Exact for decomposable aggregates (sum/count). */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     spread: Column, buckets: Int): DataFrame = {
    val salted = df.select(key.as("k"), value.as("v"),
      pmod(xxhash64(spread), lit(buckets)).as("salt"))
    salted
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("partial_sum"), count(lit(1)).as("partial_cnt"))
      .groupBy(col("k"))
      .agg(sum(col("partial_sum")).as("value_sum"), sum(col("partial_cnt")).as("n"))
  }

  /** Salted join for a skewed fact against a small dim that is too big
    * to broadcast: replicate each dim row `buckets` times with a salt
    * column, salt the fact side deterministically, and join on
    * (key, salt) — the hot key's rows land on `buckets` different
    * reducers instead of one. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 spread: Column, buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt", pmod(xxhash64(spread), lit(buckets)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
