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

  /** A key is "hot" when its row count exceeds this multiple of the
    * mean per-key count. */
  val HotFactor = 4L

  /** Absolute significance floor for the skew advisor/linter: a key is
    * only "hot" when its max per-key count ALSO reaches this many rows
    * — a 6-row key that is 6× its (1-row) mean satisfies the ratio
    * test but cannot overload a reducer, and salting it buys nothing.
    * The ratio finds the shape, the floor confirms the magnitude;
    * without it the data-aware rule fires on noise at test scale and
    * would train authors to ignore it. */
  val MinHotCount = 1000L

  /** Recommended salt factors are capped here — past ~32 sub-keys the
    * second-phase re-merge cost outweighs further spreading. */
  val SaltCap = 32L

  /** Rows of the advisor readout (hottest keys first). */
  val AdvisorTopK = 5

  /** Skew advisor: measure a join/aggregation key's distribution and
    * recommend a salt factor — the *diagnosis* step whose treatments
    * are [[saltedSumCount]] / [[saltedJoin]] (and what you run before
    * committing a 100 TB job to a plain groupBy on an unknown key).
    * Per hot key: row count, corpus share in ppm, and the corpus
    * stats (mean/max per-key counts, key count, hot-key count) plus
    * `salt_reco` = ceil(max/mean) capped at [[SaltCap]] — the number
    * of sub-keys that levels the hottest reducer to the mean.
    *
    * All integer arithmetic (floor div, ppm fixed-point). Plan shape:
    * one partial-aggregated count shuffle keyed by the key, a one-row
    * totals frame and a one-row hot-count frame (both broadcast), and
    * a distributed top-k — no global sort, no driver loop. */
  def advisor(df: DataFrame, key: Column): DataFrame = {
    val cnts = df.groupBy(key.as("k")).agg(count(lit(1)).as("cnt"))
    val tot = cnts
      .agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"))
      .withColumn("avg_cnt", expr("n_rows div n_keys"))
    val hot = cnts.crossJoin(broadcast(tot))
      .filter(col("cnt") > col("avg_cnt") * HotFactor)
      .agg(count(lit(1)).as("n_hot"))
    cnts
      .orderBy(col("cnt").desc, col("k"))
      .limit(AdvisorTopK)
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(hot))
      .withColumn("share_ppm", expr("cnt * 1000000 div n_rows"))
      .withColumn("salt_reco",
        least(lit(SaltCap), expr(s"(max_cnt + avg_cnt - 1) div avg_cnt")))
      .select(col("k"), col("cnt").cast("long").as("cnt"),
        col("share_ppm").cast("long").as("share_ppm"),
        col("n_rows").cast("long").as("n_rows"),
        col("n_keys").cast("long").as("n_keys"),
        col("avg_cnt").cast("long").as("avg_cnt"),
        col("max_cnt").cast("long").as("max_cnt"),
        col("n_hot").cast("long").as("n_hot"),
        col("salt_reco").cast("long").as("salt_reco"))
      .orderBy(col("cnt").desc, col("k"))
  }
}
