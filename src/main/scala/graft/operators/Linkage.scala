package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Record linkage / entity resolution: match a "dirty" feed of
  * customer records (deterministic perturbations — a dropped name
  * character, a bumped phone digit) back to the master table with the
  * standard two-phase shape:
  *
  *   1. BLOCKING — candidate pairs come from an equi-join on a cheap
  *      blocking key (nation + stable phone prefix), never a cross
  *      join. At 100 TB this is the difference between |A|·|B| pair
  *      comparisons and Σ_block |a|·|b| — the same sparsity argument
  *      as LSH banding, with the block key in the shuffle.
  *   2. SCORING — field-level edit distances (codegen'd `levenshtein`)
  *      on the bounded candidate set, thresholded to a verdict.
  *
  * The perturbations are pure functions of the key, so the oracle
  * replays the feed and the match arithmetic exactly: a linker that
  * skipped blocking or mis-scored a field cannot hash-match.
  */
object Linkage {

  /** The customer fixture carries no phone column, so the master's
    * phone is a deterministic function of (custkey, nation) — built
    * identically in the oracle. Format `NN-NNN-NNN-NNNN`; only the
    * LAST digit is ever perturbed, so the 6-char blocking prefix is
    * stable by construction. */
  private def masterWithPhone(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        col("c_nationkey").cast("long").as("nation"),
        concat(
          (col("c_nationkey") + 10).cast("string"), lit("-"),
          lpad((col("c_custkey") % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((col("c_custkey") * 7 % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((col("c_custkey") * 13 % 10000).cast("string"), 4, "0")).as("c_phone"))

  /** The deterministic dirty feed: every master row re-keyed +1e6;
    * every 3rd row loses its 3rd name character; every 2nd row has
    * its last phone digit bumped (mod 10, digit-only so the blocking
    * prefix is untouched). */
  def dirtyFeed(spark: SparkSession, dir: String): DataFrame =
    masterWithPhone(spark, dir)
      .select(
        (col("c_custkey") + lit(1000000L)).as("src_id"),
        col("c_custkey").as("true_key"),
        when(col("c_custkey") % 3 === 0,
            concat(substring(col("c_name"), 1, 2), substring(col("c_name"), 4, 1000)))
          .otherwise(col("c_name")).as("name"),
        when(col("c_custkey") % 2 === 0,
            concat(expr("substring(c_phone, 1, length(c_phone) - 1)"),
              ((substring(col("c_phone"), -1, 1).cast("int") + 1) % 10).cast("string")))
          .otherwise(col("c_phone")).as("phone"),
        col("nation"))

  /** Blocked fuzzy match of the dirty feed against the master:
    * block on (nation, first 6 phone chars), score name + phone edit
    * distances, verdict when both are within 1 edit. Returns one row
    * per feed record with the matched master key (NULL when no
    * candidate in the block survives the threshold). */
  def entityMatch(spark: SparkSession, dir: String): DataFrame = {
    val master = masterWithPhone(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_phone"), col("nation"),
        substring(col("c_phone"), 1, 6).as("block"))
    val feed = dirtyFeed(spark, dir)
      .withColumn("block", substring(col("phone"), 1, 6))
    val scored = feed.join(master, Seq("nation", "block"))
      .select(col("src_id"), col("c_custkey"),
        levenshtein(col("name"), col("c_name")).cast("long").as("name_dist"),
        levenshtein(col("phone"), col("c_phone")).cast("long").as("phone_dist"))
      .filter(col("name_dist") <= 1 && col("phone_dist") <= 1)
    // deterministic best-per-source: fewest edits, then lowest key
    val best = scored
      .groupBy(col("src_id"))
      .agg(min_by(
        struct(col("c_custkey"), col("name_dist"), col("phone_dist")),
        struct(col("name_dist") + col("phone_dist"), col("c_custkey"))).as("m"))
      .select(col("src_id"), col("m.c_custkey").as("matched_key"),
        col("m.name_dist").as("name_dist"), col("m.phone_dist").as("phone_dist"))
    feed.select(col("src_id"), col("true_key"))
      .join(best, Seq("src_id"), "left")
      .select(col("src_id"), col("true_key"), col("matched_key"),
        col("name_dist"), col("phone_dist"),
        (col("matched_key") === col("true_key")).cast("long").as("correct"))
      .orderBy(col("src_id"))
  }
}
