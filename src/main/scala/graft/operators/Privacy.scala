package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Privacy / governance audits over shared datasets: k-anonymity
  * (every quasi-identifier combination must describe at least k
  * individuals) — the check a dataset must pass before leaving a
  * trust boundary, and the anonymity analog of [[Relational.fkAudit]]
  * on the integrity side. Complements the PII scrubber
  * ([[TextAnalysis.piiScrub]]) which redacts content; this audits
  * structure.
  *
  * Scale posture: one group-by on the quasi-identifier tuple
  * (map-side combinable count), and the violation set is by
  * definition small (< k rows per group), so the suppression
  * anti-join broadcasts it. */
object Privacy {

  /** Quasi-identifier groups with fewer than `k` members — the rows a
    * release would have to suppress or generalize. */
  def kAnonymityViolations(df: DataFrame, quasi: Seq[String], k: Int): DataFrame =
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
      .orderBy(quasi.map(col): _*)

  /** Gated instance: customers quasi-identified by (nation, market
    * segment), k = 10. */
  def customerKAnonymity(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    kAnonymityViolations(
      Tables.load(spark, dir, "customer"),
      Seq("c_nationkey", "c_mktsegment"), k)

  /** The release-safe projection: rows of under-k groups suppressed
    * (broadcast anti-join against the violation set). */
  def suppressViolations(df: DataFrame, quasi: Seq[String], k: Int): DataFrame =
    df.join(broadcast(kAnonymityViolations(df, quasi, k).select(quasi.map(col): _*)),
      quasi, "left_anti")
}
