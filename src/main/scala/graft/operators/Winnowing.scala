package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.TextFunctions.normalizeText

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * SIGMOD'03 — the MOSS algorithm): hash every character k-gram,
  * slide a w-window over the hash sequence, keep each window's
  * minimum. Guarantees: any shared substring of length ≥ k + w − 1
  * yields at least one shared fingerprint, and the selected density
  * is ~2/(w+1) — a POSITION-ROBUST local fingerprint, unlike
  * set-of-shingles MinHash (whole-document similarity) or exact
  * hashes (byte-identical only). The classic use is partial-overlap
  * detection: plagiarism, quoted passages, shared boilerplate runs.
  *
  * Scale shape: k-gram hashing and the window-min are both
  * per-document (window partitioned BY doc — never global), so the
  * fingerprint extraction is embarrassingly parallel; the pair join
  * is keyed on the fingerprint with the same hot-key cap the LSH
  * band join uses (a fingerprint shared by more than [[FpHotCap]]
  * docs is corpus boilerplate, not a near-dup signal — capped in
  * BOTH engines, so the oracle gates the cap too).
  */
object Winnowing {

  /** Character k-gram length. */
  val K = 8

  /** Winnow window: minimum over w consecutive k-gram hashes. */
  val W = 4

  /** Fingerprints appearing in more than this many docs are dropped
    * from pair generation (corpus boilerplate / hot key). */
  val FpHotCap = 50

  /** Relative match predicate: pairs must share at least 1/ContainDen
    * of the SMALLER doc's fingerprints (integer test
    * `shared·ContainDen ≥ min(fpa, fpb)`). A fixed absolute floor
    * would be corpus-dependent — two tweets and two books need very
    * different counts — while shared/min is the winnowing analogue of
    * the containment score q113-family dedup uses. */
  val ContainDen = 4

  /** (doc_id, fp) distinct winnowed fingerprints. Windows start at
    * every k-gram position p ≤ max(n − w + 1, 1) — the final
    * truncated windows are suppressed except that a short document
    * (fewer than w k-grams) still emits its single all-hash minimum,
    * the standard guarantee that any doc with ≥ 1 k-gram fingerprints
    * to something. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.loadSpread(spark, dir, "documents")
    val grams = d
      .select(col("doc_id"), normalizeText(col("text")).as("norm"))
      .filter(length(col("norm")) >= K)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), length(col("norm")) - (K - 1)),
          i => md5(col("norm").substr(i, lit(K))))))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("h"))
    val perDoc = Window.partitionBy(col("doc_id"))
    val frame = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      .rowsBetween(Window.currentRow, W - 1)
    grams
      .withColumn("n", count(lit(1)).over(perDoc))
      .withColumn("fp", min(col("h")).over(frame))
      .filter(col("p") <= greatest(col("n") - (W - 1), lit(1)))
      .select(col("doc_id"), col("fp"))
      .distinct()
  }

  /** Near-dup candidate pairs by shared winnowed fingerprints,
    * hot-capped, with the relative containment threshold. Note the
    * shared counts come from the CAPPED fingerprint sets while fpa /
    * fpb are the full per-doc counts — the cap only ever removes
    * boilerplate evidence, it never manufactures a pair. */
  def sharedFingerprintPairs(spark: SparkSession, dir: String): DataFrame = {
    val fp = fingerprints(spark, dir).cache()
    val counts = fp.groupBy(col("doc_id")).agg(count(lit(1)).as("nfp"))
    val rare = fp.groupBy(col("fp")).agg(count(lit(1)).as("docs"))
      .filter(col("docs") <= FpHotCap)
    val keyed = fp.join(rare.select(col("fp")), Seq("fp"))
    keyed.select(col("fp"), col("doc_id").as("da"))
      .join(keyed.select(col("fp"), col("doc_id").as("db")), Seq("fp"))
      .filter(col("da") < col("db"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("shared"))
      .join(counts.select(col("doc_id").as("da"), col("nfp").as("fpa")), Seq("da"))
      .join(counts.select(col("doc_id").as("db"), col("nfp").as("fpb")), Seq("db"))
      .filter(col("shared") * ContainDen >= least(col("fpa"), col("fpb")))
      .select(col("da"), col("db"), col("fpa"), col("fpb"), col("shared"),
        round(col("shared").cast("double") / least(col("fpa"), col("fpb")), 4)
          .as("containment"))
      .orderBy(col("da"), col("db"))
  }

  /** Index-vs-delta winnowing — the incremental form for streaming
    * ingest (mirrors [[graft.operators.Dedup.incrementalLshFrom]] and
    * [[SetSimJoin.prefixJoinDelta]]): the `doc_id % deltaMod ≠
    * deltaRes` slice plays the persisted fingerprint index (the
    * (doc_id, fp) rows ARE the stored state — winnowing needs no
    * text retention), the `= deltaRes` slice is the new batch, and
    * pair generation fans out ONLY from delta fingerprint rows
    * probing the combined index — index×index pairs are never
    * re-derived. The hot-fingerprint cap and relative containment
    * threshold are identical to [[sharedFingerprintPairs]] (the cap's
    * document frequency counts the combined corpus, as maintained
    * index stats would); the oracle is the full self-join restricted
    * to pairs with ≥ 1 delta member — losslessness, q201-style. */
  def sharedFingerprintPairsDelta(spark: SparkSession, dir: String,
                                  deltaMod: Int = 10, deltaRes: Int = 3): DataFrame = {
    val fp = fingerprints(spark, dir).cache()
    val counts = fp.groupBy(col("doc_id")).agg(count(lit(1)).as("nfp"))
    val rare = fp.groupBy(col("fp")).agg(count(lit(1)).as("docs"))
      .filter(col("docs") <= FpHotCap)
    val keyed = fp.join(rare.select(col("fp")), Seq("fp"))
    // delta fp rows probe the combined postings; the delta-delta
    // double-arrival collapses under the canonical pair ordering
    keyed.filter(col("doc_id") % deltaMod === deltaRes)
      .select(col("fp"), col("doc_id").as("x"))
      .join(keyed.select(col("fp"), col("doc_id").as("y")), Seq("fp"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("da"),
        greatest(col("x"), col("y")).as("db"), col("fp"))
      .distinct()
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("shared"))
      .join(counts.select(col("doc_id").as("da"), col("nfp").as("fpa")), Seq("da"))
      .join(counts.select(col("doc_id").as("db"), col("nfp").as("fpb")), Seq("db"))
      .filter(col("shared") * ContainDen >= least(col("fpa"), col("fpb")))
      .select(col("da"), col("db"), col("fpa"), col("fpb"), col("shared"),
        round(col("shared").cast("double") / least(col("fpa"), col("fpb")), 4)
          .as("containment"))
      .orderBy(col("da"), col("db"))
  }
}
