package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Stratified deterministic sampling — the data-mixture knob of a
  * training pipeline: each stratum (language, source, quality bucket)
  * keeps a different fraction of its documents. The keep decision is
  * md5-keyed on the row id (engine-portable, rerun-stable, and stable
  * under repartitioning — no rand(), no TABLESAMPLE), with the rate
  * expressed in sixteenths so a single hex digit decides membership:
  * keep iff value(first md5 hex digit) < rate16.
  *
  * Map-only until the per-stratum count aggregate — the ideal 100 TB
  * shape. */
object Sampling {

  /** First-md5-hex-digit value of `id`, 0..15. */
  def hexBucket16(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 1), 16, 10).cast("int")

  /** Keep-predicate: id hashes under the stratum's per-sixteenth rate.
    * `rates16` maps stratum value → sixteenths kept (0..16); strata
    * missing from the map keep everything. */
  def keep(id: Column, stratum: Column, rates16: Map[String, Int]): Column = {
    val rate = rates16.foldLeft(lit(16)) { case (acc, (k, r)) =>
      when(stratum === k, lit(r)).otherwise(acc)
    }
    hexBucket16(id) < rate
  }

  /** Per-language downsampling summary over `documents`: the English
    * bulk is halved, mid-resource languages quartered, French kept at
    * an eighth, Chinese kept whole — a typical mixture rebalance. */
  val DocRates16: Map[String, Int] =
    Map("en" -> 8, "de" -> 4, "es" -> 4, "fr" -> 2, "zh" -> 16)

  /** Deterministic train/val/test split: the doc's first md5 hex
    * nibble buckets it — 0 → test (1/16), 1 → val (1/16), the rest →
    * train (14/16). A pure function of the id: stable across runs,
    * partitionings and engines (no rand(), no global shuffle-and-cut,
    * which would reassign rows whenever the data moves); adding
    * documents never flips an existing document's split — the
    * property that keeps eval sets uncontaminated as the corpus
    * grows. Map-only; the gate aggregates per (split, lang). */
  def datasetSplit(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.loadSpread(spark, dir, "documents")
    val b = hexBucket16(col("doc_id"))
    d.select(col("lang"),
        when(b === 0, lit("test")).when(b === 1, lit("val"))
          .otherwise(lit("train")).as("split"),
        col("n_chars"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars_sum"))
      .orderBy(col("split"), col("lang"))
  }

  /** Leakage-safe train/val/test split: every near-duplicate CLUSTER
    * is assigned to one split atomically, so a test document can never
    * have a near-duplicate sitting in train — the benchmark-
    * contamination leak a row-hash split like [[datasetSplit]] cannot
    * prevent (near-dups hash independently and straddle the cut).
    * Cluster membership is the q41 graph (capped-LSH verified pairs →
    * min-label components); documents with no near-dup are singleton
    * groups keyed by their own doc_id. The split decision applies
    * [[datasetSplit]]'s md5-nibble rule (0 → test, 1 → val, else
    * train) to the GROUP key, keeping proportions while moving whole
    * clusters. Returns per (split, lang): docs, chars, distinct groups.
    *
    * Scale posture: the pair graph is the capped-LSH path (worst band
    * key bounded by the cap); membership is far smaller than the
    * corpus, so the extra cost over a plain split is one left join
    * against it plus the group-by. Nothing driver-side. */
  def leakageSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val pairs = Dedup.minhashLshCapped(spark, dir).select(col("da"), col("db"))
    val memb = Components.minLabel(pairs)
      .select(col("id").as("doc_id"), col("label"))
    val g = docs.join(memb, Seq("doc_id"), "left")
      .withColumn("gk", coalesce(col("label"), col("doc_id")))
    val b = hexBucket16(col("gk"))
    g.select(
        when(b === 0, lit("test")).when(b === 1, lit("val"))
          .otherwise(lit("train")).as("split"),
        col("lang"), col("n_chars"), col("gk"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("chars_sum"),
        countDistinct(col("gk")).as("n_groups"))
      .orderBy(col("split"), col("lang"))
  }

  def stratifiedDocSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.loadSpread(spark, dir, "documents")
    d.select(col("lang"),
        keep(col("doc_id"), col("lang"), DocRates16).as("_keep"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        count(when(col("_keep"), 1)).as("n_sampled"))
      .orderBy(col("lang"))
  }

  /** Weighted sampling WITHOUT floating point: Efraimidis–Spirakis
    * assigns each row the key u^(1/w) (u uniform) and keeps the top-k
    * — but u^(1/w) needs pow(), which is libm-dependent and not
    * bit-portable across engines. The identity used instead: the MAX
    * of w independent uniforms has CDF x^w, exactly the distribution
    * of u^(1/w). So for integer weights the key is
    * max over j=1..w of md5(j || '|' || id) — pure md5 + lexicographic
    * max, bit-identical in any engine, and exactly weight-proportional
    * (P(row i wins) follows E-S for integer weights).
    *
    * Map-only until the global top-k (TakeOrdered — no full sort). */
  def weightedKey(id: Column, weight: Column): Column = {
    // guarded: sequence(1, w) runs DESCENDING for w < 1 (the same
    // pitfall TextFunctions.shingles guards), which would hand
    // weight-0 rows two draws; NULL instead — matching the oracle's
    // empty generate_series → NULL aggregate, excluded from any top-k
    val draws = array_max(transform(sequence(lit(1), weight),
      j => md5(concat(j.cast("string"), lit("|"), id.cast("string")))))
    when(weight >= 1, draws)
  }

  /** Data-mixture planner: per-source keep rates that rebalance a
    * skewed corpus toward equal TOKEN budgets — the "domain mixing"
    * step of a pretraining pipeline. The target is the smallest
    * source's token count; every larger source gets
    * rate16 = clamp((min_tokens·16) div n_tokens, 1, 16) sixteenths,
    * applied through the same md5 hex-bucket membership as
    * [[stratifiedDocSample]] (deterministic, repartition-stable), and
    * the plan reports the EXACT kept doc/token counts that rate
    * yields. Integer arithmetic end-to-end — the gate is exact.
    *
    * One cached corpus projection feeds both the per-source totals and
    * the kept-count pass (1× I/O; cache lifetime per the harness
    * clearCache contract); per-source rows are broadcast. */
  def mixturePlan(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.words
    val t = Tables.loadSpread(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        size(words(col("text"))).cast("long").as("toks"),
        hexBucket16(col("doc_id")).as("h16"))
      .cache()
    val s = t.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
    val m = s.agg(min(col("n_tokens")).as("min_tokens"))
    val r = s.crossJoin(broadcast(m))
      .withColumn("rate16",
        least(lit(16L), greatest(lit(1L), expr("(min_tokens * 16) div n_tokens"))))
    val k = t.join(broadcast(r.select(col("source"), col("rate16"))), Seq("source"))
      .filter(col("h16") < col("rate16"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("kept_docs"), sum(col("toks")).as("kept_tokens"))
    r.join(k, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("rate16").cast("long").as("rate16"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .orderBy(col("source"))
  }

  /** Quality-weighted document sample: weight 1..4 from the quality
    * score (bucket thresholds compare the exact portable double), key
    * via [[weightedKey]], global top-k. */
  def weightedDocSample(spark: SparkSession, dir: String, k: Int = 200): DataFrame = {
    import graft.functions.TextFunctions.qualityExpr
    val d = Tables.loadSpread(spark, dir, "documents")
    // quality materialized ONCE before the bucket when-chain — the
    // same discipline as langScores: each when-branch referencing
    // qualityExpr inline would re-run its regex/split chain per row
    val weight = when(col("_q") >= 0.8, 4)
      .when(col("_q") >= 0.6, 3)
      .when(col("_q") >= 0.4, 2)
      .otherwise(1)
    d.select(col("doc_id"), qualityExpr(col("text")).as("_q"))
      .select(col("doc_id"), weight.as("weight"))
      .select(col("doc_id"), col("weight").cast("long").as("weight"),
        weightedKey(col("doc_id"), col("weight")).as("skey"))
      .orderBy(col("skey").desc, col("doc_id"))
      .limit(k)
  }

  /** Token budget the temperature mixture allocates. */
  val MixtureBudget = 100000L

  /** Temperature-smoothed source mixture (the multilingual-T5 /
    * XLM-R α-sampling scheme, α = 1/2): sampling weight per source is
    * p^α — sqrt flattens the source-size distribution so giant
    * sources stop drowning the tail — then the token budget is
    * apportioned by largest-remainder rounding, which hands out
    * integer quotas that sum EXACTLY to the budget.
    *
    * Determinism discipline (this result is float-bearing and still
    * hash-gated): p is one exact division of longs; sqrt is
    * correctly-rounded by IEEE-754 in every engine; and the weight
    * normalizer Σw is an EXPLICIT left fold over the weights sorted
    * by source — `aggregate(array_sort(collect_list(...)))` here,
    * `list_reduce(list(w ORDER BY source))` in the oracle — because a
    * plain SUM's float accumulation order is engine-internal (DuckDB
    * window sums use segment trees; Spark partial aggregates combine
    * in partition order). The source dimension is bounded (a mixture
    * has tens of entries, not millions), so the fold array and the
    * one ranking window hold a handful of post-aggregate rows. */
  def temperatureMixture(spark: SparkSession, dir: String,
                         budget: Long = MixtureBudget): DataFrame = {
    import graft.functions.TextFunctions.words
    import org.apache.spark.sql.expressions.Window
    val s = Tables.loadSpread(spark, dir, "documents")
      .select(col("source"), size(words(col("text"))).cast("long").as("toks"))
      .groupBy(col("source")).agg(sum(col("toks")).as("n_tokens"))
    val tot = s.agg(sum(col("n_tokens")).as("total_tokens"))
    val wdf = s.crossJoin(broadcast(tot))
      .withColumn("p", col("n_tokens").cast("double") / col("total_tokens").cast("double"))
      .withColumn("w", sqrt(col("p")))
    val norm = wdf.agg(
      aggregate(
        transform(array_sort(collect_list(struct(col("source"), col("w")))),
          x => x("w")),
        lit(0.0), (acc, x) => acc + x).as("norm"))
    wdf.crossJoin(broadcast(norm))
      .withColumn("share", col("w") / col("norm"))
      .withColumn("quota_base", floor(lit(budget.toDouble) * col("share")).cast("long"))
      .withColumn("rem", lit(budget.toDouble) * col("share") - col("quota_base").cast("double"))
      .withColumn("leftover",
        lit(budget) - sum(col("quota_base")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("rk", row_number().over(Window.orderBy(col("rem").desc, col("source"))))
      .withColumn("quota", col("quota_base") +
        when(col("rk") <= col("leftover"), 1L).otherwise(0L))
      .select(col("source"), col("n_tokens"), col("share"),
        col("quota_base"), col("rk").cast("long").as("rk"), col("quota"))
      .orderBy(col("source"))
  }

  /** Stratified percentile pruning (the FineWeb-Edu / classifier-
    * threshold pattern, with the corpus's own quality score standing
    * in for the classifier): WITHIN each language, keep the top half
    * by quality. Per-stratum percentile — not a global cut — so
    * low-resource languages aren't wiped out by the dominant one's
    * score distribution. The keep decision is the integer predicate
    * `2·rk ≤ n` over a per-language rank (quality desc, doc_id) —
    * no float percentile boundary. Windows are partitioned by lang:
    * each stratum ranks independently, in parallel. */
  def percentilePrune(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.qualityExpr
    import org.apache.spark.sql.expressions.Window
    val perLang = Window.partitionBy(col("lang"))
    val rankW = Window.partitionBy(col("lang"))
      .orderBy(col("q").desc, col("doc_id"))
    Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), qualityExpr(col("text")).as("q"))
      .withColumn("rk", row_number().over(rankW).cast("long"))
      .withColumn("n_lang", count(lit(1)).over(perLang))
      .withColumn("kept", (col("rk") * 2 <= col("n_lang")).cast("int"))
      .select(col("doc_id"), col("lang"), col("q"), col("rk"),
        col("n_lang"), col("kept"))
      .orderBy(col("doc_id"))
  }

  /** Max epochs any source may be repeated in [[epochBudget]] — the
    * data-constrained-scaling cap (repeating data beyond a few epochs
    * stops buying loss). */
  val MaxEpochs = 2L

  /** Epoch-capped token-budget allocation — the data-constrained
    * scaling recipe (Muennighoff et al.): given per-source token
    * counts, a total training-token budget (3/2 of the corpus here)
    * and a per-source repetition cap of [[MaxEpochs]] epochs, fill
    * the budget as evenly as possible without any source exceeding
    * its cap. This is exact integer *waterfilling*: sources sorted by
    * cap; a source is capped when granting it (and everything after
    * it) its own cap still fits the remaining budget; from the first
    * uncapped source on, the remainder is split level+largest-
    * remainder (first `rem` sources in sort order get one extra
    * token) — fully deterministic, no floats.
    *
    * Plan shape: one per-source aggregation, then windows over the
    * per-source frame only — source cardinality is small by
    * definition (a mixture has tens of entries, not millions), so the
    * global-ordered window never sees more than that. */
  /** The waterfill allocation frame behind [[epochBudget]] and
    * [[epochSampler]]: (source, n_tokens, cap, alloc). */
  private def epochAlloc(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.words
    import org.apache.spark.sql.expressions.Window
    val s = Tables.loadSpread(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(sum(size(words(col("text"))).cast("long")).as("n_tokens"))
      .withColumn("cap", col("n_tokens") * MaxEpochs)
    val tot = s.agg(sum(col("n_tokens")).as("tt"), count(lit(1)).as("k"))
      .withColumn("budget", expr("(3 * tt) div 2"))
    val byCap = Window.orderBy(col("cap"), col("source"))
    val ranked = s.crossJoin(broadcast(tot))
      .withColumn("r", row_number().over(byCap).cast("long"))
      .withColumn("prefix", coalesce(sum(col("cap")).over(
        byCap.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("capped",
        col("cap") * (col("k") - col("r") + 1) + col("prefix") <= col("budget"))
    val pivot = ranked.filter(!col("capped"))
      .agg(min(col("r")).as("rstar"),
        coalesce(min_by(col("prefix"), col("r")), lit(0L)).as("pstar"))
    ranked.crossJoin(broadcast(pivot))
      .withColumn("alloc",
        when(col("rstar").isNull || col("r") < col("rstar"), col("cap"))
          .otherwise(
            expr("(budget - pstar) div (k - rstar + 1)") +
              when(col("r") - col("rstar") <
                expr("(budget - pstar) % (k - rstar + 1)"), 1L).otherwise(0L)))
      .select(col("source"), col("n_tokens"), col("cap").cast("long").as("cap"),
        col("alloc").cast("long").as("alloc"))
  }

  def epochBudget(spark: SparkSession, dir: String): DataFrame =
    epochAlloc(spark, dir)
      .select(col("source"), col("n_tokens"), col("cap"), col("alloc"),
        expr("alloc * 10000 div n_tokens").cast("long").as("epochs_bp"))
      .orderBy(col("source"))

  /** Execute the [[epochBudget]] plan as a PHYSICAL sample: every doc
    * of a source is repeated `alloc div n_tokens` times (the full
    * epochs) and the fractional remainder epoch is realized as a
    * deterministic md5-sixteenths membership draw
    * (`rate16 = (alloc mod n_tokens)·16 div n_tokens`, the q71
    * discipline — rerun-stable, repartition-stable, no rand()).
    * Readout is the per-source reconciliation: how many doc-copies
    * and tokens the sample actually materialized vs the allocation
    * (`fill_bp` — the sixteenths granularity bounds the shortfall).
    * The sample itself is a map-only broadcast join + bounded
    * explode; nothing shuffles until the readout aggregate. */
  def epochSampler(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.words
    val plan = epochAlloc(spark, dir)
      .withColumn("full_epochs", expr("alloc div n_tokens"))
      .withColumn("rate16", expr("((alloc % n_tokens) * 16) div n_tokens"))
    val t = Tables.loadSpread(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        size(words(col("text"))).cast("long").as("toks"),
        hexBucket16(col("doc_id")).as("h16"))
    t.join(broadcast(plan), Seq("source"))
      .withColumn("copies",
        col("full_epochs") + when(col("h16") < col("rate16"), 1L).otherwise(0L))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("n_tokens"),
        max(col("alloc")).as("alloc"),
        max(col("full_epochs")).as("full_epochs"),
        max(col("rate16")).as("rate16"),
        sum(col("copies")).as("sampled_docs"),
        sum(col("toks") * col("copies")).as("sampled_tokens"))
      .select(col("source"), col("n_docs").cast("long").as("n_docs"),
        col("n_tokens"), col("alloc"),
        col("full_epochs").cast("long").as("full_epochs"),
        col("rate16").cast("long").as("rate16"),
        col("sampled_docs").cast("long").as("sampled_docs"),
        col("sampled_tokens").cast("long").as("sampled_tokens"),
        expr("sampled_tokens * 10000 div nullif(alloc, 0)")
          .cast("long").as("fill_bp"))
      .orderBy(col("source"))
  }

  /** Cutoff instant for [[temporalEmbargoSplit]]: 2024-01-24T00:00Z
    * in epoch micros (the fixture's event range is January 2024). */
  val EmbargoCutoffUs = 1706054400000000L
  /** Embargo width: 2 days in micros. */
  val EmbargoUs = 2L * 24 * 3600 * 1000000

  /** TEMPORAL train/test split with an EMBARGO gap — the
    * leakage-safe split for time-dependent data (the de-Prado purged
    * split finance ML uses; the same shape guards "predict the
    * future" evals anywhere): train < cutoff − embargo ≤ (discarded
    * embargo zone) < cutoff ≤ test, so features computed over trailing
    * windows of train rows cannot overlap the test period. Assignment
    * is a pure row-local comparison; per user the gate also emits
    * `gap_us` = first test instant − last train instant, which is ≥
    * the embargo BY CONSTRUCTION — emitting it makes the guarantee
    * auditable rather than assumed. One keyed aggregation; the
    * q159 cluster-atomic split is the content-side sibling. */
  def temporalEmbargoSplit(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"))
    val part = when(col("tus") >= EmbargoCutoffUs, "test")
      .when(col("tus") >= EmbargoCutoffUs - EmbargoUs, "embargo")
      .otherwise("train")
    e.withColumn("part", part)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("part") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("part") === "embargo", 1L).otherwise(0L)).as("n_embargo"),
        sum(when(col("part") === "test", 1L).otherwise(0L)).as("n_test"),
        (min(when(col("part") === "test", col("tus"))) -
          max(when(col("part") === "train", col("tus")))).as("gap_us"))
      .orderBy(col("user_id"))
  }
}
