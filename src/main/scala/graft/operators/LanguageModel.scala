package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.TextFunctions.{normalizeText, words}

/** N-gram language-model operators for corpus quality filtering — the
  * CCNet / DSIR family: train a bounded bigram LM on an in-domain
  * slice, score every document's cross-entropy under it, and compute
  * importance-resampling weights against a target distribution.
  *
  * Everything is *integer-exact*: surprisal is quantized to whole bits
  * via floor(log2(b/a)) computed as `length(bin(b div a)) - 1` — pure
  * integer division plus a binary-string length, which evaluates
  * identically in Spark and any ANSI engine (no libm `ln`, whose
  * last-ulp differences across engines would break exact oracles; the
  * 1-bit granularity is plenty for filter/rank decisions).
  *
  * Scale shape: the trained model is bounded driver-free state — a
  * count-pruned bigram table plus a context-total table, both
  * broadcast to the scoring join — so the per-document pass is
  * map-only + one per-doc aggregate. Reference anchor: quality gates
  * before DWH load (`dag_datapelangan.py:120-150` validation stage);
  * the LM scoring is the 100-TB generalization of that gate.
  */
object LanguageModel {

  /** Bigrams WITH multiplicity (order preserved) — unlike
    * TextFunctions.shingles, which distincts (set semantics for
    * MinHash). An LM needs occurrence counts. */
  private def bigramPairs(w: Column): Column = {
    val grams = transform(
      sequence(lit(1), size(w) - 1),
      i => struct(element_at(w, i).as("w1"), element_at(w, i + 1).as("w2")))
    when(size(w) >= 2, grams).otherwise(array().cast("array<struct<w1:string,w2:string>>"))
  }

  /** (doc_id, lang, w1, w2) bigram occurrences over normalized text.
    * The words array is materialized as its OWN projection before the
    * bigram lambda — higher-order functions re-evaluate free (non
    * lambda-bound) subexpressions per element_at call, so inlining
    * the normalize+split chain would re-run its regexes ~2× per word
    * per row (the Dedup.shingleRowsOf lesson; measured 26 s → ~2 s at
    * sf0.1 for q196 from exactly this hoist). */
  private def bigramRows(spark: SparkSession, dir: String): DataFrame =
    Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        words(normalizeText(col("text"))).as("w"))
      .select(col("doc_id"), col("lang"), explode(bigramPairs(col("w"))).as("bg"))
      .select(col("doc_id"), col("lang"), col("bg.w1"), col("bg.w2"))

  /** Bigrams with count < MinCount are pruned from the model (scored
    * as unseen). This is what keeps the broadcast model bounded at
    * 100 TB: the long tail of hapax bigrams — the overwhelming bulk
    * of distinct bigrams in any real corpus — never leaves the
    * training aggregation. */
  val MinCount = 2

  /** Rows of the q195 model readout (top bigrams by count). */
  val TrainTopK = 50

  /** Train the add-one-smoothed bigram LM on the English slice:
    * pruned bigram counts `c`, unpruned context totals `ctx_total`
    * (just predecessor-token occurrence counts — cheap, no big
    * intermediate), and successor-vocabulary size `v`. Readout =
    * deterministic top-[[TrainTopK]] bigrams. */
  def bigramLmTrain(spark: SparkSession, dir: String): DataFrame = {
    val bg = trainBigrams(spark, dir).cache()
    val model = prunedModel(bg)
    val ctx = contextTotals(bg)
    val v = successorVocab(bg)
    // distributed top-k (TakeOrderedAndProject) first; the global
    // row_number window then only ever sees TrainTopK rows
    model.join(ctx, Seq("w1"))
      .crossJoin(broadcast(v))
      .orderBy(col("c").desc, col("w1"), col("w2"))
      .limit(TrainTopK)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("w1"), col("w2"))))
      .select(col("w1"), col("w2"), col("c"), col("ctx_total"), col("v"),
        col("rk").cast("long").as("rk"))
      .orderBy(col("rk"))
  }

  private def trainBigrams(spark: SparkSession, dir: String): DataFrame =
    bigramRows(spark, dir).filter(col("lang") === "en")
      .select(col("w1"), col("w2"))

  private def prunedModel(trainBg: DataFrame): DataFrame =
    trainBg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= MinCount)

  private def contextTotals(trainBg: DataFrame): DataFrame =
    trainBg.groupBy(col("w1")).agg(count(lit(1)).as("ctx_total"))

  private def successorVocab(trainBg: DataFrame): DataFrame =
    trainBg.agg(countDistinct(col("w2")).as("v"))

  /** Keep documents at or below this many whole bits per bigram —
    * the CCNet "head" cut (low perplexity = in-domain). */
  val KeepBitsPerToken = 7.0

  /** Score EVERY document's bigram cross-entropy (in whole bits)
    * under the English-trained LM and flag the keep set — CCNet-style
    * perplexity filtering. Per-bigram surprisal with add-one
    * smoothing is floor(log2((ctx_total + v) / (c + 1))), integer
    * exact; unseen contexts degrade to floor(log2(v)) (uniform over
    * the successor vocab). The model and context tables are broadcast
    * (bounded by [[MinCount]] pruning), so the corpus-side plan is
    * map-only until the one per-doc aggregate. */
  def bitsPerToken(spark: SparkSession, dir: String): DataFrame = {
    val bg = trainBigrams(spark, dir).cache()
    val scored = bigramRows(spark, dir)
      .join(broadcast(prunedModel(bg)), Seq("w1", "w2"), "left")
      .join(broadcast(contextTotals(bg)), Seq("w1"), "left")
      .crossJoin(broadcast(successorVocab(bg)))
      .withColumn("b_", coalesce(col("ctx_total"), lit(0L)) + col("v"))
      .withColumn("a_", coalesce(col("c"), lit(0L)) + lit(1L))
      .withColumn("bits", (length(bin(expr("b_ div a_"))) - 1).cast("long"))
    scored.groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("bits_total"))
      .withColumn("bpt",
        col("bits_total").cast("double") / col("n_bigrams").cast("double"))
      .withColumn("kept", (col("bpt") <= KeepBitsPerToken).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** CCNet's head/middle/tail split: within each language, tertile
    * the documents by LM bits-per-token (ascending — "head" is the
    * most in-domain third) and label the buckets. This is the bucket
    * assignment CCNet publishes per shard and downstream mixtures
    * sample from ("train mostly on head, some middle"); the
    * percentile is per-language so low-resource languages aren't
    * wiped out by the dominant language's perplexity distribution
    * (the q202 stratification argument). ntile over (bpt, doc_id) is
    * deterministic; windows are partitioned by lang so each stratum
    * ranks independently, in parallel. */
  def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    val byLang = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("bpt"), col("doc_id"))
    bitsPerToken(spark, dir)
      .withColumn("tert", ntile(3).over(byLang))
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        col("bits_total"), col("bpt"),
        when(col("tert") === 1, "head").when(col("tert") === 2, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy(col("doc_id"))
  }

  /** Backoff penalty in whole bits (≈ −log2 of stupid backoff's
    * α = 0.4 ≈ 1.32 bits, kept integer at 2). */
  val BackoffPenaltyBits = 2L

  /** Stupid-backoff scoring (Brants et al. 2007 — the smoothing
    * scheme DESIGNED for distributed LMs: no normalization pass, no
    * discount bookkeeping, just "back off and pay α"): a bigram in
    * the pruned model scores its bigram surprisal; anything else
    * scores the SUCCESSOR's unigram surprisal plus
    * [[BackoffPenaltyBits]]. Strictly better-calibrated than q196's
    * uniform OOV fallback — a rare-but-real word costs its true
    * unigram bits, not log2(V) — while staying integer-exact and
    * keeping the same bounded broadcast model (pruned bigrams +
    * unigram counts, both count tables). */
  def backoffBits(spark: SparkSession, dir: String): DataFrame = {
    val train = Tables.loadSpread(spark, dir, "documents")
      .filter(col("lang") === "en")
      .select(explode(words(normalizeText(col("text")))).as("w"))
      .filter(length(col("w")) > 0)
      .cache()
    val uni = train.groupBy(col("w").as("w2")).agg(count(lit(1)).as("cu"))
    // Two distinct vocabularies, mirrored in the q205 oracle: the
    // modeled-bigram branch smooths with the bigram SUCCESSOR vocab
    // (count(DISTINCT w2) over training bigrams — same v as
    // bitsPerToken/surprisalBursts), the backoff branch with the
    // unigram vocab (v2). They differ whenever a training word occurs
    // only document-initially (never as a w2), so conflating them
    // breaks the hash gate on such corpora.
    val totals = train.agg(count(lit(1)).as("u_total"),
      countDistinct(col("w")).as("v2"))
    val bg = trainBigrams(spark, dir)
    val scored = bigramRows(spark, dir)
      .join(broadcast(prunedModel(bg)), Seq("w1", "w2"), "left")
      .join(broadcast(contextTotals(bg).withColumnRenamed("ctx_total", "ctx")),
        Seq("w1"), "left")
      .join(broadcast(uni), Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(successorVocab(bg)))
      .withColumn("bg_b", coalesce(col("ctx"), lit(0L)) + col("v"))
      .withColumn("bg_a", col("c") + lit(1L)) // only read when c is present
      .withColumn("un_b", col("u_total") + col("v2"))
      .withColumn("un_a", coalesce(col("cu"), lit(0L)) + lit(1L))
      .withColumn("bits",
        when(col("c").isNotNull,
          (length(bin(expr("bg_b div bg_a"))) - 1).cast("long"))
          .otherwise((length(bin(expr("un_b div un_a"))) - 1).cast("long") +
            lit(BackoffPenaltyBits)))
    scored.groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("bits_total"))
      .withColumn("bpt",
        col("bits_total").cast("double") / col("n_bigrams").cast("double"))
      .orderBy(col("doc_id"))
  }

  /** Sliding-burst window length (consecutive bigrams). */
  val BurstWindow = 8

  /** Surprisal-burst detection: the max sum of surprisal bits over
    * any [[BurstWindow]] consecutive bigrams — the signal that finds
    * a garbled/spam SEGMENT inside an otherwise-clean document, which
    * a whole-document mean (q196) averages away. Per-doc windows
    * (partitioned by doc — embarrassingly parallel), full windows
    * only; docs with fewer than [[BurstWindow]] bigrams report their
    * total as the single truncated burst. */
  def surprisalBursts(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bg = trainBigrams(spark, dir).cache()
    val positioned = Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        words(normalizeText(col("text"))).as("w"))
      .select(col("doc_id"), col("lang"),
        posexplode(bigramPairs(col("w"))).as(Seq("pos", "bg")))
      .select(col("doc_id"), col("lang"), (col("pos") + 1).as("p"),
        col("bg.w1"), col("bg.w2"))
    val scored = positioned
      .join(broadcast(prunedModel(bg)), Seq("w1", "w2"), "left")
      .join(broadcast(contextTotals(bg)), Seq("w1"), "left")
      .crossJoin(broadcast(successorVocab(bg)))
      .withColumn("b_", coalesce(col("ctx_total"), lit(0L)) + col("v"))
      .withColumn("a_", coalesce(col("c"), lit(0L)) + lit(1L))
      .withColumn("bits", (length(bin(expr("b_ div a_"))) - 1).cast("long"))
    val perDoc = Window.partitionBy(col("doc_id"))
    val frame = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      .rowsBetween(Window.currentRow, BurstWindow - 1)
    val bursts = scored
      .withColumn("n", count(lit(1)).over(perDoc))
      .withColumn("burst", sum(col("bits")).over(frame))
      .filter(col("p") <= greatest(col("n") - (BurstWindow - 1), lit(1)))
    bursts
      .withColumn("doc_max", max(col("burst")).over(perDoc))
      .groupBy(col("doc_id"), col("lang"), col("n"))
      .agg(max(col("burst")).as("max_burst_bits"),
        min(when(col("burst") === col("doc_max"), col("p"))).as("burst_pos"))
      .select(col("doc_id"), col("lang"), col("n").as("n_bigrams"),
        col("max_burst_bits"), col("burst_pos").cast("long").as("burst_pos"))
      .orderBy(col("doc_id"))
  }

  /** Feature-hash buckets for DSIR (the paper hashes n-grams into a
    * fixed bucket space; 256 here). Portable md5 two-hex-digit
    * arithmetic — identical in the DuckDB oracle. */
  val DsirBuckets = 256

  private def featBucket(s: Column): Column =
    (conv(substring(md5(s), 1, 1), 16, 10).cast("long") * 16 +
      conv(substring(md5(s), 2, 1), 16, 10).cast("long"))

  /** Number of top-weight documents the resampling step selects. */
  val DsirTopK = 100

  /** DSIR (Data Selection via Importance Resampling, Xie et al. 2023)
    * weights: hash each document's bigrams into [[DsirBuckets]]
    * buckets, estimate bucket distributions for the target (English
    * docs) and the raw corpus, and weight each document by
    * log2(p_target/p_raw) summed over its feature occurrences — here
    * as the exact integer bit difference of the two add-one
    * surprisals. Highest-weight documents are the most
    * target-distributed; the readout ranks the top [[DsirTopK]].
    *
    * The two distribution tables are exactly [[DsirBuckets]] rows
    * each — broadcast, constant-size model state however large the
    * corpus. */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val feats = bigramRows(spark, dir)
      .select(col("doc_id"), col("lang"),
        featBucket(concat_ws(" ", col("w1"), col("w2"))).as("f"))
      .cache()
    val target = feats.filter(col("lang") === "en")
      .groupBy(col("f")).agg(count(lit(1)).as("ct"))
    val nt = feats.filter(col("lang") === "en").agg(count(lit(1)).as("n_t"))
    val raw = feats.groupBy(col("f")).agg(count(lit(1)).as("cr"))
    val nr = feats.agg(count(lit(1)).as("n_r"))
    // per-bucket surprisal bits under each distribution (add-one over
    // the bucket space), then per-doc sum of (raw - target) bits
    val bits = raw.join(target, Seq("f"), "left")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .withColumn("bt_", col("n_t") + lit(DsirBuckets.toLong))
      .withColumn("at_", coalesce(col("ct"), lit(0L)) + lit(1L))
      .withColumn("br_", col("n_r") + lit(DsirBuckets.toLong))
      .withColumn("ar_", col("cr") + lit(1L))
      .withColumn("bits_t", (length(bin(expr("bt_ div at_"))) - 1).cast("long"))
      .withColumn("bits_r", (length(bin(expr("br_ div ar_"))) - 1).cast("long"))
      .select(col("f"), (col("bits_r") - col("bits_t")).as("dbits"))
    // distributed top-k first (TakeOrderedAndProject); the ranking
    // window then runs over exactly DsirTopK rows
    feats.join(broadcast(bits), Seq("f"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_feats"), sum(col("dbits")).as("weight_bits"))
      .orderBy(col("weight_bits").desc, col("doc_id"))
      .limit(DsirTopK)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("weight_bits").desc, col("doc_id"))))
      .select(col("doc_id"), col("lang"), col("n_feats"), col("weight_bits"),
        col("rk").cast("long").as("rk"))
      .orderBy(col("rk"))
  }
}
