package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.TextFunctions.{normalizeText, words}

/** Discriminative quality-classifier filtering — the DCLM / GPT-3 /
  * LLaMA recipe: train a cheap text classifier that separates a
  * curated "seed" slice from the rest of the crawl, score every
  * document with the log-likelihood ratio, and keep the documents the
  * classifier thinks look like the seed. This complements the
  * *generative* CCNet perplexity filter (q196, LanguageModel): that
  * one asks "is this fluent under an in-domain LM", this one asks
  * "does this look more like curated data than like the raw pool" —
  * production pipelines run both.
  *
  * The model is multinomial Naive Bayes with add-one smoothing over
  * unigram counts, and every score is *integer-exact*: per-token
  * class surprisal is quantized to whole bits via
  * floor(log2((N_class + V) / (c_class(w) + 1))) computed as
  * `length(bin(b div a)) - 1` (the LanguageModel.scala trick — pure
  * integer division plus binary-string length, identical in Spark and
  * any ANSI engine; no libm, so the DuckDB oracle hash-matches). The
  * whole-bit LLR is sum over tokens of (neg bits − pos bits) plus the
  * whole-bit class prior; >= 0 means the seed class explains the
  * document at least as cheaply, and the doc is kept.
  *
  * Scale shape (the 100 TB posture): the trained model is a
  * count-pruned per-word table (words with total train count <
  * [[MinCount]] never leave the training aggregation — the hapax tail
  * that dominates distinct-word counts in a real crawl stays out of
  * the model) plus one-row totals frames, all broadcast. Scoring is
  * then a map-only pass over the corpus (explode → broadcast hash
  * join → per-doc aggregate with map-side partials); nothing shuffles
  * on anything wider than doc_id.
  *
  * Reference anchor: the validation/quality gates before DWH load
  * (`dag_datapelangan.py:120-150`) — this is their learned,
  * corpus-scale generalization.
  */
object QualityClassifier {

  /** Sources treated as the curated positive seed (DCLM's "OH2.5 +
    * ELI5" role). Everything else is the raw-pool negative class. */
  val SeedSources: Seq[String] = (0 until 5).map(i => s"src$i")

  /** Docs with doc_id % [[TrainMod]] != 0 train the model; the full
    * corpus is scored (training docs included — a production filter
    * scores everything, and the held-out flag lets the eval read
    * generalization separately). */
  val TrainMod = 5

  /** Words with total train count below this are pruned from the
    * broadcast model and score as unseen (c = 0) in both classes. */
  val MinCount = 2

  /** Keep documents whose whole-bit LLR is >= this. */
  val KeepLlrBits = 0L

  /** (doc_id, source, w) token occurrences over normalized text, empty
    * tokens dropped (mirrors the oracle's length(term) > 0 guard). */
  private def tokenRows(spark: SparkSession, dir: String): DataFrame =
    Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(words(normalizeText(col("text")))).as("w"))
      .filter(length(col("w")) > 0)

  private def isSeed = col("source").isin(SeedSources: _*)

  /** Score every document: n_tokens, whole-bit LLR (seed-favouring
    * when positive), the keep decision, and the held-out flag. */
  def nbScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokenRows(spark, dir)
    val train = toks.filter(pmod(col("doc_id"), lit(TrainMod)) =!= 0)

    // per-word class counts, pruned on TOTAL train count so a word's
    // presence in the model never depends on its class split
    val model = train
      .groupBy(col("w"))
      .agg(sum(when(isSeed, 1L).otherwise(0L)).as("c_pos"),
        sum(when(!isSeed, 1L).otherwise(0L)).as("c_neg"))
      .filter(col("c_pos") + col("c_neg") >= MinCount)

    // one-row totals: class token masses and the shared vocabulary
    // size (ALL distinct train words, pruned or not — add-one
    // smoothing smooths over the full event space, like q196's v)
    val totals = train
      .agg(sum(when(isSeed, 1L).otherwise(0L)).as("n_pos"),
        sum(when(!isSeed, 1L).otherwise(0L)).as("n_neg"),
        countDistinct(col("w")).as("v"))

    // whole-bit class prior from train doc counts:
    // floor(log2(d_all/d_neg)) - floor(log2(d_all/d_pos))
    val docPriors = Tables.loadSpread(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(TrainMod)) =!= 0)
      .agg(count(lit(1)).as("d_all"),
        sum(when(isSeed, 1L).otherwise(0L)).as("d_pos"))
      .withColumn("prior_bits",
        (length(bin(expr("d_all div (d_all - d_pos)"))) - 1).cast("long")
          - (length(bin(expr("d_all div d_pos"))) - 1).cast("long"))
      .select(col("prior_bits"))

    val perDoc = toks
      .join(broadcast(model), Seq("w"), "left")
      .crossJoin(broadcast(totals))
      // materialize the div operands as their own columns (q196
      // pattern) — `div` is integer division, floor-exact for the
      // all-positive operands here
      .withColumn("bp_", col("n_pos") + col("v"))
      .withColumn("ap_", coalesce(col("c_pos"), lit(0L)) + lit(1L))
      .withColumn("bn_", col("n_neg") + col("v"))
      .withColumn("an_", coalesce(col("c_neg"), lit(0L)) + lit(1L))
      .withColumn("bits_pos", (length(bin(expr("bp_ div ap_"))) - 1).cast("long"))
      .withColumn("bits_neg", (length(bin(expr("bn_ div an_"))) - 1).cast("long"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("bits_neg") - col("bits_pos")).as("llr_word_bits"))

    perDoc
      .crossJoin(broadcast(docPriors))
      .withColumn("llr_bits", col("llr_word_bits") + col("prior_bits"))
      .select(col("doc_id"), col("source"), col("n_tokens").cast("long").as("n_tokens"),
        col("llr_bits").cast("long").as("llr_bits"),
        (col("llr_bits") >= KeepLlrBits).cast("int").as("kept"),
        (pmod(col("doc_id"), lit(TrainMod)) === 0).cast("int").as("heldout"))
      .orderBy(col("doc_id"))
  }

  /** Calibration of the classifier ON HELD-OUT DATA — the check every
    * learned data filter needs before its threshold is trusted at
    * corpus scale: quintile the held-out docs by LLR (descending —
    * bucket 1 = most seed-like) and report each bucket's actual
    * seed-membership rate in basis points. A well-behaved filter
    * shows a monotone seed_bp profile; a flat one means the score
    * carries no signal and the threshold is arbitrary. The q191
    * calibration-curve discipline applied to q214's scores. One
    * window over the held-out slice (a bounded fraction of the
    * corpus), then a 5-row aggregate. */
  def calibration(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // cached: the held-out slice (the full NB scoring chain) feeds
    // BOTH the score histogram and the tie-rank assignment below —
    // without the cache the scoring chain runs twice
    val held = nbScore(spark, dir).filter(col("heldout") === 1).cache()
    // Round 15: `ntile(5)` over ONE unpartitioned window sorted the
    // whole held-out slice (a constant FRACTION of the corpus) in a
    // single task. Decomposed via the q162/q242 compressed-bin
    // discipline — exact, bit-identical buckets:
    //   1. counts per llr_bits value (whole-bit integer scores — the
    //      value space is compressed by construction, bounded by the
    //      score range, not the corpus);
    //   2. cumulative offsets over those bounded score rows (the only
    //      unpartitioned window left, ≤ distinct-score rows); the
    //      held-out total n is the sum of the same bounded rows;
    //   3. per-score tie ranks by doc_id (PARTITIONED by score —
    //      parallel);
    //   4. global rank = offset + tie rank; bucket via the exact
    //      NTILE arithmetic (first n%5 buckets get ⌈n/5⌉ rows).
    val cnts = held.groupBy(col("llr_bits").as("v")).agg(count(lit(1)).as("c"))
      .cache() // ≤ distinct scores — feeds offsets AND the total
    val wv = Window.orderBy(col("v").desc) // ≤ distinct scores — bounded
    val offs = cnts
      .withColumn("cum_before", sum(col("c")).over(wv) - col("c"))
      .select(col("v").as("llr_bits"), col("cum_before"))
    val total = cnts.agg(sum(col("c")).as("n"))
    val wtie = Window.partitionBy(col("llr_bits")).orderBy(col("doc_id"))
    held
      .withColumn("tie_rn", row_number().over(wtie))
      .join(broadcast(offs), Seq("llr_bits"))
      .crossJoin(broadcast(total))
      .withColumn("rnk", col("cum_before") + col("tie_rn"))
      .withColumn("q", expr("n div 5"))
      .withColumn("r", expr("n % 5"))
      .withColumn("bucket",
        when(col("rnk") <= col("r") * (col("q") + 1),
          expr("(rnk + q) div (q + 1)"))
          .otherwise(expr("r + (rnk - r * (q + 1) + q - 1) div q")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(isSeed, 1L).otherwise(0L)).as("n_seed"),
        min(col("llr_bits")).as("min_llr"),
        max(col("llr_bits")).as("max_llr"))
      .select(col("bucket").cast("long").as("bucket"),
        col("n_docs").cast("long").as("n_docs"),
        col("n_seed").cast("long").as("n_seed"),
        expr("n_seed * 10000 div n_docs").cast("long").as("seed_bp"),
        col("min_llr"), col("max_llr"))
      .orderBy(col("bucket"))
  }
}
