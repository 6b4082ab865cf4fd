package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.TextFunctions._

/** Text-analysis operators for the training-data pipeline: language
  * identification (stopword/n-gram heuristic), quality scoring
  * (length / punctuation / stopword ratios), token counting
  * (whitespace + BPE-ish regex), and document fingerprinting.
  *
  * All pure column expressions over the `documents` table — one
  * narrow, shuffle-free projection per document (aggregates below are
  * only for compact verification output). At 100 TB this is the ideal
  * operator shape: map-only, codegen'd, column-pruned to `text`.
  */
object TextAnalysis {

  /** Language-ID: per-language stopword hit counts + deterministic
    * argmax, aggregated to (actual, detected) confusion counts. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.loadSpread(spark, dir, "documents")
    d.select(col("lang") +: langScores(words(lower(col("text")))): _*)
      .select(col("lang"), detectLangFromScores.as("detected"))
      .groupBy(col("lang"), col("detected"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("detected"))
  }

  /** Quality scoring: structural ratios + a blended score, all exact
    * integer counts until the final double divisions (deterministic
    * IEEE ops, engine-portable). */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.loadSpread(spark, dir, "documents")
    val w = words(col("text"))
    val punct = length(col("text")) - length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""))
    d.select(col("doc_id"), size(w).cast("long").as("n_words"), punct.cast("long").as("n_punct"),
        stopwordCount(w, "en").cast("long").as("n_stopwords"),
        avgWordLen(col("text")).as("avg_word_len"),
        qualityExpr(col("text")).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Token counting: whitespace tokens and BPE-ish regex tokens. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.loadSpread(spark, dir, "documents")
    d.select(col("doc_id"),
        size(words(col("text"))).cast("long").as("ws_tokens"),
        bpeTokenCount(col("text")).cast("long").as("bpe_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Corpus vocabulary statistics: term frequency and document
    * frequency per normalized token, with the df ratio against the
    * corpus size — the raw material for stopword lists, vocab pruning
    * and tf-idf weighting. One explode + one grouped aggregate
    * (count + count distinct), shuffled on the token — the natural
    * key; the corpus-size scalar joins in as a broadcast. Top-k by
    * document frequency with a total-order tie-break. */
  def vocabStats(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val d = Tables.loadSpread(spark, dir, "documents")
    val toks = d.select(col("doc_id"),
      explode(words(normalizeText(col("text")))).as("token"))
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    toks.groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("token"), col("tf"), col("df"),
        (col("df").cast("double") / col("n_docs")).as("df_ratio"))
      .orderBy(col("df").desc, col("tf").desc, col("token"))
      .limit(k)
  }

  /** Document fingerprinting: md5 over canonical normalized text +
    * shape stats — the join key for cross-corpus exact dedup. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.loadSpread(spark, dir, "documents")
    val norm = normalizeText(col("text"))
    d.select(col("doc_id"), md5(norm).as("fp"),
        length(norm).cast("long").as("norm_len"),
        substring(md5(norm), 1, 8).as("shard_key"))
      .orderBy(col("doc_id"))
  }
}
