package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join with prefix filtering — the
  * PPJoin/AllPairs candidate-generation scheme (Xiao et al., WWW'08;
  * Bayardo et al., WWW'07) over word-3-gram shingle sets.
  *
  * [[Dedup.ngramJaccard]] builds candidates from EVERY shared shingle
  * (a full inverted index); correct, but at 100 TB the index list for
  * a common shingle pairs a large fraction of the corpus. Prefix
  * filtering is the lossless fix: order all shingles by global
  * document frequency (rarest first) and probe only each set's
  * *prefix* — the first `|x| - ceil(τ·|x|) + 1` shingles under that
  * order. Any pair with Jaccard ≥ τ MUST share a prefix shingle (if
  * the prefixes were disjoint, the overlap is bounded below the
  * τ-required minimum), so verifying candidate pairs against the full
  * sets reproduces the exact all-pairs answer — which is precisely
  * what the q198 oracle computes, with no prefix filter, proving
  * losslessness end-to-end.
  *
  * Scale shape: the skew profile INVERTS relative to the naive index —
  * prefixes keep each document's *rarest* shingles, so boilerplate
  * shingles (the hot keys that force [[Dedup.HotShingleCap]]
  * elsewhere) are exactly the ones prefixes drop; posting lists in
  * the candidate join are short by construction. The global frequency
  * order needs no materialized rank: (df, shingle) IS the order key,
  * so the per-doc prefix is a map-side `slice(array_sort(...))` after
  * one broadcast-joinable df lookup... df itself is corpus-wide state,
  * joined by shingle (shuffle join at scale — one hash join keyed on
  * the shingle, Spark's bread and butter).
  */
object SetSimJoin {

  /** τ = 1/2, kept rational so every threshold comparison is integer
    * arithmetic (`2·i ≥ na + nb − i` etc.). */
  val TauNum = 1
  val TauDen = 2

  /** Candidate pairs + exact verification. Output matches the exact
    * all-pairs Jaccard-≥-τ join (same columns as ngramJaccard plus
    * the exact set sizes and overlap). */
  def prefixJoin(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingleRowsOf(
      graft.sources.Tables.loadSpread(spark, dir, "documents")).cache()

    // global inverse-frequency order key: (df asc, shingle asc)
    val df = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val keyed = sh.join(df, Seq("s"))

    // per-doc ordered shingle array + set size
    val docs = keyed.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("ord"),
        count(lit(1)).as("n"))

    // prefix length p = n - ceil(τ·n) + 1, ceil in exact integers
    val p = (col("n") - expr(s"(n * $TauNum + ${TauDen - 1}) div $TauDen") +
      lit(1L)).cast("int")
    val prefixes = docs
      .select(col("doc_id"), col("n"),
        explode(slice(col("ord"), lit(1), p)).as("pe"))
      .select(col("doc_id"), col("n"), col("pe.s").as("s"))

    // candidate generation: join prefixes on the shared shingle; the
    // PPJoin length filter (τ·na ≤ nb ≤ na/τ, here in integers) prunes
    // pairs no Jaccard-≥-τ result can contain
    val cands = prefixes.select(col("doc_id").as("da"), col("n").as("na"), col("s"))
      .join(prefixes.select(col("doc_id").as("db"), col("n").as("nb"), col("s")),
        Seq("s"))
      .filter(col("da") < col("db") &&
        col("nb") * TauDen >= col("na") * TauNum &&
        col("na") * TauDen >= col("nb") * TauNum)
      .select(col("da"), col("db"), col("na"), col("nb"))
      .distinct()

    // exact verification against the FULL sets: count true overlap
    // for candidates only, then the exact rational Jaccard filter
    val aSide = cands.join(sh.select(col("doc_id").as("da"), col("s")), Seq("da"))
    val overlap = aSide
      .join(sh.select(col("doc_id").as("db"), col("s")), Seq("db", "s"))
      .groupBy(col("da"), col("db"), col("na"), col("nb"))
      .agg(count(lit(1)).as("i"))
    overlap
      .filter(col("i") * TauDen >= (col("na") + col("nb") - col("i")) * TauNum)
      .select(col("da"), col("db"), col("na"), col("nb"), col("i"),
        round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 4)
          .as("jaccard"))
      .orderBy(col("da"), col("db"))
  }
}
