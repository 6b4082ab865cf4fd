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
  def prefixJoin(spark: SparkSession, dir: String): DataFrame =
    prefixJoinFrom(Dedup.shingleRowsOf(
      graft.sources.Tables.loadSpread(spark, dir, "documents")).cache())

  /** As [[prefixJoin]] but over caller-provided (cached) shingle rows
    * — the shared-corpus-scan seam (the Dedup.*From discipline);
    * q221's eval harness feeds the SAME cached shingles to this truth
    * join and to the LSH candidate generator it measures.
    *
    * Round-15 scale fixes (both exactness-preserving — the q198
    * oracle, the UNfiltered all-pairs join, is unchanged):
    *   - POSITIONAL filter (PPJoin, Xiao et al. WWW'08 §3.2): a
    *     candidate posting where token s sits at 1-based positions
    *     (pa, pb) of the two ordered sets bounds the overlap by
    *     1 + min(na−pa, nb−pb) — tokens before the posting are, at
    *     the pair's FIRST shared token, provably unshared (both docs
    *     sort by the same global (df,s) key, so shared tokens appear
    *     in the same relative order; an earlier shared token in
    *     either doc would itself be an earlier shared token in BOTH).
    *     A Jaccard-≥-τ pair needs overlap ≥ ⌈τ(na+nb)/(1+τ)⌉ and its
    *     first-shared-token posting meets the bound, so dropping
    *     postings that fail it loses no qualifying pair. Measured
    *     motivation: the ×100-unique replica ran q198 at ×302 of base
    *     (1304.5 s) on positional-filter-free candidates.
    *   - the verification join stays the exploded-shingle-rows form:
    *     with candidates bounded by the positional filter its aSide
    *     explode is candidate-volume-sized, and the exploded hash
    *     joins + count aggregate outperform per-pair array
    *     intersection (an array_intersect-of-structs variant measured
    *     ×5.4 SLOWER at sf0.1 — generic struct equality per element
    *     beats no shuffle math at any tested scale). */
  def prefixJoinFrom(sh: org.apache.spark.sql.DataFrame): DataFrame = {
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
      .select(col("doc_id"), col("n"), posexplode(slice(col("ord"), lit(1), p)))
      .select(col("doc_id"), col("n"), (col("pos") + 1).cast("long").as("pp"),
        col("col.s").as("s"))

    // candidate generation: join prefixes on the shared shingle; the
    // PPJoin length filter (τ·na ≤ nb ≤ na/τ, here in integers) plus
    // the positional filter prune pairs no Jaccard-≥-τ result can
    // contain
    val cands = prefixes
      .select(col("doc_id").as("da"), col("n").as("na"), col("pp").as("pa"), col("s"))
      .join(prefixes
          .select(col("doc_id").as("db"), col("n").as("nb"), col("pp").as("pb"), col("s")),
        Seq("s"))
      .filter(col("da") < col("db") &&
        col("nb") * TauDen >= col("na") * TauNum &&
        col("na") * TauDen >= col("nb") * TauNum &&
        (lit(1L) + least(col("na") - col("pa"), col("nb") - col("pb"))) *
          (TauNum + TauDen) >= (col("na") + col("nb")) * TauNum)
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

  /** Index-vs-delta PPJoin — the incremental form streaming ingest
    * needs (the exact-Jaccard analogue of what
    * [[Dedup.incrementalLshFrom]] gives LSH): the corpus slice
    * `doc_id % deltaMod ≠ deltaRes` plays the PERSISTED index (its
    * prefix postings and full shingle sets are the stored state an
    * exact set-similarity index must keep — unlike LSH there is no
    * 12-hash shortcut, exact verification needs the sets), the
    * `= deltaRes` slice is the newly-arrived delta. Candidate pairs
    * fan out ONLY from delta prefix postings probing the (index ∪
    * delta) prefix index — index×index pairs are never generated
    * (they were found when those docs arrived), so per-batch work
    * scales with the delta, not the corpus. The same exact
    * verification and integer threshold as [[prefixJoin]]; the gate's
    * oracle is the UNfiltered all-pairs join restricted to pairs with
    * ≥ 1 delta member — the same losslessness proof as q198.
    *
    * The df order key is computed over index ∪ delta (in production:
    * the index's maintained document-frequency stats plus the delta
    * increment) so prefixes on both sides agree. */
  def prefixJoinDelta(spark: SparkSession, dir: String,
                      deltaMod: Int = 10, deltaRes: Int = 3): DataFrame = {
    val sh = Dedup.shingleRowsOf(
      graft.sources.Tables.loadSpread(spark, dir, "documents")).cache()
    val isDelta = (c: org.apache.spark.sql.Column) =>
      c % deltaMod === deltaRes

    val df = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val keyed = sh.join(df, Seq("s"))
    val docs = keyed.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("ord"),
        count(lit(1)).as("n"))
    val p = (col("n") - expr(s"(n * $TauNum + ${TauDen - 1}) div $TauDen") +
      lit(1L)).cast("int")
    val prefixes = docs
      .select(col("doc_id"), col("n"), posexplode(slice(col("ord"), lit(1), p)))
      .select(col("doc_id"), col("n"), (col("pos") + 1).cast("long").as("pp"),
        col("col.s").as("s"))

    // delta prefixes probe ALL prefix postings; a delta-delta pair
    // arrives from both directions, de-duplicated by the canonical
    // (least, greatest) ordering before distinct. Positional filter
    // as in [[prefixJoinFrom]] — lossless by the same first-shared-
    // token argument, symmetric in the two sides.
    val cands = prefixes.filter(isDelta(col("doc_id")))
      .select(col("doc_id").as("x"), col("n").as("nx"), col("pp").as("px"), col("s"))
      .join(prefixes
          .select(col("doc_id").as("y"), col("n").as("ny"), col("pp").as("py"), col("s")),
        Seq("s"))
      .filter(col("x") =!= col("y") &&
        col("ny") * TauDen >= col("nx") * TauNum &&
        col("nx") * TauDen >= col("ny") * TauNum &&
        (lit(1L) + least(col("nx") - col("px"), col("ny") - col("py"))) *
          (TauNum + TauDen) >= (col("nx") + col("ny")) * TauNum)
      .select(least(col("x"), col("y")).as("da"),
        greatest(col("x"), col("y")).as("db"),
        when(col("x") < col("y"), col("nx")).otherwise(col("ny")).as("na"),
        when(col("x") < col("y"), col("ny")).otherwise(col("nx")).as("nb"))
      .distinct()

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
