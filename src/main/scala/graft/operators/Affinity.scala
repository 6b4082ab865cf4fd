package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Affinity / graph analytics over the order graph: market-basket
  * co-occurrence mining and an integer-exact PageRank over the
  * co-supply graph.
  *
  * Scale posture: both operators avoid the naive lineitem⋈lineitem
  * self-join (which shuffles the fact table twice and re-expands
  * every group). Instead each order's small member set (order size is
  * bounded — TPC-H ≤ 7 lines) is collected in ONE shuffle and the
  * pair expansion happens map-side over that bounded array, so the
  * expensive part is a single fact-table-sized aggregation however
  * large the corpus. PageRank iterations are plain equi-joins keyed
  * on the edge endpoints; every iterative operator here truncates its
  * lineage every [[CheckpointEvery]] rounds through [[truncateNow]] —
  * reliable `checkpoint()` when the session has a checkpoint dir
  * (cluster posture, survives executor loss), eager `localCheckpoint()`
  * otherwise — so plan depth stays bounded however many rounds run.
  */
object Affinity {

  /** Checkpoint cadence for the iterative operators below. */
  private val CheckpointEvery = 2

  /** Eager lineage truncation — the one choke point every iterative
    * operator here funnels through. Mode is selected by the session's
    * checkpoint dir:
    *
    *  - checkpoint dir SET (`sparkContext.setCheckpointDir(...)` —
    *    cluster posture): RELIABLE eager `checkpoint()`. The frame is
    *    written to the durable dir and the plan replaced with a scan
    *    of the checkpointed files, so a 100-round job survives
    *    executor loss — executor-local checkpoint blocks die with
    *    their executor and are then unrecomputable (the lineage was
    *    truncated away).
    *  - no checkpoint dir (local iteration / tests): eager
    *    `localCheckpoint()` — same plan truncation, executor-local
    *    storage, no durable-dir requirement.
    *
    * Either way, plan depth — and with it analyzer/optimizer time,
    * task-binary size, and recomputation-on-failure cost — stays
    * O(CheckpointEvery) instead of growing linearly with the round
    * count. Caching alone does NOT do this: an InMemoryRelation still
    * nests the full upstream plan. */
  private def truncateNow(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Truncate iterative lineage every [[CheckpointEvery]] rounds,
    * skipping the final round (the last frame is consumed exactly once
    * downstream — truncating it would only add a job). */
  private def truncateLineage(df: DataFrame, round: Int, rounds: Int): DataFrame =
    if (round % CheckpointEvery == 0 && round < rounds) truncateNow(df) else df

  /** Per-basket member cap for the map-side pair expansions below:
    * an m-item basket expands into m²/2 pairs in ONE task, so a
    * single pathological 10k-item basket would emit 50M rows from one
    * map call while every normal basket emits ≤ ~25. Baskets are
    * truncated to their [[BasketCap]] SORTED-smallest members first
    * (deterministic, oracle-mirrorable as a rank filter — the same
    * philosophy as the LSH band cap and [[linkPrediction]]'s
    * centerCap), bounding any task's expansion at cap²/2. TPC-H
    * baskets are ≤ 7 lines, so at the gated scale factors the cap is
    * provably inert — it exists for the 100 TB corpus whose dirtiest
    * basket nobody audited. */
  val BasketCap = 64

  /** Brand pairs bought together: distinct (order, brand) pairs,
    * per-order sorted brand sets capped at [[BasketCap]], map-side
    * pair expansion, global pair count; top `k` by support. */
  def brandPairs(spark: SparkSession, dir: String, k: Int = 30): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val p = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
    val sets = li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(slice(sort_array(collect_set(col("p_brand"))), 1, BasketCap).as("bs"))
      .filter(size(col("bs")) >= 2)
    // (bs[i], bs[j]) for i < j — sorted input ⇒ b1 < b2 canonically
    val pairs = sets.select(explode(expr(
      "flatten(transform(bs, (x, i) -> transform(slice(bs, i + 2, size(bs)), y -> struct(x AS b1, y AS b2))))"
    )).as("pr"))
    pairs.select(col("pr.b1").as("b1"), col("pr.b2").as("b2"))
      .groupBy(col("b1"), col("b2"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("b1"), col("b2"))
      .limit(k)
  }

  /** Directed co-supply edges: src → dst iff both suppliers serve the
    * same order (src ≠ dst, distinct). Symmetric by construction, so
    * no dangling mass exists for nodes with in-edges. */
  private def coSupplyEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val sets = li.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_suppkey"))).as("ss"))
      .filter(size(col("ss")) >= 2)
    // canonical (i < j) pairs through the dedup shuffle — half the
    // rows of the both-directions expansion — then mirrored; the
    // mirror reads the deduped exchange twice (ReusedExchange), not
    // the fact table
    val canon = sets.select(explode(expr(
      "flatten(transform(ss, (x, i) -> transform(slice(ss, i + 2, size(ss)), y -> struct(x AS src, y AS dst))))"
    )).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
    canon.unionByName(canon.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Integer-exact PageRank (damping 0.85, `iters` rounds) over the
    * co-supply graph. All arithmetic is BIGINT with floor division
    * (`div`), so every engine computes bit-identical scores:
    *   score_0     = 1_000_000
    *   score_{t+1} = 150_000 + (Σ_in (score_t div outdeg)) * 85 div 100
    * Suppliers with no co-supply edges settle at the base 150_000.
    * Returns the top `k` (score desc, key asc). */
  def pageRankCoSupply(spark: SparkSession, dir: String,
                       iters: Int = 3, k: Int = 20): DataFrame = {
    // edge frame built once, hash-partitioned by dst so every
    // iteration's incoming-sum aggregates WITHOUT re-shuffling the
    // (corpus-sized) edges; all per-iteration state is node-sized
    val edges = coSupplyEdges(spark, dir).repartition(col("dst")).cache()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val nodes = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey").as("id"))
    var score = nodes.select(col("id"), lit(1000000L).as("score"))
    for (t <- 1 to iters) {
      // per-edge contribution of each source: node-sized → broadcast
      // (for node sets beyond broadcast range, drop the hint and this
      // becomes a shuffle join on src — the edge frame still only
      // shuffles once per iteration, on the join side)
      val per = score.join(deg.withColumnRenamed("src", "id"), Seq("id"))
        .select(col("id").as("src"), expr("score div d").as("c"))
      val contrib = edges.join(broadcast(per), Seq("src"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_c"))
      score = truncateLineage(nodes
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(150000L) + expr("coalesce(in_c, 0L) * 85 div 100")).as("score")),
        t, iters)
    }
    score.orderBy(col("score").desc, col("id"))
      .limit(k)
      .select(col("id").as("s_suppkey"), col("score"))
  }

  /** Item-item collaborative-filtering similarity over the order
    * baskets: cosine between parts' order-occurrence vectors,
    *   cos(a,b) = co(a,b) / √(deg a · deg b),
    * ranked by the INTEGER surrogate co²·10⁸ div (deg·deg) — exact,
    * engine-portable, and order-equivalent to cos² (cos itself needs
    * a square root; its square doesn't). Pairs below `minSupport`
    * co-occurrences are dropped first — both the statistical floor
    * and the sparsity bound (see [[coPurchaseEdges]]).
    *
    * Scale posture: the pair expansion is map-side over per-order
    * sorted member sets capped at [[BasketCap]] (one degenerate giant
    * basket cannot blow up its task), so the expensive step is one
    * fact-sized aggregation; degrees are a second distinct-pair
    * aggregation over the UNCAPPED occurrences (a part's popularity
    * is exact either way); the final join keys on part ids. */
  def itemSimilarity(spark: SparkSession, dir: String,
                     minSupport: Int = 2, k: Int = 25): DataFrame = {
    val op = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().cache()
    val deg = op.groupBy(col("l_partkey")).agg(count(lit(1)).as("d"))
    val sets = op.groupBy(col("l_orderkey"))
      .agg(slice(sort_array(collect_set(col("l_partkey"))), 1, BasketCap).as("ps"))
      .filter(size(col("ps")) >= 2)
    val co = sets.select(explode(expr(
        "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x AS pa, y AS pb))))"
      )).as("e"))
      .select(col("e.pa").as("pa"), col("e.pb").as("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("co"))
      .filter(col("co") >= minSupport)
    co.join(deg.select(col("l_partkey").as("pa"), col("d").as("n_a")), Seq("pa"))
      .join(deg.select(col("l_partkey").as("pb"), col("d").as("n_b")), Seq("pb"))
      .select(col("pa"), col("pb"), col("co"), col("n_a"), col("n_b"),
        expr("co * co * 100000000 div (n_a * n_b)").as("score"))
      .orderBy(col("score").desc, col("pa"), col("pb"))
      .limit(k)
  }

  /** Undirected part co-purchase edges: parts appearing together in
    * at least `minSupport` distinct orders, canonically keyed
    * src < dst. The support threshold is what keeps the projected
    * graph SPARSE — a bipartite projection without it densifies
    * toward a clique as the corpus grows (the supplier projection
    * here is already 91% complete at sf0.1), and no triangle
    * algorithm survives a near-clique. */
  private def coPurchaseEdges(spark: SparkSession, dir: String,
                              minSupport: Int): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val sets = li.distinct()
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .filter(size(col("ps")) >= 2)
    sets.select(explode(expr(
      "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x AS src, y AS dst))))"
    )).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= minSupport)
      .select(col("src"), col("dst"))
  }

  /** Link prediction by common-neighbor count over the part
    * co-purchase graph: the top candidate pairs that are NOT yet
    * edges but share the most neighbors — the classic non-personalized
    * recommender signal. Wedges are expanded map-side from per-node
    * sorted neighbor sets; nodes with more than `centerCap` neighbors
    * generate no wedges (a hub center contributes O(d²) wedges while
    * saying little about any single pair — same philosophy as the
    * LSH band cap, and mirrored in the oracle), bounding the
    * expansion at cap² per node. Existing edges are removed with one
    * anti-join against the canonical edge set. */
  def linkPrediction(spark: SparkSession, dir: String, minSupport: Int = 2,
                     centerCap: Int = 100, k: Int = 20): DataFrame = {
    val und = coPurchaseEdges(spark, dir, minSupport).cache()
    val adj = und.unionByName(
      und.select(col("dst").as("src"), col("src").as("dst")))
    val sets = adj.groupBy(col("src"))
      .agg(sort_array(collect_set(col("dst"))).as("ns"))
      .filter(size(col("ns")).between(2, centerCap))
    val cn = sets.select(explode(expr(
        "flatten(transform(ns, (x, i) -> transform(slice(ns, i + 2, size(ns)), y -> struct(x AS pa, y AS pb))))"
      )).as("e"))
      .select(col("e.pa").as("pa"), col("e.pb").as("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("cn"))
    cn.join(und.select(col("src").as("pa"), col("dst").as("pb")),
        Seq("pa", "pb"), "left_anti")
      .orderBy(col("cn").desc, col("pa"), col("pb"))
      .limit(k)
  }

  /** Triangle count over the part co-purchase graph, using the
    * DEGREE-ORDERED orientation (Schank & Wagner / Cohen's MapReduce
    * formulation): every edge points from its (degree, id)-smaller
    * endpoint to the larger, so each triangle {x≺y≺z} is generated
    * exactly once as the wedge x→y, x→z closed by y→z — and the wedge
    * count is Σ outdeg² ≤ O(m^1.5) instead of Σ deg² (a single hub
    * node no longer explodes the join: its edges all point INTO it).
    * Returns the global count plus the wedge count (the audit number
    * that proves the orientation bounded the join). */
  def triangleCount(spark: SparkSession, dir: String,
                    minSupport: Int = 2): DataFrame = {
    // undirected edge set, canonically keyed src < dst (by id)
    val und = coPurchaseEdges(spark, dir, minSupport).cache()
    val deg = und.select(explode(array(col("src"), col("dst"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    // orient each edge from its (degree, id)-smaller endpoint
    val oriented = und
      .join(deg.select(col("id").as("src"), col("d").as("ds")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("d").as("dd")), Seq("dst"))
      .select(
        when(struct(col("ds"), col("src")) < struct(col("dd"), col("dst")),
          struct(col("src").as("u"), col("dst").as("v")))
          .otherwise(struct(col("dst").as("u"), col("src").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .cache()
    // every triangle has exactly ONE node with out-edges to the other
    // two, so each is generated by exactly one wedge; y < z keeps one
    // of the two symmetric join rows per out-neighbor pair
    val wedges = oriented.select(col("u").as("x"), col("v").as("y"))
      .join(oriented.select(col("u").as("x"), col("v").as("z")), Seq("x"))
      .filter(col("y") < col("z"))
      .select(col("y").as("src"), col("z").as("dst"))
    val closed = wedges.join(und, Seq("src", "dst"), "left_semi")
    // wedge count from out-degrees (Σ d·(d−1)/2) — the audit number
    // never materializes the wedge frame a second time
    val nWedges = oriented.groupBy(col("u")).agg(count(lit(1)).as("od"))
      .agg(sum(expr("od * (od - 1) div 2")).as("n_wedges"))
    closed.agg(count(lit(1)).as("n_triangles")).crossJoin(nWedges)
  }

  /** Community detection by `rounds` synchronous label-propagation
    * iterations over the part co-purchase graph: every node starts
    * labeled with its own id; each round it adopts the PLURALITY
    * label among its neighbors (ties → smallest label), making the
    * algorithm fully deterministic and oracle-unrollable (async LPA
    * is run-order-dependent — useless for a correctness gate).
    * Returns community sizes, largest first.
    *
    * Scale posture: a round is one edge-keyed join against the
    * node-sized label frame plus two aggregates ((node, label) vote
    * counts, then the per-node argmax via max_by) — no per-node
    * neighbor collection, no driver state; the fixed round count
    * bounds cluster synchronization like [[kCore]]. */
  def labelPropagation(spark: SparkSession, dir: String, rounds: Int = 2,
                       minSupport: Int = 2, k: Int = 30): DataFrame =
    labelPropagationLabels(
      coPurchaseEdges(spark, dir, minSupport).cache(), rounds)
      .groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("n_members").desc, col("community"))
      .limit(k)

  /** The label-propagation fixed rounds over an undirected edge set,
    * returning (id, label) per node — shared by [[labelPropagation]]
    * and [[modularity]]. */
  private def labelPropagationLabels(und: DataFrame, rounds: Int): DataFrame = {
    val adj = und.unionByName(
      und.select(col("dst").as("src"), col("src").as("dst"))).cache()
    var lbl = adj.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
    for (r <- 1 to rounds) {
      lbl = truncateLineage(
        adj.join(lbl.withColumnRenamed("id", "dst"), Seq("dst"))
          .groupBy(col("src"), col("label")).agg(count(lit(1)).as("c"))
          .groupBy(col("src"))
          .agg(max_by(col("label"), struct(col("c"), -col("label"))).as("label"))
          .select(col("src").as("id"), col("label")),
        r, rounds)
    }
    lbl
  }

  /** Newman MODULARITY of the label-propagation communities — the
    * "are these communities better than chance" audit that should
    * accompany any community detection: Q = Σ_c [e_c/m − (D_c/2m)²]
    * over intra-community edge counts e_c and member degree sums D_c.
    * Emitted SCALED by 4m² so everything stays integer-exact:
    * contrib_scaled = 4m·e_c − D_c², and Σ contrib_scaled = 4m²·Q —
    * no float division anywhere, hash-gateable, sign-safe (negative
    * contributions are legal and never divided). Scale shape: after
    * the propagation rounds, one degree aggregation, one two-sided
    * label join over the EDGE list (keyed equi-joins), and a
    * per-community readout. */
  def modularity(spark: SparkSession, dir: String, rounds: Int = 2,
                 minSupport: Int = 2): DataFrame = {
    val und = coPurchaseEdges(spark, dir, minSupport).cache()
    val lbl = labelPropagationLabels(und, rounds).cache()
    val m = und.agg(count(lit(1)).as("m"))
    val adj = und.unionByName(
      und.select(col("dst").as("src"), col("src").as("dst")))
    val deg = adj.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
    val eIn = und
      .join(lbl.select(col("id").as("src"), col("label").as("la")), Seq("src"))
      .join(lbl.select(col("id").as("dst"), col("label").as("lb")), Seq("dst"))
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("community")).agg(count(lit(1)).as("e_in"))
    val ds = lbl.join(deg, Seq("id"))
      .groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_members"), sum(col("d")).as("deg_sum"))
    ds.join(eIn, Seq("community"), "left")
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_members"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("deg_sum"),
        (lit(4L) * col("m") * coalesce(col("e_in"), lit(0L)) -
          col("deg_sum") * col("deg_sum")).as("contrib_scaled"))
      .orderBy(col("community"))
  }

  /** k-core decomposition by `rounds` peeling iterations over the part
    * co-purchase graph: each round drops every node whose degree in
    * the surviving subgraph is below `k`, then restricts the edges to
    * the survivors. With enough rounds this is the exact k-core
    * (dropping a node only ever lowers neighbors' degrees, so peeling
    * is confluent); a fixed round count makes the operator
    * oracle-unrollable and bounds the synchronization points on a
    * cluster — the standard distributed formulation. Returns the
    * surviving nodes with their in-core degree.
    *
    * Scale posture: each round is one degree aggregation plus two
    * semi-joins keyed on the edge endpoints, all on a monotonically
    * SHRINKING edge frame; nothing is ever collected. */
  def kCore(spark: SparkSession, dir: String, k: Int = 4,
            rounds: Int = 4, minSupport: Int = 2): DataFrame = {
    var edges = coPurchaseEdges(spark, dir, minSupport).cache()
    def degrees(e: DataFrame): DataFrame =
      e.select(explode(array(col("src"), col("dst"))).as("id"))
        .groupBy(col("id")).agg(count(lit(1)).as("d"))
    for (r <- 1 to rounds) {
      // the survivor set is node-sized → broadcast semi-joins keep
      // every round map-only over the edge frame (drop the hint for
      // graphs whose NODE set outgrows broadcast range); each round's
      // edge frame is materialized (cache+count) so round r never
      // re-executes rounds 1..r-1, and every CheckpointEvery rounds
      // it is ALSO lineage-truncated — cache alone keeps the full
      // nested plan (the classic iterative-DataFrame trap)
      val keep = degrees(edges).filter(col("d") >= k).select(col("id"))
      val joined = edges
        .join(broadcast(keep.withColumnRenamed("id", "src")), Seq("src"), "left_semi")
        .join(broadcast(keep.withColumnRenamed("id", "dst")), Seq("dst"), "left_semi")
      val next =
        if (r % CheckpointEvery == 0 && r < rounds) truncateNow(joined)
        else { val c = joined.cache(); c.count(); c }
      edges.unpersist()
      edges = next
    }
    degrees(edges)
      .select(col("id").as("p_partkey"), col("d").as("core_degree"))
      .orderBy(col("p_partkey"))
  }

  /** Bounded-hop BFS (single-source shortest paths, `maxHops` rounds)
    * over the co-supply graph from the seed suppliers
    * (s_suppkey % seedMod = 0). Classic iterative frontier relaxation:
    *   dist_{t+1}(n) = min(dist_t(n), min over edges src→n of dist_t(src)+1)
    * unrolled a fixed number of rounds (distances beyond `maxHops`
    * are unreported). Returns every reached supplier with its hop
    * distance.
    *
    * Scale posture: per round, one equi-join of the node-sized
    * distance frame against the edge frame (pre-partitioned by src so
    * the edges never re-shuffle) and one min-aggregate; the frontier
    * frame is node-sized, never edge-sized. */
  def bfsHops(spark: SparkSession, dir: String, maxHops: Int = 3,
              seedMod: Int = 10): DataFrame = {
    val edges = coSupplyEdges(spark, dir).repartition(col("src")).cache()
    val seeds = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey").as("id"))
      .filter(col("id") % seedMod === 0)
    // frontier BFS: only the nodes FIRST discovered last round expand
    // (unit edge weights ⇒ a distance never improves after first
    // discovery), so settled nodes' edges are never re-joined — on a
    // big graph each round touches O(frontier-adjacent) edge rows,
    // not O(reached). Each round's distance frame is cached but NOT
    // force-materialized: within the single final action the two
    // references per round (anti-join + union) compute once and
    // cache; blocking per-round counts measured ~20% slower at sf0.1
    // (3 extra job round-trips) for identical results. Every
    // CheckpointEvery rounds the distance frame is lineage-truncated
    // (one eager job) so plan depth stays bounded however many hops
    // run.
    var dist = seeds.select(col("id"), lit(0L).as("dist")).cache()
    var frontier = dist.select(col("id"))
    for (h <- 1 to maxHops) {
      val reached = edges
        .join(broadcast(frontier.withColumnRenamed("id", "src")), Seq("src"))
        .select(col("dst").as("id")).distinct()
      val fresh = reached.join(dist, Seq("id"), "left_anti")
        .select(col("id"), lit(h.toLong).as("dist"))
      // checkpoint rounds need no separate cache — the eager
      // localCheckpoint already materializes to executor storage
      val grown = dist.unionByName(fresh)
      dist = if (h % CheckpointEvery == 0 && h < maxHops) truncateNow(grown)
             else grown.cache()
      frontier = dist.filter(col("dist") === h).select(col("id"))
    }
    dist.select(col("id").as("s_suppkey"), col("dist"))
      .orderBy(col("s_suppkey"))
  }
}
