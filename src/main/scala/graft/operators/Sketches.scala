package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Mergeable-sketch operators. The sketch math lives in native
  * Catalyst aggregates under graft.plans; these wrappers shape the
  * gated queries.
  */
object Sketches {

  /** Per-event-type distinct-user HLL sketch, emitted as the full
    * (event_type, bucket, register) matrix — the registers are
    * integer-exact and md5-derived, so the DuckDB oracle reproduces
    * every one nibble-by-nibble (the float estimate stays in
    * [[graft.plans.HllRegisters.estimate]] and its spec).
    *
    * Scale posture: the aggregate ships 256 bytes per (event_type ×
    * map partition) instead of shuffling every distinct (event_type,
    * user) pair the way COUNT(DISTINCT) must — and sketches of
    * disjoint slices merge associatively later (day × shard rollups
    * without re-reading either side). */
  def hllDistinctUsers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
      .select(col("event_type"), col("user_id").cast("string").as("u"))
    e.groupBy(col("event_type"))
      .agg(call_function("hll_registers", col("u")).as("regs"))
      .select(col("event_type"), posexplode(col("regs")).as(Seq("bucket", "register")))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** Count-Min top-talker readout: per event type, sketch every user
    * occurrence with the native [[graft.plans.CmsRegisters]] aggregate
    * (d=4 × w=256, md5-byte rows), then report the top `k` users by
    * TRUE frequency alongside their CMS point estimate (min over the
    * d counters — ≥ truth by construction, integer-exact and
    * oracle-reproducible).
    *
    * Scale posture: the sketch aggregation ships 8 KB per (event_type
    * × map partition) regardless of user cardinality; the truth side
    * exists here only because the gate must PROVE the estimates, and
    * at production scale the whole point is to skip it. The per-user
    * lookup joins the k×types winners against the one-row-per-type
    * sketch frame via broadcast. */
  def cmsTopTalkers(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.loadEvents(spark, dir)
      .select(col("event_type"), col("user_id").cast("string").as("u"))
    val sk = e.groupBy(col("event_type"))
      .agg(call_function("cms_registers", col("u")).as("regs"))
    val top = e.groupBy(col("event_type"), col("u"))
      .agg(count(lit(1)).as("true_n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("true_n").desc, col("u"))))
      .filter(col("rk") <= k)
    val h = md5(col("u"))
    val est = (0 until graft.plans.CmsRegisters.D).map { j =>
      element_at(col("regs"),
        conv(substring(h, j * 2 + 1, 2), 16, 10).cast("int")
          + lit(j * graft.plans.CmsRegisters.W + 1))
    }.reduce(least(_, _))
    top.join(broadcast(sk), Seq("event_type"))
      .select(col("event_type"), col("rk").cast("long").as("rk"),
        col("u").as("user_id"), col("true_n"), est.as("cms_n"))
      .orderBy(col("event_type"), col("rk"))
  }

  /** Distinct-user membership bitmaps per event type PLUS the merged
    * `_ALL` rollup — the [[graft.plans.BitmapRegisters]] linear-
    * counting sketch, emitted as the exact sorted set-bucket list so
    * the oracle reproduces every bit. The `_ALL` row is the OR-merge
    * demonstration: slice sketches union without re-reading anything
    * (day × shard rollups), which is the whole point of a mergeable
    * 512-byte state versus a distinct-pair shuffle. */
  def bitmapDistinctUsers(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
      .select(col("event_type"), col("user_id").cast("string").as("u"))
    val tagged = e.unionByName(
      e.select(lit("_ALL").as("event_type"), col("u")))
    tagged.groupBy(col("event_type"))
      .agg(call_function("bitmap_registers", col("u")).as("bs"))
      .select(col("event_type"), explode(col("bs")).as("bucket"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** Per-event-type KMV (bottom-k / theta) signatures, emitted as the
    * exact (rank, hash) rows — the [[graft.plans.KmvRegisters]] state
    * the oracle recomputes as the k smallest DISTINCT md5 values.
    * Signatures support the set algebra HLL cannot (union = pooled
    * min-k, intersection/Jaccard by membership in the pooled min-k —
    * see KmvRegisters.jaccard + its spec). */
  def kmvSignatures(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
      .select(col("event_type"), col("user_id").cast("string").as("u"))
    e.groupBy(col("event_type"))
      .agg(call_function("kmv_registers", col("u")).as("sig"))
      .select(col("event_type"), posexplode(col("sig")).as(Seq("pos", "hash")))
      .select(col("event_type"), (col("pos") + 1).cast("long").as("rank"), col("hash"))
      .orderBy(col("event_type"), col("rank"))
  }

  /** Join-size estimation from CMS inner products — the pre-flight
    * "will this join explode" a planner wants BEFORE shuffling
    * anything: for each event-type pair (a, b),
    * |a ⋈_user b| = Σ_u f_a(u)·f_b(u), and the CMS row inner product
    * Σ_bucket A_j[x]·B_j[x] upper-bounds it (collisions only ever
    * add); min over the d rows is the classic AMS/CMS estimate. The
    * gate emits the exact-integer estimate next to the true join size
    * — truth requires the real (user-keyed) shuffle the estimate
    * exists to avoid; at production scale only the 8 KB sketches are
    * read. */
  def cmsJoinCardinality(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
      .select(col("event_type"), col("user_id").cast("string").as("u"))
    val sk = e.groupBy(col("event_type"))
      .agg(call_function("cms_registers", col("u")).as("regs"))
    val pairs = sk.select(col("event_type").as("type_a"), col("regs").as("ra"))
      .join(sk.select(col("event_type").as("type_b"), col("regs").as("rb")),
        col("type_a") < col("type_b"))
    val d = graft.plans.CmsRegisters.D
    val w = graft.plans.CmsRegisters.W
    // row-j inner product over the flat register arrays
    val rowDot = (0 until d).map { j =>
      expr(s"""aggregate(sequence(${j * w + 1}, ${j * w + w}),
              |CAST(0 AS BIGINT), (acc, i) -> acc + ra[i - 1] * rb[i - 1])"""
        .stripMargin)
    }
    val est = rowDot.reduce(least(_, _))
    val truth = e.groupBy(col("event_type"), col("u"))
      .agg(count(lit(1)).as("c"))
    val trueJoin = truth.select(col("event_type").as("type_a"), col("u"), col("c").as("ca"))
      .join(truth.select(col("event_type").as("type_b"), col("u"), col("c").as("cb")),
        Seq("u"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(sum(col("ca") * col("cb")).as("true_size"))
    pairs.select(col("type_a"), col("type_b"), est.as("est_size"))
      .join(trueJoin, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"),
        coalesce(col("true_size"), lit(0L)).as("true_size"), col("est_size"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** KMV (theta) SET ALGEBRA between event-type pairs, end-to-end on
    * the signatures alone — the operation HLL registers cannot
    * express and the reason [[graft.plans.KmvRegisters]] exists:
    *
    *  - union sketch = the pooled min-K of the two signatures
    *    (`k_union` entries; `theta_hash` is its K-th smallest — the
    *    threshold every KMV estimate divides by);
    *  - intersection = pooled-min-K members present in BOTH
    *    signatures (`n_inter`);
    *  - `jaccard_bp` = n_inter · 10⁴ div k_union, the
    *    [[graft.plans.KmvRegisters.jaccard]] estimator in exact basis
    *    points.
    *
    * Everything emitted is integer- or string-exact (counts, the
    * pooled K-th hash, floor-div basis points), so the DuckDB oracle
    * reproduces the full algebra from the same md5 bottom-k
    * definition — this gate makes the set algebra itself
    * oracle-checked, not just spec-checked.
    *
    * Scale posture: after the one sketch aggregation (bounded ~2 KB
    * state per type per partition), the algebra runs on S×S signature
    * ROWS — array expressions over ≤ K-element arrays, no second look
    * at the events table. That is the production shape: overlap
    * matrices across sources/days from stored sketches, zero event
    * re-reads. */
  def kmvSetAlgebra(spark: SparkSession, dir: String): DataFrame = {
    val k = graft.plans.KmvRegisters.K
    val e = Tables.loadEvents(spark, dir)
      .select(col("event_type"), col("user_id").cast("string").as("u"))
    val sk = e.groupBy(col("event_type"))
      .agg(call_function("kmv_registers", col("u")).as("sig"))
    sk.select(col("event_type").as("type_a"), col("sig").as("sa"))
      .join(sk.select(col("event_type").as("type_b"), col("sig").as("sb")),
        col("type_a") < col("type_b"))
      .withColumn("pk",
        expr(s"slice(array_sort(array_distinct(concat(sa, sb))), 1, $k)"))
      .withColumn("n_inter", expr(
        "CAST(size(filter(pk, h -> array_contains(sa, h) AND array_contains(sb, h))) AS BIGINT)"))
      .select(col("type_a"), col("type_b"),
        size(col("sa")).cast("long").as("n_a"),
        size(col("sb")).cast("long").as("n_b"),
        size(col("pk")).cast("long").as("k_union"),
        col("n_inter"),
        element_at(col("pk"), -1).as("theta_hash"),
        expr("CAST(n_inter * 10000 div size(pk) AS BIGINT)").as("jaccard_bp"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Log-linear quantile HISTOGRAM (the DDSketch / HDR-histogram
    * family) with a bounded-relative-error readout, audited against
    * the exact rank walk:
    *
    * Every positive value lands in the bucket keyed by its bit length
    * and its leading 5 bits — (blen, v >> (blen−5)) — so there are at
    * most 16 log-linear buckets per octave and any value in a bucket
    * is within 2⁻⁴ (≈ 6.25%) of the bucket's upper bound. Bucket
    * counts are plain integers: the sketch state is ADDITIVE
    * (mergeable across partitions, days, shards by summing counts),
    * bounded (≲ 16·64 buckets covers the whole Long range), and the
    * readout for quantile q is the upper bound of the first bucket
    * whose cumulative count reaches rank ⌈q·n⌉ — a guaranteed
    * OVER-estimate within the relative error bound.
    *
    * The gate emits est next to the exact type-1 quantile (smallest v
    * with cumulative count ≥ rank — the same compressed-bin rank walk
    * as q162, never a global row sort) and the signed error in basis
    * points, all integer-exact.
    *
    * Scale posture: two shuffles on compressed keys (bucket counts ≈
    * hundreds of rows per group; exact side compresses to distinct
    * values first); the at-scale path stores ONLY the bucket counts —
    * the exact side exists because the gate must prove the error
    * bound. */
  def logQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qs = Seq(50, 90, 99)
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderstatus").as("status"),
        floor(col("o_totalprice")).cast("long").as("v"))
      .filter(col("v") >= 1)
    // log-linear bucket: key (blen, p), upper bound from the key alone
    val bk = o.withColumn("blen", length(bin(col("v"))).cast("int"))
      .withColumn("p", expr("CASE WHEN blen >= 5 THEN shiftright(v, blen - 5) ELSE v END"))
    val buckets = bk.groupBy(col("status"), col("blen"), col("p"))
      .agg(count(lit(1)).as("c"))
      .withColumn("upper", expr(
        "CASE WHEN blen >= 5 THEN shiftleft(p + 1, blen - 5) - 1 ELSE p END"))
    val tot = o.groupBy(col("status")).agg(count(lit(1)).as("n"))
    val ranks = tot
      .withColumn("q", explode(array(qs.map(q => lit(q.toLong)): _*)))
      .withColumn("rank", expr("(q * n + 99) div 100")) // ⌈q·n/100⌉, all-integer
    val wb = Window.partitionBy(col("status")).orderBy(col("blen"), col("p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val est = buckets.withColumn("cum", sum(col("c")).over(wb))
      .join(ranks, Seq("status"))
      .filter(col("cum") >= col("rank"))
      .groupBy(col("status"), col("q"), col("n"))
      .agg(min(col("upper")).as("est_v"))
    val wv = Window.partitionBy(col("status")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exact = o.groupBy(col("status"), col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wv))
      .join(ranks, Seq("status"))
      .filter(col("cum") >= col("rank"))
      .groupBy(col("status"), col("q"))
      .agg(min(col("v")).as("true_v"))
    est.join(exact, Seq("status", "q"))
      .select(col("status"), col("q"), col("n"), col("true_v"), col("est_v"),
        expr("CAST((est_v - true_v) * 10000 div true_v AS BIGINT)").as("err_bp"))
      .orderBy(col("status"), col("q"))
  }

  /** Join-order advisor — the optimizer's cost-model step as a gated
    * query: for the star chain customer ⋈ orders ⋈ lineitem, estimate
    * each edge's join cardinality from two 8 KB CMS sketches (the
    * q188 AMS inner-product upper bound — Σ f_a·f_b without touching
    * either table again), put the TRUE size next to it, and mark the
    * edge a cost-based optimizer would start with (minimum estimate).
    * At 100 TB this decision is made from stored per-column sketches
    * in O(sketch) — the tables are never re-read to plan them; the
    * truth column exists because the gate must audit the estimates. */
  def joinOrderAdvisor(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.plans.CmsRegisters.D
    val w = graft.plans.CmsRegisters.W
    val rowDot = (0 until d).map { j =>
      expr(s"""aggregate(sequence(${j * w + 1}, ${j * w + w}),
              |CAST(0 AS BIGINT), (acc, i) -> acc + ra[i - 1] * rb[i - 1])"""
        .stripMargin)
    }
    def edge(label: String, a: DataFrame, ak: String,
             b: DataFrame, bk: String): DataFrame = {
      val ra = a.agg(call_function("cms_registers",
        col(ak).cast("string")).as("ra"))
      val rb = b.agg(call_function("cms_registers",
        col(bk).cast("string")).as("rb"))
      val est = ra.crossJoin(broadcast(rb))
        .select(rowDot.reduce(least(_, _)).as("est_size"))
      val ca = a.groupBy(col(ak).as("kk")).agg(count(lit(1)).as("ca"))
      val cb = b.groupBy(col(bk).as("kk")).agg(count(lit(1)).as("cb"))
      val tru = ca.join(cb, Seq("kk"))
        .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("true_size"))
      est.crossJoin(broadcast(tru))
        .select(lit(label).as("join_edge"), col("est_size"), col("true_size"))
    }
    val edges = edge("customer-orders",
        Tables.load(spark, dir, "customer"), "c_custkey",
        Tables.load(spark, dir, "orders"), "o_custkey")
      .unionByName(edge("orders-lineitem",
        Tables.load(spark, dir, "orders"), "o_orderkey",
        Tables.load(spark, dir, "lineitem"), "l_orderkey"))
    val m = edges.agg(min(col("est_size")).as("me"))
    edges.crossJoin(broadcast(m))
      .select(col("join_edge"), col("est_size"), col("true_size"),
        (col("est_size") === col("me")).cast("int").as("chosen"))
      .orderBy(col("join_edge"))
  }

  /** The [[graft.plans.BitmapRegisters]] bucket of a key rendered as a
    * column expression: first 12 bits of md5 = hex chars 1..3 — the
    * exact convention BitmapRegisters.update hashes with, so a column
    * probe and the aggregate can never disagree on a bucket. */
  private[graft] def bitmapBucket(key: org.apache.spark.sql.Column) =
    conv(substring(md5(key), 1, 3), 16, 10).cast("int")

  /** Sketch-driven runtime join pruning — the explicit form of the
    * Bloom-filter join (Spark's `runtimeFilter`, Delta's dynamic file
    * pruning) built on the engine's own native membership bitmap: the
    * selective build side (filtered orders) aggregates its join keys
    * into one 4096-bucket bitmap (512 B total, NOT a key list), the
    * set buckets broadcast, and the probe side (lineitem — the 100 TB
    * fact) drops every row whose key-bucket is unset BEFORE the
    * shuffle join. The bitmap has no false negatives (probe and build
    * bucket through the identical md5 expression), so the pruned join
    * is EXACTLY the plain join — which is what the oracle runs; false
    * positives only cost carrying a few extra rows into the exact
    * join, never wrong output.
    *
    * Scale shape: at 1000 executors the alternative is shuffling the
    * full fact table on the join key; here the fact scan's survivors
    * are ~|build keys|/4096 of the buckets, the filter is a broadcast
    * semi-join on a ≤4096-row frame inside the scan stage, and only
    * survivors reach the exchange. */
  def sketchPrunedJoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F" &&
        pmod(col("o_orderkey"), lit(97L)) === 0L)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val buckets = ord
      .agg(call_function("bitmap_registers",
        col("o_orderkey").cast("string")).as("bm"))
      .select(explode(col("bm")).as("bucket"))
    val pruned = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
      .withColumn("bucket", bitmapBucket(col("l_orderkey").cast("string")))
      .join(broadcast(buckets), Seq("bucket"), "left_semi")
    pruned.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }
}
