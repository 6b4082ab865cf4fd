package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Regression guards on physical plan shape — the properties that make
  * these queries scale: predicate pushdown into the parquet scan,
  * column pruning, and broadcast joins for small dims. */
class PlanShapeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p: SparkPlan => p.toString
    }
  }

  test("q02: filters pushed to the parquet scan, columns pruned") {
    val df = graft.operators.Relational.cleanseProject(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters:"), scan)
    assert(scan.contains("EqualTo(o_orderstatus,F)"), scan)
    // 5 of 6 columns read (o_custkey pruned)
    assert(!scan.contains("o_custkey"), scan)
  }

  test("q03: small dims join as broadcast hash joins (no shuffle join)") {
    val plan = finalPlan(graft.operators.Relational.leftJoinDims(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q05: dim distinct aggregated before a broadcast fan-out join") {
    val plan = finalPlan(graft.operators.Relational.fanoutJoin(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("q42: salted aggregation is two keyed aggregate phases, no single-key hotspot") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
    val df = graft.operators.Skew.saltedSumCount(li, col("l_returnflag"),
      col("l_quantity").cast(DecimalType(18, 2)), col("l_orderkey"), buckets = 32)
    val plan = finalPlan(df)
    // phase 1 shuffles on (k, salt), phase 2 on k — the hot key is
    // spread over `buckets` reducers before the final tiny aggregate
    assert(plan.contains("hashpartitioning(k"), plan)
    assert(plan.contains("salt"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan) // partial+final × 2 phases
  }

  test("q44: packing windows are per-bucket; only the tiny offsets window is global") {
    val df = graft.operators.Packing.packDocuments(spark, sf)
    val plan = finalPlan(df)
    // corpus-sized running sum must be partitioned by _bucket
    assert(plan.contains("windowspecdefinition(_bucket"), plan)
    // the broadcast join ships only the per-bucket offsets
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("q24: LSH near-dup plan has no driver-side collect operators") {
    val df = graft.operators.Vectors.lshNearDupPairs(spark, sf,
      graft.operators.Vectors.NearDupPlanes, graft.operators.Vectors.NearDupBands,
      graft.operators.Vectors.NearDupThreshold)
    val plan = finalPlan(df)
    // candidate generation is a join on the band key + aggregate dedup;
    // verification joins the vectors back by id — all distributed
    assert(plan.contains("HashAggregate") || plan.contains("Aggregate"), plan)
    assert(!plan.contains("CollectLimit"), plan)
  }

  test("q63: weighted sampling is map-only into a global TakeOrdered (no full sort)") {
    val plan = finalPlan(graft.operators.Sampling.weightedDocSample(spark, sf))
    // top-k via TakeOrderedAndProject — never a total Sort + Exchange
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q64: chunking is a single Generate over the scan — zero shuffles") {
    val plan = finalPlan(graft.operators.TextAnalysis.chunkDocuments(spark, sf))
    assert(plan.contains("Generate"), plan)
    // the only exchanges allowed are the loadSpread round-robin and the
    // final presentation sort — no hash (aggregation/join) shuffle
    assert(!plan.contains("hashpartitioning"), plan)
  }

  test("q69: bloom probe joins the corpus against a BROADCAST bit set") {
    val plan = finalPlan(graft.operators.Dedup.bloomContamination(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q70: capped LSH anti-joins hot buckets via broadcast") {
    // static plan: at sf0.001 the hot set is EMPTY and AQE's
    // empty-relation propagation correctly elides the anti-join from
    // the executed plan — the shape under test is the declared one
    val df = graft.operators.Dedup.minhashLshCapped(spark, sf)
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }

  test("q117: pagerank iterations broadcast the node-sized contribution frame") {
    val plan = finalPlan(graft.operators.Affinity.pageRankCoSupply(spark, sf))
    // 3 iterations → 3 broadcast joins of `per` against the cached
    // edge frame; the edge frame itself is never broadcast (it is the
    // corpus-sized side)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // top-k arrives via TakeOrdered, never a global Sort+collect
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q122: skyline phase-1 windows are hash-partitioned, not single-partition") {
    val df = graft.operators.Skyline.customerFrontier(spark, sf)
    val plan = df.queryExecution.sparkPlan.toString
    // the phase-1 kernel must window inside hash partitions (partial
    // frontiers, spec `windowspecdefinition(p#…)`); only the phase-2
    // pass over the small survivor set runs an unpartitioned window
    assert(plan.contains("windowspecdefinition(p#"), plan)
    assert(plan.contains("windowspecdefinition(v1#"), plan)
  }

  test("q131/q132: iterative graph rounds broadcast the node-sized frame, never the edges") {
    // k-core: every peel round's survivor semi-joins are broadcast
    val kc = finalPlan(graft.operators.Affinity.kCore(spark, sf))
    assert(kc.contains("BroadcastHashJoin"), kc)
    // bfs: the frontier joins edges via broadcast; min-dist is an agg,
    // not a window (no global sort anywhere in the loop)
    val bfs = finalPlan(graft.operators.Affinity.bfsHops(spark, sf))
    assert(bfs.contains("BroadcastHashJoin"), bfs)
  }

  test("q171/q173/q187/q190: native sketch aggregates get map-side PARTIAL aggregation") {
    // the sketches' whole scale claim is "fixed bytes per key per map
    // partition, merged shuffle-side" — which requires Spark to plan
    // them as partial ObjectHashAggregate + final merge, not a
    // single-stage aggregation shuffling raw rows. Pin that shape.
    for (fn <- Seq("hll_registers", "cms_registers",
                   "bitmap_registers", "kmv_registers")) {
      val df = graft.sources.Tables.loadEvents(spark, sf)
        .select(org.apache.spark.sql.functions.col("event_type"),
          org.apache.spark.sql.functions.col("user_id").cast("string").as("u"))
        .groupBy("event_type")
        .agg(org.apache.spark.sql.functions.call_function(fn,
          org.apache.spark.sql.functions.col("u")))
      val plan = finalPlan(df)
      assert(plan.contains("ObjectHashAggregate"), s"$fn:\n$plan")
      assert(plan.contains(s"partial_$fn"), s"$fn missing partial stage:\n$plan")
    }
  }

  test("q196: the LM model and context tables join as broadcasts (bounded model state)") {
    val plan = finalPlan(graft.operators.LanguageModel.bitsPerToken(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the corpus side must never shuffle-join against the model
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q198: the prefix-filtered set-sim join plans with zero cartesian products") {
    val plan = finalPlan(graft.operators.SetSimJoin.prefixJoin(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q197: both DSIR distribution tables broadcast (256-row bounded state)") {
    val plan = finalPlan(graft.operators.LanguageModel.dsirWeights(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q201: winnowing windows are partitioned per doc — no global window warning shape") {
    val df = graft.operators.Winnowing.fingerprints(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    // every Window operator must carry the doc_id partition spec
    optimized.linesIterator.filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(l.contains("doc_id"), s"unpartitioned window in:\n$l")
    }
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
