package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical plan-shape guards for the round-9 second-half operators —
  * the properties that make them scale, asserted so a refactor cannot
  * silently regress them. */
class Round9PlanShapeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p: SparkPlan => p.toString
    }
  }

  test("q235: the bitmap prune is a broadcast semi-join on the probe side, never a shuffle") {
    val plan = finalPlan(graft.operators.Sketches.sketchPrunedJoin(spark, sf))
    // the bucket filter reaches lineitem as LeftSemi against a
    // broadcast (≤4096-row) frame — inside the scan stage
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q231/q247/q252: decode-transform operators are map-only after the spread") {
    // exactly ONE exchange: the documented round-robin spread of the
    // tiny id column; decode/resize/augment never shuffle payloads
    for (df <- Seq(graft.operators.Multimodal.imageResize(spark, sf),
      graft.operators.Multimodal.audioResample(spark, sf),
      graft.operators.Multimodal.imageAugment(spark, sf))) {
      val plan = finalPlan(df)
      val exchanges = "Exchange".r.findAllIn(plan).size
      // spread (round-robin) + the final orderBy's range partitioning
      assert(exchanges <= 2, s"expected <= 2 exchanges, got $exchanges:\n$plan")
      assert(!plan.contains("SortMergeJoin"), plan)
    }
  }

  test("q250: the bucketed strategy's window is partitioned by length bucket, never global") {
    val plan = finalPlan(graft.operators.Packing.batchPaddingAudit(spark, sf))
    assert(plan.contains("windowspecdefinition(lb"), plan)
  }

  test("q233: centroids broadcast to the assignment; no corpus-sized sort-merge join") {
    val plan = finalPlan(graft.operators.Vectors.clusterBalancedSample(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q236: novelty is one shingle-keyed aggregate + join-back — no pair join anywhere") {
    val df = graft.operators.TextAnalysis.noveltyScore(spark, sf)
    val plan = finalPlan(df)
    // exactly the owners equi-join on the shingle; nothing quadratic
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
