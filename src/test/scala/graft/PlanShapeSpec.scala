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
}
