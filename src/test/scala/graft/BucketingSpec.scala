package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Bucketed co-located join: same result as the plain join, with no
  * shuffle Exchange on either side of the SortMergeJoin. */
class BucketingSpec extends SparkSpec {

  test("bucketed join is shuffle-free and result-identical") {
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))

    Bucketing.writeBucketed(li, "li_b", "l_orderkey", buckets = 8)
    Bucketing.writeBucketed(o, "o_b", "l_orderkey", buckets = 8)

    // disable auto-broadcast so the planner exercises the bucketed
    // SortMergeJoin path (the large-to-large case bucketing exists for)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "li_b", "o_b", "l_orderkey")
      assert(joined.count() === li.join(o, Seq("l_orderkey")).count())

      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
