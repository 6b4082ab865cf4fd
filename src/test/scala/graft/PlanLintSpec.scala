package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.PlanLint

/** The plan linter must catch each anti-pattern it names and stay
  * silent on the engine's own (policed) query shapes. */
class PlanLintSpec extends SparkSpec {
  import spark.implicits._

  private def rules(df: org.apache.spark.sql.DataFrame): Set[String] =
    PlanLint.lint(df).map(_.rule).toSet

  test("condition-less join of two multi-row frames is flagged; scalar cross is not") {
    val a = spark.range(100).toDF("x")
    val b = spark.range(100).toDF("y")
    assert(rules(a.crossJoin(b)).contains("cartesian-join"))
    // the engine's own idiom: cross with a one-row global aggregate
    val tot = b.agg(sum(col("y")).as("t"))
    assert(!rules(a.crossJoin(tot)).contains("cartesian-join"))
  }

  test("unpartitioned window is flagged; per-key window is not") {
    val df = spark.range(100).toDF("x").withColumn("k", col("x") % 10)
    val global = df.withColumn("rk", row_number().over(Window.orderBy(col("x"))))
    assert(rules(global).contains("unpartitioned-window"))
    val keyed = df.withColumn("rk",
      row_number().over(Window.partitionBy(col("k")).orderBy(col("x"))))
    assert(!rules(keyed).contains("unpartitioned-window"))
  }

  test("a Scala UDF in the plan is flagged") {
    val f = udf((x: Long) => x * 2)
    val df = spark.range(10).toDF("x").select(f(col("x")).as("y"))
    assert(rules(df).contains("scala-udf"))
  }

  test("root-level orderBy is allowed; orderBy feeding limit is allowed") {
    val df = spark.range(100).toDF("x")
    assert(!rules(df.orderBy(col("x"))).contains("non-root-global-sort"))
    assert(!rules(df.orderBy(col("x")).limit(5)).contains("non-root-global-sort"))
  }

  test("the engine's own gated queries lint clean of joins-without-conditions and UDFs") {
    val sf = "/root/testdata/sf0.001"
    for (name <- Seq("q01_agg_pricing", "q14_dedup_exact", "q65_tfidf")) {
      val found = PlanLint.lint(SparkEntry.queries(name)(spark, sf))
        .filter(f => f.rule == "cartesian-join" || f.rule == "scala-udf")
      assert(found.isEmpty, s"$name: $found")
    }
  }
}
