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

  /** Queries whose condition-less joins are the DOCUMENTED by-design
    * exception, not a regression — each with the reason the shape is
    * legitimate. Everything else in the registry must lint clean, so
    * a future round adding a stray cross-join or ScalaUDF fails HERE. */
  private val cartesianWhitelist: Map[String, String] = Map(
    "q144_drift_days" ->
      ("day-grid × type-mix zero-materializing cross: both sides are dimension-sized " +
        "(days, event types) by design — the grid IS the operator (Behavioral.driftDays)"))

  test("EVERY registered query lints clean of unbounded cross-joins and Scala UDFs") {
    val sf = "/root/testdata/sf0.001"
    // bounded fan-out crosses (k-means centroid tables, ≤64-row
    // constant frames) are the engine's documented idiom — the bound
    // here is the largest such table any operator builds
    val SmallSide = 64L
    val failures = Seq.newBuilder[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val found = PlanLint.lint(fn(spark, sf), SmallSide)
          .filter(f => f.rule == "cartesian-join" || f.rule == "scala-udf")
        if (found.nonEmpty && !cartesianWhitelist.contains(name))
          failures += s"$name: ${found.mkString("; ")}"
      } finally spark.catalog.clearCache()
    }
    val out = failures.result()
    assert(out.isEmpty, s"\n${out.mkString("\n")}")
  }

  test("the whitelist names only queries that actually need it") {
    val sf = "/root/testdata/sf0.001"
    for ((name, why) <- cartesianWhitelist) {
      val found = PlanLint.lint(SparkEntry.queries(name)(spark, sf), 64L)
        .filter(_.rule == "cartesian-join")
      spark.catalog.clearCache()
      assert(found.nonEmpty, s"$name is whitelisted ('$why') but lints clean — remove it")
    }
  }
}
