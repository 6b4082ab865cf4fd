package graft

import org.apache.spark.sql.functions._

/** Native cosine_sim expression: correctness vs the composed
  * higher-order form, null/zero handling, SQL availability via
  * GraftExtensions, and codegen participation. */
class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Array(1.0, 0.0, 2.0), Array(2.0, 1.0, 4.0)),
    (Array(1.0, 1.0), Array(-1.0, 1.0)),
    (Array(0.0, 0.0), Array(1.0, 1.0))) // zero norm → NULL
    .toDF("a", "b")

  test("matches the composed aggregate/zip_with form") {
    val rows = df.limit(2).select(
      call_function("cosine_sim", col("a"), col("b")).as("native"),
      (graft.operators.Vectors.dot(col("a"), col("b")) /
        (graft.operators.Vectors.l2norm(col("a")) * graft.operators.Vectors.l2norm(col("b")))).as("composed"))
      .collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("zero-norm input yields NULL; orthogonal yields 0") {
    val out = df.select(call_function("cosine_sim", col("a"), col("b"))).collect()
    assert(math.abs(out(0).getDouble(0) - 10.0 / math.sqrt(5.0 * 21.0)) < 1e-12)
    assert(out(1).getDouble(0) === 0.0)
    assert(out(2).isNullAt(0))
  }

  test("available in SQL through the session extension") {
    df.createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT cosine_sim(a, b) FROM vecs WHERE size(a) = 2").collect()
    assert(r.length === 2)
  }

  test("participates in whole-stage codegen (no fallback)") {
    // repartition so the projection runs distributed (a LocalTableScan
    // would be evaluated without codegen); collect first so AQE
    // finalizes the physical plan
    val q = df.repartition(2).select(call_function("cosine_sim", col("a"), col("b")))
    q.collect()
    // the "*(n)" prefix marks a WholeStageCodegen stage in plan strings
    val plan = q.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[cosine_sim""".r.findFirstIn(plan).isDefined, plan)
  }
}
