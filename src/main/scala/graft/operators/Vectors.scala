package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over the `embeddings` table (Array[Float]
  * column): brute-force cosine top-k as the exact baseline, an
  * IVF-style probed variant as the scale path, and threshold near-dup
  * pairs.
  *
  * Numeric portability: every dot product is computed in double
  * (floats cast up before multiply) and cosines are rounded to 4
  * decimals with a post-rounding id tie-break, so rankings are
  * deterministic and identical to the DuckDB oracle's
  * `list_dot_product(CAST(... AS DOUBLE[]), ...)`.
  *
  * Scale posture: query/centroid sides are tiny and broadcast — the
  * corpus side never shuffles for top-k. IVF bounds the scanned
  * fraction to nprobe/K of the corpus; at 100 TB the assignment map
  * is a bucketed table and each probe is a partition-pruned scan.
  */
object Vectors {
  val NumQueries = 10
  val TopK = 5
  val IvfCentroids = 16
  val IvfProbes = 4
  val NearDupThreshold = 0.45

  /** double-precision dot product of two float vectors (sequential
    * left fold — same order as the oracle's list_dot_product). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")

  /** Brute-force cosine top-k for the first NumQueries vectors as
    * queries (broadcast) against the full corpus. */
  def annBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val queries = broadcast(
      e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")))
    val scored = e.crossJoin(queries)
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(cosine(col("qv"), col("embedding")), 4).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .orderBy(col("qid"), col("rk"))
  }

  /** IVF assignment: nearest of the first IvfCentroids vectors
    * (deterministic pseudo-centroids), per corpus vector. */
  def ivfAssignment(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val cents = broadcast(
      e.filter(col("vec_id") < IvfCentroids)
        .select(col("vec_id").as("cid"), col("embedding").as("cv")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    e.crossJoin(cents)
      .select(col("vec_id"), col("embedding"), col("cid"),
        round(cosine(col("cv"), col("embedding")), 4).as("ccos"))
      .withColumn("crk", row_number().over(w))
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
  }

  /** IVF-probed ANN: each query searches only the IvfProbes centroid
    * lists nearest to it — the bounded-scan approximation of
    * annBruteForce. */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val assigned = ivfAssignment(spark, dir)
    val cents = broadcast(
      e.filter(col("vec_id") < IvfCentroids)
        .select(col("vec_id").as("cid"), col("embedding").as("cv")))
    val queries = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val probeW = Window.partitionBy(col("qid")).orderBy(col("pcos").desc, col("cid"))
    val probes = queries.crossJoin(cents)
      .select(col("qid"), col("qv"), col("cid"),
        round(cosine(col("cv"), col("qv")), 4).as("pcos"))
      .withColumn("prk", row_number().over(probeW))
      .filter(col("prk") <= IvfProbes)
      .select(col("qid"), col("qv"), col("cid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    broadcast(probes).join(assigned, Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(cosine(col("qv"), col("embedding")), 4).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TopK)
      .orderBy(col("qid"), col("rk"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold. Exact
    * all-pairs at test scale; the LSH/IVF bucketing above is the
    * pruning path at corpus scale. */
  def nearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val l = e.select(col("vec_id").as("da"), col("embedding").as("va"))
    val r = e.select(col("vec_id").as("db"), col("embedding").as("vb"))
    l.crossJoin(broadcast(r))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"), round(cosine(col("va"), col("vb")), 4).as("cos"))
      .filter(col("cos") >= NearDupThreshold)
      .orderBy(col("da"), col("db"))
  }
}
