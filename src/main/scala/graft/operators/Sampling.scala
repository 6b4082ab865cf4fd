package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Stratified deterministic sampling — the data-mixture knob of a
  * training pipeline: each stratum (language, source, quality bucket)
  * keeps a different fraction of its documents. The keep decision is
  * md5-keyed on the row id (engine-portable, rerun-stable, and stable
  * under repartitioning — no rand(), no TABLESAMPLE), with the rate
  * expressed in sixteenths so a single hex digit decides membership:
  * keep iff value(first md5 hex digit) < rate16.
  *
  * Map-only until the per-stratum count aggregate — the ideal 100 TB
  * shape. */
object Sampling {

  /** First-md5-hex-digit value of `id`, 0..15. */
  def hexBucket16(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 1), 16, 10).cast("int")

  /** Keep-predicate: id hashes under the stratum's per-sixteenth rate.
    * `rates16` maps stratum value → sixteenths kept (0..16); strata
    * missing from the map keep everything. */
  def keep(id: Column, stratum: Column, rates16: Map[String, Int]): Column = {
    val rate = rates16.foldLeft(lit(16)) { case (acc, (k, r)) =>
      when(stratum === k, lit(r)).otherwise(acc)
    }
    hexBucket16(id) < rate
  }

  /** Per-language downsampling summary over `documents`: the English
    * bulk is halved, mid-resource languages quartered, French kept at
    * an eighth, Chinese kept whole — a typical mixture rebalance. */
  val DocRates16: Map[String, Int] =
    Map("en" -> 8, "de" -> 4, "es" -> 4, "fr" -> 2, "zh" -> 16)

  def stratifiedDocSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.loadSpread(spark, dir, "documents")
    d.select(col("lang"),
        keep(col("doc_id"), col("lang"), DocRates16).as("_keep"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        count(when(col("_keep"), 1)).as("n_sampled"))
      .orderBy(col("lang"))
  }
}
