package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** One-off measurement for the q264 scoring fan-out at a crawl-like
  * LABEL-SET width: the gated fixture has 4 language classes, but the
  * scoring stage fans (doc, bucket) rows × |classes|, so a ~100-language
  * crawl multiplies the partial-aggregate input ~25×. This harness
  * remaps `lang` to nLangs synthetic classes (round-robin by doc_id)
  * over the real corpus and times the FULL classifier — same
  * count()-then-clearCache protocol as [[graft.Bench]].
  *
  * Usage: runMain graft.tools.LangIdWide <sfDir> <nLangs> <reps>
  */
object LangIdWide {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nLangs = if (args.length > 1) args(1).toInt else 30
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.get()
    val docs = graft.sources.Tables.loadSpread(spark, sfDir, "documents")
      .withColumn("lang",
        concat(lit("l"), lpad(pmod(col("doc_id"), lit(nLangs)).cast("string"), 3, "0")))
    def run(): Long = graft.operators.TextAnalysis.langIdNgramOf(docs).count()
    run(); spark.catalog.clearCache() // warmup
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      run()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      sec
    }
    println(s"[langid_wide] sf=$sfDir n_langs=$nLangs reps=$reps sec=" +
      times.map(t => f"$t%.2f").mkString(","))
    spark.stop()
  }
}
