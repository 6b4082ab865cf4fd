package graft.tools

import graft.{GraftSession, SparkEntry}

/** Per-query timing harness for local iteration: runs the named
  * queries (default: all) `reps` times each after one warmup pass,
  * printing per-rep seconds — the same count()-then-clearCache
  * protocol as [[graft.Bench]] so numbers are comparable.
  *
  * Usage: runMain graft.tools.Time <sfDir> <reps> [queryName ...]
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.get()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count(); spark.catalog.clearCache() // warmup
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        sec
      }
      println(f"[time] $n%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
