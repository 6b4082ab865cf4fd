package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan auditor: prints the formatted physical plan of selected
  * queries so scan pruning (ReadSchema), predicate pushdown
  * (PushedFilters), join strategies (BroadcastHashJoin vs
  * SortMergeJoin) and WholeStageCodegen spans can be inspected.
  *
  * Usage: runMain graft.tools.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.get()
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      // a previous query's cache would otherwise surface as an
      // InMemoryRelation inside THIS query's plan — each dump must
      // show the standalone shape (same contract as Bench/Verify)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
