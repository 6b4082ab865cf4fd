package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** Planner strategy for [[TopKPerGroupNode]]: partial bounded-heap
  * top-k per input partition, then the declaratively-requested
  * clustered exchange, then the final merge top-k. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(groupCols, order, k, child) =>
      val partial = TopKPerGroupExec(groupCols, order, k, planLater(child), partial = true)
      TopKPerGroupExec(groupCols, order, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

/** Public API for the operator. */
object TopK {
  /** Top `k` rows per group, "top" = first when sorting `orderCol` in
    * the given direction. Output row order is unspecified (sort after
    * if needed) — the contract of window row_number + filter, in one
    * bounded O(n log k) pass instead of a full per-group sort. */
  def perGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
               k: Int, ascending: Boolean = true): DataFrame = {
    require(k > 0, s"top-k requires k > 0, got $k")
    val order = SortOrder(UnresolvedAttribute.quoted(orderCol),
      if (ascending) Ascending else Descending)
    Bridge.ofRows(df.sparkSession,
      TopKPerGroupNode(groupCols.map(UnresolvedAttribute.quoted), order, k,
        df.queryExecution.analyzed))
  }
}
