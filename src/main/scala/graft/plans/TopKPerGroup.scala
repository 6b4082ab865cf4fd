package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator extension demo (SURVEY preference (c)): group-wise
  * top-k as a first-class operator — logical node, planner strategy,
  * and physical operator registered through SparkSessionExtensions.
  *
  * Spark expresses "top k rows per group" as window row_number +
  * filter: a full sort of every group (O(n log n) per group, full
  * materialization) just to discard all but k rows. This operator
  * keeps a bounded k-heap per group (O(n log k), O(groups·k) memory):
  * partial top-k per input partition, shuffle only the survivors
  * (≤ partitions·groups·k rows) clustered by group, final top-k merge.
  * The shuffle is requested declaratively via
  * requiredChildDistribution, so Catalyst/AQE still plan it.
  */
case class TopKPerGroupNode(groupCols: Seq[Expression], order: SortOrder,
                            k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerGroupExec(groupCols: Seq[Expression], order: SortOrder,
                            k: Int, child: SparkPlan, partial: Boolean)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else Seq(ClusteredDistribution(groupCols))

  override protected def doExecute(): RDD[InternalRow] = {
    // serializable, codegen-on-first-use ordering for the closure
    val ordering = new org.apache.spark.sql.catalyst.expressions.codegen
      .LazilyGeneratedOrdering(Seq(order), child.output)
    val childOutput = child.output
    val groupExprs = groupCols
    val kk = k
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(groupExprs, childOutput)
      // identity projection: children outside whole-stage codegen may
      // emit generic InternalRows, which can't be copied into the heap
      // as UnsafeRow — normalize (no-op cost for already-unsafe rows)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      // per-group bounded heap; head = max in sort order = the WORST
      // of the kept k (tops are the ordering's smallest), so eviction
      // compares against and removes the head
      val heaps = scala.collection.mutable.HashMap.empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      val heapOrd: Ordering[UnsafeRow] = ordering.on[UnsafeRow](identity)
      iter.foreach { row =>
        val key = groupProj(row).copy()
        val heap = heaps.getOrElseUpdate(key,
          scala.collection.mutable.PriorityQueue.empty[UnsafeRow](heapOrd))
        def unsafeCopy(): UnsafeRow = row match {
          case u: UnsafeRow => u.copy()
          case r => toUnsafe(r).copy()
        }
        if (heap.size < kk) heap.enqueue(unsafeCopy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(unsafeCopy())
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
