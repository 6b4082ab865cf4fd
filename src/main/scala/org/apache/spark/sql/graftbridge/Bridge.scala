package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, Dataset => CDataset, ExpressionUtils, SparkSession => CSession}

/** Minimal bridge into `private[sql]` surface: constructing a
  * DataFrame from a custom LogicalPlan (the documented pattern for
  * libraries adding whole operators) and the Column <-> Expression
  * adapters Spark 4 moved behind `classic.ExpressionUtils` (needed to
  * register composed Column trees as SQL functions; lives inside the
  * sql package tree solely for access, contains no Spark-derived
  * logic). */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSession], plan)

  /** EAGER Column -> Expression: the lazy `ExpressionUtils.expression`
    * wrapper (`ColumnNodeExpression`) only converts during analysis,
    * so an Expression returned from a function-registry builder (which
    * runs DURING analysis) would stay an Unevaluable wrapper forever.
    * The converter yields a real tree (possibly with nested
    * UnresolvedFunction nodes, which the analyzer then resolves to
    * fixpoint). */
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
