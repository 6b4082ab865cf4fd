package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSession}

/** Minimal bridge into `private[sql]` surface: constructing a
  * DataFrame from a custom LogicalPlan (the documented pattern for
  * libraries adding whole operators; lives inside the sql package
  * tree solely for access, contains no Spark-derived logic). */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSession], plan)
}
