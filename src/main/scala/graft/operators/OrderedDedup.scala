package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic keep-first deduplication. `DataFrame.dropDuplicates`
  * keeps an *arbitrary* row per key (whichever arrives first in the
  * shuffle) — fine for idempotent rows, wrong whenever rows differ and
  * the survivor matters (latest record wins, canonical-source wins).
  * This keeps the FIRST row per key under an explicit ordering: one
  * shuffle on the key, a per-key rank, deterministic under retries and
  * repartitioning.
  */
object OrderedDedup {

  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    require(keys.nonEmpty && order.nonEmpty, "keys and order must be non-empty")
    def fresh(base: String): String = {
      var n = base; while (df.columns.contains(n)) n += "_"; n
    }
    val rn = fresh("_rn")
    df.withColumn(rn, row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(order: _*)))
      .filter(col(rn) === 1)
      .drop(rn)
  }
}
