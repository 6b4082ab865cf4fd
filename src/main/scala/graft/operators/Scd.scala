package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 merge — the versioned-history
  * upgrade of the reference's Type 1 dimension upsert
  * (stage_csv_dims_to_pg.py:125-140 overwrites attributes in place,
  * losing history): instead of updating a changed row, CLOSE it
  * (valid_to = effective date, is_current = false) and insert a new
  * current version, so every attribute value ever seen remains
  * queryable as of its validity interval.
  *
  * Dimension rows carry (key, attrs…, valid_from, valid_to,
  * is_current); validity bounds are ISO `yyyy-MM-dd` STRINGS (lexical
  * order = date order, and no engine-specific DATE canonicalization in
  * the cross-engine gate). A delta row changes its key iff any tracked
  * attribute differs null-safely from the key's CURRENT row; identical
  * rows are no-ops, keys absent from the base insert as new current
  * rows.
  *
  * Scale shape: one key-equi-join of the delta against the CURRENT
  * slice (Catalyst broadcasts a small delta), a marker anti-pattern to
  * drop superseded current rows without touching history rows, and
  * map-only projections — history is never rewritten, matching the
  * append-only growth of a real dimension at 100 TB facts scale.
  */
object Scd {

  def scd2Merge(base: DataFrame, delta: DataFrame, key: String,
                attrs: Seq[String], effectiveDate: String): DataFrame = {
    require(attrs.nonEmpty, "scd2Merge: no tracked attributes")
    val metaCols = Seq("valid_from", "valid_to", "is_current")
    val outCols = (key +: attrs) ++ metaCols
    val d = delta.select(col(key) +: attrs.map(a => col(a).as(s"_new_$a")): _*)
    val cur = base.filter(col("is_current"))
    // attribute drift, null-safe: NULL → value and value → NULL both count
    val drift: Column = attrs.map(a => !(col(a) <=> col(s"_new_$a"))).reduce(_ || _)
    val changed = cur.join(d, Seq(key)).filter(drift).cache()
    val changedKeys = changed.select(col(key)).distinct()
    // history rows and unchanged current rows pass through untouched;
    // ONLY the superseded current rows of changed keys drop (a plain
    // anti-join on the key would wrongly delete their history too)
    val untouched = base
      .join(changedKeys.withColumn("_chg", lit(1)), Seq(key), "left")
      // coalesce: an unmatched row's NULL marker must read "not
      // changed", not a NULL predicate that filter() drops
      .filter(!(col("is_current") && coalesce(col("_chg") === 1, lit(false))))
      .select(outCols.map(col): _*)
    val closed = changed.select((col(key) +: attrs.map(col)) ++ Seq(
      col("valid_from"), lit(effectiveDate).as("valid_to"),
      lit(false).as("is_current")): _*)
    val reopened = changed.select((col(key) +: attrs.map(a => col(s"_new_$a").as(a))) ++ Seq(
      lit(effectiveDate).as("valid_from"), lit(null).cast("string").as("valid_to"),
      lit(true).as("is_current")): _*)
    val brandNew = d.join(base.select(col(key)).distinct(), Seq(key), "left_anti")
      .select((col(key) +: attrs.map(a => col(s"_new_$a").as(a))) ++ Seq(
        lit(effectiveDate).as("valid_from"), lit(null).cast("string").as("valid_to"),
        lit(true).as("is_current")): _*)
    untouched.unionByName(closed).unionByName(reopened).unionByName(brandNew)
  }

  /** Point-in-time (temporal) join — why Type 2 history exists: each
    * fact row picks the dimension version whose validity interval
    * `[valid_from, valid_to)` contains the fact's date (`valid_to`
    * NULL = open-ended). The key equality drives the join (hash/SMJ
    * on the key, small dims broadcast); the interval predicate is a
    * residual filter, and since a key's intervals partition the
    * timeline, each fact matches exactly one version — no fan-out. */
  def pointInTimeJoin(facts: DataFrame, dim: DataFrame, key: String,
                      factDate: Column): DataFrame =
    facts.join(dim,
      facts(key) === dim(key) &&
        factDate >= dim("valid_from") &&
        (dim("valid_to").isNull || factDate < dim("valid_to")))
      .drop(dim(key))
}
