package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, ScalaUDF, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Sort, Window}
import org.apache.spark.sql.functions.{col, count, lit, max, sum}
import org.apache.spark.sql.graftbridge.Bridge

/** Static scale linter over a query's OPTIMIZED logical plan — the
  * anti-pattern checklist this engine's PlanShapeSpec enforces by
  * hand, packaged as a library call so a pipeline author can gate
  * their own queries (`assert(PlanLint.lint(df).isEmpty)`) before
  * pointing them at 100 TB.
  *
  * Rules (each is a plan shape that works at test scale and falls
  * over at cluster scale):
  *
  *  - `cartesian-join`: a join with no join condition multiplies its
  *    inputs; at any real cardinality that's the job that never ends.
  *    Broadcast-able literal/tiny crosses (model constants, single-row
  *    totals — this engine's own idiom) are fine IF one side is a
  *    one-row aggregate; the rule flags only condition-less joins
  *    where neither side is provably single-row.
  *  - `unpartitioned-window`: a window function with an empty
  *    PARTITION BY moves every row to ONE task (Spark itself warns at
  *    runtime; this catches it before running). Bounded post-aggregate
  *    frames are legitimate — the caller decides; the linter reports.
  *  - `scala-udf`: a ScalaUDF in the plan breaks whole-stage codegen
  *    and Catalyst optimization through that expression; this
  *    engine's discipline is columns/native expressions everywhere.
  *  - `non-root-global-sort`: a global Sort that is NOT the plan root
  *    (and not feeding a Limit, which Spark turns into a distributed
  *    top-k) re-sorts the whole dataset mid-pipeline for nothing —
  *    downstream exchanges destroy the order anyway.
  */
object PlanLint {

  /** One lint finding: the rule, the offending node's head line, and
    * a short explanation. */
  case class Finding(rule: String, node: String, detail: String)

  /** Lint `df`'s optimized plan. `smallSideRows` is the largest
    * PROVABLY-bounded side (via `LogicalPlan.maxRows` — global
    * aggregates, literal local relations, explicit limits) a
    * condition-less join may multiply by before it is flagged: the
    * default 1 admits only the scalar-frame cross; an engine whose
    * documented idiom includes bounded fan-out crosses (k-means
    * centroid tables, constant grids) can pass its bound instead —
    * a ×k fan-out with k ≤ 64 is a legitimate 100 TB shape, an
    * unbounded×unbounded cross never is. */
  def lint(df: DataFrame, smallSideRows: Long = 1L): Seq[Finding] =
    lintPlan(df.queryExecution.optimizedPlan, smallSideRows)

  private def headLine(p: LogicalPlan): String =
    p.simpleString(maxFields = 8).linesIterator.next().take(160)

  /** A plan subtree that provably produces at most `bound` rows (a
    * global aggregate or an explicit small limit) — the legal
    * cross-join side for the "multiply by a scalar frame" idiom. */
  private def boundedBy(p: LogicalPlan, bound: Long): Boolean =
    p.maxRows.exists(_ <= bound)

  private[plans] def lintPlan(root: LogicalPlan,
                              smallSideRows: Long = 1L): Seq[Finding] = {
    val out = Seq.newBuilder[Finding]

    root.foreach {
      case j @ Join(left, right, _, None, _) =>
        if (!boundedBy(left, smallSideRows) && !boundedBy(right, smallSideRows))
          out += Finding("cartesian-join", headLine(j),
            "condition-less join where neither side is provably single-row: " +
              "|L|x|R| rows materialize")
      case w: Window if w.partitionSpec.isEmpty =>
        out += Finding("unpartitioned-window", headLine(w),
          "empty PARTITION BY moves every row to one task; partition the " +
            "window or bound its input first")
      case s: Sort if s.global && !(root eq s) =>
        // a global sort feeding a Limit becomes TakeOrdered (fine);
        // anything else mid-plan is wasted work at scale
        val feedsLimit = root.collect {
          case l: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit
            if l.exists(_ eq s) => l
        }.nonEmpty
        if (!feedsLimit)
          out += Finding("non-root-global-sort", headLine(s),
            "mid-plan global sort: downstream exchanges destroy the order")
      case _ => ()
    }

    // expression-level rules (walk every node's expressions once)
    root.foreach { node =>
      node.expressions.foreach { e =>
        e.foreach {
          case _: ScalaUDF =>
            out += Finding("scala-udf", headLine(node),
              "ScalaUDF blocks whole-stage codegen and Catalyst " +
                "optimization; prefer column expressions or a native Expression")
          case we: WindowExpression
            if we.windowSpec.partitionSpec.isEmpty =>
            out += Finding("unpartitioned-window", headLine(node),
              "window expression with empty PARTITION BY")
          case _ => ()
        }
      }
    }
    out.result().distinct
  }

  /** Column names that mark a join as already salted (the engine's
    * [[graft.operators.Skew.saltedJoin]] idiom). */
  private val SaltKeyNames = Set("_salt", "salt")

  /** DATA-AWARE skew rule — the q217 advisor wired into the linter.
    *
    * For every equi-join in the optimized plan that would SHUFFLE
    * (neither side within the session's broadcast threshold by
    * Catalyst's own size stats — a broadcast join never shuffles the
    * fact side, so a hot key cannot overload a reducer) and is not
    * already salted (no `_salt` equi-key), this MEASURES each side's
    * join-key histogram — one counting aggregation per side, which is
    * why the rule is a separate, explicitly-invoked pass rather than
    * part of the static [[lint]] — and flags the join when the
    * advisor's threshold fires: max per-key count > `hotFactor` × the
    * mean ([[graft.operators.Skew.HotFactor]]) AND max ≥ `minHot`
    * rows ([[graft.operators.Skew.MinHotCount]] — the absolute
    * significance floor that keeps the ratio test from firing on
    * reducer loads too small to matter). The finding carries
    * the measured max/mean and the advisor's capped salt
    * recommendation ceil(max/mean), i.e. the `buckets` argument to
    * [[graft.operators.Skew.saltedJoin]] that levels the hottest
    * reducer to the mean.
    */
  def lintSkew(df: DataFrame, hotFactor: Long = graft.operators.Skew.HotFactor,
               minHot: Long = graft.operators.Skew.MinHotCount)
      : Seq[Finding] = {
    val spark = df.sparkSession
    val bcThreshold = BigInt(spark.sessionState.conf.autoBroadcastJoinThreshold)
    val out = Seq.newBuilder[Finding]
    df.queryExecution.optimizedPlan.foreach {
      case j @ Join(left, right, _, Some(cond), _) =>
        // equi-key pairs: EqualTo among the TOP-LEVEL conjuncts only,
        // one attr per side. Splitting on And first (rather than
        // cond.collect over the whole tree) is load-bearing: an
        // EqualTo nested under OR/NOT (`a=b OR c`) is NOT a join
        // equi-key — the shuffle doesn't hash on it — so collecting
        // it would measure the histogram of a non-key, and a `_salt`
        // comparison inside a disjunct would wrongly mark the join
        // salted.
        def conjuncts(e: Expression): Seq[Expression] = e match {
          case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
            conjuncts(l) ++ conjuncts(r)
          case other => Seq(other)
        }
        val eqKeys: Seq[(Attribute, Attribute)] = conjuncts(cond).collect {
          case EqualTo(a: Attribute, b: Attribute)
            if left.outputSet.contains(a) && right.outputSet.contains(b) => (a, b)
          case EqualTo(a: Attribute, b: Attribute)
            if left.outputSet.contains(b) && right.outputSet.contains(a) => (b, a)
        }
        val salted = eqKeys.exists { case (a, b) =>
          SaltKeyNames(a.name.toLowerCase) || SaltKeyNames(b.name.toLowerCase) }
        val broadcastable =
          left.stats.sizeInBytes <= bcThreshold ||
            right.stats.sizeInBytes <= bcThreshold
        if (eqKeys.nonEmpty && !salted && !broadcastable) {
          def measure(side: LogicalPlan, keys: Seq[Attribute], tag: String): Unit = {
            // group by the RESOLVED attributes (not names — a self-join
            // side can carry duplicate column names)
            val cnts = Bridge.ofRows(spark, side)
              .groupBy(keys.map(a => Bridge.column(a)): _*)
              .agg(count(lit(1)).as("_lint_cnt"))
            val row = cnts.agg(sum(col("_lint_cnt")).as("n_rows"),
              count(lit(1)).as("n_keys"), max(col("_lint_cnt")).as("max_cnt"))
              .collect().head
            if (!row.isNullAt(0)) {
              val (nRows, nKeys, maxCnt) =
                (row.getLong(0), row.getLong(1), row.getLong(2))
              val avg = math.max(nRows / math.max(nKeys, 1L), 1L)
              // ratio finds the shape, the absolute floor confirms the
              // magnitude: a max-count under `minHot` rows cannot
              // overload a reducer however extreme its ratio (see
              // Skew.MinHotCount)
              if (maxCnt > avg * hotFactor && maxCnt >= minHot) {
                val reco = math.min(graft.operators.Skew.SaltCap,
                  (maxCnt + avg - 1L) / avg)
                out += Finding("skewed-shuffle-join", headLine(j),
                  s"$tag side key histogram is hot (max=$maxCnt, mean=$avg, " +
                    s"keys=$nKeys): one reducer takes ${maxCnt / math.max(avg, 1L)}x " +
                    s"the mean — salt with Skew.saltedJoin(buckets=$reco) or " +
                    "broadcast the dim")
              }
            }
          }
          measure(left, eqKeys.map(_._1), "left")
          measure(right, eqKeys.map(_._2), "right")
        }
      case _ => ()
    }
    out.result().distinct
  }
}
