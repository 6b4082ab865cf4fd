package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Time-series operators over the events table: resample-and-fill
  * (densify each key's timeline to a fixed grid, forward-filling
  * gaps) and batch gap-sessionization (the batch analog of
  * streaming.EventStreams.sessionize — same gap rule, pure window
  * functions).
  *
  * Scale posture: everything is partitioned BY KEY — the grid
  * explode, the fill window and the session windows all run inside a
  * user_id partition, so no global sort or single-reducer window
  * exists at any corpus size.
  */
object TimeSeries {
  private val D182 = DecimalType(18, 2)

  /** Hourly resample per user with forward fill: one row per
    * (user, hour) from the user's first to last event hour; hours
    * with no events carry the last seen hourly sum. */
  def gapFillHourly(spark: SparkSession, dir: String, maxUsers: Int = 5): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
      .filter(col("user_id") < maxUsers)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hour"),
        col("value").cast(D182).as("v"))
    val hourly = e.groupBy(col("user_id"), col("hour"))
      .agg(sum(col("v")).cast(D182).as("v"))
    val grid = e.groupBy(col("user_id"))
      .agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hour"))
    val wFill = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("v").isNotNull.as("observed"),
        last(col("v"), ignoreNulls = true).over(wFill).cast("double").as("v_filled"))
      .orderBy(col("user_id"), col("hour"))
  }

  /** Linear-interpolation gap fill — [[gapFillHourly]]'s forward-fill
    * sibling for signals where holding the last value misstates the
    * level (sensor/metric pipelines): every missing grid hour gets
    * v_prev + (v_next − v_prev) · (t − t_prev)/(t_next − t_prev) from
    * the nearest observed neighbors on both sides. The grid spans each
    * user's [min, max] observed hour, so interior gaps always have
    * both neighbors. The hour arithmetic is exact integer micros and
    * the value math is three IEEE ops in a fixed association order —
    * bit-identical in any engine.
    *
    * Scale posture: identical to [[gapFillHourly]] — per-user windows
    * (two passes: carry-last and carry-next), grid exploded map-side;
    * no global sort, nothing driver-side. */
  def interpolateHourly(spark: SparkSession, dir: String, maxUsers: Int = 5): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
      .filter(col("user_id") < maxUsers)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hour"),
        col("value").cast(D182).as("v"))
    val hourly = e.groupBy(col("user_id"), col("hour"))
      .agg(sum(col("v")).cast(D182).as("v"))
    val grid = e.groupBy(col("user_id"))
      .agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hour"))
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // INTEGER-EXACT interpolation: values in cents, gaps in whole
    // hours, interpolated value floored at micro precision —
    // (pv_c·(n−k) + nv_c·k)·10⁴ floor-div n. The previous formulation
    // rounded a DOUBLE to 6 places, and round-on-double semantics
    // (Spark: exact decimal HALF_UP on the binary value; DuckDB:
    // multiply-round-divide) disagreed on exactly one boundary cell
    // in 13,940 at sf0.1. Integer division agrees only if both
    // engines use the SAME integer division: Spark's `div` truncates
    // toward zero while DuckDB's `//` floors, which differ for
    // negative numerators — so the value division is written as an
    // explicit floor-div ((a − pmod(a,n)) div n, exact because the
    // pmod-adjusted numerator is divisible). The hour-count divs
    // (k_, n_) have non-negative numerators by construction and
    // stay plain. The only float left is the final micro/1e6
    // readout — ONE deterministic IEEE division per row.
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        (col("v") * 100).cast("long").as("vc"))
      .select(col("user_id"), col("hour"), col("vc"),
        last(col("vc"), ignoreNulls = true).over(wPrev).as("pvc"),
        last(when(col("vc").isNotNull, col("hour")), ignoreNulls = true)
          .over(wPrev).as("ph"),
        first(col("vc"), ignoreNulls = true).over(wNext).as("nvc"),
        first(when(col("vc").isNotNull, col("hour")), ignoreNulls = true)
          .over(wNext).as("nh"))
      .withColumn("k_", expr("(unix_micros(hour) - unix_micros(ph)) div 3600000000"))
      .withColumn("n_", expr("(unix_micros(nh) - unix_micros(ph)) div 3600000000"))
      .withColumn("micro",
        when(col("vc").isNotNull, col("vc") * 10000L)
          .otherwise(expr(
            "((pvc * (n_ - k_) + nvc * k_) * 10000" +
              " - pmod((pvc * (n_ - k_) + nvc * k_) * 10000, n_)) div n_")))
      .select(col("user_id"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("vc").isNotNull.as("observed"),
        (col("micro").cast("double") / lit(1e6)).as("v_interp"))
      .orderBy(col("user_id"), col("hour"))
  }

  /** Gap-based sessionization in batch: a session breaks when the gap
    * to the previous event (per user, event-time order) exceeds
    * `gapMinutes`. Pure lag + running-sum windows — the classic SQL
    * formulation, semantically matching the streaming operator. */
  def sessionizeBatch(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val e = Tables.loadEvents(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").cast(D182).as("v"))
    val wSeq = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val flagged = e.withColumn("_new_session",
      when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wSeq)) > gapUs, 1L)
        .otherwise(lit(0L)))
      .withColumn("_first", when(lag(col("ts"), 1).over(wSeq).isNull, 1L).otherwise(lit(0L)))
      .withColumn("session_id",
        sum(col("_new_session") + col("_first")).over(
          wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_id"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("v")).cast("double").as("value_sum"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Longest consecutive-month ordering streak per customer — the
    * gaps-and-islands pattern at month grain (the sessionizers above
    * are its time-gap cousins): distinct active months, a per-customer
    * row_number, and `add_months(month, −rn)` which is CONSTANT within
    * a consecutive run — the island key with no self-join or iteration.
    * Top `k` customers by (streak, activity) with a total tie-break.
    *
    * Scale posture: one distinct-months aggregation + one
    * customer-partitioned window + TakeOrdered for the top-k — no
    * global sort, nothing driver-side. */
  def longestStreak(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val months = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"),
        trunc(col("o_orderdate"), "month").as("m"))
      .distinct()
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("m"))
    val islands = months
      .withColumn("grp", add_months(col("m"), -row_number().over(w)))
      .groupBy(col("o_custkey"), col("grp"))
      .agg(count(lit(1)).as("len"),
        date_format(min(col("m")), "yyyy-MM-dd").as("streak_start"))
    val totals = Window.partitionBy(col("o_custkey"))
    val pick = Window.partitionBy(col("o_custkey"))
      .orderBy(col("len").desc, col("streak_start").desc)
    islands
      .withColumn("active_months", sum(col("len")).over(totals))
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("len").as("streak_months"),
        col("streak_start"), col("active_months"))
      .orderBy(col("streak_months").desc, col("active_months").desc,
        col("o_custkey"))
      .limit(k)
  }

  /** Single best-split changepoint over the daily order-revenue
    * series: the split day maximizing |mean(left) − mean(right)|,
    * compared WITHOUT division — the objective is the cross-
    * multiplied |l_cents·r_days − r_cents·l_days|, integer-exact in
    * cents, so the argmax is engine-portable (ties break on earlier
    * date). The amortized form of CUSUM/segmented-regression drift
    * detection a pipeline runs on daily volume before trusting a
    * day's data.
    *
    * Scale posture: the order stream collapses to day grain in one
    * shuffle (date-keyed, map-side combined); the prefix-sum window
    * and argmax then run over #days rows — thousands, not billions —
    * so the unpartitioned window is over the DAY series, never the
    * fact table. Top-k splits reported for context. */
  def bestSplitDays(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val daily = Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderdate").as("d"))
      .agg(sum(col("o_totalprice").cast(D182)).as("day_sum"),
        count(lit(1)).as("day_orders"))
      .select(col("d"), (col("day_sum") * lit(100)).cast("long").as("day_cents"),
        col("day_orders"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = daily.agg(sum(col("day_cents")).as("t_cents"),
      count(lit(1)).as("t_days"))
    val pre = daily
      .withColumn("l_cents", sum(col("day_cents")).over(w))
      .withColumn("l_days", count(lit(1)).over(w))
      .crossJoin(broadcast(totals))
      .filter(col("l_days") < col("t_days"))
      .select(col("d"), col("l_days"), (col("t_days") - col("l_days")).as("r_days"),
        col("l_cents"), (col("t_cents") - col("l_cents")).as("r_cents"))
      .withColumn("objective",
        abs(col("l_cents") * col("r_days") - col("r_cents") * col("l_days")))
    pre.withColumn("rk", row_number().over(
        Window.orderBy(col("objective").desc, col("d"))))
      .filter(col("rk") <= k)
      .select(col("rk").cast("long").as("rk"),
        date_format(col("d"), "yyyy-MM-dd").as("split_date"),
        col("l_days"), col("r_days"), col("l_cents"), col("r_cents"),
        col("objective"))
      .orderBy(col("rk"))
  }

  /** Day-of-week seasonality profile over order revenue: per weekday,
    * the active-day count, order count, revenue cents, floor average
    * cents per active day, and the seasonal index in basis points —
    *   index_bp = (dow_cents · t_days · 10000) div (n_days · t_cents)
    * (10000 = an average weekday). The multiplications run in
    * DECIMAL(38,0) so the cross-product can't overflow BIGINT at any
    * scale factor; the floor quotient lands back in BIGINT, exact on
    * every engine.
    *
    * Scale posture: one date-keyed aggregation collapses the fact
    * table to day grain (map-side combined), then everything runs on
    * ≤ 7 rows against a broadcast one-row total — the unbounded part
    * is a single shuffle at day cardinality. */
  def dowSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderdate").as("d"))
      .agg(sum(col("o_totalprice").cast(D182)).as("day_sum"),
        count(lit(1)).as("day_orders"))
      .select(col("d"), (col("day_sum") * lit(100)).cast("long").as("day_cents"),
        col("day_orders"))
    val dow = daily
      .withColumn("dow", dayofweek(col("d")).cast("long"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("day_orders")).as("n_orders"),
        sum(col("day_cents")).as("dow_cents"))
    val totals = dow.agg(sum(col("n_days")).as("t_days"),
      sum(col("dow_cents")).as("t_cents"))
    dow.crossJoin(broadcast(totals))
      .select(col("dow"), col("n_days"), col("n_orders"), col("dow_cents"),
        expr("dow_cents div n_days").as("avg_day_cents"),
        expr("""(CAST(dow_cents AS DECIMAL(38,0)) * t_days * 10000)
                div (CAST(n_days AS DECIMAL(38,0)) * t_cents)""").as("index_bp"))
      .orderBy(col("dow"))
  }

  /** Seasonal-naive forecast BACKTEST — the baseline every forecasting
    * pipeline must beat and the eval harness that proves it: predict
    * each day's revenue as the revenue of the same weekday one week
    * earlier (forecast(d) = actual(d−7), joined by CALENDAR date so
    * gaps don't slip the season), then score per weekday in exact
    * cents: absolute-error sums, signed bias sums (no division — a
    * signed floor-div would diverge between engines) and the MAE
    * floor-div. Scale shape: one day-grain aggregation (the corpus
    * collapse), a self-equi-join on the shifted date, and a ≤7-row
    * readout. */
  def forecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg((sum(col("o_totalprice").cast(D182)) * lit(100)).cast("long").as("cents"))
    val prev = daily.select(date_add(col("d"), 7).as("d"),
      col("cents").as("fc_cents"))
    daily.join(prev, Seq("d"))
      .select(dayofweek(col("d")).cast("long").as("dow"),
        col("cents"), col("fc_cents"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("cents") - col("fc_cents"))).as("sum_abs_err_cents"),
        sum(col("cents") - col("fc_cents")).as("sum_err_cents"))
      .withColumn("mae_cents", expr("sum_abs_err_cents div n_days"))
      .orderBy(col("dow"))
  }

  /** Discrete inter-order hazard table — the duration-based survival
    * readout beside q113's calendar-cohort retention: every
    * consecutive order pair per customer contributes one observed
    * "returned after g days" event, and the discrete hazard at gap g
    * is
    *   h(g) = events(g) / n_at_risk(g),  n_at_risk(g) = #gaps ≥ g,
    * emitted in exact basis points. n_at_risk comes from one
    * cumulative window over the GAP-VALUE grain (thousands of rows,
    * not the fact table), the classic compressed-domain trick used by
    * q162/q183.
    *
    * Scale posture: one customer-keyed window pass (lag) over orders
    * builds the gaps; everything after is gap-grain. Top `k` gaps by
    * frequency keep the report bounded. */
  def interOrderHazard(spark: SparkSession, dir: String, k: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(datediff(col("o_orderdate"), col("prev")).cast("long").as("g"))
    val byGap = gaps.groupBy(col("g")).agg(count(lit(1)).as("events"))
    val wcum = Window.orderBy(col("g").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byGap
      .withColumn("n_at_risk", sum(col("events")).over(wcum))
      .select(col("g"), col("n_at_risk"), col("events"),
        expr("events * 10000 div n_at_risk").as("hazard_bp"))
      .orderBy(col("events").desc, col("g"))
      .limit(k)
      .orderBy(col("g"))
  }
}
