package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Behavioral / product analytics over the events table: ordered
  * funnel conversion, weekly cohort retention, and a sweep-line
  * concurrency profile. These are the classic clickstream operators
  * an analytics engine is asked for the day it ships (reference
  * analog: the daily per-card/route/tariff aggregates of
  * dags/dag_datapelangan.py:188-239 are the same "activity rollup"
  * family, at event grain instead of day grain).
  *
  * Scale posture:
  *   - funnel: one aggregation + equi-join per step, all keyed on
  *     user_id — co-partitioned shuffles, and each stage frame is one
  *     row per surviving user, so the frames shrink monotonically
  *     down the funnel (AQE flips the later joins to broadcast).
  *   - cohort: two user_id-keyed shuffles (first-touch agg + join
  *     back), then a low-cardinality (cohort, week) count-distinct.
  *   - concurrency: intervals are clipped to day boundaries so the
  *     running sweep-line sum partitions BY DAY — there is no
  *     globally-ordered window at any corpus size.
  */
object Behavioral {

  /** Reference instant for [[rfmFeatures]] recency: the day after the
    * fixture's event range (micros for 2024-02-01T00:00Z). */
  val RfmAsOfUs = 1706745600000000L

  /** RFM FEATURE ENGINEERING — the classic churn/LTV feature triple
    * every customer-model feature store materializes: per user,
    * Recency (whole days from last purchase to the as-of instant —
    * integer floor of a non-negative difference), Frequency (purchase
    * count), Monetary (exact cents via DECIMAL), plus simple
    * threshold segments so the downstream join is a tiny dictionary.
    * One keyed aggregation over the purchase slice; the scan prunes
    * to three columns and the purchase filter pushes down. */
  def rfmFeatures(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
    e.groupBy(col("user_id"))
      .agg(max(col("tus")).as("last_tus"),
        count(lit(1)).as("frequency"),
        sum(col("cents")).as("monetary_cents"))
      .select(col("user_id"),
        expr(s"($RfmAsOfUs - last_tus) div ${86400L * 1000000}")
          .as("recency_days"),
        col("frequency"), col("monetary_cents"))
      .withColumn("segment",
        when(col("recency_days") <= 7 && col("frequency") >= 3, "champion")
          .when(col("recency_days") <= 7, "recent")
          .when(col("frequency") >= 3, "loyal")
          .otherwise("at_risk"))
      .orderBy(col("user_id"))
  }

  /** Ordered funnel: for each step i, users whose earliest qualifying
    * step-i event falls strictly after their step-(i-1) time and
    * within `withinDays` of it. Returns one row per step with the
    * surviving-user count. */
  def funnel(spark: SparkSession, dir: String,
             steps: Seq[String] = Seq("view", "click", "purchase"),
             withinDays: Int = 7): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val first = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("ts")).as("t"))
    val stages = steps.tail.scanLeft(first) { (prev, step) =>
      e.filter(col("event_type") === step)
        .join(prev, "user_id")
        .filter(col("ts") > col("t") &&
          col("ts") <= col("t") + expr(s"interval $withinDays days"))
        .groupBy("user_id").agg(min(col("ts")).as("t"))
    }
    stages.zip(steps).zipWithIndex.map { case ((df, name), i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).cast("long").as("step"), lit(name).as("event_type"),
          col("users"))
    }.reduce(_ unionByName _).orderBy(col("step"))
  }

  /** Weekly cohort retention: users grouped by the Monday-start week
    * of their first event; `users` counts distinct cohort members
    * active `week_offset` weeks later. Week diffs are exact (both
    * ends are week-truncated, so the day diff is a multiple of 7). */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(spark, dir).select(col("user_id"), col("ts"))
    val firsts = e.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort"))
    e.join(firsts, "user_id")
      .select(col("user_id"), col("cohort"),
        (datediff(to_date(date_trunc("week", col("ts"))), to_date(col("cohort"))) / 7)
          .cast("long").as("week_offset"))
      .groupBy(col("cohort"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("users"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Sweep-line concurrency: each event opens a session of
    * floor(value*60) seconds ([start, end) half-open); reports, per
    * day, how many sessions touch the day and the maximum number
    * simultaneously open. Intervals are clipped to day boundaries
    * first, so the ordered running sum never leaves a day partition.
    * Tie order (time, then -1 before +1, then event_id) is total —
    * the running sums are identical in any engine, and back-to-back
    * sessions touching at a boundary never count as concurrent. */
  def concurrencyProfile(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val e = Tables.loadEvents(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("s_us"),
        (unix_micros(col("ts")) + floor(col("value") * 60).cast("long") * 1000000L)
          .as("e_us"))
      .filter(col("e_us") > col("s_us"))
    val spans = e.select(col("event_id"), col("s_us"), col("e_us"),
      explode(sequence(
        to_date(timestamp_micros(col("s_us"))),
        to_date(timestamp_micros(col("e_us") - 1)))).as("day"))
      .withColumn("day_us", unix_micros(col("day").cast("timestamp")))
      .select(col("event_id"), col("day"),
        greatest(col("s_us"), col("day_us")).as("lo"),
        least(col("e_us"), col("day_us") + dayUs).as("hi"))
    val points = spans.select(col("day"), col("lo").as("t"),
        lit(1L).as("delta"), col("event_id"))
      .unionByName(spans.select(col("day"), col("hi").as("t"),
        lit(-1L).as("delta"), col("event_id")))
    val w = Window.partitionBy(col("day"))
      .orderBy(col("t"), col("delta"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    points.withColumn("open", sum(col("delta")).over(w))
      .groupBy(col("day"))
      .agg((count(lit(1)) / 2).cast("long").as("sessions"),
        max(col("open")).as("max_concurrent"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("sessions"), col("max_concurrent"))
      .orderBy(col("day"))
  }

  /** Rolling 7-day distinct users (WAU) per observed day. A sliding
    * COUNT(DISTINCT) has no partial-mergeable form, so the scalable
    * formulation materializes each (user, active-day) pair into the 7
    * window-ends it contributes to, dedups (user, window) once, and
    * counts — a bounded ×7 map-side expansion and one shuffle keyed
    * on (user, window), never a per-window re-scan. Windows are
    * clipped to days that actually appear in the data. */
  def rollingWau(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.loadEvents(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val contrib = du.select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6),
          expr("interval 1 day"))).as("wend"))
      .distinct()
    val days = du.select(col("day")).distinct()
    contrib.join(days, contrib("wend") === days("day"))
      .groupBy(col("wend")).agg(count(lit(1)).as("wau"))
      .select(date_format(col("wend"), "yyyy-MM-dd").as("day"), col("wau"))
      .orderBy(col("day"))
  }

  /** Path analysis: the most common CONSECUTIVE event-type triples
    * across user streams (the "what do users do next" query). Two
    * lead() windows inside the user partition build the trigrams —
    * no self-joins — then one low-cardinality count. Ties in the
    * top-k break lexicographically on the path. */
  def eventPaths(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    e.withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Funnel step timing: for users who complete each funnel
    * transition (same in-order, in-window rule as [[funnel]]), the
    * R-7 median and p90 of the transition delay in whole seconds.
    * Delays are integer seconds, so the quantiles land on dyadic
    * rationals — binary-exact in any engine (same argument as the
    * length-outlier medians). */
  def funnelTiming(spark: SparkSession, dir: String,
                   steps: Seq[String] = Seq("view", "click", "purchase"),
                   withinDays: Int = 7): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val first = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("ts")).as("t"))
    val stages = steps.tail.scanLeft(first) { (prev, step) =>
      e.filter(col("event_type") === step)
        .join(prev, "user_id")
        .filter(col("ts") > col("t") &&
          col("ts") <= col("t") + expr(s"interval $withinDays days"))
        .groupBy("user_id").agg(min(col("ts")).as("t"))
    }
    stages.sliding(2).zipWithIndex.map { case (Seq(a, b), i) =>
      val d = a.select(col("user_id"), col("t").as("ta"))
        .join(b.select(col("user_id"), col("t").as("tb")), "user_id")
        .select(((unix_micros(col("tb")) - unix_micros(col("ta"))) / 1000000L)
          .cast("long").as("delay_s"))
      d.agg(count(lit(1)).as("n_users"),
          round(percentile(col("delay_s"), lit(0.5)), 4).as("median_s"),
          round(percentile(col("delay_s"), lit(0.9)), 4).as("p90_s"))
        .select(lit(s"${steps(i)}>${steps(i + 1)}").as("transition"),
          col("n_users"), col("median_s"), col("p90_s"))
    }.reduce(_ unionByName _)
      .orderBy(col("transition"))
  }

  /** Statistical anomaly days: for each event type, days whose total
    * value (in cents) deviates from the type's own history by more
    * than `sigmas` sample standard deviations. The test is evaluated
    * on the cross-multiplied INTEGER form
    *   (n−1)·(n·x − Σx)² > sigmas²·n·(n·Σx² − (Σx)²)
    * in DECIMAL(38,0), so there is no float boundary anywhere and any
    * engine flags the same days (safe while daily cent-sums stay
    * below ~10^12 — 38 digits bound the squared products). One
    * day-grain aggregation, one per-type stats aggregation (tiny),
    * broadcast back over the day frame. */
  def anomalyDays(spark: SparkSession, dir: String, sigmas: Int = 2): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // cents via DECIMAL(18,2): double→decimal→×100 is exact; a raw
    // double×100 truncation would disagree across engines
    val d182 = org.apache.spark.sql.types.DecimalType(18, 2)
    val daily = Tables.loadEvents(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum((col("value").cast(d182) * 100).cast("long")).as("x"))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum((col("x").cast(d38) * col("x").cast(d38)).cast(d38)).as("sxx"))
    daily.join(broadcast(stats), Seq("event_type"))
      .filter(col("n") > 1)
      .withColumn("dev", (col("n").cast(d38) * col("x").cast(d38) -
        col("sx").cast(d38)).cast(d38))
      .withColumn("lhs", ((col("n") - 1).cast(d38) * (col("dev") * col("dev")).cast(d38)).cast(d38))
      .withColumn("rhs", (lit(sigmas * sigmas).cast(d38) * col("n").cast(d38) *
        (col("n").cast(d38) * col("sxx") - (col("sx").cast(d38) * col("sx").cast(d38)).cast(d38)).cast(d38)).cast(d38))
      .filter(col("lhs") > col("rhs"))
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("x").as("cents"), col("n").as("n_days"))
      .orderBy(col("event_type"), col("day"))
  }

  /** A/B experiment readout: users are split by the deterministic
    * hash-free assignment user_id % 2 (the harness's stand-in for an
    * assignment table); exposure = having a `view`, conversion = a
    * `purchase` strictly after the user's FIRST view (the funnel
    * ordering rule, so pre-exposure purchases don't count). Returns
    * per variant: exposed users, converted users, and the conversion
    * rate in ppm (fixed-point, floor div — integer-exact).
    *
    * Scale posture: one min-aggregate keyed on user for first views,
    * one semi-join-shaped distinct for converters, one two-row final
    * aggregate. Nothing wider than the user key ever shuffles. */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
    val firstView = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      .cache()
    val converted = e.filter(col("event_type") === "purchase")
      .join(firstView, Seq("user_id"))
      .filter(col("ts") > col("t0"))
      .select(col("user_id")).distinct()
      .withColumn("conv", lit(1L))
    firstView
      .join(converted, Seq("user_id"), "left")
      .groupBy(when(col("user_id") % 2 === 0, "A").otherwise("B").as("variant"))
      .agg(count(lit(1)).as("n_exposed"),
        sum(coalesce(col("conv"), lit(0L))).as("n_converted"))
      .select(col("variant"), col("n_exposed"), col("n_converted"),
        expr("n_converted * 1000000 div n_exposed").as("cvr_ppm"))
      .orderBy(col("variant"))
  }

  /** Distribution drift per day: scaled-L2 distance between each
    * day's event-type mix and the corpus-wide mix — the data-quality
    * monitor a continuously-ingesting pipeline runs to catch a feed
    * going bad (one source dropping out skews the type distribution
    * long before volume alarms fire). Frequencies are fixed-point
    * (×10⁶, floor division) so the statistic is integer-exact and
    * engine-portable; days missing a type contribute that type's full
    * squared reference frequency (the zero row is materialized via
    * the day×type frame, both sides tiny). Returns the `k` most
    * drifted days.
    *
    * Scale posture: one fact-sized (day, type) count aggregation;
    * everything after is dimension-sized (days × types) and the
    * reference mix is a broadcast scalar frame. */
  def driftDays(spark: SparkSession, dir: String, k: Int = 15): DataFrame = {
    val daily = Tables.loadEvents(spark, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .cache()
    val dayTot = daily.groupBy(col("day")).agg(sum(col("c")).as("td"))
    val glob = daily.groupBy(col("event_type")).agg(sum(col("c")).as("g"))
    val tot = glob.agg(sum(col("g")).as("t"))
    val grid = dayTot.crossJoin(broadcast(glob.crossJoin(tot)))
      .join(daily, Seq("day", "event_type"), "left")
      .select(col("day"), col("td"),
        expr("(coalesce(c, 0) * 1000000) div td").as("f_day"),
        expr("(g * 1000000) div t").as("f_ref"))
    grid.groupBy(col("day"), col("td"))
      .agg(sum((col("f_day") - col("f_ref")) * (col("f_day") - col("f_ref"))).as("drift"))
      .orderBy(col("drift").desc, col("day"))
      .limit(k)
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("td").as("n_events"), col("drift"))
  }

  /** Multi-touch revenue attribution: each purchase's value (exact
    * cents) is credited to the user's FIRST non-purchase touch
    * (first-touch model) and to the LAST non-purchase touch strictly
    * before the purchase (last-touch model); purchases with no prior
    * touch credit the synthetic 'direct' channel. The per-user event
    * timeline is totally ordered by (ts, event_id), so both models
    * are deterministic under same-timestamp events.
    *
    * Scale posture: one user_id-keyed window pass over the events
    * (the same shuffle the sessionizers pay — no self-join per
    * purchase), then two channel-grain aggregations over the
    * purchase-sized frame, merged with a full outer join on the tiny
    * channel dimension. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val d182 = org.apache.spark.sql.types.DecimalType(18, 2)
    val e = Tables.loadEvents(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        col("value"))
    val before = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val credited = e
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(before))
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(before))
      .filter(col("event_type") === "purchase")
      .select(
        coalesce(col("first_touch"), lit("direct")).as("fc"),
        coalesce(col("last_touch"), lit("direct")).as("lc"),
        (col("value").cast(d182) * 100).cast("long").as("cents"))
    val ft = credited.groupBy(col("fc").as("channel"))
      .agg(sum(col("cents")).as("first_touch_cents"),
        count(lit(1)).as("n_first"))
    val lt = credited.groupBy(col("lc").as("channel"))
      .agg(sum(col("cents")).as("last_touch_cents"),
        count(lit(1)).as("n_last"))
    ft.join(lt, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("first_touch_cents"), lit(0L)).as("first_touch_cents"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        coalesce(col("last_touch_cents"), lit(0L)).as("last_touch_cents"),
        coalesce(col("n_last"), lit(0L)).as("n_last"))
      .orderBy(col("channel"))
  }

  /** First-order Markov transition matrix over each user's event
    * stream: totally order every user's events by (ts, event_id),
    * pair each with its successor via lag, count (cur → nxt)
    * transitions, and report each row's transition probability as the
    * single exact-integer division n/row_total (identical IEEE double
    * on any engine, rounded at 6dp).
    *
    * Scale posture: one user_id-keyed window pass (the sessionizer
    * shuffle) then an aggregation onto the |event_types|² cell grid —
    * the row-total window runs on that tiny grid, not the events. */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val wSeq = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cells = e
      .withColumn("nxt", lead(col("event_type"), 1).over(wSeq))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("n"))
    val wRow = Window.partitionBy(col("cur"))
    cells
      .withColumn("row_total", sum(col("n")).over(wRow))
      .select(col("cur"), col("nxt"), col("n"),
        round(col("n").cast("double") / col("row_total").cast("double"), 6).as("p"))
      .orderBy(col("cur"), col("nxt"))
  }

  /** Per-observation EWMA (α = 1/2) of the daily per-type cent
    * totals, windowed to the last 8 observations so the weights are
    * the exact dyadics 128,64,…,1 — numerator and denominator are
    * BIGINT sums and the single final division is the only float op,
    * giving bit-identical results on any engine. (An unbounded EWMA
    * needs a running float product, which no two engines agree on.)
    * One day-grain aggregation, one event_type-partitioned window. */
  /** Rolling 7-observation daily stats per event type: exact-integer
    * min/max/sum, the interpolated median (same cross-engine
    * percentile contract as the q30 family, rounded at 4dp), and the
    * mean as one exact-integer division mirrored on both engines.
    * One day-grain aggregation + one partitioned window — the
    * continuous-monitoring view next to [[anomalyDays]]'s
    * whole-history test. */
  def rollingDailyStats(spark: SparkSession, dir: String,
                        window: Int = 7): DataFrame = {
    val d182 = org.apache.spark.sql.types.DecimalType(18, 2)
    val daily = Tables.loadEvents(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum((col("value").cast(d182) * 100).cast("long")).as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-(window - 1), Window.currentRow)
    daily.select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"), col("cents"),
        round(percentile(col("cents"), lit(0.5)).over(w), 4).as("med7"),
        (sum(col("cents")).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as("avg7"),
        min(col("cents")).over(w).as("min7"),
        max(col("cents")).over(w).as("max7"))
      .orderBy(col("event_type"), col("day"))
  }

  def ewmaDaily(spark: SparkSession, dir: String, window: Int = 8): DataFrame = {
    val d182 = org.apache.spark.sql.types.DecimalType(18, 2)
    val daily = Tables.loadEvents(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum((col("value").cast(d182) * 100).cast("long")).as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val terms = (0 until window).map { k =>
      val weight = 1L << (window - 1 - k)
      val x = if (k == 0) col("cents") else lag(col("cents"), k).over(w)
      (coalesce(x * lit(weight), lit(0L)),
        when(x.isNotNull, lit(weight)).otherwise(lit(0L)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    daily
      .withColumn("ewma_cents", num.cast("double") / den.cast("double"))
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("cents"), col("ewma_cents"))
      .orderBy(col("event_type"), col("day"))
  }

  /** MATCH_RECOGNIZE-lite sequence motif detection: each 30-min-gap
    * session's ordered event types become a compact string (one char
    * per event — the five types have distinct initials) and the motif
    * is a plain regex over it ("view, 1-3 clicks, purchase, nothing in
    * between" = `vc{1,3}p`), counted non-overlapping left-to-right —
    * the semantics regex engines share, so the DuckDB oracle's
    * regexp_extract_all agrees exactly. Per user: sessions, sessions
    * containing the motif, total motif occurrences.
    *
    * Scale posture: sessionization is the q50 lag+running-sum shape
    * (per-user windows); the session string is an in-group sort of a
    * GAP-BOUNDED session (collect_list never sees more than one
    * session), and the regex is map-only over session rows. */
  def sequenceMotif(spark: SparkSession, dir: String,
      pattern: String = "vc{1,3}p", gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val e = Tables.loadEvents(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("ch"))
    val wSeq = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prev = lag(col("ts"), 1).over(wSeq)
    val s = e.withColumn("brk",
        when(prev.isNull || unix_micros(col("ts")) - unix_micros(prev) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(
        wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val seqs = s.groupBy(col("user_id"), col("session_id"))
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"), col("ch")))),
        x => x.getField("ch"))).as("seq"))
    seqs.select(col("user_id"),
        regexp_count(col("seq"), lit(pattern)).cast("long").as("k"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        count(when(col("k") > 0, 1)).as("n_motif_sessions"),
        sum(col("k")).as("n_motifs"))
      .orderBy(col("user_id"))
  }
}
