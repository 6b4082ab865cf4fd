package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Conversation (SFT / chat) data preparation from raw interaction
  * logs — the post-training counterpart of the pretraining corpus
  * operators: sessionize an event stream into dialogues, map events
  * to speaker roles, validate turn structure (strict user/assistant
  * alternation, user-first, minimum length), assemble the canonical
  * transcript, and dedup identical transcripts keep-first. Every SFT
  * pipeline runs exactly this shape over support logs / chat exports
  * before formatting into training turns.
  *
  * Role mapping here: user-initiated events (`view`, `click`) speak
  * as "user", system-side events (`signup`, `purchase`, `error`) as
  * "assistant" — so alternation is a real data property, not a
  * construction artifact.
  *
  * Scale shape: one shuffle keyed by user_id for the gap
  * sessionization windows (per-user event counts are bounded;
  * hot-user skew is the q42/q52 salting case if it appears), a
  * per-session aggregation, and a transcript-hash window whose
  * partitions are duplicate families (tiny). No global window, no
  * collect. Transcripts are md5-hashed for the dedup key — the
  * portable-hash discipline every dedup operator here uses.
  */
object Conversations {

  /** Session gap: events further apart than this start a new
    * conversation (microseconds; 30 minutes). */
  val GapUs: Long = 30L * 60 * 1000 * 1000

  /** Minimum turns for a valid training conversation. */
  val MinTurns = 2

  /** Gap-sessionized turn rows (user_id, event_id, event_type, props,
    * role, tus, sess_n) — the sessionization shared by [[assemble]]
    * and [[contextTrim]] (one shuffle keyed by user_id). */
  private def sessionized(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEvents(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("props"), unix_micros(col("ts")).as("tus"))
      .withColumn("role",
        when(col("event_type").isin("view", "click"), "user")
          .otherwise("assistant"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    e.withColumn("prev_tus", lag(col("tus"), 1).over(byUser))
      .withColumn("new_s",
        (col("prev_tus").isNull || col("tus") - col("prev_tus") > GapUs)
          .cast("long"))
      .withColumn("sess_n", sum(col("new_s")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-conversation assembly + validity + keep-first dedup. */
  def assemble(spark: SparkSession, dir: String): DataFrame = {
    val sessed = sessionized(spark, dir)

    val inSess = Window.partitionBy(col("user_id"), col("sess_n"))
      .orderBy(col("tus"), col("event_id"))
    val turns = sessed
      .withColumn("same_prev",
        (col("role") === lag(col("role"), 1).over(inSess)).cast("long"))
      .withColumn("rn", row_number().over(inSess))

    val conv = turns
      .groupBy(col("user_id"), col("sess_n"))
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user_turns"),
        sum(coalesce(col("same_prev"), lit(0L))).as("viol"),
        max(when(col("rn") === 1, col("role"))).as("first_role"),
        // canonical transcript: turn lines in (tus, event_id) order —
        // array_sort on the (tus, event_id, line) struct is the
        // deterministic, shuffle-free ordered string_agg
        md5(concat_ws("\n", transform(
          array_sort(collect_list(struct(col("tus"), col("event_id"),
            concat(col("role"), lit(": "), col("event_type")).as("line")))),
          x => x.getField("line")))).as("thash"))

    val firstOfHash = Window.partitionBy(col("thash"))
      .orderBy(col("user_id"), col("sess_n"))
    conv
      .withColumn("rk", row_number().over(firstOfHash))
      .select(col("user_id"), col("sess_n").cast("long").as("sess_n"),
        col("n_turns").cast("long").as("n_turns"),
        col("n_user_turns").cast("long").as("n_user_turns"),
        col("viol").cast("long").as("viol"),
        (col("viol") === 0 && col("first_role") === "user" &&
          col("n_turns") >= MinTurns).cast("int").as("valid"),
        col("thash"),
        (col("rk") === 1).cast("int").as("is_canonical"))
      .orderBy(col("user_id"), col("sess_n"))
  }

  /** Token budget (cost units) for [[contextTrim]]. */
  val ContextBudget = 150L

  /** Context-window trimming — the "fit the conversation into the
    * model's context" step every SFT/serving pipeline runs: keep the
    * LONGEST SUFFIX of turns whose summed token cost fits
    * [[ContextBudget]] (recency wins; the oldest turns fall off, the
    * standard sliding-context policy). Per-turn cost here is the
    * event's payload size (1 + props.k — the fixture's stand-in for a
    * per-turn token count). A single over-budget turn keeps nothing:
    * trimming cannot shrink a turn, only drop it.
    *
    * Scale shape: reuses [[sessionized]]'s one user-keyed shuffle;
    * the suffix sum is a per-conversation descending cumulative
    * window (bounded partitions), then one aggregation — integer
    * arithmetic throughout. */
  def contextTrim(spark: SparkSession, dir: String): DataFrame = {
    val cost = lit(1L) + coalesce(
      nullif(regexp_extract(col("props"), "\"k\": ([0-9]+)", 1), lit(""))
        .cast("long"), lit(0L))
    val suffix = Window.partitionBy(col("user_id"), col("sess_n"))
      .orderBy(col("tus").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessionized(spark, dir)
      .withColumn("cost", cost)
      .withColumn("sufcost", sum(col("cost")).over(suffix))
      .groupBy(col("user_id"), col("sess_n"))
      .agg(count(lit(1)).as("n_turns"),
        sum(col("cost")).as("total_cost"),
        sum(when(col("sufcost") <= ContextBudget, 1L).otherwise(0L))
          .as("kept_turns"),
        coalesce(sum(when(col("sufcost") <= ContextBudget, col("cost"))),
          lit(0L)).as("kept_cost"))
      .select(col("user_id"), col("sess_n").cast("long").as("sess_n"),
        col("n_turns"), col("total_cost"), col("kept_turns"),
        (col("n_turns") - col("kept_turns")).as("dropped_turns"),
        col("kept_cost"))
      .orderBy(col("user_id"), col("sess_n"))
  }
}
