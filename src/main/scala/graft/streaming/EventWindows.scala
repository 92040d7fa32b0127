package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time windowing over the events table (SURVEY §2.10): the
  * reference is batch-only, so tumbling and session windows are
  * expressed in batch with the same `window`/`session_window` operators
  * Structured Streaming uses — the plans are identical modulo the
  * incremental state store, which is exactly how the code ports to a
  * `readStream` source unchanged (see graft.streaming.StreamDemo).
  */
object EventWindows {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  type Q = (SparkSession, String) => DataFrame

  /** Tumbling 1-day windows × event type — counts and value sums. */
  private val ev1Tumbling: Q = (s, dir) =>
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"),
        col("sum_value"))
      .orderBy(col("ws"), col("event_type"))

  /** Session windows per user with a 6-hour inactivity gap — session
    * start/size. Session start is emitted as epoch micros so the
    * ns-precision oracle and the µs-precision engine agree exactly. */
  private val ev2Session: Q = (s, dir) =>
    t(s, dir, "events")
      .groupBy(session_window(col("ts"), "6 hours").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), unix_micros(col("w.start")).as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Sliding 2-day windows advancing daily — every event lands in
    * exactly two windows. */
  private val ev3Sliding: Q = (s, dir) =>
    t(s, dir, "events")
      .groupBy(window(col("ts"), "2 days", "1 day").as("w"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("ws"), col("n"), col("sum_value"))
      .orderBy(col("ws"))

  val queries: Map[String, Q] = Map(
    "ev1_tumbling" -> ev1Tumbling,
    "ev2_session" -> ev2Session,
    "ev3_sliding" -> ev3Sliding,
  )

  val oracles: Map[String, String] = Map(
    "ev1_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 day', ts) AS ws, event_type,
        | count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin,
    // Gaps-and-islands replica of session_window semantics: a new
    // session starts when the gap from the previous event is >= 6h.
    "ev2_session" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w >= INTERVAL '6 hours' THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, epoch_us(min(ts)) AS session_start,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    // Each event belongs to the window starting at its own day and the
    // one starting the day before (2-day width, 1-day slide).
    "ev3_sliding" ->
      """SELECT ws, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM (
        |  SELECT unnest([date_trunc('day', ts),
        |                 date_trunc('day', ts) - INTERVAL 1 DAY]) AS ws,
        |         value
        |  FROM events)
        |GROUP BY ws ORDER BY ws""".stripMargin,
  )
}
