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

  /** Gap-filled per-user daily resample — the time-series op Spark has
    * no built-in for (Flink/ksql interpolation, Pandas `resample`):
    * every (user, day) cell of the first week of Jan 2024 exists in the
    * output, zero-filled where no events landed. The dense grid comes
    * from a map-side `explode(sequence(...))` over the DISTINCT-user
    * frame (|users| × days rows, never |events| × days); actual daily
    * aggregates join onto it keyed by (user, day). Low-cardinality
    * users here; at 100 TB the grid frame stays dim-sized while the
    * fact aggregates first. */
  private val ev4Resample: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    val days = ev.select(col("user_id")).distinct()
      .select(col("user_id"), explode(sequence(
        to_timestamp(lit("2024-01-01")), to_timestamp(lit("2024-01-07")),
        expr("INTERVAL 1 DAY"))).as("day"))
    val actual = ev
      .filter(col("ts") >= to_timestamp(lit("2024-01-01")) &&
        col("ts") < to_timestamp(lit("2024-01-08")))
      .groupBy(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
    days.join(actual, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy(col("user_id"), col("day"))
  }

  val queries: Map[String, Q] = Map(
    "ev1_tumbling" -> ev1Tumbling,
    "ev2_session" -> ev2Session,
    "ev3_sliding" -> ev3Sliding,
    "ev4_resample" -> ev4Resample,
  )

  val oracles: Map[String, String] = Map(
    "ev4_resample" ->
      """WITH grid AS (
        |  SELECT u.user_id, d.day
        |  FROM (SELECT DISTINCT user_id FROM events) u
        |  CROSS JOIN (SELECT unnest(generate_series(
        |    TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-07',
        |    INTERVAL 1 DAY)) AS day) d),
        |actual AS (
        |  SELECT user_id, date_trunc('day', ts) AS day,
        |    count(*) AS n, round(sum(value), 4) AS sum_value
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY user_id, day)
        |SELECT g.user_id, g.day,
        |  coalesce(a.n, 0)::BIGINT AS n,
        |  coalesce(a.sum_value, 0.0) AS sum_value
        |FROM grid g LEFT JOIN actual a USING (user_id, day)
        |ORDER BY user_id, day""".stripMargin,
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
