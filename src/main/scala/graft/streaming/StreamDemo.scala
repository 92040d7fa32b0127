package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming shapes (SURVEY §2.10 is batch-only; these are
  * the EXT streaming ports). The transformations are defined once over
  * DataFrames/Datasets, so the same code runs in batch and behind a
  * `readStream` source — the streaming tests drive them through
  * MemoryStream and compare against the batch evaluation.
  */
object StreamDemo {

  final case class Event(ts: java.sql.Timestamp, eventType: String, value: Double)
  final case class UserEvent(userId: Long, n: Long)

  /** Watermarked tumbling-window aggregation — identical plan shape in
    * batch and streaming (incremental state store aside). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("eventType"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("ws"), col("eventType"), col("n"),
        col("sum_value"))

  /** Streaming exact dedup — the training-data dedup shape on a live
    * stream. dropDuplicatesWithinWatermark keeps per-key state only
    * until the watermark passes, so state is bounded (a plain streaming
    * dropDuplicates grows forever at 100 TB/day). */
  def dedupStream(events: DataFrame, idCol: String): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(idCol)

  /** Arbitrary stateful processing: running per-user event counts via
    * mapGroupsWithState — the custom-state primitive (the scale story:
    * state is partitioned by key in the state store, updates are
    * incremental per micro-batch). */
  def runningCounts(events: Dataset[(Long, Double)]): Dataset[UserEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Double)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          UserEvent(userId, n)
      }
  }
}
