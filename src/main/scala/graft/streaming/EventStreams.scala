package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event-time queries in
  * graft.operators.EventQueries (SURVEY.md §2.9). Each transform takes
  * any events-shaped frame (batch OR streaming: same DataFrame API) so
  * EventStreamsSpec can assert batch ≡ streaming on the same finite
  * input via MemoryStream.
  *
  * Watermarks bound the state store: a 1-hour watermark means window
  * state older than (max event time − 1 h) is finalized and evicted —
  * the property that makes these queries runnable forever on an
  * unbounded 100 TB/day stream. Output mode is Append: a window emits
  * exactly once, when the watermark passes its end.
  */
object EventStreams {

  /** 1-day tumbling counts+sums per event type. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** 1-day windows sliding every 6 hours. */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day", "6 hours").as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Per-user sessions with a 30-minute inactivity gap — the native
    * streaming form of the batch gaps-and-islands query. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("win"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("win.start").as("session_start"),
        col("win.end").as("session_end"), col("n_events"))

  /** Drop duplicate event ids with watermark-bounded dedup state. */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user lifetime stats via explicit keyed state
    * (`flatMapGroupsWithState`) — the custom-state escape hatch for
    * semantics no built-in window covers. State per key is one
    * (count, sum) pair, so a billion users is a billion tiny state
    * entries in the state store, updated incrementally per batch. */
  case class UserStats(user_id: Long, n_events: Long, total_value: Double)

  def runningUserStats[E](events: Dataset[E], uid: E => Long,
      value: E => Double): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(uid)
      .flatMapGroupsWithState[(Long, Double), UserStats](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[E], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0
          var s = s0
          rows.foreach { e => n += 1; s += value(e) }
          state.update((n, s))
          Iterator(UserStats(user, n, s))
      }
  }
}
