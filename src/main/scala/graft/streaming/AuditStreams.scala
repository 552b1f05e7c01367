package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the DQ FRESHNESS monitor (operators/
  * AuditQueries.dqFreshness): the per-feed (count, last-seen) state is
  * a plain streaming aggregation, so the monitor runs CONTINUOUSLY on
  * the live event stream instead of by scheduled batch scans — the
  * shape that turns "the feed died 4 hours ago" from a morning
  * surprise into an alert.
  *
  * Split into two stages because Structured Streaming forbids chained
  * aggregations in one query: [[freshnessState]] is the streaming
  * half (one keyed aggregation, |feed-types| rows of state, complete
  * output mode); the lag-vs-global-max + SLA readout
  * ([[freshnessReport]]) derives from the materialized state table as
  * a batch view — the state IS tiny by construction, so the readout
  * is free. AuditStreamsSpec pins streaming state ≡ the batch
  * aggregate on a drained feed, report ≡ the dq_freshness contract
  * query, and per-type monotonicity across micro-batches.
  */
object AuditStreams {

  /** Streaming half: per event_type → (n_events, last_us). Works
    * identically on a static frame (batch parity). */
  def freshnessState(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), max(col("us")).as("last_us"))

  /** Batch readout over the (tiny) materialized state: last-seen
    * formatted, integer-minute lag behind the newest feed, stale flag
    * at the given SLA. Column contract = the dq_freshness query. */
  def freshnessReport(state: DataFrame, slaMinutes: Long = 60): DataFrame = {
    val g = broadcast(state.agg(max(col("last_us")).as("g_us")))
    state.crossJoin(g)
      .select(col("event_type"), col("n_events"),
        date_format(timestamp_micros(col("last_us")),
          "yyyy-MM-dd HH:mm:ss").as("last_seen"),
        expr("(g_us - last_us) div 60000000").as("lag_min"),
        (expr("(g_us - last_us) div 60000000") > slaMinutes).as("stale"))
      .orderBy(col("event_type"))
  }
}
