package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.GQuery
import graft.sources.Tables

/** The typed `Dataset[T]` surface (SURVEY.md §2.10): case-class rows
  * through `as[T]`, `groupByKey`, and a custom typed [[Aggregator]] —
  * the compile-time-safe API for pipeline stages whose logic is
  * awkward as Column expressions (here deliberately simple so the
  * oracle stays SQL-expressible).
  *
  * Honest trade, documented for the 100 TB reader: `groupByKey(f)`
  * grouping keys and Aggregator lambdas are OPAQUE to Catalyst — no
  * predicate pushdown through `f`, no whole-stage codegen inside the
  * reduce — so the relational `groupBy` stays the default for hot
  * aggregates (every other contract query uses it). What the typed
  * path KEEPS is the scale shape that matters: partial aggregation
  * (reduce runs map-side before the shuffle, merge after — the
  * Aggregator contract), so a hot key still combines before it moves.
  * All aggregate state here is exact integers — no accumulation-order
  * sensitivity.
  */
object TypedQueries {

  case class OrderRow(o_orderkey: Long, o_custkey: Long,
      o_orderpriority: String)

  /** (count, min key) in one pass — exact longs, mergeable. */
  private val keyStats =
    new Aggregator[OrderRow, (Long, Long), (Long, Long)] {
      def zero: (Long, Long) = (0L, Long.MaxValue)
      def reduce(b: (Long, Long), a: OrderRow): (Long, Long) =
        (b._1 + 1, math.min(b._2, a.o_orderkey))
      def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
        (x._1 + y._1, math.min(x._2, y._2))
      def finish(r: (Long, Long)): (Long, Long) = r
      def bufferEncoder: Encoder[(Long, Long)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      def outputEncoder: Encoder[(Long, Long)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    }

  /** Orders per priority with the first order key, computed through
    * the typed API end to end: `as[OrderRow]` → `groupByKey` → custom
    * Aggregator → typed `map` to the result shape. Must equal the
    * plain relational GROUP BY (the oracle). */
  val typedAggDataset: GQuery = GQuery(
    "typed_agg_dataset",
    """SELECT o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(min(o_orderkey) AS BIGINT) AS first_key
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      .as[OrderRow]
      .groupByKey(_.o_orderpriority)
      .agg(keyStats.toColumn)
      .map { case (priority, (n, firstKey)) => (priority, n, firstKey) }
      .toDF("o_orderpriority", "n_orders", "first_key")
      .orderBy(col("o_orderpriority"))
  }

  case class EvRow(event_id: Long, user_id: Long, tsec: Long)

  /** Per-user SESSION RECONSTRUCTION through `mapGroups` — the second
    * typed surface next to the Aggregator row: imperative per-group
    * logic (a sorted walk splitting sessions at 30-minute gaps, the
    * ev_session semantics) that is natural as Scala and awkward as
    * Column algebra; the oracle is the relational gaps-and-islands
    * spelling, so the typed walk must equal the window-function form
    * exactly. Timestamps are pre-floored to epoch SECONDS in the
    * relational projection (both engines' date_diff('second')
    * semantics), so the Scala comparison is integer-exact.
    *
    * Honest trade (the typedAggDataset scaladoc applies, plus one
    * more): unlike an Aggregator, `mapGroups` has NO map-side partial
    * — every row of a group crosses the shuffle raw, and the group's
    * rows materialize in memory at once. Right for bounded per-user
    * event lists (sessions, funnels); wrong for unbounded groups —
    * which is exactly why the streaming twins use
    * flatMapGroupsWithState (incremental state) instead. */
  val typedMapGroups: GQuery = GQuery(
    "typed_map_groups",
    """WITH e AS (
      |  SELECT user_id, event_id,
      |    date_diff('second', TIMESTAMP '1970-01-01', ts) AS tsec
      |  FROM events),
      |b AS (
      |  SELECT user_id, tsec, event_id,
      |    CASE WHEN lag(tsec) OVER w IS NULL
      |         OR tsec - lag(tsec) OVER w > 1800
      |         THEN 1 ELSE 0 END AS brk
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)),
      |s AS (
      |  SELECT user_id,
      |    sum(brk) OVER (PARTITION BY user_id
      |      ORDER BY tsec, event_id ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS sid
      |  FROM b),
      |g AS (SELECT user_id, sid, count(*) AS n FROM s GROUP BY 1, 2)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
      |  CAST(max(n) AS BIGINT) AS longest_session_events,
      |  CAST(sum(n) AS BIGINT) AS total_events
      |FROM g GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("tsec"))
      .as[EvRow]
      .groupByKey(_.user_id)
      .mapGroups { (user, rows) =>
        val sorted = rows.toSeq.sortBy(e => (e.tsec, e.event_id))
        var nSessions = 0L
        var longest = 0L
        var cur = 0L
        var prev = Long.MinValue
        sorted.foreach { e =>
          if (prev == Long.MinValue || e.tsec - prev > 1800) {
            nSessions += 1
            longest = math.max(longest, cur)
            cur = 0L
          }
          cur += 1
          prev = e.tsec
        }
        longest = math.max(longest, cur)
        (user, nSessions, longest, sorted.size.toLong)
      }
      .toDF("user_id", "n_sessions", "longest_session_events",
        "total_events")
      .orderBy(col("user_id"))
  }

  val all: Seq[GQuery] = Seq(typedAggDataset, typedMapGroups)
}
