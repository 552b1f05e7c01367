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

  val all: Seq[GQuery] = Seq(typedAggDataset)
}
