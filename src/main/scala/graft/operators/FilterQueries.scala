package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GQuery
import graft.sources.Tables

/** Projection / filter / predicates (SURVEY.md §2.2).
  *
  * Scale notes: all predicates here are sargable (no UDFs, no casts on
  * the filtered column), so Catalyst pushes them into the parquet scan
  * as PushedFilters — at 100 TB they prune row groups via min/max
  * statistics before any decoding happens.
  */
object FilterQueries {

  /** Derived arithmetic columns over lineitem (net price / charge).
    * No per-row round: the raw IEEE product is bit-identical across
    * engines for the same expression tree, whereas round() at the cent
    * boundary is not (Spark BigDecimal HALF_UP vs DuckDB double round —
    * observed 19570.82 vs 19570.81). Sort key is the verified unique
    * lineitem 4-key (FIXTURES: (orderkey, linenumber) alone has dups). */
  val projectArith: GQuery = GQuery(
    "project_arith",
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  l_extendedprice * (1 - l_discount) AS net_price,
      |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_extendedprice""".stripMargin) {
    (s, dir) =>
      Tables.lineitem(s, dir)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_extendedprice"))
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("net_price"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).as("charge"))
  }

  /** Compound predicate (TPC-H Q6 shape): date range AND discount
    * between AND quantity below threshold. */
  val filterPred: GQuery = GQuery(
    "filter_pred",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
      |  l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_extendedprice""".stripMargin) {
    (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp")
          && col("l_discount").between(0.03, 0.07)
          && col("l_quantity") < 24)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_extendedprice"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"), col("l_extendedprice"))
  }

  /** IN-list + IS NULL-safe semantics on o_orderpriority. */
  val filterInNull: GQuery = GQuery(
    "filter_in_null",
    """SELECT o_orderkey, o_orderpriority, o_orderstatus
      |FROM orders
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |   OR o_orderpriority IS NULL
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        || col("o_orderpriority").isNull)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
  }

  /** Correlated SCALAR subqueries through Catalyst decorrelation
    * (the EXISTS twin lives in ReshapeQueries): orders costing more
    * than twice their customer's average order. Also exercises the
    * `spark.sql` entry point over a registered view — the same
    * LogicalPlan surface the DataFrame bindings produce. The compare
    * is spelled multiplied-out on exact decimals (price·n > 2·sum) so
    * no engine ever divides: averages of doubles are accumulation-
    * order-dependent and a boundary-equal row would flip the hash. */
  val filterScalarSubquery: GQuery = GQuery(
    "filter_scalar_subquery",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE CAST(o_totalprice AS DECIMAL(18,2))
      |    * (SELECT count(*) FROM orders o2
      |       WHERE o2.o_custkey = o.o_custkey)
      |  > 2 * (SELECT sum(CAST(o2.o_totalprice AS DECIMAL(18,2)))
      |         FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).createOrReplaceTempView("orders_ssq")
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders_ssq o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2))
        |    * (SELECT count(*) FROM orders_ssq o2
        |       WHERE o2.o_custkey = o.o_custkey)
        |  > 2 * (SELECT sum(CAST(o2.o_totalprice AS DECIMAL(18,2)))
        |         FROM orders_ssq o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val all: Seq[GQuery] =
    Seq(projectArith, filterPred, filterInNull, filterScalarSubquery)
}
