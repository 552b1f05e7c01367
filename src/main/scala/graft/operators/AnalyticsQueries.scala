package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GQuery
import graft.sources.Tables

/** Composed multi-operator analytics in classic TPC-H shapes (Q3 / Q5 /
  * Q10) plus exact grouped percentiles and a partitioned ntile — the
  * "does the optimizer earn its keep on REAL query shapes" tier, on top
  * of the per-operator inventory.
  *
  * These queries deliberately declare nothing about physical strategy:
  * no broadcast hints, no repartition calls. The plans we want at
  * 100 TB — date filters pushed into the parquet scans before any join,
  * the filtered dimension broadcast when it is small and shuffled when
  * it is not (AQE decides from runtime sizes), partial aggregation
  * below every exchange — all fall out of the declarative form, and
  * AnalyticsSpec pins the load-bearing ones (pushdown + partial agg) on
  * the analyzed plans so a regression is a test failure, not a
  * production surprise.
  *
  * Money arithmetic follows the repo-wide exact-decimal discipline
  * (see aggPricingSummary): revenue terms are cast to DECIMAL(18,2)
  * BEFORE multiply/sum so the aggregate is order-independent and both
  * engines round the identical exact value — a float sum would be
  * decided by accumulation order at half-cent boundaries and diverge
  * under parallelism.
  */
object AnalyticsQueries {

  /** Exact-decimal discounted revenue term: price * (1 - discount). */
  private def revenueTerm = {
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val disc = col("l_discount").cast("decimal(18,2)")
    price * (lit(1) - disc)
  }

  private val revenueSql =
    """CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)""".stripMargin

  /** TPC-H Q3 (shipping priority): segment-filtered customers joined to
    * their not-yet-shipped order lines, top-10 orders by open revenue.
    *
    * Scale posture: both date predicates and the segment equality reach
    * the parquet scans as PushedFilters (spec-pinned); the orders side
    * of the lineitem join arrives pre-filtered to ~45% and the customer
    * side to ~20%, so AQE sizes the exchanges from the FILTERED stats.
    * The top-10 is a TakeOrderedAndProject (per-partition heap + driver
    * merge of 10-row heads), never a global sort. */
  val tpchQ3Shipping: GQuery = GQuery(
    "tpch_q3_shipping",
    s"""SELECT l_orderkey,
       |  $revenueSql AS revenue,
       |  strftime(o_orderdate, '%Y-%m-%d') AS order_day,
       |  o_orderpriority
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin) { (s, dir) =>
    val cutoff = lit("1998-06-01 00:00:00").cast("timestamp")
    Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, dir).filter(col("o_orderdate") < cutoff),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(revenueTerm), 2).cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 (local supplier volume): revenue per nation from orders
    * where the supplying supplier sits in the customer's own nation,
    * restricted to one region and a two-year order window.
    *
    * Scale posture: the join graph is declared flat and Catalyst/AQE
    * order it — region (5 rows) and nation (25) broadcast always,
    * supplier broadcasts at any realistic scale, and the residual
    * s_nationkey = c_nationkey equality rides the supplier join as a
    * non-equi conjunct rather than forcing a second shuffle. The only
    * big-big exchange is orders⋈lineitem on the natural key. */
  val tpchQ5LocalSupplier: GQuery = GQuery(
    "tpch_q5_local_supplier",
    s"""SELECT n_name, $revenueSql AS revenue
       |FROM region
       |JOIN nation ON n_regionkey = r_regionkey
       |JOIN customer ON c_nationkey = n_nationkey
       |JOIN orders ON o_custkey = c_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    Tables.region(s, dir).filter(col("r_name") === "ASIA")
      .join(Tables.nation(s, dir),
        col("n_regionkey") === col("r_regionkey"))
      .join(Tables.customer(s, dir),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >=
            lit("1997-01-01 00:00:00").cast("timestamp"))
          .filter(col("o_orderdate") <
            lit("1999-01-01 00:00:00").cast("timestamp")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(s, dir),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, dir),
        col("s_suppkey") === col("l_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(revenueTerm), 2).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q10 (returned items): top-20 customers by revenue lost to
    * returns in a half-year window, with their nation attached.
    *
    * Scale posture: the heavy work is lineitem('R')⋈orders(window) —
    * both filters pushed to the scans — then ONE shuffle to the
    * customer grain; nation broadcasts onto the 20-row-bound result
    * path. Group-by keys include the functionally-dependent customer
    * attributes so no second aggregate or join-back is needed. */
  val tpchQ10Returned: GQuery = GQuery(
    "tpch_q10_returned",
    s"""SELECT c_custkey, c_name, $revenueSql AS revenue,
       |  c_acctbal, n_name
       |FROM customer
       |JOIN nation ON n_nationkey = c_nationkey
       |JOIN orders ON o_custkey = c_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
       |GROUP BY c_custkey, c_name, c_acctbal, n_name
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.nation(s, dir),
        col("n_nationkey") === col("c_nationkey"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >=
            lit("1998-01-01 00:00:00").cast("timestamp"))
          .filter(col("o_orderdate") <
            lit("1998-07-01 00:00:00").cast("timestamp")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(round(sum(revenueTerm), 2).cast("double").as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Exact grouped percentiles (quartiles of l_quantity per return
    * flag). Hash-exactness: l_quantity holds integer-valued doubles and
    * the fractions are dyadic (1/4, 1/2, 3/4), so the linear
    * interpolation lower + (upper-lower)·f is EXACT in binary floating
    * point regardless of which algebraic form each engine uses — no
    * rounding is needed on either side.
    *
    * Scale posture: exact percentiles aggregate a per-group value
    * multiset (Spark's percentile accumulates value→count maps, so the
    * 50 distinct quantity values compress map-side); for
    * high-cardinality value domains at 100 TB switch to
    * approx_percentile (t-digest, mergeable, bounded memory) — declared
    * no-oracle like agg_approx_distinct. */
  val aggPercentiles: GQuery = GQuery(
    "agg_percentiles",
    """SELECT l_returnflag,
      |  CAST(count(*) AS BIGINT) AS n,
      |  quantile_cont(l_quantity, 0.25) AS qty_p25,
      |  quantile_cont(l_quantity, 0.50) AS qty_p50,
      |  quantile_cont(l_quantity, 0.75) AS qty_p75
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(l_quantity, 0.25d)").as("qty_p25"),
        expr("percentile(l_quantity, 0.50d)").as("qty_p50"),
        expr("percentile(l_quantity, 0.75d)").as("qty_p75"))
      .orderBy(col("l_returnflag"))
  }

  /** ntile(8) equal-height bucketing of each event type's timeline,
    * summarized per (type, tile) so the output stays small.
    *
    * Determinism: the window ordering (ts, event_id) ends in the unique
    * event_id, so tile assignment is total-order-stable across engines
    * and parallelism.
    *
    * Scale posture: the window is PARTITIONED by event_type — each
    * type's timeline sorts within its own exchange partition, so the
    * work spreads across the cluster. A GLOBAL ntile (no partition key)
    * would serialize into one task in Spark's window operator; at scale
    * that shape should be a range-partitioned sort + per-partition
    * offsets instead, which is why this contract row deliberately keys
    * the window. */
  val winNtile: GQuery = GQuery(
    "win_ntile",
    """SELECT event_type, tile,
      |  CAST(count(*) AS BIGINT) AS n,
      |  min(event_id) AS first_event, max(event_id) AS last_event,
      |  min(value) AS min_value, max(value) AS max_value
      |FROM (
      |  SELECT event_type, event_id, value,
      |    ntile(8) OVER (PARTITION BY event_type
      |                   ORDER BY ts, event_id) AS tile
      |  FROM events)
      |GROUP BY event_type, tile
      |ORDER BY event_type, tile""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_type"), col("event_id"), col("value"),
        ntile(8).over(w).as("tile"))
      .groupBy(col("event_type"), col("tile"))
      .agg(count(lit(1)).as("n"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("event_type"), col("tile"))
  }

  /** TPC-H Q14 (promotion effect), monthly rollup form: the share of
    * discounted revenue coming from PROMO parts, per ship month — the
    * campaign-effect readout. The fixture's p_type domain is exact
    * labels (PROMO, STANDARD, …), so the predicate is an equality,
    * not Q14's LIKE prefix.
    *
    * Scale posture: one lineitem⋈part equi-join on partkey (part is
    * the 100× smaller side — AQE promotes it to broadcast when it
    * fits, shuffles otherwise), conditional aggregation on the
    * DECIMAL revenue grid, ≤ |months| result rows. The share divides
    * two already-rounded 2-place decimals, re-rounded to 6 — exact
    * cross-engine. */
  val tpchQ14Promo: GQuery = GQuery(
    "tpch_q14_promo",
    """SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m-%d')
      |    AS ship_month,
      |  CAST(round(sum(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |         * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |    ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE)
      |    AS promo_revenue,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
      |    AS total_revenue,
      |  round(CAST(round(sum(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE)
      |    / CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE), 6)
      |    AS promo_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY date_trunc('month', l_shipdate)
      |ORDER BY ship_month""".stripMargin) { (s, dir) =>
    val promoTerm = when(col("p_type") === "PROMO", revenueTerm)
      .otherwise(lit(0).cast("decimal(18,2)"))
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("m"))
      .agg(round(sum(promoTerm), 2).cast("double").as("promo_revenue"),
        round(sum(revenueTerm), 2).cast("double").as("total_revenue"))
      .select(date_format(col("m"), "yyyy-MM-dd").as("ship_month"),
        col("promo_revenue"), col("total_revenue"),
        round(col("promo_revenue") / col("total_revenue"), 6)
          .as("promo_share"))
      .orderBy(col("ship_month"))
  }

  /** TPC-H Q18 (large-volume customers), top-20 ranked form: the 20
    * orders with the largest total line quantity, with their
    * customer — threshold-free so the contract row is non-empty at
    * every SF (Q18's `HAVING sum(qty) > t` is the same plan with a
    * filter before the rank).
    *
    * Scale posture: the lineitem aggregate collapses to ONE row per
    * order (map-side combining) before any join — the join input is
    * |orders|, never |lineitem|; orders and customer join on their
    * natural keys; the top-20 is a TakeOrderedAndProject heap merge,
    * never a global sort. */
  val tpchQ18LargeOrders: GQuery = GQuery(
    "tpch_q18_large_orders",
    """SELECT c_custkey, c_name, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      |  CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), 2) AS DOUBLE)
      |    AS totalprice,
      |  CAST(round(sum_qty, 2) AS DOUBLE) AS sum_qty
      |FROM (
      |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey)
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY sum_qty DESC, o_orderkey
      |LIMIT 20""".stripMargin) { (s, dir) =>
    val qty = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
    qty.join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        round(col("o_totalprice").cast("decimal(18,2)"), 2)
          .cast("double").as("totalprice"),
        round(col("sum_qty"), 2).cast("double").as("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
      .limit(20)
  }

  /** TPC-H Q6 (forecasting revenue change): the pure
    * filter-and-aggregate query — deliberately join-free, because its
    * entire value is the SCAN: all three predicates (ship-date range,
    * discount band, quantity cap) must reach the parquet reader as
    * PushedFilters so a year's slice of a 100 TB lineitem reads only
    * matching row groups; the aggregate is a 1-row map-side-combined
    * DECIMAL sum. The l_quantity/l_discount filters are
    * min/max-stat-prunable per row group; LayoutAnalyticsSpec pins
    * the pushdown. */
  val tpchQ6Forecast: GQuery = GQuery(
    "tpch_q6_forecast",
    """SELECT CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS revenue_effect
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1998-01-01 00:00:00").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1999-01-01 00:00:00").cast("timestamp"))
      .filter(col("l_discount").between(0.05, 0.07))
      .filter(col("l_quantity") < 24)
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)")
          * col("l_discount").cast("decimal(18,2)")), 2)
          .cast("double").as("revenue_effect"))
  }

  /** TPC-H Q13 (customer distribution): how many customers placed
    * 0, 1, 2, … orders — the double-aggregation + LEFT JOIN shape
    * (the outer join is the point: zero-order customers MUST appear
    * in the 0 bucket, which an inner join silently drops; the
    * fixture's comment-pattern exclusion is omitted — orders carries
    * no comment column).
    *
    * Scale posture: the first aggregate collapses orders to one row
    * per customer at the join grain (count rides the join key —
    * map-side combining); the second groups the |customers|-row
    * frame into ≤ max-orders-per-customer buckets. Both shuffles are
    * keyed; the result is a tiny histogram. */
  val tpchQ13Custdist: GQuery = GQuery(
    "tpch_q13_custdist",
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c.c_custkey,
      |    CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |  GROUP BY c.c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q7 (volume shipping): bilateral trade between two nations
    * — revenue by (supplier nation, customer nation, ship year) for
    * the NATION_3↔NATION_2 pair over a two-year window.
    *
    * Scale posture: the nation-pair disjunction lands on two
    * BROADCAST-joined 25-row dimensions, so the big
    * lineitem⋈orders⋈customer chain is filtered by broadcast hash
    * lookups, never shuffled against nation; the ship-date range is
    * pushed to the lineitem scan; the final aggregate has ≤ 2·years
    * groups. */
  val tpchQ7Volume: GQuery = GQuery(
    "tpch_q7_volume",
    s"""SELECT supp_nation, cust_nation, l_year, $revenueSql AS revenue
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |    CAST(year(l_shipdate) AS INT) AS l_year,
       |    l_extendedprice, l_discount
       |  FROM lineitem
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2')
       |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3'))
       |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, dir) =>
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >=
        lit("1996-01-01 00:00:00").cast("timestamp"))
      .filter(col("l_shipdate") <
        lit("1998-01-01 00:00:00").cast("timestamp"))
      .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
      .join(n1, col("s_nationkey") === col("sk"))
      .join(n2, col("c_nationkey") === col("ck"))
      .filter((col("supp_nation") === "NATION_3" &&
          col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" &&
          col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("int").as("l_year"))
      .agg(round(sum(revenueTerm), 2).cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8 (national market share): NATION_3 suppliers' share of
    * ASIA-region customers' revenue by order year. Both the
    * nation-share numerator and the total are exact-decimal sums;
    * the share is ONE double division of the two rounded totals
    * (the q14 promo_share discipline).
    *
    * Scale posture: region/nation dimensions broadcast; the fact
    * chain shuffles once per equi-join key; the per-year grid is
    * tiny so the share projection is free. */
  val tpchQ8MarketShare: GQuery = GQuery(
    "tpch_q8_market_share",
    """SELECT o_year,
      |  CAST(round(sum(CASE WHEN supp_nation = 'NATION_3'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |         * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |    ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE)
      |    AS nation_revenue,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
      |    AS total_revenue,
      |  round(CAST(round(sum(CASE WHEN supp_nation = 'NATION_3'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE)
      |    / CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE), 6)
      |    AS mkt_share
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |    ns.n_name AS supp_nation, l_extendedprice, l_discount
      |  FROM lineitem
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation nc ON c_nationkey = nc.n_nationkey
      |  JOIN region ON nc.n_regionkey = r_regionkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation ns ON s_nationkey = ns.n_nationkey
      |  WHERE r_name = 'ASIA')
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin) { (s, dir) =>
    val nc = Tables.nation(s, dir)
      .select(col("n_nationkey").as("ck"), col("n_regionkey"))
    val ns = Tables.nation(s, dir)
      .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
    val nationTerm = when(col("supp_nation") === "NATION_3", revenueTerm)
      .otherwise(lit(0).cast("decimal(18,2)"))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
      .join(nc, col("c_nationkey") === col("ck"))
      .join(Tables.region(s, dir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
      .join(ns, col("s_nationkey") === col("sk"))
      .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(round(sum(nationTerm), 2).cast("double").as("nation_revenue"),
        round(sum(revenueTerm), 2).cast("double").as("total_revenue"))
      .select(col("o_year"), col("nation_revenue"), col("total_revenue"),
        round(col("nation_revenue") / col("total_revenue"), 6)
          .as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q17 (small-quantity-order revenue), per-brand form: the
    * revenue sitting in lineitems whose quantity is below half the
    * part's average quantity — the "low-velocity inventory" readout.
    * The per-part average is exact (decimal quantity sum / bigint
    * count, divided once as doubles), so the < comparison lands
    * identically cross-engine.
    *
    * Scale posture: the per-part average is a map-side-combining
    * aggregate over lineitem re-joined on l_partkey (partkey-keyed
    * shuffle, no window); brand rollup is a 25-row grid. Classic Q17
    * restricts to one brand+container and divides by 7; keeping
    * every brand makes the contract row non-empty at every SF. */
  val tpchQ17SmallQty: GQuery = GQuery(
    "tpch_q17_small_qty",
    """SELECT p_brand,
      |  CAST(count(*) AS BIGINT) AS n_small_lines,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
      |    AS DOUBLE) AS small_qty_revenue
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN (
      |  SELECT l_partkey AS ap,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |      / CAST(count(*) AS DOUBLE) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey) a ON a.ap = l_partkey
      |WHERE l_quantity < 0.5 * avg_qty
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val avgQty = li.groupBy(col("l_partkey").as("ap"))
      .agg((sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
        count(lit(1)).cast("double")).as("avg_qty"))
    li.join(Tables.part(s, dir), col("p_partkey") === col("l_partkey"))
      .join(avgQty, col("ap") === col("l_partkey"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_small_lines"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)
          .cast("double").as("small_qty_revenue"))
      .orderBy(col("p_brand"))
  }

  /** TPC-H Q22 (global sales opportunity), fixture-adapted: customers
    * with above-average positive account balance and LOW purchasing
    * activity (< 8 orders — the fixture generator gives every
    * customer orders, ~10 at the median, so the literal NOT EXISTS
    * is empty at every SF; a below-median activity cut keeps Q22's
    * "high balance, underserved" semantics non-empty), grouped by a
    * synthetic country code (c_custkey % 10 — no phone column). The
    * threshold is ONE double division of an exact decimal sum by an
    * exact count (identical cross-engine).
    *
    * Scale posture: the threshold is a 1-row broadcast; the order
    * counts collapse map-side to one row per customer before the
    * custkey-keyed join; the rollup grid is 10 rows. */
  val tpchQ22Balance: GQuery = GQuery(
    "tpch_q22_balance",
    """WITH thr AS (
      |  SELECT CAST(sum(CAST(round(c_acctbal, 2) AS DECIMAL(12,2)))
      |      AS DOUBLE) / CAST(count(*) AS DOUBLE) AS t
      |  FROM customer WHERE c_acctbal > 0.00),
      |ocnt AS (SELECT o_custkey, count(*) AS n_orders FROM orders
      |         GROUP BY o_custkey),
      |hot AS (
      |  SELECT c_custkey % 10 AS cntrycode,
      |    CAST(round(c_acctbal, 2) AS DECIMAL(12,2)) AS bal
      |  FROM customer
      |  LEFT JOIN ocnt ON o_custkey = c_custkey
      |  CROSS JOIN thr
      |  WHERE c_acctbal > thr.t AND coalesce(n_orders, 0) < 8)
      |SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(round(sum(bal), 2) AS DOUBLE) AS totacctbal
      |FROM hot
      |GROUP BY cntrycode
      |ORDER BY cntrycode""".stripMargin) { (s, dir) =>
    val cust = Tables.customer(s, dir)
    val thr = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(round(col("c_acctbal"), 2).cast("decimal(12,2)"))
        .cast("double") / count(lit(1)).cast("double")).as("t"))
    val ocnt = Tables.orders(s, dir).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    cust.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("t"))
      .join(ocnt, col("o_custkey") === col("c_custkey"), "left_outer")
      .filter(coalesce(col("n_orders"), lit(0L)) < 8)
      .select((col("c_custkey") % 10).as("cntrycode"),
        round(col("c_acctbal"), 2).cast("decimal(12,2)").as("bal"))
      .groupBy(col("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("bal")), 2).cast("double").as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  /** TPC-H Q4 (order priority checking), fixture-adapted: orders in a
    * half-year window counted per priority when at least one of their
    * lineitems shipped more than 90 days after the order date (the
    * fixture has no commit/receipt dates, so "late" is
    * ship-lag > 90 d). The EXISTS is a left-semi join — one probe of
    * the late-line key set per order, never a row multiplication.
    *
    * Scale posture: the order-window and the lag predicate both push
    * to their scans; the semi join shuffles on orderkey; the rollup
    * grid is 5 rows. */
  val tpchQ4Priority: GQuery = GQuery(
    "tpch_q4_priority",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val orders = Tables.orders(s, dir)
      .filter(col("o_orderdate") >=
        lit("1997-01-01 00:00:00").cast("timestamp"))
      .filter(col("o_orderdate") <
        lit("1997-07-01 00:00:00").cast("timestamp"))
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
    orders.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q9 (product-type profit), fixture-adapted: profit per
    * (supplier nation, order year), with p_retailprice standing in
    * for the missing ps_supplycost — amount = discounted revenue −
    * retailprice·quantity, every term on the exact DECIMAL(18,2)
    * grid so the signed sum is order-free.
    *
    * Scale posture: part/supplier/nation broadcast (or hash on key at
    * true scale); lineitem⋈orders is the only big-big exchange; the
    * rollup grid is nations × years. */
  val tpchQ9Profit: GQuery = GQuery(
    "tpch_q9_profit",
    """SELECT n_name AS nation,
      |  CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |      - CAST(p_retailprice AS DECIMAL(18,2))
      |      * CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS sum_profit
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |JOIN orders ON o_orderkey = l_orderkey
      |GROUP BY n_name, CAST(year(o_orderdate) AS INT)
      |ORDER BY nation, o_year""".stripMargin) { (s, dir) =>
    val profitTerm =
      col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)")) -
      col("p_retailprice").cast("decimal(18,2)") *
        col("l_quantity").cast("decimal(18,2)")
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("p_partkey") === col("l_partkey"))
      .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.nation(s, dir), col("n_nationkey") === col("s_nationkey"))
      .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(round(sum(profitTerm), 2).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year"))
  }

  /** TPC-H Q15 (top supplier): revenue per supplier over one quarter,
    * returning the supplier(s) whose revenue equals the maximum — the
    * view + scalar-subquery shape. Exact decimal revenue makes the
    * max and its equality tie-out deterministic cross-engine.
    *
    * Scale posture: one supplier-keyed aggregate over the
    * date-filtered lineitem scan; the max is a 1-row broadcast joined
    * back — no window, no sort of the full aggregate. */
  val tpchQ15TopSupplier: GQuery = GQuery(
    "tpch_q15_top_supplier",
    """WITH rev AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
      |      AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN rev ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >=
        lit("1997-01-01 00:00:00").cast("timestamp"))
      .filter(col("l_shipdate") <
        lit("1997-04-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(round(sum(revenueTerm), 2).cast("double").as("total_revenue"))
    val top = rev.agg(max(col("total_revenue")).as("mx"))
    Tables.supplier(s, dir)
      .join(rev, col("s_suppkey") === col("supplier_no"))
      .crossJoin(broadcast(top))
      .filter(col("total_revenue") === col("mx"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q16 (parts/supplier relationship), fixture-adapted:
    * distinct suppliers able to supply each (p_type, p_size) combo —
    * supply relationships read from lineitem (no partsupp table) —
    * excluding the PROMO type and restricted to the classic size
    * list. The NOT-IN-types + IN-sizes filters and the
    * count(DISTINCT) over a join are exactly Q16's plan shape.
    *
    * Scale posture: the (partkey, suppkey) projection de-dups
    * map-side before the part join; the distinct count shuffles once
    * on the small (type, size) grid. */
  val tpchQ16SupplierCnt: GQuery = GQuery(
    "tpch_q16_supplier_cnt",
    """SELECT p_type, p_size,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      |GROUP BY p_type, p_size
      |ORDER BY supplier_cnt DESC, p_type, p_size""".stripMargin) { (s, dir) =>
    val ps = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    ps.join(Tables.part(s, dir)
          .filter(col("p_type") =!= "PROMO")
          .filter(col("p_size").isin(1, 4, 9, 16, 25, 36, 49)),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_type"), col("p_size"))
  }

  /** TPC-H Q2 (minimum-cost supplier), fixture-adapted: with no
    * partsupp table, the supply relation is read from lineitem — a
    * supplier's cost for a part is the MIN exact-decimal extended
    * price it ever shipped that part at. For STANDARD parts in the
    * classic size list, return every EUROPE supplier matching the
    * per-part regional minimum — Q2's correlated-min shape as a
    * grouped min joined back on equality (exact decimals make the
    * equality tie-out deterministic cross-engine).
    *
    * Scale posture: supply collapses map-side to one row per
    * (part, supplier) before anything joins; the regional minimum is
    * a second map-side-combining aggregate on partkey; part arrives
    * pre-filtered by type+size. No window, no correlated re-scan —
    * both "subqueries" are aggregates the optimizer can pipeline. */
  val tpchQ2MinCost: GQuery = GQuery(
    "tpch_q2_min_cost",
    """WITH supply AS (
      |  SELECT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey,
      |         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS ucost
      |  FROM lineitem GROUP BY l_partkey, l_suppkey),
      |eu AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON n_nationkey = s_nationkey
      |  JOIN region ON r_regionkey = n_regionkey
      |  WHERE r_name = 'EUROPE'),
      |best AS (
      |  SELECT sp_partkey AS bp, min(ucost) AS best_cost
      |  FROM supply JOIN eu ON s_suppkey = sp_suppkey
      |  GROUP BY sp_partkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
      |  CAST(ucost AS DOUBLE) AS supply_cost
      |FROM part
      |JOIN supply ON sp_partkey = p_partkey
      |JOIN eu ON s_suppkey = sp_suppkey
      |JOIN best ON bp = p_partkey AND ucost = best_cost
      |WHERE p_type = 'STANDARD' AND p_size IN (10, 20, 30, 40, 50)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin) {
      (s, dir) =>
    val supply = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("sp_partkey"),
        col("l_suppkey").as("sp_suppkey"))
      .agg(min(col("l_extendedprice").cast("decimal(18,2)")).as("ucost"))
    val eu = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), col("n_nationkey") === col("s_nationkey"))
      .join(Tables.region(s, dir), col("r_regionkey") === col("n_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    val euSupply = supply.join(eu, col("s_suppkey") === col("sp_suppkey"))
    val best = euSupply.groupBy(col("sp_partkey").as("bp"))
      .agg(min(col("ucost")).as("best_cost"))
    Tables.part(s, dir)
      .filter(col("p_type") === "STANDARD")
      .filter(col("p_size").isin(10, 20, 30, 40, 50))
      .join(euSupply, col("sp_partkey") === col("p_partkey"))
      .join(best,
        col("bp") === col("p_partkey") && col("ucost") === col("best_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"),
        col("ucost").cast("double").as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
  }

  /** TPC-H Q11 (important stock), fixture-adapted: per-part supplied
    * value (exact-decimal Σ extendedprice, no partsupp so lineitem is
    * the supply ledger) from ASIA-region suppliers, keeping parts
    * whose value exceeds 0.1% of the regional total — the group-agg ×
    * global-scalar-threshold shape. Both sides of the compare leave
    * the exact decimal grid through ONE double cast, so the boundary
    * is decided identically cross-engine; the relative threshold also
    * keeps the selectivity stable as the fixture scales.
    *
    * Scale posture: one partkey-keyed aggregate (map-side partials);
    * the total is a 1-row broadcast; no second pass over lineitem. */
  val tpchQ11ImportantStock: GQuery = GQuery(
    "tpch_q11_important_stock",
    """WITH v AS (
      |  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
      |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation ON n_nationkey = s_nationkey
      |  JOIN region ON r_regionkey = n_regionkey
      |  WHERE r_name = 'ASIA'
      |  GROUP BY l_partkey)
      |SELECT l_partkey AS p_partkey, CAST(val AS DOUBLE) AS part_value
      |FROM v CROSS JOIN
      |  (SELECT CAST(sum(val) AS DOUBLE) * 0.001 AS thr FROM v) t
      |WHERE CAST(val AS DOUBLE) > thr
      |ORDER BY part_value DESC, p_partkey""".stripMargin) { (s, dir) =>
    val v = Tables.lineitem(s, dir)
      .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.nation(s, dir), col("n_nationkey") === col("s_nationkey"))
      .join(Tables.region(s, dir), col("r_regionkey") === col("n_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("val"))
    val thr = v.agg((sum(col("val")).cast("double") * 0.001).as("thr"))
    v.crossJoin(broadcast(thr))
      .filter(col("val").cast("double") > col("thr"))
      .select(col("l_partkey").as("p_partkey"),
        col("val").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
  }

  /** TPC-H Q12 (shipping modes / priority), fixture-adapted: lines
    * that shipped more than 90 days after their order date (the
    * lateness proxy — no commit/receipt dates) within one shipping
    * year, bucketed by l_linestatus (standing in for the absent
    * l_shipmode), counting urgent-or-high vs lower-priority orders —
    * Q12's conditional-CASE aggregation shape intact.
    *
    * Scale posture: the shipdate window pushes to the lineitem scan;
    * one orderkey join, one 2-row aggregate with map-side partials. */
  val tpchQ12ShipClass: GQuery = GQuery(
    "tpch_q12_ship_class",
    """SELECT l_linestatus AS ship_class,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_linestatus
      |ORDER BY ship_class""".stripMargin) { (s, dir) =>
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >=
        lit("1997-01-01 00:00:00").cast("timestamp"))
      .filter(col("l_shipdate") <
        lit("1998-01-01 00:00:00").cast("timestamp"))
      .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 90 DAY"))
      .groupBy(col("l_linestatus").as("ship_class"))
      .agg(sum(when(isHigh, 1).otherwise(0)).cast("bigint")
          .as("high_line_count"),
        sum(when(isHigh, 0).otherwise(1)).cast("bigint")
          .as("low_line_count"))
      .orderBy(col("ship_class"))
  }

  /** TPC-H Q19 (discounted revenue, disjunctive predicates): revenue
    * from lines matching any of three brand × size-range ×
    * quantity-range combos — the one TPC-H query whose plan quality
    * hinges on pushing an OR-of-ANDs below the join. The part-side
    * conjuncts (brand, size) and the lineitem-side quantity bounds
    * each partially push as a derived OR filter on their own scan.
    *
    * Scale posture: single equi-join; the optimizer extracts the
    * common `p_size >= 1` / quantity envelope to both scans and the
    * residual disjunction evaluates post-join in codegen — no plan
    * branch per disjunct, no union of three scans. */
  val tpchQ19BrandRevenue: GQuery = GQuery(
    "tpch_q19_brand_revenue",
    s"""SELECT $revenueSql AS revenue
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       |    AND l_quantity BETWEEN 1 AND 20)
       |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       |    AND l_quantity BETWEEN 10 AND 30)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       |    AND l_quantity BETWEEN 20 AND 40)""".stripMargin) { (s, dir) =>
    val combo =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10, 30)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
        col("l_quantity").between(20, 40))
    Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("p_partkey") === col("l_partkey"))
      .filter(combo)
      .agg(round(sum(revenueTerm), 2).cast("double").as("revenue"))
  }

  /** TPC-H Q20 (potential part promotion), fixture-adapted: suppliers
    * who moved serious volume of 'red' parts in 1997 — more than 60
    * units of some single red part (the HAVING stands in for the
    * ps_availqty half-stock test; no partsupp table). Q20's nested
    * IN-subquery chain becomes a grouped HAVING feeding a left-semi
    * probe of the supplier dim.
    *
    * Scale posture: the name LIKE and date window push to the scans;
    * volume collapses map-side to one row per (supplier, part); the
    * final IN is a semi join against a ≤|supplier| key set. Account
    * balances pass through as stored doubles — no re-rounding. */
  val tpchQ20PotentialSupplier: GQuery = GQuery(
    "tpch_q20_potential_supplier",
    """WITH heavy AS (
      |  SELECT l_suppkey FROM lineitem
      |  JOIN part ON p_partkey = l_partkey
      |  WHERE p_name LIKE 'red%'
      |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY l_suppkey, l_partkey
      |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 60)
      |SELECT s_name, s_acctbal, n_name
      |FROM supplier JOIN nation ON n_nationkey = s_nationkey
      |WHERE s_suppkey IN (SELECT l_suppkey FROM heavy)
      |ORDER BY s_name""".stripMargin) { (s, dir) =>
    val heavy = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >=
        lit("1997-01-01 00:00:00").cast("timestamp"))
      .filter(col("l_shipdate") <
        lit("1998-01-01 00:00:00").cast("timestamp"))
      .join(Tables.part(s, dir).filter(col("p_name").like("red%")),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("vol"))
      .filter(col("vol") > 60)
      .select(col("l_suppkey"))
    Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), col("n_nationkey") === col("s_nationkey"))
      .join(heavy, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"), col("n_name"))
      .orderBy(col("s_name"))
  }

  /** TPC-H Q21 (suppliers who kept orders waiting), fixture-adapted:
    * ASIA-region suppliers whose line shipped >180 days after the
    * order date on a multi-supplier order where they were the ONLY
    * late supplier — Q21's EXISTS(other supplier) + NOT EXISTS(other
    * LATE supplier) double correlation, as a left-semi then left-anti
    * join on (same order, different supplier).
    *
    * Scale posture: both correlations key on orderkey (shuffle once,
    * probe twice); the (order, supplier) pair sets are DISTINCT
    * projections that collapse map-side; numwait is a supplier-grain
    * aggregate over a ≤|supplier| grid. */
  val tpchQ21WaitingSupplier: GQuery = GQuery(
    "tpch_q21_waiting_supplier",
    """WITH pairs AS (
      |  SELECT DISTINCT l_orderkey AS p_ok, l_suppkey AS p_sk
      |  FROM lineitem),
      |late AS (
      |  SELECT DISTINCT l_orderkey AS lt_ok, l_suppkey AS lt_sk
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |  WHERE l_shipdate > o_orderdate + INTERVAL 180 DAY)
      |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM late l1
      |JOIN supplier ON s_suppkey = lt_sk
      |JOIN nation ON n_nationkey = s_nationkey
      |JOIN region ON r_regionkey = n_regionkey
      |WHERE r_name = 'ASIA'
      |  AND EXISTS (SELECT 1 FROM pairs
      |              WHERE p_ok = l1.lt_ok AND p_sk <> l1.lt_sk)
      |  AND NOT EXISTS (SELECT 1 FROM late l2
      |                  WHERE l2.lt_ok = l1.lt_ok AND l2.lt_sk <> l1.lt_sk)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin) { (s, dir) =>
    val pairs = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("p_ok"), col("l_suppkey").as("p_sk"))
      .distinct()
    val late = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 180 DAY"))
      .select(col("l_orderkey").as("lt_ok"), col("l_suppkey").as("lt_sk"))
      .distinct()
    val lateOther = late
      .select(col("lt_ok").as("o_ok"), col("lt_sk").as("o_sk"))
    late
      .join(Tables.supplier(s, dir), col("s_suppkey") === col("lt_sk"))
      .join(Tables.nation(s, dir), col("n_nationkey") === col("s_nationkey"))
      .join(Tables.region(s, dir), col("r_regionkey") === col("n_regionkey"))
      .filter(col("r_name") === "ASIA")
      .join(pairs,
        col("p_ok") === col("lt_ok") && col("p_sk") =!= col("lt_sk"),
        "left_semi")
      .join(lateOther,
        col("o_ok") === col("lt_ok") && col("o_sk") =!= col("lt_sk"),
        "left_anti")
      .groupBy(col("s_name"))
      .agg(count(lit(1)).cast("bigint").as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  val all: Seq[GQuery] = Seq(
    tpchQ3Shipping, tpchQ5LocalSupplier, tpchQ10Returned,
    aggPercentiles, winNtile, tpchQ14Promo, tpchQ18LargeOrders,
    tpchQ6Forecast, tpchQ13Custdist, tpchQ7Volume, tpchQ8MarketShare,
    tpchQ17SmallQty, tpchQ22Balance, tpchQ4Priority, tpchQ9Profit,
    tpchQ15TopSupplier, tpchQ16SupplierCnt, tpchQ2MinCost,
    tpchQ11ImportantStock, tpchQ12ShipClass, tpchQ19BrandRevenue,
    tpchQ20PotentialSupplier, tpchQ21WaitingSupplier)
}
