package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GQuery
import graft.sources.Tables
import graft.Ckpt.CkptOps

/** Aggregation family (SURVEY.md §2.4).
  *
  * Scale notes: every query here is a single hash-aggregate over a
  * parquet scan — Spark plans partial (map-side) + final aggregation
  * automatically, so the shuffle carries only group keys × partial
  * states, never raw rows. Group-key cardinality is tiny (≤ hundreds),
  * so at 100 TB the shuffle stays KB-sized per partition and the scan
  * dominates; filters below are sargable and reach the parquet reader
  * as PushedFilters.
  */
object AggQueries {

  /** TPC-H Q1 shape: pricing summary by returnflag × linestatus.
    *
    * The discounted/charged sums use exact decimal arithmetic: the money
    * columns are 2-decimal-exact doubles (verified in FIXTURES), so
    * their products are exact 4/6-decimal numbers whose sums can land
    * EXACTLY on a half-cent boundary — there round(float-sum, 2) is
    * decided by summation-order noise and diverges across engines.
    * Decimal sums are order-independent and both engines round exact
    * decimals half-up (verified), so the result is stable at any scale
    * and parallelism. */
  val aggPricingSummary: GQuery = GQuery(
    "agg_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2)      AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
      |    AS sum_disc_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |    * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
      |  round(avg(l_quantity), 2)      AS avg_qty,
      |  round(avg(l_extendedprice), 2) AS avg_price,
      |  round(avg(l_discount), 4)      AS avg_disc,
      |  count(*)                       AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val disc = col("l_discount").cast("decimal(18,2)")
    val tax = col("l_tax").cast("decimal(18,2)")
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(price * (lit(1) - disc)), 2).cast("double")
          .as("sum_disc_price"),
        round(sum(price * (lit(1) - disc) * (lit(1) + tax)), 2)
          .cast("double").as("sum_charge"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Exact distinct counts per group (expand-based, shuffle on
    * (group, distinct-key) pairs — at scale prefer approx below unless
    * exactness is contractual). */
  val aggDistinct: GQuery = GQuery(
    "agg_distinct",
    """SELECT l_returnflag,
      |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy(col("l_returnflag"))
  }

  /** HLL++ approximate distinct users per event type. no-oracle: sketch
    * estimates differ engine-to-engine; bounded-error vs exact is
    * asserted in AggSpec instead. At 100 TB this is THE distinct-count
    * operator: fixed-size sketch state, single shuffle of sketches. */
  val aggApproxDistinct: GQuery = GQuery.noOracle("agg_approx_distinct") {
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy(col("event_type"))
  }

  /** ROLLUP over (nation, order year) with grouping flags exposed so the
    * subtotal rows order deterministically cross-engine. */
  val aggRollup: GQuery = GQuery(
    "agg_rollup",
    """SELECT CAST(GROUPING(n_name) AS INT) AS g_nation,
      |  CAST(GROUPING(order_year) AS INT) AS g_year,
      |  n_name, order_year,
      |  round(sum(o_totalprice), 2) AS total_sales,
      |  count(*) AS n_orders
      |FROM (
      |  SELECT n_name, CAST(year(o_orderdate) AS INT) AS order_year,
      |    o_totalprice
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey)
      |GROUP BY ROLLUP (n_name, order_year)
      |ORDER BY g_nation, g_year, n_name NULLS FIRST, order_year NULLS FIRST""".stripMargin) {
    (s, dir) =>
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      // customer scales with SF (150k × SF rows) — no broadcast hint,
      // AQE decides; nation is bounded at 25 rows, its hint stays
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"),
          year(col("o_orderdate")).cast("int").as("order_year"),
          col("o_totalprice"))
        .rollup(col("n_name"), col("order_year"))
        .agg(
          grouping(col("n_name")).cast("int").as("g_nation"),
          grouping(col("order_year")).cast("int").as("g_year"),
          round(sum(col("o_totalprice")), 2).as("total_sales"),
          count(lit(1)).as("n_orders"))
        .select(col("g_nation"), col("g_year"), col("n_name"),
          col("order_year"), col("total_sales"), col("n_orders"))
        .orderBy(col("g_nation"), col("g_year"),
          col("n_name").asc_nulls_first, col("order_year").asc_nulls_first)
  }

  /** CUBE over (order status, priority). */
  val aggCube: GQuery = GQuery(
    "agg_cube",
    """SELECT CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
      |  o_orderstatus, o_orderpriority,
      |  round(sum(o_totalprice), 2) AS total_sales,
      |  count(*) AS n_orders
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
      |  o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_prio"),
        round(sum(col("o_totalprice")), 2).as("total_sales"),
        count(lit(1)).as("n_orders"))
      .select(col("g_status"), col("g_prio"), col("o_orderstatus"),
        col("o_orderpriority"), col("total_sales"), col("n_orders"))
      .orderBy(col("g_status"), col("g_prio"),
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** Explicit GROUPING SETS: ((mktsegment), (orderpriority), ()). */
  val aggGroupingSets: GQuery = GQuery(
    "agg_grouping_sets",
    """SELECT CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
      |  c_mktsegment, o_orderpriority,
      |  round(sum(o_totalprice), 2) AS total_sales,
      |  count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
      |ORDER BY g_seg, g_prio, c_mktsegment NULLS FIRST,
      |  o_orderpriority NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).createOrReplaceTempView("gs_orders")
    Tables.customer(s, dir).createOrReplaceTempView("gs_customer")
    s.sql(
      """SELECT CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
        |  c_mktsegment, o_orderpriority,
        |  round(sum(o_totalprice), 2) AS total_sales,
        |  count(*) AS n_orders
        |FROM gs_orders JOIN gs_customer ON o_custkey = c_custkey
        |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
        |ORDER BY g_seg, g_prio, c_mktsegment ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** Post-aggregation filter (HAVING): busy customers only. */
  val aggHaving: GQuery = GQuery(
    "agg_having",
    """SELECT o_custkey, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS total_spent
      |FROM orders
      |GROUP BY o_custkey
      |HAVING count(*) > 12
      |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_spent"))
      .filter(col("n_orders") > 12)
      .orderBy(col("o_custkey"))
  }

  /** Stats family over events.value per type: min/max/avg/stddev and an
    * exact interpolated median (percentile ~ DuckDB quantile_cont). */
  val aggStats: GQuery = GQuery(
    "agg_stats",
    """SELECT event_type,
      |  round(min(value), 4) AS min_v,
      |  round(max(value), 4) AS max_v,
      |  round(avg(value), 4) AS avg_v,
      |  round(stddev_samp(value), 4) AS std_v,
      |  round(quantile_cont(value, 0.5), 4) AS median_v,
      |  count(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        round(min(col("value")), 4).as("min_v"),
        round(max(col("value")), 4).as("max_v"),
        round(avg(col("value")), 4).as("avg_v"),
        round(stddev_samp(col("value")), 4).as("std_v"),
        round(percentile(col("value"), lit(0.5)), 4).as("median_v"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** Bivariate statistics per group: correlation and covariance of
    * quantity vs price (rounded: co-moment accumulation order differs
    * across engines in the last ulp). */
  val aggCorrCovar: GQuery = GQuery(
    "agg_corr_covar",
    """SELECT l_returnflag,
      |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
      |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp,
      |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope_pq,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6)
          .as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
          .as("covar_qp"),
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6)
          .as("slope_pq"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Ordered string aggregation (LISTAGG shape), expressed portably as
    * sort-then-join so both engines emit the identical string. */
  val aggListagg: GQuery = GQuery(
    "agg_listagg",
    """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin) { (s, dir) =>
    Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
        .as("nations"))
      .orderBy(col("r_name"))
  }

  /** Equi-width histogram of event values (width_bucket semantics,
    * spelled as explicit arithmetic — DuckDB v1.0 has no width_bucket).
    * The shuffle carries only (bucket, count), never rows. */
  val aggHistogram: GQuery = {
    val bucket =
      """CASE WHEN value < 0 THEN 0
        |     WHEN value >= 100 THEN 11
        |     ELSE CAST(floor(value / 10) AS BIGINT) + 1 END""".stripMargin
    GQuery(
      "agg_histogram",
      s"""SELECT CAST($bucket AS BIGINT) AS bucket,
         |  count(*) AS n,
         |  round(min(value), 2) AS lo,
         |  round(max(value), 2) AS hi
         |FROM events
         |GROUP BY bucket
         |ORDER BY bucket""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(expr(bucket).cast("bigint").as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("value")), 2).as("lo"),
          round(max(col("value")), 2).as("hi"))
        .orderBy(col("bucket"))
    }
  }

  /** t-digest-family approximate grouped percentiles (p25/p50/p75 of
    * l_quantity per return flag, accuracy 10000). no-oracle: sketch
    * interpolation differs engine-to-engine; the rank-error bound vs
    * the exact percentile is asserted in OperatorPropertySpec instead.
    * At 100 TB this replaces agg_percentiles' exact value-multiset
    * aggregation for high-cardinality value domains: fixed-size
    * mergeable sketch state, single shuffle of sketches — the same
    * scale trade as agg_approx_distinct vs agg_distinct. */
  val aggApproxPercentile: GQuery = GQuery.noOracle("agg_approx_percentile") {
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(expr(
          "approx_percentile(l_quantity, array(0.25d, 0.5d, 0.75d), 10000)")
          .as("qty_approx"))
        .select(col("l_returnflag"),
          col("qty_approx").getItem(0).as("qty_p25"),
          col("qty_approx").getItem(1).as("qty_p50"),
          col("qty_approx").getItem(2).as("qty_p75"))
        .orderBy(col("l_returnflag"))
  }

  /** SAVED MERGEABLE-SKETCH percentile serving (round-14 VERDICT
    * item 6 — the saved-index treatment the sim/dedup families got,
    * applied to the quantile dashboards a 100 TB deployment re-reads
    * daily): per-DAY DDSketch frames (graft.api.Sketch — log-scaled
    * buckets, relative error ≤ α = 0.02, merge = bucket-count
    * addition, provably exact) build once per corpus generation under
    * IndexStore, and this row serves p25/p50/p75 of event value per
    * event type by MERGING the saved per-day sketch rows — the raw
    * events are never re-scanned at serving time. Declared no-oracle
    * like its sketch siblings (agg_approx_percentile /
    * agg_approx_distinct: a foreign engine cannot replay bucket
    * midpoints through its own log/pow ulps); SketchSpec pins the
    * merge-exactness (whole-corpus sketch ≡ merged per-day sketches,
    * bucket-for-bucket) and the ≤ α relative-error bound vs exact
    * percentiles AFTER the merge.
    *
    * Scale shape: serving reads O(days · types · ln(range)/α) sketch
    * rows — corpus-size-invariant; the readout window runs over ≤
    * ~550 buckets per group. */
  val aggPercentileIndexed: GQuery =
    GQuery.noOracle("agg_percentile_indexed") { (s, dir) =>
      val alpha = 0.02
      val path = graft.IndexStore.ensure(graft.IndexStore.stampedPath(
          "ddsketch_events_a2", dir, "events.parquet")) { tmp =>
        graft.api.Sketch.ddSketch(
          Tables.events(s, dir)
            .withColumn("day", date_format(col("ts"), "yyyy-MM-dd")),
          Seq("day", "event_type"), "value", alpha)
          .write.parquet(s"$tmp/sketch")
      }
      val merged = graft.api.Sketch.ddMerge(
        s.read.parquet(s"$path/sketch"), Seq("event_type"))
      graft.api.Sketch.ddQuantiles(merged, Seq("event_type"),
          Seq(0.25, 0.5, 0.75), alpha)
        .select(col("event_type"), col("q"),
          round(col("estimate"), 4).as("value_est"),
          col("n").cast("bigint").as("n"))
        .orderBy(col("event_type"), col("q"))
    }

  /** Deterministic MODE (modal user per event type) via the min-struct
    * argmax — Spark's built-in `mode()` breaks ties arbitrarily, so the
    * contract form aggregates min(struct(-count, user)) instead: same
    * winner as ranking by (count DESC, user ASC), deterministic
    * cross-engine, and NO window — two partial-aggregating groupBys
    * whose hot keys collapse map-side. At 100 TB a window over
    * (event_type) would serialize each type's full row set through one
    * task; the argmax aggregate never materializes per-row ranks. */
  val aggMode: GQuery = GQuery(
    "agg_mode",
    """WITH c AS (SELECT event_type, user_id, count(*) AS c
      |           FROM events GROUP BY 1, 2)
      |SELECT event_type, user_id AS modal_user, CAST(c AS BIGINT) AS n_events
      |FROM (SELECT event_type, user_id, c,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY c DESC, user_id) AS rn
      |  FROM c)
      |WHERE rn = 1
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(min(struct((-col("c")).as("nc"), col("user_id").as("u")))
        .as("m"))
      .select(col("event_type"), col("m.u").as("modal_user"),
        (-col("m.nc")).as("n_events"))
      .orderBy(col("event_type"))
  }

  /** EXACT distinct via roaring-style bitmaps — same answer as
    * count(DISTINCT), radically different plan: user ids hash into
    * 4KB-bucket bitmaps that OR-merge map-side, so the shuffle
    * carries (group, bucket) bitmaps instead of every distinct raw
    * value (countDistinct's expand). The exact-distinct lever for
    * dense integer key spaces at 100 TB; sketch-free, so the oracle
    * is the plain COUNT(DISTINCT) — values must match exactly. */
  val aggBitmapDistinct: GQuery = GQuery(
    "agg_bitmap_distinct",
    """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("event_type"),
        expr("bitmap_bucket_number(user_id)").as("bkt"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))")
        .as("bm"))
      .groupBy(col("event_type"))
      .agg(sum(expr("bitmap_count(bm)")).cast("bigint").as("n_users"))
      .orderBy(col("event_type"))
  }

  /** FILTER-clause aggregates: several differently-conditioned
    * aggregates in ONE pass over lineitem — the pivot-free
    * conditional-metric shape (vs N self-joins or a CASE forest).
    * One scan, one shuffle, every aggregate partial-combining. */
  val aggFilterClause: GQuery = GQuery(
    "agg_filter_clause",
    """SELECT l_returnflag,
      |  CAST(count(*) AS BIGINT) AS n_all,
      |  CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_bulk,
      |  CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)
      |    AS n_discounted,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
      |    FILTER (WHERE l_tax > 0.04), 2) AS DOUBLE) AS taxed_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_all"),
        expr("count(*) FILTER (WHERE l_quantity > 25)").as("n_bulk"),
        expr("count(*) FILTER (WHERE l_discount > 0.05)")
          .as("n_discounted"),
        expr("""CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                FILTER (WHERE l_tax > 0.04), 2) AS DOUBLE)""")
          .as("taxed_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Partitioned HLL sketch columns + lossless union (Apache
    * DataSketches via hll_sketch_agg / hll_union_agg): per-slice
    * distinct-user sketches that MERGE to the global estimate without
    * rescanning — the warehouse pattern where each partition/day
    * stores its sketch as a column and any slice union is
    * sketch-sized work. Declared no-oracle (sketch binaries and
    * estimates are library-specific); OperatorPropertySpec bounds
    * every estimate against the exact distinct and pins
    * union-of-sketches ≡ sketch-of-union. */
  val aggHllPartitioned: GQuery = GQuery.noOracle(
    "agg_hll_partitioned") { (s, dir) =>
    // checkpointed: both union branches consume the sketch frame —
    // one events scan + one sketch aggregation, not two
    val sk = Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .ckpt()
    val per = sk.select(col("event_type"),
      expr("hll_sketch_estimate(sk)").as("est_users"))
    val overall = sk
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_users"))
      .select(lit("__all__").as("event_type"), col("est_users"))
    per.union(overall).orderBy(col("event_type"))
  }

  /** WEIGHTED percentiles (lower weighted median + weighted p90) of
    * price with quantity as the weight — the aggregation a
    * token-weighted corpus statistic needs (per-document means lie
    * when documents differ 1000× in length; the weight column is the
    * fix). Definition: the smallest value whose cumulative weight
    * reaches the quantile of the total. Cumulative weights are
    * all-integer RANGE-frame window sums (ties share one cumulative
    * value on both engines — the default ORDER BY frame), the
    * threshold compare is integer arithmetic, and the pick is a
    * min() — zero float surface anywhere in the decision. */
  val aggWeightedPercentile: GQuery = GQuery(
    "agg_weighted_percentile",
    """WITH w AS (
      |  SELECT l_returnflag AS flag, l_extendedprice AS price,
      |    CAST(l_quantity AS BIGINT) AS wt
      |  FROM lineitem),
      |c AS (
      |  SELECT flag, price, wt,
      |    CAST(sum(wt) OVER (PARTITION BY flag ORDER BY price)
      |      AS BIGINT) AS cum,
      |    CAST(sum(wt) OVER (PARTITION BY flag) AS BIGINT) AS tot
      |  FROM w)
      |SELECT flag, CAST(max(tot) AS BIGINT) AS total_weight,
      |  min(CASE WHEN 2 * cum >= tot THEN price END) AS wmedian,
      |  min(CASE WHEN 10 * cum >= 9 * tot THEN price END) AS wp90
      |FROM c GROUP BY flag
      |ORDER BY flag""".stripMargin) { (s, dir) =>
    val w = Tables.lineitem(s, dir).select(
      col("l_returnflag").as("flag"), col("l_extendedprice").as("price"),
      col("l_quantity").cast("bigint").as("wt"))
    val byFlag = Window.partitionBy(col("flag"))
    val c = w
      .withColumn("cum", sum(col("wt")).over(byFlag.orderBy(col("price"))))
      .withColumn("tot", sum(col("wt")).over(byFlag))
    c.groupBy(col("flag"))
      .agg(max(col("tot")).as("total_weight"),
        min(when(lit(2) * col("cum") >= col("tot"), col("price")))
          .as("wmedian"),
        min(when(lit(10) * col("cum") >= lit(9) * col("tot"),
          col("price"))).as("wp90"))
      .orderBy(col("flag"))
  }

  /** Shared scalar-math tail for agg_skew_kurtosis: central moments
    * from raw power sums, written ONCE and embedded verbatim in both
    * the Spark selectExpr and the DuckDB oracle so the double
    * expression trees are identical token-for-token. */
  private val momentExprs = Seq(
    "flag",
    "CAST(n AS BIGINT) AS n",
    "round(s1 / n, 6) AS mean_q",
    "round((s2 / n - (s1 / n) * (s1 / n)), 6) AS var_q",
    "round((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * power(s1 / n, 3))" +
      " / power(s2 / n - (s1 / n) * (s1 / n), 1.5), 6) AS skew_q",
    "round((s4 / n - 4 * (s1 / n) * (s3 / n)" +
      " + 6 * power(s1 / n, 2) * (s2 / n) - 3 * power(s1 / n, 4))" +
      " / power(s2 / n - (s1 / n) * (s1 / n), 2) - 3, 6) AS kurt_q")

  /** Population skewness / excess kurtosis of l_quantity per return
    * flag, computed from EXACT integer power sums: l_quantity is
    * integer-valued (1..50, FIXTURES.md), so sum(x), sum(x²), sum(x³),
    * sum(x⁴) are exact BIGINTs on both engines regardless of partial-
    * aggregation order (every partial sum < 2^53) — the one way to get
    * deterministic cross-engine higher moments without trusting each
    * engine's own skewness/kurtosis definition (Spark's `skewness` is
    * population-form, DuckDB's is sample-form: NOT comparable). The
    * double math happens once, at the very end, over identical
    * formula text on both sides.
    *
    * Scale shape: a single map-side-combining groupBy producing 4
    * integer sums per group — the cheapest possible distributed
    * moment sketch; the moment arithmetic is a 3-row projection. */
  val aggSkewKurtosis: GQuery = GQuery(
    "agg_skew_kurtosis",
    s"""WITH p AS (
      |  SELECT l_returnflag AS flag, count(*) AS n,
      |    sum(q) AS s1, sum(q * q) AS s2,
      |    sum(q * q * q) AS s3, sum(q * q * q * q) AS s4
      |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q
      |        FROM lineitem)
      |  GROUP BY l_returnflag)
      |SELECT ${momentExprs.mkString(",\n  ")}
      |FROM p ORDER BY flag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("flag"),
        col("l_quantity").cast("bigint").as("q"))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"),
        sum(col("q")).as("s1"),
        sum(col("q") * col("q")).as("s2"),
        sum(col("q") * col("q") * col("q")).as("s3"),
        sum(col("q") * col("q") * col("q") * col("q")).as("s4"))
      .selectExpr(momentExprs: _*)
      .orderBy(col("flag"))
  }

  /** GINI CONCENTRATION — revenue-concentration Gini coefficient per
    * market segment (the whale-dependence readout: 0 = every active
    * customer spends equally, → 1 = one customer is the business),
    * over per-customer DECIMAL(18,2) revenue. The rank formula
    * G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) with xᵢ ascending keeps
    * EVERY sum exact: revenue sums and rank-weighted sums are
    * decimal/integer arithmetic; the only float operation is the
    * final division, one fixed expression rounded 6 on both engines.
    * (The GiniAggregator UDAF demo computes label-impurity Gini; this
    * is the economic-inequality Gini as a contract row.)
    *
    * Scale shape: one keyed aggregate to the customer grain, one
    * shuffle to the segment grain for the rank window (segments are
    * bounded; within-segment rank over customers is the unavoidable
    * sort of any exact Gini), |segments|-row output. */
  val aggGiniConcentration: GQuery = GQuery(
    "agg_gini_concentration",
    """WITH cr AS (
      |  SELECT c.c_mktsegment AS seg, o.o_custkey AS ck,
      |    sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |r AS (SELECT seg, rev,
      |        CAST(row_number() OVER (PARTITION BY seg
      |          ORDER BY rev, ck) AS BIGINT) AS i
      |      FROM cr)
      |SELECT seg, CAST(count(*) AS BIGINT) AS n_customers,
      |  round(CAST(sum(rev) AS DOUBLE), 2) AS total_rev,
      |  round((2.0 * CAST(sum(i * rev) AS DOUBLE)
      |         - (count(*) + 1) * CAST(sum(rev) AS DOUBLE))
      |        / (count(*) * CAST(sum(rev) AS DOUBLE)), 6) AS gini
      |FROM r GROUP BY seg
      |ORDER BY seg""".stripMargin) { (s, dir) =>
    val cr = Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("o_custkey").as("ck"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val r = cr.withColumn("i",
      row_number().over(Window.partitionBy(col("seg"))
        .orderBy(col("rev"), col("ck"))).cast("long"))
    r.groupBy(col("seg"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("rev")), 2).cast("double").as("total_rev"),
        round((lit(2.0) * sum(col("i") * col("rev")).cast("double")
          - (count(lit(1)) + 1) * sum(col("rev")).cast("double"))
          / (count(lit(1)) * sum(col("rev")).cast("double")), 6)
          .as("gini"))
      .orderBy(col("seg"))
  }

  /** ROBUST-SCALE statistics — per-segment median and MAD (median
    * absolute deviation) of account balances, plus the robust-z
    * outlier count at the standard 3·1.4826·MAD fence (1.4826 is the
    * Gaussian consistency constant). The IQR fence ([[dq_anomaly_iqr]]
    * in AuditQueries) and the MAD fence are the two canonical
    * mean-free outlier rules; MAD survives up to 50% contamination
    * where the IQR breaks at 25%.
    *
    * Determinism: both medians are exact interpolated percentiles
    * (the agg_percentiles discipline — identical lo+frac·(hi−lo)
    * arithmetic in both engines), deviations are one abs-subtract on
    * the raw doubles, fences one fixed float product; displays round
    * 6.
    *
    * Scale shape: two exact-percentile aggregates over the bounded
    * segment grid (5 groups) with a segment-keyed join between —
    * group-bounded state; the 100 TB substitute is the mergeable
    * percentile_approx sketch, pinned against the exact form in
    * OperatorPropertySpec. */
  val aggMad: GQuery = GQuery(
    "agg_mad",
    """WITH med AS (
      |  SELECT c_mktsegment AS seg,
      |    quantile_cont(c_acctbal, 0.5) AS med
      |  FROM customer GROUP BY 1),
      |dev AS (
      |  SELECT c.c_mktsegment AS seg, m.med,
      |    abs(c.c_acctbal - m.med) AS adev
      |  FROM customer c JOIN med m ON c.c_mktsegment = m.seg),
      |mad AS (
      |  SELECT seg, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1)
      |SELECT d.seg AS c_mktsegment, CAST(count(*) AS BIGINT) AS n,
      |  round(max(d.med), 6) AS median_bal,
      |  round(max(m.mad), 6) AS mad,
      |  CAST(count(*) FILTER (WHERE d.adev > 3 * 1.4826 * m.mad)
      |    AS BIGINT) AS n_outliers
      |FROM dev d JOIN mad m USING (seg)
      |GROUP BY d.seg
      |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    val cust = Tables.customer(s, dir)
    val med = cust.groupBy(col("c_mktsegment").as("seg"))
      .agg(percentile(col("c_acctbal"), lit(0.5)).as("med"))
    val dev = cust.select(col("c_mktsegment").as("seg"), col("c_acctbal"))
      .join(med, Seq("seg"))
      .withColumn("adev", abs(col("c_acctbal") - col("med")))
    val mad = dev.groupBy(col("seg"))
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    dev.join(mad, Seq("seg"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n"),
        round(max(col("med")), 6).as("median_bal"),
        round(max(col("mad")), 6).as("mad"),
        count(when(col("adev") > lit(3) * lit(1.4826) * col("mad"), 1))
          .as("n_outliers"))
      .select(col("seg").as("c_mktsegment"), col("n"),
        col("median_bal"), col("mad"), col("n_outliers"))
      .orderBy(col("c_mktsegment"))
  }

  /** WINSORIZED and TRIMMED means — the robust-location pair next to
    * the MAD robust-scale row (`agg_mad`): per return flag, extended
    * prices are clamped to (winsorized) or dropped outside (trimmed)
    * the group's own [p05, p95], the standard tail-taming treatment
    * for heavy-tailed revenue metrics. The exact-percentile
    * thresholds round to the price's DECIMAL(18,2) grid BEFORE any
    * compare, so boundary rows clamp/trim identically on both
    * engines, and all three means divide exact decimal sums.
    *
    * Scale: one exact-percentile aggregate (value→count map state —
    * the agg_percentiles note: swap for approx_percentile at 100 TB),
    * one \|flags\|-row keyed threshold join back, one
    * map-side-combining rollup. */
  val aggWinsorizedMean: GQuery = GQuery(
    "agg_winsorized_mean",
    """WITH th AS (
      |  SELECT l_returnflag,
      |    CAST(round(quantile_cont(CAST(l_extendedprice AS DOUBLE),
      |      0.05), 2) AS DECIMAL(18,2)) AS lo,
      |    CAST(round(quantile_cont(CAST(l_extendedprice AS DOUBLE),
      |      0.95), 2) AS DECIMAL(18,2)) AS hi
      |  FROM lineitem GROUP BY l_returnflag),
      |v AS (
      |  SELECT l.l_returnflag,
      |    CAST(l.l_extendedprice AS DECIMAL(18,2)) AS p, th.lo, th.hi
      |  FROM lineitem l JOIN th ON l.l_returnflag = th.l_returnflag)
      |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  round(CAST(sum(p) AS DOUBLE) / count(*), 4) AS mean_raw,
      |  round(CAST(sum(least(greatest(p, lo), hi)) AS DOUBLE)
      |    / count(*), 4) AS mean_winsorized,
      |  round(CAST(sum(CASE WHEN p >= lo AND p <= hi THEN p END)
      |      AS DOUBLE)
      |    / sum(CASE WHEN p >= lo AND p <= hi THEN 1 ELSE 0 END), 4)
      |    AS mean_trimmed,
      |  CAST(sum(CASE WHEN p < lo THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clipped_low,
      |  CAST(sum(CASE WHEN p > hi THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clipped_high
      |FROM v GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(18,2)").as("p"))
    val th = li.groupBy(col("l_returnflag")).agg(
      round(expr("percentile(CAST(p AS DOUBLE), 0.05d)"), 2)
        .cast("decimal(18,2)").as("lo"),
      round(expr("percentile(CAST(p AS DOUBLE), 0.95d)"), 2)
        .cast("decimal(18,2)").as("hi"))
    val inBand = col("p") >= col("lo") && col("p") <= col("hi")
    li.join(th, Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        round(sum(col("p")).cast("double") / count(lit(1)), 4)
          .as("mean_raw"),
        round(sum(least(greatest(col("p"), col("lo")), col("hi")))
          .cast("double") / count(lit(1)), 4).as("mean_winsorized"),
        round(sum(when(inBand, col("p"))).cast("double")
          / sum(when(inBand, 1).otherwise(0)), 4).as("mean_trimmed"),
        sum(when(col("p") < col("lo"), 1).otherwise(0)).cast("bigint")
          .as("n_clipped_low"),
        sum(when(col("p") > col("hi"), 1).otherwise(0)).cast("bigint")
          .as("n_clipped_high"))
      .orderBy(col("l_returnflag"))
  }

  /** OLS LINEAR REGRESSION per group — slope / intercept / R² of
    * extended price on quantity per return flag, the regr_slope /
    * regr_r2 surface both engines ship natively but whose built-in
    * forms accumulate doubles in partition order (non-deterministic
    * cross-engine); here the five moments (Σx, Σy, Σx², Σxy, Σy²)
    * ride exact DECIMAL sums and each statistic is one double
    * expression over them, textually identical in both engines →
    * bit-identical rounded outputs (the ev_ab_welch discipline
    * applied to regression).
    *
    * Scale shape: one map-side-combining aggregate to |flags| rows;
    * the algebra runs on that bounded frame. */
  val aggRegression: GQuery = {
    def sl = "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)" +
      " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    GQuery("agg_regression",
      s"""WITH m AS (
         |  SELECT l_returnflag,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(round(l_quantity, 2) AS DECIMAL(12,2)))
         |         AS DECIMAL(28,2)) AS sx,
         |    CAST(sum(CAST(round(l_extendedprice, 2) AS DECIMAL(14,2)))
         |         AS DECIMAL(30,2)) AS sy,
         |    CAST(sum(CAST(round(l_quantity, 2) AS DECIMAL(12,2))
         |             * CAST(round(l_quantity, 2) AS DECIMAL(12,2)))
         |         AS DECIMAL(38,4)) AS sxx,
         |    CAST(sum(CAST(round(l_quantity, 2) AS DECIMAL(12,2))
         |             * CAST(round(l_extendedprice, 2) AS DECIMAL(14,2)))
         |         AS DECIMAL(38,4)) AS sxy,
         |    CAST(sum(CAST(round(l_extendedprice, 2) AS DECIMAL(14,2))
         |             * CAST(round(l_extendedprice, 2) AS DECIMAL(14,2)))
         |         AS DECIMAL(38,4)) AS syy
         |  FROM lineitem GROUP BY 1)
         |SELECT l_returnflag, n,
         |  round($sl, 6) AS slope,
         |  round((CAST(sy AS DOUBLE) - ($sl) * sx) / n, 6) AS intercept,
         |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         |    * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         |    / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
         |       * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
         |    6) AS r2
         |FROM m
         |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val x = round(col("l_quantity"), 2).cast("decimal(12,2)")
      val y = round(col("l_extendedprice"), 2).cast("decimal(14,2)")
      val m = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(x).cast("decimal(28,2)").as("sx"),
          sum(y).cast("decimal(30,2)").as("sy"),
          sum(x * x).cast("decimal(38,4)").as("sxx"),
          sum(x * y).cast("decimal(38,4)").as("sxy"),
          sum(y * y).cast("decimal(38,4)").as("syy"))
      val num = col("n").cast("double") * col("sxy") -
        col("sx").cast("double") * col("sy")
      val denX = col("n").cast("double") * col("sxx") -
        col("sx").cast("double") * col("sx")
      val denY = col("n").cast("double") * col("syy") -
        col("sy").cast("double") * col("sy")
      val slope = num / denX
      m.select(col("l_returnflag"), col("n"),
          round(slope, 6).as("slope"),
          round((col("sy").cast("double") - slope * col("sx")) / col("n"),
            6).as("intercept"),
          round(num * num / (denX * denY), 6).as("r2"))
        .orderBy(col("l_returnflag"))
    }
  }

  /** POISSON BOOTSTRAP confidence interval — the distributed-systems
    * way to put a CI on a mean (resampling rows is impossible at
    * scale; attaching independent Poisson(1) weights per (replica,
    * row) is one streaming pass — the Dremel/online-bootstrap
    * technique). 32 replicas; each row's weight comes from the
    * portable 48-bit hash of (replica, order key) compared against
    * PRECOMPUTED integer thresholds of the Poisson(1) CDF (⌊CDF·2⁴⁸⌋
    * literals — the weight decision is pure integer compares, zero
    * float surface, reproducible on any engine). Replica means ride
    * exact DECIMAL sums; the 2.5/97.5% band over the 32 bounded
    * replica means uses the proven quantile_cont ↔ percentile
    * pairing.
    *
    * Scale shape: the 32-row replica frame is a broadcast expand
    * (map-side ×32 on weights only — rows are never resampled or
    * shuffled per replica); sums combine map-side to 32 rows. */
  val aggBootstrapCi: GQuery = {
    // floor(CDF_Poisson(1)(k) * 2^48) for k = 0..5; weight 6 beyond
    val th = Seq(103548857136060L, 207097714272121L, 258872142840152L,
      276130285696162L, 280444821410164L, 281307728552965L)
    val duckH = DedupQueries.duckHash(
      "concat('boot:', CAST(b AS VARCHAR), ':', CAST(o_orderkey AS VARCHAR))")
    val duckCase = "CASE " + th.zipWithIndex.map { case (t, k) =>
      s"WHEN h < $t THEN $k" }.mkString(" ") + " ELSE 6 END"
    GQuery("agg_bootstrap_ci",
      s"""WITH w AS (
         |  SELECT b, $duckCase AS wt,
         |    CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS p
         |  FROM (
         |    SELECT g.b AS b, o_orderkey, o_totalprice, $duckH AS h
         |    FROM orders CROSS JOIN generate_series(0, 31) g(b))),
         |r AS (SELECT b, CAST(sum(wt) AS BIGINT) AS nw,
         |        CAST(sum(wt * p) AS DECIMAL(38,2)) AS sp
         |      FROM w GROUP BY b),
         |m AS (SELECT CAST(sp AS DOUBLE) / nw AS mean FROM r),
         |pt AS (SELECT round(CAST(sum(CAST(round(o_totalprice, 2)
         |         AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS pm
         |       FROM orders)
         |SELECT CAST(count(*) AS BIGINT) AS n_replicas,
         |  (SELECT pm FROM pt) AS point_mean,
         |  round(quantile_cont(mean, 0.025), 6) AS ci_lo,
         |  round(quantile_cont(mean, 0.975), 6) AS ci_hi
         |FROM m""".stripMargin) { (s, dir) =>
      val h = conv(substring(md5(concat(lit("boot:"),
        col("b").cast("string"), lit(":"),
        col("o_orderkey").cast("string"))), 1, 12), 16, 10).cast("long")
      val wt = th.zipWithIndex.foldRight(lit(6): org.apache.spark.sql
          .Column) { case ((t, k), acc) =>
        when(col("h") < t, k).otherwise(acc)
      }
      // replica expand is a PROJECTION (explode of a 32-int literal),
      // not a cross join — no BNLJ anywhere in the plan
      val w = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          round(col("o_totalprice"), 2).cast("decimal(18,2)").as("p"))
        .withColumn("b", explode(lit((0 until 32).toArray)))
        .withColumn("h", h)
        .select(col("b"), wt.as("wt"), col("p"))
      val r = w.groupBy(col("b"))
        .agg(sum(col("wt")).cast("bigint").as("nw"),
          sum(col("wt") * col("p")).cast("decimal(38,2)").as("sp"))
      val m = r.select((col("sp").cast("double") / col("nw")).as("mean"))
      // 1-row × 1-row scalar attach (allowlisted BNLJ class — the
      // text_lang_id vocab-scalar pattern; both sides are single rows)
      val pt = Tables.orders(s, dir)
        .agg(round(sum(round(col("o_totalprice"), 2)
          .cast("decimal(18,2)")).cast("double") / count(lit(1)), 6)
          .as("pm"))
      m.agg(count(lit(1)).cast("bigint").as("n_replicas"),
          round(percentile(col("mean"), lit(0.025)), 6).as("ci_lo"),
          round(percentile(col("mean"), lit(0.975)), 6).as("ci_hi"))
        .crossJoin(broadcast(pt))
        .select(col("n_replicas"), col("pm").as("point_mean"),
          col("ci_lo"), col("ci_hi"))
    }
  }

  /** WILSON SCORE INTERVAL — the right confidence interval for a
    * proportion (the normal-approximation ±z√(p̂q̂/n) misbehaves near
    * 0/1 and at small n; Wilson is what ranking and review systems
    * actually use): per event type, the share of high-value events
    * (value > 100) with its 95% Wilson bounds,
    * (p̂ + z²/2n ± z·√(p̂q̂/n + z²/4n²)) / (1 + z²/n), z = 1.96
    * literal in both engines. Counts are exact integers; each bound
    * is one double expression — bit-identical rounded.
    *
    * Scale shape: one map-side-combining aggregate to |types| rows;
    * the interval algebra runs on that bounded frame. */
  val aggWilsonCi: GQuery = {
    def sql(which: String): String = {
      val sign = if (which == "lo") "-" else "+"
      val z = "CAST(1.96 AS DOUBLE)"
      s"""(CAST(k AS DOUBLE) / n + $z * $z / (2 * n)
         | $sign $z * sqrt((CAST(k AS DOUBLE) / n)
         |     * (1 - CAST(k AS DOUBLE) / n) / n
         |     + $z * $z / (4 * CAST(n AS DOUBLE) * n)))
         | / (1 + $z * $z / n)""".stripMargin
    }
    GQuery("agg_wilson_ci",
      s"""WITH c AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END)
         |         AS BIGINT) AS k
         |  FROM events GROUP BY 1)
         |SELECT event_type, n, k,
         |  round(CAST(k AS DOUBLE) / n, 6) AS p_hat,
         |  round(${sql("lo")}, 6) AS wilson_lo,
         |  round(${sql("hi")}, 6) AS wilson_hi
         |FROM c
         |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val c = Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(when(col("value") > 100, 1).otherwise(0)).cast("bigint")
            .as("k"))
      val p = col("k").cast("double") / col("n")
      val z2 = lit(1.96) * lit(1.96)
      def bound(sign: Int) =
        (p + z2 / (lit(2) * col("n"))
          + lit(sign) * lit(1.96) * sqrt(p * (lit(1) - p) / col("n")
            + z2 / (lit(4) * col("n").cast("double") * col("n"))))
          ./(lit(1) + z2 / col("n"))
      c.select(col("event_type"), col("n"), col("k"),
          round(p, 6).as("p_hat"),
          round(bound(-1), 6).as("wilson_lo"),
          round(bound(1), 6).as("wilson_hi"))
        .orderBy(col("event_type"))
    }
  }

  /** CHI-SQUARE TEST OF INDEPENDENCE + CRAMÉR'S V over the
    * market-segment × order-priority contingency table — the
    * categorical-association audit next to the numeric drift tests
    * (dq_distribution_ks is two-sample-numeric, dq_drift_psi is
    * share-compare; this is the classic R×C independence question "does
    * segment PREDICT priority"). χ² = N·(Σ_ij O_ij²/(r_i·c_j) − 1) —
    * the algebraic form that needs only the observed counts and the
    * margins, never a per-cell expected-count subtraction. Effect size
    * is Cramér's V = √(χ²/(N·min(R−1,C−1))), the [0,1] normalization a
    * raw χ² (which grows with N) can't give.
    *
    * Exactness: O, margins and N are exact integers; each cell's
    * u = O²/(r·c) is ONE double division rounded to 12 and quantized to
    * DECIMAL(24,12), so the cell sum is order-free; χ² = (Σu − 1)·N
    * stays EXACT on the decimal grid (N cast to DECIMAL(12,0) keeps the
    * product inside precision 38 on both engines — no precision-loss
    * rescale); the only remaining double ops are the final round and
    * the V square root, each one expression in the same order in both
    * engines. The 0.95 rejection literal 26.296 is χ²₀.₉₅ at the
    * fixture grid's 16 dof (5 segments × 5 priorities, present at all
    * SFs; dof is emitted so a different grid is visible).
    *
    * Scale shape: one orders⋈customer equi-join (un-hinted — customer
    * scales with SF, AQE promotes the build side from runtime stats)
    * and one map-side-combining (seg, prio) count are the only
    * corpus-sized stages; margins, cells and the final scalar all live
    * on the ≤R×C aggregated grid — no window, no cross join, no
    * broadcast hint. */
  val aggChi2Independence: GQuery = GQuery(
    "agg_chi2_independence",
    """WITH j AS (
      |  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |cell AS (
      |  SELECT seg, prio, CAST(count(*) AS BIGINT) AS obs
      |  FROM j GROUP BY 1, 2),
      |r AS (SELECT seg, CAST(sum(obs) AS BIGINT) AS rt
      |      FROM cell GROUP BY 1),
      |c AS (SELECT prio, CAST(sum(obs) AS BIGINT) AS ct
      |      FROM cell GROUP BY 1),
      |u AS (
      |  SELECT cell.seg, cell.prio, cell.obs,
      |    CAST(round(CAST(cell.obs * cell.obs AS DOUBLE)
      |               / (r.rt * c.ct), 12) AS DECIMAL(24,12)) AS u
      |  FROM cell JOIN r ON cell.seg = r.seg
      |            JOIN c ON cell.prio = c.prio),
      |s AS (
      |  SELECT CAST(sum(obs) AS BIGINT) AS n,
      |    CAST(count(DISTINCT seg) AS BIGINT) AS seg_levels,
      |    CAST(count(DISTINCT prio) AS BIGINT) AS prio_levels,
      |    CAST(sum(u) AS DECIMAL(24,12)) AS su
      |  FROM u)
      |SELECT n, seg_levels, prio_levels,
      |  (seg_levels - 1) * (prio_levels - 1) AS dof,
      |  round(CAST((su - 1) * CAST(n AS DECIMAL(12,0)) AS DOUBLE), 6)
      |    AS chi2,
      |  round(sqrt(CAST((su - 1) * CAST(n AS DECIMAL(12,0)) AS DOUBLE)
      |    / (n * least(seg_levels - 1, prio_levels - 1))), 6)
      |    AS cramers_v,
      |  CAST(CAST((su - 1) * CAST(n AS DECIMAL(12,0)) AS DOUBLE)
      |    > 26.296 AS BOOLEAN) AS dependent_95
      |FROM s""".stripMargin) { (s, dir) =>
    val j = Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        col("o_orderpriority").as("prio"))
    val cell = j.groupBy(col("seg"), col("prio"))
      .agg(count(lit(1)).cast("bigint").as("obs"))
    val r = cell.groupBy(col("seg"))
      .agg(sum(col("obs")).cast("bigint").as("rt"))
    val c = cell.groupBy(col("prio"))
      .agg(sum(col("obs")).cast("bigint").as("ct"))
    val u = cell.join(r, Seq("seg")).join(c, Seq("prio"))
      .select(col("seg"), col("prio"), col("obs"),
        round(col("obs").cast("double") * col("obs")
          / (col("rt") * col("ct")), 12).cast("decimal(24,12)").as("u"))
    val chiExact = (col("su") - 1) * col("n").cast("decimal(12,0)")
    u.agg(sum(col("obs")).cast("bigint").as("n"),
        countDistinct(col("seg")).cast("bigint").as("seg_levels"),
        countDistinct(col("prio")).cast("bigint").as("prio_levels"),
        sum(col("u")).cast("decimal(24,12)").as("su"))
      .select(col("n"), col("seg_levels"), col("prio_levels"),
        ((col("seg_levels") - 1) * (col("prio_levels") - 1)).as("dof"),
        round(chiExact.cast("double"), 6).as("chi2"),
        round(sqrt(chiExact.cast("double")
          / (col("n") * least(col("seg_levels") - 1,
              col("prio_levels") - 1))), 6).as("cramers_v"),
        (chiExact.cast("double") > 26.296).cast("boolean")
          .as("dependent_95"))
  }

  /** MUTUAL INFORMATION + normalized MI over the same segment ×
    * priority contingency table as agg_chi2_independence — the
    * information-theoretic sibling (χ² asks "is there association";
    * MI measures it in nats and NMI = MI/min(H_row, H_col) puts it on
    * [0,1], the feature-selection statistic): MI = Σ p_ij·(ln O_ij +
    * ln N − ln r_i − ln c_j), each entropy H = −Σ p·ln p.
    *
    * Exactness (the text_lang_divergence log discipline): every ln()
    * rounds to 8 and lands on DECIMAL(14,8); every probability is one
    * round-12 division on DECIMAL(16,12); all products and sums are
    * then EXACT decimals — MI, H_seg, H_prio never see a float sum.
    * The three statistics ride ONE tagged union (mi/hs/hp term rows)
    * into a single conditional aggregate, so the final row needs no
    * scalar cross join; NMI is the single remaining double division,
    * rounded 6.
    *
    * Scale shape: identical to agg_chi2_independence — one equi-join
    * + one (seg, prio) map-side-combining count; margins ride three
    * windows over the ≤R×C (25-row) cell frame; the term union and
    * final aggregate are ≤35 rows. */
  val aggMutualInfo: GQuery = {
    def l8(x: String) =
      s"CAST(round(ln(CAST($x AS DOUBLE)), 8) AS DECIMAL(14,8))"
    def p12(num: String, den: String) =
      s"CAST(round(CAST($num AS DOUBLE) / $den, 12) AS DECIMAL(16,12))"
    GQuery("agg_mutual_info",
      s"""WITH j AS (
         |  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
         |cell AS (
         |  SELECT seg, prio, CAST(count(*) AS BIGINT) AS obs
         |  FROM j GROUP BY 1, 2),
         |w AS (
         |  SELECT seg, prio, obs,
         |    CAST(sum(obs) OVER (PARTITION BY seg) AS BIGINT) AS rt,
         |    CAST(sum(obs) OVER (PARTITION BY prio) AS BIGINT) AS ct,
         |    CAST(sum(obs) OVER () AS BIGINT) AS n
         |  FROM cell),
         |terms AS (
         |  SELECT 'mi' AS kind, obs,
         |    CAST(${p12("obs", "n")}
         |      * (${l8("obs")} + ${l8("n")} - ${l8("rt")} - ${l8("ct")})
         |      AS DECIMAL(32,20)) AS t
         |  FROM w
         |  UNION ALL
         |  SELECT 'hs', CAST(0 AS BIGINT),
         |    CAST(-(${p12("rt", "n")}
         |      * (${l8("rt")} - ${l8("n")})) AS DECIMAL(32,20))
         |  FROM (SELECT DISTINCT seg, rt, n FROM w)
         |  UNION ALL
         |  SELECT 'hp', CAST(0 AS BIGINT),
         |    CAST(-(${p12("ct", "n")}
         |      * (${l8("ct")} - ${l8("n")})) AS DECIMAL(32,20))
         |  FROM (SELECT DISTINCT prio, ct, n FROM w)),
         |s AS (
         |  SELECT
         |    CAST(sum(CASE WHEN kind = 'mi' THEN obs ELSE 0 END)
         |      AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN kind = 'mi' THEN t END)
         |      AS DECIMAL(32,20)) AS mi,
         |    CAST(sum(CASE WHEN kind = 'hs' THEN t END)
         |      AS DECIMAL(32,20)) AS hs,
         |    CAST(sum(CASE WHEN kind = 'hp' THEN t END)
         |      AS DECIMAL(32,20)) AS hp
         |  FROM terms)
         |SELECT n, round(CAST(mi AS DOUBLE), 6) AS mi_nats,
         |  round(CAST(hs AS DOUBLE), 6) AS h_seg,
         |  round(CAST(hp AS DOUBLE), 6) AS h_prio,
         |  CASE WHEN least(CAST(hs AS DOUBLE), CAST(hp AS DOUBLE)) <= 0
         |    THEN CAST(NULL AS DOUBLE)
         |    ELSE round(CAST(mi AS DOUBLE)
         |      / least(CAST(hs AS DOUBLE), CAST(hp AS DOUBLE)), 6)
         |  END AS nmi
         |FROM s""".stripMargin) { (s, dir) =>
      val j = Tables.orders(s, dir)
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          col("o_orderpriority").as("prio"))
      val cell = j.groupBy(col("seg"), col("prio"))
        .agg(count(lit(1)).cast("bigint").as("obs"))
      val w = cell.select(col("seg"), col("prio"), col("obs"),
        sum(col("obs")).over(Window.partitionBy(col("seg")))
          .cast("bigint").as("rt"),
        sum(col("obs")).over(Window.partitionBy(col("prio")))
          .cast("bigint").as("ct"),
        sum(col("obs")).over(Window.partitionBy())
          .cast("bigint").as("n"))
      val miT = w.selectExpr("'mi' AS kind", "obs",
        s"CAST(${p12("obs", "n")} * (${l8("obs")} + ${l8("n")} " +
          s"- ${l8("rt")} - ${l8("ct")}) AS DECIMAL(32,20)) AS t")
      val hsT = w.select(col("seg"), col("rt"), col("n")).distinct()
        .selectExpr("'hs' AS kind", "CAST(0 AS BIGINT) AS obs",
          s"CAST(-(${p12("rt", "n")} * (${l8("rt")} - ${l8("n")})) " +
            "AS DECIMAL(32,20)) AS t")
      val hpT = w.select(col("prio"), col("ct"), col("n")).distinct()
        .selectExpr("'hp' AS kind", "CAST(0 AS BIGINT) AS obs",
          s"CAST(-(${p12("ct", "n")} * (${l8("ct")} - ${l8("n")})) " +
            "AS DECIMAL(32,20)) AS t")
      miT.unionByName(hsT).unionByName(hpT)
        .agg(
          sum(when(col("kind") === "mi", col("obs")).otherwise(0))
            .cast("bigint").as("n"),
          sum(when(col("kind") === "mi", col("t")))
            .cast("decimal(32,20)").as("mi"),
          sum(when(col("kind") === "hs", col("t")))
            .cast("decimal(32,20)").as("hs"),
          sum(when(col("kind") === "hp", col("t")))
            .cast("decimal(32,20)").as("hp"))
        .selectExpr("n", "round(CAST(mi AS DOUBLE), 6) AS mi_nats",
          "round(CAST(hs AS DOUBLE), 6) AS h_seg",
          "round(CAST(hp AS DOUBLE), 6) AS h_prio",
          """CASE WHEN least(CAST(hs AS DOUBLE), CAST(hp AS DOUBLE)) <= 0
            |  THEN CAST(NULL AS DOUBLE)
            |  ELSE round(CAST(mi AS DOUBLE)
            |    / least(CAST(hs AS DOUBLE), CAST(hp AS DOUBLE)), 6)
            |END AS nmi""".stripMargin)
    }
  }

  val all: Seq[GQuery] = Seq(aggPricingSummary, aggDistinct,
    aggApproxDistinct, aggRollup, aggCube, aggGroupingSets, aggHaving,
    aggStats, aggCorrCovar, aggListagg, aggHistogram, aggApproxPercentile,
    aggMode, aggBitmapDistinct, aggFilterClause, aggHllPartitioned,
    aggWeightedPercentile, aggSkewKurtosis, aggGiniConcentration,
    aggMad, aggWinsorizedMean, aggRegression, aggBootstrapCi,
    aggWilsonCi, aggChi2Independence, aggMutualInfo,
    aggPercentileIndexed)
}
