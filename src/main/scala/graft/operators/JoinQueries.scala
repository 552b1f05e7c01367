package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GQuery
import graft.sources.Tables
import graft.Ckpt.CkptOps

/** Join family (SURVEY.md §2.3).
  *
  * Scale notes per variant:
  *  - BOUNDED dimension joins (nation ≤ 25 rows, region ≤ 5) are
  *    explicitly `broadcast()` so no shuffle of the fact side
  *    happens — at 1000 executors the dim table ships once per
  *    executor, not per task. Tables whose cardinality scales with SF
  *    (customer, part) carry NO hint: an unconditional broadcast hits
  *    Spark's 8 GB cap long before 100 TB, so the strategy is left to
  *    AQE's runtime stats (broadcast when actually small);
  *  - the fact-fact join (`join_sortmerge`) is pinned to sort-merge via
  *    hint, the right choice when both sides are 100 TB-scale and
  *    neither fits in memory (SMJ spills gracefully);
  *  - `join_theta_range` keeps an equi-conjunct (`l_partkey =
  *    p_partkey`) so Spark plans a hash join with a residual range
  *    filter instead of a BroadcastNestedLoop cross product;
  *  - `join_asof` is expressed as a window over a single shuffle of
  *    events (partition by user), not a self-join — one shuffle, no
  *    quadratic pair blowup, and the same shape works on a billion
  *    users because state per key is one running max.
  */
object JoinQueries {

  /** Inner equi-join orders ⋈ customer. */
  val joinHashEqui: GQuery = GQuery(
    "join_hash_equi",
    """SELECT o_orderkey, c_custkey, c_name, round(o_totalprice, 2) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
        round(col("o_totalprice"), 2).as("total"))
      .orderBy(col("o_orderkey"))
  }

  /** Dimension join nation ⋈ region with an explicit broadcast hint. */
  val joinBroadcast: GQuery = GQuery(
    "join_broadcast",
    """SELECT n_nationkey, n_name, r_name
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy(col("n_nationkey"))
  }

  /** Fact-fact join pinned to sort-merge (the 100 TB-safe strategy). */
  val joinSortmerge: GQuery = GQuery(
    "join_sortmerge",
    """SELECT l_orderkey, l_linenumber, round(o_totalprice, 2) AS total,
      |  CAST(year(o_orderdate) AS INT) AS order_year
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_extendedprice""".stripMargin) {
    (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir).hint("merge")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_extendedprice"))
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("o_totalprice"), 2).as("total"),
        year(col("o_orderdate")).cast("int").as("order_year"))
  }

  /** 4-way join (TPC-H Q10 shape): revenue of returned items per nation. */
  val joinMultiway: GQuery = GQuery(
    "join_multiway",
    """SELECT n_name,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
      |    AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    // customer scales with SF — no broadcast hint (AQE decides);
    // nation is bounded at 25 rows, so its hint stays
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1) - col("l_discount").cast("decimal(18,2)"))), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** Left outer join: every customer with order count incl. zero. */
  val joinLeftOuter: GQuery = GQuery(
    "join_left_outer",
    """SELECT c_custkey, count(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  /** Left-semi: customers having at least one order (EXISTS). */
  val joinSemi: GQuery = GQuery(
    "join_semi",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti: customers with no URGENT order (NOT EXISTS, TPC-H Q22
    * shape; the filter keeps the result non-empty — every customer has
    * some order in the fixtures). */
  val joinAnti: GQuery = GQuery(
    "join_anti",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Non-equi range join, kept hash-joinable by the partkey equi
    * conjunct with the BETWEEN as residual. */
  val joinThetaRange: GQuery = GQuery(
    "join_theta_range",
    """SELECT l_orderkey, l_linenumber, p_partkey, l_quantity, p_size
      |FROM lineitem JOIN part
      |  ON l_partkey = p_partkey
      | AND l_quantity BETWEEN p_size - 5 AND p_size + 5
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_extendedprice""".stripMargin) {
    (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    // part scales with SF — no broadcast hint; the equi conjunct keeps
    // the join hash/sort-merge-able with the BETWEEN as residual, so
    // it shuffles on partkey at scale and AQE broadcasts when small
    li.join(p,
      li("l_partkey") === p("p_partkey")
        && li("l_quantity").between(p("p_size") - 5, p("p_size") + 5))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_extendedprice"))
      .select(col("l_orderkey"), col("l_linenumber"), col("p_partkey"),
        col("l_quantity"), col("p_size"))
  }

  /** As-of join: for each purchase event, the latest prior click of the
    * same user. Implemented as a running window max over one shuffle of
    * events (no self-join); `max` skips the nulls of non-click rows, so
    * the frame `UNBOUNDED PRECEDING .. 1 PRECEDING` carries exactly
    * "latest click strictly before me". Output times as epoch micros
    * (BIGINT) for exact cross-engine compare. */
  val joinAsof: GQuery = GQuery(
    "join_asof",
    """SELECT event_id, user_id, epoch_us(ts) AS purchase_us,
      |  epoch_us(last_click) AS click_us
      |FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |    max(CASE WHEN event_type = 'click' THEN ts END) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click
      |  FROM events)
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("last_click",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"),
        unix_micros(col("last_click")).as("click_us"))
      .orderBy(col("event_id"))
  }

  /** As-of join with a TOLERANCE bound (pandas merge_asof semantics):
    * each purchase keeps its most recent prior click only if it
    * happened within the last hour — stale matches null out instead
    * of attaching, which is what attribution windows actually
    * require. Same single-shuffle window plan as join_asof (state per
    * user = one running max); the tolerance is a pure post-window
    * projection, so the scale shape is unchanged. */
  val joinAsofTolerance: GQuery = GQuery(
    "join_asof_tolerance",
    """SELECT event_id, user_id, epoch_us(ts) AS purchase_us,
      |  CASE WHEN epoch_us(ts) - epoch_us(last_click) <= 3600000000
      |       THEN epoch_us(last_click) END AS click_us
      |FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |    max(CASE WHEN event_type = 'click' THEN ts END) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click
      |  FROM events)
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("last_click",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"),
        when(unix_micros(col("ts")) - unix_micros(col("last_click"))
          <= 3600000000L, unix_micros(col("last_click"))).as("click_us"))
      .orderBy(col("event_id"))
  }

  private val asofTolsMin = Seq(1, 5, 15, 60)

  /** The as-of sweep's full oracle chain (unique `a1*` CTE names)
    * ending in `a1f (tol_min, n_purchases, n_matched, lag_sum,
    * match_share)` — shared verbatim with pipeline_knob_card's
    * oracle (round-14 ADVICE: the card's oracle must be built from
    * the same strings as the sweeps' own oracles). */
  private[operators] val asofSweepCte: String =
    s"""a1l AS (
       |  SELECT event_id,
       |    epoch_us(ts) - epoch_us(last_click) AS lag_us
       |  FROM (
       |    SELECT event_id, ts, event_type,
       |      max(CASE WHEN event_type = 'click' THEN ts END) OVER (
       |        PARTITION BY user_id ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |        AS last_click
       |    FROM events)
       |  WHERE event_type = 'purchase'),
       |a1s AS (SELECT unnest([${asofTolsMin.mkString(", ")}])
       |        AS tol_min),
       |a1m AS (
       |  SELECT tol_min, count(*) AS n_purchases,
       |    sum(CASE WHEN lag_us IS NOT NULL
       |          AND lag_us <= CAST(tol_min AS BIGINT) * 60000000
       |          THEN 1 ELSE 0 END) AS n_matched,
       |    sum(CASE WHEN lag_us IS NOT NULL
       |          AND lag_us <= CAST(tol_min AS BIGINT) * 60000000
       |          THEN lag_us ELSE 0 END) AS lag_sum
       |  FROM a1l, a1s GROUP BY tol_min),
       |a1f AS (SELECT tol_min, n_purchases, n_matched, lag_sum,
       |    round(CAST(n_matched AS DOUBLE) / n_purchases, 6)
       |      AS match_share
       |  FROM a1m)""".stripMargin

  /** AS-OF TOLERANCE SIZING SWEEP — the feature-store staleness knob
    * priced (the sixth sizing sweep): match rate and mean staleness
    * of the purchase→last-click as-of join at tolerances of
    * 1/5/15/60 minutes. The as-of lag (purchase time − last prior
    * click) is TOLERANCE-INDEPENDENT, so the window pass of
    * join_asof_tolerance runs once and the sweep is four predicate
    * aggregates — a deployment reads the curve to pick the loosest
    * staleness bound its model can tolerate (tighter bound = fresher
    * features but more unmatched rows imputed at serving time).
    *
    * Determinism: counts and µs lag sums are exact integers; mean
    * staleness uses the half-up integer-micro division; match_share
    * is one rounded divide of exact integers.
    *
    * Scale shape: one user-partitioned window (the join_asof plan),
    * a ×4 per-row explode on the purchases slice only, 4-row rollup. */
  val joinAsofSweep: GQuery = {
    val tolsMin = asofTolsMin
    GQuery("join_asof_sweep",
      s"""WITH $asofSweepCte
         |SELECT CAST(tol_min AS INT) AS tol_min,
         |  CAST(n_purchases AS BIGINT) AS n_purchases,
         |  CAST(n_matched AS BIGINT) AS n_matched,
         |  match_share,
         |  CASE WHEN n_matched > 0
         |    THEN CAST((2 * lag_sum + n_matched) // (2 * n_matched)
         |      AS DOUBLE) / 1000000 END AS avg_staleness_sec
         |FROM a1f ORDER BY tol_min""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val tolUs = col("tol_min").cast("long") * 60000000L
      val matched = col("lag_us").isNotNull && col("lag_us") <= tolUs
      // 5-row planning curve, memoized per (session, dir): the
      // standalone row and pipeline_knob_card share one
      // materialization (round-15 VERDICT item 7)
      graft.PlanCache.memo(s, dir, "asof_sweep_curve") {
        Tables.events(s, dir)
          .withColumn("last_click",
            max(when(col("event_type") === "click", col("ts"))).over(w))
          .filter(col("event_type") === "purchase")
          .select((unix_micros(col("ts"))
            - unix_micros(col("last_click"))).as("lag_us"))
          .withColumn("tol_min",
            explode(array(tolsMin.map(t => lit(t)): _*)))
          .groupBy(col("tol_min"))
          .agg(count(lit(1)).as("n_purchases"),
            sum(when(matched, 1L).otherwise(0L)).cast("bigint")
              .as("n_matched"),
            sum(when(matched, col("lag_us")).otherwise(0L)).as("lag_sum"))
          .select(col("tol_min"), col("n_purchases"), col("n_matched"),
            round(col("n_matched").cast("double") / col("n_purchases"), 6)
              .as("match_share"),
            when(col("n_matched") > 0,
              expr("(2 * lag_sum + n_matched) div (2 * n_matched)")
                .cast("double") / 1000000).as("avg_staleness_sec"))
      }.orderBy(col("tol_min"))
    }
  }

  /** Time-proximity self-join via BANDING — the scale form of a PURE
    * inequality join (no equi conjunct exists: any two events within
    * 5 s pair up, across all users). The naive |Δt| ≤ 5 s theta join
    * is a cartesian at scale; banding quantizes time into 5 s buckets
    * and explodes one side to its 3 adjacent buckets, turning the
    * predicate into an EQUI-join on the bucket key + a residual |Δt|
    * filter. Every qualifying pair lands in exactly one (exploded,
    * own-bucket) key — no dedup pass — and per-key work is bounded by
    * events-per-5s, the quantity a skew report would check before
    * keying. The fleet-wide BNLJ audit proves the plan is a keyed
    * join, not a nested loop; the oracle states the plain theta
    * semantics. */
  val joinTimeProximity: GQuery = GQuery(
    "join_time_proximity",
    """SELECT a.event_id AS e1, b.event_id AS e2,
      |  epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
      |FROM events a JOIN events b ON b.event_id > a.event_id
      | AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 5000000
      |ORDER BY e1, e2""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val left = ev
      .select(col("event_id").as("e1"), col("us").as("us1"))
      .withColumn("off", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("bucket", expr("us1 div 5000000") + col("off"))
    val right = ev
      .select(col("event_id").as("e2"), col("us").as("us2"),
        expr("us div 5000000").as("bucket"))
    left.join(right, Seq("bucket"))
      .filter(col("e2") > col("e1")
        && abs(col("us2") - col("us1")) <= 5000000L)
      .select(col("e1"), col("e2"), (col("us2") - col("us1")).as("dt_us"))
      .orderBy(col("e1"), col("e2"))
  }

  /** FULL OUTER join: 1995 vs 1998 per-customer activity — customers
    * active in either year survive, with zero-filled counts. */
  val joinFullOuter: GQuery = GQuery(
    "join_full_outer",
    """SELECT coalesce(a.o_custkey, b.o_custkey) AS custkey,
      |  coalesce(a.n, 0) AS n_1995,
      |  coalesce(b.n, 0) AS n_1998
      |FROM (SELECT o_custkey, count(*) AS n FROM orders
      |      WHERE year(o_orderdate) = 1995 GROUP BY 1) a
      |FULL OUTER JOIN
      |     (SELECT o_custkey, count(*) AS n FROM orders
      |      WHERE year(o_orderdate) = 1998 GROUP BY 1) b
      |  ON a.o_custkey = b.o_custkey
      |ORDER BY custkey""".stripMargin) { (s, dir) =>
    def yearly(yr: Int) = Tables.orders(s, dir)
      .filter(year(col("o_orderdate")) === yr)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val a = yearly(1995).withColumnRenamed("o_custkey", "ck_a")
      .withColumnRenamed("n", "n_a")
    val b = yearly(1998).withColumnRenamed("o_custkey", "ck_b")
      .withColumnRenamed("n", "n_b")
    a.join(b, col("ck_a") === col("ck_b"), "full_outer")
      .select(coalesce(col("ck_a"), col("ck_b")).as("custkey"),
        coalesce(col("n_a"), lit(0L)).as("n_1995"),
        coalesce(col("n_b"), lit(0L)).as("n_1998"))
      .orderBy(col("custkey"))
  }

  /** Explicit CROSS join of the two smallest dims (125 rows) — the
    * one place a cartesian product is the intended plan. */
  val joinCross: GQuery = GQuery(
    "join_cross",
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
    Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Shuffle join with a RUNTIME BLOOM FILTER injected from the
    * selective side: lineitem ⋈ orders('1-URGENT'), revenue per order
    * month. Spark's InjectRuntimeFilter sees the selective equality on
    * the orders side and plants `might_contain(bloom_filter_agg(
    * o_orderkey), l_orderkey)` on the lineitem side, so ~80% of
    * lineitem rows are dropped AT THE SCAN, before the shuffle — at
    * 100 TB this is the difference between shuffling the whole fact
    * table and shuffling the fifth of it that can ever match.
    *
    * The injection thresholds are sized for real clusters
    * (application side ≥ 10 GB, creation side ≤ 10 MB, shuffle joins
    * only), so the test-scale run pins the 100 TB regime explicitly:
    * application threshold lowered and auto-broadcast disabled WHILE
    * THIS QUERY EXECUTES (both sides are genuinely huge in the regime
    * this query represents), then every conf restored — the eager
    * localCheckpoint materializes the small aggregated result inside
    * the scoped-conf window, so no session residue leaks into other
    * queries. Semantically the filter is a pure no-op (it only drops
    * rows the join would drop) — the oracle proves it.
    * BloomJoinSpec pins the injection on the optimized plan. */
  val joinBloomFiltered: GQuery = GQuery(
    "join_bloom_filtered",
    """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')
      |    AS order_month,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
      |    AS DOUBLE) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1
      |ORDER BY order_month""".stripMargin) { (s, dir) =>
    bloomScoped(s) {
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
            .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(date_format(date_trunc("month", col("o_orderdate")),
          "yyyy-MM-dd").as("order_month"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double").as("sum_price"))
        .orderBy(col("order_month"))
    }
  }

  /** Run `build` under the bloom-injection regime (runtime bloom
    * filters on, application-side threshold at test scale, broadcast
    * off so the join shuffles like a fact-fact join), materialize the
    * result eagerly, and restore every conf — callers receive a
    * checkpoint-backed frame executed under the scoped confs. Also
    * used by BloomJoinSpec to pin the plan shape. */
  /** The bloom-injection conf regime, shared with PlanShapeSpec's
    * plan pin and no-residue check so the pinned regime can never
    * drift from the one the query actually runs. */
  private[operators] val bloomRegime = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  /** the previous invocation's checkpointed result — unpersisted on
    * the next call so at most ONE small aggregated frame stays cached
    * per session (the harnesses consume each result before invoking
    * the query again). */
  @volatile private var lastBloomResult: Option[DataFrame] = None

  def bloomScoped(s: SparkSession)(build: => DataFrame): DataFrame = {
    lastBloomResult.foreach(df =>
      try df.rdd.unpersist(false) catch { case _: Throwable => () })
    val saved = bloomRegime.map { case (k, _) => k -> s.conf.getOption(k) }
    bloomRegime.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val out = build.ckpt()
      lastBloomResult = Some(out)
      out
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** SHUFFLE-HASH-hinted join: lineitem ⋈ orders building a
    * per-partition hash map on the orders side — the middle strategy
    * between broadcast (side fits in every executor) and sort-merge
    * (both sides huge): when one side is much smaller but over the
    * broadcast cap, SHJ skips BOTH sort passes and streams the big
    * side against per-partition maps. PlanShapeSpec pins the
    * ShuffledHashJoin node. */
  val joinShuffleHash: GQuery = GQuery(
    "join_shuffle_hash",
    """SELECT o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
      |    AS DOUBLE) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)
          .cast("double").as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** NULL-SAFE equality join (`<=>` / IS NOT DISTINCT FROM): both
    * sides null out nation key 13, and the null-keyed rows MATCH —
    * the semantics a plain equi-join silently drops. The
    * late-arriving-dimension / unknown-bucket pattern: route
    * null-keyed facts to a designated null dim row instead of losing
    * them. Null-safe equality still hash-partitions (null is one
    * key), so the join stays a keyed shuffle join, never a BNLJ. */
  val joinNullSafe: GQuery = GQuery(
    "join_null_safe",
    """SELECT n_name,
      |  CAST(s.k AS INT) AS k,
      |  CAST(count(*) AS BIGINT) AS n_suppliers
      |FROM (SELECT nullif(s_nationkey, 13) AS k, s_suppkey
      |      FROM supplier) s
      |JOIN (SELECT nullif(n_nationkey, 13) AS k, n_name FROM nation) n
      |  ON s.k IS NOT DISTINCT FROM n.k
      |GROUP BY n_name, s.k
      |ORDER BY n_name""".stripMargin) { (s, dir) =>
    val sup = Tables.supplier(s, dir)
      .select(expr("nullif(s_nationkey, 13)").as("k"), col("s_suppkey"))
    val nat = Tables.nation(s, dir)
      .select(expr("nullif(n_nationkey, 13)").as("nk"), col("n_name"))
    sup.join(nat, col("k") <=> col("nk"))
      .groupBy(col("n_name"), col("k"))
      .agg(count(lit(1)).as("n_suppliers"))
      .select(col("n_name"), col("k").cast("int").as("k"),
        col("n_suppliers"))
      .orderBy(col("n_name"))
  }

  /** POINT-IN-TIME join — the feature-store / training-data
    * correctness join (Feathr/Tecton "PIT" semantics): each fact row
    * joins the dimension VERSION that was valid at the fact's own
    * timestamp, never a later one — the leakage every naive
    * latest-snapshot join introduces into training data. The
    * versioned dimension derives deterministically from customer
    * (every key a base version from 1990; every k % 4 == 0 key a
    * SEG_MOVED version effective 1995-06-01), so validity ranges
    * partition time and every order matches EXACTLY one version
    * (spec-pinned). Reported per effective-at-order-time segment.
    *
    * Scale shape: equi-join on the key with the validity range as a
    * residual predicate — the fact side shuffles once on custkey,
    * versions-per-key is bounded (≤ 2 here; dozens in practice), so
    * the residual filters a bounded candidate set per fact row. No
    * window, no range-join explosion. */
  val joinPointInTime: GQuery = GQuery(
    "join_point_in_time",
    """WITH dim AS (SELECT c_custkey AS k, c_mktsegment AS seg
      |             FROM customer),
      |versions AS (
      |  SELECT k, seg, TIMESTAMP '1990-01-01' AS vfrom,
      |    CASE WHEN k % 4 = 0 THEN TIMESTAMP '1995-06-01'
      |         ELSE TIMESTAMP '9999-12-31' END AS vto
      |  FROM dim
      |  UNION ALL
      |  SELECT k, 'SEG_MOVED', TIMESTAMP '1995-06-01',
      |    TIMESTAMP '9999-12-31'
      |  FROM dim WHERE k % 4 = 0)
      |SELECT v.seg, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 2)
      |    AS DOUBLE) AS price_sum
      |FROM orders o JOIN versions v
      |  ON o.o_custkey = v.k
      |  AND o.o_orderdate >= v.vfrom AND o.o_orderdate < v.vto
      |GROUP BY v.seg
      |ORDER BY v.seg""".stripMargin) { (s, dir) =>
    val dim = Tables.customer(s, dir).select(
      col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
    // version bounds in the fact column's own type (the new fixtures
    // read o_orderdate as TIMESTAMP_NTZ; a tz-aware literal would
    // fail analysis) — matches the oracle's naive TIMESTAMP literals
    val odType = Tables.orders(s, dir).schema("o_orderdate")
      .dataType.sql.toLowerCase
    val v1 = dim.select(col("k"), col("seg"),
      lit("1990-01-01").cast(odType).as("vfrom"),
      when(col("k") % 4 === 0, lit("1995-06-01"))
        .otherwise(lit("9999-12-31")).cast(odType).as("vto"))
    val v2 = dim.filter(col("k") % 4 === 0)
      .select(col("k"), lit("SEG_MOVED").as("seg"),
        lit("1995-06-01").cast(odType).as("vfrom"),
        lit("9999-12-31").cast(odType).as("vto"))
    Tables.orders(s, dir)
      .join(v1.unionAll(v2),
        col("o_custkey") === col("k")
          && col("o_orderdate") >= col("vfrom")
          && col("o_orderdate") < col("vto"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
          .cast("double").as("price_sum"))
      .orderBy(col("seg"))
  }

  /** General INTERVAL-OVERLAP join with no equi key — the remaining
    * temporal-join shape next to as-of (latest-prior), PIT
    * (version-valid-at) and proximity (|Δt| ≤ ε): error events open a
    * 3-minute incident window, purchases carry a trailing 2-minute
    * risk window, and every overlapping (incident, transaction) pair
    * emits with its overlap length — the incident-impact sweep, keyed
    * by NOTHING (cross-user, cross-entity).
    *
    * Scale shape (the banded decomposition, as join_time_proximity):
    * each interval explodes to the ≤ 2 band buckets it covers
    * (band = 5 min ≥ either span, so the fan-out is a constant 2, not
    * data-dependent), pairs meet under a bucket equi-join, and the
    * canonical-bucket conjunct (the bucket holding the overlap START)
    * keeps each pair in exactly one bucket — no dedup pass. The fleet
    * BNLJ audit proves the plan stays keyed; per-bucket input is
    * bounded by the 5-minute arrival rate, the natural time-skew
    * bound. */
  val joinIntervalOverlap: GQuery = GQuery(
    "join_interval_overlap",
    """WITH e AS (SELECT event_id AS incident_id, ts AS s1,
      |            ts + INTERVAL 3 MINUTE AS e1
      |          FROM events WHERE event_type = 'error'),
      |p AS (SELECT event_id AS txn_id, ts - INTERVAL 2 MINUTE AS s2,
      |        ts AS e2
      |      FROM events WHERE event_type = 'purchase')
      |SELECT e.incident_id, p.txn_id,
      |  epoch_us(least(e.e1, p.e2)) - epoch_us(greatest(e.s1, p.s2))
      |    AS overlap_us
      |FROM e JOIN p ON e.s1 <= p.e2 AND p.s2 <= e.e1
      |ORDER BY incident_id, txn_id""".stripMargin) { (s, dir) =>
    val band = 300000000L // 5 min in µs — ≥ either interval's span
    val ev = Tables.events(s, dir)
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"),
        unix_micros(col("ts")).as("s1"))
      .withColumn("e1", col("s1") + 180000000L)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("txn_id"),
        unix_micros(col("ts")).as("e2"))
      .withColumn("s2", col("e2") - 120000000L)
    def spread(df: DataFrame, sc: String, ec: String): DataFrame =
      df.withColumn("b",
        explode(sequence(expr(s"$sc div $band"), expr(s"$ec div $band"))))
    spread(e, "s1", "e1").join(spread(p, "s2", "e2"), Seq("b"))
      .filter(col("s1") <= col("e2") && col("s2") <= col("e1"))
      .filter(expr(s"greatest(s1, s2) div $band") === col("b"))
      .select(col("incident_id"), col("txn_id"),
        (least(col("e1"), col("e2")) - greatest(col("s1"), col("s2")))
          .cast("bigint").as("overlap_us"))
      .orderBy(col("incident_id"), col("txn_id"))
  }

  /** SALTED skew join — the manual hot-key mitigation for a shuffle
    * join whose key distribution is pathological: events carries only
    * 5 distinct event_type keys (at 100 TB, billions of rows PER KEY
    * — an unsalted shuffle join pins each key's entire fact volume on
    * one task). The dim side (a per-type billing-rate table) is
    * replicated ×16 with an explicit salt column; each fact row picks
    * ONE salt bucket by portable hash of its unique event_id; the
    * join key becomes (event_type, salt), spreading every hot key
    * over 16 tasks. Results are provably identical to the unsalted
    * join — the oracle IS the unsalted join.
    *
    * A 5-row dim would of course be broadcast in practice (the
    * `shuffle_hash` hint here forces the shuffle path precisely to
    * pin the salted mechanics); the pattern earns its keep when the
    * dim is too large to broadcast but its keys are Zipf-hot —
    * salting is what AQE's skew-join mitigation cannot do for a
    * SHUFFLE HASH build side at runtime. Fact-side salt derives from
    * a per-row hash, so the plan stays streaming-safe and
    * deterministic cross-engine. */
  val joinSkewSalted: GQuery = {
    val rates = Seq("click" -> "0.01", "view" -> "0.005",
      "purchase" -> "1.00", "signup" -> "0.50", "error" -> "0.00")
    val duckDim = rates.map { case (t, r) =>
      s"('$t', CAST($r AS DECIMAL(5,3)))" }.mkString(", ")
    GQuery(
      "join_skew_salted",
      s"""WITH dim(event_type, rate) AS (VALUES $duckDim)
         |SELECT e.event_type,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(round(sum(CAST(round(e.value, 2) AS DECIMAL(12,2))
         |                 * rate), 4) AS DOUBLE) AS billed
         |FROM events e JOIN dim USING (event_type)
         |GROUP BY e.event_type
         |ORDER BY e.event_type""".stripMargin) { (s, dir) =>
      import s.implicits._
      val salts = 16
      val dim = rates.toDF("event_type", "rate_s")
        .select(col("event_type"),
          col("rate_s").cast("decimal(5,3)").as("rate"))
        .crossJoin(
          s.range(salts.toLong).select(col("id").cast("int").as("salt")))
      val fact = Tables.events(s, dir)
        .select(col("event_type"),
          round(col("value"), 2).cast("decimal(12,2)").as("v"),
          pmod(graft.api.Sampling.portableHash(col("event_id"), "salt:"),
            lit(salts.toLong)).cast("int").as("salt"))
      fact.join(dim.hint("shuffle_hash"), Seq("event_type", "salt"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("v") * col("rate")), 4).cast("double").as("billed"))
        .orderBy(col("event_type"))
    }
  }

  /** FORWARD as-of join (pandas merge_asof direction='forward'): each
    * purchase attaches the NEXT click at or after it — the
    * "time-to-next-touch" direction join_asof's backward form cannot
    * express (post-purchase re-engagement, next-quote-after-trade).
    * Same single-shuffle window plan: one partition by user, state per
    * key = one running min over the reversed frame — no self-join, no
    * pair blowup, identical shape at any user count. */
  val joinAsofForward: GQuery = GQuery(
    "join_asof_forward",
    """SELECT event_id, user_id, epoch_us(ts) AS purchase_us,
      |  epoch_us(next_click) AS click_us
      |FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |    min(CASE WHEN event_type = 'click' THEN ts END) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
      |      AS next_click
      |  FROM events)
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    ev.withColumn("next_click",
        min(when(col("event_type") === "click", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"),
        unix_micros(col("next_click")).as("click_us"))
      .orderBy(col("event_id"))
  }

  /** NEAREST as-of join — the third pandas merge_asof direction
    * (`direction='nearest'`): each purchase attaches whichever click
    * is closer in time, before or after, ties to the earlier one.
    * Composes the backward (join_asof) and forward (join_asof_forward)
    * window states in ONE pass — still a single user-keyed shuffle,
    * two O(1) running extremes per row, and a pure projection pick;
    * the µs distance compare is exact integer arithmetic. */
  val joinAsofNearest: GQuery = GQuery(
    "join_asof_nearest",
    """SELECT event_id, user_id, epoch_us(ts) AS purchase_us,
      |  CASE
      |    WHEN last_click IS NULL THEN epoch_us(next_click)
      |    WHEN next_click IS NULL THEN epoch_us(last_click)
      |    WHEN epoch_us(ts) - epoch_us(last_click)
      |         <= epoch_us(next_click) - epoch_us(ts)
      |      THEN epoch_us(last_click)
      |    ELSE epoch_us(next_click) END AS click_us,
      |  CASE
      |    WHEN last_click IS NULL AND next_click IS NULL
      |      THEN CAST(NULL AS VARCHAR)
      |    WHEN next_click IS NULL THEN 'backward'
      |    WHEN last_click IS NULL THEN 'forward'
      |    WHEN epoch_us(ts) - epoch_us(last_click)
      |         <= epoch_us(next_click) - epoch_us(ts)
      |      THEN 'backward'
      |    ELSE 'forward' END AS direction
      |FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |    max(CASE WHEN event_type = 'click' THEN ts END) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS last_click,
      |    min(CASE WHEN event_type = 'click' THEN ts END) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
      |      AS next_click
      |  FROM events)
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val back = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val fwd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    val marked = ev
      .withColumn("last_click",
        max(when(col("event_type") === "click", col("ts"))).over(back))
      .withColumn("next_click",
        min(when(col("event_type") === "click", col("ts"))).over(fwd))
      .filter(col("event_type") === "purchase")
    val pUs = unix_micros(col("ts"))
    val lUs = unix_micros(col("last_click"))
    val nUs = unix_micros(col("next_click"))
    marked.select(col("event_id"), col("user_id"),
        pUs.as("purchase_us"),
        when(col("last_click").isNull, nUs)
          .when(col("next_click").isNull, lUs)
          .when(pUs - lUs <= nUs - pUs, lUs)
          .otherwise(nUs).as("click_us"),
        when(col("last_click").isNull && col("next_click").isNull,
            lit(null).cast("string"))
          .when(col("next_click").isNull, lit("backward"))
          .when(col("last_click").isNull, lit("forward"))
          .when(pUs - lUs <= nUs - pUs, lit("backward"))
          .otherwise(lit("forward")).as("direction"))
      .orderBy(col("event_id"))
  }

  /** LATERAL correlated subquery — the ANSI "for each outer row, run
    * this dependent subquery" join surface (engine-capability row,
    * like graph_reachability_cte's WITH RECURSIVE): each nation pulls
    * its top-3 customers by account balance through a correlated
    * `LATERAL (... ORDER BY ... LIMIT 3)`. The SQL text is IDENTICAL
    * in both engines — Spark 4.1 and DuckDB both execute it natively.
    *
    * Scale shape: Spark does NOT execute the naive
    * subquery-per-outer-row loop; the optimizer decorrelates the
    * LATERAL into a rank-based group-limit — the physical plan is
    * Scan(customer) → `WindowGroupLimit` (map-side per-partition top-3
    * heap) → one shuffle on the correlation key → final
    * WindowGroupLimit → BroadcastHashJoin against the 25-row nation
    * side. That is exactly the win_rank_topk_per_group plan, derived
    * automatically from the declarative LATERAL — no per-row
    * re-execution at any scale, and the map-side group limit bounds
    * the shuffle at 3 rows per (partition, nation). Ties broken by
    * c_name so the LIMIT cut is a total order (hash-stable across
    * engines). */
  val joinLateralTopk: GQuery = {
    def lateralSql(nation: String, customer: String): String =
      s"""SELECT n.n_name, t.c_name, t.c_acctbal
         |FROM $nation n,
         |LATERAL (SELECT c_name, c_acctbal FROM $customer c
         |         WHERE c.c_nationkey = n.n_nationkey
         |         ORDER BY c_acctbal DESC, c_name LIMIT 3) t
         |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin
    GQuery("join_lateral_topk", lateralSql("nation", "customer")) {
      (s, dir) =>
        Tables.nation(s, dir).createOrReplaceTempView("lat_nation")
        Tables.customer(s, dir).createOrReplaceTempView("lat_customer")
        s.sql(lateralSql("lat_nation", "lat_customer"))
    }
  }

  val all: Seq[GQuery] = Seq(joinHashEqui, joinBroadcast, joinSortmerge,
    joinMultiway, joinLeftOuter, joinSemi, joinAnti, joinThetaRange,
    joinAsof, joinAsofTolerance, joinTimeProximity, joinFullOuter,
    joinCross, joinBloomFiltered, joinShuffleHash, joinNullSafe,
    joinPointInTime, joinIntervalOverlap, joinSkewSalted,
    joinLateralTopk, joinAsofForward, joinAsofNearest,
    joinAsofSweep)
}
