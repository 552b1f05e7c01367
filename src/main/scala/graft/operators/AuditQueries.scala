package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GQuery
import graft.sources.Tables

/** Data-quality AUDITING — the rule-check / profiling family every
  * production ETL runs before (and after) a load: declarative
  * constraint violations counted table-wide, and per-column
  * statistical profiles. Both are pure aggregations, so the 100 TB
  * posture is the best possible: map-side-combining counts, anti-join
  * orphan checks on the join key's natural partitioning, no windows,
  * tiny outputs.
  */
object AuditQueries {

  /** One (rule, violations, checked) row per declarative
    * data-quality rule over the orders/lineitem/customer slice:
    * referential orphans (anti joins), domain checks (non-positive
    * quantity, discount range), cross-table temporal sanity (ship
    * date before its order's date — the one rule the synthetic
    * fixture genuinely violates), duplicate primary keys, and null
    * checks. The shape of Deequ/dbt-test-style validation, composed
    * from plain Spark aggregates.
    *
    * Scale shape: every rule is either a scan-side filter count
    * (partial-aggregating, predicate pushed) or a keyed anti/inner
    * join at the table's join grain; `checked` totals ride 1-row
    * scalar cross joins. Nothing shuffles more than once. */
  val dqAudit: GQuery = GQuery(
    "dq_audit",
    """SELECT * FROM (
      |  SELECT 'lineitem_orphan_orderkey' AS rule,
      |    CAST(count(*) AS BIGINT) AS violations,
      |    CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS checked
      |  FROM lineitem l WHERE NOT EXISTS
      |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |  UNION ALL
      |  SELECT 'orders_orphan_custkey', CAST(count(*) AS BIGINT),
      |    CAST((SELECT count(*) FROM orders) AS BIGINT)
      |  FROM orders o WHERE NOT EXISTS
      |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |  UNION ALL
      |  SELECT 'lineitem_nonpositive_quantity', CAST(count(*) AS BIGINT),
      |    CAST((SELECT count(*) FROM lineitem) AS BIGINT)
      |  FROM lineitem WHERE l_quantity <= 0
      |  UNION ALL
      |  SELECT 'lineitem_discount_range', CAST(count(*) AS BIGINT),
      |    CAST((SELECT count(*) FROM lineitem) AS BIGINT)
      |  FROM lineitem WHERE l_discount < 0 OR l_discount > 0.5
      |  UNION ALL
      |  SELECT 'lineitem_ship_before_order', CAST(count(*) AS BIGINT),
      |    CAST((SELECT count(*) FROM lineitem) AS BIGINT)
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE l.l_shipdate < o.o_orderdate
      |  UNION ALL
      |  SELECT 'orders_dup_orderkey', CAST(count(*) AS BIGINT),
      |    CAST((SELECT count(*) FROM orders) AS BIGINT)
      |  FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
      |  UNION ALL
      |  SELECT 'orders_null_priority', CAST(count(*) AS BIGINT),
      |    CAST((SELECT count(*) FROM orders) AS BIGINT)
      |  FROM orders WHERE o_orderpriority IS NULL)
      |ORDER BY rule""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    val nLi = li.agg(count(lit(1)).cast("bigint").as("checked"))
    val nOrd = ord.agg(count(lit(1)).cast("bigint").as("checked"))
    def rule(name: String, viol: DataFrame, checked: DataFrame) =
      viol.agg(count(lit(1)).cast("bigint").as("violations"))
        .crossJoin(checked)
        .select(lit(name).as("rule"), col("violations"), col("checked"))
    rule("lineitem_orphan_orderkey",
        li.join(ord.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti"), nLi)
      .union(rule("orders_orphan_custkey",
        ord.join(cust.select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti"), nOrd))
      .union(rule("lineitem_nonpositive_quantity",
        li.filter(col("l_quantity") <= 0), nLi))
      .union(rule("lineitem_discount_range",
        li.filter(col("l_discount") < 0 || col("l_discount") > 0.5), nLi))
      .union(rule("lineitem_ship_before_order",
        li.select(col("l_orderkey"), col("l_shipdate"))
          .join(ord.select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") < col("o_orderdate")), nLi))
      .union(rule("orders_dup_orderkey",
        ord.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
          .filter(col("c") > 1), nOrd))
      .union(rule("orders_null_priority",
        ord.filter(col("o_orderpriority").isNull), nOrd))
      .orderBy(col("rule"))
  }

  /** Per-column PROFILE of the orders table — row count, non-null
    * count, exact distinct count, min/max (stringified so one schema
    * carries every column type): the "describe before you load"
    * profiling step of any ingestion pipeline, and the stats a rule
    * author reads to pick thresholds for [[dqAudit]].
    *
    * Scale shape: one aggregate per profiled column (Spark plans the
    * distinct via expand + two-phase aggregate — partial-combining,
    * skew-free on the scan's natural partitioning); the union is
    * 4 rows. */
  val dqProfile: GQuery = GQuery(
    "dq_profile",
    """SELECT * FROM (
      |  SELECT 'o_orderkey' AS col, 'bigint' AS dtype,
      |    CAST(count(*) AS BIGINT) AS n_rows,
      |    CAST(count(o_orderkey) AS BIGINT) AS n_nonnull,
      |    CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
      |    CAST(min(o_orderkey) AS VARCHAR) AS min_v,
      |    CAST(max(o_orderkey) AS VARCHAR) AS max_v
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_custkey', 'bigint', CAST(count(*) AS BIGINT),
      |    CAST(count(o_custkey) AS BIGINT),
      |    CAST(count(DISTINCT o_custkey) AS BIGINT),
      |    CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_orderstatus', 'string', CAST(count(*) AS BIGINT),
      |    CAST(count(o_orderstatus) AS BIGINT),
      |    CAST(count(DISTINCT o_orderstatus) AS BIGINT),
      |    min(o_orderstatus), max(o_orderstatus)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'o_orderpriority', 'string', CAST(count(*) AS BIGINT),
      |    CAST(count(o_orderpriority) AS BIGINT),
      |    CAST(count(DISTINCT o_orderpriority) AS BIGINT),
      |    min(o_orderpriority), max(o_orderpriority)
      |  FROM orders)
      |ORDER BY col""".stripMargin) { (s, dir) =>
    val ord = Tables.orders(s, dir)
    def profile(c: String, dtype: String): DataFrame =
      ord.agg(count(lit(1)).cast("bigint").as("n_rows"),
          count(col(c)).cast("bigint").as("n_nonnull"),
          countDistinct(col(c)).cast("bigint").as("n_distinct"),
          min(col(c)).cast("string").as("min_v"),
          max(col(c)).cast("string").as("max_v"))
        .select(lit(c).as("col"), lit(dtype).as("dtype"), col("n_rows"),
          col("n_nonnull"), col("n_distinct"), col("min_v"), col("max_v"))
    profile("o_orderkey", "bigint")
      .union(profile("o_custkey", "bigint"))
      .union(profile("o_orderstatus", "string"))
      .union(profile("o_orderpriority", "string"))
      .orderBy(col("col"))
  }

  /** FRESHNESS / staleness monitoring — "when did each feed last
    * write?", the third leg of the DQ stool after rule checks
    * ([[dqAudit]]) and profiles ([[dqProfile]]): per event_type, the
    * row count, last-seen event time, the lag behind the newest event
    * in the whole table (integer minutes on exact epoch-µs math), and
    * a stale flag at a 60-minute SLA. A silent upstream feed shows up
    * here hours before it shows up as a wrong dashboard.
    *
    * Scale shape: one map-side-combining (type → max ts, count)
    * aggregate over the scan — 5-row state per task — plus a 1-row
    * global-max broadcast cross join. Nothing else moves. Thin
    * binding of graft.streaming.AuditStreams (state + report), whose
    * streaming form runs the same aggregation continuously. */
  val dqFreshness: GQuery = GQuery(
    "dq_freshness",
    """WITH per AS (SELECT event_type, count(*) AS n_events,
      |    max(epoch_us(ts)) AS last_us FROM events GROUP BY event_type),
      |g AS (SELECT max(last_us) AS g_us FROM per)
      |SELECT event_type, CAST(n_events AS BIGINT) AS n_events,
      |  strftime(make_timestamp(last_us), '%Y-%m-%d %H:%M:%S')
      |    AS last_seen,
      |  CAST((g_us - last_us) // 60000000 AS BIGINT) AS lag_min,
      |  (g_us - last_us) // 60000000 > 60 AS stale
      |FROM per CROSS JOIN g
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    graft.streaming.AuditStreams.freshnessReport(
      graft.streaming.AuditStreams.freshnessState(Tables.events(s, dir)))
  }

  /** CATEGORICAL-DRIFT monitoring (PSI — population stability index):
    * the per-category share shift between two cohorts of orders (even
    * vs odd orderkey standing in for last-week vs this-week loads),
    * with each category's PSI term (pa−pb)·ln(pa/pb) — the standard
    * "did the input distribution move" gate of an ML-ops scorecard
    * (rule of thumb: Σ > 0.1 investigate, > 0.25 alarm). Shares
    * rounded to 6, the log to 8, the term one rounded double
    * expression — deterministic cross-engine.
    *
    * Scale shape: two map-side-combining category counts + two 1-row
    * totals + a ≤|categories| full-outer join. Nothing else moves. */
  val dqDriftPsi: GQuery = GQuery(
    "dq_drift_psi",
    """WITH a AS (SELECT o_orderpriority AS k, count(*) AS n FROM orders
      |           WHERE o_orderkey % 2 = 0 GROUP BY 1),
      |b AS (SELECT o_orderpriority AS k, count(*) AS n FROM orders
      |      WHERE o_orderkey % 2 = 1 GROUP BY 1),
      |t AS (SELECT (SELECT sum(n) FROM a) AS ta,
      |             (SELECT sum(n) FROM b) AS tb),
      |j AS (SELECT coalesce(a.k, b.k) AS k,
      |        round(CAST(coalesce(a.n, 0) AS DOUBLE) / ta, 6) AS pa,
      |        round(CAST(coalesce(b.n, 0) AS DOUBLE) / tb, 6) AS pb
      |      FROM a FULL OUTER JOIN b ON a.k = b.k CROSS JOIN t)
      |SELECT k, pa, pb,
      |  CAST(round((pa - pb) * round(ln(pa / pb), 8), 8) AS DOUBLE)
      |    AS psi_term
      |FROM j ORDER BY k""".stripMargin) { (s, dir) =>
    val ord = Tables.orders(s, dir)
    def half(parity: Int, nc: String) =
      ord.filter(col("o_orderkey") % 2 === parity)
        .groupBy(col("o_orderpriority").as(s"k$parity"))
        .agg(count(lit(1)).as(nc))
    val a = half(0, "na")
    val b = half(1, "nb")
    val ta = broadcast(a.agg(sum(col("na")).as("ta")))
    val tb = broadcast(b.agg(sum(col("nb")).as("tb")))
    a.join(b, col("k0") === col("k1"), "full_outer")
      .crossJoin(ta).crossJoin(tb)
      .select(coalesce(col("k0"), col("k1")).as("k"),
        round(coalesce(col("na"), lit(0L)).cast("double") / col("ta"), 6)
          .as("pa"),
        round(coalesce(col("nb"), lit(0L)).cast("double") / col("tb"), 6)
          .as("pb"))
      .select(col("k"), col("pa"), col("pb"),
        round((col("pa") - col("pb")) * round(log(col("pa") / col("pb")), 8),
          8).cast("double").as("psi_term"))
      .orderBy(col("k"))
  }

  /** NUMERIC-drift PSI — the binned companion of [[dqDriftPsi]] for
    * continuous columns: o_totalprice cut into 10 equal-width bins
    * over the GLOBAL min/max (the same boundaries for both cohorts —
    * per-cohort binning would hide the very shift being measured),
    * then the identical share-compare. Bin id is one floor expression
    * on doubles — identical both engines; the max value claps into
    * the last bin.
    *
    * Scale shape: a 1-row min/max scalar broadcast + one per-cohort
    * bin count (map-side combining, 10-key space) + the tiny
    * full-outer compare. */
  val dqDriftPsiNumeric: GQuery = GQuery(
    "dq_drift_psi_numeric",
    """WITH b AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
      |           FROM orders),
      |x AS (SELECT o_orderkey % 2 AS cohort,
      |        least(CAST(floor((o_totalprice - mn) / ((mx - mn) / 10))
      |              AS INT), 9) AS bkt
      |      FROM orders CROSS JOIN b),
      |a AS (SELECT bkt, count(*) AS n FROM x WHERE cohort = 0 GROUP BY 1),
      |c AS (SELECT bkt, count(*) AS n FROM x WHERE cohort = 1 GROUP BY 1),
      |t AS (SELECT (SELECT sum(n) FROM a) AS ta,
      |             (SELECT sum(n) FROM c) AS tb),
      |j AS (SELECT coalesce(a.bkt, c.bkt) AS bkt,
      |        round(CAST(coalesce(a.n, 0) AS DOUBLE) / ta, 6) AS pa,
      |        round(CAST(coalesce(c.n, 0) AS DOUBLE) / tb, 6) AS pb
      |      FROM a FULL OUTER JOIN c ON a.bkt = c.bkt CROSS JOIN t)
      |SELECT bkt, pa, pb,
      |  CAST(round((pa - pb) * round(ln(pa / pb), 8), 8) AS DOUBLE)
      |    AS psi_term
      |FROM j ORDER BY bkt""".stripMargin) { (s, dir) =>
    val ord = Tables.orders(s, dir)
    val bounds = broadcast(ord.agg(min(col("o_totalprice")).as("mn"),
      max(col("o_totalprice")).as("mx")))
    val x = ord.crossJoin(bounds)
      .select((col("o_orderkey") % 2).as("cohort"),
        least(floor((col("o_totalprice") - col("mn"))
          / ((col("mx") - col("mn")) / 10)).cast("int"), lit(9)).as("bkt"))
    def half(parity: Int, kc: String, nc: String) =
      x.filter(col("cohort") === parity)
        .groupBy(col("bkt").as(kc)).agg(count(lit(1)).as(nc))
    val a = half(0, "k0", "na")
    val b = half(1, "k1", "nb")
    val ta = broadcast(a.agg(sum(col("na")).as("ta")))
    val tb = broadcast(b.agg(sum(col("nb")).as("tb")))
    a.join(b, col("k0") === col("k1"), "full_outer")
      .crossJoin(ta).crossJoin(tb)
      .select(coalesce(col("k0"), col("k1")).as("bkt"),
        round(coalesce(col("na"), lit(0L)).cast("double") / col("ta"), 6)
          .as("pa"),
        round(coalesce(col("nb"), lit(0L)).cast("double") / col("tb"), 6)
          .as("pb"))
      .select(col("bkt"), col("pa"), col("pb"),
        round((col("pa") - col("pb")) * round(log(col("pa") / col("pb")), 8),
          8).cast("double").as("psi_term"))
      .orderBy(col("bkt"))
  }

  /** IQR OUTLIER AUDIT — the Tukey-fence anomaly count per group (the
    * box-plot rule every profiling tool ships): per order priority,
    * exact q1/q3 of o_totalprice, fences at ±1.5·IQR, and the count
    * of orders outside them. Exact interpolated percentiles (the
    * agg_percentiles cross-engine contract) make the fences identical
    * doubles in both engines, so the boundary comparisons land
    * identically; fences are rounded to 4 only for display.
    *
    * Scale shape: one per-group percentile aggregate (5 groups), the
    * 5-row fence frame broadcast back onto the scan, and a
    * map-side-combining conditional count — two passes, no window,
    * no sort of the data. */
  val dqAnomalyIqr: GQuery = GQuery(
    "dq_anomaly_iqr",
    """WITH st AS (
      |  SELECT o_orderpriority AS pr, count(*) AS n,
      |    quantile_cont(o_totalprice, 0.25) AS q1,
      |    quantile_cont(o_totalprice, 0.75) AS q3
      |  FROM orders GROUP BY o_orderpriority),
      |fen AS (
      |  SELECT pr, n, q1 - 1.5 * (q3 - q1) AS lo,
      |    q3 + 1.5 * (q3 - q1) AS hi
      |  FROM st)
      |SELECT pr AS o_orderpriority, CAST(n AS BIGINT) AS n_checked,
      |  CAST(count(CASE WHEN o_totalprice < lo OR o_totalprice > hi
      |    THEN 1 END) AS BIGINT) AS n_outliers,
      |  round(lo, 4) AS fence_lo, round(hi, 4) AS fence_hi
      |FROM orders JOIN fen ON o_orderpriority = pr
      |GROUP BY pr, n, lo, hi
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    val fen = orders.groupBy(col("o_orderpriority").as("pr"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(o_totalprice, 0.25d)").as("q1"),
        expr("percentile(o_totalprice, 0.75d)").as("q3"))
      .select(col("pr"), col("n"),
        (col("q1") - lit(1.5) * (col("q3") - col("q1"))).as("lo"),
        (col("q3") + lit(1.5) * (col("q3") - col("q1"))).as("hi"))
    orders.join(broadcast(fen), col("o_orderpriority") === col("pr"))
      .groupBy(col("pr"), col("n"), col("lo"), col("hi"))
      .agg(count(when(col("o_totalprice") < col("lo") ||
        col("o_totalprice") > col("hi"), 1)).as("n_outliers"))
      .select(col("pr").as("o_orderpriority"),
        col("n").as("n_checked"), col("n_outliers"),
        round(col("lo"), 4).as("fence_lo"),
        round(col("hi"), 4).as("fence_hi"))
      .orderBy(col("o_orderpriority"))
  }

  /** Benford's-law first-digit audit of o_totalprice — the classic
    * fabricated-data / broken-upstream detector: the leading digit of
    * naturally-occurring amounts follows P(d) = log10(1 + 1/d); a
    * synthetic or truncated feed does not. Output is the per-digit
    * observed count, observed vs expected share, and the chi-square
    * contribution (n_d − N·p_d)²/(N·p_d).
    *
    * Determinism: the digit comes from the TEXT of the DECIMAL(18,2)
    * view (both engines render decimals in plain `1234.56` form, and
    * every o_totalprice ≥ 1 so char 1 is always a significant digit)
    * — no double log10/floor on the extraction path; the expected-
    * share math is identical formula text on both sides, rounded 6.
    *
    * Scale shape: a 1-char projection + 9-group map-side-combining
    * count; the share/chi² arithmetic is a 9-row window. The audit
    * reads ONE column (ReadSchema prunes the rest). */
  val dqBenford: GQuery = GQuery(
    "dq_benford",
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2))
      |      AS VARCHAR), 1, 1) AS INT) AS digit,
      |    count(*) AS n
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT digit, n, CAST(sum(n) OVER () AS BIGINT) AS tot FROM d)
      |SELECT digit, CAST(n AS BIGINT) AS n,
      |  round(n / CAST(tot AS DOUBLE), 6) AS obs_share,
      |  round(log10(1 + 1.0 / digit), 6) AS exp_share,
      |  round(power(n - tot * log10(1 + 1.0 / digit), 2)
      |    / (tot * log10(1 + 1.0 / digit)), 6) AS chi2_term
      |FROM t
      |ORDER BY digit""".stripMargin) { (s, dir) =>
    val d = Tables.orders(s, dir)
      .select(substring(col("o_totalprice").cast("decimal(18,2)")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    d.withColumn("tot", sum(col("n")).over(Window.partitionBy()))
      .selectExpr("digit", "CAST(n AS BIGINT) AS n",
        "round(n / CAST(tot AS DOUBLE), 6) AS obs_share",
        "round(log10(1 + 1.0 / digit), 6) AS exp_share",
        "round(power(n - tot * log10(1 + 1.0 / digit), 2)" +
          " / (tot * log10(1 + 1.0 / digit)), 6) AS chi2_term")
      .orderBy(col("digit"))
  }

  /** FUNCTIONAL-DEPENDENCY audit — the schema-discovery pass profilers
    * (Metanome/HyFD-style) run before trusting "X determines Y"
    * assumptions baked into joins and dedup keys: for each candidate
    * FD, the share of determinant keys that map to MORE than one
    * distinct dependent value (an exact FD holds iff that share is 0).
    * Three candidates over the fixture, chosen so the report shows
    * both outcomes: part→supplier (violated by design — multi-sourced
    * parts), customer→priority (violated — priorities vary per
    * order), nation→segment (violated — segments span nations).
    *
    * Scale shape: each FD is one exact distinct-count aggregate keyed
    * by its determinant — the (lhs, rhs) distinct collapses map-side,
    * the per-key rollup is the second map-side-combining pass, and the
    * final per-FD row is a 1-row reduce; three bounded rows union. */
  val dqFdViolations: GQuery = {
    def fdSql(fd: String, tbl: String, lhs: String, rhs: String) =
      s"""SELECT '$fd' AS fd, CAST(count(*) AS BIGINT) AS n_keys,
         |  CAST(count(*) FILTER (WHERE nd > 1) AS BIGINT)
         |    AS violating_keys,
         |  round(CAST(count(*) FILTER (WHERE nd > 1) AS DOUBLE)
         |    / count(*), 6) AS violation_rate,
         |  CAST(max(nd) AS BIGINT) AS max_distinct_rhs
         |FROM (SELECT $lhs, count(DISTINCT $rhs) AS nd
         |      FROM $tbl GROUP BY $lhs)""".stripMargin
    GQuery("dq_fd_violations",
      s"""${fdSql("customer: c_nationkey -> c_mktsegment", "customer",
            "c_nationkey", "c_mktsegment")}
         |UNION ALL
         |${fdSql("lineitem: l_partkey -> l_suppkey", "lineitem",
            "l_partkey", "l_suppkey")}
         |UNION ALL
         |${fdSql("orders: o_custkey -> o_orderpriority", "orders",
            "o_custkey", "o_orderpriority")}
         |ORDER BY fd""".stripMargin) { (s, dir) =>
      def fd(name: String, t: DataFrame, lhs: String, rhs: String) =
        t.groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("nd"))
          .agg(count(lit(1)).as("n_keys"),
            count(when(col("nd") > 1, 1)).as("violating_keys"),
            round(count(when(col("nd") > 1, 1)).cast("double")
              / count(lit(1)), 6).as("violation_rate"),
            max(col("nd")).as("max_distinct_rhs"))
          .select(lit(name).as("fd"), col("n_keys"),
            col("violating_keys"), col("violation_rate"),
            col("max_distinct_rhs"))
      fd("customer: c_nationkey -> c_mktsegment",
          Tables.customer(s, dir), "c_nationkey", "c_mktsegment")
        .unionAll(fd("lineitem: l_partkey -> l_suppkey",
          Tables.lineitem(s, dir), "l_partkey", "l_suppkey"))
        .unionAll(fd("orders: o_custkey -> o_orderpriority",
          Tables.orders(s, dir), "o_custkey", "o_orderpriority"))
        .orderBy(col("fd"))
    }
  }

  /** CROSS-TABLE RECONCILIATION — the warehouse close-of-books check:
    * does each order header's total agree with the sum of its lines
    * (price·(1−disc)·(1+tax))? One report row with matched /
    * overbilled / underbilled counts at a ±0.01 tolerance, headers
    * with no lines, and the drift moments. Each FACTOR (price,
    * discount, tax) quantizes to its grid BEFORE the multiply, and
    * the per-line value is pure DECIMAL arithmetic — never "round a
    * double product", whose half-way cases fall differently across
    * engines — so diffs are exact decimals and every count is an
    * integer compare; the fixture intentionally
    * does NOT reconcile (synthetic totals) — the operator's job is to
    * REPORT that truthfully, which is exactly what a recon does.
    *
    * Scale shape: one map-side-combining per-order aggregate over
    * lineitem, one order-keyed join, one full-outer-ish rollup to a
    * single row; no state beyond the order grain. */
  val dqReconciliation: GQuery = GQuery(
    "dq_reconciliation",
    """WITH ls AS (
      |  SELECT l_orderkey,
      |    CAST(sum(CAST(round(l_extendedprice, 2) AS DECIMAL(14,2))
      |             * (1 - CAST(round(l_discount, 2) AS DECIMAL(4,2)))
      |             * (1 + CAST(round(l_tax, 2) AS DECIMAL(4,2))))
      |         AS DECIMAL(32,6)) AS actual
      |  FROM lineitem GROUP BY 1),
      |j AS (
      |  SELECT o.o_orderkey,
      |    CAST(round(o.o_totalprice, 2) AS DECIMAL(18,2)) AS expected,
      |    ls.actual
      |  FROM orders o LEFT JOIN ls ON o.o_orderkey = ls.l_orderkey)
      |SELECT
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(count(*) FILTER (WHERE actual IS NULL) AS BIGINT)
      |    AS n_no_lines,
      |  CAST(count(*) FILTER (WHERE abs(actual - expected) <= 0.01)
      |       AS BIGINT) AS n_matched,
      |  CAST(count(*) FILTER (WHERE actual - expected > 0.01)
      |       AS BIGINT) AS n_overbilled,
      |  CAST(count(*) FILTER (WHERE expected - actual > 0.01)
      |       AS BIGINT) AS n_underbilled,
      |  CAST(max(abs(actual - expected)) AS DOUBLE) AS max_abs_diff,
      |  round(CAST(sum(actual - expected) AS DOUBLE)
      |        / count(actual), 6) AS mean_diff
      |FROM j""".stripMargin) { (s, dir) =>
    val ls = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(round(col("l_extendedprice"), 2).cast("decimal(14,2)")
          * (lit(1) - round(col("l_discount"), 2).cast("decimal(4,2)"))
          * (lit(1) + round(col("l_tax"), 2).cast("decimal(4,2)")))
        .cast("decimal(32,6)").as("actual"))
    val j = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        round(col("o_totalprice"), 2).cast("decimal(18,2)")
          .as("expected"))
      .join(ls, col("o_orderkey") === col("l_orderkey"), "left")
    j.agg(
      count(lit(1)).cast("bigint").as("n_orders"),
      sum(when(col("actual").isNull, 1).otherwise(0)).cast("bigint")
        .as("n_no_lines"),
      sum(when(abs(col("actual") - col("expected")) <= 0.01, 1)
        .otherwise(0)).cast("bigint").as("n_matched"),
      sum(when(col("actual") - col("expected") > 0.01, 1).otherwise(0))
        .cast("bigint").as("n_overbilled"),
      sum(when(col("expected") - col("actual") > 0.01, 1).otherwise(0))
        .cast("bigint").as("n_underbilled"),
      max(abs(col("actual") - col("expected"))).cast("double")
        .as("max_abs_diff"),
      round(sum(col("actual") - col("expected")).cast("double")
        / count(col("actual")), 6).as("mean_diff"))
  }

  /** TWO-SAMPLE KOLMOGOROV–SMIRNOV drift test — the EDF-based
    * complement to dq_drift_psi's binned divergence: D = max
    * |F₁ − F₂| between the first and second half of the order
    * history (split at the midpoint date, a 1-row data-driven
    * anchor), flagged at the α = 0.05 critical value
    * 1.358·√((n₁+n₂)/(n₁n₂)). Prices land on a FIXED $500 bucket
    * grid before the EDFs — the grid-bucketed KS every monitoring
    * system actually runs, because the exact-EDF form needs a
    * cumulative walk over every distinct value (an unpartitioned
    * window over the corpus — the win_pareto_share scale trap), while
    * the bucket grid bounds the window at ≤ |price range / 500| rows
    * with all counts combined map-side. Counts are exact integers;
    * each EDF value is one double divide.
    *
    * Scale shape: one map-side-combining bucket aggregate, a bounded
    * window over the bucket grid, a 1-row max. */
  val dqDistributionKs: GQuery = GQuery(
    "dq_distribution_ks",
    """WITH b AS (
      |  SELECT CAST(min(o_orderdate) AS DATE)
      |    + CAST(date_diff('day', CAST(min(o_orderdate) AS DATE),
      |                     CAST(max(o_orderdate) AS DATE))
      |           / 2 AS INT) AS mid
      |  FROM orders),
      |l AS (
      |  SELECT CAST(floor(o_totalprice / 500) AS BIGINT) AS bkt,
      |    CASE WHEN CAST(o_orderdate AS DATE) < mid THEN 1 ELSE 2 END
      |      AS g
      |  FROM orders, b),
      |n AS (
      |  SELECT
      |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
      |  FROM l),
      |c AS (
      |  SELECT bkt,
      |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
      |  FROM l GROUP BY 1),
      |e AS (
      |  SELECT bkt,
      |    CAST(sum(c1) OVER (ORDER BY bkt) AS BIGINT) AS f1,
      |    CAST(sum(c2) OVER (ORDER BY bkt) AS BIGINT) AS f2
      |  FROM c)
      |SELECT n.n1, n.n2,
      |  round(max(abs(CAST(f1 AS DOUBLE) / n.n1
      |                - CAST(f2 AS DOUBLE) / n.n2)), 6) AS ks_d,
      |  round(1.358 * sqrt(CAST(n.n1 + n.n2 AS DOUBLE)
      |                     / (CAST(n.n1 AS DOUBLE) * n.n2)), 6)
      |    AS d_critical,
      |  CAST(max(abs(CAST(f1 AS DOUBLE) / n.n1
      |               - CAST(f2 AS DOUBLE) / n.n2))
      |    > 1.358 * sqrt(CAST(n.n1 + n.n2 AS DOUBLE)
      |                   / (CAST(n.n1 AS DOUBLE) * n.n2)) AS BOOLEAN)
      |    AS drift_detected
      |FROM e CROSS JOIN n
      |GROUP BY n.n1, n.n2""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val anchor = o.agg(
      (min(to_date(col("o_orderdate"))) + (datediff(
        max(to_date(col("o_orderdate"))),
        min(to_date(col("o_orderdate")))) / 2).cast("int"))
        .as("mid"))
    val l = o.crossJoin(broadcast(anchor))
      .select(floor(col("o_totalprice") / 500).cast("bigint").as("bkt"),
        when(to_date(col("o_orderdate")) < col("mid"), 1).otherwise(2)
          .as("g"))
    val n = l.agg(
      sum(when(col("g") === 1, 1).otherwise(0)).cast("bigint").as("n1"),
      sum(when(col("g") === 2, 1).otherwise(0)).cast("bigint").as("n2"))
    val c = l.groupBy(col("bkt"))
      .agg(sum(when(col("g") === 1, 1).otherwise(0)).cast("bigint")
        .as("c1"),
        sum(when(col("g") === 2, 1).otherwise(0)).cast("bigint")
          .as("c2"))
    val w = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = c.select(col("bkt"),
      sum(col("c1")).over(w).cast("bigint").as("f1"),
      sum(col("c2")).over(w).cast("bigint").as("f2"))
    val d = abs(col("f1").cast("double") / col("n1")
      - col("f2").cast("double") / col("n2"))
    val crit = lit(1.358) * sqrt((col("n1") + col("n2")).cast("double")
      / (col("n1").cast("double") * col("n2")))
    e.crossJoin(broadcast(n))
      .groupBy(col("n1"), col("n2"))
      .agg(max(d).as("dmax"))
      .select(col("n1"), col("n2"),
        round(col("dmax"), 6).as("ks_d"),
        round(crit, 6).as("d_critical"),
        (col("dmax") > crit).cast("boolean").as("drift_detected"))
  }

  /** NULL-RATE TREND monitoring — the schema-rot detector (a field
    * silently going null is the classic upstream breakage: a renamed
    * producer column arrives as NULL and every mean/sum downstream
    * quietly drifts). The fixture has no null columns, so — the
    * text_pii_audit planting precedent — nulls are PLANTED
    * deterministically with a per-day RISING rate (null iff
    * portable-hash(event_id) % 100 < 2 + day-of-month), and the audit
    * must both report the daily profile and DETECT the trend: the
    * Mann–Kendall S statistic over the daily null rates, computed in
    * EXACT integer arithmetic (rate comparisons cross-multiply —
    * sign(n_null_j·n_rows_i − n_null_i·n_rows_j) — so no float ever
    * enters the ordering), with an integer verdict rule
    * (10·|S| ≥ n_days·(n_days−1), i.e. |S| beyond 20% of the maximum
    * pair count). Output: one row per day (day, n_rows, n_null,
    * null_rate) + the global (s_stat, verdict) columns.
    *
    * Scale shape: one map-side-combining (day, dom) aggregate over
    * the corpus; the MK pair join runs on the DAILY frame — bounded
    * by the calendar (365 rows/year), never the corpus — and the two
    * 1-row scalars broadcast. */
  val dqNullTrend: GQuery = GQuery(
    "dq_null_trend",
    s"""WITH e AS (SELECT event_id, epoch_us(ts) AS us FROM events),
       |d AS (SELECT event_id, us // 86400000000 AS didx,
       |        date_part('day', make_timestamp(us)) AS dom FROM e),
       |n AS (SELECT didx, dom,
       |    CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(sum(CASE WHEN CAST(concat('0x', substr(md5(concat(
       |        'nul:', CAST(event_id AS VARCHAR))), 1, 12)) AS BIGINT)
       |        % 100 < 2 + dom THEN 1 ELSE 0 END) AS BIGINT) AS n_null
       |  FROM d GROUP BY didx, dom),
       |s AS (SELECT CAST(coalesce(sum(
       |    CASE WHEN b.n_null * a.n_rows > a.n_null * b.n_rows THEN 1
       |         WHEN b.n_null * a.n_rows < a.n_null * b.n_rows THEN -1
       |         ELSE 0 END), 0) AS BIGINT) AS s_stat
       |  FROM n a JOIN n b ON a.didx < b.didx),
       |c AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM n)
       |SELECT strftime(make_timestamp(didx * 86400000000),
       |    '%Y-%m-%d') AS day,
       |  n_rows, n_null,
       |  round(CAST(n_null AS DOUBLE) / n_rows, 6) AS null_rate,
       |  s.s_stat,
       |  CASE WHEN 10 * s.s_stat >= c.n_days * (c.n_days - 1)
       |         THEN 'rising'
       |       WHEN 10 * s.s_stat <= -(c.n_days * (c.n_days - 1))
       |         THEN 'falling'
       |       ELSE 'stable' END AS verdict
       |FROM n CROSS JOIN s CROSS JOIN c
       |ORDER BY day""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir).select(
      col("event_id"),
      expr("unix_micros(ts) div 86400000000").as("didx"),
      dayofmonth(col("ts")).as("dom"))
    val planted = pmod(graft.api.Sampling.portableHash(
      col("event_id"), "nul:"), lit(100L)) < (lit(2) + col("dom"))
    val daily = d.groupBy(col("didx"), col("dom"))
      .agg(count(lit(1)).cast("bigint").as("n_rows"),
        sum(when(planted, 1L).otherwise(0L)).cast("bigint")
          .as("n_null"))
    val a = daily.select(col("didx").as("di"),
      col("n_rows").as("ra"), col("n_null").as("na"))
    val b = daily.select(col("didx").as("dj"),
      col("n_rows").as("rb"), col("n_null").as("nb"))
    val sStat = a.join(b, col("di") < col("dj"))
      .agg(coalesce(sum(
        when(col("nb") * col("ra") > col("na") * col("rb"), 1L)
          .when(col("nb") * col("ra") < col("na") * col("rb"), -1L)
          .otherwise(0L)), lit(0L)).cast("bigint").as("s_stat"))
    val nDays = daily.agg(count(lit(1)).cast("bigint").as("n_days"))
    daily.crossJoin(broadcast(sStat)).crossJoin(broadcast(nDays))
      .select(
        date_format(expr("timestamp_micros(didx * 86400000000)"),
          "yyyy-MM-dd").as("day"),
        col("n_rows"), col("n_null"),
        round(col("n_null").cast("double") / col("n_rows"), 6)
          .as("null_rate"),
        col("s_stat"),
        when(lit(10L) * col("s_stat")
            >= col("n_days") * (col("n_days") - 1), "rising")
          .when(lit(10L) * col("s_stat")
            <= -(col("n_days") * (col("n_days") - 1)), "falling")
          .otherwise("stable").as("verdict"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------------------------
  // Exact binomial testing + Benjamini–Hochberg FDR control
  // ---------------------------------------------------------------

  /** Shared p-value pipeline for [[dqBinomialTest]] / [[dqBhFdr]]:
    * per-customer one-sided EXACT binomial tail p-value for "this
    * customer's share of hit-orders exceeds the global urgent rate".
    *
    * The tail P(X ≥ x | n, p0) is computed WITHOUT erf/exp/pow — the
    * transcendental the DuckDB oracle lacks, which kept a z-score BH
    * blocked since round 11 — by a single k-increasing fold: steps
    * 1..n multiply up q0ⁿ (= pmf(0)), steps n+1..n+x walk the
    * multiplicative pmf recurrence pmf(k+1) = pmf(k)·(n−k)/(k+1)·p0/q0
    * while accumulating the LOWER tail; p = 1 − Σ_{k<x} pmf(k). Every
    * operation is IEEE-exact (±,×,÷ are correctly rounded and the
    * fold order is pinned), so Spark's `aggregate` HOF and the
    * oracle's recursive CTE produce bit-identical doubles — no
    * rounding grid needed on the DECISION path. No underflow: pmf ≥
    * q0ⁿ ≥ 0.8²⁵ ≈ 4e-3 at the fixture's n ≤ 25.
    *
    * Scale shape — the reason this is 100 TB-honest: the trial count
    * per entity is bounded BY TEST DESIGN (orders per customer stays
    * ~10–25 at any corpus size; entities scale, trials per entity
    * don't), so the p-value computation collapses onto the distinct
    * (n, x) GRID — vocabulary, not data (110 cells at sf0.01). Two
    * map-side-combining aggregates reach the grid; the O(n+x) ≤ 50-
    * step fold runs once per CELL, not per customer.
    *
    * `planted = true` widens the hit predicate for the carved cohort
    * custkey ≡ 7 (mod 10) to urgent∪high∪medium — deterministic
    * ground-truth injection in the house style (the merge feeds'
    * %-carvings, dq_null_trend's planted null rate), because the
    * fixture is a perfect binomial null (dispersion 1.00) and a
    * correction demo over pure null rejects nothing. Returns
    * (elev, n, x, n_customers, p0, p). */
  private def binomPvals(s: SparkSession, dir: String,
      planted: Boolean): DataFrame = {
    val orders = Tables.orders(s, dir)
    val isUrg = col("o_orderpriority") === "1-URGENT"
    val hit = if (planted)
      isUrg || (col("o_custkey") % 10 === 7 &&
        col("o_orderpriority").isin("2-HIGH", "3-MEDIUM"))
    else isUrg
    val rates = orders.agg(count(lit(1)).as("tot"),
      count(when(isUrg, 1)).as("urg"))
    val pc = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), count(when(hit, 1)).as("x"))
      .withColumn("elev",
        if (planted) col("o_custkey") % 10 === 7 else lit(false))
    pc.groupBy(col("elev"), col("n"), col("x"))
      .agg(count(lit(1)).as("n_customers"))
      .crossJoin(broadcast(rates))
      .withColumn("p0",
        col("urg").cast("double") / col("tot").cast("double"))
      .withColumn("q0",
        lit(1) - col("urg").cast("double") / col("tot").cast("double"))
      .withColumn("fold", expr(
        """aggregate(sequence(1, CAST(n + x AS INT)),
          |  named_struct('pmf', CAST(1 AS DOUBLE),
          |               'tail', CAST(0 AS DOUBLE)),
          |  (acc, t) -> CASE WHEN t <= n THEN named_struct(
          |      'pmf', acc.pmf * q0, 'tail', acc.tail)
          |    ELSE named_struct(
          |      'pmf', acc.pmf * CAST(n - (t - n - 1) AS DOUBLE)
          |               / CAST(t - n AS DOUBLE) * p0 / q0,
          |      'tail', acc.tail + acc.pmf) END)""".stripMargin))
      .withColumn("p", expr("1 - fold.tail"))
      .select(col("elev"), col("n"), col("x"), col("n_customers"),
        col("p0"), col("p"))
  }

  /** Oracle twin of [[binomPvals]]: the recursive-CTE spelling of the
    * same fold, step-for-step — the CASE arithmetic is copied
    * verbatim from the Spark lambda (with the step index s = t+1
    * substituted), so both engines execute the identical ×/÷ chain.
    * `hitFilter` is the x-counting predicate; `elevExpr` the cohort
    * flag. Leaves `pv (elev, n, x, n_customers, p0, p)` in scope;
    * the caller opens `WITH RECURSIVE`. */
  private def binomPvalCtes(hitFilter: String, elevExpr: String) =
    s"""rt AS (SELECT count(*) AS tot,
       |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urg
       |  FROM orders),
       |pc AS (SELECT o_custkey, $elevExpr AS elev, count(*) AS n,
       |    count(*) FILTER (WHERE $hitFilter) AS x
       |  FROM orders GROUP BY 1, 2),
       |grid AS (SELECT elev, n, x, count(*) AS n_customers
       |  FROM pc GROUP BY 1, 2, 3),
       |st AS (
       |  SELECT g.elev, g.n, g.x, g.n_customers,
       |    CAST(rt.urg AS DOUBLE) / CAST(rt.tot AS DOUBLE) AS p0,
       |    1 - CAST(rt.urg AS DOUBLE) / CAST(rt.tot AS DOUBLE) AS q0,
       |    0 AS t, CAST(1 AS DOUBLE) AS pmf, CAST(0 AS DOUBLE) AS tail
       |  FROM grid g, rt
       |  UNION ALL
       |  SELECT elev, n, x, n_customers, p0, q0, t + 1,
       |    CASE WHEN t + 1 <= n THEN pmf * q0
       |         ELSE pmf * CAST(n - (t + 1 - n - 1) AS DOUBLE)
       |                / CAST(t + 1 - n AS DOUBLE) * p0 / q0 END,
       |    CASE WHEN t + 1 <= n THEN tail ELSE tail + pmf END
       |  FROM st WHERE t < n + x),
       |pv AS (SELECT elev, n, x, n_customers, p0, 1 - tail AS p
       |  FROM st WHERE t = n + x)""".stripMargin

  /** EXACT one-sided binomial test, per-customer urgent-order share
    * vs the global rate — the p-value table a dq pipeline feeds into
    * any multiple-testing correction. The fixture is a genuine
    * binomial null and the row reports that truthfully (min p-value
    * well above any sensible per-test bar once n is small) — the
    * dq_reconciliation discipline: the operator's job is the honest
    * readout, not a manufactured alarm. One output row per (n, x)
    * grid cell; see [[binomPvals]] for the fold and the 100 TB
    * shape. */
  val dqBinomialTest: GQuery = GQuery(
    "dq_binomial_test",
    s"""WITH RECURSIVE
       |${binomPvalCtes("o_orderpriority = '1-URGENT'", "FALSE")}
       |SELECT CAST(n AS BIGINT) AS n_orders,
       |  CAST(x AS BIGINT) AS n_urgent,
       |  CAST(n_customers AS BIGINT) AS n_customers,
       |  round(p0, 6) AS p_null, round(p, 6) AS p_value
       |FROM pv
       |ORDER BY n_orders, n_urgent""".stripMargin) { (s, dir) =>
    binomPvals(s, dir, planted = false)
      .select(col("n").cast("bigint").as("n_orders"),
        col("x").cast("bigint").as("n_urgent"),
        col("n_customers").cast("bigint").as("n_customers"),
        round(col("p0"), 6).as("p_null"),
        round(col("p"), 6).as("p_value"))
      .orderBy(col("n_orders"), col("n_urgent"))
  }

  /** BENJAMINI–HOCHBERG FDR control over the exact binomial p-values
    * — the multiple-testing correction row blocked since round 11 on
    * "no portable normal CDF" and unblocked by going EXACT instead
    * (see [[binomPvals]]). A deterministic elevated cohort (custkey
    * ≡ 7 mod 10, hit set widened to urgent∪high∪medium) provides
    * planted ground truth, so the row certifies the full contract:
    * rejections grow with α, and the EMPIRICAL false-discovery rate
    * stays under the α the procedure promises (0 / 0 / .016 / .079
    * at α = .01 / .05 / .10 / .25 on sf0.01).
    *
    * The step-up runs WITHOUT sorting m per-test rows: p_(i) ≤ iα/m
    * holds for some index in a tie block iff it holds at the block's
    * LAST index, so k* = max qualifying cumulative-count over the
    * distinct-p blocks — and the blocks live on the bounded (n, x)
    * grid. At 100 TB (billions of customers) the correction still
    * touches only the grid: the classic "sort all m p-values" is
    * replaced by two grid aggregates + a window over ≤|grid| rows.
    * n_rejected ≡ Σ n_customers(p ≤ p_cut) by the same identity, so
    * the true/false-positive split joins on p_cut, no per-row rank.
    */
  val dqBhFdr: GQuery = GQuery(
    "dq_bh_fdr",
    s"""WITH RECURSIVE
       |${binomPvalCtes(
            "o_orderpriority = '1-URGENT' OR (o_custkey % 10 = 7 AND " +
            "o_orderpriority IN ('2-HIGH','3-MEDIUM'))",
            "o_custkey % 10 = 7")},
       |perp AS (SELECT p, sum(n_customers) AS cnt FROM pv GROUP BY p),
       |tots AS (SELECT sum(cnt) AS m FROM perp),
       |ob AS (SELECT p, cnt, sum(cnt) OVER (ORDER BY p) AS cum
       |  FROM perp),
       |al AS (SELECT * FROM (VALUES (CAST(0.01 AS DOUBLE)),
       |    (CAST(0.05 AS DOUBLE)), (CAST(0.1 AS DOUBLE)),
       |    (CAST(0.25 AS DOUBLE))) v(alpha)),
       |q AS (SELECT al.alpha, ob.p, ob.cum, tots.m,
       |    ob.p <= CAST(ob.cum AS DOUBLE) * al.alpha
       |      / CAST(tots.m AS DOUBLE) AS ok
       |  FROM ob CROSS JOIN tots CROSS JOIN al),
       |ks AS (SELECT alpha, max(m) AS m,
       |    coalesce(max(CASE WHEN ok THEN cum END), 0) AS kstar,
       |    max(CASE WHEN ok THEN p END) AS pcut
       |  FROM q GROUP BY alpha),
       |tp AS (SELECT ks.alpha,
       |    sum(CASE WHEN pv.elev THEN pv.n_customers ELSE 0 END)
       |      AS ntp
       |  FROM ks JOIN pv ON pv.p <= ks.pcut GROUP BY ks.alpha)
       |SELECT ks.alpha, CAST(ks.m AS BIGINT) AS m_tests,
       |  CAST(ks.kstar AS BIGINT) AS n_rejected,
       |  CAST(coalesce(tp.ntp, 0) AS BIGINT) AS n_true_pos,
       |  CAST(ks.kstar - coalesce(tp.ntp, 0) AS BIGINT)
       |    AS n_false_pos,
       |  CASE WHEN ks.kstar > 0
       |    THEN round(CAST(ks.kstar - coalesce(tp.ntp, 0) AS DOUBLE)
       |           / CAST(ks.kstar AS DOUBLE), 6)
       |    ELSE CAST(0 AS DOUBLE) END AS fdr_observed,
       |  coalesce(round(ks.pcut, 6), CAST(-1 AS DOUBLE)) AS p_cut,
       |  round(CAST(ks.kstar AS DOUBLE) * ks.alpha
       |    / CAST(ks.m AS DOUBLE), 6) AS bh_threshold
       |FROM ks LEFT JOIN tp ON ks.alpha = tp.alpha
       |ORDER BY ks.alpha""".stripMargin) { (s, dir) =>
    val pv = binomPvals(s, dir, planted = true)
    val perp = pv.groupBy(col("p")).agg(sum(col("n_customers")).as("cnt"))
    val tots = perp.agg(sum(col("cnt")).as("m"))
    // window over the distinct-p blocks: ≤ |grid| rows (vocabulary,
    // not data), never the m customers
    val ob = perp.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("p"))))
    val alphas = s.createDataFrame(
      Seq(0.01, 0.05, 0.1, 0.25).map(Tuple1(_))).toDF("alpha")
    val q = ob.crossJoin(broadcast(tots)).crossJoin(broadcast(alphas))
      .withColumn("ok", col("p") <= col("cum").cast("double")
        * col("alpha") / col("m").cast("double"))
    val ks = q.groupBy(col("alpha"))
      .agg(max(col("m")).as("m"),
        coalesce(max(when(col("ok"), col("cum"))), lit(0L)).as("kstar"),
        max(when(col("ok"), col("p"))).as("pcut"))
    val tp = ks.select(col("alpha").as("ta"), col("pcut").as("tc"))
      .join(pv, col("p") <= col("tc"))
      .groupBy(col("ta"))
      .agg(sum(when(col("elev"), col("n_customers")).otherwise(0L))
        .as("ntp"))
    ks.join(tp, col("alpha") === col("ta"), "left")
      .select(col("alpha"),
        col("m").cast("bigint").as("m_tests"),
        col("kstar").cast("bigint").as("n_rejected"),
        coalesce(col("ntp"), lit(0L)).cast("bigint").as("n_true_pos"),
        (col("kstar") - coalesce(col("ntp"), lit(0L))).cast("bigint")
          .as("n_false_pos"),
        when(col("kstar") > 0,
          round((col("kstar") - coalesce(col("ntp"), lit(0L)))
            .cast("double") / col("kstar").cast("double"), 6))
          .otherwise(lit(0.0)).as("fdr_observed"),
        coalesce(round(col("pcut"), 6), lit(-1.0)).as("p_cut"),
        round(col("kstar").cast("double") * col("alpha")
          / col("m").cast("double"), 6).as("bh_threshold"))
      .orderBy(col("alpha"))
  }

  val all: Seq[GQuery] = Seq(dqAudit, dqProfile, dqFreshness, dqDriftPsi,
    dqDriftPsiNumeric, dqAnomalyIqr, dqBenford, dqFdViolations,
    dqReconciliation, dqDistributionKs, dqNullTrend, dqBinomialTest,
    dqBhFdr)
}
