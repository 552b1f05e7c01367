package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GQuery
import graft.sources.Tables

/** Window functions (SURVEY.md §2.5).
  *
  * Scale notes: each query is one shuffle on the partition key, then a
  * sort within partitions — Spark's WindowExec streams frames without
  * materializing the whole partition except for unbounded-following
  * frames (not used here). Partition keys (segment, user, customer)
  * have bounded per-key cardinality, so no skew blowup at 100 TB; for
  * the rank-topk query the window+filter form beats a global sort
  * because the top-k filter happens before any global ordering.
  */
object WindowQueries {

  /** Top-3 orders by price per market segment (ranking + filter). */
  val winRankTopkPerGroup: GQuery = GQuery(
    "win_rank_topk_per_group",
    """SELECT c_mktsegment, rn, o_orderkey, o_totalprice
      |FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |WHERE rn <= 3
      |ORDER BY c_mktsegment, rn""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    // customer scales with SF — no broadcast hint, AQE decides
    o.join(c, col("o_custkey") === col("c_custkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("rn"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  /** Ranking family: rank / dense_rank / percent_rank over order years
    * (plenty of ties) + ntile(4) with a unique tiebreak. */
  val winRankDensePct: GQuery = GQuery(
    "win_rank_dense_pct",
    """SELECT o_orderkey, o_orderstatus,
      |  CAST(year(o_orderdate) AS INT) AS order_year,
      |  rank() OVER wy AS rnk,
      |  dense_rank() OVER wy AS drnk,
      |  round(percent_rank() OVER wy, 8) AS prnk,
      |  ntile(4) OVER (PARTITION BY o_orderstatus
      |    ORDER BY year(o_orderdate), o_orderkey) AS quartile
      |FROM orders
      |WINDOW wy AS (PARTITION BY o_orderstatus ORDER BY year(o_orderdate))
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val wy = Window.partitionBy(col("o_orderstatus"))
      .orderBy(year(col("o_orderdate")))
    val wt = Window.partitionBy(col("o_orderstatus"))
      .orderBy(year(col("o_orderdate")), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        year(col("o_orderdate")).cast("int").as("order_year"),
        rank().over(wy).as("rnk"),
        dense_rank().over(wy).as("drnk"),
        round(percent_rank().over(wy), 8).as("prnk"),
        ntile(4).over(wt).as("quartile"))
      .orderBy(col("o_orderkey"))
  }

  /** lag/lead of event value per user, time-ordered. */
  val winAnalytic: GQuery = GQuery(
    "win_analytic",
    """SELECT event_id, user_id, value,
      |  lag(value) OVER w AS prev_value,
      |  lead(value) OVER w AS next_value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"))
      .orderBy(col("event_id"))
  }

  /** 7-row (≈ weekly) moving average over daily sales. The daily sum is
    * rounded first so the moving-average inputs are identical across
    * engines; the final round lands far from any boundary (see the
    * rounding discipline note in GQuery). */
  val winFrameRows: GQuery = GQuery(
    "win_frame_rows",
    """SELECT strftime(day, '%Y-%m-%d') AS day,
      |  daily_sales,
      |  round(avg(daily_sales) OVER (ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS avg_7d
      |FROM (
      |  SELECT date_trunc('day', o_orderdate) AS day,
      |    round(sum(o_totalprice), 2) AS daily_sales
      |  FROM orders GROUP BY 1)
      |ORDER BY day""".stripMargin) { (s, dir) =>
    val w = Window.orderBy(col("day")).rowsBetween(-6, Window.currentRow)
    Tables.orders(s, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(round(sum(col("o_totalprice")), 2).as("daily_sales"))
      .withColumn("avg_7d", round(avg(col("daily_sales")).over(w), 2))
      .orderBy(col("day"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("daily_sales"), col("avg_7d"))
  }

  /** Running cumulative revenue per customer over time (RANGE frame:
    * same-day orders collapse into the same cumulative value). */
  val winFrameRange: GQuery = GQuery(
    "win_frame_range",
    """SELECT o_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_day,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate
      |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
      |    AS cum_spent
      |FROM orders
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
        round(sum(col("o_totalprice")).over(w), 2).as("cum_spent"))
      .orderBy(col("o_custkey"), col("order_day"), col("o_orderkey"))
  }

  /** cume_dist over tied keys (order years) — completes the ranking
    * family; exact rational output, no rounding needed, but rounded
    * anyway per the transcendental discipline (engines agree on the
    * small-integer division). */
  val winCumeDist: GQuery = GQuery(
    "win_cume_dist",
    """SELECT o_orderkey,
      |  round(cume_dist() OVER (PARTITION BY o_orderstatus
      |    ORDER BY year(o_orderdate)), 8) AS cd
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(year(col("o_orderdate")))
    Tables.orders(s, dir)
      .select(col("o_orderkey"), round(cume_dist().over(w), 8).as("cd"))
      .orderBy(col("o_orderkey"))
  }

  /** Time-INTERVAL range frame: per event, the count and exact-decimal
    * sum of the same type's events in the trailing hour — the rolling
    * rate/volume monitor shape. RANGE (not ROWS) so timestamp ties are
    * frame-inclusive as a SET: every engine sees the same frame
    * contents regardless of tie order, and the decimal sum is
    * order-independent within it. Partitioned by type — each
    * timeline sorts inside its own exchange partition. */
  val winRangeInterval: GQuery = {
    val over =
      """OVER (PARTITION BY event_type ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"""
        .stripMargin
    GQuery(
      "win_range_interval",
      s"""SELECT event_id, event_type,
         |  CAST(count(*) $over AS BIGINT) AS n_trailing_1h,
         |  CAST(round(sum(CAST(value AS DECIMAL(18,2))) $over, 2) AS DOUBLE)
         |    AS sum_trailing_1h
         |FROM events
         |ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.events(s, dir).selectExpr(
        "event_id", "event_type",
        s"CAST(count(*) $over AS BIGINT) AS n_trailing_1h",
        s"CAST(round(sum(CAST(value AS DECIMAL(18,2))) $over, 2) AS DOUBLE)" +
          " AS sum_trailing_1h")
        .orderBy(col("event_id"))
    }
  }

  /** 7-row moving MEDIAN over the daily order-revenue series — the
    * robust-statistics window (a moving average is ruined by one
    * outlier day; the median is not). Daily revenue aggregates on the
    * DECIMAL(18,2) grid (exact), is cast to DOUBLE (exact: the grid
    * values are far below 2^53 ulp loss), and the frame median
    * interpolates identically on both engines (Spark `percentile`
    * and DuckDB `quantile_cont` both average the middle pair on even
    * counts); round(4) clears any last-ulp pow/divide noise.
    *
    * Scale shape: one shuffle to the day grain (map-side combining
    * sum), then a single unpartitioned window over the BOUNDED daily
    * series (~2400 rows at any SF — the calendar, not the data,
    * bounds it), matching the repo's bounded-window policy
    * (WindowQueries.scala:107 precedent). */
  val winMovingMedian: GQuery = GQuery(
    "win_moving_median",
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |  FROM orders GROUP BY 1)
      |SELECT strftime(d, '%Y-%m-%d') AS day, round(rev, 2) AS rev,
      |  round(quantile_cont(rev, 0.5) OVER (ORDER BY d
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
      |FROM daily
      |ORDER BY day""".stripMargin) { (s, dir) =>
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").as("rev"))
    val w = Window.orderBy(col("d")).rowsBetween(-6, Window.currentRow)
    daily.select(
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        round(col("rev"), 2).as("rev"),
        round(percentile(col("rev"), lit(0.5)).over(w), 4).as("med7"))
      .orderBy(col("day"))
  }

  /** PARETO / REVENUE-CONCENTRATION CURVE — customers ranked by
    * revenue with each one's cumulative share of total revenue and an
    * in-top-80% flag (the 80/20 readout every account team asks for).
    *
    * The global running total is NOT a single-partition window: it
    * reuses graft.api.Text.packFromCounts' DISTRIBUTED prefix sum
    * (range-bucket by a sort key, per-bucket totals, broadcast base
    * offsets + within-bucket windows). The sort key is a zero-padded
    * string encoding of (max−revenue, custkey), whose lexicographic
    * order IS revenue-descending with a unique tiebreak. Revenue
    * rides the integer-cents grid end-to-end, so cum and tot are
    * exact integers; share is one rounded divide and the 80% flag an
    * integer compare (5·cum ≤ 4·tot) — zero float surface in the
    * decision.
    *
    * Scale shape: one groupBy to the customer grain, the prefix-sum
    * machinery's bounded moves (8-row base collect, broadcast), and
    * a 1-row total scalar cross join (PlanShapeSpec-documented). */
  val winParetoShare: GQuery = GQuery(
    "win_pareto_share",
    """WITH cr AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) * 100
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT o_custkey, cents,
      |    CAST(sum(cents) OVER (ORDER BY cents DESC, o_custkey)
      |      AS BIGINT) AS cum,
      |    CAST(sum(cents) OVER () AS BIGINT) AS tot
      |  FROM cr)
      |SELECT o_custkey, round(CAST(cents AS DOUBLE) / 100, 2) AS revenue,
      |  round(cum / CAST(tot AS DOUBLE), 6) AS cum_share,
      |  CAST(CASE WHEN 5 * cum <= 4 * tot THEN 1 ELSE 0 END AS INT)
      |    AS in_top80
      |FROM r
      |ORDER BY revenue DESC, o_custkey""".stripMargin) { (s, dir) =>
    val cr = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg((sum(round(col("o_totalprice"), 2).cast("decimal(18,2)"))
        * 100).cast("bigint").as("cents"))
    // Fixed-width descending-revenue sort key. %016d holds cents up
    // to 1e15 − 1 (a $10-trillion-lifetime customer); beyond that the
    // zero-padded field would go negative and silently break the
    // lexicographic order, so out-of-range FAILS FAST instead —
    // a per-row branch, still whole-stage codegen'd.
    val centsChecked = lit(1000000000000000L) -
      graft.api.Keys.checkedRange(col("cents"), 0L, 1000000000000000L,
        "win_pareto_share: customer revenue cents")
    val keyed = cr.select(
      format_string("%016d#%012d", centsChecked,
        col("o_custkey")).as("k"),
      col("o_custkey"), col("cents"))
    val packed = graft.api.Text.packFromCounts(
      keyed.select(col("k"), col("cents")), "k", "cents",
      seqLen = 1, ranges = 8)
      .select(col("k"), (col("off") + col("tok")).as("cum"))
    val tot = cr.agg(sum(col("cents")).cast("bigint").as("tot"))
    keyed.join(packed, Seq("k")).crossJoin(tot)
      .select(col("o_custkey"),
        round(col("cents").cast("double") / 100, 2).as("revenue"),
        round(col("cum") / col("tot").cast("double"), 6).as("cum_share"),
        when(lit(5) * col("cum") <= lit(4) * col("tot"), 1)
          .otherwise(0).cast("int").as("in_top80"))
      .orderBy(col("revenue").desc, col("o_custkey"))
  }

  /** MAXIMUM-DRAWDOWN report over the daily revenue series — the
    * running-peak decline readout (finance's risk staple, equally
    * useful for "how far did daily volume fall from its peak"
    * capacity reviews): the 10 deepest peak-to-day declines. Revenue
    * aggregates on the DECIMAL grid; the drawdown ratio is one double
    * divide rounded 6 with a (day) tiebreak on the rank.
    *
    * Scale shape: one shuffle to the day grain, a running-max window
    * over the BOUNDED daily series, and a top-10 TakeOrdered. */
  val winDrawdown: GQuery = GQuery(
    "win_drawdown",
    """WITH d AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT day, rev, max(rev) OVER (ORDER BY day) AS runmax FROM d)
      |SELECT strftime(day, '%Y-%m-%d') AS day,
      |  CAST(rev AS DOUBLE) AS rev, CAST(runmax AS DOUBLE) AS runmax,
      |  round(1 - rev / CAST(runmax AS DOUBLE), 6) AS drawdown
      |FROM r
      |ORDER BY drawdown DESC, day
      |LIMIT 10""".stripMargin) { (s, dir) =>
    val d = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice"), 2).cast("decimal(18,2)"))
        .as("rev"))
    val r = d.withColumn("runmax",
      max(col("rev")).over(Window.orderBy(col("day"))))
    r.select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("rev").cast("double").as("rev"),
        col("runmax").cast("double").as("runmax"),
        round(lit(1) - col("rev") / col("runmax").cast("double"), 6)
          .as("drawdown"))
      .orderBy(col("drawdown").desc, col("day"))
      .limit(10)
  }

  /** BOLLINGER BANDS over the daily revenue series — trailing 7-day
    * moving mean ± 2 sample standard deviations with a breakout flag
    * (the volatility-band monitor ops dashboards run on any daily
    * metric; `above`/`below` rows are the alert feed).
    *
    * Determinism discipline: the window carries only EXACT decimal
    * state (sum and sum-of-squares of the DECIMAL(18,2) daily grid —
    * the squares quantized to DECIMAL(30,4) before the window sum so
    * both engines sum identical values), then mean and stddev are each
    * ONE fixed double expression rounded 6; the bands are derived from
    * the already-rounded mean/sd so every float op sees identical
    * inputs on both engines. Bands (and the flag) are null until the
    * frame is full (n=7) — a 6-day stddev is a different statistic,
    * not a noisier one.
    *
    * Scale: one shuffle to the daily grain with map-side combine, then
    * a single unpartitioned window over the BOUNDED daily series (the
    * calendar bounds it, not the data — WindowQueries.scala:107
    * precedent). */
  val winBollinger: GQuery = GQuery(
    "win_bollinger",
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1),
      |w AS (
      |  SELECT d, rev,
      |    count(*) OVER win AS n,
      |    sum(rev) OVER win AS s,
      |    sum(CAST(rev * rev AS DECIMAL(30,4))) OVER win AS s2
      |  FROM daily
      |  WINDOW win AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
      |f AS (
      |  SELECT d, rev, n,
      |    round(CAST(s AS DOUBLE) / n, 6) AS ma7,
      |    CASE WHEN n = 7 THEN
      |      floor(sqrt(CAST(7 * CAST(s2 * 10000 AS DECIMAL(38,0))
      |          - CAST(s * 100 AS DECIMAL(19,0))
      |            * CAST(s * 100 AS DECIMAL(19,0)) AS DOUBLE)
      |          / 420000.0)
      |        * 1000000.0 + 0.5) / 1000000.0
      |    END AS sd7
      |  FROM w),
      |b AS (
      |  SELECT d, rev, n, ma7, sd7,
      |    round(ma7 + 2 * sd7, 6) AS upper_band,
      |    round(ma7 - 2 * sd7, 6) AS lower_band
      |  FROM f)
      |SELECT strftime(d, '%Y-%m-%d') AS day,
      |  CAST(rev AS DOUBLE) AS rev, CAST(n AS BIGINT) AS n,
      |  ma7, sd7, upper_band, lower_band,
      |  CASE WHEN sd7 IS NULL THEN NULL
      |       WHEN CAST(rev AS DOUBLE) > upper_band THEN 'above'
      |       WHEN CAST(rev AS DOUBLE) < lower_band THEN 'below'
      |       ELSE 'in' END AS breakout
      |FROM b
      |ORDER BY day""".stripMargin) { (s, dir) =>
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(round(col("o_totalprice"), 2).cast("decimal(18,2)"))
        .as("rev"))
    val win = Window.orderBy(col("d")).rowsBetween(-6, Window.currentRow)
    val w = daily
      .withColumn("n", count(lit(1)).over(win))
      .withColumn("s", sum(col("rev")).over(win))
      .withColumn("s2",
        sum((col("rev") * col("rev")).cast("decimal(30,4)")).over(win))
    val f = w
      .withColumn("ma7", round(col("s").cast("double") / col("n"), 6))
      // sd7 rides ONE FIXED FLOAT EXPRESSION over an EXACT INTEGER
      // numerator on BOTH engines: n4 = 7·(s2·10⁴) − (s·100)² is a
      // DECIMAL(38,0) integer (exact in both engines' decimal math;
      // the cents/1e-4 grids make every factor integral), and
      // sd7 = floor(sqrt(n4/420000)·1e6 + 0.5)/1e6 is then identical
      // IEEE ops from identical inputs. The previous spelling cast the
      // 18-digit DECIMAL s2 to double on each engine — DuckDB's
      // decimal→double cast is 1 ulp off correctly-rounded there,
      // which flipped day 575's 6th decimal at sf0.1 (sd within
      // 2.5e-13 of the rounding boundary) — an INHERITED half-ULP
      // parity bug, fixed this round (r17). Integer→double casts are
      // correctly rounded on both engines (measured).
      // Headroom (r17 ADVICE): CAST(s·100 AS DECIMAL(19,0)) holds
      // while the 7-day revenue sum stays under ~1e17 — the 19-digit
      // width is deliberate so the square stays within DECIMAL(38,0).
      // Past that bound non-ANSI Spark nulls the cast (blanking
      // sd7/bands) where DuckDB errors; unreachable at any tested SF
      // (sf0.1's max 7-day sum is ~2.6e7), so guard at extreme SFs.
      .withColumn("sd7", when(col("n") === 7,
        floor(sqrt((lit(7) * (col("s2") * 10000).cast("decimal(38,0)")
          - (col("s") * 100).cast("decimal(19,0)")
            * (col("s") * 100).cast("decimal(19,0)")).cast("double")
          / lit(420000.0))
          * lit(1000000.0) + lit(0.5)) / lit(1000000.0)))
    f.withColumn("upper_band", round(col("ma7") + lit(2) * col("sd7"), 6))
      .withColumn("lower_band", round(col("ma7") - lit(2) * col("sd7"), 6))
      .select(
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("rev").cast("double").as("rev"),
        col("n").cast("long").as("n"),
        col("ma7"), col("sd7"), col("upper_band"), col("lower_band"),
        when(col("sd7").isNull, lit(null).cast("string"))
          .when(col("rev").cast("double") > col("upper_band"), "above")
          .when(col("rev").cast("double") < col("lower_band"), "below")
          .otherwise("in").as("breakout"))
      .orderBy(col("day"))
  }

  /** CUSUM CHANGE-POINT detection on each event type's daily volume —
    * the classic drift detector ops teams run beside the z-score
    * monitor (`ev_anomaly_zscore` flags single-day spikes; CUSUM
    * catches slow LEVEL SHIFTS): cusum_t = Σ_{i≤t}(y_i − ȳ) peaks
    * exactly where the series switches regimes, so each type reports
    * its maximum-|cusum| day (earliest on ties), the regime direction
    * (above/below the global mean before the shift), and the peak
    * magnitude.
    *
    * Determinism discipline: the per-type mean is rounded to the
    * DECIMAL(12,6) grid FIRST, so every deviation and the running
    * cusum are exact decimals — the argmax compares exact values,
    * never accumulated floats; the tie-break is the day itself.
    *
    * Scale: one map-side-combining daily aggregate, a \|types\|-row
    * mean join (keyed), and a window over the calendar-bounded
    * per-type day grid (the win_bollinger precedent). */
  val winCusumChangepoint: GQuery = GQuery(
    "win_cusum_changepoint",
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type,
      |    CAST(round(CAST(sum(n) AS DOUBLE) / count(*), 6)
      |      AS DECIMAL(12,6)) AS mu,
      |    CAST(count(*) AS BIGINT) AS n_days
      |  FROM d GROUP BY event_type),
      |c AS (
      |  SELECT d.event_type, d.day, m.mu, m.n_days,
      |    sum(CAST(d.n AS DECIMAL(12,6)) - m.mu) OVER (
      |      PARTITION BY d.event_type ORDER BY d.day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
      |  FROM d JOIN m ON d.event_type = m.event_type),
      |r AS (
      |  SELECT event_type, day, mu, n_days, cusum, abs(cusum) AS ac,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY abs(cusum) DESC, day) AS rk
      |  FROM c)
      |SELECT event_type, n_days,
      |  round(CAST(mu AS DOUBLE), 6) AS mean_daily,
      |  strftime(day, '%Y-%m-%d') AS cp_day,
      |  round(CAST(ac AS DOUBLE), 6) AS max_abs_cusum,
      |  CASE WHEN cusum > 0 THEN 'above' ELSE 'below' END AS regime
      |FROM r WHERE rk = 1
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val m = d.groupBy(col("event_type"))
      .agg(round(sum(col("n")).cast("double") / count(lit(1)), 6)
          .cast("decimal(12,6)").as("mu"),
        count(lit(1)).cast("bigint").as("n_days"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = d.join(m, Seq("event_type"))
      .withColumn("cusum",
        sum(col("n").cast("decimal(12,6)") - col("mu")).over(w))
    val rk = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("cusum")).desc, col("day"))
    c.withColumn("rk", row_number().over(rk))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("n_days"),
        round(col("mu").cast("double"), 6).as("mean_daily"),
        date_format(col("day"), "yyyy-MM-dd").as("cp_day"),
        round(abs(col("cusum")).cast("double"), 6).as("max_abs_cusum"),
        when(col("cusum") > 0, "above").otherwise("below").as("regime"))
      .orderBy(col("event_type"))
  }

  /** TRAILING 7-day ROLLING CORRELATION between two daily series
    * (clicks vs purchases) — the co-movement monitor quant/ops teams
    * run beside the volatility bands (`win_bollinger`): a funnel
    * whose click→purchase correlation decays is breaking even when
    * both volumes look healthy. All five frame sums (Σx, Σy, Σxy,
    * Σx², Σy²) are INTEGER window sums — exact on any engine — and
    * each day's correlation is ONE double expression over them; null
    * until the frame holds 7 days (a 5-day correlation is a different
    * statistic), and null on zero variance (the guard compares the
    * exact integer discriminants, so both engines null the same
    * rows).
    *
    * Scale: one map-side-combining daily aggregate, then a window
    * over the calendar-bounded day grid (win_bollinger precedent). */
  val winRollingCorr: GQuery = GQuery(
    "win_rolling_corr",
    """WITH d AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |w AS (
      |  SELECT day, x, y,
      |    CAST(count(*) OVER f AS BIGINT) AS n,
      |    CAST(sum(x) OVER f AS BIGINT) AS sx,
      |    CAST(sum(y) OVER f AS BIGINT) AS sy,
      |    CAST(sum(x * y) OVER f AS BIGINT) AS sxy,
      |    CAST(sum(x * x) OVER f AS BIGINT) AS sxx,
      |    CAST(sum(y * y) OVER f AS BIGINT) AS syy
      |  FROM d
      |  WINDOW f AS (ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT strftime(day, '%Y-%m-%d') AS day, x, y,
      |  CASE WHEN n = 7 AND n * sxx - sx * sx > 0
      |        AND n * syy - sy * sy > 0
      |    THEN round((CAST(n AS DOUBLE) * sxy
      |        - CAST(sx AS DOUBLE) * sy)
      |      / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |        * sqrt(CAST(n AS DOUBLE) * syy
      |          - CAST(sy AS DOUBLE) * sy)), 6)
      |  END AS corr7
      |FROM w
      |ORDER BY day""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        sum(when(col("event_type") === "click", 1).otherwise(0))
          .cast("bigint").as("x"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0))
          .cast("bigint").as("y"))
    val f = Window.orderBy(col("day")).rowsBetween(-6, 0)
    val w = d
      .withColumn("n", count(lit(1)).over(f).cast("bigint"))
      .withColumn("sx", sum(col("x")).over(f).cast("bigint"))
      .withColumn("sy", sum(col("y")).over(f).cast("bigint"))
      .withColumn("sxy", sum(col("x") * col("y")).over(f).cast("bigint"))
      .withColumn("sxx", sum(col("x") * col("x")).over(f).cast("bigint"))
      .withColumn("syy", sum(col("y") * col("y")).over(f).cast("bigint"))
    val nd = col("n").cast("double")
    w.select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("x"), col("y"),
        when(col("n") === 7
            && col("n") * col("sxx") - col("sx") * col("sx") > 0
            && col("n") * col("syy") - col("sy") * col("sy") > 0,
          round((nd * col("sxy") - col("sx").cast("double") * col("sy"))
            / (sqrt(nd * col("sxx")
                - col("sx").cast("double") * col("sx"))
              * sqrt(nd * col("syy")
                - col("sy").cast("double") * col("sy"))), 6))
          .as("corr7"))
      .orderBy(col("day"))
  }

  /** THEIL–SEN robust trend — the median-of-pairwise-slopes estimator
    * per event type's daily count series: slope = median{(y_j−y_i)/
    * (j−i) : i<j}, intercept = median{y_i − slope·i}. Unlike the OLS
    * slope (ev_forecast_baseline's family), a single anomalous day
    * cannot move it — the robust-regression companion to
    * agg_mad/agg_winsorized_mean's robust location estimators. The
    * slope medians run over exact pairwise divisions; the proven
    * quantile_cont ↔ percentile pairing (win_moving_median) makes the
    * interpolated median bit-identical cross-engine, and the rounded
    * slope is re-quantized before the intercept residuals so both
    * medians ride deterministic inputs.
    *
    * Scale shape: the pairwise self-join is CALENDAR-bounded — ≤366
    * rn values per event type regardless of corpus size (≤67k pairs
    * per type), reached through one map-side-combining daily
    * aggregate; the corpus is never paired with itself. Partitioned
    * by event_type end-to-end, fully parallel across types. */
  val winTheilSen: GQuery = GQuery(
    "win_theil_sen",
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS DOUBLE) AS y
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, y,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      |  FROM d),
      |m AS (
      |  SELECT a.event_type,
      |    CAST(count(*) AS BIGINT) AS n_pairs,
      |    round(quantile_cont((b.y - a.y) / (b.rn - a.rn), 0.5), 6)
      |      AS slope
      |  FROM s a JOIN s b
      |    ON a.event_type = b.event_type AND b.rn > a.rn
      |  GROUP BY 1)
      |SELECT s.event_type,
      |  CAST(max(s.rn) AS BIGINT) AS n_days, m.n_pairs, m.slope,
      |  round(quantile_cont(s.y - m.slope * s.rn, 0.5), 6) AS intercept
      |FROM s JOIN m USING (event_type)
      |GROUP BY s.event_type, m.n_pairs, m.slope
      |ORDER BY s.event_type""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("y"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val ser = d.select(col("event_type"), col("y"),
      row_number().over(w).as("rn"))
    val a = ser.select(col("event_type"), col("y").as("ya"),
      col("rn").as("ra"))
    val b = ser.select(col("event_type").as("et2"), col("y").as("yb"),
      col("rn").as("rb"))
    val m = a.join(b, col("event_type") === col("et2")
        && col("rb") > col("ra"))
      .select(col("event_type"),
        ((col("yb") - col("ya")) / (col("rb") - col("ra"))).as("sl"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("bigint").as("n_pairs"),
        round(percentile(col("sl"), lit(0.5)), 6).as("slope"))
    ser.join(m, Seq("event_type"))
      .groupBy(col("event_type"), col("n_pairs"), col("slope"))
      .agg(max(col("rn")).cast("bigint").as("n_days"),
        round(percentile(col("y") - col("slope") * col("rn"),
          lit(0.5)), 6).as("intercept"))
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        col("slope"), col("intercept"))
      .orderBy(col("event_type"))
  }

  /** ADDITIVE SEASONAL DECOMPOSITION of the daily revenue series —
    * STL-lite: trend = centered 7-day moving average (defined only on
    * full windows), seasonal = day-of-week mean of the detrended
    * series, residual = detrended − seasonal. The trend MA sums
    * DECIMAL(18,2) revenue exactly inside the frame (order-free) and
    * divides once; detrended values re-quantize to DECIMAL(18,6)
    * before the per-dow mean (grid-before-sum), so every output is a
    * deterministic single-divide double.
    *
    * Scale shape: the unpartitioned window runs over the BOUNDED
    * daily series (~2400 rows at any SF — the calendar bounds it,
    * WindowQueries.scala:107 policy); the corpus-sized stage is one
    * map-side-combining daily aggregate. The dow profile is a 7-row
    * broadcast joined back by a projection key. */
  val winSeasonalDecompose: GQuery = GQuery(
    "win_seasonal_decompose",
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |         AS DECIMAL(18,2)) AS rev
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT d, rev,
      |    CASE WHEN count(*) OVER w = 7
      |      THEN round(CAST(sum(rev) OVER w AS DOUBLE) / 7, 6) END
      |      AS trend
      |  FROM daily
      |  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING
      |               AND 3 FOLLOWING)),
      |dt AS (
      |  SELECT d, rev, trend,
      |    CAST(round(CAST(rev AS DOUBLE) - trend, 6) AS DECIMAL(18,6))
      |      AS det
      |  FROM t),
      |sp AS (
      |  SELECT CAST(isodow(d) - 1 AS INT) AS dow,
      |    round(CAST(sum(det) AS DOUBLE) / count(det), 6) AS seasonal
      |  FROM dt GROUP BY 1)
      |SELECT strftime(dt.d, '%Y-%m-%d') AS day,
      |  CAST(rev AS DOUBLE) AS rev, trend, sp.seasonal,
      |  round(CAST(det AS DOUBLE) - sp.seasonal, 6) AS residual
      |FROM dt JOIN sp ON CAST(isodow(dt.d) - 1 AS INT) = sp.dow
      |ORDER BY day""".stripMargin) { (s, dir) =>
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)").as("rev"))
    val w = Window.orderBy(col("d")).rowsBetween(-3, 3)
    val t = daily.select(col("d"), col("rev"),
      when(count(lit(1)).over(w) === 7,
        round(sum(col("rev")).over(w).cast("double") / 7, 6))
        .as("trend"))
    val dt = t.withColumn("det",
      round(col("rev").cast("double") - col("trend"), 6)
        .cast("decimal(18,6)"))
    val sp = dt.groupBy(weekday(col("d")).as("dow"))
      .agg(round(sum(col("det")).cast("double") / count(col("det")), 6)
        .as("seasonal"))
    dt.join(broadcast(sp), weekday(dt("d")) === sp("dow"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("rev").cast("double").as("rev"), col("trend"),
        col("seasonal"),
        round(col("det").cast("double") - col("seasonal"), 6)
          .as("residual"))
      .orderBy(col("day"))
  }

  /** YEAR-OVER-YEAR growth per month — the BI staple next to
    * win_drawdown/win_bollinger: monthly revenue joined to itself on
    * the CALENDAR key month−12 (add_months / INTERVAL arithmetic, NOT
    * a row-offset lag(12) — a row lag silently mis-pairs the moment
    * any month is absent from the series), with pct change on exact
    * DECIMAL month sums divided once.
    *
    * Scale shape: one map-side-combining monthly aggregate (the only
    * corpus-sized stage) and a self-join on the ≤ |months| frame —
    * both sides tiny and broadcastable at any SF. */
  val winYoyGrowth: GQuery = GQuery(
    "win_yoy_growth",
    """WITH m AS (
      |  SELECT date_trunc('month', o_orderdate) AS md,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |         AS DECIMAL(18,2)) AS rev
      |  FROM orders GROUP BY 1)
      |SELECT strftime(a.md, '%Y-%m') AS month,
      |  CAST(a.rev AS DOUBLE) AS rev,
      |  CAST(b.rev AS DOUBLE) AS rev_prior_year,
      |  round((CAST(a.rev AS DOUBLE) - CAST(b.rev AS DOUBLE))
      |        / CAST(b.rev AS DOUBLE) * 100, 6) AS yoy_pct
      |FROM m a LEFT JOIN m b ON b.md = a.md - INTERVAL 12 MONTH
      |ORDER BY month""".stripMargin) { (s, dir) =>
    val m = Tables.orders(s, dir)
      .groupBy(to_date(date_trunc("month", col("o_orderdate")))
        .as("md"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)").as("rev"))
    val b = m.select(col("md").as("md2"), col("rev").as("rev2"))
    m.join(broadcast(b), col("md2") === add_months(col("md"), -12),
        "left")
      .select(date_format(col("md"), "yyyy-MM").as("month"),
        col("rev").cast("double").as("rev"),
        col("rev2").cast("double").as("rev_prior_year"),
        round((col("rev").cast("double") - col("rev2").cast("double"))
          / col("rev2").cast("double") * 100, 6).as("yoy_pct"))
      .orderBy(col("month"))
  }

  /** STL-RESIDUAL ANOMALY DAYS — the detector the decomposition
    * exists for: after removing trend (centered 7-day MA) and
    * day-of-week seasonality exactly as win_seasonal_decompose does,
    * a day is anomalous iff |residual| > 3σ of the residual
    * distribution. Unlike ev_anomaly_zscore (raw z-score per point),
    * deseasonalizing first means a busy-but-normal Monday does NOT
    * alert while a quiet Monday DOES — the difference between paging
    * on weekday shape and paging on real incidents. Residuals ride
    * the DECIMAL(18,6) grid; σ comes from exact Σ/Σ² moments (the
    * ev_ab_welch formula); the 3σ cut compares rounded grid values.
    *
    * Scale shape: win_seasonal_decompose's bounded-calendar plan plus
    * one 1-row moment broadcast re-joined by projection — nothing
    * grows with the corpus except the one daily aggregate. */
  val winStlAnomaly: GQuery = GQuery(
    "win_stl_anomaly",
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |         AS DECIMAL(18,2)) AS rev
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT d, rev,
      |    CASE WHEN count(*) OVER w = 7
      |      THEN round(CAST(sum(rev) OVER w AS DOUBLE) / 7, 6) END
      |      AS trend
      |  FROM daily
      |  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING
      |               AND 3 FOLLOWING)),
      |dt AS (
      |  SELECT d, rev, trend,
      |    CAST(round(CAST(rev AS DOUBLE) - trend, 6) AS DECIMAL(18,6))
      |      AS det
      |  FROM t),
      |sp AS (
      |  SELECT CAST(isodow(d) - 1 AS INT) AS dow,
      |    round(CAST(sum(det) AS DOUBLE) / count(det), 6) AS seasonal
      |  FROM dt GROUP BY 1),
      |res AS (
      |  SELECT dt.d, dt.rev,
      |    CAST(round(CAST(det AS DOUBLE) - sp.seasonal, 6)
      |         AS DECIMAL(18,6)) AS r
      |  FROM dt JOIN sp ON CAST(isodow(dt.d) - 1 AS INT) = sp.dow
      |  WHERE det IS NOT NULL),
      |mo AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(r) AS DECIMAL(38,6)) AS s,
      |    CAST(sum(CAST(r AS DECIMAL(19,6)) * CAST(r AS DECIMAL(19,6)))
      |         AS DECIMAL(38,12)) AS q
      |  FROM res)
      |SELECT strftime(res.d, '%Y-%m-%d') AS day,
      |  CAST(res.rev AS DOUBLE) AS rev,
      |  CAST(res.r AS DOUBLE) AS residual,
      |  round((CAST(res.r AS DOUBLE) - CAST(mo.s AS DOUBLE) / mo.n)
      |    / sqrt((CAST(mo.q AS DOUBLE)
      |            - CAST(mo.s AS DOUBLE) * mo.s / mo.n) / (mo.n - 1)),
      |    6) AS z
      |FROM res CROSS JOIN mo
      |WHERE abs((CAST(res.r AS DOUBLE) - CAST(mo.s AS DOUBLE) / mo.n)
      |    / sqrt((CAST(mo.q AS DOUBLE)
      |            - CAST(mo.s AS DOUBLE) * mo.s / mo.n) / (mo.n - 1)))
      |  > 3
      |ORDER BY day""".stripMargin) { (s, dir) =>
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)").as("rev"))
    val w = Window.orderBy(col("d")).rowsBetween(-3, 3)
    val t = daily.select(col("d"), col("rev"),
      when(count(lit(1)).over(w) === 7,
        round(sum(col("rev")).over(w).cast("double") / 7, 6))
        .as("trend"))
    val dt = t.withColumn("det",
      round(col("rev").cast("double") - col("trend"), 6)
        .cast("decimal(18,6)"))
    val sp = dt.groupBy(weekday(col("d")).as("dow"))
      .agg(round(sum(col("det")).cast("double") / count(col("det")), 6)
        .as("seasonal"))
    val res = dt.join(broadcast(sp), weekday(dt("d")) === sp("dow"))
      .filter(col("det").isNotNull)
      .select(col("d"), col("rev"),
        round(col("det").cast("double") - col("seasonal"), 6)
          .cast("decimal(18,6)").as("r"))
    val mo = res.agg(count(lit(1)).cast("bigint").as("n"),
      sum(col("r")).cast("decimal(38,6)").as("s"),
      sum(col("r").cast("decimal(19,6)") * col("r").cast("decimal(19,6)"))
        .cast("decimal(38,12)").as("q"))
    val z = (col("r").cast("double")
      - col("s").cast("double") / col("n")) /
      sqrt((col("q").cast("double")
        - col("s").cast("double") * col("s") / col("n")) /
        (col("n") - 1))
    res.crossJoin(broadcast(mo))
      .filter(abs(z) > 3)
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("rev").cast("double").as("rev"),
        col("r").cast("double").as("residual"),
        round(z, 6).as("z"))
      .orderBy(col("day"))
  }

  /** WESTERN-ELECTRIC SPC RULES over the daily revenue control chart —
    * the classic rule set a statistical-process-control monitor runs
    * where win_cusum_changepoint detects slow drifts and
    * ev_anomaly_zscore single spikes: per day, rule 1 = |z| > 3 (one
    * point beyond 3σ), rule 2 = ≥ 2 of the last 3 points beyond 2σ on
    * the SAME side, rule 3 = 8 consecutive points on one side of the
    * center line. z-scores come from exact DECIMAL revenue moments
    * (1-row scalar); every rule is integer/boolean logic over rounded
    * grid z values in bounded trailing windows.
    *
    * Scale shape: one map-side-combining daily aggregate; all windows
    * ride the bounded calendar series (the win_moving_median policy);
    * the moment scalar is a 1-row broadcast. */
  val winSpcRules: GQuery = GQuery(
    "win_spc_rules",
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |         AS DECIMAL(18,2)) AS rev
      |  FROM orders GROUP BY 1),
      |mo AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(rev) AS DECIMAL(38,2)) AS s,
      |    CAST(sum(CAST(rev AS DECIMAL(19,2))
      |             * CAST(rev AS DECIMAL(19,2))) AS DECIMAL(38,4)) AS q
      |  FROM daily),
      |z AS (
      |  SELECT d, rev,
      |    round((CAST(rev AS DOUBLE) - CAST(s AS DOUBLE) / n)
      |      / sqrt((CAST(q AS DOUBLE)
      |              - CAST(s AS DOUBLE) * s / n) / (n - 1)), 6) AS z
      |  FROM daily CROSS JOIN mo),
      |r AS (
      |  SELECT d, rev, z,
      |    CAST(abs(z) > 3 AS BOOLEAN) AS rule1,
      |    CAST(sum(CASE WHEN z > 2 THEN 1 ELSE 0 END) OVER w3 >= 2
      |      OR sum(CASE WHEN z < -2 THEN 1 ELSE 0 END) OVER w3 >= 2
      |      AS BOOLEAN) AS rule2,
      |    CAST(sum(CASE WHEN z > 0 THEN 1 ELSE 0 END) OVER w8 = 8
      |      OR sum(CASE WHEN z < 0 THEN 1 ELSE 0 END) OVER w8 = 8
      |      AS BOOLEAN) AS rule3,
      |    CAST(count(*) OVER w8 AS BIGINT) AS n_in_w8
      |  FROM z
      |  WINDOW w3 AS (ORDER BY d ROWS BETWEEN 2 PRECEDING
      |                AND CURRENT ROW),
      |         w8 AS (ORDER BY d ROWS BETWEEN 7 PRECEDING
      |                AND CURRENT ROW))
      |SELECT strftime(d, '%Y-%m-%d') AS day, CAST(rev AS DOUBLE) AS rev,
      |  z, rule1, rule2,
      |  CAST(rule3 AND n_in_w8 = 8 AS BOOLEAN) AS rule3,
      |  CAST(rule1 OR rule2 OR (rule3 AND n_in_w8 = 8) AS BOOLEAN)
      |    AS any_rule
      |FROM r
      |ORDER BY day""".stripMargin) { (s, dir) =>
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)").as("rev"))
    val mo = daily.agg(count(lit(1)).cast("bigint").as("n"),
      sum(col("rev")).cast("decimal(38,2)").as("s"),
      sum(col("rev").cast("decimal(19,2)")
        * col("rev").cast("decimal(19,2)")).cast("decimal(38,4)")
        .as("q"))
    val z = daily.crossJoin(broadcast(mo))
      .select(col("d"), col("rev"),
        round((col("rev").cast("double")
            - col("s").cast("double") / col("n"))
          / sqrt((col("q").cast("double")
              - col("s").cast("double") * col("s") / col("n"))
            / (col("n") - 1)), 6).as("z"))
    val w3 = Window.orderBy(col("d")).rowsBetween(-2, Window.currentRow)
    val w8 = Window.orderBy(col("d")).rowsBetween(-7, Window.currentRow)
    val r3raw = (sum(when(col("z") > 0, 1).otherwise(0)).over(w8) === 8
      || sum(when(col("z") < 0, 1).otherwise(0)).over(w8) === 8)
    val full8 = count(lit(1)).over(w8) === 8
    val r = z.select(col("d"), col("rev"), col("z"),
      (abs(col("z")) > 3).cast("boolean").as("rule1"),
      (sum(when(col("z") > 2, 1).otherwise(0)).over(w3) >= 2
        || sum(when(col("z") < -2, 1).otherwise(0)).over(w3) >= 2)
        .cast("boolean").as("rule2"),
      (r3raw && full8).cast("boolean").as("rule3"))
    r.select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("rev").cast("double").as("rev"), col("z"),
        col("rule1"), col("rule2"), col("rule3"),
        (col("rule1") || col("rule2") || col("rule3")).cast("boolean")
          .as("any_rule"))
      .orderBy(col("day"))
  }

  /** LOCAL-LEVEL KALMAN FILTER over the per-type daily count series —
    * the optimal recursive smoother for a random-walk-plus-noise
    * process, the classic online alternative to the fixed-alpha EMA
    * (`ev_value_ema`): the gain ADAPTS, starting high (trust the
    * data while the state is uncertain) and converging to the
    * steady-state Riccati fixed point. Model: y_t = l_t + ε (R = 10),
    * l_t = l_{t−1} + η (Q = 1). Per step: p_pred = p + Q,
    * k = p_pred/(p_pred + R), l ← l + k(y − l), p ← (1 − k)·p_pred;
    * init l = y_1, p = R. Like `ev_holt_winters` the coupled
    * recursion has no window spelling, so the engine folds
    * (`aggregate` HOF) over the per-type ordered daily array while
    * the DuckDB oracle replays the IDENTICAL double expressions as a
    * recursive CTE — same IEEE ops in the same textual order;
    * innovation MAE accumulates |y − l_pred| from step 2 on.
    *
    * Scale shape: one map-side-combining (type, day) count is the
    * only corpus-sized stage; the fold runs per type over the
    * calendar-bounded ≤366-element array — O(1) state, codegen'd. */
  val winKalmanLevel: GQuery = GQuery(
    "win_kalman_level",
    """WITH RECURSIVE d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS DOUBLE) AS y
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, y,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      |  FROM d),
      |h AS (
      |  SELECT event_type, 1 AS t, y AS l, CAST(10.0 AS DOUBLE) AS p,
      |    CAST(0 AS DOUBLE) AS esum
      |  FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT h.event_type, h.t + 1,
      |    h.l + ((h.p + 1.0) / (h.p + 1.0 + 10.0)) * (s2.y - h.l),
      |    (1.0 - (h.p + 1.0) / (h.p + 1.0 + 10.0)) * (h.p + 1.0),
      |    h.esum + abs(s2.y - h.l)
      |  FROM h JOIN s s2
      |    ON s2.event_type = h.event_type AND s2.rn = h.t + 1),
      |f AS (SELECT event_type, max(t) AS tmax FROM h GROUP BY 1)
      |SELECT h.event_type, CAST(h.t AS BIGINT) AS n_days,
      |  round(h.l, 6) AS level,
      |  round((h.p + 1.0) / (h.p + 1.0 + 10.0), 6) AS gain_next,
      |  round(h.p, 6) AS p_var,
      |  round(h.esum / (h.t - 1), 6) AS innovation_mae
      |FROM h JOIN f ON h.event_type = f.event_type AND h.t = f.tmax
      |ORDER BY h.event_type""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("y"))
    val st = d.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("y"))))
        .as("ser"))
      .withColumn("st", expr(
        """aggregate(ser,
          |  named_struct('t', 0, 'l', CAST(0 AS DOUBLE),
          |    'p', CAST(0 AS DOUBLE), 'esum', CAST(0 AS DOUBLE)),
          |  (acc, e) -> CASE
          |    WHEN acc.t = 0 THEN named_struct('t', 1, 'l', e.y,
          |      'p', 10.0D, 'esum', CAST(0 AS DOUBLE))
          |    ELSE named_struct('t', acc.t + 1,
          |      'l', acc.l + ((acc.p + 1.0D) / (acc.p + 1.0D + 10.0D))
          |             * (e.y - acc.l),
          |      'p', (1.0D - (acc.p + 1.0D) / (acc.p + 1.0D + 10.0D))
          |             * (acc.p + 1.0D),
          |      'esum', acc.esum + abs(e.y - acc.l))
          |  END)""".stripMargin))
    st.select(col("event_type"),
        col("st.t").cast("bigint").as("n_days"),
        round(col("st.l"), 6).as("level"),
        round((col("st.p") + lit(1.0)) / (col("st.p") + lit(1.0)
          + lit(10.0)), 6).as("gain_next"),
        round(col("st.p"), 6).as("p_var"),
        round(col("st.esum") / (col("st.t") - 1), 6)
          .as("innovation_mae"))
      .orderBy(col("event_type"))
  }

  /** MANN–KENDALL trend test over the per-type daily count series —
    * the NON-parametric significance companion to `win_theil_sen`'s
    * slope estimate (same pair sweep, same series): S = Σ_{i<j}
    * sign(y_j − y_i) counts concordant minus discordant pairs, and
    * Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)]/18 corrects
    * for tie groups in y. Everything through S, the tie sum, and
    * 18·Var(S) is EXACT INTEGER arithmetic — the only doubles are
    * the final continuity-corrected z = (S∓1)/√Var(S) and the
    * two-decade-standard verdict at |z| > 1.96.
    *
    * Scale shape: the pair sweep is event_type-keyed (the theil_sen
    * plan — ≤366 rows per key, never corpus²); tie groups are one
    * (type, y) aggregate. */
  val winMannKendall: GQuery = GQuery(
    "win_mann_kendall",
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, y,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      |  FROM d),
      |p AS (
      |  SELECT a.event_type,
      |    CAST(sum(CASE WHEN b.y > a.y THEN 1
      |                  WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
      |      AS s_stat,
      |    CAST(count(*) AS BIGINT) AS n_pairs
      |  FROM s a JOIN s b
      |    ON a.event_type = b.event_type AND b.rn > a.rn
      |  GROUP BY 1),
      |t AS (
      |  SELECT event_type,
      |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_sum
      |  FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS t
      |        FROM d GROUP BY event_type, y)
      |  GROUP BY 1),
      |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM d
      |      GROUP BY 1)
      |SELECT n.event_type, n.n AS n_days, p.s_stat,
      |  CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_sum AS BIGINT)
      |    AS var18,
      |  round(CASE
      |    WHEN n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_sum = 0 THEN 0.0
      |    WHEN p.s_stat > 0 THEN (CAST(p.s_stat AS DOUBLE) - 1.0)
      |      / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_sum
      |             AS DOUBLE) / 18.0)
      |    WHEN p.s_stat < 0 THEN (CAST(p.s_stat AS DOUBLE) + 1.0)
      |      / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_sum
      |             AS DOUBLE) / 18.0)
      |    ELSE 0.0 END, 6) AS z_score,
      |  CASE
      |    WHEN n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_sum = 0
      |      THEN 'no_trend'
      |    WHEN p.s_stat > 0 AND (CAST(p.s_stat AS DOUBLE) - 1.0)
      |      / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_sum
      |             AS DOUBLE) / 18.0) > 1.96 THEN 'increasing'
      |    WHEN p.s_stat < 0 AND (CAST(p.s_stat AS DOUBLE) + 1.0)
      |      / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_sum
      |             AS DOUBLE) / 18.0) < -1.96 THEN 'decreasing'
      |    ELSE 'no_trend' END AS verdict
      |FROM n JOIN p ON n.event_type = p.event_type
      |JOIN t ON n.event_type = t.event_type
      |ORDER BY n.event_type""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("bigint").as("y"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val ser = d.select(col("event_type"), col("y"),
      row_number().over(w).as("rn"))
    val a = ser.select(col("event_type"), col("y").as("ya"),
      col("rn").as("ra"))
    val b = ser.select(col("event_type").as("et2"), col("y").as("yb"),
      col("rn").as("rb"))
    val p = a.join(b, col("event_type") === col("et2")
        && col("rb") > col("ra"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("yb") > col("ya"), 1)
          .when(col("yb") < col("ya"), -1).otherwise(0)).cast("bigint")
          .as("s_stat"),
        count(lit(1)).cast("bigint").as("n_pairs"))
    val t = d.groupBy(col("event_type"), col("y"))
      .agg(count(lit(1)).cast("bigint").as("t"))
      .groupBy(col("event_type"))
      .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
        .cast("bigint").as("tie_sum"))
    val n = d.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("bigint").as("n"))
    val var18 = (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5)
      - col("tie_sum")).cast("bigint")
    val sd = sqrt(var18.cast("double") / lit(18.0))
    val zPos = (col("s_stat").cast("double") - lit(1.0)) / sd
    val zNeg = (col("s_stat").cast("double") + lit(1.0)) / sd
    n.join(p, Seq("event_type")).join(t, Seq("event_type"))
      .select(col("event_type"), col("n").as("n_days"), col("s_stat"),
        var18.as("var18"),
        round(when(var18 === 0, lit(0.0))
          .when(col("s_stat") > 0, zPos)
          .when(col("s_stat") < 0, zNeg)
          .otherwise(lit(0.0)), 6).as("z_score"),
        when(var18 === 0, lit("no_trend"))
          .when(col("s_stat") > 0 && zPos > 1.96, lit("increasing"))
          .when(col("s_stat") < 0 && zNeg < -1.96, lit("decreasing"))
          .otherwise(lit("no_trend")).as("verdict"))
      .orderBy(col("event_type"))
  }

  /** AUTOCORRELATION FUNCTION at lags 1..7 over the per-type daily
    * count series — the diagnostic that justifies everything else in
    * the time-series family (a lag-7 spike validates
    * `win_seasonal_decompose`'s weekly indices; fast decay justifies
    * `ev_forecast_baseline`'s seasonal-naive choice). Standard sample
    * ACF with the GLOBAL mean: r_l = Σ_{t>l}(y_t−ȳ)(y_{t−l}−ȳ) /
    * Σ(y_t−ȳ)². Every sum through the lagged cross-products is EXACT
    * INTEGER arithmetic — multiplying numerator and denominator by n²
    * clears the rational mean (num = n²C_l − n·S1·(A_l+B_l) +
    * (n−l)·S1², den = n²S2 − n·S1²), so the only double op is the
    * final single division, rounded to 6 identically on both engines.
    *
    * Scale shape: the lag pairing is event_type-keyed with offset
    * ≤ 7 (the theil_sen / mann_kendall plan — per-key series is
    * calendar-bounded at ≤366 rows, never corpus²); the moment frame
    * is one map-side-combining aggregate; the final join runs on
    * |types|×7 rows. */
  /** The exact-integer-moment ACF grid shared by win_acf (the readout)
    * and win_ljung_box (the portmanteau test): (event_type, lag 1..7,
    * n_days, n_pairs, acf) with acf = round 6 of the single double
    * division over integer numerator/denominator — see winAcf's
    * scaladoc for the n²-cleared algebra. */
  private def acfLags(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("bigint").as("y"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val ser = d.select(col("event_type"), col("y"),
      row_number().over(w).as("rn"))
    val m = d.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("y")).cast("bigint").as("s1"),
        sum(col("y") * col("y")).cast("bigint").as("s2"))
    val b = ser.select(col("event_type").as("et2"), col("y").as("yb"),
      col("rn").as("rb"))
    val p = ser.join(b, col("event_type") === col("et2")
        && (col("rb") - col("rn")).between(1, 7))
      .groupBy(col("event_type"),
        (col("rb") - col("rn")).cast("int").as("lag"))
      .agg(count(lit(1)).cast("bigint").as("n_pairs"),
        sum(col("y") * col("yb")).cast("bigint").as("c"),
        sum(col("yb")).cast("bigint").as("al"),
        sum(col("y")).cast("bigint").as("bl"))
    val den = (col("n") * col("n") * col("s2")
      - col("n") * col("s1") * col("s1"))
    val num = (col("n") * col("n") * col("c")
      - col("n") * col("s1") * (col("al") + col("bl"))
      + (col("n") - col("lag")) * col("s1") * col("s1"))
    p.join(m, Seq("event_type"))
      .select(col("event_type"), col("lag"), col("n").as("n_days"),
        col("n_pairs"),
        when(den === 0, lit(null).cast("double"))
          .otherwise(round(num.cast("double") / den.cast("double"), 6))
          .as("acf"))
  }

  /** The win_acf oracle's CTE chain up to the per-lag ACF rows —
    * shared verbatim by the win_ljung_box oracle so both replay ONE
    * spelling of the grid. */
  private val acfSqlCtes: String =
    """d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, y,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      |  FROM d),
      |m AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(y) AS BIGINT) AS s1,
      |    CAST(sum(y * y) AS BIGINT) AS s2
      |  FROM d GROUP BY 1),
      |p AS (
      |  SELECT a.event_type, CAST(b.rn - a.rn AS INT) AS lag,
      |    CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(sum(a.y * b.y) AS BIGINT) AS c,
      |    CAST(sum(b.y) AS BIGINT) AS al,
      |    CAST(sum(a.y) AS BIGINT) AS bl
      |  FROM s a JOIN s b
      |    ON a.event_type = b.event_type
      |    AND b.rn - a.rn BETWEEN 1 AND 7
      |  GROUP BY 1, 2),
      |acf AS (
      |  SELECT p.event_type, p.lag, m.n AS n_days, p.n_pairs,
      |    CASE WHEN m.n * m.n * m.s2 - m.n * m.s1 * m.s1 = 0
      |      THEN CAST(NULL AS DOUBLE)
      |      ELSE round(
      |        CAST(m.n * m.n * p.c - m.n * m.s1 * (p.al + p.bl)
      |             + (m.n - p.lag) * m.s1 * m.s1 AS DOUBLE)
      |        / CAST(m.n * m.n * m.s2 - m.n * m.s1 * m.s1 AS DOUBLE), 6)
      |    END AS acf
      |  FROM p JOIN m ON p.event_type = m.event_type)""".stripMargin

  val winAcf: GQuery = GQuery(
    "win_acf",
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, y,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      |  FROM d),
      |m AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(y) AS BIGINT) AS s1,
      |    CAST(sum(y * y) AS BIGINT) AS s2
      |  FROM d GROUP BY 1),
      |p AS (
      |  SELECT a.event_type, CAST(b.rn - a.rn AS INT) AS lag,
      |    CAST(count(*) AS BIGINT) AS n_pairs,
      |    CAST(sum(a.y * b.y) AS BIGINT) AS c,
      |    CAST(sum(b.y) AS BIGINT) AS al,
      |    CAST(sum(a.y) AS BIGINT) AS bl
      |  FROM s a JOIN s b
      |    ON a.event_type = b.event_type
      |    AND b.rn - a.rn BETWEEN 1 AND 7
      |  GROUP BY 1, 2)
      |SELECT p.event_type, p.lag, m.n AS n_days, p.n_pairs,
      |  CASE WHEN m.n * m.n * m.s2 - m.n * m.s1 * m.s1 = 0
      |    THEN CAST(NULL AS DOUBLE)
      |    ELSE round(
      |      CAST(m.n * m.n * p.c - m.n * m.s1 * (p.al + p.bl)
      |           + (m.n - p.lag) * m.s1 * m.s1 AS DOUBLE)
      |      / CAST(m.n * m.n * m.s2 - m.n * m.s1 * m.s1 AS DOUBLE), 6)
      |  END AS acf
      |FROM p JOIN m ON p.event_type = m.event_type
      |ORDER BY p.event_type, p.lag""".stripMargin) { (s, dir) =>
    acfLags(s, dir).orderBy(col("event_type"), col("lag"))
  }

  /** LJUNG–BOX PORTMANTEAU TEST over the win_acf grid — the "is there
    * ANY autocorrelation at all" gate that turns the 7-lag ACF readout
    * into a single decision per series (the residual-whiteness check
    * every forecasting pipeline runs before trusting a model; here it
    * adjudicates whether ev_forecast_baseline's seasonal-naive
    * structure is even present): Q = n(n+2)·Σ_{l=1..h} r_l²/(n−l),
    * rejected at the 0.95 χ² boundary for h=7 dof (literal 14.067 in
    * both engines; h is emitted so a shorter series is visible).
    *
    * Exactness: r_l is win_acf's round-6 value quantized to
    * DECIMAL(10,6), so r_l² is EXACT at scale 12; each term's division
    * by (n−l) is ONE double op rounded to 12 and re-quantized, making
    * the lag sum order-free; n(n+2) rides in as DECIMAL(12,0) so
    * Q stays exact decimal through the final round. NULL-acf lags
    * (zero-variance series) are excluded and shrink h.
    *
    * Scale shape: identical to win_acf — the only corpus-sized stage is
    * the (type, day) count; the lag pairing is key-local with offset
    * ≤ 7 over calendar-bounded series, and the test itself runs on a
    * ≤|types|×7-row grid. */
  val winLjungBox: GQuery = GQuery(
    "win_ljung_box",
    s"""WITH $acfSqlCtes,
      |t AS (
      |  SELECT event_type, n_days,
      |    CAST(round(
      |      CAST(CAST(acf AS DECIMAL(10,6)) * CAST(acf AS DECIMAL(10,6))
      |           AS DOUBLE) / (n_days - lag), 12)
      |      AS DECIMAL(24,12)) AS term
      |  FROM acf WHERE acf IS NOT NULL)
      |SELECT event_type, n_days,
      |  CAST(count(*) AS BIGINT) AS h,
      |  round(CAST(CAST(sum(term) AS DECIMAL(24,12))
      |    * CAST(n_days * (n_days + 2) AS DECIMAL(12,0)) AS DOUBLE), 6)
      |    AS q_stat,
      |  CAST(count(*) = 7 AND
      |    CAST(CAST(sum(term) AS DECIMAL(24,12))
      |      * CAST(n_days * (n_days + 2) AS DECIMAL(12,0)) AS DOUBLE)
      |    > 14.067 AS BOOLEAN) AS autocorrelated_95
      |FROM t GROUP BY event_type, n_days
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val r6 = col("acf").cast("decimal(10,6)")
    val t = acfLags(s, dir).where(col("acf").isNotNull)
      .select(col("event_type"), col("n_days"),
        round((r6 * r6).cast("double") / (col("n_days") - col("lag")),
          12).cast("decimal(24,12)").as("term"))
    val q = sum(col("term")).cast("decimal(24,12)") *
      (col("n_days") * (col("n_days") + 2)).cast("decimal(12,0)")
    t.groupBy(col("event_type"), col("n_days"))
      .agg(count(lit(1)).cast("bigint").as("h"),
        round(q.cast("double"), 6).as("q_stat"),
        (count(lit(1)) === 7 && q.cast("double") > 14.067)
          .cast("boolean").as("autocorrelated_95"))
      .orderBy(col("event_type"))
  }

  /** WALD–WOLFOWITZ RUNS TEST on the per-type daily count series —
    * the nonparametric RANDOMNESS check completing the diagnostic
    * trio (win_mann_kendall: monotone trend; win_ljung_box: linear
    * autocorrelation; this: ANY sequence structure — clustering of
    * high/low days that both of those can miss). Days are classified
    * above/below the per-type exact interpolated median (ties dropped,
    * the standard treatment); R = observed runs, compared to the
    * known-mean/variance null: μ = 2n₁n₂/n + 1,
    * σ² = 2n₁n₂(2n₁n₂−n)/(n²(n−1)).
    *
    * Exactness: n₁/n₂/R are exact integers (the run count is a lag
    * comparison over the kept sequence); every moment's numerator and
    * denominator is an exact BIGINT product cast once to double, so z
    * is a fixed double expression in the same order in both engines;
    * the median is the exact dyadic interpolation (integer counts →
    * k or k+.5, exact in double).
    *
    * Scale shape: the (type, day) count is the only corpus-sized
    * stage (map-side combining); the classification join, the run lag
    * and the test all run on the ≤|types|×366 bounded grid. */
  val winRunsTest: GQuery = GQuery(
    "win_runs_test",
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |m AS (SELECT event_type, quantile_cont(y, 0.5) AS med
      |      FROM d GROUP BY 1),
      |s AS (
      |  SELECT d.event_type, d.day,
      |    CASE WHEN d.y > m.med THEN 1 ELSE 0 END AS sgn
      |  FROM d JOIN m ON d.event_type = m.event_type
      |  WHERE d.y != m.med),
      |r AS (
      |  SELECT event_type, sgn,
      |    CASE WHEN lag(sgn) OVER (PARTITION BY event_type
      |        ORDER BY day) IS DISTINCT FROM sgn THEN 1 ELSE 0 END
      |      AS brk
      |  FROM s),
      |a AS (
      |  SELECT event_type,
      |    CAST(sum(sgn) AS BIGINT) AS n1,
      |    CAST(count(*) - sum(sgn) AS BIGINT) AS n2,
      |    CAST(sum(brk) AS BIGINT) AS runs
      |  FROM r GROUP BY 1)
      |SELECT event_type, n1, n2, runs,
      |  CASE WHEN 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) <= 0
      |    THEN CAST(NULL AS DOUBLE)
      |    ELSE round((CAST(runs AS DOUBLE)
      |      - (CAST(2 * n1 * n2 AS DOUBLE) / (n1 + n2) + 1))
      |    / sqrt(CAST(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) AS DOUBLE)
      |      / CAST((n1 + n2) * (n1 + n2) * (n1 + n2 - 1) AS DOUBLE)), 6)
      |    END AS z_score,
      |  CASE WHEN 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) <= 0
      |    THEN CAST(NULL AS VARCHAR)
      |    WHEN abs((CAST(runs AS DOUBLE)
      |      - (CAST(2 * n1 * n2 AS DOUBLE) / (n1 + n2) + 1))
      |    / sqrt(CAST(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) AS DOUBLE)
      |      / CAST((n1 + n2) * (n1 + n2) * (n1 + n2 - 1) AS DOUBLE)))
      |      > 1.96
      |    THEN 'non_random' ELSE 'random' END AS verdict
      |FROM a
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("bigint").as("y"))
    val m = d.groupBy(col("event_type"))
      .agg(percentile(col("y"), lit(0.5)).as("med"))
    val sg = d.join(m, Seq("event_type"))
      .filter(col("y") =!= col("med"))
      .select(col("event_type"), col("day"),
        when(col("y") > col("med"), 1).otherwise(0).as("sgn"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val r = sg.select(col("event_type"), col("sgn"),
      when(not(lag(col("sgn"), 1).over(w) <=> col("sgn")), 1).otherwise(0)
        .as("brk"))
    val a = r.groupBy(col("event_type"))
      .agg(sum(col("sgn")).cast("bigint").as("n1"),
        (count(lit(1)) - sum(col("sgn"))).cast("bigint").as("n2"),
        sum(col("brk")).cast("bigint").as("runs"))
    val n = col("n1") + col("n2")
    val mu = (lit(2) * col("n1") * col("n2")).cast("double") / n + 1
    val v2 = (lit(2) * col("n1") * col("n2")
        * (lit(2) * col("n1") * col("n2") - col("n1") - col("n2")))
      .cast("double") / (n * n * (n - 1)).cast("double")
    val z = (col("runs").cast("double") - mu) / sqrt(v2)
    // degenerate series guard (the win_granger_causality pattern):
    // a single-sign series after tie-dropping (n1=0 or n2=0, or
    // n1=n2=1) zeroes the variance numerator 2·n1·n2·(2n1n2−n1−n2)
    // and z would be NaN/Inf — surface NULL instead
    val degen = (lit(2) * col("n1") * col("n2")
      * (lit(2) * col("n1") * col("n2") - col("n1") - col("n2"))) <= 0
    a.select(col("event_type"), col("n1"), col("n2"), col("runs"),
        when(degen, lit(null).cast("double"))
          .otherwise(round(z, 6)).as("z_score"),
        when(degen, lit(null).cast("string"))
          .otherwise(when(abs(z) > 1.96, lit("non_random"))
            .otherwise(lit("random"))).as("verdict"))
      .orderBy(col("event_type"))
  }

  /** GRANGER CAUSALITY (lag 1) between every ordered pair of
    * event-type daily series — "do yesterday's views predict today's
    * purchases beyond what yesterday's purchases already do?": the
    * F-test comparing the restricted AR(1) model
    * y_t = a + b·y_{t−1} against the augmented
    * y_t = a + b·y_{t−1} + c·x_{t−1}, the lead-lag diagnostic that
    * turns the per-series trio (trend / autocorrelation / randomness)
    * into a CROSS-series matrix. F = (RSS_R − RSS_U)·(n−3)/RSS_U,
    * flagged at the F(1, n−3≈360) 95% literal 3.87.
    *
    * Exactness: all ten raw moments are exact BIGINT sums; each casts
    * to double ONCE and the centered sums / Cramer 2×2 solve / RSS
    * chain is ONE shared formula string — `expr(...)` on the Spark
    * side, spliced verbatim into the oracle — so both engines run
    * token-identical IEEE ops in the same order (the ev_ab_welch
    * discipline). Degenerate pairs (singular normal matrix or
    * zero residual) surface NULL.
    *
    * Scale shape: the (type, day) count is the only corpus-sized
    * stage; the lag alignment is a calendar-keyed self-join and the
    * moment frame is |types|²-bounded (20 rows of state). */
  val winGrangerCausality: GQuery = {
    // the shared double-formula chain over the exact integer moments
    // (nD..sxl2): centered sums, the 2x2 solve, both RSS, then F
    val syy = "(sy2D - syD * syD / nD)"
    val sylyl = "(syl2D - sylD * sylD / nD)"
    val sxlxl = "(sxl2D - sxlD * sxlD / nD)"
    val syyl = "(syylD - syD * sylD / nD)"
    val syxl = "(syxlD - syD * sxlD / nD)"
    val sylxl = "(sylxlD - sylD * sxlD / nD)"
    val det = s"($sylyl * $sxlxl - $sylxl * $sylxl)"
    val bU = s"(($syyl * $sxlxl - $syxl * $sylxl) / $det)"
    val cU = s"(($syxl * $sylyl - $syyl * $sylxl) / $det)"
    val rssR = s"($syy - $syyl * $syyl / $sylyl)"
    val rssU = s"($syy - $bU * $syyl - $cU * $syxl)"
    val f = s"(($rssR - $rssU) * (nD - 3) / $rssU)"
    val guard = s"$det <= 0 OR $sylyl <= 0 OR $rssU <= 0"
    val casts = Seq("n" -> "nD", "sy" -> "syD", "syl" -> "sylD",
      "sxl" -> "sxlD", "sy2" -> "sy2D", "syl2" -> "syl2D",
      "sxl2" -> "sxl2D", "syyl" -> "syylD", "syxl" -> "syxlD",
      "sylxl" -> "sylxlD")
      .map { case (i, d) => s"CAST($i AS DOUBLE) AS $d" }
      .mkString(", ")
    val finalCols = Seq("cause", "effect", "n",
      s"CASE WHEN $guard THEN CAST(NULL AS DOUBLE) " +
        s"ELSE round($f, 6) END AS f_stat",
      s"CASE WHEN $guard THEN CAST(NULL AS BOOLEAN) " +
        s"ELSE $f > 3.87 END AS causal_95")
    GQuery("win_granger_causality",
      s"""WITH d AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |    CAST(count(*) AS BIGINT) AS y
         |  FROM events GROUP BY 1, 2),
         |tri AS (
         |  SELECT x.event_type AS cause, ye.event_type AS effect,
         |    ye.y AS y, yl.y AS yl, x.y AS xl
         |  FROM d ye
         |  JOIN d yl ON yl.event_type = ye.event_type
         |           AND yl.day = ye.day - 1
         |  JOIN d x ON x.day = ye.day - 1
         |          AND x.event_type != ye.event_type),
         |m AS (
         |  SELECT cause, effect, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(yl) AS BIGINT) AS syl,
         |    CAST(sum(xl) AS BIGINT) AS sxl,
         |    CAST(sum(y * y) AS BIGINT) AS sy2,
         |    CAST(sum(yl * yl) AS BIGINT) AS syl2,
         |    CAST(sum(xl * xl) AS BIGINT) AS sxl2,
         |    CAST(sum(y * yl) AS BIGINT) AS syyl,
         |    CAST(sum(y * xl) AS BIGINT) AS syxl,
         |    CAST(sum(yl * xl) AS BIGINT) AS sylxl
         |  FROM tri GROUP BY 1, 2),
         |md AS (SELECT cause, effect, n, $casts FROM m)
         |SELECT ${finalCols.mkString(",\n  ")}
         |FROM md
         |ORDER BY cause, effect""".stripMargin) { (s, dir) =>
      val d = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("bigint").as("y"))
      val ye = d.select(col("event_type").as("effect"),
        col("day"), col("y"))
      val yl = d.select(col("event_type").as("effect"),
        date_add(col("day"), 1).as("day"), col("y").as("yl"))
      val x = d.select(col("event_type").as("cause"),
        date_add(col("day"), 1).as("day"), col("y").as("xl"))
      val tri = ye.join(yl, Seq("effect", "day"))
        .join(x, Seq("day"))
        .filter(col("cause") =!= col("effect"))
      val m = tri.groupBy(col("cause"), col("effect"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("y")).cast("bigint").as("sy"),
          sum(col("yl")).cast("bigint").as("syl"),
          sum(col("xl")).cast("bigint").as("sxl"),
          sum(col("y") * col("y")).cast("bigint").as("sy2"),
          sum(col("yl") * col("yl")).cast("bigint").as("syl2"),
          sum(col("xl") * col("xl")).cast("bigint").as("sxl2"),
          sum(col("y") * col("yl")).cast("bigint").as("syyl"),
          sum(col("y") * col("xl")).cast("bigint").as("syxl"),
          sum(col("yl") * col("xl")).cast("bigint").as("sylxl"))
      m.selectExpr(Seq("cause", "effect", "n") ++
          casts.split(", ").toSeq: _*)
        .selectExpr(finalCols: _*)
        .orderBy(col("cause"), col("effect"))
    }
  }

  val all: Seq[GQuery] = Seq(winRankTopkPerGroup, winRankDensePct,
    winAnalytic, winFrameRows, winFrameRange, winCumeDist,
    winRangeInterval, winMovingMedian, winParetoShare, winDrawdown,
    winBollinger, winCusumChangepoint, winRollingCorr, winTheilSen,
    winSeasonalDecompose, winYoyGrowth, winStlAnomaly, winSpcRules,
    winKalmanLevel, winMannKendall, winAcf, winLjungBox, winRunsTest,
    winGrangerCausality)
}
