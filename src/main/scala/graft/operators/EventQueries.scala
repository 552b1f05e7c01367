package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GQuery
import graft.sources.Tables
import graft.Ckpt.CkptOps

/** Event-time semantics over the events table (SURVEY.md §2.9), batch
  * form — each query here has a Structured Streaming twin in
  * graft.streaming.EventStreams whose equivalence is asserted in
  * EventStreamsSpec (the oracle is batch DuckDB, so only the batch
  * form is in the contract).
  *
  * Scale notes: tumbling/sliding windows are plain hash aggregations
  * on (window_start, type) — bounded key space, map-side partials,
  * tiny shuffle. Sessionization is one shuffle on user_id + a sorted
  * window pass (state per user = last timestamp), the same shape
  * `session_window` uses in streaming.
  */
object EventQueries {

  /** 1-day tumbling windows per event type. value is 2-decimal-exact
    * so round(sum, 2) sits on the grid, never a boundary. */
  val evTumbling: GQuery = GQuery(
    "ev_tumbling",
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS win_start,
      |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY win_start, event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 day").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(date_format(col("win.start"), "yyyy-MM-dd").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))
  }

  /** 1-day windows sliding every 6 hours (each event lands in 4
    * windows). The oracle reproduces Spark's epoch-aligned window set
    * with integer epoch-µs arithmetic. */
  val evSliding: GQuery = GQuery(
    "ev_sliding",
    """SELECT win_start_us, event_type, count(*) AS n,
      |  round(sum(value), 2) AS sum_value
      |FROM (
      |  SELECT event_type, value,
      |    unnest([(epoch_us(ts) // 21600000000 - k) * 21600000000
      |            for k in [0, 1, 2, 3]]) AS win_start_us
      |  FROM events)
      |GROUP BY 1, 2
      |ORDER BY win_start_us, event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 day", "6 hours").as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_micros(col("win.start")).as("win_start_us"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("win_start_us"), col("event_type"))
  }

  /** Sessionization (30-min inactivity gap) via gaps-and-islands: lag
    * → new-session flag → running sum = session id. Identical SQL
    * shape on both engines; all time math in exact epoch-µs ints. */
  val evSession: GQuery = GQuery(
    "ev_session",
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      |g AS (SELECT user_id, us,
      |    CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us)
      |           IS NULL THEN 1
      |         WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
      |           >= 1800000000 THEN 1
      |         ELSE 0 END AS new_s
      |  FROM e),
      |s AS (SELECT user_id, us,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g),
      |sess AS (SELECT user_id, sid, count(*) AS n_events,
      |    max(us) - min(us) AS len_us
      |  FROM s GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_sessions,
      |  CAST(sum(n_events) AS BIGINT) AS n_events,
      |  CAST(max(len_us) AS BIGINT) AS max_len_us,
      |  CAST((2 * sum(len_us) + count(*)) // (2 * count(*)) AS DOUBLE)
      |    / 1000000 AS avg_len_sec
      |FROM sess
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("us"))
    Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_s",
        when(lag(col("us"), 1).over(byUser).isNull, 1)
          // >= (not >): streaming session_window is half-open
          // [t, t+gap), so an event at exactly start+gap opens a NEW
          // session — the batch twin must agree on boundary gaps.
          .when(col("us") - lag(col("us"), 1).over(byUser) >= 1800000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("len_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).cast("bigint").as("n_events"),
        max(col("len_us")).cast("bigint").as("max_len_us"),
        // mean session length at 6 places, rounded half-up in EXACT
        // integer µs — (2s + n) div (2n) — then ONE double divide.
        // round(double/double/1e6, 6) sat on a half-µs boundary at
        // sf0.1 where Spark's BigDecimal HALF_UP and DuckDB's libm
        // rounding disagreed by 1 ulp in the 6th place.
        (expr("(2 * sum(len_us) + count(1)) div (2 * count(1))")
          .cast("double") / 1000000).as("avg_len_sec"))
      .orderBy(col("user_id"))
  }

  /** Deduplication on a business key (user, day, type), keeping the
    * earliest event — the batch shape of streaming
    * dropDuplicatesWithinWatermark. */
  val evDedupStream: GQuery = GQuery(
    "ev_dedup_stream",
    """SELECT event_type, count(*) AS n_survivors,
      |  CAST(min(event_id) AS BIGINT) AS min_event_id
      |FROM (
      |  SELECT event_id, event_type,
      |    row_number() OVER (
      |      PARTITION BY user_id, date_trunc('day', ts), event_type
      |      ORDER BY ts, event_id) AS rn
      |  FROM events)
      |WHERE rn = 1
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val w = Window
      .partitionBy(col("user_id"), date_trunc("day", col("ts")),
        col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_survivors"),
        min(col("event_id")).as("min_event_id"))
      .orderBy(col("event_type"))
  }

  /** Batch form of the STREAM-STREAM interval join (click→view
    * attribution): delegates to the same
    * `EventStreams.clickAttribution` the streaming query runs —
    * watermarks are no-ops in batch — then aggregates per user so the
    * contract output stays bounded. EventStreamsSpec pins the
    * streaming twin ≡ this exact function over two MemoryStreams.
    *
    * Scale posture: equi-join on user_id with the time bound as a
    * residual conjunct — one shuffle per side at stream scale, state
    * evicted by the watermark + bound pair (see clickAttribution's
    * doc). ts is µs-aligned in the fixture (verified), so the
    * nanos→µs read recipe cannot flip a boundary comparison. */
  val evClickAttribution: GQuery = GQuery(
    "ev_click_attribution",
    """SELECT v.user_id AS user_id,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(count(DISTINCT c.event_id) AS BIGINT) AS n_clicks,
      |  min(v.event_id) AS first_view, max(c.event_id) AS last_click
      |FROM events v JOIN events c
      |  ON v.user_id = c.user_id
      |  AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
      |WHERE v.event_type = 'view' AND c.event_type = 'click'
      |GROUP BY v.user_id
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    graft.streaming.EventStreams.clickAttribution(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "click"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("click_id")).as("n_clicks"),
        min(col("view_id")).as("first_view"),
        max(col("click_id")).as("last_click"))
      .orderBy(col("user_id"))
  }

  /** Conversion FUNNEL per user: every view LEFT-joined to its
    * in-window clicks — converted views (≥1 attributable click) and
    * abandoned views (none, the outer rows) counted from ONE join.
    * The batch face of the left-outer streaming interval join
    * (`EventStreams.clickAttributionWithUnmatched` — same function,
    * EventStreamsSpec pins streaming ≡ batch); this row gives the
    * outer-join semantics an oracle-backed contract entry. */
  val evClickFunnel: GQuery = GQuery(
    "ev_click_funnel",
    """SELECT user_id,
      |  CAST(count(DISTINCT view_id) AS BIGINT) AS n_views,
      |  CAST(count(DISTINCT CASE WHEN click_id IS NOT NULL
      |    THEN view_id END) AS BIGINT) AS n_converted,
      |  CAST(count(DISTINCT CASE WHEN click_id IS NULL
      |    THEN view_id END) AS BIGINT) AS n_abandoned
      |FROM (
      |  SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
      |  FROM (SELECT * FROM events WHERE event_type = 'view') v
      |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |    ON v.user_id = c.user_id
      |    AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR)
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    // collapse to one row per view FIRST (partial-aggregating max),
    // then plain conditional counts — three countDistinct's in one
    // agg would Expand the join output 3× through the shuffle
    graft.streaming.EventStreams.clickAttributionWithUnmatched(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "click"))
      .groupBy(col("user_id"), col("view_id"))
      .agg(max(col("click_id").isNotNull).as("converted"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_views"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("n_converted"),
        sum(when(!col("converted"), 1L).otherwise(0L)).as("n_abandoned"))
      .orderBy(col("user_id"))
  }

  /** Cohort retention: users grouped by first-active day, counted on
    * each day-offset they return (0..7) — the classic growth-analytics
    * triangle. The (user, day) frame is distinct-deduped FIRST (one
    * map-side-combining pass), so the cohort join and the final
    * (cohort, offset) rollup both run on the collapsed per-day frame,
    * not the raw event stream; cohort attach is a uniform user_id
    * equi-join. Dates cross the compare boundary as strings. */
  val evRetention: GQuery = GQuery(
    "ev_retention",
    """WITH d AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
      |           FROM events),
      |c AS (SELECT user_id, min(d) AS c0 FROM d GROUP BY 1)
      |SELECT strftime(c0, '%Y-%m-%d') AS cohort_day,
      |  CAST(date_diff('day', c0, d) AS BIGINT) AS offset_days,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM d JOIN c USING (user_id)
      |WHERE date_diff('day', c0, d) <= 7
      |GROUP BY 1, 2
      |ORDER BY cohort_day, offset_days""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val c = d.groupBy(col("user_id")).agg(min(col("d")).as("c0"))
    d.join(c, Seq("user_id"))
      .withColumn("offset_days", datediff(col("d"), col("c0")).cast("long"))
      .filter(col("offset_days") <= 7)
      .groupBy(date_format(col("c0"), "yyyy-MM-dd").as("cohort_day"),
        col("offset_days"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("offset_days"))
  }

  /** Event-type transition matrix (the Markov view of user flows):
    * consecutive event pairs per user ordered by time, counted into
    * (from_type, to_type) cells with each cell's share of its row —
    * what "users do next" dashboards and session-model features are
    * built from. One shuffle on user_id feeds the lead() window
    * (per-user state only), then a bounded (|types|²) aggregate;
    * event_id breaks timestamp ties so the sequence is deterministic
    * cross-engine. */
  val evTransitions: GQuery = GQuery(
    "ev_transitions",
    """WITH seq AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type
      |  FROM events)
      |SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n,
      |  round(CAST(count(*) AS DOUBLE) / CAST(sum(count(*))
      |    OVER (PARTITION BY from_type) AS DOUBLE), 6) AS row_share
      |FROM seq WHERE to_type IS NOT NULL
      |GROUP BY from_type, to_type
      |ORDER BY from_type, to_type""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val seq = Tables.events(s, dir)
      .select(col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
    val counts = seq.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val wRow = Window.partitionBy(col("from_type"))
    counts
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double")
          / sum(col("n")).over(wRow).cast("double"), 6).as("row_share"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Trailing-window z-score anomaly flags over the daily event-type
    * series — the volume-drop/spike monitor a pipeline runs on its
    * own throughput. Mean/std come from trailing-7-row INTEGER sums
    * (Σcnt, Σcnt²) so the float arithmetic is one fixed expression
    * over exact integers — no engine-order-dependent stddev
    * accumulation can leak into the compare; z is rounded to 6
    * before the |z| ≥ 2 flag. Key space is |types|×|days|: the
    * windows are per-type (bounded state), the daily rollup is the
    * only corpus-sized aggregate and it combines map-side. */
  val evAnomalyZscore: GQuery = GQuery(
    "ev_anomaly_zscore",
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS d,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, d, cnt,
      |    CAST(count(*) OVER tw AS BIGINT) AS n,
      |    CAST(sum(cnt) OVER tw AS BIGINT) AS s1,
      |    CAST(sum(cnt * cnt) OVER tw AS BIGINT) AS s2
      |  FROM daily
      |  WINDOW tw AS (PARTITION BY event_type ORDER BY d
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
      |z AS (
      |  SELECT event_type, d, cnt,
      |    CASE WHEN n > 1 AND
      |      (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)
      |        > 0
      |    THEN round((cnt - CAST(s1 AS DOUBLE) / n) /
      |      sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
      |        / (n - 1)), 6)
      |    END AS zscore
      |  FROM w)
      |SELECT event_type, strftime(d, '%Y-%m-%d') AS day, cnt, zscore,
      |  CASE WHEN zscore IS NULL THEN NULL
      |       ELSE abs(zscore) >= 2 END AS is_anomaly
      |FROM z
      |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("cnt"))
    val tw = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(-6, 0)
    daily
      .withColumn("n", count(lit(1)).over(tw))
      .withColumn("s1", sum(col("cnt")).over(tw))
      .withColumn("s2", sum(col("cnt") * col("cnt")).over(tw))
      .withColumn("varr",
        // inside when(): ANSI mode would otherwise evaluate the
        // n − 1 = 0 division on single-row windows and throw
        when(col("n") > 1,
          (col("s2").cast("double") - col("s1").cast("double")
            * col("s1") / col("n")) / (col("n") - 1)))
      .withColumn("zscore",
        when(col("n") > 1 && col("varr") > 0,
          round((col("cnt") - col("s1").cast("double") / col("n"))
            / sqrt(col("varr")), 6)))
      .select(col("event_type"), date_format(col("d"), "yyyy-MM-dd")
          .as("day"), col("cnt"), col("zscore"),
        when(col("zscore").isNotNull, abs(col("zscore")) >= 2)
          .as("is_anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Calendar-spine GAP FILLING over the daily per-type series — the
    * densification step every time-series consumer downstream of an
    * event pipeline needs (a day with zero events must appear as an
    * explicit 0, or moving averages / anomaly z-scores silently skip
    * it). The spine spans the corpus's [min, max] day; missing
    * (type, day) cells materialize with cnt = 0 and an is_filled
    * flag. All-integer outputs, day formatted to string.
    *
    * Scale shape: the spine derives from a 1-row min/max aggregate
    * (explode of a sequence — days, not corpus rows); the type dim is
    * a bounded distinct broadcast; the fill join is keyed equi on
    * (type, day) against the already-aggregated daily frame. The
    * corpus is touched exactly once (the daily rollup, map-side
    * combining). */
  val evGapFill: GQuery = GQuery(
    "ev_gap_fill",
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS d,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT min(d) AS d0, max(d) AS d1 FROM daily),
      |spine AS (
      |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d
      |  FROM span),
      |types AS (SELECT DISTINCT event_type FROM events)
      |SELECT t.event_type, strftime(s.d, '%Y-%m-%d') AS day,
      |  CAST(coalesce(dd.cnt, 0) AS BIGINT) AS cnt,
      |  dd.cnt IS NULL AS is_filled
      |FROM spine s CROSS JOIN types t
      |  LEFT JOIN daily dd ON dd.event_type = t.event_type AND dd.d = s.d
      |ORDER BY t.event_type, day""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val daily = ev
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("cnt"))
    val spine = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"),
        expr("INTERVAL 1 DAY"))).as("d"))
    val types = ev.select(col("event_type")).distinct()
    spine.crossJoin(broadcast(types))
      .join(daily, Seq("event_type", "d"), "left")
      .select(col("event_type"),
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        col("cnt").isNull.as("is_filled"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Multi-stage ORDERED funnel (view → click → purchase, 3 steps):
    * stage n counts users whose earliest stage-n event falls STRICTLY
    * after their stage-(n−1) time — sequence semantics, not mere
    * co-occurrence (a purchase before any post-view click does not
    * count), and no pivot anywhere. The one event-analytics shape the
    * two-step click funnel (`ev_click_funnel`) doesn't cover.
    *
    * Scale shape: each stage collapses to ≤1 row per user (map-side-
    * combining min) BEFORE the next stage's equi-join consumes it, so
    * every join has an aggregated, per-user-unique side and the raw
    * event stream is scanned once per stage with the type filter
    * pushed to the scan; the final counts are 1-row aggregates. Depth
    * generalizes: stage n+1 is one more filter+join+min, never a
    * wider pivot or a per-user sort. */
  val evFunnelSteps: GQuery = GQuery(
    "ev_funnel_steps",
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |            WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |       JOIN s1 ON e.user_id = s1.user_id
      |       WHERE e.event_type = 'click' AND e.ts > s1.t1
      |       GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |       JOIN s2 ON e.user_id = s2.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |       GROUP BY 1)
      |SELECT * FROM (
      |  SELECT 1 AS step, 'view' AS stage,
      |    CAST(count(*) AS BIGINT) AS n_users FROM s1
      |  UNION ALL SELECT 2, 'view>click', CAST(count(*) AS BIGINT) FROM s2
      |  UNION ALL SELECT 3, 'view>click>purchase',
      |    CAST(count(*) AS BIGINT) FROM s3)
      |ORDER BY step""".stripMargin) { (s, dir) =>
    graft.api.Events.funnel(Tables.events(s, dir),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
  }

  /** The [[evFunnelSteps]] funnel under a CONVERSION WINDOW: step n
    * must land within 2 hours of step n−1 (attribution bound), not
    * merely after it — the realistic marketing-funnel semantics. Same
    * plan as the unbounded funnel: the bound rides each stage's
    * equi-join as a residual conjunct (the ev_click_attribution
    * interval-join discipline), so the window changes answers, never
    * plan shape. µs-aligned fixture timestamps keep the +2h boundary
    * compare exact on both engines. */
  val evFunnelWindow: GQuery = GQuery(
    "ev_funnel_window",
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
      |            WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |       JOIN s1 ON e.user_id = s1.user_id
      |       WHERE e.event_type = 'click' AND e.ts > s1.t1
      |         AND e.ts <= s1.t1 + INTERVAL 2 HOUR
      |       GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |       JOIN s2 ON e.user_id = s2.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |         AND e.ts <= s2.t2 + INTERVAL 2 HOUR
      |       GROUP BY 1)
      |SELECT * FROM (
      |  SELECT 1 AS step, 'view' AS stage,
      |    CAST(count(*) AS BIGINT) AS n_users FROM s1
      |  UNION ALL SELECT 2, 'view>click', CAST(count(*) AS BIGINT) FROM s2
      |  UNION ALL SELECT 3, 'view>click>purchase',
      |    CAST(count(*) AS BIGINT) FROM s3)
      |ORDER BY step""".stripMargin) { (s, dir) =>
    graft.api.Events.funnel(Tables.events(s, dir),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"),
      maxDelay = Some("2 hours"))
  }

  /** Top-10 most common 3-step event-type PATHS (user-journey
    * n-grams) — the path-mining complement of [[evTransitions]]'s
    * 1-step Markov matrix: consecutive event triples per user in
    * (ts, event_id) order, counted corpus-wide, top-10 with a
    * deterministic (count desc, path asc) tiebreak.
    *
    * Scale shape: one shuffle to the user grain for the two lead()
    * windows (the same exchange every per-user analytic here rides),
    * then a map-side-combining count over a key space bounded by
    * |event_types|³ = 125, and a TakeOrderedAndProject top-10 — no
    * full sort, no second wide shuffle. */
  val evUserPaths: GQuery = GQuery(
    "ev_user_paths",
    """WITH o AS (
      |  SELECT user_id, event_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS t1,
      |    lead(event_type, 2) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS t2
      |  FROM events)
      |SELECT event_type || '>' || t1 || '>' || t2 AS path,
      |  CAST(count(*) AS BIGINT) AS cnt
      |FROM o WHERE t2 IS NOT NULL
      |GROUP BY 1 ORDER BY cnt DESC, path LIMIT 10""".stripMargin) {
    (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .filter(col("t2").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t1"), col("t2"))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path")).limit(10)
  }

  /** Rolling ACTIVE-USER counts — per-day DAU plus trailing-7-day WAU
    * (exact distinct users over the [d−6, d] window), the dashboard
    * pair every product-analytics stack maintains. Days reported are
    * the days with events.
    *
    * Scale shape: an exact rolling COUNT DISTINCT cannot ride a
    * window frame (distinct doesn't decompose), and a keyless range
    * join days×day_user would be quadratic in days — so each
    * DISTINCT (day, user) pair is exploded to the ≤7 target days it
    * makes active (a CONSTANT fan-out, not density-dependent), the
    * targets are semi-joined to the observed-day set (tiny,
    * broadcast), and one (target_day, user) distinct-count shuffle
    * finishes. At 100 TB the pre-explode day-user dedup is the big
    * win: the fan-out runs on the deduped pairs (users×days), not
    * the raw event stream. */
  val evRollingActiveUsers: GQuery = GQuery(
    "ev_rolling_active_users",
    """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
      |            FROM events),
      |days AS (SELECT DISTINCT d FROM du),
      |wau AS (SELECT days.d, count(DISTINCT du.user_id) AS wau
      |        FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
      |        GROUP BY days.d),
      |dau AS (SELECT d, count(*) AS dau FROM du GROUP BY d)
      |SELECT strftime(dau.d, '%Y-%m-%d') AS day,
      |  CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau
      |FROM dau JOIN wau ON dau.d = wau.d
      |ORDER BY day""".stripMargin) { (s, dir) =>
    val du = Tables.events(s, dir)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
    val days = du.select(col("d").as("td")).distinct()
    val dau = du.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    val wau = du
      .select(col("d"), col("user_id"),
        explode(sequence(lit(0), lit(6))).as("k"))
      .select(expr("date_add(d, k)").as("td"), col("user_id"))
      .join(broadcast(days), Seq("td"), "left_semi")
      .groupBy(col("td"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, col("d") === col("td"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"))
      .orderBy(col("day"))
  }

  /** TIME-TO-CONVERT distribution — "how long from first view to
    * first purchase?", grouped by the first-view COHORT DAY: the lag
    * percentiles a funnel dashboard plots next to the conversion
    * counts (ev_funnel_steps gives how many; this gives how fast).
    * Lags are exact integer epoch-µs diffs, so the dyadic-fraction
    * interpolated percentiles are EXACT in binary floating point on
    * both engines (the agg_percentiles discipline).
    *
    * Scale shape: two per-user min-aggregates (map-side combining,
    * one row per user each) joined on user_id, then a ≤|days|-key
    * percentile aggregate — the corpus is touched twice, shuffled at
    * the user grain once. */
  val evConversionLag: GQuery = GQuery(
    "ev_conversion_lag",
    """WITH fv AS (SELECT user_id, min(ts) AS v FROM events
      |            WHERE event_type = 'view' GROUP BY user_id),
      |fp AS (SELECT e.user_id,
      |         min(epoch_us(e.ts) - epoch_us(fv.v)) AS lag_us
      |       FROM events e JOIN fv ON e.user_id = fv.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > fv.v
      |       GROUP BY e.user_id),
      |j AS (SELECT strftime(CAST(v AS DATE), '%Y-%m-%d') AS cohort_day,
      |             lag_us
      |      FROM fv JOIN fp ON fv.user_id = fp.user_id)
      |SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_converted,
      |  quantile_cont(lag_us, 0.5) AS lag_p50_us,
      |  quantile_cont(lag_us, 0.75) AS lag_p75_us
      |FROM j GROUP BY cohort_day
      |ORDER BY cohort_day""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val fv = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("v"))
    val fp = ev.filter(col("event_type") === "purchase")
      .join(fv, Seq("user_id"))
      .filter(col("ts") > col("v"))
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts")) - unix_micros(col("v")))
        .as("lag_us"))
    fv.join(fp, Seq("user_id"))
      .select(date_format(col("v"), "yyyy-MM-dd").as("cohort_day"),
        col("lag_us"))
      .groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("n_converted"),
        expr("percentile(lag_us, 0.5d)").as("lag_p50_us"),
        expr("percentile(lag_us, 0.75d)").as("lag_p75_us"))
      .orderBy(col("cohort_day"))
  }

  /** VELOCITY / burst detection — the rate-limit & fraud-rule shape:
    * each user's busiest single HOUR (max events in any hour, with
    * the hour itself and the user's active-hour count), top-20 by
    * burst — the report an abuse desk reads and a rate limiter's
    * thresholds are tuned from. Ties on the burst pick the EARLIEST
    * hour via the min-struct argmax (window-free, the agg_mode
    * discipline).
    *
    * Scale shape: one (user, hour) map-side-combining count, one
    * per-user min-struct aggregate, TakeOrderedAndProject top-20 —
    * no windows, both aggregates collapse before their shuffles. */
  val evVelocityBurst: GQuery = GQuery(
    "ev_velocity_burst",
    """WITH uh AS (
      |  SELECT user_id, date_trunc('hour', ts) AS hr, count(*) AS n
      |  FROM events GROUP BY user_id, date_trunc('hour', ts)),
      |mx AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_active_hours,
      |    max(n) AS max_burst,
      |    min(CASE WHEN n = (SELECT max(n) FROM uh u2
      |                       WHERE u2.user_id = uh.user_id)
      |        THEN hr END) AS burst_hour
      |  FROM uh GROUP BY user_id)
      |SELECT user_id, CAST(max_burst AS BIGINT) AS max_burst,
      |  strftime(burst_hour, '%Y-%m-%d %H:%M:%S') AS burst_hour,
      |  n_active_hours
      |FROM mx
      |ORDER BY max_burst DESC, user_id
      |LIMIT 20""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_active_hours"),
        min(struct((-col("n")).as("neg"), col("hr").as("hr"))).as("pick"))
      .select(col("user_id"), (-col("pick.neg")).as("max_burst"),
        date_format(col("pick.hr"), "yyyy-MM-dd HH:mm:ss").as("burst_hour"),
        col("n_active_hours"))
      .orderBy(col("max_burst").desc, col("user_id"))
      .limit(20)
  }

  /** MULTI-TOUCH LINEAR ATTRIBUTION — each purchase's value split
    * EQUALLY across the user's view/click touchpoints in the
    * trailing 24 h (the marketing-analytics standard next to
    * last-touch, which ev_click_attribution covers); purchases with
    * no in-window touch report under '(none)'. Per-touch credit is
    * value·cnt/total rounded to 6 in ONE double expression, then
    * summed on the DECIMAL(18,6) grid — order-free cross-engine.
    *
    * Scale shape: the purchase×touch join is user-keyed with the
    * 24 h bound as a residual conjunct (the ev_click_attribution
    * interval discipline — evictable state in the streaming twin's
    * terms); per-purchase counts collapse map-side to ≤|types| rows
    * before the credit rollup; the no-touch row is a keyed anti
    * join. */
  val evAttributionLinear: GQuery = GQuery(
    "ev_attribution_linear",
    """WITH p AS (SELECT event_id, user_id, ts, value FROM events
      |           WHERE event_type = 'purchase'),
      |t AS (SELECT user_id, ts AS tts, event_type AS touch FROM events
      |      WHERE event_type IN ('view', 'click')),
      |j AS (SELECT p.event_id, p.value, t.touch
      |      FROM p JOIN t ON p.user_id = t.user_id
      |        AND t.tts < p.ts AND t.tts >= p.ts - INTERVAL 24 HOUR),
      |per AS (SELECT event_id, value, touch, count(*) AS cnt
      |        FROM j GROUP BY event_id, value, touch),
      |tot AS (SELECT event_id, sum(cnt) AS tot FROM per GROUP BY event_id),
      |credit AS (
      |  SELECT touch,
      |    CAST(round(CAST(round(per.value, 2) AS DOUBLE) * cnt
      |               / tot, 6) AS DECIMAL(18,6)) AS c
      |  FROM per JOIN tot ON per.event_id = tot.event_id),
      |touched AS (SELECT touch, count(*) AS n_credits,
      |    CAST(round(sum(c), 2) AS DOUBLE) AS credited
      |  FROM credit GROUP BY touch),
      |untouched AS (
      |  SELECT '(none)' AS touch, CAST(count(*) AS BIGINT) AS n_credits,
      |    CAST(round(sum(CAST(round(value, 2) AS DECIMAL(12,2))), 2)
      |      AS DOUBLE) AS credited
      |  FROM p WHERE NOT EXISTS
      |    (SELECT 1 FROM j WHERE j.event_id = p.event_id))
      |SELECT touch, CAST(n_credits AS BIGINT) AS n_credits, credited
      |FROM (SELECT * FROM touched UNION ALL SELECT * FROM untouched)
      |ORDER BY touch""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value"), 2).cast("decimal(12,2)").as("value"))
    val t = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts").as("tts"),
        col("event_type").as("touch"))
    val j = p.join(t, Seq("user_id"))
      .filter(col("tts") < col("ts") &&
        col("tts") >= col("ts") - expr("INTERVAL 24 HOUR"))
      .select(col("event_id"), col("value"), col("touch"))
    val per = j.groupBy(col("event_id"), col("value"), col("touch"))
      .agg(count(lit(1)).as("cnt"))
    val tot = per.groupBy(col("event_id")).agg(sum(col("cnt")).as("tot"))
    val touched = per.join(tot, Seq("event_id"))
      .select(col("touch"),
        round(col("value").cast("double") * col("cnt") / col("tot"), 6)
          .cast("decimal(18,6)").as("c"))
      .groupBy(col("touch"))
      .agg(count(lit(1)).as("n_credits"),
        round(sum(col("c")), 2).cast("double").as("credited"))
    val untouched = p.join(j.select(col("event_id")).distinct(),
        Seq("event_id"), "left_anti")
      .agg(count(lit(1)).as("n_credits"),
        round(sum(col("value")), 2).cast("double").as("credited"))
      .select(lit("(none)").as("touch"), col("n_credits"),
        col("credited"))
    touched.unionByName(untouched).orderBy(col("touch"))
  }

  /** Cohort LTV curves — cumulative purchase value per signup cohort
    * by week-since-first-seen: the lifetime-value table a growth team
    * reads cohort-over-cohort (ev_retention counts who comes back;
    * this sums what they spend). Weekly sums on the DECIMAL(12,2)
    * grid; the running total is a window over the ≤|cohorts|×|weeks|
    * aggregated grid (wk is unique per cohort), never over raw
    * events.
    *
    * Scale shape: one per-user min (first-seen), one user-keyed join,
    * one (cohort, week) map-side-combining aggregate, then the
    * cumulative window on the tiny grid. */
  val evCohortLtv: GQuery = GQuery(
    "ev_cohort_ltv",
    """WITH first_seen AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort
      |                    FROM events GROUP BY user_id),
      |vals AS (SELECT f.cohort,
      |           (CAST(e.ts AS DATE) - f.cohort) // 7 AS wk,
      |           CAST(round(e.value, 2) AS DECIMAL(12,2)) AS v
      |         FROM events e JOIN first_seen f ON e.user_id = f.user_id
      |         WHERE e.event_type = 'purchase'),
      |wkagg AS (SELECT strftime(cohort, '%Y-%m-%d') AS cohort, wk,
      |            count(*) AS n_purchases, sum(v) AS wk_value
      |          FROM vals GROUP BY 1, 2)
      |SELECT cohort, CAST(wk AS INT) AS wk,
      |  CAST(n_purchases AS BIGINT) AS n_purchases,
      |  CAST(round(sum(wk_value) OVER (PARTITION BY cohort ORDER BY wk), 2)
      |    AS DOUBLE) AS cum_value
      |FROM wkagg
      |ORDER BY cohort, wk""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val firstSeen = ev.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort"))
    val wkagg = ev.filter(col("event_type") === "purchase")
      .join(firstSeen, Seq("user_id"))
      .select(col("cohort"),
        expr("datediff(to_date(ts), cohort) div 7").as("wk"),
        round(col("value"), 2).cast("decimal(12,2)").as("v"))
      .groupBy(col("cohort"), col("wk"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("v")).as("wk_value"))
    wkagg
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        col("wk").cast("int").as("wk"), col("n_purchases"),
        round(sum(col("wk_value")).over(
          Window.partitionBy(col("cohort")).orderBy(col("wk"))), 2)
          .cast("double").as("cum_value"))
      .orderBy(col("cohort"), col("wk"))
  }

  /** POSITION-BASED (U-shaped) multi-touch attribution — the third
    * standard model next to last-touch (ev_click_attribution) and
    * linear (ev_attribution_linear): 40% of a purchase's value to the
    * FIRST in-window touch, 40% to the LAST, the middle 20% split
    * evenly across interior touches (1-touch → 100%, 2-touch →
    * 50/50). Touch order is total ((tts, touch event_id) — unique),
    * each credit is ONE rounded double expression summed on the
    * DECIMAL(18,6) grid.
    *
    * Scale shape: the same user-keyed 24 h interval join as the
    * linear model; the position window partitions by PURCHASE id —
    * per-partition rows bounded by one user's touches in 24 h, the
    * evictable-state bound of the streaming twin's terms. */
  val evAttributionPosition: GQuery = GQuery(
    "ev_attribution_position",
    """WITH p AS (SELECT event_id, user_id, ts, value FROM events
      |           WHERE event_type = 'purchase'),
      |t AS (SELECT user_id, event_id AS tid, ts AS tts,
      |        event_type AS touch
      |      FROM events WHERE event_type IN ('view', 'click')),
      |j AS (SELECT p.event_id, p.value, t.tid, t.tts, t.touch
      |      FROM p JOIN t ON p.user_id = t.user_id
      |        AND t.tts < p.ts AND t.tts >= p.ts - INTERVAL 24 HOUR),
      |ranked AS (
      |  SELECT event_id, value, touch,
      |    row_number() OVER (PARTITION BY event_id
      |      ORDER BY tts, tid) AS pos,
      |    count(*) OVER (PARTITION BY event_id) AS n
      |  FROM j),
      |credit AS (
      |  SELECT touch,
      |    CAST(round(CAST(round(value, 2) AS DOUBLE) *
      |      CASE WHEN n = 1 THEN 1.0
      |           WHEN n = 2 THEN 0.5
      |           WHEN pos = 1 THEN 0.4
      |           WHEN pos = n THEN 0.4
      |           ELSE 0.2 / (n - 2) END, 6) AS DECIMAL(18,6)) AS c
      |  FROM ranked)
      |SELECT touch, CAST(count(*) AS BIGINT) AS n_credits,
      |  CAST(round(sum(c), 2) AS DOUBLE) AS credited
      |FROM credit GROUP BY touch
      |ORDER BY touch""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value"), 2).cast("decimal(12,2)").as("value"))
    val t = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("tid"),
        col("ts").as("tts"), col("event_type").as("touch"))
    val j = p.join(t, Seq("user_id"))
      .filter(col("tts") < col("ts") &&
        col("tts") >= col("ts") - expr("INTERVAL 24 HOUR"))
      .select(col("event_id"), col("value"), col("tid"), col("tts"),
        col("touch"))
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("tts"), col("tid"))
    val wn = Window.partitionBy(col("event_id"))
    j.withColumn("pos", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .select(col("touch"),
        round(col("value").cast("double") *
          when(col("n") === 1, 1.0)
            .when(col("n") === 2, 0.5)
            .when(col("pos") === 1, 0.4)
            .when(col("pos") === col("n"), 0.4)
            .otherwise(lit(0.2) / (col("n") - 2)), 6)
          .cast("decimal(18,6)").as("c"))
      .groupBy(col("touch"))
      .agg(count(lit(1)).as("n_credits"),
        round(sum(col("c")), 2).cast("double").as("credited"))
      .orderBy(col("touch"))
  }

  /** TIME-DECAY multi-touch attribution — the fourth standard model
    * (after last-touch, linear, position-based): each in-window touch
    * earns weight 2^(-Δt / half-life) with a 6 h half-life (a touch
    * 6 h before the purchase counts half as much as one at the
    * instant of purchase), normalized per purchase so credits sum to
    * the purchase value.
    *
    * Cross-engine determinism: Δt is EXACT integer seconds, the pow
    * weight is rounded to 8 places (the graph_pagerank per-iteration
    * discipline — kills last-ulp pow differences), per-purchase
    * weight totals sum on the DECIMAL(20,8) grid (order-free), and
    * the credit ratio divides the SAME two doubles in both engines
    * before the round-6 → DECIMAL(18,6) rollup.
    *
    * Scale shape: identical to the linear model — a user-keyed
    * interval join with the 24 h bound as a residual conjunct, one
    * purchase-keyed total, and a map-side-combining per-touch
    * rollup; nothing is windowed over raw events. */
  val evAttributionDecay: GQuery = GQuery(
    "ev_attribution_decay",
    """WITH p AS (SELECT event_id, user_id, ts, value FROM events
      |           WHERE event_type = 'purchase'),
      |t AS (SELECT user_id, ts AS tts, event_type AS touch FROM events
      |      WHERE event_type IN ('view', 'click')),
      |j AS (SELECT p.event_id, p.value, t.touch,
      |        CAST(round(pow(0.5,
      |          date_diff('second', t.tts, p.ts) / 21600.0), 8)
      |          AS DECIMAL(20,8)) AS w
      |      FROM p JOIN t ON p.user_id = t.user_id
      |        AND t.tts < p.ts AND t.tts >= p.ts - INTERVAL 24 HOUR),
      |tot AS (SELECT event_id, sum(w) AS tot FROM j GROUP BY event_id),
      |credit AS (
      |  SELECT touch,
      |    CAST(round(CAST(round(j.value, 2) AS DOUBLE)
      |      * (CAST(j.w AS DOUBLE) / CAST(tot.tot AS DOUBLE)), 6)
      |      AS DECIMAL(18,6)) AS c
      |  FROM j JOIN tot ON j.event_id = tot.event_id),
      |touched AS (SELECT touch, count(*) AS n_credits,
      |    CAST(round(sum(c), 2) AS DOUBLE) AS credited
      |  FROM credit GROUP BY touch),
      |untouched AS (
      |  SELECT '(none)' AS touch, CAST(count(*) AS BIGINT) AS n_credits,
      |    CAST(round(sum(CAST(round(value, 2) AS DECIMAL(12,2))), 2)
      |      AS DOUBLE) AS credited
      |  FROM p WHERE NOT EXISTS
      |    (SELECT 1 FROM j WHERE j.event_id = p.event_id))
      |SELECT touch, CAST(n_credits AS BIGINT) AS n_credits, credited
      |FROM (SELECT * FROM touched UNION ALL SELECT * FROM untouched)
      |ORDER BY touch""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value"), 2).cast("decimal(12,2)").as("value"))
    val t = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts").as("tts"),
        col("event_type").as("touch"))
    val j = p.join(t, Seq("user_id"))
      .filter(col("tts") < col("ts") &&
        col("tts") >= col("ts") - expr("INTERVAL 24 HOUR"))
      .select(col("event_id"), col("value"), col("touch"),
        round(pow(lit(0.5),
          (col("ts").cast("long") - col("tts").cast("long")) / lit(21600.0)),
          8).cast("decimal(20,8)").as("w"))
    val tot = j.groupBy(col("event_id")).agg(sum(col("w")).as("tot"))
    val touched = j.join(tot, Seq("event_id"))
      .select(col("touch"),
        round(col("value").cast("double") *
          (col("w").cast("double") / col("tot").cast("double")), 6)
          .cast("decimal(18,6)").as("c"))
      .groupBy(col("touch"))
      .agg(count(lit(1)).as("n_credits"),
        round(sum(col("c")), 2).cast("double").as("credited"))
    val untouched = p.join(j.select(col("event_id")).distinct(),
        Seq("event_id"), "left_anti")
      .agg(count(lit(1)).as("n_credits"),
        round(sum(col("value")), 2).cast("double").as("credited"))
      .select(lit("(none)").as("touch"), col("n_credits"),
        col("credited"))
    touched.unionByName(untouched).orderBy(col("touch"))
  }

  /** RFM SEGMENTATION — the classic marketing cube: per purchasing
    * user, Recency (days from last purchase to the corpus's max
    * event time), Frequency (purchase count) and Monetary (decimal
    * value total) are each cut into quintiles, and users are counted
    * per (r, f, m) cell. Quintile assignment is ntile(5) over the
    * TOTAL order (metric, user_id) — tie-broken by the unique user
    * id, so the cut is engine- and parallelism-stable (the win_ntile
    * discipline); scores read "1 = lowest metric value" in every
    * dimension.
    *
    * Scale shape: events collapse map-side to one row per purchasing
    * user BEFORE any window; the three global ntiles then run over
    * the user-grain frame (several orders smaller than the event
    * log). A global ntile serializes into one task — acceptable on
    * the user grid; at true 100 TB user counts the same cut is a
    * range-partitioned sort + per-partition offsets (the win_ntile
    * scaladoc's note applies to the raw-event grain, which this
    * query never windows). */
  val evRfmSegmentation: GQuery = GQuery(
    "ev_rfm_segmentation",
    """WITH anchor AS (SELECT max(ts) AS a FROM events),
      |u AS (
      |  SELECT user_id,
      |    date_diff('day', CAST(max(ts) AS DATE),
      |      CAST((SELECT a FROM anchor) AS DATE)) AS recency_days,
      |    count(*) AS freq,
      |    sum(CAST(round(value, 2) AS DECIMAL(12,2))) AS monetary
      |  FROM events WHERE event_type = 'purchase'
      |  GROUP BY user_id),
      |scored AS (
      |  SELECT user_id,
      |    ntile(5) OVER (ORDER BY recency_days, user_id) AS r_score,
      |    ntile(5) OVER (ORDER BY freq, user_id) AS f_score,
      |    ntile(5) OVER (ORDER BY monetary, user_id) AS m_score,
      |    monetary
      |  FROM u)
      |SELECT r_score, f_score, m_score,
      |  CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(round(sum(monetary), 2) AS DOUBLE) AS segment_value
      |FROM scored
      |GROUP BY r_score, f_score, m_score
      |ORDER BY r_score, f_score, m_score""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val anchor = ev.agg(max(col("ts")).as("a"))
    val u = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("freq"),
        sum(round(col("value"), 2).cast("decimal(12,2)")).as("monetary"))
      .crossJoin(broadcast(anchor))
      .select(col("user_id"),
        datediff(to_date(col("a")), to_date(col("last_ts")))
          .as("recency_days"),
        col("freq"), col("monetary"))
    val scored = u.select(col("user_id"), col("monetary"),
      ntile(5).over(Window.orderBy(col("recency_days"), col("user_id")))
        .as("r_score"),
      ntile(5).over(Window.orderBy(col("freq"), col("user_id")))
        .as("f_score"),
      ntile(5).over(Window.orderBy(col("monetary"), col("user_id")))
        .as("m_score"))
    scored.groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_users"),
        round(sum(col("monetary")), 2).cast("double").as("segment_value"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  /** CUMULATIVE UNIQUE USERS — the growth curve "total distinct users
    * ever seen, by day and event type" that a naive
    * count(DISTINCT) OVER (ORDER BY day) would compute by
    * re-scanning history per day: instead each (type, user) collapses
    * to its FIRST day (one map-side-combining min — the only pass
    * over raw events), first-days roll up to per-day new-user counts,
    * and the running total is a window over the tiny (type, day)
    * grid. The standard O(n) rewrite of a running-distinct.
    *
    * Scale shape: one shuffle at the (type, user) grain, one at the
    * (type, day) grain, cumulative window state = one partial sum
    * per type. Nothing re-reads history. */
  val evCumulativeUniques: GQuery = GQuery(
    "ev_cumulative_uniques",
    """WITH first_seen AS (
      |  SELECT event_type, user_id, min(CAST(ts AS DATE)) AS d
      |  FROM events GROUP BY event_type, user_id),
      |daily AS (
      |  SELECT event_type, d, count(*) AS new_users
      |  FROM first_seen GROUP BY event_type, d)
      |SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
      |  CAST(new_users AS BIGINT) AS new_users,
      |  CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY d)
      |    AS BIGINT) AS cum_users
      |FROM daily
      |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(min(to_date(col("ts"))).as("d"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("new_users"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    daily.select(col("event_type"),
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("new_users"),
        sum(col("new_users")).over(w).as("cum_users"))
      .orderBy(col("event_type"), col("day"))
  }

  /** POINT-IN-TIME FEATURE ROLLUP — the feature-store join that
    * backs every leakage-free training set: for each label event (a
    * purchase), the user's trailing-7-day behavioral features
    * computed STRICTLY BEFORE the label timestamp (views, clicks,
    * errors, prior spend). Using only `< ts` data is what makes the
    * features causally valid; the companion dedup_split_leakage
    * audits the split, this builds the features.
    *
    * Spend sums ride the DECIMAL(12,2) grid; zero-history purchases
    * survive via the left join with coalesced zeros.
    *
    * Scale shape: purchases×events joins on user_id with the 7-day
    * bound as a residual conjunct — state per user is one bounded
    * window (the as-of/interval discipline shared with
    * ev_attribution_linear); features collapse map-side to one row
    * per label before output. At 100 TB this is the classic
    * range-bounded stream-stream join keyed by entity. */
  val evFeatureAsof: GQuery = GQuery(
    "ev_feature_asof",
    """WITH p AS (SELECT event_id, user_id, ts FROM events
      |           WHERE event_type = 'purchase'),
      |j AS (
      |  SELECT p.event_id, p.user_id, p.ts, e.event_type AS f_type,
      |    CAST(round(e.value, 2) AS DECIMAL(12,2)) AS f_value
      |  FROM p LEFT JOIN events e ON e.user_id = p.user_id
      |    AND e.ts < p.ts AND e.ts >= p.ts - INTERVAL 7 DAY)
      |SELECT event_id, user_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS label_ts,
      |  CAST(count(*) FILTER (WHERE f_type = 'view') AS BIGINT)
      |    AS views_7d,
      |  CAST(count(*) FILTER (WHERE f_type = 'click') AS BIGINT)
      |    AS clicks_7d,
      |  CAST(count(*) FILTER (WHERE f_type = 'error') AS BIGINT)
      |    AS errors_7d,
      |  CAST(round(coalesce(sum(f_value)
      |    FILTER (WHERE f_type = 'purchase'), 0), 2) AS DOUBLE)
      |    AS prior_spend_7d
      |FROM j GROUP BY event_id, user_id, ts
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val f = ev.select(col("user_id").as("f_user"), col("ts").as("fts"),
      col("event_type").as("f_type"),
      round(col("value"), 2).cast("decimal(12,2)").as("f_value"))
    p.join(f, col("f_user") === col("user_id") &&
        col("fts") < col("ts") &&
        col("fts") >= col("ts") - expr("INTERVAL 7 DAY"), "left")
      .groupBy(col("event_id"), col("user_id"), col("ts"))
      .agg(
        count(when(col("f_type") === "view", 1)).as("views_7d"),
        count(when(col("f_type") === "click", 1)).as("clicks_7d"),
        count(when(col("f_type") === "error", 1)).as("errors_7d"),
        round(coalesce(sum(when(col("f_type") === "purchase",
          col("f_value"))), lit(0)), 2).cast("double")
          .as("prior_spend_7d"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("label_ts"),
        col("views_7d"), col("clicks_7d"), col("errors_7d"),
        col("prior_spend_7d"))
      .orderBy(col("event_id"))
  }

  /** Daily NEW vs RETURNING active users — the growth-accounting
    * split every DAU dashboard carries: a user is "new" on the first
    * day they ever appear, "returning" on any later active day.
    *
    * Scale shape: first-seen is one map-side-combining min per user;
    * the daily split joins actives to first-seen ON THE USER KEY
    * (both sides partition by user_id — co-located), then collapses
    * to the bounded day grid. No windows, no broadcast. */
  val evNewVsReturning: GQuery = GQuery(
    "ev_new_vs_returning",
    """WITH fs AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS d0
      |  FROM events GROUP BY user_id),
      |act AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events)
      |SELECT strftime(d, '%Y-%m-%d') AS day,
      |  CAST(count(*) AS BIGINT) AS active_users,
      |  CAST(count(*) FILTER (WHERE d = d0) AS BIGINT) AS new_users,
      |  CAST(count(*) FILTER (WHERE d > d0) AS BIGINT)
      |    AS returning_users
      |FROM act JOIN fs USING (user_id)
      |GROUP BY d
      |ORDER BY day""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val fs = ev.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("d0"))
    val act = ev.select(to_date(col("ts")).as("d"), col("user_id"))
      .distinct()
    act.join(fs, Seq("user_id"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("active_users"),
        count(when(col("d") === col("d0"), 1)).as("new_users"),
        count(when(col("d") > col("d0"), 1)).as("returning_users"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("active_users"), col("new_users"), col("returning_users"))
      .orderBy(col("day"))
  }

  /** ERROR-BUDGET / SLO MONITOR — the SRE readout over the event
    * stream: daily error rate against a 25% SLO (the fixture's error
    * type is one of five, so the series hovers near the objective and
    * both breach states occur), plus the month-to-date budget burn
    * (cumulative errors over cumulative allowance). The breach flag
    * compares the single-divide rate — identical arithmetic on both
    * engines; displayed rates round 6.
    *
    * Scale shape: one map-side-combining daily aggregate, then a
    * cumulative window over the BOUNDED day grid. The streaming twin
    * is a tumbling-window count (ev_tumbling's shape) with the burn
    * computed downstream. */
  val evErrorBudget: GQuery = GQuery(
    "ev_error_budget",
    """WITH d AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS n,
      |    count(*) FILTER (WHERE event_type = 'error') AS errs
      |  FROM events GROUP BY 1),
      |c AS (
      |  SELECT day, n, errs,
      |    CAST(sum(n) OVER (ORDER BY day) AS BIGINT) AS cum_n,
      |    CAST(sum(errs) OVER (ORDER BY day) AS BIGINT) AS cum_errs
      |  FROM d)
      |SELECT strftime(day, '%Y-%m-%d') AS day,
      |  CAST(n AS BIGINT) AS n_events, CAST(errs AS BIGINT) AS n_errors,
      |  round(errs / CAST(n AS DOUBLE), 6) AS error_rate,
      |  CAST(CASE WHEN errs / CAST(n AS DOUBLE) > 0.25 THEN 1 ELSE 0 END
      |    AS INT) AS slo_breach,
      |  round(cum_errs / (0.25 * cum_n), 6) AS budget_burn
      |FROM c
      |ORDER BY day""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        count(when(col("event_type") === "error", 1)).as("errs"))
    val w = Window.orderBy(col("day"))
    d.withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_errs", sum(col("errs")).over(w))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n").as("n_events"), col("errs").as("n_errors"),
        round(col("errs") / col("n").cast("double"), 6).as("error_rate"),
        when(col("errs") / col("n").cast("double") > 0.25, 1)
          .otherwise(0).cast("int").as("slo_breach"),
        round(col("cum_errs") / (lit(0.25) * col("cum_n")), 6)
          .as("budget_burn"))
      .orderBy(col("day"))
  }

  /** EXPONENTIALLY-WEIGHTED MOVING AVERAGE of daily purchase revenue
    * (α = 0.2, adjusted form: weights (1−α)^(t−i) normalized over the
    * observed prefix — pandas `ewm(adjust=True)` semantics). EMA's
    * recursive definition is inherently sequential; the distributed
    * form used here expands it to an explicit weighted sum over the
    * BOUNDED day grid (the fixture's 30-day month; the calendar, not
    * the corpus, bounds the t×i pairing — the ev_gap_fill day-spine
    * discipline). Weight×value products round to fixed decimal grids
    * before their exact sums, so the cross-engine result is
    * bit-identical; the final divide rounds 6.
    *
    * Scale shape: one map-side-combining daily aggregate (the only
    * corpus-sized stage), then a day-grid×day-grid triangular join —
    * ≤ 366² pairs per year regardless of data volume. */
  val evValueEma: GQuery = GQuery(
    "ev_value_ema",
    """WITH d AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |    CAST(round(sum(CAST(round(value, 2) AS DECIMAL(12,2))), 2)
      |      AS DOUBLE) AS x
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |j AS (
      |  SELECT t.day AS tday,
      |    sum(CAST(round(power(0.8, date_diff('day', i.day, t.day)) * i.x,
      |      8) AS DECIMAL(24,8))) AS num,
      |    sum(CAST(round(power(0.8, date_diff('day', i.day, t.day)), 12)
      |      AS DECIMAL(24,12))) AS den
      |  FROM d t JOIN d i ON i.day <= t.day
      |  GROUP BY 1)
      |SELECT strftime(j.tday, '%Y-%m-%d') AS day, d.x AS daily_value,
      |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS ema
      |FROM j JOIN d ON d.day = j.tday
      |ORDER BY day""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(round(sum(round(col("value"), 2).cast("decimal(12,2)")), 2)
        .cast("double").as("x"))
    val t = d.select(col("day").as("tday"))
    val j = t.join(d, col("day") <= col("tday"))
      .selectExpr("tday",
        "CAST(round(power(0.8, datediff(tday, day)) * x, 8)" +
          " AS DECIMAL(24,8)) AS num_p",
        "CAST(round(power(0.8, datediff(tday, day)), 12)" +
          " AS DECIMAL(24,12)) AS den_p")
      .groupBy(col("tday"))
      .agg(sum(col("num_p")).as("num"), sum(col("den_p")).as("den"))
    j.join(d, col("day") === col("tday"))
      .select(date_format(col("tday"), "yyyy-MM-dd").as("day"),
        col("x").as("daily_value"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("ema"))
      .orderBy(col("day"))
  }

  /** DAY-OF-WEEK SEASONALITY PROFILE — the first decomposition step
    * of any traffic series: per-ISO-weekday event counts, share of
    * the week, and the seasonality index vs a uniform week (share·7;
    * 1.0 = no weekly pattern). Day names come from an explicit CASE,
    * not locale-dependent formatting.
    *
    * Scale shape: a 7-group map-side-combining count and a 7-row
    * window — nothing else. */
  val evSeasonalityDow: GQuery = GQuery(
    "ev_seasonality_dow",
    """WITH d AS (
      |  SELECT isodow(CAST(ts AS DATE)) AS dow, count(*) AS n
      |  FROM events GROUP BY 1),
      |t AS (SELECT dow, n, CAST(sum(n) OVER () AS BIGINT) AS tot FROM d)
      |SELECT CAST(dow AS INT) AS dow,
      |  CASE dow WHEN 1 THEN 'Mon' WHEN 2 THEN 'Tue' WHEN 3 THEN 'Wed'
      |    WHEN 4 THEN 'Thu' WHEN 5 THEN 'Fri' WHEN 6 THEN 'Sat'
      |    ELSE 'Sun' END AS day_name,
      |  CAST(n AS BIGINT) AS n_events,
      |  round(n / CAST(tot AS DOUBLE), 6) AS share,
      |  round(7 * n / CAST(tot AS DOUBLE), 6) AS seasonality_index
      |FROM t ORDER BY dow""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .groupBy((weekday(to_date(col("ts"))) + 1).as("dow"))
      .agg(count(lit(1)).as("n"))
    d.withColumn("tot", sum(col("n")).over(Window.partitionBy()))
      .selectExpr("CAST(dow AS INT) AS dow",
        """CASE dow WHEN 1 THEN 'Mon' WHEN 2 THEN 'Tue' WHEN 3 THEN 'Wed'
          |WHEN 4 THEN 'Thu' WHEN 5 THEN 'Fri' WHEN 6 THEN 'Sat'
          |ELSE 'Sun' END AS day_name""".stripMargin,
        "CAST(n AS BIGINT) AS n_events",
        "round(n / CAST(tot AS DOUBLE), 6) AS share",
        "round(7 * n / CAST(tot AS DOUBLE), 6) AS seasonality_index")
      .orderBy(col("dow"))
  }

  /** SEASONAL-NAIVE FORECAST BACKTEST — the baseline every real
    * forecasting system must beat: predict each day's per-type count
    * with the value 7 observed days earlier (lag-7 row offset over
    * the per-type day series), then score MAE and MAPE over the days
    * that have a prediction. Per-row APE rounds to the DECIMAL(18,8)
    * grid before the exact sum, so the mean is order-free
    * cross-engine; MAE is integer arithmetic until one final divide.
    *
    * Scale shape: one map-side-combining (type, day) count, then a
    * lag window over the BOUNDED per-type day grid and a |types|-row
    * rollup. */
  val evForecastBaseline: GQuery = GQuery(
    "ev_forecast_baseline",
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT event_type, day, n,
      |    lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS fc
      |  FROM d)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |  round(CAST(sum(abs(n - fc)) AS DOUBLE) / count(*), 4) AS mae,
      |  round(CAST(sum(CAST(round(abs(n - fc) / CAST(n AS DOUBLE), 8)
      |    AS DECIMAL(18,8))) AS DOUBLE) / count(*), 6) AS mape
      |FROM l WHERE fc IS NOT NULL
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val l = d.withColumn("fc", lag(col("n"), 7).over(
      Window.partitionBy(col("event_type")).orderBy(col("day"))))
      .filter(col("fc").isNotNull)
    l.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        round(sum(abs(col("n") - col("fc"))).cast("double")
          / count(lit(1)), 4).as("mae"),
        round(sum(round(abs(col("n") - col("fc"))
            / col("n").cast("double"), 8).cast("decimal(18,8)"))
          .cast("double") / count(lit(1)), 6).as("mape"))
      .orderBy(col("event_type"))
  }

  /** ACTIVITY STREAKS — longest consecutive-day run per user (the
    * habit/engagement metric every consumer product tracks), the
    * classic gaps-and-islands computation: distinct active days per
    * user, row_number along the day axis, and `day − rn` as the
    * island anchor (consecutive days share it); per-island length +
    * start, then a per-user min-struct argmax picks the LONGEST
    * streak (earliest start on ties — window-free, the agg_mode
    * discipline). Top-20 users by (streak desc, user_id).
    *
    * Scale shape: the raw stream collapses to DISTINCT (user, day)
    * first (map-side combine), so the windows run on the bounded
    * per-user day grid, partitioned by user — never an unpartitioned
    * window; the top-20 is TakeOrderedAndProject. */
  val evActivityStreaks: GQuery = GQuery(
    "ev_activity_streaks",
    """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      |           FROM events),
      |r AS (SELECT user_id, day,
      |        day - CAST(row_number() OVER (PARTITION BY user_id
      |                ORDER BY day) AS INT) AS anchor
      |      FROM d),
      |i AS (SELECT user_id, anchor, count(*) AS len, min(day) AS start
      |      FROM r GROUP BY user_id, anchor),
      |b AS (SELECT user_id, len, start,
      |        row_number() OVER (PARTITION BY user_id
      |          ORDER BY len DESC, start) AS rk
      |      FROM i),
      |u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_streaks,
      |        CAST(sum(len) AS BIGINT) AS active_days
      |      FROM i GROUP BY user_id)
      |SELECT u.user_id, u.active_days, u.n_streaks,
      |  CAST(b.len AS BIGINT) AS longest_streak,
      |  strftime(b.start, '%Y-%m-%d') AS streak_start
      |FROM u JOIN b ON b.user_id = u.user_id AND b.rk = 1
      |ORDER BY longest_streak DESC, u.user_id
      |LIMIT 20""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val r = d.withColumn("anchor",
      expr("date_sub(day, row_number() OVER " +
        "(PARTITION BY user_id ORDER BY day))"))
    val i = r.groupBy(col("user_id"), col("anchor"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("start"))
    i.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_streaks"),
        sum(col("len")).cast("long").as("active_days"),
        min(struct((-col("len")).as("nl"), col("start").as("st")))
          .as("best"))
      .select(col("user_id"), col("active_days"), col("n_streaks"),
        (-col("best.nl")).cast("long").as("longest_streak"),
        date_format(col("best.st"), "yyyy-MM-dd").as("streak_start"))
      .orderBy(col("longest_streak").desc, col("user_id"))
      .limit(20)
  }

  /** INTER-ARRIVAL cadence per event feed — the gap distribution
    * between consecutive events of each type (the capacity-planning /
    * feed-health readout next to dq_freshness's point-in-time lag):
    * gap count, mean, exact p50/p75, and max, all from integer-µs
    * lag differences. p50/p75 are DYADIC fractions over integer µs,
    * so the percentile interpolation is bit-exact cross-engine in any
    * algebraic form (the agg_percentiles argument); the mean divides
    * two exact integers once and is emitted in SECONDS rounded 6 —
    * rounding the µs mean directly would push value·10⁶ past 2⁵³,
    * where DuckDB's multiply-round-divide round() loses ulps.
    *
    * Scale shape: one shuffle to the event_type grain (5 keys — each
    * partition's window state is a single previous-timestamp row);
    * output is |types| rows. A hot single type serializes through one
    * task in ANY engine for this per-feed total order; the per-user
    * cadence variant would shard it. */
  val evInterarrival: GQuery = GQuery(
    "ev_interarrival",
    """WITH o AS (
      |  SELECT event_type,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY event_type
      |      ORDER BY ts, event_id) AS gap
      |  FROM events)
      |SELECT event_type, CAST(count(gap) AS BIGINT) AS n_gaps,
      |  round(CAST(sum(gap) AS DOUBLE) / count(gap) / 1000000.0, 6)
      |    AS mean_gap_s,
      |  quantile_cont(gap, 0.50) AS p50_gap_us,
      |  quantile_cont(gap, 0.75) AS p75_gap_us,
      |  CAST(max(gap) AS BIGINT) AS max_gap_us
      |FROM o WHERE gap IS NOT NULL
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val o = Tables.events(s, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap").isNotNull)
    o.groupBy(col("event_type"))
      .agg(count(col("gap")).as("n_gaps"),
        round(sum(col("gap")).cast("double") / count(col("gap"))
          / lit(1000000.0), 6).as("mean_gap_s"),
        expr("percentile(gap, 0.50d)").as("p50_gap_us"),
        expr("percentile(gap, 0.75d)").as("p75_gap_us"),
        max(col("gap")).cast("long").as("max_gap_us"))
      .orderBy(col("event_type"))
  }

  /** GROWTH-ACCOUNTING matrix — the canonical DAU decomposition
    * (new / retained / resurrected / churned) that refines
    * [[evNewVsReturning]]'s returning bucket: on each active day a
    * user is `new` (first day ever), `retained` (also active the
    * previous calendar day) or `resurrected` (last active more than
    * one day ago); `churned(d)` is the count active on d−1 but not d,
    * computed EXACTLY as dau(d−1) − retained(d) — no second pass over
    * users, and correct even when a calendar day has zero activity
    * (the day join is on the literal d−1 date, not a row lag).
    *
    * Scale shape: one distinct to the (user, day) grain (map-side
    * combine), one per-user window for first-seen + previous active
    * day (single user-keyed shuffle), then a bounded per-day rollup
    * and a day-keyed self-join on the tiny daily frame. */
  val evGrowthAccounting: GQuery = GQuery(
    "ev_growth_accounting",
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |fs AS (
      |  SELECT user_id, d,
      |    min(d) OVER (PARTITION BY user_id) AS first_d,
      |    lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
      |  FROM ud),
      |cls AS (
      |  SELECT d,
      |    CASE WHEN d = first_d THEN 'new'
      |         WHEN prev_d = d - INTERVAL 1 DAY THEN 'retained'
      |         ELSE 'resurrected' END AS cls
      |  FROM fs),
      |daily AS (
      |  SELECT d, CAST(count(*) AS BIGINT) AS dau,
      |    CAST(count(*) FILTER (WHERE cls = 'new') AS BIGINT) AS new_users,
      |    CAST(count(*) FILTER (WHERE cls = 'retained') AS BIGINT)
      |      AS retained,
      |    CAST(count(*) FILTER (WHERE cls = 'resurrected') AS BIGINT)
      |      AS resurrected
      |  FROM cls GROUP BY d)
      |SELECT strftime(a.d, '%Y-%m-%d') AS day,
      |  a.dau, a.new_users, a.retained, a.resurrected,
      |  coalesce(b.dau, 0) - a.retained AS churned
      |FROM daily a
      |LEFT JOIN daily b ON b.d = a.d - INTERVAL 1 DAY
      |ORDER BY day""".stripMargin) { (s, dir) =>
    val ud = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val uw = Window.partitionBy(col("user_id"))
    val ow = uw.orderBy(col("d"))
    val cls = ud
      .withColumn("first_d", min(col("d")).over(uw))
      .withColumn("prev_d", lag(col("d"), 1).over(ow))
      .select(col("d"),
        when(col("d") === col("first_d"), "new")
          .when(col("prev_d") === date_sub(col("d"), 1), "retained")
          .otherwise("resurrected").as("cls"))
    val daily = cls.groupBy(col("d"))
      .agg(count(lit(1)).as("dau"),
        count(when(col("cls") === "new", 1)).as("new_users"),
        count(when(col("cls") === "retained", 1)).as("retained"),
        count(when(col("cls") === "resurrected", 1)).as("resurrected"))
    val prev = daily.select(date_add(col("d"), 1).as("d"),
      col("dau").as("pdau"))
    daily.join(prev, Seq("d"), "left")
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("dau"), col("new_users"), col("retained"), col("resurrected"),
        (coalesce(col("pdau"), lit(0L)) - col("retained")).as("churned"))
      .orderBy(col("day"))
  }

  /** STICKINESS (DAU/MAU) — the engagement ratio every product review
    * opens with, at the calendar-month grain: per month, the exact
    * MAU, the average DAU over the month's ACTIVE days, and their
    * ratio (1.0 = every monthly user active every day). Calendar
    * months, not trailing windows — the board-deck convention
    * ([[evRollingActiveUsers]] owns the trailing-window variant).
    *
    * Scale shape: one distinct to the (user, day) grain (map-side
    * combine), then two independent bounded rollups off it — daily
    * counts re-aggregated to months, and a per-month exact distinct
    * (second map-side-combining pass over (month, user)) — joined on
    * the tiny month grid. No windows, no broadcast. */
  val evStickiness: GQuery = GQuery(
    "ev_stickiness",
    """WITH ud AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
      |dau AS (SELECT d, count(*) AS dau FROM ud GROUP BY d),
      |mau AS (
      |  SELECT date_trunc('month', d) AS mth,
      |    CAST(count(DISTINCT user_id) AS BIGINT) AS mau
      |  FROM ud GROUP BY 1),
      |davg AS (
      |  SELECT date_trunc('month', d) AS mth,
      |    CAST(sum(dau) AS BIGINT) AS sum_dau,
      |    CAST(count(*) AS BIGINT) AS n_days
      |  FROM dau GROUP BY 1)
      |SELECT strftime(m.mth, '%Y-%m') AS month, a.n_days, a.sum_dau,
      |  m.mau,
      |  round(CAST(a.sum_dau AS DOUBLE) / a.n_days, 6) AS avg_dau,
      |  round(CAST(a.sum_dau AS DOUBLE) / a.n_days / m.mau, 6)
      |    AS stickiness
      |FROM mau m JOIN davg a USING (mth)
      |ORDER BY month""".stripMargin) { (s, dir) =>
    val ud = Tables.events(s, dir)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
    val dau = ud.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    val mau = ud.groupBy(trunc(col("d"), "month").as("mth"))
      .agg(countDistinct(col("user_id")).as("mau"))
    val davg = dau.groupBy(trunc(col("d"), "month").as("mth"))
      .agg(sum(col("dau")).cast("long").as("sum_dau"),
        count(lit(1)).as("n_days"))
    mau.join(davg, Seq("mth"))
      .select(date_format(col("mth"), "yyyy-MM").as("month"),
        col("n_days"), col("sum_dau"), col("mau"),
        round(col("sum_dau").cast("double") / col("n_days"), 6)
          .as("avg_dau"),
        round(col("sum_dau").cast("double") / col("n_days") / col("mau"),
          6).as("stickiness"))
      .orderBy(col("month"))
  }

  /** ACTIVITY HEATMAP — the day-of-week × hour-of-day traffic matrix
    * (0 = Monday; the ops-calendar readout behind capacity planning
    * and maintenance-window choice): per cell, event volume, exact
    * distinct actives, and the cell's share of its day's events
    * (`day_share` sums to 1 per row-of-the-heatmap, making weekday
    * shapes comparable regardless of volume).
    *
    * Scale shape: one map-side-combining count to the bounded ≤ 168
    * cell grid + one exact distinct over (cell, user) — both collapse
    * before the shuffle; the day-total join runs on ≤ 7 rows. */
  val evHourlyHeatmap: GQuery = GQuery(
    "ev_hourly_heatmap",
    """WITH b AS (
      |  SELECT CAST(isodow(ts) - 1 AS INT) AS dow,
      |    CAST(hour(ts) AS INT) AS hr, user_id
      |  FROM events),
      |cell AS (
      |  SELECT dow, hr, CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |  FROM b GROUP BY dow, hr),
      |tot AS (SELECT dow, sum(n_events) AS dtot FROM cell GROUP BY dow)
      |SELECT c.dow, c.hr, c.n_events, c.n_users,
      |  round(CAST(c.n_events AS DOUBLE) / t.dtot, 6) AS day_share
      |FROM cell c JOIN tot t USING (dow)
      |ORDER BY dow, hr""".stripMargin) { (s, dir) =>
    val b = Tables.events(s, dir)
      .select(weekday(col("ts")).as("dow"), hour(col("ts")).as("hr"),
        col("user_id"))
    val cell = b.groupBy(col("dow"), col("hr"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
    val tot = cell.groupBy(col("dow")).agg(sum(col("n_events")).as("dtot"))
    cell.join(tot, Seq("dow"))
      .select(col("dow"), col("hr"), col("n_events"), col("n_users"),
        round(col("n_events").cast("double") / col("dtot"), 6)
          .as("day_share"))
      .orderBy(col("dow"), col("hr"))
  }

  /** HOLT double-exponential (linear-trend) forecast backtest over the
    * per-type daily event-count series — the level+trend upgrade of
    * `ev_forecast_baseline`'s seasonal-naive: l_t = α·y_t +
    * (1−α)(l_{t−1}+b_{t−1}), b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1} with
    * α = 0.5, β = 0.25 (exact binary fractions), initialized l₂ = y₂,
    * b₂ = y₂−y₁; the one-step-ahead forecast ŷ_t = l_{t−1}+b_{t−1}
    * scores a MAE backtest over t ≥ 3, and the head of the output is
    * tomorrow's forecast l_T+b_T. The coupled level/trend recursion has
    * no window spelling (unlike EMA's closed-form weight expansion, the
    * round-12 leave-behind note) — the distributed spelling is a
    * per-group FOLD over the calendar-bounded day series:
    * `aggregate(sort_array(collect_list(...)))` carries O(1) state
    * (t, l, b, Σ|err|, y₁) through ≤366 ordered steps per group, and
    * the DuckDB oracle replays the identical double recursion as a
    * recursive CTE — same IEEE ops in the same order, so the rounded
    * outputs are bit-identical.
    *
    * Scale shape: one map-side-combining daily aggregate is the only
    * corpus-sized stage; the fold runs on |event_type| rows of ≤366
    * elements each — the calendar, not the corpus, bounds the
    * sequential work, and the fold itself is whole-stage-codegen'd
    * (HOF, not a UDF). */
  val evHoltForecast: GQuery = GQuery(
    "ev_holt_forecast",
    """WITH RECURSIVE d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS DOUBLE) AS y
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, y,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      |  FROM d),
      |h AS (
      |  SELECT s2.event_type, 2 AS t, s2.y AS l, s2.y - s1.y AS b,
      |    CAST(0 AS DOUBLE) AS esum
      |  FROM s s1 JOIN s s2
      |    ON s1.event_type = s2.event_type AND s1.rn = 1 AND s2.rn = 2
      |  UNION ALL
      |  SELECT h.event_type, h.t + 1,
      |    0.5 * s.y + 0.5 * (h.l + h.b),
      |    0.25 * ((0.5 * s.y + 0.5 * (h.l + h.b)) - h.l) + 0.75 * h.b,
      |    h.esum + abs(s.y - (h.l + h.b))
      |  FROM h JOIN s ON s.event_type = h.event_type AND s.rn = h.t + 1),
      |f AS (SELECT event_type, max(t) AS tmax FROM h GROUP BY 1)
      |SELECT h.event_type, CAST(h.t AS BIGINT) AS n_days,
      |  round(h.l, 6) AS level, round(h.b, 6) AS trend,
      |  round(h.l + h.b, 6) AS forecast_next,
      |  round(h.esum / (h.t - 2), 6) AS mae
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
          |    'b', CAST(0 AS DOUBLE), 'esum', CAST(0 AS DOUBLE),
          |    'y1', CAST(0 AS DOUBLE)),
          |  (acc, e) -> CASE
          |    WHEN acc.t = 0 THEN named_struct('t', 1, 'l', e.y,
          |      'b', CAST(0 AS DOUBLE), 'esum', CAST(0 AS DOUBLE),
          |      'y1', e.y)
          |    WHEN acc.t = 1 THEN named_struct('t', 2, 'l', e.y,
          |      'b', e.y - acc.y1, 'esum', CAST(0 AS DOUBLE),
          |      'y1', acc.y1)
          |    ELSE named_struct('t', acc.t + 1,
          |      'l', 0.5D * e.y + 0.5D * (acc.l + acc.b),
          |      'b', 0.25D * ((0.5D * e.y + 0.5D * (acc.l + acc.b))
          |             - acc.l) + 0.75D * acc.b,
          |      'esum', acc.esum + abs(e.y - (acc.l + acc.b)),
          |      'y1', acc.y1)
          |  END)""".stripMargin))
    st.select(col("event_type"),
        col("st.t").cast("bigint").as("n_days"),
        round(col("st.l"), 6).as("level"),
        round(col("st.b"), 6).as("trend"),
        round(col("st.l") + col("st.b"), 6).as("forecast_next"),
        round(col("st.esum") / (col("st.t") - 2), 6).as("mae"))
      .orderBy(col("event_type"))
  }

  /** A/B-TEST readout — the two-proportion z-test every experimentation
    * platform computes: users are assigned to control/treatment by the
    * fleet's portable salted 48-bit hash (`Sampling.portableHash`, salt
    * `ab:` — the SAME deterministic bucketing the sample_* family uses,
    * so assignment is reproducible on any engine and any run; never
    * seed-based `rand()`), conversion = "made at least one big-ticket
    * purchase (value > 100)", and the single-row report carries both
    * arms' counts/rates, the absolute lift, and the pooled-variance
    * z-score z = (p_t−p_c) / √(p̂(1−p̂)(1/n_c+1/n_t)). Every double op
    * appears in the same order in both engines, so the rounded z is
    * bit-identical.
    *
    * Scale shape: variant is a per-row projection (no assignment
    * table, no join); one map-side-combining per-user aggregate is the
    * only corpus-sized stage; the z-test itself runs on a 1-row frame.
    * At 100 TB the per-user grain shuffles once on user_id — the
    * minimum any per-user conversion metric can do. */
  val evAbZtest: GQuery = GQuery(
    "ev_ab_ztest",
    s"""WITH u AS (
       |  SELECT user_id,
       |    ${DedupQueries.duckHash("concat('ab:', CAST(user_id AS VARCHAR))")} % 2 AS v,
       |    max(CASE WHEN event_type = 'purchase' AND value > 100
       |             THEN 1 ELSE 0 END) AS conv
       |  FROM events GROUP BY 1, 2),
       |a AS (
       |  SELECT
       |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_control,
       |    CAST(sum(CASE WHEN v = 0 THEN conv ELSE 0 END) AS BIGINT)
       |      AS conv_control,
       |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_treatment,
       |    CAST(sum(CASE WHEN v = 1 THEN conv ELSE 0 END) AS BIGINT)
       |      AS conv_treatment
       |  FROM u)
       |SELECT n_control, conv_control,
       |  round(CAST(conv_control AS DOUBLE) / n_control, 6)
       |    AS rate_control,
       |  n_treatment, conv_treatment,
       |  round(CAST(conv_treatment AS DOUBLE) / n_treatment, 6)
       |    AS rate_treatment,
       |  round(CAST(conv_treatment AS DOUBLE) / n_treatment
       |    - CAST(conv_control AS DOUBLE) / n_control, 6) AS lift,
       |  round((CAST(conv_treatment AS DOUBLE) / n_treatment
       |      - CAST(conv_control AS DOUBLE) / n_control)
       |    / sqrt(
       |      (CAST(conv_control + conv_treatment AS DOUBLE)
       |        / (n_control + n_treatment))
       |      * (1 - CAST(conv_control + conv_treatment AS DOUBLE)
       |        / (n_control + n_treatment))
       |      * (CAST(1 AS DOUBLE) / n_control
       |        + CAST(1 AS DOUBLE) / n_treatment)), 6) AS z_score
       |FROM a""".stripMargin) { (s, dir) =>
    val u = Tables.events(s, dir)
      .withColumn("v",
        graft.api.Sampling.portableHash(col("user_id"), "ab:") % 2)
      .groupBy(col("user_id"), col("v"))
      .agg(max(when(col("event_type") === "purchase"
        && col("value") > 100, 1).otherwise(0)).as("conv"))
    val a = u.agg(
      sum(when(col("v") === 0, 1).otherwise(0)).cast("bigint")
        .as("n_control"),
      sum(when(col("v") === 0, col("conv")).otherwise(0)).cast("bigint")
        .as("conv_control"),
      sum(when(col("v") === 1, 1).otherwise(0)).cast("bigint")
        .as("n_treatment"),
      sum(when(col("v") === 1, col("conv")).otherwise(0)).cast("bigint")
        .as("conv_treatment"))
    val pc = col("conv_control").cast("double") / col("n_control")
    val pt = col("conv_treatment").cast("double") / col("n_treatment")
    val pooled = (col("conv_control") + col("conv_treatment"))
      .cast("double") / (col("n_control") + col("n_treatment"))
    a.select(col("n_control"), col("conv_control"),
      round(pc, 6).as("rate_control"),
      col("n_treatment"), col("conv_treatment"),
      round(pt, 6).as("rate_treatment"),
      round(pt - pc, 6).as("lift"),
      round((pt - pc) / sqrt(pooled * (lit(1) - pooled)
        * (lit(1.0) / col("n_control") + lit(1.0) / col("n_treatment"))),
        6).as("z_score"))
  }

  /** KAPLAN–MEIER time-to-conversion curve — survival analysis with
    * CENSORING, the discipline `ev_conversion_lag`'s plain mean cannot
    * provide: duration = whole hours from a user's first click to
    * their first subsequent purchase, administratively censored at the
    * 48-hour horizon (lag ≥ 48 h, or no purchase at all, counts as
    * "still unconverted when observation ended", not as a datapoint at
    * its eventual lag — the estimand is P(not yet converted by t)
    * using only what a 48-hour-old experiment could know). Standard
    * K-M: at each death-time t, S ∗= (1 − d_t/n_t) with n_t = users
    * whose duration ≥ t (censored users count while at risk); output
    * is one row per conversion hour (d_t > 0) with the at-risk /
    * converted / censored counts and S(t).
    *
    * The running product is inherently sequential — like
    * `ev_holt_forecast` it folds (`aggregate` HOF) over the
    * horizon-bounded duration grid (≤49 rows), here with an
    * array-building accumulator so every PREFIX product is emitted,
    * while the DuckDB oracle replays the identical double products as
    * a recursive CTE — same IEEE ops in the same order.
    *
    * Scale shape: two map-side-combining per-user aggregates (first
    * click, first qualifying purchase) are the only corpus-sized
    * stages; the K-M table itself lives on the ≤49-row hour grid
    * (bounded-grid window precedent, WindowQueries frame rows), and
    * the fold is codegen'd. */
  val evSurvivalKm: GQuery = GQuery(
    "ev_survival_km",
    """WITH RECURSIVE fc AS (
      |  SELECT user_id, min(ts) AS c FROM events
      |  WHERE event_type = 'click' GROUP BY 1),
      |fp AS (
      |  SELECT f.user_id, min(e.ts) AS p
      |  FROM fc f JOIN events e ON e.user_id = f.user_id
      |    AND e.event_type = 'purchase' AND e.ts > f.c
      |  GROUP BY 1),
      |u AS (
      |  SELECT CASE WHEN p IS NOT NULL
      |              AND date_diff('second', c, p) // 3600 < 48
      |         THEN CAST(date_diff('second', c, p) // 3600 AS INT)
      |         ELSE 48 END AS t,
      |         CASE WHEN p IS NOT NULL
      |              AND date_diff('second', c, p) // 3600 < 48
      |         THEN 1 ELSE 0 END AS ev
      |  FROM fc LEFT JOIN fp USING (user_id)),
      |tt AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d,
      |         CAST(count(*) AS BIGINT) AS a,
      |         CAST(sum(1 - ev) AS BIGINT) AS c FROM u GROUP BY t),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM u),
      |r AS (SELECT t, d, c,
      |        CAST(n - COALESCE(sum(a) OVER (ORDER BY t
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |          AS BIGINT) AS nr,
      |        row_number() OVER (ORDER BY t) AS rn
      |      FROM tt, tot),
      |km AS (
      |  SELECT t, rn, nr, d, c, 1 - CAST(d AS DOUBLE) / nr AS s
      |  FROM r WHERE rn = 1
      |  UNION ALL
      |  SELECT r.t, r.rn, r.nr, r.d, r.c,
      |    km.s * (1 - CAST(r.d AS DOUBLE) / r.nr)
      |  FROM km JOIN r ON r.rn = km.rn + 1)
      |SELECT CAST(t AS INT) AS t_hours, nr AS n_risk, d AS n_converted,
      |  c AS n_censored, round(s, 6) AS survival
      |FROM km WHERE d > 0 ORDER BY t_hours""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val fc = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("ts")).as("c"))
    val fp = fc.join(ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts")), Seq("user_id"))
      .filter(col("ts") > col("c"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p"))
    val lag = expr("(unix_timestamp(p) - unix_timestamp(c)) DIV 3600")
    val dead = col("p").isNotNull && lag < 48
    val u = fc.join(fp, Seq("user_id"), "left")
      .select(when(dead, lag.cast("int")).otherwise(lit(48)).as("t"),
        when(dead, 1).otherwise(0).as("ev"))
    val tt = u.groupBy(col("t"))
      .agg(sum(col("ev")).cast("bigint").as("d"),
        count(lit(1)).cast("bigint").as("a"),
        sum(lit(1) - col("ev")).cast("bigint").as("c"))
    val tot = u.agg(count(lit(1)).cast("bigint").as("n"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = tt.crossJoin(broadcast(tot))
      .withColumn("nr",
        (col("n") - coalesce(sum(col("a")).over(w), lit(0)))
          .cast("bigint"))
    r.select(struct(col("t"), col("nr"), col("d"), col("c")).as("e"))
      .agg(sort_array(collect_list(col("e"))).as("ser"))
      .withColumn("out", expr(
        """aggregate(ser,
          |  named_struct('s', CAST(1 AS DOUBLE),
          |    'out', CAST(array() AS
          |      ARRAY<STRUCT<t:INT, nr:BIGINT, d:BIGINT, c:BIGINT,
          |                   s:DOUBLE>>)),
          |  (acc, e) -> named_struct(
          |    's', acc.s * (1 - CAST(e.d AS DOUBLE) / e.nr),
          |    'out', concat(acc.out, array(named_struct(
          |      't', e.t, 'nr', e.nr, 'd', e.d, 'c', e.c,
          |      's', acc.s * (1 - CAST(e.d AS DOUBLE) / e.nr))))),
          |  acc -> acc.out)""".stripMargin))
      .select(explode(col("out")).as("e"))
      .filter(col("e.d") > 0)
      .select(col("e.t").as("t_hours"), col("e.nr").as("n_risk"),
        col("e.d").as("n_converted"), col("e.c").as("n_censored"),
        round(col("e.s"), 6).as("survival"))
      .orderBy(col("t_hours"))
  }

  /** WELCH t-TEST on a CONTINUOUS metric — the experimentation
    * readout `ev_ab_ztest`'s proportion test cannot give: per-user
    * purchase revenue (the metric most A/B decisions actually ride
    * on) compared between the same hash-assigned arms, with
    * unpooled variances (Welch, the default of every modern experiment
    * platform — arms need not share a variance). Per-user revenue
    * lands on the DECIMAL(18,2) grid and both moment sums (Σr, Σr²)
    * are DECIMAL-exact, so the sample variances
    * s² = (Σr² − (Σr)²/n)/(n−1) and
    * t = (m_t − m_c)/√(s_c²/n_c + s_t²/n_t) are each ONE double
    * expression spelled identically in both engines.
    *
    * Scale shape: variant is a per-row projection; one map-side
    * combining per-user aggregate, one 1-row conditional rollup —
    * same minimal shape as ev_ab_ztest. */
  val evAbWelch: GQuery = GQuery(
    "ev_ab_welch",
    s"""WITH u AS (
       |  SELECT user_id,
       |    ${DedupQueries.duckHash(
              "concat('ab:', CAST(user_id AS VARCHAR))")} % 2 AS v,
       |    CAST(sum(CASE WHEN event_type = 'purchase'
       |      THEN CAST(round(value, 2) AS DECIMAL(18,2))
       |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS r
       |  FROM events GROUP BY 1, 2),
       |a AS (
       |  SELECT
       |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_c,
       |    CAST(sum(CASE WHEN v = 0 THEN r END) AS DECIMAL(28,2)) AS s_c,
       |    CAST(sum(CASE WHEN v = 0 THEN r * r END) AS DECIMAL(38,4))
       |      AS q_c,
       |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_t,
       |    CAST(sum(CASE WHEN v = 1 THEN r END) AS DECIMAL(28,2)) AS s_t,
       |    CAST(sum(CASE WHEN v = 1 THEN r * r END) AS DECIMAL(38,4))
       |      AS q_t
       |  FROM u)
       |SELECT n_c AS n_control,
       |  round(CAST(s_c AS DOUBLE) / n_c, 4) AS mean_control,
       |  round((CAST(q_c AS DOUBLE)
       |    - CAST(s_c AS DOUBLE) * s_c / n_c) / (n_c - 1), 4)
       |    AS var_control,
       |  n_t AS n_treatment,
       |  round(CAST(s_t AS DOUBLE) / n_t, 4) AS mean_treatment,
       |  round((CAST(q_t AS DOUBLE)
       |    - CAST(s_t AS DOUBLE) * s_t / n_t) / (n_t - 1), 4)
       |    AS var_treatment,
       |  round((CAST(s_t AS DOUBLE) / n_t - CAST(s_c AS DOUBLE) / n_c)
       |    / sqrt(
       |      ((CAST(q_c AS DOUBLE)
       |         - CAST(s_c AS DOUBLE) * s_c / n_c) / (n_c - 1)) / n_c
       |      + ((CAST(q_t AS DOUBLE)
       |         - CAST(s_t AS DOUBLE) * s_t / n_t) / (n_t - 1)) / n_t),
       |    6) AS t_stat
       |FROM a""".stripMargin) { (s, dir) =>
    val u = Tables.events(s, dir)
      .withColumn("v",
        graft.api.Sampling.portableHash(col("user_id"), "ab:") % 2)
      .groupBy(col("user_id"), col("v"))
      .agg(sum(when(col("event_type") === "purchase",
          round(col("value"), 2).cast("decimal(18,2)"))
        .otherwise(lit(0).cast("decimal(18,2)")))
        .cast("decimal(18,2)").as("r"))
    val a = u.agg(
      sum(when(col("v") === 0, 1).otherwise(0)).cast("bigint").as("n_c"),
      sum(when(col("v") === 0, col("r"))).cast("decimal(28,2)").as("s_c"),
      sum(when(col("v") === 0, col("r") * col("r")))
        .cast("decimal(38,4)").as("q_c"),
      sum(when(col("v") === 1, 1).otherwise(0)).cast("bigint").as("n_t"),
      sum(when(col("v") === 1, col("r"))).cast("decimal(28,2)").as("s_t"),
      sum(when(col("v") === 1, col("r") * col("r")))
        .cast("decimal(38,4)").as("q_t"))
    def mean(sc: String, n: String) =
      col(sc).cast("double") / col(n)
    def varr(q: String, sc: String, n: String) =
      (col(q).cast("double")
        - col(sc).cast("double") * col(sc) / col(n)) / (col(n) - 1)
    a.select(col("n_c").as("n_control"),
      round(mean("s_c", "n_c"), 4).as("mean_control"),
      round(varr("q_c", "s_c", "n_c"), 4).as("var_control"),
      col("n_t").as("n_treatment"),
      round(mean("s_t", "n_t"), 4).as("mean_treatment"),
      round(varr("q_t", "s_t", "n_t"), 4).as("var_treatment"),
      round((mean("s_t", "n_t") - mean("s_c", "n_c"))
        / sqrt(varr("q_c", "s_c", "n_c") / col("n_c")
          + varr("q_t", "s_t", "n_t") / col("n_t")), 6).as("t_stat"))
  }

  /** CUPED variance reduction — the third leg of the experimentation
    * family (z-test → Welch → CUPED): each user's POST-period revenue
    * is adjusted by their PRE-period revenue via Y′ = Y − θ(X − X̄)
    * with θ = cov(X,Y)/var(X) pooled across arms; the launch boundary
    * is DATA-DRIVEN (min event date + 15 days — in production it is
    * the experiment's start date, a config constant) and rides a
    * 1-row broadcast (the ev_rfm anchor pattern). θ uses
    * the Microsoft/Netflix-standard trick that shrinks metric
    * variance using only pre-experiment data, so the same experiment
    * reaches significance with a fraction of the users. Report: θ,
    * per-arm n / raw and adjusted means / raw and adjusted variances,
    * and the achieved variance-reduction ratio 1 − var(Y′)/var(Y).
    *
    * Portability: X and Y live on the DECIMAL(18,2) grid; all pooled
    * moments (Σx, Σy, Σxy, Σx²) are DECIMAL-exact, so θ and X̄ are
    * single double expressions; per-user adjusted values quantize to
    * DECIMAL(18,6) BEFORE their exact per-arm sums (the fleet's
    * grid-before-sum discipline), so per-arm moments of Y′ are exact
    * again.
    *
    * Scale shape: one map-side-combining per-user aggregate, a 1-row
    * pooled-moments broadcast back onto the user grain (never a
    * shuffle onto one task), one per-arm rollup. */
  val evUpliftCuped: GQuery = GQuery(
    "ev_uplift_cuped",
    s"""WITH b AS (
       |  SELECT min(CAST(ts AS DATE)) + 15 AS launch FROM events),
       |u AS (
       |  SELECT user_id,
       |    ${DedupQueries.duckHash(
              "concat('ab:', CAST(user_id AS VARCHAR))")} % 2 AS v,
       |    CAST(sum(CASE WHEN event_type = 'purchase'
       |          AND CAST(ts AS DATE) < launch
       |      THEN CAST(round(value, 2) AS DECIMAL(18,2))
       |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS x,
       |    CAST(sum(CASE WHEN event_type = 'purchase'
       |          AND CAST(ts AS DATE) >= launch
       |      THEN CAST(round(value, 2) AS DECIMAL(18,2))
       |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS y
       |  FROM events, b GROUP BY 1, 2),
       |p AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS DECIMAL(28,2)) AS sx,
       |    CAST(sum(y) AS DECIMAL(28,2)) AS sy,
       |    CAST(sum(x * y) AS DECIMAL(38,4)) AS sxy,
       |    CAST(sum(x * x) AS DECIMAL(38,4)) AS sxx
       |  FROM u),
       |t AS (
       |  SELECT n,
       |    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
       |      / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
       |      AS theta,
       |    CAST(sx AS DOUBLE) / n AS xbar
       |  FROM p),
       |adj AS (
       |  SELECT v,
       |    y,
       |    CAST(round(CAST(y AS DOUBLE)
       |      - theta * (CAST(x AS DOUBLE) - xbar), 6) AS DECIMAL(18,6))
       |      AS ya,
       |    theta
       |  FROM u, t),
       |arm AS (
       |  SELECT v, CAST(count(*) AS BIGINT) AS n_users,
       |    CAST(sum(y) AS DECIMAL(28,2)) AS sy,
       |    CAST(sum(y * y) AS DECIMAL(38,4)) AS syy,
       |    CAST(sum(ya) AS DECIMAL(32,6)) AS sa,
       |    CAST(sum(CAST(ya AS DECIMAL(28,6)) * ya) AS DECIMAL(38,12))
       |      AS saa,
       |    max(theta) AS theta
       |  FROM adj GROUP BY v)
       |SELECT CAST(v AS INT) AS variant, n_users,
       |  round(theta, 6) AS theta,
       |  round(CAST(sy AS DOUBLE) / n_users, 4) AS mean_raw,
       |  round(CAST(sa AS DOUBLE) / n_users, 4) AS mean_adj,
       |  round((CAST(syy AS DOUBLE)
       |    - CAST(sy AS DOUBLE) * sy / n_users) / (n_users - 1), 4)
       |    AS var_raw,
       |  round((CAST(saa AS DOUBLE)
       |    - CAST(sa AS DOUBLE) * sa / n_users) / (n_users - 1), 4)
       |    AS var_adj,
       |  round(1 - ((CAST(saa AS DOUBLE)
       |      - CAST(sa AS DOUBLE) * sa / n_users) / (n_users - 1))
       |    / ((CAST(syy AS DOUBLE)
       |      - CAST(sy AS DOUBLE) * sy / n_users) / (n_users - 1)), 6)
       |    AS var_reduction
       |FROM arm
       |ORDER BY variant""".stripMargin) { (s, dir) =>
    val dec2 = "decimal(18,2)"
    val b = Tables.events(s, dir)
      .agg(date_add(min(to_date(col("ts"))), 15).as("launch"))
    val u = Tables.events(s, dir)
      .crossJoin(broadcast(b))
      .withColumn("v",
        graft.api.Sampling.portableHash(col("user_id"), "ab:") % 2)
      .groupBy(col("user_id"), col("v"))
      .agg(
        sum(when(col("event_type") === "purchase"
            && to_date(col("ts")) < col("launch"),
          round(col("value"), 2).cast(dec2))
          .otherwise(lit(0).cast(dec2))).cast(dec2).as("x"),
        sum(when(col("event_type") === "purchase"
            && to_date(col("ts")) >= col("launch"),
          round(col("value"), 2).cast(dec2))
          .otherwise(lit(0).cast(dec2))).cast(dec2).as("y"))
    val p = u.agg(count(lit(1)).cast("bigint").as("n"),
      sum(col("x")).cast("decimal(28,2)").as("sx"),
      sum(col("y")).cast("decimal(28,2)").as("sy"),
      sum(col("x") * col("y")).cast("decimal(38,4)").as("sxy"),
      sum(col("x") * col("x")).cast("decimal(38,4)").as("sxx"))
    val t = p.select(col("n"),
      ((col("sxy").cast("double") - col("sx").cast("double") * col("sy")
          / col("n"))
        / (col("sxx").cast("double") - col("sx").cast("double")
          * col("sx") / col("n"))).as("theta"),
      (col("sx").cast("double") / col("n")).as("xbar"))
    val adj = u.crossJoin(broadcast(t))
      .select(col("v"), col("y"),
        round(col("y").cast("double")
          - col("theta") * (col("x").cast("double") - col("xbar")), 6)
          .cast("decimal(18,6)").as("ya"),
        col("theta"))
    val arm = adj.groupBy(col("v"))
      .agg(count(lit(1)).cast("bigint").as("n_users"),
        sum(col("y")).cast("decimal(28,2)").as("sy"),
        sum(col("y") * col("y")).cast("decimal(38,4)").as("syy"),
        sum(col("ya")).cast("decimal(32,6)").as("sa"),
        sum(col("ya") * col("ya")).cast("decimal(38,12)").as("saa"),
        max(col("theta")).as("theta"))
    def vr(q: String, sc: String) =
      ((col(q).cast("double")
        - col(sc).cast("double") * col(sc) / col("n_users"))
        / (col("n_users") - 1))
    arm.select(col("v").cast("int").as("variant"), col("n_users"),
        round(col("theta"), 6).as("theta"),
        round(col("sy").cast("double") / col("n_users"), 4)
          .as("mean_raw"),
        round(col("sa").cast("double") / col("n_users"), 4)
          .as("mean_adj"),
        round(vr("syy", "sy"), 4).as("var_raw"),
        round(vr("saa", "sa"), 4).as("var_adj"),
        round(lit(1) - vr("saa", "sa") / vr("syy", "sy"), 6)
          .as("var_reduction"))
      .orderBy(col("variant"))
  }

  /** POWER ANALYSIS — the "how many users does this experiment need"
    * readout that closes the experimentation family (assign → z-test /
    * Welch → CUPED → power): from the same per-user revenue moments as
    * `ev_ab_welch`, report the observed effect Δ = m_t − m_c, the
    * per-arm users needed to detect that Δ at α = 0.05 / 80% power
    * (n = ⌈(z_α/2 + z_β)²(s_c² + s_t²)/Δ²⌉, the two-sample normal
    * approximation with unpooled variances), and the minimum
    * detectable effect at the CURRENT arm sizes
    * (MDE = (z_α/2+z_β)·√(s_c²/n_c + s_t²/n_t)). z constants are the
    * same literals in both engines (1.96, 0.8416); every moment is
    * DECIMAL-exact, so each statistic is one double expression.
    *
    * Scale shape: identical to ev_ab_welch — per-row arm projection,
    * one per-user map-side-combining aggregate, a 1-row readout. */
  val evPowerAnalysis: GQuery = GQuery(
    "ev_power_analysis",
    s"""WITH u AS (
       |  SELECT user_id,
       |    ${DedupQueries.duckHash(
              "concat('ab:', CAST(user_id AS VARCHAR))")} % 2 AS v,
       |    CAST(sum(CASE WHEN event_type = 'purchase'
       |      THEN CAST(round(value, 2) AS DECIMAL(18,2))
       |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS r
       |  FROM events GROUP BY 1, 2),
       |a AS (
       |  SELECT
       |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_c,
       |    CAST(sum(CASE WHEN v = 0 THEN r END) AS DECIMAL(28,2)) AS s_c,
       |    CAST(sum(CASE WHEN v = 0 THEN r * r END) AS DECIMAL(38,4))
       |      AS q_c,
       |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_t,
       |    CAST(sum(CASE WHEN v = 1 THEN r END) AS DECIMAL(28,2)) AS s_t,
       |    CAST(sum(CASE WHEN v = 1 THEN r * r END) AS DECIMAL(38,4))
       |      AS q_t
       |  FROM u),
       |m AS (
       |  SELECT n_c, n_t,
       |    CAST(s_t AS DOUBLE) / n_t - CAST(s_c AS DOUBLE) / n_c
       |      AS delta,
       |    (CAST(q_c AS DOUBLE)
       |      - CAST(s_c AS DOUBLE) * s_c / n_c) / (n_c - 1) AS vc,
       |    (CAST(q_t AS DOUBLE)
       |      - CAST(s_t AS DOUBLE) * s_t / n_t) / (n_t - 1) AS vt
       |  FROM a)
       |SELECT n_c AS n_control, n_t AS n_treatment,
       |  round(delta, 4) AS delta_observed,
       |  round(sqrt(vc), 4) AS sd_control,
       |  round(sqrt(vt), 4) AS sd_treatment,
       |  CASE WHEN delta <> 0 THEN CAST(ceil(
       |    (CAST(1.96 AS DOUBLE) + CAST(0.8416 AS DOUBLE))
       |    * (CAST(1.96 AS DOUBLE) + CAST(0.8416 AS DOUBLE))
       |    * (vc + vt)
       |      / (delta * delta)) AS BIGINT) END AS n_needed_per_arm,
       |  round((CAST(1.96 AS DOUBLE) + CAST(0.8416 AS DOUBLE))
       |    * sqrt(vc / n_c + vt / n_t), 4)
       |    AS mde_current
       |FROM m""".stripMargin) { (s, dir) =>
    val u = Tables.events(s, dir)
      .withColumn("v",
        graft.api.Sampling.portableHash(col("user_id"), "ab:") % 2)
      .groupBy(col("user_id"), col("v"))
      .agg(sum(when(col("event_type") === "purchase",
          round(col("value"), 2).cast("decimal(18,2)"))
        .otherwise(lit(0).cast("decimal(18,2)")))
        .cast("decimal(18,2)").as("r"))
    val a = u.agg(
      sum(when(col("v") === 0, 1).otherwise(0)).cast("bigint").as("n_c"),
      sum(when(col("v") === 0, col("r"))).cast("decimal(28,2)").as("s_c"),
      sum(when(col("v") === 0, col("r") * col("r")))
        .cast("decimal(38,4)").as("q_c"),
      sum(when(col("v") === 1, 1).otherwise(0)).cast("bigint").as("n_t"),
      sum(when(col("v") === 1, col("r"))).cast("decimal(28,2)").as("s_t"),
      sum(when(col("v") === 1, col("r") * col("r")))
        .cast("decimal(38,4)").as("q_t"))
    val m = a.select(col("n_c"), col("n_t"),
      (col("s_t").cast("double") / col("n_t")
        - col("s_c").cast("double") / col("n_c")).as("delta"),
      ((col("q_c").cast("double")
        - col("s_c").cast("double") * col("s_c") / col("n_c"))
        / (col("n_c") - 1)).as("vc"),
      ((col("q_t").cast("double")
        - col("s_t").cast("double") * col("s_t") / col("n_t"))
        / (col("n_t") - 1)).as("vt"))
    val z = lit(1.96) + lit(0.8416)
    m.select(col("n_c").as("n_control"), col("n_t").as("n_treatment"),
      round(col("delta"), 4).as("delta_observed"),
      round(sqrt(col("vc")), 4).as("sd_control"),
      round(sqrt(col("vt")), 4).as("sd_treatment"),
      when(col("delta") =!= 0,
        ceil(z * z * (col("vc") + col("vt"))
          / (col("delta") * col("delta"))).cast("bigint"))
        .as("n_needed_per_arm"),
      round(z * sqrt(col("vc") / col("n_c") + col("vt") / col("n_t")),
        4).as("mde_current"))
  }

  /** BEHAVIORAL-DIVERSITY feature: per-user Shannon entropy over the
    * user's own event-type distribution — H = −Σ p·ln p, the
    * feature-engineering staple that separates single-behavior users
    * (H = 0: pure viewers, bots hammering one endpoint) from diverse
    * ones (H → ln 5), used as a churn-model input and a bot signal.
    * Top-20 by (entropy desc, user_id). Portability: the per-type
    * shares round to the 6-place grid and their logs to the 8-place
    * grid BEFORE the products and the sum (the text_surprisal log
    * discipline), so H is decimal-exact cross-engine.
    *
    * Scale shape: one (user, type) map-side-combining count (state
    * ≤ 5 rows per user), one per-user rollup, TakeOrderedAndProject
    * top-20 — no windows, no joins. */
  val evUserEntropy: GQuery = GQuery(
    "ev_user_entropy",
    """WITH c AS (
      |  SELECT user_id, event_type, count(*) AS k
      |  FROM events GROUP BY 1, 2),
      |n AS (SELECT user_id, CAST(sum(k) AS BIGINT) AS n,
      |        CAST(count(*) AS INT) AS n_types
      |      FROM c GROUP BY user_id),
      |t AS (
      |  SELECT c.user_id,
      |    CAST(round(CAST(c.k AS DOUBLE) / n.n, 6) AS DECIMAL(12,6))
      |      AS p
      |  FROM c JOIN n ON c.user_id = n.user_id),
      |h AS (
      |  SELECT user_id,
      |    sum(CASE WHEN p > 0 THEN -p * CAST(round(
      |      ln(CAST(p AS DOUBLE)), 8) AS DECIMAL(14,8))
      |      ELSE CAST(0 AS DECIMAL(26,14)) END) AS ent
      |  FROM t GROUP BY user_id)
      |SELECT h.user_id, n.n AS n_events, n.n_types,
      |  round(CAST(h.ent AS DOUBLE), 6) AS entropy
      |FROM h JOIN n ON h.user_id = n.user_id
      |ORDER BY entropy DESC, h.user_id
      |LIMIT 20""".stripMargin) { (s, dir) =>
    val c = Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("k"))
    val n = c.groupBy(col("user_id"))
      .agg(sum(col("k")).cast("bigint").as("n"),
        count(lit(1)).cast("int").as("n_types"))
    val t = c.join(n, Seq("user_id"))
      .select(col("user_id"), col("n"), col("n_types"),
        round(col("k").cast("double") / col("n"), 6)
          .cast("decimal(12,6)").as("p"))
    t.groupBy(col("user_id"), col("n"), col("n_types"))
      .agg(sum(when(col("p") > 0,
          -col("p") * round(log(col("p").cast("double")), 8)
            .cast("decimal(14,8)"))
        .otherwise(lit(0).cast("decimal(26,14)"))).as("ent"))
      .select(col("user_id"), col("n").as("n_events"), col("n_types"),
        round(col("ent").cast("double"), 6).as("entropy"))
      .orderBy(col("entropy").desc, col("user_id"))
      .limit(20)
  }

  /** SAMPLE-RATIO-MISMATCH check — the standard pre-readout guardrail
    * every experimentation platform runs before trusting a test
    * (Fabijan et al.'s "SRM" diagnostic): if the realized per-arm user
    * counts deviate from the designed 50/50 split by more than chance,
    * the assignment or logging pipeline is broken and the readout is
    * invalid. Arms come from the SAME portable salted hash as
    * ev_ab_ztest / ev_ab_welch (salt `ab:`), so this row audits
    * exactly the assignment those readouts use. The statistic is the
    * 1-dof chi-square against equal expected counts, χ² =
    * Σ(obs−exp)²/exp with exp = n/2, flagged at the conventional
    * p < 0.001 boundary (χ² > 10.828, the literal both engines
    * compare against). Every double op appears in the same order in
    * both engines → bit-identical rounded χ².
    *
    * Scale shape: variant is a per-row projection (no assignment
    * table); one map-side-combining distinct-user aggregate is the
    * only corpus-sized stage; the χ² runs on a 2-row frame. */
  val evAbSrmCheck: GQuery = GQuery(
    "ev_ab_srm_check",
    s"""WITH u AS (
       |  SELECT DISTINCT user_id,
       |    ${DedupQueries.duckHash("concat('ab:', CAST(user_id AS VARCHAR))")} % 2 AS v
       |  FROM events),
       |a AS (
       |  SELECT
       |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_control,
       |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_treatment
       |  FROM u)
       |SELECT n_control, n_treatment,
       |  round(CAST(n_control AS DOUBLE) / (n_control + n_treatment), 6)
       |    AS control_share,
       |  round(
       |    (n_control - CAST(n_control + n_treatment AS DOUBLE) / 2)
       |      * (n_control - CAST(n_control + n_treatment AS DOUBLE) / 2)
       |      / (CAST(n_control + n_treatment AS DOUBLE) / 2)
       |    + (n_treatment - CAST(n_control + n_treatment AS DOUBLE) / 2)
       |      * (n_treatment - CAST(n_control + n_treatment AS DOUBLE) / 2)
       |      / (CAST(n_control + n_treatment AS DOUBLE) / 2), 6)
       |    AS chi_square,
       |  CAST(
       |    (n_control - CAST(n_control + n_treatment AS DOUBLE) / 2)
       |      * (n_control - CAST(n_control + n_treatment AS DOUBLE) / 2)
       |      / (CAST(n_control + n_treatment AS DOUBLE) / 2)
       |    + (n_treatment - CAST(n_control + n_treatment AS DOUBLE) / 2)
       |      * (n_treatment - CAST(n_control + n_treatment AS DOUBLE) / 2)
       |      / (CAST(n_control + n_treatment AS DOUBLE) / 2)
       |    > 10.828 AS BOOLEAN) AS srm_detected
       |FROM a""".stripMargin) { (s, dir) =>
    val u = Tables.events(s, dir)
      .select(col("user_id"),
        (graft.api.Sampling.portableHash(col("user_id"), "ab:") % 2)
          .as("v"))
      .distinct()
    val a = u.agg(
      sum(when(col("v") === 0, 1).otherwise(0)).cast("bigint")
        .as("n_control"),
      sum(when(col("v") === 1, 1).otherwise(0)).cast("bigint")
        .as("n_treatment"))
    val n = (col("n_control") + col("n_treatment")).cast("double")
    val e = n / 2
    val chi = (col("n_control") - e) * (col("n_control") - e) / e +
      (col("n_treatment") - e) * (col("n_treatment") - e) / e
    a.select(col("n_control"), col("n_treatment"),
      round(col("n_control").cast("double") /
        (col("n_control") + col("n_treatment")), 6).as("control_share"),
      round(chi, 6).as("chi_square"),
      (chi > 10.828).cast("boolean").as("srm_detected"))
  }

  /** RATIO-METRIC readout with DELTA-METHOD variance — the missing
    * member of the experimentation family (z-test: proportions;
    * Welch/CUPED: user-level means; this: RATIO metrics like
    * revenue-per-event whose denominator also varies per user, where
    * naive per-user averaging is biased and the delta method is the
    * industry-standard fix, e.g. Deng et al.'s metric framework).
    * Per user: x = purchase revenue (DECIMAL(18,2) grid), y = event
    * count. Per arm: R = Σx/Σy, and the delta-method squared standard
    * error se² = (var(x) − 2R·cov(x,y) + R²·var(y)) / (n·ȳ²); the
    * readout is both arms' R, their difference, and z = ΔR /
    * √(se²_c + se²_t). Arms come from the SAME `ab:` portable hash as
    * the rest of the family. All moments (Σx, Σx², Σxy integer-scaled
    * DECIMAL; Σy, Σy² BIGINT) are exact, and every double expression
    * is textually identical in both engines → bit-identical rounded
    * outputs.
    *
    * Scale shape: one map-side-combining per-user aggregate is the
    * only corpus-sized stage; moments collapse to one row; the delta
    * algebra runs on that row. */
  val evAbRatioDelta: GQuery = {
    def r(x: String) = s"CAST(s_$x AS DOUBLE) / y_$x"
    def varx(x: String) =
      s"(CAST(q_$x AS DOUBLE) - CAST(s_$x AS DOUBLE) * s_$x / n_$x) / (n_$x - 1)"
    def vary(x: String) =
      s"(CAST(yy_$x AS DOUBLE) - CAST(y_$x AS DOUBLE) * y_$x / n_$x) / (n_$x - 1)"
    def cov(x: String) =
      s"(CAST(xy_$x AS DOUBLE) - CAST(s_$x AS DOUBLE) * y_$x / n_$x) / (n_$x - 1)"
    def se2(x: String) =
      s"""((${varx(x)}) - 2 * (${r(x)}) * (${cov(x)})
         | + (${r(x)}) * (${r(x)}) * (${vary(x)}))
         | / (n_$x * (CAST(y_$x AS DOUBLE) / n_$x)
         |   * (CAST(y_$x AS DOUBLE) / n_$x))""".stripMargin
    GQuery("ev_ab_ratio_delta",
      s"""WITH u AS (
         |  SELECT user_id,
         |    ${DedupQueries.duckHash(
                "concat('ab:', CAST(user_id AS VARCHAR))")} % 2 AS v,
         |    CAST(sum(CASE WHEN event_type = 'purchase'
         |      THEN CAST(round(value, 2) AS DECIMAL(18,2))
         |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS x,
         |    CAST(count(*) AS BIGINT) AS y
         |  FROM events GROUP BY 1, 2),
         |a AS (
         |  SELECT
         |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_c,
         |    CAST(sum(CASE WHEN v = 0 THEN x END) AS DECIMAL(28,2)) AS s_c,
         |    CAST(sum(CASE WHEN v = 0 THEN x * x END) AS DECIMAL(38,4))
         |      AS q_c,
         |    CAST(sum(CASE WHEN v = 0 THEN y END) AS BIGINT) AS y_c,
         |    CAST(sum(CASE WHEN v = 0 THEN y * y END) AS BIGINT) AS yy_c,
         |    CAST(sum(CASE WHEN v = 0 THEN x * y END) AS DECIMAL(38,2))
         |      AS xy_c,
         |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_t,
         |    CAST(sum(CASE WHEN v = 1 THEN x END) AS DECIMAL(28,2)) AS s_t,
         |    CAST(sum(CASE WHEN v = 1 THEN x * x END) AS DECIMAL(38,4))
         |      AS q_t,
         |    CAST(sum(CASE WHEN v = 1 THEN y END) AS BIGINT) AS y_t,
         |    CAST(sum(CASE WHEN v = 1 THEN y * y END) AS BIGINT) AS yy_t,
         |    CAST(sum(CASE WHEN v = 1 THEN x * y END) AS DECIMAL(38,2))
         |      AS xy_t
         |  FROM u)
         |SELECT n_c AS n_control,
         |  round(${r("c")}, 6) AS ratio_control,
         |  round(sqrt(${se2("c")}), 6) AS se_control,
         |  n_t AS n_treatment,
         |  round(${r("t")}, 6) AS ratio_treatment,
         |  round(sqrt(${se2("t")}), 6) AS se_treatment,
         |  round((${r("t")}) - (${r("c")}), 6) AS diff,
         |  round(((${r("t")}) - (${r("c")}))
         |    / sqrt((${se2("c")}) + (${se2("t")})), 6) AS z_score
         |FROM a""".stripMargin) { (s, dir) =>
      val u = Tables.events(s, dir)
        .withColumn("v",
          graft.api.Sampling.portableHash(col("user_id"), "ab:") % 2)
        .groupBy(col("user_id"), col("v"))
        .agg(sum(when(col("event_type") === "purchase",
            round(col("value"), 2).cast("decimal(18,2)"))
          .otherwise(lit(0).cast("decimal(18,2)")))
          .cast("decimal(18,2)").as("x"),
          count(lit(1)).cast("bigint").as("y"))
      def arm(v: Int, sfx: String) = Seq(
        sum(when(col("v") === v, 1).otherwise(0)).cast("bigint")
          .as(s"n_$sfx"),
        sum(when(col("v") === v, col("x"))).cast("decimal(28,2)")
          .as(s"s_$sfx"),
        sum(when(col("v") === v, col("x") * col("x")))
          .cast("decimal(38,4)").as(s"q_$sfx"),
        sum(when(col("v") === v, col("y"))).cast("bigint")
          .as(s"y_$sfx"),
        sum(when(col("v") === v, col("y") * col("y"))).cast("bigint")
          .as(s"yy_$sfx"),
        sum(when(col("v") === v, col("x") * col("y")))
          .cast("decimal(38,2)").as(s"xy_$sfx"))
      val cols = arm(0, "c") ++ arm(1, "t")
      val a = u.agg(cols.head, cols.tail: _*)
      def rr(x: String) = col(s"s_$x").cast("double") / col(s"y_$x")
      def varx(x: String) = (col(s"q_$x").cast("double")
        - col(s"s_$x").cast("double") * col(s"s_$x") / col(s"n_$x")) /
        (col(s"n_$x") - 1)
      def vary(x: String) = (col(s"yy_$x").cast("double")
        - col(s"y_$x").cast("double") * col(s"y_$x") / col(s"n_$x")) /
        (col(s"n_$x") - 1)
      def cv(x: String) = (col(s"xy_$x").cast("double")
        - col(s"s_$x").cast("double") * col(s"y_$x") / col(s"n_$x")) /
        (col(s"n_$x") - 1)
      def se2(x: String) =
        (varx(x) - lit(2) * rr(x) * cv(x) + rr(x) * rr(x) * vary(x)) /
          (col(s"n_$x") * (col(s"y_$x").cast("double") / col(s"n_$x")) *
            (col(s"y_$x").cast("double") / col(s"n_$x")))
      a.select(col("n_c").as("n_control"),
        round(rr("c"), 6).as("ratio_control"),
        round(sqrt(se2("c")), 6).as("se_control"),
        col("n_t").as("n_treatment"),
        round(rr("t"), 6).as("ratio_treatment"),
        round(sqrt(se2("t")), 6).as("se_treatment"),
        round(rr("t") - rr("c"), 6).as("diff"),
        round((rr("t") - rr("c")) / sqrt(se2("c") + se2("t")), 6)
          .as("z_score"))
    }
  }

  /** BOT-DETECTION heuristics — the composite per-user screen an
    * event pipeline runs before metrics or training-data export,
    * combining the three classic signals (each individually covered
    * by ev_user_entropy / ev_interarrival — this row fuses them into
    * the per-user verdict table): volume (events, active days),
    * behavioral narrowness (top event type's share), and TIMING
    * REGULARITY — the coefficient of variation of inter-event gaps
    * (humans are bursty, cron jobs are metronomes; low CV = machine).
    * Gap moments ride exact integer µs / DECIMAL(38,0) sums, so the
    * CV is a deterministic single expression; the flag is
    * ((cv < 0.3 OR top_share ≥ 0.95) AND n ≥ 30) on rounded grid
    * values — identical literals both engines.
    *
    * Scale shape: one user-keyed window pass for gaps (single
    * shuffle), two map-side-combining per-user aggregates, one
    * user-keyed join — every stage keyed on user_id; no global state. */
  val evBotScore: GQuery = GQuery(
    "ev_bot_score",
    """WITH g AS (
      |  SELECT user_id,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS gap
      |  FROM events),
      |gm AS (
      |  SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps,
      |    CAST(sum(CAST(gap AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sg,
      |    CAST(sum(CAST(gap AS DECIMAL(19,0))
      |             * CAST(gap AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS qg
      |  FROM g WHERE gap IS NOT NULL GROUP BY 1),
      |tc AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
      |       FROM events GROUP BY 1, 2),
      |t AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
      |        CAST(max(c) AS BIGINT) AS top_cnt
      |      FROM tc GROUP BY 1),
      |d AS (SELECT user_id,
      |        CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
      |      FROM events GROUP BY 1),
      |f AS (
      |  SELECT t.user_id AS user_id, n_events, n_days,
      |    round(CAST(n_events AS DOUBLE) / n_days, 6) AS events_per_day,
      |    round(CAST(top_cnt AS DOUBLE) / n_events, 6) AS top_share,
      |    coalesce(gm.n_gaps, 0) AS n_gaps,
      |    CASE WHEN gm.n_gaps >= 2 THEN round(
      |      sqrt((CAST(qg AS DOUBLE) - CAST(sg AS DOUBLE) * sg / n_gaps)
      |           / (n_gaps - 1))
      |      / (CAST(sg AS DOUBLE) / n_gaps), 6) END AS cv_gap
      |  FROM t JOIN d ON t.user_id = d.user_id
      |  LEFT JOIN gm ON t.user_id = gm.user_id)
      |SELECT user_id, n_events, n_days, events_per_day, top_share,
      |  n_gaps, cv_gap,
      |  CAST(((cv_gap IS NOT NULL AND cv_gap < 0.3)
      |        OR top_share >= 0.95)
      |       AND n_events >= 30 AS BOOLEAN) AS bot_flag
      |FROM f
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val wg = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val g = ev.withColumn("us", unix_micros(col("ts")))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(wg))
      .filter(col("gap").isNotNull)
      .select(col("user_id"), col("gap").cast("decimal(19,0)").as("gd"))
    val gm = g.groupBy(col("user_id"))
      .agg(count(col("gd")).cast("bigint").as("n_gaps_raw"),
        sum(col("gd")).cast("decimal(38,0)").as("sg"),
        sum(col("gd") * col("gd")).cast("decimal(38,0)").as("qg"))
    val tc = ev.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).cast("bigint").as("c"))
    val t = tc.groupBy(col("user_id"))
      .agg(sum(col("c")).cast("bigint").as("n_events"),
        max(col("c")).cast("bigint").as("top_cnt"))
    val d = ev.groupBy(col("user_id"))
      .agg(countDistinct(to_date(col("ts"))).cast("bigint").as("n_days"))
    val cv = when(col("n_gaps_raw") >= 2, round(
      sqrt((col("qg").cast("double")
          - col("sg").cast("double") * col("sg") / col("n_gaps_raw"))
        / (col("n_gaps_raw") - 1))
        / (col("sg").cast("double") / col("n_gaps_raw")), 6))
    val f = t.join(d, Seq("user_id")).join(gm, Seq("user_id"), "left")
      .select(col("user_id"), col("n_events"), col("n_days"),
        round(col("n_events").cast("double") / col("n_days"), 6)
          .as("events_per_day"),
        round(col("top_cnt").cast("double") / col("n_events"), 6)
          .as("top_share"),
        coalesce(col("n_gaps_raw"), lit(0L)).as("n_gaps"),
        cv.as("cv_gap"))
    f.select(col("user_id"), col("n_events"), col("n_days"),
        col("events_per_day"), col("top_share"), col("n_gaps"),
        col("cv_gap"),
        (((col("cv_gap").isNotNull && col("cv_gap") < 0.3)
          || col("top_share") >= 0.95)
          && col("n_events") >= 30).cast("boolean").as("bot_flag"))
      .orderBy(col("user_id"))
  }

  /** HOLT-WINTERS triple exponential smoothing — the seasonal rung
    * above ev_holt_forecast's level+trend: additive 7-day seasonality
    * with α = 0.5, β = 0.25, γ = 0.5 (exact binary fractions), a
    * 14-day warmup window initializing l = mean(y₁..₇), b =
    * (mean(y₈..₁₄) − mean(y₁..₇))/7, sᵢ = yᵢ − l, then for t ≥ 15:
    * l_t = α(y_t − s_{t−7}) + (1−α)(l+b), b_t = β Δl + (1−β)b,
    * s_t = γ(y_t − l_t) + (1−γ)s_{t−7}, with a one-step-ahead MAE
    * backtest (ŷ = l + b + s_{t−7}). The coupled recursion has no
    * window spelling — the distributed form is the ev_holt_forecast
    * fold with the seasonal ring buffer carried as an ARRAY field in
    * the `aggregate` HOF state (updated in place via indexed
    * `transform`); the DuckDB oracle replays the identical recursion
    * as a recursive CTE carrying a LIST column. Daily counts are
    * integer-valued doubles, so the warmup means divide EXACT sums —
    * every IEEE op appears in the same order in both engines and the
    * rounded outputs are bit-identical.
    *
    * Scale shape: identical to ev_holt_forecast — one map-side-
    * combining daily aggregate is the only corpus-sized stage; the
    * fold carries O(1) state (7-slot ring + 4 scalars) through ≤366
    * calendar-bounded steps per event type, whole-stage-codegen'd. */
  val evHoltWinters: GQuery = GQuery(
    "ev_holt_winters",
    """WITH RECURSIVE d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS DOUBLE) AS y
      |  FROM events GROUP BY 1, 2),
      |s AS (
      |  SELECT event_type, y,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      |  FROM d),
      |m AS (
      |  SELECT event_type,
      |    sum(CASE WHEN rn <= 7 THEN y END) / 7 AS m1,
      |    sum(CASE WHEN rn BETWEEN 8 AND 14 THEN y END) / 7 AS m2
      |  FROM s GROUP BY 1),
      |s7 AS (SELECT event_type, list(y ORDER BY rn) AS ys
      |       FROM s WHERE rn <= 7 GROUP BY 1),
      |h AS (
      |  SELECT m.event_type, 14 AS t, m.m1 AS l, (m.m2 - m.m1) / 7 AS b,
      |    [s7.ys[i] - m.m1 for i in generate_series(1, 7)] AS sv,
      |    CAST(0 AS DOUBLE) AS esum
      |  FROM m JOIN s7 ON m.event_type = s7.event_type
      |  UNION ALL
      |  SELECT h.event_type, h.t + 1,
      |    0.5 * (s2.y - h.sv[(h.t % 7) + 1]) + 0.5 * (h.l + h.b),
      |    0.25 * ((0.5 * (s2.y - h.sv[(h.t % 7) + 1])
      |             + 0.5 * (h.l + h.b)) - h.l) + 0.75 * h.b,
      |    [CASE WHEN i = (h.t % 7) + 1
      |          THEN 0.5 * (s2.y - (0.5 * (s2.y - h.sv[(h.t % 7) + 1])
      |                             + 0.5 * (h.l + h.b))) + 0.5 * h.sv[i]
      |          ELSE h.sv[i] END for i in generate_series(1, 7)],
      |    h.esum + abs(s2.y - (h.l + h.b + h.sv[(h.t % 7) + 1]))
      |  FROM h JOIN s s2
      |    ON s2.event_type = h.event_type AND s2.rn = h.t + 1),
      |f AS (SELECT event_type, max(t) AS tmax FROM h GROUP BY 1)
      |SELECT h.event_type, CAST(h.t AS BIGINT) AS n_days,
      |  round(h.l, 6) AS level, round(h.b, 6) AS trend,
      |  round(h.sv[(h.t % 7) + 1], 6) AS season_next,
      |  round(h.l + h.b + h.sv[(h.t % 7) + 1], 6) AS forecast_next,
      |  round(h.esum / (h.t - 14), 6) AS mae
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
          |  named_struct('t', 0,
          |    'warm', CAST(array() AS ARRAY<DOUBLE>),
          |    'l', CAST(0 AS DOUBLE), 'b', CAST(0 AS DOUBLE),
          |    'sv', CAST(array() AS ARRAY<DOUBLE>),
          |    'esum', CAST(0 AS DOUBLE)),
          |  (acc, e) -> CASE
          |    WHEN acc.t < 13 THEN named_struct('t', acc.t + 1,
          |      'warm', concat(acc.warm, array(e.y)),
          |      'l', CAST(0 AS DOUBLE), 'b', CAST(0 AS DOUBLE),
          |      'sv', acc.sv, 'esum', CAST(0 AS DOUBLE))
          |    WHEN acc.t = 13 THEN named_struct('t', 14,
          |      'warm', CAST(array() AS ARRAY<DOUBLE>),
          |      'l', aggregate(slice(concat(acc.warm, array(e.y)), 1, 7),
          |             CAST(0 AS DOUBLE), (a, x) -> a + x) / 7,
          |      'b', (aggregate(slice(concat(acc.warm, array(e.y)), 8, 7),
          |              CAST(0 AS DOUBLE), (a, x) -> a + x) / 7
          |            - aggregate(slice(concat(acc.warm, array(e.y)), 1, 7),
          |                CAST(0 AS DOUBLE), (a, x) -> a + x) / 7) / 7,
          |      'sv', transform(slice(concat(acc.warm, array(e.y)), 1, 7),
          |              x -> x - aggregate(
          |                slice(concat(acc.warm, array(e.y)), 1, 7),
          |                CAST(0 AS DOUBLE), (a, x) -> a + x) / 7),
          |      'esum', CAST(0 AS DOUBLE))
          |    ELSE named_struct('t', acc.t + 1,
          |      'warm', acc.warm,
          |      'l', 0.5D * (e.y - element_at(acc.sv, acc.t % 7 + 1))
          |           + 0.5D * (acc.l + acc.b),
          |      'b', 0.25D * ((0.5D * (e.y
          |               - element_at(acc.sv, acc.t % 7 + 1))
          |             + 0.5D * (acc.l + acc.b)) - acc.l)
          |           + 0.75D * acc.b,
          |      'sv', transform(acc.sv, (v, i) ->
          |        CASE WHEN i = acc.t % 7
          |          THEN 0.5D * (e.y - (0.5D * (e.y
          |                 - element_at(acc.sv, acc.t % 7 + 1))
          |               + 0.5D * (acc.l + acc.b))) + 0.5D * v
          |          ELSE v END),
          |      'esum', acc.esum + abs(e.y - (acc.l + acc.b
          |        + element_at(acc.sv, acc.t % 7 + 1))))
          |  END)""".stripMargin))
    st.select(col("event_type"),
        col("st.t").cast("bigint").as("n_days"),
        round(col("st.l"), 6).as("level"),
        round(col("st.b"), 6).as("trend"),
        round(element_at(col("st.sv"),
          (col("st.t") % 7 + 1).cast("int")), 6).as("season_next"),
        round(col("st.l") + col("st.b")
          + element_at(col("st.sv"),
            (col("st.t") % 7 + 1).cast("int")), 6).as("forecast_next"),
        round(col("st.esum") / (col("st.t") - 14), 6).as("mae"))
      .orderBy(col("event_type"))
  }

  /** DIFFERENCE-IN-DIFFERENCES — the causal readout for a launch with
    * a pre-period: each user's purchase revenue splits at the launch
    * boundary (min event date + 15 days, the ev_uplift_cuped anchor)
    * into pre (x) and post (y); the effect estimate is the classic
    * 2×2 cell-mean contrast DiD = (ȳ_t − x̄_t) − (ȳ_c − x̄_c), and
    * because users are observed in BOTH periods the standard error is
    * the paired form — Welch over the per-user differences d = y − x:
    * SE = √(var_t(d)/n_t + var_c(d)/n_c). Where CUPED uses the
    * pre-period to SHRINK variance of a post-only metric, DiD uses it
    * to DIFFERENCE OUT user-level baselines — the right tool when
    * treatment correlates with baseline level. All moments (Σx, Σy,
    * Σd, Σd²) ride exact DECIMAL sums; every double expression is
    * textually identical in both engines.
    *
    * Scale shape: one map-side-combining per-user aggregate under a
    * 1-row launch-anchor broadcast (the CUPED plan), then a 1-row
    * contrast. */
  val evDidAnalysis: GQuery = GQuery(
    "ev_did_analysis",
    s"""WITH b AS (
       |  SELECT min(CAST(ts AS DATE)) + 15 AS launch FROM events),
       |u AS (
       |  SELECT user_id,
       |    ${DedupQueries.duckHash(
              "concat('ab:', CAST(user_id AS VARCHAR))")} % 2 AS v,
       |    CAST(sum(CASE WHEN event_type = 'purchase'
       |          AND CAST(ts AS DATE) < launch
       |      THEN CAST(round(value, 2) AS DECIMAL(18,2))
       |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS x,
       |    CAST(sum(CASE WHEN event_type = 'purchase'
       |          AND CAST(ts AS DATE) >= launch
       |      THEN CAST(round(value, 2) AS DECIMAL(18,2))
       |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS y
       |  FROM events, b GROUP BY 1, 2),
       |a AS (
       |  SELECT
       |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_c,
       |    CAST(sum(CASE WHEN v = 0 THEN x END) AS DECIMAL(28,2)) AS sx_c,
       |    CAST(sum(CASE WHEN v = 0 THEN y END) AS DECIMAL(28,2)) AS sy_c,
       |    CAST(sum(CASE WHEN v = 0 THEN y - x END) AS DECIMAL(28,2))
       |      AS sd_c,
       |    CAST(sum(CASE WHEN v = 0 THEN (y - x) * (y - x) END)
       |         AS DECIMAL(38,4)) AS qd_c,
       |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_t,
       |    CAST(sum(CASE WHEN v = 1 THEN x END) AS DECIMAL(28,2)) AS sx_t,
       |    CAST(sum(CASE WHEN v = 1 THEN y END) AS DECIMAL(28,2)) AS sy_t,
       |    CAST(sum(CASE WHEN v = 1 THEN y - x END) AS DECIMAL(28,2))
       |      AS sd_t,
       |    CAST(sum(CASE WHEN v = 1 THEN (y - x) * (y - x) END)
       |         AS DECIMAL(38,4)) AS qd_t
       |  FROM u)
       |SELECT n_c AS n_control, n_t AS n_treatment,
       |  round(CAST(sx_c AS DOUBLE) / n_c, 4) AS pre_control,
       |  round(CAST(sy_c AS DOUBLE) / n_c, 4) AS post_control,
       |  round(CAST(sx_t AS DOUBLE) / n_t, 4) AS pre_treatment,
       |  round(CAST(sy_t AS DOUBLE) / n_t, 4) AS post_treatment,
       |  round(CAST(sd_t AS DOUBLE) / n_t - CAST(sd_c AS DOUBLE) / n_c,
       |    6) AS did,
       |  round(sqrt(
       |    ((CAST(qd_t AS DOUBLE)
       |      - CAST(sd_t AS DOUBLE) * sd_t / n_t) / (n_t - 1)) / n_t
       |    + ((CAST(qd_c AS DOUBLE)
       |      - CAST(sd_c AS DOUBLE) * sd_c / n_c) / (n_c - 1)) / n_c),
       |    6) AS se,
       |  round((CAST(sd_t AS DOUBLE) / n_t - CAST(sd_c AS DOUBLE) / n_c)
       |    / sqrt(
       |      ((CAST(qd_t AS DOUBLE)
       |        - CAST(sd_t AS DOUBLE) * sd_t / n_t) / (n_t - 1)) / n_t
       |      + ((CAST(qd_c AS DOUBLE)
       |        - CAST(sd_c AS DOUBLE) * sd_c / n_c) / (n_c - 1)) / n_c),
       |    6) AS t_stat
       |FROM a""".stripMargin) { (s, dir) =>
    val launch = Tables.events(s, dir)
      .agg(date_add(min(to_date(col("ts"))), 15).as("launch"))
    val u = Tables.events(s, dir)
      .crossJoin(broadcast(launch))
      .withColumn("v",
        graft.api.Sampling.portableHash(col("user_id"), "ab:") % 2)
      .groupBy(col("user_id"), col("v"))
      .agg(
        sum(when(col("event_type") === "purchase"
            && to_date(col("ts")) < col("launch"),
          round(col("value"), 2).cast("decimal(18,2)"))
          .otherwise(lit(0).cast("decimal(18,2)")))
          .cast("decimal(18,2)").as("x"),
        sum(when(col("event_type") === "purchase"
            && to_date(col("ts")) >= col("launch"),
          round(col("value"), 2).cast("decimal(18,2)"))
          .otherwise(lit(0).cast("decimal(18,2)")))
          .cast("decimal(18,2)").as("y"))
    def arm(v: Int, sfx: String) = Seq(
      sum(when(col("v") === v, 1).otherwise(0)).cast("bigint")
        .as(s"n_$sfx"),
      sum(when(col("v") === v, col("x"))).cast("decimal(28,2)")
        .as(s"sx_$sfx"),
      sum(when(col("v") === v, col("y"))).cast("decimal(28,2)")
        .as(s"sy_$sfx"),
      sum(when(col("v") === v, col("y") - col("x")))
        .cast("decimal(28,2)").as(s"sd_$sfx"),
      sum(when(col("v") === v,
        (col("y") - col("x")) * (col("y") - col("x"))))
        .cast("decimal(38,4)").as(s"qd_$sfx"))
    val cols = arm(0, "c") ++ arm(1, "t")
    val a = u.agg(cols.head, cols.tail: _*)
    def mean(x: String, n: String) = col(x).cast("double") / col(n)
    def vard(q: String, sd: String, n: String) =
      (col(q).cast("double")
        - col(sd).cast("double") * col(sd) / col(n)) / (col(n) - 1)
    val did = mean("sd_t", "n_t") - mean("sd_c", "n_c")
    val se = sqrt(vard("qd_t", "sd_t", "n_t") / col("n_t")
      + vard("qd_c", "sd_c", "n_c") / col("n_c"))
    a.select(col("n_c").as("n_control"), col("n_t").as("n_treatment"),
      round(mean("sx_c", "n_c"), 4).as("pre_control"),
      round(mean("sy_c", "n_c"), 4).as("post_control"),
      round(mean("sx_t", "n_t"), 4).as("pre_treatment"),
      round(mean("sy_t", "n_t"), 4).as("post_treatment"),
      round(did, 6).as("did"),
      round(se, 6).as("se"),
      round(did / se, 6).as("t_stat"))
  }

  /** RETENTION HALF-LIFE — the exponential-decay fit every retention
    * curve gets turned into for planning: pooled day-o retention
    * rate(o) = |users active o days after their first day| / |users|
    * for o = 1..7, then OLS on ln(rate) ~ o (the linearized
    * exponential fit): slope λ, half-life = −ln 2 / λ, and the fit's
    * R². ln values round to the 8-place grid (the text_lang_divergence
    * ln discipline — engine ln implementations differ in the last
    * ulp) and ride DECIMAL(16,8) sums; x-moments over o = 1..7 are
    * the integer constants Σo = 28, Σo² = 140 — the agg_regression
    * algebra on a 7-point frame.
    *
    * Scale shape: one distinct to the (user, day) grain, one per-user
    * min, one bounded rollup to 7 rows; the fit runs on the 7-row
    * frame with a 1-row user-count scalar. */
  val evRetentionHalflife: GQuery = GQuery(
    "ev_retention_halflife",
    """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
      |           FROM events),
      |c AS (SELECT user_id, min(d) AS c0 FROM d GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM c),
      |r AS (
      |  SELECT CAST(date_diff('day', c.c0, d.d) AS INT) AS o,
      |    CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_active
      |  FROM d JOIN c ON d.user_id = c.user_id
      |  WHERE date_diff('day', c.c0, d.d) BETWEEN 1 AND 7
      |  GROUP BY 1),
      |ly AS (
      |  SELECT o,
      |    CAST(round(ln(CAST(n_active AS DOUBLE) / t.n_users), 8)
      |         AS DECIMAL(16,8)) AS l
      |  FROM r CROSS JOIN tot t),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(l) AS DECIMAL(24,8)) AS sy,
      |    CAST(sum(o * l) AS DECIMAL(24,8)) AS sxy,
      |    CAST(sum(CAST(o AS BIGINT)) AS BIGINT) AS sx,
      |    CAST(sum(CAST(o AS BIGINT) * o) AS BIGINT) AS sxx,
      |    CAST(sum(l * l) AS DECIMAL(38,16)) AS syy
      |  FROM ly)
      |SELECT t.n_users, m.n AS n_points,
      |  round((CAST(m.n AS DOUBLE) * m.sxy
      |         - CAST(m.sx AS DOUBLE) * m.sy)
      |    / (CAST(m.n AS DOUBLE) * m.sxx
      |       - CAST(m.sx AS DOUBLE) * m.sx), 6) AS lambda,
      |  round(-CAST(0.6931471805599453 AS DOUBLE)
      |    / ((CAST(m.n AS DOUBLE) * m.sxy
      |        - CAST(m.sx AS DOUBLE) * m.sy)
      |       / (CAST(m.n AS DOUBLE) * m.sxx
      |          - CAST(m.sx AS DOUBLE) * m.sx)), 6) AS halflife_days,
      |  round((CAST(m.n AS DOUBLE) * m.sxy
      |         - CAST(m.sx AS DOUBLE) * m.sy)
      |    * (CAST(m.n AS DOUBLE) * m.sxy
      |       - CAST(m.sx AS DOUBLE) * m.sy)
      |    / ((CAST(m.n AS DOUBLE) * m.sxx
      |        - CAST(m.sx AS DOUBLE) * m.sx)
      |       * (CAST(m.n AS DOUBLE) * m.syy
      |          - CAST(m.sy AS DOUBLE) * m.sy)), 6) AS r2
      |FROM m CROSS JOIN tot t""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val c = d.groupBy(col("user_id")).agg(min(col("d")).as("c0"))
    val tot = c.agg(count(lit(1)).cast("bigint").as("n_users"))
    val r = d.join(c, Seq("user_id"))
      .withColumn("o", datediff(col("d"), col("c0")).cast("int"))
      .filter(col("o").between(1, 7))
      .groupBy(col("o"))
      .agg(countDistinct(col("user_id")).cast("bigint").as("n_active"))
    val ly = r.crossJoin(broadcast(tot))
      .select(col("o"),
        round(log(col("n_active").cast("double") / col("n_users")), 8)
          .cast("decimal(16,8)").as("l"))
    val m = ly.agg(count(lit(1)).cast("bigint").as("n"),
      sum(col("l")).cast("decimal(24,8)").as("sy"),
      sum(col("o") * col("l")).cast("decimal(24,8)").as("sxy"),
      sum(col("o").cast("bigint")).cast("bigint").as("sx"),
      sum(col("o").cast("bigint") * col("o")).cast("bigint").as("sxx"),
      sum(col("l") * col("l")).cast("decimal(38,16)").as("syy"))
    val num = col("n").cast("double") * col("sxy") -
      col("sx").cast("double") * col("sy")
    val denX = col("n").cast("double") * col("sxx") -
      col("sx").cast("double") * col("sx")
    val denY = col("n").cast("double") * col("syy") -
      col("sy").cast("double") * col("sy")
    val slope = num / denX
    m.crossJoin(broadcast(tot))
      .select(col("n_users"), col("n").as("n_points"),
        round(slope, 6).as("lambda"),
        round(-lit(0.6931471805599453) / slope, 6).as("halflife_days"),
        round(num * num / (denX * denY), 6).as("r2"))
  }

  /** MARKOV REMOVAL-EFFECT ATTRIBUTION — the data-driven attribution
    * model (Anderl et al.) that the heuristic linear/position/decay
    * rows approximate: build the session journey transition matrix
    * (start → touches → conv/null, journeys truncated at the first
    * purchase), compute the absorbing-chain conversion probability
    * from `start` by 12 unrolled power iterations, then each
    * channel's REMOVAL EFFECT = 1 − P(conv | channel's inbound edges
    * redirected to null) / P(conv), normalized into attribution
    * shares. All five scenarios (base + 4 removals) ride ONE
    * scenario-keyed matrix (≤ 5·49 rows), so the iteration is a
    * single bounded join per round — never one pipeline per channel.
    * Per-round products round to the 12-place grid before exact
    * DECIMAL sums (both engines iterate token-identically), so the
    * chain solution is bit-identical.
    *
    * Scale shape: the corpus-sized stages are one session-keyed
    * window pass (first purchase + lead) and one map-side-combining
    * transition count to ≤ 49 cells; the 12 iterations run on the
    * ≤ 245-row scenario matrix with per-round localCheckpoint (the
    * graph_pagerank discipline). */
  val evAttributionMarkov: GQuery = {
    val iters = 12
    val duckRound = (t: Int) =>
      s"""p$t AS (
         |  SELECT m.scenario, m.from_state AS state,
         |    CAST(round(sum(CAST(round(m.prob * p.p, 12)
         |      AS DECIMAL(14,12))), 12) AS DOUBLE) AS p
         |  FROM m JOIN p${t - 1} p ON p.scenario = m.scenario
         |    AND p.state = m.to_state
         |  GROUP BY 1, 2
         |  UNION ALL
         |  SELECT scenario, state, p FROM absorb)""".stripMargin
    GQuery("ev_attribution_markov",
      s"""WITH ev AS MATERIALIZED (
         |  SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
         |    event_type
         |  FROM events),
         |fp AS MATERIALIZED (
         |  SELECT user_id, day, ts AS pts, event_id AS pid FROM (
         |    SELECT user_id, day, ts, event_id,
         |      row_number() OVER (PARTITION BY user_id, day
         |        ORDER BY ts, event_id) AS prn
         |    FROM ev WHERE event_type = 'purchase') WHERE prn = 1),
         |t AS MATERIALIZED (
         |  SELECT e.user_id, e.day, e.ts, e.event_id, e.event_type,
         |    fp.pts IS NOT NULL AS has_conv
         |  FROM ev e LEFT JOIN fp
         |    ON e.user_id = fp.user_id AND e.day = fp.day
         |  WHERE e.event_type <> 'purchase'
         |    AND (fp.pts IS NULL OR e.ts < fp.pts
         |         OR (e.ts = fp.pts AND e.event_id < fp.pid))),
         |seq AS (
         |  SELECT user_id, day, event_type, has_conv,
         |    row_number() OVER w AS rn,
         |    lead(event_type) OVER w AS nxt
         |  FROM t WINDOW w AS (PARTITION BY user_id, day
         |                      ORDER BY ts, event_id)),
         |tr AS (
         |  SELECT 'start' AS from_state, event_type AS to_state
         |  FROM seq WHERE rn = 1
         |  UNION ALL
         |  SELECT event_type, coalesce(nxt,
         |    CASE WHEN has_conv THEN 'conv' ELSE 'null' END) FROM seq
         |  UNION ALL
         |  SELECT 'start', 'conv' FROM fp f
         |  WHERE NOT EXISTS (SELECT 1 FROM t
         |    WHERE t.user_id = f.user_id AND t.day = f.day)),
         |cnt AS MATERIALIZED (
         |  SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
         |  FROM tr GROUP BY 1, 2),
         |tot AS (SELECT from_state, CAST(sum(n) AS BIGINT) AS nt
         |        FROM cnt GROUP BY 1),
         |chans AS (SELECT DISTINCT to_state AS c FROM cnt
         |          WHERE to_state NOT IN ('conv', 'null')),
         |scen AS MATERIALIZED (
         |  SELECT 'base' AS scenario, CAST(NULL AS VARCHAR) AS removed
         |  UNION ALL SELECT 'rm_' || c, c FROM chans),
         |m AS MATERIALIZED (
         |  SELECT s.scenario, c.from_state,
         |    CASE WHEN s.removed IS NOT NULL AND c.to_state = s.removed
         |         THEN 'null' ELSE c.to_state END AS to_state,
         |    round(CAST(sum(c.n) AS DOUBLE) / t.nt, 8) AS prob
         |  FROM cnt c JOIN tot t ON c.from_state = t.from_state
         |  CROSS JOIN scen s
         |  WHERE s.removed IS NULL OR c.from_state <> s.removed
         |  GROUP BY 1, 2, 3, t.nt),
         |absorb AS MATERIALIZED (
         |  SELECT scenario, 'conv' AS state, CAST(1 AS DOUBLE) AS p
         |  FROM scen
         |  UNION ALL
         |  SELECT scenario, 'null', CAST(0 AS DOUBLE) FROM scen),
         |p0 AS (SELECT scenario, state, p FROM absorb),
         |${(1 to iters).map(duckRound).mkString(",\n")},
         |base AS (SELECT p AS pb FROM p$iters
         |         WHERE scenario = 'base' AND state = 'start'),
         |rem AS MATERIALIZED (
         |  SELECT substr(scenario, 4) AS channel,
         |    round(1 - p.p / b.pb, 6) AS removal_effect
         |  FROM p$iters p CROSS JOIN base b
         |  WHERE p.scenario LIKE 'rm_%' AND p.state = 'start'),
         |s2 AS (SELECT CAST(sum(CAST(round(removal_effect, 6)
         |         AS DECIMAL(12,6))) AS DOUBLE) AS tot FROM rem)
         |SELECT r.channel, r.removal_effect,
         |  round(r.removal_effect / s2.tot, 6) AS attribution_share,
         |  round((SELECT pb FROM base), 6) AS base_conversion
         |FROM rem r CROSS JOIN s2
         |ORDER BY r.channel""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"), col("ts"),
          col("event_id"), col("event_type"))
      val wp = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts"), col("event_id"))
      val fp = ev.filter(col("event_type") === "purchase")
        .withColumn("prn", row_number().over(wp))
        .filter(col("prn") === 1)
        .select(col("user_id"), col("day"), col("ts").as("pts"),
          col("event_id").as("pid"))
      val touches = ev.filter(col("event_type") =!= "purchase")
        .join(fp, Seq("user_id", "day"), "left")
        .filter(col("pts").isNull || col("ts") < col("pts")
          || (col("ts") === col("pts") && col("event_id") < col("pid")))
        .withColumn("has_conv", col("pts").isNotNull)
        .ckpt()
      val seq2 = touches
        .withColumn("rn", row_number().over(wp))
        .withColumn("nxt", lead(col("event_type"), 1).over(wp))
      val tr = seq2.filter(col("rn") === 1)
        .select(lit("start").as("from_state"),
          col("event_type").as("to_state"))
        .unionAll(seq2.select(col("event_type").as("from_state"),
          coalesce(col("nxt"), when(col("has_conv"), "conv")
            .otherwise("null")).as("to_state")))
        .unionAll(fp.join(
            touches.select(col("user_id"), col("day")).distinct(),
            Seq("user_id", "day"), "left_anti")
          .select(lit("start").as("from_state"),
            lit("conv").as("to_state")))
      val cnt = tr.groupBy(col("from_state"), col("to_state"))
        .agg(count(lit(1)).cast("bigint").as("n"))
        .ckpt()
      val tot = cnt.groupBy(col("from_state"))
        .agg(sum(col("n")).cast("bigint").as("nt"))
      val scen = cnt.filter(!col("to_state").isin("conv", "null"))
        .select(col("to_state").as("removed")).distinct()
        .select(concat(lit("rm_"), col("removed")).as("scenario"),
          col("removed"))
        .unionAll(s.range(1).select(lit("base").as("scenario"),
          lit(null).cast("string").as("removed")))
      val m = cnt.join(tot, Seq("from_state"))
        .crossJoin(scen)
        .filter(col("removed").isNull
          || col("from_state") =!= col("removed"))
        .select(col("scenario"), col("from_state"),
          when(col("removed").isNotNull
            && col("to_state") === col("removed"), "null")
            .otherwise(col("to_state")).as("to_state"),
          col("n"), col("nt"))
        .groupBy(col("scenario"), col("from_state"), col("to_state"),
          col("nt"))
        .agg(round(sum(col("n")).cast("double") / col("nt"), 8)
          .as("prob"))
        .select(col("scenario"), col("from_state"), col("to_state"),
          col("prob"))
        .ckpt()
      // the scenario matrix is bounded by the TYPE VOCABULARY, not the
      // corpus (≤ (|types|+2)² cells × (|types|+1) scenarios ≈ 245
      // rows) — the fleet's bounded-collect class (k-row seeds, nProbe
      // cell ids), so the 12 chain iterations run driver-side instead
      // of paying 12 scheduler round-trips on a 245-row frame (6 s →
      // sub-second warm). Rounding uses java BigDecimal.valueOf — the
      // exact semantics of Spark's round() on doubles — and the
      // DECIMAL-grid sums stay exact, so the result is bit-identical
      // to the distributed spelling (oracle-verified at all SFs).
      def r(x: Double, scale: Int): Double =
        java.math.BigDecimal.valueOf(x)
          .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
      val mat = m.collect().map(row => (row.getString(0),
        row.getString(1), row.getString(2), row.getDouble(3)))
      val scenarios = mat.map(_._1).distinct
      var p = scenarios.flatMap(sc =>
        Seq((sc, "conv") -> 1.0, (sc, "null") -> 0.0)).toMap
        .withDefaultValue(0.0)
      // decimal-grid sum: BigDecimal.valueOf on the ROUNDED double is
      // exactly the engines' CAST(round(x,12) AS DECIMAL(14,12))
      def dec(x: Double): scala.math.BigDecimal =
        scala.math.BigDecimal(java.math.BigDecimal.valueOf(x))
      for (_ <- 1 to iters) {
        val nxt = mat.groupBy(x => (x._1, x._2)).map { case (k, xs) =>
          k -> r(xs.map(x => dec(r(x._4 * p((x._1, x._3)), 12)))
            .sum.toDouble, 12)
        }
        p = (nxt ++ scenarios.flatMap(sc =>
          Seq((sc, "conv") -> 1.0, (sc, "null") -> 0.0)))
          .withDefaultValue(0.0)
      }
      val pb = p(("base", "start"))
      val removals = scenarios.filter(_.startsWith("rm_")).sorted.map {
        sc => (sc.substring(3), r(1 - p((sc, "start")) / pb, 6))
      }
      val shareTot = removals.map(x => dec(x._2)).sum.toDouble
      import s.implicits._
      removals.toSeq.map { case (ch, re) =>
        (ch, re, r(re / shareTot, 6), r(pb, 6))
      }.toDF("channel", "removal_effect", "attribution_share",
        "base_conversion")
        .orderBy(col("channel"))
    }
  }

  /** ALWAYS-VALID SEQUENTIAL A/B TEST (mSPRT) — the peeking-safe
    * monitor the fixed-horizon `ev_ab_ztest` cannot be: one row per
    * day of the experiment with the cumulative two-proportion state
    * and the MIXTURE sequential probability ratio, τ = 0.01. Per day
    * t, with cumulative lift L_t = p̂_T − p̂_C and its variance
    * V_t = p̂(1−p̂)(1/n_C + 1/n_T):
    * ln Λ_t = ½·ln(V/(V+τ)) + τL²/(2V(V+τ)), and the always-valid
    * p-value is p_t = min(1, exp(−max_{s≤t} ln Λ_s)) — the running
    * extremum rides a cumulative window MAX (exact on doubles, no
    * recursion needed; exp/ln only at the readout, 6-place grid).
    * Days before both arms have users and a non-degenerate pooled
    * rate carry a NULL ratio and inherit the running max (window max
    * ignores NULLs — both engines). Arms come from the fleet's
    * portable salted hash (the ev_ab_ztest assignment), conversion =
    * first purchase with value > 100.
    *
    * Scale shape: one map-side-combining per-user aggregate (arm,
    * first day, first conversion day) is the only corpus-sized
    * stage; the daily state lives on the calendar-bounded ≤366-row
    * grid (the ev_value_ema window precedent). */
  val evAbSprt: GQuery = GQuery(
    "ev_ab_sprt",
    s"""WITH u AS (
       |  SELECT user_id,
       |    ${DedupQueries.duckHash(
              "concat('ab:', CAST(user_id AS VARCHAR))")} % 2 AS v,
       |    min(CAST(ts AS DATE)) AS f,
       |    min(CASE WHEN event_type = 'purchase' AND value > 100
       |             THEN CAST(ts AS DATE) END) AS c
       |  FROM events GROUP BY 1, 2),
       |days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
       |enter AS (
       |  SELECT f AS day,
       |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS ec,
       |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS et
       |  FROM u GROUP BY 1),
       |conv AS (
       |  SELECT c AS day,
       |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS cc,
       |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS ct
       |  FROM u WHERE c IS NOT NULL GROUP BY 1),
       |g AS (
       |  SELECT d.day,
       |    CAST(sum(coalesce(e.ec, 0)) OVER w AS BIGINT) AS n_c,
       |    CAST(sum(coalesce(e.et, 0)) OVER w AS BIGINT) AS n_t,
       |    CAST(sum(coalesce(v.cc, 0)) OVER w AS BIGINT) AS conv_c,
       |    CAST(sum(coalesce(v.ct, 0)) OVER w AS BIGINT) AS conv_t
       |  FROM days d
       |  LEFT JOIN enter e ON d.day = e.day
       |  LEFT JOIN conv v ON d.day = v.day
       |  WINDOW w AS (ORDER BY d.day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |ll AS (
       |  SELECT day, n_c, n_t, conv_c, conv_t,
       |    CASE WHEN n_c > 0 AND n_t > 0
       |           AND conv_c + conv_t > 0
       |           AND conv_c + conv_t < n_c + n_t
       |    THEN 0.5 * ln(
       |        (CAST(conv_c + conv_t AS DOUBLE) / (n_c + n_t)
       |          * (1 - CAST(conv_c + conv_t AS DOUBLE) / (n_c + n_t))
       |          * (CAST(1 AS DOUBLE) / n_c + CAST(1 AS DOUBLE) / n_t))
       |        / ((CAST(conv_c + conv_t AS DOUBLE) / (n_c + n_t)
       |          * (1 - CAST(conv_c + conv_t AS DOUBLE) / (n_c + n_t))
       |          * (CAST(1 AS DOUBLE) / n_c + CAST(1 AS DOUBLE) / n_t))
       |          + 0.01))
       |      + 0.01 * (CAST(conv_t AS DOUBLE) / n_t
       |          - CAST(conv_c AS DOUBLE) / n_c)
       |        * (CAST(conv_t AS DOUBLE) / n_t
       |          - CAST(conv_c AS DOUBLE) / n_c)
       |        / (2 * (CAST(conv_c + conv_t AS DOUBLE) / (n_c + n_t)
       |          * (1 - CAST(conv_c + conv_t AS DOUBLE) / (n_c + n_t))
       |          * (CAST(1 AS DOUBLE) / n_c + CAST(1 AS DOUBLE) / n_t))
       |          * ((CAST(conv_c + conv_t AS DOUBLE) / (n_c + n_t)
       |          * (1 - CAST(conv_c + conv_t AS DOUBLE) / (n_c + n_t))
       |          * (CAST(1 AS DOUBLE) / n_c + CAST(1 AS DOUBLE) / n_t))
       |          + 0.01))
       |    END AS log_lambda
       |  FROM g)
       |SELECT strftime(day, '%Y-%m-%d') AS day, n_c, n_t, conv_c,
       |  conv_t,
       |  round(CASE WHEN n_c > 0 AND n_t > 0
       |    THEN CAST(conv_t AS DOUBLE) / n_t
       |      - CAST(conv_c AS DOUBLE) / n_c END, 6) AS lift,
       |  round(log_lambda, 6) AS log_lambda,
       |  round(least(CAST(1 AS DOUBLE),
       |    exp(-max(log_lambda) OVER (ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))), 6)
       |    AS p_always_valid,
       |  coalesce(least(CAST(1 AS DOUBLE),
       |    exp(-max(log_lambda) OVER (ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))
       |    <= 0.05, false) AS significant
       |FROM ll
       |ORDER BY day""".stripMargin) { (s, dir) =>
    val u = Tables.events(s, dir)
      .withColumn("v",
        graft.api.Sampling.portableHash(col("user_id"), "ab:") % 2)
      .groupBy(col("user_id"), col("v"))
      .agg(min(to_date(col("ts"))).as("f"),
        min(when(col("event_type") === "purchase" && col("value") > 100,
          to_date(col("ts")))).as("c"))
    val days = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day")).distinct()
    val enter = u.groupBy(col("f").as("day"))
      .agg(sum(when(col("v") === 0, 1).otherwise(0)).cast("bigint")
          .as("ec"),
        sum(when(col("v") === 1, 1).otherwise(0)).cast("bigint")
          .as("et"))
    val conv = u.filter(col("c").isNotNull)
      .groupBy(col("c").as("day"))
      .agg(sum(when(col("v") === 0, 1).otherwise(0)).cast("bigint")
          .as("cc"),
        sum(when(col("v") === 1, 1).otherwise(0)).cast("bigint")
          .as("ct"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val g = days.join(enter, Seq("day"), "left")
      .join(conv, Seq("day"), "left")
      .select(col("day"),
        sum(coalesce(col("ec"), lit(0L))).over(w).cast("bigint")
          .as("n_c"),
        sum(coalesce(col("et"), lit(0L))).over(w).cast("bigint")
          .as("n_t"),
        sum(coalesce(col("cc"), lit(0L))).over(w).cast("bigint")
          .as("conv_c"),
        sum(coalesce(col("ct"), lit(0L))).over(w).cast("bigint")
          .as("conv_t"))
    val vEst = (col("conv_c") + col("conv_t")).cast("double")
      ./(col("n_c") + col("n_t"))
      .*(lit(1) - (col("conv_c") + col("conv_t")).cast("double")
        / (col("n_c") + col("n_t")))
      .*(lit(1.0) / col("n_c") + lit(1.0) / col("n_t"))
    val liftE = col("conv_t").cast("double") / col("n_t") -
      col("conv_c").cast("double") / col("n_c")
    val ll = g.withColumn("log_lambda",
      when(col("n_c") > 0 && col("n_t") > 0
          && col("conv_c") + col("conv_t") > 0
          && col("conv_c") + col("conv_t") < col("n_c") + col("n_t"),
        lit(0.5) * log(vEst / (vEst + lit(0.01)))
          + lit(0.01) * liftE * liftE
            / (lit(2) * vEst * (vEst + lit(0.01)))))
    val pCol = least(lit(1.0), exp(-max(col("log_lambda")).over(w)))
    ll.select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_c"), col("n_t"), col("conv_c"), col("conv_t"),
        round(when(col("n_c") > 0 && col("n_t") > 0, liftE), 6)
          .as("lift"),
        round(col("log_lambda"), 6).as("log_lambda"),
        round(pCol, 6).as("p_always_valid"),
        coalesce(pCol <= 0.05, lit(false)).as("significant"))
      .orderBy(col("day"))
  }

  /** QUANTILE TREATMENT EFFECTS — the distributional readout the
    * mean-difference tests (`ev_ab_welch`, `ev_did_analysis`) hide:
    * per-user purchase revenue (the Welch metric, DECIMAL(18,2)-
    * exact per-user sums, non-purchasers count as 0) compared
    * between the portable-hash arms at the p25/p50/p75 quantiles —
    * one row per quantile with both arms' values and the effect
    * QTE(q) = T(q) − C(q). A treatment that only moves the tail
    * shows QTE(p75) ≫ QTE(p50) while the mean test smears it.
    * Interpolated (continuous) quantiles on doubles cast FROM the
    * exact decimals; both engines interpolate identically
    * (percentile ≡ quantile_cont, the win_theil_sen precedent);
    * 6-place grid.
    *
    * Scale shape: one map-side-combining per-user aggregate, then
    * six single-pass percentiles on a 1-row frame unpivoted to the
    * 3-row readout. */
  val evQuantileTe: GQuery = GQuery(
    "ev_quantile_te",
    s"""WITH u AS (
       |  SELECT user_id,
       |    ${DedupQueries.duckHash(
              "concat('ab:', CAST(user_id AS VARCHAR))")} % 2 AS v,
       |    CAST(sum(CASE WHEN event_type = 'purchase'
       |      THEN CAST(round(value, 2) AS DECIMAL(18,2))
       |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2))
       |      AS rev
       |  FROM events GROUP BY 1, 2),
       |a AS (
       |  SELECT
       |    quantile_cont(CASE WHEN v = 0 THEN CAST(rev AS DOUBLE) END,
       |      0.25) AS c25,
       |    quantile_cont(CASE WHEN v = 1 THEN CAST(rev AS DOUBLE) END,
       |      0.25) AS t25,
       |    quantile_cont(CASE WHEN v = 0 THEN CAST(rev AS DOUBLE) END,
       |      0.5) AS c50,
       |    quantile_cont(CASE WHEN v = 1 THEN CAST(rev AS DOUBLE) END,
       |      0.5) AS t50,
       |    quantile_cont(CASE WHEN v = 0 THEN CAST(rev AS DOUBLE) END,
       |      0.75) AS c75,
       |    quantile_cont(CASE WHEN v = 1 THEN CAST(rev AS DOUBLE) END,
       |      0.75) AS t75
       |  FROM u)
       |SELECT q, round(control, 6) AS control,
       |  round(treatment, 6) AS treatment,
       |  round(treatment - control, 6) AS qte
       |FROM (
       |  SELECT 'p25' AS q, c25 AS control, t25 AS treatment FROM a
       |  UNION ALL
       |  SELECT 'p50', c50, t50 FROM a
       |  UNION ALL
       |  SELECT 'p75', c75, t75 FROM a)
       |ORDER BY q""".stripMargin) { (s, dir) =>
    val u = Tables.events(s, dir)
      .withColumn("v",
        graft.api.Sampling.portableHash(col("user_id"), "ab:") % 2)
      .groupBy(col("user_id"), col("v"))
      .agg(sum(when(col("event_type") === "purchase",
          round(col("value"), 2).cast("decimal(18,2)"))
        .otherwise(lit(0).cast("decimal(18,2)")))
        .cast("decimal(18,2)").as("rev"))
    def q(arm: Int, p: Double) = percentile(
      when(col("v") === arm, col("rev").cast("double")), lit(p))
    val a = u.agg(
      q(0, 0.25).as("c25"), q(1, 0.25).as("t25"),
      q(0, 0.5).as("c50"), q(1, 0.5).as("t50"),
      q(0, 0.75).as("c75"), q(1, 0.75).as("t75"))
    a.select(expr(
        """stack(3,
          |  'p25', c25, t25,
          |  'p50', c50, t50,
          |  'p75', c75, t75) AS (q, control, treatment)""".stripMargin))
      .select(col("q"), round(col("control"), 6).as("control"),
        round(col("treatment"), 6).as("treatment"),
        round(col("treatment") - col("control"), 6).as("qte"))
      .orderBy(col("q"))
  }

  /** UCB1 BANDIT MONITOR — the offline policy-evaluation replay of the
    * `ev_ab_*` experiment as a multi-armed bandit: per calendar day,
    * each arm's CUMULATIVE pulls (events) and rewards (big-ticket
    * purchases, value > 100) feed the UCB1 index
    * mean + √(2·ln N / n) (Auer et al. 2002), and the row the policy
    * WOULD play that day is flagged (rounded-index DESC, arm ASC
    * tiebreak — deterministic cross-engine because both engines
    * compute the identical double expression on identical integers).
    * Assignment is the fleet's portable salted hash (salt `ab:`, the
    * same arms as ev_ab_ztest/ev_ab_sprt), never seeded rand; the
    * day×arm grid is built explicitly so a pull-free arm-day cannot
    * silently drop (its index is NULL until the arm has pulls).
    *
    * Scale shape: one map-side-combining (day, arm) aggregate is the
    * only corpus-sized stage; everything after runs on the ≤366×2
    * grid (the ev_ab_sprt discipline — bounded unpartitioned windows
    * on the calendar frame). */
  val evBanditUcb: GQuery = GQuery(
    "ev_bandit_ucb",
    s"""WITH e AS (
       |  SELECT CAST(ts AS DATE) AS day,
       |    CAST(${DedupQueries.duckHash(
              "concat('ab:', CAST(user_id AS VARCHAR))")} % 2 AS INT)
       |      AS arm,
       |    CASE WHEN event_type = 'purchase' AND value > 100
       |         THEN 1 ELSE 0 END AS rew
       |  FROM events),
       |d AS (
       |  SELECT day, arm, CAST(count(*) AS BIGINT) AS pulls,
       |    CAST(sum(rew) AS BIGINT) AS rewards
       |  FROM e GROUP BY 1, 2),
       |grid AS (
       |  SELECT day, arm
       |  FROM (SELECT DISTINCT day FROM d)
       |  CROSS JOIN (SELECT 0 AS arm UNION ALL SELECT 1)),
       |c AS (
       |  SELECT g.day, g.arm,
       |    CAST(sum(coalesce(d.pulls, 0)) OVER w AS BIGINT) AS n,
       |    CAST(sum(coalesce(d.rewards, 0)) OVER w AS BIGINT) AS rew
       |  FROM grid g LEFT JOIN d ON g.day = d.day AND g.arm = d.arm
       |  WINDOW w AS (PARTITION BY g.arm ORDER BY g.day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |t AS (
       |  SELECT day, arm, n, rew,
       |    CAST(sum(n) OVER (PARTITION BY day) AS BIGINT) AS ntot
       |  FROM c),
       |u AS (
       |  SELECT day, arm, n, rew,
       |    CASE WHEN n = 0 THEN CAST(NULL AS DOUBLE)
       |      ELSE round(CAST(rew AS DOUBLE) / n, 6) END AS mean_reward,
       |    CASE WHEN n = 0 THEN CAST(NULL AS DOUBLE)
       |      ELSE round(CAST(rew AS DOUBLE) / n
       |        + sqrt(2.0 * ln(CAST(ntot AS DOUBLE)) / n), 6)
       |    END AS ucb
       |  FROM t)
       |SELECT strftime(day, '%Y-%m-%d') AS day, arm,
       |  n AS pulls, rew AS rewards, mean_reward, ucb,
       |  row_number() OVER (PARTITION BY day
       |    ORDER BY ucb DESC NULLS LAST, arm) = 1 AS chosen
       |FROM u
       |ORDER BY day, arm""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"),
        (graft.api.Sampling.portableHash(col("user_id"), "ab:") % 2)
          .cast("int").as("arm"),
        when(col("event_type") === "purchase" && col("value") > 100, 1)
          .otherwise(0).as("rew"))
    val d = e.groupBy(col("day"), col("arm"))
      .agg(count(lit(1)).cast("bigint").as("pulls"),
        sum(col("rew")).cast("bigint").as("rewards"))
    val grid = d.select(col("day")).distinct()
      .crossJoin(broadcast(
        s.range(2).select(col("id").cast("int").as("arm"))))
    val wc = Window.partitionBy(col("arm")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = grid.join(d, Seq("day", "arm"), "left")
      .select(col("day"), col("arm"),
        sum(coalesce(col("pulls"), lit(0L))).over(wc).cast("bigint")
          .as("n"),
        sum(coalesce(col("rewards"), lit(0L))).over(wc).cast("bigint")
          .as("rew"))
    val t = c.withColumn("ntot",
      sum(col("n")).over(Window.partitionBy(col("day"))).cast("bigint"))
    val mean = col("rew").cast("double") / col("n")
    val u = t.select(col("day"), col("arm"), col("n"), col("rew"),
      when(col("n") === 0, lit(null).cast("double"))
        .otherwise(round(mean, 6)).as("mean_reward"),
      when(col("n") === 0, lit(null).cast("double"))
        .otherwise(round(mean
          + sqrt(lit(2.0) * log(col("ntot").cast("double")) / col("n")),
          6)).as("ucb"))
    val wd = Window.partitionBy(col("day"))
      .orderBy(col("ucb").desc_nulls_last, col("arm"))
    u.select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("arm"),
        col("n").as("pulls"), col("rew").as("rewards"),
        col("mean_reward"), col("ucb"),
        (row_number().over(wd) === 1).as("chosen"))
      .orderBy(col("day"), col("arm"))
  }

  /** SHAPLEY-VALUE ATTRIBUTION — the game-theoretic capstone of the
    * attribution family (last-touch → linear → U-shaped → decay →
    * Markov removal-effect → this): each channel's credit is its
    * average marginal contribution to conversion over every coalition
    * of the other channels (Shapley 1953, applied to journeys as in
    * the set-based simplification the ad-tech literature uses): the
    * characteristic function is v(S) = conversion rate of users whose
    * observed channel SET is exactly S (v = 0 for unobserved sets),
    * and φ_i = Σ_{S ∌ i} w(|S|)·(v(S∪i) − v(S)) with
    * w(s) = s!(n−1−s)!/n!.
    *
    * Exactness: channel sets ride a BITMASK (rank = alphabetical
    * position among the 4 non-purchase types — the fixture's channel
    * count at every SF, so n = 4 and the 24·w(s) weights are the
    * integer literals 6/2/2/6; n is visible through the 16-row mask
    * spine); v quantizes one round-12 double division to
    * DECIMAL(16,12), so every marginal, the weighted sum, and the
    * efficiency identity Σφ·24 = 24·(v(full) − v(∅)) are EXACT
    * decimals (spec-pinned); the only remaining doubles are the final
    * /24 and the share division, rounded 6 in the same order in both
    * engines.
    *
    * Scale shape: three map-side-combining corpus stages (distinct
    * (user, channel), distinct converters, the per-user mask sum);
    * the coalition lattice is a 16-row spine — all Shapley algebra
    * runs on ≤ |channels|·2ⁿ⁻¹ = 32 rows, and the share rides a
    * 4-row unpartitioned window. */
  val evAttributionShapley: GQuery = GQuery(
    "ev_attribution_shapley",
    """WITH ch AS (
      |  SELECT event_type AS channel,
      |    CAST(row_number() OVER (ORDER BY event_type) - 1 AS INT)
      |      AS rnk
      |  FROM (SELECT DISTINCT event_type FROM events
      |        WHERE event_type <> 'purchase')),
      |uch AS (
      |  SELECT DISTINCT e.user_id, c.rnk
      |  FROM events e JOIN ch c ON e.event_type = c.channel),
      |um AS (SELECT user_id, CAST(sum(1 << rnk) AS INT) AS mask
      |       FROM uch GROUP BY 1),
      |conv AS (SELECT DISTINCT user_id FROM events
      |         WHERE event_type = 'purchase'),
      |allu AS (SELECT DISTINCT user_id FROM events),
      |base AS (
      |  SELECT a.user_id, coalesce(um.mask, 0) AS mask,
      |    CASE WHEN conv.user_id IS NOT NULL THEN 1 ELSE 0 END AS cv
      |  FROM allu a
      |  LEFT JOIN um ON a.user_id = um.user_id
      |  LEFT JOIN conv ON a.user_id = conv.user_id),
      |vs AS (
      |  SELECT mask, CAST(count(*) AS BIGINT) AS n_users,
      |    CAST(sum(cv) AS BIGINT) AS n_conv,
      |    CAST(round(CAST(sum(cv) AS DOUBLE) / count(*), 12)
      |      AS DECIMAL(16,12)) AS v
      |  FROM base GROUP BY 1),
      |spine AS (SELECT CAST(unnest(range(16)) AS INT) AS mask),
      |vall AS (
      |  SELECT s.mask,
      |    coalesce(vs.v, CAST(0 AS DECIMAL(16,12))) AS v
      |  FROM spine s LEFT JOIN vs ON s.mask = vs.mask),
      |marg AS (
      |  SELECT c.channel,
      |    CASE bit_count(a.mask) WHEN 0 THEN 6 WHEN 1 THEN 2
      |      WHEN 2 THEN 2 ELSE 6 END AS w24,
      |    b.v - a.v AS dv
      |  FROM ch c
      |  JOIN vall a ON (a.mask & (1 << c.rnk)) = 0
      |  JOIN vall b ON b.mask = a.mask + (1 << c.rnk)),
      |phi AS (
      |  SELECT channel, CAST(sum(w24 * dv) AS DECIMAL(24,12)) AS s24
      |  FROM marg GROUP BY 1)
      |SELECT channel,
      |  round(CAST(s24 AS DOUBLE) / 24, 6) AS shapley,
      |  CASE WHEN CAST(sum(s24) OVER () AS DOUBLE) = 0
      |    THEN CAST(NULL AS DOUBLE)
      |    ELSE round(CAST(s24 AS DOUBLE)
      |      / CAST(sum(s24) OVER () AS DOUBLE), 6) END AS share
      |FROM phi
      |ORDER BY channel""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val ch = ev.filter(col("event_type") =!= "purchase")
      .select(col("event_type").as("channel")).distinct()
      .select(col("channel"),
        (row_number().over(Window.orderBy(col("channel"))) - 1)
          .cast("int").as("rnk"))
    // the 16-row mask spine and the 6/2/2/6 integer weights hardcode
    // n = 4 channels; a 5th non-purchase type would silently drop
    // masks >= 16 and misweight coalitions IDENTICALLY in both
    // engines (oracle parity would still pass) — fail fast instead.
    // Bounded action: |distinct event types| rows.
    val nCh = ch.count()
    require(nCh == 4,
      s"ev_attribution_shapley assumes exactly 4 non-purchase " +
        s"channels (16-row coalition spine, 24*w(s) = 6/2/2/6); " +
        s"fixture has $nCh")
    val uch = ev.join(ch, ev("event_type") === ch("channel"))
      .select(col("user_id"), col("rnk")).distinct()
    val um = uch.groupBy(col("user_id"))
      .agg(sum(expr("1 << rnk")).cast("int").as("mask"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().withColumn("cvf", lit(1))
    val allu = ev.select(col("user_id")).distinct()
    val base = allu.join(um, Seq("user_id"), "left")
      .join(conv, Seq("user_id"), "left")
      .select(coalesce(col("mask"), lit(0)).as("mask"),
        coalesce(col("cvf"), lit(0)).as("cv"))
    val vs = base.groupBy(col("mask"))
      .agg(count(lit(1)).cast("bigint").as("n_users"),
        sum(col("cv")).cast("bigint").as("n_conv"))
      .select(col("mask"),
        round(col("n_conv").cast("double") / col("n_users"), 12)
          .cast("decimal(16,12)").as("v"))
    val spine = s.range(16).select(col("id").cast("int").as("mask"))
    val vall = spine.join(vs, Seq("mask"), "left")
      .select(col("mask"),
        coalesce(col("v"), lit(0).cast("decimal(16,12)")).as("v"))
    val a = vall.select(col("mask").as("amask"), col("v").as("av"))
    val b = vall.select(col("mask").as("bmask"), col("v").as("bv"))
    val w24 = when(expr("bit_count(amask)") === 0, 6)
      .when(expr("bit_count(amask)") === 1, 2)
      .when(expr("bit_count(amask)") === 2, 2).otherwise(6)
    val marg = ch
      .join(a, expr("(amask & (1 << rnk)) = 0"))
      .join(b, expr("bmask = amask + (1 << rnk)"))
      .select(col("channel"), (w24 * (col("bv") - col("av"))).as("t"))
    val phi = marg.groupBy(col("channel"))
      .agg(sum(col("t")).cast("decimal(24,12)").as("s24"))
    val wAll = Window.partitionBy()
    val tot = sum(col("s24")).over(wAll).cast("double")
    phi.select(col("channel"),
        round(col("s24").cast("double") / 24, 6).as("shapley"),
        when(tot === 0, lit(null).cast("double"))
          .otherwise(round(col("s24").cast("double") / tot, 6))
          .as("share"))
      .orderBy(col("channel"))
  }

  /** WATERMARK LATE-DATA AUDIT — the batch-oracle form of the one
    * §2.9 row that was previously test-only: per (1-day event-time
    * window, type), how many rows a 30-minute watermark WOULD drop if
    * the fixture were replayed as a stream.
    *
    * The replay needs an arrival order distinct from event time (the
    * fixture is perfectly time-sorted by event_id, under which
    * nothing is ever late), so arrival is simulated as event time
    * plus a bounded portable-hash jitter of ±1 h — the multi-source
    * ingestion interleave a real collector sees. The drop rule is the
    * per-row idealization of Structured Streaming's watermark (the
    * one micro-batch semantics converge to as batches shrink — pinned
    * against a one-row-per-batch MemoryStream run in
    * EventStreamsSpec): a row is late iff its event time does not EXCEED (max event
    * time of all PRIOR arrivals) − delay — the engine keeps a row
    * only when its timestamp is strictly newer than the watermark,
    * boundary rows are dropped (pinned empirically in the spec).
    *
    * Scale shape: the global prefix-max over arrival order decomposes
    * by 1-hour ARRIVAL blocks — within-block running max is a window
    * PARTITIONED by block (parallel, per-block rows bounded by ingest
    * rate, not corpus size), and the cross-block carry is a running
    * max over the per-block aggregate frame, whose row count is the
    * corpus's time span in hours (bounded by calendar, not data; the
    * same bounded-frame discipline as the distributed prefix sums in
    * api.Text). The carry frame attaches back by block id as a
    * broadcast. */
  private val lateDelayUs = 1800000000L // 30-min watermark delay
  private val lateJitterSpanUs = 7200000000L // arrival = event ± 1 h
  private val lateBlockUs = 3600000000L // 1-h arrival blocks

  /** Arrival-order CTE pair with caller-chosen names (`<p>e`,
    * `<p>w`): simulated arrival order (event time + bounded
    * portable-hash jitter) and the strict-prior prefix max `pm`.
    * Parameterized on the CTE-name prefix so the SAME string builds
    * both the standalone oracles (empty prefix) and the knob card's
    * combined WITH clause (unique `w1` prefix) — the card can never
    * desync from the chain it summarizes (round-14 ADVICE). */
  private def arrivalChain(p: String, extraCols: String): String =
    s"""${p}e AS (
       |  SELECT event_id, ${extraCols}epoch_us(ts) AS us,
       |    epoch_us(ts)
       |      + (${DedupQueries.duckHash(
              "concat('arr:', CAST(event_id AS VARCHAR))")}
       |         % $lateJitterSpanUs) - ${lateJitterSpanUs / 2} AS arr
       |  FROM events),
       |${p}w AS (
       |  SELECT ${extraCols}us,
       |    max(us) OVER (ORDER BY arr, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
       |  FROM ${p}e)""".stripMargin

  /** Shared oracle CTEs ending in `w (event_type, us, pm)` —
    * DELAY-INDEPENDENT, so one chain serves both the fixed-watermark
    * audit (ev_late_data) and the delay sweep (ev_watermark_sweep). */
  private val lateArrivalCte =
    "WITH " + arrivalChain("", "event_type, ")

  private val watermarkDelaysMin = Seq(5, 15, 30, 60, 120)

  /** The watermark sweep's full oracle chain (unique `w1*` CTE names)
    * ending in `w1f (delay_min, n_events, n_late, late_share)` —
    * shared verbatim with pipeline_knob_card's oracle. */
  private[operators] val watermarkSweepCte: String =
    s"""${arrivalChain("w1", "")},
       |w1s AS (SELECT unnest([${watermarkDelaysMin.mkString(", ")}])
       |        AS delay_min),
       |w1m AS (
       |  SELECT delay_min, count(*) AS n_events,
       |    sum(CASE WHEN pm IS NOT NULL
       |      AND us <= pm - CAST(delay_min AS BIGINT) * 60000000
       |      THEN 1 ELSE 0 END) AS n_late
       |  FROM w1w, w1s GROUP BY delay_min),
       |w1f AS (SELECT delay_min, n_events, n_late,
       |    round(CAST(n_late AS DOUBLE) / n_events, 6) AS late_share
       |  FROM w1m)""".stripMargin

  private val sessionGapsMin = Seq(5, 15, 30, 60)

  /** The session-gap sweep's full oracle chain (unique `s1*` CTE
    * names) ending in `s1f (gap_min, n_events, n_sessions, in_us,
    * ref)` — shared verbatim with pipeline_knob_card's oracle. */
  private[operators] val sessionGapSweepCte: String =
    s"""s1e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
       |s1d AS (SELECT user_id,
       |    us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
       |      AS delta
       |  FROM s1e),
       |s1s AS (SELECT unnest([${sessionGapsMin.mkString(", ")}])
       |        AS gap_min),
       |s1m AS (
       |  SELECT gap_min,
       |    count(*) AS n_events,
       |    count(DISTINCT user_id)
       |      + sum(CASE WHEN delta >= CAST(gap_min AS BIGINT) * 60000000
       |            THEN 1 ELSE 0 END) AS n_sessions,
       |    sum(CASE WHEN delta IS NOT NULL
       |          AND delta < CAST(gap_min AS BIGINT) * 60000000
       |          THEN delta ELSE 0 END) AS in_us
       |  FROM s1d, s1s GROUP BY gap_min),
       |s1f AS (SELECT gap_min, n_events, n_sessions, in_us,
       |    min(n_sessions) OVER () AS ref FROM s1m)""".stripMargin

  /** Spark twin of [[lateArrivalCte]]: (event_type, us, pm) with the
    * blocked-prefix-max decomposition (within-block windows
    * partitioned by 1-h arrival block; cross-block carry over the
    * span-hours aggregate frame, broadcast back). */
  private def lateArrivalFrame(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("arr", col("us") +
        graft.api.Sampling.portableHash(col("event_id"), "arr:")
          % lateJitterSpanUs - lit(lateJitterSpanUs / 2))
      .withColumn("blk", expr(s"arr div $lateBlockUs"))
    // within-block prefix max EXCLUDING the current row, in exact
    // arrival order (arr, event_id) — partitioned, so parallel
    val inBlk = Window.partitionBy(col("blk"))
      .orderBy(col("arr"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // cross-block carry: running max of per-block maxima over all
    // STRICTLY EARLIER blocks; the frame has span-hours rows
    val carry = e.groupBy(col("blk")).agg(max(col("us")).as("bm"))
      .withColumn("prev_bm", max(col("bm")).over(
        Window.orderBy(col("blk"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("blk"), col("prev_bm"))
    e.join(broadcast(carry), Seq("blk"))
      .withColumn("pm", greatest(max(col("us")).over(inBlk),
        col("prev_bm")))
      .select(col("event_type"), col("us"), col("pm"))
  }

  val evLateData: GQuery = {
    GQuery("ev_late_data",
      s"""$lateArrivalCte
         |SELECT CAST((us // 86400000000) * 86400000000 AS BIGINT)
         |    AS win_start_us,
         |  event_type, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(CASE WHEN pm IS NOT NULL AND us <= pm - $lateDelayUs
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_late
         |FROM w
         |GROUP BY 1, 2
         |ORDER BY win_start_us, event_type""".stripMargin) { (s, dir) =>
      lateArrivalFrame(s, dir)
        .groupBy(expr("(us div 86400000000) * 86400000000")
            .cast("bigint").as("win_start_us"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("pm").isNotNull &&
              col("us") <= col("pm") - lateDelayUs, 1L).otherwise(0L))
            .cast("bigint").as("n_late"))
        .orderBy(col("win_start_us"), col("event_type"))
    }
  }

  /** WATERMARK SIZING SWEEP — the latency/completeness curve behind
    * the §2.9 watermark choice (the third sizing sweep next to
    * sim_nprobe_sweep and dedup_band_sweep): how many rows a delay of
    * 5 / 15 / 30 / 60 / 120 minutes would drop under the same
    * simulated arrival replay as ev_late_data. The strict-prior
    * prefix max `pm` is DELAY-INDEPENDENT, so the expensive pass
    * (the blocked prefix max) runs ONCE and the sweep is five
    * aggregate predicates over it — a deployment reads the knee to
    * pick the smallest state-retention delay above its completeness
    * floor (state size and result latency both grow linearly in the
    * delay; dropped-row share is what it buys down).
    *
    * Determinism: drop counts are exact integer sums under the same
    * boundary-inclusive rule the engine exhibits (us ≤ pm − delay,
    * MemoryStream-pinned in EventStreamsSpec); late_share is one
    * rounded divide of two exact integers.
    *
    * Scale shape: identical to ev_late_data (partitioned within-block
    * windows, calendar-bounded carry frame, broadcast attach) plus a
    * constant ×5 per-row explode — no join, no extra shuffle. */
  val evWatermarkSweep: GQuery = {
    val delaysMin = watermarkDelaysMin
    GQuery("ev_watermark_sweep",
      s"""WITH $watermarkSweepCte
         |SELECT CAST(delay_min AS INT) AS delay_min,
         |  CAST(n_events AS BIGINT) AS n_events,
         |  CAST(n_late AS BIGINT) AS n_late,
         |  late_share
         |FROM w1f
         |ORDER BY delay_min""".stripMargin) { (s, dir) =>
      // the 4-row curve is a planning artifact — memoized per
      // (session, dir) so the standalone row and pipeline_knob_card
      // share ONE materialization (round-15 VERDICT item 7)
      graft.PlanCache.memo(s, dir, "wm_sweep_curve") {
        lateArrivalFrame(s, dir)
          .withColumn("delay_min",
            explode(array(delaysMin.map(d => lit(d)): _*)))
          .groupBy(col("delay_min"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("pm").isNotNull && col("us") <=
                col("pm") - col("delay_min").cast("long") * 60000000L, 1L)
              .otherwise(0L)).cast("bigint").as("n_late"))
          .select(col("delay_min"), col("n_events"), col("n_late"),
            round(col("n_late").cast("double") / col("n_events"), 6)
              .as("late_share"))
      }.orderBy(col("delay_min"))
    }
  }

  /** SESSION-GAP SIZING SWEEP — the sessionization knob priced (the
    * fourth sizing sweep): fleet session count, events/session, and
    * mean session length at gap timeouts of 5/15/30/60 minutes. The
    * insight that makes this ONE window pass instead of four
    * sessionizations: every gap-dependent metric is a function of the
    * per-user inter-event DELTA multiset — sessions(g) = users +
    * |{δ ≥ g}| (each user's first event opens a session, each
    * break opens another), and total in-session time(g) = Σ δ<g (a
    * delta either breaks a session or lies inside one). So the lag
    * window runs once and the sweep is four predicate aggregates —
    * the ev_watermark_sweep discipline. The g = 30 min point is
    * pinned ≡ the shipped ev_session row (same ≥-boundary rule:
    * streaming session_window is half-open) in OperatorPropertySpec.
    *
    * Determinism: counts and µs sums are exact integers; the two
    * per-session means use the established half-up integer-micro
    * division ((2a + n) div 2n, then one double divide by 10⁶).
    *
    * Scale shape: one user-partitioned lag window (parallel in
    * users), a ×4 per-row explode, map-side-combining aggregates to
    * 4 rows; count(DISTINCT user) rides the same shuffle. */
  val evSessionGapSweep: GQuery = {
    val gapsMin = sessionGapsMin
    GQuery("ev_session_gap_sweep",
      s"""WITH $sessionGapSweepCte
         |SELECT CAST(gap_min AS INT) AS gap_min,
         |  CAST(n_events AS BIGINT) AS n_events,
         |  CAST(n_sessions AS BIGINT) AS n_sessions,
         |  CAST((2 * n_events * 1000000 + n_sessions)
         |    // (2 * n_sessions) AS DOUBLE) / 1000000
         |    AS events_per_session,
         |  CAST((2 * in_us + n_sessions) // (2 * n_sessions) AS DOUBLE)
         |    / 1000000 AS avg_len_sec
         |FROM s1f ORDER BY gap_min""".stripMargin) { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("us"))
      val gapUs = col("gap_min").cast("long") * 60000000L
      // 4-row planning curve, memoized per (session, dir): the
      // standalone row and pipeline_knob_card share one
      // materialization (round-15 VERDICT item 7)
      graft.PlanCache.memo(s, dir, "session_gap_curve") {
        Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("us"))
          .withColumn("delta", col("us") - lag(col("us"), 1).over(byUser))
          .withColumn("gap_min",
            explode(array(gapsMin.map(g => lit(g)): _*)))
          .groupBy(col("gap_min"))
          .agg(count(lit(1)).as("n_events"),
            (countDistinct(col("user_id")) +
              sum(when(col("delta") >= gapUs, 1L).otherwise(0L)))
              .cast("bigint").as("n_sessions"),
            sum(when(col("delta").isNotNull && col("delta") < gapUs,
              col("delta")).otherwise(0L)).as("in_us"))
          .select(col("gap_min"), col("n_events"), col("n_sessions"),
            (expr("(2 * n_events * 1000000 + n_sessions)" +
              " div (2 * n_sessions)").cast("double") / 1000000)
              .as("events_per_session"),
            (expr("(2 * in_us + n_sessions) div (2 * n_sessions)")
              .cast("double") / 1000000).as("avg_len_sec"))
      }.orderBy(col("gap_min"))
    }
  }

  val all: Seq[GQuery] = Seq(evTumbling, evSliding, evSession,
    evDedupStream, evClickAttribution, evClickFunnel, evRetention,
    evTransitions, evAnomalyZscore, evGapFill, evFunnelSteps,
    evFunnelWindow, evUserPaths, evRollingActiveUsers, evConversionLag,
    evVelocityBurst, evAttributionLinear, evCohortLtv,
    evAttributionPosition, evAttributionDecay, evRfmSegmentation,
    evCumulativeUniques, evFeatureAsof, evNewVsReturning, evErrorBudget,
    evValueEma, evSeasonalityDow, evForecastBaseline,
    evActivityStreaks, evInterarrival, evGrowthAccounting, evStickiness,
    evHourlyHeatmap, evHoltForecast, evAbZtest, evSurvivalKm,
    evAbWelch, evUpliftCuped, evPowerAnalysis, evUserEntropy,
    evAbSrmCheck, evAbRatioDelta, evBotScore, evHoltWinters,
    evDidAnalysis, evRetentionHalflife, evAttributionMarkov, evAbSprt,
    evQuantileTe, evBanditUcb, evAttributionShapley, evLateData,
    evWatermarkSweep, evSessionGapSweep)
}
