package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event-time queries in
  * graft.operators.EventQueries (SURVEY.md §2.9). Each transform takes
  * any events-shaped frame (batch OR streaming: same DataFrame API) so
  * EventStreamsSpec can assert batch ≡ streaming on the same finite
  * input via MemoryStream.
  *
  * Watermarks bound the state store: a 1-hour watermark means window
  * state older than (max event time − 1 h) is finalized and evicted —
  * the property that makes these queries runnable forever on an
  * unbounded 100 TB/day stream. Output mode is Append: a window emits
  * exactly once, when the watermark passes its end.
  */
object EventStreams {

  /** 1-day tumbling counts+sums per event type. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** 1-day windows sliding every 6 hours. */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day", "6 hours").as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("win.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Per-user sessions with a 30-minute inactivity gap — the native
    * streaming form of the batch gaps-and-islands query. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("win"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("win.start").as("session_start"),
        col("win.end").as("session_end"), col("n_events"))

  /** Drop duplicate event ids with watermark-bounded dedup state. */
  def dedup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** The rows a `delay` watermark lets THROUGH — the streaming
    * surface EventStreamsSpec pins the `ev_late_data` batch audit
    * against. Plain `dropDuplicates` over the (unique) event id is
    * the stateful operator whose late-row filter is exactly the
    * row-level watermark rule: a row older than the current watermark
    * (= max event time of prior batches − delay) is dropped before it
    * reaches state; everything else passes once. On unique ids
    * nothing else is filtered, so output = survivors. */
  def lateSurvivors(events: DataFrame,
      delay: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", delay).dropDuplicates("event_id")

  /** STREAM-STREAM interval join: attribute each click to the same
    * user's preceding view within a 1-hour attribution window.
    *
    * Both inputs are unbounded, so both carry watermarks and the join
    * condition carries a TIME BOUND (`c.ts BETWEEN v.ts AND v.ts + 1h`)
    * — that pair is what lets Spark evict buffered rows: a view older
    * than (watermark − 1 h) can never match a future click and its
    * state is dropped. Without the bound, both sides would buffer
    * forever — the unbounded-state shape that cannot run on a
    * 100 TB/day stream. Inner join in Append mode: a pair emits once,
    * when both sides have arrived and the watermark admits it.
    *
    * Works identically on batch frames (same DataFrame API), which is
    * how EventStreamsSpec pins streaming ≡ batch. */
  def clickAttribution(views: DataFrame, clicks: DataFrame): DataFrame =
    views.withWatermark("ts", "1 hour").alias("v")
      .join(
        clicks.withWatermark("ts", "1 hour").alias("c"),
        expr("""v.user_id = c.user_id
                AND c.ts >= v.ts
                AND c.ts <= v.ts + interval 1 hour"""))
      .select(col("v.user_id").as("user_id"),
        col("v.event_id").as("view_id"),
        col("c.event_id").as("click_id"),
        col("v.ts").as("view_ts"), col("c.ts").as("click_ts"))

  /** LEFT OUTER stream-stream interval join: every view, with its
    * attributed click where one exists and nulls where none does —
    * the funnel-analysis shape (conversion AND abandonment from one
    * query).
    *
    * The outer side is the semantically hard part of streaming joins:
    * "no matching click" is only decidable once the click-side
    * watermark has passed the end of the view's 1-hour attribution
    * window, so unmatched views emit LATE — exactly at watermark
    * passage, from evicted state. On a finite test input that means
    * the tail views (those the final watermark never passes) stay
    * buffered; EventStreamsSpec advances the watermark with a
    * sentinel event and compares the emitted prefix against batch.
    * Same time-bound condition as [[clickAttribution]], so state
    * eviction is identical — the outer join adds no unbounded
    * state. */
  def clickAttributionWithUnmatched(views: DataFrame,
      clicks: DataFrame): DataFrame =
    views.withWatermark("ts", "1 hour").alias("v")
      .join(
        clicks.withWatermark("ts", "1 hour").alias("c"),
        expr("""v.user_id = c.user_id
                AND c.ts >= v.ts
                AND c.ts <= v.ts + interval 1 hour"""),
        "left_outer")
      .select(col("v.user_id").as("user_id"),
        col("v.event_id").as("view_id"),
        col("c.event_id").as("click_id"),
        col("v.ts").as("view_ts"), col("c.ts").as("click_ts"))

  /** Streaming twin of ev_transitions' sequence step: per-user
    * consecutive (from_type, to_type) event pairs, emitted as
    * arrivals extend each user's timeline. State per key is ONE
    * (ts, event_id, type) triple — the last event seen — so the
    * state store holds a constant per user forever. Within a batch,
    * rows are sorted by (ts, event_id) before folding (Spark does not
    * order iterator rows); equality with the batch lead() window
    * holds when arrivals respect event order ACROSS batches — the
    * kafka-partition-per-user deployment this models (pinned in
    * EventStreamsSpec on ordered feeds). The transition COUNTS roll
    * up downstream exactly as in the batch query. */
  case class Transition(user_id: Long, from_type: String,
      to_type: String)

  /** Streaming twin of the batch N-step funnel
    * (graft.api.Events.funnel): per-user CURRENT STAGE maintained as
    * keyed state, advanced by a greedy in-order walk — stage k
    * advances at the FIRST step-k event strictly after the stage-
    * (k−1) time (and within `maxDelayUs` of it when set). The greedy
    * walk equals the batch min-based definition because the earliest
    * qualifying step-k event IS the first one an in-order walk meets;
    * once an arrival overshoots a conversion window every later one
    * does too, so skipping it is exact, not an approximation.
    *
    * State per user is two numbers (stage, prev-time) — constant
    * regardless of history length. Emits (user, stage) whenever a
    * batch advances the user; the LAST emission per user is their
    * final stage, and stage counts roll up as
    * count(stage >= k) ≡ batch step-k n_users (pinned in
    * EventStreamsSpec on ordered feeds, the same across-batch order
    * contract as [[transitions]]). */
  case class FunnelAdvance(user_id: Long, stage: Int)

  def funnelStage[E](events: Dataset[E], uid: E => Long,
      ts: E => (Long, Long), typ: E => String, steps: Seq[String],
      maxDelayUs: Option[Long] = None): Dataset[FunnelAdvance] = {
    require(steps.nonEmpty, "funnelStage: empty step list")
    import events.sparkSession.implicits._
    events.groupByKey(uid)
      .flatMapGroupsWithState[(Int, Long), FunnelAdvance](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[E], state: GroupState[(Int, Long)]) =>
          val sorted = rows.toSeq.sortBy(ts)
          var (k, prev) = state.getOption.getOrElse((0, Long.MinValue))
          val before = k
          sorted.foreach { e =>
            if (k < steps.size && typ(e) == steps(k)) {
              val t = ts(e)._1
              val ok =
                if (k == 0) true
                else t > prev && maxDelayUs.forall(d => t <= prev + d)
              if (ok) { k += 1; prev = t }
            }
          }
          if (k > before) {
            state.update((k, prev))
            Iterator.single(FunnelAdvance(user, k))
          } else Iterator.empty
      }
  }

  case class GrowthMark(user_id: Long, epoch_day: Long, cls: String)

  /** GROWTH-ACCOUNTING classification as keyed streaming state — the
    * streaming twin of ev_growth_accounting's per-(user, day) labels:
    * state is TWO numbers per user (first-seen day, last-active day);
    * each newly seen activity day emits `new` (first ever),
    * `retained` (previous calendar day active) or `resurrected`
    * (gap > 1 day). On ordered feeds the drained marks aggregate to
    * exactly the batch matrix's new/retained/resurrected columns
    * (churned is a derived batch readout: dau(d−1) − retained(d) —
    * the same identity the batch query uses). Days at or before the
    * last-active day are late duplicates and emit nothing, so
    * re-delivery is idempotent and the output is split-independent
    * on ordered delivery (EventStreamsSpec pins one-batch ≡ splits).
    *
    * @param day event → epoch-day of its activity */
  def growthAccounting[E](events: Dataset[E], uid: E => Long,
      day: E => Long): Dataset[GrowthMark] = {
    import events.sparkSession.implicits._
    events.groupByKey(uid)
      .flatMapGroupsWithState[(Long, Long), GrowthMark](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[E], state: GroupState[(Long, Long)]) =>
          val days = rows.map(day).toSeq.distinct.sorted
          var (first, last) =
            state.getOption.getOrElse((Long.MinValue, Long.MinValue))
          val out = Seq.newBuilder[GrowthMark]
          days.foreach { d =>
            if (d > last) {
              val cls =
                if (first == Long.MinValue) "new"
                else if (d == last + 1) "retained"
                else "resurrected"
              if (first == Long.MinValue) first = d
              last = d
              out += GrowthMark(user, d, cls)
            }
          }
          if (first != Long.MinValue) state.update((first, last))
          out.result().iterator
      }
  }

  def transitions[E](events: Dataset[E], uid: E => Long,
      ts: E => (Long, Long), typ: E => String): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(uid)
      .flatMapGroupsWithState[(Long, Long, String), Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[E],
            state: GroupState[(Long, Long, String)]) =>
          val sorted = rows.toSeq.sortBy(ts)
          var prev = state.getOption
          val out = Seq.newBuilder[Transition]
          sorted.foreach { e =>
            prev.foreach { case (_, _, t0) =>
              out += Transition(user, t0, typ(e))
            }
            val (t, i) = ts(e)
            prev = Some((t, i, typ(e)))
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }

  /** Per-user running counts whose keyed state EXPIRES after `ttlMs`
    * of event-time inactivity (EventTimeTimeout + the input's
    * watermark): a user who goes quiet longer than the TTL is evicted
    * from the state store, and a later return starts from zero. This
    * is the property that keeps explicit keyed state BOUNDED on an
    * unbounded user universe — without a TTL, one-visit users
    * accumulate forever and the state store, not the data, becomes
    * the scale limit. Emits (user_id, n) per batch with data; timed
    * out keys are removed silently.
    *
    * `lateness` is the watermark delay: events arriving more than
    * this far behind the max seen event time are DROPPED before the
    * state function ever sees them (standard watermark semantics —
    * the price of state eviction). The default 1 s suits ordered test
    * feeds; a real deployment should pass its out-of-orderness bound.
    * Column names default to the fixture's (user_id, ts) and are
    * parameters for other schemas. */
  def runningCountsWithTtl(events: DataFrame, ttlMs: Long,
      lateness: String = "1 second", userCol: String = "user_id",
      tsCol: String = "ts"): Dataset[(Long, Long)] = {
    // fail fast: a non-positive TTL would compute timeout timestamps
    // at/below the watermark, killing the query mid-stream with an
    // engine error instead of an argument error
    require(ttlMs > 0, s"ttlMs ($ttlMs) must be positive")
    import events.sparkSession.implicits._
    events
      .withWatermark(tsCol, lateness)
      .select(col(userCol).cast("long"), col(tsCol))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp)],
            state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq
            val n = state.getOption.getOrElse(0L) + batch.size
            state.update(n)
            state.setTimeoutTimestamp(
              batch.map(_._2.getTime).max + ttlMs)
            Iterator((uid, n))
          }
      }
  }

  /** Per-user lifetime stats via explicit keyed state
    * (`flatMapGroupsWithState`) — the custom-state escape hatch for
    * semantics no built-in window covers. State per key is one
    * (count, sum) pair, so a billion users is a billion tiny state
    * entries in the state store, updated incrementally per batch. */
  case class AbMark(user_id: Long, variant: Int, kind: String)

  /** The Scala spelling of graft.api.Sampling.portableHash — MD5 of
    * (salt + id), first 12 hex chars as a 48-bit non-negative long —
    * so keyed streaming state can bucket users EXACTLY as the batch
    * sampling and A/B queries do (spec-pinned against the Column
    * form). */
  def portableHash(id: Long, salt: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest((salt + id.toString).getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(6).map(b => f"${b & 0xff}%02x").mkString, 16)
  }

  /** A/B EXPERIMENT MARKS as keyed streaming state — the streaming
    * twin of ev_ab_ztest's counting stage: per user, one `exposure`
    * mark on first sight (denominator) and at most one `conversion`
    * mark on the first qualifying event (numerator), with the arm
    * assigned by the SAME portable hash as the batch query (salt
    * `ab:`). State is one boolean per user; duplicate and late
    * qualifying events emit nothing, so the drained mark SET is
    * independent of micro-batch splitting and delivery order, and
    * the z-test is recomputable from the sink at any time:
    * n_arm = exposures, conv_arm = conversions (EventStreamsSpec pins
    * the drained counts against ev_ab_ztest's row).
    *
    * @param qualifies the conversion predicate (the batch query's
    *                  "purchase with value > 100") */
  def abMarks[E](events: Dataset[E], uid: E => Long,
      qualifies: E => Boolean): Dataset[AbMark] = {
    import events.sparkSession.implicits._
    events.groupByKey(uid)
      .flatMapGroupsWithState[Boolean, AbMark](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[E], state: GroupState[Boolean]) =>
          val variant = (portableHash(user, "ab:") % 2).toInt
          val out = Seq.newBuilder[AbMark]
          val seen = state.getOption
          if (seen.isEmpty) out += AbMark(user, variant, "exposure")
          val converted = seen.getOrElse(false)
          val convertsNow = !converted && rows.exists(qualifies)
          if (convertsNow) out += AbMark(user, variant, "conversion")
          state.update(converted || convertsNow)
          out.result().iterator
      }
  }

  case class BotSignal(user_id: Long, n_gaps: Long,
      cv_gap: Option[Double])

  /** RUNNING BOT-SIGNAL state — the streaming twin of ev_bot_score's
    * timing-regularity column: per user, the inter-event-gap moments
    * (count, Σgap, Σgap²) as keyed state, emitting the updated
    * coefficient of variation after every batch. Σgap² exceeds Long
    * range (a 90-day gap² ≈ 6·10²⁵), so the state carries it as a
    * BigInt STRING — exact integer arithmetic end-to-end, which is
    * what lets the drained CV equal the batch query's DECIMAL-exact
    * value bit-for-bit (same double ops in the same order at readout).
    * Within a batch rows sort by (ts, event_id) and the state bridges
    * from the previous batch's last event, so any split of the
    * ts-ordered stream drains to the same final row per user (spec
    * pins two different batchings against ev_bot_score).
    *
    * Scale shape: state is O(1) per user (4 scalars + 2 short
    * strings); a billion users is a billion tiny state entries
    * updated incrementally — no re-scan of history, ever. */
  def botSignals[E](events: Dataset[E], uid: E => Long,
      tsUs: E => Long, eid: E => Long): Dataset[BotSignal] = {
    import events.sparkSession.implicits._
    // state: (lastUs, lastId, nGaps, sumGap, sumGapSq-as-BigInt-string)
    events.groupByKey(uid)
      .flatMapGroupsWithState[(Long, Long, Long, Long, String), BotSignal](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[E],
            state: GroupState[(Long, Long, Long, Long, String)]) =>
          val sorted = rows.toSeq.sortBy(e => (tsUs(e), eid(e)))
          if (sorted.isEmpty) Iterator.empty
          else {
            var (lastUs, lastId, n, sg, qgStr) =
              state.getOption.getOrElse((Long.MinValue, 0L, 0L, 0L, "0"))
            var qg = BigInt(qgStr)
            sorted.foreach { e =>
              if (lastUs != Long.MinValue) {
                val gap = tsUs(e) - lastUs
                n += 1; sg += gap; qg += BigInt(gap) * BigInt(gap)
              }
              lastUs = tsUs(e); lastId = eid(e)
            }
            state.update((lastUs, lastId, n, sg, qg.toString))
            // readout matches the batch column expression op-for-op:
            // sqrt((qgD - sgD*sgD/n)/(n-1)) / (sgD/n), rounded to 6
            val cv = if (n >= 2) {
              val nD = n.toDouble
              val sgD = sg.toDouble
              val raw = math.sqrt((qg.toDouble - sgD * sgD / nD)
                / (nD - 1)) / (sgD / nD)
              Some(BigDecimal(raw)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
            } else None
            Iterator(BotSignal(user, n, cv))
          }
      }
  }

  case class UserStats(user_id: Long, n_events: Long, total_value: Double)

  def runningUserStats[E](events: Dataset[E], uid: E => Long,
      value: E => Double): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(uid)
      .flatMapGroupsWithState[(Long, Double), UserStats](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[E], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0
          var s = s0
          rows.foreach { e => n += 1; s += value(e) }
          state.update((n, s))
          Iterator(UserStats(user, n, s))
      }
  }
}
