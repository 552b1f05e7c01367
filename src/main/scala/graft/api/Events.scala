package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Public event-analytics kernels, parameterized on caller column
  * names (the [[Dedup]]/[[Text]] module convention).
  */
object Events {

  /** Per-user times of an N-step ORDERED funnel: for `steps =
    * Seq(a, b, c, ...)`, a user reaches step n when their earliest
    * step-n event falls STRICTLY after their step-(n−1) time —
    * sequence semantics, not co-occurrence. Returns one row per user
    * who completed at least step 1: (user, t1, t2, ..., tN) with a
    * null tk once the sequence breaks.
    *
    * Scale shape (the `ev_funnel_steps` contract plan, generalized):
    * stage k collapses to ≤1 row per user (map-side-combining min)
    * BEFORE stage k+1's equi-join consumes it, the event scan carries
    * a pushed type filter per stage, and depth is one more
    * filter+join+min — never a pivot, never a per-user sort. The
    * left joins preserving earlier-stage users are per-user-unique on
    * both sides, so no fan-out.
    */
  def funnelTimes(events: DataFrame, user: String, typ: String,
      ts: String, steps: Seq[String],
      maxDelay: Option[String] = None): DataFrame = {
    require(steps.nonEmpty, "Events.funnelTimes: empty step list")
    val first = events.filter(col(typ) === steps.head)
      .groupBy(col(user)).agg(min(col(ts)).as("t1"))
    steps.tail.zipWithIndex.foldLeft(first) { case (acc, (step, i)) =>
      val k = i + 2
      // conversion window: step k must land within maxDelay of step
      // k−1 (an attribution bound), else only strictly after it. The
      // bound rides the same equi-join as a residual conjunct — it
      // never changes the plan shape, exactly like the interval-join
      // time bound in ev_click_attribution.
      val inWindow = maxDelay match {
        case Some(d) =>
          col("__ts") <= col("__prev") + expr(s"INTERVAL $d")
        case None => lit(true)
      }
      val next = events.filter(col(typ) === step)
        .select(col(user), col(ts).as("__ts"))
        .join(acc.select(col(user), col(s"t${k - 1}").as("__prev"))
          .filter(col("__prev").isNotNull), Seq(user))
        .filter(col("__ts") > col("__prev") && inWindow)
        .groupBy(col(user)).agg(min(col("__ts")).as(s"t$k"))
      acc.join(next, Seq(user), "left")
    }
  }

  /** The funnel REPORT: (step, stage, n_users) — stage k's label is
    * the '>'-joined step prefix, n_users the count that reached it.
    * One row per step, step ascending; a funnel can only narrow. */
  def funnel(events: DataFrame, user: String, typ: String, ts: String,
      steps: Seq[String], maxDelay: Option[String] = None): DataFrame = {
    val times = funnelTimes(events, user, typ, ts, steps, maxDelay)
    steps.indices.map { i =>
      val k = i + 1
      times.filter(col(s"t$k").isNotNull)
        .agg(count(lit(1)).as("n_users"))
        .select(lit(k).as("step"),
          lit(steps.take(k).mkString(">")).as("stage"), col("n_users"))
    }.reduce(_ unionAll _).orderBy(col("step"))
  }
}
