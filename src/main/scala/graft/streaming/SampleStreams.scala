package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Structured Streaming twins of the deterministic samplers in
  * graft.api.Sampling (SURVEY.md §2.11 round-3 note c).
  *
  * Hash-Bernoulli is a pure per-row predicate — STATELESS, so the
  * batch implementation runs unchanged on a streaming frame (the
  * delegate below exists to document that fact and pin it in
  * SampleStreamsSpec). The stratified reservoir is NOT stateless (the
  * batch form is a window top-k); its streaming form keeps the k
  * smallest (hash, id) pairs per stratum in keyed state and emits the
  * stratum's current sample each batch — at end-of-input the state
  * holds exactly the batch sample, because "k smallest by (hash, id)"
  * is an online-computable order statistic: merging per-batch
  * candidates can never evict a true member.
  */
object SampleStreams {

  /** stateless — identical code path for batch and streaming. */
  def hashBernoulli(df: DataFrame, id: String, modulus: Int,
      salt: String = "smp:"): DataFrame =
    graft.api.Sampling.hashBernoulli(df, id, modulus, salt)

  /** stateless (per-row projection + explode) — identical code path
    * for batch and streaming: up-/down-sampling a live feed into the
    * training mixture needs no state either. */
  def mixtureReplicated(df: DataFrame, id: String, group: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame =
    graft.api.Sampling.mixtureReplicated(df, id, group, rates,
      defaultRate)

  /** stateless (per-row projection) — identical code path for batch
    * and streaming: split membership is a pure hash function of the
    * id, so a live feed labels arrivals train/val/test exactly as a
    * later batch re-read would. */
  def splitAssign(df: DataFrame, id: String,
      splits: Seq[(String, Int)] = Seq("train" -> 8, "val" -> 1,
        "test" -> 1)): DataFrame =
    graft.api.Sampling.splitAssign(df, id, splits)

  /** one output row per stratum per batch: the current sample ids,
    * ordered by the same (salted hash, id) key the batch sampler
    * sorts on. */
  case class StratumSample(stratum: String, sample_ids: Seq[Long])

  /** streaming per-stratum deterministic reservoir (Update mode). */
  def stratifiedTopK(events: DataFrame, stratum: String, id: String,
      k: Int, salt: String = "str:"): Dataset[StratumSample] = {
    import events.sparkSession.implicits._
    val keyed = events.select(
      col(stratum).cast("string").as("s"),
      col(id).cast("long").as("i"),
      graft.api.Sampling.portableHash(col(id), salt).as("h"))
      .as[(String, Long, Long)]
    keyed.groupByKey(_._1)
      .mapGroupsWithState[Seq[(Long, Long)], StratumSample](
        GroupStateTimeout.NoTimeout) {
        (s: String, rows: Iterator[(String, Long, Long)],
            state: org.apache.spark.sql.streaming.GroupState[Seq[(Long, Long)]]) =>
          val merged = (state.getOption.getOrElse(Seq.empty) ++
            rows.map(r => (r._3, r._2))).distinct.sorted.take(k)
          state.update(merged)
          StratumSample(s, merged.map(_._2))
      }
  }
}
