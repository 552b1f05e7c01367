package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitters summary (Misra & Gries 1982;
  * merge rule per Agarwal et al., "Mergeable Summaries", PODS 2012):
  * at most `k` counters; any item with true frequency > n/(k+1) is
  * GUARANTEED a surviving counter, so the finished key set is a
  * superset of every item with frequency > n/k — false negatives are
  * impossible, which is what lets an exact-verify second pass produce
  * provably exact heavy hitters without ever shuffling the full term
  * cardinality.
  *
  * reduce: classic MG — hit increments; miss inserts if a counter is
  * free, else decrements all (via the shared `debt` floor, so a
  * decrement never rewrites surviving counters — only the ones that
  * sank to zero are dropped).
  * merge: normalize both sides to true counts, add, then subtract the
  * (k+1)-th largest count from all and drop non-positives — the
  * mergeability construction.
  *
  * The buffer is a MUTABLE bounded map (≤ k entries) + two scalars,
  * updated in place: Spark Aggregators own their buffer between
  * serialization points, so the per-element hot path (this runs once
  * per token of the full stream) allocates nothing on a hit or an
  * insert; only a miss-when-full pays the O(k) eviction sweep, and
  * each sweep retires ≥ 1 full debt unit across k+1 stream elements.
  * The partial aggregate each task ships is O(k) regardless of input
  * size. The summary also carries the exact stream length `n`, so one
  * pass yields both the candidate set and the threshold base.
  */
final class MisraGries(k: Int)
    extends Aggregator[String, MisraGries.Buf, MisraGries.Summary]
    with Serializable {
  require(k >= 1, s"capacity k ($k) must be >= 1")

  import MisraGries.{Buf, Summary}

  override def zero: Buf = new Buf(mutable.HashMap.empty, 0L, 0L)

  override def reduce(b: Buf, a: String): Buf = {
    b.n += 1L
    b.m.get(a) match {
      case Some(c) => b.m(a) = c + 1L
      case None =>
        if (b.m.size < k) b.m(a) = b.debt + 1L
        else {
          // decrement-all, lazily: raise the shared debt floor and
          // evict counters that sank to it (the arriving item's own
          // +1 and −1 cancel — it is not kept).
          b.debt += 1L
          b.m.filterInPlace((_, c) => c > b.debt)
        }
    }
    b
  }

  override def merge(x: Buf, y: Buf): Buf = {
    val merged = mutable.HashMap.empty[String, Long]
    x.m.foreach { case (t, c) => merged(t) = c - x.debt }
    y.m.foreach { case (t, c) =>
      merged(t) = merged.getOrElse(t, 0L) + (c - y.debt)
    }
    val n = x.n + y.n
    if (merged.size > k) {
      val cut = merged.values.toSeq.sorted(Ordering[Long].reverse)(k)
      merged.filterInPlace((_, c) => c > cut)
      merged.mapValuesInPlace((_, c) => c - cut)
    }
    new Buf(merged, 0L, n)
  }

  override def finish(b: Buf): Summary =
    Summary(b.m.map { case (t, c) => (t, c - b.debt) }.toMap, b.n)

  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  override def outputEncoder: Encoder[Summary] = Encoders.kryo[Summary]
}

object MisraGries {
  /** counters are stored as (count + debt): a counter's true value is
    * `m(t) − debt`, so decrement-all never rewrites surviving
    * counters. Mutable by design — see the class note. */
  final class Buf(val m: mutable.HashMap[String, Long], var debt: Long,
      var n: Long) extends Serializable

  /** candidate → estimated count (true − n/(k+1) ≤ est ≤ true), plus
    * the exact stream length. */
  final case class Summary(cands: Map[String, Long], n: Long)
}
