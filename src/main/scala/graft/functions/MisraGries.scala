package graft.functions

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
  * Buffer is a bounded (≤ k entries) map + two scalars: the partial
  * aggregate each task ships is O(k) regardless of input size. The
  * summary also carries the exact stream length `n`, so one pass
  * yields both the candidate set and the threshold base.
  */
final class MisraGries(k: Int)
    extends Aggregator[String, MisraGries.Buf, MisraGries.Summary]
    with Serializable {
  require(k >= 1, s"capacity k ($k) must be >= 1")

  import MisraGries.{Buf, Summary}

  override def zero: Buf = Buf(Map.empty, 0L, 0L)

  override def reduce(b: Buf, a: String): Buf =
    b.m.get(a) match {
      case Some(c) => Buf(b.m.updated(a, c + 1L), b.debt, b.n + 1L)
      case None =>
        if (b.m.size < k) Buf(b.m.updated(a, b.debt + 1L), b.debt, b.n + 1L)
        else {
          // decrement-all, lazily: raise the shared debt floor and
          // evict counters that sank to it (the arriving item's own
          // +1 and −1 cancel — it is not inserted).
          val debt = b.debt + 1L
          Buf(b.m.filter(_._2 > debt), debt, b.n + 1L)
        }
    }

  override def merge(x: Buf, y: Buf): Buf = {
    val xm = x.m.map { case (t, c) => (t, c - x.debt) }
    val merged = y.m.foldLeft(xm) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + (c - y.debt))
    }
    val n = x.n + y.n
    if (merged.size <= k) Buf(merged, 0L, n)
    else {
      val cut = merged.values.toSeq.sorted(Ordering[Long].reverse)(k)
      Buf(merged.collect {
        case (t, c) if c > cut => (t, c - cut)
      }, 0L, n)
    }
  }

  override def finish(b: Buf): Summary =
    Summary(b.m.map { case (t, c) => (t, c - b.debt) }, b.n)

  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  override def outputEncoder: Encoder[Summary] = Encoders.kryo[Summary]
}

object MisraGries {
  /** counters are stored as (count + debt): a counter's true value is
    * `m(t) − debt`, so decrement-all never rewrites the map; `n` is
    * the exact number of elements folded in. */
  final case class Buf(m: Map[String, Long], debt: Long, n: Long)

  /** candidate → estimated count (true − n/(k+1) ≤ est ≤ true), plus
    * the exact stream length. */
  final case class Summary(cands: Map[String, Long], n: Long)
}
