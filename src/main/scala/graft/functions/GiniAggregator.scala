package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF demo (SURVEY.md §2.10): Gini impurity of a label column,
  * 1 − Σ pᵢ². Buffer is a bounded count map (≤ distinct labels), so
  * partial aggregation keeps the shuffle payload tiny at any scale.
  * Registered with `spark.udf.register("gini", udaf(GiniAggregator))`.
  */
object GiniAggregator extends Aggregator[Int, Map[Int, Long], Double] {
  override def zero: Map[Int, Long] = Map.empty

  override def reduce(b: Map[Int, Long], a: Int): Map[Int, Long] =
    b.updated(a, b.getOrElse(a, 0L) + 1L)

  override def merge(x: Map[Int, Long], y: Map[Int, Long]): Map[Int, Long] =
    y.foldLeft(x) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v) }

  override def finish(counts: Map[Int, Long]): Double = {
    val n = counts.values.sum.toDouble
    if (n == 0) 0.0
    else 1.0 - counts.values.map { c => val p = c / n; p * p }.sum
  }

  override def bufferEncoder: Encoder[Map[Int, Long]] =
    Encoders.kryo[Map[Int, Long]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
