package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGEABLE QUANTILE SKETCH tier — the saved-index treatment the
  * sim/dedup families got, applied to percentiles (round-14 VERDICT
  * item 6): per-slice sketch frames persist once, dashboards merge
  * saved sketches instead of re-scanning raw values.
  *
  * The sketch is the DDSketch construction (Masson, Rim & Lee, VLDB
  * 2019): positive values land in log-scaled buckets
  * `i = ⌈ln(v)/ln(γ)⌉` with `γ = (1+α)/(1−α)`, so bucket i covers
  * `(γ^(i−1), γ^i]` and the midpoint estimate `2γ^i/(γ+1)` is within
  * RELATIVE error α of every value in the bucket — hence within α of
  * the true q-quantile VALUE for every q, at any merge depth. Chosen
  * over KLL/t-digest because its state is a plain (bucket, count)
  * relation: building is one map-side-combining groupBy, merging is
  * ANOTHER groupBy-sum (bucket counts add — merge is EXACT, not
  * approximate: sketch(A ∪ B) ≡ merge(sketch(A), sketch(B))
  * bucket-for-bucket, spec-pinned), and both engines-of-record
  * (parquet, the DataFrame API) already know how to shuffle it. No
  * custom binary state, no UDAF, fully codegen'd.
  *
  * Scale shape: sketch state per group is O(ln(range)/α) buckets
  * (~550 at α = 0.02 over a 5-decade range) regardless of row count;
  * the quantile readout is one bounded per-group cumulative window
  * over those buckets. At 100 TB the per-slice build is the only
  * full scan, and it happens once per slice — the serving merge
  * reads sketch rows only. */
object Sketch {

  /** γ for accuracy α. */
  def gamma(alpha: Double): Double = (1 + alpha) / (1 - alpha)

  /** The DDSketch bucket index of a positive value column. */
  def ddIndex(value: Column, alpha: Double): Column =
    ceil(log(value) / log(lit(gamma(alpha)))).cast("int")

  /** Sketch `df`: one (groupCols…, bkt, cnt) row per non-empty
    * bucket. Non-positive values are excluded (DDSketch's domain;
    * callers with signed data sketch the two signs separately). */
  def ddSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      alpha: Double): DataFrame =
    df.filter(col(valueCol) > 0)
      .groupBy(groupCols.map(col) :+
        ddIndex(col(valueCol), alpha).as("bkt"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge sketch rows (any number of slices, any order — counts
    * add) down to one sketch per group. */
  def ddMerge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col) :+ col("bkt"): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantile readout from a (merged) sketch: for each q in `qs`,
    * the midpoint estimate of the bucket holding rank ⌈q·n⌉ (rank 1
    * = smallest). Output: (groupCols…, q, estimate, n). The
    * cumulative window runs over each group's ≤ O(ln(range)/α)
    * bucket rows — bounded state, never corpus-sized. */
  def ddQuantiles(sketch: DataFrame, groupCols: Seq[String],
      qs: Seq[Double], alpha: Double): DataFrame = {
    val g = gamma(alpha)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(groupCols.map(col): _*)
    val cum = sketch
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wn))
    val est = (pow(lit(g), col("bkt")) * lit(2.0) / (g + 1)).as("estimate")
    val perQ = qs.map { q =>
      cum.withColumn("q", lit(q))
        .filter(col("cum") >= ceil(lit(q) * col("n")))
        .withColumn("rn", row_number().over(
          Window.partitionBy(groupCols.map(col): _*).orderBy(col("bkt"))))
        .filter(col("rn") === 1)
        .select(groupCols.map(col) ++
          Seq(col("q"), est, col("n")): _*)
    }
    perQ.reduce(_.unionByName(_))
  }
}
