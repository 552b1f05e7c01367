package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Ckpt.CkptOps

/** Public coarse k-means over vector frames — the quantizer behind
  * `mining_kmeans` and the IVF index ([[Similarity.ivfBuild]]).
  *
  * Column contract (fixed, unlike the caller-named id/text modules:
  * these frames are engine-internal intermediates): input is
  * `(vec_id, v: array<double>)`; centers are `(cid: int,
  * c: array<double>)`; assignments add `cid` (and `d2`).
  *
  * Scale shape: every operation is one k-row center broadcast plus
  * map-side-combining aggregates — nothing quadratic, nothing
  * corpus-cardinality on a build side.
  */
object VecKMeans {

  /** squared euclidean distance via the codegen'd dot products. */
  private[graft] val d2 = "vec_dot(v, v) - 2 * vec_dot(v, c) + vec_dot(c, c)"

  /** nearest-center assignment: min over (distance², center id),
    * evaluated as ONE per-row codegen'd argmin over the cid-sorted
    * center array (vec_argmin_code — bit-identical d2 arithmetic and
    * tie-break to the former k-way candidate join + min(struct)
    * aggregate, see the expression's scaladoc). The former form paid
    * a k× row explosion AND a full-corpus exchange (the groupBy on
    * vec_id, carrying the vector through first()); this form is a
    * pure projection — at scale it removes one corpus shuffle per
    * Lloyd round. The winner's d2 is recomputed by a k-row broadcast
    * rejoin with the exact same `d2` expression — identical doubles,
    * so inertia sums (mining_kmeans) are unchanged.
    *
    * Contract notes: exactly one output row per INPUT row — duplicate
    * vec_ids pass through undeduped (callers own id uniqueness; the
    * pre-r11 join form's groupBy collapsed them as a side effect, not
    * as a promise). Empty `centers` is an error, caught eagerly with
    * a clear message rather than surfacing as an executor-side
    * empty-codebook throw. */
  def assign(e: DataFrame, centers: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.register(e.sparkSession)
    e.crossJoin(broadcast(codebook(centers)))
      .withColumn("cid", expr("vec_argmin_code(v, cbs)"))
      .drop("cbs")
      .join(broadcast(centers), Seq("cid"))
      .withColumn("d2", expr(d2))
      .select(col("vec_id"), col("v"), col("cid"), col("d2"))
  }

  /** new centers: per-dimension mean via posexplode + groupBy — one
    * map-side-combining aggregate, no per-group array building until
    * the k×dims collect at the end.
    *
    * Each dimension is rounded to 8 places (the [[Graph.pageRank]]
    * per-iteration discipline): double summation is order-dependent,
    * so without the round an engine replaying the same Lloyd rounds
    * sequentially (the DuckDB oracle behind `mining_kmeans` /
    * `dedup_semantic`) drifts a few ULPs per round; rounding resets
    * the drift each round so assignments — and therefore the trained
    * quantizer — are reproducible cross-engine. At 8 places the
    * perturbation (≤ 5e-9 per dimension) is far below any cluster
    * geometry the quantizer can resolve. */
  def recenter(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos")).agg(round(avg(col("x")), 8).as("m"))
      .groupBy(col("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
        .as("c"))

  /** top-n nearest centers per vector (IVF multi-cell probing): one
    * per-row codegen'd `vec_argmin_topn` projection over the
    * cid-sorted center array — same (d2, cid) order the former k-way
    * candidate join + row_number window produced (the expression's
    * scaladoc carries the bit-parity argument), but the probe frame
    * never explodes k× and the per-vec_id window exchange is gone:
    * the same plan-shape win [[assign]] got from vec_argmin_code. */
  def assignTopN(e: DataFrame, centers: DataFrame, n: Int,
      carry: Seq[String] = Nil): DataFrame = {
    graft.functions.VectorExpressions.register(e.sparkSession)
    // `carry`: extra columns of `e` preserved through the assignment
    // projection — a STREAM caller cannot join them back afterwards
    // (two derivations of one stream = a stream-stream join), so the
    // attributed serving twins thread them through here.
    e.crossJoin(broadcast(codebook(centers)))
      .select(Seq(col("vec_id"), col("v")) ++ carry.map(col) :+
        explode(expr(s"vec_argmin_topn(v, cbs, $n)")).as("cid"): _*)
  }

  /** the k-row center set as ONE cid-sorted codebook array row (the
    * broadcast side of both assignment projections), with the eager
    * empty-centers guard both assignments share. */
  private def codebook(centers: DataFrame): DataFrame = {
    require(centers.limit(1).count() == 1,
      "VecKMeans: empty centers frame — train/seed produced no centers")
    centers.agg(sort_array(collect_list(struct(col("cid"), col("c"))))
      .as("cbs"))
  }

  /** fixed-round Lloyd training, deterministic smallest-id seeds.
    * Center ids are the DENSE RANK of the seed (0..k−1), never a cast
    * of the caller's id value — string ids would cast to null (one
    * degenerate all-null cluster) and >2³¹ longs would wrap and
    * collide, both silently. Checkpoints the k-row center frame each
    * round: materializing k×dims doubles is free, and it keeps the
    * unrolled plan SHALLOW — without it every round re-plans (and
    * re-codegens) the whole preceding lineage, which dominates wall
    * time at small k. */
  def train(e: DataFrame, k: Int, rounds: Int): DataFrame = {
    val seed = seedCenters(e, k)
    (1 to rounds).foldLeft(seed) { (cs, _) =>
      recenter(assign(e, cs)).ckpt()
    }
  }

  /** (cid: int 0..k−1, c): the k smallest-id rows as seed centers,
    * cid = rank among the seeds (id-type-agnostic). */
  private[graft] def seedCenters(e: DataFrame, k: Int): DataFrame = {
    val w = Window.orderBy(col("vec_id"))
    // the global single-partition window touches only the k-row limit
    e.orderBy(col("vec_id")).limit(k)
      .select((row_number().over(w) - 1).cast("int").as("cid"),
        col("v").as("c"))
  }
}
