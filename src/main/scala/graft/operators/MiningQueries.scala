package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GQuery, PlanCache}
import graft.sources.Tables

/** Data-mining staples of the big-data-coursework genre (SURVEY.md
  * §2.11 extras): market-basket co-occurrence and k-means clustering.
  *
  * Both are plain DataFrame plans so Catalyst owns the physical
  * strategy; k-means unrolls a FIXED number of Lloyd rounds
  * (deterministic hash-free init: the k smallest vec_ids), keeping
  * the whole computation declarative.
  */
object MiningQueries {

  /** Market-basket: top-3 co-purchased part brands per brand by
    * basket count (self-join of distinct (order, brand) pairs — the
    * classic co-occurrence shape; the per-order fan-out is bounded by
    * lines-per-order, so the join is near-linear). */
  val miningCopurchase: GQuery = GQuery(
    "mining_copurchase",
    """WITH ob AS (
      |  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      |co AS (
      |  SELECT a.brand AS brand, b.brand AS other,
      |    count(*) AS n_baskets
      |  FROM ob a JOIN ob b
      |    ON a.okey = b.okey AND a.brand <> b.brand
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT brand, other, n_baskets,
      |    row_number() OVER (PARTITION BY brand
      |      ORDER BY n_baskets DESC, other) AS rk
      |  FROM co)
      |SELECT brand, rk, other, CAST(n_baskets AS BIGINT) AS n_baskets
      |FROM ranked WHERE rk <= 3
      |ORDER BY brand, rk""".stripMargin) { (s, dir) =>
    val ob = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("okey"), col("l_partkey"))
      .join(Tables.part(s, dir)
        .select(col("p_partkey").as("l_partkey"), col("p_brand").as("brand")),
        Seq("l_partkey"))
      .select(col("okey"), col("brand")).distinct()
    val co = ob.select(col("okey"), col("brand"))
      .join(ob.select(col("okey"), col("brand").as("other")), Seq("okey"))
      .filter(col("brand") =!= col("other"))
      .groupBy(col("brand"), col("other"))
      .agg(count(lit(1)).as("n_baskets"))
    val w = Window.partitionBy(col("brand"))
      .orderBy(col("n_baskets").desc, col("other"))
    co.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("brand"), col("rk"), col("other"),
        col("n_baskets").cast("bigint").as("n_baskets"))
      .orderBy(col("brand"), col("rk"))
  }

  /** squared euclidean distance via the codegen'd dot products. */
  private[operators] val d2 = "vec_dot(v, v) - 2 * vec_dot(v, c) + vec_dot(c, c)"

  /** nearest-center assignment: min over (distance², center id).
    * Groups on the scalar vec_id only (never the array column — array
    * hashing in the aggregate would dominate) and carries the vector
    * through with first(). */
  private[operators] def assign(e: DataFrame, centers: DataFrame): DataFrame =
    e.crossJoin(broadcast(centers))
      .withColumn("d2", expr(d2))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"))).as("m"),
        first(col("v")).as("v"))
      .select(col("vec_id"), col("v"), col("m.cid").as("cid"),
        col("m.d2").as("d2"))

  /** new centers: per-dimension mean via posexplode + groupBy — one
    * map-side-combining aggregate, no per-group array building until
    * the k×64 collect at the end. */
  private[operators] def recenter(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("m"))
      .groupBy(col("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
        .as("c"))

  /** k-means over the embeddings: k = 4 centers seeded from the 4
    * smallest vec_ids, 3 unrolled Lloyd rounds, squared-euclidean
    * assignment with center-id tiebreak. Emits per-cluster sizes.
    * no-oracle (iterative ML; property-tested in MiningSpec: sizes
    * partition the corpus, assignments are nearest-center, inertia
    * non-increasing across rounds).
    *
    * Scale shape: each round = one broadcast of k centers + two
    * map-side-combining aggregates; nothing quadratic, no window;
    * the corpus is scanned once per round (cached). */
  val miningKmeans: GQuery = {
    val k = 4
    val rounds = 3
    val sparkImpl = (s: SparkSession, dir: String) => {
      val e = PlanCache.memo(s, dir, "kmeans_vecs") {
        SimQueries.vecs(s, dir).select(col("vec_id"), col("v"))
      }
      val centers = trainCenters(e, k, rounds)
      assign(e, centers)
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_members"),
          (round(sum(col("d2")) * 1e6) / 1e6).as("inertia"))
        .orderBy(col("cid"))
    }
    GQuery.noOracle("mining_kmeans")(sparkImpl)
  }

  /** top-n nearest centers per vector (for IVF multi-cell probing):
    * same distance expression, rank over (d2, cid) per vec_id. */
  private[operators] def assignTopN(
      e: DataFrame, centers: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("d2"), col("cid"))
    e.crossJoin(broadcast(centers))
      .withColumn("d2", expr(d2))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
      .select(col("vec_id"), col("v"), col("cid"))
  }

  /** fixed-round Lloyd training, deterministic smallest-id seeds.
    * Checkpoints the k-row center frame each round: materializing
    * k×64 doubles is free, and it keeps the unrolled plan SHALLOW —
    * without it every round re-plans (and re-codegens) the whole
    * preceding lineage, which dominates wall time at small k. */
  private[operators] def trainCenters(
      e: DataFrame, k: Int, rounds: Int): DataFrame = {
    val seed = e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").cast("int").as("cid"), col("v").as("c"))
    (1 to rounds).foldLeft(seed) { (cs, _) =>
      recenter(assign(e, cs)).localCheckpoint(true)
    }
  }

  val all: Seq[GQuery] = Seq(miningCopurchase, miningKmeans)
}
