package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public, fixture-independent similarity-search API (see [[Dedup]]
  * for conventions). Vectors are `array<double>` columns; cosine is
  * computed by the codegen'd vec_dot/vec_norm expressions and rounded
  * to 6 places before ranking so tie-breaks are deterministic.
  */
object Similarity {

  private def prep(vecs: DataFrame, id: String, vec: String): DataFrame = {
    graft.functions.VectorExpressions.register(vecs.sparkSession)
    vecs.select(col(id).as("vid"), col(vec).as("v"))
      .withColumn("nrm", expr("vec_norm(v)"))
  }

  private val dot = "vec_dot(va, vb)"

  /** Exact top-k cosine neighbors of each probe row against the
    * corpus: (probe_id, rk, neighbor_id, cosine). The probe set is
    * broadcast; the corpus is scanned once and never shuffled. */
  def cosineTopK(corpus: DataFrame, probes: DataFrame, id: String,
      vec: String, k: Int): DataFrame = {
    val c = prep(corpus, id, vec)
      .select(col("vid").as("neighbor_id"), col("v").as("vb"),
        col("nrm").as("nb"))
    val p = prep(probes, id, vec)
      .select(col("vid").as("probe_id"), col("v").as("va"),
        col("nrm").as("na"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(expr(dot) / (col("na") * col("nb")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("neighbor_id"), col("cosine"))
  }

  /** Multi-table sign-LSH approximate top-k: `tables` hash tables,
    * each bucketing on the sign bits of `bits` consecutive
    * dimensions; a probe's candidates are the union of its buckets.
    * (probe_id, rk, neighbor_id, cosine). Bucketing is a per-row
    * projection — the corpus is never shuffled. */
  def signLshTopK(corpusVecs: DataFrame, probeVecs: DataFrame,
      id: String, vec: String, k: Int, tables: Int = 8,
      bits: Int = 4): DataFrame = {
    def bucketed(df: DataFrame): DataFrame =
      prep(df, id, vec).select(col("vid"), col("v"), col("nrm"),
        posexplode(expr(
          s"""transform(sequence(0, ${tables - 1}), t ->
             |  aggregate(transform(slice(v, $bits * t + 1, $bits),
             |    x -> CASE WHEN x >= CAST(0 AS DOUBLE) THEN 1 ELSE 0 END),
             |    0, (acc, b) -> acc * 2 + b))""".stripMargin))
          .as(Seq("tbl", "bucket")))
    val probes = bucketed(probeVecs)
      .select(col("tbl"), col("bucket"), col("vid").as("probe_id"),
        col("v").as("va"), col("nrm").as("na"))
    val corpus = bucketed(corpusVecs).select(col("tbl"), col("bucket"),
      col("vid").as("neighbor_id"), col("v").as("vb"),
      col("nrm").as("nb"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    corpus.join(broadcast(probes), Seq("tbl", "bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        round(expr(dot) / (col("na") * col("nb")), 6).as("cosine"))
      .distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("rk"), col("neighbor_id"), col("cosine"))
  }
}
