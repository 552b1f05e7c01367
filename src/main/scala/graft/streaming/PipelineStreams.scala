package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The STREAMING counterpart of [[graft.api.Pipeline.corpusPrep]] —
  * continuous corpus ingestion: every arriving document is quality-
  * gated, checked for near-duplication against the SAVED corpus
  * signature index, checked for eval contamination against the
  * (bounded) benchmark set, and mixture-weighted — in ONE Append-mode
  * query with no watermark and no state store.
  *
  * Where the batch pipeline dedups arrivals against EACH OTHER
  * (connected components over the pair graph — inherently a batch
  * aggregate), the streaming form answers the ingestion-time
  * question: does this arrival duplicate the EXISTING corpus? Each
  * stage is stateless:
  *
  *  - '''quality gate''' ([[TextStreams.qualityFilter]]): the
  *    per-row scorer, column-identical to the batch aggregate.
  *  - '''near-dup drop''': the arrival's 8-hash signature is computed
  *    per row, and one stream-static LEFT ANTI join PER BAND removes
  *    arrivals that collide with any indexed signature on that band
  *    with est ≥ `minEst` (equi keys on the band's two hashes plus
  *    the agreement residual — the same decision
  *    [[DedupStreams.nearDupsAgainstSavedIndex]] reports as pairs,
  *    expressed as four chained anti joins so "no collision on ANY
  *    band" needs no aggregation).
  *  - '''decontamination drop''': arrivals are TRAIN-side candidates;
  *    an arrival containing ≥ `containNum/containDen` of any eval
  *    doc's shingles is dropped by a left anti join against the
  *    benchmark set with a per-row early-exit
  *    `sorted_intersect_count` condition. The eval frame is BOUNDED
  *    (it is a benchmark suite), so the non-equi anti join broadcasts
  *    it — the same bounded-dim trade as the brute-force cosine
  *    baseline.
  *  - '''mixture''' ([[graft.api.Sampling.mixtureReplicated]]):
  *    per-source up-/down-weighting, per-row projection + explode.
  *
  * Runs identically on a batch frame (every stage is the same code
  * path — PipelineStreamsSpec pins streaming ≡ batch and the planted
  * drop/keep cases). */
object PipelineStreams {

  def corpusPrepStream(stream: DataFrame, id: String, text: String,
      source: String, sigIndexPath: String, evalDocs: DataFrame,
      evalText: String, minQuality: Double,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      minEst: Double = 0.5, containNum: Int = 1,
      containDen: Int = 2): DataFrame = {
    require(containNum > 0 && containDen > 0 && containNum <= containDen,
      "containment threshold must be in (0, 1]")
    val spark = stream.sparkSession
    graft.functions.TextExpressions.register(spark)
    graft.functions.SetExpressions.register(spark)
    val meta = spark.read.parquet(s"$sigIndexPath/meta").head()
    val n = meta.getAs[Int]("n")

    // 1. quality gate (adds the `quality` column)
    val gated = TextStreams.qualityFilter(stream, id, text, minQuality)

    // per-row shingle set, shared by the signature and the
    // containment check; docs too short to shingle can be neither
    // near-dups nor contaminated — they bypass both drops (matching
    // the batch path, whose joins never see them)
    val shCol = array_sort(array_distinct(call_function("word_ngrams",
      split(col(text), " "), lit(n))))
    val withSh = gated.withColumn("__sh", shCol)
    val shingled = withSh.filter(size(col("__sh")) > 0)
    val bare = withSh.filter(size(col("__sh")) === 0).drop("__sh")

    // 2. near-dup drop: signature columns ride the row (the
    // 1-element explode is the Generate barrier that keeps the
    // 8-minimum aggregate evaluated once), then one anti join per
    // band against the saved index
    val signed = shingled
      .withColumn("__hs",
        explode(array(DedupStreams.signatureArray(col("__sh")))))
      .withColumns((0 to 7).map(k =>
        s"__h$k" -> col("__hs").getItem(k)).toMap)
      .drop("__hs")
    val bands = spark.read.parquet(s"$sigIndexPath/bands")
    val agree = (0 to 7).map(k =>
      when(col(s"__h$k") === col(s"c$k"), 1).otherwise(0)).reduce(_ + _)
    val deduped = Seq((0, 1), (2, 3), (4, 5), (6, 7)).zipWithIndex
      .foldLeft(signed) { case (acc, ((x, y), bi)) =>
        val side = (0 to 7).foldLeft(bands.filter(col("b") === bi)) {
          (d, k) => d.withColumnRenamed(s"h$k", s"c$k")
        }.select((0 to 7).map(k => col(s"c$k")) :+ col("k1") :+ col("k2"): _*)
        acc.join(side,
          col(s"__h$x") === col("k1") && col(s"__h$y") === col("k2") &&
            (agree.cast("double") / 8 >= minEst),
          "left_anti")
      }.drop((0 to 7).map(k => s"__h$k"): _*)

    // 3. decontamination drop: bounded benchmark side, per-row
    // early-exit intersection as the join condition
    val ev = evalDocs
      .select(array_sort(array_distinct(call_function("word_ngrams",
        split(col(evalText), " "), lit(n)))).as("__ea"))
      .filter(size(col("__ea")) > 0)
      .withColumn("__n", size(col("__ea")))
      .withColumn("__need", expr(
        s"CAST((__n * $containNum + ${containDen - 1}) DIV $containDen AS INT)"))
    val clean = deduped.join(ev,
      call_function("sorted_intersect_count",
        col("__ea"), col("__sh"), col("__need")) * containDen
        >= col("__n") * containNum,
      "left_anti").drop("__sh")

    // 4. mixture up-/down-weighting over the survivors (+ the
    // shingle-less bypass rows)
    graft.api.Sampling.mixtureReplicated(clean.unionByName(bare),
      id, source, rates, defaultRate)
  }
}
