package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.api.Multimodal

/** Streaming twin for the binary-payload tier: CONTINUOUS MEDIA
  * INGESTION against a saved perceptual-hash index — the
  * [[DedupStreams.nearDupsAgainstSavedIndex]] shape for payloads no
  * tokenizer can see. An arriving asset's 16-bit signature is a pure
  * per-row expression ([[Multimodal.phashRows]] — a higher-order
  * fold over the payload's own byte windows, no aggregate), its four
  * 4-bit Hamming bands equi-join the saved banded signatures, and
  * Hamming ≤ maxHamming is exact-verified from the two CARRIED
  * signatures. The first-equal-band filter keeps each colliding pair
  * exactly once WITHOUT a stateful distinct (the smallest agreeing
  * band index is computable from the signatures themselves — the
  * batch pigeonhole trick), so the whole pipeline is stateless and
  * Append-mode-safe: no watermark, no state store.
  */
object MultimodalStreams {

  /** (arrival_id, corpus_id, hamming) for every arrival within
    * `maxHamming` (≤ 3 — the 4-band pigeonhole's exactness bound) of
    * a saved corpus payload. Batch frames take the same path, plus
    * planning-time pruning of the probed band buckets (a ≤ 64-entry
    * bounded collect — band×bk is 4×16). */
  def phashAgainstSavedIndex(stream: DataFrame, path: String,
      id: String, payload: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4-band pigeonhole is exact only for Hamming <= 3")
    val spark = stream.sparkSession
    val corpus = spark.read.parquet(s"$path/bands")
      .select(col("band"), col("bk"), col("id").as("corpus_id"),
        col("simhash").as("s2"))
    val arrivals = Multimodal.bandedSim(
        Multimodal.phashRows(stream, id, payload), id)
      .select(col("band"), col("bk"), col("id").as("arrival_id"),
        col("simhash").as("s1"))
    val prunedCorpus =
      if (stream.isStreaming) corpus
      else {
        val bks = arrivals.select(col("band"), col("bk")).distinct()
          .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
        corpus.filter(bks.map { case (b, k) =>
          col("band") === b && col("bk") === k
        }.reduce(_ || _))
      }
    // first-equal-band dedup: keep the collision whose band is the
    // SMALLEST band on which the two signatures agree — a pure
    // function of (s1, s2), so no distinct is needed
    val firstEq: Column = (0 to 2).foldRight(lit(3): Column) { (b, els) =>
      when(expr(s"(shiftright(s1, ${b * 4}) & 15)" +
        s" = (shiftright(s2, ${b * 4}) & 15)"), lit(b)).otherwise(els)
    }
    arrivals.join(prunedCorpus, Seq("band", "bk"))
      .filter(col("arrival_id") =!= col("corpus_id"))
      .filter(col("band") === firstEq)
      .withColumn("hamming", expr("CAST(bit_count(s1 ^ s2) AS INT)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("arrival_id"), col("corpus_id"), col("hamming"))
  }
}
