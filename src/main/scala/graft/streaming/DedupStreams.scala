package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Continuous-ingestion near-dedup (SURVEY.md §2.11 round-4 note a):
  * score a STREAM of arriving documents against a signature index of
  * the existing corpus — the shape a training-data pipeline actually
  * serves: the corpus index is built once in batch
  * (graft.api.Dedup.minhashSignatures, materialized/saved), and each
  * micro-batch is signed PER ROW and stream-static joined against the
  * index on LSH band keys.
  *
  * Everything on the stream side is stateless (per-row expressions +
  * a projection explode), and a stream-static inner equi-join needs
  * no watermark or state store — so this runs in Append mode forever,
  * with the index as a broadcast- or shuffle-side chosen by the
  * engine from its actual size.
  *
  * Signature parity: the per-row signature below evaluates the SAME
  * portable hash family as the batch path (32-bit slices of
  * md5("0:"||shingle) / md5("1:"||shingle), minimum over the doc's
  * distinct shingles), so streaming signatures are byte-identical to
  * batch signatures of the same text, and an exact duplicate of an
  * indexed document always collides on every band with est = 1.0.
  */
object DedupStreams {

  /** Per-row MinHash signature columns (id, h0..h7) — stateless, so
    * it runs identically on batch and streaming frames. Documents
    * with no shingle (< n tokens) are dropped, matching the batch
    * groupBy which never sees them. Unlike the batch path (which
    * md5-hashes each DISTINCT shingle once corpus-wide through the
    * dictionary join), this recomputes hashes per row — the right
    * trade for a stream, where rows arrive independently. */
  def signRows(docs: DataFrame, id: String, text: String,
      n: Int = 3): DataFrame = {
    graft.functions.TextExpressions.register(docs.sparkSession)
    val shingles = array_distinct(call_function("word_ngrams",
      split(col(text), " "), lit(n)))
    // md5 is the dominant cost and higher-order lambdas are evaluated
    // interpreted (no cross-column subexpression elimination), so the
    // TWO digests per shingle are computed exactly once and folded
    // into all 8 signature minimums in a single aggregate pass. The
    // explode of a 1-element array is a Generate barrier: project
    // collapsing cannot inline (and re-evaluate) the aggregate into
    // the 8 extraction columns.
    val digs = transform(shingles, s =>
      array(md5(concat(lit("0:"), s)), md5(concat(lit("1:"), s))))
    val init = array((0 to 7).map(_ => lit(Long.MaxValue)): _*)
    val hs = aggregate(digs, init, (acc, d) =>
      array((0 to 7).map { k =>
        val m = k / 4; val j = k % 4
        least(element_at(acc, k + 1),
          conv(substring(element_at(d, m + 1), 1 + 8 * j, 8), 16, 10)
            .cast("long"))
      }: _*))
    docs.filter(size(shingles) > 0)
      .select(col(id), explode(array(hs)).as("hs"))
      .select(col(id) +: (0 to 7).map(k =>
        col("hs").getItem(k).as(s"h$k")): _*)
  }

  private val bands = Seq((0, 1), (2, 3), (4, 5), (6, 7))

  /** LSH band keys (4 bands × 2 rows) for a signed frame, CARRYING
    * the full signature through the explode — a stateless projection,
    * and the carried columns make the downstream join self-contained
    * (no rejoin with the signature frame, which on a stream would be
    * a stateful stream-stream self-join). */
  private def banded(sig: DataFrame, id: String, hPrefix: String): DataFrame = {
    val bandArr = bands.zipWithIndex.map { case ((x, y), bi) =>
      struct(lit(bi).as("b"), col(s"$hPrefix$x").as("k1"),
        col(s"$hPrefix$y").as("k2")) }
    val hCols = (0 to 7).map(k => col(s"$hPrefix$k"))
    sig.select(col(id) +: hCols :+ explode(array(bandArr: _*)).as("band"): _*)
      .select(col(id) +: hCols :+ col("band.b").as("b")
        :+ col("band.k1").as("k1") :+ col("band.k2").as("k2"): _*)
  }

  /** Near-duplicate candidates of a document stream against a STATIC
    * corpus signature index (columns id, h0..h7 — the output shape of
    * both the batch minhashSignatures and [[signRows]]):
    * (<id>, corpus_id, est_jaccard ≥ minEst).
    *
    * A pair colliding in several bands is kept exactly once WITHOUT a
    * stateful distinct: the post-join filter keeps only the FIRST
    * band whose keys agree (computable from the carried signatures —
    * the same pigeonhole trick the batch simhash join uses), so the
    * whole pipeline stays stateless. Works identically when `stream`
    * is a batch frame (spec-pinned). */
  def nearDupsAgainstIndex(stream: DataFrame, index: DataFrame,
      id: String, text: String, minEst: Double = 0.5): DataFrame = {
    val sig = signRows(stream, id, text)
    val corpus = (0 to 7).foldLeft(
      index.withColumnRenamed(id, "corpus_id")) { (d, k) =>
      d.withColumnRenamed(s"h$k", s"c$k") }
    // smallest band index whose keys agree: when(band0, 0)
    //   .otherwise(when(band1, 1).otherwise(... 3))
    val firstEq = bands.zipWithIndex.init.foldRight(lit(3): Column) {
      case (((x, y), bi), els) =>
        when(col(s"h$x") === col(s"c$x") && col(s"h$y") === col(s"c$y"),
          lit(bi)).otherwise(els)
    }
    val agree = (0 to 7).map(k =>
      when(col(s"h$k") === col(s"c$k"), 1).otherwise(0)).reduce(_ + _)
    banded(sig, id, "h")
      .join(banded(corpus, "corpus_id", "c"), Seq("b", "k1", "k2"))
      .filter(col("b") === firstEq)
      .select(col(id), col("corpus_id"),
        (agree.cast("double") / 8).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEst)
  }
}
