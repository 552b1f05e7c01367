package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.MultimodalPipeline

/** Public, fixture-independent multimodal API (see [[Dedup]] for
  * conventions): opaque-binary payload columns with typed metadata,
  * parameterized on the caller's column names. The decode/featurize
  * kernels are the clearly-marked deterministic stubs of
  * [[graft.sources.MultimodalPipeline]] (no codec libs in this
  * container) — the Spark-side mechanics (schema, batched
  * per-partition decode, per-frame fan-out) are the real contract a
  * caller swaps codecs into.
  *
  * `meta` columns must be a `struct<modality string, width int,
  * height int, sample_rate int>` — the typed-metadata shape
  * [[MultimodalPipeline.mediaSchema]] pins.
  */
object Multimodal {

  /** Byte-level features of an opaque binary payload — computed from
    * the BYTES only, never assuming the payload decodes as text:
    * (<id>, n_bytes, payload_md5, first_byte, shard_key). The md5
    * doubles as a content address; shard_key (its first 4 hex chars)
    * is a uniform 65536-way partitioning key for downstream layout. */
  def byteFeatures(df: DataFrame, id: String, payload: String): DataFrame =
    df.select(col(id),
      length(col(payload)).cast("int").as("n_bytes"),
      md5(col(payload)).as("payload_md5"),
      conv(substring(hex(col(payload)), 1, 2), 16, 10).cast("int")
        .as("first_byte"),
      substring(md5(col(payload)), 1, 4).as("shard_key"))

  /** Join a text-modality table against a vector-modality table on
    * their shared id and profile the groups:
    * (<groupCols>, n_docs, sum_chars, avg_chars). `sizeCol` is the
    * per-document size column aggregated (e.g. character count). */
  def joinProfile(texts: DataFrame, vectors: DataFrame, textId: String,
      vecId: String, sizeCol: String, groupCols: Seq[Column]): DataFrame =
    texts.join(vectors, col(textId) === col(vecId))
      .groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).as("sum_chars"),
        round(sum(col(sizeCol)).cast("double") / count(lit(1)), 6)
          .as("avg_chars"))

  /** Rename a caller's media table into the canonical pipeline schema
    * (doc_id, payload, meta). */
  private def canonical(media: DataFrame, id: String, payload: String,
      meta: String): DataFrame =
    media.select(col(id).cast("long").as("doc_id"),
      col(payload).as("payload"), col(meta).as("meta"))

  /** Batched decode + featurize (one codec init per PARTITION, not
    * per row): (<id>, modality, n_bytes, features array<float>). */
  def features(media: DataFrame, id: String, payload: String,
      meta: String): DataFrame = {
    implicit val spark = media.sparkSession
    MultimodalPipeline.extractFeatures(canonical(media, id, payload, meta))
      .toDF().withColumnRenamed("doc_id", id)
  }

  /** Resize stage: payloads replaced by their w×h thumbnail, metadata
    * updated — caller's column names preserved on the way out. */
  def resize(media: DataFrame, id: String, payload: String,
      meta: String, w: Int, h: Int): DataFrame = {
    implicit val spark = media.sparkSession
    MultimodalPipeline.resize(canonical(media, id, payload, meta), w, h)
      .toDF().select(col("doc_id").as(id), col("payload").as(payload),
        col("meta").as(meta))
  }

  /** Frame-sampling stage (one row in, up to `n` typed rows out):
    * (<id>, frame_no, n_bytes, features array<float>). */
  def frames(media: DataFrame, id: String, payload: String,
      meta: String, n: Int): DataFrame = {
    implicit val spark = media.sparkSession
    MultimodalPipeline.sampleFrames(canonical(media, id, payload, meta), n)
      .toDF().withColumnRenamed("doc_id", id)
  }
}
