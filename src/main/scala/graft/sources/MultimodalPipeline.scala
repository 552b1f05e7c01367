package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Opaque-binary multimodal column plumbing (builder prompt §2.8).
  *
  * A 100 TB multimodal pipeline stores media as opaque binary columns
  * with typed metadata and runs decode / feature-extract stages as
  * batched per-partition passes. The real codecs (image/audio libs)
  * don't exist in this container, so [[decodeStub]] is a clearly
  * marked deterministic fake — but everything Spark-side is the real
  * mechanism:
  *
  *  - schema: `payload BINARY` + `meta STRUCT<modality, width, height,
  *    sample_rate>` (metadata travels next to the blob, never inside it);
  *  - the decode stage is `mapPartitions` over a typed Dataset: one
  *    iterator pass per partition, so a heavyweight codec would be
  *    initialized once per partition, not per row — the Scala analogue
  *    of a Pandas-UDF `mapInPandas` batch;
  *  - output is a fixed-width feature vector column, ready for the
  *    similarity operators in graft.operators.SimQueries.
  */
object MultimodalPipeline {

  case class MediaMeta(modality: String, width: Int, height: Int,
      sample_rate: Int)
  case class MediaRow(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(doc_id: Long, modality: String, n_bytes: Int,
      features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("modality", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false))),
      nullable = false)))

  /** Synthesize a media table from the documents fixture: payload =
    * utf-8 bytes of the text, modality assigned round-robin. This is
    * the *ingest* step a real pipeline replaces with raw file reads
    * (`spark.read.format("binaryFile")`). */
  def syntheticMedia(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        struct(
          element_at(lit(Array("image", "audio", "video")),
            (col("doc_id") % 3 + 1).cast("int")).as("modality"),
          (col("doc_id") % 640 + 1).cast("int").as("width"),
          (col("doc_id") % 480 + 1).cast("int").as("height"),
          lit(16000).as("sample_rate")).as("meta"))

  /** STUB — stands in for the real image/audio decode + featurize
    * kernel (no codec libs in this container). Deterministic: an
    * 8-dim byte-histogram sketch of the payload. A real implementation
    * keeps this exact signature (bytes + meta in, fixed-width floats
    * out) and swaps the body for the codec call. */
  def decodeStub(payload: Array[Byte], meta: MediaMeta): Array[Float] = {
    val hist = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % 8) += 1f
      i += 1
    }
    if (payload.length > 0) {
      var j = 0
      while (j < 8) { hist(j) /= payload.length; j += 1 }
    }
    hist
  }

  /** The batched decode stage: one pass per partition, codec init
    * amortized across the partition ("expensive setup" is simulated by
    * constructing the histogram buffer factory once per partition). */
  def extractFeatures(media: DataFrame)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition (not per-row) setup happens here — in a real
      // pipeline this is the codec/model handle.
      rows.map { r =>
        MediaFeatures(r.doc_id, r.meta.modality, r.payload.length,
          decodeStub(r.payload, r.meta))
      }
    }
  }

  /** STUB — image resize. Deterministic byte subsampling to a
    * w×h-byte thumbnail (a real kernel swaps the body for bilinear
    * resampling over decoded pixels; signature and metadata update are
    * the real contract). */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.max(1, w * h)
    val out = new Array[Byte](math.min(n, payload.length))
    if (payload.nonEmpty) {
      var i = 0
      while (i < out.length) {
        out(i) = payload((i.toLong * payload.length / out.length).toInt)
        i += 1
      }
    }
    out
  }

  /** STUB — video frame sampling: split the payload into `n` chunks
    * ("frames") and featurize each. Real path: demux + decode every
    * k-th frame; the per-frame fan-out shape (one row in, n typed rows
    * out via flatMap) is the real mechanism. */
  case class FrameFeature(doc_id: Long, frame_no: Int, n_bytes: Int,
      features: Array[Float])

  def sampleFrames(media: DataFrame, n: Int)(
      implicit spark: SparkSession): Dataset[FrameFeature] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val chunk = math.max(1, r.payload.length / n)
      (0 until n).iterator.takeWhile(i => i * chunk < r.payload.length)
        .map { i =>
          val bytes = r.payload.slice(i * chunk,
            math.min((i + 1) * chunk, r.payload.length))
          FrameFeature(r.doc_id, i, bytes.length, decodeStub(bytes, r.meta))
        }
    }
  }

  /** Resize as a pipeline stage: payload replaced by its thumbnail,
    * metadata updated to the new dimensions. */
  def resize(media: DataFrame, w: Int, h: Int)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        MediaRow(r.doc_id, resizeStub(r.payload, w, h),
          r.meta.copy(width = w, height = h))
      }
    }
  }
}
