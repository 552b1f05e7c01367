package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GQuery
import graft.sources.Tables

/** Multimodal columns (SURVEY.md §2.8 + builder prompt): text and
  * vectors joined into one frame, plus opaque-binary column plumbing.
  *
  * Real image/audio payloads (and their decoders) don't exist in this
  * environment, so the binary column is synthesized from text bytes —
  * but every Spark-side mechanism is the real one a 100 TB multimodal
  * pipeline needs: a `BinaryType` column with typed metadata alongside
  * it, per-row feature extraction over the bytes with codegen'd
  * expressions, and (in graft.sources.MultimodalPipeline) a batched
  * mapPartitions decode stage with an explicit output schema. The
  * deterministic byte-level features below double as the oracle
  * contract (md5/length/first-byte are engine-independent).
  */
object MultimodalQueries {

  /** documents ⋈ embeddings (doc_id = vec_id): per-(label, lang)
    * distribution — "multimodal" = text + vector in one frame. */
  val multimodalJoin: GQuery = GQuery(
    "multimodal_join",
    """SELECT CAST(label AS INT) AS label, lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
      |FROM documents JOIN embeddings ON doc_id = vec_id
      |GROUP BY label, lang
      |ORDER BY label, lang""".stripMargin) { (s, dir) =>
    // thin binding of graft.api.Multimodal.joinProfile
    graft.api.Multimodal.joinProfile(
        Tables.documents(s, dir), Tables.embeddings(s, dir),
        "doc_id", "vec_id", "n_chars",
        Seq(col("label").cast("int").as("label"), col("lang")))
      .orderBy(col("label"), col("lang"))
  }

  /** Opaque-binary feature extraction: the payload is `CAST(text AS
    * BINARY)` and every feature is computed over the BYTES (length,
    * md5, first byte) — exactly the shape of a real image/audio
    * feature pass, with a decode stub swapped in for the codec. */
  val multimodalFeatures: GQuery = GQuery(
    "multimodal_features",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  md5(text) AS payload_md5,
      |  CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
      |  substr(md5(text), 1, 4) AS shard_key
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    // thin binding of graft.api.Multimodal.byteFeatures: the API
    // computes first_byte from the BYTES (hex slice), the oracle from
    // ascii(first char) — identical on this all-ASCII fixture, and
    // the byte form is the honest one for opaque payloads
    graft.api.Multimodal.byteFeatures(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("payload")),
        "doc_id", "payload")
      .orderBy(col("doc_id"))
  }

  val all: Seq[GQuery] = Seq(multimodalJoin, multimodalFeatures)
}
