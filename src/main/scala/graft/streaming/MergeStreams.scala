package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC APPLY — the continuous counterpart of the batch
  * `merge_cdc_apply` contract query: a stream of keyed I/U/D change
  * rows is applied onto a parquet STATE TABLE per micro-batch
  * (foreachBatch — the standard Structured-Streaming merge sink),
  * latest-VERSION-wins rather than latest-arrival-wins.
  *
  * Two design points make the result independent of HOW the feed is
  * split into micro-batches (MergeStreamsSpec pins both):
  *
  *  - '''versions decide, not arrival order''': the state stores each
  *    key's last applied version; an incoming change replaces state
  *    only when its version is ≥ the stored one, so a stale U that
  *    arrives late cannot overwrite a newer change.
  *  - '''deletes are TOMBSTONES''': a delete keeps (key, version,
  *    deleted = true) in the state instead of removing the row — a
  *    physical removal would forget the version and let an older U,
  *    delivered later, silently resurrect the key. [[currentState]]
  *    filters tombstones out; a compaction that drops tombstones is
  *    safe once no older change can still arrive (retention policy —
  *    the caller's watermark decision, same trade as
  *    dropDuplicatesWithinWatermark).
  *
  * State I/O is parquet read → keyed merge → atomic-rename publish
  * (write to a `_tmp` sibling, then swap), so a crash mid-batch
  * leaves the previous state intact. At scale this is the relational
  * core a table format layers file-level MERGE on; per-batch cost is
  * one keyed join of state × (small) batch.
  */
object MergeStreams {

  private val stateSchema =
    "k BIGINT, seg STRING, bal DECIMAL(12,2), version BIGINT, " +
      "deleted BOOLEAN"

  /** Apply ONE batch of changes (k, seg, bal, op ∈ {I,U,D}, version)
    * onto the state at `statePath` (created if absent). Within the
    * batch only each key's highest version matters (intermediate
    * versions are superseded before they are ever visible). */
  def applyCdcBatch(batch: DataFrame, statePath: String): Unit = {
    val spark = batch.sparkSession
    val dir = new java.io.File(statePath)
    val bLatest = batch
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
          .orderBy(col("version").desc)))
      .filter(col("__rn") === 1)
      .select(col("k"), col("seg"), col("bal").cast("decimal(12,2)"),
        col("version"), (col("op") === "D").as("deleted"))
    val state =
      if (dir.exists()) spark.read.schema(stateSchema).parquet(statePath)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(stateSchema))
    val s = state.select(col("k").as("sk"), col("seg").as("sseg"),
      col("bal").as("sbal"), col("version").as("sver"),
      col("deleted").as("sdel"))
    // keyed full-outer merge: the higher version wins per key
    val merged = bLatest.join(s, col("k") === col("sk"), "full_outer")
      .select(
        coalesce(col("k"), col("sk")).as("k"),
        when(col("sk").isNull || (col("k").isNotNull
            && col("version") >= col("sver")), col("seg"))
          .otherwise(col("sseg")).as("seg"),
        when(col("sk").isNull || (col("k").isNotNull
            && col("version") >= col("sver")), col("bal"))
          .otherwise(col("sbal")).as("bal"),
        greatest(coalesce(col("version"), lit(Long.MinValue)),
          coalesce(col("sver"), lit(Long.MinValue))).as("version"),
        when(col("sk").isNull || (col("k").isNotNull
            && col("version") >= col("sver")), col("deleted"))
          .otherwise(col("sdel")).as("deleted"))
      // the plan reads statePath, so materialize before overwriting it
      .localCheckpoint(true)
    val tmp = statePath + "_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm)
      f.delete(); ()
    }
    rm(dir)
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
      java.nio.file.Paths.get(statePath))
  }

  /** Run the change stream onto the state table via foreachBatch;
    * Append-mode, no state store — the parquet table IS the state. */
  def cdcApplyStream(stream: DataFrame, statePath: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyCdcBatch(batch, statePath)
      }
      .start()

  /** The live table: state minus tombstones. */
  def currentState(spark: SparkSession, statePath: String): DataFrame =
    spark.read.schema(stateSchema).parquet(statePath)
      .filter(!col("deleted"))
      .select(col("k"), col("seg"), col("bal"), col("version"))
}
