package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC APPLY — the continuous counterpart of the batch
  * `merge_cdc_apply` contract query: a stream of keyed I/U/D change
  * rows is applied onto a parquet STATE TABLE per micro-batch
  * (foreachBatch — the standard Structured-Streaming merge sink),
  * latest-VERSION-wins rather than latest-arrival-wins.
  *
  * Design points that make the result independent of HOW the feed is
  * split into micro-batches (MergeStreamsSpec pins each):
  *
  *  - '''versions decide, not arrival order''': the state stores each
  *    key's last applied version; an incoming change replaces state
  *    only when it wins the version order, so a stale U that arrives
  *    late cannot overwrite a newer change.
  *  - '''ties are a total order, not arrival order''': duplicate
  *    (key, version) rows — a malformed but survivable feed — are
  *    decided by one lexicographic order over
  *    (version, deleted, seg, bal), used BOTH inside a batch (window
  *    sort) and across batches (state compare), so every split of the
  *    same feed converges even under version collisions. Feeds with
  *    unique versions per key never hit the tie arms.
  *  - '''deletes are TOMBSTONES''': a delete keeps (key, version,
  *    deleted = true) in the state instead of removing the row — a
  *    physical removal would forget the version and let an older U,
  *    delivered later, silently resurrect the key. [[currentState]]
  *    filters tombstones out.
  *  - '''compaction under a retention watermark''': passing
  *    `tombstoneWatermark = w` drops tombstones with version < w
  *    after each merge. The caller's contract (same trade as
  *    dropDuplicatesWithinWatermark) is that no change with
  *    version < w will ever arrive again; any LEGAL future change for
  *    a compacted key then has version ≥ w > tombstone version, i.e.
  *    it would have beaten the tombstone anyway, so dropping it
  *    cannot change any outcome — split-independence holds under
  *    compaction (spec-pinned).
  *
  * State I/O is parquet read → keyed merge → crash-safe publish:
  * write the merged state to a `_tmp` sibling, rename the live dir
  * ASIDE to `_old`, move `_tmp` into place, then delete `_old` (the
  * IndexStore rename-aside discipline). A crash at ANY point leaves
  * at least one complete state on disk: before the aside-rename the
  * live dir is untouched; between aside and move-in, `_old` is the
  * complete previous state and [[currentState]]/the next batch
  * recover it; after move-in the new state is live and `_old` is
  * debris deleted lazily. Re-applying the interrupted batch is
  * idempotent (the version order is), which is exactly what a
  * restarted stream with a checkpoint does.
  *
  * At scale this is the relational core a table format layers
  * file-level MERGE on; per-batch cost is one keyed join of
  * state × (small) batch.
  */
object MergeStreams {

  private val stateSchema =
    "k BIGINT, seg STRING, bal DECIMAL(12,2), version BIGINT, " +
      "deleted BOOLEAN"

  /** The one total order deciding every conflict: lexicographic on
    * (version, deleted, seg, bal), null components pinned so the
    * comparison itself can never be null. Used descending in the
    * within-batch window and as a ≥ compare against state. */
  private def ord(version: Column, deleted: Column, seg: Column,
      bal: Column): Column =
    struct(version, coalesce(deleted, lit(false)),
      coalesce(seg, lit("")), coalesce(bal, lit(java.math.BigDecimal.ZERO)
        .cast("decimal(12,2)")))

  /** Apply ONE batch of changes (k, seg, bal, op ∈ {I,U,D}, version)
    * onto the state at `statePath` (created if absent). Within the
    * batch only each key's winning change matters (superseded rows
    * are never visible). Tombstones older than `tombstoneWatermark`
    * are dropped after the merge — pass a real watermark only if no
    * change with a smaller version can still arrive. */
  def applyCdcBatch(batch: DataFrame, statePath: String,
      tombstoneWatermark: Long = Long.MinValue): Unit = {
    val spark = batch.sparkSession
    val bLatest = batch
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
          .orderBy(ord(col("version"), col("op") === "D", col("seg"),
            col("bal").cast("decimal(12,2)")).desc)))
      .filter(col("__rn") === 1)
      .select(col("k"), col("seg"), col("bal").cast("decimal(12,2)"),
        col("version"), (col("op") === "D").as("deleted"))
    val state = readState(spark, statePath)
    val s = state.select(col("k").as("sk"), col("seg").as("sseg"),
      col("bal").as("sbal"), col("version").as("sver"),
      col("deleted").as("sdel"))
    // keyed full-outer merge: the total-order winner per key
    val bWins = col("sk").isNull || (col("k").isNotNull &&
      ord(col("version"), col("deleted"), col("seg"), col("bal")) >=
        ord(col("sver"), col("sdel"), col("sseg"), col("sbal")))
    val merged = bLatest.join(s, col("k") === col("sk"), "full_outer")
      .select(
        coalesce(col("k"), col("sk")).as("k"),
        when(bWins, col("seg")).otherwise(col("sseg")).as("seg"),
        when(bWins, col("bal")).otherwise(col("sbal")).as("bal"),
        when(bWins, col("version")).otherwise(col("sver")).as("version"),
        when(bWins, col("deleted")).otherwise(col("sdel")).as("deleted"))
      .filter(!(col("deleted") && col("version") < lit(tombstoneWatermark)))
    // No checkpoint needed before publish: the plan reads statePath but
    // publish MATERIALIZES it into the `_tmp` sibling first — the live
    // dir is renamed only after that write (the plan's one action) has
    // completed, so the read-then-overwrite hazard never exists. The
    // former per-batch eager ckpt materialized every merged state TWICE
    // (local blocks + parquet) — pure overhead on the 5-publish
    // exactly-once contract row (r17 opt).
    publish(merged, statePath)
  }

  /** Crash-safe publish of `merged` over `statePath`: tmp write →
    * aside-rename of the live dir → atomic move-in → lazy delete of
    * the aside copy. One complete state exists on disk at every
    * instant (see object scaladoc for the crash-point case table). */
  private def publish(merged: DataFrame, statePath: String): Unit = {
    val tmp = statePath + "_tmp"
    val old = statePath + "_old"
    merged.write.mode("overwrite").parquet(tmp)
    rm(new File(old)) // debris from a crash after a prior move-in
    if (new File(statePath).exists())
      Files.move(Paths.get(statePath), Paths.get(old),
        StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), Paths.get(statePath),
      StandardCopyOption.ATOMIC_MOVE)
    rm(new File(old))
  }

  /** The state table as currently recoverable: the live dir when
    * present, else the `_old` aside copy from a crash between the
    * aside-rename and the move-in (restored to the live path so the
    * repair happens once), else empty. `_tmp` is NEVER read — a crash
    * can leave it half-written, and the batch it belonged to will be
    * replayed anyway. */
  private def readState(spark: SparkSession, statePath: String): DataFrame = {
    val live = new File(statePath)
    val old = new File(statePath + "_old")
    if (!live.exists() && old.exists())
      Files.move(old.toPath, live.toPath, StandardCopyOption.ATOMIC_MOVE)
    if (live.exists()) spark.read.schema(stateSchema).parquet(statePath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(stateSchema))
  }

  private def rm(f: File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(rm)
    f.delete(); ()
  }

  /** Run the change stream onto the state table via foreachBatch;
    * Append-mode, no state store — the parquet table IS the state.
    * Pass `checkpointLocation` so source offsets survive a restart
    * (the replayed tail batch is idempotent against the state). */
  def cdcApplyStream(stream: DataFrame, statePath: String,
      tombstoneWatermark: Long = Long.MinValue,
      checkpointLocation: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyCdcBatch(batch, statePath, tombstoneWatermark)
      }
    checkpointLocation.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** The live table: state minus tombstones, recovered if the last
    * publish crashed mid-swap. */
  def currentState(spark: SparkSession, statePath: String): DataFrame =
    readState(spark, statePath)
      .filter(!col("deleted"))
      .select(col("k"), col("seg"), col("bal"), col("version"))
}
