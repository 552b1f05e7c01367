package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.SnapshotTable

/** Continuous ingestion INTO the snapshot/manifest table format — the
  * streaming half of [[graft.sources.SnapshotTable]] (the lakehouse
  * shape MergeStreams gives the CDC-merge sink, given here to the
  * append sink): every micro-batch commits ONE snapshot via
  * [[SnapshotTable.appendOnce]], so
  *
  *  - readers always see COMPLETE snapshots (the manifest is the
  *    atomic commit point; a crash mid-batch leaves orphan data files
  *    and no manifest — invisible debris, the batch replays);
  *  - a replayed micro-batch (restarted stream, at-least-once source)
  *    is detected by its batch-id marker INSIDE the published
  *    manifest and skipped — exactly-once table state without a
  *    commit-then-mark crash window;
  *  - concurrent readers time-travel freely while ingestion runs
  *    (immutable versioned file sets), and a periodic
  *    [[SnapshotTable.compact]] + [[SnapshotTable.vacuum]] bounds the
  *    small-file accumulation ingestion creates — the
  *    compaction/ingestion split every table format makes.
  *
  * Scale shape: per batch, one parquet write of the batch's rows plus
  * one O(files) manifest link — no state store, no watermark; the
  * manifest re-derivation loop only re-runs on a genuine concurrent
  * commit. */
object SnapshotStreams {

  /** Run `stream` into the table at `tableDir`, one snapshot per
    * micro-batch, exactly-once under replay. Pass
    * `checkpointLocation` so source offsets survive a restart (the
    * replayed tail batch is skipped by its manifest marker). */
  def appendStream(stream: DataFrame, tableDir: String,
      checkpointLocation: Option[String] = None): StreamingQuery = {
    val w = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        SnapshotTable.appendOnce(batch, tableDir, batchId); ()
      }
    checkpointLocation.fold(w)(c => w.option("checkpointLocation", c))
      .start()
  }
}
