package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

case class Chg(k: Long, seg: String, bal: java.math.BigDecimal,
    op: String, version: Long)

/** Streaming CDC apply: latest-VERSION-wins state, delete tombstones,
  * micro-batch-split independence (out-of-order delivery across
  * batches converges to the batch-apply answer), crash-safe publish
  * (one complete state on disk at every crash point), and tombstone
  * compaction under a retention watermark. */
class MergeStreamsSpec extends SparkTestBase {
  initQuiet()
  import spark.implicits._

  private def bd(v: String) = new java.math.BigDecimal(v)

  // feed over keys 1..6 exercising every interaction:
  //   k=1: U v1 only                       -> updated
  //   k=2: U v1 then D v2                  -> deleted (late delete)
  //   k=3: D v1 then U v2                  -> resurrected
  //   k=4: untouched                       -> base? (no base here: absent)
  //   k=5: I v1                            -> inserted
  //   k=6: U v2 then stale U v1 (late)     -> v2 value must survive
  private val feed = Seq(
    Chg(1L, "A", bd("10.00"), "U", 1L),
    Chg(2L, "B", bd("20.00"), "U", 1L),
    Chg(2L, "B", bd("20.00"), "D", 2L),
    Chg(3L, "C", bd("30.00"), "D", 1L),
    Chg(3L, "C2", bd("31.00"), "U", 2L),
    Chg(5L, "E", bd("50.00"), "I", 1L),
    Chg(6L, "F2", bd("62.00"), "U", 2L),
    Chg(6L, "F1", bd("61.00"), "U", 1L))

  private val expected = Map(
    1L -> ("A", "10.00"), 3L -> ("C2", "31.00"),
    5L -> ("E", "50.00"), 6L -> ("F2", "62.00"))

  private def newStatePath(tag: String): String =
    Files.createTempDirectory(s"graft_cdc_$tag").toString + "/state"

  private def runStream(batches: Seq[Seq[Chg]],
      watermark: Long = Long.MinValue): Map[Long, (String, String)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = newStatePath("state")
    val mem = MemoryStream[Chg]
    val q = MergeStreams.cdcApplyStream(mem.toDF(), path, watermark)
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    readCurrent(path)
  }

  private def readCurrent(path: String): Map[Long, (String, String)] =
    MergeStreams.currentState(spark, path).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getDecimal(2).toPlainString)).toMap

  test("one batch, two splits, and the REVERSED splits all converge") {
    val oneShot = runStream(Seq(feed))
    assert(oneShot == expected, s"single-batch apply diverged: $oneShot")
    val (a, b) = feed.splitAt(4)
    assert(runStream(Seq(a, b)) == expected, "forward split diverged")
    // reversed delivery: later versions arrive FIRST; stale changes
    // must not overwrite, deleted keys must not resurrect from v1
    assert(runStream(Seq(b, a)) == expected, "reversed split diverged")
    // per-row trickle (maximal reordering pressure on the state)
    assert(runStream(feed.reverse.map(Seq(_))) == expected,
      "per-row reversed trickle diverged")
  }

  test("at-least-once delivery converges to the once-delivered state (exactly-once sink)") {
    // the merge_cdc_exactly_once contract (round-14 VERDICT item 7):
    // every replay pattern a restarted at-least-once source can
    // produce — immediate duplicate, and a STALE batch replayed after
    // newer data landed — must leave the state byte-equal to applying
    // each batch once. The versioned merge is what turns at-least-once
    // delivery into exactly-once state at the sink boundary.
    val b1 = feed.filter(_.version == 1L)
    val b2 = feed.filter(_.version == 2L)
    val once = runStream(Seq(b1, b2))
    val replayed = runStream(Seq(b1, b1, b2, b1, b2))
    assert(replayed == once && once == expected,
      s"replayed state $replayed diverged from once-delivered $once")
  }

  test("tombstones persist in state; currentState hides them") {
    val path = newStatePath("tomb")
    MergeStreams.applyCdcBatch(feed.toDF(), path)
    val raw = spark.read.parquet(path)
    assert(raw.filter($"deleted").select($"k").as[Long].collect()
      .toSet == Set(2L), "the deleted key must remain as a tombstone")
    assert(MergeStreams.currentState(spark, path)
      .filter($"k" === 2L).count() == 0)
    // a stale resurrect attempt AFTER the delete batch must bounce
    // off the tombstone's higher version
    MergeStreams.applyCdcBatch(
      Seq(Chg(2L, "B", bd("20.00"), "U", 1L)).toDF(), path)
    assert(MergeStreams.currentState(spark, path)
      .filter($"k" === 2L).count() == 0,
      "stale U must not resurrect a newer tombstone")
  }

  test("duplicate (key, version) ties resolve identically at every split") {
    // two U rows share (k=9, v=5) with different payloads, plus a
    // (k=9, v=5) delete: the (version, deleted, seg, bal) total order
    // must pick ONE winner — the delete (deleted=true sorts above
    // false at equal version) — however the feed is split.
    val ties = Seq(
      Chg(9L, "ZA", bd("1.00"), "U", 5L),
      Chg(9L, "ZB", bd("2.00"), "U", 5L),
      Chg(9L, "ZB", bd("2.00"), "D", 5L),
      Chg(8L, "YA", bd("3.00"), "U", 7L),
      Chg(8L, "YB", bd("4.00"), "U", 7L))
    val oneShot = runStream(Seq(ties))
    // k=9: tombstone wins its tie -> hidden; k=8: "YB" > "YA" lexically
    assert(oneShot == Map(8L -> ("YB", "4.00")),
      s"tie total order violated: $oneShot")
    assert(runStream(ties.map(Seq(_))) == oneShot,
      "per-row trickle diverged on ties")
    assert(runStream(ties.reverse.map(Seq(_))) == oneShot,
      "reversed trickle diverged on ties")
    val (x, y) = ties.splitAt(2)
    assert(runStream(Seq(y, x)) == oneShot, "reversed split diverged on ties")
  }

  test("publish is crash-safe: every crash point leaves a recoverable state") {
    val path = newStatePath("crash")
    val (a, b) = feed.splitAt(4)
    MergeStreams.applyCdcBatch(a.toDF(), path)
    val afterA = readCurrent(path)

    // crash point 1: tmp fully written, live dir NOT yet moved aside
    // (a half-written tmp is the same case — tmp is never read).
    spark.read.parquet(path).write.mode("overwrite").parquet(path + "_tmp")
    assert(readCurrent(path) == afterA, "live state must win over tmp debris")

    // crash point 2: live dir renamed aside, move-in not yet done —
    // _old is the only complete state and must be recovered.
    rm(new File(path + "_tmp"))
    Files.move(Paths.get(path), Paths.get(path + "_old"))
    assert(!new File(path).exists())
    assert(readCurrent(path) == afterA,
      "recovery must restore the aside copy when the live dir is missing")
    assert(new File(path).exists() && !new File(path + "_old").exists(),
      "recovery must move _old back into place (repair once)")

    // crash point 3: move-in done, _old debris not yet deleted — next
    // batch must read the NEW live state and clear the debris.
    spark.read.parquet(path).write.parquet(path + "_old")
    MergeStreams.applyCdcBatch(b.toDF(), path)
    assert(readCurrent(path) == expected,
      "merge after a crash-point-3 restart diverged")
    assert(!new File(path + "_old").exists() &&
      !new File(path + "_tmp").exists(), "publish must clear its debris")

    // and replaying an already-applied batch is idempotent (what a
    // checkpointed restart does to the interrupted batch)
    MergeStreams.applyCdcBatch(b.toDF(), path)
    assert(readCurrent(path) == expected, "replay must be idempotent")
  }

  test("tombstone compaction under a retention watermark preserves " +
      "split independence") {
    // watermark 2: the k=3 v1 tombstone (version < 2) may be dropped
    // once no older change can arrive; the k=2 v2 tombstone must stay.
    // All splits run the SAME watermark; the feed respects it (no row
    // with version < 2 arrives after a later-versioned change for its
    // key in any suffix — versions 1 appear only before/with v2 rows
    // of the same key or are themselves final).
    val w = 2L
    val oneShot = runStream(Seq(feed), w)
    assert(oneShot == expected, s"compacted single batch diverged: $oneShot")
    val (a, b) = feed.splitAt(4)
    assert(runStream(Seq(a, b), w) == expected, "compacted split diverged")

    // state-level check: with watermark 2, only the version-2
    // tombstone survives; the dropped v1 tombstone is provably safe
    // because any legal future change has version >= 2 > 1 and would
    // have beaten it anyway.
    val path = newStatePath("compact")
    MergeStreams.applyCdcBatch(feed.toDF(), path, w)
    val tombs = spark.read.parquet(path).filter($"deleted")
      .select($"k", $"version").as[(Long, Long)].collect().toSet
    assert(tombs == Set((2L, 2L)),
      s"only the >=watermark tombstone may survive compaction: $tombs")

    // with watermark 3 even that tombstone compacts away; a future
    // U at version >= 3 then (correctly) re-inserts the key.
    val path3 = newStatePath("compact3")
    MergeStreams.applyCdcBatch(feed.toDF(), path3, 3L)
    assert(spark.read.parquet(path3).filter($"deleted").count() == 0)
    MergeStreams.applyCdcBatch(
      Seq(Chg(2L, "B9", bd("29.00"), "U", 9L)).toDF(), path3, 3L)
    assert(readCurrent(path3).get(2L).contains(("B9", "29.00")),
      "a post-watermark change must re-insert a compacted key")
  }

  test("checkpointLocation survives a stream restart without reapplying " +
      "side effects wrongly") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = newStatePath("ckpt")
    val ckpt = Files.createTempDirectory("graft_cdc_ckpt").toString
    val (a, b) = feed.splitAt(4)
    val mem1 = MemoryStream[Chg]
    val q1 = MergeStreams.cdcApplyStream(mem1.toDF(), path,
      checkpointLocation = Some(ckpt))
    mem1.addData(a); q1.processAllAvailable(); q1.stop()
    // restart against the same checkpoint: a replayable source
    // re-presents the same data at the same offsets, so the restarted
    // stream re-adds batch a (committed — skipped via the checkpoint)
    // before the remaining feed b
    val mem2 = MemoryStream[Chg]
    mem2.addData(a)
    mem2.addData(b)
    val q2 = MergeStreams.cdcApplyStream(mem2.toDF(), path,
      checkpointLocation = Some(ckpt))
    q2.processAllAvailable(); q2.stop()
    assert(readCurrent(path) == expected, "checkpointed restart diverged")
  }

  private def rm(f: File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(rm)
    f.delete(); ()
  }
}
