package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

case class Chg(k: Long, seg: String, bal: java.math.BigDecimal,
    op: String, version: Long)

/** Streaming CDC apply: latest-VERSION-wins state, delete tombstones,
  * and micro-batch-split independence (out-of-order delivery across
  * batches converges to the batch-apply answer). */
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

  private def runStream(batches: Seq[Seq[Chg]]): Map[Long, (String, String)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = java.nio.file.Files
      .createTempDirectory("graft_cdc_state").toString + "/state"
    val mem = MemoryStream[Chg]
    val q = MergeStreams.cdcApplyStream(mem.toDF(), path)
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    MergeStreams.currentState(spark, path).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getDecimal(2).toPlainString)).toMap
  }

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

  test("tombstones persist in state; currentState hides them") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_cdc_state2").toString + "/state"
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
}
