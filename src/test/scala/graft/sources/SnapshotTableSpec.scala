package graft.sources

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The minimal snapshot/manifest table format's three invariants
  * (SnapshotTable scaladoc), pinned on LIVE commits:
  * atomic visibility (a crashed commit — data files, no manifest —
  * is invisible), snapshot isolation (a reader holding v1 survives
  * any number of later commits AND a concurrent-rewrite vacuum of
  * everything it doesn't read), and linear history (manifest-rename
  * collisions serialize; the loser lands on the next version with
  * its data intact). Plus the time-travel roundtrip merge_time_travel
  * rides on. */
class SnapshotTableSpec extends SparkTestBase {
  initQuiet()
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_snaptab").toString + "/t"

  private def rows(n: Int, tag: String) =
    (1 to n).map(i => (i.toLong, tag)).toDF("k", "tag")

  test("commit/read roundtrip; versions are dense; time travel reads every retained snapshot") {
    val t = freshDir()
    assert(SnapshotTable.versions(t).isEmpty)
    assert(SnapshotTable.commit(rows(3, "a"), t) == 1)
    assert(SnapshotTable.commit(rows(5, "b"), t) == 2)
    assert(SnapshotTable.commit(rows(2, "c"), t) == 3)
    assert(SnapshotTable.versions(t) == Seq(1, 2, 3))
    assert(SnapshotTable.read(spark, t, 1).count() == 3)
    assert(SnapshotTable.read(spark, t, 2).count() == 5)
    // latest (unversioned) read = v3
    assert(SnapshotTable.read(spark, t).agg(max($"k")).head().getLong(0) == 2)
    intercept[IllegalArgumentException] {
      SnapshotTable.read(spark, t, 9)
    }
  }

  test("snapshot isolation: a reader holding v1 is undisturbed by later commits") {
    val t = freshDir()
    SnapshotTable.commit(rows(4, "v1"), t)
    val held = SnapshotTable.read(spark, t, 1) // resolved file list NOW
    SnapshotTable.commit(rows(9, "v2"), t)
    SnapshotTable.commit(rows(1, "v3"), t)
    // collect AFTER the rewrites: the held frame must still be v1
    val got = held.select($"k", $"tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == (1 to 4).map(i => (i.toLong, "v1")).toSet)
  }

  test("atomic visibility: a crashed commit (data files, no manifest) is invisible") {
    val t = freshDir()
    SnapshotTable.commit(rows(3, "live"), t)
    // simulate a writer that died after its data write, before its
    // manifest rename: orphan parquet under data/, no log entry
    rows(99, "crashed").write.parquet(s"$t/data/v2_crashed_0")
    assert(SnapshotTable.versions(t) == Seq(1),
      "orphan data files must not mint a version")
    assert(SnapshotTable.read(spark, t).count() == 3,
      "the latest read must not see the crashed writer's files")
  }

  test("linear history: a manifest collision retries at the next version, data intact") {
    val t = freshDir()
    SnapshotTable.commit(rows(2, "v1"), t)
    SnapshotTable.commit(rows(3, "v2"), t)
    // a 'racing writer' that computed proposed = 2 while v2 already
    // exists: publish must land at 3, re-pointing the same files
    val v2files = Files.readAllLines(
      new File(s"$t/_snaplog/v2.manifest").toPath)
    val landed = SnapshotTable.publishManifest(t,
      scala.jdk.CollectionConverters.ListHasAsScala(v2files).asScala.toSeq, 2)
    assert(landed == 3)
    assert(SnapshotTable.versions(t) == Seq(1, 2, 3))
    // v3 = the retried writer's content (= v2's files here)
    assert(SnapshotTable.read(spark, t, 3).count() == 3)
  }

  test("compact rewrites the latest snapshot smaller as a NEW version; old versions untouched") {
    val t = freshDir()
    SnapshotTable.commit(rows(64, "frag").repartition(8), t)
    val fragFiles = Files.readAllLines(
      new File(s"$t/_snaplog/v1.manifest").toPath).size
    assert(fragFiles == 8, s"fixture should fragment into 8, got $fragFiles")
    val v = SnapshotTable.compact(spark, t, targetFiles = 1)
    assert(v == 2)
    val compactedFiles = Files.readAllLines(
      new File(s"$t/_snaplog/v2.manifest").toPath).size
    assert(compactedFiles == 1)
    // content identical, fragmented version still readable
    def content(ver: Int) = SnapshotTable.read(spark, t, ver)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(content(2) == content(1) && content(1).size == 64)
  }

  test("vacuum drops unreferenced files and old manifests; retained snapshots keep serving") {
    val t = freshDir()
    SnapshotTable.commit(rows(3, "v1"), t)
    SnapshotTable.commit(rows(5, "v2"), t)
    SnapshotTable.commit(rows(7, "v3"), t)
    val before = SnapshotTable.read(spark, t, 3)
    SnapshotTable.vacuum(t, retainFrom = 3)
    assert(SnapshotTable.versions(t) == Seq(3))
    assert(SnapshotTable.read(spark, t, 3).count() == 7)
    assert(before.count() == 7,
      "a reader that resolved v3 before the vacuum keeps reading it")
    // v1/v2's data files are gone from disk
    val dataDirs = new File(s"$t/data").listFiles()
    assert(dataDirs != null && dataDirs.forall(d =>
      d.listFiles() == null || d.listFiles().exists(f =>
        f.getName.endsWith(".parquet"))),
      "vacuum must remove emptied data dirs or leave only live files")
    val liveFiles = dataDirs.flatMap(d =>
      Option(d.listFiles()).getOrElse(Array.empty[File]))
      .count(_.getName.endsWith(".parquet"))
    val v3listed = Files.readAllLines(
      new File(s"$t/_snaplog/v3.manifest").toPath).size
    assert(liveFiles == v3listed,
      s"only v3's $v3listed files may survive, found $liveFiles")
  }
}
