package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The saved-index path + atomicity discipline every index family
  * (IVF, IVF-PQ, MinHash signatures) builds through. */
class IndexStoreSpec extends AnyFunSuite {

  private def freshTarget(): String =
    new File(Files.createTempDirectory("graft_idxstore").toFile,
      "idx").getPath

  test("ensure builds once and publishes atomically; later calls skip the build") {
    val path = freshTarget()
    var builds = 0
    def build(dir: String): Unit = {
      builds += 1
      new File(dir).mkdirs()
      Files.write(new File(dir, "data").toPath, "x".getBytes)
    }
    assert(IndexStore.ensure(path)(build) == path)
    assert(builds == 1 && IndexStore.isComplete(path))
    assert(new File(path, "data").exists())
    IndexStore.ensure(path)(build)
    assert(builds == 1, "a complete index must never rebuild")
  }

  test("incomplete debris at the target is cleared and the build republished") {
    val path = freshTarget()
    // simulate a crashed run: target exists but has no completion
    // marker — ensure must not serve it and must not get stuck
    new File(path).mkdirs()
    Files.write(new File(path, "stale").toPath, "junk".getBytes)
    var built = false
    IndexStore.ensure(path) { dir =>
      built = true
      new File(dir).mkdirs()
      Files.write(new File(dir, "data").toPath, "y".getBytes)
    }
    assert(built && IndexStore.isComplete(path))
    assert(new File(path, "data").exists())
    assert(!new File(path, "stale").exists(),
      "crashed-run debris must be replaced by the fresh build")
  }

  test("stampedPath keys on the source file's (mtime, length)") {
    val dir = Files.createTempDirectory("graft_idxstamp").toString
    val src = new File(dir, "t.parquet")
    Files.write(src.toPath, "aaaa".getBytes)
    val p1 = IndexStore.stampedPath("fam", dir, "t.parquet")
    assert(p1.startsWith(IndexStore.baseDir.getPath),
      "index paths must live under the per-user base dir")
    // same source → same path (lookups are stable)
    assert(IndexStore.stampedPath("fam", dir, "t.parquet") == p1)
    // regenerated source (different content length) → different path
    Files.write(src.toPath, "bbbbbbbb".getBytes)
    assert(IndexStore.stampedPath("fam", dir, "t.parquet") != p1,
      "a regenerated fixture must never resolve to the old index")
  }

  test("stampedPath refuses a missing source (no dead _0_0 stamp)") {
    // File.lastModified/length both return 0 for nonexistent paths:
    // without the guard a missing fixture mints a `_0_0` stamp that
    // NEVER invalidates — and would keep serving a stale index after
    // the source appears
    val dir = Files.createTempDirectory("graft_idxmissing").toString
    val err = intercept[IllegalArgumentException] {
      IndexStore.stampedPath("fam", dir, "nope.parquet")
    }
    assert(err.getMessage.contains("does not exist"))
  }

  test("stampedPath stamps a DIRECTORY source from its children; child rewrite restamps") {
    val dir = Files.createTempDirectory("graft_idxdirstamp").toString
    val src = new File(dir, "ds.parquet") // directory dataset
    val part = new File(src, "cid=3")     // partitioned layout nests
    part.mkdirs()
    val child = new File(part, "part-0.parquet")
    Files.write(child.toPath, "aaaa".getBytes)
    val p1 = IndexStore.stampedPath("fam", dir, "ds.parquet")
    assert(IndexStore.stampedPath("fam", dir, "ds.parquet") == p1,
      "unchanged directory source must resolve to the same stamp")
    // rewriting a NESTED part file must restamp even though the top
    // directory's own mtime only tracks entry creation/removal
    Files.write(child.toPath, "bbbbbbbb".getBytes)
    assert(IndexStore.stampedPath("fam", dir, "ds.parquet") != p1,
      "a rewritten part file must never resolve to the old index")
  }

  test("losing the publish race serves the winner's index and discards ours") {
    val path = freshTarget()
    // the build itself publishes a COMPLETE index at the target —
    // exactly what a faster cross-process publisher does while our
    // build runs; our rename must lose, keep the winner's files, and
    // clean up our temp dir
    IndexStore.ensure(path) { dir =>
      new File(dir).mkdirs()
      Files.write(new File(dir, "ours").toPath, "mine".getBytes)
      new File(path).mkdirs()
      Files.write(new File(path, "winner").toPath, "theirs".getBytes)
      Files.write(new File(path, "_GRAFT_INDEX_COMPLETE").toPath,
        Array.empty[Byte])
    }
    assert(IndexStore.isComplete(path))
    assert(new File(path, "winner").exists(),
      "the winner's published index must be served untouched")
    assert(!new File(path, "ours").exists(),
      "the loser's build must not replace the winner's")
    val leftovers = new File(path).getParentFile.listFiles()
      .filter(_.getName.startsWith(new File(path).getName + ".build-"))
    assert(leftovers.isEmpty, "the loser's temp build dir must be cleaned up")
  }

  test("debris recovery never deletes the squatting target in place (reader keeps its files)") {
    val path = freshTarget()
    new File(path).mkdirs()
    val squatFile = new File(path, "half-written")
    Files.write(squatFile.toPath, "debris".getBytes)
    // a reader that opened a file of the squatting dir before recovery
    // must still be able to read it afterwards (rename-aside keeps the
    // inode; delete-in-place under POSIX keeps open handles too, but
    // rename-aside also keeps the PATHS valid until recovery finishes)
    val in = new java.io.FileInputStream(squatFile)
    IndexStore.ensure(path) { dir =>
      new File(dir).mkdirs()
      Files.write(new File(dir, "data").toPath, "fresh".getBytes)
    }
    val buf = new Array[Byte](6)
    assert(in.read(buf) == 6 && new String(buf) == "debris",
      "a reader mid-scan of the squatter must not lose its open file")
    in.close()
    assert(IndexStore.isComplete(path) && new File(path, "data").exists())
    assert(!new File(path, "half-written").exists())
    // no .stale-* leftovers once recovery completed
    val stale = new File(path).getParentFile.listFiles()
      .filter(_.getName.contains(".stale-"))
    assert(stale.isEmpty, "recovery must clean up the set-aside debris")
  }

  test("publishing a new stamp garbage-collects superseded stamps, nothing else") {
    val family = Files.createTempDirectory("graft_idxgc").toFile
    def mkComplete(name: String): File = {
      val d = new File(family, name)
      d.mkdirs()
      Files.write(new File(d, "_GRAFT_INDEX_COMPLETE").toPath,
        Array.empty[Byte])
      d
    }
    val old1 = mkComplete("_root_td_sf0_1_100_4")    // superseded stamp
    val old2 = mkComplete("_root_td_sf0_1_200_8")    // superseded stamp
    val other = mkComplete("_root_td_sf0_1_bak_100_4") // DIFFERENT dir
    val building = new File(family, "_root_td_sf0_1_300_9.build-1-2")
    building.mkdirs()                                 // in-flight build
    IndexStore.ensure(new File(family, "_root_td_sf0_1_300_9").getPath) {
      dir =>
        new File(dir).mkdirs()
        Files.write(new File(dir, "data").toPath, "n".getBytes)
    }
    assert(!old1.exists() && !old2.exists(),
      "superseded stamps of the same fixture dir must be collected")
    assert(other.exists(),
      "an index of a different fixture dir must never be touched")
    assert(building.exists(),
      "in-flight .build temp dirs must be left alone")
  }

  test("concurrent ensure calls on one path build exactly once") {
    val path = freshTarget()
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        IndexStore.ensure(path) { dir =>
          builds.incrementAndGet()
          new File(dir).mkdirs()
          Files.write(new File(dir, "data").toPath, "z".getBytes)
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(builds.get() == 1 && IndexStore.isComplete(path))
  }
}
