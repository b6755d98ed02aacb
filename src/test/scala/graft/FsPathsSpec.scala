package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.FsPaths

/** Qualified-path identity (the compaction src≠dst guard) and the
  * rename-based rebuild/swap with crash-window recovery that the
  * in-loop index compaction relies on.
  */
class FsPathsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(name: String): String = {
    val f = java.nio.file.Files.createTempDirectory(name).toFile
    f.deleteOnExit()
    f.getPath
  }

  test("samePath sees through scheme'd and trailing-slash aliases") {
    val d = tmp("fspaths")
    // the aliases java.io.File-based comparison used to miss
    assert(FsPaths.samePath(spark, d, d + "/"))
    assert(FsPaths.samePath(spark, d, "file:" + d))
    assert(FsPaths.samePath(spark, "file:" + d + "/", d))
    assert(!FsPaths.samePath(spark, d, d + "2"))
    // the compaction guards must reject the aliased form
    val ex = intercept[IllegalArgumentException] {
      graft.ops.TextDedup.compactIncrementalIndex(spark, d, "file:" + d + "/")
    }
    assert(ex.getMessage.contains("fresh directory"))
    val ex2 = intercept[IllegalArgumentException] {
      graft.ops.Similarity.compactIvfIndex(spark, "file:" + d, d + "/")
    }
    assert(ex2.getMessage.contains("fresh directory"))
  }

  private def write(dir: String, name: String): Unit = {
    // the rebuild callback receives a QUALIFIED path (file:/...) — strip
    // the scheme for plain java.io writes
    val f = new java.io.File(dir.stripPrefix("file:"), name)
    f.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(f, "UTF-8")
    try w.print(name) finally w.close()
  }
  private def names(dir: String): Set[String] =
    Option(new java.io.File(dir.stripPrefix("file:")).listFiles())
      .map(_.map(_.getName).toSet).getOrElse(Set.empty)

  test("rebuildAndSwap replaces the live dir; stale scratch is wiped first") {
    val live = tmp("swap-live")
    write(live, "old-content")
    // a crashed earlier attempt left a stale scratch dir — must be wiped
    write(live + "__compact", "stale")
    FsPaths.rebuildAndSwap(spark, live) { dst =>
      assert(names(dst).isEmpty, "scratch dir must start empty")
      write(dst, "new-content")
    }
    assert(names(live) == Set("new-content"))
    assert(!new java.io.File(live + "__compact").exists())
    assert(!new java.io.File(live + "__old").exists())
  }

  test("rebuildAndSwap on an interrupted-swap state heals before wiping") {
    // A prior swap crashed between the two renames: live is missing and
    // __compact holds the only complete copy. A direct rebuildAndSwap
    // call (no recoverSwap first — the ext_embed_ingest_rebuild pattern)
    // must heal that state before its scratch wipe, or the wipe destroys
    // the index and the build callback reads a nonexistent live dir.
    val a = tmp("swap-direct-a")
    val aLive = a + "/idx"
    write(a + "/idx__compact", "only-copy")
    FsPaths.rebuildAndSwap(spark, aLive) { dst =>
      // the heal must have landed the only copy at live before build runs
      assert(names(aLive) == Set("only-copy"))
      write(dst, "rebuilt")
    }
    assert(names(aLive) == Set("rebuilt"))
    // same, with __old holding the only copy (crash before the wipe of a
    // legacy attempt, or a heal raced by a crash)
    val b = tmp("swap-direct-b")
    val bLive = b + "/idx"
    write(b + "/idx__old", "only-copy")
    FsPaths.rebuildAndSwap(spark, bLive) { dst =>
      assert(names(bLive) == Set("only-copy"))
      write(dst, "rebuilt")
    }
    assert(names(bLive) == Set("rebuilt"))
  }

  test("recoverSwap heals every crash window") {
    // window 1: after live -> __old, before scratch -> live
    val a = tmp("swap-a")
    val aLive = a + "/idx"
    write(a + "/idx__old", "old")
    write(a + "/idx__compact", "fresh")
    FsPaths.recoverSwap(spark, aLive)
    assert(names(aLive) == Set("fresh"), "must finish the interrupted swap")
    assert(!new java.io.File(a + "/idx__old").exists())
    // window 2: after scratch -> live, before __old delete
    val b = tmp("swap-b")
    val bLive = b + "/idx"
    write(bLive, "fresh")
    write(b + "/idx__old", "old")
    FsPaths.recoverSwap(spark, bLive)
    assert(names(bLive) == Set("fresh"))
    assert(!new java.io.File(b + "/idx__old").exists())
    // no-op on a healthy dir
    val c = tmp("swap-c")
    val cLive = c + "/idx"
    write(cLive, "content")
    FsPaths.recoverSwap(spark, cLive)
    assert(names(cLive) == Set("content"))
  }
}
