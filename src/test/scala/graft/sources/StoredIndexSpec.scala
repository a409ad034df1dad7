package graft.sources

import graft.SparkSpec

/** The shared stored-index protocol: generation-numbered CAS meta with
  * EXCLUSIVE publish. The mutual-exclusion case matters most — Hadoop's
  * LocalFileSystem rename silently REPLACES an existing destination
  * (POSIX rename(2)), so a rename-based publish lets two same-generation
  * racers both "win"; the link(2)-based publish here guarantees exactly
  * one winner even on the local filesystem.
  */
class StoredIndexSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("stored-index").toString

  test("kv meta round-trips through the generation file") {
    val dir = tmp()
    try {
      assert(StoredIndex.metaGeneration(spark, dir) == -1)
      StoredIndex.writeMetaCas(spark, dir,
        Seq("alpha" -> "1", "beta" -> "x=y", "empty" -> ""), -1)
      val (kv, gen) = StoredIndex.readKvWithGen(spark, dir)
      assert(gen == 0)
      // values keep everything after the FIRST '=' (beta's value has one)
      assert(kv == Map("alpha" -> "1", "beta" -> "x=y", "empty" -> ""))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("a stale writer fails the CAS precheck fast") {
    val dir = tmp()
    try {
      StoredIndex.writeMetaCas(spark, dir, Seq("v" -> "0"), -1)
      StoredIndex.writeMetaCas(spark, dir, Seq("v" -> "1"), 0)
      val e = intercept[StoredIndex.ConcurrentIndexWriteException] {
        StoredIndex.writeMetaCas(spark, dir, Seq("v" -> "stale"), 0)
      }
      assert(e.getMessage.contains("generation"))
      assert(StoredIndex.readKvWithGen(spark, dir)._1("v") == "1")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("same-generation racers: exactly one publish wins on the local filesystem") {
    // 8 threads all hold generation 0 and race to publish generation 1.
    // The pre-link CAS check cannot serialize them (they all pass it
    // before any publish lands); only the exclusive-create publish can.
    // With the old rename-based publish this test FAILS: LocalFileSystem
    // rename replaces the destination, so several racers "win" and the
    // last one silently clobbers the others.
    val dir = tmp()
    try {
      StoredIndex.writeMetaCas(spark, dir, Seq("writer" -> "init"), -1)
      val racers = 8
      val barrier = new java.util.concurrent.CyclicBarrier(racers)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val losses = new java.util.concurrent.atomic.AtomicInteger(0)
      val winners = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      val threads = (0 until racers).map { i =>
        new Thread(() => {
          barrier.await()
          try {
            StoredIndex.writeMetaCas(spark, dir, Seq("writer" -> i.toString), 0)
            wins.incrementAndGet(); winners.add(i)
          } catch {
            case _: StoredIndex.ConcurrentIndexWriteException =>
              losses.incrementAndGet()
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(30000))
      assert(wins.get == 1 && losses.get == racers - 1,
        s"expected exactly one winner, got ${wins.get} wins / ${losses.get} losses")
      // the published meta is the winner's, intact — not a last-write mix
      val (kv, gen) = StoredIndex.readKvWithGen(spark, dir)
      assert(gen == 1 && winners.contains(kv("writer").toInt))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("generation sweep keeps exactly the previous generation") {
    val dir = tmp()
    try {
      for (g <- -1 until 4)
        StoredIndex.writeMetaCas(spark, dir, Seq("g" -> (g + 1).toString), g)
      def exists(n: Int) = new java.io.File(s"$dir/meta_g$n").exists()
      assert(!exists(0) && !exists(1) && !exists(2),
        "generations older than the previous must be swept")
      assert(exists(3), "the previous generation is the reader grace copy")
      assert(exists(4))
      assert(StoredIndex.readKvWithGen(spark, dir) == (Map("g" -> "4"), 4))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("no temp droppings survive a publish or a lost race") {
    val dir = tmp()
    try {
      StoredIndex.writeMetaCas(spark, dir, Seq("a" -> "1"), -1)
      intercept[StoredIndex.ConcurrentIndexWriteException] {
        StoredIndex.writeMetaCas(spark, dir, Seq("a" -> "2"), 5)
      }
      val stray = new java.io.File(dir).listFiles()
        .map(_.getName).filter(n => n.startsWith(".") && n.contains("meta_g"))
      assert(stray.isEmpty, s"leftover temp files: ${stray.mkString(", ")}")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("a crashed writer's temp dropping drains on the next successful write") {
    val dir = tmp()
    try {
      StoredIndex.writeMetaCas(spark, dir, Seq("a" -> "1"), -1)
      // simulate a writer that died between creating its temp and
      // publishing generation 1 (kill -9 window)
      val orphan = new java.io.File(dir, ".meta_g1.tmp.deadbeef")
      assert(orphan.createNewFile())
      // a write at the SAME generation leaves it (it cannot distinguish a
      // crashed writer from a live racer mid-publish)...
      StoredIndex.writeMetaCas(spark, dir, Seq("a" -> "2"), 0)
      assert(orphan.exists(), "same-generation temp must not be swept under a live racer")
      // ...and the NEXT generation's write drains it
      StoredIndex.writeMetaCas(spark, dir, Seq("a" -> "3"), 1)
      assert(!orphan.exists(), "crashed-writer temp dropping not swept")
      assert(StoredIndex.readKvWithGen(spark, dir) == (Map("a" -> "3"), 2))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("epoch sweep walks through holes left by a crashed sweep instead of " +
    "permanently orphaning the epochs below them") {
    val dir = tmp()
    try {
      // epochs 0,1,2,4,5 live; epoch 3 is a HOLE (a previous sweep died
      // right after deleting it) — the old first-all-missing stop stranded
      // epochs 0-2 forever, since every later walk re-hit the hole first
      Seq(0, 1, 2, 4, 5).foreach { e =>
        val d = new java.io.File(StoredIndex.relPath(dir, "rel", e))
        assert(d.mkdirs())
        java.nio.file.Files.write(d.toPath.resolve("part"), "x".getBytes)
      }
      StoredIndex.sweepEpochsBelow(spark, dir, Seq("rel"), 6)
      (0 to 5).foreach { e =>
        assert(!new java.io.File(StoredIndex.relPath(dir, "rel", e)).exists(),
          s"epoch $e survived the sweep")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
