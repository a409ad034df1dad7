package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The generic additive-statistics store's protocol edges: the
  * fresh-dir-only init contract, attempt-tagged compaction epochs, the
  * fold-snapshot watermark, and orphan aging. (The happy-path lifecycle
  * is exercised end-to-end by LineDedup/Datacard/QuotaView and the
  * streaming soak; these are the crash/race contracts.)
  */
class AdditiveStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("additive-stats").toString

  private def store(dir: String) = AdditiveStats.Store(
    dir, Seq("k"), "c", "k string, c bigint, batch_id bigint")

  private def frag(rows: (String, Long)*) = rows.toDF("k", "c")

  test("init refuses an existing store instead of resetting its state") {
    val dir = tmp()
    AdditiveStats.init(spark, store(dir))
    AdditiveStats.append(frag("a" -> 2L), store(dir), 0L)
    AdditiveStats.compact(spark, store(dir))
    assert(AdditiveStats.compactedThrough(spark, store(dir)) == 0L)
    // re-init would zero the epoch and the replay watermark — a replay
    // of batch 0 would then double-count; it must fail loudly
    val e = intercept[IllegalArgumentException] {
      AdditiveStats.init(spark, store(dir))
    }
    assert(e.getMessage.contains("already exists"))
    assert(AdditiveStats.compactedThrough(spark, store(dir)) == 0L)
  }

  test("compaction publishes an attempt-tagged epoch dir; the watermark " +
    "is the max batch of exactly what was folded") {
    val dir = tmp()
    AdditiveStats.init(spark, store(dir))
    AdditiveStats.append(frag("a" -> 1L, "b" -> 2L), store(dir), 0L)
    AdditiveStats.append(frag("a" -> 3L), store(dir), 1L)
    AdditiveStats.compact(spark, store(dir))
    val names = new java.io.File(dir).list().toSeq
    assert(names.exists(_.matches("stats_e1_w[0-9a-f]+")), names)
    assert(AdditiveStats.compactedThrough(spark, store(dir)) == 1L)
    assert(AdditiveStats.fragmentCount(spark, store(dir)) == 0)
    val got = AdditiveStats.read(spark, store(dir))
      .groupBy("k").agg(sum("c").as("c"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 4L, "b" -> 2L))
    // a replay of a folded batch is a no-op; a new batch lands
    AdditiveStats.append(frag("a" -> 99L), store(dir), 1L)
    AdditiveStats.append(frag("b" -> 5L), store(dir), 2L)
    val after = AdditiveStats.read(spark, store(dir))
      .groupBy("k").agg(sum("c").as("c"))
      .as[(String, Long)].collect().toMap
    assert(after == Map("a" -> 4L, "b" -> 7L))
  }

  test("a racer's same-epoch attempt dir can't shadow the live one and " +
    "ages out two compactions later") {
    val dir = tmp()
    AdditiveStats.init(spark, store(dir))
    AdditiveStats.append(frag("a" -> 1L), store(dir), 0L)
    AdditiveStats.compact(spark, store(dir)) // live: stats_e1_w<tag>
    // a compaction racer that lost the CAS wrote ITS fold to a different
    // attempt dir of the same epoch — readers resolving through the meta
    // never see it (pre-tag, both attempts targeted one path and the
    // loser's overwrite clobbered the winner's live relation)
    val orphan = s"$dir/stats_e1_wdeadbeef"
    frag("poison" -> 777L).withColumn("batch_id", lit(-1L))
      .write.partitionBy("batch_id").parquet(orphan)
    val got = AdditiveStats.read(spark, store(dir))
      .select("k").as[String].collect().toSet
    assert(got == Set("a"))
    AdditiveStats.append(frag("b" -> 1L), store(dir), 1L)
    AdditiveStats.compact(spark, store(dir)) // epoch 2: epoch 0 swept
    AdditiveStats.append(frag("c" -> 1L), store(dir), 2L)
    AdditiveStats.compact(spark, store(dir)) // epoch 3: epoch 1 + orphan swept
    assert(!new java.io.File(orphan).exists())
    assert(AdditiveStats.read(spark, store(dir))
      .select("k").as[String].collect().toSet == Set("a", "b", "c"))
  }

  test("a corrupt store surfaces instead of reading as empty") {
    val dir = tmp()
    AdditiveStats.init(spark, store(dir))
    AdditiveStats.append(frag("a" -> 1L), store(dir), 0L)
    // clobber the live relation's files with non-parquet bytes: read()
    // must propagate the failure, not silently return the empty frame
    // an admission operator would over-admit against
    val live = new java.io.File(dir).listFiles()
      .find(_.getName.startsWith("stats")).get
    def smash(f: java.io.File): Unit =
      if (f.isDirectory) f.listFiles().foreach(smash)
      else if (f.getName.endsWith(".parquet"))
        java.nio.file.Files.write(f.toPath, "not parquet".getBytes)
    smash(live)
    intercept[Exception] {
      AdditiveStats.read(spark, store(dir)).count()
    }
  }
}
