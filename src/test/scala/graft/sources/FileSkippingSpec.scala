package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** File-level min–max skipping: stats shape, conservative pruning (strictly
  * fewer files opened on a range-clustered layout, never a lost row), null
  * stats kept, and the empty-candidate fast path.
  */
class FileSkippingSpec extends SparkSpec {
  import spark.implicits._

  private val path = "/root/repo/target/qtmp/skipping_spec"

  private def layout(): Unit =
    (0 until 1000).map(i => (i.toLong, i / 10, s"r$i")).toDF("k", "v", "s")
      .repartitionByRange(10, col("k"))
      .write.mode("overwrite").parquet(path)

  test("fileStats: one row per file, min <= max, every file covered") {
    layout()
    val stats = FileSkipping.fileStats(spark, path, Seq("k", "v"))
    val n = stats.count()
    assert(n == 10, s"expected 10 range-clustered files, got $n")
    assert(stats.filter(col("k_min") > col("k_max")).count() == 0)
    assert(stats.filter(col("v_min").isNull).count() == 0)
  }

  test("range probe opens strictly fewer files and loses no row") {
    layout()
    val stats = FileSkipping.fileStats(spark, path, Seq("k"))
    val cand = FileSkipping.candidateFiles(stats, "k", lit(150L), lit(249L))
    assert(cand.nonEmpty && cand.size < 10,
      s"pruning must drop files on a range-clustered layout, kept ${cand.size}")
    val pruned = FileSkipping.readRange(spark, path, stats, "k", lit(150L), lit(249L))
      .select("k", "v", "s")
    val full = spark.read.parquet(path)
      .filter(col("k") >= 150L && col("k") <= 249L).select("k", "v", "s")
    assert(pruned.collect().toSet == full.collect().toSet)
    assert(pruned.count() == 100)
  }

  test("a file with all-null stats is conservatively kept") {
    val p = "/root/repo/target/qtmp/skipping_nulls"
    Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b")).toDF("k", "s")
      .coalesce(1).write.mode("overwrite").parquet(p)
    Seq[(java.lang.Long, String)]((null, "x"), (null, "y")).toDF("k", "s")
      .coalesce(1).write.mode("append").parquet(p)
    val stats = FileSkipping.fileStats(spark, p, Seq("k"))
    // the null-only file's min/max are null -> predicate unknown -> kept
    assert(FileSkipping.candidateFiles(stats, "k", lit(100L), lit(200L)).size == 1)
    assert(stats.count() == 2)
  }

  test("no candidate file yields an empty, correctly-schemaed scan") {
    layout()
    val stats = FileSkipping.fileStats(spark, path, Seq("k"))
    assert(FileSkipping.candidateFiles(stats, "k", lit(5000L), lit(6000L)).isEmpty)
    val out = FileSkipping.readRange(spark, path, stats, "k", lit(5000L), lit(6000L))
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("k", "v", "s"))
  }

  private val bloomPath = "/root/repo/target/qtmp/skipping_bloom"

  /** k-clustered layout; `u` is uncorrelated with k except one rare value
    * 999999 that lives in exactly one file — the case min-max cannot prune
    * (every file's u range spans ~the full space) and bloom can.
    */
  private def bloomLayout(): Unit =
    (0 until 1000)
      .map(i => (i.toLong, if (i == 123) 999999L else (i % 97).toLong))
      .toDF("k", "u")
      .repartitionByRange(10, col("k"))
      .write.mode("overwrite").parquet(bloomPath)

  test("bloomStats: one row per file, position sets bounded by bits and sorted") {
    bloomLayout()
    val stats = FileSkipping.bloomStats(spark, bloomPath, "u", bits = 512)
    assert(stats.count() == 10)
    val rows = stats.select("u_bloom1", "u_bloom2").as[(Seq[Int], Seq[Int])].collect()
    rows.foreach { case (b1, b2) =>
      assert(b1.nonEmpty && b1.size <= 512 && b1 == b1.sorted && b1.forall(p => p >= 0 && p < 512))
      assert(b2.nonEmpty && b2.size <= 512 && b2 == b2.sorted)
    }
  }

  test("bloom point probe on a non-clustered column prunes files, loses no row") {
    bloomLayout()
    val stats = FileSkipping.bloomStats(spark, bloomPath, "u", bits = 4096)
    // min-max is useless here: every file's u-range spans ~[0, 96]
    val mm = FileSkipping.fileStats(spark, bloomPath, Seq("u"))
    assert(FileSkipping.candidateFiles(mm, "u", lit(50L), lit(50L)).size == 10,
      "layout sanity: ranges cannot prune the uncorrelated column")
    val cand = FileSkipping.bloomCandidateFiles(spark, stats, "u", lit(999999L), 4096)
    assert(cand.nonEmpty && cand.size < 10,
      s"bloom must prune files for a rare key, kept ${cand.size}")
    val got = FileSkipping.readEquality(spark, bloomPath, stats, "u", lit(999999L), 4096)
      .select("k").as[Long].collect().toSeq
    assert(got == Seq(123L), s"exactly the matching row, got $got")
    // common value: present everywhere, bloom keeps everything, result exact
    val common = FileSkipping.readEquality(spark, bloomPath, stats, "u", lit(50L), 4096)
      .count()
    assert(common == spark.read.parquet(bloomPath).filter(col("u") === 50L).count())
  }

  test("bloom probe for an absent key returns empty (fp-opened files filtered)") {
    bloomLayout()
    val stats = FileSkipping.bloomStats(spark, bloomPath, "u", bits = 4096)
    val out = FileSkipping.readEquality(spark, bloomPath, stats, "u", lit(777777L), 4096)
    assert(out.count() == 0)
  }
}
