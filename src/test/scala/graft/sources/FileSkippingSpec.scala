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
}
