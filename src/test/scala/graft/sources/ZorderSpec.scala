package graft.sources

import graft.SparkSpec
import graft.plans.{InterleaveBitsExpr, SearchSortedExpr}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Z-order layout: the interleave/searchsorted kernels against reference
  * definitions, content identity of the rewrite, the footer-stats pruning
  * proof (the point of the layout), and the crash-swap drills.
  */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ kernels

  test("interleavePacked matches the per-bit reference for 2/3/4 dims") {
    def reference(vals: Seq[Int]): Long = {
      var out = 0L
      for (bit <- 15 to 0 by -1; v <- vals)
        out = (out << 1) | ((v >> bit) & 1)
      out
    }
    val rnd = new scala.util.Random(7)
    for (n <- 2 to 4; _ <- 1 to 200) {
      val vals = Seq.fill(n)(rnd.nextInt(0x10000))
      var packed = 0L
      vals.zipWithIndex.foreach { case (v, i) =>
        packed |= (v.toLong & 0xffffL) << (16 * i)
      }
      assert(InterleaveBitsExpr.interleavePacked(packed, n) == reference(vals))
    }
    // clamping
    assert(InterleaveBitsExpr.clamp16(-5) == 0)
    assert(InterleaveBitsExpr.clamp16(70000) == 0xffff)
  }

  test("zorderCode evaluates via codegen and propagates nulls") {
    val df = Seq((Some(1), Some(2)), (None, Some(3)), (Some(4), None))
      .toDF("a", "b")
    val got = df.select(InterleaveBitsExpr.zorderCode(col("a"), col("b")).as("z"))
      .as[Option[Long]].collect().toSeq
    assert(got(1).isEmpty && got(2).isEmpty)
    // (1, 2): bit0 of a=1, bit1 of b=2 -> z = a interleaved high-first
    var packed = (1L & 0xffffL) | ((2L & 0xffffL) << 16)
    assert(got(0).contains(InterleaveBitsExpr.interleavePacked(packed, 2)))
  }

  test("searchSorted matches numpy side=right semantics") {
    val cuts = Array(10.0, 20.0, 30.0)
    assert(SearchSortedExpr.search(cuts, 5.0) == 0)
    assert(SearchSortedExpr.search(cuts, 10.0) == 1) // at cutoff -> right
    assert(SearchSortedExpr.search(cuts, 19.9) == 1)
    assert(SearchSortedExpr.search(cuts, 30.0) == 3)
    assert(SearchSortedExpr.search(cuts, 99.0) == 3)
    val got = Seq(5.0, 10.0, 25.0, 35.0).toDF("v")
      .select(SearchSortedExpr.searchSorted(col("v"), cuts).as("c"))
      .as[Int].collect().toSeq
    assert(got == Seq(0, 1, 2, 3))
  }

  // ------------------------------------------------------ layout effect

  /** Per-file [min, max] envelope of `column` from the parquet footers —
    * exactly the statistics scan pruning consults.
    */
  private def envelopes(dir: String, column: String): Seq[(String, Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = reader.getFooter.getBlocks
          import scala.jdk.CollectionConverters._
          val stats = blocks.asScala.map { b =>
            b.getColumns.asScala.find(_.getPath.toDotString == column).get.getStatistics
          }
          val mins = stats.map(_.genericGetMin.asInstanceOf[Number].longValue)
          val maxs = stats.map(_.genericGetMax.asInstanceOf[Number].longValue)
          (f.getPath.getName, mins.min, maxs.max)
        } finally reader.close()
      }
  }

  private def intersecting(env: Seq[(String, Long, Long)], lo: Long, hi: Long): Int =
    env.count { case (_, mn, mx) => mx >= lo && mn <= hi }

  test("rewrite preserves content and makes files prunable on BOTH z columns") {
    val dir = Files.createTempDirectory("zorder").toString + "/t"
    val n = 40000L
    // a is the write order; b is independent -> row-order files have
    // full-range b envelopes and b-predicates can prune NOTHING
    val df = spark.range(n).select(
      col("id").as("a"),
      ((col("id") * 48271) % n).as("b"))
    df.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(dir)

    val beforeB = intersecting(envelopes(dir, "b"), 0L, (n / 20) - 1)
    assert(beforeB == 16, s"row-order layout should not prune on b: $beforeB")

    Zorder.rewrite(spark, dir, Seq("a", "b"), numFiles = 16)

    val after = spark.read.parquet(dir)
    assert(after.count() == n)
    // content identity: same multiset of rows
    assert(after.agg(sum(col("a")), sum(col("b") * col("b")))
      .as[(Long, Long)].head() ==
      df.agg(sum(col("a")), sum(col("b") * col("b"))).as[(Long, Long)].head())

    // a 5%-box on either column now touches a small fraction of the files
    val afterA = intersecting(envelopes(dir, "a"), 0L, (n / 20) - 1)
    val afterB = intersecting(envelopes(dir, "b"), 0L, (n / 20) - 1)
    assert(afterA <= 8, s"a-box should prune most files, touched $afterA/16")
    assert(afterB <= 8, s"b-box should prune most files, touched $afterB/16")
  }

  test("idempotent re-run and crash recovery drills") {
    val dir = Files.createTempDirectory("zorder").toString + "/t"
    spark.range(1000).select(col("id").as("a"), (col("id") % 37).as("b"))
      .coalesce(4).write.mode("overwrite").parquet(dir)
    Zorder.rewrite(spark, dir, Seq("a", "b"), numFiles = 4)
    val sum1 = spark.read.parquet(dir).agg(sum("a")).as[Long].head()
    Zorder.rewrite(spark, dir, Seq("a", "b"), numFiles = 4)
    assert(spark.read.parquet(dir).agg(sum("a")).as[Long].head() == sum1)

    val conf = spark.sparkContext.hadoopConfiguration
    val stage = new Path(new Path(dir).getParent, s".${new Path(dir).getName}.zorder")
    val fs = stage.getFileSystem(conf)

    // unmarked stage (crash mid-staging) -> discarded, table untouched
    fs.mkdirs(stage)
    val junk = fs.create(new Path(stage, "part-junk.parquet"), true)
    junk.write(Array[Byte](1, 2, 3)); junk.close()
    assert(!Zorder.recover(spark, dir))
    assert(!fs.exists(stage))
    assert(spark.read.parquet(dir).count() == 1000)

    // marked stage (crash mid-swap) -> re-applied idempotently: stage a
    // DIFFERENT clustered copy by hand, mark it, then recover
    val alt = spark.read.parquet(dir).repartition(2)
    alt.write.mode("overwrite").parquet(stage.toString)
    val names = fs.listStatus(stage).filter(_.isFile)
      .map(_.getPath.getName).filter(n => !n.startsWith("_") && !n.startsWith("."))
    val mk = fs.create(new Path(stage, "_STAGED"), true)
    mk.write(names.mkString("\n").getBytes("UTF-8")); mk.close()
    assert(Zorder.recover(spark, dir))
    assert(!fs.exists(stage))
    assert(spark.read.parquet(dir).count() == 1000)
    assert(spark.read.parquet(dir).inputFiles.length == 2)
  }
}
