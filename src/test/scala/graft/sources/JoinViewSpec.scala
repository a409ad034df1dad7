package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Delta-join view maintenance laws: telescoping exactness (cross-batch
  * pairs, multiset duplicates), committed-batch replay no-ops, crash-replay
  * determinism (partial fragments invisible, recompute identical), and
  * compaction value-invariance.
  */
class JoinViewSpec extends SparkSpec {
  import spark.implicits._

  private def freshView(): JoinView.View = {
    val dir = java.nio.file.Files.createTempDirectory("join-view").toString
    JoinView.View(dir, Seq("k"),
      leftDdl = "k bigint, a string, batch_id bigint",
      rightDdl = "k bigint, b string, batch_id bigint",
      joinDdl = "k bigint, a string, b string, batch_id bigint")
  }

  // duplicate keys on both sides -> the join is a true multiset (2x2 pairs)
  private val leftRows = Seq((1L, "a1"), (1L, "a2"), (2L, "a3"), (3L, "a4"), (9L, "a9"))
  private val rightRows = Seq((1L, "b1"), (1L, "b2"), (2L, "b3"), (4L, "b4"))

  private def leftDf = leftRows.toDF("k", "a")
  private def rightDf = rightRows.toDF("k", "b")
  private def direct = leftDf.join(rightDf, Seq("k"))
    .as[(Long, String, String)].collect().sorted.toSeq

  private def viewRows(v: JoinView.View) =
    JoinView.read(spark, v).select("k", "a", "b")
      .as[(Long, String, String)].collect().sorted.toSeq

  test("two-installment accumulation equals the one-shot join (multiset-exact)") {
    val v = freshView()
    JoinView.init(spark, v)
    // split so some pairs only exist across batches: (1,'a1')x(1,'b2') etc.
    JoinView.appendBatch(leftDf.filter(col("a").isin("a1", "a3")),
      rightDf.filter(col("b") === "b1"), v, 0L)
    JoinView.appendBatch(leftDf.filter(!col("a").isin("a1", "a3")),
      rightDf.filter(col("b") =!= "b1"), v, 1L)
    assert(viewRows(v) == direct)
  }

  test("replaying a committed batch is a no-op; empty view reads empty with schema") {
    val v = freshView()
    JoinView.init(spark, v)
    val empty = JoinView.read(spark, v)
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("k", "a", "b"))
    JoinView.appendBatch(leftDf, rightDf.limit(0), v, 0L)
    JoinView.appendBatch(leftDf.limit(0), rightDf, v, 1L)
    val once = viewRows(v)
    assert(once == direct)
    // at-least-once delivery replays batch 1 verbatim -> nothing changes
    JoinView.appendBatch(leftDf.limit(0), rightDf, v, 1L)
    assert(viewRows(v) == once)
  }

  test("crash replay: partial uncommitted fragments are invisible and recompute cleanly") {
    val v = freshView()
    JoinView.init(spark, v)
    JoinView.appendBatch(leftDf.filter(col("k") === 1L),
      rightDf.filter(col("k") === 1L), v, 0L)
    // simulate a crash mid-batch-1: the join fragment landed, meta never
    // advanced (the exact window appendBatch's write order creates)
    val epochJoin = StoredIndex.relPath(v.dir, "join", 0)
    leftDf.filter(col("k") === 2L).join(rightDf.filter(col("k") === 2L), Seq("k"))
      .withColumn("batch_id", lit(1L))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(epochJoin)
    // the partial fragment must NOT surface (committed_through is still 0)
    assert(viewRows(v) == leftDf.filter(col("k") === 1L)
      .join(rightDf.filter(col("k") === 1L), Seq("k"))
      .as[(Long, String, String)].collect().sorted.toSeq)
    // replay of batch 1 recomputes against batch<1 history and overwrites
    JoinView.appendBatch(leftDf.filter(col("k") =!= 1L),
      rightDf.filter(col("k") =!= 1L), v, 1L)
    assert(viewRows(v) == direct)
  }

  test("bucketed history: same results, bucket-partitioned layout, pruned scans") {
    val dir = java.nio.file.Files.createTempDirectory("join-view-bk").toString
    val v = JoinView.View(dir, Seq("k"),
      leftDdl = "k bigint, a string, batch_id bigint",
      rightDdl = "k bigint, b string, batch_id bigint",
      joinDdl = "k bigint, a string, b string, batch_id bigint",
      buckets = 4)
    JoinView.init(spark, v)
    JoinView.appendBatch(leftDf.filter(col("a").isin("a1", "a3")),
      rightDf.filter(col("b") === "b1"), v, 0L)
    JoinView.appendBatch(leftDf.filter(!col("a").isin("a1", "a3")),
      rightDf.filter(col("b") =!= "b1"), v, 1L)
    assert(viewRows(v) == direct, "bucketing must not change the view")
    // compaction keeps the bucket level
    JoinView.compact(spark, v)
    assert(viewRows(v) == direct)
    val leftDir = new java.io.File(StoredIndex.relPath(dir, "left", 1))
    val bkDirs = leftDir.listFiles().filter(_.getName.startsWith("batch_id="))
      .flatMap(_.listFiles()).map(_.getName).filter(_.startsWith("bk=")).toSet
    assert(bkDirs.nonEmpty, s"expected bk= partitions, saw ${bkDirs.mkString(",")}")
    // the history-read shape appendBatch uses prunes at the partition level
    val probe = spark.read.parquet(StoredIndex.relPath(dir, "left", 1))
      .filter(col("batch_id") < 2 && col("bk").isin(0, 1))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bk"), plan)
    // accumulation continues correctly against the bucketed folded history
    // the new right row must meet BOTH the historical (9,'a9') and the
    // same-batch (9,'a9b') left rows — cross-batch pairs over the fold
    JoinView.appendBatch(Seq((9L, "a9b")).toDF("k", "a"),
      Seq((9L, "b9")).toDF("k", "b"), v, 2L)
    assert(viewRows(v) ==
      (direct ++ Seq((9L, "a9", "b9"), (9L, "a9b", "b9"))).sorted)
  }

  test("compaction folds fragments, preserves the view, and keeps replay no-ops") {
    val v = freshView()
    JoinView.init(spark, v)
    JoinView.appendBatch(leftDf.filter(col("k") <= 2L),
      rightDf.filter(col("k") <= 1L), v, 0L)
    JoinView.compact(spark, v)
    assert(JoinView.fragmentCount(spark, v) == 0, "fold leaves no fragments")
    val afterFold = viewRows(v)
    // folded-batch replay is a no-op
    JoinView.appendBatch(leftDf.filter(col("k") <= 2L),
      rightDf.filter(col("k") <= 1L), v, 0L)
    assert(viewRows(v) == afterFold)
    // accumulation continues against the folded history
    JoinView.appendBatch(leftDf.filter(col("k") > 2L),
      rightDf.filter(col("k") > 1L), v, 1L)
    assert(viewRows(v) == direct)
    assert(JoinView.fragmentCount(spark, v) == 1)
  }
}
