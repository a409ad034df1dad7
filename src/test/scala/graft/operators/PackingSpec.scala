package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: the distributed two-pass stream positions must equal
  * the single-partition window cumsum definition on any input partitioning,
  * and the chunk mapping must pin the straddle/empty-doc edge cases.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("streamPositions equals the global-window cumsum under adversarial partitioning") {
    val rows = (1L to 200L).map(i => (i, (i * 7) % 23)) // varied weights incl. 0
    val df = rows.toDF("id", "w").repartition(7) // scrambled input placement
    val got = Packing.withStreamPositions(df, Seq(col("id")), "w") {
      _.select("id", "stream_start").as[(Long, Long)].collect().toMap
    }
    val want = rows.toDF("id", "w")
      .withColumn("stream_start",
        coalesce(sum(col("w")).over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("id", "stream_start").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("chunk pins straddling docs, exact-boundary docs, and empty docs") {
    // seqLen 10; stream: a[0,7) b[7,13) straddles, c[13,13) empty,
    // d[13,20) ends exactly at the boundary, e[20,31) spans two boundaries
    val df = Seq((1L, 7L), (2L, 6L), (3L, 0L), (4L, 7L), (5L, 11L))
      .toDF("id", "w").repartition(3)
    val got = Packing.chunk(df, Seq(col("id")), "w", seqLen = 10L)
      .select("id", "stream_start", "seq_first", "seq_last", "n_seqs")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    spark.catalog.clearCache() // release chunk's internal persist
    assert(got == Seq(
      (1L, 0L, 0L, 0L, 1L),   // [0,7) inside seq 0
      (2L, 7L, 0L, 1L, 2L),   // [7,13) straddles 0->1
      (3L, 13L, 1L, 1L, 0L),  // empty: occupies nothing, would fall in 1
      (4L, 13L, 1L, 1L, 1L),  // [13,20) touches boundary, stays in 1
      (5L, 20L, 2L, 3L, 2L))) // [20,31) spans 2->3
    // total sequences = ceil(total tokens / seqLen)
    val total = 7L + 6L + 0L + 7L + 11L
    assert(got.map(_._4).max == (total - 1) / 10L)
  }

  test("withStreamPositions releases the internal cache after use") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = (1 to 300).map(i => (i.toLong, (i % 5).toLong)).toDF("id", "w")
    var during = Set.empty[Int]
    Packing.withStreamPositions(df, Seq(col("id")), "w") { out =>
      out.collect()
      during = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    }
    assert(during.nonEmpty, "the bracket never persisted its internal relation")
    val deadline = System.nanoTime() + 5e9.toLong
    def ours = spark.sparkContext.getPersistentRDDs.keySet.toSet.intersect(during)
    while (ours.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(ours.isEmpty, "withStreamPositions must unpersist its internal relation")
  }

  test("no data-sized single-partition stage: only the #partitions-row offsets window is global") {
    val df = spark.range(10000).select(col("id"), (col("id") % 13).as("w"))
    val out = Packing.streamPositions(df, Seq(col("id")), "w")
    val p = out.queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    // exactly one SinglePartition exchange — the per-partition offsets
    // relation (one row per range partition), never the data itself: its
    // subtree must contain the partition-sums AGGREGATE, not a raw scan
    val lines = p.linesIterator.toVector
    val singles = lines.zipWithIndex.filter(_._1.contains("Exchange SinglePartition"))
    assert(singles.size == 1, p)
    // the big window (running weight sum) is keyed by the partition id
    assert(lines.exists(l => l.contains("Window") && l.contains("hashpartitioning"))
      || p.contains("hashpartitioning"), p)
  }
}
