package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted ANN index: parameters round-trip through storage, the probe
  * prunes the stored codes scan to the probed cells (PartitionFilters, no
  * vector column), and stored-index results equal the in-memory IVFADC
  * path.
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 32
  private val clusters = 20
  private val perCluster = 50

  private def emb =
    spark.range(clusters.toLong * perCluster).select(col("id").as("vec_id"))
      .withColumn("embedding",
        ClusteredFixture.normalizedVec(col("vec_id"), clusters, dim))

  test("build/load round-trip: stored probe equals the in-memory IVFADC path") {
    val dir = java.nio.file.Files.createTempDirectory("ann-idx").toString
    try {
      val e = emb.cache(); e.count()
      AnnIndex.build(e, "vec_id", "embedding", s"$dir/idx", dim,
        m = 8, pqK = 16, ivfK = clusters, iterations = 2)
      val idx = AnnIndex.load(spark, s"$dir/idx")
      // parameters live in the index — a probe cannot run with wrong ones
      assert(idx.dim == dim && idx.m == 8 && idx.pqK == 16 &&
        idx.ivfK == clusters && idx.idCol == "vec_id")
      // Lloyd may drop cells that lose every member — codebooks round-trip
      // whatever training produced, bounded by the configured k
      assert(idx.pq.centroids.size == 8)
      assert(idx.ivf.nonEmpty && idx.ivf.size <= clusters)
      val queries = e.filter(col("vec_id") < 8)
      val stored = AnnIndex.searchTopK(idx, e, queries, "embedding",
          nprobe = 2, topR = 25, topK = 5)
        .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
      val inMem = PqAnn.searchTopKIvf(
          PqAnn.encodeWithCells(e, "embedding", idx.pq, idx.ivf)
            .select(col("vec_id"), col("codes"), col("cell")),
          e, queries, "vec_id", "embedding", "codes", idx.pq, idx.ivf,
          nprobe = 2, topR = 25, topK = 5)
        .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
      assert(stored == inMem && stored.size == 8 * 5,
        s"stored=${stored.size} inMem=${inMem.size}")
      e.unpersist()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("the stored-codes probe carries PartitionFilters and reads no vectors") {
    val dir = java.nio.file.Files.createTempDirectory("ann-prune").toString
    try {
      val e = emb.cache(); e.count()
      AnnIndex.build(e, "vec_id", "embedding", s"$dir/idx", dim,
        m = 8, pqK = 16, ivfK = clusters, iterations = 2)
      val idx = AnnIndex.load(spark, s"$dir/idx")
      val out = AnnIndex.searchTopK(idx, e, e.filter(col("vec_id") < 4),
        "embedding", nprobe = 2, topR = 20, topK = 5)
      val plan = out.queryExecution.executedPlan.toString
      // the codes scan is pruned to the probed cells' partitions...
      assert(plan.contains("PartitionFilters") && plan.contains("cell"),
        s"no partition pruning on the stored codes scan:\n$plan")
      // ...and reads codes, never the vector column
      val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).toVector
      assert(readSchemas.exists(l => l.contains("codes") && !l.contains("embedding")),
        s"codes scan reads vectors:\n${readSchemas.mkString("\n")}")
      assert(out.count() == 4 * 5)
      e.unpersist()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
