package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN: determinism, the stored-codes scan contract
  * (no vector column in the PQ scan), and recall on clustered data — the
  * regime compressed-code search exists for.
  */
class PqAnnSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 32
  private val clusters = 20
  private val perCluster = 50

  /** The SHARED deterministic clustered construction ([[ClusteredFixture]]
    * — the same one the e11/e12/e13 oracle queries run), L2-normalized so
    * PQ's dot approximation ranks like cosine.
    */
  private def emb =
    spark.range(clusters.toLong * perCluster).select(col("id").as("vec_id"))
      .withColumn("embedding",
        ClusteredFixture.normalizedVec(col("vec_id"), clusters, dim))

  test("encode is deterministic across partitionings and codes are dense positions") {
    val e = emb.cache(); e.count()
    val cb = PqAnn.codebook(e, "vec_id", "embedding", dim, m = 8, k = 16)
    assert(cb.subDim == 4 && cb.centroids.size == 8)
    cb.centroids.foreach { sub =>
      assert(sub.map(_._1) == sub.indices, "codes must be dense 0-based positions")
      sub.foreach { case (_, c) => assert(c.size == cb.subDim) }
    }
    val a = PqAnn.encode(e, "embedding", cb)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    val b = PqAnn.encode(e.repartition(13, col("vec_id")), "embedding", cb)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(a == b, "codes moved with the partitioning")
    assert(a.values.forall(cs => cs.size == 8 && cs.forall(c => c >= 0 && c < 16)))
    e.unpersist()
  }

  test("the PQ scan reads codes only — the vector column never enters it") {
    val dir = java.nio.file.Files.createTempDirectory("pq-codes").toString
    try {
      val e = emb.cache(); e.count()
      val cb = PqAnn.codebook(e, "vec_id", "embedding", dim, m = 8, k = 16)
      PqAnn.encode(e, "embedding", cb).select("vec_id", "codes")
        .write.parquet(s"$dir/codes")
      e.select("vec_id", "embedding").write.parquet(s"$dir/emb")
      val codes = spark.read.parquet(s"$dir/codes")
      val vectors = spark.read.parquet(s"$dir/emb")
      val out = PqAnn.searchTopK(codes, vectors,
        vectors.filter(col("vec_id") < 4), "vec_id", "embedding", "codes",
        cb, topR = 20, topK = 5)
      val plan = out.queryExecution.executedPlan.toString
      // the scan of the codes relation must not carry the embedding column
      val readSchemas = plan.linesIterator
        .filter(_.contains("ReadSchema")).toVector
      assert(readSchemas.exists(l => l.contains("codes") && !l.contains("embedding")),
        s"PQ scan reads the vector column:\n${readSchemas.mkString("\n")}")
      assert(out.count() == 4 * 5)
      e.unpersist()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("IVFADC: cell routing + PQ codes + exact re-rank keeps recall at a 10% budget") {
    val e = emb.cache(); e.count()
    val cb = PqAnn.codebook(e, "vec_id", "embedding", dim, m = 8, k = 16)
    val ivf = IvfAnn.codebook(e, "vec_id", "embedding", k = clusters, iterations = 2)
    val codes = PqAnn.encodeWithCells(e, "embedding", cb, ivf).cache()
    codes.count()
    val brute = ClusteredFixture.bruteTopK(
      e, e.filter(col("vec_id") < 8), "vec_id", "embedding", 5)
    val adc = PqAnn.searchTopKIvf(codes, e, e.filter(col("vec_id") < 8),
        "vec_id", "embedding", "codes", cb, ivf,
        nprobe = 2, topR = 25, topK = 5)
      .select("qid", "nid")
    val recall = brute.join(adc.withColumn("__hit", lit(1)), Seq("qid", "nid"), "left")
      .agg(avg(coalesce(col("__hit"), lit(0)))).collect()(0).getDouble(0)
    info(f"IVFADC recall@5=$recall%.3f at budget=${2.0 / clusters * 100}%.0f%% " +
      "scanning 8-byte codes")
    assert(recall >= 0.9, f"IVFADC lost the clustered corpus: recall@5=$recall%.3f")
    codes.unpersist(); e.unpersist()
  }

  test("clustered corpus: PQ top-R + exact re-rank reaches high recall at 8 bytes/vector") {
    val e = emb.cache(); e.count()
    val cb = PqAnn.codebook(e, "vec_id", "embedding", dim, m = 8, k = 16)
    val brute = ClusteredFixture.bruteTopK(
      e, e.filter(col("vec_id") < 8), "vec_id", "embedding", 5)
    val pq = PqAnn.searchTopK(e, e.filter(col("vec_id") < 8),
        "vec_id", "embedding", cb, topR = 25, topK = 5)
      .select("qid", "nid")
    val recall = brute.join(pq.withColumn("__hit", lit(1)), Seq("qid", "nid"), "left")
      .agg(avg(coalesce(col("__hit"), lit(0)))).collect()(0).getDouble(0)
    info(f"PQ recall@5=$recall%.3f (m=8, k=16 -> 8 codes/vector vs $dim floats)")
    assert(recall >= 0.9,
      f"PQ with exact re-rank lost the clustered corpus: recall@5=$recall%.3f")
    e.unpersist()
  }
}
