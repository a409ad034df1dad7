package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the claim README's ANN section makes about the recall-vs-budget
  * curve: the testdata embeddings are near-uniform, so e09/e10 measure
  * recall ≈ budget — but on CLUSTERED embeddings (the realistic shape:
  * text embeddings cluster by topic) the same IVF index reaches high
  * recall while scoring a small corpus fraction. Synthetic clusters are
  * fully deterministic (integer-arithmetic jitter, no RNG), so this is a
  * stable gate, not a flaky benchmark.
  */
class IvfClusteredRecallSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val clusters = 16
  private val perCluster = 200

  /** Member `i` of `cluster`: a strong axis-aligned center plus small
    * deterministic per-dimension jitter — within-cluster cosine ~1,
    * across-cluster ~0.
    */
  private def vec(cluster: Int, i: Int): Seq[Float] =
    Seq.tabulate(dim) { d =>
      val base = if (d == cluster % dim) 4.0 else 0.0
      val jitter = (((cluster * 31 + i * 7 + d * 13) % 11) - 5) * 0.05
      (base + jitter).toFloat
    }

  test("IVF on clustered embeddings: high recall at a small candidate budget") {
    val rows = for (c <- 0 until clusters; i <- 0 until perCluster)
      yield (c.toLong * perCluster + i, vec(c, i))
    val emb = rows.toDF("vec_id", "embedding").cache()
    emb.count()
    val qs = emb.filter(col("vec_id") % perCluster === 0).limit(8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("nid"))
    val brute = emb.select(col("vec_id").as("nid"), col("embedding").as("cv"))
      .crossJoin(broadcast(qs))
      .filter(col("nid") =!= col("qid"))
      .withColumn("c", graft.plans.CosineSimilarityExpr.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select("qid", "nid")
    val nprobe = 2
    val cb = IvfAnn.codebook(emb, "vec_id", "embedding", k = clusters, iterations = 2)
    val ivf = IvfAnn.searchTopK(emb,
        emb.filter(col("vec_id") % perCluster === 0).limit(8),
        "vec_id", "embedding", cb, nprobe = nprobe, topK = 5)
      .select("qid", "nid")
    val recall = brute.join(ivf.withColumn("__hit", lit(1)), Seq("qid", "nid"), "left")
      .agg(avg(coalesce(col("__hit"), lit(0)))).collect()(0).getDouble(0)
    val budget = nprobe.toDouble / clusters
    info(f"clustered corpus: recall@5=$recall%.3f at budget=${budget * 100}%.1f%% " +
      f"(k=$clusters, nprobe=$nprobe)")
    emb.unpersist()
    // the uniform testdata ceiling at this budget would be ~0.125 recall;
    // on clustered data the index must essentially solve the problem
    assert(recall >= 0.9,
      f"IVF lost its clustered-data advantage: recall@5=$recall%.3f at ${budget * 100}%.1f%% budget")
  }
}
