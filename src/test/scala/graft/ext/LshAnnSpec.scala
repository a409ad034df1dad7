package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-probe LSH ANN operator: mask algebra, bounds, and the clustered-
  * data recall gate symmetric to IvfClusteredRecallSpec — near-identical
  * vectors share signatures, so a tiny probe budget must recover the true
  * neighbours (the e10 golden pins the near-uniform-data measurement; this
  * pins the favourable-data behavior a real embedding corpus shows).
  */
class LshAnnSpec extends SparkSpec {
  import spark.implicits._

  test("probeMasks enumerates exactly the <=radius-bit flips") {
    assert(LshAnn.probeMasks(6, 0) == Seq(0L))
    assert(LshAnn.probeMasks(6, 1).size == 7)   // 1 + 6
    assert(LshAnn.probeMasks(6, 2).size == 22)  // 1 + 6 + 15
    assert(LshAnn.probeMasks(6, 3).size == 42)  // 1 + 6 + 15 + 20
    assert(LshAnn.probeMasks(8, 3).size == 93)  // 1 + 8 + 28 + 56
    assert(LshAnn.probeMasks(6, 2).forall(m => java.lang.Long.bitCount(m) <= 2))
    // masks are distinct and combinatorial enumeration stays instant at
    // wide signatures (the old 2^planes scan would never return here)
    assert(LshAnn.probeMasks(6, 2).distinct.size == 22)
    assert(LshAnn.probeMasks(62, 2).size == 1 + 62 + 62 * 61 / 2)
    intercept[IllegalArgumentException] { LshAnn.probeMasks(6, 6) }
    intercept[IllegalArgumentException] { LshAnn.probeMasks(63, 1) }
    intercept[IllegalArgumentException] { LshAnn.probeMasks(20, 7) }
  }

  test("clustered embeddings: high recall at a few-percent probe budget") {
    val dim = 16; val clusters = 16; val perCluster = 200
    def vec(c: Int, i: Int): Seq[Float] = Seq.tabulate(dim) { d =>
      val base = if (d == c % dim) 4.0 else 0.0
      val jitter = (((c * 31 + i * 7 + d * 13) % 11) - 5) * 0.05
      (base + jitter).toFloat
    }
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
    // planes=8, radius=1: 9/256 buckets ~ 3.5% nominal budget
    val lsh = LshAnn.searchTopK(emb,
        emb.filter(col("vec_id") % perCluster === 0).limit(8),
        "vec_id", "embedding", dim = dim, planes = 8, radius = 1, topK = 5)
      .select("qid", "nid")
    val recall = brute.join(lsh.withColumn("__hit", lit(1)), Seq("qid", "nid"), "left")
      .agg(avg(coalesce(col("__hit"), lit(0)))).collect()(0).getDouble(0)
    info(f"clustered corpus: LSH recall@5=$recall%.3f at ~3.5%% nominal budget (planes=8, radius=1)")
    emb.unpersist()
    assert(recall >= 0.9,
      f"multi-probe LSH lost its clustered-data advantage: recall@5=$recall%.3f")
  }
}
