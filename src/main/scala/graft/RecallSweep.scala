package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement harness behind the e09/e10 ANN configurations: sweeps the
  * IVF (k, nprobe) and multi-probe hyperplane-LSH (planes, radius) grids at
  * a given scale factor and prints mean recall@5 next to the candidate
  * budget (fraction of the corpus scored per query) — the two axes of the
  * accuracy/cost trade. The chosen operating points are committed in
  * EmbeddingQueries (golden-gated); README records the curve.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.RecallSweep"
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    val emb = Tables.embeddings(spark, sfDir).cache()
    val n = emb.count()
    val qs = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("nid"))
    val brute = emb.select(col("vec_id").as("nid"), col("embedding").as("cv"))
      .crossJoin(broadcast(qs))
      .filter(col("nid") =!= col("qid"))
      .withColumn("c", graft.plans.CosineSimilarityExpr.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select("qid", "nid").cache()
    brute.count()

    def recall(ann: DataFrame): Double = {
      val r = brute.join(ann.withColumn("__hit", lit(1)), Seq("qid", "nid"), "left")
        .agg(avg(coalesce(col("__hit"), lit(0)))).collect()(0).getDouble(0)
      BigDecimal(r).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    println(s"corpus: $n vectors ($sfDir)")
    println("== IVF (k cells, nprobe probed, it Lloyd iterations) ==")
    for (k <- Seq(8, 10, 16, 32); it <- Seq(1, 3, 5);
         nprobe <- Seq(2, 3, 4, 6, 8) if nprobe < k) {
      val cb = ext.IvfAnn.codebook(emb, "vec_id", "embedding", k, iterations = it)
      val ann = ext.IvfAnn.searchTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", cb, nprobe, 5).select("qid", "nid")
      // measured budget: scored candidates per query / corpus
      val sized = ext.IvfAnn.assign(emb, "embedding", cb)
        .groupBy("cell").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val frac = 1.0 * nprobe / k // uniform-cell approximation
      println(f"  k=$k%2d it=$it%d nprobe=$nprobe%d  ~budget=${frac * 100}%5.1f%%  recall@5=${recall(ann)}%5.3f  (cells: ${sized.values.min}-${sized.values.max})")
    }
    println("== multi-probe hyperplane LSH (planes, Hamming radius) ==")
    for (planes <- Seq(6, 8, 10); radius <- Seq(1, 2, 3)) {
      val sigged = emb.withColumn("sig", graft.plans.HyperplaneSignatureExpr
        .signature(col("embedding"), dim = 64, planes = planes))
      val masks = (0 until (1 << planes))
        .filter(m => Integer.bitCount(m) <= radius).map(_.toLong)
      val qsig = sigged.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("sig"), col("embedding").as("qv"))
        .withColumn("probe",
          explode(array(masks.map(m => col("sig").bitwiseXOR(lit(m))): _*)))
      val scored = sigged
        .select(col("sig").as("probe"), col("vec_id").as("nid"), col("embedding").as("cv"))
        .join(broadcast(qsig), Seq("probe"))
        .filter(col("nid") =!= col("qid"))
        .withColumn("c", graft.plans.CosineSimilarityExpr.cosine(col("qv"), col("cv")))
      val cand = scored.groupBy("qid").count()
        .agg(avg("count")).collect()(0).getDouble(0)
      val ann = scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5).select("qid", "nid")
      println(f"  planes=$planes%2d radius=$radius%d (${masks.size}%3d/${1 << planes}%4d buckets)" +
        f"  budget=${100.0 * cand / n}%5.1f%%  recall@5=${recall(ann)}%5.3f")
    }
    spark.stop()
  }
}
