package graft.ext

import graft.{SparkSpec, Tables}
import graft.plans.CosineSimilarityExpr
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class IvfAnnSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("codebook converges to k cells covering all vectors") {
    val emb = Tables.embeddings(spark, dir)
    val cb = IvfAnn.codebook(emb, "vec_id", "embedding", k = 8, iterations = 2)
    assert(cb.size <= 8 && cb.nonEmpty)
    assert(cb.forall(_._2.size == 64))
    val assigned = IvfAnn.assign(emb, "embedding", cb)
    assert(assigned.filter(col("cell").isNull).count() == 0)
    // every vector lands in a learned cell
    val cells = assigned.select("cell").distinct().as[Int].collect().toSet
    assert(cells.subsetOf(cb.map(_._1).toSet))
  }

  test("nprobe search finds most of the true top-1 neighbours (recall check)") {
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 20)
    val cb = IvfAnn.codebook(emb, "vec_id", "embedding", k = 8, iterations = 1)
    val ann = IvfAnn.searchTopK(emb, queries, "vec_id", "embedding", cb,
        nprobe = 4, topK = 10)
      .groupBy("qid").agg(collect_set(col("nid")).as("cand"))
      .as[(Long, Seq[Long])].collect().toMap

    // brute-force true top-1 per query
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val scored = emb.select(col("vec_id").as("nid"), col("embedding").as("cv"))
      .crossJoin(broadcast(q)).filter(col("nid") =!= col("qid"))
      .withColumn("cos", CosineSimilarityExpr.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    val top1 = scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("qid", "nid").as[(Long, Long)].collect().toMap

    val hits = top1.count { case (qid, nn) => ann.get(qid).exists(_.contains(nn)) }
    val recall = hits.toDouble / top1.size
    // probing half the cells of random-ish vectors: recall well above chance
    assert(recall >= 0.5, s"recall@probe4/8 = $recall")
    // and strictly fewer candidates scored than brute force would
    assert(ann.values.forall(_.size <= 10))
  }
}
