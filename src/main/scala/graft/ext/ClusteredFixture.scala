package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.CosineSimilarityExpr

/** The deterministic clustered-embedding construction and the exact
  * brute-force truth scaffold shared by the clustered ANN recall gates
  * (e11/e12/e13) and their operator specs — ONE definition, so the
  * "same fixture" comparability claims across queries and specs hold by
  * construction instead of by five synchronized copies.
  *
  * The fixture: `clusters` axis-aligned centers in `dim` dims, cluster of
  * a row = `id % clusters`, component d = 4.0 iff d == cluster, plus
  * deterministic integer-hash jitter `((cluster*31 + id*7 + d*13) % 11
  * - 5) * 0.05` — within-cluster cosine ≈ 1, across ≈ 0. Pure column
  * arithmetic: diffable, scale-independent, identical on any engine
  * (FIXTURES.md documents it as the committed fixture).
  */
object ClusteredFixture {

  /** The raw clustered vector for an id column (`array<float>`).
    * `axisShift` moves every cluster center to an axis the unshifted
    * fixture never occupies — the deterministic model of DISTRIBUTION
    * DRIFT (an appended batch whose clusters the stored codebooks never
    * trained on) used by the codebook-drift recall measurement.
    */
  def vec(id: Column, clusters: Int, dim: Int, axisShift: Int = 0): Column = {
    require(axisShift + clusters <= dim,
      s"axisShift=$axisShift + clusters=$clusters must be <= dim=$dim " +
      "(each cluster needs its own axis)")
    val cluster = (pmod(id, lit(clusters)) + lit(axisShift)).cast("int")
    transform(sequence(lit(0), lit(dim - 1)), d => {
      val base = when(d === cluster, lit(4.0)).otherwise(lit(0.0))
      val jitter = (pmod(cluster * 31 + id * 7 + d * 13, lit(11)) - 5) * lit(0.05)
      (base + jitter).cast("float")
    })
  }

  /** L2-normalized form (`array<float>`) — what the PQ paths use so the
    * dot-product approximation ranks like cosine.
    */
  def normalizedVec(id: Column, clusters: Int, dim: Int,
                    axisShift: Int = 0): Column =
    graft.functions.VectorFunctions.l2Normalize(vec(id, clusters, dim, axisShift))
      .cast("array<float>")

  /** Exact brute-force cosine top-k per query — `(qid, nid)`, the truth
    * side of every recall measurement (ranking ties break by neighbour
    * id; a query never matches itself).
    */
  def bruteTopK(emb: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, topK: Int): DataFrame = {
    val qs = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("nid"))
    emb.select(col(idCol).as("nid"), col(vecCol).as("cv"))
      .crossJoin(broadcast(qs))
      .filter(col("nid") =!= col("qid"))
      .withColumn("c", CosineSimilarityExpr.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select("qid", "nid")
  }
}
