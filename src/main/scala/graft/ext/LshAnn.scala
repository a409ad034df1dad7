package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Multi-probe hyperplane-LSH approximate nearest-neighbour search — the
  * codebook-free ANN path, operator form of what e10 measures. Every vector
  * gets a `planes`-bit random-hyperplane signature (codegen'd,
  * hash-derived — no RNG, reproducible run-to-run); a query searches its
  * own bucket plus every bucket within Hamming radius `radius` of its
  * signature, which multiplies recall without touching the stored corpus
  * layout (the standard multi-probe trick: near neighbours that fell just
  * across a hyperplane differ in few signature bits).
  *
  * Scale shape: signatures are map-side; the probe set is `queries ×
  * Σ C(planes, 0..radius)` rows — tiny — and broadcast into one equi-join
  * on the bucket key, so the corpus is scanned once and only candidate
  * rows are scored (exact cosine) and ranked per query. Candidate budget
  * ≈ (buckets probed / 2^planes) of the corpus for near-uniform data;
  * e09/e10 + IvfClusteredRecallSpec carry the measured recall-vs-budget
  * trade for choosing between this and [[IvfAnn]].
  */
object LshAnn {

  /** The probe flip-masks for (planes, radius): every XOR mask with at
    * most `radius` bits set, enumerated COMBINATORIALLY — Σ C(planes, 0..r)
    * masks — rather than by scanning all 2^planes values (fine at 6 planes,
    * a non-terminating loop at the 62 the signature supports). `radius` is
    * capped at 6: probe counts grow as C(planes, radius), and past a few
    * bits the multi-probe answer is "widen planes", not "flip more bits".
    */
  private[graft] def probeMasks(planes: Int, radius: Int): Seq[Long] = {
    require(planes >= 1 && planes <= 62, s"planes must be in [1,62], got $planes")
    require(radius >= 0 && radius < planes && radius <= 6,
      s"radius must be in [0, min($planes, 6)], got $radius")
    def choose(start: Int, left: Int, acc: Long): Seq[Long] =
      if (left == 0) Seq(acc)
      else (start until planes).flatMap(b => choose(b + 1, left - 1, acc | (1L << b)))
    (0 to radius).flatMap(r => choose(0, r, 0L))
  }

  /** ANN top-k: score each query against every candidate sharing any of
    * its probed buckets; keep the best `topK` by exact cosine (ties →
    * lowest id). Output: (qid, rank, nid, cos).
    */
  def searchTopK(emb: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, dim: Int, planes: Int = 6, radius: Int = 2,
                 topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val masks = probeMasks(planes, radius)
    val sig = graft.plans.HyperplaneSignatureExpr
      .signature(col(vecCol), dim = dim, planes = planes)
    val cand = emb.select(sig.as("probe"), col(idCol).as("nid"),
      col(vecCol).as("cv"))
    val probes = queries
      .select(col(idCol).as("qid"), sig.as("sig"), col(vecCol).as("qv"))
      .withColumn("probe",
        explode(array(masks.map(m => col("sig").bitwiseXOR(lit(m))): _*)))
      .drop("sig")
    val scored = cand.join(broadcast(probes), Seq("probe"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("cos",
        graft.plans.CosineSimilarityExpr.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select("qid", "rank", "nid", "cos")
  }
}
