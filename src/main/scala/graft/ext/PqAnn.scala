package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.{CosineSimilarityExpr, NearestCentroidExpr}

/** Product-quantization (PQ) approximate nearest-neighbour search — the
  * MEMORY/BANDWIDTH story for embedding search at 100 TB, complementing
  * [[IvfAnn]]'s candidate-budget story. (Reference scope: the engine's
  * similarity-search north star; PQ is the standard compressed-codes
  * variant from the public ANN literature — IVFADC-style: quantize,
  * scan codes with per-query lookup tables, exact re-rank the survivors.)
  *
  * The idea: split each D-dim vector into `m` subvectors; learn a small
  * k-centroid codebook PER SUBSPACE; store each vector as its `m` nearest
  * sub-centroid indices — `m` small ints instead of D floats (e.g. 32
  * floats = 128 bytes → 8 codes = 8 bytes at k ≤ 256). At query time a
  * per-query LOOKUP TABLE of sub-dot-products (m × k doubles) turns the
  * approximate dot product of query and ANY stored vector into `m` array
  * lookups + adds — no float vector is touched during the scan. The top
  * `topR` PQ-scored candidates are then re-ranked with the EXACT cosine
  * over their full vectors (read back by id — at scale a semi-join
  * against the vector table touching only topR rows per query).
  *
  * Scale shape:
  *   - the codes relation is the ONLY thing the scan reads — column
  *     pruning keeps the full-vector column out of the scan entirely
  *     (PqAnnSpec pins the ReadSchema);
  *   - codebooks + per-query LUTs are literals/row-local column algebra —
  *     no shuffle until the per-query top-R window (same shape as every
  *     other top-k here);
  *   - the exact re-rank joins the FULL vector column back for
  *     `topR × |queries|` rows only.
  *
  * Determinism (golden-net contract): sub-codebooks ride
  * [[IvfAnn.codebook]]'s DECIMAL-summed Lloyd training; encoding is the
  * codegen'd [[NearestCentroidExpr]] argmin (ties → lowest code); LUT
  * dots and PQ sums are fixed-order per-row folds; all rankings tie-break
  * by neighbour id. Reproducible bit-for-bit on any partitioning.
  *
  * PQ approximates the DOT product; pass L2-normalized vectors
  * ([[graft.functions.VectorFunctions.l2Normalize]]) when cosine ranking
  * is intended (the exact re-rank is cosine either way, so PQ error only
  * costs recall, never final-score correctness).
  */
object PqAnn {

  /** Per-subspace codebooks: `centroids(s)` lists subspace `s`'s
    * `(code, centroid)` pairs with codes POSITIONAL (0-based, contiguous —
    * a Lloyd cell that lost all members is compacted away, so LUT indexing
    * is dense).
    */
  final case class PqCodebook(dim: Int, m: Int,
                              centroids: Seq[Seq[(Int, Seq[Double])]]) {
    def subDim: Int = dim / m
    def k: Int = centroids.map(_.size).max
  }

  /** Train the `m` sub-codebooks (k centroids each, `iterations` Lloyd
    * steps) with ONE Spark job per pass for ALL subspaces: the vector
    * posexplodes once, each element routes to its (subspace, cell,
    * dim-in-subspace) group via the row's per-subspace assignment array,
    * and the per-group DECIMAL sums collect driver-side (m·k·(D/m) = k·D
    * doubles — same size as one IVF codebook). The per-subspace-loop
    * alternative ran 3m jobs and re-evaluated the input lineage each time
    * — 24 passes over the corpus for m=8, which a profile showed
    * dominating e12 end-to-end; this form is 3 passes regardless of m.
    * Same arithmetic as [[IvfAnn.codebook]] per subspace (decimal sums are
    * shuffle-order-independent, hash seeding depends only on the id, so
    * every subspace seeds identically), hence bit-identical codebooks —
    * the e12/e13 goldens pin it. Cells renumber positionally per subspace
    * (a dropped Lloyd cell can never leave a hole in the lookup table).
    */
  def codebook(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
               m: Int = 8, k: Int = 16, iterations: Int = 2): PqCodebook = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val subDim = dim / m
    import org.apache.spark.sql.types.DecimalType
    // one pass: per-(subspace, cell, dim) decimal means from the row's
    // per-subspace cell assignments
    def means(assigned: DataFrame): Seq[Seq[(Int, Seq[Double])]] = {
      val rows = assigned
        .select(col("__cells"), posexplode(col(vecCol)).as(Seq("gd", "x")))
        .withColumn("s", (col("gd") / subDim).cast("int"))
        .withColumn("cell", element_at(col("__cells"), col("s") + 1))
        .withColumn("d", (col("gd") % subDim).cast("int"))
        .groupBy("s", "cell", "d")
        .agg(sum(col("x").cast("double").cast(DecimalType(27, 12))).as("sum"),
          count(lit(1)).as("n"))
        .collect()
      (0 until m).map { s =>
        rows.filter(_.getInt(0) == s)
          .groupBy(_.getInt(1))
          .map { case (cell, rs) =>
            cell -> rs.sortBy(_.getInt(2))
              .map(r => r.getDecimal(3).doubleValue() / r.getLong(4)).toSeq
          }.toSeq.sortBy(_._1)
          .map(_._2).zipWithIndex.map { case (c, i) => (i, c) }
      }
    }
    // seeding depends only on the id, so every subspace starts from the
    // same hash cells — identical to seeding each subspace independently
    val seedCell = pmod(xxhash64(col(idCol)), lit(k)).cast("int")
    var cbs = means(emb.withColumn("__cells",
      array(Seq.fill(m)(seedCell): _*)))
    for (_ <- 0 until iterations)
      cbs = means(emb.withColumn("__cells", array((0 until m).map { s =>
        graft.plans.NearestCentroidExpr.nearest(
          slice(col(vecCol), s * subDim + 1, subDim), cbs(s))
      }: _*)))
    PqCodebook(dim, m, cbs)
  }

  /** Encode each vector as its `m` positional sub-centroid codes —
    * `array<int>` of length m, the stored representation the PQ scan
    * reads instead of the float vector.
    */
  def encode(emb: DataFrame, vecCol: String, cb: PqCodebook,
             codesCol: String = "codes"): DataFrame =
    emb.withColumn(codesCol, array((0 until cb.m).map { s =>
      NearestCentroidExpr.nearest(
        slice(col(vecCol), s * cb.subDim + 1, cb.subDim), cb.centroids(s))
    }: _*))

  /** Per-query lookup table: for each subspace, the dot product of the
    * query's subvector with every sub-centroid — `array<array<double>>`
    * of shape m × k, computed once per query row.
    */
  private def luts(qv: Column, cb: PqCodebook): Column =
    array((0 until cb.m).map { s =>
      val qs = slice(qv, s * cb.subDim + 1, cb.subDim)
      array(cb.centroids(s).map { case (_, c) =>
        aggregate(zip_with(qs, typedLit(c), (x, y) => x.cast("double") * y),
          lit(0.0), (acc, x) => acc + x)
      }: _*)
    }: _*)

  /** Approximate dot product from stored codes + the query's LUT:
    * m lookups and adds, no float vector touched.
    */
  private def pqScore(codes: Column, lutsCol: Column): Column =
    aggregate(zip_with(codes, lutsCol, (c, l) => element_at(l, c + 1)),
      lit(0.0), (acc, x) => acc + x)

  /** PQ-scan top-k with exact re-rank over a STORED codes relation
    * (`(idCol, codesCol)` — e.g. [[encode]]'s output persisted to the
    * warehouse at encode time): score every code row against the per-query
    * LUT, keep the best `topR` per query, then re-rank exactly those with
    * true cosine over the full vectors (joined back by id — topR × |queries|
    * rows) and keep `topK`. The PQ scan reads ONLY ids and codes — column
    * pruning keeps the float vectors out of it entirely (PqAnnSpec pins the
    * ReadSchema), which is the bandwidth win PQ exists for.
    * Output: (qid, rank, nid, cos) — same contract as
    * [[IvfAnn.searchTopK]], so the two paths are drop-in comparable.
    */
  def searchTopK(codes: DataFrame, emb: DataFrame, queries: DataFrame,
                 idCol: String, vecCol: String, codesCol: String,
                 cb: PqCodebook, topR: Int, topK: Int): DataFrame = {
    require(topR >= topK, s"topR=$topR must be >= topK=$topK")
    val codeRel = codes.select(col(idCol).as("nid"), col(codesCol).as("__codes"))
    val qs = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("__luts", luts(col("qv"), cb))
    val wPq = Window.partitionBy(col("qid")).orderBy(col("pq").desc, col("nid"))
    val cand = codeRel.crossJoin(broadcast(qs.select(col("qid"), col("__luts"))))
      .filter(col("nid") =!= col("qid"))
      .withColumn("pq", pqScore(col("__codes"), col("__luts")))
      .withColumn("__r", row_number().over(wPq)).filter(col("__r") <= topR)
      .select("qid", "nid")
    // exact re-rank: full vectors join back for topR × |queries| rows only
    val wEx = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    cand
      .join(emb.select(col(idCol).as("nid"), col(vecCol).as("cv")), Seq("nid"))
      .join(broadcast(qs.select(col("qid"), col("qv"))), Seq("qid"))
      .withColumn("cos", CosineSimilarityExpr.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(wEx)).filter(col("rank") <= topK)
      .select("qid", "rank", "nid", "cos")
  }

  /** Convenience overload that encodes inline — for tests and one-shot
    * jobs; production stores [[encode]]'s output and uses the stored-codes
    * form above so the scan never touches the vectors.
    */
  def searchTopK(emb: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, cb: PqCodebook,
                 topR: Int, topK: Int): DataFrame =
    searchTopK(encode(emb, vecCol, cb).select(col(idCol), col("codes")),
      emb, queries, idCol, vecCol, "codes", cb, topR, topK)

  /** [[encode]] plus the vector's IVF cell — the stored representation for
    * the IVFADC form below: `(id, codes, cell)`, still bytes per vector.
    */
  def encodeWithCells(emb: DataFrame, vecCol: String, cb: PqCodebook,
                      ivf: Seq[(Int, Seq[Double])],
                      codesCol: String = "codes"): DataFrame =
    IvfAnn.assign(encode(emb, vecCol, cb, codesCol), vecCol, ivf)

  /** IVFADC — the full production composition: route each query to its
    * `nprobe` nearest IVF cells (candidate-budget lever), PQ-score ONLY
    * those cells' codes via the per-query LUT (bandwidth lever), exact
    * cosine re-rank of the top `topR` (correctness backstop). The codes
    * relation carries `(id, codes, cell)` ([[encodeWithCells]], stored at
    * encode time); the cell equi-join replaces the flat scan, so per-query
    * work is `nprobe/k` of the corpus — in code bytes, not vector bytes.
    * LUTs are computed per probe row (nprobe × m × k sub-dots per query —
    * driver-free column algebra on the broadcast side).
    */
  def searchTopKIvf(codes: DataFrame, emb: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, codesCol: String,
                    cb: PqCodebook, ivf: Seq[(Int, Seq[Double])],
                    nprobe: Int, topR: Int, topK: Int): DataFrame =
    searchTopKIvfFromProbes(codes, emb, queries,
      IvfAnn.probeCells(queries, idCol, vecCol, ivf, nprobe),
      idCol, vecCol, codesCol, cb, topR, topK)

  /** Core of [[searchTopKIvf]] over a caller-supplied probes relation
    * (`(qid, qv, cell)` — [[IvfAnn.probeCells]]' shape), so a caller that
    * already derived the routing (e.g. [[AnnIndex.searchTopK]]'s
    * partition-prune collect) scores against the SAME routing instead of
    * recomputing it — one evaluation, impossible to diverge.
    */
  private[ext] def searchTopKIvfFromProbes(codes: DataFrame, emb: DataFrame,
                    queries: DataFrame, probesIn: DataFrame,
                    idCol: String, vecCol: String, codesCol: String,
                    cb: PqCodebook, topR: Int, topK: Int): DataFrame = {
    require(topR >= topK, s"topR=$topR must be >= topK=$topK")
    val codeRel = codes.select(col(idCol).as("nid"),
      col(codesCol).as("__codes"), col("cell"))
    val probes = probesIn.withColumn("__luts", luts(col("qv"), cb))
    val wPq = Window.partitionBy(col("qid")).orderBy(col("pq").desc, col("nid"))
    val cand = codeRel
      .join(broadcast(probes.select(col("qid"), col("cell"), col("__luts"))),
        Seq("cell"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("pq", pqScore(col("__codes"), col("__luts")))
      .withColumn("__r", row_number().over(wPq)).filter(col("__r") <= topR)
      .select("qid", "nid")
    val qs = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val wEx = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    cand
      .join(emb.select(col(idCol).as("nid"), col(vecCol).as("cv")), Seq("nid"))
      .join(broadcast(qs), Seq("qid"))
      .withColumn("cos", CosineSimilarityExpr.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(wEx)).filter(col("rank") <= topK)
      .select("qid", "rank", "nid", "cos")
  }
}
