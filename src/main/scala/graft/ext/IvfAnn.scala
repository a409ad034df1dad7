package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.CosineSimilarityExpr

/** IVF (inverted-file) approximate nearest-neighbour index — the scale path
  * for embedding similarity search (brute force is O(n) per query; IVF probes
  * `nprobe`/`k` of the corpus).
  *
  * Pipeline: [[codebook]] learns k centroids with Lloyd iterations (hash
  * seeding → assign → per-dimension mean), [[assign]] gives every vector its
  * nearest cell, [[searchTopK]] routes each query to its `nprobe` closest
  * cells and scores only those cells' members.
  *
  * Scale shape: the codebook is k·dim doubles — always broadcast; assignment
  * is a map-side argmin over the broadcast codebook (no shuffle); search
  * shuffles only the probed cells' candidates. Distances against the
  * (driver-collected, literal) centroids fold in deterministic order, so
  * assignments are reproducible run-to-run.
  */
object IvfAnn {

  /** Squared L2 distance between a vector column and a literal centroid. */
  private def l2sqToLit(vec: Column, centroid: Seq[Double]): Column =
    aggregate(
      zip_with(vec, typedLit(centroid), (x, c) => {
        val d = x.cast("double") - c; d * d
      }),
      lit(0.0), (acc, x) => acc + x)

  /** (cell, dist) pairs to every centroid, as one array column. */
  private def cellDistances(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column =
    array(centroids.map { case (cell, c) =>
      struct(l2sqToLit(vec, c).as("dist"), lit(cell).as("cell"))
    }: _*)

  /** Nearest cell id for a vector (argmin by distance, ties → lowest cell):
    * a fused codegen expression — one k·dim loop per row, no per-row array
    * allocations or interpreted lambda dispatch (the HOF composition rode
    * CodegenFallback). Bit-identical arithmetic to the [[cellDistances]]
    * fold.
    */
  private def nearestCell(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column =
    graft.plans.NearestCentroidExpr.nearest(vec, centroids)

  /** Learn a k-cell codebook: deterministic hash seeding, then `iterations`
    * Lloyd steps (assign to nearest centroid, recompute per-dimension means).
    * Returns the collected codebook — k·dim values, driver-small by design.
    *
    * Each Lloyd pass is ONE job: per-(cell, dim) decimal sums + counts —
    * a constant THREE aggregate expressions regardless of vector width, so
    * the plan (and its generated code) is small and cache-hits across
    * passes, and there is no per-pass dim-discovery job (dim falls out of
    * the collected rows). The k·dim result rows are reassembled into
    * centroids driver-side — 512 rows for k=8, dim=64.
    *
    * Sums route through DECIMAL(27,12): the cast rounds each component to
    * 12 dp (deterministic per value), the sum is exact and therefore
    * shuffle-order-independent, and the unscaled accumulator stays
    * Long-backed (fast path) for any |Σx| < 1e15 — far beyond normalized
    * embedding sums. The whole index is reproducible bit-for-bit
    * run-to-run, which the golden-parquet regression net for e06 relies on.
    */
  def codebook(emb: DataFrame, idCol: String, vecCol: String, k: Int,
               iterations: Int = 2): Seq[(Int, Seq[Double])] = {
    import org.apache.spark.sql.types.DecimalType
    def means(assigned: DataFrame): Seq[(Int, Seq[Double])] =
      assigned
        .select(col("__cell"), posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy("__cell", "dim")
        .agg(sum(col("x").cast("double").cast(DecimalType(27, 12))).as("s"),
          count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1))
            .map(r => r.getDecimal(2).doubleValue() / r.getLong(3)).toSeq
        }.toSeq.sortBy(_._1)
    var cb = means(emb.withColumn("__cell",
      pmod(xxhash64(col(idCol)), lit(k)).cast("int")))
    for (_ <- 0 until iterations)
      cb = means(emb.withColumn("__cell", nearestCell(col(vecCol), cb)))
    cb
  }

  /** Map-side cell assignment against the broadcast (literal) codebook. */
  def assign(emb: DataFrame, vecCol: String,
             cb: Seq[(Int, Seq[Double])]): DataFrame =
    emb.withColumn("cell", nearestCell(col(vecCol), cb))

  /** `nprobe` nearest cells per query — (qid, qv, cell), one row per
    * probed cell: sort the (dist, cell) array, slice, explode. Shared by
    * [[searchTopK]] and [[PqAnn]]'s IVFADC form so both route identically.
    */
  private[ext] def probeCells(queries: DataFrame, idCol: String,
                              vecCol: String, cb: Seq[(Int, Seq[Double])],
                              nprobe: Int): DataFrame =
    queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"),
        slice(array_sort(cellDistances(col(vecCol), cb)), 1, nprobe).as("pc"))
      .select(col("qid"), col("qv"), explode(col("pc").getField("cell")).as("cell"))

  /** ANN top-k: probe the `nprobe` nearest cells per query, score only their
    * members with the native cosine expression, keep the best `topK`.
    */
  def searchTopK(emb: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, cb: Seq[(Int, Seq[Double])],
                 nprobe: Int, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = assign(emb, vecCol, cb)
      .select(col(idCol).as("nid"), col(vecCol).as("cv"), col("cell"))
    val probes = probeCells(queries, idCol, vecCol, cb, nprobe)
    val scored = cells.join(broadcast(probes), Seq("cell"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("cos", CosineSimilarityExpr.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select("qid", "rank", "nid", "cos")
  }
}
