package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.CosineSimilarityExpr

/** Embedding-cosine near-duplicate pairs with BOUNDED per-block work — the
  * dedup-by-embedding operator for training-data pipelines.
  *
  * Same scale shape as [[NearDup.lshCandidates]]: block members are
  * collect_list'd per blocking key (ONE shuffle), pairs expand IN-ROW via a
  * double explode, and `maxBlockSize` drops degenerate blocks instead of
  * letting one hot key go quadratic — an uncapped equi-self-join on the
  * blocking key is O(n²/k) per block and a scale-killer the moment one block
  * grows with the corpus. Dropped blocks trade recall on pathological keys
  * for bounded work, exactly like the MinHash/SimHash paths.
  *
  * At corpus scale the blocking key should NOT be a free-text label (labels
  * grow O(n/k)): [[cosineNearDupsByCell]] blocks by IVF cell from
  * [[IvfAnn.codebook]], whose granularity is chosen (k cells) independent of
  * any label skew. Cross-cell near-dups are missed by construction — the
  * standard single-probe trade; raise `k`'s resolution or run twice with a
  * rotated codebook when recall matters more than cost.
  */
object EmbeddingDedup {

  /** All within-block pairs (idA < idB) with cosine ≥ `threshold`, blocks
    * bounded by `maxBlockSize` members (oversized blocks are DROPPED — see
    * object doc). Output: (id_a, id_b, cos), cos the raw double.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         blockCol: String, threshold: Double,
                         maxBlockSize: Int = 1000): DataFrame = {
    val blocks = df
      .select(col(blockCol).as("__blk"),
        struct(col(idCol).as("id"), col(vecCol).as("v")).as("m"))
      .groupBy(col("__blk")).agg(collect_list(col("m")).as("ms"))
      .filter(size(col("ms")).between(2, maxBlockSize))
    blocks.select(explode(col("ms")).as("a"), col("ms"))
      .select(col("a"), explode(col("ms")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("cos", CosineSimilarityExpr.cosine(col("a.v"), col("b.v")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos"))
  }

  /** The scale API: block by IVF cell (codebook granularity, not label
    * skew), then run the bounded pair expansion within cells.
    */
  def cosineNearDupsByCell(emb: DataFrame, idCol: String, vecCol: String,
                           cb: Seq[(Int, Seq[Double])], threshold: Double,
                           maxBlockSize: Int = 1000): DataFrame =
    cosineNearDupPairs(IvfAnn.assign(emb, vecCol, cb), idCol, vecCol,
      "cell", threshold, maxBlockSize)

  /** Codebook-free scale blocking: bucket by the deterministic
    * hyperplane-LSH signature (e04's quantizer — `2^planes` buckets, no
    * training pass), then the bounded pair expansion within buckets. Near-
    * identical vectors project to the same side of every hyperplane, so
    * true near-dups co-bucket with high probability; recall tunes DOWN as
    * `planes` grows (finer buckets, cheaper pairs). Use the IVF-cell
    * variant when a codebook already exists — cells track the data
    * distribution, hyperplanes don't.
    */
  def cosineNearDupsBySignature(emb: DataFrame, idCol: String, vecCol: String,
                                dim: Int, planes: Int, threshold: Double,
                                maxBlockSize: Int = 1000): DataFrame =
    cosineNearDupPairs(
      emb.withColumn("__sig",
        graft.plans.HyperplaneSignatureExpr.signature(col(vecCol), dim, planes)),
      idCol, vecCol, "__sig", threshold, maxBlockSize)

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — "Semantic
    * deduplication: ...remove semantic duplicates"): within each block
    * (their k-means cluster), DROP every item whose cosine to an EARLIER
    * item of the same block reaches `threshold`; the survivors are the
    * corpus's semantic representatives. The paper's vectorized rule is an
    * upper-triangular max over a cluster ordering — earlier items are
    * compared against regardless of whether they themselves survive — so
    * it composes exactly from [[cosineNearDupPairs]]: dropped = the
    * distinct `id_b` side. "Earlier" here is ascending id (the paper
    * orders by centroid distance; id-order makes the result engine-exact
    * and oracle-replayable — document order, same contract as A2's
    * keep-first dedup).
    *
    * Returns `df`'s KEPT rows unchanged. Oversized blocks (over
    * `maxBlockSize`) skip pair expansion entirely and keep all members —
    * the cap degrades retention, never deletes data it didn't compare.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    blockCol: String, threshold: Double,
                    maxBlockSize: Int = 1000): DataFrame = {
    val dropped = cosineNearDupPairs(df, idCol, vecCol, blockCol, threshold,
        maxBlockSize)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dropped, Seq(idCol), "left_anti")
  }

  /** The scale form: block by IVF cell (the paper's k-means clustering —
    * pair cost bounded by cell size, one shuffle on cell).
    */
  def semanticDedupByCell(emb: DataFrame, idCol: String, vecCol: String,
                          cb: Seq[(Int, Seq[Double])], threshold: Double,
                          maxBlockSize: Int = 1000): DataFrame = {
    val assigned = IvfAnn.assign(emb, vecCol, cb)
    semanticDedup(assigned, idCol, vecCol, "cell", threshold, maxBlockSize)
      .drop("cell")
  }
}
