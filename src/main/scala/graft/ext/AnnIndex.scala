package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED ANN index — the similarity-search twin of the stored near-dup
  * index ([[NearDup.NearDupIndex]]): train once over the corpus, store the
  * compressed searchable representation in the warehouse, probe forever at
  * a fraction of the corpus cost. What is stored:
  *
  *   - `dir/meta`          — k=v text file pinning (dim, m, pq_k, ivf_k,
  *                           id_col) for the index's lifetime: a probe
  *                           reads its parameters FROM the index, so a
  *                           mismatched probe is unrepresentable (same
  *                           principle as the dedup index's stored LSH
  *                           params);
  *   - `dir/codebooks`     — the PQ sub-codebooks and the IVF router as
  *                           parquet rows (driver-small: k·dim doubles);
  *   - `dir/codes`         — one row per vector `(id, codes)`, PARTITIONED
  *                           BY its IVF `cell`: a probe turns its (bounded:
  *                           |queries| × nprobe) probed-cell list into a
  *                           partition filter, so the scan reads ONLY the
  *                           probed cells' files — `PartitionFilters` in
  *                           the plan, measured bytes, the same layout
  *                           discipline as the dedup index's
  *                           `(batch_id, ip)` scheme — and reads code
  *                           bytes, never vectors (column pruning).
  *
  * The index is WRITE-ONCE (build replaces wholesale; re-encode to absorb
  * corpus changes — per-batch incremental append would follow the
  * NearDupIndex fragment scheme and is out of scope here). The full
  * vectors stay in the caller's own table and are only joined back for
  * the exact re-rank of topR × |queries| rows.
  */
object AnnIndex {

  /** A loaded index: parameters + driver-side codebooks + the lazy stored
    * codes relation.
    */
  final case class Loaded(dim: Int, m: Int, pqK: Int, ivfK: Int,
                          idCol: String, pq: PqAnn.PqCodebook,
                          ivf: Seq[(Int, Seq[Double])], codes: DataFrame)

  /** Train (PQ sub-codebooks + IVF router), encode, and persist under
    * `dir`. Vectors should be L2-normalized if cosine ranking is intended
    * (PQ approximates the dot product; the exact re-rank is cosine either
    * way).
    */
  def build(emb: DataFrame, idCol: String, vecCol: String, dir: String,
            dim: Int, m: Int = 8, pqK: Int = 16, ivfK: Int = 64,
            iterations: Int = 2): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val pq = PqAnn.codebook(emb, idCol, vecCol, dim, m, pqK, iterations)
    val ivf = IvfAnn.codebook(emb, idCol, vecCol, ivfK, iterations)
    val cbRows =
      pq.centroids.zipWithIndex.flatMap { case (sub, s) =>
        sub.map { case (code, c) => ("pq", s, code, c) } } ++
      ivf.map { case (cell, c) => ("ivf", -1, cell, c) }
    cbRows.toDF("kind", "subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    PqAnn.encodeWithCells(emb, vecCol, pq, ivf)
      .select(col(idCol), col("codes"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")
    val meta = s"dim=$dim\nm=$m\npq_k=$pqK\nivf_k=$ivfK\nid_col=$idCol\n"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "meta"), true)
    try out.write(meta.getBytes("UTF-8")) finally out.close()
  }

  def load(spark: SparkSession, dir: String): Loaded = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(dir, "meta"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    val kv = text.linesIterator.filter(_.contains('=')).map { l =>
      val i = l.indexOf('='); (l.substring(0, i), l.substring(i + 1))
    }.toMap
    val (dim, m) = (kv("dim").toInt, kv("m").toInt)
    val rows = spark.read.parquet(s"$dir/codebooks")
      .select(col("kind"), col("subspace"), col("code"), col("centroid"))
      .collect()
    val pqSubs = (0 until m).map { s =>
      rows.filter(r => r.getString(0) == "pq" && r.getInt(1) == s)
        .map(r => (r.getInt(2), r.getSeq[Double](3).toSeq))
        .sortBy(_._1).toSeq
    }
    val ivf = rows.filter(_.getString(0) == "ivf")
      .map(r => (r.getInt(2), r.getSeq[Double](3).toSeq)).sortBy(_._1).toSeq
    Loaded(dim, m, kv("pq_k").toInt, kv("ivf_k").toInt, kv("id_col"),
      PqAnn.PqCodebook(dim, m, pqSubs), ivf,
      spark.read.parquet(s"$dir/codes"))
  }

  /** Probe the stored index: route queries to their `nprobe` nearest IVF
    * cells, PRUNE the stored codes relation to exactly those cells (the
    * probed-cell list is |queries| × nprobe at most — a bounded driver
    * collect, same contract as the dedup probe's touched-partition lists —
    * and becomes `PartitionFilters` on the codes scan), PQ-score the
    * surviving codes, and exact-rerank the top `topR` with true cosine
    * against `vectors` (the caller's full-vector table). All search
    * parameters except the probe knobs come from the index itself.
    */
  def searchTopK(index: Loaded, vectors: DataFrame, queries: DataFrame,
                 vecCol: String, nprobe: Int, topR: Int,
                 topK: Int): DataFrame = {
    // ONE routing computation: the prune collect and the scoring join read
    // the same probes relation, so they cannot diverge
    val probes = IvfAnn.probeCells(queries, index.idCol, vecCol, index.ivf, nprobe)
    val probed = probes.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val pruned = index.codes.filter(col("cell").isInCollection(probed))
    PqAnn.searchTopKIvfFromProbes(pruned, vectors, queries, probes,
      index.idCol, vecCol, "codes", index.pq, topR, topK)
  }
}
