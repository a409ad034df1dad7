package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.StoredIndex

/** PERSISTED ANN index — the similarity-search twin of the stored near-dup
  * index ([[NearDup.NearDupIndex]]): train once over the corpus, store the
  * compressed searchable representation in the warehouse, probe forever at
  * a fraction of the corpus cost. Storage rides the SHARED stored-index
  * protocol ([[graft.sources.StoredIndex]]) — the same generation-numbered
  * CAS meta, epoch directories, and grace-period sweep as the dedup index,
  * so concurrent writers fail fast instead of clobbering each other and a
  * reader loaded just before a rebuild keeps collecting. What is stored:
  *
  *   - `dir/meta_g{N}`       — generation-numbered k=v file pinning (dim,
  *                             m, pq_k, ivf_k, id_col, epoch) for the
  *                             index's lifetime: a probe reads its
  *                             parameters FROM the index, so a mismatched
  *                             probe is unrepresentable (same principle as
  *                             the dedup index's stored LSH params);
  *   - `dir/codebooks[_eE]`  — the PQ sub-codebooks and the IVF router as
  *                             parquet rows (driver-small: k·dim doubles);
  *   - `dir/codes[_eE]`      — one row per vector `(id, codes)`,
  *                             PARTITIONED BY `(frag, cell)`: a probe turns
  *                             its (bounded: |queries| × nprobe)
  *                             probed-cell list into a partition filter, so
  *                             the scan reads ONLY the probed cells' files
  *                             — `PartitionFilters` in the plan, measured
  *                             bytes — and reads code bytes, never vectors
  *                             (column pruning). `frag` is the append
  *                             fragment (the dedup index's `batch_id`
  *                             twin): -1 for the bulk build, the caller's
  *                             batch id for each [[append]].
  *
  * WRITE ORDER: relations first, meta last — a partially built epoch is
  * never reachable (the meta that references it does not exist yet), and
  * a rebuild's CAS swap keeps the superseded epoch's directories for one
  * grace cycle so in-flight readers finish.
  *
  * APPEND vs REBUILD: [[append]] encodes a new batch with the STORED
  * codebooks — O(batch) work, no retraining — and lands it as a
  * `frag = batchId` fragment under the live epoch, idempotently
  * (replaying a batch id overwrites its own partitions). The codebooks do
  * NOT see the appended vectors, so if the appended distribution drifts
  * from the training distribution, quantization error grows and recall
  * decays gracefully (cell routing and PQ scoring get coarser; the exact
  * re-rank keeps final scores correct). MEASURED (AnnIndexSpec
  * "codebook drift" case — appended clusters on axes the codebooks never
  * trained on, the worst case): drifted-query recall@5 is 0.175 / 0.375 /
  * 0.450 at 10% / 50% / 100% appended-vs-trained ratio, and a [[build]]
  * retrain over the grown corpus restores 1.000. In-distribution appends
  * lose nothing (e14 pins probing base+appended ≡ probing a one-shot
  * encode of the union under the same codebooks). Rule of thumb backed by
  * those numbers: rebuild (a crash-safe epoch swap) once appended rows
  * exceed roughly half the trained corpus — by then even fully drifted
  * appends sit near their decay plateau (~0.4) and retraining buys back
  * the rest; [[graft.streaming.StreamOps.annIngestStream]]'s
  * `rebuildEvery` automates the cadence with [[fragmentCount]] as the
  * signal.
  */
object AnnIndex {

  private val relNames = Seq("codebooks", "codes")
  private val coreKeys =
    Set("dim", "m", "pq_k", "ivf_k", "id_col", "epoch")

  /** A loaded index: parameters + driver-side codebooks + the lazy stored
    * codes relation (all fragments of the live epoch; `epoch` and the meta
    * generation ride along so writers loaded through [[loadWithGen]] can
    * CAS against the state they actually read).
    */
  final case class Loaded(dim: Int, m: Int, pqK: Int, ivfK: Int,
                          idCol: String, pq: PqAnn.PqCodebook,
                          ivf: Seq[(Int, Seq[Double])], codes: DataFrame,
                          epoch: Int = 0)

  /** Train (PQ sub-codebooks + IVF router), encode, and persist under
    * `dir`. Vectors should be L2-normalized if cosine ranking is intended
    * (PQ approximates the dot product; the exact re-rank is cosine either
    * way). On a fresh dir this publishes epoch 0; on an existing index it
    * is the REBUILD path: the new epoch's directories are written
    * complete, the meta pointer CAS-swaps (a concurrent writer that
    * advanced the index makes the swap fail fast), and epochs older than
    * the just-superseded one are swept — in-flight readers keep the
    * superseded epoch for one grace cycle.
    */
  def build(emb: DataFrame, idCol: String, vecCol: String, dir: String,
            dim: Int, m: Int = 8, pqK: Int = 16, ivfK: Int = 64,
            iterations: Int = 2): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (prevEpoch, expectedGen, carried) =
      if (StoredIndex.metaGeneration(spark, dir) < 0)
        (-1, -1, Map.empty[String, String])
      else {
        val (kv, g) = StoredIndex.readKvWithGen(spark, dir)
        // carry forward non-core keys (e.g. the continuous-ingest stream's
        // checkpoint-identity pin) — a maintenance rebuild must not strip
        // the stream's replay guards
        (kv("epoch").toInt, g, kv -- coreKeys)
      }
    val epoch = prevEpoch + 1
    // independent training chains — overlap their small sequential jobs
    // from two threads (guide §2.6); results are unchanged
    val (pq, ivf) = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val pqF = Future(PqAnn.codebook(emb, idCol, vecCol, dim, m, pqK, iterations))
      val ivfF = Future(IvfAnn.codebook(emb, idCol, vecCol, ivfK, iterations))
      (Await.result(pqF, Duration.Inf), Await.result(ivfF, Duration.Inf))
    }
    val cbRows =
      pq.centroids.zipWithIndex.flatMap { case (sub, s) =>
        sub.map { case (code, c) => ("pq", s, code, c) } } ++
      ivf.map { case (cell, c) => ("ivf", -1, cell, c) }
    cbRows.toDF("kind", "subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite")
      .parquet(StoredIndex.relPath(dir, "codebooks", epoch))
    PqAnn.encodeWithCells(emb, vecCol, pq, ivf)
      .select(col(idCol), col("codes"), col("cell"))
      .withColumn("frag", lit(-1L))
      .write.mode("overwrite").partitionBy("frag", "cell")
      .parquet(StoredIndex.relPath(dir, "codes", epoch))
    // meta LAST: a crash above leaves the old epoch live (or, on a fresh
    // dir, no readable index at all) — never a half-built one
    StoredIndex.writeMetaCas(spark, dir, carried.toSeq ++ Seq(
      "dim" -> dim.toString, "m" -> m.toString, "pq_k" -> pqK.toString,
      "ivf_k" -> ivfK.toString, "id_col" -> idCol,
      "epoch" -> epoch.toString), expectedGen)
    // grace sweep: keep prevEpoch for in-flight readers, drop older
    StoredIndex.sweepEpochsBelow(spark, dir, relNames, prevEpoch)
  }

  /** INCREMENTAL append — the O(batch) ingest path that keeps the index
    * from being write-once: encode `emb` with the STORED codebooks (no
    * retraining) and land it as the `frag = batchId` fragment of the live
    * epoch's codes relation, idempotently (an at-least-once replay of the
    * same batch id dynamic-overwrites its own partitions instead of
    * duplicating rows). Batch ids must be unique per logical batch —
    * concurrent appends of DIFFERENT batches write disjoint fragments and
    * serialize on the meta CAS below. The append is PUBLISHED by bumping
    * the meta generation with unchanged values, closing the
    * append-vs-rebuild race from both sides exactly like the dedup
    * index's [[NearDup.NearDupIndex.appendBatch]]: if a rebuild swapped
    * the epoch first, this batch's rows landed in the superseded
    * directories and the caller must replay; if this bump lands first, a
    * rebuild that loaded earlier loses ITS CAS and retrains over state
    * that includes the batch. Codebook-drift contract: see the class doc
    * — appended vectors are quantized by codebooks that never saw them.
    */
  def append(emb: DataFrame, dir: String, vecCol: String,
             batchId: Long): Unit =
    appendWith(emb, load(emb.sparkSession, dir), dir, vecCol, batchId)

  /** [[append]] against a caller-held [[Loaded]] snapshot — the testable
    * seam for the append-vs-rebuild race (same shape as the dedup index's
    * `appendBatch(dir, meta, …)`): a snapshot taken before a concurrent
    * rebuild makes the epoch check below fire.
    */
  private[graft] def appendWith(emb: DataFrame, idx: Loaded, dir: String,
                                vecCol: String, batchId: Long): Unit = {
    require(batchId >= 0, s"batchId must be >= 0 (got $batchId; -1 marks the bulk build)")
    val spark = emb.sparkSession
    val enc = PqAnn.encodeWithCells(emb, vecCol, idx.pq, idx.ivf)
      .select(col(idx.idCol), col("codes"), col("cell"))
      .withColumn("frag", lit(batchId))
    graft.sources.ParquetWarehouse.overwritePartitions(
      enc, StoredIndex.relPath(dir, "codes", idx.epoch), Seq("frag", "cell"))
    val (kvNow, genNow) = StoredIndex.readKvWithGen(spark, dir)
    if (kvNow("epoch").toInt != idx.epoch)
      throw new StoredIndex.ConcurrentIndexWriteException(
        s"ANN index at $dir was rebuilt (epoch ${idx.epoch} -> " +
        s"${kvNow("epoch")}) during the append of batch $batchId; the " +
        "appended rows landed in the superseded epoch — replay the batch")
    try StoredIndex.writeMetaCas(spark, dir, kvNow.toSeq, genNow)
    catch {
      case e: StoredIndex.ConcurrentIndexWriteException =>
        throw new StoredIndex.ConcurrentIndexWriteException(
          s"ANN index at $dir advanced during the append of batch " +
          s"$batchId — replay the batch (${e.getMessage})")
    }
  }

  /** VACUUM — the deletion/maintenance pass that completes the index
    * lifecycle (the similarity-search twin of the dedup index's
    * [[NearDup.compactIndex]]): drop every stored vector whose id is NOT
    * in `keepIds` (a curation pass deleted those documents) and fold the
    * per-batch append fragments into ONE bulk `frag = -1` relation, one
    * file per cell. The codebooks are carried over UNCHANGED — compaction
    * is O(index) re-layout, not a retrain, so it does not reset the
    * codebook-drift clock (a [[build]] does both). Crash-safe by the same
    * epoch-swap discipline as [[build]]: the folded relations land
    * complete in a fresh epoch, the meta pointer CAS-swaps last (a
    * concurrent append/rebuild that advanced the meta fails this swap
    * fast — and an append racing the OTHER way is caught by its own
    * epoch check + publish bump), and the superseded epoch survives one
    * grace cycle for in-flight readers.
    */
  def compact(spark: SparkSession, dir: String, keepIds: DataFrame): Unit = {
    val (kv, gen) = StoredIndex.readKvWithGen(spark, dir)
    val prevEpoch = kv("epoch").toInt
    val epoch = prevEpoch + 1
    val idCol = kv("id_col")
    val keep = keepIds.toDF(idCol)
    // relations first: codebooks carried verbatim, codes semi-pruned to
    // the kept ids and folded to one fragment, one file per cell
    spark.read.parquet(StoredIndex.relPath(dir, "codebooks", prevEpoch))
      .coalesce(1).write.mode("overwrite")
      .parquet(StoredIndex.relPath(dir, "codebooks", epoch))
    spark.read.parquet(StoredIndex.relPath(dir, "codes", prevEpoch))
      .join(keep, Seq(idCol), "left_semi")
      .select(col(idCol), col("codes"), col("cell"))
      .withColumn("frag", lit(-1L))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("frag", "cell")
      .parquet(StoredIndex.relPath(dir, "codes", epoch))
    // meta LAST, CAS against the generation we read: a writer that
    // advanced the index mid-compaction wins and this swap fails fast
    StoredIndex.writeMetaCas(spark, dir,
      kv.updated("epoch", epoch.toString).toSeq, gen)
    StoredIndex.sweepEpochsBelow(spark, dir, relNames, prevEpoch)
  }

  /** Number of append fragments in the live epoch's codes relation — a
    * pure directory listing, no data scan. Maintenance folds fragments
    * (and applies deletions) via [[compact]], or [[build]]s afresh when
    * the codebooks should also retrain.
    */
  def fragmentCount(spark: SparkSession, dir: String): Int = {
    val (kv, _) = StoredIndex.readKvWithGen(spark, dir)
    val p = new org.apache.hadoop.fs.Path(
      StoredIndex.relPath(dir, "codes", kv("epoch").toInt))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count { st =>
      val n = st.getPath.getName
      n.startsWith("frag=") && n != "frag=-1"
    }
  }

  def load(spark: SparkSession, dir: String): Loaded = {
    val (kv, _) = StoredIndex.readKvWithGen(spark, dir)
    val epoch = kv("epoch").toInt
    val (dim, m) = (kv("dim").toInt, kv("m").toInt)
    val rows = spark.read.parquet(StoredIndex.relPath(dir, "codebooks", epoch))
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
      spark.read.parquet(StoredIndex.relPath(dir, "codes", epoch)), epoch)
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
                 topK: Int, allow: Option[DataFrame] = None): DataFrame = {
    // ONE routing computation: the prune collect and the scoring join read
    // the same probes relation, so they cannot diverge
    val probes = IvfAnn.probeCells(queries, index.idCol, vecCol, index.ivf, nprobe)
    val probed = probes.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val cellPruned = index.codes.filter(col("cell").isInCollection(probed))
    // FILTERED search (the vector-database predicate push): a metadata
    // allow-list semi-joins the code relation BEFORE PQ scoring, so
    // disallowed vectors never cost a LUT lookup or a re-rank — pre-
    // filtering, not post-filtering, which means topK stays full-depth
    // under selective predicates instead of draining the candidate list
    val pruned = allow.fold(cellPruned)(a =>
      cellPruned.join(a.toDF(index.idCol), Seq(index.idCol), "left_semi"))
    PqAnn.searchTopKIvfFromProbes(pruned, vectors, queries, probes,
      index.idCol, vecCol, "codes", index.pq, topR, topK)
  }
}
