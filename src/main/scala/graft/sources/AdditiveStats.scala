package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GENERIC persisted additive-statistics relation — the ONE storage
  * pattern under every "count things per batch, sum across batches"
  * continuous ingest (corpus line frequencies, duplicated-span window
  * frequencies, any future count relation): per-batch fragments land as
  * idempotent `batch_id` partitions, fragments SUM to the one-shot
  * corpus statistics because each document lives in exactly one batch,
  * and maintenance folds fragments into a single summed partition under
  * the shared [[StoredIndex]] generation-CAS protocol (crash-safe epoch
  * swaps, grace readers, `compacted_through` replay watermark, stream
  * identity pin). Extracted from [[graft.operators.LineDedup]]'s
  * round-10 store so its span-family twin shares one implementation
  * instead of a third copy — the same unification move round 10 made
  * with StoredIndex itself.
  *
  * Two storage modes (same as the line store always had):
  *   - BARE (no meta): fragments land directly under `dir` — the simple
  *     two-installment batch shape, no maintenance story;
  *   - PROTOCOL ([[init]] ran): epoch-suffixed directories, compaction,
  *     watermark, CAS publishes.
  *
  * A store is (dir, key columns, count column); the count column must be
  * additive over disjoint document batches (distinct-doc counts are,
  * because each doc is in exactly one batch).
  */
object AdditiveStats {

  /** `schemaDdl` is the full relation schema (key cols + count col +
    * `batch_id bigint`) used when an initialized-but-empty store is
    * read. `fold` is the aggregate that combines per-fragment payloads
    * for one key during compaction — `sum` for count relations (the
    * default); any other MERGEABLE payload works (e.g.
    * [[graft.plans.KmvSketch.mergeAgg]] for distinct-count sketches —
    * KMV union is exact, so fragments stay protocol-foldable).
    *
    * `disjointRows = true` declares the stronger contract that a KEY
    * never appears in more than one fragment (the crawl corpus store:
    * each document lives in exactly one batch), so the union of
    * fragments IS the fold and compaction degrades to a pure file
    * RE-LAYOUT — no groupBy, no exchange. That matters when the key
    * columns carry the payload itself (document text): an aggregation
    * fold would hash-shuffle the whole corpus keyed on its widest
    * column just to compute an identity.
    */
  final case class Store(dir: String, keyCols: Seq[String],
                         countCol: String, schemaDdl: String,
                         fold: org.apache.spark.sql.Column =>
                           org.apache.spark.sql.Column = sum,
                         disjointRows: Boolean = false)

  private val rel = "stats"

  private def metaKv(epoch: Int, compactedThrough: Long,
                     streamId: String, epochTag: String): Seq[(String, String)] = Seq(
    "epoch" -> epoch.toString,
    "epoch_tag" -> epochTag,
    "compacted_through" -> compactedThrough.toString,
    "stream_id" -> streamId)

  /** The live epoch's relation directory, resolved THROUGH the meta's
    * `epoch` + `epoch_tag` keys. Compactions write attempt-tagged
    * directories (`stats_e{E}_w{tag}`) so two same-epoch compaction
    * racers can never target the same path — the CAS loser's
    * overwrite-mode fold would otherwise clobber the directory the
    * winner just published (same fix as SplitManifest's release).
    * Stores written before the tag existed carry an empty/absent
    * `epoch_tag` and resolve through the old untagged layout.
    */
  private def epochDir(dir: String, kv: Map[String, String]): String = {
    val e = kv("epoch").toInt
    kv.getOrElse("epoch_tag", "") match {
      case "" => StoredIndex.relPath(dir, rel, e)
      case t => s"$dir/${rel}_e${e}_w$t"
    }
  }

  private def taggedEpochPath(dir: String, epoch: Int, tag: String): String =
    s"$dir/${rel}_e${epoch}_w$tag"

  private val relDirPattern = (rel + "(?:_e(\\d+)(?:_w[0-9a-f]+)?)?").r

  /** Sweep every stats directory of an epoch strictly below `keepFrom`
    * — tagged or not, published or orphaned (a crashed/losing
    * compaction attempt's epoch is at most the live one, so it ages out
    * the same way). One listing, not one blind delete per epoch.
    */
  private def sweepBelow(spark: SparkSession, dir: String,
                         keepFrom: Int): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries =
      try fs.listStatus(path) catch { case _: java.io.IOException => return }
    entries.iterator.filter(_.isDirectory).foreach { st =>
      st.getPath.getName match {
        case relDirPattern(genStr) =>
          val g = if (genStr == null) 0 else genStr.toInt
          if (g < keepFrom)
            try fs.delete(st.getPath, true)
            catch { case _: java.io.IOException => () }
        case _ => ()
      }
    }
  }

  /** Initialize an EMPTY protocol-managed store (meta only). Fresh
    * directories only: an EXISTING store fails loudly instead of
    * resetting its epoch/watermark/stream pin (callers that want
    * init-if-absent guard on [[StoredIndex.metaGeneration]] < 0, as the
    * streaming cycles do; two concurrent initializers race the CAS and
    * exactly one wins).
    */
  def init(spark: SparkSession, store: Store): Unit = {
    val gen = StoredIndex.metaGeneration(spark, store.dir)
    require(gen < 0,
      s"additive-stats store already exists at ${store.dir} (meta " +
        s"generation $gen): init is for fresh directories only — " +
        "re-initializing would reset the epoch, the compacted_through " +
        "replay watermark and the stream-identity pin, double-counting " +
        "replays")
    StoredIndex.writeMetaCas(spark, store.dir, metaKv(0, -1L, "", ""), gen)
  }

  /** Per-batch append fragments in the live epoch (directory listing;
    * the folded `batch_id=-1` partition is not a fragment). 0 for a
    * bare-mode or empty store.
    */
  def fragmentCount(spark: SparkSession, store: Store): Int = {
    if (StoredIndex.metaGeneration(spark, store.dir) < 0) return 0
    val (kv, _) = StoredIndex.readKvWithGen(spark, store.dir)
    val p = new org.apache.hadoop.fs.Path(epochDir(store.dir, kv))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count { st =>
      val n = st.getPath.getName
      n.startsWith("batch_id=") && n != "batch_id=-1"
    }
  }

  /** The replay watermark: the highest batch id already folded into the
    * `batch_id = -1` partition (-1 for a bare-mode, uninitialized, or
    * never-compacted store). A replaying batch at or below it finds its
    * own rows inside the fold — [[append]] skips it, and admission
    * operators short-circuit to the stored state (see
    * [[graft.operators.QuotaView.append]]).
    */
  def compactedThrough(spark: SparkSession, store: Store): Long =
    if (StoredIndex.metaGeneration(spark, store.dir) < 0) -1L
    else StoredIndex.readKvWithGen(spark, store.dir)
      ._1("compacted_through").toLong

  /** The accumulated relation — all fragments (and the folded partition)
    * of the live epoch in protocol mode, the bare directory otherwise;
    * an initialized-but-never-appended store reads as empty with the
    * store's declared schema.
    */
  def read(spark: SparkSession, store: Store): DataFrame = {
    val path =
      if (StoredIndex.metaGeneration(spark, store.dir) < 0) store.dir
      else epochDir(store.dir,
        StoredIndex.readKvWithGen(spark, store.dir)._1)
    readAt(spark, store, path)
  }

  /** Read one relation directory, with the declared-schema empty frame
    * ONLY for the two genuinely-absent conditions (no directory yet / no
    * files to infer from). Any other AnalysisException — schema drift,
    * corrupt footers — propagates: a broken store must not masquerade as
    * an empty one (admission operators would silently over-admit against
    * an empty prior).
    */
  private def readAt(spark: SparkSession, store: Store,
                     path: String): DataFrame =
    try spark.read.parquet(path)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if Option(e.getCondition).exists(c =>
            c.contains("PATH_NOT_FOUND") ||
              c.contains("UNABLE_TO_INFER_SCHEMA")) =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(store.schemaDdl))
    }

  /** Land one batch's ALREADY-AGGREGATED fragment (key cols + count col,
    * one logical batch of documents) as the `batch_id = <batchId>`
    * partition — dynamic-partition overwrite, so an at-least-once replay
    * overwrites its own fragment instead of double-counting. Protocol
    * mode additionally publishes via a CAS meta bump (closing the
    * append-vs-compaction race from both sides, like the dedup index's
    * appendBatch) and skips batches at or below `compacted_through`
    * (already folded in full).
    */
  def append(frag: DataFrame, store: Store, batchId: Long): Unit = {
    val spark = frag.sparkSession
    val tagged = frag.withColumn("batch_id", lit(batchId))
    if (StoredIndex.metaGeneration(spark, store.dir) < 0) {
      ParquetWarehouse.overwritePartitions(tagged, store.dir, Seq("batch_id"))
      return
    }
    val (kv, _) = StoredIndex.readKvWithGen(spark, store.dir)
    if (batchId >= 0 && batchId <= kv("compacted_through").toLong) return
    ParquetWarehouse.overwritePartitions(
      tagged, epochDir(store.dir, kv), Seq("batch_id"))
    val (now, gen) = StoredIndex.readKvWithGen(spark, store.dir)
    if (now("epoch") != kv("epoch"))
      throw new StoredIndex.ConcurrentIndexWriteException(
        s"additive-stats store at ${store.dir} was compacted (epoch " +
        s"${kv("epoch")} -> ${now("epoch")}) during the append of batch " +
        s"$batchId; the appended rows landed in the superseded epoch — " +
        "replay the batch")
    try StoredIndex.writeMetaCas(spark, store.dir, now.toSeq, gen)
    catch {
      case e: StoredIndex.ConcurrentIndexWriteException =>
        throw new StoredIndex.ConcurrentIndexWriteException(
          s"additive-stats store at ${store.dir} advanced during the " +
          s"append of batch $batchId — replay the batch (${e.getMessage})")
    }
  }

  /** Fold every fragment of the live epoch into ONE summed
    * `batch_id = -1` partition in a fresh epoch and CAS-swap the meta —
    * crash-safe exactly like the index compactions (old epoch stays live
    * until the swap, superseded epoch survives one grace cycle).
    * `compacted_through` advances to the highest folded batch id so
    * replays of folded batches become no-ops.
    */
  def compact(spark: SparkSession, store: Store): Unit = {
    val (kv, gen) = StoredIndex.readKvWithGen(spark, store.dir)
    val epoch = kv("epoch").toInt
    // ONE file-index snapshot serves both the watermark and the fold: a
    // fragment landing between a separate listing and the fold's own
    // scan would be folded yet sit ABOVE the watermark, so its mandated
    // replay (the appender's CAS loses against this compaction) would
    // double-count. max(batch_id) over the exact relation being folded
    // cannot disagree with the folded content.
    val snapshot = readAt(spark, store, epochDir(store.dir, kv))
    val maxBatch = snapshot
      .agg(coalesce(max(when(col("batch_id") >= 0, col("batch_id"))),
        lit(-1L)))
      .collect()(0).getLong(0)
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val folded =
      if (store.disjointRows)
        // each key lives in exactly one fragment: union IS the fold —
        // a pure re-layout, no exchange (see the Store contract)
        snapshot.select(
          (store.keyCols :+ store.countCol).map(col): _*)
      else snapshot
        .groupBy(store.keyCols.map(col): _*)
        .agg(store.fold(col(store.countCol)).as(store.countCol))
    folded
      .withColumn("batch_id", lit(-1L))
      .write.mode("overwrite").partitionBy("batch_id")
      .parquet(taggedEpochPath(store.dir, epoch + 1, tag))
    StoredIndex.writeMetaCas(spark, store.dir,
      metaKv(epoch + 1,
        math.max(maxBatch, kv("compacted_through").toLong),
        kv.getOrElse("stream_id", ""), tag), gen)
    sweepBelow(spark, store.dir, epoch)
  }
}
