package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained EQUI-JOIN materialized view — classic delta
  * algebra (the incremental-view-maintenance literature's insert-only
  * case): with batches ΔA_b, ΔB_b arriving together,
  *
  *   ΔJ_b = ΔA_b ⨝ B_{<b}  ∪  A_{<b} ⨝ ΔB_b  ∪  ΔA_b ⨝ ΔB_b
  *
  * and J = ∪_b ΔJ_b equals A ⨝ B exactly (every row pair (a from batch
  * i, b from batch j) is produced by exactly the batch max(i, j) — a
  * telescoping cover, multiset-exact, no retractions needed for
  * append-only inputs). This is the persisted-warehouse complement to
  * the in-memory stream-stream joins (s08/s12): both input histories and
  * the view live as parquet relations, so the join of two unbounded
  * streams survives restarts, serves batch readers mid-stream, and never
  * holds state in executor memory.
  *
  * Storage rides the shared [[StoredIndex]] protocol — three relations
  * (`left`, `right`, `join`) with idempotent `batch_id = b` fragment
  * partitions in the live epoch:
  *   - counterpart reads for ΔJ_b filter `batch_id < b` (partition-level
  *     prune), so a CRASHED attempt's own half-written fragments are
  *     invisible to its replay — the recompute is deterministic;
  *   - all three `frag = b` writes are dynamic-partition overwrites
  *     (at-least-once replays rewrite identical bytes);
  *   - `committed_through` advances (CAS) only after all three land, so
  *     readers never see a batch's join rows before its input rows;
  *   - [[compact]] folds fragments into one `batch_id = -1` partition per
  *     relation in a fresh epoch (crash-safe CAS swap, grace readers) —
  *     pure re-layout, no arithmetic, `committed_through` preserved so
  *     folded-batch replays stay no-ops;
  *   - the stream twin pins checkpoint identity via
  *     [[StoredIndex.pinStreamIdentity]] (a fresh checkpoint would
  *     recycle batch ids over existing fragments).
  *
  * Scale shape per batch: ΔA⨝B and A⨝ΔB are batch-vs-history joins where
  * the BATCH side broadcasts when small (the common case — history is
  * unbounded, deltas are not); nothing rescans the accumulated view, and
  * history reads prune to committed fragments. At 100 TB the `join`
  * relation is what a dashboard reads instead of re-joining two fact
  * tables per query.
  */
object JoinView {

  /** `keys` are the equi-join columns (same names both sides); the DDLs
    * describe each full relation INCLUDING `batch_id bigint` (used for
    * empty reads of initialized stores). `buckets > 0` hash-buckets the
    * stored input histories on the join key (`bk = xxhash64(keys) mod
    * buckets`, a second partition level under `batch_id`): each delta
    * join then reads ONLY the history partitions whose bucket one of the
    * batch's keys hashes into — the SCD2-dimension trick — so per-batch
    * cost tracks the delta's key spread, not the accumulated history
    * size. Unbucketed (0) scans the full history per batch, which is
    * fine for bounded histories and wrong at 100 TB.
    */
  final case class View(dir: String, keys: Seq[String],
                        leftDdl: String, rightDdl: String, joinDdl: String,
                        buckets: Int = 0)

  private val rels = Seq("left", "right", "join")

  private def metaKv(epoch: Int, committedThrough: Long,
                     streamId: String): Seq[(String, String)] = Seq(
    "epoch" -> epoch.toString,
    "committed_through" -> committedThrough.toString,
    "stream_id" -> streamId)

  /** Initialize an empty view store (meta only; fails on an existing one). */
  def init(spark: SparkSession, view: View): Unit =
    StoredIndex.writeMetaCas(spark, view.dir, metaKv(0, -1L, ""),
      StoredIndex.metaGeneration(spark, view.dir))

  def committedThrough(spark: SparkSession, view: View): Long =
    StoredIndex.readKvWithGen(spark, view.dir)._1("committed_through").toLong

  /** Per-batch fragments of the `join` relation in the live epoch (the
    * folded `batch_id=-1` partition is not a fragment).
    */
  def fragmentCount(spark: SparkSession, view: View): Int = {
    if (StoredIndex.metaGeneration(spark, view.dir) < 0) return 0
    val (kv, _) = StoredIndex.readKvWithGen(spark, view.dir)
    val p = new org.apache.hadoop.fs.Path(
      StoredIndex.relPath(view.dir, "join", kv("epoch").toInt))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count { st =>
      val n = st.getPath.getName
      n.startsWith("batch_id=") && n != "batch_id=-1"
    }
  }

  private def bucketed(view: View, rel: String): Boolean =
    view.buckets > 0 && rel != "join"

  private def bk(view: View): org.apache.spark.sql.Column =
    pmod(xxhash64(view.keys.map(col): _*), lit(view.buckets.toLong)).cast("int")

  private def relDf(spark: SparkSession, view: View, rel: String,
                    ddl: String, epoch: Int): DataFrame = {
    val path = StoredIndex.relPath(view.dir, rel, epoch)
    val fullDdl = if (bucketed(view, rel)) s"$ddl, bk int" else ddl
    try spark.read.parquet(path)
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(fullDdl))
    }
  }

  private def ddlFor(view: View, rel: String): String = rel match {
    case "left" => view.leftDdl
    case "right" => view.rightDdl
    case _ => view.joinDdl
  }

  /** Counterpart-history read pruned at the LISTING level: enumerate the
    * relation's `batch_id=*` fragment directories once (bounded by the
    * compaction cadence), keep those before `batchId`, and read ONLY the
    * touched `bk=` subdirectories via explicit paths + basePath. The
    * previous shape — full-table read then `.filter(bk isin ...)` — still
    * listed every (fragment × bucket) directory per append, a driver
    * metadata cost that grows with history size even though the pruned
    * SCAN did not (the 1x/10x/20x smoke trend exposed the creep).
    */
  private def relDfPruned(spark: SparkSession, view: View, rel: String,
                          ddl: String, epoch: Int, bks: Seq[Int],
                          batchId: Long): DataFrame = {
    def empty: DataFrame = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        if (bucketed(view, rel)) s"$ddl, bk int" else ddl))
    if (!bucketed(view, rel))
      return relDf(spark, view, rel, ddl, epoch)
        .filter(col("batch_id") < batchId)
    if (bks.isEmpty) return empty
    val root = new org.apache.hadoop.fs.Path(
      StoredIndex.relPath(view.dir, rel, epoch))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return empty
    val fragDirs = fs.listStatus(root).iterator
      .filter(_.isDirectory).map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.startsWith("batch_id=") &&
          n.stripPrefix("batch_id=").toLong < batchId
      }.toSeq
    val paths = for {
      frag <- fragDirs
      k <- bks
      q = new org.apache.hadoop.fs.Path(frag, s"bk=$k") if fs.exists(q)
    } yield q.toString
    if (paths.isEmpty) empty
    else spark.read.option("basePath", root.toString).parquet(paths: _*)
      .filter(col("batch_id") < batchId) // belt over the dir-level prune
  }

  /** One maintenance step: land ΔA/ΔB as `frag = batchId` and append the
    * delta join. Idempotent under at-least-once replay (committed batches
    * no-op; uncommitted replays recompute against `batch_id < b` history
    * and overwrite their own partitions).
    */
  def appendBatch(a: DataFrame, b: DataFrame, view: View, batchId: Long): Unit = {
    require(batchId >= 0, "batch ids are non-negative")
    val spark = a.sparkSession
    val (kv, _) = StoredIndex.readKvWithGen(spark, view.dir)
    if (batchId <= kv("committed_through").toLong) return
    val epoch = kv("epoch").toInt
    // the buckets this batch's keys hash into — bounded by view.buckets,
    // driver-small by construction; prunes the counterpart history scan
    def bksOf(df: DataFrame): Seq[Int] =
      if (view.buckets <= 0) Nil
      else df.select(bk(view).as("__bk")).distinct()
        .collect().map(_.getInt(0)).toSeq
    def prune(df: DataFrame, bks: Seq[Int]): DataFrame =
      if (view.buckets <= 0) df
      else if (bks.isEmpty) df.limit(0)
      else df.filter(col("bk").isin(bks.map(Integer.valueOf): _*))
    // history BEFORE this batch: committed fragments + the folded -1
    // partition (all folded ids are committed < batchId) — pruned at the
    // LISTING level to the delta's key buckets (relDfPruned; the
    // unbucketed form keeps the plain batch_id filter)
    val bksA = bksOf(a)
    val bksB = bksOf(b)
    val aPre = prune(
      relDfPruned(spark, view, "left", view.leftDdl, epoch, bksB, batchId),
      bksB).drop("batch_id", "bk")
    val bPre = prune(
      relDfPruned(spark, view, "right", view.rightDdl, epoch, bksA, batchId),
      bksA).drop("batch_id", "bk")
    val deltaJoin = a.join(bPre, view.keys)
      .unionByName(aPre.join(b, view.keys))
      .unionByName(a.join(b, view.keys))
    def land(df: DataFrame, rel: String): Unit = {
      val (tagged, parts) =
        if (bucketed(view, rel))
          (df.withColumn("batch_id", lit(batchId)).withColumn("bk", bk(view)),
            Seq("batch_id", "bk"))
        else (df.withColumn("batch_id", lit(batchId)), Seq("batch_id"))
      ParquetWarehouse.overwritePartitions(
        tagged, StoredIndex.relPath(view.dir, rel, epoch), parts)
    }
    land(deltaJoin, "join") // before inputs: an uncommitted join frag is
    land(a, "left")         // invisible (readers gate on committed_through)
    land(b, "right")
    val (now, gen) = StoredIndex.readKvWithGen(spark, view.dir)
    if (now("epoch") != kv("epoch"))
      throw new StoredIndex.ConcurrentIndexWriteException(
        s"join view at ${view.dir} was compacted during the append of " +
        s"batch $batchId — the fragments landed in the superseded epoch; " +
        "replay the batch")
    StoredIndex.writeMetaCas(spark, view.dir,
      metaKv(kv("epoch").toInt,
        math.max(batchId, now("committed_through").toLong),
        now.getOrElse("stream_id", "")), gen)
  }

  /** The maintained view (committed rows only). */
  def read(spark: SparkSession, view: View): DataFrame = readRel(spark, view, "join")

  /** One accumulated input or the view itself, gated on `committed_through`
    * so a crashed batch's partial fragments never surface.
    */
  def readRel(spark: SparkSession, view: View, rel: String): DataFrame = {
    val (kv, _) = StoredIndex.readKvWithGen(spark, view.dir)
    relDf(spark, view, rel, ddlFor(view, rel), kv("epoch").toInt)
      .filter(col("batch_id") <= kv("committed_through").toLong)
      .drop("batch_id", "bk")
  }

  /** Fold each relation's fragments into one `batch_id = -1` partition in
    * a fresh epoch (pure re-layout — the small-file maintenance a
    * micro-batch sink needs) and CAS-swap; superseded epoch survives one
    * grace cycle, `committed_through` unchanged.
    */
  def compact(spark: SparkSession, view: View): Unit = {
    val (kv, gen) = StoredIndex.readKvWithGen(spark, view.dir)
    val epoch = kv("epoch").toInt
    rels.foreach { rel =>
      val folded = relDf(spark, view, rel, ddlFor(view, rel), epoch)
        .filter(col("batch_id") <= kv("committed_through").toLong)
        .drop("batch_id")
        .withColumn("batch_id", lit(-1L))
      val parts = if (bucketed(view, rel)) Seq("batch_id", "bk")
        else Seq("batch_id")
      folded.write.mode("overwrite").partitionBy(parts: _*)
        .parquet(StoredIndex.relPath(view.dir, rel, epoch + 1))
    }
    StoredIndex.writeMetaCas(spark, view.dir,
      metaKv(epoch + 1, kv("committed_through").toLong,
        kv.getOrElse("stream_id", "")), gen)
    StoredIndex.sweepEpochsBelow(spark, view.dir, rels, epoch)
  }
}
