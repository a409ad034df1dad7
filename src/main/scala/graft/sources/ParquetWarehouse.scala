package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet warehouse writer — the engine-native replacement for the
  * reference's drop-and-recreate JDBC loads (`ops/load.py:36-74`).
  *
  * At 100 TB a full drop-and-reload is not a strategy; the scale-correct
  * idiom is DYNAMIC partition overwrite: a batch rewrites exactly the
  * partitions it produced rows for, and every other partition survives.
  * Rerunning a day's batch is idempotent (same input → same partitions
  * rewritten), which is what the reference's full reload was approximating
  * on one machine.
  */
object ParquetWarehouse {

  /** Overwrite only the partitions present in `df` (dynamic mode), leaving
    * all other partitions of the table untouched.
    */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Full-table overwrite (the reference's drop-and-recreate, for
    * dimension-sized tables where it stays cheap).
    */
  def overwriteAll(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  // ------------------------------------------------- staged overwrite
  // A dynamic partition overwrite whose ONLY copy of the surviving rows
  // is the very partitions being rewritten (upsert's merged winners,
  // compaction's refolded rows) has a data-loss window: a crash between
  // the committer's delete of the old partition files and the commit of
  // the new ones loses those partitions, and pinning the rows with
  // localCheckpoint does not help — executor block storage dies with the
  // app. The fix is a DURABLE staging hop: write the new rows to a
  // hidden sibling directory first, mark it complete, then overwrite the
  // table FROM the staged copy. Every crash window is now recoverable:
  //   - crash while staging: the table is untouched; the unmarked
  //     staging dir is swept on the next run;
  //   - crash during the overwrite: the staged copy (marked complete) is
  //     still durable — [[recoverStagedOverwrite]] re-applies it
  //     idempotently before the next maintenance pass touches the table.
  // Single-writer contract (maintenance window), same as before — the
  // fixed staging path also makes two concurrent passes visibly collide
  // instead of silently interleaving.

  private def stagingPath(path: String): org.apache.hadoop.fs.Path = {
    val p = new org.apache.hadoop.fs.Path(path)
    new org.apache.hadoop.fs.Path(p.getParent, s".${p.getName}.staging")
  }

  /** Re-apply a staged overwrite left behind by a crashed [[upsert]] /
    * [[compactPartitions]] (called automatically by both; public for
    * recovery drills). A complete (marked) staging dir is re-applied to
    * the table — idempotent, value-preserving — and removed; an
    * incomplete one is just removed. Returns true if a completed stage
    * was re-applied.
    */
  def recoverStagedOverwrite(spark: SparkSession, path: String,
                             partitionCols: Seq[String]): Boolean = {
    val stage = stagingPath(path)
    val fs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(stage)) return false
    val marked = fs.exists(new org.apache.hadoop.fs.Path(stage, "_STAGED"))
    if (marked) {
      // the main table's schema pins the partition-column types, so the
      // staged read can never re-infer them differently (e.g. a string
      // partition value "01" collapsing to int 1 and landing in a NEW
      // partition directory)
      val schema = spark.read.parquet(path).schema
      overwritePartitions(spark.read.schema(schema).parquet(stage.toString),
        path, partitionCols)
    }
    fs.delete(stage, true)
    marked
  }

  /** Overwrite `df`'s partitions in `path` THROUGH the durable staging
    * hop described above. `onePerPartition` re-folds each partition to a
    * single output file at apply time (compaction's contract; upsert
    * keeps the natural task parallelism).
    */
  private[sources] def stagedOverwrite(df: DataFrame, path: String,
                              partitionCols: Seq[String],
                              onePerPartition: Boolean): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val stage = stagingPath(path)
    val fs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(stage, true)
    df.write.mode("overwrite").partitionBy(partitionCols: _*)
      .parquet(stage.toString)
    fs.create(new org.apache.hadoop.fs.Path(stage, "_STAGED"), true).close()
    // the schema pin mirrors recoverStagedOverwrite's (see note there)
    val staged0 = spark.read.schema(df.schema).parquet(stage.toString)
    val staged = if (onePerPartition) staged0.repartition(partitionCols.map(col): _*)
                 else staged0
    overwritePartitions(staged, path, partitionCols)
    fs.delete(stage, true)
  }

  /** Keyed UPSERT (merge) into a partitioned parquet table: rows of
    * `updates` replace existing rows with the same key, new keys append,
    * untouched PARTITIONS are never rewritten. This is the plain-parquet
    * answer to MERGE INTO (no table format in this environment): read back
    * only the partitions the batch touches, resolve winners with a
    * keep-last-by-version window, and dynamic-overwrite exactly those
    * partitions. Cost scales with the touched partitions, not the table —
    * the correct shape for a 100 TB warehouse where a daily batch touches
    * a handful of date partitions.
    *
    * `versionCol` breaks ties between an existing row and an update with
    * the same key (higher wins; updates win equal versions — the batch is
    * authoritative for what it carries). The table must be partitioned by
    * `partitionCols` and keys must not move across partitions (a moved key
    * would leave its old row in an untouched partition — that is a delete
    * + insert, not an upsert).
    */
  def upsert(updates: DataFrame, path: String, keys: Seq[String],
             partitionCols: Seq[String], versionCol: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val spark = updates.sparkSession
    val exists = try { spark.read.parquet(path).take(1).nonEmpty || true }
                 catch { case _: Throwable => false }
    if (!exists) {
      overwritePartitions(updates, path, partitionCols)
      return
    }
    // a crashed previous pass may have left the table half-overwritten
    // with its surviving rows only in the staging dir — restore BEFORE
    // reading the current state
    recoverStagedOverwrite(spark, path, partitionCols)
    val touched = updates.select(partitionCols.map(col): _*).distinct()
    val current = spark.read.parquet(path)
      .join(broadcast(touched), partitionCols, "left_semi") // partition-pruned read-back
    val merged = current.withColumn("__upd", lit(0))
      .unionByName(updates.withColumn("__upd", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("__upd").desc)
    val winners = merged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__upd")
    // durable staging hop: the merged winners exist on disk before the
    // overwrite deletes any of the partitions they were computed from
    // (both the read-overwrite hazard and the crash-loss window)
    stagedOverwrite(winners, path, partitionCols, onePerPartition = false)
  }

  /** SMALL-FILE COMPACTION for a partitioned parquet table — the
    * warehouse-sink twin of the dedup index's fragment vacuum. Streaming
    * sinks and per-batch dynamic overwrites leave one file per
    * (batch × partition); after weeks of micro-batches a 100 TB table's
    * planning cost is dominated by file-listing and its scans by
    * tiny-row-group overhead. This pass rewrites ONLY the partitions
    * carrying more than `maxFiles` data files, folding each back to one
    * file per partition (rows hash-route by partition key, so each
    * partition's rows land in exactly one task → one output file), and
    * never touches an already-compact partition.
    *
    * Value-preserving by construction (a rewrite of the same rows) and
    * idempotent (a second run finds nothing over `maxFiles`). The
    * fragmented-partition scan is partition-pruned (`basePath` read of
    * just those directories); the directory walk is driver-side but
    * bounded by the PARTITION count, not the file count per partition —
    * the same contract as the index's fragmentCount. CRASH-SAFE via the
    * durable staging hop: the refolded rows are on disk (and marked
    * complete) before any original file is deleted, and a crash
    * mid-overwrite is repaired by the automatic
    * [[recoverStagedOverwrite]] on the next pass. Like any in-place
    * parquet swap it is not atomic per partition for concurrent readers;
    * run it in the maintenance window, same as `NearDupIndex.compactStored`
    * (which additionally epoch-swaps because its readers are continuous).
    *
    * Returns the number of partitions compacted.
    */
  def compactPartitions(spark: SparkSession, path: String,
                        partitionCols: Seq[String],
                        maxFiles: Int = 1): Int = {
    require(partitionCols.nonEmpty, "compactPartitions needs a partitioned table")
    require(maxFiles >= 1, s"maxFiles must be >= 1, got $maxFiles")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    recoverStagedOverwrite(spark, path, partitionCols)
    def leafDirs(p: org.apache.hadoop.fs.Path, depth: Int): Seq[org.apache.hadoop.fs.Path] =
      if (depth == partitionCols.size) Seq(p)
      else fs.listStatus(p).toSeq.filter(_.isDirectory)
        .flatMap(d => leafDirs(d.getPath, depth + 1))
    def dataFiles(d: org.apache.hadoop.fs.Path): Int =
      fs.listStatus(d).count { f =>
        val n = f.getPath.getName
        f.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    val fragmented = leafDirs(root, 0).filter(dataFiles(_) > maxFiles)
    if (fragmented.isEmpty) return 0
    // read ONLY the fragmented partitions; basePath keeps the partition
    // columns in the schema so the dynamic overwrite lands them back.
    // The staging hop makes these rows durable BEFORE their source files
    // are deleted; onePerPartition folds each partition to one file at
    // apply time (each partition's rows hash-route to exactly one task)
    val data = spark.read.option("basePath", path)
      .parquet(fragmented.map(_.toString): _*)
    stagedOverwrite(data, path, partitionCols, onePerPartition = true)
    fragmented.size
  }
}
