package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.{InterleaveBitsExpr, SearchSortedExpr}

/** Z-ORDER table layout: rewrite a parquet table so its files are
  * clustered on SEVERAL columns at once. Each clustering column is
  * grid-celled by its own quantiles ([[SearchSortedExpr]] — rank-based, so
  * skew cannot collapse the grid), the cells are Morton-interleaved into
  * one code ([[InterleaveBitsExpr]]), and the table is range-partitioned
  * and sorted by that code. Every output file then carries a tight min/max
  * envelope on EVERY clustering column, so parquet row-group/file pruning
  * works for predicates on any of them — the layout answer to "which
  * single sort order should this 100 TB table have" being "none of them".
  *
  * The rewrite is a full-table pass (run it in the maintenance window at
  * the cadence large tables re-layout, e.g. weekly or post-backfill);
  * reads stay cheap forever after. Crash-safe via a durable staging swap:
  * the clustered copy is written and MARKED next to the table before any
  * original file is touched, the apply step is a file-level move (no
  * recompute, so the z-locality of the staged files survives exactly),
  * and [[recover]] finishes a half-applied swap idempotently.
  */
object Zorder {

  private val cells = 256 // 8 bits per dimension resolved by the quantile grid

  /** The Z-code column for `zcols` over `df`, each column celled by its
    * `cells`-quantile cutoffs (computed here — one approxQuantile pass).
    */
  def zcode(df: DataFrame, zcols: Seq[String]): Column = {
    require(zcols.size >= 2 && zcols.size <= 4, "z-order needs 2 to 4 columns")
    val probs = (1 until cells).map(_.toDouble / cells).toArray
    val cuts = df.stat.approxQuantile(zcols.toArray, probs, 0.001)
    val celled = zcols.zip(cuts).map { case (c, cut) =>
      SearchSortedExpr.searchSorted(col(c), cut.distinct.sorted)
    }
    InterleaveBitsExpr.zorderCode(celled: _*)
  }

  /** Rewrite the table at `path` into `numFiles` files clustered by the
    * Z-code of `zcols`. Value-preserving and idempotent (a second run
    * re-clusters already-clustered data).
    */
  def rewrite(spark: SparkSession, path: String, zcols: Seq[String],
              numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    recover(spark, path)
    val df = spark.read.parquet(path)
    val clustered = df
      .withColumn("__z", zcode(df, zcols))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    val stage = stagePath(path)
    val fs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(stage, true)
    clustered.write.mode("overwrite").parquet(stage.toString)
    // the marker carries the staged-file MANIFEST: apply/recover must know
    // the full staged set even after some files have already moved, or a
    // re-entered swap would mistake moved files for stale table data
    val manifest = dataFiles(fs, stage).map(_.getName).mkString("\n")
    // tmp-then-rename so the marker appears ATOMICALLY with its full
    // manifest — a crash mid-write leaves only the tmp, which recover
    // treats as an incomplete (discardable) stage
    val tmp = new Path(stage, "._STAGED.tmp")
    val out = fs.create(tmp, true)
    out.write(manifest.getBytes("UTF-8"))
    out.close()
    fs.rename(tmp, new Path(stage, "_STAGED"))
    applyStage(spark, path)
  }

  private def stagePath(path: String): Path = {
    val p = new Path(path)
    new Path(p.getParent, s".${p.getName}.zorder")
  }

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem, dir: Path) =
    fs.listStatus(dir).toSeq.filter { f =>
      val n = f.getPath.getName
      f.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.map(_.getPath)

  /** Swap the marked stage into the table: delete the old data files,
    * MOVE the staged files in (a rename per file — the staged sort order
    * and therefore the per-file z-envelopes survive byte-for-byte), drop
    * the stage. Every step is idempotent under re-entry: files are either
    * already deleted or already moved.
    */
  private def applyStage(spark: SparkSession, path: String): Unit = {
    val stage = stagePath(path)
    val table = new Path(path)
    val fs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(stage, "_STAGED")
    val manifest = {
      val in = fs.open(marker)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
      txt.split("\n").filter(_.nonEmpty).toSet
    }
    // old = any table data file NOT in the staged manifest (stale original
    // or a previous half-applied swap's survivor); staged files that were
    // already moved are protected by the manifest
    dataFiles(fs, table).filterNot(f => manifest(f.getName))
      .foreach(fs.delete(_, false))
    dataFiles(fs, stage).filter(f => manifest(f.getName))
      .foreach(f => fs.rename(f, new Path(table, f.getName)))
    fs.delete(stage, true)
  }

  /** Finish a swap a crashed [[rewrite]] left behind: a marked stage is
    * re-applied (the clustered copy is complete and durable), an unmarked
    * one is discarded (the table was never touched). Returns true if a
    * completed stage was applied.
    */
  def recover(spark: SparkSession, path: String): Boolean = {
    val stage = stagePath(path)
    val fs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(stage)) return false
    val marked = fs.exists(new Path(stage, "_STAGED"))
    if (marked) applyStage(spark, path) else fs.delete(stage, true)
    marked
  }
}
