package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min–max data skipping over a parquet layout — the
  * Delta/Iceberg-style scan-pruning index, engine-side: a per-file stats
  * relation decides which files a range predicate can possibly touch, and the
  * probe reads ONLY those files.
  *
  * Parquet row-group statistics already prune WITHIN a file Spark decides to
  * open; this layer prunes the file LISTING itself, which is what matters at
  * warehouse scale — a 100 TB table is O(100k) files, and a time-range query
  * over a range-clustered layout (repartitionByRange / Z-order `src12`)
  * should plan O(matching) files, not list-then-discard all of them.
  *
  * The stats relation is one row per (file, column-range) — built with ONE
  * aggregate scan over the `_metadata.file_path` hidden column, additive
  * across appended files (rebuild = re-aggregate only new files, union), and
  * persistable as parquet next to the table. Its size is bounded by file
  * count, so the probe-time collect is driver-small by construction.
  *
  * Pruning is CONSERVATIVE (a file is kept unless its range PROVES it cannot
  * match), so results are exactly the full-scan results for closed-interval
  * predicates; files with null-only stats rows are always kept.
  */
object FileSkipping {

  /** Per-file min/max stats for `statCols`: (file, <c>_min, <c>_max ...). */
  def fileStats(spark: SparkSession, path: String, statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "need at least one stats column")
    spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file") +: statCols.map(col): _*)
      .groupBy("file")
      .agg(min(statCols.head).as(s"${statCols.head}_min"),
        (max(statCols.head).as(s"${statCols.head}_max") +:
          statCols.tail.flatMap(c =>
            Seq(min(c).as(s"${c}_min"), max(c).as(s"${c}_max")))): _*)
  }

  /** Files a closed-interval predicate `lo <= c <= hi` can possibly match:
    * keep file iff NOT (c_max < lo OR c_min > hi); a file whose stats are
    * null (all-null column chunk) is conservatively kept.
    */
  def candidateFiles(stats: DataFrame, c: String, lo: Column, hi: Column): Seq[String] =
    stats.filter(
        coalesce(!(col(s"${c}_max") < lo || col(s"${c}_min") > hi), lit(true)))
      .select("file").collect().map(_.getString(0)).toSeq

  /** Pruned range scan: open only the candidate files, then apply the exact
    * predicate (skipping is file-granular; the residual filter is still
    * needed inside kept files). Returns an empty-but-schemaed frame when no
    * file can match.
    */
  def readRange(spark: SparkSession, path: String, stats: DataFrame,
                c: String, lo: Column, hi: Column): DataFrame = {
    val files = candidateFiles(stats, c, lo, hi)
    val base =
      if (files.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(files: _*)
    base.filter(col(c) >= lo && col(c) <= hi)
  }
}
