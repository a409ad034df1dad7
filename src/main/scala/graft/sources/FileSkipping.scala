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
      // basePath anchors partition discovery at the table root, so a
      // hive-partitioned layout keeps its partition columns (and their
      // values) even though the read lists individual data files
      else spark.read.option("basePath", path).parquet(files: _*)
    base.filter(col(c) >= lo && col(c) <= hi)
  }

  // ------------------------------------------------------------ bloom tier

  /** Per-file BLOOM skipping for EQUALITY probes — the complement of
    * min–max: a point lookup on a column the layout is NOT clustered by
    * gets nothing from ranges (every file's [min, max] spans the key), but
    * a per-file membership filter prunes every file the key never landed
    * in. This is Delta/Iceberg's bloom-index tier, engine-side.
    *
    * Representation: the exact OCCUPIED-BIT-POSITION sets of a two-hash
    * bloom (`pmod(xxhash64(c), bits)` and `pmod(xxhash64(c, 1), bits)`),
    * stored as sorted int arrays — built with the same ONE aggregate scan
    * as [[fileStats]] (collect_set is bounded by `bits`, so a stats row is
    * ≤ 2·bits ints regardless of file size), additive across appended
    * files, persistable next to the table. Membership test = both probe
    * positions present; no false negatives, so pruning is conservative and
    * the pruned read is EXACTLY the full-scan result after the residual
    * filter. False-positive rate per hash ≈ fill ratio (min(rows, bits) /
    * bits); size `bits` at ~16× the file's distinct keys for ~1% two-hash
    * fpp — fpp only costs an extra file open, never correctness.
    */
  def bloomStats(spark: SparkSession, path: String, c: String,
                 bits: Int = 4096): DataFrame = {
    require(bits > 0, "bits must be positive")
    spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file"),
        pmod(xxhash64(col(c)), lit(bits.toLong)).cast("int").as("__p1"),
        pmod(xxhash64(col(c), lit(1)), lit(bits.toLong)).cast("int").as("__p2"))
      .groupBy("file")
      .agg(sort_array(collect_set(col("__p1"))).as(s"${c}_bloom1"),
        sort_array(collect_set(col("__p2"))).as(s"${c}_bloom2"))
  }

  /** Files an equality probe `c = v` can possibly match: both probe
    * positions occupied (files with null bloom rows conservatively kept).
    * `v` must carry the column's exact data type — xxhash64 is
    * type-sensitive, so an int-typed literal probing a bigint column
    * would hash differently and miss (cast the literal first).
    */
  def bloomCandidateFiles(spark: SparkSession, stats: DataFrame, c: String,
                          v: Column, bits: Int = 4096): Seq[String] = {
    val probe = spark.range(1).select(
        pmod(xxhash64(v), lit(bits.toLong)).cast("int").as("p1"),
        pmod(xxhash64(v, lit(1)), lit(bits.toLong)).cast("int").as("p2"))
      .collect().head
    stats.filter(coalesce(
        array_contains(col(s"${c}_bloom1"), lit(probe.getInt(0))) &&
          array_contains(col(s"${c}_bloom2"), lit(probe.getInt(1))), lit(true)))
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Bloom-pruned equality scan: open only files whose bloom admits the
    * key, then apply the exact predicate.
    */
  def readEquality(spark: SparkSession, path: String, stats: DataFrame,
                   c: String, v: Column, bits: Int = 4096): DataFrame = {
    val files = bloomCandidateFiles(spark, stats, c, v, bits)
    val base =
      if (files.isEmpty) spark.read.parquet(path).limit(0)
      // basePath: see readRange — partition columns survive file reads
      else spark.read.option("basePath", path).parquet(files: _*)
    base.filter(col(c) === v)
  }
}
