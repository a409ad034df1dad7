package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental (watermark-based) JDBC extraction — the step after the
  * reference's reload-the-world `load_table` (`ops/load.py:36-74`): pull
  * only source rows whose monotonically-increasing watermark column
  * (version, sequence key, epoch-millis) exceeds the highest value
  * already extracted, and land them in the parquet lake. What a nightly
  * full reload costs at warehouse scale is exactly what this avoids.
  *
  * The watermark state rides the shared [[StoredIndex]] meta protocol:
  *   - each pull lands as an idempotent `pull = <n>` parquet partition
  *     BEFORE the meta advances (dynamic-partition overwrite);
  *   - the new watermark is computed from the LANDED parquet (never from
  *     a second source read — the source may have moved);
  *   - the (watermark, pull-counter) pair advances in one CAS, so a crash
  *     between landing and commit replays the SAME pull id over the same
  *     partition — a superset re-pull overwrites it, never duplicates;
  *   - the filter `wm > watermark` is pushed down as remote SQL
  *     ([[JdbcSink.readQuery]]), so the database scans its index, not
  *     Spark.
  *
  * At-least-once from the SOURCE's perspective, exactly-once in the lake.
  * Requires the watermark column to be monotonic for NEW rows (the
  * standard CDC-lite contract; updates to old rows need a version/updated
  * column as the watermark instead of an insert key).
  */
object JdbcIncremental {

  private def metaKv(watermark: Long, pull: Long): Seq[(String, String)] =
    Seq("watermark" -> watermark.toString, "pull" -> pull.toString)

  /** Initialize extraction state: everything strictly above `startAfter`
    * (default: pull all) is considered new.
    */
  def init(spark: SparkSession, dir: String,
           startAfter: Long = Long.MinValue): Unit =
    StoredIndex.writeMetaCas(spark, dir, metaKv(startAfter, 0L),
      StoredIndex.metaGeneration(spark, dir))

  def watermark(spark: SparkSession, dir: String): Long =
    StoredIndex.readKvWithGen(spark, dir)._1("watermark").toLong

  /** One incremental pull: extract rows with `wmCol > watermark`, land as
    * the `pull = <n>` partition, advance the state. Returns the number of
    * rows pulled (0 leaves the state untouched).
    */
  def pull(spark: SparkSession, cfg: JdbcSink.JdbcConfig, table: String,
           wmCol: String, dir: String,
           dialect: JdbcSink.SqlDialect = JdbcSink.DerbyDialect): Long = {
    val (kv, gen) = StoredIndex.readKvWithGen(spark, dir)
    val wm = kv("watermark").toLong
    val pullId = kv("pull").toLong
    // Spark's JDBC writer creates the TABLE unquoted (engine case-folds
    // it -> storedName) but quotes COLUMN identifiers (case preserved)
    val stored = dialect.q(dialect.storedName(table))
    val rows = JdbcSink.readQuery(spark, cfg,
      s"SELECT * FROM $stored WHERE ${dialect.q(wmCol)} > $wm")
    if (rows.isEmpty) return 0L
    ParquetWarehouse.overwritePartitions(
      rows.withColumn("pull", lit(pullId)), s"$dir/data", Seq("pull"))
    // watermark from the LANDED rows — the source may already have moved on
    val landed = spark.read.parquet(s"$dir/data").filter(col("pull") === pullId)
    val newWm = landed.agg(max(col(wmCol)).cast("long")).collect().head.getLong(0)
    StoredIndex.writeMetaCas(spark, dir, metaKv(newWm, pullId + 1L), gen)
    landed.count()
  }

  /** Everything extracted so far (all committed pulls). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val (kv, _) = StoredIndex.readKvWithGen(spark, dir)
    spark.read.parquet(s"$dir/data")
      .filter(col("pull") < kv("pull").toLong)
      .drop("pull")
  }
}
