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
}
