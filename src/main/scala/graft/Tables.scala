package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All engine queries take the scale-factor directory as a parameter so the
  * same plan runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1+ (bench)
  * unchanged. Reads are plain parquet scans so Catalyst's column pruning and
  * filter pushdown reach the file source.
  *
  * `events.ts` has drifted across testdata generations: parquet
  * TIMESTAMP(NANOS) (read as long under
  * `spark.sql.legacy.parquet.nanosAsLong=true`, see [[Sessions]]),
  * timestamp[us] isAdjustedToUTC=false (read as TIMESTAMP_NTZ), and plain
  * UTC micros (TimestampType). [[events]] normalizes all three to
  * TimestampType — nanos via integer arithmetic (ns `div` 1000, no double
  * round-trip which would lose precision above 2^53), NTZ via a cast that
  * is a value identity under the pinned UTC session. TablesSpec guards the
  * three encodings so the next silent testdata regeneration fails a unit
  * test instead of the driver gate.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // testdata written as parquet timestamp[us] isAdjustedToUTC=false →
        // Spark reads TIMESTAMP_NTZ; the cast is a value identity under the
        // pinned UTC session and restores the type every ts consumer
        // (unix_micros, watermarks, interval arithmetic) expects
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
