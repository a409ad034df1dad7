package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.AdditiveStats

/** Continuously-maintained windowed-count materialized view — the
  * warehouse-metrics member of the [[graft.sources.AdditiveStats]] family
  * (line stats, span stats, postings count CORPUS objects; this counts
  * TIME-WINDOWED events). A (window, dimension) count is additive over
  * disjoint event batches — every event lives in exactly one micro-batch —
  * so the accumulated fragment relation answers aggregate queries exactly
  * as a one-shot scan of all events would, under the protocol's full
  * replay/crash story (idempotent `batch_id` fragments, CAS-published
  * compaction folds, `compacted_through` watermark, stream identity pin).
  *
  * This is the exact-consistency alternative to "recompute the dashboard
  * from the fact table": the fact scan happens once per batch at ingest
  * (one map-side-combined (day, dim) aggregate per batch), and readers
  * fold fragments bounded by #windows × #dims × #fragments-since-compact.
  */
object MetricView {

  /** Per-day dimension counts of one batch: (day, <dim>, n). */
  def dailyCounts(events: DataFrame, tsCol: String, dimCol: String): DataFrame =
    events.groupBy(col(tsCol).cast("date").as("day"), col(dimCol))
      .agg(count(lit(1)).as("n"))

  def store(dir: String, dimCol: String = "event_type"): AdditiveStats.Store =
    AdditiveStats.Store(dir, Seq("day", dimCol), "n",
      s"day date, $dimCol string, n bigint, batch_id bigint")

  def init(spark: org.apache.spark.sql.SparkSession, dir: String,
           dimCol: String = "event_type"): Unit =
    AdditiveStats.init(spark, store(dir, dimCol))

  def fragmentCount(spark: org.apache.spark.sql.SparkSession, dir: String,
                    dimCol: String = "event_type"): Int =
    AdditiveStats.fragmentCount(spark, store(dir, dimCol))

  /** Land one batch's [[dailyCounts]] as an idempotent fragment. */
  def append(batch: DataFrame, tsCol: String, dimCol: String,
             dir: String, batchId: Long): Unit =
    AdditiveStats.append(dailyCounts(batch, tsCol, dimCol),
      store(dir, dimCol), batchId)

  /** Fold fragments into one summed partition in a fresh epoch. */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              dimCol: String = "event_type"): Unit =
    AdditiveStats.compact(spark, store(dir, dimCol))

  /** The accumulated view (day, dim, n): fragment rows for one key sum. */
  def read(spark: org.apache.spark.sql.SparkSession, dir: String,
           dimCol: String = "event_type"): DataFrame =
    AdditiveStats.read(spark, store(dir, dimCol))
      .groupBy(col("day"), col(dimCol))
      .agg(sum("n").as("n"))

  /** Top-k dimensions per day by count (ties broken by dimension value) —
    * the dashboard probe over the accumulated view.
    */
  def topKPerDay(counts: DataFrame, dimCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("day").orderBy(col("n").desc, col(dimCol).asc)
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("day"), col(dimCol), col("n"), col("rk"))
  }
}
