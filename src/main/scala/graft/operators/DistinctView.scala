package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.KmvSketch
import graft.sources.AdditiveStats

/** Continuously-maintained DISTINCT-COUNT view — the sketch member of the
  * [[graft.sources.AdditiveStats]] family ([[MetricView]] counts events
  * per window; this counts DISTINCT keys per window, which no additive
  * counter can do because the same user appears in many batches).
  *
  * The payload is a KMV sketch per (day): sketch union is EXACT
  * (the k smallest hashes of A ∪ B are computable from the two k-smallest
  * sets — [[graft.plans.KmvSketch.mergeAgg]]), so per-batch sketch
  * fragments fold to byte-identical results in any order and the
  * accumulated view answers "distinct users that day" as if one sketch
  * had seen every event — deterministic, golden-gateable, with the
  * protocol's full replay/crash story by inheritance (idempotent
  * `batch_id` fragments, CAS folds, `compacted_through` watermark,
  * stream identity pin).
  *
  * Per batch this is ONE map-side-combined aggregate carrying k longs per
  * (day); readers fold #days × #fragments sketches. The exact alternative
  * (a distinct-pairs store) costs O(distinct keys) per window — this
  * costs O(k), the classic sketch trade a 100 TB dashboard makes.
  */
object DistinctView {

  /** Per-day KMV sketch of one batch's `keyCol`: (day, sketch). */
  def dailySketch(events: DataFrame, tsCol: String, keyCol: String,
                  k: Int = 256): DataFrame =
    events.groupBy(col(tsCol).cast("date").as("day"))
      .agg(KmvSketch.sketch(col(keyCol), k).as("sketch"))

  def store(dir: String): AdditiveStats.Store =
    AdditiveStats.Store(dir, Seq("day"), "sketch",
      "day date, sketch binary, batch_id bigint",
      fold = KmvSketch.mergeAgg)

  def init(spark: org.apache.spark.sql.SparkSession, dir: String): Unit =
    AdditiveStats.init(spark, store(dir))

  def fragmentCount(spark: org.apache.spark.sql.SparkSession, dir: String): Int =
    AdditiveStats.fragmentCount(spark, store(dir))

  /** Land one batch's [[dailySketch]] as an idempotent fragment. */
  def append(batch: DataFrame, tsCol: String, keyCol: String,
             dir: String, batchId: Long, k: Int = 256): Unit =
    AdditiveStats.append(dailySketch(batch, tsCol, keyCol, k),
      store(dir), batchId)

  /** Fold fragments into one merged sketch per day in a fresh epoch. */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String): Unit =
    AdditiveStats.compact(spark, store(dir))

  /** The accumulated view (day, distinct-count estimate): fragment
    * sketches for one day union exactly, estimates round to 6 dp.
    */
  def read(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    AdditiveStats.read(spark, store(dir))
      .groupBy(col("day"))
      .agg(KmvSketch.mergeAgg(col("sketch")).as("__m"))
      .select(col("day"),
        round(KmvSketch.estimate(col("__m")), 6).as("est_distinct"))
}
