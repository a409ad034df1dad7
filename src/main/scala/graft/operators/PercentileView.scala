package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.QuantileSketch
import graft.sources.AdditiveStats

/** Continuously-maintained PERCENTILE view — the quantile member of the
  * [[graft.sources.AdditiveStats]] family ([[MetricView]] counts,
  * [[DistinctView]] distinct-counts, this order statistics — the
  * latency/length-percentile dashboard no additive counter or KMV union
  * can answer).
  *
  * The payload is a [[graft.plans.QuantileSketch]] log-histogram per day:
  * merge is binwise count addition, EXACT and order-invariant
  * (merge-of-sketches ≡ sketch-of-union bit-for-bit), so per-batch
  * sketch fragments fold to byte-identical state in any order and the
  * accumulated view answers p50/p95/p99 as if one sketch had seen every
  * event — deterministic, oracle-gateable (the bin function is integer
  * bit arithmetic a SQL engine replays exactly), with the protocol's
  * replay/crash story by inheritance (idempotent `batch_id` fragments,
  * CAS folds, `compacted_through` watermark, stream identity pin).
  *
  * Per batch this is ONE map-side-combined aggregate carrying ≤ bins
  * (long, long) pairs per day; readers fold #days × #fragments sketches.
  * Values below 2^(s+1) are EXACT (s19 runs there); above, answers carry
  * relative error ≤ 2^−s.
  */
object PercentileView {

  /** Default bin budget SIZED TO the resolution `s` (round-12 ADVICE:
    * the raw QuantileSketch default of 2^16 left s=15 only ~2 octaves
    * above the exact regime — a realistic latency stream in finer units
    * would throw mid-stream). `(64−s)·2^s` bins cover the ENTIRE
    * non-negative long domain at resolution s (the exact regime's 2^(s+1)
    * bins plus 2^s per remaining octave), so up to the 2^22 memory
    * ceiling (bins are 16 bytes each, materialized only when occupied)
    * the default can never throw; past the ceiling the explicit
    * maxBins-throw contract stands and callers size it with
    * the `maxBins` override.
    */
  def defaultMaxBins(s: Int): Int = math.min((64L - s) << s, 1L << 22).toInt

  /** Per-day sketch of one batch's non-negative integral `valueCol`.
    * `maxBins ≤ 0` → [[defaultMaxBins]].
    */
  def dailySketch(events: DataFrame, tsCol: String, valueCol: String,
                  s: Int = 15, maxBins: Int = -1): DataFrame =
    events.groupBy(col(tsCol).cast("date").as("day"))
      .agg(QuantileSketch.sketch(col(valueCol), s,
        if (maxBins > 0) maxBins else defaultMaxBins(s)).as("sketch"))

  def store(dir: String): AdditiveStats.Store =
    AdditiveStats.Store(dir, Seq("day"), "sketch",
      "day date, sketch binary, batch_id bigint",
      fold = QuantileSketch.mergeAgg)

  def init(spark: org.apache.spark.sql.SparkSession, dir: String): Unit =
    AdditiveStats.init(spark, store(dir))

  def fragmentCount(spark: org.apache.spark.sql.SparkSession, dir: String): Int =
    AdditiveStats.fragmentCount(spark, store(dir))

  /** Land one batch's [[dailySketch]] as an idempotent fragment
    * (`maxBins ≤ 0` → [[defaultMaxBins]]).
    */
  def append(batch: DataFrame, tsCol: String, valueCol: String,
             dir: String, batchId: Long, s: Int = 15,
             maxBins: Int = -1): Unit =
    AdditiveStats.append(dailySketch(batch, tsCol, valueCol, s, maxBins),
      store(dir), batchId)

  /** Fold fragments into one merged sketch per day in a fresh epoch. */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String): Unit =
    AdditiveStats.compact(spark, store(dir))

  /** The accumulated view: (day, n_events, p<p> per requested percentile).
    * Fragment sketches for one day union exactly before extraction.
    */
  def read(spark: org.apache.spark.sql.SparkSession, dir: String,
           percents: Seq[Int] = Seq(50, 95, 99)): DataFrame = {
    val merged = AdditiveStats.read(spark, store(dir))
      .groupBy(col("day"))
      .agg(QuantileSketch.mergeAgg(col("sketch")).as("__m"))
    merged.select(col("day") +:
      QuantileSketch.sketchCount(col("__m")).as("n_events") +:
      percents.map(p => QuantileSketch.quantileAt(col("__m"), p).as(s"p$p")): _*)
  }
}
