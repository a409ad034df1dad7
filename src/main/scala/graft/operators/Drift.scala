package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two batches of the same table —
  * the monitoring primitive a continuously-ingesting training-data
  * pipeline runs per batch: "does today's data still look like the
  * corpus?". Population Stability Index over FIXED equal-width bins:
  *
  *   PSI = Σ_bins (p_b − q_b) · ln(p_b / q_b)
  *
  * with p/q the per-bin probability mass of the reference/candidate
  * batches. Conventional reading: < 0.1 stable, 0.1–0.25 drifting,
  * > 0.25 shifted.
  *
  * Static bins (caller-supplied range) rather than quantile bins on
  * purpose: quantile edges move with the data, which makes the metric
  * incomparable across batches AND nondeterministic under resampling —
  * fixed edges keep PSI a pure function of the two inputs (and keep the
  * whole computation two map-side binning passes + two tiny aggregates,
  * no sort, no quantile sketch). Mass is Laplace-smoothed (`eps`) so an
  * empty bin contributes a finite, engine-reproducible term instead of
  * ±∞.
  */
object Drift {

  /** Per-bin drift detail: bin index, both masses, PSI contribution
    * (all rounded to 6 dp for cross-engine stability). Total PSI =
    * `sum(contrib)` — left to the caller/oracle so the per-bin evidence
    * stays inspectable.
    */
  def psiByBin(reference: DataFrame, candidate: DataFrame, valueCol: String,
               bins: Int, lo: Double, hi: Double,
               eps: Double = 1e-6): DataFrame = {
    require(bins > 0 && hi > lo, "need bins > 0 and hi > lo")
    val width = (hi - lo) / bins
    def binned(df: DataFrame, side: String) = df
      .select(least(greatest(floor((col(valueCol) - lo) / width), lit(0.0)),
        lit((bins - 1).toDouble)).cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(s"n_$side"))
    val p = binned(reference, "ref")
    val q = binned(candidate, "cand")
    // tiny (≤ bins rows) per-side totals; cross-joined as literal-ish scalars
    val nRef = reference.agg(count(lit(1)).as("t_ref"))
    val nCand = candidate.agg(count(lit(1)).as("t_cand"))
    val allBins = reference.sparkSession.range(bins).select(col("id").cast("int").as("bin"))
    val joined = allBins
      .join(p, Seq("bin"), "left").join(q, Seq("bin"), "left")
      .crossJoin(broadcast(nRef)).crossJoin(broadcast(nCand))
      .select(col("bin"),
        (coalesce(col("n_ref"), lit(0L)) / col("t_ref") + eps).as("pm"),
        (coalesce(col("n_cand"), lit(0L)) / col("t_cand") + eps).as("qm"))
    joined.select(col("bin"),
      round(col("pm"), 6).as("p_mass"),
      round(col("qm"), 6).as("q_mass"),
      round((col("pm") - col("qm")) * log(col("pm") / col("qm")), 6).as("contrib"))
  }

  /** CONTINUOUS drift monitoring: per-tumbling-window PSI of `valueCol`
    * against a FIXED reference histogram (`refMasses` — the training-time
    * distribution, one probability mass per bin on the same static grid).
    *
    * Streaming-safe by construction: the only stateful operator is ONE
    * event-time windowed aggregation (per-bin conditional counts + the
    * window total in a single `agg`), everything after it is a stateless
    * projection — so the identical plan runs in batch and under
    * Structured Streaming with a watermark (StreamingSpec differential).
    * State per window is `bins` longs; at 100 TB/day the cost is the one
    * shuffle any windowed count pays, and the reference side is a
    * broadcast literal, not a join.
    *
    * Emits one row per (window, bin): `window_start, bin, q_mass,
    * contrib` with q the window's mass — same smoothing/rounding
    * contract as [[psiByBin]]; per-window PSI = `sum(contrib)`.
    */
  def windowedPsi(events: DataFrame, tsCol: String, valueCol: String,
                  windowLen: String, refMasses: Seq[Double],
                  lo: Double, hi: Double, watermark: Option[String] = None,
                  eps: Double = 1e-6): DataFrame = {
    val bins = refMasses.size
    require(bins > 0 && hi > lo, "need refMasses and hi > lo")
    val width = (hi - lo) / bins
    val src = watermark.fold(events)(events.withWatermark(tsCol, _))
    val binCol = least(greatest(floor((col(valueCol) - lo) / width), lit(0.0)),
      lit((bins - 1).toDouble)).cast("int")
    val binCounts = (0 until bins).map(b =>
      sum(when(col("__bin") === b, 1L).otherwise(0L)).as(s"__c$b"))
    src.withColumn("__bin", binCol)
      .groupBy(window(col(tsCol), windowLen).as("w"))
      .agg(count(lit(1)).as("__total"), binCounts: _*)
      .select(col("w.start").as("window_start"), col("__total"),
        array((0 until bins).map(b => col(s"__c$b")): _*).as("__cnts"))
      .select(col("window_start"), col("__total"),
        posexplode(col("__cnts")).as(Seq("bin", "__n")))
      .select(col("window_start"), col("bin"),
        (col("__n") / col("__total") + eps).as("qm"),
        (element_at(typedLit(refMasses), col("bin") + 1) + eps).as("pm"))
      .select(col("window_start"), col("bin"),
        round(col("qm"), 6).as("q_mass"),
        round((col("pm") - col("qm")) * log(col("pm") / col("qm")), 6).as("contrib"))
  }
}
