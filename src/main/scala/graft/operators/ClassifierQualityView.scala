package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.AdditiveStats

/** Continuously-maintained CLASSIFIER-QUALITY view — the t30 evaluation
  * as a live dashboard (round-12 brief #6): per-batch CONFUSION-MARGINAL
  * fragments over the [[graft.sources.AdditiveStats]] protocol, so a
  * drifting quality gate is visible AT INGEST instead of at the next
  * offline eval. The composition the round-12 verdict asked for: t32's
  * trained [[HashedLinearScorer]] serving path supplies `pred_keep`, an
  * in-warehouse gold label supplies `gold_keep`, and the per-slice
  * (slice, gold, pred) counts are a pure multiset function of the corpus
  * — each document lives in exactly ONE batch, so fragment counts SUM to
  * the one-shot confusion matrix (the exact-regime additive contract all
  * the view family shares), with idempotent `batch_id` replay, CAS
  * folds and the `compacted_through` watermark by inheritance.
  *
  * CONTRACT: the weight vector (and gold rule) must be FIXED for the
  * store's lifetime — the model is part of the store's identity, like
  * the line store's `normalize` or the span store's `n`. Retrain ⇒ new
  * store. Documents whose normalized text is empty carry no features and
  * produce no marginal row (the [[HashedLinearScorer.score]] contract:
  * gate them on length, not on a vacuous logit).
  *
  * Per batch this is one scoring pass + one map-side-combined count per
  * (slice, gold, pred) — ≤ 4 rows per slice per batch shuffle wide.
  * Readers fold fragments and emit per-slice precision/recall/F1/accuracy
  * as fixed-order double divisions off exact counts (bit-replayable).
  */
object ClassifierQualityView {

  def store(dir: String): AdditiveStats.Store =
    AdditiveStats.Store(dir, Seq("slice", "gold_keep", "pred_keep"), "n",
      "slice string, gold_keep boolean, pred_keep boolean, n bigint, " +
        "batch_id bigint")

  def init(spark: org.apache.spark.sql.SparkSession, dir: String): Unit =
    AdditiveStats.init(spark, store(dir))

  def fragmentCount(spark: org.apache.spark.sql.SparkSession,
                    dir: String): Int =
    AdditiveStats.fragmentCount(spark, store(dir))

  /** One batch's confusion marginals: score with the FIXED gate, join the
    * gold label and slice back by `idCol`, count per (slice, gold, pred).
    */
  def marginals(batch: DataFrame, idCol: String, textCol: String,
                sliceCol: Column, goldKeep: Column, buckets: Int,
                weightInt: Column => Column, den: Long): DataFrame =
    HashedLinearScorer.score(batch, idCol, textCol, buckets, weightInt,
        den, calib = 8.0)
      .select(col(idCol), col("keep").as("pred_keep"))
      .join(batch.select(col(idCol), sliceCol.as("slice"),
        goldKeep.as("gold_keep")), idCol)
      .groupBy(col("slice"), col("gold_keep"), col("pred_keep"))
      .agg(count(lit(1)).as("n"))

  /** Land one batch's [[marginals]] as an idempotent fragment. */
  def append(batch: DataFrame, idCol: String, textCol: String,
             sliceCol: Column, goldKeep: Column, buckets: Int,
             weightInt: Column => Column, den: Long, dir: String,
             batchId: Long): Unit =
    AdditiveStats.append(
      marginals(batch, idCol, textCol, sliceCol, goldKeep, buckets,
        weightInt, den),
      store(dir), batchId)

  /** Fold fragments into one summed partition in a fresh epoch. */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String): Unit =
    AdditiveStats.compact(spark, store(dir))

  /** The accumulated per-slice evaluation: exact confusion counts plus
    * precision/recall/F1/accuracy (t30's formulas — single fixed-order
    * double divisions off the exact counts, F1 from the unrounded p/r;
    * null where undefined).
    */
  def read(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val m = AdditiveStats.read(spark, store(dir))
      .groupBy(col("slice"))
      .agg(
        sum(col("n")).as("n_docs"),
        sum(when(col("gold_keep") && col("pred_keep"), col("n"))
          .otherwise(0L)).as("tp"),
        sum(when(!col("gold_keep") && col("pred_keep"), col("n"))
          .otherwise(0L)).as("fp"),
        sum(when(col("gold_keep") && !col("pred_keep"), col("n"))
          .otherwise(0L)).as("fn"),
        sum(when(!col("gold_keep") && !col("pred_keep"), col("n"))
          .otherwise(0L)).as("tn"))
    val praw = when(col("tp") + col("fp") > 0,
      col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
    val rraw = when(col("tp") + col("fn") > 0,
      col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
    m.select(col("slice"), col("n_docs"), col("tp"), col("fp"), col("fn"),
      col("tn"),
      round(praw, 6).as("prec"), round(rraw, 6).as("rec"),
      when(praw.isNotNull && rraw.isNotNull && praw + rraw > 0,
        round(lit(2.0) * praw * rraw / (praw + rraw), 6)).as("f1"),
      round((col("tp") + col("tn")).cast("double") /
        col("n_docs").cast("double"), 6).as("accuracy"))
  }
}
