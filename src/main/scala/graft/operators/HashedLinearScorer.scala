package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.plans.RollingHashExpr

/** Hashed bag-of-words LINEAR SCORER — the serving side of a
  * fastText/CCNet-style document quality classifier (the model family the
  * GPT-3 / CCNet data pipelines used to gate web text against a trusted
  * corpus): tokens hash into `buckets` feature slots, each slot carries a
  * weight, a document's logit is the mean slot weight of its tokens, and
  * the gate keeps documents whose logit clears zero.
  *
  * Engine-exact by construction: weights are INTEGERS over a common
  * denominator (`den`), summed exactly per document (no double
  * accumulation order to drift between engines — same DECIMAL discipline
  * as `Cols.decimalSum`); the single double division and the sigmoid
  * happen once per document at the end, and the keep decision compares
  * the INTEGER sum against zero. Training happens offline; the trained
  * vector arrives as `weightInt` (typically
  * `element_at(typedlit(weights), bucket + 1)` over a broadcast literal
  * array — `buckets` slots, driver-small at any corpus scale).
  *
  * Shape at 100 TB: normalize → explode tokens → codegen'd rolling-hash
  * bucket + integer weight per row → one partially-aggregated groupBy on
  * the document id. The shuffle carries one (id, count, sum) triple per
  * document after map-side combine — the same cost class as the t01
  * token-stats pass, with zero UDFs and no interpreted lambda.
  */
object HashedLinearScorer {

  /** Score `textCol` per `idCol` row. Emits `(idCol, n_tokens, score,
    * prob, keep)`: `score` = Σ w / (n·den) (the mean-weight logit),
    * `prob` = sigmoid(`calib`·score), `keep` = integer-exact Σ w ≥ 0.
    * Documents whose normalized text is empty produce no row (they carry
    * no features; gate them on length, not on a vacuous logit).
    */
  def score(docs: DataFrame, idCol: String, textCol: String, buckets: Int,
            weightInt: Column => Column, den: Long,
            calib: Double): DataFrame = {
    require(buckets > 0 && den > 0, "need positive buckets and denominator")
    val norm = TextFunctions.normalizeWs(col(textCol))
    val bucket = pmod(RollingHashExpr.rollingHash(col("__tok")), lit(buckets.toLong))
    docs
      .withColumn("__norm", norm)
      .filter(length(col("__norm")) > 0)
      .select(col(idCol), explode(split(col("__norm"), " ")).as("__tok"))
      .withColumn("__w", weightInt(bucket))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_tokens"), sum(col("__w")).as("__s"))
      .select(col(idCol), col("n_tokens"),
        round(col("__s") / (col("n_tokens") * den.toDouble), 6).as("score"),
        round(lit(1.0) / (lit(1.0) +
          exp(col("__s") / (col("n_tokens") * den.toDouble) * -calib)), 6).as("prob"),
        (col("__s") >= 0L).as("keep"))
  }

  /** The deterministic stand-in weight vector used by the oracle-gated
    * query (a Knuth multiplicative hash of the bucket index, centered):
    * exercises every code path of a trained vector while staying a pure
    * integer function both engines replay bit-for-bit.
    */
  def syntheticWeightInt(den: Long)(bucket: Column): Column =
    pmod(bucket * 2654435761L, lit(den)) - (den / 2)
}
