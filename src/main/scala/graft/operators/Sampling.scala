package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for large-scale pipeline curation — per-source
  * quotas, fixed eval carve-outs, debug slices. A training-data pipeline
  * needs samples that are REPRODUCIBLE across runs, partitionings, and
  * engines; `rand()` gives none of that (per-task seeds reshuffle with the
  * partitioning, and a retry can resample). Hash-order sampling does:
  * rank rows inside each stratum by a hash of their key and keep the
  * first k — a uniform pseudo-random draw that is a pure function of the
  * data.
  *
  * Cost: one shuffle (the window partition-by), partial nothing — the
  * same shape as any per-group top-k. For per-ROW Bernoulli-style
  * sampling (keep p% of rows, no k quota), prefer a hash predicate
  * (`xxhash64(key) % 100 < p` — see q42's hash split), which is
  * shuffle-free; this operator is for exact-k strata.
  */
object Sampling {

  /** Exactly min(k, |stratum|) rows per stratum, drawn by hash order.
    *
    * `hash` defaults to `xxhash64(keyCols)` — 8-byte, codegen'd, the
    * scale choice. Pass e.g. `md5(concat(...))` when the draw must be
    * replayable by another engine (cross-engine hex strings agree;
    * xxhash64 is Spark-specific). The key should uniquely identify a row
    * within its stratum or ties are broken by `keyCols` order —
    * determinism holds either way.
    */
  def stratified(df: DataFrame, strataCols: Seq[String], k: Int,
                 keyCols: Seq[String],
                 hash: Option[Column] = None): DataFrame = {
    require(k > 0, s"sample size k must be positive, got $k")
    val h = hash.getOrElse(xxhash64(keyCols.map(col): _*))
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(h +: keyCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
