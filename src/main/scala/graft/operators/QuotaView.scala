package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.AdditiveStats

/** Continuously-maintained PER-STRATUM QUOTA — the streaming form of the
  * per-domain cap ([[Sampling.cappedPerStratum]] / q70): documents arrive
  * in micro-batches, and each batch admits rows while the stratum's
  * ACCUMULATED kept count stays ≤ `cap`. The admitted relation lives on
  * the [[graft.sources.AdditiveStats]] protocol (idempotent `batch_id`
  * fragments, CAS-published compaction folds, stream identity pin), so
  * the continuous curation front door — quality gate (s09), line stats
  * (s10), and now the domain quota — shares one replay/crash story.
  *
  * EXACTNESS (what the one-shot oracle replays): admission is the greedy
  * prefix of the CONCATENATED draw order (batch index, then the
  * deterministic hash draw within the batch). A batch-b row with
  * within-batch rank r is admitted iff prior + r ≤ cap, where prior =
  * rows admitted in earlier batches = min(cap, N_earlier); in both cases
  * (prior = cap ⇒ nothing admits; prior = N_earlier ⇒ global rank =
  * N_earlier + r) this equals `row_number() OVER (PARTITION BY stratum
  * ORDER BY batch, draw) ≤ cap` over the union of all batches — so any
  * engine can replay the admitted set with ONE window over the one-shot
  * input (the s21 oracle).
  *
  * REPLAY DETERMINISM: the prior counts exclude the current `batchId`'s
  * own fragment, and under foreachBatch's at-least-once contract only
  * the LAST uncommitted batch replays — every other visible fragment
  * (smaller ids, or the folded `batch_id = -1` partition, whose
  * `compacted_through` is necessarily below a replaying batch) is from
  * strictly earlier batches, so a replay recomputes the identical
  * admitted set and its dynamic-partition overwrite is a no-op rewrite.
  *
  * Scale shape: per batch, ONE window shuffle over the BATCH (not the
  * store) + one aggregate scan of the store's per-stratum counts
  * (fragment rows are (id, stratum, 1) — compaction keeps them; a
  * mega-store's counts can also come from a pre-folded side relation).
  * Null strata quota together (the non-URL bucket), keyed by a sentinel
  * no real stratum value can collide with.
  */
object QuotaView {

  private val NullKey = "<null>"

  def store(dir: String): AdditiveStats.Store =
    AdditiveStats.Store(dir, Seq("doc_id", "domain"), "n",
      "doc_id bigint, domain string, n bigint, batch_id bigint")

  def init(spark: SparkSession, dir: String): Unit =
    AdditiveStats.init(spark, store(dir))

  def fragmentCount(spark: SparkSession, dir: String): Int =
    AdditiveStats.fragmentCount(spark, store(dir))

  /** Fold fragments (pure re-layout: admitted rows carry n = 1 and
    * unique ids, so the keyed sum preserves them row-for-row).
    */
  def compact(spark: SparkSession, dir: String): Unit =
    AdditiveStats.compact(spark, store(dir))

  /** Admit one batch under the accumulated per-stratum cap and land the
    * admitted rows as the `batch_id = batchId` fragment. Returns the
    * admitted rows (doc_id, domain).
    */
  def append(batch: DataFrame, idCol: String, domainCol: String,
             dir: String, batchId: Long, cap: Int,
             hash: Option[Column] = None): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val spark = batch.sparkSession
    // per-stratum counts from STRICTLY EARLIER batches (see scaladoc)
    val prior = AdditiveStats.read(spark, store(dir))
      .filter(col("batch_id") =!= lit(batchId))
      .groupBy(coalesce(col("domain"), lit(NullKey)).as("__dk"))
      .agg(sum("n").as("__prior"))
    val h = hash.getOrElse(xxhash64(col(idCol)))
    val w = Window.partitionBy(coalesce(col(domainCol), lit(NullKey)))
      .orderBy(h, col(idCol))
    val admitted = batch
      .select(col(idCol).cast("long").as("doc_id"),
        col(domainCol).cast("string").as("domain"))
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(prior),
        coalesce(col("domain"), lit(NullKey)) === col("__dk"), "left")
      .filter(coalesce(col("__prior"), lit(0L)) + col("__rn") <= cap)
      .select(col("doc_id"), col("domain"), lit(1L).as("n"))
    AdditiveStats.append(admitted, store(dir), batchId)
    admitted.select("doc_id", "domain")
  }

  /** The accumulated admitted relation (doc_id, domain). */
  def read(spark: SparkSession, dir: String): DataFrame =
    AdditiveStats.read(spark, store(dir)).select("doc_id", "domain")
}
