package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.plans.BloomMightContainExpr

/** Bloom-prefiltered EXACT joins — the 100 TB shape for semi/anti joins
  * (decontamination, dedup-apply, id-list filtering) whose probe side is
  * too big to move and whose build side is too big to broadcast as a hash
  * relation but fits as a Bloom filter.
  *
  * Why this exists: a plain semi join against a 100M-key build side
  * becomes a sort-merge join — BOTH sides shuffle, and shuffling the
  * 100 TB side is the whole cost. A Bloom filter over the build keys is
  * ~30× smaller than the hash relation (100M keys at 1% fpp ≈ 120 MB —
  * shippable where the relation is not), and pruning with it happens
  * MAP-SIDE on the scan, before any exchange: only the ~matching sliver
  * of the big side ever shuffles into the exact join. The exact join then
  * removes the fpp-rate false positives, so results are IDENTICAL to the
  * plain join — these operators are drop-in, not approximate. (Spark's
  * AQE runtime filtering injects the same structure for equi-joins it can
  * see through; this makes the pattern explicit, composable with derived
  * keys like shingle hashes, and available to semi/anti shapes AQE won't
  * rewrite.)
  *
  * Keys are normalized to `xxhash64` longs on both sides (works for any
  * orderable column list; 64-bit collisions only ever ADD a false
  * positive for the exact join to drop, never remove a true match — the
  * exact join runs on the REAL key columns).
  */
object BloomJoin {

  private def hashKeys(cols: Seq[Column]): Column = xxhash64(cols: _*)

  /** Build a Bloom filter over the DISTINCT build-side keys. Distributed
    * aggregation (one filter per partition, OR-merged on the driver via
    * `treeAggregate` inside `stat.bloomFilter`) — the build side is never
    * collected.
    */
  def bloomOf(build: DataFrame, keys: Seq[String],
              expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    build.select(hashKeys(keys.map(col)).as("__k"))
      .stat.bloomFilter("__k", expectedItems, fpp)

  private def prefilter(probe: DataFrame, keys: Seq[String],
                        bloom: BloomFilter): DataFrame =
    probe.filter(BloomMightContainExpr.mightContain(hashKeys(keys.map(col)), bloom))

  /** Exact left-semi join, bloom-pruned map-side first. `keys` must exist
    * on both frames (rename the build side to match before calling).
    */
  def semi(probe: DataFrame, build: DataFrame, keys: Seq[String],
           expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = bloomOf(build, keys, expectedItems, fpp)
    prefilter(probe, keys, bloom)
      .join(build.select(keys.map(col): _*).distinct(), keys, "left_semi")
  }

  /** Exact left-anti join. The bloom prunes the SURVIVORS' complement:
    * rows failing the bloom are definite non-members (no false negatives)
    * and pass through without ever reaching the join; only rows the bloom
    * flags — the sliver that MIGHT match — join against the build side to
    * settle membership exactly.
    */
  def anti(probe: DataFrame, build: DataFrame, keys: Seq[String],
           expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = bloomOf(build, keys, expectedItems, fpp)
    val flagged = probe.withColumn("__maybe",
      BloomMightContainExpr.mightContain(hashKeys(keys.map(col)), bloom))
    val definiteOut = flagged.filter(not(coalesce(col("__maybe"), lit(false))))
      .drop("__maybe")
    val settled = flagged.filter(coalesce(col("__maybe"), lit(false))).drop("__maybe")
      .join(build.select(keys.map(col): _*).distinct(), keys, "left_anti")
    definiteOut.unionByName(settled)
  }
}
