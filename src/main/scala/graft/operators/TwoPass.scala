package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** THE generalized distributed prefix-aggregate skeleton — one
  * implementation of the two-pass trick that [[SurrogateKey.scalable]]
  * (global ids) and [[Packing.streamPositions]] (global running sums)
  * introduced, parameterized by stratum columns, aggregate, merge, and
  * frame so the per-stratum cumsum ([[Sampling]]) and the global prefix
  * max ([[PrefixAgg]]) are thin wrappers instead of third and fourth
  * copies of the machinery (round-15 review consolidation):
  *
  *   1. range-sort by (strata, order); `monotonically_increasing_id()`
  *      pins (partition id, local row number) as column arithmetic;
  *   2. per-(partition, strata) aggregates fold into per-strata
  *      EXCLUSIVE prefix offsets via a window over ≤ #partitions rows
  *      per stratum; null offsets (a stratum's first partition) drop,
  *      and because the strata lead the range-sort key only the stratum
  *      at a partition's HEAD can continue from an earlier partition —
  *      ≤ N−1 surviving rows, broadcastable by construction at ANY
  *      strata count (with no strata: one row per partition, same
  *      bound);
  *   3. the within-partition prefix rides a window PARTITIONED BY
  *      (partition id, strata) — parallel across partitions, a
  *      mega-stratum's sort split across all the range partitions it
  *      spans;
  *   4. `combine(offset, local)` merges the seam — `coalesce(o,0)+l`
  *      for sums, `greatest(o,l)` for maxes (null-skipping = the
  *      aggregate's identity handling).
  *
  * `agg` must be associative and order-insensitive over the order
  * prefix decomposition (sum, max, min); weights/values must satisfy
  * the caller's documented contract (e.g. non-null, non-negative for
  * budget sums). Determinism requires (strata, order) to be total.
  *
  * CACHE LIFETIME: the internal persist pins the partition-dependent
  * `__mid` values across the two consumers (per-partition aggregate +
  * join) — the same correctness argument as [[SurrogateKey.scalable]]:
  * without a shared materialization the two subtrees could re-sample
  * range boundaries and disagree. [[prefixAndHandle]] returns the pinned
  * relation explicitly (the [[SurrogateKey.scalableAndHandle]] /
  * [[Packing.positionsAndHandle]] discipline: a per-call private handle,
  * never a shared slot, so concurrent callers cannot unpersist each
  * other's relation mid-use); callers either bracket it (the `withX`
  * forms in [[Sampling]]) or fall back to
  * `spark.catalog.clearCache()` after the final action.
  */
private[operators] object TwoPass {

  /** Per-call tag defeating the CacheManager's plan dedup: two
    * concurrent brackets over STRUCTURALLY IDENTICAL inputs would
    * otherwise share one InMemoryRelation (persist on an
    * already-cached canonical plan is a no-op), and the first
    * bracket's unpersist would unpin the other mid-use — re-opening
    * the exact boundary-re-sampling hazard the persist exists to
    * prevent. A distinct literal column makes each call's canonicalized
    * plan unique, so every bracket owns a private cache entry; the
    * column is constant (no semantic effect) and dropped from the
    * output. Shared by every two-pass core ([[TwoPass]],
    * [[SurrogateKey.scalable]], [[Packing.streamPositions]]).
    */
  private val callTag = new java.util.concurrent.atomic.AtomicLong(0L)

  private[operators] def tagged(df: DataFrame): DataFrame =
    df.withColumn("__call_tag", lit(callTag.incrementAndGet()))

  /** [[prefix]] returning BOTH the aggregated frame and the pinned
    * internal relation for the caller to release after the frame's final
    * action. NOTE: once the handle is unpersisted, re-evaluating the
    * returned frame is UNSAFE (the two internal consumers could re-sample
    * range boundaries and disagree) — brackets must execute their actions
    * before releasing.
    */
  def prefixAndHandle(df: DataFrame, strataCols: Seq[String],
                      orderCols: Seq[Column], value: Column,
                      agg: Column => Column,
                      combine: (Column, Column) => Column, inclusive: Boolean,
                      outCol: String): (DataFrame, DataFrame) = {
    val sorted = tagged(df
      .orderBy(strataCols.map(col) ++ orderCols: _*)
      .withColumn("__v", value)
      .withColumn("__mid", monotonically_increasing_id()))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pid = shiftright(col("__mid"), 33)
    val parts = sorted
      .groupBy(pid.as("__pid") +: strataCols.map(c => col(c).as(s"__s_$c")): _*)
      .agg(agg(col("__v")).as("__pagg"))
    val wOff = Window.partitionBy(strataCols.map(c => col(s"__s_$c")): _*)
      .orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts
      .select(col("__pid") +: strataCols.map(c => col(s"__s_$c")) :+
        agg(col("__pagg")).over(wOff).as("__off"): _*)
      .filter(col("__off").isNotNull)
    val joinCond = strataCols.map(c => col(c) <=> col(s"__s_$c"))
      .foldLeft(pid === col("__pid"))(_ && _)
    val wLocal = Window.partitionBy(pid +: strataCols.map(col): _*)
      .orderBy(col("__mid"))
      .rowsBetween(Window.unboundedPreceding, if (inclusive) 0L else -1L)
    val out = sorted.join(broadcast(offsets), joinCond, "left")
      .withColumn(outCol, combine(col("__off"), agg(col("__v")).over(wLocal)))
      .drop(Seq("__v", "__mid", "__pid", "__off", "__call_tag") ++
        strataCols.map(c => s"__s_$c"): _*)
    (out, sorted)
  }

  def prefix(df: DataFrame, strataCols: Seq[String], orderCols: Seq[Column],
             value: Column, agg: Column => Column,
             combine: (Column, Column) => Column, inclusive: Boolean,
             outCol: String): DataFrame =
    prefixAndHandle(df, strataCols, orderCols, value, agg, combine,
      inclusive, outCol)._1
}
