package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed PREFIX AGGREGATE over a total order — the two-pass
  * replacement for `agg(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING ...)`,
  * whose single-window execution funnels the ENTIRE relation through one
  * task. Same discipline as [[SurrogateKey.scalable]] / [[Packing
  * .streamPositions]] (ids / running sums) and [[Sampling]]'s per-stratum
  * cumsum, specialized to the orderless-merge aggregates (max here; min is
  * the mirror image):
  *
  *   1. range-sort by the total order; `monotonically_increasing_id()`
  *      pins (partition id, local row number) as column arithmetic;
  *   2. per-partition aggregates (one row per partition) fold into
  *      exclusive prefix offsets via a window over ≤ #partitions rows,
  *      broadcast back;
  *   3. the within-partition prefix rides a window PARTITIONED BY the
  *      range-partition id — parallel across partitions;
  *   4. combine offset and local prefix with the aggregate's merge
  *      (`greatest` for max — null-skipping, exactly max's identity
  *      handling).
  *
  * Used by s05's watermark-lateness model: "max event-time seen strictly
  * before me in arrival order" is a data-sized prefix max that must never
  * serialize. CACHE LIFETIME: the internal persist pins the
  * partition-dependent `__mid` values across the two consumers (same
  * correctness argument as [[SurrogateKey.scalable]]); release with
  * `spark.catalog.clearCache()` after the final action.
  */
object PrefixAgg {

  /** Adds `outCol` = max of `value` over all rows STRICTLY EARLIER in
    * `order` (the `rowsBetween(unboundedPreceding, -1)` frame); null for
    * the globally first row, and wherever every earlier value is null.
    * `order` must be total (tie-break like any two-pass assignment).
    */
  def maxExclusive(df: DataFrame, order: Seq[Column], value: Column,
                   outCol: String): DataFrame = {
    val sorted = df.orderBy(order: _*)
      .withColumn("__v", value)
      .withColumn("__mid", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pid = shiftright(col("__mid"), 33)
    val parts = sorted.groupBy(pid.as("__pid")).agg(max(col("__v")).as("__pmax"))
    // exclusive running max over ≤ #partitions rows, broadcast back
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts.select(col("__pid"),
      max(col("__pmax")).over(wOff).as("__off"))
    val wLocal = Window.partitionBy(pid).orderBy(col("__mid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    sorted.join(broadcast(offsets), pid === col("__pid"), "left")
      // greatest() skips nulls (null only when BOTH sides are) — max's
      // identity element, so the partition seam needs no special case
      .withColumn(outCol, greatest(col("__off"), max(col("__v")).over(wLocal)))
      .drop("__v", "__mid", "__pid", "__off")
  }
}
