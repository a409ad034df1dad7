package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EQUI-KEYLESS interval joins via range bucketing — the missing native
  * operator for "point in interval" / "interval overlap" predicates with
  * no shared key: Spark plans those as BroadcastNestedLoopJoin (every
  * point against every interval — quadratic, the 100 TB death sentence).
  *
  * The standard fix (range-bucketed join, the same trick warehouse
  * engines' range-join optimizations apply): pick a bucket width W on the
  * range domain; an interval [lo, hi] registers in every bucket it
  * overlaps (row-local explode, fan-out ceil(span/W)+1), a point registers
  * in exactly its own bucket; the bucket equality becomes a plain
  * hash/shuffle join key and the exact predicate refines inside the join.
  * Results are EXACTLY the nested-loop results: bucketing is complete (an
  * overlapping pair always shares a bucket) and refinement removes the
  * false bucket pairs.
  *
  * Bucket ids are EXACT LONG ARITHMETIC: a value's bucket is identified by
  * the bucket's lower bound `x - pmod(x, W)` (a multiple of W computed
  * without any division), and an interval's covered buckets are
  * `sequence(lowerBound(lo), lowerBound(hi-1), step W)`. No double
  * `floor(x / W)` anywhere — IEEE division is inexact above 2^53 and
  * could land a point and its interval in different buckets, silently
  * dropping matches; subtraction/pmod on longs cannot.
  *
  * Choosing W: fan-out per interval is span/W (storage-side amplification)
  * while per-bucket population drives join skew — set W near the median
  * interval span so fan-out is O(1); a pathological mega-interval fans out
  * wide but only once (it IS in that many buckets). Both sides prune and
  * partial-aggregate as usual because everything stays declarative.
  */
object IntervalJoin {

  /** Lower bound of `v`'s bucket on a width-`w` grid anchored at 0 —
    * exact for the whole long domain (`pmod` keeps the remainder in
    * [0, w), so the result is the largest multiple of w that is ≤ v).
    */
  private def bucketLowerBound(v: Column, w: Column): Column =
    (v - pmod(v, w)).cast("long")

  /** AUTO bucket width: the median interval span, by the scaladoc's own
    * W rule — per-interval fan-out `span/W` lands at O(1) for the
    * typical interval, while per-bucket population is refined exactly
    * either way. One tiny aggregate + a scalar collect (the explicit
    * driver contract class of a watermark read); approximate percentile
    * is fine because W affects COST only, never results — bucketing is
    * complete at any width. Empty/degenerate inputs fall back to 1.
    * A caller-supplied W remains the right tool when the span
    * distribution is known (q65 keeps its domain-derived day width);
    * this closes the operator's one footgun — a guessed W orders of
    * magnitude off the span scale (round-12 brief #5).
    */
  def autoBucket(intervals: DataFrame, lo: Column, hi: Column): Long = {
    val m = intervals
      .select((hi.cast("long") - lo.cast("long")).as("__s"))
      .filter(col("__s") > 0)
      .agg(expr("approx_percentile(__s, 0.5)")).head()
    if (m.isNullAt(0)) 1L else math.max(1L, m.getLong(0))
  }

  /** [[pointInInterval]] at the [[autoBucket]]-derived width. */
  def pointInInterval(points: DataFrame, point: Column,
                      intervals: DataFrame, lo: Column,
                      hi: Column): DataFrame =
    pointInInterval(points, point, intervals, lo, hi,
      autoBucket(intervals, lo, hi))

  /** [[intervalOverlap]] at the larger of the two sides'
    * [[autoBucket]] widths — W ≥ both medians keeps fan-out O(1) on
    * both sides (a W sized to the narrow side would explode the wide
    * side's registration).
    */
  def intervalOverlap(left: DataFrame, lLo: Column, lHi: Column,
                      right: DataFrame, rLo: Column,
                      rHi: Column): DataFrame =
    intervalOverlap(left, lLo, lHi, right, rLo, rHi,
      math.max(autoBucket(left, lLo, lHi), autoBucket(right, rLo, rHi)))

  /** Join `points` to every interval of `intervals` with
    * `lo <= point < hi` (half-open), no equi key required. `point`, `lo`,
    * `hi` must be long-typed expressions on one shared numeric domain
    * (epoch seconds, days, ids); `bucket` is the width W.
    */
  def pointInInterval(points: DataFrame, point: Column,
                      intervals: DataFrame, lo: Column, hi: Column,
                      bucket: Long): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    val b = lit(bucket)
    // half-open [lo, hi): the last covered bucket is (hi-1)'s
    val reg = intervals
      .withColumn("__lo", lo.cast("long"))
      .withColumn("__hi", hi.cast("long"))
      .filter(col("__hi") > col("__lo"))
      .withColumn("__bk",
        explode(sequence(bucketLowerBound(col("__lo"), b),
          bucketLowerBound(col("__hi") - 1, b), b)))
    val pts = points
      .withColumn("__p", point.cast("long"))
      .withColumn("__bk", bucketLowerBound(col("__p"), b))
    pts.join(reg, "__bk")
      .filter(col("__p") >= col("__lo") && col("__p") < col("__hi"))
      .drop("__bk", "__lo", "__hi", "__p")
  }

  /** Join every interval of `left` to every interval of `right` they
    * OVERLAP with — nonempty half-open intersection,
    * `max(lLo, rLo) < min(lHi, rHi)`, so an empty interval `[x, x)`
    * matches nothing — sessions × outages, spans × windows — with no
    * equi key. Both sides register in
    * every bucket they cover; the exact overlap predicate refines inside
    * the bucket-equi join; and each matching pair is emitted EXACTLY ONCE
    * without any distinct shuffle, because a pair only fires in the bucket
    * containing the overlap's start `max(lLo, rLo)` (that point lies in
    * both intervals, so both sides registered in its bucket; every other
    * shared bucket is filtered out). Output = left columns ++ right
    * columns, exactly the half-open nested-loop result.
    */
  def intervalOverlap(left: DataFrame, lLo: Column, lHi: Column,
                      right: DataFrame, rLo: Column, rHi: Column,
                      bucket: Long): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    val b = lit(bucket)
    def registered(df: DataFrame, lo: Column, hi: Column,
                   loN: String, hiN: String): DataFrame = df
      .withColumn(loN, lo.cast("long"))
      .withColumn(hiN, hi.cast("long"))
      .filter(col(hiN) > col(loN))
      .withColumn("__bk",
        explode(sequence(bucketLowerBound(col(loN), b),
          bucketLowerBound(col(hiN) - 1, b), b)))
    val l = registered(left, lLo, lHi, "__llo", "__lhi")
    val r = registered(right, rLo, rHi, "__rlo", "__rhi")
    l.join(r, "__bk")
      .filter(col("__llo") < col("__rhi") && col("__rlo") < col("__lhi") &&
        col("__bk") ===
          bucketLowerBound(greatest(col("__llo"), col("__rlo")), b))
      .drop("__bk", "__llo", "__lhi", "__rlo", "__rhi")
  }
}
