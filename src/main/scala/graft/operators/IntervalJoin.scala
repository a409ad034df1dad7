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
  * overlaps (`sequence(floor(lo/W), floor(hi/W))` — row-local explode,
  * fan-out ceil(span/W)+1), a point registers in exactly `floor(p/W)`;
  * the bucket equality becomes a plain hash/shuffle join key and the
  * exact predicate refines inside the join. Results are EXACTLY the
  * nested-loop results: bucketing is complete (an overlapping pair always
  * shares the point's bucket) and refinement removes the false bucket
  * pairs.
  *
  * Choosing W: fan-out per interval is span/W (storage-side amplification)
  * while per-bucket population drives join skew — set W near the median
  * interval span so fan-out is O(1); a pathological mega-interval fans out
  * wide but only once (it IS in that many buckets). Both sides prune and
  * partial-aggregate as usual because everything stays declarative.
  */
object IntervalJoin {

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
    // half-open [lo, hi): the last bucket is floor((hi-1)/W)
    val reg = intervals
      .withColumn("__lo", lo.cast("long"))
      .withColumn("__hi", hi.cast("long"))
      .filter(col("__hi") > col("__lo"))
      .withColumn("__bk",
        explode(sequence(floor(col("__lo") / b).cast("long"),
          floor((col("__hi") - 1) / b).cast("long"))))
    val pts = points
      .withColumn("__p", point.cast("long"))
      .withColumn("__bk", floor(col("__p") / b).cast("long"))
    pts.join(reg, "__bk")
      .filter(col("__p") >= col("__lo") && col("__p") < col("__hi"))
      .drop("__bk", "__lo", "__hi", "__p")
  }
}
