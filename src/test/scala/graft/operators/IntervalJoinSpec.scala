package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Range-bucketed interval join: exact equivalence with the nested-loop
  * form under every bucket width (completeness + refinement), boundary
  * semantics, overlapping-interval multiplicity, and the plan claim that
  * the bucketed form joins hash-side, not nested-loop.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(0L, 1L, 5L, 10L, 86399L, 86400L, 100000L, 250000L)
    .toDF("p").select(col("p"), concat(lit("e"), col("p")).as("tag"))

  // overlapping, adjacent, empty, and mega intervals
  private def intervals = Seq(
    (1L, 0L, 10L), (2L, 5L, 86400L), (3L, 86400L, 86401L),
    (4L, 7L, 7L),               // empty: hi == lo, matches nothing
    (5L, 0L, 260000L))          // mega interval spanning all buckets
    .toDF("iid", "lo", "hi")

  private def naive = points.crossJoin(intervals)
    .filter(col("p") >= col("lo") && col("p") < col("hi"))
    .select("p", "iid").as[(Long, Long)].collect().sorted.toSeq

  test("bucketed join equals the nested loop for every bucket width") {
    Seq(1L, 7L, 86400L, 1000000L).foreach { w =>
      val got = IntervalJoin.pointInInterval(points, col("p"),
          intervals, col("lo"), col("hi"), bucket = w)
        .select("p", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == naive, s"bucket width $w: got $got want $naive")
    }
  }

  test("half-open boundaries: lo inclusive, hi exclusive") {
    val got = IntervalJoin.pointInInterval(points, col("p"),
        intervals.filter(col("iid") === 3L), col("lo"), col("hi"), 86400L)
      .select("p").as[Long].collect().toSeq
    assert(got == Seq(86400L), got.toString)
  }

  test("a point inside several intervals matches each once (multiplicity)") {
    val got = IntervalJoin.pointInInterval(points.filter(col("p") === 5L), col("p"),
        intervals, col("lo"), col("hi"), 10L)
      .select("iid").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 5L), got.toString)
  }

  test("property: random intervals/points/widths always equal the nested loop") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 3).foreach { trial =>
      val pts = Seq.fill(60)(rnd.nextLong(2000L) - 500L).distinct
        .toDF("p").select(col("p"), col("p").as("tag").cast("string"))
      val ivs = Seq.tabulate(25) { i =>
        val lo = rnd.nextLong(2000L) - 600L
        (i.toLong, lo, lo + rnd.nextLong(300L)) // includes empty (hi == lo)
      }.toDF("iid", "lo", "hi")
      val want = pts.crossJoin(ivs)
        .filter(col("p") >= col("lo") && col("p") < col("hi"))
        .select("p", "iid").as[(Long, Long)].collect().sorted.toSeq
      Seq(1L, 13L, 97L, 5000L).foreach { w =>
        val got = IntervalJoin.pointInInterval(pts, col("p"),
            ivs, col("lo"), col("hi"), bucket = w)
          .select("p", "iid").as[(Long, Long)].collect().sorted.toSeq
        assert(got == want, s"trial $trial width $w")
      }
    }
  }

  test("the bucketed plan joins on the bucket key, never nested-loop") {
    val p = IntervalJoin.pointInInterval(points, col("p"),
        intervals, col("lo"), col("hi"), 86400L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join") || p.contains("join"), p)
  }

  // ------------------------------------------------ interval × interval

  private def rights = Seq(
    (10L, 0L, 5L), (11L, 5L, 12L), (12L, 9L, 10L),
    (13L, 7L, 7L),              // empty: matches nothing
    (14L, -50L, 300000L),       // mega interval
    (15L, 86399L, 86401L))      // straddles a day-bucket boundary
    .toDF("rid", "rlo", "rhi")

  // nonempty-intersection semantics: an empty interval [x, x) overlaps
  // nothing (the raw aLo < bHi && bLo < aHi predicate would claim it does)
  private def naiveOverlap(l: org.apache.spark.sql.DataFrame,
                           r: org.apache.spark.sql.DataFrame) =
    l.crossJoin(r)
      .filter(greatest(col("lo"), col("rlo")) < least(col("hi"), col("rhi")))
      .select("iid", "rid").as[(Long, Long)].collect().sorted.toSeq

  test("overlap join equals the nested loop for every bucket width") {
    val want = naiveOverlap(intervals, rights)
    Seq(1L, 7L, 86400L, 1000000L).foreach { w =>
      val got = IntervalJoin.intervalOverlap(intervals, col("lo"), col("hi"),
          rights, col("rlo"), col("rhi"), bucket = w)
        .select("iid", "rid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"bucket width $w: got $got want $want")
    }
  }

  test("overlap is half-open: touching endpoints do not match") {
    // [0,10) vs [10,20): share the boundary point only -> no overlap
    val l = Seq((1L, 0L, 10L)).toDF("iid", "lo", "hi")
    val r = Seq((2L, 10L, 20L), (3L, 9L, 20L)).toDF("rid", "rlo", "rhi")
    val got = IntervalJoin.intervalOverlap(l, col("lo"), col("hi"),
        r, col("rlo"), col("rhi"), bucket = 5L)
      .select("rid").as[Long].collect().sorted.toSeq
    assert(got == Seq(3L), got.toString)
  }

  test("a pair sharing many buckets is emitted exactly once") {
    // both intervals cover ~30 width-1 buckets together; still one row
    val l = Seq((1L, 0L, 30L)).toDF("iid", "lo", "hi")
    val r = Seq((2L, 5L, 25L)).toDF("rid", "rlo", "rhi")
    Seq(1L, 3L, 100L).foreach { w =>
      val got = IntervalJoin.intervalOverlap(l, col("lo"), col("hi"),
          r, col("rlo"), col("rhi"), bucket = w)
        .count()
      assert(got == 1L, s"width $w emitted $got rows")
    }
  }

  test("property: random interval sets always equal the nested loop") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 3).foreach { trial =>
      def mk(n: Int, tag: String) = Seq.tabulate(n) { i =>
        val lo = rnd.nextLong(2000L) - 600L
        (i.toLong, lo, lo + rnd.nextLong(250L)) // includes empty (hi == lo)
      }.toDF(s"${tag}id", s"${tag}lo", s"${tag}hi")
      val l = mk(30, "i").withColumnsRenamed(
        Map("iid" -> "iid", "ilo" -> "lo", "ihi" -> "hi"))
      val r = mk(25, "r")
      val want = l.crossJoin(r)
        .filter(greatest(col("lo"), col("rlo")) < least(col("hi"), col("rhi")))
        .select("iid", "rid").as[(Long, Long)].collect().sorted.toSeq
      Seq(1L, 13L, 97L, 5000L).foreach { w =>
        val got = IntervalJoin.intervalOverlap(l, col("lo"), col("hi"),
            r, col("rlo"), col("rhi"), bucket = w)
          .select("iid", "rid").as[(Long, Long)].collect().sorted.toSeq
        assert(got == want, s"trial $trial width $w")
      }
    }
  }

  test("the overlap plan joins on the bucket key, never nested-loop") {
    val p = IntervalJoin.intervalOverlap(intervals, col("lo"), col("hi"),
        rights, col("rlo"), col("rhi"), 86400L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join") || p.contains("join"), p)
  }

  test("auto bucket: derived width law — auto ≡ explicit at autoBucket, " +
      "and the width is the median span") {
    val rights = Seq((10L, 3L, 90L), (11L, 50L, 120L), (12L, 0L, 7L))
      .toDF("rid", "rlo", "rhi")
    val wL = IntervalJoin.autoBucket(intervals, col("lo"), col("hi"))
    val wR = IntervalJoin.autoBucket(rights, col("rlo"), col("rhi"))
    // spans 10, 86395, 1, 260000 (empty dropped) -> even count, the
    // percentile takes the lower middle: 10; rights spans 87, 70, 7 -> 70
    assert(wL == 10L, s"left auto width $wL")
    assert(wR == 70L, s"right auto width $wR")
    val auto = IntervalJoin.intervalOverlap(intervals, col("lo"), col("hi"),
        rights, col("rlo"), col("rhi"))
      .select("iid", "rid").as[(Long, Long)].collect().sorted.toSeq
    val explicit = IntervalJoin.intervalOverlap(intervals, col("lo"),
        col("hi"), rights, col("rlo"), col("rhi"),
        bucket = math.max(wL, wR))
      .select("iid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(auto == explicit, "auto overload must equal explicit at the derived W")
    val autoPts = IntervalJoin.pointInInterval(points, col("p"),
        intervals, col("lo"), col("hi"))
      .select("p", "iid").as[(Long, Long)].collect().sorted.toSeq
    assert(autoPts == naive, "auto point-in-interval must equal the nested loop")
    // degenerate: all-empty intervals fall back to W = 1
    val empty = Seq((1L, 5L, 5L)).toDF("iid", "lo", "hi")
    assert(IntervalJoin.autoBucket(empty, col("lo"), col("hi")) == 1L)
  }
}
