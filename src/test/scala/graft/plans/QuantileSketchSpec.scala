package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quantile-sketch laws: exact below 2^(s+1), bounded relative error
  * above, merge-of-sketches ≡ sketch-of-union bit-for-bit, bytes
  * invariant under partitioning, integer-exact rank rule, and the
  * explicit contracts (non-negative input, maxBins cap).
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val S = 7

  /** Reference: rank-exact percentile (the target-rank-th smallest). */
  private def refQuantile(xs: Seq[Long], p: Int): Long = {
    val sorted = xs.sorted
    sorted((QuantileSketch.targetRank(p, xs.size.toLong) - 1).toInt)
  }

  private def sketchOf(xs: Seq[Long], s: Int = S): Array[Byte] =
    xs.toDF("x").agg(QuantileSketch.sketch(col("x"), s)).head.getAs[Array[Byte]](0)

  test("bin function: identity below 2^s, continuous, monotone, invertible width") {
    val probes = (0L until 300L) ++ Seq(127L, 128L, 129L, 255L, 256L, 257L,
      1023L, 1024L, 65535L, 65536L, 1L << 40, (1L << 40) + 12345L, Long.MaxValue)
    var prevBin = -1L
    probes.sorted.foreach { x =>
      val b = QuantileSketch.binOf(x, S)
      if (x < (1L << S)) assert(b == x, s"exact regime broken at $x")
      assert(b >= prevBin, s"non-monotone at $x")
      val lo = QuantileSketch.lowerBound(b, S)
      assert(lo <= x, s"lowerBound($b) = $lo above $x")
      // width of the bin is at most lo >> s above the exact regime
      if (x >= (1L << (S + 1)))
        assert(x - lo <= (lo >> S), s"width violation at $x: lo=$lo")
      else assert(lo == x, s"exact regime answer drift at $x")
      prevBin = b
    }
  }

  test("exact regime: quantiles equal the rank-exact reference") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(500)(rnd.nextLong(1L << (S + 1)))
    val sk = sketchOf(xs)
    for (p <- Seq(1, 10, 25, 50, 75, 90, 95, 99, 100)) {
      val got = Seq(sk).toDF("sk")
        .select(QuantileSketch.quantileAt(col("sk"), p)).as[Long].head()
      assert(got == refQuantile(xs, p), s"p$p")
    }
  }

  test("estimation regime: answers bracket the true quantile within 2^-s") {
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(2000)(math.abs(rnd.nextLong()) % (1L << 40))
    val sk = sketchOf(xs)
    for (p <- Seq(5, 50, 95, 99)) {
      val got = Seq(sk).toDF("sk")
        .select(QuantileSketch.quantileAt(col("sk"), p)).as[Long].head()
      val truth = refQuantile(xs, p)
      assert(got <= truth, s"p$p: answer $got above truth $truth")
      assert(truth - got <= math.max(got >> S, 1L),
        s"p$p: answer $got too far below truth $truth")
    }
  }

  test("merge-of-sketches equals sketch-of-union bit-for-bit") {
    val rnd = new scala.util.Random(13)
    (1 to 3).foreach { trial =>
      val a = Seq.fill(400)(rnd.nextLong(1L << 30))
      val b = Seq.fill(300)(rnd.nextLong(1L << 12))
      val whole = sketchOf(a ++ b)
      val merged = Seq(sketchOf(a), sketchOf(b)).toDF("sk")
        .agg(QuantileSketch.mergeAgg(col("sk"))).head.getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(whole, merged), s"trial $trial")
    }
  }

  test("sketch bytes are invariant under partitioning") {
    val xs = (1L to 5000L).map(i => i * 31 % 70000L)
    val df = xs.toDF("x")
    val one = df.coalesce(1).agg(QuantileSketch.sketch(col("x"), S))
      .head.getAs[Array[Byte]](0)
    val many = df.repartition(17).agg(QuantileSketch.sketch(col("x"), S))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(one, many))
  }

  test("nulls are skipped; empty group quantile is null; count is exact") {
    val sk = Seq[java.lang.Long](1L, 2L, null, 3L).toDF("x")
      .agg(QuantileSketch.sketch(col("x"), S)).head.getAs[Array[Byte]](0)
    val n = Seq(sk).toDF("sk")
      .select(QuantileSketch.sketchCount(col("sk"))).as[Long].head()
    assert(n == 3L)
    val empty = Seq.empty[Long].toDF("x")
      .agg(QuantileSketch.sketch(col("x"), S)).head.getAs[Array[Byte]](0)
    val q = Seq(empty).toDF("sk")
      .select(QuantileSketch.quantileAt(col("sk"), 50)).collect().head
    assert(q.isNullAt(0))
  }

  test("contracts: negative input and maxBins overflow throw") {
    val neg = intercept[Exception] {
      Seq(-1L).toDF("x").agg(QuantileSketch.sketch(col("x"), S)).head
    }
    assert(neg.getMessage != null)
    val cap = intercept[Exception] {
      (0L until 100L).toDF("x")
        .agg(QuantileSketch.sketch(col("x"), S, maxBins = 10)).head
    }
    assert(cap.getMessage.contains("maxBins") ||
      cap.getCause != null && cap.getCause.getMessage.contains("maxBins"))
  }

  test("integer-exact rank rule: (p*n+99) div 100 never drifts off ceil") {
    for (n <- Seq(1L, 19L, 20L, 21L, 100L, 9999L); p <- 1 to 100) {
      val want = math.ceil(p.toDouble * n / 100.0).toLong
      // the double ceil is correct at these magnitudes; the law being
      // pinned is that the INTEGER form agrees (and it alone is used at
      // scale, where 0.95*n in IEEE can land on the wrong side)
      assert(QuantileSketch.targetRank(p, n) == want, s"p=$p n=$n")
    }
  }
}
