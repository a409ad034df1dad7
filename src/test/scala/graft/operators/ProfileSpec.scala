package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1), Some("aa")), (Some(2), Some("bbb")), (Some(2), None), (None, Some("aa")))
    .toDF("num", "str")

  test("profile: one row per column with null/distinct/length stats") {
    val got = Profile.profile(df).as[(String, Long, Long, Long, Option[Int], Option[Double], Option[Int])]
      .collect().map(r => r._1 -> r).toMap
    val (_, n, nulls, dist, minLen, _, maxLen) = got("num")
    assert(n == 4 && nulls == 1 && dist == 2)
    assert(minLen.contains(1) && maxLen.contains(1))
    val (_, n2, nulls2, dist2, minLen2, _, maxLen2) = got("str")
    assert(n2 == 4 && nulls2 == 1 && dist2 == 2)
    assert(minLen2.contains(2) && maxLen2.contains(3))
  }

  test("topK orders by count desc then value, limits to k") {
    val vals = Seq("a", "a", "a", "b", "b", "c").toDF("v")
    val got = Profile.topK(vals, "v", 2).as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 3), ("b", 2)))
  }

  test("iqrOutliers counts values outside 1.5*IQR fences") {
    val vals = (Seq.fill(20)(10.0) ++ Seq(1000.0, -1000.0)).toDF("v")
    val got = Profile.iqrOutliers(vals, "v")
      .as[(Long, Double, Double)].collect().head
    assert(got._1 == 2)
  }
}
