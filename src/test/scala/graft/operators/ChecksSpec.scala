package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit is a pure function of the key: stable across partitionings") {
    val keys = (1L to 5000L).toDF("k")
    val a = Checks.hashSplit(keys.repartition(3), col("k"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .as[(Long, String)].collect().toMap
    val b = Checks.hashSplit(keys.repartition(17), col("k"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .as[(Long, String)].collect().toMap
    assert(a == b)
    // proportions track the requested fractions (binomial tolerance)
    val n = a.size.toDouble
    assert(math.abs(a.values.count(_ == "train") / n - 0.8) < 0.03)
    assert(math.abs(a.values.count(_ == "val") / n - 0.1) < 0.03)
    assert(math.abs(a.values.count(_ == "test") / n - 0.1) < 0.03)
  }

  test("cutHex maps cumulative fractions to fixed-width hex thresholds") {
    assert(Checks.cutHex(0.8) == "cccd")
    assert(Checks.cutHex(0.9) == "e666")
    assert(Checks.cutHex(0.5) == "8000")
  }

  test("report counts violations in one pass; null predicate is a violation") {
    val df = Seq(
      (1, Some(5.0)), (2, Some(-1.0)), (3, None), (4, Some(0.5)))
      .toDF("id", "v")
    val got = Checks.report(df, Seq(
        Checks.Rule("v_positive", col("v") > 0),
        Checks.Rule("id_small", col("id") <= 4)))
      .as[(String, Long, Long, Boolean)].collect()
      .map { case (r, n, v, p) => r -> ((n, v, p)) }.toMap
    assert(got("v_positive") == ((4L, 2L, false))) // -1 and null
    assert(got("id_small") == ((4L, 0L, true)))
  }
}
