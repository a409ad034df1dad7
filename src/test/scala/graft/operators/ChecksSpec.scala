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

  test("keepAboveQuantile cuts per group, keeps ties together, never drops a singleton group") {
    val df = Seq(
      // group a: scores 1..8 — bottom quartile (cume_dist <= 0.25) = {1, 2}
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), (4L, "a", 4.0),
      (5L, "a", 5.0), (6L, "a", 6.0), (7L, "a", 7.0), (8L, "a", 8.0),
      // group b: four TIED low scores (cume_dist 1.0 for the tie of 4 over
      // its own 4-row group... include a higher row so ties sit at 0.8)
      (10L, "b", 1.0), (11L, "b", 1.0), (12L, "b", 1.0), (13L, "b", 1.0),
      (14L, "b", 9.0),
      // group c: a single row — a relative gate must not erase it
      (20L, "c", 0.001)
    ).toDF("id", "g", "score")
    val kept = Checks.keepAboveQuantile(df, Seq("g"), "score", 0.25)
      .select("id").as[Long].collect().toSet
    // a: ids 1,2 fall (cume_dist 0.125, 0.25 — not > 0.25)
    assert(!kept.contains(1L) && !kept.contains(2L) && kept.contains(3L))
    // b: the four tied rows share cume_dist 0.8 > 0.25 — all survive
    assert(Set(10L, 11L, 12L, 13L, 14L).subsetOf(kept))
    // c: singleton kept (cume_dist 1.0)
    assert(kept.contains(20L))
    // partitioning-invariant (rank arithmetic, no rand)
    val kept2 = Checks.keepAboveQuantile(df.repartition(7, col("id")),
      Seq("g"), "score", 0.25).select("id").as[Long].collect().toSet
    assert(kept == kept2)
  }
}
