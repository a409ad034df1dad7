package graft.operators

import graft.SparkSpec

/** pandas `qcut(3, duplicates="drop")` parity (reference dw-etl
  * `ops/transform.py:322-353`): tied values land in ONE bucket, duplicate
  * quantile edges collapse and relabel.
  */
class QuantileBucketSpec extends SparkSpec {
  import spark.implicits._

  private def buckets(vals: Seq[Option[Double]]): Map[Option[Double], Option[String]] = {
    val df = vals.map(("g", _)).toDF("g", "v")
    QuantileBucket.qcut3(df, Seq("g"), "v", "b")
      .select("v", "b").as[(Option[Double], Option[String])].collect().toMap
  }

  test("distinct values split into Low/Medium/High at tertiles") {
    val got = buckets(Seq(1, 2, 3, 4, 5, 6).map(d => Some(d.toDouble)))
    assert(got(Some(1.0)).contains("Low"))
    assert(got(Some(3.0)).contains("Medium"))
    assert(got(Some(6.0)).contains("High"))
  }

  test("massive ties collapse edges -> fewer buckets, ties stay together") {
    // 7x the value 5 plus one 9: tertiles of the 8 values are 5,5 -> edges
    // dedup to [5, 9], which is ONE interval (pandas qcut duplicates="drop"
    // yields a single (4.999, 9] bin here) -> everything labelled Low
    val got = buckets(Seq(5, 5, 5, 5, 5, 5, 5, 9).map(d => Some(d.toDouble)))
    assert(got(Some(5.0)).contains("Low"))
    assert(got(Some(9.0)).contains("Low"))
    // a clean tertile split still yields High for the top value
    val clean = buckets(Seq(1, 1, 1, 5, 5, 5, 9, 9, 9).map(d => Some(d.toDouble)))
    assert(clean(Some(1.0)).contains("Low"))
    assert(clean(Some(5.0)).contains("Medium"))
    assert(clean(Some(9.0)).contains("High"))
  }

  test("constant group -> single Low bucket") {
    val got = buckets(Seq.fill(5)(Some(7.0)))
    assert(got(Some(7.0)).contains("Low"))
  }

  test("nulls map to null") {
    val got = buckets(Seq(Some(1.0), Some(2.0), Some(3.0), None))
    assert(got(None).isEmpty)
  }
}
