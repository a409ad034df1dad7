package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinSpec extends SparkSpec {
  import spark.implicits._

  test("cut: right-open intervals, out-of-range and null -> null") {
    val df = Seq[Option[Double]](Some(0.0), Some(17.9), Some(18.0), Some(99.9),
      Some(100.0), Some(-1.0), None).toDF("v")
    val got = df.select(Bin.cut(col("v"), Seq(0, 18, 100), Seq("minor", "adult")).as("b"))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some("minor"), Some("minor"), Some("adult"), Some("adult"),
      None, None, None))
  }

  test("cutRightClosed: (lo, hi] with lowest edge included") {
    val df = Seq(0.0, 18.0, 18.1, 100.0).toDF("v")
    val got = df.select(Bin.cutRightClosed(col("v"), Seq(0, 18, 100), Seq("a", "b")).as("b"))
      .as[String].collect().toSeq
    assert(got == Seq("a", "a", "b", "b"))
  }

  test("dictMap: unmapped keys -> null (pandas .map semantics)") {
    val df = Seq(1, 2, 9).toDF("s")
    val got = df.select(Bin.dictMap(col("s"), Map(1 -> "Winter", 2 -> "Spring")).as("m"))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some("Winter"), Some("Spring"), None))
  }
}
