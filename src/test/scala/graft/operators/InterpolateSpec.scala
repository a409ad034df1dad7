package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential spec against pandas `Series.interpolate()` semantics
  * (reference dw-etl `ops/transform.py:279-286`): interior nulls fill
  * linearly BY ROW POSITION, trailing nulls forward-fill, leading nulls stay
  * null unless the zero-anchor quirk applies.
  */
class InterpolateSpec extends SparkSpec {
  import spark.implicits._

  private def run(vals: Seq[Option[Double]]): Seq[Option[Double]] = {
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i, v) }.toDF("g", "i", "v")
    Interpolate.linear(df, Seq("g"), Seq("i"), Seq("v"))
      .orderBy("i").select("v").as[Option[Double]].collect().toSeq
  }

  test("interior null run fills linearly by position") {
    assert(run(Seq(Some(1.0), None, None, Some(4.0))) ==
      Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0)))
  }

  test("trailing nulls forward-fill the last valid value") {
    assert(run(Seq(Some(2.0), Some(6.0), None, None)) ==
      Seq(Some(2.0), Some(6.0), Some(6.0), Some(6.0)))
  }

  test("leading nulls stay null (forward-only)") {
    assert(run(Seq(None, None, Some(3.0), Some(5.0))) ==
      Seq(None, None, Some(3.0), Some(5.0)))
  }

  test("all-null group stays null") {
    assert(run(Seq(None, None)) == Seq(None, None))
  }

  test("zeroAnchorFirstRow anchors only the first row's null to 0") {
    val df = Seq(("a", 0, None: Option[Double]), ("a", 1, None: Option[Double]),
      ("a", 2, Some(3.0))).toDF("g", "i", "v")
    val anchored = Interpolate.zeroAnchorFirstRow(df, Seq("g"), Seq("i"), Seq("v"))
    val got = Interpolate.linear(anchored, Seq("g"), Seq("i"), Seq("v"))
      .orderBy("i").select("v").as[Option[Double]].collect().toSeq
    // anchored 0 at pos 1, then linear to 3.0 at pos 3 -> 1.5 midpoint
    assert(got == Seq(Some(0.0), Some(1.5), Some(3.0)))
  }

  test("groups are independent") {
    val df = Seq(("a", 0, Some(1.0)), ("a", 1, None), ("b", 0, None), ("b", 1, Some(9.0)))
      .toDF("g", "i", "v")
    val got = Interpolate.linear(df, Seq("g"), Seq("i"), Seq("v"))
      .orderBy("g", "i").select("v").as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(1.0), Some(1.0), None, Some(9.0)))
  }
}
