package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JaroExprSpec extends SparkSpec {
  import spark.implicits._

  private def j(a: String, b: String): Double =
    JaroExpr.jaro(org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("textbook values") {
    assert(math.abs(j("MARTHA", "MARHTA") - 0.944444) < 1e-6)
    assert(math.abs(j("DIXON", "DICKSONX") - 0.766667) < 1e-6)
    assert(math.abs(j("JELLYFISH", "SMELLYFISH") - 0.896296) < 1e-6)
    assert(j("same", "same") == 1.0)
    assert(j("", "") == 1.0)
    assert(j("abc", "") == 0.0)
    assert(j("abc", "xyz") == 0.0) // no matches
  }

  test("symmetry and bounds on random-ish pairs") {
    val pairs = Seq(("GERMANY", "GERMAN"), ("a", "ab"), ("spark", "sprak"),
      ("😀ab", "ab😀"))
    pairs.foreach { case (a, b) =>
      val ab = j(a, b); val ba = j(b, a)
      assert(ab == ba, s"asymmetric on ($a,$b)")
      assert(ab >= 0.0 && ab <= 1.0)
    }
  }

  test("interpreted eval and codegen agree") {
    val cb = JaroExpr.jaroSimilarity(col("a"), col("b"))
    val local = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"))
      .toDF("a", "b").select(cb).as[Double].collect().toSeq
    val codegen = spark.range(2).select(
        when(col("id") === 0, "MARTHA").otherwise("DIXON").as("a"),
        when(col("id") === 0, "MARHTA").otherwise("DICKSONX").as("b"))
      .select(cb).as[Double].collect().toSeq.sorted
    assert(local.sorted == codegen)
  }
}
