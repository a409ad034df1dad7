package graft


import org.apache.spark.sql.functions._

/** Strict-cast semantics (SURVEY §1.4/F2): the reference's
  * `to_numeric(errors="raise")` must abort on malformed values, which Spark 4
  * gives us via ANSI mode (on by default); `try_cast` is the explicit opt-out
  * (pandas `errors="coerce"`).
  */
class AnsiCastSpec extends SparkSpec {
  import spark.implicits._

  test("malformed numeric cast aborts the job (errors='raise' parity)") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val df = Seq("12", "not-a-number").toDF("s")
    val e = intercept[Exception] {
      df.select(col("s").cast("int")).collect()
    }
    assert(e.getMessage.contains("CAST_INVALID_INPUT"), e.getMessage)
  }

  test("try_cast yields null instead (errors='coerce' parity)") {
    val df = Seq("12", "not-a-number").toDF("s")
    val got = df.select(col("s").try_cast("int").as("v"))
      .as[Option[Int]].collect().toSeq
    assert(got == Seq(Some(12), None))
  }
}
