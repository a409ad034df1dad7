package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen'd rolling hash must reproduce the SQL
  * aggregate-over-sequence composition exactly — including multi-byte code
  * points, where `ascii(substr(s, i, 1))` yields the code point of the
  * i-th character.
  */
class RollingHashExprSpec extends SparkSpec {
  import spark.implicits._

  private val sqlTwin =
    "CASE WHEN length(s) = 0 THEN 0L ELSE aggregate(sequence(1, length(s)), 0L, " +
      "(acc, i) -> (acc * 31 + ascii(substr(s, i, 1))) % 1000000007) END"

  test("matches the SQL fold on ascii, unicode, empty and null input") {
    val df = Seq(
      "hello world", "", "a", "zażółć gęślą jaźń", "中文文本 with latin",
      "一鿿 boundary", null)
      .toDF("s")
    val both = df.select(
      RollingHashExpr.rollingHash(col("s")).as("fast"),
      expr(sqlTwin).as("ref"))
    val rows = both.collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1), r.toString)
    }
    // null in, null out; empty in, zero out
    assert(rows.last.isNullAt(0))
  }

  test("registered as a SQL function via GraftExtensions") {
    import spark.implicits._
    val got = spark.sql("SELECT rolling_hash('hello world') AS h").as[Long].head()
    val ref = Seq("hello world").toDF("s")
      .select(RollingHashExpr.rollingHash(col("s"))).as[Long].head()
    assert(got == ref)
  }

  test("hash discriminates and is order-sensitive") {
    val h = (s: String) => Seq(s).toDF("s")
      .select(RollingHashExpr.rollingHash(col("s"))).as[Long].head()
    assert(h("ab") != h("ba"))
    assert(h("abc") != h("abd"))
    assert(h("") == 0L)
  }
}
