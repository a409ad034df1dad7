package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PruneLevenshteinFiltersSpec extends SparkSpec {
  import spark.implicits._

  // parquet-backed source: a LocalRelation would be folded away by
  // ConvertToLocalRelation before the plan can be inspected
  private def pairs = {
    val s = Tables.supplier(spark, "/root/testdata/sf0.001")
      .select(col("s_name").as("a"))
    val n = Tables.nation(spark, "/root/testdata/sf0.001")
      .select(col("n_name").as("b"))
    s.crossJoin(n)
  }

  test("rule injects the length guard before the levenshtein predicate") {
    val q = pairs.filter(levenshtein(col("a"), col("b")) <= 2)
    val optimized = q.queryExecution.optimizedPlan.toString
    val cond = optimized.linesIterator.find(_.contains("levenshtein"))
      .getOrElse(fail(s"no levenshtein filter in plan:\n$optimized"))
    assert(cond.contains("abs(") && cond.contains("length("), cond)
    // guard precedes the levenshtein in the conjunction (short-circuit order)
    assert(cond.indexOf("abs(") < cond.indexOf("levenshtein"), cond)
    // idempotent: exactly one guard despite the optimizer's fixed-point loop
    assert("abs\\(".r.findAllIn(cond).size == 1, cond)
  }

  test("rewrite preserves results exactly") {
    val df = Seq(
      ("GERMANY", "GERMAN"), ("FR", "UNITED KINGDOM"),
      ("ROMANIA", "ROMANIA"), ("PERU", "INDONESIA")).toDF("a", "b")
    val got = df.filter(levenshtein(col("a"), col("b")) <= 2)
      .as[(String, String)].collect().toSet
    assert(got == Set(("GERMANY", "GERMAN"), ("ROMANIA", "ROMANIA")))
    val strict = df.filter(levenshtein(col("a"), col("b")) < 1)
      .as[(String, String)].collect().toSet
    assert(strict == Set(("ROMANIA", "ROMANIA")))
  }

  test("guarded and unguarded plans agree on parquet-backed data") {
    val withRule = pairs.filter(levenshtein(col("a"), col("b")) <= 5).count()
    // semantically the guard is implied, so the count must match a manual
    // computation without any threshold predicate
    val manual = pairs.collect().count(r =>
      org.apache.commons.text.similarity.LevenshteinDistance.getDefaultInstance
        .apply(r.getString(0), r.getString(1)) <= 5)
    assert(withRule == manual)
  }

  test("rule injects the proportion guard before a thresholded fuzz_ratio") {
    val q = pairs.filter(IndelRatioExpr.fuzzRatio(col("a"), col("b")) >= 80)
    val cond = q.queryExecution.optimizedPlan.toString.linesIterator
      .find(_.contains("fuzz_ratio")).getOrElse(fail("no fuzz_ratio in plan"))
    // 400 * min(len) > (2t-1) * (len+len) with t=80 -> literals 400 and 159
    assert(cond.contains("400") && cond.contains("159"), cond)
    assert(cond.indexOf("400") < cond.indexOf("fuzz_ratio"), cond)
  }

  test("fuzz_ratio guard preserves results exactly, including astral planes") {
    val df = Seq(
      ("this is a test", "this is a test!"), // 97
      ("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear"), // 91
      ("GERMANY", "FRANCE"), // low
      ("\ud83d\ude00a", "\ud83d\ude00b")) // emoji pair: ratio 50 in code points
      .toDF("a", "b")
    val got = df.filter(IndelRatioExpr.fuzzRatio(col("a"), col("b")) >= 90)
      .as[(String, String)].collect().toSet
    assert(got == Set(("this is a test", "this is a test!"),
      ("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear")))
    // strict > comparison takes the t+1 path
    val gt = df.filter(IndelRatioExpr.fuzzRatio(col("a"), col("b")) > 91)
      .as[(String, String)].collect().toSet
    assert(gt == Set(("this is a test", "this is a test!")))
  }

  test("fuzz_ratio is SQL-reachable through GraftExtensions") {
    val one = spark.sql(
      "SELECT fuzz_ratio('this is a test', 'this is a test!') AS r")
      .collect().head.getInt(0)
    assert(one == 97)
  }
}
