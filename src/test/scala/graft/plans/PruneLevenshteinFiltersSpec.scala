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
}
