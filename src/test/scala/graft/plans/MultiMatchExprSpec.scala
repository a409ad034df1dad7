package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Aho–Corasick multi-pattern matching must decide EXACTLY the substring
  * containment relation SQL `contains` decides, for every pattern at
  * once — including the structurally hard cases: output reachable only
  * through failure links, overlapping dictionary entries, and patterns
  * that are prefixes/suffixes/infixes of each other.
  */
class MultiMatchExprSpec extends SparkSpec {
  import spark.implicits._

  private def ids(text: String, pats: Seq[String]): Seq[Int] =
    new AhoCorasick(pats).matchedIds(text).toSeq

  test("failure-link classics: overlapping patterns report through fail chains") {
    // 'aba' contains 'ab', 'ba', 'aba', 'a' — and NOT 'bb'
    assert(ids("aba", Seq("ab", "ba", "aba", "a", "bb")) == Seq(0, 1, 2, 3))
    // the canonical AC teaching set: patterns 'ab', 'babc', 'c' on 'ababc'.
    // Matching proceeds past 'abab' (deepest state on the 'babc' spine);
    // the final 'c' must report 'babc' AND 'c' (via its failure output)
    assert(ids("ababc", Seq("ab", "babc", "c")) == Seq(0, 1, 2))
    // output ONLY via a failure link: 'park' ends mid-walk through 'spark'
    assert(ids("spark", Seq("spark", "park", "ark", "s")) == Seq(0, 1, 2, 3))
    // a pattern that is a proper prefix of another must fire even when the
    // longer one never completes
    assert(ids("tablet", Seq("table part", "table")) == Seq(1))
    // no match at all → empty
    assert(ids("xyz", Seq("ab", "ba")).isEmpty)
  }

  test("equals k contains() predicates on random small-alphabet strings") {
    val pats = Seq("ab", "ba", "aba", "bab", "aa", "abba", "b", "baab")
    val strGen = Gen.chooseNum(0, 25)
      .flatMap(k => Gen.stringOfN(k, Gen.oneOf('a', 'b')))
    val texts = Gen.listOfN(400, strGen).sample.get
    texts.foreach { t =>
      val got = ids(t, pats)
      val ref = pats.zipWithIndex.collect {
        case (p, i) if t.contains(p) => i
      }
      assert(got == ref, s"text='$t'")
    }
  }

  test("expression: null → null, no-hit → empty, unicode, early exit") {
    val pats = Seq("中文", "naïve", "ab")
    val rows = Seq("has 中文 text", "naïve ab both", "neither", null)
      .toDF("s")
      .select(MultiMatchExpr.matchedIds(col("s"), pats).as("m"))
      .collect()
    assert(rows(0).getSeq[Int](0) == Seq(0))
    assert(rows(1).getSeq[Int](0) == Seq(1, 2))
    assert(rows(2).getSeq[Int](0) == Seq.empty)
    assert(rows(3).isNullAt(0))
    // degenerate automata are rejected at build, not mis-matched
    intercept[IllegalArgumentException](new AhoCorasick(Seq.empty))
    intercept[IllegalArgumentException](new AhoCorasick(Seq("a", "")))
    intercept[IllegalArgumentException](new AhoCorasick(Seq("a", "a")))
  }

  test("SQL-registered as multi_match with a literal pattern array") {
    val got = spark.sql(
      "SELECT multi_match('the spark scan', array('spark', 'park', 'zz')) AS m")
      .as[Seq[Int]].head()
    assert(got == Seq(0, 1))
    // non-foldable pattern arrays are a typed error
    val err = intercept[Exception] {
      spark.sql("SELECT multi_match(s, array(s)) FROM VALUES ('x') t(s)")
        .collect()
    }
    assert(err.getMessage.contains("literal"))
  }
}
