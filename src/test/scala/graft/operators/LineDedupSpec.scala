package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-level line dedup: boilerplate lines vanish, unique content and
  * line order survive, blank lines are structural, and no document row is
  * ever dropped.
  */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val footer = "All Rights Reserved."
  private val cookie = "This site uses cookies"

  private def docs = Seq(
    (1L, s"alpha content one\n$footer\nalpha content two"),
    (2L, s"$cookie\nbeta content\n\nbeta second paragraph\n$footer"),
    (3L, s"gamma content\n$cookie\nall rights reserved."), // case-variant footer
    (4L, s"$footer\n$cookie"),                             // pure boilerplate
    (5L, "delta content\nshared twice only"),
    (6L, "epsilon content\nshared twice only")             // 2 docs < minDocs
  ).toDF("doc_id", "text")

  test("lines in >= minDocs docs are removed; unique lines keep text and order") {
    val got = LineDedup.dedupLines(docs, "doc_id", "text")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // footer appears in docs 1,2,3 (case-insensitively), cookie in 2,3,4
    assert(got(1L) == "alpha content one\nalpha content two")
    assert(got(2L) == "beta content\n\nbeta second paragraph",
      "blank line must survive as structure")
    assert(got(3L) == "gamma content")
    assert(got(4L) == "", "a pure-boilerplate doc comes back empty, not dropped")
    // a line shared by only TWO docs stays (minDocs = 3)
    assert(got(5L) == "delta content\nshared twice only")
    assert(got(6L) == "epsilon content\nshared twice only")
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L), "no rows dropped")
  }

  test("the count is by DISTINCT documents, not occurrences") {
    val repeats = Seq(
      (1L, s"$footer\n$footer\n$footer\nunique one"), // 3 occurrences, 1 doc
      (2L, "unique two")).toDF("doc_id", "text")
    val got = LineDedup.dedupLines(repeats, "doc_id", "text")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got(1L) == s"$footer\n$footer\n$footer\nunique one",
      "within-document repetition alone must not trigger removal")
  }

  test("maxLines caps reassembly: an oversized doc truncates with the flag, others are untouched") {
    // doc 1 has 8 lines (over the cap of 5); doc 2 is small. The footer
    // is NOT boilerplate here (one doc) — truncation is purely positional.
    val lines = (0 until 8).map(i => s"line $i").mkString("\n")
    val oversized = Seq((1L, lines), (2L, "tiny content")).toDF("doc_id", "text")
    val got = LineDedup.dedupLines(oversized, "doc_id", "text",
        maxLines = 5, truncFlagCol = "truncated")
      .select("doc_id", "text", "truncated")
      .as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((0 until 5).map(i => s"line $i").mkString("\n"), true),
      "the first maxLines lines survive in order, and the cut is flagged")
    assert(got(2L) == (("tiny content", false)))
    // without a flag column the schema is unchanged
    val plain = LineDedup.dedupLines(oversized, "doc_id", "text", maxLines = 5)
    assert(plain.columns.toSeq == Seq("doc_id", "text"))
    // boilerplate REMOVAL still sees every line: a line planted past the
    // cap in >= minDocs docs is still counted (the cap only bounds
    // reassembly memory, never the statistics)
    val planted = Seq(
      (1L, lines + "\nCOMMON FOOTER"),
      (2L, "a\nCOMMON FOOTER"),
      (3L, "b\nCOMMON FOOTER")).toDF("doc_id", "text")
    val cut = LineDedup.dedupLines(planted, "doc_id", "text",
        minDocs = 3, maxLines = 5)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(!cut.values.exists(_.contains("COMMON FOOTER")),
      "a planted line past the reassembly cap must still be removed everywhere")
  }

  test("other columns pass through untouched and results are partitioning-invariant") {
    val wide = docs.withColumn("lang", lit("en"))
    val a = LineDedup.dedupLines(wide, "doc_id", "text")
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect().toSet
    val b = LineDedup.dedupLines(wide.repartition(7, col("doc_id")), "doc_id", "text")
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect().toSet
    assert(a == b && a.forall(_._2 == "en"))
  }
}
