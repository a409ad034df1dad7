package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Exact-substring span dedup: hand-computable fixtures for detection
  * (window duplication, interval-union coverage incl. overlapping and
  * abutting spans) and removal (in-row token filter), plus the
  * no-duplication identity and the short-document guard.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val n = 3

  private def docs(rows: (Int, String)*) =
    rows.toSeq.toDF("id", "text")

  test("coverage: overlapping duplicated windows merge into one span") {
    // "a b c d" shared by both docs → with n=3 two windows (starts 0,1)
    // in each; union covers 4 tokens, not 6.
    val df = docs(
      1 -> "a b c d x y z",
      2 -> "q q2 q3 a b c d")
    val out = SpanDedup.coverage(df, "id", "text", n, 2)
      .orderBy("id").collect()
    assert(out(0) === Row(1, 7L, 5L, 2L, 4L))
    assert(out(1) === Row(2, 7L, 5L, 2L, 4L))
  }

  test("coverage: disjoint duplicated spans sum; abutting spans merge") {
    // doc 3 shares "a b c" at start 0 and "x y z" at start 3 with the
    // others — abutting intervals [0,3)+[3,6) merge to 6 covered tokens.
    val df = docs(
      1 -> "a b c p1 p2 p3 p4",
      2 -> "r1 r2 r3 x y z r4",
      3 -> "a b c x y z")
    val out = SpanDedup.coverage(df, "id", "text", n, 2)
      .orderBy("id").collect()
    assert(out(0) === Row(1, 7L, 5L, 1L, 3L))
    assert(out(1) === Row(2, 7L, 5L, 1L, 3L))
    assert(out(2) === Row(3, 6L, 4L, 2L, 6L))
  }

  test("coverage: documents shorter than n and unique docs report zeroes") {
    val df = docs(1 -> "a b", 2 -> "u v w x", 3 -> "")
    val out = SpanDedup.coverage(df, "id", "text", n, 2)
      .orderBy("id").collect()
    assert(out(0) === Row(1, 2L, 0L, 0L, 0L))
    assert(out(1) === Row(2, 4L, 2L, 0L, 0L))
    assert(out(2) === Row(3, 0L, 0L, 0L, 0L))
  }

  test("minDocs threshold: a window must hit that many DISTINCT docs") {
    // "a b c" appears twice in doc 1 but only in doc 1 → not duplicated
    // at minDocs=2 (distinct-doc semantics, not occurrence count).
    val df = docs(1 -> "a b c z1 z2 a b c", 2 -> "m1 m2 m3 m4")
    val out = SpanDedup.coverage(df, "id", "text", n, 2)
      .orderBy("id").collect()
    assert(out(0).getLong(3) === 0L && out(0).getLong(4) === 0L)
  }

  test("removeSpans drops exactly the covered tokens, keeps order") {
    val df = docs(
      1 -> "a b c d x y z",
      2 -> "q1 q2 q3 a b c d")
    val out = SpanDedup.removeSpans(df, "id", "text", n, 2)
      .orderBy("id").collect()
    assert(out(0) === Row(1, "x y z", 4L))
    assert(out(1) === Row(2, "q1 q2 q3", 4L))
  }

  test("removeSpans is the identity (modulo ws-normalization) without dups") {
    val df = docs(1 -> "  a   b\nc ", 2 -> "u v w")
    val out = SpanDedup.removeSpans(df, "id", "text", n, 2)
      .orderBy("id").collect()
    assert(out(0) === Row(1, "a b c", 0L))
    assert(out(1) === Row(2, "u v w", 0L))
  }

  test("decontaminateSpans excises exactly the benchmark-overlapping runs") {
    // bench holds "a b c"; target doc 1 embeds it mid-text, doc 2 doesn't.
    val bench = docs(100 -> "x a b c y")
    val tgt = docs(
      1 -> "p q a b c r s",
      2 -> "p q r s t")
    val out = SpanDedup.decontaminateSpans(tgt, "id", "text",
      bench, "text", n = 3).orderBy("id").collect()
    // windows of doc 1 matching bench windows: "a b c" only ("q a b" and
    // "b c r" never occur in the bench text) -> tokens 2..4 removed
    assert(out(0) === Row(1, "p q r s", 3L))
    assert(out(1) === Row(2, "p q r s t", 0L))
  }

  test("decontamination is one-sided: target duplication alone removes nothing") {
    // the same window twice in the TARGET corpus is not contamination
    val bench = docs(100 -> "z1 z2 z3")
    val tgt = docs(1 -> "a b c d", 2 -> "a b c e")
    val out = SpanDedup.decontaminateSpans(tgt, "id", "text",
      bench, "text", n = 3).orderBy("id").collect()
    assert(out.forall(_.getLong(2) == 0L))
  }

  test("accumulated span stats resolve the identical cut as the one-shot path") {
    // two-installment protocol store with a compaction BETWEEN the
    // installments, so fold arithmetic (summed fragments + live
    // fragment) sits under the equivalence check too
    val dir = java.nio.file.Files.createTempDirectory("span-stats").toString
    try {
      val df = graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .select("doc_id", "text")
      SpanDedup.initSpanStats(spark, s"$dir/stats")
      SpanDedup.appendSpanStats(df.filter($"doc_id" % 2 === 0),
        "doc_id", "text", s"$dir/stats", n = 8, batchId = 0L)
      SpanDedup.compactSpanStats(spark, s"$dir/stats")
      SpanDedup.appendSpanStats(df.filter($"doc_id" % 2 =!= 0),
        "doc_id", "text", s"$dir/stats", n = 8, batchId = 1L)
      val stats = SpanDedup.readSpanStats(spark, s"$dir/stats")
      val viaStats = SpanDedup.removeSpansWithStats(df, "doc_id", "text",
        stats, n = 8, minDocs = 2)
      val oneShot = SpanDedup.removeSpans(df, "doc_id", "text", 8, 2)
      assert(viaStats.exceptAll(oneShot).isEmpty &&
        oneShot.exceptAll(viaStats).isEmpty)
      assert(oneShot.agg(org.apache.spark.sql.functions.sum("removed_tokens"))
        .collect()(0).getLong(0) > 0, "fixture should remove something")
      // an at-least-once replay of a FOLDED batch is a no-op
      SpanDedup.compactSpanStats(spark, s"$dir/stats")
      SpanDedup.appendSpanStats(df.filter($"doc_id" % 2 === 0),
        "doc_id", "text", s"$dir/stats", n = 8, batchId = 0L)
      val statsAfter = SpanDedup.readSpanStats(spark, s"$dir/stats")
      val viaStats2 = SpanDedup.removeSpansWithStats(df, "doc_id", "text",
        statsAfter, n = 8, minDocs = 2)
      assert(viaStats2.exceptAll(oneShot).isEmpty &&
        oneShot.exceptAll(viaStats2).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("coverage equals the explode-distinct recount on real documents") {
    // Differential against a second algorithm (position explode +
    // countDistinct) over the sf0.001 documents table — the same check
    // the DuckDB oracle performs, run engine-side so `sbt test` alone
    // guards the merged-interval fold.
    import org.apache.spark.sql.functions._
    val df = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val fold = SpanDedup.coverage(df, "doc_id", "text", 8, 2)
    val naive = SpanDedup.dupStarts(df, "doc_id", "text", 8, 2)
      .select(col("doc_id"), explode(sequence(col("__start"),
        col("__start") + 7)).as("p"))
      .groupBy("doc_id").agg(countDistinct("p").as("cov"))
    val joined = fold.join(naive, Seq("doc_id"), "left")
      .select(col("doc_id"), col("covered_tokens"),
        coalesce(col("cov"), lit(0L)).as("cov"))
    assert(joined.filter(col("covered_tokens") =!= col("cov")).count() === 0)
    assert(fold.filter(col("dup_windows") > 0).count() > 0,
      "fixture should contain duplicated spans")
  }

  test("contaminationCoverage counts exactly what decontaminateSpans removes") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val tgt = docs.filter(col("doc_id") % 10 =!= 0)
    val ref = docs.filter(col("doc_id") % 10 === 0)
    val cov = SpanDedup.contaminationCoverage(tgt, "doc_id", "text", ref, "text", 8)
    val rem = SpanDedup.decontaminateSpans(tgt, "doc_id", "text", ref, "text", 8)
      .select(col("doc_id"), col("removed_tokens"))
    val joined = cov.join(rem, "doc_id")
    assert(joined.filter(col("contaminated_tokens") =!= col("removed_tokens"))
      .count() === 0)
    assert(cov.filter(col("contaminated_windows") > 0).count() > 0,
      "fixture should contain contaminated documents")
    // fraction bounds and zero-row completeness
    assert(cov.filter(col("contaminated_frac") < 0 ||
      col("contaminated_frac") > 1).count() === 0)
    assert(cov.count() === tgt.count())
  }

  // --------------------------------------------- maximal duplicated runs

  /** Brute force over all window lengths — the exact small-scale oracle
    * the doubling composition must reproduce.
    */
  private def bruteMaxRun(docs: Seq[(Long, String)], minDocs: Int,
                          cap: Int): Map[Long, (Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val byWindow = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    for ((id, ts) <- toks; m <- 1 to math.min(cap, ts.size);
         s <- 0 to ts.size - m) {
      byWindow.getOrElseUpdate(ts.slice(s, s + m).mkString(" "),
        scala.collection.mutable.Set.empty) += id
    }
    val dup = byWindow.filter(_._2.size >= minDocs).keySet
    toks.map { case (id, ts) =>
      val mx = (1 to math.min(cap, ts.size)).flatMap { m =>
        (0 to ts.size - m).map(s => ts.slice(s, s + m).mkString(" "))
          .find(dup.contains).map(_ => m)
      }
      id -> (ts.size.toLong, if (mx.isEmpty) 0L else mx.max.toLong)
    }
  }

  test("maxDuplicatedRun: hand fixture with a known longest shared span") {
    // docs 1 & 2 share "c d e f g" (5 tokens); 3 shares only "x y" (2)
    // with 4; 5 shares nothing
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "z c d e f g q"),
      (3L, "x y m n o"),
      (4L, "p x y r s"),
      (5L, "unique words only here")).toDF("doc_id", "text")
    val got = SpanDedup.maxDuplicatedRun(docs, "doc_id", "text")
      .select("doc_id", "max_dup_run").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 5L, 2L -> 5L, 3L -> 2L, 4L -> 2L, 5L -> 0L), got)
  }

  test("maxDuplicatedRun: cap truncates the reported maximum") {
    val shared = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, shared), (2L, s"pre $shared post")).toDF("doc_id", "text")
    val got = SpanDedup.maxDuplicatedRun(docs, "doc_id", "text", cap = 8)
      .select("doc_id", "max_dup_run").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 8L, 2L -> 8L), got)
    val full = SpanDedup.maxDuplicatedRun(docs, "doc_id", "text", cap = 64)
      .select("doc_id", "max_dup_run").as[(Long, Long)].collect().toMap
    assert(full == Map(1L -> 20L, 2L -> 20L), full)
  }

  test("maxDuplicatedRun law: random corpora equal the brute force") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 3).foreach { trial =>
      // small vocabulary + planted shared runs force rich duplication
      val vocab = Vector("a", "b", "c", "d", "e", "f")
      val planted = Seq.fill(3)(
        Seq.fill(3 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))))
      val docs = (1L to 14L).map { id =>
        val base = Seq.fill(4 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        val withRun =
          if (rnd.nextBoolean()) {
            val run = planted(rnd.nextInt(planted.size))
            val cut = rnd.nextInt(base.size + 1)
            base.take(cut) ++ run ++ base.drop(cut)
          } else base
        (id, withRun.mkString(" "))
      }
      val want = bruteMaxRun(docs, minDocs = 2, cap = 16)
      val got = SpanDedup.maxDuplicatedRun(docs.toDF("doc_id", "text"),
          "doc_id", "text", minDocs = 2, cap = 16)
        .select("doc_id", "n_tokens", "max_dup_run")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }

  test("maxDuplicatedRun: minDocs = 3 demands a third sharer") {
    val docs = Seq(
      (1L, "q w e r t"),
      (2L, "q w e x y"),
      (3L, "q w z z z")).toDF("doc_id", "text")
    val got = SpanDedup.maxDuplicatedRun(docs, "doc_id", "text", minDocs = 3)
      .select("doc_id", "max_dup_run").as[(Long, Long)].collect().toMap
    // "q w" is in all three; "q w e" only in two
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), got)
  }
}
