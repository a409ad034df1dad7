package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Inverted-index retrieval: posting correctness, conjunctive intersection,
  * BM25 ranking laws, and the batch-additivity contract that makes the
  * posting relation an incrementally maintainable index.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark shuffles data fast"),
    (2L, "spark spark joins data"),
    (3L, "slow   scans\nread data"),
    (4L, ""), // empty doc: no postings, dl = 0
    (5L, "Spark SPARK spark") // case folding, tf = 3
  ).toDF("doc_id", "text")

  test("postings carry exact per-document term frequencies; empty docs absent") {
    val p = Retrieval.postings(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().toSet
    assert(p.contains(("spark", 2L, 2L)))
    assert(p.contains(("spark", 5L, 3L)))
    assert(p.contains(("data", 3L, 1L)))
    assert(!p.exists(_._2 == 4L))
    // normalization folds the newline/extra-space run in doc 3
    assert(p.contains(("scans", 3L, 1L)))
  }

  test("document frequencies count documents, not occurrences") {
    val dfs = Retrieval.documentFrequencies(
      Retrieval.postings(docs, "doc_id", "text"))
      .as[(String, Long)].collect().toMap
    assert(dfs("spark") == 3L) // docs 1, 2, 5 — not tf-weighted
    assert(dfs("data") == 3L)
    assert(dfs("slow") == 1L)
  }

  test("conjunctive search returns exactly the docs containing ALL terms") {
    val p = Retrieval.postings(docs, "doc_id", "text")
    assert(Retrieval.searchAll(p, "doc_id", Seq("spark", "data"))
      .as[Long].collect().toSet == Set(1L, 2L))
    // case-insensitive query side; duplicate query terms collapse
    assert(Retrieval.searchAll(p, "doc_id", Seq("SPARK", "spark"))
      .as[Long].collect().toSet == Set(1L, 2L, 5L))
    assert(Retrieval.searchAll(p, "doc_id", Seq("spark", "slow"))
      .as[Long].collect().isEmpty)
  }

  test("docLengths includes empty documents with dl = 0") {
    val dl = Retrieval.docLengths(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(dl(4L) == 0L && dl(1L) == 4L && dl(5L) == 3L && dl.size == 5)
  }

  test("bm25: only matching docs scored, ranked desc, tf monotone, k honored") {
    val p = Retrieval.postings(docs, "doc_id", "text")
    val dl = Retrieval.docLengths(docs, "doc_id", "text")
    val top = Retrieval.bm25TopK(p, dl, "doc_id", Seq("spark"), 10)
      .as[(Long, Double)].collect()
    assert(top.map(_._1).toSet == Set(1L, 2L, 5L))
    assert(top.map(_._2).toSeq == top.map(_._2).sorted(Ordering[Double].reverse).toSeq)
    val byId = top.toMap
    // same dl (docs 2 and 5 differ) — instead check the clean pair: doc 5
    // (tf=3, dl=3) must outscore doc 1 (tf=1, dl=4): higher tf AND shorter.
    assert(byId(5L) > byId(1L))
    assert(Retrieval.bm25TopK(p, dl, "doc_id", Seq("spark"), 2).count() == 2)
  }

  test("bm25 multi-term score is the sum of single-term scores (decimal-exact)") {
    val p = Retrieval.postings(docs, "doc_id", "text")
    val dl = Retrieval.docLengths(docs, "doc_id", "text")
    def scores(ts: Seq[String]) =
      Retrieval.bm25TopK(p, dl, "doc_id", ts, 10).as[(Long, Double)].collect().toMap
    val both = scores(Seq("spark", "fast"))
    val spark1 = scores(Seq("spark"))
    val fast1 = scores(Seq("fast"))
    // doc 1 contains both terms; decimal accumulation makes the sum exact
    // up to the final 6-dp rounding of each side
    assert(math.abs(both(1L) - (spark1(1L) + fast1(1L))) < 3e-6)
  }

  test("postings are additive over disjoint document batches (index append contract)") {
    val a = docs.filter(col("doc_id") <= 2)
    val b = docs.filter(col("doc_id") > 2)
    val unioned = Retrieval.postings(a, "doc_id", "text")
      .unionByName(Retrieval.postings(b, "doc_id", "text"))
    val oneShot = Retrieval.postings(docs, "doc_id", "text")
    assert(unioned.as[(String, Long, Long)].collect().toSet ==
      oneShot.as[(String, Long, Long)].collect().toSet)
    // df derived from the appended relation matches the one-shot build
    assert(Retrieval.documentFrequencies(unioned)
      .as[(String, Long)].collect().toSet ==
      Retrieval.documentFrequencies(oneShot)
        .as[(String, Long)].collect().toSet)
  }

  test("tfidf cosine: naive-reference parity, self excluded, duplicate doc scores 1") {
    // doc 6 duplicates doc 2's term multiset -> cosine exactly 1.0
    val corpus = docs.unionByName(Seq((6L, "joins spark data spark")).toDF("doc_id", "text"))
    val p = Retrieval.postings(corpus, "doc_id", "text")
    val got = Retrieval.tfidfCosineTopK(p, "doc_id", queryDoc = 2L, k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(!got.map(_._1).contains(2L), "query doc must be excluded")
    assert(got.head == ((6L, 1.0)), s"identical doc must rank first at 1.0: $got")
    // naive driver-side reference over the same weights
    val post = p.as[(String, Long, Long)].collect()
    val n = post.map(_._2).distinct.size.toDouble
    val dfm = post.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val w = post.map { case (t, d, tf) => ((t, d), tf.toDouble * math.log(n / dfm(t))) }.toMap
    def vec(d: Long) = w.collect { case ((t, dd), x) if dd == d => (t, x) }.toMap
    val qv = vec(2L)
    val qn = math.sqrt(qv.values.map(x => x * x).sum)
    val want = post.map(_._2).distinct.filter(_ != 2L).flatMap { d =>
      val dv = vec(d)
      val dot = qv.keySet.intersect(dv.keySet).toSeq.map(t => qv(t) * dv(t)).sum
      if (dot == 0.0) None
      else Some((d, dot / (math.sqrt(dv.values.map(x => x * x).sum) * qn)))
    }.toMap
    got.foreach { case (d, c) =>
      assert(math.abs(c - want(d)) < 1e-6, s"doc $d: got $c want ${want(d)}")
    }
    // only docs sharing >= 1 term with the query are scored
    assert(got.map(_._1).toSet == want.keySet)
  }

  test("phrase search: overlapping occurrences, repeated words, no cross-gap matches") {
    val corpus = Seq(
      (1L, "a table table table b"), // "table table" overlaps: starts 2 and 3
      (2L, "a table b table"),       // non-adjacent repeats: no match
      (3L, "table table"),           // exactly one occurrence
      (4L, "fast table scan table table fast"), // one occurrence at 4
      (5L, "")).toDF("doc_id", "text")
    val pp = Retrieval.positionalPostings(corpus, "doc_id", "text")
    val got = Retrieval.phraseSearch(pp, "doc_id", Seq("table", "table"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 3L -> 1L, 4L -> 1L), got.toString)
    // 3-word phrase with two distinct words
    val got3 = Retrieval.phraseSearch(pp, "doc_id", Seq("table", "table", "table"))
      .as[(Long, Long)].collect().toMap
    assert(got3 == Map(1L -> 1L), got3.toString)
    val got2 = Retrieval.phraseSearch(pp, "doc_id", Seq("fast", "table"))
      .as[(Long, Long)].collect().toMap
    assert(got2 == Map(4L -> 1L), got2.toString)
    // positions are 1-based over the SAME tokenization as termStream
    assert(pp.filter(col("doc_id") === 3L).orderBy("pos")
      .select("term", "pos").as[(String, Int)].collect().toSeq ==
      Seq(("table", 1), ("table", 2)))
  }

  test("reciprocal-rank fusion laws (the t33 composition)") {
    // RRF(d) = sum over lists of 1/(60 + rank_d); a doc present in BOTH
    // lists at modest ranks must beat a doc that tops only one list when
    // the other list's absence outweighs the single first place:
    // 1/61 + 0 = 0.01639 < 1/63 + 1/63 = 0.03175
    import org.apache.spark.sql.expressions.Window
    val bm = Seq((10L, 1), (20L, 2), (30L, 3), (40L, 4)).toDF("doc_id", "r_bm25")
    val cos = Seq((99L, 1), (20L, 2), (30L, 3), (50L, 4)).toDF("doc_id", "r_cos")
    val fused = bm.join(cos, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(lit(1.0) / (lit(60) + col("r_bm25")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("r_cos")), lit(0.0))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    // both-lists docs 20 and 30 outrank every single-list doc, including
    // the two rank-1 singletons (10 and 99)
    assert(fused.take(2) == Seq(20L, 30L), fused.toString)
    assert(fused.drop(2).toSet == Set(10L, 99L, 40L, 50L))
    // ties between symmetric single-list docs break by id: 10 (bm25 #1)
    // and 99 (cos #1) carry identical rrf, so 10 precedes 99
    assert(fused.indexOf(10L) < fused.indexOf(99L))
  }
}
