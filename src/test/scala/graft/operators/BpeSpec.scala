package graft.operators

import graft.SparkSpec
import graft.plans.BpeEncodeExpr
import org.apache.spark.sql.functions._

/** Pins [[Bpe]] against a NAIVE direct port of the published pseudocode
  * (Sennrich et al. 2016 §3.2: get_stats / merge_vocab over a
  * space-joined-symbols vocabulary) and proves the two inference
  * properties the golden gate relies on: encode reproduces training-time
  * segmentation, and tokens concatenate losslessly back to the words.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- naive reference: the paper's algorithm, verbatim shape ----------
  private def refGetStats(vocab: Map[String, Long]): Map[(String, String), Long] =
    vocab.toSeq.flatMap { case (word, f) =>
      val syms = word.split(" ")
      syms.dropRight(1).zip(syms.drop(1)).map(p => (p, f))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

  private def refMergeVocab(pair: (String, String), vocab: Map[String, Long])
      : Map[String, Long] =
    vocab.map { case (word, f) =>
      val syms = word.split(" ")
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
          out += (pair._1 + pair._2); i += 2
        } else { out += syms(i); i += 1 }
      }
      (out.mkString(" "), f)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

  private def refLearn(words: Map[String, Long], n: Int): Seq[(String, String)] = {
    var vocab = words.map { case (w, f) => (w.toCharArray.mkString(" "), f) }
    var merges = Vector.empty[(String, String)]
    var stop = false
    while (merges.length < n && !stop) {
      val stats = refGetStats(vocab)
      if (stats.isEmpty) stop = true
      else {
        // max count, lexicographic tie-break — the operator's contract
        val best = stats.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.head
        if (best._2 < 2L) stop = true
        else { merges :+= best._1; vocab = refMergeVocab(best._1, vocab) }
      }
    }
    merges
  }

  private val corpus = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L), ("banana", 2L))

  private def corpusDf = corpus.flatMap { case (w, f) =>
    Seq.fill(f.toInt)(w)
  }.toDF("word").groupBy("word").agg(count(lit(1)).as("n"))

  test("learn matches the naive reference port of the published algorithm") {
    val got = Bpe.learn(corpusDf, numMerges = 10)
    val want = refLearn(corpus.toMap, 10)
    assert(got.map(m => (m.left, m.right)) == want)
    assert(got.map(_.rank) == got.indices)
  }

  test("learn is partitioning-invariant (exact counts, total-order tie-break)") {
    val a = Bpe.learn(corpusDf.repartition(7), 10)
    val b = Bpe.learn(corpusDf.coalesce(1), 10)
    assert(a == b)
  }

  test("merge application is leftmost-first non-overlapping: aaa -> [aa, a]") {
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "aa"))
  }

  test("pair counting includes overlapping occurrences (get_stats parity)") {
    // "aaa" x2: (a,a) counts 4 (two adjacent indexes per word)
    val wc = Seq("aaa", "aaa", "ab").toDF("word")
      .groupBy("word").agg(count(lit(1)).as("n"))
    val m = Bpe.learn(wc, 1)
    assert(m.map(x => (x.left, x.right)) == Seq(("a", "a")))
  }

  test("learning stops when the best pair count falls below minPairCount") {
    val wc = Seq("abc", "xyz").toDF("word").groupBy("word").agg(count(lit(1)).as("n"))
    assert(Bpe.learn(wc, 10).isEmpty) // every pair occurs once
  }

  test("encode reproduces training-time segmentation for every trained word") {
    val merges = Bpe.learn(corpusDf, 10)
    // replay training segmentation with the reference
    var vocab = corpus.toMap.map { case (w, f) => (w.toCharArray.mkString(" "), f) }
    merges.foreach(m => vocab = refMergeVocab((m.left, m.right), vocab))
    val want = vocab.keys.map(k => (k.replace(" ", ""), k.split(" ").toSeq)).toMap
    val got = corpus.map(_._1).toDF("text")
      .select(col("text"), Bpe.encode(col("text"), merges).as("toks"))
      .as[(String, Seq[String])].collect().toMap
    corpus.map(_._1).foreach { w =>
      assert(got(w) == want(w), s"word $w")
    }
  }

  test("tokens concatenate losslessly back to the normalized words") {
    val merges = Bpe.learn(Bpe.wordCounts(
      Seq((1L, "The newest banana is  the widest"), (2L, "lower, low!"))
        .toDF("doc_id", "text"), "text"), 20)
    val rows = Seq("The newest banana is  the widest", "lower, low!")
      .toDF("text")
      .select(col("text"), concat_ws("", Bpe.encode(col("text"), merges)).as("joined"),
        regexp_replace(trim(lower(col("text"))), "\\s+", "").as("want"))
      .select("joined", "want").as[(String, String)].collect()
    rows.foreach { case (joined, want) => assert(joined == want) }
  }

  test("expression: null array -> null; empty text -> empty tokens") {
    val merges = Seq(Bpe.Merge(0, "a", "b"))
    val df = Seq(Some("ab ab"), Some(""), None).toDF("text")
      .select(Bpe.encode(col("text"), merges).as("toks"))
    val got = df.collect()
    assert(got(0).getSeq[String](0) == Seq("ab", "ab"))
    assert(got(1).getSeq[String](0) == Seq.empty)
    // split() on a null column yields null -> expression propagates null
    assert(got(2).isNullAt(0))
  }

  test("property: random corpora — train/infer agreement and lossless concat") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 3).foreach { trial =>
      val words = Seq.fill(30)(
        Seq.fill(1 + rnd.nextInt(8))("abcd".charAt(rnd.nextInt(4))).mkString)
      val freqs = words.map(w => (w, 1L + rnd.nextInt(9).toLong))
      val wc = freqs.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
        .toDF("word").groupBy("word").agg(count(lit(1)).as("n"))
      val merges = Bpe.learn(wc, numMerges = 15)
      // reference replay of training segmentation
      var vocab = freqs.toMap.map { case (w, f) => (w.toCharArray.mkString(" "), f) }
      merges.foreach(m => vocab = refMergeVocab((m.left, m.right), vocab))
      val want = vocab.keys.map(k => (k.replace(" ", ""), k.split(" ").toSeq)).toMap
      val got = words.distinct.toDF("text")
        .select(col("text"), Bpe.encode(col("text"), merges).as("toks"))
        .as[(String, Seq[String])].collect().toMap
      words.distinct.foreach { w =>
        assert(got(w) == want(w), s"trial $trial word $w")
        assert(got(w).mkString("") == w, s"trial $trial lossless $w")
      }
    }
  }

  test("codegen and interpreted paths agree") {
    val merges = Bpe.learn(corpusDf, 10).map(m => (m.left, m.right))
    val words = Seq(Seq("newest", "banana"), Seq("lowest")).toDF("ws")
    val viaCodegen = words.select(BpeEncodeExpr.encode(col("ws"), merges).as("t"))
      .as[Seq[String]].collect().toSeq
    val interpreted = words.as[Seq[String]].collect().toSeq.map { ws =>
      val expr = graft.plans.BpeEncodeExpr(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          ws, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)), merges)
      expr.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    }
    assert(viaCodegen == interpreted)
  }
}
