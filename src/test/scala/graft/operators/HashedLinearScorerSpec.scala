package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hashed BoW scorer: the engine pipeline must equal a driver-side
  * reference of hash → bucket → integer weight → exact mean → sigmoid,
  * the keep gate must be integer-exact, and trained weights must plug in
  * via the literal-array path.
  */
class HashedLinearScorerSpec extends SparkSpec {
  import spark.implicits._

  private val Den = 1000003L

  private def refHash(s: String): Long = {
    var acc = 0L
    s.foreach(c => acc = (acc * 31 + c.toLong) % 1000000007L)
    acc
  }

  test("score pipeline matches the driver-side reference exactly") {
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "one token"),
      (3L, "   "), // empty after normalization -> no row
      (4L, "repeat repeat repeat repeat"))
    val got = HashedLinearScorer.score(texts.toDF("doc_id", "text"),
        "doc_id", "text", buckets = 64,
        weightInt = HashedLinearScorer.syntheticWeightInt(Den),
        den = Den, calib = 8.0)
      .as[(Long, Int, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap

    assert(!got.contains(3L), "empty doc must produce no row")
    for ((id, text) <- texts if id != 3L) {
      val toks = text.trim.split("\\s+").toSeq
      val ws = toks.map { t =>
        val b = refHash(t) % 64
        (b * 2654435761L) % Den - Den / 2
      }
      val s = ws.sum
      val score = s.toDouble / (toks.size * Den.toDouble)
      val (gid, gn, gScore, gProb, gKeep) = got(id)
      assert(gn == toks.size, s"doc $id token count")
      assert(gScore == math.rint(score * 1e6) / 1e6 ||
        math.abs(gScore - score) < 1e-6, s"doc $id score $gScore vs $score")
      assert(gKeep == (s >= 0), s"doc $id keep gate")
      val prob = 1.0 / (1.0 + math.exp(-8.0 * score))
      assert(math.abs(gProb - prob) < 1e-6, s"doc $id prob")
    }
  }

  test("a trained weight vector plugs in as a broadcast literal array") {
    // all mass on one token's bucket: crafted weights flip the keep gate
    val df = Seq((1L, "signal signal signal"), (2L, "noise noise noise")).toDF("doc_id", "text")
    val goodB = (refHash("signal") % 8).toInt
    val badB = (refHash("noise") % 8).toInt
    assert(goodB != badB, "fixture needs distinct buckets")
    val weights = Array.tabulate(8)(b =>
      if (b == goodB) 100L else if (b == badB) -100L else 0L)
    val got = HashedLinearScorer.score(df, "doc_id", "text", buckets = 8,
        weightInt = b => element_at(typedLit(weights), b.cast("int") + 1),
        den = 1000L, calib = 8.0)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(got(1L) && !got(2L))
  }

  // ------------------------------------------------------------ training

  /** The t32 label: natural-language-likeness (stopword ratio at or above
    * the train split's exact median) — a gate genuinely linear in the
    * serving features. The corpus' `lang` column is NOT used: its text is
    * language-independent by construction (same vocabulary in every
    * class), so no text model can learn it.
    */
  private def labeledDocs(dir: String) = {
    val docs = graft.Tables.documents(spark, dir).withColumn("__sw",
      graft.functions.TextFunctions.stopwordRatio(col("text")))
    val med = docs.filter(col("doc_id") % 2 === 0)
      .select(expr("percentile(__sw, 0.5)")).head.getDouble(0)
    docs.withColumn("__y",
      when(col("__sw") >= med, lit(1)).otherwise(lit(-1)))
  }

  test("choleskySolve solves (G + λI) w = v for a random PSD system") {
    val rnd = new scala.util.Random(42)
    val n = 12
    val a = Array.fill(n, n)(rnd.nextLong(20L).toDouble - 10.0)
    // G = AᵀA is PSD
    val g = Array.tabulate(n, n)((i, j) =>
      (0 until n).map(k => a(k)(i) * a(k)(j)).sum)
    val v = Array.fill(n)(rnd.nextLong(200L).toDouble - 100.0)
    val lambda = 0.5
    val w = HashedLinearScorer.choleskySolve(g, v, lambda)
    (0 until n).foreach { i =>
      val lhs = (0 until n).map(j => g(i)(j) * w(j)).sum + lambda * w(i)
      assert(math.abs(lhs - v(i)) < 1e-6, s"row $i residual ${lhs - v(i)}")
    }
  }

  test("normal-equation moments are exact and partitioning-invariant") {
    val docs = labeledDocs("/root/testdata/sf0.001")
      .filter(col("doc_id") % 2 === 0)
    val (g1, v1) = HashedLinearScorer.normalEquations(
      docs, "doc_id", "text", "__y", buckets = 32)
    val (g2, v2) = HashedLinearScorer.normalEquations(
      docs.repartition(7), "doc_id", "text", "__y", buckets = 32)
    assert(g1.map(_.toSeq).toSeq == g2.map(_.toSeq).toSeq)
    assert(v1.toSeq == v2.toSeq)
    // Gram is symmetric by construction
    for (i <- g1.indices; j <- g1.indices)
      assert(g1(i)(j) == g1(j)(i), s"asymmetry at ($i,$j)")
  }

  test("trainRidge weights are bit-identical under repartitioning") {
    val docs = labeledDocs("/root/testdata/sf0.001")
      .filter(col("doc_id") % 2 === 0)
    val w1 = HashedLinearScorer.trainRidge(docs, "doc_id", "text", "__y",
      buckets = 64, lambda = 0.1, den = Den)
    val w2 = HashedLinearScorer.trainRidge(docs.repartition(13),
      "doc_id", "text", "__y", buckets = 64, lambda = 0.1, den = Den)
    assert(w1.toSeq == w2.toSeq)
  }

  test("the trained scorer beats the synthetic baseline on held-out eval") {
    val all = labeledDocs("/root/testdata/sf0.001")
    val train = all.filter(col("doc_id") % 2 === 0)
    val heldOut = all.filter(col("doc_id") % 2 =!= 0)
    val weights = HashedLinearScorer.trainRidge(train, "doc_id", "text",
      "__y", buckets = 64, lambda = 0.1, den = Den)

    def eval(weightInt: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
        : (Double, Double) = {
      val scored = HashedLinearScorer.score(heldOut, "doc_id", "text",
          buckets = 64, weightInt = weightInt, den = Den, calib = 8.0)
        .join(heldOut.select(col("doc_id"), (col("__y") === 1).as("gold")),
          "doc_id")
        .select("keep", "gold").as[(Boolean, Boolean)].collect()
      val tp = scored.count(r => r._1 && r._2).toDouble
      val fp = scored.count(r => r._1 && !r._2).toDouble
      val fn = scored.count(r => !r._1 && r._2).toDouble
      val acc = scored.count(r => r._1 == r._2).toDouble / scored.length
      val f1 = if (tp == 0) 0.0 else 2 * tp / (2 * tp + fp + fn)
      (acc, f1)
    }

    val (accT, f1T) = eval(HashedLinearScorer.literalWeightInt(weights))
    val (accS, f1S) = eval(HashedLinearScorer.syntheticWeightInt(Den))
    // t30's eval criteria: the trained gate must clearly dominate the
    // synthetic stand-in on BOTH accuracy and F1 over held-out docs
    assert(accT > accS + 0.05,
      s"trained acc $accT must beat synthetic $accS by > 5pp")
    assert(f1T > f1S, s"trained f1 $f1T vs synthetic $f1S")
    assert(accT > 0.75, s"trained held-out accuracy too weak: $accT")
  }

  // ------------------------------------------------- multi-class (OvR)

  test("charNgramTokens: overlapping lowercased trigrams, short text empty") {
    val got = Seq((1L, "AbCde"), (2L, "ab"), (3L, "  x \n y  "))
      .toDF("id", "text")
      .select(col("id"),
        HashedLinearScorer.charNgramTokens(3)(col("text")).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("abc", "bcd", "cde"))
    assert(got(2L) == Seq.empty)
    assert(got(3L) == Seq("x y")) // normalizeWs collapses to "x y"
  }

  test("trainRidgeMulti on a 2-class label recovers trainRidge's gate") {
    val docs = labeledDocs("/root/testdata/sf0.001")
      .filter(col("doc_id") % 2 === 0)
      .withColumn("__cls", when(col("__y") === 1, lit("pos"))
        .otherwise(lit("neg")))
    val binary = HashedLinearScorer.trainRidge(docs, "doc_id", "text",
      "__y", buckets = 32, lambda = 0.1, den = Den)
    val multi = HashedLinearScorer.trainRidgeMulti(docs, "doc_id", "text",
      "__cls", buckets = 32, lambda = 0.1, den = Den).toMap
    // y_pos = +1 on pos, -1 elsewhere — exactly the binary label, so the
    // pos gate must be the SAME quantized vector; and v_neg = -v_pos, so
    // the neg gate is its negation up to the round-half-up tie at .5
    assert(multi("pos").toSeq == binary.toSeq)
    multi("neg").zip(binary).foreach { case (n, p) =>
      assert(math.abs(n + p) <= 1, s"neg weight $n vs pos $p")
    }
  }

  test("trainRidgeMulti weights are bit-identical under repartitioning") {
    val docs = labeledDocs("/root/testdata/sf0.001")
      .withColumn("__cls", when(col("__y") === 1, lit("a"))
        .otherwise(lit("b")))
    val m1 = HashedLinearScorer.trainRidgeMulti(docs, "doc_id", "text",
      "__cls", buckets = 64, lambda = 0.1, den = Den,
      features = HashedLinearScorer.charNgramTokens(3))
    val m2 = HashedLinearScorer.trainRidgeMulti(docs.repartition(13),
      "doc_id", "text", "__cls", buckets = 64, lambda = 0.1, den = Den,
      features = HashedLinearScorer.charNgramTokens(3))
    assert(m1.map(_._1) == m2.map(_._1))
    m1.zip(m2).foreach { case ((c1, w1), (_, w2)) =>
      assert(w1.toSeq == w2.toSeq, s"class $c1 weights drifted")
    }
  }

  test("scoreMulti: integer-exact argmax, ties to the first class") {
    // crafted weights: 'signal' lands in bucket goodB; class hi pays +5
    // there, class lo pays -5, class zz duplicates hi to force a tie
    val goodB = (refHash("signal") % 8).toInt
    val wHi = Array.tabulate(8)(b => if (b == goodB) 5L else 0L)
    val wLo = Array.tabulate(8)(b => if (b == goodB) -5L else 0L)
    val docs = Seq((1L, "signal signal"), (2L, "signal")).toDF("doc_id", "text")
    // hi and zz tie at +5/token; lexicographically-first (classWeights
    // order = sorted) wins
    val byId = HashedLinearScorer.scoreMulti(docs, "doc_id", "text",
        buckets = 8,
        classWeights = Seq("hi" -> wHi, "lo" -> wLo, "zz" -> wHi),
        den = Den)
      .select("doc_id", "pred").as[(Long, String)].collect().toMap
    assert(byId(1L) == "hi" && byId(2L) == "hi",
      s"tie must resolve to the first class in order: $byId")
    val lost = HashedLinearScorer.scoreMulti(docs, "doc_id", "text",
        buckets = 8, classWeights = Seq("aa" -> wLo, "bb" -> wHi),
        den = Den)
      .select("doc_id", "pred").as[(Long, String)].collect().toMap
    assert(lost(1L) == "bb", "strict max must beat earlier class")
  }

  test("multiclass char-ngram lang-id beats the t03 marker heuristic " +
      "on gold per-language F1 when the corpus carries real signal") {
    // Disjoint per-language vocabularies with NO t03 marker words: the
    // 5-marker heuristic sees nothing and answers 'und', while the
    // trained char-3-gram gates see every word. Deterministic fixture.
    val vocab = Map(
      "en" -> Seq("house", "water", "light", "morning", "people", "stone"),
      "fr" -> Seq("maison", "lumiere", "matin", "gens", "pierre", "soleil"),
      "es" -> Seq("casa", "agua", "manana", "gente", "piedra", "cielo"),
      "de" -> Seq("haus", "wasser", "licht", "morgen", "leute", "stein"))
    val langs = vocab.keys.toSeq.sorted
    val docs = (0 until 200).map { i =>
      val lang = langs((i / 2) % 4) // stratified across the even/odd split
      val words = vocab(lang)
      val rnd = new scala.util.Random(i * 7919L)
      (i.toLong, lang,
        Seq.fill(20)(words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val train = docs.filter(col("doc_id") % 2 === 0)
    val heldOut = docs.filter(col("doc_id") % 2 =!= 0)
    val model = HashedLinearScorer.trainRidgeMulti(train, "doc_id", "text",
      "lang", buckets = 128, lambda = 0.1, den = Den,
      features = HashedLinearScorer.charNgramTokens(3))
    val trained = HashedLinearScorer.scoreMulti(heldOut, "doc_id", "text",
        buckets = 128, classWeights = model, den = Den,
        features = HashedLinearScorer.charNgramTokens(3))
      .join(heldOut.select("doc_id", "lang"), "doc_id")
      .select("lang", "pred").as[(String, String)].collect()
    val heur = heldOut
      .select(col("lang"),
        graft.functions.TextFunctions.langId(col("text")).as("pred"))
      .as[(String, String)].collect()
    def f1For(pairs: Array[(String, String)], cls: String): Double = {
      val tp = pairs.count(p => p._1 == cls && p._2 == cls).toDouble
      val fp = pairs.count(p => p._1 != cls && p._2 == cls).toDouble
      val fn = pairs.count(p => p._1 == cls && p._2 != cls).toDouble
      if (tp == 0) 0.0 else 2 * tp / (2 * tp + fp + fn)
    }
    val macroT = langs.map(f1For(trained, _)).sum / langs.size
    val macroH = langs.map(f1For(heur, _)).sum / langs.size
    info(f"macro-F1 trained=$macroT%.3f heuristic=$macroH%.3f")
    langs.foreach { l =>
      assert(f1For(trained, l) >= f1For(heur, l),
        s"trained must not trail the heuristic on $l")
    }
    assert(macroT > macroH + 0.3,
      s"trained macro-F1 $macroT must clearly beat heuristic $macroH")
    assert(macroT > 0.9, s"disjoint-vocab lang-id should be near-exact: $macroT")
  }
}
