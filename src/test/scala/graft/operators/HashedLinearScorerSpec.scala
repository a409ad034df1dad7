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
}
