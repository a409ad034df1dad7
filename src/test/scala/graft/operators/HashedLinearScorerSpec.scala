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
}
