package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the continuous corpus datacard ([[Datacard]]): every card
  * statistic must be ADDITIVE over any disjoint batching of the corpus —
  * the property that makes the streaming view (s24) equal the one-shot
  * card (q73) regardless of how ingestion sliced the documents.
  */
class DatacardSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("datacard").toString + "/card"

  test("additivity law: a random batching (with a fold mid-stream) equals the one-shot card") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"), col("lang"))
    val oneDir = tmp()
    Datacard.init(spark, oneDir)
    Datacard.append(docs, "doc_id", "text", "lang", oneDir, 0L)
    val want = Datacard.card(spark, oneDir)
      .as[(String, Long, Long, Double, Long)].collect().toSet

    val rnd = new scala.util.Random(20260818L)
    (1 to 3).foreach { trial =>
      val k = 2 + rnd.nextInt(4) // 2..5 batches
      val salt = rnd.nextInt(1000)
      val dir = tmp()
      Datacard.init(spark, dir)
      (0 until k).foreach { b =>
        Datacard.append(
          docs.filter(pmod(col("doc_id") + salt, lit(k)) === b),
          "doc_id", "text", "lang", dir, b.toLong)
        if (b == k / 2) Datacard.compact(spark, dir) // fold mid-stream
      }
      val got = Datacard.card(spark, dir)
        .as[(String, Long, Long, Double, Long)].collect().toSet
      assert(got == want, s"trial $trial (k=$k salt=$salt)")
    }
  }

  test("length-panel additivity: random batchings reproduce the one-shot percentiles bit for bit") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"), col("lang"))
    val oneDir = tmp()
    Datacard.init(spark, oneDir)
    Datacard.append(docs, "doc_id", "text", "lang", oneDir, 0L)
    val want = Datacard.lengths(spark, oneDir)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty && want.forall { case (_, n, p50, p95, p99) =>
      n > 0 && p50 <= p95 && p95 <= p99 })

    val rnd = new scala.util.Random(20260819L)
    (1 to 3).foreach { trial =>
      val k = 2 + rnd.nextInt(4)
      val salt = rnd.nextInt(1000)
      val dir = tmp()
      Datacard.init(spark, dir)
      (0 until k).foreach { b =>
        Datacard.append(
          docs.filter(pmod(col("doc_id") + salt, lit(k)) === b),
          "doc_id", "text", "lang", dir, b.toLong)
        if (b == k / 2) Datacard.compact(spark, dir)
      }
      val got = Datacard.lengths(spark, dir)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(got == want, s"trial $trial (k=$k salt=$salt)")
    }
  }

  test("lengths sit in the exact regime: percentiles equal the rank-exact answer") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"), col("lang"))
    val dir = tmp()
    Datacard.init(spark, dir)
    Datacard.append(docs, "doc_id", "text", "lang", dir, 0L)
    val got = Datacard.lengths(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // rank-exact truth straight off the table (ceil(p*n/100)-th value)
    val toks = docs.select(col("lang"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long").as("t"))
      .as[(String, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    toks.foreach { case (lang, v) =>
      def p(q: Int): Long = v((q * v.length + 99) / 100 - 1)
      assert(got(lang) == ((v.length.toLong, p(50), p(95), p(99))), lang)
    }
  }

  test("duplicate exposure counts pairs split across batches; singletons never count") {
    val a = Seq((1L, "the same body", "en"), (2L, "only here once", "en"))
      .toDF("doc_id", "text", "lang")
    val b = Seq((3L, "the same body", "en"), (4L, "another lone doc", "fr"))
      .toDF("doc_id", "text", "lang")
    val dir = tmp()
    Datacard.init(spark, dir)
    Datacard.append(a, "doc_id", "text", "lang", dir, 0L)
    // before batch 1 lands, nothing is duplicated
    val before = Datacard.card(spark, dir)
      .select("lang", "n_dup_docs").as[(String, Long)].collect().toMap
    assert(before("en") == 0L)
    Datacard.append(b, "doc_id", "text", "lang", dir, 1L)
    val after = Datacard.card(spark, dir)
      .select("lang", "n_docs", "n_dup_docs").as[(String, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(after("en") == ((3L, 2L)), after)
    assert(after("fr") == ((1L, 0L)), after)
  }
}
