package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Stupid-backoff bigram scoring: hand-computed fixtures covering all
  * three likelihood branches (seen bigram, unseen bigram with in-vocab
  * continuation, out-of-vocabulary continuation).
  */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // Reference corpus: "a b a b" + "b c" →
  //   unigrams: a=2, b=3, c=1, T=6
  //   bigrams:  (a,b)=2, (b,a)=1, (b,c)=1
  private val ref = Seq((0, "a b a b"), (2, "b c")).toDF("id", "text")

  test("seen bigrams score C(u,v)/C(u)") {
    val tgt = Seq((1, "a b c")).toDF("id", "text")
    val out = NgramLm.scoreStupidBackoff(tgt, ref, "id", "text").collect()
    // (a,b): 2/2 = 1.0   (b,c): 1/3
    val expected = (1.0 + 1.0 / 3) / 2
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Long]("n_bigrams") === 2L && r.getAs[Long]("n_hit") === 2L)
    assert(math.abs(r.getAs[Double]("score") - expected) < 1e-9)
  }

  test("unseen bigram backs off to 0.4 * C(v)/T; OOV continuation scores 0") {
    val tgt = Seq((1, "c a"), (3, "a z")).toDF("id", "text")
    val out = NgramLm.scoreStupidBackoff(tgt, ref, "id", "text")
      .orderBy("id").collect()
    // (c,a) unseen → 0.4 * C(a)/T = 0.4 * 2/6
    assert(out(0).getAs[Long]("n_hit") === 0L)
    assert(math.abs(out(0).getAs[Double]("score") - 0.4 * 2.0 / 6) < 1e-9)
    // (a,z): z OOV → 0
    assert(out(1).getAs[Long]("n_hit") === 0L)
    assert(out(1).getAs[Double]("score") === 0.0)
  }

  test("documents with fewer than two tokens produce no score row") {
    val tgt = Seq((1, "solo"), (3, ""), (5, "a b")).toDF("id", "text")
    val out = NgramLm.scoreStupidBackoff(tgt, ref, "id", "text")
    assert(out.select("id").as[Int].collect().toSet === Set(5))
  }

  test("model counts are additive over disjoint batches (the continuous-ingest law)") {
    val a = Seq((0, "a b a"), (2, "b c")).toDF("id", "text")
    val b = Seq((4, "a b c c")).toDF("id", "text")
    val whole = NgramLm.model(a.unionByName(b), "id", "text")
    val merged = NgramLm.mergeModels(
      NgramLm.model(a, "id", "text"), NgramLm.model(b, "id", "text"))
    assert(whole._1.orderBy("u").collect().toSeq ===
      merged._1.orderBy("u").collect().toSeq)
    assert(whole._2.orderBy("u", "v").collect().toSeq ===
      merged._2.orderBy("u", "v").collect().toSeq)
    // and scoring through the merged model equals the one-shot path
    val tgt = Seq((1, "a b c")).toDF("id", "text")
    val one = NgramLm.scoreStupidBackoff(tgt, a.unionByName(b), "id", "text").collect()
    val two = NgramLm.scoreWithModel(tgt, merged._1, merged._2, "id", "text").collect()
    assert(one.toSeq === two.toSeq)
  }

  test("trigram backoff walks all three levels with the fixed op order") {
    // ref: "a b c a b d" → trigrams: (a,b,c) (b,c,a) (c,a,b) (a,b,d)
    //   bigrams: (a,b)=2 (b,c)=1 (c,a)=1 (b,d)=1; unigrams a=2 b=2 c=1 d=1, T=6
    val ref3 = Seq((0, "a b c a b d")).toDF("id", "text")
    val tgt = Seq(
      (1, "a b c"),   // seen trigram: 1 / C(a,b)=2 -> 0.5
      (3, "c a b d"), // (c,a,b) seen -> 1/1; (a,b,d) seen -> 1/2
      (5, "b a b"),   // (b,a,b) unseen, (a,b) seen -> 0.4 * C(a,b)/C(a) = 0.4*2/2
      (7, "d d c"))   // (d,d,c): no trigram, no (d,c) bigram -> 0.4*0.4*C(c)/T
    .toDF("id", "text")
    val out = NgramLm.scoreStupidBackoffTrigram(tgt, ref3, "id", "text")
      .orderBy("id").collect()
    def row(i: Int) = (out(i).getAs[Long]("n_trigrams"),
      out(i).getAs[Long]("n_hit3"), out(i).getAs[Long]("n_hit2"),
      out(i).getAs[Double]("score"))
    assert(row(0) === ((1L, 1L, 0L, 0.5)))
    assert(row(1)._1 == 2L && row(1)._2 == 2L &&
      math.abs(row(1)._4 - (1.0 + 0.5) / 2) < 1e-9)
    assert(row(2) === ((1L, 0L, 1L, 0.4 * (2.0 / 2))))
    // DECIMAL(18,9) accumulation quantizes each p to 9 decimals
    assert(row(3)._2 == 0L && row(3)._3 == 0L &&
      math.abs(row(3)._4 - 0.4 * (0.4 * (1.0 / 6))) < 1e-9)
  }

  test("counts are case-insensitive and whitespace-normalized") {
    val refMixed = Seq((0, "  A  b\nA b")).toDF("id", "text")
    val tgt = Seq((1, "a B")).toDF("id", "text")
    val out = NgramLm.scoreStupidBackoff(tgt, refMixed, "id", "text").collect()
    assert(out(0) === Row(1, 1L, 1L, 1.0))
  }
}
