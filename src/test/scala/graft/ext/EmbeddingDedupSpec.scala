package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.plans.CosineSimilarityExpr

/** Bounded embedding near-dup pairs: equivalence with the uncapped
  * self-join where blocks are small, and PROOF that a degenerate one-key
  * corpus stays bounded (the round-2 verdict's e05 scale-killer).
  */
class EmbeddingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def vec(seed: Int): Array[Float] =
    Array.tabulate(8)(i => (((seed * 31 + i * 17) % 97) / 10.0f) - 4.8f)

  private def cosLocal(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("matches the uncapped self-join when blocks are under the cap") {
    val data = (0 until 60).map(i => (i.toLong, s"L${i % 5}", vec(i)))
      .toDF("id", "label", "v")
    val got = EmbeddingDedup.cosineNearDupPairs(data, "id", "v", "label", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val a = data.select(col("label"), col("id").as("id_a"), col("v").as("va"))
    val b = data.select(col("label"), col("id").as("id_b"), col("v").as("vb"))
    val expected = a.join(b, Seq("label")).filter(col("id_a") < col("id_b"))
      .withColumn("c", CosineSimilarityExpr.cosine(col("va"), col("vb")))
      .filter(col("c") >= 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == expected && got.nonEmpty)
  }

  test("degenerate one-key corpus is bounded: oversized block is dropped") {
    val one = (0 until 300).map(i => (i.toLong, "hot", vec(i)))
      .toDF("id", "label", "v")
    // cap 100 on a 300-member block: the block is dropped whole — zero pairs
    // instead of 300²/2 expansions; work is bounded by the cap, not the key
    val res = EmbeddingDedup.cosineNearDupPairs(one, "id", "v", "label",
      threshold = -1.0, maxBlockSize = 100)
    assert(res.count() == 0)
  }

  test("signature blocking recovers planted near-duplicate pairs, codebook-free") {
    // 50 base vectors plus a planted near-identical twin of vector 7
    val base = (0 until 50).map(i => (i.toLong, vec(i)))
    val twin = (100L, vec(7).zipWithIndex.map { case (x, j) =>
      if (j == 0) x + 1e-4f else x
    })
    val data = (base :+ twin).toDF("id", "v")
    val got = EmbeddingDedup.cosineNearDupsBySignature(data, "id", "v",
        dim = 8, planes = 4, threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((7L, 100L)),
      "near-identical twin must co-bucket with its original and survive the threshold")
  }

  test("cell blocking splits a degenerate label; pairs only from capped cells") {
    val one = (0 until 300).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val cb = IvfAnn.codebook(one, "vec_id", "embedding", k = 8, iterations = 1)
    val cap = 100
    val got = EmbeddingDedup.cosineNearDupsByCell(one, "vec_id", "embedding",
        cb, threshold = 0.9, maxBlockSize = cap)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    // driver-side reference: within-cell pairs over cells whose size is in
    // [2, cap], exact cosine — the blocking must mirror IvfAnn.assign
    val assigned = IvfAnn.assign(one, "embedding", cb)
      .select(col("vec_id"), col("cell"), col("embedding"))
      .as[(Long, Int, Array[Float])].collect()
    val byCell = assigned.groupBy(_._2).filter { case (_, ms) =>
      ms.length >= 2 && ms.length <= cap
    }
    val expected = (for {
      (_, ms) <- byCell.toSeq
      x <- ms.toSeq; y <- ms.toSeq if x._1 < y._1
      if cosLocal(x._3, y._3) >= 0.9
    } yield (x._1, y._1)).toSet
    assert(got == expected)
    assert(got.nonEmpty, "cell blocking should recover near-dup pairs the " +
      "dropped one-label block lost")
  }

  test("semanticDedup drops exactly the items with an earlier similar neighbor") {
    val data = (0 until 60).map(i => (i.toLong, s"L${i % 5}", vec(i)))
      .toDF("id", "label", "v")
    val kept = EmbeddingDedup.semanticDedup(data, "id", "v", "label", 0.5)
      .select("id").as[Long].collect().toSet
    // driver-side reference of the paper's triu rule: j survives iff no
    // i < j in its block has cos >= tau — whether or not i itself survives
    val rows = (0 until 60).map(i => (i.toLong, i % 5, vec(i)))
    val expected = rows.filter { case (j, blk, vj) =>
      !rows.exists { case (i, b2, vi) =>
        b2 == blk && i < j && cosLocal(vi, vj) >= 0.5
      }
    }.map(_._1).toSet
    assert(kept == expected)
    assert(kept.size < 60, "fixture should actually drop something")
  }

  test("semanticDedupByCell keeps all members of an over-cap cell (no blind deletion)") {
    val one = (0 until 300).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val cb = IvfAnn.codebook(one, "vec_id", "embedding", k = 1, iterations = 1)
    // k=1 -> a single 300-member cell over a 100 cap: pair expansion is
    // skipped, so nothing may be dropped
    val kept = EmbeddingDedup.semanticDedupByCell(one, "vec_id", "embedding",
      cb, threshold = 0.0, maxBlockSize = 100)
    assert(kept.count() == 300)
    assert(kept.columns.toSeq == Seq("vec_id", "embedding"))
  }
}
