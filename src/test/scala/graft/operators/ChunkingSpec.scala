package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Overlapping token chunking: the column-algebra stride windows must equal
  * the imperative `while start < n: emit tokens[start, start+size)` loop on
  * every edge (short doc, exact multiple, tail shorter than overlap, empty).
  */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: Seq[String], size: Int, overlap: Int) =
    Chunking.chunkTokens(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        col("text"), Seq("doc_id"), size, overlap)
      .select("doc_id", "chunk_id", "start_tok", "n_tokens", "chunk_text")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq

  private def reference(texts: Seq[String], size: Int, overlap: Int) =
    texts.zipWithIndex.flatMap { case (t, i) =>
      val toks = t.trim.split("\\s+").filter(_.nonEmpty)
      val stride = size - overlap
      Iterator.from(0).map(_ * stride).takeWhile(_ < toks.length).zipWithIndex.map {
        case (start, cid) =>
          val sl = toks.slice(start, start + size)
          (i.toLong, cid, start, sl.length, sl.mkString(" "))
      }
    }

  test("stride windows match the imperative loop on all edges") {
    val texts = Seq(
      "one two three four five six seven eight nine ten",  // n=10
      "a b c d e f g h",                                   // n=8 = exact 2 strides at size 4/ov 0
      "solo",                                              // shorter than size
      "",                                                  // empty -> no chunks
      "  spaced   out\ttokens\nhere  ",                    // needs normalization
      (1 to 25).map("t" + _).mkString(" "))                // tail shorter than overlap
    for ((size, ov) <- Seq((4, 0), (4, 1), (5, 2), (3, 2), (32, 8))) {
      assert(run(texts, size, ov) == reference(texts, size, ov),
        s"mismatch at size=$size overlap=$ov")
    }
  }

  test("every token is covered and consecutive chunks overlap by exactly `overlap` (except tail)") {
    val texts = Seq((1 to 100).map("w" + _).mkString(" "))
    val rows = run(texts, 16, 4)
    val covered = rows.flatMap(r => r._3 until (r._3 + r._4)).toSet
    assert(covered == (0 until 100).toSet)
    rows.sliding(2).foreach {
      case Seq(a, b) => assert(b._3 - a._3 == 12)
      case _         =>
    }
  }

  test("invalid parameters are rejected") {
    intercept[IllegalArgumentException](run(Seq("a b"), 0, 0))
    intercept[IllegalArgumentException](run(Seq("a b"), 4, 4))
    intercept[IllegalArgumentException](run(Seq("a b"), 4, -1))
  }
}
