package graft.plans

import graft.SparkSpec
import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** Byte-level BPE ([[BytePretokenizeExpr]] + the reused merge loop /
  * codegen encoder): the GPT-2 pre-tokenizer law against hand-derived
  * expectations, the byte-alphabet bijection, lossless round-trips, and
  * the WRITTEN DIFFERENCE FIXTURE — where and why the byte-level
  * segmentation disagrees with t26's lowercased-whitespace Sennrich
  * form.
  */
class ByteBpeSpec extends SparkSpec {
  import spark.implicits._

  private def pretok(s: String): Seq[String] =
    Seq(s).toDF("t")
      .select(BytePretokenizeExpr.bytePretokenize(col("t")))
      .as[Seq[String]].head().map(BytePretokenizeExpr.byteUnmap)

  test("byte alphabet is a bijection over all 256 bytes; mapped symbols " +
    "are single code points (so the UNCHANGED merge loop sees bytes)") {
    val chars = BytePretokenizeExpr.byteToChar
    assert(chars.distinct.length == 256)
    assert(chars.forall(c => !Character.isWhitespace(c) && c != 0))
    (0 until 256).foreach { b =>
      assert(BytePretokenizeExpr.charToByte(chars(b)) == b.toByte)
    }
    // printable bytes map to themselves (the published table)
    assert(chars('A'.toInt) == 'A' && chars('!'.toInt) == '!')
    assert(chars(' '.toInt) == 'Ġ') // space → Ġ, the famous one
  }

  test("pre-tokenizer matches the GPT-2 pattern: contractions, " +
    "space-prefixed runs, punctuation split, trailing-space handling") {
    assert(pretok("Hello world") == Seq("Hello", " world"))
    assert(pretok("don't stop") == Seq("don", "'t", " stop"))
    assert(pretok("I'll we're I'd I've I'm it's") ==
      Seq("I", "'ll", " we", "'re", " I", "'d", " I", "'ve", " I", "'m",
        " it", "'s"))
    // digits and punctuation split off letters; space attaches forward
    assert(pretok("abc123 x,y!") ==
      Seq("abc", "123", " x", ",", "y", "!"))
    // double space: the run keeps its LAST space for the next token
    assert(pretok("a  b") == Seq("a", " ", " b"))
    // trailing whitespace is its own token
    assert(pretok("a ") == Seq("a", " "))
    // multilingual text pre-tokenizes by Unicode class, bytes later
    assert(pretok("über café") == Seq("über", " café"))
  }

  test("byte round-trip is lossless: unmap(map(token)) == token for " +
    "every pre-token, including multi-byte UTF-8") {
    val texts = Seq("Hello, wörld! 你好 𝕥ext\t\nmixed  spaces",
      "emoji 😀 and ünïcode €")
    texts.foreach { t =>
      val back = pretok(t).mkString
      assert(back == t, s"round-trip broke on: $t")
    }
  }

  test("DIFFERENCE FIXTURE vs t26's word-level segmentation — the four " +
    "documented divergences: case, punctuation, contractions, bytes") {
    val docs = Seq(
      (0L, "Hello hello HELLO"),     // case: word-level folds, byte keeps
      (1L, "stop, stop, stop,"),     // punctuation: glued vs split
      (2L, "don't don't don't"),     // contractions: one word vs 3 pieces
      (3L, "café café café"))        // é: one code point vs two bytes
      .toDF("doc_id", "text")
    val wordMerges = Bpe.learn(Bpe.wordCounts(docs, "text"), 30,
      minPairCount = 2)
    val byteMerges = Bpe.learn(Bpe.byteWordCounts(docs, "text"), 30,
      minPairCount = 2)
    val both = docs.select(col("doc_id"),
        Bpe.encode(col("text"), wordMerges).as("w"),
        Bpe.byteEncode(col("text"), byteMerges).as("b"))
      .as[(Long, Seq[String], Seq[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // 1. CASE: the word-level trainer lowercases, so "Hello hello HELLO"
    //    is one tripled word and merges collapse it to a single token —
    //    byte-level keeps three distinct surface forms
    assert(both(0L)._1 == Seq("hello", "hello", "hello"))
    assert(both(0L)._2.map(BytePretokenizeExpr.byteUnmap)
      .count(_.toLowerCase == "hello") < 3 ||
      both(0L)._2.length > both(0L)._1.length)

    // 2. PUNCTUATION: "stop," is one whitespace word (the comma merges
    //    INTO the token given enough budget) — the byte pre-tokenizer
    //    splits "," off unconditionally, so no learned token ever spans
    //    a letter/punctuation boundary
    assert(both(1L)._1.contains("stop,"))
    val bToks1 = both(1L)._2.map(BytePretokenizeExpr.byteUnmap)
    assert(!bToks1.exists(t => t.contains("p") && t.contains(",")))

    // 3. CONTRACTIONS: "don't" is one word-level unit; byte-level
    //    pre-splits don / 't, so the apostrophe suffix is shared
    //    vocabulary across all contracted forms
    assert(both(2L)._1.contains("don't"))
    assert(both(2L)._2.map(BytePretokenizeExpr.byteUnmap).contains("'t"))

    // 4. BYTES: é is ONE symbol to the code-point trainer but TWO bytes
    //    (0xC3 0xA9) to the byte-level one — the byte table must SPEND a
    //    merge crossing that byte boundary before "café" can become one
    //    token (the exact merge path is count/tie-break dependent: here
    //    0xC3 attaches to "af" before 0xA9 joins), which is how
    //    GPT-2-lineage vocabularies pay for multilingual text
    assert(both(3L)._1 == Seq("café", "café", "café"))
    val learned = byteMerges.map(m => m.left + m.right)
      .map(BytePretokenizeExpr.byteUnmap)
    assert(learned.exists(_.contains("é")),
      s"no byte merge ever crossed the é byte boundary: $learned")
  }

  test("encode reproduces training-time segmentation (reuse law): " +
    "byte tokens concatenate back to the byte-mapped pre-tokens") {
    val docs = Seq((0L, "the cat sat on the mat, the cat sat."))
      .toDF("doc_id", "text")
    val merges = Bpe.learn(Bpe.byteWordCounts(docs, "text"), 15,
      minPairCount = 2)
    val toks = docs.select(Bpe.byteEncode(col("text"), merges))
      .as[Seq[String]].head()
    assert(toks.map(BytePretokenizeExpr.byteUnmap).mkString ==
      "the cat sat on the mat, the cat sat.")
  }
}
