package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.plans.BpeEncodeExpr

/** Byte-pair-encoding tokenizer TRAINING over a corpus — the published
  * algorithm (Sennrich, Haddow & Birch 2016, "Neural Machine Translation
  * of Rare Words with Subword Units"): repeatedly merge the most frequent
  * adjacent symbol pair across the vocabulary.
  *
  * The scalable decomposition is the paper's own observation: BPE never
  * needs the corpus — it needs the WORD-FREQUENCY relation. So the 100 TB
  * pass is exactly ONE map-side-combined aggregate (`wordCounts`: corpus →
  * (word, n)), and the merge loop runs over that Zipf-bounded vocabulary,
  * which is driver-small by the same contract as IVF codebooks and
  * probed-cell lists (`maxVocabRows` caps the driver collect explicitly —
  * over-cap vocabularies keep the most frequent rows, mirroring how
  * production trainers cap with a min-frequency floor). Encoding
  * ([[graft.plans.BpeEncodeExpr]]) is row-local column work that rides the
  * corpus scan stage.
  *
  * Determinism (what makes the learned table golden-gateable): pair counts
  * are exact integer sums over the word multiset (partitioning-invariant),
  * and argmax ties break by lexicographic (left, right) — a total order, so
  * any engine replays the identical merge sequence. Learning stops early
  * when the best pair's count drops below `minPairCount` (default 2 —
  * merging a pair seen once memorizes a single word and makes the table
  * fragile to corpus noise).
  *
  * Within-word counting matches the reference implementation's `get_stats`:
  * every adjacent index contributes, overlaps included ("aaa" counts (a,a)
  * twice); merge application is leftmost-first non-overlapping
  * ("aaa" + merge (a,a) → [aa, a]). BpeSpec pins both against a naive
  * direct port of the paper's pseudocode.
  */
object Bpe {

  /** The ONE corpus-sized pass: lower-cased whitespace words → frequencies.
    * Map-side combined; output is the Zipf-bounded vocabulary relation.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(TextFunctions.normalizeWs(lower(col(textCol))), " "))
        .as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** One learned merge: `rank` is its position in the learned order. */
  final case class Merge(rank: Int, left: String, right: String)

  /** Run the merge loop over a word-frequency relation. Collects at most
    * `maxVocabRows` rows (most frequent first — the explicit driver-size
    * contract; vocabulary is Zipf-bounded, not corpus-bounded).
    */
  def learn(wordCounts: DataFrame, numMerges: Int,
            minPairCount: Long = 2L, maxVocabRows: Int = 2000000): Seq[Merge] = {
    val vocab: Array[(Array[String], Long)] = wordCounts
      .orderBy(col("n").desc, col("word").asc)
      .limit(maxVocabRows)
      .select(col("word").cast("string"), col("n").cast("long"))
      .collect()
      .map(r => (codePoints(r.getString(0)), r.getLong(1)))

    val words = vocab.map(_._1.asInstanceOf[Array[String]])
    val freqs = vocab.map(_._2)
    val merges = Vector.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      // exact pair counts over the vocab (every adjacent index, overlaps in)
      val counts = new java.util.HashMap[(String, String), java.lang.Long]()
      var w = 0
      while (w < words.length) {
        val s = words(w); val f = freqs(w)
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          val prev = counts.get(k)
          counts.put(k, java.lang.Long.valueOf(
            (if (prev == null) 0L else prev.longValue()) + f))
          i += 1
        }
        w += 1
      }
      // argmax with lexicographic tie-break: a total order -> deterministic
      var best: (String, String) = null
      var bestN = 0L
      counts.forEach { (k, boxed) =>
        val n = boxed.longValue()
        if (n > bestN || (n == bestN && best != null &&
            (k._1 < best._1 || (k._1 == best._1 && k._2 < best._2)))) {
          best = k; bestN = n
        }
      }
      if (best == null || bestN < minPairCount) exhausted = true
      else {
        merges += Merge(rank, best._1, best._2)
        var w2 = 0
        while (w2 < words.length) {
          words(w2) = applyMerge(words(w2), best._1, best._2)
          w2 += 1
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** Leftmost-first non-overlapping replacement of one pair in one word. */
  private[operators] def applyMerge(s: Array[String], l: String, r: String)
      : Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  private def codePoints(word: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cc = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + cc)
      i += cc
    }
    out.result()
  }

  /** The merge table as a relation (rank, left, right) — persist as parquet,
    * reload with [[mergesFromDf]]; the trained artifact a tokenizer ships.
    */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
      .select(col("rank").cast("int"), col("left"), col("right"))
  }

  def mergesFromDf(df: DataFrame): Seq[Merge] =
    df.select(col("rank").cast("int"), col("left"), col("right"))
      .collect().map(r => Merge(r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_.rank).toSeq

  /** Segment a text column with a trained merge table: whitespace words →
    * concatenated BPE tokens, row-local inside the scan stage.
    */
  def encode(text: Column, merges: Seq[Merge]): Column =
    BpeEncodeExpr.encode(
      split(TextFunctions.normalizeWs(lower(text)), " "),
      merges.sortBy(_.rank).map(m => (m.left, m.right)))

  // ------------------------------------------------- byte-level (GPT-2)

  /** BYTE-LEVEL word counts — the GPT-2-lineage twin of [[wordCounts]]:
    * the corpus pass pre-tokenizes with the regex class split and
    * re-expresses each pre-token as byte-alphabet symbols
    * ([[graft.plans.BytePretokenizeExpr]] — no lowercasing, punctuation
    * split off, leading space attached), and [[learn]] runs UNCHANGED on
    * the result (the byte-mapped string's code points ARE the byte
    * symbols). Same one-aggregate scale shape.
    */
  def byteWordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(
        graft.plans.BytePretokenizeExpr.bytePretokenize(col(textCol)))
        .as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Byte-level segmentation with a [[byteWordCounts]]-trained merge
    * table — [[graft.plans.BpeEncodeExpr]] reused verbatim over the
    * byte-mapped pre-tokens. Tokens come back in the byte alphabet
    * (decode one with [[graft.plans.BytePretokenizeExpr.byteUnmap]]).
    */
  def byteEncode(text: Column, merges: Seq[Merge]): Column =
    BpeEncodeExpr.encode(
      graft.plans.BytePretokenizeExpr.bytePretokenize(text),
      merges.sortBy(_.rank).map(m => (m.left, m.right)))

  /** The 256-symbol byte alphabet in BYTE order — the base vocabulary of
    * every byte-level table ([[graft.plans.BytePretokenizeExpr
    * .byteToChar]]'s bijection, the GPT-2 `bytes_to_unicode` layout).
    */
  def byteAlphabet: Seq[String] =
    graft.plans.BytePretokenizeExpr.byteToChar.map(_.toString).toSeq

  // --------------------------------------------- interchange artifacts

  /** Export a trained table as a text interchange: `merges.txt` — a
    * `#version: 0.2` header then one `left right` line per merge in rank
    * order — follows the standard BPE merge-table interchange (the only
    * file [[readArtifacts]] needs to reconstruct the tokenizer exactly);
    * `vocab.txt` — one token per line, line number = token id, base
    * `alphabet` first then each merge's product in rank order with
    * keep-first dedup — is THIS store's own line-per-token id layout
    * (BERT-style), NOT the token→id JSON map some toolchains expect: a
    * consumer that derives ids differently must derive them from
    * merges.txt, which is self-sufficient. Deterministic by
    * construction; symbols never contain whitespace (word-level symbols
    * come from whitespace-split words, byte-level symbols from the
    * space-free byte alphabet), so the space separator is unambiguous.
    * Pass [[byteAlphabet]] for byte-level tables; for word-level tables
    * pass the corpus alphabet in a fixed order of the caller's choosing.
    */
  def exportArtifacts(spark: SparkSession, merges: Seq[Merge],
                      alphabet: Seq[String], dir: String): Unit = {
    val ordered = merges.sortBy(_.rank)
    (alphabet ++ ordered.flatMap(m => Seq(m.left, m.right))).foreach { t =>
      require(t.nonEmpty && !t.exists(_.isWhitespace),
        s"token '$t' is empty or carries whitespace — not representable " +
          "in the space-separated interchange")
    }
    val mergesTxt = ("#version: 0.2" +:
      ordered.map(m => s"${m.left} ${m.right}")).mkString("", "\n", "\n")
    // token ids dedup keep-FIRST: two merges may produce the same string
    // (e.g. (a,bc) and (ab,c) both yield "abc"), and a token→id consumer
    // collapses them anyway — emitting the duplicate line would shift
    // every id after it instead
    val vocabTxt = (alphabet ++ ordered.map(m => m.left + m.right))
      .distinct.mkString("", "\n", "\n")
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) fs.mkdirs(path)
    Seq("merges.txt" -> mergesTxt, "vocab.txt" -> vocabTxt).foreach {
      case (name, content) =>
        val out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
        try out.write(content.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Re-read an exported `merges.txt` into the merge table (rank = line
    * order). Fails loudly on a missing header or a malformed line — a
    * truncated/hand-edited artifact must not load as a silently shorter
    * table.
    */
  def readArtifacts(spark: SparkSession, dir: String): Seq[Merge] = {
    val p = new org.apache.hadoop.fs.Path(dir, "merges.txt")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    val lines = text.linesIterator.toSeq
    require(lines.headOption.exists(_.startsWith("#version:")),
      s"$p is not a merges artifact (missing #version header)")
    // every post-header line is a merge — an EMPTY line is malformed,
    // not skippable (silently dropping it would load a shorter table
    // with shifted ranks, the exact corruption this reader refuses)
    lines.drop(1).zipWithIndex.map { case (l, rank) =>
      l.split(" ", -1) match {
        case Array(left, right) if left.nonEmpty && right.nonEmpty =>
          Merge(rank, left, right)
        case _ => throw new IllegalArgumentException(
          s"$p line ${rank + 2} is not 'left right': '$l'")
      }
    }
  }
}
