package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.functions.TextFunctions

/** Inverted-index retrieval over a document corpus — the search surface a
  * curation/eval stack needs next to dedup and ANN: build posting lists once,
  * then answer keyword and ranked queries WITHOUT ever rescanning document
  * text.
  *
  * Index = data. The posting relation (term, id, tf) is a plain DataFrame:
  * persist it as parquet (optionally `partitionBy("term")` bucketed for
  * pruned probes) and it IS the inverted index. It is additive over disjoint
  * document batches — each doc contributes rows to exactly one batch, so
  * incremental ingest is a parquet append and `df` stays derivable as the
  * per-term posting count (the same additivity contract
  * `sources/AdditiveStats` formalizes for line/span stats).
  *
  * Scale shape: tokenize+count is scan-stage column work plus ONE (term, id)
  * shuffle; queries filter the posting relation to the query's terms — a
  * handful of posting lists, never the corpus — and every per-term relation
  * (document frequencies, corpus stats) is broadcast-sized by construction.
  *
  * Determinism: BM25 sums per-term float scores through DECIMAL(18,9) in the
  * [[graft.operators.NgramLm]] idiom, and uses k1 = 1.5, b = 0.75 — constants
  * exact in binary64 — so an independent engine replaying the same arithmetic
  * hash-matches bit-for-bit.
  */
object Retrieval {

  /** (id, term) token stream: lowercased whitespace tokens of the
    * whitespace-normalized text; empty documents contribute no rows.
    */
  def termStream(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        explode(split(lower(TextFunctions.normalizeWs(col(textCol))), " ")).as("term"))
      .filter(length(col("term")) > 0)

  /** POSITIONAL posting relation (term, id, pos) — the phrase-capable
    * index tier (what Lucene stores as term positions): pos is the
    * 1-based token index in the same tokenization as [[termStream]].
    * Still additive over disjoint document batches.
    */
  def positionalPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode(split(lower(TextFunctions.normalizeWs(col(textCol))), " ")))
      .select(col(idCol), col("col").as("term"), (col("pos") + 1).as("pos"))
      .filter(length(col("term")) > 0)

  /** EXACT PHRASE search on the positional index: documents (with
    * occurrence counts) containing the words of `phrase` at consecutive
    * positions. Slot algebra handles repeated words correctly: slot i of
    * the phrase contributes its term's postings shifted by i, and a
    * (doc, start) pair where ALL k distinct slots land is a phrase
    * occurrence — a (doc, start) aggregate over k position-shifted
    * pruned posting lists, the same bounded-shuffle shape as
    * [[searchAll]] (document text never participates).
    */
  def phraseSearch(posPost: DataFrame, idCol: String,
                   phrase: Seq[String]): DataFrame = {
    val words = phrase.map(_.toLowerCase)
    require(words.nonEmpty, "phraseSearch needs at least one word")
    val slots = words.zipWithIndex.map { case (w, i) =>
      posPost.filter(col("term") === w)
        .select(col(idCol), (col("pos") - i).as("start"), lit(i).as("slot"))
    }.reduce(_ unionByName _)
    slots.groupBy(col(idCol), col("start"))
      .agg(count_distinct(col("slot")).as("__k"))
      .filter(col("__k") === words.length)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** Posting-list relation (term, id, tf) — the inverted index. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    termStream(docs, idCol, textCol)
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"))

  /** Document frequency per term, derived from a posting relation. */
  def documentFrequencies(post: DataFrame): DataFrame =
    post.groupBy("term").agg(count(lit(1)).as("df"))

  /** Conjunctive (AND) search: ids of documents containing ALL query terms.
    * Posting lists are intersected by count-match — filter to the query's
    * terms (a scan-stage prune of the posting relation), group by document,
    * demand the full distinct-term count. One bounded shuffle, no text.
    */
  def searchAll(post: DataFrame, idCol: String, terms: Seq[String]): DataFrame = {
    val qt = terms.map(_.toLowerCase).distinct
    require(qt.nonEmpty, "searchAll needs at least one query term")
    post.filter(col("term").isin(qt: _*))
      .groupBy(col(idCol))
      .agg(count_distinct(col("term")).as("__nterms"))
      .filter(col("__nterms") === qt.size)
      .select(col(idCol))
  }

  /** BM25 top-k over a prebuilt posting relation + per-document token
    * lengths (`dl`, one row per document incl. empty ones). Classic
    * Robertson idf `ln(1 + (N - df + 0.5) / (df + 0.5))`; k1 = 1.5,
    * b = 0.75 fixed (binary64-exact, see object doc). Only documents
    * containing ≥ 1 query term are scored; ties broken by ascending id.
    *
    * Plan: posting prune to |terms| lists → join broadcast df/stats →
    * one doc-keyed shuffle for `dl` + the score fold → TakeOrdered(k).
    */
  def bm25TopK(post: DataFrame, docLens: DataFrame, idCol: String,
               terms: Seq[String], k: Int): DataFrame = {
    val qt = terms.map(_.toLowerCase).distinct
    require(qt.nonEmpty, "bm25TopK needs at least one query term")
    val stats = docLens.agg(count(lit(1)).as("__n"), sum("dl").as("__tdl"))
    val dfs = documentFrequencies(post.filter(col("term").isin(qt: _*)))
    val scored = post.filter(col("term").isin(qt: _*))
      .join(broadcast(dfs), "term")
      .join(docLens, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("__avgdl", col("__tdl").cast(DoubleType) / col("__n").cast(DoubleType))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n").cast(DoubleType) - col("df").cast(DoubleType) + lit(0.5)) /
          (col("df").cast(DoubleType) + lit(0.5))))
      .withColumn("__den",
        col("tf").cast(DoubleType) +
          (lit(1.5) * (lit(0.25) + ((lit(0.75) * col("dl").cast(DoubleType)) / col("__avgdl")))))
      .withColumn("__tscore",
        (col("__idf") * (col("tf").cast(DoubleType) * lit(2.5))) / col("__den"))
    scored.groupBy(col(idCol))
      .agg(round(sum(col("__tscore").cast(DecimalType(18, 9))).cast(DoubleType), 6).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }

  /** TF-IDF SPARSE-VECTOR cosine top-k: the documents most similar to a
    * query document, computed entirely on the inverted index — the
    * sparse-vector sibling of the dense ANN family (`ext/PqAnn` et al.):
    * no embeddings, the posting relation IS the vector store. Weights
    * w(t, d) = tf · ln(N / df); cosine = Σ w_q·w_d / (‖q‖·‖d‖), products
    * folded in DECIMAL(28,12) so the double scores replay bit-for-bit on
    * any engine (the BM25 determinism recipe one formula over).
    *
    * Plan: the query document's weighted terms are a broadcast relation;
    * the dot products are ONE semi-pruned doc-keyed aggregate over the
    * |query-terms| posting lists (document text and non-shared terms
    * never shuffle); norms are a posting-relation fold reusable across
    * queries; TakeOrdered(k), no global sort. At 100 TB this runs off
    * the persisted posting store with the term filter pushed into the
    * scan (the s15 probe shape).
    */
  def tfidfCosineTopK(post: DataFrame, idCol: String, queryDoc: Long,
                      k: Int): DataFrame = {
    val n = post.agg(count_distinct(col(idCol)).as("__n"))
    val w = post.join(broadcast(documentFrequencies(post)), "term")
      .crossJoin(broadcast(n))
      .select(col("term"), col(idCol),
        (col("tf").cast(DoubleType) *
          log(col("__n").cast(DoubleType) / col("df").cast(DoubleType))).as("__w"))
    val norms = w.groupBy(col(idCol))
      .agg(sqrt(sum((col("__w") * col("__w")).cast(DecimalType(28, 12)))
        .cast(DoubleType)).as("__norm"))
    val q = w.filter(col(idCol) === queryDoc)
      .select(col("term"), col("__w").as("__wq"))
    val qn = norms.filter(col(idCol) === queryDoc)
      .select(col("__norm").as("__qnorm"))
    w.join(broadcast(q), "term")
      .filter(col(idCol) =!= queryDoc)
      .groupBy(col(idCol))
      .agg(sum((col("__w") * col("__wq")).cast(DecimalType(28, 12)))
        .cast(DoubleType).as("__dot"))
      .join(norms, Seq(idCol))
      .crossJoin(broadcast(qn))
      .select(col(idCol),
        round(col("__dot") / (col("__norm") * col("__qnorm")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Per-document token length relation (id, dl) — one row per document,
    * empty documents included with dl = 0. Feed to [[bm25TopK]].
    */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol))
      .join(termStream(docs, idCol, textCol).groupBy(idCol).agg(count(lit(1)).as("__dl")),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__dl"), lit(0L)).as("dl"))

  // ------------------------------------------------------------------
  // Persisted posting store — the posting relation is a textbook additive
  // count relation (tf per (term, doc) sums over disjoint document batches
  // because each doc lives in exactly one batch), so continuous index
  // maintenance rides sources/AdditiveStats unchanged: idempotent batch_id
  // fragments, CAS-published compaction folds, replay watermark, stream
  // identity pin. Document ids must be BIGINT (the store schema is fixed
  // per idCol name).
  // ------------------------------------------------------------------

  import graft.sources.AdditiveStats

  def postingStore(dir: String, idCol: String = "doc_id"): AdditiveStats.Store =
    AdditiveStats.Store(dir, Seq("term", idCol), "tf",
      s"term string, $idCol bigint, tf bigint, batch_id bigint")

  /** Initialize an empty protocol-managed posting store. */
  def initPostings(spark: org.apache.spark.sql.SparkSession, dir: String,
                   idCol: String = "doc_id"): Unit =
    AdditiveStats.init(spark, postingStore(dir, idCol))

  /** Per-batch fragments in the live epoch (0 for bare/empty stores). */
  def postingFragmentCount(spark: org.apache.spark.sql.SparkSession, dir: String,
                           idCol: String = "doc_id"): Int =
    AdditiveStats.fragmentCount(spark, postingStore(dir, idCol))

  /** Land one batch's [[postings]] as an idempotent `batch_id` fragment. */
  def appendPostings(batch: DataFrame, idCol: String, textCol: String,
                     dir: String, batchId: Long): Unit =
    AdditiveStats.append(postings(batch, idCol, textCol),
      postingStore(dir, idCol), batchId)

  /** Fold fragments into one summed partition in a fresh epoch. */
  def compactPostings(spark: org.apache.spark.sql.SparkSession, dir: String,
                      idCol: String = "doc_id"): Unit =
    AdditiveStats.compact(spark, postingStore(dir, idCol))

  /** The accumulated posting relation (term, id, tf) — fragment rows for
    * the same key sum (a no-op for disjoint batches, exact under folded
    * partitions), so searches over it equal searches over a one-shot
    * [[postings]] build of the full corpus.
    */
  def readPostings(spark: org.apache.spark.sql.SparkSession, dir: String,
                   idCol: String = "doc_id"): DataFrame =
    AdditiveStats.read(spark, postingStore(dir, idCol))
      .groupBy(col("term"), col(idCol))
      .agg(sum("tf").as("tf"))
}
