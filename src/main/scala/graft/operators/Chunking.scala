package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Fixed-size overlapping token chunking — the context-window splitter a
  * pretraining / RAG ingestion pipeline runs over every document before
  * tokenization proper (reference scope: the `documents` extension surface;
  * the stride-window rule is the standard `while start < len: emit
  * tokens[start:start+size]; start += size - overlap` loop re-expressed as
  * column algebra).
  *
  * Scale shape: tokenize → `sequence` of chunk starts → `posexplode` — all
  * narrow per-row transforms inside one whole-stage-codegen span. No
  * shuffle, no state, no driver involvement; at 100 TB this is a pure map
  * over the corpus and parallelism is exactly the scan parallelism. Output
  * fan-out is bounded by ceil(tokens / stride) rows per document, each
  * carrying only its own slice of the token array (the source text column
  * is NOT duplicated per chunk).
  */
object Chunking {

  /** Explode `textCol` into overlapping whitespace-token chunks.
    *
    * Emits one row per chunk with the pass-through columns `keep`, plus:
    *   - `chunk_id`    0-based ordinal of the chunk within its document
    *   - `start_tok`   0-based token offset of the chunk start
    *   - `n_tokens`    tokens in this chunk (= `size` except the tail)
    *   - `chunk_text`  the chunk tokens re-joined with single spaces
    *
    * Documents whose normalized text is empty produce no rows. `size` must
    * be positive and `overlap` in [0, size) so the stride is positive and
    * every token lands in at least one chunk.
    */
  def chunkTokens(df: DataFrame, textCol: Column, keep: Seq[String],
                  size: Int, overlap: Int): DataFrame = {
    require(size > 0, s"chunk size must be positive: $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size): overlap=$overlap size=$size")
    val stride = size - overlap
    val norm = TextFunctions.normalizeWs(textCol)
    // last chunk start = the largest multiple of stride < n_tokens; the
    // `sequence(0, n-1, stride)` bound enumerates exactly the starts the
    // imperative stride loop would visit (empty docs are filtered out)
    df.withColumn("__toks", split(norm, " "))
      .withColumn("__n",
        when(length(norm) === 0, lit(0))
          .otherwise(org.apache.spark.sql.functions.size(col("__toks"))))
      .filter(col("__n") > 0)
      .withColumn("__starts", sequence(lit(0), col("__n") - 1, lit(stride)))
      .select(keep.map(col) :+ col("__toks") :+
        posexplode(col("__starts")).as(Seq("chunk_id", "start_tok")): _*)
      .withColumn("__slice", slice(col("__toks"), col("start_tok") + 1, lit(size)))
      .select(keep.map(col) ++ Seq(
        col("chunk_id"), col("start_tok"),
        org.apache.spark.sql.functions.size(col("__slice")).as("n_tokens"),
        array_join(col("__slice"), " ").as("chunk_text")): _*)
  }
}
