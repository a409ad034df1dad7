package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining pipelines: place every document at
  * its global offset in the CONCATENATED token stream (the order given by a
  * total sort key), then map offsets to fixed-length training sequences —
  * the "concatenate and chunk" step every autoregressive-pretraining data
  * pipeline runs between curation and the trainer.
  *
  * Scale shape (same two-pass discipline as
  * [[SurrogateKey.scalable]] — a naive global-window cumulative sum would
  * serialize 100 TB through ONE partition):
  *   1. range-sort by the order key; `monotonically_increasing_id()` pins
  *      (partition id, local row number) as column arithmetic;
  *   2. per-partition WEIGHT SUMS (one row per partition) become prefix
  *      offsets via a window over #partitions rows, broadcast back;
  *   3. the within-partition running sum is a window PARTITIONED BY the
  *      range-sort partition id — parallel across partitions (its hash
  *      exchange moves each range partition as one group, never through a
  *      single task).
  * Two data shuffles total (the range sort, the pid-keyed window), both
  * fully parallel. Determinism requires the sort key to be TOTAL (tie-break
  * like any two-pass id assignment); weights must be non-negative.
  *
  * CACHE LIFETIME: the internal persist pins the partition-dependent
  * `__mid` values across the two consumers (counts + join) — same
  * correctness argument as [[SurrogateKey.scalable]], same release
  * contract: `spark.catalog.clearCache()` after the final action, or the
  * [[withStreamPositions]] bracket.
  */
object Packing {

  /** Core two-pass positions, returning BOTH the positioned frame and the
    * pinned internal relation. The handle is the caller's to release (after
    * the frame's final action) — returned explicitly so concurrent callers
    * can never see each other's persist (a shared mutable slot here would
    * let one call unpersist another's pinned relation mid-use).
    */
  private def positionsAndHandle(df: DataFrame, order: Seq[Column],
                                 weightCol: String,
                                 startCol: String): (DataFrame, DataFrame) = {
    // TwoPass.tagged: per-call literal so concurrent brackets over
    // structurally identical inputs never share (and cross-unpersist)
    // one cache entry — see the TwoPass.callTag scaladoc
    val sorted = TwoPass.tagged(df.orderBy(order: _*)
      .withColumn("__mid", monotonically_increasing_id()))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pid = shiftright(col("__mid"), 33)
    val partSums = sorted.groupBy(pid.as("__pid"))
      .agg(sum(col(weightCol)).as("__w"))
    val offsets = partSums.select(col("__pid"),
      (sum(col("__w")).over(Window.orderBy("__pid")) - col("__w")).as("__poff"))
    // running sum of STRICTLY EARLIER rows within the range partition —
    // parallel windows, one per partition id
    val wLocal = Window.partitionBy(pid).orderBy(col("__mid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = sorted
      .join(broadcast(offsets), pid === col("__pid"))
      .withColumn(startCol,
        col("__poff") + coalesce(sum(col(weightCol)).over(wLocal), lit(0L)))
      .drop("__mid", "__pid", "__poff", "__call_tag")
    (out, sorted)
  }

  /** Adds `startCol`: the row's global starting offset in the concatenated
    * weight stream (0-based; the running sum of `weightCol` over all
    * earlier rows in `order`). The internal persist stays pinned to the
    * returned frame; release it with `spark.catalog.clearCache()` after the
    * final action, or use the leak-free [[withStreamPositions]] bracket.
    */
  def streamPositions(df: DataFrame, order: Seq[Column], weightCol: String,
                      startCol: String = "stream_start"): DataFrame =
    positionsAndHandle(df, order, weightCol, startCol)._1

  /** Resource-bracket form of [[streamPositions]] (releases the internal
    * persist once `use` has executed its actions). Safe under concurrency:
    * each bracket owns its own handle.
    */
  def withStreamPositions[T](df: DataFrame, order: Seq[Column], weightCol: String,
                             startCol: String = "stream_start")
                            (use: DataFrame => T): T = {
    val (out, handle) = positionsAndHandle(df, order, weightCol, startCol)
    try use(out)
    finally handle.unpersist(blocking = false)
  }

  /** Concatenate-and-chunk: [[streamPositions]] plus the fixed-length
    * training-sequence mapping — for sequence length `seqLen`, each row
    * gets the first and last sequence index it occupies and how many
    * sequences it spans (0 for weight-0 rows: they occupy no tokens;
    * `seq_first`/`seq_last` still record where they WOULD fall, so
    * downstream slicing stays total). Integer arithmetic throughout —
    * stream offsets at 100 TB exceed a double's exact range.
    */
  def chunk(df: DataFrame, order: Seq[Column], weightCol: String,
            seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    chunkFrom(streamPositions(df, order, weightCol), weightCol, seqLen)
  }

  private def chunkFrom(positioned: DataFrame, weightCol: String,
                        seqLen: Long): DataFrame = {
    val w = col(weightCol)
    positioned
      .withColumn("seq_first", expr(s"stream_start div ${seqLen}L"))
      .withColumn("seq_last", expr(
        s"(stream_start + greatest(`$weightCol`, 1L) - 1L) div ${seqLen}L"))
      .withColumn("n_seqs",
        when(w === 0, lit(0L)).otherwise(col("seq_last") - col("seq_first") + 1L))
  }

  /** MATERIALIZED packed sequences — the rows a trainer's loader actually
    * consumes: one row per (sequence, document-slice), i.e. [[chunk]]
    * exploded over each document's occupied sequence range with the
    * boundary arithmetic resolved. Output adds to every input column:
    *   - `stream_start`  global token offset of the document;
    *   - `seq_id`        the training-sequence index (stream offset
    *                     `seq_id*seqLen ..< (seq_id+1)*seqLen`);
    *   - `offset_in_seq` where this document's slice begins inside the
    *                     sequence (0 unless the document starts mid-seq);
    *   - `offset_in_doc` where the slice begins inside the document (0
    *                     unless the document straddled in from the previous
    *                     sequence);
    *   - `len_in_seq`    slice length in tokens (> 0).
    * Weight-0 documents occupy no tokens and emit no rows. Per sequence,
    * slices ordered by `offset_in_seq` are contiguous and sum to `seqLen`
    * (except the final, possibly short, sequence) — PackingSpec pins the
    * law. The explode is row-local (output linear in total tokens /
    * seqLen), so the scale shape is [[streamPositions]]'s two shuffles plus
    * a generator — no new exchange.
    */
  def sequences(df: DataFrame, order: Seq[Column], weightCol: String,
                seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    sequencesFrom(chunk(df, order, weightCol, seqLen), weightCol, seqLen)
  }

  /** Bracket form of [[sequences]]: releases the internal persist after
    * `use` has executed its actions.
    */
  def withSequences[T](df: DataFrame, order: Seq[Column], weightCol: String,
                       seqLen: Long)(use: DataFrame => T): T = {
    val (positioned, handle) =
      positionsAndHandle(df, order, weightCol, "stream_start")
    val out = sequencesFrom(chunkFrom(positioned, weightCol, seqLen),
      weightCol, seqLen)
    try use(out)
    finally handle.unpersist(blocking = false)
  }

  private def sequencesFrom(chunked: DataFrame, weightCol: String,
                            seqLen: Long): DataFrame = {
    val w = col(weightCol)
    val seqStart = col("seq_id") * seqLen
    val sliceStart = greatest(col("stream_start"), seqStart)
    val sliceEnd = least(col("stream_start") + w, seqStart + seqLen)
    chunked.where(w > 0)
      .withColumn("seq_id", explode(sequence(col("seq_first"), col("seq_last"))))
      .withColumn("offset_in_seq", sliceStart - seqStart)
      .withColumn("offset_in_doc", sliceStart - col("stream_start"))
      .withColumn("len_in_seq", sliceEnd - sliceStart)
      .drop("seq_first", "seq_last", "n_seqs")
  }
}
