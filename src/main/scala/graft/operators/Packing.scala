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

  /** Adds `startCol`: the row's global starting offset in the concatenated
    * weight stream (0-based; the running sum of `weightCol` over all
    * earlier rows in `order`).
    */
  def streamPositions(df: DataFrame, order: Seq[Column], weightCol: String,
                      startCol: String = "stream_start"): DataFrame = {
    val sorted = df.orderBy(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
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
      .drop("__mid", "__pid", "__poff")
    lastCached.set(sorted)
    out
  }

  private val lastCached =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  /** Resource-bracket form of [[streamPositions]] (releases the internal
    * persist once `use` has executed its actions).
    */
  def withStreamPositions[T](df: DataFrame, order: Seq[Column], weightCol: String,
                             startCol: String = "stream_start")
                            (use: DataFrame => T): T = {
    val out = streamPositions(df, order, weightCol, startCol)
    val handle = lastCached.getAndSet(null)
    try use(out)
    finally if (handle != null) handle.unpersist(blocking = false)
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
    val w = col(weightCol)
    streamPositions(df, order, weightCol)
      .withColumn("seq_first", expr(s"stream_start div ${seqLen}L"))
      .withColumn("seq_last", expr(
        s"(stream_start + greatest(`$weightCol`, 1L) - 1L) div ${seqLen}L"))
      .withColumn("n_seqs",
        when(w === 0, lit(0L)).otherwise(col("seq_last") - col("seq_first") + 1L))
  }
}
