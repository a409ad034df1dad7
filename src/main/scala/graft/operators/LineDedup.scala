package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level LINE deduplication — the C4-style boilerplate cut (drop
  * every line that repeats across enough documents: nav bars, cookie
  * banners, "all rights reserved" footers) that sits between exact
  * document dedup (d01) and near-dup document removal (d02–d07) in a
  * pretraining curation pipeline. t11's boilerplate-n-gram MINING measures
  * what this operator REMOVES.
  *
  * Scale shape: lines explode row-locally; the cross-document frequency
  * count shuffles 8-byte line hashes first (never full text), then
  * recounts exactly — by (hash, normalized text) — over only the
  * candidate heavy hitters, so line text shuffles only for the tiny
  * Zipf-headed boilerplate set and a 64-bit hash collision can never
  * remove an innocent line (see the phase comments); the heavy-hitter
  * relation rides a left-anti join (Catalyst broadcasts it when small —
  * at 100 TB the count side is a combiner-friendly partial aggregate,
  * the same contract as d01's fingerprint groupBy); reassembly is one
  * groupBy on the document id with an in-row sort of (pos, line)
  * structs — position arithmetic, no window.
  *
  * CONTINUOUS ingest: the statistics decompose over any partition of the
  * corpus into batches (each document lives in exactly ONE batch, so
  * per-batch distinct-doc counts SUM to the corpus count) —
  * [[lineStats]] is the per-batch increment, [[appendLineStats]] lands
  * it as an idempotent `batch_id` fragment of a persisted stats
  * relation ([[graft.streaming.StreamOps.lineStatsStream]] maintains it
  * per micro-batch), and [[dedupLinesWithStats]] applies the cut
  * against the accumulated relation — bit-identical to the one-shot
  * [[dedupLines]] over the same corpus (StreamingSpec differential;
  * s10 puts the composition under the oracle gate).
  */
object LineDedup {

  /** Normalize-hook preset: Unicode-NFC before the default lower+trim, so
    * composed and decomposed byte forms of the same visible line hash to
    * one line-stats key (pass as `normalize = LineDedup.nfcNormalize`).
    */
  val nfcNormalize: Column => Column =
    c => lower(trim(graft.functions.TextFunctions.normalizeUnicode(c)))

  /** Exploded per-line frame: (idCol, __pos, __line, __norm, __h, __blank). */
  private def explodeLines(df: DataFrame, idCol: String, textCol: String,
                           normalize: Column => Column): DataFrame =
    df.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__norm", normalize(col("__line")))
      .withColumn("__h", xxhash64(col("__norm")))
      .withColumn("__blank", trim(col("__line")) === "")

  /** Per-corpus-slice line statistics: one row per (line_hash, line_norm)
    * with the DISTINCT-document count. Exact by construction (keyed by
    * hash AND text, so a 64-bit collision splits into two rows instead of
    * merging counts) and additive across disjoint document batches —
    * the increment a continuous ingest accumulates.
    */
  def lineStats(df: DataFrame, idCol: String, textCol: String,
                normalize: Column => Column = c => lower(trim(c))): DataFrame =
    explodeLines(df, idCol, textCol, normalize)
      .filter(!col("__blank"))
      .groupBy(col("__h").as("line_hash"), col("__norm").as("line_norm"))
      .agg(countDistinct(col(idCol)).as("n_docs"))

  // ------------------------------------------------ persisted stats store
  // Two storage modes share the same append API:
  //   - BARE mode (no meta file): fragments land as `batch_id` partitions
  //     directly under `statsDir` — the simple two-installment batch shape
  //     (s10's staging), no maintenance story;
  //   - PROTOCOL mode ([[initStats]] ran, or [[graft.streaming.StreamOps
  //     .lineStatsStream]] initialized it): the relation lives in
  //     epoch-suffixed directories under the shared
  //     [[graft.sources.StoredIndex]] generation-CAS protocol, giving the
  //     continuous ingest what the dedup index has — [[compactStats]]
  //     folds the per-batch fragments into ONE summed partition in a
  //     fresh epoch (crash-safe swap, grace-period readers), and the
  //     `compacted_through` watermark makes an at-least-once replay of an
  //     already-folded batch a NO-OP instead of a double count (its
  //     fragment partition no longer exists to overwrite).

  private def store(dir: String) = graft.sources.AdditiveStats.Store(dir,
    Seq("line_hash", "line_norm"), "n_docs",
    "line_hash bigint, line_norm string, n_docs bigint, batch_id bigint")

  /** Initialize an EMPTY protocol-managed stats store at `dir` (meta
    * only; the relation materializes with the first append). Idempotent
    * on a fresh dir only — an existing store fails the CAS.
    */
  def initStats(spark: org.apache.spark.sql.SparkSession, dir: String): Unit =
    graft.sources.AdditiveStats.init(spark, store(dir))

  /** Number of per-batch append fragments in the live epoch (pure
    * directory listing; the folded `batch_id=-1` partition is not a
    * fragment). 0 for a bare-mode or empty store.
    */
  def statsFragmentCount(spark: org.apache.spark.sql.SparkSession,
                         dir: String): Int =
    graft.sources.AdditiveStats.fragmentCount(spark, store(dir))

  /** The accumulated stats relation — all fragments (and the folded
    * partition) of the live epoch in protocol mode, the bare directory
    * otherwise; an initialized-but-never-appended store reads as empty.
    */
  def readStats(spark: org.apache.spark.sql.SparkSession,
                dir: String): DataFrame =
    graft.sources.AdditiveStats.read(spark, store(dir))

  /** Land one batch's [[lineStats]] as the `batch_id = <batchId>`
    * partition of the persisted stats relation — the line instantiation
    * of [[graft.sources.AdditiveStats.append]] (idempotent replay,
    * CAS-published in protocol mode, `compacted_through` no-op skip).
    */
  def appendLineStats(batch: DataFrame, idCol: String, textCol: String,
                      statsDir: String, batchId: Long,
                      normalize: Column => Column = c => lower(trim(c))): Unit =
    graft.sources.AdditiveStats.append(
      lineStats(batch, idCol, textCol, normalize), store(statsDir), batchId)

  /** Fold every fragment of the live epoch into ONE summed
    * `batch_id = -1` partition in a fresh epoch — see
    * [[graft.sources.AdditiveStats.compact]] (crash-safe CAS swap, grace
    * readers, `compacted_through` watermark advance).
    */
  def compactStats(spark: org.apache.spark.sql.SparkSession,
                   dir: String): Unit =
    graft.sources.AdditiveStats.compact(spark, store(dir))

  /** The heavy-hitter (boilerplate) relation from accumulated per-batch
    * stats, two-phase like the one-shot path: phase 1 sums the 8-byte
    * hash counts to find candidates, phase 2 recounts exactly by
    * (hash, text) over only those — identical collision safety, and the
    * line TEXT only ever aggregates for the Zipf head.
    */
  private def boilerFromStats(stats: DataFrame, minDocs: Int): DataFrame = {
    val heavyHashes = stats
      .groupBy("line_hash").agg(sum(col("n_docs")).as("__d"))
      .filter(col("__d") >= minDocs)
      .select("line_hash")
    stats.join(heavyHashes, Seq("line_hash"), "left_semi")
      .groupBy("line_hash", "line_norm")
      .agg(sum(col("n_docs")).as("__d"))
      .filter(col("__d") >= minDocs)
      .select(col("line_hash").as("__h"), col("line_norm").as("__norm"))
  }

  /** Cut `lines` (an [[explodeLines]] frame) against the boilerplate
    * relation and reassemble documents — the shared back half of both
    * dedup forms; see [[dedupLines]] for the memory contract.
    */
  private def rebuildWithout(df: DataFrame, lines: DataFrame,
                             boiler: DataFrame, idCol: String,
                             textCol: String, maxLines: Int,
                             truncFlagCol: String): DataFrame = {
    val kept = lines.join(boiler, Seq("__h", "__norm"), "left_anti")
    // collect_list skips nulls, so the `when` guard caps the per-group
    // buffer at maxLines structs — the memory contract; max(__pos)
    // rides the same aggregate to detect that the cap actually cut
    val rebuilt = kept.groupBy(col(idCol))
      .agg(
        concat_ws("\n",
          transform(
            array_sort(collect_list(when(col("__pos") < maxLines,
              struct(col("__pos"), col("__line"))))),
            s => s.getField("__line"))).as(textCol),
        (max(col("__pos")) >= maxLines).as("__cut"))
    val joined = df.drop(textCol)
      .join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col(textCol), lit("")))
    if (truncFlagCol.isEmpty) joined.drop("__cut")
    else joined.withColumn(truncFlagCol, coalesce(col("__cut"), lit(false)))
      .drop("__cut")
  }

  /** Remove every line whose NORMALIZED form (default: lowercased,
    * whitespace-trimmed) appears in at least `minDocs` distinct documents,
    * preserving the surviving lines' original text and order. Documents
    * whose every line is boilerplate come back with an empty string (the
    * caller's length/quality gate drops them — this operator never drops
    * rows, so joins against it stay total). Blank lines are kept verbatim:
    * they carry document structure, and counting them as "boilerplate"
    * would destroy every paragraph break in the corpus.
    *
    * MEMORY CONTRACT: reassembly buffers at most `maxLines` (pos, line)
    * structs per document — the per-group `collect_list` state is the
    * one place a single pathological document (a crawler artifact with
    * tens of millions of lines) could otherwise blow an executor at
    * corpus scale. A document over the cap keeps its first `maxLines`
    * lines (post-dedup, original order) and is TRUNCATED, marked in the
    * `truncFlagCol` boolean column when that name is non-empty (empty =
    * no extra column; callers that must not lose tail text should
    * pre-split such documents — they are almost always machine-generated
    * junk a quality gate drops anyway). The counting phases are
    * streaming-safe partial aggregates and ignore the cap, so
    * boilerplate statistics never shift with it.
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 minDocs: Int = 3,
                 normalize: Column => Column = c => lower(trim(c)),
                 maxLines: Int = 1 << 20,
                 truncFlagCol: String = ""): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    require(maxLines >= 1, s"maxLines must be >= 1, got $maxLines")
    val lines = explodeLines(df, idCol, textCol, normalize)
    // two-phase heavy-hitter count, COLLISION-SAFE at corpus scale: phase 1
    // counts by 8-byte hash only (the cheap shuffle) to find CANDIDATE
    // heavy hashes; phase 2 recounts exactly — by (hash, normalized text) —
    // over only the candidate lines, so a 64-bit birthday collision between
    // an innocent unique line and a boilerplate line (expected at billions
    // of distinct lines) can neither inflate a count past the threshold
    // nor drag the innocent line into the removal set. Line TEXT shuffles
    // only for candidate heavy hitters — a tiny, Zipf-headed relation.
    val heavyHashes = lines.filter(!col("__blank"))
      .groupBy("__h")
      .agg(countDistinct(col(idCol)).as("__d"))
      .filter(col("__d") >= minDocs)
      .select("__h")
    val boiler = lines.filter(!col("__blank"))
      .join(heavyHashes, Seq("__h"), "left_semi")
      .groupBy("__h", "__norm")
      .agg(countDistinct(col(idCol)).as("__d"))
      .filter(col("__d") >= minDocs)
      .select("__h", "__norm")
    rebuildWithout(df, lines, boiler, idCol, textCol, maxLines, truncFlagCol)
  }

  /** [[dedupLines]] with the frequency statistics supplied EXTERNALLY —
    * the read side of the continuous-ingest composition: `stats` is the
    * accumulated per-batch relation ([[appendLineStats]] fragments, all
    * batches), summed per line and thresholded here. Because each
    * document lives in exactly one batch, the summed counts equal the
    * one-shot corpus counts, so cutting a corpus against its own
    * accumulated stats is bit-identical to [[dedupLines]]. Same memory
    * contract and flag semantics as the one-shot form.
    */
  def dedupLinesWithStats(df: DataFrame, idCol: String, textCol: String,
                          stats: DataFrame, minDocs: Int = 3,
                          normalize: Column => Column = c => lower(trim(c)),
                          maxLines: Int = 1 << 20,
                          truncFlagCol: String = ""): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    require(maxLines >= 1, s"maxLines must be >= 1, got $maxLines")
    val lines = explodeLines(df, idCol, textCol, normalize)
    rebuildWithout(df, lines, boilerFromStats(stats, minDocs),
      idCol, textCol, maxLines, truncFlagCol)
  }
}
