package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document EXACT-SUBSTRING (token-span) deduplication — the
  * sequence-level cut of "Deduplicating Training Data Makes Language
  * Models Better" (Lee et al., 2022): any run of `n` consecutive tokens
  * that appears verbatim in ≥ `minDocs` distinct documents is a
  * duplicated span, and a curation pipeline removes the covered tokens
  * rather than whole documents. Sits between line-level boilerplate
  * removal ([[LineDedup]] — fixed line boundaries) and document-level
  * near-dup removal ([[graft.ext.NearDup]] — whole-doc granularity):
  * this operator catches quotes, licence blocks and templated passages
  * embedded mid-document that neither of those sees.
  *
  * Scale shape (mirrors [[LineDedup]]'s two-phase heavy-hitter count):
  * windows explode row-locally (one row per token position — the same
  * amplification as [[graft.ext.NearDup.shingles]], documented there);
  * the cross-document frequency pass shuffles only an 8-byte window
  * HASH, then recounts exactly by (hash, window text) over the
  * candidate heavy hitters alone, so full window text shuffles only
  * for the tiny duplicated subset and a 64-bit collision can never
  * delete an innocent span. Coverage and removal are per-document
  * column algebra: duplicated start positions fold into merged
  * intervals with one `aggregate` HOF (no position explode, no
  * window function), and removal filters the token array in-row.
  * Nothing in the plan is ever sized by the corpus on a single node.
  */
object SpanDedup {

  /** Whitespace tokens of the normalized text (empty strings dropped;
    * empty text → empty array, not `[""]`).
    */
  private def toks(textCol: Column): Column =
    filter(split(graft.functions.TextFunctions.normalizeWs(textCol), " "),
      t => t =!= "")

  /** The keys of `df` whose group spans ≥ `minDocs` DISTINCT `idCol`
    * values — the candidate-promotion predicate of every span phase.
    * For minDocs = 2 (the operators' default and the only value the
    * registered queries use), `countDistinct(id) >= 2` is rewritten to
    * `min(id) <> max(id)` — exactly equivalent for any orderable id
    * (both ignore nulls; 0 or 1 distinct values ⇔ min = max), and ONE
    * partial-aggregated shuffle instead of the distinct expansion's two
    * (Spark plans a single distinct as groupBy(key, id) THEN groupBy(key),
    * two full exchanges of the window relation). On d18's token-level
    * relations those double shuffles were the dominant cost (round 16:
    * the d18 compute cut the r15 verdict prescribed). General minDocs
    * keeps the exact distinct count.
    */
  private def sharedKeys(df: DataFrame, keyCols: Seq[String], idCol: String,
                         minDocs: Int): DataFrame = {
    val g = df.groupBy(keyCols.map(col): _*)
    val kept =
      if (minDocs == 2)
        g.agg(min(col(idCol)).as("__mn"), max(col(idCol)).as("__mx"))
          .filter(col("__mn") =!= col("__mx"))
      else
        g.agg(countDistinct(col(idCol)).as("__nd"))
          .filter(col("__nd") >= minDocs)
    kept.select(keyCols.map(col): _*)
  }

  /** Exploded window frame: (idCol, __start, __w) — one row per 0-based
    * token position with the n-token window string starting there.
    * Documents shorter than `n` tokens contribute no windows.
    */
  private def windows(df: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame =
    df.select(col(idCol), toks(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), size(col("__toks")) - n),
          s => array_join(slice(col("__toks"), s + 1, lit(n)), " ")))
        .as(Seq("__start", "__w")))

  /** Duplicated-span start positions: (idCol, __start) for every token
    * position whose n-token window appears in ≥ `minDocs` distinct
    * documents. Two phases — candidate hashes by 8-byte count, then an
    * exact (hash, text) recount over candidates only.
    */
  def dupStarts(df: DataFrame, idCol: String, textCol: String,
                n: Int, minDocs: Int = 2): DataFrame = {
    val w = windows(df, idCol, textCol, n)
      .withColumn("__h", xxhash64(col("__w")))
    // Phase 1: hash-only heavy hitters — the only corpus-wide shuffle,
    // and it carries 8 bytes per window, combiner-friendly.
    val candidates = sharedKeys(w, Seq("__h"), idCol, minDocs)
    // Phase 2: exact recount by (hash, text), candidates only — a hash
    // collision splits into distinct (h, w) rows instead of merging.
    val pruned = w.join(candidates, "__h")
    val dupKeys = sharedKeys(pruned, Seq("__h", "__w"), idCol, minDocs)
    pruned.join(dupKeys, Seq("__h", "__w"))
      .select(col(idCol), col("__start"))
  }

  /** Merged-interval fold: total tokens covered by the union of
    * [s, s+n) over the SORTED start positions `starts` — one pass, no
    * explode. Sorted ascending means each interval's end `s+n` is ≥ the
    * running end, so the uncovered increment is `(s+n) − max(end, s)`.
    */
  private def coveredTokens(starts: Column, n: Int): Column =
    aggregate(sort_array(starts),
      struct(lit(-1L).as("e"), lit(0L).as("cov")),
      (acc, s) => struct(
        (s + n).cast("long").as("e"),
        (acc.getField("cov") + (s + n) - greatest(acc.getField("e"), s.cast("long")))
          .as("cov")),
      acc => acc.getField("cov"))

  /** Per-document duplicated-span coverage report: token/window counts,
    * the number of duplicated window positions, and the number of tokens
    * covered by the union of duplicated spans. Every input document gets
    * a row (zeroes when nothing is duplicated).
    */
  def coverage(df: DataFrame, idCol: String, textCol: String,
               n: Int, minDocs: Int = 2): DataFrame = {
    val base = df.select(col(idCol), size(toks(col(textCol))).as("n_tokens"))
      .withColumn("n_windows",
        greatest(lit(0), col("n_tokens") - (n - 1)).cast("long"))
    val per = dupStarts(df, idCol, textCol, n, minDocs)
      .groupBy(idCol)
      .agg(count(lit(1)).as("dup_windows"),
        coveredTokens(collect_list(col("__start")), n).as("covered_tokens"))
    base.join(per, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"),
        col("n_windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
  }

  // ------------------------------------------------ persisted span stats
  // CONTINUOUS ingest: window frequencies decompose over any partition of
  // the corpus into batches (each document lives in exactly ONE batch, so
  // per-batch distinct-doc counts SUM to the corpus count) — the same
  // additive contract as [[LineDedup]]'s line stats, and the store IS the
  // same implementation: [[graft.sources.AdditiveStats]] (idempotent
  // batch_id fragments, CAS-published appends, crash-safe compaction
  // folds, compacted_through replay watermark). The window size `n` is
  // part of the store's identity — the caller uses one n per store
  // (same contract as the line store's `normalize`).

  private def store(dir: String) = graft.sources.AdditiveStats.Store(dir,
    Seq("w_hash", "w_text"), "n_docs",
    "w_hash bigint, w_text string, n_docs bigint, batch_id bigint")

  /** Per-corpus-slice window statistics: one row per (window hash,
    * window text) with the DISTINCT-document count — exact (keyed by
    * hash AND text, a 64-bit collision splits instead of merging) and
    * additive across disjoint document batches.
    */
  def spanStats(df: DataFrame, idCol: String, textCol: String,
                n: Int): DataFrame =
    windows(df, idCol, textCol, n)
      .withColumn("__h", xxhash64(col("__w")))
      .groupBy(col("__h").as("w_hash"), col("__w").as("w_text"))
      .agg(countDistinct(col(idCol)).as("n_docs"))

  /** Initialize an empty protocol-managed span-stats store. */
  def initSpanStats(spark: org.apache.spark.sql.SparkSession,
                    dir: String): Unit =
    graft.sources.AdditiveStats.init(spark, store(dir))

  /** Per-batch fragments in the live epoch (0 for bare/empty stores). */
  def spanStatsFragmentCount(spark: org.apache.spark.sql.SparkSession,
                             dir: String): Int =
    graft.sources.AdditiveStats.fragmentCount(spark, store(dir))

  /** The accumulated span-stats relation (all fragments + folds). */
  def readSpanStats(spark: org.apache.spark.sql.SparkSession,
                    dir: String): DataFrame =
    graft.sources.AdditiveStats.read(spark, store(dir))

  /** Land one batch's [[spanStats]] as an idempotent `batch_id`
    * fragment ([[graft.sources.AdditiveStats.append]] semantics).
    */
  def appendSpanStats(batch: DataFrame, idCol: String, textCol: String,
                      statsDir: String, n: Int, batchId: Long): Unit =
    graft.sources.AdditiveStats.append(
      spanStats(batch, idCol, textCol, n), store(statsDir), batchId)

  /** Fold fragments into one summed partition in a fresh epoch. */
  def compactSpanStats(spark: org.apache.spark.sql.SparkSession,
                       dir: String): Unit =
    graft.sources.AdditiveStats.compact(spark, store(dir))

  /** Duplicated window keys from ACCUMULATED stats — two-phase like the
    * one-shot path: sum the 8-byte hash counts to find candidates, then
    * recount exactly by (hash, text) over candidates only (identical
    * collision safety; fragment rows for the same window sum here).
    */
  private def dupKeysFromStats(stats: DataFrame, minDocs: Int): DataFrame = {
    val heavy = stats.groupBy("w_hash")
      .agg(sum(col("n_docs")).as("__d"))
      .filter(col("__d") >= minDocs)
      .select("w_hash")
    stats.join(heavy, Seq("w_hash"), "left_semi")
      .groupBy("w_hash", "w_text")
      .agg(sum(col("n_docs")).as("__d"))
      .filter(col("__d") >= minDocs)
      .select(col("w_hash").as("__h"), col("w_text").as("__w"))
  }

  /** Duplicated-span start positions resolved against an EXTERNAL stats
    * relation — the read side of the continuous ingest. Because each
    * document lives in exactly one batch, summed fragment counts equal
    * the one-shot corpus counts, so cutting a corpus against its own
    * accumulated stats is bit-identical to [[dupStarts]].
    */
  def dupStartsWithStats(df: DataFrame, idCol: String, textCol: String,
                         stats: DataFrame, n: Int,
                         minDocs: Int = 2): DataFrame =
    windows(df, idCol, textCol, n)
      .withColumn("__h", xxhash64(col("__w")))
      .join(dupKeysFromStats(stats, minDocs), Seq("__h", "__w"))
      .select(col(idCol), col("__start"))

  /** [[removeSpans]] against accumulated stats (see
    * [[dupStartsWithStats]] for the equivalence contract).
    */
  def removeSpansWithStats(df: DataFrame, idCol: String, textCol: String,
                           stats: DataFrame, n: Int,
                           minDocs: Int = 2): DataFrame =
    removeByStarts(df, idCol, textCol,
      dupStartsWithStats(df, idCol, textCol, stats, n, minDocs), n)

  /** Contaminated-span start positions: (idCol, __start) for every token
    * position whose n-token window appears VERBATIM anywhere in the
    * reference corpus `ref` (an eval/benchmark set) — the GPT-3/PaLM
    * style n-gram decontamination predicate, at span rather than
    * document granularity (d08/d09 drop whole documents; this surgically
    * excises the overlapping tokens). The reference side reduces to its
    * DISTINCT window strings — benchmark-sized, so Catalyst broadcasts
    * it and the semi-join (hash AND text, collision-safe) runs map-side
    * inside the corpus scan stage: zero corpus shuffle at 100 TB.
    */
  def contaminatedStarts(df: DataFrame, idCol: String, textCol: String,
                         ref: DataFrame, refTextCol: String,
                         n: Int): DataFrame = {
    val refW = ref.select(toks(col(refTextCol)).as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(explode(transform(sequence(lit(0), size(col("__toks")) - n),
        s => array_join(slice(col("__toks"), s + 1, lit(n)), " ")))
        .as("__w"))
      .distinct()
      .withColumn("__h", xxhash64(col("__w")))
    windows(df, idCol, textCol, n)
      .withColumn("__h", xxhash64(col("__w")))
      .join(refW, Seq("__h", "__w"), "left_semi")
      .select(col(idCol), col("__start"))
  }

  /** Excise every token position covered by a window that appears in the
    * reference corpus; same output contract as [[removeSpans]].
    */
  def decontaminateSpans(df: DataFrame, idCol: String, textCol: String,
                         ref: DataFrame, refTextCol: String,
                         n: Int): DataFrame =
    removeByStarts(df, idCol, textCol,
      contaminatedStarts(df, idCol, textCol, ref, refTextCol, n), n)

  /** Per-document CONTAMINATION REPORT against a benchmark corpus: how
    * many n-token windows overlap the reference verbatim, how many
    * tokens the union of those spans covers, and the covered fraction —
    * the number a pretraining paper publishes per eval set (PaLM/GPT-3
    * style) and the triage signal deciding between excision (d16) and
    * document drop (d08). Same merged-interval fold as [[coverage]],
    * same broadcast-semi-join plan as [[contaminatedStarts]]; every
    * input document gets a row (zeroes when clean).
    */
  def contaminationCoverage(df: DataFrame, idCol: String, textCol: String,
                            ref: DataFrame, refTextCol: String,
                            n: Int): DataFrame = {
    val base = df.select(col(idCol), size(toks(col(textCol))).as("n_tokens"))
      .withColumn("n_windows",
        greatest(lit(0), col("n_tokens") - (n - 1)).cast("long"))
    val per = contaminatedStarts(df, idCol, textCol, ref, refTextCol, n)
      .groupBy(idCol)
      .agg(count(lit(1)).as("contaminated_windows"),
        coveredTokens(collect_list(col("__start")), n).as("contaminated_tokens"))
    base.join(per, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"),
        col("n_windows"),
        coalesce(col("contaminated_windows"), lit(0L)).as("contaminated_windows"),
        coalesce(col("contaminated_tokens"), lit(0L)).as("contaminated_tokens"),
        round(when(col("n_tokens") > 0,
          coalesce(col("contaminated_tokens"), lit(0L)).cast("double") /
            col("n_tokens").cast("double")).otherwise(lit(0.0)), 6)
          .as("contaminated_frac"))
  }

  // ------------------------------------------- maximal duplicated runs

  /** MAXIMAL duplicated-run length per document — the arbitrary-length
    * form of the fixed-n window count (Lee et al.'s suffix-array question
    * "what is the longest span this document shares verbatim with
    * another?"), answered WITHOUT suffix arrays or all-pairs cost by a
    * MULTI-RESOLUTION doubling composition:
    *
    *   1. DOUBLING LEVELS on MERKLE HASHES. For n = 1, 2, 4, … ≤ cap,
    *      compute the (over-approximated) set D_n of positions whose
    *      n-token window hash is shared by ≥ `minDocs` distinct
    *      documents. Level windows are never materialized as text:
    *      H_1(p) = xxhash64(token), H_2n(p) = combine(H_n(p), H_n(p+n))
    *      — equal windows always share the combined hash (completeness,
    *      which is all candidate generation needs), and a collision only
    *      OVER-approximates D_n (extra refinement fan-out, never a wrong
    *      answer: the refinement recounts exactly). The ladder above
    *      level 1 is a PER-DOCUMENT computation (every combined window
    *      lives inside one token array), so after the single corpus-wide
    *      level-1 token-hash count, the surviving (position, hash) pairs
    *      fold per document and ONE codegen expression
    *      ([[graft.plans.MerkleLevelsExpr]]) emits the whole power-of-two
    *      ladder row-locally; ONE (level, hash) distinct-doc count then
    *      replaces round 12's per-level join/group-by/checkpoint loop
    *      (~20 jobs, 2 driver actions per level — the d18 cold-codegen
    *      cost the BENCH_r12 adjudication traced). Every token of a
    *      truly duplicated window is itself duplicated, so all leaves a
    *      qualifying ladder entry needs survive level 1; dropping the
    *      loop's level-by-level global pruning only widens the candidate
    *      superset, which the refinement recount corrects.
    *
    *   2. BOUNDED REFINEMENT. Let np(p) = the largest level at which p
    *      survived. Any duplicated window of length m starting at p
    *      contains the 2^⌊log₂ m⌋-window at p, so m ≤ 2·np(p) − 1 — and
    *      the same bound holds at EVERY sharer's position. One pass
    *      generates, per surviving position, windows of ALL lengths
    *      1 … min(2·np(p) − 1, cap, tokens−p) (row-local fan-out ≤ 2·np,
    *      i.e. cost ∝ the duplicated-run footprint, never the corpus²),
    *      counts distinct documents per window content (two-phase again),
    *      and takes each document's max duplicated length.
    *
    *      Why all lengths and not a per-position exponential+binary
    *      probe: the count of a probed window is the number of DISTINCT
    *      DOCUMENTS that GENERATE it, so a length is countable only if
    *      every holder of that window string generates it. Per-position
    *      probe schedules diverge (np, cap and document-end truncation
    *      differ between two holders of the same string), so a holder can
    *      skip the length its partner probes and a truly duplicated
    *      window counts 1 — unsound. Synchronizing probes globally is
    *      sound but turns a row-local ≤ 2·np fan-out of 8-byte hashes
    *      into O(log cap) extra barrier stages — the quantity the flat
    *      ladder above just eliminated. The enumeration stays.
    *
    * EXACT by construction for runs up to `cap` (reported value =
    * min(true max, cap) — cap is the explicit fan-out contract, like the
    * BPE vocab cap): completeness because every sharer generates every
    * qualifying length, soundness because generated windows are a subset
    * of real windows. Output: one row per input document,
    * (idCol, n_tokens, max_dup_run), 0 when nothing is duplicated.
    *
    * MEMORY CONTRACT (the footprint-proportional claim, made precise):
    * the per-document survivor fold concentrates a document's duplicated
    * positions into ONE row — k `(p, h)` structs in, ≤ k·(log₂ cap + 1)
    * ladder structs out of [[graft.plans.MerkleLevelsExpr]] — so a
    * single row's memory is bounded by that document's own duplicated
    * footprint (≈ 24 bytes · k · log cap), NOT by the corpus. A
    * fully-duplicated document of 10⁶ tokens costs ~170 MB transient on
    * one executor at cap 64; chunk documents above that order of
    * position count if the deployment's row-size budget is tighter.
    */
  def maxDuplicatedRun(df: DataFrame, idCol: String, textCol: String,
                       minDocs: Int = 2, cap: Int = 64): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    val base = df.select(col(idCol), toks(col(textCol)).as("__toks"))
      .withColumn("__len", size(col("__toks")))
      .localCheckpoint(true)
    // level 1: the only corpus-wide shuffle — 8-byte token hashes,
    // combiner-friendly distinct-doc count
    val w1 = base
      .select(col(idCol), posexplode(col("__toks")).as(Seq("__p", "__tok")))
      .select(col(idCol), col("__p"), xxhash64(col("__tok")).as("__h"))
    val c1 = sharedKeys(w1, Seq("__h"), idCol, minDocs)
    val s1 = w1.join(c1, "__h")
    // per-document survivor fold + row-local ladder: (id, p, n, h) for
    // n = 2, 4, … ≤ cap wherever both halves' leaves survived level 1
    val ladder = s1.groupBy(col(idCol))
      .agg(collect_list(struct(col("__p").as("p"), col("__h").as("h")))
        .as("__s1"))
      .select(col(idCol), posexplode(
        graft.plans.MerkleLevelsExpr.merkleLevels(col("__s1"), lit(cap)))
        .as(Seq("__i", "__lv")))
      .select(col(idCol), col("__lv.p").as("__p"), col("__lv.n").as("__n"),
        col("__lv.h").as("__h"))
    // one global distinct-doc count per (level, combined hash); level-1
    // rows re-enter with __n = 1 (already proven by c1, no recount)
    val ck = sharedKeys(ladder, Seq("__n", "__h"), idCol, minDocs)
    val np = ladder.join(ck, Seq("__n", "__h"))
      .select(col(idCol), col("__p"), col("__n"))
      .unionByName(s1.select(col(idCol), col("__p"), lit(1).as("__n")))
      .groupBy(col(idCol), col("__p"))
      .agg(max(col("__n")).as("__np"))
    // refinement phase 1 on ROLLING WINDOW HASHES — one chained
    // xxhash64 per (position, length), built incrementally in O(maxm)
    // per position (h_m = xxhash64(h_{m-1}, token), no O(m²) string
    // rebuilding) and shuffled at 8 bytes per window. Full window TEXT
    // is materialized only for candidate hashes in phase 2 (the d15
    // "window text never rides a corpus-wide shuffle" discipline); the
    // exact (hash, text) recount keeps 64-bit collisions harmless.
    val maxm = least(lit(2) * col("__np") - 1, lit(cap),
      col("__len") - col("__p"))
    val winHashes = graft.plans.WindowHashesExpr.windowHashes(
      col("__toks"), col("__p"), maxm)
    val gen = np.join(base, Seq(idCol))
      .select(col(idCol), col("__p"),
        posexplode(winHashes).as(Seq("__mi", "__h")))
      .select(col(idCol), col("__p"), (col("__mi") + 1).as("__m"), col("__h"))
    val dupLens = {
      val c1 = sharedKeys(gen, Seq("__h"), idCol, minDocs)
      // phase 2: rebuild text for candidate (position, length) rows only
      val pruned = gen.join(c1, "__h").join(base, Seq(idCol))
        .select(col(idCol), col("__m"), col("__h"),
          array_join(slice(col("__toks"), col("__p") + 1, col("__m")), " ")
            .as("__w"))
      val keys = sharedKeys(pruned, Seq("__h", "__w"), idCol, minDocs)
      pruned.join(keys, Seq("__h", "__w"))
        .groupBy(col(idCol))
        .agg(max(col("__m")).cast("long").as("max_dup_run"))
    }
    base.select(col(idCol), col("__len").cast("long").as("n_tokens"))
      .join(dupLens, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("max_dup_run"), lit(0L)).as("max_dup_run"))
  }

  /** Remove duplicated spans: every token position covered by a
    * duplicated n-token window is dropped and the survivors re-joined
    * with single spaces (the operator works on the whitespace-normalized
    * text — span identity is defined there). Documents with nothing
    * duplicated pass through normalized but otherwise intact; no
    * document row is ever dropped.
    */
  def removeSpans(df: DataFrame, idCol: String, textCol: String,
                  n: Int, minDocs: Int = 2): DataFrame =
    removeByStarts(df, idCol, textCol,
      dupStarts(df, idCol, textCol, n, minDocs), n)

  /** Shared removal tail: drop the tokens covered by `starts`'s
    * [s, s+n) intervals and re-join with single spaces.
    */
  private def removeByStarts(df: DataFrame, idCol: String, textCol: String,
                             starts: DataFrame, n: Int): DataFrame = {
    // Per-doc covered-position list: row-local flatten of [s, s+n) runs,
    // bounded by document length.
    val pos = starts
      .groupBy(idCol)
      .agg(array_distinct(flatten(transform(
        collect_list(col("__start")),
        s => sequence(s.cast("long"), s.cast("long") + (n - 1)))))
        .as("__cut"))
    df.withColumn("__toks", toks(col(textCol)))
      .join(pos, Seq(idCol), "left")
      .select(col(idCol),
        array_join(filter(col("__toks"),
          (_, i) => !coalesce(
            array_contains(col("__cut"), i.cast("long")), lit(false))),
          " ").as(textCol),
        coalesce(size(col("__cut")), lit(0)).cast("long").as("removed_tokens"))
  }
}
