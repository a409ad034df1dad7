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
          // element_at is O(1) per gram vs slice's per-position array copy
          // (NearDup.shingles' documented trick, applied here round 21);
          // concat_ws over non-null tokens ≡ array_join with " "
          s => concat_ws(" ",
            (0 until n).map(k => element_at(col("__toks"), s + 1 + k)): _*)))
        .as(Seq("__start", "__w")))

  /** Duplicated-span start positions: (idCol, __start) for every token
    * position whose n-token window appears in ≥ `minDocs` distinct
    * documents. Two phases — candidate hashes by 8-byte count, then an
    * exact (hash, text) recount over candidates only.
    */
  def dupStarts(df: DataFrame, idCol: String, textCol: String,
                n: Int, minDocs: Int = 2): DataFrame = {
    // persist the exploded window frame: the two-phase plan consumes it
    // three times (phase-1 count, candidate prune, final dupKeys join) and
    // without the pin each consumer re-runs normalize+split+window-build+
    // hash from the source scan (round-21 plan audit: 4 Generate subtrees
    // in d15/t19). MEMORY_AND_DISK so the 10× smoke scale spills instead
    // of thrashing; released by the caller's clearCache / unreachability.
    val w = windows(df, idCol, textCol, n)
      .withColumn("__h", xxhash64(col("__w")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
        s => concat_ws(" ",
          (0 until n).map(k => element_at(col("__toks"), s + 1 + k)): _*)))
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
    * MULTI-RESOLUTION doubling composition over a SHORT-GRAM floor:
    *
    *   0. SHORT-GRAM FLAGS (m = 1 … 3). In natural language, 1–3-gram
    *      sharing is near-total (at sf0.1, 100 % of token and bigram
    *      positions and 99.9 % of trigram positions are cross-document
    *      shared; 4-grams drop to 33 % and 8-grams to 9 % — the
    *      BENCH_r16 d18 measurement), so POSITION-level candidate
    *      generation at these lengths prunes nothing while its per-token
    *      corpus relations dominate the shuffle volume. But per DOCUMENT
    *      only one bit per length matters — "does this document contain
    *      ANY shared m-gram?" (max_dup_run ≥ m is monotone: every
    *      sub-window of a duplicated window is duplicated) — and that
    *      bit falls out of ONE text-keyed count with NO join-back: a
    *      gram with min(id) = max(id) lives in exactly one document, so
    *      the unshared grams are ATTRIBUTABLE — group the unshared rows
    *      by their single owner, and a document has a shared m-gram iff
    *      its row-local distinct-m-gram count exceeds its attributed
    *      unshared count. Text-keyed (not hashed), hence exact.
    *
    *   1. DOUBLING LEVELS on MERKLE HASHES above a 4-token base. For
    *      n = 4, 8, … ≤ cap, compute the (over-approximated) set D_n of
    *      positions whose n-token window hash is shared by ≥ `minDocs`
    *      distinct documents. Base-level survivors are found by the same
    *      unshared-attribution trick on 4-gram hashes (one 8-byte-keyed
    *      corpus count, then a row-local filter against the document's
    *      own unshared set — [[graft.plans.SharedGramsExpr]] — instead
    *      of a second corpus-wide join-back shuffle); the ladder above
    *      the base is a PER-DOCUMENT computation (every combined window
    *      lives inside one token array), so ONE codegen expression
    *      ([[graft.plans.MerkleLevelsExpr]]) emits the whole
    *      power-of-two ladder row-locally — H_4(p) = xxhash64(4 tokens),
    *      H_2n(p) = combine(H_n(p), H_n(p+n)) — and ONE (level, hash)
    *      distinct-doc count (key packed to 8 bytes) covers every level.
    *      Equal windows always share the combined hash (completeness),
    *      and a collision only OVER-approximates D_n — the refinement
    *      recounts exactly.
    *
    *   2. BOUNDED REFINEMENT (m ≥ 4). Let np(p) = the largest level at
    *      which p survived (≥ 4 by base membership). Any duplicated
    *      window of length m at p contains its largest
    *      power-of-two-times-4 prefix, so m ≤ 2·np(p) − 1 — and the same
    *      bound holds at EVERY sharer's position. One row-local pass
    *      ([[graft.plans.NpWindowsExpr]]) generates, per surviving
    *      position, rolling window hashes of ALL lengths
    *      4 … min(2·np(p) − 1, cap, tokens−p) (fan-out ≤ 2·np, i.e. cost
    *      ∝ the duplicated-run footprint, never the corpus²), counts
    *      distinct documents per window content (two-phase: 8-byte hash
    *      count, then an exact (hash, text) recount over candidates
    *      only — window text never rides a corpus-wide shuffle), and
    *      takes each document's max duplicated length. The answer is
    *      max(refined, short-gram flags).
    *
    *      Why all lengths and not a per-position exponential+binary
    *      probe: the count of a probed window is the number of DISTINCT
    *      DOCUMENTS that GENERATE it, so a length is countable only if
    *      every holder of that window string generates it. Per-position
    *      probe schedules diverge (np, cap and document-end truncation
    *      differ between two holders of the same string), so a holder can
    *      skip the length its partner probes and a truly duplicated
    *      window counts 1 — unsound. Synchronized full enumeration stays.
    *
    * EXACT by construction for runs up to `cap` (reported value =
    * min(true max, cap) — cap is the explicit fan-out contract, like the
    * BPE vocab cap): the short-gram flags are text-keyed counts, the
    * refinement recounts candidate windows by (hash, text), and hash
    * collisions anywhere in between only widen candidate sets —
    * under-approximation is impossible because equal strings always get
    * equal hashes at every level. Output: one row per input document,
    * (idCol, n_tokens, max_dup_run), 0 when nothing is duplicated.
    *
    * SHUFFLE CONTRACT (the round-17 rewrite; BENCH_r16's smoke leg
    * measured the previous token-based plan at 5× input amplification —
    * three corpus-wide per-token relations of which level-1 pruning
    * retained ~everything): every corpus-sized exchange is now a
    * partial-aggregated COUNT (short-gram texts collapse to
    * per-partition-distinct keys) or an attributed per-doc fold bounded
    * by each document's own window count; ladder counts and refinement
    * run on the duplicated footprint. What remains corpus-sized are the
    * three per-document joins (unshared sets onto tokens, ladder
    * survivors, final assembly) — each shuffles doc-keyed rows whose
    * width is bounded by the document's own windows, never a key-skewed
    * or all-pairs relation.
    *
    * MEMORY CONTRACT: per-document rows carry that document's own
    * windows only — unshared sets and survivor folds are ≈ 8–24 bytes
    * per window position, ladder structs ≤ k·log₂(cap/4) for a
    * duplicated footprint of k positions — never corpus-sized state.
    */
  def maxDuplicatedRun(df: DataFrame, idCol: String, textCol: String,
                       minDocs: Int = 2, cap: Int = 64): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    val baseLen = 4
    val id = col(idCol)
    // explicit round-robin repartition: AQE would size the checkpoint by
    // its INPUT bytes (a handful of partitions at bench scale), but every
    // downstream map stage fans out ~window-count × log(cap) rows per
    // token — the row-local work, not the input bytes, is the unit that
    // must parallelize (measured 6.6 → 4.3 s at sf0.1 going from 2 to 32
    // partitions, identical plan otherwise). Round-robin, not by idCol:
    // a checkpoint comes back as a bare LogicalRDD whose partitioning
    // Catalyst no longer trusts, so a by-key repartition would buy the
    // downstream id-joins nothing and only skew under duplicate ids.
    val base = df.select(id, toks(col(textCol)).as("__toks"))
      .withColumn("__len", size(col("__toks")))
      .repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions",
        "200").toInt)
      .localCheckpoint(true)

    // row-local DISTINCT m-grams of one document (element_at O(1) per gram
    // vs slice's per-position copy — round 21, same trick as windows())
    def mgrams(m: Int): Column =
      when(col("__len") >= m,
        array_distinct(transform(sequence(lit(0), col("__len") - m),
          s => concat_ws(" ",
            (0 until m).map(k => element_at(col("__toks"), s + 1 + k)): _*))))
        .otherwise(array().cast("array<string>"))

    // --------------- step 0: ONE text-keyed count for m = 1 … baseLen
    // (flag lengths 1…3 plus the base level — a single corpus exchange,
    // partial-aggregated down to per-partition-distinct gram texts)
    val flagM = math.min(baseLen - 1, cap)
    val gramMs = (1 to flagM) ++ (if (cap >= baseLen) Seq(baseLen) else Nil)
    val gramRel = base.select(id, explode(flatten(array(
        gramMs.map(m =>
          transform(mgrams(m), g => struct(lit(m).as("m"), g.as("g")))): _*)))
        .as("__mg"))
      .select(id, col("__mg.m").as("__m"), col("__mg.g").as("__g"))
    // enriched: base + per-doc promotion info; flagMax: the short-gram
    // floor (largest m ≤ 3 with a shared m-gram, 0 if none); s4: the
    // per-doc base-level survivor pairs (p, xxhash64(gram))
    val (enriched, flagMax, s4) =
      if (minDocs == 2) {
        // unshared attribution: a gram with min(id) = max(id) lives in
        // exactly ONE document, so the count's unshared rows fold
        // per-document with no join-back; a document has a shared m-gram
        // iff its row-local distinct count exceeds its unshared count
        val uAgg = gramRel.groupBy(col("__m"), col("__g"))
          .agg(min(id).as("__mn"), max(id).as("__mx"))
          .filter(col("__mn") === col("__mx"))
          .groupBy(col("__mn").as(idCol))
          .agg(count(when(col("__m") === 1, true)).as("__u1"),
            ((2 to flagM).map(m =>
              count(when(col("__m") === m, true)).as(s"__u$m")) ++
             (if (cap >= baseLen)
                Seq(sort_array(collect_set(
                  when(col("__m") === baseLen, col("__g")))).as("__ut"))
              else Nil)): _*)
        val e = base.join(uAgg, Seq(idCol), "left")
        val mx = greatest((1 to flagM).reverse.map(m =>
          when(size(mgrams(m)).cast("long") > coalesce(col(s"__u$m"), lit(0L)),
            lit(m.toLong))) :+ lit(0L): _*)
        val s = graft.plans.SharedGramsExpr.sharedGrams(
          col("__toks"), lit(baseLen),
          coalesce(col("__ut"), array().cast("array<string>")))
        (e, mx, s)
      } else {
        // general minDocs: exact distinct-doc promotion + semi-join-backs
        val sharedG = gramRel.groupBy(col("__m"), col("__g"))
          .agg(countDistinct(id).as("__nd"))
          .filter(col("__nd") >= minDocs)
          .select(col("__m"), col("__g"))
        val f = gramRel.join(sharedG, Seq("__m", "__g"), "left_semi")
          .filter(col("__m") <= flagM)
          .groupBy(id).agg(max(col("__m")).cast("long").as("__fm"))
        val e0 = base.join(f, Seq(idCol), "left")
        val e =
          if (cap < baseLen) e0
          else {
            val w4 = base.select(id, posexplode(
                when(col("__len") >= baseLen,
                  transform(sequence(lit(0), col("__len") - baseLen),
                    s => array_join(slice(col("__toks"), s + 1, lit(baseLen)),
                      " ")))
                .otherwise(array().cast("array<string>")))
                .as(Seq("__p", "__g")))
            val folded = w4.join(
                sharedG.filter(col("__m") === baseLen).select(col("__g")),
                Seq("__g"))
              .select(id, col("__p"), xxhash64(col("__g")).as("__h"))
              .groupBy(id)
              .agg(collect_list(struct(col("__p").as("p"), col("__h").as("h")))
                .as("__s4j"))
            e0.join(folded, Seq(idCol), "left")
          }
        (e, coalesce(col("__fm"), lit(0L)),
          coalesce(col("__s4j"), array().cast("array<struct<p:int,h:long>>")))
      }

    if (cap < baseLen)
      return enriched.select(id, col("__len").cast("long").as("n_tokens"),
        flagMax.as("max_dup_run"))

    // ------------ step 1: row-local Merkle ladder, ONE 8-byte-key count
    val ladderOf = graft.plans.MerkleLevelsExpr.merkleLevels(
      s4, lit(cap), lit(baseLen))
    val lad = enriched.select(id, explode(ladderOf).as("__e"))
      .select(id, col("__e.p").as("__p"), col("__e.n").as("__n"),
        col("__e.k").as("__k"))
    // per-doc globally-surviving levels __hi: (p, n) pairs bounding np
    val withHi =
      if (minDocs == 2) {
        val uLad = lad.groupBy(col("__k"))
          .agg(min(id).as("__mn"), max(id).as("__mx"))
          .filter(col("__mn") === col("__mx"))
          .select(col("__mn").as(idCol), col("__k"))
          .groupBy(idCol)
          .agg(sort_array(collect_set(col("__k"))).as("__uk"))
        enriched.join(uLad, Seq(idCol), "left")
          .withColumn("__hi", graft.plans.FilterPackedExpr.filterPacked(
            ladderOf, coalesce(col("__uk"), array().cast("array<long>"))))
      } else {
        val ck = sharedKeys(lad, Seq("__k"), idCol, minDocs)
        val mHigh = lad.join(ck, "__k")
          .groupBy(idCol)
          .agg(collect_list(struct(col("__p").as("p"), col("__n").as("n")))
            .as("__him"))
        enriched.join(mHigh, Seq(idCol), "left")
          .withColumn("__hi", coalesce(col("__him"),
            array().cast("array<struct<p:int,n:int>>")))
      }

    // ------------------------------------------ step 2: refinement
    val genx = withHi.select(id, explode(graft.plans.NpWindowsExpr.npWindows(
        col("__toks"), s4, col("__hi"), lit(baseLen), lit(cap))).as("__e"))
      .select(id, col("__e.p").as("__p"), col("__e.m").as("__m"),
        col("__e.h").as("__h"))
    val cg = sharedKeys(genx, Seq("__h"), idCol, minDocs)
    // phase 2: rebuild text for candidate (position, length) rows only
    val cand = genx.join(cg, "__h").join(base, Seq(idCol))
      .select(id, col("__m"), col("__h"),
        array_join(slice(col("__toks"), col("__p") + 1, col("__m")), " ")
          .as("__w"))
    val keys = sharedKeys(cand, Seq("__h", "__w"), idCol, minDocs)
    val refined = cand.join(keys, Seq("__h", "__w"))
      .groupBy(id).agg(max(col("__m")).cast("long").as("__refmax"))

    // the baseLen floor is already certified: base promotion counts gram
    // TEXT, so any survivor position is a true duplicated baseLen-run —
    // refinement enumerates from baseLen + 1 (NpWindowsExpr) and the
    // floor joins the flags here
    enriched.join(refined, Seq(idCol), "left")
      .select(id, col("__len").cast("long").as("n_tokens"),
        greatest(coalesce(col("__refmax"), lit(0L)), flagMax,
          when(size(s4) > 0, lit(baseLen.toLong)))
          .as("max_dup_run"))
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
