package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Text-analysis surface over the `documents` table: token statistics,
  * quality scoring, language ID, content fingerprinting, rolling hash
  * (SURVEY §7.8 / the training-data-pipeline extension set).
  *
  * Every query is pure column expressions (codegen'd, zero shuffle except
  * final aggregation where present) and every DuckDB oracle mirrors the
  * exact same arithmetic so doubles match bit-for-bit before the ROUND.
  * DuckDB `regexp_replace` is per-first-match by default — every oracle
  * pattern passes the 'g' flag to match Spark's replace-all semantics.
  */
object TextQueries {

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    GraftQuery(name, fn, Some(oracle))

  /** DuckDB mirror of [[TextFunctions.normalizeWs]]. */
  private def normSql(c: String) =
    s"trim(regexp_replace(regexp_replace($c, '[\\r\\n]+', ' ', 'g'), '\\s+', ' ', 'g'))"

  private val stopPat = "\\b(the|a|an|and|or|of|to|in|is|it|that|for|on|with|as)\\b"
  private[queries] val tokenPat = "[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"
  private val punctPat = """[.,;:!?''"()\[\]{}-]""" // '' = escaped quote in SQL

  // ---------------------------------------------------------------- t01
  /** Token statistics: chars, whitespace words, BPE-ish tokens. */
  val t01_token_stats = q("t01_token_stats",
    s"""WITH n AS (SELECT doc_id, n_chars, text, ${normSql("text")} AS norm FROM documents)
       |SELECT doc_id, n_chars,
       |  CAST(length(text) AS INT) AS text_len,
       |  CAST(CASE WHEN length(norm) = 0 THEN 0
       |            ELSE len(string_split(norm, ' ')) END AS INT) AS word_cnt,
       |  CAST(len(regexp_extract_all(text, '$tokenPat')) AS INT) AS token_cnt
       |FROM n""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir).select(
      col("doc_id"), col("n_chars"),
      length(col("text")).as("text_len"),
      TextFunctions.wordCount(col("text")).as("word_cnt"),
      TextFunctions.tokenCount(col("text")).as("token_cnt"))
  }

  // ---------------------------------------------------------------- t02
  /** Quality scoring: punctuation ratio, stopword ratio, composite score. */
  val t02_quality_score = q("t02_quality_score",
    s"""WITH n AS (SELECT doc_id, text, ${normSql("text")} AS norm FROM documents),
       |m AS (
       |  SELECT doc_id, text,
       |    CASE WHEN length(norm) = 0 THEN 0
       |         ELSE len(string_split(norm, ' ')) END AS wc,
       |    len(regexp_extract_all(text, '$punctPat')) AS punct,
       |    len(regexp_extract_all(lower(norm), '$stopPat')) AS stop
       |  FROM n),
       |r AS (
       |  SELECT doc_id,
       |    CASE WHEN length(text) = 0 THEN 0.0
       |         ELSE CAST(punct AS DOUBLE) / CAST(length(text) AS DOUBLE) END AS pr,
       |    CASE WHEN wc = 0 THEN 0.0
       |         ELSE CAST(stop AS DOUBLE) / CAST(wc AS DOUBLE) END AS sr,
       |    CAST(length(text) AS DOUBLE) AS tl
       |  FROM m)
       |SELECT doc_id, ROUND(pr, 6) AS punct_ratio, ROUND(sr, 6) AS stopword_ratio,
       |  ROUND(least(tl / 500.0, 1.0) * 0.4
       |      + greatest(0.0, 1.0 - pr * 5.0) * 0.3
       |      + least(sr * 4.0, 1.0) * 0.3, 6) AS quality
       |FROM r""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir).select(
      col("doc_id"),
      round(TextFunctions.punctRatio(col("text")), 6).as("punct_ratio"),
      round(TextFunctions.stopwordRatio(col("text")), 6).as("stopword_ratio"),
      TextFunctions.qualityScore(col("text")).as("quality"))
  }

  // ---------------------------------------------------------------- t03
  /** Marker-word language ID (n-gram heuristic; priority-order argmax). */
  val t03_lang_id = q("t03_lang_id",
    s"""WITH n AS (SELECT doc_id, lang, text, lower(${normSql("text")}) AS toks FROM documents),
       |h AS (
       |  SELECT doc_id, lang, text,
       |    len(regexp_extract_all(toks, '\\b(the|and|of|is|with)\\b')) AS hen,
       |    len(regexp_extract_all(toks, '\\b(le|la|et|les|des)\\b')) AS hfr,
       |    len(regexp_extract_all(toks, '\\b(el|los|las|una|y)\\b')) AS hes,
       |    len(regexp_extract_all(toks, '\\b(der|die|und|das|ist)\\b')) AS hde
       |  FROM n)
       |SELECT doc_id, lang,
       |  CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
       |       WHEN hen + hfr + hes + hde = 0 THEN 'und'
       |       WHEN hen >= hfr AND hen >= hes AND hen >= hde THEN 'en'
       |       WHEN hfr >= hes AND hfr >= hde THEN 'fr'
       |       WHEN hes >= hde THEN 'es'
       |       ELSE 'de' END AS lang_pred
       |FROM h""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir).select(
      col("doc_id"), col("lang"),
      TextFunctions.langId(col("text")).as("lang_pred"))
  }

  // ---------------------------------------------------------------- t04
  /** Content fingerprint (md5 of normalized lower-cased text). */
  val t04_fingerprint = q("t04_fingerprint",
    s"""SELECT doc_id, md5(lower(${normSql("text")})) AS fp FROM documents""") { (s, dir) =>
    Tables.documents(s, dir).select(
      col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
  }

  // ---------------------------------------------------------------- t05
  /** Polynomial rolling hash over the normalized character stream
    * (document fingerprinting without a hash library — pure arithmetic, so
    * any engine reproduces it exactly).
    */
  val t05_rolling_hash = q("t05_rolling_hash",
    s"""WITH n AS (SELECT doc_id, ${normSql("text")} AS norm FROM documents)
       |SELECT doc_id,
       |  CASE WHEN length(norm) = 0 THEN 0
       |       ELSE list_reduce(
       |         list_prepend(CAST(0 AS BIGINT),
       |           [CAST(ascii(substr(norm, CAST(i AS INT), 1)) AS BIGINT)
       |            for i in range(1, CAST(length(norm) AS INT) + 1)]),
       |         (acc, x) -> (acc * 31 + x) % 1000000007) END AS rhash
       |FROM n""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .withColumn("norm", TextFunctions.normalizeWs(col("text")))
      .select(col("doc_id"),
        // codegen'd code-point loop (graft.plans.RollingHashExpr) — the SQL
        // aggregate-over-sequence twin allocated a 1-char substring per
        // character and ran its lambda interpreted
        graft.plans.RollingHashExpr.rollingHash(col("norm")).as("rhash"))
  }

  // ---------------------------------------------------------------- t06
  /** PII-style redaction (training-corpus scrub): deterministic synthetic
    * PII is appended to every document (an email + a phone derived from
    * doc_id — both engines construct the identical string), then scrubbed
    * to `<EMAIL>`/`<PHONE>` tokens. Output is the md5 of the redacted text
    * plus per-kind match counts, so the oracle hash-checks the exact
    * redacted bytes without shipping full documents through the compare.
    */
  val t06_redact = q("t06_redact",
    s"""WITH p AS (
       |  SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR)
       |      || '@example.com or +1-555-'
       |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS dirty
       |  FROM documents)
       |SELECT doc_id,
       |  md5(regexp_replace(regexp_replace(dirty,
       |    '${TextFunctions.emailPattern}', '<EMAIL>', 'g'),
       |    '${TextFunctions.phonePattern}', '<PHONE>', 'g')) AS redacted_fp,
       |  CAST(len(regexp_extract_all(dirty, '${TextFunctions.emailPattern}')) AS INT) AS n_email,
       |  CAST(len(regexp_extract_all(dirty, '${TextFunctions.phonePattern}')) AS INT) AS n_phone
       |FROM p""".stripMargin) { (s, dir) =>
    val dirty = concat(col("text"), lit(" contact user"),
      col("doc_id").cast("string"), lit("@example.com or +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    Tables.documents(s, dir)
      .withColumn("dirty", dirty)
      .select(col("doc_id"),
        md5(TextFunctions.redact(col("dirty")).cast("binary")).as("redacted_fp"),
        size(regexp_extract_all(col("dirty"),
          lit(TextFunctions.emailPattern), lit(0))).as("n_email"),
        size(regexp_extract_all(col("dirty"),
          lit(TextFunctions.phonePattern), lit(0))).as("n_phone"))
  }

  // ---------------------------------------------------------------- t07
  /** TF-IDF: the canonical corpus-statistic scoring — term frequency per
    * doc × smoothed inverse document frequency (ln((N+1)/(df+1)) + 1),
    * top-scoring term per document (ties → lexicographically first term).
    * Plan: one shuffle for per-(doc,term) counts, one for per-term doc
    * frequencies, a broadcast of the single-row corpus size, and a keyed
    * window for the top-1 — nothing quadratic, df table is O(vocabulary).
    *
    * tf and df deliberately re-tokenize (two map-side scans) rather than
    * sharing a cached token relation. Measured on local[32]: at sf0.1
    * (50k docs) caching LOSES 1.9s → 3.3s (materialization + losing
    * whole-stage fusion outweighs one extra tokenize); at 10× (500k docs)
    * it WINS 6.4s → 3.7s. The crossover sits around a few hundred
    * thousand docs per executor-equivalent — for cluster-scale corpora,
    * cache (or checkpoint) the token relation and feed both aggregates,
    * exactly as [[graft.ext.NearDup.nearDuplicatePairs]] now does by
    * default with its shingle relation.
    */
  val t07_tfidf_top_terms = q("t07_tfidf_top_terms",
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(lower(${normSql("text")}), ' ')) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term,
       |    tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0) AS score
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |r AS (SELECT doc_id, term, score,
       |        ROW_NUMBER() OVER (PARTITION BY doc_id
       |                           ORDER BY score DESC, term) AS rn
       |      FROM scored)
       |SELECT doc_id, term AS top_term, ROUND(score, 6) AS tfidf
       |FROM r WHERE rn = 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val toks = docs.select(col("doc_id"),
      explode(split(lower(TextFunctions.normalizeWs(col("text"))), " ")).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = toks.groupBy("term").agg(count_distinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("term").as("top_term"),
        round(col("score"), 6).as("tfidf"))
  }

  // ---------------------------------------------------------------- t08
  /** END-TO-END CURATION PIPELINE — the LLM-data story in one registry
    * entry: quality-score filter → language filter → exact dedup (keep the
    * smallest doc_id per content fingerprint) → deterministic stratified
    * sample (≤ 40 docs per quality bucket, hash-order draw). Every stage
    * is one of this engine's first-class operators composed as a user
    * would compose them, and the whole chain stays SQL-expressible so the
    * oracle replays it end to end. Plan shape: scan-side column work
    * (quality, lang, fingerprint are pure codegen expressions, filters
    * push toward the scan), ONE shuffle for the dedup window, one for the
    * sample window — nothing quadratic, nothing collected.
    */
  val t08_curation_pipeline = q("t08_curation_pipeline",
    s"""WITH n AS (SELECT doc_id, text, ${normSql("text")} AS norm FROM documents),
       |m AS (
       |  SELECT doc_id, text, norm,
       |    CASE WHEN length(norm) = 0 THEN 0
       |         ELSE len(string_split(norm, ' ')) END AS wc,
       |    len(regexp_extract_all(text, '$punctPat')) AS punct,
       |    len(regexp_extract_all(lower(norm), '$stopPat')) AS stop
       |  FROM n),
       |scored AS (
       |  SELECT doc_id, text, norm,
       |    least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
       |      + greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0
       |          ELSE CAST(punct AS DOUBLE) / CAST(length(text) AS DOUBLE) END) * 5.0) * 0.3
       |      + least((CASE WHEN wc = 0 THEN 0.0
       |          ELSE CAST(stop AS DOUBLE) / CAST(wc AS DOUBLE) END) * 4.0, 1.0) * 0.3
       |      AS q,
       |    len(regexp_extract_all(lower(norm), '\\b(the|and|of|is|with)\\b')) AS hen,
       |    len(regexp_extract_all(lower(norm), '\\b(le|la|et|les|des)\\b')) AS hfr,
       |    len(regexp_extract_all(lower(norm), '\\b(el|los|las|una|y)\\b')) AS hes,
       |    len(regexp_extract_all(lower(norm), '\\b(der|die|und|das|ist)\\b')) AS hde
       |  FROM m),
       |en AS (
       |  -- qualityScore rounds to 6 inside the engine, so the gate and the
       |  -- bucket must use the ROUNDED value on both sides
       |  SELECT doc_id, norm, ROUND(q, 6) AS quality,
       |         CAST(least(floor(ROUND(q, 6) * 5.0), 4.0) AS INT) AS bucket
       |  FROM scored
       |  WHERE ROUND(q, 6) >= 0.5
       |    AND NOT regexp_matches(text, '[\\x{4e00}-\\x{9fff}]')
       |    AND hen + hfr + hes + hde > 0
       |    AND hen >= hfr AND hen >= hes AND hen >= hde),
       |deduped AS (
       |  SELECT doc_id, quality, bucket,
       |    ROW_NUMBER() OVER (PARTITION BY md5(lower(norm)) ORDER BY doc_id) AS dn
       |  FROM en),
       |sampled AS (
       |  SELECT doc_id, quality, bucket,
       |    ROW_NUMBER() OVER (PARTITION BY bucket
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM deduped WHERE dn = 1)
       |SELECT doc_id, quality, bucket FROM sampled WHERE rn <= 40""".stripMargin) { (s, dir) =>
    import graft.operators.{Dedup, Sampling}
    // persist the scored projection: the quality/lang filter otherwise
    // pushes below it and the regex-heavy qualityScore/langId chains
    // evaluate twice (filter + project) — round 21, same duplication as
    // d02's inferred filter. Narrow (5 columns), released by clearCache.
    val scored = Tables.documents(s, dir).select(
      col("doc_id"), col("text"),
      TextFunctions.qualityScore(col("text")).as("quality"),
      TextFunctions.langId(col("text")).as("lang"),
      TextFunctions.fingerprint(col("text")).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kept = scored
      .filter(col("quality") >= 0.5 && col("lang") === "en")
      .withColumn("bucket",
        least(floor(col("quality").cast("double") * 5.0), lit(4.0)).cast("int"))
    // quality here is already ROUND(q,6) (qualityScore rounds internally);
    // the oracle's gate and bucket round identically before comparing
    val deduped = Dedup.keepFirst(kept, Seq("fp"), Seq(col("doc_id")))
    Sampling.stratified(deduped, Seq("bucket"), k = 40, keyCols = Seq("doc_id"),
        hash = Some(md5(col("doc_id").cast("string").cast("binary"))))
      .select(col("doc_id"), col("quality"), col("bucket"))
  }

  // ---------------------------------------------------------------- t09
  /** REPETITION statistics — the Gopher-style within-document duplication
    * signals every LLM curation stack filters on: `dup_gram_frac` (the
    * fraction of word 3-grams that are repeats of an earlier gram in the
    * same doc) and `top_gram_share` (the share claimed by the single most
    * repeated gram — boilerplate/spam spikes it). Docs shorter than 3
    * words collapse to one whole-text gram (0 repetition by definition).
    *
    * Shape: tokenize + gram map-side, then TWO partial-aggregated shuffles
    * — (doc, gram-hash) counts, then per-doc ratios. Grams shuffle as
    * 8-byte xxhash64 values, never text (counts identical up to 64-bit
    * collisions, ~1e-11 at corpus scale — same argument as d02/d08); the
    * oracle counts the gram text directly, so a collision would FAIL the
    * hash gate rather than hide. Both engines divide long counts as
    * doubles and round at 6 dp.
    */
  val t09_repetition = q("t09_repetition",
    s"""WITH w AS (SELECT doc_id, string_split(${normSql("text")}, ' ') AS toks FROM documents),
       |g AS (SELECT doc_id,
       |        unnest(CASE WHEN len(toks) >= 3
       |               THEN [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
       |               ELSE [array_to_string(toks, ' ')] END) AS gram
       |      FROM w),
       |c AS (SELECT doc_id, gram, COUNT(*) AS n FROM g GROUP BY 1, 2)
       |SELECT doc_id,
       |  ROUND(1 - COUNT(*) / SUM(n), 6) AS dup_gram_frac,
       |  ROUND(MAX(n) / SUM(n), 6) AS top_gram_share
       |FROM c GROUP BY doc_id""".stripMargin) { (s, dir) =>
    val tokenized = Tables.documents(s, dir).select(col("doc_id"),
      split(TextFunctions.normalizeWs(col("text")), " ").as("__w"))
    val w = col("__w")
    val grams = when(size(w) >= 3,
      transform(sequence(lit(1), size(w) - 2),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array(concat_ws(" ", w)))
    tokenized.select(col("doc_id"), explode(grams).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("n"))
      .groupBy("doc_id").agg(
        round(lit(1) - count(lit(1)) / sum(col("n")), 6).as("dup_gram_frac"),
        round(max(col("n")) / sum(col("n")), 6).as("top_gram_share"))
  }

  // ---------------------------------------------------------------- t10
  /** Mixture/temperature resampling ([[graft.operators.Sampling
    * .temperatureResample]]): rebalance the corpus across languages with
    * α = 0.5 quotas — per language keep `min(n, 8·floor(sqrt(n)))` docs,
    * drawn by deterministic md5 order, so dominant languages are
    * downsampled toward their square root and small ones survive whole
    * (the standard multilingual-pretraining mixture flattening). The draw
    * is a pure function of the data, so the DuckDB oracle replays it
    * exactly: same quota arithmetic (floor∘sqrt is integer-exact on any
    * IEEE engine, unlike a POWER-sum formulation), same md5 hash order.
    * Output: the kept (doc_id, lang) sample.
    */
  val t10_mixture_resample = q("t10_mixture_resample",
    s"""WITH n AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY 1),
       |q AS (SELECT lang,
       |        LEAST(cnt, 8 * CAST(FLOOR(SQRT(cnt)) AS BIGINT)) AS quota
       |      FROM n),
       |r AS (SELECT doc_id, lang,
       |        ROW_NUMBER() OVER (PARTITION BY lang
       |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |      FROM documents)
       |SELECT r.doc_id, r.lang FROM r JOIN q USING (lang)
       |WHERE r.rn <= q.quota""".stripMargin) { (s, dir) =>
    graft.operators.Sampling.temperatureResample(
      Tables.documents(s, dir).select("doc_id", "lang"),
      strataCols = Seq("lang"), keyCols = Seq("doc_id"), scale = 8,
      hash = Some(md5(col("doc_id").cast("string").cast("binary"))))
  }

  // ---------------------------------------------------------------- t11
  /** BOILERPLATE MINING: the corpus-wide top-20 5-grams by document
    * frequency (+ total occurrences) — the diagnostic every web-scale
    * pipeline runs to find navigation chrome / license footers before
    * dedup, and the empirical input for sizing the LSH `maxBucketSize`
    * caps (a gram in 30% of documents IS the hot bucket). One exploded
    * projection, one partial-aggregated groupBy, then a 20-row
    * TakeOrdered — no full sort at any scale. Ties at the cut are broken
    * by the gram text itself, so the top-20 is a deterministic total
    * order any engine reproduces.
    */
  val t11_boilerplate_ngrams = q("t11_boilerplate_ngrams",
    s"""WITH w AS (SELECT doc_id, string_split(${normSql("text")}, ' ') AS toks FROM documents),
       |g AS (SELECT doc_id,
       |        unnest(CASE WHEN len(toks) >= 5
       |               THEN [array_to_string(toks[i:i+4], ' ') for i in range(1, len(toks) - 3)]
       |               ELSE [array_to_string(toks, ' ')] END) AS gram
       |      FROM w),
       |c AS (SELECT gram, COUNT(DISTINCT doc_id) AS doc_freq, COUNT(*) AS n
       |      FROM g GROUP BY 1)
       |SELECT gram, doc_freq, n FROM c
       |ORDER BY doc_freq DESC, n DESC, gram LIMIT 20""".stripMargin) { (s, dir) =>
    val n = 5
    val tokenized = Tables.documents(s, dir).select(col("doc_id"),
      split(TextFunctions.normalizeWs(col("text")), " ").as("__w"))
    val w = col("__w")
    // same two-step shape as NearDup.shingles (materialize the token array
    // before the generator so the split doesn't re-run per element), but
    // WITHOUT the distinct — occurrence counts need every instance
    val grams = when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*)))
      .otherwise(array(concat_ws(" ", w)))
    tokenized.select(col("doc_id"), explode(grams).as("gram"))
      .groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("doc_freq"), count(lit(1)).as("n"))
      .orderBy(col("doc_freq").desc, col("n").desc, col("gram"))
      .limit(20)
  }

  // ---------------------------------------------------------------- t12
  /** SEQUENCE PACKING (concatenate-and-chunk): every document's global
    * offset in the doc_id-ordered token stream and the 512-token training
    * sequences it occupies — the step between curation and an
    * autoregressive trainer. Engine side is the distributed two-pass
    * [[graft.operators.Packing.chunk]] (range sort + per-partition offsets
    * broadcast back; NO single-partition window — PackingSpec audits the
    * plan); the oracle replays it as one sequential window cumsum, which
    * only an oracle-scale engine can afford. Weights are t01's BPE-ish
    * token counts, so the packing is gated end-to-end against the same
    * tokenization the stats queries pin.
    */
  val t12_sequence_packing = q("t12_sequence_packing",
    s"""WITH t AS (SELECT doc_id,
       |             CAST(len(regexp_extract_all(text, '$tokenPat')) AS BIGINT) AS n_tokens
       |           FROM documents),
       |c AS (SELECT doc_id, n_tokens,
       |        CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
       |      FROM t)
       |SELECT doc_id, n_tokens, s AS stream_start,
       |  CAST(s // 512 AS BIGINT) AS seq_first,
       |  CAST((s + CASE WHEN n_tokens > 0 THEN n_tokens ELSE 1 END - 1) // 512 AS BIGINT) AS seq_last,
       |  CAST(CASE WHEN n_tokens = 0 THEN 0
       |       ELSE (s + n_tokens - 1) // 512 - s // 512 + 1 END AS BIGINT) AS n_seqs
       |FROM c""".stripMargin) { (s, dir) =>
    val weighted = Tables.documents(s, dir).select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    graft.operators.Packing.chunk(weighted, Seq(col("doc_id")), "n_tokens", 512L)
      .select("doc_id", "n_tokens", "stream_start", "seq_first", "seq_last", "n_seqs")
  }

  // ---------------------------------------------------------------- t13
  /** MATERIALIZED packed sequences — the other half of concatenate-and-
    * chunk: one row per (training sequence, document slice), which is what
    * a trainer's loader actually consumes (t12 only annotates each doc with
    * the sequences it spans). Engine side is
    * [[graft.operators.Packing.sequences]] (the two-pass positions plus a
    * row-local explode — no new exchange); the oracle replays the explode
    * with DuckDB's `generate_series` over each doc's occupied sequence
    * range and resolves the boundary arithmetic with GREATEST/LEAST.
    */
  val t13_packed_sequences = q("t13_packed_sequences",
    s"""WITH t AS (SELECT doc_id,
       |             CAST(len(regexp_extract_all(text, '$tokenPat')) AS BIGINT) AS n_tokens
       |           FROM documents),
       |c AS (SELECT doc_id, n_tokens,
       |        CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
       |      FROM t),
       |b AS (SELECT doc_id, n_tokens, s,
       |        CAST(s // 512 AS BIGINT) AS f,
       |        CAST((s + n_tokens - 1) // 512 AS BIGINT) AS l
       |      FROM c WHERE n_tokens > 0),
       |e AS (SELECT doc_id, n_tokens, s, CAST(u.seq_id AS BIGINT) AS seq_id
       |      FROM b, unnest(generate_series(b.f, b.l)) AS u(seq_id))
       |SELECT doc_id, n_tokens, s AS stream_start, seq_id,
       |  CAST(GREATEST(s, seq_id*512) - seq_id*512 AS BIGINT) AS offset_in_seq,
       |  CAST(GREATEST(s, seq_id*512) - s AS BIGINT) AS offset_in_doc,
       |  CAST(LEAST(s + n_tokens, (seq_id+1)*512) - GREATEST(s, seq_id*512) AS BIGINT) AS len_in_seq
       |FROM e""".stripMargin) { (s, dir) =>
    val weighted = Tables.documents(s, dir).select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    graft.operators.Packing.sequences(weighted, Seq(col("doc_id")), "n_tokens", 512L)
      .select("doc_id", "n_tokens", "stream_start", "seq_id",
        "offset_in_seq", "offset_in_doc", "len_in_seq")
  }

  // ---------------------------------------------------------------- t14
  /** DETERMINISTIC EPOCH SHUFFLE: every document's 1..n position in the
    * seed-42 epoch permutation — the reproducible global reshuffle a
    * pretraining loader runs per epoch ([[graft.operators.Sampling
    * .epochShuffle]]). The order is md5(seed || doc_id) so ANY engine
    * replays the identical permutation (the oracle does exactly that);
    * the position assignment is the distributed two-pass, not a global
    * window — the oracle's `row_number() OVER (ORDER BY ...)` is the
    * oracle-scale shortcut for what the engine computes without a
    * data-sized single-partition stage.
    */
  val t14_epoch_shuffle = q("t14_epoch_shuffle",
    """SELECT doc_id,
      |  CAST(row_number() OVER (
      |    ORDER BY md5('42|' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
      |    AS shuffle_pos
      |FROM documents""".stripMargin) { (s, dir) =>
    graft.operators.Sampling.epochShuffle(
        Tables.documents(s, dir).select("doc_id"), Seq("doc_id"), 42L,
        posCol = "shuffle_pos")
      .select("doc_id", "shuffle_pos")
  }

  // ---------------------------------------------------------------- t15
  /** CORPUS-LEVEL LINE DEDUP ([[graft.operators.LineDedup.dedupLines]],
    * the C4-style boilerplate cut) gated by INVARIANCE: every document
    * gets the same two boilerplate lines planted (a footer and a cookie
    * banner — the shape scraped web text actually has), and the operator
    * must return EXACTLY the original corpus — the planted lines appear
    * in every document (≥ minDocs) and vanish, while each document's own
    * text is unique in the corpus (d01 pins 500 distinct fingerprints at
    * this SF) and survives verbatim. The oracle is therefore the
    * untouched documents table: any over- or under-removal, ordering
    * slip, or dropped row breaks the hash.
    */
  val t15_line_dedup = q("t15_line_dedup",
    "SELECT doc_id, text FROM documents") { (s, dir) =>
    val planted = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("text"),
        lit("\nAll Rights Reserved. See terms for details."),
        lit("\nThis site uses cookies to improve your experience."))
        .as("text"))
    graft.operators.LineDedup.dedupLines(planted, "doc_id", "text", minDocs = 3)
      .select("doc_id", "text")
  }

  // ---------------------------------------------------------------- t16
  /** PER-LANGUAGE relative quality gate
    * ([[graft.operators.Checks.keepAboveQuantile]]): drop each language's
    * bottom quality quartile — the curation form that absolute thresholds
    * get wrong (a cutoff tuned on a high-resource language guts a
    * low-resource one whose score distribution sits lower). The cut is
    * rank-based (`cume_dist` > 0.25: keep rows whose ≤-score fraction
    * exceeds a quarter of their language), so it is integer-exact and the
    * oracle replays it with DuckDB's identical cume_dist — no quantile
    * interpolation to drift. Scores are t01/t02's exact mirrored quality
    * formula, so this gate is end-to-end consistent with the stats
    * queries.
    */
  val t16_quality_gate = q("t16_quality_gate",
    s"""WITH n AS (SELECT doc_id, lang, text, ${normSql("text")} AS norm FROM documents),
       |m AS (
       |  SELECT doc_id, lang, text,
       |    CASE WHEN length(norm) = 0 THEN 0
       |         ELSE len(string_split(norm, ' ')) END AS wc,
       |    len(regexp_extract_all(text, '$punctPat')) AS punct,
       |    len(regexp_extract_all(lower(norm), '$stopPat')) AS stop
       |  FROM n),
       |r AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN length(text) = 0 THEN 0.0
       |         ELSE CAST(punct AS DOUBLE) / CAST(length(text) AS DOUBLE) END AS pr,
       |    CASE WHEN wc = 0 THEN 0.0
       |         ELSE CAST(stop AS DOUBLE) / CAST(wc AS DOUBLE) END AS sr,
       |    CAST(length(text) AS DOUBLE) AS tl
       |  FROM m),
       |s AS (
       |  SELECT doc_id, lang,
       |    ROUND(least(tl / 500.0, 1.0) * 0.4
       |        + greatest(0.0, 1.0 - pr * 5.0) * 0.3
       |        + least(sr * 4.0, 1.0) * 0.3, 6) AS quality
       |  FROM r),
       |g AS (SELECT doc_id, lang, quality,
       |        cume_dist() OVER (PARTITION BY lang ORDER BY quality) AS cd
       |      FROM s)
       |SELECT doc_id, lang, quality FROM g WHERE cd > 0.25""".stripMargin) { (s, dir) =>
    val scored = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      TextFunctions.qualityScore(col("text")).as("quality"))
    graft.operators.Checks.keepAboveQuantile(scored, Seq("lang"), "quality", 0.25)
  }

  // ---------------------------------------------------------------- t17
  /** Overlapping token chunking ([[graft.operators.Chunking.chunkTokens]]):
    * split every document into 32-token context windows with an 8-token
    * overlap (stride 24) — the RAG / pretraining ingestion splitter. Pure
    * per-row column algebra (`sequence` of starts → `posexplode` → `slice`),
    * zero shuffle; the oracle replays the identical stride rule with
    * DuckDB's exclusive-stop `range(0, n, 24)`, which enumerates the same
    * starts as Spark's inclusive `sequence(0, n-1, 24)`.
    */
  val t17_doc_chunking = q("t17_doc_chunking",
    s"""WITH n AS (SELECT doc_id, ${normSql("text")} AS norm FROM documents),
       |w AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM n
       |      WHERE length(norm) > 0),
       |s AS (SELECT doc_id, toks, len(toks) AS n,
       |        unnest(range(0, len(toks), 24)) AS st FROM w)
       |SELECT doc_id,
       |  CAST(st / 24 AS INT) AS chunk_id,
       |  CAST(st AS INT) AS start_tok,
       |  CAST(least(32, n - st) AS INT) AS n_tokens,
       |  array_to_string(list_slice(toks, st + 1, st + 32), ' ') AS chunk_text
       |FROM s""".stripMargin) { (s, dir) =>
    graft.operators.Chunking.chunkTokens(
      Tables.documents(s, dir), col("text"), Seq("doc_id"),
      size = 32, overlap = 8)
  }

  // ---------------------------------------------------------------- t18
  /** Hashed bag-of-words linear scorer
    * ([[graft.operators.HashedLinearScorer]]): the serving side of a
    * fastText/CCNet-style quality classifier — 64 hashed feature slots,
    * integer weights over denominator 1000003 (exact cross-engine sums),
    * mean-weight logit, sigmoid(8·logit) calibration, integer-exact keep
    * gate. The weight vector here is the deterministic synthetic stand-in
    * (production swaps in trained weights as a broadcast literal array);
    * the oracle replays the full hash → weight → exact-sum → calibrate
    * pipeline in SQL.
    */
  val t18_quality_classifier = q("t18_quality_classifier",
    s"""WITH n AS (SELECT doc_id, ${normSql("text")} AS norm FROM documents),
       |tk AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS tok
       |       FROM n WHERE length(norm) > 0),
       |h AS (SELECT doc_id,
       |        list_reduce(
       |          list_prepend(CAST(0 AS BIGINT),
       |            [CAST(ascii(substr(tok, CAST(i AS INT), 1)) AS BIGINT)
       |             for i in range(1, CAST(length(tok) AS INT) + 1)]),
       |          (acc, x) -> (acc * 31 + x) % 1000000007) % 64 AS b
       |      FROM tk),
       |w AS (SELECT doc_id, (b * 2654435761) % 1000003 - 500001 AS w FROM h),
       |g AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_tokens, SUM(w) AS s
       |      FROM w GROUP BY doc_id)
       |SELECT doc_id, n_tokens,
       |  ROUND(s / (n_tokens * 1000003.0), 6) AS score,
       |  ROUND(1.0 / (1.0 + exp(s / (n_tokens * 1000003.0) * -8.0)), 6) AS prob,
       |  (s >= 0) AS keep
       |FROM g""".stripMargin) { (s, dir) =>
    import graft.operators.HashedLinearScorer
    HashedLinearScorer.score(Tables.documents(s, dir), "doc_id", "text",
      buckets = 64, weightInt = HashedLinearScorer.syntheticWeightInt(1000003L),
      den = 1000003L, calib = 8.0)
  }

  // ---------------------------------------------------------------- t19
  /** Exact-substring span REMOVAL (Lee et al. 2022, apply side of d15):
    * every token position covered by an 8-token window duplicated across
    * ≥2 documents is dropped; survivors re-join with single spaces. The
    * oracle rebuilds the cleaned text in DuckDB with a position-set
    * list comprehension — string-exact agreement proves the engine's
    * in-row token filter.
    */
  val t19_span_removal = q("t19_span_removal",
    s"""WITH t AS (SELECT doc_id,
       |        [x for x in string_split(${normSql("text")}, ' ') if x <> ''] AS toks
       |      FROM documents),
       |b AS (SELECT doc_id, toks FROM t),
       |w0 AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 7)) AS s
       |       FROM b WHERE len(toks) >= 8),
       |w AS (SELECT doc_id, s, array_to_string(toks[s+1:s+8], ' ') AS w FROM w0),
       |dup AS (SELECT w FROM w GROUP BY w HAVING count(DISTINCT doc_id) >= 2),
       |ds AS (SELECT doc_id, s FROM w WHERE w IN (SELECT w FROM dup)),
       |p AS (SELECT doc_id, list(DISTINCT pos) AS ps
       |      FROM (SELECT doc_id, unnest(range(s, s + 8)) AS pos FROM ds)
       |      GROUP BY doc_id)
       |SELECT b.doc_id,
       |  coalesce(array_to_string(
       |    [b.toks[CAST(i AS INT) + 1] for i in range(0, len(b.toks))
       |     if p.ps IS NULL OR NOT list_contains(p.ps, i)], ' '), '') AS text,
       |  coalesce(len(p.ps), 0) AS removed_tokens
       |FROM b LEFT JOIN p USING (doc_id)""".stripMargin) { (s, dir) =>
    graft.operators.SpanDedup.removeSpans(
      Tables.documents(s, dir), "doc_id", "text", n = 8, minDocs = 2)
  }

  // ---------------------------------------------------------------- t20
  /** Bigram stupid-backoff likelihood scoring (CCNet-style LM quality
    * filter): even-id documents are the reference corpus, odd-id
    * documents are scored against its bigram/unigram counts. Exact
    * DECIMAL accumulation of IEEE-exact quotients makes the double
    * score bit-identical across engines.
    */
  /** Shared DuckDB mirror of [[graft.operators.NgramLm
    * .scoreStupidBackoff]] over the even/odd corpus split — CTEs ending
    * in `lmscore(doc_id, n_bigrams, n_hit, score)`; t20 selects it
    * directly, t42 composes the qcut bucketing on top.
    */
  private def lmScoreSqlCtes: String =
    s"""n AS (SELECT doc_id,
       |        [x for x in string_split(lower(${normSql("text")}), ' ') if x <> ''] AS toks
       |      FROM documents),
       |ref AS (SELECT doc_id, toks FROM n WHERE doc_id % 2 = 0),
       |tgt AS (SELECT doc_id, toks FROM n WHERE doc_id % 2 = 1 AND len(toks) >= 2),
       |uni AS (SELECT u, count(*) AS cu
       |        FROM (SELECT unnest(toks) AS u FROM ref) GROUP BY u),
       |tot AS (SELECT count(*) AS t FROM (SELECT unnest(toks) AS u FROM ref)),
       |bref AS (SELECT toks[CAST(i AS INT) + 1] AS u, toks[CAST(i AS INT) + 2] AS v
       |         FROM (SELECT toks, unnest(range(0, len(toks) - 1)) AS i
       |               FROM ref WHERE len(toks) >= 2)),
       |big AS (SELECT u, v, count(*) AS cb FROM bref GROUP BY u, v),
       |btgt AS (SELECT doc_id, toks[CAST(i AS INT) + 1] AS u,
       |                toks[CAST(i AS INT) + 2] AS v
       |         FROM (SELECT doc_id, toks, unnest(range(0, len(toks) - 1)) AS i
       |               FROM tgt)),
       |p AS (SELECT doc_id, (cb IS NOT NULL) AS hit,
       |        CASE WHEN cb IS NOT NULL
       |             THEN CAST(cb AS DOUBLE) / CAST(u1.cu AS DOUBLE)
       |             ELSE 0.4 * (CAST(coalesce(u2.cu, 0) AS DOUBLE) / CAST(tot.t AS DOUBLE))
       |        END AS p
       |      FROM btgt
       |      LEFT JOIN big USING (u, v)
       |      LEFT JOIN uni u1 ON btgt.u = u1.u
       |      LEFT JOIN uni u2 ON btgt.v = u2.u
       |      CROSS JOIN tot),
       |lmscore AS (SELECT doc_id, count(*) AS n_bigrams,
       |  count(*) FILTER (WHERE hit) AS n_hit,
       |  CAST(SUM(CAST(p AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS score
       |FROM p GROUP BY doc_id)""".stripMargin

  val t20_lm_likelihood = q("t20_lm_likelihood",
    s"""WITH $lmScoreSqlCtes
       |SELECT doc_id, n_bigrams, n_hit, score FROM lmscore""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    graft.operators.NgramLm.scoreStupidBackoff(
      docs.filter(col("doc_id") % 2 === 1), docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text")
  }

  // ---------------------------------------------------------------- t21
  /** WITHIN-document line dedup (the Gopher-style intra-doc repetition
    * cut t09 MEASURES): keep each line's first occurrence inside its own
    * document, drop later repeats — entirely row-local column algebra
    * (filter-with-index + array_slice first-occurrence test), zero
    * shuffle, so at 100 TB it rides the scan stage. The corpus-level
    * cross-document cut is t15; this is its per-document complement.
    */
  val t21_within_doc_dedup = q("t21_within_doc_dedup",
    s"""WITH p AS (SELECT doc_id,
       |        text || chr(10) || 'Repeated call to action.' || chr(10)
       |             || 'Unique closing thought.' || chr(10)
       |             || 'repeated CALL to action.' AS text
       |      FROM documents),
       |l AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM p)
       |SELECT doc_id,
       |  array_to_string(
       |    [ls[CAST(i AS INT) + 1] for i in range(0, len(ls))
       |     if trim(ls[CAST(i AS INT) + 1]) = ''
       |        OR list_position(
       |             [lower(trim(x)) for x in ls[1:CAST(i AS INT) + 1]],
       |             lower(trim(ls[CAST(i AS INT) + 1]))) = CAST(i AS INT) + 1],
       |    chr(10)) AS text
       |FROM l""".stripMargin) { (s, dir) =>
    val ls = split(col("text"), "\n")
    val norm = transform(ls, x => lower(trim(x)))
    // plant an intra-document repeat (case-varied: the dedup is on the
    // normalized form) so the cut is exercised on every document
    Tables.documents(s, dir).select(col("doc_id"),
        concat(col("text"), lit("\nRepeated call to action."),
          lit("\nUnique closing thought."),
          lit("\nrepeated CALL to action.")).as("text"))
      .select(col("doc_id"),
      array_join(
        filter(ls, (x, i) =>
          trim(x) === "" ||
            array_position(slice(norm, lit(1), i + 1), lower(trim(x))) === i + 1),
        "\n").as("text"))
  }

  // ---------------------------------------------------------------- t22
  /** Trigram stupid backoff (the full Brants chain one level above
    * t20): seen trigram → C(uvw)/C(uv); bigram backoff → 0.4·C(vw)/C(v);
    * unigram backoff → 0.4·0.4·C(w)/T. Fixed IEEE op order + DECIMAL
    * accumulation keep the double score hash-exact across engines.
    */
  val t22_lm_trigram = q("t22_lm_trigram",
    s"""WITH n AS (SELECT doc_id,
       |        [x for x in string_split(lower(${normSql("text")}), ' ') if x <> ''] AS toks
       |      FROM documents),
       |ref AS (SELECT doc_id, toks FROM n WHERE doc_id % 2 = 0),
       |tgt AS (SELECT doc_id, toks FROM n WHERE doc_id % 2 = 1 AND len(toks) >= 3),
       |uni AS (SELECT u, count(*) AS cu
       |        FROM (SELECT unnest(toks) AS u FROM ref) GROUP BY u),
       |tot AS (SELECT count(*) AS t FROM (SELECT unnest(toks) AS u FROM ref)),
       |bref AS (SELECT toks[CAST(i AS INT) + 1] AS u, toks[CAST(i AS INT) + 2] AS v
       |         FROM (SELECT toks, unnest(range(0, len(toks) - 1)) AS i
       |               FROM ref WHERE len(toks) >= 2)),
       |big AS (SELECT u, v, count(*) AS cb FROM bref GROUP BY u, v),
       |tref AS (SELECT toks[CAST(i AS INT) + 1] AS u, toks[CAST(i AS INT) + 2] AS v,
       |                toks[CAST(i AS INT) + 3] AS w
       |         FROM (SELECT toks, unnest(range(0, len(toks) - 2)) AS i
       |               FROM ref WHERE len(toks) >= 3)),
       |tri AS (SELECT u, v, w, count(*) AS ct FROM tref GROUP BY u, v, w),
       |ttgt AS (SELECT doc_id, toks[CAST(i AS INT) + 1] AS u,
       |                toks[CAST(i AS INT) + 2] AS v, toks[CAST(i AS INT) + 3] AS w
       |         FROM (SELECT doc_id, toks, unnest(range(0, len(toks) - 2)) AS i
       |               FROM tgt)),
       |p AS (SELECT doc_id,
       |        (tri.ct IS NOT NULL) AS hit3,
       |        (tri.ct IS NULL AND b23.cb IS NOT NULL) AS hit2,
       |        CASE WHEN tri.ct IS NOT NULL
       |             THEN CAST(tri.ct AS DOUBLE) / CAST(b12.cb AS DOUBLE)
       |             WHEN b23.cb IS NOT NULL
       |             THEN 0.4 * (CAST(b23.cb AS DOUBLE) / CAST(u2.cu AS DOUBLE))
       |             ELSE 0.4 * (0.4 * (CAST(coalesce(u3.cu, 0) AS DOUBLE)
       |                                / CAST(tot.t AS DOUBLE)))
       |        END AS p
       |      FROM ttgt
       |      LEFT JOIN tri USING (u, v, w)
       |      LEFT JOIN big b12 ON ttgt.u = b12.u AND ttgt.v = b12.v
       |      LEFT JOIN big b23 ON ttgt.v = b23.u AND ttgt.w = b23.v
       |      LEFT JOIN uni u2 ON ttgt.v = u2.u
       |      LEFT JOIN uni u3 ON ttgt.w = u3.u
       |      CROSS JOIN tot)
       |SELECT doc_id, count(*) AS n_trigrams,
       |  count(*) FILTER (WHERE hit3) AS n_hit3,
       |  count(*) FILTER (WHERE hit2) AS n_hit2,
       |  CAST(SUM(CAST(p AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS score
       |FROM p GROUP BY doc_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    graft.operators.NgramLm.scoreStupidBackoffTrigram(
      docs.filter(col("doc_id") % 2 === 1), docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text")
  }

  // ---------------------------------------------------------------- t23
  /** INVERTED INDEX build ([[graft.operators.Retrieval.postings]]): the
    * posting-list relation (term, doc_id, tf) joined with per-term document
    * frequencies — the persistable search index the t24/t25 queries probe.
    * Plan: tokenize is scan-stage column work, ONE (term, doc_id) shuffle
    * builds the lists, df is a per-term fold of the postings themselves
    * (the text is never rescanned). The relation is additive over disjoint
    * document batches, so incremental ingest is a parquet append.
    */
  val t23_inverted_index = q("t23_inverted_index",
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(lower(${normSql("text")}), ' ')) AS term
       |  FROM documents),
       |p AS (SELECT term, doc_id, COUNT(*) AS tf
       |      FROM toks WHERE length(term) > 0 GROUP BY 1, 2),
       |d AS (SELECT term, COUNT(*) AS df FROM p GROUP BY 1)
       |SELECT p.term, p.doc_id, p.tf, d.df
       |FROM p JOIN d USING (term)""".stripMargin) { (s, dir) =>
    val post = graft.operators.Retrieval.postings(
      Tables.documents(s, dir), "doc_id", "text")
    post.join(broadcast(graft.operators.Retrieval.documentFrequencies(post)), "term")
      .select("term", "doc_id", "tf", "df")
  }

  // ---------------------------------------------------------------- t24
  /** CONJUNCTIVE KEYWORD SEARCH over the inverted index: documents containing
    * ALL of {dup, vector, spark} — posting-list intersection by count-match.
    * The filter prunes the posting relation to three lists in the scan stage;
    * the only shuffle is doc-keyed over those lists. Document text never
    * participates.
    */
  val t24_keyword_search = q("t24_keyword_search",
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(lower(${normSql("text")}), ' ')) AS term
       |  FROM documents),
       |p AS (SELECT DISTINCT term, doc_id FROM toks WHERE length(term) > 0)
       |SELECT doc_id FROM p WHERE term IN ('dup', 'vector', 'spark')
       |GROUP BY doc_id HAVING COUNT(DISTINCT term) = 3""".stripMargin) { (s, dir) =>
    val post = graft.operators.Retrieval.postings(
      Tables.documents(s, dir), "doc_id", "text")
    graft.operators.Retrieval.searchAll(post, "doc_id", Seq("dup", "vector", "spark"))
  }

  // ---------------------------------------------------------------- t25
  /** BM25 RANKED SEARCH: top-20 documents for the query {dup, merge, scan}
    * under classic Robertson idf with k1 = 1.5, b = 0.75 (both exact in
    * binary64, so the oracle's constants are bit-identical). Per-term float
    * scores accumulate through DECIMAL(18,9) (the NgramLm idiom) — summation
    * order cannot diverge between engines — and surface rounded to 6 dp.
    * Plan: posting prune → broadcast df/corpus-stats → one doc-keyed shuffle
    * → TakeOrdered(20).
    */
  val t25_bm25_search = q("t25_bm25_search",
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(lower(${normSql("text")}), ' ')) AS term
       |  FROM documents),
       |tk AS (SELECT doc_id, term FROM toks WHERE length(term) > 0),
       |dl AS (SELECT d.doc_id, COALESCE(t.c, 0) AS dl
       |       FROM documents d
       |       LEFT JOIN (SELECT doc_id, COUNT(*) AS c FROM tk GROUP BY 1) t USING (doc_id)),
       |st AS (SELECT COUNT(*) AS n, SUM(dl) AS tdl FROM dl),
       |p AS (SELECT term, doc_id, COUNT(*) AS tf FROM tk
       |      WHERE term IN ('dup', 'merge', 'scan') GROUP BY 1, 2),
       |df AS (SELECT term, COUNT(*) AS df FROM p GROUP BY 1),
       |sc AS (
       |  SELECT p.doc_id,
       |    (ln(1.0 + (CAST(st.n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
       |              / (CAST(df.df AS DOUBLE) + 0.5))
       |      * (CAST(p.tf AS DOUBLE) * 2.5))
       |    / (CAST(p.tf AS DOUBLE)
       |       + (1.5 * (0.25 + ((0.75 * CAST(dl.dl AS DOUBLE))
       |                         / (CAST(st.tdl AS DOUBLE) / CAST(st.n AS DOUBLE)))))) AS tscore
       |  FROM p JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st)
       |SELECT doc_id,
       |  ROUND(CAST(SUM(CAST(tscore AS DECIMAL(18,9))) AS DOUBLE), 6) AS bm25
       |FROM sc GROUP BY doc_id
       |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val post = graft.operators.Retrieval.postings(docs, "doc_id", "text")
    val dl = graft.operators.Retrieval.docLengths(docs, "doc_id", "text")
    graft.operators.Retrieval.bm25TopK(post, dl, "doc_id",
      Seq("dup", "merge", "scan"), 20)
  }

  // ---------------------------------------------------------------- t26
  /** BPE TOKENIZER TRAINING (Sennrich et al. 2016): the 60-merge table
    * learned from the corpus' word-frequency relation — ONE corpus
    * aggregate, then the merge loop over the Zipf-bounded vocabulary
    * ([[graft.operators.Bpe]]). The loop is data-dependent iterative
    * argmax — no SQL twin exists → committed golden parquet
    * ([[GoldenOracles]]); BpeSpec pins the algorithm against a naive
    * direct port of the paper's pseudocode, and determinism
    * (exact integer counts + lexicographic tie-break) makes the golden
    * partitioning-stable.
    */
  val t26_bpe_merges = GraftQuery("t26_bpe_merges", (s, dir) => {
    import graft.operators.Bpe
    Bpe.mergesDf(s,
      Bpe.learn(Bpe.wordCounts(Tables.documents(s, dir), "text"), 60))
  }, GoldenOracles.sqlFor("t26_bpe_merges"))

  // ---------------------------------------------------------------- t27
  /** BPE segmentation with the trained table: per-document token and
    * distinct-token counts under greedy lowest-rank inference
    * ([[graft.plans.BpeEncodeExpr]] — row-local, rides the scan stage).
    * Golden-gated for the same reason as t26 (the merge table has no SQL
    * twin); BpeSpec proves encode reproduces training-time segmentation
    * and that tokens concatenate back to the source words.
    */
  val t27_bpe_encode = GraftQuery("t27_bpe_encode", (s, dir) => {
    import graft.operators.Bpe
    val docs = Tables.documents(s, dir)
    val merges = Bpe.learn(Bpe.wordCounts(docs, "text"), 60)
    docs.select(col("doc_id"), Bpe.encode(col("text"), merges).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_types"))
  }, GoldenOracles.sqlFor("t27_bpe_encode"))

  // ---------------------------------------------------------------- t52
  /** BYTE-LEVEL BPE vs the word-level trainer — tokenizer-fidelity
    * widening ([[graft.plans.BytePretokenizeExpr]]): the GPT-2-lineage
    * pre-tokenizer (regex class split, byte alphabet, no lowercasing)
    * feeds the UNCHANGED merge loop and codegen encoder, and the query
    * prices both segmentations side by side per document — token counts
    * under the t26 word-level table and under the byte-level table
    * trained at the same merge budget, plus the per-doc byte-level type
    * count. Golden-gated like t26/t27 (merge tables have no SQL twin);
    * ByteBpeSpec carries the written DIFFERENCE fixture (where and why
    * the two segmentations disagree: case, punctuation, contractions,
    * leading-space attachment, multilingual bytes).
    */
  val t52_byte_bpe = GraftQuery("t52_byte_bpe", (s, dir) => {
    import graft.operators.Bpe
    val docs = Tables.documents(s, dir)
    val wordMerges = Bpe.learn(Bpe.wordCounts(docs, "text"), 60)
    val byteMerges = Bpe.learn(Bpe.byteWordCounts(docs, "text"), 60)
    docs.select(col("doc_id"),
        size(Bpe.encode(col("text"), wordMerges)).cast("long")
          .as("n_word_bpe"),
        Bpe.byteEncode(col("text"), byteMerges).as("__btoks"))
      .select(col("doc_id"), col("n_word_bpe"),
        size(col("__btoks")).cast("long").as("n_byte_bpe"),
        size(array_distinct(col("__btoks"))).cast("long")
          .as("n_byte_types"))
  }, GoldenOracles.sqlFor("t52_byte_bpe"))

  // ---------------------------------------------------------------- t28
  /** SPARSE-VECTOR SIMILARITY SEARCH: top-10 documents most similar to
    * doc 0 by TF-IDF cosine, computed entirely on the inverted index
    * ([[graft.operators.Retrieval.tfidfCosineTopK]]) — the sparse sibling
    * of the dense ANN family: the posting relation IS the vector store,
    * the query document's weighted terms broadcast, and the dot products
    * are one semi-pruned doc-keyed aggregate. DECIMAL-folded products
    * make the double scores replay bit-for-bit (the BM25 recipe).
    */
  val t28_tfidf_cosine = q("t28_tfidf_cosine",
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(lower(${normSql("text")}), ' ')) AS term
       |  FROM documents),
       |p AS (SELECT term, doc_id, COUNT(*) AS tf
       |      FROM toks WHERE length(term) > 0 GROUP BY 1, 2),
       |d AS (SELECT term, COUNT(*) AS df FROM p GROUP BY 1),
       |nn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM p),
       |w AS (SELECT p.term, p.doc_id,
       |        CAST(p.tf AS DOUBLE) * ln(CAST(nn.n AS DOUBLE) / CAST(d.df AS DOUBLE)) AS w
       |      FROM p JOIN d USING (term) CROSS JOIN nn),
       |nrm AS (SELECT doc_id, sqrt(CAST(SUM(CAST(w * w AS DECIMAL(28,12))) AS DOUBLE)) AS nr
       |        FROM w GROUP BY 1),
       |q AS (SELECT term, w AS wq FROM w WHERE doc_id = 0),
       |qn AS (SELECT nr AS qnr FROM nrm WHERE doc_id = 0),
       |dots AS (SELECT w.doc_id, CAST(SUM(CAST(w.w * q.wq AS DECIMAL(28,12))) AS DOUBLE) AS dot
       |         FROM w JOIN q USING (term) WHERE w.doc_id <> 0 GROUP BY 1)
       |SELECT dots.doc_id, ROUND(dot / (nr * qnr), 6) AS cos_sim
       |FROM dots JOIN nrm USING (doc_id) CROSS JOIN qn
       |ORDER BY cos_sim DESC, doc_id LIMIT 10""".stripMargin) { (s, dir) =>
    graft.operators.Retrieval.tfidfCosineTopK(
      graft.operators.Retrieval.postings(Tables.documents(s, dir), "doc_id", "text"),
      "doc_id", queryDoc = 0L, k = 10)
  }

  // ---------------------------------------------------------------- t29
  /** EXACT PHRASE SEARCH on the POSITIONAL index
    * ([[graft.operators.Retrieval.positionalPostings]]/`phraseSearch`) —
    * the phrase tier Lucene stores term positions for; the query phrase
    * "table table" deliberately repeats a word so the slot algebra (slot i
    * contributes its term's postings shifted by i; a (doc, start) covered
    * by all k distinct slots is an occurrence) is what the oracle checks,
    * overlapping occurrences included. Same bounded-shuffle shape as t24:
    * two pruned posting lists, one (doc, start) aggregate, no text.
    */
  val t29_phrase_search = q("t29_phrase_search",
    s"""WITH n AS (SELECT doc_id, string_split(lower(${normSql("text")}), ' ') AS toks
       |           FROM documents),
       |p AS (SELECT doc_id, u.i AS pos, toks[u.i] AS term
       |      FROM n, unnest(range(1, len(toks) + 1)) AS u(i)
       |      WHERE length(toks[u.i]) > 0),
       |s AS (
       |  SELECT doc_id, pos AS start, 0 AS slot FROM p WHERE term = 'table'
       |  UNION ALL
       |  SELECT doc_id, pos - 1 AS start, 1 AS slot FROM p WHERE term = 'table'),
       |occ AS (SELECT doc_id, start FROM s
       |        GROUP BY doc_id, start HAVING COUNT(DISTINCT slot) = 2)
       |SELECT doc_id, COUNT(*) AS n_occurrences
       |FROM occ GROUP BY doc_id""".stripMargin) { (s, dir) =>
    graft.operators.Retrieval.phraseSearch(
      graft.operators.Retrieval.positionalPostings(
        Tables.documents(s, dir), "doc_id", "text"),
      "doc_id", Seq("table", "table"))
  }

  // ---------------------------------------------------------------- t30
  /** CLASSIFIER EVALUATION: per-language precision / recall / F1 of the
    * t03 lang-id heuristic against the corpus' gold `lang` labels — the
    * eval table every curation filter ships with (a filter's quality
    * claims are these three numbers). One pass for the confusion
    * marginals (gold counts, predicted counts, diagonal), classes =
    * gold ∪ predicted (so a predicted-only class like 'und' gets its
    * zero-recall row); metrics are single fixed-order double divisions
    * off exact counts, F1 from the UNROUNDED p/r — bit-parity with the
    * DuckDB mirror.
    */
  val t30_langid_eval = q("t30_langid_eval",
    s"""WITH n AS (SELECT doc_id, lang, text, lower(${normSql("text")}) AS toks FROM documents),
       |h AS (
       |  SELECT doc_id, lang, text,
       |    len(regexp_extract_all(toks, '\\b(the|and|of|is|with)\\b')) AS hen,
       |    len(regexp_extract_all(toks, '\\b(le|la|et|les|des)\\b')) AS hfr,
       |    len(regexp_extract_all(toks, '\\b(el|los|las|una|y)\\b')) AS hes,
       |    len(regexp_extract_all(toks, '\\b(der|die|und|das|ist)\\b')) AS hde
       |  FROM n),
       |p AS (SELECT lang,
       |  CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
       |       WHEN hen + hfr + hes + hde = 0 THEN 'und'
       |       WHEN hen >= hfr AND hen >= hes AND hen >= hde THEN 'en'
       |       WHEN hfr >= hes AND hfr >= hde THEN 'fr'
       |       WHEN hes >= hde THEN 'es'
       |       ELSE 'de' END AS lang_pred
       |  FROM h),
       |g AS (SELECT lang AS cls, COUNT(*) AS n_gold FROM p GROUP BY 1),
       |pc AS (SELECT lang_pred AS cls, COUNT(*) AS n_pred FROM p GROUP BY 1),
       |tpc AS (SELECT lang AS cls, COUNT(*) AS tp FROM p WHERE lang = lang_pred GROUP BY 1),
       |c AS (SELECT cls FROM g UNION SELECT cls FROM pc),
       |m AS (
       |  SELECT c.cls, coalesce(g.n_gold, 0) AS n_gold,
       |    coalesce(pc.n_pred, 0) AS n_pred, coalesce(tpc.tp, 0) AS tp
       |  FROM c LEFT JOIN g USING (cls) LEFT JOIN pc USING (cls)
       |  LEFT JOIN tpc USING (cls)),
       |r AS (
       |  SELECT cls, n_gold, n_pred, tp,
       |    CASE WHEN n_pred > 0 THEN CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE) END AS praw,
       |    CASE WHEN n_gold > 0 THEN CAST(tp AS DOUBLE) / CAST(n_gold AS DOUBLE) END AS rraw
       |  FROM m)
       |SELECT cls AS lang, n_gold, n_pred, tp,
       |  ROUND(praw, 6) AS prec, ROUND(rraw, 6) AS rec,
       |  CASE WHEN praw IS NOT NULL AND rraw IS NOT NULL AND praw + rraw > 0
       |       THEN ROUND(2.0 * praw * rraw / (praw + rraw), 6) END AS f1
       |FROM r""".stripMargin) { (s, dir) =>
    val p = Tables.documents(s, dir).select(col("lang"),
      TextFunctions.langId(col("text")).as("lang_pred"))
    val g = p.groupBy(col("lang").as("cls")).agg(count(lit(1)).as("n_gold"))
    val pc = p.groupBy(col("lang_pred").as("cls")).agg(count(lit(1)).as("n_pred"))
    val tpc = p.filter(col("lang") === col("lang_pred"))
      .groupBy(col("lang").as("cls")).agg(count(lit(1)).as("tp"))
    val cls = g.select("cls").unionByName(pc.select("cls")).distinct()
    val m = cls.join(g, Seq("cls"), "left").join(pc, Seq("cls"), "left")
      .join(tpc, Seq("cls"), "left")
      .select(col("cls"), coalesce(col("n_gold"), lit(0L)).as("n_gold"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
    val praw = when(col("n_pred") > 0,
      col("tp").cast("double") / col("n_pred").cast("double"))
    val rraw = when(col("n_gold") > 0,
      col("tp").cast("double") / col("n_gold").cast("double"))
    m.select(col("cls").as("lang"), col("n_gold"), col("n_pred"), col("tp"),
      round(praw, 6).as("prec"), round(rraw, 6).as("rec"),
      when(praw.isNotNull && rraw.isNotNull && praw + rraw > 0,
        round(lit(2.0) * praw * rraw / (praw + rraw), 6)).as("f1"))
  }

  // ---------------------------------------------------------------- t31
  /** UNICODE NORMALIZATION ([[graft.plans.UnicodeNormalizeExpr]]): every
    * document gets a deterministic suffix of DECOMPOSED sequences
    * ("cafe"+U+0301, "u"+U+0308) plus an NFC-invariant ligature (U+FB01),
    * built identically on both engines (Scala \\u escapes vs DuckDB
    * `chr()`), then NFC-normalized — so the oracle genuinely exercises
    * composition, not identity on ASCII corpus text. Outputs: the NFC
    * text, the accent-fold (combining marks removed — DuckDB
    * `strip_accents`), byte lengths before/after (NFC shrinks the
    * decomposed pairs), and the NFC-aware content fingerprint
    * ([[graft.functions.TextFunctions.fingerprint]] with
    * `unicodeNfc = true`) that makes canonically-equivalent byte forms
    * dedup together.
    */
  val t31_unicode_normalize = q("t31_unicode_normalize",
    s"""WITH d AS (SELECT doc_id,
       |    text || ' cafe' || chr(769) || ' u' || chr(776) || 'ber ' ||
       |      chr(64257) || 'ne' AS raw
       |  FROM documents),
       |n AS (SELECT doc_id, raw, nfc_normalize(raw) AS norm_text FROM d)
       |SELECT doc_id, norm_text,
       |  strip_accents(norm_text) AS folded,
       |  CAST(strlen(raw) AS INT) AS bytes_raw,
       |  CAST(strlen(norm_text) AS INT) AS bytes_nfc,
       |  md5(lower(${normSql("norm_text")})) AS fp
       |FROM n""".stripMargin) { (s, dir) =>
    // DECOMPOSED suffix (combining acute / diaeresis + fi ligature) \u2014
    // byte-identical to the oracle's chr() construction
    val raw = concat(col("text"),
      lit(" cafe\u0301 u\u0308ber \uFB01ne"))
    Tables.documents(s, dir).select(col("doc_id"), raw.as("raw"))
      .withColumn("norm_text", TextFunctions.normalizeUnicode(col("raw")))
      .select(col("doc_id"), col("norm_text"),
        TextFunctions.normalizeUnicode(col("norm_text"), "NFC",
          stripAccents = true).as("folded"),
        octet_length(col("raw")).as("bytes_raw"),
        octet_length(col("norm_text")).as("bytes_nfc"),
        TextFunctions.fingerprint(col("raw"), unicodeNfc = true).as("fp"))
  }

  // ---------------------------------------------------------------- t32
  /** IN-ENGINE CLASSIFIER TRAINING
    * ([[graft.operators.HashedLinearScorer.trainRidge]]): the closed-form
    * ridge fit of the hashed-BoW gate on in-warehouse labels — the CCNet
    * move of distilling an expensive quality rule into a cheap linear
    * scorer. Even doc_ids train (y = ±1 on "stopword ratio ≥ the train
    * split's exact median" — the natural-language-likeness gate, and a
    * label GENUINELY linear in the serving features, unlike the corpus'
    * `lang` column whose text is language-independent by construction);
    * odd doc_ids are scored held-out with the quantized weights through
    * t18's exact integer serving path. Deterministic end to end: the
    * normal-equation moments are DECIMAL folds of partition-independent
    * per-row values (HashedLinearScorerSpec invariance law), the Cholesky
    * is a fixed scalar sequence, scoring is integer-exact — hence
    * golden-gated (the solve has no SQL twin). The spec proves the
    * trained vector beats t18's synthetic stand-in on held-out
    * accuracy/F1.
    */
  val t32_classifier_train = GraftQuery("t32_classifier_train", (s, dir) => {
    import graft.operators.HashedLinearScorer
    val docs = Tables.documents(s, dir)
      .withColumn("__sw", TextFunctions.stopwordRatio(col("text")))
    val train = docs.filter(col("doc_id") % 2 === 0)
    val med = train.select(expr("percentile(__sw, 0.5)")).head.getDouble(0)
    val labeled = train.withColumn("__y",
      when(col("__sw") >= med, lit(1)).otherwise(lit(-1)))
    val weights = HashedLinearScorer.trainRidge(labeled, "doc_id", "text",
      "__y", buckets = 64, lambda = 0.1, den = 1000003L)
    val heldOut = docs.filter(col("doc_id") % 2 =!= 0)
    HashedLinearScorer.score(heldOut, "doc_id", "text", buckets = 64,
        weightInt = HashedLinearScorer.literalWeightInt(weights),
        den = 1000003L, calib = 8.0)
      .join(heldOut.select(col("doc_id"), (col("__sw") >= med).as("gold_keep")),
        "doc_id")
  }, GoldenOracles.sqlFor("t32_classifier_train"))

  // ---------------------------------------------------------------- t33
  /** HYBRID RETRIEVAL with RECIPROCAL-RANK FUSION (Cormack et al. 2009 —
    * the RAG-stack standard for combining lexical and dense rankers):
    * the BM25 top-50 (t25's scorer) and the embedding-cosine top-50
    * (e01's scorer, restricted to vectors whose id IS a document id)
    * fuse by RRF(d) = Σ 1/(60 + rank_i(d)), missing-from-a-list
    * contributes 0. Ranks are computed on the ROUNDED scores with id
    * tie-breaks, so both engines cut the same top-k and assign identical
    * ranks; the fusion arithmetic is two IEEE terms added in a fixed
    * order. The rank windows run over k=50 rows (bounded by
    * construction — not a data-sized single partition); at 100 TB each
    * leg is its own TakeOrdered over the posting store / ANN index and
    * fusion touches 2k rows.
    */
  val t33_hybrid_rrf = q("t33_hybrid_rrf",
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(lower(${normSql("text")}), ' ')) AS term
       |  FROM documents),
       |tk AS (SELECT doc_id, term FROM toks WHERE length(term) > 0),
       |dl AS (SELECT d.doc_id, COALESCE(t.c, 0) AS dl
       |       FROM documents d
       |       LEFT JOIN (SELECT doc_id, COUNT(*) AS c FROM tk GROUP BY 1) t USING (doc_id)),
       |st AS (SELECT COUNT(*) AS n, SUM(dl) AS tdl FROM dl),
       |p AS (SELECT term, doc_id, COUNT(*) AS tf FROM tk
       |      WHERE term IN ('dup', 'merge', 'scan') GROUP BY 1, 2),
       |df AS (SELECT term, COUNT(*) AS df FROM p GROUP BY 1),
       |sc AS (
       |  SELECT p.doc_id,
       |    (ln(1.0 + (CAST(st.n AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
       |              / (CAST(df.df AS DOUBLE) + 0.5))
       |      * (CAST(p.tf AS DOUBLE) * 2.5))
       |    / (CAST(p.tf AS DOUBLE)
       |       + (1.5 * (0.25 + ((0.75 * CAST(dl.dl AS DOUBLE))
       |                         / (CAST(st.tdl AS DOUBLE) / CAST(st.n AS DOUBLE)))))) AS tscore
       |  FROM p JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
       |bm AS (SELECT doc_id,
       |         ROUND(CAST(SUM(CAST(tscore AS DECIMAL(18,9))) AS DOUBLE), 6) AS bm25
       |       FROM sc GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 50),
       |bmr AS (SELECT doc_id,
       |          ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r_bm25 FROM bm),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |ec AS (SELECT e.vec_id AS doc_id,
       |         ROUND(${"\n"}${cosEmbSql("qv", "e.embedding")}, 6) AS c
       |       FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
       |       CROSS JOIN q WHERE e.vec_id <> 0),
       |ctop AS (SELECT doc_id, c FROM ec ORDER BY c DESC, doc_id LIMIT 50),
       |cr AS (SELECT doc_id,
       |         ROW_NUMBER() OVER (ORDER BY c DESC, doc_id) AS r_cos FROM ctop),
       |f AS (SELECT COALESCE(bmr.doc_id, cr.doc_id) AS doc_id,
       |        CAST(bmr.r_bm25 AS INT) AS r_bm25, CAST(cr.r_cos AS INT) AS r_cos,
       |        ROUND(COALESCE(CAST(1.0 AS DOUBLE) / (60 + bmr.r_bm25), 0)
       |            + COALESCE(CAST(1.0 AS DOUBLE) / (60 + cr.r_cos), 0), 6) AS rrf
       |      FROM bmr FULL OUTER JOIN cr ON bmr.doc_id = cr.doc_id)
       |SELECT doc_id, r_bm25, r_cos, rrf FROM f
       |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin) { (s, dir) =>
    import graft.operators.Retrieval
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val post = Retrieval.postings(docs, "doc_id", "text")
    val dl = Retrieval.docLengths(docs, "doc_id", "text")
    val bm = Retrieval.bm25TopK(post, dl, "doc_id",
      Seq("dup", "merge", "scan"), 50)
    val bmR = bm.select(col("doc_id"),
      row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
        .as("r_bm25"))
    val emb = Tables.embeddings(s, dir)
      .join(docs.select(col("doc_id")), col("vec_id") === col("doc_id"))
    val qv = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val cosTop = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        round(graft.plans.CosineSimilarityExpr.cosine(
          col("qv"), col("embedding")), 6).as("c"))
      .orderBy(col("c").desc, col("doc_id")).limit(50)
    val cosR = cosTop.select(col("doc_id"),
      row_number().over(Window.orderBy(col("c").desc, col("doc_id")))
        .as("r_cos"))
    bmR.join(cosR, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("r_bm25"), col("r_cos"),
        round(coalesce(lit(1.0) / (lit(60) + col("r_bm25")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("r_cos")), lit(0.0)), 6)
          .as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id")).limit(10)
  }

  /** DuckDB mirror of the engine's cosine (see EmbeddingQueries.cosSql). */
  private def cosEmbSql(a: String, b: String): String =
    s"""(list_sum(list_transform(list_zip($a, $b),
       |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       | / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |   * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))""".stripMargin

  // --------------------------------------------------- URL/domain curation
  // The web-corpus front door (CCNet/RefinedWeb/FineWeb stage 0). The
  // corpus tables carry no URL column, so both engines CONSTRUCT the same
  // deterministic URL per document from (doc_id, source) — the t31
  // decomposed-suffix convention — covering: mixed-case scheme/host,
  // default and non-default ports, userinfo, tracking params at head/
  // middle/tail, fragment, empty path, surrounding whitespace, and a
  // non-URL passthrough.

  private[queries] def urlFixture: Column = {
    val id = col("doc_id").cast("string")
    val b = pmod(col("doc_id"), lit(8))
    when(b === 0, concat(lit("HTTPS://WWW."), col("source"),
        lit(".Example.COM:443/Path/"), id, lit("?utm_source=feed&id="), id,
        lit("&utm_campaign=x#top")))
      .when(b === 1, concat(lit("http://"), col("source"),
        lit(".example.co.uk:80?ref=tw&q="), id))
      .when(b === 2, concat(lit("https://blog."), col("source"),
        lit(".github.io/post/"), id, lit("?gclid=abc"), id))
      .when(b === 3, concat(lit("http://u:p@"), col("source"),
        lit(".example.com:8080/a/"), id, lit("?id="), id, lit("&fbclid=z#f")))
      .when(b === 4, concat(lit("  ftp://Files."), col("source"),
        lit(".ORG/data/"), id, lit("  ")))
      // round 14: userinfo containing '@' (RFC 3986: the LAST '@'
      // delimits it) plus a VALUELESS tracking param ("?ref") that must
      // still strip
      .when(b === 5, concat(lit("https://U@p:w@api."), col("source"),
        lit(".Example.com/v/"), id, lit("?ref&x="), id))
      // round 14: bracketed IPv6 literal host with a non-default port;
      // a bare utm param in the middle of the query
      .when(b === 6, concat(lit("http://[2001:DB8::1]:8080/v6/"), id,
        lit("?id="), id, lit("&utm_medium&z="), id))
      .otherwise(concat(lit("not a url "), id))
  }

  private[queries] val urlFixtureSql =
    """CASE doc_id % 8
      | WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.COM:443/Path/' || CAST(doc_id AS VARCHAR) || '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR) || '&utm_campaign=x#top'
      | WHEN 1 THEN 'http://' || source || '.example.co.uk:80?ref=tw&q=' || CAST(doc_id AS VARCHAR)
      | WHEN 2 THEN 'https://blog.' || source || '.github.io/post/' || CAST(doc_id AS VARCHAR) || '?gclid=abc' || CAST(doc_id AS VARCHAR)
      | WHEN 3 THEN 'http://u:p@' || source || '.example.com:8080/a/' || CAST(doc_id AS VARCHAR) || '?id=' || CAST(doc_id AS VARCHAR) || '&fbclid=z#f'
      | WHEN 4 THEN '  ftp://Files.' || source || '.ORG/data/' || CAST(doc_id AS VARCHAR) || '  '
      | WHEN 5 THEN 'https://U@p:w@api.' || source || '.Example.com/v/' || CAST(doc_id AS VARCHAR) || '?ref&x=' || CAST(doc_id AS VARCHAR)
      | WHEN 6 THEN 'http://[2001:DB8::1]:8080/v6/' || CAST(doc_id AS VARCHAR) || '?id=' || CAST(doc_id AS VARCHAR) || '&utm_medium&z=' || CAST(doc_id AS VARCHAR)
      | ELSE 'not a url ' || CAST(doc_id AS VARCHAR) END""".stripMargin

  /** Shared SQL mirror of [[graft.functions.UrlFunctions.canonicalizeUrl]]
    * / `hostOf` — the same split-regex, port/tracking/fragment algebra on
    * DuckDB's RE2. Produces CTEs `uu(doc_id, url)` → `yy(doc_id, url,
    * sch0, sch, a2, p2, kept, host)`.
    */
  private[queries] def urlSqlCtes: String = {
    val re = graft.functions.UrlFunctions.urlRegex
    val track = graft.functions.UrlFunctions.trackingRegex
    s"""uu AS (SELECT doc_id, $urlFixtureSql AS url FROM documents),
       |xx AS (SELECT doc_id, url,
       |    regexp_extract(trim(url), '$re', 1) AS sch0,
       |    lower(regexp_extract(trim(url), '$re', 1)) AS sch,
       |    lower(regexp_extract(trim(url), '$re', 2)) AS auth,
       |    regexp_extract(trim(url), '$re', 2) AS authraw,
       |    regexp_extract(trim(url), '$re', 3) AS path,
       |    substr(regexp_extract(trim(url), '$re', 4), 2) AS qraw
       |  FROM uu),
       |yy AS (SELECT doc_id, url, sch0, sch,
       |    CASE WHEN sch = 'http' THEN regexp_replace(auth, ':80$$', '')
       |         WHEN sch = 'https' THEN regexp_replace(auth, ':443$$', '')
       |         ELSE auth END AS a2,
       |    CASE WHEN path = '' THEN '/' ELSE path END AS p2,
       |    [q for q in string_split(qraw, '&')
       |       if q <> '' and not regexp_matches(q, '$track')] AS kept,
       |    lower(regexp_extract(authraw, '^(?:.*@)?(\\[[^\\]]*\\]|[^:]+)', 1)) AS host
       |  FROM xx)""".stripMargin
  }

  private val canonSql =
    """CASE WHEN sch0 = '' THEN trim(url)
      |     ELSE sch || '://' || a2 || p2 ||
      |       CASE WHEN len(kept) > 0
      |            THEN '?' || array_to_string(kept, '&') ELSE '' END
      | END""".stripMargin

  /** PSL subset for the oracle-gated queries (plain rules; the full list
    * is data for `registeredDomainAgainst`). Includes multi-label
    * suffixes so longest-match genuinely decides (co.uk over uk,
    * github.io over io).
    */
  private[queries] val pslSubset =
    Seq("com", "org", "io", "co.uk", "github.io", "uk")
  private val pslSubsetSql = pslSubset.map(s => s"'$s'").mkString(", ")

  /** SQL mirror of `registeredDomain` over the `yy` CTE's host: longest
    * trailing label-run in the suffix list (k explored to 4 — fixture
    * hosts have ≤ 4 labels), unlisted-TLD fallback 1, one more label =
    * the registered domain. Produces CTEs `hh` → `dd(doc_id, host,
    * domain)`.
    */
  private[queries] def domainSqlCtes: String =
    s"""hh AS (SELECT doc_id, host, string_split(host, '.') AS labels,
       |    len(string_split(host, '.')) AS n FROM yy),
       |kk AS (SELECT doc_id, max(k) AS psl
       |  FROM hh, (SELECT unnest(range(1, 5)) AS k) ks
       |  WHERE k <= n AND array_to_string(labels[n-k+1:n], '.')
       |        IN ($pslSubsetSql)
       |  GROUP BY doc_id),
       |dd AS (SELECT hh.doc_id, host,
       |    CASE WHEN n > coalesce(psl, 1)
       |         THEN array_to_string(labels[n-coalesce(psl, 1):n], '.') END
       |      AS domain
       |  FROM hh LEFT JOIN kk USING (doc_id))""".stripMargin

  // ---------------------------------------------------------------- t34
  /** URL CANONICALIZATION ([[graft.functions.UrlFunctions
    * .canonicalizeUrl]] / `hostOf`): scheme+host lowercase, default-port
    * strip, tracking-param removal (order-preserving), fragment drop,
    * empty-path and empty-query normalization, non-URL passthrough —
    * pure split-regex + array-HOF string algebra, replayed exactly by
    * DuckDB's RE2.
    */
  val t34_url_canonicalize = q("t34_url_canonicalize",
    s"""WITH $urlSqlCtes
       |SELECT doc_id, url, $canonSql AS canon_url, host FROM yy"""
      .stripMargin) { (s, dir) =>
    import graft.functions.UrlFunctions
    Tables.documents(s, dir)
      .select(col("doc_id"), urlFixture.as("url"))
      .select(col("doc_id"), col("url"),
        UrlFunctions.canonicalizeUrl(col("url")).as("canon_url"),
        UrlFunctions.hostOf(col("url")).as("host"))
  }

  // ---------------------------------------------------------------- t35
  /** REGISTERED-DOMAIN extraction ([[graft.functions.UrlFunctions
    * .registeredDomain]]): longest public-suffix match with the
    * unlisted-TLD fallback — www.*.example.com collapses to example.com,
    * *.example.co.uk to example.co.uk (co.uk beats uk), while
    * blog.src7.github.io keeps src7.github.io (github.io is itself a
    * public suffix — per-user sites are separate "domains", the PSL's
    * whole point); the non-URL branch yields null.
    */
  val t35_registered_domain = q("t35_registered_domain",
    s"""WITH $urlSqlCtes,
       |$domainSqlCtes
       |SELECT doc_id, host, domain FROM dd""".stripMargin) { (s, dir) =>
    import graft.functions.UrlFunctions
    Tables.documents(s, dir)
      .select(col("doc_id"), UrlFunctions.hostOf(urlFixture).as("host"))
      .withColumn("domain",
        UrlFunctions.registeredDomain(col("host"), pslSubset))
  }

  // ---------------------------------------------------------------- t36
  /** DOMAIN BLOCKLIST ([[graft.functions.UrlFunctions
    * .dropBlockedDomains]]): anti-join on the registered domain — the
    * CCNet block step. Null domains (non-URLs) survive (an anti-join
    * null key matches nothing, the exact semantics a blocklist wants);
    * corpus-scale blocklists pre-filter through [[graft.ext.BloomJoin]]
    * and finish on this same exact anti-join (d09 pins that composition).
    */
  val t36_domain_blocklist = q("t36_domain_blocklist",
    s"""WITH $urlSqlCtes,
       |$domainSqlCtes
       |SELECT doc_id, host, domain FROM dd
       |WHERE domain IS NULL OR domain NOT IN
       |  ('example.co.uk', 'src0.github.io', 'src7.github.io')"""
      .stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.functions.UrlFunctions
    val block = Seq("example.co.uk", "src0.github.io", "src7.github.io")
      .toDF("domain")
    val withDom = Tables.documents(s, dir)
      .select(col("doc_id"), UrlFunctions.hostOf(urlFixture).as("host"))
      .withColumn("domain",
        UrlFunctions.registeredDomain(col("host"), pslSubset))
    UrlFunctions.dropBlockedDomains(withDom, "domain", block)
      .select("doc_id", "host", "domain")
  }

  // ---------------------------------------------------------------- q70
  /** PER-DOMAIN QUOTA ([[graft.operators.Sampling.cappedPerStratum]]):
    * at most 15 documents per registered domain, chosen by the
    * deterministic md5 draw (the [[graft.operators.Sampling
    * .epochShuffle]] cross-engine-replayable hash, NOT xxhash64 — DuckDB
    * must replay the exact kept set). The fixture's domain distribution
    * makes the cap genuinely bite: example.com and example.co.uk pool
    * hundreds of docs while per-user github.io domains stay under quota.
    */
  val q70_domain_quota = q("q70_domain_quota",
    s"""WITH $urlSqlCtes,
       |$domainSqlCtes
       |SELECT doc_id, domain FROM (
       |  SELECT doc_id, domain, row_number() OVER (
       |      PARTITION BY domain
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM dd)
       |WHERE rn <= 15""".stripMargin) { (s, dir) =>
    import graft.functions.UrlFunctions
    val withDom = Tables.documents(s, dir)
      .select(col("doc_id"), UrlFunctions.hostOf(urlFixture).as("host"))
      .withColumn("domain",
        UrlFunctions.registeredDomain(col("host"), pslSubset))
    graft.operators.Sampling.cappedPerStratum(withDom, Seq("domain"),
        Seq("doc_id"), cap = 15,
        hash = Some(md5(col("doc_id").cast("string").cast("binary"))))
      .select("doc_id", "domain")
  }

  // ---------------------------------------------------------------- t37
  /** MULTI-CLASS (one-vs-rest) LANG-ID TRAINING
    * ([[graft.operators.HashedLinearScorer.trainRidgeMulti]]): k ridge
    * gates sharing ONE moment pass (the Gram matrix is label-independent;
    * per-class right-hand sides come from one extra per-(label, bucket)
    * DECIMAL fold, 2·S_c − S_all), served as an integer-exact argmax
    * ([[graft.operators.HashedLinearScorer.scoreMulti]]) over char-3-gram
    * features. The corpus' `lang` column is textually uncorrelated by
    * construction (t32's note), so the in-warehouse label here is the t03
    * heuristic's own prediction — CCNet-style DISTILLATION of a known
    * gate into a fixed-cost linear scorer: train on even doc_ids, serve
    * odd doc_ids, report agreement with the teacher. Golden-gated (the
    * shared Cholesky has no SQL twin); HashedLinearScorerSpec proves the
    * multiclass trainer BEATS the t03 heuristic on gold per-language F1
    * on a corpus with genuine language signal.
    */
  val t37_langid_train = GraftQuery("t37_langid_train", (s, dir) => {
    import graft.operators.HashedLinearScorer
    val docs = Tables.documents(s, dir)
      .withColumn("__heur", TextFunctions.langId(col("text")))
    val train = docs.filter(col("doc_id") % 2 === 0)
    val model = HashedLinearScorer.trainRidgeMulti(train, "doc_id", "text",
      "__heur", buckets = 64, lambda = 0.1, den = 1000003L,
      features = HashedLinearScorer.charNgramTokens(3))
    val heldOut = docs.filter(col("doc_id") % 2 =!= 0)
    HashedLinearScorer.scoreMulti(heldOut, "doc_id", "text", buckets = 64,
        classWeights = model, den = 1000003L,
        features = HashedLinearScorer.charNgramTokens(3))
      .join(heldOut.select(col("doc_id"), col("__heur").as("teacher")),
        "doc_id")
      .withColumn("agree", col("pred") === col("teacher"))
  }, GoldenOracles.sqlFor("t37_langid_train"))

  // ---------------------------------------------------------------- t38
  /** URL-LEVEL DEDUP: one document per CANONICAL URL — the web-corpus
    * stage where canonicalization earns its keep (the same page arrives
    * under case-variant hosts, default ports, tracking params and
    * fragments; byte-level URL dedup misses all of it). The fixture
    * builds three raw variants per page key that all collapse to one
    * canonical form; the report keeps the min doc_id and counts the
    * collapsed duplicates. Pure string algebra + one count — fully
    * SQL-replayable.
    */
  private val url38Sql =
    """CASE doc_id % 3
      | WHEN 0 THEN 'https://WWW.' || source || '.example.com/page/' || CAST(doc_id % 7 AS VARCHAR) || '?utm_source=a'
      | WHEN 1 THEN 'https://www.' || source || '.Example.COM:443/page/' || CAST(doc_id % 7 AS VARCHAR) || '#frag'
      | ELSE 'https://www.' || source || '.example.com/page/' || CAST(doc_id % 7 AS VARCHAR) || '?gclid=x&utm_b=c' END"""
      .stripMargin.replace("\n", "")

  private def url38: Column = {
    val page = (col("doc_id") % 7).cast("string")
    val b = pmod(col("doc_id"), lit(3))
    when(b === 0, concat(lit("https://WWW."), col("source"),
        lit(".example.com/page/"), page, lit("?utm_source=a")))
      .when(b === 1, concat(lit("https://www."), col("source"),
        lit(".Example.COM:443/page/"), page, lit("#frag")))
      .otherwise(concat(lit("https://www."), col("source"),
        lit(".example.com/page/"), page, lit("?gclid=x&utm_b=c")))
  }

  val t38_url_dedup = q("t38_url_dedup",
    s"""WITH uu AS (SELECT doc_id, $url38Sql AS url FROM documents),
       |xx AS (SELECT doc_id, url,
       |    lower(regexp_extract(trim(url), '${graft.functions.UrlFunctions.urlRegex}', 1)) AS sch,
       |    lower(regexp_extract(trim(url), '${graft.functions.UrlFunctions.urlRegex}', 2)) AS auth,
       |    regexp_extract(trim(url), '${graft.functions.UrlFunctions.urlRegex}', 3) AS path,
       |    substr(regexp_extract(trim(url), '${graft.functions.UrlFunctions.urlRegex}', 4), 2) AS qraw
       |  FROM uu),
       |cc AS (SELECT doc_id,
       |    sch || '://' ||
       |    (CASE WHEN sch = 'http' THEN regexp_replace(auth, ':80$$', '')
       |          WHEN sch = 'https' THEN regexp_replace(auth, ':443$$', '')
       |          ELSE auth END) ||
       |    (CASE WHEN path = '' THEN '/' ELSE path END) ||
       |    (CASE WHEN len([q for q in string_split(qraw, '&')
       |            if q <> '' and not regexp_matches(q, '${graft.functions.UrlFunctions.trackingRegex}')]) > 0
       |          THEN '?' || array_to_string([q for q in string_split(qraw, '&')
       |            if q <> '' and not regexp_matches(q, '${graft.functions.UrlFunctions.trackingRegex}')], '&')
       |          ELSE '' END) AS canon_url
       |  FROM xx)
       |SELECT canon_url, MIN(doc_id) AS doc_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_dups
       |FROM cc GROUP BY 1""".stripMargin) { (s, dir) =>
    import graft.functions.UrlFunctions
    Tables.documents(s, dir)
      .select(col("doc_id"),
        UrlFunctions.canonicalizeUrl(url38).as("canon_url"))
      .groupBy("canon_url")
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
  }

  // ---------------------------------------------------------------- t39
  /** PER-DOMAIN PROVENANCE REPORT — the FineWeb-style table every
    * web-corpus release publishes: per registered domain, document and
    * token volume and mean quality (DECIMAL-folded before the one
    * division). The per-domain grouping is exactly what
    * [[graft.functions.UrlFunctions.registeredDomain]] exists to key.
    */
  val t39_domain_report = q("t39_domain_report",
    s"""WITH $urlSqlCtes,
       |$domainSqlCtes,
       |m AS (SELECT dd.doc_id, domain, ${normSql("text")} AS norm, text
       |      FROM dd JOIN documents USING (doc_id)),
       |r AS (SELECT domain,
       |        CASE WHEN length(norm) = 0 THEN 0
       |             ELSE len(string_split(norm, ' ')) END AS wc,
       |        CASE WHEN length(text) = 0 THEN 0.0
       |             ELSE CAST(len(regexp_extract_all(text, '$punctPat')) AS DOUBLE)
       |                  / CAST(length(text) AS DOUBLE) END AS pr,
       |        CASE WHEN length(norm) = 0 OR len(string_split(norm, ' ')) = 0 THEN 0.0
       |             ELSE CAST(len(regexp_extract_all(lower(norm), '$stopPat')) AS DOUBLE)
       |                  / CAST(len(string_split(norm, ' ')) AS DOUBLE) END AS sr,
       |        CAST(length(text) AS DOUBLE) AS tl
       |      FROM m)
       |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(wc) AS BIGINT) AS n_tokens,
       |  ${GraftQuery.dsum("ROUND(least(tl / 500.0, 1.0) * 0.4 + greatest(0.0, 1.0 - pr * 5.0) * 0.3 + least(sr * 4.0, 1.0) * 0.3, 6)")}
       |        / COUNT(*) AS mean_quality
       |FROM r GROUP BY 1""".stripMargin) { (s, dir) =>
    import graft.functions.UrlFunctions
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        UrlFunctions.hostOf(urlFixture).as("host"))
      .withColumn("domain",
        UrlFunctions.registeredDomain(col("host"), pslSubset))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.wordCount(col("text")).cast("long")).as("n_tokens"),
        (graft.Cols.decimalSum(
          TextFunctions.qualityScore(col("text"))) / count(lit(1)))
          .as("mean_quality"))
  }

  // ---------------------------------------------------------------- q71
  /** END-TO-END WEB CURATION — the composed stage-0 pipeline every
    * web-scale corpus runs before a single text operator: canonicalize →
    * one doc per canonical URL → registered-domain blocklist → per-domain
    * quota. Each stage is the already-oracle-gated operator (t34, t38's
    * dedup shape, t36's anti-join, q70's quota); this entry pins the
    * COMPOSITION, with every decision (keeper choice, quota draw)
    * deterministic and DuckDB-replayed end to end.
    */
  val q71_web_curation = q("q71_web_curation",
    s"""WITH $urlSqlCtes,
       |$domainSqlCtes,
       |canon AS (SELECT yy.doc_id, $canonSql AS canon_url, domain
       |          FROM yy JOIN dd ON yy.doc_id = dd.doc_id),
       |dedup AS (SELECT canon_url, MIN(doc_id) AS doc_id
       |          FROM canon GROUP BY 1),
       |dd2 AS (SELECT d.doc_id, d.canon_url, c.domain
       |        FROM (SELECT dedup.doc_id, canon_url FROM dedup) d
       |        JOIN canon c ON d.doc_id = c.doc_id AND d.canon_url = c.canon_url),
       |blocked AS (SELECT * FROM dd2
       |  WHERE domain IS NULL OR domain NOT IN ('example.co.uk')),
       |quota AS (SELECT doc_id, canon_url, domain, row_number() OVER (
       |    PARTITION BY domain
       |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM blocked)
       |SELECT doc_id, domain, canon_url FROM quota WHERE rn <= 10"""
      .stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.functions.UrlFunctions
    // persist the canonicalized projection: the keepers aggregate AND the
    // join-back both consume it, and each uncached evaluation re-runs the
    // URL regex canonicalization + PSL domain chain (round 21; narrow
    // 3-column relation, released by clearCache)
    val canon = Tables.documents(s, dir)
      .select(col("doc_id"),
        UrlFunctions.canonicalizeUrl(urlFixture).as("canon_url"),
        UrlFunctions.registeredDomain(UrlFunctions.hostOf(urlFixture),
          pslSubset).as("domain"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keepers = canon.groupBy("canon_url")
      .agg(min(col("doc_id")).as("doc_id"))
    val deduped = keepers.join(canon, Seq("doc_id", "canon_url"))
    val unblocked = UrlFunctions.dropBlockedDomains(deduped, "domain",
      Seq("example.co.uk").toDF("domain"))
    graft.operators.Sampling.cappedPerStratum(unblocked, Seq("domain"),
        Seq("doc_id"), cap = 10,
        hash = Some(md5(col("doc_id").cast("string").cast("binary"))))
      .select("doc_id", "domain", "canon_url")
  }

  // ------------------------------------------------------------ t47/q72
  /** Synthetic crawl page per document — deterministic, SQL-expressible
    * on both sides, and adversarial on purpose: a <style> with a fake
    * tag in a CSS comment, a <script> whose body contains comparison
    * operators and a string-literal tag, a comment and a CDATA section
    * each hiding a long paragraph, uppercase tags, a pure-navigation
    * list, a link-dominated "related" block longer than minChars (so the
    * DENSITY rule, not the length rule, must drop it), an entity test
    * paragraph (incl. double-encoded &amp;lt;) and a short footer with a
    * double-encoded entity. No single quotes anywhere — the SQL mirror
    * embeds the constants verbatim.
    */
  private[queries] def htmlFixture: Column = htmlFixtureWith(lit(""))

  /** The t47/q72 crawl page with `extraHead` injected right after
    * `<head>` — q74 passes the robots meta so ONE fixture drives the
    * whole WARC → robots → extraction → curation chain.
    */
  private[queries] def htmlFixtureWith(extraHead: Column): Column = {
    val id = col("doc_id").cast("string")
    concat(
      lit("<html><head>"), extraHead, lit("<title>Doc "), id, lit("</title>" +
        "<style type=\"text/css\">body { color: red } /* <p>styled</p> */</style>" +
        "<script>if (1 < 2 && 3 > 2) { x = \"<div>js</div>\"; }</script>" +
        "</head><body>" +
        "<nav><ul><li><a href=\"/\">Home</a></li>" +
        "<li><a href=\"/about\">About &amp; Contact</a></li></ul></nav>" +
        "<!-- hidden <p>comment paragraph that is long enough to keep</p> -->" +
        "<![CDATA[ <p>cdata paragraph that is long enough to keep</p> ]]>" +
        "<DIV id=\"main\"><H1>Title "), id, lit("</H1><p>"), col("text"),
      lit("</p>" +
        "<p>Quotes &quot;here&quot; &amp;lt; ampersands &lt;b&gt; stay literal text</p></DIV>" +
        "<div class=\"related\">See also <a href=\"/r1\">related article one</a> " +
        "<a href=\"/r2\">related article two</a></div>" +
        "<footer><p>Copyright &amp;copy; 2026</p></footer></body></html>"))
  }

  private[queries] val htmlFixtureSql = htmlFixtureSqlWith("")

  /** SQL mirror of [[htmlFixtureWith]]: `extraSql` (empty, or an
    * expression followed by ` || `) lands right after `<head>`.
    */
  private def htmlFixtureSqlWith(extraSql: String) =
    s"""'<html><head>' || $extraSql'<title>Doc ' || CAST(doc_id AS VARCHAR) || '</title>' ||
      |'<style type="text/css">body { color: red } /* <p>styled</p> */</style>' ||
      |'<script>if (1 < 2 && 3 > 2) { x = "<div>js</div>"; }</script>' ||
      |'</head><body>' ||
      |'<nav><ul><li><a href="/">Home</a></li>' ||
      |'<li><a href="/about">About &amp; Contact</a></li></ul></nav>' ||
      |'<!-- hidden <p>comment paragraph that is long enough to keep</p> -->' ||
      |'<![CDATA[ <p>cdata paragraph that is long enough to keep</p> ]]>' ||
      |'<DIV id="main"><H1>Title ' || CAST(doc_id AS VARCHAR) || '</H1><p>' || text ||
      |'</p>' ||
      |'<p>Quotes &quot;here&quot; &amp;lt; ampersands &lt;b&gt; stay literal text</p></DIV>' ||
      |'<div class="related">See also <a href="/r1">related article one</a> ' ||
      |'<a href="/r2">related article two</a></div>' ||
      |'<footer><p>Copyright &amp;copy; 2026</p></footer></body></html>'"""
      .stripMargin.linesIterator.mkString(" ")

  /** DuckDB mirrors of the [[graft.functions.HtmlFunctions]] pipeline —
    * the SAME pattern constants (shared vals), RE2-safe, literal
    * `replace` for entities.
    */
  private def duckInvisible(e: String): String =
    graft.functions.HtmlFunctions.invisiblePats.foldLeft(e)((acc, p) =>
      s"regexp_replace($acc, '$p', ' ', 'g')")
  private def duckDecode(e: String): String =
    graft.functions.HtmlFunctions.entitySteps.foldLeft(e) {
      case (acc, (f, t)) => s"replace($acc, '$f', '${t.replace("'", "''")}')"
    }
  private[queries] def duckVis(e: String): String =
    normSql(duckDecode(s"regexp_replace($e, '<[^>]*>', ' ', 'g')"))
  // chr(1) (the block-split sentinel) strips from the RAW html before the
  // invisible drop — same order as the native scanner and blocksReference
  private[queries] def duckBlocksSql: String =
    s"string_split(regexp_replace(" +
      s"${duckInvisible("replace(html, chr(1), '')")}, " +
      s"'${graft.functions.HtmlFunctions.blockTagPat}', chr(1), 'g'), chr(1))"
  // DuckDB's array_to_string returns NULL on an empty list where Spark's
  // array_join returns '' — coalesce at every join point
  private val duckLinkHtml =
    """coalesce(array_to_string(regexp_extract_all(b, '(?is)<a\b[^>]*>(.*?)</a\s*>', 1), ' '), '')"""
  private[queries] def duckKeptPred: String =
    s"length(${duckVis("b")}) >= 25 AND " +
      s"CAST(length(${duckVis(duckLinkHtml)}) AS DOUBLE) <= " +
      s"0.33 * CAST(length(${duckVis("b")}) AS DOUBLE)"

  /** HTML MAIN-CONTENT EXTRACTION ([[graft.functions.HtmlFunctions]]):
    * stage −1 of the web pipeline — invisible-content strip, block
    * segmentation on block-level tags, per-block entity-decoded visible
    * text, and the Arc90/jusText link-density boilerplate rule. The whole
    * extraction is one codegen'd projection (zero exchanges — plan-
    * pinned); the oracle replays every regex and replace verbatim on
    * DuckDB's RE2 and hash-matches the extracted text itself.
    */
  val t47_html_extract = q("t47_html_extract",
    s"""WITH h AS (SELECT doc_id, $htmlFixtureSql AS html FROM documents),
       |b AS (SELECT doc_id, $duckBlocksSql AS bs FROM h)
       |SELECT doc_id,
       |  CAST(len(list_filter(bs, b -> length(${duckVis("b")}) > 0)) AS BIGINT)
       |    AS n_blocks,
       |  CAST(len(list_filter(bs, b -> $duckKeptPred)) AS BIGINT) AS n_kept,
       |  coalesce(array_to_string(list_transform(
       |    list_filter(bs, b -> $duckKeptPred), b -> ${duckVis("b")}), ' '),
       |    '') AS main_text
       |FROM b""".stripMargin) { (s, dir) =>
    import graft.functions.HtmlFunctions
    Tables.documents(s, dir)
      .select(col("doc_id"), htmlFixture.as("__html"))
      .select(col("doc_id"),
        size(HtmlFunctions.blocks(col("__html"))).cast("long").as("n_blocks"),
        size(HtmlFunctions.mainBlocks(col("__html"))).cast("long")
          .as("n_kept"),
        HtmlFunctions.mainContent(col("__html")).as("main_text"))
  }

  /** q71 RECOMPOSED FROM RAW HTML (q72): the full crawl-to-corpus
    * stage 0 — extract main content from the synthetic page, gate on
    * extracted word count (a crawl page whose boilerplate-free text is
    * tiny carries no training signal), then the q71 chain (canonicalize →
    * one doc per canonical URL → domain blocklist → per-domain quota)
    * over the extraction SURVIVORS. Every decision replayed end-to-end
    * in DuckDB.
    */
  val q72_web_curation_html = q("q72_web_curation_html",
    s"""WITH $urlSqlCtes,
       |$domainSqlCtes,
       |h AS (SELECT doc_id, $htmlFixtureSql AS html FROM documents),
       |b AS (SELECT doc_id, $duckBlocksSql AS bs FROM h),
       |m AS (SELECT doc_id,
       |    coalesce(array_to_string(list_transform(
       |      list_filter(bs, b -> $duckKeptPred), b -> ${duckVis("b")}), ' '),
       |      '') AS main_text
       |  FROM b),
       |g AS (SELECT doc_id,
       |    CASE WHEN length(main_text) = 0 THEN 0
       |         ELSE len(string_split(main_text, ' ')) END AS n_words
       |  FROM m
       |  WHERE CASE WHEN length(main_text) = 0 THEN 0
       |             ELSE len(string_split(main_text, ' ')) END >= 20),
       |canon AS (SELECT yy.doc_id, $canonSql AS canon_url, domain, n_words
       |          FROM yy JOIN dd ON yy.doc_id = dd.doc_id
       |          JOIN g ON yy.doc_id = g.doc_id),
       |dedup AS (SELECT canon_url, MIN(doc_id) AS doc_id
       |          FROM canon GROUP BY 1),
       |dd2 AS (SELECT d.doc_id, d.canon_url, c.domain, c.n_words
       |        FROM (SELECT dedup.doc_id, canon_url FROM dedup) d
       |        JOIN canon c ON d.doc_id = c.doc_id AND d.canon_url = c.canon_url),
       |blocked AS (SELECT * FROM dd2
       |  WHERE domain IS NULL OR domain NOT IN ('example.co.uk')),
       |quota AS (SELECT doc_id, canon_url, domain, n_words, row_number() OVER (
       |    PARTITION BY domain
       |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM blocked)
       |SELECT doc_id, domain, canon_url, n_words FROM quota WHERE rn <= 10"""
      .stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.functions.{HtmlFunctions, TextFunctions, UrlFunctions}
    // materialize the extraction ONCE: the keeper pick and the keeper
    // join both consume this relation, and re-deriving the (interpreted
    // HOF) extraction on each branch doubled the query's cost — at real
    // scale the extraction output is a persisted stage boundary anyway
    val canon = Tables.documents(s, dir)
      .select(col("doc_id"), htmlFixture.as("__html"),
        UrlFunctions.canonicalizeUrl(urlFixture).as("canon_url"),
        UrlFunctions.registeredDomain(UrlFunctions.hostOf(urlFixture),
          pslSubset).as("domain"))
      .withColumn("n_words",
        TextFunctions.wordCount(HtmlFunctions.mainContent(col("__html")))
          .cast("long"))
      .filter(col("n_words") >= 20)
      .drop("__html")
      .localCheckpoint(true)
    val keepers = canon.groupBy("canon_url")
      .agg(min(col("doc_id")).as("doc_id"))
    val deduped = keepers.join(canon, Seq("doc_id", "canon_url"))
    val unblocked = UrlFunctions.dropBlockedDomains(deduped, "domain",
      Seq("example.co.uk").toDF("domain"))
    graft.operators.Sampling.cappedPerStratum(unblocked, Seq("domain"),
        Seq("doc_id"), cap = 10,
        hash = Some(md5(col("doc_id").cast("string").cast("binary"))))
      .select("doc_id", "domain", "canon_url", "n_words")
  }

  // ---------------------------------------------------------------- q74
  /** THE FULL CRAWL-TO-CORPUS CHAIN FROM WARC BYTES (web stage −2 →
    * stage 0): the documents table is rendered as standards-shaped WARC
    * response records (Target-URI = the t34 URL fixture, payload = the
    * t47 crawl page with the t49 robots meta injected) and written as
    * real `.warc` members by the DISTRIBUTED writer — then everything
    * downstream consumes ONLY the container: [[graft.sources.WarcSource]]
    * splits records (src22 gates the parser byte-level), the robots gate
    * drops noindex/none pages, main-content extraction + the ≥ 20-word
    * signal gate pick survivors (doc identity recovered from the page
    * itself — the `<title>Doc N</title>` the fixture plants), and the
    * q71 curation tail (canonicalize → one doc per canonical URL →
    * domain blocklist → per-domain quota) produces the corpus. The
    * oracle replays every stage from the documents table, trusting only
    * what src22/t47/t49 already gate bit-level.
    *
    * Scale shape: the WARC scan is file-granular (zero shuffle until the
    * canonical-URL group-by), extraction is one codegen'd projection,
    * and the single materialized boundary is the extraction output —
    * exactly the q72 plan with the container stage prepended.
    */
  val q74_warc_to_corpus = q("q74_warc_to_corpus",
    s"""WITH $urlSqlCtes,
       |$domainSqlCtes,
       |h AS (SELECT doc_id, ${htmlFixtureSqlWith(s"$robotsMetaPieceSql || ")}
       |        AS html FROM documents),
       |rr AS (SELECT doc_id, ${duckRobots("html")} AS d FROM h),
       |rb AS (SELECT h.doc_id, html FROM h JOIN rr ON h.doc_id = rr.doc_id
       |       WHERE NOT list_contains(d, 'noindex')
       |         AND NOT list_contains(d, 'none')),
       |b AS (SELECT doc_id, $duckBlocksSql AS bs FROM rb),
       |m AS (SELECT doc_id,
       |    coalesce(array_to_string(list_transform(
       |      list_filter(bs, b -> $duckKeptPred), b -> ${duckVis("b")}), ' '),
       |      '') AS main_text
       |  FROM b),
       |g AS (SELECT doc_id,
       |    CASE WHEN length(main_text) = 0 THEN 0
       |         ELSE len(string_split(main_text, ' ')) END AS n_words
       |  FROM m
       |  WHERE CASE WHEN length(main_text) = 0 THEN 0
       |             ELSE len(string_split(main_text, ' ')) END >= 20),
       |canon AS (SELECT yy.doc_id, $canonSql AS canon_url, domain, n_words
       |          FROM yy JOIN dd ON yy.doc_id = dd.doc_id
       |          JOIN g ON yy.doc_id = g.doc_id),
       |dedup AS (SELECT canon_url, MIN(doc_id) AS doc_id
       |          FROM canon GROUP BY 1),
       |dd2 AS (SELECT d.doc_id, d.canon_url, c.domain, c.n_words
       |        FROM (SELECT dedup.doc_id, canon_url FROM dedup) d
       |        JOIN canon c ON d.doc_id = c.doc_id AND d.canon_url = c.canon_url),
       |blocked AS (SELECT * FROM dd2
       |  WHERE domain IS NULL OR domain NOT IN ('example.co.uk')),
       |quota AS (SELECT doc_id, canon_url, domain, n_words, row_number() OVER (
       |    PARTITION BY domain
       |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM blocked)
       |SELECT doc_id, domain, canon_url, n_words FROM quota WHERE rn <= 10"""
      .stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.functions.{HtmlFunctions, TextFunctions, UrlFunctions}
    import graft.sources.WarcSource
    val root = DedupQueries.DedupStaging.ensure("q74", dir) { r =>
      // stage −2: the crawl segments themselves, written DISTRIBUTED
      // (one member per partition file, no driver materialization)
      val pages = Tables.documents(s, dir).select(
        urlFixture.as("uri"), lit("2026-08-01T00:00:00Z").as("ts"),
        htmlFixtureWith(robotsMetaPiece).as("html"))
      WarcSource.writeWarc(pages.repartition(8), "uri", "ts", "html",
        s"$r/crawl")
    }
    // from here on, the container is the ONLY input
    val recs = WarcSource.good(WarcSource.read(s, s"$root/crawl"))
      .select(col("target_uri").as("url"),
        decode(col("body"), "UTF-8").as("__html"))
    val compliant = HtmlFunctions.dropNoindex(recs, "__html")
    val canon = compliant
      .select(col("url"),
        regexp_extract(col("__html"), "<title>Doc ([0-9]+)</title>", 1)
          .cast("long").as("doc_id"),
        UrlFunctions.canonicalizeUrl(col("url")).as("canon_url"),
        UrlFunctions.registeredDomain(UrlFunctions.hostOf(col("url")),
          pslSubset).as("domain"),
        TextFunctions.wordCount(HtmlFunctions.mainContent(col("__html")))
          .cast("long").as("n_words"))
      .filter(col("n_words") >= 20)
      .drop("url")
      .localCheckpoint(true) // one extraction, two consumers (q72's note)
    val keepers = canon.groupBy("canon_url")
      .agg(min(col("doc_id")).as("doc_id"))
    val deduped = keepers.join(canon, Seq("doc_id", "canon_url"))
    val unblocked = UrlFunctions.dropBlockedDomains(deduped, "domain",
      Seq("example.co.uk").toDF("domain"))
    graft.operators.Sampling.cappedPerStratum(unblocked, Seq("domain"),
        Seq("doc_id"), cap = 10,
        hash = Some(md5(col("doc_id").cast("string").cast("binary"))))
      .select("doc_id", "domain", "canon_url", "n_words")
  }

  // ---------------------------------------------------------------- t49
  /** ROBOTS-META COMPLIANCE FILTER ([[graft.functions.HtmlFunctions
    * .robotsDirectives]] / `dropNoindex`): stage −1.5 of a compliant
    * crawl pipeline — a page whose `<meta name="robots">` carries
    * `noindex` (or the `none` shorthand) must not enter the corpus
    * regardless of content quality. The fixture covers both quote
    * styles, bare attribute values, uppercase tags/values, a non-robots
    * meta, and pages with no meta; directives join to one string so the
    * oracle hash covers extraction AND the gate.
    */
  /** The robots `<meta>` of a page, keyed on doc_id % 7 — both quote
    * styles, bare values, uppercase, a non-robots meta, and no-meta
    * pages. Shared by t49's standalone fixture and q74's crawl pages.
    */
  private[queries] def robotsMetaPiece: Column = {
    val b = pmod(col("doc_id"), lit(7))
    when(b === 0, lit("<meta name=\"robots\" content=\"noindex, follow\">"))
      .when(b === 1, lit("<META NAME='ROBOTS' CONTENT='NOFOLLOW'>"))
      .when(b === 2, lit("<meta name=robots content=none>"))
      .when(b === 3, lit("<meta name=\"viewport\" content=\"width=1\">"))
      .otherwise(lit(""))
  }

  private[queries] def robotsMetaPieceSql: String =
    """CASE doc_id % 7
      | WHEN 0 THEN '<meta name="robots" content="noindex, follow">'
      | WHEN 1 THEN '<META NAME=''ROBOTS'' CONTENT=''NOFOLLOW''>'
      | WHEN 2 THEN '<meta name=robots content=none>'
      | WHEN 3 THEN '<meta name="viewport" content="width=1">'
      | ELSE '' END""".stripMargin.linesIterator.mkString(" ")

  private def robotsFixture: Column =
    concat(lit("<html><head>"), robotsMetaPiece, lit("</head><body><p>"),
      col("text"), lit("</p></body></html>"))

  private val robotsFixtureSql =
    s"'<html><head>' || $robotsMetaPieceSql || " +
      "'</head><body><p>' || text || '</p></body></html>'"

  /** DuckDB mirror of [[graft.functions.HtmlFunctions.robotsDirectives]]
    * over column/expression `c` — shared by t49 and q74.
    */
  private def duckRobots(c: String): String =
    s"""list_filter(list_transform(flatten(list_transform(
       |      list_transform(
       |        list_filter(regexp_extract_all($c, '(?is)<meta\\b[^>]*>', 0),
       |          m -> regexp_matches(m,
       |            '(?is)\\bname\\s*=\\s*("robots"|''robots''|robots\\b)')),
       |        m -> trim(regexp_replace(regexp_replace(
       |          regexp_extract(m,
       |            '(?is)\\bcontent\\s*=\\s*(?:"([^"]*)"|''([^'']*)''|([^\\s>]+))', 0),
       |          '(?is)^content\\s*=\\s*', '', ''),
       |          '^["'']|["'']$$', '', 'g'))),
       |      v -> string_split(v, ','))),
       |      x -> lower(trim(x))), x -> x <> '')""".stripMargin

  val t49_robots_filter = q("t49_robots_filter",
    s"""WITH h AS (SELECT doc_id, $robotsFixtureSql AS html FROM documents),
       |t AS (SELECT doc_id, ${duckRobots("html")} AS d
       |  FROM h)
       |SELECT doc_id, coalesce(array_to_string(d, ' '), '') AS directives
       |FROM t
       |WHERE NOT list_contains(d, 'noindex')
       |  AND NOT list_contains(d, 'none')""".stripMargin) { (s, dir) =>
    import graft.functions.HtmlFunctions
    HtmlFunctions.dropNoindex(
        Tables.documents(s, dir).select(col("doc_id"),
          robotsFixture.as("__html")), "__html")
      .select(col("doc_id"),
        array_join(HtmlFunctions.robotsDirectives(col("__html")), " ")
          .as("directives"))
  }

  // ---------------------------------------------------------------- t51
  /** robots.txt FIXTURE — per-domain policies over the registered
    * domains the URL fixture produces, written to exercise every RFC
    * 9309 construct t51's oracle then re-decides independently: group
    * selection (a `graftbot-images` group that must NOT govern
    * `graftbot`, an exact `graftbot` group that beats `*`), longest
    * match (a `/Path/` allow under a longer star-wildcard disallow),
    * wildcards, a literal `?` in a pattern, trailing-`$` anchors
    * (github.io), a block-all crawler-specific group (example.co.uk),
    * and ABSENCE (the .org domains have no robots.txt → allowed).
    */
  private val robotsTxtExampleCom =
    """# example.com crawl policy
      |User-agent: graftbot-images
      |Disallow: /img/
      |
      |User-agent: graftbot
      |Allow: /Path/
      |Disallow: /Path/*7
      |Disallow: /a/
      |Allow: /a/*3
      |Disallow: /v/*?ref
      |Sitemap: https://example.com/sitemap.xml
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  private val robotsTxtExampleCoUk =
    """User-agent: graftbot
      |Disallow: /
      |
      |User-agent: *
      |Allow: /
      |""".stripMargin

  private val robotsTxtGithubIo =
    """User-agent: *
      |Disallow: /post/*4$
      |Disallow: /post/*8$
      |Sitemap: https://pages.example/sitemap-index.xml   # discovery
      |sitemap: https://pages.example/sitemap-posts.xml
      |""".stripMargin

  /** The per-domain robots.txt of the fixture (null = the domain serves
    * none — protocol absence means allow).
    */
  private[queries] def robotsTxtFor(domain: Column): Column =
    when(domain === "example.com", lit(robotsTxtExampleCom))
      .when(domain === "example.co.uk", lit(robotsTxtExampleCoUk))
      .when(domain.endsWith(".github.io"), lit(robotsTxtGithubIo))

  /** HAND-DERIVED expected rule sets for agent `graftbot` under the
    * fixture texts above — the oracle's ground truth is written out
    * rule by rule, NOT produced by the engine's parser, so a parser bug
    * shows up as a hash mismatch instead of propagating into the
    * oracle. Key `.github.io` attaches to every `*.github.io` domain.
    */
  private val robotsFixtureRules: Seq[(String, String, Boolean)] = Seq(
    ("example.com", "/Path/", true),
    ("example.com", "/Path/*7", false),
    ("example.com", "/a/", false),
    ("example.com", "/a/*3", true),
    ("example.com", "/v/*?ref", false),
    ("example.co.uk", "/", false),
    (".github.io", "/post/*4$", false),
    (".github.io", "/post/*8$", false))

  /** Rule pattern → anchored RE2 regex (the oracle's INDEPENDENT match
    * implementation): `*` → `.*`, a trailing `$` stays an end anchor,
    * every other RE2 metacharacter escapes to a literal.
    */
  private def robotsRx(p: String): String = {
    val anchored = p.endsWith("$")
    val body = if (anchored) p.dropRight(1) else p
    val sb = new StringBuilder("^")
    body.foreach {
      case '*' => sb.append(".*")
      case c if "\\.[]{}()+?^$|".indexOf(c.toInt) >= 0 =>
        sb.append('\\').append(c)
      case c => sb.append(c)
    }
    if (anchored) sb.append('$')
    sb.toString
  }

  /** Shared SQL mirror of the robots decision: CTEs `tgt(doc_id, domain,
    * target)` (path+query match target per doc, from the url/domain
    * CTEs), `rob_best(doc_id, pattern, allow)` (the RFC longest-match
    * winner — length desc, allow-wins tie, lexicographic determinism),
    * via a literal VALUES relation of the hand-derived rules with
    * pre-rendered regexes. Callers SELECT with
    * `coalesce(rob_best.allow, TRUE)`.
    */
  private[queries] def robotsSqlCtes: String = {
    val values = robotsFixtureRules.map { case (k, p, a) =>
      s"('$k', '$p', ${if (a) "TRUE" else "FALSE"}, '${robotsRx(p)}')"
    }.mkString(",\n|    ")
    s"""tgt AS (SELECT xx.doc_id, dd.domain,
       |    (CASE WHEN xx.path = '' THEN '/' ELSE xx.path END) ||
       |    (CASE WHEN xx.qraw <> '' THEN '?' || xx.qraw ELSE '' END) AS target
       |  FROM xx JOIN dd ON xx.doc_id = dd.doc_id),
       |rob_rules AS (SELECT d2.domain, v.pattern, v.allow, v.rx
       |  FROM (SELECT DISTINCT domain FROM dd WHERE domain IS NOT NULL) d2
       |  JOIN (VALUES
       |    $values) v(key, pattern, allow, rx)
       |    ON d2.domain = v.key
       |    OR (v.key = '.github.io' AND d2.domain LIKE '%.github.io')),
       |rob_m AS (SELECT tgt.doc_id, r.pattern, r.allow,
       |    length(r.pattern) AS plen
       |  FROM tgt JOIN rob_rules r ON tgt.domain = r.domain
       |  WHERE regexp_matches(tgt.target, r.rx)),
       |rob_best AS (SELECT doc_id, pattern, allow FROM (
       |    SELECT doc_id, pattern, allow, row_number() OVER (
       |      PARTITION BY doc_id
       |      ORDER BY plen DESC, allow DESC, pattern ASC) AS rn
       |    FROM rob_m) z
       |  WHERE rn = 1)""".stripMargin
  }

  /** ROBOTS.TXT PROTOCOL COMPLIANCE (RFC 9309,
    * [[graft.plans.RobotsRulesExpr]] / [[graft.plans.RobotsMatchExpr]] /
    * [[graft.functions.UrlFunctions.robotsGate]]): stage −1.75 of the
    * crawl chain — the DOMAIN-level gate real curation applies before
    * any per-page signal. The engine side parses the fixture robots.txt
    * TEXTS (group selection for product token `graftbot`) and decides
    * each URL with the codegen longest-match expression; the oracle
    * re-decides every URL from a hand-derived literal rule table and an
    * independent regex/window-function match — parser AND matcher are
    * both on the hook for every row. Output: the full decision (allowed
    * + winning pattern), not just the survivors, so denials hash too.
    *
    * Scale shape: rules parse per DOMAIN (a relation ~6 orders smaller
    * than the corpus), broadcast join, row-local codegen match — zero
    * added shuffles in the scan stage.
    */
  val t51_robots_txt_gate = q("t51_robots_txt_gate",
    s"""WITH $urlSqlCtes,
       |$domainSqlCtes,
       |$robotsSqlCtes
       |SELECT tgt.doc_id, tgt.domain, tgt.target,
       |  coalesce(b.allow, TRUE) AS allowed, b.pattern AS matched_pattern
       |FROM tgt LEFT JOIN rob_best b ON tgt.doc_id = b.doc_id"""
      .stripMargin) { (s, dir) =>
    import graft.functions.UrlFunctions
    // materialize the (doc_id, domain, target) relation ONCE: the rules
    // derivation, the join's left side and the distinct all consume it,
    // and re-deriving the registered domain (an interpreted HOF) per
    // consumer tripled the query's cost — at real scale this projection
    // is a persisted stage boundary anyway (the q72/q74 discipline)
    val urls = Tables.documents(s, dir)
      .select(col("doc_id"), urlFixture.as("url"))
      .select(col("doc_id"),
        UrlFunctions.registeredDomain(UrlFunctions.hostOf(col("url")),
          pslSubset).as("domain"),
        UrlFunctions.pathQueryOf(col("url")).as("target"))
      .localCheckpoint(true)
    val rules = urls.select("domain").where(col("domain").isNotNull)
      .distinct()
      .withColumn("robots_txt", robotsTxtFor(col("domain")))
      .where(col("robots_txt").isNotNull)
      .select(col("domain"),
        UrlFunctions.robotsRules(col("robots_txt"), lit("graftbot"))
          .as("__rules"))
    urls.join(broadcast(rules), Seq("domain"), "left")
      .select(col("doc_id"), col("domain"), col("target"),
        when(col("__rules").isNotNull,
          UrlFunctions.robotsDecision(col("__rules"), col("target")))
          .otherwise(struct(lit(true).as("allowed"),
            lit(null).cast("string").as("pattern"))).as("d"))
      .select(col("doc_id"), col("domain"), col("target"),
        col("d.allowed").as("allowed"), col("d.pattern").as("matched_pattern"))
  }

  // ---------------------------------------------------------------- t53
  /** SITEMAP DISCOVERY ([[graft.functions.UrlFunctions.robotsSitemaps]],
    * RFC 9309 §2.3): the non-group `Sitemap:` records of each domain's
    * robots.txt — comment-stripped, key case-insensitive, value
    * whitespace-trimmed. The extraction is pure column algebra, so the
    * oracle replays it from the SAME robots.txt literals (rendered into
    * the SQL line by line) with its own split + regex pipeline — unlike
    * t51, no hand-derived table stands in: text in, records out, both
    * engines end to end.
    */
  /** A multi-line text as a DuckDB string literal expression. */
  private def sqlLit(text: String): String =
    text.split("\n", -1).map(l => s"'${l.replace("'", "''")}'")
      .mkString(" || chr(10) || ")

  /** Shared SQL mirror of the discovery relation (CTE `sm(domain,
    * sitemap_url)`): the robots fixture's non-group `Sitemap:` records,
    * replayed line by line from the SAME literals — t53 gates it
    * directly, t54 composes the XML ingestion on top.
    */
  private def sitemapSqlCtes: String =
    s"""doms AS (SELECT DISTINCT domain FROM dd WHERE domain IS NOT NULL),
       |rt AS (SELECT domain,
       |    CASE WHEN domain = 'example.com' THEN ${sqlLit(robotsTxtExampleCom)}
       |         WHEN domain = 'example.co.uk' THEN ${sqlLit(robotsTxtExampleCoUk)}
       |         WHEN domain LIKE '%.github.io' THEN ${sqlLit(robotsTxtGithubIo)}
       |    END AS txt FROM doms),
       |lines AS (SELECT domain,
       |    regexp_replace(l, '#.*$$', '') AS nc
       |  FROM rt, unnest(string_split(txt, chr(10))) AS t(l)
       |  WHERE txt IS NOT NULL),
       |sm AS (SELECT domain,
       |  regexp_replace(regexp_replace(nc,
       |    '(?i)^\\s*sitemap\\s*:\\s*', ''), '\\s+$$', '') AS sitemap_url
       |FROM lines
       |WHERE regexp_matches(nc, '(?i)^\\s*sitemap\\s*:')
       |  AND regexp_replace(regexp_replace(nc,
       |    '(?i)^\\s*sitemap\\s*:\\s*', ''), '\\s+$$', '') <> '')""".stripMargin

  /** The engine's (domain, sitemap_url) discovery relation — t53's body,
    * shared with t54's ingestion.
    */
  private def discoveredSitemaps(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.UrlFunctions
    // project host FIRST: nesting the url fixture directly inside
    // registeredDomain's aggregate lambda inlines the whole fixture
    // expression at every lambda reference (Catalyst collapses cheap
    // projections) — a 10x interpreted-tree blowup t35 avoids with
    // exactly this two-step shape
    Tables.documents(s, dir)
      .select(UrlFunctions.hostOf(urlFixture).as("host"))
      .select(UrlFunctions.registeredDomain(col("host"), pslSubset)
        .as("domain"))
      // sever the plan after the distinct: every downstream filter
      // (null domain, has-robots) would otherwise push BELOW the
      // aggregate and re-evaluate the interpreted domain HOF over the
      // whole corpus once per predicate — the checkpoint pins the
      // ~#domains-row relation instead (t51's lesson, second verse)
      .distinct().localCheckpoint(true)
      .where(col("domain").isNotNull)
      .withColumn("robots_txt", robotsTxtFor(col("domain")))
      .where(col("robots_txt").isNotNull)
      .select(col("domain"),
        explode(UrlFunctions.robotsSitemaps(col("robots_txt")))
          .as("sitemap_url"))
  }

  val t53_robots_sitemaps =
    q("t53_robots_sitemaps",
      s"""WITH $urlSqlCtes,
         |$domainSqlCtes,
         |$sitemapSqlCtes
         |SELECT domain, sitemap_url FROM sm""".stripMargin)(
      discoveredSitemaps)

  // ---------------------------------------------------------------- t54
  /** SITEMAP fixture documents for the URLs t53 discovers
    * ([[graft.functions.SitemapFunctions]]): one plain urlset
    * (example.com — with a lastmod-less entry and whitespace around a
    * loc), one sitemap INDEX (pages.example — pointing at a posts
    * urlset t53 ALSO discovers directly, dedup-exercising; at an
    * archive urlset reachable only through the index; and at ITSELF,
    * the recursion bomb the one-level depth contract defuses), and the
    * two child urlsets with fresh/stale/absent lastmods.
    */
  private val sitemapXmlExampleCom =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc>https://example.com/</loc>
      |    <lastmod>2026-07-30</lastmod>
      |  </url>
      |  <url>
      |    <loc>https://example.com/about</loc>
      |    <lastmod>2025-12-01T08:30:00+00:00</lastmod>
      |  </url>
      |  <url>
      |    <loc> https://example.com/contact </loc>
      |  </url>
      |  <url>
      |    <loc>https://example.com/q?a=1&amp;b=2</loc>
      |    <lastmod>2026-08-05</lastmod>
      |  </url>
      |</urlset>
      |""".stripMargin

  private val sitemapXmlPagesIndex =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <sitemap>
      |    <loc>https://pages.example/sitemap-posts.xml</loc>
      |    <lastmod>2026-08-02</lastmod>
      |  </sitemap>
      |  <sitemap>
      |    <loc>https://pages.example/sitemap-archive.xml</loc>
      |  </sitemap>
      |  <sitemap>
      |    <loc>https://pages.example/sitemap-index.xml</loc>
      |  </sitemap>
      |</sitemapindex>
      |""".stripMargin

  private val sitemapXmlPagesPosts =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc>https://pages.example/post/1</loc>
      |    <lastmod>2026-08-02</lastmod>
      |  </url>
      |  <url>
      |    <loc>https://pages.example/post/2</loc>
      |    <lastmod>2026-06-15</lastmod>
      |  </url>
      |  <url>
      |    <loc>https://pages.example/post/3</loc>
      |  </url>
      |</urlset>
      |""".stripMargin

  private val sitemapXmlPagesArchive =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc>https://pages.example/archive/2019</loc>
      |    <lastmod>2019-01-01</lastmod>
      |  </url>
      |  <url>
      |    <loc>https://pages.example/archive/2020</loc>
      |    <lastmod>2020-01-01</lastmod>
      |  </url>
      |  <url>
      |    <loc>https://pages.example/archive/old-year</loc>
      |    <lastmod>2025</lastmod>
      |  </url>
      |  <url>
      |    <loc>https://pages.example/archive/this-month</loc>
      |    <lastmod>2026-08</lastmod>
      |  </url>
      |</urlset>
      |""".stripMargin

  /** Fixture "fetch": sitemap URL → document body (null = 404). */
  private def sitemapXmlFor(url: Column): Column =
    when(url === "https://example.com/sitemap.xml",
        lit(sitemapXmlExampleCom))
      .when(url === "https://pages.example/sitemap-index.xml",
        lit(sitemapXmlPagesIndex))
      .when(url === "https://pages.example/sitemap-posts.xml",
        lit(sitemapXmlPagesPosts))
      .when(url === "https://pages.example/sitemap-archive.xml",
        lit(sitemapXmlPagesArchive))

  /** DuckDB mirror of [[graft.functions.SitemapFunctions.xmlUnescape]] —
    * the five predefined entities, `&amp;` last.
    */
  private def xmlUnescapeSql(e: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |    regexp_replace($e, '&lt;', '<', 'g'), '&gt;', '>', 'g'),
       |    '&quot;', '"', 'g'), '&apos;', '''', 'g'),
       |    '&amp;', '&', 'g')""".stripMargin

  /** The same fetch as a SQL CASE over `expr`. */
  private def sitemapXmlSqlCase(e: String): String =
    s"""CASE WHEN $e = 'https://example.com/sitemap.xml'
       |      THEN ${sqlLit(sitemapXmlExampleCom)}
       |    WHEN $e = 'https://pages.example/sitemap-index.xml'
       |      THEN ${sqlLit(sitemapXmlPagesIndex)}
       |    WHEN $e = 'https://pages.example/sitemap-posts.xml'
       |      THEN ${sqlLit(sitemapXmlPagesPosts)}
       |    WHEN $e = 'https://pages.example/sitemap-archive.xml'
       |      THEN ${sqlLit(sitemapXmlPagesArchive)} END""".stripMargin

  /** SITEMAP XML INGESTION ([[graft.functions.SitemapFunctions]],
    * sitemaps.org protocol) — t53 finished: the discovered sitemap URLs
    * fetch their documents (fixture map), index documents expand
    * EXACTLY one level (the protocol forbids index-of-index; the
    * fixture's self-referencing index entry proves the bound is a
    * no-op, not a loop), and every `<url>` entry lands in the
    * (domain, page_url, lastmod) coverage relation with a
    * freshness-vs-crawl-date verdict (stale = lastmod's whole PERIOD —
    * reduced-precision `YYYY`/`YYYY-MM` forms pad to their period end —
    * before 2026-08-01; no lastmod → not stale). Freshness precision
    * note for anyone composing analytics on the verdict: staleBefore
    * compares full datetimes at CALENDAR-DATE precision in the
    * lastmod's own offset and pads `YYYY-MM` to day 31 — both
    * deliberate err-fresh choices (see SitemapFunctions.scala), so a
    * verdict can be up to ~1 day fresher than a strict instant
    * comparison would say, never staler. A posts sitemap
    * reachable both directly and through the index dedups via the
    * DISTINCT. Pure column regex algebra end to end — the oracle
    * replays discovery, fetch, both explode levels and the entry
    * extraction from the SAME literals (the t53 pattern: text in,
    * records out, both engines end-to-end).
    *
    * Scale shape: discovery is domain-sized (t53's pinned plan), the
    * fetch relation is sitemap-count-sized, and block extraction is
    * row-local regex inside the scan of that tiny relation — at real
    * scale the same algebra runs over a fetched (sitemap_url, body)
    * table with zero added shuffles before the final distinct.
    */
  val t54_sitemap_ingest = q("t54_sitemap_ingest",
    s"""WITH $urlSqlCtes,
       |$domainSqlCtes,
       |$sitemapSqlCtes,
       |fx AS (SELECT domain, xml FROM (SELECT domain,
       |    ${sitemapXmlSqlCase("sitemap_url")} AS xml FROM sm)
       |  WHERE xml IS NOT NULL),
       |db AS (SELECT domain, unnest(regexp_extract_all(xml,
       |    '(?s)<url>(.*?)</url>', 1)) AS blk FROM fx),
       |ib AS (SELECT domain, unnest(regexp_extract_all(xml,
       |    '(?s)<sitemap>(.*?)</sitemap>', 1)) AS blk FROM fx),
       |cx AS (SELECT domain, cxml FROM (SELECT domain,
       |    ${sitemapXmlSqlCase(xmlUnescapeSql(
             "regexp_extract(blk, '(?s)<loc>\\s*(.*?)\\s*</loc>', 1)"))}
       |      AS cxml FROM ib)
       |  WHERE cxml IS NOT NULL),
       |cb AS (SELECT domain, unnest(regexp_extract_all(cxml,
       |    '(?s)<url>(.*?)</url>', 1)) AS blk FROM cx),
       |ab AS (SELECT domain, blk FROM db
       |       UNION ALL SELECT domain, blk FROM cb),
       |en AS (SELECT domain,
       |    ${xmlUnescapeSql(
             "regexp_extract(blk, '(?s)<loc>\\s*(.*?)\\s*</loc>', 1)")}
       |      AS page_url,
       |    nullif(regexp_extract(blk,
       |      '(?s)<lastmod>\\s*(.*?)\\s*</lastmod>', 1), '') AS lastmod
       |  FROM ab)
       |SELECT DISTINCT domain, page_url, lastmod,
       |  coalesce((CASE
       |      WHEN length(substr(lastmod, 1, 10)) = 4
       |        THEN substr(lastmod, 1, 10) || '-12-31'
       |      WHEN length(substr(lastmod, 1, 10)) = 7
       |        THEN substr(lastmod, 1, 10) || '-31'
       |      ELSE substr(lastmod, 1, 10) END) < '2026-08-01', FALSE)
       |    AS stale
       |FROM en WHERE page_url <> ''""".stripMargin) { (s, dir) =>
    import graft.functions.SitemapFunctions
    val fetched = discoveredSitemaps(s, dir)
      .select(col("domain"), sitemapXmlFor(col("sitemap_url")).as("xml"))
      .where(col("xml").isNotNull)
    val direct = fetched.select(col("domain"),
      explode(SitemapFunctions.urlBlocks(col("xml"))).as("blk"))
    // one index level, per the protocol's no-index-of-index rule: a
    // child that is itself an index has no <url> blocks — the fixture's
    // self-pointer terminates here by construction
    val viaIndex = fetched
      .select(col("domain"),
        explode(SitemapFunctions.indexBlocks(col("xml"))).as("cblk"))
      .select(col("domain"),
        sitemapXmlFor(SitemapFunctions.locOf(col("cblk"))).as("cxml"))
      .where(col("cxml").isNotNull)
      .select(col("domain"),
        explode(SitemapFunctions.urlBlocks(col("cxml"))).as("blk"))
    direct.unionByName(viaIndex)
      .select(col("domain"),
        SitemapFunctions.locOf(col("blk")).as("page_url"),
        SitemapFunctions.lastmodOf(col("blk")).as("lastmod"))
      .where(col("page_url") =!= "")
      .distinct()
      .withColumn("stale",
        SitemapFunctions.staleBefore(col("lastmod"), "2026-08-01"))
  }

  // ---------------------------------------------------------------- q77
  /** RESTART FROM WET: the per-domain corpus statistics a curation run
    * computes when it starts from the PRE-EXTRACTED interchange instead
    * of raw WARC — the engine reads ONLY the conversion-record tree
    * src24 staged (the t47 extraction written as WET), gates on the
    * q72 word-count signal, and aggregates by registered domain; the
    * oracle re-derives the identical statistics from the documents
    * table through the extraction + URL mirrors. This is the claim
    * behind writeWet made executable: the WET artifact carries enough
    * to resume the pipeline, and both engines agree on what it carries.
    */
  val q77_wet_corpus_stats = q("q77_wet_corpus_stats",
    s"""WITH $urlSqlCtes,
       |$domainSqlCtes,
       |h AS (SELECT doc_id, $htmlFixtureSql AS html FROM documents),
       |b AS (SELECT doc_id, $duckBlocksSql AS bs FROM h),
       |m AS (SELECT doc_id,
       |    coalesce(array_to_string(list_transform(
       |      list_filter(bs, b -> $duckKeptPred), b -> ${duckVis("b")}), ' '),
       |      '') AS main_text
       |  FROM b),
       |g AS (SELECT doc_id,
       |    CASE WHEN length(main_text) = 0 THEN 0
       |         ELSE len(string_split(main_text, ' ')) END AS n_words
       |  FROM m
       |  WHERE CASE WHEN length(main_text) = 0 THEN 0
       |             ELSE len(string_split(main_text, ' ')) END >= 20)
       |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_words) AS BIGINT) AS sum_words
       |FROM g JOIN dd USING (doc_id)
       |GROUP BY domain""".stripMargin) { (s, dir) =>
    import graft.functions.{TextFunctions, UrlFunctions}
    graft.sources.WarcSource.readWet(s,
        SourceQueries.wetStagingRoot(s, dir))
      .select(col("target_uri").as("url"),
        TextFunctions.wordCount(col("text")).cast("long").as("n_words"))
      .filter(col("n_words") >= 20)
      .select(UrlFunctions.registeredDomain(UrlFunctions.hostOf(col("url")),
          pslSubset).as("domain"),
        col("n_words"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("sum_words"))
  }

  // ---------------------------------------------------------------- q76
  /** q74 WITH THE PROTOCOL GATE: the complete compliant crawl chain —
    * WARC container split (stage −2) → **robots.txt RFC 9309 gate
    * (stage −1.75, [[graft.functions.UrlFunctions.robotsGate]])** →
    * in-page robots-meta gate (−1.5) → main-content extraction + word
    * gate (−1/0) → canonical-URL dedup → domain blocklist → per-domain
    * quota. The robots gate runs on the record's Target-URI BEFORE any
    * payload work, exactly where a real pipeline puts it (don't decode
    * what you may not crawl); the oracle re-decides every URL from the
    * hand-derived rule table (t51's independent matcher) and replays
    * the rest of the chain end-to-end.
    *
    * Scale shape: q74's plan with one broadcast hash join (domain →
    * parsed rules) and a row-local codegen match added to the scan
    * stage — zero new shuffles, and the gate PRUNES payload-side work
    * (extraction runs only on fetchable pages).
    */
  val q76_warc_robots_chain = q("q76_warc_robots_chain",
    s"""WITH $urlSqlCtes,
       |$domainSqlCtes,
       |$robotsSqlCtes,
       |rob_keep AS (SELECT tgt.doc_id
       |  FROM tgt LEFT JOIN rob_best b ON tgt.doc_id = b.doc_id
       |  WHERE coalesce(b.allow, TRUE)),
       |h AS (SELECT doc_id, ${htmlFixtureSqlWith(s"$robotsMetaPieceSql || ")}
       |        AS html FROM documents JOIN rob_keep USING (doc_id)),
       |rr AS (SELECT doc_id, ${duckRobots("html")} AS d FROM h),
       |rb AS (SELECT h.doc_id, html FROM h JOIN rr ON h.doc_id = rr.doc_id
       |       WHERE NOT list_contains(d, 'noindex')
       |         AND NOT list_contains(d, 'none')),
       |b AS (SELECT doc_id, $duckBlocksSql AS bs FROM rb),
       |m AS (SELECT doc_id,
       |    coalesce(array_to_string(list_transform(
       |      list_filter(bs, b -> $duckKeptPred), b -> ${duckVis("b")}), ' '),
       |      '') AS main_text
       |  FROM b),
       |g AS (SELECT doc_id,
       |    CASE WHEN length(main_text) = 0 THEN 0
       |         ELSE len(string_split(main_text, ' ')) END AS n_words
       |  FROM m
       |  WHERE CASE WHEN length(main_text) = 0 THEN 0
       |             ELSE len(string_split(main_text, ' ')) END >= 20),
       |canon AS (SELECT yy.doc_id, $canonSql AS canon_url, domain, n_words
       |          FROM yy JOIN dd ON yy.doc_id = dd.doc_id
       |          JOIN g ON yy.doc_id = g.doc_id),
       |dedup AS (SELECT canon_url, MIN(doc_id) AS doc_id
       |          FROM canon GROUP BY 1),
       |dd2 AS (SELECT d.doc_id, d.canon_url, c.domain, c.n_words
       |        FROM (SELECT dedup.doc_id, canon_url FROM dedup) d
       |        JOIN canon c ON d.doc_id = c.doc_id AND d.canon_url = c.canon_url),
       |blocked AS (SELECT * FROM dd2
       |  WHERE domain IS NULL OR domain NOT IN ('example.co.uk')),
       |quota AS (SELECT doc_id, canon_url, domain, n_words, row_number() OVER (
       |    PARTITION BY domain
       |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM blocked)
       |SELECT doc_id, domain, canon_url, n_words FROM quota WHERE rn <= 10"""
      .stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.sources.WarcSource
    // the SAME staged crawl as q74 (identical builder → one shared tree)
    val root = DedupQueries.DedupStaging.ensure("q74", dir) { r =>
      val pages = Tables.documents(s, dir).select(
        urlFixture.as("uri"), lit("2026-08-01T00:00:00Z").as("ts"),
        htmlFixtureWith(robotsMetaPiece).as("html"))
      WarcSource.writeWarc(pages.repartition(8), "uri", "ts", "html",
        s"$r/crawl")
    }
    // the SAME operator pair the s26 stream runs — q76 and its streaming
    // twin are equivalent because this IS the same code path, not a
    // manually synchronized copy
    val recs = crawlRecords(s, s"$root/crawl")
    val survivors = graft.operators.CrawlIngest.curateBatch(recs,
        crawlRobotsDf(recs), "graftbot", crawlIdOf, minWords = 20)
      .localCheckpoint(true) // one extraction, two consumers (q72's note)
    graft.operators.CrawlIngest.curated(survivors,
      Seq("example.co.uk").toDF("domain"), cap = 10)
  }

  /** Decoded, domain-tagged records of a staged crawl tree — the shared
    * per-batch input of q76 and s26's installments: decode the container
    * ONCE (the robots relation and the gated main chain both consume
    * this relation; without the boundary the WARC parse + the
    * interpreted domain HOF ran twice — t51's lesson; at real scale the
    * decoded-record relation is a persisted stage boundary anyway).
    */
  private[queries] def crawlRecords(s: SparkSession,
                                    path: String): DataFrame = {
    import graft.functions.UrlFunctions
    import graft.sources.WarcSource
    WarcSource.good(WarcSource.read(s, path))
      .select(col("target_uri").as("url"),
        decode(col("body"), "UTF-8").as("__html"))
      .withColumn("domain",
        UrlFunctions.registeredDomain(UrlFunctions.hostOf(col("url")),
          pslSubset))
      .localCheckpoint(true)
  }

  /** The fixture's per-domain robots cache relation for a record batch —
    * stage −1.75's small side (a real pipeline maintains this as its
    * fetched robots cache).
    */
  private[queries] def crawlRobotsDf(recs: DataFrame): DataFrame =
    recs.select("domain").where(col("domain").isNotNull).distinct()
      .withColumn("robots_txt", robotsTxtFor(col("domain")))
      .where(col("robots_txt").isNotNull)

  /** Fixture doc id: the page title carries it. */
  private[queries] val crawlIdOf: Column => Column =
    h => regexp_extract(h, "<title>Doc ([0-9]+)</title>", 1).cast("long")

  // ---------------------------------------------------------------- q73
  /** CORPUS DATACARD: the per-language summary table a dataset release
    * publishes (and the first sanity read before training) — document
    * and token counts, mean quality, and exact-duplicate exposure, all
    * from already-gated building blocks (t01's token counts, t02's
    * quality score, t04's fingerprint, d01's duplicate-group shape) in
    * ONE pass over the corpus plus a fingerprint-keyed count. Every
    * aggregate is partial (map-side combined) and DECIMAL-routed where
    * doubles fold, so the card replays bit-for-bit.
    */
  val q73_corpus_datacard = q("q73_corpus_datacard",
    s"""WITH n AS (SELECT doc_id, lang, text, ${normSql("text")} AS norm
       |           FROM documents),
       |f AS (SELECT doc_id, lang,
       |    CAST(len(regexp_extract_all(text, '$tokenPat')) AS BIGINT) AS n_tok,
       |    md5(lower(norm)) AS fp,
       |    ROUND(least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
       |      + greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0
       |          ELSE CAST(len(regexp_extract_all(text, '$punctPat')) AS DOUBLE)
       |               / CAST(length(text) AS DOUBLE) END) * 5.0) * 0.3
       |      + least((CASE WHEN length(norm) = 0
       |                      OR len(string_split(norm, ' ')) = 0 THEN 0.0
       |          ELSE CAST(len(regexp_extract_all(lower(norm), '$stopPat')) AS DOUBLE)
       |               / CAST(len(string_split(norm, ' ')) AS DOUBLE) END) * 4.0,
       |          1.0) * 0.3, 6) AS quality
       |  FROM n),
       |g AS (SELECT fp, COUNT(*) AS c FROM f GROUP BY fp)
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       |  ${GraftQuery.dsum("quality")} / COUNT(*) AS mean_quality,
       |  CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
       |FROM f JOIN g USING (fp)
       |GROUP BY lang""".stripMargin) { (s, dir) =>
    val f = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"),
      TextFunctions.fingerprint(col("text")).as("fp"),
      TextFunctions.qualityScore(col("text")).as("quality"))
    val g = f.groupBy("fp").agg(count(lit(1)).as("__c"))
    f.join(g, "fp")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        (graft.Cols.decimalSum(col("quality")) / count(lit(1)))
          .as("mean_quality"),
        sum(when(col("__c") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
  }

  // ---------------------------------------------------------------- q75
  /** DATACARD TOKEN-LENGTH DISTRIBUTION: per-language p50/p95/p99 of
    * document token counts — the length panel a release datacard
    * publishes next to q73's counts, computed through the MERGEABLE
    * [[graft.plans.QuantileSketch]] (one map-side-combined aggregate,
    * ≤ bins rows per language cross the wire — the 100 TB shape). At
    * s = 15 every document below 2^16 tokens sits in the sketch's EXACT
    * regime, so the oracle is the full-strength rank-exact percentile
    * over the corpus: if binning, merging or rank targeting were off by
    * one anywhere, the hash gate fails. s25 is the continuous-view twin
    * on the [[graft.operators.Datacard]] store.
    */
  val q75_datacard_lengths = q("q75_datacard_lengths",
    s"""WITH f AS (SELECT lang,
       |        CAST(len(regexp_extract_all(text, '$tokenPat')) AS BIGINT) AS n_tok
       |      FROM documents),
       |t AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY 1),
       |r AS (SELECT lang, n_tok,
       |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tok) AS rn
       |      FROM f)
       |SELECT r.lang, t.n AS n_docs,
       |  MIN(CASE WHEN rn >= (50 * n + 99) // 100 THEN n_tok END) AS p50_tokens,
       |  MIN(CASE WHEN rn >= (95 * n + 99) // 100 THEN n_tok END) AS p95_tokens,
       |  MIN(CASE WHEN rn >= (99 * n + 99) // 100 THEN n_tok END) AS p99_tokens
       |FROM r JOIN t USING (lang)
       |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    import graft.plans.QuantileSketch
    val sres = 15
    Tables.documents(s, dir)
      .select(col("lang"),
        TextFunctions.tokenCount(col("text")).cast("long").as("__tok"))
      .groupBy("lang")
      .agg(QuantileSketch.sketch(col("__tok"), s = sres,
        graft.operators.PercentileView.defaultMaxBins(sres)).as("__sk"))
      .select(col("lang"),
        QuantileSketch.sketchCount(col("__sk")).as("n_docs"),
        QuantileSketch.quantileAt(col("__sk"), 50).as("p50_tokens"),
        QuantileSketch.quantileAt(col("__sk"), 95).as("p95_tokens"),
        QuantileSketch.quantileAt(col("__sk"), 99).as("p99_tokens"))
  }

  // ---------------------------------------------------------------- t50
  /** COMPRESSION-RATIO QUALITY SIGNAL ([[graft.plans.DeflateSizeExpr]] /
    * [[TextFunctions.compressionRatio]]): the classic third Gopher-rule
    * member next to t02's stopword/punctuation score and t09's n-gram
    * repetition rates — text that DEFLATEs far below the corpus norm is
    * repetitive/boilerplate. Per document: raw and deflated UTF-8 byte
    * counts, the 6-dp ratio, and the curation verdict composing the
    * ratio gate with t02's quality gate (the optional extra gate on the
    * t08 chain). Golden-gated like t26/t27 — zlib has no SQL twin; the
    * committed parquet pins every byte count, so a zlib/level/strategy
    * drift fails the gate loudly. DeflateSpec carries the laws
    * (determinism, monotone-under-planted-repetition, codegen parity).
    */
  val t50_compression_ratio = GraftQuery("t50_compression_ratio",
    (s, dir) => {
      Tables.documents(s, dir).select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_raw"),
        TextFunctions.deflateSize(col("text")).as("n_deflate"),
        TextFunctions.compressionRatio(col("text")).as("ratio"),
        (TextFunctions.compressionRatio(col("text")) >= 0.5 &&
          TextFunctions.qualityScore(col("text")) >= 0.5).as("kept"))
    }, GoldenOracles.sqlFor("t50_compression_ratio"))

  // ---------------------------------------------------------------- t40
  /** PHRASE-BLOCKLIST PROBE ([[graft.plans.MultiMatchExpr]]): the ids of
    * every banned phrase occurring in each document, from ONE Aho–Corasick
    * automaton walk per document — O(len(text) + matches) instead of one
    * `contains` pass per pattern (k full scans), and the probe runs inside
    * the corpus scan stage under whole-stage codegen (a thousand-phrase
    * blocklist at 100 TB is exactly this shape: the automaton is
    * driver-built and ships once per executor via `addReferenceObj`).
    * The fixture list carries genuine automaton structure: "park" occurs
    * ONLY inside "spark" (output-via-failure-link), "table" is a suffix of
    * "fast table" and a prefix of "table part" (overlapping dictionary
    * entries), and one phrase never occurs (zero-hit patterns must not
    * surface). The DuckDB oracle replays it as k `contains` predicates —
    * the exact relation the scaladoc contract pins (UTF-16 substring
    * containment ≡ SQL contains).
    */
  private[queries] val blockPhrases: Seq[String] = Seq(
    "fast table", "table", "table part", "spark", "park",
    "row scan slow", "a a the", "merge batch", "value fast",
    "never-in-corpus")

  val t40_phrase_blocklist = q("t40_phrase_blocklist",
    s"""SELECT d.doc_id, p.pattern_id, p.phrase
       |FROM documents d
       |JOIN (VALUES ${blockPhrases.zipWithIndex
             .map { case (p, i) => s"($i, '$p')" }.mkString(", ")})
       |  p(pattern_id, phrase)
       |  ON contains(d.text, p.phrase)""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(graft.plans.MultiMatchExpr.matchedIds(col("text"),
          blockPhrases)).as("pattern_id"))
      .withColumn("phrase",
        element_at(typedlit(blockPhrases), col("pattern_id") + 1))
  }

  // ---------------------------------------------------------------- t41
  /** PSL WILDCARD/EXCEPTION RULES ([[graft.functions.UrlFunctions
    * .registeredDomainAgainst]]): the full publicsuffix.org algorithm —
    * `*.ck` makes every `<label>.ck` a public suffix, `!www.ck` overrides
    * the wildcard (the rule itself becomes the registered domain), an
    * exception match prevails over everything, otherwise longest rule
    * wins. Real PSL data carries ~1k such rules (`*.blogspot.com`-style);
    * a web pipeline hits them constantly. The host fixture covers: a
    * wildcard suffix one level down (registrant under `*.platform.dev`),
    * the exception host itself, a registrant UNDER the exception host, a
    * plain wildcard registrant, a plain-rule registrant, and a host that
    * IS a wildcard public suffix (null domain). The DuckDB oracle replays
    * candidate generation + the two-kind max exactly.
    */
  private val pslRules41 =
    Seq("com", "dev", "ck", "*.ck", "!www.ck", "*.platform.dev")

  private def hostFixture41: Column = {
    val b = pmod(col("doc_id"), lit(6))
    when(b === 0, concat(col("source"), lit(".users.platform.dev")))
      .when(b === 1, lit("www.ck"))
      .when(b === 2, concat(col("source"), lit(".www.ck")))
      .when(b === 3, concat(col("source"), lit(".cdn.ck")))
      .when(b === 4, concat(col("source"), lit(".example.com")))
      .otherwise(lit("users.platform.dev"))
  }

  private val hostFixture41Sql =
    """CASE doc_id % 6
      | WHEN 0 THEN source || '.users.platform.dev'
      | WHEN 1 THEN 'www.ck'
      | WHEN 2 THEN source || '.www.ck'
      | WHEN 3 THEN source || '.cdn.ck'
      | WHEN 4 THEN source || '.example.com'
      | ELSE 'users.platform.dev' END""".stripMargin

  val t41_psl_wildcard = q("t41_psl_wildcard",
    s"""WITH hf AS (SELECT doc_id, $hostFixture41Sql AS host FROM documents),
       |hh AS (SELECT doc_id, host, string_split(host, '.') AS labels,
       |    len(string_split(host, '.')) AS n FROM hf),
       |cand AS (SELECT doc_id, n, k,
       |    array_to_string(labels[n-k+1:n], '.') AS cand,
       |    CASE WHEN k >= 2
       |         THEN '*.' || array_to_string(labels[n-k+2:n], '.') END AS candw
       |  FROM hh, (SELECT unnest(range(1, 6)) AS k) ks WHERE k <= n),
       |rules AS (SELECT * FROM (VALUES ('com', 0), ('dev', 0), ('ck', 0),
       |    ('*.ck', 1), ('www.ck', 2), ('*.platform.dev', 1)) v(rule, kind)),
       |m AS (SELECT doc_id,
       |    max(CASE WHEN kind = 2 THEN k - 1 END) AS pslexc,
       |    max(CASE WHEN kind <> 2 THEN k END) AS pslstd
       |  FROM cand JOIN rules ON
       |    (kind <> 1 AND rule = cand) OR (kind = 1 AND rule = candw)
       |  GROUP BY doc_id)
       |SELECT hh.doc_id, host,
       |  CASE WHEN n > coalesce(pslexc, pslstd, 1)
       |       THEN array_to_string(labels[n-coalesce(pslexc, pslstd, 1):n], '.')
       |  END AS domain
       |FROM hh LEFT JOIN m USING (doc_id)""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.functions.UrlFunctions
    val hosts = Tables.documents(s, dir)
      .select(col("doc_id"), hostFixture41.as("host"))
    UrlFunctions.registeredDomainAgainst(hosts, "doc_id", "host",
        pslRules41.toDF("suffix"))
      .select("doc_id", "host", "domain")
  }

  // ---------------------------------------------------------------- t42
  /** CCNet PERPLEXITY BUCKETS: the stage CCNet runs right after LM
    * scoring — split the scored corpus into head/middle/tail terciles of
    * the reference-LM likelihood, the partition downstream mixture
    * weights key on (head = closest to the reference distribution).
    * Pure composition of two gated operators: t20's stupid-backoff
    * scorer ([[graft.operators.NgramLm.scoreStupidBackoff]], ref = even
    * docs, targets = odd docs) and q12's exact qcut
    * ([[graft.operators.QuantileBucket.qcut3]]) over one global group.
    * Costs one grouped percentile + a broadcast edge join on top of the
    * scoring pass; the DuckDB oracle replays scoring AND the tercile cut
    * (quantile_cont ≡ Spark's exact interpolated percentile, the q12
    * parity) end to end.
    */
  val t42_perplexity_buckets = q("t42_perplexity_buckets",
    s"""WITH $lmScoreSqlCtes,
       |e AS (SELECT min(score) AS mn, quantile_cont(score, 1.0/3.0) AS q1,
       |             quantile_cont(score, 2.0/3.0) AS q2, max(score) AS mx
       |      FROM lmscore),
       |e2 AS (SELECT list_sort(list_distinct([mn, q1, q2, mx])) AS edges FROM e)
       |SELECT doc_id, score,
       |  CASE WHEN score IS NULL THEN NULL
       |       WHEN len(edges) - 1 <= 1 THEN 'Low'
       |       WHEN len(edges) - 1 = 2
       |            THEN (CASE WHEN score <= edges[2] THEN 'Low' ELSE 'High' END)
       |       ELSE (CASE WHEN score <= edges[2] THEN 'Low'
       |                  WHEN score <= edges[3] THEN 'Medium' ELSE 'High' END)
       |  END AS ppl_bucket
       |FROM lmscore CROSS JOIN e2""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val scored = graft.operators.NgramLm.scoreStupidBackoff(
      docs.filter(col("doc_id") % 2 === 1), docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text")
    graft.operators.QuantileBucket.qcut3(
        scored.withColumn("__g", lit(1)), Seq("__g"), "score", "ppl_bucket")
      .select("doc_id", "score", "ppl_bucket")
  }

  // ---------------------------------------------------------------- t43
  /** TOKEN-BUDGETED domain quota ([[graft.operators.Sampling
    * .weightCappedPerStratum]]): each registered domain contributes at
    * most 1000 TOKENS — the FineWeb-style refinement of q70's document
    * cap (a domain of ten 500-token pages and a domain of ten 20-token
    * stubs are NOT the same contribution; budgets must be in the unit
    * the trainer consumes). Kept set = the greedy prefix of the
    * deterministic md5 draw whose running token sum stays ≤ budget —
    * one window shuffle, exactly replayed by DuckDB's running-sum
    * window.
    */
  val t43_token_quota = q("t43_token_quota",
    s"""WITH $urlSqlCtes,
       |$domainSqlCtes,
       |tk AS (SELECT dd.doc_id, domain,
       |         CAST(len(regexp_extract_all(d.text, '$tokenPat')) AS BIGINT) AS n_tok
       |       FROM dd JOIN documents d ON dd.doc_id = d.doc_id),
       |cum AS (SELECT doc_id, domain, n_tok, sum(n_tok) OVER (
       |    PARTITION BY domain ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |    ROWS UNBOUNDED PRECEDING) AS c FROM tk)
       |SELECT doc_id, domain, n_tok FROM cum WHERE c <= 1000""".stripMargin) { (s, dir) =>
    import graft.functions.UrlFunctions
    val withDom = Tables.documents(s, dir)
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"),
        UrlFunctions.registeredDomain(UrlFunctions.hostOf(urlFixture),
          pslSubset).as("domain"))
    graft.operators.Sampling.weightCappedPerStratum(withDom, Seq("domain"),
        Seq("doc_id"), "n_tok", budget = 1000L,
        hash = Some(md5(col("doc_id").cast("string").cast("binary"))))
      .select("doc_id", "domain", "n_tok")
  }

  // ---------------------------------------------------------------- t44
  /** TOKEN-BUDGETED LANGUAGE MIXTURE ([[graft.operators.Sampling
    * .budgetCappedPerStratum]]): the data-mixture operation proper — "at
    * most 4000 tokens of English, 2000 of Chinese, 1500 each of German
    * and French, Spanish unconstrained" — per-stratum budgets from a
    * relation, strata absent from it kept whole. Each language keeps the
    * greedy prefix of the deterministic md5 draw whose running token sum
    * stays within ITS budget; one window shuffle + a broadcast of the
    * (driver-small) mixture spec, exactly replayed by DuckDB's
    * running-sum window + budget join.
    */
  val t44_lang_token_budgets = q("t44_lang_token_budgets",
    s"""WITH tk AS (SELECT doc_id, lang,
       |         CAST(len(regexp_extract_all(text, '$tokenPat')) AS BIGINT) AS n_tok
       |       FROM documents),
       |b AS (SELECT * FROM (VALUES ('en', 4000), ('zh', 2000),
       |       ('de', 1500), ('fr', 1500)) v(lang, budget)),
       |cum AS (SELECT doc_id, lang, n_tok, sum(n_tok) OVER (
       |    PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |    ROWS UNBOUNDED PRECEDING) AS c FROM tk)
       |SELECT doc_id, lang, n_tok FROM cum LEFT JOIN b USING (lang)
       |WHERE budget IS NULL OR c <= budget""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
    val budgets = Seq(("en", 4000L), ("zh", 2000L), ("de", 1500L),
      ("fr", 1500L)).toDF("lang", "budget")
    graft.operators.Sampling.budgetCappedPerStratum(docs, Seq("lang"),
        Seq("doc_id"), "n_tok", budgets,
        hash = Some(md5(col("doc_id").cast("string").cast("binary"))))
      .select("doc_id", "lang", "n_tok")
  }

  // ---------------------------------------------------------------- t48
  /** BPE-EXACT TOKEN BUDGET (t43 with the tokens the TRAINER actually
    * consumes): t43/t44 weigh their running sums in regex-token counts —
    * a deterministic PROXY — but a mixture spec is written in tokenizer
    * tokens, and the engine already ships exact BPE inference as a
    * codegen expression ([[graft.plans.BpeEncodeExpr]], t27). This
    * entry composes them: the SAME per-domain greedy-prefix quota as
    * t43, weighted by `size(bpe_encode(text))` under the t26-trained
    * 60-merge table. No new operator code — the weight column is the
    * only change, which is the point: budgets are a weight-generic
    * machine. Golden-gated like t26/t27 (the merge table and greedy
    * inference have no SQL twin); SamplingSpec carries the law that the
    * kept set is exactly the greedy prefix in BPE tokens.
    */
  val t48_bpe_token_quota = GraftQuery("t48_bpe_token_quota", (s, dir) => {
    import graft.functions.UrlFunctions
    import graft.operators.Bpe
    val docs = Tables.documents(s, dir)
    val merges = Bpe.learn(Bpe.wordCounts(docs, "text"), 60)
    val withDom = docs.select(col("doc_id"),
      size(Bpe.encode(col("text"), merges)).cast("long").as("n_bpe"),
      UrlFunctions.registeredDomain(UrlFunctions.hostOf(urlFixture),
        pslSubset).as("domain"))
    graft.operators.Sampling.weightCappedPerStratum(withDom, Seq("domain"),
        Seq("doc_id"), "n_bpe", budget = 1000L,
        hash = Some(md5(col("doc_id").cast("string").cast("binary"))))
      .select("doc_id", "domain", "n_bpe")
  }, GoldenOracles.sqlFor("t48_bpe_token_quota"))

  // ---------------------------------------------------------------- t45
  /** DETERMINISTIC TRAIN/VAL/TEST SPLIT ([[graft.operators.Sampling
    * .deterministicSplit]]): every document gets exactly one of
    * train/val/test (80/10/10), stratified by language, by the seeded
    * md5 draw — the held-out carve-out every training pipeline runs, and
    * the one place `rand()` silently re-deals the eval set on every
    * rerun. Per stratum of n rows the boundaries are EXACT binary64
    * floors (train = floor(0.8·n), val = floor(0.9·n) − floor(0.8·n),
    * test = remainder), so DuckDB replays both the draw (the t14
    * md5(seed || '|' || id) contract) and the boundary arithmetic
    * bit-for-bit. The rank rides [[graft.operators.Sampling]]'s
    * size-gated per-stratum running sum (window at bench scale,
    * two-pass at 100 TB); d20 audits near-dup leakage ACROSS this same
    * split.
    */
  val t45_train_val_test = q("t45_train_val_test",
    """WITH r AS (SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5('42|' || CAST(doc_id AS VARCHAR)), doc_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM documents)
      |SELECT doc_id, lang,
      |  CASE WHEN rn <= floor(CAST(0.8 AS DOUBLE) * n) THEN 'train'
      |       WHEN rn <= floor((CAST(0.8 AS DOUBLE) + CAST(0.1 AS DOUBLE)) * n)
      |            THEN 'val'
      |       ELSE 'test' END AS split
      |FROM r""".stripMargin) { (s, dir) =>
    graft.operators.Sampling.deterministicSplit(
        Tables.documents(s, dir).select("doc_id", "lang"), Seq("lang"),
        Seq("doc_id"), Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)),
        seed = 42L)
      .select("doc_id", "lang", "split")
  }

  // ---------------------------------------------------------------- t46
  /** DETERMINISTIC IMPORTANCE RESAMPLING ([[graft.operators.Sampling
    * .importanceSample]]): keep each document with probability equal to
    * its quality score — the DSIR-style quality-weighted thinning a
    * curation pipeline runs after scoring (high-quality documents kept
    * with high probability, junk down-weighted instead of hard-cut like
    * t16's gate). The acceptance draw is the deterministic md5 uniform
    * (q62's formula), and the probability is the ROUNDED t02 quality
    * score — rounded precisely so both engines compare bit-identical
    * doubles (t02's hash gate proves the rounded score agrees; the
    * unrounded formula's last bits need not). Zero shuffles: draw,
    * score, and comparison all ride the scan.
    */
  val t46_importance_sample = q("t46_importance_sample",
    s"""WITH n AS (SELECT doc_id, text, ${normSql("text")} AS norm FROM documents),
       |m AS (
       |  SELECT doc_id, text,
       |    CASE WHEN length(norm) = 0 THEN 0
       |         ELSE len(string_split(norm, ' ')) END AS wc,
       |    len(regexp_extract_all(text, '$punctPat')) AS punct,
       |    len(regexp_extract_all(lower(norm), '$stopPat')) AS stop
       |  FROM n),
       |r AS (
       |  SELECT doc_id,
       |    CASE WHEN length(text) = 0 THEN 0.0
       |         ELSE CAST(punct AS DOUBLE) / CAST(length(text) AS DOUBLE) END AS pr,
       |    CASE WHEN wc = 0 THEN 0.0
       |         ELSE CAST(stop AS DOUBLE) / CAST(wc AS DOUBLE) END AS sr,
       |    CAST(length(text) AS DOUBLE) AS tl
       |  FROM m),
       |qq AS (SELECT doc_id,
       |    ROUND(least(tl / 500.0, 1.0) * 0.4
       |        + greatest(0.0, 1.0 - pr * 5.0) * 0.3
       |        + least(sr * 4.0, 1.0) * 0.3, 6) AS quality
       |  FROM r)
       |SELECT doc_id, quality FROM qq
       |WHERE (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS UBIGINT)
       |       + 0.5) / 4503599627370496.0
       |      < least(greatest(quality, 0.0), 1.0)""".stripMargin) { (s, dir) =>
    val scored = Tables.documents(s, dir).select(col("doc_id"),
      round(TextFunctions.qualityScore(col("text")), 6).as("quality"))
    graft.operators.Sampling.importanceSample(scored, Seq("doc_id"),
      col("quality"))
  }

  val all: Seq[GraftQuery] = Seq(
    t46_importance_sample,
    t31_unicode_normalize, t32_classifier_train, t33_hybrid_rrf,
    t34_url_canonicalize, t35_registered_domain, t36_domain_blocklist,
    q70_domain_quota, t37_langid_train, t38_url_dedup, t39_domain_report,
    t40_phrase_blocklist, t41_psl_wildcard, t42_perplexity_buckets,
    t43_token_quota, t44_lang_token_budgets, t48_bpe_token_quota,
    q71_web_curation, t45_train_val_test,
    t47_html_extract, q72_web_curation_html, t49_robots_filter,
    q73_corpus_datacard, q74_warc_to_corpus, q75_datacard_lengths,
    t51_robots_txt_gate, q76_warc_robots_chain, t53_robots_sitemaps,
    q77_wet_corpus_stats,
    t01_token_stats, t02_quality_score, t03_lang_id, t04_fingerprint,
    t05_rolling_hash, t06_redact, t07_tfidf_top_terms, t08_curation_pipeline,
    t09_repetition, t10_mixture_resample, t11_boilerplate_ngrams,
    t12_sequence_packing, t13_packed_sequences, t14_epoch_shuffle,
    t15_line_dedup, t16_quality_gate, t17_doc_chunking,
    t18_quality_classifier, t19_span_removal, t20_lm_likelihood,
    t21_within_doc_dedup, t22_lm_trigram, t23_inverted_index,
    t24_keyword_search, t25_bm25_search, t26_bpe_merges, t27_bpe_encode,
    t28_tfidf_cosine, t29_phrase_search, t30_langid_eval,
    t50_compression_ratio, t52_byte_bpe, t54_sitemap_ingest)
}
