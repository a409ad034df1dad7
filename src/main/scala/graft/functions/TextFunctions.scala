package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * whitespace normalization (reference: dw-etl `raw_analysis/main.py:16-24`),
  * content fingerprinting, token counting, quality scoring and a light
  * n-gram/marker-word language heuristic.
  *
  * All are pure column expressions (codegen'd, no UDFs) — at 100 TB these run
  * map-side inside the scan stage with zero shuffle.
  */
object TextFunctions {

  /** Collapse \r\n and runs of whitespace to single spaces and trim
    * (reference `raw_analysis/main.py:16-24`).
    */
  def normalizeWs(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "[\\r\\n]+", " "), "\\s+", " "))

  /** Unicode normalization ([[graft.plans.UnicodeNormalizeExpr]]):
    * NFC/NFD/NFKC/NFKD, optionally accent-folded (combining marks removed
    * from the canonical decomposition). The step that makes byte-level
    * fingerprints see composed ("é") and decomposed ("e"+U+0301) web text
    * as the same document.
    */
  def normalizeUnicode(c: Column, form: String = "NFC",
                       stripAccents: Boolean = false): Column =
    graft.plans.UnicodeNormalizeExpr.unicodeNormalize(c, form, stripAccents)

  /** Content fingerprint: md5 of the lower-cased, whitespace-normalized
    * text — optionally Unicode-NFC-normalized first (`unicodeNfc = true`),
    * so canonically-equivalent byte forms dedup together. Stable across
    * engines (hex string), used for exact dedup.
    */
  def fingerprint(c: Column, unicodeNfc: Boolean): Column = {
    val base = if (unicodeNfc) normalizeUnicode(c) else c
    md5(lower(normalizeWs(base)))
  }

  def fingerprint(c: Column): Column = fingerprint(c, unicodeNfc = false)

  /** Whitespace token count. */
  def wordCount(c: Column): Column =
    when(length(normalizeWs(c)) === 0, lit(0))
      .otherwise(size(split(normalizeWs(c), " ")))

  /** BPE-ish token estimate: word pieces plus standalone punctuation,
    * `\w+|[^\w\s]` — a deterministic proxy for subword tokenizer counts.
    */
  def tokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0)).otherwise(
      size(regexp_extract_all(c, lit("[.,;:!?'\"()\\[\\]{}-]"), lit(0))).cast("double")
        / length(c).cast("double"))

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "it", "that", "for", "on", "with", "as")

  /** Ratio of English stopwords to total whitespace tokens. */
  def stopwordRatio(c: Column): Column = {
    val toks = lower(normalizeWs(c))
    val pat = "\\b(" + stopwords.mkString("|") + ")\\b"
    when(wordCount(c) === 0, lit(0.0)).otherwise(
      size(regexp_extract_all(toks, lit(pat), lit(0))).cast("double")
        / wordCount(c).cast("double"))
  }

  /** DEFLATE size of the text's UTF-8 bytes
    * ([[graft.plans.DeflateSizeExpr]] — raw RFC 1951, level 6).
    */
  def deflateSize(c: Column): Column =
    graft.plans.DeflateSizeExpr.deflateSize(c)

  /** Compression-ratio quality signal: deflate bytes / raw UTF-8 bytes
    * (0 for empty text), rounded to 6 dp. Low values mean the text is
    * highly compressible — repetitive/boilerplate (the classic Gopher
    * third rule beside stopword and repetition heuristics). Golden-gated
    * (no SQL engine replays zlib).
    */
  def compressionRatio(c: Column): Column =
    when(octet_length(c) === 0, lit(0.0)).otherwise(
      round(deflateSize(c).cast("double") /
        octet_length(c).cast("double"), 6))

  /** Heuristic document-quality score in [0,1]: combines a length band,
    * low punctuation noise, and stopword presence. Deterministic arithmetic
    * only, so an external oracle can replicate it bit-for-bit.
    */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / lit(500.0), lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(c) * 5.0)
    val stopScore = least(stopwordRatio(c) * 4.0, lit(1.0))
    round((lenScore * 0.4 + punctPenalty * 0.3 + stopScore * 0.3), 6)
  }

  /** PII-style scrub for training corpora: emails → `<EMAIL>`, simple
    * international phone shapes → `<PHONE>`. Patterns are RE2-safe (no
    * backrefs/lookarounds) so external engines replay them identically;
    * a production scrubber would add locale-specific shapes on top.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+\\d{1,2}-\\d{3}-\\d{4}"

  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(c, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "una", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  /** Marker-word language heuristic: count language-specific stopwords, pick
    * the argmax (ties → lexicographically first language code); CJK
    * characters short-circuit to "zh"; no markers at all → "und".
    * A real system would use fastText/CLD3 — this is the deterministic,
    * dependency-free n-gram-style heuristic variant.
    */
  def langId(c: Column): Column = {
    val toks = lower(normalizeWs(c))
    def markerHits(words: Seq[String]): Column =
      size(regexp_extract_all(toks, lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))
    // The hit counts are evaluated ONCE into an array, and the
    // priority-order argmax (first language with the max count) is a single
    // left fold whose accumulator carries (best hits, best code). The
    // previous pairwise-comparison CASE chain referenced every hit-count
    // expression ~7 times; expression-tree duplication exploded the
    // generated projection past Janino's method limits (codegen fell back
    // to interpreted eval for the whole stage) and re-ran the marker
    // regexes per reference. The decision itself is finished inside the
    // fold's `finish` lambda so the fold is evaluated exactly once.
    val hitsArr = array(langMarkers.map { case (_, words) => markerHits(words) }: _*)
    val codes = typedLit(langMarkers.map(_._1))
    val decided = aggregate(
      zip_with(hitsArr, codes, (h, code) => struct(h.as("h"), code.as("code"))),
      struct(lit(-1).as("h"), lit("und").as("code")),
      (acc, x) => when(x.getField("h") > acc.getField("h"), x).otherwise(acc),
      acc => when(acc.getField("h") <= 0, lit("und"))
        .otherwise(acc.getField("code")))
    when(c.rlike("[\\u4e00-\\u9fff]"), lit("zh")).otherwise(decided)
  }
}
