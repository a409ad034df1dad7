package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML main-content extraction — stage −1 of the web-curation pipeline
  * (raw crawl page → visible text → boilerplate-free main content), the
  * step the engine's URL/quota/quality/dedup chain (q71) previously
  * assumed done. The reference's inputs arrive as pre-cleaned CSV/DBF
  * (`himalayan_etl/ops/extract.py:16`–`255` never sees markup), so this
  * is an extension operator: Arc90-readability/jusText-style BLOCK
  * segmentation with a link-density boilerplate rule, a published,
  * public-knowledge heuristic family.
  *
  * DESIGN CONSTRAINT — oracle replayability decides the implementation:
  * everything here is a composition of `regexp_replace` /
  * `regexp_extract_all` / array HOFs whose regexes stay inside the RE2
  * subset (no backreferences, no lookaround), so DuckDB replays the
  * extraction EXACTLY (same inline `(?is)` flags, same lazy quantifiers)
  * and the correctness gate hash-matches the full text output. The whole
  * extraction is one narrow projection over the scan — zero exchanges,
  * no joins, no aggregates (plan-pinned), embarrassingly parallel at
  * 100 TB; the page-level regexes run codegen'd in the scan projection,
  * the per-block HOF lambdas are interpreted (Spark has no lambda
  * codegen) but stay inside the same pipeline.
  *
  * SEMANTICS (fixed, documented, and mirrored verbatim in the oracle):
  *   1. drop invisible content, in this order: <script>/<style>/
  *      <noscript> elements (lazy to the first matching close tag),
  *      HTML comments, CDATA sections;
  *   2. replace every BLOCK-LEVEL tag (open or close, p/div/h1–6/li/…/
  *      br/hr/title — the HTML5 flow-content splitters) with a block
  *      boundary; remaining tags are inline;
  *   3. per block: visible text = strip inline tags → decode the six
  *      basic entities (&lt; &gt; &quot; &#39; &apos; &nbsp;, then
  *      &amp; LAST, the standard single-pass order) → whitespace-
  *      normalize; link text = the same pipeline over the concatenated
  *      `<a …>…</a>` bodies;
  *   4. a block is MAIN CONTENT iff its text has ≥ `minChars` characters
  *      AND link-text length ≤ `maxLinkDensity` × text length (the
  *      Arc90/jusText link-density rule: navigation, related-links and
  *      footer blocks are short or link-dominated).
  *
  * Known limits (regex-level HTML, the standard trade of this operator
  * class, exercised in ExtractSpec): attribute values containing a bare
  * `>` end the tag early; nested `<a>` elements credit only up to the
  * first close; entities outside the basic six stay literal.
  */
object HtmlFunctions {

  /** Matches any block-level HTML tag, open or close. */
  private[graft] val blockTagPat =
    "(?i)</?(p|div|h1|h2|h3|h4|h5|h6|li|ul|ol|dl|dt|dd|table|thead|tbody" +
      "|tfoot|tr|td|th|blockquote|pre|section|article|header|footer|nav" +
      "|aside|main|form|fieldset|figure|figcaption|title|br|hr)\\b[^>]*>"

  /** The invisible-content patterns, applied in this order (part of the
    * contract: a comment inside a script dies with the script).
    */
  private[graft] val invisiblePats = Seq(
    "(?is)<script\\b[^>]*>.*?</script\\s*>",
    "(?is)<style\\b[^>]*>.*?</style\\s*>",
    "(?is)<noscript\\b[^>]*>.*?</noscript\\s*>",
    "(?s)<!--.*?-->",
    "(?s)<!\\[CDATA\\[.*?\\]\\]>")

  /** Step 1: remove content that never renders. */
  def dropInvisible(c: Column): Column =
    invisiblePats.foldLeft(c)((acc, p) => regexp_replace(acc, p, " "))

  /** Step 3a's decode steps, in application order (shared with the
    * oracle builder and [[graft.plans.HtmlBlocksExpr]] — all sides are
    * LITERAL `replace`, not regex): &amp; decodes LAST so double-encoded
    * text ("&amp;lt;") yields the literal entity text, not a tag — the
    * behavior of a single decoding pass.
    */
  private[graft] val entitySteps = Seq("&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
    "&amp;" -> "&")

  def decodeEntities(c: Column): Column =
    entitySteps.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }

  private def visibleText(c: Column): Column =
    TextFunctions.normalizeWs(
      decodeEntities(regexp_replace(c, "<[^>]*>", " ")))

  /** Steps 2–3: the per-block relation of one page —
    * array<struct<text, link_text>> over non-empty blocks, in document
    * order. Computed by the native single-pass scanner
    * ([[graft.plans.HtmlBlocksExpr]] — scan-speed at 100 TB, measured
    * ~5× the regex chain at bench scale); [[blocksReference]] defines
    * the semantics.
    */
  def blocks(c: Column): Column = graft.plans.HtmlBlocksExpr.htmlBlocks(c)

  /** The SEMANTIC REFERENCE for [[blocks]]: the pure regexp/HOF
    * composition — the function the DuckDB oracle mirrors clause for
    * clause, and the differential target ExtractSpec fuzzes
    * [[graft.plans.HtmlBlocksExpr]] against on random tag soup.
    * Interpreted and regex-bound, so the native scanner is the
    * production path.
    */
  private[graft] def blocksReference(c: Column): Column =
    filter(
      transform(
        // U+0001 is this composition's split sentinel -- strip it from
        // the RAW input, before any other stage (contract limit; the
        // native scanner and the oracle's chr(1) twin strip first too) so
        // raw bytes carrying the control char can't forge a spurious
        // block boundary OR smuggle a tag past the invisible drop (a
        // "<scr\u0001ipt>" reconstituting to "<script>" only after a
        // post-drop strip was exactly that divergence)
        split(regexp_replace(dropInvisible(replace(c, lit("\u0001"),
            lit(""))), blockTagPat, "\u0001"),
          "\u0001"),
        b => struct(
          visibleText(b).as("text"),
          visibleText(array_join(
            regexp_extract_all(b, lit("(?is)<a\\b[^>]*>(.*?)</a\\s*>"),
              lit(1)),
            " ")).as("link_text"))),
      s => length(s.getField("text")) > 0)

  /** ALL visible text of the page, block-joined with single spaces —
    * the plain "strip tags" form (no boilerplate judgment).
    */
  def stripHtml(c: Column): Column =
    array_join(transform(blocks(c), b => b.getField("text")), " ")

  /** Step 4: the boilerplate-free MAIN CONTENT of the page. Defaults:
    * 25 chars ≈ a short sentence (headings and footer crumbs drop),
    * 0.33 link density ≈ Arc90's navigation threshold.
    */
  def mainContent(c: Column, minChars: Int = 25,
                  maxLinkDensity: Double = 0.33): Column =
    array_join(
      transform(mainBlocks(c, minChars, maxLinkDensity),
        b => b.getField("text")), " ")

  /** The kept blocks themselves (for per-block reporting). */
  def mainBlocks(c: Column, minChars: Int = 25,
                 maxLinkDensity: Double = 0.33): Column =
    filter(blocks(c), b =>
      length(b.getField("text")) >= minChars &&
        length(b.getField("link_text")).cast("double") <=
          lit(maxLinkDensity) * length(b.getField("text")).cast("double"))

  // --------------------------------------------- robots-meta compliance

  /** The `content` attribute of the page's `<meta name="robots" …>`
    * tags, as lowercase trimmed directive tokens in document order —
    * stage −1.5 of a compliant crawl pipeline: a page that says
    * `noindex` must not enter the corpus regardless of its content
    * quality. Regex-level like the rest of this module (RE2-safe, the
    * oracle replays it): a meta tag whose attributes contain
    * `name = "robots"` (either quote style or bare, any case)
    * contributes the comma-split tokens of its `content = "…"` value;
    * pages with no robots meta yield an empty array. Directives are not
    * interpreted here — [[dropNoindex]] applies the one that gates
    * corpus membership.
    */
  def robotsDirectives(c: Column): Column = {
    val metas = regexp_extract_all(c, lit("(?is)<meta\\b[^>]*>"), lit(0))
    val robots = filter(metas, m => m.rlike(
      "(?is)\\bname\\s*=\\s*(\"robots\"|'robots'|robots\\b)"))
    val contents = transform(robots, m => regexp_extract(m,
      "(?is)\\bcontent\\s*=\\s*(?:\"([^\"]*)\"|'([^']*)'|([^\\s>]+))", 0))
    // re-extract the value from the matched attr text (group alternation
    // across quote styles — take the piece after '=' and strip quotes)
    val values = transform(contents, v =>
      trim(regexp_replace(regexp_replace(v,
        "(?is)^content\\s*=\\s*", ""), "^[\"']|[\"']$", "")))
    filter(
      transform(flatten(transform(values, v => split(v, ","))),
        t => lower(trim(t))),
      t => t =!= "")
  }

  /** Drop pages whose robots meta carries `noindex` — the corpus-
    * membership gate. `none` is the RFC 9309-adjacent shorthand for
    * `noindex, nofollow` and gates too.
    */
  def dropNoindex(df: org.apache.spark.sql.DataFrame,
                  htmlCol: String): org.apache.spark.sql.DataFrame = {
    val d = robotsDirectives(col(htmlCol))
    df.filter(!array_contains(d, "noindex") && !array_contains(d, "none"))
  }
}
