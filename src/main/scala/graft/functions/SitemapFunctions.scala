package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sitemap XML ingestion (sitemaps.org protocol, the document family
  * robots.txt `Sitemap:` records point at — the discovery half is
  * [[UrlFunctions.robotsSitemaps]] / t53): `<urlset>` documents carry
  * `<url>` entries, `<sitemapindex>` documents carry `<sitemap>`
  * pointers at child sitemaps, and each entry's payload is a `<loc>`
  * (required) plus optional `<lastmod>` (W3C datetime). Reference
  * analogue: none — this is the crawl-chain extension surface; the
  * protocol is the published one at sitemaps.org/protocol.html.
  *
  * DEPTH CONTRACT (executable, not aspirational): the protocol forbids
  * an index from listing another index ("Sitemap index files may not
  * list other Sitemap index files"), so ingestion expands EXACTLY one
  * index level — a child that is itself an index yields no `<url>`
  * blocks and contributes nothing, which also makes a self-referencing
  * index a no-op instead of a recursion bomb.
  *
  * Everything here is pure column regex algebra — RE2-safe patterns
  * (non-greedy, `(?s)`, no backrefs), so the extraction runs codegen'd
  * in the scan stage at 100 TB and an external engine (the DuckDB
  * oracle) replays it byte-for-byte. A full XML parser is deliberately
  * NOT the tool: sitemap entries are a flat element list with no
  * attribute/namespace semantics to honor, and the regex form keeps the
  * whole decode on the oracle-replayable column path.
  */
object SitemapFunctions {

  /** Inner text of every `<tag>...</tag>` block, document order. */
  def blocks(xml: Column, tag: String): Column =
    regexp_extract_all(xml, lit(s"(?s)<$tag>(.*?)</$tag>"), lit(1))

  /** The `<url>` entry blocks of a urlset document (empty array for an
    * index — the depth contract's mechanism).
    */
  def urlBlocks(xml: Column): Column = blocks(xml, "url")

  /** The `<sitemap>` child-pointer blocks of an index document. */
  def indexBlocks(xml: Column): Column = blocks(xml, "sitemap")

  /** Undo the five predefined XML entity escapes the protocol REQUIRES
    * for data values (`&amp;` etc. — a URL with a query string cannot
    * legally appear unescaped in a `<loc>`). `&amp;` decodes LAST so a
    * double-escaped `&amp;lt;` yields the literal `&lt;` like a real
    * XML parser. Numeric character references are out of scope (the
    * protocol's own escaping table is exactly these five).
    */
  def xmlUnescape(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(c, "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&apos;", "'"),
      "&amp;", "&")

  /** The whitespace-trimmed, entity-unescaped `<loc>` of one entry block
    * ("" when absent — a loc-less entry is invalid per the protocol and
    * filters out).
    */
  def locOf(block: Column): Column =
    xmlUnescape(regexp_extract(block, "(?s)<loc>\\s*(.*?)\\s*</loc>", 1))

  /** The trimmed `<lastmod>` of one entry block; null when absent or
    * empty (the element is optional).
    */
  def lastmodOf(block: Column): Column = {
    val m = regexp_extract(block, "(?s)<lastmod>\\s*(.*?)\\s*</lastmod>", 1)
    when(m =!= "", m)
  }

  /** Freshness against a crawl date: true iff a lastmod exists and its
    * whole PERIOD ends before `crawlDate` (a 'YYYY-MM-DD' literal). The
    * W3C Datetime profile sitemaps.org cites allows reduced precision —
    * bare `YYYY` and `YYYY-MM` — so the date prefix pads to the period's
    * END ('2026' → '2026-12-31', '2026-08' → '2026-08-31'; day 31 over-
    * covers short months, erring fresh) before the lexicographic
    * compare: a reduced-precision lastmod that merely OVERLAPS the
    * crawl period is not stale, matching the module's
    * unknown-is-not-stale posture. Full datetimes compare at CALENDAR-
    * DATE precision in the lastmod's OWN offset (the publisher's
    * calendar, as written) — a zoned instant within its offset of
    * midnight classifies by its local date, a ≤1-day skew freshness
    * scheduling tolerates by design; converting to the crawl zone would
    * trade it for the inverse skew, not remove it. No lastmod → false.
    */
  def staleBefore(lastmod: Column, crawlDate: String): Column = {
    val p = substring(lastmod, 1, 10)
    val periodEnd = when(length(p) === 4, concat(p, lit("-12-31")))
      .when(length(p) === 7, concat(p, lit("-31")))
      .otherwise(p)
    coalesce(periodEnd < crawlDate, lit(false))
  }
}
