package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SitemapFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val urlset =
    """<?xml version="1.0"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url><loc> https://a/1 </loc><lastmod>2026-01-02</lastmod></url>
      |  <url><loc>https://a/2</loc></url>
      |  <url><lastmod>2026-01-03</lastmod></url>
      |</urlset>""".stripMargin

  private val index =
    """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <sitemap><loc>https://a/child.xml</loc></sitemap>
      |</sitemapindex>""".stripMargin

  test("urlset entries: loc trims, lastmod optional (null), loc-less " +
    "entries filter out; an index document has ZERO url blocks (the " +
    "one-level depth contract's mechanism)") {
    val got = Seq(urlset).toDF("xml")
      .select(explode(SitemapFunctions.urlBlocks(col("xml"))).as("b"))
      .select(SitemapFunctions.locOf(col("b")).as("loc"),
        SitemapFunctions.lastmodOf(col("b")).as("lastmod"))
      .where(col("loc") =!= "")
      .as[(String, Option[String])].collect().toSeq
    assert(got == Seq(("https://a/1", Some("2026-01-02")),
      ("https://a/2", None)))
    val idx = Seq(index).toDF("xml").select(
        size(SitemapFunctions.urlBlocks(col("xml"))).as("nu"),
        size(SitemapFunctions.indexBlocks(col("xml"))).as("ni"))
      .as[(Int, Int)].head()
    assert(idx == ((0, 1)))
  }

  test("xmlUnescape: the five protocol entities decode, ampersand last " +
    "(a double-escaped &amp;lt; yields the literal &lt;, like a parser)") {
    val got = Seq(
        "https://a/p?x=1&amp;y=2", "&lt;b&gt;", "&quot;q&quot;&apos;",
        "&amp;lt;", "plain")
      .toDF("s").select(SitemapFunctions.xmlUnescape(col("s")))
      .as[String].collect().toSeq
    assert(got == Seq("https://a/p?x=1&y=2", "<b>", "\"q\"'", "&lt;", "plain"))
    // and a <loc> carrying an escaped query decodes on extraction
    val loc = Seq("<url><loc>https://a/p?x=1&amp;y=2</loc></url>")
      .toDF("b").select(SitemapFunctions.locOf(col("b")))
      .as[String].head()
    assert(loc == "https://a/p?x=1&y=2")
  }

  test("staleBefore: period-end compare — full datetimes, the W3C " +
    "reduced-precision YYYY/YYYY-MM forms, and null lastmod NOT stale") {
    val got = Seq(Some("2026-01-02"), Some("2026-08-02T09:00:00+00:00"),
        Some("2025-12-31T23:59:59Z"), None,
        // reduced precision: a period OVERLAPPING the crawl date is
        // fresh (unknown month/day errs fresh), a fully-past one stale
        Some("2026"), Some("2025"), Some("2026-08"), Some("2026-07"))
      .toDF("lastmod")
      .select(SitemapFunctions.staleBefore(col("lastmod"), "2026-08-01"))
      .as[Boolean].collect().toSeq
    assert(got == Seq(true, false, true, false,
      false, true, false, true))
  }
}
