package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adversarial fixtures for [[HtmlFunctions]] — the regex-level HTML
  * contract under hostile markup: nested tags, comments hiding tags,
  * CDATA, script/style bodies containing comparison operators and
  * string-literal tags, uppercase tags, nested anchors, double-encoded
  * entities, and malformed input (unclosed tags, bare `<`). Each case
  * asserts the DOCUMENTED semantics, including the documented limits.
  */
class ExtractSpec extends SparkSpec {
  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h").select(HtmlFunctions.stripHtml(col("h")))
      .as[String].head()

  private def main(html: String, minChars: Int = 25,
                   density: Double = 0.33): String =
    Seq(html).toDF("h")
      .select(HtmlFunctions.mainContent(col("h"), minChars, density))
      .as[String].head()

  test("script/style/noscript bodies vanish, even with operators and fake tags") {
    val h = "<p>Real content stays here</p>" +
      "<script>if (a < b && b > c) { d.write(\"<p>fake</p>\"); }</script>" +
      "<style>p { color: red } /* <div>styled</div> */</style>" +
      "<NOSCRIPT><p>enable js</p></NOSCRIPT>"
    assert(strip(h) == "Real content stays here")
  }

  test("comments and CDATA vanish, including tags hidden inside them") {
    val h = "<p>kept</p><!-- <p>commented out</p> --><![CDATA[ <p>cdata</p> ]]>"
    assert(strip(h) == "kept")
  }

  test("nested inline tags flatten to their text; block tags split blocks") {
    val h = "<div><p>A <b>bold <i>ital</i></b> tail</p></div><p>Second</p>"
    assert(strip(h) == "A bold ital tail Second")
  }

  test("uppercase and attribute-laden tags are tags") {
    val h = "<P CLASS=\"x\">One</P><DIV data-y='z'>Two</DIV>"
    assert(strip(h) == "One Two")
  }

  test("entities decode once: double-encoded stays literal entity text") {
    val h = "<p>a &lt; b &amp; c &amp;lt; d &quot;q&quot; &nbsp;e</p>"
    assert(strip(h) == "a < b & c &lt; d \"q\" e")
  }

  test("link-density rule drops navigation but keeps linked prose") {
    val nav = "<ul><li><a href=\"/\">Home page link</a></li>" +
      "<li><a href=\"/x\">Another navigation link</a></li></ul>"
    val prose = "<p>This paragraph is long enough to keep and has " +
      "one <a href=\"/r\">small link</a> inside a lot of plain text.</p>"
    assert(main(nav + prose) == "This paragraph is long enough to keep " +
      "and has one small link inside a lot of plain text.")
  }

  test("minChars drops short blocks (headings, footer crumbs) regardless of links") {
    val h = "<h1>Big Title</h1><p>Body text long enough to clear the " +
      "twenty-five character floor.</p><footer>c 2026</footer>"
    assert(main(h) == "Body text long enough to clear the " +
      "twenty-five character floor.")
  }

  test("no kept blocks yields the empty string, not null") {
    assert(main("<p>tiny</p>") == "")
    assert(main("") == "")
  }

  test("nested anchors credit link text to the first close (documented limit)") {
    // "<a>x <a>y</a> z</a>": the lazy match ends at the FIRST </a>, so
    // link text is "x y"; "z" counts as plain text
    val h = "<p>Some sufficiently long paddings here <a href=\"/o\">x " +
      "<a href=\"/i\">y</a> z</a> and more plain text words follow</p>"
    val texts = Seq(h).toDF("h")
      .select(HtmlFunctions.blocks(col("h")).getItem(0).getField("link_text"))
      .as[String].head()
    assert(texts == "x y")
  }

  test("malformed markup: unclosed trailing tag stays literal; bare < is text") {
    assert(strip("<p>open <div") == "open <div")
    assert(strip("<p>a < b and c > d</p>") == "a d")
    // ^ documented limit: a bare "<" opens a pseudo-tag to the next ">"
    assert(strip("<p>price < 100 with no closing angle") ==
      "price < 100 with no closing angle")
  }

  test("attribute value containing '>' ends the tag early (documented limit)") {
    assert(strip("<p title=\"a > b\">body text</p>") == "b\">body text")
  }

  test("robotsDirectives: quote styles, case, multiple metas, comma splits; dropNoindex gates") {
    def dirs(html: String): Seq[String] =
      Seq(html).toDF("h")
        .select(HtmlFunctions.robotsDirectives(col("h"))).as[Seq[String]]
        .head()
    assert(dirs("""<meta name="robots" content="noindex, follow">""") ==
      Seq("noindex", "follow"))
    assert(dirs("""<META NAME='ROBOTS' CONTENT='NOFOLLOW , NOARCHIVE'>""") ==
      Seq("nofollow", "noarchive"))
    assert(dirs("<meta name=robots content=none>") == Seq("none"))
    // non-robots metas contribute nothing; multiple robots metas append
    assert(dirs("""<meta name="viewport" content="w"><meta name="robots"
      content="noindex"><meta name=robots content="nofollow">""") ==
      Seq("noindex", "nofollow"))
    assert(dirs("<p>no meta at all</p>") == Seq.empty)
    // content before name, content missing
    assert(dirs("""<meta content="noindex" name="robots">""") ==
      Seq("noindex"))
    assert(dirs("""<meta name="robots">""") == Seq.empty)
    val docs = Seq(
      (1L, """<head><meta name="robots" content="noindex"></head>x"""),
      (2L, """<head><meta name="robots" content="nofollow"></head>x"""),
      (3L, "<head><meta name=robots content=none></head>x"),
      (4L, "<head></head>x")).toDF("id", "h")
    assert(HtmlFunctions.dropNoindex(docs, "h").select("id").as[Long]
      .collect().toSet == Set(2L, 4L))
  }

  test("differential law: HtmlBlocksExpr equals the regex reference on random tag soup") {
    // the native scanner must compute the IDENTICAL function as the
    // regexp/HOF composition the oracle mirrors — fuzz both over hostile
    // fragments: unclosed elements, stray brackets, nested/uppercase
    // tags, entities (incl. double-encoded), comments/CDATA with tags
    // inside, whitespace variety in closers
    val rnd = new scala.util.Random(20260817L)
    val pieces = Vector(
      "<p>", "</p>", "<DIV class=\"x\">", "</div>", "<li>", "</LI>",
      "<br>", "<hr/>", "<title>", "</title>",
      "<a href=\"/x\">", "</a>", "</a >", "<A>", "<a",
      "<script>", "</script>", "<script type=\"t\">", "</script >",
      "<style>", "</style>", "<!--", "-->", "<![CDATA[", "]]>",
      "<b>", "</b>", "<span>", "<spanx>", "<", ">", "</",
      "&lt;", "&amp;", "&amp;lt;", "&quot;", "&nbsp;", "&#39;", "&bogus;",
      "plain words here", "x < y", "a > b", "  ", "\n", "\t", "tok",
      "\u0001", "a\u0001b", // the sentinel contract: stripped, never splits
      // sentinel INSIDE tag names/structure: the raw-input strip must
      // reconstitute these to real tags identically in scanner + reference
      "<scr\u0001ipt>", "</scr\u0001ipt>", "<p\u0001>", "<\u0001p>",
      "<!\u0001--", "-\u0001->",
      // Unicode tag soup: Java \b is Unicode-aware (\u00e9 is a word
      // char, so `</?p\b` must NOT split at <p\u00e9>) while (?i) folds
      // ASCII only — the scanner's hand-rolled \b and case fold must
      // agree with both
      "<p\u00e9>", "</p\u00e9>", "<div\u00e9>x</div\u00e9>",
      "<scr\u00edpt>", "<P\u0130>", "w\u00f6rds \u00fcber pr\u00f8se",
      // astral-plane tag soup: Java \b matches CODE POINTS, so a
      // supplementary-plane letter after a tag name (<p\ud835\udd61>) is a word
      // char (no boundary, no split) even though each surrogate HALF is
      // not a letter to Character.isLetterOrDigit(Char) \u2014 the scanner
      // must read codePointAt and step surrogate pairs to agree
      "<p\ud835\udd61>", "</p\ud835\udd61>",
      "<div\ud835\udd65>x</div\ud835\udd65>", "<li\ud835\udd5a>",
      "<scr\ud835\udd5aipt>", "\ud835\udd68\ud835\udd60rds \ud83d\ude00",
      "longer run of ordinary prose to pass length gates sometimes")
    val htmls = (1 to 400).map { _ =>
      (0 until rnd.nextInt(18)).map(_ => pieces(rnd.nextInt(pieces.size)))
        .mkString(" ")
    }
    val both = htmls.toDF("h").select(
      HtmlFunctions.blocks(col("h")).as("fast"),
      HtmlFunctions.blocksReference(col("h")).as("ref"))
      .as[(Seq[(String, String)], Seq[(String, String)])].collect()
    both.zip(htmls).foreach { case ((fast, ref), h) =>
      assert(fast == ref, s"diverged on: $h")
    }
  }

  test("br/hr/title are block boundaries; title text is its own block") {
    val h = "<title>Site</title><p>line one<br>line two</p>"
    val blocks = Seq(h).toDF("h")
      .select(transform(HtmlFunctions.blocks(col("h")),
        b => b.getField("text")))
      .as[Seq[String]].head()
    assert(blocks == Seq("Site", "line one", "line two"))
  }
}
