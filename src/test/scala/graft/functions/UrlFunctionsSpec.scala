package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization + registered-domain laws: hand-expected results
  * for every branch the t34-t36/q70 oracle fixture exercises, the
  * idempotence law, literal-vs-relation PSL equivalence, and blocklist
  * null semantics.
  */
class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: Seq[String]): Map[String, String] =
    urls.zipWithIndex.map(_.swap).toDF("id", "url")
      .select(col("url"), UrlFunctions.canonicalizeUrl(col("url")).as("c"))
      .as[(String, String)].collect().toMap

  test("canonicalizeUrl: case, ports, tracking params, fragments, paths") {
    val got = canon(Seq(
      "HTTPS://WWW.Example.COM:443/Path/1?utm_source=f&id=1&utm_campaign=x#top",
      "http://a.example.co.uk:80?ref=tw&q=2",
      "https://blog.example.io/post/3?gclid=abc",
      "http://u:p@h.example.com:8080/a?id=4&fbclid=z#f",
      "  ftp://Files.EXAMPLE.ORG/data/5  ",
      "not a url 6",
      "https://x.com/p?a=1&utm_x=2&b=3"))
    assert(got("HTTPS://WWW.Example.COM:443/Path/1?utm_source=f&id=1&utm_campaign=x#top")
      == "https://www.example.com/Path/1?id=1")
    assert(got("http://a.example.co.uk:80?ref=tw&q=2")
      == "http://a.example.co.uk/?q=2")
    assert(got("https://blog.example.io/post/3?gclid=abc")
      == "https://blog.example.io/post/3")
    assert(got("http://u:p@h.example.com:8080/a?id=4&fbclid=z#f")
      == "http://u:p@h.example.com:8080/a?id=4")
    assert(got("  ftp://Files.EXAMPLE.ORG/data/5  ")
      == "ftp://files.example.org/data/5")
    assert(got("not a url 6") == "not a url 6")
    // param ORDER is preserved around a stripped middle param
    assert(got("https://x.com/p?a=1&utm_x=2&b=3") == "https://x.com/p?a=1&b=3")
  }

  test("canonicalizeUrl is idempotent") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/Path/1?utm_source=f&id=1#top",
      "http://a.example.co.uk:80?ref=tw&q=2",
      "https://blog.example.io/post/3?gclid=abc",
      "  ftp://Files.EXAMPLE.ORG/data/5  ",
      "not a url 6")
    val once = canon(urls)
    val twice = canon(once.values.toSeq)
    once.values.foreach(c => assert(twice(c) == c, s"not a fixpoint: $c"))
  }

  test("hostOf strips userinfo and port, lowercases; empty for non-URLs") {
    val got = Seq(
      (1, "http://u:p@H.Example.COM:8080/a"),
      (2, "https://plain.example.org"),
      (3, "nope"),
      // RFC 3986: the LAST '@' delimits userinfo ('@' may occur inside it)
      (4, "http://u@p@Host.Example.com/x"),
      // bracketed IPv6 literals keep brackets, port after ']' stripped
      (5, "http://[2001:DB8::1]:8080/x"),
      (6, "https://admin@[::1]/y")).toDF("id", "url")
      .select(col("id"), UrlFunctions.hostOf(col("url")).as("h"))
      .as[(Int, String)].collect().toMap
    assert(got(1) == "h.example.com")
    assert(got(2) == "plain.example.org")
    assert(got(3) == "")
    assert(got(4) == "host.example.com")
    assert(got(5) == "[2001:db8::1]")
    assert(got(6) == "[::1]")
  }

  test("canonicalizeUrl strips VALUELESS tracking params too") {
    val got = canon(Seq(
      "https://x.com/p?ref",
      "https://x.com/p?ref&a=1",
      "https://x.com/p?a=1&utm_source&b=2",
      "https://x.com/p?refx=1")) // refx is NOT ref — must survive
    assert(got("https://x.com/p?ref") == "https://x.com/p")
    assert(got("https://x.com/p?ref&a=1") == "https://x.com/p?a=1")
    assert(got("https://x.com/p?a=1&utm_source&b=2") == "https://x.com/p?a=1&b=2")
    assert(got("https://x.com/p?refx=1") == "https://x.com/p?refx=1")
  }

  private val psl = Seq("com", "org", "io", "co.uk", "github.io", "uk")

  test("registeredDomain: longest suffix wins, unlisted TLD falls back, " +
      "suffix-only and single-label hosts yield null") {
    val got = Seq(
      (1, "www.site.example.com"),
      (2, "a.b.example.co.uk"),    // co.uk beats uk
      (3, "blog.user.github.io"),  // github.io beats io
      (4, "host.example.xyz"),     // unlisted TLD -> last label
      (5, "co.uk"),                // host IS a suffix
      (6, "localhost"),            // single label
      (7, "")).toDF("id", "host")
      .select(col("id"),
        UrlFunctions.registeredDomain(col("host"), psl).as("d"))
      .as[(Int, Option[String])].collect().toMap
    assert(got(1).contains("example.com"))
    assert(got(2).contains("example.co.uk"))
    assert(got(3).contains("user.github.io"))
    assert(got(4).contains("example.xyz"))
    assert(got(5).isEmpty)
    assert(got(6).isEmpty)
    assert(got(7).isEmpty)
  }

  test("registeredDomainAgainst (relation PSL) equals the literal form") {
    val hosts = Seq(
      (1L, "www.site.example.com"), (2L, "a.b.example.co.uk"),
      (3L, "blog.user.github.io"), (4L, "host.example.xyz"),
      (5L, "co.uk"), (6L, "localhost"), (7L, ""))
      .toDF("id", "host")
    val viaLit = hosts
      .withColumn("domain", UrlFunctions.registeredDomain(col("host"), psl))
      .select("id", "host", "domain")
    val viaRel = UrlFunctions.registeredDomainAgainst(
      hosts, "id", "host", psl.toDF("suffix"))
      .select("id", "host", "domain")
    assert(viaLit.exceptAll(viaRel).isEmpty && viaRel.exceptAll(viaLit).isEmpty,
      "literal and relation PSL paths must agree row-for-row")
  }

  test("property: registeredDomain equals a driver-side PSL reference " +
      "over random hosts") {
    def ref(host: String, suffixes: Set[String]): Option[String] = {
      val labels = host.split("\\.", -1)
      val n = labels.length
      val best = (1 to n).filter(k =>
        suffixes.contains(labels.takeRight(k).mkString("."))).maxOption
      val psl = best.getOrElse(1)
      if (n > psl) Some(labels.takeRight(psl + 1).mkString(".")) else None
    }
    val rnd = new scala.util.Random(20260814L)
    val parts = Seq("a", "bb", "co", "uk", "com", "io", "github",
      "example", "www", "x1")
    val hosts = Seq.tabulate(300) { i =>
      val n = 1 + rnd.nextInt(5)
      (i.toLong, Seq.fill(n)(parts(rnd.nextInt(parts.length))).mkString("."))
    }
    val want = hosts.map { case (i, h) => i -> ref(h, psl.toSet) }.toMap
    val got = hosts.toDF("id", "host")
      .select(col("id"),
        UrlFunctions.registeredDomain(col("host"), psl).as("d"))
      .as[(Long, Option[String])].collect().toMap
    hosts.foreach { case (i, h) =>
      assert(got(i) == want(i), s"host '$h': got ${got(i)} want ${want(i)}")
    }
  }

  test("registeredDomainAgainst: PSL wildcard and exception rules " +
      "(publicsuffix.org algorithm)") {
    val rules = Seq("com", "dev", "ck", "*.ck", "!www.ck", "*.platform.dev")
      .toDF("suffix")
    val hosts = Seq(
      (1L, "site.users.platform.dev"), // registrant under a wildcard suffix
      (2L, "www.ck"),                  // the exception host itself
      (3L, "a.www.ck"),                // registrant UNDER the exception host
      (4L, "b.cdn.ck"),                // plain wildcard registrant
      (5L, "c.example.com"),           // plain rule registrant
      (6L, "users.platform.dev"),      // host IS a wildcard public suffix
      (7L, "cdn.ck"),                  // likewise, one level down
      (8L, "ck"))                      // bare wildcard base: psl fallback 1
      .toDF("id", "host")
    val got = UrlFunctions.registeredDomainAgainst(
        hosts, "id", "host", rules)
      .select("id", "domain").as[(Long, Option[String])].collect().toMap
    assert(got(1L).contains("site.users.platform.dev"))
    assert(got(2L).contains("www.ck"),
      "!www.ck must override *.ck: www.ck IS the registered domain")
    assert(got(3L).contains("www.ck"))
    assert(got(4L).contains("b.cdn.ck"))
    assert(got(5L).contains("example.com"))
    assert(got(6L).isEmpty, "a wildcard public suffix has no registrant")
    assert(got(7L).isEmpty)
    assert(got(8L).isEmpty)
  }

  test("pslRules parses raw publicsuffix.org lines into the suffix relation") {
    val raw = Seq(
      "// ===BEGIN ICANN DOMAINS===",
      "",
      "com",
      "  co.uk  ",
      "*.ck",
      "!www.ck",
      "BLOGSPOT.com  // trailing junk after whitespace is ignored",
      "   ",
      "// comment").toDF("value")
    val got = UrlFunctions.pslRules(raw).as[String].collect().toSeq
    assert(got == Seq("com", "co.uk", "*.ck", "!www.ck", "blogspot.com"))
    // and the parsed relation drives the matcher end to end
    val dom = UrlFunctions.registeredDomainAgainst(
        Seq((1L, "a.b.ck"), (2L, "x.www.ck")).toDF("id", "host"),
        "id", "host", UrlFunctions.pslRules(raw))
      .select("id", "domain").as[(Long, Option[String])].collect().toMap
    assert(dom(1L).contains("a.b.ck")) // *.ck: b.ck is the public suffix
    assert(dom(2L).contains("www.ck")) // !www.ck overrides the wildcard
  }

  test("dropBlockedDomains: blocked rows go, null domains survive") {
    val rows = Seq(
      (1L, Some("bad.com")), (2L, Some("good.org")), (3L, None))
      .toDF("id", "domain")
    val kept = UrlFunctions.dropBlockedDomains(rows, "domain",
        Seq("bad.com").toDF("domain"))
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L))
  }

  // ------------------------------------------------------- robots.txt

  /** Parse `txt` for `agent` through the COLUMN path (codegen exercised)
    * and return the applicable rules in document order.
    */
  private def rules(txt: String, agent: String): Seq[(String, Boolean)] =
    Seq(txt).toDF("t")
      .select(UrlFunctions.robotsRules(col("t"), lit(agent)).as("r"))
      .as[Seq[(String, Boolean)]].head()

  /** Decide `target` under `txt` for `agent`: (allowed, winning pattern). */
  private def decide(txt: String, agent: String,
                     target: String): (Boolean, Option[String]) =
    Seq(txt).toDF("t")
      .select(UrlFunctions.robotsDecision(
        UrlFunctions.robotsRules(col("t"), lit(agent)), lit(target)).as("d"))
      .select(col("d.allowed"), col("d.pattern"))
      .as[(Boolean, Option[String])].head()

  test("robots: RFC 9309 group selection — exact, prefix, *, merging, " +
    "consecutive UA lines, headerless rules ignored") {
    val txt =
      """# global
        |Disallow: /orphan      # before any user-agent: no group, ignored
        |User-Agent: *
        |Disallow: /all/
        |
        |user-agent: examplebot
        |user-agent: otherbot
        |Allow: /shared/
        |Sitemap: https://ex.org/sitemap.xml
        |
        |USER-AGENT: ExampleBot
        |Disallow: /eb/
        |
        |user-agent: examplebot-news
        |Disallow: /news-only/
        |""".stripMargin
    // exact token: the two `examplebot` groups MERGE; * and the more
    // specific examplebot-news group do not contribute
    assert(rules(txt, "ExampleBot") ==
      Seq(("/shared/", true), ("/eb/", false)))
    // most-specific wins: examplebot-news beats the examplebot prefix
    assert(rules(txt, "examplebot-news") == Seq(("/news-only/", false)))
    // prefix governs a longer product token with no exact group
    assert(rules(txt, "otherbot-images") == Seq(("/shared/", true)))
    // unknown agent falls back to *
    assert(rules(txt, "strangerbot") == Seq(("/all/", false)))
    // the headerless /orphan rule reached no group at all
    assert(!rules(txt, "strangerbot").exists(_._1 == "/orphan"))
  }

  test("robots: §2.2.2 longest match wins; length tie goes to allow") {
    // the RFC's own longest-match shape: a general allow with a more
    // specific (longer) disallow under it
    val txt =
      """user-agent: *
        |allow: /example/page/
        |disallow: /example/page/disallowed.gif
        |""".stripMargin
    assert(decide(txt, "bot", "/example/page/disallowed.gif") ==
      ((false, Some("/example/page/disallowed.gif"))))
    assert(decide(txt, "bot", "/example/page/index.html") ==
      ((true, Some("/example/page/"))))
    // equivalent-length allow and disallow: allow SHOULD be used
    val tie = "user-agent: *\nallow: /page\ndisallow: /page\n"
    assert(decide(tie, "bot", "/page/x") == ((true, Some("/page"))))
  }

  test("robots: §2.2.3 special characters — * wildcard, trailing $ anchor, " +
    "literal $ elsewhere, literal ? in patterns") {
    val txt =
      """user-agent: *
        |disallow: /foo/*bar
        |disallow: /exact$
        |disallow: /a$b
        |disallow: /q?x=1
        |""".stripMargin
    // * spans any run, including empty and multi-segment
    assert(!decide(txt, "bot", "/foo/bar")._1)
    assert(!decide(txt, "bot", "/foo/xyzbar")._1)
    assert(!decide(txt, "bot", "/foo/x/y/bar-and-more")._1)
    assert(decide(txt, "bot", "/foo/ba")._1)
    // trailing $ anchors: /exact only, not /exact/sub
    assert(!decide(txt, "bot", "/exact")._1)
    assert(decide(txt, "bot", "/exact/sub")._1)
    // $ mid-pattern is a literal octet
    assert(!decide(txt, "bot", "/a$b-rest")._1)
    assert(decide(txt, "bot", "/ab")._1)
    // ? in a pattern matches the query part of the target literally
    assert(!decide(txt, "bot", "/q?x=1")._1)
    assert(decide(txt, "bot", "/q?x=2")._1)
    // * with trailing $: suffix-pinned patterns
    val gif = "user-agent: *\ndisallow: /*.gif$\n"
    assert(!decide(gif, "bot", "/img/x.gif")._1)
    assert(decide(gif, "bot", "/img/x.gifx")._1)
  }

  test("robots: empty Disallow allows all; no rules / no match allow with " +
    "null pattern; disallow / blocks everything; BOM and case tolerated") {
    val empty = "user-agent: *\ndisallow:\n"
    assert(decide(empty, "bot", "/anything") == ((true, None)))
    assert(decide("# only comments\n", "bot", "/x") == ((true, None)))
    val blockAll = "﻿User-Agent: *\nDISALLOW: /\n"
    assert(decide(blockAll, "bot", "/") == ((false, Some("/"))))
    assert(decide(blockAll, "bot", "/deep/path?q=1") == ((false, Some("/"))))
    // patterns are case-sensitive even though keys/tokens are not
    val cased = "user-agent: *\ndisallow: /Case\n"
    assert(!decide(cased, "bot", "/CaseStudy")._1)
    assert(decide(cased, "bot", "/casestudy")._1)
  }

  test("robotsSitemaps: case-insensitive key, comment strip, trim, " +
    "non-sitemap and empty-value lines contribute nothing") {
    val txt = "User-agent: *\nDisallow: /x\n" +
      "Sitemap: https://a/s1.xml   # discovery\n" +
      "SITEMAP:https://a/s2.xml\r\n" + // CRLF line: \r trims off
      "sitemap:\n" +                    // empty value drops
      "# sitemap: https://a/commented.xml\n" +
      "sitemapx: https://a/not-a-key.xml\n"
    val got = Seq(txt).toDF("t")
      .select(UrlFunctions.robotsSitemaps(col("t"))).as[Seq[String]].head()
    assert(got == Seq("https://a/s1.xml", "https://a/s2.xml"))
  }

  test("robots: specificity is measured in CODE POINTS and ties break by " +
    "code-point order (non-BMP patterns)") {
    // A = U+E000 (1 UTF-16 unit), B = U+10000 (a surrogate pair, 2 UTF-16
    // units). Both patterns are 2 code points; UTF-16 ranks B's length
    // higher AND its first surrogate (0xD800) below 0xE000 — either
    // mistake makes B win. Code points: equal length, tie to the
    // code-point-least pattern = A (0xE000 < 0x10000), matching the
    // external replay's length() + binary collation.
    val a = "*"
    val b = "*𐀀"
    val txt = s"user-agent: *\ndisallow: $a\ndisallow: $b\n"
    val target = "/𐀀"
    assert(decide(txt, "bot", target) == ((false, Some(a))))
  }

  test("robotsGate refuses an input that already carries '__rules'") {
    val docs = Seq((1L, "https://a.com/x", "a.com", "boom"))
      .toDF("id", "url", "domain", "__rules")
    val robots = Seq(("a.com", "user-agent: *\ndisallow: /\n"))
      .toDF("domain", "robots_txt")
    val e = intercept[IllegalArgumentException] {
      UrlFunctions.robotsGate(docs, "url", "domain", robots, "graftbot")
    }
    assert(e.getMessage.contains("__rules"))
  }

  test("robots: pathQueryOf extracts the match target; robotsGate keeps " +
    "allowed rows and passes robots-less domains") {
    val t = Seq("https://Ex.org/A/b?q=1&r=2#frag", "http://ex.org", "junk",
      "https://a.com/p?") // bare trailing ? = empty query, drops (the
      // same normalization the external replay computes)
      .toDF("url")
      .select(UrlFunctions.pathQueryOf(col("url"))).as[String].collect()
    assert(t.toSeq == Seq("/A/b?q=1&r=2", "/", "/", "/p"))
    val docs = Seq(
      (1L, "https://a.com/keep/1", "a.com"),
      (2L, "https://a.com/private/2", "a.com"),
      (3L, "https://a.com/private/pub", "a.com"),
      (4L, "https://norobots.net/x", "norobots.net"),
      (5L, "junk", null),
      // a NULL url under a domain that HAS rules: the permissive gate
      // must PASS it (SQL three-valued logic silently dropped it before)
      (6L, null, "a.com")).toDF("id", "url", "domain")
    val robots = Seq(
      ("a.com",
        "user-agent: graftbot\ndisallow: /private/\nallow: /private/pub\n" +
          "user-agent: *\ndisallow: /\n"))
      .toDF("domain", "robots_txt")
    val kept = UrlFunctions.robotsGate(docs, "url", "domain", robots,
        "graftbot")
      .select("id").as[Long].collect().sorted.toSeq
    // 1 allowed (no match), 2 disallowed, 3 allowed (longer allow),
    // 4 no robots → pass, 5 null domain → pass, 6 null url → pass
    assert(kept == Seq(1L, 3L, 4L, 5L, 6L))
  }
}
