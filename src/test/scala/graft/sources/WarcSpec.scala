package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[WarcSource]] / [[graft.plans.WarcRecordsExpr]] under well-formed,
  * adversarial and compressed WARC bytes: round-trip through the
  * distributed writer, hand-built multi-record members with malformed
  * regions (garbage at a boundary, bad Content-Length, truncation),
  * resync after quarantine, gzip members, non-response records.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("warc").toString

  private def writeBytes(dir: String, name: String, b: Array[Byte]): Unit = {
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"), b)
  }

  // the production envelope renderer — the spec must exercise the SAME
  // layout src22 stages, not a hand-kept copy that could drift
  private def record(uri: String, ts: String, html: String,
                     status: Int = 200): String =
    WarcSource.responseRecordString(uri, ts, html, status)

  private def warcinfo(text: String): String =
    s"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: " +
      s"application/warc-fields\r\nContent-Length: " +
      s"${text.getBytes("UTF-8").length}\r\n\r\n$text\r\n\r\n"

  test("distributed writeWarc → read round-trips every page") {
    val dir = tmp()
    val pages = (1 to 57).map(i =>
      (s"https://ex.org/p$i", s"2026-08-0${i % 9 + 1}T00:00:00Z",
        s"<html><body><p>doc $i ünïcode €</p></body></html>"))
      .toDF("uri", "ts", "html").repartition(4)
    WarcSource.writeWarc(pages, "uri", "ts", "html", s"$dir/w")
    val back = WarcSource.read(spark, s"$dir/w")
    assert(WarcSource.quarantined(back).count() == 0)
    val got = WarcSource.good(back)
      .select(col("target_uri"), col("fetch_ts"),
        decode(col("body"), "UTF-8"))
      .as[(String, String, String)].collect().toSet
    val want = pages.as[(String, String, String)].collect().toSet
    assert(got == want)
    // every clean record is a 200 HTML response
    assert(WarcSource.good(back)
      .filter(col("status") === 200 &&
        col("content_type") === "text/html; charset=utf-8")
      .count() == 57)
  }

  test("multi-record member: records parse in order with growing offsets") {
    val dir = tmp()
    val bytes = (record("https://a/1", "2026-01-01T00:00:00Z", "<p>one</p>") +
      record("https://a/2", "2026-01-02T00:00:00Z", "<p>two</p>") +
      record("https://a/3", "2026-01-03T00:00:00Z", "<p>three</p>"))
      .getBytes("UTF-8")
    writeBytes(dir, "m.warc", bytes)
    val rows = WarcSource.read(spark, dir)
      .orderBy("offset")
      .select(col("offset"), col("target_uri"), decode(col("body"), "UTF-8"))
      .as[(Long, String, String)].collect()
    assert(rows.map(_._2).toSeq ==
      Seq("https://a/1", "https://a/2", "https://a/3"))
    assert(rows.map(_._3).toSeq == Seq("<p>one</p>", "<p>two</p>", "<p>three</p>"))
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq &&
      rows.map(_._1).distinct.length == 3)
  }

  test("garbage at a record boundary quarantines WITH raw bytes and resyncs") {
    val dir = tmp()
    val garbage = "NOT A WARC RECORD AT ALL\r\n\r\n"
    val bytes = (record("https://a/1", "2026-01-01T00:00:00Z", "<p>ok</p>") +
      garbage +
      record("https://a/2", "2026-01-02T00:00:00Z", "<p>after</p>"))
      .getBytes("UTF-8")
    writeBytes(dir, "m.warc", bytes)
    val all = WarcSource.read(spark, dir).orderBy("offset")
    val bad = WarcSource.quarantined(all)
      .select(col("error"), decode(col("body"), "UTF-8"))
      .as[(String, String)].collect()
    assert(bad.length == 1)
    assert(bad.head._1.contains("no WARC/ magic"))
    assert(bad.head._2 == garbage) // the raw region, byte for byte
    // the record AFTER the garbage still parses
    assert(WarcSource.good(all).select("target_uri").as[String]
      .collect().toSeq == Seq("https://a/1", "https://a/2"))
  }

  test("bad Content-Length quarantines the record and resyncs at the next magic") {
    val dir = tmp()
    val broken = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://bad/x\r\nContent-Length: banana\r\n\r\n" +
      "<p>unframed payload</p>\r\n\r\n"
    val bytes = (broken +
      record("https://a/2", "2026-01-02T00:00:00Z", "<p>after</p>"))
      .getBytes("UTF-8")
    writeBytes(dir, "m.warc", bytes)
    val all = WarcSource.read(spark, dir).orderBy("offset")
    val bad = WarcSource.quarantined(all)
      .select(col("error"), col("target_uri"), decode(col("body"), "UTF-8"))
      .as[(String, String, String)].collect()
    assert(bad.length == 1)
    assert(bad.head._1.contains("Content-Length"))
    assert(bad.head._2 == "https://bad/x") // parsed headers still surfaced
    assert(bad.head._3 == broken)
    assert(WarcSource.good(all).select("target_uri").as[String]
      .collect().toSeq == Seq("https://a/2"))
  }

  test("truncated payload quarantines the tail; missing header terminator too") {
    val dir = tmp()
    val full = record("https://a/1", "2026-01-01T00:00:00Z", "<p>whole</p>")
    val truncated = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://a/2\r\nContent-Length: 99999\r\n\r\nshort"
    writeBytes(dir, "m.warc", (full + truncated).getBytes("UTF-8"))
    val all = WarcSource.read(spark, dir).orderBy("offset")
    val bad = WarcSource.quarantined(all)
      .select("error", "target_uri").as[(String, String)].collect()
    assert(bad.length == 1 && bad.head._1.contains("truncated") &&
      bad.head._2 == "https://a/2")
    assert(WarcSource.good(all).count() == 1)

    val dir2 = tmp()
    writeBytes(dir2, "m.warc",
      "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 3".getBytes("UTF-8"))
    val bad2 = WarcSource.quarantined(WarcSource.read(spark, dir2))
      .select("error").as[String].collect()
    assert(bad2.length == 1 && bad2.head.contains("not terminated"))
  }

  test("HTTP payload with no LF at all quarantines gracefully (no crash, " +
    "payload bytes preserved) and the next record still comes through") {
    // regression 1: the status-line scan walked past payloadEnd into the
    // record separator when the payload contained zero \n bytes, pushing
    // bodyStart beyond payloadEnd and crashing copyOfRange — one junk
    // record failed the whole scan, violating the permissive contract.
    // regression 2: an HTTP header block that never reaches its blank
    // line consumed the whole payload as "headers" and emitted an
    // error-free row with an empty body — the bytes vanished from every
    // output column. Both now land in one quarantine row carrying the
    // full payload.
    val dir = tmp()
    val payload = "HTTP/1.1 200" // starts with HTTP/, no LF anywhere
    val lfless = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://lfless/x\r\n" +
      s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n" +
      payload + "\r\n\r\n"
    val bytes = (lfless +
      record("https://a/2", "2026-01-02T00:00:00Z", "<p>after</p>"))
      .getBytes("UTF-8")
    writeBytes(dir, "m.warc", bytes)
    val all = WarcSource.read(spark, dir).orderBy("offset")
    val bad = WarcSource.quarantined(all)
      .select(col("error"), col("target_uri"), col("status"),
        decode(col("body"), "UTF-8"))
      .as[(String, String, Option[Int], String)].collect()
    assert(bad.length == 1)
    assert(bad.head._1.contains("not terminated within payload"))
    assert(bad.head._2 == "https://lfless/x")
    assert(bad.head._3.contains(200)) // status still parsed and surfaced
    assert(bad.head._4 == payload)    // the raw payload is recoverable
    assert(WarcSource.good(all).select("target_uri").as[String]
      .collect().toSeq == Seq("https://a/2"))
  }

  test("unterminated HTTP header block quarantines with the payload " +
    "bytes instead of silently emitting an empty body") {
    val dir = tmp()
    val payload = "HTTP/1.1 200 OK\r\nX-Hdr: 1\r\nBODYBYTES" // no blank line
    val rec = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://noterm/x\r\n" +
      s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n" +
      payload + "\r\n\r\n"
    writeBytes(dir, "m.warc", rec.getBytes("UTF-8"))
    val bad = WarcSource.quarantined(WarcSource.read(spark, dir))
      .select(col("error"), decode(col("body"), "UTF-8"))
      .as[(String, String)].collect()
    assert(bad.length == 1)
    assert(bad.head._1.contains("not terminated within payload"))
    assert(bad.head._2.contains("BODYBYTES"))
  }

  test("corrupt oversized Content-Length resyncs at the next magic " +
    "instead of swallowing the records behind it") {
    val dir = tmp()
    val corrupt = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://corrupt/x\r\nContent-Length: 99999\r\n\r\n" +
      "tiny real payload\r\n\r\n"
    val bytes = (corrupt +
      record("https://a/2", "2026-01-02T00:00:00Z", "<p>b</p>") +
      record("https://a/3", "2026-01-03T00:00:00Z", "<p>c</p>"))
      .getBytes("UTF-8")
    writeBytes(dir, "m.warc", bytes)
    val all = WarcSource.read(spark, dir).orderBy("offset")
    val bad = WarcSource.quarantined(all)
      .select("error", "target_uri").as[(String, String)].collect()
    assert(bad.length == 1 && bad.head._1.contains("truncated") &&
      bad.head._2 == "https://corrupt/x")
    // the two valid records BEHIND the corrupt length still parse
    assert(WarcSource.good(all).select("target_uri").as[String]
      .collect().toSeq == Seq("https://a/2", "https://a/3"))
  }

  test("a corrupt gzip member mid-stream quarantines the raw tail " +
    "instead of silently dropping everything after it") {
    // GZIPInputStream's concatenation mode treats a corrupt next-member
    // header as clean EOF — the member-wise inflater must instead parse
    // the good prefix AND surface the undecodable tail as a row
    def gz(s: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(s.getBytes("UTF-8")); g.close(); bo.toByteArray
    }
    val dir = tmp()
    val good1 = gz(record("https://a/1", "2026-01-01T00:00:00Z", "<p>one</p>"))
    val junk = Array.fill[Byte](37)(0x55)
    val good2 = gz(record("https://a/2", "2026-01-02T00:00:00Z", "<p>two</p>"))
    writeBytes(dir, "m.warc.gz", good1 ++ junk ++ good2)
    val all = WarcSource.read(spark, dir)
    // the record before the junk parses; the tail (junk + the unreachable
    // second member) is quarantined with its raw bytes
    assert(WarcSource.good(all).select("target_uri").as[String]
      .collect().toSeq == Seq("https://a/1"))
    val bad = WarcSource.quarantined(all)
      .select(col("error"), octet_length(col("body")).cast("long"))
      .as[(String, Long)].collect()
    assert(bad.length == 1)
    assert(bad.head._1.contains("gzip"))
    assert(bad.head._2 == (junk.length + good2.length).toLong)
  }

  test("a gzip member failing its CRC rolls the decompressed prefix back: " +
    "its content is quarantined-raw ONLY, never also parsed as good records") {
    // regression: the failed member's fully-inflated bytes used to stay in
    // the parsed prefix (emitted as error-free records) while the SAME
    // member's raw bytes were quarantined in the tail — double-represented
    // content, and integrity-failed data with error=null
    def gz(s: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(s.getBytes("UTF-8")); g.close(); bo.toByteArray
    }
    val dir = tmp()
    val good = gz(record("https://a/1", "2026-01-01T00:00:00Z", "<p>one</p>"))
    val badMember = gz(record("https://a/2", "2026-01-02T00:00:00Z", "<p>two</p>"))
    badMember(badMember.length - 8) =
      (badMember(badMember.length - 8) ^ 0xff).toByte // flip a CRC bit
    writeBytes(dir, "m.warc.gz", good ++ badMember)
    val all = WarcSource.read(spark, dir)
    // ONLY the verified member's record is good — a/2 must not appear
    assert(WarcSource.good(all).select("target_uri").as[String]
      .collect().toSeq == Seq("https://a/1"))
    val bad = WarcSource.quarantined(all)
      .select(col("error"), octet_length(col("body")).cast("long"))
      .as[(String, Long)].collect()
    assert(bad.length == 1)
    assert(bad.head._1.contains("CRC mismatch"))
    // the raw tail uniquely owns the failed member's bytes, from its start
    assert(bad.head._2 == badMember.length.toLong)
  }

  test("a junk prefix ABUTTING the first record (no separator) quarantines " +
    "alone — the version-line fallback keeps every record recoverable") {
    // regression on the separator-preceded resync: without the fallback a
    // 3-byte prefix written by a broken concatenator swallowed EVERY
    // record of the member into one quarantine row
    val dir = tmp()
    val bytes = ("XYZ" + // junk glued straight onto the magic
      record("https://a/1", "2026-01-01T00:00:00Z", "<p>one</p>") +
      record("https://a/2", "2026-01-02T00:00:00Z", "<p>two</p>"))
      .getBytes("UTF-8")
    writeBytes(dir, "m.warc", bytes)
    val all = WarcSource.read(spark, dir).orderBy("offset")
    val bad = WarcSource.quarantined(all)
      .select(decode(col("body"), "UTF-8")).as[String].collect()
    assert(bad.toSeq == Seq("XYZ"))
    assert(WarcSource.good(all).select("target_uri").as[String]
      .collect().toSeq == Seq("https://a/1", "https://a/2"))
  }

  test("a bare WARC/ inside garbage (URI path, prose) is NOT a resync " +
    "target — only a validating version line or a separator-preceded " +
    "magic recovers") {
    val dir = tmp()
    val garbage = "see https://archive.example/WARC/1.0/foo for details "
    val bytes = (garbage +
      record("https://a/2", "2026-01-02T00:00:00Z", "<p>after</p>"))
      .getBytes("UTF-8")
    writeBytes(dir, "m.warc", bytes)
    val all = WarcSource.read(spark, dir).orderBy("offset")
    val bad = WarcSource.quarantined(all)
      .select(decode(col("body"), "UTF-8")).as[String].collect()
    // the URI's WARC/1.0/foo is rejected (version line has a '/'), so
    // the WHOLE garbage run lands in one quarantine row and the real
    // record behind it still parses
    assert(bad.length == 1 && bad.head == garbage)
    assert(WarcSource.good(all).select("target_uri").as[String]
      .collect().toSeq == Seq("https://a/2"))
  }

  test("a truncated tail record whose body embeds WARC content quarantines " +
    "to EOF instead of fabricating top-level records from the embedding") {
    // re-archived WARCs inside HTTP bodies are real in web crawls: the
    // resync must only accept a separator-preceded magic, or the embedded
    // content surfaces as error-free top-level records
    val dir = tmp()
    val embedded = record("https://embedded/x", "2026-01-05T00:00:00Z",
      "<p>inner</p>")
    val truncated = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://tail/x\r\nContent-Length: 99999\r\n\r\n" +
      "re-archived dump: " + embedded // magic NOT preceded by a separator
    writeBytes(dir, "m.warc", truncated.getBytes("UTF-8"))
    val all = WarcSource.read(spark, dir)
    assert(WarcSource.good(all).count() == 0)
    val bad = WarcSource.quarantined(all)
      .select("error", "target_uri").as[(String, String)].collect()
    assert(bad.length == 1)
    assert(bad.head._1.contains("truncated"))
    assert(bad.head._2 == "https://tail/x")
  }

  test("warcinfo records keep their payload; no HTTP split, null status") {
    val dir = tmp()
    writeBytes(dir, "m.warc",
      (warcinfo("software: graft-test\r\n") +
        record("https://a/1", "2026-01-01T00:00:00Z", "<p>x</p>"))
        .getBytes("UTF-8"))
    val all = WarcSource.read(spark, dir).orderBy("offset")
    val rows = all.select(col("warc_type"), col("status"),
        col("content_type"), decode(col("body"), "UTF-8"))
      .as[(String, Option[Int], String, String)].collect()
    assert(rows(0) == (("warcinfo", None, "application/warc-fields",
      "software: graft-test\r\n")))
    assert(rows(1)._1 == "response" && rows(1)._2.contains(200))
  }

  test("gzip members (.warc.gz, concatenated per-record members) parse identically") {
    val r1 = record("https://a/1", "2026-01-01T00:00:00Z", "<p>one</p>")
    val r2 = record("https://a/2", "2026-01-02T00:00:00Z", "<p>two</p>")
    def gz(s: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(s.getBytes("UTF-8")); g.close()
      bo.toByteArray
    }
    val dir = tmp()
    // the Common Crawl layout: one gzip member PER RECORD, concatenated
    writeBytes(dir, "m.warc.gz", gz(r1) ++ gz(r2))
    val got = WarcSource.read(spark, dir).orderBy("offset")
      .select(col("target_uri"), decode(col("body"), "UTF-8"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("https://a/1", "<p>one</p>"),
      ("https://a/2", "<p>two</p>")))
    // corrupt gzip quarantines the raw member instead of failing the scan
    val dir2 = tmp()
    writeBytes(dir2, "m.warc.gz",
      Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3, 4, 5))
    val bad = WarcSource.quarantined(WarcSource.read(spark, dir2))
      .select("error").as[String].collect()
    assert(bad.length == 1 && bad.head.contains("gzip"))
  }

  test("WET conversion records: distributed writeWet → readWet round-trips " +
    "text byte-exactly, incl. unicode, CRLF-laden and empty bodies") {
    val dir = tmp()
    val docs = Seq(
      ("https://ex.org/a", "2026-08-03T00:00:00Z", "plain text"),
      ("https://ex.org/b", "2026-08-03T00:00:00Z", "ünïcode € 𝕥ext"),
      ("https://ex.org/c", "2026-08-03T00:00:00Z",
        "line one\r\nline two\n\nline three"), // framing is length-based
      ("https://ex.org/d", "2026-08-03T00:00:00Z", ""))
      .toDF("uri", "ts", "text").repartition(3)
    WarcSource.writeWet(docs, "uri", "ts", "text", s"$dir/wet")
    val raw = WarcSource.read(spark, s"$dir/wet")
    assert(WarcSource.quarantined(raw).count() == 0)
    // conversion records: no HTTP split, null status, text/plain
    assert(raw.filter(col("warc_type") === "conversion" &&
      col("status").isNull && col("content_type") === "text/plain")
      .count() == 4)
    val back = WarcSource.readWet(spark, s"$dir/wet")
      .select(col("target_uri"), col("fetch_ts"), col("text"))
      .as[(String, String, String)].collect().toSet
    assert(back == docs.as[(String, String, String)].collect().toSet)
  }

  test("conversionRecordString is byte-identical to the distributed " +
    "renderer and parses back as the same conversion record") {
    val (uri, ts, text) = ("https://ex.org/twin", "2026-08-03T00:00:00Z",
      "twin ünïcode € text")
    val dir = tmp()
    // hand fixture through the STRING twin...
    writeBytes(dir, "m.warc",
      WarcSource.conversionRecordString(uri, ts, text).getBytes("UTF-8"))
    val got = WarcSource.readWet(spark, dir)
      .select("target_uri", "fetch_ts", "text")
      .as[(String, String, String)].collect()
    assert(got.toSeq == Seq((uri, ts, text)))
    // ...and the Column renderer emits the IDENTICAL bytes (the twin
    // must never drift from the distributed layout)
    val rendered = Seq((uri, ts, text)).toDF("u", "t", "x")
      .select(WarcSource.conversionRecord(col("u"), col("t"), col("x")))
      .as[String].head()
    assert(rendered == WarcSource.conversionRecordString(uri, ts, text))
  }

  test("a WET conversion record whose TEXT embeds WARC content round-trips " +
    "intact (length framing wins over content)") {
    val dir = tmp()
    val tricky = "quoting a crawl: " +
      record("https://inner/x", "2026-01-01T00:00:00Z", "<p>inner</p>")
    val docs = Seq(("https://ex.org/meta", "2026-08-03T00:00:00Z", tricky))
      .toDF("uri", "ts", "text")
    WarcSource.writeWet(docs, "uri", "ts", "text", s"$dir/wet")
    val got = WarcSource.readWet(spark, s"$dir/wet")
      .select("text").as[String].collect()
    assert(got.toSeq == Seq(tricky))
    assert(WarcSource.read(spark, s"$dir/wet").count() == 1) // ONE record
  }

  test("empty member and lone separators yield zero records") {
    val dir = tmp()
    writeBytes(dir, "a.warc", Array.emptyByteArray)
    writeBytes(dir, "b.warc", "\r\n\r\n\n".getBytes("UTF-8"))
    assert(WarcSource.read(spark, dir).count() == 0)
  }
}
