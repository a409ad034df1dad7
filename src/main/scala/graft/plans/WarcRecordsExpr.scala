package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC (ISO 28500) record splitter — web stage −2, the byte-level front
  * door a crawl corpus actually arrives through (Common Crawl ships
  * `.warc`/`.warc.gz` segments). One pass over a WARC member's bytes
  * yields `array<struct>` of its records: WARC header fields parsed, the
  * HTTP response envelope of `response` records split off (status line +
  * headers separated from the body), and EVERY malformed region
  * quarantined as a row carrying its raw bytes and an `error` message —
  * the src18 contract at the container level (PERMISSIVE, nothing
  * silently dropped, nothing fails the job).
  *
  * Reference scope note: the reference pipeline ingests CSV/DBF/REST
  * (`/root/reference/himalayan_etl/ops/extract.py:16-297`) — WARC is an
  * engine extension for the crawl-to-corpus chain (t49 → t47 → q71),
  * parsed from the public ISO 28500 / RFC 9110 layouts only.
  *
  * Grammar handled, byte-exact:
  *   - record = `WARC/x.y CRLF (name ":" value CRLF)* CRLF payload`,
  *     payload length = the mandatory `Content-Length` header (bytes);
  *     records separated by CRLF CRLF (any run of CR/LF tolerated, so a
  *     line-oriented writer's extra `\n` never breaks the parse);
  *   - gzip members: a leading 1f 8b magic decompresses the whole input
  *     first (JDK GZIPInputStream reads concatenated members — the
  *     `.warc.gz` layout where every record is its own member);
  *   - `response` records whose payload starts with `HTTP/` are split:
  *     `status` = the status-line code, `content_type` = the HTTP
  *     Content-Type header value (trimmed, as written), `body` = bytes
  *     after the HTTP header block. Anything else keeps the whole
  *     payload as `body` with null status/content_type;
  *   - malformed regions (no `WARC/` magic at a record boundary, bad or
  *     missing Content-Length, payload truncated by EOF) become rows
  *     with `error` set and `body` = the raw quarantined bytes, resyncing
  *     at the next `WARC/` magic (best-effort: a malformed region is
  *     delimited by the next magic because its own length field is the
  *     thing that's broken).
  *
  * Scale shape: the expression is a per-member map inside whole-stage
  * codegen — file-granularity parallelism, which IS the crawl corpus
  * layout (Common Crawl: ~100k segment files per crawl; 1000 executors
  * each decode their own members, zero shuffle before the first real
  * operator). Memory is bounded by one member (+ its decompression),
  * the same contract as any splittable-compression-free scan.
  */
case class WarcRecordsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = WarcRecordsExpr.outType
  override def prettyName: String = "warc_records"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary, got ${other.catalogString}")
    }

  override def nullSafeEval(b: Any): Any =
    WarcRecordsExpr.compute(b.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.plans.WarcRecordsExpr.compute($b)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object WarcRecordsExpr {

  val recordType: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("fetch_ts", StringType, nullable = true),
    StructField("status", IntegerType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("body", BinaryType, nullable = true),
    StructField("error", StringType, nullable = true)))

  private[plans] val outType: DataType =
    ArrayType(recordType, containsNull = false)

  private val Magic = "WARC/".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def isCrLf(b: Byte): Boolean = b == '\r' || b == '\n'

  /** Does `pat` occur at exactly `at`? (The boundary check — the old
    * `indexOf(...) != pos` form walked the whole garbage region once just
    * to answer a boolean, then the quarantine path walked it again.)
    */
  private def matchesAt(b: Array[Byte], pat: Array[Byte], at: Int): Boolean = {
    if (at < 0 || at + pat.length > b.length) return false
    var j = 0
    while (j < pat.length && b(at + j) == pat(j)) j += 1
    j == pat.length
  }

  /** Next index of `pat` in `b` at or after `from`, or -1. */
  private def indexOf(b: Array[Byte], pat: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = b.length - pat.length
    while (i <= last) {
      var j = 0
      while (j < pat.length && b(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  /** Is position `i` a plausible RECORD boundary — preceded by a record
    * separator (two line breaks, i.e. the mandatory CRLF CRLF between
    * record blocks) or by nothing but leading CR/LF to the start of the
    * member? A bare `WARC/` inside a malformed region's bytes (a URI
    * path, a re-archived WARC embedded in an HTTP body — real in web
    * crawls) is NOT a boundary, and resyncing on it would fabricate
    * top-level records out of quarantined content.
    */
  private def isRecordBoundary(b: Array[Byte], i: Int): Boolean = {
    var j = i - 1
    var lfs = 0
    while (j >= 0 && lfs < 2 && isCrLf(b(j))) {
      if (b(j) == '\n') lfs += 1
      j -= 1
    }
    lfs >= 2 || j < 0
  }

  /** Next separator-preceded `WARC/` magic at or after `from`, or -1 —
    * the only resync target the DECLARED-PAYLOAD malformed branches
    * (bad/oversized Content-Length) may use: content inside a record's
    * own payload region must never fabricate top-level records.
    */
  private def nextBoundaryMagic(b: Array[Byte], from: Int): Int = {
    var i = indexOf(b, Magic, from)
    while (i >= 0 && !isRecordBoundary(b, i)) i = indexOf(b, Magic, i + 1)
    i
  }

  /** Does a WARC VERSION LINE start at `i`? `WARC/` followed by a
    * non-empty run of digits/dots up to a completed line ending. This is
    * what a real record header starts with; a coincidental `WARC/`
    * inside garbage bytes (a URI path like `/WARC/1.0/foo`, prose) fails
    * the all-digits-and-dots check.
    */
  private def isVersionLineAt(b: Array[Byte], i: Int): Boolean = {
    if (!matchesAt(b, Magic, i)) return false
    val vs = i + Magic.length
    val e = lineEnd(b, vs)
    if (e >= b.length && (e == 0 || b(e - 1) != '\n')) return false // no line end
    val ce = lineContentEnd(b, vs, e)
    if (ce <= vs) return false
    var j = vs
    while (j < ce) {
      val c = b(j)
      if (!((c >= '0' && c <= '9') || c == '.')) return false
      j += 1
    }
    true
  }

  /** Resync target for the GARBAGE branch (no magic at a record
    * boundary): the framing is already lost, so recovery outranks the
    * in-payload fabrication concern — accept a magic that is EITHER
    * separator-preceded OR starts a validating version line. Without the
    * version-line fallback, a 3-byte junk prefix abutting the first
    * record (no CRLF CRLF between them — broken concatenators do this)
    * swallowed EVERY record of the member into one quarantine row.
    */
  private def nextGarbageResync(b: Array[Byte], from: Int): Int = {
    var i = indexOf(b, Magic, from)
    while (i >= 0 && !(isRecordBoundary(b, i) || isVersionLineAt(b, i)))
      i = indexOf(b, Magic, i + 1)
    i
  }

  private def ascii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, java.nio.charset.StandardCharsets.UTF_8)

  /** End (exclusive) of the line starting at `from`: index of the next
    * LF (+1), or `len`. CR before the LF is excluded from the content.
    */
  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length && b(i) != '\n') i += 1
    math.min(i + 1, b.length)
  }

  private def lineContentEnd(b: Array[Byte], from: Int, end: Int): Int = {
    var e = end
    if (e > from && e <= b.length && b(e - 1) == '\n') e -= 1
    if (e > from && b(e - 1) == '\r') e -= 1
    e
  }

  private def u8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  private def row(offset: Long, warcType: String, uri: String, ts: String,
                  status: java.lang.Integer, contentType: String,
                  body: Array[Byte], error: String): GenericInternalRow =
    new GenericInternalRow(Array[Any](offset, u8(warcType), u8(uri), u8(ts),
      if (status == null) null else status.intValue(), u8(contentType),
      body, u8(error)))

  /** Decompressed-size ceiling: just under the JVM array limit, so the
    * operator aborts cleanly (quarantining the tail) instead of dying in
    * ByteArrayOutputStream growth on a pathological member.
    */
  private val MaxInflatedBytes: Long = Integer.MAX_VALUE.toLong - 64

  /** Decompress a run of CONCATENATED gzip members, member by member via
    * a raw [[java.util.zip.Inflater]] with explicit header/trailer
    * framing and a CRC32 check per member. GZIPInputStream is NOT used
    * on purpose: its concatenation mode swallows the IOException from a
    * corrupt next-member header and reports clean EOF — everything after
    * one corrupt member in a .warc.gz silently vanished (no quarantine
    * row), violating the nothing-silently-dropped contract. Returns
    * (decompressed prefix, error-or-null, raw offset where the
    * undecodable tail starts) — the caller parses the prefix normally
    * and quarantines the raw tail with the error.
    */
  private def gunzip(b: Array[Byte]): (Array[Byte], String, Int) = {
    val out = new java.io.ByteArrayOutputStream(
      math.min(math.max(b.length.toLong * 4, 1024L), 1L << 26).toInt)
    val buf = new Array[Byte](64 * 1024)
    var pos = 0
    while (pos < b.length) {
      val memberStart = pos
      // Snapshot before the member: EVERY member-level failure rolls the
      // output back to the last fully VERIFIED member, so the raw tail
      // (from memberStart) uniquely owns the failed member's bytes. The
      // old form returned out.toByteArray as-is — a CRC/length mismatch
      // (or a partial inflate before DataFormatException) left the failed
      // member's decompressed bytes in the parsed prefix as error-free
      // records WHILE the same bytes sat raw in the quarantine tail:
      // double-represented content, and integrity-failed data emitted
      // with error=null.
      val preMemberSize = out.size()
      def fail(msg: String): (Array[Byte], String, Int) =
        (java.util.Arrays.copyOf(out.toByteArray, preMemberSize),
          msg + s" at byte $memberStart", memberStart)
      if (!(pos + 10 <= b.length && (b(pos) & 0xff) == 0x1f &&
          (b(pos + 1) & 0xff) == 0x8b && (b(pos + 2) & 0xff) == 8))
        return fail("trailing bytes are not a gzip member")
      val flg = b(pos + 3) & 0xff
      var hp = pos + 10
      if ((flg & 4) != 0) { // FEXTRA
        if (hp + 2 > b.length) return fail("truncated gzip header")
        hp += 2 + ((b(hp) & 0xff) | ((b(hp + 1) & 0xff) << 8))
      }
      if ((flg & 8) != 0) { // FNAME
        while (hp < b.length && b(hp) != 0) hp += 1
        hp += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        while (hp < b.length && b(hp) != 0) hp += 1
        hp += 1
      }
      if ((flg & 2) != 0) hp += 2 // FHCRC
      if (hp > b.length) return fail("truncated gzip header")
      val inf = new java.util.zip.Inflater(true)
      val crc = new java.util.zip.CRC32()
      var memberLen = 0L
      try {
        inf.setInput(b, hp, b.length - hp)
        while (!inf.finished()) {
          val k =
            try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException =>
              return fail("corrupt deflate data in gzip member")
            }
          if (k == 0 && inf.finished()) ()
          else if (k == 0 && inf.needsInput())
            return fail("truncated gzip member")
          else {
            if (out.size().toLong + k > MaxInflatedBytes)
              return fail("decompressed size exceeds the 2 GB member cap")
            out.write(buf, 0, k)
            crc.update(buf, 0, k)
            memberLen += k
          }
        }
        val trailer = hp + inf.getBytesRead.toInt
        if (trailer + 8 > b.length) return fail("truncated gzip trailer")
        def le32(at: Int): Long =
          (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
            ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)
        if (le32(trailer) != crc.getValue)
          return fail("gzip member CRC mismatch")
        if (le32(trailer + 4) != (memberLen & 0xffffffffL))
          return fail("gzip member length mismatch")
        pos = trailer + 8
      } finally inf.end()
    }
    (out.toByteArray, null, -1)
  }

  def compute(raw: Array[Byte]): ArrayData = {
    var gzError: String = null
    var gzTailStart = -1
    val b =
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b) {
        val (data, err, tail) = gunzip(raw)
        gzError = err
        gzTailStart = tail
        data
      } else raw
    val n = b.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos < n && isCrLf(b(pos))) pos += 1
    while (pos < n) {
      val recStart = pos
      if (!matchesAt(b, Magic, pos)) {
        // no magic at the boundary: quarantine up to the next plausible
        // record start (separator-preceded, or a validating version line)
        val next = nextGarbageResync(b, pos + 1)
        val end = if (next < 0) n else next
        out += row(recStart.toLong, null, null, null, null, null,
          java.util.Arrays.copyOfRange(b, recStart, end),
          "no WARC/ magic at record boundary")
        pos = end
      } else {
        // version line, then headers until the blank line
        var p = lineEnd(b, pos)
        var warcType: String = null
        var uri: String = null
        var ts: String = null
        var warcCt: String = null
        var contentLength = -1L
        var badLength = false
        var headersDone = false
        while (!headersDone && p < n) {
          val e = lineEnd(b, p)
          val ce = lineContentEnd(b, p, e)
          if (ce == p) headersDone = true // blank line
          else {
            val line = ascii(b, p, ce)
            val colon = line.indexOf(':')
            if (colon > 0) {
              val name = line.substring(0, colon).trim
                .toLowerCase(java.util.Locale.ROOT)
              val value = line.substring(colon + 1).trim
              name match {
                case "warc-type" => warcType = value
                case "warc-target-uri" => uri = value
                case "warc-date" => ts = value
                case "content-type" => warcCt = value
                case "content-length" =>
                  try contentLength = java.lang.Long.parseLong(value)
                  catch { case _: NumberFormatException => badLength = true }
                  if (contentLength < 0) badLength = true
                case _ => ()
              }
            }
          }
          p = e
        }
        if (badLength || contentLength < 0 || !headersDone) {
          // the record's own framing is broken — resync at the next
          // separator-preceded magic (a bare `WARC/` inside the unframed
          // payload, e.g. in a URI path, must not fabricate a record)
          val next = nextBoundaryMagic(b, recStart + Magic.length)
          val end = if (next < 0) n else next
          out += row(recStart.toLong, warcType, uri, ts, null, null,
            java.util.Arrays.copyOfRange(b, recStart, end),
            if (!headersDone) "header block not terminated before EOF"
            else "missing or invalid Content-Length")
          pos = end
        } else if (p + contentLength > n) {
          // declared length overruns the member: the framing is broken, so
          // resync at the next SEPARATOR-PRECEDED magic — a corrupt
          // oversized length must not swallow the valid records behind it,
          // but a genuinely truncated tail record whose body embeds WARC
          // content (re-archived WARCs inside HTTP bodies are real in web
          // crawls) must not have that content fabricated as top-level
          // error-free records either; the separator requirement
          // distinguishes the two
          val next = nextBoundaryMagic(b, recStart + Magic.length)
          val end = if (next < 0) n else next
          out += row(recStart.toLong, warcType, uri, ts, null, null,
            java.util.Arrays.copyOfRange(b, recStart, end),
            s"payload truncated: declared $contentLength bytes, " +
              s"${n - p} remain")
          pos = end
        } else {
          val payloadStart = p
          val payloadEnd = p + contentLength.toInt
          var status: java.lang.Integer = null
          var httpCt: String = null
          var bodyStart = payloadStart
          val isHttp = "response".equalsIgnoreCase(String.valueOf(warcType)) &&
            payloadEnd - payloadStart >= 5 &&
            ascii(b, payloadStart, payloadStart + 5) == "HTTP/"
          if (isHttp) {
            // status line: HTTP/x.y SP code SP reason. Clamp the line scan
            // at payloadEnd — a payload with no LF at all (truncated or
            // junk status line) must not walk into the record separator
            // and push bodyStart past payloadEnd (that crashed the scan;
            // the permissive contract is that NOTHING fails the job).
            var q = math.min(lineEnd(b, payloadStart), payloadEnd)
            val sl = ascii(b, payloadStart, lineContentEnd(b, payloadStart, q))
            val parts = sl.split(" ", 3)
            if (parts.length >= 2) {
              try status = Integer.valueOf(parts(1).trim)
              catch { case _: NumberFormatException => () }
            }
            var done = false
            while (!done && q < payloadEnd) {
              val e = math.min(lineEnd(b, q), payloadEnd)
              val ce = lineContentEnd(b, q, e)
              if (ce == q) done = true
              else {
                val line = ascii(b, q, ce)
                val colon = line.indexOf(':')
                if (colon > 0 &&
                    line.substring(0, colon).trim
                      .equalsIgnoreCase("content-type"))
                  httpCt = line.substring(colon + 1).trim
              }
              q = e
            }
            if (!done) {
              // the header block never hit its blank line: bodyStart
              // would be payloadEnd and the payload bytes would vanish
              // from every output column — surface them as a quarantine
              // row instead (the HTTP split is unreliable here anyway)
              out += row(recStart.toLong, warcType, uri, ts, status, warcCt,
                java.util.Arrays.copyOfRange(b, payloadStart, payloadEnd),
                "http header block not terminated within payload")
              pos = payloadEnd
              while (pos < n && isCrLf(b(pos))) pos += 1
              // continue the member scan at the next record
              bodyStart = -1
            } else bodyStart = q
          }
          if (bodyStart >= 0) {
            out += row(recStart.toLong, warcType, uri, ts, status,
              if (isHttp) httpCt else warcCt,
              java.util.Arrays.copyOfRange(b, bodyStart, payloadEnd), null)
            pos = payloadEnd
            while (pos < n && isCrLf(b(pos))) pos += 1
          }
        }
      }
    }
    if (gzError != null)
      out += row(n.toLong, null, null, null, null, null,
        java.util.Arrays.copyOfRange(raw, math.max(gzTailStart, 0), raw.length),
        gzError)
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point. */
  def warcRecords(bytes: Column): Column =
    bridge.column(WarcRecordsExpr(bridge.expression(bytes)))
}
