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

/** Single-pass-per-stage native form of
  * [[graft.functions.HtmlFunctions]]'s block relation — the hot path of
  * web-curation stage −1. The column composition (5 invisible-content
  * regex passes + block-tag regex + per-block link/tag regexes + 7
  * entity replaces, all interpreted per block) is the SEMANTIC REFERENCE
  * and the form the DuckDB oracle mirrors; this expression computes the
  * IDENTICAL function with hand scanners (substring search instead of
  * regex backtracking, one StringBuilder per stage), which is what makes
  * the extraction a scan-speed map at 100 TB. ExtractSpec's differential
  * law fuzzes the two against each other on random tag soup — any
  * divergence is a bug HERE (the reference defines the contract).
  *
  * Replicated semantics, pass for pass (all case-insensitive where the
  * reference is, `\s` = Java's `[ \t\n\x0B\f\r]`):
  *   1–3. `<script/style/noscript\b[^>]*>.*?</name\s*>` → " " (lazy to
  *        the FIRST close; an unclosed element stays literal),
  *   4. `<!--.*?-->` → " ",  5. `<![CDATA[.*?]]>` → " ",
  *   6. block-level tags (open or close, `\b[^>]*>`) split blocks,
  *   7. per block: link text = concatenated `<a\b[^>]*>(.*?)</a\s*>`
  *      bodies; visible text = strip `<[^>]*>`, then the 7 SEQUENTIAL
  *      entity replaces (&amp; last), then whitespace-collapse + trim.
  * Blocks whose visible text is empty are dropped (the reference's
  * filter).
  */
case class HtmlBlocksExpr(child: Expression) extends UnaryExpression {

  private val structType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("link_text", StringType, nullable = false)))

  override def dataType: DataType =
    ArrayType(structType, containsNull = false)
  override def prettyName: String = "html_blocks"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.catalogString}")
    }

  override def nullSafeEval(h: Any): Any =
    HtmlBlocksExpr.compute(h.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h => s"graft.plans.HtmlBlocksExpr.compute($h)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object HtmlBlocksExpr {

  /** Java regex `\\b` word characters. NOT the ASCII `\\w` set: since
    * JDK 7, `\\b` is Unicode-aware even while `\\w` stays ASCII (the
    * documented asymmetry), so the reference pattern `</?p\\b` does NOT
    * split at `<p\u00e9>` — \u00e9 is a word char, no boundary after the
    * p. The scanner must agree or the differential law breaks on
    * non-ASCII tag soup.
    */
  private def isWord(cp: Int): Boolean = // code point, NOT char:
    // Java regex matches code points, so a supplementary-plane letter
    // after a tag name (`<p𝕡>`) is a word char to `\b` (no
    // boundary) while `Character.isLetterOrDigit(Char)` saw only a
    // surrogate (boundary) — callers must pass `codePointAt` and step
    // surrogate pairs to keep the scanner/regex differential law on
    // astral-plane tag soup
    Character.isLetterOrDigit(cp) || cp == '_'

  private def isSpace(c: Char): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  private def asciiLower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  private def asciiLowerStr(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) { b.append(asciiLower(s.charAt(i))); i += 1 }
    b.toString
  }

  /** ASCII-only case-insensitive region compare — Java regex `(?i)`
    * WITHOUT `UNICODE_CASE` folds only US-ASCII, so `(?i)script` does
    * not match a dotted-capital-\u0130 spelling; `String.regionMatches
    * (true, ...)` (full Unicode folding) would, and locale-default
    * `toLowerCase` is worse still (Turkish I variants). The hand-rolled
    * fold keeps every match site locale-independent and reference-exact.
    */
  private def regionMatchesCi(s: String, at: Int, lit: String): Boolean = {
    if (at < 0 || at.toLong + lit.length > s.length) return false
    var k = 0
    while (k < lit.length &&
      asciiLower(s.charAt(at + k)) == asciiLower(lit.charAt(k))) k += 1
    k == lit.length
  }

  /** `<name\b[^>]*>` starting at `i` (which must be '<'): the position
    * AFTER the closing '>', or -1 if no such open tag starts here.
    */
  private def openTagEnd(s: String, i: Int, name: String): Int = {
    if (!regionMatchesCi(s, i + 1, name)) return -1
    val after = i + 1 + name.length
    if (after < s.length && isWord(s.codePointAt(after))) return -1 // \b
    val gt = s.indexOf('>', after)
    if (gt < 0) -1 else gt + 1
  }

  /** `</name\s*>` scanning from `from`: (closeStart, posAfterGt), or
    * null-equivalent (-1, -1).
    */
  private def findClose(s: String, from: Int, name: String): (Int, Int) = {
    var c = from
    val n = s.length
    while (c >= 0 && c < n) {
      c = s.indexOf('<', c)
      if (c < 0) return (-1, -1)
      if (c + 1 < n && s.charAt(c + 1) == '/' &&
          regionMatchesCi(s, c + 2, name)) {
        var k = c + 2 + name.length
        while (k < n && isSpace(s.charAt(k))) k += 1
        if (k < n && s.charAt(k) == '>') return (c, k + 1)
      }
      c += 1
    }
    (-1, -1)
  }

  /** One global `<name\b[^>]*>.*?</name\s*>` → " " pass (lazy close,
    * leftmost scan, resume after each match — regex-replace semantics).
    */
  private def dropElement(s: String, name: String): String = {
    if (s.indexOf('<') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    // once a close-tag scan reaches the end without finding one, no later
    // open can close either — skip further scans (defuses the quadratic a
    // crawl page of repeated unclosed opens would otherwise cost; the
    // regex reference pays it, a 100 TB scan must not)
    var closeExhausted = false
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && !closeExhausted) {
        val afterOpen = openTagEnd(s, i, name)
        val close = if (afterOpen < 0) (-1, -1)
                    else findClose(s, afterOpen, name)
        if (afterOpen >= 0 && close._1 < 0) closeExhausted = true
        if (afterOpen >= 0 && close._1 >= 0) {
          out.append(' ')
          i = close._2
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** One global `open.*?close` → " " pass for literal delimiters
    * (comments, CDATA).
    */
  private def dropDelimited(s: String, open: String, close: String): String = {
    var from = s.indexOf(open)
    if (from < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (from >= 0) {
      val end = s.indexOf(close, from + open.length)
      if (end < 0) { from = -1 } // unmatched open stays literal
      else {
        out.append(s, i, from).append(' ')
        i = end + close.length
        from = s.indexOf(open, i)
      }
    }
    out.append(s, i, s.length)
    out.toString
  }

  /** The block-level tag names (the reference's alternation, boundary
    * semantics via maximal-word-run set membership).
    */
  private val blockTags: java.util.HashSet[String] = {
    val set = new java.util.HashSet[String]()
    Seq("p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
      "dl", "dt", "dd", "table", "thead", "tbody", "tfoot", "tr", "td",
      "th", "blockquote", "pre", "section", "article", "header", "footer",
      "nav", "aside", "main", "form", "fieldset", "figure", "figcaption",
      "title", "br", "hr").foreach(set.add)
    set
  }

  /** `</?blocktag\b[^>]*>` starting at '<': position after '>', or -1. */
  private def blockTagEnd(s: String, i: Int): Int = {
    var j = i + 1
    val n = s.length
    if (j < n && s.charAt(j) == '/') j += 1
    val start = j
    while (j < n && isWord(s.codePointAt(j)))
      j += Character.charCount(s.codePointAt(j))
    if (j == start) return -1
    if (!blockTags.contains(asciiLowerStr(s.substring(start, j)))) return -1
    val gt = s.indexOf('>', j)
    if (gt < 0) -1 else gt + 1
  }

  // ONE authoritative decode list (shared with the oracle builder)
  private def entitySteps = graft.functions.HtmlFunctions.entitySteps

  /** strip `<[^>]*>` → " ", the 7 sequential entity replaces, then
    * whitespace-collapse + trim (the reference's visibleText).
    */
  private[plans] def visibleText(seg: String): String = {
    // tags out
    var s: String = {
      if (seg.indexOf('<') < 0) seg
      else {
        val out = new java.lang.StringBuilder(seg.length)
        var i = 0
        val n = seg.length
        while (i < n) {
          val c = seg.charAt(i)
          if (c == '<') {
            val gt = seg.indexOf('>', i + 1)
            if (gt >= 0) { out.append(' '); i = gt + 1 }
            else { out.append(c); i += 1 }
          } else { out.append(c); i += 1 }
        }
        out.toString
      }
    }
    // sequential literal replaces, &amp; LAST (double-encoding contract)
    entitySteps.foreach { case (from, to) =>
      if (s.contains(from)) s = s.replace(from, to)
    }
    // whitespace collapse + trim
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    var pendingSpace = false
    while (i < n) {
      val c = s.charAt(i)
      if (isSpace(c)) { if (out.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** concatenated `<a\b[^>]*>(.*?)</a\s*>` bodies, joined with " ". */
  private def linkHtml(seg: String): String = {
    var i = seg.indexOf('<')
    if (i < 0) return ""
    val out = new java.lang.StringBuilder
    val n = seg.length
    var closeExhausted = false // same quadratic defusal as dropElement
    while (i >= 0 && i < n && !closeExhausted) {
      val afterOpen = openTagEnd(seg, i, "a")
      val close = if (afterOpen < 0) (-1, -1)
                  else findClose(seg, afterOpen, "a")
      if (afterOpen >= 0 && close._1 < 0) closeExhausted = true
      if (afterOpen >= 0 && close._1 >= 0) {
        if (out.length > 0) out.append(' ')
        out.append(seg, afterOpen, close._1)
        i = seg.indexOf('<', close._2)
      } else i = seg.indexOf('<', i + 1)
    }
    out.toString
  }

  /** Static forwarder target for the generated code. */
  def compute(html: UTF8String): ArrayData = {
    var s = html.toString
    // contract limit: U+0001 is the reference composition's block-split
    // sentinel (and the oracle's chr(1)); strip it EVERYWHERE (here, in
    // blocksReference, in the DuckDB mirror) so a page whose raw bytes
    // carry the control char can't diverge the three implementations —
    // it's a C0 control with no legitimate visible-text meaning anyway
    if (s.indexOf(1.toChar) >= 0) s = s.replace("\u0001", "")
    s = dropElement(s, "script")
    s = dropElement(s, "style")
    s = dropElement(s, "noscript")
    s = dropDelimited(s, "<!--", "-->")
    s = dropDelimited(s, "<![CDATA[", "]]>")
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val n = s.length
    var blockStart = 0
    var i = 0
    def emit(endExclusive: Int): Unit = {
      if (endExclusive > blockStart) {
        val seg = s.substring(blockStart, endExclusive)
        val text = visibleText(seg)
        if (text.nonEmpty)
          out += new GenericInternalRow(Array[Any](
            UTF8String.fromString(text),
            UTF8String.fromString(visibleText(linkHtml(seg)))))
      }
    }
    while (i < n) {
      if (s.charAt(i) == '<') {
        val end = blockTagEnd(s, i)
        if (end >= 0) {
          emit(i)
          blockStart = end
          i = end
        } else i += 1
      } else i += 1
    }
    emit(n)
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point. */
  def htmlBlocks(html: Column): Column =
    bridge.column(HtmlBlocksExpr(bridge.expression(html)))
}
