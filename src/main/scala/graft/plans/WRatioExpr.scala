package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The rest of the thefuzz scorer family — `partial_ratio`,
  * `token_sort_ratio`, `token_set_ratio` and the `WRatio` composite that
  * `process.extractOne` maximizes BY DEFAULT (reference: dw-etl
  * `himalayan_etl/ops/transform.py:55` calls `process.extractOne(x,
  * countries)` with no scorer argument; thefuzz's default scorer is
  * `fuzz.WRatio` and its default processor is `full_process`). q07/q45
  * covered plain `ratio`; q49 + these expressions close the last literal
  * reference semantic.
  *
  * Public semantics implemented (thefuzz pins the rapidfuzz backend, whose
  * subscores are FLOATS — one rounding at the end, unlike old fuzzywuzzy's
  * per-subscore ints):
  *
  *   - `partial_ratio(a, b)`: max Indel `ratio` of the SHORTER string
  *     against every contiguous alignment window of the longer — including
  *     edge-overhang windows (prefixes/suffixes shorter than the needle),
  *     which rapidfuzz ≥ 2.0's "guaranteed optimal alignment" covers.
  *   - `token_sort_ratio`: `ratio` of the two strings after
  *     whitespace-tokenizing, sorting tokens, re-joining with single
  *     spaces (duplicates kept).
  *   - `token_set_ratio`: tokens become SETS; with t0 = sorted
  *     intersection, t1 = t0 ++ sorted(a∖b), t2 = t0 ++ sorted(b∖a)
  *     (joined with spaces, trimmed), score = max of the three pairwise
  *     `ratio`s — 100 whenever one token set contains the other.
  *   - `wratio`: applies `default_process` to both sides first (lowercase,
  *     non-alphanumeric → space, trim — rapidfuzz semantics, Unicode alnum,
  *     NO ascii folding; thefuzz's legacy `force_ascii=True` strips
  *     non-ASCII instead, a documented divergence that only matters for
  *     accented names), then with L = len ratio of the processed strings:
  *       L < 1.5 → max(ratio, 0.95·max(token_sort, token_set))
  *       L ≥ 1.5 → p = (L < 8 ? 0.9 : 0.6);
  *                 max(ratio, p·partial_ratio,
  *                     0.95·p·max(partial_token_sort, partial_token_set))
  *     rounded half-to-even once at the end (`int(round(...))`). Either
  *     side processing to empty → 0.
  *
  * `partial_ratio`/`token_*_ratio` follow [[IndelRatioExpr]]'s convention
  * of NO built-in preprocessing (compose with `lower`/`regexp_replace`);
  * `wratio` bakes the processor in because its length-ratio branch points
  * are defined over the PROCESSED strings — matching
  * `process.extractOne`'s observable behavior end-to-end.
  *
  * Token sort order is Java's UTF-16 lexicographic compare (= code-point
  * order except astral-plane vs upper-BMP ties, irrelevant for name data).
  * All scorers reuse [[IndelRatioExpr]]'s bit-parallel LCS core; windows
  * and token joins stay O(|a|·|b|) word ops on name-length strings. All
  * four are codegen'd static calls — no UDF, stays in whole-stage codegen.
  */
object FuzzScorers {

  private def cp(s: String): Array[Int] = s.codePoints().toArray

  /** Unrounded Indel ratio over code points (rapidfuzz float semantics). */
  private def ratioD(a: Array[Int], b: Array[Int]): Double = {
    val n = a.length + b.length
    if (n == 0) return 100.0
    200.0 * IndelRatioExpr.lcs(a, b) / n
  }

  /** Max Indel ratio over every contiguous alignment of the shorter string
    * against the longer, overhangs included: alignment offsets run from
    * -(m-1) to n-1, window = long[max(0,i) .. min(n, i+m)). Overhang
    * windows make the one-directional slide ASYMMETRIC when both strings
    * have the same length (the needle keeps its full length, the window
    * truncates — "alpha"/"kappa" scores 67 one way, 60 the other), so the
    * equal-length case slides both directions and keeps the max; the
    * property spec pins symmetry for the whole family.
    */
  private def partialD(a: Array[Int], b: Array[Int]): Double =
    if (a.length == b.length && !(a sameElements b))
      math.max(slideD(a, b), slideD(b, a))
    else if (a.length <= b.length) slideD(a, b)
    else slideD(b, a)

  private def slideD(s: Array[Int], l: Array[Int]): Double = {
    val m = s.length
    val n = l.length
    if (m == 0) return if (n == 0) 100.0 else 0.0
    var best = 0.0
    var i = -(m - 1)
    while (i < n && best < 100.0) {
      val from = math.max(0, i)
      val until = math.min(n, i + m)
      val window = java.util.Arrays.copyOfRange(l, from, until)
      val r = ratioD(s, window)
      if (r > best) best = r
      i += 1
    }
    best
  }

  private def tokens(s: String): Array[String] =
    s.split("\\s+").filter(_.nonEmpty)

  private def sortJoin(ts: Array[String]): String =
    ts.sorted.mkString(" ")

  private def tokenSortD(a: String, b: String): Double =
    ratioD(cp(sortJoin(tokens(a))), cp(sortJoin(tokens(b))))

  /** The three token_set comparison strings (t0, t1, t2). */
  private def setStrings(sa: Set[String], sb: Set[String]): (String, String, String) = {
    val t0 = (sa & sb).toArray.sorted.mkString(" ")
    val t1 = (t0 + " " + (sa -- sb).toArray.sorted.mkString(" ")).trim
    val t2 = (t0 + " " + (sb -- sa).toArray.sorted.mkString(" ")).trim
    (t0, t1, t2)
  }

  private def tokenSetD(a: String, b: String): Double = {
    val sa = tokens(a).toSet
    val sb = tokens(b).toSet
    // rapidfuzz compat branch: either token set empty → 0, NOT the 100 the
    // t0/t2-both-empty algebra below would yield (round-5 advisor finding:
    // an all-whitespace candidate would otherwise dominate any top-1 rank)
    if (sa.isEmpty || sb.isEmpty) return 0.0
    val (t0, t1, t2) = setStrings(sa, sb)
    val (c0, c1, c2) = (cp(t0), cp(t1), cp(t2))
    math.max(ratioD(c0, c1), math.max(ratioD(c0, c2), ratioD(c1, c2)))
  }

  private def partialTokenSortD(a: String, b: String): Double =
    partialD(cp(sortJoin(tokens(a))), cp(sortJoin(tokens(b))))

  private def partialTokenSetD(a: String, b: String): Double = {
    val sa = tokens(a).toSet
    val sb = tokens(b).toSet
    if (sa.isEmpty || sb.isEmpty) return 0.0 // same compat branch as tokenSetD
    val (t0, t1, t2) = setStrings(sa, sb)
    val (c0, c1, c2) = (cp(t0), cp(t1), cp(t2))
    math.max(partialD(c0, c1), math.max(partialD(c0, c2), partialD(c1, c2)))
  }

  /** rapidfuzz `default_process`: lowercase, any non-alphanumeric code
    * point → space, trim ends (interior space runs are KEPT — tokenizers
    * split on runs, but plain/partial ratio see them).
    */
  def process(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    s.codePoints().forEach { c =>
      if (Character.isLetterOrDigit(c))
        out.appendCodePoint(Character.toLowerCase(c))
      else out.append(' ')
    }
    out.toString.trim
  }

  /** thefuzz's LEGACY `full_process(force_ascii=True)`: non-ASCII code
    * points are DELETED first (thefuzz `utils.ascii_only` — removal, not
    * transliteration: "Curaçao" → "Curaao"), then the usual
    * lowercase/non-alnum→space/trim. The engine default is the Unicode
    * [[process]] (rapidfuzz ≥ 3 semantics, strictly better for
    * international name data); this exists so reference top-1 rankings can
    * be bit-matched even on accented names (FIXTURES.md §4).
    */
  def processAscii(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    s.codePoints().forEach { c =>
      if (c < 128) {
        if (Character.isLetterOrDigit(c))
          out.appendCodePoint(Character.toLowerCase(c))
        else out.append(' ')
      } // c >= 128: dropped entirely, matching ascii_only
    }
    out.toString.trim
  }

  // -- UTF8String entry points (eval + codegen call targets) --------------

  def partialRatio(a: UTF8String, b: UTF8String): Int =
    Math.rint(partialD(cp(a.toString), cp(b.toString))).toInt

  def tokenSortRatio(a: UTF8String, b: UTF8String): Int =
    Math.rint(tokenSortD(a.toString, b.toString)).toInt

  def tokenSetRatio(a: UTF8String, b: UTF8String): Int =
    Math.rint(tokenSetD(a.toString, b.toString)).toInt

  def partialTokenSortRatio(a: UTF8String, b: UTF8String): Int =
    Math.rint(partialTokenSortD(a.toString, b.toString)).toInt

  def partialTokenSetRatio(a: UTF8String, b: UTF8String): Int =
    Math.rint(partialTokenSetD(a.toString, b.toString)).toInt

  def wratio(a: UTF8String, b: UTF8String): Int =
    wratioProcessed(process(a.toString), process(b.toString))

  /** [[wratio]] under the legacy thefuzz preprocessor — see [[processAscii]]. */
  def wratioAscii(a: UTF8String, b: UTF8String): Int =
    wratioProcessed(processAscii(a.toString), processAscii(b.toString))

  private def wratioProcessed(p1: String, p2: String): Int = {
    val c1 = cp(p1)
    val c2 = cp(p2)
    if (c1.length == 0 || c2.length == 0) return 0
    val lenRatio =
      math.max(c1.length, c2.length).toDouble / math.min(c1.length, c2.length)
    val base = ratioD(c1, c2)
    val res =
      if (lenRatio < 1.5)
        math.max(base, 0.95 * math.max(tokenSortD(p1, p2), tokenSetD(p1, p2)))
      else {
        val ps = if (lenRatio < 8.0) 0.9 else 0.6
        math.max(base, math.max(
          ps * partialD(c1, c2),
          0.95 * ps * math.max(partialTokenSortD(p1, p2), partialTokenSetD(p1, p2))))
      }
    Math.rint(res).toInt
  }
}

/** Shared shape of the four scorer expressions: (string, string) → int,
  * null-safe, codegen = one static call per row.
  */
sealed abstract class FuzzScorerExpr extends BinaryExpression {
  protected def method: String

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got (${l.catalogString}, ${r.catalogString})")
    }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.FuzzScorers.$method($a, $b)")
}

case class PartialRatioExpr(left: Expression, right: Expression)
    extends FuzzScorerExpr {
  override def prettyName: String = "partial_ratio"
  override protected def method: String = "partialRatio"
  override def nullSafeEval(a: Any, b: Any): Any =
    FuzzScorers.partialRatio(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class TokenSortRatioExpr(left: Expression, right: Expression)
    extends FuzzScorerExpr {
  override def prettyName: String = "token_sort_ratio"
  override protected def method: String = "tokenSortRatio"
  override def nullSafeEval(a: Any, b: Any): Any =
    FuzzScorers.tokenSortRatio(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class TokenSetRatioExpr(left: Expression, right: Expression)
    extends FuzzScorerExpr {
  override def prettyName: String = "token_set_ratio"
  override protected def method: String = "tokenSetRatio"
  override def nullSafeEval(a: Any, b: Any): Any =
    FuzzScorers.tokenSetRatio(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class PartialTokenSortRatioExpr(left: Expression, right: Expression)
    extends FuzzScorerExpr {
  override def prettyName: String = "partial_token_sort_ratio"
  override protected def method: String = "partialTokenSortRatio"
  override def nullSafeEval(a: Any, b: Any): Any =
    FuzzScorers.partialTokenSortRatio(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class PartialTokenSetRatioExpr(left: Expression, right: Expression)
    extends FuzzScorerExpr {
  override def prettyName: String = "partial_token_set_ratio"
  override protected def method: String = "partialTokenSetRatio"
  override def nullSafeEval(a: Any, b: Any): Any =
    FuzzScorers.partialTokenSetRatio(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `forceAscii = true` swaps in thefuzz's legacy
  * `full_process(force_ascii=True)` preprocessor (non-ASCII deleted) for
  * bit-parity with reference rankings on accented names; default is
  * rapidfuzz Unicode processing.
  */
case class WRatioExpr(left: Expression, right: Expression,
                      forceAscii: Boolean = false)
    extends FuzzScorerExpr {
  override def prettyName: String = if (forceAscii) "wratio_ascii" else "wratio"
  override protected def method: String = if (forceAscii) "wratioAscii" else "wratio"
  override def nullSafeEval(a: Any, b: Any): Any =
    if (forceAscii)
      FuzzScorers.wratioAscii(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    else
      FuzzScorers.wratio(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object WRatioExpr {
  def partialRatio(a: Column, b: Column): Column =
    bridge.column(PartialRatioExpr(bridge.expression(a), bridge.expression(b)))
  def tokenSortRatio(a: Column, b: Column): Column =
    bridge.column(TokenSortRatioExpr(bridge.expression(a), bridge.expression(b)))
  def tokenSetRatio(a: Column, b: Column): Column =
    bridge.column(TokenSetRatioExpr(bridge.expression(a), bridge.expression(b)))
  def partialTokenSortRatio(a: Column, b: Column): Column =
    bridge.column(PartialTokenSortRatioExpr(bridge.expression(a), bridge.expression(b)))
  def partialTokenSetRatio(a: Column, b: Column): Column =
    bridge.column(PartialTokenSetRatioExpr(bridge.expression(a), bridge.expression(b)))
  def wratio(a: Column, b: Column): Column =
    bridge.column(WRatioExpr(bridge.expression(a), bridge.expression(b)))
  /** Legacy thefuzz parity: `full_process(force_ascii=True)` preprocessing. */
  def wratioAscii(a: Column, b: Column): Column =
    bridge.column(WRatioExpr(bridge.expression(a), bridge.expression(b),
      forceAscii = true))
}
