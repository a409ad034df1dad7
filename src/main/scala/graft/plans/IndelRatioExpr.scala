package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** thefuzz/rapidfuzz `fuzz.ratio` parity as a native codegen expression
  * (reference: dw-etl `himalayan_etl/ops/transform.py:55` matches CITIZEN
  * strings with `fuzzywuzzy.process.extractOne`; its pyproject pins
  * `thefuzz[speedup]`, whose `fuzz.ratio` is rapidfuzz's Indel
  * normalized similarity, NOT plain Levenshtein).
  *
  * Definition (public rapidfuzz semantics):
  *
  *   ratio(a, b) = round(100 · (1 − indel(a, b) / (|a| + |b|)))
  *
  * where `indel` is the edit distance with insert/delete cost 1 and NO
  * substitution — equivalently `|a| + |b| − 2·LCS(a, b)` — and `round` is
  * Python's built-in (half-to-even, `Math.rint` here; thefuzz wraps the
  * float score in `int(round(...))`). Both empty → 100, one empty → 0,
  * matching rapidfuzz. This differs from [[graft.operators.FuzzyJoin
  * .similarityRatio]] (normalized Levenshtein, where a substitution costs
  * 1): e.g. ratio("abcd","bcde") = 75 here but 1−2/4 = 0.5 → 50 on the
  * Levenshtein scale, and top-1 picks can genuinely differ on
  * token-multiset cases — FunctionsSpec pins documented thefuzz outputs.
  *
  * Strings are compared as Unicode CODE POINTS (rapidfuzz iterates code
  * points, so astral-plane symbols count once, not as surrogate pairs).
  * No preprocessing: thefuzz's `full_process` (lowercase, strip
  * non-alphanumeric) is a separate concern — compose with `lower` /
  * `regexp_replace` columns when reference parity needs it.
  *
  * Cost: O(|a|·|b|) two-row DP per pair — the same asymptotics as Spark's
  * built-in `levenshtein`, fine for the short-key × small-candidate-set
  * joins it serves (FuzzyJoin broadcasts the candidate side). The codegen
  * path emits one static call per row (the DP is not worth inlining into
  * generated Java); no boxing, stays inside whole-stage codegen.
  */
case class IndelRatioExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "fuzz_ratio"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    IndelRatioExpr.ratio(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.IndelRatioExpr.ratio($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IndelRatioExpr {

  /** 0..100 integer score; see class doc for the exact contract. */
  def ratio(a: UTF8String, b: UTF8String): Int = {
    val s = a.toString.codePoints().toArray
    val t = b.toString.codePoints().toArray
    val n = s.length + t.length
    if (n == 0) return 100
    val sim = 200.0 * lcs(s, t) / n
    Math.rint(sim).toInt // Python round(): half-to-even
  }

  /** Classic two-row LCS DP over code points. */
  private def lcs(s: Array[Int], t: Array[Int]): Int = {
    if (s.length == 0 || t.length == 0) return 0
    // iterate the longer string outer, keep the DP row on the shorter
    val (outer, inner) = if (s.length >= t.length) (s, t) else (t, s)
    val row = new Array[Int](inner.length + 1)
    var i = 0
    while (i < outer.length) {
      var prevDiag = 0 // row(j-1) from the previous iteration of i
      var j = 0
      while (j < inner.length) {
        val tmp = row(j + 1)
        row(j + 1) =
          if (outer(i) == inner(j)) prevDiag + 1
          else math.max(row(j + 1), row(j))
        prevDiag = tmp
        j += 1
      }
      i += 1
    }
    row(inner.length)
  }

  /** Column-API entry point. */
  def fuzzRatio(a: Column, b: Column): Column =
    bridge.column(IndelRatioExpr(bridge.expression(a), bridge.expression(b)))
}
