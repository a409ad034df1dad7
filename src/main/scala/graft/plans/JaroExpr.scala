package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro similarity as a native codegen expression — the third fuzzy
  * scorer next to normalized Levenshtein ([[graft.operators.FuzzyJoin
  * .similarityRatio]]) and thefuzz-parity Indel ratio
  * ([[IndelRatioExpr]]). Jaro weights matches by POSITION (a bounded
  * matching window of max(|a|,|b|)/2 − 1) rather than by edit script,
  * which is why record-linkage systems prefer it for short name fields.
  *
  * Standard textbook definition, no Winkler prefix bonus (the bonus has
  * engine-divergent boost-threshold conventions; plain Jaro is
  * convention-free, so DuckDB's `jaro_similarity` replays it exactly and
  * the q47 oracle is a full hash check — compose the Winkler bonus in
  * column algebra if needed: `j + l·0.1·(1−j)`):
  *
  *   jaro = (m/|a| + m/|b| + (m−t)/m) / 3
  *
  * with m = in-window matches (each char consumed once, greedy
  * left-to-right — the standard algorithm) and t = half the number of
  * matched characters whose match order differs. m = 0 → 0.0; both empty
  * → 1.0. Code points, not UTF-16 units. O(|a|·|b|) worst case (window
  * scan), O(|a|+|b|) extra space.
  */
case class JaroExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_similarity"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroExpr.jaro(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.JaroExpr.jaro($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroExpr {

  def jaro(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString.codePoints().toArray
    val t = b.toString.codePoints().toArray
    if (s.length == 0 && t.length == 0) return 1.0
    if (s.length == 0 || t.length == 0) return 0.0
    val window = math.max(0, math.max(s.length, t.length) / 2 - 1)
    val sMatch = new Array[Boolean](s.length)
    val tMatch = new Array[Boolean](t.length)
    var m = 0
    var i = 0
    while (i < s.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(t.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk matched chars of both sides in order
    var trans = 0
    var j = 0
    i = 0
    while (i < s.length) {
      if (sMatch(i)) {
        while (!tMatch(j)) j += 1
        if (s(i) != t(j)) trans += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / s.length + md / t.length + (md - trans / 2) / md) / 3.0
  }

  /** Column-API entry point. */
  def jaroSimilarity(a: Column, b: Column): Column =
    bridge.column(JaroExpr(bridge.expression(a), bridge.expression(b)))
}
