package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Overlapping character n-grams of a string as ONE fused per-row loop —
  * the lang-id featurizer's hot path
  * ([[graft.operators.HashedLinearScorer.charNgramTokens]]).
  *
  * What it replaces, and why (round-13 adjudication: t37 cost 99 s min /
  * 453 s max on a 1.5 MB corpus): the HOF composition
  * `transform(sequence(1, length(t)-n+1), i -> t.substr(i, n))` evaluates
  * an INTERPRETED lambda per character position, and the lambda body's
  * `t` subtree — the full `lower(regexp_replace(...))` normalization
  * chain — is re-evaluated PER ELEMENT: O(L²) regex work per document.
  * Here the (already normalized) child column is evaluated ONCE per row
  * and the grams are byte slices over one precomputed code-point
  * boundary scan: O(L·n) with zero regex in the loop.
  *
  * Semantics are bit-identical to the old composition: windows advance
  * one CODE POINT at a time and span `n` code points (Spark's `length`/
  * `substr` both count code points, as does this boundary scan), a
  * string shorter than `n` code points yields an EMPTY array, and null
  * input yields null (the old `when(...).otherwise(array())` produced an
  * empty array for null input — both forms are dropped identically by
  * the `size(...) > 0` feature guard every consumer applies).
  */
case class CharNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram length must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharNgramsExpr.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharNgramsExpr.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgramsExpr {

  /** Static forwarder target for the generated code: one boundary scan,
    * then each gram is a slice of the row's (immutable) byte copy —
    * `getBytes` copies exactly when the input aliases a shared buffer,
    * so the emitted strings are safe to retain past this row.
    */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val total = bytes.length
    // code-point start offsets (starts(c) = byte offset of code point c)
    val starts = new Array[Int](s.numChars + 1)
    var i = 0
    var c = 0
    while (i < total) {
      starts(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    starts(c) = total
    if (c < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](c - n + 1)
    var p = 0
    while (p + n <= c) {
      out(p) = UTF8String.fromBytes(bytes, starts(p), starts(p + n) - starts(p))
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point: `text` should already be normalized — the
    * whole point is that the (possibly expensive) child evaluates once.
    */
  def charNgrams(text: Column, n: Int): Column =
    bridge.column(CharNgramsExpr(bridge.expression(text), n))
}
