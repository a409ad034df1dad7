package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Rolling window hashes for multi-length duplicated-span detection
  * ([[graft.operators.SpanDedup.maxDuplicatedRun]]'s refinement): for a
  * token array and a 0-based start position, emit the chained hash of
  * every window `[start, start+m)` for m = 1 … maxLen in ONE O(maxLen)
  * loop — `h_m = xxh64(token_{start+m}, seed = h_{m−1})`.
  *
  * Why an Expression: the HOF form (`aggregate` growing an array with
  * `concat(acc, array(h))`) allocates a fresh copy of the accumulator
  * per element — O(maxLen²) interpreted work per position, which
  * dominated the d18 bench (~15 s at sf0.1). This emits one primitive
  * long array with zero per-element allocation and stays inside
  * whole-stage codegen. Equal windows (same token sequence) always get
  * equal hashes; a collision is harmless by construction — the caller's
  * exact (hash, text) recount decides truth.
  */
case class WindowHashesExpr(toks: Expression, start: Expression,
                            maxLen: Expression)
    extends TernaryExpression {

  override def first: Expression = toks
  override def second: Expression = start
  override def third: Expression = maxLen

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean =
    toks.nullable || start.nullable || maxLen.nullable
  override def prettyName: String = "window_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    (toks.dataType, start.dataType, maxLen.dataType) match {
      case (ArrayType(StringType, _),
            ByteType | ShortType | IntegerType | LongType,
            ByteType | ShortType | IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, integral, integral), got $other")
    }

  override def nullSafeEval(t: Any, s: Any, m: Any): Any =
    WindowHashesExpr.compute(t.asInstanceOf[ArrayData],
      WindowHashesExpr.toLong(s), WindowHashesExpr.toLong(m))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s, m) =>
      s"graft.plans.WindowHashesExpr.compute($t, (long)$s, (long)$m)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(toks = newFirst, start = newSecond, maxLen = newThird)
}

object WindowHashesExpr {

  private[plans] def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  /** Static forwarder target for the generated code. */
  def compute(toks: ArrayData, start: Long, maxLen: Long): ArrayData = {
    val n = toks.numElements()
    val m = math.min(maxLen, n - start)
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m.toInt)
    var h = 0L
    var i = 0
    while (i < m) {
      val t = toks.getUTF8String((start + i).toInt)
      h = if (t == null) XXH64.hashLong(-1L, h)
          else XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
            t.numBytes(), h)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point: hashes of windows [start, start+1) …
    * [start, start+maxLen) — 0-based start, one array per row.
    */
  def windowHashes(toks: Column, start: Column, maxLen: Column): Column =
    bridge.column(WindowHashesExpr(bridge.expression(toks),
      bridge.expression(start), bridge.expression(maxLen)))
}
