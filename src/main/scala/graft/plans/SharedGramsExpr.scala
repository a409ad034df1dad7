package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-local base-level survivor filter for
  * [[graft.operators.SpanDedup.maxDuplicatedRun]]'s UNSHARED-ATTRIBUTION
  * promotion: given one document's tokens and the SORTED list of that
  * document's baseLen-grams proven unshared (all global occurrences
  * inside this one document — the `min(id) = max(id)` rows of the global
  * text-keyed count, attributable to exactly one document precisely
  * because they are unshared), emit (position, leaf hash) for every
  * position whose baseLen-gram is NOT in the unshared list — the
  * cross-document duplication candidates that seed the Merkle ladder.
  *
  * Why this shape: the obvious plan explodes a (doc, position, gram)
  * relation and joins it back against the globally-shared gram keys — a
  * second corpus-wide shuffle. Attributing the UNSHARED grams instead
  * (each belongs to one doc, so the partial-aggregated group-by emits
  * them pre-addressed) turns the join into a per-document binary search
  * whose haystack is bounded by the document's own gram count. The
  * membership test compares gram TEXT (same total order as Spark's
  * `sort_array`: UTF8String binary order), so it is EXACT — no hash is
  * involved in deciding survival, and the emitted leaf hash
  * (xxhash64 of the gram text, Catalyst convention, so the general
  * minDocs path can produce identical leaves with the built-in) only
  * feeds the ladder whose collisions the refinement recount corrects.
  */
case class SharedGramsExpr(toks: Expression, baseLen: Expression,
                           unsharedSorted: Expression)
    extends TernaryExpression {

  override def first: Expression = toks
  override def second: Expression = baseLen
  override def third: Expression = unsharedSorted

  private val structType = StructType(Seq(
    StructField("p", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false)))

  override def dataType: DataType =
    ArrayType(structType, containsNull = false)
  override def prettyName: String = "shared_grams"

  override def checkInputDataTypes(): TypeCheckResult =
    (toks.dataType, baseLen.dataType, unsharedSorted.dataType) match {
      case (ArrayType(StringType, _),
            ByteType | ShortType | IntegerType | LongType,
            ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, integral, array<string>), " +
          s"got $other")
    }

  override def nullSafeEval(t: Any, b: Any, u: Any): Any =
    SharedGramsExpr.compute(t.asInstanceOf[ArrayData],
      WindowHashesExpr.toLong(b), u.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, b, u) =>
      s"graft.plans.SharedGramsExpr.compute($t, (long)$b, $u)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(toks = newFirst, baseLen = newSecond, unsharedSorted = newThird)
}

object SharedGramsExpr {

  private val SPACE = UTF8String.fromString(" ")

  /** Static forwarder target for the generated code. `unsharedSorted`
    * must be ascending in UTF8String binary order (what `sort_array`
    * produces); position p is 0-based in `toks`.
    */
  def compute(toks: ArrayData, baseLen: Long, unsharedSorted: ArrayData): ArrayData = {
    val len = toks.numElements()
    val b = math.max(1L, baseLen).toInt
    if (len < b) return new GenericArrayData(Array.empty[Any])
    val ku = unsharedSorted.numElements()
    val u = new Array[UTF8String](ku)
    var i = 0
    while (i < ku) {
      u(i) = unsharedSorted.getUTF8String(i)
      i += 1
    }
    val window = new Array[UTF8String](b)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var p = 0
    while (p <= len - b) {
      var j = 0
      while (j < b) {
        val t = toks.getUTF8String(p + j)
        window(j) = if (t == null) UTF8String.EMPTY_UTF8 else t
        j += 1
      }
      val gram = UTF8String.concatWs(SPACE, window: _*)
      if (java.util.Arrays.binarySearch(u.asInstanceOf[Array[AnyRef]],
          gram.asInstanceOf[AnyRef]) < 0)
        out += new GenericInternalRow(Array[Any](p,
          XXH64.hashUnsafeBytes(gram.getBaseObject, gram.getBaseOffset,
            gram.numBytes(), 42L)))
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point: (p, xxhash64(gram)) pairs of the document's
    * baseLen-grams not present in the ascending `unsharedSorted`.
    */
  def sharedGrams(toks: Column, baseLen: Column,
                  unsharedSorted: Column): Column =
    bridge.column(SharedGramsExpr(bridge.expression(toks),
      bridge.expression(baseLen), bridge.expression(unsharedSorted)))
}
