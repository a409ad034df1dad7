package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Row-local LADDER survivor filter for
  * [[graft.operators.SpanDedup.maxDuplicatedRun]] — the same
  * unshared-attribution step as [[SharedGramsExpr]], one rung up: given
  * one document's Merkle ladder entries (p, n, k) from
  * [[MerkleLevelsExpr]] and the SORTED list of that document's packed
  * count keys proven unshared by the global count (min(id) = max(id) ⇒
  * attributable to exactly this document), emit the (position, level)
  * pairs whose key is NOT in the list — the levels that globally
  * survived, which bound the refinement fan-out (np). Replaces a
  * join-back that would re-shuffle the whole ladder relation by key with
  * one binary search per entry against a per-document-bounded haystack.
  * A packed-key collision can only move an entry from unshared to shared
  * (two documents' different windows colliding makes min ≠ max), i.e.
  * only OVER-approximates np — refinement recounts exactly.
  */
case class FilterPackedExpr(entries: Expression, unsharedSorted: Expression)
    extends BinaryExpression {

  override def left: Expression = entries
  override def right: Expression = unsharedSorted

  private val structType = StructType(Seq(
    StructField("p", IntegerType, nullable = false),
    StructField("n", IntegerType, nullable = false)))

  override def dataType: DataType =
    ArrayType(structType, containsNull = false)
  override def prettyName: String = "filter_packed"

  override def checkInputDataTypes(): TypeCheckResult =
    (entries.dataType, unsharedSorted.dataType) match {
      case (ArrayType(StructType(fs), _), ArrayType(LongType, _))
          if fs.length == 3 && fs(0).dataType == IntegerType &&
            fs(1).dataType == IntegerType && fs(2).dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<struct<p:int,n:int,k:long>>, " +
          s"array<long>), got $other")
    }

  override def nullSafeEval(e: Any, u: Any): Any =
    FilterPackedExpr.compute(e.asInstanceOf[ArrayData],
      u.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, u) =>
      s"graft.plans.FilterPackedExpr.compute($e, $u)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(entries = newLeft, unsharedSorted = newRight)
}

object FilterPackedExpr {

  /** Static forwarder target for the generated code. `unsharedSorted`
    * must be ascending (the caller sorts once per row).
    */
  def compute(entries: ArrayData, unsharedSorted: ArrayData): ArrayData = {
    val ke = entries.numElements()
    if (ke == 0) return new GenericArrayData(Array.empty[Any])
    val u = unsharedSorted.toLongArray()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < ke) {
      val row = entries.getStruct(i, 3)
      if (java.util.Arrays.binarySearch(u, row.getLong(2)) < 0)
        out += new GenericInternalRow(
          Array[Any](row.getInt(0), row.getInt(1)))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point: (p, n) pairs of ladder entries whose packed
    * key is not in the ascending `unsharedSorted`.
    */
  def filterPacked(entries: Column, unsharedSorted: Column): Column =
    bridge.column(FilterPackedExpr(bridge.expression(entries),
      bridge.expression(unsharedSorted)))
}
