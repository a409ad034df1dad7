package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Branch-free quantile binning: the index of the first cutoff GREATER
  * than the value (`numpy.searchsorted(cutoffs, v, side='right')`), i.e.
  * the cell of `v` in the piecewise grid the sorted `cutoffs` describe —
  * 0 below the first cutoff, `cutoffs.length` at/above the last.
  *
  * The codegen'd binary-search kernel replaces what would otherwise be a
  * 256-arm `when` chain (quadratic codegen size) or an interpreted
  * `aggregate` HOF fold (CodegenFallback in the hot path): O(log n)
  * comparisons per row against a shared broadcast-referenced array.
  * Null → null. Used by [[graft.sources.Zorder]] to grid-cell each
  * clustering column by its own quantiles before bit interleaving.
  */
case class SearchSortedExpr(child: Expression, cutoffs: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "search_sorted"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double column, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SearchSortedExpr.search(cutoffs, input.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cutoffs", cutoffs, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.SearchSortedExpr.search($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SearchSortedExpr {

  /** First index with cutoffs(i) > v (right-side searchsorted). */
  def search(cutoffs: Array[Double], v: Double): Int = {
    var lo = 0
    var hi = cutoffs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cutoffs(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Column-API entry point: quantile cell of `c` under sorted `cutoffs`. */
  def searchSorted(c: Column, cutoffs: Array[Double]): Column =
    bridge.column(SearchSortedExpr(bridge.expression(c.cast("double")), cutoffs))
}
