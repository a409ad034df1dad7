package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Morton (Z-order) bit interleaving of 2–4 int columns into one long —
  * the multi-dimensional clustering key behind Z-ordered data layout.
  * Each input is clamped to [0, 65535] (a 16-bit grid cell per dimension)
  * and their bits are interleaved most-significant-first, so longs that
  * are close numerically are close in EVERY dimension: range-sorting by
  * the code gives each parquet file a tight min/max envelope on all the
  * interleaved columns at once, which is what makes multi-column
  * predicate pruning work after [[graft.sources.Zorder]] rewrites a table.
  *
  * Pure integer bit algebra per row: codegen'd via a static kernel, no
  * allocation, null if any input is null.
  */
case class InterleaveBitsExpr(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "interleave_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2 || children.size > 4)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName takes 2 to 4 int columns, got ${children.size}")
    else if (!children.forall(_.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires int columns, got " +
          children.map(_.dataType.catalogString).mkString(", "))
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val n = children.size
    var packed = 0L
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      packed |= (InterleaveBitsExpr.clamp16(v.asInstanceOf[Int]).toLong & 0xffffL) << (16 * i)
      i += 1
    }
    InterleaveBitsExpr.interleavePacked(packed, n)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val gens = children.map(_.genCode(ctx))
    val anyNull = gens.map(_.isNull.toString).mkString(" || ")
    val pack = gens.zipWithIndex.map { case (g, i) =>
      s"(((long) graft.plans.InterleaveBitsExpr.clamp16(${g.value}) & 0xffffL) << ${16 * i})"
    }.mkString(" | ")
    ev.copy(code = code"""
      ${gens.map(_.code).reduce(_ + _)}
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        ${ev.value} = graft.plans.InterleaveBitsExpr.interleavePacked(
          $pack, ${children.size});
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object InterleaveBitsExpr {

  def clamp16(v: Int): Int = if (v < 0) 0 else if (v > 0xffff) 0xffff else v

  /** Kernel shared by eval and codegen: `packed` carries the n clamped
    * 16-bit values at bit offsets 0/16/32/48; emit them interleaved,
    * highest value-bit first so the code sorts like the tuple of values.
    */
  def interleavePacked(packed: Long, n: Int): Long = {
    var out = 0L
    var bit = 15
    while (bit >= 0) {
      var d = 0
      while (d < n) {
        out = (out << 1) | ((packed >>> (16 * d + bit)) & 1L)
        d += 1
      }
      bit -= 1
    }
    out
  }

  /** Column-API entry point: the Z-order code of 2–4 int columns. */
  def zorderCode(cols: Column*): Column =
    bridge.column(InterleaveBitsExpr(cols.map(bridge.expression)))
}
