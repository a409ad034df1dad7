package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Native random-hyperplane LSH signature — the codegen twin of
  * [[graft.functions.VectorFunctions.hyperplaneSignature]].
  *
  * The ±1 hyperplane matrix is DATA-INDEPENDENT (sign of
  * `xxhash64(plane, dim_index)` — evaluated once here, driver-side, via
  * the same Catalyst XxHash64 the column version plans), so it bakes into
  * the expression as a literal and the per-row work collapses to one
  * planes×dim fused multiply-add loop. The HOF composition evaluated
  * `planes` interpreted aggregate/zip_with lambdas per row with O(dim)
  * allocations each.
  *
  * Bit-for-bit parity with the column version, including its edge
  * semantics: each plane's projection folds left-to-right from +0.0, and a
  * NULL vector, null element, or dim mismatch yields signature 0L (the
  * column version's `when(proj >= 0, bit).otherwise(0)` swallows null
  * projections into 0 — kept, because committed goldens hash it).
  *
  * One documented divergence: a vector LONGER than `dim`. This expr
  * returns 0L (dim-mismatch rule above); the column version zip_withs the
  * index side against the longer vector, padding the index with null, and
  * xxhash64's null-field skip can still produce a nonzero projection →
  * nonzero signature. Over-length vectors are malformed input for a
  * fixed-dim signature; 0L (the same bucket all malformed rows share) is
  * the defensible answer, and no registry query feeds mixed-length
  * vectors. ExprPropertySpec pins parity on length == dim only.
  */
case class HyperplaneSignatureExpr(child: Expression, dim: Int, planes: Int)
    extends UnaryExpression {

  require(planes > 0 && planes <= 63, s"planes must be in [1, 63], got $planes")

  // sign(p, i) = +1 if xxhash64(p, i) is even — identical to the column
  // algebra's pmod(xxhash64(lit(p), i), 2) === 0
  private val signs: Array[Double] = {
    val a = new Array[Double](planes * dim)
    for (p <- 0 until planes; i <- 0 until dim) {
      val h = XxHash64(Seq(Literal(p), Literal(i)), 42L)
        .eval(InternalRow.empty).asInstanceOf[Long]
      a(p * dim + i) = if (math.floorMod(h, 2L) == 0L) 1.0 else -1.0
    }
    a
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false // malformed input → 0L, never null
  override def prettyName: String = "hyperplane_signature"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> or array<double> column, " +
        s"got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    HyperplaneSignatureExpr.signature(
      v.asInstanceOf[ArrayData], signs, dim, planes, isFloat)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val signsRef = ctx.addReferenceObj("signs", signs, "double[]")
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          ${ev.value} = graft.plans.HyperplaneSignatureExpr.signature(
            ${childGen.value}, $signsRef, $dim, $planes, $isFloat);
        }
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignatureExpr {
  /** Shared eval/codegen kernel: one fused planes×dim loop. Null element or
    * dim mismatch → 0L (null projection folds to an unset bit on every
    * plane in the column algebra).
    */
  def signature(v: ArrayData, signs: Array[Double], dim: Int, planes: Int,
                isFloat: Boolean): Long = {
    if (v.numElements() != dim) return 0L
    var sig = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var i = 0
      while (i < dim) {
        if (v.isNullAt(i)) return 0L
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        proj += x * signs(p * dim + i)
        i += 1
      }
      if (proj >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Column-API entry point (mirrors
    * `VectorFunctions.hyperplaneSignature(vec, dim, planes)`).
    */
  def signature(vec: Column, dim: Int, planes: Int): Column =
    bridge.column(HyperplaneSignatureExpr(bridge.expression(vec), dim, planes))
}
