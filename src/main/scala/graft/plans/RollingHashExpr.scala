package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash over a string column:
  * `acc_i = (acc_{i-1} * 31 + codepoint_i) mod 1e9+7`, acc_0 = 0 — the
  * document fingerprint primitive (pure arithmetic, reproducible on any
  * engine; the DuckDB oracle replays the identical fold).
  *
  * Semantics match the SQL composition it replaces —
  * `aggregate(sequence(1, length(s)), 0L, (acc, i) -> (acc*31 +
  * ascii(substr(s, i, 1))) % 1000000007)` — which evaluated an interpreted
  * lambda and allocated a one-character substring PER CHARACTER. This is
  * one code-point loop per row (`ascii` of a 1-char substring IS its code
  * point; surrogate pairs count one "character" in both `substr` and this
  * loop). Empty string → 0, null → null.
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    RollingHashExpr.hash(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RollingHashExpr.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHashExpr {
  private final val Mod = 1000000007L

  /** Static forwarder target for the generated code: one pass over the
    * string's code points, no per-character allocations.
    */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** Column-API entry point. */
  def rollingHash(c: Column): Column =
    bridge.column(RollingHashExpr(bridge.expression(c)))
}
