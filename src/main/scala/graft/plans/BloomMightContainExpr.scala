package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain(longKey)` against a pre-built Bloom filter, as a codegen
  * expression — the map-side prune behind [[graft.ext.BloomJoin]].
  *
  * The filter (Spark's `org.apache.spark.util.sketch.BloomFilter`, the
  * same structure Spark's own runtime row-level filtering injects) is
  * baked into the expression as a reference object: built once
  * driver-side, shipped with the task closure, probed per row with
  * `mightContainLong` — no per-row deserialization, no UDF boxing, and
  * the probe inlines into whole-stage codegen.
  *
  * Semantics: NO false negatives (a true member always passes — this is
  * what makes an exact join downstream of the prune still exact); false
  * positives at the filter's configured fpp (harmless: the downstream
  * exact join drops them). Null input → null (row dropped by a filter,
  * matching semi-join behavior for null keys).
  */
case class BloomMightContainExpr(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key (hash wider types first, e.g. " +
        s"xxhash64), got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainExpr {
  def mightContain(key: Column, bloom: BloomFilter): Column =
    bridge.column(BloomMightContainExpr(bridge.expression(key), bloom))
}
