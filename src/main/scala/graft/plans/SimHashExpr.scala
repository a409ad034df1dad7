package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** 64-bit SimHash of a tokenized document in one per-row loop —
  * BIT-IDENTICAL to the aggregate form it replaces (explode the tokens,
  * `sum(when(xxhash64(tok) & bit, 1, -1))` per bit, reassemble): per token
  * the xxhash64 (seed 42, Spark's) updates 64 counters ±1; bit b of the
  * signature is set iff counter b ends non-negative.
  *
  * Why per-row: the aggregate form exploded every token into its own row
  * and shuffled 64 partial sums per document through a groupBy — but the
  * token multiset is per document, so the whole signature is a row-local
  * fold and the explode + exchange were pure overhead (same argument as
  * [[HashedShinglesExpr]]/[[MinHashSignatureExpr]]; integer sums are
  * order-independent, so determinism is unchanged — the d04/d05 goldens
  * pin it). Empty documents tokenize to a single empty string, which
  * hashes and contributes like any token — identical to the exploded form.
  * A null ELEMENT contributes as hash value 42 (Spark's xxhash64 skips
  * null inputs and returns the seed) — no NPE on arrays with
  * containsNull=true, and bit-identity with the aggregate form holds
  * there too.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> (tokenized words), got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHashExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashExpr {

  /** Static forwarder target for the generated code. */
  def compute(words: ArrayData): Long = {
    val sums = new Array[Int](64)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      // aggregate-form parity: Spark's xxhash64 SKIPS null inputs and
      // returns the seed, so a null token contributes exactly as hash
      // value 42 — not an NPE, not a blanket -1
      val h = if (w == null) 42L
        else XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Column-API entry point: `words` is the tokenized (split) text. */
  def simhash(words: Column): Column =
    bridge.column(SimHashExpr(bridge.expression(words)))
}
