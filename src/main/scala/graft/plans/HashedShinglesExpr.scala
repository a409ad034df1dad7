package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DISTINCT hashed word n-gram shingles of a tokenized document, as one
  * fused per-row loop: for each window of `n` consecutive words, the
  * xxhash64 (seed 42 — BIT-IDENTICAL to Spark's `xxhash64(concat_ws(" ",
  * gram))`, so indexes built by either path interoperate) of the
  * space-joined gram, deduplicated WITHIN the row.
  *
  * What it replaces, and why it's the hot-path form (round-8 probe: the
  * shingle stage was ~50 % of d03's wall time at sf0.1):
  *   - the `transform(sequence(...), concat_ws(element_at...))` HOF chain
  *     materialized every gram as a string and evaluated an interpreted
  *     lambda per element — here each gram is concatenated once into a
  *     reused UTF8String and hashed immediately, nothing survives the loop
  *     but 8-byte hashes;
  *   - the global `.distinct()` after the explode was a full shuffle of
  *     every (id, shingle) row — shingle sets are PER DOCUMENT, so the
  *     dedup belongs inside the row, and the exchange disappears from
  *     every consumer (candidate generation, verification, index build).
  * Per-row dedup is by HASH where the old path deduped by string — results
  * differ only on a 64-bit collision inside one document (~1e-11 at corpus
  * scale), the same tolerance every hashed-shingle consumer already
  * documents.
  *
  * Documents shorter than `n` words collapse to ONE whole-text shingle
  * (hash of all words space-joined), matching [[graft.ext.NearDup
  * .shingles]]. Null input → null; word arrays contain no nulls by
  * construction (`split` output).
  */
case class HashedShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hashed_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> (tokenized words), got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    HashedShinglesExpr.compute(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HashedShinglesExpr.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedShinglesExpr {
  private val space = UTF8String.fromString(" ")

  private def xxh64(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  /** Static forwarder target for the generated code: one pass over the
    * word windows, per-row hash dedup, no string survives the loop.
    */
  def compute(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    if (len < n) {
      val all = new Array[UTF8String](len)
      var i = 0
      while (i < len) { all(i) = words.getUTF8String(i); i += 1 }
      ArrayData.toArrayData(Array(xxh64(UTF8String.concatWs(space, all: _*))))
    } else {
      val seen = new java.util.HashSet[java.lang.Long](Math.max(16, (len - n + 1) * 2))
      val out = new Array[Long](len - n + 1)
      var outLen = 0
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i <= len - n) {
        var k = 0
        while (k < n) { parts(k) = words.getUTF8String(i + k); k += 1 }
        val h = xxh64(UTF8String.concatWs(space, parts: _*))
        if (seen.add(h)) { out(outLen) = h; outLen += 1 }
        i += 1
      }
      ArrayData.toArrayData(java.util.Arrays.copyOf(out, outLen))
    }
  }

  /** Column-API entry point: `words` is the tokenized (split) text. */
  def hashedShingles(words: Column, n: Int): Column =
    bridge.column(HashedShinglesExpr(bridge.expression(words), n))
}
