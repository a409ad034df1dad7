package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Hashed-feature BUCKET COUNTS of a token array, as one fused per-row
  * loop: each token's [[RollingHashExpr]] mod `buckets` bucket,
  * aggregated to sorted `(__b, __c)` pairs WITHIN the row — the sparse
  * per-document count vector every hashed bag-of-features consumer
  * ([[graft.operators.HashedLinearScorer]]) builds.
  *
  * What it replaces (the same move as [[HashedShinglesExpr]], round-13
  * adjudication): `explode(tokens) → pmod(rolling_hash(tok), B) →
  * groupBy(doc, bucket).count → groupBy(doc).collect_list` — an L-row
  * fan-out plus TWO aggregations per moment pass, where the counts are
  * per-document state that never needed to leave the row. With this
  * expression the whole featurize→count stage is a projection inside the
  * corpus scan: zero exchanges, and at 100 TB the shuffle a training
  * pass pays is ONLY the ≤ (B+1)² Gram-cell fold.
  *
  * Counts are exact (no hashing tricks beyond the bucket hash itself)
  * and emitted in ascending bucket order, so the output is deterministic
  * under any partitioning — stronger than the `collect_list` it replaces
  * (whose order was nondeterministic; downstream sums never cared).
  * Null tokens inside the array are skipped defensively (the featurizers
  * never produce them — `split` / [[CharNgramsExpr]] output). Empty
  * array → empty array; null array → null.
  */
case class BucketCountsExpr(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets >= 1, s"buckets must be >= 1, got $buckets")

  private val structType = StructType(Seq(
    StructField("__b", IntegerType, nullable = false),
    StructField("__c", LongType, nullable = false)))

  override def dataType: DataType =
    ArrayType(structType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bucket_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> (tokens), got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    BucketCountsExpr.compute(input.asInstanceOf[ArrayData], buckets)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BucketCountsExpr.compute($c, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BucketCountsExpr {

  /** Dense-array counting up to this many buckets (64 KiB of longs per
    * row, freed immediately); larger spaces fall back to a hash map so a
    * huge `buckets` can never allocate proportional per-row memory.
    */
  private final val DenseMax = 8192

  /** Static forwarder target for the generated code. */
  def compute(tokens: ArrayData, buckets: Int): ArrayData = {
    val k = tokens.numElements()
    if (k == 0) return new GenericArrayData(Array.empty[Any])
    if (buckets <= DenseMax) {
      val counts = new Array[Long](buckets)
      var i = 0
      while (i < k) {
        if (!tokens.isNullAt(i)) {
          val b = (RollingHashExpr.hash(tokens.getUTF8String(i)) % buckets).toInt
          counts(b) += 1L
        }
        i += 1
      }
      var nonZero = 0
      var b = 0
      while (b < buckets) { if (counts(b) != 0L) nonZero += 1; b += 1 }
      val out = new Array[Any](nonZero)
      var o = 0
      b = 0
      while (b < buckets) {
        if (counts(b) != 0L) {
          out(o) = new GenericInternalRow(Array[Any](b, counts(b)))
          o += 1
        }
        b += 1
      }
      new GenericArrayData(out)
    } else {
      val counts = new java.util.TreeMap[Integer, Long]()
      var i = 0
      while (i < k) {
        if (!tokens.isNullAt(i)) {
          val b = (RollingHashExpr.hash(tokens.getUTF8String(i)) % buckets).toInt
          counts.merge(b, 1L, (a, x) => a + x)
        }
        i += 1
      }
      val out = new Array[Any](counts.size)
      var o = 0
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        out(o) = new GenericInternalRow(Array[Any](e.getKey.intValue(), e.getValue))
        o += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Column-API entry point: sorted (__b, __c) bucket counts of `tokens`
    * under the rolling-hash mod-`buckets` feature map.
    */
  def bucketCounts(tokens: Column, buckets: Int): Column =
    bridge.column(BucketCountsExpr(bridge.expression(tokens), buckets))
}
