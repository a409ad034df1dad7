package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** MinHash signature of a document's hashed-shingle ARRAY, computed in one
  * per-row loop — BIT-IDENTICAL to the aggregate form it replaces
  * ([[graft.ext.NearDup.minhashSignatures]]: `__h = xxhash64(shingle)`
  * once, then `min(xxhash64(lit(i), __h))` per hash function over the
  * exploded relation; Spark's XxHash64 chains children, so entry i is
  * `XXH64.hashLong(XXH64.hashLong(shingle, 42), XXH64.hashInt(i, 42))`
  * and the per-function seeds are precomputed once).
  *
  * Why per-row: the aggregate form had to EXPLODE the shingle array and
  * shuffle (id, shingle) rows into a groupBy to re-assemble per-document
  * minima — but the shingles were born per-document
  * ([[HashedShinglesExpr]]), so the whole signature is a row-local fold
  * and the exchange was pure overhead. With this expression, signature
  * construction (and therefore LSH band-bucketing and index builds) is
  * entirely map-side: the FIRST shuffle in the near-dup pipeline is the
  * candidate bucket group-by, which is also the first step that genuinely
  * needs cross-document data.
  *
  * An empty input array (cannot arise from [[HashedShinglesExpr]], which
  * emits at least the whole-text shingle) yields Long.MaxValue entries —
  * the aggregate form would emit no row at all, so callers must not feed
  * synthetic empty arrays.
  */
case class MinHashSignatureExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 1024, s"signature width must be in [1,1024], got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> (hashed shingles), got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSignatureExpr.compute(input.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MinHashSignatureExpr.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignatureExpr {
  // per-width seed vectors: seeds(i) = XXH64.hashInt(i, 42) — what Spark's
  // two-child xxhash64(lit(i), h) uses as the running hash before h
  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  private def seeds(k: Int): Array[Long] =
    seedCache.computeIfAbsent(k, kk => Array.tabulate(kk)(i => XXH64.hashInt(i, 42L)))

  /** Static forwarder target for the generated code: k running minima over
    * one pass of the shingle hashes.
    */
  def compute(hashes: ArrayData, k: Int): ArrayData = {
    val s = seeds(k)
    val mins = Array.fill(k)(Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      // the aggregate form's base projection: __h = xxhash64(shingle)
      val h = XXH64.hashLong(hashes.getLong(i), 42L)
      var j = 0
      while (j < k) {
        val v = XXH64.hashLong(h, s(j))
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    ArrayData.toArrayData(mins)
  }

  /** Column-API entry point: `hashes` is the per-document hashed-shingle
    * array ([[HashedShinglesExpr]] output).
    */
  def minhashSignature(hashes: Column, k: Int): Column =
    bridge.column(MinHashSignatureExpr(bridge.expression(hashes), k))
}
