package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer
import scala.collection.mutable

/** KMV (k-minimum-values) distinct-count sketch as a custom
  * `TypedImperativeAggregate`, plus scalar expressions for its set
  * algebra — the mergeable-sketch layer a 100 TB profiling path needs
  * beyond `approx_count_distinct`:
  *
  *   - [[KmvSketch.sketch]]: per-group sketch (binary, ≤ 8k+8 bytes);
  *   - [[KmvSketch.estimate]]: distinct estimate from a sketch;
  *   - [[KmvSketch.merge]]: sketch of the UNION of two groups — the
  *     algebra HLL lacks an inverse for is trivial here, and
  *     `kmin(A ∪ B) = kmin(kmin(A) ∪ kmin(B))` makes merge LOSSLESS;
  *   - [[KmvSketch.intersectEstimate]]: |A ∩ B| via the standard KMV
  *     inclusion estimator (fraction of the union sketch's values that
  *     occur in both, scaled by the union estimate).
  *
  * Estimator: with τ = k-th smallest of the hashed values mapped to
  * [0,1), E[distinct] = (k−1)/τ; below k uniques the sketch is EXACT.
  * Relative standard error ≈ 1/√(k−2) (~6 % at k=256).
  *
  * Determinism: the k smallest unique hashes of a multiset are
  * order-independent, so sketch bytes are identical under any
  * partitioning — these queries sit behind the golden-parquet net.
  * Memory: the buffer is bounded at k longs per group on every executor;
  * shuffles carry ≤ 8k+8 bytes per group (k=256 → 2 KiB).
  */
object KmvSketch {

  private[plans] val unsignedOrdering: Ordering[Long] =
    (a: Long, b: Long) => java.lang.Long.compareUnsigned(a, b)

  private[plans] def hashValue(v: Any): Long = v match {
    case l: Long        => XXH64.hashLong(l, 42L)
    case i: Int         => XXH64.hashInt(i, 42L)
    case s: UTF8String  => XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
    case d: Double      => XXH64.hashLong(java.lang.Double.doubleToLongBits(d), 42L)
    case f: Float       => XXH64.hashInt(java.lang.Float.floatToIntBits(f), 42L)
    case b: Boolean     => XXH64.hashInt(if (b) 1 else 0, 42L)
    case s: Short       => XXH64.hashInt(s.toInt, 42L)
    case b: Byte        => XXH64.hashInt(b.toInt, 42L)
    case d: org.apache.spark.sql.types.Decimal => XXH64.hashLong(d.toJavaBigDecimal.hashCode().toLong, 42L)
    case other => throw new IllegalArgumentException(
      s"kmv_sketch: unsupported value class ${other.getClass.getName}")
  }

  /** Binary layout: int k, int m, then m sorted (unsigned asc) longs. */
  private[plans] def pack(k: Int, values: Array[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + values.length * 8)
    buf.putInt(k).putInt(values.length)
    values.foreach(buf.putLong)
    buf.array()
  }

  private[plans] def unpack(bytes: Array[Byte]): (Int, Array[Long]) = {
    val buf = ByteBuffer.wrap(bytes)
    val k = buf.getInt(); val m = buf.getInt()
    val values = Array.fill(m)(buf.getLong())
    (k, values)
  }

  /** Map an unsigned 64-bit hash to [0, 1). */
  private def toUnit(h: Long): Double = {
    val d = if (h >= 0) h.toDouble else h.toDouble + 1.8446744073709552e19
    d / 1.8446744073709552e19
  }

  private[plans] def estimateFrom(k: Int, values: Array[Long]): Double =
    if (values.length < k) values.length.toDouble
    else (k - 1).toDouble / toUnit(values.last)

  private[plans] def mergeArrays(k: Int, a: Array[Long], b: Array[Long]): Array[Long] = {
    val set = mutable.TreeSet.empty[Long](unsignedOrdering)
    a.foreach(set.add); b.foreach(set.add)
    set.take(k).toArray
  }

  def sketch(c: Column, k: Int): Column =
    bridge.column(KmvSketchAgg(bridge.expression(c), k).toAggregateExpression())

  def estimate(c: Column): Column = bridge.column(KmvEstimateExpr(bridge.expression(c)))

  def merge(a: Column, b: Column): Column =
    bridge.column(KmvMergeExpr(bridge.expression(a), bridge.expression(b)))

  /** AGGREGATE union of many sketches — what folds per-fragment sketches
    * of a continuous distinct-count view back into one per key. KMV union
    * is exact: the k smallest hashes of A ∪ B are computable from the two
    * k-smallest sets, so merge-of-sketches ≡ sketch-of-union bit-for-bit
    * (the additivity that makes sketch fragments protocol-foldable).
    */
  def mergeAgg(c: Column): Column =
    bridge.column(KmvMergeAgg(bridge.expression(c)).toAggregateExpression())

  def intersectEstimate(a: Column, b: Column): Column =
    bridge.column(KmvIntersectExpr(bridge.expression(a), bridge.expression(b)))
}

/** The aggregate: buffer = k smallest unique hashes (unsigned order). */
case class KmvSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k >= 16 && k <= 65536, s"kmv_sketch k must be in [16, 65536], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  // hashValue dispatches on the runtime class, so an unsupported child type
  // (binary, array, struct, map) would otherwise pass analysis and throw
  // per-row at execution. Reject at analysis instead. Date/timestamp are
  // admitted because their internal representations (Int days / Long
  // micros) hit the Int/Long hash cases.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType | DoubleType | FloatType |
         BooleanType | ShortType | ByteType | DateType | TimestampType |
         TimestampNTZType | _: DecimalType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an atomic orderable column " +
        s"(integral, floating, string, boolean, decimal, date, timestamp); " +
        s"got ${other.catalogString}")
  }

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long](KmvSketch.unsignedOrdering)

  private def add(buffer: mutable.TreeSet[Long], h: Long): Unit = {
    buffer.add(h)
    if (buffer.size > k) buffer.remove(buffer.last)
  }

  override def update(buffer: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buffer, KmvSketch.hashValue(v))
    buffer
  }

  override def merge(buffer: mutable.TreeSet[Long],
                     other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(buffer, _))
    buffer
  }

  override def eval(buffer: mutable.TreeSet[Long]): Any =
    KmvSketch.pack(k, buffer.toArray)

  override def serialize(buffer: mutable.TreeSet[Long]): Array[Byte] =
    KmvSketch.pack(k, buffer.toArray)

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val (_, values) = KmvSketch.unpack(bytes)
    val set = createAggregationBuffer()
    values.foreach(set.add)
    set
  }

  override def withNewMutableAggBufferOffset(n: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Aggregate union of sketch binaries (same k; k learned from the first
  * input). Buffer = (k, k-smallest set); empty groups evaluate to null.
  */
case class KmvMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvMergeAgg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "kmv_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects kmv sketches (binary), got ${other.catalogString}")
  }

  override def createAggregationBuffer(): KmvMergeAgg.Buf =
    new KmvMergeAgg.Buf(-1,
      mutable.TreeSet.empty[Long](KmvSketch.unsignedOrdering))

  private def absorb(buf: KmvMergeAgg.Buf, k: Int, values: Array[Long]): Unit = {
    if (buf.k < 0) buf.k = k
    else require(buf.k == k, s"$prettyName: mismatched k (${buf.k} vs $k)")
    values.foreach { h =>
      buf.set.add(h)
      if (buf.set.size > buf.k) buf.set.remove(buf.set.last)
    }
  }

  override def update(buf: KmvMergeAgg.Buf, input: InternalRow): KmvMergeAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val (k, values) = KmvSketch.unpack(v.asInstanceOf[Array[Byte]])
      absorb(buf, k, values)
    }
    buf
  }

  override def merge(buf: KmvMergeAgg.Buf, other: KmvMergeAgg.Buf): KmvMergeAgg.Buf = {
    if (other.k >= 0) absorb(buf, other.k, other.set.toArray)
    buf
  }

  override def eval(buf: KmvMergeAgg.Buf): Any =
    if (buf.k < 0) null else KmvSketch.pack(buf.k, buf.set.toArray)

  override def serialize(buf: KmvMergeAgg.Buf): Array[Byte] =
    KmvSketch.pack(buf.k, buf.set.toArray)

  override def deserialize(bytes: Array[Byte]): KmvMergeAgg.Buf = {
    val (k, values) = KmvSketch.unpack(bytes)
    val buf = createAggregationBuffer()
    buf.k = k
    values.foreach(buf.set.add)
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object KmvMergeAgg {
  /** Mutable union buffer: k = -1 until the first sketch fixes it. */
  final class Buf(var k: Int, val set: mutable.TreeSet[Long])
}

/** Distinct-count estimate from a sketch binary. */
case class KmvEstimateExpr(child: Expression) extends UnaryExpression
    with CodegenFallback { // evaluated once per GROUP, not per row
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_estimate"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a kmv sketch (binary), got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any = {
    val (k, values) = KmvSketch.unpack(input.asInstanceOf[Array[Byte]])
    KmvSketch.estimateFrom(k, values)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Lossless union of two sketches (same k required). */
case class KmvMergeExpr(left: Expression, right: Expression) extends BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kmv_merge"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects two kmv sketches")
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (ka, va) = KmvSketch.unpack(a.asInstanceOf[Array[Byte]])
    val (kb, vb) = KmvSketch.unpack(b.asInstanceOf[Array[Byte]])
    require(ka == kb, s"$prettyName: mismatched k ($ka vs $kb)")
    KmvSketch.pack(ka, KmvSketch.mergeArrays(ka, va, vb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** |A ∩ B| estimate: fraction of the union sketch present in BOTH inputs,
  * scaled by the union estimate (the standard KMV inclusion estimator).
  */
case class KmvIntersectExpr(left: Expression, right: Expression) extends BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_intersect_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects two kmv sketches")
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (ka, va) = KmvSketch.unpack(a.asInstanceOf[Array[Byte]])
    val (kb, vb) = KmvSketch.unpack(b.asInstanceOf[Array[Byte]])
    require(ka == kb, s"$prettyName: mismatched k ($ka vs $kb)")
    val union = KmvSketch.mergeArrays(ka, va, vb)
    if (union.isEmpty) return 0.0
    val inA = va.toSet; val inB = vb.toSet
    val common = union.count(h => inA.contains(h) && inB.contains(h))
    common.toDouble / union.length * KmvSketch.estimateFrom(ka, union)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
