package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}
import java.nio.ByteBuffer
import scala.collection.mutable

/** BOTH normal-equation moment families of the one-vs-rest ridge trainer
  * ([[graft.operators.HashedLinearScorer.trainRidgeMulti]]) in ONE
  * aggregation pass over per-document (bucket, count) vectors:
  *
  *   - the Gram matrix XᵀX — Σ_docs x_{b1}·x_{b2} over the (B+1)-dim
  *     fraction features x_b = c_b/n (intercept appended as x_B = 1);
  *   - the per-class feature sums S_y[b] = Σ_{label=y} x_b, from which
  *     every OvR right-hand side is 2·S_c − S_all.
  *
  * What it replaces (round-13 adjudication, t37 at 99–453 s): the
  * dataflow form exploded each document's (B+1)-vector against itself —
  * (B+1)² rows PER DOCUMENT through two generators, a DECIMAL(28,14)
  * cast each, and a hash aggregate — then ran the lineage twice (Gram
  * pass + class-sum pass). Here the per-document (B+1)² products fold
  * directly into a dense partition-local buffer: zero generated rows,
  * ONE corpus scan, and the shuffle carries one ~(B+1)²·16-byte buffer
  * per partition instead of (B+1)² rows per document — the map-side
  * combine a moment computation wants at 100 TB.
  *
  * EXACTNESS CONTRACT (bit-compatibility with the dataflow form it
  * replaces, which the committed t37 golden pins): each addend is the
  * same IEEE double — (c1·c2)/(n·n), resp. c/n — rounded to 14 decimal
  * places exactly as Spark's `cast(v AS DECIMAL(28,14))` rounds it
  * (shortest-representation string → BigDecimal → HALF_UP), then summed
  * as a scaled integer with unsigned-128-bit carry. Integer addition is
  * exact and associative, so the totals are bit-identical to the old
  * decimal-sum fold under ANY partitioning or arrival order — the same
  * determinism argument, minus the per-row Decimal allocation. Addends
  * are all in [0, 1] (counts are positive, c ≤ n), so the unsigned
  * accumulation never sees a negative term; the 128-bit carry keeps the
  * sum exact past 2⁶³ (≈ 92 k documents of all-ones addends — a bound a
  * corpus-scale training pass does exceed).
  *
  * Bound on the "same IEEE double" claim (round-15 ADVICE): the Gram
  * addend multiplies as `ci.toDouble * cs(j)` while the dataflow form it
  * replaced multiplied the two longs first and then cast — identical
  * doubles only while the per-document product c_b1·c_b2 < 2⁵³ (a
  * product of two bucket counts of ONE document: 2⁵³ needs a ~94M-token
  * document, beyond any real input). Past that, this form can differ by
  * an ULP where the old form instead silently OVERFLOWED the long past
  * 2⁶³ — both regimes are pathological-only, and the committed goldens
  * sit far inside the exact range.
  *
  * The result row is `struct(gram: array<(b1, b2, g)>, cls: array<(y, b,
  * s)>)` with DECIMAL(38,14) cells — dense (B+1)² for the Gram (absent
  * = zero either way), present (class, bucket) pairs only for `cls`,
  * both in deterministic ascending order. One row per training call; the
  * driver-side Cholesky reads it with the same (B ≤ 256) contract as
  * before.
  */
case class RidgeMomentsAgg(cv: Expression, label: Expression, buckets: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[RidgeMomentsAgg.Buf] {

  require(buckets >= 1 && buckets <= 256,
    s"ridge moments materialize (buckets+1)^2 cells; buckets must be " +
      s"in [1, 256], got $buckets")

  override def children: Seq[Expression] = Seq(cv, label)
  override def nullable: Boolean = false
  override def prettyName: String = "ridge_moments"

  private val d = buckets + 1

  override def dataType: DataType = RidgeMomentsAgg.resultType

  override def checkInputDataTypes(): TypeCheckResult =
    (cv.dataType, label.dataType) match {
      case (ArrayType(StructType(fs), _), StringType)
          if fs.length == 2 && fs(0).dataType == IntegerType &&
            fs(1).dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<struct<__b: int, __c: long>>, " +
          s"string label), got $other")
    }

  override def createAggregationBuffer(): RidgeMomentsAgg.Buf =
    new RidgeMomentsAgg.Buf(d)

  override def update(buf: RidgeMomentsAgg.Buf,
                      input: InternalRow): RidgeMomentsAgg.Buf = {
    val arr = cv.eval(input)
    val y = label.eval(input)
    if (arr != null && y != null)
      buf.addDoc(arr.asInstanceOf[ArrayData],
        y.asInstanceOf[UTF8String].toString, buckets)
    buf
  }

  override def merge(buf: RidgeMomentsAgg.Buf,
                     other: RidgeMomentsAgg.Buf): RidgeMomentsAgg.Buf = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: RidgeMomentsAgg.Buf): Any = buf.result()

  override def serialize(buf: RidgeMomentsAgg.Buf): Array[Byte] =
    buf.serialize()

  override def deserialize(bytes: Array[Byte]): RidgeMomentsAgg.Buf =
    RidgeMomentsAgg.Buf.deserialize(bytes, d)

  override def withNewMutableAggBufferOffset(n: Int): RidgeMomentsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): RidgeMomentsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(cv = c(0), label = c(1))
}

object RidgeMomentsAgg {

  private val Scale = 14
  private val TwoPow64 = BigInteger.ONE.shiftLeft(64)
  private[plans] val MaxClasses = 4096

  val resultType: StructType = StructType(Seq(
    StructField("gram", ArrayType(StructType(Seq(
      StructField("b1", IntegerType, nullable = false),
      StructField("b2", IntegerType, nullable = false),
      StructField("g", DecimalType(38, Scale), nullable = false))),
      containsNull = false), nullable = false),
    StructField("cls", ArrayType(StructType(Seq(
      StructField("y", StringType, nullable = false),
      StructField("b", IntegerType, nullable = false),
      StructField("s", DecimalType(38, Scale), nullable = false))),
      containsNull = false), nullable = false)))

  /** `round14(v)` exactly as Spark's `cast(v AS DECIMAL(28,14))`:
    * shortest decimal representation, then HALF_UP at scale 14. Returns
    * the scale-14 unscaled numerator — for v ∈ [0, 1] it fits a long.
    *
    * Fast path (this is the trainer's hot loop — (B+1)² calls per
    * document): `v·1e14` in doubles, rounding to the nearest integer,
    * equals the exact answer whenever the product's fraction is not
    * near the HALF_UP boundary. Error budget: |shortest(v) − v| ≤
    * ½ulp(v) ≤ 1.2e-16 for v ≤ 1 (→ ≤ 0.012 after ·1e14), plus the
    * multiply's own ½ulp at magnitude 1e14 (≤ 0.008) — under 0.02
    * total, so any fraction outside [0.45, 0.55] rounds identically to
    * the exact path. Inside the window (and for any v outside [0, 1])
    * we take the exact BigDecimal route; with arbitrary ratios the
    * window hits ~10 % of calls, so ~90 % of the string/BigDecimal
    * work disappears. ScaledRoundSpec fuzzes fast ≡ exact.
    */
  private[plans] def scaled(v: Double): Long = {
    if (v >= 0.0 && v <= 1.0) {
      val y = v * 1e14
      val f = y - Math.floor(y)
      if (f < 0.45 || f > 0.55) return Math.round(y)
    }
    scaledExact(v)
  }

  /** The reference path: exactly Spark's double→DECIMAL(_,14) cast. */
  private[plans] def scaledExact(v: Double): Long =
    new JBigDecimal(java.lang.Double.toString(v))
      .setScale(Scale, RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** Unsigned-128-bit cell accumulators: lo wraps, hi counts carries. */
  private final class Cells(val n: Int) {
    val lo = new Array[Long](n)
    val hi = new Array[Long](n)
    def add(i: Int, v: Long): Unit = {
      val nl = lo(i) + v
      if (java.lang.Long.compareUnsigned(nl, v) < 0) hi(i) += 1
      lo(i) = nl
    }
    def mergeFrom(o: Cells): Unit = {
      var i = 0
      while (i < n) {
        val nl = lo(i) + o.lo(i)
        if (java.lang.Long.compareUnsigned(nl, o.lo(i)) < 0) hi(i) += 1
        hi(i) += o.hi(i)
        lo(i) = nl
        i += 1
      }
    }
    def decimal(i: Int): Decimal = {
      val big = BigInteger.valueOf(hi(i)).multiply(TwoPow64)
        .add(new BigInteger(java.lang.Long.toUnsignedString(lo(i))))
      Decimal(BigDecimal(new JBigDecimal(big, Scale)), 38, Scale)
    }
    def isZero(i: Int): Boolean = lo(i) == 0L && hi(i) == 0L
  }

  final class Buf(val d: Int) {
    private[RidgeMomentsAgg] val gram = new Cells(d * d)
    private[RidgeMomentsAgg] val cls = mutable.TreeMap.empty[String, Cells]

    /** Fold one document: fraction features x_b = c_b/n plus the
      * intercept pseudo-bucket (B, n), Gram products and class sums in
      * the same (m+1)² loop.
      */
    def addDoc(arr: ArrayData, y: String, buckets: Int): Unit = {
      val m = arr.numElements()
      if (m == 0) return
      // executor-side guard: each distinct label costs a (B+1)-cell
      // family in every partition buffer. The trainer's contract is
      // 2..64 classes (checked driver-side after collect); a label
      // column that is actually free text would otherwise grow buffers
      // without bound long before that check runs. 4096 per partition
      // is far above any sane class count and catches the mistake with
      // a typed error instead of an executor OOM.
      if (!cls.contains(y) && cls.size >= RidgeMomentsAgg.MaxClasses)
        throw new IllegalStateException(
          s"ridge_moments saw more than ${RidgeMomentsAgg.MaxClasses} " +
            "distinct labels in one partition — the label column is not " +
            "a class label (one-vs-rest training expects 2..64 classes)")
      val bs = new Array[Int](m + 1)
      val cs = new Array[Long](m + 1)
      var n = 0L
      var i = 0
      while (i < m) {
        val row = arr.getStruct(i, 2)
        bs(i) = row.getInt(0)
        cs(i) = row.getLong(1)
        n += cs(i)
        i += 1
      }
      bs(m) = buckets
      cs(m) = n
      val nn = (n * n).toDouble
      val nd = n.toDouble
      val ySums = cls.getOrElseUpdate(y, new Cells(d))
      i = 0
      while (i <= m) {
        val ci = cs(i).toDouble
        var j = 0
        while (j <= m) {
          gram.add(bs(i) * d + bs(j), scaled(ci * cs(j) / nn))
          j += 1
        }
        ySums.add(bs(i), scaled(ci / nd))
        i += 1
      }
    }

    def mergeFrom(o: Buf): Unit = {
      gram.mergeFrom(o.gram)
      o.cls.foreach { case (y, cells) =>
        cls.getOrElseUpdate(y, new Cells(d)).mergeFrom(cells)
      }
    }

    def result(): InternalRow = {
      val gramRows = new Array[Any](d * d)
      var i = 0
      while (i < d * d) {
        gramRows(i) = new GenericInternalRow(
          Array[Any](i / d, i % d, gram.decimal(i)))
        i += 1
      }
      val clsRows = mutable.ArrayBuffer.empty[Any]
      cls.foreach { case (y, cells) =>
        var b = 0
        while (b < d) {
          if (!cells.isZero(b))
            clsRows += new GenericInternalRow(
              Array[Any](UTF8String.fromString(y), b, cells.decimal(b)))
          b += 1
        }
      }
      new GenericInternalRow(Array[Any](
        new GenericArrayData(gramRows),
        new GenericArrayData(clsRows.toArray)))
    }

    def serialize(): Array[Byte] = {
      val classBytes = cls.toSeq.map { case (y, cells) =>
        (y.getBytes("UTF-8"), cells)
      }
      val size = 8 + 16 * d * d +
        classBytes.map { case (yb, _) => 4 + yb.length + 16 * d }.sum
      val buf = ByteBuffer.allocate(size)
      buf.putInt(d)
      buf.putInt(classBytes.size)
      var i = 0
      while (i < d * d) { buf.putLong(gram.lo(i)); buf.putLong(gram.hi(i)); i += 1 }
      classBytes.foreach { case (yb, cells) =>
        buf.putInt(yb.length)
        buf.put(yb)
        var b = 0
        while (b < d) { buf.putLong(cells.lo(b)); buf.putLong(cells.hi(b)); b += 1 }
      }
      buf.array()
    }
  }

  object Buf {
    def deserialize(bytes: Array[Byte], expectD: Int): Buf = {
      val buf = ByteBuffer.wrap(bytes)
      val d = buf.getInt()
      require(d == expectD, s"moment buffer dim $d != $expectD")
      val nCls = buf.getInt()
      val out = new Buf(d)
      var i = 0
      while (i < d * d) {
        out.gram.lo(i) = buf.getLong(); out.gram.hi(i) = buf.getLong(); i += 1
      }
      var c = 0
      while (c < nCls) {
        val yb = new Array[Byte](buf.getInt())
        buf.get(yb)
        val cells = new Cells(d)
        var b = 0
        while (b < d) { cells.lo(b) = buf.getLong(); cells.hi(b) = buf.getLong(); b += 1 }
        out.cls.put(new String(yb, "UTF-8"), cells)
        c += 1
      }
      out
    }
  }

  /** Column-API entry point: one struct row carrying every moment the
    * OvR ridge solve needs. `cv` is [[BucketCountsExpr]] output.
    */
  def moments(cv: Column, label: Column, buckets: Int): Column =
    bridge.column(RidgeMomentsAgg(bridge.expression(cv),
      bridge.expression(label), buckets).toAggregateExpression())
}
