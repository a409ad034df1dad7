package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.collection.mutable

/** MERGEABLE QUANTILE SKETCH — the percentile member of the engine's
  * sketch family (KMV q40/q41 does distincts, CMS q64 does frequencies):
  * a LOG-HISTOGRAM over non-negative longs in the HdrHistogram/DDSketch
  * family, with the bin function chosen to be EXACT INTEGER BIT
  * ARITHMETIC so that — unlike a floating `ceil(log_γ x)` — the same
  * value can never straddle a bin boundary across engines, and a DuckDB
  * oracle can replay the whole estimator bit-for-bit.
  *
  * Bin function at resolution `s` bits (`sub` = the s bits after the
  * leading 1, `h` = floor(log2 x)):
  *
  *   bin(x) = x                                   for x < 2^s   (EXACT)
  *   bin(x) = ((h−s+1) << s) + sub                for x ≥ 2^s
  *
  * The two branches meet continuously at x = 2^s (where h = s the second
  * formula IS the identity), bins are monotone in x, and every bin at
  * h > s spans 2^(h−s) values starting at its [[QuantileSketch.lowerBound]]
  * — a relative width ≤ 2^−s. Hence values below 2^(s+1) are represented
  * EXACTLY, and above that a quantile query returns the true quantile's
  * bin lower bound, within relative error 2^−s of the true order
  * statistic (s = 7 → 0.8 %).
  *
  * Determinism & mergeability: the sketch state is bin → count — a pure
  * function of the input MULTISET (no insertion-order compaction like
  * KLL, no centroid drift like t-digest), so sketch bytes are identical
  * under any partitioning (sorted serialization), merge = binwise count
  * addition (exact, associative, commutative: merge-of-sketches ≡
  * sketch-of-union bit-for-bit), and per-batch sketch fragments fold on
  * the [[graft.sources.AdditiveStats]] protocol for continuous
  * percentile views. Memory is bounded by `maxBins` as an EXPLICIT
  * contract (like the BPE vocab cap): at resolution s the bin count is
  * ≤ (64−s)·2^s total and in practice ≤ distinct-value count; exceeding
  * the cap throws rather than silently degrading.
  *
  * Quantile rule (rank-exact, SQL-replayable): for percentile p of n
  * values, target rank = ceil(p·n/100) computed in INTEGER arithmetic
  * ((p·n + 99) div 100 — never `ceil(0.95·n)`, whose IEEE product can
  * land on the wrong side of an integer), answer = lower bound of the
  * first bin whose cumulative count reaches the target.
  */
object QuantileSketch {

  /** Bin id of non-negative `x` at resolution `s`. */
  def binOf(x: Long, s: Int): Long = {
    require(x >= 0, s"qsketch accepts non-negative values only, got $x")
    if (x < (1L << s)) x
    else {
      val h = 63 - java.lang.Long.numberOfLeadingZeros(x)
      ((h - s + 1).toLong << s) + ((x >>> (h - s)) & ((1L << s) - 1))
    }
  }

  /** Smallest value mapping to `bin` (the quantile answer). */
  def lowerBound(bin: Long, s: Int): Long =
    if (bin < (1L << (s + 1))) bin
    else {
      val h = (bin >> s) + s - 1
      ((1L << s) + (bin & ((1L << s) - 1))) << (h - s)
    }

  /** Integer-exact target rank for percentile `p` of `n` values. */
  def targetRank(p: Int, n: Long): Long = (p * n + 99L) / 100L

  // -------------------------------------------------------------- binary
  // layout: int s, int m, then m × (long bin, long count), bins ascending

  private[plans] def pack(s: Int, bins: mutable.TreeMap[Long, Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + bins.size * 16)
    buf.putInt(s).putInt(bins.size)
    bins.foreach { case (b, c) => buf.putLong(b).putLong(c) }
    buf.array()
  }

  private[plans] def unpack(bytes: Array[Byte]): (Int, Array[(Long, Long)]) = {
    val buf = ByteBuffer.wrap(bytes)
    val s = buf.getInt(); val m = buf.getInt()
    (s, Array.fill(m)((buf.getLong(), buf.getLong())))
  }

  private[plans] def quantileFrom(bytes: Array[Byte], p: Int): Any = {
    val (s, bins) = unpack(bytes)
    if (bins.isEmpty) return null
    val n = bins.iterator.map(_._2).sum
    val target = targetRank(p, n)
    var cum = 0L
    var i = 0
    while (i < bins.length) {
      cum += bins(i)._2
      if (cum >= target) return lowerBound(bins(i)._1, s)
      i += 1
    }
    lowerBound(bins.last._1, s)
  }

  // ---------------------------------------------------------- column API

  /** Per-group sketch of a non-negative integral column. */
  def sketch(c: Column, s: Int, maxBins: Int = 1 << 16): Column =
    bridge.column(QsketchAgg(bridge.expression(c), s, maxBins)
      .toAggregateExpression())

  /** AGGREGATE union of sketches — folds per-fragment sketches of a
    * continuous percentile view (binwise count addition, exact).
    */
  def mergeAgg(c: Column): Column =
    bridge.column(QsketchMergeAgg(bridge.expression(c)).toAggregateExpression())

  /** Percentile `p` ∈ [1, 100] from a sketch binary (null for empty). */
  def quantileAt(c: Column, p: Int): Column = {
    require(p >= 1 && p <= 100, s"percentile must be in [1,100], got $p")
    bridge.column(QsketchQuantileExpr(bridge.expression(c), p))
  }

  /** Total count from a sketch binary. */
  def sketchCount(c: Column): Column =
    bridge.column(QsketchCountExpr(bridge.expression(c)))
}

/** The aggregate: buffer = bin → count (TreeMap keeps serialization
  * sorted → partitioning-invariant bytes).
  */
case class QsketchAgg(child: Expression, s: Int, maxBins: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeMap[Long, Long]] {

  require(s >= 1 && s <= 20, s"qsketch resolution s must be in [1, 20], got $s")
  require(maxBins > 0, "maxBins must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "qsketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a non-negative integral column, " +
        s"got ${other.catalogString}")
  }

  override def createAggregationBuffer(): mutable.TreeMap[Long, Long] =
    mutable.TreeMap.empty[Long, Long]

  private def add(buf: mutable.TreeMap[Long, Long], bin: Long, c: Long): Unit = {
    buf.updateWith(bin) {
      case Some(prev) => Some(prev + c)
      case None =>
        if (buf.size >= maxBins) throw new IllegalStateException(
          s"qsketch exceeded maxBins=$maxBins at resolution s=$s — raise " +
            "maxBins (memory is 16 bytes/bin) or lower the resolution; " +
            "the cap is an explicit contract, not a silent degradation")
        Some(c)
    }
  }

  override def update(buf: mutable.TreeMap[Long, Long],
                      input: InternalRow): mutable.TreeMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v match {
        case l: Long => l
        case i: Int => i.toLong
        case sh: Short => sh.toLong
        case b: Byte => b.toLong
      }
      add(buf, QuantileSketch.binOf(x, s), 1L)
    }
    buf
  }

  override def merge(buf: mutable.TreeMap[Long, Long],
                     other: mutable.TreeMap[Long, Long]): mutable.TreeMap[Long, Long] = {
    other.foreach { case (b, c) => add(buf, b, c) }
    buf
  }

  override def eval(buf: mutable.TreeMap[Long, Long]): Any =
    QuantileSketch.pack(s, buf)

  override def serialize(buf: mutable.TreeMap[Long, Long]): Array[Byte] =
    QuantileSketch.pack(s, buf)

  override def deserialize(bytes: Array[Byte]): mutable.TreeMap[Long, Long] = {
    val (_, bins) = QuantileSketch.unpack(bytes)
    val buf = createAggregationBuffer()
    bins.foreach { case (b, c) => buf.update(b, c) }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): QsketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): QsketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Aggregate union of sketch binaries (same s; s learned from the first
  * input; empty groups evaluate to null).
  */
case class QsketchMergeAgg(child: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QsketchMergeAgg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "qsketch_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects qsketch binaries, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): QsketchMergeAgg.Buf =
    new QsketchMergeAgg.Buf(-1, mutable.TreeMap.empty[Long, Long])

  private def absorb(buf: QsketchMergeAgg.Buf, s: Int,
                     bins: Array[(Long, Long)]): Unit = {
    if (buf.s < 0) buf.s = s
    else require(buf.s == s, s"$prettyName: mismatched resolution (${buf.s} vs $s)")
    bins.foreach { case (b, c) =>
      buf.bins.update(b, buf.bins.getOrElse(b, 0L) + c)
    }
  }

  override def update(buf: QsketchMergeAgg.Buf, input: InternalRow): QsketchMergeAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val (s, bins) = QuantileSketch.unpack(v.asInstanceOf[Array[Byte]])
      absorb(buf, s, bins)
    }
    buf
  }

  override def merge(buf: QsketchMergeAgg.Buf, other: QsketchMergeAgg.Buf): QsketchMergeAgg.Buf = {
    if (other.s >= 0) absorb(buf, other.s, other.bins.toArray)
    buf
  }

  override def eval(buf: QsketchMergeAgg.Buf): Any =
    if (buf.s < 0) null else QuantileSketch.pack(buf.s, buf.bins)

  override def serialize(buf: QsketchMergeAgg.Buf): Array[Byte] =
    QuantileSketch.pack(if (buf.s < 0) 0 else buf.s, buf.bins)

  override def deserialize(bytes: Array[Byte]): QsketchMergeAgg.Buf = {
    val (s, bins) = QuantileSketch.unpack(bytes)
    val buf = createAggregationBuffer()
    if (bins.nonEmpty || s > 0) buf.s = s
    bins.foreach { case (b, c) => buf.bins.update(b, c) }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): QsketchMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): QsketchMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object QsketchMergeAgg {
  /** Mutable union buffer: s = -1 until the first sketch fixes it. */
  final class Buf(var s: Int, val bins: mutable.TreeMap[Long, Long])
}

/** Percentile extraction from a sketch binary (evaluated once per group). */
case class QsketchQuantileExpr(child: Expression, p: Int) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "qsketch_quantile"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a qsketch binary, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    QuantileSketch.quantileFrom(input.asInstanceOf[Array[Byte]], p)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Total count from a sketch binary. */
case class QsketchCountExpr(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "qsketch_count"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a qsketch binary, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any = {
    val (_, bins) = QuantileSketch.unpack(input.asInstanceOf[Array[Byte]])
    bins.iterator.map(_._2).sum
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
