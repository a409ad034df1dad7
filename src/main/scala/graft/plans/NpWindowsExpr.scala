package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Row-local refinement-window generation for
  * [[graft.operators.SpanDedup.maxDuplicatedRun]]: given one document's
  * tokens, its base-level survivor positions (`basePairs`, from
  * [[SharedGramsExpr]] or the general-minDocs join) and the higher Merkle
  * levels that globally survived at those positions (`higher`, (p, n)
  * with n in tokens), emit for every survivor position p the rolling
  * window hash of EVERY length
  *
  *   m = baseLen + 1 … min(2·np(p) − 1, runEnd(p) − p + baseLen,
  *                          cap, tokens − p),
  *
  * where np(p) = the largest surviving level at p (≥ baseLen by
  * membership in `basePairs`) and runEnd(p) = the last position of the
  * CONSECUTIVE survivor run containing p. Both bounds follow from
  * sub-windows of a duplicated window being duplicated: the largest
  * power-of-two-times-baseLen prefix survives at p (so m ≤ 2·np − 1,
  * the doubling argument), and every baseLen-subgram survives (so
  * m ≤ runEnd − p + baseLen — the bound that collapses the fan-out on
  * corpora whose shared baseLen-grams are common PHRASES, isolated or in
  * short runs, rather than long duplicated passages). Lengths ≤ baseLen are NOT re-enumerated: 1…baseLen−1
  * are the caller's exact short-gram flag counts, and baseLen itself is
  * already PROVEN at every survivor position — base promotion counts
  * gram TEXT, so a non-empty `basePairs` certifies a true duplicated
  * baseLen-run (the caller's per-document refinement floor). At
  * natural-language sharing rates this skips the corpus-sized
  * 1…baseLen-gram recounts that dominated the pre-round-17 plan.
  *
  * Why all lengths and not a per-position exponential+binary probe: a
  * probed window's count is the number of distinct documents that
  * GENERATE it, so a length is countable only if every holder generates
  * it; per-position probe schedules diverge (np, cap and document-end
  * truncation differ between holders), so synchronized full enumeration
  * is the sound choice, and its fan-out ≤ 2·np per position is the same
  * footprint-proportional contract as the ladder.
  *
  * Hashes reuse [[WindowHashesExpr.compute]]'s chain (h_m = xxh64(token,
  * seed h_{m−1})) so equal window strings always collide to equal hashes
  * across documents; a collision only widens the candidate set handed to
  * the caller's exact (hash, text) recount.
  */
case class NpWindowsExpr(children: Seq[Expression]) extends Expression {

  private def toksE = children(0)
  private def basePairsE = children(1)
  private def higherE = children(2)
  private def baseLenE = children(3)
  private def capE = children(4)

  private val structType = StructType(Seq(
    StructField("p", IntegerType, nullable = false),
    StructField("m", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false)))

  override def dataType: DataType =
    ArrayType(structType, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "np_windows"
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    def integral(dt: DataType) = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    (toksE.dataType, basePairsE.dataType, higherE.dataType) match {
      case (ArrayType(StringType, _),
            ArrayType(StructType(bf), _), ArrayType(StructType(hf), _))
          if bf.length == 2 && bf(0).dataType == IntegerType &&
            bf(1).dataType == LongType &&
            hf.length == 2 && hf(0).dataType == IntegerType &&
            hf(1).dataType == IntegerType &&
            integral(baseLenE.dataType) && integral(capE.dataType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<struct<p:int,h:long>>, " +
          s"array<struct<p:int,n:int>>, integral, integral), got $other")
    }
  }

  override def eval(input: InternalRow): Any = {
    val t = toksE.eval(input)
    val b = basePairsE.eval(input)
    val hi = higherE.eval(input)
    val bl = baseLenE.eval(input)
    val c = capE.eval(input)
    if (t == null || b == null || hi == null || bl == null || c == null) null
    else NpWindowsExpr.compute(t.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], hi.asInstanceOf[ArrayData],
      WindowHashesExpr.toLong(bl), WindowHashesExpr.toLong(c))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val gens = children.map(_.genCode(ctx))
    val anyNull = gens.map(_.isNull.toString).mkString(" || ")
    val (t, b, hi, bl, c) =
      (gens(0).value, gens(1).value, gens(2).value, gens(3).value,
        gens(4).value)
    ev.copy(code = code"""
      ${gens.map(_.code).reduce(_ + _)}
      boolean ${ev.isNull} = $anyNull;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.plans.NpWindowsExpr.compute(
          $t, $b, $hi, (long)$bl, (long)$c);
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object NpWindowsExpr {

  /** Static forwarder target for the generated code. `basePairs` and
    * `higher` may arrive in any order (collect_list order is
    * nondeterministic); `higher` entries at positions absent from
    * `basePairs` are ignored (they cannot exist by construction — every
    * ladder entry is built on base survivors — but a defensive skip keeps
    * the contract local).
    */
  def compute(toks: ArrayData, basePairs: ArrayData, higher: ArrayData,
              baseLen: Long, cap: Long): ArrayData = {
    val k = basePairs.numElements()
    if (k == 0) return new GenericArrayData(Array.empty[Any])
    val len = toks.numElements()
    val b = math.max(1L, baseLen).toInt

    val ps = new Array[Int](k)
    var i = 0
    while (i < k) {
      ps(i) = basePairs.getStruct(i, 2).getInt(0)
      i += 1
    }
    java.util.Arrays.sort(ps)
    val np = new Array[Int](k)
    java.util.Arrays.fill(np, b)
    i = 0
    val kh = higher.numElements()
    while (i < kh) {
      val row = higher.getStruct(i, 2)
      val j = java.util.Arrays.binarySearch(ps, row.getInt(0))
      if (j >= 0 && row.getInt(1) > np(j)) np(j) = row.getInt(1)
      i += 1
    }
    // consecutive-survivor run bound: a duplicated m-window at p needs
    // EVERY baseLen-subgram [p … p+m−baseLen] to be a survivor (each is a
    // sub-window, so each is duplicated), hence m ≤ runEnd(p) − p +
    // baseLen. Every holder of a true window satisfies the same bound at
    // its own position (its run extends at least that far), so the
    // synchronized-generation contract is preserved. One backward pass.
    val runEnd = new Array[Int](k)
    i = k - 1
    while (i >= 0) {
      runEnd(i) = if (i + 1 < k && ps(i + 1) == ps(i) + 1) runEnd(i + 1)
                  else ps(i)
      i -= 1
    }

    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < k) {
      val p = ps(i)
      val maxm = math.min(
        math.min(math.min(2L * np(i) - 1, cap), (len - p).toLong),
        (runEnd(i) - p + b).toLong)
      if (maxm >= b + 1) {
        // one O(maxm) chain per position, reusing the shared rolling hash
        val hs = WindowHashesExpr.compute(toks, p.toLong, maxm)
        var m = b + 1
        while (m <= maxm) {
          out += new GenericInternalRow(
            Array[Any](p, m, hs.getLong(m - 1)))
          m += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point: (p, m, h) refinement windows for every base
    * survivor position, m = baseLen + 1 … min(2·np − 1, cap, len − p).
    */
  def npWindows(toks: Column, basePairs: Column, higher: Column,
                baseLen: Column, cap: Column): Column =
    bridge.column(NpWindowsExpr(Seq(bridge.expression(toks),
      bridge.expression(basePairs), bridge.expression(higher),
      bridge.expression(baseLen), bridge.expression(cap))))
}
