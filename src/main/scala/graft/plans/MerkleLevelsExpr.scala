package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Row-local Merkle doubling ladder for
  * [[graft.operators.SpanDedup.maxDuplicatedRun]]: given one document's
  * BASE-LEVEL survivor entries — (token position, window hash) pairs for
  * every position whose `baseLen`-token window is a cross-document
  * duplication candidate — emit the combined hash of every
  * power-of-two-times-`baseLen` window whose leaves all survive:
  *
  *   H_b(p)  = the input window hash (b = baseLen),
  *   H_2n(p) = xxh64combine(H_n(p), H_n(p+n))   when BOTH halves exist,
  *
  * for n = 2b, 4b, … ≤ cap, as (p, n, k) triples with n in TOKENS and
  * k = [[MerkleLevelsExpr.packKey]](n, h) the 8-byte global count key
  * (the base level itself is NOT re-emitted — its global dup-count is
  * already proven by the caller's base-level promotion).
  *
  * Why an Expression (and why row-local at all): the doubling levels only
  * ever combine hashes WITHIN one document's token array, so the whole
  * ladder is a per-row computation — the cross-document part of the
  * algorithm is solely the per-(level, hash) distinct-doc count that
  * follows. Computing the ladder here replaces round 12's per-level
  * dataflow loop (6 × (self-join + hash group-by + localCheckpoint), ~20
  * jobs with 2 driver actions per level) with ONE projection feeding ONE
  * count — the d18 cold-path cost was those ~30 stages' codegen/JIT, paid
  * per suite pass (BENCH_r12 adjudication). Round 17 added `baseLen`:
  * basing the ladder on 4-token windows instead of single tokens lets the
  * caller discard the levels natural language shares everywhere (1–3-gram
  * sharing is near-total in any corpus, so pruning there removes nothing
  * while its per-token candidate relations dominate the operator's
  * shuffle volume — the BENCH_r16 d18 finding).
  *
  * Completeness is unchanged by either rewrite: equal windows still
  * always share a combined hash (equal strings ⇒ equal leaf hashes ⇒
  * equal ladder), every `baseLen`-gram inside a truly duplicated window
  * is itself duplicated so all needed leaves are present, and a collision
  * still only OVER-approximates the candidate set — the caller's exact
  * (hash, text) refinement recount decides truth.
  *
  * Cost: O(k · log(cap/baseLen)) hashes and O(k · log(cap/baseLen) ·
  * log k) binary-search neighbor lookups per document, where k = the
  * document's duplicated-window footprint (NOT its length) — the same
  * footprint-proportional contract as the refinement pass.
  */
case class MerkleLevelsExpr(entries: Expression, cap: Expression,
                            baseLen: Expression)
    extends TernaryExpression {

  override def first: Expression = entries
  override def second: Expression = cap
  override def third: Expression = baseLen

  private val structType = StructType(Seq(
    StructField("p", IntegerType, nullable = false),
    StructField("n", IntegerType, nullable = false),
    StructField("k", LongType, nullable = false)))

  override def dataType: DataType =
    ArrayType(structType, containsNull = false)
  override def prettyName: String = "merkle_levels"

  override def checkInputDataTypes(): TypeCheckResult =
    (entries.dataType, cap.dataType, baseLen.dataType) match {
      case (ArrayType(StructType(fs), _),
            ByteType | ShortType | IntegerType | LongType,
            ByteType | ShortType | IntegerType | LongType)
          if fs.length == 2 && fs(0).dataType == IntegerType &&
            fs(1).dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<struct<p: int, h: long>>, " +
          s"integral, integral), got $other")
    }

  override def nullSafeEval(e: Any, c: Any, b: Any): Any =
    MerkleLevelsExpr.compute(e.asInstanceOf[ArrayData],
      WindowHashesExpr.toLong(c), WindowHashesExpr.toLong(b))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, c, b) =>
      s"graft.plans.MerkleLevelsExpr.compute($e, (long)$c, (long)$b)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(entries = newFirst, cap = newSecond, baseLen = newThird)
}

object MerkleLevelsExpr {

  /** The 8-byte GLOBAL COUNT KEY of a ladder entry: level and combined
    * hash mixed into one long, so the cross-document distinct-doc count
    * groups by a single 8-byte column instead of an (int, long) pair.
    * A packed collision across (level, hash) pairs merges two counts —
    * which, like every hash step here, only OVER-approximates survivors.
    * Both the global count and [[FilterPackedExpr]]'s row-local
    * unshared-set membership use this same key, so the convention is
    * private to the pair of expressions.
    */
  def packKey(n: Int, h: Long): Long =
    XXH64.hashLong(h, XXH64.hashLong(n.toLong, 42L))

  /** Static forwarder target for the generated code. Input entries may
    * arrive in any order (collect_list order is nondeterministic); they
    * are sorted by position here so the output is order-independent.
    * Positions are token positions; entry hashes cover [p, p+baseLen).
    */
  def compute(entries: ArrayData, cap: Long, baseLen: Long): ArrayData = {
    val k = entries.numElements()
    val b = math.max(1L, baseLen).toInt
    if (k == 0 || cap < 2L * b) return new GenericArrayData(Array.empty[Any])
    val ps = new Array[Int](k)
    val hs = new Array[Long](k)
    var i = 0
    while (i < k) {
      val row = entries.getStruct(i, 2)
      ps(i) = row.getInt(0)
      hs(i) = row.getLong(1)
      i += 1
    }
    // sort both parallel arrays by position (insertion-free: index sort)
    val order = Array.range(0, k).sortBy(ps)
    val sp = order.map(ps)
    val sh = order.map(hs)

    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var cur = sh // H_n at sp(i); defined(i) = ladder still alive there
    var defined = Array.fill(k)(true)
    var n = b // current level length in TOKENS
    while (2L * n <= cap) {
      val step = n
      n = 2 * n
      val nextH = new Array[Long](k)
      val nextDef = new Array[Boolean](k)
      var alive = 0
      var i = 0
      while (i < k) {
        if (defined(i)) {
          val j = java.util.Arrays.binarySearch(sp, sp(i) + step)
          if (j >= 0 && defined(j)) {
            val h = XXH64.hashLong(cur(j), cur(i))
            nextH(i) = h
            nextDef(i) = true
            alive += 1
            out += new GenericInternalRow(
              Array[Any](sp(i), n, packKey(n, h)))
          }
        }
        i += 1
      }
      cur = nextH
      defined = nextDef
      if (alive == 0) return new GenericArrayData(out.toArray)
    }
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point: (p, n, k) triples — position, window length
    * in tokens, packed count key — for every power-of-two-times-baseLen
    * window n = 2·baseLen … cap whose leaves all appear in `entries`.
    */
  def merkleLevels(entries: Column, cap: Column,
                   baseLen: Column = lit(1)): Column =
    bridge.column(MerkleLevelsExpr(bridge.expression(entries),
      bridge.expression(cap), bridge.expression(baseLen)))
}
