package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Row-local Merkle doubling ladder for
  * [[graft.operators.SpanDedup.maxDuplicatedRun]]: given one document's
  * level-1 SURVIVOR entries — (token position, token hash) pairs for every
  * position whose single token is shared by ≥ minDocs documents — emit the
  * combined hash of every power-of-two window whose leaves all survive:
  *
  *   H_1(p)  = the input token hash,
  *   H_2n(p) = xxh64combine(H_n(p), H_n(p+n))   when BOTH halves exist,
  *
  * for n = 2, 4, … ≤ cap, as (p, n, h) triples (level 1 is NOT re-emitted —
  * its global dup-count is already proven by the caller's phase-1 filter).
  *
  * Why an Expression (and why row-local at all): the doubling levels only
  * ever combine hashes WITHIN one document's token array, so the whole
  * ladder is a per-row computation — the cross-document part of the
  * algorithm is solely the per-(level, hash) distinct-doc count that
  * follows. Computing the ladder here replaces round 12's per-level
  * dataflow loop (6 × (self-join + hash group-by + localCheckpoint), ~20
  * jobs with 2 driver actions per level) with ONE projection feeding ONE
  * count — the d18 cold-path cost was those ~30 stages' codegen/JIT, paid
  * per suite pass (BENCH_r12 adjudication). Completeness is unchanged:
  * equal windows still always share a combined hash (equal strings ⇒ equal
  * leaf hashes ⇒ equal ladder), every token of a truly duplicated window is
  * itself duplicated so all needed leaves are present, and a collision
  * still only OVER-approximates the candidate set — the caller's exact
  * (hash, text) refinement recount decides truth. Skipping the old loop's
  * level-by-level global pruning can only ADD candidate rows (a superset of
  * the pruned levels), never drop one.
  *
  * Cost: O(k · log cap) hashes and O(k · log cap · log k) binary-search
  * neighbor lookups per document, where k = the document's duplicated-token
  * footprint (NOT its length) — the same footprint-proportional contract as
  * the refinement pass.
  */
case class MerkleLevelsExpr(entries: Expression, cap: Expression)
    extends BinaryExpression {

  override def left: Expression = entries
  override def right: Expression = cap

  private val structType = StructType(Seq(
    StructField("p", IntegerType, nullable = false),
    StructField("n", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false)))

  override def dataType: DataType =
    ArrayType(structType, containsNull = false)
  override def prettyName: String = "merkle_levels"

  override def checkInputDataTypes(): TypeCheckResult =
    (entries.dataType, cap.dataType) match {
      case (ArrayType(StructType(fs), _),
            ByteType | ShortType | IntegerType | LongType)
          if fs.length == 2 && fs(0).dataType == IntegerType &&
            fs(1).dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<struct<p: int, h: long>>, " +
          s"integral), got $other")
    }

  override def nullSafeEval(e: Any, c: Any): Any =
    MerkleLevelsExpr.compute(e.asInstanceOf[ArrayData],
      WindowHashesExpr.toLong(c))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, c) =>
      s"graft.plans.MerkleLevelsExpr.compute($e, (long)$c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(entries = newLeft, cap = newRight)
}

object MerkleLevelsExpr {

  /** Static forwarder target for the generated code. Input entries may
    * arrive in any order (collect_list order is nondeterministic); they
    * are sorted by position here so the output is order-independent.
    */
  def compute(entries: ArrayData, cap: Long): ArrayData = {
    val k = entries.numElements()
    if (k == 0 || cap < 2) return new GenericArrayData(Array.empty[Any])
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
    var cur = sh // H_n at sp(i); null slot = ladder stopped (encoded below)
    var defined = Array.fill(k)(true)
    var n = 1
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
              Array[Any](sp(i), n, h))
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

  /** Column-API entry point: (p, n, h) triples for every power-of-two
    * window n = 2 … cap whose leaves all appear in `entries`.
    */
  def merkleLevels(entries: Column, cap: Column): Column =
    bridge.column(MerkleLevelsExpr(bridge.expression(entries),
      bridge.expression(cap)))
}
