package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton (Aho & Corasick 1975) — the
  * classic dictionary-matching structure: a trie over the pattern set
  * with failure links (longest proper suffix that is also a trie prefix)
  * and output links merged down the failure chain at build time, so ONE
  * left-to-right walk over the text reports every pattern that occurs.
  *
  * Built once on the driver from the literal pattern list and shipped to
  * executors inside the expression (`addReferenceObj`), like
  * [[BpeEncodeExpr]]'s merge table — the 100 TB shape: a blocklist of
  * thousands of banned phrases costs O(len(text)) per document instead
  * of one `contains` scan per pattern (k full passes), and the match
  * runs inside the corpus scan stage under whole-stage codegen.
  *
  * Matching is case-sensitive over UTF-16 code units, which coincides
  * with substring containment over code points for valid strings — the
  * same relation SQL `contains(text, pattern)` decides, so the result is
  * exactly replayable as k `contains` predicates by any engine.
  */
final class AhoCorasick(val patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty, "empty pattern set")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty strings")
  require(patterns.distinct.length == patterns.length, "duplicate patterns")

  // Flat trie: per-node char->child map, failure link, and the ids of all
  // patterns ending at the node OR at any node on its failure chain
  // (merged at build so the scan never walks fail links to report).
  private val children =
    scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
  private val fail = scala.collection.mutable.ArrayBuffer(0)
  private val out = scala.collection.mutable.ArrayBuffer[Array[Int]](Array.empty)

  patterns.zipWithIndex.foreach { case (p, id) =>
    var node = 0
    var i = 0
    while (i < p.length) {
      val c = Character.valueOf(p.charAt(i))
      var next = children(node).get(c)
      if (next == null) {
        children += new java.util.HashMap[Character, Integer]()
        fail += 0
        out += Array.empty
        next = Integer.valueOf(children.length - 1)
        children(node).put(c, next)
      }
      node = next.intValue()
      i += 1
    }
    out(node) = out(node) :+ id
  }

  // BFS failure links; children of the root fail to the root.
  locally {
    val queue = new java.util.ArrayDeque[Integer]()
    children(0).forEach { (_, v) => queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      children(u).forEach { (c, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).containsKey(c)) f = fail(f)
        val fc = children(f).get(c)
        fail(v.intValue()) =
          if (fc != null && fc.intValue() != v.intValue()) fc.intValue() else 0
        out(v.intValue()) = out(v.intValue()) ++ out(fail(v.intValue()))
        queue.add(v)
      }
    }
  }

  private val childrenArr: Array[java.util.HashMap[Character, Integer]] =
    children.toArray
  private val failArr: Array[Int] = fail.toArray
  private val outArr: Array[Array[Int]] = out.toArray

  /** Ids (ascending) of every pattern occurring in `text` at least once. */
  def matchedIds(text: String): Array[Int] = {
    val seen = new Array[Boolean](patterns.length)
    var nSeen = 0
    var state = 0
    var i = 0
    while (i < text.length && nSeen < patterns.length) {
      val c = Character.valueOf(text.charAt(i))
      var s = state
      while (s != 0 && !childrenArr(s).containsKey(c)) s = failArr(s)
      val next = childrenArr(s).get(c)
      state = if (next == null) 0 else next.intValue()
      val ids = outArr(state)
      var j = 0
      while (j < ids.length) {
        if (!seen(ids(j))) { seen(ids(j)) = true; nSeen += 1 }
        j += 1
      }
      i += 1
    }
    val res = new Array[Int](nSeen)
    var k = 0
    var id = 0
    while (id < seen.length) {
      if (seen(id)) { res(k) = id; k += 1 }
      id += 1
    }
    res
  }
}

/** `multi_match(text, patterns)` → array<int> of the ids (positions in
  * the literal pattern list, ascending) of every pattern contained in
  * the text — the one-pass blocklist probe. Null text → null; empty
  * array means no pattern matched.
  */
case class MultiMatchExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  @transient private lazy val ac = new AhoCorasick(patterns)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "multi_match"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MultiMatchExpr.compute(input.asInstanceOf[UTF8String], ac)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", ac, "graft.plans.AhoCorasick")
    defineCodeGen(ctx, ev, c => s"graft.plans.MultiMatchExpr.compute($c, $acRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MultiMatchExpr {

  def compute(text: UTF8String, ac: AhoCorasick): GenericArrayData = {
    val ids = ac.matchedIds(text.toString)
    val boxed = new Array[Any](ids.length)
    var i = 0
    while (i < ids.length) { boxed(i) = ids(i); i += 1 }
    new GenericArrayData(boxed)
  }

  /** Column form: ids of the matched patterns, ascending. */
  def matchedIds(text: Column, patterns: Seq[String]): Column =
    bridge.column(MultiMatchExpr(bridge.expression(text), patterns))
}
