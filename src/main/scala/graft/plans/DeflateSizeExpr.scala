package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE size of a string's UTF-8 bytes — the compression-ratio
  * quality signal (the classic third Gopher-rule member next to the
  * stopword/punctuation heuristics in t02 and the n-gram repetition
  * rates in t09): text that compresses far below the corpus norm is
  * repetitive/boilerplate (keyword stuffing, navigation spam, template
  * churn), and `deflate_size(text) / octet_length(text)` measures that
  * in one scan-side codegen'd expression. DEFLATE (RFC 1951, raw
  * stream, level 6) via the JDK's zlib binding — no new dependencies;
  * the byte count is deterministic for a fixed zlib/level, which is the
  * golden-gate precedent (t26/t27): no SQL engine replays zlib, so t50
  * is pinned by a committed golden instead of a DuckDB twin.
  *
  * One `Deflater` per executor THREAD (ThreadLocal, reset between rows)
  * — allocation and native-handle churn stay off the per-row path, the
  * requirement for a 100 TB scan-side signal.
  */
case class DeflateSizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_size"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.catalogString}")
    }

  override def nullSafeEval(s: Any): Any =
    DeflateSizeExpr.compute(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.DeflateSizeExpr.compute($s)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object DeflateSizeExpr {

  // nowrap (raw DEFLATE): no zlib header/checksum, so tiny inputs aren't
  // dominated by envelope bytes. Never end()ed — one native handle per
  // executor thread for the life of the executor, by design.
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }

  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  /** Column-API entry point. */
  def deflateSize(text: Column): Column =
    bridge.column(DeflateSizeExpr(bridge.expression(text)))
}
