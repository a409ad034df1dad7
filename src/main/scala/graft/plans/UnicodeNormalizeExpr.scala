package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen expression — the canonical
  * first step of every curation pipeline's text fingerprinting: the SAME
  * user-visible text arrives from the web in composed ("é" U+00E9) and
  * decomposed ("e" + U+0301) byte forms, and a byte-level fingerprint or
  * line hash treats them as different documents unless the corpus is
  * normalized first (Unicode Standard Annex #15 forms, implemented by
  * `java.text.Normalizer` — no Spark built-in exposes it).
  *
  * Forms: NFC (canonical compose — the web/interchange default), NFD,
  * NFKC (compatibility fold: ligatures "ﬁ"→"fi", full-width forms,
  * superscripts — what tokenizer vocabularies normalize with), NFKD.
  * `stripAccents` additionally removes combining marks (category Mn)
  * from the NFD expansion and recomposes — "café"→"cafe" — the
  * accent-fold DuckDB/utf8proc call `strip_accents`.
  *
  * One per-row library call inside whole-stage codegen; ASCII-only
  * strings (the overwhelming hot path at corpus scale) short-circuit on
  * `Normalizer.isNormalized`'s fast path without allocating. Null → null.
  */
case class UnicodeNormalizeExpr(child: Expression, form: String,
                                stripAccents: Boolean)
    extends UnaryExpression {

  require(UnicodeNormalizeExpr.forms.contains(form),
    s"unicode_normalize form must be one of NFC|NFD|NFKC|NFKD, got $form")

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeExpr.normalize(
      input.asInstanceOf[UTF8String], form, stripAccents)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.plans.UnicodeNormalizeExpr.normalize($c, "$form", $stripAccents)""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalizeExpr {

  private[plans] val forms = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Static forwarder target for the generated code. */
  def normalize(s: UTF8String, form: String, stripAccents: Boolean)
      : UTF8String = {
    val str = s.toString
    val f = java.text.Normalizer.Form.valueOf(form)
    if (!stripAccents) {
      // already-normalized input (all ASCII, most web text) returns the
      // original UTF8String without re-encoding
      if (java.text.Normalizer.isNormalized(str, f)) s
      else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
    } else {
      // accent fold: canonical-decompose, drop combining marks (Mn), then
      // apply the requested form to what remains
      val d = java.text.Normalizer.normalize(str,
        java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(d.length)
      var i = 0
      while (i < d.length) {
        val cp = d.codePointAt(i)
        if (Character.getType(cp) != Character.NON_SPACING_MARK)
          sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      UTF8String.fromString(
        java.text.Normalizer.normalize(sb.toString, f))
    }
  }

  /** Column-API entry point. */
  def unicodeNormalize(c: Column, form: String = "NFC",
                       stripAccents: Boolean = false): Column =
    bridge.column(UnicodeNormalizeExpr(bridge.expression(c), form, stripAccents))
}
