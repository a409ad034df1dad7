package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** GPT-2-lineage BYTE-LEVEL pre-tokenizer (Radford et al. 2019; the
  * published `encoder.py` algorithm): split text with the regex class
  * pattern — contraction suffixes, space-prefixed letter/digit/
  * punctuation runs, trailing-whitespace handling — then re-express each
  * pre-token's UTF-8 BYTES in the reversible 256-symbol unicode alphabet
  * (printable bytes map to themselves; the rest to U+0100.. in byte
  * order), so downstream BPE operates on bytes and NO input is ever
  * out-of-vocabulary. This is the delta between the engine's Sennrich
  * word-level trainer (t26: lowercased whitespace words over code
  * points) and the byte-level trainers of the GPT-2 lineage: no
  * lowercasing, punctuation splits off words, leading spaces attach to
  * the following token, and multilingual text decomposes to bytes
  * instead of falling back to whole code points.
  *
  * The merge loop and the codegen encoder are REUSED as-is
  * ([[graft.operators.Bpe.learn]] / [[BpeEncodeExpr]]): a byte-mapped
  * pre-token is a string whose code points ARE the byte symbols, so
  * `learn` counts byte pairs and `bpe_encode` merges them without
  * modification — only this pre-tokenizer is new.
  *
  * Scale shape: one compiled-regex scan + a 256-entry table lookup per
  * byte, row-local inside the corpus scan stage (same contract as the
  * other codegen text expressions; the compiled Pattern ships once per
  * executor via the expression's static state).
  */
case class BytePretokenizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "byte_pretokenize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(t: Any): Any =
    BytePretokenizeExpr.compute(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.plans.BytePretokenizeExpr.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BytePretokenizeExpr {

  /** The GPT-2 pre-tokenizer pattern, verbatim from the published
    * encoder: contraction suffixes, ` ?letters+`, ` ?digits+`,
    * ` ?other+`, whitespace-not-before-non-space (keeps the LAST space
    * attached to the next token), residual whitespace.
    * UNICODE_CHARACTER_CLASS makes `\s` Unicode-wide, matching the
    * Python `regex` module the reference implementation used.
    */
  private val Pat = java.util.regex.Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+" +
      "|\\s+(?!\\S)|\\s+",
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** The reversible byte→char alphabet (`bytes_to_unicode`): printable
    * non-space latin-1 bytes (33–126, 161–172, 174–255) map to their own
    * code point; the remaining 68 bytes map to U+0100 + n in ascending
    * byte order. A bijection — see [[charToByte]].
    */
  val byteToChar: Array[Char] = {
    val direct = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (direct(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** Inverse of [[byteToChar]] — decodes a byte-alphabet token back to
    * its raw bytes (spec/debug surface; the release artifact ships the
    * mapped form like the reference implementations do).
    */
  val charToByte: Map[Char, Byte] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** Map one pre-token's UTF-8 bytes through the byte alphabet. */
  def byteMap(token: String): String = {
    val bytes = token.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(byteToChar(bytes(i) & 0xff))
      i += 1
    }
    sb.toString
  }

  /** Decode a byte-alphabet string back to text (lossy only if the token
    * splits a multi-byte UTF-8 sequence mid-character, which whole-token
    * decoding never does).
    */
  def byteUnmap(mapped: String): String = {
    val bytes = new Array[Byte](mapped.length)
    var i = 0
    while (i < mapped.length) {
      bytes(i) = charToByte(mapped.charAt(i))
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Static forwarder target for the generated code: text → array of
    * byte-mapped pre-tokens.
    */
  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val m = Pat.matcher(s)
    while (m.find()) out += UTF8String.fromString(byteMap(m.group()))
    new GenericArrayData(out.toArray)
  }

  /** Column-API entry point. */
  def bytePretokenize(text: Column): Column =
    bridge.column(BytePretokenizeExpr(bridge.expression(text)))
}
