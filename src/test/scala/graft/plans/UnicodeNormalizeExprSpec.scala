package graft.plans

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Unicode normalization laws over combining-character fixtures: composed
  * and decomposed byte forms converge under NFC, compatibility characters
  * fold only under NFKC, accent stripping removes combining marks, the
  * forms are idempotent, and the NFC-aware fingerprint dedups
  * canonically-equivalent text.
  */
class UnicodeNormalizeExprSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String, form: String = "NFC",
                   strip: Boolean = false): String =
    Seq(s).toDF("s")
      .select(TextFunctions.normalizeUnicode(col("s"), form, strip))
      .as[String].head()

  private val composed = "café über noël"          // precomposed U+00E9 ...
  private val decomposed = "café über noël"

  test("NFC composes decomposed sequences to the precomposed form") {
    assert(norm(decomposed) == composed)
    assert(norm(composed) == composed) // idempotent on composed input
  }

  test("NFD decomposes the precomposed form; NFC(NFD(x)) == NFC(x)") {
    val nfd = norm(composed, "NFD")
    assert(nfd == decomposed)
    assert(norm(nfd) == composed)
  }

  test("NFKC folds compatibility characters, NFC does not") {
    assert(norm("ﬁne") == "ﬁne")     // fi ligature survives NFC
    assert(norm("ﬁne", "NFKC") == "fine") // folds under NFKC
    assert(norm("x²", "NFKC") == "x2")    // superscript two
    assert(norm("Ａ１", "NFKC") == "A1")       // full-width forms
  }

  test("stripAccents removes combining marks from both byte forms") {
    assert(norm(composed, strip = true) == "cafe uber noel")
    assert(norm(decomposed, strip = true) == "cafe uber noel")
    // non-decomposable letters are untouched (ø has no combining mark)
    assert(norm("søster", strip = true) == "søster")
  }

  test("null in, null out; ASCII passes through unchanged") {
    val rows = Seq("plain ascii", null).toDF("s")
      .select(TextFunctions.normalizeUnicode(col("s"))).collect()
    assert(rows(0).getString(0) == "plain ascii")
    assert(rows(1).isNullAt(0))
  }

  test("fingerprint(unicodeNfc = true) dedups canonically-equivalent text") {
    val fps = Seq(composed, decomposed).toDF("s")
      .select(TextFunctions.fingerprint(col("s"), unicodeNfc = true))
      .as[String].collect()
    assert(fps(0) == fps(1))
    // whereas the byte-level fingerprint sees two documents
    val raw = Seq(composed, decomposed).toDF("s")
      .select(TextFunctions.fingerprint(col("s"))).as[String].collect()
    assert(raw(0) != raw(1))
  }

  test("registered as a SQL function via GraftExtensions") {
    // Spark's char() is mod-256 (unlike DuckDB chr), so the combining
    // accent is embedded in the SQL text itself via the Scala \u escape
    assert(spark.sql(s"SELECT unicode_normalize('café') AS s")
      .as[String].head() == "café")
    assert(spark.sql(
      s"SELECT unicode_normalize('café', 'NFC', true) AS s")
      .as[String].head() == "cafe")
    assert(spark.sql("SELECT unicode_normalize('ﬁne', 'NFKC') AS s")
      .as[String].head() == "fine")
    // a non-boolean strip_accents literal raises the typed error, not a
    // raw ClassCastException (round-12 ADVICE)
    val e = intercept[Exception] {
      spark.sql("SELECT unicode_normalize('café', 'NFC', 1) AS s").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("strip_accents must be a boolean")),
      s"wanted the typed strip_accents error, got: $e")
  }

  test("codegen and interpreted paths agree") {
    val df = Seq(composed, decomposed, "ﬁne x²", "ascii", "")
      .toDF("s")
    Seq("NFC", "NFKC").foreach { form =>
      Seq(false, true).foreach { strip =>
        val fast = df.select(
          TextFunctions.normalizeUnicode(col("s"), form, strip))
          .as[String].collect().toSeq
        val interp = df.select(
          TextFunctions.normalizeUnicode(col("s"), form, strip))
          .as[String].collect().toSeq // second run may hit codegen cache
        val direct = df.as[String].collect().toSeq.map { s =>
          UnicodeNormalizeExpr.normalize(
            org.apache.spark.unsafe.types.UTF8String.fromString(s),
            form, strip).toString
        }
        assert(fast == direct && interp == direct, s"$form strip=$strip")
      }
    }
  }
}
