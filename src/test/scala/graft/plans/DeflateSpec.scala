package graft.plans

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Laws for the compression-ratio quality signal
  * ([[DeflateSizeExpr]] / [[TextFunctions.compressionRatio]]).
  */
class DeflateSpec extends SparkSpec {
  import spark.implicits._

  private def sizes(texts: Seq[String]): Seq[Long] =
    texts.toDF("t").select(TextFunctions.deflateSize(col("t")))
      .as[Long].collect().toSeq

  test("deterministic: repeated evaluation returns identical byte counts") {
    val texts = (1 to 50).map(i => s"document $i with some prose " * (i % 7 + 1))
    assert(sizes(texts) == sizes(texts))
  }

  test("monotone under planted repetition: repeated text compresses far below diverse text") {
    val rnd = new scala.util.Random(20260820L)
    val diverse = (1 to 400).map(_ =>
      rnd.nextPrintableChar()).mkString // ~400 chars, near-incompressible
    val repeated = "spam phrase " * 34  // ~400 chars of pure repetition
    val Seq(dDiv, dRep) = sizes(Seq(diverse, repeated))
    assert(dRep * 3 < dDiv,
      s"repetition must compress hard: diverse=$dDiv repeated=$dRep")
    // and the RATIO column orders them the same way
    val ratios = Seq(diverse, repeated).toDF("t")
      .select(TextFunctions.compressionRatio(col("t"))).as[Double]
      .collect()
    assert(ratios(1) < ratios(0) && ratios(0) <= 1.2)
  }

  test("codegen and interpreted eval agree; empty text ratio is 0") {
    val texts = Seq("", "abc", "the same words the same words", "ünïcode €")
    val viaDf = sizes(texts.filter(_.nonEmpty))
    val viaEval = texts.filter(_.nonEmpty).map(t => DeflateSizeExpr.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(t)))
    assert(viaDf == viaEval)
    val r = Seq("").toDF("t")
      .select(TextFunctions.compressionRatio(col("t"))).as[Double].head()
    assert(r == 0.0)
  }

  test("byte counts are UTF-8 based: multi-byte text sizes against its encoded length") {
    val s = "€" * 100 // 3 bytes each in UTF-8
    val row = Seq(s).toDF("t").select(
        octet_length(col("t")).cast("long"),
        TextFunctions.deflateSize(col("t")))
      .as[(Long, Long)].head()
    assert(row._1 == 300L && row._2 < 300L && row._2 > 0L)
  }
}
