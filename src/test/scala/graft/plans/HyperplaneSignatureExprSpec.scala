package graft.plans

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** The codegen'd LSH signature must be bit-equivalent to the HOF column
  * composition — same hyperplanes (xxhash64-derived signs), same fold
  * order, same swallow-null-to-zero edge.
  */
class HyperplaneSignatureExprSpec extends SparkSpec {
  import spark.implicits._

  test("equals the HOF composition on random float vectors") {
    val dim = 16; val planes = 8
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-5.0f, 5.0f)).map(_.toArray)
    val vecs = Gen.listOfN(300, vecGen).sample.get.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val both = vecs.toDF("id", "v").select(
      HyperplaneSignatureExpr.signature(col("v"), dim, planes).as("fast"),
      VectorFunctions.hyperplaneSignature(col("v"), dim, planes).as("ref"))
      .as[(Long, Long)].collect()
    both.foreach { case (fast, ref) => assert(fast == ref) }
    // signatures actually spread over buckets
    assert(both.map(_._1).distinct.length > 4)
  }

  test("null vector folds to signature 0, like the column algebra") {
    val df = Seq((1L, null.asInstanceOf[Array[Float]]),
      (2L, Array.fill(4)(1.0f))).toDF("id", "v")
    val got = df.select(col("id"),
      HyperplaneSignatureExpr.signature(col("v"), 4, 6).as("sig"))
      .as[(Long, Long)].collect().toMap
    val ref = df.select(col("id"),
      VectorFunctions.hyperplaneSignature(col("v"), 4, 6).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 0L && ref(1L) == 0L)
    assert(got(2L) == ref(2L))
  }
}
