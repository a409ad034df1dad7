package graft.plans

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

import scala.util.Random

/** The native expression must be bit-identical to the higher-order-function
  * composition (same accumulation order) — differential-tested on random
  * vectors — and must plan inside WholeStageCodegen.
  */
class CosineSimilarityExprSpec extends SparkSpec {
  import spark.implicits._

  test("differential: expression == HOF composition, bit for bit") {
    val rnd = new Random(7)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextFloat() * 2 - 1),
      Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val diffs = df.select(
        CosineSimilarityExpr.cosine(col("a"), col("b")).as("fast"),
        VectorFunctions.cosineSimilarity(col("a"), col("b")).as("ref"))
      .as[(Double, Double)].collect()
    diffs.foreach { case (fast, ref) => assert(fast == ref) } // exact equality
  }

  test("null semantics: null input, length mismatch, null element, zero norm") {
    val df = Seq(
      (Some(Array(1f, 2f)), None: Option[Array[Float]]),
      (Some(Array(1f, 2f)), Some(Array(1f, 2f, 3f))),
      (Some(Array(0f, 0f)), Some(Array(1f, 2f)))).toDF("a", "b")
    val got = df.select(CosineSimilarityExpr.cosine(col("a"), col("b")).as("c"))
      .as[Option[Double]].collect().toSeq
    assert(got == Seq(None, None, None))
  }

  test("registered as SQL function via GraftExtensions") {
    val one = spark.sql(
      "SELECT cosine_similarity(array(1.0F, 2.0F), array(1.0F, 2.0F)) AS c")
      .as[Double].collect().head
    assert(math.abs(one - 1.0) < 1e-12)
  }

  test("plans inside WholeStageCodegen (no codegen fallback)") {
    // non-literal, codegen-friendly input: literals would constant-fold the
    // whole expression away, and higher-order functions (transform) are
    // CodegenFallback and would evict the Project from the codegen stage
    val df = spark.range(8).select(
        array((col("id") + 1).cast("float"), (col("id") + 2).cast("float"),
          (col("id") + 3).cast("float")).as("a"),
        array((col("id") + 2).cast("float"), (col("id") + 4).cast("float"),
          (col("id") + 6).cast("float")).as("b"))
      .select(CosineSimilarityExpr.cosine(col("a"), col("b")).as("c"))
    // WholeStageCodegenExec prints as a "*(stageId)" prefix in the plan
    val projectLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("cosine_similarity")).get
    assert(projectLine.trim.startsWith("*("), projectLine)
    df.as[Double].collect().foreach(c => assert(c > 0.9 && c <= 1.0))
  }
}
