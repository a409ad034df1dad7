package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The codegen'd IVF assignment must be bit-equivalent to the
  * higher-order-function composition it replaced (same fold order, same
  * strictly-less argmin), stay inside whole-stage codegen, and null out on
  * malformed input.
  */
class NearestCentroidExprSpec extends SparkSpec {
  import spark.implicits._

  // the replaced HOF reference implementation, verbatim
  private def hofNearest(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column =
    array_min(array(centroids.map { case (cell, c) =>
      struct(
        aggregate(
          zip_with(vec, typedLit(c), (x, cc) => {
            val d = x.cast("double") - cc; d * d
          }),
          lit(0.0), (acc, x) => acc + x).as("dist"),
        lit(cell).as("cell"))
    }: _*)).getField("cell")

  private val cb: Seq[(Int, Seq[Double])] = Seq(
    0 -> Seq(0.0, 0.0, 1.0, -0.5),
    2 -> Seq(1.0, 2.0, -1.0, 0.25), // note the gap: cell ids need not be dense
    5 -> Seq(-3.0, 0.5, 0.0, 2.0))

  test("matches the HOF composition on float vectors, including gaps in cell ids") {
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(4)(j => (((i * 31 + j * 17) % 41) / 7.0f) - 2.5f))
    }.toDF("id", "v")
    val both = vecs.select(col("id"),
      NearestCentroidExpr.nearest(col("v"), cb).as("fast"),
      hofNearest(col("v"), cb).as("ref"))
    assert(both.filter(col("fast") =!= col("ref")).count() == 0)
    val seen = both.select("fast").distinct().as[Int].collect().toSet
    assert(seen.subsetOf(Set(0, 2, 5)) && seen.size > 1)
  }

  test("tie between centroids keeps the lowest cell id") {
    // equidistant from cells 3 and 7 (same centroid duplicated)
    val tied = Seq((1L, Array(9.0, 9.0))).toDF("id", "v")
    val cbTied = Seq(7 -> Seq(1.0, 1.0), 3 -> Seq(1.0, 1.0))
    val got = tied.select(NearestCentroidExpr.nearest(col("v"), cbTied))
      .as[Int].head()
    assert(got == 3)
  }

  test("null vector, null element, and dim mismatch all yield null") {
    val df = Seq(
      (1L, null.asInstanceOf[Array[java.lang.Double]]),
      (2L, Array[java.lang.Double](1.0, null)),
      (3L, Array[java.lang.Double](1.0, 2.0, 3.0))) // dim 3 vs codebook dim 2
      .toDF("id", "v")
    val cb2 = Seq(0 -> Seq(0.0, 0.0))
    val got = df.select(NearestCentroidExpr.nearest(col("v"), cb2)).collect()
    assert(got.forall(_.isNullAt(0)))
  }

  test("NaN element (all distances NaN) yields null, not cells[-1]") {
    // NaN passes the null check but poisons every distance; `d < bestDist`
    // never fires, best stays -1 — both eval and codegen must null out
    // instead of indexing cells[-1]
    val local = Seq((1L, Array(Double.NaN, 1.0))).toDF("id", "v") // interpreted eval
    val cb2 = Seq(0 -> Seq(0.0, 0.0), 1 -> Seq(1.0, 1.0))
    assert(local.select(NearestCentroidExpr.nearest(col("v"), cb2))
      .collect().forall(_.isNullAt(0)))
    val codegen = spark.range(3).select( // codegen source → doGenCode path
      array(lit(Double.NaN), col("id").cast("double")).as("v"))
    assert(codegen.select(NearestCentroidExpr.nearest(col("v"), cb2))
      .collect().forall(_.isNullAt(0)))
  }

  test("assignment stays inside whole-stage codegen with fused generated code") {
    // spark.range is a codegen source (a local Seq short-circuits to
    // LocalTableScan and proves nothing); the expression must live inside a
    // WholeStageCodegen stage AND emit its own fused loop — doGenCode, not
    // the CodegenFallback path HOF lambdas take inside a codegen'd stage
    val vecs = spark.range(100).select(col("id"),
      array((0 until 4).map(i => (col("id") + i).cast("double")): _*).as("v"))
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val fused = vecs.select(NearestCentroidExpr.nearest(col("v"), cb).as("cell"))
    val stages = fused.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec if w.toString.contains("Project") => w
    }
    assert(stages.nonEmpty)
    val (_, source) = stages.head.doCodeGen()
    // the argmin loop is generated inline (no fallback eval of the expr)
    assert(source.body.contains("POSITIVE_INFINITY"))
  }
}
