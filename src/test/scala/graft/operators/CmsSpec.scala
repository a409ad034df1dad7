package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch laws backing q64: one-sided error (estimate never
  * under-counts), partitioning-invariant sketch bytes (cell-wise-additive
  * merge), and distributed-merge ≡ single-sketch estimates.
  */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish skew: key k appears ~1000/k times
  private def skewed = spark.range(1, 30)
    .select(explode(sequence(lit(1), (lit(1000) / col("id")).cast("int"))).as("rep"),
      col("id").as("k"))
    .select("k")

  private def sketchOf(df: org.apache.spark.sql.DataFrame): CountMinSketch = {
    val bytes = df.agg(expr("count_min_sketch(k, 0.1d, 0.9d, 42)"))
      .head.getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  test("estimates never under-count (one-sided error)") {
    val cms = sketchOf(skewed)
    val exact = skewed.groupBy("k").count().as[(Long, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      val est = cms.estimateCount(java.lang.Long.valueOf(k))
      assert(est >= n, s"key $k: est $est < exact $n")
    }
    // the small sketch must actually collide somewhere, or the law is vacuous
    assert(exact.exists { case (k, n) =>
      cms.estimateCount(java.lang.Long.valueOf(k)) > n },
      "fixture sanity: expected at least one visible overestimate")
  }

  test("sketch bytes are partitioning-invariant (cell-wise-additive merge)") {
    def bytes(df: org.apache.spark.sql.DataFrame) =
      df.agg(expr("count_min_sketch(k, 0.1d, 0.9d, 42)"))
        .head.getAs[Array[Byte]](0).toSeq
    assert(bytes(skewed.repartition(13)) == bytes(skewed.coalesce(1)))
  }

  test("merging part sketches estimates like one sketch of the union") {
    val a = skewed.filter(col("k") % 2 === 0)
    val b = skewed.filter(col("k") % 2 =!= 0)
    val merged = sketchOf(a)
    merged.mergeInPlace(sketchOf(b))
    val whole = sketchOf(skewed)
    (1L until 30L).foreach { k =>
      assert(merged.estimateCount(java.lang.Long.valueOf(k)) ==
        whole.estimateCount(java.lang.Long.valueOf(k)), s"key $k")
    }
  }
}
