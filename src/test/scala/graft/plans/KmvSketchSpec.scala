package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV sketch laws: exactness below k, bounded estimation error, LOSSLESS
  * merge (kmin(A ∪ B) = kmin(kmin A ∪ kmin B) — byte equality, not
  * approximation), intersection estimation, and partitioning-independent
  * bytes (what lets the q40/q41 goldens exist).
  */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(df: org.apache.spark.sql.DataFrame, c: String, k: Int = 256) =
    df.agg(KmvSketch.sketch(col(c), k).as("sk"))

  test("below k uniques the sketch is exact") {
    val df = (1 to 100).map(_ % 40).toDF("v") // 40 distinct, k=256
    val est = sketchOf(df, "v")
      .select(KmvSketch.estimate(col("sk"))).as[Double].head()
    assert(est == 40.0)
  }

  test("estimate lands within 4 sigma at 10k distinct, k=256") {
    val df = (1 to 30000).map(i => (i * 7919) % 10000).toDF("v") // 10k distinct
    val est = sketchOf(df, "v")
      .select(KmvSketch.estimate(col("sk"))).as[Double].head()
    // RSE ~ 1/sqrt(254) ~ 6.3%; 4 sigma ~ 25%
    assert(math.abs(est - 10000) / 10000 < 0.25, s"est=$est")
  }

  test("merge of two sketches equals the sketch of the union, byte for byte") {
    val a = (1 to 5000).toDF("v")
    val b = (3000 to 8000).toDF("v")
    val skA = sketchOf(a, "v").as[Array[Byte]].head()
    val skB = sketchOf(b, "v").as[Array[Byte]].head()
    val skUnion = sketchOf(a.union(b), "v").as[Array[Byte]].head()
    val merged = Seq((skA, skB)).toDF("a", "b")
      .select(KmvSketch.merge(col("a"), col("b"))).as[Array[Byte]].head()
    assert(merged.toSeq == skUnion.toSeq)
  }

  test("intersection estimate tracks the true overlap") {
    val a = (1 to 6000).toDF("v")
    val b = (4001 to 10000).toDF("v") // true intersection: 2000
    val skA = sketchOf(a, "v").as[Array[Byte]].head()
    val skB = sketchOf(b, "v").as[Array[Byte]].head()
    val est = Seq((skA, skB)).toDF("a", "b")
      .select(KmvSketch.intersectEstimate(col("a"), col("b")))
      .as[Double].head()
    assert(math.abs(est - 2000) / 2000 < 0.4, s"est=$est")
  }

  test("sketch bytes are identical under different partitionings") {
    val data = (1 to 20000).map(i => (i * 31) % 7000)
    val s1 = sketchOf(data.toDF("v").repartition(3), "v").as[Array[Byte]].head()
    val s2 = sketchOf(data.toDF("v").repartition(11), "v").as[Array[Byte]].head()
    assert(s1.toSeq == s2.toSeq)
  }

  test("strings and nulls: nulls skipped, distinct strings counted") {
    val df = Seq("a", "b", null, "a", "c", null).toDF("v")
    val est = sketchOf(df, "v")
      .select(KmvSketch.estimate(col("sk"))).as[Double].head()
    assert(est == 3.0)
  }

  test("unsupported child type fails analysis, not per-row at execution") {
    // hashValue dispatches on runtime class; without checkInputDataTypes an
    // array column passed analysis and threw IllegalArgumentException per row
    val df = Seq(Seq(1, 2), Seq(3)).toDF("v")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(KmvSketch.sketch(col("v"), 64).as("sk")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("kmv_sketch"))
    // date/timestamp ride the Int/Long internal reps — must stay admitted
    val dts = Seq("2024-01-01", "2024-01-02", "2024-01-01").toDF("s")
      .select(col("s").cast("date").as("d"), col("s").cast("timestamp").as("t"))
    val ests = dts.agg(
      KmvSketch.estimate(KmvSketch.sketch(col("d"), 64)).as("ed"),
      KmvSketch.estimate(KmvSketch.sketch(col("t"), 64)).as("et"))
      .as[(Double, Double)].head()
    assert(ests == ((2.0, 2.0)))
  }

  test("mergeAgg folds many sketches to the one-shot union sketch, byte for byte") {
    val df = spark.range(3000)
      .select((col("id") % 500).as("v"), (col("id") % 30).as("g"))
    val parts = df.groupBy("g").agg(KmvSketch.sketch(col("v"), 64).as("sk"))
    val folded = parts.agg(KmvSketch.mergeAgg(col("sk")))
      .head.getAs[Array[Byte]](0)
    val whole = df.agg(KmvSketch.sketch(col("v"), 64))
      .head.getAs[Array[Byte]](0)
    assert(folded.toSeq == whole.toSeq)
    // fold order / partitioning cannot perturb the union
    val folded2 = parts.repartition(7).agg(KmvSketch.mergeAgg(col("sk")))
      .head.getAs[Array[Byte]](0)
    assert(folded2.toSeq == whole.toSeq)
    // empty input group -> null, not a crash
    assert(parts.filter(col("g") < 0).agg(KmvSketch.mergeAgg(col("sk")))
      .head.isNullAt(0))
  }
}
