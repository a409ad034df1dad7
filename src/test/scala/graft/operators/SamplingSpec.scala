package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def df = spark.range(1000)
    .select(col("id"), (col("id") % 7).as("g"))

  test("stratified draws exactly min(k, stratum size) per stratum") {
    val got = Sampling.stratified(df, Seq("g"), 10, Seq("id"))
      .groupBy("g").count().as[(Long, Long)].collect().toMap
    assert(got.values.forall(_ == 10) && got.size == 7)
    // k larger than the stratum: whole stratum, no padding
    val tiny = Seq((1L, 0L), (2L, 0L), (3L, 1L)).toDF("id", "g")
    val all = Sampling.stratified(tiny, Seq("g"), 10, Seq("id")).count()
    assert(all == 3)
  }

  test("the draw is a pure function of the data: stable across partitionings") {
    val a = Sampling.stratified(df.repartition(3), Seq("g"), 10, Seq("id"))
      .select("id").as[Long].collect().toSet
    val b = Sampling.stratified(df.repartition(17, col("id")), Seq("g"), 10, Seq("id"))
      .select("id").as[Long].collect().toSet
    assert(a == b)
    // and it is not just "first k by key": the hash order scrambles
    assert(a != (0L until 70L).toSet)
  }

  test("draws are nested: the k=5 sample is a subset of the k=10 sample") {
    val k5 = Sampling.stratified(df, Seq("g"), 5, Seq("id"))
      .select("id").as[Long].collect().toSet
    val k10 = Sampling.stratified(df, Seq("g"), 10, Seq("id"))
      .select("id").as[Long].collect().toSet
    assert(k5.subsetOf(k10) && k5.size == 35 && k10.size == 70)
  }
}
