package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical distributions give PSI ~ 0") {
    val a = spark.range(1000).select((col("id") % 100).cast("double").as("v"))
    val psi = Drift.psiByBin(a, a, "v", bins = 10, lo = 0.0, hi = 100.0)
      .agg(sum("contrib")).as[Double].head()
    assert(math.abs(psi) < 1e-9, s"psi=$psi")
  }

  test("a shifted distribution produces a large PSI, out-of-range values clamp") {
    val ref = spark.range(1000).select((col("id") % 100).cast("double").as("v"))
    val shifted = spark.range(1000).select((col("id") % 100 + 150).cast("double").as("v"))
    val rows = Drift.psiByBin(ref, shifted, "v", bins = 10, lo = 0.0, hi = 100.0)
    assert(rows.count() == 10) // every bin present even when one side is empty
    val psi = rows.agg(sum("contrib")).as[Double].head()
    assert(psi > 0.25, s"psi=$psi should read 'shifted'") // all mass clamps to bin 9
  }

  test("PSI is a pure function of the data: stable across partitionings") {
    val ref = spark.range(5000).select((col("id") % 97).cast("double").as("v"))
    val cand = spark.range(5000).select((col("id") % 89).cast("double").as("v"))
    val a = Drift.psiByBin(ref.repartition(3), cand.repartition(5), "v", 10, 0.0, 100.0)
      .orderBy("bin").as[(Int, Double, Double, Double)].collect().toSeq
    val b = Drift.psiByBin(ref.repartition(11), cand, "v", 10, 0.0, 100.0)
      .orderBy("bin").as[(Int, Double, Double, Double)].collect().toSeq
    assert(a == b)
  }
}
