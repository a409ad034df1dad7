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

  test("windowedPsi: a window matching the baseline scores ~0, a shifted window does not") {
    import java.sql.Timestamp
    // window 0 (hour 0): uniform over both bins; window 1 (hour 6): all mass in bin 0
    val evs =
      (0 until 10).map(i => (new Timestamp((i * 60) * 1000L), (i % 2) * 50.0 + 1.0)) ++
      (0 until 10).map(i => (new Timestamp((6 * 3600 + i * 60) * 1000L), 1.0))
    val out = Drift.windowedPsi(evs.toDF("ts", "v"), "ts", "v",
        "6 hours", refMasses = Seq(0.5, 0.5), lo = 0.0, hi = 100.0)
      .orderBy("window_start", "bin")
      .as[(Timestamp, Int, Double, Double)].collect().toSeq
    assert(out.size == 4) // 2 windows x 2 bins, zero bins included
    val w0 = out.take(2)
    assert(w0.map(_._4).map(math.abs).sum < 1e-9, s"uniform window must score ~0: $w0")
    val w1psi = out.drop(2).map(_._4).sum
    assert(w1psi > 0.25, s"fully-shifted window must flag as shifted: $w1psi")
    assert(out(2)._3 == 1.000001 && out(3)._3 == 0.000001) // smoothed masses
  }
}
