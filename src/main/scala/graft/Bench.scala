package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  * The same line is also written to `SPARK_GRAFT_BENCH_OUT` (default
  * `bench_out.json` in the working directory) so a log-tail truncation can
  * never lose it — round 1's driver captured only the tail of sbt stdout and
  * the 9-decimal timings pushed the line past the window (`parsed: null`).
  *
  * Timings are rounded to milliseconds (3 decimals): sub-ms precision is
  * noise at these scales and the shorter line survives log windows. A query
  * that THROWS is recorded as -1 — round 1 swallowed the error and recorded
  * the elapsed-until-throw as if it were a real timing.
  *
  * Methodology: one untimed warm-up pass (JIT + whole-stage-codegen compile +
  * parquet footer caches — one-time per-JVM costs that would otherwise land
  * entirely on whichever query happens to run first), then one timed pass.
  * Steady-state numbers are the ones that extrapolate to a long-lived
  * cluster. Set SPARK_GRAFT_WARMUP=0 to time cold instead.
  *
  * Each query is materialized through the `noop` sink, NOT `count()`:
  * count lets Catalyst prune every column the count doesn't need, so a
  * query whose cost lives in its output projection (regex scoring, hash
  * signatures) would time only its scan. The noop sink computes every
  * output row in full and discards it — the honest analog of a downstream
  * consumer, with zero write overhead.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val spark = Sessions.local(cpus)
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    if (warmup) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try materialize(fn(spark, sfDir)) catch { case _: Throwable => }
        spark.catalog.clearCache() // queries cache intermediates; don't let
                                   // storage pressure bleed across queries
      }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { materialize(fn(spark, sfDir)); true }
        catch { case t: Throwable =>
          System.err.println(s"BENCH FAIL $name: ${t.getClass.getName}: ${t.getMessage}")
          false
        }
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      spark.catalog.clearCache()
      name -> dt
    }
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // "materialize":"noop-sink" marks the round-3 methodology change: rounds
    // 1-2 timed count(), which let Catalyst prune un-counted output columns
    // — apparent per-query regressions vs those rounds are previously
    // unmeasured projection work, not plan changes
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","materialize":"noop-sink","queries":$qs,"sf":"$sfDir"}"""
    Files.write(Paths.get(outPath), (line + "\n").getBytes(StandardCharsets.UTF_8))
    println(line)
    spark.stop()
  }
}
