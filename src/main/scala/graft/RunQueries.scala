package graft

/** Dev tool: run named registry queries against a scale-factor dir without
  * the full Verify sweep — `runMain graft.RunQueries s05_watermark_late …`
  * (dir from SPARK_GRAFT_SF_DIR, default sf0.01). Prints row count and
  * wall time per query; with no args, lists registered names.
  */
object RunQueries {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      SparkEntry.queries.keys.toSeq.sorted.foreach(println)
      return
    }
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      val t0 = System.nanoTime()
      try {
        val n = SparkEntry.queries(name)(spark, dir).count()
        println(f"[runq] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
      } catch {
        case e: Throwable =>
          println(s"[runq] $name FAILED: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}
