package graft

import org.apache.spark.sql.SparkSession

/** One place to build correctly-configured local sessions so Verify, Bench
  * and the test suites agree on semantics-relevant settings.
  */
object Sessions {
  def local(cpus: String): SparkSession = {
    val b0 = SparkSession.builder()
    // profiling hook (builder-local, default off): SPARK_GRAFT_EVENTLOG=dir
    // writes Spark event logs there so job/stage timings can be read
    // without the UI (run / fork drops -D flags from the sbt command line)
    sys.env.get("SPARK_GRAFT_EVENTLOG").foreach { dir =>
      b0.config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", dir)
    }
    val spark = b0
      .master(s"local[$cpus]")
      // shuffle partitions sized to the local core count, not the 200 default
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // TESTDATA events.ts is parquet TIMESTAMP(NANOS); read as raw longs
      // (Tables.events converts to microsecond timestamps)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the default 100-entry generated-class cache thrashes under a
      // 176-query suite: every bench pass re-Janino-compiles every
      // stage it evicted (multi-stage iterative queries like d18 paid
      // ~10 s/pass in recompilation alone). Sized to hold the suite.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // native engine expressions (cosine_similarity) as SQL functions
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
