package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named queries to one file each —
  * the before/after plan artifacts the optimization rounds commit under
  * `plans/r<N>/`. Run:
  *   sbt "runMain graft.ExplainDump <sfDir> <outDir> <q1,q2,...>"
  * A query name may carry a `:suffix` (e.g. `d02_ngram_jaccard:before`)
  * appended to the output filename.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus)
    Files.createDirectories(Paths.get(outDir))
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { spec =>
      val (name, suffix) = spec.split(":") match {
        case Array(n, s) => (n, "_" + s)
        case Array(n)    => (n, "")
      }
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      // queryExecution.explainString mirrors df.explain("formatted")
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"$name$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      spark.catalog.clearCache()
      println(s"[explain] wrote $outDir/$name$suffix.txt")
    }
    spark.stop()
  }
}
