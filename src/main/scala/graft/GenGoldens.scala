package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Generates the committed golden parquets for the approximate-by-design
  * queries (see [[graft.queries.GoldenOracles]]): runs each at sf0.01 — the
  * scale the driver's correctness gate verifies at — and snapshots the
  * result as a single parquet file under src/test/resources/golden/.
  *
  * Run via tools/gen_goldens.sh ONLY on an intentional behavior change, and
  * eyeball the diff: the committed files are the regression target.
  */
object GenGoldens {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    // optional second arg: comma-list of names — regenerate ONLY those
    // (adding a new golden must not re-snapshot every existing one)
    val only = args.drop(1).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val outDir = queries.GoldenOracles.dir
    Files.createDirectories(Paths.get(outDir))
    queries.GoldenOracles.names
      .filter(n => only.forall(_.contains(n))).foreach { name =>
      val tmp = s"/root/repo/target/qtmp/golden_gen/$name"
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(s"$outDir/$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      println(s"golden: $name -> $outDir/$name.parquet")
    }
    spark.stop()
  }
}
