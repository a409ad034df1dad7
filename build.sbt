ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dwetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked-run output normally routes through sbt's logger, which prefixes
// every line with "[info] " — that framing broke the driver's bench-line
// parse two rounds running. StdoutOutput pipes the child JVM's stdout
// straight through, so graft.Bench's JSON line lands bare on stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The 179-query suite Janino-compiles thousands of generated classes;
  // the JDK default 240m code cache fills mid-suite, JIT starts flushing
  // (or disables), and hash-loop-heavy queries (d18's XXH64 ladders) run
  // at interpreter speed for the rest of the pass — the BENCH_r12
  // driver-artifact signature (d18 2.7x slower at MIN level in suite
  // context vs solo, while light queries stayed tight).
  "-XX:ReservedCodeCacheSize=1g",
)
