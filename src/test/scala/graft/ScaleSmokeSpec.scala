package graft

/** CI gate for the capped-operator skew smoke: the same measurement +
  * 2×-of-linear budget as `graft.ScaleSmoke`'s standalone main, wired into
  * `sbt test` so a cap regression (an uncapped bucket going quadratic
  * under a hot key) fails a gate instead of only discoloring a README
  * table.
  *
  * Timing-based, so OPT-IN: runs only with `SPARK_GRAFT_SMOKE=1` (and an
  * optional `SPARK_GRAFT_SMOKE_SF_DIR`, default sf0.1 — the scale whose
  * noise floor the 2× budget was calibrated on). Canceled (not passed)
  * otherwise, so a plain `sbt test` stays fast and deterministic.
  *
  *   SPARK_GRAFT_SMOKE=1 sbt "testOnly graft.ScaleSmokeSpec"
  */
class ScaleSmokeSpec extends SparkSpec {

  test("capped near-dup/ANN operators stay within 2x of linear under a hot key") {
    assume(sys.env.get("SPARK_GRAFT_SMOKE").contains("1"),
      "opt-in: set SPARK_GRAFT_SMOKE=1 to run the skew smoke gate")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.1")
    val copies = 10
    val results = ScaleSmoke.cappedSection(spark, sfDir, copies)
    assert(results.nonEmpty)
    results.foreach { m =>
      info(f"${m.name}%-22s 1x=${m.tSmall}%6.2fs ${copies}x+hot=${m.tBig}%7.2fs " +
        f"rows=${m.rows}%8d vs-linear=${m.slowdownVsLinear(copies)}%5.2fx")
    }
    val bad = results.filter(_.slowdownVsLinear(copies) > 2.0)
    assert(bad.isEmpty,
      s"super-linear under hot key: ${bad.map(m => s"${m.name}=${m.slowdownVsLinear(copies)}x").mkString(", ")}")
  }
}
