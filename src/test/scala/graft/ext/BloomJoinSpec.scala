package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BloomJoin must be EXACTLY a semi/anti join (the bloom only prunes;
  * the downstream exact join settles membership), and the prune must
  * actually prune (definite non-members never reach the join).
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def probe = spark.range(0, 10000)
    .select(col("id"), (col("id") % 97).as("tag"))
  private def build = spark.range(0, 10000, 7) // every 7th id
    .select(col("id"))

  test("semi equals the plain left-semi join, row for row") {
    val got = BloomJoin.semi(probe, build, Seq("id"), expectedItems = 2000)
      .select("id").as[Long].collect().sorted
    val want = probe.join(build, Seq("id"), "left_semi")
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want) && got.length == 1429)
  }

  test("anti equals the plain left-anti join, row for row") {
    val got = BloomJoin.anti(probe, build, Seq("id"), expectedItems = 2000)
      .select("id").as[Long].collect().sorted
    val want = probe.join(build, Seq("id"), "left_anti")
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want) && got.length == 10000 - 1429)
  }

  test("multi-column keys and null keys behave like the exact joins") {
    val p = Seq((1L, "a"), (2L, "b"), (3L, null), (4L, "d"))
      .toDF("k1", "k2")
    val b = Seq((1L, "a"), (3L, null), (9L, "z")).toDF("k1", "k2")
    val semi = BloomJoin.semi(p, b, Seq("k1", "k2"), expectedItems = 16)
      .select("k1").as[Long].collect().sorted
    val antiRows = BloomJoin.anti(p, b, Seq("k1", "k2"), expectedItems = 16)
      .select("k1").as[Long].collect().sorted
    // null keys never equi-match: (3, null) is NOT a semi match even though
    // the build side has the same shape, and it survives the anti join
    assert(semi.toSeq == Seq(1L))
    assert(antiRows.toSeq == Seq(2L, 3L, 4L))
  }

  test("the bloom prunes before the join: definite non-members are filtered map-side") {
    val bloom = BloomJoin.bloomOf(build, Seq("id"), expectedItems = 2000)
    val pruned = probe.filter(
      graft.plans.BloomMightContainExpr.mightContain(xxhash64(col("id")), bloom))
    val survivors = pruned.count()
    // 1429 true members survive; false positives at ~1% of the 8571
    // non-members add a small overhead the exact join later drops
    assert(survivors >= 1429 && survivors < 1429 + 500,
      s"prune passed $survivors of 10000 — bloom is not pruning")
    // no false negatives: every true member passes the bloom
    val members = build.join(pruned, Seq("id"), "left_semi").count()
    assert(members == 1429)
  }

  test("might_contain agrees between interpreted eval and codegen") {
    val bloom = BloomJoin.bloomOf(build, Seq("id"), expectedItems = 2000)
    val c = graft.plans.BloomMightContainExpr.mightContain(xxhash64(col("id")), bloom)
    // spark.range is a codegen source; a local Seq goes through eval
    val viaCodegen = spark.range(0, 2000).select(col("id"), c.as("m"))
      .as[(Long, Boolean)].collect().toMap
    val viaEval = (0L until 2000L).toDF("id").select(col("id"), c.as("m"))
      .as[(Long, Boolean)].collect().toMap
    assert(viaCodegen == viaEval)
  }
}
