package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SCD Type-2 merge: version-chain semantics (close/open/insert/no-op),
  * null-safe change detection, idempotent re-merge, snapshot time travel,
  * and the touched-buckets-only rewrite contract.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("scd2").toString + "/dim"

  private def dim(rows: (Long, String, Double)*) =
    rows.toDF("id", "name", "bal")

  private def state(path: String) =
    spark.read.parquet(path)
      .select("id", "name", "bal", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Option[Double], Long, Option[Long], Boolean)]
      .collect().toSet

  test("close/open/insert/no-op across two batches, then snapshots") {
    val path = tmp()
    Scd2.merge(dim((1L, "a", 10.0), (2L, "b", 20.0)), path,
      Seq("id"), Seq("name", "bal"), batchId = 1L)
    // batch 2: key 1 changes, key 2 unchanged, key 3 new
    Scd2.merge(dim((1L, "a", 15.0), (2L, "b", 20.0), (3L, "c", 30.0)), path,
      Seq("id"), Seq("name", "bal"), batchId = 2L)
    assert(state(path) == Set(
      (1L, "a", Some(10.0), 1L, Some(2L), false),
      (1L, "a", Some(15.0), 2L, None, true),
      (2L, "b", Some(20.0), 1L, None, true),
      (3L, "c", Some(30.0), 2L, None, true)))
    // as-of batch 1: pre-change values, no key 3
    assert(Scd2.snapshotAt(spark, path, 1L).select("id", "bal")
      .as[(Long, Double)].collect().toSet == Set((1L, 10.0), (2L, 20.0)))
    assert(Scd2.readCurrent(spark, path).select("id", "bal")
      .as[(Long, Double)].collect().toSet ==
      Set((1L, 15.0), (2L, 20.0), (3L, 30.0)))
  }

  test("re-merging an already-applied batch is a no-op") {
    val path = tmp()
    Scd2.merge(dim((1L, "a", 10.0)), path, Seq("id"), Seq("name", "bal"), 1L)
    Scd2.merge(dim((1L, "a", 99.0)), path, Seq("id"), Seq("name", "bal"), 2L)
    val before = state(path)
    Scd2.merge(dim((1L, "a", 99.0)), path, Seq("id"), Seq("name", "bal"), 2L)
    assert(state(path) == before)
  }

  test("null-safe change detection: value->NULL and NULL->value both open versions") {
    val path = tmp()
    val b1 = Seq((1L, "a", Some(10.0)), (2L, "b", None)).toDF("id", "name", "bal")
    val b2 = Seq((1L, "a", None), (2L, "b", Some(5.0))).toDF("id", "name", "bal")
    Scd2.merge(b1, path, Seq("id"), Seq("name", "bal"), 1L)
    Scd2.merge(b2, path, Seq("id"), Seq("name", "bal"), 2L)
    assert(state(path) == Set(
      (1L, "a", Some(10.0), 1L, Some(2L), false),
      (1L, "a", None, 2L, None, true),
      (2L, "b", None, 1L, Some(2L), false),
      (2L, "b", Some(5.0), 2L, None, true)))
  }

  test("a stale batch clock is refused; an equal clock (idempotent replay) is not") {
    val path = tmp()
    Scd2.merge(dim((1L, "a", 10.0)), path, Seq("id"), Seq("name", "bal"), 5L)
    Scd2.merge(dim((1L, "a", 11.0)), path, Seq("id"), Seq("name", "bal"), 7L)
    // replay of batch 7 (same clock, same values): allowed, no-op
    val before = state(path)
    Scd2.merge(dim((1L, "a", 11.0)), path, Seq("id"), Seq("name", "bal"), 7L)
    assert(state(path) == before)
    // batch 6 arriving after 7: would open a version behind the chain head
    intercept[IllegalArgumentException] {
      Scd2.merge(dim((1L, "a", 12.0)), path, Seq("id"), Seq("name", "bal"), 6L)
    }
  }

  test("duplicate keys in a batch are rejected") {
    val path = tmp()
    Scd2.merge(dim((1L, "a", 1.0)), path, Seq("id"), Seq("name", "bal"), 1L)
    intercept[IllegalArgumentException] {
      Scd2.merge(dim((2L, "x", 1.0), (2L, "y", 2.0)), path,
        Seq("id"), Seq("name", "bal"), 2L)
    }
  }

  test("a merge rewrites only the buckets its keys hash into") {
    val path = tmp()
    val base = (1L to 200L).map(i => (i, s"n$i", i.toDouble)).toDF("id", "name", "bal")
    Scd2.merge(base, path, Seq("id"), Seq("name", "bal"), 1L, buckets = 16)
    val root = new java.io.File(path)
    def fileSet(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).map(_.getPath).filter(_.endsWith(".parquet")).toSet
    }
    val before = fileSet()
    // single-key update -> exactly one bucket partition rewritten
    Scd2.merge(dim((7L, "n7", 777.0)), path, Seq("id"), Seq("name", "bal"),
      2L, buckets = 16)
    val after = fileSet()
    val touchedDirs = (before -- after).map(p => new java.io.File(p).getParent) ++
      (after -- before).map(p => new java.io.File(p).getParent)
    assert(touchedDirs.nonEmpty && touchedDirs.size == 1,
      s"expected exactly one rewritten bucket dir, got $touchedDirs")
    // content is still the full dimension with one new version
    assert(Scd2.readCurrent(spark, path).count() == 200)
    assert(state(path).count(_._6 == false) == 1)
  }
}
