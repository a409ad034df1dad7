package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitManifestSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("splitman").toString + "/store"

  private val fr = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))

  private def assigned = Sampling.deterministicSplit(
    spark.range(200).select(col("id"), (col("id") % 3).as("g")),
    Seq("g"), Seq("id"), fr, seed = 11L)

  test("release + read round-trips spec, manifest counts and assignment") {
    val dir = tmpDir()
    val spec = SplitManifest.Spec(11L, fr, Seq("g"), Seq("id"))
    SplitManifest.release(assigned, dir, spec)
    assert(SplitManifest.readSpec(spark, dir) == spec)
    val man = SplitManifest.readManifest(spark, dir)
      .select("split", "fraction", "n_rows", "seed", "strata_cols",
        "key_cols", "split_col")
      .as[(String, Double, Long, Long, String, String, String)]
      .collect().map(r => r._1 -> r).toMap
    val want = assigned.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    fr.foreach { case (name, f) =>
      val row = man(name)
      assert(row._2 == f && row._3 == want(name) && row._4 == 11L &&
        row._5 == "g" && row._6 == "id" && row._7 == "split", row)
    }
    // the stored assignment IS the released one
    val back = SplitManifest.readAssignment(spark, dir)
      .as[(Long, Long, String)].collect().toSet
    assert(back == assigned.as[(Long, Long, String)].collect().toSet)
  }

  test("grouped spec round-trips group_col; empty strata round-trip") {
    val dir = tmpDir()
    val spec = SplitManifest.Spec(7L, fr, Nil, Seq("id"),
      groupCol = Some("grp"))
    SplitManifest.release(
      assigned.withColumnRenamed("g", "grp"), dir, spec)
    assert(SplitManifest.readSpec(spark, dir) == spec)
    val man = SplitManifest.readManifest(spark, dir)
    assert(man.select("group_col").distinct.as[String].collect()
      .toSeq == Seq("grp"))
  }

  test("re-release advances the CAS generation and replaces the artifact") {
    val dir = tmpDir()
    val spec = SplitManifest.Spec(11L, fr, Seq("g"), Seq("id"))
    SplitManifest.release(assigned, dir, spec)
    val spec2 = spec.copy(seed = 12L)
    val assigned2 = Sampling.deterministicSplit(
      spark.range(100).select(col("id"), (col("id") % 3).as("g")),
      Seq("g"), Seq("id"), fr, seed = 12L)
    SplitManifest.release(assigned2, dir, spec2)
    assert(SplitManifest.readSpec(spark, dir) == spec2)
    assert(SplitManifest.readManifest(spark, dir)
      .agg(sum("n_rows")).as[Long].head() == 100L)
  }

  test("a manifest whose counts came from the written files, not the frame") {
    // deterministic split is a pure function, so re-reading the written
    // assignment must reproduce the in-memory counts exactly
    val dir = tmpDir()
    SplitManifest.release(assigned, dir,
      SplitManifest.Spec(11L, fr, Seq("g"), Seq("id")))
    val fromStore = SplitManifest.readAssignment(spark, dir)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val man = SplitManifest.readManifest(spark, dir)
      .select("split", "n_rows").as[(String, Long)].collect().toMap
    assert(man == fromStore)
  }

  test("a missing split column fails BEFORE the corpus write") {
    val dir = tmpDir()
    intercept[IllegalArgumentException] {
      SplitManifest.release(assigned.drop("split"), dir,
        SplitManifest.Spec(11L, fr, Seq("g"), Seq("id")))
    }
    // nothing landed — no orphan relation, no meta
    assert(!new java.io.File(dir).exists())
  }

  test("a non-string split column releases through the string cast") {
    val dir = tmpDir()
    val numeric = assigned.withColumn("split",
      when(col("split") === "train", 0)
        .when(col("split") === "val", 1).otherwise(2))
    val nfr = Seq(("0", 0.8), ("1", 0.1), ("2", 0.1))
    SplitManifest.release(numeric, dir,
      SplitManifest.Spec(11L, nfr, Seq("g"), Seq("id")))
    val man = SplitManifest.readManifest(spark, dir)
      .select("split", "n_rows").as[(String, Long)].collect().toMap
    val want = numeric.groupBy(col("split").cast("string"))
      .count().as[(String, Long)].collect().toMap
    assert(man == want)
  }

  test("relations live under the meta's rel_gen+rel_tag; re-release " +
    "advances the generation and sweeps two behind") {
    val dir = tmpDir()
    val spec = SplitManifest.Spec(11L, fr, Seq("g"), Seq("id"))
    def dirs(gen: Int): Seq[String] =
      Option(new java.io.File(dir).list()).toSeq.flatten
        .filter(_.matches(s"assignment_e${gen}_w[0-9a-f]+"))
    SplitManifest.release(assigned, dir, spec)   // gen 0
    assert(dirs(0).size == 1)
    SplitManifest.release(assigned, dir, spec)   // gen 1
    assert(dirs(1).size == 1)
    // the just-superseded generation is kept one cycle for readers
    assert(dirs(0).size == 1)
    SplitManifest.release(assigned, dir, spec)   // gen 2, gen 0 swept
    assert(dirs(2).size == 1)
    assert(dirs(0).isEmpty)
    assert(SplitManifest.readAssignment(spark, dir).count() == 200L)
  }

  test("a CAS-losing concurrent release can never clobber the winner's " +
    "relations (attempt-tagged directories)") {
    val dir = tmpDir()
    val spec = SplitManifest.Spec(11L, fr, Seq("g"), Seq("id"))
    SplitManifest.release(assigned, dir, spec)             // live at gen 0
    val live = SplitManifest.readAssignment(spark, dir).count()
    // a racer that read gen -1 concurrently and writes "its" gen-0
    // relations AFTER the winner published: with the attempt tag its
    // target directory is distinct, so the live pointer's data is intact
    // (pre-tag, it overwrote the winner's directory in place)
    val racerTarget = s"$dir/assignment_e0_wdeadbeef"
    spark.range(5).select(col("id"), lit(0L).as("g"),
        lit("train").as("split"))
      .write.parquet(racerTarget)
    assert(SplitManifest.readAssignment(spark, dir).count() == live)
    // and the orphan ages out two releases later
    SplitManifest.release(assigned, dir, spec)             // gen 1
    SplitManifest.release(assigned, dir, spec)             // gen 2
    assert(!new java.io.File(racerTarget).exists())
  }

  test("a half-landed newer write never shadows the live release") {
    val dir = tmpDir()
    val spec = SplitManifest.Spec(11L, fr, Seq("g"), Seq("id"))
    SplitManifest.release(assigned, dir, spec)
    // simulate a writer that crashed AFTER its relation writes but BEFORE
    // the CAS publish: relations exist at the next generation, meta still
    // points at the released one — readers must resolve THROUGH the meta
    spark.range(5).select(col("id"), lit(0L).as("g"),
        lit("train").as("split"))
      .write.parquet(
        graft.sources.StoredIndex.relPath(dir, "assignment", 1))
    assert(SplitManifest.readAssignment(spark, dir).count() == 200L)
  }

  test("reading an uninitialized or foreign store fails loudly") {
    intercept[IllegalArgumentException] {
      SplitManifest.readManifest(spark, tmpDir())
    }
    // a dir carrying some OTHER StoredIndex client's meta is refused
    val dir = tmpDir()
    graft.sources.StoredIndex.writeMetaCas(spark, dir,
      Seq("kind" -> "ann_index"), -1)
    intercept[IllegalArgumentException] {
      SplitManifest.readAssignment(spark, dir)
    }
  }
}
