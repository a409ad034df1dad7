package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ParquetWarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("dynamic partition overwrite rewrites only the touched partitions") {
    val path = "/root/repo/target/qtmp/warehouse_dyn"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))

    // initial load: three day-partitions
    val day1 = Seq((1, "2024-01-01", 10.0), (2, "2024-01-01", 20.0),
      (3, "2024-01-02", 30.0), (4, "2024-01-03", 40.0))
      .toDF("id", "day", "v")
    ParquetWarehouse.overwritePartitions(day1, path, Seq("day"))
    assert(ParquetWarehouse.read(spark, path).count() == 4)

    // re-run of ONLY day 2 with corrected data: days 1 and 3 must survive
    val day2fix = Seq((3, "2024-01-02", 99.0), (5, "2024-01-02", 55.0))
      .toDF("id", "day", "v")
    ParquetWarehouse.overwritePartitions(day2fix, path, Seq("day"))

    val after = ParquetWarehouse.read(spark, path)
      .select("id", "day", "v").as[(Int, String, Double)].collect().toSet
    assert(after == Set(
      (1, "2024-01-01", 10.0), (2, "2024-01-01", 20.0),
      (3, "2024-01-02", 99.0), (5, "2024-01-02", 55.0),
      (4, "2024-01-03", 40.0)))

    // rerunning the same batch is idempotent
    ParquetWarehouse.overwritePartitions(day2fix, path, Seq("day"))
    assert(ParquetWarehouse.read(spark, path).count() == 5)
  }

  test("upsert replaces matched keys, appends new ones, leaves other partitions alone") {
    val path = "/root/repo/target/qtmp/warehouse_upsert"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))

    // bootstrap through upsert itself (empty table path)
    val base = Seq((1, "2024-01-01", 10.0, 1L), (2, "2024-01-01", 20.0, 1L),
      (3, "2024-01-02", 30.0, 1L), (4, "2024-01-03", 40.0, 1L))
      .toDF("id", "day", "v", "version")
    ParquetWarehouse.upsert(base, path, Seq("id"), Seq("day"), "version")
    assert(ParquetWarehouse.read(spark, path).count() == 4)

    // batch touches days 1 and 2: id=1 updated, id=5 new, id=3 carries an
    // OLDER version and must NOT replace the current row
    val batch = Seq((1, "2024-01-01", 11.0, 2L), (5, "2024-01-02", 50.0, 2L),
      (3, "2024-01-02", 99.0, 0L))
      .toDF("id", "day", "v", "version")
    ParquetWarehouse.upsert(batch, path, Seq("id"), Seq("day"), "version")

    val after = ParquetWarehouse.read(spark, path)
      .select("id", "day", "v").as[(Int, String, Double)].collect().toSet
    assert(after == Set(
      (1, "2024-01-01", 11.0), (2, "2024-01-01", 20.0),
      (3, "2024-01-02", 30.0), (5, "2024-01-02", 50.0),
      (4, "2024-01-03", 40.0)))

    // equal versions: the batch wins (it is authoritative for its keys)
    val again = Seq((2, "2024-01-01", 22.0, 1L)).toDF("id", "day", "v", "version")
    ParquetWarehouse.upsert(again, path, Seq("id"), Seq("day"), "version")
    val v2 = ParquetWarehouse.read(spark, path)
      .filter(col("id") === 2).select("v").as[Double].head()
    assert(v2 == 22.0)
    // idempotent re-run
    ParquetWarehouse.upsert(again, path, Seq("id"), Seq("day"), "version")
    assert(ParquetWarehouse.read(spark, path).count() == 5)
  }

  test("partition pruning reaches the partitioned table on read") {
    val path = "/root/repo/target/qtmp/warehouse_dyn"
    val q = ParquetWarehouse.read(spark, path).filter(col("day") === "2024-01-02")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"), plan)
    assert(q.count() == 2)
  }

  test("compactPartitions folds fragmented partitions to one file, leaves compact ones alone") {
    val path = "/root/repo/target/qtmp/warehouse_compact"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    // day 1 and 2 fragmented by three appends; day 3 written once (compact)
    for (i <- 0 until 3)
      Seq((i * 10 + 1, "2024-01-01", 1.0 + i), (i * 10 + 2, "2024-01-02", 2.0 + i))
        .toDF("id", "day", "v").repartition(1)
        .write.mode("append").partitionBy("day").parquet(path)
    Seq((100, "2024-01-03", 9.0)).toDF("id", "day", "v").repartition(1)
      .write.mode("append").partitionBy("day").parquet(path)
    def files(day: String): Seq[java.io.File] =
      new java.io.File(s"$path/day=$day").listFiles.toSeq
        .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(files("2024-01-01").size == 3 && files("2024-01-03").size == 1)
    val before = ParquetWarehouse.read(spark, path)
      .select("id", "day", "v").as[(Int, String, Double)].collect().toSet
    val untouchedName = files("2024-01-03").head.getName
    val n = ParquetWarehouse.compactPartitions(spark, path, Seq("day"))
    assert(n == 2, s"expected 2 fragmented partitions compacted, got $n")
    // every fragmented partition folded to one file; content identical
    assert(files("2024-01-01").size == 1 && files("2024-01-02").size == 1)
    val after = ParquetWarehouse.read(spark, path)
      .select("id", "day", "v").as[(Int, String, Double)].collect().toSet
    assert(after == before, "compaction changed the data")
    // the already-compact partition was not rewritten (same physical file)
    assert(files("2024-01-03").head.getName == untouchedName,
      "compaction rewrote an already-compact partition")
    // idempotent: a second run finds nothing to do
    assert(ParquetWarehouse.compactPartitions(spark, path, Seq("day")) == 0)
  }

  test("a crash between staging-commit and overwrite is repaired from the durable staged copy") {
    val path = "/root/repo/target/qtmp/warehouse_recover"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("/root/repo/target/qtmp/.warehouse_recover.staging"))
    val rows = Seq((1, "2024-01-01", 1.0), (2, "2024-01-01", 2.0),
      (3, "2024-01-02", 3.0)).toDF("id", "day", "v")
    ParquetWarehouse.overwritePartitions(rows, path, Seq("day"))
    val before = ParquetWarehouse.read(spark, path)
      .select("id", "day", "v").as[(Int, String, Double)].collect().toSet
    // simulate the lethal crash window: the compacted/merged rows were
    // staged durably (marked complete), then the app died AFTER the
    // overwrite deleted a partition's files but BEFORE replacing them —
    // the old localCheckpoint pin loses day=2024-01-01 forever here
    val staging = new java.io.File("/root/repo/target/qtmp/.warehouse_recover.staging")
    rows.write.mode("overwrite").partitionBy("day").parquet(staging.toString)
    new java.io.File(staging, "_STAGED").createNewFile()
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$path/day=2024-01-01"))
    assert(ParquetWarehouse.read(spark, path).count() == 1)
    // the next maintenance pass re-applies the staged copy before working
    assert(ParquetWarehouse.recoverStagedOverwrite(spark, path, Seq("day")))
    val after = ParquetWarehouse.read(spark, path)
      .select("id", "day", "v").as[(Int, String, Double)].collect().toSet
    assert(after == before, "recovery did not restore the lost partition")
    assert(!staging.exists(), "staging must be cleaned after recovery")
    // an UNMARKED (incomplete) staging dir is swept, never applied
    Seq((9, "2024-01-01", 9.9)).toDF("id", "day", "v")
      .write.mode("overwrite").partitionBy("day").parquet(staging.toString)
    assert(!ParquetWarehouse.recoverStagedOverwrite(spark, path, Seq("day")))
    assert(!staging.exists())
    assert(ParquetWarehouse.read(spark, path)
      .select("id", "day", "v").as[(Int, String, Double)].collect().toSet == before)
  }
}
