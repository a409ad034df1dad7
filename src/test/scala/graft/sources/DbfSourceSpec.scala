package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}

/** dBase III reader/writer (SURVEY §2 S6 — reference `raw_analysis/main.py:
  * 12-38`): field-type decode (C/N/F/L/D), deleted-record skip, null
  * spellings, single-file vs directory reads, and the bounded fixture
  * writer.
  */
class DbfSourceSpec extends SparkSpec {
  import spark.implicits._

  private val scratch = "/root/repo/target/qtmp/dbf_spec"
  Files.createDirectories(Paths.get(scratch))

  private def fixture = Seq(
    (1L, "alpha", 1.25, true, java.sql.Date.valueOf("2001-02-03")),
    (2L, "beta", -0.5, false, java.sql.Date.valueOf("1999-12-31")),
    (3L, "gamma", 100.0, true, java.sql.Date.valueOf("2020-01-01")))
    .toDF("id", "name", "score", "flag", "d")

  test("write/read round-trips C, N (int + decimal), L and D fields") {
    val p = s"$scratch/roundtrip.dbf"
    DbfSource.write(fixture, p)
    val back = DbfSource.read(spark, p)
      .as[(Long, String, Double, Boolean, java.sql.Date)].collect().toSet
    assert(back == fixture.as[(Long, String, Double, Boolean, java.sql.Date)]
      .collect().toSet)
  }

  test("schema maps N(0)->long, N(d)->double, C->string, L->boolean, D->date") {
    val p = s"$scratch/schema.dbf"
    DbfSource.write(fixture, p)
    val got = DbfSource.read(spark, p).schema
    assert(got == StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("flag", BooleanType),
      StructField("d", DateType))))
  }

  test("soft-deleted records (flag 0x2A) are skipped") {
    val p = s"$scratch/deleted.dbf"
    DbfSource.write(fixture, p)
    val bytes = Files.readAllBytes(Paths.get(p))
    val hdr = DbfSource.parseHeader(bytes)
    // mark the SECOND record deleted in place
    bytes(hdr.headerSize + hdr.recordSize) = 0x2a
    Files.write(Paths.get(p), bytes)
    val ids = DbfSource.read(spark, p).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L))
  }

  test("F (float) fields decode like N, blank/starred numerics read as null") {
    // hand-patch the writer's output: retype `score` N->F, blank out row 1's
    // score and star row 2's id (dBase null spellings)
    val p = s"$scratch/ftype.dbf"
    DbfSource.write(fixture, p)
    val bytes = Files.readAllBytes(Paths.get(p))
    val hdr = DbfSource.parseHeader(bytes)
    val fieldOffset = 32 + 2 * 32 // third descriptor (score)
    assert(bytes(fieldOffset + 11) == 'N'.toByte)
    bytes(fieldOffset + 11) = 'F'.toByte
    val scoreStart = 1 + hdr.fields.take(2).map(_.length).sum
    val idStart = 1
    for (k <- 0 until hdr.fields(2).length)
      bytes(hdr.headerSize + scoreStart + k) = ' '.toByte
    for (k <- 0 until hdr.fields.head.length)
      bytes(hdr.headerSize + hdr.recordSize + idStart + k) = '*'.toByte
    Files.write(Paths.get(p), bytes)
    val rows = DbfSource.read(spark, p).orderBy("name")
      .select("id", "score").collect()
    assert(rows(0) == Row(1L, null)) // alpha: blanked score
    assert(rows(1) == Row(null, -0.5)) // beta: starred id
    assert(rows(2) == Row(3L, 100.0))
  }

  test("directory read unions same-schema files; mixed-case direct file works") {
    val dir = s"$scratch/multi"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    Files.createDirectories(Paths.get(dir))
    DbfSource.write(fixture.filter(col("id") <= 2), s"$dir/part1.dbf")
    DbfSource.write(fixture.filter(col("id") === 3), s"$dir/part2.DBF")
    val ids = DbfSource.read(spark, dir).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L))
    // extension matching is fully case-insensitive: a mixed-case .Dbf file
    // is picked up by the directory glob AND readable named directly
    Files.copy(Paths.get(s"$dir/part1.dbf"), Paths.get(s"$dir/odd.Dbf"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    assert(DbfSource.read(spark, dir).count() == 5)
    assert(DbfSource.read(spark, s"$dir/odd.Dbf").count() == 2)
  }

  test("unparseable logical chars read as null; unsupported field type throws") {
    val p = s"$scratch/logical.dbf"
    DbfSource.write(fixture, p)
    val bytes = Files.readAllBytes(Paths.get(p))
    val hdr = DbfSource.parseHeader(bytes)
    val flagStart = 1 + hdr.fields.take(3).map(_.length).sum
    bytes(hdr.headerSize + flagStart) = '?'.toByte
    Files.write(Paths.get(p), bytes)
    val flags = DbfSource.read(spark, p).orderBy("id")
      .select("flag").collect().map(_.get(0))
    assert(flags.toSeq == Seq(null, false, true))
    intercept[IllegalArgumentException] {
      DbfSource.sparkType(DbfSource.DbfField("x", 'Z', 4, 0))
    }
  }

  test("write refuses fact-scale input loudly (maxRows bound)") {
    val big = spark.range(50).select(col("id"), lit("x").as("s"))
    intercept[IllegalArgumentException] {
      DbfSource.write(big, s"$scratch/toobig.dbf", maxRows = 10)
    }
  }
}
