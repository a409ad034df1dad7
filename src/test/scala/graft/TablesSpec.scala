package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Encoding-drift guard for the driver-regenerated testdata: `events.ts`
  * has already shipped as int64-nanos (round ≤9) and as timestamp[us]
  * isAdjustedToUTC=false / TIMESTAMP_NTZ (round 10 — which silently broke
  * s05/s08 at the driver gate because only the nanos path was normalized).
  * This spec writes the same instants under all three parquet encodings and
  * pins that [[Tables.events]] yields TimestampType with identical values,
  * so the NEXT testdata regeneration fails here, in a unit test, instead of
  * in CORRECTNESS_r{N}.json.
  */
class TablesSpec extends SparkSpec {

  // three instants, microsecond precision (what every encoding preserves)
  private val micros = Seq(
    1704110096789000L, // 2024-01-01 12:34:56.789 UTC
    1704110096789001L, // +1 us: catches precision loss in any re-encode
    1735689600000000L) // 2025-01-01 00:00:00 UTC

  private def writeFixture(encoding: String): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"tables-spec-$encoding").toFile
    dir.deleteOnExit()
    val base = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
    val df = encoding match {
      case "int64-nanos" => // legacy driver encoding: raw nanos in an int64
        base.select(col("event_id"), (col("us") * 1000L).as("ts"))
      case "ntz-micros" => // round-10 drift: timestamp[us] isAdjustedToUTC=false
        base.select(col("event_id"),
          timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      case "utc-micros" => // plain TIMESTAMP (what Tables.events must emit)
        base.select(col("event_id"), timestamp_micros(col("us")).as("ts"))
    }
    df.coalesce(1).write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/events.parquet")
    dir.getAbsolutePath
  }

  for (enc <- Seq("int64-nanos", "ntz-micros", "utc-micros")) {
    test(s"Tables.events normalizes $enc to TimestampType with exact values") {
      val ev = Tables.events(spark, writeFixture(enc))
      assert(ev.schema("ts").dataType == TimestampType,
        s"$enc: expected TimestampType, got ${ev.schema("ts").dataType}")
      val got = ev.select(unix_micros(col("ts")))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == micros.sorted,
        s"$enc: normalized instants drifted: $got vs $micros")
      // the concrete breakage from round 10: unix_micros analysis must pass
      // (DATATYPE_MISMATCH on NTZ) — exercised above — and window/interval
      // arithmetic must type-check on the normalized column
      ev.select(window(col("ts"), "1 hour")).collect()
    }
  }

  test("live testdata events table normalizes to TimestampType") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.limit(1).count() == 1)
  }
}
