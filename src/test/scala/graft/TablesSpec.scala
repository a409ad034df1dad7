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

  // What the registry's queries assume of every driver table, as Spark
  // reads it TODAY (o_orderdate/l_shipdate are TIMESTAMP_NTZ in the
  // current parquet — the date-function queries tolerate that; events.ts
  // is post-normalization). A driver regeneration that shifts ANY type
  // fails here with an exact diff instead of surfacing as an opaque
  // driver-gate error — the full-surface form of the events.ts guard.
  private val pinnedSchemas: Map[String, String] = Map(
    "region" -> "r_regionkey:int,r_name:string",
    "nation" -> "n_nationkey:int,n_name:string,n_regionkey:int",
    "customer" -> ("c_custkey:bigint,c_name:string,c_nationkey:int," +
      "c_acctbal:double,c_mktsegment:string"),
    "supplier" -> "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double",
    "part" -> ("p_partkey:bigint,p_name:string,p_brand:string,p_type:string," +
      "p_size:int,p_retailprice:double"),
    "orders" -> ("o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string," +
      "o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string"),
    "lineitem" -> ("l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint," +
      "l_linenumber:int,l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_tax:double,l_returnflag:string," +
      "l_linestatus:string,l_shipdate:timestamp_ntz"),
    "events" -> ("event_id:bigint,ts:timestamp,user_id:bigint," +
      "event_type:string,value:double,props:string"),
    "documents" -> "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint",
    "embeddings" -> "vec_id:bigint,embedding:array<float>,label:int")

  test("live testdata schemas match the pinned query-surface contract") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val drift = Tables.names.flatMap { n =>
      val df = if (n == "events") Tables.events(spark, dir)
               else Tables.load(spark, dir, n)
      val got = df.schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
      if (got == pinnedSchemas(n)) None
      else Some(s"$n:\n  expected ${pinnedSchemas(n)}\n  got      $got")
    }
    assert(drift.isEmpty,
      "testdata schema drift (update the pin AND audit every consumer " +
        "of the changed column):\n" + drift.mkString("\n"))
  }
}
