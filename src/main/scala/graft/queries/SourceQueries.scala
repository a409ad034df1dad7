package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Cols, Tables}
import graft.ext.Multimodal
import graft.sources.{CsvSource, DbfSource, RestSource}
import GraftQuery.dsum

/** Source/sink surface (SURVEY §2.1): contract-checked CSV scan, paged
  * REST-style ingestion, partitioned parquet sink with partition pruning on
  * read-back, and the multimodal binary-asset plumbing. Scratch output goes
  * under target/qtmp inside the repo.
  */
object SourceQueries {

  private def q(name: String, oracle: Option[String])(fn: (SparkSession, String) => DataFrame) =
    GraftQuery(name, fn, oracle)

  private val scratch = "/root/repo/target/qtmp"

  // ---------------------------------------------------------------- src01
  /** CSV write → contract-checked schema-first read-back (S1–S4): the
    * round-trip must be lossless, so the oracle is simply the original table.
    */
  val src01_csv_roundtrip = q("src01_csv_roundtrip", Some(
    "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier")) { (s, dir) =>
    val supplier = Tables.supplier(s, dir)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val path = s"$scratch/csv_supplier"
    supplier.write.mode("overwrite").option("header", "true").csv(path)
    CsvSource.read(s, path, supplier.schema,
      required = Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      requireRows = true)
  }

  // ---------------------------------------------------------------- src02
  /** Paged REST-style source (S5): a deterministic fake pager stands in for
    * the HTTP fetch (4 pages × 40 records, then an empty page terminates);
    * the oracle regenerates the same records arithmetically.
    */
  final case class ApiRecord(id: Long, code: String, year: Int, value: Double)

  val src02_rest_paged = q("src02_rest_paged", Some(
    s"""WITH r AS (
       |  SELECT i AS id, 'C' || CAST(i % 7 AS VARCHAR) AS code,
       |         CAST(2000 + i % 24 AS INT) AS year,
       |         CAST(i * 7919 % 1000 AS DOUBLE) / 10.0 AS value
       |  FROM generate_series(0, 159) t(i))
       |SELECT code, COUNT(*) AS n, ${dsum("value")} AS sum_value,
       |  MIN(year) AS min_year, MAX(year) AS max_year
       |FROM r GROUP BY code""".stripMargin)) { (s, dir) =>
    def fetchPage(page: Int): Seq[ApiRecord] =
      if (page >= 4) Nil
      else (0 until 40).map { i =>
        val id = page * 40L + i
        ApiRecord(id, "C" + (id % 7), (2000 + id % 24).toInt, (id * 7919 % 1000) / 10.0)
      }
    RestSource.paged(s, fetchPage).toDF()
      .groupBy("code")
      .agg(count(lit(1)).as("n"), Cols.decimalSum(col("value")).as("sum_value"),
        min(col("year")).as("min_year"), max(col("year")).as("max_year"))
  }

  // ---------------------------------------------------------------- src03
  /** Partitioned parquet sink + pruned read-back (S8 generalized to the
    * engine's native warehouse format): write orders partitioned by year,
    * read back ONE partition (directory pruning — the scan never touches the
    * other years), aggregate it.
    */
  val src03_partitioned_sink = q("src03_partitioned_sink", Some(
    s"""SELECT o_orderstatus, COUNT(*) AS n, ${dsum("o_totalprice")} AS sum_price
       |FROM orders WHERE year(o_orderdate) = 1995
       |GROUP BY o_orderstatus""".stripMargin)) { (s, dir) =>
    val path = s"$scratch/orders_by_year"
    Tables.orders(s, dir)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(path)
    s.read.parquet(path)
      .filter(col("o_year") === 1995) // partition pruning: only year=1995 dirs scanned
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), Cols.decimalSum(col("o_totalprice")).as("sum_price"))
  }

  // ---------------------------------------------------------------- src04
  /** Multimodal binary-asset metadata (SQL twin of the mapPartitions decode
    * stub — same arithmetic, oracle-checkable; the typed Dataset path is
    * exercised in MultimodalSpec).
    */
  val src04_multimodal_meta = q("src04_multimodal_meta", Some(
    """SELECT CAST(doc_id AS BIGINT) AS asset_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(320 + octet_length(encode(text)) % 320 AS INT) AS width,
      |  CAST(240 + octet_length(encode(text)) % 240 AS INT) AS height
      |FROM documents""".stripMargin)) { (s, dir) =>
    Multimodal.decodeMetaSql(
      Multimodal.toAssets(Tables.documents(s, dir), "doc_id", "text"))
  }

  // ---------------------------------------------------------------- src05
  /** Deterministic frame sampling over binary assets (video-pipeline plan
    * shape: generator → per-frame rows).
    */
  val src05_frame_sample = q("src05_frame_sample", Some(
    """SELECT CAST(doc_id AS BIGINT) AS asset_id,
      |  CAST(f AS INT) AS frame_no,
      |  CAST(f * octet_length(encode(text)) // 4 AS BIGINT) AS frame_offset
      |FROM documents CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS f) t""".stripMargin)) { (s, dir) =>
    Multimodal.frameSample(
      Multimodal.toAssets(Tables.documents(s, dir), "doc_id", "text"), framesPer = 4)
  }

  // ---------------------------------------------------------------- src06
  /** DataSource V2 paged REST source (S5 scale path): pages fetched
    * executor-side, one InputPartition per page range; the oracle
    * regenerates the deterministic fake-fetcher records arithmetically.
    */
  val src06_restv2_scan = q("src06_restv2_scan", Some(
    s"""WITH r AS (
       |  SELECT 'C' || CAST(i % 5 AS VARCHAR) AS country_code,
       |         'IND' || CAST(i % 3 AS VARCHAR) AS indicator,
       |         CAST(2000 + i % 10 AS INT) AS year,
       |         CASE WHEN i % 7 = 0 THEN NULL
       |              ELSE CAST(i * 31 % 997 AS DOUBLE) / 10.0 END AS value
       |  FROM generate_series(0, 999) t(i))
       |SELECT country_code, indicator, COUNT(*) AS n,
       |  CAST(COUNT(value) AS BIGINT) AS n_vals,
       |  ${dsum("value")} AS sum_value
       |FROM r GROUP BY 1, 2""".stripMargin)) { (s, dir) =>
    s.read.format("graft-rest")
      .option("pages", 40) // 40 pages x 25 records
      .option("pagesPerPartition", 8)
      .load()
      .groupBy("country_code", "indicator")
      .agg(count(lit(1)).as("n"), count(col("value")).as("n_vals"),
        Cols.decimalSum(col("value")).as("sum_value"))
  }

  // ---------------------------------------------------------------- src07
  /** DBF round-trip (S6 — reference `raw_analysis/main.py:12-38` reads dBase
    * extracts as the prep step): write a typed fixture with
    * [[graft.sources.DbfSource.write]], read the DIRECTORY back (glob path)
    * with [[graft.sources.DbfSource.read]]; the oracle is the original
    * projection, so the round-trip must be lossless across C/N/L/D field
    * types. The date column is emitted as its ISO string (DateType decode
    * itself is covered in DbfSourceSpec).
    */
  val src07_dbf_roundtrip = q("src07_dbf_roundtrip", Some(
    """SELECT CAST(n_nationkey AS BIGINT) AS nkey, n_name AS nname,
      |  CAST(n_nationkey * 1.5 AS DOUBLE) AS score,
      |  n_nationkey % 2 = 0 AS even,
      |  CAST(DATE '1996-01-01' + CAST(n_nationkey AS INT) AS VARCHAR) AS d
      |FROM nation""".stripMargin)) { (s, dir) =>
    val src = Tables.nation(s, dir).select(
      col("n_nationkey").cast("long").as("nkey"),
      col("n_name").as("nname"),
      (col("n_nationkey") * 1.5).cast("double").as("score"),
      (col("n_nationkey") % 2 === 0).as("even"),
      date_add(lit(java.sql.Date.valueOf("1996-01-01")),
        col("n_nationkey").cast("int")).as("d"))
    val path = s"$scratch/dbf_nation"
    new java.io.File(path).mkdirs()
    DbfSource.write(src, s"$path/nation.dbf")
    DbfSource.read(s, path).withColumn("d", col("d").cast("string"))
  }

  // ---------------------------------------------------------------- src08
  /** REAL media-container metadata (WAV/BMP — plain byte layouts, no media
    * library needed): build valid WAV + BMP blobs per document with
    * parameters derived from (doc_id, n_chars), then parse them back
    * executor-side with [[Multimodal.parseWav]]/[[Multimodal.parseBmp]].
    * The oracle recomputes the expected metadata from the construction
    * arithmetic — so a parser bug (or builder bug) hash-fails. Sample-level
    * decode stays stubbed (no codecs in this environment); header
    * extraction like this is what gates partitioning/filtering in a real
    * media-ingest pipeline.
    */
  val src08_media_meta = q("src08_media_meta", Some(
    """SELECT doc_id AS asset_id,
      |  CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
      |  CAST(1 + doc_id % 2 AS INT) AS channels,
      |  CAST(16 + n_chars % 256 AS BIGINT) AS n_frames,
      |  CAST((16 + n_chars % 256) * 1000 // (8000 + (doc_id % 4) * 4000) AS BIGINT) AS duration_ms,
      |  CAST(16 + doc_id % 64 AS INT) AS bmp_w,
      |  CAST(16 + doc_id % 32 AS INT) AS bmp_h,
      |  CAST(24 AS INT) AS bmp_bpp,
      |  CAST(32 + doc_id % 128 AS INT) AS png_w,
      |  CAST(32 + doc_id % 96 AS INT) AS png_h,
      |  CAST(64 + doc_id % 192 AS INT) AS jpg_w,
      |  CAST(64 + doc_id % 108 AS INT) AS jpg_h,
      |  CAST(8 + doc_id % 100 AS INT) AS gif_w,
      |  CAST(8 + doc_id % 50 AS INT) AS gif_h,
      |  CAST(1 << CAST(2 + doc_id % 4 AS INT) AS INT) AS gif_colors,
      |  'isom' AS mp4_brand,
      |  CAST(600 * (1 + doc_id % 4) AS BIGINT) AS mp4_timescale,
      |  CAST((n_chars % 1000) * 600 * 1000 // (600 * (1 + doc_id % 4)) AS BIGINT) AS mp4_duration_ms
      |FROM documents""".stripMargin)) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, nChars) =>
          val sr = 8000 + (id % 4).toInt * 4000
          val wav = Multimodal.wavBytes(sr, 1 + (id % 2).toInt, 16,
            16 + (nChars % 256).toInt)
          val bmp = Multimodal.bmpBytes((16 + id % 64).toInt, (16 + id % 32).toInt)
          val png = Multimodal.pngBytes((32 + id % 128).toInt, (32 + id % 96).toInt)
          val jpg = Multimodal.jpegBytes((64 + id % 192).toInt, (64 + id % 108).toInt)
          val gif = Multimodal.gifBytes((8 + id % 100).toInt, (8 + id % 50).toInt,
            1 << (2 + (id % 4)).toInt)
          val mp4 = Multimodal.mp4Bytes(600 * (1 + (id % 4)).toInt,
            ((nChars % 1000) * 600).toInt)
          val wm = Multimodal.parseWav(wav).get
          val bm = Multimodal.parseBmp(bmp).get
          val pm = Multimodal.parsePng(png).get
          val jm = Multimodal.parseJpeg(jpg).get
          val gm = Multimodal.parseGif(gif).get
          val mm = Multimodal.parseMp4(mp4).get
          (id, wm.sample_rate, wm.channels, wm.n_frames,
            wm.n_frames * 1000 / wm.sample_rate,
            bm.width, bm.height, bm.bits_per_pixel,
            pm.width, pm.height, jm.width, jm.height,
            gm.width, gm.height, gm.gct_colors,
            mm.brand, mm.timescale, mm.duration * 1000L / mm.timescale)
        }
      }
      .toDF("asset_id", "sample_rate", "channels", "n_frames", "duration_ms",
        "bmp_w", "bmp_h", "bmp_bpp", "png_w", "png_h", "jpg_w", "jpg_h",
        "gif_w", "gif_h", "gif_colors", "mp4_brand", "mp4_timescale",
        "mp4_duration_ms")
  }

  // ---------------------------------------------------------------- src09
  /** Keyed UPSERT round-trip ([[graft.sources.ParquetWarehouse.upsert]] —
    * S8/S9 generalized past drop-and-recreate): bootstrap the orders table
    * partitioned by year, merge a correction batch (every 100th order gets
    * +1000 on its price at a higher version), read the final state back.
    * The merge rewrites only the touched year-partitions; the oracle
    * recomputes the expected end state relationally.
    */
  val src09_upsert_merge = q("src09_upsert_merge", Some(
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice + 1000.0
      |       ELSE o_totalprice END AS price
      |FROM orders""".stripMargin)) { (s, dir) =>
    def base = Tables.orders(s, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"),
        col("o_totalprice").as("price"), lit(1L).as("version"))
    // the bootstrap load is FIXTURE STAGING, not the measured operator —
    // built once per JVM (same discipline as d11-d13's corpus staging) so
    // the timed body is the merge + read-back only. Re-applying the same
    // corrections on later passes is value-idempotent: upsert's version
    // tie-break prefers the incoming row, which carries identical values.
    val path = DedupQueries.DedupStaging.ensure("src09", dir) { root =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      graft.sources.ParquetWarehouse.upsert(base, root,
        keys = Seq("o_orderkey"), partitionCols = Seq("o_year"), versionCol = "version")
    }
    val corrections = base.filter(col("o_orderkey") % 100 === 0)
      .withColumn("price", col("price") + 1000.0)
      .withColumn("version", lit(2L))
    graft.sources.ParquetWarehouse.upsert(corrections, path,
      keys = Seq("o_orderkey"), partitionCols = Seq("o_year"), versionCol = "version")
    s.read.parquet(path).select("o_orderkey", "price")
  }

  // ---------------------------------------------------------------- src10
  /** SMALL-FILE COMPACTION round-trip
    * ([[graft.sources.ParquetWarehouse.compactPartitions]] — the warehouse
    * twin of the dedup index's fragment vacuum): staging materializes the
    * orders table as four interleaved appends (four files per year
    * partition — the shape weeks of micro-batch sinks leave behind), the
    * timed body folds every fragmented partition back to one file and
    * reads the result. The oracle is content invariance: compaction must
    * be a pure file-layout change. Later bench passes measure the
    * idempotent no-op path (nothing left over `maxFiles`), which is the
    * common production invocation. ParquetWarehouseSpec pins the layout
    * effects (file counts, untouched partitions, idempotence).
    */
  val src10_compact_partitions = q("src10_compact_partitions", Some(
    "SELECT o_orderkey, o_totalprice FROM orders")) { (s, dir) =>
    val path = DedupQueries.DedupStaging.ensure("src10", dir) { root =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val base = Tables.orders(s, dir).select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"), col("o_totalprice"))
      for (i <- 0 until 4)
        base.filter(pmod(col("o_orderkey"), lit(4)) === i)
          .write.mode("append").partitionBy("o_year").parquet(root)
    }
    graft.sources.ParquetWarehouse.compactPartitions(s, path, Seq("o_year"))
    s.read.parquet(path).select("o_orderkey", "o_totalprice")
  }

  // ---------------------------------------------------------------- src11
  /** SCD TYPE-2 dimension merge ([[graft.sources.Scd2.merge]] — the
    * versioned-history generalization of the reference's drop-and-recreate
    * dimension loads): staging bootstraps the customer dimension at batch 1,
    * the timed body merges a full batch-2 snapshot in which every 10th
    * customer's balance moved by +100, then reads the version chains back.
    * 90 % of the batch exercises the no-change path (value-identical rows
    * open no version), the rest closes v1 at batch 2 and opens v2. Re-runs
    * on later bench passes are semantic no-ops (idempotence contract). The
    * oracle reconstructs the expected chains relationally.
    */
  val src11_scd2_merge = q("src11_scd2_merge", Some(
    """SELECT c_custkey, c_name AS name, c_acctbal AS acctbal,
      |  CAST(1 AS BIGINT) AS valid_from,
      |  CAST(CASE WHEN c_custkey % 10 = 0 THEN 2 END AS BIGINT) AS valid_to,
      |  (c_custkey % 10 <> 0) AS is_current
      |FROM customer
      |UNION ALL
      |SELECT c_custkey, c_name, c_acctbal + 100.0,
      |  CAST(2 AS BIGINT), NULL, TRUE
      |FROM customer WHERE c_custkey % 10 = 0""".stripMargin)) { (s, dir) =>
    def base = Tables.customer(s, dir).select(col("c_custkey"),
      col("c_name").as("name"), col("c_acctbal").as("acctbal"))
    val path = DedupQueries.DedupStaging.ensure("src11", dir) { root =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      graft.sources.Scd2.merge(base, root,
        keys = Seq("c_custkey"), trackCols = Seq("name", "acctbal"), batchId = 1L)
    }
    val batch2 = base.withColumn("acctbal",
      when(col("c_custkey") % 10 === 0, col("acctbal") + 100.0)
        .otherwise(col("acctbal")))
    graft.sources.Scd2.merge(batch2, path,
      keys = Seq("c_custkey"), trackCols = Seq("name", "acctbal"), batchId = 2L)
    s.read.parquet(path).select("c_custkey", "name", "acctbal",
      "valid_from", "valid_to", "is_current")
  }

  // ---------------------------------------------------------------- src12
  /** Z-ORDER layout rewrite ([[graft.sources.Zorder.rewrite]]): staging
    * materializes an o_orderkey-ordered copy of orders (the layout a
    * key-sorted ingest leaves — useless for customer/price predicates);
    * the timed body re-clusters it on (o_custkey, o_totalprice) via
    * quantile-celled Morton codes and reads back a two-column box filter.
    * The oracle checks content (the rewrite must be value-preserving under
    * any filter); ZorderSpec pins the LAYOUT effect with parquet footer
    * stats — a 5 % box on either clustered column touches ≤ half the
    * files that the row-order layout forced. Re-runs re-cluster
    * already-clustered data (idempotence).
    */
  val src12_zorder_layout = q("src12_zorder_layout", Some(
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_custkey <= 500 AND o_totalprice <= 150000.0""".stripMargin)) { (s, dir) =>
    val path = DedupQueries.DedupStaging.ensure("src12", dir) { root =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice")
        .repartitionByRange(16, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite").parquet(root)
    }
    graft.sources.Zorder.rewrite(s, path,
      Seq("o_custkey", "o_totalprice"), numFiles = 16)
    s.read.parquet(path)
      .filter(col("o_custkey") <= 500 && col("o_totalprice") <= 150000.0)
      .select("o_orderkey", "o_custkey", "o_totalprice")
  }

  // ---------------------------------------------------------------- src13
  /** JSON-Lines roundtrip ([[graft.sources.JsonlSource]] — the
    * training-corpus interchange format, read line-split with an EXPLICIT
    * schema so no inference scan precedes the first real pass): write the
    * nation dimension as JSONL, read it back under the extract contract
    * (required columns + non-empty), oracle is identity.
    */
  val src13_jsonl_roundtrip = q("src13_jsonl_roundtrip", Some(
    "SELECT n_nationkey, n_name, n_regionkey FROM nation")) { (s, dir) =>
    val nation = Tables.nation(s, dir)
      .select("n_nationkey", "n_name", "n_regionkey")
    val path = s"$scratch/jsonl_nation"
    nation.write.mode("overwrite").json(path)
    graft.sources.JsonlSource.read(s, path, nation.schema,
      required = Seq("n_nationkey", "n_name", "n_regionkey"),
      requireRows = true)
  }

  // ---------------------------------------------------------------- src14
  /** Schema EVOLUTION on the parquet warehouse: a later ingest batch
    * adds a column (`region_name`), and a `mergeSchema` read unifies the
    * layouts — pre-evolution rows surface the new column as NULL, no
    * rewrite of historical partitions (the additive-evolution contract a
    * long-lived 100 TB table depends on; widening/renames go through a
    * staged rewrite instead). Batch partitions double as the audit of
    * which layout each row was written under.
    */
  val src14_schema_evolution = q("src14_schema_evolution", Some(
    """SELECT n_nationkey, n_name, n_regionkey,
      |  CAST(NULL AS VARCHAR) AS region_name, CAST(0 AS INT) AS batch_id
      |FROM nation
      |UNION ALL
      |SELECT n_nationkey, n_name, n_regionkey,
      |  r_name AS region_name, CAST(1 AS INT) AS batch_id
      |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin)) { (s, dir) =>
    val nation = Tables.nation(s, dir)
      .select("n_nationkey", "n_name", "n_regionkey")
    val path = s"$scratch/evolving_nation"
    // day-0 layout: three columns
    nation.write.mode("overwrite").parquet(s"$path/batch_id=0")
    // day-1 layout: the ingest gained a denormalized region name
    nation.join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
        col("r_name").as("region_name"))
      .write.mode("overwrite").parquet(s"$path/batch_id=1")
    s.read.option("mergeSchema", "true").parquet(path)
      .select("n_nationkey", "n_name", "n_regionkey", "region_name", "batch_id")
  }

  // ---------------------------------------------------------------- src15
  /** Corpus VERSION DIFF — the release-to-release audit a dataset
    * pipeline publishes (what changed between corpus v1 and v2): full
    * outer join on the document key comparing content fingerprints →
    * added / removed / changed / unchanged per document. One shuffle
    * pair on the key; fingerprints computed map-side, so the diff never
    * moves document text.
    */
  val src15_corpus_diff = q("src15_corpus_diff", Some(
    """WITH v1 AS (SELECT doc_id, text FROM documents),
      |v2 AS (
      |  SELECT doc_id, text || ' (edited)' AS text FROM documents
      |  WHERE doc_id % 7 = 0 AND doc_id % 13 <> 0
      |  UNION ALL
      |  SELECT doc_id, text FROM documents
      |  WHERE doc_id % 7 <> 0 AND doc_id % 13 <> 0
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, text FROM documents
      |  WHERE doc_id % 11 = 0)
      |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
      |  CASE WHEN v1.doc_id IS NULL THEN 'added'
      |       WHEN v2.doc_id IS NULL THEN 'removed'
      |       WHEN md5(v1.text) <> md5(v2.text) THEN 'changed'
      |       ELSE 'unchanged' END AS status
      |FROM v1 FULL JOIN v2 ON v1.doc_id = v2.doc_id""".stripMargin)) { (s, dir) =>
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val v2 = docs.filter(col("doc_id") % 7 === 0 && col("doc_id") % 13 =!= 0)
      .select(col("doc_id"), concat(col("text"), lit(" (edited)")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 13 =!= 0))
      .unionByName(docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
    val a = docs.select(col("doc_id").as("id1"), md5(col("text")).as("fp1"))
    val b = v2.select(col("doc_id").as("id2"), md5(col("text")).as("fp2"))
    a.join(b, col("id1") === col("id2"), "full_outer")
      .select(coalesce(col("id1"), col("id2")).as("doc_id"),
        when(col("id1").isNull, "added")
          .when(col("id2").isNull, "removed")
          .when(col("fp1") =!= col("fp2"), "changed")
          .otherwise("unchanged").as("status"))
  }

  // ---------------------------------------------------------------- src16
  /** ORC columnar roundtrip: the second native columnar format (parquet's
    * sibling) — write orders as ORC, read back with filter pushdown into the
    * ORC reader. Lossless for every exchanged type, so the oracle is the
    * equivalent parquet-side projection+filter.
    */
  val src16_orc_roundtrip = q("src16_orc_roundtrip", Some(
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders WHERE o_orderstatus = 'F'""".stripMargin)) { (s, dir) =>
    val orders = Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val path = s"$scratch/orc_orders"
    orders.write.mode("overwrite").orc(path)
    s.read.orc(path).filter(col("o_orderstatus") === "F")
  }

  // ---------------------------------------------------------------- src17
  /** FILE-LEVEL MIN–MAX DATA SKIPPING ([[graft.sources.FileSkipping]]):
    * range-cluster orders by o_orderdate (repartitionByRange → each file
    * owns a slice of the date line), build the per-file stats relation, and
    * answer a one-year range query by opening ONLY the files whose [min,max]
    * intersects it — the Delta-style skipping scan; FileSkippingSpec pins
    * that the probe plans strictly fewer files than the layout holds.
    * Conservative pruning + residual filter keep results exactly equal to
    * the full scan, which is what the oracle checks.
    */
  val src17_minmax_skipping = q("src17_minmax_skipping", Some(
    s"""SELECT o_orderstatus, COUNT(*) AS n, ${dsum("o_totalprice")} AS sum_price
       |FROM orders
       |WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
       |GROUP BY o_orderstatus""".stripMargin)) { (s, dir) =>
    import graft.sources.FileSkipping
    val path = s"$scratch/orders_range_clustered"
    Tables.orders(s, dir)
      .repartitionByRange(8, col("o_orderdate"))
      .write.mode("overwrite").parquet(path)
    val stats = FileSkipping.fileStats(s, path, Seq("o_orderdate"))
    FileSkipping.readRange(s, path, stats, "o_orderdate",
        lit("1995-01-01").cast("date"), lit("1995-12-31").cast("date"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), Cols.decimalSum(col("o_totalprice")).as("sum_price"))
  }

  // ---------------------------------------------------------------- src18
  /** MALFORMED-LINE QUARANTINE on JSONL ingest: real web-scale corpora
    * arrive with broken lines, and dropping them silently (DROPMALFORMED)
    * or failing the job (FAILFAST) are both wrong at 100 TB — the
    * production contract is PERMISSIVE with a corrupt-record column, so
    * good rows parse, bad rows quarantine WITH their raw payload for
    * audit, and nothing is lost. The staged fixture breaks every third
    * line (keyed on content, not position — the unclosed-brace form);
    * the oracle reconstructs both populations from the nation table,
    * including the exact raw payload of each quarantined line.
    */
  val src18_corrupt_quarantine = q("src18_corrupt_quarantine", Some(
    """SELECT CASE WHEN n_nationkey % 3 = 0 THEN NULL ELSE n_nationkey END AS n_nationkey,
      |  CASE WHEN n_nationkey % 3 = 0 THEN NULL ELSE n_name END AS n_name,
      |  CASE WHEN n_nationkey % 3 = 0
      |       THEN '{"n_nationkey":' || n_nationkey || ',"n_name":"' || n_name || '"'
      |       ELSE NULL END AS bad
      |FROM nation""".stripMargin)) { (s, dir) =>
    import org.apache.spark.sql.types._
    val root = DedupQueries.DedupStaging.ensure("src18", dir) { r =>
      val lines = Tables.nation(s, dir)
        .select(col("n_nationkey").cast("int"), col("n_name")).orderBy("n_nationkey")
        .collect().map { row =>
          val (k, n) = (row.getInt(0), row.getString(1))
          val json = s"""{"n_nationkey":$k,"n_name":"$n"}"""
          if (k % 3 == 0) json.dropRight(1) else json // unclosed brace
        }
      new java.io.File(r).mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$r/nation_dirty.jsonl"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("bad", StringType)))
    s.read.schema(schema)
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "bad")
      .json(s"$root/nation_dirty.jsonl")
      .select("n_nationkey", "n_name", "bad")
  }

  // ---------------------------------------------------------------- src19
  /** FILE-LEVEL BLOOM SKIPPING ([[graft.sources.FileSkipping]] bloom
    * tier): the layout is range-clustered by o_orderkey, so a point
    * lookup on o_custkey gets NOTHING from min–max (every file's
    * [min, max] custkey range spans the whole key space) — the per-file
    * bloom prunes the files the customer never landed in instead. Probe
    * key = the smallest customer, chosen engine-side; conservative
    * membership + residual filter keep the result exactly the full
    * scan's, which is what the oracle checks. FileSkippingSpec pins the
    * strictly-fewer-files effect.
    */
  val src19_bloom_skipping = q("src19_bloom_skipping", Some(
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_custkey = (SELECT MIN(o_custkey) FROM orders)""".stripMargin)) { (s, dir) =>
    import graft.sources.FileSkipping
    val root = DedupQueries.DedupStaging.ensure("src19", dir) { r =>
      Tables.orders(s, dir)
        .repartitionByRange(8, col("o_orderkey"))
        .write.mode("overwrite").parquet(s"$r/orders_key_clustered")
    }
    val path = s"$root/orders_key_clustered"
    val stats = FileSkipping.bloomStats(s, path, "o_custkey")
    val probe = Tables.orders(s, dir).agg(min("o_custkey")).collect().head.getLong(0)
    FileSkipping.readEquality(s, path, stats, "o_custkey", lit(probe))
      .select("o_orderkey", "o_custkey", "o_totalprice")
  }

  // ---------------------------------------------------------------- src20
  /** INCREMENTAL WATERMARK EXTRACTION from a live database
    * ([[graft.sources.JdbcIncremental]], real embedded Derby): load half
    * the orders, pull, load the rest, pull again — the second pull's
    * remote SQL carries `o_orderkey > <watermark>` so the database scans
    * only the delta, and the accumulated lake relation must equal the
    * full table (the oracle). Crash-safe pull-partition + CAS watermark
    * state on the shared protocol; JdbcDerbySpec drills the replay
    * window live.
    */
  val src20_incremental_pull = q("src20_incremental_pull", Some(
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders")) { (s, dir) =>
    import graft.sources.{JdbcIncremental, JdbcSink}
    val cfg = JdbcSink.JdbcConfig(
      "jdbc:derby:memory:graftsrc20;create=true", "app", "app")
    val root = DedupQueries.DedupStaging.ensure("src20", dir) { r =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$r/pulled")) // fresh state when a new JVM re-stages
      val ords = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val mid = ords.agg(percentile_approx(col("o_orderkey"), lit(0.5), lit(100)))
        .collect().head.getLong(0)
      JdbcSink.overwrite(ords.filter(col("o_orderkey") <= mid), cfg, "orders_inc")
      JdbcIncremental.init(s, s"$r/pulled")
      JdbcIncremental.pull(s, cfg, "orders_inc", "o_orderkey", s"$r/pulled")
      JdbcSink.append(ords.filter(col("o_orderkey") > mid), cfg, "orders_inc")
      JdbcIncremental.pull(s, cfg, "orders_inc", "o_orderkey", s"$r/pulled")
    }
    JdbcIncremental.read(s, s"$root/pulled")
      .select(col("o_orderkey").as("o_orderkey"),
        col("o_custkey").as("o_custkey"),
        col("o_totalprice").as("o_totalprice"))
  }

  // ---------------------------------------------------------------- src21
  /** SPLIT-MANIFEST ROUND TRIP ([[graft.operators.SplitManifest]]): the
    * released t45 split's provenance record — one row per split carrying
    * (fraction, n_rows, seed, strata/key columns) — read back from the
    * CAS-published store that d20's leakage audit also consumes. The
    * oracle recomputes the split independently from the spec constants
    * (the t45 window arithmetic) and joins its counts against the
    * manifest's literals, so a store that recorded the wrong seed,
    * fractions, columns or counts hash-mismatches.
    */
  val src21_split_manifest = q("src21_split_manifest", Some(
    s"""WITH r AS (SELECT doc_id,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY md5('42|' || CAST(doc_id AS VARCHAR)), doc_id) AS rn,
       |    COUNT(*) OVER (PARTITION BY lang) AS n
       |  FROM documents),
       |sp AS (SELECT doc_id,
       |    CASE WHEN rn <= floor(CAST(0.8 AS DOUBLE) * n) THEN 'train'
       |         WHEN rn <= floor((CAST(0.8 AS DOUBLE) + CAST(0.1 AS DOUBLE)) * n)
       |              THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM r),
       |c AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_rows
       |      FROM sp GROUP BY 1)
       |SELECT f.split, f.fraction, coalesce(c.n_rows, 0) AS n_rows,
       |  CAST(42 AS BIGINT) AS seed,
       |  'lang' AS strata_cols, 'doc_id' AS key_cols
       |FROM (VALUES ('train', CAST(0.8 AS DOUBLE)),
       |             ('val', CAST(0.1 AS DOUBLE)),
       |             ('test', CAST(0.1 AS DOUBLE))) f(split, fraction)
       |LEFT JOIN c USING (split)""".stripMargin)) { (s, dir) =>
    graft.operators.SplitManifest
      .readManifest(s, DedupQueries.rowSplitStore(s, dir))
      .select("split", "fraction", "n_rows", "seed", "strata_cols",
        "key_cols")
  }

  // ---------------------------------------------------------------- src22
  /** WARC CONTAINER INGEST ([[graft.sources.WarcSource]] /
    * [[graft.plans.WarcRecordsExpr]]): web stage −2 — the byte-level
    * record reader a crawl corpus enters through. The staged member is
    * built from the nation table as standards-shaped response records
    * (HTTP envelope inside, Content-Length on UTF-8 bytes) with TWO
    * adversarial regions interleaved: a garbage blob at a record
    * boundary and an EOF-truncated record — both must come back as
    * quarantine rows carrying their raw bytes (src18's PERMISSIVE
    * contract at the container level), while every record AFTER a
    * quarantined region still parses (resync). The oracle reconstructs
    * all three populations from the nation table and the fixture
    * constants, byte for byte.
    */
  val src22_warc_ingest = {
    def crlf(s: String): String = // DuckDB expression for a CRLF-laden literal
      s.split("\r\n", -1).map(p => s"'${p.replace("'", "''")}'")
        .mkString(" || chr(13) || chr(10) || ")
    val garbage = "NOT A WARC RECORD AT THIS BOUNDARY\r\n\r\n"
    val truncated = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://crawl.example.org/truncated\r\n" +
      "WARC-Date: 2026-08-02T00:00:00Z\r\nContent-Length: 99999\r\n\r\nshort"
    q("src22_warc_ingest", Some(
      s"""SELECT 'https://crawl.example.org/n/' || n_nationkey AS target_uri,
         |  '2026-08-01T00:00:00Z' AS fetch_ts,
         |  200 AS status, 'text/html; charset=utf-8' AS content_type,
         |  '<html><body><p>' || n_name || ' is nation ' || n_nationkey ||
         |    '</p></body></html>' AS body,
         |  CAST(NULL AS VARCHAR) AS error
         |FROM nation
         |UNION ALL
         |SELECT CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
         |  CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR),
         |  ${crlf(garbage)},
         |  'no WARC/ magic at record boundary'
         |UNION ALL
         |SELECT 'https://crawl.example.org/truncated',
         |  '2026-08-02T00:00:00Z', CAST(NULL AS INTEGER),
         |  CAST(NULL AS VARCHAR),
         |  ${crlf(truncated)},
         |  'payload truncated: declared 99999 bytes, 5 remain'"""
        .stripMargin)) { (s, dir) =>
      import graft.sources.WarcSource
      val root = DedupQueries.DedupStaging.ensure("src22", dir) { r =>
        val recs = Tables.nation(s, dir)
          .selectExpr("CAST(n_nationkey AS INT)", "n_name")
          .orderBy("n_nationkey").collect().map { row =>
            val (k, n) = (row.getInt(0), row.getString(1))
            WarcSource.responseRecordString(
              s"https://crawl.example.org/n/$k", "2026-08-01T00:00:00Z",
              s"<html><body><p>$n is nation $k</p></body></html>")
          }
        val member = recs.take(1).mkString + garbage +
          recs.drop(1).mkString + truncated
        new java.io.File(s"$r/crawl").mkdirs()
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$r/crawl/segment-00000.warc"),
          member.getBytes("UTF-8"))
      }
      WarcSource.read(s, s"$root/crawl")
        .select(col("target_uri"), col("fetch_ts"), col("status"),
          col("content_type"), decode(col("body"), "UTF-8").as("body"),
          col("error"))
    }
  }

  // ---------------------------------------------------------------- src23
  /** CORPUS RELEASE BUNDLE ([[graft.operators.Release.publish]]): the
    * one-call trainer handoff — deterministic 80/10/10 split stratified
    * by language (t45's exact-floor law), token-budgeted shard
    * assignment (contiguous prefix-sum packing at 2000 tokens/shard in
    * the split's seeded order), shard-partitioned corpus write, and a
    * per-shard manifest + per-split datacard counted from the WRITTEN
    * files, CAS-published on the StoredIndex protocol. The query reads
    * the live release back THROUGH the meta pointer and emits the
    * manifest's per-shard counts twice over: once from the manifest
    * relation and once RE-COUNTED from the released corpus files (full
    * outer join — any drift between manifest and artifact surfaces as
    * extra/null rows); the oracle re-derives the whole assignment
    * (split boundaries, exclusive prefix sums, shard floors, token
    * counts) independently in SQL, so split law, packing law, write
    * fidelity and manifest fidelity all hash together.
    */
  val src23_release_bundle = q("src23_release_bundle", Some(
    s"""WITH r AS (SELECT doc_id, lang,
       |    CAST(len(regexp_extract_all(text, '${TextQueries.tokenPat}'))
       |      AS BIGINT) AS n_tok,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY md5('42|' || CAST(doc_id AS VARCHAR)), doc_id) AS rn,
       |    COUNT(*) OVER (PARTITION BY lang) AS n
       |  FROM documents),
       |sp AS (SELECT doc_id, n_tok,
       |    CASE WHEN rn <= floor(CAST(0.8 AS DOUBLE) * n) THEN 'train'
       |         WHEN rn <= floor((CAST(0.8 AS DOUBLE) + CAST(0.1 AS DOUBLE))
       |              * n) THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM r),
       |cum AS (SELECT split, n_tok, sum(n_tok) OVER (
       |      PARTITION BY split
       |      ORDER BY md5('42|' || CAST(doc_id AS VARCHAR)), doc_id
       |      ROWS UNBOUNDED PRECEDING) - n_tok AS p
       |  FROM sp),
       |sh AS (SELECT split,
       |    CAST(p // 2000 AS INT) AS shard, n_tok
       |  FROM cum),
       |m AS (SELECT split, shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens FROM sh GROUP BY 1, 2)
       |SELECT split, shard, n_docs, n_tokens,
       |  n_docs AS files_docs, n_tokens AS files_tokens
       |FROM m""".stripMargin)) { (s, dir) =>
    import graft.functions.TextFunctions
    import graft.operators.Release
    val store = DedupQueries.DedupStaging.ensure("src23", dir) { r =>
      val corpus = Tables.documents(s, dir).select(col("doc_id"),
        col("lang"), col("text"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
      Release.publish(corpus, s"$r/release", Release.Spec(
        seed = 42L, fractions = Seq(("train", 0.8), ("val", 0.1),
          ("test", 0.1)),
        strataCols = Seq("lang"), keyCols = Seq("doc_id"),
        tokensCol = "n_tok", shardTokens = 2000L))
    } + "/release"
    val manifest = Release.readManifest(s, store)
      .select(col("split"), col("shard"), col("n_docs"), col("n_tokens"))
    val files = Release.readCorpus(s, store)
      .groupBy(col("split").cast("string").as("split"), col("shard"))
      .agg(count(lit(1)).as("files_docs"),
        sum(col("n_tok")).as("files_tokens"))
    manifest.join(files, Seq("split", "shard"), "full")
      .select("split", "shard", "n_docs", "n_tokens",
        "files_docs", "files_tokens")
  }

  // ---------------------------------------------------------------- src24
  /** WET-STYLE TEXT INTERCHANGE ([[graft.sources.WarcSource.writeWet]] /
    * `readWet`): the engine PRODUCES the standard pre-extracted-text
    * sibling of WARC (ISO 28500 `conversion` records — the Common Crawl
    * WET layout many corpus consumers start from) and consumes it back
    * — making the extraction stage (t47) a restart point any external
    * tool can pick up. Staged once: the t47 main-content extraction of
    * the html fixture is written DISTRIBUTED as conversion records
    * (Content-Length on UTF-8 bytes, no HTTP envelope); the query then
    * reads ONLY the container and must reproduce every (uri, ts, text)
    * triple — the oracle re-derives all three from the documents table
    * through the extraction mirror, so the round trip hash-matches the
    * text itself, byte for byte.
    */
  /** The staged WET tree (the t47 extraction written as conversion
    * records) — shared by src24's round-trip gate and q77's
    * restart-point analytics, so both read the SAME artifact.
    */
  private[queries] def wetStagingRoot(s: SparkSession, dir: String): String =
    DedupQueries.DedupStaging.ensure("src24", dir) { r =>
      import graft.functions.HtmlFunctions
      import graft.sources.WarcSource
      val wet = Tables.documents(s, dir)
        .select(TextQueries.urlFixture.as("uri"),
          lit("2026-08-03T00:00:00Z").as("ts"),
          HtmlFunctions.mainContent(TextQueries.htmlFixture).as("text"))
      WarcSource.writeWet(wet.repartition(8), "uri", "ts", "text",
        s"$r/wet")
    } + "/wet"

  val src24_wet_roundtrip = q("src24_wet_roundtrip", Some(
    s"""WITH h AS (SELECT doc_id, ${TextQueries.htmlFixtureSql} AS html
       |           FROM documents),
       |b AS (SELECT doc_id, ${TextQueries.duckBlocksSql} AS bs FROM h),
       |m AS (SELECT doc_id,
       |    coalesce(array_to_string(list_transform(
       |      list_filter(bs, b -> ${TextQueries.duckKeptPred}),
       |      b -> ${TextQueries.duckVis("b")}), ' '), '') AS text
       |  FROM b)
       |SELECT trim(${TextQueries.urlFixtureSql}) AS target_uri,
       |  '2026-08-03T00:00:00Z' AS fetch_ts, m.text
       |FROM m JOIN documents USING (doc_id)""".stripMargin)) { (s, dir) =>
    graft.sources.WarcSource.readWet(s, wetStagingRoot(s, dir))
      .select("target_uri", "fetch_ts", "text")
  }

  // ---------------------------------------------------------------- src26
  /** CONTENT-ADDRESSED SHARD REUSE ([[graft.operators.Release.publish]]'s
    * delta path): generation 0 releases the full corpus; generation 1
    * re-releases after a curation delta (every 17th document dropped) —
    * clean shards (the per-split prefixes before each split's first
    * edited draw position) HARD-LINK from generation 0, only dirty
    * shards rewrite. The query reads the LIVE release back through the
    * meta pointer and emits the per-shard manifest next to a RE-COUNT
    * from the released files (linked and rewritten alike); the oracle
    * derives the whole delta release independently (src23's SQL over the
    * filtered documents), so "delta re-release ≡ full re-release by
    * content" is exactly what the hash gates. Reuse mechanics (inode
    * identity, dirty/clean split, sweep safety) are pinned in
    * ReleaseSpec.
    */
  val src26_shard_reuse = q("src26_shard_reuse", Some(
    s"""WITH docs AS (SELECT * FROM documents WHERE doc_id % 17 <> 3),
       |r AS (SELECT doc_id, lang,
       |    CAST(len(regexp_extract_all(text, '${TextQueries.tokenPat}'))
       |      AS BIGINT) AS n_tok,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY md5('42|' || CAST(doc_id AS VARCHAR)), doc_id) AS rn,
       |    COUNT(*) OVER (PARTITION BY lang) AS n
       |  FROM docs),
       |sp AS (SELECT doc_id, n_tok,
       |    CASE WHEN rn <= floor(CAST(0.8 AS DOUBLE) * n) THEN 'train'
       |         WHEN rn <= floor((CAST(0.8 AS DOUBLE) + CAST(0.1 AS DOUBLE))
       |              * n) THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM r),
       |cum AS (SELECT split, n_tok, sum(n_tok) OVER (
       |      PARTITION BY split
       |      ORDER BY md5('42|' || CAST(doc_id AS VARCHAR)), doc_id
       |      ROWS UNBOUNDED PRECEDING) - n_tok AS p
       |  FROM sp),
       |sh AS (SELECT split,
       |    CAST(p // 2000 AS INT) AS shard, n_tok
       |  FROM cum),
       |m AS (SELECT split, shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens FROM sh GROUP BY 1, 2)
       |SELECT split, shard, n_docs, n_tokens,
       |  n_docs AS files_docs, n_tokens AS files_tokens
       |FROM m""".stripMargin)) { (s, dir) =>
    import graft.functions.TextFunctions
    import graft.operators.Release
    val relSpec = Release.Spec(
      seed = 42L, fractions = Seq(("train", 0.8), ("val", 0.1),
        ("test", 0.1)),
      strataCols = Seq("lang"), keyCols = Seq("doc_id"),
      tokensCol = "n_tok", shardTokens = 2000L)
    val store = DedupQueries.DedupStaging.ensure("src26", dir) { r =>
      def corpusOf(df: DataFrame) = df.select(col("doc_id"),
        col("lang"), col("text"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
      val docs = Tables.documents(s, dir)
      Release.publish(corpusOf(docs), s"$r/release", relSpec) // generation 0
      Release.publish( // generation 1: the delta — clean shards link
        corpusOf(docs.filter(col("doc_id") % 17 =!= 3)),
        s"$r/release", relSpec)
    } + "/release"
    val manifest = Release.readManifest(s, store)
      .select(col("split"), col("shard"), col("n_docs"), col("n_tokens"))
    val files = Release.readCorpus(s, store)
      .groupBy(col("split").cast("string").as("split"), col("shard"))
      .agg(count(lit(1)).as("files_docs"),
        sum(col("n_tok")).as("files_tokens"))
    manifest.join(files, Seq("split", "shard"), "full")
      .select("split", "shard", "n_docs", "n_tokens",
        "files_docs", "files_tokens")
  }

  // ---------------------------------------------------------------- src25
  /** TOKENIZER RELEASE ARTIFACT ([[graft.operators.Release.Tokenizer]] /
    * [[graft.operators.Bpe.exportArtifacts]]): t52's byte-level merge
    * table shipped WITH the corpus — exported as the standard trainer
    * interchange (`merges.txt` rank order + `vocab.txt` byte alphabet
    * then merge products) under the release bundle's fourth tagged
    * relation and the same CAS meta as the shards. The query re-reads
    * the merges THROUGH the live meta pointer ([[graft.operators
    * .Release.readTokenizer]]) and re-encodes the corpus with the
    * unchanged codegen encoder; the oracle is the byte-segmentation
    * projection of t52's committed golden, so train → ship (text files)
    * → serve (re-read + encode) agreeing end-to-end is exactly what the
    * hash gates.
    */
  val src25_tokenizer_release = GraftQuery("src25_tokenizer_release",
    (s, dir) => {
      import graft.operators.{Bpe, Release}
      import graft.functions.TextFunctions
      val store = DedupQueries.DedupStaging.ensure("src25", dir) { r =>
        val docs = Tables.documents(s, dir)
        val byteMerges = Bpe.learn(Bpe.byteWordCounts(docs, "text"), 60)
        val corpus = docs.select(col("doc_id"), col("lang"), col("text"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
        Release.publish(corpus, s"$r/release", Release.Spec(
          seed = 42L, fractions = Seq(("train", 0.8), ("val", 0.1),
            ("test", 0.1)),
          strataCols = Seq("lang"), keyCols = Seq("doc_id"),
          tokensCol = "n_tok", shardTokens = 2000L),
          tokenizer = Some(Release.Tokenizer(byteMerges, Bpe.byteAlphabet)))
      } + "/release"
      val served = Release.readTokenizer(s, store)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          Bpe.byteEncode(col("text"), served).as("__btoks"))
        .select(col("doc_id"),
          size(col("__btoks")).cast("long").as("n_byte_bpe"),
          size(array_distinct(col("__btoks"))).cast("long")
            .as("n_byte_types"))
    },
    GoldenOracles.sqlForColumns("t52_byte_bpe",
      Seq("doc_id", "n_byte_bpe", "n_byte_types")))

  val all: Seq[GraftQuery] = Seq(
    src01_csv_roundtrip, src02_rest_paged, src03_partitioned_sink,
    src04_multimodal_meta, src05_frame_sample, src06_restv2_scan,
    src07_dbf_roundtrip, src08_media_meta, src09_upsert_merge,
    src10_compact_partitions, src11_scd2_merge, src12_zorder_layout,
    src13_jsonl_roundtrip, src14_schema_evolution, src15_corpus_diff,
    src16_orc_roundtrip, src17_minmax_skipping, src18_corrupt_quarantine,
    src19_bloom_skipping, src20_incremental_pull, src21_split_manifest,
    src22_warc_ingest, src23_release_bundle, src24_wet_roundtrip,
    src25_tokenizer_release, src26_shard_reuse)
}
