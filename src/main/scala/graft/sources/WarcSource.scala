package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) container ingest — web stage −2 of the crawl-to-
  * corpus chain (src22/q74): splits crawl segment files into per-record
  * rows BEFORE any HTML exists, so the whole pipeline runs
  * `WARC → robots gate (t49) → extraction (t47) → curation (q71)` from
  * the bytes a crawler actually wrote.
  *
  * Read side: `binaryFile` scan (file-granularity parallelism — the
  * crawl corpus layout: Common Crawl ships ~100k ~1 GB segments per
  * crawl, so 1000 executors each decode their own members with ZERO
  * shuffle before the first real operator) + ONE codegen'd expression
  * ([[graft.plans.WarcRecordsExpr]]) per member: record headers parsed,
  * HTTP response envelopes split, malformed regions quarantined as rows
  * carrying their raw bytes and an `error` — the src18 PERMISSIVE
  * contract at the container level. Gzip members (`.warc.gz`, one gzip
  * member per record — concatenated-member layout) decompress inline.
  *
  * Write side (fixture/staging + the honest inverse for tests): a pure
  * column program renders (uri, ts, html) rows as standards-shaped WARC
  * response records — `Content-Length` counted on UTF-8 BYTES, HTTP
  * envelope included — written through the text sink, fully distributed
  * (one WARC member per partition file, no driver materialization). The
  * parser tolerates the sink's record-trailing `\n` (any CR/LF run
  * separates records, per the spec's tolerance note).
  */
object WarcSource {

  /** All records of every member under `path` — one row per WARC record
    * (or quarantined malformed region):
    * (warc_file, offset, warc_type, target_uri, fetch_ts, status,
    * content_type, body: binary, error). `error IS NULL` rows parsed
    * clean; quarantined rows keep their raw bytes in `body`.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile").load(path)
      .select(col("path").as("warc_file"),
        explode(graft.plans.WarcRecordsExpr.warcRecords(col("content")))
          .as("rec"))
      .select(col("warc_file"), col("rec.*"))

  /** Clean-parse rows only (the happy path the pipeline consumes). */
  def good(records: DataFrame): DataFrame =
    records.filter(col("error").isNull)

  /** Quarantined rows — malformed regions WITH their raw bytes, the
    * audit relation (src18's contract: nothing silently dropped).
    */
  def quarantined(records: DataFrame): DataFrame =
    records.filter(col("error").isNotNull)

  /** Render one WARC response record (string column) from a page row —
    * the HTTP envelope inside, both Content-Lengths counted on UTF-8
    * bytes. Deterministic and SQL-expressible by construction (fixtures
    * replay it in the oracle).
    */
  def responseRecord(uri: Column, ts: Column, html: Column,
                     status: Int = 200): Column = {
    val payload = concat(
      lit(s"HTTP/1.1 $status OK\r\nContent-Type: text/html; " +
        "charset=utf-8\r\nContent-Length: "),
      octet_length(html).cast("string"), lit("\r\n\r\n"), html)
    concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), uri,
      lit("\r\nWARC-Date: "), ts,
      lit("\r\nContent-Type: application/http; msgtype=response"),
      lit("\r\nContent-Length: "), octet_length(payload).cast("string"),
      lit("\r\n\r\n"), payload, lit("\r\n\r\n"))
  }

  /** Driver-side string twin of [[responseRecord]], for hand-built
    * byte fixtures (src22, specs). Same layout, bytes counted on UTF-8.
    */
  def responseRecordString(uri: String, ts: String, html: String,
                           status: Int = 200): String = {
    val payload = s"HTTP/1.1 $status OK\r\nContent-Type: text/html; " +
      s"charset=utf-8\r\nContent-Length: " +
      s"${html.getBytes("UTF-8").length}\r\n\r\n$html"
    s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $ts\r\nContent-Type: application/http; " +
      s"msgtype=response\r\nContent-Length: " +
      s"${payload.getBytes("UTF-8").length}\r\n\r\n$payload\r\n\r\n"
  }

  /** Write (uri, ts, html) rows as WARC members under `path` — one
    * member per partition file, via the text sink (distributed, no
    * driver collect). The companion of [[read]] for round-trip tests
    * and the q74 staging.
    */
  def writeWarc(pages: DataFrame, uriCol: String, tsCol: String,
                htmlCol: String, path: String, status: Int = 200): Unit =
    pages.select(
        responseRecord(col(uriCol), col(tsCol), col(htmlCol), status)
          .as("value"))
      .write.mode("overwrite").text(path)

  // ------------------------------------------------------------- WET

  /** Render one WET-style `conversion` record (ISO 28500 §6.8 record
    * type) — the pre-extracted-TEXT interchange sibling of
    * [[responseRecord]]: no HTTP envelope, `Content-Type: text/plain`,
    * the source page's URI in `WARC-Target-URI`, `Content-Length` on
    * UTF-8 bytes. Common Crawl consumers frequently start from WET
    * rather than WARC; producing it makes the extraction stage a
    * standard restart point for OTHER engines too.
    */
  def conversionRecord(uri: Column, ts: Column, text: Column): Column =
    concat(
      lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "), uri,
      lit("\r\nWARC-Date: "), ts,
      lit("\r\nContent-Type: text/plain"),
      lit("\r\nContent-Length: "), octet_length(text).cast("string"),
      lit("\r\n\r\n"), text, lit("\r\n\r\n"))

  /** Driver-side string twin of [[conversionRecord]], for byte fixtures. */
  def conversionRecordString(uri: String, ts: String, text: String): String =
    s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: $ts\r\nContent-Type: text/plain\r\nContent-Length: " +
      s"${text.getBytes("UTF-8").length}\r\n\r\n$text\r\n\r\n"

  /** Write (uri, ts, text) rows as a WET tree under `path` — conversion
    * records through the same distributed text sink as [[writeWarc]].
    */
  def writeWet(docs: DataFrame, uriCol: String, tsCol: String,
               textCol: String, path: String): Unit =
    docs.select(
        conversionRecord(col(uriCol), col(tsCol), col(textCol)).as("value"))
      .write.mode("overwrite").text(path)

  /** Typed view of a WET tree: the clean `conversion` records as
    * (warc_file, target_uri, fetch_ts, text) — [[read]]'s permissive
    * parse underneath, so malformed regions still surface through
    * [[quarantined]] on the raw read, never silently vanish here.
    */
  def readWet(spark: SparkSession, path: String): DataFrame =
    good(read(spark, path))
      .filter(col("warc_type") === "conversion")
      .select(col("warc_file"), col("target_uri"), col("fetch_ts"),
        decode(col("body"), "UTF-8").as("text"))
}
