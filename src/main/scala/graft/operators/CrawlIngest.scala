package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{HtmlFunctions, TextFunctions, UrlFunctions}
import graft.sources.AdditiveStats

/** CONTINUOUS CRAWL INGEST — the q76 compliant crawl chain split along
  * its natural two-pass seam so a micro-batch stream accumulates exactly
  * the one-shot result (the [[LineDedup]] discipline, applied to the
  * whole chain):
  *
  *   - PER BATCH ([[curateBatch]], row-local given the per-domain robots
  *     relation): WARC records → robots.txt RFC 9309 gate (stage −1.75,
  *     [[graft.functions.UrlFunctions.robotsGate]]) → in-page
  *     robots-meta gate (−1.5) → main-content extraction + word gate
  *     (−1/0). Every decision depends on the ROW alone, so the union of
  *     per-batch survivors is the one-shot gated set for ANY batch
  *     split — the equivalence needs no replay argument at all.
  *   - AT READ TIME ([[curated]], corpus-level by nature): canonical-URL
  *     dedup (min doc id per canon_url), domain blocklist, per-domain
  *     quota. These are two-pass decisions — a URL only becomes a
  *     duplicate once its twin arrives, a domain only exceeds its cap
  *     against the WHOLE corpus — so the stream maintains the survivor
  *     relation continuously and the cut applies when the corpus is
  *     consumed, bit-identical to the one-shot q76 chain (s26 gates it
  *     against q76's oracle). Pretending a per-batch cut with partial
  *     state equals corpus semantics is exactly what this layout
  *     refuses; a caller who wants GREEDY arrival-order admission
  *     instead composes the [[QuotaView]] stream on the same survivors
  *     (and [[graft.streaming.StreamOps.crawlIngestStream]] does).
  *
  * STORAGE is one [[graft.sources.AdditiveStats]] store — per-batch
  * survivor fragments land as idempotent `batch_id` partitions, each
  * document lives in exactly one batch so the constant count column
  * folds to itself under compaction, and the whole replay/crash story
  * (CAS epoch swaps, `compacted_through` watermark, stream-identity pin)
  * is protocol inheritance, not new machinery.
  *
  * Scale shape: the batch chain is a broadcast hash join (domain→rules)
  * plus row-local codegen inside the WARC scan — zero added shuffles;
  * the read-time finalize is q76's exact plan over the accumulated
  * parquet relation.
  */
object CrawlIngest {

  private val payloadCols =
    Seq("doc_id", "url", "domain", "canon_url", "text", "n_words")

  /** The survivor store: payload columns + a constant count. Each doc
    * lives in exactly one batch, so `disjointRows` — compaction is a
    * pure file re-layout, never a corpus-wide shuffle keyed on the text
    * column.
    */
  def store(dir: String): AdditiveStats.Store = AdditiveStats.Store(dir,
    keyCols = payloadCols, countCol = "n",
    schemaDdl = "doc_id bigint, url string, domain string, " +
      "canon_url string, text string, n_words bigint, n bigint, " +
      "batch_id bigint",
    disjointRows = true)

  def init(spark: SparkSession, dir: String): Unit =
    AdditiveStats.init(spark, store(dir))

  def fragmentCount(spark: SparkSession, dir: String): Int =
    AdditiveStats.fragmentCount(spark, store(dir))

  def compact(spark: SparkSession, dir: String): Unit =
    AdditiveStats.compact(spark, store(dir))

  /** The ROW-LOCAL compliant chain over one batch of decoded WARC
    * records `(url, domain, __html)`: robots gate for `agent` against
    * the per-domain `robotsDf(domain, robots_txt)`, meta-robots gate,
    * extraction, word gate. `idOf` derives the document id from the
    * page html (the crawl fixture's title; a real pipeline hashes the
    * canonical URL). Output: one survivor row per fetchable,
    * indexable, long-enough page.
    */
  def curateBatch(recs: DataFrame, robotsDf: DataFrame, agent: String,
                  idOf: Column => Column, minWords: Int): DataFrame = {
    val polite = UrlFunctions.robotsGate(recs, "url", "domain",
      robotsDf, agent)
    val compliant = HtmlFunctions.dropNoindex(polite, "__html")
    compliant.select(col("url"), col("domain"),
        idOf(col("__html")).as("doc_id"),
        UrlFunctions.canonicalizeUrl(col("url")).as("canon_url"),
        HtmlFunctions.mainContent(col("__html")).as("text"))
      .withColumn("n_words",
        TextFunctions.wordCount(col("text")).cast("long"))
      .filter(col("n_words") >= minWords)
      .select(payloadCols.map(col): _*)
  }

  /** Land one batch's survivors as its idempotent fragment. */
  def append(survivors: DataFrame, dir: String, batchId: Long): Unit =
    AdditiveStats.append(
      survivors.select(payloadCols.map(col): _*).withColumn("n", lit(1L)),
      store(dir), batchId)

  /** The accumulated survivor relation (all batches, fold included). */
  def read(spark: SparkSession, dir: String): DataFrame =
    AdditiveStats.read(spark, store(dir))
      .select(payloadCols.map(col): _*)

  /** The corpus-level finalize — q76's exact tail over the accumulated
    * survivors: keep the smallest doc id per canonical URL, drop
    * blocklisted domains, cap each domain at `cap` by the seeded md5
    * draw. Batch-split-invariant by construction (min / anti-join /
    * draw-order window over the full relation).
    */
  def curated(survivors: DataFrame, blockDf: DataFrame,
              cap: Int): DataFrame = {
    // collapse to ONE row per (doc_id, canon_url, domain) FIRST — domain
    // is a function of the canonical URL, so the group key is really
    // (doc_id, canon_url): an identical-content refetch collapses exactly
    // as the old distinct did, and a refetch whose EXTRACTION changed
    // (same page, different text/n_words — routine for a continuous
    // crawler) now resolves deterministically to the largest extraction
    // instead of shipping duplicate doc_ids that bill the domain quota
    // twice (round-21 fix of the r20 advice item; max(n_words) rather
    // than latest-batch because it is BATCH-SPLIT INVARIANT — batch ids
    // differ between the stream and the one-shot chain, n_words does not)
    val canon = survivors.select(col("doc_id"), col("domain"),
        col("canon_url"), col("n_words"))
      .groupBy(col("doc_id"), col("canon_url"), col("domain"))
      .agg(max(col("n_words")).as("n_words"))
    val keepers = canon.groupBy("canon_url")
      .agg(min(col("doc_id")).as("doc_id"))
    val deduped = keepers.join(canon, Seq("doc_id", "canon_url"))
    val unblocked = UrlFunctions.dropBlockedDomains(deduped, "domain",
      blockDf)
    Sampling.cappedPerStratum(unblocked, Seq("domain"), Seq("doc_id"),
        cap = cap,
        hash = Some(md5(col("doc_id").cast("string").cast("binary"))))
      .select("doc_id", "domain", "canon_url", "n_words")
  }
}
