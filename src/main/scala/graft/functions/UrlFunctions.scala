package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain-level curation functions — the FIRST stage of every
  * web-scale pretraining pipeline (CCNet, RefinedWeb, FineWeb): URL
  * canonicalization, host/registered-domain extraction against a
  * public-suffix list, per-domain quotas and blocklist joins all run
  * BEFORE any text operator touches the payload. Reference analogue: the
  * extract-contract discipline of dw-etl `ops/extract.py:32-114` applied
  * to the web-corpus domain (the reference has no web stage; this is the
  * LLM-pipeline extension surface).
  *
  * Everything here is pure column string algebra — codegen'd regex +
  * array HOFs, zero UDFs — so it runs map-side inside the scan stage at
  * 100 TB and an external engine (the DuckDB oracle) replays every
  * decision bit-for-bit.
  */
object UrlFunctions {

  // One regex splits the URL into (scheme, authority, path, ?query, #frag).
  // RE2-safe (no backrefs/lookarounds): both java.util.regex and DuckDB's
  // RE2 compile it identically.
  val urlRegex =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?$"

  // Tracking parameters every web-corpus canonicalizer strips (utm_*,
  // click ids, bare ref) — anchored key=value match.
  val trackingRegex = "^(utm_[^=]*|gclid|fbclid|ref)="

  private def part(c: Column, group: Int): Column =
    regexp_extract(trim(c), urlRegex, group)

  /** Canonical URL: scheme and host lowercased, default port stripped
    * (http:80 / https:443), fragment dropped, tracking parameters
    * (`utm_*`, `gclid`, `fbclid`, `ref`) removed preserving the order of
    * the rest, empty path → "/", empty residual query dropped. Inputs
    * without a `scheme://` pass through trimmed (contract: canonicalize
    * what parses; don't guess at relative references).
    */
  def canonicalizeUrl(c: Column): Column = {
    val scheme = lower(part(c, 1))
    val auth = lower(part(c, 2))
    val authNoPort =
      when(scheme === "http", regexp_replace(auth, ":80$", ""))
        .when(scheme === "https", regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    val path = when(part(c, 3) === "", lit("/")).otherwise(part(c, 3))
    val kept = filter(split(substring(part(c, 4), 2, 1 << 30), "&"),
      p => p =!= "" && !p.rlike(trackingRegex))
    val query = when(size(kept) > 0,
      concat(lit("?"), array_join(kept, "&"))).otherwise(lit(""))
    when(part(c, 1) === "", trim(c))
      .otherwise(concat(scheme, lit("://"), authNoPort, path, query))
  }

  /** Lowercased host: authority minus userinfo and port. Empty string for
    * inputs without a `scheme://`.
    */
  def hostOf(c: Column): Column =
    lower(regexp_extract(part(c, 2), "^(?:[^@]*@)?([^:]+)", 1))

  /** REGISTERED (pay-level) domain by longest public-suffix match — the
    * per-site key every domain quota, blocklist and provenance report
    * groups by. `suffixes` is a public-suffix list subset passed as a
    * driver literal (plain rules only — wildcard/exception PSL rules are
    * data for [[registeredDomainAgainst]]'s relation form): the longest
    * trailing label-run of the host that appears in the list is the
    * public suffix, the unlisted-TLD prevailing rule falls back to the
    * last label, and the registered domain is one label more than the
    * suffix. A host that IS a public suffix (or a single unlisted label)
    * yields null. Cost: ≤ labels−1 literal set probes per row, row-local.
    */
  def registeredDomain(host: Column, suffixes: Seq[String]): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val s = typedlit(suffixes)
    // k runs to n INCLUSIVE: a host that equals a full rule is itself a
    // public suffix (no registered domain), not a 1-label registrant
    val ks = sequence(lit(1), n)
    val bestK = aggregate(ks, lit(0), (acc, k) =>
      when(array_contains(s, array_join(slice(labels, n - k + 1, k), ".")),
        k.cast("int")).otherwise(acc))
    val psl = when(bestK === 0, lit(1)).otherwise(bestK)
    when(n > psl,
      array_join(slice(labels, n - psl, psl + 1), "."))
  }

  /** [[registeredDomain]] against a RELATION of public suffixes — the
    * full-PSL (~9k rules) scale path: each host explodes its ≤ labels−1
    * candidate trailing runs row-locally, Catalyst broadcasts the suffix
    * table into a map-side join, and the longest hit wins per `idCol`
    * (unique row key — the repo-wide operator convention). `suffixDf`
    * must carry one `suffix` string column. Adds `outCol` to `df`; null
    * where no registered domain exists (host is itself a suffix / single
    * label).
    */
  def registeredDomainAgainst(df: DataFrame, idCol: String, hostCol: String,
                              suffixDf: DataFrame,
                              outCol: String = "domain"): DataFrame = {
    val labels = split(col(hostCol), "\\.")
    val n = size(labels)
    val psl = df.select(col(idCol), labels.as("__labels"))
      .withColumn("__n", size(col("__labels")))
      .withColumn("__k", explode(sequence(lit(1), col("__n"))))
      .withColumn("__cand",
        array_join(slice(col("__labels"), col("__n") - col("__k") + 1,
          col("__k")), "."))
      .join(broadcast(suffixDf.select(col("suffix").as("__cand"))), "__cand")
      .groupBy(col(idCol))
      .agg(max(col("__k")).as("__psl"))
    df.join(psl, Seq(idCol), "left")
      .withColumn("__psl", coalesce(col("__psl"), lit(1)))
      .withColumn(outCol, when(n > col("__psl"),
        array_join(slice(labels, n - col("__psl"), col("__psl") + 1), ".")))
      .drop("__psl")
  }

  /** Blocklist filter: drop rows whose registered domain appears in
    * `blockDf` (one `domain` column). Small lists broadcast into a
    * map-side anti-join on their own; corpus-scale lists route through
    * [[graft.ext.BloomJoin]] upstream — this is the final exact
    * anti-join either way.
    */
  def dropBlockedDomains(df: DataFrame, domainCol: String,
                         blockDf: DataFrame): DataFrame =
    df.join(broadcast(blockDf.select(col("domain").as(domainCol))),
      Seq(domainCol), "left_anti")
}
