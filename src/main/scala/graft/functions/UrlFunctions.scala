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
  // click ids, ref) — anchored match covering both the key=value form and
  // the bare valueless form ("?ref", "?utm_source"), so either variant
  // collapses to the same canonical URL (round-13 ADVICE: the old "="-only
  // pattern let valueless params survive and defeat URL dedup).
  val trackingRegex = "^(utm_[^=]*|gclid|fbclid|ref)(=|$)"

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
    * inputs without a `scheme://`. Userinfo is stripped to the LAST `@`
    * (RFC 3986: the final `@` delimits userinfo, and `@` may occur inside
    * it), and bracketed IPv6 literals (`[::1]:8080`) keep their brackets
    * with the port stripped after `]` (round-13 ADVICE: the old
    * first-`@` / `[^:]+` form mis-keyed both shapes).
    */
  def hostOf(c: Column): Column =
    lower(regexp_extract(part(c, 2), "^(?:.*@)?(\\[[^\\]]*\\]|[^:]+)", 1))

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
    * full-PSL (~9k rules) scale path: each host explodes its ≤ labels
    * candidate trailing runs row-locally, Catalyst broadcasts the suffix
    * table into a map-side join, and the longest hit wins per `idCol`
    * (unique row key — the repo-wide operator convention). `suffixDf`
    * must carry one `suffix` string column holding PSL rules in their
    * PUBLISHED form — plain (`co.uk`), wildcard (`*.ck`: `*` matches
    * exactly one label, so any `<label>.ck` is a public suffix) and
    * exception (`!www.ck`: overrides a matching wildcard; the public
    * suffix is the rule minus its leftmost label, making the rule itself
    * the registered domain) — the full publicsuffix.org algorithm: an
    * exception match prevails over everything, otherwise the longest
    * matching rule wins, otherwise the prevailing rule is `*` (last
    * label). Adds `outCol` to `df`; null where no registered domain
    * exists (host is itself a public suffix / single unlisted label).
    *
    * Shape: each host emits ≤ 2·labels candidate strings (the trailing
    * run, and its wildcardized form `*.`+run-minus-first for k ≥ 2); one
    * broadcast hash join against the rule table; one partial-aggregated
    * max per id. Zero UDFs, row-local fan-out, scan-stage at 100 TB.
    */
  def registeredDomainAgainst(df: DataFrame, idCol: String, hostCol: String,
                              suffixDf: DataFrame,
                              outCol: String = "domain"): DataFrame = {
    // rule relation normalized to (match key, kind): plain rules key as
    // themselves (kind 0), wildcard rules keep their "*." key (kind 1),
    // exception rules key WITHOUT the "!" (kind 2) so a host's plain
    // trailing run probes them directly
    val rules = suffixDf.select(
      when(col("suffix").startsWith("!"), expr("substring(suffix, 2)"))
        .otherwise(col("suffix")).as("__cand"),
      when(col("suffix").startsWith("!"), lit(2))
        .when(col("suffix").startsWith("*."), lit(1))
        .otherwise(lit(0)).as("__kind"))
    val labels = split(col(hostCol), "\\.")
    val n = size(labels)
    val psl = df.select(col(idCol), labels.as("__labels"))
      .withColumn("__n", size(col("__labels")))
      .withColumn("__k", explode(sequence(lit(1), col("__n"))))
      // probe both shapes: the trailing k-label run (plain + exception
      // rules) and, for k >= 2, "*." + trailing k-1 (wildcard rules; the
      // "*." prefix keyspace cannot collide with real hostnames)
      .withColumn("__cand", explode(filter(array(
        array_join(slice(col("__labels"), col("__n") - col("__k") + 1,
          col("__k")), "."),
        when(col("__k") >= 2, concat(lit("*."),
          array_join(slice(col("__labels"), col("__n") - col("__k") + 2,
            col("__k") - 1), ".")))), _.isNotNull)))
      .join(broadcast(rules), "__cand")
      // wildcard keys only stand for wildcard rules; plain keys only for
      // plain/exception rules (the join key encodes this by construction)
      .groupBy(col(idCol))
      .agg(
        max(when(col("__kind") === 2, col("__k") - 1)).as("__pslExc"),
        max(when(col("__kind") =!= 2, col("__k"))).as("__pslStd"))
    df.join(psl, Seq(idCol), "left")
      .withColumn("__psl",
        coalesce(col("__pslExc"), col("__pslStd"), lit(1)))
      .withColumn(outCol, when(n > col("__psl"),
        array_join(slice(labels, n - col("__psl"), col("__psl") + 1), ".")))
      .drop("__psl", "__pslExc", "__pslStd")
  }

  /** Parse raw publicsuffix.org FILE LINES into the `suffix` relation
    * [[registeredDomainAgainst]] consumes — so a deployment can point at
    * the published list verbatim (spark.read.text on the dat file):
    * blank lines and `//` comments drop, each rule is the line's first
    * whitespace-delimited token (the PSL spec: "each line is only read
    * up to the first whitespace"), lowercased (rules are
    * case-insensitive; hosts arrive lowercased from [[hostOf]]).
    * Wildcard (`*.`) and exception (`!`) markers pass through — they ARE
    * the rule encoding the matcher understands.
    */
  def pslRules(lines: DataFrame, lineCol: String = "value"): DataFrame =
    lines.select(trim(col(lineCol)).as("__l"))
      .filter(col("__l") =!= "" && !col("__l").startsWith("//"))
      .select(lower(split(col("__l"), "\\s+").getItem(0)).as("suffix"))

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

  // ------------------------------------------------------- robots.txt

  /** The robots-match TARGET of a URL: path (empty → "/") plus the raw
    * query with its `?` — RFC 9309 rules match against the path, and the
    * de-facto matchers include the query so wildcard patterns that pin
    * a query parameter (slash, star, `?ref`) work.
    * Fragments never participate; a BARE trailing `?` (empty query)
    * drops, the same normalization [[canonicalizeUrl]] applies — and the
    * exact algebra the external replay computes (`'?' || qraw` only when
    * qraw is non-empty), so both engines decide identical targets.
    * Non-URL inputs yield "/" (they carry no host either, so no rules
    * ever attach).
    */
  def pathQueryOf(c: Column): Column =
    concat(when(part(c, 3) === "", lit("/")).otherwise(part(c, 3)),
      when(part(c, 4) === "?", lit("")).otherwise(part(c, 4)))

  /** Parse one robots.txt body into the rule list applicable to product
    * token `agent` (RFC 9309 group selection — most-specific match,
    * merged groups; see [[graft.plans.RobotsRulesExpr]]). Run this over
    * the per-DOMAIN robots relation, never per document.
    */
  def robotsRules(txt: Column, agent: Column): Column =
    graft.plans.RobotsRulesExpr.robotsRules(txt, agent)

  /** The `Sitemap:` records of a robots.txt body (RFC 9309 §2.3's
    * non-group line — how a crawler DISCOVERS a site's URL inventory,
    * the natural companion of the allow/disallow gate): per line, strip
    * the `#` comment, match the case-insensitive `sitemap:` key, return
    * the whitespace-trimmed value. Pure column algebra (split + HOFs +
    * RE2-safe regexes), so an external engine replays the extraction
    * verbatim — no custom expression needed.
    */
  def robotsSitemaps(txt: Column): Column =
    filter(
      transform(split(txt, "\n"), l => {
        val noComment = regexp_replace(l, "#.*$", "")
        when(noComment.rlike("(?i)^\\s*sitemap\\s*:"),
          regexp_replace(
            regexp_replace(noComment, "(?i)^\\s*sitemap\\s*:\\s*", ""),
            "\\s+$", ""))
      }),
      v => v.isNotNull && v =!= "")

  /** Full §2.2.2 decision over a parsed rule array:
    * `struct<allowed boolean, pattern string>` — longest match wins,
    * ties to allow, no match → allowed with null pattern.
    */
  def robotsDecision(rules: Column, target: Column): Column =
    graft.plans.RobotsMatchExpr.robotsMatch(rules, target)

  /** Boolean form of [[robotsDecision]] — the gate predicate. */
  def robotsAllowed(rules: Column, target: Column): Column =
    robotsDecision(rules, target).getField("allowed")

  /** robots.txt compliance gate — stage −1.75 of the crawl chain: keep
    * the rows of `df` whose URL (column `urlCol`) is allowed for `agent`
    * under its registered domain's robots.txt. `robotsDf` is the
    * per-domain relation `(domain string, robots_txt string)` — one row
    * per domain that HAS a robots.txt; domains without one (and URLs
    * with no domain) pass, per the protocol's absence-means-allow rule.
    *
    * Shape: rules parse once per DOMAIN (codegen, on the small side),
    * broadcast hash join into the corpus scan, one row-local match per
    * URL — zero added shuffles.
    */
  def robotsGate(df: DataFrame, urlCol: String, domainCol: String,
                 robotsDf: DataFrame, agent: String): DataFrame = {
    // the internal join column must not clobber caller data (the same
    // added-columns contract Release.publish enforces on split/shard)
    require(!df.columns.contains("__rules"),
      "input already carries a '__rules' column, which robotsGate uses " +
        "internally and would silently drop — rename it first")
    val rules = robotsDf.select(col("domain").as(domainCol),
      robotsRules(col("robots_txt"), lit(agent)).as("__rules"))
    // coalesce(…, true): the gate is PERMISSIVE by contract — a null URL
    // under a domain that HAS rules makes robotsAllowed null, and a bare
    // `null || null` predicate would silently DROP the row (SQL
    // three-valued logic), the opposite of nothing-silently-dropped;
    // such rows pass the gate and downstream stages decide their fate
    df.join(broadcast(rules), Seq(domainCol), "left")
      .filter(col("__rules").isNull ||
        coalesce(robotsAllowed(col("__rules"), pathQueryOf(col(urlCol))),
          lit(true)))
      .drop("__rules")
  }
}
