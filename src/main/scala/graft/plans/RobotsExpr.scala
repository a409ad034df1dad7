package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt (RFC 9309, Robots Exclusion Protocol) — the DOMAIN-level
  * compliance gate a crawl pipeline applies before any per-page signal:
  * stage −1.75 of the web chain, between the WARC container split
  * (src22) and the in-page `<meta name="robots">` gate (t49).
  *
  * Reference scope note: the reference pipeline has no web stage
  * (`/root/reference/himalayan_etl/ops/extract.py:16-297` ingests
  * CSV/DBF/REST) — this is the engine's own crawl-curation surface,
  * implemented from the public RFC 9309 text only.
  *
  * Two codegen expressions share this file:
  *
  *   - [[RobotsRulesExpr]]`(txt, agent)` parses ONE robots.txt body and
  *     returns the rule list applicable to product token `agent` as
  *     `array<struct<pattern string, allow boolean>>` — run once per
  *     DOMAIN over the (domain, robots_txt) relation, which is tiny
  *     next to the corpus (one row per registered domain), then
  *     broadcast.
  *   - [[RobotsMatchExpr]]`(rules, target)` evaluates that rule array
  *     against one URI path(+query) and returns
  *     `struct<allowed boolean, pattern string>` — the RFC 9309 §2.2.2
  *     longest-match decision, run per URL inside the scan stage.
  *
  * Scale shape: parse cost is per-domain, not per-document; the per-URL
  * decision is a broadcast hash join (domain → rules) plus one
  * row-local codegen'd match — zero shuffles added to the crawl chain.
  * At 100 TB the robots relation (~millions of domains × a handful of
  * rules) stays far under broadcast limits, and nothing here touches
  * the driver.
  *
  * RFC 9309 semantics implemented (and the deliberate choices where the
  * RFC leaves room):
  *
  *   - Lines are `key: value`, keys case-insensitive; `#` starts a
  *     comment; blank/unknown lines ignored (sitemap etc. are non-group
  *     records). A UTF-8 BOM on the first line is stripped.
  *   - A GROUP is one or more consecutive `user-agent` lines followed by
  *     `allow`/`disallow` rules; a `user-agent` line after rules starts
  *     a new group; rules before any `user-agent` line belong to no
  *     group and are ignored.
  *   - Group selection (§2.2.1 "most specific match"): a group token
  *     matches if it equals the crawler's product token
  *     case-insensitively, or is a case-insensitive PREFIX of it (so a
  *     `googlebot` group governs `googlebot-news` when no
  *     `googlebot-news` group exists — the de-facto behavior of the
  *     reference parsers); specificity = token length in CODE POINTS,
  *     `*` = 0. ALL groups at the winning specificity merge, in
  *     document order (§2.2.1: groups with the same user-agent combine).
  *   - Rules with an empty pattern are dropped (an empty pattern
  *     matches nothing — `Disallow:` alone means allow-all).
  *   - Matching (§2.2.2): patterns anchor at the START of the
  *     path(+query); `*` matches any run of characters including the
  *     empty run; a TRAILING `$` anchors the end of the target (a `$`
  *     anywhere else is a literal octet). Comparison is over UTF-16
  *     units of the strings as given — percent-encoding normalization
  *     is the canonicalizer's job (t34), not the matcher's.
  *   - Decision (§2.2.2): among matching rules the LONGEST pattern (in
  *     CODE POINTS — the external replay's length(); the RFC says
  *     octets, which agrees on ASCII rules) wins; a length tie goes to
  *     `allow` (least restrictive); a further tie (same length, same
  *     verdict) reports the code-point-least pattern — the binary
  *     collation external engines sort by — so the reported winner is
  *     deterministic and replayable. No matching rule (or no rules at
  *     all) → allowed, null pattern.
  */
case class RobotsRulesExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = RobotsRulesExpr.outType
  override def prettyName: String = "robots_rules"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(txt: Any, agent: Any): Any =
    RobotsRulesExpr.compute(txt.asInstanceOf[UTF8String],
      agent.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, a) => s"graft.plans.RobotsRulesExpr.compute($t, $a)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RobotsRulesExpr {

  val ruleType: StructType = StructType(Seq(
    StructField("pattern", StringType, nullable = false),
    StructField("allow", BooleanType, nullable = false)))

  private[plans] val outType: DataType =
    ArrayType(ruleType, containsNull = false)

  private def lower(s: String): String =
    s.toLowerCase(java.util.Locale.ROOT)

  /** Parse + group-select in one pass over the lines. Returns the merged
    * rule list for `agent` in document order.
    */
  def compute(txtU: UTF8String, agentU: UTF8String): ArrayData = {
    val txt = txtU.toString
    val agent = lower(agentU.toString.trim)
    // groups in document order: (bestSpecificityOfItsTokens, rules)
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(Int, scala.collection.mutable.ArrayBuffer[(String, Boolean)])]
    var inUaRun = false // consecutive user-agent lines extend one group
    var first = true
    txt.linesIterator.foreach { raw0 =>
      var line = raw0
      if (first && line.nonEmpty && line.charAt(0) == '\uFEFF')
        line = line.substring(1)
      first = false
      val hash = line.indexOf('#')
      if (hash >= 0) line = line.substring(0, hash)
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = lower(line.substring(0, colon).trim)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            val tok = lower(value)
            // specificity in CODE POINTS, like the rule decision below —
            // RFC product tokens are ASCII (letters/hyphen/underscore)
            // where the two units agree, but a nonconforming token must
            // not reintroduce the UTF-16 divergence the r20 fix removed
            val spec =
              if (tok == "*") 0
              else if (agent == tok || (tok.nonEmpty && agent.startsWith(tok)))
                tok.codePointCount(0, tok.length)
              else -1 // token does not govern this agent
            if (!inUaRun) {
              groups += ((spec,
                scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]))
              inUaRun = true
            } else if (groups.nonEmpty) {
              // consecutive user-agent lines: same group, best token wins
              val (s0, rules) = groups.last
              groups(groups.length - 1) = (math.max(s0, spec), rules)
            }
          case "allow" | "disallow" =>
            inUaRun = false
            if (value.nonEmpty && groups.nonEmpty)
              groups.last._2 += ((value, key == "allow"))
          case _ =>
            // non-group record (sitemap, crawl-delay, unknown): does not
            // terminate a user-agent run per RFC 9309 §2.2
            ()
        }
      }
    }
    val applicable = groups.filter(_._1 >= 0)
    if (applicable.isEmpty) return new GenericArrayData(Array.empty[Any])
    val best = applicable.map(_._1).max
    val merged = applicable.filter(_._1 == best).flatMap(_._2)
    new GenericArrayData(merged.map { case (p, allow) =>
      new GenericInternalRow(
        Array[Any](UTF8String.fromString(p), allow)): Any
    }.toArray)
  }

  /** Column-API entry point. */
  def robotsRules(txt: Column, agent: Column): Column =
    bridge.column(
      RobotsRulesExpr(bridge.expression(txt), bridge.expression(agent)))
}

/** §2.2.2 longest-match decision over a parsed rule array — see the
  * contract on [[RobotsRulesExpr]].
  */
case class RobotsMatchExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = RobotsMatchExpr.outType
  override def prettyName: String = "robots_match"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(s: StructType, _), StringType)
          if s.fields.length == 2 &&
            s.fields(0).dataType == StringType &&
            s.fields(1).dataType == BooleanType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<struct<string,boolean>>, string), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(rules: Any, target: Any): Any =
    RobotsMatchExpr.compute(rules.asInstanceOf[ArrayData],
      target.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (r, t) => s"graft.plans.RobotsMatchExpr.compute($r, $t)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RobotsMatchExpr {

  private[plans] val outType: StructType = StructType(Seq(
    StructField("allowed", BooleanType, nullable = false),
    StructField("pattern", StringType, nullable = true)))

  /** Anchored-at-start wildcard match of one rule pattern against the
    * target: `*` matches any run (incl. empty), a trailing `$` anchors
    * the end, everything else is a literal. Classic two-pointer
    * star-backtracking — O(|pattern|·|target|) worst case on adversarial
    * stars, linear on real rules.
    */
  def ruleMatches(pattern: String, s: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    var i = 0
    var j = 0
    var star = -1
    var mark = 0
    while (j < s.length) {
      if (i == pat.length) {
        if (!anchored) return true // pattern consumed: prefix matched
        if (star < 0) return false
        mark += 1; j = mark; i = star + 1
      } else if (pat.charAt(i) == '*') {
        star = i; mark = j; i += 1
      } else if (pat.charAt(i) == s.charAt(j)) {
        i += 1; j += 1
      } else if (star >= 0) {
        mark += 1; j = mark; i = star + 1
      } else return false
    }
    while (i < pat.length && pat.charAt(i) == '*') i += 1
    i == pat.length
  }

  /** Code-point comparison of two strings (= UTF-8 byte order, the
    * binary collation the external replay sorts by). Java's
    * String.compareTo orders by UTF-16 unit, which ranks supplementary
    * characters BELOW BMP chars ≥ U+E000 — a divergence the ASCII
    * fixtures never see but a non-BMP rule pattern would (round-19
    * ADVICE).
    */
  private[plans] def codePointCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  def compute(rules: ArrayData, targetU: UTF8String): GenericInternalRow = {
    val s = targetU.toString
    val n = rules.numElements()
    var bestPat: String = null
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < n) {
      val row = rules.getStruct(i, 2)
      val p = row.getUTF8String(0).toString
      val allow = row.getBoolean(1)
      if (ruleMatches(p, s)) {
        // longest pattern wins (length in CODE POINTS — the unit the
        // external replay's length() measures; RFC 9309 says octets,
        // which agrees on ASCII rules and is a documented deliberate
        // deviation off it); tie → allow; tie → code-point-least
        // pattern (determinism for the external replay, whose binary
        // collation IS code-point order)
        val pLen = p.codePointCount(0, p.length)
        val better =
          if (bestPat == null) true
          else if (pLen != bestLen) pLen > bestLen
          else if (allow != bestAllow) allow
          else codePointCompare(p, bestPat) < 0
        if (better) { bestPat = p; bestLen = pLen; bestAllow = allow }
      }
      i += 1
    }
    if (bestPat == null) new GenericInternalRow(Array[Any](true, null))
    else new GenericInternalRow(
      Array[Any](bestAllow, UTF8String.fromString(bestPat)))
  }

  /** Column-API entry point. */
  def robotsMatch(rules: Column, target: Column): Column =
    bridge.column(
      RobotsMatchExpr(bridge.expression(rules), bridge.expression(target)))
}
