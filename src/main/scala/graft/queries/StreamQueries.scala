package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Cols, Tables}
import graft.operators.{AsOfJoin, Dedup}

/** Event-time window semantics over the `events` table, run in BATCH mode —
  * `window` / `session_window` are mode-agnostic, so these same plans run
  * under Structured Streaming via graft.streaming.StreamOps (differential
  * stream-vs-batch tests live in StreamingSpec). Covers tumbling, sliding and
  * session windows, stateful keep-first dedup, a watermark late-data model,
  * and a backward as-of join (tag+union+window plan — one shuffle, no range
  * explosion).
  */
object StreamQueries {

  private def q(name: String, oracle: Option[String])(fn: (SparkSession, String) => DataFrame) =
    GraftQuery(name, fn, oracle)
  import GraftQuery.dsum

  // ---------------------------------------------------------------- s01
  /** 1-hour tumbling windows per event type. */
  val s01_tumbling_agg = q("s01_tumbling_agg", Some(
    s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
       |  COUNT(*) AS n, ${dsum("value")} AS sum_value
       |FROM events GROUP BY 1, 2""".stripMargin)) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Cols.decimalSum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  // ---------------------------------------------------------------- s02
  /** 1-hour windows sliding every 30 minutes (each event lands in exactly
    * two windows; the oracle materializes both window starts per event).
    */
  val s02_sliding_agg = q("s02_sliding_agg", Some(
    s"""WITH x AS (
       |  SELECT e.*, make_timestamp(CAST((floor(epoch(ts) / 1800) * 1800 - off) * 1000000 AS BIGINT)) AS ws
       |  FROM events e CROSS JOIN (SELECT unnest([0, 1800]) AS off) o)
       |SELECT ws AS window_start, event_type, COUNT(*) AS n, ${dsum("value")} AS sum_value
       |FROM x GROUP BY 1, 2""".stripMargin)) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Cols.decimalSum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  // ---------------------------------------------------------------- s03
  /** Per-user session windows with a 30-minute inactivity gap; session end =
    * last event + gap (Spark session_window semantics, [start, end) half-open
    * — an event exactly at the previous end starts a NEW session, hence the
    * strict `<` in the oracle's island rule).
    */
  val s03_session_windows = q("s03_session_windows", Some(
    """WITH o AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS brk
      |  FROM events),
      |g AS (
      |  SELECT user_id, ts,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM o)
      |SELECT user_id, MIN(ts) AS session_start,
      |  MAX(ts) + INTERVAL 30 MINUTE AS session_end, COUNT(*) AS n
      |FROM g GROUP BY user_id, sid""".stripMargin)) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n"))
  }

  // ---------------------------------------------------------------- s04
  /** Stateful keep-first dedup per (user_id, event_type) — the batch twin of
    * streaming `dropDuplicatesWithinWatermark`.
    */
  val s04_dedup_first_event = q("s04_dedup_first_event", Some(
    """SELECT user_id, event_type, event_id FROM (
      |  SELECT user_id, event_type, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events) t
      |WHERE rn = 1""".stripMargin)) { (s, dir) =>
    Dedup.keepFirst(Tables.events(s, dir), Seq("user_id", "event_type"),
        Seq(col("ts"), col("event_id")))
      .select("user_id", "event_type", "event_id")
  }

  // ---------------------------------------------------------------- s05
  /** Watermark late-data model: processing order = event_id; an event is
    * "late" if the max event-time already seen exceeds its own by > 30 min
    * (exactly the rows a 30-minute watermark would drop). The "max seen so
    * far" is a DATA-SIZED prefix aggregate, so it rides
    * [[graft.operators.PrefixAgg.maxExclusive]]'s two-pass (round 15's
    * global-window sweep caught the old single `Window.orderBy` form —
    * the one data-sized single-partition window in the registry) while
    * the oracle keeps the definitional one-window SQL.
    */
  val s05_watermark_late = q("s05_watermark_late", Some(
    """WITH m AS (
      |  SELECT ts, MAX(ts) OVER (ORDER BY event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mp
      |  FROM events)
      |SELECT CAST(COALESCE(SUM(CASE WHEN mp IS NOT NULL
      |         AND epoch_us(mp) - epoch_us(ts) > 1800000000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_late,
      |  COUNT(*) AS n_events
      |FROM m""".stripMargin)) { (s, dir) =>
    graft.operators.PrefixAgg.maxExclusive(
        Tables.events(s, dir).select("event_id", "ts"),
        Seq(col("event_id")), col("ts"), "mp")
      .agg(
        sum(when(col("mp").isNotNull &&
            unix_micros(col("mp")) - unix_micros(col("ts")) > 1800000000L, 1)
          .otherwise(0)).cast("long").as("n_late"),
        count(lit(1)).as("n_events"))
  }

  // ---------------------------------------------------------------- s06
  /** Backward as-of join: each click picks up the value of the user's most
    * recent purchase at-or-before it (inclusive — mirrors native ASOF JOIN).
    */
  val s06_asof_backward = q("s06_asof_backward", Some(
    """SELECT c.event_id, p.value AS last_purchase_value
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin)) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"), col("value").as("last_purchase_value"))
    AsOfJoin.backward(clicks, purchases, keys = Seq("user_id"),
        leftTs = "ts", rightTs = "pts", payloadCols = Seq("last_purchase_value"))
      .select("event_id", "last_purchase_value")
  }

  // ---------------------------------------------------------------- s07
  /** Batch twin of `StreamOps.runningUserAgg` (flatMapGroupsWithState): the
    * per-user RUNNING count/total after each event — exactly the row the
    * streaming state machine emits in Update mode when that event's
    * micro-batch arrives (one event per batch). A cumulative keyed window;
    * the total order (ts, event_id) is the stream's arrival order. The
    * running sum routes through DECIMAL so the cumulative fold can't
    * diverge between engines (DuckDB computes windowed sums via segment
    * trees — a different association order than a sequential fold).
    * Stream-vs-batch equivalence of the final per-user row is asserted
    * differentially in StreamingSpec.
    */
  val s07_running_user_agg = q("s07_running_user_agg", Some(
    """SELECT event_id, user_id, COUNT(*) OVER w AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS total_value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir).select(col("event_id"), col("user_id"),
      count(lit(1)).over(w).as("n_events"),
      Cols.decimalSumOver(col("value"), w).as("total_value"))
  }

  // ---------------------------------------------------------------- s08
  /** Batch twin of a stream-stream INTERVAL JOIN (the attribution shape):
    * every (click, purchase) pair of the same user where the purchase lands
    * within [click, click + 1 hour]. Under Structured Streaming the same
    * plan runs as a watermarked stream-stream inner join — the time-range
    * predicate is what lets Spark bound both join states (a click's state
    * can be dropped once the watermark passes click_ts + 1 hour) —
    * differentially proven in StreamingSpec. Batch execution is a plain
    * equi-join on user_id with the range as a post-filter (one shuffle).
    */
  val s08_interval_join = q("s08_interval_join", Some(
    """SELECT c.event_id AS click_id, p.event_id AS purchase_id,
      |  CAST((epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS BIGINT) AS lag_sec
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id
      |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR""".stripMargin)) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    clicks.join(purchases, Seq("user_id"))
      .filter(col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("purchase_id"),
        expr("(unix_micros(pts) - unix_micros(cts)) div 1000000").as("lag_sec"))
  }

  // ---------------------------------------------------------------- s09
  /** Streaming curation front ([[graft.streaming.StreamOps.curate]]):
    * quality gate + language gate + content-fingerprint dedup as one
    * mode-agnostic transform — the ingest-time half of t08, runnable over
    * an unbounded document stream (StreamingSpec proves stream-vs-batch
    * agreement). This batch twin pins dedup to smallest-doc_id-per-
    * fingerprint so the oracle is deterministic.
    */
  val s09_stream_curation = q("s09_stream_curation", Some(
    s"""WITH n AS (SELECT doc_id, text,
       |  trim(regexp_replace(regexp_replace(text, '[\\r\\n]+', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, text, norm,
       |    CASE WHEN length(norm) = 0 THEN 0
       |         ELSE len(string_split(norm, ' ')) END AS wc,
       |    len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]{}-]')) AS punct,
       |    len(regexp_extract_all(lower(norm),
       |        '\\b(the|a|an|and|or|of|to|in|is|it|that|for|on|with|as)\\b')) AS stop
       |  FROM n),
       |scored AS (
       |  SELECT doc_id, text, norm,
       |    ROUND(least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
       |      + greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0
       |          ELSE CAST(punct AS DOUBLE) / CAST(length(text) AS DOUBLE) END) * 5.0) * 0.3
       |      + least((CASE WHEN wc = 0 THEN 0.0
       |          ELSE CAST(stop AS DOUBLE) / CAST(wc AS DOUBLE) END) * 4.0, 1.0) * 0.3, 6)
       |      AS quality,
       |    len(regexp_extract_all(lower(norm), '\\b(the|and|of|is|with)\\b')) AS hen,
       |    len(regexp_extract_all(lower(norm), '\\b(le|la|et|les|des)\\b')) AS hfr,
       |    len(regexp_extract_all(lower(norm), '\\b(el|los|las|una|y)\\b')) AS hes,
       |    len(regexp_extract_all(lower(norm), '\\b(der|die|und|das|ist)\\b')) AS hde
       |  FROM m),
       |en AS (
       |  SELECT doc_id, md5(lower(norm)) AS fp, quality FROM scored
       |  WHERE quality >= 0.5
       |    AND NOT regexp_matches(text, '[\\x{4e00}-\\x{9fff}]')
       |    AND hen + hfr + hes + hde > 0
       |    AND hen >= hfr AND hen >= hes AND hen >= hde),
       |d AS (SELECT doc_id, fp, quality,
       |        ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM en)
       |SELECT doc_id, fp, quality FROM d WHERE rn = 1""".stripMargin)) { (s, dir) =>
    graft.streaming.StreamOps.curateKeepFirst(
      Tables.documents(s, dir), "doc_id", "text")
  }

  // ---------------------------------------------------------------- s10
  /** CONTINUOUS line-dedup ingest ([[graft.streaming.StreamOps
    * .lineStatsStream]] + [[graft.operators.LineDedup
    * .dedupLinesWithStats]]) — the streaming twin of t15's corpus-level
    * boilerplate cut. The per-line distinct-doc statistics accumulate in
    * two per-batch fragments (even doc_ids, then odd — staged once per
    * JVM, exactly the relation the micro-batch stream maintains), and
    * the cut runs against the SUMMED relation. The planted lines gate
    * every code path: two lines in all docs (removed), one in 4 docs
    * split 2+2 across the fragments — removed ONLY if cross-fragment
    * summation works; no single fragment reaches minDocs = 3 — and one
    * in 2 docs (1+1, stays). Oracle: the untouched documents table plus
    * the surviving rare line on doc_id < 2.
    */
  val s10_line_stats_ingest = q("s10_line_stats_ingest", Some(
    """SELECT doc_id,
      |  CASE WHEN doc_id < 2
      |       THEN text || chr(10) || 'Rare promo banner, twice only.'
      |       ELSE text END AS text
      |FROM documents""".stripMargin)) { (s, dir) =>
    import graft.operators.LineDedup
    def planted(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      concat(col("text"),
        lit("\nAll Rights Reserved. See terms for details."),
        lit("\nThis site uses cookies to improve your experience."),
        when(col("doc_id") < 4, lit("\nSubscribe to our newsletter today!"))
          .otherwise(lit("")),
        when(col("doc_id") < 2, lit("\nRare promo banner, twice only."))
          .otherwise(lit(""))).as("text"))
    val root = DedupQueries.DedupStaging.ensure("s10", dir) { r =>
      // protocol-managed store with a COMPACTION between the installments:
      // the cut below must merge a folded partition with a live fragment,
      // so fold arithmetic sits under the hash gate too
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$r/line_stats"))
      val docs = planted(Tables.documents(s, dir))
      LineDedup.initStats(s, s"$r/line_stats")
      LineDedup.appendLineStats(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", s"$r/line_stats", batchId = 0L)
      LineDedup.compactStats(s, s"$r/line_stats")
      LineDedup.appendLineStats(docs.filter(col("doc_id") % 2 =!= 0),
        "doc_id", "text", s"$r/line_stats", batchId = 1L)
    }
    LineDedup.dedupLinesWithStats(planted(Tables.documents(s, dir)),
        "doc_id", "text", LineDedup.readStats(s, s"$root/line_stats"),
        minDocs = 3)
      .select("doc_id", "text")
  }

  // ---------------------------------------------------------------- s11
  /** CONTINUOUS drift monitoring ([[graft.operators.Drift.windowedPsi]]):
    * per-6-hour-window PSI of `events.value` against a fixed uniform
    * baseline on the 10-bin [0, 500) grid — "does this window of ingest
    * still look like the training distribution?". The plan's only
    * stateful operator is one windowed aggregation (per-bin conditional
    * counts + total in a single agg), so the IDENTICAL code runs under
    * Structured Streaming with a watermark (StreamingSpec differential);
    * here it runs in batch for the oracle. Windows are epoch-aligned
    * (Spark tumbling semantics), mirrored in SQL via epoch arithmetic.
    */
  val s11_stream_drift = q("s11_stream_drift", Some(
    """WITH w AS (
      |  SELECT make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 * 1000000 AS BIGINT)) AS ws,
      |         CAST(least(greatest(floor(value / 50.0), 0.0), 9.0) AS INT) AS bin
      |  FROM events),
      |t AS (SELECT ws, COUNT(*) AS total FROM w GROUP BY ws),
      |c AS (SELECT ws, bin, COUNT(*) AS n FROM w GROUP BY ws, bin),
      |g AS (SELECT t.ws, gb.bin, COALESCE(c.n, 0) AS n, t.total
      |      FROM t CROSS JOIN (SELECT unnest(range(10)) AS bin) gb
      |      LEFT JOIN c ON c.ws = t.ws AND c.bin = gb.bin),
      |m AS (SELECT ws, bin, n / CAST(total AS DOUBLE) + 0.000001 AS qm,
      |        CAST(0.1 AS DOUBLE) + CAST(0.000001 AS DOUBLE) AS pm
      |      FROM g)
      |SELECT ws AS window_start, CAST(bin AS INT) AS bin,
      |  ROUND(qm, 6) AS q_mass,
      |  ROUND((pm - qm) * ln(pm / qm), 6) AS contrib
      |FROM m""".stripMargin)) { (s, dir) =>
    graft.operators.Drift.windowedPsi(Tables.events(s, dir), "ts", "value",
      "6 hours", refMasses = Seq.fill(10)(0.1), lo = 0.0, hi = 500.0)
  }

  // ---------------------------------------------------------------- s12
  /** LEFT OUTER interval join — s08's conversion join keeping the
    * UNconverted clicks (null purchase columns): the attribution query a
    * funnel pipeline actually runs. Mode-agnostic plan; in streaming mode
    * the same plan needs watermarks on BOTH sides, and Spark emits the
    * null-padded row only when the watermark proves no match can still
    * arrive — state stays bounded by the time-range predicate
    * (StreamingSpec's left-outer differential drives exactly that,
    * sentinel-advanced watermark included).
    */
  val s12_interval_left_join = q("s12_interval_left_join", Some(
    """SELECT c.event_id AS click_id, p.event_id AS purchase_id,
      |  CAST((epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS BIGINT) AS lag_sec
      |FROM (SELECT * FROM events WHERE event_type = 'click') c
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id
      |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR""".stripMargin)) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_uid"), col("ts").as("pts"))
    clicks.join(purchases,
        col("user_id") === col("p_uid") &&
          col("pts") >= col("cts") &&
          col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"),
        "left_outer")
      .select(col("click_id"), col("purchase_id"),
        expr("(unix_micros(pts) - unix_micros(cts)) div 1000000").as("lag_sec"))
  }

  // ---------------------------------------------------------------- s13
  /** Funnel resolution ([[graft.operators.Funnel.resolve]]): per user,
    * the earliest strictly-increasing view → click → purchase chain —
    * `t_click` is the first click AFTER the first view, `t_purchase` the
    * first purchase after THAT click; `reached` counts completed stages.
    * Order-independent (mins), so any engine resolves the same chain.
    */
  val s13_funnel_conversion = q("s13_funnel_conversion", Some(
    """WITH s1 AS (
      |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t_1
      |  FROM events GROUP BY user_id
      |  HAVING min(CASE WHEN event_type = 'view' THEN ts END) IS NOT NULL),
      |s2 AS (
      |  SELECT e.user_id, any_value(s1.t_1) AS t_1,
      |    min(CASE WHEN e.event_type = 'click' AND e.ts > s1.t_1
      |             THEN e.ts END) AS t_2
      |  FROM events e JOIN s1 USING (user_id) GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, any_value(s2.t_1) AS t_1, any_value(s2.t_2) AS t_2,
      |    min(CASE WHEN e.event_type = 'purchase' AND e.ts > s2.t_2
      |             THEN e.ts END) AS t_3
      |  FROM events e JOIN s2 USING (user_id) GROUP BY e.user_id)
      |SELECT user_id, t_1, t_2, t_3,
      |  CAST(CAST(t_1 IS NOT NULL AS INT) + CAST(t_2 IS NOT NULL AS INT)
      |    + CAST(t_3 IS NOT NULL AS INT) AS INT) AS reached
      |FROM s3""".stripMargin)) { (s, dir) =>
    graft.operators.Funnel.resolve(Tables.events(s, dir),
      "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
  }

  // ---------------------------------------------------------------- s14
  /** CONTINUOUS span-stats ingest under the oracle gate: the corpus's
    * window-frequency relation accumulates in two installments (with a
    * compaction FOLD between them, so fragment summation and fold
    * arithmetic both sit under the hash check) and the span cut applies
    * against the accumulated stats — bit-identical to the one-shot
    * removal, which is exactly what the DuckDB oracle recomputes.
    */
  val s14_span_stats_ingest = q("s14_span_stats_ingest",
    TextQueries.t19_span_removal.oracle) { (s, dir) =>
    import graft.operators.SpanDedup
    val root = DedupQueries.DedupStaging.ensure("s14", dir) { r =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$r/span_stats"))
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      SpanDedup.initSpanStats(s, s"$r/span_stats")
      SpanDedup.appendSpanStats(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", s"$r/span_stats", n = 8, batchId = 0L)
      SpanDedup.compactSpanStats(s, s"$r/span_stats")
      SpanDedup.appendSpanStats(docs.filter(col("doc_id") % 2 =!= 0),
        "doc_id", "text", s"$r/span_stats", n = 8, batchId = 1L)
    }
    SpanDedup.removeSpansWithStats(
      Tables.documents(s, dir).select(col("doc_id"), col("text")),
      "doc_id", "text",
      SpanDedup.readSpanStats(s, s"$root/span_stats"), n = 8, minDocs = 2)
  }

  // ---------------------------------------------------------------- s15
  /** CONTINUOUS INVERTED-INDEX ingest: posting lists accumulated in two
    * installments (even docs → compaction fold → odd docs) through the
    * [[graft.operators.Retrieval]] posting store must answer conjunctive
    * search identically to a one-shot index build — t24's oracle replays
    * the search over the full corpus, so the gate proves the fold
    * arithmetic, not just the happy path. The streaming twin
    * (`StreamOps.postingsStream`) is differential-tested in StreamingSpec.
    */
  val s15_posting_ingest = q("s15_posting_ingest",
    TextQueries.t24_keyword_search.oracle) { (s, dir) =>
    import graft.operators.Retrieval
    val root = DedupQueries.DedupStaging.ensure("s15", dir) { r =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$r/postings"))
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      Retrieval.initPostings(s, s"$r/postings")
      Retrieval.appendPostings(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", s"$r/postings", batchId = 0L)
      Retrieval.compactPostings(s, s"$r/postings")
      Retrieval.appendPostings(docs.filter(col("doc_id") % 2 =!= 0),
        "doc_id", "text", s"$r/postings", batchId = 1L)
    }
    Retrieval.searchAll(Retrieval.readPostings(s, s"$root/postings"),
      "doc_id", Seq("dup", "vector", "spark"))
  }

  // ---------------------------------------------------------------- s16
  /** CONTINUOUS WINDOWED-METRIC VIEW: daily event-type counts accumulated
    * in two installments (even event ids → compaction fold → odd ids)
    * through [[graft.operators.MetricView]] must answer the per-day
    * top-3 dashboard probe identically to a direct aggregation of all
    * events — the oracle recomputes from the fact table, so the gate
    * proves the MV's fold arithmetic. Streaming twin
    * (`StreamOps.metricViewStream`) differential-tested in StreamingSpec.
    */
  val s16_windowed_mv = q("s16_windowed_mv", Some(
    """WITH c AS (SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
      |           FROM events GROUP BY 1, 2),
      |r AS (SELECT day, event_type, n,
      |        ROW_NUMBER() OVER (PARTITION BY day ORDER BY n DESC, event_type) AS rk
      |      FROM c)
      |SELECT day, event_type, n, CAST(rk AS INT) AS rk
      |FROM r WHERE rk <= 3""".stripMargin)) { (s, dir) =>
    import graft.operators.MetricView
    val root = DedupQueries.DedupStaging.ensure("s16", dir) { r =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$r/metric_view"))
      val ev = Tables.events(s, dir).select(col("event_id"), col("ts"), col("event_type"))
      MetricView.init(s, s"$r/metric_view")
      MetricView.append(ev.filter(col("event_id") % 2 === 0),
        "ts", "event_type", s"$r/metric_view", batchId = 0L)
      MetricView.compact(s, s"$r/metric_view")
      MetricView.append(ev.filter(col("event_id") % 2 =!= 0),
        "ts", "event_type", s"$r/metric_view", batchId = 1L)
    }
    MetricView.topKPerDay(
      MetricView.read(s, s"$root/metric_view"), "event_type", k = 3)
  }

  // ---------------------------------------------------------------- s17
  private def s17View(dir: String) = graft.sources.JoinView.View(dir,
    keys = Seq("custkey"),
    leftDdl = "custkey bigint, o_orderkey bigint, o_totalprice double, batch_id bigint",
    rightDdl = "custkey bigint, c_name string, batch_id bigint",
    joinDdl = "custkey bigint, o_orderkey bigint, o_totalprice double, " +
      "c_name string, batch_id bigint")

  /** INCREMENTALLY-MAINTAINED JOIN VIEW ([[graft.sources.JoinView]]):
    * orders ⨝ customer accumulated in two installments per side (split so
    * cross-batch pairs — an even-batch order meeting an odd-batch
    * customer — only exist if the delta algebra is right), with a
    * compaction fold mid-accumulation; the view must equal the one-shot
    * join of the full inputs, which is exactly what the oracle recomputes.
    * Streaming twin (`StreamOps.joinViewStream`) differential-tested in
    * StreamingSpec.
    */
  val s17_join_view = q("s17_join_view", Some(
    """SELECT o_custkey AS custkey, o_orderkey, o_totalprice, c_name
      |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin)) { (s, dir) =>
    import graft.sources.JoinView
    val root = DedupQueries.DedupStaging.ensure("s17", dir) { r =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$r/join_view"))
      val ords = Tables.orders(s, dir).select(col("o_custkey").as("custkey"),
        col("o_orderkey"), col("o_totalprice"))
      val cust = Tables.customer(s, dir).select(
        col("c_custkey").as("custkey"), col("c_name"))
      val view = s17View(s"$r/join_view")
      JoinView.init(s, view)
      JoinView.appendBatch(ords.filter(col("o_orderkey") % 2 === 0),
        cust.filter(col("custkey") % 2 === 0), view, 0L)
      JoinView.compact(s, view)
      JoinView.appendBatch(ords.filter(col("o_orderkey") % 2 =!= 0),
        cust.filter(col("custkey") % 2 =!= 0), view, 1L)
    }
    JoinView.read(s, s17View(s"$root/join_view"))
  }

  // ---------------------------------------------------------------- s18
  /** CONTINUOUS DISTINCT-COUNT VIEW ([[graft.operators.DistinctView]]):
    * per-day distinct users accumulated as KMV-sketch fragments in two
    * installments (with a compaction fold between) — a user active in
    * BOTH batches must count once, which no additive counter can do; the
    * sketch union dedups by hash exactly. The oracle is a full-strength
    * COUNT(DISTINCT): at sf0.01 every day holds < k = 256 distinct
    * users, the regime where a KMV sketch is EXACT by construction
    * (estimate = |values| while under k) — so the DuckDB gate proves the
    * whole fragment/fold/replay machinery end-to-end; the k-exceeding
    * estimation regime is pinned by q40's golden and KmvSketchSpec, and
    * the sf0.1 bench runs this query genuinely estimating.
    */
  val s18_distinct_mv = q("s18_distinct_mv", Some(
    """SELECT CAST(ts AS DATE) AS day,
      |  CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS est_distinct
      |FROM events GROUP BY 1""".stripMargin)) { (s, dir) =>
    import graft.operators.DistinctView
    val root = DedupQueries.DedupStaging.ensure("s18", dir) { r =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$r/distinct_view"))
      val ev = Tables.events(s, dir).select(col("event_id"), col("ts"), col("user_id"))
      DistinctView.init(s, s"$r/distinct_view")
      DistinctView.append(ev.filter(col("event_id") % 2 === 0),
        "ts", "user_id", s"$r/distinct_view", batchId = 0L)
      DistinctView.compact(s, s"$r/distinct_view")
      DistinctView.append(ev.filter(col("event_id") % 2 =!= 0),
        "ts", "user_id", s"$r/distinct_view", batchId = 1L)
    }
    DistinctView.read(s, s"$root/distinct_view")
  }

  // ---------------------------------------------------------------- s19
  /** CONTINUOUS PERCENTILE VIEW ([[graft.operators.PercentileView]]):
    * per-day p50/p95/p99 of event value cents accumulated as
    * quantile-sketch fragments in two installments (compaction fold
    * between) — the latency-dashboard view neither a counter (s16) nor a
    * KMV union (s18) can answer. At s = 15 every cent value (< 2^16) sits
    * in the sketch's EXACT regime, so the DuckDB oracle is the full-
    * strength rank-exact percentile over the fact table — proving the
    * fragment/fold/replay machinery end to end; the estimation regime is
    * pinned by q68's bit-replayed oracle and QuantileSketchSpec. Streaming
    * twin (`StreamOps.percentileViewStream`) differential-tested in
    * StreamingSpec.
    */
  val s19_percentile_mv = q("s19_percentile_mv", Some(
    """WITH e AS (SELECT CAST(ts AS DATE) AS day,
      |        CAST(floor(value * 100) AS BIGINT) AS x FROM events),
      |t AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1),
      |r AS (SELECT day, x,
      |        ROW_NUMBER() OVER (PARTITION BY day ORDER BY x) AS rn FROM e)
      |SELECT r.day, t.n AS n_events,
      |  MIN(CASE WHEN rn >= (50 * n + 99) // 100 THEN x END) AS p50,
      |  MIN(CASE WHEN rn >= (95 * n + 99) // 100 THEN x END) AS p95,
      |  MIN(CASE WHEN rn >= (99 * n + 99) // 100 THEN x END) AS p99
      |FROM r JOIN t USING (day)
      |GROUP BY 1, 2""".stripMargin)) { (s, dir) =>
    import graft.operators.PercentileView
    val root = DedupQueries.DedupStaging.ensure("s19", dir) { r =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$r/percentile_view"))
      val ev = Tables.events(s, dir).select(col("event_id"), col("ts"),
        floor(col("value") * 100).cast("long").as("cents"))
      PercentileView.init(s, s"$r/percentile_view")
      PercentileView.append(ev.filter(col("event_id") % 2 === 0),
        "ts", "cents", s"$r/percentile_view", batchId = 0L)
      PercentileView.compact(s, s"$r/percentile_view")
      PercentileView.append(ev.filter(col("event_id") % 2 =!= 0),
        "ts", "cents", s"$r/percentile_view", batchId = 1L)
    }
    PercentileView.read(s, s"$root/percentile_view")
  }

  // ---------------------------------------------------------------- s20
  /** CONTINUOUS CLASSIFIER-QUALITY view
    * ([[graft.operators.ClassifierQualityView]]): t32's trained gate
    * evaluated as a live per-source dashboard — per-batch confusion
    * marginals land as AdditiveStats fragments (each held-out document in
    * exactly one batch, so summed fragments ARE the one-shot confusion
    * matrix), with a compaction fold mid-accumulation; the read side
    * reports per-source precision/recall/F1/accuracy, so a source whose
    * gate quality drifts is visible at ingest. Train on even doc_ids
    * (t32's stopword-median label), evaluate odd doc_ids in two batches.
    * Golden-gated (the trained weight vector has no SQL twin);
    * StreamingSpec differentials the foreachBatch twin
    * ([[graft.streaming.StreamOps.classifierQualityStream]]).
    */
  val s20_classifier_quality_mv = GraftQuery("s20_classifier_quality_mv",
    (s, dir) => {
      import graft.operators.{ClassifierQualityView, HashedLinearScorer}
      import graft.functions.TextFunctions
      val Den = 1000003L
      val root = DedupQueries.DedupStaging.ensure("s20", dir) { r =>
        // train + ingest are STAGING (memoized like the d11-d13 index
        // builds): the accumulated store is the queryable artifact
        val docs = Tables.documents(s, dir)
          .withColumn("__sw", TextFunctions.stopwordRatio(col("text")))
        val train = docs.filter(col("doc_id") % 2 === 0)
        val med = train.select(expr("percentile(__sw, 0.5)")).head.getDouble(0)
        val labeled = train.withColumn("__y",
          when(col("__sw") >= med, lit(1)).otherwise(lit(-1)))
        val weights = HashedLinearScorer.trainRidge(labeled, "doc_id",
          "text", "__y", buckets = 64, lambda = 0.1, den = Den)
        val heldOut = docs.filter(col("doc_id") % 2 =!= 0)
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"$r/quality_view"))
        ClassifierQualityView.init(s, s"$r/quality_view")
        def appendBatch(b: DataFrame, id: Long): Unit =
          ClassifierQualityView.append(b, "doc_id", "text", col("source"),
            col("__sw") >= med, buckets = 64,
            weightInt = HashedLinearScorer.literalWeightInt(weights),
            den = Den, dir = s"$r/quality_view", batchId = id)
        appendBatch(heldOut.filter(col("doc_id") % 4 === 1), 0L)
        ClassifierQualityView.compact(s, s"$r/quality_view")
        appendBatch(heldOut.filter(col("doc_id") % 4 === 3), 1L)
      }
      ClassifierQualityView.read(s, s"$root/quality_view")
    }, GoldenOracles.sqlFor("s20_classifier_quality_mv"))

  // ---------------------------------------------------------------- s21
  /** CONTINUOUS per-domain quota ([[graft.operators.QuotaView]]): the
    * streaming form of q70's web-curation cap — documents arrive in two
    * installments (even doc_ids, then odd; compaction fold mid-stream)
    * and each batch admits rows while its registered domain's
    * ACCUMULATED kept count stays ≤ 15. The greedy cross-batch admission
    * is EXACTLY one window over the concatenated (batch, md5-draw) order
    * (equivalence argument in the QuotaView scaladoc), which is what the
    * oracle replays over the one-shot input. Completes the continuous
    * curation front door: quality gate (s09), line stats (s10), domain
    * quota (s21). StreamingSpec differentials the foreachBatch twin
    * ([[graft.streaming.StreamOps.domainQuotaStream]]).
    */
  val s21_domain_quota_mv = q("s21_domain_quota_mv", Some(
    s"""WITH ${TextQueries.urlSqlCtes},
       |${TextQueries.domainSqlCtes},
       |r AS (SELECT doc_id, domain, row_number() OVER (
       |    PARTITION BY domain
       |    ORDER BY doc_id % 2, md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM dd)
       |SELECT doc_id, domain FROM r WHERE rn <= 15""".stripMargin)) { (s, dir) =>
    import graft.operators.QuotaView
    import graft.functions.UrlFunctions
    val root = DedupQueries.DedupStaging.ensure("s21", dir) { r =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$r/quota_view"))
      val withDom = Tables.documents(s, dir)
        .select(col("doc_id"),
          UrlFunctions.registeredDomain(
            UrlFunctions.hostOf(TextQueries.urlFixture),
            TextQueries.pslSubset).as("domain"))
      QuotaView.init(s, s"$r/quota_view")
      def appendBatch(b: DataFrame, id: Long): Unit = {
        QuotaView.append(b, "doc_id", "domain", s"$r/quota_view",
          batchId = id, cap = 15,
          hash = Some(md5(col("doc_id").cast("string").cast("binary"))))
        ()
      }
      appendBatch(withDom.filter(col("doc_id") % 2 === 0), 0L)
      QuotaView.compact(s, s"$r/quota_view")
      appendBatch(withDom.filter(col("doc_id") % 2 =!= 0), 1L)
    }
    QuotaView.read(s, s"$root/quota_view")
  }

  // ---------------------------------------------------------------- s22
  /** CONTINUOUS TOKEN-BUDGETED quota ([[graft.operators.QuotaView
    * .appendWeighted]]): t43's token budget as a live view — documents
    * arrive in two installments (even doc_ids then odd; compaction fold
    * mid-stream) and each batch admits rows while its registered
    * domain's accumulated SEEN token weight stays ≤ 1000. The greedy
    * cross-batch admission is EXACTLY one running-weight window over the
    * concatenated (batch, md5-draw) order — including the kept-vs-SEEN
    * accounting distinction the QuotaView scaladoc derives (rejected
    * weight rides sentinel rows so overshoot cannot re-open a stratum a
    * one-shot run would have closed) — which is what the oracle replays
    * over the one-shot input. StreamingSpec differentials the
    * foreachBatch twin ([[graft.streaming.StreamOps.tokenQuotaStream]]).
    */
  val s22_token_quota_mv = q("s22_token_quota_mv", Some(
    s"""WITH ${TextQueries.urlSqlCtes},
       |${TextQueries.domainSqlCtes},
       |tk AS (SELECT dd.doc_id, domain,
       |         CAST(len(regexp_extract_all(d.text, '${TextQueries.tokenPat}')) AS BIGINT) AS n_tok
       |       FROM dd JOIN documents d ON dd.doc_id = d.doc_id),
       |cum AS (SELECT doc_id, domain, n_tok, sum(n_tok) OVER (
       |    PARTITION BY domain
       |    ORDER BY doc_id % 2, md5(CAST(doc_id AS VARCHAR)), doc_id
       |    ROWS UNBOUNDED PRECEDING) AS c FROM tk)
       |SELECT doc_id, domain, n_tok FROM cum WHERE c <= 1000""".stripMargin)) { (s, dir) =>
    import graft.operators.QuotaView
    import graft.functions.{TextFunctions, UrlFunctions}
    val root = DedupQueries.DedupStaging.ensure("s22", dir) { r =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$r/quota_view"))
      val withDom = Tables.documents(s, dir)
        .select(col("doc_id"),
          UrlFunctions.registeredDomain(
            UrlFunctions.hostOf(TextQueries.urlFixture),
            TextQueries.pslSubset).as("domain"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
      QuotaView.init(s, s"$r/quota_view")
      def appendBatch(b: DataFrame, id: Long): Unit = {
        QuotaView.appendWeighted(b, "doc_id", "domain", "n_tok",
          s"$r/quota_view", batchId = id, budget = 1000L,
          hash = Some(md5(col("doc_id").cast("string").cast("binary"))))
        ()
      }
      appendBatch(withDom.filter(col("doc_id") % 2 === 0), 0L)
      QuotaView.compact(s, s"$r/quota_view")
      appendBatch(withDom.filter(col("doc_id") % 2 =!= 0), 1L)
    }
    QuotaView.readWeighted(s, s"$root/quota_view")
  }

  // ---------------------------------------------------------------- s23
  /** CONTINUOUS LANGUAGE-MIXTURE budgets ([[graft.operators.QuotaView
    * .appendWeightedBudgets]]): t44's per-stratum budget RELATION as a
    * live view — "at most 4000 tokens of English, 2000 of Chinese, 1500
    * each of German and French, Spanish unconstrained", maintained
    * across two installments (even doc_ids then odd; compaction fold
    * mid-stream). Budget-bound strata carry the s22 SEEN-weight
    * sentinel argument; absent strata are kept whole and never emit
    * sentinels. Oracle = ONE running-weight window over the
    * concatenated (batch, md5-draw) order + the budget join.
    * StreamingSpec differentials the foreachBatch twin
    * ([[graft.streaming.StreamOps.mixtureQuotaStream]]).
    */
  val s23_lang_budget_mv = q("s23_lang_budget_mv", Some(
    s"""WITH tk AS (SELECT doc_id, lang,
       |         CAST(len(regexp_extract_all(text, '${TextQueries.tokenPat}')) AS BIGINT) AS n_tok
       |       FROM documents),
       |b AS (SELECT * FROM (VALUES ('en', 4000), ('zh', 2000),
       |       ('de', 1500), ('fr', 1500)) v(lang, budget)),
       |cum AS (SELECT doc_id, lang, n_tok, sum(n_tok) OVER (
       |    PARTITION BY lang
       |    ORDER BY doc_id % 2, md5(CAST(doc_id AS VARCHAR)), doc_id
       |    ROWS UNBOUNDED PRECEDING) AS c FROM tk)
       |SELECT doc_id, lang, n_tok FROM cum LEFT JOIN b USING (lang)
       |WHERE budget IS NULL OR c <= budget""".stripMargin)) { (s, dir) =>
    import s.implicits._
    import graft.operators.QuotaView
    import graft.functions.TextFunctions
    val budgets = Seq(("en", 4000L), ("zh", 2000L), ("de", 1500L),
      ("fr", 1500L)).toDF("domain", "budget")
    val root = DedupQueries.DedupStaging.ensure("s23", dir) { r =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$r/quota_view"))
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
      QuotaView.init(s, s"$r/quota_view")
      def appendBatch(b: DataFrame, id: Long): Unit = {
        QuotaView.appendWeightedBudgets(b, "doc_id", "lang", "n_tok",
          s"$r/quota_view", batchId = id, budgets = budgets,
          hash = Some(md5(col("doc_id").cast("string").cast("binary"))))
        ()
      }
      appendBatch(docs.filter(col("doc_id") % 2 === 0), 0L)
      QuotaView.compact(s, s"$r/quota_view")
      appendBatch(docs.filter(col("doc_id") % 2 =!= 0), 1L)
    }
    QuotaView.readWeighted(s, s"$root/quota_view")
      .select(col("doc_id"), col("domain").as("lang"), col("n_tok"))
  }

  // ---------------------------------------------------------------- s24
  /** CONTINUOUS CORPUS DATACARD ([[graft.operators.Datacard]] /
    * [[graft.streaming.StreamOps.datacardStream]]): q73's per-language
    * release summary accumulated in two batch fragments with a
    * compaction fold between them — exactly the relation the
    * micro-batch stream maintains. The even/odd split deliberately
    * cuts exact-duplicate PAIRS across the fragments, so the card's
    * duplicate-exposure column is correct only if per-(language,
    * fingerprint) counts sum across batches; q73's oracle replays the
    * one-shot card over the full corpus, proving the fold arithmetic
    * end to end. The streaming twin is differential-tested in
    * StreamingSpec.
    */
  private def datacardStore(s: SparkSession, dir: String): String = {
    val root = DedupQueries.DedupStaging.ensure("s24", dir) { r =>
      import graft.operators.Datacard
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$r/card"))
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("lang"))
      Datacard.init(s, s"$r/card")
      Datacard.append(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", "lang", s"$r/card", batchId = 0L)
      Datacard.compact(s, s"$r/card")
      Datacard.append(docs.filter(col("doc_id") % 2 =!= 0),
        "doc_id", "text", "lang", s"$r/card", batchId = 1L)
    }
    s"$root/card"
  }

  val s24_datacard_mv = q("s24_datacard_mv",
    TextQueries.q73_corpus_datacard.oracle) { (s, dir) =>
    graft.operators.Datacard.card(s, datacardStore(s, dir))
  }

  // ---------------------------------------------------------------- s25
  /** CONTINUOUS DATACARD LENGTH PANEL ([[graft.operators.Datacard
    * .lengths]]): q75's per-language token-length percentiles read from
    * the SAME two-fragment-plus-fold store s24 accumulates — per-batch
    * QuantileSketch fragments merge binwise (exact, order-invariant), so
    * the accumulated panel answers as if one sketch had seen the whole
    * corpus, and q75's rank-exact oracle gates the result end to end.
    */
  val s25_datacard_lengths_mv = q("s25_datacard_lengths_mv",
    TextQueries.q75_datacard_lengths.oracle) { (s, dir) =>
    graft.operators.Datacard.lengths(s, datacardStore(s, dir))
  }

  // ---------------------------------------------------------------- s26
  /** CONTINUOUS CRAWL INGEST ([[graft.operators.CrawlIngest]] /
    * [[graft.streaming.StreamOps.crawlIngestStream]]) — the LAST
    * streaming twin: the complete q76 compliant chain with the crawl
    * arriving in two WARC installments (even doc_ids, then odd;
    * compaction fold between, so the read crosses a folded partition
    * and a live fragment). Per installment only the ROW-LOCAL gates run
    * (robots.txt → meta-robots → extraction → word gate — survivors
    * land as idempotent fragments); the corpus-level cut (canonical
    * dedup, blocklist, per-domain quota) applies at read time over the
    * ACCUMULATED relation, which is why stream ≡ one-shot holds exactly
    * and q76's oracle gates this query unchanged. The even/odd split
    * deliberately severs canonical-URL duplicate pairs and domain-quota
    * populations across the installments — the cut is correct only if
    * the accumulated relation is. The true foreachBatch stream
    * (binaryFile micro-batches, every sink, fresh-checkpoint refusal)
    * is differential-tested in StreamingSpec.
    */
  val s26_crawl_ingest = q("s26_crawl_ingest",
    TextQueries.q76_warc_robots_chain.oracle) { (s, dir) =>
    import s.implicits._
    import graft.operators.CrawlIngest
    import graft.functions.UrlFunctions
    import graft.sources.WarcSource
    val root = DedupQueries.DedupStaging.ensure("s26", dir) { r =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$r/crawl_store"))
      val pages = Tables.documents(s, dir).select(
        col("doc_id"), TextQueries.urlFixture.as("uri"),
        lit("2026-08-01T00:00:00Z").as("ts"),
        TextQueries.htmlFixtureWith(TextQueries.robotsMetaPiece).as("html"))
      WarcSource.writeWarc(pages.filter(col("doc_id") % 2 === 0)
        .repartition(4), "uri", "ts", "html", s"$r/crawl0")
      WarcSource.writeWarc(pages.filter(col("doc_id") % 2 =!= 0)
        .repartition(4), "uri", "ts", "html", s"$r/crawl1")
      CrawlIngest.init(s, s"$r/crawl_store")
      def ingest(path: String, batchId: Long): Unit = {
        // the SAME record/robots/curate helpers q76 runs one-shot
        val recs = TextQueries.crawlRecords(s, path)
        CrawlIngest.append(
          CrawlIngest.curateBatch(recs, TextQueries.crawlRobotsDf(recs),
            "graftbot", TextQueries.crawlIdOf, minWords = 20),
          s"$r/crawl_store", batchId)
      }
      ingest(s"$r/crawl0", 0L)
      CrawlIngest.compact(s, s"$r/crawl_store")
      ingest(s"$r/crawl1", 1L)
    }
    CrawlIngest.curated(CrawlIngest.read(s, s"$root/crawl_store"),
      Seq("example.co.uk").toDF("domain"), cap = 10)
  }

  val all: Seq[GraftQuery] = Seq(
    s26_crawl_ingest,
    s24_datacard_mv, s25_datacard_lengths_mv,
    s01_tumbling_agg, s02_sliding_agg, s03_session_windows,
    s04_dedup_first_event, s05_watermark_late, s06_asof_backward,
    s07_running_user_agg, s08_interval_join, s09_stream_curation,
    s10_line_stats_ingest, s11_stream_drift, s12_interval_left_join,
    s13_funnel_conversion, s14_span_stats_ingest, s15_posting_ingest,
    s16_windowed_mv, s17_join_view, s18_distinct_mv, s19_percentile_mv,
    s20_classifier_quality_mv, s21_domain_quota_mv, s22_token_quota_mv,
    s23_lang_budget_mv)
}
