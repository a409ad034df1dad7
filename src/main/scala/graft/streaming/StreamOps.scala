package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType, TimestampType}

/** Typed event row for the stateful APIs. */
final case class EventRow(ts: java.sql.Timestamp, user_id: Long,
                          event_type: String, value: Double)

/** Running per-user aggregate carried in the state store. */
final case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

/** Per-user funnel candidate state (epoch-millis timestamps): stage 1
  * needs only its min; stages 2/3 keep the PRUNED candidate lists the
  * exact out-of-order resolution requires (see
  * [[StreamOps.funnelStream]]'s domination argument).
  */
final case class FunnelCands(user_id: Long, s1Min: Long,
                             s2: Seq[Long], s3: Seq[Long])

/** A funnel resolution update emitted downstream — same shape as the
  * batch [[graft.operators.Funnel.resolve]] row.
  */
final case class FunnelUpdate(user_id: Long,
                              t_1: Option[java.sql.Timestamp],
                              t_2: Option[java.sql.Timestamp],
                              t_3: Option[java.sql.Timestamp],
                              reached: Int)

/** Structured Streaming surface over the `events` shape (extension per
  * SURVEY §2.9 — the reference is strictly batch, so these are engine
  * capabilities, not ports; semantics follow Spark's own streaming model and
  * are differentially tested against the batch equivalents in
  * graft.queries.StreamQueries, which run the SAME aggregation logic in batch
  * mode — `window`/`session_window` are mode-agnostic).
  *
  * Scale notes: every op below is keyed, so state is partitioned by the
  * grouping key across executors; watermarks bound state size (late rows are
  * dropped instead of accumulating); `dropDuplicatesWithinWatermark` keeps
  * only in-watermark keys in the state store.
  */
object StreamOps {

  /** File-based stream of event rows (parquet directory as an append-only
    * source; `maxFilesPerTrigger` bounds per-micro-batch input).
    */
  def readEventStream(spark: SparkSession, path: String, schema: StructType,
                      maxFilesPerTrigger: Int = 8): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** File-based stream of WHOLE FILES (the `binaryFile` source with its
    * fixed schema, which streaming requires spelled out) — crawl segment
    * directories feed [[crawlIngestStream]] through this:
    * (path, modificationTime, length, content). `maxFilesPerTrigger`
    * bounds a micro-batch to that many segment files.
    */
  def readFileStream(spark: SparkSession, path: String,
                     maxFilesPerTrigger: Int = 4): DataFrame =
    spark.readStream.format("binaryFile")
      .schema(StructType(Seq(
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType))))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(path)

  /** Tumbling-window counts+sums per event type with a watermark: state for
    * a window is dropped once the watermark passes its end.
    */
  def tumblingAgg(events: DataFrame, tsCol: String, windowLen: String,
                  watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding-window variant. */
  def slidingAgg(events: DataFrame, tsCol: String, windowLen: String,
                 slide: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Session windows per user: a session closes after `gap` of inactivity;
    * watermark bounds how long an open session is retained.
    */
  def sessionAgg(events: DataFrame, tsCol: String, gap: String,
                 watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n"))

  /** Stateful streaming dedup: first event per (user_id, event_type) wins;
    * state for a key is released once the watermark passes its event time.
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
                           watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Streaming CURATION: the quality-gate + language-gate + content-dedup
    * front of a training-data ingest, as a mode-agnostic transform — the
    * same plan curates a batch corpus or an unbounded document stream
    * (keyed dedup state per content fingerprint). Pure column expressions
    * before the dedup, so everything up to the stateful operator stays
    * map-side. For streams with an event-time column prefer
    * `withWatermark` + `dropDuplicatesWithinWatermark` (bounded state);
    * the documents table carries no event time, so this uses unbounded
    * `dropDuplicates` — the batch-parity form StreamingSpec checks
    * differentially.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             minQuality: Double = 0.5, lang: String = "en"): DataFrame = {
    import graft.functions.TextFunctions
    docs.select(col(idCol), col(textCol),
        TextFunctions.qualityScore(col(textCol)).as("quality"),
        TextFunctions.langId(col(textCol)).as("lang"),
        TextFunctions.fingerprint(col(textCol)).as("fp"))
      .filter(col("quality") >= minQuality && col("lang") === lang)
      .dropDuplicates("fp")
      .select(col(idCol), col("fp"), col("quality"))
  }

  /** Batch twin of [[curate]] with DETERMINISTIC dedup (smallest id per
    * fingerprint via keyed window — streaming `dropDuplicates` keeps the
    * first SEEN, which batch mode can't reproduce) — the oracle-checkable
    * form; s09 registers it.
    */
  def curateKeepFirst(docs: DataFrame, idCol: String, textCol: String,
                      minQuality: Double = 0.5, lang: String = "en"): DataFrame = {
    import graft.functions.TextFunctions
    val gated = docs.select(col(idCol), col(textCol),
        TextFunctions.qualityScore(col(textCol)).as("quality"),
        TextFunctions.langId(col(textCol)).as("lang"),
        TextFunctions.fingerprint(col(textCol)).as("fp"))
      .filter(col("quality") >= minQuality && col("lang") === lang)
    graft.operators.Dedup.keepFirst(gated, Seq("fp"), Seq(col(idCol)))
      .select(col(idCol), col("fp"), col("quality"))
  }

  /** Custom state machine via `flatMapGroupsWithState` (the escape hatch for
    * semantics windowed aggregates can't express): a running per-user
    * count/total that survives across micro-batches in the state store and
    * emits an updated row whenever the user appears in a batch.
    *
    * State is partitioned by key across executors and BOUNDED: a key idle for
    * `idleTimeoutMs` of event time past the watermark is evicted
    * (`EventTimeTimeout` + `setTimeoutTimestamp`), so the store holds only
    * recently-active users instead of every user ever seen — the difference
    * between O(active) and O(all-time) state at 100 TB of events. An evicted
    * user that reappears restarts from zero, the standard trade for bounded
    * state; widen `idleTimeoutMs` if business logic needs longer memory.
    */
  def runningUserAgg(events: Dataset[EventRow], watermark: String = "10 minutes",
                     idleTimeoutMs: Long = 6L * 3600 * 1000): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, rows: Iterator[EventRow], state: GroupState[UserAgg]) => {
          if (state.hasTimedOut) {
            state.remove() // idle key: evict, emit nothing
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0.0))
            var n = prev.n_events
            var total = prev.total_value
            var maxTs = Long.MinValue
            rows.foreach { r =>
              n += 1; total += r.value
              if (r.ts.getTime > maxTs) maxTs = r.ts.getTime
            }
            val next = UserAgg(uid, n, total)
            state.update(next)
            // keep the key alive for idleTimeoutMs past its newest event;
            // the timeout fires once the watermark passes this timestamp
            state.setTimeoutTimestamp(maxTs + idleTimeoutMs)
            Iterator.single(next)
          }
        })
  }

  /** STREAMING funnel resolution — the continuous form of
    * [[graft.operators.Funnel.resolve]] (3 stages), EXACT under
    * arbitrary event arrival order: the stream emits, per update, the
    * same earliest strictly-increasing chain the batch operator resolves
    * over the data seen so far, and once all data has arrived the final
    * update per user equals the batch row bit-for-bit (StreamingSpec
    * differential with adversarially shuffled arrival).
    *
    * Why candidate LISTS, and why they stay small: the resolved chain is
    * monotone — more data can only lower `t_1` (a plain min), a lower
    * `t_1` can only enlarge stage 2's candidate set `{click > t_1}` so
    * `t_2` only lowers, and inductively every `t_i` is non-increasing
    * over the stream's life. A stage-i candidate `e` is therefore
    * DOMINATED (safe to drop forever) when a smaller candidate `e'` < e
    * already clears the current threshold `t_{i-1}` — every future
    * threshold is ≤ the current one, so `e'` stays valid and always
    * beats `e`. The retained state per stage is exactly: all candidates
    * ≤ the current threshold (each could become the winner if the
    * threshold drops below it) plus ONE above it (the current winner) —
    * bounded by the stream's out-of-orderness, not its length. While a
    * user's chain is broken at stage i (no threshold yet), stage-i
    * candidates cannot be pruned (any future threshold may select any
    * of them) — bounded by that user's stage-i events, the honest
    * worst case for exact semantics.
    *
    * Updates are emitted only for users who have reached stage 1
    * (matching the batch contract) and only when the resolution
    * changed; by chain monotonicity each update dominates the previous
    * one (times ↓, reached ↑), so the final update IS the answer.
    */
  def funnelStream(events: Dataset[EventRow],
                   stages: (String, String, String)): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    val (st1, st2, st3) = stages

    def resolve(c: FunnelCands): FunnelUpdate = {
      val t1 = if (c.s1Min == Long.MaxValue) None else Some(c.s1Min)
      val t2 = t1.flatMap(t => c.s2.filter(_ > t).minOption)
      val t3 = t2.flatMap(t => c.s3.filter(_ > t).minOption)
      FunnelUpdate(c.user_id,
        t1.map(new java.sql.Timestamp(_)), t2.map(new java.sql.Timestamp(_)),
        t3.map(new java.sql.Timestamp(_)),
        Seq(t1, t2, t3).count(_.isDefined))
    }
    // keep: everything <= threshold, plus the single current winner
    def prune(cands: Seq[Long], threshold: Option[Long]): Seq[Long] =
      threshold match {
        case None => cands
        case Some(t) =>
          val (below, above) = cands.partition(_ <= t)
          below ++ above.minOption
      }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[EventRow], state: GroupState[FunnelCands]) => {
          val prev = state.getOption
            .getOrElse(FunnelCands(uid, Long.MaxValue, Nil, Nil))
          var s1 = prev.s1Min
          var s2 = prev.s2
          var s3 = prev.s3
          rows.foreach { r =>
            val t = r.ts.getTime
            r.event_type match {
              case `st1` => if (t < s1) s1 = t
              case `st2` => s2 = s2 :+ t
              case `st3` => s3 = s3 :+ t
              case _ => ()
            }
          }
          val before = resolve(prev)
          val afterRaw = FunnelCands(uid, s1, s2.distinct, s3.distinct)
          val after = resolve(afterRaw)
          // prune against the RESOLVED thresholds (exactness argument in
          // the scaladoc), then persist the compacted state
          val t1 = if (s1 == Long.MaxValue) None else Some(s1)
          state.update(FunnelCands(uid, s1,
            prune(afterRaw.s2, t1).sorted,
            prune(afterRaw.s3, after.t_2.map(_.getTime)).sorted))
          if (after.t_1.isDefined && after != before) Iterator.single(after)
          else Iterator.empty
        })
  }

  /** CONTINUOUS maintenance of the corpus-level LINE-frequency relation —
    * the streaming half of the C4-style boilerplate cut
    * ([[graft.operators.LineDedup]]): each micro-batch's per-line
    * distinct-document counts land as an idempotent `batch_id` fragment
    * under `statsDir` (dynamic-partition overwrite — an at-least-once
    * replay rewrites its own fragment instead of double-counting), and
    * because every document lives in exactly one batch the fragments SUM
    * to the one-shot corpus statistics.
    * [[graft.operators.LineDedup.dedupLinesWithStats]] is the read side:
    * cutting a corpus against its accumulated relation is bit-identical
    * to the one-shot batch cut (StreamingSpec differential; s10 oracle).
    *
    * Line dedup is inherently TWO-PASS (a line only becomes boilerplate
    * once enough documents carry it), so the streaming form maintains
    * the statistics continuously and leaves WHEN to apply the cut to the
    * caller — at read time, or as a periodic finalize over the
    * accumulated corpus — rather than pretending a per-batch cut with
    * partial counts equals the corpus semantics.
    *
    * The store rides the shared [[graft.sources.StoredIndex]] protocol
    * (initialized on the first trigger): once the live epoch accumulates
    * more than `compactEvery` fragments, [[graft.operators.LineDedup
    * .compactStats]] folds them into ONE summed partition in a fresh
    * epoch — a crash-safe CAS swap with grace-period readers, advancing
    * the `compacted_through` watermark so a replay of an already-folded
    * batch is a no-op instead of a double count. The checkpoint identity
    * is pinned into the meta at first append, exactly like
    * [[incrementalDedupStream]]: batch ids are only meaningful relative
    * to one checkpoint lineage, and a fresh checkpoint would recycle ids
    * below the watermark and silently DROP their new data — fail fast
    * instead (re-ingest from scratch = new stats dir).
    */
  def lineStatsStream(newDocs: DataFrame, idCol: String, textCol: String,
                      statsDir: String, checkpointDir: String,
                      compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import graft.operators.LineDedup
        import graft.sources.StoredIndex
        val spark = batch.sparkSession
        if (StoredIndex.metaGeneration(spark, statsDir) < 0)
          LineDedup.initStats(spark, statsDir)
        StoredIndex.pinStreamIdentity(spark, statsDir, checkpointDir)
        if (!batch.isEmpty)
          LineDedup.appendLineStats(
            batch.toDF(), idCol, textCol, statsDir, batchId)
        if (compactEvery > 0 &&
            LineDedup.statsFragmentCount(spark, statsDir) > compactEvery)
          LineDedup.compactStats(spark, statsDir)
      }
      .start()

  /** CONTINUOUS maintenance of the duplicated-SPAN window-frequency
    * relation — the span-family twin of [[lineStatsStream]], on the SAME
    * [[graft.sources.AdditiveStats]] store (idempotent batch fragments,
    * CAS publishes, crash-safe compaction folds, checkpoint identity
    * pin). Span dedup is inherently two-pass (a window only becomes a
    * duplicated span once enough documents carry it), so the stream
    * maintains statistics continuously and the cut applies at read time
    * via [[graft.operators.SpanDedup.removeSpansWithStats]] /
    * `coverage` — bit-identical to the one-shot batch cut over the same
    * corpus (StreamingSpec differential; s14 under the oracle gate).
    */
  def spanStatsStream(newDocs: DataFrame, idCol: String, textCol: String,
                      statsDir: String, checkpointDir: String,
                      n: Int, compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import graft.operators.SpanDedup
        import graft.sources.StoredIndex
        val spark = batch.sparkSession
        if (StoredIndex.metaGeneration(spark, statsDir) < 0)
          SpanDedup.initSpanStats(spark, statsDir)
        StoredIndex.pinStreamIdentity(spark, statsDir, checkpointDir)
        if (!batch.isEmpty)
          SpanDedup.appendSpanStats(
            batch.toDF(), idCol, textCol, statsDir, n, batchId)
        if (compactEvery > 0 &&
            SpanDedup.spanStatsFragmentCount(spark, statsDir) > compactEvery)
          SpanDedup.compactSpanStats(spark, statsDir)
      }
      .start()

  /** CONTINUOUS corpus-datacard maintenance — q73's per-language release
    * summary (docs, tokens, mean quality, exact-duplicate exposure) kept
    * current as documents stream in, on the same
    * [[graft.sources.AdditiveStats]] discipline as the line/span/posting
    * ingests. Every card statistic is additive over disjoint batches —
    * including duplicate exposure, because per-(language, fingerprint)
    * doc counts sum across fragments and the >1 test applies at READ
    * time, so a duplicate pair split across two micro-batches is counted
    * (StreamingSpec differential; s24 under the oracle gate).
    */
  def datacardStream(newDocs: DataFrame, idCol: String, textCol: String,
                     langCol: String, statsDir: String, checkpointDir: String,
                     compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import graft.operators.Datacard
        import graft.sources.StoredIndex
        val spark = batch.sparkSession
        if (StoredIndex.metaGeneration(spark, statsDir) < 0)
          Datacard.init(spark, statsDir)
        StoredIndex.pinStreamIdentity(spark, statsDir, checkpointDir)
        if (!batch.isEmpty)
          Datacard.append(batch.toDF(), idCol, textCol, langCol,
            statsDir, batchId)
        if (compactEvery > 0 &&
            Datacard.fragmentCount(spark, statsDir) > compactEvery)
          Datacard.compact(spark, statsDir)
      }
      .start()

  /** CONTINUOUS inverted-index maintenance — the retrieval-family member
    * of the [[graft.sources.AdditiveStats]] ingest trio (line stats, span
    * stats, postings): each micro-batch's posting lists land as an
    * idempotent `batch_id` fragment, per-(term, doc) term frequencies sum
    * across fragments because every document lives in exactly one batch,
    * and searches over [[graft.operators.Retrieval.readPostings]] equal
    * searches over a one-shot index build of the full corpus
    * (StreamingSpec differential; s15 under the oracle gate). Same
    * crash/replay story by inheritance: CAS-published compaction folds,
    * `compacted_through` watermark, fresh-checkpoint refusal via the
    * pinned stream identity.
    */
  def postingsStream(newDocs: DataFrame, idCol: String, textCol: String,
                     statsDir: String, checkpointDir: String,
                     compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import graft.operators.Retrieval
        import graft.sources.StoredIndex
        val spark = batch.sparkSession
        if (StoredIndex.metaGeneration(spark, statsDir) < 0)
          Retrieval.initPostings(spark, statsDir, idCol)
        StoredIndex.pinStreamIdentity(spark, statsDir, checkpointDir)
        if (!batch.isEmpty)
          Retrieval.appendPostings(batch.toDF(), idCol, textCol, statsDir, batchId)
        if (compactEvery > 0 &&
            Retrieval.postingFragmentCount(spark, statsDir, idCol) > compactEvery)
          Retrieval.compactPostings(spark, statsDir, idCol)
      }
      .start()

  /** CONTINUOUS windowed-count materialized view
    * ([[graft.operators.MetricView]]): per-batch (day, dimension) counts
    * land as idempotent AdditiveStats fragments — the exact-consistency
    * dashboard view maintained at ingest time instead of recomputed from
    * the fact table, with the protocol's replay/crash story by
    * inheritance (s16 under the oracle gate; StreamingSpec
    * differential).
    */
  def metricViewStream(events: DataFrame, tsCol: String, dimCol: String,
                       statsDir: String, checkpointDir: String,
                       compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import graft.operators.MetricView
        import graft.sources.StoredIndex
        val spark = batch.sparkSession
        if (StoredIndex.metaGeneration(spark, statsDir) < 0)
          MetricView.init(spark, statsDir, dimCol)
        StoredIndex.pinStreamIdentity(spark, statsDir, checkpointDir)
        if (!batch.isEmpty)
          MetricView.append(batch.toDF(), tsCol, dimCol, statsDir, batchId)
        if (compactEvery > 0 &&
            MetricView.fragmentCount(spark, statsDir, dimCol) > compactEvery)
          MetricView.compact(spark, statsDir, dimCol)
      }
      .start()

  /** CONTINUOUS distinct-count view ([[graft.operators.DistinctView]]):
    * per-batch per-day KMV sketches land as idempotent fragments whose
    * union is EXACT (merge-of-sketches ≡ sketch-of-union), so the view
    * answers "distinct keys that day" as if one sketch had seen every
    * event — the cross-batch dedup no additive counter gives a stream.
    * Protocol replay/crash story by inheritance (s18 under the oracle
    * gate; StreamingSpec differential).
    */
  def distinctViewStream(events: DataFrame, tsCol: String, keyCol: String,
                         statsDir: String, checkpointDir: String,
                         k: Int = 256, compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import graft.operators.DistinctView
        import graft.sources.StoredIndex
        val spark = batch.sparkSession
        if (StoredIndex.metaGeneration(spark, statsDir) < 0)
          DistinctView.init(spark, statsDir)
        StoredIndex.pinStreamIdentity(spark, statsDir, checkpointDir)
        if (!batch.isEmpty)
          DistinctView.append(batch.toDF(), tsCol, keyCol, statsDir, batchId, k)
        if (compactEvery > 0 &&
            DistinctView.fragmentCount(spark, statsDir) > compactEvery)
          DistinctView.compact(spark, statsDir)
      }
      .start()

  /** CONTINUOUS per-stratum quota ([[graft.operators.QuotaView]]): each
    * micro-batch admits documents while its domain's ACCUMULATED kept
    * count stays ≤ `cap` — the streaming form of the q70 web-curation
    * quota, exactly replayable as one window over the concatenated
    * (batch, draw) order (QuotaView scaladoc carries the equivalence
    * argument). Admitted rows land as idempotent AdditiveStats
    * fragments; protocol replay/crash story by inheritance (s21 under
    * the oracle gate; StreamingSpec differential). Compaction runs
    * inside foreachBatch and may fold a batch BEFORE its checkpoint
    * commits; QuotaView.append short-circuits a replay at or below
    * `compacted_through` to the stored admitted set, closing that crash
    * window (round-15 ADVICE fix).
    */
  def domainQuotaStream(docs: DataFrame, idCol: String, domainCol: String,
                        statsDir: String, checkpointDir: String, cap: Int,
                        hash: Option[org.apache.spark.sql.Column] = None,
                        compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import graft.operators.QuotaView
        import graft.sources.StoredIndex
        val spark = batch.sparkSession
        if (StoredIndex.metaGeneration(spark, statsDir) < 0)
          QuotaView.init(spark, statsDir)
        StoredIndex.pinStreamIdentity(spark, statsDir, checkpointDir)
        if (!batch.isEmpty) {
          QuotaView.append(batch.toDF(), idCol, domainCol, statsDir,
            batchId, cap, hash)
          ()
        }
        if (compactEvery > 0 &&
            QuotaView.fragmentCount(spark, statsDir) > compactEvery)
          QuotaView.compact(spark, statsDir)
      }
      .start()

  /** CONTINUOUS per-stratum TOKEN budget ([[graft.operators.QuotaView
    * .appendWeighted]]): the weight form of [[domainQuotaStream]] — each
    * micro-batch admits documents while its domain's accumulated SEEN
    * token weight stays ≤ `budget` (the FineWeb-style unit the trainer
    * consumes), exactly replayable as one running-weight window over the
    * concatenated (batch, draw) order (the QuotaView scaladoc carries
    * the equivalence argument, including why KEPT-only accounting would
    * break it — rejected-weight sentinels ride the same fragments).
    * Compaction may fold a batch before its checkpoint commits; the
    * append short-circuits on replay (compacted_through watermark), so
    * the crash window between compact and commit is closed.
    */
  def tokenQuotaStream(docs: DataFrame, idCol: String, domainCol: String,
                       weightCol: String, statsDir: String,
                       checkpointDir: String, budget: Long,
                       hash: Option[org.apache.spark.sql.Column] = None,
                       compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import graft.operators.QuotaView
        import graft.sources.StoredIndex
        val spark = batch.sparkSession
        if (StoredIndex.metaGeneration(spark, statsDir) < 0)
          QuotaView.init(spark, statsDir)
        StoredIndex.pinStreamIdentity(spark, statsDir, checkpointDir)
        if (!batch.isEmpty) {
          QuotaView.appendWeighted(batch.toDF(), idCol, domainCol, weightCol,
            statsDir, batchId, budget, hash)
          ()
        }
        if (compactEvery > 0 &&
            QuotaView.fragmentCount(spark, statsDir) > compactEvery)
          QuotaView.compact(spark, statsDir)
      }
      .start()

  /** CONTINUOUS per-stratum budget-RELATION quota
    * ([[graft.operators.QuotaView.appendWeightedBudgets]]): the mixture
    * spec as a live view — "at most B_en tokens of English, B_zh of
    * Chinese, … continuously", strata absent from the (driver-small)
    * `budgets` relation kept whole. Same SEEN-weight sentinel
    * accounting, one-window replay equivalence, and folded-replay
    * short-circuit as [[tokenQuotaStream]].
    */
  def mixtureQuotaStream(docs: DataFrame, idCol: String, domainCol: String,
                         weightCol: String, budgets: DataFrame,
                         statsDir: String, checkpointDir: String,
                         hash: Option[org.apache.spark.sql.Column] = None,
                         compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import graft.operators.QuotaView
        import graft.sources.StoredIndex
        val spark = batch.sparkSession
        if (StoredIndex.metaGeneration(spark, statsDir) < 0)
          QuotaView.init(spark, statsDir)
        StoredIndex.pinStreamIdentity(spark, statsDir, checkpointDir)
        if (!batch.isEmpty) {
          QuotaView.appendWeightedBudgets(batch.toDF(), idCol, domainCol,
            weightCol, statsDir, batchId, budgets, hash)
          ()
        }
        if (compactEvery > 0 &&
            QuotaView.fragmentCount(spark, statsDir) > compactEvery)
          QuotaView.compact(spark, statsDir)
      }
      .start()

  /** CONTINUOUS percentile view ([[graft.operators.PercentileView]]):
    * per-batch per-day quantile-sketch fragments land idempotently; the
    * sketch's binwise-additive merge makes fold order irrelevant
    * (merge-of-sketches ≡ sketch-of-union), so the view answers
    * p50/p95/p99 as if one sketch had seen every event — the latency
    * dashboard no counter or distinct union gives a stream. Protocol
    * replay/crash story by inheritance (s19 under the oracle gate;
    * StreamingSpec differential).
    */
  def percentileViewStream(events: DataFrame, tsCol: String, valueCol: String,
                           statsDir: String, checkpointDir: String,
                           s: Int = 15, compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import graft.operators.PercentileView
        import graft.sources.StoredIndex
        val spark = batch.sparkSession
        if (StoredIndex.metaGeneration(spark, statsDir) < 0)
          PercentileView.init(spark, statsDir)
        StoredIndex.pinStreamIdentity(spark, statsDir, checkpointDir)
        if (!batch.isEmpty)
          PercentileView.append(batch.toDF(), tsCol, valueCol, statsDir,
            batchId, s)
        if (compactEvery > 0 &&
            PercentileView.fragmentCount(spark, statsDir) > compactEvery)
          PercentileView.compact(spark, statsDir)
      }
      .start()

  /** CONTINUOUS classifier-quality view
    * ([[graft.operators.ClassifierQualityView]]): per-micro-batch
    * confusion-marginal fragments from a FIXED trained gate vs an
    * in-warehouse gold rule — drift in the gate's precision/recall shows
    * at ingest. The weight vector is part of the store's identity
    * (retrain ⇒ new store); same protocol guarantees as the other view
    * twins (idempotent `batch_id` replay, identity pin, CAS folds).
    */
  def classifierQualityStream(newDocs: DataFrame, idCol: String,
                              textCol: String, sliceCol: Column,
                              goldKeep: Column, buckets: Int,
                              weightInt: Column => Column, den: Long,
                              statsDir: String, checkpointDir: String,
                              compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import graft.operators.ClassifierQualityView
        import graft.sources.StoredIndex
        val spark = batch.sparkSession
        if (StoredIndex.metaGeneration(spark, statsDir) < 0)
          ClassifierQualityView.init(spark, statsDir)
        StoredIndex.pinStreamIdentity(spark, statsDir, checkpointDir)
        if (!batch.isEmpty)
          ClassifierQualityView.append(batch.toDF(), idCol, textCol,
            sliceCol, goldKeep, buckets, weightInt, den, statsDir, batchId)
        if (compactEvery > 0 &&
            ClassifierQualityView.fragmentCount(spark, statsDir) > compactEvery)
          ClassifierQualityView.compact(spark, statsDir)
      }
      .start()

  /** CONTINUOUS equi-join view maintenance ([[graft.sources.JoinView]]):
    * a multiplexed changelog (rows tagged `side` = "left"/"right" over a
    * nullable superset schema — the standard single-topic CDC shape)
    * splits per micro-batch and delta-joins against the persisted
    * counterpart histories, so the JOIN of two unbounded streams lives as
    * a parquet relation any batch reader can query mid-stream — no
    * executor-memory join state, crash/replay story from the protocol
    * (committed-through gate + idempotent fragments + identity pin).
    */
  def joinViewStream(tagged: DataFrame, sideCol: String,
                     leftCols: Seq[String], rightCols: Seq[String],
                     view: graft.sources.JoinView.View, checkpointDir: String,
                     compactEvery: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    tagged.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import graft.sources.{JoinView, StoredIndex}
        val spark = batch.sparkSession
        if (StoredIndex.metaGeneration(spark, view.dir) < 0)
          JoinView.init(spark, view)
        StoredIndex.pinStreamIdentity(spark, view.dir, checkpointDir)
        val df = batch.toDF()
        JoinView.appendBatch(
          df.filter(col(sideCol) === "left").select(leftCols.map(col): _*),
          df.filter(col(sideCol) === "right").select(rightCols.map(col): _*),
          view, batchId)
        if (compactEvery > 0 &&
            JoinView.fragmentCount(spark, view) > compactEvery)
          JoinView.compact(spark, view)
      }
      .start()

  /** CONTINUOUS dimension maintenance: each micro-batch of key snapshots
    * SCD2-merges into the dimension at `path`
    * ([[graft.sources.Scd2.merge]]) — the streaming form of the
    * versioned dimension load. The dimension's batch clock is
    * `clockBase + batchId`, so replays are safe end to end: an
    * at-least-once redelivery re-merges value-identical rows (opens
    * nothing, by SCD2 idempotence), and a crash mid-merge is repaired by
    * the staged-overwrite recovery on the next batch. A FRESH checkpoint
    * against an already-maintained dimension recycles batch ids below
    * versions already open, which Scd2's monotonic-clock guard refuses —
    * the same fail-fast contract as its sibling ingest streams, enforced
    * by the clock itself rather than a pinned stream id. Batches must
    * carry one row per key (pre-collapse updates upstream, e.g.
    * keep-latest per key within the trigger).
    */
  def scd2Stream(updates: DataFrame, path: String, keys: Seq[String],
                 trackCols: Seq[String], checkpointDir: String,
                 clockBase: Long = 1L, buckets: Int = 32)
      : org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty)
          graft.sources.Scd2.merge(batch.toDF(), path, keys, trackCols,
            clockBase + batchId, buckets)
      }
      .start()

  /** CONTINUOUS embedding ingest into a persisted ANN index
    * ([[graft.ext.AnnIndex]]) — the similarity-search twin of
    * [[incrementalDedupStream]]: each micro-batch of new vectors is
    * encoded with the STORED codebooks (O(batch), no retraining) and
    * appended as the `frag = batchId` fragment of the live epoch's codes
    * relation under the generation-CAS protocol. Probes running against
    * the index see each batch as soon as its meta bump publishes.
    *
    * REPLAY SAFETY is inherited from [[graft.ext.AnnIndex.append]]: the
    * fragment write is a batch-id-keyed dynamic-partition overwrite (an
    * at-least-once replay rewrites its own partitions) and the publish
    * is a CAS meta bump, so a maintenance rebuild that swaps the epoch
    * mid-append makes the batch FAIL and replay instead of landing rows
    * in a superseded epoch. Codebook drift: appended vectors are
    * quantized by codebooks that never saw them — recall decays
    * gracefully, never correctness (the exact re-rank stands); see the
    * measured decay table in [[graft.ext.AnnIndex]]'s scaladoc.
    *
    * MAINTENANCE mirrors its two sibling streams' self-compaction: pass
    * `rebuildEvery` > 0 and a `corpusForRebuild` thunk (the index stores
    * codes, not vectors, so only the caller can supply the full vector
    * table — typically the warehouse relation the stream also appends to)
    * and every time the live epoch accumulates that many fragments the
    * cycle retrains via [[graft.ext.AnnIndex.build]]: a crash-safe epoch
    * swap that folds all fragments, refreshes the codebooks against the
    * grown corpus (resetting quantization drift), and preserves the
    * checkpoint-identity pin. The rebuild runs INSIDE the trigger, so it
    * never races a concurrent append from this stream; a crash mid-rebuild
    * leaves the old epoch live and the replay retries.
    *
    * CONTRACT: the thunk must return exactly the vectors INGESTED SO FAR
    * (base corpus + committed batches — the warehouse relation a
    * same-pipeline sink maintains satisfies this by construction). A
    * corpus that already contains a not-yet-appended batch would enter the
    * rebuilt epoch at `frag = -1` and then enter AGAIN when its batch
    * appends — duplicate ids in the codes relation.
    *
    * The footgun-free form: pass `vectorsDir` instead and the stream
    * maintains the vector relation ITSELF — each batch lands as an
    * idempotent `batch_id` partition (replay overwrites its own) before
    * its codes append, so the relation satisfies the ingested-so-far
    * contract by construction and rebuilds default to reading it.
    * Seed it with the bulk build's training vectors (any `batch_id` < 0)
    * so rebuilds retrain over the full corpus, and point probes'
    * exact-rerank at the same relation.
    *
    * CHECKPOINT IDENTITY is pinned at first append exactly like the
    * sibling streams ([[StoredIndex.pinStreamIdentity]]): a restart
    * against a fresh checkpoint would recycle batch ids from 0 and
    * dynamic-overwrite earlier batches' `frag=` partitions with different
    * data — silent index corruption — so it fails fast instead.
    */
  def annIngestStream(newEmb: DataFrame, indexDir: String, vecCol: String,
                      checkpointDir: String,
                      rebuildEvery: Int = 0,
                      corpusForRebuild: Option[() => DataFrame] = None,
                      vectorsDir: Option[String] = None,
                      onBatchDone: Long => Unit = _ => ())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(rebuildEvery <= 0 || corpusForRebuild.isDefined || vectorsDir.isDefined,
      "rebuildEvery needs corpusForRebuild or vectorsDir: the index stores " +
      "codes, not vectors — the rebuild must get the vector table to retrain on")
    newEmb.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import graft.ext.AnnIndex
        import graft.sources.StoredIndex
        val spark = batch.sparkSession
        StoredIndex.pinStreamIdentity(spark, indexDir, checkpointDir)
        if (!batch.isEmpty) {
          // vectors land before codes: a crash between the two replays the
          // batch, which rewrites both partitions idempotently — so the
          // vector relation is always a superset of committed codes and
          // exactly ingested-so-far at rebuild time (rebuilds run after
          // this batch's append in the same trigger)
          vectorsDir.foreach { vd =>
            graft.sources.ParquetWarehouse.overwritePartitions(
              batch.toDF().withColumn("batch_id", lit(batchId)),
              vd, Seq("batch_id"))
          }
          AnnIndex.append(batch.toDF(), indexDir, vecCol, batchId)
        }
        if (rebuildEvery > 0 &&
            AnnIndex.fragmentCount(spark, indexDir) >= rebuildEvery) {
          // retrain over the caller's corpus with the STORED parameters —
          // the stream never guesses dims/codebook sizes, the index pins them
          val (kv, _) = StoredIndex.readKvWithGen(spark, indexDir)
          val corpus = corpusForRebuild
            .map(_.apply())
            .getOrElse(spark.read.parquet(vectorsDir.get).drop("batch_id"))
          AnnIndex.build(corpus, kv("id_col"), vecCol,
            indexDir, kv("dim").toInt, kv("m").toInt, kv("pq_k").toInt,
            kv("ivf_k").toInt)
        }
        onBatchDone(batchId)
      }
      .start()
  }

  /** CONTINUOUS ingest dedup against a persisted near-dup index — the
    * streaming form of the daily cycle ([[graft.ext.NearDup.NearDupIndex]]):
    * each micro-batch of new documents is probed against the stored index
    * with the O(batch) path (corpus relations partition-pruned and
    * semi-joined, never shuffled), batch-internal near-dups are resolved,
    * survivors are written to `outDir` AND folded into the index relations,
    * so the NEXT micro-batch dedups against them too.
    *
    * `foreachBatch` is the deliberate mechanism, not a fallback: per
    * trigger the micro-batch is a plain DataFrame, so the exact
    * oracle-gated batch operators (d10/d11's plans, cap semantics, exact
    * verification) run unchanged — no state-store reimplementation of LSH
    * to drift from the batch semantics.
    *
    * REPLAY SAFETY (at-least-once `foreachBatch` made effectively-once):
    * all three sinks are keyed by the `batch_id` Spark hands this callback
    * and written with dynamic-partition-overwrite, so a replayed batch
    * overwrites exactly its own partitions instead of appending duplicates;
    * and the probe filters `batch_id = <current>` OUT of the loaded index,
    * so rows a failed prior attempt half-appended can neither match the
    * batch against itself nor make the recomputation nondeterministic.
    * Crash matrix: die anywhere before the checkpoint commit → the replay
    * recomputes the identical survivor set (the visible index state is
    * exactly "all committed batches < this one") and rewrites the same
    * partitions. The one non-filterable rewrite is compaction, which is
    * why it epoch-swaps and records `compactedThrough` (below).
    *
    * Keep policy: a batch doc is dropped iff it has ANY near-dup already in
    * the stored corpus (corpus membership — i.e. arrival order — decides,
    * not id order: the corpus doc was kept when IT arrived), or a
    * SMALLER-id near-dup within its own batch (greedy min-id inside the
    * tie — same policy family as d07's cluster-representative keep,
    * differing only on non-transitive pair graphs where greedy keeps every
    * locally-minimal doc).
    *
    * MAINTENANCE: every appended batch adds one `batch_id` partition
    * (fragment) to each index relation; once the live epoch carries more
    * than `compactEvery` fragments the cycle folds them with
    * [[graft.ext.NearDup.NearDupIndex.compactStored]] — an O(corpus)
    * amortized vacuum that writes a FRESH epoch and swaps the meta pointer,
    * so a crash mid-compaction never corrupts the live index, and a replay
    * of a batch the compaction already folded in is skipped via the
    * recorded `compactedThrough` watermark (its own output partition was
    * written before the compaction ran, so skipping loses nothing).
    *
    * State is all ON DISK in the index relations — executors hold nothing
    * between triggers, so executor loss costs one micro-batch replay, and
    * the stored index is exactly what the batch jobs (d11-d13) read:
    * streaming and batch ingest can interleave against the same index.
    * The probe's caches are unpersisted INDIVIDUALLY after each trigger
    * (never `clearCache()` — interleaved jobs keep their cached frames).
    *
    * `onBatchDone(batchId)` fires after a batch's writes complete (and
    * after a skip) — an ops hook for metrics/alerting; tests use it to
    * inject crashes between the sink writes and the checkpoint commit.
    */
  def incrementalDedupStream(newDocs: DataFrame, idCol: String, textCol: String,
                             indexDir: String, outDir: String,
                             checkpointDir: String, threshold: Double,
                             maxBucketSize: Int = 1000,
                             compactEvery: Int = 16,
                             onBatchDone: Long => Unit = _ => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        dedupIngestBatch(batch.toDF(), batchId, idCol, textCol, indexDir,
          outDir, checkpointDir, threshold, maxBucketSize, compactEvery)
        onBatchDone(batchId)
      }
      .start()

  /** ONE trigger of the incremental-dedup cycle — the foreachBatch body
    * of [[incrementalDedupStream]], factored so composed ingests (the
    * crawl chain's [[crawlIngestStream]]) run the identical probe/
    * append/compact logic on their own batches. Contract and crash
    * matrix are the stream's scaladoc above, verbatim.
    */
  def dedupIngestBatch(batchDf: DataFrame, batchId: Long,
                       idCol: String, textCol: String,
                       indexDir: String, outDir: String,
                       checkpointDir: String, threshold: Double,
                       maxBucketSize: Int = 1000,
                       compactEvery: Int = 16): Unit = {
    import graft.ext.NearDup
    import graft.ext.NearDup.NearDupIndex
    val batch = batchDf
    val spark = batch.sparkSession
    val (meta0, gen0) = NearDupIndex.readMetaWithGen(spark, indexDir)
        // checkpoint-identity guard: batch ids are only meaningful relative
        // to ONE checkpoint lineage. The first append pins this stream's
        // checkpoint in the meta; a restart against a FRESH checkpoint
        // would recycle ids from 0 (silently skipped below compactedThrough,
        // dynamic-overwriting earlier batches' partitions) — fail fast
        // instead. Re-ingesting an index from scratch = new index dir.
        // Paths compare in filesystem-QUALIFIED form ('/a/ckpt',
        // 'file:///a/ckpt' and '/a/ckpt/' are the same lineage — a
        // legitimate respelling on restart must not brick the stream).
        def qualified(p: String): String =
          graft.sources.StoredIndex.qualifiedPath(spark, p)
        val ckpt = qualified(checkpointDir)
        val meta =
          if (meta0.streamId.isEmpty) {
            val pinned = meta0.copy(streamId = ckpt)
            NearDupIndex.writeMetaCas(spark, indexDir, pinned, gen0)
            pinned
          } else if (qualified(meta0.streamId) != ckpt) {
            throw new IllegalStateException(
              s"index at $indexDir was ingested from checkpoint " +
              s"'${meta0.streamId}' but this query runs from " +
              s"'$checkpointDir' — a fresh checkpoint recycles batch ids " +
              "and would silently corrupt the replay guards; use the " +
              "original checkpoint or a fresh index dir")
          } else meta0
        if (meta.compactedThrough >= batchId) {
          // replayed batch already folded into the live epoch by a
          // committed compaction — fully durable, nothing to redo
        } else if (!batch.isEmpty) {
          val raw = NearDupIndex.load(spark, indexDir)
          // replay guard: hide this batch's own half-appended rows (if any)
          val index = raw.copy(
            shingles = raw.shingles.filter(col("batch_id") =!= batchId),
            buckets = raw.buckets.filter(col("batch_id") =!= batchId))
          // vs the standing corpus: O(batch) probe against the stored index
          val (corpusPairs, probeCaches) = NearDup.incrementalIndexProbe(
            batch.toDF(), index, idCol, textCol, threshold, maxBucketSize)
          val corpusDrops = corpusPairs.select(col("id_new").as(idCol)).distinct()
          // within the batch: drop any doc with a smaller near-dup sibling
          // (pairs come oriented id_a < id_b); reuses the probe's cached
          // per-doc shingle arrays — the batch is shingled ONCE per trigger
          val innerDrops = NearDup.nearDuplicatePairsFromDocArrays(
              probeCaches.head, threshold,
              index.numHashes, index.bands, maxBucketSize)
            .select(col("id_b").as(idCol)).distinct()
          // materialize survivors BEFORE touching the index dir: their plan
          // reads the same parquet relations the appends below write
          val survivors = batch.toDF()
            .join(corpusDrops.unionByName(innerDrops).distinct(),
              Seq(idCol), "left_anti")
            .localCheckpoint()
          // output first, index second: compaction (which folds the index
          // appends into a non-replayable epoch) can then never run before
          // this batch's output partition is durable
          graft.sources.ParquetWarehouse.overwritePartitions(
            survivors.withColumn("batch_id", lit(batchId)),
            outDir, Seq("batch_id"))
          val ext = NearDup.buildIndex(survivors, idCol, textCol,
            index.numHashes, index.bands, index.shingleSize)
          NearDupIndex.appendBatch(indexDir, meta, ext, batchId)
          // release exactly what this probe pinned; interleaved jobs'
          // caches survive the trigger
          probeCaches.foreach(_.unpersist(blocking = false))
          if (compactEvery > 0 &&
              NearDupIndex.fragmentCount(spark, indexDir) > compactEvery)
            NearDupIndex.compactStored(spark, indexDir, batchId)
        }
  }

  /** CONTINUOUS CRAWL INGEST — the complete q76 compliant chain as a
    * foreachBatch stream ([[graft.operators.CrawlIngest]] carries the
    * two-pass design argument): WARC segment FILES arrive as
    * micro-batches (a `binaryFile` file stream over the crawl
    * directory — Common Crawl's ~1 GB segments are the natural batch
    * unit), each trigger splits its members with the codegen WARC
    * parser, runs the ROW-LOCAL gates (robots.txt for `agent` against
    * the `robotsDf` cache relation → meta-robots → extraction → word
    * gate), and lands the survivors as the batch's idempotent fragment
    * in the corpus store. The corpus-level cut (canonical dedup,
    * blocklist, quota) applies at read time via
    * [[graft.operators.CrawlIngest.curated]] — bit-identical to the
    * one-shot chain (s26 under q76's oracle gate; StreamingSpec
    * differential with a mid-stream fold and the fresh-checkpoint
    * refusal).
    *
    * THE SAME SURVIVORS optionally flow into the standing continuous
    * views and indexes — the composition a real ingest front-door runs,
    * each on its own store with the shared protocol guarantees (the
    * one checkpoint lineage pins every store, so a fresh checkpoint is
    * refused by all of them):
    *   - `lineStatsDir`: the corpus line-frequency relation (s10's
    *     [[graft.operators.LineDedup]] — boilerplate cut at read time);
    *   - `datacardDir`: the live release datacard (s24's
    *     [[graft.operators.Datacard]], language from the engine's
    *     n-gram heuristic over the extracted text);
    *   - `quota`: (dir, cap) — s21's GREEDY arrival-order domain quota
    *     ([[graft.operators.QuotaView]]), the admission-time view whose
    *     semantics deliberately differ from the read-time cut (the
    *     QuotaView scaladoc's replay law governs it);
    *   - `dedupIndex`: (indexDir, outDir, threshold) — the d11 O(batch)
    *     near-dup probe + index fold ([[dedupIngestBatch]]), so the
    *     next trigger dedups against this one's survivors.
    *
    * `idOf` derives the document id from the page html; `domainOf`
    * derives the registered domain from the URL (PSL literal or
    * relation form upstream of this call).
    */
  def crawlIngestStream(warcFiles: DataFrame, agent: String,
                        robotsDf: DataFrame,
                        domainOf: Column => Column,
                        idOf: Column => Column, minWords: Int,
                        storeDir: String, checkpointDir: String,
                        compactEvery: Int = 16,
                        lineStatsDir: Option[String] = None,
                        datacardDir: Option[String] = None,
                        quota: Option[(String, Int)] = None,
                        dedupIndex: Option[(String, String, Double)] = None,
                        onBatchDone: Long => Unit = _ => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    warcFiles.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import graft.operators.{CrawlIngest, Datacard, LineDedup, QuotaView}
        import graft.sources.{StoredIndex, WarcSource}
        val spark = batch.sparkSession
        if (StoredIndex.metaGeneration(spark, storeDir) < 0)
          CrawlIngest.init(spark, storeDir)
        StoredIndex.pinStreamIdentity(spark, storeDir, checkpointDir)
        if (!batch.isEmpty) {
          // split the batch's members with the same codegen parser the
          // batch reader uses, keep clean response records only.
          // persist (not localCheckpoint): the same stage boundary —
          // the gates and every sink below consume these relations once
          // (q76's discipline) — but RELEASABLE in the finally, so a
          // long-running stream does not accumulate dead storage blocks
          // trigger after trigger waiting on driver GC
          val recs = WarcSource.good(
            batch.toDF().select(col("path").as("warc_file"),
                explode(graft.plans.WarcRecordsExpr.warcRecords(
                  col("content"))).as("rec"))
              .select(col("warc_file"), col("rec.*")))
            .select(col("target_uri").as("url"),
              decode(col("body"), "UTF-8").as("__html"))
            .withColumn("domain", domainOf(col("url")))
            .persist()
          val survivors = CrawlIngest.curateBatch(recs, robotsDf, agent,
              idOf, minWords)
            .persist() // one curation, up to five sinks
          try {
          CrawlIngest.append(survivors, storeDir, batchId)
          lineStatsDir.foreach { d =>
            if (StoredIndex.metaGeneration(spark, d) < 0)
              LineDedup.initStats(spark, d)
            StoredIndex.pinStreamIdentity(spark, d, checkpointDir)
            LineDedup.appendLineStats(survivors, "doc_id", "text", d, batchId)
            if (compactEvery > 0 &&
                LineDedup.statsFragmentCount(spark, d) > compactEvery)
              LineDedup.compactStats(spark, d)
          }
          datacardDir.foreach { d =>
            if (StoredIndex.metaGeneration(spark, d) < 0)
              Datacard.init(spark, d)
            StoredIndex.pinStreamIdentity(spark, d, checkpointDir)
            Datacard.append(survivors.withColumn("__lang",
                graft.functions.TextFunctions.langId(col("text"))),
              "doc_id", "text", "__lang", d, batchId)
            if (compactEvery > 0 &&
                Datacard.fragmentCount(spark, d) > compactEvery)
              Datacard.compact(spark, d)
          }
          quota.foreach { case (d, cap) =>
            if (StoredIndex.metaGeneration(spark, d) < 0)
              QuotaView.init(spark, d)
            StoredIndex.pinStreamIdentity(spark, d, checkpointDir)
            QuotaView.append(survivors, "doc_id", "domain", d, batchId, cap,
              Some(md5(col("doc_id").cast("string").cast("binary"))))
            if (compactEvery > 0 &&
                QuotaView.fragmentCount(spark, d) > compactEvery)
              QuotaView.compact(spark, d)
          }
          dedupIndex.foreach { case (indexDir, outDir, threshold) =>
            dedupIngestBatch(survivors, batchId, "doc_id", "text",
              indexDir, outDir, checkpointDir, threshold,
              compactEvery = compactEvery)
          }
          if (compactEvery > 0 &&
              CrawlIngest.fragmentCount(spark, storeDir) > compactEvery)
            CrawlIngest.compact(spark, storeDir)
          } finally {
            survivors.unpersist(blocking = false)
            recs.unpersist(blocking = false)
          }
        }
        onBatchDone(batchId)
      }
      .start()
}
