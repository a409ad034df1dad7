package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Typed event row for the stateful APIs. */
final case class EventRow(ts: java.sql.Timestamp, user_id: Long,
                          event_type: String, value: Double)

/** Running per-user aggregate carried in the state store. */
final case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

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

  /** CONTINUOUS ingest dedup against a persisted near-dup index — the
    * streaming form of the daily cycle ([[graft.ext.NearDup.NearDupIndex]]):
    * each micro-batch of new documents is probed against the stored index
    * with the O(batch) path (corpus relations broadcast-semi-pruned, never
    * shuffled), batch-internal near-dups are resolved, survivors are
    * appended to `outDir` AND folded into the index relations, so the NEXT
    * micro-batch dedups against them too.
    *
    * `foreachBatch` is the deliberate mechanism, not a fallback: per
    * trigger the micro-batch is a plain DataFrame, so the exact
    * oracle-gated batch operators (d10/d11's plans, cap semantics, exact
    * verification) run unchanged — no state-store reimplementation of LSH
    * to drift from the batch semantics — and the index append happens once
    * per micro-batch, transactionally ordered after the survivor
    * materialization. Spark's checkpoint (`checkpointDir`) makes delivery
    * at-least-once per micro-batch: a replayed batch re-appends its
    * survivors, which the min-id keep policy and downstream exact dedup
    * (d01) absorb — the standard idempotence story for file sinks.
    *
    * Keep policy within a batch: a doc is dropped iff it has a near-dup
    * with a SMALLER id in the stored corpus or the same batch (greedy
    * min-id — the kept set is pairwise non-near-dup; same policy family as
    * d07's cluster-representative keep, differing only on non-transitive
    * pair graphs where greedy keeps every locally-minimal doc).
    *
    * State is all ON DISK in the index relations — executors hold nothing
    * between triggers, so executor loss costs one micro-batch replay, and
    * the stored index is exactly what the batch jobs (d11-d13) read:
    * streaming and batch ingest can interleave against the same index,
    * with [[graft.ext.NearDup.compactIndex]] as the shared maintenance op.
    */
  def incrementalDedupStream(newDocs: DataFrame, idCol: String, textCol: String,
                             indexDir: String, outDir: String,
                             checkpointDir: String, threshold: Double,
                             maxBucketSize: Int = 1000)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.ext.NearDup
    newDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val index = NearDup.NearDupIndex.load(spark, indexDir)
          // vs the standing corpus: O(batch) probe against the stored index
          val corpusDrops = NearDup.incrementalNearDupPairs(
              batch.toDF(), index, idCol, textCol, threshold, maxBucketSize)
            .select(col("id_new").as(idCol)).distinct()
          // within the batch: drop any doc with a smaller near-dup sibling
          // (pairs come oriented id_a < id_b)
          val innerDrops = NearDup.nearDuplicatePairs(
              batch.toDF(), idCol, textCol, threshold)
            .select(col("id_b").as(idCol)).distinct()
          // materialize survivors BEFORE touching the index dir: their plan
          // reads the same parquet relations the appends below write
          val survivors = batch.toDF()
            .join(corpusDrops.unionByName(innerDrops).distinct(),
              Seq(idCol), "left_anti")
            .localCheckpoint()
          val ext = NearDup.buildIndex(survivors, idCol, textCol,
            index.numHashes, index.bands, index.shingleSize)
          ext.shingles.write.mode("append").parquet(s"$indexDir/shingles")
          ext.buckets.write.mode("append").parquet(s"$indexDir/buckets")
          survivors.write.mode("append").parquet(outDir)
          spark.catalog.clearCache() // probe caches are per-micro-batch
        }
      }
      .start()
  }
}
