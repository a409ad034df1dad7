package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)
case class Doc(doc_id: Long, text: String)
case class Upd(id: Long, name: String, bal: Double)
case class Cdc(side: String, k: Long, a: String, b: String)
case class QDoc(doc_id: Long, domain: String)
case class LDoc(doc_id: Long, text: String, lang: String)
case class QTok(doc_id: Long, domain: String, n_tok: Long)

/** Differential stream-vs-batch tests: the same event-time aggregations must
  * produce identical results fed through Structured Streaming micro-batches
  * (complete/append output over a MemoryStream) and plain batch execution —
  * `window`/`session_window` are mode-agnostic by design.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Int) = new Timestamp(minutes * 60000L)

  private val events = Seq(
    Ev(ts(1), 1, "click", 1.0), Ev(ts(5), 1, "click", 2.0),
    Ev(ts(61), 1, "view", 3.0), Ev(ts(62), 2, "click", 4.0),
    Ev(ts(200), 2, "click", 5.0), Ev(ts(201), 1, "click", 6.0))

  test("streaming tumbling agg over MemoryStream equals batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(events.take(3))
    mem.addData(events.drop(3))

    val streamed = StreamOps.tumblingAgg(mem.toDF(), "ts", "1 hour", "10 minutes")
    val query = streamed.writeStream
      .format("memory").queryName("tumbling_out").outputMode("complete").start()
    query.processAllAvailable()
    query.stop()

    val got = spark.table("tumbling_out")
      .select("window_start", "event_type", "n", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val expected = events.toDF()
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start"), col("event_type"), col("n"), col("sum_value"))
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("windowedPsi streamed over MemoryStream equals the batch plan") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(events.take(2))
    mem.addData(events.drop(2))

    val masses = Seq(0.25, 0.25, 0.25, 0.25)
    val streamed = graft.operators.Drift.windowedPsi(
      mem.toDF(), "ts", "value", "1 hour", masses, 0.0, 8.0,
      watermark = Some("10 minutes"))
    val query = streamed.writeStream
      .format("memory").queryName("drift_out").outputMode("complete").start()
    query.processAllAvailable()
    query.stop()

    val got = spark.table("drift_out")
      .select("window_start", "bin", "q_mass", "contrib")
      .as[(Timestamp, Int, Double, Double)].collect().toSet
    val expected = graft.operators.Drift.windowedPsi(
        events.toDF(), "ts", "value", "1 hour", masses, 0.0, 8.0)
      .as[(Timestamp, Int, Double, Double)].collect().toSet
    assert(got == expected)
    assert(got.size == 12, "3 windows x 4 bins, zero bins present")
  }

  test("scd2Stream: streamed micro-batches equal batch merges; a fresh checkpoint is refused") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("scd2stream").toString
    val dimPath = s"$root/dim"

    val mem = MemoryStream[Upd]
    mem.addData(Upd(1L, "a", 10.0), Upd(2L, "b", 20.0)) // batch 0: bootstrap
    val q1 = StreamOps.scd2Stream(mem.toDF(), dimPath, Seq("id"),
      Seq("name", "bal"), s"$root/ckpt")
    q1.processAllAvailable()
    mem.addData(Upd(1L, "a", 15.0), Upd(3L, "c", 30.0)) // batch 1: change + insert
    q1.processAllAvailable()
    q1.stop()

    // differential: the same two batches merged in batch mode
    val twinPath = s"$root/twin"
    graft.sources.Scd2.merge(
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "bal"),
      twinPath, Seq("id"), Seq("name", "bal"), 1L)
    graft.sources.Scd2.merge(
      Seq((1L, "a", 15.0), (3L, "c", 30.0)).toDF("id", "name", "bal"),
      twinPath, Seq("id"), Seq("name", "bal"), 2L)
    def st(p: String) = spark.read.parquet(p)
      .select("id", "name", "bal", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Double, Long, Option[Long], Boolean)].collect().toSet
    assert(st(dimPath) == st(twinPath))

    // a FRESH checkpoint recycles batch ids below the open versions ->
    // the monotonic clock guard must fail the stream, not corrupt chains
    val mem2 = MemoryStream[Upd]
    mem2.addData(Upd(1L, "a", 99.0))
    val q2 = StreamOps.scd2Stream(mem2.toDF(), dimPath, Seq("id"),
      Seq("name", "bal"), s"$root/ckpt_fresh")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(err).exists(_.getMessage != null)
      && causes(err).exists(c => Option(c.getMessage).exists(_.contains("stale batchId"))),
      s"expected the stale-clock refusal, got: ${err.getMessage}")
    assert(st(dimPath) == st(twinPath), "refused batch must not have touched the dimension")
  }

  test("dropDuplicatesWithinWatermark keeps one row per (user, type) key") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(events)

    val deduped = StreamOps.dedupWithinWatermark(mem.toDF(), "ts", "10 hours")
    val query = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    query.processAllAvailable()
    query.stop()

    val got = spark.table("dedup_out").select("user_id", "event_type")
      .as[(Long, String)].collect().toSeq
    assert(got.size == got.toSet.size) // no duplicate keys emitted
    assert(got.toSet == Set((1L, "click"), (1L, "view"), (2L, "click")))
  }

  test("flatMapGroupsWithState carries running per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    val query = StreamOps.runningUserAgg(mem.toDS()).writeStream
      .format("memory").queryName("state_out").outputMode("update").start()
    // two separate micro-batches (processed in between): state must
    // accumulate across them
    mem.addData(events.take(3).map(e => EventRow(e.ts, e.user_id, e.event_type, e.value)))
    query.processAllAvailable()
    mem.addData(events.drop(3).map(e => EventRow(e.ts, e.user_id, e.event_type, e.value)))
    query.processAllAvailable()
    query.stop()

    // the LAST emitted update per user must equal the batch-mode totals
    val emitted = spark.table("state_out").as[(Long, Long, Double)].collect()
    val finalPerUser = emitted.zipWithIndex
      .groupBy(_._1._1).map { case (u, rows) => u -> rows.maxBy(_._2)._1 }
    val expected = events.groupBy(_.user_id).map { case (u, es) =>
      u -> ((u, es.size.toLong, es.map(_.value).sum))
    }
    assert(finalPerUser == expected)
    // multiple updates for a user seen in both batches proves cross-batch state
    assert(emitted.count(_._1 == 1L) >= 2)
  }

  test("one-event-per-batch streaming trace equals the s07 batch running twin") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.expressions.Window
    val mem = MemoryStream[EventRow]
    val query = StreamOps.runningUserAgg(mem.toDS()).writeStream
      .format("memory").queryName("trace_out").outputMode("update").start()
    // one event per micro-batch, in event-time order: the state machine must
    // emit the FULL running trace, row for row what the batch cumulative
    // window (s07_running_user_agg's plan) computes
    events.sortBy(_.ts.getTime).foreach { e =>
      mem.addData(Seq(EventRow(e.ts, e.user_id, e.event_type, e.value)))
      query.processAllAvailable()
    }
    query.stop()

    val got = spark.table("trace_out").as[(Long, Long, Double)].collect().toSet
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = events.toDF().select(col("user_id"),
        count(lit(1)).over(w).as("n"), sum(col("value")).over(w).as("t"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("runningUserAgg evicts idle keys once the watermark passes their timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventRow]
    // zero watermark delay, 60 s idle timeout: user 1's state must be gone
    // long before minute 100
    val query = StreamOps.runningUserAgg(mem.toDS(),
        watermark = "0 seconds", idleTimeoutMs = 60000L).writeStream
      .format("memory").queryName("evict_out").outputMode("update").start()

    mem.addData(Seq(EventRow(ts(1), 1, "click", 1.0)))     // user 1 appears
    query.processAllAvailable()
    mem.addData(Seq(EventRow(ts(100), 2, "view", 2.0)))    // advances watermark to min 100
    query.processAllAvailable()
    mem.addData(Seq(EventRow(ts(101), 2, "view", 3.0)))    // batch where user 1's timeout fires
    query.processAllAvailable()
    mem.addData(Seq(EventRow(ts(102), 1, "click", 4.0)))   // user 1 returns AFTER eviction
    query.processAllAvailable()
    query.stop()

    val emitted = spark.table("evict_out").as[(Long, Long, Double)].collect()
    // the post-eviction update for user 1 restarts from zero: n_events == 1,
    // total == 4.0 — state did NOT carry the pre-eviction event
    val lastUser1 = emitted.zipWithIndex.filter(_._1._1 == 1L).maxBy(_._2)._1
    assert(lastUser1 == ((1L, 1L, 4.0)))
    // and user 2, never idle long enough, accumulated normally
    val lastUser2 = emitted.zipWithIndex.filter(_._1._1 == 2L).maxBy(_._2)._1
    assert(lastUser2 == ((2L, 2L, 5.0)))
  }

  test("watermarked stream-stream interval join equals the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val clickEvents = Seq(
      Ev(ts(10), 1, "click", 0), Ev(ts(30), 1, "click", 0),
      Ev(ts(40), 2, "click", 0), Ev(ts(300), 3, "click", 0))
    val purchaseEvents = Seq(
      Ev(ts(25), 1, "purchase", 9), // joins both user-1 clicks? 10+60>=25 yes, 30<=25 no
      Ev(ts(95), 2, "purchase", 7), // 55 min after click -> in window
      Ev(ts(200), 2, "purchase", 5), // 160 min after -> out of window
      Ev(ts(299), 3, "purchase", 3)) // before the click -> out

    // the time-range predicate is what bounds BOTH state stores: a click
    // older than watermark - 60min can never join a future purchase
    val c = clicks.toDF().withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts").as("cts"), col("value").as("cv"))
    val p = purchases.toDF().withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_uid"), col("ts").as("pts"), col("value").as("pv"))
    val joined = c.join(p,
      col("user_id") === col("p_uid") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("cts"), col("pts"))
    val query = joined.writeStream
      .format("memory").queryName("ssj_out").outputMode("append").start()
    clicks.addData(clickEvents.take(2)); purchases.addData(purchaseEvents.take(1))
    query.processAllAvailable()
    clicks.addData(clickEvents.drop(2)); purchases.addData(purchaseEvents.drop(1))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("ssj_out")
      .as[(Long, Timestamp, Timestamp)].collect().toSet
    val expected = (for {
      cl <- clickEvents; pu <- purchaseEvents
      if cl.user_id == pu.user_id
      if pu.ts.getTime >= cl.ts.getTime && pu.ts.getTime <= cl.ts.getTime + 3600000L
    } yield (cl.user_id, cl.ts, pu.ts)).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("funnelStream resolves the batch funnel exactly under adversarial arrival order") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Funnel
    // events over 12 users covering: full chains, broken chains,
    // pre-view clicks, equal-timestamp non-advances, late-arriving
    // earlier views (the case a greedy state machine gets wrong)
    val rnd = new scala.util.Random(7)
    val types = Seq("view", "click", "purchase", "signup")
    val all = (for {
      u <- 1L to 12L
      i <- 1 to 10
    } yield EventRow(ts(rnd.nextInt(300)), u, types(rnd.nextInt(types.length)),
      i.toDouble)).toVector
    // adversarial arrival: strictly DECREASING event time, so every
    // earlier-in-event-time row arrives after its successors
    val arrival = all.sortBy(-_.ts.getTime)

    val src = MemoryStream[EventRow]
    val out = StreamOps.funnelStream(src.toDS(), ("view", "click", "purchase"))
    val query = out.writeStream
      .format("memory").queryName("funnel_out").outputMode("update").start()
    arrival.grouped(17).foreach { batch =>
      src.addData(batch); query.processAllAvailable()
    }
    query.stop()

    // chain monotonicity: the final (dominating) update per user is the
    // min-time / max-reached fold of that user's updates
    val got = spark.table("funnel_out")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.min("t_1").as("t_1"),
        org.apache.spark.sql.functions.min("t_2").as("t_2"),
        org.apache.spark.sql.functions.min("t_3").as("t_3"),
        org.apache.spark.sql.functions.max("reached").as("reached"))
    val batchDf = Funnel.resolve(all.toDF(), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
    val cols = Seq("user_id", "t_1", "t_2", "t_3", "reached").map(col)
    assert(got.select(cols: _*).collect().toSet ==
      batchDf.select(cols: _*).collect().toSet)
    assert(batchDf.count() > 0 && batchDf.filter(col("reached") === 3).count() > 0,
      "fixture should complete at least one full chain")
  }

  test("watermarked stream-stream LEFT OUTER interval join emits null-padded unmatched clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val clickEvents = Seq(
      Ev(ts(10), 1, "click", 0),   // converts at ts(25)
      Ev(ts(30), 1, "click", 0),   // never converts -> null row
      Ev(ts(40), 2, "click", 0),   // converts at ts(95)
      Ev(ts(300), 3, "click", 0))  // purchase came BEFORE it -> null row
    val purchaseEvents = Seq(
      Ev(ts(25), 1, "purchase", 9),
      Ev(ts(95), 2, "purchase", 7),
      Ev(ts(299), 3, "purchase", 3))
    // far-future sentinels push the watermark past every real click's
    // join window so the null-padded rows actually EMIT (a left-outer
    // stream can only give up on a click once the watermark proves no
    // matching purchase can still arrive)
    val sentinelC = Ev(ts(100000), 99, "click", 0)
    val sentinelP = Ev(ts(100000), 99, "purchase", 0)

    val c = clicks.toDF().withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts").as("cts"))
    val p = purchases.toDF().withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_uid"), col("ts").as("pts"))
    val joined = c.join(p,
        col("user_id") === col("p_uid") &&
          col("pts") >= col("cts") &&
          col("pts") <= col("cts") + org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR"),
        "left_outer")
      .select(col("user_id"), col("cts"), col("pts"))
    val query = joined.writeStream
      .format("memory").queryName("ssj_lo_out").outputMode("append").start()
    clicks.addData(clickEvents.take(2)); purchases.addData(purchaseEvents.take(1))
    query.processAllAvailable()
    clicks.addData(clickEvents.drop(2)); purchases.addData(purchaseEvents.drop(1))
    query.processAllAvailable()
    clicks.addData(Seq(sentinelC)); purchases.addData(Seq(sentinelP))
    query.processAllAvailable()
    query.stop()

    val got = spark.table("ssj_lo_out")
      .filter(col("user_id") =!= 99)
      .as[(Long, Timestamp, Option[Timestamp])].collect().toSet
    val matched = (for {
      cl <- clickEvents; pu <- purchaseEvents
      if cl.user_id == pu.user_id
      if pu.ts.getTime >= cl.ts.getTime && pu.ts.getTime <= cl.ts.getTime + 3600000L
    } yield (cl.user_id, cl.ts, Some(pu.ts))).toSet
    val unmatched = clickEvents
      .filter(cl => !matched.exists { case (u, ct, _) => u == cl.user_id && ct == cl.ts })
      .map(cl => (cl.user_id, cl.ts, None)).toSet
    assert(got == matched ++ unmatched)
    assert(unmatched.size == 2, "fixture should leave two unconverted clicks")
  }

  test("file-based stream: parquet dir -> windowed agg -> parquet sink") {
    val base = "/root/repo/target/qtmp/stream_e2e"
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val df = events.toDF()
    df.write.mode("overwrite").parquet(inDir)

    val stream = StreamOps.readEventStream(spark, inDir, df.schema,
      maxFilesPerTrigger = 2)
    val agg = StreamOps.tumblingAgg(stream, "ts", "1 hour", "10 minutes")
    val query = agg.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    query.processAllAvailable()
    query.stop()

    // append mode only emits windows the watermark has passed; the final
    // (open) window is withheld -> compare against the batch result minus
    // the max window
    val batch = df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val maxWs = batch.agg(max("ws")).collect().head.getTimestamp(0)
    val expected = batch.filter(col("ws") < lit(maxWs))
      .as[(Timestamp, String, Long)].collect().toSet
    val got = spark.read.parquet(outDir)
      .select(col("window_start"), col("event_type"), col("n"))
      .as[(Timestamp, String, Long)].collect().toSet
    assert(got == expected)
  }

  test("streaming session windows equal batch session_window result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(events)

    val streamed = StreamOps.sessionAgg(mem.toDF(), "ts", "30 minutes", "10 minutes")
    val query = streamed.writeStream
      .format("memory").queryName("session_out").outputMode("complete").start()
    query.processAllAvailable()
    query.stop()

    val got = spark.table("session_out")
      .select("user_id", "session_start", "session_end", "n")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    val expected = events.toDF()
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start"), col("w.end"), col("n"))
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    assert(got == expected)
  }

  test("lineStatsStream accumulates fragments that make the stats-based cut equal the one-shot batch cut") {
    import graft.operators.LineDedup
    implicit val sqlCtx = spark.sqlContext
    val footer = "All Rights Reserved."
    // footer in 4 docs total but only 2 PER BATCH — the cut is correct
    // only if the per-batch fragments SUM (minDocs = 3 exceeds any
    // single batch's count); "shared twice" stays at 2 < minDocs
    val b1 = Seq(Doc(1L, s"alpha one\n$footer\nshared twice"),
      Doc(2L, s"beta two\n$footer"))
    val b2 = Seq(Doc(3L, s"gamma three\n$footer\nshared twice"),
      Doc(4L, s"delta four\n$footer"))
    val corpus = (b1 ++ b2).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("line-stats").toString
    try {
      val mem = MemoryStream[Doc]
      mem.addData(b1)
      // compactEvery = 1: batch 1's append pushes the live epoch past one
      // fragment, so the stream folds mid-run — the differential below
      // covers fold + fragment summation together
      val q = StreamOps.lineStatsStream(mem.toDF(), "doc_id", "text",
        s"$tmp/stats", s"$tmp/ckpt", compactEvery = 1)
      q.processAllAvailable()
      mem.addData(b2)
      q.processAllAvailable()
      q.stop()
      // the store is protocol-managed: both fragments folded into the
      // epoch-1 directory's single summed partition, watermark advanced
      import graft.sources.StoredIndex
      val (kv, _) = StoredIndex.readKvWithGen(spark, s"$tmp/stats")
      assert(kv("epoch") == "1" && kv("compacted_through") == "1", kv.toString)
      assert(LineDedup.statsFragmentCount(spark, s"$tmp/stats") == 0)
      // the fold lives under the epoch-1 ATTEMPT-TAGGED directory the
      // meta names (stats_e1_w<tag> — compaction racers write disjoint
      // attempt dirs since the concurrent-clobber fix)
      val epochDirs = new java.io.File(s"$tmp/stats").list()
        .filter(_.matches("stats_e1_w[0-9a-f]+")).toSeq
      assert(epochDirs.size == 1, epochDirs.mkString(", "))
      val folded = new java.io.File(s"$tmp/stats/${epochDirs.head}")
        .listFiles().map(_.getName).filter(_.startsWith("batch_id=")).toSeq
      assert(folded == Seq("batch_id=-1"), folded.mkString(", "))
      val streamed = LineDedup.dedupLinesWithStats(corpus, "doc_id", "text",
          LineDedup.readStats(spark, s"$tmp/stats"), minDocs = 3)
        .select("doc_id", "text").as[(Long, String)].collect().toMap
      val oneShot = LineDedup.dedupLines(corpus, "doc_id", "text", minDocs = 3)
        .select("doc_id", "text").as[(Long, String)].collect().toMap
      assert(streamed == oneShot, s"streamed=$streamed oneShot=$oneShot")
      assert(streamed(1L) == "alpha one\nshared twice",
        "cross-batch counts must merge: footer is 2+2 >= 3")
      // an at-least-once REPLAY of an already-FOLDED batch is a no-op
      // (its fragment partition no longer exists to overwrite — the
      // compacted_through watermark is what prevents a double count)
      LineDedup.appendLineStats(b2.toDF("doc_id", "text"), "doc_id", "text",
        s"$tmp/stats", batchId = 1L)
      val replayed = LineDedup.dedupLinesWithStats(corpus, "doc_id", "text",
          LineDedup.readStats(spark, s"$tmp/stats"), minDocs = 3)
        .select("doc_id", "text").as[(Long, String)].collect().toMap
      assert(replayed == oneShot, "replay of a folded batch must not change the counts")
      assert(LineDedup.statsFragmentCount(spark, s"$tmp/stats") == 0,
        "a folded batch's replay must not recreate its fragment")
      // a fresh checkpoint against the ingested store is refused (its
      // recycled batch ids would fall below the watermark and be dropped)
      val mem2 = MemoryStream[Doc]
      mem2.addData(Seq(Doc(9L, "new content\nfresh line")))
      val q2 = StreamOps.lineStatsStream(mem2.toDF(), "doc_id", "text",
        s"$tmp/stats", s"$tmp/ckpt2", compactEvery = 1)
      val err = intercept[Exception] { q2.processAllAvailable() }
      try q2.stop() catch { case _: Exception => () }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(err).exists(_.contains("checkpoint")), messages(err).mkString("; "))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("spanStatsStream: accumulated fragments make the stats-based span cut equal the one-shot cut") {
    import graft.operators.SpanDedup
    implicit val sqlCtx = spark.sqlContext
    // an 8-token phrase in 2 docs, but only 1 PER BATCH — the cut is
    // correct only if per-batch window counts SUM (minDocs = 2 exceeds
    // any single batch's count)
    val phrase = "one two three four five six seven eight"
    val b1 = Seq(Doc(1L, s"intro a b $phrase tail x"),
      Doc(2L, "unrelated words only here nothing shared at all"))
    val b2 = Seq(Doc(3L, s"other start $phrase closing y"),
      Doc(4L, "more filler text with no duplication present whatsoever"))
    val corpus = (b1 ++ b2).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("span-stats-stream").toString
    try {
      val mem = MemoryStream[Doc]
      mem.addData(b1)
      // compactEvery = 1: a mid-run fold sits under the differential
      val q = StreamOps.spanStatsStream(mem.toDF(), "doc_id", "text",
        s"$tmp/stats", s"$tmp/ckpt", n = 8, compactEvery = 1)
      q.processAllAvailable()
      mem.addData(b2)
      q.processAllAvailable()
      q.stop()
      import graft.sources.StoredIndex
      val (kv, _) = StoredIndex.readKvWithGen(spark, s"$tmp/stats")
      assert(kv("epoch") == "1" && kv("compacted_through") == "1", kv.toString)
      assert(SpanDedup.spanStatsFragmentCount(spark, s"$tmp/stats") == 0)
      val streamed = SpanDedup.removeSpansWithStats(corpus, "doc_id", "text",
          SpanDedup.readSpanStats(spark, s"$tmp/stats"), n = 8, minDocs = 2)
        .select("doc_id", "text").as[(Long, String)].collect().toMap
      val oneShot = SpanDedup.removeSpans(corpus, "doc_id", "text", 8, 2)
        .select("doc_id", "text").as[(Long, String)].collect().toMap
      assert(streamed == oneShot, s"streamed=$streamed oneShot=$oneShot")
      assert(streamed(1L) == "intro a b tail x",
        "cross-batch counts must merge: the phrase is 1+1 >= 2")
      // a fresh checkpoint against the ingested store is refused
      val mem2 = MemoryStream[Doc]
      mem2.addData(Seq(Doc(9L, "fresh new content for a fresh checkpoint run")))
      val q2 = StreamOps.spanStatsStream(mem2.toDF(), "doc_id", "text",
        s"$tmp/stats", s"$tmp/ckpt2", n = 8, compactEvery = 1)
      val err = intercept[Exception] { q2.processAllAvailable() }
      try q2.stop() catch { case _: Exception => () }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(err).exists(_.contains("checkpoint")), messages(err).mkString("; "))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("metricViewStream: accumulated MV answers the daily probe like a direct aggregate") {
    import graft.operators.MetricView
    implicit val sqlCtx = spark.sqlContext
    def ts(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // 'click' leads day 1 only when both batches' counts sum (1+2 vs 2 views)
    val b1 = Seq(Ev(ts(1, 1), 1L, "click", 1.0), Ev(ts(1, 2), 2L, "view", 1.0),
      Ev(ts(2, 3), 3L, "view", 1.0))
    val b2 = Seq(Ev(ts(1, 4), 4L, "click", 1.0), Ev(ts(1, 5), 5L, "click", 1.0),
      Ev(ts(1, 6), 6L, "view", 1.0), Ev(ts(2, 7), 7L, "purchase", 1.0))
    val all = (b1 ++ b2).toDF()
    val tmp = java.nio.file.Files.createTempDirectory("metric-view-stream").toString
    try {
      val mem = MemoryStream[Ev]
      mem.addData(b1)
      val q = StreamOps.metricViewStream(mem.toDF(), "ts", "event_type",
        s"$tmp/mv", s"$tmp/ckpt", compactEvery = 1)
      q.processAllAvailable()
      mem.addData(b2)
      q.processAllAvailable()
      q.stop()
      val mv = MetricView.read(spark, s"$tmp/mv")
        .as[(java.sql.Date, String, Long)].collect().toSet
      val direct = MetricView.dailyCounts(all, "ts", "event_type")
        .as[(java.sql.Date, String, Long)].collect().toSet
      assert(mv == direct, s"mv=$mv direct=$direct")
      val top = MetricView.topKPerDay(MetricView.read(spark, s"$tmp/mv"),
          "event_type", 1)
        .select("day", "event_type").as[(java.sql.Date, String)].collect().toMap
      assert(top(java.sql.Date.valueOf("2024-01-01")) == "click",
        "cross-batch counts must sum: click is 3 = 1 + 2 vs view 2")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("distinctViewStream: cross-batch users count once; view matches a direct distinct") {
    import graft.operators.DistinctView
    implicit val sqlCtx = spark.sqlContext
    def ts(d: Int, h: Int) = Timestamp.valueOf(f"2024-02-$d%02d $h%02d:00:00")
    // user 1 is active on day 1 in BOTH batches: an additive counter says
    // 3 for day 1; the distinct view must say 2
    val b1 = Seq(Ev(ts(1, 1), 1L, "click", 1.0), Ev(ts(2, 2), 5L, "view", 1.0))
    val b2 = Seq(Ev(ts(1, 3), 1L, "view", 1.0), Ev(ts(1, 4), 2L, "click", 1.0),
      Ev(ts(2, 5), 6L, "view", 1.0))
    val tmp = java.nio.file.Files.createTempDirectory("distinct-view-stream").toString
    try {
      val mem = MemoryStream[Ev]
      mem.addData(b1)
      val q = StreamOps.distinctViewStream(mem.toDF(), "ts", "user_id",
        s"$tmp/dv", s"$tmp/ckpt", compactEvery = 1)
      q.processAllAvailable()
      mem.addData(b2)
      q.processAllAvailable()
      q.stop()
      val got = DistinctView.read(spark, s"$tmp/dv")
        .as[(java.sql.Date, Double)].collect().toMap
      val want = (b1 ++ b2).toDF()
        .groupBy(col("ts").cast("date").as("day"))
        .agg(countDistinct(col("user_id")).cast("double").as("n"))
        .as[(java.sql.Date, Double)].collect().toMap
      assert(got == want, s"got=$got want=$want")
      assert(got(java.sql.Date.valueOf("2024-02-01")) == 2.0,
        "user 1 appeared in both batches and must count once")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("percentileViewStream: cross-batch sketches fold; view matches a direct rank-exact percentile") {
    import graft.operators.PercentileView
    import graft.plans.QuantileSketch
    implicit val sqlCtx = spark.sqlContext
    def ts(d: Int, h: Int) = Timestamp.valueOf(f"2024-03-$d%02d $h%02d:00:00")
    // day 1's median depends on BOTH batches' values interleaving:
    // batch 1 gives {10, 100}, batch 2 adds {20, 30} -> p50 over
    // {10,20,30,100} = 20 (rank ceil(0.5*4)=2), which neither batch
    // alone would answer
    val b1 = Seq(Ev(ts(1, 1), 1L, "a", 10.0), Ev(ts(1, 2), 2L, "a", 100.0),
      Ev(ts(2, 3), 3L, "a", 7.0))
    val b2 = Seq(Ev(ts(1, 4), 4L, "a", 20.0), Ev(ts(1, 5), 5L, "a", 30.0),
      Ev(ts(2, 6), 6L, "a", 9.0))
    val tmp = java.nio.file.Files.createTempDirectory("percentile-view-stream").toString
    try {
      val mem = MemoryStream[Ev]
      mem.addData(b1)
      val withCents = (df: org.apache.spark.sql.DataFrame) =>
        df.withColumn("cents", floor(col("value") * 100).cast("long"))
      val q = StreamOps.percentileViewStream(withCents(mem.toDF()), "ts",
        "cents", s"$tmp/pv", s"$tmp/ckpt", compactEvery = 1)
      q.processAllAvailable()
      mem.addData(b2)
      q.processAllAvailable()
      q.stop()
      val got = PercentileView.read(spark, s"$tmp/pv")
        .select("day", "n_events", "p50")
        .as[(java.sql.Date, Long, Long)].collect().toSet
      val want = withCents((b1 ++ b2).toDF())
        .groupBy(col("ts").cast("date").as("day"))
        .agg(QuantileSketch.sketch(col("cents"), 15).as("sk"))
        .select(col("day"), QuantileSketch.sketchCount(col("sk")).as("n"),
          QuantileSketch.quantileAt(col("sk"), 50).as("p50"))
        .as[(java.sql.Date, Long, Long)].collect().toSet
      assert(got == want, s"got=$got want=$want")
      assert(got.contains((java.sql.Date.valueOf("2024-03-01"), 4L, 2000L)),
        "day-1 median must interleave values from both batches")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("joinViewStream: a multiplexed changelog maintains the exact join; fresh checkpoint refused") {
    import graft.sources.JoinView
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("join-view-stream").toString
    val view = JoinView.View(s"$tmp/view", Seq("k"),
      leftDdl = "k bigint, a string, batch_id bigint",
      rightDdl = "k bigint, b string, batch_id bigint",
      joinDdl = "k bigint, a string, b string, batch_id bigint")
    try {
      // cross-batch pairs on purpose: left k=1 arrives in batch 1, its
      // right partner arrived in batch 2... and vice versa
      val b1 = Seq(Cdc("left", 1L, "a1", null), Cdc("right", 2L, null, "b2"))
      val b2 = Seq(Cdc("left", 2L, "a2", null), Cdc("right", 1L, null, "b1"),
        Cdc("left", 3L, "a3", null), Cdc("right", 1L, null, "b1x"))
      val mem = MemoryStream[Cdc]
      mem.addData(b1)
      val q = StreamOps.joinViewStream(mem.toDF(), "side",
        leftCols = Seq("k", "a"), rightCols = Seq("k", "b"),
        view, s"$tmp/ckpt", compactEvery = 1)
      q.processAllAvailable()
      mem.addData(b2)
      q.processAllAvailable()
      q.stop()
      val all = (b1 ++ b2)
      val left = all.filter(_.side == "left").map(c => (c.k, c.a)).toDF("k", "a")
      val right = all.filter(_.side == "right").map(c => (c.k, c.b)).toDF("k", "b")
      val want = left.join(right, Seq("k"))
        .as[(Long, String, String)].collect().sorted.toSeq
      val got = JoinView.read(spark, view).select("k", "a", "b")
        .as[(Long, String, String)].collect().sorted.toSeq
      assert(got == want, s"got=$got want=$want")
      assert(want.map(_._1).contains(2L), "fixture sanity: cross-batch pair exists")
      // a fresh checkpoint against the maintained view is refused
      val mem2 = MemoryStream[Cdc]
      mem2.addData(Seq(Cdc("left", 7L, "a7", null)))
      val q2 = StreamOps.joinViewStream(mem2.toDF(), "side",
        Seq("k", "a"), Seq("k", "b"), view, s"$tmp/ckpt2")
      val err = intercept[Exception] { q2.processAllAvailable() }
      try q2.stop() catch { case _: Exception => () }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(err).exists(_.contains("checkpoint")), messages(err).mkString("; "))
      assert(JoinView.read(spark, view).select("k", "a", "b")
        .as[(Long, String, String)].collect().sorted.toSeq == want,
        "refused stream must not have touched the view")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("datacardStream: the card over two micro-batches equals the one-shot card; split dup pairs count") {
    import graft.operators.Datacard
    implicit val sqlCtx = spark.sqlContext
    // doc 1 (batch 1) duplicates doc 3 (batch 2) EXACTLY — the duplicate
    // pair straddles the micro-batches, so n_dup_docs is correct only if
    // per-(lang, fp) counts sum across fragments
    val b1 = Seq(LDoc(1L, "shared exact duplicate body", "en"),
      LDoc(2L, "a perfectly unique english document", "en"))
    val b2 = Seq(LDoc(3L, "shared exact duplicate body", "en"),
      LDoc(4L, "texto unico en otro idioma", "es"))
    val tmp = java.nio.file.Files.createTempDirectory("datacard").toString
    val mem = MemoryStream[LDoc]
    mem.addData(b1)
    // compactEvery = 1: the store folds between the batches, so the
    // differential covers fold + fragment summation together
    val q = StreamOps.datacardStream(mem.toDF(), "doc_id", "text", "lang",
      s"$tmp/card", s"$tmp/ckpt", compactEvery = 1)
    q.processAllAvailable()
    mem.addData(b2)
    q.processAllAvailable()
    q.stop()
    val streamed = Datacard.card(spark, s"$tmp/card")
      .as[(String, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(streamed("en")._2 == 3 && streamed("es")._2 == 1)
    assert(streamed("en")._5 == 2, "the straddling duplicate pair must count")
    assert(streamed("es")._5 == 0)
    // one-shot equality, bit for bit (incl. the quantized quality mean)
    val corpus = (b1 ++ b2).toDF("doc_id", "text", "lang")
    val oneTmp = java.nio.file.Files.createTempDirectory("datacard1").toString
    Datacard.init(spark, s"$oneTmp/card")
    Datacard.append(corpus, "doc_id", "text", "lang", s"$oneTmp/card", 0L)
    val oneShot = Datacard.card(spark, s"$oneTmp/card")
      .as[(String, Long, Long, Double, Long)].collect().toSet
    assert(streamed.values.toSet == oneShot)
  }

  test("postingsStream: accumulated fragments answer search like a one-shot index build") {
    import graft.operators.Retrieval
    implicit val sqlCtx = spark.sqlContext
    // 'alpha beta' co-occur only cross-batch per doc set; minimal corpus
    // where a per-batch-only index would miss doc 3's postings entirely
    val b1 = Seq(Doc(1L, "alpha beta gamma"), Doc(2L, "alpha only here"))
    val b2 = Seq(Doc(3L, "beta alpha again"), Doc(4L, "nothing relevant"))
    val corpus = (b1 ++ b2).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("postings-stream").toString
    try {
      val mem = MemoryStream[Doc]
      mem.addData(b1)
      // compactEvery = 1: a mid-run fold sits under the differential
      val q = StreamOps.postingsStream(mem.toDF(), "doc_id", "text",
        s"$tmp/postings", s"$tmp/ckpt", compactEvery = 1)
      q.processAllAvailable()
      mem.addData(b2)
      q.processAllAvailable()
      q.stop()
      import graft.sources.StoredIndex
      val (kv, _) = StoredIndex.readKvWithGen(spark, s"$tmp/postings")
      assert(kv("epoch") == "1" && kv("compacted_through") == "1", kv.toString)
      val accumulated = Retrieval.readPostings(spark, s"$tmp/postings")
      val oneShot = Retrieval.postings(corpus, "doc_id", "text")
      assert(accumulated.as[(String, Long, Long)].collect().toSet ==
        oneShot.as[(String, Long, Long)].collect().toSet)
      assert(Retrieval.searchAll(accumulated, "doc_id", Seq("alpha", "beta"))
        .as[Long].collect().toSet == Set(1L, 3L))
      // a fresh checkpoint against the ingested store is refused
      val mem2 = MemoryStream[Doc]
      mem2.addData(Seq(Doc(9L, "fresh content for a fresh checkpoint")))
      val q2 = StreamOps.postingsStream(mem2.toDF(), "doc_id", "text",
        s"$tmp/postings", s"$tmp/ckpt2", compactEvery = 1)
      val err = intercept[Exception] { q2.processAllAvailable() }
      try q2.stop() catch { case _: Exception => () }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(err).exists(_.contains("checkpoint")), messages(err).mkString("; "))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("annIngestStream: streamed fragments probe identically to a one-shot encode of the union") {
    import graft.ext.{AnnIndex, ClusteredFixture, PqAnn}
    val dim = 32
    val clusters = 20
    val emb = spark.range(400).select(col("id").as("vec_id"),
        ClusteredFixture.normalizedVec(col("id"), clusters, dim).as("embedding"))
      .cache()
    emb.count()
    val tmp = java.nio.file.Files.createTempDirectory("ann-stream").toString
    val (idxDir, inDir, ckptDir) = (s"$tmp/idx", s"$tmp/in", s"$tmp/ckpt")
    try {
      // day 0: bulk build over half the corpus
      AnnIndex.build(emb.filter(col("vec_id") < 200), "vec_id", "embedding",
        idxDir, dim, m = 8, pqK = 16, ivfK = clusters, iterations = 2)
      // two micro-batches arrive as files; one injected crash after batch
      // 0's writes forces an at-least-once replay through the stream
      emb.filter(col("vec_id") >= 200 && col("vec_id") < 300)
        .repartition(1).write.mode("append").parquet(inDir)
      val crashAt = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      crashAt.add(0L)
      val schema = emb.schema
      def start() = StreamOps.annIngestStream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(inDir),
        idxDir, "embedding", ckptDir,
        onBatchDone = { id =>
          if (crashAt.remove(id))
            throw new RuntimeException("injected crash before checkpoint commit")
        })
      var q = start()
      try q.processAllAvailable()
      catch { case _: Exception =>
        try q.stop() catch { case _: Exception => () }
        q = start() // restart from the same checkpoint: replay batch 0
        q.processAllAvailable()
      }
      emb.filter(col("vec_id") >= 300).repartition(1).write.mode("append").parquet(inDir)
      q.processAllAvailable()
      q.stop()
      assert(crashAt.isEmpty, "the injected crash never fired")
      // the replay overwrote its own fragment: every vector exactly once
      val idx = AnnIndex.load(spark, idxDir)
      assert(idx.codes.count() == 400, s"codes=${idx.codes.count()}")
      assert(AnnIndex.fragmentCount(spark, idxDir) == 2)
      // streamed index ≡ one-shot encode of the union under the same
      // (base-trained, stored) codebooks
      val queries = emb.filter(col("vec_id") < 8)
      val stored = AnnIndex.searchTopK(idx, emb, queries, "embedding",
          nprobe = 2, topR = 25, topK = 5)
        .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
      val oneShot = PqAnn.searchTopKIvf(
          PqAnn.encodeWithCells(emb, "embedding", idx.pq, idx.ivf)
            .select(col("vec_id"), col("codes"), col("cell")),
          emb, queries, "vec_id", "embedding", "codes", idx.pq, idx.ivf,
          nprobe = 2, topR = 25, topK = 5)
        .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
      assert(stored == oneShot && stored.size == 8 * 5)
      emb.unpersist()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("annIngestStream: a fresh checkpoint against an ingested index is refused") {
    import graft.ext.{AnnIndex, ClusteredFixture}
    val dim = 16
    val emb = spark.range(120).select(col("id").as("vec_id"),
      ClusteredFixture.normalizedVec(col("id"), 8, dim).as("embedding"))
    val tmp = java.nio.file.Files.createTempDirectory("ann-ckpt").toString
    val (idxDir, inDir) = (s"$tmp/idx", s"$tmp/in")
    try {
      AnnIndex.build(emb.filter(col("vec_id") < 80), "vec_id", "embedding",
        idxDir, dim, m = 4, pqK = 8, ivfK = 8, iterations = 1)
      emb.filter(col("vec_id") >= 80 && col("vec_id") < 100)
        .repartition(1).write.mode("append").parquet(inDir)
      val q = StreamOps.annIngestStream(
        spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1)
          .parquet(inDir),
        idxDir, "embedding", s"$tmp/ckpt")
      q.processAllAvailable()
      q.stop()
      // the first trigger pinned this stream's checkpoint into the meta...
      val (kv, _) = graft.sources.StoredIndex.readKvWithGen(spark, idxDir)
      assert(kv.getOrElse("stream_id", "").nonEmpty, kv.toString)
      // ...so a restart from a FRESH checkpoint (batch ids recycle from 0
      // and would dynamic-overwrite frag=0 with different data) fails fast
      emb.filter(col("vec_id") >= 100)
        .repartition(1).write.mode("append").parquet(inDir)
      val q2 = StreamOps.annIngestStream(
        spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1)
          .parquet(inDir),
        idxDir, "embedding", s"$tmp/ckpt2")
      val err = intercept[Exception] { q2.processAllAvailable() }
      try q2.stop() catch { case _: Exception => () }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(err).exists(_.contains("checkpoint")), messages(err).mkString("; "))
      // the refused stream appended nothing: still exactly one fragment
      assert(AnnIndex.fragmentCount(spark, idxDir) == 1)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("annIngestStream: rebuild-every-N folds fragments mid-stream, probes stay green") {
    import graft.ext.{AnnIndex, ClusteredFixture}
    val dim = 32
    val clusters = 10
    val emb = spark.range(400).select(col("id").as("vec_id"),
        ClusteredFixture.normalizedVec(col("id"), clusters, dim).as("embedding"))
      .cache()
    emb.count()
    val tmp = java.nio.file.Files.createTempDirectory("ann-rebuild").toString
    val (idxDir, inDir, ckptDir) = (s"$tmp/idx", s"$tmp/in", s"$tmp/ckpt")
    try {
      AnnIndex.build(emb.filter(col("vec_id") < 100), "vec_id", "embedding",
        idxDir, dim, m = 8, pqK = 16, ivfK = clusters, iterations = 2)
      // corpus contract: base + batches ingested so far — exactly what a
      // same-pipeline warehouse sink would hold (inDir is written one batch
      // ahead of processAllAvailable below, never further)
      val corpus = () => emb.filter(col("vec_id") < 100)
        .unionByName(spark.read.parquet(inDir))
      // three 100-vector batches: fragments go 1, 2 -> REBUILD (epoch 1,
      // fold to 0 fragments), then 1 again on the new epoch
      def writeBatch(b: Int): Unit =
        emb.filter(col("vec_id") >= 100 * (b + 1) && col("vec_id") < 100 * (b + 2))
          .repartition(1).write.mode("append").parquet(inDir)
      writeBatch(0)
      val q = StreamOps.annIngestStream(
        spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1)
          .parquet(inDir),
        idxDir, "embedding", ckptDir,
        rebuildEvery = 2, corpusForRebuild = Some(corpus))
      q.processAllAvailable()
      for (b <- 1 until 3) { writeBatch(b); q.processAllAvailable() }
      q.stop()
      val (kv, _) = graft.sources.StoredIndex.readKvWithGen(spark, idxDir)
      assert(kv("epoch") == "1", s"exactly one mid-stream rebuild: $kv")
      assert(kv.getOrElse("stream_id", "").nonEmpty,
        "the rebuild must carry the checkpoint-identity pin forward")
      assert(AnnIndex.fragmentCount(spark, idxDir) == 1,
        "post-rebuild appends land as fragments of the NEW epoch")
      // every vector exactly once across the folded epoch + live fragment
      val idx = AnnIndex.load(spark, idxDir)
      assert(idx.codes.count() == 400 &&
        idx.codes.select("vec_id").distinct().count() == 400)
      // probes stay green across the swap: each query's exact-reranked
      // top-1 lands in its own cluster (self-matches are excluded by the
      // kNN contract), for queries from every ingest era
      val queries = emb.filter(col("vec_id").isin(
        5L, 50L, 150L, 250L, 310L, 399L))
      val top1 = AnnIndex.searchTopK(idx, emb, queries, "embedding",
          nprobe = 3, topR = 25, topK = 1)
        .select("qid", "nid").as[(Long, Long)].collect().toMap
      assert(top1.size == 6 &&
        top1.forall { case (q, n) => q % clusters == n % clusters },
        s"top1=$top1")
      emb.unpersist()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("annIngestStream: vectorsDir self-maintains the rebuild corpus") {
    import graft.ext.{AnnIndex, ClusteredFixture}
    val dim = 16
    val clusters = 8
    val emb = spark.range(300).select(col("id").as("vec_id"),
        ClusteredFixture.normalizedVec(col("id"), clusters, dim).as("embedding"))
      .cache()
    emb.count()
    val tmp = java.nio.file.Files.createTempDirectory("ann-vecdir").toString
    val (idxDir, inDir, vecDir) = (s"$tmp/idx", s"$tmp/in", s"$tmp/vectors")
    try {
      val base = emb.filter(col("vec_id") < 100)
      AnnIndex.build(base, "vec_id", "embedding", idxDir, dim,
        m = 4, pqK = 8, ivfK = clusters, iterations = 1)
      // seed the self-maintained relation with the bulk build's vectors
      // (batch_id -1, the frag=-1 twin) per the documented contract
      graft.sources.ParquetWarehouse.overwritePartitions(
        base.withColumn("batch_id", lit(-1L)), vecDir, Seq("batch_id"))
      def writeBatch(b: Int): Unit =
        emb.filter(col("vec_id") >= 100 * (b + 1) && col("vec_id") < 100 * (b + 2))
          .repartition(1).write.mode("append").parquet(inDir)
      writeBatch(0)
      // rebuildEvery = 1: EVERY batch triggers a retrain after its append,
      // reading the corpus from vectorsDir — no caller thunk
      val q = StreamOps.annIngestStream(
        spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1)
          .parquet(inDir),
        idxDir, "embedding", s"$tmp/ckpt",
        rebuildEvery = 1, vectorsDir = Some(vecDir))
      q.processAllAvailable()
      writeBatch(1)
      q.processAllAvailable()
      q.stop()
      val (kv, _) = graft.sources.StoredIndex.readKvWithGen(spark, idxDir)
      assert(kv("epoch") == "2", s"one rebuild per batch: $kv")
      // the self-maintained relation holds seed + both batches, keyed for
      // idempotent replay
      val vecParts = new java.io.File(vecDir).listFiles()
        .map(_.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
      assert(vecParts == Seq("batch_id=-1", "batch_id=0", "batch_id=1"),
        vecParts.mkString(", "))
      // every ingested vector exactly once in the rebuilt codes relation
      val idx = AnnIndex.load(spark, idxDir)
      assert(idx.codes.count() == 300 &&
        idx.codes.select("vec_id").distinct().count() == 300)
      assert(AnnIndex.fragmentCount(spark, idxDir) == 0,
        "the trailing rebuild folded the last fragment")
      val queries = emb.filter(col("vec_id").isin(3L, 150L, 299L))
      val top1 = AnnIndex.searchTopK(idx, emb, queries, "embedding",
          nprobe = 2, topR = 25, topK = 1)
        .select("qid", "nid").as[(Long, Long)].collect().toMap
      assert(top1.size == 3 &&
        top1.forall { case (qq, n) => qq % clusters == n % clusters },
        s"top1=$top1")
      emb.unpersist()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("streaming curation equals batch curation on fingerprints and quality") {
    implicit val sqlCtx = spark.sqlContext
    // english, long-enough, stopword-rich docs pass the gates; one exact
    // duplicate pair; one French doc and one junk doc get filtered
    val good = "the quick brown fox is jumping over the lazy dog with " +
      "great energy and the morning sun is warm and the grass is green " * 3
    val docs = Seq(
      (1L, good), (2L, good + " unique tail one"), (3L, good), // 1 and 3 collide
      (4L, "le chat est sur la table et les livres sont dans la chambre"),
      (5L, "@@@@ #### $$$$"))
    val mem = MemoryStream[Doc]
    mem.addData(docs.take(2).map((Doc.apply _).tupled))
    mem.addData(docs.drop(2).map((Doc.apply _).tupled))
    val q = StreamOps.curate(mem.toDF(), "doc_id", "text").writeStream
      .format("memory").queryName("curate_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("curate_out")
      .select("fp", "quality").as[(String, Double)].collect().toSet
    val batch = StreamOps.curateKeepFirst(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("fp", "quality").as[(String, Double)].collect().toSet
    // fingerprint/quality sets agree (surviving doc_id per fp is arrival-
    // vs-min-id dependent, so ids are excluded from the comparison)
    assert(streamed == batch && streamed.size == 2, s"streamed=$streamed batch=$batch")
  }

  test("incrementalDedupStream: micro-batches dedup against the stored index and extend it") {
    import graft.ext.NearDup
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val fresh = "fresh streaming document about catalyst planner internals"
    val seed = Seq(Doc(1L, base),
      Doc(3L, "completely unrelated text about spark query engines and planning"))
    // batch 1: 10 near-dups the SEED corpus; 11 is new; 12 near-dups 11
    //          WITHIN the batch (greedy min-id keeps 11)
    // batch 2: 20 near-dups survivor 11 — proving batch-1 survivors entered
    //          the index between triggers; 21 is new
    val b1 = Seq(Doc(10L, base + " now"), Doc(11L, fresh), Doc(12L, fresh + " today"))
    val b2 = Seq(Doc(20L, fresh + " now"),
      Doc(21L, "entirely different content on minhash lsh banding and jaccard"))
    val tmp = java.nio.file.Files.createTempDirectory("stream-dedup").toString
    val (idxDir, outDir, ckptDir) = (s"$tmp/idx", s"$tmp/out", s"$tmp/ckpt")
    try {
      NearDup.NearDupIndex.save(
        NearDup.buildIndex(seed.toDF("doc_id", "text"), "doc_id", "text"), idxDir)
      val mem = MemoryStream[Doc]
      mem.addData(b1)
      val q = StreamOps.incrementalDedupStream(mem.toDF(), "doc_id", "text",
        idxDir, outDir, ckptDir, threshold = 0.5)
      q.processAllAvailable()
      mem.addData(b2) // second trigger sees the index EXTENDED by batch 1
      q.processAllAvailable()
      q.stop()
      // survivors: 10 dropped (corpus dup of 1), 12 dropped (batch dup of
      // 11), 20 dropped (dup of survivor 11), 11 and 21 kept
      val survived = spark.read.parquet(outDir)
        .select("doc_id").as[Long].collect().toSet
      assert(survived == Set(11L, 21L), s"survived=$survived")
      // the stored index now holds exactly seed + survivors...
      val finalIdx = NearDup.NearDupIndex.load(spark, idxDir)
      val ids = finalIdx.shingles.select("id").distinct().as[Long].collect().toSet
      assert(ids == Set(1L, 3L, 11L, 21L), s"index ids=$ids")
      // ...and probing it equals probing a fresh index built from that
      // corpus in one shot (the streamed appends are semantically invisible,
      // same invariant d12 pins for batch extendIndex)
      val probe = Seq(Doc(100L, base), Doc(101L, fresh + " maybe")).toDF("doc_id", "text")
      val viaStreamed = NearDup.incrementalNearDupPairs(probe, finalIdx,
          "doc_id", "text", threshold = 0.5, maxBucketSize = 1000)
        .as[(Long, Long, Double)].collect().toSet
      val oneShot = NearDup.buildIndex(
        seed.toDF("doc_id", "text").unionByName(
          (b1 ++ b2).toDF("doc_id", "text").filter(col("doc_id").isin(11L, 21L))),
        "doc_id", "text")
      val viaFresh = NearDup.incrementalNearDupPairs(probe, oneShot,
          "doc_id", "text", threshold = 0.5, maxBucketSize = 1000)
        .as[(Long, Long, Double)].collect().toSet
      assert(viaStreamed == viaFresh && viaStreamed.nonEmpty,
        s"streamed=$viaStreamed fresh=$viaFresh")
      // both new docs found their corpus twins
      assert(viaStreamed.exists { case (n, o, _) => n == 100L && o == 1L })
      assert(viaStreamed.exists { case (n, o, _) => n == 101L && o == 11L })
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("incrementalDedupStream: a batch killed after its writes but before checkpoint commit replays idempotently") {
    import graft.ext.NearDup
    val seed = Seq(Doc(1L, "the quick brown fox jumps over the lazy dog again and again today"),
      Doc(3L, "completely unrelated text about spark query engines and planning"))
    // batch content: 10 dups the corpus, 11 is fresh, 12 dups 11 in-batch
    val b1 = Seq(Doc(10L, seed.head.text + " now"),
      Doc(11L, "fresh streaming document about catalyst planner internals"),
      Doc(12L, "fresh streaming document about catalyst planner internals today"))
    val tmp = java.nio.file.Files.createTempDirectory("stream-replay").toString
    val inDir = s"$tmp/in"
    b1.toDF().write.parquet(inDir)
    val schema = b1.toDF().schema
    def relationSets(idxDir: String, outDir: String) = {
      val idx = NearDup.NearDupIndex.load(spark, idxDir)
      (spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet,
        idx.shingles.select("id", "shingle").as[(Long, Long)].collect().toSeq,
        idx.buckets.select(col("bk.band"), col("bk.bh"),
            array_sort(col("ids"))).as[(Int, Long, Seq[Long])].collect().toSet)
    }
    try {
      // ---- interrupted run: the ops hook throws AFTER the three sink
      // writes, i.e. in the window before Spark commits the batch — the
      // exact at-least-once replay scenario
      NearDup.NearDupIndex.save(
        NearDup.buildIndex(seed.toDF("doc_id", "text"), "doc_id", "text"),
        s"$tmp/idxA")
      @volatile var killed = false
      val qa1 = StreamOps.incrementalDedupStream(
        spark.readStream.schema(schema).parquet(inDir), "doc_id", "text",
        s"$tmp/idxA", s"$tmp/outA", s"$tmp/ckptA", threshold = 0.5,
        onBatchDone = { _ =>
          if (!killed) { killed = true
            throw new RuntimeException("injected crash before checkpoint commit") }
        })
      intercept[Exception] { qa1.processAllAvailable() }
      try qa1.stop() catch { case _: Exception => () }
      assert(killed, "the crash hook never fired")
      // the failed attempt DID write (that's the point) — restart replays it
      val qa2 = StreamOps.incrementalDedupStream(
        spark.readStream.schema(schema).parquet(inDir), "doc_id", "text",
        s"$tmp/idxA", s"$tmp/outA", s"$tmp/ckptA", threshold = 0.5)
      qa2.processAllAvailable()
      qa2.stop()
      // ---- uninterrupted control on fresh dirs
      NearDup.NearDupIndex.save(
        NearDup.buildIndex(seed.toDF("doc_id", "text"), "doc_id", "text"),
        s"$tmp/idxB")
      val qb = StreamOps.incrementalDedupStream(
        spark.readStream.schema(schema).parquet(inDir), "doc_id", "text",
        s"$tmp/idxB", s"$tmp/outB", s"$tmp/ckptB", threshold = 0.5)
      qb.processAllAvailable()
      qb.stop()
      val (outA, shA, bkA) = relationSets(s"$tmp/idxA", s"$tmp/outA")
      val (outB, shB, bkB) = relationSets(s"$tmp/idxB", s"$tmp/outB")
      assert(outA == Set(11L) && outA == outB, s"outA=$outA outB=$outB")
      // no duplicated (id, shingle) rows from the replay — the corruption
      // the old append-mode sinks produced (jaccard denominators inflate)
      assert(shA.size == shA.toSet.size, "replay duplicated shingle rows")
      assert(shA.toSet == shB.toSet)
      assert(bkA == bkB)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("incrementalDedupStream: auto-compaction bounds fragments, swaps epochs, and is semantically invisible") {
    import graft.ext.NearDup
    implicit val sqlCtx = spark.sqlContext
    val seed = Seq(Doc(1L, "the quick brown fox jumps over the lazy dog again and again today"))
    // six batches of mutually-unrelated docs: everything survives, each
    // batch appends one fragment, compactEvery=3 must fire (twice)
    val batches = (0 until 6).map { b =>
      Seq(Doc(100L + b, s"unique subject number $b about topic${b}a topic${b}b " +
        s"topic${b}c topic${b}d topic${b}e topic${b}f topic${b}g topic${b}h"))
    }
    val tmp = java.nio.file.Files.createTempDirectory("stream-compact").toString
    val (idxDir, outDir, ckptDir) = (s"$tmp/idx", s"$tmp/out", s"$tmp/ckpt")
    try {
      NearDup.NearDupIndex.save(
        NearDup.buildIndex(seed.toDF("doc_id", "text"), "doc_id", "text"), idxDir)
      val mem = MemoryStream[Doc]
      val q = StreamOps.incrementalDedupStream(mem.toDF(), "doc_id", "text",
        idxDir, outDir, ckptDir, threshold = 0.5, maxBucketSize = 1000,
        compactEvery = 3)
      val fragHistory = batches.map { b =>
        mem.addData(b)
        q.processAllAvailable()
        NearDup.NearDupIndex.fragmentCount(spark, idxDir)
      }
      q.stop()
      // fragments never exceed the threshold + the batch that trips it,
      // and a compaction actually ran (fragment count came back down)
      assert(fragHistory.max <= 4, s"fragments unbounded: $fragHistory")
      assert(fragHistory.min == 1, s"compaction never folded: $fragHistory")
      val meta = NearDup.NearDupIndex.readMeta(spark, idxDir)
      assert(meta.epoch >= 2 && meta.compactedThrough >= 2L,
        s"expected two epoch swaps, got $meta")
      // every doc survived (mutually unrelated), none lost by compaction
      val survived = spark.read.parquet(outDir)
        .select("doc_id").as[Long].collect().toSet
      assert(survived == (0 until 6).map(100L + _).toSet, s"survived=$survived")
      // semantically invisible: probing the compacted index equals probing
      // a one-shot index over the same corpus
      val corpus = seed.toDF("doc_id", "text")
        .unionByName(batches.flatten.toDF("doc_id", "text"))
      val probe = Seq(Doc(900L, seed.head.text),
        Doc(901L, batches(4).head.text + " maybe")).toDF("doc_id", "text")
      val viaCompacted = NearDup.incrementalNearDupPairs(probe,
          NearDup.NearDupIndex.load(spark, idxDir),
          "doc_id", "text", threshold = 0.5, maxBucketSize = 1000)
        .as[(Long, Long, Double)].collect().toSet
      val viaFresh = NearDup.incrementalNearDupPairs(probe,
          NearDup.buildIndex(corpus, "doc_id", "text"),
          "doc_id", "text", threshold = 0.5, maxBucketSize = 1000)
        .as[(Long, Long, Double)].collect().toSet
      assert(viaCompacted == viaFresh && viaCompacted.nonEmpty,
        s"compacted=$viaCompacted fresh=$viaFresh")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("incrementalDedupStream: cold start from an empty initialized index") {
    import graft.ext.NearDup
    implicit val sqlCtx = spark.sqlContext
    val fresh = "fresh streaming document about catalyst planner internals"
    val other = "entirely different content on minhash lsh banding and jaccard"
    val tmp = java.nio.file.Files.createTempDirectory("stream-cold").toString
    try {
      // document zero: no corpus, no relations — just the meta contract
      NearDup.NearDupIndex.init(spark, s"$tmp/idx")
      val mem = MemoryStream[Doc]
      val q = StreamOps.incrementalDedupStream(mem.toDF(), "doc_id", "text",
        s"$tmp/idx", s"$tmp/out", s"$tmp/ckpt", threshold = 0.5)
      // batch 1 probes the EMPTY index: both docs survive (11 and 12 are
      // unrelated); batch 2 must dedup against batch 1's survivors
      mem.addData(Seq(Doc(11L, fresh), Doc(12L, other)))
      q.processAllAvailable()
      mem.addData(Seq(Doc(20L, fresh + " now"), Doc(21L, "some third topic on parquet footers")))
      q.processAllAvailable()
      q.stop()
      val survived = spark.read.parquet(s"$tmp/out")
        .select("doc_id").as[Long].collect().toSet
      assert(survived == Set(11L, 12L, 21L), s"survived=$survived")
      val ids = NearDup.NearDupIndex.load(spark, s"$tmp/idx")
        .shingles.select("id").distinct().as[Long].collect().toSet
      assert(ids == Set(11L, 12L, 21L), s"index ids=$ids")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("incrementalDedupStream: a fresh checkpoint against an ingested index fails fast") {
    import graft.ext.NearDup
    val tmp = java.nio.file.Files.createTempDirectory("stream-ident").toString
    val inDir = s"$tmp/in"
    val schema = Seq(Doc(0L, "x")).toDF().schema
    def src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    try {
      NearDup.NearDupIndex.init(spark, s"$tmp/idx")
      // first lineage: checkpoint A pins its identity at first append
      Seq(Doc(1L, "fresh streaming document about catalyst planner internals"))
        .toDF().repartition(1).write.mode("append").parquet(inDir)
      val qA = StreamOps.incrementalDedupStream(src, "doc_id", "text",
        s"$tmp/idx", s"$tmp/out", s"$tmp/ckptA", threshold = 0.5)
      qA.processAllAvailable()
      qA.stop()
      // pinned in filesystem-qualified form (scheme-prefixed)
      assert(NearDup.NearDupIndex.readMeta(spark, s"$tmp/idx").streamId
        .endsWith(s"$tmp/ckptA"))
      // second lineage: a FRESH checkpoint recycles batch ids from 0 (it
      // re-reads the same input from scratch) — the old code silently
      // skipped/overwrote; now the first batch fails loudly
      val qB = StreamOps.incrementalDedupStream(src, "doc_id", "text",
        s"$tmp/idx", s"$tmp/out", s"$tmp/ckptB", threshold = 0.5)
      val err = intercept[Exception] { qB.processAllAvailable() }
      try qB.stop() catch { case _: Exception => () }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(err).exists(_.contains("checkpoint")), messages(err).mkString("; "))
      // and the index was not touched by the refused lineage
      val ids = NearDup.NearDupIndex.load(spark, s"$tmp/idx")
        .shingles.select("id").distinct().as[Long].collect().toSet
      assert(ids == Set(1L), s"refused lineage mutated the index: $ids")
      // the ORIGINAL checkpoint keeps working after the refusal
      Seq(Doc(3L, "some third topic on parquet footers and row groups"))
        .toDF().repartition(1).write.mode("append").parquet(inDir)
      val qC = StreamOps.incrementalDedupStream(src, "doc_id", "text",
        s"$tmp/idx", s"$tmp/out", s"$tmp/ckptA", threshold = 0.5)
      qC.processAllAvailable()
      qC.stop()
      val ids2 = NearDup.NearDupIndex.load(spark, s"$tmp/idx")
        .shingles.select("id").distinct().as[Long].collect().toSet
      assert(ids2 == Set(1L, 3L), s"ids=$ids2")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("incrementalDedupStream: 26-batch soak with replays and a concurrent reader stays bounded and correct") {
    import graft.ext.NearDup
    val tmp = java.nio.file.Files.createTempDirectory("stream-soak").toString
    val (idxDir, outDir, ckptDir, inDir) = (s"$tmp/idx", s"$tmp/out", s"$tmp/ckpt", s"$tmp/in")
    def doc(i: Int) = Doc(1000L + i,
      s"unique soak subject $i covering topic${i}a topic${i}b topic${i}c " +
      s"topic${i}d topic${i}e topic${i}f topic${i}g topic${i}h")
    val schema = Seq(doc(0)).toDF().schema
    // two injected crashes (after writes, before checkpoint commit) force
    // interleaved at-least-once replays mid-soak
    val crashAt = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    crashAt.add(7L); crashAt.add(15L)
    def start() = StreamOps.incrementalDedupStream(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(inDir),
      "doc_id", "text", idxDir, outDir, ckptDir, threshold = 0.5,
      maxBucketSize = 1000, compactEvery = 4,
      onBatchDone = { id =>
        if (crashAt.remove(id))
          throw new RuntimeException("injected crash before checkpoint commit")
      })
    try {
      NearDup.NearDupIndex.init(spark, idxDir)
      new java.io.File(inDir).mkdirs() // the source demands an existing dir
      var q = start()
      var fragMax = 0
      var graceReader: Option[org.apache.spark.sql.DataFrame] = None
      var graceEpoch = -1
      var graceVerified = false
      for (i <- 0 until 26) {
        Seq(doc(i)).toDF().repartition(1).write.mode("append").parquet(inDir)
        try q.processAllAvailable()
        catch { case _: Exception =>
          try q.stop() catch { case _: Exception => () }
          q = start() // restart from the same checkpoint: replay
          q.processAllAvailable()
        }
        fragMax = math.max(fragMax, NearDup.NearDupIndex.fragmentCount(spark, idxDir))
        val epoch = NearDup.NearDupIndex.readMeta(spark, idxDir).epoch
        if (i == 10) { // a long-running batch reader loads mid-soak...
          graceReader = Some(NearDup.NearDupIndex.load(spark, idxDir).shingles)
          graceEpoch = epoch
        }
        // ...and must still collect after the NEXT compaction (grace sweep)
        if (!graceVerified && graceReader.isDefined && epoch == graceEpoch + 1) {
          assert(graceReader.get.count() > 0,
            "mid-soak reader failed within its grace window")
          graceVerified = true
        }
      }
      q.stop()
      assert(crashAt.isEmpty, "an injected crash never fired")
      assert(graceVerified, "the soak never exercised the grace window")
      // fragments bounded throughout: never past compactEvery + the batch
      // that trips the threshold
      assert(fragMax <= 5, s"fragment count unbounded: $fragMax")
      assert(NearDup.NearDupIndex.readMeta(spark, idxDir).epoch >= 4)
      // every unique doc survived exactly once (replays overwrote, never
      // duplicated)
      val out = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSeq
      assert(out.sorted == (0 until 26).map(1000L + _).toSeq, s"out=${out.sorted}")
      // probe equality vs a one-shot build over the same corpus
      val corpus = (0 until 26).map(doc).toDF()
      val probe = Seq(Doc(5000L, doc(13).text + " maybe"),
        Doc(5001L, doc(24).text)).toDF("doc_id", "text")
      val viaSoaked = NearDup.incrementalNearDupPairs(probe,
          NearDup.NearDupIndex.load(spark, idxDir),
          "doc_id", "text", threshold = 0.5, maxBucketSize = 1000)
        .as[(Long, Long, Double)].collect().toSet
      val viaFresh = NearDup.incrementalNearDupPairs(probe,
          NearDup.buildIndex(corpus, "doc_id", "text"),
          "doc_id", "text", threshold = 0.5, maxBucketSize = 1000)
        .as[(Long, Long, Double)].collect().toSet
      assert(viaSoaked == viaFresh && viaSoaked.nonEmpty,
        s"soaked=$viaSoaked fresh=$viaFresh")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("incrementalDedupStream: an unrelated cached frame survives a trigger") {
    import graft.ext.NearDup
    implicit val sqlCtx = spark.sqlContext
    val seed = Seq(Doc(1L, "the quick brown fox jumps over the lazy dog again and again today"))
    val tmp = java.nio.file.Files.createTempDirectory("stream-cache").toString
    try {
      NearDup.NearDupIndex.save(
        NearDup.buildIndex(seed.toDF("doc_id", "text"), "doc_id", "text"),
        s"$tmp/idx")
      // an interleaved batch job's cached relation (the docstring-supported
      // pattern the old session-wide clearCache() silently broke)
      val unrelated = spark.range(1000).toDF("n").cache()
      unrelated.count()
      assert(unrelated.storageLevel.useMemory)
      val mem = MemoryStream[Doc]
      val q = StreamOps.incrementalDedupStream(mem.toDF(), "doc_id", "text",
        s"$tmp/idx", s"$tmp/out", s"$tmp/ckpt", threshold = 0.5)
      mem.addData(Seq(Doc(10L, "some new content entirely distinct from anything")))
      q.processAllAvailable()
      q.stop()
      assert(unrelated.storageLevel.useMemory,
        "the trigger evicted an unrelated cached frame")
      unrelated.unpersist()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("domainQuotaStream: cross-batch admission equals one window over " +
      "the concatenated (batch, draw) order") {
    import graft.operators.QuotaView
    implicit val sqlCtx = spark.sqlContext
    val cap = 2
    // domain a fills its cap in batch 1 (3 candidates for 2 slots);
    // b and the null stratum each carry residual budget into batch 2
    val b1 = Seq(QDoc(1L, "a"), QDoc(2L, "a"), QDoc(3L, "a"),
      QDoc(4L, "b"), QDoc(5L, null))
    val b2 = Seq(QDoc(6L, "a"), QDoc(7L, "a"),
      QDoc(8L, "b"), QDoc(9L, "b"), QDoc(10L, null), QDoc(11L, null))
    val tmp = java.nio.file.Files.createTempDirectory("quota-view-stream").toString
    try {
      val mem = MemoryStream[QDoc]
      mem.addData(b1)
      val q = StreamOps.domainQuotaStream(mem.toDF(), "doc_id", "domain",
        s"$tmp/qv", s"$tmp/ckpt", cap = cap, compactEvery = 1)
      q.processAllAvailable()
      mem.addData(b2)
      q.processAllAvailable()
      q.stop()
      val got = QuotaView.read(spark, s"$tmp/qv")
        .as[(Long, Option[String])].collect().toSet
      // reference: ONE window over the union in (batch, default-draw) order
      val union = b1.map(d => (d.doc_id, Option(d.domain), 0)) ++
        b2.map(d => (d.doc_id, Option(d.domain), 1))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("domain"))
        .orderBy(col("batch"), xxhash64(col("doc_id")), col("doc_id"))
      val want = union.toDF("doc_id", "domain", "batch")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= cap)
        .as[(Long, Option[String], Int, Int)].collect()
        .map(r => (r._1, r._2)).toSet
      assert(got == want, s"got=$got want=$want")
      // the cap binds per stratum, nulls quota together, and domain a
      // admits NOTHING from batch 2 (budget exhausted in batch 1)
      assert(got.count(_._2.contains("a")) == cap)
      assert(got.count(_._2.isEmpty) == cap)
      assert(!got.exists(p => p._2.contains("a") && p._1 >= 6L))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("tokenQuotaStream: cross-batch budget admission equals one " +
      "running-weight window over the concatenated (batch, draw) order") {
    import graft.operators.QuotaView
    implicit val sqlCtx = spark.sqlContext
    val budget = 10L
    // domain a OVERSHOOTS in batch 1: draw order admits 6, rejects the
    // 7-token row at 6 spent (4 tokens unfilled). The one-window law then
    // rejects EVERYTHING later in a (its running sum is already past the
    // budget) — the case kept-only accounting gets wrong, which is
    // exactly why rejected weight rides sentinel rows. b carries real
    // residual budget; the null stratum quotas together.
    val b1 = Seq(QTok(1L, "a", 6L), QTok(2L, "a", 7L),
      QTok(3L, "b", 4L), QTok(4L, null, 5L))
    val b2 = Seq(QTok(5L, "a", 3L), QTok(6L, "b", 5L), QTok(7L, "b", 9L),
      QTok(8L, null, 4L), QTok(9L, null, 9L))
    val tmp = java.nio.file.Files.createTempDirectory("token-quota-stream").toString
    try {
      val mem = MemoryStream[QTok]
      mem.addData(b1)
      val q = StreamOps.tokenQuotaStream(mem.toDF(), "doc_id", "domain",
        "n_tok", s"$tmp/qv", s"$tmp/ckpt", budget = budget, compactEvery = 1)
      q.processAllAvailable()
      mem.addData(b2)
      q.processAllAvailable()
      q.stop()
      val got = QuotaView.readWeighted(spark, s"$tmp/qv")
        .as[(Long, Option[String], Long)].collect().toSet
      // reference: ONE running-weight window over the union in
      // (batch, default-draw) order
      val union = b1.map(d => (d.doc_id, Option(d.domain), d.n_tok, 0)) ++
        b2.map(d => (d.doc_id, Option(d.domain), d.n_tok, 1))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("domain"))
        .orderBy(col("batch"), xxhash64(col("doc_id")), col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val want = union.toDF("doc_id", "domain", "n_tok", "batch")
        .withColumn("c", sum(col("n_tok")).over(w))
        .filter(col("c") <= budget)
        .as[(Long, Option[String], Long, Int, Long)].collect()
        .map(r => (r._1, r._2, r._3)).toSet
      assert(got == want, s"got=$got want=$want")
      // the overshoot law concretely: whichever single a-row the draw
      // admitted in batch 1, the a stratum admits NOTHING in batch 2 even
      // though its kept weight is under budget
      assert(got.count(_._2.contains("a")) == 1)
      assert(!got.exists(p => p._2.contains("a") && p._1 == 5L),
        "batch-2 'a' row admitted: seen-weight accounting regressed to kept-only")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("mixtureQuotaStream: budget-relation admission equals one " +
      "running-weight window + budget join over the concatenated order") {
    import graft.operators.QuotaView
    implicit val sqlCtx = spark.sqlContext
    val budgets = Seq(("a", 10L), ("b", 100L)).toDF("domain", "budget")
    val b1 = Seq(QTok(1L, "a", 6L), QTok(2L, "a", 7L),
      QTok(3L, "b", 40L), QTok(4L, "c", 999L))
    val b2 = Seq(QTok(5L, "a", 1L), QTok(6L, "b", 50L), QTok(7L, "b", 30L),
      QTok(8L, "c", 999L))
    val tmp = java.nio.file.Files.createTempDirectory("mixture-quota-stream").toString
    try {
      val mem = MemoryStream[QTok]
      mem.addData(b1)
      val q = StreamOps.mixtureQuotaStream(mem.toDF(), "doc_id", "domain",
        "n_tok", budgets, s"$tmp/qv", s"$tmp/ckpt", compactEvery = 1)
      q.processAllAvailable()
      mem.addData(b2)
      q.processAllAvailable()
      q.stop()
      val got = QuotaView.readWeighted(spark, s"$tmp/qv")
        .as[(Long, Option[String], Long)].collect().toSet
      val union = b1.map(d => (d.doc_id, Option(d.domain), d.n_tok, 0)) ++
        b2.map(d => (d.doc_id, Option(d.domain), d.n_tok, 1))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("domain"))
        .orderBy(col("batch"), xxhash64(col("doc_id")), col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val want = union.toDF("doc_id", "domain", "n_tok", "batch")
        .withColumn("c", sum(col("n_tok")).over(w))
        .join(budgets.withColumnRenamed("domain", "bd"),
          col("domain") === col("bd"), "left")
        .filter(col("budget").isNull || col("c") <= col("budget"))
        .as[(Long, Option[String], Long, Int, Long, Option[String], Option[Long])]
        .collect().map(r => (r._1, r._2, r._3)).toSet
      assert(got == want, s"got=$got want=$want")
      // c (absent from the budget relation) is kept whole across batches
      assert(got.count(_._2.contains("c")) == 2)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("classifierQualityStream: cross-batch confusion marginals sum; " +
      "view equals the one-shot evaluation") {
    import graft.operators.{ClassifierQualityView, HashedLinearScorer}
    implicit val sqlCtx = spark.sqlContext
    // fixed crafted gate (the store contract: weights are part of its
    // identity): positive weight everywhere -> keep any non-empty doc
    // UNLESS its tokens hash to the one negative bucket; gold = contains
    // 'good'. Slice = doc_id parity so each slice receives rows from
    // BOTH batches and the per-slice counts must interleave.
    val den = 1000L
    val weights = Array.tabulate(8)(b => if (b == 0) -100L else 10L)
    val wi = HashedLinearScorer.literalWeightInt(weights) _
    val slice = (col("doc_id") % 2).cast("string")
    val gold = col("text").contains("good")
    val b1 = Seq(Doc(1L, "good stuff here"), Doc(2L, "bad noise"),
      Doc(3L, "good again"), Doc(4L, "   "))
    val b2 = Seq(Doc(5L, "more good text"), Doc(6L, "junk"),
      Doc(7L, "good"), Doc(8L, "meh"))
    val tmp = java.nio.file.Files.createTempDirectory("quality-view-stream").toString
    try {
      val mem = MemoryStream[Doc]
      mem.addData(b1)
      val q = StreamOps.classifierQualityStream(mem.toDF(), "doc_id", "text",
        slice, gold, buckets = 8, weightInt = wi, den = den,
        statsDir = s"$tmp/qv", checkpointDir = s"$tmp/ckpt",
        compactEvery = 1)
      q.processAllAvailable()
      mem.addData(b2)
      q.processAllAvailable()
      q.stop()
      val got = ClassifierQualityView.read(spark, s"$tmp/qv")
        .orderBy("slice").collect().toSeq
      // one-shot: marginals of the WHOLE corpus in one batch, same read
      val all = (b1 ++ b2).toDF()
      ClassifierQualityView.init(spark, s"$tmp/direct")
      graft.sources.AdditiveStats.append(
        ClassifierQualityView.marginals(all, "doc_id", "text", slice, gold,
          buckets = 8, weightInt = wi, den = den),
        ClassifierQualityView.store(s"$tmp/direct"), 0L)
      val want = ClassifierQualityView.read(spark, s"$tmp/direct")
        .orderBy("slice").collect().toSeq
      assert(got == want, s"got=$got want=$want")
      // the empty doc (id 4) is unserveable -> excluded on both paths
      assert(got.map(_.getLong(1)).sum == 7L,
        s"7 serveable docs expected, got $got")
      // each slice interleaves rows from both batches
      assert(got.size == 2 && got.forall(_.getLong(1) >= 3L), got.toString)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("CrawlIngest.curated resolves a changed-content refetch to ONE row " +
    "(largest extraction wins) and bills the domain quota once") {
    import graft.operators.CrawlIngest
    // doc 1 was refetched and its extraction CHANGED (same doc_id, same
    // canonical URL, different text/n_words) — the r20 advice case: the
    // old distinct-then-join finalize shipped BOTH rows, double-billing
    // a.com's quota and emitting conflicting n_words for one doc_id
    val survivors = Seq(
      (1L, "https://a.com/p1", "a.com", "https://a.com/p1", "old text", 25L),
      (1L, "https://a.com/p1", "a.com", "https://a.com/p1", "new longer", 40L),
      (2L, "https://a.com/p2", "a.com", "https://a.com/p2", "t2", 30L),
      (3L, "https://b.net/p3", "b.net", "https://b.net/p3", "t3", 30L)
    ).toDF("doc_id", "url", "domain", "canon_url", "text", "n_words")
    val out = CrawlIngest.curated(survivors,
        Seq.empty[String].toDF("domain"), cap = 2)
      .select("doc_id", "domain", "n_words")
      .as[(Long, String, Long)].collect().toSeq
    assert(out.map(_._1).sorted == Seq(1L, 2L, 3L), out.toString) // one row per doc
    assert(out.find(_._1 == 1L).get._3 == 40L, // deterministic: max n_words
      out.toString)
    assert(out.count(_._2 == "a.com") == 2, // quota billed once per doc
      out.toString)
  }

  test("crawlIngestStream: binaryFile micro-batches run the compliant chain per " +
    "trigger, every sink accumulates, the read-time cut equals the one-shot " +
    "chain across a mid-stream fold, and a fresh checkpoint is refused") {
    import graft.operators.{CrawlIngest, Datacard, LineDedup, QuotaView}
    import graft.functions.UrlFunctions
    import graft.ext.NearDup
    import graft.sources.WarcSource
    def para(seed: String, n: Int) =
      (1 to n).map(i => s"the $seed$i and").mkString(" ")
    val ndBase = para("base", 10) // 30 words shared by the near-dup pair
    val sharedTxt = para("shared", 8) // identical in docs 6 and 7
    def html(doc: Long, text: String, noindex: Boolean = false) =
      s"<html><head><title>Doc $doc</title>" +
        (if (noindex) "<meta name=\"robots\" content=\"noindex\">" else "") +
        s"</head><body><p>$text</p></body></html>"
    // (doc, url, text, noindex) — three installments exercising every gate
    val b0 = Seq(
      (1L, "https://a.com/keep/1", para("one", 8), false),
      (2L, "https://a.com/private/2", para("two", 8), false), // robots
      (3L, "https://a.com/keep/3", para("three", 8), true),   // noindex
      (10L, "https://norobots.net/p10", ndBase + " extra", false))
    val b1 = Seq(
      (5L, "https://a.com/keep/1?utm_source=x", para("one", 8), false), // canon dup of 1
      (6L, "https://a.com/keep/6", sharedTxt, false),
      (9L, "https://blocked.org/x", para("nine", 8), false),  // blocklist
      (20L, "https://norobots.net/p20", ndBase + " nova", false)) // near-dup of 10
    val b2 = Seq(
      (4L, "https://a.com/keep/4", para("four", 2), false),   // 6 words < 20
      (7L, "https://a.com/keep/7", sharedTxt, false),         // near-dup of 6
      (8L, "https://a.com/keep/8", para("eight", 8), false))
    val robotsDf = Seq(("a.com",
      "user-agent: graftbot\ndisallow: /private/\n")).toDF("domain", "robots_txt")
    val blockDf = Seq("blocked.org").toDF("domain")
    val domainOf = (u: org.apache.spark.sql.Column) =>
      UrlFunctions.registeredDomain(UrlFunctions.hostOf(u),
        Seq("com", "net", "org"))
    val idOf = (h: org.apache.spark.sql.Column) =>
      regexp_extract(h, "<title>Doc ([0-9]+)</title>", 1).cast("long")
    val tmp = java.nio.file.Files.createTempDirectory("crawl-stream").toString
    val crawlDir = s"$tmp/crawl"
    new java.io.File(crawlDir).mkdirs()
    def writeSegment(name: String, pages: Seq[(Long, String, String, Boolean)]): Unit = {
      val member = pages.map { case (d, u, t, ni) =>
        WarcSource.responseRecordString(u, "2026-08-01T00:00:00Z", html(d, t, ni))
      }.mkString
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$crawlDir/$name"), member.getBytes("UTF-8"))
    }
    def startStream(ckpt: String) =
      StreamOps.crawlIngestStream(
        StreamOps.readFileStream(spark, crawlDir, maxFilesPerTrigger = 1),
        agent = "graftbot", robotsDf = robotsDf, domainOf = domainOf,
        idOf = idOf, minWords = 20,
        storeDir = s"$tmp/corpus", checkpointDir = ckpt, compactEvery = 1,
        lineStatsDir = Some(s"$tmp/lines"),
        datacardDir = Some(s"$tmp/card"),
        quota = Some((s"$tmp/quota", 2)),
        dedupIndex = Some((s"$tmp/idx", s"$tmp/out", 0.5)))
    try {
      NearDup.NearDupIndex.init(spark, s"$tmp/idx")
      writeSegment("segment-0.warc", b0)
      val q = startStream(s"$tmp/ckpt")
      q.processAllAvailable()
      writeSegment("segment-1.warc", b1)
      q.processAllAvailable()
      writeSegment("segment-2.warc", b2)
      q.processAllAvailable()
      q.stop()
      // the corpus store folded mid-stream (compactEvery = 1): batch 2's
      // fragment sits on top of a folded epoch, so the reads below cross both
      import graft.sources.StoredIndex
      val (kv, _) = StoredIndex.readKvWithGen(spark, s"$tmp/corpus")
      assert(kv("epoch").toInt >= 1, kv.toString)
      assert(CrawlIngest.fragmentCount(spark, s"$tmp/corpus") == 1, "b2 fragment live")
      // THE differential: read-time cut over the accumulated store equals
      // the one-shot q76-style chain over all pages at once
      val allRecs = WarcSource.good(WarcSource.read(spark, crawlDir))
        .select(col("target_uri").as("url"),
          decode(col("body"), "UTF-8").as("__html"))
        .withColumn("domain", domainOf(col("url")))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_id", "domain", "canon_url", "n_words")
          .as[(Long, String, String, Long)].collect().toSet
      val streamed = rows(CrawlIngest.curated(
        CrawlIngest.read(spark, s"$tmp/corpus"), blockDf, cap = 2))
      val oneShot = rows(CrawlIngest.curated(
        CrawlIngest.curateBatch(allRecs, robotsDf, "graftbot", idOf, 20),
        blockDf, cap = 2))
      assert(streamed == oneShot, s"streamed=$streamed oneShot=$oneShot")
      val ids = streamed.map(_._1)
      assert(!ids.exists(Set(2L, 3L, 4L, 9L, 5L)), s"gated doc leaked: $ids")
      assert(ids.count(_ => true) == 4 && Set(10L, 20L).subsetOf(ids), ids.toString)
      assert(streamed.count(_._2 == "a.com") == 2, "a.com quota respected")
      // canonical dedup keeps the SMALLEST doc id (1 over its utm twin 5) —
      // visible with the quota out of the way
      val unquotad = rows(CrawlIngest.curated(
        CrawlIngest.read(spark, s"$tmp/corpus"), blockDf, cap = 100)).map(_._1)
      assert(unquotad.contains(1L) && !unquotad.contains(5L), unquotad.toString)
      // line stats summed ACROSS batches: the shared line is 1+1 = 2 docs
      val sharedDocs = LineDedup.readStats(spark, s"$tmp/lines")
        .filter(col("line_norm") === sharedTxt.toLowerCase)
        .agg(coalesce(sum("n_docs"), lit(0L))).as[Long].head()
      assert(sharedDocs == 2L, s"cross-batch line count $sharedDocs")
      // datacard sees the extracted corpus (stopword-heavy text IDs as en)
      val card = Datacard.card(spark, s"$tmp/card")
        .select("lang").as[String].collect().toSeq
      assert(card.contains("en"), card.toString)
      // greedy quota view: at most 2 admitted per domain
      val admitted = QuotaView.read(spark, s"$tmp/quota")
        .groupBy("domain").count().as[(String, Long)].collect().toMap
      assert(admitted.values.forall(_ <= 2L), admitted.toString)
      // the d11 probe ran per trigger: near-dups of EARLIER batches (and
      // in-corpus twins) never reach the dedup output relation
      val outIds = spark.read.parquet(s"$tmp/out")
        .select("doc_id").as[Long].collect().toSet
      assert(outIds == Set(1L, 10L, 6L, 9L, 8L), outIds.toString)
      // a fresh checkpoint against the ingested stores is refused
      val q2 = startStream(s"$tmp/ckpt2")
      val err = intercept[Exception] { q2.processAllAvailable() }
      try q2.stop() catch { case _: Exception => () }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(err).exists(_.contains("checkpoint")), messages(err).mkString("; "))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }
}
