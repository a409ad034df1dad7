package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batch-level laws of the continuous per-stratum quota: replay
  * idempotence (the fragment protocol claim) and accumulated-cap
  * admission across installments.
  */
class QuotaViewSpec extends SparkSpec {
  import spark.implicits._

  test("append replay rewrites the identical fragment; caps accumulate") {
    val tmp = java.nio.file.Files.createTempDirectory("quota-view").toString
    try {
      QuotaView.init(spark, tmp)
      val b0 = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))
        .toDF("doc_id", "domain")
      val first = QuotaView.append(b0, "doc_id", "domain", tmp,
        batchId = 0L, cap = 2).as[(Long, String)].collect().toSet
      assert(first.count(_._2 == "a") == 2 && first.count(_._2 == "b") == 1)
      // at-least-once replay of the SAME batch: prior counts exclude the
      // batch's own fragment, so the recomputed admission is identical
      // and the overwrite is a no-op rewrite
      val replay = QuotaView.append(b0, "doc_id", "domain", tmp,
        batchId = 0L, cap = 2).as[(Long, String)].collect().toSet
      assert(replay == first)
      assert(QuotaView.read(spark, tmp).count() == 3)
      // batch 1: domain a is full (admits 0), b has one slot left
      val b1 = Seq((5L, "a"), (6L, "b"), (7L, "b")).toDF("doc_id", "domain")
      val second = QuotaView.append(b1, "doc_id", "domain", tmp,
        batchId = 1L, cap = 2).as[(Long, String)].collect().toSet
      assert(second.forall(_._2 == "b") && second.size == 1)
      val all = QuotaView.read(spark, tmp).as[(Long, String)].collect()
      assert(all.length == 4)
      assert(all.count(_._2 == "a") == 2 && all.count(_._2 == "b") == 2)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("append accepts non-default id/domain column names (round-15 ADVICE fix)") {
    // the draw window used to reference the caller's column names AFTER
    // the doc_id/domain rename — any non-default names threw an
    // unresolved-column AnalysisException
    val tmp = java.nio.file.Files.createTempDirectory("quota-view-names").toString
    try {
      QuotaView.init(spark, tmp)
      val b = Seq((1L, "a"), (2L, "a"), (3L, "b"))
        .toDF("event_id", "host")
      val got = QuotaView.append(b, "event_id", "host", tmp,
        batchId = 0L, cap = 1).as[(Long, String)].collect().toSet
      assert(got.count(_._2 == "a") == 1 && got.count(_._2 == "b") == 1)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("appendWeighted: seen-weight admission, sentinel accounting, replay idempotence") {
    val tmp = java.nio.file.Files.createTempDirectory("quota-view-w").toString
    try {
      QuotaView.init(spark, tmp)
      // deterministic draw = doc_id so the overshoot is crafted, not
      // hash-dependent: stratum a draws (1: w6, 2: w7) — admits 6,
      // rejects 7 at 6 spent (seen 13 > budget 10)
      val h = Some(col("doc_id"))
      val b0 = Seq((1L, "a", 6L), (2L, "a", 7L), (3L, "b", 4L))
        .toDF("doc_id", "domain", "n_tok")
      val first = QuotaView.appendWeighted(b0, "doc_id", "domain", "n_tok",
        tmp, batchId = 0L, budget = 10L, hash = h)
        .as[(Long, String, Long)].collect().toSet
      assert(first == Set((1L, "a", 6L), (3L, "b", 4L)), first.toString)
      // replay of the SAME batch: prior excludes the batch's own fragment
      // (admitted rows AND its sentinel), so the recomputation is identical
      val replay = QuotaView.appendWeighted(b0, "doc_id", "domain", "n_tok",
        tmp, batchId = 0L, budget = 10L, hash = h)
        .as[(Long, String, Long)].collect().toSet
      assert(replay == first)
      assert(QuotaView.readWeighted(spark, tmp).count() == 2)
      // batch 1: a's SEEN weight is 13 — a 3-token row must NOT admit
      // (the one-window law; kept-only accounting would admit at 6+3);
      // b has 6 real tokens of headroom
      val b1 = Seq((4L, "a", 3L), (5L, "b", 5L)).toDF("doc_id", "domain", "n_tok")
      val second = QuotaView.appendWeighted(b1, "doc_id", "domain", "n_tok",
        tmp, batchId = 1L, budget = 10L, hash = h)
        .as[(Long, String, Long)].collect().toSet
      assert(second == Set((5L, "b", 5L)), second.toString)
      // the view exposes admitted rows only (sentinels filtered)
      val all = QuotaView.readWeighted(spark, tmp)
        .as[(Long, String, Long)].collect().toSet
      assert(all == Set((1L, "a", 6L), (3L, "b", 4L), (5L, "b", 5L)))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("appendWeightedBudgets: per-stratum budgets bind; absent strata kept whole; seen-weight carries") {
    val tmp = java.nio.file.Files.createTempDirectory("quota-view-b").toString
    try {
      QuotaView.init(spark, tmp)
      val h = Some(col("doc_id")) // deterministic draw = id
      val budgets = Seq(("a", 10L), ("b", 100L)).toDF("domain", "budget")
      // a overshoots in batch 0 (6 kept, 7 rejected at 6 spent);
      // b far under budget; c absent from the relation -> unlimited
      val b0 = Seq((1L, "a", 6L), (2L, "a", 7L), (3L, "b", 4L),
        (4L, "c", 999L)).toDF("doc_id", "domain", "n_tok")
      val first = QuotaView.appendWeightedBudgets(b0, "doc_id", "domain",
        "n_tok", tmp, batchId = 0L, budgets = budgets, hash = h)
        .as[(Long, String, Long)].collect().toSet
      assert(first == Set((1L, "a", 6L), (3L, "b", 4L), (4L, "c", 999L)),
        first.toString)
      // batch 1: a's SEEN weight is 13 > 10 -> nothing admits (the
      // one-window law); b admits within its 100; c stays unlimited
      val b1 = Seq((5L, "a", 1L), (6L, "b", 90L), (7L, "b", 10L),
        (8L, "c", 999L)).toDF("doc_id", "domain", "n_tok")
      val second = QuotaView.appendWeightedBudgets(b1, "doc_id", "domain",
        "n_tok", tmp, batchId = 1L, budgets = budgets, hash = h)
        .as[(Long, String, Long)].collect().toSet
      // b: prior seen 4; draw order 6 then 7: 4+90=94 keep, 94+10=104 reject
      assert(second == Set((6L, "b", 90L), (8L, "c", 999L)), second.toString)
      // unlimited strata never emit sentinels: c's stored rows are all real
      val raw = graft.sources.AdditiveStats.read(spark, QuotaView.store(tmp))
      assert(raw.filter(col("doc_id").isNull && col("domain") === "c").count() == 0)
      assert(raw.filter(col("doc_id").isNull && col("domain") === "a").count() > 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }

  test("batch size gate: forced two-pass and window admissions are identical (incl. null strata)") {
    // round 16 (the r15 What's-wrong #3): the within-batch running sum
    // rides Sampling's gated core. Same total order => the admitted set
    // must be bit-identical whichever side of the row gate a batch lands
    // on — proven here by running the SAME batch sequence through two
    // stores with the gate forced each way.
    def runAll(tmp: String): Set[(Long, String, Long)] = {
      QuotaView.init(spark, tmp)
      val b0 = Seq.tabulate(200)(i =>
        (i.toLong, if (i % 5 == 0) null else s"d${i % 7}", 1L + i % 9))
        .toDF("doc_id", "domain", "n_tok")
      val b1 = Seq.tabulate(200)(i =>
        (1000L + i, if (i % 3 == 0) "d1" else s"d${i % 7}", 1L + i % 9))
        .toDF("doc_id", "domain", "n_tok")
      QuotaView.appendWeighted(b0, "doc_id", "domain", "n_tok", tmp,
        batchId = 0L, budget = 40L).count()
      QuotaView.appendWeighted(b1, "doc_id", "domain", "n_tok", tmp,
        batchId = 1L, budget = 40L).count()
      QuotaView.readWeighted(spark, tmp).as[(Long, String, Long)]
        .collect().map { case (id, d, n) => (id, Option(d).getOrElse(""), n) }
        .toSet
    }
    // count form (append): same batches through the accumulated cap
    def runCounts(tmp: String): Set[(Long, String)] = {
      QuotaView.init(spark, tmp)
      val b0 = Seq.tabulate(150)(i =>
        (i.toLong, if (i % 4 == 0) null else s"d${i % 5}"))
        .toDF("doc_id", "domain")
      val b1 = Seq.tabulate(150)(i => (1000L + i, s"d${i % 5}"))
        .toDF("doc_id", "domain")
      QuotaView.append(b0, "doc_id", "domain", tmp, batchId = 0L,
        cap = 25).count()
      QuotaView.append(b1, "doc_id", "domain", tmp, batchId = 1L,
        cap = 25).count()
      QuotaView.read(spark, tmp).as[(Long, String)]
        .collect().map { case (id, d) => (id, Option(d).getOrElse("")) }
        .toSet
    }
    val key = QuotaView.BatchTwoPassMinRowsKey
    val tmpW = java.nio.file.Files.createTempDirectory("quota-gate-w").toString
    val tmpT = java.nio.file.Files.createTempDirectory("quota-gate-t").toString
    val tmpCW = java.nio.file.Files.createTempDirectory("quota-gate-cw").toString
    val tmpCT = java.nio.file.Files.createTempDirectory("quota-gate-ct").toString
    // snapshot FIRST: the session is shared across suites, so only
    // persists that appear DURING this test may be blamed on it (other
    // suites' localCheckpoint blocks linger until RDD GC)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try {
      spark.conf.set(key, Long.MaxValue.toString) // every batch "small"
      val viaWindow = runAll(tmpW)
      val countsWindow = runCounts(tmpCW)
      spark.conf.set(key, "0")                    // every batch two-pass
      val viaTwoPass = runAll(tmpT)
      val countsTwoPass = runCounts(tmpCT)
      assert(viaWindow.nonEmpty && viaWindow == viaTwoPass,
        s"gate changed the admitted set:\n window=$viaWindow\n twopass=$viaTwoPass")
      assert(countsWindow.nonEmpty && countsWindow == countsTwoPass,
        s"gate changed the COUNT-form admitted set:\n window=$countsWindow" +
          s"\n twopass=$countsTwoPass")
      // and the two-pass path leaked nothing OF ITS OWN (the handle is
      // released before append returns; unpersist is async — poll)
      def ours = spark.sparkContext.getPersistentRDDs.keySet -- before
      val deadline = System.nanoTime() + 5e9.toLong
      while (ours.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(ours.isEmpty, s"append leaked persisted relations: $ours")
    } finally {
      spark.conf.unset(key)
      Seq(tmpW, tmpT, tmpCW, tmpCT).foreach(t =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t)))
    }
  }

  test("replay of an already-FOLDED batch short-circuits to the stored admitted set") {
    // the crash window the round-15 ADVICE named: compact() runs inside
    // foreachBatch BEFORE the checkpoint commit, so a crash in between
    // replays a batch whose rows are already inside the batch_id = -1
    // fold. Recomputing would see its own rows in the prior (under-
    // admission); append must instead return batch ∩ store.
    val tmp = java.nio.file.Files.createTempDirectory("quota-view-replay").toString
    val tmpW = java.nio.file.Files.createTempDirectory("quota-view-replay-w").toString
    try {
      QuotaView.init(spark, tmp)
      val b0 = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))
        .toDF("doc_id", "domain")
      val first = QuotaView.append(b0, "doc_id", "domain", tmp,
        batchId = 0L, cap = 2).as[(Long, String)].collect().toSet
      QuotaView.compact(spark, tmp) // folds batch 0; compacted_through = 0
      val replay = QuotaView.append(b0, "doc_id", "domain", tmp,
        batchId = 0L, cap = 2).as[(Long, String)].collect().toSet
      assert(replay == first,
        s"folded replay diverged: first=$first replay=$replay")
      assert(QuotaView.read(spark, tmp).count() == 3) // store unchanged
      // weighted twin: same law, recovered rows carry their weights
      QuotaView.init(spark, tmpW)
      val h = Some(col("doc_id"))
      val w0 = Seq((1L, "a", 6L), (2L, "a", 7L), (3L, "b", 4L))
        .toDF("doc_id", "domain", "n_tok")
      val wFirst = QuotaView.appendWeighted(w0, "doc_id", "domain", "n_tok",
        tmpW, batchId = 0L, budget = 10L, hash = h)
        .as[(Long, String, Long)].collect().toSet
      QuotaView.compact(spark, tmpW)
      val wReplay = QuotaView.appendWeighted(w0, "doc_id", "domain", "n_tok",
        tmpW, batchId = 0L, budget = 10L, hash = h)
        .as[(Long, String, Long)].collect().toSet
      assert(wReplay == wFirst,
        s"folded weighted replay diverged: first=$wFirst replay=$wReplay")
      assert(QuotaView.readWeighted(spark, tmpW).count() == 2)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmpW))
    }
  }
}
