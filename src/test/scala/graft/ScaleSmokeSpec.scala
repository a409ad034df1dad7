package graft

/** CI gate for the capped-operator skew smoke: the same measurement +
  * 2×-of-linear budget as `graft.ScaleSmoke`'s standalone main, wired into
  * `sbt test` so a cap regression (an uncapped bucket going quadratic
  * under a hot key) fails a gate instead of only discoloring a README
  * table.
  *
  * Timing-based, so OPT-IN: runs only with `SPARK_GRAFT_SMOKE=1` (and an
  * optional `SPARK_GRAFT_SMOKE_SF_DIR`, default sf0.1 — the scale whose
  * noise floor the 2× budget was calibrated on). Canceled (not passed)
  * otherwise, so a plain `sbt test` stays fast and deterministic.
  *
  *   SPARK_GRAFT_SMOKE=1 sbt "testOnly graft.ScaleSmokeSpec"
  */
class ScaleSmokeSpec extends SparkSpec {

  test("connected components at 10x with reliable checkpoints: log-bounded rounds, data on disk") {
    assume(sys.env.get("SPARK_GRAFT_SMOKE").contains("1"),
      "opt-in: set SPARK_GRAFT_SMOKE=1 to run the skew smoke gate")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.1")
    val ckpt = java.nio.file.Files.createTempDirectory("cc-ckpt-10x").toString
    spark.sparkContext.setCheckpointDir(ckpt)
    try {
      // the full 10x dedup story under the injected hot key, durability on.
      // Cadence 2, not the production-guidance 3: pointer jumping collapses
      // this corpus in TWO rounds (measured — that's the point of the log
      // bound), and a k that no round index divides never fires, which is
      // correct behavior for short jobs but would leave the durability path
      // unexercised here. NearDupSpec pins the every-k cadence semantics;
      // this test pins that the reliable path works on the 10x corpus.
      val docsBig = ScaleSmoke.docs10x(spark, sfDir, copies = 10, hotDocs = 3000).cache()
      val pairs = ext.NearDup.nearDuplicatePairs(docsBig, "doc_id", "text", 0.7)
        .select("id_a", "id_b")
      val reliableEvery = 2
      val (labels, rounds) =
        ext.NearDup.connectedComponentsWithRounds(pairs, reliableEvery = reliableEvery)
      val n = labels.count()
      docsBig.unpersist()
      assert(n > 0)
      // pointer jumping converges in O(log d) ≤ O(log n) rounds; allow +2
      // slack for the propagate warm-up and the convergence-detect round
      val logBound = 64 - java.lang.Long.numberOfLeadingZeros(n) + 2
      info(f"cc-10x: $n%d labeled nodes in $rounds%d rounds (log bound $logBound%d)")
      assert(rounds <= logBound,
        s"CC took $rounds rounds for $n nodes — pointer jumping should stay <= $logBound")
      // the reliable path actually wrote checkpoint data (guaranteed to have
      // fired: some round index in [1, rounds] is divisible by the cadence)
      assert(rounds >= reliableEvery,
        s"corpus converged in $rounds rounds — cadence $reliableEvery never fired; lower it")
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "reliableEvery must route rounds through checkpoint()")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  test("indexed incremental dedup: per-batch time stays flat as the corpus grows 10x") {
    assume(sys.env.get("SPARK_GRAFT_SMOKE").contains("1"),
      "opt-in: set SPARK_GRAFT_SMOKE=1 to run the skew smoke gate")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.1")
    // the O(batch) contract in wall-clock form: same batch, 1x vs 10x
    // corpus index — if the corpus side shuffled per batch (the round-5
    // finding), the 10x probe would run ~10x longer; the broadcast-semi
    // pruned plan pays only map-side scan growth. Budget: 2x of the 1x
    // probe (with a 1 s floor so sub-second noise can't flip the gate),
    // against a 10x data growth — a linear regression would blow straight
    // past it.
    val (t1, t10, rows1, rows10) = ScaleSmoke.indexedBatchSection(spark, sfDir)
    info(f"indexed-batch probe: 1x=$t1%6.2fs 10x-corpus=$t10%6.2fs " +
      f"rows=$rows1%d/$rows10%d flat-ratio=${t10 / math.max(t1, 1.0)}%5.2fx")
    assert(rows1 > 0 && rows10 > 0, "probe found no pairs — fixture broken")
    assert(t10 <= 2.0 * math.max(t1, 1.0),
      f"per-batch time grew with the corpus: 1x=$t1%.2fs 10x=$t10%.2fs — " +
        "the corpus side is being shuffled per batch again")
  }

  test("connected components on a deep chain: rounds stay logarithmic in the diameter") {
    assume(sys.env.get("SPARK_GRAFT_SMOKE").contains("1"),
      "opt-in: set SPARK_GRAFT_SMOKE=1 to run the skew smoke gate")
    // adversarial shape for pointer jumping: a single path of length 10^4
    // (the 10x corpus smoke converges in 2 rounds — its components are
    // shallow; this one is all depth). Naive min-propagation needs 10^4
    // rounds; propagate+jump must collapse it in ~log2(10^4) ≈ 13.3.
    // Reliable checkpoints every 3rd round: lineage must not accumulate
    // across the ~14 iterations (each round re-plans from the previous
    // round's materialization, so a lineage leak would show up here as
    // quadratic planning time or a stack overflow, and the checkpoint dir
    // must actually receive data).
    val n = 10000L
    val ckpt = java.nio.file.Files.createTempDirectory("cc-chain-ckpt").toString
    spark.sparkContext.setCheckpointDir(ckpt)
    try {
      import spark.implicits._
      val edges = spark.range(n - 1)
        .select(org.apache.spark.sql.functions.col("id").as("id_a"),
          (org.apache.spark.sql.functions.col("id") + 1).as("id_b"))
      val t0 = System.nanoTime()
      val (labels, rounds) =
        ext.NearDup.connectedComponentsWithRounds(edges, reliableEvery = 3)
      val wrong = labels.filter(org.apache.spark.sql.functions.col("comp") =!= 0L).count()
      val total = labels.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val logBound = (math.log(n.toDouble) / math.log(2)).ceil.toInt + 3
      info(f"cc-chain: $total%d nodes, diameter ${n - 1}%d, $rounds%d rounds " +
        f"(log bound $logBound%d), $secs%.1fs")
      assert(total == n && wrong == 0, s"mislabeled $wrong of $total chain nodes")
      assert(rounds <= logBound,
        s"CC took $rounds rounds on a depth-${n - 1} chain — pointer jumping " +
          s"should stay <= $logBound (log2 diameter + slack)")
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "reliableEvery=3 must route rounds through checkpoint()")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  test("partition-pruned index probe reads a fraction of the unpruned bytes") {
    assume(sys.env.get("SPARK_GRAFT_SMOKE").contains("1"),
      "opt-in: set SPARK_GRAFT_SMOKE=1 to run the skew smoke gate")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.1")
    // the layout contract in BYTES: a small batch's probe must scan only
    // its touched layout partitions of the stored 10x index, not the full
    // relations — wall time can't see this on a warm page cache, storage
    // input bytes can. Identical results both ways (pruning is an
    // optimization, never a semantics change).
    val (bytesPruned, bytesUnpruned, rowsEqual) =
      ScaleSmoke.prunedBytesSection(spark, sfDir)
    info(f"pruned=${bytesPruned / 1e6}%8.1fMB unpruned=${bytesUnpruned / 1e6}%8.1fMB " +
      f"ratio=${bytesPruned.toDouble / bytesUnpruned}%5.2f")
    assert(rowsEqual, "pruned and unpruned probes disagree (or found nothing)")
    assert(bytesPruned * 2 <= bytesUnpruned,
      f"partition pruning ineffective: pruned=${bytesPruned}%d unpruned=${bytesUnpruned}%d")
  }

  test("sequence packing scales linearly at 10x (no data-sized single-partition stage)") {
    assume(sys.env.get("SPARK_GRAFT_SMOKE").contains("1"),
      "opt-in: set SPARK_GRAFT_SMOKE=1 to run the skew smoke gate")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.1")
    val copies = 10
    val (t1, t10, rows1, rows10) = ScaleSmoke.packingSection(spark, sfDir, copies)
    val vsLinear = t10 / (t1 * copies)
    info(f"packing: 1x=$t1%6.2fs ${copies}x=$t10%6.2fs rows $rows1%d -> $rows10%d " +
      f"vs-linear=$vsLinear%5.2fx")
    // the salted fixture keeps per-copy token counts identical, so output
    // must be linear in copies (within straddle-boundary noise)
    assert(rows10 >= rows1 * (copies - 1) && rows10 <= rows1 * (copies + 1),
      s"packing output not linear: $rows1 -> $rows10 at ${copies}x")
    assert(vsLinear <= 2.0,
      f"sequence packing went super-linear at ${copies}x: $vsLinear%.2fx " +
        "— did a data-sized single-partition stage sneak back in?")
  }

  test("classifier training scales linearly at 10x (fused O(L) featurization + one moment pass)") {
    assume(sys.env.get("SPARK_GRAFT_SMOKE").contains("1"),
      "opt-in: set SPARK_GRAFT_SMOKE=1 to run the skew smoke gate")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.1")
    val copies = 10
    val (t1, t10) = ScaleSmoke.trainingSection(spark, sfDir, copies)
    val vsLinear = t10 / (t1 * copies)
    info(f"training: 1x=$t1%6.2fs ${copies}x=$t10%6.2fs vs-linear=$vsLinear%5.2fx")
    // the round-13 defect this gates: an interpreted-HOF featurization
    // re-evaluating the normalization chain per character position is
    // O(L^2) per document and cannot stay inside a linear budget
    assert(vsLinear <= 2.0,
      f"classifier training went super-linear at ${copies}x: $vsLinear%.2fx " +
        "— did the featurization regress to the per-position HOF form?")
  }

  test("token-budget quota stays linear at 10x under a hot stratum (80% of rows in one stratum)") {
    assume(sys.env.get("SPARK_GRAFT_SMOKE").contains("1"),
      "opt-in: set SPARK_GRAFT_SMOKE=1 to run the skew smoke gate")
    val copies = 10
    val (t1, t10, rows1, rows10) = ScaleSmoke.quotaSection(spark, 600000, copies)
    val vsLinear = t10 / (t1 * copies)
    info(f"hot-stratum quota: 1x=$t1%6.2fs ${copies}x=$t10%6.2fs " +
      f"kept $rows1%d -> $rows10%d vs-linear=$vsLinear%5.2fx")
    // the round-14 verdict's scale-killer shape: a window partitioned by
    // the stratum alone sorts the 80% mega-stratum in ONE task, so 10x
    // data becomes a 10x SERIAL term; the two-pass form must stay inside
    // the linear budget
    assert(vsLinear <= 2.0,
      f"hot-stratum quota went super-linear at ${copies}x: $vsLinear%.2fx " +
        "— did the admission regress to the stratum-partitioned window?")
  }

  test("continuous token quota stays linear on a hot-stratum MEGA-batch (80% of one batch in one stratum)") {
    assume(sys.env.get("SPARK_GRAFT_SMOKE").contains("1"),
      "opt-in: set SPARK_GRAFT_SMOKE=1 to run the skew smoke gate")
    val copies = 10
    val (t1, t10, rows1, rows10) = ScaleSmoke.quotaBatchSection(spark, 600000, copies)
    val vsLinear = t10 / (t1 * copies)
    info(f"hot-batch quota view: 1x=$t1%6.2fs ${copies}x=$t10%6.2fs " +
      f"admitted $rows1%d -> $rows10%d vs-linear=$vsLinear%5.2fx")
    // the round-15 verdict's What's-wrong #3: QuotaView's within-batch
    // running sum was a stratum-partitioned window, so a single-stratum
    // mega-batch serialized through one task; routed through the gated
    // two-pass core it must stay inside the linear budget
    assert(vsLinear <= 2.0,
      f"hot-stratum mega-batch went super-linear at ${copies}x: $vsLinear%.2fx " +
        "— did the per-batch admission regress to the stratum window?")
  }

  test("streaming ingest soak at 10x: steady per-batch wall time stays flat as the corpus grows") {
    assume(sys.env.get("SPARK_GRAFT_SMOKE").contains("1"),
      "opt-in: set SPARK_GRAFT_SMOKE=1 to run the skew smoke gate")
    // the in-suite 26-batch soak proves the protocol; this proves its
    // SCALE shape: ~400x the data volume (20 batches x 500 docs), one
    // injected crash replay, compaction every 6 fragments. Steady batches
    // (no compaction, no restart) must not slow down as the corpus grows
    // 20x under them — the probe's corpus side is partition-pruned and
    // semi-joined, so per-batch cost is O(batch) + bounded fragment reads.
    val (batches, perBatch) = (20, 500)
    val (rows, outRows) = ScaleSmoke.soakSection(spark, batches, perBatch,
      compactEvery = 6)
    rows.foreach { b =>
      info(f"soak batch ${b.id}%2d ${b.secs}%6.2fs in=${b.inBytes / 1e6}%7.1fMB" +
        (if (b.compacted) " [compact]" else "") +
        (if (b.replayed) " [replay]" else ""))
    }
    assert(outRows == batches.toLong * perBatch,
      s"output rows $outRows — a replay duplicated or lost documents")
    assert(rows.exists(_.replayed), "the injected crash never fired")
    assert(rows.count(_.compacted) >= 2, "the soak never exercised compaction")
    val steady = rows.filterNot(b => b.compacted || b.replayed)
    val half = batches / 2
    def med(xs: Seq[Double]) = { val s = xs.sorted; s(s.size / 2) }
    val early = med(steady.filter(_.id < half).map(_.secs))
    val late = med(steady.filter(_.id >= half).map(_.secs))
    // 0.75 s floor: at this scale a trigger is dominated by fixed
    // scheduling overhead, whose jitter must not flip the gate
    val ratio = late / math.max(early, 0.75)
    val earlyMb = med(steady.filter(_.id < half).map(_.inBytes / 1e6))
    val lateMb = med(steady.filter(_.id >= half).map(_.inBytes / 1e6))
    info(f"steady medians: early=$early%5.2fs/$earlyMb%6.1fMB " +
      f"late=$late%5.2fs/$lateMb%6.1fMB flat-ratio=$ratio%4.2fx")
    assert(ratio <= 2.0,
      f"per-batch wall time grew across the soak: $early%.2fs -> $late%.2fs " +
        f"($ratio%.2fx) — is the corpus side being rescanned per batch?")
    // bytes accounting: the late batches' task input must stay bounded by
    // fragment-count (compaction cadence), not grow with the whole corpus
    assert(lateMb <= 4.0 * math.max(earlyMb, 4.0),
      f"per-batch input bytes grew across the soak: $earlyMb%.1fMB -> $lateMb%.1fMB")
  }

  test("ANN ingest soak: steady per-batch append stays flat while the index grows 20x") {
    assume(sys.env.get("SPARK_GRAFT_SMOKE").contains("1"),
      "opt-in: set SPARK_GRAFT_SMOKE=1 to run the skew smoke gate")
    // the ANN twin of the dedup soak: 20 batches x 2000 vectors against a
    // 2000-vector base index, one injected crash replay, a full retrain
    // every 8 fragments (vectorsDir self-maintained corpus). Steady
    // appends are encode(batch)+partition overwrite+meta CAS — O(batch) —
    // so they must not slow down as the index grows 20x under them;
    // rebuild batches carry the amortized O(corpus) retrain and are
    // excluded, like the dedup soak's compaction batches.
    val (batches, perBatch) = (20, 2000)
    val (rows, codes, distinct, epoch) =
      ScaleSmoke.annIngestSection(spark, batches, perBatch, rebuildEvery = 8)
    rows.foreach { b =>
      info(f"ann batch ${b.id}%2d ${b.secs}%6.2fs in=${b.inBytes / 1e6}%7.1fMB" +
        (if (b.compacted) " [rebuild]" else "") +
        (if (b.replayed) " [replay]" else ""))
    }
    assert(codes == (batches + 1).toLong * perBatch && codes == distinct,
      s"codes=$codes distinct=$distinct — a replay or epoch swap lost or duplicated vectors")
    assert(rows.exists(_.replayed), "the injected crash never fired")
    assert(rows.count(_.compacted) >= 2 && epoch >= 2,
      s"the soak never exercised the retrain cadence (epoch=$epoch)")
    val steady = rows.filterNot(b => b.compacted || b.replayed)
    val half = batches / 2
    def med(xs: Seq[Double]) = { val s = xs.sorted; s(s.size / 2) }
    val early = med(steady.filter(_.id < half).map(_.secs))
    val late = med(steady.filter(_.id >= half).map(_.secs))
    val ratio = late / math.max(early, 0.75)
    info(f"steady medians: early=$early%5.2fs late=$late%5.2fs flat-ratio=$ratio%4.2fx")
    assert(ratio <= 2.0,
      f"per-batch append grew with the index: $early%.2fs -> $late%.2fs " +
        f"($ratio%.2fx) — is something scanning the whole index per append?")
  }

  test("scd2 single-key merge is sub-linear in dimension size (1x/10x/20x trend)") {
    assume(sys.env.get("SPARK_GRAFT_SMOKE").contains("1"),
      "opt-in: set SPARK_GRAFT_SMOKE=1 to run the skew smoke gate")
    // three points so the TREND carries the claim: constant per-pass
    // overhead predicts t20 ~ t10 (flat between 10x and 20x); linear
    // creep would double it. A lone 10x ratio can't tell them apart.
    val Seq(t1, t10, t20) =
      ScaleSmoke.scd2Flat(spark, baseKeys = 40000, multiples = Seq(1, 10, 20))
    info(f"scd2 single-key merge   1x=$t1%6.2fs 10x=$t10%6.2fs 20x=$t20%6.2fs " +
      f"ratios=${t10 / t1}%4.2fx/${t20 / t10}%4.2fx")
    assert(t10 <= t1 * 2.5,
      f"single-key merge must not scale with the dimension: $t1%.2fs -> $t10%.2fs")
    assert(t20 <= t10 * 1.6,
      f"10x->20x must be near-flat (sub-linear claim): $t10%.2fs -> $t20%.2fs" +
        " — constant overhead would hold it flat; this looks like history creep")
  }

  test("join-view single-key append is sub-linear in history size (1x/10x/20x trend)") {
    assume(sys.env.get("SPARK_GRAFT_SMOKE").contains("1"),
      "opt-in: set SPARK_GRAFT_SMOKE=1 to run the skew smoke gate")
    val Seq(t1, t10, t20) =
      ScaleSmoke.joinViewFlat(spark, baseKeys = 40000, multiples = Seq(1, 10, 20))
    info(f"join-view 1-key append  1x=$t1%6.2fs 10x=$t10%6.2fs 20x=$t20%6.2fs " +
      f"ratios=${t10 / t1}%4.2fx/${t20 / t10}%4.2fx")
    assert(t10 <= t1 * 2.5,
      f"single-key append must not scale with the history: $t1%.2fs -> $t10%.2fs" +
        " — is the delta join rescanning unpruned buckets?")
    assert(t20 <= t10 * 1.6,
      f"10x->20x must be near-flat (sub-linear claim): $t10%.2fs -> $t20%.2fs")
  }

  test("z-order rewrite scales linearly at 10x (quantile pass + one range shuffle)") {
    assume(sys.env.get("SPARK_GRAFT_SMOKE").contains("1"),
      "opt-in: set SPARK_GRAFT_SMOKE=1 to run the skew smoke gate")
    val copies = 10
    val (t1, t10, r1, r10) = ScaleSmoke.zorderLinear(spark, baseRows = 200000, copies)
    info(f"zorder rewrite          1x=$t1%6.2fs ${copies}x=$t10%6.2fs rows=$r1%d->$r10%d " +
      f"vs-linear=${t10 / (t1 * copies)}%5.2fx")
    assert(r10 == r1 * copies)
    assert(t10 <= t1 * copies * 2.0,
      f"z-order rewrite went super-linear: $t1%.2fs -> $t10%.2fs at ${copies}x")
  }

  test("capped near-dup/ANN operators stay within 2x of linear under a hot key") {
    assume(sys.env.get("SPARK_GRAFT_SMOKE").contains("1"),
      "opt-in: set SPARK_GRAFT_SMOKE=1 to run the skew smoke gate")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.1")
    val copies = 10
    val results = ScaleSmoke.cappedSection(spark, sfDir, copies)
    assert(results.nonEmpty)
    results.foreach { m =>
      info(f"${m.name}%-22s 1x=${m.tSmall}%6.2fs ${copies}x+hot=${m.tBig}%7.2fs " +
        f"rows=${m.rows}%8d in=${m.inBytesBig / 1e6}%7.1fMB " +
        f"shuf=${m.shufBytesBig / 1e6}%7.1fMB vs-linear=${m.slowdownVsLinear(copies)}%5.2fx")
    }
    val bad = results.filter(_.slowdownVsLinear(copies) > 2.0)
    assert(bad.isEmpty,
      s"super-linear under hot key: ${bad.map(m => s"${m.name}=${m.slowdownVsLinear(copies)}x").mkString(", ")}")
  }
}
