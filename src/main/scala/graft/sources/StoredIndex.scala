package graft.sources

import org.apache.spark.sql.SparkSession

/** Shared storage protocol for PERSISTED indexes — the generation-numbered
  * meta pointer, compare-and-swap publish, epoch-directory layout and
  * grace-period sweep used by both the near-dup LSH index
  * ([[graft.ext.NearDup.NearDupIndex]]) and the ANN index
  * ([[graft.ext.AnnIndex]]). One implementation, two clients — the
  * protocol invariants (fail-fast concurrent writers, crash-benign
  * windows, in-flight readers surviving a swap) are proven once in
  * StoredIndexSpec and inherited by both index specs.
  *
  * THE PROTOCOL. An index directory holds epoch-suffixed relation
  * directories (`name` for epoch 0, `name_e{E}` after) plus a tiny
  * key=value meta file named by a monotonically increasing GENERATION:
  * `dir/meta_g{N}`. Readers resolve the highest generation present;
  * writers publish generation `expectedGen + 1` after verifying the
  * current generation still equals the one they loaded — a
  * compare-and-swap. Every crash window is benign: the previous
  * generation file is still present and complete, so a reader never sees
  * a torn pointer, and relation directories are written BEFORE the meta
  * that references them, so a partially built epoch is never reachable.
  *
  * MUTUAL EXCLUSION is an exclusive-create, not a rename: publishing
  * hard-links the fully-written temp file onto the target name. POSIX
  * link(2) fails atomically with EEXIST if the target exists, so of two
  * same-generation racers exactly one wins — whereas rename(2), which
  * Hadoop's LocalFileSystem delegates to, silently REPLACES an existing
  * destination and would let BOTH racers "succeed" (HDFS rename does
  * fail on an existing destination, but the guarantee must not be
  * filesystem-dependent). On filesystems without hard links the publish
  * falls back to Hadoop rename and inherits its semantics.
  *
  * GRACE SWEEP. A swap keeps the immediately superseded epoch's
  * directories for one full cycle (only epochs at least two swaps old
  * are deleted), so a reader that loaded just before the swap keeps
  * collecting from complete directories until the NEXT swap lands —
  * with sane maintenance cadences, far longer than any batch read.
  */
object StoredIndex {

  /** Thrown when a stored-index writer loses the meta-generation CAS — a
    * second writer (another compaction, another stream, a concurrent
    * save/build) advanced the index while this one was working. The
    * losing writer must reload and retry (streaming: fail the batch and
    * let the replay see fresh state) instead of silently clobbering the
    * other writer's swap.
    */
  final class ConcurrentIndexWriteException(msg: String)
    extends IllegalStateException(msg)

  /** Epoch-suffixed relation directory: bare `name` for epoch 0 so a
    * never-compacted index keeps the obvious layout.
    */
  def relPath(dir: String, name: String, epoch: Int): String =
    if (epoch == 0) s"$dir/$name" else s"$dir/${name}_e$epoch"

  // ------------------------------------------------------------------
  // Shared helpers for the TAGGED-relation clients ([[graft.operators
  // .SplitManifest]], [[graft.operators.Release]]): relations land under
  // generation- AND attempt-tagged directories (`name_e{G}_w{tag}`)
  // BEFORE the CAS meta publish points at them through `rel_gen`/
  // `rel_tag` keys. One implementation — the round-18 SplitManifest
  // hardening (racer-clobber, half-landed writes) must not be
  // re-maintained per client.
  // ------------------------------------------------------------------

  /** `name_e{G}_w{tag}` relation directory of one release attempt. */
  def taggedRelPath(dir: String, name: String, gen: Int,
                    tag: String): String =
    s"$dir/${name}_e${gen}_w$tag"

  /** Current meta generation, or -1 on an uninitialized store —
    * the value a first release passes as `expectedGen`.
    */
  def currentGeneration(spark: SparkSession, dir: String): Int =
    try readKvWithGen(spark, dir)._2
    catch { case _: IllegalArgumentException => -1 }

  /** The live meta's kv, refusing a store of a different `kind` —
    * clients must never resolve relations through some OTHER client's
    * pointer layout.
    */
  def kvOfKind(spark: SparkSession, dir: String,
               kind: String): Map[String, String] = {
    val (kv, _) = readKvWithGen(spark, dir)
    require(kv.get("kind").contains(kind),
      s"$dir is not a $kind store (kind=${kv.get("kind")})")
    kv
  }

  /** Resolve the live release's relation THROUGH the meta's `rel_gen` +
    * `rel_tag` pointers — never a half-landed newer write, never a
    * concurrent loser's attempt. `legacyUntagged = true` lets pre-tag
    * stores (no `rel_tag` key) resolve through the old epoch layout.
    */
  def liveTaggedPath(spark: SparkSession, dir: String, name: String,
                     kind: String, legacyUntagged: Boolean): String = {
    val kv = kvOfKind(spark, dir, kind)
    val gen = kv.getOrElse("rel_gen", "0").toInt
    kv.get("rel_tag") match {
      case Some(tag) if tag.nonEmpty => taggedRelPath(dir, name, gen, tag)
      case _ if legacyUntagged => relPath(dir, name, gen)
      case other =>
        // fail HERE, loudly: building a path with a missing/empty tag
        // would defer the failure to a confusing not-found at read time
        throw new IllegalStateException(
          s"store at $dir has ${if (other.isEmpty) "no" else "an empty"} " +
          s"rel_tag in its meta but legacyUntagged=false — the live " +
          s"'$name' relation cannot be resolved (corrupt or pre-tag meta?)")
    }
  }

  /** Sweep every listed relation directory of a generation below
    * `keepFrom` — tagged or (when `legacyUntagged`) untagged, published
    * or orphaned: a loser/crashed attempt's generation is ≤ the live
    * one, so it ages out the same way. The live and just-superseded
    * generations never match (the one-cycle grace window).
    */
  def sweepTaggedBelow(spark: SparkSession, dir: String,
                       names: Seq[String], keepFrom: Int,
                       legacyUntagged: Boolean): Unit = {
    val alts = names.mkString("|")
    val pattern =
      if (legacyUntagged) s"($alts)(?:_e(\\d+)(?:_w[0-9a-f]+)?)?".r
      else s"($alts)_e(\\d+)_w[0-9a-f]+".r
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries =
      try fs.listStatus(path) catch { case _: java.io.IOException => return }
    entries.iterator.filter(_.isDirectory).foreach { st =>
      st.getPath.getName match {
        case pattern(_, genStr) =>
          val g = if (genStr == null) 0 else genStr.toInt
          if (g < keepFrom)
            try fs.delete(st.getPath, true)
            catch { case _: java.io.IOException => () }
        case _ => ()
      }
    }
  }

  /** kv codec for a (name, fraction) list — shared by the release specs
    * so both clients round-trip identically. Values keep everything
    * after the LAST ':' as the fraction (names may contain ':').
    */
  def encodeFractions(fr: Seq[(String, Double)]): String =
    fr.map { case (n, f) => s"$n:$f" }.mkString(",")

  def decodeFractions(s: String): Seq[(String, Double)] =
    if (s.isEmpty) Nil
    else s.split(",", -1).toSeq.map { p =>
      val i = p.lastIndexOf(':')
      (p.substring(0, i), p.substring(i + 1).toDouble)
    }

  /** kv codec for a comma-joined column list (empty string = Nil). */
  def splitList(s: String): Seq[String] =
    if (s.isEmpty) Nil else s.split(",", -1).toSeq

  private val metaGenPattern = "meta_g(\\d+)".r

  private def fsFor(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Filesystem-qualified form of a path, for identity comparisons:
    * '/a/ckpt', 'file:///a/ckpt' and '/a/ckpt/' are the same lineage — a
    * legitimate respelling on restart must not brick a stream.
    */
  def qualifiedPath(spark: SparkSession, p: String): String = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(hp).toString
  }

  /** Checkpoint-identity guard shared by the continuous-ingest streams:
    * batch ids are only meaningful relative to ONE checkpoint lineage, so
    * the first trigger pins this stream's checkpoint into the meta
    * (`stream_id` key) and every later trigger refuses a mismatch — a
    * restart against a FRESH checkpoint would recycle batch ids from 0 and
    * silently corrupt the replay guards (skip under a compaction watermark,
    * dynamic-overwrite earlier batches' fragments). Re-ingesting a store
    * from scratch = new store dir.
    */
  def pinStreamIdentity(spark: SparkSession, dir: String,
                        checkpointDir: String): Unit = {
    val (kv, gen) = readKvWithGen(spark, dir)
    val ckpt = qualifiedPath(spark, checkpointDir)
    if (kv.getOrElse("stream_id", "").isEmpty)
      writeMetaCas(spark, dir, kv.updated("stream_id", ckpt).toSeq, gen)
    else if (qualifiedPath(spark, kv("stream_id")) != ckpt)
      throw new IllegalStateException(
        s"stored index at $dir was ingested from checkpoint " +
        s"'${kv("stream_id")}' but this query runs from '$checkpointDir' — " +
        "a fresh checkpoint recycles batch ids and would silently corrupt " +
        "the replay guards; use the original checkpoint or a fresh dir")
  }

  /** Highest meta generation under `dir`, or -1 if none exist yet. */
  def metaGeneration(spark: SparkSession, dir: String): Int = {
    val (fs, p) = fsFor(spark, dir)
    if (!fs.exists(p)) -1
    else fs.listStatus(p).foldLeft(-1) { (acc, st) =>
      st.getPath.getName match {
        case metaGenPattern(n) => math.max(acc, n.toInt)
        case _ => acc
      }
    }
  }

  /** Read the live meta as a key→value map plus its generation. A reader
    * that listed generation G can find it swept if TWO writers published
    * between its list and open (the sweep keeps only the previous
    * generation) — re-resolving once lands on a live file.
    */
  def readKvWithGen(spark: SparkSession, dir: String): (Map[String, String], Int) = {
    def attempt(): (Map[String, String], Int) = {
      val gen = metaGeneration(spark, dir)
      require(gen >= 0, s"no index meta at $dir (expected a meta_g{N} file — " +
        "was the index initialized?)")
      val (fs, _) = fsFor(spark, dir)
      val in = fs.open(new org.apache.hadoop.fs.Path(dir, s"meta_g$gen"))
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                 finally in.close()
      val kv = text.linesIterator.filter(_.contains('=')).map { l =>
        val i = l.indexOf('='); (l.substring(0, i), l.substring(i + 1))
      }.toMap
      (kv, gen)
    }
    try attempt()
    catch { case _: java.io.FileNotFoundException => attempt() }
  }

  /** Compare-and-swap meta write: publishes `kv` as generation
    * `expectedGen + 1`, failing with [[ConcurrentIndexWriteException]] if
    * any other writer advanced the meta since `expectedGen` was read.
    * Pass `expectedGen = -1` for the very first write on a fresh dir.
    * Values must be newline-free; keys must be `=`-free. Superseded
    * generation files older than the PREVIOUS one are swept best-effort
    * (the previous is kept so a reader that listed just before the swap
    * still finds a complete file).
    */
  def writeMetaCas(spark: SparkSession, dir: String,
                   kv: Seq[(String, String)], expectedGen: Int): Unit = {
    val (fs, p) = fsFor(spark, dir)
    if (!fs.exists(p)) fs.mkdirs(p)
    val current = metaGeneration(spark, dir)
    if (current != expectedGen)
      throw new ConcurrentIndexWriteException(
        s"stored index at $dir advanced to meta generation $current while " +
        s"this writer held generation $expectedGen — another compaction/" +
        "stream/save is active; reload and retry")
    val next = expectedGen + 1
    val content = kv.map { case (k, v) =>
      require(!k.contains('=') && !v.contains('\n'),
        s"meta key/value not encodable: $k=$v")
      s"$k=$v\n"
    }.mkString
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s".meta_g$next.tmp.${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val target = new org.apache.hadoop.fs.Path(dir, s"meta_g$next")
    // exclusive publish: of two same-generation racers exactly one wins;
    // the loser lands HERE, never on clobbered meta
    if (!publishExclusive(fs, tmp, target)) {
      try fs.delete(tmp, false) catch { case _: java.io.IOException => () }
      throw new ConcurrentIndexWriteException(
        s"stored index at $dir: meta generation $next was published by a " +
        "concurrent writer during this swap; reload and retry")
    }
    try fs.delete(tmp, false) catch { case _: java.io.IOException => () }
    // STALE-CLAIM guard: a writer stalled between the generation check
    // and the publish can find its target gone — published by others and
    // then SWEPT after two further advances — so the exclusive create
    // "succeeds" on a generation that is no longer the frontier, and the
    // caller would believe rows that landed in a superseded epoch were
    // published. Re-listing after the publish catches it. A legitimate
    // win that is merely superseded FAST (another writer reads our kv
    // and publishes next+1 before our re-list) shows live == next+1 and
    // is ACCEPTED: staleness is impossible there, because a stale claim
    // requires meta_g{next} to have been swept before our create, and
    // the sweep of generation `next` only happens when `next+2`
    // publishes — a stale re-list always reads live >= next+2. (The old
    // guard threw on ANY live != next and deleted meta_g{next} — the
    // exact generation the protocol promises to keep one cycle for
    // in-flight readers — turning normal contention into spurious
    // release/compact retries and narrowing the reader grace window.)
    val live = metaGeneration(spark, dir)
    if (live != next && live != next + 1) {
      // live >= next+2: either a stalled writer's stale claim on a
      // swept generation number, or a double race past a real win —
      // ours is >= 2 generations old either way, outside the one-cycle
      // grace window, so unlinking it is always protocol-safe. The
      // throw is conservative: if the win WAS real, the caller's retry
      // is an idempotent replay, never a double count.
      try fs.delete(target, false) catch { case _: java.io.IOException => () }
      throw new ConcurrentIndexWriteException(
        s"stored index at $dir: generation $next was claimed after the " +
        s"store had advanced to $live (stalled writer) — the claim was " +
        "unreachable and has been withdrawn; reload and retry")
    }
    // sweep generations older than the previous one, walking DOWN from
    // expectedGen-1 and stopping at the first missing file: normally one
    // delete RPC (older gens were swept by earlier writes), and a crashed
    // sweep's contiguous leftovers still drain — never an
    // O(currentGeneration) blind loop per write
    var g = expectedGen - 1
    var existed = true
    while (g >= 0 && existed) {
      val old = new org.apache.hadoop.fs.Path(dir, s"meta_g$g")
      existed = try fs.delete(old, false)
                catch { case _: java.io.IOException => false }
      g -= 1
    }
    // drain CRASHED writers' temp droppings: a `.meta_gG.tmp.*` whose
    // generation is STRICTLY below the one just published can never be
    // linked into place (its CAS is lost by construction), so it is
    // garbage — without this, a crash-looping writer grows the dir
    // unboundedly. Same-generation tmps are left alone: a live racer for
    // THIS generation may be between its tmp create and its (doomed)
    // publish, and deleting under it would turn its clean lost-race
    // failure into a stray filesystem error; its dropping drains on the
    // next successful write instead.
    val tmpPattern = "\\.meta_g(\\d+)\\.tmp\\..*".r
    try fs.listStatus(p).foreach { st =>
      st.getPath.getName match {
        case tmpPattern(tg) if tg.toInt < next =>
          try fs.delete(st.getPath, false)
          catch { case _: java.io.IOException => () }
        case _ => ()
      }
    } catch { case _: java.io.IOException => () }
  }

  /** Atomically publish `tmp` as `target` iff `target` does not exist.
    * For `file://` the only primitive with atomic exclusive-failure
    * semantics is link(2) — `Files.createLink` fails with EEXIST if the
    * target is present, where both Hadoop rename (POSIX rename(2):
    * silently replaces) and `fs.create(target, false)` (check-then-act
    * in RawLocalFileSystem) would race. Other filesystems use Hadoop
    * rename, which on HDFS fails on an existing destination.
    */
  private def publishExclusive(fs: org.apache.hadoop.fs.FileSystem,
                               tmp: org.apache.hadoop.fs.Path,
                               target: org.apache.hadoop.fs.Path): Boolean =
    if (fs.getScheme == "file") {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(target.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        // filesystems without hard links surface link(2) failure as
        // FileSystemException (EPERM on VFAT/exFAT/some CIFS), not only
        // UnsupportedOperationException — both take the rename fallback
        // (FileAlreadyExists is matched above, so an existing target
        // still reports a clean lost race)
        case _: UnsupportedOperationException => fs.rename(tmp, target)
        case _: java.nio.file.FileSystemException => fs.rename(tmp, target)
      }
    } else fs.rename(tmp, target)

  /** Grace-period epoch sweep: delete `names`' relation directories for
    * every epoch STRICTLY BELOW `keepFrom` (callers pass the
    * just-superseded epoch, keeping it for one cycle so in-flight readers
    * finish). Best-effort: a crashed sweep leaves orphans, never
    * corruption — they drain on the next sweep.
    */
  def sweepEpochsBelow(spark: SparkSession, dir: String,
                       names: Seq[String], keepFrom: Int): Unit = {
    val (fs, _) = fsFor(spark, dir)
    // walk DOWN and stop after a few consecutive ALL-MISSING epochs — the
    // same O(1)-in-steady-state shape as the meta sweep (older epochs
    // were swept by earlier cycles); a blind 0-until-keepFrom loop fires
    // keepFrom delete RPCs per maintenance run on a long-lived store.
    // Two hardenings against permanent orphans below a stop point:
    // a transient delete IOException counts as existed (retried next
    // run, instead of stopping the walk and stranding everything older),
    // and the walk tolerates a bounded run of holes (a previous sweep
    // that crashed mid-walk leaves deleted epochs ABOVE still-live ones)
    var e = keepFrom - 1
    var misses = 0
    while (e >= 0 && misses < 3) {
      var any = false
      names.foreach { name =>
        val p = new org.apache.hadoop.fs.Path(relPath(dir, name, e))
        val deleted =
          try fs.delete(p, true) catch { case _: java.io.IOException => true }
        any = any || deleted
      }
      misses = if (any) 0 else misses + 1
      e -= 1
    }
  }
}
