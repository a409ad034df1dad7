package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Release.publish]] laws: split/shard determinism against an
  * independent in-memory replay, manifest-from-written-files fidelity,
  * datacard aggregation, document atomicity under oversized documents,
  * BPE-token integration, and the StoredIndex protocol inheritance
  * (generation swap + sweep, half-landed writes, CAS-loser clobber,
  * fail-before-write preconditions, foreign stores).
  */
class ReleaseSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("release").toString + "/store"

  private val fr = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))

  // 120 docs, 2 strata, deterministic token counts incl. zeros and one
  // oversized doc per stratum (id 0/1: 5x the shard target)
  private def corpus = spark.range(120).select(
    col("id"), (col("id") % 2).as("g"),
    when(col("id") < 2, lit(500L))
      .otherwise((col("id") % 7) * 10).as("n_tok"))

  private def spec = Release.Spec(seed = 11L, fractions = fr,
    strataCols = Seq("g"), keyCols = Seq("id"),
    tokensCol = "n_tok", shardTokens = 100L)

  /** Driver-side independent replay of the split+shard law. */
  private def expected(): Map[(String, Int), (Long, Long)] = {
    val rows = Sampling.deterministicSplit(corpus, Seq("g"), Seq("id"),
        fr, 11L)
      .select(col("split"), col("id"), col("n_tok"),
        md5(concat_ws("|", lit("11"), col("id").cast("string"))
          .cast("binary")).as("draw"))
      .as[(String, Long, Long, String)].collect()
    val perRow = rows.groupBy(_._1).toSeq.flatMap { case (split, rs) =>
      var p = 0L
      rs.sortBy(r => (r._4, r._2)).map { r =>
        val shard = (p / 100L).toInt // floor of the EXCLUSIVE prefix
        p += r._3
        ((split, shard), (1L, r._3))
      }
    }
    perRow.groupBy(_._1).map { case (k, vs) =>
      k -> ((vs.map(_._2._1).sum, vs.map(_._2._2).sum))
    }
  }

  test("publish round-trips the spec; manifest equals both the written " +
    "files and an independent replay of the split+shard law") {
    val dir = tmpDir()
    Release.publish(corpus, dir, spec)
    assert(Release.readSpec(spark, dir) == spec)
    val man = Release.readManifest(spark, dir)
      .select("split", "shard", "n_docs", "n_tokens")
      .as[(String, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(man == expected())
    // re-counted from the released corpus files
    val files = Release.readCorpus(spark, dir)
      .groupBy(col("split").cast("string").as("s"), col("shard"))
      .agg(count(lit(1)).as("d"), sum("n_tok").as("t"))
      .as[(String, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(files == man)
  }

  private def inode(p: java.io.File): Any =
    java.nio.file.Files.readAttributes(p.toPath,
      classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()

  private def shardFiles(dir: String): Map[String, Seq[java.io.File]] = {
    val liveCorpus = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("corpus_e")).maxBy(_.getName.split("_e")(1)
        .split("_w")(0).toInt)
    (for {
      sp <- liveCorpus.listFiles().toSeq if sp.isDirectory
      sh <- sp.listFiles().toSeq if sh.isDirectory
    } yield s"${sp.getName}/${sh.getName}" ->
      // data files only: local-FS writes leave "."-hidden .crc siblings
      // Hadoop's listStatus (and so linkShards) never surfaces
      sh.listFiles().filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")).toSeq
    ).toMap
  }

  test("shard reuse: an identical re-release links every shard (same " +
    "inodes, no rewrite); a spec change forces a full rewrite") {
    val dir = tmpDir()
    Release.publish(corpus, dir, spec)
    val gen0 = shardFiles(dir).map { case (k, fs) => k -> fs.map(inode) }
    Release.publish(corpus, dir, spec) // same corpus, same spec
    val gen1 = shardFiles(dir)
    gen1.filterNot { case (k, fs) => fs.map(inode) == gen0(k) }
      .take(3).foreach { case (k, fs) =>
        info(s"NOTLINKED $k new=${fs.map(inode)} old=${gen0.get(k)}") }
    assert(gen1.nonEmpty && gen1.forall { case (k, fs) =>
      fs.map(inode) == gen0(k)
    }, "identical re-release must hard-link every shard")
    // content still reads identically through the new generation
    assert(Release.readCorpus(spark, dir).count() == 120)
    // a different shard budget is a different spec: nothing may reuse
    Release.publish(corpus, dir, spec.copy(shardTokens = 50L))
    val gen2 = shardFiles(dir)
    val gen1Inodes = gen1.values.flatten.map(inode).toSet
    assert(gen2.values.flatten.forall(f => !gen1Inodes(inode(f))),
      "spec change must not link prior files")
  }

  test("shard reuse: a curation delta rewrites only dirty shards, the " +
    "released content equals an independent full release, and sweeping " +
    "the prior generation leaves linked files readable") {
    val dir = tmpDir()
    Release.publish(corpus, dir, spec)
    val gen0 = shardFiles(dir).map { case (k, fs) => k -> fs.map(inode) }
    val delta = corpus.filter(col("id") =!= 77L) // one doc gone
    Release.publish(delta, dir, spec)
    val gen1 = shardFiles(dir)
    val reused = gen1.count { case (k, fs) =>
      gen0.get(k).contains(fs.map(inode)) }
    val rewritten = gen1.size - reused
    assert(reused > 0, "prefix shards before the edit must link")
    assert(rewritten > 0, "shards at/after the edit must rewrite")
    // content ≡ an independent full release of the same delta corpus
    val fresh = tmpDir()
    Release.publish(delta, fresh, spec)
    def contents(d: String) = Release.readCorpus(spark, d)
      .select(col("split").cast("string"), col("shard"), col("id"),
        col("g"), col("n_tok"))
      .as[(String, Int, Long, Long, Long)].collect().toSet
    assert(contents(dir) == contents(fresh))
    // manifests agree too (fingerprints included — same assignment law)
    def man(d: String) = Release.readManifest(spark, d)
      .select("split", "shard", "n_docs", "n_tokens", "fp_add", "fp_xor")
      .as[(String, Int, Long, Long, String, Long)].collect().toSet
    assert(man(dir) == man(fresh))
    // the grace sweep of generation 0 unlinks only ITS names: the live
    // release keeps reading every linked file afterwards
    graft.sources.StoredIndex.sweepTaggedBelow(spark, dir,
      Seq("corpus", "manifest", "datacard", "tokenizer"), 1,
      legacyUntagged = false)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("corpus_e0")) == 0, "gen 0 swept")
    assert(contents(dir) == contents(fresh),
      "sweeping the prior generation must not tear linked shards")
  }

  test("tokenizer artifacts: export/read round-trips the merge table, " +
    "vocab.txt is alphabet-then-products in rank order, and a shipped " +
    "tokenizer resolves through the live meta while its absence refuses") {
    val merges = Seq(Bpe.Merge(0, "a", "b"), Bpe.Merge(1, "ab", "c"))
    val adir = tmpDir()
    Bpe.exportArtifacts(spark, merges, Seq("a", "b", "c"), adir)
    assert(Bpe.readArtifacts(spark, adir) == merges)
    val vocab = java.nio.file.Files.readString(
      java.nio.file.Paths.get(adir, "vocab.txt"))
    assert(vocab == "a\nb\nc\nab\nabc\n")
    val mergesTxt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(adir, "merges.txt"))
    assert(mergesTxt == "#version: 0.2\na b\nab c\n")
    // whitespace-bearing symbols are not representable — refuse loudly
    intercept[IllegalArgumentException] {
      Bpe.exportArtifacts(spark, Seq(Bpe.Merge(0, "a b", "c")),
        Seq("a"), tmpDir())
    }
    // shipped with a release: re-read through the meta pointer
    val dir = tmpDir()
    Release.publish(corpus, dir, spec,
      tokenizer = Some(Release.Tokenizer(merges, Seq("a", "b", "c"))))
    assert(Release.readTokenizer(spark, dir) == merges)
    // a re-release WITHOUT one refuses instead of serving a stale table
    Release.publish(corpus, dir, spec)
    val e = intercept[IllegalArgumentException] {
      Release.readTokenizer(spark, dir)
    }
    assert(e.getMessage.contains("without a tokenizer"))
  }

  test("shards are contiguous token-budget prefixes; an oversized " +
    "document overflows its own shard (documents are atomic)") {
    val dir = tmpDir()
    Release.publish(corpus, dir, spec)
    val man = Release.readManifest(spark, dir)
      .select("split", "shard", "n_tokens")
      .as[(String, Int, Long)].collect()
    man.groupBy(_._1).foreach { case (split, shards) =>
      // shard id law: id = floor(exclusive-prefix-tokens / B). The first
      // shard is always 0 and every later id is exactly the floor of the
      // cumulative tokens before it — ids are strictly increasing, and a
      // GAP appears precisely when the preceding shard overflowed its
      // budget (an oversized atomic document)
      val ordered = shards.sortBy(_._2)
      assert(ordered.head._2 == 0, s"$split first shard: ${ordered.head}")
      var cum = 0L
      ordered.sliding(2).foreach {
        case Array((_, id0, t0), (_, id1, _)) =>
          cum += t0
          assert(id1 == (cum / 100L).toInt,
            s"$split: shard after $id0 (cum $cum) should be " +
              s"${cum / 100L}, got $id1")
          assert(id1 > id0)
        case _ => ()
      }
    }
    // the 500-token docs (ids 0, 1 — one per stratum) exceed the 100
    // target: some shard overflows rather than splitting the document
    assert(man.exists(_._3 >= 500L))
    // datacard aggregates the manifest exactly
    val card = Release.readDatacard(spark, dir)
      .select("split", "n_docs", "n_tokens", "n_shards", "seed")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    man.groupBy(_._1).foreach { case (split, shards) =>
      val c = card(split)
      assert(c._3 == shards.map(_._3).sum && c._4 == shards.length &&
        c._5 == 11L)
    }
    assert(card.values.map(_._2).sum == 120L)
  }

  test("BPE token counts integrate as the budget unit (t48's machinery)") {
    val dir = tmpDir()
    val docs = (0 until 40)
      .map(i => (i.toLong, s"doc $i repeats token token token times $i"))
      .toDF("id", "text")
    val merges = Bpe.learn(Bpe.wordCounts(docs, "text"), 20)
    val withBpe = docs.select(col("id"), lit(0L).as("g"),
      size(Bpe.encode(col("text"), merges)).cast("long").as("n_bpe"))
    Release.publish(withBpe, dir, Release.Spec(7L, Seq(("train", 1.0)),
      Seq("g"), Seq("id"), "n_bpe", shardTokens = 50L))
    val man = Release.readManifest(spark, dir)
    val total = withBpe.agg(sum("n_bpe")).as[Long].head()
    assert(man.agg(sum("n_tokens")).as[Long].head() == total)
    assert(man.agg(sum("n_docs")).as[Long].head() == 40L)
  }

  test("re-release advances the generation, replaces the artifact, and " +
    "sweeps two behind") {
    val dir = tmpDir()
    def dirs(gen: Int): Seq[String] =
      Option(new java.io.File(dir).list()).toSeq.flatten
        .filter(_.matches(s"corpus_e${gen}_w[0-9a-f]+"))
    Release.publish(corpus, dir, spec)                    // gen 0
    assert(dirs(0).size == 1)
    Release.publish(corpus.limit(50), dir, spec)          // gen 1
    assert(dirs(1).size == 1 && dirs(0).size == 1) // grace window
    assert(Release.readCorpus(spark, dir).count() == 50L)
    Release.publish(corpus, dir, spec)                    // gen 2
    assert(dirs(2).size == 1 && dirs(0).isEmpty)
    assert(Release.readCorpus(spark, dir).count() == 120L)
  }

  test("a half-landed newer write never shadows the live release; a " +
    "CAS-loser's attempt directory can never clobber the winner's") {
    val dir = tmpDir()
    Release.publish(corpus, dir, spec)
    // crashed writer: relations at gen 1 landed, CAS never published
    spark.range(3).select(col("id"), lit("train").as("split"),
        lit(0).as("shard"))
      .write.parquet(s"$dir/corpus_e1_wcafecafe")
    assert(Release.readCorpus(spark, dir).count() == 120L)
    // same-generation racer: distinct attempt tag → distinct directory
    spark.range(3).select(col("id"), lit("train").as("split"),
        lit(0).as("shard"))
      .write.parquet(s"$dir/corpus_e0_wdeadbeef")
    assert(Release.readCorpus(spark, dir).count() == 120L)
    // each orphan ages out once its GENERATION leaves the one-cycle
    // grace window: gen 0 after the gen-2 publish, gen 1 after gen 3
    Release.publish(corpus, dir, spec) // gen 1
    Release.publish(corpus, dir, spec) // gen 2 → sweeps gen 0
    assert(!new java.io.File(s"$dir/corpus_e0_wdeadbeef").exists())
    assert(new java.io.File(s"$dir/corpus_e1_wcafecafe").exists())
    Release.publish(corpus, dir, spec) // gen 3 → sweeps gen 1
    assert(!new java.io.File(s"$dir/corpus_e1_wcafecafe").exists())
  }

  test("preconditions fail BEFORE the corpus-sized write; foreign and " +
    "uninitialized stores are refused") {
    val dir = tmpDir()
    intercept[IllegalArgumentException] {
      Release.publish(corpus.drop("n_tok"), dir, spec)
    }
    intercept[IllegalArgumentException] {
      Release.publish(corpus.withColumn("split", lit("x")), dir, spec)
    }
    intercept[IllegalArgumentException] {
      Release.publish(corpus, dir, spec.copy(shardTokens = 0L))
    }
    assert(!new java.io.File(dir).exists()) // nothing landed
    intercept[IllegalArgumentException] {
      Release.readManifest(spark, tmpDir())
    }
    graft.sources.StoredIndex.writeMetaCas(spark, dir,
      Seq("kind" -> "split_manifest"), -1)
    intercept[IllegalArgumentException] {
      Release.readCorpus(spark, dir)
    }
  }
}
