package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted ANN index: parameters round-trip through storage, the probe
  * prunes the stored codes scan to the probed cells (PartitionFilters, no
  * vector column), and stored-index results equal the in-memory IVFADC
  * path.
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 32
  private val clusters = 20
  private val perCluster = 50

  private def emb =
    spark.range(clusters.toLong * perCluster).select(col("id").as("vec_id"))
      .withColumn("embedding",
        ClusteredFixture.normalizedVec(col("vec_id"), clusters, dim))

  test("build/load round-trip: stored probe equals the in-memory IVFADC path") {
    val dir = java.nio.file.Files.createTempDirectory("ann-idx").toString
    try {
      val e = emb.cache(); e.count()
      AnnIndex.build(e, "vec_id", "embedding", s"$dir/idx", dim,
        m = 8, pqK = 16, ivfK = clusters, iterations = 2)
      val idx = AnnIndex.load(spark, s"$dir/idx")
      // parameters live in the index — a probe cannot run with wrong ones
      assert(idx.dim == dim && idx.m == 8 && idx.pqK == 16 &&
        idx.ivfK == clusters && idx.idCol == "vec_id")
      // Lloyd may drop cells that lose every member — codebooks round-trip
      // whatever training produced, bounded by the configured k
      assert(idx.pq.centroids.size == 8)
      assert(idx.ivf.nonEmpty && idx.ivf.size <= clusters)
      val queries = e.filter(col("vec_id") < 8)
      val stored = AnnIndex.searchTopK(idx, e, queries, "embedding",
          nprobe = 2, topR = 25, topK = 5)
        .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
      val inMem = PqAnn.searchTopKIvf(
          PqAnn.encodeWithCells(e, "embedding", idx.pq, idx.ivf)
            .select(col("vec_id"), col("codes"), col("cell")),
          e, queries, "vec_id", "embedding", "codes", idx.pq, idx.ivf,
          nprobe = 2, topR = 25, topK = 5)
        .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
      assert(stored == inMem && stored.size == 8 * 5,
        s"stored=${stored.size} inMem=${inMem.size}")
      e.unpersist()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("append: encode-with-stored-codebooks fragments equal a one-shot encode of the union") {
    val dir = java.nio.file.Files.createTempDirectory("ann-append").toString
    try {
      val e = emb.cache(); e.count()
      val base = e.filter(col("vec_id") % 4 =!= 0)
      val batch = e.filter(col("vec_id") % 4 === 0)
      AnnIndex.build(base, "vec_id", "embedding", s"$dir/idx", dim,
        m = 8, pqK = 16, ivfK = clusters, iterations = 2)
      AnnIndex.append(batch, s"$dir/idx", "embedding", batchId = 1L)
      // an at-least-once REPLAY of the same batch id overwrites its own
      // fragment instead of duplicating rows
      AnnIndex.append(batch, s"$dir/idx", "embedding", batchId = 1L)
      val idx = AnnIndex.load(spark, s"$dir/idx")
      assert(idx.codes.count() == clusters.toLong * perCluster)
      // fragment layout: the bulk build is frag=-1, the batch its own id
      val codesDir = new java.io.File(s"$dir/idx/codes")
      val frags = codesDir.listFiles().map(_.getName).filter(_.startsWith("frag=")).sorted
      assert(frags.sameElements(Array("frag=-1", "frag=1")), frags.mkString(", "))
      assert(AnnIndex.fragmentCount(spark, s"$dir/idx") == 1)
      // probing base+appended ≡ probing a one-shot encode of the UNION
      // under the same (stored, base-trained) codebooks
      val queries = e.filter(col("vec_id") < 8)
      val stored = AnnIndex.searchTopK(idx, e, queries, "embedding",
          nprobe = 2, topR = 25, topK = 5)
        .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
      val oneShot = PqAnn.searchTopKIvf(
          PqAnn.encodeWithCells(e, "embedding", idx.pq, idx.ivf)
            .select(col("vec_id"), col("codes"), col("cell")),
          e, queries, "vec_id", "embedding", "codes", idx.pq, idx.ivf,
          nprobe = 2, topR = 25, topK = 5)
        .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
      assert(stored == oneShot && stored.size == 8 * 5)
      e.unpersist()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("compact: deletions pruned, fragments folded to one file per cell, codebooks carried, epoch swapped") {
    val dir = java.nio.file.Files.createTempDirectory("ann-compact").toString
    try {
      val e = emb.cache(); e.count()
      AnnIndex.build(e.filter(col("vec_id") % 4 =!= 0), "vec_id", "embedding",
        s"$dir/idx", dim, m = 8, pqK = 16, ivfK = clusters, iterations = 2)
      AnnIndex.append(e.filter(col("vec_id") % 4 === 0 && col("vec_id") % 8 =!= 0),
        s"$dir/idx", "embedding", batchId = 1L)
      AnnIndex.append(e.filter(col("vec_id") % 8 === 0),
        s"$dir/idx", "embedding", batchId = 2L)
      assert(AnnIndex.fragmentCount(spark, s"$dir/idx") == 2)
      val before = AnnIndex.load(spark, s"$dir/idx")

      // a curation pass deleted every 7th vector
      val keep = e.select(col("vec_id")).filter(col("vec_id") % 7 =!= 0)
      AnnIndex.compact(spark, s"$dir/idx", keep)

      val idx = AnnIndex.load(spark, s"$dir/idx")
      // epoch swapped, previous epoch kept for one grace cycle
      assert(idx.epoch == before.epoch + 1)
      assert(new java.io.File(s"$dir/idx/codes").exists(), "grace epoch swept early")
      assert(new java.io.File(s"$dir/idx/codes_e1").exists())
      // deletions applied, fragments folded to the single bulk fragment
      assert(idx.codes.count() == keep.count())
      assert(AnnIndex.fragmentCount(spark, s"$dir/idx") == 0)
      val fragDirs = new java.io.File(s"$dir/idx/codes_e1").listFiles()
        .map(_.getName).filter(_.startsWith("frag="))
      assert(fragDirs.sameElements(Array("frag=-1")), fragDirs.mkString(", "))
      // one file per cell after the fold
      new java.io.File(s"$dir/idx/codes_e1/frag=-1").listFiles()
        .filter(_.getName.startsWith("cell=")).foreach { cd =>
          val files = cd.listFiles().filter(_.getName.endsWith(".parquet"))
          assert(files.length == 1, s"${cd.getName}: ${files.length} files")
        }
      // codebooks carried verbatim — compaction is not a retrain
      assert(idx.pq == before.pq && idx.ivf == before.ivf)
      // the compacted probe ≡ the in-memory probe over the kept vectors
      // under the SAME codebooks
      val kept = e.join(keep, Seq("vec_id"), "left_semi").cache(); kept.count()
      val queries = e.filter(col("vec_id") < 8)
      val stored = AnnIndex.searchTopK(idx, kept, queries, "embedding",
          nprobe = 2, topR = 25, topK = 5)
        .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
      val inMem = PqAnn.searchTopKIvf(
          PqAnn.encodeWithCells(kept, "embedding", idx.pq, idx.ivf)
            .select(col("vec_id"), col("codes"), col("cell")),
          kept, queries, "vec_id", "embedding", "codes", idx.pq, idx.ivf,
          nprobe = 2, topR = 25, topK = 5)
        .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSet
      assert(stored == inMem && stored.size == 8 * 5)
      assert(!stored.exists { case (_, _, nid) => nid % 7 == 0 },
        "a deleted id surfaced from the compacted index")
      kept.unpersist(); e.unpersist()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("filtered search: the allow-list pre-filters codes, results equal the in-memory probe over the subset") {
    val dir = java.nio.file.Files.createTempDirectory("ann-filter").toString
    try {
      val e = emb.cache(); e.count()
      AnnIndex.build(e, "vec_id", "embedding", s"$dir/idx", dim,
        m = 8, pqK = 16, ivfK = clusters, iterations = 2)
      val idx = AnnIndex.load(spark, s"$dir/idx")
      val allowed = e.select(col("vec_id")).filter(col("vec_id") % 2 === 0)
      val queries = e.filter(col("vec_id") < 8)
      val filtered = AnnIndex.searchTopK(idx, e, queries, "embedding",
          nprobe = 2, topR = 25, topK = 5, allow = Some(allowed))
        .select("qid", "rank", "nid").as[(Long, Int, Long)].collect()
      assert(filtered.nonEmpty && filtered.forall(_._3 % 2 == 0),
        "a disallowed id surfaced from the filtered probe")
      // pre-filtering ≡ searching an index holding only the allowed
      // subset (same stored codebooks): the predicate prunes work
      // without changing semantics
      val subset = e.join(allowed, Seq("vec_id"), "left_semi")
      val inMem = PqAnn.searchTopKIvf(
          PqAnn.encodeWithCells(subset, "embedding", idx.pq, idx.ivf)
            .select(col("vec_id"), col("codes"), col("cell")),
          subset, queries, "vec_id", "embedding", "codes", idx.pq, idx.ivf,
          nprobe = 2, topR = 25, topK = 5)
        .select("qid", "rank", "nid").as[(Long, Int, Long)].collect()
      assert(filtered.toSet == inMem.toSet && filtered.length == 8 * 5)
      // and an unfiltered probe differs (the odd clusters exist)
      val unfiltered = AnnIndex.searchTopK(idx, e, queries, "embedding",
          nprobe = 2, topR = 25, topK = 5)
        .select("qid", "rank", "nid").as[(Long, Int, Long)].collect()
      assert(unfiltered.exists(_._3 % 2 == 1))
      e.unpersist()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("rebuild CAS-swaps the epoch; a pre-rebuild reader survives one grace cycle") {
    val dir = java.nio.file.Files.createTempDirectory("ann-grace").toString
    def exists(name: String) = new java.io.File(s"$dir/idx/$name").exists()
    try {
      val e = emb.cache(); e.count()
      AnnIndex.build(e, "vec_id", "embedding", s"$dir/idx", dim,
        m = 8, pqK = 16, ivfK = clusters, iterations = 2)
      // an in-flight reader loads just before the rebuild...
      val reader = AnnIndex.load(spark, s"$dir/idx")
      val preCount = reader.codes.count()
      AnnIndex.build(e, "vec_id", "embedding", s"$dir/idx", dim,
        m = 8, pqK = 16, ivfK = clusters, iterations = 2)
      // ...and still collects afterwards: epoch-0 dirs survive one cycle
      assert(exists("codes") && exists("codebooks"), "grace epoch was swept early")
      assert(reader.codes.count() == preCount,
        "pre-rebuild reader failed within the grace window")
      assert(AnnIndex.load(spark, s"$dir/idx").epoch == 1)
      // the NEXT rebuild expires the grace epoch (bounded garbage)
      AnnIndex.build(e, "vec_id", "embedding", s"$dir/idx", dim,
        m = 8, pqK = 16, ivfK = clusters, iterations = 2)
      assert(!exists("codes") && !exists("codebooks"),
        "epoch 0 must be swept once it is two swaps old")
      assert(exists("codes_e1") && exists("codes_e2"))
      e.unpersist()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("append detects a concurrent rebuild and demands a replay; a stale writer fails the CAS") {
    val dir = java.nio.file.Files.createTempDirectory("ann-race").toString
    try {
      val e = emb.cache(); e.count()
      val base = e.filter(col("vec_id") % 4 =!= 0)
      AnnIndex.build(base, "vec_id", "embedding", s"$dir/idx", dim,
        m = 8, pqK = 16, ivfK = clusters, iterations = 2)
      // an appender snapshots the index, then a rebuild swaps the epoch
      val stale = AnnIndex.load(spark, s"$dir/idx")
      val (kv, gen) = graft.sources.StoredIndex.readKvWithGen(spark, s"$dir/idx")
      AnnIndex.build(base, "vec_id", "embedding", s"$dir/idx", dim,
        m = 8, pqK = 16, ivfK = clusters, iterations = 2)
      val batch = e.filter(col("vec_id") % 4 === 0)
      val ex = intercept[graft.sources.StoredIndex.ConcurrentIndexWriteException] {
        AnnIndex.appendWith(batch, stale, s"$dir/idx", "embedding", 1L)
      }
      assert(ex.getMessage.contains("replay"))
      // the appended rows landed in the superseded epoch only — the live
      // epoch is untouched (the batch is NOT silently half-visible)
      assert(AnnIndex.load(spark, s"$dir/idx").codes.count() == base.count())
      // and a writer still holding the pre-rebuild generation fails fast
      val ex2 = intercept[graft.sources.StoredIndex.ConcurrentIndexWriteException] {
        graft.sources.StoredIndex.writeMetaCas(spark, s"$dir/idx", kv.toSeq, gen)
      }
      assert(ex2.getMessage.contains("generation"))
      e.unpersist()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("codebook drift: recall decays measurably with appended drift and a rebuild restores it") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.expressions.Window
    val dCl = 10 // drifted clusters on axes 10..19 — never seen in training
    val baseN = 500L
    val dir = java.nio.file.Files.createTempDirectory("ann-drift").toString
    // base corpus: ids 0..499 on axes 0..9; drifted pool: ids 1000..1499 on
    // shifted axes (the deterministic model of an appended batch whose
    // distribution the stored codebooks never trained on)
    val base = spark.range(baseN).select(col("id").as("vec_id"),
      ClusteredFixture.normalizedVec(col("id"), dCl, dim).as("embedding"))
    val driftPool = spark.range(1000L, 1000L + baseN).select(col("id").as("vec_id"),
      ClusteredFixture.normalizedVec(col("id"), dCl, dim, axisShift = dCl)
        .as("embedding"))
    def recallAt5(idx: AnnIndex.Loaded, corpus: DataFrame,
                  queries: DataFrame): Double = {
      val qs = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val w = Window.partitionBy(col("qid")).orderBy(col("c").desc, col("nid"))
      val brute = corpus.select(col("vec_id").as("nid"), col("embedding").as("cv"))
        .crossJoin(broadcast(qs))
        .filter(col("nid") =!= col("qid"))
        .withColumn("c", graft.plans.CosineSimilarityExpr.cosine(col("qv"), col("cv")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5).select("qid", "nid")
      val approx = AnnIndex.searchTopK(idx, corpus, queries, "embedding",
        nprobe = 2, topR = 25, topK = 5).select("qid", "nid")
      val nq = queries.count()
      val hits = brute.join(approx, Seq("qid", "nid"), "left_semi").count()
      hits.toDouble / (5.0 * nq)
    }
    try {
      val e = base.cache(); e.count()
      val dp = driftPool.cache(); dp.count()
      AnnIndex.build(e, "vec_id", "embedding", s"$dir/idx", dim,
        m = 8, pqK = 16, ivfK = dCl, iterations = 2)
      val dQueries = dp.filter(col("vec_id") < 1008)
      val measured = Seq(0.10, 0.50, 1.00).zipWithIndex.map { case (frac, b) =>
        val lo = 1000L + (if (b == 0) 0L else (Seq(0.10, 0.50)(b - 1) * baseN).toLong)
        val hi = 1000L + (frac * baseN).toLong
        AnnIndex.append(dp.filter(col("vec_id") >= lo && col("vec_id") < hi),
          s"$dir/idx", "embedding", batchId = b.toLong)
        val corpus = e.unionByName(dp.filter(col("vec_id") < hi))
        val r = recallAt5(AnnIndex.load(spark, s"$dir/idx"), corpus, dQueries)
        info(f"drifted recall@5 at ${(frac * 100).toInt}%% appended: $r%.3f")
        (frac, r)
      }
      // the decayed numbers are the documentation artifact (AnnIndex
      // scaladoc cites them); the gate is loose on purpose — measured
      // decay, not a tuned threshold
      assert(measured.forall(_._2 >= 0.05) && measured.forall(_._2 <= 0.95),
        s"drift recall out of the expected decay band: $measured")
      // REBUILD (retrain over the grown corpus) restores recall: the
      // fragmentCount-triggered form of this runs in StreamingSpec
      val full = e.unionByName(dp)
      AnnIndex.build(full, "vec_id", "embedding", s"$dir/idx", dim,
        m = 8, pqK = 16, ivfK = 2 * dCl, iterations = 2)
      val rebuilt = recallAt5(AnnIndex.load(spark, s"$dir/idx"), full, dQueries)
      info(f"drifted recall@5 after rebuild: $rebuilt%.3f")
      assert(rebuilt >= 0.9 && rebuilt > measured.map(_._2).max,
        f"rebuild must restore recall: $rebuilt%.3f vs $measured")
      e.unpersist(); dp.unpersist()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("the stored-codes probe carries PartitionFilters and reads no vectors") {
    val dir = java.nio.file.Files.createTempDirectory("ann-prune").toString
    try {
      val e = emb.cache(); e.count()
      AnnIndex.build(e, "vec_id", "embedding", s"$dir/idx", dim,
        m = 8, pqK = 16, ivfK = clusters, iterations = 2)
      val idx = AnnIndex.load(spark, s"$dir/idx")
      val out = AnnIndex.searchTopK(idx, e, e.filter(col("vec_id") < 4),
        "embedding", nprobe = 2, topR = 20, topK = 5)
      val plan = out.queryExecution.executedPlan.toString
      // the codes scan is pruned to the probed cells' partitions...
      assert(plan.contains("PartitionFilters") && plan.contains("cell"),
        s"no partition pruning on the stored codes scan:\n$plan")
      // ...and reads codes, never the vector column
      val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).toVector
      assert(readSchemas.exists(l => l.contains("codes") && !l.contains("embedding")),
        s"codes scan reads vectors:\n${readSchemas.mkString("\n")}")
      assert(out.count() == 4 * 5)
      e.unpersist()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
