package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.NearDup
import graft.functions.TextFunctions

/** Deduplication surface over `documents`: exact (fingerprint groups),
  * exact n-gram Jaccard, MinHash+LSH near-dup with exact verification, and
  * SimHash signatures (SURVEY §7.8 extension set).
  *
  * The DuckDB oracles recompute shingle Jaccard exactly; the MinHash+LSH
  * query's oracle is the EXACT pairs at the same threshold — i.e. the oracle
  * doubles as a recall check for the LSH banding (b=32, r=2 catches
  * s ≥ 0.7 with probability 1 − (1−0.49)^32 ≈ 1 − 4e-10, so hash-match is
  * expected, and a miss would be a real recall bug worth failing on).
  */
object DedupQueries {

  private def q(name: String, oracle: Option[String])(fn: (SparkSession, String) => DataFrame) =
    GraftQuery(name, fn, oracle)

  /** One-time-per-JVM fixture staging for the persisted-index queries
    * (d11-d13): the corpus parquet + index BUILD are "batch N-1's job" — an
    * amortized, once-per-corpus cost — so they run on first touch only and
    * every later call (Bench's timed passes 2..n, repeated Verify runs)
    * measures the PROBE alone. Round 7's finding: with staging inside the
    * timed fn the headline d11 number was build+save+probe (~7 s) while the
    * actual probe is ~2.5 s, overstating hot-path cost and hiding probe
    * regressions inside staging noise. Staged trees are keyed by (query,
    * sf dir) and rebuilt fresh per JVM, so no run ever reads a stale tree;
    * cumulative staging wall time is reported by Bench on its own line.
    */
  private[graft] object DedupStaging {
    private val staged = scala.collection.concurrent.TrieMap.empty[String, String]
    private val nanos = new java.util.concurrent.atomic.AtomicLong(0L)
    def stagingSeconds: Double = nanos.get / 1e9
    def ensure(kind: String, dir: String)(stage: String => Unit): String =
      staged.getOrElseUpdate(s"$kind|$dir", {
        val root = "/root/repo/target/qtmp/stage_" + kind + "_" +
          java.lang.Integer.toHexString(dir.hashCode)
        val t0 = System.nanoTime()
        stage(root)
        nanos.addAndGet(System.nanoTime() - t0)
        root
      })
  }

  private def normSql(c: String) =
    s"trim(regexp_replace(regexp_replace($c, '[\\r\\n]+', ' ', 'g'), '\\s+', ' ', 'g'))"

  /** DuckDB CTEs producing the distinct (doc_id, 3-gram shingle) relation —
    * mirror of [[NearDup.shingles]] (docs shorter than n collapse to one
    * whole-text shingle).
    */
  private def shingleSql: String =
    s"""w AS (SELECT doc_id, string_split(${normSql("text")}, ' ') AS toks FROM documents),
       |g AS (SELECT doc_id,
       |        unnest(CASE WHEN len(toks) >= 3
       |               THEN [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
       |               ELSE [array_to_string(toks, ' ')] END) AS shingle
       |      FROM w),
       |s AS (SELECT DISTINCT doc_id, shingle FROM g),
       |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
       |i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |      FROM s a JOIN s b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2),
       |j AS (SELECT id_a, id_b,
       |        CAST(i AS DOUBLE) / (x.n + y.n - i) AS jaccard
       |      FROM i JOIN sz x ON id_a = x.doc_id JOIN sz y ON id_b = y.doc_id)""".stripMargin

  // ---------------------------------------------------------------- d01
  /** Exact dedup: group documents by content fingerprint. */
  val d01_exact_dup_groups = q("d01_exact_dup_groups", Some(
    s"""SELECT md5(lower(${normSql("text")})) AS fp,
       |  COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
       |FROM documents GROUP BY 1""".stripMargin)) { (s, dir) =>
    Tables.documents(s, dir)
      .groupBy(TextFunctions.fingerprint(col("text")).as("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
  }

  // ---------------------------------------------------------------- d02
  /** Exact 3-gram Jaccard near-dup pairs (threshold 0.5): candidate pairs
    * from the shingle equi-join itself (pairs sharing no shingle have j = 0),
    * intersection counts from the same join — one shuffle on the shingle,
    * one on the pair.
    */
  val d02_ngram_jaccard = q("d02_ngram_jaccard", Some(
    s"""WITH $shingleSql
       |SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard
       |FROM j WHERE jaccard >= 0.5""".stripMargin)) { (s, dir) =>
    // join on 8-byte shingle hashes, not n-gram text (counts identical up to
    // 64-bit collisions, ~1e-11 at corpus scale) — same trick as d03.
    // The per-doc shingle ARRAYS are persisted: the plan consumes the
    // relation four times (join sides a/b + both size lookups), and without
    // the pin each consumer re-runs the normalize+split+hash chain from the
    // parquet scan (round-21 plan audit: 4 scan subtrees, with the inferred
    // non-empty filter evaluating the chain twice more per subtree). Sizes
    // come from size(hs) map-side — the arrays are in-row distinct, so
    // |shingle set| is the array length; the old groupBy(id).count over the
    // exploded relation was an extra exchange computing the same number.
    // Lifetime: released by the harness's per-query clearCache.
    val perDoc = NearDup.docShingleArrays(Tables.documents(s, dir), "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sh = perDoc.select(col("id"), explode(col("hs")).as("shingle"))
    val sizes = perDoc.select(col("id"), size(col("hs")).as("n"))
    val a = sh.select(col("id").as("id_a"), col("shingle"))
    val b = sh.select(col("id").as("id_b"), col("shingle"))
    val inter = a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---------------------------------------------------------------- d03
  /** MinHash+LSH near-dup pairs at threshold 0.7 with exact verification —
    * the 100 TB path: signatures shuffle instead of text, the quadratic step
    * is confined to LSH buckets. Oracle = exact pairs (recall check built in).
    */
  val d03_minhash_lsh = q("d03_minhash_lsh", Some(
    s"""WITH $shingleSql
       |SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard
       |FROM j WHERE jaccard >= 0.7""".stripMargin)) { (s, dir) =>
    // cacheShingles ON — the documented memory-headroom knob (operator
    // scaladoc): exact verification reads the shingle relation three times
    // and the collapse/signature pass a fourth; this box (32 threads,
    // ample storage headroom) is squarely the measured cache-wins regime,
    // and the d03 smoke leg gates the 10× behavior every round.
    NearDup.nearDuplicatePairs(Tables.documents(s, dir), "doc_id", "text",
        threshold = 0.7, numHashes = 64, bands = 32, shingleSize = 3,
        cacheShingles = true)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---------------------------------------------------------------- d04
  /** SimHash signature per document (near-dups = small Hamming distance).
    * xxhash64-based — not expressible in the oracle engine → the oracle is
    * a committed golden parquet (deterministic integer/bit algebra, see
    * [[GoldenOracles]]).
    */
  val d04_simhash = q("d04_simhash", GoldenOracles.sqlFor("d04_simhash")) { (s, dir) =>
    NearDup.simhash(Tables.documents(s, dir), "doc_id", "text")
  }

  // ---------------------------------------------------------------- d05
  /** SimHash banded near-dup pairs (hamming ≤ 3; 4 bands give exact recall
    * at that radius by pigeonhole, within capped buckets). xxhash64-based →
    * golden-parquet oracle ([[GoldenOracles]]); NearDupSpec proves the
    * recall guarantee on planted duplicates.
    */
  val d05_simhash_neardup = q("d05_simhash_neardup",
    GoldenOracles.sqlFor("d05_simhash_neardup")) { (s, dir) =>
    NearDup.simhashNearDups(Tables.documents(s, dir), "doc_id", "text",
      maxHamming = 3, bands = 4)
  }

  // ---------------------------------------------------------------- d06
  /** Near-dup CLUSTERS: connected components over the exact-Jaccard pair
    * relation (threshold 0.5) — pairs become transitive dedup groups, the
    * form "keep one per cluster" actually needs (A~B, B~C collapses all
    * three even when A~C was never emitted). Spark side is iterative
    * min-label propagation ([[NearDup.connectedComponents]]); the oracle
    * replays reachability with a recursive CTE, so the clustering is
    * hash-checked exactly. Output: every clustered doc with its cluster
    * representative (min doc_id) + cluster size.
    */
  val d06_dedup_clusters = q("d06_dedup_clusters", Some(
    s"""WITH RECURSIVE $shingleSql,
       |e AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.5),
       |sym AS (SELECT id_a AS src, id_b AS dst FROM e
       |        UNION ALL SELECT id_b, id_a FROM e),
       |walk(id, comp) AS (
       |  SELECT DISTINCT src, src FROM sym
       |  UNION
       |  SELECT s.dst, w.comp FROM walk w JOIN sym s ON w.id = s.src),
       |comps AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id)
       |SELECT c.id AS doc_id, c.comp AS cluster_rep,
       |  CAST(n.sz AS BIGINT) AS cluster_size
       |FROM comps c
       |JOIN (SELECT comp, COUNT(*) AS sz FROM comps GROUP BY comp) n
       |  ON c.comp = n.comp""".stripMargin)) { (s, dir) =>
    // edge relation = d02's exact pairs (mirrors the oracle's `e` 1:1 so
    // the check isolates the CLUSTERING); at corpus scale substitute
    // d03's LSH pairs — connectedComponents is agnostic to the edge source
    val pairs = d02_ngram_jaccard.fn(s, dir).select("id_a", "id_b")
    val comps = NearDup.connectedComponents(pairs)
    val sizes = comps.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
    comps.join(sizes, "comp")
      .select(col("id").as("doc_id"), col("comp").as("cluster_rep"),
        col("cluster_size"))
  }

  // ---------------------------------------------------------------- d07
  /** APPLY the dedup: keep exactly one representative (min doc_id) per
    * near-dup cluster and every unclustered doc — the corpus that actually
    * ships to training. Composition of d06's components with a left-anti
    * join (drop non-representative members); at scale the pair input is
    * d03's LSH relation and this is the final map-side-cheap step.
    */
  val d07_dedup_apply = q("d07_dedup_apply", Some(
    s"""WITH RECURSIVE $shingleSql,
       |e AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.5),
       |sym AS (SELECT id_a AS src, id_b AS dst FROM e
       |        UNION ALL SELECT id_b, id_a FROM e),
       |walk(id, comp) AS (
       |  SELECT DISTINCT src, src FROM sym
       |  UNION
       |  SELECT s.dst, w.comp FROM walk w JOIN sym s ON w.id = s.src),
       |comps AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id)
       |SELECT d.doc_id, d.lang FROM documents d
       |WHERE d.doc_id NOT IN (SELECT id FROM comps WHERE id <> comp)""".stripMargin)) { (s, dir) =>
    val pairs = d02_ngram_jaccard.fn(s, dir).select("id_a", "id_b")
    val nonReps = NearDup.connectedComponents(pairs)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as("doc_id"))
    Tables.documents(s, dir)
      .join(nonReps, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang")
  }

  // ---------------------------------------------------------------- d08
  /** DECONTAMINATION: flag training documents sharing ≥ `minShared`
    * 3-gram shingles with any document of a held-out evaluation set (here
    * every 50th doc stands in as the benchmark) — the cross-corpus twin of
    * d02 every lab runs before training. Joins 8-byte shingle hashes, the
    * eval side is tiny → broadcast; output is per-train-doc contamination
    * evidence (worst eval doc, shared-shingle count).
    */
  val d08_contamination = q("d08_contamination", Some(
    s"""WITH $shingleSql,
       |hs AS (SELECT DISTINCT doc_id AS id, hash(shingle) AS h FROM s),
       |ev AS (SELECT id, h FROM hs WHERE id % 50 = 0),
       |tr AS (SELECT id, h FROM hs WHERE id % 50 <> 0),
       |shared AS (
       |  SELECT tr.id AS doc_id, ev.id AS eval_id, COUNT(*) AS n_shared
       |  FROM tr JOIN ev ON tr.h = ev.h GROUP BY 1, 2),
       |best AS (SELECT doc_id, eval_id, n_shared,
       |           ROW_NUMBER() OVER (PARTITION BY doc_id
       |             ORDER BY n_shared DESC, eval_id) AS rn
       |         FROM shared WHERE n_shared >= 3)
       |SELECT doc_id, eval_id, n_shared FROM best WHERE rn = 1""".stripMargin)) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    // NOTE the oracle hashes shingle TEXT with DuckDB's hash() while the
    // engine uses xxhash64 — join AND count are over distinct shingles, so
    // any 64-bit hash gives identical counts (collisions aside, ~1e-11)
    val sh = NearDup.hashedShingles(Tables.documents(s, dir), "doc_id", "text", 3)
      .withColumnRenamed("shingle", "h")
    val ev = sh.filter(col("id") % 50 === 0)
      .select(col("id").as("eval_id"), col("h"))
    val tr = sh.filter(col("id") % 50 =!= 0)
      .select(col("id").as("doc_id"), col("h"))
    val shared = tr.join(broadcast(ev), "h")
      .groupBy("doc_id", "eval_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3)
    val w = Window.partitionBy("doc_id")
      .orderBy(col("n_shared").desc, col("eval_id"))
    shared.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("doc_id", "eval_id", "n_shared")
  }

  // ---------------------------------------------------------------- d09
  /** DECONTAMINATION APPLY, bloom-prefiltered ([[graft.ext.BloomJoin]]):
    * emit the CLEAN training corpus — docs sharing NO shingle with the
    * eval set. The semi join that finds contaminated ids is pruned
    * map-side by a Bloom filter over the eval shingle hashes BEFORE any
    * shuffle: at 100 TB the eval hash set (10⁷-10⁸ keys) is too big for a
    * broadcast hash relation but fits as a ~tens-of-MB bloom, so only the
    * sliver of training shingles that might match ever moves. The exact
    * join downstream drops the bloom's false positives, so the result is
    * IDENTICAL to the plain-join form — the oracle is plain SQL, no
    * golden needed.
    */
  val d09_bloom_decontaminate = q("d09_bloom_decontaminate", Some(
    s"""WITH $shingleSql,
       |hs AS (SELECT DISTINCT doc_id AS id, hash(shingle) AS h FROM s),
       |ev AS (SELECT DISTINCT h FROM hs WHERE id % 50 = 0),
       |tr AS (SELECT id, h FROM hs WHERE id % 50 <> 0),
       |dirty AS (SELECT DISTINCT tr.id FROM tr JOIN ev ON tr.h = ev.h)
       |SELECT t.id AS doc_id FROM (SELECT DISTINCT id FROM tr) t
       |WHERE t.id NOT IN (SELECT id FROM dirty)""".stripMargin)) { (s, dir) =>
    // oracle hashes with DuckDB hash(), engine with xxhash64: membership is
    // over DISTINCT shingles both sides, so any 64-bit hash agrees (same
    // argument as d08)
    val sh = NearDup.hashedShingles(Tables.documents(s, dir), "doc_id", "text", 3)
      .withColumnRenamed("shingle", "h")
    val ev = sh.filter(col("id") % 50 === 0).select("h").distinct()
    val tr = sh.filter(col("id") % 50 =!= 0)
    val dirty = graft.ext.BloomJoin.semi(tr, ev, Seq("h"),
        expectedItems = 1 << 20, fpp = 0.01)
      .select(col("id")).distinct()
    tr.select("id").distinct()
      .join(broadcast(dirty), Seq("id"), "left_anti")
      .select(col("id").as("doc_id"))
  }

  /** Shared oracle for d10/d11: the exact cross-side Jaccard pairs between
    * the simulated new batch (every 10th doc) and the standing corpus — the
    * two engine paths (direct two-frame, persisted index) must both
    * hash-match it.
    */
  private val incrementalOracle: String =
    s"""WITH $shingleSql
       |SELECT CASE WHEN id_a % 10 = 0 THEN id_a ELSE id_b END AS id_new,
       |       CASE WHEN id_a % 10 = 0 THEN id_b ELSE id_a END AS id_old,
       |       ROUND(jaccard, 6) AS jaccard
       |FROM j
       |WHERE jaccard >= 0.7 AND ((id_a % 10 = 0) <> (id_b % 10 = 0))""".stripMargin

  // ---------------------------------------------------------------- d10
  /** INCREMENTAL ingest dedup ([[NearDup.incrementalNearDupPairs]]): every
    * 10th doc plays the new daily batch, the rest the standing corpus; the
    * batch's LSH band-buckets join against the corpus's (persistable)
    * band-bucket index, so old-old pairs never expand and per-batch cost
    * tracks the batch, not corpus². Oracle = the exact cross-side Jaccard
    * pairs at the threshold — like d03, hash-match doubles as an LSH
    * recall check (b=32, r=2 catches s ≥ 0.7 w.p. 1 − 4e-10).
    */
  val d10_incremental_neardup = q("d10_incremental_neardup",
    Some(incrementalOracle)) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    NearDup.incrementalNearDupPairs(
        docs.filter(col("doc_id") % 10 === 0), docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", threshold = 0.7)
      .select(col("id_new"), col("id_old"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---------------------------------------------------------------- d11
  /** d10 from a PERSISTED corpus index ([[NearDup.buildIndex]] + the indexed
    * [[NearDup.incrementalNearDupPairs]] overload) — the production shape
    * where the standing corpus is shingled ONCE, its hashed shingles and LSH
    * band-buckets live as warehouse tables, and each daily batch joins the
    * READ-BACK index without ever touching corpus text again. The corpus
    * text is staged to its own parquet table first so the plan audit can
    * prove the point: PlanAuditSpec asserts the returned frame's plan never
    * references the corpus-text path at all. Oracle = d10's — the persisted
    * index must reproduce the direct two-frame path exactly.
    */
  val d11_indexed_neardup = q("d11_indexed_neardup",
    Some(incrementalOracle)) { (s, dir) =>
    import graft.sources.ParquetWarehouse
    val docs = Tables.documents(s, dir)
    // batch N-1's job (staged once per JVM, untimed in later calls):
    // persist the standing corpus, shingle it ONCE, store the index
    // relations alongside
    val root = DedupStaging.ensure("d11", dir) { r =>
      ParquetWarehouse.overwriteAll(
        docs.filter(col("doc_id") % 10 =!= 0), s"$r/neardup_corpus")
      NearDup.NearDupIndex.save(
        NearDup.buildIndex(ParquetWarehouse.read(s, s"$r/neardup_corpus"),
          "doc_id", "text"),
        s"$r/neardup_index")
    }
    // batch N's job: dedup the new ingest against the read-back index —
    // no corpus-text scan anywhere in this plan, and no shuffle of the
    // corpus-side index relations either (PlanAuditSpec asserts both)
    val index = NearDup.NearDupIndex.load(s, s"$root/neardup_index")
    NearDup.incrementalNearDupPairs(
        docs.filter(col("doc_id") % 10 === 0), index,
        "doc_id", "text", threshold = 0.7, maxBucketSize = 1000)
      .select(col("id_new"), col("id_old"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---------------------------------------------------------------- d12
  /** Index EVOLUTION under the gate ([[NearDup.extendIndex]]): the corpus
    * index is built in two installments — docs with doc_id % 10 ≥ 2 first,
    * then the % 10 = 1 slice folded in via extendIndex (only that slice is
    * shingled) — persisted, read back, and the % 10 = 0 batch deduped
    * against it. The union corpus is exactly d10/d11's old side, so the
    * SAME oracle must hash-match: growing the index incrementally is
    * semantically invisible. This is the full daily cycle d11 starts:
    * day N dedups against the index, day N's survivors extend it for
    * day N+1.
    */
  val d12_extended_neardup = q("d12_extended_neardup",
    Some(incrementalOracle)) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    // staged once per JVM: installment 1 (the standing corpus), then
    // installment 2 (yesterday's batch) folds in via extendIndex — only IT
    // gets shingled — and the grown index persists
    val root = DedupStaging.ensure("d12", dir) { r =>
      val base = NearDup.buildIndex(
        docs.filter(col("doc_id") % 10 >= 2), "doc_id", "text")
      val full = NearDup.extendIndex(base,
        docs.filter(col("doc_id") % 10 === 1), "doc_id", "text")
      NearDup.NearDupIndex.save(full, s"$r/neardup_idx2")
    }
    val index = NearDup.NearDupIndex.load(s, s"$root/neardup_idx2")
    NearDup.incrementalNearDupPairs(
        docs.filter(col("doc_id") % 10 === 0), index,
        "doc_id", "text", threshold = 0.7, maxBucketSize = 1000)
      .select(col("id_new"), col("id_old"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---------------------------------------------------------------- d13
  /** Index COMPACTION under the gate ([[NearDup.compactIndex]]): the corpus
    * index is built in three installments (so the stored bucket relation
    * carries real append fragments), then docs divisible by 7 are dropped
    * from the corpus and the index is compacted — dead ids anti-joined
    * away, bucket fragments folded back to one row per bucket — persisted,
    * and read back. The oracle recomputes what the SURVIVING corpus's index
    * must contain from first principles: distinct-shingle row count and doc
    * count for the shingle relation, `bands × docs` total bucket membership
    * (every doc occupies exactly one bucket per band), and the
    * one-row-per-bucket invariant that proves fragments actually merged.
    * Any dead id left behind, lost survivor, or unmerged fragment breaks a
    * count and fails the hash gate.
    */
  val d13_index_compaction = q("d13_index_compaction", Some(
    s"""WITH w AS (SELECT doc_id, string_split(${normSql("text")}, ' ') AS toks
       |           FROM documents WHERE doc_id % 7 <> 0),
       |g AS (SELECT doc_id,
       |        unnest(CASE WHEN len(toks) >= 3
       |               THEN [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
       |               ELSE [array_to_string(toks, ' ')] END) AS shingle
       |      FROM w),
       |s AS (SELECT DISTINCT doc_id, shingle FROM g)
       |SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       CAST(COUNT(*) AS BIGINT) AS n_shingle_rows,
       |       CAST(COUNT(DISTINCT doc_id) * 32 AS BIGINT) AS n_bucket_ids,
       |       TRUE AS one_row_per_bucket
       |FROM s""".stripMargin)) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    // staged once per JVM: three installments = real fragmentation in the
    // stored bucket relation (the compaction INPUT; building it is not the
    // operator under test)
    val root = DedupStaging.ensure("d13", dir) { r =>
      val i1 = NearDup.buildIndex(docs.filter(col("doc_id") % 10 >= 2), "doc_id", "text")
      val i2 = NearDup.extendIndex(i1, docs.filter(col("doc_id") % 10 === 1), "doc_id", "text")
      val i3 = NearDup.extendIndex(i2, docs.filter(col("doc_id") % 10 === 0), "doc_id", "text")
      NearDup.NearDupIndex.save(i3, s"$r/neardup_idx3")
    }
    // maintenance job (the measured op): drop the %7 docs, compact, persist
    // to a fresh dir
    val full = NearDup.NearDupIndex.load(s, s"$root/neardup_idx3")
    val keep = docs.filter(col("doc_id") % 7 =!= 0).select(col("doc_id").as("id"))
    NearDup.NearDupIndex.save(NearDup.compactIndex(full, keep),
      s"$root/neardup_idx3_compact")
    // audit the STORED relations, not the in-flight frames
    val back = NearDup.NearDupIndex.load(s, s"$root/neardup_idx3_compact")
    val shStats = back.shingles.agg(
      countDistinct(col("id")).as("n_docs"),
      count(lit(1)).as("n_shingle_rows"))
    val bkStats = back.buckets.agg(
      sum(size(col("ids"))).cast("long").as("n_bucket_ids"),
      (count(lit(1)) === countDistinct(col("bk"))).as("one_row_per_bucket"))
    shStats.crossJoin(bkStats)
  }

  // ---------------------------------------------------------------- d14
  /** Dedup with the PRODUCTION keep policy ([[graft.operators.Dedup
    * .keepBest]]): keep the LONGEST member of each near-dup cluster
    * (tie-break min doc_id) instead of d07's min-id baseline — "keep the
    * most complete version" is what corpora curation actually wants when
    * near-dups are subsets/truncations of each other. Same cluster input
    * as d06/d07 (exact-Jaccard pairs at 0.5 so the oracle replays the
    * clustering exactly); at scale the pair source is d03's LSH relation.
    */
  val d14_dedup_keep_best = q("d14_dedup_keep_best", Some(
    s"""WITH RECURSIVE $shingleSql,
       |e AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.5),
       |sym AS (SELECT id_a AS src, id_b AS dst FROM e
       |        UNION ALL SELECT id_b, id_a FROM e),
       |walk(id, comp) AS (
       |  SELECT DISTINCT src, src FROM sym
       |  UNION
       |  SELECT s.dst, w.comp FROM walk w JOIN sym s ON w.id = s.src),
       |comps AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id),
       |labeled AS (
       |  SELECT d.doc_id, d.lang, length(d.text) AS text_len,
       |         COALESCE(c.comp, d.doc_id) AS comp
       |  FROM documents d LEFT JOIN comps c ON d.doc_id = c.id),
       |ranked AS (
       |  SELECT doc_id, lang, text_len,
       |         ROW_NUMBER() OVER (PARTITION BY comp
       |           ORDER BY text_len DESC, doc_id) AS rn
       |  FROM labeled)
       |SELECT doc_id, lang, CAST(text_len AS INT) AS text_len
       |FROM ranked WHERE rn = 1""".stripMargin)) { (s, dir) =>
    val pairs = d02_ngram_jaccard.fn(s, dir).select("id_a", "id_b")
    val comps = NearDup.connectedComponents(pairs)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), length(col("text")).as("text_len"))
    graft.operators.Dedup.keepBest(docs, "doc_id", comps,
      Seq(col("text_len").desc, col("doc_id")))
  }

  // ---------------------------------------------------------------- d15
  /** Exact-substring (token-span) duplication report: per document, how
    * many 8-token windows are duplicated verbatim across documents and
    * how many tokens the union of those spans covers (Lee et al. 2022
    * sequence-level dedup, detection side; t19 is the removal side).
    * The DuckDB oracle recomputes window duplication and interval
    * coverage from scratch (position explode + DISTINCT), a different
    * algorithm than the engine's merged-interval fold — agreeing counts
    * prove the fold.
    */
  val d15_span_coverage = q("d15_span_coverage", Some(
    s"""WITH t AS (SELECT doc_id,
       |        [x for x in string_split(${normSql("text")}, ' ') if x <> ''] AS toks
       |      FROM documents),
       |b AS (SELECT doc_id, toks, len(toks) AS n_tok FROM t),
       |w0 AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 7)) AS s
       |       FROM b WHERE len(toks) >= 8),
       |w AS (SELECT doc_id, s, array_to_string(toks[s+1:s+8], ' ') AS w FROM w0),
       |dup AS (SELECT w FROM w GROUP BY w HAVING count(DISTINCT doc_id) >= 2),
       |ds AS (SELECT doc_id, s FROM w WHERE w IN (SELECT w FROM dup)),
       |agg AS (SELECT doc_id, count(*) AS dup_windows FROM ds GROUP BY doc_id),
       |cov AS (SELECT doc_id, count(DISTINCT p) AS covered_tokens
       |        FROM (SELECT doc_id, unnest(range(s, s + 8)) AS p FROM ds)
       |        GROUP BY doc_id)
       |SELECT b.doc_id, b.n_tok AS n_tokens,
       |  greatest(0, b.n_tok - 7) AS n_windows,
       |  coalesce(agg.dup_windows, 0) AS dup_windows,
       |  coalesce(cov.covered_tokens, 0) AS covered_tokens
       |FROM b LEFT JOIN agg USING (doc_id) LEFT JOIN cov USING (doc_id)"""
      .stripMargin)) { (s, dir) =>
    graft.operators.SpanDedup.coverage(
      Tables.documents(s, dir), "doc_id", "text", n = 8, minDocs = 2)
  }

  // ---------------------------------------------------------------- d16
  /** SPAN-level n-gram decontamination (GPT-3/PaLM style): excise every
    * 8-token run of a training document that appears verbatim in the
    * benchmark set (here: every 10th document plays the eval set),
    * keeping the rest of the document — d08/d09 drop whole documents,
    * this keeps the clean remainder. The benchmark side reduces to its
    * distinct window strings (broadcast; the corpus never shuffles).
    */
  val d16_span_decontaminate = q("d16_span_decontaminate", Some(
    s"""WITH t AS (SELECT doc_id,
       |        [x for x in string_split(${normSql("text")}, ' ') if x <> ''] AS toks
       |      FROM documents),
       |tgt AS (SELECT doc_id, toks FROM t WHERE doc_id % 10 <> 0),
       |ref AS (SELECT doc_id, toks FROM t WHERE doc_id % 10 = 0),
       |rw AS (SELECT DISTINCT array_to_string(toks[s+1:s+8], ' ') AS w
       |       FROM (SELECT toks, unnest(range(0, len(toks) - 7)) AS s
       |             FROM ref WHERE len(toks) >= 8)),
       |w AS (SELECT doc_id, s, array_to_string(toks[s+1:s+8], ' ') AS w
       |      FROM (SELECT doc_id, toks, unnest(range(0, len(toks) - 7)) AS s
       |            FROM tgt WHERE len(toks) >= 8)),
       |ds AS (SELECT doc_id, s FROM w WHERE w IN (SELECT w FROM rw)),
       |p AS (SELECT doc_id, list(DISTINCT pos) AS ps
       |      FROM (SELECT doc_id, unnest(range(s, s + 8)) AS pos FROM ds)
       |      GROUP BY doc_id)
       |SELECT b.doc_id,
       |  coalesce(array_to_string(
       |    [b.toks[CAST(i AS INT) + 1] for i in range(0, len(b.toks))
       |     if p.ps IS NULL OR NOT list_contains(p.ps, i)], ' '), '') AS text,
       |  coalesce(len(p.ps), 0) AS removed_tokens
       |FROM tgt b LEFT JOIN p USING (doc_id)""".stripMargin)) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    graft.operators.SpanDedup.decontaminateSpans(
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
      docs.filter(col("doc_id") % 10 === 0), "text", n = 8)
  }

  // ---------------------------------------------------------------- d17
  /** Asymmetric shingle CONTAINMENT (|A∩B| / |A|) — the excerpt/quote
    * detector symmetric Jaccard misses: a short document fully inside a
    * long one scores 1.0 here while its Jaccard stays near |A|/|B|.
    * Same exact 8-byte-hash join shape as d02.
    */
  val d17_containment_pairs = q("d17_containment_pairs", Some(
    s"""WITH w AS (SELECT doc_id, string_split(${normSql("text")}, ' ') AS toks FROM documents),
       |g AS (SELECT doc_id,
       |        unnest(CASE WHEN len(toks) >= 3
       |               THEN [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
       |               ELSE [array_to_string(toks, ' ')] END) AS shingle
       |      FROM w),
       |s AS (SELECT DISTINCT doc_id, shingle FROM g),
       |sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
       |i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |      FROM s a JOIN s b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |  ROUND(CAST(i AS DOUBLE) / x.n, 6) AS cont_a_in_b,
       |  ROUND(CAST(i AS DOUBLE) / y.n, 6) AS cont_b_in_a
       |FROM i JOIN sz x ON id_a = x.doc_id JOIN sz y ON id_b = y.doc_id
       |WHERE CAST(i AS DOUBLE) / x.n >= 0.8
       |   OR CAST(i AS DOUBLE) / y.n >= 0.8""".stripMargin)) { (s, dir) =>
    NearDup.containmentPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, minContainment = 0.8)
      .select(col("id_a"), col("id_b"),
        round(col("cont_a_in_b"), 6).as("cont_a_in_b"),
        round(col("cont_b_in_a"), 6).as("cont_b_in_a"))
  }

  // ---------------------------------------------------------------- d18
  /** MAXIMAL duplicated-run length
    * ([[graft.operators.SpanDedup.maxDuplicatedRun]]): the arbitrary-
    * length question d15's fixed n = 8 windows cannot answer — "what is
    * the LONGEST span each document shares verbatim with another?" —
    * solved by the multi-resolution doubling composition (log₂(cap)
    * candidate-promoted levels + one bounded refinement pass whose
    * fan-out is ∝ the duplicated footprint, never corpus²). The oracle
    * brute-forces every window of every length 1…64 — exactly the
    * all-pairs cost the engine's composition avoids — proving the
    * doubling + refinement is EXACT, not approximate.
    */
  val d18_max_dup_run = q("d18_max_dup_run", Some(
    s"""WITH t AS (SELECT doc_id,
       |        [x for x in string_split(${normSql("text")}, ' ') if x <> ''] AS toks
       |      FROM documents),
       |b AS (SELECT doc_id, toks, len(toks) AS n FROM t),
       |w AS (SELECT doc_id, m, array_to_string(toks[s+1:s+CAST(m AS INT)], ' ') AS w
       |      FROM (SELECT doc_id, toks, n, unnest(range(0, n)) AS s FROM b),
       |           (SELECT unnest(range(1, 65)) AS m)
       |      WHERE s + m <= n),
       |dup AS (SELECT w FROM w GROUP BY w HAVING count(DISTINCT doc_id) >= 2),
       |mx AS (SELECT doc_id, MAX(m) AS max_dup_run
       |       FROM w WHERE w IN (SELECT w FROM dup) GROUP BY doc_id)
       |SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens,
       |  coalesce(mx.max_dup_run, 0) AS max_dup_run
       |FROM b LEFT JOIN mx USING (doc_id)""".stripMargin)) { (s, dir) =>
    graft.operators.SpanDedup.maxDuplicatedRun(
      Tables.documents(s, dir), "doc_id", "text", minDocs = 2, cap = 64)
  }

  // ---------------------------------------------------------------- d19
  /** CONTAMINATION COVERAGE REPORT
    * ([[graft.operators.SpanDedup.contaminationCoverage]]): per-document
    * benchmark-overlap statistics — contaminated window count, tokens
    * covered by the union of contaminated spans (merged-interval fold),
    * and the covered fraction — the per-eval-set number a pretraining
    * paper publishes, and the triage signal between span excision (d16)
    * and whole-document drop (d08). Every 10th document plays the eval
    * set (d16's convention); every target document reports, zeroes when
    * clean.
    */
  val d19_contamination_coverage = q("d19_contamination_coverage", Some(
    s"""WITH t AS (SELECT doc_id,
       |        [x for x in string_split(${normSql("text")}, ' ') if x <> ''] AS toks
       |      FROM documents),
       |refw AS (SELECT DISTINCT array_to_string(toks[s+1:s+8], ' ') AS w
       |         FROM (SELECT toks, unnest(range(0, len(toks) - 7)) AS s
       |               FROM t WHERE doc_id % 10 = 0 AND len(toks) >= 8)),
       |b AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE doc_id % 10 <> 0),
       |w0 AS (SELECT doc_id, toks, unnest(range(0, len(toks) - 7)) AS s
       |       FROM b WHERE len(toks) >= 8),
       |w AS (SELECT doc_id, s, array_to_string(toks[s+1:s+8], ' ') AS w FROM w0),
       |cs AS (SELECT doc_id, s FROM w WHERE w IN (SELECT w FROM refw)),
       |agg AS (SELECT doc_id, count(*) AS contaminated_windows FROM cs GROUP BY 1),
       |cov AS (SELECT doc_id, count(DISTINCT p) AS contaminated_tokens
       |        FROM (SELECT doc_id, unnest(range(s, s + 8)) AS p FROM cs)
       |        GROUP BY 1)
       |SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens,
       |  greatest(0, b.n - 7) AS n_windows,
       |  coalesce(agg.contaminated_windows, 0) AS contaminated_windows,
       |  coalesce(cov.contaminated_tokens, 0) AS contaminated_tokens,
       |  ROUND(CASE WHEN b.n > 0
       |        THEN CAST(coalesce(cov.contaminated_tokens, 0) AS DOUBLE)
       |             / CAST(b.n AS DOUBLE) ELSE 0.0 END, 6) AS contaminated_frac
       |FROM b LEFT JOIN agg USING (doc_id) LEFT JOIN cov USING (doc_id)"""
      .stripMargin)) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    graft.operators.SpanDedup.contaminationCoverage(
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
      docs.filter(col("doc_id") % 10 === 0), "text", n = 8)
  }

  // ---------------------------------------------------------------- d20
  /** SPLIT-LEAKAGE AUDIT: near-duplicate pairs that STRADDLE t45's
    * train/val/test split — the eval-integrity check every training
    * pipeline should run after carving a held-out set (a test document
    * whose near-duplicate sits in train is memorized, not held out; Lee
    * et al. 2022 measure exactly this leak). Pure composition of two
    * gated surfaces: [[graft.operators.Sampling.deterministicSplit]]
    * (t45's exact seeded assignment) joined onto d02's exact 3-gram
    * Jaccard pair relation, kept where the two sides land in DIFFERENT
    * splits. The split relation is corpus-sized but the pair relation is
    * the tiny near-dup subset, so the audit joins broadcast-small onto
    * it; at 100 TB substitute d03's LSH pairs — the audit is agnostic to
    * the edge source (d06's note). An empty result IS the passing audit;
    * the sf fixture's planted duplicates make this one non-empty so the
    * oracle hash proves the detection, not just the plumbing.
    */
  /** Release the t45 row-level split into a [[graft.operators
    * .SplitManifest]] store, once per (corpus, JVM) — the staging
    * convention of the d11-d13 index fixtures. d20's audit and src21's
    * round-trip both read THIS store, so the (seed, fractions, strata)
    * constants exist exactly once: here, at the release site.
    */
  private[queries] def rowSplitStore(s: org.apache.spark.sql.SparkSession,
                                     dir: String): String =
    DedupStaging.ensure("splitrow", dir) { root =>
      val spec = graft.operators.SplitManifest.Spec(seed = 42L,
        fractions = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)),
        strataCols = Seq("lang"), keyCols = Seq("doc_id"))
      val assignment = graft.operators.Sampling.deterministicSplit(
          Tables.documents(s, dir).select("doc_id", "lang"),
          spec.strataCols, spec.keyCols, spec.fractions, spec.seed)
        .select("doc_id", "lang", "split")
      graft.operators.SplitManifest.release(assignment, root, spec)
    }

  /** Release the d21 cluster-grouped split (leakage-PROOF form) into a
    * manifest store, once per (corpus, JVM). d22's guard reads this
    * released assignment — the guard audits what shipped.
    */
  private[queries] def groupSplitStore(s: org.apache.spark.sql.SparkSession,
                                       dir: String): String =
    DedupStaging.ensure("splitgrp", dir) { root =>
      val spec = graft.operators.SplitManifest.Spec(seed = 7L,
        fractions = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)),
        strataCols = Nil, keyCols = Seq("doc_id"), groupCol = Some("grp"))
      graft.operators.SplitManifest.release(
        clusterSplit(s, dir).select("doc_id", "grp", "split"), root, spec)
    }

  val d20_split_leakage = q("d20_split_leakage", Some(
    s"""WITH $shingleSql,
       |r AS (SELECT doc_id,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY md5('42|' || CAST(doc_id AS VARCHAR)), doc_id) AS rn,
       |    COUNT(*) OVER (PARTITION BY lang) AS n
       |  FROM documents),
       |sp AS (SELECT doc_id,
       |    CASE WHEN rn <= floor(CAST(0.8 AS DOUBLE) * n) THEN 'train'
       |         WHEN rn <= floor((CAST(0.8 AS DOUBLE) + CAST(0.1 AS DOUBLE)) * n)
       |              THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM r)
       |SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard,
       |  sa.split AS split_a, sb.split AS split_b
       |FROM j
       |JOIN sp sa ON j.id_a = sa.doc_id
       |JOIN sp sb ON j.id_b = sb.doc_id
       |WHERE jaccard >= 0.5 AND sa.split <> sb.split""".stripMargin)) { (s, dir) =>
    // the audit consumes the RELEASED artifact: assignment + spec come
    // from the manifest store (round 17 — src21); the seed/fraction
    // constants live only at the release site
    val split = graft.operators.SplitManifest
      .readAssignment(s, rowSplitStore(s, dir))
      .select("doc_id", "split")
    d02_ngram_jaccard.fn(s, dir)
      .join(split.select(col("doc_id").as("id_a"), col("split").as("split_a")),
        "id_a")
      .join(split.select(col("doc_id").as("id_b"), col("split").as("split_b")),
        "id_b")
      .filter(col("split_a") =!= col("split_b"))
      .select("id_a", "id_b", "jaccard", "split_a", "split_b")
  }

  // ----------------------------------------------------------- d21/d22
  /** Shared DuckDB CTE chain for the CLUSTER-GROUPED split: d06's
    * recursive connected components over d02's exact pair relation, one
    * group per cluster (singletons group as themselves), groups ranked
    * globally by the seed-7 md5 draw with exact binary64 floor
    * boundaries (t45's arithmetic, over GROUP counts).
    */
  private def clusterSplitSqlCtes: String =
    s"""$shingleSql,
       |e AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.5),
       |sym AS (SELECT id_a AS src, id_b AS dst FROM e
       |        UNION ALL SELECT id_b, id_a FROM e),
       |walk(id, comp) AS (
       |  SELECT DISTINCT src, src FROM sym
       |  UNION
       |  SELECT s.dst, w.comp FROM walk w JOIN sym s ON w.id = s.src),
       |comps AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id),
       |gr AS (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS grp
       |       FROM documents d LEFT JOIN comps c ON d.doc_id = c.id),
       |gg AS (SELECT DISTINCT grp FROM gr),
       |rk AS (SELECT grp, row_number() OVER (
       |         ORDER BY md5('7|' || CAST(grp AS VARCHAR)), grp) AS rn,
       |         COUNT(*) OVER () AS n FROM gg),
       |sp AS (SELECT grp,
       |    CASE WHEN rn <= floor(CAST(0.8 AS DOUBLE) * n) THEN 'train'
       |         WHEN rn <= floor((CAST(0.8 AS DOUBLE) + CAST(0.1 AS DOUBLE)) * n)
       |              THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM rk),
       |ds AS (SELECT doc_id, grp, split FROM gr JOIN sp USING (grp))"""
      .stripMargin

  /** The Spark twin of [[clusterSplitSqlCtes]]'s `ds` relation, plus the
    * materialized pair relation for callers that consume it again (the
    * d22 audit). The pairs are localCheckpointed ONCE: connected
    * components consumes them eagerly anyway, and without the
    * checkpoint the audit's lazy join would re-run d02's whole shingle
    * join a second time (measured ~2 s of the query's bench min). At
    * corpus scale the pair relation is the bounded near-dup subset —
    * the same materialization CC's iteration already implies. Lifetime:
    * localCheckpoint blocks live OUTSIDE the SQL cache (clearCache does
    * not release them) and are reclaimed by the ContextCleaner once the
    * returned frames become unreachable — the same contract as
    * [[graft.operators.SpanDedup.maxDuplicatedRun]]'s checkpointed base
    * (bench drops each query's frames between runs, so blocks do not
    * accumulate across passes).
    */
  private def clusterSplitAndPairs(s: org.apache.spark.sql.SparkSession,
                                   dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val pairs = d02_ngram_jaccard.fn(s, dir).select("id_a", "id_b")
      .localCheckpoint(true)
    val comps = NearDup.connectedComponents(pairs)
    val grouped = Tables.documents(s, dir).select(col("doc_id"))
      .join(comps.select(col("id").as("doc_id"), col("comp")),
        Seq("doc_id"), "left")
      .withColumn("grp", coalesce(col("comp"), col("doc_id")))
      .drop("comp")
    (graft.operators.Sampling.groupSplit(grouped, Nil, Seq("grp"),
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), seed = 7L), pairs)
  }

  private def clusterSplit(s: org.apache.spark.sql.SparkSession,
                           dir: String): org.apache.spark.sql.DataFrame =
    clusterSplitAndPairs(s, dir)._1

  /** CLUSTER-GROUPED train/val/test split
    * ([[graft.operators.Sampling.groupSplit]]): the leakage-PROOF form
    * of t45 — the split's atoms are d06's near-dup CLUSTERS (connected
    * components over d02's exact pair relation; un-clustered documents
    * are their own group), so a near-dup pair straddling train/test is
    * impossible BY CONSTRUCTION, not merely audited after the fact
    * (d20 detects the leak a row-level split allows; this prevents it —
    * the Lee et al. 2022 recommendation). Proportions are group-exact
    * floors over the cluster count; the whole chain — pairs, recursive
    * clustering, group draw, boundaries — is DuckDB-replayed.
    */
  val d21_cluster_group_split = q("d21_cluster_group_split", Some(
    s"""WITH RECURSIVE $clusterSplitSqlCtes
       |SELECT doc_id, grp, split FROM ds""".stripMargin)) { (s, dir) =>
    clusterSplit(s, dir).select("doc_id", "grp", "split")
  }

  /** The GUARD on d21: zero near-dup pairs straddle the cluster-grouped
    * split — both sides of every d02 pair are in the same cluster, every
    * cluster is one group, every group lands in one split, so
    * `n_straddling` is 0 by construction and the oracle hash proves the
    * whole composition end-to-end (against d20's row-level split, the
    * same audit reports a non-zero straddle count on this corpus).
    */
  val d22_group_split_guard = q("d22_group_split_guard", Some(
    s"""WITH RECURSIVE $clusterSplitSqlCtes,
       |pe AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.5)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(coalesce(SUM(CASE WHEN sa.split <> sb.split
       |                         THEN 1 ELSE 0 END), 0) AS BIGINT)
       |    AS n_straddling
       |FROM pe
       |JOIN ds sa ON pe.id_a = sa.doc_id
       |JOIN ds sb ON pe.id_b = sb.doc_id""".stripMargin)) { (s, dir) =>
    // the guard audits the RELEASED grouped assignment (manifest store,
    // round 17), not a re-derivation — the pair relation is recomputed
    // fresh because the audit is exactly what a post-release check runs
    val ds = graft.operators.SplitManifest
      .readAssignment(s, groupSplitStore(s, dir))
      .select(col("doc_id"), col("split"))
    val pairs = d02_ngram_jaccard.fn(s, dir).select("id_a", "id_b")
    pairs
      .join(ds.select(col("doc_id").as("id_a"), col("split").as("split_a")),
        "id_a")
      .join(ds.select(col("doc_id").as("id_b"), col("split").as("split_b")),
        "id_b")
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(when(col("split_a") =!= col("split_b"), 1L)
          .otherwise(0L)), lit(0L)).as("n_straddling"))
  }

  val all: Seq[GraftQuery] = Seq(
    d01_exact_dup_groups, d02_ngram_jaccard, d03_minhash_lsh, d04_simhash,
    d05_simhash_neardup, d06_dedup_clusters, d07_dedup_apply,
    d08_contamination, d09_bloom_decontaminate, d10_incremental_neardup,
    d11_indexed_neardup, d12_extended_neardup, d13_index_compaction,
    d14_dedup_keep_best, d15_span_coverage, d16_span_decontaminate,
    d17_containment_pairs, d18_max_dup_run, d19_contamination_coverage,
    d20_split_leakage, d21_cluster_group_split, d22_group_split_guard)
}
