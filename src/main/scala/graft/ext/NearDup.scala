package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Near-duplicate detection for large text corpora: word-shingling,
  * MinHash signatures, LSH banding for candidate generation, and exact
  * Jaccard verification of candidates.
  *
  * Scale design (the whole point of MinHash+LSH):
  *   - shingling + signatures are map-side only (one shuffle to aggregate
  *     per-doc minima, combiner-friendly `min` aggregates);
  *   - candidate generation shuffles SIGNATURES (k longs/doc), never text;
  *   - the quadratic step is confined to per-bucket groups; `maxBucketSize`
  *     drops degenerate buckets (boilerplate) instead of letting one hot
  *     bucket quadratically explode — the standard web-dedup trade-off;
  *   - exact verification joins shingle sets only for surviving candidate
  *     pairs.
  *
  * With b bands of r rows (k = b·r hashes), P(candidate | jaccard=s) =
  * 1−(1−s^r)^b; the default (b=32, r=2) catches s ≥ 0.5 with ≥ 99.99 %
  * probability while pruning low-similarity pairs aggressively.
  */
object NearDup {

  /** Distinct word n-gram shingles per document: (id, shingle).
    *
    * Two-step on purpose: the tokenized `words` array is materialized in its
    * own projection BEFORE the generator. Catalyst does not collapse a
    * Project under Generate, so inlining the split+regex chain into the
    * per-shingle lambda would re-run it for every element reference —
    * measured 5-10x slower at sf0.1. `element_at` is O(1) per gram vs
    * `slice`'s per-position array copy.
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val tokenized = df.select(col(idCol).as("id"),
      split(TextFunctions.normalizeWs(col(textCol)), " ").as("__w"))
    val w = col("__w")
    val grams = when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*)))
      .otherwise(array(concat_ws(" ", w)))
    tokenized.select(col("id"), explode(grams).as("shingle")).distinct()
  }

  /** MinHash signature per id from a (id, shingle) relation: each shingle is
    * string-hashed ONCE (xxhash64), then the k "independent" hash functions
    * re-hash that single LONG with a per-function seed — k fixed-width
    * 8-byte hashes instead of k variable-length string hashes per shingle
    * (an affine a·h+b family would be cheaper still, but ANSI mode makes
    * wrap-around long multiplication an error). One `min` aggregate each;
    * partial aggregation makes this a single cheap shuffle of k longs/doc.
    */
  def minhashSignatures(sh: DataFrame, numHashes: Int = 64): DataFrame = {
    val base = sh.select(col("id"), xxhash64(col("shingle")).as("__h"))
    val mins: Seq[Column] = (0 until numHashes).map { i =>
      min(xxhash64(lit(i), col("__h"))).as(s"h$i")
    }
    base.groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH banding: hash r consecutive signature entries per band, bucket by
    * (band, hash), emit candidate pairs (idA < idB) from co-bucketed docs.
    *
    * ONE shuffle: bucket members are collect_list'd per (band, bandhash) and
    * pairs expand IN-ROW via a double explode — no second shuffle for a
    * self-join and the bucket-size guard (degenerate boilerplate buckets
    * would otherwise explode quadratically) falls out of `size(ids)` for
    * free. Bucket lists are bounded by `maxBucketSize`, so collected rows
    * stay small. NOTE the cap trades recall for bounded work: pairs whose
    * only shared bucket exceeds `maxBucketSize` members (large boilerplate
    * cliques) are DROPPED — any exactness/recall guarantee downstream holds
    * only for buckets within the cap; pass `Int.MaxValue` for lossless
    * candidate generation at small scale.
    */
  def lshCandidates(sig: DataFrame, bands: Int, rowsPerBand: Int,
                    maxBucketSize: Int = 1000): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), xxhash64(slice: _*).as("bh"))
    }
    val buckets = sig.select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .groupBy(col("bk")).agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucketSize))
    buckets.select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
  }

  /** Exact Jaccard over candidate pairs, computed from the shingle relation:
    * |A∩B| via a shingle equi-join restricted to the candidates, |A∪B| from
    * per-doc set sizes. Division is int→double, identical on any engine.
    */
  def exactJaccard(sh: DataFrame, pairs: DataFrame): DataFrame = {
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val shA = sh.select(col("id").as("id_a"), col("shingle"))
    val shB = sh.select(col("id").as("id_b"), col("shingle"))
    val inter = pairs.join(shA, "id_a").join(shB, Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i"))).as("jaccard"))
  }

  /** End-to-end MinHash+LSH near-duplicate pairs with exact verification.
    *
    * The shared relation is the HASHED shingle set `(id, xxhash64(shingle))`
    * — signatures and the verification join both consume it, so shingle
    * strings are hashed once and never shuffled (8 bytes/shingle instead of
    * the text n-gram). Jaccard over hashed shingles is exact up to 64-bit
    * collisions (odds ~1e-11 at corpus scale).
    *
    * `cacheShingles` is OFF by default. The recompute-vs-materialize trade
    * was measured BOTH ways in round 4 and the answer is memory-headroom-
    * dependent, not just corpus-size-dependent:
    *   - 32 threads / ample storage headroom, 500k docs: caching WINS 2×
    *     (10.8s vs 21.1s — three consumers reuse one materialization);
    *   - 4 threads / 8 GB heap (per-executor-like memory), same corpus:
    *     caching LOSES 2.3× (62s vs 26s — the hashed-shingle relation is
    *     3-4× the input size, eviction/spill thrashes; caught by the
    *     ScaleSmokeSpec 2×-of-linear gate).
    * Recompute is the predictable default at cluster scale: map-side
    * shingling re-runs three times but never pressures the store. Turn
    * caching ON when the executor storage headroom comfortably exceeds
    * ~4× the text volume per partition, or when the source is expensive
    * to rescan (remote storage, heavy decompression). CACHE LIFETIME when
    * enabled: the relation is consumed lazily by the returned frame —
    * release with `spark.catalog.clearCache()` after the final action.
    */
  def nearDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
                         threshold: Double, numHashes: Int = 64,
                         bands: Int = 32, shingleSize: Int = 3,
                         cacheShingles: Boolean = false): DataFrame = {
    val hashed = shingles(df, idCol, textCol, shingleSize)
      .select(col("id"), xxhash64(col("shingle")).as("shingle"))
    val sh = if (cacheShingles) hashed.cache() else hashed
    val sig = minhashSignatures(sh, numHashes)
    val cand = lshCandidates(sig, bands, numHashes / bands)
    exactJaccard(sh, cand).filter(col("jaccard") >= threshold)
  }

  /** (id, band-bucket key) relation for a signature frame — the join-able
    * form of the LSH index. For a standing corpus this is the relation you
    * PERSIST between ingest batches (8-byte bucket key + id per band).
    */
  def bandBuckets(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r => element_at(col("sig"), b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), xxhash64(slice: _*).as("bh"))
    }
    sig.select(col("id"), explode(array(bandCols: _*)).as("bk"))
  }

  /** The persisted-index form of a standing corpus for incremental dedup —
    * the two relations a production pipeline keeps MATERIALIZED between
    * ingest batches so the corpus text is never re-shingled:
    *   - `shingles`: the hashed-shingle relation `(id, shingle: long)` —
    *     feeds exact-Jaccard verification of candidates;
    *   - `buckets`: the LSH band-bucket relation `(id, bk: struct(band, bh))`
    *     from [[bandBuckets]] — feeds candidate generation (8-byte bucket
    *     key + id per band per doc).
    * Both are plain frames: write them through [[graft.sources.ParquetWarehouse]]
    * (or any sink) after each batch and rebuild the index from the read-back
    * frames — no state lives outside the two tables. Appending a just-deduped
    * batch keeps the index current: union the batch's own
    * `buildIndex(...)`-relations onto the stored tables.
    */
  final case class NearDupIndex(shingles: DataFrame, buckets: DataFrame)

  /** Build the persistable [[NearDupIndex]] for a corpus: hash-shingle the
    * text once, signature it, band-bucket the signatures. Run once per
    * ingest batch (over the batch only) and append to the stored index —
    * the full corpus is shingled exactly once over its lifetime.
    */
  def buildIndex(df: DataFrame, idCol: String, textCol: String,
                 numHashes: Int = 64, bands: Int = 32,
                 shingleSize: Int = 3): NearDupIndex = {
    val sh = shingles(df, idCol, textCol, shingleSize)
      .select(col("id"), xxhash64(col("shingle")).as("shingle"))
    val bk = bandBuckets(minhashSignatures(sh, numHashes), bands, numHashes / bands)
    NearDupIndex(sh, bk)
  }

  /** Fold a just-ingested batch into the corpus index — the write side of
    * the daily cycle: dedup the batch against the stored index (the indexed
    * [[incrementalNearDupPairs]] overload), apply the keep/drop policy,
    * then extend the index with the SURVIVING batch docs and persist the
    * returned relations (e.g. `ParquetWarehouse.overwriteAll`, or
    * append-mode parquet since both relations are pure unions). Only the
    * batch is shingled — the existing index rows pass through untouched, so
    * the cost is O(batch) regardless of corpus size.
    */
  def extendIndex(index: NearDupIndex, batch: DataFrame,
                  idCol: String, textCol: String,
                  numHashes: Int = 64, bands: Int = 32,
                  shingleSize: Int = 3): NearDupIndex = {
    val b = buildIndex(batch, idCol, textCol, numHashes, bands, shingleSize)
    NearDupIndex(
      index.shingles.unionByName(b.shingles),
      index.buckets.select(col("id"), col("bk")).unionByName(
        b.buckets.select(col("id"), col("bk"))))
  }

  /** INCREMENTAL near-dup against a PERSISTED corpus index — the production
    * form of the text-frame overload below. The corpus side arrives as the
    * stored [[NearDupIndex]] relations (hashed shingles + band-buckets read
    * back from the warehouse), so the standing corpus is never re-shingled:
    * per-batch cost is shingling the NEW batch plus one join against the
    * bucket table — O(batch), not O(corpus), per day. Semantics are
    * identical to the text overload (same cap, same exact verification);
    * d11 proves the two paths byte-equal on the same split.
    *
    * CACHE LIFETIME: only the new batch's hashed shingles are cache()d
    * (they feed signatures AND the verify join); release with
    * `spark.catalog.clearCache()` after the final action.
    */
  def incrementalNearDupPairs(newDf: DataFrame, index: NearDupIndex,
                              idCol: String, textCol: String,
                              threshold: Double, numHashes: Int,
                              bands: Int, shingleSize: Int,
                              maxBucketSize: Int): DataFrame = {
    val r = numHashes / bands
    val shNew = shingles(newDf, idCol, textCol, shingleSize)
      .select(col("id"), xxhash64(col("shingle")).as("shingle"))
      .cache() // feeds signatures + verify
    val bNew = bandBuckets(minhashSignatures(shNew, numHashes), bands, r)
      .select(col("bk"), col("id").as("id_new"))
    val bOld = index.buckets.select(col("bk"), col("id"))
      .groupBy("bk").agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) <= maxBucketSize)
    val cand = bNew.join(bOld, "bk")
      .select(col("id_new"), explode(col("ids")).as("id_old"))
      .distinct()
    exactJaccard(
        shNew.unionByName(index.shingles.select(col("id"), col("shingle"))),
        cand.select(col("id_new").as("id_a"), col("id_old").as("id_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a").as("id_new"), col("id_b").as("id_old"), col("jaccard"))
  }

  /** INCREMENTAL near-dup: dedup a NEW ingest batch against an EXISTING
    * corpus without ever pairing the corpus with itself — the daily-ingest
    * shape at 100 TB, where re-running all-pairs LSH over the standing
    * corpus per batch would be O(corpus) every day.
    *
    * Shape: band-bucket the new batch's signatures and JOIN them against
    * the corpus's band-bucket relation (which a production pipeline keeps
    * materialized between batches — it is exactly [[bandBuckets]] of the
    * stored signatures, 8 bytes + id per band per doc). Only co-bucketed
    * (new, old) pairs expand: old-old pairs never exist, so per-batch cost
    * scales with |new| and bucket hit rate, not |corpus|². The corpus
    * side of each bucket is capped at `maxBucketSize` (same
    * bounded-work/recall trade as [[lshCandidates]], same cap semantics).
    * Candidates are then exact-Jaccard verified over the union shingle
    * relation, so output pairs (id_new, id_old, jaccard) are exact.
    *
    * Ids must be disjoint across the two frames (they identify output
    * orientation: id_new from `newDf`, id_old from `oldDf`).
    *
    * CACHE LIFETIME: both hashed-shingle relations are cache()d — each
    * feeds signatures AND the exact-verify join — and stay cached until
    * the caller's final action (same contract as `cacheShingles` in
    * [[nearDuplicatePairs]]): release with `spark.catalog.clearCache()`
    * when done. At production scale the old side's signatures/buckets are
    * a PERSISTED table, not recomputed — then only the new batch caches.
    */
  def incrementalNearDupPairs(newDf: DataFrame, oldDf: DataFrame,
                              idCol: String, textCol: String,
                              threshold: Double, numHashes: Int = 64,
                              bands: Int = 32, shingleSize: Int = 3,
                              maxBucketSize: Int = 1000): DataFrame = {
    val r = numHashes / bands
    def hashedShingles(df: DataFrame) =
      shingles(df, idCol, textCol, shingleSize)
        .select(col("id"), xxhash64(col("shingle")).as("shingle"))
    val shNew = hashedShingles(newDf).cache() // feeds signatures + verify
    val shOld = hashedShingles(oldDf).cache()
    val bNew = bandBuckets(minhashSignatures(shNew, numHashes), bands, r)
      .select(col("bk"), col("id").as("id_new"))
    val bOld = bandBuckets(minhashSignatures(shOld, numHashes), bands, r)
      .groupBy("bk").agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) <= maxBucketSize)
    val cand = bNew.join(bOld, "bk")
      .select(col("id_new"), explode(col("ids")).as("id_old"))
      .distinct()
    exactJaccard(shNew.unionByName(shOld),
        cand.select(col("id_new").as("id_a"), col("id_old").as("id_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a").as("id_new"), col("id_b").as("id_old"), col("jaccard"))
  }

  /** Connected components over a near-duplicate PAIR relation — the step
    * that turns pairs into dedup CLUSTERS (then "keep min id per cluster"
    * dedups transitively: A~B, B~C collapses all three even though A~C was
    * never emitted). Input: (id_a, id_b) edges; output: (id, comp) where
    * comp = smallest id reachable from `id`.
    *
    * Algorithm: min-label propagation with POINTER JUMPING — each round
    * every node takes the min of its own and its neighbours' labels, then
    * labels are path-compressed by following comp → comp(comp). Neighbour
    * steps alone move a label one hop per round (O(diameter) rounds — a
    * 40-node chain would exhaust any sane iteration bound); the jump step
    * halves remaining label-chain depth, giving O(log diameter)
    * convergence, the standard large-scale CC recipe.
    *
    * Per round exactly ONE materializing job (the checkpoint of the jumped
    * labels) plus one cheap scan of its cached blocks for the convergence
    * probe. The propagate aggregate carries each node's PREVIOUS label
    * through (`max(when(own, comp))` — one own row per id), so convergence
    * is a filter over the already-materialized round output, not a join
    * back against the prior labels; and the propagate result is persist()ed
    * rather than checkpointed, so the jump self-join reads it from cache
    * inside the same job instead of paying a second materialization.
    *
    * DURABILITY: `localCheckpoint` stores blocks on executors only — fine
    * on local[n], but at cluster scale one executor loss mid-iteration
    * kills the job. Callers on a real cluster should
    * `spark.sparkContext.setCheckpointDir(...)` and pass
    * `reliableEvery = k` (k≈3): every k-th round the labels are written
    * through a RELIABLE `checkpoint()` to that directory, bounding
    * replay-on-failure to < k rounds of executor-local lineage. Rounds in
    * between still use localCheckpoint (a reliable checkpoint every round
    * would put the distributed filesystem on the critical path).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25,
                          reliableEvery: Int = 0): DataFrame =
    connectedComponentsWithRounds(edges, maxIter, reliableEvery)._1

  /** [[connectedComponents]] plus the number of propagate+jump rounds it
    * took to converge — the loop is eager (one materializing job per
    * round), so the count is exact and free. The smoke gate asserts it
    * stays logarithmic in component size at 10× scale; production monitors
    * can alarm on it the same way (a round count drifting toward the
    * iteration cap means a pathological chain in the data).
    */
  def connectedComponentsWithRounds(edges: DataFrame, maxIter: Int = 25,
                                    reliableEvery: Int = 0): (DataFrame, Int) = {
    require(reliableEvery == 0 || edges.sparkSession.sparkContext.getCheckpointDir.nonEmpty,
      "reliableEvery > 0 requires spark.sparkContext.setCheckpointDir(...)")
    def pin(df: DataFrame, round: Int): DataFrame =
      if (reliableEvery > 0 && round % reliableEvery == 0) df.checkpoint()
      else df.localCheckpoint()
    // materialize the symmetric edge relation ONCE: it is joined every
    // round, and `edges` may be an arbitrarily expensive upstream pipeline
    // (d06 feeds the full shingle-Jaccard join) that must not re-run per
    // iteration
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      i += 1
      // own rows carry the pre-round label; every dst also appears as a
      // src (sym is symmetric), so each id aggregates exactly one own row
      val prop = labels.join(sym, col("id") === col("src"))
        .select(col("dst").as("id"), col("comp"), lit(false).as("own"))
        .unionByName(labels.select(col("id"), col("comp"), lit(true).as("own")))
        .groupBy("id")
        .agg(min("comp").as("comp"), max(when(col("own"), col("comp"))).as("prev"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val next = pin(
        prop
          .join(prop.select(col("id").as("cid"), col("comp").as("ccomp")),
            col("comp") === col("cid"), "left")
          .select(col("id"), coalesce(col("ccomp"), col("comp")).as("comp"),
            col("prev")),
        i) // the round's single materializing job (computes prop once, cached)
      prop.unpersist(blocking = false)
      converged = next.filter(col("comp") =!= col("prev")).limit(1).count() == 0
      labels = next.drop("prev")
    }
    (labels, i)
  }

  /** SimHash: 64-bit signature whose bit i is the sign of the sum over
    * tokens of ±1 at bit i of the token hash. Near-dups = small Hamming
    * distance. Pure column algebra — no UDF.
    *
    * Shape: ONE aggregation — 64 conditional integer sums per doc id,
    * partial-aggregated map-side, then the signature is assembled from the
    * 64 sums with plain bit arithmetic in a projection. The previous
    * posexplode shape multiplied every token row 64× and shuffled the
    * (id, bit) pairs — a 64× shuffle-volume tax this one-pass form avoids
    * entirely (per-doc shuffle payload: 64 longs, same as a MinHash
    * signature). Integer sums are order-independent, so signatures are
    * deterministic under any partitioning (golden-net d04/d05 rely on it).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = df.select(col(idCol).as("id"),
      explode(split(TextFunctions.normalizeWs(lower(col(textCol))), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val sums = (0 until 64).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0, lit(1)).otherwise(lit(-1)))
        .as(s"s$b")
    }
    tokens.groupBy("id").agg(sums.head, sums.tail: _*)
      .select(col("id"),
        (0 until 64).map(b =>
          when(col(s"s$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs via banded blocking: split each 64-bit
    * signature into `bands` equal chunks and bucket on (band, chunk) — by
    * pigeonhole, any pair with hamming < bands shares at least one intact
    * chunk, so recall is EXACT for maxHamming ≤ bands − 1 *within buckets
    * smaller than `maxBucketSize`* (use 4 bands for the classic ≤ 3-bit
    * web-dedup setting; pass `maxBucketSize = Int.MaxValue` to make the
    * pigeonhole guarantee unconditional).
    *
    * Same shape as `lshCandidates`: ONE shuffle collects bucket members per
    * (band, chunk), pairs expand IN-ROW via a double explode, and
    * `maxBucketSize` drops degenerate buckets — e.g. the all-zero chunk every
    * near-empty document hashes to, which an uncapped self-join would turn
    * quadratic at corpus scale. Dropped buckets trade recall on boilerplate
    * for bounded work, exactly like the MinHash path.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3, bands: Int = 4,
                      maxBucketSize: Int = 1000): DataFrame = {
    require(maxHamming < bands,
      s"pigeonhole guarantee needs maxHamming < bands (got $maxHamming >= $bands)")
    val width = 64 / bands
    val sig = simhash(df, idCol, textCol)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * width)
          .bitwiseAND(lit((1L << width) - 1)).as("chunk"))
    }
    val buckets = sig
      .select(struct(col("id"), col("simhash")).as("doc"),
        explode(array(bandCols: _*)).as("bk"))
      .groupBy(col("bk")).agg(collect_list(col("doc")).as("docs"))
      .filter(size(col("docs")).between(2, maxBucketSize))
    buckets.select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
