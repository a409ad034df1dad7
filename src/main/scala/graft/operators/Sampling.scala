package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for large-scale pipeline curation — per-source
  * quotas, fixed eval carve-outs, debug slices. A training-data pipeline
  * needs samples that are REPRODUCIBLE across runs, partitionings, and
  * engines; `rand()` gives none of that (per-task seeds reshuffle with the
  * partitioning, and a retry can resample). Hash-order sampling does:
  * rank rows inside each stratum by a hash of their key and keep the
  * first k — a uniform pseudo-random draw that is a pure function of the
  * data.
  *
  * Cost: the k-quota forms ([[stratified]], [[temperatureResample]])
  * are one window shuffle partitioned by stratum; the cap/budget forms
  * ([[cappedPerStratum]], [[weightCappedPerStratum]],
  * [[budgetCappedPerStratum]]) ride [[withStratumRunningSum]]'s two-pass
  * distributed running sum, which costs one extra data shuffle and in
  * exchange never sorts a stratum in one task — the form that survives a
  * skewed 100 TB mixture. For per-ROW Bernoulli-style sampling (keep p%
  * of rows, no k quota), prefer a hash predicate (`xxhash64(key) % 100 <
  * p` — see q42's hash split), which is shuffle-free; this operator is
  * for exact-k strata.
  */
object Sampling {

  /** Exactly min(k, |stratum|) rows per stratum, drawn by hash order.
    *
    * `hash` defaults to `xxhash64(keyCols)` — 8-byte, codegen'd, the
    * scale choice. Pass e.g. `md5(concat(...))` when the draw must be
    * replayable by another engine (cross-engine hex strings agree;
    * xxhash64 is Spark-specific). The key should uniquely identify a row
    * within its stratum or ties are broken by `keyCols` order —
    * determinism holds either way.
    *
    * Skew shape: the LITERAL k lets Spark's `InferWindowGroupLimit`
    * insert a Partial WindowGroupLimit BELOW the stratum exchange — each
    * map partition pre-prunes to its local top-k per stratum, so the
    * single stratum task sorts ≤ k·#partitions rows however skewed the
    * corpus (PlanAuditSpec pins the Partial node on q46). That is why
    * this form keeps the one-shuffle window while the column-quota /
    * running-sum forms ([[temperatureResample]],
    * [[weightCappedPerStratum]]) ride the two-pass — no group-limit
    * pruning exists for them.
    */
  def stratified(df: DataFrame, strataCols: Seq[String], k: Int,
                 keyCols: Seq[String],
                 hash: Option[Column] = None): DataFrame = {
    require(k > 0, s"sample size k must be positive, got $k")
    val h = hash.getOrElse(xxhash64(keyCols.map(col): _*))
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(h +: keyCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** TEMPERATURE resampling across strata (the multilingual-training
    * mixture rebalance: α = 0.5 quotas — big languages downsampled toward
    * their square root, small ones kept whole, so no stratum drowns the
    * mixture). Per stratum the quota is
    * `min(n, scale · floor(sqrt(n)))` and exactly that many rows are kept,
    * drawn by deterministic hash order (same contract as [[stratified]]:
    * a pure function of the data — reproducible across runs,
    * partitionings, and engines).
    *
    * `floor(sqrt(n))` (not `n^α` in the exponent form) keeps the quota
    * integer-exact on ANY engine: IEEE sqrt is correctly rounded and exact
    * on perfect squares, so an oracle recomputing the quota can never be
    * an ULP off where a `POWER(n, 0.5)`-sum formulation could. `scale`
    * tunes the output size (quota ≈ scale·√n caps a 10⁹-doc stratum at
    * ~31623·scale rows while a 10⁴-doc stratum keeps 100·scale — the
    * classic α=0.5 flattening).
    *
    * Cost: one tiny count aggregate (broadcast back — one row per
    * stratum; drop the hint past broadcastable strata counts) + the
    * [[withStratumRunningSum]] two-pass for the rank. The per-stratum
    * QUOTA is a COLUMN, so Spark's `InferWindowGroupLimit` cannot prune
    * a rank window map-side the way it does for [[stratified]]'s literal
    * k (the round-15 plan check: q46 plans a Partial+Final
    * WindowGroupLimit, t10 planned NONE) — a stratum-partitioned window
    * here would sort a mega-stratum in one task with no bound, so the
    * rank rides the two-pass instead. CACHE LIFETIME: inherits the
    * core's internal persist — `spark.catalog.clearCache()` after the
    * final action.
    */
  def temperatureResample(df: DataFrame, strataCols: Seq[String],
                          keyCols: Seq[String], scale: Int = 8,
                          hash: Option[Column] = None): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    val quotas = df.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
      .select(strataCols.map(col) :+
        least(col("__cnt"),
          lit(scale.toLong) * floor(sqrt(col("__cnt")))).as("__quota"): _*)
    val h = hash.getOrElse(xxhash64(keyCols.map(col): _*))
    withStratumRunningSum(df, strataCols, h +: keyCols.map(col), lit(1L),
        "__rn")
      .join(broadcast(quotas), strataCols)
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /** TWO-PASS distributed per-stratum running sum — the scale-safe
    * replacement for `sum(w) OVER (PARTITION BY stratum ORDER BY draw)`.
    * The single-window form hash-partitions by STRATUM, so one task
    * sorts each stratum's entire row set; a real mixture corpus is
    * skewed exactly where the budget matters ("en" is ~half of a 100 TB
    * web crawl), so the dominant stratum serializes. [[TwoPass.prefix]]
    * carries the machinery (range-sort pinning, ≤ N−1 broadcastable
    * offsets, (pid, stratum)-partitioned local windows — the same total
    * order as the window form, so the admitted set is IDENTICAL).
    *
    * Cost: two data shuffles (the range sort, the (pid, stratum)
    * window) vs the window form's one — the price of never serializing
    * a stratum. Weights must be non-negative and non-null. CACHE
    * LIFETIME: [[TwoPass]]'s internal persist —
    * `spark.catalog.clearCache()` after the final action.
    */
  private def withStratumRunningSum(df: DataFrame, strataCols: Seq[String],
                                    orderCols: Seq[Column], weight: Column,
                                    cumCol: String): DataFrame =
    TwoPass.prefix(df, strataCols, orderCols, weight, sum,
      (off, local) => coalesce(off, lit(0L)) + local,
      inclusive = true, outCol = cumCol)

  /** FIXED per-stratum cap — the per-domain quota every web-corpus
    * pipeline applies right after registered-domain extraction
    * ([[graft.functions.UrlFunctions.registeredDomain]]): keep at most
    * `cap` rows per stratum, chosen by a deterministic pseudo-random
    * order (hash of `keyCols`, ties broken by the keys), so the kept
    * subset is a pure function of the data — same rows on any engine,
    * any partitioning, any retry. [[temperatureResample]] is the
    * √-scaled form of the same machinery; this is the hard-ceiling form
    * (a single mega-domain contributes `cap` documents, full stop).
    *
    * The kept set equals `row_number() OVER (PARTITION BY stratum ORDER
    * BY hash, keys) <= cap` (the one-window oracle form), computed via
    * [[withStratumRunningSum]]'s two-pass so a mega-stratum never
    * serializes through one task (SamplingSpec pins the equivalence law
    * on randomized skewed corpora). A literal-cap window WOULD get
    * [[stratified]]'s map-side WindowGroupLimit prune (stratum task ≤
    * cap·#partitions rows); the two-pass removes even that residual
    * single-task term and keeps one machinery with the budget forms,
    * whose running-sum filters get no group-limit pruning at all. CACHE
    * LIFETIME: inherits the core's internal persist — release with
    * `spark.catalog.clearCache()` after the final action.
    */
  def cappedPerStratum(df: DataFrame, strataCols: Seq[String],
                       keyCols: Seq[String], cap: Int,
                       hash: Option[Column] = None): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val h = hash.getOrElse(xxhash64(keyCols.map(col): _*))
    withStratumRunningSum(df, strataCols, h +: keyCols.map(col), lit(1L),
        "__cum")
      .filter(col("__cum") <= cap)
      .drop("__cum")
  }

  /** WEIGHT-BUDGETED per-stratum cap — the TOKEN-budget form of
    * [[cappedPerStratum]] (FineWeb-style: each domain contributes at
    * most `budget` TOKENS, not documents): rows draw in the same
    * deterministic hash order and a row is kept iff the stratum's
    * RUNNING weight through that row stays ≤ `budget`. With positive
    * weights the running sum is monotone, so the kept set is exactly
    * the greedy prefix of the draw — a pure function of the data, same
    * rows on any engine/partitioning/retry, and exactly replayable as
    * `SUM(w) OVER (PARTITION BY stratum ORDER BY hash, keys ROWS
    * UNBOUNDED PRECEDING) <= budget`.
    *
    * Weights must be non-negative (a negative weight would un-exceed an
    * exceeded budget and break the prefix property). The kept set equals
    * the one-window oracle form (`SUM(w) OVER (PARTITION BY stratum
    * ORDER BY hash, keys ROWS UNBOUNDED PRECEDING) <= budget`), computed
    * via [[withStratumRunningSum]]'s two-pass so the dominant stratum of
    * a skewed mixture never serializes through one task. CACHE LIFETIME:
    * inherits the core's internal persist — `spark.catalog.clearCache()`
    * after the final action.
    */
  def weightCappedPerStratum(df: DataFrame, strataCols: Seq[String],
                             keyCols: Seq[String], weightCol: String,
                             budget: Long,
                             hash: Option[Column] = None): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val h = hash.getOrElse(xxhash64(keyCols.map(col): _*))
    withStratumRunningSum(df, strataCols, h +: keyCols.map(col),
        col(weightCol), "__cum")
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /** PER-STRATUM budget RELATION form of [[weightCappedPerStratum]] —
    * the data-mixture operation proper: "at most B_en tokens of English,
    * B_zh of Chinese, …" with a DIFFERENT budget per stratum, supplied
    * as a relation (`strataCols` + a `budget` long column) instead of
    * one constant. Strata ABSENT from the relation are kept whole
    * (unlimited) — a mixture spec names the strata it constrains. Same
    * greedy-prefix/running-sum semantics on [[withStratumRunningSum]]'s
    * two-pass (no stratum ever serializes); the budget relation
    * broadcasts (mixture specs are driver-small by nature). CACHE
    * LIFETIME: inherits the core's internal persist —
    * `spark.catalog.clearCache()` after the final action.
    */
  def budgetCappedPerStratum(df: DataFrame, strataCols: Seq[String],
                             keyCols: Seq[String], weightCol: String,
                             budgets: DataFrame,
                             hash: Option[Column] = None): DataFrame = {
    val h = hash.getOrElse(xxhash64(keyCols.map(col): _*))
    withStratumRunningSum(df, strataCols, h +: keyCols.map(col),
        col(weightCol), "__cum")
      .join(broadcast(budgets), strataCols, "left")
      .filter(col("budget").isNull || col("__cum") <= col("budget"))
      .drop("__cum", "budget")
  }

  /** Deterministic EPOCH SHUFFLE: assign every row a contiguous 1..n
    * position in a pseudo-random order that is a pure function of
    * (seed, key) — the global reshuffle a pretraining loader runs per
    * epoch. `rand()`-based shuffles are neither reproducible (per-task
    * seeds move with the partitioning; a task retry resamples) nor
    * auditable; hashing the seed with the row key gives the same
    * permutation on any engine, any partitioning, any retry — change the
    * seed, get an independent permutation.
    *
    * Scale shape: the order is md5(seed || key) and the position
    * assignment rides [[SurrogateKey.scalable]]'s distributed two-pass
    * (range sort + per-partition counts broadcast back) — NO data-sized
    * single-partition stage, unlike the naive `row_number() OVER (ORDER
    * BY hash)`. md5 (not xxhash64) so any engine can replay the draw
    * bit-for-bit (hex strings agree cross-engine); keys must uniquely
    * identify rows (ties broken by the key itself, so determinism holds
    * regardless).
    *
    * CACHE LIFETIME: inherits [[SurrogateKey.scalable]]'s contract — the
    * internal persist pins the range boundaries; release with
    * `spark.catalog.clearCache()` after the final action.
    */
  def epochShuffle(df: DataFrame, keyCols: Seq[String], seed: Long,
                   posCol: String = "shuffle_pos"): DataFrame = {
    val h = md5(concat_ws("|",
      lit(seed.toString) +: keyCols.map(c => col(c).cast("string")): _*)
      .cast("binary"))
    SurrogateKey.scalable(df, h +: keyCols.map(col), posCol)
  }

  /** WEIGHTED sampling without replacement (Efraimidis & Spirakis 2006,
    * "Weighted random sampling with a reservoir"): every row draws a
    * deterministic uniform u from md5 of its key and scores
    * `ln(u) / w` — taking the global top-k by that score IS an exact
    * weighted sample without replacement (the paper's u^(1/w) key under
    * a monotone ln). The draw is a pure function of the data (same
    * engine-replayability contract as [[epochShuffle]]: md5, not
    * xxhash64), so another engine replays the identical sample; the
    * uniform is the first 13 md5 hex digits + 0.5 over 2^52 — integer-
    * exact in binary64 on any engine, never 0 (ln stays finite).
    *
    * Scale shape: the score is row-local scan-stage arithmetic and the
    * selection is a top-k (TakeOrderedAndProject — per-partition heaps,
    * never a global sort). Rows with non-positive weight are excluded
    * (the paper's domain; a zero weight would divide to -inf).
    */
  def weightedSample(df: DataFrame, keyCols: Seq[String], weight: Column,
                     k: Int, scoreCol: String = "es_score"): DataFrame = {
    require(k > 0, s"sample size k must be positive, got $k")
    val u = (conv(substring(md5(concat_ws("|",
        keyCols.map(c => col(c).cast("string")): _*).cast("binary")), 1, 13),
        16, 10).cast("double") + lit(0.5)) / lit(4503599627370496.0)
    df.filter(weight > 0)
      .withColumn(scoreCol, log(u) / weight.cast("double"))
      .orderBy(col(scoreCol).desc +: keyCols.map(col): _*)
      .limit(k)
  }
}
