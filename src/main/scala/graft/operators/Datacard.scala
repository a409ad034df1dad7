package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** CONTINUOUS CORPUS DATACARD — q73's per-language release summary
  * (documents, tokens, mean quality, exact-duplicate exposure) maintained
  * incrementally over document batches, the s10/s14/s21 continuous-view
  * family's newest member. Everything on the card decomposes additively
  * over any disjoint batching of the corpus:
  *
  *   - doc/token counts and quality sums per language: plain sums;
  *   - MEAN quality: the 4-dp-quantized sum ([[graft.Cols.decimalSum]]'s
  *     exact DECIMAL(18,4) accumulation, stored as a ×10⁴ long so batch
  *     fragments sum in integer arithmetic) divided by the doc count at
  *     READ time — bit-identical to the one-shot decimal mean because
  *     both are the correctly-rounded double of the same exact rational;
  *   - duplicate exposure: per-(language, fingerprint) doc counts sum
  *     across batches, so a duplicate PAIR SPLIT ACROSS BATCHES is
  *     counted correctly at read time (global fingerprint total > 1) —
  *     the cross-fragment property the s24 fixture deliberately gates.
  *
  * Storage is ONE [[graft.sources.AdditiveStats]] store (idempotent
  * batch_id fragments, CAS publish, crash-safe compaction folds) keyed
  * (lang, fp, measure): measure 'docs' rows carry per-(lang, fp) doc
  * counts (fingerprint-vocabulary-sized — the same scale contract as the
  * s15 posting store), 'tok' and 'q4' rows carry per-language sums with
  * an empty fp (the [[QuotaView]] sentinel-row idiom).
  */
object Datacard {

  private def store(dir: String) = graft.sources.AdditiveStats.Store(dir,
    Seq("lang", "fp", "measure"), "v",
    "lang string, fp string, measure string, v bigint, batch_id bigint")

  /** Sibling store for the card's TOKEN-LENGTH DISTRIBUTION: one
    * [[graft.plans.QuantileSketch]] per language per batch under
    * `dir/len` (the [[PercentileView]] layout keyed by language). At
    * s = 15 every document length below 2^16 tokens sits in the
    * sketch's EXACT regime — the regime the q75 oracle rank-checks —
    * and merge is binwise addition, so fragments fold bit-identically
    * in any order. Two sub-stores share one `batchId` per append; each
    * append is idempotent per store, so a crash between the two lands
    * only the missing fragment on replay (never a double count).
    */
  private def lenStore(dir: String) = graft.sources.AdditiveStats.Store(
    s"$dir/len", Seq("lang"), "sketch",
    "lang string, sketch binary, batch_id bigint",
    fold = graft.plans.QuantileSketch.mergeAgg)

  private val lenS = 15

  private[graft] def lenFragment(batch: DataFrame, textCol: String,
                                 langCol: String): DataFrame = {
    import graft.functions.TextFunctions
    batch.select(col(langCol).cast("string").as("lang"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("__tok"))
      .groupBy("lang")
      .agg(graft.plans.QuantileSketch.sketch(col("__tok"), s = lenS,
        PercentileView.defaultMaxBins(lenS)).as("sketch"))
  }

  /** One batch's fragment rows: per-(lang, fp) doc counts plus the
    * per-language token and quantized-quality sums.
    */
  private[graft] def fragment(batch: DataFrame, idCol: String,
                              textCol: String, langCol: String): DataFrame = {
    import graft.functions.TextFunctions
    val per = batch.select(col(langCol).cast("string").as("lang"),
      TextFunctions.fingerprint(col(textCol)).as("fp"),
      TextFunctions.tokenCount(col(textCol)).cast("long").as("__tok"),
      (TextFunctions.qualityScore(col(textCol)).cast(DecimalType(18, 4)) *
        10000).cast("long").as("__q4"))
    val docs = per.groupBy("lang", "fp")
      .agg(count(lit(1)).as("v"))
      .select(col("lang"), col("fp"), lit("docs").as("measure"), col("v"))
    val sums = per.groupBy("lang")
      .agg(sum(col("__tok")).as("__t"), sum(col("__q4")).as("__q"))
    docs
      .unionByName(sums.select(col("lang"), lit("").as("fp"),
        lit("tok").as("measure"), col("__t").as("v")))
      .unionByName(sums.select(col("lang"), lit("").as("fp"),
        lit("q4").as("measure"), col("__q").as("v")))
  }

  /** Initialize an empty protocol-managed datacard store (both
    * sub-stores: additive counts + length sketches).
    */
  def init(spark: SparkSession, dir: String): Unit = {
    graft.sources.AdditiveStats.init(spark, store(dir))
    graft.sources.AdditiveStats.init(spark, lenStore(dir))
  }

  /** Land one document batch as an idempotent `batch_id` fragment
    * (counts + length sketch; see [[lenStore]] for the crash window).
    */
  def append(batch: DataFrame, idCol: String, textCol: String,
             langCol: String, dir: String, batchId: Long): Unit = {
    graft.sources.AdditiveStats.append(
      fragment(batch, idCol, textCol, langCol), store(dir), batchId)
    graft.sources.AdditiveStats.append(
      lenFragment(batch, textCol, langCol), lenStore(dir), batchId)
  }

  /** Per-batch fragments in the live epoch (0 for bare/empty stores). */
  def fragmentCount(spark: SparkSession, dir: String): Int =
    graft.sources.AdditiveStats.fragmentCount(spark, store(dir))

  /** Fold fragments into one summed partition in a fresh epoch. */
  def compact(spark: SparkSession, dir: String): Unit = {
    graft.sources.AdditiveStats.compact(spark, store(dir))
    graft.sources.AdditiveStats.compact(spark, lenStore(dir))
  }

  /** The card's TOKEN-LENGTH DISTRIBUTION from the accumulated sketch
    * store — one row per language: (lang, n_docs, p50_tokens,
    * p95_tokens, p99_tokens, …) for the requested percentiles.
    * Fragment sketches union exactly before extraction, so the answer
    * is bit-identical to one sketch over the whole corpus — and, below
    * 2^16 tokens (the s = 15 sketch's exact regime, see
    * [[graft.plans.QuantileSketch]]), to the rank-exact percentile
    * itself.
    */
  def lengths(spark: SparkSession, dir: String,
              percents: Seq[Int] = Seq(50, 95, 99)): DataFrame = {
    import graft.plans.QuantileSketch
    val merged = graft.sources.AdditiveStats.read(spark, lenStore(dir))
      .groupBy("lang")
      .agg(QuantileSketch.mergeAgg(col("sketch")).as("__m"))
    merged.select(col("lang") +:
      QuantileSketch.sketchCount(col("__m")).as("n_docs") +:
      percents.map(p =>
        QuantileSketch.quantileAt(col("__m"), p).as(s"p${p}_tokens")): _*)
  }

  /** The CARD from the accumulated store — one row per language:
    * (lang, n_docs, n_tokens, mean_quality, n_dup_docs), bit-identical
    * to q73's one-shot computation over the union of all batches.
    */
  def card(spark: SparkSession, dir: String): DataFrame = {
    val stats = graft.sources.AdditiveStats.read(spark, store(dir))
      .groupBy("lang", "fp", "measure").agg(sum(col("v")).as("v"))
    val docsRel = stats.filter(col("measure") === "docs")
      .select(col("lang"), col("fp"), col("v").as("__n"))
    // global fingerprint totals decide duplication; per-language doc
    // membership attributes the exposure
    val fpTot = docsRel.groupBy("fp").agg(sum(col("__n")).as("__tot"))
    val dups = docsRel.join(fpTot, "fp")
      .filter(col("__tot") > 1)
      .groupBy("lang").agg(sum(col("__n")).as("__dup"))
    val base = docsRel.groupBy("lang").agg(sum(col("__n")).as("n_docs"))
    val toks = stats.filter(col("measure") === "tok")
      .select(col("lang"), col("v").as("n_tokens"))
    val q4 = stats.filter(col("measure") === "q4")
      .select(col("lang"), col("v").as("__q4"))
    base.join(toks, "lang").join(q4, "lang")
      .join(dups, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        ((col("__q4").cast(DoubleType) / 10000.0) / col("n_docs"))
          .as("mean_quality"),
        coalesce(col("__dup"), lit(0L)).as("n_dup_docs"))
  }
}
