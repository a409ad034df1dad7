package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Count-based bigram language-model scoring with stupid backoff — the
  * CCNet/Wenzek-style "perplexity vs a reference corpus" quality filter
  * re-expressed as pure relational algebra: train = three aggregations
  * over the reference corpus (unigram counts, bigram counts, total
  * tokens), score = two left joins of the target's bigrams against those
  * count relations. No model object, no UDF, no driver state — the
  * "model" IS a pair of count DataFrames, so it persists as parquet,
  * updates by additive union (counts are additive over corpus batches,
  * the same contract as [[LineDedup.lineStats]]), and broadcasts when
  * the vocabulary is small.
  *
  * Per-bigram likelihood (Brants et al. 2007 "stupid backoff", score not
  * probability): seen bigram → C(u,v)/C(u); unseen → 0.4·C(v)/T (0 when
  * v is out-of-vocabulary). The per-document score is the mean bigram
  * likelihood, accumulated in exact DECIMAL so engines agree bit-for-bit
  * (each quotient is a single IEEE-exact double op; summation order is
  * the only divergence risk, and decimal addition removes it).
  *
  * Scale shape: counting is combiner-friendly partial aggregation over
  * row-locally exploded tokens/bigrams; scoring joins shuffle target
  * bigrams against vocabulary-sized relations (Catalyst broadcasts them
  * when they fit — a natural-language vocabulary is Zipf-bounded, tiny
  * next to a 100 TB corpus; AQE handles the stop-word-headed skew).
  */
object NgramLm {

  private def toks(textCol: Column): Column =
    filter(split(lower(graft.functions.TextFunctions.normalizeWs(textCol)), " "),
      t => t =!= "")

  /** Exploded unigram frame: one row per token occurrence. */
  private def unigrams(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(toks(col(textCol))).as("u"))

  /** Exploded bigram frame: one row per adjacent token pair. */
  private def bigrams(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), toks(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col(idCol), explode(
        transform(sequence(lit(0), size(col("__t")) - 2),
          i => struct(element_at(col("__t"), i + 1).as("u"),
            element_at(col("__t"), i + 2).as("v")))).as("__b"))
      .select(col(idCol), col("__b.u").as("u"), col("__b.v").as("v"))

  /** The trained "model": the unigram count relation `(u, cu)` and the
    * bigram count relation `(u, v, cb)` — plain DataFrames, so the model
    * persists as parquet and a continuous ingest maintains it by
    * ADDITIVE union: `mergeModels(model(a), model(b)) == model(a ∪ b)`
    * exactly, for any disjoint document batching (NgramLmSpec pins the
    * law). The total token count is `sum(cu)` — derived, never stored,
    * so it cannot drift from the counts.
    */
  def model(reference: DataFrame, idCol: String,
            textCol: String): (DataFrame, DataFrame) =
    (unigrams(reference, idCol, textCol)
       .groupBy("u").agg(count(lit(1)).as("cu")),
     bigrams(reference, idCol, textCol)
       .groupBy("u", "v").agg(count(lit(1)).as("cb")))

  /** Fold two count models into one — the maintenance step of a
    * continuously trained reference model (counts are additive over any
    * disjoint partition of the corpus into batches).
    */
  def mergeModels(a: (DataFrame, DataFrame),
                  b: (DataFrame, DataFrame)): (DataFrame, DataFrame) =
    (a._1.unionByName(b._1).groupBy("u").agg(sum("cu").as("cu")),
     a._2.unionByName(b._2).groupBy("u", "v").agg(sum("cb").as("cb")))

  /** Exploded trigram frame: one row per adjacent token triple. */
  private def trigrams(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), toks(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 3)
      .select(col(idCol), explode(
        transform(sequence(lit(0), size(col("__t")) - 3),
          i => struct(element_at(col("__t"), i + 1).as("u"),
            element_at(col("__t"), i + 2).as("v"),
            element_at(col("__t"), i + 3).as("w")))).as("__b"))
      .select(col(idCol), col("__b.u").as("u"), col("__b.v").as("v"),
        col("__b.w").as("w"))

  /** TRIGRAM stupid backoff (the full Brants chain): seen trigram →
    * C(uvw)/C(uv); unseen → α·C(vw)/C(v); doubly unseen →
    * α·α·C(w)/T (0 for OOV). Same relational shape as the bigram form,
    * one level deeper — three count relations, all additive/persistable,
    * all Zipf-bounded next to the corpus. Output per target document
    * with ≥3 tokens: (idCol, n_trigrams, n_hit3, n_hit2, score) where
    * n_hit3 counts full trigram hits and n_hit2 the bigram backoffs.
    * Every arithmetic step is a single IEEE-exact op in a fixed order
    * and the mean accumulates in DECIMAL — bit-identical across engines.
    */
  def scoreStupidBackoffTrigram(target: DataFrame, reference: DataFrame,
                                idCol: String, textCol: String,
                                alpha: Double = 0.4): DataFrame = {
    val uniCnt = unigrams(reference, idCol, textCol)
      .groupBy("u").agg(count(lit(1)).as("__cu"))
    val bigCnt = bigrams(reference, idCol, textCol)
      .groupBy("u", "v").agg(count(lit(1)).as("__cb"))
    val triCnt = trigrams(reference, idCol, textCol)
      .groupBy("u", "v", "w").agg(count(lit(1)).as("__ct"))
    val total = uniCnt.agg(sum("__cu").as("__t"))

    val tt = trigrams(target, idCol, textCol)
    val p = tt
      .join(triCnt, Seq("u", "v", "w"), "left")
      .join(bigCnt.withColumnRenamed("__cb", "__cb12"), Seq("u", "v"), "left")
      .join(bigCnt.select(col("u").as("v"), col("v").as("w"),
        col("__cb").as("__cb23")), Seq("v", "w"), "left")
      .join(uniCnt.select(col("u").as("v"), col("__cu").as("__cv")), Seq("v"), "left")
      .join(uniCnt.select(col("u").as("w"), col("__cu").as("__cw")), Seq("w"), "left")
      .crossJoin(broadcast(total))
      .select(col(idCol),
        col("__ct").isNotNull.as("__hit3"),
        (col("__ct").isNull && col("__cb23").isNotNull).as("__hit2"),
        when(col("__ct").isNotNull,
          col("__ct").cast(DoubleType) / col("__cb12").cast(DoubleType))
          .when(col("__cb23").isNotNull,
            lit(alpha) * (col("__cb23").cast(DoubleType) /
              col("__cv").cast(DoubleType)))
          .otherwise(lit(alpha) * (lit(alpha) *
            (coalesce(col("__cw"), lit(0L)).cast(DoubleType) /
              col("__t").cast(DoubleType))))
          .as("__p"))
    p.groupBy(idCol)
      .agg(count(lit(1)).as("n_trigrams"),
        count(when(col("__hit3"), lit(1))).as("n_hit3"),
        count(when(col("__hit2"), lit(1))).as("n_hit2"),
        (sum(col("__p").cast(DecimalType(18, 9))).cast(DoubleType) /
          count(lit(1))).as("score"))
  }

  /** Score each target document's mean bigram likelihood under the
    * reference corpus's stupid-backoff model. Output: one row per target
    * document with ≥2 tokens — (idCol, n_bigrams, n_hit, score).
    */
  def scoreStupidBackoff(target: DataFrame, reference: DataFrame,
                         idCol: String, textCol: String,
                         alpha: Double = 0.4): DataFrame = {
    val (uni, big) = model(reference, idCol, textCol)
    scoreWithModel(target, uni, big, idCol, textCol, alpha)
  }

  /** Score against a caller-held (possibly loaded-from-parquet,
    * possibly incrementally merged) count model.
    */
  def scoreWithModel(target: DataFrame, uni: DataFrame, big: DataFrame,
                     idCol: String, textCol: String,
                     alpha: Double = 0.4): DataFrame = {
    val uniCnt = uni.select(col("u"), col("cu").cast("long").as("__cu"))
    val bigCnt = big.select(col("u"), col("v"), col("cb").cast("long").as("__cb"))
    val total = uniCnt.agg(sum("__cu").as("__t"))

    val tb = bigrams(target, idCol, textCol)
    val p = tb
      .join(bigCnt, Seq("u", "v"), "left")
      .join(uniCnt, Seq("u"), "left")
      .join(uniCnt.withColumnRenamed("u", "v")
        .withColumnRenamed("__cu", "__cv"), Seq("v"), "left")
      .crossJoin(broadcast(total))
      .select(col(idCol), col("__cb").isNotNull.as("__hit"),
        when(col("__cb").isNotNull,
          col("__cb").cast(DoubleType) / col("__cu").cast(DoubleType))
          .otherwise(lit(alpha) *
            (coalesce(col("__cv"), lit(0L)).cast(DoubleType) /
              col("__t").cast(DoubleType)))
          .as("__p"))
    p.groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        count(when(col("__hit"), lit(1))).as("n_hit"),
        (sum(col("__p").cast(DecimalType(18, 9))).cast(DoubleType) /
          count(lit(1))).as("score"))
  }
}
