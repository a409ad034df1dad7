package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-1 similarity (fuzzy) join (reference: dw-etl
  * `himalayan_etl/ops/transform.py:41-59` — map each CITIZEN string to the
  * nearest CountryName by fuzzy ratio, memoised in a driver-side dict).
  *
  * Re-architected for scale: the reference's memo-cache is a driver-side
  * optimization that Spark expresses structurally —
  *
  *   1. `distinct` the left keys (the "cache keys"),
  *   2. cross-join against the BROADCAST right candidate set and score each
  *      pair with the codegen'd built-in `levenshtein`,
  *   3. keep the best candidate per left key (`row_number` with a
  *      deterministic tie-break),
  *   4. broadcast-join the resulting small mapping back onto the full table.
  *
  * Cost model: |distinct(left)| × |right| scored pairs, all map-side (right
  * is broadcast, no shuffle for the cross product); the mapping table is tiny
  * so the final join is also broadcast. This is exactly the memo-cache trick,
  * but distributed. For candidate sets too big to broadcast, pre-filter pairs
  * with an LSH blocking stage (see graft.ext.NearDup) before scoring.
  */
object FuzzyJoin {

  /** Normalized similarity ratio in [0,1]: 1 − levenshtein/max(len). */
  def similarityRatio(a: Column, b: Column): Column =
    lit(1.0) - levenshtein(a, b).cast("double") /
      greatest(length(a), length(b)).cast("double")

  /** Token-sort ratio (thefuzz `token_sort_ratio` semantics): compare the
    * whitespace tokens in sorted order, so word-order differences don't
    * count as edits ("new york mets" ~ "mets new york" → 1.0). Pure column
    * expressions — lower, tokenize, sort, rejoin, levenshtein-ratio.
    */
  def tokenSortRatio(a: Column, b: Column): Column = {
    def normSorted(c: Column): Column =
      concat_ws(" ", array_sort(split(trim(regexp_replace(lower(c), "\\s+", " ")), " ")))
    similarityRatio(normSorted(a), normSorted(b))
  }

  /** thefuzz/rapidfuzz `fuzz.ratio` (0..100 Int) — exact parity with the
    * reference's scorer, as a codegen expression. See
    * [[graft.plans.IndelRatioExpr]] for the contract and how it differs
    * from [[similarityRatio]] (Levenshtein-normalized, a documented
    * approximation that can pick a different top-1 on token-multiset
    * cases).
    */
  def fuzzRatio(a: Column, b: Column): Column =
    graft.plans.IndelRatioExpr.fuzzRatio(a, b)

  /** [[top1]] scored by [[fuzzRatio]] instead of raw Levenshtein — the
    * reference-parity variant of the fuzzy join (thefuzz picks max score;
    * ties broken by lexicographically smallest candidate, since Spark rows
    * have no stable "first seen" order to mirror `extractOne`'s). Output
    * adds `outCol` and `outCol_score`. Same distinct→broadcast-score→
    * join-back shape and cost model as [[top1]].
    */
  def top1Fuzz(left: DataFrame, leftCol: String, right: DataFrame,
               rightCol: String, outCol: String): DataFrame =
    top1By(fuzzRatio)(left, leftCol, right, rightCol, outCol)

  /** [[top1Fuzz]] scored by the WRatio composite
    * ([[graft.plans.WRatioExpr]]) — the DEFAULT scorer of thefuzz's
    * `process.extractOne`, i.e. what the reference's literal
    * `process.extractOne(x, countries)` call (`ops/transform.py:55`)
    * maximizes when no scorer is passed. WRatio bakes in the default
    * processor, so keys match case- and punctuation-insensitively with
    * partial-alignment credit for substring-shaped candidates.
    */
  def top1WRatio(left: DataFrame, leftCol: String, right: DataFrame,
                 rightCol: String, outCol: String): DataFrame =
    top1By(graft.plans.WRatioExpr.wratio)(left, leftCol, right, rightCol, outCol)

  /** Shared distinct→broadcast-score→join-back shape, parameterized by the
    * (descending) 0..100 scorer. Ties break to the lexicographically
    * smallest candidate (Spark rows have no stable "first seen" order to
    * mirror `extractOne`'s).
    */
  private def top1By(scorer: (Column, Column) => Column)(
      left: DataFrame, leftCol: String, right: DataFrame,
      rightCol: String, outCol: String): DataFrame = {
    val candidates = right.select(col(rightCol).as("__cand")).distinct()
    val keys = left.select(col(leftCol).as("__key")).distinct().filter(col("__key").isNotNull)
    val scored = keys.crossJoin(broadcast(candidates))
      .withColumn("__score", scorer(col("__key"), col("__cand")))
    val w = Window.partitionBy(col("__key")).orderBy(col("__score").desc, col("__cand").asc)
    val best = scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__key"), col("__cand").as(outCol), col("__score").as(outCol + "_score"))
    left.join(broadcast(best), left(leftCol) === best("__key"), "left").drop("__key")
  }

  /** For each row of `left`, attach the `right` value of `rightCol` nearest
    * to `leftCol` by Levenshtein distance (ties → lexicographically smallest
    * candidate). Output adds `outCol` (matched value) and `outCol_dist`.
    */
  def top1(left: DataFrame, leftCol: String, right: DataFrame, rightCol: String,
           outCol: String): DataFrame = {
    val candidates = right.select(col(rightCol).as("__cand")).distinct()
    val keys = left.select(col(leftCol).as("__key")).distinct().filter(col("__key").isNotNull)
    val scored = keys.crossJoin(broadcast(candidates))
      .withColumn("__dist", levenshtein(col("__key"), col("__cand")))
    val w = Window.partitionBy(col("__key")).orderBy(col("__dist").asc, col("__cand").asc)
    val best = scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__key"), col("__cand").as(outCol), col("__dist").as(outCol + "_dist"))
    left.join(broadcast(best), left(leftCol) === best("__key"), "left").drop("__key")
  }
}
