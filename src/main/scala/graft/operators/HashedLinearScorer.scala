package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.plans.RollingHashExpr

/** Hashed bag-of-words LINEAR SCORER — the serving side of a
  * fastText/CCNet-style document quality classifier (the model family the
  * GPT-3 / CCNet data pipelines used to gate web text against a trusted
  * corpus): tokens hash into `buckets` feature slots, each slot carries a
  * weight, a document's logit is the mean slot weight of its tokens, and
  * the gate keeps documents whose logit clears zero.
  *
  * Engine-exact by construction: weights are INTEGERS over a common
  * denominator (`den`), summed exactly per document (no double
  * accumulation order to drift between engines — same DECIMAL discipline
  * as `Cols.decimalSum`); the single double division and the sigmoid
  * happen once per document at the end, and the keep decision compares
  * the INTEGER sum against zero. Training happens offline; the trained
  * vector arrives as `weightInt` (typically
  * `element_at(typedlit(weights), bucket + 1)` over a broadcast literal
  * array — `buckets` slots, driver-small at any corpus scale).
  *
  * Shape at 100 TB (round 14): normalize → fused row-local
  * (bucket, count) vector ([[graft.plans.BucketCountsExpr]], one codegen
  * pass per document) → integer weight fold over ≤ `buckets` elements.
  * Serving is a pure projection with ZERO exchanges — nothing about a
  * document ever leaves its row; training's only shuffle is the
  * ≤ (buckets+1)² moment-cell fold ([[graft.plans.RidgeMomentsAgg]]).
  */
object HashedLinearScorer {

  /** Score `textCol` per `idCol` row. Emits `(idCol, n_tokens, score,
    * prob, keep)`: `score` = Σ w / (n·den) (the mean-weight logit),
    * `prob` = sigmoid(`calib`·score), `keep` = integer-exact Σ w ≥ 0.
    * Documents whose normalized text is empty produce no row (they carry
    * no features; gate them on length, not on a vacuous logit).
    */
  def score(docs: DataFrame, idCol: String, textCol: String, buckets: Int,
            weightInt: Column => Column, den: Long,
            calib: Double): DataFrame = {
    require(buckets > 0 && den > 0, "need positive buckets and denominator")
    // Row-local serving (round 14, same move as scoreMulti): the integer
    // weight sum folds over the fused (bucket, count) vector — ZERO
    // exchanges, where the old explode + groupBy shuffled one row per
    // token. Integer sums are order-free, so the results are identical.
    val cv = graft.plans.BucketCountsExpr.bucketCounts(
      wordTokens(col(textCol)), buckets)
    docs
      .select(col(idCol), cv.as("__cv"))
      .filter(size(col("__cv")) > 0)
      .select(col(idCol),
        aggregate(col("__cv"), lit(0L),
          (acc, x) => acc + x.getField("__c")).cast("int").as("n_tokens"),
        aggregate(col("__cv"), lit(0L), (acc, x) => acc +
          x.getField("__c") * weightInt(x.getField("__b").cast("long")))
          .as("__s"))
      .select(col(idCol), col("n_tokens"),
        round(col("__s") / (col("n_tokens") * den.toDouble), 6).as("score"),
        round(lit(1.0) / (lit(1.0) +
          exp(col("__s") / (col("n_tokens") * den.toDouble) * -calib)), 6).as("prob"),
        (col("__s") >= 0L).as("keep"))
  }

  /** The deterministic stand-in weight vector used by the oracle-gated
    * query (a Knuth multiplicative hash of the bucket index, centered):
    * exercises every code path of a trained vector while staying a pure
    * integer function both engines replay bit-for-bit.
    */
  def syntheticWeightInt(den: Long)(bucket: Column): Column =
    pmod(bucket * 2654435761L, lit(den)) - (den / 2)

  // ------------------------------------------------------------ training

  /** IN-ENGINE TRAINING: closed-form ridge regression over the hashed
    * bag-of-words features, solved from DECIMAL-folded normal equations —
    * the deterministic, engine-replayable way to fit the CCNet-style
    * quality/language gate on in-warehouse labels (no SGD ordering, no
    * seed, no epochs: same corpus → bit-identical weights under ANY
    * partitioning, because every distributed sum is an exact DECIMAL fold
    * of per-row values that are themselves partition-independent).
    *
    * Model: least squares on the SERVING features — per-document bucket
    * FRACTIONS x_b = c_b / n (so the fitted linear form IS [[score]]'s
    * mean-weight logit) plus an intercept column, `(XᵀX + λI) w = Xᵀy`
    * with NUMERIC labels used as-is — y ∈ {−1, +1} for a classifier gate
    * (the fitted boundary then sits at logit 0, [[score]]'s fixed keep
    * threshold), or a zero-centered continuous score for regression
    * distillation of an expensive gate. The intercept
    * has no slot of its own at serving time — it FOLDS into every bucket
    * weight, because adding a constant β to all slots shifts the
    * mean-of-slot-weights logit by exactly β.
    *
    * The moment pass is shaped for 100 TB (round 14): the per-document
    * sparse count vector is ONE fused codegen pass inside the corpus
    * scan ([[graft.plans.BucketCountsExpr]] — no token explode, nothing
    * per-document ever leaves its row), the Gram matrix folds through
    * [[graft.plans.RidgeMomentsAgg]]'s partition-local dense buffer
    * (the shuffle carries one ≤ (buckets+1)²-cell buffer PER PARTITION,
    * not per document), and Xᵀy is a (buckets+1)-fan-out DECIMAL fold.
    * The ONLY driver-side work is collecting
    * those ≤ (B+1)²+B+1 moments (the explicit driver contract —
    * `buckets` ≤ 256 enforced) and a (B+1)×(B+1) Cholesky solve.
    *
    * Returns the bias-folded weight vector QUANTIZED to integers over
    * `den` (`round((w_b + β)·den)`), ready for [[score]]'s integer-exact
    * serving path via [[literalWeightInt]]. Docs whose normalized text is
    * empty carry no features and drop out of the moments, mirroring
    * [[score]].
    */
  def trainRidge(docs: DataFrame, idCol: String, textCol: String,
                 labelCol: String, buckets: Int, lambda: Double,
                 den: Long): Array[Long] = {
    val (g, v) = normalEquations(docs, idCol, textCol, labelCol, buckets)
    val w = choleskySolve(g, v, lambda)
    val bias = w(buckets)
    Array.tabulate(buckets)(b => Math.round((w(b) + bias) * den))
  }

  // --------------------------------------------------- multi-class (OvR)

  /** Character n-gram feature tokens — the standard lang-id feature
    * (fastText's default): overlapping substrings of length `n` over the
    * lowercased whitespace-normalized text; shorter texts yield an empty
    * array (no features, mirroring empty docs in the word path).
    *
    * Fused via [[graft.plans.CharNgramsExpr]] (round-13 adjudication):
    * the previous `transform(sequence(...), i => t.substr(i, n))` HOF
    * re-evaluated the whole normalization chain `t` once PER CHARACTER
    * POSITION inside an interpreted lambda — O(L²) regex per document,
    * 99 s min on a 1.5 MB corpus. The expression evaluates its child
    * once and slices grams in one O(L·n) pass; emitted grams are
    * bit-identical (code-point windows, short → empty).
    */
  def charNgramTokens(n: Int)(textCol: Column): Column = {
    require(n >= 1, "n-gram length must be >= 1")
    graft.plans.CharNgramsExpr.charNgrams(
      lower(TextFunctions.normalizeWs(textCol)), n)
  }

  /** Default word features: whitespace tokens of the normalized text —
    * exactly the binary [[score]]/[[trainRidge]] featurization.
    */
  def wordTokens(textCol: Column): Column = {
    val t = TextFunctions.normalizeWs(textCol)
    when(length(t) > 0, split(t, " ")).otherwise(array())
  }

  /** MULTI-CLASS one-vs-rest ridge training sharing ONE moment pass —
    * the k-class form of [[trainRidge]] (lang-id is the canonical user).
    * The Gram matrix XᵀX is label-independent, so all k one-vs-rest
    * problems `(XᵀX + λI) w_c = Xᵀy_c` share it; and with OvR labels
    * y_c ∈ {+1 on class c, −1 elsewhere},
    *
    *   Xᵀy_c = 2·S_c − S_all,   S_c = Σ_{label=c} x_d,  S_all = Σ_d x_d,
    *
    * so ONE extra per-(label, bucket) exactly-folded sum — k·(B+1) cells
    * next to the (B+1)² Gram cells, same explicit driver-collect
    * contract — yields every class's right-hand side. Both moment
    * families come from ONE corpus scan: the fused per-document
    * (bucket, count) vector ([[graft.plans.BucketCountsExpr]]) feeds
    * [[graft.plans.RidgeMomentsAgg]], whose partition-local dense buffer
    * replaces the former (B+1)²-rows-per-document explode (the round-13
    * t37 hot spot) while reproducing the decimal fold bit-for-bit. The
    * Cholesky factorization runs ONCE and back-substitutes k times. Returns
    * classes sorted lexicographically, each with its bias-folded
    * quantized weight vector (the [[score]]/[[scoreMulti]] serving
    * format). Determinism: identical to [[trainRidge]] — DECIMAL-folded
    * moments are partitioning-invariant, the solve is a fixed scalar
    * sequence.
    *
    * `features` picks the featurization (default [[wordTokens]];
    * lang-id wants [[charNgramTokens]]).
    */
  def trainRidgeMulti(docs: DataFrame, idCol: String, textCol: String,
                      labelCol: String, buckets: Int, lambda: Double,
                      den: Long,
                      features: Column => Column = wordTokens)
      : Seq[(String, Array[Long])] = {
    require(buckets > 0 && buckets <= 256,
      s"trainRidgeMulti collects (buckets+1)^2 + k*(buckets+1) moment " +
        s"cells on the driver; buckets must be in [1, 256], got $buckets")
    // ONE corpus scan (round 14): the fused (bucket, count) featurization
    // feeds graft.plans.RidgeMomentsAgg, which folds the Gram matrix AND
    // every class sum in a single partial-aggregated pass — the previous
    // shape exploded (B+1)² rows per document and ran the lineage twice
    // (the Gram collect and the class-sum collect). `idCol` is no longer
    // touched by the moment pass (it became row-local — one row per
    // document is the table contract); the parameter stays for signature
    // symmetry with [[scoreMulti]] and [[trainRidge]].
    val cv = graft.plans.BucketCountsExpr.bucketCounts(
      features(col(textCol)), buckets)
    val moments = docs
      .select(col(labelCol).cast("string").as("__y"), cv.as("__cv"))
      .filter(size(col("__cv")) > 0)
      .agg(graft.plans.RidgeMomentsAgg.moments(
        col("__cv"), col("__y"), buckets).as("m"))
      .select(col("m.gram").as("gram"), col("m.cls").as("cls"))
      .collect()(0)
    val gramRows = moments.getSeq[org.apache.spark.sql.Row](0)
    val classSums = moments.getSeq[org.apache.spark.sql.Row](1)
    val d = buckets + 1
    val g = Array.ofDim[Double](d, d)
    gramRows.foreach(r =>
      g(r.getInt(0))(r.getInt(1)) = r.getDecimal(2).doubleValue())
    val classes = classSums.map(_.getString(0)).distinct.sorted
    require(classes.length >= 2 && classes.length <= 64,
      s"one-vs-rest needs 2..64 classes, got ${classes.length}")
    val sAll = Array.ofDim[Double](d)
    val sBy = classes.map(_ -> Array.ofDim[Double](d)).toMap
    classSums.foreach { r =>
      val v = r.getDecimal(2).doubleValue()
      sBy(r.getString(0))(r.getInt(1)) += v
      sAll(r.getInt(1)) += v
    }
    val l = cholFactor(g, lambda)
    classes.toSeq.map { c =>
      val v = Array.tabulate(d)(b => 2.0 * sBy(c)(b) - sAll(b))
      val w = cholSubstitute(l, v)
      val bias = w(buckets)
      c -> Array.tabulate(buckets)(b => Math.round((w(b) + bias) * den))
    }
  }

  /** Serve the [[trainRidgeMulti]] model: per-document integer-exact
    * per-class sums (one broadcast-literal lookup per class per feature,
    * all k folded in a single map-side-combined groupBy), predicted
    * class = argmax of the mean-weight logits with ties broken toward
    * the lexicographically FIRST class (classWeights arrives sorted from
    * [[trainRidgeMulti]]; the fold keeps the first strict maximum).
    * Because every class shares the same positive denominator n·den, the
    * integer sums ARE the logit order — the argmax never touches a
    * double. Emits `(idCol, n_tokens, pred, score)` (score = the winning
    * mean-weight logit, rounded); featureless documents produce no row
    * (same contract as [[score]]).
    */
  def scoreMulti(docs: DataFrame, idCol: String, textCol: String,
                 buckets: Int, classWeights: Seq[(String, Array[Long])],
                 den: Long,
                 features: Column => Column = wordTokens): DataFrame = {
    require(buckets > 0 && den > 0, "need positive buckets and denominator")
    require(classWeights.nonEmpty, "need at least one class")
    // Row-local serving (round 14): the per-class integer sums fold over
    // the fused (bucket, count) vector — Σ_b c_b·w_c[b] replaces the old
    // per-token explode + groupBy, so scoring is a pure projection with
    // ZERO exchanges (one row per document is the table contract). The
    // aggregate lambdas are interpreted but bounded: ≤ buckets elements
    // per document, k broadcast-literal lookups each.
    val cv = graft.plans.BucketCountsExpr.bucketCounts(
      features(col(textCol)), buckets)
    val sums = docs
      .select(col(idCol), cv.as("__cv"))
      .filter(size(col("__cv")) > 0)
      .select(
        col(idCol) +:
        aggregate(col("__cv"), lit(0L),
          (acc, x) => acc + x.getField("__c")).cast("int").as("n_tokens") +:
        classWeights.map { case (c, w) =>
          aggregate(col("__cv"), lit(0L), (acc, x) => acc +
            x.getField("__c") *
              element_at(typedlit(w.toSeq), x.getField("__b") + 1))
            .as(s"__s_$c")
        }: _*)
    val scored = aggregate(
      array(classWeights.map { case (c, _) =>
        struct(col(s"__s_$c").as("s"), lit(c).as("cls"))
      }: _*),
      struct(lit(Long.MinValue).as("s"), lit("").as("cls")),
      (acc, x) => when(x.getField("s") > acc.getField("s"), x).otherwise(acc))
    sums
      .withColumn("__best", scored)
      .select(col(idCol), col("n_tokens"),
        col("__best.cls").as("pred"),
        round(col("__best.s") / (col("n_tokens") * den.toDouble), 6)
          .as("score"))
  }

  /** Normal-equation moments over the (B+1)-dim feature space (B bucket
    * fractions + trailing intercept): XᵀX dense (B+1)², Xᵀy length B+1.
    * Per-row addends are computed identically on every executor and
    * folded through the exact DECIMAL(28,14)-per-addend discipline, so
    * the collected moments are bit-identical under any partitioning or
    * arrival order.
    *
    * Round 14 (the t37 restructuring applied to the binary path): the
    * per-document (bucket, count) vector comes from the fused
    * [[graft.plans.BucketCountsExpr]] (row-local, replaces the
    * explode→two-groupBys featurization) and the Gram matrix from
    * [[graft.plans.RidgeMomentsAgg]]'s one-pass partition-local fold
    * (label-independent — a constant class key keeps the class-sum
    * machinery dormant), spec-proven bit-equal to the exploded DECIMAL
    * dataflow it replaced. Xᵀy keeps the dataflow fold but over the
    * fused vector — fan-out B+1 per document, not (B+1)²; its numeric
    * `y` weight rules out the unsigned-integer fold the Gram uses.
    */
  private[operators] def normalEquations(docs: DataFrame, idCol: String,
                                         textCol: String, labelCol: String,
                                         buckets: Int)
      : (Array[Array[Double]], Array[Double]) = {
    require(buckets > 0 && buckets <= 256,
      s"trainRidge collects (buckets+1)^2 moment cells on the driver; " +
        s"buckets must be in [1, 256], got $buckets")
    import org.apache.spark.sql.types.DecimalType
    def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 14)))
    val cv = graft.plans.BucketCountsExpr.bucketCounts(
      wordTokens(col(textCol)), buckets)
    val perDoc = docs
      .select(col(labelCol).cast("double").as("__y"), cv.as("__cv"))
      .filter(size(col("__cv")) > 0)
    val gramRows = perDoc
      .agg(graft.plans.RidgeMomentsAgg.moments(
        col("__cv"), lit("_"), buckets).as("m"))
      .select(col("m.gram").as("gram")).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0)
    // intercept appended as pseudo-bucket B with count n (so c/n
    // uniformly yields fraction features and a 1)
    val xtyRows = perDoc
      .withColumn("__n", aggregate(col("__cv"), lit(0L),
        (acc, x) => acc + x.getField("__c")))
      .withColumn("__fv", array_append(col("__cv"),
        struct(lit(buckets).as("__b"), col("__n").as("__c"))))
      .select(col("__y"), col("__n"), explode(col("__fv")).as("__f"))
      .groupBy(col("__f.__b").as("b"))
      .agg(dsum(col("__y").cast("double") *
        col("__f.__c").cast("double") / col("__n").cast("double")).as("v"))
      .collect()
    val d = buckets + 1
    val g = Array.ofDim[Double](d, d)
    gramRows.foreach(r =>
      g(r.getInt(0))(r.getInt(1)) = r.getDecimal(2).doubleValue())
    val v = Array.ofDim[Double](d)
    xtyRows.foreach(r => v(r.getInt(0)) = r.getDecimal(1).doubleValue())
    (g, v)
  }

  /** Deterministic dense Cholesky solve of `(G + λI) w = v` — G is a Gram
    * matrix (PSD), so λ > 0 guarantees positive definiteness. Fixed
    * left-to-right operation order: same moments → bit-identical doubles.
    */
  private[operators] def choleskySolve(g: Array[Array[Double]],
                                       v: Array[Double],
                                       lambda: Double): Array[Double] =
    cholSubstitute(cholFactor(g, lambda), v)

  /** Lower-triangular Cholesky factor of `G + λI` — factored once, then
    * shared by every one-vs-rest right-hand side ([[trainRidgeMulti]]).
    */
  private[operators] def cholFactor(g: Array[Array[Double]],
                                    lambda: Double): Array[Array[Double]] = {
    require(lambda > 0, "ridge needs lambda > 0 for positive definiteness")
    val n = g.length
    val l = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j <= i) {
        var s = g(i)(j) + (if (i == j) lambda else 0.0)
        var k = 0
        while (k < j) { s -= l(i)(k) * l(j)(k); k += 1 }
        if (i == j) l(i)(i) = math.sqrt(s)
        else l(i)(j) = s / l(j)(j)
        j += 1
      }
      i += 1
    }
    l
  }

  /** Forward + back substitution against a shared factor. */
  private[operators] def cholSubstitute(l: Array[Array[Double]],
                                        v: Array[Double]): Array[Double] = {
    val n = v.length
    // forward substitution L z = v, then back substitution Lᵀ w = z
    val z = Array.ofDim[Double](n)
    var i = 0
    while (i < n) {
      var s = v(i)
      var k = 0
      while (k < i) { s -= l(i)(k) * z(k); k += 1 }
      z(i) = s / l(i)(i)
      i += 1
    }
    val w = Array.ofDim[Double](n)
    i = n - 1
    while (i >= 0) {
      var s = z(i)
      var k = i + 1
      while (k < n) { s -= l(k)(i) * w(k); k += 1 }
      w(i) = s / l(i)(i)
      i -= 1
    }
    w
  }

  /** Serving-side column for a trained (quantized) weight vector: the
    * broadcast-literal array lookup [[score]] expects — driver-small at
    * any corpus scale (≤ 256 longs).
    */
  def literalWeightInt(weights: Array[Long])(bucket: Column): Column =
    element_at(typedlit(weights.toSeq), bucket.cast("int") + 1)
}
