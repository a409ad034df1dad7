package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `ArrayType(FloatType)` columns
  * (TESTDATA `embeddings.embedding`, 64-dim).
  *
  * Computation rule for cross-engine reproducibility: every element is cast
  * to double FIRST, then combined with a strict left-to-right sequential fold
  * (`aggregate`), so an external oracle computing the same fold gets
  * bit-identical IEEE results. All expressions are built-in higher-order
  * functions — no UDF serialization, map-side only.
  *
  * For the hot path there is a codegen'd Catalyst expression variant in
  * graft.plans.CosineSimilarityExpr (single fused loop, no intermediate
  * arrays); these compositions are the readable reference implementation.
  */
object VectorFunctions {

  /** Left-to-right double dot product of two float arrays. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity; null/zero-norm safe (yields null). */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(null).cast("double"))
      .otherwise(dotProduct(a, b) / denom)
  }

  /** Unit-normalize a vector (each element / L2 norm, as doubles) — the
    * standard pre-step before cosine ANN so dot product IS cosine.
    * Zero-norm vectors yield NaN elements (0/0), like numpy.
    *
    * NOTE the norm subtree is inlined into the per-element lambda, so this
    * convenience form recomputes the fold per element (O(dim²) per row).
    * On a hot path materialize the norm in its own projection first and
    * use the two-argument overload.
    */
  def l2Normalize(a: Column): Column = l2Normalize(a, l2Norm(a))

  /** Normalize by a precomputed norm column (one fold per row). */
  def l2Normalize(a: Column, norm: Column): Column =
    transform(a, x => x.cast("double") / norm)

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, x) => acc + x))

  /** Deterministic random-hyperplane LSH signature: `planes` pseudo-random
    * hyperplanes are derived from `xxhash64(dim, plane)` (no RNG state to
    * ship), sign of the projection becomes one bit. Used to bucket vectors
    * so near-duplicate search compares only within buckets.
    */
  def hyperplaneSignature(vec: Column, dim: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      // projection onto pseudo-random ±1 hyperplane p
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)), (x, i) => {
          val h = xxhash64(lit(p), i)
          val sign = when(pmod(h, lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))
          x.cast("double") * sign
        }),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }
}
