package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Iterative graph analytics over edge relations — the power-iteration
  * companion to `ext/NearDup`'s pointer-jumping connected components.
  *
  * PageRank here is the textbook damped power iteration with a FIXED
  * iteration count, no dangling-mass redistribution (nodes are the edge
  * relation's sources; on a symmetric edge set — e.g. a co-occurrence
  * graph — every node has both in- and out-edges, so no mass leaks).
  * A fixed count rather than convergence detection keeps the computation
  * an exact, engine-replayable arithmetic program: per-target contribution
  * sums accumulate in DECIMAL(28,15) (summation order cannot perturb the
  * result) and the damping constant must be binary64-exact (0.5, 0.25 …)
  * so an independent engine replays bit-for-bit.
  *
  * Scale shape per iteration: ONE join of the edge relation with the
  * current rank vector on the source key + ONE target-keyed aggregate —
  * both shuffle-partitioned by node id; the rank vector never leaves the
  * cluster and nothing is collected. Hub skew (a node with huge in-degree)
  * is partial-aggregated map-side like any sum.
  */
object GraphOps {

  /** Out-degree per source node of an edge relation (u, v). */
  def outDegrees(edges: DataFrame): DataFrame =
    edges.groupBy("u").agg(count(lit(1)).as("d"))

  /** Damped PageRank after exactly `iterations` power steps over edges
    * (u, v). Returns (v, r) for every node with an out-edge. `damping`
    * must be exactly representable in binary64 for cross-engine parity
    * (the default 0.5 is).
    */
  def pageRank(edges: DataFrame, iterations: Int, damping: Double = 0.5): DataFrame = {
    require(iterations >= 1, "need at least one power step")
    val deg = outDegrees(edges)
    val n = deg.agg(count(lit(1)).as("n"))
    var r = deg.select(col("u").as("v"))
      .crossJoin(broadcast(n))
      .select(col("v"), (lit(1.0) / col("n").cast(DoubleType)).as("r"))
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(r.select(col("v").as("u"), col("r")), "u")
        .join(deg, "u")
        .select(col("v"), (col("r") / col("d").cast(DoubleType)).as("c"))
      r = contrib.groupBy("v")
        .agg(sum(col("c").cast(DecimalType(28, 15))).cast(DoubleType).as("s"))
        .crossJoin(broadcast(n))
        .select(col("v"),
          (lit(1.0 - damping) / col("n").cast(DoubleType) + (lit(damping) * col("s"))).as("r"))
    }
    r
  }
}
