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

  /** Minimum-hop distance from a source node set over edges (u, v),
    * bounded by `maxDepth`: classic frontier-expansion BFS — per level ONE
    * join of the edge relation with the (shrinking) frontier + one
    * distinct, with an anti-join against the visited set so a node is
    * labelled at its FIRST (minimal) level and never re-expanded. Returns
    * (v, level) for every node within `maxDepth` hops (sources at 0).
    *
    * Scale shape: the frontier and visited relations are node-sized (never
    * path-sized — the anti-join is what keeps a dense graph's exponential
    * path count out of the computation, unlike the naive recursive-CTE
    * form the oracle runs at toy scale); each level is edge⨝frontier on
    * the source key + node-keyed distinct. Each level's frontier is
    * `localCheckpoint`ed (node-sized materialization) — without the cut
    * the plan TREE doubles per level (frontier and visited both reference
    * the previous level) and Catalyst analysis goes exponential around
    * depth ~10; with it, per-level work is one linear job, the same
    * lineage discipline as NearDup's pointer jumping. Traversal stops
    * early when a frontier empties (the emptiness probe rides the
    * checkpoint's materialization, not an extra pass).
    */
  def bfsLevels(edges: DataFrame, sources: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, "maxDepth must be non-negative")
    // materialize the edge relation ONCE: a derived edge set (e.g. q61's
    // lineitem self-join) would otherwise recompute at every level. On top
    // of the lineage cut, pin the relation REPARTITIONED BY SOURCE KEY
    // (a checkpoint returns a bare LogicalRDD whose partitioning Catalyst
    // no longer trusts, so every level's frontier join re-exchanged the
    // whole edge relation; the cached repartition pays that exchange once
    // and every later level ships only the node-sized frontier). Lifetime:
    // released by the caller's clearCache / frame unreachability.
    val e =
      if (maxDepth > 1) {
        val parts = edges.sparkSession.conf
          .get("spark.sql.shuffle.partitions", "200").toInt
        edges.localCheckpoint(true).repartition(parts, col("u"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      } else edges
    var visited = sources.select(col("v")).distinct()
      .select(col("v"), lit(0).as("level"))
      .localCheckpoint(true)
    var frontier = visited.select("v")
    var d = 1
    var done = maxDepth < 1
    while (!done) {
      val next = e.join(frontier.select(col("v").as("u")), "u")
        .select(col("v")).distinct()
        .join(visited.select("v"), Seq("v"), "left_anti")
        .select(col("v"), lit(d).as("level"))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        // visited stays a LAZY union of the checkpointed level frames —
        // lineage is a flat ≤ maxDepth-way union of RDD scans, so the
        // per-level re-checkpoint (one extra materializing job per level)
        // bought nothing (round 21; the exponential-plan hazard this loop
        // guards against lives in `next`'s self-reference, which keeps its
        // checkpoint above)
        visited = visited.union(next)
        frontier = next.select("v")
        d += 1
        done = d > maxDepth
      }
    }
    visited
  }

  /** Damped PageRank after exactly `iterations` power steps over edges
    * (u, v). Returns (v, r) for every node with an out-edge. `damping`
    * must be exactly representable in binary64 for cross-engine parity
    * (the default 0.5 is).
    */
  def pageRank(edges: DataFrame, iterations: Int, damping: Double = 0.5): DataFrame = {
    require(iterations >= 1, "need at least one power step")
    // same single-materialization argument as bfsLevels: every power step
    // re-joins the edge relation, so a derived edge set must not recompute
    val e = if (iterations > 1) edges.localCheckpoint(true) else edges
    val parts = edges.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    val deg = outDegrees(e)
    // fold the out-degree onto the edge ONCE and pin the result partitioned
    // by the source key: the unrolled power steps each referenced `deg` and
    // `e` lazily, so the plan re-derived the degree aggregate and
    // re-exchanged the full edge relation per step (round-21 plan audit:
    // 22 edge-RDD scans, 12 SortMergeJoins, 44 Exchanges for 3 steps).
    // With (u, v, d) cached hash-partitioned on u, a power step ships only
    // the node-sized rank vector: one rank exchange + one target-keyed
    // aggregate — the minimal shuffle count per step. Arithmetic is
    // untouched (c = r/d per edge row, DECIMAL(28,15) sums are order-
    // independent), so results stay bit-identical. Lifetime: released by
    // the caller's clearCache / frame unreachability.
    val ew = e.join(deg, "u").select(col("u"), col("v"), col("d"))
      .repartition(parts, col("u"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // node count: 1-row relation, materialized once (each step's teleport
    // term referenced the lazy aggregate, recomputing it per step)
    val n = if (iterations > 1) deg.agg(count(lit(1)).as("n")).localCheckpoint(true)
            else deg.agg(count(lit(1)).as("n"))
    var r = deg.select(col("u").as("v"))
      .crossJoin(broadcast(n))
      .select(col("v"), (lit(1.0) / col("n").cast(DoubleType)).as("r"))
    for (_ <- 1 to iterations) {
      val contrib = ew
        .join(r.select(col("v").as("u"), col("r")), "u")
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
