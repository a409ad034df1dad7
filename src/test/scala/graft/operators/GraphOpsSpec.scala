package graft.operators

import graft.SparkSpec

/** PageRank power-iteration laws on small symmetric graphs. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("u", "v")

  test("regular graph (4-cycle) stays uniform at 1/n every step") {
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val r = GraphOps.pageRank(edges, iterations = 5)
      .as[(Long, Double)].collect().toMap
    assert(r.size == 4)
    r.values.foreach(v => assert(math.abs(v - 0.25) < 1e-12, r.toString))
  }

  test("symmetric star: hub outranks leaves; total mass conserved") {
    val edges = sym((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val r = GraphOps.pageRank(edges, iterations = 8)
      .as[(Long, Double)].collect().toMap
    assert(r(0L) > r(1L), r.toString)
    assert((1L to 4L).map(r).distinct.size == 1, "leaves are symmetric")
    assert(math.abs(r.values.sum - 1.0) < 1e-9, s"mass leaked: ${r.values.sum}")
  }

  test("disconnected components do not exchange mass") {
    val edges = sym((1L, 2L), (3L, 4L))
    val r = GraphOps.pageRank(edges, iterations = 3)
      .as[(Long, Double)].collect().toMap
    // both components are 2-cycles over 4 total nodes -> uniform 1/4
    r.values.foreach(v => assert(math.abs(v - 0.25) < 1e-12, r.toString))
  }

  test("outDegrees counts per-source edges") {
    val d = GraphOps.outDegrees(sym((0L, 1L), (0L, 2L)))
      .as[(Long, Long)].collect().toMap
    assert(d == Map(0L -> 2L, 1L -> 1L, 2L -> 1L))
  }

  private def bfs(edges: org.apache.spark.sql.DataFrame, src: Long, depth: Int) =
    GraphOps.bfsLevels(edges, Seq(src).toDF("v"), depth)
      .as[(Long, Int)].collect().toMap

  test("bfsLevels: chain distances are hop counts, depth bound excludes the tail") {
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(bfs(edges, 1L, 3) == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
    assert(bfs(edges, 1L, 10) == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
  }

  test("bfsLevels: a node reachable by several paths gets the MINIMUM level") {
    // 1-2-4 and 1-3-4 plus shortcut 1-4
    val edges = sym((1L, 2L), (2L, 4L), (1L, 3L), (3L, 4L), (1L, 4L))
    val r = bfs(edges, 1L, 3)
    assert(r(4L) == 1, r.toString)
  }

  test("bfsLevels: disconnected nodes are absent; depth 0 is just the sources") {
    val edges = sym((1L, 2L), (8L, 9L))
    assert(bfs(edges, 1L, 3) == Map(1L -> 0, 2L -> 1))
    assert(bfs(edges, 1L, 0) == Map(1L -> 0))
  }

  test("bfsLevels: multi-node source set takes the min over sources") {
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L))
    val r = GraphOps.bfsLevels(edges, Seq(1L, 4L).toDF("v"), 2)
      .as[(Long, Int)].collect().toMap
    assert(r == Map(1L -> 0, 4L -> 0, 2L -> 1, 3L -> 1))
  }
}
