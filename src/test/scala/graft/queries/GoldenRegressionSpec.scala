package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions.col

/** In-repo half of the golden-parquet regression net ([[GoldenOracles]]):
  * each approximate-by-design query must reproduce its committed sf0.01
  * golden EXACTLY (schema + row multiset, doubles bit-equal — the queries
  * are deterministic by construction). The driver's DuckDB gate replays
  * the same comparison from the oracle SQL side.
  */
class GoldenRegressionSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  for (name <- GoldenOracles.names) {
    test(s"$name reproduces the committed golden parquet bit-for-bit") {
      assume(new java.io.File(GoldenOracles.pathFor(name)).exists,
        s"golden for $name not generated yet (run tools/gen_goldens.sh)")
      val got = SparkEntry.queries(name)(spark, sfDir)
      val golden = spark.read.parquet(GoldenOracles.pathFor(name))
      assert(got.columns.sorted.toSeq == golden.columns.sorted.toSeq)
      val cols = got.columns.sorted.toSeq.map(col)
      def multiset(df: org.apache.spark.sql.DataFrame) =
        df.select(cols: _*).collect().toSeq
          .groupBy(identity).view.mapValues(_.size).toMap
      try assert(multiset(got) == multiset(golden))
      // release per-query pinned relations (e11-e13 persist their derived
      // fixture; the bench/Verify harnesses clear per query — so must we)
      finally spark.catalog.clearCache()
    }
  }
}
