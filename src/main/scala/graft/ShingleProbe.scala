package graft

import org.apache.spark.sql.functions._

/** Scratch decomposition of the near-dup pipeline's cost at a scale factor:
  * where does d03's wall time go — shingling, signatures, or the
  * candidate/verify joins? Drives the decision whether a fused codegen
  * shingle expression would pay for itself.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ShingleProbe"
  */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs  rows=$n%d")
      spark.catalog.clearCache()
    }
    time("scan_only")(docs.count())
    time("normalize+split")(docs.select(
      split(graft.functions.TextFunctions.normalizeWs(col("text")), " ").as("w"))
      .select(size(col("w"))).agg(sum("size(w)")).count())
    time("shingles_distinct")(ext.NearDup.shingles(docs, "doc_id", "text", 3).count())
    time("shingles_hashed")(ext.NearDup.shingles(docs, "doc_id", "text", 3)
      .select(col("id"), xxhash64(col("shingle")).as("s")).count())
    time("hashed_fused")(ext.NearDup.hashedShingles(docs, "doc_id", "text", 3).count())
    time("minhash_signatures")(ext.NearDup.minhashSignatures(
      ext.NearDup.shingles(docs, "doc_id", "text", 3)
        .select(col("id"), xxhash64(col("shingle")).as("shingle")), 64).count())
    time("full_d03")(ext.NearDup.nearDuplicatePairs(docs, "doc_id", "text", 0.7).count())
    spark.stop()
  }
}
