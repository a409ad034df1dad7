package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batch-level laws of the continuous per-stratum quota: replay
  * idempotence (the fragment protocol claim) and accumulated-cap
  * admission across installments.
  */
class QuotaViewSpec extends SparkSpec {
  import spark.implicits._

  test("append replay rewrites the identical fragment; caps accumulate") {
    val tmp = java.nio.file.Files.createTempDirectory("quota-view").toString
    try {
      QuotaView.init(spark, tmp)
      val b0 = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))
        .toDF("doc_id", "domain")
      val first = QuotaView.append(b0, "doc_id", "domain", tmp,
        batchId = 0L, cap = 2).as[(Long, String)].collect().toSet
      assert(first.count(_._2 == "a") == 2 && first.count(_._2 == "b") == 1)
      // at-least-once replay of the SAME batch: prior counts exclude the
      // batch's own fragment, so the recomputed admission is identical
      // and the overwrite is a no-op rewrite
      val replay = QuotaView.append(b0, "doc_id", "domain", tmp,
        batchId = 0L, cap = 2).as[(Long, String)].collect().toSet
      assert(replay == first)
      assert(QuotaView.read(spark, tmp).count() == 3)
      // batch 1: domain a is full (admits 0), b has one slot left
      val b1 = Seq((5L, "a"), (6L, "b"), (7L, "b")).toDF("doc_id", "domain")
      val second = QuotaView.append(b1, "doc_id", "domain", tmp,
        batchId = 1L, cap = 2).as[(Long, String)].collect().toSet
      assert(second.forall(_._2 == "b") && second.size == 1)
      val all = QuotaView.read(spark, tmp).as[(Long, String)].collect()
      assert(all.length == 4)
      assert(all.count(_._2 == "a") == 2 && all.count(_._2 == "b") == 2)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
  }
}
