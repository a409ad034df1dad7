package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewAndBucketSpec extends SparkSpec {
  import spark.implicits._

  test("SkewJoin.salted equals the plain join on skewed data (inner + left)") {
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i % 7 else 999, i)).toDF("k", "lv")
    val right = (0 to 10).map(i => (i, s"r$i")).toDF("k", "rv") // 999 unmatched
    val plainInner = left.join(right, Seq("k")).select("k", "lv", "rv")
      .as[(Int, Int, String)].collect().toSet
    val saltedInner = SkewJoin.salted(left, right, Seq("k"), numSalts = 8)
      .select("k", "lv", "rv").as[(Int, Int, String)].collect().toSet
    assert(saltedInner == plainInner)

    val plainLeft = left.join(right, Seq("k"), "left").select("k", "lv", "rv")
      .as[(Int, Int, Option[String])].collect().toSet
    val saltedLeft = SkewJoin.salted(left, right, Seq("k"), 8, "left")
      .select("k", "lv", "rv").as[(Int, Int, Option[String])].collect().toSet
    assert(saltedLeft == plainLeft)
  }

  test("SkewJoin.salted rejects join types it cannot preserve") {
    val df = Seq((1, 1)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SkewJoin.salted(df, df, Seq("k"), 4, "full_outer")
    }
  }

  test("bucketed tables co-locate: join plan has no shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    // a fresh derby metastore doesn't know about locations left by earlier
    // test JVMs — clear them or CTAS refuses to reuse the path
    val wh = new java.io.File("spark-warehouse")
    Seq("bkt_orders", "bkt_lineitem").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        d.listFiles().foreach(_.delete()); d.delete()
      }
    }
    val o = (1 to 500).map(i => (i.toLong, i * 10.0)).toDF("okey", "total")
    val l = (1 to 2000).map(i => ((i % 500 + 1).toLong, i.toDouble)).toDF("okey", "qty")
    o.write.bucketBy(4, "okey").sortBy("okey").saveAsTable("bkt_orders")
    l.write.bucketBy(4, "okey").sortBy("okey").saveAsTable("bkt_lineitem")

    // force the sort-merge path: at this toy size Spark would otherwise
    // broadcast and skip bucketed reading entirely
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_orders").join(spark.table("bkt_lineitem"), "okey")
      val plan = joined.queryExecution.executedPlan.toString
      // both sides bucketed on the join key -> sort-merge join reads buckets
      // directly: no shuffle exchange anywhere in the plan
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() == 2000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
