package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrefixAggSpec extends SparkSpec {
  import spark.implicits._

  test("maxExclusive == the one-window exclusive prefix max (randomized, nulls, any partitioning)") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(20260815L)
    // values with ties, nulls, and a descending stretch (so trailing rows
    // genuinely depend on an earlier partition's max, not their own)
    val rows = Seq.tabulate(3000) { i =>
      val v: java.lang.Long =
        if (rnd.nextDouble() < 0.05) null
        else Long.box(if (i < 1500) rnd.nextInt(1000).toLong
                      else 2000L - i + rnd.nextInt(3))
      (i.toLong, v)
    }
    val d = rows.toDF("k", "v").repartition(13, col("k"))
    val w = Window.orderBy(col("k")).rowsBetween(Window.unboundedPreceding, -1)
    val want = d.withColumn("mp", max(col("v")).over(w))
      .select("k", "mp").as[(Long, Option[Long])].collect().toMap
    val got = PrefixAgg.maxExclusive(d, Seq(col("k")), col("v"), "mp")
      .select("k", "mp").as[(Long, Option[Long])].collect().toMap
    spark.catalog.clearCache() // release the internal persist
    assert(got.size == want.size)
    val diff = want.collect { case (k, mv) if got(k) != mv => (k, mv, got(k)) }
    assert(diff.isEmpty, s"first diffs: ${diff.take(5)}")
    // the globally first row has no predecessor
    assert(got(0L).isEmpty)
  }
}
