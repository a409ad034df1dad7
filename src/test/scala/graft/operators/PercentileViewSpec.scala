package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PercentileView protocol laws on the sketch payload: idempotent
  * fragment replay, no-op replay of a folded batch (compacted_through
  * watermark), and fold-order invisibility — the accumulated view always
  * equals the one-shot sketch over all events.
  */
class PercentileViewSpec extends SparkSpec {
  import spark.implicits._

  private def events(ids: Range) = ids.map { i =>
    (java.sql.Timestamp.valueOf(f"2024-05-${1 + i % 3}%02d 08:00:00"),
      (i * 37 % 900).toLong)
  }.toDF("ts", "cents")

  private def direct(df: org.apache.spark.sql.DataFrame) = {
    import graft.plans.QuantileSketch
    df.groupBy(col("ts").cast("date").as("day"))
      .agg(QuantileSketch.sketch(col("cents"), 15).as("sk"))
      .select(col("day"), QuantileSketch.sketchCount(col("sk")).as("n_events"),
        QuantileSketch.quantileAt(col("sk"), 50).as("p50"),
        QuantileSketch.quantileAt(col("sk"), 95).as("p95"),
        QuantileSketch.quantileAt(col("sk"), 99).as("p99"))
      .as[(java.sql.Date, Long, Long, Long, Long)].collect().toSet
  }

  test("replayed fragments, mid-stream folds and folded-batch replays are invisible") {
    val dir = java.nio.file.Files.createTempDirectory("pview").toString
    try {
      val b0 = events(0 until 40)
      val b1 = events(40 until 90)
      PercentileView.init(spark, dir)
      PercentileView.append(b0, "ts", "cents", dir, 0L)
      // at-least-once: the same batch lands twice -> overwrites itself
      PercentileView.append(b0, "ts", "cents", dir, 0L)
      PercentileView.compact(spark, dir)
      // a replay of the FOLDED batch is a no-op (compacted_through)
      PercentileView.append(b0, "ts", "cents", dir, 0L)
      PercentileView.append(b1, "ts", "cents", dir, 1L)
      val got = PercentileView.read(spark, dir)
        .as[(java.sql.Date, Long, Long, Long, Long)].collect().toSet
      assert(got == direct(b0.unionByName(b1)), s"got $got")
      // a second fold is pure re-layout
      PercentileView.compact(spark, dir)
      val after = PercentileView.read(spark, dir)
        .as[(java.sql.Date, Long, Long, Long, Long)].collect().toSet
      assert(after == got)
      assert(PercentileView.fragmentCount(spark, dir) == 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
