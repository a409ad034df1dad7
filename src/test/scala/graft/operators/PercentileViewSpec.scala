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

  test("default bin budget scales with s: values past 2^17 sketch fine") {
    // round-12 ADVICE: the raw 2^16 default left s=15 only ~2 octaves
    // above the exact regime; the sized default covers the whole domain
    assert(PercentileView.defaultMaxBins(15) == ((64L - 15) << 15).toInt)
    assert(PercentileView.defaultMaxBins(22) == (1 << 22))
    // 70k DISTINCT fine-unit values occupy > 2^16 bins (the whole exact
    // regime plus the first estimation octave) — the old raw default
    // threw mid-aggregation here; the sized default absorbs it
    val big = spark.range(70000L)
      .select(lit(java.sql.Timestamp.valueOf("2024-05-01 08:00:00")).as("ts"),
        col("id").as("v"))
    // collect the sketch itself: a count() would let Catalyst PRUNE the
    // aggregate away and never build a single bin
    val sk = PercentileView.dailySketch(big, "ts", "v").collect()
    assert(sk.length == 1 && !sk(0).isNullAt(1))
    val threw = intercept[Exception] {
      // single partition: one update buffer sees every distinct bin —
      // the configuration the old default could kill mid-stream
      PercentileView.dailySketch(big.repartition(1), "ts", "v",
        maxBins = 1 << 16).collect()
    }
    assert(threw.toString.contains("maxBins") ||
      Option(threw.getCause).exists(_.getMessage.contains("maxBins")))
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
