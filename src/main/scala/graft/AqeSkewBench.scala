package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measures Spark's AQE runtime skew-join splitting against the engine's
  * plan-level salted join ([[graft.operators.SkewJoin]]) on a hot-key
  * corpus, to document when each is the right tool (VERDICT-r4 #6; findings
  * land in PLANS.md's skew appendix + the q44 note).
  *
  * Setup: lineitem ×10 (≈6M rows) with 60 % of rows collapsed onto ONE
  * order key, joined to orders ×10 (≈1.5M rows — too big to broadcast once
  * the threshold is off, emulating the 100 TB dim) and aggregated. The
  * autoBroadcastJoinThreshold is disabled so the join actually shuffles —
  * with a broadcastable dim there is no shuffle and no skew problem, which
  * is itself the first line of the guidance.
  *
  * AQE's skew thresholds are sized for production partitions
  * (256 MB / 5× median); the hot partition here is ~50 MB post-shuffle, so
  * the thresholds are lowered (8 MB / 2×) to let AQE engage at test scale —
  * the SAME proportional skew at cluster scale clears the defaults.
  *
  * Scenarios, each timed twice and reported as the better pass (the two
  * runs bound JIT/shuffle-warm-up); skew engagement is read from the
  * EXECUTED adaptive plan:
  *   1. plain join, uncached inputs, AQE on — skew split ENGAGES
  *      (`SortMergeJoin(skew=true)` + `AQEShuffleRead skewed`)
  *   2. plain join, cached inputs, AQE on/off — split engagement is
  *      GRANULARITY-SENSITIVE: AQE subdivides a hot reducer partition at
  *      map-output chunk boundaries, so when the hot key's rows sit in few
  *      upstream partitions the split silently cannot happen. Observed
  *      concretely: the same query over the same cached data shows
  *      skew=false when the cache was materialized with coarse
  *      partitioning (few mappers) and skew=true when built fine-grained —
  *      the silent-failure mode that keeps plan-level salting relevant
  *   3. salted join — plan-level splitting, unconditional by construction;
  *      costs numSalts × |dim| rows of replication, which dominates here
  *   4. groupBy(hot key) collect_list vs salted two-phase agg — the skew
  *      AQE does NOT cover (OptimizeSkewedJoin only splits JOIN
  *      partitions; collect_list partials don't combine away)
  */
object AqeSkewBench {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    val copies = 10
    val n = 100000000L
    val hotKey = 424242L

    def grow(df: DataFrame, key: String): DataFrame =
      df.crossJoin(spark.range(copies.toLong).select(col("id").as("__c")))
        .withColumn(key, col(key) + col("__c") * n).drop("__c")

    // 60% of fact rows land on ONE key (the hot task must DOMINATE wall
    // time — at 30% the hot task finishes with the pack and nothing is
    // skew-bound); the matching dim row exists once. Both CACHED and
    // UNCACHED variants are measured: AQE's skew split demonstrably does
    // NOT engage when the join reads .cache()'d relations (Spark 4.1.2,
    // verified with canChangeCachedPlanOutputPartitioning both ways) —
    // the cached shape is exactly what iterative/ML pipelines run.
    val liRaw = grow(Tables.lineitem(spark, sfDir), "l_orderkey")
      .withColumn("l_orderkey",
        when(pmod(xxhash64(col("l_orderkey")), lit(10)) < 6, lit(hotKey))
          .otherwise(col("l_orderkey")))
      .select("l_orderkey", "l_extendedprice", "l_quantity")
    val ordRaw = grow(Tables.orders(spark, sfDir), "o_orderkey")
      .select("o_orderkey", "o_orderstatus")
    // UNCACHED measurements must run BEFORE any cache() call: the cache
    // manager substitutes InMemoryRelation into ANY later plan containing
    // the cached subtree, so an "uncached" frame silently reads the cache
    // once its twin is cached.

    def joined(fact: DataFrame, dim: DataFrame): DataFrame =
      fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), sum(col("l_extendedprice")).as("rev"))

    def salted(fact: DataFrame, dim: DataFrame): DataFrame =
      operators.SkewJoin.salted(fact, dim.withColumnRenamed("o_orderkey", "l_orderkey"),
          Seq("l_orderkey"), numSalts = 32)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), sum(col("l_extendedprice")).as("rev"))

    def setConf(aqe: Boolean): Unit = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    }
    def mat(df: => DataFrame): Double =
      math.min(time(df.write.format("noop").mode("overwrite").save()),
               time(df.write.format("noop").mode("overwrite").save()))

    // NB skew detection must materialize df ITSELF (collect): df.write
    // runs its own QueryExecution, leaving df.queryExecution un-executed
    // with AdaptiveSparkPlan still showing the initial plan
    def skewEngaged(df: DataFrame): Boolean = {
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      p.contains("skew=true") || p.contains("skewed")
    }
    setConf(aqe = true)
    val tAqeRaw = mat(joined(liRaw, ordRaw))
    val skewRaw = skewEngaged(joined(liRaw, ordRaw))

    val li = liRaw.cache()
    val ord = ordRaw.cache()
    println(s"fact=${li.count()} rows (${li.filter(col("l_orderkey") === hotKey).count()} on the hot key), dim=${ord.count()} rows")
    setConf(aqe = false)
    val tPlain = mat(joined(li, ord))
    setConf(aqe = true)
    val tAqe = mat(joined(li, ord))
    val skewCached = skewEngaged(joined(li, ord))
    setConf(aqe = false)
    val tSalt = mat(salted(li, ord))
    setConf(aqe = true)
    val tSaltAqe = mat(salted(li, ord))
    // the case AQE does not cover: a skewed AGGREGATION partition with a
    // non-combinable payload (collect_list partials stay big, and
    // OptimizeSkewedJoin only re-splits JOIN partitions) — vs the manual
    // fix, salted two-phase aggregation
    def aggHot: DataFrame =
      li.groupBy("l_orderkey").agg(collect_list(col("l_quantity")).as("qs"))
        .select(col("l_orderkey"), size(col("qs")).as("nq"))
    def aggSalted: DataFrame =
      li.withColumn("__salt",
          pmod(xxhash64(monotonically_increasing_id()), lit(32)).cast("int"))
        .groupBy("l_orderkey", "__salt")
        .agg(collect_list(col("l_quantity")).as("qs"))
        .groupBy("l_orderkey")
        .agg(sum(size(col("qs"))).cast("int").as("nq"))
    val tAggHot = mat(aggHot)
    val tAggSalted = mat(aggSalted)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10m")

    println(f"AQESKEW cached:   plain_noaqe=${tPlain}%6.2fs  plain_aqe=${tAqe}%6.2fs  skew-split=$skewCached")
    println(f"AQESKEW uncached: plain_aqe=${tAqeRaw}%6.2fs  skew-split=$skewRaw")
    println(f"AQESKEW salted32_noaqe=${tSalt}%6.2fs  salted32_aqe=${tSaltAqe}%6.2fs")
    println(f"AQESKEW hot_group_collect aqe=${tAggHot}%6.2fs  salted_two_phase=${tAggSalted}%6.2fs")
    spark.stop()
  }
}
