package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Cols, Tables}
import graft.operators._
import graft.plans.JaroExpr

/** SURVEY §2 core relational surface: scans, projections/filters, joins
  * (equi / multi-key / semi / anti / fuzzy-top1 / range), aggregations
  * (group, pivot, rollup, distinct, top-k), window functions (rank, lag,
  * running sums, interpolation, qcut, surrogate keys), set ops, scalar
  * functions (binning, dict map, date parts, regex, JSON).
  *
  * Every query is written plan-first: filters before joins, small sides
  * broadcast, aggregates map-side-combinable, decimal-routed double sums for
  * oracle parity (see [[graft.Cols]]).
  */
object CoreQueries {
  import GraftQuery.dsum

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    GraftQuery(name, fn, Some(oracle))

  // ---------------------------------------------------------------- q01
  /** Flagship TPC-H-Q1-style scan+agg (reference A-family aggregates). */
  val q01_pricing_summary = q("q01_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsum("l_quantity")} AS sum_qty,
       |  ${dsum("l_extendedprice")} AS sum_base_price,
       |  ${dsum("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
       |  ${dsum("l_quantity")}/COUNT(*) AS avg_qty,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1999-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("1999-09-02 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Cols.decimalSum(col("l_quantity")).as("sum_qty"),
        Cols.decimalSum(col("l_extendedprice")).as("sum_base_price"),
        Cols.decimalSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        Cols.decimalAvg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
  }

  // ---------------------------------------------------------------- q02
  /** Projection + predicate, both pushed into the parquet scan (P1/P3). */
  val q02_filter_project = q("q02_filter_project",
    """SELECT o_orderkey, o_totalprice, o_orderdate
      |FROM orders
      |WHERE o_orderstatus = 'O' AND o_totalprice > 200000.0""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 200000.0)
      .select("o_orderkey", "o_totalprice", "o_orderdate")
  }

  // ---------------------------------------------------------------- q03
  /** Two-key left equi-join against a derived dimension (J1/J2 shape):
    * the dim side is an aggregate (tiny) → broadcast, no shuffle of the fact.
    */
  val q03_left_join_2key = q("q03_left_join_2key",
    s"""WITH d AS (
       |  SELECT l_returnflag AS rf, l_linestatus AS ls,
       |         ${dsum("l_quantity")} AS grp_qty
       |  FROM lineitem GROUP BY 1, 2)
       |SELECT l_orderkey, l_linenumber, l_quantity, grp_qty
       |FROM lineitem LEFT JOIN d
       |  ON l_returnflag = d.rf AND l_linestatus = d.ls""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val dim = li.groupBy(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
      .agg(Cols.decimalSum(col("l_quantity")).as("grp_qty"))
    li.join(broadcast(dim),
        li("l_returnflag") === dim("rf") && li("l_linestatus") === dim("ls"), "left")
      .select("l_orderkey", "l_linenumber", "l_quantity", "grp_qty")
  }

  // ---------------------------------------------------------------- q04
  /** Snowflake join chain with broadcast dims + grouped agg. */
  val q04_join_chain_agg = q("q04_join_chain_agg",
    s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
       |  ${dsum("c_acctbal")} AS total_bal
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_cust"), Cols.decimalSum(col("c_acctbal")).as("total_bal"))
  }

  // ---------------------------------------------------------------- q05
  /** Anti join: customers with no finished ('F') order. (Every customer has
    * SOME order in the synthetic data, so the anti-join is against the
    * filtered side — filter pushes below the join, result is non-empty.)
    */
  val q05_anti_join = q("q05_anti_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey NOT IN (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  // ---------------------------------------------------------------- q06
  /** Semi join: parts that actually ship. */
  val q06_semi_join = q("q06_semi_join",
    """SELECT p_partkey, p_name FROM part
      |WHERE p_partkey IN (SELECT l_partkey FROM lineitem)""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .join(Tables.lineitem(s, dir), col("p_partkey") === col("l_partkey"), "left_semi")
      .select("p_partkey", "p_name")
  }

  // ---------------------------------------------------------------- q07
  /** Fuzzy top-1 similarity join (J3/F7): each supplier name to its nearest
    * nation name by Levenshtein distance, distinct+broadcast rewrite of the
    * reference's memoised scalar loop.
    */
  val q07_fuzzy_top1 = q("q07_fuzzy_top1",
    """WITH cand AS (SELECT DISTINCT n_name FROM nation),
      |keys AS (SELECT DISTINCT s_name FROM supplier),
      |scored AS (
      |  SELECT s_name AS k, n_name, levenshtein(s_name, n_name) AS dist
      |  FROM keys CROSS JOIN cand),
      |best AS (
      |  SELECT k, n_name, dist,
      |         ROW_NUMBER() OVER (PARTITION BY k ORDER BY dist ASC, n_name ASC) AS rn
      |  FROM scored)
      |SELECT s_suppkey, s_name, b.n_name AS match_name, b.dist AS match_dist
      |FROM supplier LEFT JOIN best b ON s_name = b.k AND b.rn = 1""".stripMargin) { (s, dir) =>
    val matched = FuzzyJoin.top1(
      Tables.supplier(s, dir), "s_name", Tables.nation(s, dir), "n_name", "match_name")
    matched.select(col("s_suppkey"), col("s_name"),
      col("match_name"), col("match_name_dist").as("match_dist"))
  }

  // ---------------------------------------------------------------- q08
  /** Pivot with mean-over-duplicates (A1, `pivot_table` semantics). */
  val q08_pivot_mean = q("q08_pivot_mean",
    s"""SELECT l_linestatus,
       |  ${dsum("CASE WHEN l_returnflag='A' THEN l_quantity END")}/COUNT(CASE WHEN l_returnflag='A' THEN 1 END) AS "A",
       |  ${dsum("CASE WHEN l_returnflag='N' THEN l_quantity END")}/COUNT(CASE WHEN l_returnflag='N' THEN 1 END) AS "N",
       |  ${dsum("CASE WHEN l_returnflag='R' THEN l_quantity END")}/COUNT(CASE WHEN l_returnflag='R' THEN 1 END) AS "R"
       |FROM lineitem GROUP BY l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(Cols.decimalSum(col("l_quantity")) / count(col("l_quantity")))
  }

  // ---------------------------------------------------------------- q09
  /** Keep-first keyed dedup (A2), pandas keep-first pinned by row_number.
    * The tie-break covers enough columns to be a total order (l_linenumber
    * alone is NOT unique per order in the synthetic data).
    */
  val q09_dedup_keep_first = q("q09_dedup_keep_first",
    """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |    ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice) AS rn
      |  FROM lineitem) t
      |WHERE rn = 1""".stripMargin) { (s, dir) =>
    Dedup.keepFirst(Tables.lineitem(s, dir), Seq("l_orderkey"),
        Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice")))
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
  }

  // ---------------------------------------------------------------- q10
  /** Surrogate-key assignment (W3): contiguous 1..n in a deterministic order. */
  val q10_surrogate_key = q("q10_surrogate_key",
    """SELECT ROW_NUMBER() OVER (ORDER BY n_name) AS Id, n_name AS Name
      |FROM nation""".stripMargin) { (s, dir) =>
    SurrogateKey.dense(Tables.nation(s, dir).select(col("n_name").as("Name")),
      Seq(col("Name"))).select("Id", "Name")
  }

  // ---------------------------------------------------------------- q11
  /** Grouped linear interpolation (W1, pandas `interpolate()` semantics):
    * per-customer order-value series with synthetic interior nulls.
    */
  val q11_interpolate = q("q11_interpolate",
    """WITH base AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS v
      |  FROM orders),
      |pos AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS p
      |  FROM base),
      |m AS (
      |  SELECT *,
      |    LAST_VALUE(v IGNORE NULLS) OVER w1 AS pv,
      |    LAST_VALUE(CASE WHEN v IS NOT NULL THEN p END IGNORE NULLS) OVER w1 AS pp,
      |    FIRST_VALUE(v IGNORE NULLS) OVER w2 AS nv,
      |    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN p END IGNORE NULLS) OVER w2 AS np
      |  FROM pos
      |  WINDOW
      |    w1 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT o_custkey, o_orderkey,
      |  CASE WHEN v IS NOT NULL THEN v
      |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN pv + (nv-pv)*(p-pp)/(np-pp)
      |       WHEN pv IS NOT NULL THEN pv
      |  END AS v
      |FROM m""".stripMargin) { (s, dir) =>
    val base = Tables.orders(s, dir).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      when(col("o_orderkey") % 7 === 0, lit(null)).otherwise(col("o_totalprice")).as("v"))
    Interpolate.linear(base, Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"), Seq("v"))
      .select("o_custkey", "o_orderkey", "v")
  }

  // ---------------------------------------------------------------- q12
  /** Per-group qcut(3, duplicates="drop") (W2): equal-frequency buckets of
    * order value within each order year.
    */
  val q12_qcut_buckets = q("q12_qcut_buckets",
    """WITH t AS (
      |  SELECT o_orderkey, year(o_orderdate) AS yr, o_totalprice AS v FROM orders),
      |e AS (
      |  SELECT yr, min(v) AS mn, quantile_cont(v, 1.0/3.0) AS q1,
      |         quantile_cont(v, 2.0/3.0) AS q2, max(v) AS mx
      |  FROM t GROUP BY yr),
      |e2 AS (SELECT yr, list_sort(list_distinct([mn, q1, q2, mx])) AS edges FROM e)
      |SELECT o_orderkey, t.yr, v AS o_totalprice,
      |  CASE WHEN v IS NULL THEN NULL
      |       WHEN len(edges) - 1 <= 1 THEN 'Low'
      |       WHEN len(edges) - 1 = 2 THEN (CASE WHEN v <= edges[2] THEN 'Low' ELSE 'High' END)
      |       ELSE (CASE WHEN v <= edges[2] THEN 'Low'
      |                  WHEN v <= edges[3] THEN 'Medium' ELSE 'High' END)
      |  END AS bucket
      |FROM t JOIN e2 ON t.yr = e2.yr""".stripMargin) { (s, dir) =>
    val t = Tables.orders(s, dir).select(
      col("o_orderkey"), year(col("o_orderdate")).as("yr"), col("o_totalprice"))
    QuantileBucket.qcut3(t, Seq("yr"), "o_totalprice", "bucket")
      .select("o_orderkey", "yr", "o_totalprice", "bucket")
  }

  // ---------------------------------------------------------------- q13
  /** Top-k by frequency (O2) with deterministic tie-break. */
  val q13_topk_freq = q("q13_topk_freq",
    """SELECT p_brand AS value, COUNT(*) AS cnt FROM part
      |GROUP BY 1 ORDER BY cnt DESC, value ASC LIMIT 10""".stripMargin) { (s, dir) =>
    Profile.topK(Tables.part(s, dir), "p_brand", 10)
  }

  // ---------------------------------------------------------------- q14
  /** Rollup (grouping-sets surface). */
  val q14_rollup = q("q14_rollup",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsum("l_quantity")} AS sum_qty, COUNT(*) AS n
       |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(Cols.decimalSum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
  }

  // ---------------------------------------------------------------- q15
  /** Set operations: intersect / except / union-all over nation keys. */
  val q15_set_ops = q("q15_set_ops",
    """SELECT 'both' AS tag, nk FROM (
      |  SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier) a
      |UNION ALL
      |SELECT 'cust_only' AS tag, nk FROM (
      |  SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier) b""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir).select(col("c_nationkey").as("nk"))
    val sup = Tables.supplier(s, dir).select(col("s_nationkey").as("nk"))
    val both = c.intersect(sup).select(lit("both").as("tag"), col("nk"))
    val custOnly = c.except(sup).select(lit("cust_only").as("tag"), col("nk"))
    both.unionByName(custOnly)
  }

  // ---------------------------------------------------------------- q16
  /** Date-dimension derivation (F3/F4/W3): year/quarter/season-map/decade. */
  val q16_dim_date = q("q16_dim_date",
    """WITH d AS (
      |  SELECT DISTINCT year(o_orderdate) AS Year, quarter(o_orderdate) AS Quarter
      |  FROM orders)
      |SELECT ROW_NUMBER() OVER (ORDER BY Year, Quarter) AS Id, Year, Quarter,
      |  CASE Quarter WHEN 1 THEN 'Winter' WHEN 2 THEN 'Spring'
      |               WHEN 3 THEN 'Summer' WHEN 4 THEN 'Autumn' END AS QuarterName,
      |  CAST(FLOOR(Year / 10.0) * 10 AS INT) AS Decade
      |FROM d""".stripMargin) { (s, dir) =>
    val d = Tables.orders(s, dir)
      .select(year(col("o_orderdate")).as("Year"), quarter(col("o_orderdate")).as("Quarter"))
      .distinct()
    SurrogateKey.dense(d, Seq(col("Year"), col("Quarter")))
      .select(col("Id"), col("Year"), col("Quarter"),
        Bin.dictMap(col("Quarter"), Map(1 -> "Winter", 2 -> "Spring", 3 -> "Summer", 4 -> "Autumn"))
          .as("QuarterName"),
        (floor(col("Year") / 10.0) * 10).cast("int").as("Decade"))
  }

  // ---------------------------------------------------------------- q17
  /** Static-edge binning (F5/F6, `pd.cut` right-open semantics). */
  val q17_static_bins = q("q17_static_bins",
    """SELECT c_custkey, c_acctbal,
      |  CASE WHEN c_acctbal >= -1000.0 AND c_acctbal < 0.0 THEN 'negative'
      |       WHEN c_acctbal >= 0.0 AND c_acctbal < 2000.0 THEN '0-2k'
      |       WHEN c_acctbal >= 2000.0 AND c_acctbal < 4000.0 THEN '2-4k'
      |       WHEN c_acctbal >= 4000.0 AND c_acctbal < 6000.0 THEN '4-6k'
      |       WHEN c_acctbal >= 6000.0 AND c_acctbal < 8000.0 THEN '6-8k'
      |       WHEN c_acctbal >= 8000.0 AND c_acctbal < 10000.0 THEN '8k+'
      |  END AS bal_bucket
      |FROM customer""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir).select(col("c_custkey"), col("c_acctbal"),
      Bin.cut(col("c_acctbal"),
        Seq(-1000, 0, 2000, 4000, 6000, 8000, 10000),
        Seq("negative", "0-2k", "2-4k", "4-6k", "6-8k", "8k+")).as("bal_bucket"))
  }

  // ---------------------------------------------------------------- q18
  /** Conditional value rewrite (P4, gender-normalize shape). */
  val q18_conditional_rewrite = q("q18_conditional_rewrite",
    """SELECT o_orderkey,
      |  CASE WHEN o_orderstatus IN ('F','O') THEN o_orderstatus ELSE 'UNKNOWN' END AS status_norm
      |FROM orders""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).select(col("o_orderkey"),
      when(col("o_orderstatus").isin("F", "O"), col("o_orderstatus"))
        .otherwise(lit("UNKNOWN")).as("status_norm"))
  }

  // ---------------------------------------------------------------- q19
  /** Data profiler (A5): per-column nulls/distinct/length stats, one pass. */
  val q19_profile = q("q19_profile", {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    cols.map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(CASE WHEN $c IS NULL THEN 1 END) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN(length(CAST($c AS VARCHAR))) AS INT) AS min_len,
         |  AVG(length(CAST($c AS VARCHAR))) AS avg_len,
         |  CAST(MAX(length(CAST($c AS VARCHAR))) AS INT) AS max_len
         |FROM documents""".stripMargin
    }.mkString("\nUNION ALL\n")
  }) { (s, dir) => Profile.profile(Tables.documents(s, dir)) }

  // ---------------------------------------------------------------- q20
  /** IQR outlier detection (A6). */
  val q20_iqr_outliers = q("q20_iqr_outliers",
    """WITH q AS (
      |  SELECT quantile_cont(o_totalprice, 0.25) AS q1,
      |         quantile_cont(o_totalprice, 0.75) AS q3
      |  FROM orders)
      |SELECT COUNT(CASE WHEN o_totalprice < q1 - (q3-q1)*1.5
      |                    OR o_totalprice > q3 + (q3-q1)*1.5 THEN 1 END) AS n_outliers,
      |       MIN(q1 - (q3-q1)*1.5) AS lo, MIN(q3 + (q3-q1)*1.5) AS hi
      |FROM orders, q""".stripMargin) { (s, dir) =>
    Profile.iqrOutliers(Tables.orders(s, dir), "o_totalprice")
  }

  // ---------------------------------------------------------------- q21
  /** Ranking / lag / running-sum window surface (engine requirement §2.5). */
  val q21_window_rank = q("q21_window_rank",
    """SELECT o_custkey, o_orderkey,
      |  RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
      |  LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_total,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
      |FROM orders""".stripMargin) { (s, dir) =>
    val byVal = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val byTime = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir).select(
      col("o_custkey"), col("o_orderkey"),
      rank().over(byVal).as("rnk"),
      lag(col("o_totalprice"), 1).over(byTime).as("prev_total"),
      Cols.decimalSumOver(col("o_totalprice"),
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("run_total"))
  }

  // ---------------------------------------------------------------- q22
  /** JSON field extraction (F10). */
  val q22_json_extract = q("q22_json_extract",
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
      |FROM events""".stripMargin) { (s, dir) =>
    Tables.events(s, dir).select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("int").as("k"))
  }

  // ---------------------------------------------------------------- q23
  /** Equi + range-predicate join: lineitems shipped within 30 days of their
    * order date. The range predicate rides the equi-join (no BNLJ).
    */
  val q23_range_join = q("q23_range_join",
    """SELECT o_orderkey,
      |  COUNT(CASE WHEN l_shipdate >= o_orderdate
      |              AND l_shipdate <= o_orderdate + INTERVAL 30 DAY THEN 1 END) AS n_within_30d
      |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderkey""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    o.join(li, col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy("o_orderkey")
      .agg(count(when(
        col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAY"), lit(1)))
        .as("n_within_30d"))
  }

  // ---------------------------------------------------------------- q24
  /** As-of join (windowed rewrite): for each event, the timestamp of the
    * user's most recent STRICTLY PRIOR purchase. Instead of a sort-merge
    * as-of join, tag+union+window gives an O(n log n) shuffle-once plan —
    * see graft.operators.AsOfJoin for the general two-table form.
    */
  val q24_asof_prev_purchase = q("q24_asof_prev_purchase",
    """SELECT event_id, date_trunc('second', prev_purchase_ts) AS prev_purchase_ts FROM (
      |  SELECT event_id,
      |    LAST_VALUE(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase_ts
      |  FROM events) t""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir).select(
      col("event_id"),
      date_trunc("second",
        last(when(col("event_type") === "purchase", col("ts")), ignoreNulls = true).over(w))
        .as("prev_purchase_ts"))
  }

  // ---------------------------------------------------------------- q25
  /** Cube (full grouping-set lattice) with grouping-id disambiguation. */
  val q25_cube = q("q25_cube",
    s"""SELECT l_returnflag, l_linestatus, CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
       |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls, ${dsum("l_quantity")} AS sum_qty, COUNT(*) AS n
       |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        Cols.decimalSum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "sum_qty", "n")
  }

  // ---------------------------------------------------------------- q26
  /** Distinct aggregates: exact COUNT(DISTINCT) single and multi-column. */
  val q26_distinct_agg = q("q26_distinct_agg",
    """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust,
      |  COUNT(DISTINCT year(o_orderdate)) AS n_years,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(year(col("o_orderdate"))).as("n_years"),
        count(lit(1)).as("n"))
  }

  // ---------------------------------------------------------------- q27
  /** Window-function breadth: dense_rank, ntile, lead, first/last over an
    * explicit frame — all on a TOTAL order (o_orderkey) so tie handling
    * cannot diverge between engines.
    */
  val q27_window_extras = q("q27_window_extras",
    """SELECT o_orderkey,
      |  CAST(DENSE_RANK() OVER w AS INT) AS drnk,
      |  CAST(NTILE(4) OVER w AS INT) AS quartile,
      |  LEAD(o_totalprice, 2) OVER w AS lead2,
      |  CAST(FIRST_VALUE(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS first3
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey)""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_orderkey"))
    val framed = w.rowsBetween(-2, Window.currentRow)
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      dense_rank().over(w).as("drnk"),
      ntile(4).over(w).as("quartile"),
      lead(col("o_totalprice"), 2).over(w).as("lead2"),
      first(col("o_totalprice")).over(framed).cast("double").as("first3"))
  }

  // ---------------------------------------------------------------- q28
  /** Scalar string + date function breadth (F8/F9/F11): case, substring,
    * regex replace, concat, length / date parts, truncation, day arithmetic.
    */
  val q28_scalar_funcs = q("q28_scalar_funcs",
    """SELECT p_partkey,
      |  upper(p_brand) AS brand_u,
      |  substr(p_name, 1, 8) AS name8,
      |  regexp_replace(p_type, '[aeiou]', '_', 'g') AS type_novowel,
      |  p_brand || '/' || p_type AS brand_type,
      |  CAST(length(p_name) AS INT) AS name_len
      |FROM part""".stripMargin) { (s, dir) =>
    Tables.part(s, dir).select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      substring(col("p_name"), 1, 8).as("name8"),
      regexp_replace(col("p_type"), "[aeiou]", "_").as("type_novowel"),
      concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
      length(col("p_name")).as("name_len"))
  }

  // ---------------------------------------------------------------- q29
  /** Date/time functions (F11): parts, truncation, day arithmetic, diffs. */
  val q29_date_funcs = q("q29_date_funcs",
    """SELECT o_orderkey,
      |  year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
      |  month(o_orderdate) AS mth, dayofmonth(o_orderdate) AS dom,
      |  date_trunc('month', o_orderdate) AS month_start,
      |  o_orderdate + INTERVAL 90 DAY AS due_date,
      |  CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since_95
      |FROM orders""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("yr"), quarter(col("o_orderdate")).as("qtr"),
      month(col("o_orderdate")).as("mth"), dayofmonth(col("o_orderdate")).as("dom"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      (col("o_orderdate") + expr("INTERVAL 90 DAY")).as("due_date"),
      datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01")))
        .cast("long").as("days_since_95"))
  }

  // ---------------------------------------------------------------- q30
  /** Numeric describe (A5): one-pass count/mean/min/max/variance per column,
    * decimal-routed so both engines compute the identical final doubles.
    */
  val q30_numeric_describe = q("q30_numeric_describe", {
    def block(c: String) =
      s"""SELECT '$c' AS col_name, COUNT($c) AS n,
         |  ROUND(CAST(SUM(CAST($c AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT($c) AS DOUBLE), 6) AS mean,
         |  MIN($c) AS min, MAX($c) AS max,
         |  ROUND(CASE WHEN COUNT($c) > 1 THEN
         |    sqrt(greatest(
         |      (CAST(SUM(CAST($c * $c AS DECIMAL(38,6))) AS DOUBLE)
         |       - CAST(SUM(CAST($c AS DECIMAL(38,6))) AS DOUBLE)
         |         * CAST(SUM(CAST($c AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT($c) AS DOUBLE))
         |      / (CAST(COUNT($c) AS DOUBLE) - 1.0), 0.0)) END, 6) AS stddev
         |FROM (SELECT CAST(o_totalprice AS DOUBLE) AS o_totalprice,
         |             CAST(o_custkey AS DOUBLE) AS o_custkey FROM orders)""".stripMargin
    Seq("o_totalprice", "o_custkey").map(block).mkString("\nUNION ALL\n")
  }) { (s, dir) =>
    Profile.numericSummary(Tables.orders(s, dir), Seq("o_totalprice", "o_custkey"))
  }

  // ---------------------------------------------------------------- q31
  /** TPC-H-Q3-shape shipping priority: selective filters on both sides of a
    * fact-fact join, grouped revenue, deterministic top-10. Filters push to
    * both scans; the orders side shrinks enough for AQE to broadcast it.
    */
  val q31_ship_priority = q("q31_ship_priority",
    s"""SELECT l_orderkey, ${dsum("l_extendedprice*(1-l_discount)")} AS revenue,
       |  o_orderdate
       |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1996-06-01 00:00:00'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    val cutoff = to_timestamp(lit("1996-06-01 00:00:00"))
    Tables.orders(s, dir).filter(col("o_orderdate") < cutoff)
      .join(Tables.lineitem(s, dir).filter(col("l_shipdate") > cutoff),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(Cols.decimalSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate")
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // ---------------------------------------------------------------- q32
  /** TPC-H-Q5-shape regional volume: fact x fact x three broadcast dims,
    * customer and supplier constrained to the same nation.
    */
  val q32_regional_volume = q("q32_regional_volume",
    s"""SELECT n_name, ${dsum("l_extendedprice*(1-l_discount)")} AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(Cols.decimalSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
  }

  // ---------------------------------------------------------------- q33
  /** TPC-H-Q17-shape correlated aggregate: lineitems under 20% of their
    * part's average quantity — the correlated subquery decorrelates to an
    * aggregate-then-join, the plan Spark and any modern optimizer converge
    * on.
    */
  val q33_small_quantity = q("q33_small_quantity",
    s"""WITH pa AS (
       |  SELECT l_partkey AS pk,
       |         0.2 * (${dsum("l_quantity")} / COUNT(*)) AS qty_thresh
       |  FROM lineitem GROUP BY l_partkey)
       |SELECT l_partkey, COUNT(*) AS n_small, ${dsum("l_extendedprice")} AS total_price
       |FROM lineitem JOIN pa ON l_partkey = pk
       |WHERE l_quantity < qty_thresh
       |GROUP BY l_partkey""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val pa = li.groupBy(col("l_partkey").as("pk"))
      .agg((lit(0.2) * (Cols.decimalSum(col("l_quantity")) / count(lit(1))))
        .as("qty_thresh"))
    li.join(pa, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("qty_thresh"))
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_small"),
        Cols.decimalSum(col("l_extendedprice")).as("total_price"))
  }

  // ---------------------------------------------------------------- q34
  /** Approximate statistics (the 100 TB profiling path): HyperLogLog
    * distinct counts and quantile sketches. Approximation is
    * engine-specific by nature → no SQL oracle; the regression net is a
    * committed golden parquet (see GoldenOracles). Determinism: HLL merge
    * is register-wise max (split-order-independent), and at 1e6 accuracy
    * the quantile sketch's compression can never fire below ~500k rows
    * (2·ε·n < 1), so the sketch holds every value and the result is the
    * exact percentile — stable under any partitioning. At a real 100 TB
    * run you would drop accuracy back to O(1e3) and accept rank error;
    * the exact twins are oracle-checked in q26/q30.
    */
  val q34_approx_stats = GraftQuery("q34_approx_stats", (s, dir) =>
    Tables.orders(s, dir).agg(
      approx_count_distinct(col("o_custkey")).as("approx_custs"),
      approx_count_distinct(col("o_orderkey")).as("approx_orders"),
      percentile_approx(col("o_totalprice"), lit(0.5), lit(1000000)).as("approx_median"),
      percentile_approx(col("o_totalprice"), lit(0.99), lit(1000000)).as("approx_p99")),
    oracle = GoldenOracles.sqlFor("q34_approx_stats"))

  // ---------------------------------------------------------------- q35
  /** Schema-first JSON parse (S5/F10): `from_json` with an explicit schema +
    * struct field access — the typed twin of q22's path extraction.
    */
  val q35_from_json = q("q35_from_json",
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k,
      |  CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod
      |FROM events""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .withColumn("j", from_json(col("props"), lit("k INT")))
      .select(col("event_id"), col("j.k").as("k"), (col("j.k") % 10).as("k_mod"))
  }

  // ---------------------------------------------------------------- q36
  /** Array aggregation (F13 beyond embeddings): per-group sorted value
    * lists and set sizes — collect_list is unordered by contract, so the
    * deterministic surface is sort_array(collect_list(...)); the list is
    * emitted stringified because array-typed result columns don't survive
    * row-sorting comparison harnesses.
    */
  val q36_array_agg = q("q36_array_agg",
    """SELECT c_nationkey,
      |  array_to_string(list_sort(list(c_mktsegment)), ',') AS segs,
      |  CAST(len(list_distinct(list(c_mktsegment))) AS INT) AS n_seg,
      |  list_sort(list(c_custkey))[1] AS min_cust
      |FROM customer GROUP BY c_nationkey""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .groupBy("c_nationkey")
      .agg(
        concat_ws(",", sort_array(collect_list(col("c_mktsegment")))).as("segs"),
        size(collect_set(col("c_mktsegment"))).as("n_seg"),
        array_min(collect_list(col("c_custkey"))).as("min_cust"))
  }

  // ---------------------------------------------------------------- q37
  /** TPC-H-Q13-shape customer order distribution: LEFT join so zero-order
    * customers count, then a second aggregation over the first — two shuffle
    * stages, the canonical histogram-of-aggregates plan.
    */
  val q37_order_distribution = q("q37_order_distribution",
    """WITH c_orders AS (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |SELECT c_count, COUNT(*) AS custdist
      |FROM c_orders GROUP BY c_count""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  // ---------------------------------------------------------------- q38
  /** TPC-H-Q2-shape correlated minimum: suppliers whose account balance is
    * the minimum within their nation — the correlated subquery decorrelates
    * to a grouped-min broadcast-joined back (same plan Catalyst derives for
    * the subquery form).
    */
  val q38_min_per_group_filter = q("q38_min_per_group_filter",
    """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
      |FROM supplier s
      |WHERE s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supplier s2
      |                   WHERE s2.s_nationkey = s.s_nationkey)""".stripMargin) { (s, dir) =>
    val sup = Tables.supplier(s, dir)
    val mins = sup.groupBy(col("s_nationkey").as("nk"))
      .agg(min(col("s_acctbal")).as("min_bal"))
    sup.join(broadcast(mins),
        col("s_nationkey") === col("nk") && col("s_acctbal") === col("min_bal"))
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
  }

  // ---------------------------------------------------------------- q39
  /** Profiler QUALITY VERDICTS (reference `raw_analysis/main.py:100-113`,
    * the "[UWAGA]/[OK]" assessment lines): missing-ratio verdicts at the
    * reference's 20 % threshold, empty-string detection for string columns,
    * true/false distribution for boolean columns — over a frame engineered
    * to hit every verdict branch (25 % nulls → high, 2 % → acceptable,
    * none → no_missing, injected empty strings, a derived boolean).
    */
  val q39_profile_verdicts = q("q39_profile_verdicts",
    """WITH src AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 4 = 0 THEN NULL ELSE o_orderstatus END AS status_sparse,
      |    CASE WHEN o_orderkey % 50 = 0 THEN NULL ELSE o_orderpriority END AS prio_mostly,
      |    CASE WHEN o_orderkey % 10 = 0 THEN '' ELSE o_orderstatus END AS status_dirty,
      |    o_totalprice > 150000 AS big_order
      |  FROM orders)
      |SELECT * FROM (
      |  SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
      |    COUNT(*) FILTER (o_orderkey IS NULL) AS n_null,
      |    ROUND(CAST(COUNT(*) FILTER (o_orderkey IS NULL) AS DOUBLE) / COUNT(*), 6) AS missing_ratio,
      |    CASE WHEN COUNT(*) FILTER (o_orderkey IS NULL) = 0 THEN 'no_missing'
      |         WHEN CAST(COUNT(*) FILTER (o_orderkey IS NULL) AS DOUBLE) / COUNT(*) > 0.2 THEN 'high_missing'
      |         ELSE 'acceptable_missing' END AS missing_verdict,
      |    CAST(NULL AS BIGINT) AS n_empty, CAST(NULL AS VARCHAR) AS empty_verdict,
      |    CAST(NULL AS BIGINT) AS n_true, CAST(NULL AS BIGINT) AS n_false
      |  FROM src
      |  UNION ALL
      |  SELECT 'status_sparse', COUNT(*),
      |    COUNT(*) FILTER (status_sparse IS NULL),
      |    ROUND(CAST(COUNT(*) FILTER (status_sparse IS NULL) AS DOUBLE) / COUNT(*), 6),
      |    CASE WHEN COUNT(*) FILTER (status_sparse IS NULL) = 0 THEN 'no_missing'
      |         WHEN CAST(COUNT(*) FILTER (status_sparse IS NULL) AS DOUBLE) / COUNT(*) > 0.2 THEN 'high_missing'
      |         ELSE 'acceptable_missing' END,
      |    COUNT(*) FILTER (status_sparse = ''),
      |    CASE WHEN COUNT(*) FILTER (status_sparse = '') > 0 THEN 'has_empty' ELSE 'ok' END,
      |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
      |  FROM src
      |  UNION ALL
      |  SELECT 'prio_mostly', COUNT(*),
      |    COUNT(*) FILTER (prio_mostly IS NULL),
      |    ROUND(CAST(COUNT(*) FILTER (prio_mostly IS NULL) AS DOUBLE) / COUNT(*), 6),
      |    CASE WHEN COUNT(*) FILTER (prio_mostly IS NULL) = 0 THEN 'no_missing'
      |         WHEN CAST(COUNT(*) FILTER (prio_mostly IS NULL) AS DOUBLE) / COUNT(*) > 0.2 THEN 'high_missing'
      |         ELSE 'acceptable_missing' END,
      |    COUNT(*) FILTER (prio_mostly = ''),
      |    CASE WHEN COUNT(*) FILTER (prio_mostly = '') > 0 THEN 'has_empty' ELSE 'ok' END,
      |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
      |  FROM src
      |  UNION ALL
      |  SELECT 'status_dirty', COUNT(*),
      |    COUNT(*) FILTER (status_dirty IS NULL),
      |    ROUND(CAST(COUNT(*) FILTER (status_dirty IS NULL) AS DOUBLE) / COUNT(*), 6),
      |    CASE WHEN COUNT(*) FILTER (status_dirty IS NULL) = 0 THEN 'no_missing'
      |         WHEN CAST(COUNT(*) FILTER (status_dirty IS NULL) AS DOUBLE) / COUNT(*) > 0.2 THEN 'high_missing'
      |         ELSE 'acceptable_missing' END,
      |    COUNT(*) FILTER (status_dirty = ''),
      |    CASE WHEN COUNT(*) FILTER (status_dirty = '') > 0 THEN 'has_empty' ELSE 'ok' END,
      |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
      |  FROM src
      |  UNION ALL
      |  SELECT 'big_order', COUNT(*),
      |    COUNT(*) FILTER (big_order IS NULL),
      |    ROUND(CAST(COUNT(*) FILTER (big_order IS NULL) AS DOUBLE) / COUNT(*), 6),
      |    CASE WHEN COUNT(*) FILTER (big_order IS NULL) = 0 THEN 'no_missing'
      |         WHEN CAST(COUNT(*) FILTER (big_order IS NULL) AS DOUBLE) / COUNT(*) > 0.2 THEN 'high_missing'
      |         ELSE 'acceptable_missing' END,
      |    CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
      |    COUNT(*) FILTER (big_order), COUNT(*) FILTER (NOT big_order)
      |  FROM src)""".stripMargin) { (s, dir) =>
    val src = Tables.orders(s, dir).select(
      col("o_orderkey"),
      when(col("o_orderkey") % 4 === 0, lit(null).cast("string"))
        .otherwise(col("o_orderstatus")).as("status_sparse"),
      when(col("o_orderkey") % 50 === 0, lit(null).cast("string"))
        .otherwise(col("o_orderpriority")).as("prio_mostly"),
      when(col("o_orderkey") % 10 === 0, lit(""))
        .otherwise(col("o_orderstatus")).as("status_dirty"),
      (col("o_totalprice") > 150000).as("big_order"))
    Profile.verdicts(src)
  }

  // ---------------------------------------------------------------- q40
  /** KMV distinct sketch per group (the mergeable alternative to q34's
    * HLL): per-status sketch of customers with the exact count alongside.
    * Hash-based k-minima are partitioning-independent → golden oracle
    * ([[GoldenOracles]]); KmvSketchSpec proves the estimator laws.
    */
  val q40_kmv_distinct = GraftQuery("q40_kmv_distinct", (s, dir) =>
    Tables.orders(s, dir).groupBy("o_orderstatus")
      .agg(count_distinct(col("o_custkey")).as("exact_custs"),
        graft.plans.KmvSketch.sketch(col("o_custkey"), 256).as("sk"))
      .select(col("o_orderstatus"), col("exact_custs"),
        round(graft.plans.KmvSketch.estimate(col("sk")), 4).as("kmv_custs")),
    oracle = GoldenOracles.sqlFor("q40_kmv_distinct"))

  // ---------------------------------------------------------------- q41
  /** Sketch SET ALGEBRA — the operation HLL cannot do losslessly:
    * per-segment sketches built in ONE pass (conditional inputs), then
    * union (lossless for KMV: kmin(A∪B) = kmin(kminA ∪ kminB)) and
    * intersection estimates between customer segments. At 100 TB this is
    * "distinct users in A∩B" without re-scanning either segment.
    */
  val q41_kmv_setops = GraftQuery("q41_kmv_setops", (s, dir) =>
    Tables.orders(s, dir).agg(
        graft.plans.KmvSketch.sketch(
          when(col("o_orderstatus") === "O", col("o_custkey")), 256).as("sko"),
        graft.plans.KmvSketch.sketch(
          when(col("o_orderstatus") === "F", col("o_custkey")), 256).as("skf"))
      .select(
        round(graft.plans.KmvSketch.estimate(col("sko")), 4).as("est_open"),
        round(graft.plans.KmvSketch.estimate(col("skf")), 4).as("est_finished"),
        round(graft.plans.KmvSketch.estimate(
          graft.plans.KmvSketch.merge(col("sko"), col("skf"))), 4).as("est_union"),
        round(graft.plans.KmvSketch.intersectEstimate(
          col("sko"), col("skf")), 4).as("est_intersect")),
    oracle = GoldenOracles.sqlFor("q41_kmv_setops"))

  // ---------------------------------------------------------------- q42
  /** Deterministic train/val/test corpus split by content hash
    * ([[Checks.hashSplit]]): split is a pure function of the key — stable
    * across runs, partitionings and engines (seeded `rand()` is not; its
    * draws depend on partition layout). The oracle replays the identical
    * md5-hex-threshold assignment, so this is a full hash check, not a
    * proportion check.
    */
  val q42_hash_split = q("q42_hash_split",
    s"""WITH s AS (
       |  SELECT CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) < 'cccd' THEN 'train'
       |              WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
       |              ELSE 'test' END AS split,
       |         o_totalprice
       |  FROM orders)
       |SELECT split, COUNT(*) AS n, ${dsum("o_totalprice")} AS sum_price
       |FROM s GROUP BY split""".stripMargin) { (s, dir) =>
    Checks.hashSplit(Tables.orders(s, dir), col("o_orderkey"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split")
      .agg(count(lit(1)).as("n"),
        Cols.decimalSum(col("o_totalprice")).as("sum_price"))
  }

  // ---------------------------------------------------------------- q43
  /** Declarative data-quality constraint report ([[Checks.report]]): all
    * rules counted in ONE aggregation pass — the guardrail a corpus load
    * runs before landing (fail on any `pass = false` row).
    */
  val q43_quality_checks = q("q43_quality_checks",
    """WITH m AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(*) FILTER (NOT COALESCE(l_quantity > 0, FALSE)) AS v_qty,
      |    COUNT(*) FILTER (NOT COALESCE(l_discount BETWEEN 0 AND 1, FALSE)) AS v_disc,
      |    COUNT(*) FILTER (NOT COALESCE(l_tax >= 0, FALSE)) AS v_tax,
      |    COUNT(*) FILTER (NOT COALESCE(l_returnflag IN ('A','N','R'), FALSE)) AS v_rf
      |  FROM lineitem)
      |SELECT r.rule, m.n AS n_rows, r.v AS n_violations, r.v = 0 AS pass
      |FROM m, LATERAL (VALUES
      |  ('qty_positive', v_qty), ('discount_range', v_disc),
      |  ('tax_nonneg', v_tax), ('returnflag_domain', v_rf)) r(rule, v)""".stripMargin) { (s, dir) =>
    Checks.report(Tables.lineitem(s, dir), Seq(
      Checks.Rule("qty_positive", col("l_quantity") > 0),
      Checks.Rule("discount_range", col("l_discount").between(0, 1)),
      Checks.Rule("tax_nonneg", col("l_tax") >= 0),
      Checks.Rule("returnflag_domain", col("l_returnflag").isin("A", "N", "R"))))
  }

  // ---------------------------------------------------------------- q44
  /** Salted skew join under the gate: lineitem ⋈ orders through
    * [[SkewJoin.salted]] must equal the plain equi-join exactly — salting
    * redistributes a hot key over `numSalts` tasks without changing a
    * single row (the salt is joined on both sides, then dropped). The plan
    * fix for skew where AQE can't re-split.
    */
  val q44_salted_join = q("q44_salted_join",
    s"""SELECT o_orderstatus, COUNT(*) AS n,
       |  ${dsum("l_extendedprice")} AS sum_price
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
    SkewJoin.salted(
        Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice"),
        Tables.orders(s, dir).select("o_orderkey", "o_orderstatus")
          .withColumnRenamed("o_orderkey", "l_orderkey"),
        keys = Seq("l_orderkey"), numSalts = 8)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        Cols.decimalSum(col("l_extendedprice")).as("sum_price"))
  }

  // ---------------------------------------------------------------- q45
  /** q07's reference-parity variant (J3/F7): top-1 match scored by thefuzz
    * `fuzz.ratio` (rapidfuzz Indel similarity, [[graft.plans
    * .IndelRatioExpr]]) instead of raw Levenshtein — the scorer the
    * reference's `process.extractOne` actually maximizes. LCS has no
    * DuckDB twin → golden-parquet oracle ([[GoldenOracles]]); FunctionsSpec
    * pins the scorer against documented thefuzz outputs.
    */
  val q45_fuzz_ratio_top1 = GraftQuery("q45_fuzz_ratio_top1", (s, dir) =>
    FuzzyJoin.top1Fuzz(
        Tables.supplier(s, dir), "s_name", Tables.nation(s, dir), "n_name", "match_name")
      .select(col("s_suppkey"), col("s_name"),
        col("match_name"), col("match_name_score").as("match_score")),
    oracle = GoldenOracles.sqlFor("q45_fuzz_ratio_top1"))

  // ---------------------------------------------------------------- q49
  /** The reference's LITERAL `process.extractOne(x, countries)` semantics
    * (`ops/transform.py:55`): top-1 match under thefuzz's DEFAULT scorer —
    * the WRatio composite ([[graft.plans.WRatioExpr]]), not plain `ratio`.
    * WRatio blends ratio / partial_ratio / partial-token ratios with
    * length-dependent weights and applies the default processor, so it can
    * rank candidates differently from q45's pure-ratio variant (e.g.
    * substring-shaped candidates gain partial-alignment credit). Composite
    * float scoring has no DuckDB twin → golden-parquet oracle
    * ([[GoldenOracles]]); FunctionsSpec pins every component scorer against
    * documented thefuzz outputs.
    */
  val q49_wratio_top1 = GraftQuery("q49_wratio_top1", (s, dir) =>
    FuzzyJoin.top1WRatio(
        Tables.supplier(s, dir), "s_name", Tables.nation(s, dir), "n_name", "match_name")
      .select(col("s_suppkey"), col("s_name"),
        col("match_name"), col("match_name_score").as("match_score")),
    oracle = GoldenOracles.sqlFor("q49_wratio_top1"))

  // ---------------------------------------------------------------- q46
  /** Deterministic stratified sampling ([[Sampling.stratified]]): 100
    * orders per order-status, drawn by hash order so the draw is a pure
    * function of the data — reproducible across runs, partitionings, AND
    * engines. This query uses the md5 hash variant precisely so DuckDB
    * can replay the identical draw (both engines emit lowercase-hex md5
    * of the decimal key string); production callers keep the xxhash64
    * default (8-byte, codegen'd) documented in the operator.
    */
  val q46_stratified_sample = q("q46_stratified_sample",
    """WITH r AS (
      |  SELECT o_orderstatus, o_orderkey, o_totalprice,
      |         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |           ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
      |  FROM orders)
      |SELECT o_orderstatus, o_orderkey, o_totalprice
      |FROM r WHERE rn <= 100""".stripMargin) { (s, dir) =>
    Sampling.stratified(
      Tables.orders(s, dir).select("o_orderstatus", "o_orderkey", "o_totalprice"),
      strataCols = Seq("o_orderstatus"), k = 100, keyCols = Seq("o_orderkey"),
      hash = Some(md5(col("o_orderkey").cast("string").cast("binary"))))
  }

  // ---------------------------------------------------------------- q47
  /** Jaro-similarity top-1 matching ([[graft.plans.JaroExpr]] — the
    * record-linkage scorer, position-windowed rather than edit-script
    * based). DuckDB ships `jaro_similarity`, so unlike the LCS-based q45
    * this scorer is fully SQL-oracle-checked: both engines rank on the
    * 6-dp-rounded score (rank-then-round would let sub-ULP differences
    * flip near-ties).
    */
  val q47_jaro_top1 = q("q47_jaro_top1",
    """WITH cand AS (SELECT DISTINCT n_name FROM nation),
      |keys AS (SELECT DISTINCT s_name FROM supplier),
      |scored AS (
      |  SELECT s_name, n_name, ROUND(jaro_similarity(s_name, n_name), 6) AS sim
      |  FROM keys CROSS JOIN cand),
      |best AS (
      |  SELECT s_name, n_name, sim,
      |         ROW_NUMBER() OVER (PARTITION BY s_name
      |                            ORDER BY sim DESC, n_name) AS rn
      |  FROM scored)
      |SELECT s_name, n_name AS match_name, sim FROM best WHERE rn = 1""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val cand = Tables.nation(s, dir).select(col("n_name")).distinct()
    val keys = Tables.supplier(s, dir).select(col("s_name")).distinct()
    val scored = keys.crossJoin(broadcast(cand))
      .withColumn("sim", round(JaroExpr.jaroSimilarity(col("s_name"), col("n_name")), 6))
    val w = Window.partitionBy("s_name").orderBy(col("sim").desc, col("n_name"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("s_name"), col("n_name").as("match_name"), col("sim"))
  }

  // ---------------------------------------------------------------- q48
  /** Distribution drift ([[Drift.psiByBin]]): PSI of the order-price
    * distribution between the even-key and odd-key halves of `orders` —
    * the per-batch "does new data still look like the corpus" monitor.
    * Fixed equal-width bins keep the metric deterministic and
    * batch-comparable; the oracle replays the identical smoothing and log
    * algebra (ln matches at 6 dp).
    */
  val q48_drift_psi = q("q48_drift_psi",
    """WITH b AS (
      |  SELECT CAST(least(greatest(floor((o_totalprice - 0.0) / 60000.0), 0.0), 9.0) AS INT) AS bin,
      |         o_orderkey % 2 AS side
      |  FROM orders),
      |p AS (SELECT bin, COUNT(*) AS n_ref FROM b WHERE side = 0 GROUP BY bin),
      |q AS (SELECT bin, COUNT(*) AS n_cand FROM b WHERE side = 1 GROUP BY bin),
      |t AS (SELECT
      |        (SELECT COUNT(*) FROM b WHERE side = 0) AS t_ref,
      |        (SELECT COUNT(*) FROM b WHERE side = 1) AS t_cand),
      |m AS (
      |  SELECT g.bin,
      |    COALESCE(n_ref, 0) / CAST(t_ref AS DOUBLE) + 0.000001 AS pm,
      |    COALESCE(n_cand, 0) / CAST(t_cand AS DOUBLE) + 0.000001 AS qm
      |  FROM (SELECT unnest(range(10)) AS bin) g
      |  LEFT JOIN p ON g.bin = p.bin LEFT JOIN q ON g.bin = q.bin
      |  CROSS JOIN t)
      |SELECT CAST(bin AS INT) AS bin, ROUND(pm, 6) AS p_mass, ROUND(qm, 6) AS q_mass,
      |  ROUND((pm - qm) * ln(pm / qm), 6) AS contrib
      |FROM m""".stripMargin) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    Drift.psiByBin(
      orders.filter(col("o_orderkey") % 2 === 0).select("o_totalprice"),
      orders.filter(col("o_orderkey") % 2 =!= 0).select("o_totalprice"),
      "o_totalprice", bins = 10, lo = 0.0, hi = 600000.0)
  }

  // ---------------------------------------------------------------- q50
  /** GROUPING SETS — the explicit-set form completing the q14 rollup /
    * q25 cube family: per-flag totals, per-status totals, and the grand
    * total in ONE pass (Spark expands the sets over a single Expand node,
    * partial-aggregated before the shuffle — no N-scan union).
    */
  val q50_grouping_sets = q("q50_grouping_sets",
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
       |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
       |  ${dsum("l_quantity")} AS sum_qty, COUNT(*) AS n
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        Cols.decimalSum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "sum_qty", "n")
  }

  // ---------------------------------------------------------------- q51
  /** UNPIVOT/melt — wide-to-long reshaping (the inverse of q08's pivot):
    * a per-flag wide aggregate melts into (key, metric, value) rows via
    * the native `Dataset.unpivot` (Expand under the hood — row-local, no
    * shuffle beyond the feeding aggregate). DuckDB's UNPIVOT clause is
    * the oracle.
    */
  val q51_unpivot = q("q51_unpivot",
    s"""WITH wide AS (SELECT l_returnflag,
       |  ${dsum("l_quantity")} AS sum_qty,
       |  ${dsum("l_extendedprice")} AS sum_price,
       |  ${dsum("l_discount")} AS sum_disc
       |FROM lineitem GROUP BY 1)
       |UNPIVOT wide ON sum_qty, sum_price, sum_disc
       |INTO NAME metric VALUE value""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(Cols.decimalSum(col("l_quantity")).as("sum_qty"),
        Cols.decimalSum(col("l_extendedprice")).as("sum_price"),
        Cols.decimalSum(col("l_discount")).as("sum_disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "metric", "value")
  }

  // ---------------------------------------------------------------- q52
  /** Time-RANGE window frame — the rolling-interval aggregate q27's ROWS
    * frames cannot express: per user, how many events (and how much
    * value) landed in the trailing hour of EVENT TIME at each event. The
    * frame is value-based (epoch seconds, range 3600), so peers with
    * equal timestamps aggregate identically regardless of row order —
    * deterministic under any partitioning, and the batch twin of s02's
    * sliding windows.
    */
  val q52_time_range_window = q("q52_time_range_window",
    s"""SELECT event_id, user_id,
       |  CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
       |FROM events
       |WINDOW w AS (PARTITION BY user_id
       |  ORDER BY epoch_us(ts) // 1000000
       |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(expr("unix_micros(ts) div 1000000"))
      .rangeBetween(-3600L, Window.currentRow)
    Tables.events(s, dir).select(
      col("event_id"), col("user_id"),
      count(lit(1)).over(w).as("n_1h"),
      Cols.decimalSumOver(col("value"), w).as("sum_1h"))
  }

  // ---------------------------------------------------------------- q53
  /** FULL OUTER equi-join — the reconciliation join (both unmatched
    * sides null-padded) completing the join-type surface next to
    * left (q03), semi (q06), anti (q05) and interval left-outer (s12):
    * customers without orders AND order keys without a customer row
    * both survive.
    */
  val q53_full_outer_join = q("q53_full_outer_join",
    """SELECT coalesce(c.c_custkey, o.ck) AS custkey,
      |  c.c_name AS name, o.n_orders
      |FROM customer c
      |FULL JOIN (SELECT o_custkey AS ck, count(*) AS n_orders
      |           FROM orders GROUP BY 1) o
      |  ON c.c_custkey = o.ck""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
    val o = Tables.orders(s, dir).groupBy(col("o_custkey").as("ck"))
      .agg(count(lit(1)).as("n_orders"))
    c.join(o, col("c_custkey") === col("ck"), "full_outer")
      .select(coalesce(col("c_custkey"), col("ck")).as("custkey"),
        col("c_name").as("name"), col("n_orders"))
  }

  // ---------------------------------------------------------------- q54
  /** NULL-SAFE equality join (`<=>` / IS NOT DISTINCT FROM): two grouped
    * relations whose keys contain a genuine NULL group — ordinary
    * equality would silently drop it, the null-safe predicate pairs the
    * two NULL groups exactly once.
    */
  val q54_nullsafe_join = q("q54_nullsafe_join",
    """SELECT a.k AS k, a.n_a, b.n_b
      |FROM (SELECT nullif(event_type, 'click') AS k, count(*) AS n_a
      |      FROM events GROUP BY 1) a
      |JOIN (SELECT nullif(event_type, 'purchase') AS k, count(*) AS n_b
      |      FROM events GROUP BY 1) b
      |  ON a.k IS NOT DISTINCT FROM b.k""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val a = ev.groupBy(nullif(col("event_type"), lit("click")).as("k"))
      .agg(count(lit(1)).as("n_a"))
    val b = ev.groupBy(nullif(col("event_type"), lit("purchase")).as("kb"))
      .agg(count(lit(1)).as("n_b"))
    a.join(b, col("k") <=> col("kb")).select(col("k"), col("n_a"), col("n_b"))
  }

  // ---------------------------------------------------------------- q55
  /** Cohort retention — the companion analysis to s13's funnel: users
    * cohort by first-activity DAY, and the retention matrix counts
    * distinct users active at each day offset from their cohort. Two
    * user-keyed aggregates (first-activity min + distinct activity days)
    * and one (cohort, offset) count — all combiner-friendly, no window.
    */
  val q55_cohort_retention = q("q55_cohort_retention",
    """WITH first_day AS (
      |  SELECT user_id, CAST(min(ts) AS DATE) AS cohort
      |  FROM events GROUP BY user_id),
      |active AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
      |SELECT f.cohort, CAST(a.day - f.cohort AS INT) AS day_offset,
      |  count(DISTINCT a.user_id) AS n_users
      |FROM active a JOIN first_day f USING (user_id)
      |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
    val firstDay = ev.groupBy("user_id")
      .agg(min(col("ts")).cast("date").as("cohort"))
    val active = ev.select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
    active.join(firstDay, "user_id")
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  // ---------------------------------------------------------------- q56
  /** FORWARD as-of join ([[AsOfJoin.forward]]): every event picks up the
    * timestamp of the next purchase at-or-after it in the same user's
    * timeline (inclusive — a same-instant purchase is visible). The oracle
    * replays the same semantics as a self-window; its ORDER BY breaks
    * equal-ts ties purchases-LAST so every co-instant event sees the
    * purchase, mirroring the operator's side ordering deterministically.
    * Plan: one user-keyed shuffle + sort — sort-merge-join price,
    * independent of how dense each user's history is.
    */
  val q56_asof_next_purchase = q("q56_asof_next_purchase",
    """SELECT event_id, date_trunc('second', next_purchase_ts) AS next_purchase_ts FROM (
      |  SELECT event_id,
      |    FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS) OVER (
      |      PARTITION BY user_id
      |      ORDER BY ts, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase_ts
      |  FROM events) t""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val left = ev.select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("rts"), col("ts").as("next_purchase_ts"))
    AsOfJoin.forward(left, purchases, keys = Seq("user_id"),
      leftTs = "ts", rightTs = "rts", payloadCols = Seq("next_purchase_ts"))
      .select(col("event_id"),
        date_trunc("second", col("next_purchase_ts")).as("next_purchase_ts"))
  }

  // ---------------------------------------------------------------- q57
  /** NEAREST as-of join ([[AsOfJoin.nearest]]): every event attaches the
    * purchase temporally closest to it in either direction (ties to the
    * earlier row). One user-keyed shuffle + ONE sort carries both
    * directional fills (a single Window exec with two frames); the choice
    * is a row-local interval comparison. The oracle replays it with the
    * same purchases-FIRST tie order the operator uses, so a co-instant
    * purchase is distance zero on the backward side in both engines.
    */
  val q57_asof_nearest_purchase = q("q57_asof_nearest_purchase",
    """WITH w AS (
      |  SELECT event_id, ts,
      |    LAST_VALUE(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS) OVER (
      |      PARTITION BY user_id
      |      ORDER BY ts, CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b,
      |    FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS) OVER (
      |      PARTITION BY user_id
      |      ORDER BY ts, CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f
      |  FROM events)
      |SELECT event_id, date_trunc('second',
      |  CASE WHEN f IS NULL THEN b WHEN b IS NULL THEN f
      |       WHEN ts - b <= f - ts THEN b ELSE f END) AS nearest_purchase_ts
      |FROM w""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val left = ev.select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("rts"), col("ts").as("nearest_purchase_ts"))
    AsOfJoin.nearest(left, purchases, keys = Seq("user_id"),
      leftTs = "ts", rightTs = "rts", payloadCols = Seq("nearest_purchase_ts"))
      .select(col("event_id"),
        date_trunc("second", col("nearest_purchase_ts")).as("nearest_purchase_ts"))
  }

  // ---------------------------------------------------------------- q58
  /** CALENDAR GAP-FILL: per-user daily activity spine (min..max active day,
    * every day present, zero-filled) — the time-series densification every
    * feature pipeline needs before rolling windows. The spine is a
    * per-group `sequence` + explode (distributed, bounded by span×users —
    * no driver loop, no cross join against a global calendar), then one
    * left join back to the daily counts.
    */
  val q58_gap_fill_daily = q("q58_gap_fill_daily",
    """WITH b AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
      |  FROM events GROUP BY 1),
      |spine AS (
      |  SELECT user_id, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM b),
      |d AS (SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
      |      FROM events GROUP BY 1, 2)
      |SELECT s.user_id, s.day, COALESCE(d.n, 0) AS n
      |FROM spine s LEFT JOIN d USING (user_id, day)""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts").cast("date").as("day"))
    val bounds = ev.groupBy("user_id").agg(min("day").as("lo"), max("day").as("hi"))
    val spine = bounds.select(col("user_id"),
      explode(sequence(col("lo"), col("hi"))).as("day"))
    val daily = ev.groupBy("user_id", "day").agg(count(lit(1)).as("n"))
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), coalesce(col("n"), lit(0L)).as("n"))
  }

  // ---------------------------------------------------------------- q59
  /** PAGERANK ([[GraphOps.pageRank]]) over the supplier co-supply graph
    * (suppliers sharing an order, symmetric by construction — no dangling
    * mass): three exact power steps, damping 0.5 (binary64-exact), with
    * per-target contribution sums routed through DECIMAL(28,15) so the
    * oracle replays the identical arithmetic. Per step: one edge⨝rank join
    * + one target-keyed aggregate, both node-partitioned — the plan a
    * 100 TB web-graph iteration needs (nothing driver-side, no collect).
    */
  val q59_pagerank = q("q59_pagerank",
    """WITH e AS (
      |  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey),
      |deg AS (SELECT u, COUNT(*) AS d FROM e GROUP BY 1),
      |nn AS (SELECT COUNT(*) AS n FROM deg),
      |r0 AS (SELECT u AS v, CAST(1.0 AS DOUBLE) / CAST(nn.n AS DOUBLE) AS r
      |       FROM deg CROSS JOIN nn),
      |s1 AS (SELECT e.v, CAST(SUM(CAST(r0.r / CAST(deg.d AS DOUBLE) AS DECIMAL(28,15))) AS DOUBLE) AS s
      |       FROM e JOIN r0 ON e.u = r0.v JOIN deg USING (u) GROUP BY e.v),
      |r1 AS (SELECT v, 0.5 / CAST(nn.n AS DOUBLE) + (0.5 * s) AS r FROM s1 CROSS JOIN nn),
      |s2 AS (SELECT e.v, CAST(SUM(CAST(r1.r / CAST(deg.d AS DOUBLE) AS DECIMAL(28,15))) AS DOUBLE) AS s
      |       FROM e JOIN r1 ON e.u = r1.v JOIN deg USING (u) GROUP BY e.v),
      |r2 AS (SELECT v, 0.5 / CAST(nn.n AS DOUBLE) + (0.5 * s) AS r FROM s2 CROSS JOIN nn),
      |s3 AS (SELECT e.v, CAST(SUM(CAST(r2.r / CAST(deg.d AS DOUBLE) AS DECIMAL(28,15))) AS DOUBLE) AS s
      |       FROM e JOIN r2 ON e.u = r2.v JOIN deg USING (u) GROUP BY e.v),
      |r3 AS (SELECT v, 0.5 / CAST(nn.n AS DOUBLE) + (0.5 * s) AS r FROM s3 CROSS JOIN nn)
      |SELECT v AS s_suppkey, ROUND(r, 6) AS pagerank FROM r3""".stripMargin) { (s, dir) =>
    GraphOps.pageRank(coSupplyEdges(Tables.lineitem(s, dir)),
        iterations = 3, damping = 0.5)
      .select(col("v").as("s_suppkey"), round(col("r"), 6).as("pagerank"))
  }

  /** Distinct co-supply edge relation (suppliers sharing an order, both
    * directions) for q59/q61 — identical to the lineitem self-join on
    * `l_orderkey` + distinct, but built as ONE order-keyed `collect_set`
    * with the pairs expanded IN-ROW (the lshCandidates shape): one
    * exchange of (orderkey, suppkey) partial sets instead of shuffling
    * both 600k-row scan sides into a sort-merge self-join and then
    * re-exchanging the multiplied pair rows for the distinct (round-21:
    * 3 corpus exchanges + SMJ → 2 exchanges, the second over in-row
    * expanded pairs that partial-aggregate map-side). Per-order supplier
    * sets are bounded by order size, so the expansion is row-local and
    * skew-free.
    */
  private def coSupplyEdges(li: DataFrame): DataFrame =
    li.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_suppkey")).as("__ss"))
      .filter(size(col("__ss")) >= 2)
      .select(explode(col("__ss")).as("u"), col("__ss"))
      .select(col("u"), explode(col("__ss")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  // ---------------------------------------------------------------- q60
  /** ROLLING 7-DAY DISTINCT USERS per day (trailing-window MAU) — sliding
    * windows + COUNT(DISTINCT) don't compose as a window function, so the
    * scalable plan is contribution fan-out: each (user, active-day) pair
    * contributes to report days d..d+6 (a bounded 7× explode — row-local),
    * then ONE (day) shuffle for the exact distinct count. No per-day
    * self-joins, no 7-pass scan; report days clamp to the observed range.
    */
  val q60_rolling_distinct_users = q("q60_rolling_distinct_users",
    """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |b AS (SELECT max(day) AS hi FROM a),
      |x AS (SELECT user_id,
      |        CAST(unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE) AS day
      |      FROM a)
      |SELECT x.day, COUNT(DISTINCT x.user_id) AS mau7
      |FROM x CROSS JOIN b WHERE x.day <= b.hi
      |GROUP BY x.day""".stripMargin) { (s, dir) =>
    val active = Tables.events(s, dir)
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
    val hi = active.agg(max("day").as("hi"))
    active
      .select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("day"))
      .crossJoin(broadcast(hi))
      .filter(col("day") <= col("hi"))
      .groupBy("day")
      .agg(countDistinct(col("user_id")).as("mau7"))
  }

  // ---------------------------------------------------------------- q61
  /** SHORTEST-HOP DISTANCES (bounded BFS) from the smallest supplier over
    * the co-supply graph — [[graft.operators.GraphOps.bfsLevels]]:
    * frontier expansion with an anti-join against the visited set, so the
    * working relations stay NODE-sized while the DuckDB oracle's
    * recursive CTE enumerates path-length pairs (fine at oracle scale,
    * exponential at 100 TB — the anti-join is the scalable difference).
    */
  val q61_bfs_levels = q("q61_bfs_levels",
    """WITH RECURSIVE e AS (
      |  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey),
      |src AS (SELECT MIN(u) AS v FROM e),
      |walk(v, level) AS (
      |  SELECT v, 0 FROM src
      |  UNION
      |  SELECT e.v, w.level + 1 FROM walk w JOIN e ON e.u = w.v
      |  WHERE w.level < 3)
      |SELECT v AS s_suppkey, CAST(MIN(level) AS INT) AS level
      |FROM walk GROUP BY v""".stripMargin) { (s, dir) =>
    val edges = coSupplyEdges(Tables.lineitem(s, dir))
    val src = edges.agg(min(col("u")).as("v"))
    GraphOps.bfsLevels(edges, src, maxDepth = 3)
      .select(col("v").as("s_suppkey"), col("level").cast("int").as("level"))
  }

  // ---------------------------------------------------------------- q62
  /** WEIGHTED SAMPLE WITHOUT REPLACEMENT (Efraimidis–Spirakis 2006) of 20
    * documents, weight = n_chars — [[graft.operators.Sampling
    * .weightedSample]]: deterministic md5-derived uniforms scored
    * ln(u)/w, global top-k. The draw is a pure function of the data, so
    * DuckDB replays the identical sample (the uniform is integer-exact
    * in binary64: 13 hex digits + 0.5 over 2^52).
    */
  val q62_weighted_sample = q("q62_weighted_sample",
    """WITH s AS (
      |  SELECT doc_id, n_chars,
      |    ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS UBIGINT)
      |        + 0.5) / 4503599627370496.0) / CAST(n_chars AS DOUBLE) AS es
      |  FROM documents WHERE n_chars > 0)
      |SELECT doc_id, n_chars, ROUND(es, 9) AS es_score
      |FROM s ORDER BY es DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
    Sampling.weightedSample(
      Tables.documents(s, dir).select("doc_id", "n_chars"),
      keyCols = Seq("doc_id"), weight = col("n_chars"), k = 20)
      .select(col("doc_id"), col("n_chars"), round(col("es_score"), 9).as("es_score"))
  }

  // ---------------------------------------------------------------- q63
  /** ROLLING Z-SCORE ANOMALY DETECTION: each user-day's activity volume
    * scored against the trailing 6 days' mean/std (monitoring's
    * bread-and-butter outlier flag, the windowed complement to q20's
    * static IQR). Variance via the sum/sum-of-squares identity with BOTH
    * sums DECIMAL-folded — stddev_samp builtins differ across engines in
    * the last bits (Welford vs naive), this replays bit-for-bit. One
    * (user, day) aggregate + one user-keyed window; z is null until a
    * full 6-day history exists.
    */
  val q63_rolling_anomaly = q("q63_rolling_anomaly",
    """WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT user_id, day, v,
      |    COUNT(*) OVER w AS n,
      |    CAST(SUM(CAST(v AS DECIMAL(18,4))) OVER w AS DOUBLE) AS s,
      |    CAST(SUM(CAST(v * v AS DECIMAL(28,8))) OVER w AS DOUBLE) AS sq
      |  FROM d
      |  WINDOW w AS (PARTITION BY user_id ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING))
      |SELECT user_id, day,
      |  CASE WHEN n = 6 AND (sq - s * s / 6.0) / 5.0 > 0
      |       THEN ROUND((v - s / 6.0) / sqrt((sq - s * s / 6.0) / 5.0), 6)
      |       ELSE NULL END AS z
      |FROM r""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.types.DecimalType
    val daily = Tables.events(s, dir)
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(Cols.decimalSum(col("value")).as("v"))
    val w = Window.partitionBy("user_id").orderBy("day").rowsBetween(-6, -1)
    val variance = (col("sq") - col("s") * col("s") / lit(6.0)) / lit(5.0)
    daily.select(col("user_id"), col("day"), col("v"),
        count(lit(1)).over(w).as("n"),
        Cols.decimalSumOver(col("v"), w).as("s"),
        sum((col("v") * col("v")).cast(DecimalType(28, 8))).over(w)
          .cast("double").as("sq"))
      .select(col("user_id"), col("day"),
        when(col("n") === 6 && variance > 0,
          round((col("v") - col("s") / lit(6.0)) / sqrt(variance), 6)).as("z"))
  }

  // ---------------------------------------------------------------- q64
  /** COUNT-MIN SKETCH frequency estimates (Cormode & Muthukrishnan 2005)
    * next to the exact counts — the frequency member of the mergeable-
    * sketch family (KMV q40/q41 does distincts, this does counts): one
    * pass, fixed memory, cell-wise-additive merge (order-independent →
    * deterministic bytes, golden-gateable). The sketch is sized small
    * (ε = 0.1) so the one-sided error is VISIBLE: est ≥ exact always,
    * and the probe set shows real overestimates. Probing is driver-side
    * over a bounded 20-key list (the codebook argument).
    */
  val q64_cms_frequency = GraftQuery("q64_cms_frequency", (s, dir) => {
    import org.apache.spark.util.sketch.CountMinSketch
    import s.implicits._
    val ev = Tables.events(s, dir)
    val bytes = ev.agg(expr("count_min_sketch(user_id, 0.1d, 0.9d, 42)"))
      .head.getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    val probes = ev.select("user_id").distinct()
      .orderBy("user_id").limit(20)
      .collect().map(_.getLong(0))
    val est = probes.toSeq.map(u => (u, cms.estimateCount(java.lang.Long.valueOf(u))))
      .toDF("user_id", "n_est")
    ev.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
      .join(broadcast(est), "user_id")
      .select("user_id", "n_exact", "n_est")
  }, GoldenOracles.sqlFor("q64_cms_frequency"))

  // ---------------------------------------------------------------- q65
  /** EQUI-KEYLESS interval join via RANGE BUCKETING
    * ([[graft.operators.IntervalJoin]]): events matched into derived
    * 3-day promo windows with no shared key — Spark's native plan for
    * this predicate is a BroadcastNestedLoopJoin (quadratic); bucketing
    * the time domain turns it into a plain hash join on the bucket id
    * with a row-local interval fan-out and an exact refine, which is the
    * 100 TB shape. The oracle runs the naive BETWEEN join — identical
    * results by bucketing completeness.
    */
  val q65_bucketed_interval_join = q("q65_bucketed_interval_join",
    """WITH e AS (SELECT event_id, epoch_us(ts) // 1000000 AS sec, value FROM events),
      |b AS (SELECT MIN(sec) AS base FROM e),
      |w AS (SELECT i AS win_id, base + i * 604800 AS lo,
      |        base + i * 604800 + 259200 AS hi
      |      FROM (SELECT unnest(generate_series(0, 19)) AS i) CROSS JOIN b)
      |SELECT w.win_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM e JOIN w ON e.sec >= w.lo AND e.sec < w.hi
      |GROUP BY w.win_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(col("event_id"), expr("unix_micros(ts) div 1000000").as("sec"),
        col("value"))
    val base = ev.agg(min("sec").as("base"))
    val windows = s.range(20).toDF("win_id")
      .crossJoin(broadcast(base))
      .select(col("win_id"),
        (col("base") + col("win_id") * lit(604800L)).as("lo"),
        (col("base") + col("win_id") * lit(604800L) + lit(259200L)).as("hi"))
    IntervalJoin.pointInInterval(ev, col("sec"), windows,
        col("lo"), col("hi"), bucket = 86400L)
      .groupBy("win_id")
      .agg(count(lit(1)).as("n_events"),
        Cols.decimalSum(col("value")).as("sum_value"))
  }

  // ---------------------------------------------------------------- q67
  /** INTERVAL × INTERVAL overlap join via RANGE BUCKETING
    * ([[graft.operators.IntervalJoin.intervalOverlap]]): per-user daily
    * activity spans matched against derived 3-day promo windows on the
    * half-open overlap predicate — the sessions × outages shape that
    * Spark natively plans as a BroadcastNestedLoopJoin. Both sides
    * register in the buckets they cover; the exact predicate refines
    * inside a plain hash join; each matching pair fires exactly once (in
    * the overlap-start bucket) with NO distinct shuffle. The oracle runs
    * the naive overlap join — identical results by bucketing completeness.
    */
  val q67_interval_overlap = q("q67_interval_overlap",
    """WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS sec,
      |             CAST(ts AS DATE) AS day FROM events),
      |ses AS (SELECT user_id, day, MIN(sec) AS s_lo, MAX(sec) + 1 AS s_hi
      |        FROM e GROUP BY 1, 2),
      |b AS (SELECT MIN(sec) AS base FROM e),
      |w AS (SELECT i AS win_id, base + i * 604800 AS lo,
      |        base + i * 604800 + 259200 AS hi
      |      FROM (SELECT unnest(generate_series(0, 19)) AS i) CROSS JOIN b)
      |SELECT w.win_id, COUNT(*) AS n_sessions,
      |  COUNT(DISTINCT ses.user_id) AS n_users
      |FROM ses JOIN w ON ses.s_lo < w.hi AND w.lo < ses.s_hi
      |GROUP BY w.win_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(col("user_id"), expr("unix_micros(ts) div 1000000").as("sec"),
        col("ts").cast("date").as("day"))
    val sessions = ev.groupBy("user_id", "day")
      .agg(min("sec").as("s_lo"), (max("sec") + 1).as("s_hi"))
    val base = ev.agg(min("sec").as("base"))
    val windows = s.range(20).toDF("win_id")
      .crossJoin(broadcast(base))
      .select(col("win_id"),
        (col("base") + col("win_id") * lit(604800L)).as("lo"),
        (col("base") + col("win_id") * lit(604800L) + lit(259200L)).as("hi"))
    // AUTO width (round-13): W = max of the two sides' median spans —
    // derived, not guessed; results identical at any W by completeness
    IntervalJoin.intervalOverlap(sessions, col("s_lo"), col("s_hi"),
        windows, col("lo"), col("hi"))
      .groupBy("win_id")
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))
  }

  // ---------------------------------------------------------------- q68
  /** MERGEABLE QUANTILE SKETCH ([[graft.plans.QuantileSketch]]): per-type
    * p50/p95/p99 of event value cents through the log-histogram sketch at
    * a deliberately COARSE resolution (s = 4, relative error ≤ 6.25 %) so
    * the ESTIMATION regime is what the gate checks — and unlike every
    * floating-log sketch, the bin function is integer bit arithmetic
    * (`length(bin(x))` = floor(log2)+1, shifts, masks), so the DuckDB
    * oracle replays binning, integer-exact rank targeting and bin lower
    * bounds bit-for-bit in SQL. The sketch itself completes the family:
    * KMV (q40) distincts, CMS (q64) frequencies, this percentiles —
    * mergeable, partitioning-invariant bytes, AdditiveStats-foldable
    * (s19 is the continuous-view twin in its exact regime).
    */
  val q68_quantile_sketch = q("q68_quantile_sketch",
    """WITH e AS (SELECT event_type,
      |        CAST(floor(value * 100) AS BIGINT) AS x FROM events),
      |b AS (SELECT event_type,
      |        CASE WHEN x < 16 THEN x
      |             ELSE ((length(bin(x)) - 4) << 4) +
      |                  ((x >> (length(bin(x)) - 5)) & 15) END AS bn
      |      FROM e),
      |c AS (SELECT event_type, bn, CAST(COUNT(*) AS BIGINT) AS cnt
      |      FROM b GROUP BY 1, 2),
      |t AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n FROM c GROUP BY 1),
      |r AS (SELECT c.event_type, c.bn,
      |        CAST(SUM(c.cnt) OVER (PARTITION BY c.event_type ORDER BY c.bn)
      |          AS BIGINT) AS cum, t.n
      |      FROM c JOIN t USING (event_type)),
      |q AS (SELECT event_type, n,
      |        MIN(CASE WHEN cum >= (50 * n + 99) // 100 THEN bn END) AS b50,
      |        MIN(CASE WHEN cum >= (95 * n + 99) // 100 THEN bn END) AS b95,
      |        MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN bn END) AS b99
      |      FROM r GROUP BY 1, 2)
      |SELECT event_type, n AS n_events,
      |  CASE WHEN b50 < 32 THEN b50
      |       ELSE (16 + (b50 & 15)) << ((b50 >> 4) - 1) END AS p50_cents,
      |  CASE WHEN b95 < 32 THEN b95
      |       ELSE (16 + (b95 & 15)) << ((b95 >> 4) - 1) END AS p95_cents,
      |  CASE WHEN b99 < 32 THEN b99
      |       ELSE (16 + (b99 & 15)) << ((b99 >> 4) - 1) END AS p99_cents
      |FROM q""".stripMargin) { (s, dir) =>
    import graft.plans.QuantileSketch
    Tables.events(s, dir)
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("x"))
      .groupBy("event_type")
      .agg(QuantileSketch.sketch(col("x"), s = 4).as("__sk"))
      .select(col("event_type"),
        QuantileSketch.sketchCount(col("__sk")).as("n_events"),
        QuantileSketch.quantileAt(col("__sk"), 50).as("p50_cents"),
        QuantileSketch.quantileAt(col("__sk"), 95).as("p95_cents"),
        QuantileSketch.quantileAt(col("__sk"), 99).as("p99_cents"))
  }

  // ---------------------------------------------------------------- q69
  /** TWO-LEVEL SKETCH ROLLUP: weekly value percentiles computed by
    * MERGING the per-day quantile sketches — never re-scanning events —
    * the mergeable-sketch property (q68/s19) exercised as a USER
    * operation: a dashboard rolls daily sketches into weekly/monthly
    * percentiles at sketch cost, which is the entire reason mergeable
    * summaries exist. At s = 15 cent values sit in the exact regime, so
    * the oracle is the rank-exact weekly percentile straight off the
    * fact table — if merge lost or double-counted anything, the hash
    * gate fails.
    */
  val q69_weekly_percentile_rollup = q("q69_weekly_percentile_rollup",
    """WITH e AS (SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week,
      |        CAST(floor(value * 100) AS BIGINT) AS x FROM events),
      |t AS (SELECT week, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1),
      |r AS (SELECT week, x,
      |        ROW_NUMBER() OVER (PARTITION BY week ORDER BY x) AS rn FROM e)
      |SELECT r.week, t.n AS n_events,
      |  MIN(CASE WHEN rn >= (50 * n + 99) // 100 THEN x END) AS p50,
      |  MIN(CASE WHEN rn >= (99 * n + 99) // 100 THEN x END) AS p99
      |FROM r JOIN t USING (week)
      |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    import graft.plans.QuantileSketch
    val daily = Tables.events(s, dir)
      .select(col("ts").cast("date").as("day"),
        floor(col("value") * 100).cast("long").as("x"))
      .groupBy("day")
      .agg(QuantileSketch.sketch(col("x"), s = 15).as("__sk"))
    daily
      .groupBy(date_trunc("week", col("day")).cast("date").as("week"))
      .agg(QuantileSketch.mergeAgg(col("__sk")).as("__m"))
      .select(col("week"),
        QuantileSketch.sketchCount(col("__m")).as("n_events"),
        QuantileSketch.quantileAt(col("__m"), 50).as("p50"),
        QuantileSketch.quantileAt(col("__m"), 99).as("p99"))
  }

  // ---------------------------------------------------------------- q66
  /** PERCENT-OF-TOTAL contribution (ratio-to-report): each nation's share
    * of its region's revenue. The denominator is a SEPARATE decimal-exact
    * aggregate joined back (broadcast — region-sized), NOT a window sum
    * over doubles, whose accumulation order differs across engines; the
    * share is then one IEEE division. Snowflake-dim joins broadcast.
    */
  val q66_revenue_share = q("q66_revenue_share",
    s"""WITH r AS (
       |  SELECT rg.r_name AS region, n.n_name AS nation,
       |    ${dsum("o_totalprice")} AS rev
       |  FROM orders o
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN nation n ON c.c_nationkey = n.n_nationkey
       |  JOIN region rg ON n.n_regionkey = rg.r_regionkey
       |  GROUP BY 1, 2),
       |t AS (SELECT region, ${dsum("rev")} AS region_rev FROM r GROUP BY 1)
       |SELECT r.region, r.nation, r.rev,
       |  ROUND(r.rev / t.region_rev, 6) AS share
       |FROM r JOIN t USING (region)""".stripMargin) { (s, dir) =>
    val nations = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name").as("nation"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)
        .select(col("r_regionkey"), col("r_name").as("region"))),
        col("n_regionkey") === col("r_regionkey"))
    val r = Tables.orders(s, dir).select("o_custkey", "o_totalprice")
      .join(nations.select("c_custkey", "region", "nation"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("region", "nation")
      .agg(Cols.decimalSum(col("o_totalprice")).as("rev"))
    val t = r.groupBy("region").agg(Cols.decimalSum(col("rev")).as("region_rev"))
    r.join(broadcast(t), "region")
      .select(col("region"), col("nation"), col("rev"),
        round(col("rev") / col("region_rev"), 6).as("share"))
  }

  val all: Seq[GraftQuery] = Seq(
    q50_grouping_sets, q51_unpivot, q52_time_range_window,
    q53_full_outer_join, q54_nullsafe_join, q55_cohort_retention,
    q56_asof_next_purchase, q57_asof_nearest_purchase,
    q58_gap_fill_daily, q59_pagerank, q60_rolling_distinct_users,
    q61_bfs_levels, q62_weighted_sample, q63_rolling_anomaly,
    q64_cms_frequency, q65_bucketed_interval_join, q66_revenue_share,
    q67_interval_overlap, q68_quantile_sketch, q69_weekly_percentile_rollup,
    q48_drift_psi, q47_jaro_top1, q46_stratified_sample,
    q30_numeric_describe, q31_ship_priority, q32_regional_volume, q33_small_quantity,
    q34_approx_stats, q35_from_json, q36_array_agg, q37_order_distribution,
    q38_min_per_group_filter, q39_profile_verdicts, q40_kmv_distinct, q41_kmv_setops,
    q42_hash_split, q43_quality_checks, q44_salted_join, q45_fuzz_ratio_top1,
    q49_wratio_top1,
    q01_pricing_summary, q02_filter_project, q03_left_join_2key, q04_join_chain_agg,
    q05_anti_join, q06_semi_join, q07_fuzzy_top1, q08_pivot_mean,
    q09_dedup_keep_first, q10_surrogate_key, q11_interpolate, q12_qcut_buckets,
    q13_topk_freq, q14_rollup, q15_set_ops, q16_dim_date, q17_static_bins,
    q18_conditional_rewrite, q19_profile, q20_iqr_outliers, q21_window_rank,
    q22_json_extract, q23_range_join, q24_asof_prev_purchase, q25_cube,
    q26_distinct_agg, q27_window_extras, q28_scalar_funcs, q29_date_funcs)
}
