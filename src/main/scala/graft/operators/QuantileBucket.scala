package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group equal-frequency bucketing with pandas `qcut(q=3,
  * duplicates="drop")` semantics (reference: dw-etl
  * `himalayan_etl/ops/transform.py:322-353`, per-Year bucketing of the five
  * World Bank indicators).
  *
  * Exact semantics reproduced:
  *   - bin edges are the linear-interpolated quantiles {0, 1/3, 2/3, 1} of the
  *     group's non-null values (pandas/numpy `linear` method == Spark's exact
  *     `percentile`);
  *   - duplicate edges collapse (`duplicates="drop"`), so a group can yield 3,
  *     2 or 1 buckets;
  *   - labels depend on the RESULTING bucket count: [Low, Medium, High] /
  *     [Low, High] / [Low];
  *   - intervals are right-closed, lowest edge included; nulls map to null.
  *
  * NOT `ntile(3)`: ntile splits ties across buckets, qcut puts equal values in
  * one bucket.
  *
  * Scale: one grouped aggregate computes all edges (exact `percentile`
  * requires a sort per group — acceptable because groups are bounded, e.g.
  * years; for unbounded value sets swap in `approx_percentile`), then a join
  * back on the group key (broadcast when the group count is small, which AQE
  * decides from runtime stats) and a pure `when`-chain labeling pass.
  */
object QuantileBucket {

  def qcut3(df: DataFrame, groupCols: Seq[String], valueCol: String,
            labelCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val edges = df.groupBy(groupCols.map(col): _*).agg(
      min(v).as("__mn"),
      percentile(v, lit(1.0 / 3.0)).as("__q1"),
      percentile(v, lit(2.0 / 3.0)).as("__q2"),
      max(v).as("__mx"))
      // duplicates="drop": np.unique over the 4 edges
      .withColumn("__edges",
        array_sort(array_distinct(array(col("__mn"), col("__q1"), col("__q2"), col("__mx")))))
      .select(groupCols.map(col) :+ col("__edges"): _*)

    val joined = df.join(edges, groupCols, "left")
    val nb = size(col("__edges")) - 1 // bucket count after edge dedup
    val e1 = element_at(col("__edges"), 2)
    val e2 = element_at(col("__edges"), 3)
    joined.withColumn(labelCol,
        when(v.isNull, lit(null).cast("string"))
          .when(nb <= 1, lit("Low"))
          .when(nb === 2, when(v <= e1, "Low").otherwise("High"))
          .otherwise(when(v <= e1, "Low").when(v <= e2, "Medium").otherwise("High")))
      .drop("__edges")
  }
}
