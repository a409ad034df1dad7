package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the payload of the right
  * row with the greatest right-timestamp ≤ (or < when `strict`) the left
  * timestamp, within the same key group.
  *
  * Spark has no native as-of join, and the naive formulation — a range theta
  * join + per-left-row max — explodes to a broadcast-nested-loop or an
  * O(n·m) per-key blow-up. This implementation uses the tag+union+window
  * plan instead:
  *
  *   1. tag both inputs and union them on a shared (key, ts, payload) shape;
  *   2. one window per key ordered by (ts, side) computes
  *      `last(payload, ignoreNulls)` over the preceding frame — each left row
  *      picks up the most recent right payload in a single running pass;
  *   3. filter back to left rows.
  *
  * Cost: ONE shuffle of n+m rows on the key columns and a per-group sort —
  * the same price as a regular sort-merge join, independent of time-range
  * density. Skewed keys behave like any skewed window (salt or split by time
  * range if a single key's history exceeds one task).
  *
  * Tie rule: at equal timestamps, inclusive mode orders the right row FIRST
  * (a same-instant right row is visible), strict mode orders it AFTER the
  * left row (invisible) — matching DuckDB/pandas `merge_asof` inclusive
  * semantics and the "strictly prior" variant respectively.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payloadCols: Seq[String],
               strict: Boolean = false): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    val leftCols = left.columns.toSeq
    // shared shape: keys ++ __ts ++ __side ++ left-only cols ++ payload cols
    val sideL = if (strict) lit(0) else lit(1)
    val sideR = if (strict) lit(1) else lit(0)
    val lShaped = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", sideL)
      .withColumn("__isleft", lit(true))
    val lFull = payloadCols.foldLeft(lShaped)((df, c) =>
      df.withColumn(c, lit(null)))
    val rShaped = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", sideR)
      .withColumn("__isleft", lit(false))
    val rFull = leftCols.filterNot(keys.contains).foldLeft(rShaped)((df, c) =>
      if (rShaped.columns.contains(c)) df else df.withColumn(c, lit(null)))
    val unioned = lFull.select((keys ++ Seq("__ts", "__side", "__isleft") ++
        leftCols.filterNot(c => keys.contains(c)) ++ payloadCols).distinct.map(col): _*)
      .unionByName(
        rFull.select((keys ++ Seq("__ts", "__side", "__isleft") ++
          leftCols.filterNot(c => keys.contains(c)) ++ payloadCols).distinct.map(col): _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payloadCols.foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    filled.filter(col("__isleft")).drop("__ts", "__side", "__isleft")
  }
}
