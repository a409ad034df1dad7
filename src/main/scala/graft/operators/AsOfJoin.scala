package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for every left row, attach the payload of the temporally
  * closest right row within the same key group — `backward` (greatest right
  * ts ≤ left ts), `forward` (least right ts ≥ left ts), `nearest` (either
  * side, minimum |Δts|, ties to the earlier row).
  *
  * Spark has no native as-of join, and the naive formulation — a range theta
  * join + per-left-row extremum — explodes to a broadcast-nested-loop or an
  * O(n·m) per-key blow-up. All three variants here use the tag+union+window
  * plan instead:
  *
  *   1. tag both inputs and union them on a shared (key, ts, payload) shape;
  *   2. one window per key ordered by (ts, side) computes
  *      `last(payload, ignoreNulls)` over the preceding frame (backward)
  *      and/or `first(payload, ignoreNulls)` over the following frame
  *      (forward) — each left row picks up its match in a single running
  *      pass; `nearest` computes both fills over the SAME sort (Spark folds
  *      them into one Window exec) and chooses per row by distance;
  *   3. filter back to left rows.
  *
  * Cost: ONE shuffle of n+m rows on the key columns and a per-group sort —
  * the same price as a regular sort-merge join, independent of time-range
  * density. Skewed keys behave like any skewed window (salt or split by time
  * range if a single key's history exceeds one task).
  *
  * Tie rule at equal timestamps: inclusive modes make a same-instant right
  * row visible (matching DuckDB/pandas `merge_asof` semantics); `strict`
  * hides it. `nearest` treats a same-instant right row as distance zero,
  * and an exact backward/forward distance tie resolves to the BACKWARD
  * (earlier) row — documented, deterministic.
  *
  * Determinism caveat: when several right rows in one key group share one
  * timestamp, which of their payloads wins is unspecified (the window sort
  * is (ts, side) only). Payloads that are functions of (key, ts) — e.g. the
  * match timestamp itself — stay deterministic regardless.
  */
object AsOfJoin {

  /** Shared tag+union shape: left rows carry null payloads, right rows carry
    * null left-only columns; `__side` encodes the equal-ts tie order.
    */
  private def unioned(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String, payloadCols: Seq[String],
                      sideL: Int, sideR: Int): (DataFrame, Seq[String]) = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    val leftCols = left.columns.toSeq
    val lShaped = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(sideL))
      .withColumn("__isleft", lit(true))
    val lFull = payloadCols.foldLeft(lShaped)((df, c) =>
      df.withColumn(c, lit(null)))
    val rShaped = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(sideR))
      .withColumn("__isleft", lit(false))
    val rFull = leftCols.filterNot(keys.contains).foldLeft(rShaped)((df, c) =>
      if (rShaped.columns.contains(c)) df else df.withColumn(c, lit(null)))
    val shape = (keys ++ Seq("__ts", "__side", "__isleft") ++
      leftCols.filterNot(c => keys.contains(c)) ++ payloadCols).distinct
    (lFull.select(shape.map(col): _*).unionByName(rFull.select(shape.map(col): _*)),
      leftCols)
  }

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payloadCols: Seq[String],
               strict: Boolean = false): DataFrame = {
    // inclusive: right sorts FIRST at equal ts (visible in the preceding
    // frame); strict: right sorts after the left row (invisible)
    val (u, _) = unioned(left, right, keys, leftTs, rightTs, payloadCols,
      sideL = if (strict) 0 else 1, sideR = if (strict) 1 else 0)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payloadCols.foldLeft(u)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    filled.filter(col("__isleft")).drop("__ts", "__side", "__isleft")
  }

  /** Forward as-of: least right ts ≥ left ts (> when `strict`). */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, payloadCols: Seq[String],
              strict: Boolean = false): DataFrame = {
    // inclusive: right sorts AFTER the left row at equal ts (visible in the
    // following frame); strict: right sorts before it (invisible)
    val (u, _) = unioned(left, right, keys, leftTs, rightTs, payloadCols,
      sideL = if (strict) 1 else 0, sideR = if (strict) 0 else 1)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = payloadCols.foldLeft(u)((df, c) =>
      df.withColumn(c, first(col(c), ignoreNulls = true).over(w)))
    filled.filter(col("__isleft")).drop("__ts", "__side", "__isleft")
  }

  /** Nearest as-of: the right row minimizing |right ts − left ts|; an exact
    * distance tie resolves to the backward (earlier) row. Both directional
    * fills share one (key) shuffle + one (ts, side) sort — a single Window
    * exec with two frames.
    */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, payloadCols: Seq[String]): DataFrame = {
    val internal = payloadCols ++ Seq("__rts")
    val (u0, _) = unioned(left, right.withColumn("__rts", col(rightTs)),
      keys, leftTs, rightTs, internal, sideL = 1, sideR = 0)
    // right-first ordering: a same-instant right row lands in the backward
    // frame at distance zero (and the backward side wins ties anyway)
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
    val wB = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = internal.foldLeft(u0)((df, c) =>
      df.withColumn(s"${c}__b", last(col(c), ignoreNulls = true).over(wB))
        .withColumn(s"${c}__f", first(col(c), ignoreNulls = true).over(wF)))
    val useB = col("__rts__f").isNull ||
      (col("__rts__b").isNotNull &&
        (col("__ts") - col("__rts__b")) <= (col("__rts__f") - col("__ts")))
    val chosen = payloadCols.foldLeft(filled)((df, c) =>
      df.withColumn(c, when(useB, col(s"${c}__b")).otherwise(col(s"${c}__f"))))
    chosen.filter(col("__isleft"))
      .drop(Seq("__ts", "__side", "__isleft") ++
        internal.flatMap(c => Seq(s"${c}__b", s"${c}__f")) :+ "__rts": _*)
  }
}
