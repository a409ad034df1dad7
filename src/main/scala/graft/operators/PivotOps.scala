package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Long→wide pivot (reference: dw-etl `himalayan_etl/ops/transform.py:265-267`
  * — `pivot_table(index=[CC,CN,YEAR], columns=INDICATORCODE, values=VALUE)`,
  * whose pandas default aggregates duplicates with MEAN).
  *
  * Always pass the known pivot values: with them Spark pivots in ONE
  * aggregation pass; without them it first runs a distinct scan over the
  * pivot column (an extra job over the whole table — wasteful at 100 TB).
  */
object PivotOps {

  def meanPivot(df: DataFrame, indexCols: Seq[String], pivotCol: String,
                values: Seq[String], valueCol: String): DataFrame =
    df.groupBy(indexCols.map(col): _*)
      .pivot(pivotCol, values)
      .agg(avg(col(valueCol)))

  def pivotAgg(df: DataFrame, indexCols: Seq[String], pivotCol: String,
               values: Seq[String], aggExpr: Column): DataFrame =
    df.groupBy(indexCols.map(col): _*)
      .pivot(pivotCol, values)
      .agg(aggExpr)
}
