package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine-stable aggregate idioms.
  *
  * Double summation is order-dependent, and Spark's shuffle order differs
  * from any external oracle's scan order — so every SUM/AVG over doubles in
  * an oracle-checked query routes through an exact DECIMAL accumulation and
  * converts back to DOUBLE at the end. Decimal aggregation is also what a
  * money-typed warehouse column would use at 100 TB (exact, overflow-checked).
  */
object Cols {

  /** Exact decimal sum of a double expression, surfaced as double. */
  def decimalSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Order-independent mean: exact decimal sum / count, both engines compute
    * the same single IEEE division.
    */
  def decimalAvg(c: Column): Column =
    decimalSum(c) / count(lit(1))

  /** Decimal running/windowed sum surfaced as double. */
  def decimalSumOver(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(DecimalType(18, 4))).over(w).cast(DoubleType)
}
