package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed to the driver's correctness harness:
  * a named DataFrame program over the TESTDATA tables plus (when the
  * semantics are SQL-expressible) an equivalent ANSI SQL text the driver
  * runs in DuckDB over the same parquet files. Column names/types and value
  * arithmetic must match bit-for-bit — aggregates route through DECIMAL and
  * back to DOUBLE so floating-point summation order can't diverge between
  * engines.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  /** Shared SQL idiom: exact decimal sum of a double expression, surfaced as
    * DOUBLE (matches `Col.decimalSum` on the Spark side).
    */
  def dsum(sqlExpr: String): String =
    s"CAST(SUM(CAST($sqlExpr AS DECIMAL(18,4))) AS DOUBLE)"
}
