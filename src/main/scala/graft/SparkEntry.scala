package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented SURVEY §2 operator to a DataFrame program
  * over the TESTDATA parquet tables; `oracleSql` carries the DuckDB-runnable
  * equivalent for the hash-match correctness gate. Column names are aliased
  * identically on both sides.
  */
object SparkEntry {

  /** All registered engine queries (core relational + extensions). */
  def registry: Seq[GraftQuery] =
    CoreQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      EmbeddingQueries.all ++ StreamQueries.all ++ SourceQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q01_pricing_summary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
