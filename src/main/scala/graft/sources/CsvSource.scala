package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Contract-checked CSV source (reference: dw-etl `himalayan_etl/resources.py
  * :192-201` read + the per-extract required-column contracts at
  * `ops/extract.py:32-114,134-204,224-253` and empty-input guards at
  * `ops/extract.py:28-29,130-131,220-221`).
  *
  * Schema is explicit (`StructType`), not inferred — at 100 TB an
  * `inferSchema` pass is a full extra scan of the input. The column contract
  * is validated against `df.columns` on the driver (pure metadata, no job);
  * the non-empty guard uses `isEmpty` (a LIMIT-1 job, not a full count).
  */
object CsvSource {

  final class ContractViolation(msg: String) extends IllegalArgumentException(msg)

  /** Fail fast if any required column is missing (driver-side, metadata only). */
  def requireColumns(df: DataFrame, required: Seq[String]): DataFrame = {
    val have = df.columns.toSet
    val missing = required.filterNot(have)
    if (missing.nonEmpty)
      throw new ContractViolation(
        s"missing required columns: ${missing.mkString(", ")} (have: ${df.columns.mkString(", ")})")
    df
  }

  /** Fail fast on an empty input (LIMIT-1 probe, not a count). */
  def requireNonEmpty(df: DataFrame, what: String): DataFrame = {
    if (df.isEmpty) throw new ContractViolation(s"$what: input is empty")
    df
  }

  /** Header CSV scan with an explicit schema + column contract. */
  def read(spark: SparkSession, path: String, schema: StructType,
           required: Seq[String] = Nil, requireRows: Boolean = false): DataFrame = {
    val df = spark.read
      .option("header", "true")
      .schema(schema)
      .csv(path)
    val checked = requireColumns(df, required)
    if (requireRows) requireNonEmpty(checked, path) else checked
  }

  /** Inferred-schema variant (one extra scan — small/dev inputs only). */
  def readInferred(spark: SparkSession, path: String,
                   required: Seq[String] = Nil): DataFrame =
    requireColumns(
      spark.read.option("header", "true").option("inferSchema", "true").csv(path),
      required)
}
