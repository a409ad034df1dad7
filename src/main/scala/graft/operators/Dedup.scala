package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed deduplication (reference: pandas `drop_duplicates(subset=...)`,
  * dw-etl `himalayan_etl/ops/transform.py:182-184,374`).
  *
  * pandas keeps the FIRST row in frame order; Spark's `dropDuplicates` keeps
  * an arbitrary row per key. When the caller cares which survivor wins (the
  * correctness oracle does), [[keepFirst]] pins the choice with a per-key
  * `row_number` ordered by an explicit tie-break — one shuffle on the key,
  * no global sort, scales linearly with data volume.
  */
object Dedup {

  /** Keep exactly one row per key, the first under `order`. */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Arbitrary-survivor dedup — cheapest form (hash aggregate, map-side
    * partial dedup before the shuffle). Use when any survivor is acceptable.
    */
  def any(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Full-row distinct. */
  def distinctRows(df: DataFrame): DataFrame = df.distinct()
}
