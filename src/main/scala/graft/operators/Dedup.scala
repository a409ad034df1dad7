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

  /** CLUSTER-policy dedup: keep the best member of each near-dup CLUSTER
    * under an explicit preference order — the keep policy production
    * corpora actually want ("keep the longest / highest-quality version"),
    * where min-id-per-cluster (d07's form) is just the determinism
    * baseline. `comps` is a connected-components labeling `(id, comp)`
    * (e.g. [[graft.ext.NearDup.connectedComponents]] over near-dup pairs);
    * rows absent from it are singletons and always survive (their own id
    * is their cluster). One broadcast-or-shuffle join + one keyed window —
    * same linear scale shape as [[keepFirst]].
    */
  def keepBest(df: DataFrame, idCol: String, comps: DataFrame,
               order: Seq[Column]): DataFrame = {
    val labeled = df.join(
        comps.select(col("id").as(idCol), col("comp").as("__comp")),
        Seq(idCol), "left")
      .withColumn("__comp", coalesce(col("__comp"), col(idCol)))
    keepFirst(labeled, Seq("__comp"), order).drop("__comp")
  }
}
