package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate-key assignment (reference: dw-etl `himalayan_etl/ops/
  * transform.py:129,301,376` — `Id = 1..n` in frame order).
  *
  * Contiguous 1..n ids require a total order, which in Spark means a
  * single-partition window — acceptable ONLY at dimension scale (the
  * reference uses it for dims and the member fact; all bounded). For fact
  * tables at 100 TB use [[scalable]] instead: zipWithIndex-style two-pass
  * (per-partition counts, then offset), which keeps data distributed and
  * still yields contiguous ids, at the cost of an extra pass.
  * `monotonically_increasing_id` is NOT acceptable where downstream FKs
  * reference the values (non-contiguous, partition-dependent).
  */
object SurrogateKey {

  /** Contiguous 1..n in the order given — single-partition window; use for
    * dimension-sized data only.
    */
  def dense(df: DataFrame, order: Seq[Column], idCol: String = "Id"): DataFrame =
    df.withColumn(idCol, row_number().over(Window.orderBy(order: _*)))

  /** Contiguous 1..n for big tables: sort once, then assign ids with a
    * distributed two-pass (per-partition row counts → cumulative offsets
    * broadcast back). No single-partition stage; the sort is the only
    * shuffle.
    */
  def scalable(df: DataFrame, order: Seq[Column], idCol: String = "Id"): DataFrame = {
    val sorted = df.orderBy(order: _*)
    val schema = sorted.schema
    val rdd = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    val spark = df.sparkSession
    spark.createDataFrame(rdd,
      schema.add(idCol, org.apache.spark.sql.types.LongType, nullable = false))
  }
}
