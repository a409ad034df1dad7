package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Static-edge value binning with pandas `pd.cut` semantics (reference:
  * dw-etl `himalayan_etl/ops/transform.py:109-127` age groups and
  * `:229-245` peak-height categories).
  *
  * Semantics: half-open intervals (right-open here, matching the reference's
  * `right=False`), one label per interval, out-of-range and null → null.
  * Implementation is a pure `when` chain — whole-stage-codegen'd, no UDF, no
  * shuffle; at scale this is a free map-side pass.
  */
object Bin {

  /** `edges` has n+1 entries for n labels; interval i is [edges(i), edges(i+1)). */
  def cut(c: Column, edges: Seq[Double], labels: Seq[String]): Column = {
    require(edges.size == labels.size + 1, "need one more edge than labels")
    val v = c.cast("double")
    labels.zipWithIndex.foldLeft(lit(null).cast("string")) { case (acc, (label, i)) =>
      when(v >= edges(i) && v < edges(i + 1), lit(label)).otherwise(acc)
    }
  }

  /** Right-closed variant (pandas default `right=True`): (lo, hi], with the
    * lowest edge included.
    */
  def cutRightClosed(c: Column, edges: Seq[Double], labels: Seq[String]): Column = {
    require(edges.size == labels.size + 1, "need one more edge than labels")
    val v = c.cast("double")
    labels.zipWithIndex.foldLeft(lit(null).cast("string")) { case (acc, (label, i)) =>
      val lo = if (i == 0) v >= edges(i) else v > edges(i)
      when(lo && v <= edges(i + 1), lit(label)).otherwise(acc)
    }
  }

  /** Dictionary map with pandas `.map` semantics: unmapped keys → null
    * (reference season→name map, `ops/transform.py:383-390`).
    */
  def dictMap(c: Column, mapping: Map[Int, String]): Column =
    mapping.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(c === lit(k), lit(v)).otherwise(acc)
    }
}
