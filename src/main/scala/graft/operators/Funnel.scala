package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-stage FUNNEL resolution — the sequential-conversion analysis every
  * event pipeline runs (view → click → purchase): for each entity,
  * resolve the EARLIEST chain of stage events with strictly increasing
  * event time. `t_1 = min ts of stage 1`; `t_k = min ts of stage k
  * events AFTER t_{k-1}` — the standard funnel semantics (an early
  * purchase before any view does not count, and the chain is the
  * earliest valid one, so results are order-independent and
  * deterministic under any partitioning).
  *
  * Scale shape: one conditional-min aggregate per stage, every
  * aggregate and join keyed by the SAME entity column. Each stage's
  * exchange is COMBINER-COLLAPSED (partial_min runs map-side, so the
  * shuffle carries one row per entity per map partition, never raw
  * events), the per-stage funnel-state join broadcasts while the
  * resolved-entity relation is small and degrades to a co-partitioned
  * shuffle join at user-count scale (both sides already hashed on the
  * entity key — no extra exchange class). k stages = k collapsed
  * exchanges; never a sort, never a window holding the full event
  * list. PlanAuditSpec pins the shape.
  */
object Funnel {

  /** Resolve the earliest strictly-increasing chain through `stages` of
    * the `typeCol` values. Output: one row per entity that reached stage
    * 1 — (idCol, t_1 … t_k, reached) with `t_i` null once the chain
    * breaks and `reached` = number of stages completed.
    */
  def resolve(events: DataFrame, idCol: String, tsCol: String,
              typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    val ev = events.select(col(idCol), col(tsCol), col(typeCol))
    // stage 1: plain conditional min
    var acc = ev.groupBy(idCol)
      .agg(min(when(col(typeCol) === stages.head, col(tsCol))).as("t_1"))
      .filter(col("t_1").isNotNull)
    // stage i: min ts of stage-i events strictly after t_{i-1} — the
    // join and the aggregate both key on idCol, so the exchange from
    // stage 1 is reused, not repeated
    stages.zipWithIndex.drop(1).foreach { case (stage, i) =>
      val prev = s"t_$i"
      val cur = s"t_${i + 1}"
      val carried = (1 to i).map(j => first(col(s"t_$j")).as(s"t_$j"))
      acc = ev.join(acc, idCol)
        .groupBy(idCol)
        .agg(carried.head, carried.tail :+
          min(when(col(typeCol) === stage && col(tsCol) > col(prev),
            col(tsCol))).as(cur): _*)
    }
    val reached = stages.indices.map(i => when(col(s"t_${i + 1}").isNotNull, 1)
      .otherwise(0)).reduce(_ + _)
    // `reached` counts the PREFIX of non-null stage times; chain nulls
    // propagate by construction (t_{i+1} needs t_i non-null)
    acc.withColumn("reached", reached.cast("int"))
  }
}
