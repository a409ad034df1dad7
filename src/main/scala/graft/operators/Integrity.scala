package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity validation (reference: dw-etl wires FK constraints
  * after the fact load, `ops/load.py:149-159`, so a fact row pointing at a
  * missing dimension key FAILS the run — the database was the test harness).
  *
  * In the engine the same check is a distributed anti-join: fact keys with
  * no dimension partner. One broadcast join per FK when dims are
  * dimension-sized; null FKs are allowed (left-outer semantics in the
  * upstream joins) and excluded, like SQL FK constraints.
  */
object Integrity {

  /** Rows of `fact` whose non-null `factKey` has no match in `dim.dimKey`. */
  def fkViolations(fact: DataFrame, factKey: String,
                   dim: DataFrame, dimKey: String): DataFrame =
    fact.filter(col(factKey).isNotNull)
      .join(broadcast(dim.select(col(dimKey).as("__k")).distinct()),
        col(factKey) === col("__k"), "left_anti")

  /** Throw if any FK is violated; returns the fact unchanged otherwise
    * (mirrors the reference's fail-the-run-on-constraint behavior).
    */
  def requireFk(fact: DataFrame, factKey: String,
                dim: DataFrame, dimKey: String): DataFrame = {
    val n = fkViolations(fact, factKey, dim, dimKey).count()
    require(n == 0, s"$n fact rows violate FK $factKey -> $dimKey")
    fact
  }
}
