package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of rows, the shuffle
  * sends that key's entire volume to ONE task. AQE's skew-join handling
  * covers sort-merge joins at runtime; salting is the plan-level fix that
  * also works where AQE can't re-split (e.g. under windowed downstream
  * stages, or on engines/paths with AQE off): the skewed side gets a random
  * salt in [0, n), the other side is replicated once per salt value, and the
  * join key becomes (key, salt) — spreading the hot key over n tasks at the
  * cost of replicating the (small) other side n times.
  *
  * Correct for inner / left_outer / left_semi / left_anti joins (each (L,R)
  * key match meets on exactly one salt; unmatched L rows survive with every
  * salt, and semi/anti semantics dedup by existence). NOT for right/full
  * outer — the replicated side would duplicate its unmatched rows.
  */
object SkewJoin {

  def salted(left: DataFrame, right: DataFrame, keys: Seq[String],
             numSalts: Int, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer", "left_semi", "left_anti")
      .contains(joinType.toLowerCase), s"salting is incorrect for $joinType joins")
    // salt value is irrelevant to results — any per-row distribution works;
    // hash of a unique id keeps it deterministic-ish and uniform
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(numSalts)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until numSalts).map(lit): _*)))
    saltedLeft.join(saltedRight, keys :+ "__salt", joinType).drop("__salt")
  }
}
