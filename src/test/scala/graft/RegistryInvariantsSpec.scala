package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the driver contract — failure modes that would
  * otherwise surface only as silent drops or driver-side mismatches:
  * duplicate names shadow silently in the `queries` Map, and a registered
  * query without any oracle would downgrade to a rows-only check.
  */
class RegistryInvariantsSpec extends AnyFunSuite {

  test("query names are unique (the Map would silently shadow duplicates)") {
    val names = SparkEntry.registry.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(SparkEntry.queries.size == names.size)
  }

  test("every registered query carries an oracle (SQL or committed golden)") {
    val missing = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty,
      s"rows-only queries (no oracle): $missing — add SQL or a golden parquet")
  }

  test("every golden oracle name is registered and its file is committed") {
    val registered = SparkEntry.registry.map(_.name).toSet
    queries.GoldenOracles.names.foreach { n =>
      assert(registered(n), s"golden oracle '$n' has no registered query")
      assert(new java.io.File(queries.GoldenOracles.pathFor(n)).isFile,
        s"golden parquet missing for '$n' — run tools/gen_goldens.sh")
    }
  }

  test("query names follow the prefix convention the driver artifacts group by") {
    val ok = "^(q|t|d|e|s|src)\\d+_[a-z0-9_]+$".r
    val bad = SparkEntry.registry.map(_.name).filterNot(n => ok.matches(n))
    assert(bad.isEmpty, s"unconventional query names: $bad")
  }
}
