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

  test("golden files match the committed MANIFEST (regeneration discipline)") {
    // The goldens are REGRESSION oracles pinned at sf0.01: when operator
    // code changes their output, tools/gen_goldens.sh must be re-run (and
    // the diff eyeballed) — this gate turns "golden silently drifted from
    // its manifest" into a test failure instead of a shipped green. Both
    // directions are checked: a changed/missing file AND a manifest entry
    // for a file that no longer exists.
    val dir = new java.io.File(queries.GoldenOracles.dir)
    val manifestFile = new java.io.File(dir, "MANIFEST")
    assert(manifestFile.isFile,
      s"missing ${manifestFile.getPath} — run tools/gen_goldens.sh")
    def sha256(f: java.io.File): String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.digest(java.nio.file.Files.readAllBytes(f.toPath))
        .map("%02x".format(_)).mkString
    }
    val manifest = scala.io.Source.fromFile(manifestFile).getLines()
      .filter(_.nonEmpty)
      .map { l => val Array(h, n) = l.trim.split("\\s+", 2); n.trim -> h }
      .toMap
    val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> sha256(f)).toMap
    val drifted = files.collect {
      case (n, h) if manifest.get(n).exists(_ != h) => n }
    val unlisted = files.keySet -- manifest.keySet
    val ghosts = manifest.keySet -- files.keySet
    assert(drifted.isEmpty && unlisted.isEmpty && ghosts.isEmpty,
      s"golden drift without a manifest bump — drifted=$drifted " +
        s"unlisted=$unlisted ghosts=$ghosts; re-run tools/gen_goldens.sh " +
        "and commit files + MANIFEST together after reviewing the diff")
  }

  test("query names follow the prefix convention the driver artifacts group by") {
    val ok = "^(q|t|d|e|s|src)\\d+_[a-z0-9_]+$".r
    val bad = SparkEntry.registry.map(_.name).filterNot(n => ok.matches(n))
    assert(bad.isEmpty, s"unconventional query names: $bad")
  }
}
