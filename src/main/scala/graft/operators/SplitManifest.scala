package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.StoredIndex

/** Provenance manifest for a RELEASED train/val/test split — the lineage
  * record a reproducibility audit needs when a corpus ships: WHICH
  * (seed, fractions, strata/key/group columns) produced the assignment
  * that downstream training consumed, persisted NEXT TO the assignment
  * itself so the two can never drift apart. [[Sampling.deterministicSplit]]
  * / [[Sampling.groupSplit]] make the split a pure function of
  * (data, spec); this store makes the spec part of the released artifact,
  * so the leakage audits (d20/d22) consume what actually shipped instead
  * of re-stating constants that could silently diverge from the release.
  *
  * LAYOUT — the [[graft.sources.StoredIndex]] protocol, third client
  * (after the near-dup and ANN indexes): relation directories are written
  * BEFORE the generation-numbered meta pointer that references them
  * (crash-benign windows), and the meta publish is a compare-and-swap
  * (two concurrent releases to one store: exactly one wins; the loser
  * must reload). Under `dir`:
  *   - `assignment_e{G}_w{tag}/`  the per-key split assignment parquet
  *     (key cols + the split column — whatever the caller released),
  *     under the generation AND per-release attempt tag the meta's
  *     `rel_gen`/`rel_tag` keys name;
  *   - `manifest_e{G}_w{tag}/`    one row per split: (split, fraction,
  *     n_rows, seed, strata_cols, key_cols, group_col, split_col) —
  *     `n_rows` counted from the WRITTEN assignment files, not the
  *     in-flight frame, so the manifest describes the artifact of record;
  *   - `meta_g{N}`    the spec + `rel_gen`/`rel_tag` as key=value pairs
  *     (the CAS pointer); readers resolve relations THROUGH it, so a
  *     crash (or a lost CAS) between relation writes and the publish
  *     strands an orphan directory but can never make the live meta
  *     describe a different assignment — the attempt tag covers the
  *     concurrent-racer case too (same-generation racers write disjoint
  *     directories). Pre-tag stores (no `rel_tag` in the meta) keep
  *     resolving through the old `assignment[_e{G}]` layout.
  *
  * Scale shape: the manifest is #splits rows (driver-bounded collect);
  * the assignment write is the only corpus-sized action and is a plain
  * parquet write the caller already intended to perform.
  */
object SplitManifest {

  /** The released split's full provenance. `groupCol` is set for
    * [[Sampling.groupSplit]] releases (the leakage-proof grouped form),
    * None for row-level splits.
    */
  final case class Spec(seed: Long, fractions: Seq[(String, Double)],
                        strataCols: Seq[String], keyCols: Seq[String],
                        groupCol: Option[String] = None,
                        splitCol: String = "split")

  // protocol helpers (tagged paths, kv codecs, generation sweep,
  // pointer resolution) live on StoredIndex — ONE implementation shared
  // with [[Release]], so a hardening to either client reaches both
  private val relNames = Seq("assignment", "manifest")

  /** Land `assignment` + its manifest under `dir` and CAS-publish the
    * spec. Re-releasing to the same store advances the generation (the
    * protocol's swap); releasing concurrently loses the CAS loudly.
    *
    * Crash safety matches the other StoredIndex clients: the relations
    * are written under GENERATION- AND ATTEMPT-SUFFIXED directories
    * (`name_e{N}_w{tag}`, tag = a per-release nonce) and the live meta's
    * `rel_gen`/`rel_tag` keys point at the exact pair it describes, so a
    * crash between the relation writes and the meta publish — or a
    * concurrent release racing this one — leaves the PREVIOUS release
    * fully intact and self-consistent. The attempt tag is what makes the
    * concurrent case safe: two racers that both read generation N write
    * to DIFFERENT `_e{N+1}_w{tag}` directories, so the CAS loser's
    * overwrite-mode write can never clobber the relations the winner's
    * meta just published (without the tag, same-generation racers
    * targeted the same path and the loser could overwrite it after the
    * winner's CAS — a live meta describing someone else's assignment).
    * The just-superseded generation is kept for one cycle for in-flight
    * readers; older ones — and any orphaned loser/crash directories of
    * those older generations — are swept best-effort after the swap.
    */
  def release(assignment: DataFrame, dir: String, spec: Spec): Unit = {
    require(spec.fractions.nonEmpty, "spec must carry the split fractions")
    require(spec.keyCols.nonEmpty, "spec must carry the key columns")
    // fail BEFORE the corpus-sized write: the frame must actually carry
    // the split column (any type castable to string)
    require(assignment.columns.contains(spec.splitCol),
      s"assignment has no '${spec.splitCol}' column " +
        s"(columns: ${assignment.columns.mkString(", ")})")
    val spark = assignment.sparkSession
    val gen = StoredIndex.currentGeneration(spark, dir) // read BEFORE the relation writes
    val relGen = gen + 1             // the generation the CAS will publish
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val assignPath = StoredIndex.taggedRelPath(dir, "assignment", relGen, tag)
    val manPath = StoredIndex.taggedRelPath(dir, "manifest", relGen, tag)
    assignment.write.mode("overwrite").parquet(assignPath)
    // counts from the WRITTEN files — the manifest describes the artifact
    val counts = spark.read.parquet(assignPath)
      .groupBy(col(spec.splitCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = spec.fractions.map { case (name, f) =>
      (name, f, counts.getOrElse(name, 0L), spec.seed,
        spec.strataCols.mkString(","), spec.keyCols.mkString(","),
        spec.groupCol.orNull, spec.splitCol)
    }
    import spark.implicits._
    rows.toDF("split", "fraction", "n_rows", "seed", "strata_cols",
        "key_cols", "group_col", "split_col")
      .coalesce(1).write.mode("overwrite").parquet(manPath)
    StoredIndex.writeMetaCas(spark, dir, Seq(
      "kind" -> "split_manifest",
      "rel_gen" -> relGen.toString,
      "rel_tag" -> tag,
      "seed" -> spec.seed.toString,
      "fractions" -> StoredIndex.encodeFractions(spec.fractions),
      "strata_cols" -> spec.strataCols.mkString(","),
      "key_cols" -> spec.keyCols.mkString(","),
      "group_col" -> spec.groupCol.getOrElse(""),
      "split_col" -> spec.splitCol), gen)
    StoredIndex.sweepTaggedBelow(spark, dir, relNames, relGen - 1,
      legacyUntagged = true) // pre-tag stores still age out
  }

  /** The released spec (validates the store's meta pointer). */
  def readSpec(spark: SparkSession, dir: String): Spec = {
    val kv = StoredIndex.kvOfKind(spark, dir, "split_manifest")
    Spec(kv("seed").toLong, StoredIndex.decodeFractions(kv("fractions")),
      StoredIndex.splitList(kv("strata_cols")),
      StoredIndex.splitList(kv("key_cols")),
      Option(kv.getOrElse("group_col", "")).filter(_.nonEmpty),
      kv.getOrElse("split_col", "split"))
  }

  /** Resolve through the meta's pointers; stores released before the
    * attempt tag existed carry no `rel_tag` and resolve through the old
    * untagged layout.
    */
  private def livePath(spark: SparkSession, dir: String,
                       name: String): String =
    StoredIndex.liveTaggedPath(spark, dir, name, "split_manifest",
      legacyUntagged = true)

  /** The per-split manifest relation of the live release. */
  def readManifest(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(livePath(spark, dir, "manifest"))

  /** The released assignment relation itself. */
  def readAssignment(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(livePath(spark, dir, "assignment"))
}
