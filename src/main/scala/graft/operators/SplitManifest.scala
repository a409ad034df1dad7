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
  *   - `assignment[_e{G}]/`  the per-key split assignment parquet (key
  *     cols + the split column — whatever the caller released), under
  *     the generation the meta's `rel_gen` key names ([[StoredIndex
  *     .relPath]]: bare on the first release);
  *   - `manifest[_e{G}]/`    one row per split: (split, fraction, n_rows,
  *     seed, strata_cols, key_cols, group_col, split_col) — `n_rows`
  *     counted from the WRITTEN assignment files, not the in-flight
  *     frame, so the manifest describes the artifact of record;
  *   - `meta_g{N}`    the spec + `rel_gen` as key=value pairs (the CAS
  *     pointer); readers resolve relations THROUGH it, so a crash (or a
  *     lost CAS) between relation writes and the publish strands an
  *     orphan directory but can never make the live meta describe a
  *     different assignment.
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

  private def encodeFractions(fr: Seq[(String, Double)]): String =
    fr.map { case (n, f) => s"$n:$f" }.mkString(",")

  private def decodeFractions(s: String): Seq[(String, Double)] =
    if (s.isEmpty) Nil
    else s.split(",", -1).toSeq.map { p =>
      val i = p.lastIndexOf(':')
      (p.substring(0, i), p.substring(i + 1).toDouble)
    }

  private def splitList(s: String): Seq[String] =
    if (s.isEmpty) Nil else s.split(",", -1).toSeq

  private def currentGen(spark: SparkSession, dir: String): Int =
    try StoredIndex.readKvWithGen(spark, dir)._2
    catch { case _: IllegalArgumentException => -1 }

  /** Land `assignment` + its manifest under `dir` and CAS-publish the
    * spec. Re-releasing to the same store advances the generation (the
    * protocol's swap); releasing concurrently loses the CAS loudly.
    *
    * Crash safety matches the other StoredIndex clients: the relations
    * are written under GENERATION-SUFFIXED directories (bare on the
    * first release, `_e{N}` after — [[StoredIndex.relPath]]'s layout)
    * and the live meta's `rel_gen` key points at the pair it describes,
    * so a crash between the relation writes and the meta publish — or a
    * concurrent release that wrote its relations before losing the CAS —
    * leaves the PREVIOUS release fully intact and self-consistent
    * (orphaned never-published directories, not a live meta describing
    * someone else's assignment). The just-superseded generation is kept
    * for one cycle for in-flight readers; older ones are swept
    * best-effort after the swap.
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
    val gen = currentGen(spark, dir) // read BEFORE the relation writes
    val relGen = gen + 1             // the generation the CAS will publish
    val assignPath = StoredIndex.relPath(dir, "assignment", relGen)
    val manPath = StoredIndex.relPath(dir, "manifest", relGen)
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
      "seed" -> spec.seed.toString,
      "fractions" -> encodeFractions(spec.fractions),
      "strata_cols" -> spec.strataCols.mkString(","),
      "key_cols" -> spec.keyCols.mkString(","),
      "group_col" -> spec.groupCol.getOrElse(""),
      "split_col" -> spec.splitCol), gen)
    StoredIndex.sweepEpochsBelow(spark, dir,
      Seq("assignment", "manifest"), relGen - 1)
  }

  private def kvOf(spark: SparkSession, dir: String): Map[String, String] = {
    val (kv, _) = StoredIndex.readKvWithGen(spark, dir)
    require(kv.get("kind").contains("split_manifest"),
      s"$dir is not a split-manifest store (kind=${kv.get("kind")})")
    kv
  }

  private def specOf(kv: Map[String, String]): Spec =
    Spec(kv("seed").toLong, decodeFractions(kv("fractions")),
      splitList(kv("strata_cols")), splitList(kv("key_cols")),
      Option(kv.getOrElse("group_col", "")).filter(_.nonEmpty),
      kv.getOrElse("split_col", "split"))

  /** The released spec (validates the store's meta pointer). */
  def readSpec(spark: SparkSession, dir: String): Spec =
    specOf(kvOf(spark, dir))

  /** Resolve the live release's relation path THROUGH the meta's
    * `rel_gen` pointer — the relation a reader sees is always the one
    * the meta it read describes, never a half-landed newer write.
    */
  private def livePath(spark: SparkSession, dir: String,
                       name: String): String = {
    val kv = kvOf(spark, dir)
    StoredIndex.relPath(dir, name, kv.getOrElse("rel_gen", "0").toInt)
  }

  /** The per-split manifest relation of the live release. */
  def readManifest(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(livePath(spark, dir, "manifest"))

  /** The released assignment relation itself. */
  def readAssignment(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(livePath(spark, dir, "assignment"))
}
