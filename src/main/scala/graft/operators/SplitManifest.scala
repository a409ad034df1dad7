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
  *   - `assignment/`  the per-key split assignment parquet (key cols +
  *     the split column — whatever the caller released);
  *   - `manifest/`    one row per split: (split, fraction, n_rows, seed,
  *     strata_cols, key_cols, group_col, split_col) — `n_rows` counted
  *     from the WRITTEN assignment files, not the in-flight frame, so the
  *     manifest describes the artifact of record;
  *   - `meta_g{N}`    the spec as key=value pairs (the CAS pointer).
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
    */
  def release(assignment: DataFrame, dir: String, spec: Spec): Unit = {
    require(spec.fractions.nonEmpty, "spec must carry the split fractions")
    require(spec.keyCols.nonEmpty, "spec must carry the key columns")
    val spark = assignment.sparkSession
    val gen = currentGen(spark, dir) // read BEFORE the relation writes
    assignment.write.mode("overwrite").parquet(s"$dir/assignment")
    // counts from the WRITTEN files — the manifest describes the artifact
    val counts = spark.read.parquet(s"$dir/assignment")
      .groupBy(col(spec.splitCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = spec.fractions.map { case (name, f) =>
      (name, f, counts.getOrElse(name, 0L), spec.seed,
        spec.strataCols.mkString(","), spec.keyCols.mkString(","),
        spec.groupCol.orNull, spec.splitCol)
    }
    import spark.implicits._
    rows.toDF("split", "fraction", "n_rows", "seed", "strata_cols",
        "key_cols", "group_col", "split_col")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/manifest")
    StoredIndex.writeMetaCas(spark, dir, Seq(
      "kind" -> "split_manifest",
      "seed" -> spec.seed.toString,
      "fractions" -> encodeFractions(spec.fractions),
      "strata_cols" -> spec.strataCols.mkString(","),
      "key_cols" -> spec.keyCols.mkString(","),
      "group_col" -> spec.groupCol.getOrElse(""),
      "split_col" -> spec.splitCol), gen)
  }

  /** The released spec (validates the store's meta pointer). */
  def readSpec(spark: SparkSession, dir: String): Spec = {
    val (kv, _) = StoredIndex.readKvWithGen(spark, dir)
    require(kv.get("kind").contains("split_manifest"),
      s"$dir is not a split-manifest store (kind=${kv.get("kind")})")
    Spec(kv("seed").toLong, decodeFractions(kv("fractions")),
      splitList(kv("strata_cols")), splitList(kv("key_cols")),
      Option(kv.getOrElse("group_col", "")).filter(_.nonEmpty),
      kv.getOrElse("split_col", "split"))
  }

  /** The per-split manifest relation of the live release. */
  def readManifest(spark: SparkSession, dir: String): DataFrame = {
    readSpec(spark, dir) // meta must exist and be a manifest store
    spark.read.parquet(s"$dir/manifest")
  }

  /** The released assignment relation itself. */
  def readAssignment(spark: SparkSession, dir: String): DataFrame = {
    readSpec(spark, dir)
    spark.read.parquet(s"$dir/assignment")
  }
}
