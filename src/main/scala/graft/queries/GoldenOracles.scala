package graft.queries

/** Golden-parquet regression oracles for queries whose semantics are
  * approximate-by-design (hash/sketch-based) and therefore have no
  * SQL-expressible DuckDB twin: d04/d05 (SimHash — xxhash64), e04
  * (hyperplane LSH), e06 (IVF ANN), q34 (HLL + quantile sketch).
  *
  * The driver's correctness gate executes each oracle string in DuckDB at
  * sf0.01 and hash-compares against the engine's result. DuckDB reads
  * parquet paths natively, so a committed golden file IS a valid oracle —
  * `SELECT * FROM '<golden>.parquet'` — turning these rows from
  * "rows-only" into full row/schema/hash checks. A silent behavior change
  * in `simhash`, `hyperplaneSignature` or the IVF codebook now fails the
  * gate instead of shipping green.
  *
  * Every golden query is deterministic by construction (integer/bit
  * algebra, per-row IEEE folds, DECIMAL-summed centroids,
  * compression-free sketches at this scale), so the files are stable
  * across partitionings and re-runs. Goldens are generated AT sf0.01 — the
  * scale the driver verifies at — by `tools/gen_goldens.sh`; regenerate
  * (and eyeball the diff) only on an intentional behavior change.
  * GoldenRegressionSpec replays the same comparison inside `sbt test`.
  */
object GoldenOracles {
  val dir = "/root/repo/src/test/resources/golden/sf0.01"

  val names: Seq[String] = Seq(
    "d04_simhash", "d05_simhash_neardup", "e04_lsh_ann", "e06_ivf_ann",
    "q34_approx_stats", "q40_kmv_distinct", "q41_kmv_setops",
    "e08_signature_neardup", "q45_fuzz_ratio_top1", "e09_ivf_recall",
    "q49_wratio_top1", "e10_lsh_recall", "e11_clustered_recall",
    "e12_pq_recall", "e13_ivfadc_recall", "e14_ann_index_append",
    "e15_codebook_drift", "e17_ann_compaction", "e18_filtered_ann",
    "t26_bpe_merges", "t27_bpe_encode", "e19_cell_balanced_sample",
    "q64_cms_frequency", "t32_classifier_train", "t37_langid_train",
    "s20_classifier_quality_mv", "t48_bpe_token_quota",
    "t50_compression_ratio", "t52_byte_bpe")

  def pathFor(name: String): String = s"$dir/$name.parquet"

  /** Oracle SQL for `name`, or None while its golden has not been
    * generated yet (first build bootstraps with rows-only checks).
    */
  def sqlFor(name: String): Option[String] =
    if (new java.io.File(pathFor(name)).exists)
      Some(s"SELECT * FROM '${pathFor(name)}'")
    else None

  /** A column PROJECTION of an existing golden as the oracle — for a
    * query whose contract is "reproduces those columns of `name`
    * bit-for-bit" (src25 re-derives t52's byte segmentation through the
    * released tokenizer artifact), without committing a second copy of
    * the same rows.
    */
  def sqlForColumns(name: String, cols: Seq[String]): Option[String] =
    if (new java.io.File(pathFor(name)).exists)
      Some(s"SELECT ${cols.mkString(", ")} FROM '${pathFor(name)}'")
    else None
}
