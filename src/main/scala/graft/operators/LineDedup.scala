package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level LINE deduplication — the C4-style boilerplate cut (drop
  * every line that repeats across enough documents: nav bars, cookie
  * banners, "all rights reserved" footers) that sits between exact
  * document dedup (d01) and near-dup document removal (d02–d07) in a
  * pretraining curation pipeline. t11's boilerplate-n-gram MINING measures
  * what this operator REMOVES.
  *
  * Scale shape: lines explode row-locally; the cross-document frequency
  * count shuffles 8-byte line hashes first (never full text), then
  * recounts exactly — by (hash, normalized text) — over only the
  * candidate heavy hitters, so line text shuffles only for the tiny
  * Zipf-headed boilerplate set and a 64-bit hash collision can never
  * remove an innocent line (see the phase comments); the heavy-hitter
  * relation rides a left-anti join (Catalyst broadcasts it when small —
  * at 100 TB the count side is a combiner-friendly partial aggregate,
  * the same contract as d01's fingerprint groupBy); reassembly is one
  * groupBy on the document id with an in-row sort of (pos, line)
  * structs — position arithmetic, no window.
  */
object LineDedup {

  /** Remove every line whose NORMALIZED form (default: lowercased,
    * whitespace-trimmed) appears in at least `minDocs` distinct documents,
    * preserving the surviving lines' original text and order. Documents
    * whose every line is boilerplate come back with an empty string (the
    * caller's length/quality gate drops them — this operator never drops
    * rows, so joins against it stay total). Blank lines are kept verbatim:
    * they carry document structure, and counting them as "boilerplate"
    * would destroy every paragraph break in the corpus.
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 minDocs: Int = 3,
                 normalize: Column => Column = c => lower(trim(c))): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = df.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__norm", normalize(col("__line")))
      .withColumn("__h", xxhash64(col("__norm")))
      .withColumn("__blank", trim(col("__line")) === "")
    // two-phase heavy-hitter count, COLLISION-SAFE at corpus scale: phase 1
    // counts by 8-byte hash only (the cheap shuffle) to find CANDIDATE
    // heavy hashes; phase 2 recounts exactly — by (hash, normalized text) —
    // over only the candidate lines, so a 64-bit birthday collision between
    // an innocent unique line and a boilerplate line (expected at billions
    // of distinct lines) can neither inflate a count past the threshold
    // nor drag the innocent line into the removal set. Line TEXT shuffles
    // only for candidate heavy hitters — a tiny, Zipf-headed relation.
    val heavyHashes = lines.filter(!col("__blank"))
      .groupBy("__h")
      .agg(countDistinct(col(idCol)).as("__d"))
      .filter(col("__d") >= minDocs)
      .select("__h")
    val boiler = lines.filter(!col("__blank"))
      .join(heavyHashes, Seq("__h"), "left_semi")
      .groupBy("__h", "__norm")
      .agg(countDistinct(col(idCol)).as("__d"))
      .filter(col("__d") >= minDocs)
      .select("__h", "__norm")
    val kept = lines.join(boiler, Seq("__h", "__norm"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(concat_ws("\n",
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line"))).as(textCol))
    df.drop(textCol)
      .join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col(textCol), lit("")))
  }
}
