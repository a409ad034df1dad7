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
  * count shuffles 8-byte line hashes (never line text); the heavy-hitter
  * relation (lines in ≥ `minDocs` distinct docs) is tiny by Zipf and
  * rides a left-anti join (Catalyst broadcasts it when small — at 100 TB
  * the count side is a combiner-friendly partial aggregate, the same
  * contract as d01's fingerprint groupBy); reassembly is one groupBy on
  * the document id with an in-row sort of (pos, line) structs — position
  * arithmetic, no window.
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
      .withColumn("__h", xxhash64(normalize(col("__line"))))
      .withColumn("__blank", trim(col("__line")) === "")
    val boiler = lines.filter(!col("__blank"))
      .groupBy("__h")
      .agg(countDistinct(col(idCol)).as("__d"))
      .filter(col("__d") >= minDocs)
      .select("__h")
    val kept = lines.join(boiler, Seq("__h"), "left_anti")
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
