package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (deequ-style, engine-
  * native): each rule is a boolean Column; one wide aggregation counts
  * violations for ALL rules in a single pass over the data (no per-rule
  * jobs), then unpivots to a (rule, n_rows, n_violations, pass) report.
  * The training-pipeline guardrail: run before a corpus lands, fail the
  * load on `pass = false` rows.
  */
object Checks {

  final case class Rule(name: String, holds: Column)

  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val aggs: Seq[Column] =
      count(lit(1)).as("__n") +: rules.map { r =>
        // null predicate = violation: a rule must EVALUATE true to hold
        count(when(!coalesce(r.holds, lit(false)), lit(1))).as(s"__v_${r.name}")
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val structs = array(rules.map { r =>
      struct(
        lit(r.name).as("rule"),
        col("__n").cast("long").as("n_rows"),
        col(s"__v_${r.name}").cast("long").as("n_violations"),
        (col(s"__v_${r.name}") === 0).as("pass"))
    }: _*)
    wide.select(explode(structs).as("c")).select("c.*")
  }

  /** Deterministic corpus split (train/val/test) by content hash — the
    * reproducibility primitive for training-data pipelines: the split is a
    * pure function of the key, stable across runs, partitionings and
    * engines (md5 is standard everywhere, unlike seeded `rand()`, whose
    * draw depends on partition layout). Buckets are the first 4 hex chars
    * of the key's md5 (65536 buckets); thresholds compare as FIXED-WIDTH
    * lowercase hex strings, where lexicographic order IS numeric order —
    * so any engine with md5 + substring replays the identical assignment.
    */
  def hashSplit(df: DataFrame, keyCol: Column, splits: Seq[(String, Double)],
                splitCol: String = "split"): DataFrame = {
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val bucketHex = substring(md5(keyCol.cast("string").cast("binary")), 1, 4)
    val cuts = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val expr = splits.zip(cuts).init.foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), cut)) =>
        when(acc.isNotNull, acc)
          .otherwise(when(bucketHex < cutHex(cut), lit(name)))
    }
    df.withColumn(splitCol, coalesce(expr, lit(splits.last._1)))
  }

  /** Cumulative fraction → 4-hex-digit threshold (e.g. 0.8 → "cccd"). */
  def cutHex(cut: Double): String = f"${math.round(cut * 65536)}%04x"

  /** RELATIVE quality gate: keep each group's rows whose score sits above
    * the group's `q`-quantile — "drop the bottom quartile PER LANGUAGE",
    * the curation form that absolute thresholds get wrong (a fixed cutoff
    * tuned on a high-resource language guts a low-resource one whose score
    * distribution sits lower). Rank-based via `cume_dist` (the fraction of
    * the group scoring ≤ this row), so the cut is integer-exact and
    * engine-replayable — no quantile interpolation, no float drift; ties
    * share a cume_dist and survive or fall together. A single-row group
    * has cume_dist 1.0 and is always kept (a relative gate inside a group
    * of one is meaningless — it must not erase the whole group).
    * One window shuffle on the group key, same skew caveat as every keyed
    * window here.
    */
  def keepAboveQuantile(df: DataFrame, groupCols: Seq[String],
                        scoreCol: String, q: Double): DataFrame = {
    require(q >= 0.0 && q < 1.0, s"quantile must be in [0, 1), got $q")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(scoreCol))
    df.withColumn("__cd", cume_dist().over(w))
      .filter(col("__cd") > q)
      .drop("__cd")
  }
}
