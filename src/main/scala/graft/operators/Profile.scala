package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling aggregates (reference: dw-etl `raw_analysis/main.py:41-122`
  * — per-column nulls, uniques, duplicates, describe, top-10 values, string
  * lengths, IQR outliers).
  *
  * Everything is a single wide aggregation (one pass over the data, one
  * reduce) followed by a driver-side unpivot of ONE row — fully distributed,
  * no per-column jobs. `distinct` uses exact `count_distinct` in
  * [[profile]] (oracle-matchable) and HyperLogLog `approx_count_distinct`
  * in [[profileApprox]] (the 100 TB path: no per-column shuffle of the
  * distinct sets).
  */
object Profile {

  /** One row per column: column, n_rows, n_null, n_distinct, min_len,
    * avg_len, max_len (lengths over the string form, like the reference's
    * `astype(str).map(len)`).
    */
  def profile(df: DataFrame): DataFrame = profileImpl(df, exact = true)

  def profileApprox(df: DataFrame): DataFrame = profileImpl(df, exact = false)

  private def profileImpl(df: DataFrame, exact: Boolean): DataFrame = {
    val cols = df.columns.toSeq
    val aggs: Seq[Column] = cols.flatMap { c =>
      val s = col(c).cast("string")
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(when(col(c).isNull, lit(1))).as(s"${c}__null"),
        (if (exact) count_distinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"${c}__dist"),
        min(length(s)).as(s"${c}__minlen"),
        avg(length(s)).as(s"${c}__avglen"),
        max(length(s)).as(s"${c}__maxlen"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot: one struct per source column, then explode — single row, cheap
    val structs = array(cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"${c}__n").cast("long").as("n_rows"),
        col(s"${c}__null").cast("long").as("n_null"),
        col(s"${c}__dist").cast("long").as("n_distinct"),
        col(s"${c}__minlen").cast("int").as("min_len"),
        col(s"${c}__avglen").cast("double").as("avg_len"),
        col(s"${c}__maxlen").cast("int").as("max_len"))
    }: _*)
    wide.select(explode(structs).as("p")).select("p.*")
  }

  /** Numeric `describe()` (reference `raw_analysis/main.py:60-83`): one row
    * per column with count/mean/min/max/variance, all in ONE aggregation
    * pass. Mean and variance derive from exact DECIMAL sums (Σx, Σx²) cast
    * to double only for the final arithmetic, so any engine replaying the
    * same formula lands on the identical IEEE result regardless of row
    * order.
    */
  def numericSummary(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val aggs: Seq[Column] = cols.flatMap { c =>
      val v = col(c).cast("double")
      Seq(
        count(v).as(s"${c}__n"),
        sum(v.cast(DecimalType(38, 6))).cast(DoubleType).as(s"${c}__s"),
        // square in DOUBLE per row (order-independent), then exact-sum the
        // decimal image — decimal×decimal would overflow one engine or the
        // other's precision rules
        sum((v * v).cast(DecimalType(38, 6))).cast(DoubleType).as(s"${c}__s2"),
        min(v).as(s"${c}__min"),
        max(v).as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val structs = array(cols.map { c =>
      val n = col(s"${c}__n").cast("double")
      val s = col(s"${c}__s")
      val s2 = col(s"${c}__s2")
      struct(
        lit(c).as("col_name"),
        col(s"${c}__n").cast("long").as("n"),
        round(s / n, 6).as("mean"),
        col(s"${c}__min").as("min"),
        col(s"${c}__max").as("max"),
        // stddev, not variance: sqrt compresses the decimal→double
        // conversion ulp far below the 6-dp rounding grain, so both engines
        // round to the same value at any magnitude
        round(when(n > 1,
          sqrt(greatest((s2 - s * s / n) / (n - lit(1.0)), lit(0.0)))), 6).as("stddev"))
    }: _*)
    wide.select(explode(structs).as("p")).select("p.*")
  }

  /** Per-column quality VERDICTS (reference `raw_analysis/main.py:100-113`:
    * the "[UWAGA]/[OK]" assessment lines) — the judgment layer on top of
    * [[profile]]'s raw stats. One row per column:
    *
    *   - `missing_verdict`: 'no_missing' when the column has no nulls,
    *     'high_missing' when the null ratio exceeds `missingThreshold`
    *     (reference: 20 %), else 'acceptable_missing';
    *   - `n_empty` / `empty_verdict`: empty-string count for string columns
    *     ('has_empty' / 'ok'; null for non-string columns);
    *   - `n_true` / `n_false`: value distribution for boolean columns
    *     (null elsewhere).
    *
    * Same scale shape as [[profile]]: ONE wide aggregation pass, one-row
    * unpivot — no per-column jobs.
    */
  def verdicts(df: DataFrame, missingThreshold: Double = 0.2): DataFrame = {
    import org.apache.spark.sql.types.{BooleanType, StringType}
    val fields = df.schema.fields.toSeq
    val nullLong = max(lit(null).cast("long")) // typed aggregate null
    val aggs: Seq[Column] = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        count(lit(1)).as(s"${f.name}__n"),
        count(when(c.isNull, lit(1))).as(s"${f.name}__null"),
        (f.dataType match {
          case StringType => count(when(c === "", lit(1)))
          case _          => nullLong
        }).as(s"${f.name}__empty"),
        (f.dataType match {
          case BooleanType => count(when(c === true, lit(1)))
          case _           => nullLong
        }).as(s"${f.name}__true"),
        (f.dataType match {
          case BooleanType => count(when(c === false, lit(1)))
          case _           => nullLong
        }).as(s"${f.name}__false"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val structs = array(fields.map { f =>
      val n = col(s"${f.name}__n").cast("long")
      val nNull = col(s"${f.name}__null").cast("long")
      val nEmpty = col(s"${f.name}__empty").cast("long")
      val ratio = nNull.cast("double") / n.cast("double")
      struct(
        lit(f.name).as("col_name"),
        n.as("n_rows"),
        nNull.as("n_null"),
        round(ratio, 6).as("missing_ratio"),
        when(nNull === 0, "no_missing")
          .when(ratio > missingThreshold, "high_missing")
          .otherwise("acceptable_missing").as("missing_verdict"),
        nEmpty.as("n_empty"),
        (f.dataType match {
          case StringType =>
            when(nEmpty > 0, "has_empty").otherwise("ok")
          case _ => lit(null).cast("string")
        }).as("empty_verdict"),
        col(s"${f.name}__true").cast("long").as("n_true"),
        col(s"${f.name}__false").cast("long").as("n_false"))
    }: _*)
    wide.select(explode(structs).as("p")).select("p.*")
  }

  /** Top-k most frequent values of a column (reference
    * `value_counts().head(10)`), deterministic tie-break on the value.
    */
  def topK(df: DataFrame, c: String, k: Int): DataFrame =
    df.groupBy(col(c).cast("string").as("value")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("value").asc)
      .limit(k)

  /** IQR outlier count for a numeric column (reference
    * `raw_analysis/main.py:84-93`): values outside [q1−1.5·IQR, q3+1.5·IQR].
    */
  def iqrOutliers(df: DataFrame, c: String): DataFrame = {
    val v = col(c).cast("double")
    df.agg(
        percentile(v, lit(0.25)).as("__q1"),
        percentile(v, lit(0.75)).as("__q3"))
      .crossJoin(df.select(v.as("__v")))
      .select(col("__v"), col("__q1"), col("__q3"),
        (col("__q1") - (col("__q3") - col("__q1")) * 1.5).as("__lo"),
        (col("__q3") + (col("__q3") - col("__q1")) * 1.5).as("__hi"))
      .agg(
        count(when(col("__v") < col("__lo") || col("__v") > col("__hi"), lit(1)))
          .cast("long").as("n_outliers"),
        first(col("__lo")).as("lo"),
        first(col("__hi")).as("hi"))
  }
}
