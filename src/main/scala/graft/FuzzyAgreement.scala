package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement behind FIXTURES.md §4's agreement table: top-1 match-rate of
  * the default Unicode `wratio` vs the legacy `wratio_ascii` twin over a
  * country-name corpus — the reference's J3 workload shape (noisy
  * expedition country strings fuzzily matched to a canonical country dim,
  * `himalayan_etl/ops/transform.py:41-59`). Each country yields five
  * deterministic perturbed queries (char drop, adjacent swap, accent strip,
  * lowercase+junk suffix, vowel dropout); for every (query, scorer) the
  * top-1 candidate over the full dim is taken with the same tie-break the
  * engine's FuzzyJoin uses (score desc, name asc). Reported:
  *   - agreement: how often the two scorers pick the SAME top-1;
  *   - accuracy: how often each picks the query's true origin country.
  *
  *   sbt "runMain graft.FuzzyAgreement"
  */
object FuzzyAgreement {

  /** Public country list, accent-heavy on purpose — the divergence between
    * Unicode and force_ascii preprocessing only shows on non-ASCII names.
    */
  val countries: Seq[String] = Seq(
    "Afghanistan", "Albania", "Argentina", "Australia", "Austria",
    "Bangladesh", "Belgium", "Bolivia", "Brazil", "Bulgaria", "Canada",
    "Chile", "China", "Colombia", "Costa Rica", "Croatia", "Czechia",
    "Côte d'Ivoire", "Curaçao", "Denmark", "Ecuador", "Egypt", "Estonia",
    "Finland", "France", "Germany", "Greece", "Hungary", "Iceland", "India",
    "Indonesia", "Iran", "Ireland", "Israel", "Italy", "Japan", "Kazakhstan",
    "Kenya", "Latvia", "Lebanon", "Lithuania", "Malaysia", "México",
    "Mongolia", "Morocco", "Nepal", "Netherlands", "New Zealand", "Norway",
    "Pakistan", "Panamá", "Perú", "Philippines", "Poland", "Portugal",
    "Romania", "Russia", "Rwanda", "Réunion", "San Marino",
    "São Tomé and Príncipe", "Saudi Arabia", "Serbia", "Singapore",
    "Slovakia", "Slovenia", "South Africa", "South Korea", "Spain",
    "Sri Lanka", "Sweden", "Switzerland", "Thailand", "Türkiye", "Ukraine",
    "United Kingdom", "United States", "Uruguay", "Venezuela", "Vietnam",
    "Zimbabwe", "Åland Islands")

  /** Deterministic perturbations — typo shapes a hand-keyed expedition
    * roster actually contains (no RNG: the table must reproduce).
    */
  def perturb(name: String): Seq[String] = {
    val mid = name.length / 2
    val dropped = name.take(mid) + name.drop(mid + 1)
    val swapped =
      if (name.length >= 2 && mid + 1 < name.length)
        name.take(mid) + name(mid + 1) + name(mid) + name.drop(mid + 2)
      else name
    val deaccented = java.text.Normalizer
      .normalize(name, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}", "")
    val junk = name.toLowerCase + " expedition"
    val thinned = name.zipWithIndex
      .collect { case (c, i) if !("aeiou".contains(c.toLower) && i % 2 == 1) => c }
      .mkString
    Seq(dropped, swapped, deaccented, junk, thinned)
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    import spark.implicits._
    val dim = countries.toDF("country")
    val queries = countries.flatMap(c => perturb(c).map(p => (c, p)))
      .toDF("truth", "query")

    def top1(scorer: String) = {
      val w = Window.partitionBy("truth", "query")
        .orderBy(col("score").desc, col("country").asc)
      queries.crossJoin(dim)
        .withColumn("score", expr(s"$scorer(query, country)"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("truth"), col("query"), col("country").as(scorer))
    }

    val joined = top1("wratio").join(top1("wratio_ascii"), Seq("truth", "query"))
    val stats = joined.agg(
      count(lit(1)).as("n"),
      avg(when(col("wratio") === col("wratio_ascii"), 1.0).otherwise(0.0)).as("agree"),
      avg(when(col("wratio") === col("truth"), 1.0).otherwise(0.0)).as("acc_unicode"),
      avg(when(col("wratio_ascii") === col("truth"), 1.0).otherwise(0.0)).as("acc_ascii"))
      .collect()(0)
    println(f"queries=${stats.getLong(0)} top1_agreement=${stats.getDouble(1) * 100}%.1f%% " +
      f"acc_wratio=${stats.getDouble(2) * 100}%.1f%% acc_wratio_ascii=${stats.getDouble(3) * 100}%.1f%%")
    // where they disagree, show who was right
    val dis = joined.filter(col("wratio") =!= col("wratio_ascii"))
      .select("truth", "query", "wratio", "wratio_ascii").collect()
    dis.foreach(r => println(s"  disagree: query='${r.getString(1)}' truth='${r.getString(0)}' " +
      s"unicode->'${r.getString(2)}' ascii->'${r.getString(3)}'"))
    // same measurement restricted to the accented names (the divergence set)
    val accented = countries.filter(c => c != java.text.Normalizer
      .normalize(c, java.text.Normalizer.Form.NFD).replaceAll("\\p{M}", ""))
    val acc = joined.filter(col("truth").isin(accented: _*)).agg(
      count(lit(1)).as("n"),
      avg(when(col("wratio") === col("wratio_ascii"), 1.0).otherwise(0.0)),
      avg(when(col("wratio") === col("truth"), 1.0).otherwise(0.0)),
      avg(when(col("wratio_ascii") === col("truth"), 1.0).otherwise(0.0)))
      .collect()(0)
    println(f"accented-only: queries=${acc.getLong(0)} agreement=${acc.getDouble(1) * 100}%.1f%% " +
      f"acc_wratio=${acc.getDouble(2) * 100}%.1f%% acc_wratio_ascii=${acc.getDouble(3) * 100}%.1f%%")
    spark.stop()
  }
}
