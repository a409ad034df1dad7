package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("wordCount: empty, single, multi, messy whitespace") {
    val df = Seq("", "one", "two words", "  padded \r\n lines \t here ").toDF("t")
    val got = df.select(TextFunctions.wordCount(col("t")).as("n")).as[Int].collect().toSeq
    assert(got == Seq(0, 1, 2, 3))
  }

  test("tokenCount counts word pieces and punctuation separately") {
    val df = Seq("hello, world!").toDF("t")
    val got = df.select(TextFunctions.tokenCount(col("t")).as("n")).as[Int].collect().head
    assert(got == 4) // hello , world !
  }

  test("fingerprint is invariant to case and whitespace shape") {
    val df = Seq(("A  B\r\nC", "a b c")).toDF("x", "y")
    val got = df.select(
      (TextFunctions.fingerprint(col("x")) === TextFunctions.fingerprint(col("y"))).as("eq"))
      .as[Boolean].collect().head
    assert(got)
  }

  test("langId picks marker-majority language; no markers -> und") {
    val df = Seq(
      "the cat and the dog is with us",
      "le chat et la mer les des",
      "zzz qqq www").toDF("t")
    val got = df.select(TextFunctions.langId(col("t")).as("l")).as[String].collect().toSeq
    assert(got == Seq("en", "fr", "und"))
  }

  test("cosineSimilarity: identical=1, orthogonal=0, zero-norm -> null") {
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(0f, 0f, 0f), Array(1f, 1f, 1f))).toDF("a", "b")
    val got = df.select(VectorFunctions.cosineSimilarity(col("a"), col("b")).as("c"))
      .as[Option[Double]].collect().toSeq
    assert(math.abs(got(0).get - 1.0) < 1e-12)
    assert(got(1).get == 0.0)
    assert(got(2).isEmpty)
  }

  test("l2Distance of identical vectors is 0") {
    val df = Seq((Array(1f, 2f), Array(1f, 2f))).toDF("a", "b")
    val got = df.select(VectorFunctions.l2Distance(col("a"), col("b")).as("d"))
      .as[Double].collect().head
    assert(got == 0.0)
  }

  test("hyperplaneSignature is deterministic and bucket-stable for equal vectors") {
    val df = Seq((1L, Array.fill(8)(0.5f)), (2L, Array.fill(8)(0.5f)),
      (3L, Array.tabulate(8)(i => if (i % 2 == 0) 1f else -1f))).toDF("id", "v")
    val sigs = df.select(col("id"),
        VectorFunctions.hyperplaneSignature(col("v"), dim = 8, planes = 6).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L)) // identical vectors share a bucket
  }

  test("fuzzRatio matches documented thefuzz fuzz.ratio outputs") {
    // differential fixtures: left column = thefuzz (rapidfuzz-backed,
    // as the reference pins via thefuzz[speedup]) outputs — the first two
    // are the canonical fuzzywuzzy README examples
    val cases = Seq(
      ("this is a test", "this is a test!", 97),
      ("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear", 91),
      ("new york mets", "new york mets", 100),
      ("", "", 100), // rapidfuzz: both empty is a perfect match
      ("abc", "", 0),
      ("abcd", "bcde", 75), // indel scale; Levenshtein scale would say 50
      ("aXXXXXXX", "aYYYYYYY", 12), // 12.5 → Python banker's rounding → 12
      ("abcXXXXX", "abcYYYYY", 38)) // 37.5 → rounds UP to even 38
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val got = df.select(graft.operators.FuzzyJoin.fuzzRatio(col("a"), col("b")))
      .as[Int].collect().toSeq
    assert(got == cases.map(_._3), s"got $got")
    // code points, not UTF-16 chars: the astral-plane emoji counts once
    val uni = Seq(("😀a", "😀b")).toDF("a", "b")
    assert(uni.select(graft.operators.FuzzyJoin.fuzzRatio(col("a"), col("b")))
      .as[Int].head() == 50)
  }

  test("partial/token_sort/token_set ratios match documented thefuzz outputs") {
    import graft.plans.WRatioExpr._
    // canonical fuzzywuzzy README fixtures first, then engine-definition
    // cases (rapidfuzz >= 2.0 optimal-alignment semantics, float subscores)
    val partialCases = Seq(
      ("this is a test", "this is a test!", 100), // README
      ("yankees", "new york yankees", 100),
      ("abc", "cde", 50),  // overhang window "c" beats full window "cde" (33)
      ("ab", "ba", 67),    // best alignment is a 1-char overhang: 200/3
      ("", "", 100), ("x", "", 0))
    val gotP = partialCases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(partialRatio(col("a"), col("b"))).as[Int].collect().toSeq
    assert(gotP == partialCases.map(_._3), s"partial: $gotP")

    val sortCases = Seq(
      ("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear", 100), // README
      ("great is scala", "scala is great", 100),
      ("b a", "a c", 67)) // sorted "a b" vs "a c": LCS 2 → 200·2/6
    val gotSort = sortCases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(tokenSortRatio(col("a"), col("b"))).as[Int].collect().toSeq
    assert(gotSort == sortCases.map(_._3), s"token_sort: $gotSort")

    val setCases = Seq(
      ("fuzzy was a bear", "fuzzy fuzzy was a bear", 100), // README
      ("spark sql", "spark sql engine fast", 100), // containment → 100
      ("a b", "c d", 33)) // disjoint tokens: only the joining space matches
                          // ("a b" vs "c d" → LCS 1 → 200/6), as in thefuzz
    val gotSet = setCases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(tokenSetRatio(col("a"), col("b"))).as[Int].collect().toSeq
    assert(gotSet == setCases.map(_._3), s"token_set: $gotSet")
  }

  test("token_set family: either token set empty scores 0 (rapidfuzz compat branch)") {
    import graft.plans.WRatioExpr._
    // round-5 advisor finding: with an empty intersection and one empty
    // side, t0 = "" and t2 = "", and ratio of two empty strings is 100 —
    // so token_set_ratio('x', '') scored 100 and an all-whitespace
    // candidate would dominate any top-1 ranking. rapidfuzz/thefuzz return
    // 0 whenever either token SET is empty; pin that branch on both
    // variants, including the both-empty and whitespace-only shapes.
    val cases = Seq(
      ("x", "", 0), ("", "x", 0), ("", "", 0),
      (" ", "anything", 0), ("anything", "   ", 0))
    val got = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(tokenSetRatio(col("a"), col("b")).as("s"),
        partialTokenSetRatio(col("a"), col("b")).as("p"))
      .as[(Int, Int)].collect().toSeq
    assert(got.forall(_ == ((0, 0))), s"empty-token-set: $got")
    // non-empty sides are unaffected
    val sane = Seq(("spark sql", "spark sql engine")).toDF("a", "b")
      .select(tokenSetRatio(col("a"), col("b"))).as[Int].head()
    assert(sane == 100)
  }

  test("wratio_ascii: legacy thefuzz force_ascii preprocessing (FIXTURES.md §4)") {
    import graft.plans.WRatioExpr.{wratio, wratioAscii}
    // thefuzz full_process(force_ascii=True) DELETES non-ASCII code points
    // ("Curaçao" → "curaao"), the engine default keeps them (rapidfuzz
    // Unicode semantics) — the same pair scores differently under the two
    // processors, and the ascii variant reproduces the reference's numbers
    // on accented names:
    //   curaçao/curacao: LCS 6 of 7+7 → 85.7 → 86 (unicode)
    //   curaao/curacao:  LCS 6 of 6+7 → 92.3 → 92 (thefuzz)
    //   méxico/mexico:   LCS 5 of 6+6 → 83.3 → 83 (unicode)
    //   mxico/mexico:    LCS 5 of 5+6 → 90.9 → 91 (thefuzz)
    val df = Seq(("Curaçao", "Curacao"), ("México", "Mexico")).toDF("a", "b")
    val got = df.select(wratio(col("a"), col("b")).as("u"),
      wratioAscii(col("a"), col("b")).as("l")).as[(Int, Int)].collect().toSeq
    assert(got == Seq((86, 92), (83, 91)), s"wratio unicode/ascii: $got")
    // pure-ASCII inputs are identical under both processors
    val same = Seq(("this is a test", "THIS is a test!!"),
      ("spark", "apache spark"), ("!!!", "anything")).toDF("a", "b")
      .select(wratio(col("a"), col("b")).as("u"),
        wratioAscii(col("a"), col("b")).as("l"))
      .as[(Int, Int)].collect().toSeq
    assert(same.forall(p => p._1 == p._2), s"ascii inputs must agree: $same")
    // an ALL-non-ASCII side processes to empty under force_ascii → 0
    val gone = Seq(("日本", "日本")).toDF("a", "b")
      .select(wratio(col("a"), col("b")).as("u"),
        wratioAscii(col("a"), col("b")).as("l")).as[(Int, Int)].head()
    assert(gone == ((100, 0)), s"non-ascii-only: $gone")
    // SQL-reachable through GraftExtensions
    val sqlGot = spark.sql("SELECT wratio_ascii('Curaçao', 'Curacao') AS w")
      .as[Int].head()
    assert(sqlGot == 92)
  }

  test("partial token scorers: containment shortcuts and SQL registration") {
    import graft.plans.WRatioExpr._
    val cases = Seq(
      // sorted-token needle is a window prefix of the sorted haystack
      ("b a", "a b zzz", 100, 100),
      // single tokens, equal length: the winning alignment is the REVERSE
      // direction's suffix overhang ("xbc" needle, window "xc": 200·2/5)
      // — pins the symmetric two-direction slide
      ("axc", "xbc", 80, 80),
      ("x", "y", 0, 0))
    val got = cases.map { case (a, b, _, _) => (a, b) }.toDF("a", "b")
      .select(partialTokenSortRatio(col("a"), col("b")).as("so"),
        partialTokenSetRatio(col("a"), col("b")).as("se"))
      .as[(Int, Int)].collect().toSeq
    assert(got == cases.map(c => (c._3, c._4)), s"got $got")
    // any shared token makes t0 a prefix window of t1 → set variant saturates
    val shared = Seq(("spark engine", "engine room")).toDF("a", "b")
      .select(partialTokenSetRatio(col("a"), col("b"))).as[Int].head()
    assert(shared == 100)
    // the whole family is SQL-reachable through GraftExtensions
    val sqlRow = spark.sql(
      """SELECT wratio('spark', 'apache spark') AS w,
        |  partial_ratio('this is a test', 'this is a test!') AS p,
        |  token_sort_ratio('great is scala', 'scala is great') AS ts,
        |  token_set_ratio('fuzzy was a bear', 'fuzzy fuzzy was a bear') AS tse,
        |  partial_token_sort_ratio('b a', 'a b zzz') AS pts,
        |  partial_token_set_ratio('spark engine', 'engine room') AS ptse
        |""".stripMargin)
      .as[(Int, Int, Int, Int, Int, Int)].head()
    assert(sqlRow == ((90, 100, 100, 100, 100, 100)))
  }

  test("wratio composite: branch points and processor match the public formula") {
    import graft.plans.WRatioExpr.wratio
    val cases = Seq(
      // processor strips punctuation + case → exact match
      ("this is a test", "THIS is a test!!", 100),
      ("New York Mets", "new york mets", 100),
      // len ratio 12/5 = 2.4 → partial branch: partial_ratio 100 · 0.9
      ("spark", "apache spark", 90),
      // len ratio exactly 8 → partial scale drops to 0.6 (rapidfuzz
      // boundary semantics: < 8 keeps 0.9)
      ("a", "abcdefgh", 60),
      // similar lengths (< 1.5) → no partials: max(ratio, 0.95·token)
      ("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear", 95),
      // either side processing to empty → 0
      ("!!!", "anything", 0))
    val got = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(wratio(col("a"), col("b"))).as[Int].collect().toSeq
    assert(got == cases.map(_._3), s"wratio: $got")
  }

  test("fuzzRatio vs similarityRatio: documented top-1 divergence case") {
    // "abcd" is indel-closer to "bcde" (LCS 3 → 75) than to "azcd"
    // (LCS 3 → 75... tie) — use the classic substitution-heavy case:
    // substitutions cost 1 on the Levenshtein scale but 2 on the indel
    // scale, so a same-length candidate with 2 substitutions loses to a
    // shifted candidate under fuzzRatio while winning under similarityRatio
    val df = Seq(("abcdef", "azcdez", "bcdefg")).toDF("k", "subCand", "shiftCand")
    val r = df.select(
      graft.operators.FuzzyJoin.fuzzRatio(col("k"), col("subCand")).as("fuzzSub"),
      graft.operators.FuzzyJoin.fuzzRatio(col("k"), col("shiftCand")).as("fuzzShift"),
      graft.operators.FuzzyJoin.similarityRatio(col("k"), col("subCand")).as("levSub"),
      graft.operators.FuzzyJoin.similarityRatio(col("k"), col("shiftCand")).as("levShift"))
      .as[(Int, Int, Double, Double)].head()
    // indel: subCand LCS 4 → 67, shiftCand LCS 5 → 83 — shift wins
    assert(r._1 == 67 && r._2 == 83 && r._2 > r._1)
    // levenshtein: subCand dist 2 → 0.667, shiftCand dist 2 → 0.667 — a tie
    // the indel scorer breaks; exactly the documented approximation gap
    assert(r._3 == r._4)
  }
}
