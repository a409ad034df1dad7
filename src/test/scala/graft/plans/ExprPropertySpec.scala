package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based laws for the native codegen expressions, fuzzing against
  * their interpreted / SQL-composition references on one batched DataFrame
  * per law (one Spark job each, PropertySpec style).
  */
class ExprPropertySpec extends SparkSpec {
  import spark.implicits._

  test("RollingHashExpr equals the SQL fold on random unicode strings") {
    val charGen = Gen.frequency(
      5 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '\t', ',', '!', '�'.toChar),
      2 -> Gen.choose('À', 'ſ'), // latin extended
      1 -> Gen.choose('一', '鿿')) // CJK
    val strGen = Gen.chooseNum(0, 80).flatMap(n => Gen.stringOfN(n, charGen))
    val strings = Gen.listOfN(300, strGen).sample.get
    val both = strings.toDF("s").select(
      RollingHashExpr.rollingHash(col("s")).as("fast"),
      expr("CASE WHEN length(s) = 0 THEN 0L ELSE aggregate(" +
        "sequence(1, length(s)), 0L, " +
        "(acc, i) -> (acc * 31 + ascii(substr(s, i, 1))) % 1000000007) END")
        .as("ref"))
      .as[(Long, Long)].collect()
    both.foreach { case (fast, ref) => assert(fast == ref) }
  }

  test("NearestCentroidExpr equals per-centroid L2 argmin computed driver-side") {
    val dim = 6
    val k = 5
    val cb: Seq[(Int, Seq[Double])] = (0 until k).map { c =>
      // non-dense cell ids on purpose
      (c * 3 + 1) -> Seq.tabulate(dim)(j => ((c * 17 + j * 13) % 19) - 9.0)
    }
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray)
    val vecs = Gen.listOfN(300, vecGen).sample.get.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val got = vecs.toDF("id", "v")
      .select(col("id"), NearestCentroidExpr.nearest(col("v"), cb).as("cell"))
      .as[(Long, Int)].collect().toMap
    vecs.foreach { case (id, v) =>
      val best = cb.map { case (cell, c) =>
        val d = v.zip(c).map { case (x, ci) =>
          val diff = x.toDouble - ci; diff * diff
        }.sum
        (d, cell)
      }.minBy(identity) // (dist, cell) — lowest cell wins ties
      assert(got(id) == best._2, s"id=$id")
    }
  }

  test("simhash: near-identical token multisets land within small hamming") {
    // appending one token flips at most a bounded number of sign sums —
    // identical docs MUST collide, single-token edits stay close
    val docs = (0 until 40).map { i =>
      val base = s"alpha beta gamma delta epsilon zeta eta theta word$i"
      Seq((i * 3L, base), (i * 3 + 1L, base), (i * 3 + 2L, base + " extra"))
    }.flatten.toDF("id", "text")
    val sig = graft.ext.NearDup.simhash(docs, "id", "text")
      .as[(Long, Long)].collect().toMap
    (0 until 40).foreach { i =>
      assert(sig(i * 3L) == sig(i * 3 + 1L), "exact clones must collide")
      val ham = java.lang.Long.bitCount(sig(i * 3L) ^ sig(i * 3 + 2L))
      assert(ham <= 24, s"one-token edit drifted $ham bits")
    }
  }

  test("FuzzScorers: structural laws on random token strings") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    val tokGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "kappa", "zeta")
    val strGen = Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, tokGen))
      .map(_.mkString(" "))
    val pairs = Gen.listOfN(300, Gen.zip(strGen, strGen)).sample.get
    pairs.foreach { case (a, b) =>
      val (ua, ub) = (u8(a), u8(b))
      val r = IndelRatioExpr.ratio(ua, ub)
      val p = FuzzScorers.partialRatio(ua, ub)
      val ts = FuzzScorers.tokenSortRatio(ua, ub)
      val tse = FuzzScorers.tokenSetRatio(ua, ub)
      val w = FuzzScorers.wratio(ua, ub)
      // all scores live in [0, 100]
      Seq(r, p, ts, tse, w).foreach(s => assert(s >= 0 && s <= 100, s"($a|$b)"))
      // NOT a law: partial >= ratio — false for unequal lengths, since the
      // full-string LCS may use matches spread wider than any needle-length
      // window (e.g. dispersed token matches). The true containment law:
      // a substring needle always finds its perfect window
      if (b.contains(a) && a.nonEmpty)
        assert(p == 100, s"substring needle scored $p on ($a|$b)")
      val _ = r // plain ratio retained for the range law above
      // every scorer is symmetric (shorter/longer and set roles swap clean)
      assert(p == FuzzScorers.partialRatio(ub, ua), s"partial asym ($a|$b)")
      assert(ts == FuzzScorers.tokenSortRatio(ub, ua), s"sort asym ($a|$b)")
      assert(tse == FuzzScorers.tokenSetRatio(ub, ua), s"set asym ($a|$b)")
      assert(w == FuzzScorers.wratio(ub, ua), s"wratio asym ($a|$b)")
      // self-similarity is perfect once the processed string is non-empty
      if (a.nonEmpty) assert(FuzzScorers.wratio(ua, ua) == 100)
      // token-order invariance: sort/set scorers ignore token permutation
      val shuffled = scala.util.Random.shuffle(a.split(" ").filter(_.nonEmpty).toList)
        .mkString(" ")
      if (a.nonEmpty) {
        assert(FuzzScorers.tokenSortRatio(ua, u8(shuffled)) == 100, s"($a|$shuffled)")
        assert(FuzzScorers.tokenSetRatio(ua, u8(shuffled)) == 100, s"($a|$shuffled)")
      }
      // the legacy-ascii twin agrees with the unicode form on ASCII input
      // (the generators above are pure ASCII), is symmetric, and in range
      val wa = FuzzScorers.wratioAscii(ua, ub)
      assert(wa == w, s"ascii twin diverged on ascii input ($a|$b): $wa != $w")
      assert(wa == FuzzScorers.wratioAscii(ub, ua), s"wratio_ascii asym ($a|$b)")
      // empty-token-set compat branch: either side all-whitespace/empty -> 0
      assert(FuzzScorers.tokenSetRatio(ua, u8("")) == 0
        && FuzzScorers.partialTokenSetRatio(ua, u8(" ")) == 0)
    }
    // on NON-ascii input the twins may diverge but both stay lawful:
    // symmetric, in range, and ascii deletion never resurrects an empty
    val uni = Seq("Curaçao", "México", "日本", "naïve café", "ascii only")
    for (a <- uni; b <- uni) {
      val (ua, ub) = (u8(a), u8(b))
      val wa = FuzzScorers.wratioAscii(ua, ub)
      assert(wa >= 0 && wa <= 100)
      assert(wa == FuzzScorers.wratioAscii(ub, ua), s"wratio_ascii asym ($a|$b)")
    }
    assert(FuzzScorers.wratioAscii(u8("日本"), u8("日本")) == 0) // processes to empty
  }

  test("IndelRatioExpr: bit-parallel LCS equals the DP reference on random unicode") {
    val charGen = Gen.frequency(
      6 -> Gen.oneOf('a', 'b', 'c'), // tiny alphabet forces dense match masks
      3 -> Gen.alphaNumChar,
      1 -> Gen.choose('一', '鿿'),
      1 -> Gen.const(new String(Character.toChars(0x1F600)).charAt(0))) // surrogate half
    // lengths straddle the 64-code-point fast-path boundary on purpose
    val strGen = Gen.chooseNum(0, 90).flatMap(n => Gen.stringOfN(n, charGen))
    val pairs = Gen.listOfN(400, Gen.zip(strGen, strGen)).sample.get
    pairs.foreach { case (a, b) =>
      val s = a.codePoints().toArray
      val t = b.codePoints().toArray
      val fast = IndelRatioExpr.lcs(s, t)
      val ref = IndelRatioExpr.lcsDp(s, t)
      assert(fast == ref, s"lcs mismatch on ${a.length}/${b.length}: $fast != $ref")
    }
    // and the public ratio stays consistent with the DP-derived formula
    pairs.take(50).foreach { case (a, b) =>
      val ua = org.apache.spark.unsafe.types.UTF8String.fromString(a)
      val ub = org.apache.spark.unsafe.types.UTF8String.fromString(b)
      val n = a.codePoints().count() + b.codePoints().count()
      val expected = if (n == 0) 100
        else Math.rint(200.0 * IndelRatioExpr.lcsDp(
          a.codePoints().toArray, b.codePoints().toArray) / n).toInt
      assert(IndelRatioExpr.ratio(ua, ub) == expected)
    }
  }

  test("WindowHashesExpr: content-determined, length-bounded, prefix-consistent") {
    val rnd = new scala.util.Random(20260814L)
    val vocab = Vector("aa", "b", "ccc", "d", "ee", "f")
    def arr(ts: Seq[String]) = org.apache.spark.sql.catalyst.util.ArrayData
      .toArrayData(ts.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(20)
      val toks = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      val p = rnd.nextInt(n)
      val maxLen = 1 + rnd.nextInt(12)
      val out = WindowHashesExpr.compute(arr(toks), p, maxLen)
      // length = min(maxLen, n - p)
      assert(out.numElements() == math.min(maxLen, n - p), s"$toks $p $maxLen")
      // content determinism: the same window embedded at another position
      // in another array hashes identically, element for element
      val shift = rnd.nextInt(4)
      val toks2 = Seq.fill(shift)("zz") ++ toks.drop(p)
      val out2 = WindowHashesExpr.compute(arr(toks2), shift, maxLen)
      (0 until math.min(out.numElements(), out2.numElements())).foreach { i =>
        assert(out.getLong(i) == out2.getLong(i), s"window $i differs")
      }
      // prefix consistency: recomputing with smaller maxLen gives a prefix
      val shorter = WindowHashesExpr.compute(arr(toks), p, math.max(1, maxLen - 2))
      (0 until shorter.numElements()).foreach { i =>
        assert(shorter.getLong(i) == out.getLong(i))
      }
      // discrimination: different first token => different h_1
      val flipped = ("zq" +: toks.drop(p + 1))
      val outF = WindowHashesExpr.compute(arr(flipped), 0, 1)
      assert(outF.getLong(0) != out.getLong(0) || toks(p) == "zq")
    }
  }

  test("UnicodeNormalizeExpr: idempotence and NFC(NFD(x)) == NFC(x) on random strings") {
    val rnd = new scala.util.Random(42L)
    val pieces = Vector("a", "é", "e\u0301" /* e+combining acute */,
      "ü", "u\u0308" /* u+combining diaeresis */,
      "ﬁ", "中", "x", " ", "n~" /* plain */,
      "ñ", "n\u0303" /* n+combining tilde */)
    def randomString(): org.apache.spark.unsafe.types.UTF8String =
      org.apache.spark.unsafe.types.UTF8String.fromString(
        Seq.fill(1 + rnd.nextInt(12))(pieces(rnd.nextInt(pieces.size))).mkString)
    (1 to 300).foreach { _ =>
      val s = randomString()
      for (form <- Seq("NFC", "NFKC")) {
        val once = UnicodeNormalizeExpr.normalize(s, form, stripAccents = false)
        val twice = UnicodeNormalizeExpr.normalize(once, form, stripAccents = false)
        assert(once.toString == twice.toString, s"$form not idempotent on $s")
      }
      val viaNfd = UnicodeNormalizeExpr.normalize(
        UnicodeNormalizeExpr.normalize(s, "NFD", stripAccents = false),
        "NFC", stripAccents = false)
      val direct = UnicodeNormalizeExpr.normalize(s, "NFC", stripAccents = false)
      assert(viaNfd.toString == direct.toString, s"NFC∘NFD != NFC on $s")
      // accent fold is idempotent and never reintroduces combining marks
      val folded = UnicodeNormalizeExpr.normalize(s, "NFC", stripAccents = true)
      val folded2 = UnicodeNormalizeExpr.normalize(folded, "NFC", stripAccents = true)
      assert(folded.toString == folded2.toString)
      assert(!folded.toString.exists(c =>
        Character.getType(c) == Character.NON_SPACING_MARK))
    }
  }

  // ------------------------- d18 (max duplicated run) expression family

  private def utf8Arr(ts: Seq[String]) =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      ts.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
  private def longArr(ls: Seq[Long]) =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(ls.toArray)

  test("SharedGramsExpr: text-exact survivor filter; hash matches xxhash64(gram)") {
    val rnd = new scala.util.Random(20260815L)
    val vocab = Vector("a", "bb", "c", "dd", "e")
    (1 to 100).foreach { _ =>
      val b = 2 + rnd.nextInt(3)
      val n = rnd.nextInt(14)
      val toks = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      val grams = (0 to n - b).map(p => toks.slice(p, p + b).mkString(" "))
      val unshared = grams.distinct.filter(_ => rnd.nextBoolean()).sorted
      val out = SharedGramsExpr.compute(utf8Arr(toks), b, utf8Arr(unshared))
      val got = (0 until out.numElements()).map(i =>
        out.getStruct(i, 2).getInt(0)).toSet
      val want = grams.zipWithIndex.collect {
        case (g, p) if !unshared.contains(g) => p
      }.toSet
      assert(got == want, s"toks=$toks b=$b unshared=$unshared")
    }
    // the emitted leaf hash IS Catalyst's xxhash64(gram) — the contract
    // that lets the general-minDocs path build identical leaves with the
    // built-in function
    val toks = Seq("aa", "b", "ccc", "d")
    val out = SharedGramsExpr.compute(utf8Arr(toks), 2, utf8Arr(Nil))
    val sqlHashes = Seq("aa b", "b ccc", "ccc d").toDF("g")
      .select(xxhash64(col("g"))).as[Long].collect()
    (0 until 3).foreach { p =>
      assert(out.getStruct(p, 2).getLong(1) == sqlHashes(p), s"p=$p")
    }
  }

  test("MerkleLevelsExpr: baseLen ladder equals the driver-side recursive combine") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val rnd = new scala.util.Random(77L)
    (1 to 100).foreach { _ =>
      val b = Seq(1, 2, 4)(rnd.nextInt(3))
      val cap = Seq(4, 8, 16, 64)(rnd.nextInt(4))
      // random survivor positions with runs and gaps
      val ps = (0 until 30).filter(_ => rnd.nextInt(3) > 0)
      val hs = ps.map(p => rnd.nextLong())
      val byP = ps.zip(hs).toMap
      // reference: H_{2n}(p) = combine(H_n(p), H_n(p+n)) where both exist
      var level = byP
      var n = b
      val want = scala.collection.mutable.Set.empty[(Int, Int, Long)]
      while (2L * n <= cap) {
        val next = level.flatMap { case (p, h) =>
          level.get(p + n).map(h2 => p -> XXH64.hashLong(h2, h))
        }
        n = 2 * n
        next.foreach { case (p, h) =>
          want += ((p, n, MerkleLevelsExpr.packKey(n, h)))
        }
        level = next
      }
      val entries = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        rnd.shuffle(ps.zip(hs)).map { case (p, h) =>
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](p, h))
        }.toArray)
      val out = MerkleLevelsExpr.compute(entries, cap, b)
      val got = (0 until out.numElements()).map { i =>
        val r = out.getStruct(i, 3)
        (r.getInt(0), r.getInt(1), r.getLong(2))
      }.toSet
      assert(got == want, s"b=$b cap=$cap ps=$ps")
    }
  }

  test("FilterPackedExpr drops exactly the entries whose key is listed") {
    val rnd = new scala.util.Random(99L)
    (1 to 50).foreach { _ =>
      val entries = (0 until rnd.nextInt(20)).map(i =>
        (rnd.nextInt(40), Seq(8, 16, 32)(rnd.nextInt(3)), rnd.nextLong() % 50))
      val listed = entries.map(_._3).distinct.filter(_ => rnd.nextBoolean())
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        entries.map { case (p, n, k) =>
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](p, n, k))
        }.toArray)
      val out = FilterPackedExpr.compute(arr, longArr(listed.sorted))
      val got = (0 until out.numElements()).map { i =>
        val r = out.getStruct(i, 2); (r.getInt(0), r.getInt(1))
      }
      val want = entries.collect { case (p, n, k) if !listed.contains(k) => (p, n) }
      assert(got == want, s"entries=$entries listed=$listed")
    }
  }

  test("NpWindowsExpr: every emitted window respects all four bounds; none missing") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val rnd = new scala.util.Random(20260816L)
    val vocab = Vector("x", "yy", "z", "w")
    (1 to 100).foreach { _ =>
      val b = 2 + rnd.nextInt(3)
      val cap = Seq(4, 8, 16)(rnd.nextInt(3))
      val len = b + rnd.nextInt(25)
      val toks = Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
      val basePs = (0 to len - b).filter(_ => rnd.nextInt(3) > 0)
      val higher = basePs.filter(_ => rnd.nextInt(4) == 0)
        .map(p => (p, Seq(2 * b, 4 * b)(rnd.nextInt(2))))
      val baseArr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        rnd.shuffle(basePs).map(p =>
          new GenericInternalRow(Array[Any](p, 0L))).toArray)
      val hiArr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        rnd.shuffle(higher).map { case (p, nn) =>
          new GenericInternalRow(Array[Any](p, nn)) }.toArray)
      val out = NpWindowsExpr.compute(utf8Arr(toks), baseArr, hiArr, b, cap)
      val got = (0 until out.numElements()).map { i =>
        val r = out.getStruct(i, 3); (r.getInt(0), r.getInt(1), r.getLong(2))
      }
      // reference bounds
      val baseSet = basePs.toSet
      def runEnd(p: Int): Int =
        Iterator.iterate(p)(_ + 1).takeWhile(baseSet.contains).toSeq.last
      val want = basePs.flatMap { p =>
        val np = (b +: higher.collect { case (q, nn) if q == p => nn }).max
        val maxm = Seq(2L * np - 1, cap.toLong, (len - p).toLong,
          (runEnd(p) - p + b).toLong).min
        ((b + 1).toLong to maxm).map(m => (p, m.toInt))
      }
      assert(got.map(t => (t._1, t._2)).sorted == want.sorted,
        s"b=$b cap=$cap len=$len basePs=$basePs higher=$higher")
      // hashes are the shared rolling chain — identical strings across
      // documents always meet in the same count bucket
      got.foreach { case (p, m, h) =>
        val chain = WindowHashesExpr.compute(utf8Arr(toks), p.toLong, m.toLong)
        assert(chain.getLong(m - 1) == h)
      }
    }
  }
}
