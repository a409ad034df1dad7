package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalacheck.Gen

/** Laws for the round-14 fused featurization/training expressions — each
  * one replaced an interpreted HOF / exploded-dataflow composition (the
  * t37 O(L²) hot spot), so each law pins the new form to the EXACT output
  * of the composition it replaced.
  */
class FeaturizerExprSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- CharNgramsExpr

  test("CharNgramsExpr equals the HOF composition on random unicode strings") {
    val charGen = Gen.frequency(
      5 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', 'é', 'ß'),
      2 -> Gen.choose('À', 'ſ'),
      1 -> Gen.choose('一', '鿿'))
    val strGen = Gen.chooseNum(0, 40).flatMap(k => Gen.stringOfN(k, charGen))
    val strings = Gen.listOfN(300, strGen).sample.get ++
      // non-BMP: surrogate pairs must count as ONE code point per window
      Seq("a😀b", "😀😁😂", "ab", "")
    for (n <- Seq(1, 2, 3, 5)) {
      val both = strings.toDF("s").select(
        CharNgramsExpr.charNgrams(col("s"), n).as("fast"),
        when(length(col("s")) >= n,
          transform(sequence(lit(1), length(col("s")) - (n - 1)),
            i => col("s").substr(i, lit(n)))).otherwise(array()).as("ref"))
        .as[(Seq[String], Seq[String])].collect()
      both.foreach { case (fast, ref) => assert(fast == ref, s"n=$n") }
    }
  }

  test("CharNgramsExpr: null in → null out; SQL-registered as char_ngrams") {
    val r = Seq[String](null).toDF("s")
      .select(CharNgramsExpr.charNgrams(col("s"), 3)).collect()(0)
    assert(r.isNullAt(0))
    val got = spark.sql("SELECT char_ngrams('hello', 3) AS g")
      .as[Seq[String]].head()
    assert(got == Seq("hel", "ell", "llo"))
    // non-foldable n is a typed error, not a mis-plan (foldable
    // compositions like length('abc') fold and are accepted)
    val err = intercept[Exception] {
      spark.sql(
        "SELECT char_ngrams(s, length(s)) FROM VALUES ('ab') t(s)").collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  // ----------------------------------------------------- BucketCountsExpr

  test("BucketCountsExpr equals explode→groupBy count on random token arrays") {
    val tokGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "épsilon",
      "中文", "x", "yy", "zzz")
    val arrGen = Gen.chooseNum(0, 30).flatMap(k => Gen.listOfN(k, tokGen))
    val arrays = Gen.listOfN(200, arrGen).sample.get.zipWithIndex
      .map { case (ts, i) => (i.toLong, ts) }
    for (buckets <- Seq(1, 7, 64, 10000)) { // 10000 exercises the map path
      val fast = arrays.toDF("id", "toks")
        .select(col("id"),
          BucketCountsExpr.bucketCounts(col("toks"), buckets).as("cv"))
        .as[(Long, Seq[(Int, Long)])].collect().toMap
      arrays.foreach { case (id, ts) =>
        val ref = ts.groupBy(t => (RollingHashExpr.hash(
            org.apache.spark.unsafe.types.UTF8String.fromString(t)) %
            buckets).toInt)
          .map { case (b, g) => (b, g.size.toLong) }.toSeq.sortBy(_._1)
        assert(fast(id) == ref, s"id=$id buckets=$buckets")
      }
    }
  }

  test("BucketCountsExpr: empty → empty, null → null, null tokens skipped") {
    val df = Seq(
      (1L, Seq[String]()), (2L, null), (3L, Seq("a", null, "a"))
    ).toDF("id", "toks")
    val rows = df.select(col("id"),
        BucketCountsExpr.bucketCounts(col("toks"), 8).as("cv"))
      .orderBy("id").collect()
    assert(rows(0).getSeq[Any](1).isEmpty)
    assert(rows(1).isNullAt(1))
    assert(rows(2).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)).sum == 2L)
    val viaSql = spark.sql("SELECT bucket_counts(array('a','b','a'), 4) AS cv")
      .selectExpr("aggregate(cv, 0L, (a, x) -> a + x.__c)").as[Long].head()
    assert(viaSql == 3L)
  }

  // ------------------------------------------------------ RidgeMomentsAgg

  test("RidgeMomentsAgg reproduces the exploded DECIMAL-fold moments bit-for-bit") {
    val buckets = 16
    val rnd = new scala.util.Random(20260814L)
    val labels = Seq("en", "fr", "de")
    val docs = (0 until 120).map { i =>
      val toks = Seq.fill(1 + rnd.nextInt(40))(s"tok${rnd.nextInt(60)}")
      (i.toLong, labels(rnd.nextInt(3)), toks)
    }.toDF("id", "y", "toks")
    val cv = BucketCountsExpr.bucketCounts(col("toks"), buckets)
    val base = docs.select(col("y").as("__y"), cv.as("__cv"))
      .filter(size(col("__cv")) > 0)
    // the new single-pass form
    val m = base.agg(RidgeMomentsAgg.moments(col("__cv"), col("__y"), buckets)
        .as("m"))
      .select(col("m.gram").as("gram"), col("m.cls").as("cls")).collect()(0)
    val gramFast = m.getSeq[org.apache.spark.sql.Row](0)
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDecimal(2))).toMap
    val clsFast = m.getSeq[org.apache.spark.sql.Row](1)
      .map(r => ((r.getString(0), r.getInt(1)), r.getDecimal(2))).toMap
    // the round-13 dataflow form it replaced (explode² + DECIMAL(28,14) sum)
    def dsum(c: org.apache.spark.sql.Column) = sum(c.cast(DecimalType(28, 14)))
    val perDoc = base
      .withColumn("__n", aggregate(col("__cv"), lit(0L),
        (acc, x) => acc + x.getField("__c")))
      .withColumn("__fv", array_append(col("__cv"),
        struct(lit(buckets).as("__b"), col("__n").as("__c"))))
    val gramRef = perDoc
      .select(col("__fv"), col("__n"), explode(col("__fv")).as("__f1"))
      .select(col("__n"), col("__f1"), explode(col("__fv")).as("__f2"))
      .groupBy(col("__f1.__b").as("b1"), col("__f2.__b").as("b2"))
      .agg(dsum((col("__f1.__c") * col("__f2.__c")).cast("double") /
        (col("__n") * col("__n")).cast("double")).as("g"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDecimal(2))).toMap
    val clsRef = perDoc
      .select(col("__y"), col("__n"), explode(col("__fv")).as("__f"))
      .groupBy(col("__y"), col("__f.__b").as("b"))
      .agg(dsum(col("__f.__c").cast("double") / col("__n").cast("double"))
        .as("s"))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getDecimal(2))).toMap
    gramRef.foreach { case (k, v) =>
      assert(gramFast(k).compareTo(v) == 0, s"gram $k: ${gramFast(k)} != $v")
    }
    // fast form emits the dense zero cells too — every extra cell is zero
    gramFast.foreach { case (k, v) =>
      if (!gramRef.contains(k)) assert(v.signum == 0, s"nonzero extra $k")
    }
    clsRef.foreach { case (k, v) =>
      assert(clsFast(k).compareTo(v) == 0, s"cls $k: ${clsFast(k)} != $v")
    }
    assert(clsFast.keySet == clsRef.keySet)
  }

  test("RidgeMomentsAgg is partitioning-invariant (exact integer folds)") {
    val buckets = 8
    val docs = (0 until 80).map { i =>
      (i.toLong, if (i % 2 == 0) "a" else "b",
        Seq.fill(1 + i % 13)(s"w${i % 17}"))
    }.toDF("id", "y", "toks")
    def momentsOf(df: org.apache.spark.sql.DataFrame) = {
      val cv = BucketCountsExpr.bucketCounts(col("toks"), buckets)
      df.select(col("y").as("__y"), cv.as("__cv"))
        .filter(size(col("__cv")) > 0)
        .agg(RidgeMomentsAgg.moments(col("__cv"), col("__y"), buckets).as("m"))
        .select(col("m").cast("string")).as[String].head()
    }
    val a = momentsOf(docs.repartition(1))
    val b = momentsOf(docs.repartition(32, col("id")))
    val c = momentsOf(docs.orderBy(col("id").desc))
    assert(a == b && b == c)
  }

  test("scaled() fast path equals Spark's double→DECIMAL(28,14) cast semantics") {
    val rnd = new scala.util.Random(14L)
    def check(v: Double): Unit =
      assert(RidgeMomentsAgg.scaled(v) == RidgeMomentsAgg.scaledExact(v),
        s"v=$v")
    // random ratios of the trainer's actual shape: c1*c2 / n^2 in [0, 1]
    (1 to 200000).foreach { _ =>
      val n = 1 + rnd.nextInt(5000)
      val c1 = 1 + rnd.nextInt(n)
      val c2 = 1 + rnd.nextInt(n)
      check(c1.toDouble * c2 / (n.toDouble * n))
    }
    // adversarial: exact half-boundary and near-boundary values
    check(0.5); check(1.0); check(0.0)
    (0 to 2000).foreach { k =>
      val b = (k + 0.5) / 1e14 * 1e10 // spread boundaries across [0, 1]
      check(b); check(Math.nextUp(b)); check(Math.nextDown(b))
    }
    (1 to 50000).foreach { _ => check(rnd.nextDouble()) }
  }

  test("RidgeMomentsAgg rejects a free-text label column with a typed error") {
    val buf = new RidgeMomentsAgg.Buf(3)
    val arr = new GenericArrayData(Array[Any](
      new GenericInternalRow(Array[Any](0, 1L))))
    (1 to RidgeMomentsAgg.MaxClasses).foreach(i =>
      buf.addDoc(arr, s"label$i", 2))
    val e = intercept[IllegalStateException](buf.addDoc(arr, "one-more", 2))
    assert(e.getMessage.contains("distinct labels"))
    // an ALREADY-SEEN label still folds fine at the cap
    buf.addDoc(arr, "label1", 2)
  }

  test("RidgeMomentsAgg 128-bit cell carry survives sums past 2^63") {
    // one feature with count 1 → the intercept cell folds scaled(1.0)=1e14
    // per doc; 2^64/1e14 ≈ 184k docs overflows the unsigned-64 lo word
    val buckets = 2
    val buf = new RidgeMomentsAgg.Buf(buckets + 1)
    val arr = new GenericArrayData(Array[Any](
      new GenericInternalRow(Array[Any](0, 1L))))
    val docsN = 200000
    (1 to docsN).foreach(_ => buf.addDoc(arr, "y", buckets))
    val row = buf.result()
    val gram = row.getArray(0)
    // cell (B, B) = Σ scaled(1.0) = docsN exactly (as DECIMAL(38,14))
    val d = buckets + 1
    val cell = gram.getStruct(d * d - 1, 3)
    assert(cell.getInt(0) == buckets && cell.getInt(1) == buckets)
    val dec = cell.getDecimal(2, 38, 14)
    assert(dec.toBigDecimal == BigDecimal(docsN), s"got $dec")
    // and the carry round-trips through serialize/deserialize (shuffle path)
    val back = RidgeMomentsAgg.Buf.deserialize(buf.serialize(), d)
    val cell2 = back.result().getArray(0).getStruct(d * d - 1, 3)
    assert(cell2.getDecimal(2, 38, 14).toBigDecimal == BigDecimal(docsN))
  }
}
