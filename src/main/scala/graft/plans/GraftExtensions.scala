package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (`spark.sql.extensions=graft.plans.GraftExtensions`):
  * registers the native expressions as first-class SQL functions —
  * `SELECT cosine_similarity(a.embedding, b.embedding) FROM ...` plans the
  * fused codegen'd loop, indistinguishable from a built-in — and installs
  * the engine's optimizer rules (thresholded-Levenshtein length pruning).
  * `rolling_hash(s)` is likewise SQL-reachable; nearest_centroid is not
  * (its codebook is a Scala literal, not a child expression — use
  * [[NearestCentroidExpr.nearest]] from the Column API).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_similarity"),
      (children: Seq[Expression]) => CosineSimilarityExpr(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_hash"),
      (children: Seq[Expression]) => RollingHashExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("fuzz_ratio"),
      new ExpressionInfo(classOf[IndelRatioExpr].getName, "fuzz_ratio"),
      (children: Seq[Expression]) => IndelRatioExpr(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("jaro_similarity"),
      new ExpressionInfo(classOf[JaroExpr].getName, "jaro_similarity"),
      (children: Seq[Expression]) => JaroExpr(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("partial_ratio"),
      new ExpressionInfo(classOf[PartialRatioExpr].getName, "partial_ratio"),
      (children: Seq[Expression]) => PartialRatioExpr(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("token_sort_ratio"),
      new ExpressionInfo(classOf[TokenSortRatioExpr].getName, "token_sort_ratio"),
      (children: Seq[Expression]) => TokenSortRatioExpr(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("token_set_ratio"),
      new ExpressionInfo(classOf[TokenSetRatioExpr].getName, "token_set_ratio"),
      (children: Seq[Expression]) => TokenSetRatioExpr(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("partial_token_sort_ratio"),
      new ExpressionInfo(classOf[PartialTokenSortRatioExpr].getName, "partial_token_sort_ratio"),
      (children: Seq[Expression]) => PartialTokenSortRatioExpr(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("partial_token_set_ratio"),
      new ExpressionInfo(classOf[PartialTokenSetRatioExpr].getName, "partial_token_set_ratio"),
      (children: Seq[Expression]) => PartialTokenSetRatioExpr(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("wratio"),
      new ExpressionInfo(classOf[WRatioExpr].getName, "wratio"),
      (children: Seq[Expression]) => WRatioExpr(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("wratio_ascii"),
      new ExpressionInfo(classOf[WRatioExpr].getName, "wratio_ascii"),
      (children: Seq[Expression]) => WRatioExpr(children.head, children(1),
        forceAscii = true)))
    // unicode_normalize(s[, form[, strip_accents]]): form/strip must be
    // foldable literals — they parameterize the generated code, they are
    // not per-row children
    ext.injectFunction((
      FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalizeExpr].getName, "unicode_normalize"),
      (children: Seq[Expression]) => {
        def lit(e: Expression): Any = {
          require(e.foldable, "unicode_normalize options must be literals")
          e.eval(null)
        }
        val form = if (children.size >= 2) lit(children(1)).toString else "NFC"
        // typed error instead of a raw ClassCastException on e.g.
        // unicode_normalize(s, 'NFC', 1) (round-12 ADVICE)
        val strip = children.size >= 3 && (lit(children(2)) match {
          case b: java.lang.Boolean => b.booleanValue()
          case other => throw new IllegalArgumentException(
            "unicode_normalize strip_accents must be a boolean literal, " +
              s"got ${children(2).sql}" +
              (if (other == null) " (NULL)" else s" of type ${other.getClass.getSimpleName}"))
        })
        UnicodeNormalizeExpr(children.head, form, strip)
      }))
    // char_ngrams(s, n) / bucket_counts(tokens, b): the size parameters
    // shape the generated code, so they must be foldable literals
    def litInt(e: Expression, fn: String): Int = {
      require(e.foldable, s"$fn size parameter must be a literal")
      e.eval(null) match {
        case i: java.lang.Integer => i.intValue()
        case other => throw new IllegalArgumentException(
          s"$fn size parameter must be an integer literal, got $other")
      }
    }
    ext.injectFunction((
      FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNgramsExpr].getName, "char_ngrams"),
      (children: Seq[Expression]) =>
        CharNgramsExpr(children.head, litInt(children(1), "char_ngrams"))))
    ext.injectFunction((
      FunctionIdentifier("bucket_counts"),
      new ExpressionInfo(classOf[BucketCountsExpr].getName, "bucket_counts"),
      (children: Seq[Expression]) =>
        BucketCountsExpr(children.head, litInt(children(1), "bucket_counts"))))
    // multi_match(text, array('p1', 'p2', ...)): the pattern list builds
    // the driver-side Aho–Corasick automaton, so it must fold to literals
    ext.injectFunction((
      FunctionIdentifier("multi_match"),
      new ExpressionInfo(classOf[MultiMatchExpr].getName, "multi_match"),
      (children: Seq[Expression]) => {
        require(children.length == 2 && children(1).foldable,
          "multi_match patterns must be a literal array of strings")
        val arr = children(1).eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val pats = (0 until arr.numElements())
          .map(i => arr.getUTF8String(i).toString)
        MultiMatchExpr(children.head, pats)
      }))
    ext.injectOptimizerRule(_ => PruneLevenshteinFilters)
  }
}
