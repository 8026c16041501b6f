package graft.functions

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Central registry of graft's SQL-callable functions — one list
  * consumed both by `SparkSessionExtensions.injectFunction`
  * (builder-time, `graft.plans.GraftExtensions`) and by
  * [[registerAll]] (runtime, on an existing session).
  */
object GraftFunctions {

  type Injection =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** Clear analysis-time failure for malformed SQL calls — the
    * `_LEGACY_ERROR_USER_RAISED_EXCEPTION` class formats to the bare
    * message, so users see the actual problem instead of a cast NPE
    * from inside resolution.
    */
  private def fail(msg: String): Nothing =
    throw new AnalysisException(
      "_LEGACY_ERROR_USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))

  private def requireArity(name: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n)
      fail(s"$name requires exactly $n argument(s), got ${exprs.length}")

  /** A literal (foldable) scalar argument — e.g. the `k` of
    * `bottomk_sample(col, k)`. A column reference here is a user
    * error; reject it at analysis with the function name attached.
    */
  private def foldableArg(name: String, pos: Int, e: Expression): Any = {
    if (!e.foldable)
      fail(s"$name argument ${pos + 1} must be a literal, got ${e.sql}")
    val v = e.eval(null)
    if (v == null) fail(s"$name argument ${pos + 1} must not be NULL")
    v
  }

  private def intArg(name: String, pos: Int, e: Expression): Int =
    foldableArg(name, pos, e) match {
      case n @ (_: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
                _: java.lang.Long) =>
        val v = n.asInstanceOf[java.lang.Number].longValue()
        if (v < Int.MinValue || v > Int.MaxValue)
          fail(s"$name argument ${pos + 1} out of Int range: $v")
        v.toInt
      case other =>
        fail(s"$name argument ${pos + 1} must be an integer literal, " +
          s"got ${other.getClass.getSimpleName}")
    }

  private def quantileArg(name: String, pos: Int, e: Expression): Double =
    foldableArg(name, pos, e) match {
      case d: java.lang.Double => d.doubleValue()
      case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
      case n: java.lang.Number => n.doubleValue()
      case other =>
        fail(s"$name argument ${pos + 1} must be a numeric literal, " +
          s"got ${other.getClass.getSimpleName}")
    }

  val injections: Seq[Injection] = Seq(
    (FunctionIdentifier("fingerprint64"),
      new ExpressionInfo(classOf[Fingerprint64].getName, "fingerprint64"),
      (exprs: Seq[Expression]) => {
        requireArity("fingerprint64", exprs, 1)
        Fingerprint64(exprs.head)
      }),
    (FunctionIdentifier("fmix64"),
      new ExpressionInfo(classOf[Fmix64].getName, "fmix64"),
      (exprs: Seq[Expression]) => {
        requireArity("fmix64", exprs, 1)
        Fmix64(exprs.head)
      }),
    (FunctionIdentifier("bottomk_sample"),
      new ExpressionInfo(classOf[BottomKSample].getName, "bottomk_sample"),
      (exprs: Seq[Expression]) => {
        requireArity("bottomk_sample", exprs, 2)
        BottomKSample(exprs.head,
          intArg("bottomk_sample", 1, exprs(1))).toAggregateExpression()
      }),
    (FunctionIdentifier("hll_distinct"),
      new ExpressionInfo(classOf[HllSketch].getName, "hll_distinct"),
      (exprs: Seq[Expression]) => {
        requireArity("hll_distinct", exprs, 1)
        HllSketch(exprs.head).toAggregateExpression()
      }),
    (FunctionIdentifier("hll_sketch_bin"),
      new ExpressionInfo(classOf[HllSketchBin].getName, "hll_sketch_bin"),
      (exprs: Seq[Expression]) => {
        requireArity("hll_sketch_bin", exprs, 1)
        HllSketchBin(exprs.head).toAggregateExpression()
      }),
    (FunctionIdentifier("hll_union_estimate"),
      new ExpressionInfo(classOf[HllUnionEstimate].getName, "hll_union_estimate"),
      (exprs: Seq[Expression]) => {
        requireArity("hll_union_estimate", exprs, 1)
        HllUnionEstimate(exprs.head).toAggregateExpression()
      }),
    (FunctionIdentifier("bitmap_distinct"),
      new ExpressionInfo(classOf[BitmapDistinct].getName, "bitmap_distinct"),
      (exprs: Seq[Expression]) => {
        requireArity("bitmap_distinct", exprs, 2)
        val bits = intArg("bitmap_distinct", 1, exprs(1))
        BitmapDistinct(exprs.head, bits).toAggregateExpression()
      }),
    (FunctionIdentifier("tdigest_quantile"),
      new ExpressionInfo(classOf[TDigestQuantile].getName, "tdigest_quantile"),
      (exprs: Seq[Expression]) => {
        requireArity("tdigest_quantile", exprs, 2)
        TDigestQuantile(exprs.head,
          quantileArg("tdigest_quantile", 1, exprs(1))).toAggregateExpression()
      }),
    (FunctionIdentifier("count_min"),
      new ExpressionInfo(classOf[CountMinAgg].getName, "count_min"),
      (exprs: Seq[Expression]) => {
        requireArity("count_min", exprs, 1)
        CountMinAgg(exprs.head).toAggregateExpression()
      }),
    (FunctionIdentifier("cms_lookup"),
      new ExpressionInfo(classOf[CmsLookup].getName, "cms_lookup"),
      (exprs: Seq[Expression]) => {
        requireArity("cms_lookup", exprs, 2)
        CmsLookup(exprs.head, exprs(1))
      }),
    (FunctionIdentifier("bloom_filter"),
      new ExpressionInfo(classOf[BloomAgg].getName, "bloom_filter"),
      (exprs: Seq[Expression]) => {
        requireArity("bloom_filter", exprs, 1)
        BloomAgg(exprs.head).toAggregateExpression()
      }),
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (exprs: Seq[Expression]) => {
        requireArity("bloom_might_contain", exprs, 2)
        BloomMightContain(exprs.head, exprs(1))
      }),
    (FunctionIdentifier("mg_sketch"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "mg_sketch"),
      (exprs: Seq[Expression]) => {
        requireArity("mg_sketch", exprs, 2)
        val cap = intArg("mg_sketch", 1, exprs(1))
        if (cap < 1) fail(s"mg_sketch capacity must be >= 1, got $cap")
        MisraGriesAgg(exprs.head, cap).toAggregateExpression()
      }),
    (FunctionIdentifier("token_pairs"),
      new ExpressionInfo(classOf[TokenPairs].getName, "token_pairs"),
      (exprs: Seq[Expression]) => {
        requireArity("token_pairs", exprs, 1)
        TokenPairs(exprs.head)
      }),
    (FunctionIdentifier("token_repetition_stats"),
      new ExpressionInfo(classOf[TokenRepetitionStats].getName, "token_repetition_stats"),
      (exprs: Seq[Expression]) => {
        requireArity("token_repetition_stats", exprs, 1)
        TokenRepetitionStats(exprs.head)
      }),
    (FunctionIdentifier("token_entropy_stats"),
      new ExpressionInfo(classOf[TokenEntropyStats].getName, "token_entropy_stats"),
      (exprs: Seq[Expression]) => {
        requireArity("token_entropy_stats", exprs, 1)
        TokenEntropyStats(exprs.head)
      }),
    (FunctionIdentifier("cms_inner_product"),
      new ExpressionInfo(classOf[CmsInnerProduct].getName, "cms_inner_product"),
      (exprs: Seq[Expression]) => {
        requireArity("cms_inner_product", exprs, 2)
        CmsInnerProduct(exprs.head, exprs(1))
      }),
    (FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (exprs: Seq[Expression]) => {
        requireArity("winnow_fingerprints", exprs, 3)
        val k = intArg("winnow_fingerprints", 1, exprs(1))
        val w = intArg("winnow_fingerprints", 2, exprs(2))
        if (k < 1 || w < 1)
          fail(s"winnow_fingerprints k and w must be >= 1, got ($k, $w)")
        WinnowFingerprints(exprs.head, k, w)
      }))

  /** Register every graft SQL function on an existing session. */
  def registerAll(spark: SparkSession): Unit =
    injections.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
}
