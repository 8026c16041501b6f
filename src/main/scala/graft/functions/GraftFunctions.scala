package graft.functions

import org.apache.spark.sql.SparkSession
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

  private def quantileArg(e: Expression): Double = e.eval(null) match {
    case d: Double => d
    case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    case other => other.toString.toDouble
  }

  val injections: Seq[Injection] = Seq(
    (FunctionIdentifier("fingerprint64"),
      new ExpressionInfo(classOf[Fingerprint64].getName, "fingerprint64"),
      (exprs: Seq[Expression]) => Fingerprint64(exprs.head)),
    (FunctionIdentifier("fmix64"),
      new ExpressionInfo(classOf[Fmix64].getName, "fmix64"),
      (exprs: Seq[Expression]) => Fmix64(exprs.head)),
    (FunctionIdentifier("bottomk_sample"),
      new ExpressionInfo(classOf[BottomKSample].getName, "bottomk_sample"),
      (exprs: Seq[Expression]) => BottomKSample(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue()).toAggregateExpression()),
    (FunctionIdentifier("hll_distinct"),
      new ExpressionInfo(classOf[HllSketch].getName, "hll_distinct"),
      (exprs: Seq[Expression]) => HllSketch(exprs.head).toAggregateExpression()),
    (FunctionIdentifier("tdigest_quantile"),
      new ExpressionInfo(classOf[TDigestQuantile].getName, "tdigest_quantile"),
      (exprs: Seq[Expression]) =>
        TDigestQuantile(exprs.head, quantileArg(exprs(1))).toAggregateExpression()),
    (FunctionIdentifier("count_min"),
      new ExpressionInfo(classOf[CountMinAgg].getName, "count_min"),
      (exprs: Seq[Expression]) => CountMinAgg(exprs.head).toAggregateExpression()),
    (FunctionIdentifier("cms_lookup"),
      new ExpressionInfo(classOf[CmsLookup].getName, "cms_lookup"),
      (exprs: Seq[Expression]) => CmsLookup(exprs.head, exprs(1))),
    (FunctionIdentifier("bloom_filter"),
      new ExpressionInfo(classOf[BloomAgg].getName, "bloom_filter"),
      (exprs: Seq[Expression]) => BloomAgg(exprs.head).toAggregateExpression()),
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (exprs: Seq[Expression]) => BloomMightContain(exprs.head, exprs(1))),
    (FunctionIdentifier("token_pairs"),
      new ExpressionInfo(classOf[TokenPairs].getName, "token_pairs"),
      (exprs: Seq[Expression]) => TokenPairs(exprs.head)),
    (FunctionIdentifier("token_repetition_stats"),
      new ExpressionInfo(classOf[TokenRepetitionStats].getName, "token_repetition_stats"),
      (exprs: Seq[Expression]) => TokenRepetitionStats(exprs.head)),
    (FunctionIdentifier("token_entropy_stats"),
      new ExpressionInfo(classOf[TokenEntropyStats].getName, "token_entropy_stats"),
      (exprs: Seq[Expression]) => TokenEntropyStats(exprs.head)))

  /** Register every graft SQL function on an existing session. */
  def registerAll(spark: SparkSession): Unit =
    injections.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
}
