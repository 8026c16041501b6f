package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a pure-inequality point-in-interval inner
  * join into a bucketed equi-join.
  *
  * A join whose only condition is `p >= lo AND p <= hi` (with p from
  * one side and lo/hi from the other) has no equi-keys, so Spark
  * plans a BroadcastNestedLoopJoin — O(|L|·|R|) comparisons. This
  * rule injects a synthetic bucket key on both sides (intervals
  * explode into the fixed-width buckets they cover; points compute
  * their single covering bucket) and re-joins on it, keeping the
  * original predicate as a refinement. The physical plan becomes a
  * shuffle/broadcast HASH join — the difference between "dies at
  * 100 TB" and "one keyed exchange".
  *
  * The user writes the naive declarative join; the engine picks the
  * scalable plan — the Spark-first way to add an operator the
  * optimizer doesn't know (same mechanism as
  * `graft.operators.RangeJoin`, but transparent).
  *
  * Enable per session:
  *   `RangeJoinRewrite.enable(spark)`                   (runtime) or
  *   `.withExtensions(new graft.plans.GraftExtensions)` (builder).
  * Bucket width: `spark.graft.rangejoin.bucketWidth` (default 1024,
  * in point-column units; pick ≈ the typical interval span).
  */
case class RangeJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def bucketWidth: Long =
    spark.conf.get("spark.graft.rangejoin.bucketWidth", "1024").toLong

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType => true
    case _ => false
  }

  private def from(plan: LogicalPlan, e: Expression): Boolean =
    e.references.nonEmpty && e.references.subsetOf(plan.outputSet)

  /** Matches (p >= lo AND p <= hi) with any comparator orientation
    * and the point on either side of the join. Each conjunct is
    * canonicalized to an `x >= y` fact; the pattern is
    * fact1 = (p, lo), fact2 = (hi, p).
    */
  private def extract(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    def geFact(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(a, b) => Some((a, b)) // a >= b
      case LessThanOrEqual(a, b) => Some((b, a))    // a <= b ≡ b >= a
      case _ => None
    }
    def point(p: Expression, lo: Expression, hi: Expression) = {
      if (!(isIntegral(p) && isIntegral(lo) && isIntegral(hi))) None
      else if (from(left, p) && from(right, lo) && from(right, hi)) Some((p, lo, hi, true))
      else if (from(right, p) && from(left, lo) && from(left, hi)) Some((p, lo, hi, false))
      else None
    }
    cond match {
      case And(a, b) =>
        (geFact(a), geFact(b)) match {
          case (Some((x1, y1)), Some((x2, y2))) if x1.semanticEquals(y2) =>
            point(p = x1, lo = y1, hi = x2)
          case (Some((x1, y1)), Some((x2, y2))) if x2.semanticEquals(y1) =>
            point(p = x2, lo = y2, hi = x1)
          case _ => None
        }
      case _ => None
    }
  }

  /** floor(e / w) as a long — pure integer arithmetic (truncating
    * division corrected when the remainder is negative). A
    * double-based floor would lose precision at |v| ≥  2^53, landing a
    * point and its containing interval in different buckets and
    * silently pruning the pair before the re-check predicate runs.
    */
  private def bucketOf(e: Expression, w: Long): Expression = {
    val el = Cast(e, LongType)
    val lw = Literal(w)
    val q = IntegralDivide(el, lw)
    val r = Remainder(el, lw)
    If(LessThan(r, Literal(0L)), Subtract(q, Literal(1L)), q)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if extract(cond, left, right).isDefined =>
      val (p, lo, hi, pointOnLeft) = extract(cond, left, right).get
      val w = bucketWidth
      val (pointPlan, intervalPlan) = if (pointOnLeft) (left, right) else (right, left)

      val pBucket = Alias(bucketOf(p, w), "_graft_pbucket")()
      val pointProj = Project(pointPlan.output :+ pBucket, pointPlan)

      // Sequence is TimeZoneAwareExpression: a concrete zone id is
      // required for it to count as resolved, even over longs
      val loB = bucketOf(lo, w)
      val hiB = bucketOf(hi, w)
      val rawSeq = Sequence(loB, hiB, Some(Literal(1L)),
        Some(spark.sessionState.conf.sessionLocalTimeZone))
      // Guards Sequence can't provide itself:
      //  - lo > hi matched nothing under BNLJ; unguarded it would
      //    throw "illegal sequence" at runtime → emit an empty array;
      //  - a span of vastly more than maxSpanBuckets means the bucket
      //    width is misconfigured for the data → raise a targeted
      //    error instead of Sequence's opaque too-long failure.
      val maxSpan = spark.conf
        .get("spark.graft.rangejoin.maxSpanBuckets", "4194304").toLong
      val seqExpr = If(
        GreaterThan(loB, hiB),
        Literal.create(Array.empty[Long], rawSeq.dataType),
        If(
          GreaterThan(Subtract(hiB, loB), Literal(maxSpan)),
          Cast(RaiseError(Literal.create(
            s"graft range-join rewrite: interval spans more than $maxSpan buckets " +
              s"(bucketWidth=$w); raise spark.graft.rangejoin.bucketWidth or " +
              "spark.graft.rangejoin.maxSpanBuckets",
            org.apache.spark.sql.types.StringType)), rawSeq.dataType),
          rawSeq))
      val generator = Explode(seqExpr)
      val elem = generator.elementSchema.head
      val iBucketAttr =
        AttributeReference("_graft_ibucket", elem.dataType, elem.nullable)()
      val intervalGen = Generate(
        generator, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(iBucketAttr), child = intervalPlan)

      val equi = EqualTo(pBucket.toAttribute, iBucketAttr)
      val (newLeft, newRight) =
        if (pointOnLeft) (pointProj, intervalGen) else (intervalGen, pointProj)
      val rejoined = Join(newLeft, newRight, Inner, Some(And(equi, cond)), hint)
      Project(j.output, rejoined)
  }
}

/** SparkSessionExtensions hook: injects the range-join rewrite and
  * registers graft's SQL functions for `.withExtensions(...)` use.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(session => RangeJoinRewrite(session))
    graft.functions.GraftFunctions.injections.foreach(e.injectFunction)
  }
}

object RangeJoinRewrite {
  /** Runtime activation on an existing session (experimental-methods
    * hook, same effect as builder-time withExtensions).
    */
  def enable(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[RangeJoinRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite(spark)

  def disable(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RangeJoinRewrite])
}
