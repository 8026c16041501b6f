package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression converters, so graft
  * can expose custom Catalyst expressions through the public Column
  * API (the same accessor pattern third-party Spark extensions use).
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over a custom LogicalPlan (Dataset.ofRows accessor —
    * what a custom whole-operator API needs to hand its plan back to
    * the session).
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame (resolved attributes). */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Total shuffle bytes written by an ALREADY-EXECUTED DataFrame's
    * plan — read from the exchange nodes' SQL metrics, descending
    * through AQE's adaptive plan and query stages. The observable
    * that proves a shuffle-key redesign (e.g. fingerprint vs full-text
    * dedup keys) actually moves fewer bytes.
    */
  def shuffleBytesWritten(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val seen = scala.collection.mutable.HashSet.empty[SparkPlan]
    def walk(p: SparkPlan): Long = {
      if (!seen.add(p)) 0L
      else {
        val self = p match {
          case e: ShuffleExchangeLike =>
            e.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)
          case _ => 0L
        }
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case o => o.children
        }
        self + kids.map(walk).sum
      }
    }
    walk(df.queryExecution.executedPlan)
  }
}
