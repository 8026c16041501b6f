package graft.tools

import graft.GraftSession
import graft.plans.RangeJoinRewrite
import org.apache.spark.sql.functions._

/** Debug the range-join rewrite: print the rewritten logical plan
  * and each unresolved subexpression.
  */
object ProbeRewrite {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(master = "local[4]")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val points = Seq((1L, 5L), (2L, 35L)).toDF("pid", "x")
    val intervals = Seq((10L, 0L, 40L)).toDF("iid", "lo", "hi")
    val df = points.join(intervals, $"x" >= $"lo" && $"x" <= $"hi").select("pid", "iid")
    val analyzed = df.queryExecution.optimizedPlan
    val rule = RangeJoinRewrite(spark)
    val rewritten = rule(analyzed)
    println("=== rewritten ===")
    println(rewritten.treeString)
    println("resolved=" + rewritten.resolved)
    rewritten.foreach { node =>
      if (!node.resolved) {
        println(s"UNRESOLVED NODE: ${node.nodeName}: ${node.simpleString(200)}")
        node.expressions.foreach { e =>
          e.foreach { sub =>
            if (!sub.resolved) println(s"  unresolved expr: ${sub.getClass.getSimpleName}: $sub")
          }
        }
      }
    }
    spark.stop()
  }
}
