package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dump the final physical plan + timing of one query at a given sf. */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.build()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dir)
    val t0 = System.nanoTime()
    df.collect()
    println(f"[probe] $name took ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
