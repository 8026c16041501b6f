package graft

import org.apache.spark.sql.functions._

/** Plan-shape gates for the round-12 changes — each SURVEY §2 scale
  * claim asserted on the physical plan.
  */
class Round22PlanSpec extends SparkTestBase {

  // Toy wedge/oriented-edge relations driven through the EXACT
  // production closing-join builder (ZenithQueries.ccClosingJoin) —
  // the full query hides the join behind cc's localCheckpoint, so the
  // gate targets the builder directly.
  private def toyJoin(bound: Long) = {
    import spark.implicits._
    val wedges = Seq((1L, 2L, 3L), (2L, 3L, 4L)).toDF("s", "a", "b")
    val oEdges = Seq((2L, 3L), (3L, 4L)).toDF("a", "b")
    graft.queries.ZenithQueries
      .ccClosingJoin(wedges, oEdges, edgeCount = 2L, bound = bound)
  }

  test("graph_clustering_coeff closing join: broadcast UNDER the edge bound") {
    val plan = toyJoin(bound = 8000000L)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"),
      s"closing join not broadcast under the bound:\n$plan")
  }

  test("graph_clustering_coeff closing join: keyed shuffle join PAST the edge bound") {
    // bound 0 models a saturated projection where |E| exceeds the
    // broadcast budget; Spark's own size-based broadcast is disabled
    // too (the clone-scale edge list would exceed that threshold as
    // well) — the closing join must degrade to the keyed shuffle
    // join the scaladoc promises, NOT a forced broadcast.
    val priorThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = toyJoin(bound = 0L)
        .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"closing join past the bound is not a keyed shuffle join:\n$plan")
      assert(!plan.contains("BroadcastHashJoin"),
        s"closing join still broadcasts past the bound:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorThreshold)
    }
  }

  test("graph_clustering_coeff results identical in both plan modes") {
    val base = SparkEntry.queries("graph_clustering_coeff")(spark, sfDir)
      .orderBy("rnk").collect().map(_.toSeq)
    val priorThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.graft.cc.broadcastEdgeBound", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffled = SparkEntry.queries("graph_clustering_coeff")(spark, sfDir)
        .orderBy("rnk").collect().map(_.toSeq)
      assert(base.toSeq == shuffled.toSeq,
        "plan mode changed the answer — the hint gate must be plan-only")
    } finally {
      spark.conf.unset("spark.graft.cc.broadcastEdgeBound")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorThreshold)
    }
  }
}
