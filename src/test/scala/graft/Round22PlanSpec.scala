package graft

import org.apache.spark.sql.functions._

/** Plan-shape and equivalence gates for the triangle machinery —
  * round 13 replaced the wedge self-join + closing join with the
  * TriangleBitset kernel (broadcast bitset adjacency + per-edge
  * popcount), so the gates now pin:
  *   1. hand-solved per-node triangle counts on a toy graph,
  *   2. the per-edge path is TWO BroadcastHashJoins (the bitset
  *      table is ≤16,381 rows by construction — no shuffle join,
  *      no conditional bound needed),
  *   3. kernel output == the r12 wedge-join spelling, replayed
  *      inline over the real sf test data.
  */
class Round22PlanSpec extends SparkTestBase {
  import graft.operators.TriangleBitset

  // Toy graph: K4 on {1,2,3,4} plus pendant 5—1 plus edge 6—7.
  // Triangles: the four K4 faces — node 1,2,3,4 each sit in 3;
  // 5,6,7 in none. Total 4.
  private def toyEdges = {
    import spark.implicits._
    Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (6L, 7L)).toDF("u", "v")
  }

  test("TriangleBitset: hand-solved per-node and global counts on the toy graph") {
    val e = toyEdges
    val deg = TriangleBitset.degrees(e)
    val o = TriangleBitset.orient(e, deg)
    val adj = TriangleBitset.outBitsets(o)
    val perNode = TriangleBitset.perNodeTriangles(
        TriangleBitset.edgesWithWitnesses(o, adj))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perNode == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"per-node triangle counts wrong: $perNode")
    val total = TriangleBitset.triangleCount(o, adj).collect()(0).getLong(0)
    assert(total == 4L, s"global triangle count wrong: $total")
  }

  test("TriangleBitset: per-edge path is broadcast-joined, never shuffle-joined") {
    val e = toyEdges
    val deg = TriangleBitset.degrees(e)
    val o = TriangleBitset.orient(e, deg)
    val adj = TriangleBitset.outBitsets(o).localCheckpoint()
    val plan = TriangleBitset.edgesWithWitnesses(o, adj)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"),
      s"per-edge bitset lookup is not a broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"per-edge path shuffles the bitset table:\n$plan")
  }

  test("graph_clustering_coeff: bitset kernel == the r12 wedge-join spelling on sf data") {
    // The r12 implementation, replayed inline: wedge self-join on the
    // oriented edges + closing join, per-node counts from the s/a/b
    // union — the oracle-equivalent reference the kernel replaced.
    val items = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"),
        (col("l_partkey") % TriangleBitset.Nodes).as("node"))
      .distinct()
    val e = items.as("a").join(items.as("b"),
        col("a.ok") === col("b.ok") && col("a.node") < col("b.node"))
      .select(col("a.node").as("u"), col("b.node").as("v"))
      .distinct().localCheckpoint()
    val deg = TriangleBitset.degrees(e)
    val oRef = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("dv"))
          .otherwise(col("du")).as("ddeg"))
      .localCheckpoint()
    val wedges = oRef.as("x").join(oRef.as("y"),
        col("x.src") === col("y.src") &&
          (col("x.ddeg") < col("y.ddeg") ||
            (col("x.ddeg") === col("y.ddeg") && col("x.dst") < col("y.dst"))))
      .select(col("x.src").as("s"), col("x.dst").as("a"), col("y.dst").as("b"))
    val triRef = wedges
      .join(oRef.select(col("src").as("a"), col("dst").as("b")), Seq("a", "b"))
      .select(col("s"), col("a"), col("b"))
    val tnRef = triRef.select(col("s").as("node"))
      .unionAll(triRef.select(col("a").as("node")))
      .unionAll(triRef.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("tri"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val o = TriangleBitset.orient(e, deg).localCheckpoint()
    val adj = TriangleBitset.outBitsets(o).localCheckpoint()
    val tn = TriangleBitset.perNodeTriangles(
        TriangleBitset.edgesWithWitnesses(o, adj))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tn == tnRef,
      s"bitset per-node counts diverge from the wedge-join reference " +
        s"(kernel ${tn.size} nodes, reference ${tnRef.size})")
    val total = TriangleBitset.triangleCount(o, adj).collect()(0).getLong(0)
    val totalRef = tnRef.valuesIterator.sum / 3
    assert(total == totalRef, s"global count $total != reference $totalRef")
  }
}
