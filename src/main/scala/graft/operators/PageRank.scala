package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative PageRank over an edge table — the graph-RANKING
  * companion to [[ConnectedComponents]] (clustering): entity
  * importance over a relationship graph (customer↔supplier here; at
  * corpus scale, document-link or citation graphs for curation
  * weighting).
  *
  * Exact-integer spelling: ranks live in MICRO-units (1e6 = mass 1)
  * and every step is integer arithmetic — init = 1e6 div N, per-edge
  * contribution = pr div outdeg, damping = (85 · Σ) div 100 plus a
  * teleport constant 150000 div N. Integer sums are order-independent
  * and floor division on non-negative integers is identical in every
  * engine, so a fixed-iteration run is replayable closed-form by an
  * external SQL oracle (the `kmeans_iterations` convention, without
  * even needing rounding decimals). The deterministic floor losses
  * (mass leaks a few micro-units per node per round) are irrelevant
  * to ranking and documented here by design.
  *
  * Scale shape: one keyed self-join per iteration (contributions
  * grouped by destination, map-side combined) over an edge table
  * partitioned by source — O(edges) per round, no windows, node
  * state never leaves the cluster. Iterations materialize via
  * cache+count exactly like [[KMeans]]'s Lloyd loop.
  */
object PageRank {

  /** @param edges two LONG columns (srcCol, dstCol); treated as given
    *   (direct the graph — or union both directions — upstream).
    *   Nodes are defined as the vertices appearing in `edges`.
    * @return (node: LONG, pr_micro: LONG) after `iterations` rounds.
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 2, dampingPct: Int = 85): DataFrame = {
    // Checkpoint the EDGE table, not just the node set: every
    // iteration's materialization re-executes the edge lineage (for
    // graph_pagerank, an orders⋈lineitem join + distinct) otherwise —
    // ~2 recomputations per round. Joins below are keyed large-side
    // joins, so the checkpoint's loss of size statistics costs
    // nothing here (contrast the recall gate's broadcast-dependent
    // corpus, which must NOT be checkpointed).
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "PageRank.run: empty edge table — no nodes to rank")
    // outdeg is a STATIC property of the edge table — fold it into
    // the checkpointed edges ONCE instead of re-joining it to the
    // contribution stream every round (one keyed join + one shuffle
    // saved per iteration; at ×10 scale the avoidable outdeg join
    // was the single largest per-round cost).
    val outdeg = e0.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val e = e0.join(outdeg, "src").localCheckpoint()
    val teleport = 150000L / n // (1 − d) in micro-units, floor
    var pr = nodes.select(col("node"), lit(1000000L / n).as("pr"))
    var i = 0
    while (i < iterations) {
      val contrib = pr.join(e, pr("node") === e("src"))
        // DIV, not `/`: Spark's / on longs is DOUBLE division — the
        // whole point here is exact integer floor arithmetic
        .select(col("dst").as("node"), expr("pr DIV outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"($dampingPct * coalesce(in_mass, CAST(0 AS BIGINT))) DIV 100"))
            .as("pr"))
        .cache()
      next.count()
      if (i > 0) pr.unpersist(blocking = true)
      pr = next
      i += 1
    }
    pr.select(col("node"), col("pr").as("pr_micro"))
  }

  /** PERSONALIZED PageRank (Page et al. 1999 §6 / Jeh & Widom 2003):
    * the teleport mass returns to a SEED set instead of spreading
    * uniformly, so ranks measure proximity TO THE SEEDS — the
    * recommendation/similar-entities primitive one global PageRank
    * score cannot express. Same exact-integer micro-unit spelling as
    * [[run]]: init = 1e6 div |S| on seeds (0 elsewhere), teleport =
    * 150000 div |S| on seeds (0 elsewhere), damping (85·Σ) div 100.
    * Non-seed sinks decay toward 0 unless reachable from the seeds —
    * by construction, not by normalization.
    *
    * Scale shape identical to [[run]]: the seed FLAG is folded into
    * the checkpointed node table once (seeds are a model-sized or
    * keyed relation, never collected), one keyed join per iteration.
    *
    * @param seeds one LONG column `node`; deduplicated here.
    */
  def runPersonalized(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, iterations: Int = 2,
      dampingPct: Int = 85): DataFrame = {
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val seedSet = seeds.select(col("node")).distinct()
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct()
      .join(seedSet.withColumn("is_seed", lit(true)), Seq("node"), "left")
      .select(col("node"), coalesce(col("is_seed"), lit(false))
        .as("is_seed"))
      .localCheckpoint()
    val ns = nodes.filter(col("is_seed")).count()
    require(ns > 0, "PageRank.runPersonalized: no seed appears in the graph")
    val outdeg = e0.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val e = e0.join(outdeg, "src").localCheckpoint()
    var pr = nodes.select(col("node"), col("is_seed"),
      when(col("is_seed"), lit(1000000L / ns)).otherwise(lit(0L)).as("pr"))
    var i = 0
    while (i < iterations) {
      val contrib = pr.join(e, pr("node") === e("src"))
        .select(col("dst").as("node"), expr("pr DIV outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), col("is_seed"),
          (when(col("is_seed"), lit(150000L / ns)).otherwise(lit(0L)) +
            expr(s"($dampingPct * coalesce(in_mass, CAST(0 AS BIGINT))) DIV 100"))
            .as("pr"))
        .cache()
      next.count()
      if (i > 0) pr.unpersist(blocking = true)
      pr = next
      i += 1
    }
    pr.select(col("node"), col("is_seed"), col("pr").as("ppr_micro"))
  }
}
