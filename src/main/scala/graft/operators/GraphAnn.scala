package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Navigable-graph ANN — the HNSW-family search shape (Malkov &
  * Yashunin, TPAMI 2020) re-expressed relationally: a bounded-degree
  * neighbor graph is a RELATION (u, w), and greedy beam search is a
  * FIXED number of (beam ⋈ adjacency) keyed joins with a bounded-heap
  * top-B between hops — no mutable graph object, no per-query driver
  * loop, every hop a declarative plan.
  *
  * Differences from literal HNSW, chosen for engine-shape honesty:
  *  - single layer (NSW): the hierarchy's log-factor matters at
  *    billion-node in-RAM graphs; on an engine the hop count is the
  *    bounded `hops` parameter and each hop is one shuffle-free
  *    broadcast join against the adjacency relation;
  *  - construction is multi-probe-LSH-bucketed with FIBONACCI-STRIDED
  *    edge ranks (see [[defaultRanks]] — the deterministic stand-in
  *    for HNSW's multi-scale links; a plain kNN graph collapses into
  *    mutual-nearest cliques that strand the beam), symmetrized by
  *    union — deterministic and replayable, where HNSW's
  *    insert-order graph is not. At corpus scale this is the
  *    NN-descent-class build cost: pairs within probed buckets,
  *    ~n²·(planes+1)/2^planes total, run sharded per bucket — the
  *    documented build-side floor every graph-ANN method pays
  *    (vs IVF's train-then-assign linear build);
  *  - search is DETERMINISTIC end to end: entry set = the `entries`
  *    lowest-id nodes (the ann_ivf_topk codebook convention), beam
  *    keeps top-`beam` by (6dp cosine DESC, id), hops are exactly
  *    `hops` rounds of expand-score-prune, results the top-`k` of the
  *    final frontier — closed-form replayable in SQL (the
  *    ann_graph_topk oracle replays buckets, graph, and every hop).
  *
  * Scale posture: the adjacency is 2·degree rows/node (a persisted
  * relation, partitionable by u); each hop touches ≤ |Q|·beam·degree
  * candidate rows — the navigable-graph promise that search cost is
  * independent of corpus size; the beam relation never exceeds
  * |Q|·beam rows and stays broadcast-side.
  */
object GraphAnn {

  private def asDouble(c: org.apache.spark.sql.Column) = c.cast("array<double>")

  /** Per-node out-edge ranks: Fibonacci-strided instead of a plain
    * top-k prefix. A pure top-`degree` kNN graph collapses into
    * mutual-nearest CLIQUES (each near-dup group's top-8 are each
    * other), leaving almost no inter-clique links — greedy beam
    * search stalls inside the entry clique (measured on the
    * 16-cluster mixture: plain top-8 → 0.32 recall, and more
    * degree/beam/hops plateaued at 0.54). Taking candidate ranks
    * 1,2,3,4,5,8,13,…,144 keeps the same edge BUDGET but spends the
    * tail on progressively longer-range neighbors — the multi-scale
    * links HNSW gets from its insertion-order hierarchy and NSW from
    * random insertion, here deterministic and SQL-replayable (rank ∈
    * a literal list). Measured: 0.93 recall at beam 16/hops 3, 1.00
    * at beam 24/hops 6 on the same mixture.
    */
  val defaultRanks: Seq[Int] = Seq(1, 2, 3, 4, 5, 8, 13, 21, 34, 55, 89, 144)

  /** Bounded-degree navigable graph: per node the neighbors at
    * Fibonacci-strided candidate ranks (by 6dp cosine DESC, id — see
    * [[defaultRanks]]) among MULTI-PROBE LSH candidates — the node's
    * own sign-bucket plus every Hamming-1 neighbor bucket (the
    * lshTopK probe convention applied to the BUILD: a tight cluster
    * straddling a hyperplane fragments across buckets, and
    * same-bucket-only edges leave the fragments unbridged).
    * Symmetrized by union (in-edges make the graph navigable INTO
    * well-connected nodes — the NSW trick that rescues recall when a
    * node's own out-edges are parochial). Returns (u, w) edges,
    * degree ≤ 2·|ranks| per node.
    */
  def buildGraph(corpus: DataFrame, idCol: String, vecCol: String,
      ranks: Seq[Int] = defaultRanks, planes: Int = 6,
      dim: Int = 64): DataFrame = {
    val c = VectorOps.withLshBucket(
      corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v")), "v", planes, dim)
    val probes = lit(0L) +: (0 until planes).map(j => lit(1L << j))
    val left = c.select(col("id").as("u"), col("v").as("vu"), col("bucket"))
      .withColumn("pbucket",
        explode(array(probes.map(p => col("bucket").bitwiseXOR(p)): _*)))
      .drop("bucket")
    val cand = left
      .join(c.select(col("id").as("w"), col("v").as("vw"),
        col("bucket").as("pbucket")), Seq("pbucket"))
      .filter(col("u") =!= col("w"))
      .select(col("u"), col("w"),
        round(VectorOps.dot(col("vu"), col("vw"))
          / (VectorOps.norm(col("vu")) * VectorOps.norm(col("vw"))), 6)
          .as("cosine"))
    val outE = graft.plans.TopK.perKey(cand, Seq("u"),
        Seq(("cosine", false), ("w", true)), ranks.max)
      .filter(col("rnk").isin(ranks.map(_.asInstanceOf[Any]): _*))
      .select(col("u"), col("w"))
    outE.unionByName(outE.select(col("w").as("u"), col("u").as("w"))).distinct()
  }

  /** Greedy beam search over a prebuilt graph. `queries` rows search
    * for their `k` nearest corpus ids (self excluded). Output:
    * (query_id, id, cosine, rnk ≤ k) — the shared ANN result schema.
    */
  def searchTopK(corpus: DataFrame, graph: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10, beam: Int = 16,
      hops: Int = 3, entries: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))
    val q = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qnrm", VectorOps.norm(col("qv")))
    // entry set: the `entries` lowest ids, every query starts there
    val entry = c.filter(col("id") < entries).select(col("id"))
    var beamDf = broadcast(q.select(col("query_id")))
      .crossJoin(broadcast(entry))
      .localCheckpoint()
    var scored: DataFrame = null
    for (_ <- 1 to hops) {
      val frontier = beamDf
        .unionByName(
          beamDf.join(graph, beamDf("id") === graph("u"))
            .select(col("query_id"), col("w").as("id")))
        .distinct()
      scored = frontier
        .filter(col("query_id") =!= col("id"))
        .join(c, Seq("id"))
        .join(broadcast(q), Seq("query_id"))
        .select(col("query_id"), col("id"),
          round(VectorOps.dot(col("qv"), col("v"))
            / (col("qnrm") * col("nrm")), 6).as("cosine"))
      beamDf = graft.plans.TopK.perKey(scored, Seq("query_id"),
          Seq(("cosine", false), ("id", true)), beam)
        .select(col("query_id"), col("id"))
        .localCheckpoint() // ≤ |Q|·beam rows; cuts the hop-on-hop lineage
    }
    // final ranking: the last hop's scored frontier cut at k (beam ≥ k
    // so this is exactly "top-k of the final beam")
    graft.plans.TopK.perKey(scored, Seq("query_id"),
      Seq(("cosine", false), ("id", true)), k)
  }

  /** Build + search in one call (the registered-query shape). */
  def graphTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 10, ranks: Seq[Int] = defaultRanks,
      beam: Int = 24, hops: Int = 4, planes: Int = 6, entries: Int = 8,
      dim: Int = 64): DataFrame = {
    require(beam >= k, s"GraphAnn: beam $beam must be >= k $k")
    val g = buildGraph(corpus, idCol, vecCol, ranks, planes, dim)
      .localCheckpoint() // read once per hop — never rebuilt
    searchTopK(corpus, g, queries, idCol, vecCol, k, beam, hops, entries)
  }
}
