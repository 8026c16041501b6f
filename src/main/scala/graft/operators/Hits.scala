package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg 1999) over a bipartite edge
  * list — PageRank's sibling for bipartite intent: hub scores rank
  * the left side by how much it links to authoritative right nodes,
  * authority scores the converse. Normalization is L1 in exact
  * integer `unit` units — each half-iteration rescales raw sums as
  * (raw · unit) DIV Σraw — where the textbook L2 sqrt would need a
  * cross-engine rounding contract; L1 vs L2 differ only by a positive
  * global factor, so the ranking is identical.
  *
  * Scale shape (100 TB posture): per half-iteration ONE keyed join +
  * map-side-combined sum over the edge list (O(edges) work, one
  * shuffle on the scored side's key), the global Σ a broadcast
  * single-row crossJoin; node state lives in DataFrames, never on the
  * driver. The edge list should be localCheckpointed by the caller
  * when it is derived (all 2·iters half-iterations re-read it).
  *
  * Overflow honesty under Spark 4 ANSI: a raw sum is bounded by
  * unit · max-degree (each left node holds ≤ unit after rescale), so
  * with unit = 1e6 the (raw · unit) product stays inside BIGINT up to
  * ~9e6 max degree; beyond that ANSI arithmetic fails loudly rather
  * than wrapping.
  */
object Hits {

  /** One L1 rescale: raw (key, r) → (key, out) in integer units. */
  private def l1Scale(raw: DataFrame, key: String, out: String,
      unit: Long): DataFrame =
    raw.crossJoin(broadcast(raw.agg(sum(col("r")).as("t"))))
      .select(col(key), expr(s"(r * $unit) DIV t").as(out))

  /** `iters` full HITS iterations over distinct bipartite edges
    * (left, right). Returns (hubs(left, "h"), auths(right, "a")) in
    * integer `unit` units, both L1-normalized up to DIV flooring.
    */
  def iterate(edges: DataFrame, left: String, right: String,
      iters: Int, unit: Long = 1000000L): (DataFrame, DataFrame) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val lefts = edges.select(col(left)).distinct().localCheckpoint()
    // Lower bound mirroring the documented BIGINT-overflow honesty
    // contract above: `unit DIV n` floors to 0 once the distinct left
    // count exceeds `unit`, collapsing every score to 0 and making
    // l1Scale divide by Σ = 0 (ANSI error). Fail with the remedy
    // instead.
    val nLeft = lefts.count()
    require(nLeft <= unit,
      s"Hits.iterate: $nLeft distinct left nodes exceed unit=$unit — the " +
        "initial hub share would floor to 0 and all scores collapse; raise " +
        "`unit` (overflow ceiling is unit · maxDegree ≤ ~9.2e18)")
    var h = lefts
      .crossJoin(broadcast(lefts.agg(count(lit(1)).as("n"))))
      .select(col(left), expr(s"$unit DIV n").as("h"))
    var a: DataFrame = null
    // each half-iteration is localCheckpointed: the chain is read
    // TWICE per step (the keyed sum + the Σ broadcast), so a lazy
    // 2·iters-deep plan recomputes upstream 2^(2·iters) times; the
    // checkpoint is node-sized (one row per live node), the iterative
    //-graph convention PageRank/k-core already use
    for (_ <- 1 to iters) {
      a = l1Scale(
        edges.join(h, Seq(left)).groupBy(col(right))
          .agg(sum(col("h")).as("r")),
        right, "a", unit).localCheckpoint()
      h = l1Scale(
        edges.join(a, Seq(right)).groupBy(col(left))
          .agg(sum(col("a")).as("r")),
        left, "h", unit).localCheckpoint()
    }
    (h, a)
  }
}
