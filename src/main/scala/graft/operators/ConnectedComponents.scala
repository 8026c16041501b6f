package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Connected components over an undirected pair list — the cluster
  * step real dedup needs (near-dup pairs are not transitive; the
  * canonical document is the minimum id of the whole component, not
  * of a single pair).
  *
  * Label propagation to fixpoint: every node starts as its own
  * label; each round takes the min label across neighbors; stop when
  * no label changes. The driver coordinates ROUNDS (O(component
  * diameter), typically < 5 for near-dup graphs) but every round is
  * EXACTLY ONE distributed job: the self row carries the previous
  * label through the neighbor union, so the same aggregation that
  * produces the new labels also knows whether each one changed; a
  * LongAccumulator tallies the changes while the round's result is
  * materialized by `localCheckpoint(eager = true)`. The checkpoint
  * also truncates lineage so round N+1 plans against materialized
  * blocks, not an N-deep chain of joins — the per-round cost stays
  * flat no matter how many rounds a deep component needs. No edge
  * list ever sits on the driver. This is the standard large-graph CC
  * shape (hash-min propagation).
  */
object ConnectedComponents {

  /** @param pairs (id_a, id_b) undirected edges; ids must be integral
    *   (they are cast to long — cluster ids are min-reachable ids).
    * @param maxIter safety bound on propagation rounds. Rounds needed
    *   = max component diameter; if the bound is hit before fixpoint
    *   this THROWS rather than silently returning wrong cluster ids
    *   (chains of boilerplate near-dups can exceed small bounds).
    * @return (id, cluster_id) for every endpoint, cluster_id = min
    *         reachable id.
    */
  def clusters(pairs: DataFrame, maxIter: Int = 100): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs
      .select(col("id_a").cast(LongType).as("s"), col("id_b").cast(LongType).as("t"))
      .union(pairs.select(col("id_b").cast(LongType).as("s"), col("id_a").cast(LongType).as("t")))
      .distinct()
      // Materialize once: every round joins against this; checkpoint
      // severs the (possibly expensive) upstream near-dup lineage.
      .localCheckpoint(true)
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("label", LongType, nullable = false)))
    val enc = Encoders.row(outSchema)

    var labels = edges.select(col("s").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // Self rows carry the previous label in `old`; neighbor rows
      // carry null. min() ignores nulls, so one aggregation yields
      // both the new label and the label it replaced.
      val selfRows = labels.select(col("id"), col("label"), col("label").as("old"))
      val nbrRows = edges
        .join(labels.withColumnRenamed("id", "t2"), col("t") === col("t2"))
        .select(col("s").as("id"), col("label"), lit(null).cast(LongType).as("old"))
      val agg = selfRows.union(nbrRows)
        .groupBy(col("id"))
        .agg(min(col("label")).as("label"), min(col("old")).as("old"))
      // Accumulator-only convergence signal: a task retry can only
      // re-add for rows that genuinely changed, so value == 0 is an
      // exact fixpoint test. The checkpoint below is the round's one
      // and only action.
      val changedAcc = spark.sparkContext.longAccumulator(s"cc_changed_$iter")
      val next = agg.map { r =>
        val label = r.getLong(1)
        if (label < r.getLong(2)) changedAcc.add(1L)
        Row(r.getLong(0), label)
      }(enc).localCheckpoint(true)
      // blocking: the next round's join ramps up immediately — async
      // eviction lets superseded corpus-scale frontiers pile up in
      // the BlockManager (observed as a heap OOM on a 100× corpus
      // when earlier queries' state was still draining).
      labels.unpersist(blocking = true)
      labels = next
      converged = changedAcc.value == 0L
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents did not converge in $maxIter rounds — " +
          "component diameter exceeds the bound; raise maxIter " +
          "(each round is one distributed join+aggregate)")
    edges.unpersist()
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Components of a clone-collapsed (quotient) graph, expanded back
    * to member level — the scale spelling for clique-heavy dedup
    * graphs, where running [[clusters]] on the re-expanded pair set
    * costs c²/2 edges per c-clone group (see
    * MinHashLSH.nearDupGraph).
    *
    * @param repPairs (id_a, id_b) edges BETWEEN group representatives
    * @param groups (rep_id, member_id) — every node mapped to its
    *   clone-group representative; reps map to themselves. Each rep
    *   must be its group's MINIMUM member id (MinHashLSH's contract) —
    *   that is what makes the quotient min-label equal the expanded
    *   min-label.
    * @return (id, cluster_id) for every member that belongs to some
    *   expanded pair: its rep has a cross edge, or its group has ≥ 2
    *   members. Identical to `clusters(expandedPairs)` by the
    *   quotient argument.
    */
  def clustersFromQuotient(repPairs: DataFrame, groups: DataFrame,
      maxIter: Int = 100): DataFrame = {
    val repClusters = clusters(repPairs, maxIter)
      .withColumnRenamed("id", "rep_id")
    val sizes = groups.groupBy(col("rep_id")).agg(count(lit(1)).as("_gsz"))
    groups.join(sizes, "rep_id")
      .join(repClusters, Seq("rep_id"), "left")
      .filter(col("cluster_id").isNotNull || col("_gsz") > 1)
      .select(col("member_id").as("id"),
        coalesce(col("cluster_id"), col("rep_id")).as("cluster_id"))
  }
}
