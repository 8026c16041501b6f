package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the cluster
  * step real dedup needs (near-dup pairs are not transitive; the
  * canonical document is the minimum id of the whole component, not
  * of a single pair).
  *
  * Label propagation to fixpoint: every node starts as its own
  * label; each round takes the min label across neighbors; stop when
  * no label changes. The driver coordinates ROUNDS (O(component
  * diameter), typically < 5 for near-dup graphs) but every round is
  * one distributed join+aggregate — no edge list ever sits on the
  * driver. This is the standard large-graph CC shape (hash-min
  * propagation).
  */
object ConnectedComponents {

  /** @param pairs (id_a, id_b) undirected edges.
    * @param maxIter safety bound on propagation rounds. Rounds needed
    *   = max component diameter; if the bound is hit before fixpoint
    *   this THROWS rather than silently returning wrong cluster ids
    *   (chains of boilerplate near-dups can exceed small bounds).
    * @return (id, cluster_id) for every endpoint, cluster_id = min
    *         reachable id.
    */
  def clusters(pairs: DataFrame, maxIter: Int = 100): DataFrame = {
    val edges = pairs.select(col("id_a").as("s"), col("id_b").as("t"))
      .union(pairs.select(col("id_b").as("s"), col("id_a").as("t")))
      .distinct()
      .cache()
    var labels = edges.select(col("s").as("id")).distinct()
      .withColumn("label", col("id"))
      .cache()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrLabels = edges
        .join(labels.withColumnRenamed("id", "t2"), col("t") === col("t2"))
        .select(col("s").as("id"), col("label"))
      val next = labels.select(col("id"), col("label")).union(nbrLabels)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .cache()
      val changed = next
        .join(labels.withColumnRenamed("label", "_old"), "id")
        .filter(col("label") < col("_old")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
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
}
