package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative Lloyd k-means over an embedding column — the
  * batch-clustering operator a corpus pipeline uses for topic
  * bucketing, IVF codebook training, and diversity sampling.
  *
  * Deterministic: centroids init from the k lowest-id vectors; ties
  * in assignment break on centroid id. Each iteration is two
  * distributed passes — assignment (broadcast centroids × one corpus
  * scan, fused `ArrayDot` distances) and M-step (posexplode + keyed
  * elementwise avg). The driver holds only k centroid vectors
  * (k × dim doubles), never data rows; iterations are O(scan) at any
  * corpus size.
  */
object KMeans {

  /** @param roundTo when set, distances and updated centroid values
    *   are re-quantized to this many decimal places each round — the
    *   cross-engine deterministic mode (identical rounded rationals in
    *   any engine that sums dot products left-to-right, so an external
    *   SQL oracle can replay the iterations exactly; see the
    *   `kmeans_iterations` query). None = full double precision.
    * @param keepVectors when true, assignments also carry the vector
    *   column `v` — for consumers whose next stage needs the
    *   embedding per assignment (e.g. within-cluster pair joins)
    *   without re-joining the corpus.
    * @return (assignments: (id, cluster) — plus `v` when keepVectors —
    *   centroids: (cluster, centroid array))
    */
  def fit(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      iterations: Int = 5, roundTo: Option[Int] = None,
      keepVectors: Boolean = false): (DataFrame, DataFrame) = {
    val spark = vecs.sparkSession
    import spark.implicits._

    def rnd(c: org.apache.spark.sql.Column) = roundTo.fold(c)(d => round(c, d))

    val v = vecs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))

    def assign(centroids: DataFrame): DataFrame = {
      val d2 = rnd(VectorOps.dot(col("v"), col("v")) -
        lit(2) * VectorOps.dot(col("v"), col("cv")) +
        VectorOps.dot(col("cv"), col("cv")))
      // min_by aggregation, not a window argmin: partial aggregation
      // combines map-side, so the corpus×k expansion never reaches the
      // exchange (a per-id window would shuffle+sort all of it).
      v.join(broadcast(centroids))
        .withColumn("_d2", d2)
        .groupBy(col("id"))
        .agg(
          min_by(col("cluster"), struct(col("_d2"), col("cluster"))).as("cluster"),
          first(col("v")).as("v"))
        .select(col("id"), col("v"), col("cluster"))
    }

    def mStep(assigned: DataFrame): DataFrame =
      assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg(rnd(avg(col("x"))).as("c"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("dim"), col("c")))).as("_dims"))
        .select(col("cluster"),
          expr("transform(_dims, d -> d.c)").as("cv"))

    var centroids = v.orderBy(col("id")).limit(k)
      .select(row_number().over(Window.orderBy(col("id"))).as("cluster"), col("v").as("cv"))
    var i = 0
    while (i < iterations) {
      val next = mStep(assign(centroids)).cache()
      next.count() // materialize so each iteration is one pass
      // Release the superseded iteration's cache once the new one is
      // materialized — repeated fit() calls (bench loops, the 4
      // per-subspace PQ trainings) otherwise accumulate one dead
      // BlockManager entry per iteration for the life of the session.
      // The final iteration's centroids stay cached by design: the
      // returned assignment/centroid DataFrames read them.
      if (i > 0) centroids.unpersist(blocking = false)
      centroids = next
      i += 1
    }
    val finalAsg = assign(centroids)
    (if (keepVectors) finalAsg
     else finalAsg.select(col("id"), col("cluster")), centroids)
  }

  /** Per-group Lloyd k-means: an INDEPENDENT codebook for every value
    * of `grpCol`, trained in ONE set of distributed passes — the
    * product-quantization training shape. Calling [[fit]] once per
    * subspace costs m corpus scans and m driver-materialization jobs
    * per iteration; here assignment and M-step group by (grp, …) so
    * all m codebooks advance together: one scan, one materialization
    * per iteration at ANY m. Semantics per group are identical to
    * [[fit]]: init = the k lowest-id vectors of the group (cluster
    * ids 1..k in id order), assignment ties break on (d2, cluster),
    * optional `roundTo` re-quantization for the cross-engine
    * deterministic mode.
    *
    * @return centroids (grp, cluster, cv), cached — the final
    *   iteration's materialized table, same convention as [[fit]].
    */
  def fitPerGroup(vecs: DataFrame, grpCol: String, idCol: String,
      vecCol: String, k: Int, iterations: Int = 5,
      roundTo: Option[Int] = None): DataFrame = {
    def rnd(c: org.apache.spark.sql.Column) = roundTo.fold(c)(d => round(c, d))
    val v = vecs.select(col(grpCol).as("grp"), col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))

    def assign(centroids: DataFrame): DataFrame = {
      val d2 = rnd(VectorOps.dot(col("v"), col("v")) -
        lit(2) * VectorOps.dot(col("v"), col("cv")) +
        VectorOps.dot(col("cv"), col("cv")))
      v.join(broadcast(centroids), Seq("grp"))
        .withColumn("_d2", d2)
        .groupBy(col("grp"), col("id"))
        .agg(
          min_by(col("cluster"), struct(col("_d2"), col("cluster"))).as("cluster"),
          first(col("v")).as("v"))
    }

    def mStep(assigned: DataFrame): DataFrame =
      assigned
        .select(col("grp"), col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("grp"), col("cluster"), col("dim"))
        .agg(rnd(avg(col("x"))).as("c"))
        .groupBy(col("grp"), col("cluster"))
        .agg(array_sort(collect_list(struct(col("dim"), col("c")))).as("_dims"))
        .select(col("grp"), col("cluster"),
          expr("transform(_dims, d -> d.c)").as("cv"))

    // init: the k lowest-id vectors per group, cluster = rank in id
    // order — TopKPerKey bounded heaps, not a per-group window sort
    var centroids = graft.plans.TopK.perKey(
        v, Seq("grp"), Seq(("id", true)), k)
      .select(col("grp"), col("rnk").cast("int").as("cluster"), col("v").as("cv"))
    var i = 0
    while (i < iterations) {
      val next = mStep(assign(centroids)).cache()
      next.count() // ONE materialization advances every group's codebook
      if (i > 0) centroids.unpersist(blocking = true)
      centroids = next
      i += 1
    }
    centroids
  }
}
