package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *
  * [[fit]] (one codebook) and [[fitPerGroup]] (an independent
  * codebook per group, all advancing together) share ONE
  * assign/M-step/loop implementation parameterized by the grouping
  * columns — the `kmeans_iterations`/`ann_pq_topk` oracles replay
  * these Lloyd rounds closed-form, so the two entry points must stay
  * semantically identical by construction, not by parallel editing.
  */
object KMeans {

  /** E-step: nearest centroid per (grpCols..., id); ties break on
    * (d2, cluster). MAP-ONLY: the codebook is folded into ONE row per
    * group — an array of (cluster, cv) structs sorted by cluster —
    * broadcast, and each data row computes its distance array with a
    * `transform` over that nested array and takes the argmin in
    * place. No row explosion, no aggregation, no sort: the previous
    * join-then-min_by shape expanded every row k times WITH its
    * vector payload through a SortAggregate, which at the ×1000 probe
    * (2M rows × k = 64, ~550 B/row) meant sorting ~70 GB of
    * k-replicated vectors per assign pass — observed heap exhaustion.
    * Here the per-row cost is the same k dot products but the data
    * never leaves its scan task.
    *
    * Tie-break equivalence: `array_position(d, array_min(d))` returns
    * the FIRST index attaining the minimum, and the centroid array is
    * sorted by cluster id — exactly min_by over (d2, cluster).
    */
  private def assignStep(v: DataFrame, centroids: DataFrame,
      grpCols: Seq[String], rnd: Column => Column): DataFrame = {
    // one row per group: cents = [(cluster, cv), ...] sorted by
    // cluster (struct ordering compares `cluster` first; ids are
    // distinct so the cv arrays are never compared)
    val cents =
      if (grpCols.isEmpty)
        centroids.agg(array_sort(
          collect_list(struct(col("cluster"), col("cv")))).as("cents"))
      else
        centroids.groupBy(grpCols.map(col): _*)
          .agg(array_sort(
            collect_list(struct(col("cluster"), col("cv")))).as("cents"))
    val joined =
      if (grpCols.isEmpty) v.crossJoin(broadcast(cents))
      else v.join(broadcast(cents), grpCols)
    val dists = transform(col("cents"), c =>
      rnd(VectorOps.dot(col("v"), col("v")) -
        lit(2) * VectorOps.dot(col("v"), c.getField("cv")) +
        VectorOps.dot(c.getField("cv"), c.getField("cv"))))
    joined
      .withColumn("_d", dists)
      .withColumn("cluster",
        element_at(col("cents"),
          array_position(col("_d"), array_min(col("_d"))).cast("int"))
          .getField("cluster"))
      .select(grpCols.map(col) ++ Seq(col("id"), col("v"), col("cluster")): _*)
  }

  /** M-step: per-(grpCols..., cluster) elementwise mean, re-assembled
    * in dimension order (array_sort on (dim, c) structs — collect_list
    * order is not deterministic, the sort is what makes it so).
    */
  private def mStepAgg(assigned: DataFrame, grpCols: Seq[String],
      rnd: Column => Column): DataFrame =
    assigned
      .select(grpCols.map(col) ++
        Seq(col("cluster"), posexplode(col("v")).as(Seq("dim", "x"))): _*)
      .groupBy((grpCols ++ Seq("cluster", "dim")).map(col): _*)
      .agg(rnd(avg(col("x"))).as("c"))
      .groupBy((grpCols :+ "cluster").map(col): _*)
      .agg(array_sort(collect_list(struct(col("dim"), col("c")))).as("_dims"))
      .select(grpCols.map(col) ++ Seq(col("cluster"),
        expr("transform(_dims, d -> d.c)").as("cv")): _*)

  /** The Lloyd loop: each iteration materializes the new centroid
    * table (cache + count — ONE distributed pass set per iteration)
    * and releases the superseded one. BLOCKING unpersist: repeated
    * fits (bench loops, PQ trainings) otherwise accumulate dead
    * BlockManager entries racing the next iteration's ramp-up. The
    * final iteration's centroids stay cached by design — the returned
    * DataFrames read them.
    */
  private def lloyd(v: DataFrame, init: DataFrame, grpCols: Seq[String],
      iterations: Int, rnd: Column => Column): DataFrame = {
    var centroids = init
    var i = 0
    while (i < iterations) {
      val next = mStepAgg(assignStep(v, centroids, grpCols, rnd), grpCols, rnd).cache()
      next.count()
      if (i > 0) centroids.unpersist(blocking = true)
      centroids = next
      i += 1
    }
    centroids
  }

  private def rounder(roundTo: Option[Int]): Column => Column =
    c => roundTo.fold(c)(d => round(c, d))

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
    val rnd = rounder(roundTo)
    val v = vecs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val init = v.orderBy(col("id")).limit(k)
      .select(row_number().over(Window.orderBy(col("id"))).as("cluster"), col("v").as("cv"))
    val centroids = lloyd(v, init, Nil, iterations, rnd)
    val finalAsg = assignStep(v, centroids, Nil, rnd)
    (if (keepVectors) finalAsg
     else finalAsg.select(col("id"), col("cluster")), centroids)
  }

  /** One E-step against a FIXED codebook — for pipelines that train
    * on a sample (the only affordable regime at corpus scale: Lloyd
    * cost is rows × k per iteration, so full-corpus training at
    * k = √n is n^1.5 PER ROUND) and then assign the whole corpus
    * once. Semantics are exactly [[fit]]'s final assignment pass:
    * same distance rounding, same (d2, cluster) tie-break.
    */
  def assign(vecs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, roundTo: Option[Int] = None,
      keepVectors: Boolean = false): DataFrame = {
    val v = vecs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val a = assignStep(v, centroids, Nil, rounder(roundTo))
    if (keepVectors) a else a.select(col("id"), col("cluster"))
  }

  /** One E-step against FIXED per-group codebooks — [[assign]] for the
    * [[fitPerGroup]] shape: each row competes only against its own
    * group's centroids (the join keys on the group, so total work is
    * rows × k regardless of how many groups exist — the property that
    * makes hash-sharded pipelines linear in the corpus). Same distance
    * rounding and (d2, cluster) tie-break as every other E-step here.
    *
    * @param centroids (grp, cluster, cv) — [[fitPerGroup]]'s output
    *   convention; `grp` values with no centroids produce no rows.
    */
  def assignPerGroup(vecs: DataFrame, grpCol: String, idCol: String,
      vecCol: String, centroids: DataFrame, roundTo: Option[Int] = None,
      keepVectors: Boolean = false): DataFrame = {
    val v = vecs.select(col(grpCol).as("grp"), col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val a = assignStep(v, centroids, Seq("grp"), rounder(roundTo))
    if (keepVectors) a else a.select(col("grp"), col("id"), col("cluster"))
  }

  /** Per-group Lloyd k-means: an INDEPENDENT codebook for every value
    * of `grpCol`, trained in ONE set of distributed passes — the
    * product-quantization training shape. Calling [[fit]] once per
    * subspace costs m corpus scans and m driver-materialization jobs
    * per iteration; here assignment and M-step group by (grp, …) so
    * all m codebooks advance together: one scan, one materialization
    * per iteration at ANY m. Semantics per group are [[fit]]'s by
    * construction (shared assign/M-step/loop): init = the k lowest-id
    * vectors of the group (cluster ids 1..k in id order), assignment
    * ties break on (d2, cluster), optional `roundTo` re-quantization
    * for the cross-engine deterministic mode.
    *
    * @return centroids (grp, cluster, cv), cached — the final
    *   iteration's materialized table, same convention as [[fit]].
    */
  def fitPerGroup(vecs: DataFrame, grpCol: String, idCol: String,
      vecCol: String, k: Int, iterations: Int = 5,
      roundTo: Option[Int] = None): DataFrame = {
    val rnd = rounder(roundTo)
    val v = vecs.select(col(grpCol).as("grp"), col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    // init: the k lowest-id vectors per group, cluster = rank in id
    // order — TopKPerKey bounded heaps, not a per-group window sort
    val init = graft.plans.TopK.perKey(
        v, Seq("grp"), Seq(("id", true)), k)
      .select(col("grp"), col("rnk").cast("int").as("cluster"), col("v").as("cv"))
    lloyd(v, init, Seq("grp"), iterations, rnd)
  }
}
