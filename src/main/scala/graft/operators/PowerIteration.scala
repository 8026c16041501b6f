package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed first principal component via power iteration — the
  * PCA step a training-data pipeline runs for embedding whitening,
  * diversity scoring, and drift monitoring.
  *
  * Decomposition by data size, not by step: the only corpus-scale
  * work is (a) the centered scatter matrix S = Σvvᵀ − (Σv)(Σv)ᵀ/n —
  * chained posexplode with MAP-SIDE combine into d(d+1)/2
  * upper-triangle groups, so the exchange carries a dimension-bounded
  * number of partial rows per partition regardless of corpus size
  * (the `embedding_covariance` pattern; mirrored to full d×d on the
  * driver) — and (b) the final projection, a map-only fused-dot scan.
  * The power iteration itself runs on the DRIVER over the collected
  * matrix (d(d+1)/2 + d rows — bounded by dimension, never by rows;
  * 64-dim ⇒ 2 080 partials), which is the right side of the
  * driver/cluster split for any d where a dense eigensolve is
  * feasible at all.
  *
  * Cross-engine determinism (the `kmeans_iterations` 6dp trick):
  * scatter entries are rounded to `roundS` dp (raw-sum magnitudes sit
  * ~n× above the rounding noise floor — see `embedding_covariance`),
  * each iterate is renormalized and rounded to `roundV` dp, and every
  * reduction (matvec row, norm, projection) folds in ascending index
  * order from 0.0 — the same order `ArrayDot` and an external SQL
  * oracle's ordered list_reduce use, so all doubles agree bit-for-bit.
  */
object PowerIteration {

  /** @return (pc1 — unit-norm dominant eigenvector, rounded `roundV`
    *   dp per iterate — and the per-row projections (id, score)).
    */
  def pc1(vecs: DataFrame, idCol: String, vecCol: String,
      iterations: Int = 3, roundS: Int = 4, roundV: Int = 6)
      : (Array[Double], DataFrame) = {
    val v = vecs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))

    // Two corpus passes total. Pass 1: per-dim sums, with the row
    // count riding the same aggregation (n = rows carrying dim 0) —
    // no separate count()/head() jobs. Pass 2: second-moment sums
    // over the UPPER TRIANGLE only (d(d+1)/2 groups, map-side
    // combined — the embedding_covariance exchange shape), mirrored
    // on the driver.
    val sxRows = v.select(posexplode(col("v")).as(Seq("i", "vi")))
      .groupBy(col("i"))
      .agg(sum(col("vi")).as("sx"), count(lit(1)).as("cnt"))
      .collect()
    val sx = sxRows.map(r => (r.getInt(0), r.getDouble(1))).toMap
    val d = sxRows.length
    val n = sxRows.head.getLong(2).toDouble

    val sxyUpper = v
      .select(posexplode(col("v")).as(Seq("i", "vi")), col("v"))
      .select(col("i"), col("vi"), posexplode(col("v")).as(Seq("j", "vj")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j")).agg(sum(col("vi") * col("vj")).as("sxy"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    def sxy(i: Int, j: Int): Double =
      if (j >= i) sxyUpper((i, j)) else sxyUpper((j, i))

    // Spark's round() semantics exactly (decimal-exact HALF_UP) — the
    // same function the SQL oracle's round() has matched across every
    // prior closed-form replay, so driver-computed iterates equal both
    // engines' rounded values bitwise.
    def rnd(x: Double, dp: Int): Double =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s = Array.tabulate(d, d)((i, j) => rnd(sxy(i, j) - sx(i) * sx(j) / n, roundS))

    var vec = Array.fill(d)(rnd(1.0 / math.sqrt(d.toDouble), roundV))
    for (_ <- 1 to iterations) {
      val w = Array.tabulate(d) { i =>
        var acc = 0.0
        var j = 0
        while (j < d) { acc += s(i)(j) * vec(j); j += 1 }
        acc
      }
      var nrm2 = 0.0
      var i = 0
      while (i < d) { nrm2 += w(i) * w(i); i += 1 }
      val nrm = math.sqrt(nrm2)
      vec = w.map(x => rnd(x / nrm, roundV))
    }

    val proj = v.select(col("id"),
      round(VectorOps.dot(col("v"), lit(vec)), roundV).as("score"))
    (vec, proj)
  }
}
