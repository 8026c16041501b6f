package graft.operators

import graft.functions.GeoFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Radius (distance-within-R) spatial self/two-table join via
  * grid-cell blocking.
  *
  * Spark's native plan for `haversine(a, b) < R` across two point
  * sets is a BroadcastNestedLoopJoin — O(|A|·|B|) distance
  * evaluations, hopeless at 100 TB. The grid spelling recovers an
  * equi-join: each left point maps to exactly ONE lat/lon grid cell,
  * each right point replicates into its own cell plus the 8
  * neighbors, the join runs on the cell key, and the exact haversine
  * predicate refines. With `cellDeg` chosen so one cell is at least
  * `radiusKm` wide in both axes at every latitude the data can hold,
  * any qualifying pair differs by at most one cell per axis, so the
  * left point's cell is always among the right point's 9 replicas —
  * no recall loss — and because the 9 replica cells are distinct,
  * each pair is produced exactly ONCE (no dedup exchange).
  *
  * Cost: 9× replication of the right side + one shuffled (or
  * broadcast) hash join keyed on the cell — rows per cell track local
  * point density, so skew follows the data's spatial skew and AQE's
  * skew-join splitting applies as usual.
  */
object SpatialJoin {

  /** All pairs (l, r) with `haversineKm(l, r) < radiusKm`.
    * Output: left columns + right columns (caller disambiguates
    * names) + `dist_km`. `cellDeg` must be ≥ the radius expressed in
    * degrees of latitude AND of longitude at the extreme latitude of
    * the data (lon degrees shrink by cos φ — callers with |lat| up to
    * φmax need `cellDeg ≥ radiusKm / (111.195·cos φmax)`). Pass
    * `maxAbsLatDeg` to have that longitude contract ASSERTED at
    * runtime instead of trusted (default 0° asserts only the
    * equatorial/latitude bound — the pre-existing caller contract).
    *
    * LIMITATION — antimeridian: cells are computed on raw lon
    * degrees, so a pair straddling lon = ±180 lands in cells ~360/
    * cellDeg apart and is never produced. Data wrapping the
    * antimeridian must be re-centered (lon + 360 on one side)
    * upstream; poles (|lat| → 90) are likewise out of contract since
    * cos φ → 0 makes no finite cellDeg sufficient.
    */
  def radiusJoin(left: DataFrame, right: DataFrame,
      lLat: String, lLon: String, rLat: String, rLon: String,
      radiusKm: Double, cellDeg: Double,
      maxAbsLatDeg: Double = 0.0): DataFrame = {
    require(radiusKm > 0 && cellDeg > 0, "radius and cell must be positive")
    require(maxAbsLatDeg >= 0 && maxAbsLatDeg < 90,
      s"maxAbsLatDeg=$maxAbsLatDeg must be in [0, 90)")
    // One cell of latitude is 111.195 km (mean earth radius); one
    // cell of longitude shrinks by cos φ at latitude φ, so the
    // binding constraint is at the data's extreme latitude.
    val lonScale = math.cos(math.toRadians(maxAbsLatDeg))
    require(cellDeg * 111.195 * lonScale >= radiusKm,
      s"cellDeg=$cellDeg is narrower than radiusKm=$radiusKm in " +
        s"longitude at |lat|=$maxAbsLatDeg (need ≥ ${radiusKm / (111.195 * lonScale)})")
    val lp = left
      .withColumn("_cx", floor(col(lLat) / cellDeg).cast("long"))
      .withColumn("_cy", floor(col(lLon) / cellDeg).cast("long"))
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    val rp = right
      .withColumn("_o", explode(typedLit(offsets)))
      .withColumn("_cx", floor(col(rLat) / cellDeg).cast("long") + col("_o._1"))
      .withColumn("_cy", floor(col(rLon) / cellDeg).cast("long") + col("_o._2"))
      .drop("_o")
    lp.join(rp, Seq("_cx", "_cy"))
      .withColumn("dist_km",
        GeoFunctions.haversineKm(col(lLat), col(lLon), col(rLat), col(rLon)))
      .filter(col("dist_km") < radiusKm)
      .drop("_cx", "_cy")
  }
}
