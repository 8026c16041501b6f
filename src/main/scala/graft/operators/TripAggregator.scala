package graft.operators

import graft.functions.GeoFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key trip/session aggregation.
  *
  * Re-expresses the reference's incremental
  * AggregateFunction<Trip, TripAggregation, TripAggregation>
  * (reference: TripAggregatorApplication.kt:58-164):
  *  - distance     = Σ haversine over consecutive GPS points (:120-127)
  *  - total time   = max(ts) − min(ts)                         (:108-118)
  *  - stopped time = Σ time deltas inside consecutive runs of
  *                   speed < 5 km/h                            (:128-141)
  *  - moving time  = total − stopped                           (:146-148)
  *
  * Instead of the reference's per-key in-memory TreeSets (which
  * materialize every GPS point of a trip in one task's heap), this is
  * a lag-window + groupBy plan: consecutive-pair quantities are
  * computed rowwise after ONE shuffle on the key, then summed with a
  * map-side-combinable aggregate. Memory per task is O(1) per row —
  * survives keys with millions of events at 100 TB.
  *
  * A run of consecutive low-speed readings contributes
  * (last.ts − first.ts) = Σ consecutive deltas inside the run, so
  * summing `delta` over rows where BOTH endpoints are low-speed is
  * exactly the reference's run-based sum.
  */
object TripAggregator {

  /** @param orderCols unique time-tiebroken order within a key. */
  def aggregate(
      df: DataFrame,
      key: Column,
      tsec: Column,
      lat: Column,
      lon: Column,
      speedKmh: Column,
      lowSpeedThreshold: Double = 5.0,
      orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    val prevTs = lag(tsec, 1).over(w)
    val prevLat = lag(lat, 1).over(w)
    val prevLon = lag(lon, 1).over(w)
    val prevSpeed = lag(speedKmh, 1).over(w)

    val legKm = when(prevLat.isNotNull,
      GeoFunctions.haversineKm(prevLat, prevLon, lat, lon)).otherwise(lit(0.0))
    val stoppedDelta = when(
      prevSpeed.isNotNull && speedKmh < lowSpeedThreshold && prevSpeed < lowSpeedThreshold,
      tsec - prevTs).otherwise(lit(0L))

    df.withColumn("leg_km", legKm)
      .withColumn("stopped_delta_s", stoppedDelta)
      .groupBy(key.as("trip_key"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(tsec) - min(tsec)).as("total_s"),
        sum(col("stopped_delta_s")).as("stopped_s"),
        sum(col("leg_km")).as("distance_km"))
      .withColumn("moving_s", col("total_s") - col("stopped_s"))
  }
}
