package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bucketed equi-join.
  *
  * Spark plans a pure inequality join (`point BETWEEN start AND end`)
  * as a BroadcastNestedLoopJoin — O(|points|·|intervals|), hopeless
  * at 100 TB. The bucketed form recovers an equi-join: intervals
  * explode into the fixed-width buckets they cover, points map to
  * exactly ONE bucket, the join runs on the bucket key, and the
  * original predicate refines. Each point meets each interval at most
  * once (single point bucket) — no dedup needed. Cost:
  * |intervals| × (span/bucketWidth) replicated rows, one shuffle.
  * Pick bucketWidth ≈ typical interval span to keep replication ~2×.
  */
object RangeJoin {

  /** Inner join of `points` to every interval containing them
    * (inclusive bounds). `pointCol`, `startCol`, `endCol` must be
    * numeric (same units); all columns of both inputs are kept.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val ip = intervals.withColumn("_bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    val pp = points.withColumn("_bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    pp.join(ip, Seq("_bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bucket")
  }
}
