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
  // Exact floor(col / w) on integer columns: truncating `div`
  // corrected for negative remainders. A double-based floor loses
  // precision at |v| >= 2^53 and silently mis-buckets.
  private def floorDivSql(colName: String, w: Long): String = {
    val c = s"CAST(`$colName` AS BIGINT)"
    s"(CASE WHEN $c % $w < 0 THEN ($c div $w) - 1 ELSE ($c div $w) END)"
  }

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame =
    pointInIntervalKeyed(points, intervals, Seq.empty,
      pointCol, startCol, endCol, bucketWidth)

  /** Keyed variant: the equi-join runs on `keyCols` (present in BOTH
    * inputs) PLUS the bucket — per-entity interval joins (a user's
    * clicks against that user's attribution windows) without every
    * entity's points meeting every entity's intervals in the bucket.
    */
  def pointInIntervalKeyed(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String],
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // start > end matches nothing — emit an empty bucket list rather
    // than letting Sequence throw on a descending range.
    val ip = intervals.withColumn("_bucket",
      explode(when(col(startCol) <= col(endCol),
        sequence(
          expr(floorDivSql(startCol, bucketWidth)),
          expr(floorDivSql(endCol, bucketWidth))))
        .otherwise(typedLit(Array.empty[Long]))))
    val pp = points.withColumn("_bucket",
      expr(floorDivSql(pointCol, bucketWidth)))
    pp.join(ip, keyCols :+ "_bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bucket")
  }

  /** Interval × interval OVERLAP join (closed intervals: pairs with
    * `lStart <= rEnd && rStart <= lEnd`) as a bucketed equi-join.
    *
    * Both sides explode into the fixed-width buckets they cover, the
    * join runs on the bucket key, and the overlap predicate refines.
    * Because an overlapping pair co-occurs in EVERY bucket their
    * spans share, the naive spelling emits duplicates; instead each
    * pair is emitted exactly once, in the canonical bucket containing
    * `max(lStart, rStart)` — that instant lies inside both intervals
    * whenever they overlap, so the pair is present in that bucket and
    * the equality filter keeps no other copy. No distinct/dedup
    * exchange needed. Cost: Σ span/bucketWidth replicated rows per
    * side + one shuffle; pick bucketWidth near the typical span so
    * replication stays ~2×.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def exploded(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("_bucket",
        explode(when(col(s) <= col(e),
          sequence(
            expr(floorDivSql(s, bucketWidth)),
            expr(floorDivSql(e, bucketWidth))))
          .otherwise(typedLit(Array.empty[Long]))))
    val canonicalBucket = expr(
      s"(CASE WHEN greatest(CAST(`$lStart` AS BIGINT), CAST(`$rStart` AS BIGINT)) % $bucketWidth < 0 " +
        s"THEN (greatest(CAST(`$lStart` AS BIGINT), CAST(`$rStart` AS BIGINT)) div $bucketWidth) - 1 " +
        s"ELSE (greatest(CAST(`$lStart` AS BIGINT), CAST(`$rStart` AS BIGINT)) div $bucketWidth) END)")
    exploded(left, lStart, lEnd)
      .join(exploded(right, rStart, rEnd), Seq("_bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("_bucket") === canonicalBucket)
      .drop("_bucket")
  }
}
