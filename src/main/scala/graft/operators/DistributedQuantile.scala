package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Exact linear-interpolated per-group quantiles WITHOUT buffering a
  * group's values in a single reducer.
  *
  * Spark's built-in `percentile` is an ObjectHashAggregate that
  * materializes every value of a group inside one unspillable
  * aggregation buffer — with few groups over a 100 TB table each
  * reducer holds billions of doubles and OOMs. This operator is the
  * scale-safe exact alternative for exactly that shape (low group
  * cardinality × huge per-group counts):
  *
  *  1. range-partition rows on (group, value) and sort within
  *     partitions — each partition streams, nothing is buffered;
  *  2. pass 1: per-(partition, group) row counts (a few longs per
  *     partition) → driver computes, per group, the total count n and
  *     each partition's starting rank offset;
  *  3. the target ordinal ranks bracketing each requested quantile
  *     (`pos = q·(n−1)`, ranks `⌊pos⌋` and `⌈pos⌉`) are broadcast;
  *  4. pass 2: each partition streams again with a running per-group
  *     rank counter and emits ONLY rows whose global rank is needed —
  *     ≤ 2·|quantiles| rows per group leave the executors;
  *  5. interpolate with Spark `percentile`'s exact formula
  *     `(hi−pos)·v_lo + (pos−lo)·v_hi` so results are bit-identical
  *     to the built-in (and to DuckDB's `quantile_cont`).
  *
  * Driver state is O(partitions × groups present per partition) count
  * entries — guarded by `maxGroups`; for high-cardinality groups use
  * a per-group window (groups are small then) or the t-digest sketch
  * (functions/TDigest.scala) instead.
  *
  * Determinism across the two passes: BOTH consume the same
  * `sorted.rdd` instance (a lazy val, so one RangePartitioner and one
  * physical layout — range-bound sampling is seeded by RDD id, so two
  * separate query executions could draw different boundaries; sharing
  * the RDD eliminates that hazard, and equal (group, value) rows are
  * interchangeable for rank→value lookup besides). Pass 2 re-reads
  * pass 1's shuffle files rather than re-shuffling.
  */
object DistributedQuantile {

  /** @param qs   (outputColumnName, quantile in [0,1]) pairs
    * @return one row per group: (g: string, <name>: double ...) —
    *         `g` is the group key cast to string
    */
  def quantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      qs: Seq[(String, Double)],
      rangePartitions: Int = 32,
      maxGroups: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val sorted = df
      .select(col(groupCol).cast("string").as("g"), col(valueCol).cast("double").as("v"))
      .where(col("g").isNotNull && col("v").isNotNull)
      .repartitionByRange(rangePartitions, col("g"), col("v"))
      .sortWithinPartitions("g", "v")
      .as[(String, Double)]
      .persist(StorageLevel.MEMORY_AND_DISK)

    try {
      // ONE RDD instance for both passes — see the determinism note
      // in the scaladoc (separate query executions re-sample bounds).
      val sortedRdd = sorted.rdd

      // Pass 1: per-(partition, group) counts — tiny, streamed.
      val pgCounts: Array[(Int, String, Long)] = sortedRdd
        .mapPartitionsWithIndex { (pid, it) =>
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
          it.foreach { case (g, _) => m.update(g, m.getOrElse(g, 0L) + 1L) }
          m.iterator.map { case (g, c) => (pid, g, c) }.toList.iterator
        }
        .collect()

      val groups = pgCounts.map(_._2).distinct
      require(groups.length <= maxGroups,
        s"DistributedQuantile: ${groups.length} groups exceeds maxGroups=$maxGroups; " +
          "use a per-group window (small groups) or TDigest (sketch) instead")

      val nByG: Map[String, Long] =
        pgCounts.groupBy(_._2).map { case (g, rows) => g -> rows.map(_._3).sum }

      // Rank offset of each (partition, group): rows of that group in
      // earlier partitions (range partitioning ⇒ earlier partition =
      // smaller values for the same group).
      val offsets: Map[(Int, String), Long] = {
        val b = Map.newBuilder[(Int, String), Long]
        pgCounts.groupBy(_._2).foreach { case (g, rows) =>
          var acc = 0L
          rows.sortBy(_._1).foreach { case (pid, _, c) =>
            b += ((pid, g) -> acc); acc += c
          }
        }
        b.result()
      }

      // Needed 0-indexed ranks per group: ⌊pos⌋ and ⌈pos⌉ per quantile.
      def bracket(n: Long, q: Double): (Long, Long, Double) = {
        val pos = q * (n - 1)
        (math.floor(pos).toLong, math.ceil(pos).toLong, pos)
      }
      val neededByG: Map[String, Set[Long]] = nByG.map { case (g, n) =>
        g -> qs.flatMap { case (_, q) => val (lo, hi, _) = bracket(n, q); Seq(lo, hi) }.toSet
      }

      val sc = spark.sparkContext
      val bcOff = sc.broadcast(offsets)
      val bcNeed = sc.broadcast(neededByG)

      // Pass 2: streaming rank counter, emit only bracketing rows.
      val picked: Map[(String, Long), Double] = sortedRdd
        .mapPartitionsWithIndex { (pid, it) =>
          var cur: String = null
          var idx = 0L
          it.flatMap { case (g, v) =>
            if (g != cur) { cur = g; idx = bcOff.value.getOrElse((pid, g), 0L) }
            val r = idx
            idx += 1
            if (bcNeed.value.getOrElse(g, Set.empty[Long]).contains(r)) Iterator.single((g, r, v))
            else Iterator.empty
          }
        }
        .collect()
        .map { case (g, r, v) => (g, r) -> v }
        .toMap

      val schema = StructType(
        StructField("g", StringType, nullable = false) +:
          qs.map { case (name, _) => StructField(name, DoubleType, nullable = false) })
      val rows: Seq[Row] = nByG.keys.toSeq.sorted.map { g =>
        val n = nByG(g)
        val vals = qs.map { case (_, q) =>
          val (lo, hi, pos) = bracket(n, q)
          val vlo = picked((g, lo))
          if (lo == hi) vlo
          else (hi - pos) * vlo + (pos - lo) * picked((g, hi))
        }
        Row.fromSeq(g +: vals)
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    } finally sorted.unpersist(blocking = false)
  }
}
