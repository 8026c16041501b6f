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
  *     to the built-in.
  *
  * CROSS-ENGINE CAUTION (round-13 measurement): DuckDB 1.0.0's
  * `quantile_cont` agrees with this tree bit-for-bit on every real
  * test-table × q-grid case (re-verified per round by
  * `tools/quantile_bitcheck.py`), but its tree is the un-fused
  * `v_lo·(1−d) + v_hi·d`, which on ADVERSARIAL (v_lo, v_hi, q) ulp
  * cases diverges from this formula ~8% of the time (and no fused or
  * unfused re-association reproduces it 100%). Two consequences:
  *  - a quantile used as OUTPUT is safe: every registered q is a
  *    rational k/m with m | 2000 over cent-grain data, so the true
  *    breakpoint lies on an exact 1e-6 grid and the standard 6dp
  *    `floor(x·1e6 + 0.5)/1e6` absorbs any last-ulp disagreement;
  *  - a quantile used in a COMPARISON (`value > breakpoint`) must
  *    NOT use this interpolated double — use [[cuts]] + [[cutGt]],
  *    which compare against the exact bracket-RANK values instead
  *    (a data value is never strictly between two consecutive ranks,
  *    so the cut is expressible without any interpolation at all).
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

  /** Exact cut values for quantile-threshold COMPARISONS (round 13).
    *
    * For a cut at q = k/m over the SAME column being compared, the
    * predicate `value > quantile_cont(value, q)` is exactly equivalent
    * to `value > v_lo` where `v_lo` is the value at 0-indexed rank
    * `(k·(n−1)) div m`: the interpolated breakpoint b lies in
    * [v_lo, v_hi) between two CONSECUTIVE ranks of the sorted
    * multiset, and no data value can fall strictly between them, so
    * the comparison never observes where inside the bracket b landed.
    * `v_lo` is a real data double — bit-identical across engines by
    * selection, immune to the interpolation-tree ulp divergence
    * documented in the scaladoc above. Likewise `value <= b ⟺ value
    * <= v_lo`; the ≥/< forms additionally need `rem = (k·(n−1)) mod
    * m`: `value >= b ⟺ (rem == 0 ? value >= v_lo : value > v_lo)`.
    *
    * Rank and remainder are pure Long arithmetic (no double q at
    * all), mirrored on the oracle side as `(k*(n-1))//m` /
    * `(k*(n-1))%m` over a row_number ranking.
    *
    * @param cuts (outputColumnName, k, m) triples for q = k/m
    * @param ceilNames cut names whose rank is the CEILING
    *        (k·(n−1) + m − 1) div m instead of the floor — for
    *        order-statistic clamps that must sit at-or-above q
    *        (winsorize_prices); oracle mirror `(k*(n-1)+m-1)//m`
    * @return one row per group: (g, <name>: double = value at rank
    *         (k·(n−1)) div m, <name>_rem: long = (k·(n−1)) mod m, …)
    */
  def cutValues(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      cuts: Seq[(String, Int, Int)],
      rangePartitions: Int = 32,
      maxGroups: Int = 100000,
      ceilNames: Set[String] = Set.empty): DataFrame = {
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
      val sortedRdd = sorted.rdd

      val pgCounts: Array[(Int, String, Long)] = sortedRdd
        .mapPartitionsWithIndex { (pid, it) =>
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
          it.foreach { case (g, _) => m.update(g, m.getOrElse(g, 0L) + 1L) }
          m.iterator.map { case (g, c) => (pid, g, c) }.toList.iterator
        }
        .collect()

      val groups = pgCounts.map(_._2).distinct
      require(groups.length <= maxGroups,
        s"DistributedQuantile.cutValues: ${groups.length} groups exceeds maxGroups=$maxGroups")

      val nByG: Map[String, Long] =
        pgCounts.groupBy(_._2).map { case (g, rows) => g -> rows.map(_._3).sum }

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

      def rankOf(name: String, n: Long, k: Int, m: Int): Long =
        if (ceilNames.contains(name)) (k.toLong * (n - 1) + m - 1) / m.toLong
        else (k.toLong * (n - 1)) / m.toLong
      val neededByG: Map[String, Set[Long]] = nByG.map { case (g, n) =>
        g -> cuts.map { case (nm, k, m) => rankOf(nm, n, k, m) }.toSet
      }

      val sc = spark.sparkContext
      val bcOff = sc.broadcast(offsets)
      val bcNeed = sc.broadcast(neededByG)

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
          cuts.flatMap { case (name, _, _) =>
            Seq(StructField(name, DoubleType, nullable = false),
              StructField(s"${name}_rem", org.apache.spark.sql.types.LongType, nullable = false))
          })
      val rows: Seq[Row] = nByG.keys.toSeq.sorted.map { g =>
        val n = nByG(g)
        val vals = cuts.flatMap { case (nm, k, m) =>
          Seq[Any](picked((g, rankOf(nm, n, k, m))), (k.toLong * (n - 1)) % m.toLong)
        }
        Row.fromSeq(g +: vals)
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    } finally sorted.unpersist(blocking = false)
  }
}
