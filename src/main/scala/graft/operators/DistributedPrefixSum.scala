package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed running total WITHOUT a per-group single-reducer
  * window.
  *
  * `sum(x) OVER (PARTITION BY g ORDER BY o)` sends EVERY row of a
  * group through one reducer — fine when groups are small (per-user,
  * per-customer), a serialization wall when the partition key is
  * low-cardinality (per-language over a 100 TB corpus: a handful of
  * reducers each stream billions of rows while the rest of the
  * cluster idles). This operator computes the same running total in
  * two streamed passes, the same machinery as [[DistributedQuantile]]:
  *
  *  1. range-partition on (group, order...) and sort within
  *     partitions — all partitions work in parallel;
  *  2. pass 1: per-(partition, group) value sums (a few longs per
  *     partition) → driver computes each partition's starting offset
  *     per group;
  *  3. pass 2: per-partition running sum seeded with the broadcast
  *     offset — embarrassingly parallel, constant memory.
  *
  * CRITICAL LAYOUT INVARIANT: both passes consume the SAME
  * `sorted.rdd` instance (a lazy val on the Dataset). Range-partition
  * boundaries come from a sampling job seeded by RDD id — two
  * separate query executions of the same logical plan can draw
  * DIFFERENT boundaries, silently corrupting the per-partition
  * offsets. One shared RDD = one RangePartitioner = one layout; pass
  * 2 re-reads the already-materialized shuffle files, so the corpus
  * is scanned once. Nothing corpus-sized is cached or collected;
  * driver state is O(partitions × groups-per-partition), guarded by
  * `maxGroups` — for high-cardinality groups use the plain window
  * (those groups are small by construction).
  */
object DistributedPrefixSum {

  /** Appends `cumCol` = running total of `valueCol` (inclusive of the
    * current row) per `groupCol` group in `orderCols` order. All other
    * columns pass through unchanged.
    */
  def running(df: DataFrame, groupCol: String, orderCols: Seq[String],
      valueCol: String, cumCol: String, rangePartitions: Int = 32,
      maxGroups: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    val sortCols = (groupCol +: orderCols).map(col)
    val sorted = df
      .repartitionByRange(rangePartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)

    val gIdx = sorted.schema.fieldIndex(groupCol)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    // Loud on null groups: String.valueOf(null) == "null" would merge
    // a NULL group with a literal "null" key — refuse instead.
    def gKey(r: Row): String = {
      require(!r.isNullAt(gIdx),
        s"DistributedPrefixSum: null $groupCol group key unsupported — filter or fill first")
      String.valueOf(r.get(gIdx))
    }

    // ONE materialized RDD for both passes — see the layout invariant
    // in the scaladoc. Do NOT replace either pass with Dataset-API
    // transforms: a second query execution re-samples range bounds.
    val sortedRdd = sorted.rdd

    // Pass 1: per-(partition, group) sums — tiny, streamed.
    val pgSums: Array[(Int, String, Long)] = sortedRdd
      .mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { r =>
          val g = gKey(r)
          m.update(g, m.getOrElse(g, 0L) + r.getLong(vIdx))
        }
        m.iterator.map { case (g, s) => (pid, g, s) }.toList.iterator
      }
      .collect()

    val nGroups = pgSums.map(_._2).distinct.length
    require(nGroups <= maxGroups,
      s"DistributedPrefixSum: $nGroups groups exceeds maxGroups=$maxGroups; " +
        "use a plain window for high-cardinality (small) groups")

    val offsets: Map[(Int, String), Long] = {
      val b = Map.newBuilder[(Int, String), Long]
      pgSums.groupBy(_._2).foreach { case (g, rows) =>
        var acc = 0L
        rows.sortBy(_._1).foreach { case (pid, _, s) =>
          b += ((pid, g) -> acc); acc += s
        }
      }
      b.result()
    }
    val bcOff = spark.sparkContext.broadcast(offsets)

    val outSchema = StructType(
      sorted.schema.fields :+ StructField(cumCol, LongType, nullable = false))

    // Pass 2 (lazy): streamed running sum seeded at the broadcast
    // offset, over the SAME RDD (same partitioner, shuffle files
    // reused — the corpus is not re-shuffled).
    val withCum = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var cur: String = null
      var acc = 0L
      it.map { r =>
        val g = gKey(r)
        if (g != cur) { cur = g; acc = bcOff.value.getOrElse((pid, g), 0L) }
        acc += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }
    spark.createDataFrame(withCum, outSchema)
  }

  /** Appends `maxCol` = running MAXIMUM of `valueCol` over all
    * STRICTLY-PRIOR rows (exclusive prefix; `Long.MinValue` for each
    * group's first row) per `groupCol` group in `orderCols` order —
    * the max-monoid sibling of [[running]], same two streamed
    * range-partitioned passes, same single-RDD layout invariant. The
    * exclusive form is what dominance tests (skyline) need: a row must
    * never be compared against itself.
    */
  def runningMaxExclusive(df: DataFrame, groupCol: String, orderCols: Seq[String],
      valueCol: String, maxCol: String, rangePartitions: Int = 32,
      maxGroups: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    val sortCols = (groupCol +: orderCols).map(col)
    val sorted = df
      .repartitionByRange(rangePartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)

    val gIdx = sorted.schema.fieldIndex(groupCol)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    def gKey(r: Row): String = {
      require(!r.isNullAt(gIdx),
        s"DistributedPrefixSum: null $groupCol group key unsupported — filter or fill first")
      String.valueOf(r.get(gIdx))
    }

    val sortedRdd = sorted.rdd // ONE instance for both passes (see running)

    val pgMax: Array[(Int, String, Long)] = sortedRdd
      .mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { r =>
          val g = gKey(r)
          val v = r.getLong(vIdx)
          m.update(g, math.max(m.getOrElse(g, Long.MinValue), v))
        }
        m.iterator.map { case (g, s) => (pid, g, s) }.toList.iterator
      }
      .collect()

    val nGroups = pgMax.map(_._2).distinct.length
    require(nGroups <= maxGroups,
      s"DistributedPrefixSum: $nGroups groups exceeds maxGroups=$maxGroups")

    val offsets: Map[(Int, String), Long] = {
      val b = Map.newBuilder[(Int, String), Long]
      pgMax.groupBy(_._2).foreach { case (g, rows) =>
        var acc = Long.MinValue
        rows.sortBy(_._1).foreach { case (pid, _, s) =>
          b += ((pid, g) -> acc); acc = math.max(acc, s)
        }
      }
      b.result()
    }
    val bcOff = spark.sparkContext.broadcast(offsets)

    val outSchema = StructType(
      sorted.schema.fields :+ StructField(maxCol, LongType, nullable = false))

    val withMax = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var cur: String = null
      var acc = Long.MinValue
      it.map { r =>
        val g = gKey(r)
        if (g != cur) {
          cur = g; acc = bcOff.value.getOrElse((pid, g), Long.MinValue)
        }
        val before = acc
        acc = math.max(acc, r.getLong(vIdx))
        Row.fromSeq(r.toSeq :+ before)
      }
    }
    spark.createDataFrame(withMax, outSchema)
  }
}
