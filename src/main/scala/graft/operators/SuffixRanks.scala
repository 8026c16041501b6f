package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Distributed generalized-suffix-array ranks by PREFIX DOUBLING
  * (Manber & Myers 1993; the construction Lee et al. 2022 §4 build
  * their ExactSubstr dedup on — a suffix array over the corpus,
  * here doc-bounded so matches never span documents).
  *
  * After round k every suffix (doc, pos) carries rank_k = the dense
  * rank of its first 2^k tokens (truncated at its document's end,
  * with end-of-doc ordering BEFORE any token): two suffixes share
  * rank_k iff their doc-bounded 2^k-token prefixes are equal. Each
  * round is ONE self-join at offset 2^(k-1) (doc-keyed equi-join —
  * never a corpus-wide window) plus one distributed dense rank, so
  * a 2^K-token horizon costs K = log₂ rounds over (pos, rank, rank)
  * triples — the reason suffix arrays beat positioned-q-gram
  * explode (C88's machinery materializes q tokens per position on
  * the exchange; this ships two longs per position per round).
  *
  * Exactness: dense ranks are tie-free BY DEFINITION (equal keys
  * share a rank, no ordering inside a tie group exists to disagree
  * on), so the oracle's `dense_rank()` window replays every round
  * bit-for-bit; the end sentinel is rank 0 (both engines spell
  * `coalesce(next_rank, 0)` — ranks start at 1, so 0 is strictly
  * smaller than any real rank).
  *
  * Scale posture: the dense rank is the range-partition + two
  * streamed passes machinery (per-partition distinct counts →
  * driver offsets (one long per partition) → per-partition dense
  * ranks + offset — the DistributedQuantile/PrefixSum discipline),
  * never a global single-partition window; equal keys land in one
  * partition because the RangePartitioner assigns by key.
  */
object SuffixRanks {

  /** Append a dense rank (1-based, ascending) over `keys` as column
    * `out`. Two streamed passes over one shared sorted RDD (see the
    * DistributedQuantile determinism note — sharing the instance
    * pins the RangePartitioner's sampled bounds).
    */
  def withDenseRank(df: DataFrame, keys: Seq[String], out: String,
      rangePartitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val keyCols = keys.map(col)
    val sorted = df
      .repartitionByRange(rangePartitions, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val schema = sorted.schema
      val kIdx = keys.map(schema.fieldIndex)
      val rdd = sorted.rdd

      // pass 1: distinct-key count per partition (a few longs)
      val perPart: Array[(Int, Long)] = rdd
        .mapPartitionsWithIndex { (pid, it) =>
          var n = 0L
          var last: Seq[Any] = null
          it.foreach { r =>
            val k = kIdx.map(r.get)
            if (last == null || k != last) { n += 1; last = k }
          }
          Iterator.single((pid, n))
        }
        .collect()
      val offsets: Map[Int, Long] = {
        var acc = 0L
        perPart.sortBy(_._1).map { case (pid, n) =>
          val o = acc; acc += n; pid -> o
        }.toMap
      }
      val bcOff = spark.sparkContext.broadcast(offsets)

      // pass 2: per-partition dense rank + offset
      val ranked = rdd.mapPartitionsWithIndex { (pid, it) =>
        var rank = bcOff.value.getOrElse(pid, 0L)
        var last: Seq[Any] = null
        it.map { r =>
          val k = kIdx.map(r.get)
          if (last == null || k != last) { rank += 1; last = k }
          Row.fromSeq(r.toSeq :+ rank)
        }
      }
      spark.createDataFrame(ranked, schema.add(out, LongType, nullable = false))
    } finally sorted.unpersist(blocking = false)
  }

  /** Prefix-doubling ranks: input (docCol, posCol 1-based, tokCol) →
    * output (docCol, posCol, r0, r1, …, r`rounds`) where r_k is the
    * corpus-wide dense rank of the suffix's doc-bounded 2^k-token
    * prefix. localCheckpoint per round cuts the iterative lineage
    * (the PageRank/k-core convention).
    */
  def pow2Ranks(tokens: DataFrame, docCol: String, posCol: String,
      tokCol: String, rounds: Int): DataFrame = {
    var cur = withDenseRank(
      tokens.select(col(docCol).as("doc"), col(posCol).as("pos"),
        col(tokCol).as("tok")),
      Seq("tok"), "r0").drop("tok").localCheckpoint()
    for (k <- 1 to rounds) {
      val half = 1L << (k - 1)
      val prev = s"r${k - 1}"
      val shifted = cur.select(col("doc"),
        (col("pos") - half).as("pos"), col(prev).as("rn"))
      cur = withDenseRank(
        cur.join(shifted, Seq("doc", "pos"), "left")
          .withColumn("rn", coalesce(col("rn"), lit(0L))),
        Seq(prev, "rn"), s"r$k")
        .drop("rn").localCheckpoint()
    }
    cur.withColumnRenamed("doc", docCol).withColumnRenamed("pos", posCol)
  }
}
