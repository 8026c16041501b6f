package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table layout: the co-located-join primitive (SURVEY.md §2
  * B40).
  *
  * At 100 TB the dominant cost of a fact-fact equi-join is the
  * shuffle of both sides. Hive-style bucketing pays that shuffle ONCE
  * at write time: both tables are hash-partitioned into the same
  * number of buckets on the join key and each bucket written
  * pre-sorted, so every later join (and groupBy) on that key planned
  * over the two tables is exchange-free — Spark's FileSourceScanExec
  * reports the bucket spec as `outputPartitioning =
  * HashPartitioning(key, n)` and EnsureRequirements inserts nothing.
  * This is the standard layout for fact tables that are joined
  * repeatedly on the same key (orders ⋈ lineitem, corpus ⋈ corpus
  * dedup passes, train ⋈ eval contamination sweeps).
  *
  * Notes that matter at scale:
  *  - both sides must agree on bucket COUNT and key for the
  *    exchange-free plan (`spark.sql.sources.bucketing.enabled` on,
  *    which is the default);
  *  - `repartition(n, key)` before the write produces ONE file per
  *    bucket, so the per-bucket `sortBy` order is total and the join
  *    needs no re-sort either — without it Spark must merge-sort
  *    multiple files per bucket at read;
  *  - bucket pruning applies to equality filters on the bucket key
  *    (scan skips buckets), the same way partition pruning applies to
  *    directory partitions.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (overwriting), one
    * file per bucket. A managed table's directory outlives the
    * in-memory catalog of the JVM that wrote it, and CTAS refuses a
    * pre-existing location — so drop any catalog entry AND clear a
    * stale location first, making the write idempotent across runs.
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketKey: String,
      numBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), tableName.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.repartition(numBuckets, col(bucketKey))
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketKey)
      .sortBy(bucketKey)
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** Inner equi-join of two same-bucketed tables on their bucket key.
    * Plans a sort-merge join with NO exchange on either side (the
    * write-time layout carries the distribution); the merge hint
    * keeps the demonstration independent of broadcast thresholds.
    */
  def bucketJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable).hint("merge")
    val r = spark.table(rightTable).hint("merge")
    l.join(r, l(leftKey) === r(rightKey))
  }
}
