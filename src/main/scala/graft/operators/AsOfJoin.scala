package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the latest right
  * row with the same key and right.ts <= left.ts (the classic
  * stream-enrichment operator — "state of X as of this event").
  *
  * Spark lacks a native as-of join; the naive formulations are a
  * range join (O(n·m) BroadcastNestedLoop) or a groupBy-collect.
  * This implementation is the UNION-SORT form: tag both sides, union
  * them, and carry the last right payload forward with
  * `last(..., ignoreNulls) over (partition by key order by ts, tag)`
  * — ONE shuffle on the key, linear work, no per-key state
  * materialized. At 100 TB this behaves like any keyed window: AQE
  * splits skewed partitions, and the payload travels as one struct
  * column.
  *
  * Tie semantics: right rows sort before left rows at equal ts
  * (tag 0 < 1) == inclusive `left.ts >= right.ts`. Right rows must
  * be unique per (key, ts) — pre-dedupe to make "latest" well
  * defined (e.g. keep max sequence id).
  */
object AsOfJoin {

  /** @param valueCols right-side payload columns to attach (emitted
    *                  with `asof_` prefix); right must contain
    *                  `keyCol` + `tsCol` + valueCols.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val taggedRight = right.select(
      col(keyCol), col(tsCol).as("_asof_ts"), lit(0).as("_asof_tag"),
      struct(valueCols.map(col): _*).as("_asof_payload"))
    val taggedLeft = left
      .withColumn("_asof_ts", col(tsCol))
      .withColumn("_asof_tag", lit(1))
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_asof_ts"), col("_asof_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_asof_carried", last(col("_asof_payload"), ignoreNulls = true).over(w))
      .filter(col("_asof_tag") === 1)
      .select(
        leftCols.map(col) ++
          valueCols.map(v => col(s"_asof_carried.$v").as(s"asof_$v")): _*)
  }

  /** Forward as-of join: for every left row, the EARLIEST right row
    * with the same key and right.ts >= left.ts ("next event at or
    * after") — the mirror of [[asofBackward]]: same union-sort single
    * shuffle, but the payload is carried BACKWARD by a
    * `first(..., ignoreNulls)` over `[current row, unbounded
    * following]`. Tie semantics inclusive: left rows sort before
    * right rows at equal ts (tag 0 < 1), so a right row at exactly
    * left.ts is taken.
    */
  def asofForward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val taggedRight = right.select(
      col(keyCol), col(tsCol).as("_asof_ts"), lit(1).as("_asof_tag"),
      struct(valueCols.map(col): _*).as("_asof_payload"))
    val taggedLeft = left
      .withColumn("_asof_ts", col(tsCol))
      .withColumn("_asof_tag", lit(0))
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_asof_ts"), col("_asof_tag"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      .withColumn("_asof_carried", first(col("_asof_payload"), ignoreNulls = true).over(w))
      .filter(col("_asof_tag") === 0)
      .select(
        leftCols.map(col) ++
          valueCols.map(v => col(s"_asof_carried.$v").as(s"asof_$v")): _*)
  }
}
