package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: multi-dimensional file-skipping
  * (SURVEY.md §2 B42).
  *
  * A linear sort on x gives parquet min/max stats that prune scans on
  * x only — a predicate on y touches every file. Interleaving the
  * bits of (x, y) into one z-value and range-partitioning + sorting
  * the write on it tiles the space: each file covers a compact
  * rectangle, so min/max stats prune on EITHER dimension (~√F of F
  * files for a band predicate instead of all F). This is the layout
  * pass behind DB "OPTIMIZE ZORDER BY" features, expressed as plain
  * Spark: the z-value is a composition of native bitwise expressions
  * (fully codegen, no UDF, no custom Expression needed), the write is
  * `repartitionByRange(z).sortWithinPartitions(z)`.
  *
  * Contract: coordinates must be non-negative and fit in 31 bits
  * (callers with raw doubles/skew should quantile-bucket first —
  * rank or `ntile` — which also equalizes density). Bits interleave
  * x at even positions, y at odd.
  */
object ZOrder {

  /** Spread the low 31 bits of `c` to even bit positions (Morton
    * part1by1, the standard mask cascade) — native column ops only.
    */
  private def spread(c: Column): Column = {
    val masks = Seq(
      (16, 0x0000FFFF0000FFFFL),
      (8, 0x00FF00FF00FF00FFL),
      (4, 0x0F0F0F0F0F0F0F0FL),
      (2, 0x3333333333333333L),
      (1, 0x5555555555555555L))
    masks.foldLeft(c.cast("long").bitwiseAND(lit(0x7FFFFFFFL))) {
      case (x, (shift, mask)) =>
        x.bitwiseOR(shiftleft(x, shift)).bitwiseAND(lit(mask))
    }
  }

  /** 62-bit z-value of two 31-bit non-negative coordinates. */
  def zValue(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Write `df` tiled by z(x, y) into `numFiles` files with per-file
    * min/max stats compact in BOTH dimensions.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      path: String, numFiles: Int): Unit =
    df.withColumn("_z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
