package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Loud memory guards for operators whose contract collects one
  * bounded array per key before exploding it (the B45 small-group
  * rule: `timeseries_subseq_match`, `event_pattern_match`). The
  * contract is safe for session/series data where a key's history is
  * bounded — but at 100 TB a power key's series is unbounded and one
  * task would silently eat it until the executor OOMs, with nothing
  * in the failure naming the offending key or operator. Same
  * convention as `spark.graft.topk.maxKeysPerPartition`
  * (plans/TopKPerKey): a configurable ceiling that fails the query
  * with an actionable message instead of an OOM.
  */
object Guards {
  /** Max per-key collected-series length before the query fails
    * loudly. Default 1M elements ≈ tens of MB per row — beyond any
    * legitimate per-user session history, well under task OOM.
    */
  val MaxSeriesKey = "spark.graft.collect.maxSeriesLength"
  val MaxSeriesDefault = 1000000

  /** Wraps a collected per-key array column so that any row whose
    * array exceeds the configured ceiling raises a descriptive error
    * (executor-side, codegen'd `raise_error`) instead of proceeding
    * toward an OOM. The guard is fused into the value itself — not a
    * side column Catalyst could prune away.
    */
  def boundedSeries(s: SparkSession, arr: Column, operator: String): Column = {
    val lim = s.conf.get(MaxSeriesKey, MaxSeriesDefault.toString).toInt
    when(size(arr) > lim,
      raise_error(concat(
        lit(s"$operator: per-key collected series length "),
        size(arr).cast("string"),
        lit(s" exceeds $MaxSeriesKey=$lim — a power key this size would " +
          "OOM a single task; raise the limit, pre-aggregate, or shard " +
          "the key upstream"))))
      .otherwise(arr)
  }
}
