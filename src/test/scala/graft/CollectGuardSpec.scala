package graft

import graft.functions.Guards

/** The collect-then-explode family's bounded-series contract is a
  * GUARD, not a convention: a key whose collected series exceeds
  * `spark.graft.collect.maxSeriesLength` must fail loudly with an
  * actionable message naming the operator — never OOM a task.
  * Under the default (1M) ceiling the guard is invisible and oracle
  * rows are unchanged (CORRECTNESS gate covers that).
  */
class CollectGuardSpec extends SparkTestBase {

  private def withLimit[T](n: Int)(body: => T): T = {
    spark.conf.set(Guards.MaxSeriesKey, n.toString)
    try body finally spark.conf.unset(Guards.MaxSeriesKey)
  }

  private def rootCause(t: Throwable): Throwable =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq.last

  test("timeseries_subseq_match fails loudly on an over-limit key") {
    withLimit(10) {
      val err = intercept[Throwable] {
        SparkEntry.queries("timeseries_subseq_match")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      val msg = rootCause(err).getMessage + " " + err.getMessage
      assert(msg.contains("timeseries_subseq_match"), s"unhelpful error: $msg")
      assert(msg.contains(Guards.MaxSeriesKey), s"unhelpful error: $msg")
    }
  }

  test("event_pattern_match fails loudly on an over-limit session") {
    withLimit(1) {
      val err = intercept[Throwable] {
        SparkEntry.queries("event_pattern_match")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      val msg = rootCause(err).getMessage + " " + err.getMessage
      assert(msg.contains("event_pattern_match"), s"unhelpful error: $msg")
    }
  }

  test("under the default ceiling both queries return their oracle rows") {
    assert(SparkEntry.queries("timeseries_subseq_match")(spark, sfDir).count() > 0)
    assert(SparkEntry.queries("event_pattern_match")(spark, sfDir).count() > 0)
  }
}
