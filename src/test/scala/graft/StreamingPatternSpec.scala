package graft

import graft.streaming.{PatEv, TwsPattern}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** TwsPattern (D34 streaming CEP): session split / ordering /
  * session_seq semantics the SF gate can't isolate, and the loud
  * bounded-session guard.
  */
class StreamingPatternSpec extends SparkTestBase {
  import spark.implicits._

  private def runPattern(maxLen: Int)(feed: (MemoryStream[PatEv],
      org.apache.spark.sql.streaming.StreamingQuery) => Unit): Seq[(Long, Long, String)] = {
    val prev = graft.sources.Sources.useRocksDBStateStore(spark)
    try {
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[PatEv]
      val name = s"tws_pat_test_${System.nanoTime()}"
      val q = TwsPattern.patterns(ms.toDS(), gapS = 10, delayS = 0, maxLen)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .start()
      try {
        feed(ms, q)
        spark.table(name).as[(Long, Long, String)].collect().toSeq
      } finally {
        q.stop()
        spark.catalog.dropTempView(name)
      }
    } finally graft.sources.Sources.restoreStateStore(spark, prev)
  }

  test("sessions split on the gap, sort within the session, number in order") {
    val out = runPattern(maxLen = 100) { (ms, q) =>
      // batch 0: user 1's first session arrives OUT OF ORDER (C at
      // t=105 before V at t=100) — the close-time sort must restore it
      ms.addData(PatEv(1L, 2L, 105L, "C"), PatEv(1L, 1L, 100L, "V"))
      q.processAllAvailable()
      // batch 1: t=200 crosses the 10s gap in-batch → session 1
      // closes as "VC", session 2 opens
      ms.addData(PatEv(1L, 3L, 200L, "P"))
      q.processAllAvailable()
      // batch 2: another user advances the watermark to 300 → user
      // 1's (200+10)s timer fires and closes session 2 as "P"; user
      // 2's own session (deadline 310 > watermark 300) stays open
      ms.addData(PatEv(2L, 4L, 300L, "E"))
      q.processAllAvailable()
    }
    assert(out.toSet == Set((1L, 1L, "VC"), (1L, 2L, "P")),
      s"got $out")
  }

  test("batch-split invariance: one batch vs per-event batches vs " +
      "mid-session splits emit the identical set (r14 batch-local fold)") {
    // user 1: three sessions (gap 10) — VC | PE | V; user 2 advances
    // the watermark so sessions 1-3 all close. Exercises every state
    // path of the folded handleInputRows: in-batch close of a session
    // whose earlier events live in state (state ++ pending merge),
    // fully-in-batch close (pending only), multi-close batches (seqNo
    // folded once), carry of an open session started in a previous
    // batch (appendList without clear) and after an in-batch close
    // (clear + appendList), and the timer close from persisted state.
    val evs = Seq(
      PatEv(1L, 1L, 100L, "V"), PatEv(1L, 2L, 105L, "C"),
      PatEv(1L, 3L, 200L, "P"), PatEv(1L, 4L, 203L, "E"),
      PatEv(1L, 5L, 300L, "V"), PatEv(2L, 6L, 400L, "E"))
    val expected = Set((1L, 1L, "VC"), (1L, 2L, "PE"), (1L, 3L, "V"))
    val splits: Seq[Seq[Seq[PatEv]]] = Seq(
      Seq(evs),                        // everything in one batch
      evs.map(Seq(_)),                 // one event per batch
      Seq(evs.take(1), evs.drop(1)),   // split inside session 1
      Seq(evs.take(4), evs.drop(4)))   // split at a session boundary
    splits.foreach { batches =>
      val out = runPattern(maxLen = 100) { (ms, q) =>
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      }
      assert(out.toSet == expected,
        s"split ${batches.map(_.size).mkString("+")} got $out")
    }
  }

  test("a session over the collected-series ceiling fails loudly") {
    val thrown = intercept[Throwable] {
      runPattern(maxLen = 2) { (ms, q) =>
        ms.addData(PatEv(1L, 1L, 100L, "V"), PatEv(1L, 2L, 101L, "V"),
          PatEv(1L, 3L, 102L, "C"))
        q.processAllAvailable()
      }
    }
    val messages = Iterator.iterate[Throwable](thrown)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(messages.contains("streaming_pattern_match") &&
      messages.contains(graft.functions.Guards.MaxSeriesKey),
      s"guard message missing operator/config key:\n$messages")
  }
}
