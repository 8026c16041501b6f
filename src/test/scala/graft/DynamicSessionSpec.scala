package graft

import org.apache.spark.sql.functions._

/** D43 streaming_dynamic_sessions — planted boundary semantics: the
  * per-event gap drives the split, an event exactly ON a session end
  * merges (the sf0.1 boundary case the oracle's first cut split),
  * and only watermark-closed sessions emit.
  */
class DynamicSessionSpec extends SparkTestBase {
  import spark.implicits._

  test("per-type gaps split where a static gap would not; touch merges") {
    val dir = java.nio.file.Files.createTempDirectory("dynsess").toString
    Seq(
      // user 1: purchase at 0 (gap 900) then view at 1000 — past the
      // purchase's 900 s window → TWO sessions; a static 3600 s gap
      // would have merged them
      (1L, 0L, 1L, "purchase", 1.0),
      (2L, 1000L, 1L, "view", 2.0),
      // user 2: purchase at 0 (end 900), view at EXACTLY 900 → merges
      // (touch-inclusive), extending the end to 900 + 3600
      (3L, 0L, 2L, "purchase", 1.0),
      (4L, 900L, 2L, "view", 2.0),
      // watermark driver: far-future event (its own session, unclosed)
      (9L, 500000L, 9L, "view", 0.0))
      .toDF("event_id", "tsec", "user_id", "event_type", "value")
      .select($"event_id", timestamp_seconds($"tsec").as("ts"), $"user_id",
        $"event_type", $"value", lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("streaming_dynamic_sessions")(spark, dir)
      .select($"user_id", $"start_s", $"end_s", $"n_events", $"sum_value")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    // final watermark = 500000 − 3600: every user-1/2 session closed
    assert(got == Set(
      (1L, 0L, 900L, 1L, 1.0),       // purchase session closed alone
      (1L, 1000L, 4600L, 1L, 2.0),   // view session, 3600 s gap
      (2L, 0L, 4500L, 2L, 3.0)),     // touch at 900 merged, end 4500
      s"got $got")
  }
}
