package graft

import org.apache.spark.sql.functions._

/** D50 `streaming_state_ttl_audit` — the state-eviction capacity
  * contract, pinned on a planted CHURN stream: three "early" users
  * emit and go idle (their timers fire under the advancing watermark
  * and the processor clears sess + deadline), two "late" users stay
  * live. The state store — read back through the statestore data
  * source — must hold rows for exactly the live keys (2), never the
  * all-time keys (5), and the registered-timer count must match:
  * nothing lingers for an evicted key.
  */
class StateTtlAuditSpec extends SparkTestBase {
  import spark.implicits._

  test("state store tracks live keys, not all-time keys, under churn") {
    val dir = java.nio.file.Files.createTempDirectory("ttl").toString
    // GapS = 1800, DelayS = 3600 (the query's pinned constants).
    // Early users 1-3: last event at t=1000 → deadline 2800.
    // Late users 10-11: events at t=10000 → watermark 6400 ≥ 2800
    // (early evicted), deadlines 11800 > 6400 (late live).
    val rows = Seq(
      (1L, 1L, 500L), (2L, 1L, 1000L),
      (3L, 2L, 800L), (4L, 2L, 1000L),
      (5L, 3L, 1000L),
      (6L, 10L, 9000L), (7L, 10L, 10000L),
      (8L, 11L, 10000L))
    rows.map { case (eid, uid, tsec) =>
      (eid, uid, "view", 1.0, new java.sql.Timestamp(tsec * 1000L))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = SparkEntry.queries("streaming_state_ttl_audit")(spark, dir)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_live_expected") == 2L)
    assert(r.getAs[Long]("n_sess_rows") == 2L,
      "sess state must hold only the live keys")
    assert(r.getAs[Long]("n_deadline_rows") == 2L,
      "deadline state must be cleared on eviction")
    assert(r.getAs[Long]("n_timers") == 2L,
      "evicted keys must not leak registered timers")
  }

  test("all keys idle → state store fully drained") {
    val dir = java.nio.file.Files.createTempDirectory("ttl2").toString
    // one late lone event (user 99) advances the watermark past
    // every other deadline AND its own? No — its own deadline
    // (20000 + 1800) stays above wm (20000 - 3600), so exactly ONE
    // key survives; users 1-5's state must be gone.
    val rows = (1L to 5L).map(u => (u, u, 1000L)) :+ (99L, 99L, 20000L)
    rows.map { case (eid, uid, tsec) =>
      (eid, uid, "view", 1.0, new java.sql.Timestamp(tsec * 1000L))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("streaming_state_ttl_audit")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n_live_expected") == 1L)
    assert(r.getAs[Long]("n_sess_rows") == 1L)
    assert(r.getAs[Long]("n_deadline_rows") == 1L)
    assert(r.getAs[Long]("n_timers") == 1L)
  }
}
