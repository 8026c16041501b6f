package graft

import org.apache.spark.sql.functions._

/** D52 `streaming_join_state_audit` — the join-state retention rule
  * pinned at its exact boundaries on a planted corpus: with global
  * watermark W = min(max_l, max_r) − delay, the LEFT buffer keeps
  * l_ts ≥ W − gap (a click can match future purchases until the
  * watermark passes its window END) and evicts l_ts = W − gap − 1;
  * the RIGHT buffer keeps r_ts ≥ W and evicts r_ts = W − 1. These
  * fenceposts are what the oracle's closed-form retention rule
  * encodes — this spec is the measurement that justified it.
  */
class JoinStateAuditSpec extends SparkTestBase {
  import spark.implicits._

  test("planted boundary corpus pins both eviction fenceposts") {
    // maxClick = maxPur = 13600 → W = 10000; left bound 8200,
    // right bound 10000 — one row planted on each side of each.
    val dir = java.nio.file.Files.createTempDirectory("jsa").toString
    Seq((1L, 1L, "click", 1.0, 8199L), (2L, 1L, "click", 1.0, 8200L),
      (3L, 1L, "click", 1.0, 9999L), (4L, 1L, "click", 1.0, 13600L),
      (5L, 2L, "purchase", 1.0, 9999L), (6L, 2L, "purchase", 1.0, 10000L),
      (7L, 2L, "purchase", 1.0, 13600L))
      .map { case (eid, uid, ty, v, tsec) =>
        (eid, uid, ty, v, new java.sql.Timestamp(tsec * 1000L))
      }.toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("streaming_join_state_audit")(spark, dir)
      .collect().head
    // left: 8200, 9999, 13600 survive; 8199 evicted
    assert(r.getAs[Long]("n_left_state") == 3L)
    assert(r.getAs[Long]("n_left_expected") == 3L)
    // right: 10000, 13600 survive; 9999 evicted
    assert(r.getAs[Long]("n_right_state") == 2L)
    assert(r.getAs[Long]("n_right_expected") == 2L)
  }
}
