package graft

import org.apache.spark.sql.functions._

/** streaming_bottomk_sample's merge-schedule independence: the
  * streamed complete-mode snapshot must equal the BATCH bottom-k
  * aggregate on the same table — bottom-k is a lattice, so the
  * incremental per-batch state merges cannot change the result. The
  * oracle gate already pins the streamed rows against the fmix64
  * replay; this spec pins stream ≡ batch within the engine (a
  * different failure mode: a state-merge bug could diverge from
  * batch while the small-SF replay happens to agree).
  */
class StreamingBottomkSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed bottom-k sample equals the batch aggregate") {
    val streamed = SparkEntry.queries("streaming_bottomk_sample")(spark, sfDir)
      .select($"event_type", $"rnk", $"event_id")
      .as[(String, Int, Long)].collect().toSet

    val batch = GraftSession.table(spark, sfDir, "events")
      .groupBy($"event_type")
      .agg(graft.functions.BottomKSample.bottomkSample($"event_id", 5).as("sample"))
      .select($"event_type", posexplode($"sample").as(Seq("pos", "event_id")))
      .select($"event_type", ($"pos" + 1).cast("int").as("rnk"), $"event_id")
      .as[(String, Int, Long)].collect().toSet

    assert(streamed === batch)
    assert(streamed.nonEmpty && streamed.groupBy(_._1).forall(_._2.size == 5),
      "every event_type must carry a full k=5 sample at this SF")
  }
}
