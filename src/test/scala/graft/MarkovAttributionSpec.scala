package graft

import org.apache.spark.sql.functions._

/** B128 attribution_markov — planted-chain ground truth (the oracle
  * pins cross-engine agreement; this pins the MODEL: removal effects
  * must reflect actual path dependence, not just engine parity).
  */
class MarkovAttributionSpec extends SparkTestBase {
  import spark.implicits._

  private def eventsDir(rows: Seq[(Long, Long, Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("markov").toString
    rows.toDF("event_id", "tsec", "user_id", "event_type")
      .select($"event_id", timestamp_seconds($"tsec").as("ts"), $"user_id",
        $"event_type", lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("hand-solved chain: the converting channel earns all the credit") {
    // u1: A→purchase, u2: A→purchase, u3: B (never converts)
    // chain: start→A 2/3, start→B 1/3, A→conv 1, B→null 1
    // conv_base = 2/3; remove A → 0 (re = 1); remove B → 2/3 (re = 0)
    val dir = eventsDir(Seq(
      (1L, 100L, 1L, "click"), (2L, 200L, 1L, "purchase"),
      (3L, 100L, 2L, "click"), (4L, 200L, 2L, "purchase"),
      (5L, 100L, 3L, "view")))
    val got = SparkEntry.queries("attribution_markov")(spark, dir)
      .select($"channel", $"conv_base", $"conv_removed", $"removal_effect",
        $"share")
      .as[(String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set("click", "view"), s"channels ${got.keySet}")
    assert(got("click") == (("click", 0.666667, 0.0, 1.0, 1.0)),
      s"click ${got("click")}")
    assert(got("view") == (("view", 0.666667, 0.666667, 0.0, 0.0)),
      s"view ${got("view")}")
  }

  test("journey segmentation: a purchase closes its journey") {
    // one user: A, purchase, B, purchase — journey 0 = [start,A,conv],
    // journey 1 = [start,B,conv]: BOTH channels convert equally
    val dir = eventsDir(Seq(
      (1L, 100L, 1L, "click"), (2L, 200L, 1L, "purchase"),
      (3L, 300L, 1L, "view"), (4L, 400L, 1L, "purchase")))
    val got = SparkEntry.queries("attribution_markov")(spark, dir)
      .select($"channel", $"removal_effect", $"share")
      .as[(String, Double, Double)].collect().map(r => r._1 -> r).toMap
    // chain: start→A ½, start→B ½, A→conv 1, B→conv 1 → conv_base = 1;
    // removing either channel halves it → re = 0.5 each, share 0.5
    assert(got("click") == (("click", 0.5, 0.5)), s"${got("click")}")
    assert(got("view") == (("view", 0.5, 0.5)), s"${got("view")}")
  }

  test("corpus run: probabilities in range, shares sum to ~1") {
    val rows = SparkEntry.queries("attribution_markov")(spark, sfDir)
      .select($"channel", $"conv_base", $"conv_removed", $"removal_effect",
        $"share")
      .as[(String, Double, Double, Double, Double)].collect()
    assert(rows.length >= 3, s"only ${rows.length} channels")
    assert(rows.map(_._2).distinct.length == 1, "conv_base differs per row")
    assert(rows.forall(r => r._2 > 0 && r._2 <= 1.0), s"conv_base ${rows.toSeq}")
    assert(rows.forall(r => r._4 >= 0 && r._4 <= 1.0), "re out of range")
    val shareSum = rows.map(_._5).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    // removing a channel can only divert mass away from conversion
    assert(rows.forall(r => r._3 <= r._2 + 1e-9), "removal raised conv")
  }
}
