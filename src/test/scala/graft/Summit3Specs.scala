package graft

import org.apache.spark.sql.functions._

/** Planted specs for the round-10 third wave: U-shaped attribution
  * (B127) and streaming EMD drift (D42).
  */
class PositionAttributionSpec extends SparkTestBase {
  import spark.implicits._

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("uattr").toString
    rows.toDF("event_id", "tsec", "user_id", "event_type", "value")
      .select($"event_id", timestamp_seconds($"tsec").as("ts"), $"user_id",
        $"event_type", $"value", lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("40/20/40 with exact remainders; solo/pair/direct degenerations") {
    val dir = eventsDir(Seq(
      // user 1: 4 clicks then a $1.03 purchase (103 cents):
      // first 41c... no — first40 = 103*40//100 = 41, last 41,
      // mid pot = 21 over 2 mids = 10+remainder1 → 11, 10
      (1L, 100L, 1L, "click", 0.0), (2L, 200L, 1L, "click", 0.0),
      (3L, 300L, 1L, "click", 0.0), (4L, 400L, 1L, "click", 0.0),
      (5L, 450L, 1L, "purchase", 1.03),
      // user 2: one click then purchase → solo gets all 99 cents
      (6L, 100L, 2L, "click", 0.0), (7L, 200L, 2L, "purchase", 0.99),
      // user 3: two clicks → equal split of 101: 51 (earlier), 50
      (8L, 100L, 3L, "click", 0.0), (9L, 150L, 3L, "click", 0.0),
      (10L, 200L, 3L, "purchase", 1.01),
      // user 4: no clicks → direct
      (11L, 500L, 4L, "purchase", 2.00)))
    val got = SparkEntry.queries("attribution_position")(spark, dir)
      .select($"purchase_id", $"click_id", $"role", $"credit_cents")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getString(2), r.getLong(3)))
    val byPurchase = got.groupBy(_._1)
    // U-shape: 41 / 11 / 10 / 41 in click-time order
    val u = byPurchase(5L).sortBy(_._2).map(r => (r._3, r._4)).toSeq
    assert(u == Seq(("first", 41L), ("mid", 11L), ("mid", 10L),
      ("last", 41L)), s"got $u")
    assert(byPurchase(7L).toSeq.map(r => (r._3, r._4)) ==
      Seq(("solo", 99L)))
    assert(byPurchase(10L).sortBy(_._2).map(r => (r._3, r._4)).toSeq ==
      Seq(("first", 51L), ("last", 50L)))
    assert(byPurchase(11L).toSeq.map(r => (r._3, r._4)) ==
      Seq(("direct", 200L)))
  }

  test("corpus ledger: every purchase's credits re-add to its cents") {
    val credits = SparkEntry.queries("attribution_position")(spark, sfDir)
      .groupBy($"purchase_id")
      .agg(sum($"credit_cents").as("credited"))
    val purchases = GraftSession.table(spark, sfDir, "events")
      .filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"),
        floor($"value" * 100).cast("long").as("cents"))
    val bad = credits.join(purchases, "purchase_id")
      .filter($"credited" =!= $"cents").count()
    assert(bad == 0L, s"$bad purchases failed the exact-ledger re-add")
    assert(credits.count() == purchases.count(), "lost or invented purchases")
  }
}

class StreamingEmdSpec extends SparkTestBase {
  import spark.implicits._

  test("point-mass halves: EMD is exactly the bin distance") {
    val dir = java.nio.file.Files.createTempDirectory("semd").toString
    // first half (ref): value 0.00 → bin 0; second half: 50.00 →
    // cents 5000 → bin 5. EMD = 5 bins exactly.
    val rows = (0L until 8L).map(i =>
      (i, i * 100L, 1L, "click", if (i < 4) 0.0 else 50.0))
    rows.toDF("event_id", "tsec", "user_id", "event_type", "value")
      .select($"event_id", timestamp_seconds($"tsec").as("ts"), $"user_id",
        $"event_type", $"value", lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // split = (0 + 700)//2 = 350 → ref = {0,100,200,300}, live = rest
    val got = SparkEntry.queries("streaming_drift_emd")(spark, dir)
      .select($"event_type", $"n_ref", $"n_live", $"emd_bins")
      .as[(String, Long, Long, Double)].collect()
    assert(got.toSeq == Seq(("click", 4L, 4L, 5.0)), s"got ${got.toSeq}")
  }

  test("streamed EMD equals a sequential recomputation from raw events") {
    val ev = GraftSession.table(spark, sfDir, "events")
      .select($"event_type", expr("ts div 1000000000").as("tsec"),
        floor($"value" * 100 + lit(0.5)).cast("long").as("c"))
      .as[(String, Long, Long)].collect()
    val split = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val expect = ev.map(_._1).distinct.map { t =>
      val bins = ev.filter(_._1 == t)
        .map { case (_, ts, c) => (ts >= split, math.min(c / 1000, 63L)) }
      val ref = bins.filter(!_._1).map(_._2)
      val liv = bins.filter(_._1).map(_._2)
      val (nr, nl) = (ref.length.toLong, liv.length.toLong)
      var (crc, clc, num) = (0L, 0L, 0L)
      for (b <- 0L to 63L) {
        crc += ref.count(_ == b); clc += liv.count(_ == b)
        num += math.abs(crc * nl - clc * nr)
      }
      val emd = math.floor(num.toDouble / (nr.toDouble * nl.toDouble)
        * 1000000 + 0.5) / 1000000
      t -> ((nr, nl, num, emd))
    }.toMap
    val got = SparkEntry.queries("streaming_drift_emd")(spark, sfDir)
      .select($"event_type", $"n_ref", $"n_live", $"emd_num", $"emd_bins")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
    for (t <- got.keySet)
      assert(got(t) == expect(t), s"$t: got ${got(t)} want ${expect(t)}")
  }
}
