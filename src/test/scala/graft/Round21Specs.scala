package graft

import org.apache.spark.sql.functions._

/** Round-11 statistics/forecast wave — closed-form plants:
  * B177 cramer_von_mises, B180 cliff_delta, B178 pages_trend_test,
  * B179 theil_u_forecast, B182 tracking_signal,
  * B181 croston_intermittent.
  */
class Round21Specs extends SparkTestBase {
  import spark.implicits._

  private def eventsDir(
      rows: Seq[(Long, Long, String, Double, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("r21").toString
    rows.map { case (eid, uid, ty, v, tsec) =>
      (eid, uid, ty, v, new java.sql.Timestamp(tsec * 1000L))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("cramer_von_mises: interleaved 2+2 lands on 8/64 exactly") {
    // purchase cents {1,3}, view {2,4}: d per distinct value =
    // m1·n2 − m2·n1 → 2,0,2,0; S = Σ l·d² = 8; T = 8/(2·2·16) = 0.125
    val dir = eventsDir(Seq(
      (1L, 1L, "purchase", 0.01, 100L), (2L, 1L, "purchase", 0.03, 200L),
      (3L, 2L, "view", 0.02, 300L), (4L, 2L, "view", 0.04, 400L)))
    val r = SparkEntry.queries("cramer_von_mises")(spark, dir).collect().head
    assert(r.getAs[Long]("n1") == 2L && r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Double]("cvm_stat") == 0.125)
  }

  test("cramer_von_mises: identical samples land on exactly 0") {
    val dir = eventsDir(Seq(
      (1L, 1L, "purchase", 0.01, 100L), (2L, 2L, "view", 0.01, 200L)))
    val r = SparkEntry.queries("cramer_von_mises")(spark, dir).collect().head
    assert(r.getAs[Double]("cvm_stat") == 0.0)
  }

  test("cliff_delta: total dominance = 1, perfect mix = 0") {
    val dom = eventsDir(Seq(
      (1L, 1L, "purchase", 0.03, 100L), (2L, 1L, "purchase", 0.04, 200L),
      (3L, 2L, "view", 0.01, 300L), (4L, 2L, "view", 0.02, 400L)))
    val r1 = SparkEntry.queries("cliff_delta")(spark, dom).collect().head
    assert(r1.getAs[Double]("cliff_delta") == 1.0)
    // purchase {1,4} vs view {2,3}: #(x>y) = 2, #(x<y) = 2 → δ = 0
    val mix = eventsDir(Seq(
      (1L, 1L, "purchase", 0.01, 100L), (2L, 1L, "purchase", 0.04, 200L),
      (3L, 2L, "view", 0.02, 300L), (4L, 2L, "view", 0.03, 400L)))
    val r2 = SparkEntry.queries("cliff_delta")(spark, mix).collect().head
    assert(r2.getAs[Double]("cliff_delta") == 0.0)
  }

  test("pages_trend_test: perfect alphabetical order z = +2, reversed z = -2") {
    // k=3 types, n=2 days, within-day ranks a<b<c both days:
    // r2 = 2·rank untied → L2 = 2L = 56 (the max),
    // mu = n·k(k+1)²/2 = 48, sigma = 4 → z = 2
    def plant(asc: Boolean) = {
      val (va, vc) = if (asc) (0.01, 0.03) else (0.03, 0.01)
      eventsDir(Seq(
        (1L, 1L, "a", va, 100L), (2L, 1L, "b", 0.02, 200L),
        (3L, 1L, "c", vc, 300L),
        (4L, 1L, "a", va, 86400L + 100L), (5L, 1L, "b", 0.02, 86400L + 200L),
        (6L, 1L, "c", vc, 86400L + 300L)))
    }
    val up = SparkEntry.queries("pages_trend_test")(spark, plant(true))
      .collect().head
    assert(up.getAs[Long]("n_days") == 2L && up.getAs[Long]("n_types") == 3L)
    assert(up.getAs[Long]("l2") == 56L)
    assert(up.getAs[Double]("z") == 2.0)
    val down = SparkEntry.queries("pages_trend_test")(spark, plant(false))
      .collect().head
    assert(down.getAs[Long]("l2") == 40L)
    assert(down.getAs[Double]("z") == -2.0)
  }

  test("theil_u_forecast: linear ramp hand-solves every column") {
    // daily totals 100·(d+1) cents, d = 0..8; eval rows d = 7, 8
    val dir = eventsDir((0 to 8).map(d =>
      ((d + 1).toLong, 1L, "purchase", (d + 1) * 1.0, d * 86400L + 100L)))
    val r = SparkEntry.queries("theil_u_forecast")(spark, dir).collect().head
    assert(r.getAs[Long]("n_eval") == 2L)
    assert(r.getAs[Double]("mae_naive") == 100.0)
    assert(r.getAs[Double]("mae_snaive") == 700.0)
    assert(r.getAs[Double]("mase") == 0.142857) // floor(200/1400 · 1e6)
    val expU1 = math.floor(math.sqrt(20000.0)
      / (math.sqrt(1450000.0) + math.sqrt(1130000.0)) * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("theil_u1") == expU1)
  }

  test("tracking_signal: monotone drift flags at |TS| = n >= 4, zig-zag stays 0") {
    // view: 100,200,300,400,500 cents on days 0..4 → e = +100 ×4,
    // TS = 4·400/400 = 4.0, |n·Σe| = 1600 = 4·Σ|e| → biased.
    // purchase: 100,0,100,0,100 → Σe = 0 → TS = 0, unbiased.
    val view = (0 to 4).map(d =>
      (d.toLong + 10, 1L, "view", (d + 1) * 1.0, d * 86400L + 50L))
    val pur = Seq(0, 2, 4).map(d =>
      (d.toLong + 20, 2L, "purchase", 1.0, d * 86400L + 60L))
    val dir = eventsDir(view ++ pur)
    val got = SparkEntry.queries("tracking_signal")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got("view").getAs[Long]("n_eval") == 4L)
    assert(got("view").getAs[Long]("sum_err") == 400L)
    assert(got("view").getAs[Double]("tracking_signal") == 4.0)
    assert(got("view").getAs[Int]("biased") == 1)
    assert(got("purchase").getAs[Long]("sum_err") == 0L)
    assert(got("purchase").getAs[Double]("tracking_signal") == 0.0)
    assert(got("purchase").getAs[Int]("biased") == 0)
  }

  test("croston_intermittent: two demands hand-solve the coupled fold") {
    // purchase grid days 0..3: demand 400 cents at d0, 800 at d3.
    // z = 400 → 400 + 0.25·400 = 500; p = 1 → 1 + 0.25·(3−1) = 1.5;
    // forecast = floor(500/1.5·1e6 + 0.5)/1e6 = 333.333333
    val dir = eventsDir(Seq(
      (1L, 1L, "purchase", 4.0, 100L),
      (2L, 1L, "purchase", 8.0, 3 * 86400L + 100L),
      (3L, 2L, "view", 9.9, 5 * 86400L)))
    val r = SparkEntry.queries("croston_intermittent")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Long]("n_demand_days") == 2L)
    assert(r.getAs[Double]("level") == 500.0)
    assert(r.getAs[Double]("interval") == 1.5)
    assert(r.getAs[Double]("forecast") == 333.333333)
  }
}
