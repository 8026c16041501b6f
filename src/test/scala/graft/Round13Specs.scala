package graft

import org.apache.spark.sql.functions._

/** Round-12 second-batch specs — Kruskal-Wallis, Hodges-Lehmann,
  * log-rank, and the streaming Page-Hinkley drift alarm.
  */

/** B142 kruskal_wallis — the textbook two-group case hand-solves to
  * H = 2.4; all-tied data pins the tie-corrected NULL.
  */
class KruskalWallisSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Double)]): org.apache.spark.sql.Row = {
    val dir = java.nio.file.Files.createTempDirectory("kw").toString
    rows.toDF("o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    SparkEntry.queries("kruskal_wallis")(spark, dir).collect().head
  }

  test("A{1,2} vs B{3,4}: H = 2.4 exactly, no ties → corrected equal") {
    // ranks 1,2,3,4; R_A=3, R_B=7; H = 12/20·(9/2+49/2) − 15 = 2.4
    val r = run(Seq("A" -> 0.01, "A" -> 0.02, "B" -> 0.03, "B" -> 0.04))
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("n_rows") == 4L)
    assert(r.getAs[Double]("h_stat") == 2.4)
    assert(r.getAs[Double]("h_tie_corrected") == 2.4)
  }

  test("all values tied: H = 0, tie correction degenerates to NULL") {
    val r = run(Seq("A" -> 5.0, "A" -> 5.0, "B" -> 5.0, "B" -> 5.0))
    assert(r.getAs[Double]("h_stat") == 0.0)
    assert(r.isNullAt(r.fieldIndex("h_tie_corrected")))
  }

  test("corpus: 5 groups, H defined and non-negative") {
    val r = SparkEntry.queries("kruskal_wallis")(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_groups") == 5L)
    assert(r.getAs[Double]("h_stat") >= 0.0)
    assert(r.getAs[Double]("h_tie_corrected")
      >= r.getAs[Double]("h_stat"))
  }
}

/** B141 hodges_lehmann — the four-pair textbook case lands on the
  * lower weighted median of the differences.
  */
class HodgesLehmannSpec extends SparkTestBase {
  import spark.implicits._

  test("purchases {10,20} vs views {1,2}: diffs {8,9,18,19} → HL = 9") {
    val dir = java.nio.file.Files.createTempDirectory("hl").toString
    val t0 = 19723L * 86400
    val rows = Seq(("purchase", 10.5), ("purchase", 20.5),
      ("view", 1.2), ("view", 2.2))
    rows.zipWithIndex.map { case ((ty, v), i) =>
      (i.toLong, (t0 + i) * 1000000000L, 1L, ty, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("hodges_lehmann")(spark, dir).collect().head
    assert(r.getAs[Long]("n1") == 2L)
    assert(r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Long]("n_pairs") == 4L)
    assert(r.getAs[Long]("hl_shift") == 9L)
  }

  test("corpus: the shift estimate sits inside the observed dollar range") {
    val r = SparkEntry.queries("hodges_lehmann")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_pairs")
      == r.getAs[Long]("n1") * r.getAs[Long]("n2"))
    assert(math.abs(r.getAs[Long]("hl_shift")) < 400L)
  }
}

/** B140 log_rank_conversion — a hand-built two-cohort corpus where
  * group 0 converts on days 1 and 2 and group 1 never converts;
  * every risk-set term is computed by hand.
  */
class LogRankSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-solved risk sets: O1=0, E1=1.166666, exact chi-square") {
    val dir = java.nio.file.Files.createTempDirectory("lr").toString
    val t0 = 19723L * 86400
    val d = 86400L
    // users 2,4 (grp 0) convert at days 1,2; users 1,3 (grp 1) never;
    // a final view event pins the horizon at day 3
    val rows = Seq(
      (1L, t0, 1L, "signup", 1.0), (2L, t0, 2L, "signup", 1.0),
      (3L, t0, 3L, "signup", 1.0), (4L, t0, 4L, "signup", 1.0),
      (5L, t0 + d, 2L, "purchase", 5.0),
      (6L, t0 + 2 * d, 4L, "purchase", 5.0),
      (7L, t0 + 3 * d, 1L, "view", 1.0))
    rows.map { case (id, sec, uid, ty, v) =>
      (id, sec * 1000000000L, uid, ty, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("log_rank_conversion")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n0") == 2L)
    assert(r.getAs[Long]("n1") == 2L)
    assert(r.getAs[Long]("o1") == 0L)
    // E1 = 1·2e6//4 + 1·2e6//3 = 500000 + 666666 (e6 units)
    assert(r.getAs[Double]("e1") == 1.166666)
    // V  = 12e6//48 + 4e6//18 = 250000 + 222222 (e6 units)
    val expected = {
      val diff = 0.0 * 1000000 - 1166666.0
      math.floor(diff * diff / (472222.0 * 1000000) * 1000000 + 0.5) / 1000000
    }
    assert(r.getAs[Double]("chi2_logrank") == expected)
  }

  test("corpus: cohorts populated, chi-square defined and non-negative") {
    val r = SparkEntry.queries("log_rank_conversion")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n0") > 0 && r.getAs[Long]("n1") > 0)
    assert(r.getAs[Long]("o1") >= 0)
    assert(r.getAs[Double]("chi2_logrank") >= 0.0)
  }
}

/** D47 streaming_page_hinkley — a constant prefix never alarms; a
  * sustained mean jump past λ = 50 dollars does.
  */
class PageHinkleySpec extends SparkTestBase {
  import spark.implicits._

  test("constant series: PH = 0; sustained jump: alarms fire") {
    val dir = java.nio.file.Files.createTempDirectory("ph").toString
    val t0 = 19723L * 86400
    val rows =
      // flat: 20 events at $10 — PH stays exactly 0
      (0 until 20).map(i =>
        (i.toLong, (t0 + i) * 1000000000L, 1L, "flat", 10.0, "{}")) ++
      // jump: 10 at $10 then 10 at $100 — the mean shift accumulates
      (0 until 10).map(i =>
        (100L + i, (t0 + i) * 1000000000L, 2L, "jump", 10.0, "{}")) ++
      (0 until 10).map(i =>
        (110L + i, (t0 + 10 + i) * 1000000000L, 2L, "jump", 100.0, "{}")) ++
      // watermark pusher 3 hours later
      Seq((999L, (t0 + 10800) * 1000000000L, 3L, "push", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("streaming_page_hinkley")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val flat = out("flat")
    assert(flat.getAs[Long]("n_folded") == 20L)
    assert(flat.getAs[Long]("max_ph_e6") == 0L)
    assert(flat.getAs[Long]("n_alarms") == 0L)
    val jump = out("jump")
    assert(jump.getAs[Long]("n_folded") == 20L)
    assert(jump.getAs[Long]("max_ph_e6") > 5000L * 1000000)
    assert(jump.getAs[Long]("n_alarms") >= 1L)
  }

  test("corpus stream: every type folds below the watermark, PH bounded") {
    val out = SparkEntry.queries("streaming_page_hinkley")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_folded") > 0)
      assert(r.getAs[Long]("max_ph_e6") >= 0)
      assert(r.getAs[Long]("n_alarms") <= r.getAs[Long]("n_folded"))
    }
  }
}
