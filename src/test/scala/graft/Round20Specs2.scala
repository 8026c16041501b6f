package graft

import org.apache.spark.sql.functions._

/** B160 ols_influence / B161 seasonal_mann_kendall / C131
  * text_sentence_stats / C132 ngram_novelty — closed-form plants.
  */
class InfluenceSeasonalSpec extends SparkTestBase {
  import spark.implicits._

  private def ordersOnDays(days: Seq[Int]): String = {
    val dir = java.nio.file.Files.createTempDirectory("infl").toString
    days.zipWithIndex.map { case (d, i) =>
      (i.toLong, java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(d.toLong)), (i + 1) * 1.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("ols_influence: gapped calendar puts the far day past the 4/n cut") {
    val rows = SparkEntry.queries("ols_influence")(
      spark, ordersOnDays(Seq(0, 1, 2, 3, 10)))
      .collect().map(r => r.getAs[Long]("day") -> r).toMap
    assert(rows.size == 5)
    val expected = Map(0L -> 0.363057, 1L -> 0.27707, 2L -> 0.22293,
      3L -> 0.200637, 10L -> 0.936306)
    expected.foreach { case (d, h) =>
      assert(rows(d).getAs[Double]("leverage") == h, s"day $d")
      assert(rows(d).getAs[Int]("high_leverage") == (if (d == 10L) 1 else 0))
    }
  }

  test("seasonal MK: 14 strictly increasing days → S=7, var18=126, z=6/√7") {
    val dir = java.nio.file.Files.createTempDirectory("smk").toString
    (0 until 14).map { i =>
      (i.toLong, java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(i.toLong)), (i + 1) * 1.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = SparkEntry.queries("seasonal_mann_kendall")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n_days") == 14L)
    assert(r.getAs[Long]("n_seasons") == 7L)
    assert(r.getAs[Long]("s_stat") == 7L) // one concordant pair per dow
    assert(r.getAs[Long]("var_s_x18") == 126L) // 7 · (2·1·9)
    assert(r.getAs[Double]("z") == 2.267787)
  }

  private def docs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("docs2").toString
    rows.map { case (id, t) => (id, t, "en", "s1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("sentence stats: 'hello world. foo bar baz! ok?' → 3 sentences, max 3") {
    val r = SparkEntry.queries("text_sentence_stats")(
      spark, docs(Seq((0L, "hello world. foo bar baz! ok?"))))
      .collect().head
    assert(r.getAs[Long]("n_sentences") == 3L)
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Double]("mean_sentence_len") == 2.0)
    assert(r.getAs[Long]("max_sentence_len") == 3L)
  }

  test("ngram novelty: eval doc sharing one 4-gram with train → 4/5 novel") {
    val dir = docs(Seq((0L, "a b c d e"), (8L, "a b c d x y z w")))
    val rows = SparkEntry.queries("ngram_novelty")(spark, dir).collect()
    assert(rows.length == 1) // only doc 8 is in the eval split
    val r = rows.head
    assert(r.getAs[Long]("doc_id") == 8L)
    assert(r.getAs[Long]("n_grams") == 5L)
    assert(r.getAs[Long]("n_novel") == 4L)
    assert(r.getAs[Double]("novelty") == 0.8)
  }

  test("corpus: leverage sums to ~p; novelty in [0,1]; sentence stats consistent") {
    val lev = SparkEntry.queries("ols_influence")(spark, sfDir).collect()
    val hsum = lev.map(_.getAs[Double]("leverage")).sum
    // Σh_i = p = 2 for simple OLS (trace of the hat matrix), up to
    // the 6dp floor grid (n · ≤1e-6 each)
    assert(math.abs(hsum - 2.0) < lev.length * 1e-6 + 1e-3, s"sum $hsum")
    val nov = SparkEntry.queries("ngram_novelty")(spark, sfDir).collect()
    nov.foreach { r =>
      val v = r.getAs[Double]("novelty")
      assert(v >= 0.0 && v <= 1.0)
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_grams"))
    }
    val ss = SparkEntry.queries("text_sentence_stats")(spark, sfDir).collect()
    ss.foreach { r =>
      assert(r.getAs[Long]("max_sentence_len") * r.getAs[Long]("n_sentences")
        >= r.getAs[Long]("n_tokens"))
    }
  }
}

/** B162 hurst_rescaled_range / B163 durbin_watson / C133
  * mm_keyframe_select / C134 ann_ivf_nprobe_curve.
  */
class HurstDwKeyframeSpec extends SparkTestBase {
  import spark.implicits._

  private def dailyOrders(cents: Seq[Long]): String = {
    val dir = java.nio.file.Files.createTempDirectory("hdw").toString
    cents.zipWithIndex.map { case (c, i) =>
      (i.toLong, java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(i.toLong)), c / 100.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("hurst: 256-day alternating series → R/S exactly 1 at every window") {
    val cents = (0 until 256).map(i => if (i % 2 == 0) 100L else 300L)
    val rows = SparkEntry.queries("hurst_rescaled_range")(
      spark, dailyOrders(cents)).collect()
      .map(r => r.getAs[Long]("window_days") -> r).toMap
    assert(rows.keySet == Set(64L, 128L, 256L))
    assert(rows(64L).getAs[Long]("n_blocks") == 4L)
    assert(rows(128L).getAs[Long]("n_blocks") == 2L)
    assert(rows(256L).getAs[Long]("n_blocks") == 1L)
    rows.values.foreach(r => assert(r.getAs[Double]("mean_rs") == 1.0))
  }

  test("durbin_watson: alternating residuals → DW = 3.4 (negative autocorr)") {
    val r = SparkEntry.queries("durbin_watson")(
      spark, dailyOrders(Seq(200L, 100L, 200L, 100L))).collect().head
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Double]("dw") == 3.4)
  }

  test("durbin_watson: perfect line → zero residuals → NULL dw") {
    val r = SparkEntry.queries("durbin_watson")(
      spark, dailyOrders(Seq(100L, 200L, 300L, 400L))).collect().head
    assert(r.isNullAt(r.fieldIndex("dw")))
  }

  test("corpus: one keyframe per shot, inside the shot span") {
    val shots = SparkEntry.queries("mm_shot_segments")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("shot_id")) -> r).toMap
    val keys = SparkEntry.queries("mm_keyframe_select")(spark, sfDir)
      .collect()
    assert(keys.length == shots.size) // exactly one per shot
    keys.foreach { k =>
      val sh = shots((k.getAs[Long]("id"), k.getAs[Long]("shot_id")))
      val kf = k.getAs[Int]("keyframe_idx")
      assert(kf >= sh.getAs[Int]("first_frame")
        && kf <= sh.getAs[Int]("last_frame"))
      assert(k.getAs[Long]("n_frames") == sh.getAs[Long]("n_frames"))
      assert(k.getAs[Double]("dist") >= 0.0)
    }
  }

  test("poisson_bootstrap: identical order values → SE exactly 0") {
    val dir = java.nio.file.Files.createTempDirectory("boot").toString
    import spark.implicits._
    (0 until 50).map(i => (i.toLong, java.sql.Date.valueOf("2024-01-01"),
      2.0)).toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = SparkEntry.queries("poisson_bootstrap_ci")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n_orders") == 50L)
    assert(r.getAs[Double]("theta") == 200.0)
    // every replicate with any mass has mean exactly 200; P(zero
    // mass) ≈ e^-50 — the plant pins SE to the zero fixed point
    assert(r.getAs[Double]("se_boot") == 0.0)
    assert(r.getAs[Double]("ci_lo") == 200.0)
    assert(r.getAs[Double]("ci_hi") == 200.0)
  }

  test("diff_in_diff: planted +50-cent treated lift → did = 50") {
    val dir = java.nio.file.Files.createTempDirectory("did").toString
    import spark.implicits._
    val t0 = 19723L * 86400
    // ctrl (user 0) flat at $1; treat (user 1) $2 pre, $2.50 post
    val rows = for (d <- 0 to 3; u <- 0 to 1) yield {
      val v = if (u == 0) 1.0 else if (d < 2) 2.0 else 2.5
      (u.toLong, t0 + d * 86400L, v)
    }
    rows.zipWithIndex.map { case ((u, sec, v), i) =>
      (i.toLong, sec * 1000000000L, u, "purchase", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("diff_in_diff")(spark, dir).collect().head
    assert(r.getAs[Double]("m_ctrl_pre") == 100.0)
    assert(r.getAs[Double]("m_ctrl_post") == 100.0)
    assert(r.getAs[Double]("m_treat_pre") == 200.0)
    assert(r.getAs[Double]("m_treat_post") == 250.0)
    assert(r.getAs[Double]("did") == 50.0)
  }

  test("corpus: bootstrap CI brackets theta; DiD cells populated") {
    val b = SparkEntry.queries("poisson_bootstrap_ci")(spark, sfDir)
      .collect().head
    assert(b.getAs[Double]("se_boot") > 0.0)
    assert(b.getAs[Double]("ci_lo") < b.getAs[Double]("theta"))
    assert(b.getAs[Double]("ci_hi") > b.getAs[Double]("theta"))
    val d = SparkEntry.queries("diff_in_diff")(spark, sfDir).collect().head
    Seq("m_treat_post", "m_treat_pre", "m_ctrl_post", "m_ctrl_pre")
      .foreach(c => assert(!d.isNullAt(d.fieldIndex(c)), c))
  }

  test("corpus: nprobe recall curve monotone, exhaustive probe = 1.0") {
    val rows = SparkEntry.queries("ann_ivf_nprobe_curve")(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("nprobe"))
    assert(rows.length == 8)
    val recalls = rows.map(_.getAs[Double]("recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
      recalls.mkString(","))
    // probing all 8 cells IS the exhaustive search
    assert(recalls.last == 1.0)
    rows.foreach(r => assert(r.getAs[Long]("hits")
      <= 10L * r.getAs[Long]("n_queries")))
  }
}