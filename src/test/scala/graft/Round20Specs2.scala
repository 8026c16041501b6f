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