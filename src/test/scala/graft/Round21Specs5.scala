package graft

import org.apache.spark.sql.functions._

/** Round-11 fifth wave — plants: C147 label_noise_screen, C148
  * stratified_kfold_split.
  */
class Round21Specs5 extends SparkTestBase {
  import spark.implicits._

  test("label_noise_screen: the planted mislabel is the only confident flag") {
    val dir = java.nio.file.Files.createTempDirectory("noise").toString
    // cluster X (ids 0-29) along (1000, i) — labels 1 except id 0,
    // which is MISLABELED 2; cluster Y (ids 30-59) along (i, 1000) —
    // labels 2. Queries are ids < 50 (all X + 20 Y).
    val rows =
      (0 to 29).map(i => (i.toLong, Array(1000f, i.toFloat),
        if (i == 0) 2 else 1)) ++
      (30 to 59).map(i => (i.toLong, Array((i - 30).toFloat, 1000f), 2))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("label_noise_screen")(spark, dir)
      .collect()
      .map(r => (r.getAs[Int]("true_label"), r.getAs[Int]("voted_label"))
        -> ((r.getAs[Long]("n_points"), r.getAs[Long]("n_confident_noise"),
          r.getAs[Double]("noise_rate")))).toMap
    assert(got((2, 1)) == ((1L, 1L, 1.0)),
      "the mislabeled X point must be confidently flagged")
    assert(got((1, 1)) == ((29L, 0L, 0.0)))
    assert(got((2, 2)) == ((20L, 0L, 0.0)))
    assert(got.size == 3)
  }

  test("embedding_dim_truncation_eval: identity row exact, truncated rows recomputed") {
    import graft.operators.VectorOps
    val got = SparkEntry.queries("embedding_dim_truncation_eval")(
        spark, sfDir).collect()
      .map(r => r.getAs[Int]("dim") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Long]("hits"),
          r.getAs[Double]("recall")))).toMap
    assert(got.size == 3)
    val (nq, h64, r64) = got(64)
    assert(h64 == 10 * nq && r64 == 1.0, "dim-64 must be the identity row")
    // independent recompute of the dim-16 row via raw operator calls
    val vecs = GraftSession.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def ids(dp: Int) = {
      val sl = vecs.select(col("vec_id"), slice(col("v"), 1, dp).as("vd"))
      VectorOps.bruteForceTopK(sl, sl.filter(col("vec_id") < 5),
          "vec_id", "vd", 10)
        .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("id")))
        .toSet
    }
    val hits16 = (ids(16) intersect ids(64)).size.toLong
    assert(got(16)._2 == hits16)
    assert(got(16)._3 ==
      math.floor(hits16.toDouble / (10 * nq) * 1e6 + 0.5) / 1e6)
  }

  test("text_sttr: all-distinct + all-same chunks average to 65/128") {
    val dir = java.nio.file.Files.createTempDirectory("sttr").toString
    val text = ((0 until 64).map("t" + _) ++ Seq.fill(64)("x"))
      .mkString(" ")
    Seq((1L, text, "en", "web", 0L), (2L, "a b c", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_sttr")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Long]("n_tok") == 128L)
    assert(got(1L).getAs[Long]("n_chunks") == 2L)
    assert(got(1L).getAs[Double]("sttr") == 0.507813) // floor((64+1)/128 e6 + .5)
    assert(got(2L).getAs[Long]("n_chunks") == 0L)
    assert(got(2L).isNullAt(got(2L).fieldIndex("sttr")))
  }

  test("km_median_survival: S hits exactly 0.5 at the hand-solved day") {
    val dir = java.nio.file.Files.createTempDirectory("kmmed").toString
    // 4 signups day 0; u1 converts day 1 (S = 3/4), u2 day 2
    // (S = 3/4 · 2/3 = 0.5 → median day 2); u3/u4 censored at day 10
    val ev = Seq(
      (1L, 1L, "signup", 0L), (2L, 2L, "signup", 0L),
      (3L, 3L, "signup", 0L), (4L, 4L, "signup", 0L),
      (5L, 1L, "purchase", 86400L), (6L, 2L, "purchase", 2 * 86400L),
      (7L, 9L, "view", 10 * 86400L))
    ev.map { case (eid, uid, ty, sec) =>
      (eid, uid, ty, 1.0, new java.sql.Timestamp(sec * 1000L))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("km_median_survival")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n_users") == 4L)
    assert(r.getAs[Long]("n_converted") == 2L)
    assert(r.getAs[Long]("median_day") == 2L)
    assert(r.getAs[Double]("s_at_read") == 0.5)
  }

  test("energy_distance: singleton gap T = d, identical samples T = 0") {
    def dir(xs: Seq[Double], ys: Seq[Double]) = {
      val d = java.nio.file.Files.createTempDirectory("energy").toString
      (xs.map(("purchase", _)) ++ ys.map(("view", _))).zipWithIndex
        .map { case ((ty, v), i) =>
          (i.toLong, 1L, ty, v, new java.sql.Timestamp(1000L * (i + 1))) }
        .toDF("event_id", "user_id", "event_type", "value", "ts")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      d
    }
    // X = {1 cent}, Y = {3 cents}: e = 2·|1−3| = 4, T = (1/2)·4 = 2
    val r1 = SparkEntry.queries("energy_distance")(
      spark, dir(Seq(0.01), Seq(0.03))).collect().head
    assert(r1.getAs[Double]("e_stat") == 4.0)
    assert(r1.getAs[Double]("t_stat") == 2.0)
    // identical two-point samples: the metric property pins T = 0
    val r2 = SparkEntry.queries("energy_distance")(
      spark, dir(Seq(0.01, 0.03), Seq(0.01, 0.03))).collect().head
    assert(r2.getAs[Double]("e_stat") == 0.0)
    assert(r2.getAs[Double]("t_stat") == 0.0)
  }

  test("stratified_kfold_split matches a plain-Scala recompute of the hash folds") {
    val dir = java.nio.file.Files.createTempDirectory("kfold").toString
    val docs = (0L until 50L).map(i =>
      (i, "text " + i, "en", if (i % 3 == 0) "web" else "book", 10L + i))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val expected = docs
      .groupBy(d => (d._4, ((d._1 % 1000003L) * 2654435761L + 7L) % 5L))
      .map { case ((src, fold), ds) =>
        (src, fold) -> ((ds.size.toLong, ds.map(_._5).sum)) }
    val bySrc = docs.groupBy(_._4).map { case (s0, ds) => s0 -> ds.size }
    val got = SparkEntry.queries("stratified_kfold_split")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("fold")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("chars"),
          r.getAs[Double]("share")))).toMap
    assert(got.size == expected.size)
    expected.foreach { case (k, (n, chars)) =>
      val (gn, gc, gs) = got(k)
      assert(gn == n && gc == chars, s"$k")
      assert(gs == math.floor(n.toDouble / bySrc(k._1) * 1e6 + 0.5) / 1e6)
    }
  }
}
