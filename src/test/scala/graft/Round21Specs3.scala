package graft

import org.apache.spark.sql.functions._

/** Round-11 third wave — closed-form plants: B183 mood_median_test,
  * B184 cochran_armitage, B185 ewma_alpha_sweep, C143
  * chunk_dedup_stats.
  */
class Round21Specs3 extends SparkTestBase {
  import spark.implicits._

  test("mood_median_test: perfect 3/3 split lands on chi2 = 6 exactly") {
    val dir = java.nio.file.Files.createTempDirectory("mood").toString
    val rows = Seq(("A", 0.01), ("A", 0.02), ("A", 0.03),
      ("B", 0.10), ("B", 0.11), ("B", 0.12))
    rows.zipWithIndex.map { case ((g, p), i) => (i.toLong, g, p) }
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = SparkEntry.queries("mood_median_test")(spark, dir).collect().head
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("median_cents") == 3L) // lower median, rank (6+1) div 2 = 3
    assert(r.getAs[Long]("df") == 1L)
    assert(r.getAs[Double]("chi2") == 6.0)
  }

  test("cochran_armitage: all purchases on the high-score weekday -> z = 2") {
    val dir = java.nio.file.Files.createTempDirectory("ca").toString
    // epoch day 4 -> weekday 0 (Monday); day 3 -> weekday 6
    val ev = Seq(
      (1L, "view", 4L), (2L, "view", 4L),
      (3L, "purchase", 3L), (4L, "purchase", 3L))
    ev.map { case (eid, ty, day) =>
      (eid, 1L, ty, 1.0, new java.sql.Timestamp((day * 86400L + 100) * 1000L))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("cochran_armitage")(spark, dir).collect().head
    assert(r.getAs[Long]("n_events") == 4L)
    assert(r.getAs[Long]("n_purchases") == 2L)
    // A = 4·12 − 2·12 = 24; z = 24·√4 / √(2·2·(4·72 − 144)) = 48/24
    assert(r.getAs[Double]("z") == 2.0)
  }

  test("ewma_alpha_sweep: quantized folds hand-solve, arg-min exact") {
    val dir = java.nio.file.Files.createTempDirectory("ewa").toString
    // daily cents 100, 200, 200: e2 = 100 for every alpha; l2 =
    // 100 + (100a) div 16, e3 = 200 - l2 -> best alpha = 14/16
    val ev = Seq((1L, 1.0, 0L), (2L, 2.0, 1L), (3L, 2.0, 2L))
    ev.map { case (eid, v, day) =>
      (eid, 1L, "purchase", v,
        new java.sql.Timestamp((day * 86400L + 100) * 1000L))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("ewma_alpha_sweep")(spark, dir)
      .collect().map(r => r.getAs[Double]("alpha") -> r).toMap
    assert(got.size == 8)
    assert(got(0.875).getAs[Double]("sse") == 10169.0) // 100² + 13²
    assert(got(0.875).getAs[Int]("best") == 1)
    assert(got(0.875).getAs[Double]("mae") == 56.5)
    assert(got(0.0625).getAs[Double]("sse") == 18836.0) // 100² + 94²
    assert(got.values.map(_.getAs[Int]("best")).sum == 1)
  }

  test("chunk_dedup_stats: clone chunks count as removable mass per source") {
    val dir = java.nio.file.Files.createTempDirectory("cds").toString
    Seq((1L, "a b c", "en", "web", 0L), (2L, "a b c", "en", "web", 0L),
        (3L, "a b c", "en", "web", 0L),
        (4L, "x y", "en", "book", 0L), (5L, "p q", "en", "book", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("chunk_dedup_stats")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(got("web").getAs[Long]("n_chunks") == 3L)
    assert(got("web").getAs[Long]("n_distinct") == 1L)
    assert(got("web").getAs[Long]("n_removable") == 2L)
    assert(got("web").getAs[Double]("dup_ratio") == 0.666667)
    assert(got("book").getAs[Long]("n_removable") == 0L)
    assert(got("book").getAs[Double]("dup_ratio") == 0.0)
  }
}
