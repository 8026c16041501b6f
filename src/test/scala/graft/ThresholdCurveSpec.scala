package graft

import org.apache.spark.sql.functions._

/** C111 dedup_threshold_curve — planted pairs at known exact shingle
  * Jaccard (1.0, 7/9 ≈ 0.778, 6/10 = 0.6) must land in exactly the
  * right bands, and the curve must be monotone.
  */
class ThresholdCurveSpec extends SparkTestBase {
  import spark.implicits._

  test("planted pairs land in exactly their bands; curve is monotone") {
    val dir = java.nio.file.Files.createTempDirectory("curve").toString
    Seq(
      // pair 1: identical → Jaccard 1.0 (every band)
      (1L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),
      (2L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),
      // pair 2: 8 vs 8 shingles, 7 shared → 7/9 = 0.7778 (0.6, 0.7)
      (3L, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"),
      (4L, "b1 b2 b3 b4 b5 b6 b7 b8 b9 bX"),
      // pair 3: 8 vs 8 shingles, 6 shared → 6/10 = 0.6 (0.6 only)
      (5L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
      (6L, "c1 c2 c3 c4 c5 c6 c7 c8 cX cY"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("dedup_threshold_curve")(spark, dir)
      .select($"threshold_ppm", $"n_pairs", $"n_dup_docs", $"n_docs_total")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._4).toSet == Set(6L))
    assert(got.map(r => (r._1, r._2, r._3)).toSeq == Seq(
      (600000L, 3L, 6L), (700000L, 2L, 4L),
      (800000L, 1L, 2L), (900000L, 1L, 2L)), s"got ${got.toSeq}")
  }

  test("corpus curve is non-increasing in both pair and doc counts") {
    val rows = SparkEntry.queries("dedup_threshold_curve")(spark, sfDir)
      .select($"threshold_ppm", $"n_pairs", $"n_dup_docs")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 4)
    assert(rows.sliding(2).forall(w => w(0)._2 >= w(1)._2), s"${rows.toSeq}")
    assert(rows.sliding(2).forall(w => w(0)._3 >= w(1)._3), s"${rows.toSeq}")
  }
}
