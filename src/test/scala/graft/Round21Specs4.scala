package graft

import org.apache.spark.sql.functions._

/** Round-11 fourth wave — plants/invariants: B186 welch_anova, B187
  * quade_test, C144 langid_kappa, C145 retrieval_recall_curve, C146
  * mm_audio_vad_segments.
  */
class Round21Specs4 extends SparkTestBase {
  import spark.implicits._

  test("welch_anova: two-group case equals Welch's t-squared = 0.8") {
    val dir = java.nio.file.Files.createTempDirectory("welch").toString
    // A cents {100, 300}: m=200, s2=20000, w=1e-4; B {200, 600}:
    // m=400, s2=80000, w=2.5e-5. mbar=240, A=0.8 (k=2 -> F = A),
    // lambda = 0.04 + 0.64 -> df2 = 3/2.04
    Seq((1L, "A", 1.0), (2L, "A", 3.0), (3L, "B", 2.0), (4L, "B", 6.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = SparkEntry.queries("welch_anova")(spark, dir).collect().head
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Double]("f_welch") == 0.8)
    assert(r.getAs[Double]("df2") ==
      math.floor(3.0 / 2.04 * 1e6 + 0.5) / 1e6)
  }

  test("quade_test: consistent order with one high-stakes day -> F = 9") {
    val dir = java.nio.file.Files.createTempDirectory("quade").toString
    // day 0: a/b/c = 0/10/20 cents (range 20, Q2 = 4);
    // day 1: 0/1/2 (range 2, Q2 = 2). S' matrix -> T' = (-12, 0, 12),
    // F = 1·288/(2·160 − 288) = 9
    val ev = Seq(
      ("a", 0.00, 0L), ("b", 0.10, 0L), ("c", 0.20, 0L),
      ("a", 0.00, 1L), ("b", 0.01, 1L), ("c", 0.02, 1L))
    ev.zipWithIndex.map { case ((ty, v, day), i) =>
      (i.toLong, 1L, ty, v, new java.sql.Timestamp((day * 86400L + 9) * 1000L))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("quade_test")(spark, dir).collect().head
    assert(r.getAs[Long]("n_days") == 2L && r.getAs[Long]("n_types") == 3L)
    assert(r.getAs[Double]("f_quade") == 9.0)
  }

  test("langid_kappa: hand-built confusion lands on 5/9") {
    val dir = java.nio.file.Files.createTempDirectory("kappa").toString
    val en = "the cat and the dog of it is in a tree"
    Seq((1L, en, "en", "web", 0L), (2L, en, "en", "web", 0L),
        (3L, en, "de", "web", 0L), // mislabeled -> off-diagonal
        (4L, "中文文本", "zh", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("langid_kappa")(spark, dir).collect().head
    // cells: (en,en)=2, (de,en)=1, (zh,zh)=1; D=3, P=2·3+1·1=7
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_agree") == 3L)
    assert(r.getAs[Double]("po") == 0.75)
    assert(r.getAs[Double]("pe") == 0.4375)
    assert(r.getAs[Double]("kappa") == 0.555556) // floor(5/9 e6 + .5)
  }

  test("retrieval_recall_curve matches an independent set-ops recompute") {
    import graft.operators.VectorOps
    val vecs = GraftSession.table(spark, sfDir, "embeddings")
    val qs = vecs.filter(col("vec_id") < 5)
    val cents = vecs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    def sets(df: org.apache.spark.sql.DataFrame, k: Int) =
      df.filter(col("rnk") <= k).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("id"))).toSet
    val ivf = VectorOps.ivfTopK(vecs, qs, cents, "vec_id", "embedding",
      "cid", "cv", 10, 3).localCheckpoint()
    val lsh = VectorOps.lshTopK(vecs, qs, "vec_id", "embedding", 10)
      .localCheckpoint()
    val bf = VectorOps.bruteForceTopK(vecs, qs, "vec_id", "embedding", 10)
      .localCheckpoint()
    val got = SparkEntry.queries("retrieval_recall_curve")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("method"), r.getAs[Long]("k")) ->
        ((r.getAs[Long]("hits"), r.getAs[Double]("recall")))).toMap
    assert(got.size == 6)
    for (k <- Seq(1, 5, 10); (m, df) <- Seq("ivf" -> ivf, "lsh" -> lsh)) {
      val hits = (sets(df, k) intersect sets(bf, k)).size.toLong
      val nq = sets(bf, 10).map(_._1).size
      val recall = math.floor(hits.toDouble / (k * nq) * 1e6 + 0.5) / 1e6
      assert(got((m, k.toLong)) == ((hits, recall)), s"$m@$k")
    }
  }

  test("mm_audio_vad_segments: segments tile exactly the voiced windows") {
    import graft.operators.Multimodal
    val docs = GraftSession.table(spark, sfDir, "documents")
    val en = Multimodal.sampleFrames(spark,
        Multimodal.asMedia(docs, "text").select(col("doc_id"), col("media")),
        "doc_id", frameBytes = 64, everyN = 1)
      .filter(col("frame_idx") < 16)
      .select(col("id").as("doc_id"), col("frame_idx").as("f"),
        expr("aggregate(features, 0D, (a, y) -> a + y)").as("e"))
      .collect().groupBy(_.getAs[Long]("doc_id"))
    // independent recompute of the voiced set + islands in plain Scala
    val expected = en.flatMap { case (doc, rows) =>
      val es = rows.map(r => r.getAs[Number]("f").longValue()
          -> r.getAs[Double]("e"))
        .sortBy(_._1)
      val n = es.length
      val tot = es.map(_._2).sum
      val voiced = es.filter { case (_, e) => e * n > tot }.map(_._1)
      // islands of consecutive f
      val segs = voiced.foldLeft(List.empty[(Long, Long)]) {
        case ((s0, e0) :: rest, f) if f == e0 + 1 => (s0, f) :: rest
        case (acc, f) => (f, f) :: acc
      }.reverse
      segs.zipWithIndex.map { case ((s0, e0), i) =>
        (doc, i + 1L, s0, e0) }
    }.toSet
    val got = SparkEntry.queries("mm_audio_vad_segments")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("seg_idx"),
        r.getAs[Long]("start_f"), r.getAs[Long]("end_f"))).toSet
    assert(got == expected && got.nonEmpty)
  }
}
