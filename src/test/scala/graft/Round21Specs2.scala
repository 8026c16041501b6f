package graft

import org.apache.spark.sql.functions._

/** Round-11 pipeline wave — closed-form plants: C140 rag_chunk_split,
  * C141 interleaved_ranking (operator-level), C142
  * ann_filtered_search, D51 streaming_topk_decay.
  */
class Round21Specs2 extends SparkTestBase {
  import spark.implicits._

  test("Interleave.merged: skip-duplicates alternation and exhaustion fill") {
    val df = Seq((Array(5L, 7L), Array(5L, 9L)),
        (Array(1L), Array(2L, 3L, 4L)))
      .toDF("a", "b")
      .select(graft.operators.Interleave.merged(col("a"), col("b")).as("m"))
    val got = df.collect().map(_.getSeq[Long](0))
    // A opens with 5; B's 5 is taken so B contributes 9; A closes 7
    assert(got(0) == Seq(5L * 2, 9L * 2 + 1, 7L * 2))
    // A exhausts after 1; B fills every later turn
    assert(got(1) == Seq(1L * 2, 2L * 2 + 1, 3L * 2 + 1, 4L * 2 + 1))
  }

  test("rag_chunk_split: 65 tokens -> two overlapping chunks, 3 tokens -> one") {
    val dir = java.nio.file.Files.createTempDirectory("rag").toString
    Seq((1L, Seq.fill(65)("ab").mkString(" "), "en", "web", 0L),
        (2L, "xy zq w", "en", "web", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("rag_chunk_split")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("chunk_idx")) -> r).toMap
    assert(rows.size == 3)
    val c0 = rows((1L, 0L))
    assert(c0.getAs[Long]("tok_start") == 0L && c0.getAs[Long]("tok_end") == 64L)
    assert(c0.getAs[Long]("n_tok") == 64L)
    assert(c0.getAs[Long]("n_chars") == 64 * 2 + 63)
    val c1 = rows((1L, 1L))
    assert(c1.getAs[Long]("tok_start") == 48L && c1.getAs[Long]("tok_end") == 65L)
    assert(c1.getAs[Long]("n_tok") == 17L)
    assert(c1.getAs[Long]("n_chars") == 17 * 2 + 16)
    val s0 = rows((2L, 0L))
    assert(s0.getAs[Long]("n_tok") == 3L)
    assert(s0.getAs[String]("first_tok") == "xy")
    assert(s0.getAs[String]("last_tok") == "w")
  }

  test("ann_filtered_search: predicate excludes the near neighbor, probes still bound the reach") {
    // centroids 0..7 at (100·(i+1), 0), label = vec_id; query = vec 0
    // probes cells 0,1,2. vec 8 (label 5, cell 0) is NEAR but
    // filtered out; vec 9 (label 2, cell 0) survives; vec 3 has an
    // allowed label but sits in unprobed cell 3 — in-search
    // filtering, not post-filtering, decides all three.
    val dir = java.nio.file.Files.createTempDirectory("fivf").toString
    val rows = (0L to 7L).map(i => (i, Array(100f * (i + 1), 0f), i.toInt)) ++
      Seq((8L, Array(10f, 1f), 5), (9L, Array(10f, 3f), 2))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("ann_filtered_search")(spark, dir)
      .filter(col("query_id") === 0).collect()
      .map(r => r.getAs[Long]("rnk") -> r.getAs[Long]("id")).toMap
    assert(got.values.toSet == Set(1L, 2L, 9L),
      s"expected {1,2,9}, got ${got.values.toSet}")
    // collinear centroids tie at cosine 1.0 → id order; vec 9 last
    assert(got(1L) == 1L && got(2L) == 2L && got(3L) == 9L)
  }

  test("streaming_topk_decay: day-decayed leaderboard hand-solves") {
    val dir = java.nio.file.Files.createTempDirectory("topkd").toString
    // T = day 2. user 1: 3 events on day 2 → 3·2³² (decayed 3.0);
    // user 2: 5 events on day 0 → 5·2³⁰ (1.25); user 3: 1 on day 2 → 1.0
    val ev = Seq.tabulate(3)(i => (i.toLong, 1L, 2L * 86400 + i)) ++
      Seq.tabulate(5)(i => (10L + i, 2L, 100L + i)) :+ ((20L, 3L, 2L * 86400 + 50))
    ev.map { case (eid, uid, tsec) =>
      (eid, uid, "view", 1.0, new java.sql.Timestamp(tsec * 1000L))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("streaming_topk_decay")(spark, dir)
      .collect().map(r => r.getAs[Long]("rnk") ->
        ((r.getAs[Long]("user_id"), r.getAs[Double]("decayed")))).toMap
    assert(got(1L) == ((1L, 3.0)))
    assert(got(2L) == ((2L, 1.25)))
    assert(got(3L) == ((3L, 1.0)))
  }
}
