package graft

import org.apache.spark.sql.functions._

/** Round-13 (driver round 13) specs: GraphAnn — the HNSW-family
  * navigable-graph beam search (operators/GraphAnn.scala, query
  * ann_graph_topk).
  */
class GraphAnnSpec extends SparkTestBase {
  import spark.implicits._

  private def vec(xs: Double*): Array[Double] = {
    // pad to 8 dims so norms are stable; hand math uses the prefix
    val a = Array.fill(8)(0.0)
    xs.zipWithIndex.foreach { case (x, i) => a(i) = x }
    a
  }

  test("planted chain: hops bound reachability, more hops reach the target") {
    // Chain graph 0-1-2-3-4 built BY HAND; vectors arranged so that
    // node 4 is the best match for the query and each hop can only
    // advance one link. Entry = node 0 only.
    //   node i direction: angle i*20deg in a 2-D plane — cosine to
    //   the query (= node 4's direction) strictly increases along
    //   the chain.
    def dir(deg: Double) = {
      val r = math.toRadians(deg)
      vec(math.cos(r), math.sin(r))
    }
    val corpus = (0 to 4).map(i => (i.toLong, dir(i * 20.0))).toDF("id", "v")
    val graph = Seq(
        (0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L),
        (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L))
      .toDF("u", "w")
    val query = Seq((99L, dir(80.0))).toDF("id", "v")
    def ids(hops: Int): Set[Long] = operators.GraphAnn
      .searchTopK(corpus, graph, query, "id", "v",
        k = 2, beam = 2, hops = hops, entries = 1)
      .select($"id".as[Long]).collect().toSet
    // 1 hop from {0}: frontier {0,1} -> best two are {1,0}; node 4
    // is unreachable
    assert(ids(1) == Set(0L, 1L))
    // 4 hops: beam walks the chain to the true nearest {4,3}
    assert(ids(4) == Set(3L, 4L))
  }

  test("complete graph + full beam degenerates to exact brute-force top-k") {
    val n = 24
    val corpus = (0 until n).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(1.0 + i * 7.0 + j * 3.0)))
    }.toDF("id", "v")
    val graph = (for { u <- 0 until n; w <- 0 until n if u != w }
      yield (u.toLong, w.toLong)).toDF("u", "w")
    val queries = corpus.filter($"id" < 3)
    val got = operators.GraphAnn
      .searchTopK(corpus, graph, queries, "id", "v",
        k = 5, beam = n, hops = 1, entries = 1)
      .select($"query_id".as[Long], $"id".as[Long], $"rnk".as[Int])
      .collect().toSet
    val want = operators.VectorOps
      .bruteForceTopK(corpus, queries, "id", "v", 5)
      .select($"query_id".as[Long], $"id".as[Long], $"rnk".as[Int])
      .collect().toSet
    assert(got == want)
  }

  test("clustered corpus: recall >= 0.9 vs brute force (the regime that matters)") {
    // the ann_recall_gate_clustered mixture: 16 well-separated
    // centers, seedless sin-lattice generation, dim 32. Entry set 16
    // (ids 0..15 hit every generative cluster: id % 16); a navigable
    // graph has no excuse below 0.9 here.
    val dim = 32
    val nClusters = 16
    val vecs = spark.range(4000).select(
      col("id").as("vec_id"),
      expr(s"""transform(sequence(0, ${dim - 1}), j ->
           |  CAST(sin(1.0 + (id % $nClusters) * 37.0 + j * 13.0)
           |       + 0.35 * sin(id * 131.0 + j * 17.0 + 0.5) AS FLOAT))""".stripMargin)
        .as("embedding"))
    val qs = vecs.filter(col("vec_id") < 50)
    val bf = operators.VectorOps
      .bruteForceTopK(vecs, qs, "vec_id", "embedding", 10)
      .select(col("query_id"), col("id"))
    val graph = operators.GraphAnn
      .graphTopK(vecs, qs, "vec_id", "embedding",
        k = 10, beam = 24, hops = 4, planes = 6,
        entries = 16, dim = dim)
      .select(col("query_id"), col("id"), lit(1).as("hit"))
    val row = bf.join(graph, Seq("query_id", "id"), "left")
      .agg(count(lit(1)).as("n_bf"),
        sum(coalesce(col("hit"), lit(0))).as("hits"))
      .collect().head
    val recall = row.getAs[Long]("hits").toDouble / row.getAs[Long]("n_bf")
    assert(row.getAs[Long]("n_bf") == 500L)
    assert(recall >= 0.9, f"graph-ANN clustered recall $recall%.3f < 0.9")
  }
}

/** D53 streaming conformal p-value gate: hand-solved alarm ranks +
  * corpus invariants.
  */
class ConformalGateSpec extends SparkTestBase {
  import spark.implicits._

  test("planted: constant series never alarms; spikes alarm exactly while rare") {
    val dir = java.nio.file.Files.createTempDirectory("conf").toString
    val t0 = 19723L * 86400
    val rows =
      // low: 40 events at $10 (band 1) — every event's cnt_ge equals
      // the full prefix, p = 1, zero alarms
      (0 until 40).map(i =>
        (i.toLong, (t0 + i) * 1000000000L, 1L, "low", 10.0, "{}")) ++
      // spike: 35 at $10 then 5 at $500 (band 50).
      //   spike 1: n=35, cnt_ge=0 → 16·1 ≤ 36 → ALARM
      //   spike 2: n=36, cnt_ge=1 → 16·2 ≤ 37 → ALARM
      //   spike 3: n=37, cnt_ge=2 → 16·3 = 48 > 38 → quiet (the
      //   conformal guarantee at work: repeats stop being rare)
      (0 until 35).map(i =>
        (100L + i, (t0 + i) * 1000000000L, 2L, "spike", 10.0, "{}")) ++
      (0 until 5).map(i =>
        (200L + i, (t0 + 35 + i) * 1000000000L, 2L, "spike", 500.0, "{}")) ++
      Seq((999L, (t0 + 10800) * 1000000000L, 3L, "push", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("streaming_conformal_gate")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val low = out("low")
    assert(low.getAs[Long]("n_folded") == 40L)
    assert(low.getAs[Long]("n_alarms") == 0L)
    assert(low.getAs[Long]("hi_mass") == 0L)
    val spike = out("spike")
    assert(spike.getAs[Long]("n_folded") == 40L)
    assert(spike.getAs[Long]("n_alarms") == 2L)
    assert(spike.getAs[Long]("hi_mass") == 5L)
  }

  test("corpus stream: folds below the watermark, alarm and band bounds hold") {
    val out = SparkEntry.queries("streaming_conformal_gate")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_folded")
      assert(n > 0)
      assert(r.getAs[Long]("n_alarms") >= 0 && r.getAs[Long]("n_alarms") <= n)
      assert(r.getAs[Long]("hi_mass") >= 0 && r.getAs[Long]("hi_mass") <= n)
      // validity: alarms at alpha=1/16 over n folded events cannot
      // exceed ~n/16 by much under exchangeability; allow 2x slack
      assert(r.getAs[Long]("n_alarms") <= n / 8 + 1)
    }
  }
}

/** C159 suffix-array ranks: distributed dense rank + prefix doubling
  * (operators/SuffixRanks.scala, query suffix_dup_stats).
  */
class SuffixRanksSpec extends SparkTestBase {
  import spark.implicits._

  test("withDenseRank matches the window dense_rank on skewed multi-partition data") {
    val df = (1 to 500).map(i => (i.toLong, (i % 7).toLong * 10))
      .toDF("id", "k").repartition(13)
    val got = operators.SuffixRanks
      .withDenseRank(df, Seq("k"), "r", rangePartitions = 5)
      .select($"id".as[Long], $"r".as[Long]).collect().toMap
    val want = df.select($"id".as[Long],
        dense_rank().over(org.apache.spark.sql.expressions.Window
          .orderBy($"k")).cast("long").as[Long])
      .collect().toMap
    assert(got == want)
  }

  test("planted shared phrase: 4-token window duplicated across docs, dyadic max length") {
    val dir = java.nio.file.Files.createTempDirectory("sfx").toString
    Seq(
      (1L, "a b c d e", "en", "s1"),
      (2L, "x a b c d", "en", "s1"),
      (3L, "p q r s t", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("suffix_dup_stats")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // "a b c d" is the one duplicated 4-window (doc1 pos1, doc2 pos2);
    // no doc is >= 8 tokens so no longer full window exists
    assert(out(1L).getAs[Long]("n_pos4") == 1L)
    assert(out(1L).getAs[Int]("max_dup_len") == 4)
    assert(out(2L).getAs[Long]("n_pos4") == 1L)
    assert(out(2L).getAs[Int]("max_dup_len") == 4)
    // doc3 shares no token at all
    assert(out(3L).getAs[Long]("n_pos4") == 0L)
    assert(out(3L).getAs[Int]("max_dup_len") == 0)
    assert(out.values.forall(_.getAs[Long]("n_pos32") == 0L))
  }

  test("corpus invariants: dyadic lengths, 32-dup implies 4-dup, bounds") {
    val out = SparkEntry.queries("suffix_dup_stats")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val dyadic = Set(0, 1, 2, 4, 8, 16, 32)
    out.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      assert(dyadic.contains(r.getAs[Int]("max_dup_len")))
      assert(r.getAs[Long]("n_pos4") <= n)
      // a duplicated 32-window's first 4 tokens are a duplicated
      // 4-window at the same position
      assert(r.getAs[Long]("n_pos32") <= r.getAs[Long]("n_pos4"))
    }
  }
}
