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

/** Round-13 wave-4 operators: hand-solved plants + corpus invariants
  * for ansari_bradley, cox_stuart_trend, bowker_symmetry,
  * variance_ratio, corpus_js_divergence, filter_agreement_alpha,
  * streaming_isotonic_calibration.
  */
class Round13StatsSpec extends SparkTestBase {
  import spark.implicits._

  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("ansari_bradley planted: extremes-vs-middle, z = -sqrt(3) exactly") {
    val dir = java.nio.file.Files.createTempDirectory("ab").toString
    val t0 = 19723L * 86400
    // purchases take the extreme positions (scores 1, 1), views the
    // middle (scores 2, 2): sorted cents 1, 49, 50, 100
    writeEvents(dir, Seq(
      (1L, t0 * 1000000000L, 1L, "purchase", 0.01, "{}"),
      (2L, (t0 + 1) * 1000000000L, 1L, "purchase", 1.00, "{}"),
      (3L, (t0 + 2) * 1000000000L, 2L, "view", 0.49, "{}"),
      (4L, (t0 + 3) * 1000000000L, 2L, "view", 0.50, "{}")))
    val r = SparkEntry.queries("ansari_bradley")(spark, dir).collect().head
    assert(r.getAs[Long]("n1") == 2L && r.getAs[Long]("n2") == 2L)
    assert(r.getAs[Long]("ab1_e6") == 2000000L)
    assert(r.getAs[Long]("e_ab1_e6") == 3000000L)
    // z = -1e6 / (1e6/sqrt(3)) = -sqrt(3), 6dp-floored
    assert(r.getAs[Double]("z") == -1.732051)
  }

  test("ansari_bradley corpus: scores bounded, AB1 within score-sum range") {
    val r = SparkEntry.queries("ansari_bradley")(spark, sfDir).collect().head
    assert(r.getAs[Long]("n1") > 0 && r.getAs[Long]("n2") > 0)
    assert(r.getAs[Long]("ab1_e6") > 0)
    assert(!r.isNullAt(r.fieldIndex("z")))
  }

  private def writeOrders(dir: String, rows: Seq[(Int, Double)]): Unit = {
    val t0 = java.time.LocalDate.of(2024, 1, 1)
    rows.map { case (d, v) =>
      (java.sql.Date.valueOf(t0.plusDays(d)), v)
    }.toDF("o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
  }

  test("cox_stuart planted: strictly rising 10-day series is significant") {
    val dir = java.nio.file.Files.createTempDirectory("cs").toString
    writeOrders(dir, (0 until 10).map(d => (d, (d + 1) * 1.0)))
    val r = SparkEntry.queries("cox_stuart_trend")(spark, dir).collect().head
    assert(r.getAs[Long]("n_days") == 10L)
    assert(r.getAs[Long]("n_pairs") == 5L)
    assert(r.getAs[Long]("s_plus") == 5L && r.getAs[Long]("s_minus") == 0L)
    // (2*5-5)^2 * 1e6 = 25e6 > 3841459 * 5
    assert(r.getAs[Int]("signif") == 1)
  }

  test("variance_ratio planted: alternating series gives VR(7) = 1/7") {
    val dir = java.nio.file.Files.createTempDirectory("vr").toString
    // $1 on odd grid days only; the zero-filled grid supplies the 0s:
    // v = 1,0,1,...,1 over 15 days
    writeOrders(dir, (0 until 15 by 2).map(d => (d, 1.0)))
    val r = SparkEntry.queries("variance_ratio")(spark, dir).collect().head
    assert(r.getAs[Long]("n_days") == 15L)
    assert(r.getAs[Long]("n_diff1") == 14L && r.getAs[Long]("n_diff7") == 8L)
    // VR = (8*8)*(14*14) / (7 * 8*8 * 14*14) = 1/7 -> 0.142857
    assert(r.getAs[Double]("vr7") == 0.142857)
  }

  test("bowker planted: one symmetric and one asymmetric pair") {
    val dir = java.nio.file.Files.createTempDirectory("bw").toString
    val t0 = 19723L * 86400
    // user 1: A B A B A -> A->B x2, B->A x2 (symmetric, contrib 0)
    // user 2: A C A C   -> A->C x2, C->A x1 (d=1, s=3 -> 333333)
    val u1 = Seq("A", "B", "A", "B", "A").zipWithIndex.map { case (ty, i) =>
      (i.toLong, (t0 + i) * 1000000000L, 1L, ty, 1.0, "{}")
    }
    val u2 = Seq("A", "C", "A", "C").zipWithIndex.map { case (ty, i) =>
      (10L + i, (t0 + i) * 1000000000L, 2L, ty, 1.0, "{}")
    }
    writeEvents(dir, u1 ++ u2)
    val r = SparkEntry.queries("bowker_symmetry")(spark, dir).collect().head
    assert(r.getAs[Long]("df") == 2L)
    assert(r.getAs[Double]("chi2") == 0.333333)
  }

  test("js divergence planted: {a a b} vs {a b b} -> js 0.020135") {
    val dir = java.nio.file.Files.createTempDirectory("js").toString
    Seq((1L, "a a b", "en", "S1"), (2L, "a b b", "en", "S2"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("corpus_js_divergence")(spark, dir)
      .collect().head
    assert(r.getAs[String]("source_a") == "S1")
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("v") == 2L)
    // kp = floor(3*ln(1.2)*1e6) + floor(2*ln(0.8)*1e6)
    //    = 546964 - 446288 = 100676; symmetric corpus -> klq equal
    assert(r.getAs[Long]("klp_micro") == 100676L)
    assert(r.getAs[Long]("klq_micro") == 100676L)
    assert(r.getAs[Double]("js") == 0.020135)
  }

  test("js divergence corpus: symmetric roles, js >= 0, all source pairs") {
    val out = SparkEntry.queries("corpus_js_divergence")(spark, sfDir)
      .collect()
    val k = out.map(r => Set(r.getAs[String]("source_a"),
      r.getAs[String]("source_b"))).distinct.length
    assert(out.length == k) // one row per unordered pair
    out.foreach { r =>
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
      assert(r.getAs[Double]("js") >= 0.0)
      // JS with natural log is bounded by ln 2
      assert(r.getAs[Double]("js") <= 0.693148)
    }
  }

  test("krippendorff alpha planted: {3,0,2}-positive docs give alpha 0.6") {
    val dir = java.nio.file.Files.createTempDirectory("ka").toString
    val doc1 = Seq.fill(60)("abcde").mkString(" ") // passes all 3
    val doc2 = "1 22"                              // fails all 3
    val doc3 = Seq.fill(60)("ab").mkString(" ")    // fails mean-length only
    Seq((1L, doc1, "en", "s"), (2L, doc2, "en", "s"), (3L, doc3, "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("filter_agreement_alpha")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n_docs") == 3L && r.getAs[Long]("n_ratings") == 9L)
    assert(r.getAs[Long]("n1_tot") == 5L && r.getAs[Long]("d_obs") == 2L)
    // alpha = 1 - 8*2/(2*5*4) = 0.6
    assert(r.getAs[Double]("alpha") == 0.6)
  }

  test("streaming isotonic planted: PAVA pools the rate violation") {
    val dir = java.nio.file.Files.createTempDirectory("iso").toString
    val t0 = 19723L * 86400
    def batch(band: Int, nPurchase: Int, nView: Int, idBase: Long) = {
      val v = band * 10.0 + 5.0 // lands in band `band`
      (0 until nPurchase).map(i =>
        (idBase + i, (t0 + i) * 1000000000L, 1L, "purchase", v, "{}")) ++
      (0 until nView).map(i =>
        (idBase + 100 + i, (t0 + i) * 1000000000L, 1L, "view", v, "{}"))
    }
    // raw rates .25, 0, .5 -> PAVA pools bands 0,1 to .125
    writeEvents(dir, batch(0, 1, 3, 0L) ++ batch(1, 0, 4, 200L)
      ++ batch(2, 2, 2, 400L))
    val out = SparkEntry.queries("streaming_isotonic_calibration")(spark, dir)
      .collect().map(r => r.getAs[Long]("band") -> r).toMap
    assert(out(0L).getAs[Long]("raw_micro") == 250000L)
    assert(out(0L).getAs[Long]("iso_micro") == 125000L)
    assert(out(1L).getAs[Long]("raw_micro") == 0L)
    assert(out(1L).getAs[Long]("iso_micro") == 125000L)
    assert(out(2L).getAs[Long]("raw_micro") == 500000L)
    assert(out(2L).getAs[Long]("iso_micro") == 500000L)
  }

  test("streaming isotonic corpus: iso rates monotone nondecreasing in band") {
    val out = SparkEntry.queries("streaming_isotonic_calibration")(
        spark, sfDir)
      .collect().sortBy(_.getAs[Long]("band"))
    assert(out.nonEmpty)
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("iso_micro") <= b.getAs[Long]("iso_micro"))
      case _ =>
    }
  }
}

/** Round-13 wave-6 operators: anova_effect_size, theil_index,
  * periodogram_seasonal, classifier_auprc (via apFromScored),
  * classifier_brier (via brierFromSplit).
  */
class Round13Wave6Spec extends SparkTestBase {
  import spark.implicits._

  test("anova effect sizes planted: separated groups eta2=1; identical groups omega2<0") {
    val dir = java.nio.file.Files.createTempDirectory("ef").toString
    def write(rows: Seq[(String, Double)]): Unit =
      rows.toDF("o_orderpriority", "o_totalprice")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // {0,0} vs {2,2}: all variance between groups
    write(Seq(("1-A", 0.0), ("1-A", 0.0), ("2-B", 2.0), ("2-B", 2.0)))
    val r1 = SparkEntry.queries("anova_effect_size")(spark, dir)
      .collect().head
    assert(r1.getAs[Double]("eta2") == 1.0)
    assert(r1.getAs[Double]("omega2") == 1.0)
    // {0,2} vs {0,2}: zero between-group variance; omega2 goes
    // negative (the small-sample correction at work)
    write(Seq(("1-A", 0.0), ("1-A", 2.0), ("2-B", 0.0), ("2-B", 2.0)))
    val r2 = SparkEntry.queries("anova_effect_size")(spark, dir)
      .collect().head
    assert(r2.getAs[Double]("eta2") == 0.0)
    assert(r2.getAs[Double]("omega2") == -0.333333)
  }

  test("theil planted: equal incomes 0; {1,3} split gives 0.130812") {
    val dir = java.nio.file.Files.createTempDirectory("th").toString
    Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 0.01), (2L, 0.01), (3L, 0.01), (4L, 0.03))
      .toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("theil_index")(spark, dir)
      .collect().map(r => r.getAs[String]("segment") -> r).toMap
    assert(out("A").getAs[Double]("theil_t") == 0.0)
    // 0.5·ln0.5 + 1.5·ln1.5 micro-floored = (-346574 + 608197)/2
    assert(out("B").getAs[Double]("theil_t") == 0.130812)
  }

  test("periodogram planted: a pure 7-day cycle concentrates at period 7") {
    val dir = java.nio.file.Files.createTempDirectory("pg").toString
    // $100 on two days exactly 7 apart whose epoch day is ≡ 0 (mod 7)
    // (2024-01-04 = epoch day 19726 = 7·2818); the zero-filled grid
    // spans 8 days
    Seq((java.sql.Date.valueOf("2024-01-04"), 100.0),
        (java.sql.Date.valueOf("2024-01-11"), 100.0))
      .toDF("o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("periodogram_seasonal")(spark, dir)
      .collect().map(r => r.getAs[Int]("period") -> r).toMap
    // A7 = 2·100·1e6 (both days at phase 0), B7 = 0:
    // power = (2e8)^2/8^2/1e12 = 625
    assert(out(7).getAs[Double]("power") == 625.0)
    // period 2: phases 0 and 1 cancel exactly
    assert(out(2).getAs[Double]("power") == 0.0)
    // period 14: phases 0 and 7 cancel exactly
    assert(out(14).getAs[Double]("power") == 0.0)
    assert(out(7).getAs[Double]("power") > out(5).getAs[Double]("power"))
  }

  test("average precision planted: ranking (1,0,1) gives AP = 5/6") {
    val scored = Seq((3L, 1L), (2L, 0L), (1L, 1L)).toDF("score", "label")
    val r = graft.queries.TextQueries.apFromScored(scored).collect().head
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 1L)
    assert(r.getAs[Long]("n_thresholds") == 3L)
    // AP = (1/2)·(1 + 2/3) = 5/6 → pico-contrib sum 1666666666666
    // div 2e6 = 833333
    assert(r.getAs[Long]("ap_micro") == 833333L)
  }

  test("brier planted: two-source split — decomposition identity holds") {
    // source X: train rate 1/2, eval {1,0}; source Y: train rate 1,
    // eval {1,1} → brier .125, rel 0, res .0625, unc .1875
    val sd = Seq(
      ("X", 1L, 0L), ("X", 0L, 0L), ("X", 1L, 1L), ("X", 0L, 1L),
      ("Y", 1L, 0L), ("Y", 1L, 0L), ("Y", 1L, 1L), ("Y", 1L, 1L))
      .toDF("source", "label", "odd")
    val r = graft.queries.TextQueries.brierFromSplit(sd).collect().head
    assert(r.getAs[Long]("n_eval") == 4L && r.getAs[Long]("n_pos") == 3L)
    assert(r.getAs[Double]("brier") == 0.125)
    assert(r.getAs[Double]("reliability") == 0.0)
    assert(r.getAs[Double]("resolution") == 0.0625)
    assert(r.getAs[Double]("uncertainty") == 0.1875)
  }

  test("corpus invariants: ap in [0,1], brier terms nonnegative, eta2 in [0,1]") {
    val ap = SparkEntry.queries("classifier_auprc")(spark, sfDir)
      .collect().head
    assert(ap.getAs[Long]("ap_micro") >= 0L
      && ap.getAs[Long]("ap_micro") <= 1000000L)
    val br = SparkEntry.queries("classifier_brier")(spark, sfDir)
      .collect().head
    assert(br.getAs[Double]("brier") >= 0.0 && br.getAs[Double]("brier") <= 1.0)
    assert(br.getAs[Double]("reliability") >= 0.0)
    assert(br.getAs[Double]("resolution") >= 0.0)
    assert(br.getAs[Double]("uncertainty") >= 0.0
      && br.getAs[Double]("uncertainty") <= 0.25)
    val ef = SparkEntry.queries("anova_effect_size")(spark, sfDir)
      .collect().head
    val eta2 = ef.getAs[Double]("eta2")
    assert(eta2 >= 0.0 && eta2 <= 1.0)
    assert(ef.getAs[Double]("omega2") <= eta2)
    val th = SparkEntry.queries("theil_index")(spark, sfDir).collect()
    th.foreach(r => assert(r.getAs[Double]("theil_t") >= -0.000001))
  }
}
