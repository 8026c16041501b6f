package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end exercise of the library's two public registration
  * surfaces: builder-time `SparkSessionExtensions` (GraftExtensions)
  * and runtime `GraftFunctions.registerAll` — every injected SQL
  * function is invoked through `spark.sql`, and the injected
  * optimizer rule is shown to fire in the extensions-built session.
  */
class GraftExtensionsSpec extends SparkTestBase {

  // A session CREATED with .withExtensions — getOrCreate returns the
  // active session if one exists, so clear the registry first (the
  // underlying SparkContext is reused) and restore the shared session
  // afterwards.
  private def withExtSession[A](f: SparkSession => A): A = {
    val shared = spark // force SparkTestBase init so the context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try f(ext)
    finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("injected SQL functions run through spark.sql in a withExtensions session") {
    withExtSession { ext =>
      import ext.implicits._
      Seq("alpha beta", "alpha  beta", "gamma").toDF("text")
        .createOrReplaceTempView("ext_docs")
      // fingerprint64: SQL call == column-API expression
      val viaSql = ext.sql("SELECT fingerprint64(text) AS fp FROM ext_docs")
        .as[Long].collect().toSeq
      val viaCol = ext.table("ext_docs")
        .select(graft.functions.Fingerprint64.fingerprint64(col("text")))
        .as[Long].collect().toSeq
      assert(viaSql == viaCol && viaSql.distinct.size == 3)

      (1 to 1000).toDF("n").createOrReplaceTempView("ext_nums")
      val hll = ext.sql("SELECT hll_distinct(n) AS d FROM ext_nums")
        .as[Long].head()
      assert(math.abs(hll - 1000) <= 50, s"hll_distinct=$hll not within 5% of 1000")

      val med = ext.sql("SELECT tdigest_quantile(CAST(n AS DOUBLE), 0.5) AS m FROM ext_nums")
        .as[Double].head()
      assert(math.abs(med - 500.5) <= 15.0, s"tdigest median=$med")
    }
  }

  test("injected optimizer rule rewrites range joins in a withExtensions session") {
    withExtSession { ext =>
      import ext.implicits._
      ext.conf.set("spark.graft.rangejoin.bucketWidth", "32")
      val points = Seq((1L, 5L), (2L, 35L), (3L, 64L), (4L, 100L)).toDF("pid", "x")
      val intervals = Seq((10L, 0L, 40L), (11L, 30L, 70L)).toDF("iid", "lo", "hi")
      val df = points.join(intervals, $"x" >= $"lo" && $"x" <= $"hi")
        .select("pid", "iid")
      val got = df.as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L)))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"injected rewrite did not fire:\n$plan")
    }
  }

  test("registerAll registers the same functions on an existing session") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    Seq("one two", "three").toDF("text").createOrReplaceTempView("reg_docs")
    val fps = spark.sql("SELECT fingerprint64(text) AS fp FROM reg_docs")
      .as[Long].collect().toSeq
    assert(fps.size == 2 && fps.distinct.size == 2)
    (1 to 200).toDF("n").createOrReplaceTempView("reg_nums")
    val d = spark.sql(
      "SELECT hll_distinct(n) AS d, tdigest_quantile(CAST(n AS DOUBLE), 0.9) AS p90 FROM reg_nums")
      .collect().head
    assert(math.abs(d.getLong(0) - 200) <= 20)
    assert(math.abs(d.getDouble(1) - 180.0) <= 10.0)

    val bm = spark.sql(
      """SELECT
        |  bloom_might_contain((SELECT bloom_filter(CAST(n AS BIGINT)) FROM reg_nums),
        |    CAST(5 AS BIGINT)) AS hit,
        |  bloom_might_contain((SELECT bloom_filter(CAST(n AS BIGINT)) FROM reg_nums),
        |    CAST(123456789 AS BIGINT)) AS miss""".stripMargin).head()
    assert(bm.getBoolean(0) && !bm.getBoolean(1))

    val tr = spark.sql(
      """SELECT size(token_pairs(split('a a b', ' '))) AS np,
        |  (token_repetition_stats(split('a a b', ' '))).n_distinct AS nd""".stripMargin)
      .head()
    assert(tr.getInt(0) == 2 && tr.getLong(1) == 2L)

    // fmix64 column expr must equal an independent restatement of the
    // MurmurHash3 finalizer, and bottomk_sample through SQL must emit
    // in that hash order
    def refMix(x0: Long): Long = {
      var x = x0
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^= x >>> 33; x
    }
    val fm = spark.sql("SELECT fmix64(CAST(42 AS BIGINT)) AS h").as[Long].head()
    assert(fm == refMix(42L))
    val bk = spark.sql(
      "SELECT bottomk_sample(CAST(n AS BIGINT), 3) AS s FROM reg_nums")
      .as[Seq[Long]].head()
    val expect = (1L to 200L).sortBy(refMix).take(3)
    assert(bk == expect, s"$bk != $expect")

    // token_entropy_stats: "a a b" → n=3, d=2, S = 1·(1·ln1) + 1·(2·ln2)
    val ent = spark.sql(
      """SELECT e.n_toks, e.n_distinct, e.sum_clnc
        |FROM (SELECT token_entropy_stats(split('a a b', ' ')) AS e)""".stripMargin)
      .head()
    assert(ent.getLong(0) == 3L && ent.getLong(1) == 2L)
    assert(math.abs(ent.getDouble(2) - 2 * math.log(2)) < 1e-12)

    // Declared input types: an INT literal reaches fmix64 through an
    // implicit widening cast, identical on interpreted and codegen
    // paths (without ImplicitCastInputTypes the two paths diverged).
    val fmInt = spark.sql("SELECT fmix64(42) AS h").as[Long].head()
    assert(fmInt == refMix(42L))

    // Malformed SQL calls must fail AT ANALYSIS with the function
    // name in the message, not an opaque cast/NPE during resolution.
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bottomk_sample(CAST(n AS BIGINT), n) FROM reg_nums")
        .collect()
    }
    assert(e1.getMessage.contains("bottomk_sample"), e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bottomk_sample(CAST(n AS BIGINT)) FROM reg_nums")
        .collect()
    }
    assert(e2.getMessage.contains("2 argument"), e2.getMessage)
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cms_lookup(NULL) FROM reg_nums").collect()
    }
    assert(e3.getMessage.contains("cms_lookup"), e3.getMessage)
    // non-integral k must be rejected, not truncated to k=2
    val e4 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bottomk_sample(CAST(n AS BIGINT), 2.9) FROM reg_nums")
        .collect()
    }
    assert(e4.getMessage.contains("integer literal"), e4.getMessage)
    // one-arg functions: extra args must fail loudly, not be ignored
    val e5 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT fingerprint64('a', 'b')").collect()
    }
    assert(e5.getMessage.contains("fingerprint64"), e5.getMessage)
  }
}

/** Custom whole-operator tier: TopKPerKey logical node + strategy +
  * physical bounded-heap execs must produce EXACTLY the rows and
  * ranks of the row_number window spelling, without planning a
  * WindowExec/full sort.
  */
class TopKSpec extends SparkTestBase {
  import graft.plans.TopK
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._

  private def windowed(k: Int) = {
    val li = GraftSession.table(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    li.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  private def viaTopK(k: Int) = {
    val li = GraftSession.table(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    TopK.perKey(li, Seq("l_returnflag"),
      Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), k)
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
      r.getDouble(3), r.getInt(4))).toSet

  test("equals the row_number window spelling on real data, including ranks") {
    try {
      assert(rows(viaTopK(7)) == rows(windowed(7)))
      assert(rows(viaTopK(1)) == rows(windowed(1)))
    } finally TopK.disable(spark)
  }

  test("plans bounded heaps + one exchange, never a WindowExec or full Sort") {
    try {
      val df = viaTopK(5)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKeyPartial") && plan.contains("TopKPerKeyFinal"),
        s"custom execs missing:\n$plan")
      assert(!plan.contains("Window"), s"window leaked into:\n$plan")
      assert(!plan.contains("Sort "), s"full sort leaked into:\n$plan")
    } finally TopK.disable(spark)
  }

  test("k larger than any group returns whole groups, ranked") {
    import spark.implicits._
    try {
      val df = Seq(("a", 3L), ("a", 1L), ("b", 2L)).toDF("g", "v")
      val got = TopK.perKey(df, Seq("g"), Seq(("v", true)), 10)
        .as[(String, Long, Int)].collect().toSet
      assert(got == Set(("a", 1L, 1), ("a", 3L, 2), ("b", 2L, 1)))
    } finally TopK.disable(spark)
  }

  test("registered low-cardinality top-N queries run on TopKPerKey, not a window") {
    try {
      Seq("text_top_bigrams", "stratified_sample",
          "window_top_supplier_per_nation").foreach { q =>
        val df = SparkEntry.queries(q)(spark, sfDir)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("TopKPerKeyFinal"),
          s"$q does not plan TopKPerKeyFinalExec:\n$plan")
        assert(!plan.contains("Window"),
          s"$q still plans a window sort:\n$plan")
      }
    } finally TopK.disable(spark)
  }

  test("memory guard throws with guidance past maxKeysPerPartition") {
    import spark.implicits._
    spark.conf.set(TopK.MaxKeysConf, "10")
    try {
      val df = spark.range(1000).toDF("v").withColumn("g", col("v"))
      val ex = intercept[Throwable] {
        TopK.perKey(df, Seq("g"), Seq(("v", true)), 2).collect()
      }
      val messages = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
      assert(messages.contains("distinct keys in one partition"),
        s"guard did not fire / lost its guidance:\n$messages")
      // Under the default ceiling the same query runs fine.
      spark.conf.unset(TopK.MaxKeysConf)
      assert(TopK.perKey(df, Seq("g"), Seq(("v", true)), 2).count() == 1000)
    } finally {
      spark.conf.unset(TopK.MaxKeysConf)
      TopK.disable(spark)
    }
  }
}

/** Count-min sketch: never-undercount guarantee, partition
  * independence (merge correctness), and SQL registration.
  */
class CountMinSpec extends SparkTestBase {
  import graft.functions.CountMin
  import spark.implicits._

  test("estimates never undercount and are exact on low-collision data") {
    val df = (1 to 50).flatMap(k => Seq.fill(k)(k.toLong)).toDF("k")
    val sk = df.agg(CountMin.countMinSketch(col("k")).as("sk"))
    val got = (1 to 50).toDF("key")
      .join(org.apache.spark.sql.functions.broadcast(sk))
      .select(col("key"), CountMin.cmsEstimate(col("sk"), col("key").cast("long")).as("est"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (1 to 50).foreach { k =>
      assert(got(k) >= k.toLong, s"undercount for $k: ${got(k)}")
      assert(got(k) == k.toLong, s"collision on tiny corpus for $k: ${got(k)}")
    }
  }

  test("sketch is partition-independent (merge == single-partition result)") {
    val li = GraftSession.table(spark, sfDir, "lineitem")
      .select(col("l_partkey"))
    def est(parts: Int): Array[Long] = {
      val sk = li.repartition(parts)
        .agg(CountMin.countMinSketch(col("l_partkey")).as("sk"))
      (1L to 20L).toDF("key")
        .join(org.apache.spark.sql.functions.broadcast(sk))
        .select(CountMin.cmsEstimate(col("sk"), col("key")).as("e"))
        .orderBy(col("e")).as[Long].collect()
    }
    assert(est(1).toSeq == est(7).toSeq)
  }

  test("count_min/cms_lookup callable through SQL after registerAll") {
    graft.functions.GraftFunctions.registerAll(spark)
    Seq(1L, 1L, 1L, 2L).toDF("k").createOrReplaceTempView("cms_in")
    val est = spark.sql(
      "SELECT cms_lookup(count_min(k), CAST(1 AS BIGINT)) AS e FROM cms_in")
      .as[Long].head()
    assert(est == 3L)
  }

  test("cms_inner_product and winnow_fingerprints callable through SQL") {
    graft.functions.GraftFunctions.registerAll(spark)
    Seq(1L, 1L, 2L).toDF("k").createOrReplaceTempView("ip_a")
    Seq(1L, 3L).toDF("k").createOrReplaceTempView("ip_b")
    // exact inner product = f_a(1)·f_b(1) = 2 — CMS never undercounts
    val ip = spark.sql(
      """SELECT cms_inner_product(
        |  (SELECT count_min(k) FROM ip_a),
        |  (SELECT count_min(k) FROM ip_b)) AS e""".stripMargin)
      .as[Long].head()
    assert(ip >= 2L)
    val n = spark.sql(
      "SELECT size(winnow_fingerprints(split('a b c d e f g', ' '), 3, 4)) AS n")
      .as[Int].head()
    assert(n >= 1)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT winnow_fingerprints(split('a b c', ' '), 0, 4)").collect()
    }
  }
}

/** Misra-Gries frequent items: exact regime, adversarial eviction
  * regime (uniform tail — the hardest input for MG), guarantee
  * invariance under partitioning/merge order, and SQL registration
  * with argument validation.
  */
class MisraGriesSpec extends SparkTestBase {
  import graft.functions.MisraGries
  import spark.implicits._

  private def entries(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("capacity >= distincts: summary IS the exact count table, any partitioning") {
    val data = (1 to 40).flatMap(k => Seq.fill(k)(s"tok$k"))
    for (parts <- Seq(1, 7)) {
      val df = data.toDF("t").repartition(parts)
      val got = entries(df.agg(MisraGries.sketch(col("t"), 64).as("sk")))
      assert(got.size == 40)
      (1 to 40).foreach(k => assert(got(s"tok$k") == k.toLong))
    }
  }

  test("eviction regime: never overcount, undercount <= N/(m+1), heavy keys tracked") {
    // adversarial for MG: 3 heavy keys over a LARGE uniform tail
    // (5000 distinct singletons force constant prunes at m=16)
    val heavy = Seq("a" -> 4000, "b" -> 3000, "c" -> 2000)
    val tail = (1 to 5000).map(i => s"t$i" -> 1)
    val data = (heavy ++ tail).flatMap { case (k, n) => Seq.fill(n)(k) }
    val n = data.size.toLong
    val m = 16
    for (parts <- Seq(1, 8)) {
      val df = data.toDF("t").repartition(parts)
      val got = entries(df.agg(MisraGries.sketch(col("t"), m).as("sk")))
      assert(got.size <= m)
      val exact = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      got.foreach { case (k, est) =>
        assert(est <= exact(k), s"overcount for $k: $est > ${exact(k)}")
        assert(exact(k) - est <= n / (m + 1),
          s"undercount bound broken for $k: ${exact(k)} - $est > ${n / (m + 1)}")
      }
      // every key with true count > N/(m+1) must survive every
      // prune/merge schedule
      heavy.filter(_._2 > n / (m + 1)).foreach { case (k, _) =>
        assert(got.contains(k), s"heavy key $k evicted (n=$n, bound=${n / (m + 1)})")
      }
    }
  }

  test("mg_sketch callable through SQL; arity and literal-capacity validated") {
    graft.functions.GraftFunctions.registerAll(spark)
    Seq("x", "x", "y").toDF("t").createOrReplaceTempView("mg_in")
    val top = spark.sql(
      "SELECT get(mg_sketch(t, 4), 0) AS e FROM mg_in")
      .select(col("e.item"), col("e.cnt")).head()
    assert(top.getString(0) == "x" && top.getLong(1) == 2L)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT mg_sketch(t) FROM mg_in").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT mg_sketch(t, t) FROM mg_in").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT mg_sketch(t, 0) FROM mg_in").collect()
    }
  }
}

/** Int8 quantization: error bound, code range, determinism, and the
  * quantized-candidate IVF path reranking to EXACT brute-force
  * results when the candidate stage covers the corpus.
  */
class QuantizeSpec extends SparkTestBase {
  import graft.operators.{Quantize, VectorOps}

  private lazy val vecs =
    GraftSession.table(spark, sfDir, "embeddings").limit(60).cache()

  test("dequantized reconstruction is within scale/2 per dimension; codes within ±127") {
    val q = Quantize.quantizeInt8(
      vecs.select(col("vec_id"), col("embedding").cast("array<double>").as("v")), "v")
    val checked = q.select(
      forall(
        zip_with(col("q_codes"), col("v"),
          (c, x) => abs(c * col("q_scale") - x) <= col("q_scale") * lit(0.5000001)),
        b => b).as("err_ok"),
      array_max(transform(col("q_codes"), x => abs(x))).as("maxc"))
      .collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      assert(r.getBoolean(0), "reconstruction error exceeded scale/2")
      assert(r.getLong(1) <= 127L && r.getLong(1) >= 1L, s"code out of range: ${r.getLong(1)}")
    }
  }

  test("quantization is deterministic across runs") {
    def run() = Quantize.quantizeInt8(
      vecs.select(col("vec_id"), col("embedding").cast("array<double>").as("v")), "v")
      .select(col("vec_id"), col("q_scale"), col("q_codes"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Long](2))).toSeq.sortBy(_._1)
    assert(run() == run())
  }

  test("ivfTopKInt8 with full probes + covering oversample equals brute force exactly") {
    val queries = vecs.filter(col("vec_id") < 5)
    val cents = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val k = 5
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "id", "cosine", "rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    val bf = key(VectorOps.bruteForceTopK(vecs, queries, "vec_id", "embedding", k))
    // nProbe covers every cell and k·oversample ≥ |corpus|, so every
    // vector reaches the exact rerank — the int8 candidate stage can
    // only affect ordering BEFORE rerank, hence exact equality.
    val q8 = key(VectorOps.ivfTopKInt8(vecs, queries, cents,
      "vec_id", "embedding", "cid", "cv", k, nProbe = 4, oversample = 20))
    assert(q8 == bf, s"int8 IVF diverged from brute force")
  }
}
