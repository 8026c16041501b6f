package graft

import graft.functions.HllSketch
import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

/** Skew-handling salted join (SURVEY §5). */
class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    val lineitem = GraftSession.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_quantity")
    val supplier = GraftSession.table(spark, sfDir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))

    val plain = lineitem.join(supplier, "l_suppkey")
      .select("l_orderkey", "l_suppkey", "s_name")
    val salted = SkewJoin.saltedInnerJoin(
        lineitem, supplier, key = "l_suppkey",
        scatterCol = "l_orderkey", buckets = 8)
      .select("l_orderkey", "l_suppkey", "s_name")

    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salting spreads a hot key across buckets") {
    val hot = Seq.fill(1000)((1L, scala.util.Random.nextLong())).toDF("k", "payload")
    val spread = hot.withColumn("_salt", pmod(hash(col("payload")), lit(8)))
      .select("_salt").distinct().count()
    assert(spread > 4, s"hot key landed in only $spread buckets")
  }
}

/** AQE skew-join rehearsal: a hot key big enough to trip the skew
  * detector must be split at runtime (SURVEY §5 names AQE skew-split
  * as the skew story for shuffle joins; SkewJoin.saltedInnerJoin is
  * the explicit fallback tested above).
  */
class AqeSkewSpec extends SparkTestBase {
  import spark.implicits._

  test("AQE splits the hot-key partition in a skewed sort-merge join") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // ~80% of rows share key 0; the rest scatter
      val big = spark.range(0, 50000).select(
        when($"id" % 5 =!= 0, lit(0L)).otherwise($"id").as("k"),
        concat(lit("payload-payload-payload-"), $"id").as("pay"))
      val small = spark.range(0, 1000).select($"id".as("k"), lit("dim").as("d"))
      val joined = big.join(small, "k")
      joined.collect() // finalize THIS QueryExecution's adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE skew split did not engage:\n$plan")
    } finally prev.foreach { case (k, v) =>
      v match {
        case Some(x) => spark.conf.set(k, x)
        case None => spark.conf.unset(k)
      }
    }
  }
}

/** t-digest quantile sketch (functions/TDigest.scala). */
class TDigestSpec extends SparkTestBase {
  import spark.implicits._
  import graft.functions.TDigest
  import graft.functions.TDigest.tdigestQuantile

  test("quantiles within 1% on uniform data, independent of partitioning") {
    val df = spark.range(0, 100000).select($"id".cast("double").as("v"))
    def q(parts: Int, p: Double): Double =
      df.repartition(parts).agg(tdigestQuantile(col("v"), p)).head().getDouble(0)
    assert(math.abs(q(3, 0.5) - 50000) / 50000 < 0.01, s"p50=${q(3, 0.5)}")
    assert(math.abs(q(8, 0.5) - 50000) / 50000 < 0.01, "partition-count sensitivity")
    assert(math.abs(q(5, 0.9) - 90000) / 90000 < 0.01, s"p90=${q(5, 0.9)}")
  }

  test("tail quantiles stay tight and SQL registration works") {
    TDigest.register(spark)
    spark.range(0, 100000).select($"id".cast("double").as("v"))
      .createOrReplaceTempView("td_v")
    val p999 = spark.sql(
      "SELECT tdigest_quantile(v, 0.999) FROM td_v").head().getDouble(0)
    assert(math.abs(p999 - 99900) / 99900 < 0.005, s"p999=$p999")
  }

  test("groupwise digests on real data bound the exact percentile error") {
    val rows = GraftSession.table(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        tdigestQuantile(col("o_totalprice"), 0.5).as("td"),
        expr("percentile(o_totalprice, 0.5)").as("exact"))
      .select((abs(col("td") - col("exact")) / col("exact")).as("err"))
      .as[Double].collect()
    assert(rows.nonEmpty && rows.forall(_ < 0.02), s"errors: ${rows.toSeq}")
  }
}

/** Custom HLL sketch aggregate (B27). */
class HllSpec extends SparkTestBase {
  import spark.implicits._

  test("estimate within 5% of exact distinct on real data") {
    val li = GraftSession.table(spark, sfDir, "lineitem")
    val row = li.agg(
      HllSketch.hllDistinct(col("l_partkey")).as("est"),
      countDistinct(col("l_partkey")).as("exact")).head()
    val est = row.getAs[Long]("est").toDouble
    val exact = row.getAs[Long]("exact").toDouble
    assert(math.abs(est - exact) / exact < 0.05, s"est=$est exact=$exact")
  }

  test("sketch merges across groups and registers in SQL") {
    HllSketch.register(spark)
    GraftSession.table(spark, sfDir, "lineitem").createOrReplaceTempView("li_hll")
    val est = spark.sql(
      "SELECT hll_distinct(l_orderkey) FROM li_hll").head().getLong(0)
    val exact = spark.sql(
      "SELECT count(DISTINCT l_orderkey) FROM li_hll").head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact < 0.05, s"est=$est exact=$exact")
  }

  test("low cardinality is exact via linear counting") {
    val est = Seq(1L, 2L, 3L, 2L, 1L).toDF("v")
      .agg(HllSketch.hllDistinct(col("v"))).head().getLong(0)
    assert(est == 3L)
  }
}

/** Bucketed tables: co-located join without a shuffle (SURVEY §5). */
class BucketedJoinSpec extends SparkTestBase {

  test("join of two bucketed tables plans without Exchange") {
    val orders = GraftSession.table(spark, sfDir, "orders")
    val customer = GraftSession.table(spark, sfDir, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders.write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    customer.withColumnRenamed("c_custkey", "o_custkey")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}

/** Range join operator (B28). */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.RangeJoin

  test("bucketed point-in-interval equals the naive inequality join") {
    val points = Seq((1L, 5L), (2L, 35L), (3L, 64L), (4L, 100L)).toDF("pid", "x")
    val intervals = Seq((10L, 0L, 40L), (11L, 30L, 70L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi", 32L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L)))
  }
}

/** Partitioned-write + partition pruning (SURVEY §5). */
class PartitionPruningSpec extends SparkTestBase {

  test("filter on a partition column prunes at the file index") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    GraftSession.table(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value")
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val clicks = spark.read.parquet(dir).filter(col("event_type") === "click")
    clicks.collect()
    val plan = clicks.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition filter:\n$plan")
    val expected = GraftSession.table(spark, sfDir, "events")
      .filter(col("event_type") === "click").count()
    assert(clicks.count() == expected)
  }
}

/** Optimizer extension: naive inequality join → bucketed equi-join. */
class RangeJoinRewriteSpec extends SparkTestBase {
  import spark.implicits._
  import graft.plans.RangeJoinRewrite

  private def naiveJoin() = {
    val points = Seq((1L, 5L), (2L, 35L), (3L, 64L), (4L, 100L)).toDF("pid", "x")
    val intervals = Seq((10L, 0L, 40L), (11L, 30L, 70L)).toDF("iid", "lo", "hi")
    points.join(intervals, $"x" >= $"lo" && $"x" <= $"hi")
      .select("pid", "iid")
  }

  test("rewrites the nested-loop join into a hash join with identical results") {
    val expected = naiveJoin().as[(Long, Long)].collect().toSet
    assert(expected == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L)))

    RangeJoinRewrite.enable(spark)
    try {
      spark.conf.set("spark.graft.rangejoin.bucketWidth", "32")
      val df = naiveJoin()
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rewrite did not fire:\n$plan")
      assert(plan.contains("HashJoin"), s"expected hash join:\n$plan")
      assert(df.as[(Long, Long)].collect().toSet == expected)
    } finally RangeJoinRewrite.disable(spark)
  }

  test("ordinary equi-joins are left untouched") {
    RangeJoinRewrite.enable(spark)
    try {
      val a = Seq((1L, "x")).toDF("k", "v")
      val b = Seq((1L, "y")).toDF("k", "w")
      val joined = a.join(b, "k")
      assert(joined.count() == 1)
    } finally RangeJoinRewrite.disable(spark)
  }
}

/** Deterministic bottom-k sampling sketch. */
class BottomKSpec extends SparkTestBase {
  import spark.implicits._
  import graft.functions.BottomKSample.bottomkSample

  test("sample is deterministic, bounded, and partition-independent") {
    val li = GraftSession.table(spark, sfDir, "lineitem")
    def sample(parts: Int): Seq[Long] =
      li.repartition(parts)
        .agg(bottomkSample(col("l_orderkey"), 10))
        .head().getAs[scala.collection.Seq[Long]](0).toSeq
    val a = sample(2)
    val b = sample(7)
    assert(a == b, "sample depends on partitioning")
    assert(a.length == 10 && a.distinct.length == 10)
  }

  test("grouped sampling keeps at most k per group") {
    val li = GraftSession.table(spark, sfDir, "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(bottomkSample(col("l_partkey"), 5).as("s"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[scala.collection.Seq[Long]]("s").length == 5))
  }
}

/** Connected components (C15b). */
class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.ConnectedComponents

  test("chained pairs collapse into one component with min-id label") {
    // components: {1,2,3,9} via chain 1-2, 2-3, 3-9; {5,6}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (5L, 6L)).toDF("id_a", "id_b")
    val got = ConnectedComponents.clusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("deep chain needs many propagation rounds; single-job convergence still exact") {
    // a 30-node path labels hop one edge per round — exercises the
    // accumulator convergence signal + per-round checkpoint over
    // many iterations (label must travel the full diameter).
    val chain = (1 to 29).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val got = ConnectedComponents.clusters(chain)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 30 && got.values.forall(_ == 1L), s"got $got")
    // maxIter smaller than the diameter must THROW, not return wrong ids
    intercept[IllegalStateException] {
      ConnectedComponents.clusters(chain, maxIter = 3)
    }
  }
}

/** Iterative k-means (corpus clustering). */
class KMeansSpec extends SparkTestBase {
  import spark.implicits._
  import graft.operators.KMeans

  test("separates well-spaced blobs into distinct clusters") {
    // two tight blobs around (0,0) and (10,10)
    val pts = Seq(
      (1L, Array(0.0f, 0.1f)), (2L, Array(0.1f, 0.0f)), (3L, Array(-0.1f, 0.1f)),
      (11L, Array(10.0f, 10.1f)), (12L, Array(10.1f, 9.9f)), (13L, Array(9.9f, 10.0f))
    ).toDF("vec_id", "embedding")
    val (assigned, centroids) = KMeans.fit(pts, "vec_id", "embedding", k = 2, iterations = 4)
    val byCluster = assigned.as[(Long, Int)].collect().groupBy(_._2).values
      .map(_.map(_._1).toSet).toSet
    assert(byCluster == Set(Set(1L, 2L, 3L), Set(11L, 12L, 13L)), s"got $byCluster")
    assert(centroids.count() == 2)
  }

  test("deterministic across runs") {
    val vecs = GraftSession.table(spark, sfDir, "embeddings").limit(100)
    def run() = KMeans.fit(vecs, "vec_id", "embedding", k = 4, iterations = 2)
      ._1.as[(Long, Int)].collect().toMap
    assert(run() == run())
  }
}

/** Compression-ratio quality signal. */
class CompressRatioSpec extends SparkTestBase {
  import spark.implicits._
  import graft.functions.CompressRatio.compressRatio

  test("repetitive text compresses far below random-ish text") {
    val df = Seq(
      "spam spam spam spam " * 50,
      "the quick brown fox jumps over a lazy dog while nine wizards vex").toDF("text")
    val got = df.select(compressRatio(col("text"))).as[Double].collect().toSeq
    assert(got(0) < 0.1, s"repetitive ratio ${got(0)}")
    assert(got(1) > 0.5, s"normal ratio ${got(1)}")
    // deterministic
    val again = df.select(compressRatio(col("text"))).as[Double].collect().toSeq
    assert(got == again)
  }
}

/** Bucketed-table co-located join (B40): the write-time shuffle must
  * buy an exchange-free join at read time.
  */
class BucketingSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import graft.sources.Bucketing

  test("same-bucketed tables join with no exchange on either side") {
    val orders = GraftSession.table(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_totalprice"))
    val customer = GraftSession.table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    Bucketing.writeBucketed(orders, "graft_spec_b_orders", "o_custkey", 8)
    Bucketing.writeBucketed(customer, "graft_spec_b_customer", "c_custkey", 8)

    val joined = Bucketing.bucketJoin(spark,
      "graft_spec_b_orders", "graft_spec_b_customer", "o_custkey", "c_custkey")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must be exchange-free:\n$plan")
    assert("SelectedBucketsCount|Bucketed: true".r.findFirstIn(plan).isDefined,
      s"scan does not report bucketed layout:\n$plan")

    // same rows as the plain (shuffling) join
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
    assert(joined.count() == plain.count())
    val a = joined.groupBy(col("c_mktsegment"))
      .agg(round(sum(col("o_totalprice")), 2).as("rev"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = plain.groupBy(col("c_mktsegment"))
      .agg(round(sum(col("o_totalprice")), 2).as("rev"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("groupBy on the bucket key also reuses the layout (no exchange)") {
    val agg = spark.table("graft_spec_b_orders")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("v"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucket-key aggregation must be exchange-free:\n$plan")
  }
}

/** Bloom-filter runtime join pruning (B41). */
class BloomFilterSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import graft.functions.BloomFilter
  import spark.implicits._

  test("no false negatives; false-positive rate near theory; codegen probe") {
    val keys = spark.range(0, 20000).select(col("id"))
    // materialized once, probed as a literal (the pruned() shape —
    // carrying the image as a joined column copies it into every row)
    val image = keys.agg(BloomFilter.bloomAgg(col("id"), 1 << 18, 7))
      .head().getAs[Array[Byte]](0)
    // every inserted key must probe true
    val misses = keys
      .filter(!BloomFilter.mightContain(lit(image), col("id")))
      .count()
    assert(misses == 0, s"$misses false negatives")
    // disjoint keys: fpp for m/n = 2^18/2e4 ≈ 13.1 bits/key, k=7
    // is ~0.55%; assert a generous 2%
    val fp = spark.range(1000000, 1100000).select(col("id"))
      .filter(BloomFilter.mightContain(lit(image), col("id")))
      .count()
    assert(fp < 2000, s"false-positive count $fp out of 100k (expected ~550)")
    // the probe must run inside a whole-stage-codegen filter
    val probe = keys.filter(BloomFilter.mightContain(lit(image), col("id")))
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), s"probe missing:\n$plan")
    assert("""\*\(\d+\)[^\n]*Filter""".r.findFirstIn(plan).isDefined,
      s"probe filter not codegen'd:\n$plan")
  }

  test("filter is partition-independent (merge == single-partition build)") {
    def image(parts: Int): Seq[Byte] = {
      val df = spark.range(0, 5000).repartition(parts)
      df.agg(BloomFilter.bloomAgg(col("id"), 1 << 14, 5).as("bf"))
        .as[Array[Byte]].head().toSeq
    }
    assert(image(1) == image(8))
  }

  test("pruned join equals the plain join on real data") {
    val dim = GraftSession.table(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"))
    val fact = GraftSession.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val pruned = BloomFilter.pruned(fact, "l_orderkey", dim, "o_orderkey")
      .join(dim, col("l_orderkey") === col("o_orderkey"))
    val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
    assert(pruned.count() == plain.count())
    assert(pruned.agg(round(sum(col("l_quantity")), 2)).head().getDouble(0) ==
      plain.agg(round(sum(col("l_quantity")), 2)).head().getDouble(0))
  }
}

/** Fuzzy record linkage (C28): q-gram count filter + verify must
  * equal the brute-force levenshtein join exactly.
  */
class FuzzyJoinSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import graft.operators.FuzzyJoin
  import spark.implicits._

  private def brute(df: org.apache.spark.sql.DataFrame, colName: String,
      k: Int): Set[(String, String, Int)] = {
    val n = df.select(col(colName).as("name")).distinct()
    n.as("a").join(n.as("b"), col("a.name") < col("b.name"))
      .select(col("a.name"), col("b.name"),
        levenshtein(col("a.name"), col("b.name")).as("d"))
      .filter(col("d") <= k)
      .as[(String, String, Int)].collect().toSet
  }

  test("equals brute force on part names (k=1 and k=2)") {
    val part = GraftSession.table(spark, sfDir, "part")
    Seq(1, 2).foreach { k =>
      val got = FuzzyJoin.editDistancePairs(part, "p_name", k)
        .as[(String, String, Int)].collect().toSet
      assert(got == brute(part, "p_name", k), s"mismatch at k=$k")
    }
  }

  test("corner cases: short strings, repeated grams, length bands") {
    val df = Seq("a", "ab", "abc", "aaaa", "aaab", "abab", "baba",
      "xxxxxxxxxx", "xxxxxxxxxy", "xxyxxyxxyx", "", "b", "ba").toDF("s")
    Seq(1, 2).foreach { k =>
      val got = FuzzyJoin.editDistancePairs(df, "s", k)
        .as[(String, String, Int)].collect().toSet
      assert(got == brute(df, "s", k), s"mismatch at k=$k: $got")
    }
  }

  test("plans keyed equi-joins only — no cartesian on the gram path") {
    val part = GraftSession.table(spark, sfDir, "part")
    val df = FuzzyJoin.editDistancePairs(part, "p_name", 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian leaked:\n$plan")
  }

  test("prefix filter kills the hot-gram f² blowup but stays complete") {
    // Pathological corpus: every name shares the hot bigram "an" many
    // times, but names are pairwise FAR apart (distinct rare tails).
    // Joining on raw grams would emit ~n²/2 candidate rows on the hot
    // keys; the rarity-ordered prefix keys each name on its unique
    // tail grams, so candidates collapse to ~0 while the near-pair
    // planted in the corpus must still be found.
    val n = 60
    val far = (0 until n).map(i => f"anan$i%02dq${(i * 7) % 100}%02dz")
    val near = Seq("anananana", "ananabana") // dist 1, planted pair
    val df = (far ++ near).toDF("s")
    val names = df.select(col("s").as("name")).distinct()
      .withColumn("len", length(col("name")))
    val candCount = FuzzyJoin.gramCandidates(names, maxDist = 1, q = 2).count()
    assert(candCount <= 10,
      s"prefix filter leaked $candCount candidates (raw-gram join would emit ~${n * n / 2})")
    val got = FuzzyJoin.editDistancePairs(df, "s", 1)
      .as[(String, String, Int)].collect().toSet
    assert(got == brute(df, "s", 1), s"completeness lost: $got")
  }
}

/** Z-order layout (B42): per-file min/max stats must prune scans on
  * BOTH dimensions, where a linear sort prunes only its own.
  */
class ZOrderSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import graft.sources.ZOrder

  test("z-value interleaves bits (pinned examples)") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 0L))
      .toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")))
      .as[Long].collect().toSeq
    // interleave(x even bits, y odd bits): (3,5) = x:011 y:101 →
    // z bits y2x2 y1x1 y0x0 = 10 01 11 = 0b100111 = 39
    assert(got == Seq(0L, 1L, 2L, 39L, 349525L))
  }

  test("band predicates prune files on either dimension; linear layout cannot") {
    val n = 1 << 16
    val df = spark.range(n).select(
      (col("id") * 2654435761L % 1024).as("x"),
      (col("id") * 40503L % 1024).as("y"))
    val files = 16
    val zDir = "/tmp/graft_zorder_test/z"
    val linDir = "/tmp/graft_zorder_test/linear"
    ZOrder.writeZOrdered(df, "x", "y", zDir, files)
    df.repartitionByRange(files, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(linDir)

    // files whose [min,max] stats could contain a row of the band
    def touched(dir: String, colName: String, lo: Long, hi: Long): Int = {
      val parts = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(parts.length == files, s"expected $files files, got ${parts.length}")
      parts.count { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col(colName)), max(col(colName))).head()
        r.getLong(0) <= hi && r.getLong(1) >= lo
      }
    }
    val zx = touched(zDir, "x", 100L, 131L)
    val zy = touched(zDir, "y", 100L, 131L)
    val lx = touched(linDir, "x", 100L, 131L)
    val ly = touched(linDir, "y", 100L, 131L)
    // linear prunes x hard but reads everything for y
    assert(lx <= 2, s"linear x-band touched $lx")
    assert(ly == files, s"linear y-band should touch all $files, got $ly")
    // z-order prunes BOTH bands to a strict subset (~sqrt regime)
    assert(zx <= files / 2, s"z-order x-band touched $zx of $files")
    assert(zy <= files / 2, s"z-order y-band touched $zy of $files")
  }
}

/** C1 shuffle-weight evidence: the fingerprint-keyed dedup must move
  * far fewer exchange bytes than the naive full-text-keyed groupBy.
  */
class DedupShuffleBytesSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.graftbridge.GraftBridge

  test("fingerprint keys cut dedup shuffle bytes vs text keys") {
    // Web-regime corpus: ~2 KB docs (the testdata documents average
    // only ~300 chars, where fixed row overhead hides the win — the
    // ratio scales with document size). Deterministic, 10% clones.
    val docs = spark.range(2000).selectExpr(
      "id AS doc_id",
      """concat_ws(' ', transform(sequence(1, 256),
        |  j -> concat('w', CAST((id % 1800) * 7919 + j * 104729 AS STRING)))) AS text"""
        .stripMargin)
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")

    // the pre-round-5 shape: normalized text AS the groupBy key
    val textKeyed = docs
      .groupBy(norm.as("k"))
      .agg(min(col("doc_id")).as("kept_doc_id"), count(lit(1)).as("n_copies"))
      .select(col("kept_doc_id"), col("n_copies"))
    textKeyed.collect()
    val textBytes = GraftBridge.shuffleBytesWritten(textKeyed)

    // the dedup_exact_docs shape: 128-bit fingerprint + length keys
    val hashed = docs
      .select(col("doc_id"), norm.as("norm"))
      .groupBy(xxhash64(col("norm")), xxhash64(lit(42L), col("norm")),
        length(col("norm")))
      .agg(min(col("doc_id")).as("kept_doc_id"), count(lit(1)).as("n_copies"),
        countDistinct(xxhash64(lit(1337L), col("norm"))).as("_nfp"))
      .filter(assert_true(col("_nfp") === 1).isNull)
      .select(col("kept_doc_id"), col("n_copies"))
    hashed.collect()
    val hashBytes = GraftBridge.shuffleBytesWritten(hashed)

    assert(textBytes > 0 && hashBytes > 0, s"metrics missing: $textBytes / $hashBytes")
    assert(hashBytes * 5 < textBytes,
      s"fingerprint keys should move >5x fewer shuffle bytes: " +
        s"hash=$hashBytes text=$textBytes")
    // and the two shapes agree on the result
    assert(hashed.count() == textKeyed.count())
  }
}

/** C31 shuffle-weight evidence: hashed 16-token spans must move far
  * fewer exchange bytes than exploding the span STRINGS (the oracle's
  * spelling — correct as a specification, ~100 bytes/span on the wire
  * vs 8 for the hash).
  */
class SpanDedupShuffleBytesSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.graftbridge.GraftBridge

  test("hashed span keys cut span-dedup shuffle bytes vs span strings") {
    // deterministic corpus: 300 docs × 64 tokens, 10% clone pairs
    val docs = spark.range(300).selectExpr(
      "id AS doc_id",
      """concat_ws(' ', transform(sequence(1, 64),
        |  j -> concat('tok', CAST((id % 270) * 31 + j * 97 AS STRING)))) AS text"""
        .stripMargin)

    def rollup(grams: org.apache.spark.sql.DataFrame) = {
      val counts = grams.groupBy(col("g")).agg(count(lit(1)).as("n_docs_with"))
      grams.join(counts, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("n_docs_with") > 1, 1L).otherwise(0L)).as("n_dup_spans"))
    }

    // oracle spelling: span strings on the exchange
    val strings = rollup(docs.select(col("doc_id"),
      explode_outer(expr(
        """array_distinct(transform(sequence(1, size(split(text, ' ')) - 15),
          |  i -> concat_ws(' ', slice(split(text, ' '), i, 16))))""".stripMargin))
        .as("g")))
    strings.collect()
    val stringBytes = GraftBridge.shuffleBytesWritten(strings)

    // engine spelling: 8-byte hashes on the exchange
    val hashed = rollup(docs.select(col("doc_id"),
      explode(functions.VectorExpressions.tokenNgramHashes(
        split(col("text"), " "), 16)).as("g")))
    hashed.collect()
    val hashBytes = GraftBridge.shuffleBytesWritten(hashed)

    assert(stringBytes > 0 && hashBytes > 0, s"metrics missing: $stringBytes / $hashBytes")
    // exchange compression (lz4) narrows the raw 100-vs-8-byte gap;
    // >3x compressed is still decisive, and the gap widens with
    // real-text spans that share less structure than this synthetic
    assert(hashBytes * 3 < stringBytes,
      s"hashed spans should move >3x fewer shuffle bytes: " +
        s"hash=$hashBytes strings=$stringBytes")
    // both spellings agree on the per-doc rollup
    val a = hashed.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = strings.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.sameElements(b))
  }
}
