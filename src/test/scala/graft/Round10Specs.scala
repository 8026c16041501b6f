package graft

import graft.operators.{RangeJoin, SpatialJoin}
import org.apache.spark.sql.functions._

/** SpatialJoin.radiusJoin: blocked pair set == the naive O(n²)
  * distance filter (no recall loss, no duplicate emission), across
  * cell widths and a clustered layout.
  */
class SpatialJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def points(n: Int) = (0 until n).map { i =>
    // two dense clusters + a sparse background: exercises cells with
    // many points and empty neighbor cells
    val (lat, lon) =
      if (i % 3 == 0) (0.01 + (i % 7) * 0.001, 0.02 + (i % 5) * 0.001)
      else if (i % 3 == 1) (0.30 + (i % 4) * 0.002, 0.31 + (i % 6) * 0.002)
      else ((i * 37 % 500) / 1000.0, (i * 91 % 500) / 1000.0)
    (i.toLong, lat, lon)
  }.toDF("id", "lat", "lon")

  private def naivePairs(radiusKm: Double): Set[(Long, Long)] = {
    val p = points(120)
    val a = p.select(col("id").as("id_a"), col("lat").as("lat_a"), col("lon").as("lon_a"))
    val b = p.select(col("id").as("id_b"), col("lat").as("lat_b"), col("lon").as("lon_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .filter(graft.functions.GeoFunctions
        .haversineKm(col("lat_a"), col("lon_a"), col("lat_b"), col("lon_b")) < radiusKm)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
  }

  test("blocked radius join equals naive O(n²) filter across cell widths") {
    for (cellDeg <- Seq(0.02, 0.05, 0.1); radiusKm <- Seq(1.0, 2.0)) {
      if (cellDeg * 111.195 >= radiusKm) {
        val p = points(120)
        val a = p.select(col("id").as("id_a"), col("lat").as("lat_a"), col("lon").as("lon_a"))
        val b = p.select(col("id").as("id_b"), col("lat").as("lat_b"), col("lon").as("lon_b"))
        val rows = SpatialJoin.radiusJoin(a, b, "lat_a", "lon_a", "lat_b", "lon_b",
            radiusKm, cellDeg)
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").as[(Long, Long)].collect()
        // exactly once each (the 9 replica cells are distinct)
        assert(rows.length == rows.toSet.size,
          s"duplicate pair emission at cell=$cellDeg r=$radiusKm")
        assert(rows.toSet == naivePairs(radiusKm),
          s"pair set mismatch at cell=$cellDeg r=$radiusKm")
      }
    }
  }

  test("geo_radius_join plans a hash join on the cell key, not a nested loop") {
    val plan = SparkEntry.queries("geo_radius_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"radius join fell back to a nested loop:\n$plan")
    assert(plan.contains("HashedRelation") || plan.contains("HashJoin") ||
      plan.contains("SortMergeJoin"),
      s"no hash/merge join in radius-join plan:\n$plan")
  }

  test("cell narrower than radius is rejected loudly") {
    val p = points(10)
    intercept[IllegalArgumentException] {
      SpatialJoin.radiusJoin(p, p, "lat", "lon", "lat", "lon",
        radiusKm = 5.0, cellDeg = 0.02)
    }
  }
}

/** RangeJoin.pointInIntervalKeyed: key-scoped matches only, and the
  * unkeyed form remains the keyed form with no keys.
  */
class KeyedRangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("keyed point-in-interval joins within the key only") {
    val points = Seq((1L, 5L, "p1"), (1L, 15L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "t", "pname")
    val intervals = Seq((1L, 0L, 10L, "i1"), (2L, 0L, 10L, "i2"), (2L, 12L, 20L, "i3"))
      .toDF("k", "lo", "hi", "iname")
    val got = RangeJoin.pointInIntervalKeyed(points, intervals, Seq("k"),
        "t", "lo", "hi", bucketWidth = 4)
      .select("pname", "iname").as[(String, String)].collect().toSet
    // p1 (k=1, t=5) → i1 only (i2 covers t=5 but k=2); p2 matches
    // nothing in k=1; p3 (k=2, t=5) → i2.
    assert(got == Set(("p1", "i1"), ("p3", "i2")))
  }

  test("multi-touch credit conserves cents per purchase at sf0.001") {
    val df = SparkEntry.queries("attribution_multi_touch")(spark, sfDir)
    val bad = df.groupBy("purchase_id")
      .agg(sum("credit_cents").as("total"))
      .join(
        GraftSession.table(spark, sfDir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            floor(col("value") * 100).cast("long").as("cents")),
        Seq("purchase_id"))
      .filter(col("total") =!= col("cents"))
      .count()
    assert(bad == 0, s"$bad purchases whose split credits do not sum to their cents")
  }
}

/** SynthProvider (DataSource V2): pushdown + pruning contracts. */
class SynthProviderSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  private def load() = spark.read
    .format("graft.sources.SynthProvider")
    .option("rows", "100000").option("slices", "8").load()

  test("unfiltered scan generates the full declared table") {
    val df = load()
    assert(df.count() === 100000L)
    // h really is fmix64(id): cross-check one value through the
    // registered fmix64 column function
    val row = df.filter(col("id") === 12345L)
      .select(col("h"), graft.functions.Fingerprint64.fmix64(col("id")).as("e"))
      .head()
    assert(row.getLong(0) === row.getLong(1))
  }

  test("id bound prunes input partitions at planning time") {
    val n = load().filter(col("id") >= 90000L).count()
    assert(n === 10000L)
    // 8 slices of 12.5k ids; id >= 90000 touches only the last one
    assert(graft.sources.SynthProvider.lastPlannedPartitions === 1,
      s"expected 1 surviving partition, planned ${graft.sources.SynthProvider.lastPlannedPartitions}")
  }

  test("filters and projection reach the scan node") {
    val df = load().filter(col("id") >= 90000L && col("mod16") === 3)
      .select(col("id"), col("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(id,90000)") &&
      plan.contains("EqualTo(mod16,3)"),
      s"pushed filters missing from scan:\n$plan")
    assert(df.count() === 625L)
  }
}

/** JdbcUpsertProvider (DataSource V2 write path): upsert semantics,
  * commit-protocol observability, and transactional task abort.
  */
class JdbcV2WriteSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val url = "jdbc:derby:memory:graftv2db;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def writeV2(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("graft.sources.JdbcUpsertProvider")
      .option("url", url).option("driver", driver)
      .option("dbtable", "v2accounts")
      .option("keys", "id").option("vals", "balance")
      .option("dialect", "derby")
      .mode("append").save()

  private def readBack(): List[(Long, Double)] = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT id, balance FROM v2accounts ORDER BY id")
      Iterator.continually(rs).takeWhile(_.next())
        .map(r => (r.getLong(1), r.getDouble(2))).toList
    } finally c.close()
  }

  test("v2 write upserts and reports committed rows through the protocol") {
    Class.forName(driver)
    val c = java.sql.DriverManager.getConnection(url)
    c.createStatement().execute(
      "CREATE TABLE v2accounts (id BIGINT PRIMARY KEY, balance DOUBLE)")
    c.close()

    // column order deliberately (balance, id): the writer reorders to
    // the sink's (keys ++ vals) contract
    writeV2(Seq((10.0, 1L), (5.0, 2L)).toDF("balance", "id"))
    assert(graft.sources.JdbcUpsertProvider.lastCommittedRows === 2L)
    assert(readBack() === List((1L, 10.0), (2L, 5.0)))

    writeV2(Seq((2.5, 1L), (1.0, 3L)).toDF("balance", "id"))
    assert(graft.sources.JdbcUpsertProvider.lastCommittedRows === 2L)
    // id 1 overwritten (default upsert), id 3 inserted, no duplicates
    assert(readBack() === List((1L, 2.5), (2L, 5.0), (3L, 1.0)))
  }

  test("a failing task rolls back — no partial rows survive the abort") {
    val before = readBack()
    val boom = udf((id: Long) => {
      if (id == 99L) throw new RuntimeException("boom"); id
    })
    // single partition: rows 7 and 8 are written on the same open
    // transaction before 99 throws; abort() must roll them back
    val df = Seq((7.0, 7L), (8.0, 8L), (99.0, 99L)).toDF("balance", "id")
      .repartition(1).withColumn("id", boom(col("id")))
    intercept[Exception] { writeV2(df) }
    assert(readBack() === before,
      "aborted task leaked partially-written rows")
  }
}

/** grouped_ols2 sanity: coefficients reproduce group means (the
  * normal equations' first row: sy = b0·n + b1·s1 + b2·s2).
  */
class GroupedOlsSpec extends SparkTestBase {

  test("fitted plane passes through each group's mean point") {
    val rows = SparkEntry.queries("grouped_ols2")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val li = GraftSession.table(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("x1"))
    val o = GraftSession.table(spark, sfDir, "orders")
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority").as("pri"),
        floor(col("o_totalprice") * 100).cast("long").as("y"),
        expr("unix_seconds(CAST(o_orderdate AS TIMESTAMP)) div 604800").as("x2"),
        col("x1"))
      .groupBy("pri")
      .agg(avg("y").as("my"), avg("x1").as("m1"), avg("x2").as("m2"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    rows.foreach { r =>
      val pri = r.getString(r.fieldIndex("pri"))
      val (my, m1, m2) = o(pri)
      val fit = r.getDouble(r.fieldIndex("b0")) +
        r.getDouble(r.fieldIndex("b1")) * m1 +
        r.getDouble(r.fieldIndex("b2")) * m2
      assert(math.abs(fit - my) / math.abs(my) < 1e-9,
        s"group $pri: plane at mean = $fit, mean y = $my")
    }
  }
}
