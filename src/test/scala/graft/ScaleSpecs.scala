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
