package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + test-table loaders.
  *
  * Scale posture: AQE on (runtime re-plan, skew-join splitting,
  * partition coalescing), shuffle partitions sized by env (32 on the
  * local[32] harness; on a real cluster this scales with executor
  * count). All loaders are plain parquet scans so Catalyst pushes
  * filters/projections into the reader.
  */
object GraftSession {

  def build(appName: String = "graft", master: String = "local[*]"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** All driver-generated test tables (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses
      // by default; read it as a bigint of epoch-nanos instead. All
      // event-time logic downstream works on whole epoch seconds
      // (ts DIV 1e9), which also sidesteps ns-vs-us precision skew
      // against external ns-capable readers.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every test table as a temp view for spark.sql use. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
