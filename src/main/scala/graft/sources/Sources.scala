package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Stream/batch source builders (SURVEY.md §2 A3, D6).
  *
  * The reference consumes a Kafka topic of raw JSON strings
  * (TripAggregatorApplication.kt:188-192). Spark-native equivalents:
  * the built-in kafka source behind the same raw-string contract,
  * plus file/rate sources for replay and testing. All return a
  * DataFrame with the downstream-agnostic shape the parser expects.
  */
object Sources {

  /** Kafka topic → raw string stream (requires the
    * spark-sql-kafka connector on the classpath at runtime; config
    * plumbing only — this environment has no broker).
    */
  def kafkaStream(spark: SparkSession, bootstrapServers: String,
      topic: String, startingOffsets: String = "latest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .selectExpr("CAST(value AS STRING) AS raw", "timestamp AS kafka_ts")

  /** Directory of files replayed as a stream (schema required for
    * streaming reads). `maxFilesPerTrigger` bounds batch size.
    */
  def fileStream(spark: SparkSession, path: String, schema: StructType,
      format: String = "parquet", maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .format(format)
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(path)

  /** Synthetic rate source (load/soak testing). */
  def rateStream(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()

  /** Batch JSON-lines file of raw strings (replay path). */
  def rawJsonBatch(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).withColumnRenamed("value", "raw")

  /** Fully-qualified RocksDB state-store provider (ships inside
    * spark-sql; rocksdbjni is on the Spark classpath).
    */
  val RocksDBProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"

  /** Switch streaming state to the RocksDB state store — the 100 TB
    * posture: the default HDFSBackedStateStoreProvider keeps every
    * key in executor heap (state size is bounded by memory and GC
    * churn scales with it), while RocksDB spills to local disk with
    * changelog checkpointing, so keyed session/dedup state can grow
    * to disk size. Returns the previous provider so callers (tests)
    * can restore it. Read by each STREAMING QUERY at start, so set it
    * before `.start()`.
    */
  def useRocksDBStateStore(spark: SparkSession): Option[String] = {
    val prev = spark.conf.getOption(ProviderConf)
    spark.conf.set(ProviderConf, RocksDBProvider)
    prev
  }

  /** Restore a provider captured by [[useRocksDBStateStore]]. */
  def restoreStateStore(spark: SparkSession, prev: Option[String]): Unit =
    prev match {
      case Some(p) => spark.conf.set(ProviderConf, p)
      case None => spark.conf.unset(ProviderConf)
    }
}
