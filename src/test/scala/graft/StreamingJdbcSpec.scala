package graft

import graft.sinks.JdbcUpsertSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The reference's ACTUAL end-to-end shape — a STREAM feeding the
  * batched JDBC upsert sink (TripAggregatorApplication.kt wires the
  * Kafka stream into JDBCOutputFormat) — driven here as Structured
  * Streaming `foreachBatch` into embedded Derby with the reference's
  * accumulating deposit semantics: multiple micro-batches upsert the
  * same keys and the final table equals the batch aggregate of the
  * whole stream. The batch JdbcSinkSpec pins the sink's SQL; this
  * spec pins the STREAMING wiring (per-batch invocation, cross-batch
  * accumulation, no lost or doubled batch).
  */
class StreamingJdbcSpec extends SparkTestBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftstreamdb;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  test("stream -> foreachBatch -> JDBC upsert accumulates across micro-batches") {
    Class.forName(driver)
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE stream_balances (id BIGINT PRIMARY KEY, balance DOUBLE)")
    conn.close()

    val sink = new JdbcUpsertSink(
      url = url, driver = driver, table = "stream_balances",
      keyCols = Seq("id"), valCols = Seq("balance"),
      updateExprs = Map(
        "balance" -> "stream_balances.balance + excluded.balance"),
      batchSize = 2, dialect = "derby")

    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Double)]
    val q = ms.toDF().toDF("id", "balance")
      // pre-aggregate within the batch so the upsert sees one row per
      // key per micro-batch (the reference's keyed-window shape)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        sink.writeBatch(
          df.groupBy(col("id")).agg(sum(col("balance")).as("balance")),
          batchId)
      }
      .start()

    ms.addData((1L, 10.0), (2L, 5.0), (1L, 1.0)) // batch 0: id1=11, id2=5
    q.processAllAvailable()
    ms.addData((1L, 2.5), (3L, 7.0))             // batch 1: id1+=2.5, id3=7
    q.processAllAvailable()
    ms.addData((2L, -5.0))                       // batch 2: id2+=-5
    q.processAllAvailable()
    q.stop()

    val c2 = java.sql.DriverManager.getConnection(url)
    val rs = c2.createStatement().executeQuery(
      "SELECT id, balance FROM stream_balances ORDER BY id")
    val got = Iterator.continually(rs)
      .takeWhile(_.next()).map(r => (r.getLong(1), r.getDouble(2))).toList
    c2.close()
    assert(got === List((1L, 13.5), (2L, 0.0), (3L, 7.0)),
      s"stream image diverged from the batch aggregate: $got")
  }
}
