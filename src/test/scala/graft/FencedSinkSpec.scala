package graft

import graft.sinks.JdbcUpsertSink

/** Epoch-fenced JDBC upsert (exactly-once under replay): an
  * accumulating upsert is not idempotent, and foreachBatch is
  * at-least-once — the fence must make (a) a full micro-batch replay
  * under the same batchId and (b) a pre-committed partition (the
  * speculative-task image) both no-ops, while a NEW batchId applies.
  */
class FencedSinkSpec extends SparkTestBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftfencedb;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def balances(): Map[Long, Double] = {
    val c = java.sql.DriverManager.getConnection(url)
    val rs = c.createStatement().executeQuery("SELECT id, balance FROM fenced_accounts")
    val got = Iterator.continually(rs).takeWhile(_.next())
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    c.close(); got
  }

  test("same-batchId replay and pre-fenced partitions are no-ops; new batch applies") {
    Class.forName(driver)
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE fenced_accounts (id BIGINT PRIMARY KEY, balance DOUBLE)")
    conn.createStatement().execute(
      """CREATE TABLE fence (sink_table VARCHAR(128) NOT NULL,
        |  batch_id BIGINT NOT NULL, partition_id INTEGER NOT NULL,
        |  PRIMARY KEY (sink_table, batch_id, partition_id))""".stripMargin)
    conn.close()

    val sink = new JdbcUpsertSink(
      url = url, driver = driver, table = "fenced_accounts",
      keyCols = Seq("id"), valCols = Seq("balance"),
      updateExprs = Map("balance" -> "fenced_accounts.balance + excluded.balance"),
      batchSize = 2, dialect = "derby", fenceTable = Some("fence"))

    val batch7 = Seq((1L, 10.0), (2L, 5.0)).toDF("id", "balance").coalesce(1)
    sink.writeBatch(batch7, batchId = 7L)
    assert(balances() === Map(1L -> 10.0, 2L -> 5.0))

    // driver-failure replay: same data, same batchId — must not double
    sink.writeBatch(batch7, batchId = 7L)
    assert(balances() === Map(1L -> 10.0, 2L -> 5.0),
      "replayed micro-batch double-applied despite the fence")

    // a NEW batchId accumulates as normal
    sink.writeBatch(Seq((1L, 2.5)).toDF("id", "balance").coalesce(1), batchId = 8L)
    assert(balances() === Map(1L -> 12.5, 2L -> 5.0))

    // speculative-task image: the fence row for (batch 9, partition 0)
    // is already committed — the partition must skip silently
    val c2 = java.sql.DriverManager.getConnection(url)
    c2.createStatement().execute(
      "INSERT INTO fence VALUES ('fenced_accounts', 9, 0)")
    c2.close()
    sink.writeBatch(Seq((1L, 100.0)).toDF("id", "balance").coalesce(1), batchId = 9L)
    assert(balances() === Map(1L -> 12.5, 2L -> 5.0),
      "pre-fenced partition applied its rows anyway")

    // and an UNFENCED sink on the same table really does double-apply —
    // the hazard the fence exists for (guards the spec against a
    // silently-idempotent test setup)
    val unfenced = new JdbcUpsertSink(
      url = url, driver = driver, table = "fenced_accounts",
      keyCols = Seq("id"), valCols = Seq("balance"),
      updateExprs = Map("balance" -> "fenced_accounts.balance + excluded.balance"),
      batchSize = 2, dialect = "derby")
    unfenced.writeBatch(Seq((2L, 1.0)).toDF("id", "balance").coalesce(1), batchId = 10L)
    unfenced.writeBatch(Seq((2L, 1.0)).toDF("id", "balance").coalesce(1), batchId = 10L)
    assert(balances()(2L) === 7.0, "unfenced control should have double-applied")
  }
}
