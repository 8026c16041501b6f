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

    // speculative-task image: the fence row for key 1's deterministic
    // bucket is already committed — the partition must skip. The
    // bucket is whatever partition batch 8 (same single key) fenced:
    // key-hash bucketing makes it identical across batches.
    val c2 = java.sql.DriverManager.getConnection(url)
    val rs2 = c2.createStatement().executeQuery(
      "SELECT partition_id FROM fence WHERE batch_id = 8")
    assert(rs2.next()); val keyOneBucket = rs2.getInt(1); rs2.close()
    c2.createStatement().execute(
      s"INSERT INTO fence VALUES ('fenced_accounts', 9, $keyOneBucket)")
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

  test("replay with DIFFERENT upstream partitioning does not double-apply") {
    Class.forName(driver)
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE fenced_repart (id BIGINT PRIMARY KEY, balance DOUBLE)")
    conn.createStatement().execute(
      """CREATE TABLE fence_rp (sink_table VARCHAR(128) NOT NULL,
        |  batch_id BIGINT NOT NULL, partition_id INTEGER NOT NULL,
        |  PRIMARY KEY (sink_table, batch_id, partition_id))""".stripMargin)
    conn.close()

    val sink = new JdbcUpsertSink(
      url = url, driver = driver, table = "fenced_repart",
      keyCols = Seq("id"), valCols = Seq("balance"),
      updateExprs = Map("balance" -> "fenced_repart.balance + excluded.balance"),
      batchSize = 2, dialect = "derby", fenceTable = Some("fence_rp"),
      fenceBuckets = 4)

    def bal(): Map[Long, Double] = {
      val c = java.sql.DriverManager.getConnection(url)
      val rs = c.createStatement().executeQuery("SELECT id, balance FROM fenced_repart")
      val got = Iterator.continually(rs).takeWhile(_.next())
        .map(r => r.getLong(1) -> r.getDouble(2)).toMap
      c.close(); got
    }

    val rows = (1L to 20L).map(i => (i, i.toDouble))
    val expect = rows.toMap
    // original attempt arrives as ONE upstream partition (only
    // partition 0 would fence under naive upstream-partition fencing)
    sink.writeBatch(rows.toDF("id", "balance").coalesce(1), batchId = 1L)
    assert(bal() === expect)
    // driver-restart replay of the SAME batchId arrives re-planned
    // into 7 upstream partitions — the naive fence would double-apply
    // every row outside original partition 0; key-hash bucketing
    // inside the sink makes both attempts partition identically
    sink.writeBatch(rows.toDF("id", "balance").repartition(7), batchId = 1L)
    assert(bal() === expect,
      "replay with different upstream partitioning double-applied rows")

    // fenced mode refuses a missing/default batchId instead of
    // silently no-opping every later batch
    val err = intercept[IllegalArgumentException] {
      sink.writeBatch(rows.toDF("id", "balance"))
    }
    assert(err.getMessage.contains("explicit batchId"))
  }
}
