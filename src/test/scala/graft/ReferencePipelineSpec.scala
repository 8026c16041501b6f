package graft

import graft.model.TripModel
import graft.sinks.JdbcUpsertSink
import graft.streaming.SessionPipeline
import graft.streaming.SessionPipeline.Reading
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The COMPLETE reference application, re-expressed:
  * raw JSON stream → tolerant parse → keyed inactivity-window
  * incremental trip aggregation → batched JDBC upsert
  * (reference: TripAggregatorApplication.kt main pipeline,
  * lines 188-246). A user of the reference can run this exact
  * topology on graft.
  */
class ReferencePipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def msg(trip: Long, t: String, speed: Double, lat: Double, lon: Double): String =
    s"""{"body":{"tripNumber":$trip,"timestamp":"2020-01-01T00:0$t:00Z","type":"TripData",
       |"pidData":{"VehicleSpeed":$speed,
       |"GpsReading":{"latitude":$lat,"longitude":$lon,"heading":0,
       |"horizontalDilutionOfPrecision":1,"numberOfSatellites":7,
       |"hemisphere":"NorthWest","fixQuality":"Standard"}}}}""".stripMargin.replace("\n", "")

  test("raw json -> parse -> stateful trip aggregation -> jdbc upsert") {
    val url = "jdbc:derby:memory:tripdb;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    Class.forName(driver)
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      """CREATE TABLE trips (trip_key BIGINT PRIMARY KEY, n_events BIGINT,
        |total_s BIGINT, stopped_s BIGINT, distance_km DOUBLE)""".stripMargin.replace("\n", " "))
    conn.close()

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]

    // 1. tolerant JSON parse (reference: JSONUtil.toTrip + filter)
    val parsed = TripModel.parseRaw(input.toDF().withColumnRenamed("value", "raw"), "raw")

    // 2. typed readings keyed by trip
    val readings = parsed.select(
        col("trip_id").as("user_id"),
        unix_timestamp(col("ts")).as("tsec"),
        coalesce(col("lat"), lit(0.0)).as("lat"),
        coalesce(col("lon"), lit(0.0)).as("lon"),
        coalesce(col("speed_kmh"), lit(0.0)).as("speed"),
        lit(0.0).as("value"))
      .as[Reading]

    // 3. incremental keyed aggregation, FIRE_AND_PURGE on inactivity
    val sessions = SessionPipeline.statefulTripAggregate(readings, maxRetentionMs = 500)

    // 4. batched JDBC upsert sink via foreachBatch
    val sink = new JdbcUpsertSink(
      url = url, driver = driver, table = "trips",
      keyCols = Seq("trip_key"),
      valCols = Seq("n_events", "total_s", "stopped_s", "distance_km"),
      dialect = "derby")
    val q = sessions
      .select(
        col("user_id").as("trip_key"), col("n_events"),
        col("total_s"), col("stopped_s"), col("distance_km"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) => sink.writeBatch(df, id) }
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()

    input.addData(
      msg(7, "0", speed = 1.0, lat = 0.0, lon = 0.0),
      msg(7, "1", speed = 2.0, lat = 1.0, lon = 0.0),  // 60 s later, 111.19 km north
      msg(8, "0", speed = 50.0, lat = 10.0, lon = 10.0),
      "corrupted {{{ json")

    // wait for the inactivity timers to fire and the sink to commit
    def rowCount(): Int = {
      val c = java.sql.DriverManager.getConnection(url)
      val rs = c.createStatement().executeQuery("SELECT count(*) FROM trips")
      rs.next(); val n = rs.getInt(1); c.close(); n
    }
    var tries = 0
    while (rowCount() < 2 && tries < 100) { Thread.sleep(200); tries += 1 }
    q.stop()

    val c = java.sql.DriverManager.getConnection(url)
    val rs = c.createStatement().executeQuery(
      "SELECT trip_key, n_events, total_s, stopped_s, distance_km FROM trips ORDER BY trip_key")
    val rows = Iterator.continually(rs).takeWhile(_.next())
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toList
    c.close()
    assert(rows.length == 2, s"got $rows")
    val trip7 = rows.head
    assert(trip7._1 == 7L && trip7._2 == 2L && trip7._3 == 60L)
    assert(trip7._4 == 60L) // both readings < 5 km/h → whole minute stopped
    assert(math.abs(trip7._5 - 111.19) < 0.1)
    assert(rows(1) == ((8L, 1L, 0L, 0L, 0.0)))
  }

  test("deposit messages tolerant-parse like the reference (JSONUtil.kt:16-23)") {
    val raw = Seq(
      """{"id": 7, "amount": 120.5, "timestamp": 1000, "is_terminator": true}""",
      """{"id": 8, "amount": 10.0, "timestamp": 2000}""", // missing flag -> false
      """not json at all""",                              // malformed -> dropped
      """{"amount": 1.0}"""                               // no id -> dropped
    ).toDF("raw")
    val parsed = TripModel.parseDeposits(raw, "raw")
      .as[(Int, Double, Long, Boolean)].collect().toSet
    assert(parsed == Set((7, 120.5, 1000L, true), (8, 10.0, 2000L, false)))
  }

  test("trigger re-arm hysteresis matches ProcessingTimeTrigger.kt:30-42") {
    import SessionPipeline.nextDeadline
    // first element: arm at now + max
    assert(nextDeadline(nowMs = 100, deadlineMs = 0, minRetentionMs = 10,
      maxRetentionMs = 4000) == 4100)
    // element well before the deadline: now + min does not cross -> keep
    assert(nextDeadline(nowMs = 500, deadlineMs = 4100, minRetentionMs = 10,
      maxRetentionMs = 4000) == 4100)
    // element inside the min band: now + min crosses -> re-arm at now + max
    assert(nextDeadline(nowMs = 4095, deadlineMs = 4100, minRetentionMs = 10,
      maxRetentionMs = 4000) == 8095)
  }
}
