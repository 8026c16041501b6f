package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Late-data ACCOUNTING under the watermark (D-surface
  * observability): a production watermark pipeline is operated on
  * `numRowsDroppedByWatermark` — silent late-row loss with no metric
  * is an incident, a metric with no loss is a healthy pipeline. This
  * spec drives a windowed aggregation through controlled
  * micro-batches and pins BOTH directions: an on-time stream reports
  * zero drops, and a row arriving behind the advanced watermark is
  * (a) excluded from results and (b) counted in the state operator's
  * drop metric.
  */
class WatermarkDropSpec extends SparkTestBase {
  import spark.implicits._

  test("late row behind the watermark is dropped AND accounted") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp)]
    val agg = ms.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "60 seconds"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val name = s"graft_stream_wmdrop_${System.nanoTime()}"
    val q = agg.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(name).start()

    def ts(s: Long) = new Timestamp(s * 1000)
    ms.addData((1L, ts(100)), (2L, ts(110)))   // watermark -> 110-10 = 100
    q.processAllAvailable()
    val dropsOnTime = q.lastProgress.stateOperators.map(_.numRowsDroppedByWatermark).sum
    assert(dropsOnTime === 0L, s"on-time batch reported drops: $dropsOnTime")

    ms.addData((1L, ts(300)))                  // watermark -> 290
    q.processAllAvailable()
    ms.addData((3L, ts(50)))                   // 50 < 290: LATE
    q.processAllAvailable()
    val dropsLate = q.lastProgress.stateOperators.map(_.numRowsDroppedByWatermark).sum
    q.stop()

    assert(dropsLate === 1L, s"late row not accounted: $dropsLate")
    // and the late row never reached the result table
    val users = spark.table(name).select(col("user_id")).as[Long].collect().toSet
    spark.catalog.dropTempView(name)
    assert(!users.contains(3L), s"late row leaked into results: $users")
  }
}
