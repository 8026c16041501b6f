package graft.queries

import graft.GraftSession.table
import graft.streaming.SessionPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming under the correctness gate (SURVEY.md §2 D1,
  * D6): the events parquet replayed as a file stream, session-window
  * aggregated with a watermark, collected through a memory sink —
  * then compared to a batch oracle that states the append-mode
  * emission rule explicitly (a session is emitted iff
  * last_event + gap < final_watermark = max_event − delay).
  *
  * All event times are floored to whole seconds BEFORE streaming so
  * the emission boundary is integer-exact in both engines.
  */
object StreamingQueries {

  private val GapS = 1800L
  private val DelayS = 3600L

  val all: Seq[Q] = Seq(

    Q("streaming_sessionize",
      s"""WITH e AS (
         |  SELECT user_id, event_id, value,
         |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec
         |  FROM events),
         |lagged AS (
         |  SELECT user_id, event_id, tsec, value,
         |    CASE WHEN lag(tsec) OVER w IS NULL OR tsec - lag(tsec) OVER w > $GapS
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)),
         |sess AS (
         |  SELECT user_id, tsec, value,
         |    CAST(sum(is_new) OVER (
         |      PARTITION BY user_id ORDER BY tsec, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
         |  FROM lagged),
         |agg AS (
         |  SELECT user_id,
         |    min(tsec) AS start_s,
         |    max(tsec) + $GapS AS end_s,
         |    count(*) AS n_events,
         |    round(sum(value), 2) AS sum_value
         |  FROM sess GROUP BY user_id, session_seq),
         |wm AS (SELECT max(tsec) - $DelayS AS final_watermark FROM e)
         |SELECT user_id, start_s, end_s, n_events, sum_value
         |FROM agg, wm WHERE end_s < final_watermark""".stripMargin) { (s, dir) =>
      runSessionStream(s, dir)
    },

    Q("streaming_stateful_sessionize", statefulOracle) { (s, dir) =>
      runStatefulStream(s, dir)
    })

  // D2 under the gate: the custom flatMapGroupsWithState sessionizer
  // (event-time timeout — the deterministic form of the reference's
  // inactivity trigger). Emission rule in the oracle: every non-final
  // session of a key, plus final sessions whose (last + gap) is below
  // the final watermark.
  private lazy val statefulOracle =
    s"""WITH e AS (
       |  SELECT user_id, event_id, value,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec
       |  FROM events),
       |lagged AS (
       |  SELECT user_id, event_id, tsec, value,
       |    CASE WHEN lag(tsec) OVER w IS NULL OR tsec - lag(tsec) OVER w > $GapS
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)),
       |sess AS (
       |  SELECT user_id, tsec, value,
       |    CAST(sum(is_new) OVER (
       |      PARTITION BY user_id ORDER BY tsec, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
       |  FROM lagged),
       |agg AS (
       |  SELECT user_id, session_seq,
       |    min(tsec) AS start_s,
       |    max(tsec) + $GapS AS end_s,
       |    count(*) AS n_events,
       |    round(sum(value), 2) AS sum_value,
       |    row_number() OVER (PARTITION BY user_id ORDER BY session_seq DESC) AS rn_desc
       |  FROM sess GROUP BY user_id, session_seq),
       |wm AS (SELECT max(tsec) - $DelayS AS final_watermark FROM e)
       |SELECT user_id, start_s, end_s, n_events, sum_value
       |FROM agg, wm WHERE rn_desc > 1 OR end_s < final_watermark""".stripMargin

  private def runStatefulStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val batchSchema = table(spark, dir, "events").schema
    val raw = spark.readStream
      .schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val events = raw.select(
      col("user_id"), col("event_id"),
      expr("ts div 1000000000").as("tsec"), col("value"))
      .as[SessionPipeline.SessEvent]
    val sessions = SessionPipeline.statefulSessionizeEventTime(events, GapS, DelayS)
      .toDF()
      .withColumn("sum_value", round(col("sum_value"), 2))
    val name = s"graft_stateful_sessions_${System.nanoTime()}"
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Replays events as a real streaming query; returns the memory
    * sink's content. Uses AvailableNow so the run terminates; the
    * final no-data batch advances the watermark and flushes every
    * closed session.
    */
  private def runSessionStream(spark: SparkSession, dir: String): DataFrame = {
    val batchSchema = table(spark, dir, "events").schema
    // file sources stream a DIRECTORY; glob-filter to the events file
    val raw = spark.readStream
      .schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val events = raw.select(
      col("user_id"), col("value"),
      timestamp_seconds(expr("ts div 1000000000")).as("ts"))
    val sessions = events
      .withWatermark("ts", s"$DelayS seconds")
      .groupBy(session_window(col("ts"), s"$GapS seconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("user_id"),
        unix_timestamp(col("session_window.start")).as("start_s"),
        unix_timestamp(col("session_window.end")).as("end_s"),
        col("n_events"), col("sum_value"))
    val name = s"graft_stream_sessions_${System.nanoTime()}"
    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
