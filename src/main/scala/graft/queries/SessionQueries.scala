package graft.queries

import graft.GraftSession.table
import graft.functions.GeoFunctions
import graft.operators.{Sessionize, TripAggregator}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sessionization + trip-aggregation queries (SURVEY.md §2 A5-A8,
  * A11) — the batch re-expression of the reference's keyed
  * inactivity-window trip pipeline, run over the `events` table
  * (user_id ≈ trip id, value ≈ telemetry reading).
  *
  * GPS/speed analogs are derived deterministically from `value` so
  * the DuckDB oracle computes on identical inputs:
  *   lat = value/10 - 20, lon = value/2 - 120, speed = value % 20.
  *
  * All time math is on whole unix seconds (`tsec`): the parquet `ts`
  * is nanosecond-precision, which Spark truncates to micros and
  * DuckDB keeps as ns — second-floor + event_id tie-break gives both
  * engines an identical total order.
  */
object SessionQueries {

  private val GapSeconds = 1800L

  /** events + tsec/lat/lon/speed derivations (ts is epoch-nanos
    * bigint — see GraftSession.table).
    */
  private def enriched(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events").select(
      col("event_id"), col("user_id"), col("event_type"), col("value"),
      expr("ts div 1000000000").as("tsec"),
      (col("value") / 10.0 - 20.0).as("lat"),
      (col("value") / 2.0 - 120.0).as("lon"),
      (col("value") % 20.0).as("speed"))

  private val enrichedSql =
    """SELECT event_id, user_id, event_type, value,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
      |  (value / 10.0 - 20.0) AS lat,
      |  (value / 2.0 - 120.0) AS lon,
      |  (value % 20.0) AS speed
      |FROM events""".stripMargin

  private def sessions(s: SparkSession, dir: String): DataFrame =
    Sessionize.withSessionId(
      enriched(s, dir), col("user_id"), col("tsec"), GapSeconds,
      Seq(col("tsec"), col("event_id")))
      .groupBy(col("user_id"), col("session_seq").cast("bigint").as("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("tsec")).as("start_s"),
        max(col("tsec")).as("end_s"),
        (max(col("tsec")) - min(col("tsec"))).as("duration_s"),
        round(sum(col("value")), 2).as("sum_value"))

  private val sessionsSql =
    s"""WITH e AS ($enrichedSql),
       |lagged AS (
       |  SELECT user_id, event_id, tsec, value,
       |    CASE WHEN lag(tsec) OVER w IS NULL
       |              OR tsec - lag(tsec) OVER w > $GapSeconds
       |         THEN 1 ELSE 0 END AS is_new
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)
       |),
       |sess AS (
       |  SELECT user_id, tsec, value,
       |    CAST(sum(is_new) OVER (
       |      PARTITION BY user_id ORDER BY tsec, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
       |  FROM lagged
       |)
       |SELECT user_id, session_seq,
       |  count(*) AS n_events,
       |  min(tsec) AS start_s,
       |  max(tsec) AS end_s,
       |  max(tsec) - min(tsec) AS duration_s,
       |  round(sum(value), 2) AS sum_value
       |FROM sess GROUP BY user_id, session_seq""".stripMargin

  val all: Seq[Q] = Seq(

    // A5: inactivity-gap sessionization, one row per session.
    Q("sessionize_events", sessionsSql)((s, dir) => sessions(s, dir)),

    // A5 follow-on: per-key session statistics.
    Q("session_agg_stats",
      s"""WITH s AS ($sessionsSql)
         |SELECT user_id,
         |  count(*) AS n_sessions,
         |  round(avg(duration_s), 4) AS avg_duration_s,
         |  max(n_events) AS max_session_events,
         |  round(avg(n_events), 4) AS avg_session_events
         |FROM s GROUP BY user_id""".stripMargin) { (s, dir) =>
      sessions(s, dir)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_sessions"),
          round(avg(col("duration_s")), 4).as("avg_duration_s"),
          max(col("n_events")).as("max_session_events"),
          round(avg(col("n_events")), 4).as("avg_session_events"))
    },

    // A6-A8: the reference's TripAggregation (distance via haversine,
    // total/stopped/moving durations) per key.
    Q("trip_aggregation",
      s"""WITH e AS ($enrichedSql),
         |lagged AS (
         |  SELECT user_id, tsec, lat, lon, speed,
         |    lag(tsec)  OVER w AS ptsec,
         |    lag(lat)   OVER w AS plat,
         |    lag(lon)   OVER w AS plon,
         |    lag(speed) OVER w AS pspeed
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)
         |),
         |legs AS (
         |  SELECT user_id, tsec,
         |    CASE WHEN plat IS NULL THEN 0.0
         |         ELSE ${GeoFunctions.haversineKmSql("plat", "plon", "lat", "lon")}
         |    END AS leg_km,
         |    CASE WHEN pspeed IS NOT NULL AND speed < 5.0 AND pspeed < 5.0
         |         THEN tsec - ptsec ELSE 0 END AS stopped_delta_s
         |  FROM lagged
         |)
         |SELECT user_id AS trip_key,
         |  count(*) AS n_events,
         |  max(tsec) - min(tsec) AS total_s,
         |  CAST(sum(stopped_delta_s) AS BIGINT) AS stopped_s,
         |  round(sum(leg_km), 3) AS distance_km,
         |  max(tsec) - min(tsec) - CAST(sum(stopped_delta_s) AS BIGINT) AS moving_s
         |FROM legs GROUP BY user_id""".stripMargin) { (s, dir) =>
      TripAggregator
        .aggregate(
          enriched(s, dir),
          key = col("user_id"), tsec = col("tsec"),
          lat = col("lat"), lon = col("lon"), speedKmh = col("speed"),
          lowSpeedThreshold = 5.0,
          orderCols = Seq(col("tsec"), col("event_id")))
        .select(
          col("trip_key"), col("n_events"), col("total_s"), col("stopped_s"),
          round(col("distance_km"), 3).as("distance_km"), col("moving_s"))
    },

    // A11: the reference's BankAccountDeposit ON-CONFLICT upsert as a
    // batch keyed aggregate (balance accumulation + flag OR).
    Q("deposit_balances",
      """SELECT user_id AS account_id,
        |  round(sum(value), 2) AS balance,
        |  bool_or(event_type = 'error') AS is_terminator,
        |  count(*) AS n_deposits
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      table(s, dir, "events")
        .groupBy(col("user_id").as("account_id"))
        .agg(
          round(sum(col("value")), 2).as("balance"),
          bool_or(col("event_type") === "error").as("is_terminator"),
          count(lit(1)).as("n_deposits"))
    },

    // B106: EVENT-PATTERN MATCHING over sessions (CEP / MATCH_
    // RECOGNIZE-lite): each session's ordered event-type initials
    // become one small string and regex kernels extract the behavioral
    // signals — conversion paths (click → views → purchase, 'CV*P'),
    // error-before-purchase, longest view streak. Per-session groups
    // are small by construction (the B45 rule), so the collect +
    // in-memory sort is bounded by the session, never the stream;
    // regexp counting is non-overlapping left-to-right in BOTH
    // engines (the text_scrub contract).
    Q("event_pattern_match",
      s"""WITH e AS (
         |  SELECT event_id, user_id, event_type,
         |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec
         |  FROM events),
         |lagged AS (
         |  SELECT user_id, event_id, tsec, event_type,
         |    CASE WHEN lag(tsec) OVER w IS NULL
         |              OR tsec - lag(tsec) OVER w > $GapSeconds
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)),
         |sess AS (
         |  SELECT user_id, event_id, tsec, event_type,
         |    CAST(sum(is_new) OVER (
         |      PARTITION BY user_id ORDER BY tsec, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS session_seq
         |  FROM lagged),
         |sq AS (
         |  SELECT user_id, session_seq,
         |    string_agg(upper(substring(event_type, 1, 1)), ''
         |      ORDER BY tsec, event_id) AS seq
         |  FROM sess GROUP BY 1, 2)
         |SELECT user_id, session_seq,
         |  CAST(len(seq) AS BIGINT) AS seq_len,
         |  CAST(len(regexp_extract_all(seq, 'CV*P')) AS BIGINT) AS n_conv_paths,
         |  CAST(CASE WHEN regexp_matches(seq, 'E.*P') THEN 1 ELSE 0 END AS INT)
         |    AS err_before_purchase,
         |  CAST(coalesce(list_max(list_transform(
         |    regexp_extract_all(seq, 'V+'), x -> len(x))), 0) AS BIGINT)
         |    AS max_view_run
         |FROM sq""".stripMargin) { (s, dir) =>
      val e = table(s, dir, "events").select(
        col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000000000").as("tsec"))
      val sess = Sessionize.withSessionId(
        e, col("user_id"), col("tsec"), GapSeconds,
        Seq(col("tsec"), col("event_id")))
      sess
        .withColumn("ini", upper(substring(col("event_type"), 1, 1)))
        .groupBy(col("user_id"), col("session_seq").cast("bigint").as("session_seq"))
        .agg(collect_list(struct(col("tsec"), col("event_id"), col("ini"))).as("evs"))
        // Loud guard on the bounded-session contract (see
        // graft.functions.Guards): an unbounded power session fails
        // with an actionable message instead of OOMing the task.
        .withColumn("evs",
          graft.functions.Guards.boundedSeries(s, col("evs"), "event_pattern_match"))
        .withColumn("seq",
          array_join(expr("transform(array_sort(evs), x -> x.ini)"), ""))
        .select(col("user_id"), col("session_seq"),
          length(col("seq")).cast("long").as("seq_len"),
          expr("regexp_count(seq, 'CV*P')").cast("long").as("n_conv_paths"),
          when(col("seq").rlike("E.*P"), 1).otherwise(0).cast("int")
            .as("err_before_purchase"),
          coalesce(
            array_max(expr("transform(regexp_extract_all(seq, 'V+', 0), x -> length(x))")),
            lit(0)).cast("long").as("max_view_run"))
    })
}
