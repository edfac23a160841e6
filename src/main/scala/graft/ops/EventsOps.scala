package graft.ops

import graft.{Num, Q, Tables}
import org.apache.spark.sql.functions._

/** Event-stream analytics over `events(event_id, ts, user_id,
  * event_type, value, props)` — the streaming operator family
  * (tumbling / sliding / session windows, watermark-style late-data
  * handling, stateful dedup) expressed as *batch* plans so the driver's
  * DuckDB oracle can check them (SURVEY.md §2B Streaming row). The
  * true Structured Streaming surface lives in
  * [[graft.streaming.StreamingDemo]] and is exercised by
  * StreamingSpec with a MemoryStream source; the window semantics
  * here are identical (same epoch-aligned bucketing).
  *
  * Window starts are emitted as epoch *seconds* (BIGINT) — engine
  * timestamp types diverge in precision (ns vs µs) but integers
  * cannot. */
object EventsOps {

  /** Tumbling 5-minute windows per event type. Spark's `window()` is
    * epoch-aligned, so `floor(epoch/300)*300` is the same bucketing the
    * streaming engine would produce. */
  val qEventsTumbling = Q(
    (s, d) =>
      Tables.events(s, d)
        .groupBy(
          window(col("ts"), "5 minutes").getField("start").cast("long").as("bucket_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("total_value"))
        .orderBy(col("bucket_start"), col("event_type")),
    s"""SELECT CAST(FLOOR(EPOCH(ts) / 300) * 300 AS BIGINT) AS bucket_start,
       event_type, COUNT(*) AS n, ${Num.sqlSum("value")} AS total_value
       FROM events GROUP BY 1, 2 ORDER BY bucket_start, event_type""")

  /** Sliding windows: 10-minute window, 5-minute slide — every event
    * lands in exactly two windows. The oracle replays the expansion as
    * a UNION ALL of the two aligned starts. */
  val qEventsSliding = Q(
    (s, d) =>
      Tables.events(s, d)
        .groupBy(
          window(col("ts"), "10 minutes", "5 minutes").getField("start")
            .cast("long").as("win_start"))
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("total_value"))
        .orderBy(col("win_start")),
    s"""SELECT win_start, COUNT(*) AS n, ${Num.sqlSum("value")} AS total_value
       FROM (
         SELECT CAST(FLOOR(EPOCH(ts) / 300) * 300 AS BIGINT) AS win_start, value FROM events
         UNION ALL
         SELECT CAST(FLOOR(EPOCH(ts) / 300) * 300 - 300 AS BIGINT) AS win_start, value FROM events
       ) t GROUP BY win_start ORDER BY win_start""")

  /** Session windows (10-minute inactivity gap) per user —
    * `session_window` in Spark; the classic gaps-and-islands rewrite in
    * the oracle (new session when the gap from the previous event is
    * ≥ the timeout; session end = last event + gap). */
  val qEventsSession = Q(
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n_events"), Num.dsum(col("value")).as("session_value"))
        .select(
          col("user_id"),
          col("session_window").getField("start").cast("long").as("session_start"),
          col("session_window").getField("end").cast("long").as("session_end"),
          col("n_events"), col("session_value"))
        .orderBy(col("user_id"), col("session_start")),
    s"""WITH marked AS (
         SELECT user_id, ts, value,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     >= INTERVAL 10 MINUTE OR
                LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
           THEN 1 ELSE 0 END AS is_new
         FROM events),
       sess AS (
         SELECT user_id, ts, value,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         FROM marked)
       SELECT user_id,
         CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS session_start,
         CAST(FLOOR(EPOCH(MAX(ts))) + 600 AS BIGINT) AS session_end,
         COUNT(*) AS n_events, ${Num.sqlSum("value")} AS session_value
       FROM sess GROUP BY user_id, session_id
       ORDER BY user_id, session_start""")

  /** Watermark-style late-data drop, batch analog: with a watermark of
    * (global max event time − 1 day), late events are excluded before
    * aggregation — the same filter a streaming sink would have applied
    * on arrival. */
  val qEventsLateFilter = Q(
    (s, d) => {
      val ev = Tables.events(s, d)
      val cutoff = ev.agg((max(col("ts").cast("long")) - lit(86400L)).as("cut"))
      ev.crossJoin(broadcast(cutoff))
        .filter(col("ts").cast("long") >= col("cut"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("total_value"))
        .orderBy(col("event_type"))
    },
    s"""SELECT event_type, COUNT(*) AS n, ${Num.sqlSum("value")} AS total_value
       FROM events
       WHERE CAST(FLOOR(EPOCH(ts)) AS BIGINT) >=
             (SELECT CAST(FLOOR(EPOCH(MAX(ts))) AS BIGINT) - 86400 FROM events)
       GROUP BY event_type ORDER BY event_type""")

  /** Stateful-dedup analog (`dropDuplicatesWithinWatermark` shape):
    * first event per (user, type), with the duplicate count that a
    * streaming state store would have suppressed. */
  val qEventsDedupState = Q(
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(
          min(col("ts")).cast("long").as("first_seen"),
          (count(lit(1)) - 1).as("n_suppressed"))
        .orderBy(col("user_id"), col("event_type")),
    """SELECT user_id, event_type,
       CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS first_seen,
       COUNT(*) - 1 AS n_suppressed
       FROM events GROUP BY user_id, event_type
       ORDER BY user_id, event_type""")

  val defs: Map[String, Q] = Map(
    "q_events_tumbling" -> qEventsTumbling,
    "q_events_sliding" -> qEventsSliding,
    "q_events_session" -> qEventsSession,
    "q_events_late_filter" -> qEventsLateFilter,
    "q_events_dedup_state" -> qEventsDedupState)
}
