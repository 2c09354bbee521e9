package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.streaming.EventStreams

/** Batch-equivalent faces of the streaming operators (SURVEY.md §2.C).
  * The streaming specs drive the same code through MemoryStream; these
  * Qdefs run it in batch on the events table so the driver can oracle the
  * semantics with plain SQL.
  */
object Streaming {

  // ---- C2: tumbling window agg (streaming shape, batch execution) -------
  private val q40 = Qdef(
    "q40_stream_tumbling",
    (s, dir) =>
      EventStreams.tumbling(t(s, dir, "events"))
        .orderBy(col("window_start"), col("event_type")),
    Some("""SELECT DATE_TRUNC('hour', ts) AS window_start,
      DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR AS window_end,
      event_type, COUNT(*) AS n,
      SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS sum_value
    FROM events GROUP BY 1, 2, 3 ORDER BY window_start, event_type"""))

  // ---- C3: gap sessionization (same fold the stream runs) ---------------
  private val q41 = Qdef(
    "q41_sessionize",
    (s, dir) =>
      EventStreams.sessionizeBatch(t(s, dir, "events"))
        .toDF()
        .orderBy(col("user_id"), col("session_start")),
    Some("""WITH brk AS (
      SELECT user_id, ts, value,
        CASE WHEN ts - lag(ts) OVER w > INTERVAL '30 minutes'
             THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts, value,
        SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
          ROWS UNBOUNDED PRECEDING) AS session_id
      FROM brk)
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
      COUNT(*) AS n_events,
      SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0 AS sum_value
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, session_start"""))

  // ---- C2b: sliding window (1h window, 15min hop) ------------------------
  // Each event lands in 4 overlapping windows; the DuckDB oracle explodes
  // the 4 hops per event explicitly.
  private val q51 = Qdef(
    "q51_stream_sliding",
    (s, dir) =>
      EventStreams.sliding(t(s, dir, "events"))
        .orderBy(col("window_start"), col("event_type")),
    Some("""SELECT time_bucket(INTERVAL '15 minutes', ts)
        - k.k * INTERVAL '15 minutes' AS window_start,
      event_type, COUNT(*) AS n
    FROM events, (SELECT UNNEST(range(0, 4)) AS k) k
    GROUP BY 1, 2 ORDER BY window_start, event_type"""))

  val all: Seq[Qdef] = Seq(q40, q41, q51)
}
