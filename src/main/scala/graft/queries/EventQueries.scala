package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation over the `events` stream table — the
  * batch twin of StreamingIngest.windowedCounts (same `window()` semantics
  * Structured Streaming uses), with a DuckDB oracle. The value sum runs on
  * a fixed-point (×10⁴) BIGINT representation on BOTH engines so summation
  * order cannot move the result across a rounding boundary (round-after-
  * float-sum is not order-insensitive, ADVICE round-1). */
object EventQueries {

  private def windowed(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 10000).cast("long")) / 10000.0).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("sum_value"))

  /** Session windows (30-min inactivity gap) per user. Spark merges an
    * event into a session iff ts < prev_ts + gap (strict); the DuckDB
    * gaps-and-islands oracle breaks on ts >= prev + gap to match. */
  private def sessions(s: SparkSession, dir: String): DataFrame = {
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    Tables(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        date_format(col("w.start"), fmt).as("session_start"),
        date_format(col("w.end"), fmt).as("session_end"),
        col("n_events"))
  }

  /** Sliding windows (6 h span, 2 h slide): every event lands in 3
    * overlapping windows. The oracle replays Spark's epoch-aligned window
    * assignment with integer µs arithmetic (floor to the slide, back off
    * k slides). */
  private def sliding(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy(window(col("ts"), "6 hours", "2 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 10000).cast("long")) / 10000.0).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_windowed" -> (windowed _),
    "events_sliding" -> (sliding _),
    "events_sessions" -> (sessions _))

  def oracle: Map[String, String] = Map(
    "events_windowed" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |       event_type, count(*) AS n,
        |       sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0 AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "events_sliding" ->
      """WITH e AS (SELECT event_type, value, epoch_us(ts) AS us FROM events),
        |w AS (SELECT event_type, value,
        |        make_timestamp((us // 7200000000) * 7200000000 - k.k * 7200000000) AS ws
        |      FROM e, (SELECT unnest(generate_series(0, 2)) AS k) k)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M') AS win_start, event_type,
        |       count(*) AS n,
        |       sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0 AS sum_value
        |FROM w GROUP BY 1, 2""".stripMargin,
    "events_sessions" ->
      """WITH o AS (SELECT user_id, ts,
        |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |           FROM events),
        |m AS (SELECT user_id, ts,
        |        CASE WHEN prev IS NULL OR ts >= prev + INTERVAL 30 MINUTE
        |             THEN 1 ELSE 0 END AS brk
        |      FROM o),
        |s AS (SELECT user_id, ts,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM m)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
        |       count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin)
}
