package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** Point-in-time join queries over the `events` stream table, oracled by
  * DuckDB's native `ASOF JOIN` — the one engine-to-engine check where the
  * oracle implements the operator natively rather than replaying the plan.
  *
  * Determinism: DuckDB leaves the winner among right rows sharing
  * (key, time) unspecified, so the oracle dedups the right side to the
  * greatest event_id per (user, ts) with QUALIFY; the engine expresses the
  * same contract through [[AsofJoin]]'s `tieBreak` without the extra
  * dedup shuffle. All aggregates are integer (cents / µs) — order-free. */
object AsofQueries {

  /** Click→purchase attribution, backward as-of: every purchase matched to
    * the latest at-or-before click by the same user; per-user counters for
    * attribution coverage, attributed revenue (cents), a 1-hour-window
    * count, and the worst gap. */
  private def attrib(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "value", "event_id")
    val joined = AsofJoin.backward(purchases, clicks,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      rightPayload = Seq("value"), tieBreak = Some("event_id"))
    // events ts is TIMESTAMP_NTZ; the session-UTC cast makes unix_micros
    // read the wall clock — the same value DuckDB's epoch_us(ts) sees.
    val gap = unix_micros(col("ts").cast("timestamp")) -
      unix_micros(col("r_ts").cast("timestamp"))
    joined.groupBy("user_id").agg(
      count(lit(1)).as("n_purchases"),
      count(col("r_ts")).as("n_attributed"),
      sum(when(col("r_ts").isNotNull,
        round(col("value") * 100).cast("long")).otherwise(0L))
        .as("attributed_cents"),
      sum(when(col("r_ts").isNotNull && gap <= 3600L * 1000000, 1L)
        .otherwise(0L)).as("n_within_1h"),
      max(gap).as("max_gap_us"))
  }

  /** Click→next-purchase conversion lag, forward as-of: every click matched
    * to the earliest at-or-after purchase by the same user. */
  private def nextConv(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id")
    val joined = AsofJoin.forward(clicks, purchases,
      keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      rightPayload = Seq("ts"), tieBreak = Some("event_id"))
    joined.groupBy("user_id").agg(
      count(lit(1)).as("n_clicks"),
      count(col("r_ts")).as("n_converted"),
      sum(when(col("r_ts").isNotNull,
        unix_micros(col("r_ts").cast("timestamp")) -
          unix_micros(col("ts").cast("timestamp"))).otherwise(0L))
        .as("sum_lag_us"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_asof_attrib" -> (attrib _),
    "events_asof_next" -> (nextConv _))

  def oracle: Map[String, String] = Map(
    "events_asof_attrib" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |                             ORDER BY event_id DESC) = 1
        |), purchases AS (
        |  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
        |)
        |SELECT p.user_id,
        |       count(*)::BIGINT AS n_purchases,
        |       count(c.ts)::BIGINT AS n_attributed,
        |       sum(CASE WHEN c.ts IS NOT NULL
        |                THEN CAST(round(p.value * 100) AS BIGINT)
        |                ELSE 0 END)::BIGINT AS attributed_cents,
        |       sum(CASE WHEN c.ts IS NOT NULL
        |                 AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
        |                THEN 1 ELSE 0 END)::BIGINT AS n_within_1h,
        |       max(epoch_us(p.ts) - epoch_us(c.ts))::BIGINT AS max_gap_us
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |GROUP BY 1""".stripMargin,
    "events_asof_next" ->
      """WITH purchases AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |                             ORDER BY event_id DESC) = 1
        |), clicks AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'click'
        |)
        |SELECT c.user_id,
        |       count(*)::BIGINT AS n_clicks,
        |       count(p.ts)::BIGINT AS n_converted,
        |       sum(CASE WHEN p.ts IS NOT NULL
        |                THEN epoch_us(p.ts) - epoch_us(c.ts)
        |                ELSE 0 END)::BIGINT AS sum_lag_us
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts <= p.ts
        |GROUP BY 1""".stripMargin)
}
