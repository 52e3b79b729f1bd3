package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation over the `events` stream table — the
  * batch twin of StreamingIngest.windowedCounts (same `window()` semantics
  * Structured Streaming uses), with a DuckDB oracle. Sum is rounded to 4
  * decimals: double summation order differs across engines. */
object EventQueries {

  private def windowed(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("sum_value"))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_windowed" -> (windowed _))

  def oracle: Map[String, String] = Map(
    "events_windowed" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |       event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin)
}
