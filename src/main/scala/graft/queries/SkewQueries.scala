package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Skew-mitigated join as a driver query: events (heavy-tailed user_id)
  * joined to a per-user dimension through [[Skew.saltedJoin]]. The oracle
  * is the PLAIN join — salting's contract is bit-identical results with a
  * different shuffle layout, so the hash match proves the mechanism
  * changes distribution only. */
object SkewQueries {

  private def saltedJoinQ(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events").select("event_id", "user_id")
    val dim = e.groupBy("user_id").agg(count(lit(1)).as("n_user"))
    Skew.saltedJoin(e, dim, "user_id", salts = 8)
      .select("event_id", "user_id", "n_user")
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_salted_join" -> (saltedJoinQ _))

  def oracle: Map[String, String] = Map(
    "skew_salted_join" ->
      """WITH d AS (SELECT user_id, count(*) AS n_user FROM events GROUP BY 1)
        |SELECT e.event_id, e.user_id, d.n_user
        |FROM events e JOIN d USING (user_id)""".stripMargin)
}
