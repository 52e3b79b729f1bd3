package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Ingest
import graft.operators.Ingest.IngestConfig

/** Ingestion operators (S1/F3/F4/F5) as driver-verifiable queries.
  * The upsert batch mixes all three cases: overwrites (changed label for
  * vec_id<50), close-enough no-ops (identical rows for vec_id in [50,100)),
  * and fresh inserts (vec_id+20000). */
object IngestQueries {

  private def upsertQ(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings").select("vec_id", "label")
    val updates = e.filter(col("vec_id") < 50)
      .select(col("vec_id"), (col("label") + 1000).as("label"))
      .unionByName(e.filter(col("vec_id") >= 50 && col("vec_id") < 100))
      .unionByName(e.select((col("vec_id") + 20000).as("vec_id"), col("label")))
    Ingest.upsert(e, updates, IngestConfig(Seq("vec_id"), Seq("label")))
  }

  /** F3: TTL expiry over the events stream table — events live 30 days,
    * observed midway through the generated time range. */
  private def ttlQ(s: SparkSession, dir: String): DataFrame = {
    val asOf = to_timestamp(lit("2024-02-15 00:00:00"))
    val stamped = Tables(s, dir, "events")
      .withColumn("expire_at", col("ts") + expr("INTERVAL 30 DAYS"))
    Ingest.compact(stamped, "expire_at", asOf)
      .select("event_id", "user_id", "event_type")
  }

  /** G7 eviction watermark: events over a 5000-row target keep the newest
    * targetN×0.4 rows (reference semantics data/sync.go:7-13). The count
    * gate runs here because a standalone query has no catalog; callers
    * going through DatasetCatalog pass `currentN` and skip the scan. The
    * oracle replays BOTH branches (no-op under target, top-k over it) so
    * the gate semantics are verified at every scale factor. */
  private def evictQ(s: SparkSession, dir: String): DataFrame =
    Ingest.evict(
      Tables(s, dir, "events").select("event_id", "ts", "user_id"),
      targetN = 5000, utilization = 0.4, orderCol = "ts", tieCol = "event_id")
      .select("event_id", "user_id")

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ingest_upsert" -> (upsertQ _),
    "ingest_ttl_compact" -> (ttlQ _),
    "ingest_evict" -> (evictQ _))

  def oracle: Map[String, String] = Map(
    "ingest_upsert" ->
      """WITH e AS (SELECT vec_id, label FROM embeddings),
        |u AS (SELECT vec_id, label + 1000 AS label FROM e WHERE vec_id < 50
        |      UNION ALL SELECT vec_id, label FROM e WHERE vec_id >= 50 AND vec_id < 100
        |      UNION ALL SELECT vec_id + 20000, label FROM e)
        |SELECT coalesce(e.vec_id, u.vec_id) AS vec_id,
        |       CASE WHEN u.vec_id IS NULL THEN e.label
        |            WHEN e.vec_id IS NULL THEN u.label
        |            WHEN u.label = e.label THEN e.label
        |            ELSE u.label END AS label
        |FROM e FULL OUTER JOIN u ON e.vec_id = u.vec_id""".stripMargin,
    "ingest_ttl_compact" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE ts + INTERVAL 30 DAY > TIMESTAMP '2024-02-15 00:00:00'""".stripMargin,
    "ingest_evict" ->
      """WITH r AS (SELECT event_id, user_id,
        |             row_number() OVER (ORDER BY ts DESC, event_id ASC) AS rn,
        |             count(*) OVER () AS n
        |           FROM events)
        |SELECT event_id, user_id FROM r WHERE n <= 5000 OR rn <= 2000""".stripMargin)
}
