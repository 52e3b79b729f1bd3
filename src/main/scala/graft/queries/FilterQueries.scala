package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Search, SearchConfig}

/** JSON-path existence filters (SURVEY.md §2.2 F1/F2) as a driver query.
  * Every third event's props are swapped for a JSON without the `k` key so
  * the existence filter has real selectivity; pushdown of the surviving
  * predicate is Catalyst's job (the filter is a pure column expression). */
object FilterQueries {

  private def jsonExists(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
      .withColumn("props",
        when(col("event_id") % 3 === 0, lit("""{"other":1}"""))
          .otherwise(col("props")))
    e.filter(Search.passesFilters(SearchConfig(filters = Seq("k"), labelCol = "props")))
      .select("event_id", "props")
  }

  /** F2: `groupFilters` against the GROUP label, conjunctive with the F1
    * label filters (reference applies both, data/search.go:89-107). The
    * group label here is a JSON derived from event_type, so the group
    * filter has selectivity independent of the label filter's. */
  private def groupJsonExists(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
      .withColumn("props",
        when(col("event_id") % 3 === 0, lit("""{"other":1}"""))
          .otherwise(col("props")))
      .withColumn("gprops",
        when(col("event_id") % 2 === 0, lit("""{"grp":"even"}"""))
          .otherwise(lit("""{"odd":1}""")))
    e.filter(Search.passesFilters(SearchConfig(
        filters = Seq("k"), groupFilters = Seq("grp"),
        labelCol = "props", groupLabelCol = "gprops")))
      .select("event_id", "props", "gprops")
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "filter_json_exists" -> (jsonExists _),
    "filter_group_json_exists" -> (groupJsonExists _))

  def oracle: Map[String, String] = Map(
    "filter_json_exists" ->
      """SELECT event_id, props FROM (
        |  SELECT event_id,
        |         CASE WHEN event_id % 3 = 0 THEN '{"other":1}' ELSE props END AS props
        |  FROM events)
        |WHERE json_extract(props, '$.k') IS NOT NULL""".stripMargin,
    "filter_group_json_exists" ->
      """SELECT event_id, props, gprops FROM (
        |  SELECT event_id,
        |         CASE WHEN event_id % 3 = 0 THEN '{"other":1}' ELSE props END AS props,
        |         CASE WHEN event_id % 2 = 0 THEN '{"grp":"even"}' ELSE '{"odd":1}' END AS gprops
        |  FROM events)
        |WHERE json_extract(props, '$.k') IS NOT NULL
        |  AND json_extract(gprops, '$.grp') IS NOT NULL""".stripMargin)
}
