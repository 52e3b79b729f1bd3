package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{GjsonPath, Search, SearchConfig}

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

  /** gjson-parity filters (VERDICT r4 #5): array `#` wildcard, `#(...)`
    * terminal queries (string and numeric), integer indexes — each
    * feature emits its own boolean column over a 4-variant labels
    * fixture, so the DuckDB oracle pins every feature independently
    * per-row; `passes_all` additionally routes three of them through the
    * Search.passesFilters SearchConfig surface (conjunctive, like the
    * reference's filter loop). */
  private def jsonWildcard(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events").withColumn("labels",
      when(col("event_id") % 4 === 0,
        lit("""{"tags":[{"type":"news","w":3},{"type":"blog","w":1}],"ids":[7,8]}"""))
      .when(col("event_id") % 4 === 1,
        lit("""{"tags":[{"type":"blog","w":1}],"ids":[7,8]}"""))
      .when(col("event_id") % 4 === 2,
        lit("""{"tags":[{"w":2}],"ids":[7]}"""))
      .otherwise(lit("""{"other":1}""")))
    e.select(col("event_id"),
      GjsonPath.exists(col("labels"), "tags.#").as("is_array"),
      GjsonPath.exists(col("labels"), "tags.#.type").as("wild_ok"),
      GjsonPath.exists(col("labels"), """tags.#(type=="news")""").as("query_ok"),
      GjsonPath.exists(col("labels"), "tags.#(w>=2)").as("num_ok"),
      GjsonPath.exists(col("labels"), "ids.1").as("idx_ok"),
      Search.passesFilters(SearchConfig(
        filters = Seq("tags.#.type", """tags.#(type=="news")""", "ids.1"),
        labelCol = "labels")).as("passes_all"))
  }

  /** Key wildcards `*`/`?` and `\` escapes (round 6, r5 verdict #4): each
    * feature emits its own boolean column over a 4-variant labels
    * fixture; `passes_all` routes two wildcard filters through the
    * Search.passesFilters SearchConfig surface. */
  private def jsonKeyWild(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events").withColumn("labels",
      when(col("event_id") % 4 === 0,
        lit("""{"file_a":{"size":3},"x":1,"tags":[{"m":{"k":"y"}},{"m":{"k":"n"}}]}"""))
      .when(col("event_id") % 4 === 1,
        lit("""{"file_bc":{"name":"n"},"a.b":5,"tags":[{"m":{"k":"n"}}]}"""))
      .when(col("event_id") % 4 === 2, lit("""{"other":{"size":7},"a.b":{"c":1}}"""))
      .otherwise(lit("""{"x":2}""")))
    e.select(col("event_id"),
      GjsonPath.exists(col("labels"), "file_*.size").as("star_ok"),
      GjsonPath.exists(col("labels"), "*.size").as("anykey_ok"),
      GjsonPath.exists(col("labels"), "file_?").as("q_ok"),
      GjsonPath.exists(col("labels"), """a\.b""").as("esc_ok"),
      GjsonPath.exists(col("labels"), """a\.b.c""").as("esc_deep_ok"),
      GjsonPath.exists(col("labels"), """tags.#(m.k=="y")""").as("dq_ok"),
      Search.passesFilters(SearchConfig(
        filters = Seq("file_*", "*.size"),
        labelCol = "labels")).as("passes_all"))
  }

  /** The `#(...)#` all-matches form (round 7, VERDICT r6 #2): existence
    * = non-empty match list — the engine's documented deviation from
    * gjson's degenerate `.Exists()` (an empty `[]` result still exists
    * there). The fixture makes the deviation and the continued-path
    * semantics both load-bearing: variant 1 has the array but NO match
    * (gjson Exists would say true, this engine says false), variant 2
    * matches the query but lacks the continuation field. */
  private def jsonAllMatch(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events").withColumn("labels",
      when(col("event_id") % 4 === 0,
        lit("""{"tags":[{"type":"news","w":3},{"type":"blog","w":1}]}"""))
      .when(col("event_id") % 4 === 1,
        lit("""{"tags":[{"type":"blog","w":1}]}"""))
      .when(col("event_id") % 4 === 2,
        lit("""{"tags":[{"type":"news"}]}"""))
      .otherwise(lit("""{"other":1}""")))
    e.select(col("event_id"),
      GjsonPath.exists(col("labels"), """tags.#(type=="news")#""").as("all_ok"),
      GjsonPath.exists(col("labels"), """tags.#(type=="news")#.w""").as("all_rest_ok"),
      GjsonPath.exists(col("labels"), "tags.#(w>=2)#").as("all_num_ok"),
      Search.passesFilters(SearchConfig(
        filters = Seq("""tags.#(type=="news")#""", "tags.#"),
        labelCol = "labels")).as("passes_all"))
  }

  /** Nested `#(...)` conditions and the field-less element-self compare
    * (round 7, VERDICT r6 #7): `friends.#(nets.#(=="fb"))#` is gjson's
    * own canonical nested-query example (reference accepts the full
    * grammar via gjson.Get at data/search.go:94,104). Variant 1 has
    * friends but none with fb; variant 2 has friends without nets at
    * all; variant 3 lacks the array. */
  private def jsonNested(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events").withColumn("labels",
      when(col("event_id") % 4 === 0,
        lit("""{"friends":[{"nets":["fb","tw"],"age":44},{"nets":["ig"]}],"ids":[1,2]}"""))
      .when(col("event_id") % 4 === 1,
        lit("""{"friends":[{"nets":["ig"],"age":30}],"ids":[2,9]}"""))
      .when(col("event_id") % 4 === 2,
        lit("""{"friends":[{"age":9}],"ids":[3]}"""))
      .otherwise(lit("""{"other":1}""")))
    e.select(col("event_id"),
      GjsonPath.exists(col("labels"), """friends.#(nets.#(=="fb"))#""").as("nested_ok"),
      GjsonPath.exists(col("labels"), """friends.#(nets.#(=="fb")).age""").as("nested_rest_ok"),
      GjsonPath.exists(col("labels"), "friends.#(age)").as("haskey_ok"),
      GjsonPath.exists(col("labels"), "ids.#(==2)").as("self_ok"),
      GjsonPath.exists(col("labels"), "ids.#(>2)#").as("self_num_ok"),
      Search.passesFilters(SearchConfig(
        filters = Seq("""friends.#(nets.#(=="fb"))#""", "ids.#(==2)"),
        labelCol = "labels")).as("passes_all"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "filter_json_allmatch" -> (jsonAllMatch _),
    "filter_json_nested" -> (jsonNested _),
    "filter_json_exists" -> (jsonExists _),
    "filter_group_json_exists" -> (groupJsonExists _),
    "filter_json_wildcard" -> (jsonWildcard _),
    "filter_json_keywild" -> (jsonKeyWild _))

  def oracle: Map[String, String] = Map(
    "filter_json_allmatch" ->
      """WITH e AS (SELECT event_id,
        |  CASE WHEN event_id % 4 = 0 THEN '{"tags":[{"type":"news","w":3},{"type":"blog","w":1}]}'
        |       WHEN event_id % 4 = 1 THEN '{"tags":[{"type":"blog","w":1}]}'
        |       WHEN event_id % 4 = 2 THEN '{"tags":[{"type":"news"}]}'
        |       ELSE '{"other":1}' END AS labels
        |  FROM events),
        |t AS (SELECT event_id, labels,
        |        json_array_length(labels, '$.tags')::BIGINT AS n FROM e),
        |f AS (SELECT event_id,
        |  CASE WHEN n IS NULL THEN FALSE ELSE
        |    len(list_filter(generate_series(0, n - 1),
        |      i -> json_extract_string(labels, '$.tags[' || i || '].type') = 'news')) > 0 END AS all_ok,
        |  CASE WHEN n IS NULL THEN FALSE ELSE
        |    len(list_filter(generate_series(0, n - 1),
        |      i -> json_extract_string(labels, '$.tags[' || i || '].type') = 'news'
        |           AND json_extract(labels, '$.tags[' || i || '].w') IS NOT NULL)) > 0 END AS all_rest_ok,
        |  CASE WHEN n IS NULL THEN FALSE ELSE
        |    len(list_filter(generate_series(0, n - 1),
        |      i -> TRY_CAST(json_extract_string(labels, '$.tags[' || i || '].w') AS DOUBLE) >= 2)) > 0 END AS all_num_ok,
        |  (n IS NOT NULL) AS is_arr
        |  FROM t)
        |SELECT event_id, all_ok, all_rest_ok, all_num_ok,
        |       (all_ok AND is_arr) AS passes_all
        |FROM f""".stripMargin,
    "filter_json_nested" ->
      """WITH e AS (SELECT event_id,
        |  CASE WHEN event_id % 4 = 0 THEN '{"friends":[{"nets":["fb","tw"],"age":44},{"nets":["ig"]}],"ids":[1,2]}'
        |       WHEN event_id % 4 = 1 THEN '{"friends":[{"nets":["ig"],"age":30}],"ids":[2,9]}'
        |       WHEN event_id % 4 = 2 THEN '{"friends":[{"age":9}],"ids":[3]}'
        |       ELSE '{"other":1}' END AS labels
        |  FROM events),
        |t AS (SELECT event_id, labels,
        |        json_array_length(labels, '$.friends')::BIGINT AS nf,
        |        json_array_length(labels, '$.ids')::BIGINT AS ni FROM e),
        |f AS (SELECT event_id,
        |  CASE WHEN nf IS NULL THEN FALSE ELSE
        |    len(list_filter(generate_series(0, nf - 1),
        |      i -> len(list_filter(generate_series(0, COALESCE(json_array_length(labels, '$.friends[' || i || '].nets')::BIGINT, 0) - 1),
        |             j -> json_extract_string(labels, '$.friends[' || i || '].nets[' || j || ']') = 'fb')) > 0)) > 0 END AS nested_ok,
        |  CASE WHEN nf IS NULL THEN FALSE ELSE
        |    len(list_filter(generate_series(0, nf - 1),
        |      i -> len(list_filter(generate_series(0, COALESCE(json_array_length(labels, '$.friends[' || i || '].nets')::BIGINT, 0) - 1),
        |             j -> json_extract_string(labels, '$.friends[' || i || '].nets[' || j || ']') = 'fb')) > 0
        |           AND json_extract(labels, '$.friends[' || i || '].age') IS NOT NULL)) > 0 END AS nested_rest_ok,
        |  CASE WHEN nf IS NULL THEN FALSE ELSE
        |    len(list_filter(generate_series(0, nf - 1),
        |      i -> json_extract(labels, '$.friends[' || i || '].age') IS NOT NULL)) > 0 END AS haskey_ok,
        |  CASE WHEN ni IS NULL THEN FALSE ELSE
        |    len(list_filter(generate_series(0, ni - 1),
        |      i -> TRY_CAST(json_extract_string(labels, '$.ids[' || i || ']') AS DOUBLE) = 2)) > 0 END AS self_ok,
        |  CASE WHEN ni IS NULL THEN FALSE ELSE
        |    len(list_filter(generate_series(0, ni - 1),
        |      i -> TRY_CAST(json_extract_string(labels, '$.ids[' || i || ']') AS DOUBLE) > 2)) > 0 END AS self_num_ok
        |  FROM t)
        |SELECT event_id, nested_ok, nested_rest_ok, haskey_ok, self_ok, self_num_ok,
        |       (nested_ok AND self_ok) AS passes_all
        |FROM f""".stripMargin,
    "filter_json_exists" ->
      """SELECT event_id, props FROM (
        |  SELECT event_id,
        |         CASE WHEN event_id % 3 = 0 THEN '{"other":1}' ELSE props END AS props
        |  FROM events)
        |WHERE json_extract(props, '$.k') IS NOT NULL""".stripMargin,
    "filter_json_wildcard" ->
      """WITH e AS (SELECT event_id,
        |  CASE WHEN event_id % 4 = 0 THEN '{"tags":[{"type":"news","w":3},{"type":"blog","w":1}],"ids":[7,8]}'
        |       WHEN event_id % 4 = 1 THEN '{"tags":[{"type":"blog","w":1}],"ids":[7,8]}'
        |       WHEN event_id % 4 = 2 THEN '{"tags":[{"w":2}],"ids":[7]}'
        |       ELSE '{"other":1}' END AS labels
        |  FROM events),
        |t AS (SELECT event_id, labels,
        |        json_array_length(labels, '$.tags')::BIGINT AS n FROM e),
        |f AS (SELECT event_id,
        |  (n IS NOT NULL) AS is_array,
        |  CASE WHEN n IS NULL THEN FALSE ELSE
        |    len(list_filter(generate_series(0, n - 1),
        |      i -> json_extract(labels, '$.tags[' || i || '].type') IS NOT NULL)) > 0 END AS wild_ok,
        |  CASE WHEN n IS NULL THEN FALSE ELSE
        |    len(list_filter(generate_series(0, n - 1),
        |      i -> json_extract_string(labels, '$.tags[' || i || '].type') = 'news')) > 0 END AS query_ok,
        |  CASE WHEN n IS NULL THEN FALSE ELSE
        |    len(list_filter(generate_series(0, n - 1),
        |      i -> TRY_CAST(json_extract_string(labels, '$.tags[' || i || '].w') AS DOUBLE) >= 2)) > 0 END AS num_ok,
        |  (json_extract(labels, '$.ids[1]') IS NOT NULL) AS idx_ok
        |  FROM t)
        |SELECT event_id, is_array, wild_ok, query_ok, num_ok, idx_ok,
        |       (wild_ok AND query_ok AND idx_ok) AS passes_all
        |FROM f""".stripMargin,
    "filter_json_keywild" ->
      """WITH e AS (SELECT event_id,
        |  CASE WHEN event_id % 4 = 0 THEN '{"file_a":{"size":3},"x":1,"tags":[{"m":{"k":"y"}},{"m":{"k":"n"}}]}'
        |       WHEN event_id % 4 = 1 THEN '{"file_bc":{"name":"n"},"a.b":5,"tags":[{"m":{"k":"n"}}]}'
        |       WHEN event_id % 4 = 2 THEN '{"other":{"size":7},"a.b":{"c":1}}'
        |       ELSE '{"x":2}' END AS labels
        |  FROM events)
        |SELECT event_id,
        |  len(list_filter(json_keys(labels), k -> regexp_matches(k, '^file_.*$') AND json_extract(labels, '$."' || k || '".size') IS NOT NULL)) > 0 AS star_ok,
        |  len(list_filter(json_keys(labels), k -> json_extract(labels, '$."' || k || '".size') IS NOT NULL)) > 0 AS anykey_ok,
        |  len(list_filter(json_keys(labels), k -> regexp_matches(k, '^file_.$'))) > 0 AS q_ok,
        |  (json_extract(labels, '$."a.b"') IS NOT NULL) AS esc_ok,
        |  (json_extract(labels, '$."a.b".c') IS NOT NULL) AS esc_deep_ok,
        |  CASE WHEN json_array_length(labels, '$.tags') IS NULL THEN FALSE ELSE
        |    len(list_filter(generate_series(0, json_array_length(labels, '$.tags')::BIGINT - 1),
        |      i -> json_extract_string(labels, '$.tags[' || i || '].m.k') = 'y')) > 0 END AS dq_ok,
        |  (len(list_filter(json_keys(labels), k -> regexp_matches(k, '^file_.*$'))) > 0
        |   AND len(list_filter(json_keys(labels), k -> json_extract(labels, '$."' || k || '".size') IS NOT NULL)) > 0) AS passes_all
        |FROM e""".stripMargin,
    "filter_group_json_exists" ->
      """SELECT event_id, props, gprops FROM (
        |  SELECT event_id,
        |         CASE WHEN event_id % 3 = 0 THEN '{"other":1}' ELSE props END AS props,
        |         CASE WHEN event_id % 2 = 0 THEN '{"grp":"even"}' ELSE '{"odd":1}' END AS gprops
        |  FROM events)
        |WHERE json_extract(props, '$.k') IS NOT NULL
        |  AND json_extract(gprops, '$.grp') IS NOT NULL""".stripMargin)
}
