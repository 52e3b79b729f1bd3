package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Stats

/** Dataset-statistics operators (SURVEY.md §2.6 G1-G4) as driver-verifiable
  * queries with DuckDB oracles. `stats_datainfo` is the exact version of the
  * reference's `DataInfo` (GetDataInfo RPC, data/data.go:205-219).
  *
  * Results are emitted in LONG format (stat, idx, value) — scalar columns
  * only — so the driver's sort-and-hash compare never has to order by an
  * array column. */
object StatsQueries {

  private def dataInfo(s: SparkSession, dir: String): DataFrame = {
    // The heavy aggregation is distributed; only the final one-row DataInfo
    // is collected here to be re-shaped into long format.
    val r = Stats.dataInfo(Tables(s, dir, "embeddings"), "embedding").head()
    val rows =
      Seq(("n", 0, r.getLong(0).toDouble), ("max_distance", 0, r.getDouble(2))) ++
        r.getSeq[Double](1).zipWithIndex.map { case (v, i) => ("avg", i, v) } ++
        r.getSeq[Double](3).zipWithIndex.map { case (v, i) => ("hist", i, v) }
    import s.implicits._
    rows.toDF("stat", "idx", "value")
  }

  /** grouped count+mean per label — per-dataset stats for a catalog of many
    * datasets (one shuffle on the low-cardinality label; map-side partial
    * sums via Summarizer's TypedImperativeAggregate). */
  private def groupStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    import org.apache.spark.ml.stat.Summarizer
    Tables(s, dir, "embeddings")
      .select(col("label"), array_to_vector(col("embedding").cast("array<double>")).as("v"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"), vector_to_array(Summarizer.mean(col("v"))).as("m"))
      .select(col("label"), col("n"), posexplode(col("m")))
      .select(col("label"), col("n"), col("pos").as("idx"),
        round(col("col"), 6).as("value"))
  }

  /** Binary-exact probabilities (k/2^m): `ceil(p·n)` is then the same
    * integer in every IEEE-double implementation, so the Spark rank and
    * the DuckDB `quantile_disc` rank can never disagree at a knife-edge
    * float product (a 0.01-style decimal can). */
  private val QuantilePs = Seq(0.015625, 0.25, 0.5, 0.75, 0.984375)

  /** EXACT document-length quantiles via distributed threshold
    * selection ([[graft.operators.Selection.quantiles]]) — the
    * corpus-profiling percentile read (tail cutoffs for a length
    * filter) spelled without a single-task sort OR sketch error. */
  private def lenQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Selection
      .quantiles(Tables(s, dir, "documents"), "n_chars", QuantilePs)
      .map { case (p, v) => (p, v.toLong) }
      .toDF("p", "n_chars_q")
  }

  /** Per-language exact quantiles — the CCNet-style per-group corpus
    * profile, all groups resolved simultaneously
    * ([[graft.operators.Selection.quantilesByGroup]]). */
  private def lenQuantilesLang(s: SparkSession, dir: String): DataFrame =
    graft.operators.Selection
      .quantilesByGroup(Tables(s, dir, "documents"), "lang", "n_chars",
        QuantilePs)
      .select(col("lang"), col("p"),
        col("value").cast("long").as("n_chars_q"))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_datainfo" -> (dataInfo _),
    "stats_group_mean" -> (groupStats _),
    "stats_len_quantiles" -> (lenQuantiles _),
    "stats_len_quantiles_lang" -> (lenQuantilesLang _))

  private val base =
    """WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |dim AS (SELECT max(len(e)) AS d, count(*) AS n FROM v),
      |m AS (SELECT i, avg(e[i]) AS mi
      |      FROM v, (SELECT unnest(generate_series(1, (SELECT d FROM dim))) AS i)
      |      GROUP BY i),
      |c AS (SELECT list(mi ORDER BY i) AS ctr FROM m),
      |d2 AS (SELECT round(list_distance(v.e, c.ctr), 6) AS dist FROM v, c),
      |mx AS (SELECT round(max(dist), 6) AS md FROM d2),
      |b AS (SELECT CASE WHEN (SELECT md FROM mx) = 0 THEN 0
      |             ELSE least(floor(dist / (SELECT md FROM mx) * 64), 63) END::INT AS bk
      |      FROM d2),
      |h AS (SELECT bk, count(*) AS cnt FROM b GROUP BY bk)""".stripMargin

  def oracle: Map[String, String] = Map(
    "stats_datainfo" ->
      s"""$base
        |SELECT 'n' AS stat, 0 AS idx, (SELECT n FROM dim)::DOUBLE AS value
        |UNION ALL
        |SELECT 'max_distance', 0, (SELECT md FROM mx)
        |UNION ALL
        |SELECT 'avg', (i - 1)::INT, round(mi, 6) FROM m
        |UNION ALL
        |SELECT 'hist', g.generate_series::INT,
        |       round(coalesce(h.cnt, 0)::DOUBLE / (SELECT n FROM dim), 6)
        |FROM generate_series(0, 63) g LEFT JOIN h ON g.generate_series = h.bk""".stripMargin,
    "stats_group_mean" ->
      """WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |dim AS (SELECT max(len(e)) AS d FROM v),
        |n AS (SELECT label, count(*) AS n FROM v GROUP BY label)
        |SELECT v.label, n.n, (i - 1)::INT AS idx, round(avg(e[i]), 6) AS value
        |FROM v, (SELECT unnest(generate_series(1, (SELECT d FROM dim))) AS i)
        |JOIN n ON n.label = v.label
        |GROUP BY v.label, n.n, i""".stripMargin,
    "stats_len_quantiles" -> {
      val list = QuantilePs.mkString("[", ",", "]")
      s"""WITH q AS (SELECT quantile_disc(n_chars, $list) AS vs FROM documents)
        |SELECT unnest($list)::DOUBLE AS p, unnest(vs)::BIGINT AS n_chars_q
        |FROM q""".stripMargin
    },
    "stats_len_quantiles_lang" -> {
      val list = QuantilePs.mkString("[", ",", "]")
      s"""WITH q AS (SELECT lang, quantile_disc(n_chars, $list) AS vs
        |           FROM documents GROUP BY lang)
        |SELECT lang, unnest($list)::DOUBLE AS p, unnest(vs)::BIGINT AS n_chars_q
        |FROM q""".stripMargin
    })
}
