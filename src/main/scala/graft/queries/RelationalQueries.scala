package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational analytics over the TPC-H-ish tables — the engine is a
  * DataFrame library, so classic scan→join→agg→top-k queries come free;
  * these two pin the plans Catalyst must pick (pushdown, auto-broadcast
  * of the dimension side, partial aggregation) and hash-match DuckDB.
  *
  * Money sums run on a fixed-point (×10⁴) BIGINT representation on BOTH
  * engines — double summation order is not associative and round-after-
  * sum can land on different sides of a rounding boundary. */
object RelationalQueries {

  /** TPC-H Q1 shape: pricing summary with a ship-date cutoff (predicate
    * pushdown reaches the parquet scan). */
  private def q1(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(round(col("l_quantity") * 10000).cast("long")) / 10000.0).as("sum_qty"),
        (sum(round(col("l_extendedprice") * 10000).cast("long")) / 10000.0).as("sum_price"),
        count(lit(1)).as("n"))

  /** TPC-H Q3 shape: segment revenue top-10 — dimension filter broadcast
    * against the fact join, partial-aggregated revenue, bounded top-k. */
  private def q3(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val orders = Tables(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * (lit(1d) - col("l_discount")) * 10000)
          .cast("long").as("rev_fp"))
    orders.join(cust, orders("o_custkey") === cust("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg((sum(col("rev_fp")) / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("revenue"))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_q1_pricing" -> (q1 _),
    "rel_q3_top_revenue" -> (q3 _))

  def oracle: Map[String, String] = Map(
    "rel_q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(CAST(round(l_quantity * 10000) AS BIGINT)) / 10000.0 AS sum_qty,
        |       sum(CAST(round(l_extendedprice * 10000) AS BIGINT)) / 10000.0 AS sum_price,
        |       count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-12-31'
        |GROUP BY 1, 2""".stripMargin,
    "rel_q3_top_revenue" ->
      """SELECT o.o_orderkey,
        |       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |       sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'BUILDING'
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, o.o_orderkey ASC LIMIT 10""".stripMargin)
}
