package graft.queries

import graft.SparkTestBase

/** Plan contracts for the relational area: the optimizer must broadcast
  * the filtered dimension side and push the date predicate to parquet. */
class RelationalPlanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q3: filtered customer dimension joins as a broadcast, not a shuffle") {
    val plan = graft.SparkEntry.queries("rel_q3_top_revenue")(spark, dir)
      .queryExecution.executedPlan.toString
    // specifically the CUSTOMER join must broadcast — at tiny SF every join
    // broadcasts, so a bare contains("BroadcastHashJoin") could keep
    // passing on the lineitem join after a dimension-side regression
    assert("BroadcastHashJoin [^\n]*c_custkey".r.findFirstIn(plan).isDefined,
      s"customer-side broadcast missing in:\n$plan")
  }

  test("q1: ship-date cutoff reaches the parquet scan as a pushed filter") {
    val plan = graft.SparkEntry.queries("rel_q1_pricing")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(plan).isDefined,
      s"no pushed l_shipdate filter in:\n$plan")
  }
}
