package graft

import graft.queries.CoreQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan shape assertions: the scale properties claimed in
  * README/COVERAGE are checked against the actual planned operators, not
  * taken on faith — pushdown reaches the scan, dims broadcast, global
  * top-k avoids a full sort, the as-of join is windowed (never a
  * non-equi nested loop).
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q01: filter and projection are pushed into the parquet scan") {
    val s = formatted(CoreQueries.q01ScanPrune(spark, sf))
    assert(s.contains("PushedFilters") &&
      s.matches("(?s).*PushedFilters: \\[.*l_shipdate.*\\].*"), s)
    // pruned read schema: only the 4 projected + filter columns, no l_tax etc.
    assert(!s.contains("l_tax") && !s.contains("l_returnflag"), s)
  }

  test("q03: dimension joins broadcast (no shuffle of nation)") {
    val p = planOf(CoreQueries.q03JoinRevenueByNation(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q12: global top-k plans TakeOrderedAndProject, not a full sort") {
    val p = planOf(CoreQueries.q12TopkGlobal(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q20 as-of join: single window, no nested-loop or cartesian join") {
    val p = planOf(CoreQueries.q20AsofJoin(spark, sf))
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q02: aggregation is partial+final (map-side combine present)") {
    val p = planOf(CoreQueries.q02AggPricing(spark, sf))
    // two HashAggregate nodes around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("ORDER BY is eliminated under count() — bench doesn't pay verify's sort") {
    val counted = CoreQueries.q01ScanPrune(spark, sf).groupBy().count()
    val p = planOf(counted)
    assert(!p.contains("Sort"), p)
  }

  test("entry flagship contains no cartesian product") {
    val p = planOf(SparkEntry.entry(spark))
    assert(!p.contains("CartesianProduct"), p)
  }
}
