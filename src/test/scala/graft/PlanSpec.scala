package graft

import graft.analytics.{CoreQueries, DedupQueries, ScalarQueries}

/** Physical-plan shape checks: the optimizations the engine depends on
  * at scale must actually appear in the executed plan — filter/column
  * pushdown into the parquet scan, broadcast joins for dimensions,
  * partial aggregation, whole-stage codegen around the hot expressions.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter pushdown reaches the parquet scan (p3 source range)") {
    val p = plan(ScalarQueries.sourceRangeFilter(spark, sfDir))
    assert(p.contains("PushedFilters: ["), p.take(500))
    assert(p.contains("GreaterThanOrEqual(source,src2)"), p.take(2000))
  }

  test("column pruning: scan reads only the projected columns") {
    val p = plan(ScalarQueries.sourceRangeFilter(spark, sfDir))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,source:string>"), p.take(2000))
  }

  test("dimension joins broadcast (q3 region rollup)") {
    val p = plan(CoreQueries.regionRollup(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.take(1000))
    assert(!p.contains("SortMergeJoin"), "small dims must not sort-merge")
  }

  test("anti/semi joins plan as hash joins with pushed-down right filter") {
    val p = plan(CoreQueries.customersWithoutOrders(spark, sfDir))
    assert(p.contains("LeftAnti"), p.take(1000))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderpriority), EqualTo(o_orderpriority,1-URGENT)]")
      || p.contains("EqualTo(o_orderpriority,1-URGENT)"), "right-side filter must push down")
  }

  test("aggregation is partial+final (map-side combine)") {
    val p = plan(CoreQueries.pricingSummary(spark, sfDir))
    assert(p.contains("partial_"), "expected partial aggregation")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("native dot product used and threshold pushed into the pair join") {
    val df = DedupQueries.embeddingNearDups(spark, sfDir)
    val p = plan(df)
    assert(p.contains("dotproduct"), p.take(2000))
    // Catalyst must fold the cosine threshold INTO the join condition so
    // sub-threshold pairs never materialize as rows
    assert(p.contains("BroadcastNestedLoopJoin") && p.contains(">= 0.45"),
      p.take(2000))
    assert(df.count() >= 0)
  }

  test("revenue query pre-aggregates lineitem before the join") {
    val p = plan(CoreQueries.revenueByStatusMonth(spark, sfDir))
    // the aggregate on l_orderkey must appear below the join
    val joinIdx = p.indexOf("Join")
    val aggIdx = p.lastIndexOf("HashAggregate")
    assert(joinIdx >= 0 && aggIdx > joinIdx,
      "expected aggregate below the join in the plan tree")
  }
}
