package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import graft.etl.Sinks

/** The co-located-join contract (PERFORMANCE.md "Partitioning &
  * shuffle"): fact tables bucketed the SAME way on the join key must
  * equi-join with ZERO shuffle exchanges — at 100 TB this is the
  * difference between a metadata lookup and re-shuffling both tables
  * every query. A doc claim until this spec: here it is asserted on
  * the executed plan.
  */
class BucketedJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("same-bucketing equi-join plans with zero exchanges and matches the plain join") {
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
    Sinks.writeBucketed(orders, "b_orders", 8,
      Seq("o_orderkey"), Seq("o_orderkey"))
    Sinks.writeBucketed(lineitem, "b_lineitem", 8,
      Seq("l_orderkey"), Seq("l_orderkey"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("qty"))
      joined.collect() // finalize the adaptive plan before inspecting it
      val exchanges = collectWithSubqueries(joined.queryExecution.executedPlan) {
        case e: ShuffleExchangeExec => e
      }
      // the join itself must be exchange-free; the only shuffle allowed
      // is the final single-column aggregation above it
      assert(exchanges.size <= 1,
        s"bucketed join should add no exchanges:\n${joined.queryExecution.executedPlan}")

      // byte-equal with the plain (shuffling) join
      val plain = orders
        .join(lineitem, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("qty"))
      assert(joined.orderBy($"o_orderstatus").collect().toSeq ==
        plain.orderBy($"o_orderstatus").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
