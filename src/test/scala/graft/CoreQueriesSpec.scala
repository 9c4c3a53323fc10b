package graft

import graft.analytics.CoreQueries

class CoreQueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all registered queries run and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has matching oracle coverage or is declared rows-only") {
    // oracleSql keys must be a subset of queries keys
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }

  test("pricing summary groups are disjoint and counts add up") {
    val df = CoreQueries.pricingSummary(spark, sfDir)
    val total = df.agg(org.apache.spark.sql.functions.sum("count_order"))
      .head.getLong(0)
    val raw = Tables.lineitem(spark, sfDir).count()
    assert(total == raw)
  }

  test("anti-join complements the semi-join on the same predicate") {
    import org.apache.spark.sql.functions._
    val customer = Tables.customer(spark, sfDir)
    val urgent = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val semi = customer.join(urgent, customer("c_custkey") === urgent("o_custkey"), "left_semi").count()
    val anti = CoreQueries.customersWithoutOrders(spark, sfDir)
      .agg(sum("n_customers")).head.getLong(0)
    assert(semi + anti == customer.count())
  }

  test("top-3 per supplier never exceeds 3 rows per key") {
    import org.apache.spark.sql.functions._
    val over = CoreQueries.top3PerSupplier(spark, sfDir)
      .groupBy("l_suppkey").count().filter(col("count") > 3).count()
    assert(over == 0)
  }
}
