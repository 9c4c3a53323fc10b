package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.CoreQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers an exemplar
  * query here, with an equivalent DuckDB SQL oracle in [[oracleSql]].
  * Column names and row order are made to match exactly on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"    -> (CoreQueries.pricingSummary _),
    "q2_priority_pivot"     -> (CoreQueries.orderPriorityPivot _),
    "q3_region_rollup"      -> (CoreQueries.regionRollup _),
    "q4_revenue_by_month"   -> (CoreQueries.revenueByStatusMonth _),
    "q5_anti_join"          -> (CoreQueries.customersWithoutOrders _),
    "q6_semi_join"          -> (CoreQueries.customersWithOrders _),
    "q7_topk_per_group"     -> (CoreQueries.top3PerSupplier _),
    "q8_running_total"      -> (CoreQueries.runningOrderTotal _),
  )

  /** DuckDB equivalents, runnable on views named after the parquet tables. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
        |  round(sum(l_quantity) / count(*), 4) AS avg_qty,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_priority_pivot" ->
      """SELECT o_orderpriority,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS finished_count,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS open_count,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS pending_count,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q3_region_rollup" ->
      """SELECT r_name,
        |  count(*) AS n_customers,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,
    "q4_revenue_by_month" ->
      """SELECT o_orderstatus,
        |  date_trunc('month', o_orderdate) AS order_month,
        |  CAST(round(sum(revenue), 2) AS DOUBLE) AS sum_revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN (SELECT l_orderkey,
        |        sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS revenue
        |      FROM lineitem GROUP BY l_orderkey) li
        |  ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus, date_trunc('month', o_orderdate)
        |ORDER BY o_orderstatus, order_month""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q6_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q7_topk_per_group" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn
        |FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q8_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
  )
}
