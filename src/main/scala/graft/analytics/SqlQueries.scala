package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Set operations, distinct, ILIKE, and the Spark SQL surface
  * (SURVEY.md §2.6, A11, F4; plus multi-join headline queries that
  * exercise Catalyst's join planning end-to-end through spark.sql). */
object SqlQueries {

  /** §2.6 — union + except (the reference's incremental set-difference
    * and batch-union patterns, ingest/main.py:283, processors.py:184). */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val en = docs.filter(col("lang") === "en").select(col("source"))
    val es = docs.filter(col("lang") === "es").select(col("source"))
    val zh = docs.filter(col("lang") === "zh").select(col("source"))
    en.union(es).distinct().except(zh).orderBy(col("source"))
  }

  /** q22 — correlated-aggregate anti join (TPC-H Q22 shape on this
    * schema): customers with above-average positive balance and NO
    * URGENT orders (the "no recent orders" analog on this schema;
    * plain no-orders is empty — order coverage is near-total), rolled
    * up per market segment. The average comparison is
    * done MULTIPLICATIVELY — `bal · n > total` in DECIMAL(18,2) ×
    * BIGINT — so no division ever runs and the filter is exact integer
    * -scaled arithmetic on both engines (a decimal-division average
    * would round differently per engine). */
  def richIdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .withColumn("__bal", col("c_acctbal").cast("decimal(18,2)"))
    val pos = c.filter(col("__bal") > 0)
    val stats = pos.agg(sum(col("__bal")).as("__tot"),
      count(lit(1)).as("__n"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    c.crossJoin(broadcast(stats))
      .filter(col("__bal") * col("__n") > col("__tot"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_custs"),
        sum(col("__bal")).cast("double").as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** u4 — multiset (ALL) set operations: EXCEPT ALL subtracts
    * multiplicities, INTERSECT ALL takes their minimum — bag semantics
    * the u1 set variants cannot express. Statuses of high-priority
    * orders vs medium-priority orders, counted per status after each
    * ALL operation; full-outer stitch so a status appearing in only
    * one result still shows (coalesced 0). */
  def multisetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val hi = o.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderstatus"))
    val lo = o.filter(col("o_orderpriority") === "3-MEDIUM")
      .select(col("o_orderstatus"))
    val ea = hi.exceptAll(lo).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_except_all"))
    val ia = hi.intersectAll(lo).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_intersect_all"))
    ea.join(ia, Seq("o_orderstatus"), "full_outer")
      .select(col("o_orderstatus"),
        coalesce(col("n_except_all"), lit(0L)).as("n_except_all"),
        coalesce(col("n_intersect_all"), lit(0L)).as("n_intersect_all"))
      .orderBy(col("o_orderstatus"))
  }

  /** A11 — dedup-distinct on a composite key. */
  def distinctPairs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderstatus"))
      .distinct()
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))

  /** F4 — ILIKE pattern match (bronze_oa_text.sql:35-37). */
  def ilikeFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_name").ilike("%Red%"))
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))

  private def registerViews(spark: SparkSession, dir: String): Unit =
    Seq("customer", "orders", "lineitem", "supplier", "nation", "region", "part")
      .foreach(t => Tables.table(spark, dir, t).createOrReplaceTempView(t))

  /** TPC-H Q5-shaped multi-join through the spark.sql surface: revenue
    * per region where the customer and supplier share a nation. Six-way
    * join — exercises Catalyst join reordering/broadcast selection on
    * the SQL entry path (the identical statement runs on the oracle). */
  val q5Sql: String =
    """SELECT r_name,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2)
      |    AS DOUBLE) AS revenue,
      |  count(*) AS n_lineitems
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin

  def regionRevenueSql(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(q5Sql)
  }

  /** TPC-H Q9-shaped: amount per nation × year with a selective part
    * filter that must push down through the five-way join. */
  val q9Sql: String =
    """SELECT n_name, year(o_orderdate) AS o_year,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2)
      |    AS DOUBLE) AS amount
      |FROM part
      |JOIN lineitem ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY n_name, year(o_orderdate)
      |ORDER BY n_name, o_year""".stripMargin

  def nationProfitSql(spark: SparkSession, dir: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(q9Sql)
  }
}
