package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.Rounding.exactRound

/** Core relational exemplars for the driver's oracle harness.
  *
  * Each method mirrors an operator family from SURVEY.md §2 (aggregations
  * A2/A3/A6, joins J1–J6, windows W2/W5/W6) expressed over the synthetic
  * star schema. Outputs are oracle-stable: money aggregates accumulate in
  * DECIMAL (the source doubles are exact 2-decimal values, so the cast is
  * lossless and the sum is order-independent — double summation noise at
  * 1e7 magnitudes reaches the penny and would flip a hash compare),
  * every result carries a deterministic total order, and computed columns
  * are aliased identically to the DuckDB SQL.
  *
  * Scale notes: all aggregates are partial+final hash aggregates (one
  * shuffle on the group keys); dimension joins broadcast; window queries
  * shuffle once on the partition key. No driver-side collection anywhere.
  */
object CoreQueries {

  /** Lossless money cast: inputs are exact 2-decimal doubles. */
  private def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact, order-independent money sum surfaced as double. */
  private def moneySum(c: Column): Column =
    round(sum(money(c)), 2).cast("double")

  /** A2-style pricing summary (cf. reference silver_case_summaries.sql:7-21
    * groupBy+multi-agg shape). One shuffle; partial aggregation map-side. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        round(sum(money(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(4, 2)) - money(col("l_discount")))), 2)
          .cast("double").as("sum_disc_price"),
        exactRound(sum(col("l_quantity")) / count(lit(1)), 4).as("avg_qty"),
        exactRound(sum(money(col("l_discount"))).cast("double") / count(lit(1)), 4)
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** A3 conditional-count pivot (reference silver_case_summaries.sql:23-33:
    * COUNT(CASE WHEN role=… THEN 1 END) per group). */
  def orderPriorityPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("finished_count"),
        count(when(col("o_orderstatus") === "O", 1)).as("open_count"),
        count(when(col("o_orderstatus") === "P", 1)).as("pending_count"),
        moneySum(col("o_totalprice")).as("total_price"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  /** J3 broadcast dimension chain (reference gold_speaker_analytics.sql:31-37
    * small-dim join): customer → nation → region, both dims broadcast. */
  def regionRollup(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(spark, dir)
    val nation   = Tables.nation(spark, dir)
    val region   = Tables.region(spark, dir)
    customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        moneySum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy(col("r_name"))
  }

  /** J4 inner equi-join + A6-style derived metrics: order revenue by
    * status × month. Lineitem is pre-aggregated per order key BEFORE the
    * join so the join input shrinks (at 100 TB this is the difference
    * between shuffling 6B rows and 1.5B). */
  def revenueByStatusMonth(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val perOrder = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(money(col("l_extendedprice")) *
        (lit(1).cast(DecimalType(4, 2)) - money(col("l_discount")))).as("revenue"))
    orders
      .join(perOrder, orders("o_orderkey") === perOrder("l_orderkey"))
      // to_date: DuckDB's date_trunc('month') yields DATE — match it.
      .groupBy(col("o_orderstatus"),
        to_date(date_trunc("month", col("o_orderdate"))).as("order_month"))
      .agg(
        round(sum(col("revenue")), 2).cast("double").as("sum_revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"), col("order_month"))
  }

  /** J5 anti-join (reference incremental skip, ingest/main.py:198-201):
    * customers with no urgent order, rolled up by segment. The urgency
    * filter is applied on the right side BEFORE the join (pushdown). */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** J6 semi-join (reference representative lookup, viz helpers.py:164-186). */
  def customersWithOrders(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir).select(col("o_custkey"))
    customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** W5 rank-based top-k per group (reference top-5 neighbors,
    * clustering/helpers.py:185-226): top-3 lineitems per supplier by
    * price, deterministic tie-break. One shuffle on l_suppkey. */
  def top3PerSupplier(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy(col("l_suppkey"), col("rn"))
  }

  /** W5 again, through the custom TopKPerGroup operator
    * (graft.plans): identical semantics and oracle as
    * [[top3PerSupplier]], but the physical plan is
    * PartialTopK → Exchange → FinalTopK — map-side bounded heaps
    * instead of a full per-group window sort. */
  def top3PerSupplierCustom(spark: SparkSession, dir: String): DataFrame =
    graft.ops.TopK.perGroup(
      Tables.lineitem(spark, dir)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice")),
      Seq("l_suppkey"),
      Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)),
      k = 3, rankName = "rn")
      .orderBy(col("l_suppkey"), col("rn"))

  /** A1's HAVING shape (clustering/helpers.py:18-43 HAVING COUNT >= 1,
    * made selective): suppliers with more than 620 lineitems (above-average at every SF). Post-agg
    * filter — Catalyst runs it after the partial/final aggregate. */
  def bigSuppliers(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_items"),
        moneySum(col("l_extendedprice")).as("total_price"))
      .filter(col("n_items") > 620)
      .orderBy(col("l_suppkey"))

  /** F11 date arithmetic: event age in days from the epoch of the
    * dataset, rolled up. */
  def eventAgeHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(datediff(to_date(col("ts")), to_date(lit("2024-01-01")))
        .cast("long").as("days_since"))
      .groupBy(col("days_since"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("days_since"))

  /** ROLLUP subtotals (grouping-sets family — absent from the
    * reference, standard OLAP surface): revenue by (returnflag,
    * linestatus) with per-flag subtotals and a grand total. NULL
    * markers in subtotal rows follow the SQL standard on both engines. */
  def revenueRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(moneySum(col("l_extendedprice")).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** q20 — explicit GROUPING SETS: the irregular set list
    * ((flag, status), (flag), (status)) that neither ROLLUP (q13) nor
    * CUBE (q14) can express — per-cell grouping flags emitted as
    * GROUPING(col) bits (portable across engines, unlike the packed
    * grouping_id bit order). Same one-shuffle expanded-aggregate plan
    * shape as rollup/cube. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("q20_lineitem")
    spark.sql("""
      SELECT l_returnflag, l_linestatus,
        CAST(grouping(l_returnflag) AS INT) AS g_flag,
        CAST(grouping(l_linestatus) AS INT) AS g_status,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
        count(1) AS n
      FROM q20_lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                              (l_returnflag), (l_linestatus))
      ORDER BY g_flag, g_status,
        l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
  }

  /** CUBE grouping sets (all 2^2 combinations — completes the
    * grouping-sets family next to q13's ROLLUP): order counts and
    * revenue by every (status, priority) slice. */
  def revenueCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(moneySum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** UNPIVOT (wide → long): q2's per-status counts melted back into
    * (priority, status_name, n) rows via the melt/unpivot operator —
    * the inverse of the pivot family. Narrow, no shuffle beyond q2's. */
  def priorityUnpivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("finished"),
        count(when(col("o_orderstatus") === "O", 1)).as("open"),
        count(when(col("o_orderstatus") === "P", 1)).as("pending"))
    wide.unpivot(
      Array(col("o_orderpriority")),
      Array(col("finished"), col("open"), col("pending")),
      "status_name", "n")
      .orderBy(col("o_orderpriority"), col("status_name"))
  }

  /** Rank-statistics windows (percent_rank / cume_dist / dense_rank),
    * partitioned by return flag — never a global window. Exact rational
    * arithmetic on both engines: the outputs are ratios of counts, so
    * no rounding is needed. */
  def priceRankStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") < 10)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        dense_rank().over(w).cast("long").as("drank"))
      .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
  }

  /** Exact median / percentiles per group (beyond the reference's
    * surface — it has no percentile anywhere; a complete engine does).
    * `percentile` is exact with linear interpolation, matching DuckDB's
    * quantile_cont. */
  def quantitySummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** lag/ntile analytics (SURVEY notes the reference uses no
    * frame-spec'd analytic functions — provided for completeness):
    * per-customer days since previous order + order-value quartile.
    *
    * The quartile is an exact DISTRIBUTED ntile — `ntile(k).over(Window
    * .orderBy(...))` routes every row through one partition, Spark's
    * classic scale-killer. Instead: range-repartition on the sort key,
    * sort within partitions, take the partition-local position from
    * `monotonically_increasing_id` (its low 33 bits are a per-partition
    * counter in iteration order — zero windows, pure codegen), turn it
    * into a global rank with per-partition offsets (a ~numPartitions-row
    * aggregate broadcast back), and derive the bucket from ntile's size
    * formula. One eagerly-materialized range shuffle total; at 100 TB
    * swap the localCheckpoint for two deterministic passes (range
    * partitioning + in-partition sort are deterministic) or a DISK_ONLY
    * persist. */
  def orderGaps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 4
    val lagW = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val base = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        datediff(to_date(col("o_orderdate")),
          to_date(lag(col("o_orderdate"), 1).over(lagW)))
          .cast("long").as("days_since_prev"))
    val nParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val withId = base
      .repartitionByRange(nParts, col("o_totalprice"), col("o_orderkey"))
      .sortWithinPartitions(col("o_totalprice"), col("o_orderkey"))
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33).cast("int"))
      .withColumn("__rn", col("__mid").bitwiseAND(lit((1L << 33) - 1)) + 1)
      .localCheckpoint() // counts + final pass read one materialization
    val counts = withId.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = counts.map(_._2).sum
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val o = (pid, acc); acc += c; o }
    val offDf = offsets.toSeq.toDF("__pid", "__offset")
    // ntile sizing: first (n mod k) buckets hold ceil(n/k) rows
    val q = n / k; val rem = n % k
    val rank = col("__offset") + col("__rn")
    val bucket =
      if (rem == 0) ceil(rank / lit(q))
      else when(rank <= lit(rem * (q + 1)), ceil(rank / lit(q + 1)))
        .otherwise(lit(rem) + ceil((rank - lit(rem * (q + 1))) / lit(q)))
    withId.join(broadcast(offDf), Seq("__pid"))
      .select(col("o_custkey"), col("o_orderkey"), col("days_since_prev"),
        bucket.cast("int").as("value_quartile"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** As-of join exemplar (ops.TemporalJoins.asOf): each click event
    * enriched with the user's most recent prior (or simultaneous) view
    * event — point-in-time-correct enrichment, one shuffle on user_id,
    * no range-join blowup. Matches DuckDB `ASOF LEFT JOIN` exactly. */
  def clickPriorView(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
        col("event_id").as("view_id"), col("value").as("view_value"))
    graft.ops.TemporalJoins.asOf(clicks, views, "user_id", "ts",
        payload = Seq("view_id", "view_value"))
      .select(col("user_id"), col("event_id"),
        col("prior_view_id"), col("prior_view_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** w9 — FORWARD as-of: the first view at-or-after each click per
    * user (ops.TemporalJoins.asOfForward — "next snapshot after the
    * event"). Same one-shuffle union-tag shape as w8, scanned in
    * descending time order; oracle is DuckDB ASOF with the inequality
    * flipped. */
  def clickNextView(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
        col("event_id").as("view_id"), col("value").as("view_value"))
    graft.ops.TemporalJoins.asOfForward(clicks, views, "user_id", "ts",
        payload = Seq("view_id", "view_value"))
      .select(col("user_id"), col("event_id"),
        col("next_view_id"), col("next_view_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** w15 — tolerance-bounded as-of (ops.TemporalJoins.asOfWithin,
    * pandas merge_asof(tolerance=...) semantics): prior view per
    * click, but only when at most 10 minutes stale — older matches
    * null out exactly as if absent. Oracle is DuckDB ASOF with a CASE
    * freshness guard on the matched timestamp; agreement proves the
    * post-filtered single-winner formulation exact. */
  def clickFreshPriorView(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
        col("event_id").as("view_id"), col("value").as("view_value"))
    graft.ops.TemporalJoins.asOfWithin(clicks, views, "user_id", "ts",
        payload = Seq("view_id", "view_value"), toleranceSeconds = 600L)
      .select(col("user_id"), col("event_id"),
        col("prior_view_id"), col("prior_view_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** The third deterministic snapshot for the SCD2 history: from v1
    * ([[derivedNewSnapshot]]), every 11th key deleted, every remaining
    * 3rd key's balance bumped by 50. */
  private[graft] def derivedThirdSnapshot(v1: DataFrame): DataFrame =
    v1.filter(col("c_custkey") % 11 =!= 0)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 3 === 0, col("c_acctbal") + 50.0)
          .otherwise(col("c_acctbal")))

  /** cdc2 — SCD Type-2 history build (ops.Scd.scd2): three
    * deterministic customer snapshots (v0 = customer, v1 = cdc1's
    * derived dump, v2 = a further delete/bump pass) fold into the
    * validity-interval dimension. The oracle rebuilds the identical
    * snapshots and replays the segment logic with lag/sum windows over
    * actual VALUES while the Spark side segments by xxhash64 digest —
    * agreement proves digest change-detection exact on real data (the
    * cdc1 proof, extended to interval assembly: gaps close intervals,
    * reappearances open new ones, last-snapshot rows stay open). */
  def scd2History(spark: SparkSession, dir: String): DataFrame =
    scd2Dim(spark, dir).orderBy(col("c_custkey"), col("valid_from"))

  /** The cdc2 SCD2 dimension (unordered) — shared by cdc2, the w17
    * point-in-time join and the st12 streaming SCD2 face's oracle. */
  private[graft] def scd2Dim(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("c_custkey", "c_acctbal", "c_mktsegment")
    val v0 = Tables.customer(spark, dir).select(cols.map(col): _*)
    val v1 = derivedNewSnapshot(Tables.customer(spark, dir))
      .select(cols.map(col): _*)
    val v2 = derivedThirdSnapshot(v1)
    graft.ops.Scd.scd2(Seq(v0, v1, v2),
      keyCols = Seq("c_custkey"), valueCols = Seq("c_acctbal", "c_mktsegment"))
  }

  /** The three cdc2 snapshots as one (key, values, __ver) stream
    * frame — what the st12 streaming face stages as version-ordered
    * micro-batch files. */
  private[graft] def scd2SnapshotStream(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("c_custkey", "c_acctbal", "c_mktsegment")
    val v0 = Tables.customer(spark, dir).select(cols.map(col): _*)
    val v1 = derivedNewSnapshot(Tables.customer(spark, dir))
      .select(cols.map(col): _*)
    val v2 = derivedThirdSnapshot(v1)
    Seq(v0, v1, v2).zipWithIndex
      .map { case (df, i) => df.withColumn("__ver", lit(i)) }
      .reduce(_ unionByName _)
  }

  /** w17 — POINT-IN-TIME dimension join (ops.Scd.pointInTimeJoin):
    * each order, assigned a deterministic snapshot version
    * (o_orderkey % 3), is enriched with the customer dim row whose
    * cdc2 SCD2 validity interval CONTAINS that version — the
    * effective-dated lookup every warehouse and every point-in-time-
    * correct training pipeline runs against a Type-2 dimension.
    * Orders whose customer had no interval at their version (deleted
    * at v2, or a v1-born key queried at v0) fall out as a NONE
    * segment — the left-join semantics the oracle replays. One
    * equi-join shuffle on the key; interval containment rides as a
    * residual hash-join predicate (never a range explosion). */
  def pointInTimeRollup(spark: SparkSession, dir: String): DataFrame = {
    val fact = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey").as("c_custkey"),
        (col("o_orderkey") % 3).cast("int").as("ver"))
    graft.ops.Scd.pointInTimeJoin(fact, scd2Dim(spark, dir),
        keyCols = Seq("c_custkey"), verCol = "ver")
      .groupBy(col("ver"), coalesce(col("c_mktsegment"), lit("NONE")).as("segment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(money(col("c_acctbal"))), 2).cast("double").as("sum_acctbal"))
      .orderBy(col("ver"), col("segment"))
  }

  /** j8 — Bloom-pruned fact-dimension join
    * (ops.ScalePatterns.bloomPrunedJoin): lineitem is pruned against a
    * one-pass Bloom sketch of the selective order subset BEFORE any
    * join shuffle — the explicit form of semi-join reduction. The
    * sketch admits false positives only, and the join removes those,
    * so the oracle is simply the plain SQL join: byte-equality IS the
    * no-false-negatives proof. */
  def bloomPrunedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 150000.0)
      .select(col("o_orderkey").as("l_orderkey"),
        to_date(date_trunc("month", col("o_orderdate"))).as("order_month"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), money(col("l_extendedprice")).as("ep"),
        money(col("l_discount")).as("dc"))
    graft.ops.ScalePatterns
      .bloomPrunedJoin(li, urgent, "l_orderkey", expectedItems = 100000L)
      .groupBy(col("order_month"))
      .agg(
        round(sum(col("ep") * (lit(1).cast(DecimalType(4, 2)) - col("dc"))), 2)
          .cast("double").as("sum_revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("order_month"))
  }

  /** j12 — salted skew join (ops.SkewJoin.saltedJoin): the manual
    * hot-key split, run 8-way over orders ⋈ customer and rolled up per
    * market segment. Salting is semantics-invisible — each fact row
    * meets its dim row in exactly one salt lane — so the oracle is the
    * PLAIN SQL join: byte-equality proves the salt changed the
    * partitioning, not the answer (the j8/j9 oracle pattern). The
    * skew-splitting property itself (hot key's rows spread ≈ evenly
    * across lanes, plain join concentrates them in one) is
    * SkewJoinSpec's planted-fixture assertion. */
  def saltedSegmentRollup(spark: SparkSession, dir: String): DataFrame = {
    val fact = Tables.orders(spark, dir)
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"),
        money(col("o_totalprice")).as("tp"))
    val dim = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    graft.ops.SkewJoin.saltedJoin(fact, dim, "c_custkey", "o_orderkey",
        salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("tp")), 2).cast("double").as("sum_totalprice"))
      .orderBy(col("c_mktsegment"))
  }

  /** j9 — bucketed co-located fact join: both fact tables are written
    * ONCE per process as bucketed catalog tables keyed on the join
    * column (etl.Sinks.writeBucketed — the 100 TB warehouse layout),
    * and the query then equi-joins them with ZERO exchanges before the
    * final single-column aggregate (executed-plan-asserted in
    * BucketedJoinSpec; the `merge` hint pins the sort-merge path so
    * the zero-shuffle property is the bucketing's, not a broadcast
    * estimate's). The build cost is paid at table-creation time,
    * exactly like s1b's persisted ANN index; the measured entry is the
    * steady-state co-located join a warehouse runs thousands of times
    * over one layout. Oracle: the plain SQL join — byte-equality
    * proves the bucketed layout changes the PLAN, not the answer. */
  def bucketedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val (ot, lt) = bucketedTables.getOrElseUpdate(dir, {
      val tag = java.lang.Integer.toHexString(dir.hashCode)
      val ot = s"graft_b_orders_$tag"; val lt = s"graft_b_lineitem_$tag"
      graft.etl.Sinks.writeBucketed(
        Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderstatus")),
        ot, 16, Seq("o_orderkey"), Seq("o_orderkey"))
      graft.etl.Sinks.writeBucketed(
        Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_quantity"),
          money(col("l_extendedprice")).as("ep")),
        lt, 16, Seq("l_orderkey"), Seq("l_orderkey"))
      (ot, lt)
    })
    spark.table(ot).hint("merge")
      .join(spark.table(lt), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("ep")), 2).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  private val bucketedTables =
    scala.collection.concurrent.TrieMap[String, (String, String)]()

  /** w10 — keyless range join (ops.TemporalJoins.binnedIntervalJoin):
    * error activity inside the 30-minute window after each of the 25
    * largest purchases. No shared key exists between the sides — pure
    * interval containment — which Spark would otherwise plan as a
    * nested-loop join; the 10-minute binning makes it a bin equi-join
    * (each window covers 4 bins). Windows with no errors survive via
    * the left join; `max` is the float-safe aggregate (association-
    * order independent, unlike a double sum). */
  def purchaseWindowErrors(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val anchors = ev.filter(col("event_type") === "purchase")
      .orderBy(col("value").desc_nulls_last, col("event_id"))
      .limit(25)
      .select(col("event_id").as("anchor_id"),
        col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts"), col("value"))
    val perWindow = graft.ops.TemporalJoins
      .binnedIntervalJoin(errors, "ts", anchors, "w_start", "w_end",
        binSeconds = 600)
      .groupBy(col("anchor_id"))
      .agg(count(lit(1)).as("n_errors"), max(col("value")).as("max_err_value"))
    anchors.join(perWindow, Seq("anchor_id"), "left")
      .select(col("anchor_id"),
        coalesce(col("n_errors"), lit(0L)).as("n_errors"),
        col("max_err_value"))
      .orderBy(col("anchor_id"))
  }

  /** u2 — sequential conversion funnel: signup → view → click →
    * purchase, each stage's first event must be at-or-after the
    * previous stage's. Four chained per-user window minima share ONE
    * user-id exchange (same partitioning, unordered frames — no
    * per-window sort), then a single global distinct-count row. */
  def conversionFunnel(spark: SparkSession, dir: String): DataFrame = {
    val wU = Window.partitionBy(col("user_id"))
    def firstAtOrAfter(tpe: String, lower: Column): Column =
      min(when(col("event_type") === tpe && col("ts") >= lower, col("ts")))
        .over(wU)
    Tables.events(spark, dir)
      .withColumn("s",
        min(when(col("event_type") === "signup", col("ts"))).over(wU))
      .withColumn("v", firstAtOrAfter("view", col("s")))
      .withColumn("c", firstAtOrAfter("click", col("v")))
      .withColumn("p", firstAtOrAfter("purchase", col("c")))
      .agg(
        countDistinct(when(col("s").isNotNull, col("user_id"))).as("n_signup"),
        countDistinct(when(col("v").isNotNull, col("user_id"))).as("n_view"),
        countDistinct(when(col("c").isNotNull, col("user_id"))).as("n_click"),
        countDistinct(when(col("p").isNotNull, col("user_id"))).as("n_purchase"))
  }

  /** u5 — time-constrained window funnel (ClickHouse windowFunnel
    * semantics, per user): view → click → purchase where each step
    * must follow its predecessor within 1 hour. Built by CHAINING two
    * tolerance as-of joins (w15's operator): a click qualifies when
    * its latest at-or-before view is ≤ 1 h stale; a purchase
    * qualifies when its latest at-or-before QUALIFYING click is ≤ 1 h
    * stale. Post-filtering the single as-of winner is exact at every
    * stage (earlier candidates are staler), so the funnel needs no
    * per-user sequence scan — just keyed single-shuffle joins, each
    * AQE-skew-splittable. Returns per-user step counts and the
    * deepest level reached (0–3). */
  def windowFunnelLevels(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("v_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"), col("ts"))
    val qc = graft.ops.TemporalJoins.asOfWithin(clicks, views,
        "user_id", "ts", Seq("v_id"), toleranceSeconds = 3600L)
      .filter(col("prior_v_id").isNotNull)
      .select(col("user_id"), col("c_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts"))
    val qp = graft.ops.TemporalJoins.asOfWithin(purchases, qc,
        "user_id", "ts", Seq("c_id"), toleranceSeconds = 3600L)
      .filter(col("prior_c_id").isNotNull)
      .select(col("user_id"), col("p_id"))
    ev.groupBy(col("user_id"))
      .agg(count(when(col("event_type") === "view", 1)).as("n_views"))
      .join(qc.groupBy(col("user_id"))
        .agg(count(lit(1)).as("__nqc")), Seq("user_id"), "left")
      .join(qp.groupBy(col("user_id"))
        .agg(count(lit(1)).as("__nqp")), Seq("user_id"), "left")
      .select(col("user_id"), col("n_views"),
        coalesce(col("__nqc"), lit(0L)).as("n_qual_clicks"),
        coalesce(col("__nqp"), lit(0L)).as("n_qual_purchases"),
        when(coalesce(col("__nqp"), lit(0L)) > 0, 3)
          .when(coalesce(col("__nqc"), lit(0L)) > 0, 2)
          .when(col("n_views") > 0, 1)
          .otherwise(0).as("funnel_level"))
      .orderBy(col("user_id"))
  }

  /** u3 — cohort retention: users grouped by first-seen day, activity
    * counted per day offset. One per-user window min + one aggregate. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val wU = Window.partitionBy(col("user_id"))
    Tables.events(spark, dir)
      .withColumn("day", to_date(col("ts")))
      .withColumn("cohort", min(col("day")).over(wU))
      .groupBy(col("cohort"),
        datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  /** W2 running total (reference running char offsets,
    * transformers/helpers.py:164-175): cumulative order value per
    * customer in date order. DECIMAL accumulation keeps the running sum
    * independent of the engine's window-aggregation association order. */
  def runningOrderTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(sum(money(col("o_totalprice"))).over(w), 2).cast("double")
          .as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** w11 — BATCH sessionization, the batch face of st2's streaming
    * session windows: a session breaks when the gap to the user's
    * previous event exceeds 30 minutes. ONE shuffle total: the lag /
    * running-sum window partitions by user_id, and the session
    * aggregate's (user_id, session_idx) key is a refinement of that
    * partitioning, so AQE/EnsureRequirements reuses the exchange. Gap
    * arithmetic is in epoch MICROSECONDS (unix_micros vs the oracle's
    * epoch_us) — second-truncated arithmetic would mis-break sessions
    * whose gap straddles 1800s at sub-second precision. At 100 TB the
    * events table is date-partitioned and users don't span shards, so
    * the one exchange is bounded by the day's data, not history. */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionizeEvents(Tables.events(spark, dir), gapUs = 1800L * 1000000L)

  /** The operator body, parameterized for tests: `events` needs
    * (user_id, event_id, ts). */
  def sessionizeEvents(events: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("ts"), unix_micros(col("ts")).as("us"))
      .withColumn("new_sess",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("duration_us"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** w16 — hopping (sliding) window aggregation: 60-minute windows
    * every 30 minutes over the event stream, in batch, via Spark's
    * native `window(ts, size, slide)` — each event lands in
    * size/slide = 2 windows (an explode-free native expansion), then
    * one ordinary partial+final aggregate on (window, type). The
    * same expression drives the streaming face of windowed aggs, so
    * the batch oracle doubles as the streaming-semantics contract.
    * Oracle replays the hop assignment: the two epoch-aligned
    * 30-minute buckets at and before each event's own bucket. */
  def hoppingWindowCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "60 minutes", "30 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        moneySum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))

  /** j10 — fuzzy (edit-distance <= 1) self-join over customer names
    * (ops.FuzzyJoin.editDistanceJoin): deletion-neighborhood blocking
    * on 8-byte key hashes + levenshtein verification, never the
    * quadratic all-pairs pass. The oracle IS the quadratic all-pairs
    * pass (DuckDB can afford it at sf0.01) — byte-equality against it
    * is the blocking-completeness proof on real data. */
  def fuzzyNameJoin(spark: SparkSession, dir: String): DataFrame =
    graft.ops.FuzzyJoin.editDistanceJoin(
        Tables.customer(spark, dir), "c_custkey", "c_name", maxDist = 1)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
      .orderBy(col("id_a"), col("id_b"))

  /** c4 — entity-resolution capstone: the record-linkage pipeline a
    * training-data build runs to canonicalize authors/sources before
    * per-entity mixing caps. Three verified stages composed in ONE
    * plan: (1) candidate pairs from the deletion-neighborhood fuzzy
    * join (ops.FuzzyJoin — 8-byte-key blocking, never all-pairs),
    * (2) conjunctive attribute agreement (same segment AND nation —
    * the standard ER guard against transitive over-merging; name
    * similarity alone chains digit-adjacent synthetic names into
    * blobs) folded INTO the blocking key via `blockCols`, so
    * disagreeing rows never meet in the candidate join,
    * (3) distributed min-label components with pointer
    * jumping (ops.Dedup.connectedComponents, O(log diameter) rounds),
    * folded to one canonical record per entity (id = min member key,
    * canonical name = that member's, DECIMAL-exact balance rollup).
    * The oracle replays all three stages, components via recursive
    * CTE — byte-equality proves blocking completeness AND the
    * component fold on real data. */
  def entityResolution(spark: SparkSession, dir: String): DataFrame =
    entityResolutionFrom(Tables.customer(spark, dir))

  /** The c4 pipeline over an explicit customer frame (spec'd against
    * the id-level formulation on a mass-duplicated fixture).
    *
    * Scale restructure: the corpus collapses to DISTINCT (name,
    * segment, nation) representatives BEFORE any pairwise machinery.
    * Real registries carry the same entity string many times (one row
    * per crawl/source), and id-level pair expansion is QUADRATIC in
    * that multiplicity — measured: at sf10's 100 copies/name the
    * id-level graph has 94.65M agreeing pairs (2.70B unblocked
    * candidates) and OOMs the component stage, while connectivity
    * only needs one node per distinct string: equal-string ids are a
    * clique, so collapsing them into their min-id representative
    * leaves the component structure — and therefore every entity —
    * unchanged. Members re-attach by COUNT (sum of per-rep
    * multiplicities), so nothing id-pair-sized ever materializes;
    * exact-duplicate groups with no fuzzy neighbor (cliques that were
    * pairs-only in the id graph) come back via the n_ids >= 2
    * singles branch. */
  private[graft] def entityResolutionFrom(c: DataFrame): DataFrame = {
    // one row per distinct (name, block): representative id, member
    // count, DECIMAL-exact balance partial
    val reps = c.groupBy(col("c_name"), col("c_mktsegment"),
        col("c_nationkey"))
      .agg(min(col("c_custkey")).as("rep_id"),
        count(lit(1)).as("n_ids"),
        sum(money(col("c_acctbal"))).as("bal_sum"))
      .localCheckpoint() // three consumers below
    // attributes ride in the BLOCKING key (hashed into the candidate
    // key), so disagreeing rows never meet: 262.5k candidate pairs →
    // 2.3k at sf0.1, the fuzzy stage 10.3 s → ~1 s
    val pairs = graft.ops.FuzzyJoin.editDistanceJoin(
        reps, "rep_id", "c_name", maxDist = 1,
        blockCols = Seq("c_mktsegment", "c_nationkey"))
      .select(col("id_a"), col("id_b"))
    val comp = graft.ops.Dedup.connectedComponents(pairs, "id_a", "id_b")
    val linked = comp
      .join(reps, col("node") === col("rep_id"))
      .groupBy(col("component").as("entity_id"))
      .agg(sum(col("n_ids")).as("n_members"),
        round(sum(col("bal_sum")), 2).cast("double").as("total_acctbal"))
    val singles = reps.filter(col("n_ids") >= 2)
      .join(comp.select(col("node").as("rep_id")), Seq("rep_id"), "left_anti")
      .select(col("rep_id").as("entity_id"), col("n_ids").as("n_members"),
        round(col("bal_sum"), 2).cast("double").as("total_acctbal"))
    linked.unionByName(singles)
      .join(c.select(col("c_custkey"), col("c_name")),
        col("entity_id") === col("c_custkey"))
      .select(col("entity_id"), col("c_name").as("canonical_name"),
        col("n_members"), col("total_acctbal"))
      .orderBy(col("entity_id"))
  }

  /** pr1 — PageRank (ops.PageRank.ranks) over the customer↔supplier
    * trade graph (distinct (o_custkey, l_suppkey) pairs via
    * orders⋈lineitem, suppliers offset into a disjoint id range,
    * edges in both directions): top-20 nodes by centrality. Three
    * rounds, ranks quantized to the 1e-9 grid each round — the same
    * trick that makes km1/svd1 oracle-exact, applied to graph
    * iteration. */
  def pagerankTop(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("c"),
        (lit(1000000L) + col("l_suppkey")).as("s"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
    // pairs is distinct and the two directed copies live in disjoint
    // id ranges, so the edge list is distinct by construction
    graft.ops.PageRank.ranks(edges, "src", "dst", iters = 3,
        assumeDistinct = true)
      .orderBy(col("rank").desc, col("node"))
      .limit(20)
  }

  /** pr2 — PERSONALIZED PageRank (ops.PageRank.personalizedRanks)
    * over pr1's trade graph: restart mass concentrated on nation-7
    * customers, dangling mass teleporting back to the seeds — the
    * whitelist-conditioned importance ranking a corpus build uses to
    * weight sources against a trusted domain set. Same quantized
    * three-round replay as pr1; the oracle rebuilds the seed
    * distribution (renormalized over seeds present in the graph) and
    * unrolls the personalized update. */
  def personalizedPagerankTop(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("c"),
        (lit(1000000L) + col("l_suppkey")).as("s"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
    val seeds = Tables.customer(spark, dir)
      .filter(col("c_nationkey") === 7)
      .select(col("c_custkey").as("node"))
    graft.ops.PageRank.personalizedRanks(edges, "src", "dst",
        seeds, "node", iters = 3, assumeDistinct = true)
      .orderBy(col("rank").desc, col("node"))
      .limit(20)
  }

  /** w14 — trailing RANGE-frame window: for every event, the count and
    * value sum of the same user's events in the trailing hour — a
    * VALUE-range frame (microsecond range predicate), not a row frame:
    * how many rows fall in the hour varies per row, the feature row
    * frames (q8/q12) cannot express. DECIMAL accumulation keeps the
    * sliding sum order-independent. */
  def trailingHourWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("__us"))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(spark, dir)
      .withColumn("__us", unix_micros(col("ts")))
      .withColumn("__v", col("value").cast(DecimalType(18, 2)))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", sum(col("__v")).over(w).cast("double"))
      .select(col("event_id"), col("user_id"), col("n_1h"), col("sum_1h"))
      .orderBy(col("event_id"))
  }

  /** w13 — time-gap throttle dedup: drop an event when the SAME
    * (user, type) fired within the preceding hour (the
    * bot-double-fire / retry-storm cleanup; the batch face of the
    * streaming watermark dedup, with lag-gap semantics — each event
    * compares to its immediate predecessor, kept or not). One
    * partitioned window, exact integer microsecond arithmetic; the
    * 1-hour gap sits at ~p2 of the fixture's same-key gaps, so real
    * rows drop at every sf. Output: per event type, kept vs dropped
    * counts. */
  def throttleDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("__us", unix_micros(col("ts")))
      .withColumn("__gap", col("__us") - lag(col("__us"), 1).over(w))
      .withColumn("__keep", col("__gap").isNull || col("__gap") > lit(3600000000L))
      .groupBy(col("event_type"))
      .agg(count(when(col("__keep"), 1)).as("n_kept"),
        count(when(!col("__keep"), 1)).as("n_dropped"))
      .orderBy(col("event_type"))
  }

  /** w12 — recency-weighted activity (ops.Recency.ewmaLastK): per-user
    * EWMA of event values over the 20 most recent events, the
    * "sequential" recurrence closed into one rank-filtered weighted
    * sum. Decay coefficients are a driver-computed literal table
    * shared with the oracle (no engine pow()), so the only float op
    * is the bounded 20-term sum (6dp grid). */
  def userEwma(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Recency.ewmaLastK(Tables.events(spark, dir),
        "user_id", "ts", "event_id", "value")
      .select(col("user_id"), col("n_recent"),
        exactRound(col("ewma"), 6).as("ewma"))
      .orderBy(col("user_id"))

  /** tc1 — per-node triangle counts ([[graft.ops.Triangles]], degree
    * orientation) over the supplier co-occurrence graph: suppliers
    * joined by appearing in the same order, thresholded to the top-20%
    * of pairs by co-occurrence count (ties included — an integer-exact,
    * scale-adaptive sparsifier; the raw projection is complete at every
    * sf). The single driver-held value is the pair-count scalar that
    * sizes the top-k cut (the Bpe.train argmax pattern); top-20 nodes
    * by triangle membership. */
  def triangleCounts(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Triangles.perNode(supplierCoEdges(spark, dir), "u", "v",
        assumeDistinct = true)
      .orderBy(col("n_tri").desc, col("node"))
      .limit(20)

  /** tc2 — INCREMENTAL per-node triangle counts against the
    * BUCKET-PARTITIONED adjacency store
    * (ops.Triangles.mergeTriangleCountsBucketed): the graph family's
    * store face. The sparsified supplier graph's edges arrive in two
    * batches — a deterministic 10% edge slice plays the delta — and
    * the stored (node, n_tri) counts absorb it WITHOUT re-running the
    * O(m^1.5) orientation pass: new triangles are exactly those with
    * ≥ 1 novel edge, enumerated from the novel edges alone (probe
    * from the lower-degree endpoint, close against the updated edge
    * set, dedup by sorted triple). The edge store is partitioned by
    * endpoint hash bucket, so every per-merge READ — novelty, degree,
    * closure — prunes to the delta endpoints' bucket dirs instead of
    * scanning the accumulated edge set (r13: the d6c write discipline
    * applied to reads). The identity triangles(E ∪ D) = triangles(E)
    * ⊎ {≥1-D-edge triangles} makes stored + increments equal a full
    * recount bit-for-bit, so tc2 gates on tc1's oracle VERBATIM. At
    * 10¹¹ edges the daily cost is Σ min-degree over the delta, not
    * the corpus. */
  def triangleCountsIncremental(spark: SparkSession, dir: String): DataFrame = {
    val edges = supplierCoEdges(spark, dir).localCheckpoint()
    // Delta fraction knob (measurement only): the merged counts cover
    // base ∪ delta = ALL edges whichever way the split falls, so the
    // result — and the oracle — are split-invariant; the knob exists
    // so the bench can price the merge across delta densities (10%
    // default → 0.1%), the axis the bucket-pruned reads scale on.
    val deltaMod = sys.env.get("SPARK_GRAFT_TRI_DELTA_MOD")
      .map(_.toLong).getOrElse(10L)
    val isDelta = pmod(col("u") * 31 + col("v"), lit(deltaMod)) === 3
    val p = triStoreCache.getOrElseUpdate(dir, {
      val t = java.nio.file.Files.createTempDirectory("graft_tri_store").toString
      val base = edges.filter(!isDelta).localCheckpoint()
      graft.ops.Triangles.writeEdgeStore(base, "u", "v", s"$t/edges")
      graft.ops.Triangles.perNode(base, "u", "v", assumeDistinct = true)
        .write.parquet(s"$t/tri")
      t
    })
    graft.ops.Triangles.mergeTriangleCountsBucketed(
        spark.read.parquet(s"$p/tri"), s"$p/edges",
        edges.filter(isDelta), "u", "v", assumeNormalized = true)
      .orderBy(col("n_tri").desc, col("node"))
      .limit(20)
  }

  private val triStoreCache = StoreCaches.register("tc2_triangle_store")

  /** tc2b — the SPARSE-regime face of the adaptive bucketed merge
    * (ops.Triangles.readAdjForDeltaAdaptive): tc2 with the default
    * data-sized bucket floor (8) sees every delta touch every bucket,
    * so the driver gate would only ever exercise the dense a<b-half
    * read; here the store is built with 64 buckets and the delta is
    * the 8 lexicographically-first edges — ≤ 16 touched buckets, under
    * the [[graft.ops.Triangles.DenseBucketFraction]] cut — so the
    * PRUNED read path is oracle-gated every round too (both regimes of
    * the r14 adaptive read live in CORRECTNESS, not just specs). The
    * merged counts cover base ∪ delta = ALL edges whichever path
    * serves the adjacency, so tc2b gates on tc1's oracle VERBATIM. */
  def triangleCountsIncrementalSparse(spark: SparkSession, dir: String): DataFrame = {
    val edges = supplierCoEdges(spark, dir).localCheckpoint()
    val delta = edges.orderBy(col("u"), col("v")).limit(8).localCheckpoint()
    val p = triSparseStoreCache.getOrElseUpdate(dir, {
      val t = java.nio.file.Files.createTempDirectory("graft_tri_sparse").toString
      val base = edges.join(delta, Seq("u", "v"), "left_anti").localCheckpoint()
      graft.ops.Triangles.writeEdgeStore(base, "u", "v", s"$t/edges",
        nBuckets = 64)
      graft.ops.Triangles.perNode(base, "u", "v", assumeDistinct = true)
        .write.parquet(s"$t/tri")
      t
    })
    graft.ops.Triangles.mergeTriangleCountsBucketed(
        spark.read.parquet(s"$p/tri"), s"$p/edges", delta, "u", "v",
        assumeNormalized = true)
      .orderBy(col("n_tri").desc, col("node"))
      .limit(20)
  }

  private val triSparseStoreCache =
    StoreCaches.register("tc2b_triangle_store_sparse")

  /** gc1 — k-core of the same sparsified supplier graph
    * ([[graft.ops.KCore]]): the link-pruning face of the graph family.
    * k is DATA-ADAPTIVE — max(2, ceil(0.7·avg-degree)) — because the
    * graph's density is sf-dependent (a fixed k empties the sf0.001
    * graph and is a no-op at sf0.1): at sf0.01 this lands on k = 16
    * and the peel cascades 4 genuine rounds before a 69-node core
    * stabilizes; at sf0.001, k = 2 leaves the two-triangle core. The
    * two graph-stat scalars are the only driver-held values (the
    * Bpe.train pattern). The oracle unrolls 6 peel rounds; the
    * operator's fixpoint stop makes extra budget a no-op, so the
    * replay is exact whenever the cascade fits the unroll (observed
    * max 4; spec asserts the fixpoint invariant). */
  def supplierKCore(spark: SparkSession, dir: String): DataFrame = {
    val edges = supplierCoEdges(spark, dir).localCheckpoint()
    val nE = edges.count()
    val nV = edges.select(explode(array(col("u"), col("v"))).as("nd"))
      .distinct().count()
    val k = math.max(2L, math.ceil(0.7 * (2.0 * nE / nV)).toLong).toInt
    graft.ops.KCore.kCore(edges, "u", "v", k, maxRounds = 6,
        assumeDistinct = true)
      .orderBy(col("node"))
  }

  /** Shared tc1/gc1 graph: supplier co-occurrence edges (same order),
    * sparsified to the top-20% of pairs by co-count, ties kept. The
    * threshold — the k-th-largest co-count — is read off the co-count
    * HISTOGRAM: dozens of distinct values however many pairs exist.
    * The first formulation ran orderBy(n).limit(0.2·|pairs|): a
    * TakeOrdered whose heap and driver merge grow WITH the data
    * (measured 11.6× at 10× data); the histogram is a fixed-size
    * aggregate and tc1 returned to output-bound scaling. Identical
    * semantics: thr = max v with |{n >= v}| >= ceil(0.2·|pairs|). */
  private[graft] def supplierCoEdges(spark: SparkSession, dir: String): DataFrame = {
    // r16: the (k, s)-distinct + self-join-on-k formulation paid three
    // exchanges and a join ((k,s) distinct; re-exchange on k for both
    // join sides) before the (u, v) aggregate. Per-order supplier sets
    // are inherently small (an order's line count is bounded by the
    // generator law, independent of sf), so collect the order's
    // DISTINCT suppliers in ONE exchange (collect_set subsumes the
    // distinct) and explode the sorted pairs map-side: same (u, v)
    // multiset — sort_array makes u < v per order exactly like the
    // a.s < b.s join predicate — feeding the same co-count aggregate.
    // Plan: 2 exchanges, 0 joins (was 3-4 exchanges + SortMergeJoin).
    val co = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("k"), col("l_suppkey").cast("long").as("s"))
      .groupBy(col("k")).agg(sort_array(collect_set(col("s"))).as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(posexplode(col("ss")).as(Seq("i", "u")), col("ss"))
      .select(col("u"),
        explode(slice(col("ss"), col("i") + lit(2), size(col("ss")))).as("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("n"))
      .localCheckpoint() // reused by the histogram pass and the filter
    val hist = co.groupBy(col("n")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("n").desc)
      .collect() // distinct co-count VALUES — bounded, not pair-sized
    val nPairs = hist.map(_.getLong(1)).sum
    val topK = math.ceil(0.2 * nPairs).toLong
    val thr = {
      var cum = 0L
      var t = hist.last.getLong(0)
      val it = hist.iterator
      var found = false
      while (it.hasNext && !found) {
        val r = it.next(); cum += r.getLong(1)
        if (cum >= topK) { t = r.getLong(0); found = true }
      }
      t
    }
    co.filter(col("n") >= thr).select(col("u"), col("v"))
  }

  /** mf1 — rank-1 ALS (ops.Als.rank1Summary) over the sparse
    * supplier×part quantity matrix (Σ l_quantity per pair — exact
    * integer-valued sums): one full alternation, top-20 part factors
    * + observed-cell MSE. The oracle replays both half-steps — the
    * quantized-iterate recipe with DISTRIBUTED (never driver-held)
    * factor state. */
  def alsFactors(spark: SparkSession, dir: String): DataFrame = {
    val ratings = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity")).as("qty"))
    graft.ops.Als.rank1Summary(ratings, "l_suppkey", "l_partkey", "qty")
  }

  /** lp1 — label-propagation communities (ops.PageRank
    * .labelPropagation) over the same trade graph as pr1: three
    * synchronous neighbor-mode rounds (ties to the smallest label),
    * reported as the top-20 communities by size. Pure integer
    * iteration — exactly SQL-replayable with no quantization at
    * all. */
  def communities(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("src"),
        (lit(1000000L) + col("l_suppkey")).as("dst"))
    graft.ops.PageRank.labelPropagation(pairs, "src", "dst", iters = 3)
      .groupBy(col("label")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("n_nodes").desc, col("label"))
      .limit(20)
  }

  /** cdc1 — snapshot diff (ops.Cdc.snapshotDiff): the "new" snapshot
    * is derived deterministically from customer (every 7th key
    * deleted, every remaining 5th key's balance bumped, every 13th
    * key re-inserted under a shifted key), so the oracle can derive
    * the identical pair and diff it by direct column comparison while
    * the Spark side diffs by 64-bit value digest — agreement proves
    * the digest classification exact on real data. */
  /** The deterministic "today's dump" both cdc1 and st6 diff against
    * customer: every 7th key deleted, every remaining 5th key's
    * balance bumped, every 13th key re-inserted under a shifted key. */
  private[graft] def derivedNewSnapshot(c: DataFrame): DataFrame =
    c.filter(col("c_custkey") % 7 =!= 0)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 5 === 0, col("c_acctbal") + 100.0)
          .otherwise(col("c_acctbal")))
      .unionByName(
        c.filter(col("c_custkey") % 13 === 0)
          .withColumn("c_custkey", col("c_custkey") + 10000000L))

  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    graft.ops.Cdc.snapshotDiff(c, derivedNewSnapshot(c),
        keyCols = Seq("c_custkey"),
        valueCols = Seq("c_name", "c_acctbal", "c_mktsegment"))
      .orderBy(col("c_custkey"))
  }
}
