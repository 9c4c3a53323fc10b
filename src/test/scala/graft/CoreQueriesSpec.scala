package graft

import org.apache.spark.sql.functions._
import graft.analytics.CoreQueries

class CoreQueriesSpec extends SparkSpec {
  import spark.implicits._

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

  test("window funnel: levels consistent with step counts, one row per active user") {
    val out = SparkEntry.queries("u5_window_funnel")(spark, sfDir)
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(out.nonEmpty)
    assert(out.length ==
      Tables.events(spark, sfDir).select($"user_id").distinct().count())
    out.foreach { case (u, nv, nqc, nqp, lvl) =>
      val expect = if (nqp > 0) 3 else if (nqc > 0) 2 else if (nv > 0) 1 else 0
      assert(lvl == expect, s"user $u: level $lvl vs counts ($nv,$nqc,$nqp)")
      // a qualifying click implies a view existed; same one level up
      if (nqc > 0) assert(nv > 0)
    }
    // the time constraint must actually bite somewhere: some user
    // with clicks+views has zero QUALIFYING clicks
    val ev = Tables.events(spark, sfDir)
    val withBoth = ev.filter($"event_type" === "click")
      .select($"user_id").distinct()
      .intersect(ev.filter($"event_type" === "view")
        .select($"user_id").distinct())
      .as[Long].collect().toSet
    assert(out.exists(r => withBoth.contains(r._1) && r._3 == 0),
      "expected at least one user whose clicks are all >1h after views")
  }

  test("hopping window: every event lands in exactly size/slide = 2 windows") {
    val out = SparkEntry.queries("w16_hopping_window")(spark, sfDir)
    val totalAssigned = out.agg(sum($"n_events")).as[Long].head()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(totalAssigned == 2 * nEvents,
      s"expected ${2 * nEvents} window-event assignments, got $totalAssigned")
    // windows are epoch-aligned to the 30-min slide and 60 min wide
    val bad = out.filter(
      unix_timestamp($"w_start") % 1800 =!= 0 ||
      unix_timestamp($"w_end") - unix_timestamp($"w_start") =!= 3600).count()
    assert(bad == 0)
  }

  test("multiset ops: EXCEPT ALL + INTERSECT ALL partition the left bag") {
    import org.apache.spark.sql.functions._
    val u4 = SparkEntry.queries("u4_multiset_ops")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val hi = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .groupBy(col("o_orderstatus")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // per status: |hi| = except_all + intersect_all (bag identity)
    u4.foreach { case (s, ex, in) =>
      assert(hi.getOrElse(s, 0L) === ex + in, s"status $s")
    }
  }

  test("trailing range window: every row counts itself; frame is time-bounded") {
    import org.apache.spark.sql.functions._
    val w14 = SparkEntry.queries("w14_trailing_window")(spark, sfDir)
    assert(w14.filter(col("n_1h") < 1).count() === 0)
    // a RANGE frame must be able to hold a different row count per row
    assert(w14.select(col("n_1h")).distinct().count() >= 2)
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
  test("sessionize: 1800s gap keeps the session, 1801s breaks it, per user") {
    import java.sql.Timestamp
    val base = 1700000000L * 1000000L // epoch micros
    val events = Seq(
      // user 1: gap exactly 1800s -> SAME session (strict >); next gap
      // 1801s -> new session (java.sql.Timestamp carries millis, so
      // the fixture keeps gaps ms-exact; the µs comparison itself is
      // exercised by the w11 oracle at sf0.01)
      (1L, 10L, base),
      (1L, 11L, base + 1800L * 1000000L),
      (1L, 12L, base + 1800L * 1000000L + 1801L * 1000000L),
      // user 2: one event
      (2L, 20L, base)
    ).map { case (u, e, us) => (u, e, new Timestamp(us / 1000)) }
      .toDF("user_id", "event_id", "ts")
    val out = CoreQueries.sessionizeEvents(events, gapUs = 1800L * 1000000L)
      .orderBy(col("user_id"), col("session_idx")).collect()
    assert(out.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx"),
      r.getAs[Long]("n_events"))).toSeq ==
      Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
    // duration of user 1's first session is exactly the 1800s gap
    assert(out(0).getAs[Long]("duration_us") == 1800L * 1000000L)
  }

  test("w11 query shape: contiguous session_idx from 1 per user, duration consistent") {
    val out = CoreQueries.sessionize(spark, sfDir)
    assert(out.filter(col("duration_us") < 0).count() == 0)
    val perUser = out.groupBy("user_id")
      .agg(min("session_idx").as("lo"), max("session_idx").as("hi"),
        count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n")).count()
    assert(perUser == 0) // session_idx is 1..n per user, no holes
  }
}
