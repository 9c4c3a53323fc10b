package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import graft.ops.TemporalJoins

class TemporalJoinsSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def leftDf = Seq(
    // (key, t, tag)
    (1, 10L, "l10"), (1, 20L, "l20"), (1, 5L, "l5"),
    (2, 100L, "l100"),
    (3, 7L, "l7")
  ).toDF("k", "t", "tag")

  private def rightDf = Seq(
    // (key, t, v, maybeNull)
    (1, 10L, "r10", Some("x")),  // equal-ts: inclusive
    (1, 15L, "r15", None),       // null payload FIELD, still a real row
    (2, 99L, "r99", Some("y"))
    // key 3 has no right rows at all
  ).map { case (k, t, v, m) => (k, t, v, m.orNull) }
    .toDF("k", "t", "v", "m")

  private def result = TemporalJoins
    .asOf(leftDf, rightDf, "k", "t", payload = Seq("v", "m"))
    .orderBy($"k", $"t")
    .as[(Int, Long, String, String, String)]
    .collect()

  test("asOfForward: earliest following right row, inclusive on equality") {
    val fwd = TemporalJoins
      .asOfForward(leftDf, rightDf, "k", "t", payload = Seq("v", "m"))
      .orderBy($"k", $"t")
      .as[(Int, Long, String, String, String)]
      .collect()
    val byTag = fwd.map(r => (r._3, (r._4, r._5))).toMap
    assert(byTag("l5") == (("r10", "x")))        // first at-or-after t=5
    assert(byTag("l10") == (("r10", "x")))       // t equality is inclusive
    assert(byTag("l20") == ((null, null)))       // nothing after t=20
    assert(byTag("l100") == ((null, null)))      // r99 is strictly before
    assert(byTag("l7") == ((null, null)))        // key 3 has no right rows
  }

  test("asOf: duplicate right rows at the same (key, time) resolve deterministically") {
    val dupRight = Seq((1, 10L, "rA", "a"), (1, 10L, "rB", "b"))
      .toDF("k", "t", "v", "m")
    val l = Seq((1, 11L, "l11")).toDF("k", "t", "tag")
    val got = TemporalJoins.asOf(l, dupRight, "k", "t", Seq("v", "m"))
      .select($"prior_v", $"prior_m").as[(String, String)].collect().toList
    // the payload struct is the final window tie-break: the
    // lexicographically-largest payload wins, on every run
    assert(got == List(("rB", "b")))
  }

  // seconds-encoded fixture lifted to real timestamps (asOfWithin
  // computes ages in epoch micros, so the time column must be one)
  private def leftTs = leftDf.withColumn("t", timestamp_micros($"t" * 1000000L))
  private def rightTs = rightDf.withColumn("t", timestamp_micros($"t" * 1000000L))

  test("asOfWithin: a huge tolerance degenerates to plain asOf") {
    val plain = TemporalJoins.asOf(leftTs, rightTs, "k", "t", Seq("v", "m"))
      .orderBy($"k", $"t").select($"tag", $"prior_v", $"prior_m")
      .as[(String, String, String)].collect().toList
    val bounded = TemporalJoins.asOfWithin(leftTs, rightTs, "k", "t",
        Seq("v", "m"), toleranceSeconds = 1000000L)
      .orderBy($"k", $"t").select($"tag", $"prior_v", $"prior_m")
      .as[(String, String, String)].collect().toList
    assert(bounded == plain)
  }

  test("asOfWithin: stale winners null out, boundary age is inclusive") {
    def at(tol: Long): Map[String, (String, String)] =
      TemporalJoins.asOfWithin(leftTs, rightTs, "k", "t", Seq("v", "m"),
          toleranceSeconds = tol)
        .collect().map(r => (r.getString(2),
          (r.getString(3), r.getString(4)))).toMap
    // l20's as-of winner is r15 (age 5 s): in at tol=5, out at tol=4
    assert(at(5L)("l20") == (("r15", null)))
    assert(at(4L)("l20") == ((null, null)))
    // l10 matches r10 at age 0 even under tol=0
    assert(at(0L)("l10") == (("r10", "x")))
    // key 3 has no right rows: null regardless of tolerance
    assert(at(1000L)("l7") == ((null, null)))
  }

  test("asOf: latest prior right row per left row, inclusive on equality") {
    val byTag = result.map(r => (r._3, (r._4, r._5))).toMap
    assert(byTag("l5") == ((null, null)))        // before any right row
    assert(byTag("l10") == (("r10", "x")))       // t equality is inclusive
    assert(byTag("l20") == (("r15", null)))      // newer row wins even with null field
    assert(byTag("l100") == (("r99", "y")))
    assert(byTag("l7") == ((null, null)))        // key with no right side
  }

  test("asOf: null payload field does not fall back to an older right row") {
    // l20's match is r15 whose m is null; per-column last(ignoreNulls)
    // would have leaked r10's "x" into m — the struct carry must not.
    val l20 = result.find(_._3 == "l20").get
    assert(l20._4 == "r15" && l20._5 == null)
  }

  test("asOf plan: one key shuffle, no range/cartesian join") {
    val df = TemporalJoins.asOf(leftDf, rightDf, "k", "t", Seq("v"))
    df.collect()
    val plan = df.queryExecution.executedPlan
    def all(p: SparkPlan): Seq[SparkPlan] = collectWithSubqueries(p) { case n => n }
    val nodes = all(plan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
    // union-tag design: the only exchange is the window's key partitioning
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeLike]) == 1)
  }

  test("w8 query matches a per-row subquery reference at sf0.001") {
    val got = CoreQueriesForAsOf.run(spark, sfDir)
    // reference computed the slow way: per click, max prior view ts
    val ev = Tables.events(spark, sfDir).cache()
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id".as("vu"), $"ts".as("vts"), $"event_id".as("view_id"),
        $"value".as("view_value"))
    val slow = clicks.join(views, $"user_id" === $"vu" && $"vts" <= $"ts", "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id", $"event_id").orderBy($"vts".desc_nulls_last)))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id",
        when($"vts".isNotNull, $"view_id").as("prior_view_id"),
        when($"vts".isNotNull, $"view_value").as("prior_view_value"))
      .orderBy($"user_id", $"event_id")
      .as[(Long, Long, Option[Long], Option[Double])].collect()
    val fast = got.as[(Long, Long, Option[Long], Option[Double])].collect()
    assert(fast.sameElements(slow))
    ev.unpersist()
  }
}

private object CoreQueriesForAsOf {
  def run(spark: org.apache.spark.sql.SparkSession, dir: String) =
    graft.analytics.CoreQueries.clickPriorView(spark, dir)
}
