package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Scd

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, Double, String)*): DataFrame =
    rows.toDF("k", "bal", "seg")

  private def history(snaps: DataFrame*): List[(Long, Double, String, Int, Option[Int])] =
    Scd.scd2(snaps, Seq("k"), Seq("bal", "seg"))
      .orderBy($"k", $"valid_from")
      .as[(Long, Double, String, Int, Option[Int])]
      .collect().toList

  test("unchanged key folds into one open interval") {
    val s = snap((1L, 10.0, "A"))
    assert(history(s, s, s) == List((1L, 10.0, "A", 0, None)))
  }

  test("value change closes the old interval and opens a new one") {
    val got = history(
      snap((1L, 10.0, "A")),
      snap((1L, 10.0, "A")),
      snap((1L, 99.0, "A")))
    assert(got == List((1L, 10.0, "A", 0, Some(2)), (1L, 99.0, "A", 2, None)))
  }

  test("deletion closes the interval at the first absent version") {
    val got = history(
      snap((1L, 10.0, "A"), (2L, 5.0, "B")),
      snap((2L, 5.0, "B")),
      snap((2L, 5.0, "B")))
    assert(got == List(
      (1L, 10.0, "A", 0, Some(1)),
      (2L, 5.0, "B", 0, None)))
  }

  test("reappearance opens a NEW interval even with identical values") {
    val got = history(
      snap((1L, 10.0, "A")),
      snap(),
      snap((1L, 10.0, "A")))
    assert(got == List(
      (1L, 10.0, "A", 0, Some(1)),
      (1L, 10.0, "A", 2, None)))
  }

  test("key deleted in the last snapshot gets a closed final interval") {
    val got = history(
      snap((1L, 10.0, "A")),
      snap((1L, 20.0, "A")),
      snap())
    assert(got == List(
      (1L, 10.0, "A", 0, Some(1)),
      (1L, 20.0, "A", 1, Some(2))))
  }

  test("null-shifted value tuples are distinct changes, not one merged segment") {
    // Spark's xxhash64 SKIPS null arguments, so a bare digest of the
    // value columns hashes ("x", null) and (null, "x") identically and
    // a real change would silently fold into one segment (whose min()
    // fold then emits a row matching NEITHER snapshot). The digest now
    // interleaves per-column null indicators; this pins the fix.
    val v0 = Seq((1L, Option("x"), Option.empty[String])).toDF("k", "a", "b")
    val v1 = Seq((1L, Option.empty[String], Option("x"))).toDF("k", "a", "b")
    val got = Scd.scd2(Seq(v0, v1), Seq("k"), Seq("a", "b"))
      .orderBy($"valid_from")
      .as[(Long, Option[String], Option[String], Int, Option[Int])]
      .collect().toList
    assert(got == List(
      (1L, Some("x"), None, 0, Some(1)),
      (1L, None, Some("x"), 1, None)))
  }

  test("scd2 plans exactly ONE exchange: segment fold reuses the window's partitioning") {
    // the scale claim in Scd's scaladoc, asserted: the groupBy on
    // (key, __seg) requires ClusteredDistribution(key, __seg), which
    // the window's HashPartitioning(key) already satisfies
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val c = Tables.customer(spark, sfDir)
        .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
      val hist = Scd.scd2(Seq(c, c, c), Seq("c_custkey"),
        Seq("c_acctbal", "c_mktsegment"))
      val exchanges = hist.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.size == 1,
        s"expected exactly 1 exchange, got ${exchanges.size}:\n" +
          hist.queryExecution.executedPlan)
    } finally conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("point-in-time join matches the containing interval, nulls outside any") {
    val hist = Scd.scd2(Seq(
      snap((1L, 10.0, "A"), (2L, 5.0, "B")), // v0
      snap((1L, 20.0, "A")),                 // v1: 1 changed, 2 deleted
      snap((1L, 20.0, "A"), (2L, 5.0, "B"))  // v2: 2 reappears
    ), Seq("k"), Seq("bal", "seg"))
    val fact = Seq(
      (100L, 1L, 0), (101L, 1L, 1), (102L, 1L, 2), // key 1 at each version
      (200L, 2L, 0), (201L, 2L, 1), (202L, 2L, 2), // key 2: gap at v1
      (300L, 9L, 1)                                // key never in dim
    ).toDF("fid", "k", "ver")
    val got = Scd.pointInTimeJoin(fact, hist, Seq("k"), "ver")
      .select($"fid", $"bal", $"seg")
      .as[(Long, Option[Double], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(100L) == ((Some(10.0), Some("A"))))
    assert(got(101L) == ((Some(20.0), Some("A"))))
    assert(got(102L) == ((Some(20.0), Some("A"))))
    assert(got(200L) == ((Some(5.0), Some("B"))))
    assert(got(201L) == ((None, None)), "deleted key must not match at the gap")
    assert(got(202L) == ((Some(5.0), Some("B"))), "reappeared interval matches")
    assert(got(300L) == ((None, None)))
    // at most one dim row per fact row — the non-overlap invariant
    assert(Scd.pointInTimeJoin(fact, hist, Seq("k"), "ver").count() == 7)
  }

  test("point-in-time join stays a hash join on the key (no range explosion)") {
    val c = Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
    val hist = Scd.scd2(Seq(c, c), Seq("c_custkey"), Seq("c_acctbal", "c_mktsegment"))
    val fact = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey".as("c_custkey"),
        ($"o_orderkey" % 2).cast("int").as("ver"))
    val plan = Scd.pointInTimeJoin(fact, hist, Seq("c_custkey"), "ver")
      .queryExecution.executedPlan.toString
    // the containment predicate must ride as a residual on an
    // EQUI-join, never degrade to a nested-loop/cartesian strategy
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi-join strategy:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"range explosion:\n$plan")
  }

  test("snapshot reconstruction: intervals covering v reproduce snapshot v exactly") {
    // the property that makes SCD2 correct by definition: selecting
    // valid_from <= v < coalesce(valid_to, K) must rebuild snapshot v
    val c = Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
    val v1 = graft.analytics.CoreQueries.derivedNewSnapshot(
      Tables.customer(spark, sfDir))
      .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
    val v2 = graft.analytics.CoreQueries.derivedThirdSnapshot(v1)
    val snaps = Seq(c, v1, v2)
    val hist = Scd.scd2(snaps, Seq("c_custkey"),
      Seq("c_acctbal", "c_mktsegment")).cache()
    try {
      snaps.zipWithIndex.foreach { case (s, v) =>
        val rebuilt = hist.filter($"valid_from" <= v &&
            coalesce($"valid_to", lit(snaps.size)) > v)
          .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
        assert(rebuilt.exceptAll(s).isEmpty && s.exceptAll(rebuilt).isEmpty,
          s"snapshot $v not reproduced")
      }
    } finally hist.unpersist()
  }
}
