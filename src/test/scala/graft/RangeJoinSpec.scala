package graft

import org.apache.spark.sql.functions._
import graft.ops.TemporalJoins

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def mkPoints = spark
    .createDataset(Seq(
      (1L, "2024-01-01 00:00:00"),
      (2L, "2024-01-01 00:09:59.999999"),
      (3L, "2024-01-01 00:10:00"), // exactly at an end bound
      (4L, "2024-01-01 00:25:00"),
      (5L, "2024-01-02 12:00:00")))
    .toDF("pid", "t")
    .withColumn("t", to_timestamp($"t"))

  private def mkIntervals = spark
    .createDataset(Seq(
      // short: within one 600s bin
      (10L, "2024-01-01 00:00:00", "2024-01-01 00:10:00"),
      // long: spans ~4 days of 600s bins
      (11L, "2024-01-01 00:05:00", "2024-01-05 00:00:00"),
      // empty-range interval matches nothing
      (12L, "2024-01-03 00:00:00", "2024-01-03 00:00:00")))
    .toDF("iid", "s", "e")
    .withColumn("s", to_timestamp($"s"))
    .withColumn("e", to_timestamp($"e"))

  test("binned join equals naive cross+filter, end-exclusive, no dup pairs") {
    val got = TemporalJoins
      .binnedIntervalJoin(mkPoints, "t", mkIntervals, "s", "e", binSeconds = 600)
      .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq
    val naive = mkPoints.crossJoin(mkIntervals)
      .filter($"t" >= $"s" && $"t" < $"e")
      .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq
    assert(got == naive)
    // point 3 sits exactly on interval 10's end -> excluded (end-exclusive)
    assert(!got.contains((3L, 10L)))
    // the multi-bin interval 11 meets each contained point exactly once
    assert(got.count(_._2 == 11L) == got.filter(_._2 == 11L).distinct.size)
    assert(got.nonEmpty)
  }

  test("equivalence on real data: purchase windows vs error events") {
    val ev = Tables.events(spark, sfDir)
    val anchors = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("anchor_id"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 30 MINUTES")).as("w_end"))
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id".as("err_id"), $"ts")
    val got = TemporalJoins
      .binnedIntervalJoin(errors, "ts", anchors, "w_start", "w_end", 600)
      .select($"err_id", $"anchor_id").as[(Long, Long)].collect().sorted.toSeq
    val naive = errors.crossJoin(anchors)
      .filter($"ts" >= $"w_start" && $"ts" < $"w_end")
      .select($"err_id", $"anchor_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == naive && got.nonEmpty)
  }

  test("the binned plan is an equi-join, not a nested-loop join") {
    val plan = TemporalJoins
      .binnedIntervalJoin(mkPoints, "t", mkIntervals, "s", "e", 600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
    // and the naive shape really would nested-loop (the blowup we avoid)
    val naivePlan = mkPoints.join(mkIntervals, $"t" >= $"s" && $"t" < $"e")
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("NestedLoop") || naivePlan.contains("Cartesian"),
      naivePlan)
  }
}
