package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def pop = spark.range(2000L)
    .select($"id".as("k"),
      when($"id" < 1000L, 1.0).otherwise(10.0).as("w"))

  test("deterministic: same rows across runs and partitionings") {
    val a = Sampling.weightedSample(pop, "k", $"w", 100)
      .select($"k").as[Long].collect().sorted.toSeq
    val b = Sampling.weightedSample(pop.repartition(13), "k", $"w", 100)
      .select($"k").as[Long].collect().sorted.toSeq
    assert(a == b && a.size == 100 && a.distinct.size == 100)
  }

  test("weight-proportional: the 10x-weight half dominates the sample") {
    val got = Sampling.weightedSample(pop, "k", $"w", 200)
      .select($"k").as[Long].collect()
    val heavy = got.count(_ >= 1000L)
    // expected ~180 of 200 from the 10x half; 130 is a >5-sigma floor
    assert(heavy > 130, s"heavy=$heavy of ${got.length}")
  }

  test("salt is the experiment handle: new salt, different sample") {
    val a = Sampling.weightedSample(pop, "k", $"w", 100, salt = "v1")
      .select($"k").as[Long].collect().toSet
    val b = Sampling.weightedSample(pop, "k", $"w", 100, salt = "v2")
      .select($"k").as[Long].collect().toSet
    assert(a != b)
  }

  test("plans as TakeOrderedAndProject — no global sort of the corpus") {
    val plan = Sampling.weightedSample(pop, "k", $"w", 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
