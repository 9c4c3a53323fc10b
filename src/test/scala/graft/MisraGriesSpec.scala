package graft

import org.apache.spark.sql.functions._
import graft.functions.MisraGries

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: distinct <= k reproduces plain counts through shuffled merges") {
    val mg = MisraGries.heavyHitters(8)
    val got = Tables.orders(spark, sfDir)
      .repartition(7) // force non-trivial partial merges
      .groupBy($"o_orderstatus")
      .agg(mg($"o_orderpriority").as("hh"))
      .select($"o_orderstatus", explode($"hh").as(Seq("p", "est")))
      .as[(String, String, Long)].collect().toSet
    val want = Tables.orders(spark, sfDir)
      .groupBy($"o_orderstatus", $"o_orderpriority").count()
      .as[(String, String, Long)].collect().toSet
    assert(got == want)
  }

  test("approximate regime: heavy item survives, estimates understate by <= n/(k+1)") {
    val k = 5
    // 6000 of "hot", 4000 spread over 400 rare items
    val df = spark.range(10000L).select(
      when($"id" < 6000L, lit("hot"))
        .otherwise(concat(lit("rare"), ($"id" % 400L).cast("string"))).as("item"))
    val mg = MisraGries.heavyHitters(k)
    val got = df.repartition(11).agg(mg($"item").as("hh"))
      .select(explode($"hh").as(Seq("item", "est")))
      .as[(String, Long)].collect().toMap
    assert(got.size <= k)
    assert(got.contains("hot"), got.toString)
    val est = got("hot")
    assert(est <= 6000L && 6000L - est <= 10000L / (k + 1),
      s"hot estimated $est")
  }

  test("state stays bounded under high cardinality") {
    val mg = MisraGries.heavyHitters(8)
    val got = spark.range(50000L)
      .select(concat(lit("u"), $"id".cast("string")).as("item"))
      .agg(mg($"item").as("hh"))
      .select(size($"hh")).as[Int].collect().head
    assert(got <= 8)
  }
}
