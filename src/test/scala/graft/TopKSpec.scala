package graft

import org.apache.spark.sql.functions._
import graft.ops.TopK

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("custom TopKPerGroup matches the window row_number formulation") {
    val li = Tables.lineitem(spark, sfDir)
    val viaOp = TopK.perGroup(li,
      Seq("l_suppkey"),
      Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)),
      k = 3, rankName = "rn")
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"rn")
      .as[(Long, Long, Int, Int)].collect().toSet
    val viaWindow = graft.analytics.CoreQueries.top3PerSupplier(spark, sfDir)
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"rn")
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(viaOp == viaWindow, s"op=${viaOp.size} window=${viaWindow.size}")
  }

  test("physical plan uses partial+final custom exec, not window sort") {
    val df = TopK.perGroup(Tables.lineitem(spark, sfDir),
      Seq("l_suppkey"), Seq(("l_extendedprice", true)), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopK"), plan.take(800))
    assert(plan.contains("FinalTopK"), plan.take(800))
    assert(!plan.contains("Window"), "must not fall back to window")
  }

  test("groups smaller than k return all rows, ranked") {
    val tiny = Seq((1, 10.0), (1, 20.0), (2, 5.0)).toDF("g", "v")
    val got = TopK.perGroup(tiny, Seq("g"), Seq(("v", true)), 5)
      .as[(Int, Double, Int)].collect().toSet
    assert(got == Set((1, 20.0, 1), (1, 10.0, 2), (2, 5.0, 1)))
  }

  test("string group keys and ascending order work") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val got = TopK.perGroup(df, Seq("g"), Seq(("v", false)), 2)
      .as[(String, Int, Int)].collect().toSet
    assert(got == Set(("a", 1, 1), ("a", 2, 2), ("b", 9, 1)))
  }
}
