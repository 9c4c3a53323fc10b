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

  test("string SORT keys survive buffer reuse across many rows/partitions") {
    // Regression: evaluated UTF8String sort keys used to alias the
    // iterator's reused row buffer; retained heap keys were then
    // overwritten by later rows, corrupting the top-k order.
    val rows = (0 until 5000).map { i =>
      (i % 37, f"name_${(i * 131) % 997}%04d", i)
    }
    val df = rows.toDF("g", "name", "id").repartition(8)
    val viaOp = TopK.perGroup(df, Seq("g"),
      Seq(("name", true), ("id", false)), 3, rankName = "rn")
      .select($"g", $"name", $"id", $"rn")
      .as[(Int, String, Int, Int)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val viaWindow = df.withColumn("rn",
      row_number().over(Window.partitionBy($"g")
        .orderBy($"name".desc, $"id".asc)))
      .filter($"rn" <= 3)
      .as[(Int, String, Int, Int)].collect().toSet
    assert(viaOp == viaWindow,
      s"op-only=${(viaOp -- viaWindow).take(5)} window-only=${(viaWindow -- viaOp).take(5)}")
  }

  test("decimal sort keys survive buffer reuse") {
    val df = (0 until 2000).map(i => (i % 11, BigDecimal(i * 7 % 1009) / 100, i))
      .toDF("g", "d", "id").repartition(6)
    val viaOp = TopK.perGroup(df, Seq("g"), Seq(("d", true), ("id", false)), 2)
      .select($"g", $"id").as[(Int, Int)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val viaWindow = df.withColumn("rn",
      row_number().over(Window.partitionBy($"g").orderBy($"d".desc, $"id".asc)))
      .filter($"rn" <= 2).select($"g", $"id").as[(Int, Int)].collect().toSet
    assert(viaOp == viaWindow)
  }

  test("string group keys and ascending order work") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val got = TopK.perGroup(df, Seq("g"), Seq(("v", false)), 2)
      .as[(String, Int, Int)].collect().toSet
    assert(got == Set(("a", 1, 1), ("a", 2, 2), ("b", 9, 1)))
  }
}
