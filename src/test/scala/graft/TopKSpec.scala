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

  test("custom operator shuffles a small fraction of the window form's rows") {
    // The operator's reason to exist: map-side bounded heaps emit at
    // most k rows per (group, partition) into the exchange, while the
    // window form shuffles EVERY input row. 200k rows over 100 groups:
    // partial phase caps the shuffle at 3*100*numPartitions rows.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def shuffleRecords(df: org.apache.spark.sql.DataFrame): Long = {
      // execute THIS QueryExecution (df.count() would plan a separate
      // one and leave these nodes' metrics untouched)
      df.queryExecution.toRdd.count()
      var total = 0L
      // AQE hides materialized exchanges inside leaf query-stage nodes —
      // descend through them explicitly
      def walk(p: SparkPlan): Unit = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case s: ShuffleExchangeLike =>
          total += s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
          s.children.foreach(walk)
        case other => other.children.foreach(walk)
      }
      walk(df.queryExecution.executedPlan)
      total
    }
    import org.apache.spark.sql.expressions.Window
    // 4 input partitions, PINNED: the partial-heap shuffle bound is
    // k*groups*partitions, so the <=25% assertion below is a function
    // of the partition count — at the session default (all cores) the
    // bound exceeds the row count and the test would measure nothing
    val base = spark.range(0, 200000, 1, 4).select(
      (col("id") % 5).as("g"),
      (col("id") * 2654435761L % 1000003).as("v"),
      col("id"))
    def windowed(k: Int) =
      base.withColumn("rn", row_number().over(
          Window.partitionBy($"g").orderBy($"v".desc, $"id".asc)))
        .filter($"rn" <= k)

    // Small k: Spark 4's own InferWindowGroupLimit inserts a map-side
    // partial WindowGroupLimit, so the window form ALSO shuffles only
    // ~k*groups*partitions — the custom operator matches it (parity,
    // as measured in round-1 bench) rather than beating it.
    val opSmall = shuffleRecords(
      TopK.perGroup(base, Seq("g"), Seq(("v", true), ("id", false)), 3))
    val winSmall = shuffleRecords(windowed(3))
    assert(winSmall < 1000, s"WindowGroupLimit should cap the shuffle, saw $winSmall")
    assert(opSmall < 1000, s"partial heaps should cap the shuffle, saw $opSmall")

    // Large k (> spark.sql.optimizer.windowGroupLimitThreshold = 1000):
    // the built-in rule no longer fires and the window form shuffles
    // every input row; the custom operator's bound k*groups*partitions
    // still holds. THIS is the regime the operator exists for.
    // NOTE: AutoTopKRule (installed session-wide by TopK.install /
    // other suites) rewrites exactly this window shape into the custom
    // operator — suppress it while measuring the WINDOW baseline, or
    // there is no baseline left to measure.
    val opLarge = shuffleRecords(
      TopK.perGroup(base, Seq("g"), Seq(("v", true), ("id", false)), 2000))
    val cl = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val saved = cl.experimental.extraOptimizations
    cl.experimental.extraOptimizations =
      saved.filterNot(_ == graft.plans.AutoTopKRule)
    val winLarge = try shuffleRecords(windowed(2000))
    finally cl.experimental.extraOptimizations = saved
    assert(winLarge >= 200000L, s"window should shuffle all rows, saw $winLarge")
    assert(opLarge <= winLarge / 4,
      s"custom op shuffled $opLarge vs window $winLarge — expected <=25%")
  }

  test("string group keys and ascending order work") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val got = TopK.perGroup(df, Seq("g"), Seq(("v", false)), 2)
      .as[(String, Int, Int)].collect().toSet
    assert(got == Set(("a", 1, 1), ("a", 2, 2), ("b", 9, 1)))
  }
}
