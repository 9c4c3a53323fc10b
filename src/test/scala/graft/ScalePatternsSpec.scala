package graft

import org.apache.spark.sql.functions._
import graft.ops.ScalePatterns

class ScalePatternsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join matches the plain join result") {
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_mktsegment")
    val plain = orders.join(customer, orders("o_custkey") === customer("c_custkey"))
      .groupBy($"c_mktsegment").count()
      .as[(String, Long)].collect().toMap
    val salted = ScalePatterns
      .saltedJoin(orders.withColumnRenamed("o_custkey", "c_custkey"),
        customer, "c_custkey", buckets = 4)
      .groupBy($"c_mktsegment").count()
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("bucketed tables join without a shuffle") {
    // default warehouse dir (spark-warehouse/ under cwd); clear any
    // leftover location from a previous crashed run before writing
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    ScalePatterns.writeBucketed(
      Tables.orders(spark, sfDir).select($"o_orderkey", $"o_totalprice"),
      "b_orders", "o_orderkey", buckets = 4)
    ScalePatterns.writeBucketed(
      Tables.lineitem(spark, sfDir).select($"l_orderkey".as("o_orderkey"), $"l_quantity"),
      "b_lineitem", "o_orderkey", buckets = 4)
    // at real scale neither side broadcasts; force that planning regime
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(1500)}")
      assert(plan.contains("Bucketed: true"), plan.take(1500))
      assert(joined.count() == Tables.lineitem(spark, sfDir).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("streaming idempotent append: replayed batches insert nothing") {
    import graft.streaming.EventStreams
    val src = java.nio.file.Files.createTempDirectory("ssrc").toString
    val sink = java.nio.file.Files.createTempDirectory("ssink").toString + "/t"
    val cp1 = java.nio.file.Files.createTempDirectory("scp1").toString
    val cp2 = java.nio.file.Files.createTempDirectory("scp2").toString
    val events = Tables.events(spark, sfDir).limit(200)
    events.write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema

    def run(cp: String): Unit = {
      val q = EventStreams.idempotentStreamAppend(
        spark.readStream.schema(schema).parquet(src),
        sink, Seq("event_id"), cp)
      q.awaitTermination()
    }
    run(cp1)
    val n1 = spark.read.parquet(sink).count()
    run(cp2) // fresh checkpoint = full replay of the same files
    val n2 = spark.read.parquet(sink).count()
    assert(n1 == 200 && n2 == 200, s"$n1 / $n2")
  }
}
