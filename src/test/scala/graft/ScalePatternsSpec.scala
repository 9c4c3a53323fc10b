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

  test("salted band self-join: hot LSH bucket spreads over tasks, same pairs") {
    import graft.ops.Dedup
    // adversarial corpus: 120 IDENTICAL docs → identical MinHash
    // signatures → every doc lands in the SAME (band, band_hash) bucket
    // in every band. Unsalted, the whole quadratic pair generation
    // routes through one task; salted it spreads ~saltBuckets ways.
    val hot = (0L until 120L)
      .map(i => (i, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // AQE off: its runtime skew-split would also spread the hot key —
    // the explicit salt must work without it. Broadcast off: force the
    // shuffle-join regime a 100 TB corpus side is in.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def candidates(salt: Int) = {
        val sigs = Dedup.minHashSignatures(hot, "doc_id", "text", 32, 3)
        val banded = sigs.select(col("__id"),
          lit(0).as("band"), xxhash64(col("m0")).as("band_hash"))
        Dedup.bandCandidates(
          banded.select($"band", $"band_hash", $"__id".as("id_a")),
          banded.select($"band", $"band_hash", $"__id".as("id_b")),
          Seq("band", "band_hash"), salt)
          .filter($"id_a" < $"id_b").select($"id_a", $"id_b")
      }
      def maxPartitionRows(df: org.apache.spark.sql.DataFrame): Int =
        df.rdd.mapPartitions(it => Iterator(it.size)).collect().max
      val unsalted = candidates(1)
      val salted = candidates(4)
      assert(salted.collect().toSet == unsalted.collect().toSet)
      val mu = maxPartitionRows(unsalted)
      val ms = maxPartitionRows(salted)
      val total = 120 * 119 / 2
      assert(mu == total, s"unsalted hot bucket should be one task: $mu")
      // 4 salts over 120 rows → ~30 left rows per task (~mu/4); allow
      // hash imbalance up to 0.6×
      assert(ms <= mu * 0.6, s"salting must spread the hot bucket: $ms vs $mu")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    }
  }

  test("salted minHashNearDups equals unsalted on real data") {
    import graft.ops.Dedup
    val docs = Tables.documents(spark, sfDir)
    val plain = Dedup.minHashNearDups(docs, "doc_id", "text", 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val salted = Dedup.minHashNearDups(docs, "doc_id", "text", 0.8, saltBuckets = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(salted == plain && plain.nonEmpty)
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

  test("bloom-pruned join: identical to the plain join, and actually prunes") {
    val li = Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_quantity")
    val sel = Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    val plain = li.join(sel, Seq("l_orderkey"))
      .agg(count(lit(1)), sum($"l_quantity")).as[(Long, Double)].collect().head
    val bloomed = ScalePatterns.bloomPrunedJoin(li, sel, "l_orderkey", 10000L)
      .agg(count(lit(1)), sum($"l_quantity")).as[(Long, Double)].collect().head
    assert(bloomed == plain) // no false negatives, joins drop false positives
    // the filter itself prunes: surviving probe rows ~= matches + fpp noise,
    // far below the full probe side
    val total = li.count()
    val matches = li.join(sel.select($"l_orderkey"), Seq("l_orderkey"), "left_semi").count()
    val numBits = math.ceil(-10000L * math.log(0.01) / (math.log(2) * math.log(2))).toLong
    val agg = new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      org.apache.spark.sql.GraftColumnBridge.expression(xxhash64($"l_orderkey")),
      org.apache.spark.sql.catalyst.expressions.Literal(10000L),
      org.apache.spark.sql.catalyst.expressions.Literal(numBits)).toAggregateExpression()
    val bytes = sel.select(org.apache.spark.sql.GraftColumnBridge.column(agg))
      .head.getAs[Array[Byte]](0)
    val surviving = li.filter(org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(bytes,
          org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.GraftColumnBridge.expression(xxhash64($"l_orderkey"))))).count()
    assert(surviving >= matches && surviving < total,
      s"surviving=$surviving matches=$matches total=$total")
    assert(surviving - matches <= math.max(50L, (total * 0.03).toLong),
      s"fpp blowup: surviving=$surviving matches=$matches total=$total")
  }
}
