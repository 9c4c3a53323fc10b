package graft

import org.apache.spark.sql.functions._
import graft.etl.Jdbc

/** S6/K3 against embedded Derby (on the Spark classpath) — the real
  * `format("jdbc")` code path: scan, filter pushdown into the database,
  * partitioned parallel read, idempotent keyed append. */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dbDir = java.nio.file.Files.createTempDirectory("graft_derby")
  private lazy val url = s"jdbc:derby:$dbDir/db;create=true"

  test("idempotent append: creates table, re-append inserts only novel keys") {
    val batch1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "name")
    assert(Jdbc.idempotentAppend(batch1, url, "people", Seq("id")) == 3)
    // overlap {2,3} + novel {4,5}
    val batch2 = Seq((2L, "beta"), (3L, "gamma"), (4L, "delta"), (5L, "epsilon"))
      .toDF("id", "name")
    assert(Jdbc.idempotentAppend(batch2, url, "people", Seq("id")) == 2)
    // third run with nothing new is a no-op
    assert(Jdbc.idempotentAppend(batch2, url, "people", Seq("id")) == 0)
    val got = Jdbc.scan(spark, url, "people")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "alpha"), (2L, "beta"), (3L, "gamma"),
      (4L, "delta"), (5L, "epsilon")))
  }

  test("filters push down into the database scan") {
    Jdbc.idempotentAppend(
      (1L to 50L).map(i => (i, s"n$i")).toDF("id", "name"), url, "pushdown_t", Seq("id"))
    val df = Jdbc.scan(spark, url, "pushdown_t").filter(col("id") > 40)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      plan.take(1500))
    assert(df.count() == 10)
  }

  test("partitioned scan parallelizes into bounded range queries") {
    val df = Jdbc.scanPartitioned(spark, url, "pushdown_t", "id",
      lower = 1, upper = 51, numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 50)
    assert(df.agg(sum("id")).as[Long].head() == (1L to 50L).sum)
  }
}
