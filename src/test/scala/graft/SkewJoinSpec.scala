package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join result equals the plain join exactly") {
    val fact = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("k"), col("o_orderkey"), col("o_totalprice"))
    val dim = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("o_orderkey"), col("c_mktsegment"))
        .as[(Long, String)].collect().sorted.toSeq
    val plain = rows(fact.join(dim, Seq("k")))
    val salted = rows(SkewJoin.saltedJoin(fact, dim, "k", "o_orderkey", 8))
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("a 90%-hot key's rows split across salt lanes") {
    // planted skew: 9000 of 10000 fact rows share one key — the plain
    // hash join sends all 9000 to one reducer; the salt must spread
    // them so no lane holds more than ~1/salts (+slack) of the hot rows
    val salts = 8
    val fact = spark.range(10000).select(
      when(col("id") < 9000, lit(7L)).otherwise(col("id")).as("k"),
      col("id").as("row_id"))
    val lanes = fact.filter(col("k") === 7L)
      .select(SkewJoin.saltOf(col("row_id"), salts).as("salt"))
      .groupBy(col("salt")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lanes.keySet === (0L until salts).toSet, "every lane used")
    val expected = 9000.0 / salts
    assert(lanes.values.forall(n => n < expected * 1.25),
      s"no lane may dominate: $lanes")
    // and the salted join over the planted fixture is still exact
    val dim = Seq((7L, "hot"), (9500L, "cold")).toDF("k", "tag")
    val salted = SkewJoin.saltedJoin(fact, dim, "k", "row_id", salts)
      .groupBy(col("tag")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === Map("hot" -> 9000L, "cold" -> 1L))
  }

  test("inputs already carrying __salt are rejected, not silently mis-joined") {
    val fact = Seq((1L, 1L, 0)).toDF("k", "row_id", "__salt")
    val dim = Seq((1L, "x")).toDF("k", "tag")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(fact, dim, "k", "row_id", 4)
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(dim.withColumnRenamed("tag", "row_id"),
        fact.drop("row_id"), "k", "row_id", 4)
    }
  }

  test("salt derivation is deterministic and engine-stable") {
    val a = SkewJoin.saltOf(lit("4242"), 8)
    val b = SkewJoin.saltOf(lit(4242L), 8)
    val Seq(x, y) = spark.range(1).select(a, b).head().toSeq.map(_.asInstanceOf[Long])
    assert(x === y, "string form of the key drives the salt")
    assert(x >= 0 && x < 8)
  }
}
