package graft

import graft.ops.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("distinct sketch honors its error contract on real data") {
    val got = Sketches.distinctWithContract(
      Tables.lineitem(spark, sfDir), "l_returnflag", "l_suppkey")
      .select($"exact_distinct", $"approx_distinct", $"within_bound")
      .as[(Long, Long, Boolean)].collect()
    assert(got.nonEmpty && got.forall(_._3),
      got.filterNot(_._3).mkString(", "))
  }

  test("distinct sketch is a genuine sketch at scale (fixed-size state)") {
    // 100k distinct keys in one group: approx within 3*rsd of exact,
    // but not required to BE exact — the bound is the contract
    val big = spark.range(100000L).selectExpr("1 AS g", "id AS k")
    val r = Sketches.distinctWithContract(big, "g", "k", rsd = 0.05)
      .select($"exact_distinct", $"approx_distinct", $"within_bound")
      .as[(Long, Long, Boolean)].collect().head
    assert(r._1 == 100000L && r._3, r.toString)
  }

  test("median sketch sits inside its rank tolerance") {
    val got = Sketches.medianWithContract(
      Tables.lineitem(spark, sfDir), "l_returnflag", "l_quantity")
      .select($"within_bound").as[Boolean].collect()
    assert(got.nonEmpty && got.forall(identity))
  }
}
