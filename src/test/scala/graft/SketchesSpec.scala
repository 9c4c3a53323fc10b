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

  /** Plain-Scala count-min reference, same hash family. */
  private def cmsReference(keys: Seq[String], width: Int, depth: Int): Map[String, Long] = {
    import graft.functions.PolyHash
    val cells = Array.fill(depth, width)(0L)
    def bucket(h: Long, j: Int): Int =
      ((((h % Sketches.CmP) * Sketches.CmA(j) + Sketches.CmB(j)) % Sketches.CmP) % width).toInt
    for (k <- keys; j <- 0 until depth) cells(j)(bucket(PolyHash.hash(k), j)) += 1
    keys.distinct.map { k =>
      k -> (0 until depth).map(j => cells(j)(bucket(PolyHash.hash(k), j))).min
    }.toMap
  }

  test("count-min estimates equal a plain-Scala reference sketch") {
    val ev = Tables.events(spark, sfDir).selectExpr("CAST(user_id AS STRING) AS k")
    val keys = ev.as[String].collect().toSeq
    val got = Sketches.countMinEstimates(ev, "k", width = 64, depth = 4)
      .as[(String, Long)].collect().toMap
    assert(got === cmsReference(keys, 64, 4))
  }

  test("count-min never underestimates and collides at narrow width") {
    val ev = Tables.events(spark, sfDir).selectExpr("user_id AS k")
    val exact = ev.groupBy($"k").count()
      .as[(Long, Long)].collect().toMap
    val est = Sketches.countMinEstimates(ev, "k", width = 16, depth = 2)
      .as[(Long, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    assert(est.forall { case (k, e) => e >= exact(k) })
    assert(est.exists { case (k, e) => e > exact(k) },
      "width 16 over >100 keys must produce at least one collision")
  }

  test("count-min is partitioning-invariant (mergeable partials)") {
    val ev = Tables.events(spark, sfDir).selectExpr("user_id AS k")
    val one = Sketches.countMinEstimates(ev.repartition(1), "k")
      .as[(Long, Long)].collect().toMap
    val many = Sketches.countMinEstimates(ev.repartition(13), "k")
      .as[(Long, Long)].collect().toMap
    assert(one === many)
  }

  test("median sketch sits inside its rank tolerance") {
    val got = Sketches.medianWithContract(
      Tables.lineitem(spark, sfDir), "l_returnflag", "l_quantity")
      .select($"within_bound").as[Boolean].collect()
    assert(got.nonEmpty && got.forall(identity))
  }
}
