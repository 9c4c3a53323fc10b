package graft

import graft.ops.Als

class AlsSpec extends SparkSpec {
  import spark.implicits._

  // a rank-1 matrix r(u,i) = a_u * b_i, fully observed: ALS must
  // recover factors proportional to b and fit with ~zero error
  private val a = Map(1L -> 2.0, 2L -> 4.0)
  private val b = Map(10L -> 1.0, 11L -> 3.0, 12L -> 5.0)
  private def exact = (for { (u, au) <- a.toSeq; (i, bi) <- b.toSeq }
    yield (u, i, au * bi)).toDF("u", "i", "r")

  test("exactly rank-1 data: factor order recovered, near-zero mse") {
    val out = Als.rank1Summary(exact, "u", "i", "r", topK = 3)
      .as[(Long, Double, Double)].collect().sortBy(-_._2)
    // items ordered by their true b value
    assert(out.map(_._1).toSeq == Seq(12L, 11L, 10L))
    assert(out.head._3 < 1e-6, s"mse should vanish on rank-1 data: ${out.head._3}")
  }

  test("factors and mse sit exactly on the 1e-6 grid") {
    Als.rank1Summary(exact, "u", "i", "r", topK = 3)
      .as[(Long, Double, Double)].collect().foreach { case (_, f, m) =>
        assert(f == math.floor(f * 1e6 + 0.5) / 1e6)
        assert(m == math.floor(m * 1e6 + 0.5) / 1e6)
      }
  }

  test("deterministic across repartitionings") {
    val x = Als.rank1Summary(exact, "u", "i", "r").collect().toSeq
    val y = Als.rank1Summary(exact.repartition(7), "u", "i", "r").collect().toSeq
    assert(x == y)
  }
}
