package graft

import graft.ops.Svd

class SvdSpec extends SparkSpec {
  import spark.implicits._

  test("top singular direction of an axis-dominated cloud is that axis") {
    val rows = Seq(
      Seq(3.0f, 0.1f), Seq(2.5f, -0.1f), Seq(3.2f, 0.0f),
      Seq(-0.1f, 0.4f), Seq(0.1f, 0.3f)).map(Tuple1(_))
    val out = Svd.powerIterationTop(rows.toDF("embedding"), "embedding")
      .select("dim", "loading", "lambda")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    val loadings = out.map(_._2)
    assert(math.abs(loadings(0)) > 0.99, s"x-axis should dominate: ${loadings.toSeq}")
    assert(loadings(0) > 0, "sign canonicalization: first component >= 0")
    // lambda ~ sum of squared projections onto the axis: > 3^2 at least
    assert(out.head._3 > 9.0)
  }

  test("sign ambiguity canonicalized: a negated cloud yields the same loadings") {
    val cloud = Seq(Seq(3.0f, 0.5f), Seq(2.0f, 0.4f), Seq(2.5f, 0.45f))
    def run(rows: Seq[Seq[Float]]) =
      Svd.powerIterationTop(rows.map(Tuple1(_)).toDF("embedding"), "embedding")
        .select("loading").as[Double].collect().toSeq
    assert(run(cloud) == run(cloud.map(_.map(x => -x))))
  }

  test("loadings sit exactly on the 1e-6 grid") {
    val rows = Seq(Seq(1.0f, 2.0f, 3.0f), Seq(0.5f, 1.1f, 2.9f)).map(Tuple1(_))
    Svd.powerIterationTop(rows.toDF("embedding"), "embedding")
      .select("loading").as[Double].collect().foreach { x =>
        assert(x == math.floor(x * 1e6 + 0.5) / 1e6, s"off-grid: $x")
      }
  }
}
