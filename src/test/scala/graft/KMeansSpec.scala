package graft

import graft.ops.KMeans

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters on orthogonal axes; ids 0 and 1 are the seeds
  private val points: Seq[(Long, Seq[Float])] = Seq(
    0L -> Seq(1.0f, 0.0f),   // seed cluster 0
    1L -> Seq(0.0f, 1.0f),   // seed cluster 1
    2L -> Seq(0.9f, 0.1f),
    3L -> Seq(0.8f, 0.0f),
    4L -> Seq(0.1f, 0.9f),
    5L -> Seq(0.0f, 0.7f))

  private def df = points.toDF("vec_id", "embedding")

  test("spherical assignment separates the two axis clusters") {
    val sizes = KMeans.lloydSummary(df, "vec_id", "embedding", k = 2, rounds = 2)
      .select("cluster_id", "n").as[(Long, Long)].collect().toMap
    assert(sizes === Map(0L -> 3L, 1L -> 3L))
  }

  test("centroid components sit exactly on the 1e-6 grid (oracle contract)") {
    val cnorms = KMeans.lloydSummary(df, "vec_id", "embedding", k = 2, rounds = 2)
      .select("cnorm").as[Double].collect()
    cnorms.foreach { x =>
      assert(x === math.floor(x * 1e6 + 0.5) / 1e6, s"cnorm off-grid: $x")
    }
  }

  test("a cluster that captures no points keeps its seed centroid") {
    // seeds 0 and 1 are IDENTICAL vectors: every point ties between
    // them and the tie rule (smallest cluster id) sends everything to
    // cluster 0 — cluster 1 stays empty through both rounds, reports
    // n=0, and its centroid must remain the (quantized-norm) seed
    val skew = Seq(
      0L -> Seq(1.0f, 0.0f),
      1L -> Seq(1.0f, 0.0f),
      2L -> Seq(2.0f, 0.0f),
      3L -> Seq(3.0f, 0.0f)).toDF("vec_id", "embedding")
    val out = KMeans.lloydSummary(skew, "vec_id", "embedding", k = 2, rounds = 2)
      .select("cluster_id", "n", "cnorm").as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(0L)._1 == 4L)
    assert(out(1L)._1 == 0L)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out(1L)._2 === r6(1.0)) // seed norm, not a NaN/zero mean
  }

  test("one round means no update: cnorm equals the seed norm") {
    val out = KMeans.lloydSummary(df, "vec_id", "embedding", k = 2, rounds = 1)
      .select("cluster_id", "cnorm").as[(Long, Double)].collect().toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out(0L) === r6(1.0))
    assert(out(1L) === r6(1.0))
  }
}
