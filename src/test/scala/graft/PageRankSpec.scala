package graft

import graft.ops.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // 1 and 2 cite each other; 3 cites 1; 4 is cited by 3 but cites
  // nobody (dangling)
  private val edges = Seq(
    (1L, 2L), (2L, 1L), (3L, 1L), (3L, 4L))

  private def run(iters: Int = 3) =
    PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Double)].collect().toMap

  test("mass conserves to 1 with dangling redistribution") {
    val r = run()
    assert(r.keySet == Set(1L, 2L, 3L, 4L))
    assert(math.abs(r.values.sum - 1.0) < 1e-6, r.toString)
  }

  test("the most-cited node ranks highest; the uncited source lowest") {
    val r = run()
    assert(r(1L) == r.values.max) // cited by 2 and 3
    assert(r(3L) == r.values.min) // nobody cites 3
  }

  test("ranks sit exactly on the 1e-9 grid and repeat deterministically") {
    val r1 = run(); val r2 = run()
    assert(r1 == r2)
    r1.values.foreach { x =>
      assert(x == math.floor(x * 1e9 + 0.5) / 1e9, s"off-grid: $x")
    }
  }

  private def runPpr(seeds: Seq[Long], iters: Int = 3,
                     es: Seq[(Long, Long)] = edges) =
    PageRank.personalizedRanks(es.toDF("src", "dst"), "src", "dst",
        seeds.toDF("node"), "node", iters)
      .as[(Long, Double)].collect().toMap

  test("personalized: mass conserves and stays in the seed component") {
    // two disjoint symmetric triangles (aperiodic — a 2-cycle would
    // oscillate with period 2 and the seed/neighbor order would
    // depend on the parity of `iters`); seeds only in the first
    val twoComp = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L),
      (10L, 11L), (11L, 10L), (11L, 12L), (12L, 11L), (10L, 12L), (12L, 10L))
    val r = runPpr(Seq(1L), es = twoComp)
    assert(math.abs(r.values.sum - 1.0) < 1e-6, r.toString)
    // the unseeded component gets restart mass 0 and in-mass 0 —
    // EXACTLY zero at every round, not merely small
    assert(r(10L) == 0.0 && r(11L) == 0.0 && r(12L) == 0.0, r.toString)
    assert(r(1L) > r(2L) && r(1L) > r(3L),
      "the seed outranks its neighbors (restart bonus)")
  }

  test("personalized with ALL nodes as seeds degenerates to plain PageRank") {
    // s = 1/n everywhere makes the personalized update formula
    // identical to the uniform one; with n = 4 (power of two) 1/n is
    // binary-exact and ×s ≡ /n bit-for-bit, so equality is exact
    val all = Seq(1L, 2L, 3L, 4L)
    assert(runPpr(all) == run())
  }

  test("personalized: seeds absent from the graph are ignored, mass renormalizes") {
    val withGhost = runPpr(Seq(1L, 999L)) // 999 is no graph node
    val without = runPpr(Seq(1L))
    assert(withGhost == without)
  }

  test("label propagation: disjoint triangles converge to per-triangle communities") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L),
                  (10L, 11L), (11L, 12L), (12L, 10L))
    val labels = PageRank.labelPropagation(tri.toDF("src", "dst"), "src", "dst", 3)
      .as[(Long, Long)].collect().toMap
    assert(labels.keySet == Set(1L, 2L, 3L, 10L, 11L, 12L))
    assert(Set(1L, 2L, 3L).map(labels) == Set(1L))
    assert(Set(10L, 11L, 12L).map(labels) == Set(10L))
  }

  test("label propagation is deterministic and direction-agnostic") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val a = PageRank.labelPropagation(e.toDF("src", "dst"), "src", "dst", 3)
      .as[(Long, Long)].collect().toSet
    val rev = PageRank.labelPropagation(
        e.map(_.swap).toDF("src", "dst"), "src", "dst", 3)
      .as[(Long, Long)].collect().toSet
    assert(a == rev)
  }

  test("duplicate edges in the input do not double-count") {
    val dup = (edges ++ edges).toDF("src", "dst")
    val r = PageRank.ranks(dup, "src", "dst", 3)
      .as[(Long, Double)].collect().toMap
    assert(r == run())
  }
}
