package graft

import org.apache.spark.sql.functions._
import graft.ops.Triangles

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def count3(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("u", "v"), "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two disjoint triangles: each corner counts one") {
    val m = count3(Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L), (12L, 10L)))
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L, 12L -> 1L))
  }

  test("square without diagonals has no triangles") {
    assert(count3(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) === Map.empty)
  }

  test("K4 yields four triangles, each node in three") {
    val m = count3(for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b))
    assert(m === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // total triangles = sum/3 = C(4,3)
    assert(m.values.sum === 12L)
  }

  test("hub star plus one closure: exactly one triangle at the hub") {
    // hub 0 connected to 1..10, plus edge (1,2): only triangle {0,1,2}
    val m = count3((1L to 10L).map(i => (0L, i)) :+ (1L, 2L))
    assert(m === Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("direction, duplication and self-loops are normalized away") {
    val m = count3(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (3L, 1L)))
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("matches the quadratic reference on a seeded random graph") {
    val rnd = new scala.util.Random(11)
    val edges = (for (a <- 0L until 40L; b <- (a + 1) until 40L
                      if rnd.nextDouble() < 0.2) yield (a, b)).toIndexedSeq
    val es = edges.toSet
    val ref = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (a <- 0L until 40L; b <- (a + 1) until 40L; c <- (b + 1) until 40L
         if es((a, b)) && es((b, c)) && es((a, c))) {
      ref(a) += 1; ref(b) += 1; ref(c) += 1
    }
    assert(count3(edges) === ref.toMap)
  }

  private def merged(base: Seq[(Long, Long)],
                     delta: Seq[(Long, Long)]): Map[Long, Long] = {
    val baseDf = base.toDF("u", "v")
    Triangles.mergeTriangleCounts(
        Triangles.perNode(baseDf, "u", "v"),
        // stored edges are normalized by construction in the store path
        baseDf.select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v"))
          .distinct(),
        delta.toDF("u", "v"), "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("incremental merge equals a full recount across engineered deltas") {
    // (a) delta closes a wedge; (b) delta edge between two new nodes
    // forming a triangle with 2 novel edges; (c) pure-delta triangle
    // (all 3 edges novel); (d) delta replays a stored edge (no-op)
    val base = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (7L, 5L))
    val deltas = Seq(
      Seq((3L, 1L)),                               // closes {1,2,3}
      Seq((2L, 8L), (8L, 1L)),                     // {1,2,8}: 2 novel edges
      Seq((20L, 21L), (21L, 22L), (22L, 20L)),     // all-novel triangle
      Seq((5L, 6L)),                               // replay: adds nothing
      Seq((3L, 1L), (2L, 8L), (8L, 1L), (6L, 1L))) // mixed batch
    for (d <- deltas) {
      assert(merged(base, d) === count3(base ++ d),
        s"delta $d must equal the full recount")
    }
  }

  test("incremental merge equals a full recount on a seeded random split") {
    val rnd = new scala.util.Random(7)
    val edges = (for (a <- 0L until 30L; b <- (a + 1) until 30L
                      if rnd.nextDouble() < 0.25) yield (a, b)).toIndexedSeq
    val (delta, base) = edges.partition { case (u, v) => (u * 31 + v) % 10 == 3 }
    assert(delta.nonEmpty && base.nonEmpty)
    assert(merged(base, delta) === count3(edges))
  }

  test("st21 streamed triangle counts equal tc1 through 4 real micro-batches") {
    val tc1 = SparkEntry.queries("tc1_triangles")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val st21 = SparkEntry.queries("st21_stream_triangles")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(st21 === tc1)
  }

  test("tc2 query equals tc1 on real data") {
    val tc1 = SparkEntry.queries("tc1_triangles")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val tc2 = SparkEntry.queries("tc2_triangle_store")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(tc2 === tc1)
    assert(tc1.nonEmpty)
  }
}
