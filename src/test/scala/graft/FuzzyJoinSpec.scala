package graft

import org.apache.spark.sql.functions._
import graft.ops.FuzzyJoin
import graft.functions.DeletionHoods

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Reference edit distance (classic DP) for the brute-force oracle. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Deterministic dirty-strings fixture: substitutions, inserts,
    * deletes, transpositions (= lev 2), and exact duplicates, across
    * MIXED lengths so the deletion-neighborhood handles non-Hamming
    * cases. */
  private def fixture: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(7)
    val bases = Seq("wolfram", "spark", "catalyst", "tungsten",
      "shuffle", "parquet", "arrow", "beam")
    (0L until 400L).map { id =>
      val b = bases((id % bases.size).toInt)
      val s = (id / bases.size) % 5 match {
        case 0 => b
        case 1 => // substitution
          val i = rnd.nextInt(b.length)
          b.updated(i, ('a' + rnd.nextInt(26)).toChar)
        case 2 => // insertion
          val i = rnd.nextInt(b.length + 1)
          b.substring(0, i) + ('a' + rnd.nextInt(26)).toChar + b.substring(i)
        case 3 => // deletion
          val i = rnd.nextInt(b.length)
          b.substring(0, i) + b.substring(i + 1)
        case _ => // transposition (lev 2 unless adjacent chars equal)
          val i = rnd.nextInt(b.length - 1)
          b.substring(0, i) + b(i + 1) + b(i) + b.substring(i + 2)
      }
      (id, s)
    }
  }

  private def bruteForce(rows: Seq[(Long, String)], maxDist: Int) =
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib
      d = lev(sa, sb)
      if d <= maxDist
    } yield (ia, ib, d)).toSet

  test("matches brute-force levenshtein at maxDist = 1 (mixed lengths)") {
    val rows = fixture
    val got = FuzzyJoin
      .editDistanceJoin(rows.toDF("id", "s"), "id", "s", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == bruteForce(rows, 1))
  }

  test("matches brute-force levenshtein at maxDist = 2") {
    val rows = fixture.take(200)
    val got = FuzzyJoin
      .editDistanceJoin(rows.toDF("id", "s"), "id", "s", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == bruteForce(rows, 2))
  }

  test("exact duplicates on distinct ids surface at dist 0, once") {
    val rows = Seq((1L, "same"), (2L, "same"), (3L, "same"))
    val got = FuzzyJoin
      .editDistanceJoin(rows.toDF("id", "s"), "id", "s", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)))
  }

  test("deletion neighborhood: identity first, distinct keys, unicode-safe") {
    val df = Seq(("ab")).toDF("s")
      .select(DeletionHoods.hoods($"s", 2).as("h"))
    val h = df.as[Seq[Long]].head()
    // "ab" with <=2 deletions: {ab, b, a, ""} — 4 distinct keys
    assert(h.size == 4 && h.distinct.size == 4)
    // deletions count code points, not UTF-16 units: a surrogate-pair
    // char deletes as one unit
    val wide = Seq(("a😀b")).toDF("s")
      .select(size(DeletionHoods.hoods($"s", 1)).as("n")).as[Int].head()
    assert(wide == 4) // identity + 3 single-deletions
  }

  test("mass-duplicated keys: output equals the quadratic reference") {
    // 4 copies of "alpha", 2 of "alphb" (1 edit away), 1 of "omega":
    // the distinct-string machinery must still produce every id pair
    val rows = Seq(
      (1L, "alpha"), (2L, "alpha"), (3L, "alpha"), (4L, "alpha"),
      (5L, "alphb"), (6L, "alphb"), (7L, "omega"))
    val got = FuzzyJoin.editDistanceJoin(rows.toDF("id", "s"), "id", "s", 1)
      .as[(Long, Long, Int)].collect().toSet
    def lev(a: String, b: String): Int = // tiny reference
      if (a == b) 0
      else if (a.zip(b).count { case (x, y) => x != y } == 1
               && a.length == b.length) 1
      else 99
    val ref = (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib, lev(sa, sb))).toSet
    assert(got == ref)
    // 4 choose 2 + 2 choose 2 intra pairs + 4*2 inter pairs = 6+1+8
    assert(ref.size == 15)
  }

  test("delta vs hood index: no self-pairs, dist-0 within-delta pairs once, adoption kept") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hoodidx_").toString
    val store = Seq((1L, "alpha"), (2L, "omega")).toDF("id", "s")
    FuzzyJoin.writeHoodIndex(store, "id", "s", dir, maxDist = 1)
    // delta: id 1 re-sent unchanged (must NOT self-pair with its own
    // stored row), ids 10/11 equal strings (must pair once, id-ordered,
    // dist 0 — the within-delta branch a bare __s < __s_b drops), and
    // id 10 adopting store id 2's exact string
    val delta = Seq((1L, "alpha"), (10L, "omega"), (11L, "omega"))
      .toDF("id", "s")
    val got = FuzzyJoin
      .deltaEditDistancePairs(delta, "id", "s", dir, maxDist = 1)
      .as[(Long, Long, Int, Boolean)].collect().toSet
    assert(got == Set(
      (10L, 2L, 0, true),    // adoption: delta "omega" vs store id 2
      (11L, 2L, 0, true),
      (10L, 11L, 0, false)), // within-delta equal strings, id-ordered, once
      s"got $got")
  }

  test("plans with no cartesian/nested-loop join — blocking equi-join only") {
    val plan = FuzzyJoin
      .editDistanceJoin(fixture.toDF("id", "s"), "id", "s", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("hood index pin: foreign maxDist honored; mismatch/blockCols/pre-pin fail fast") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hood_pin").toString
    val store = Seq((1L, "alpha"), (2L, "omega")).toDF("id", "s")
    // a FOREIGN depth: 2, not the default 1
    FuzzyJoin.writeHoodIndex(store, "id", "s", dir, maxDist = 2)
    val m = graft.etl.StoreMeta.readParams(spark, dir)
    assert(m.exists(_.get("max_dist").contains("2")))
    // default probe (0 = resolve) finds a DIST-2 pair — proof the
    // pinned depth, not the old default of 1, generated the delta hoods
    val delta = Seq((10L, "alphaxy")).toDF("id", "s") // 2 edits from alpha
    val got = FuzzyJoin.deltaEditDistancePairs(delta, "id", "s", dir)
      .as[(Long, Long, Int, Boolean)].collect().toSet
    assert(got === Set((10L, 1L, 2, true)), s"got $got")
    // a disagreeing explicit depth fail-fasts
    val e1 = intercept[IllegalArgumentException] {
      FuzzyJoin.deltaEditDistancePairs(delta, "id", "s", dir, maxDist = 1)
    }
    assert(e1.getMessage.contains("maxDist=2"))
    // blockCols are hashed into every stored key: a differing probe
    // list fail-fasts instead of silently returning nothing
    val e2 = intercept[IllegalArgumentException] {
      FuzzyJoin.deltaEditDistancePairs(
        delta.withColumn("blk", lit(1)), "id", "s", dir,
        blockCols = Seq("blk"))
    }
    assert(e2.getMessage.contains("block"))
    // pre-pin (data, no sidecar) fail-fasts
    assert(new java.io.File(dir, "_graft_meta").delete())
    val e3 = intercept[IllegalArgumentException] {
      FuzzyJoin.deltaEditDistancePairs(delta, "id", "s", dir)
    }
    assert(e3.getMessage.contains("_graft_meta"))
  }
}
