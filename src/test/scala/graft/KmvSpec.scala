package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** Pins the KMV sketch family (functions.KmvSketch, ops.Sketches.kmv*):
  * the lossless minK merge law, in-buffer dedup, the exact sub-k
  * regime, the Beyer et al. estimator contract, bounded sketch size,
  * and the intersection/Jaccard estimate q26 gates. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int, tag: String = "id") =
    spark.range(n.toLong).selectExpr("'g' AS grp", s"concat('$tag', id) AS k")

  test("kmv sketch is the k smallest distinct mixed hashes (vs plain Scala)") {
    val n = 500
    val got = Sketches.kmvSketch(ids(n), "grp", "k")
      .select($"h").as[Long].collect().toVector
    // independent reference: mix every key on the Spark side ONCE via
    // the column expression (the mix itself is pinned against plain
    // Scala in SketchesSpec's hll64 test), then bottom-k in Scala
    val all = ids(n).select(Sketches.kmvHash($"k").as("h"))
      .as[Long].collect().toVector
    val ref = all.distinct.sorted.take(Sketches.KmvK)
    assert(got == ref)
    assert(got == got.sorted && got.distinct == got)
  }

  test("merge of store + delta equals full rebuild bit-for-bit") {
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_suppkey", $"l_orderkey")
    val base = Sketches.kmvSketch(
      li.filter($"l_orderkey" % 10 =!= 3), "l_returnflag", "l_suppkey")
    val delta = Sketches.kmvSketch(
      li.filter($"l_orderkey" % 10 === 3), "l_returnflag", "l_suppkey")
    val merged = Sketches.kmvMergeSketches(base, delta, "l_returnflag")
      .as[(String, Long)].collect().toSet
    val rebuild = Sketches.kmvSketch(li, "l_returnflag", "l_suppkey")
      .as[(String, Long)].collect().toSet
    assert(merged == rebuild)
  }

  test("three-way split merges to the same sketch as one pass") {
    val df = ids(2000)
    val parts = (0 until 3).map(i =>
      Sketches.kmvSketch(df.filter(pmod(crc32($"k"), lit(3)) === i), "grp", "k"))
    val merged = Sketches.kmvMergeSketches(
      Sketches.kmvMergeSketches(parts(0), parts(1), "grp"), parts(2), "grp")
      .select($"h").as[Long].collect().toVector
    val once = Sketches.kmvSketch(df, "grp", "k")
      .select($"h").as[Long].collect().toVector
    assert(merged == once)
  }

  test("duplication-invariant: a hot key cannot evict smaller minima") {
    val base = ids(200)
    // every key repeated 50x, in arrival orders Spark controls
    val dup = base.crossJoin(spark.range(50).select(lit(1).as("__x")))
      .select($"grp", $"k")
    val a = Sketches.kmvSketch(dup, "grp", "k").select($"h").as[Long].collect().toVector
    val b = Sketches.kmvSketch(base, "grp", "k").select($"h").as[Long].collect().toVector
    assert(a == b)
  }

  test("exact regime: below k distinct the estimate IS the count") {
    val df = ids(Sketches.KmvK - 5)
    val sk = Sketches.kmvSketch(df, "grp", "k")
    val est = sk.groupBy($"grp")
      .agg(count(lit(1)).as("n"), max($"h").as("mx"))
      .select(Sketches.kmvEstimate($"n", $"mx")).as[Double].collect().head
    assert(est == (Sketches.KmvK - 5).toDouble)
  }

  test("estimator holds its 3-sigma contract across three decades") {
    val rsd = 1.0 / math.sqrt((Sketches.KmvK - 2).toDouble)
    for (n <- Seq(100, 3000, 100000)) {
      val sk = Sketches.kmvSketch(ids(n, s"key${n}_"), "grp", "k")
      val est = sk.groupBy($"grp")
        .agg(count(lit(1)).as("n"), max($"h").as("mx"))
        .select(Sketches.kmvEstimate($"n", $"mx")).as[Double].collect().head
      assert(math.abs(est - n) <= n * 3 * rsd + 1.0,
        s"n=$n estimate $est outside 3 sigma")
    }
  }

  test("sketch stays k rows per group regardless of cardinality") {
    val sk = Sketches.kmvSketch(ids(50000), "grp", "k")
    assert(sk.count() == Sketches.KmvK.toLong)
  }

  test("intersection estimate tracks an engineered 1/3 Jaccard") {
    // A = [0, 2n), B = [n, 3n): |A ∩ B| = n, |A ∪ B| = 3n, J = 1/3
    val n = 3000
    def set(lo: Int, hi: Int) = spark.range(lo.toLong, hi.toLong)
      .selectExpr("'g' AS grp", "concat('v', id) AS k")
    val skA = Sketches.kmvSketch(set(0, 2 * n), "grp", "k").drop("grp")
    val skB = Sketches.kmvSketch(set(n, 3 * n), "grp", "k").drop("grp")
    val row = Sketches.kmvIntersect(skA, skB).collect().head
    val jac = row.getAs[Double]("jaccard_est")
    val inter = row.getAs[Double]("inter_est")
    val sigmaJ = 3.0 * math.sqrt(0.25 / Sketches.KmvK)
    assert(math.abs(jac - 1.0 / 3.0) <= sigmaJ, s"jaccard_est $jac")
    // union estimate RSD + jaccard noise: generous 50% band on |A ∩ B|
    assert(inter > 0.5 * n && inter < 1.5 * n, s"inter_est $inter")
  }

  test("difference estimate tracks the engineered 1/3-1/3-1/3 split") {
    // A = [0, 2n), B = [n, 3n): |A \ B| = |B \ A| = n, |A ∪ B| = 3n
    val n = 3000
    def set(lo: Int, hi: Int) = spark.range(lo.toLong, hi.toLong)
      .selectExpr("'g' AS grp", "concat('v', id) AS k")
    val skA = Sketches.kmvSketch(set(0, 2 * n), "grp", "k").drop("grp")
    val skB = Sketches.kmvSketch(set(n, 3 * n), "grp", "k").drop("grp")
    val row = Sketches.kmvDifference(skA, skB).collect().head
    val sigma = 3.0 * math.sqrt(0.25 / Sketches.KmvK)
    for (c <- Seq("n_a_only", "n_b_only")) {
      val frac = row.getAs[Long](c).toDouble / row.getAs[Long]("n_l")
      assert(math.abs(frac - 1.0 / 3.0) <= sigma, s"$c fraction $frac")
    }
    val est = row.getAs[Double]("a_minus_b_est")
    assert(est > 0.4 * n && est < 1.6 * n, s"a_minus_b_est $est")
    // identical sketches: both one-sided counts must be exactly zero
    val same = Sketches.kmvDifference(skA, skA).collect().head
    assert(same.getAs[Long]("n_a_only") == 0L &&
      same.getAs[Long]("n_b_only") == 0L &&
      same.getAs[Double]("a_minus_b_est") == 0.0)
  }

  test("disjoint sets estimate zero intersection") {
    def set(lo: Int, hi: Int) = spark.range(lo.toLong, hi.toLong)
      .selectExpr("'g' AS grp", "concat('w', id) AS k")
    val skA = Sketches.kmvSketch(set(0, 1000), "grp", "k").drop("grp")
    val skB = Sketches.kmvSketch(set(1000, 2000), "grp", "k").drop("grp")
    val row = Sketches.kmvIntersect(skA, skB).collect().head
    assert(row.getAs[Long]("n_inter") == 0L)
    assert(row.getAs[Double]("inter_est") == 0.0)
  }

  test("overlap matrix reproduces pairwise kmvIntersect on engineered slices") {
    // slices: A=[0,2n), B=[n,3n), C=[5n,6n)  — J(A,B)=1/3, C disjoint
    val n = 2000
    def slice(tag: String, lo: Int, hi: Int) =
      spark.range(lo.toLong, hi.toLong)
        .selectExpr(s"'$tag' AS grp", "concat('m', id) AS k")
    val df = slice("a", 0, 2 * n)
      .unionByName(slice("b", n, 3 * n))
      .unionByName(slice("c", 5 * n, 6 * n))
    val sk = Sketches.kmvSketch(df, "grp", "k")
    val m = Sketches.kmvOverlapMatrix(sk, "grp")
      .orderBy($"__ga", $"__gb")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(m.map(r => (r._1, r._2)) == Seq(("a", "b"), ("a", "c"), ("b", "c")))
    // each pair row must equal the standalone two-set intersection
    for ((ga, gb, nL, maxH, nInter) <- m) {
      val ref = Sketches.kmvIntersect(
        sk.filter($"grp" === ga).drop("grp"),
        sk.filter($"grp" === gb).drop("grp")).collect().head
      assert(nL == ref.getAs[Long]("n_l") && maxH == ref.getAs[Long]("max_h_l")
        && nInter == ref.getAs[Long]("n_inter"), s"pair ($ga,$gb)")
    }
    // the disjoint pairs see zero sketch intersection
    assert(m.filter(r => r._2 == "c").forall(_._5 == 0L))
  }

  test("sparse matrix = dense matrix filtered to shared-hash pairs (ov2 ≡ ov1|candidates)") {
    val n = 2000
    def slice(tag: String, lo: Int, hi: Int) =
      spark.range(lo.toLong, hi.toLong)
        .selectExpr(s"'$tag' AS grp", "concat('m', id) AS k")
    val df = slice("a", 0, 2 * n)
      .unionByName(slice("b", n, 3 * n))
      .unionByName(slice("c", 5 * n, 6 * n))
    val sk = Sketches.kmvSketch(df, "grp", "k").localCheckpoint()
    val dense = Sketches.kmvOverlapMatrix(sk, "grp")
      .as[(String, String, Long, Long, Long)].collect().toSet
    val cands = Sketches.kmvOverlapCandidates(sk, "grp")
      .as[(String, String)].collect().toSet
    val sparse = Sketches.kmvOverlapMatrixSparse(sk, "grp")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(sparse == dense.filter(r => cands.contains((r._1, r._2))))
    // soundness: every pair the sparse face dropped is provably disjoint
    assert(dense.filterNot(r => cands.contains((r._1, r._2))).forall(_._5 == 0L))
    // the overlapping (a,b) pair must survive the prescreen
    assert(cands.contains(("a", "b")))
  }

  test("prescreen keeps the pair frame output-sized on a many-source disjoint fixture") {
    // 40 mutually disjoint sources: S²/2 = 780 cross pairs, but no two
    // sources share a key — the candidate frame must be EMPTY
    val s = 40
    val df = spark.range(40000L)
      .selectExpr(s"concat('s', id % $s) AS grp", "concat('z', id) AS k")
    val sk = Sketches.kmvSketch(df, "grp", "k").localCheckpoint()
    assert(Sketches.kmvOverlapCandidates(sk, "grp").count() == 0L)
    assert(Sketches.kmvOverlapMatrixSparse(sk, "grp").count() == 0L)
    // the dense face still prices every pair — that is why it is the
    // small-S face and the sparse face the large-S one
    assert(Sketches.kmvOverlapMatrix(sk, "grp").count() == (s * (s - 1) / 2).toLong)
  }

  test("k-sweep pins the binomial error contract (32/128/512)") {
    // J = 1/3 engineered as in the intersection test; the Jaccard
    // estimate must sit inside its own k's 3-sigma band at every k —
    // the shrinking band IS the error contract the scaladoc states
    val n = 30000
    def set(lo: Int, hi: Int) = spark.range(lo.toLong, hi.toLong)
      .selectExpr("'g' AS grp", "concat('q', id) AS k")
    for (k <- Seq(32, 128, 512)) {
      val skA = Sketches.kmvSketch(set(0, 2 * n), "grp", "k", k).drop("grp")
      val skB = Sketches.kmvSketch(set(n, 3 * n), "grp", "k", k).drop("grp")
      val jac = Sketches.kmvIntersect(skA, skB, k)
        .collect().head.getAs[Double]("jaccard_est")
      val sigma = 3.0 * math.sqrt((1.0 / 3) * (2.0 / 3) / k)
      assert(math.abs(jac - 1.0 / 3.0) <= sigma,
        s"k=$k jaccard_est $jac outside 3 sigma ($sigma)")
    }
  }

  test("incremental matrix store equals the full-corpus matrix (ov1b ≡ ov1)") {
    val ov1 = SparkEntry.queries("ov1_overlap_matrix")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val ov1b = SparkEntry.queries("ov1b_overlap_store")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(ov1b == ov1)
    assert(ov1.nonEmpty && ov1.forall(_.last == true),
      "per-pair Jaccard contract must hold")
  }

  test("map-side partials: the plan is an ObjectHashAggregate with partial merge") {
    val plan = Sketches.kmvSketch(ids(100), "grp", "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(400))
    assert(plan.contains("partial_kmvsketch") || plan.contains("partial_"),
      "no partial aggregation stage:\n" + plan.take(800))
  }
}
