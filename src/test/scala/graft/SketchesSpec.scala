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

  test("count-min store + delta add-merge equals full rebuild exactly") {
    val ev = Tables.events(spark, sfDir).select($"user_id", $"event_id")
    val base = Sketches.countMin(ev.filter($"event_id" % 10 =!= 3), "user_id")
    val delta = Sketches.countMin(ev.filter($"event_id" % 10 === 3), "user_id")
    val merged = Sketches.cmMergeCells(base, delta)
      .as[(Int, Long, Long)].collect().toSet
    val rebuild = Sketches.countMin(ev, "user_id")
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == rebuild)
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

  test("hll mix + rho ladder equal an independent plain-Scala reference") {
    import graft.functions.PolyHash
    val keys = Tables.lineitem(spark, sfDir)
      .selectExpr("CAST(l_suppkey AS STRING) AS k").distinct()
      .as[String].collect()
    val M31 = 1L << 31
    def refMix(h: Long): Long = {
      var x = ((h >> 30) * Sketches.HllMixA(0) + (h & ((1L << 30) - 1))) % M31
      x = ((x ^ (x >> Sketches.HllMixShift(0))) * Sketches.HllMixA(1)) % M31
      x = ((x ^ (x >> Sketches.HllMixShift(1))) * Sketches.HllMixA(2)) % M31
      x ^ (x >> Sketches.HllMixShift(2))
    }
    def refRho(g: Long): Int = {
      val s = g / Sketches.HllM
      if (s == 0) Sketches.HllRhoCap
      else math.min(java.lang.Long.numberOfTrailingZeros(s) + 1,
        Sketches.HllRhoCap)
    }
    val got = Sketches.hllRegisters(
        Tables.lineitem(spark, sfDir)
          .selectExpr("CAST(l_suppkey AS STRING) AS k", "'g' AS grp")
          .distinct(),
        "grp", "k")
      .select($"bucket", $"reg").as[(Long, Int)].collect().toMap
    val ref = keys.map(k => refMix(PolyHash.hash(k)))
      .groupBy(g => g % Sketches.HllM)
      .map { case (b, gs) => b -> gs.map(refRho).max }
    assert(got == ref, s"spark=$got ref=$ref")
  }

  test("hll register merge of store + delta equals full rebuild exactly") {
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_suppkey", $"l_orderkey")
    val base = Sketches.hllRegisters(
      li.filter($"l_orderkey" % 10 =!= 3), "l_returnflag", "l_suppkey")
    val delta = Sketches.hllRegisters(
      li.filter($"l_orderkey" % 10 === 3), "l_returnflag", "l_suppkey")
    val merged = Sketches.hllMergeRegisters(base, delta, "l_returnflag")
      .select($"l_returnflag", $"bucket", $"reg")
      .as[(String, Long, Int)].collect().toSet
    val rebuild = Sketches.hllRegisters(li, "l_returnflag", "l_suppkey")
      .select($"l_returnflag", $"bucket", $"reg")
      .as[(String, Long, Int)].collect().toSet
    assert(merged == rebuild)
  }

  test("hll estimate holds its 3-sigma contract at 100k distinct keys") {
    val big = spark.range(100000L)
      .selectExpr("'g' AS grp", "CAST(id AS STRING) AS k")
    val est = Sketches.hllEstimates(
      Sketches.hllRegisters(big, "grp", "k"), "grp")
      .select($"estimate").as[Double].collect().head
    val rsd = 1.04 / math.sqrt(Sketches.HllM.toDouble)
    assert(math.abs(est - 100000.0) <= 100000.0 * 3 * rsd + 1.0,
      s"estimate $est vs exact 100000")
  }

  test("histogram merge of store + delta equals full rebuild exactly") {
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_extendedprice", $"l_orderkey")
    val base = Sketches.histBins(li.filter($"l_orderkey" % 10 =!= 3),
      "l_returnflag", "l_extendedprice", 1000.0)
    val delta = Sketches.histBins(li.filter($"l_orderkey" % 10 === 3),
      "l_returnflag", "l_extendedprice", 1000.0)
    val merged = Sketches.histMerge(base, delta, "l_returnflag")
      .as[(String, Long, Long)].collect().toSet
    val rebuild = Sketches.histBins(li, "l_returnflag", "l_extendedprice", 1000.0)
      .as[(String, Long, Long)].collect().toSet
    assert(merged == rebuild)
  }

  test("histogram median bin brackets the exact lower-median value") {
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_extendedprice")
    val bins = Sketches.histBins(li, "l_returnflag", "l_extendedprice", 1000.0)
    val med = Sketches.histMedianBin(bins, "l_returnflag")
      .select($"l_returnflag", $"median_bin", $"n", $"k")
      .as[(String, Long, Long, Long)].collect()
    assert(med.nonEmpty)
    val raw = li.as[(String, Double)].collect()
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted }
    med.foreach { case (g, bin, n, k) =>
      val vs = raw(g)
      assert(n == vs.length && k == (n + 1) / 2)
      val kth = vs((k - 1).toInt) // exact lower-median value
      assert(kth >= bin * 1000.0 && kth < (bin + 1) * 1000.0,
        s"$g: kth=$kth outside bin $bin")
    }
  }

  test("hll64 two-limb mix + rho ladder equal a plain-Scala reference") {
    import graft.functions.PolyHash
    val keys = Tables.lineitem(spark, sfDir)
      .selectExpr("CAST(l_suppkey AS STRING) AS k").distinct()
      .as[String].collect()
    val M31 = 1L << 31
    def refMix(h: Long): Long = {
      var x = ((h >> 30) * Sketches.HllMixA(0) + (h & ((1L << 30) - 1))) % M31
      x = ((x ^ (x >> Sketches.HllMixShift(0))) * Sketches.HllMixA(1)) % M31
      x = ((x ^ (x >> Sketches.HllMixShift(1))) * Sketches.HllMixA(2)) % M31
      x ^ (x >> Sketches.HllMixShift(2))
    }
    def refMix64(h: Long): Long = {
      val l1 = refMix(h)
      l1 * M31 + refMix(h ^ l1)
    }
    def refRho64(g: Long): Int = {
      val s = g / Sketches.HllM
      if (s == 0) Sketches.HllRhoCap64
      else math.min(java.lang.Long.numberOfTrailingZeros(s) + 1,
        Sketches.HllRhoCap64)
    }
    val got = Sketches.hllRegisters64(
        Tables.lineitem(spark, sfDir)
          .selectExpr("CAST(l_suppkey AS STRING) AS k", "'g' AS grp")
          .distinct(),
        "grp", "k")
      .select($"bucket", $"reg").as[(Long, Int)].collect().toMap
    val ref = keys.map(k => refMix64(PolyHash.hash(k)))
      .groupBy(g => g % Sketches.HllM)
      .map { case (b, gs) => b -> gs.map(refRho64).max }
    assert(got == ref, s"spark=$got ref=$ref")
  }

  test("hll64 register merge of store + delta equals full rebuild exactly") {
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_suppkey", $"l_orderkey")
    val base = Sketches.hllRegisters64(
      li.filter($"l_orderkey" % 10 =!= 3), "l_returnflag", "l_suppkey")
    val delta = Sketches.hllRegisters64(
      li.filter($"l_orderkey" % 10 === 3), "l_returnflag", "l_suppkey")
    val merged = Sketches.hllMergeRegisters(base, delta, "l_returnflag")
      .select($"l_returnflag", $"bucket", $"reg")
      .as[(String, Long, Int)].collect().toSet
    val rebuild = Sketches.hllRegisters64(li, "l_returnflag", "l_suppkey")
      .select($"l_returnflag", $"bucket", $"reg")
      .as[(String, Long, Int)].collect().toSet
    assert(merged == rebuild)
  }

  test("hll64 estimate holds its 3-sigma contract at 100k distinct keys") {
    // the two-limb lane's whole point is the higher geometric
    // ceiling; its LOW-cardinality accuracy must not regress vs the
    // 31-bit lane (same m, same estimator, same 1.04/sqrt(m) rsd)
    val big = spark.range(100000L)
      .selectExpr("'g' AS grp", "CAST(id AS STRING) AS k")
    val est = Sketches.hllEstimates(
      Sketches.hllRegisters64(big, "grp", "k"), "grp")
      .select($"estimate").as[Double].collect().head
    val rsd = 1.04 / math.sqrt(Sketches.HllM.toDouble)
    assert(math.abs(est - 100000.0) <= 100000.0 * 3 * rsd + 1.0,
      s"estimate $est vs exact 100000")
  }

  test("hll64 mixed values genuinely use the wide geometric range") {
    // rho > HllRhoCap (26) is impossible in the 31-bit lane; over
    // 100k keys the two-limb lane must produce at least one register
    // past it (P(all 100k suffixes have < 26 trailing zeros) ≈
    // (1 - 2^-26)^100k... the complement: expected count of rho>26
    // ≈ 100k/2^26 ≈ 0.0015 — too rare; assert the SPREAD instead:
    // some register must exceed the ~log2(100k/64) + 3 ≈ 14 level
    // only a healthy geometric tail reaches, and none may exceed the
    // 57 cap.
    val big = spark.range(100000L)
      .selectExpr("'g' AS grp", "CAST(id AS STRING) AS k")
    val regs = Sketches.hllRegisters64(big, "grp", "k")
      .select($"reg").as[Int].collect()
    assert(regs.forall(r => r >= 1 && r <= Sketches.HllRhoCap64))
    assert(regs.max >= 10, s"max rho ${regs.max} — degenerate tail")
  }

  test("hll registers stay sketch-sized regardless of cardinality") {
    val big = spark.range(100000L)
      .selectExpr("CAST(id % 3 AS STRING) AS grp", "CAST(id AS STRING) AS k")
    val n = Sketches.hllRegisters(big, "grp", "k").count()
    assert(n <= 3L * Sketches.HllM, s"register rows $n")
  }
}
