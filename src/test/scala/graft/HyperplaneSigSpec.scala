package graft

import org.apache.spark.sql.functions._
import graft.functions.HyperplaneSig
import graft.ops.Dedup

class HyperplaneSigSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala reference: same lattice, same ascending-dim sum. */
  private def refSig(v: Array[Double], bands: Int, bits: Int): Seq[Long] =
    (0 until bands).map { b =>
      (0 until bits).foldLeft(0L) { (acc, j) =>
        val i = b * bits + j
        val dot = v.indices.map(d => v(d) * HyperplaneSig.coeff(i, d, v.length)).sum
        if (dot >= 0.0) acc | (1L << j) else acc
      }
    }

  test("expression matches the plain-Scala reference on real vectors") {
    val rows = Tables.embeddings(spark, sfDir).limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("sig", HyperplaneSig.bandSigs(col("v"), 4, 16))
      .select(col("vec_id"), col("v"), col("sig"))
      .as[(Long, Array[Double], Array[Long])].collect()
    assert(rows.nonEmpty)
    for ((id, v, sig) <- rows)
      assert(sig.toSeq === refSig(v, 4, 16), s"vec $id")
  }

  test("all bands·bits hyperplanes are pairwise distinct at representative dims") {
    // The raw-LCG lattice this guards against made h_i ≡ h_j whenever
    // dim·(i−j) ≡ 0 (mod 2048): at dim 1024 only 2 of 64 hyperplanes
    // were distinct. splitmix64 must yield 64 distinct vectors at every
    // production-shaped dim.
    for (dim <- Seq(64, 128, 768, 1024)) {
      val planes = (0 until 4 * 16).map(i =>
        (0 until dim).map(d => HyperplaneSig.coeff(i, d, dim)).toVector)
      assert(planes.distinct.size === planes.size, s"dim=$dim")
      // and no pair is a negation either (a negated plane carries the
      // same partitioning information — zero marginal bits)
      val canon = planes.map { p =>
        val n = p.map(-_)
        if (Ordering.Implicits.seqOrdering[Vector, Long].lt(p, n)) p else n
      }
      assert(canon.distinct.size === planes.size, s"dim=$dim (negation)")
    }
  }

  test("coeff distribution is balanced (mixer sanity)") {
    val vals = (0 until 64).flatMap(i =>
      (0 until 256).map(d => HyperplaneSig.coeff(i, d, 256)))
    val mean = vals.map(_.toDouble).sum / vals.size
    assert(math.abs(mean) < 30.0, s"mean $mean")  // ±1024 range, n=16384
    assert(vals.min >= -1024L && vals.max <= 1023L)
  }

  test("near-identical vectors share every band; far pairs do not") {
    val v = Array.tabulate(64)(d => math.sin(d + 1.0))
    val w = v.clone(); w(0) += 1e-6
    val far = v.map(-_)
    assert(refSig(v, 4, 16) === refSig(w, 4, 16))
    // the antipode flips every dot sign: all bands must differ
    val (sv, sf) = (refSig(v, 4, 16), refSig(far, 4, 16))
    assert(sv.zip(sf).forall { case (a, b) => a != b })
  }

  test("LSH near-dups equal brute force on the planted fixture") {
    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val pert = base.select((col("vec_id") + 1000000L).as("vec_id"),
      concat(array(element_at(col("embedding"), 1) + lit(0.001)),
        slice(col("embedding"), 2, 100000)).as("embedding"))
    val all = base.unionByName(pert)
    val lsh = Dedup.hyperplaneNearDups(all, "vec_id", "embedding", 0.9)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = Dedup.embeddingNearDups(all, "vec_id", "embedding", 0.9)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh === brute)
    assert(lsh.size === base.count(), "one pair per planted copy")
  }
}
