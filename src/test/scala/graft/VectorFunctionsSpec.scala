package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{VecWeightedMean, VectorFunctions => VF}

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def wmean(rows: Seq[(Seq[Float], Double)]): Seq[Double] = {
    val b = rows.foldLeft(VecWeightedMean.zero)(VecWeightedMean.reduce)
    VecWeightedMean.finish(b)
  }

  test("weighted mean: single-row identity") {
    val v = Seq(1.0f, 2.0f, -3.5f)
    val out = wmean(Seq((v, 5.0)))
    v.zip(out).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
  }

  test("weighted mean: permutation invariance (within fp tolerance)") {
    val gen = Gen.listOfN(8, Gen.listOfN(4, Gen.chooseNum(-10f, 10f)))
    val rnd = new scala.util.Random(42)
    (0 until 50).foreach { i =>
      val vecs0 = gen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val rows = vecs0.zipWithIndex.map { case (v, j) => (v.toSeq, (j % 3 + 1).toDouble) }
      val a = wmean(rows)
      val b = wmean(rnd.shuffle(rows))
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
  }

  test("weighted mean: weight-scaling invariance") {
    val rows = Seq((Seq(1f, 2f), 1.0), (Seq(3f, 4f), 2.0))
    val scaled = rows.map { case (v, w) => (v, w * 7.0) }
    wmean(rows).zip(wmean(scaled)).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-12)
    }
  }

  test("weighted mean: zero total weight yields null") {
    assert(wmean(Seq((Seq(1f, 2f), 0.0))) == null)
  }

  test("weighted mean: merge of partial buffers equals single-pass") {
    val rows = (1 to 10).map(i => (Seq(i.toFloat, (i * 2).toFloat), (i % 4 + 1).toDouble))
    val (l, r) = rows.splitAt(4)
    val merged = VecWeightedMean.finish(VecWeightedMean.merge(
      l.foldLeft(VecWeightedMean.zero)(VecWeightedMean.reduce),
      r.foldLeft(VecWeightedMean.zero)(VecWeightedMean.reduce)))
    wmean(rows).zip(merged).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
  }

  test("cosine: self-similarity is 1, orthogonal is 0, opposite is -1") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(2.0, 0.0), Seq(-1.0, 0.0))
    ).toDF("a", "b")
    val got = df.select(VF.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
  }

  test("cosine: zero vector yields null") {
    val df = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
    assert(df.select(VF.cosine(col("a"), col("b"))).head.isNullAt(0))
  }

  test("udaf path matches manual computation on real data") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("label"), col("embedding"), lit(1.0).as("w"))
    val viaAgg = emb.groupBy("label")
      .agg(VecWeightedMean(col("embedding"), col("w")).as("vec"))
      .select(col("label"), element_at(col("vec"), 1).as("d0"))
      .orderBy("label").as[(Int, Double)].collect()
    val viaSql = Tables.embeddings(spark, sfDir)
      .select(col("label"), element_at(col("embedding"), 1).cast("double").as("x"))
      .groupBy("label").agg(avg(col("x")).as("d0"))
      .orderBy("label").as[(Int, Double)].collect()
    viaAgg.zip(viaSql).foreach { case ((l1, x), (l2, y)) =>
      assert(l1 == l2); assert(math.abs(x - y) < 1e-9)
    }
  }

  test("v3 hard negatives: never the planted duplicate, one per anchor") {
    val out = SparkEntry.queries("v3_hard_negatives")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nBase = Tables.embeddings(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("vec_id") < 2000).count()
    assert(out.length === 3 * nBase,
      "every anchor (original + twin + hard plant) gets a negative")
    // only base<->twin are mutual near-DUPS; the +2000000 hard plant is
    // a legitimate negative for everyone, and the twin for the plant
    assert(out.forall { case (a, n, _) =>
      if (a < 1000000L) n != a + 1000000L
      else if (a < 2000000L) n != a - 1000000L
      else true
    })
    // hard negatives live below the dup threshold but are HARD: each
    // anchor's planted neighbor at cosine ~0.95 beats the background
    assert(out.forall(_._3 < 0.99))
    assert(out.forall(_._3 > 0.9))
  }
}
