package graft

import org.apache.spark.sql.functions._
import graft.ops.Quantize

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8: values land in [-127,127], extremes hit the rails, zero vec stays zero") {
    val df = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f)),
      (2L, Array(0.0f, 0.0f, 0.0f)),
      (3L, Array(-3.0f))
    ).toDF("id", "v")
    val got = df.select($"id", Quantize.int8($"v").as("q"))
      .as[(Long, Array[Double])].collect().toMap
    assert(got(1L).sameElements(Array(64.0, -127.0, 32.0))) // 1/2*127=63.5→floor(64)
    assert(got(2L).sameElements(Array(0.0, 0.0, 0.0)))
    assert(got(3L).sameElements(Array(-127.0)))
    got.values.flatten.foreach(q => assert(q >= -127 && q <= 127 && q == math.floor(q)))
  }

  test("quantized cosine approximates exact cosine on real embeddings") {
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("m", Quantize.maxAbs($"v"))
      .select($"vec_id", $"v", Quantize.int8($"v", $"m").as("qv"))
      .limit(50).cache()
    val a = e.select($"vec_id".as("ia"), $"v".as("va"), $"qv".as("qa"))
    val b = e.select($"vec_id".as("ib"), $"v".as("vb"), $"qv".as("qb"))
    val pairs = a.crossJoin(b).filter($"ia" < $"ib")
      .select(
        graft.functions.VectorFunctions.cosine($"va", $"vb").as("exact"),
        Quantize.cosine($"qa", $"qb").as("quant"))
      .as[(Double, Double)].collect()
    assert(pairs.nonEmpty)
    val maxErr = pairs.map { case (x, q) => math.abs(x - q) }.max
    assert(maxErr < 0.02, s"max quantization error $maxErr")
    e.unpersist()
  }

  test("v2 query: 5 ranked rows per probe, deterministic across runs") {
    val q = graft.analytics.VectorQueries.quantizedCosineTop5(spark, sfDir)
    val r1 = q.collect()
    val r2 = graft.analytics.VectorQueries.quantizedCosineTop5(spark, sfDir).collect()
    assert(r1.sameElements(r2))
    assert(r1.groupBy(_.getLong(0)).forall(_._2.length == 5))
  }
  test("pqTopK: a seed vector queries to itself at distance 0, rank 1") {
    import graft.ops.Quantize
    val e = Tables.embeddings(spark, sfDir)
    // corpus = the seeds themselves: each seed's codes reconstruct it
    // exactly, so its own ADC distance is 0 and it must rank first
    val seeds = e.filter(col("vec_id").isin(graft.analytics.VectorQueries.PqSeedIds: _*))
    val queries = seeds.select(col("vec_id").as("query_id"), col("embedding"))
    val top = Quantize.pqTopK(seeds, queries,
      graft.analytics.VectorQueries.PqSeedIds, k = 1)
    val rows = top.collect()
    assert(rows.length == graft.analytics.VectorQueries.PqSeedIds.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("query_id") == r.getAs[Long]("cand_id"))
      assert(math.abs(r.getAs[Double]("adc_dist")) < 1e-12)
    }
  }

  test("trained codebooks reduce total ADC self-distance vs seeded") {
    // the point of training: a vector's ADC distance to ITSELF (query
    // = corpus row) measures quantization error; trained codebooks
    // must not be worse in aggregate than the raw seed slices
    val e = Tables.embeddings(spark, sfDir)
    val q = e.limit(30).select($"vec_id".as("query_id"), $"embedding")
    def selfErr(df: org.apache.spark.sql.DataFrame): Double = df
      .where($"query_id" === $"cand_id").agg(sum($"adc_dist"))
      .as[Double].head()
    // seeded variant needs cand self-pairs: pqTopK keeps all ranks<=k
    val seeds = (0L until 8L)
    val seeded = graft.ops.Quantize.pqTopK(e, q, seeds, k = 200)
    val trained = graft.ops.Quantize.pqTopKTrained(e, q, k = 200)
    val (es, et) = (selfErr(seeded), selfErr(trained))
    assert(et <= es, s"training must not increase self-error: $es -> $et")
  }

  test("trained codebook cells sit on the 1e-6 grid (non-empty cells)") {
    val e = Tables.embeddings(spark, sfDir)
    val cb = graft.ops.Quantize.pqTrainCodebooks(
      e, "vec_id", "embedding", m = 8, subDim = 8, kw = 8)
    assert(cb.length == 8 * 8 * 8)
    // empty cells legitimately keep their raw seed slice (off-grid)
    val seedVals = e.filter($"vec_id" < 8)
      .select(explode($"embedding").as("x"))
      .select($"x".cast("double")).as[Double]
      .collect().toSet
    cb.foreach { x =>
      assert(x == math.floor(x * 1e6 + 0.5) / 1e6 || seedVals.contains(x),
        s"neither on-grid nor a seed value: $x")
    }
  }

  test("PqEncode: codes in range, argmin ties keep the lowest codeword index") {
    import graft.functions.ProductQuantizer
    // 2 subspaces x 2 dims; codewords 0 and 1 IDENTICAL, codeword 2 far
    val seeds = Seq(
      Array(1.0, 1.0, 5.0, 5.0),
      Array(1.0, 1.0, 5.0, 5.0),
      Array(9.0, 9.0, 0.0, 0.0))
    val cb = ProductQuantizer.flatten(seeds, m = 2, subDim = 2)
    val df = Seq((1L, Seq(1.1, 0.9, 4.8, 5.1)), (2L, Seq(8.0, 9.5, 0.2, 0.1)))
      .toDF("id", "v")
    val out = df.select(col("id"),
        ProductQuantizer.encode(col("v"), cb, m = 2, k = 3, subDim = 2).as("codes"))
      .orderBy("id").collect()
    // row 1: nearest is the duplicated codeword -> index 0 (not 1) in both subspaces
    assert(out(0).getSeq[Int](1) == Seq(0, 0))
    // row 2: nearest is codeword 2 in both subspaces
    assert(out(1).getSeq[Int](1) == Seq(2, 2))
  }
}
