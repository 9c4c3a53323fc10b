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
}
