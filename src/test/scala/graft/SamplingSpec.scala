package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)

  test("split labels partition every row deterministically") {
    val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labeled = docs.withColumn("split",
      Sampling.splitLabel($"doc_id", fracs, "v1"))
    assert(labeled.filter($"split".isNull).count() == 0)
    val a = labeled.select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val b = docs.repartition(13) // different partitioning, same membership
      .withColumn("split", Sampling.splitLabel($"doc_id", fracs, "v1"))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(a == b)
    // rough proportions hold (hash uniformity, generous tolerance)
    val n = a.size.toDouble
    val trainFrac = a.values.count(_ == "train") / n
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train=$trainFrac")
  }

  test("different salts give independent splits; same salt is stable") {
    val s1 = Sampling.sampleByKey(docs, "doc_id", 0.5, "a")
      .select($"doc_id").as[Long].collect().toSet
    val s2 = Sampling.sampleByKey(docs, "doc_id", 0.5, "a")
      .select($"doc_id").as[Long].collect().toSet
    val s3 = Sampling.sampleByKey(docs, "doc_id", 0.5, "b")
      .select($"doc_id").as[Long].collect().toSet
    assert(s1 == s2)
    assert(s1 != s3, "different salt must resample")
  }

  test("stratified sample keeps only mapped strata at their fractions") {
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0, "zh" -> 0.0), "s")
    val langs = sampled.select($"lang").distinct().as[String].collect().toSet
    assert(langs == Set("en")) // zh at 0.0 and unmapped strata dropped
    assert(sampled.count() == docs.filter($"lang" === "en").count())
  }

  test("balanced rates equalize expected stratum counts at the min") {
    val docs = Tables.documents(spark, sfDir)
    val rates = graft.ops.Sampling.balancedRates(docs, "lang")
      .as[(String, Long, Double)].collect()
    val minN = rates.map(_._2).min
    rates.foreach { case (_, n, r) =>
      assert(math.abs(n * r - minN) < 1e-9)   // n * (min/n) == min
      assert(r > 0 && r <= 1.0)
    }
    assert(rates.exists(_._3 == 1.0))          // the smallest stratum keeps all
  }

  test("oov stats: head-vocab docs score 0, garble scores 1") {
    val docs = Seq(
      (1L, "a a a b b c"),     // all words in top-3 vocab
      (2L, "zz qq ww a"),      // 3 of 4 outside
      (3L, "a b c")
    ).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.oovStats(docs, "doc_id", "text", 3)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect()
    // vocab = top-3 by count desc, word asc: a(5), b(3), c(2)
    assert(got(0) == ((1L, 6L, 0L, 0.0)))
    assert(got(1)._3 == 3L && got(1)._4 == 0.75)
    assert(got(2) == ((3L, 3L, 0L, 0.0)))
  }
}
