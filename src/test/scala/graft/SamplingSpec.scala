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
}
