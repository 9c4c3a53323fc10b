package graft

import graft.analytics.TextQueries

class CorpusBuildSpec extends SparkSpec {
  import spark.implicits._

  test("corpus build emits a non-degenerate manifest with valid splits") {
    val got = TextQueries.corpusBuild(spark, sfDir)
      .as[(String, String, Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.map(_._1).toSet.subsetOf(Set("train", "val", "test")))
    assert(got.forall(r => r._3 > 0 && r._4 > 0))
    // the quality gate + dedup actually drop something: manifest total
    // is strictly below the raw doc count
    val raw = Tables.documents(spark, sfDir).count()
    assert(got.map(_._3).sum < raw)
  }

  test("the whole pipeline costs two aggregation shuffles plus the output sort") {
    val plan = TextQueries.corpusBuild(spark, sfDir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 3, s"expected <=3 exchanges, got $exchanges:\n$plan")
  }
}
