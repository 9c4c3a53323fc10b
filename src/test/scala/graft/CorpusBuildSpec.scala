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

  test("c3 training mix: budget-exact, within-pool, deterministic composition") {
    val out = SparkEntry.queries("c3_training_mix")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    val poolTotal = out.map(_._2).sum
    // the integer-60% budget is hit exactly by the apportionment
    assert(out.map(_._4).sum === poolTotal * 6 / 10)
    // selection fills every allocation that fits its source pool
    assert(out.forall { case (_, np, _, al, ns, _) => ns === math.min(al, np) })
    // two runs agree exactly (the whole chain is deterministic)
    val again = SparkEntry.queries("c3_training_mix")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(5))).toMap
    assert(out.map(r => (r._1, r._6)).toMap === again)
  }

  test("c3b incremental refresh equals the one-shot c3 manifest, and replays steady-state") {
    def rows(name: String) = SparkEntry.queries(name)(spark, sfDir)
      .collect().map(_.toString).toSeq
    val batch = rows("c3_training_mix")
    val inc = rows("c3b_incremental_training_mix")
    assert(inc === batch, s"c3b (${inc.size} rows) must equal c3 (${batch.size})")
    // second call replays the refresh: every store append is a keyed
    // no-op and the fold finds no moved roots — identical manifest
    assert(rows("c3b_incremental_training_mix") === batch)
  }
}
