package graft

import org.apache.spark.sql.functions._
import graft.analytics.VectorQueries
import graft.ops.Similarity

/** v3b — the ANN-shortlist hard-negative face must agree with the
  * bounded all-pairs scan (v3) on the planted fixture: a hard negative
  * is by definition near its anchor (the fixture plants one per base
  * vector at cosine ~0.95), which is exactly the vector the IVF probe
  * finds; nProbe=5 of 8 lists covers boundary-straddling clusters. */
class HardNegativesSpec extends SparkSpec {

  private def fixture =
    VectorQueries.hardNegFixture(spark, sfDir, "embedding")

  private def collectTriples(df: org.apache.spark.sql.DataFrame) =
    df.select(col("vec_id"), col("neg_id"), round(col("cosine"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("seeded shortlist equals the bounded scan on the planted fixture") {
    val brute = collectTriples(VectorQueries.hardNegatives(spark, sfDir))
    val short = collectTriples(VectorQueries.hardNegativesAnn(spark, sfDir))
    assert(short === brute)
    assert(short.size === fixture.count(), "one hard negative per anchor")
  }

  test("the near-duplicate constraint excludes the planted twin; plants are found") {
    val rows = VectorQueries.hardNegativesAnn(spark, sfDir)
      .select(col("vec_id"), col("neg_id"), col("cosine")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // only base (+0) and twin (+1000000) are mutual near-DUPLICATES
    // (cosine ~0.9999995); the hard plant at +2000000 is a legitimate
    // negative for everyone, and the twin is a legitimate negative for
    // the PLANT anchor
    assert(rows.forall { case (a, n, _) =>
      if (a < 1000000L) n != a + 1000000L
      else if (a < 2000000L) n != a - 1000000L
      else true
    }, "a dup pair must never be mined as a negative")
    // every anchor's mined negative is planted-hard, not background:
    // the whole point of the mining operator
    assert(rows.forall(_._3 > 0.9), "negatives must be hard (cos > 0.9)")
  }

  test("mining face plan: NO broadcast of any corpus-derived frame, no cartesian") {
    // the round-9 scale finding: the anchors-probe frame is corpus ×
    // nProbe rows carrying full vectors — an explicit broadcast() hint
    // there collects 5× the corpus to the driver at scale. An explicit
    // hint survives autoBroadcastJoinThreshold=-1, so with the
    // threshold off and AQE off, ANY BroadcastExchange in the static
    // plan can only come from a forced hint — assert there is none.
    // (At runtime AQE may still upgrade the shuffle join to broadcast
    // when the probe side MEASURES small — that is the size-awareness
    // working, not a regression.)
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    val thr = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Similarity.hardNegativesIvfSeeded(
          fixture, VectorQueries.IvfSeedIds, nProbe = 5)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"mining face must not force a broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    }
  }

  test("compressed-index face (v3c) equals the bounded scan on the planted fixture") {
    // PQ quantization error must not cost the argmax: the planted hard
    // negative (cosine ~0.95 vs ~0.35 background) survives the ADC
    // pre-rank into the top-10 rerank shortlist, and the dup filter on
    // the EXACT similarity still excludes the planted twin
    val brute = collectTriples(VectorQueries.hardNegatives(spark, sfDir))
    val pq = collectTriples(VectorQueries.hardNegativesPq(spark, sfDir))
    assert(pq === brute)
  }

  test("v3c plan: codes-only index side, no forced broadcast of corpus frames") {
    val conf = spark.conf
    val aqe = conf.get("spark.sql.adaptive.enabled", "true")
    val thr = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = graft.ops.Similarity.hardNegativesPqSeeded(
          fixture, VectorQueries.IvfSeedIds, VectorQueries.PqSeedIds,
          nProbe = 5, rerank = 10)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"compressed mining face must not force a broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    }
  }

  test("trained-quantizer variant also equals brute force on the fixture") {
    val brute = collectTriples(VectorQueries.hardNegatives(spark, sfDir))
    val trained = collectTriples(
      Similarity.hardNegativesIvfTrained(fixture, kClusters = 8, rounds = 2,
          nProbe = 6)
        .select(col("vec_id"), col("neg_id"),
          graft.functions.Rounding.exactRound(col("cosine"), 6).as("cosine")))
    assert(trained === brute)
  }
}
