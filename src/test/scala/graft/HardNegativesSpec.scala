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
