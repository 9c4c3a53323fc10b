package graft.tools
import org.apache.spark.sql.functions._
import graft.Sessions
import graft.analytics.VectorQueries

/** v3c recall study: argmax agreement of the compressed-index mining
  * face (IVF probe → ADC pre-rank over PQ codes → exact re-rank)
  * against the bounded brute scan (v3), as a function of the rerank
  * budget R — the memory/recall knob: the index side stays m bytes per
  * vector regardless of R; R only sizes the raw-vector fetch.
  * Run with SPARK_GRAFT_SF_DIR; results → PERFORMANCE.md. */
object RecallV3c {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("recall-v3c")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val e = VectorQueries.hardNegFixture(spark, dir, "embedding")
    val brute = VectorQueries.hardNegatives(spark, dir)
      .select(col("vec_id"), col("neg_id").as("brute_neg"))
      .localCheckpoint()
    val n = brute.count()
    for (r <- Seq(5, 10, 25, 50, 100)) {
      val t0 = System.nanoTime()
      val pq = graft.ops.Similarity.hardNegativesPqSeeded(
        e, VectorQueries.IvfSeedIds, VectorQueries.PqSeedIds,
        nProbe = 5, rerank = r)
      val agree = pq.join(brute, Seq("vec_id"))
        .filter(col("neg_id") === col("brute_neg")).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[recall] rerank=$r%3d agree=$agree%d/$n%d " +
        f"recall=${agree.toDouble / n}%.4f elapsed=$secs%.1f s")
    }
    spark.stop()
  }
}
