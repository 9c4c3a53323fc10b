package graft.tools
import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}

/** UNCAPPED hard-negative mining (v3b's production face): every vector
  * in the embeddings table is an anchor — the regime where the round-9
  * fixture's `vec_id < 2000` cap hid the old forced-broadcast plan's
  * failure (probes = corpus × nProbe rows with full vectors collected
  * to the driver). Run per decade with SPARK_GRAFT_SF_DIR.
  *
  * Quantizer sizing follows the balanced √n rule (the d11/SemDeDup
  * discipline): nLists = ceil(√n) member seeds at every `step`-th id,
  * so assignment work (n·√n centroid scans, map-only in the
  * NearestCentroid expressions) and candidate volume (n·nProbe·√n
  * pairs) balance — the model cost is Θ(n^1.5) at fixed nProbe, and
  * the honest scale question per decade is "measured ratio vs the
  * 10^1.5 ≈ 31.6× model", not vs linear. (Real trillion-row indexes
  * cut the assignment term with a centroid HNSW; the candidate term
  * is the same.) */
object DiagV3b {
  /** √n member-seed ids drawn from the ids ACTUALLY PRESENT in the
    * table. The first formulation assumed a contiguous 0..n-1 id
    * space (`0 until n by step`) — but ScaleUp shifts replica ids by
    * 10^8, so at sf10 only 5 of the intended 447 seed ids existed,
    * the quantizer silently degenerated to ~5 giant lists, and the
    * "shortlist" mining ran 40 BILLION pairs (all-pairs) instead of
    * the model's 447M — an 89× volume inflation that read as
    * over-model wall clock across two rounds (DiagV3bVolume is the
    * audit that caught it). The k smallest ids are always real. */
  def presentSeedIds(e: org.apache.spark.sql.DataFrame, n: Long): Seq[Long] = {
    val k = math.max(1L, math.ceil(math.sqrt(n.toDouble)).toLong).toInt
    e.select(org.apache.spark.sql.functions.col("vec_id"))
      .orderBy("vec_id").limit(k)
      .collect().map(_.getLong(0)).toSeq
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("diag-v3b")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nProbe = sys.env.getOrElse("SPARK_GRAFT_NPROBE", "5").toInt
    // saltLanes sweep knob (PERFORMANCE.md lane table): forwards to
    // the graft.ivf.saltLanes session conf ivfCandidates reads
    sys.env.get("SPARK_GRAFT_SALT_LANES")
      .foreach(v => spark.conf.set("graft.ivf.saltLanes", v))
    val e = Tables.embeddings(spark, dir)
    val n = e.count()
    val seedIds = presentSeedIds(e, n)
    println(s"[diag] dir=$dir n=$n nLists=${seedIds.size} nProbe=$nProbe")
    val t0 = System.nanoTime()
    val mined = graft.ops.Similarity.hardNegativesIvfSeeded(
      e, seedIds, nProbe = nProbe)
    val rows = mined.count()
    val secs = (System.nanoTime() - t0) / 1e9
    // every anchor must mine a negative (probed lists are never empty:
    // an anchor's own list is always probed and holds its neighbors)
    println(f"[diag] anchors_out=$rows%d of $n%d elapsed=$secs%.1f s")
    val plan = mined.queryExecution.executedPlan.toString
    println(s"[diag] broadcast_exchanges=" +
      plan.linesIterator.count(_.contains("BroadcastExchange")))
    spark.stop()
  }
}
