package graft.tools

/** Executed-plan audit of the mining face's join stage: prints every
  * Exchange / AQEShuffleRead / join / PartialTopK line so the
  * partition count feeding the EXPANDING shuffle join is visible —
  * the AQE-coalescing trap (input-sized coalescing starving an
  * output-expanded stage) is only diagnosable here or in a thread
  * dump, never in the logical plan. */
object DiagV3bPlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("diag-v3b-plan")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = graft.Tables.embeddings(spark, dir)
    val n = e.count()
    val mined = graft.ops.Similarity.hardNegativesIvfSeeded(
      e, DiagV3b.presentSeedIds(e, n), nProbe = 5)
    // Execute the Dataset's OWN QueryExecution (toRdd drives the same
    // AdaptiveSparkPlanExec this tool prints). A `mined.count()` here
    // would run a SEPARATE QueryExecution for the count aggregate and
    // leave `mined.queryExecution.executedPlan` an unexecuted
    // AdaptiveSparkPlan (isFinalPlan=false) — the AQEShuffleRead nodes
    // this audit exists to expose would never appear.
    mined.queryExecution.toRdd.foreach(_ => ())
    val plan = mined.queryExecution.executedPlan.toString
    plan.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("AQEShuffleRead") || l.contains("TopK"))
      .foreach(l => println("PLAN| " + l.take(170).trim))
    spark.stop()
  }
}
