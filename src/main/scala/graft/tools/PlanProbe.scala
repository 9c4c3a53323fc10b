package graft.tools

/** Plan audit for the round's newest operators: exchange counts and
  * the join/aggregate skeleton, run on sf0.001. Dev tool (re-pointed
  * at each round's additions; earlier rounds' numbers are recorded in
  * PERFORMANCE.md). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("plan-probe", cpusDefault = "2")
    val dir = "/root/testdata/sf0.001"
    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val ex = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") || l.contains("Exchange rangepartitioning"))
      println(s"=== $name: $ex hash/range exchanges ===")
      plan.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join") ||
          l.contains("HashAggregate") || l.contains("Window") || l.contains("Sort "))
        .foreach(l => println("  " + l.take(140).trim))
    }
    audit("q23_hll_store", graft.analytics.SketchQueries.hllRegisterStore(spark, dir))
    audit("q24_hist_store", graft.analytics.SketchQueries.histQuantileStore(spark, dir))
    audit("w17_point_in_time", graft.analytics.CoreQueries.pointInTimeRollup(spark, dir))
    spark.stop()
  }
}
