package graft.tools
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("plan-probe", cpusDefault = "2")
    val dir = "/root/testdata/sf0.001"
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString.linesIterator
        .count(l => l.contains("Exchange hashpartitioning") || l.contains("Exchange rangepartitioning"))
    val w11 = graft.analytics.CoreQueries.sessionize(spark, dir)
    w11.collect()
    println("w11 exchanges = " + exchanges(w11))
    val t25 = graft.analytics.TextQueries.gopherRules(spark, dir)
    t25.collect()
    println("t25 exchanges = " + exchanges(t25))
    println("t25 scan: " + t25.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("ReadSchema")).mkString)
    val d12 = graft.analytics.TextQueries.dsirSelect(spark, dir)
    d12.collect()
    println("d12 exchanges = " + exchanges(d12))
    val s3 = graft.analytics.VectorQueries.pqAdcTopK(spark, dir)
    s3.collect()
    println("s3 exchanges = " + exchanges(s3))
    println("=== d12 final plan exchanges ===")
    d12.queryExecution.executedPlan.toString.linesIterator
      .zipWithIndex.takeWhile(!_._1.contains("Initial Plan")).map(_._1)
      .filter(l => l.contains("Exchange") || l.contains("Aggregate") || l.contains("Join") || l.contains("Checkpoint") || l.contains("Scan"))
      .foreach(l => println(l.take(150)))
    spark.stop()
  }
}
