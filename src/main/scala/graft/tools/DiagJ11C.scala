package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.SetSimJoin

/** The j11c zero-exchange claim at the sf100 point (r8 verdict ask):
  * build the plain (j11b) and BUCKETED (j11c) token stores over 90% of
  * the sf100 corpus, run the incremental set-sim join of the 10% delta
  * against each, and report wall seconds plus the number of Exchange
  * nodes each plan schedules. The bucketed catalog store's document-
  * frequency aggregate reads pre-clustered buckets — on a networked
  * cluster that is the daily job's corpus-sized shuffle gone; this
  * measures how much of it an in-process local[32] run can even see.
  *
  * Usage: runMain graft.tools.DiagJ11C [sfDir] [buckets]
  */
object DiagJ11C {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("diag-j11c")
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft_sf100")
    val buckets = if (args.length > 1) args(1).toInt else 32
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[j11c] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString()
        .linesIterator.count(_.contains("Exchange"))
    // the claim under test is about CORPUS-SIZED movement: count the
    // Exchange nodes whose input subtree scans the store relation
    // (delta-sized exchanges are three orders of magnitude smaller).
    // AQE hides the physical tree behind AdaptiveSparkPlanExec until
    // execution, so the probe plans a fresh copy with AQE off.
    def storeExchanges(mk: => org.apache.spark.sql.DataFrame,
                       storeId: String): Int = {
      val old = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val df = mk
        import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
        import org.apache.spark.sql.execution.exchange.Exchange
        def walk(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(walk)
        def scansStore(p: SparkPlan): Boolean = walk(p).exists {
          case f: FileSourceScanExec =>
            f.relation.location.rootPaths.exists(_.toString.contains(storeId))
          case _ => false
        }
        walk(df.queryExecution.executedPlan)
          .collect { case e: Exchange if scansStore(e.child) => e }.size
      } finally spark.conf.set("spark.sql.adaptive.enabled", old)
    }

    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val delta = docs.filter(col("doc_id") % 10 === 3)
    val corpus = docs.filter(col("doc_id") % 10 =!= 3)

    val plainPath = "/tmp/j11b_store_diag"
    t("write plain store (j11b)") {
      SetSimJoin.writeTokenStore(corpus, "doc_id", "text", plainPath)
    }
    val plain = SetSimJoin.incrementalJaccardJoin(
      delta, "doc_id", "text", plainPath, 0.7)
    println(s"[j11c] plain plan Exchanges = ${exchanges(plain)} " +
      s"(store-scanning: ${storeExchanges(SetSimJoin.incrementalJaccardJoin(
        delta, "doc_id", "text", plainPath, 0.7), plainPath)})")
    val nPlain = t("incremental join (plain store)") { plain.count() }
    println(s"[j11c] plain pairs = $nPlain")

    val table = s"ss_diag_${math.abs(dir.hashCode)}"
    t("write bucketed store (j11c)") {
      SetSimJoin.writeBucketedTokenStore(
        corpus, "doc_id", "text", table, buckets = buckets)
    }
    val bucketed = SetSimJoin.incrementalJaccardJoinBucketed(
      delta, "doc_id", "text", table, 0.7)
    println(s"[j11c] bucketed plan Exchanges = ${exchanges(bucketed)} " +
      s"(store-scanning: ${storeExchanges(SetSimJoin.incrementalJaccardJoinBucketed(
        delta, "doc_id", "text", table, 0.7), table)})")
    val nBucketed = t("incremental join (bucketed store)") { bucketed.count() }
    println(s"[j11c] bucketed pairs = $nBucketed")
    assert(nPlain == nBucketed, s"pair counts differ: $nPlain vs $nBucketed")
    spark.stop()
  }
}
