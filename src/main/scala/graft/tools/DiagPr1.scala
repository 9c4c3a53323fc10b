package graft.tools
import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
/** Stage-level timing of pr1 at a given SF (diagnosed sf10: edge
  * derive+checkpoint 108 s, degree agg 57 s, rounds ~40 s each over
  * 117M edges / 1.6M nodes). Established that rounds are aggregation
  * throughput over the edge-linear contribution rows (a shuffle-hash
  * hint on the rank side moved nothing), so the scale invariant is
  * per-edge cost — flat at 2.5-2.9 us/edge across sf0.1 -> sf10. */
object DiagPr1 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("diag-pr1")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $name: ${(System.nanoTime()-t0)/1e9}%.1f s"); r
    }
    val pairs = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("c"),
        (lit(1000000L) + col("l_suppkey")).as("s"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
    val e = t("edge derive+checkpoint") {
      edges.repartition(col("src")).localCheckpoint()
    }
    println("[diag] edges=" + t("edge count")(e.count()))
    val base = t("degree agg") {
      e.select(explode(array(
          struct(col("src").as("node"), lit(1L).as("isrc")),
          struct(col("dst").as("node"), lit(0L).as("isrc")))).as("x"))
        .select(col("x.node").as("node"), col("x.isrc").as("isrc"))
        .groupBy(col("node")).agg(sum(col("isrc")).as("deg"))
        .localCheckpoint()
    }
    val n = t("n count")(base.count())
    println("[diag] nodes=" + n)
    var ranks = t("init ranks") {
      base.select(col("node"), col("deg"),
        (floor(lit(1.0)/n * lit(1e9) + lit(0.5))/lit(1e9)).as("rank")).localCheckpoint()
    }
    for (i <- 1 to 3) {
      ranks = t(s"round $i") {
        val contribs = ranks.filter(col("deg") > 0)
          .join(e, col("node") === col("src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(col("rank") / col("deg")).as("in_mass"))
        val dangling = ranks.filter(col("deg") === 0)
          .agg(coalesce(sum(col("rank")), lit(0.0)).as("dmass"))
        ranks.select(col("node"), col("deg"))
          .join(contribs, Seq("node"), "left")
          .crossJoin(broadcast(dangling))
          .select(col("node"), col("deg"),
            (floor((lit(0.15/n.toDouble) + lit(0.85) * (coalesce(col("in_mass"), lit(0.0)) + col("dmass")/n)) * lit(1e9) + lit(0.5))/lit(1e9)).as("rank"))
          .localCheckpoint()
      }
    }
    spark.stop()
  }
}
