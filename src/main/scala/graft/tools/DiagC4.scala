package graft.tools

import org.apache.spark.sql.functions._

/** Stage-cost breakdown for c4_entity_resolution (pairs / agreement /
  * components) at an arbitrary SF dir. Run: DiagC4 <sfDir>. */
object DiagC4 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("diag-c4")
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val c = graft.Tables.customer(spark, dir)
    var t = System.nanoTime
    val unblocked = graft.ops.FuzzyJoin.editDistanceJoin(
      c, "c_custkey", "c_name", maxDist = 1).count()
    println(f"unblocked pairs=$unblocked in ${(System.nanoTime - t) / 1e9}%.2fs")
    t = System.nanoTime
    val agree = graft.ops.FuzzyJoin.editDistanceJoin(
        c, "c_custkey", "c_name", maxDist = 1,
        blockCols = Seq("c_mktsegment", "c_nationkey"))
      .select(col("id_a"), col("id_b"))
      .localCheckpoint()
    val nAgree = agree.count()
    println(f"blocked agree=$nAgree in ${(System.nanoTime - t) / 1e9}%.2fs")
    t = System.nanoTime
    val (comp, rounds) = graft.ops.Dedup.connectedComponentsWithRounds(agree, "id_a", "id_b")
    println(f"cc nodes=${comp.count()} rounds=$rounds in ${(System.nanoTime - t) / 1e9}%.2fs")
    spark.stop()
  }
}
