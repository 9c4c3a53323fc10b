package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway diagnostic: connected-components cost split for d6 at a
  * given sf dir (pair generation vs CC, with round count). */
object DiagCC {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.Sessions.local("graft-diag-cc", cpusDefault = "32")
    val docs = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"DIAG $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val pairs = time("pairs") {
      graft.ops.Dedup.minHashNearDups(docs, "doc_id", "text", 0.8).localCheckpoint()
    }
    println("  edges=" + pairs.count())
    val (labels, rounds) = time("cc") {
      val r = graft.ops.Dedup.connectedComponentsWithRounds(pairs, "id_a", "id_b")
      r._1.count(); r
    }
    println("  rounds=" + rounds + " nodes=" + labels.count())
    spark.stop()
  }
}
