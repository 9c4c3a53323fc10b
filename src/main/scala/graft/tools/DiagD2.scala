package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway diagnostic: stage-by-stage timing of the d2 MinHash
  * near-dup pipeline at a given sf dir. Dev tooling, not a registered
  * query. */
object DiagD2 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.Sessions.local("graft-diag-d2", cpusDefault = "32")
    val docs = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"DIAG $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // stage 1: per-doc signatures + sets (one aggregate), checkpointed
    val perDoc = time("perDoc agg+checkpoint") {
      graft.ops.Dedup.minHashPerDoc(docs, "doc_id", "text", 32, 3)
        .localCheckpoint()
    }
    time("perDoc count")(println("  rows=" + perDoc.count()))

    // stage 2: band rows
    val banded = time("banded explode") {
      graft.ops.Dedup.bandedFromPerDoc(perDoc, 32, 8).localCheckpoint()
    }
    time("banded count")(println("  rows=" + banded.count()))

    // stage 3: band self-join + distinct
    val a = banded.select(col("band"), col("band_hash"), col("__id").as("id_a"))
    val b = banded.select(col("band"), col("band_hash"), col("__id").as("id_b"))
    val candidates = time("band join + distinct") {
      a.join(b, Seq("band", "band_hash"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct().localCheckpoint()
    }
    time("candidates count")(println("  rows=" + candidates.count()))

    // stage 4: verify joins (current pruned shape)
    val withSh = perDoc.select(col("__id"), col("__sh"))
    val candIds = candidates.select(col("id_a").as("__id"))
      .union(candidates.select(col("id_b").as("__id"))).distinct()
    val neededSh = time("prune sets") {
      withSh.join(broadcast(candIds), Seq("__id")).localCheckpoint()
    }
    time("verify joins") {
      val out = candidates
        .join(neededSh.select(col("__id").as("id_a"), col("__sh").as("sh_a")), Seq("id_a"))
        .join(neededSh.select(col("__id").as("id_b"), col("__sh").as("sh_b")), Seq("id_b"))
        .withColumn("jaccard", graft.ops.Dedup.jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= 0.8)
      println("  pairs=" + out.count())
    }
    spark.stop()
  }
}
