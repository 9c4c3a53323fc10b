package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** ANN recall-vs-probe-budget measurement (PERFORMANCE.md "ANN
  * recall"): for the sign-LSH multi-probe path (s1) and the IVF path
  * (s2-style), measure recall@10 against brute force across probe
  * settings — the one number a user choosing nBits/probeRadius/nProbe
  * actually needs. Local dev/bench tooling — not part of any
  * registered query plan.
  *
  * Usage: runMain graft.tools.RecallStudy <sfDir> [nQueries]
  * Prints a markdown table; paste into PERFORMANCE.md.
  */
object RecallStudy {

  private def topSets(df: DataFrame): Map[Long, Set[Long]] = {
    import df.sparkSession.implicits._
    df.select(col("query_id"), col("cand_id")).as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
  }

  private def recall(ann: DataFrame, bf: Map[Long, Set[Long]]): Double = {
    val a = topSets(ann)
    bf.map { case (q, s) =>
      a.getOrElse(q, Set.empty).intersect(s).size.toDouble / s.size
    }.sum / bf.size
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQueries = if (args.length > 1) args(1).toInt else 20
    val spark = graft.Sessions.local("graft-recall-study")
    val corpus = graft.Tables.embeddings(spark, sfDir).localCheckpoint()
    val n = corpus.count()
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val k = 10
    val bf = topSets(Similarity.bruteForceTopK(corpus, queries, k))

    println(s"## ANN recall@$k vs probe budget ($sfDir, n=$n, $nQueries queries)")
    println()
    println("| path | setting | probes | candidate frac (expected) | recall@10 | sec |")
    println("|---|---|---|---|---|---|")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    for (nBits <- Seq(8, 12); radius <- Seq(0, 1, 2)) {
      val lsh = new Similarity.SignRandomProjectionLsh(dim = 64, nBits = nBits)
      val nProbes = radius match {
        case 0 => 1
        case 1 => 1 + nBits
        case 2 => 1 + nBits + nBits * (nBits - 1) / 2
      }
      val frac = nProbes.toDouble / (1 << nBits)
      val (r, sec) = timed(recall(
        lsh.annTopK(corpus, queries, k, probeRadius = radius), bf))
      println(f"| sign-LSH | nBits=$nBits radius=$radius | $nProbes | $frac%.4f | $r%.3f | $sec%.1f |")
    }
    for (nProbe <- Seq(1, 2, 4, 8, 16)) {
      val (r, sec) = timed(recall(
        Similarity.ivfTopK(corpus, queries, k, nLists = 16, nProbe = nProbe), bf))
      println(f"| IVF k-means | nLists=16 nProbe=$nProbe | $nProbe | ${nProbe / 16.0}%.4f | $r%.3f | $sec%.1f |")
    }
    // The oracle-replayable quantizer pair the registered queries use:
    // SEEDED lists (s2 — fixed corpus-member seeds) vs TRAINED lists
    // (s2b — quantized-Lloyd centroids), same probe budgets, so the
    // "training buys recall at equal probe cost" claim is a curve, not
    // one point.
    val seedIds = graft.analytics.VectorQueries.IvfSeedIds
    for (nProbe <- Seq(1, 2, 4, 8)) {
      val (r, sec) = timed(recall(
        Similarity.ivfTopKSeeded(corpus, queries, k, seedIds, nProbe = nProbe), bf))
      println(f"| IVF seeded (s2) | 8 member-seed lists nProbe=$nProbe | $nProbe | ${nProbe / 8.0}%.4f | $r%.3f | $sec%.1f |")
    }
    for (kc <- Seq(8, 16); nProbe <- Seq(1, 2, 4, 8).filter(_ <= kc)) {
      val (r, sec) = timed(recall(
        Similarity.ivfTopKTrained(corpus, queries, k, kClusters = kc,
          rounds = 2, nProbe = nProbe), bf))
      println(f"| IVF trained (s2b) | k=$kc Lloyd rounds=2 nProbe=$nProbe | $nProbe | ${nProbe.toDouble / kc}%.4f | $r%.3f | $sec%.1f |")
    }
    // PQ: quality knob is the codebook (kw codewords per subspace),
    // not a probe count — every query scans all codes (ADC is the
    // compression face, not the pruning face). Self-matches are PQ
    // rank 1 by construction; drop them and take k+1 so the compared
    // sets are both "top-10 neighbors of someone else".
    def pqRecall(df: DataFrame): Double =
      recall(df.filter(col("cand_id") =!= col("query_id")), bf)
    locally {
      val (r, sec) = timed(pqRecall(graft.ops.Quantize.pqTopK(
        corpus, queries, graft.analytics.VectorQueries.PqSeedIds, k = k + 1)))
      println(f"| PQ seeded (s3) | m=8 subDim=8 kw=8 member seeds | all | 1.0000 | $r%.3f | $sec%.1f |")
    }
    for (kw <- Seq(4, 8, 16)) {
      val (r, sec) = timed(pqRecall(graft.ops.Quantize.pqTopKTrained(
        corpus, queries, k = k + 1, m = 8, subDim = 8, kw = kw)))
      println(f"| PQ trained (s3b) | m=8 subDim=8 kw=$kw Lloyd rounds=2 | all | 1.0000 | $r%.3f | $sec%.1f |")
    }
    spark.stop()
  }
}
