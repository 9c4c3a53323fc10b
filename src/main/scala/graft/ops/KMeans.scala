package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{NearestCentroid, VecWeightedMean}

/** Distributed spherical k-means (Lloyd's algorithm, cosine
  * assignment) — the corpus-clustering primitive behind semantic
  * dedup shards, topic-balanced mixtures, and IVF index training
  * (ops.Similarity's frozen-centroid faces CONSUME centroids; this is
  * the operator that produces them).
  *
  * Scale shape per round: centroids live on the driver (k rows — the
  * same bounded-seed-matrix pattern as NearestCentroid's d11 use) and
  * ship to executors inside the codegen'd [[NearestCentroid]]
  * expression, so assignment is a pure map-side pass (no join, no
  * shuffle); the update is ONE k-group aggregate whose partial maps
  * combine per-partition vector sums (k·dim doubles of state), so the
  * exchange carries k·partitions rows, never the corpus. Total: one
  * corpus scan + one k-row exchange per round — the textbook
  * Spark-native Lloyd layout.
  *
  * Engine-portable determinism (what makes this ORACLE-checkable, rare
  * for iterative float algorithms): after every update the new
  * centroids are QUANTIZED to the 1e-6 grid (floor(x·1e6+0.5)/1e6 —
  * functions.Rounding's cross-engine formula). Mean sums differ across
  * engines in the last ulp (different accumulation order), but their
  * 1e-6 quantizations agree, so the NEXT round's assignment compares
  * bit-identical similarities on both engines and the whole iteration
  * stays exactly reproducible. Ties assign to the smallest centroid id
  * (NearestCentroid's strict-> ascending scan). Empty clusters keep
  * their previous centroid.
  */
object KMeans {

  private def r6(x: Double): Double = math.floor(x * 1000000 + 0.5) / 1000000

  /** The trained (quantized) centroids after `rounds-1` updates,
    * seeded by the k embeddings with id < k — the reusable face
    * consumed by [[lloydSummary]] and the trained-IVF index
    * ([[Similarity.ivfTopKTrained]]). Bounded driver state: k rows
    * collected per round (the d11 seed-matrix pattern). */
  def lloydCentroids(embs: DataFrame, idCol: String, vecCol: String,
                     k: Int, rounds: Int = 2): Seq[(Long, Array[Double])] = {
    require(k > 0 && rounds >= 1, "k and rounds must be positive")
    // fv feeds the float-typed VecWeightedMean aggregator: a no-op
    // cast for the float embeddings table (the oracle-exact km1 path);
    // double-array inputs (e.g. the v3b planted fixture) train through
    // the same float accumulators — acceptable for a coarse quantizer
    val e = embs.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<float>").as("fv"),
      col(vecCol).cast("array<double>").as("v"))
    // parquet floats cast to double are exact, so seeds are
    // bit-identical to the oracle's
    var cents: Seq[(Long, Array[Double])] = e.filter(col("id") < k)
      .select(col("id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toSeq.sortBy(_._1)
    for (_ <- 1 until rounds) {
      val assigned = e.select(
        NearestCentroid.nearest(col("v"), cents)
          .getField("cluster_id").as("cid"),
        col("fv"))
      // k-row collect: the per-cluster means (bounded driver state)
      val means = assigned.groupBy(col("cid"))
        .agg(VecWeightedMean(col("fv"), lit(1.0)).as("mean"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray.map(r6))
        .toMap
      cents = cents.map { case (cid, c) => cid -> means.getOrElse(cid, c) }
    }
    cents
  }

  /** `rounds` assignment passes with `rounds-1` quantized centroid
    * updates between them, seeded by the k embeddings with id < k.
    * Returns the per-cluster summary of the final assignment:
    * (cluster_id, n, cnorm) — cnorm is the norm of the centroid the
    * final pass assigned against, on the same 1e-6 grid. */
  def lloydSummary(embs: DataFrame, idCol: String, vecCol: String,
                   k: Int, rounds: Int = 2): DataFrame = {
    val spark = embs.sparkSession
    val e = embs.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("fv"),
      col(vecCol).cast("array<double>").as("v"))
    val cents = lloydCentroids(embs, idCol, vecCol, k, rounds)
    val counts = e.select(
        NearestCentroid.nearest(col("v"), cents)
          .getField("cluster_id").as("cluster_id"))
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("n"))
    val centDf = spark.createDataFrame(cents.map { case (cid, c) =>
      (cid, r6(NearestCentroid.selfNorm(c)))
    }).toDF("cluster_id", "cnorm")
    centDf.join(broadcast(counts), Seq("cluster_id"), "left")
      .select(col("cluster_id"),
        coalesce(col("n"), lit(0L)).as("n"), col("cnorm"))
      .orderBy(col("cluster_id"))
  }
}
