package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{NearestCentroid, VecWeightedSum, VectorFunctions => VF}

/** Distributed truncated SVD: the top singular direction of the
  * (uncentered) embedding matrix by matrix-free power iteration —
  * LSA's rank-1 core, and the building block behind PCA whitening,
  * spectral quality probes ("how one-dimensional is this corpus
  * region?"), and low-rank ANN preconditioning.
  *
  * Scale shape (the reason this formulation and not a Gram matrix):
  * `u = Xᵀ(Xv)` never materializes the d×d Gram matrix or any
  * per-pair term. Each round is ONE corpus scan — `s = x·v` is the
  * codegen [[graft.functions.DotProduct]] against a broadcast literal
  * v, and `u = Σ s·x` is the [[VecWeightedSum]] aggregate (map-side
  * partial: the exchange carries dim doubles per partition, never
  * rows). Driver state is the d-vector — the same bounded pattern as
  * the k-means centroids.
  *
  * Engine-portable determinism, the km1 recipe applied to linear
  * algebra: after every round the iterate is sign-canonicalized (flip
  * so component 0 is ≥ 0 — power iteration is direction-ambiguous),
  * normalized, and QUANTIZED to the 1e-6 grid, so the next round's
  * dot products are bit-identical on any engine and the whole
  * iteration replays exactly in SQL. */
object Svd {

  private def r6(x: Double): Double = math.floor(x * 1000000 + 0.5) / 1000000

  /** `iters` power-iteration rounds from the uniform start 1/8·𝟙 (1/8
    * is binary-exact). Returns one row per dimension: (dim 1-based,
    * loading — the quantized top-singular-vector component, lambda —
    * the top eigenvalue of XᵀX estimated as ‖u‖ of the last round,
    * on the same grid). */
  def powerIterationTop(embs: DataFrame, vecCol: String,
                        iters: Int = 3): DataFrame = {
    require(iters >= 1)
    val spark = embs.sparkSession
    val fv = embs.select(col(vecCol).as("fv")).where(col("fv").isNotNull)
    // bounded probe: dimension of the first vector (one-row collect)
    val dim = fv.select(size(col("fv"))).limit(1).collect() match {
      case Array(r) => r.getInt(0)
      case _ => throw new IllegalArgumentException("empty embedding column")
    }
    var v: Array[Double] = Array.fill(dim)(0.125)
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val s = VF.dot(col("fv"), typedLit(v.toSeq))
      // one corpus scan: u = Xᵀ(Xv), collected as a single d-vector row
      val u0 = fv.select(VecWeightedSum(col("fv"), s).as("u"))
        .collect()(0).getSeq[Double](0).toArray
      val u = if (u0(0) < 0) u0.map(x => -x) else u0
      lambda = NearestCentroid.selfNorm(u)
      v = u.map(x => r6(x / lambda))
    }
    val lam = r6(lambda)
    spark.createDataFrame(
        v.toSeq.zipWithIndex.map { case (x, i) => (i + 1L, x, lam) })
      .toDF("dim", "loading", "lambda")
      .orderBy(col("dim"))
  }
}
