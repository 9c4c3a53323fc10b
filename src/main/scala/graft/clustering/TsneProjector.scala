package graft.clustering

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** U7 — driver-local exact t-SNE (the reference's actual projector:
  * sklearn TSNE(n_components=2, perplexity=min(p, max(5, n/4)),
  * random_state=42), clustering/helpers.py:99-122).
  *
  * Deliberately driver-local, like the reference: the input is the
  * case-level matrix (one row per case, ≤ thousands after A1), not the
  * corpus. Data flow: collect scaled embeddings → exact O(n²) t-SNE
  * with per-point sigma binary search, early exaggeration, momentum
  * gradient descent → rejoin coordinates by id. Seeded and fully
  * deterministic (fixed iteration counts, no data-order dependence
  * beyond the id sort).
  *
  * Not bit-compatible with sklearn (SURVEY §7.3(e): impossible) — the
  * contract is structural: same clamps, same seed discipline, local
  * neighborhoods preserved (asserted in ClusteringSpec).
  */
final class TsneProjector(
    perplexity: Double = 30.0,
    iterations: Int = 500,
    learningRate: Double = 0.0, // <= 0: auto = max(10, n/48), à la sklearn
    seed: Long = 42L,
    maxDriverRows: Int = CaseClustering.DefaultMaxDriverRows)
  extends CaseClustering.Projector {

  override def project(df: DataFrame, inCol: String): DataFrame = {
    val spark = df.sparkSession
    // deterministic guarded driver-local collect, sorted by id
    val idCol = df.columns.head
    val rows = CaseClustering.collectMatrix(df, inCol, maxDriverRows, "TsneProjector")
    val n = rows.length
    require(n >= 2, "t-SNE needs at least 2 points")
    val X = rows.map(_._2)
    val perp = CaseClustering.clampPerplexity(perplexity, n)

    val Y = TsneProjector.run(X, perp, iterations, learningRate, seed)

    val coordRows = rows.indices.map(i => Row(rows(i)._1, Y(i)(0), Y(i)(1)))
    val coords = spark.createDataFrame(
      spark.sparkContext.parallelize(coordRows, 4),
      StructType(Seq(
        StructField("__tsne_id", org.apache.spark.sql.types.StringType),
        StructField("x", DoubleType), StructField("y", DoubleType))))
    df.join(coords, df(idCol).cast("string") === coords("__tsne_id"))
      .drop("__tsne_id")
  }
}

object TsneProjector {

  /** Exact t-SNE core on a dense matrix; returns n×2 coordinates. */
  def run(X: Array[Array[Double]], perplexity: Double, iterations: Int,
          learningRate0: Double, seed: Long): Array[Array[Double]] = {
    val n = X.length
    // high rates scramble small embeddings (measured: lr=200 on n=60
    // drops neighbor preservation from 97% to 33%)
    val learningRate =
      if (learningRate0 > 0) learningRate0 else math.max(10.0, n / 48.0)
    val d2 = pairwiseSqDists(X)
    val P = jointProbabilities(d2, perplexity)

    val rnd = new scala.util.Random(seed)
    val Y = Array.fill(n, 2)(rnd.nextGaussian() * 1e-4)
    val dY = Array.fill(n, 2)(0.0)
    val gains = Array.fill(n, 2)(1.0)
    val exaggeration = 12.0
    val exaggerationIters = math.min(100, iterations / 3)

    var iter = 0
    while (iter < iterations) {
      val exag = if (iter < exaggerationIters) exaggeration else 1.0
      // student-t affinities
      val num = Array.ofDim[Double](n, n)
      var qSum = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          val dx = Y(i)(0) - Y(j)(0); val dy = Y(i)(1) - Y(j)(1)
          val q = 1.0 / (1.0 + dx * dx + dy * dy)
          num(i)(j) = q; num(j)(i) = q; qSum += 2 * q
          j += 1
        }
        i += 1
      }
      val momentum = if (iter < 20) 0.5 else 0.8
      i = 0
      while (i < n) {
        var gx = 0.0; var gy = 0.0
        var j = 0
        while (j < n) {
          if (j != i) {
            val q = num(i)(j)
            val mult = (exag * P(i)(j) - q / qSum) * q
            gx += mult * (Y(i)(0) - Y(j)(0))
            gy += mult * (Y(i)(1) - Y(j)(1))
          }
          j += 1
        }
        // gains + momentum update per dimension
        var k = 0
        val g = Array(4.0 * gx, 4.0 * gy)
        while (k < 2) {
          gains(i)(k) = math.max(0.01,
            if (math.signum(g(k)) != math.signum(dY(i)(k))) gains(i)(k) + 0.2
            else gains(i)(k) * 0.8)
          dY(i)(k) = momentum * dY(i)(k) - learningRate * gains(i)(k) * g(k)
          Y(i)(k) += dY(i)(k)
          k += 1
        }
        i += 1
      }
      // re-center
      val cx = Y.map(_(0)).sum / n; val cy = Y.map(_(1)).sum / n
      i = 0
      while (i < n) { Y(i)(0) -= cx; Y(i)(1) -= cy; i += 1 }
      iter += 1
    }
    Y
  }

  private[clustering] def pairwiseSqDists(X: Array[Array[Double]]): Array[Array[Double]] = {
    val n = X.length
    val out = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        var s = 0.0; var k = 0
        while (k < X(i).length) { val t = X(i)(k) - X(j)(k); s += t * t; k += 1 }
        out(i)(j) = s; out(j)(i) = s
        j += 1
      }
      i += 1
    }
    out
  }

  /** Symmetrized joint probabilities with per-point sigma found by
    * binary search on the perplexity (log-space, 50 steps). */
  private[clustering] def jointProbabilities(
      d2: Array[Array[Double]], perplexity: Double): Array[Array[Double]] = {
    val n = d2.length
    val targetEntropy = math.log(perplexity)
    val condP = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var betaMin = Double.NegativeInfinity
      var betaMax = Double.PositiveInfinity
      var beta = 1.0
      var step = 0
      while (step < 50) {
        var sum = 0.0; var sumD = 0.0
        var j = 0
        while (j < n) {
          if (j != i) {
            val p = math.exp(-d2(i)(j) * beta)
            condP(i)(j) = p; sum += p; sumD += d2(i)(j) * p
          }
          j += 1
        }
        val entropy =
          if (sum <= 0) 0.0 else math.log(sum) + beta * sumD / sum
        if (entropy > targetEntropy) {
          betaMin = beta
          beta = if (betaMax.isInfinity) beta * 2 else (beta + betaMax) / 2
        } else {
          betaMax = beta
          beta = if (betaMin.isInfinity) beta / 2 else (beta + betaMin) / 2
        }
        step += 1
      }
      val sum = condP(i).sum
      if (sum > 0) { var j = 0; while (j < n) { condP(i)(j) /= sum; j += 1 } }
      i += 1
    }
    // symmetrize, floor
    val P = Array.ofDim[Double](n, n)
    i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        P(i)(j) = math.max((condP(i)(j) + condP(j)(i)) / (2.0 * n), 1e-12)
        j += 1
      }
      i += 1
    }
    P
  }
}
