package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic-regression training by full-batch gradient
  * descent — the "train the quality/language classifier ON the
  * engine" stage of a modern data pipeline (fastText/DCLM-style
  * classifier filtering: fit a cheap linear model over cheap text
  * features, then score and gate the corpus with it).
  *
  * Scale shape per step: ONE corpus scan — z, σ(z) and the per-feature
  * gradient terms are all codegen column arithmetic, reduced by a
  * single global aggregate (map-side partials; the exchange carries
  * d+1 doubles per partition). Driver state is the d-vector of
  * weights — the bounded-iterate pattern shared with
  * [[KMeans]]/[[Svd]]/[[PageRank]].
  *
  * Engine-portable determinism (the quantized-iterate recipe, fourth
  * instance): weights are quantized to the 1e-6 grid after every
  * step. exp/ln differ across engines in the last ulp, but those
  * differences enter only through the gradient SUMS (absolute error
  * ~1e-13 for corpus-scale sums), which the quantization absorbs —
  * so the oracle can replay full training, step by step, under the
  * exact-hash gate. */
object Logistic {

  private def r6(x: Double): Double = math.floor(x * 1000000 + 0.5) / 1000000

  /** Full-batch GD from w = 0. `features` must carry `yCol` (0.0/1.0)
    * and the feature columns (include an explicit all-ones bias
    * column). Returns (weights, mean log-loss at the final weights).
    * The learning-rate term is applied as `w - lr·(g/n)` — written in
    * exactly that association so an SQL oracle can mirror it. */
  def fit(features: DataFrame, yCol: String, xCols: Seq[String],
          steps: Int = 3, lr: Double = 1.0): (Array[Double], Double) = {
    require(xCols.nonEmpty && steps >= 1)
    val f = features.localCheckpoint() // scanned steps+1 times
    var w = Array.fill(xCols.length)(0.0)
    var n = 0L
    def z: Column = xCols.zipWithIndex
      .map { case (c, j) => lit(w(j)) * col(c) }
      .reduceLeft(_ + _) // fixed left association, bias is x0·w0
    def sig: Column = lit(1.0) / (lit(1.0) + exp(-z))
    for (_ <- 1 to steps) {
      val gradCols = xCols.map(c => sum((sig - col(yCol)) * col(c))) :+
        count(lit(1))
      val row = f.agg(gradCols.head, gradCols.tail: _*).collect()(0)
      n = row.getLong(xCols.length)
      w = w.indices.map(j =>
        r6(w(j) - lr * (row.getDouble(j) / n))).toArray
    }
    val lossSum = f.agg(sum(
        -(col(yCol) * log(sig) + (lit(1.0) - col(yCol)) * log(lit(1.0) - sig))))
      .collect()(0).getDouble(0)
    (w, r6(lossSum / n))
  }

  /** Query face: one row per feature — (feature, weight, loss), loss
    * constant across rows (the final mean log-loss). */
  def fitSummary(features: DataFrame, yCol: String, xCols: Seq[String],
                 steps: Int = 3, lr: Double = 1.0): DataFrame = {
    val spark = features.sparkSession
    val (w, loss) = fit(features, yCol, xCols, steps, lr)
    spark.createDataFrame(
        w.toSeq.zipWithIndex.map { case (x, j) => (j, x, loss) })
      .toDF("feature", "weight", "loss")
      .orderBy(col("feature"))
  }
}
