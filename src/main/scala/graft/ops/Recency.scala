package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recency-weighted user/state features — the "how active was this
  * key lately" signal behind engagement scores, freshness-weighted
  * source quality, and decay-weighted mixture rates.
  *
  * The classic recurrence `ewma_t = α·x_t + (1−α)·ewma_{t−1}` looks
  * inherently sequential; over the K MOST RECENT events it closes to
  * one weighted sum (seeded at the window's oldest event): with rows
  * numbered newest-first i = 1..m,
  * `ewma = Σ_{i<m} α(1−α)^{i−1} x_i + (1−α)^{m−1} x_m`, i.e. a
  * rank-filtered projection + one aggregate — no driver loop, no
  * UDAF, no full-history scan.
  *
  * Truncating to K is the 100 TB design, not a cop-out: (1−α)^K is
  * the tail's total weight bound (α=0.25, K=20 → < 0.32% of mass), so
  * unbounded history contributes nothing measurable while the
  * top-K-per-key cut keeps the scan one window + filter (the
  * TopKPerGroup pattern, rank ≤ K prunes BEFORE the aggregate's
  * exchange — only K rows per key ever leave the scan stage).
  *
  * Determinism: the decay coefficients are a LITERAL table computed
  * once on the driver and shared with any SQL replay (17-significant-
  * digit round-trip), never engine `pow()` — cross-libm last-ulp
  * drift cannot enter; the only float op left is the K-term sum.
  *
  * Returns (key, n_recent, ewma) — n_recent = min(history, K).
  */
object Recency {

  /** Decay table (1−α)^j for j = 0..k−1, driver-computed. */
  def decayPowers(alpha: Double, k: Int): IndexedSeq[Double] =
    (0 until k).map(j => math.pow(1.0 - alpha, j))

  def ewmaLastK(df: DataFrame, keyCol: String, tsCol: String,
                tieCol: String, valCol: String,
                alpha: Double = 0.25, k: Int = 20): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1), got $alpha")
    require(k >= 1 && k <= 64, s"k in 1..64, got $k")
    val pows: Column = array(decayPowers(alpha, k).map(lit): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val recent = df
      .withColumn("__i", row_number().over(w))
      .filter(col("__i") <= k)
    val withM = recent
      .withColumn("__m", count(lit(1)).over(Window.partitionBy(col(keyCol))))
    val coeff = when(col("__i") === col("__m"),
        element_at(pows, col("__m").cast("int")))           // oldest seed: (1-a)^(m-1)
      .otherwise(lit(alpha) * element_at(pows, col("__i"))) // α(1-a)^(i-1)
    withM
      .groupBy(col(keyCol))
      .agg(max(col("__m")).as("n_recent"),
        sum(coeff * col(valCol)).as("ewma"))
  }
}
