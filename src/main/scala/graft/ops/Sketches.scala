package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregation sketches — the 100 TB substitutes for exact
  * distinct counts and exact quantiles (both of which need a full
  * shuffle of the key space; the sketches are fixed-size map-side
  * state merged associatively).
  *
  * Spark ships the algorithms (HyperLogLog++ behind
  * `approx_count_distinct`, KLL-style quantile summaries behind
  * `percentile_approx`); this module's contribution is the CONTRACT
  * surface: each operator returns the approximation NEXT TO its exact
  * counterpart and a boolean that the promised error bound holds, so
  * the result is oracle-checkable — the DuckDB oracle recomputes the
  * exact side and asserts the same booleans. An approximation whose
  * value can't be cross-checked is unverifiable; an approximation
  * whose error CONTRACT is checked row-by-row is a first-class
  * operator in a hash-compared engine. (At production scale one drops
  * the exact column and keeps the sketch — the contract is what the
  * tests pin.)
  */
object Sketches {

  /** Per-group approximate + exact distinct counts with the bound
    * check. `rsd` is HLL++'s target relative standard deviation; the
    * check allows `tolFactor` × rsd (default 3 sigma — generous but
    * the point is catching gross regressions, not shaving sigmas). */
  def distinctWithContract(df: DataFrame, groupCol: String, keyCol: String,
                           rsd: Double = 0.05,
                           tolFactor: Double = 3.0): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        countDistinct(col(keyCol)).as("exact_distinct"),
        approx_count_distinct(col(keyCol), rsd).as("approx_distinct"))
      .withColumn("within_bound",
        abs(col("approx_distinct") - col("exact_distinct"))
          <= col("exact_distinct") * (rsd * tolFactor) + lit(1.0))

  /** Per-group approximate median vs the exact median, bounded by a
    * RANK tolerance: the approx median must sit between the exact
    * p(0.5-eps) and p(0.5+eps) quantiles — the guarantee
    * percentile_approx actually makes (rank error ≤ 1/accuracy), as
    * opposed to a value-space bound it doesn't. */
  def medianWithContract(df: DataFrame, groupCol: String, valCol: String,
                         accuracy: Int = 100): DataFrame = {
    val eps = 1.0 / accuracy
    df.groupBy(col(groupCol))
      .agg(
        percentile_approx(col(valCol), lit(0.5), lit(accuracy)).as("approx_median"),
        expr(s"percentile($valCol, ${0.5 - 2 * eps})").as("lo"),
        expr(s"percentile($valCol, ${0.5 + 2 * eps})").as("hi"))
      .withColumn("within_bound",
        col("approx_median") >= col("lo") && col("approx_median") <= col("hi"))
      .drop("lo", "hi")
  }
}
