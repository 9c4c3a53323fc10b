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

  /** Count-min sketch (Cormode & Muthukrishnan '05) — bounded-state
    * frequency estimation where even Misra-Gries is too big: `depth`
    * counter rows of `width` cells each, a few KB of associatively
    * mergeable state regardless of key cardinality, overestimate-only
    * error ≤ e·n/width with probability 1−e^−depth.
    *
    * Unlike q17/q18's engine-internal sketches (HLL++/KLL), this one
    * is built from the portable [[graft.functions.PolyHash]] family,
    * so the WHOLE sketch — hash rows, cell counts, point-query minima
    * — replays bit-for-bit in ANSI SQL: the row hashes are
    * `((h mod P) · a_j + b_j) mod P mod width` with P = 2^31−1 and
    * fixed odd constants, every product < 2^62 (no BIGINT overflow on
    * either engine).
    *
    * Scale shape: the counter table is built in ONE map-side
    * explode(depth) + aggregate over (j, bucket) — at most
    * depth·width distinct groups, so partial aggregation collapses
    * each task's contribution to sketch size before the exchange
    * (that collapse IS the sketch's merge property, exercised through
    * real shuffled partials). Point queries join the counter table —
    * sketch-sized, broadcastable — not the corpus. */
  val CmP: Long = 2147483647L // 2^31 − 1 (Mersenne)
  val CmA: Seq[Long] = Seq(1664525L, 69069L, 22695477L, 1103515245L)
  val CmB: Seq[Long] = Seq(1013904223L, 362437L, 1L, 12345L)

  private def cmBucket(h: Column, j: Int, width: Int): Column =
    pmod(pmod(pmod(h, lit(CmP)) * lit(CmA(j)) + lit(CmB(j)), lit(CmP)), lit(width))

  /** One (j, bucket) row per input row per hash row — the map-side
    * projection both the batch counter build and the STREAMING
    * aggregation (st8) run; its groupBy-count partials collapse to
    * sketch size, which is the merge property. */
  def cmBucketPairs(df: DataFrame, keyCol: String, width: Int = 64,
                    depth: Int = 4): DataFrame = {
    require(depth >= 1 && depth <= CmA.size, s"depth must be 1..${CmA.size}")
    val h = graft.functions.PolyHash.polyHash(col(keyCol))
    df.select(posexplode(array((0 until depth).map(j => cmBucket(h, j, width)): _*))
      .as(Seq("j", "bucket")))
  }

  /** The counter table (j, bucket, cnt) over every row of `df`. */
  def countMin(df: DataFrame, keyCol: String, width: Int = 64,
               depth: Int = 4): DataFrame =
    cmBucketPairs(df, keyCol, width, depth)
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Point-query estimates against a PRE-BUILT counter table (cols
    * j, bucket, cnt — e.g. the final state of the streaming build):
    * est(k) = min over rows j of cnt[j][h_j(k)]. */
  def countMinEstimatesFrom(counters: DataFrame, keys: DataFrame,
                            keyCol: String, width: Int = 64,
                            depth: Int = 4): DataFrame = {
    require(depth >= 1 && depth <= CmA.size, s"depth must be 1..${CmA.size}")
    val h = graft.functions.PolyHash.polyHash(col(keyCol))
    keys.select(col(keyCol)).distinct()
      .select(col(keyCol),
        posexplode(array((0 until depth).map(j => cmBucket(h, j, width)): _*))
          .as(Seq("j", "bucket")))
      .join(counters, Seq("j", "bucket"))
      .groupBy(col(keyCol)).agg(min(col("cnt")).as("est"))
  }

  /** Point-query estimates for every DISTINCT key in `df`:
    * est(k) = min over rows j of cnt[j][h_j(k)] — the CMS guarantee
    * est >= true count always, with the e·n/width overshoot bound. */
  def countMinEstimates(df: DataFrame, keyCol: String, width: Int = 64,
                        depth: Int = 4): DataFrame =
    countMinEstimatesFrom(countMin(df, keyCol, width, depth), df,
      keyCol, width, depth)

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
