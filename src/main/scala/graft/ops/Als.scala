package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Rounding.exactRound

/** Rank-1 alternating least squares over a SPARSE rating/affinity
  * matrix — the matrix-factorization core of recommenders and
  * co-occurrence embedding pretraining, in its exactly-reproducible
  * form. Unlike [[Svd]] (dense rows, full inner products), ALS fits
  * only the OBSERVED cells: each half-step has a per-row closed form,
  *
  *   u_c = Σ_{i∈obs(c)} r·v_i / Σ v_i²,
  *   v_i = Σ_{c∈obs(i)} r·u_c / Σ u_c²,
  *
  * which is ONE groupBy aggregate per side — factors are distributed
  * columns, never driver state, so this scales to billions of rows
  * per side (the one structural difference from the km1/svd1/pr1
  * bounded-iterate family).
  *
  * Scale shape per half-step: join the (16-byte) factor table to the
  * ratings on its key + one grouped aggregate with map-side partials.
  * The ratings table is checkpointed once and co-read by every step.
  *
  * Engine-portable determinism (the quantized-iterate recipe, applied
  * DISTRIBUTED): each half-step's factors quantize to the 1e-6 grid
  * as a column op, so the next half-step's products are bit-identical
  * across engines and the whole alternation replays in SQL. v starts
  * at the exact constant 1, so the first user step's numerator is a
  * sum of raw ratings (exact for integer-valued ratings). */
object Als {

  /** One full alternation (v₀=1 → u₁ → v₁), then the top-`topK` items
    * by factor value with the observed-cell mean squared error at
    * (u₁, v₁): (item, factor, mse). */
  def rank1Summary(ratings: DataFrame, userCol: String, itemCol: String,
                   ratingCol: String, topK: Int = 20): DataFrame = {
    val r = ratings.select(col(userCol).cast("long").as("u"),
        col(itemCol).cast("long").as("i"),
        col(ratingCol).cast("double").as("r"))
      .localCheckpoint() // read by u-step, v-step and the mse pass
    val u1 = r.groupBy(col("u"))
      .agg((sum(col("r")) / count(lit(1))).as("__raw"))
      .select(col("u"), exactRound(col("__raw"), 6).as("uv"))
    val v1 = r.join(u1, Seq("u"))
      .groupBy(col("i"))
      .agg((sum(col("r") * col("uv")) / sum(col("uv") * col("uv")))
        .as("__raw"))
      .select(col("i"), exactRound(col("__raw"), 6).as("factor"))
    val diff = col("r") - col("uv") * col("factor")
    val mse = r.join(u1, Seq("u")).join(v1, Seq("i"))
      .agg((sum(diff * diff) / count(lit(1))).as("__m"))
      .select(exactRound(col("__m"), 6).as("mse"))
    v1.crossJoin(broadcast(mse))
      .orderBy(col("factor").desc, col("i"))
      .limit(topK)
      .select(col("i").as("item"), col("factor"), col("mse"))
  }
}
