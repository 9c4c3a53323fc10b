package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Sketches

/** Sketch exemplars (ops.Sketches) with accuracy-CONTRACT oracles: the
  * sketch value itself is engine-specific (HLL++/KLL internals), so
  * the registered output carries the exact value plus the boolean
  * "approximation met its promised bound", and the oracle recomputes
  * the exact side expecting every boolean true. A false anywhere
  * breaks the hash compare — the contract is what's gated. */
object SketchQueries {

  /** q17 — approximate distinct suppliers per return flag, 3-sigma
    * HLL++ bound checked against the exact count. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Sketches.distinctWithContract(
      Tables.lineitem(spark, dir), "l_returnflag", "l_suppkey")
      .select(col("l_returnflag"), col("exact_distinct"), col("within_bound"))
      .orderBy(col("l_returnflag"))

  /** q18 — approximate median quantity per return flag, rank-tolerance
    * bound checked against exact percentiles. */
  def approxMedian(spark: SparkSession, dir: String): DataFrame =
    Sketches.medianWithContract(
      Tables.lineitem(spark, dir), "l_returnflag", "l_quantity")
      .select(col("l_returnflag"), col("within_bound"))
      .orderBy(col("l_returnflag"))

  /** q21 — count-min sketch point queries (ops.Sketches.countMin) for
    * per-user event counts: the estimate from a 4×64 sketch next to
    * the exact count. Unlike q17/q18's contract-style oracles, the
    * PolyHash-family hash rows make the ENTIRE sketch replayable in
    * SQL — the oracle rebuilds counter cells, point-query minima and
    * all, so the hash gate proves the sketch arithmetic end-to-end
    * through real shuffled partials (width 64 over ~150+ users forces
    * genuine collisions: est > exact on real rows). */
  def countMinUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val est = Sketches.countMinEstimates(ev, "user_id")
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact"))
    est.join(exact, "user_id")
      .select(col("user_id"), col("est"), col("exact"))
      .orderBy(col("user_id"))
  }

  /** q19 — Misra-Gries heavy hitters per order status
    * (functions.MisraGries, the custom mergeable Aggregator). The
    * priority domain (5 values) sits under k = 8, the regime where MG
    * is provably exact — so the oracle checks the sketch's merge
    * arithmetic end-to-end through real shuffled partials against a
    * plain GROUP BY count. MisraGriesSpec covers the approximate
    * regime (bounded state, n/(k+1) deficit) that SQL can't. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val mg = graft.functions.MisraGries.heavyHitters(8)
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(mg(col("o_orderpriority")).as("hh"))
      .select(col("o_orderstatus"),
        explode(col("hh")).as(Seq("priority", "est")))
      .orderBy(col("o_orderstatus"), col("priority"))
  }
}
