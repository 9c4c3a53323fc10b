package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{VecWeightedMean, VectorFunctions => VF}
import graft.functions.Rounding.exactRound

/** Vector/embedding exemplars (SURVEY.md A1, U4, U5/F9, W5) over the
  * synthetic embeddings table. */
object VectorQueries {

  /** A1 — weighted mean embedding per label, exploded to (label, dim,
    * value) rows so the oracle compare is scalar. Weight is a
    * deterministic function of vec_id (stands in for token_count).
    * Plan: ObjectHashAggregate with partial agg → one narrow shuffle. */
  def weightedMeanByLabel(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), col("embedding"),
        ((col("vec_id") % 7) + 1).cast("double").as("w"))
      .groupBy(col("label"))
      .agg(VecWeightedMean(col("embedding"), col("w")).as("vec"))
      .select(col("label"), posexplode(col("vec")))
      .select(col("label"), (col("pos") + 1).as("dim"),
        exactRound(col("col"), 5).as("wmean_val"))
      .orderBy(col("label"), col("dim"))

  /** U5/F9 + W5 — cosine top-5 neighbors for the first 5 vectors
    * (reference: top-5 nearest neighbors per cluster,
    * clustering/helpers.py:185-226). The probe side is tiny and
    * broadcast; similarity is computed columnar (no UDF) and ranked
    * with a per-probe window. */
  def cosineTop5(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probes = e.filter(col("vec_id") < 5)
      .withColumnRenamed("vec_id", "probe_id").withColumnRenamed("v", "pv")
    val sims = e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("cand_id"),
        VF.cosine(col("pv"), col("v")).as("sim_raw"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim_raw").desc, col("cand_id"))
    sims.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("probe_id"), col("cand_id"),
        exactRound(col("sim_raw"), 6).as("sim"), col("rn"))
      .orderBy(col("probe_id"), col("rn"))
  }
}
