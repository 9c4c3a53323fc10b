package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dashboard-layer aggregations (SURVEY §2 S8/S9/A8/W6/W7 — the
  * Streamlit app's client-side re-aggregations, re-expressed as
  * DataFrame transforms over clustering results instead of pandas over
  * downloaded CSVs: services/visualization/helpers.py:121-397,
  * components.py:166-225). */
object Dashboard {

  /** A8 — cluster-size histogram (value_counts of the label), noise
    * mapped out separately as the viz does (-1 → gray). */
  def clusterSizeHistogram(results: DataFrame): DataFrame =
    results.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_cases"))
      .withColumn("is_noise", col("cluster") === -1)
      .orderBy(col("cluster"))

  /** Term-comparison re-aggregation (components.py:166-225): one row
    * per term with case/cluster/noise/token stats. */
  def termComparison(results: DataFrame): DataFrame =
    results.groupBy(col("term_year"))
      .agg(
        count(lit(1)).as("n_cases"),
        countDistinct(when(col("cluster") =!= -1, col("cluster"))).as("n_clusters"),
        round(count(when(col("cluster") === -1, 1)).cast("double") /
          count(lit(1)) * 100, 2).as("noise_pct"),
        round(avg(col("total_tokens")), 2).as("mean_tokens"),
        sum(col("total_tokens")).as("total_tokens"))
      .orderBy(col("term_year").desc)

  /** W7 — bounded term preselect (the viz's available_terms[:5]). */
  def defaultTerms(results: DataFrame, n: Int = 5): DataFrame =
    results.select(col("term_year")).distinct()
      .orderBy(col("term_year").desc).limit(n)
}
