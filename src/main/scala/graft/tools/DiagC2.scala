package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Throwaway diagnostic: stage-by-stage timing of the c2 corpus-build
  * composition at a given sf dir. Dev tooling, not a registered query. */
object DiagC2 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.Sessions.local("graft-diag-c2", cpusDefault = "32")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"DIAG $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("scan_only")(docs.select(col("text")).filter(length(col("text")) > 0).count())
    time("lower_only")(docs.select(lower(col("text")).as("t")).filter(length(col("t")) > 0).count())
    time("norm_regex1")(docs.select(regexp_replace(lower(col("text")), "[^a-z0-9\\s]", "").as("t"))
      .filter(length(col("t")) > 0).count())
    time("normalize_full")(docs.select(TextAnalysis.normalize(col("text")).as("t"))
      .filter(length(col("t")) > 0).count())
    time("quality_only")(docs.select(TextAnalysis.qualityScore(col("text")).as("q"))
      .filter(col("q") > -1).count())
    time("norm_plus_quality")(docs
      .withColumn("norm_text", TextAnalysis.normalize(col("text")))
      .filter(length(col("norm_text")) > 0)
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
      .filter(col("q") > -1).count())
    time("full_minus_agg")(docs
      .withColumn("norm_text", TextAnalysis.normalize(col("text")))
      .filter(length(col("norm_text")) > 0)
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
      .groupBy(xxhash64(col("norm_text")).as("__d"))
      .agg(min_by(struct(col("doc_id"), col("source"), col("n_chars"),
        col("q")), col("doc_id")).as("__r"))
      .count())
    time("c2_full")(graft.analytics.TextQueries.corpusBuild(spark, dir).count())
    spark.stop()
  }
}
