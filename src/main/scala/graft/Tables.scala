package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the synthetic star schema (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] reads through here so the scan
  * layer is uniform: plain parquet scans, letting Catalyst push filters
  * and prune columns (verified via `.explain` — see PERFORMANCE.md).
  *
  * At cluster scale these would be catalog tables (partitioned by date /
  * term, bucketed on the join keys); for the driver contract they are
  * single parquet files per table.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame   = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
