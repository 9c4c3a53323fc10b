package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark 4 only
    * reads via spark.sql.legacy.parquet.nanosAsLong (set in every session
    * builder here). Normalize to a proper TimestampType column (µs,
    * truncating sub-µs) so downstream code sees a timestamp. */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
