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
  import org.apache.spark.sql.types.{LongType, TimestampNTZType}

  /** Timestamp columns normalize to TimestampType regardless of how the
    * generator wrote them — the parquet files have carried TIMESTAMP(NANOS)
    * (reads as long under spark.sql.legacy.parquet.nanosAsLong, set in
    * every session builder here) and plain non-UTC-adjusted TIMESTAMP(µs)
    * (reads as TIMESTAMP_NTZ under Spark 4's NTZ inference) across
    * regenerations. Sessions run in UTC, so the NTZ→TZ cast is
    * value-preserving and downstream code always sees one type. */
  private def tsNormalized(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case LongType => d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
        case TimestampNTZType => d.withColumn(c, col(c).cast("timestamp"))
        case _ => d
      }
    }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   =
    tsNormalized(table(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    tsNormalized(table(s, d, "lineitem"), "l_shipdate")

  def events(s: SparkSession, d: String): DataFrame =
    tsNormalized(table(s, d, "events"), "ts")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
