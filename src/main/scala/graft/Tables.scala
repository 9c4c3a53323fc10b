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
    * (reads as long under spark.sql.legacy.parquet.nanosAsLong, set by
    * [[Sessions.local]] in every entry point) and plain non-UTC-adjusted
    * TIMESTAMP(µs) (reads as TIMESTAMP_NTZ under Spark 4's NTZ inference)
    * across regenerations. Sessions run in UTC (also [[Sessions.local]]),
    * so the NTZ→TZ cast is value-preserving and downstream code always
    * sees one type.
    *
    * Nanos-only contract for the LongType branch (ADVICE r7): a LongType
    * here can only be a TIMESTAMP(NANOS) column surfaced under
    * nanosAsLong — the named columns are timestamps in every generator
    * version, never plain BIGINT, and Spark 4 has no other way to hand a
    * timestamp column over as long. The guard below rejects the one
    * observable mix-up (micros-scale longs would land centuries out of
    * the generator's 1992-2030 window if rescaled as nanos). */
  private def tsNormalized(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case LongType =>
          // plausibility gate, no extra scan: epoch-nanos between 1979
          // and 2096 are 3e17..4e18; the same wall range in micros is
          // 3e14..4e15 and in days ~1e4 — disjoint by orders of
          // magnitude. A long outside the nanos window raises loudly at
          // read time instead of silently reading as dates near 1970.
          d.withColumn(c, timestamp_micros(expr(
            s"CASE WHEN $c IS NULL OR $c BETWEEN 300000000000000000 AND 4000000000000000000 " +
            s"THEN $c ELSE CAST(assert_true(false, " +
            s"'tsNormalized: long value in $c is not epoch-nanos') AS BIGINT) END div 1000")))
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

  /** THE loader registry (ADVICE r7): which tables go through a typed
    * (timestamp-normalizing) loader is recorded exactly once, here.
    * [[Catalog.registerTestdata]] iterates this map, so a future
    * timestamp-bearing table added with its typed loader is normalized
    * in the SQL views automatically — the two surfaces cannot diverge. */
  val loaders: Map[String, (SparkSession, String) => DataFrame] = Map(
    "region"     -> (region _),
    "nation"     -> (nation _),
    "customer"   -> (customer _),
    "supplier"   -> (supplier _),
    "part"       -> (part _),
    "orders"     -> (orders _),
    "lineitem"   -> (lineitem _),
    "events"     -> (events _),
    "documents"  -> (documents _),
    "embeddings" -> (embeddings _))
}
