package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** S6/K3 — JDBC warehouse scan + idempotent keyed append (the
  * reference's Postgres surface: clustering/helpers.py:74-75 reads
  * `pd.read_sql`, transformers/helpers.py:250-346 writes per-row
  * INSERT ... ON CONFLICT DO NOTHING).
  *
  * Spark-first shape: `format("jdbc")` relations, so filters push down
  * into the database's WHERE clause (visible as PushedFilters in the
  * scan) and reads parallelize with `partitionColumn` bounds — at
  * warehouse scale one executor per key range instead of one driver
  * cursor. The idempotent append is the same anti-join-then-append
  * contract as [[Sinks.idempotentAppend]], keyed against the current
  * table contents (concurrent writers out of scope, as in the
  * reference where uniqueness came from the Postgres constraint).
  *
  * Exercised in JdbcSpec against embedded Derby — a real JDBC driver
  * end-to-end, no network.
  */
object Jdbc {

  /** Whole-table scan (small dims / driver-side tables). */
  def scan(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .load()

  /** Range-partitioned parallel scan — the 100 TB-minded read: Spark
    * issues `numPartitions` bounded queries concurrently. */
  def scanPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lower: Long, upper: Long,
                      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower).option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** Insert-if-absent append keyed on `keys`; returns rows appended.
    * First write creates the table. */
  def idempotentAppend(df: DataFrame, url: String, table: String,
                       keys: Seq[String]): Long = {
    val spark = df.sparkSession
    val novel =
      if (tableExists(url, table)) {
        val existing = scan(spark, url, table).select(keys.map(col): _*).distinct()
        df.join(existing, keys, "left_anti")
      } else df
    // materialize the anti-join before the append mutates the table
    // (same block-loss argument as Sinks.idempotentAppend)
    val materialized = novel.localCheckpoint()
    val n = materialized.count()
    if (n > 0)
      materialized.write.mode(SaveMode.Append).format("jdbc")
        .option("url", url).option("dbtable", table)
        .save()
    n
  }

  private def tableExists(url: String, table: String): Boolean = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, null, Array("TABLE"))
      var found = false
      while (!found && rs.next()) found = rs.getString("TABLE_NAME").equalsIgnoreCase(table)
      found
    } finally conn.close()
  }
}
