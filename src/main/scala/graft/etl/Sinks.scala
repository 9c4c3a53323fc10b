package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Sink operators (SURVEY.md §2.1 K1–K5, K7, J5-incremental).
  *
  * The reference's "idempotent insert" is a per-row INSERT that catches
  * unique-key violations (helpers.py:250-346). Spark has no upsert into
  * parquet, so the equivalent is anti-join-then-append: left_anti the
  * incoming batch against the sink's existing keys, then append only the
  * novel rows. At scale the existing-key read prunes to the key columns
  * only (columnar scan), and the anti-join shuffles just the key.
  * Concurrent writers are out of scope (so were they for the reference —
  * its uniqueness came from a Postgres constraint).
  */
object Sinks {

  /** Store existence via the Hadoop FS API — java.nio only speaks the
    * local filesystem, and a silently-false exists on `hdfs://`/`s3a://`
    * would skip the anti-join dedup entirely, making "idempotent"
    * append duplicate rows on exactly the storage these sinks claim
    * to serve. */
  private def storeExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** K3/K4 — insert-if-absent append keyed on `keys`. Returns the number
    * of rows actually appended. */
  def idempotentAppend(df: DataFrame, path: String, keys: Seq[String]): Long = {
    val spark = df.sparkSession
    val novel =
      if (storeExists(spark, path)) {
        val existing = spark.read.parquet(path).select(keys.map(col): _*).distinct()
        df.join(existing, keys, "left_anti")
      } else df
    // localCheckpoint, not cache(): the anti-join must be evaluated
    // exactly once, BEFORE the append touches `path`. A cached plan
    // re-evaluates from source on block loss/eviction — and by then the
    // sink already contains the partially-appended batch, so the re-run
    // would see its own output and drop or duplicate rows. The checkpoint
    // truncates lineage so the write can only read the materialized rows.
    val materialized = novel.localCheckpoint()
    val n = materialized.count()
    if (n > 0) materialized.write.mode(SaveMode.Append).parquet(path)
    n
  }

  /** [[idempotentAppend]] for a PARTITIONED store: appends land in
    * their partition directories (`partitionBy`), so a bucketed store
    * (e.g. the SemDeDup assignment store, partitioned by cluster
    * bucket) keeps its partition-pruning layout across incremental
    * upkeep. Same exactly-once discipline as the flat variant. */
  def idempotentAppendPartitioned(df: DataFrame, path: String,
                                  keys: Seq[String],
                                  partitionCol: String): Long = {
    val spark = df.sparkSession
    val novel =
      if (storeExists(spark, path)) {
        val existing = spark.read.parquet(path).select(keys.map(col): _*).distinct()
        df.join(existing, keys, "left_anti")
      } else df
    val materialized = novel.localCheckpoint()
    val n = materialized.count()
    if (n > 0) materialized.write.mode(SaveMode.Append)
      .partitionBy(partitionCol).parquet(path)
    n
  }

  /** K1 — partitioned JSON sink (ingest/main.py:299-310 writes
    * raw/oral_arguments/term_{t}/...). */
  def partitionedJson(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).json(path)

  /** K2 — junk / dead-letter sink with context (ingest/main.py:96-119). */
  def writeJunk(junk: DataFrame, path: String): Unit =
    junk
      .withColumn("junked_at", current_timestamp())
      .write.mode(SaveMode.Append).json(path)

  /** K5 — single-file CSV export + driver-side metadata JSON
    * (clustering/helpers.py:261-315). coalesce(1) is deliberate: the
    * export is a small, final, human-facing artifact (the reference
    * uploads one CSV); never use this for large outputs. */
  def csvWithMetadata(df: DataFrame, dir: String, metadataJson: String): Unit = {
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(s"$dir/results")
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/metadata.json"), metadataJson)
  }

  /** Dynamic partition overwrite: replace exactly the partitions
    * present in `df`, leave every other partition untouched. This is
    * the idempotent unit of a scheduled backfill — re-running a day
    * replaces that day, never duplicates it and never clobbers its
    * neighbors (plain Overwrite+partitionBy truncates the WHOLE
    * table). The mode is set per-writer, not on the shared session. */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetBytes`-sized files. Streaming sinks and per-batch
    * idempotent appends accrete files; at 100 TB the file count —
    * not the byte count — becomes the scan/listing bottleneck
    * (footer reads, task-per-file scheduling). One coalescing pass,
    * sized from the ACTUAL on-disk bytes, staged through a temp dir
    * so a crash mid-compact never leaves the directory truncated.
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    // coalesce, not repartition: compaction only ever reduces the file
    // count, and coalesce does it without a shuffle — the read tasks
    // write straight through
    spark.read.parquet(path).coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(p, true)
    fs.rename(tmp, p)
    val after = fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    (parts.length, after)
  }

  /** Bucketed catalog table — the co-located-join layout a 100 TB
    * warehouse keys its fact tables on: `bucketBy` the join key and
    * `sortBy` within buckets, so equi-joins between tables bucketed the
    * SAME way plan with ZERO Exchange and zero per-task sort (asserted
    * in BucketedJoinSpec). Bucketing requires the session catalog
    * (`saveAsTable`), not a path write — Spark persists the bucket
    * spec in table metadata and trusts it at read time. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String],
                    sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty && buckets > 0)
    val spark = df.sparkSession
    // A managed table's location can outlive the catalog entry (a new
    // process starts with an empty in-memory catalog but the same
    // warehouse dir), and CTAS refuses an existing location even under
    // Overwrite — so drop the entry AND clear any orphaned directory,
    // or a restarted process can never rebuild its layout.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val orphan = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = orphan.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(orphan)) fs.delete(orphan, true)
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val s = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    s.format("parquet").saveAsTable(table)
  }

  /** K7 — run summary metrics as a driver-side JSON write; counts come
    * from `observe()` metrics or cheap aggregates upstream. Keys and
    * string values are ESCAPED (backslash, quote, all control chars),
    * so a metric value carrying a quote, newline or tab cannot corrupt
    * the document — the reader of a run summary is usually a machine. */
  def runSummary(path: String, metrics: Map[String, Any]): Unit = {
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val body = metrics.map {
      case (k, v: String) => s"${esc(k)}: ${esc(v)}"
      case (k, v) => s"${esc(k)}: $v"
    }.mkString("{", ", ", "}")
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), body)
  }
}
