package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8 — result-listing + classification scan (reference
  * visualization/helpers.py:20-71): list the immediate child prefixes
  * of an analyses root and classify each as a term analysis
  * (`term-*`) or a timestamped multi-term analysis (identified by a
  * `*metadata*.json` inside).
  *
  * The listing itself is a metadata operation against the filesystem
  * (Hadoop FS API, so the same code serves file://, hdfs:// and
  * s3a:// — the reference's list_objects_v2 with Delimiter='/'), one
  * row per analysis directory; classification is columnar so the
  * string quirks stay declarative and testable:
  *  - term  = everything after the LAST 'term-' (split('term-')[-1]);
  *  - timestamp = last '_' segment of the metadata filename, minus the
  *    extension (split('_')[-1].split('.')[0]);
  *  - directories that are neither term- nor metadata-bearing are
  *    dropped, as in the reference;
  *  - sorted by term-or-timestamp (missing → '').
  */
object Analyses {

  /** (prefix, metadata file name or null, metadata mtime or null). */
  private def listDirs(spark: SparkSession, root: String): Seq[(String, String, java.sql.Timestamp)] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return Seq.empty
    fs.listStatus(rootPath).filter(_.isDirectory).toSeq.map { d =>
      val meta = fs.listStatus(d.getPath)
        .filter { f =>
          val n = f.getPath.getName
          f.isFile && n.contains("metadata") && n.endsWith(".json")
        }
        .sortBy(_.getPath.getName).headOption
      (d.getPath.getName + "/",
        meta.map(_.getPath.getName).orNull,
        meta.map(m => new java.sql.Timestamp(m.getModificationTime)).orNull)
    }
  }

  /** One row per recognized analysis:
    * (type, term, timestamp, prefix, display_name, last_modified). */
  def listAnalyses(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val dirs = listDirs(spark, root)
      .toDF("prefix", "meta_name", "last_modified")
    val isTerm = col("prefix").contains("term-")
    dirs
      .withColumn("type",
        when(isTerm, lit("single_term"))
          .when(col("meta_name").isNotNull, lit("multi_term")))
      .filter(col("type").isNotNull) // unclassifiable dirs are dropped
      .withColumn("term",
        when(isTerm,
          regexp_replace(substring_index(col("prefix"), "term-", -1), "/+$", "")))
      .withColumn("timestamp",
        when(!isTerm,
          substring_index(substring_index(col("meta_name"), "_", -1), ".", 1)))
      .withColumn("display_name",
        when(isTerm, concat(lit("Term "), col("term")))
          .otherwise(concat(lit("Multi-term Analysis "), col("timestamp"))))
      .withColumn("last_modified", when(!isTerm, col("last_modified")))
      .select(col("type"), col("term"), col("timestamp"), col("prefix"),
        col("display_name"), col("last_modified"))
      .orderBy(coalesce(col("term"), col("timestamp"), lit("")), col("prefix"))
  }
}
