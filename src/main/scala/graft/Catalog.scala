package graft

import org.apache.spark.sql.SparkSession

/** View registration — the engine's SQL surface. After registration a
  * user runs plain `spark.sql` over everything the reference exposes
  * as Postgres tables (schema.sql) plus the synthetic star schema.
  */
object Catalog {

  val testdataTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register the synthetic tables as temp views named after the files. */
  def registerTestdata(spark: SparkSession, dir: String): Unit = {
    testdataTables.foreach { t =>
      val df = if (t == "events") Tables.events(spark, dir)
               else Tables.table(spark, dir, t)
      df.createOrReplaceTempView(t)
    }
  }

  /** Register a TranscriptPipeline output directory as the warehouse
    * tables the reference's dbt layer reads (schema.sql names). */
  def registerPipelineOutputs(spark: SparkSession, outDir: String): Unit = {
    Seq(
      "oa_text" -> "oa_text",
      "document_chunk_embeddings" -> "document_chunk_embeddings",
      "transcript_embeddings" -> "transcript_embeddings",
      "gold_speaker_analytics" -> "gold_speaker_analytics",
      "gold_oral_arguments_analytics" -> "gold_oral_arguments_analytics"
    ).foreach { case (path, view) =>
      spark.read.parquet(s"$outDir/$path").createOrReplaceTempView(view)
    }
  }
}
