package graft.etl

import org.apache.spark.sql.SparkSession

/** End-to-end transcript pipeline (the Spark translation of the
  * reference's Step Functions state machine, SURVEY.md §3.1): one
  * lineage raw JSON → junk routing → utterances → chunks → embeddings
  * → XML, with the reference's verification gates as count assertions.
  *
  * Usage: runMain graft.etl.TranscriptPipeline <rawJsonGlob> <outDir> [dim]
  */
object TranscriptPipeline {
  def main(args: Array[String]): Unit = {
    val rawPath = args(0)
    val outDir = args(1)
    val dim = if (args.length > 2) args(2).toInt else 1024

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-transcript-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val raw = Transcripts.readRaw(spark, rawPath)
    val valid = Transcripts.valid(raw).cache()
    val junk = Transcripts.junk(raw)
    Sinks.writeJunk(junk, s"$outDir/junk")

    val utterances = Transcripts.flatten(valid).cache()
    // verification gate (data_verification.py:31-65): rows must exist
    val nUtt = utterances.count()
    require(nUtt > 0, "verification gate: no utterances produced")
    val nUttInserted = Sinks.idempotentAppend(utterances, s"$outDir/oa_text", Seq("id"))

    val chunks = Transcripts.sectionChunks(utterances)
    val embedded = new HashingEmbedder(dim).embed(chunks, "chunk_text", "vector")
    val nChunkInserted = Sinks.idempotentAppend(
      embedded, s"$outDir/document_chunk_embeddings", Seq("id"))
    // gate 2 (data_verification.py:67-106)
    require(spark.read.parquet(s"$outDir/document_chunk_embeddings").count() > 0,
      "verification gate: no chunk embeddings")

    Transcripts.toXml(utterances)
      .select("case_id", "xml") // text sink: one value column + partition col
      .write.mode("overwrite").partitionBy("case_id").text(s"$outDir/xml")
    Sinks.runSummary(s"$outDir/ingestion_summary/summary.json", Map(
      "raw_documents" -> raw.count(),
      "valid_documents" -> valid.count(),
      "junk_documents" -> junk.count(),
      "utterances" -> nUtt,
      "utterances_inserted" -> nUttInserted,
      "chunks_inserted" -> nChunkInserted,
      "duration_s" -> (System.nanoTime() - t0) / 1e9))
    println(s"[pipeline] raw=${raw.count()} valid=${valid.count()} " +
      s"junk=${junk.count()} utterances=$nUtt (+$nUttInserted) " +
      s"chunks=+$nChunkInserted -> $outDir")
    spark.stop()
  }
}
