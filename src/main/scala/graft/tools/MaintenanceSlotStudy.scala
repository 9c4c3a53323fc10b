package graft.tools

import org.apache.spark.sql.functions._

/** r15 pricing harness for the in-stream maintenance slots: runs the
  * two store-heaviest self-maintaining faces — st20 (BM25 index
  * stream) and st21 (triangle count stream) — as 8-batch AvailableNow
  * streams TWICE each, maintainEvery = 2 vs 0, and reports per-batch
  * trigger wall times (StreamingQueryListener progress) plus the final
  * store file counts. The question the table answers: does the fold
  * amortize to noise at bench scale, and if not, where is the
  * crossover (the r13 pricing discipline applied to r14's own
  * feature).
  *
  * Usage: scripts/run-tool.sh graft.tools.MaintenanceSlotStudy <sfDir>
  *
  * Output: one human-readable line per (face, maintainEvery, batch) —
  * transcribed into PERFORMANCE.md's round-15 section.
  */
object MaintenanceSlotStudy {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local("graft-maint-slot")
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.EventStreams

    // per-batch trigger durations via the progress listener
    val durations =
      scala.collection.concurrent.TrieMap[(String, Long), Long]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryProgressEvent): Unit =
        durations.put((e.progress.name, e.progress.batchId),
          e.progress.durationMs.get("triggerExecution").longValue()): Unit
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener
            .QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    def parquetFilesUnder(dir: String): Int = {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.exists(p)) 0
      else {
        val s = java.nio.file.Files.walk(p)
        try s.iterator().asScala.count(f =>
          java.nio.file.Files.isRegularFile(f) &&
            f.getFileName.toString.endsWith(".parquet"))
        finally s.close()
      }
    }

    def report(face: String, every: Int, name: String,
               storeDir: String): Unit = {
      val rows = durations.keys.filter(_._1 == name).toSeq.sortBy(_._2)
      val secs = rows.map(k => durations(k) / 1000.0)
      println(f"[maint] $face maintainEvery=$every per-batch s: " +
        secs.map(s => f"$s%.2f").mkString(" ") +
        f" | total ${secs.sum}%.2f s | store files ${parquetFilesUnder(storeDir)}")
    }

    // ---- st20: BM25 index stream over the documents table, 8 batches
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    for (every <- Seq(0, 2)) {
      val root = java.nio.file.Files.createTempDirectory("maint_bm25").toString
      docs.repartition(8).write.parquet(s"$root/src")
      val schema = spark.read.parquet(s"$root/src").schema
      val qName = s"bm25_every$every"
      val q = EventStreams.bm25IndexStream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(s"$root/src"),
        "doc_id", "text", s"$root/index", s"$root/cp",
        maintainEvery = every)
      // name the query for the listener via its runId-keyed progress:
      // StreamingQuery.name is read-only post-start, so key on runId
      q.awaitTermination()
      Thread.sleep(2000) // listener bus drains asynchronously
      // re-key the captured progress rows (name is null for unnamed
      // queries) before the next run starts emitting its own
      val captured = durations.keys.filter(_._1 == null).toSeq
      captured.foreach { k =>
        durations.put((qName, k._2), durations.remove(k).get): Unit
      }
      report("st20/bm25", every, qName, s"$root/index")
    }

    // ---- st21: triangle count stream over supplier co-edges, 8 batches
    val edges = graft.analytics.CoreQueries.supplierCoEdges(spark, sfDir)
      .localCheckpoint()
    println(s"[maint] triangle corpus edges: ${edges.count()}")
    for (every <- Seq(0, 2)) {
      val root = java.nio.file.Files.createTempDirectory("maint_tri").toString
      edges.repartition(8).write.parquet(s"$root/src")
      val schema = spark.read.parquet(s"$root/src").schema
      val qName = s"tri_every$every"
      val q = EventStreams.triangleCountStream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(s"$root/src"),
        "u", "v", s"$root/store", s"$root/cp", maintainEvery = every)
      q.awaitTermination()
      Thread.sleep(2000) // listener bus drains asynchronously
      val captured = durations.keys.filter(_._1 == null).toSeq
      captured.foreach { k =>
        durations.put((qName, k._2), durations.remove(k).get): Unit
      }
      report("st21/triangles", every, qName, s"$root/store")
    }

    spark.streams.removeListener(listener)
    spark.stop()
  }
}
