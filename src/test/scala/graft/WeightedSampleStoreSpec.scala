package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling
import graft.streaming.EventStreams

/** The sampling family's store + streaming faces (t15b/st23): the
  * min-k fold identity over the deterministic race keys, the
  * streamed sample's row-for-row equality with the one-shot draw,
  * the O(1) snapshot-dir bound, byte-identical replays, and the
  * store-behind-checkpoint gap guard. */
class WeightedSampleStoreSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("source"), col("n_chars"))
  private def w = greatest(col("n_chars"), lit(1)).cast("double")

  private def draw(df: org.apache.spark.sql.DataFrame): Seq[String] =
    Sampling.weightedSample(df, "doc_id", w, k = 50, salt = "v1")
      .collect().map(_.toString).sorted.toSeq

  test("min-k fold identity: bottom-k(bottom-k(A) ∪ B) = bottom-k(A ∪ B)") {
    val full = draw(docsDf)
    for (m <- Seq(2L, 3L, 7L)) {
      val folded = draw(
        Sampling.weightedSample(docsDf.filter(col("doc_id") % m =!= 0),
            "doc_id", w, k = 50, salt = "v1")
          .unionByName(docsDf.filter(col("doc_id") % m === 0)))
      assert(folded == full, s"fold over split mod $m must equal one-shot")
    }
  }

  private def fileSig(dir: java.io.File): Seq[(String, Long)] =
    Option(dir.listFiles()).toSeq.flatten.filter(_.isFile)
      .map(f => f.getName -> f.length()).sortBy(_._1)

  test("streamed sample = one-shot draw; O(1) snapshot dirs; replay rewrites nothing") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_ws_stream").toString
    docsDf.repartition(8).write.parquet(s"$tmp/src")
    val schema = spark.read.parquet(s"$tmp/src").schema
    def run(cp: String): Unit =
      EventStreams.weightedSampleStream(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$tmp/src"),
        "doc_id", w, k = 50, salt = "v1", s"$tmp/store", cp)
        .awaitTermination()
    run(s"$tmp/cp")
    val streamed = EventStreams.readWeightedSample(spark, s"$tmp/store")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == draw(docsDf),
      "drained sample must equal the one-shot batch draw row-for-row")
    def snapDirs() = Option(new java.io.File(s"$tmp/store").listFiles())
      .toSeq.flatten.filter(_.getName.startsWith("sample_"))
    assert(snapDirs().length == 1,
      "the sweep must keep exactly the newest snapshot")
    // a full replay (fresh checkpoint, same source) sees every batch
    // already folded: the committed snapshot must stay BYTE-identical
    val sig = fileSig(snapDirs().head)
    run(s"$tmp/cp_replay")
    assert(snapDirs().length == 1)
    assert(fileSig(snapDirs().head) == sig,
      "replay over a caught-up store must not rewrite the snapshot")
  }

  test("fails fast when the sample store is behind the checkpoint") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_ws_gap").toString
    docsDf.filter(col("doc_id") < 100).repartition(2)
      .write.parquet(s"$tmp/src")
    val schema = spark.read.parquet(s"$tmp/src").schema
    def run(): Unit =
      EventStreams.weightedSampleStream(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$tmp/src"),
        "doc_id", w, k = 50, salt = "v1", s"$tmp/store", s"$tmp/cp")
        .awaitTermination()
    run() // folds batches 0..1
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(s"$tmp/store"))
    docsDf.filter(col("doc_id") >= 100 && col("doc_id") < 120)
      .coalesce(1).write.mode("append").parquet(s"$tmp/src")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run()
    }
    assert(e.getMessage.contains("refusing to fold") ||
      Option(e.getCause).exists(_.getMessage.contains("refusing to fold")),
      s"gap must fail fast, got: ${e.getMessage}")
  }
}
