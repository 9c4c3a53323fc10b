package graft

import org.apache.spark.sql.functions._
import graft.ops.{Sampling, Sketches}

/** The `_graft_meta` parameter pins on the five sketch-store families
  * (r14 — the RetrievalSpec pattern applied to KMV/CMS/HLL/histogram/
  * weighted-sample): for each family, (a) a store pinned with FOREIGN
  * parameters is honored end-to-end — the merge sketches the delta at
  * the store's pinned values and the merged result equals a full
  * rebuild AT THOSE values bit-for-bit; (b) an explicit caller
  * expectation that disagrees with the pin fail-fasts; (c) a store
  * with data but no sidecar (pre-pin layout) fail-fasts instead of
  * guessing. */
class SketchStoreMetaSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def li = Tables.lineitem(spark, sfDir)
    .select(col("l_returnflag"), col("l_suppkey"), col("l_orderkey"),
      col("l_extendedprice"))
  private def base = li.filter(col("l_orderkey") % 10 =!= 3)
  private def delta = li.filter(col("l_orderkey") % 10 === 3)

  test("KMV: a foreign pinned k is honored; a mismatched expectation fail-fasts") {
    val p = tmp("graft_ssm_kmv") + "/sk"
    // k = 64: NOT the default — the merge must resolve it from the pin
    Sketches.writeKmvStore(base, "l_returnflag", "l_suppkey", p, k = 64)
    assert(Sketches.kmvStoreK(spark, p) === 64)
    val (merged, k) = Sketches.mergeKmvStoreDelta(spark, p, delta,
      "l_returnflag", "l_suppkey")
    assert(k === 64)
    // lossless min-k fold: merged == full-corpus sketch AT k = 64
    assert(rows(merged) === rows(
      Sketches.kmvSketch(li, "l_returnflag", "l_suppkey", 64)))
    val e = intercept[IllegalArgumentException] {
      Sketches.mergeKmvStoreDelta(spark, p, delta,
        "l_returnflag", "l_suppkey", expectK = Sketches.KmvK)
    }
    assert(e.getMessage.contains("pinned to k=64"))
    // family guard: this dir is a KMV store, not a CMS one
    val e2 = intercept[IllegalArgumentException] {
      Sketches.mergeCmsStoreDelta(spark, p, delta, "l_suppkey")
    }
    assert(e2.getMessage.contains("family"))
  }

  test("CMS: a foreign pinned width x depth is honored; mismatch and pre-pin fail-fast") {
    val ev = Tables.events(spark, sfDir).select(col("user_id"), col("event_id"))
    val evBase = ev.filter(col("event_id") % 10 =!= 3)
    val evDelta = ev.filter(col("event_id") % 10 === 3)
    val p = tmp("graft_ssm_cms") + "/cells"
    Sketches.writeCmsStore(evBase, "user_id", p, width = 32, depth = 3)
    val (merged, w, d) = Sketches.mergeCmsStoreDelta(spark, p, evDelta, "user_id")
    assert((w, d) === ((32, 3)))
    // counts are linear: merged cells == full rebuild at 32 x 3
    assert(rows(merged) === rows(Sketches.countMin(ev, "user_id", 32, 3)))
    val e = intercept[IllegalArgumentException] {
      Sketches.mergeCmsStoreDelta(spark, p, evDelta, "user_id",
        expectWidth = 64)
    }
    assert(e.getMessage.contains("pinned to width=32"))
    // pre-pin layout: data without a sidecar must not be guessed at
    val meta = new org.apache.hadoop.fs.Path(s"$p/_graft_meta")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(meta, false))
    val e2 = intercept[IllegalArgumentException] {
      Sketches.mergeCmsStoreDelta(spark, p, evDelta, "user_id")
    }
    assert(e2.getMessage.contains("no _graft_meta sidecar"))
  }

  test("HLL: the pinned limb lane drives the delta's registers; a cross-lane merge fail-fasts") {
    val p = tmp("graft_ssm_hll") + "/regs"
    Sketches.writeHllStore(base, "l_returnflag", "l_suppkey", p, lane = 64)
    val (merged, lane) = Sketches.mergeHllStoreDelta(spark, p, delta,
      "l_returnflag", "l_suppkey")
    assert(lane === 64)
    // max-merge is lossless: merged == the full-corpus 64-bit registers
    assert(rows(merged) === rows(
      Sketches.hllRegisters64(li, "l_returnflag", "l_suppkey")))
    val e = intercept[IllegalArgumentException] {
      Sketches.mergeHllStoreDelta(spark, p, delta,
        "l_returnflag", "l_suppkey", expectLane = 32)
    }
    assert(e.getMessage.contains("limb lane"))
  }

  test("histogram: the pinned bin width drives the delta's bins; mismatch fail-fasts") {
    val p = tmp("graft_ssm_hist") + "/bins"
    Sketches.writeHistStore(base, "l_returnflag", "l_extendedprice", p,
      binWidth = 500.0)
    val (merged, w) = Sketches.mergeHistStoreDelta(spark, p, delta,
      "l_returnflag", "l_extendedprice")
    assert(w === 500.0)
    assert(rows(merged) === rows(
      Sketches.histBins(li, "l_returnflag", "l_extendedprice", 500.0)))
    val e = intercept[IllegalArgumentException] {
      Sketches.mergeHistStoreDelta(spark, p, delta,
        "l_returnflag", "l_extendedprice", expectWidth = 1000.0)
    }
    assert(e.getMessage.contains("pinned to bin_width=500"))
  }

  test("weighted sample: pinned (k, salt) drive the refold; mismatches fail-fast") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val w = greatest(col("n_chars"), lit(1)).cast("double")
    val dBase = docs.filter(col("doc_id") % 10 =!= 3)
    val dDelta = docs.filter(col("doc_id") % 10 === 3)
    val p = tmp("graft_ssm_ws") + "/sample"
    // k = 20, salt = "s2": both foreign to the t15 face's 50/"v1"
    Sampling.writeWeightedSampleStore(dBase, "doc_id", w, p, k = 20,
      salt = "s2")
    assert(Sampling.weightedSampleStoreParams(spark, p) === ((20, "s2")))
    val merged = Sampling.mergeWeightedSampleStore(spark, p, dDelta,
      "doc_id", w)
    // min-k fold over the pinned race order == the one-shot draw
    assert(rows(merged) === rows(
      Sampling.weightedSample(docs, "doc_id", w, 20, "s2")))
    val e1 = intercept[IllegalArgumentException] {
      Sampling.mergeWeightedSampleStore(spark, p, dDelta, "doc_id", w,
        expectK = 50)
    }
    assert(e1.getMessage.contains("pinned to k=20"))
    val e2 = intercept[IllegalArgumentException] {
      Sampling.mergeWeightedSampleStore(spark, p, dDelta, "doc_id", w,
        expectSalt = "v1")
    }
    assert(e2.getMessage.contains("pinned to salt='s2'"))
  }

  test("st23's stream fail-fasts when restarted under mismatched race parameters") {
    import graft.streaming.EventStreams
    val root = tmp("graft_ssm_st23")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"))
    docs.coalesce(1).write.parquet(s"$root/src")
    val schema = spark.read.parquet(s"$root/src").schema
    def run(k: Int, salt: String, cp: String) =
      EventStreams.weightedSampleStream(
        spark.readStream.schema(schema).parquet(s"$root/src"),
        "doc_id", greatest(col("n_chars"), lit(1)).cast("double"),
        k, salt, s"$root/store", s"$root/$cp")
    run(10, "v1", "cp1").awaitTermination()
    assert(EventStreams.readWeightedSample(spark, s"$root/store").count() === 10L)
    // a new run against the same store with a different k must refuse
    val q = run(20, "v1", "cp2")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(e.getMessage.contains("mismatched race parameters") ||
      Option(e.getCause).exists(_.getMessage.contains("mismatched race parameters")))
  }
}
