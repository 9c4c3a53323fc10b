package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity.SignRandomProjectionLsh

/** s1c — the delta-append face of the persisted LSH index: appending
  * must be indistinguishable from a full rebuild at probe time, and
  * must never touch the stored corpus's files (the d9 store
  * contract applied to the index). */
class IncrementalAnnSpec extends SparkSpec {

  private def listParts(p: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
      .filter(f => java.nio.file.Files.isRegularFile(f) &&
        f.getFileName.toString.endsWith(".parquet"))
      .map(f => f.toString -> java.nio.file.Files.getLastModifiedTime(f).toMillis)
      .toMap
  }

  test("append-built index probes identically to a full rebuild") {
    val corpus = Tables.embeddings(spark, sfDir)
    val queries = corpus.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val lsh = new SignRandomProjectionLsh(dim = 64, nBits = 8)
    val full = java.nio.file.Files.createTempDirectory("annspec_full").toString
    val incr = java.nio.file.Files.createTempDirectory("annspec_incr").toString
    lsh.writeIndex(corpus, full)
    lsh.writeIndex(corpus.filter(col("vec_id") % 10 =!= 3), incr)
    val before = listParts(incr)
    lsh.appendToIndex(corpus.filter(col("vec_id") % 10 === 3), incr)
    val after = listParts(incr)
    // store contract: every pre-append file survives byte-untouched
    // (same path, same mtime), the delta only ADDS files
    assert(before.keySet.subsetOf(after.keySet), "append must not delete")
    assert(before.forall { case (f, t) => after(f) == t },
      "append must not rewrite stored files")
    assert(after.size > before.size, "the delta must add files")
    def probe(path: String) =
      lsh.annTopKFromIndex(spark, path, queries, 10)
        .select(col("query_id"), col("cand_id"), round(col("cosine"), 6),
          col("rank"))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(probe(incr) === probe(full),
      "append == rebuild at probe time (partition scheme is the signature)")
  }

  test("a replayed append adds nothing: files byte-identical, probe unchanged") {
    val corpus = Tables.embeddings(spark, sfDir)
    val queries = corpus.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val lsh = new SignRandomProjectionLsh(dim = 64, nBits = 8)
    val p = java.nio.file.Files.createTempDirectory("annspec_replay").toString
    val delta = corpus.filter(col("vec_id") % 10 === 3)
    lsh.writeIndex(corpus.filter(col("vec_id") % 10 =!= 3), p)
    lsh.appendToIndex(delta, p)
    val before = listParts(p)
    val probeBefore = lsh.annTopKFromIndex(spark, p, queries, 10)
      .collect().map(_.toString).sorted.toSeq
    lsh.appendToIndex(delta, p) // the crash-retry replay
    assert(listParts(p) === before,
      "a replayed delta must append no files and rewrite none")
    assert(lsh.annTopKFromIndex(spark, p, queries, 10)
      .collect().map(_.toString).sorted.toSeq === probeBefore)
  }

  test("a mismatched (dim, nBits, seed) instance fails fast against a pinned index") {
    val corpus = Tables.embeddings(spark, sfDir)
    val queries = corpus.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val lsh = new SignRandomProjectionLsh(dim = 64, nBits = 8)
    val p = java.nio.file.Files.createTempDirectory("annspec_fp").toString
    lsh.writeIndex(corpus, p)
    // same dim, different seed: signatures — and so the partition
    // layout — silently diverge; the fingerprint must catch it for
    // both the probe and the append
    val foreign = new SignRandomProjectionLsh(dim = 64, nBits = 8, seed = 7L)
    val e1 = intercept[IllegalArgumentException] {
      foreign.annTopKFromIndex(spark, p, queries, 10).collect()
    }
    assert(e1.getMessage.contains("fingerprint"))
    val e2 = intercept[IllegalArgumentException] {
      foreign.appendToIndex(corpus.limit(5), p)
    }
    assert(e2.getMessage.contains("fingerprint"))
    // the original instance still probes fine
    assert(lsh.annTopKFromIndex(spark, p, queries, 10).count() > 0)
  }

  test("a day-zero empty append leaves a store later appends can still build") {
    val corpus = Tables.embeddings(spark, sfDir)
    val queries = corpus.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val lsh = new SignRandomProjectionLsh(dim = 64, nBits = 8)
    val p = java.nio.file.Files.createTempDirectory("annspec_dayzero").toString + "/idx"
    // the hazard: an empty/fully-non-novel day-zero delta must not
    // leave a dir whose presence makes the NEXT append read parquet
    // from a parquet-less store ("has data", not "dir exists")
    lsh.appendToIndex(corpus.limit(0), p)
    lsh.appendToIndex(corpus, p) // must not crash on schema inference
    assert(lsh.annTopKFromIndex(spark, p, queries, 10).count() > 0)
  }

  test("appending to a legacy (unpinned) index does not pin the appender's fingerprint") {
    val corpus = Tables.embeddings(spark, sfDir)
    val lsh = new SignRandomProjectionLsh(dim = 64, nBits = 8)
    val p = java.nio.file.Files.createTempDirectory("annspec_legacy").toString
    lsh.writeIndex(corpus.filter(col("vec_id") % 10 =!= 3), p)
    // simulate a pre-guard index: data present, no sidecar
    val meta = new org.apache.hadoop.fs.Path(s"$p/_graft_meta")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(meta, false)
    // a FOREIGN instance appends (legacy stores keep caller-owned
    // parameter discipline — nothing to fail fast against) ...
    val foreign = new SignRandomProjectionLsh(dim = 64, nBits = 8, seed = 7L)
    foreign.appendToIndex(corpus.filter(col("vec_id") % 10 === 3).limit(3), p)
    // ... and must NOT become authoritative: pinning the foreign
    // fingerprint would permanently lock the store to the WRONG
    // layout and reject the instance that actually built it
    assert(graft.etl.StoreMeta.read(spark, p).isEmpty,
      "append onto a legacy store must not auto-pin")
    // the original builder instance remains usable
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    assert(lsh.annTopKFromIndex(spark, p, queries, 5).count() > 0)
  }

  test("registered s1c equals s1b on the same corpus and queries") {
    val a = SparkEntry.queries("s1c_ann_incremental")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("s1b_ann_persisted")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }
}
