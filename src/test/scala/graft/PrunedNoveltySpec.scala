package graft

import org.apache.spark.sql.functions._
import graft.etl.Sinks

/** Round-16 closure of the last O(store)-per-batch pattern (r15 verdict
  * #1): every keyed-idempotent log sink — the streaming pair/op logs,
  * the MinHash/SimHash signature stores, the set-sim token store, the
  * fuzzy hood index — is bucketed by key hash (`__kb=` layout, modulus
  * pinned in `_graft_meta`), and the per-append novelty anti-join reads
  * ONLY the delta-touched bucket dirs.
  *
  * The prune asserts use the scan's `numFiles` METRIC after execution
  * (the TriangleEdgeStoreSpec discipline): partition pruning happens at
  * physical planning, so `inputFiles` (pre-prune) would lie.
  */
class PrunedNoveltySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def bucketDirs(path: String): Seq[java.io.File] =
    new java.io.File(path).listFiles().toSeq
      .filter(d => d.isDirectory && d.getName.startsWith("__kb="))

  private def filesUnder(d: java.io.File): Int =
    d.listFiles().count(f => f.isFile && f.getName.endsWith(".parquet"))

  /** Execute the EXACT existing-key plan the append runs for `delta`
    * and return (files the scan read, files in the touched dirs, total
    * files in the store). */
  private def scanReadout(path: String, keys: Seq[String], kb: Int,
                          delta: org.apache.spark.sql.DataFrame): (Long, Int, Int) = {
    val touched = delta.withColumn("__kb", Sinks.keyBucket(keys, kb))
      .select(col("__kb")).distinct().collect().map(_.getInt(0)).toSeq
    val existing = Sinks.prunedExistingKeys(spark, path, keys, touched)
    existing.collect()
    // unwrap AQE + query-stage shells: the distinct adds an exchange,
    // so the scan lives inside an AdaptiveSparkPlanExec's final plan
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val scanned = scans(existing.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    val dirs = bucketDirs(path)
    val touchedFiles = dirs
      .filter(d => touched.contains(d.getName.stripPrefix("__kb=").toInt))
      .map(filesUnder).sum
    (scanned, touchedFiles, dirs.map(filesUnder).sum)
  }

  private def assertPruned(path: String, keys: Seq[String], kb: Int,
                           delta: org.apache.spark.sql.DataFrame,
                           what: String): Unit = {
    val (scanned, touchedFiles, totalFiles) = scanReadout(path, keys, kb, delta)
    assert(touchedFiles < totalFiles,
      s"$what fixture gives the prune nothing to skip " +
        s"($touchedFiles of $totalFiles)")
    assert(scanned === touchedFiles.toLong,
      s"$what novelty scan must read exactly the delta buckets' files " +
        s"($touchedFiles of $totalFiles), read $scanned")
  }

  private lazy val docs = Tables.documents(spark, sfDir)
    .select($"doc_id", $"text")

  test("keyed log: replay inserts nothing; the novelty read scans only delta buckets") {
    val p = tmp("pn-log") + "/pairs"
    val all = (0L until 400L).map(i => (i, i % 7)).toDF("id_a", "id_b")
    // three batches so the log holds several file-sets per bucket
    for (b <- 0 until 3)
      assert(Sinks.idempotentAppendBucketed(
        all.filter($"id_a" % 3 === b), p, Seq("id_a", "id_b"), buckets = 16)
        === all.filter($"id_a" % 3 === b).count())
    // full replay: keyed idempotent
    assert(Sinks.idempotentAppendBucketed(all, p, Seq("id_a", "id_b")) === 0)
    assert(spark.read.parquet(p).count() === 400)
    // the pin froze (kb, keys)
    val m = graft.etl.StoreMeta.readParams(spark, p).get
    assert(m.get("family").contains("keyed_log") &&
      m.get("kb").contains("16") && m.get("keys").contains("id_a,id_b"))
    // a small delta's novelty read scans ONLY its own buckets
    assertPruned(p, Seq("id_a", "id_b"), 16,
      all.limit(3), "keyed log")
    // a disagreeing key tuple fail-fasts instead of mis-bucketing
    val e = intercept[IllegalArgumentException] {
      Sinks.idempotentAppendBucketed(all, p, Seq("id_b", "id_a"))
    }
    assert(e.getMessage.contains("bucketed on keys"))
  }

  test("minhash signature store: append prunes to the delta's buckets and replays to 0") {
    val p = tmp("pn-mh") + "/sigs"
    graft.ops.Dedup.writeMinHashSignatures(
      docs.filter($"doc_id" % 10 =!= 3), "doc_id", "text", p)
    val delta = docs.filter($"doc_id" % 10 === 3)
    val n = graft.ops.Dedup.appendMinHashSignatures(delta, "doc_id", "text", p)
    assert(n === delta.count())
    assert(graft.ops.Dedup.appendMinHashSignatures(
      delta, "doc_id", "text", p) === 0)
    assertPruned(p, Seq("__id"), Sinks.DefaultLogBuckets,
      delta.limit(2).select($"doc_id".as("__id")), "minhash sigs")
  }

  test("simhash signature store: append prunes and replays to 0") {
    val p = tmp("pn-sh") + "/sigs"
    graft.ops.Dedup.writeSimHashSignatures(
      docs.filter($"doc_id" % 10 =!= 3), "doc_id", "text", p)
    val delta = docs.filter($"doc_id" % 10 === 3)
    assert(graft.ops.Dedup.appendSimHashSignatures(
      delta, "doc_id", "text", p) === delta.count())
    assert(graft.ops.Dedup.appendSimHashSignatures(
      delta, "doc_id", "text", p) === 0)
    assertPruned(p, Seq("__id"), Sinks.DefaultLogBuckets,
      delta.limit(2).select($"doc_id".as("__id")), "simhash sigs")
  }

  test("token store: append prunes to the delta's buckets and replays to 0") {
    val p = tmp("pn-tok") + "/tokens"
    graft.ops.SetSimJoin.writeTokenStore(
      docs.filter($"doc_id" % 10 =!= 3), "doc_id", "text", p)
    val delta = docs.filter($"doc_id" % 10 === 3)
    val n = graft.ops.SetSimJoin.appendTokenStore(delta, "doc_id", "text", p)
    assert(n > 0)
    assert(graft.ops.SetSimJoin.appendTokenStore(
      delta, "doc_id", "text", p) === 0)
    assertPruned(p, Seq("__id"), Sinks.DefaultLogBuckets,
      delta.limit(2).select($"doc_id".as("__id")), "token store")
  }

  test("hood index: append prunes to the delta's buckets and replays to 0") {
    val p = tmp("pn-hood") + "/hoods"
    val reps = Tables.customer(spark, sfDir).select($"c_custkey", $"c_name")
    graft.ops.FuzzyJoin.writeHoodIndex(
      reps.filter($"c_custkey" % 10 =!= 3), "c_custkey", "c_name", p,
      maxDist = 1)
    val delta = reps.filter($"c_custkey" % 10 === 3)
    val n = graft.ops.FuzzyJoin.appendHoodIndex(
      delta, "c_custkey", "c_name", p)
    assert(n > 0)
    assert(graft.ops.FuzzyJoin.appendHoodIndex(
      delta, "c_custkey", "c_name", p) === 0)
    assertPruned(p, Seq("__rid"), Sinks.DefaultLogBuckets,
      delta.limit(2).select($"c_custkey".as("__rid")), "hood index")
  }

  test("incremental probes equal their pre-bucketing results (layout is invisible to semantics)") {
    // the bucketed store feeds the SAME probe outputs: incremental
    // minhash pairs against a bucketed store equal the batch operator
    // restricted to the same split (the d9 restriction discipline)
    val p = tmp("pn-sem") + "/sigs"
    val base = docs.filter($"doc_id" % 10 =!= 3)
    val delta = docs.filter($"doc_id" % 10 === 3)
    graft.ops.Dedup.writeMinHashSignatures(base, "doc_id", "text", p)
    val inc = graft.ops.Dedup.incrementalMinHashNearDups(
      delta, "doc_id", "text", p, 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val full = graft.ops.Dedup.minHashNearDups(docs, "doc_id", "text", 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val baseOnly = graft.ops.Dedup.minHashNearDups(base, "doc_id", "text", 0.8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(inc === (full -- baseOnly))
    assert(inc.nonEmpty)
  }
}
