package graft

import org.apache.spark.sql.functions._
import graft.etl.BucketCompaction
import graft.ops.{Retrieval, Triangles}

/** The append-only stores' small-file fold (etl.BucketCompaction):
  * row identity dir by dir, the 1-file bound after, untouched dirs
  * byte-identical, query results unchanged over a compacted store,
  * and every crash window of the staged swap healing on retry. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def bucketDirs(path: String, prefix: String): Seq[java.io.File] =
    Option(new java.io.File(path).listFiles()).toSeq.flatten
      .filter(d => d.isDirectory && d.getName.startsWith(s"$prefix=")
        && !d.getName.contains("__compact_"))

  private def fileSig(dir: java.io.File): Seq[(String, Long)] =
    Option(dir.listFiles()).toSeq.flatten
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).sortBy(_._1)

  private def sortedRows(path: String): Seq[String] =
    spark.read.parquet(path).collect().map(_.toString).sorted.toSeq

  test("bm25 index compaction: multi-file precondition, 1-file bound, row identity, identical scores") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val idx = tmp("graft_cmp_bm25")
    // three appends so touched buckets and the sidecar really
    // accumulate multiple file-sets — the precondition that makes the
    // 1-file assert meaningful
    Seq(col("doc_id") % 10 < 3, col("doc_id") % 10 === 3,
        col("doc_id") % 10 > 3)
      .foreach(s => Retrieval.appendBm25Index(
        docs.filter(s), "doc_id", "text", idx): Unit)
    val posted = bucketDirs(s"$idx/postings", "tb")
    assert(posted.exists(d =>
        BucketCompaction.dataFileCount(spark, d.toString) > 1),
      "fixture must accumulate multi-file buckets before compacting")
    assert(bucketDirs(s"$idx/docs", "__kb").exists(d =>
      BucketCompaction.dataFileCount(spark, d.toString) > 1))

    val rowsBefore = sortedRows(s"$idx/postings")
    val docsBefore = sortedRows(s"$idx/docs")
    val scoresBefore = Retrieval
      .bm25FromIndex(spark, idx, graft.analytics.TextQueries.BmTerms)
      .collect().map(_.toString).sorted.toSeq

    val rewritten = Retrieval.compactBm25Index(spark, idx)
    assert(rewritten.nonEmpty)
    // labels are index-root-relative: postings buckets and doc-sidecar
    // buckets each carry their subdir
    assert(rewritten.forall(d =>
        d.startsWith("postings/tb=") || d.startsWith("docs/__kb=")),
      s"mislabeled rewritten dirs: $rewritten")
    assert(rewritten.exists(_.startsWith("docs/__kb=")))
    bucketDirs(s"$idx/postings", "tb").foreach { d =>
      assert(BucketCompaction.dataFileCount(spark, d.toString) == 1,
        s"bucket ${d.getName} not folded to one file")
    }
    bucketDirs(s"$idx/docs", "__kb").foreach { d =>
      assert(BucketCompaction.dataFileCount(spark, d.toString) == 1,
        s"docs bucket ${d.getName} not folded to one file")
    }
    assert(sortedRows(s"$idx/postings") == rowsBefore)
    assert(sortedRows(s"$idx/docs") == docsBefore)
    val scoresAfter = Retrieval
      .bm25FromIndex(spark, idx, graft.analytics.TextQueries.BmTerms)
      .collect().map(_.toString).sorted.toSeq
    assert(scoresAfter == scoresBefore)
    // idempotent: a second pass finds nothing above the bound
    assert(Retrieval.compactBm25Index(spark, idx).isEmpty)
  }

  // a seeded random graph; split into a seed set and two appends
  private val rnd = new scala.util.Random(31)
  private val allEdges = (for (a <- 0L until 50L; b <- (a + 1) until 50L
                               if rnd.nextDouble() < 0.2) yield (a, b)).toIndexedSeq

  test("edge store compaction: below-bound dirs untouched byte-identically, merges unchanged") {
    val p = tmp("graft_cmp_edges") + "/edges"
    val (d2, rest) = allEdges.partition { case (u, v) => (u + v) % 7 == 2 }
    val (d1, seed) = rest.partition { case (u, v) => (u + v) % 7 == 3 }
    Triangles.writeEdgeStore(seed.toDF("u", "v"), "u", "v", p, nBuckets = 8)
    Triangles.appendEdgeStore(
      Triangles.normalize(d1.toDF("u", "v")), p)
    Triangles.appendEdgeStore(
      Triangles.normalize(d2.toDF("u", "v")), p)
    // the store's leaves are eb=X/o=Y (r14 orientation sub-partition)
    def leafDirs(path: String): Seq[java.io.File] =
      bucketDirs(path, "eb").flatMap(eb => bucketDirs(eb.toString, "o"))
    def leafName(d: java.io.File) = s"${d.getParentFile.getName}/${d.getName}"
    val before = leafDirs(p)
    assert(before.exists(d =>
      BucketCompaction.dataFileCount(spark, d.toString) > 1))
    val rowsBefore = sortedRows(p)
    // dirs already at one file are below the bound: compaction must
    // leave their files BYTE-identical (name + size)
    val alreadyCompact = before
      .filter(d => BucketCompaction.dataFileCount(spark, d.toString) == 1)
      .map(d => leafName(d) -> fileSig(d)).toMap
    Triangles.compactEdgeStore(spark, p)
    val after = leafDirs(p)
    after.foreach(d =>
      assert(BucketCompaction.dataFileCount(spark, d.toString) == 1))
    alreadyCompact.foreach { case (name, sig) =>
      assert(fileSig(after.find(leafName(_) == name).get) == sig,
        s"already-compact dir $name was rewritten")
    }
    assert(sortedRows(p) == rowsBefore)
    assert(graft.etl.StoreMeta.read(spark, p).contains(8),
      "the _graft_meta sidecar must survive compaction")
    // and a bucketed merge over the compacted store still equals the
    // full recount (the tc2 identity)
    val delta = Seq((0L, 1L), (0L, 2L), (1L, 2L), (48L, 49L)).toDF("u", "v")
    val merged = Triangles.mergeTriangleCountsBucketed(
      Triangles.perNode(allEdges.toDF("u", "v"), "u", "v"), p, delta, "u", "v")
    val full = Triangles.perNode(
      allEdges.toDF("u", "v").unionByName(delta), "u", "v")
    assert(merged.collect().map(_.toString).sorted.toSeq ==
      full.collect().map(_.toString).sorted.toSeq)
  }

  test("generalizes: the persisted LSH index's __sig dirs fold with probes unchanged") {
    val corpus = Tables.embeddings(spark, sfDir)
    val queries = corpus.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val lsh = new graft.ops.Similarity.SignRandomProjectionLsh(
      dim = 64, nBits = 8)
    val idx = tmp("graft_cmp_ann")
    lsh.writeIndex(corpus.filter(col("vec_id") % 10 =!= 3), idx)
    lsh.appendToIndex(corpus.filter(col("vec_id") % 10 === 3), idx)
    assert(bucketDirs(idx, "__sig").exists(d =>
      BucketCompaction.dataFileCount(spark, d.toString) > 1))
    val before = lsh.annTopKFromIndex(spark, idx, queries, 10)
      .collect().map(_.toString).sorted.toSeq
    assert(BucketCompaction.compactStore(spark, idx, "__sig").nonEmpty)
    bucketDirs(idx, "__sig").foreach(d =>
      assert(BucketCompaction.dataFileCount(spark, d.toString) == 1))
    val after = lsh.annTopKFromIndex(spark, idx, queries, 10)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before,
      "probing a compacted index must return identical neighbors")
  }

  test("every crash window of the staged swap heals on retry") {
    val parent = tmp("graft_cmp_crash")
    def seedDir(): Unit = {
      Seq(1L, 2L).toDF("x").write.mode("overwrite").parquet(s"$parent/b=0")
      Seq(3L).toDF("x").write.mode("append").parquet(s"$parent/b=0")
    }
    val fs = new org.apache.hadoop.fs.Path(parent)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hp(n: String) = new org.apache.hadoop.fs.Path(s"$parent/$n")
    def rows() = sortedRows(s"$parent/b=0")

    // window 1: staged tmp written, crash before park — live dir intact
    seedDir()
    val expected = rows()
    spark.read.parquet(s"$parent/b=0").coalesce(1)
      .write.mode("overwrite").parquet(s"$parent/b=0__compact_tmp")
    BucketCompaction.compactStore(spark, parent, "b")
    assert(rows() == expected)
    assert(BucketCompaction.dataFileCount(spark, s"$parent/b=0") == 1)
    assert(!fs.exists(hp("b=0__compact_tmp")))

    // window 2: crash between park and publish — live dir MISSING,
    // tmp complete; heal must publish the tmp
    seedDir()
    assert(rows() == expected)
    spark.read.parquet(s"$parent/b=0").coalesce(1)
      .write.mode("overwrite").parquet(s"$parent/b=0__compact_tmp")
    assert(fs.rename(hp("b=0"), hp("b=0__compact_old")))
    BucketCompaction.compactStore(spark, parent, "b")
    assert(rows() == expected)
    assert(BucketCompaction.dataFileCount(spark, s"$parent/b=0") == 1)
    assert(!fs.exists(hp("b=0__compact_old")))

    // window 3: crash between publish and sweep — parked dir leftover
    seedDir()
    spark.read.parquet(s"$parent/b=0").coalesce(1)
      .write.mode("overwrite").parquet(s"$parent/b=0__compact_tmp")
    assert(fs.rename(hp("b=0"), hp("b=0__compact_old")))
    assert(fs.rename(hp("b=0__compact_tmp"), hp("b=0")))
    BucketCompaction.compactStore(spark, parent, "b")
    assert(rows() == expected)
    assert(!fs.exists(hp("b=0__compact_old")))
  }

  // ===== the r14 in-stream maintenance slot: a LONG stream (4x the
  // trigger) must keep its own file counts bounded, with the face's
  // results identical to a one-shot build =====

  test("bm25 stream maintenance: 8 batches at maintainEvery=2 end at 1 file per dir") {
    import graft.streaming.EventStreams
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val root = tmp("graft_cmp_bm25stream")
    docs.repartition(8).write.parquet(s"$root/src")
    val schema = spark.read.parquet(s"$root/src").schema
    EventStreams.bm25IndexStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/src"),
      "doc_id", "text", s"$root/idx", s"$root/cp",
      maintainEvery = 2).awaitTermination()
    // the final batch (7) ran the slot, so EVERY dir is fully folded —
    // without the slot each of the 8 appends would land its own
    // file-set in the touched dirs
    bucketDirs(s"$root/idx/postings", "tb").foreach { d =>
      assert(BucketCompaction.dataFileCount(spark, d.toString) === 1,
        s"postings ${d.getName} not folded by the in-stream slot")
    }
    bucketDirs(s"$root/idx/docs", "__kb").foreach { d =>
      assert(BucketCompaction.dataFileCount(spark, d.toString) === 1,
        s"docs bucket ${d.getName} not folded by the in-stream slot")
    }
    // the maintained index scores identically to a one-shot build
    val oneShot = tmp("graft_cmp_bm25oneshot")
    Retrieval.appendBm25Index(docs, "doc_id", "text", oneShot)
    def scores(p: String) = Retrieval
      .bm25FromIndex(spark, p, graft.analytics.TextQueries.BmTerms)
      .collect().map(_.toString).sorted.toSeq
    assert(scores(s"$root/idx") === scores(oneShot))
  }

  test("dedup stream maintenance: flat signature/pair stores fold to one file, pairs unchanged") {
    import graft.streaming.EventStreams
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    def run(root: String, every: Int): Unit = {
      docs.repartition(8).write.parquet(s"$root/src")
      val schema = spark.read.parquet(s"$root/src").schema
      EventStreams.incrementalDedupStream(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$root/src"),
        "doc_id", "text", s"$root/store", s"$root/pairs", s"$root/cp",
        maintainEvery = every).awaitTermination()
    }
    val rootA = tmp("graft_cmp_dedupstream")
    val rootB = tmp("graft_cmp_dedupstream_off")
    run(rootA, 2)
    run(rootB, 0)
    // batch 7 ran the slot last: both bucketed stores fully folded —
    // one file per touched `__kb=` dir (the r16 keyed-log layout)
    for ((p, what) <- Seq(s"$rootA/store" -> "signature store",
                          s"$rootA/pairs" -> "pair log")) {
      val dirs = bucketDirs(p, "__kb")
      assert(dirs.nonEmpty, s"$what has no __kb= dirs")
      dirs.foreach { d =>
        assert(BucketCompaction.dataFileCount(spark, d.toString) === 1,
          s"$what ${d.getName} not folded by the in-stream slot")
      }
    }
    assert(bucketDirs(s"$rootB/store", "__kb")
        .exists(d => BucketCompaction.dataFileCount(spark, d.toString) > 1),
      "the unmaintained fixture must actually accumulate file-sets")
    // row-preserving: the maintained stream's pairs equal the
    // unmaintained one's (set equality — discovery order may differ
    // only if batching differed, which the shared staging prevents)
    def pairSet(root: String) = spark.read.parquet(s"$root/pairs")
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(rootA) === pairSet(rootB))
  }

  test("triangle stream maintenance: 8 batches at maintainEvery=2 end fully folded") {
    import graft.streaming.EventStreams
    val root = tmp("graft_cmp_tristream")
    allEdges.toDF("u", "v").repartition(8).write.parquet(s"$root/src")
    val schema = spark.read.parquet(s"$root/src").schema
    EventStreams.triangleCountStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$root/src"),
      "u", "v", s"$root/store", s"$root/cp",
      maintainEvery = 2).awaitTermination()
    // batch 7's slot folded everything: 1 file per (eb, o) leaf, no
    // loose inc dirs, exactly one committed base
    val leaves = bucketDirs(s"$root/store/edges", "eb")
      .flatMap(eb => bucketDirs(eb.toString, "o"))
    assert(leaves.nonEmpty)
    leaves.foreach { d =>
      assert(BucketCompaction.dataFileCount(spark, d.toString) === 1,
        s"edge leaf ${d.getParentFile.getName}/${d.getName} not folded " +
          "by the in-stream slot")
    }
    val dirs = new java.io.File(s"$root/store").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(!dirs.exists(_.startsWith("inc_")), s"unfolded incs: $dirs")
    assert(dirs.count(_.startsWith("base_")) === 1)
    // and the maintained store's counts equal the one-shot recount
    val got = EventStreams.readTriangleCounts(spark, s"$root/store")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Triangles.perNode(allEdges.toDF("u", "v"), "u", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }
}
