package graft

import org.apache.spark.sql.functions._
import graft.ops.Triangles
import graft.streaming.EventStreams

/** The bucket-partitioned adjacency edge store (tc2/st21): per-merge
  * READS must prune to the delta endpoints' bucket dirs (file-level
  * assert), the bucketed merge must equal a full recount, appends must
  * leave stored files byte-identical, and the increment-dir compaction
  * must fold losslessly while the stream keeps running across it. */
class TriangleEdgeStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def recount(edges: Seq[(Long, Long)]): Map[Long, Long] =
    toMap(Triangles.perNode(edges.toDF("u", "v"), "u", "v"))

  // a seeded random graph big enough to populate many buckets
  private val rnd = new scala.util.Random(13)
  private val allEdges = (for (a <- 0L until 60L; b <- (a + 1) until 60L
                               if rnd.nextDouble() < 0.15) yield (a, b)).toIndexedSeq
  private val (deltaEdges, baseEdges) =
    allEdges.partition { case (u, v) => (u * 31 + v) % 10 == 3 }

  test("readAdjForDelta reads ONLY the delta endpoints' bucket dirs (file-level)") {
    val p = tmp("graft_tes_prune") + "/edges"
    Triangles.writeEdgeStore(baseEdges.toDF("u", "v"), "u", "v", p, nBuckets = 8)
    // a one-edge delta names at most 2 buckets of the 8
    val delta = Seq((1L, 2L)).toDF("u", "v")
    val expectedBuckets = Seq(1L, 2L).toDF("n")
      .select(pmod(xxhash64($"n"), lit(8L)).as("eb"))
      .distinct().as[Long].collect().toSet
    def parquetFilesUnder(dir: java.io.File): Int = {
      // recurse: the store's leaves are eb=X/o=Y subdirs (r14 layout)
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(dir.toPath)
      try s.iterator().asScala.count(f =>
        java.nio.file.Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    }
    val bucketDirs = new java.io.File(p).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("eb="))
    assert(bucketDirs.length > 2,
      "fixture must populate more buckets than the delta touches")
    val expectedFiles = bucketDirs
      .filter(d => expectedBuckets.contains(d.getName.stripPrefix("eb=").toLong))
      .map(parquetFilesUnder).sum
    val totalFiles = bucketDirs.map(parquetFilesUnder).sum
    assert(expectedFiles < totalFiles, "pruning must have something to skip")
    val adj = Triangles.readAdjForDelta(spark, p, delta)
    adj.collect()
    // the POST-PRUNING file count the scan actually read: partition
    // pruning happens at physical planning, so inputFiles (pre-prune)
    // would lie here — the scan metric is the honest readout
    val scans = adj.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a v1 parquet scan:\n" +
      adj.queryExecution.executedPlan.toString.take(800))
    assert(scans.map(_.metrics("numFiles").value).sum === expectedFiles.toLong,
      s"the scan must read exactly the delta buckets' files ($expectedFiles of $totalFiles)")
  }

  test("bucketed merge equals a full recount (engineered + random deltas)") {
    val base = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (7L, 5L))
    val deltas = Seq(
      Seq((3L, 1L)),                               // closes {1,2,3}
      Seq((2L, 8L), (8L, 1L)),                     // {1,2,8}: 2 novel edges
      Seq((20L, 21L), (21L, 22L), (22L, 20L)),     // all-novel triangle
      Seq((5L, 6L)),                               // replay: adds nothing
      Seq((3L, 1L), (2L, 8L), (8L, 1L), (6L, 1L))) // mixed batch
    for (d <- deltas) {
      val p = tmp("graft_tes_merge") + "/edges"
      Triangles.writeEdgeStore(base.toDF("u", "v"), "u", "v", p, nBuckets = 4)
      val got = toMap(Triangles.mergeTriangleCountsBucketed(
        Triangles.perNode(base.toDF("u", "v"), "u", "v"),
        p, d.toDF("u", "v"), "u", "v").filter($"n_tri" > 0))
      assert(got === recount(base ++ d), s"delta $d must equal the full recount")
    }
    // the seeded random split, against the store
    val p = tmp("graft_tes_merge") + "/edges"
    Triangles.writeEdgeStore(baseEdges.toDF("u", "v"), "u", "v", p, nBuckets = 8)
    val got = toMap(Triangles.mergeTriangleCountsBucketed(
      Triangles.perNode(baseEdges.toDF("u", "v"), "u", "v"),
      p, deltaEdges.toDF("u", "v"), "u", "v").filter($"n_tri" > 0))
    assert(got === recount(allEdges))
  }

  test("adaptive read: dense deltas serve from the a<b half, sparse from pruned dirs") {
    assert(!Triangles.isDenseDelta(2, 8))
    assert(!Triangles.isDenseDelta(3, 8)) // 3 < 0.5*8
    assert(Triangles.isDenseDelta(4, 8))
    assert(Triangles.isDenseDelta(8, 8))
    val p = tmp("graft_tes_adaptive") + "/edges"
    Triangles.writeEdgeStore(baseEdges.toDF("u", "v"), "u", "v", p, nBuckets = 8)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the ~10% random delta's endpoints hash into every one of the 8
    // buckets -> dense regime: the read must equal BOTH orientations
    // of the stored normalized edges exactly (each edge twice)
    val dense = Triangles.readAdjForDeltaAdaptive(spark, p,
      deltaEdges.toDF("u", "v"))
    val expected = baseEdges.flatMap { case (u, v) => Seq((u, v), (v, u)) }.toSet
    assert(pairs(dense) === expected)
    assert(dense.count() === 2L * baseEdges.size)
    // a one-edge delta names <= 2 of 8 buckets -> sparse regime: the
    // adaptive read must equal the pruned read (a strict subset of the
    // store whenever pruning skips buckets)
    val oneEdge = Seq((1L, 2L)).toDF("u", "v")
    val sparse = Triangles.readAdjForDeltaAdaptive(spark, p, oneEdge)
    assert(pairs(sparse) === pairs(Triangles.readAdjForDelta(spark, p, oneEdge)))
    assert(pairs(sparse).subsetOf(expected))
    assert(sparse.count() < dense.count(),
      "the sparse fixture must actually prune something")
  }

  test("bucketed merge equals a full recount at EVERY delta density (regime sweep)") {
    // mod 2 -> ~50% delta (dense), 3 -> ~33%, 10 -> ~10% (the tc2
    // default), 100 -> ~1% (sparse at 8 buckets only for tiny deltas,
    // but the SWEEP is the contract: the adaptive read may pick either
    // source and the merge must be split-invariant)
    for (mod <- Seq(2L, 3L, 10L, 100L)) {
      val (d, b) = allEdges.partition { case (u, v) => (u * 31 + v) % mod == mod - 1 }
      val p = tmp(s"graft_tes_sweep$mod") + "/edges"
      Triangles.writeEdgeStore(b.toDF("u", "v"), "u", "v", p, nBuckets = 8)
      val got = toMap(Triangles.mergeTriangleCountsBucketed(
        Triangles.perNode(b.toDF("u", "v"), "u", "v"),
        p, d.toDF("u", "v"), "u", "v").filter($"n_tri" > 0))
      assert(got === recount(allEdges), s"delta density 1/$mod must equal recount")
    }
  }

  test("append writes only novel endpoints' buckets; stored files stay byte-identical") {
    val p = tmp("graft_tes_append") + "/edges"
    Triangles.writeEdgeStore(baseEdges.toDF("u", "v"), "u", "v", p, nBuckets = 8)
    def files(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try s.iterator().asScala
        .filter(f => java.nio.file.Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet"))
        .map(f => f.toString -> java.nio.file.Files.getLastModifiedTime(f).toMillis)
        .toMap
      finally s.close()
    }
    val before = files()
    Triangles.appendEdgeStore(Seq((200L, 201L)).toDF("u", "v"), p)
    val after = files()
    before.foreach { case (f, t) =>
      assert(after.get(f).contains(t), s"stored file must stay byte-identical: $f")
    }
    assert(after.size > before.size, "the append must land new files")
    // the appended edge is now visible to a pruned read
    val adj = Triangles.readAdjForDelta(spark, p, Seq((200L, 201L)).toDF("u", "v"))
    assert(adj.filter($"a" === 200L && $"b" === 201L).count() === 1L)
  }

  test("an edge store with data but no meta sidecar fail-fasts") {
    val p = tmp("graft_tes_nometa") + "/edges"
    Triangles.writeEdgeStore(baseEdges.toDF("u", "v"), "u", "v", p, nBuckets = 4)
    assert(new java.io.File(p, "_graft_meta").delete())
    val e = intercept[IllegalArgumentException] {
      Triangles.readAdjForDelta(spark, p, Seq((1L, 2L)).toDF("u", "v"))
    }
    assert(e.getMessage.contains("_graft_meta"))
  }

  test("work-regime fallback: recount-and-diff increments equal enumerated ones bit-for-bit") {
    // the same source streamed twice: default threshold (the 25%-ish
    // batches all trigger the recount-and-diff) vs fallback disabled
    // (pure enumeration). Counts, per-batch increments and the final
    // recount must agree exactly.
    def run(root: String, frac: Double): Unit = {
      // stage 4 deterministic slices as separate sequential writes:
      // file order (hence batch content) must match across the two
      // runs for the per-batch increment compare to mean anything
      val n = allEdges.size
      for (i <- 0 until 4)
        allEdges.slice(i * n / 4, (i + 1) * n / 4).toDF("u", "v")
          .coalesce(1).write.mode("append").parquet(s"$root/src")
      val schema = spark.read.parquet(s"$root/src").schema
      EventStreams.triangleCountStream(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$root/src"),
        "u", "v", s"$root/store", s"$root/cp",
        maintainEvery = 0, workRebuildFraction = frac).awaitTermination()
    }
    val rootA = tmp("graft_tes_wr_on")
    val rootB = tmp("graft_tes_wr_off")
    run(rootA, 0.15)
    run(rootB, 0.0)
    def incRows(root: String, b: Int): Set[(Long, Long)] =
      spark.read.parquet(s"$root/store/inc_$b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (b <- 0 until 4)
      assert(incRows(rootA, b) === incRows(rootB, b),
        s"batch $b: fallback and enumerated increments must be identical")
    assert(toMap(EventStreams.readTriangleCounts(spark, s"$rootA/store"))
      === recount(allEdges))
    assert(toMap(EventStreams.readTriangleCounts(spark, s"$rootB/store"))
      === recount(allEdges))
  }

  test("crash replay: an unmarked inc dir is invisible to reads and safely overwritten") {
    // simulate the exact window the committed-only reader closes: a
    // dense batch crashed BETWEEN its inc parquet write and its
    // _GRAFT_DONE marker. The replay must (a) not read the unmarked
    // dir as prior state — the fallback's prev would double-subtract
    // it, or the overwrite would wedge on "cannot overwrite a path
    // that is also being read from" — and (b) land the exact counts.
    val root = tmp("graft_tes_crash")
    val (first, rest) = allEdges.splitAt(allEdges.size / 2)
    def run(): Unit = {
      val schema = spark.read.parquet(s"$root/src").schema
      EventStreams.triangleCountStream(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$root/src"),
        "u", "v", s"$root/store", s"$root/cp",
        maintainEvery = 0).awaitTermination()
    }
    first.toDF("u", "v").coalesce(1).write.parquet(s"$root/src")
    run() // batch 0 commits
    // the crashed batch-1 attempt: garbage counts, no marker
    Seq((999L, 7L), (998L, 3L)).toDF("node", "n_tri")
      .coalesce(1).write.parquet(s"$root/store/inc_1")
    assert(!new java.io.File(s"$root/store/inc_1/_GRAFT_DONE").exists())
    // committed-only reads must not see the crashed attempt
    val committed = toMap(EventStreams.readTriangleCounts(spark, s"$root/store"))
    assert(committed === recount(first))
    assert(!committed.contains(999L))
    // the replay: batch 1 is a ~50% delta -> dense regime + the
    // work fallback (novel >= 0.15 x stored), whose prev must come
    // from committed state only
    rest.toDF("u", "v").coalesce(1).write.mode("append").parquet(s"$root/src")
    run()
    assert(new java.io.File(s"$root/store/inc_1/_GRAFT_DONE").exists(),
      "the replay must commit the rewritten increment")
    assert(toMap(EventStreams.readTriangleCounts(spark, s"$root/store"))
      === recount(allEdges),
      "counts after the crash replay must equal the one-shot recount")
  }

  test("a pre-(eb,o) layout sidecar fail-fasts before any read or append") {
    val p = tmp("graft_tes_legacy") + "/edges"
    Triangles.writeEdgeStore(baseEdges.toDF("u", "v"), "u", "v", p, nBuckets = 4)
    // a pre-r14 store's sidecar is the bare bucket count — no family,
    // no layout tag (written through the meta API so the local FS
    // checksum follows the rewrite)
    graft.etl.StoreMeta.write(spark, p, 4)
    val e1 = intercept[IllegalArgumentException] {
      Triangles.readAdjForDelta(spark, p, Seq((1L, 2L)).toDF("u", "v"))
    }
    assert(e1.getMessage.contains("layout"))
    val e2 = intercept[IllegalArgumentException] {
      Triangles.appendEdgeStore(Seq((300L, 301L)).toDF("u", "v"), p)
    }
    assert(e2.getMessage.contains("layout"))
    // rebuilding through the writer heals: new pin, reads work again
    Triangles.writeEdgeStore(baseEdges.toDF("u", "v"), "u", "v", p, nBuckets = 4)
    assert(Triangles.readAdjForDelta(spark, p, Seq((1L, 2L)).toDF("u", "v"))
      .count() >= 0L)
  }

  test("compactEdgeStore republishes a root-level parked dir from a pre-(eb,o) crash") {
    val p = tmp("graft_tes_rootheal") + "/edges"
    Triangles.writeEdgeStore(baseEdges.toDF("u", "v"), "u", "v", p, nBuckets = 4)
    val before = toMap(Triangles.readAdjForDelta(spark, p,
        baseEdges.toDF("u", "v"))
      .groupBy($"a").agg(count(lit(1)).as("n")))
    // simulate the pre-r14 compaction crash: one bucket parked at root
    // with no live sibling (crash between park and publish, tmp gone)
    val eb = new java.io.File(p).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("eb=")).head
    assert(eb.renameTo(new java.io.File(p, eb.getName + "__compact_old")))
    Triangles.compactEdgeStore(spark, p)
    assert(new java.io.File(p, eb.getName).exists(),
      "the parked bucket must republish under its live name")
    val after = toMap(Triangles.readAdjForDelta(spark, p,
        baseEdges.toDF("u", "v"))
      .groupBy($"a").agg(count(lit(1)).as("n")))
    assert(after === before, "no adjacency row may vanish across the heal")
  }

  test("compaction folds increments losslessly and the stream continues across it") {
    val root = tmp("graft_tes_compact")
    val (first, rest) = allEdges.splitAt(allEdges.size * 3 / 4)
    def run(): Unit = {
      val schema = spark.read.parquet(s"$root/src").schema
      EventStreams.triangleCountStream(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$root/src"),
        "u", "v", s"$root/store", s"$root/cp").awaitTermination()
    }
    first.toDF("u", "v").repartition(3).write.parquet(s"$root/src")
    run() // batches 0..2
    val preCompact = toMap(EventStreams.readTriangleCounts(spark, s"$root/store"))
    val folded = EventStreams.compactTriangleIncrements(spark, s"$root/store")
    assert(folded.contains(2L))
    assert(toMap(EventStreams.readTriangleCounts(spark, s"$root/store"))
      === preCompact, "compaction must not change any count")
    // folded inc dirs are gone; exactly one committed base remains
    val dirs = new java.io.File(s"$root/store").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(!dirs.exists(_.startsWith("inc_")), s"folded incs must be swept: $dirs")
    assert(dirs.count(_.startsWith("base_")) === 1)
    // a second compaction with nothing new is a no-op
    assert(EventStreams.compactTriangleIncrements(spark, s"$root/store")
      .contains(2L))
    // the stream continues PAST the compacted base (batch 3's gap
    // guard accepts base_2 in place of inc_2)
    rest.toDF("u", "v").coalesce(1).write.mode("append").parquet(s"$root/src")
    run()
    assert(toMap(EventStreams.readTriangleCounts(spark, s"$root/store"))
      === recount(allEdges),
      "base + post-compaction increments must equal the one-shot recount")
  }
}
