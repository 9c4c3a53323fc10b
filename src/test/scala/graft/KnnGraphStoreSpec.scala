package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.analytics.VectorQueries.IvfSeedIds

/** knn1b — the persisted k-NN graph store: append must (a) never
  * touch stored files, (b) sign ONLY the delta (the stored members
  * arrive pre-assigned from parquet — the plan carries exactly one
  * quantizer expression, on the probe side), and (c) leave the edge
  * table equal to its two-generation rebuild: base anchors against
  * the base corpus, delta anchors against the corpus-so-far. */
class KnnGraphStoreSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.embeddings(spark, sfDir)
  private def base = corpus.filter(col("vec_id") % 10 =!= 3)
  private def delta = corpus.filter(col("vec_id") % 10 === 3)

  private lazy val store: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_knnstore_spec").toString
    Similarity.writeKnnGraphStore(base, p, IvfSeedIds, k = 5, nProbe = 3)
    p
  }

  private def listParts(p: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
    try s.iterator().asScala
      .filter(f => java.nio.file.Files.isRegularFile(f) &&
        f.getFileName.toString.endsWith(".parquet"))
      .map(f => f.toString -> java.nio.file.Files.getLastModifiedTime(f).toMillis)
      .toMap
    finally s.close()
  }

  test("append adds files without touching stored members or edges") {
    val before = listParts(s"$store/members") ++ listParts(s"$store/edges")
    Similarity.appendKnnGraph(delta, store, k = 5, nProbe = 3)
    val after = listParts(s"$store/members") ++ listParts(s"$store/edges")
    assert(before.keySet.subsetOf(after.keySet), "append must not delete")
    assert(before.forall { case (f, t) => after(f) == t },
      "append must not rewrite stored files")
    assert(after.size > before.size, "the delta must add files")
  }

  test("appended store equals the two-generation rebuild") {
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("nbr_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val got = norm(spark.read.parquet(s"$store/edges"))
    val baseEdges = norm(
      Similarity.knnGraphIvfSeeded(base, IvfSeedIds, k = 5, nProbe = 3))
    // delta anchors see the full corpus: the append ran after the
    // delta's member rows landed, exactly like a rebuild would
    val deltaEdges = norm(
      Similarity.knnGraphIvfSeeded(corpus, IvfSeedIds, k = 5, nProbe = 3)
        .filter(col("vec_id") % 10 === 3))
    assert(got === (baseEdges ++ deltaEdges))
    // every delta anchor acquired neighbors (its own list is probed
    // and holds at least the base members near it)
    val deltaIds = delta.select($"vec_id").as[Long].collect().toSet
    assert(deltaIds.subsetOf(got.map(_._1)))
  }

  private def edgeSet(p: String) =
    spark.read.parquet(s"$p/edges")
      .select(col("vec_id"), col("nbr_id"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))

  test("append is idempotent — a replayed batch changes nothing") {
    val p = java.nio.file.Files.createTempDirectory("graft_knnidem_spec").toString
    Similarity.writeKnnGraphStore(base, p, IvfSeedIds, k = 5, nProbe = 3)
    Similarity.appendKnnGraph(delta, p, k = 5, nProbe = 3)
    val members1 = spark.read.parquet(s"$p/members").count()
    val edges1 = edgeSet(p).sorted.toSeq
    Similarity.appendKnnGraph(delta, p, k = 5, nProbe = 3) // replay
    assert(spark.read.parquet(s"$p/members").count() === members1,
      "replay must not duplicate member rows")
    assert(edgeSet(p).sorted.toSeq === edges1,
      "replay must not duplicate or alter edge rows")
  }

  test("retry heals a crash between the member append and the edge write") {
    val p = java.nio.file.Files.createTempDirectory("graft_knncrash_spec").toString
    Similarity.writeKnnGraphStore(base, p, IvfSeedIds, k = 5, nProbe = 3)
    // simulate the crash: the delta's member rows landed, its edges did not
    val d0 = delta.select(col("vec_id").as("cand_id"),
      col("embedding").cast("array<double>").as("__cv"))
    val cents = Similarity.collectCents(spark.read.parquet(s"$p/seeds"))
    Similarity.assignWithLists(d0, cents).repartition(col("list_id"))
      .write.mode("append").partitionBy("list_id").parquet(s"$p/members")
    Similarity.appendKnnGraph(delta, p, k = 5, nProbe = 3) // the retry
    // healed store equals the crash-free build+append bit-for-bit
    assert(spark.read.parquet(s"$p/members").count() ===
      spark.read.parquet(s"$store/members").count())
    assert(edgeSet(p).sorted.toSeq === edgeSet(store).sorted.toSeq)
  }

  test("staleness metric flags appended back-edge debt; rebuild clears it") {
    // exact-duplicate append GUARANTEES staleness: the twin assigns to
    // its original's list (identical vector, same nearest centroid),
    // the original probes its own list first, and cosine 1.0 must
    // enter its top-5 — so at least the duplicated anchors go stale
    val p = java.nio.file.Files.createTempDirectory("graft_knnstale_spec").toString
    Similarity.writeKnnGraphStore(base, p, IvfSeedIds, k = 5, nProbe = 3)
    val twins = base.filter(col("vec_id") % 17 === 0)
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
    Similarity.appendKnnGraph(twins, p, k = 5, nProbe = 3)
    val stale = Similarity.knnGraphStaleness(spark, p, k = 5, nProbe = 3)
      .collect().head
    assert(stale.getAs[Long]("n_stale") > 0L, "duplicated anchors must be stale")
    assert(stale.getAs[Double]("stale_frac") > 0.0 &&
      stale.getAs[Double]("stale_frac") <= 1.0)
    val membersBefore = listParts(s"$p/members")
    Similarity.rebuildKnnEdges(spark, p, k = 5, nProbe = 3)
    assert(listParts(s"$p/members") === membersBefore,
      "rebuild must not touch member files")
    val after = Similarity.knnGraphStaleness(spark, p, k = 5, nProbe = 3)
      .collect().head
    assert(after.getAs[Long]("n_stale") === 0L,
      "a refreshed store has zero staleness by definition")
    assert(after.getAs[Double]("stale_frac") === 0.0)
  }

  test("sampled staleness probes only the sampled anchors") {
    // reuse the shared store (already appended in the first test)
    val full = Similarity.knnGraphStaleness(spark, store, k = 5, nProbe = 3)
      .collect().head
    val sampled = Similarity.knnGraphStaleness(spark, store, k = 5,
      nProbe = 3, sampleFrac = 0.3).collect().head
    assert(sampled.getAs[Long]("n_anchors") < full.getAs[Long]("n_anchors"),
      "the sample must cover fewer anchors than the full metric")
    assert(sampled.getAs[Long]("n_stale") <= sampled.getAs[Long]("n_anchors"))
  }

  test("delta append signs only the delta — members come pre-assigned") {
    val de = Similarity.deltaKnnEdges(delta, store, k = 5, nProbe = 3,
      idCol = "vec_id", vecCol = "embedding")
    val quantizerExprs = de.queryExecution.analyzed.collect { case n =>
      n.expressions.flatMap(_.collect {
        case x: graft.functions.NearestCentroid => x
        case y: graft.functions.NearestCentroidsTopN => y
      })
    }.flatten
    assert(quantizerExprs.count(
      _.isInstanceOf[graft.functions.NearestCentroidsTopN]) == 1,
      "exactly one probe-side quantizer (the delta's nearestN)")
    assert(!quantizerExprs.exists(
      _.isInstanceOf[graft.functions.NearestCentroid]),
      "stored members must never be re-signed on append")
  }

  test("compaction folds member lists and edges to one file each; everything reads unchanged") {
    import graft.etl.BucketCompaction
    val p = java.nio.file.Files.createTempDirectory("graft_knn_cmp").toString
    // three generations so list dirs really accumulate file-sets
    Similarity.writeKnnGraphStore(
      base.filter(col("vec_id") % 3 =!= 0), p, IvfSeedIds, k = 5, nProbe = 3)
    Similarity.appendKnnGraph(base.filter(col("vec_id") % 3 === 0), p,
      k = 5, nProbe = 3)
    Similarity.appendKnnGraph(delta, p, k = 5, nProbe = 3)
    def rows(d: String) =
      spark.read.parquet(d).collect().map(_.toString).sorted.toSeq
    val membersBefore = rows(s"$p/members")
    val edgesBefore = rows(s"$p/edges")
    val listDirs = new java.io.File(s"$p/members").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("list_id="))
    assert(listDirs.exists(d =>
        BucketCompaction.dataFileCount(spark, d.toString) > 1),
      "fixture must accumulate multi-file list dirs before compacting")
    val rewritten = Similarity.compactKnnGraphStore(spark, p)
    assert(rewritten.nonEmpty)
    assert(rewritten.forall(d => d.startsWith("members/list_id=") || d == "edges"))
    listDirs.foreach { d =>
      assert(BucketCompaction.dataFileCount(spark, d.toString) == 1,
        s"list dir ${d.getName} not folded")
    }
    assert(BucketCompaction.dataFileCount(spark, s"$p/edges") == 1)
    assert(rows(s"$p/members") == membersBefore)
    assert(rows(s"$p/edges") == edgesBefore)
    // staleness and rebuild behave identically over the compacted store
    assert(Similarity.knnGraphStaleness(spark, p, k = 5, nProbe = 3)
      .collect().head.getLong(1) >= 0L)
    Similarity.rebuildKnnEdges(spark, p, k = 5, nProbe = 3)
    // idempotent: nothing left above the bound
    assert(Similarity.compactKnnGraphStore(spark, p)
      .forall(_ == "edges"), "only the rebuilt edge dir may need a refold")
  }

  test("pinned graph parameters: mismatched k/nProbe and a clobbered quantizer fail fast") {
    val p = java.nio.file.Files.createTempDirectory("graft_knn_pin").toString
    Similarity.writeKnnGraphStore(base, p, IvfSeedIds, k = 5, nProbe = 3)
    val e1 = intercept[IllegalArgumentException] {
      Similarity.appendKnnGraph(delta, p, k = 7, nProbe = 3)
    }
    assert(e1.getMessage.contains("pinned to k=5"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.rebuildKnnEdges(spark, p, k = 5, nProbe = 2)
    }
    assert(e2.getMessage.contains("nProbe=3"))
    // clobbered quantizer: drop one seed row's file set and the pinned
    // list count no longer matches the collected one
    val seeds = spark.read.parquet(s"$p/seeds").collect()
    spark.createDataFrame(
        spark.sparkContext.parallelize(seeds.drop(1).toSeq),
        spark.read.parquet(s"$p/seeds").schema)
      .write.mode("overwrite").parquet(s"$p/seeds")
    val e3 = intercept[IllegalArgumentException] {
      Similarity.appendKnnGraph(delta, p, k = 5, nProbe = 3)
    }
    assert(e3.getMessage.contains("quantizer"))
  }

  test("a pre-pin store (data, no sidecar) fail-fasts with the migration recipe") {
    val p = java.nio.file.Files.createTempDirectory("graft_knn_prepin").toString
    Similarity.writeKnnGraphStore(base, p, IvfSeedIds, k = 5, nProbe = 3)
    val meta = new org.apache.hadoop.fs.Path(s"$p/_graft_meta")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(meta, false))
    val e = intercept[IllegalArgumentException] {
      Similarity.appendKnnGraph(delta, p, k = 5, nProbe = 3)
    }
    assert(e.getMessage.contains("no _graft_meta sidecar"))
  }
}
