package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Tables.embeddings(spark, sfDir)
  private lazy val queries = corpus.filter($"vec_id" < 10)
    .select($"vec_id".as("query_id"), $"embedding")

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }

  test("brute force: k results per query, ranked by descending cosine") {
    val bf = Similarity.bruteForceTopK(corpus, queries, 10)
    val counts = bf.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(counts.size == 10 && counts.values.forall(_ == 10))
    val ranks = bf.filter($"query_id" === 0).orderBy($"rank")
      .select("cosine").as[Double].collect()
    assert(ranks.sameElements(ranks.sorted(Ordering[Double].reverse)))
  }

  test("sign-LSH ANN: multi-probe recall vs brute force is reasonable") {
    val lsh = new Similarity.SignRandomProjectionLsh(dim = 64, nBits = 8)
    val ann = lsh.annTopK(corpus, queries, 10)
    val bf = Similarity.bruteForceTopK(corpus, queries, 10)
    val annS = topSets(ann); val bfS = topSets(bf)
    val recall = bfS.map { case (q, s) =>
      annS.getOrElse(q, Set.empty).intersect(s).size.toDouble / s.size
    }.sum / bfS.size
    // Random gaussian embeddings are sign-LSH's adversarial case: true
    // neighbors sit at cosine ~0.5 where hyperplane agreement is weak,
    // so recall at 9 probes of 256 buckets lands ~0.1-0.2 (vs ~3.5%
    // candidate fraction — still a 4-6x lift over random). Real
    // near-dup corpora (cosine ≥ 0.9) bucket together with high
    // probability; the IVF path covers moderate-similarity workloads.
    assert(recall > 0.05, s"recall $recall")
    assert(ann.filter($"rank" > 10).count() == 0)
  }

  test("sign-LSH: deterministic across runs") {
    val lsh = new Similarity.SignRandomProjectionLsh(64, 8)
    val a = lsh.annTopK(corpus, queries, 5).collect().map(_.toString).sorted
    val b = new Similarity.SignRandomProjectionLsh(64, 8)
      .annTopK(corpus, queries, 5).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("persisted LSH index: partition pruning reads only probed buckets, same results") {
    import graft.ops.Similarity.SignRandomProjectionLsh
    val corpus = Tables.embeddings(spark, sfDir)
    val queries = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val lsh = new SignRandomProjectionLsh(dim = 64, nBits = 8)
    val idx = java.nio.file.Files.createTempDirectory("annidx_spec").toString
    lsh.writeIndex(corpus, idx)
    // AQE off so the executed plan exposes FileSourceScanExec directly
    // (AdaptiveSparkPlanExec is a leaf to TreeNode.collect)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val fromIndex = lsh.annTopKFromIndex(spark, idx, queries, 5)
      // 1. the scan must prune on the partition column, not post-filter
      val p = fromIndex.queryExecution.executedPlan.toString
      assert(p.contains("PartitionFilters: ["), p.take(2000))
      assert(p.contains("__sig"), p.take(2000))
      // 2. the index is a physical layout only — results equal the
      // in-memory path bit for bit
      val mem = lsh.annTopK(corpus, queries, 5).collect().map(_.toSeq).toSet
      val got = fromIndex.collect().map(_.toSeq).toSet
      assert(got == mem)
      // 3. and the scan actually skipped directories: files-read metric
      // (populated by the collect above) < files in the index
      val scans = fromIndex.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      val idxScan = scans.find(
        _.relation.location.rootPaths.exists(_.toString.contains(idx))).get
      val readFiles = idxScan.metrics("numFiles").value
      val allFiles = spark.read.parquet(idx).inputFiles.length
      assert(readFiles < allFiles,
        s"pruning must skip unprobed buckets: read $readFiles of $allFiles")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("IVF ANN: probing more lists improves or maintains recall") {
    val bf = topSets(Similarity.bruteForceTopK(corpus, queries, 10))
    def recallAt(nProbe: Int): Double = {
      val ivf = topSets(Similarity.ivfTopK(corpus, queries, 10,
        nLists = 8, nProbe = nProbe))
      bf.map { case (q, s) =>
        ivf.getOrElse(q, Set.empty).intersect(s).size.toDouble / s.size
      }.sum / bf.size
    }
    val r1 = recallAt(1); val r4 = recallAt(4); val r8 = recallAt(8)
    assert(r8 >= r4 - 1e-9 && r4 >= r1 - 1e-9, s"$r1 / $r4 / $r8")
    assert(math.abs(r8 - 1.0) < 1e-9, s"full probe must equal brute force, got $r8")
  }

  test("seeded IVF with full probe equals brute force") {
    val corpus = Tables.embeddings(spark, sfDir)
    val queries = corpus.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding")
    val seeds = Seq(10L, 20L, 30L, 40L)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"cand_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    val full = Similarity.ivfTopKSeeded(corpus, queries, 5, seeds,
      nProbe = seeds.size)
    val bf = Similarity.bruteForceTopK(corpus, queries, 5)
    assert(key(full) == key(bf) && key(bf).nonEmpty)
  }

  test("trained IVF with full probe equals brute force; partial probe is a subset") {
    val corpus = Tables.embeddings(spark, sfDir)
    val queries = corpus.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"cand_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    val k = 4
    val full = Similarity.ivfTopKTrained(corpus, queries, 5,
      kClusters = k, rounds = 2, nProbe = k)
    val bf = Similarity.bruteForceTopK(corpus, queries, 5)
    assert(key(full) == key(bf) && key(bf).nonEmpty)
    // a 1-list probe still returns ranked results (from fewer candidates)
    val part = Similarity.ivfTopKTrained(corpus, queries, 5,
        kClusters = k, rounds = 2, nProbe = 1)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect().toSet
    assert(part.nonEmpty)
  }

  test("semantic dedup: centroid-closest member of each near-dup pocket survives") {
    // two clusters along axes e1 and e2; a near-identical pocket around
    // e1 plus one distinct member; ids 100/200 are the seeds
    def v(xs: Double*) = xs.toArray.map(_.toFloat)
    val data = Seq(
      (100L, v(1, 0, 0, 0)),        // seed A (centroid of cluster A)
      (1L,   v(0.99, 0.14, 0, 0)),  // pocket: near seed A
      (2L,   v(0.98, 0.19, 0, 0)),  // pocket: slightly farther
      (3L,   v(0.2, 0.97, 0, 0)),   // lands in cluster A, below τ vs the pocket
      (200L, v(0, 0, 1, 0)),        // seed B
      (4L,   v(0, 0, 0.97, 0.24))   // near seed B, no same-cluster rival
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(data, Seq(100L, 200L), tau = 0.98)
      .select($"vec_id").as[Long].collect().toSet
    // 100 beats 1 (cos(100,1)≈0.99 ≥ τ, seed is centroid-closest);
    // 1 beats 2 the same way; 3's cos to the pocket is < τ so it stays
    assert(out.contains(100L) && !out.contains(1L) && !out.contains(2L))
    assert(out.contains(3L) && out.contains(200L) && out.contains(4L))
  }

  test("near-dup regime recall floor: planted near-identical queries retrieve " +
      "their source at rank 1 (>= 0.9) at default knobs") {
    // the regime the ANN paths serve in a dedup pipeline: the query IS
    // a near-duplicate (cosine ~1) of some corpus vector. The measured
    // random-gaussian recall@10 lives in PERFORMANCE.md; this spec
    // floors the operative near-dup contract at the default knobs.
    val probes = corpus.filter($"vec_id" < 20)
      .select(($"vec_id" + 1000000L).as("query_id"),
        transform($"embedding", (x, i) =>
          when(i === 0, x + lit(0.001f)).otherwise(x)).as("embedding"))
    def rank1Hits(ann: org.apache.spark.sql.DataFrame): Double =
      ann.filter($"rank" === 1 && $"cand_id" === $"query_id" - 1000000L)
        .count().toDouble / 20.0
    val lsh = new Similarity.SignRandomProjectionLsh(dim = 64, nBits = 8)
    assert(rank1Hits(lsh.annTopK(corpus, probes, 10, probeRadius = 1)) >= 0.9)
    assert(rank1Hits(Similarity.ivfTopK(corpus, probes, 10,
      nLists = 8, nProbe = 4)) >= 0.9)
  }

  test("sign-LSH multi-probe: widening the probe radius only adds candidates") {
    val lsh = new Similarity.SignRandomProjectionLsh(dim = 64, nBits = 8)
    val r0 = topSets(lsh.annTopK(corpus, queries, 10, probeRadius = 0))
    val r2 = topSets(lsh.annTopK(corpus, queries, 10, probeRadius = 2))
    val bf = topSets(Similarity.bruteForceTopK(corpus, queries, 10))
    def recall(a: Map[Long, Set[Long]]) = bf.map { case (q, s) =>
      a.getOrElse(q, Set.empty).intersect(s).size.toDouble / s.size }.sum / bf.size
    assert(recall(r2) >= recall(r0), "radius 2 must not lose recall vs radius 0")
  }

  test("incremental semdedup: store neighbors drop deltas unconditionally, " +
      "delta-delta uses the batch rule; store-only scan") {
    def v(xs: Double*) = xs.toArray.map(_.toFloat)
    // corpus: 16 spread vectors so ceil(sqrt(16)) = 4 → seeds at ids 0,4,8,12
    val corpus = (0L until 16L).map { i =>
      val base = Array.fill(4)(0.0)
      base(i.toInt % 4) = 1.0
      base((i.toInt + 1) % 4) = 0.1 * (i / 4)
      (i, base.map(_.toFloat))
    }.toDF("vec_id", "embedding")
    val store = java.nio.file.Files.createTempDirectory("sd_store").toString
    Similarity.writeSemanticDedupStore(corpus, store)
    val delta = Seq(
      (101L, v(1, 0.01, 0, 0)),   // ~duplicate of corpus id 0 → dropped (prior art)
      (102L, v(0.1, 0.1, 0.99, 0.05)), // novel direction → survives
      (103L, v(0.1, 0.1, 0.985, 0.08)), // near-dup OF 102 → batch rule decides
      (104L, v(-1, -1, -1, -1))   // far from everything → survives
    ).toDF("vec_id", "embedding")
    val out = Similarity.incrementalSemanticDedup(delta, store, tau = 0.95)
    val kept = out.select($"vec_id").as[Long].collect().toSet
    assert(!kept.contains(101L), "store near-dup must be dropped")
    assert(kept.contains(104L), "isolated delta vector must survive")
    // exactly one of the 102/103 pocket survives (centroid-closer wins)
    assert(Seq(102L, 103L).count(kept) == 1, s"kept=$kept")
    // delta ids only — corpus members are never re-judged or re-emitted
    assert(kept.forall(_ >= 101L))
    // the probe plan reads the persisted store, never the corpus frame
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains(store), s"expected a store scan:\n${p.take(1500)}")
    assert(!p.contains("embeddings.parquet"),
      "incremental plan must not re-scan the corpus embeddings")
  }

  test("assignment-store modulus pin: foreign cb honored end-to-end; mismatch/pre-pin fail fast") {
    def v(xs: Double*) = xs.toArray.map(_.toFloat)
    val corpus = (0L until 16L).map { i =>
      val base = Array.fill(4)(0.0)
      base(i.toInt % 4) = 1.0
      base((i.toInt + 1) % 4) = 0.1 * (i / 4)
      (i, base.map(_.toFloat))
    }.toDF("vec_id", "embedding")
    // a FOREIGN modulus (16, not the 64 default) frozen at write
    val store = java.nio.file.Files.createTempDirectory("sd_pin").toString
    Similarity.writeSemanticDedupStore(corpus, store, assignBuckets = 16)
    val m = graft.etl.StoreMeta.readParams(spark, s"$store/assignments")
    assert(m.exists(_.get("cb").contains("16")))
    // the layout really is mod-16: no __cb dir at or above 16
    val cbDirs = new java.io.File(s"$store/assignments").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("__cb="))
      .map(_.getName.stripPrefix("__cb=").toInt)
    assert(cbDirs.nonEmpty && cbDirs.forall(_ < 16))
    // probe + survivor append resolve the pinned modulus and match the
    // default-modulus store's results exactly (cb is layout, not math)
    val delta = Seq(
      (101L, v(1, 0.01, 0, 0)),
      (102L, v(0.1, 0.1, 0.99, 0.05)),
      (104L, v(-1, -1, -1, -1))
    ).toDF("vec_id", "embedding")
    val store64 = java.nio.file.Files.createTempDirectory("sd_pin64").toString
    Similarity.writeSemanticDedupStore(corpus, store64)
    def result(st: String) = Similarity.incrementalSemanticDedup(delta, st, tau = 0.95)
      .select($"vec_id", $"cluster_id", round($"centroid_sim", 9))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(result(store) === result(store64))
    Similarity.appendSemanticAssignments(delta, store)
    // appended rows landed inside the mod-16 layout, not a 64-bucket one
    val cbAfter = new java.io.File(s"$store/assignments").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("__cb="))
      .map(_.getName.stripPrefix("__cb=").toInt)
    assert(cbAfter.forall(_ < 16))
    // a disagreeing explicit expectation fail-fasts
    val e1 = intercept[IllegalArgumentException] {
      Similarity.appendSemanticAssignments(delta, store, expectBuckets = 64)
    }
    assert(e1.getMessage.contains("cb=16"))
    // pre-pin (data, no sidecar) fail-fasts on both probe and append —
    // the partition dirs are underscore-prefixed (__cb=), so hasData
    // must still see them as data
    assert(new java.io.File(s"$store/assignments", "_graft_meta").delete())
    val e2 = intercept[IllegalArgumentException] {
      Similarity.incrementalSemanticDedup(delta, store, tau = 0.95)
    }
    assert(e2.getMessage.contains("_graft_meta"))
    val e3 = intercept[IllegalArgumentException] {
      Similarity.appendSemanticAssignments(delta, store)
    }
    assert(e3.getMessage.contains("_graft_meta"))
  }
}
