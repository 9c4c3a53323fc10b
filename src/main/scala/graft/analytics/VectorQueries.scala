package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{VecWeightedMean, VectorFunctions => VF}
import graft.functions.Rounding.exactRound

/** Vector/embedding exemplars (SURVEY.md A1, U4, U5/F9, W5) over the
  * synthetic embeddings table. */
object VectorQueries {

  /** The hard-negative PLANTED FIXTURE shared by v3 and v3b: each base
    * vector gets a NEAR-DUPLICATE twin (+1000000, dim-1 delta 0.001 →
    * cosine ≈ 0.9999995, above the 0.99 constraint — must be excluded)
    * and a HARD NEGATIVE plant (+2000000, dim-1 delta 0.33 → cosine ∈
    * [0.944, 0.965] on the unit-norm corpus — below the constraint but
    * far above the ~0.35 background, so it IS each anchor's argmax).
    * Hard negatives being genuinely near their anchors is what makes
    * the ANN shortlist face (v3b) equivalent to the bounded scan: the
    * argmax lives in the anchor's own probe neighborhood by
    * construction, exactly the geometry of a real embedding corpus
    * (random-direction "negatives" at cosine 0.35 are easy, not hard,
    * and no sublinear index can argmax uniform noise). */
  private[graft] def hardNegFixture(spark: SparkSession, dir: String,
                                        vecName: String): DataFrame = {
    val base = Tables.embeddings(spark, dir).filter(col("vec_id") < 2000)
      .select(col("vec_id"), col("embedding").cast("array<double>").as(vecName))
    def shifted(offset: Long, delta: Double) =
      base.select((col("vec_id") + offset).as("vec_id"),
        concat(array(element_at(col(vecName), 1) + lit(delta)),
          slice(col(vecName), 2, 100000)).as(vecName))
    base.unionByName(shifted(1000000L, 0.001))
      .unionByName(shifted(2000000L, 0.33))
  }

  /** v3 — hard-negative mining for contrastive training: for each
    * anchor in the planted fixture, the MOST similar neighbor that
    * is NOT a near-duplicate (cosine < 0.99 excludes the planted copy
    * and self) — the "hard but not false" negative an embedding
    * trainer wants. Candidate scan is the bounded d5-style quadratic
    * (vec_id < 2000 cap; the scale path is [[hardNegativesAnn]]'s ANN
    * shortlist feeding the same constraint filter); the per-anchor
    * argmax rides the custom TopKPerGroup operator with (cosine desc,
    * id) ties. */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val e = hardNegFixture(spark, dir, "v").withColumn("__n", VF.norm(col("v")))
    val a = e.select(col("vec_id"), col("v").as("va"), col("__n").as("na"))
    val b = e.select(col("vec_id").as("neg_id"), col("v").as("vb"),
      col("__n").as("nb"))
    // r16 note (measured, REJECTED): mirroring each unordered pair via
    // explode — halving the 64-dim dots — benched 5.0-6.3 s against
    // this shape's 3.6 s at sf0.1: the Generate's per-row struct-array
    // materialization cost more than the saved dots, and a cosine
    // filter placed before the explode gets pushed into the BNLJ
    // condition where the dot re-evaluates per enumerated pair. The
    // straight formulation stays.
    val pairs = a.crossJoin(b).filter(col("vec_id") =!= col("neg_id"))
      .withColumn("cosine",
        VF.dot(col("va"), col("vb")) / nullif(col("na") * col("nb"), lit(0.0)))
      .filter(col("cosine") < 0.99)
      .select(col("vec_id"), col("neg_id"), col("cosine"))
    graft.ops.TopK.perGroup(pairs, Seq("vec_id"),
        Seq(("cosine", true), ("neg_id", false)), k = 1, rankName = "rn")
      .select(col("vec_id"), col("neg_id"),
        exactRound(col("cosine"), 6).as("cosine"))
      .orderBy(col("vec_id"))
  }

  /** v3b — hard-negative mining at CORPUS scale (the production face
    * of [[hardNegatives]]'s bounded scan): the same planted fixture,
    * but candidates come from the s2-style seeded-IVF SHORTLIST
    * (ops.Similarity.hardNegativesIvfSeeded) instead of an all-pairs
    * scan, and the per-anchor argmax rides the custom TopKPerGroup
    * operator. The oracle replays the whole shortlist path — seed
    * assignment, nProbe probing, constraint filter, argmax — so the
    * gate covers the approximate algorithm exactly, and
    * HardNegativesSpec proves shortlist ≡ bounded scan on the planted
    * fixture (a hard negative is near its anchor, which is the vector
    * IVF probing finds; nProbe=5 of the 8 lists covers every planted
    * cluster that straddles a Voronoi boundary — at production list
    * counts the probed FRACTION shrinks as lists grow ~sqrt(n) while
    * the margin-determined nProbe stays O(1)). */
  def hardNegativesAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = hardNegFixture(spark, dir, "embedding")
    graft.ops.Similarity.hardNegativesIvfSeeded(e, IvfSeedIds, nProbe = 5)
      .select(col("vec_id"), col("neg_id"),
        exactRound(col("cosine"), 6).as("cosine"))
      .orderBy(col("vec_id"))
  }

  /** v3c — hard-negative mining through the COMPRESSED index
    * (ops.Similarity.hardNegativesPqSeeded): same planted fixture and
    * shortlist geometry as v3b, but candidates are pre-ranked by
    * asymmetric distance over the m=8-byte PQ codes and only the
    * top-`rerank` survivors fetch raw vectors for the exact argmax —
    * the memory story when the raw corpus no longer fits a shortlist
    * pipeline's working set. rerank=50 is the measured exact-recall
    * knee: the seeded 8-codeword codebook's quantization error costs
    * the exact argmax for 1-7% of anchors at R=5-10 and none at R=50
    * on either spec/gate fixture (full recall curve in
    * PERFORMANCE.md). The oracle replays the complete path
    * (seeded assignment, probing, PQ encode, ADC rank, exact re-rank,
    * dup filter, argmax); HardNegativesSpec proves v3c ≡ the bounded
    * scan on the fixture. */
  def hardNegativesPq(spark: SparkSession, dir: String): DataFrame = {
    val e = hardNegFixture(spark, dir, "embedding")
    graft.ops.Similarity.hardNegativesPqSeeded(e, IvfSeedIds, PqSeedIds,
        nProbe = 5, rerank = 50)
      .select(col("vec_id"), col("neg_id"),
        exactRound(col("cosine"), 6).as("cosine"))
      .orderBy(col("vec_id"))
  }

  /** knn1 — the k-NN GRAPH build over the embeddings corpus via the
    * seeded-IVF shortlist (ops.Similarity.knnGraphIvfSeeded): top-5
    * approximate neighbors per vector, nProbe=3 of the 8 seeded lists.
    * The precursor artifact for graph-based semantic dedup and graph
    * clustering; same corpus-scale plan as v3b (map-only assignment,
    * one shuffle join by list_id, bounded-heap TopKPerGroup) with
    * k > 1. The oracle replays assignment, probing and ranking
    * exactly, so probing drift fails the hash. */
  def knnGraph(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Similarity.knnGraphIvfSeeded(
        Tables.embeddings(spark, dir), IvfSeedIds, k = 5, nProbe = 3)
      .select(col("vec_id"), col("nbr_id"),
        exactRound(col("cosine"), 6).as("cosine"), col("rank"))
      .orderBy(col("vec_id"), col("rank"))

  /** knn1b — the INCREMENTAL face of the k-NN graph
    * (ops.Similarity.writeKnnGraphStore / appendKnnGraph): the store
    * is built from 90% of the corpus (edges + list-partitioned
    * members + frozen seeds), the 10% delta appended — only the delta
    * signed, stored files never rewritten, delta anchors acquiring
    * neighbors from their probed lists over the corpus-so-far. The
    * oracle replays BOTH generations: base edges against the base
    * corpus, delta edges against the full corpus — so a store that
    * re-signed, leaked or dropped rows fails the hash. */
  def knnGraphIncremental(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val p = knnStoreCache.getOrElseUpdate(dir, {
      val tmp = java.nio.file.Files.createTempDirectory("graft_knn_store").toString
      graft.ops.Similarity.writeKnnGraphStore(
        e.filter(col("vec_id") % 10 =!= 3), tmp, IvfSeedIds, k = 5, nProbe = 3)
      graft.ops.Similarity.appendKnnGraph(
        e.filter(col("vec_id") % 10 === 3), tmp, k = 5, nProbe = 3)
      // the owner's maintenance slot (r14): fold the two generations'
      // file-sets — the oracle then gates over a COMPACTED store, so
      // the fold's row preservation is driver-verified every round
      // (the r1c pattern applied to the knn store)
      graft.ops.Similarity.compactKnnGraphStore(spark, tmp)
      tmp
    })
    spark.read.parquet(s"$p/edges")
      .select(col("vec_id"), col("nbr_id"),
        exactRound(col("cosine"), 6).as("cosine"), col("rank"))
      .orderBy(col("vec_id"), col("rank"))
  }

  private val knnStoreCache = StoreCaches.register("knn1b_graph_store")

  /** knn1c — BACK-EDGE REFRESH of the k-NN graph store
    * (ops.Similarity.rebuildKnnEdges): the maintenance face closing
    * the store's lifecycle. knn1b's append is one-directional (stored
    * anchors keep build-time neighbors — the trade every incremental
    * ANN graph makes), so after appends the back-edges are stale; the
    * rebuild recomputes EVERY anchor's edges from the stored members —
    * no re-signing, members and seeds untouched (KnnGraphStoreSpec) —
    * and swaps the edge dir atomically. A refreshed two-generation
    * store equals a from-scratch build over the full corpus
    * bit-for-bit, so knn1c gates on knn1's full-replay oracle
    * VERBATIM: assignment, probing and ranking over the whole corpus,
    * through a store that went build → append → refresh. */
  def knnGraphRefreshed(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val p = knnRefreshStoreCache.getOrElseUpdate(dir, {
      val tmp = java.nio.file.Files.createTempDirectory("graft_knn_refresh").toString
      graft.ops.Similarity.writeKnnGraphStore(
        e.filter(col("vec_id") % 10 =!= 3), tmp, IvfSeedIds, k = 5, nProbe = 3)
      graft.ops.Similarity.appendKnnGraph(
        e.filter(col("vec_id") % 10 === 3), tmp, k = 5, nProbe = 3)
      graft.ops.Similarity.rebuildKnnEdges(spark, tmp, k = 5, nProbe = 3)
      tmp
    })
    spark.read.parquet(s"$p/edges")
      .select(col("vec_id"), col("nbr_id"),
        exactRound(col("cosine"), 6).as("cosine"), col("rank"))
      .orderBy(col("vec_id"), col("rank"))
  }

  private val knnRefreshStoreCache =
    StoreCaches.register("knn1c_graph_refresh")

  /** knn2 — SEMANTIC CLUSTERING over the k-NN graph (the graph-based
    * dedup/cluster composition knn1's artifact exists for): keep the
    * strongest decile of neighbor edges — the cut is DATA-ADAPTIVE,
    * thr = max 4dp-cosine with |{edges ≥ thr}| ≥ ⌈0.1·|edges|⌉, read
    * off the cosine HISTOGRAM exactly like tc1's co-count cut (a
    * value-domain-bounded aggregate, ≤ 2·10^4 4dp bins, never an
    * edge-sized sort) — then union the surviving edges into
    * components (ops.Dedup.connectedComponents, min-label pointer
    * jumping) and roll up one row per cluster with the keep-min-id
    * survivor discipline. Vectors whose every edge falls below the
    * cut are their own singleton clusters (a dedup pipeline keeps
    * them all). The oracle replays the knn build, the 4dp threshold
    * (ORDER BY/LIMIT with ties — semantically identical to the
    * histogram read-off) and the components as a recursive CTE. */
  def knnClusters(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val edges = graft.ops.Similarity.knnGraphIvfSeeded(
        e, IvfSeedIds, k = 5, nProbe = 3)
      .select(col("vec_id"), col("nbr_id"),
        exactRound(col("cosine"), 4).as("h"))
      .localCheckpoint() // reused by the histogram pass and the filter
    val hist = edges.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("h").desc)
      .collect() // distinct 4dp cosine VALUES — bounded, not edge-sized
    val nEdges = hist.map(_.getLong(1)).sum
    val topK = math.ceil(0.1 * nEdges).toLong
    val thr = {
      var cum = 0L
      var t = Double.NegativeInfinity
      hist.foreach { r =>
        if (cum < topK) { t = r.getDouble(0); cum += r.getLong(1) }
      }
      t
    }
    val strong = edges.filter(col("h") >= thr)
    val comp = graft.ops.Dedup.connectedComponents(strong, "vec_id", "nbr_id")
    e.select(col("vec_id"))
      .join(comp.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("vec_id")))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"), min(col("vec_id")).as("keep_id"))
      .orderBy(col("cluster"))
  }

  /** A1 — weighted mean embedding per label, exploded to (label, dim,
    * value) rows so the oracle compare is scalar. Weight is a
    * deterministic function of vec_id (stands in for token_count).
    * Plan: ObjectHashAggregate with partial agg → one narrow shuffle. */
  def weightedMeanByLabel(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), col("embedding"),
        ((col("vec_id") % 7) + 1).cast("double").as("w"))
      .groupBy(col("label"))
      .agg(VecWeightedMean(col("embedding"), col("w")).as("vec"))
      .select(col("label"), posexplode(col("vec")))
      .select(col("label"), (col("pos") + 1).as("dim"),
        exactRound(col("col"), 5).as("wmean_val"))
      .orderBy(col("label"), col("dim"))

  /** ANN top-10 via sign-random-projection LSH. Fully oracle-checked
    * even though approximate: the seeded hyperplanes are inlined into
    * the generated DuckDB SQL as double literals (shortest-roundtrip
    * repr parses to identical bits), so the oracle reproduces the
    * exact buckets, probes, candidates and ranking. Exercises the
    * bucketed path at bench scale; recall bounds in SimilaritySpec. */
  def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.embeddings(spark, dir)
    val queries = corpus.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding"))
    new graft.ops.Similarity.SignRandomProjectionLsh(dim = 64, nBits = 10)
      .annTopK(corpus, queries, 10)
      .select(col("query_id"), col("cand_id"),
        exactRound(col("cosine"), 6).as("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Fixed seed ids for the s2 deterministic IVF quantizer (shared
    * with the generated oracle SQL). */
  val IvfSeedIds: Seq[Long] = Seq(100L, 150L, 200L, 250L, 300L, 350L, 400L, 450L)

  /** Fixed seed ids for the s3 PQ codebook — low ids so the same
    * codebook exists at every sf including the sf0.001 spec fixtures
    * (embeddings count 50 there). */
  val PqSeedIds: Seq[Long] = Seq(10L, 15L, 20L, 25L, 30L, 35L, 40L, 45L)

  /** s3 — product-quantization ADC top-10 (ops.Quantize.pqTopK): the
    * corpus compresses to 8 codes/vector against a SEEDED codebook, so
    * the oracle replays encode + asymmetric distance bit-for-bit (both
    * engines fold dims in ascending global order). Self-matches stay
    * in — rank 1's distance IS the vector's own quantization error,
    * which the operator exists to measure. */
  def pqAdcTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    graft.ops.Quantize.pqTopK(e, queries, PqSeedIds, k = 10)
      .select(col("query_id"), col("cand_id"),
        exactRound(col("adc_dist"), 6).as("adc_dist"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** s2b — TRAINED IVF ANN (ops.Similarity.ivfTopKTrained): the
    * coarse quantizer is km1's quantized-Lloyd centroids (k=8, two
    * rounds), so — unlike the ML-KMeans variant — the full train +
    * index build + probe replays exactly in SQL. Same probe shape and
    * output contract as s2. */
  def ivfTrainedTopK(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.embeddings(spark, dir)
    val queries = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    graft.ops.Similarity.ivfTopKTrained(corpus, queries, k = 5,
        kClusters = 8, rounds = 2, nProbe = 2)
      .select(col("query_id"), col("cand_id"),
        exactRound(col("cosine"), 6).as("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** s3b — PQ-ADC with TRAINED codebooks (ops.Quantize.pqTopKTrained):
    * per-subspace k-means (quantized-iterate recipe) trains the m=8
    * codebooks that s3 seeds from fixed vectors; encode + ADC then run
    * through the same native expressions. The oracle replays training,
    * encoding, and ADC — the complete PQ pipeline under the hash
    * gate. */
  def pqTrainedTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    graft.ops.Quantize.pqTopKTrained(e, queries, k = 10)
      .select(col("query_id"), col("cand_id"),
        exactRound(col("adc_dist"), 6).as("adc_dist"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** s2 — seeded IVF ANN (ops.Similarity.ivfTopKSeeded): inverted
    * lists seeded by fixed corpus vectors, so the full index build +
    * probe is replayed exactly by the SQL oracle — the oracle-checked
    * face of the IVF path (the KMeans variant stays spec-checked). */
  def ivfSeededTopK(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.embeddings(spark, dir)
    val queries = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    graft.ops.Similarity.ivfTopKSeeded(corpus, queries, k = 5,
      seedIds = IvfSeedIds, nProbe = 2)
      .select(col("query_id"), col("cand_id"),
        exactRound(col("cosine"), 6).as("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** s1b — ANN top-10 over a PERSISTED LSH index: the corpus is written
    * parquet-partitioned by its 8-bit signature (the durable analog of
    * the reference's pgvector index tables, schema.sql:47-63), then the
    * query probes push down as a partition-column IN filter so only the
    * probed bucket directories are read (PartitionFilters asserted in
    * SimilaritySpec). Same oracle shape as s1 — the seeded hyperplanes
    * are inlined into the generated SQL, so DuckDB reproduces the exact
    * buckets/probes/ranking with no index at all. */
  /** Index path per sf dir: the index is DURABLE by design — built
    * once, probed many times (that's its entire point vs s1) — so
    * repeated calls in one process (bench iterations, verify) reuse
    * it, and the measured time is the steady-state probe. */
  private val annIndexCache = scala.collection.concurrent.TrieMap[String, String]()

  /** s1b_build — the BUILD half of the persisted-ANN pair, split out so
    * the bench measures each side of the index's cost model honestly:
    * build pays the signature compute + partitioned write ONCE; the
    * probe (s1b_ann_persisted, below) is the steady state the index
    * exists for and must be ≪ build. Builds to a FRESH directory every
    * call (never the probe's cached index) and returns the
    * per-signature bucket histogram read back from the written index —
    * so the timed span covers write + read-back, and the oracle checks
    * the physical layout's bucket contents against the replayed
    * signature math. */
  def annIndexBuild(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.embeddings(spark, dir)
    val lsh = new graft.ops.Similarity.SignRandomProjectionLsh(dim = 64, nBits = 8)
    val p = java.nio.file.Files.createTempDirectory("graft_annidx_build").toString
    lsh.writeIndex(corpus, p)
    spark.read.parquet(p)
      .groupBy(col("__sig").cast("int").as("sig"))
      .agg(count(lit(1)).as("n_vectors"))
      .orderBy(col("sig"))
  }

  def annTopKPersisted(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.embeddings(spark, dir)
    val queries = corpus.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val lsh = new graft.ops.Similarity.SignRandomProjectionLsh(dim = 64, nBits = 8)
    val idx = annIndexCache.getOrElseUpdate(dir, {
      val p = java.nio.file.Files.createTempDirectory("graft_annidx").toString
      lsh.writeIndex(corpus, p)
      p
    })
    lsh.annTopKFromIndex(spark, idx, queries, 10)
      .select(col("query_id"), col("cand_id"),
        exactRound(col("cosine"), 6).as("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** s1c — the INCREMENTAL face of the persisted ANN index
    * (Similarity.SignRandomProjectionLsh.appendToIndex): the index is
    * built from 90% of the corpus, the 10% delta is appended — only
    * the delta signed, the stored files never rewritten — and the
    * probe runs against the combined index. Because the partition
    * scheme is the signature itself, append ≡ full rebuild by
    * construction, so this shares s1b's oracle VERBATIM (the st8/q21
    * pattern): the probe over the appended index must hash-match the
    * replayed full-corpus signature math or the append leaked/dropped
    * rows. */
  def annTopKIncremental(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.embeddings(spark, dir)
    val queries = corpus.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val lsh = new graft.ops.Similarity.SignRandomProjectionLsh(dim = 64, nBits = 8)
    val idx = annIncrIndexCache.getOrElseUpdate(dir, {
      val p = java.nio.file.Files.createTempDirectory("graft_annincr").toString
      lsh.writeIndex(corpus.filter(col("vec_id") % 10 =!= 3), p)
      lsh.appendToIndex(corpus.filter(col("vec_id") % 10 === 3), p)
      p
    })
    lsh.annTopKFromIndex(spark, idx, queries, 10)
      .select(col("query_id"), col("cand_id"),
        exactRound(col("cosine"), 6).as("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val annIncrIndexCache =
    scala.collection.concurrent.TrieMap[String, String]()

  /** W4 — centroid representative per label (reference argmin-distance
    * representative selection, clustering/helpers.py:177-183): explode
    * to (label, dim, x), average to centroids, squared-distance join,
    * rank-1 per label with case-id tie-break. All columnar — mirrors
    * the oracle SQL structurally so float noise stays below rounding. */
  def centroidRepresentative(spark: SparkSession, dir: String): DataFrame = {
    val ex = Tables.embeddings(spark, dir)
      .select(col("label"), col("vec_id"),
        posexplode(col("embedding").cast("array<double>")))
      .select(col("label"), col("vec_id"), (col("pos") + 1).as("dim"),
        col("col").as("x"))
    val cent = ex.groupBy(col("label"), col("dim")).agg(avg(col("x")).as("c"))
    val dist = ex.join(cent, Seq("label", "dim"))
      .groupBy(col("label"), col("vec_id"))
      .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("d"))
    val w = Window.partitionBy(col("label")).orderBy(col("d"), col("vec_id"))
    dist.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("label"), col("vec_id"), exactRound(col("d"), 6).as("dist"))
      .orderBy(col("label"))
  }

  /** A7/A8 — per-cluster stats histogram (size, mean/std of the first
    * embedding component — reference cluster token stats,
    * clustering/helpers.py:246-252). */
  def labelStats(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"),
        element_at(col("embedding"), 1).cast("double").as("x"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("cluster_size"),
        exactRound(avg(col("x")), 6).as("mean_x"),
        exactRound(stddev_samp(col("x")), 6).as("std_x"))
      .orderBy(col("label"))

  /** km1 — distributed spherical k-means (ops.KMeans.lloydSummary):
    * two Lloyd rounds over the embeddings, k=8, seeded by vec_id<8.
    * The oracle replays both rounds in SQL; agreement is only possible
    * because each updated centroid is quantized to the 1e-6 grid
    * before the next assignment (see the op's scaladoc) — an
    * oracle-exact ITERATIVE float algorithm. */
  def kmeansSummary(spark: SparkSession, dir: String): DataFrame =
    graft.ops.KMeans.lloydSummary(
      Tables.embeddings(spark, dir), "vec_id", "embedding", k = 8, rounds = 2)

  /** svd1 — matrix-free truncated SVD (ops.Svd.powerIterationTop):
    * three power-iteration rounds over the embeddings; the iterate is
    * sign-canonicalized + 1e-6-quantized after every round, so the
    * oracle replays the full iteration exactly — distributed linear
    * algebra under the hash gate. */
  def svdTop(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Svd.powerIterationTop(
      Tables.embeddings(spark, dir), "embedding", iters = 3)

  /** mmr1 — MMR-diversified rerank (ops.Retrieval.mmrRerank) of probe
    * 0's dense top-50 page: 5 greedy selections trading relevance
    * against redundancy. The oracle unrolls all five selection steps;
    * quantized sims + exact-constant arithmetic make the greedy
    * engine-portable. */
  def mmrDiversified(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Retrieval.mmrRerank(
      Tables.embeddings(spark, dir), "vec_id", "embedding", probeId = 0L)

  /** U5/F9 + W5 — cosine top-5 neighbors for the first 5 vectors
    * (reference: top-5 nearest neighbors per cluster,
    * clustering/helpers.py:185-226). The probe side is tiny and
    * broadcast; similarity is computed columnar (no UDF) and ranked
    * with a per-probe window. */
  def cosineTop5(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probes = e.filter(col("vec_id") < 5)
      .withColumnRenamed("vec_id", "probe_id").withColumnRenamed("v", "pv")
    val sims = e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("cand_id"),
        VF.cosine(col("pv"), col("v")).as("sim_raw"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim_raw").desc, col("cand_id"))
    sims.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("probe_id"), col("cand_id"),
        exactRound(col("sim_raw"), 6).as("sim"), col("rn"))
      .orderBy(col("probe_id"), col("rn"))
  }

  /** v2 — int8-quantized cosine top-5 (ops.Quantize): same probe set
    * as v1, similarity computed on quantized vectors. The quantized
    * dot is exact integer arithmetic, so ranks are engine-portable
    * with NO float tolerance; only sqrt/division touch floats (IEEE
    * exact-rounded, identical everywhere). */
  def quantizedCosineTop5(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("m", graft.ops.Quantize.maxAbs(col("v")))
      .select(col("vec_id"),
        graft.ops.Quantize.int8(col("v"), col("m")).as("qv"))
    val probes = e.filter(col("vec_id") < 5)
      .withColumnRenamed("vec_id", "probe_id").withColumnRenamed("qv", "pqv")
    val sims = e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("cand_id"),
        graft.ops.Quantize.cosine(col("pqv"), col("qv")).as("qsim_raw"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("qsim_raw").desc, col("cand_id"))
    sims.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("probe_id"), col("cand_id"),
        exactRound(col("qsim_raw"), 6).as("qsim"), col("rn"))
      .orderBy(col("probe_id"), col("rn"))
  }
}
