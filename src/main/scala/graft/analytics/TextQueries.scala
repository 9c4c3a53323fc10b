package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.TextAnalysis
import graft.functions.Rounding.exactRound

/** Text-analysis exemplars over the documents table. */
object TextQueries {

  /** Fixed query-term set for the r1 BM25 exemplar (shared with the
    * generated oracle SQL so both engines score the same query). */
  val BmTerms: Seq[String] = Seq("spark", "hash", "join")

  /** r3 — exact phrase search through the positional inverted index
    * (ops.Retrieval.phraseSearch): docs containing the 3-word phrase,
    * with occurrence counts and the first 0-based token position. The
    * oracle replays the adjacency semantics directly on the token
    * arrays, so a posting-list off-by-one (the classic phrase-search
    * bug) fails the hash. */
  def phraseSearch(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Retrieval.phraseSearch(
      Tables.documents(spark, dir), "doc_id", "text",
      Seq("key", "scan", "query"))
      .orderBy(col("doc_id"))

  /** t34 — overlapping RAG chunker (ops.Packing.overlappingChunks):
    * 180-char chunks every 120 chars (60-char overlap) over a bounded
    * doc slice; the gate carries offsets, lengths and an md5 of each
    * chunk's text so content is pinned without dumping it. */
  def overlappingChunks(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Packing.overlappingChunks(
      Tables.documents(spark, dir).filter(col("doc_id") < 300),
      "doc_id", "text", chunkChars = 180, strideChars = 120)
      .select(col("doc_id"), col("chunk_id"), col("chunk_start"),
        col("chunk_len"), md5(col("chunk_text")).as("chunk_digest"))
      .orderBy(col("doc_id"), col("chunk_id"))

  /** r1 — BM25 ranked retrieval: top-20 docs for a fixed 3-term query
    * (ops.Retrieval.bm25). Scores are rounded BEFORE the top-k cut so
    * rank order and the boundary tie-break (doc_id) are
    * engine-portable; the physical top-k is TakeOrderedAndProject
    * (per-partition partial top-k), not a global window. */
  def bm25Search(spark: SparkSession, dir: String): DataFrame =
    bm25Readout(graft.ops.Retrieval.bm25(
      Tables.documents(spark, dir), "doc_id", "text", BmTerms))

  /** The r1/r1b/st20 presentation contract — rounded score, top-20,
    * id tie-break — in ONE home, so the three faces' shared-oracle
    * claim is structural rather than three synchronized copies. */
  private[analytics] def bm25Readout(scored: DataFrame): DataFrame =
    scored
      .select(col("doc_id"), col("dl"),
        exactRound(col("score"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)

  /** r1b — BM25 over the PERSISTED inverted-index store
    * (ops.Retrieval.appendBm25Index/bm25FromIndex): the retrieval
    * family's incremental face. The corpus is indexed in two
    * idempotent appends (base slice, then the doc_id % 10 == 3
    * delta — novel-doc anti-join, postings landing as new files
    * inside term-bucket dirs, additive stats rows); the query then
    * serves from the INDEX alone, pruning its scan to the query
    * terms' bucket partitions. Postings are immutable and stats
    * additive, so the index equals a one-shot build and the scores
    * equal r1's bit-for-bit — r1b gates on r1's oracle VERBATIM. At
    * 100 TB this is the difference between re-scanning the corpus
    * per query batch and serving from ≤ |terms| bucket dirs. */
  def bm25FromStore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val p = bm25StoreCache.getOrElseUpdate(dir, {
      val t = java.nio.file.Files.createTempDirectory("graft_bm25_idx").toString
      graft.ops.Retrieval.appendBm25Index(
        docs.filter(col("doc_id") % 10 =!= 3), "doc_id", "text", t): Unit
      graft.ops.Retrieval.appendBm25Index(
        docs.filter(col("doc_id") % 10 === 3), "doc_id", "text", t): Unit
      t
    })
    bm25Readout(graft.ops.Retrieval.bm25FromIndex(spark, p, BmTerms))
  }

  private val bm25StoreCache = StoreCaches.register("r1b_bm25_store")

  /** r1c — BM25 over the COMPACTED index store
    * (ops.Retrieval.compactBm25Index): the store-lifecycle face r1b
    * leaves open. r1b's append-only discipline is what makes its
    * writes idempotent — and what accumulates one file-set per batch
    * forever, so after 10⁴ appends a pruned query read opens 10⁴
    * footers per touched bucket. Here the index is built in THREE
    * appends (so touched term buckets really hold multiple file-sets
    * — CompactionSpec asserts that precondition and the 1-file bound
    * after), folded by the staged-swap compaction, and queried: the
    * fold is row-preserving by construction, so r1c gates on r1's
    * oracle VERBATIM — the same "lossless maintenance, batch gate"
    * argument every incremental face in this library rides. */
  def bm25FromCompactedStore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val p = bm25CompactedCache.getOrElseUpdate(dir, {
      val t = java.nio.file.Files.createTempDirectory("graft_bm25_cmp").toString
      Seq(col("doc_id") % 10 < 3, col("doc_id") % 10 === 3,
          col("doc_id") % 10 > 3)
        .foreach(slice => graft.ops.Retrieval.appendBm25Index(
          docs.filter(slice), "doc_id", "text", t): Unit)
      graft.ops.Retrieval.compactBm25Index(spark, t): Unit
      t
    })
    bm25Readout(graft.ops.Retrieval.bm25FromIndex(spark, p, BmTerms))
  }

  private val bm25CompactedCache = StoreCaches.register("r1c_bm25_compacted")

  /** r2 — hybrid BM25 + dense-cosine retrieval fused by RRF
    * (ops.Retrieval.hybridRrf): the r1 lexical lane and a v1-style
    * probe-cosine dense lane (probe = vec_id 0), each cut to its lane
    * top-50 by TakeOrderedAndProject, fused by 1/(60+rank) in fixed
    * order. documents.doc_id and embeddings.vec_id are aligned ids. */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Retrieval.hybridRrf(
      Tables.documents(spark, dir), Tables.embeddings(spark, dir),
      "doc_id", "text", "vec_id", "embedding", BmTerms, probeId = 0L)

  /** c2 — end-to-end corpus build, the flagship COMPOSITION exemplar:
    * normalize → exact-dedup survivors → quality gate → deterministic
    * split → per-(split, source) manifest. Every stage is one of this
    * library's own operators chained the way a real training-data
    * build chains them, and the whole pipeline stays oracle-checkable
    * as a single CTE. Shuffle ledger: one digest aggregation (the
    * survivor pick rides it via min_by — no join-back), one final
    * stats aggregation; normalize/quality/split are all map-side.
    * Quality is scored BEFORE the survivor aggregation so the digest
    * shuffle carries four scalars per row, never the document text —
    * at 100 TB the dedup exchange moves ~32 bytes/doc, not the
    * corpus. */
  def corpusBuild(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val norm = docs
      .withColumn("norm_text", TextAnalysis.normalize(col("text")))
      .filter(length(col("norm_text")) > 0)
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
    val survivors = norm
      .groupBy(xxhash64(col("norm_text")).as("__d"))
      .agg(min_by(struct(col("doc_id"), col("source"), col("n_chars"),
        col("q")), col("doc_id")).as("__r"))
      .select(col("__r.*"))
    survivors
      .filter(col("q") >= 0.5)
      .withColumn("split", graft.ops.Sampling.splitLabel(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "c2"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"))
      .orderBy(col("split"), col("source"))
  }

  /** t1 — language-ID heuristic: per-doc marker scores + argmax with
    * fixed tie precedence; rolled up per (actual, predicted) pair. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.langScores(col("text"))
      .foldLeft(Tables.documents(spark, dir)) {
        case (d, (l, c)) => d.withColumn(s"score_$l", c)
      }
    scored
      .withColumn("predicted_lang",
        when(col("score_en") >= col("score_es") && col("score_en") >= col("score_de"), "en")
          .when(col("score_es") >= col("score_de"), "es")
          .otherwise("de"))
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("score_en")).as("sum_score_en"))
      .orderBy(col("lang"), col("predicted_lang"))
  }

  /** t2 — quality scoring: ratio features + composite score. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir).filter(col("doc_id") < 200)
    val withFeatures = TextAnalysis.qualityFeatures(col("text"))
      .foldLeft(base) { case (d, (n, c)) => d.withColumn(n, c) }
    withFeatures.select(
      col("doc_id"), col("n_words"), col("n_chars"),
      exactRound(col("avg_word_len"), 4).as("avg_word_len"),
      exactRound(col("stopword_ratio"), 4).as("stopword_ratio"),
      exactRound(TextAnalysis.qualityScore(col("text")), 4).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** t22 — token-budget mixture selection (ops.Sampling
    * .tokenBudgetSelect): per source, highest-n_chars documents first
    * until 20k tokens are reached; the crossing doc is included. */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.tokenBudgetSelect(
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("source"), col("n_chars"), col("text"),
            graft.functions.TextFunctions.tokenCount(col("text"))
              .cast("long").as("n_tokens"))
          .filter(col("n_tokens") >= 1), // prune precondition (see op doc)
        "source", "n_tokens",
        priority = Seq(("n_chars", true), ("doc_id", false)), budget = 20000L,
        // text rides the input and joins back by id: the heaps/window
        // see ~32 B/row metadata, never the document payload
        idCol = Some("doc_id"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_tokens").cast("long").as("cum_tokens"))
      .orderBy(col("source"), col("cum_tokens"), col("doc_id"))

  /** t23 — deterministic training-order shuffle (ops.Sampling
    * .shuffleShards): epoch layout as (shard, shard_pos), a pure
    * function of (doc_id, salt). */
  def shuffleOrder(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.shuffleShards(
        Tables.documents(spark, dir).select(col("doc_id")),
        col("doc_id"), nShards = 16, salt = "epoch0")
      .select(col("doc_id"), col("shard"), col("shard_pos"))
      .orderBy(col("shard"), col("shard_pos"))

  /** t3 — token counting: BPE-ish regex tokens vs whitespace words. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"),
        graft.functions.TextFunctions.wordCount(col("text")).as("n_words"))
      .orderBy(col("doc_id"))

  /** t4 — rolling-hash fingerprint; duplicate-shape groups surface as
    * shared fingerprints. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** t5 — deterministic train/val/test split: stable hash of the doc
    * key, not rand(), so retries / other engines agree row-for-row. */
  def hashSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("split", graft.ops.Sampling.splitLabel(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "v1"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"))
      .orderBy(col("split"))

  /** t15 — weighted sampling without replacement
    * (ops.Sampling.weightedSample, Efraimidis–Spirakis exponential
    * race): 50 documents drawn with probability proportional to
    * length, deterministically — the "sample long documents more"
    * knob of a mixture build, reproducible enough that the oracle
    * replays the exact race. */
  def weightedSample(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.weightedSample(
      Tables.documents(spark, dir), "doc_id",
      greatest(col("n_chars"), lit(1)).cast("double"), k = 50, salt = "v1")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** t15b — the weighted sample over an INCREMENTALLY-MAINTAINED
    * store (the d9/q25 discipline applied to sampling): the base
    * corpus slice's bottom-50 persists ONCE; a delta merges by
    * re-racing the stored rows against the delta's and re-taking the
    * bottom-50 — the corpus is never rescanned after day one.
    * Exactness: the race keys are deterministic in (doc_id, n_chars,
    * salt), so bottom-k is a min-k fold over a fixed total order and
    * bottom-k(bottom-k(A) ∪ B) = bottom-k(A ∪ B) — t15b gates on
    * t15's oracle VERBATIM (nothing numeric is persisted that could
    * drift; the store holds plain sample rows). At 100 TB the merge
    * costs one delta scan plus a k-row store read. */
  def weightedSampleFromStore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val w = greatest(col("n_chars"), lit(1)).cast("double")
    val p = sampleStoreCache.getOrElseUpdate(dir, {
      val t = java.nio.file.Files.createTempDirectory("graft_t15b").toString
      graft.ops.Sampling.writeWeightedSampleStore(
        docs.filter(col("doc_id") % 10 =!= 3), "doc_id", w,
        s"$t/sample", k = 50, salt = "v1")
      s"$t/sample"
    })
    // (k, salt) resolve from the store's pinned sidecar (r14); the
    // explicit expectations pin this face to t15's draw — a drifted
    // store fail-fasts instead of gating a different sample
    graft.ops.Sampling.mergeWeightedSampleStore(spark, p,
        docs.filter(col("doc_id") % 10 === 3), "doc_id", w,
        expectK = 50, expectSalt = "v1")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  private val sampleStoreCache =
    StoreCaches.register("t15b_weighted_sample_store")

  /** t17 — fixed-window chunking with overlap
    * (ops.TextAnalysis.chunk): 200-char windows, 40-char overlap,
    * over the first 100 docs — the long-document → training-window
    * explosion, as a pure projection. */
  def chunkDocs(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunk(
      Tables.documents(spark, dir).filter(col("doc_id") < 100),
      "doc_id", "text", size = 200, overlap = 40)
      .select(col("doc_id"), col("chunk_idx"), col("n_chunks"),
        length(col("chunk_text")).as("chunk_len"), col("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** t18 — sequence packing (ops.Packing.packSlices): documents laid
    * end-to-end in DATA-SIZED deterministic shards (one per 64 docs
    * here so multi-shard behavior shows at test scale; the production
    * default is ~4M docs/shard) and chopped into 2048-char training
    * windows; each row is one (doc, pack) slice. Oracle replays the
    * same ceil(n/64) shard-count derivation, shard hash and
    * running-offset window in SQL, so the entry stays hash-green at
    * ANY scale factor. */
  def sequencePack(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    graft.ops.Packing.packSlices(docs, "doc_id", "n_chars",
      capacity = 2048, buckets = graft.ops.Packing.sizedBuckets(docs, 64))
      .select(col("bucket"), col("pack_id"), col("doc_id"),
        col("slice_start"), col("slice_len"))
      .orderBy(col("bucket"), col("pack_id"), col("doc_id"))
  }

  /** t6 — stratified deterministic sample: per-language keep
    * fractions over the same stable hash. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.stratifiedSample(
      Tables.documents(spark, dir), "doc_id", "lang",
      Map("en" -> 0.5, "es" -> 0.25, "de" -> 0.1, "fr" -> 1.0), "s1")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"), min(col("doc_id")).as("first_id"))
      .orderBy(col("lang"))

  /** t7 — pre-dedup text canonicalization: lowercase, strip symbols,
    * collapse whitespace. */
  def normalizeDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).filter(col("doc_id") < 100)
      .select(col("doc_id"),
        TextAnalysis.normalize(col("text")).as("norm_text"))
      .withColumn("n_norm_chars", length(col("norm_text")))
      .orderBy(col("doc_id"))

  /** t35 — per-doc shingle novelty under ascending-id arrival order
    * (ops.TextAnalysis.noveltyScores): what fraction of each doc's
    * distinct 3-shingles is first seen in that doc. The oracle
    * recomputes first-seen over the shingle STRINGS while the engine
    * groups 64-bit digests — agreement proves the digest-keyed
    * exchange exact on real data. */
  def noveltyScores(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.noveltyScores(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** t8 — repetition filter signal: top word-2-gram count/fraction
    * per doc (boilerplate detector). */
  def repetition(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(Tables.documents(spark, dir), "doc_id", "text", 2)
      .select(col("doc_id"), col("top_gram_count"), col("n_grams"),
        exactRound(col("top_gram_frac"), 4).as("top_gram_frac"))
      .orderBy(col("doc_id"))

  /** c1 — benchmark decontamination: train docs sharing any 8-gram
    * with the (pretend) eval slice; PolyHash join keys so the shuffle
    * carries 8-byte hashes, reproduced exactly by the oracle. */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val eval = docs.filter(col("doc_id") % 10 === 7)
    val train = docs.filter(col("doc_id") % 10 =!= 7)
    // the eval side here is a CORPUS SLICE (10% holdout), not a fixed
    // benchmark — it must not be force-broadcast (BroadcastGuardSpec)
    graft.ops.Contamination.overlaps(
      train, "doc_id", "text", eval, "doc_id", "text", n = 8,
      broadcastEval = false)
      .orderBy(col("train_id"), col("eval_id"))
  }

  /** t10 — OOV-rate quality proxy: per-doc fraction of words outside
    * the corpus's own top-10 vocabulary (ops.TextAnalysis.oovStats). */
  def oovRate(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.oovStats(Tables.documents(spark, dir), "doc_id", "text", 10)
      .select(col("doc_id"), col("n_words"), col("n_oov"),
        exactRound(col("oov_frac"), 4).as("oov_frac"))
      .orderBy(col("doc_id"))

  /** t11 — domain-mixture balancing: per-language keep rates that
    * equalize expected counts (ops.Sampling.balancedRates). */
  def mixtureRates(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.balancedRates(Tables.documents(spark, dir), "lang")
      .select(col("lang"), col("n_docs"), exactRound(col("rate"), 6).as("rate"))
      .orderBy(col("lang"))

  /** c3 — training-mix manifest (the capstone composition of this
    * round's operator families): Gopher quality gate (t25) → MinHash
    * near-dup survivorship on the surviving pool (d2/d6/d7) →
    * temperature-scaled source allocation over the deduped pool (t32,
    * budget = 60% of the pool in EXACT integer math) → deterministic
    * per-source selection by PolyHash order. The per-source output
    * pins the pool size, quota, integer allocation, selected count AND
    * the sum of selected doc ids — the hash gate therefore proves not
    * just the counts but exactly WHICH documents ship in the mix,
    * through four composed operator families in one plan. */
  def trainingMix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val keepIds = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .filter(col("keep")).select(col("doc_id"))
    val pool0 = docs.join(keepIds, "doc_id")
    val pairs = graft.ops.Dedup.minHashNearDups(pool0, "doc_id", "text", 0.8)
    val comp = graft.ops.Dedup.connectedComponents(pairs, "id_a", "id_b")
    val members = pool0.select(col("doc_id").as("node"), col("n_chars"))
      .join(comp, "node")
    val dropIds = members
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("component"))
          .orderBy(col("n_chars").desc, col("node"))))
      .filter(col("__rn") > 1)
      .select(col("node").as("doc_id"))
    val pool = pool0.join(dropIds, Seq("doc_id"), "left_anti").localCheckpoint()
    val budget = pool.count() * 6L / 10L // exact integer 60%
    val alloc = graft.ops.Sampling.temperatureAllocation(
      pool, "source", budget, 0.7)
    val sel = pool.select(col("doc_id"), col("source"),
        graft.functions.PolyHash.polyHash(
          concat(col("doc_id").cast("string"), lit("c3"))).as("__h"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("__h"), col("doc_id"))))
      .join(alloc.select(col("source"), col("alloc").as("__a")), "source")
      .filter(col("__rn") <= col("__a"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_selected"),
        sum(col("doc_id")).as("sum_sel_ids"))
    alloc.join(sel, Seq("source"), "left")
      .select(col("source"), col("n_docs").as("n_pool"), col("quota"),
        col("alloc"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        coalesce(col("sum_sel_ids"), lit(0L)).as("sum_sel_ids"))
      .orderBy(col("source"))
  }

  /** c3b — INCREMENTAL refresh of the c3 training-mix manifest (r15
    * verdict #3): the composition the eleven separately-proven
    * incremental faces exist for. Base docs (doc_id % 10 != 3) build
    * the persisted state ONCE — bucketed MinHash signature store,
    * bucket-partitioned component store, and a keyed pool table
    * (doc_id, source, n_chars) — and every call runs the DAILY
    * REFRESH: gopher-gate the delta alone (a pure per-doc projection,
    * so delta gating ≡ batch gating restricted), band-probe it against
    * the signature store (delta-sized — the corpus text is never
    * re-shingled), fold its pairs into the component store (touched
    * buckets only), append its signatures + pool rows (bucket-pruned
    * idempotent — a replayed refresh is a no-op), then read the
    * manifest from METADATA stores alone: survivorship over the label
    * store ⋈ pool table, 60% budget, temperature apportionment,
    * PolyHash-ranked selection. Every stage is exact (band recall ≡
    * the batch operator's, the store fold is exact min-contraction,
    * survivorship is a pure readout), so the incremental manifest
    * equals the one-shot c3 rebuild over base ∪ delta — c3's oracle
    * VERBATIM. At 100 TB the refresh cost is sign+probe of the delta
    * plus metadata-sized (id/source/n_chars/hash) manifest passes. */
  def incrementalTrainingMix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val state = c3bStateCache.getOrElseUpdate(dir, {
      val t = java.nio.file.Files.createTempDirectory("graft_c3b").toString
      val base = docs.filter(col("doc_id") % 10 =!= 3)
      val keep = TextAnalysis.gopherRules(base, "doc_id", "text")
        .filter(col("keep")).select(col("doc_id"))
      val pool0 = base.join(keep, "doc_id").localCheckpoint()
      graft.ops.Dedup.writeMinHashSignatures(pool0, "doc_id", "text", s"$t/sigs")
      graft.ops.Dedup.writeComponentStore(
        graft.ops.Dedup.connectedComponents(
          graft.ops.Dedup.minHashNearDupsFromSigs(
            spark.read.parquet(s"$t/sigs"), 0.8),
          "id_a", "id_b"),
        s"$t/labels")
      graft.etl.Sinks.idempotentAppendBucketed(
        pool0.select(col("doc_id"), col("source"), col("n_chars")),
        s"$t/pool", Seq("doc_id"))
      t
    })
    // ---- the daily refresh (measured steady-state on repeat calls) ----
    val delta = docs.filter(col("doc_id") % 10 === 3)
    val dKeep = TextAnalysis.gopherRules(delta, "doc_id", "text")
      .filter(col("keep")).select(col("doc_id"))
    val dPool = delta.join(dKeep, "doc_id").localCheckpoint()
    val dPairs = graft.ops.Dedup.incrementalMinHashNearDups(
        dPool, "doc_id", "text", s"$state/sigs", 0.8)
      .select(col("id_a"), col("id_b")).localCheckpoint()
    graft.ops.Dedup.mergeComponentStoreDelta(
      spark, s"$state/labels", dPairs, "id_a", "id_b"): Unit
    graft.ops.Dedup.appendMinHashSignatures(
      dPool, "doc_id", "text", s"$state/sigs"): Unit
    graft.etl.Sinks.idempotentAppendBucketed(
      dPool.select(col("doc_id"), col("source"), col("n_chars")),
      s"$state/pool", Seq("doc_id")): Unit
    // ---- manifest readout: metadata stores only, no corpus text ----
    val poolTab = spark.read.parquet(s"$state/pool")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val comp = graft.ops.Dedup.readComponentStore(spark, s"$state/labels")
      .select(col("node"), col("component"))
    val dropIds = poolTab.select(col("doc_id").as("node"), col("n_chars"))
      .join(comp, "node")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("component"))
          .orderBy(col("n_chars").desc, col("node"))))
      .filter(col("__rn") > 1)
      .select(col("node").as("doc_id"))
    val pool = poolTab.join(dropIds, Seq("doc_id"), "left_anti").localCheckpoint()
    val budget = pool.count() * 6L / 10L
    val alloc = graft.ops.Sampling.temperatureAllocation(
      pool, "source", budget, 0.7)
    val sel = pool.select(col("doc_id"), col("source"),
        graft.functions.PolyHash.polyHash(
          concat(col("doc_id").cast("string"), lit("c3"))).as("__h"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("__h"), col("doc_id"))))
      .join(alloc.select(col("source"), col("alloc").as("__a")), "source")
      .filter(col("__rn") <= col("__a"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_selected"),
        sum(col("doc_id")).as("sum_sel_ids"))
    alloc.join(sel, Seq("source"), "left")
      .select(col("source"), col("n_docs").as("n_pool"), col("quota"),
        col("alloc"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        coalesce(col("sum_sel_ids"), lit(0L)).as("sum_sel_ids"))
      .orderBy(col("source"))
  }

  private val c3bStateCache =
    graft.analytics.StoreCaches.register("c3b_incremental_training_mix")

  /** t32 — temperature-scaled source mixing
    * (ops.Sampling.temperatureAllocation, alpha = 0.7, budget 100k):
    * the mT5/XLM-R sampling-temperature allocation with largest-
    * remainder integer apportionment — allocations sum to the budget
    * exactly (spec-pinned); quotas 6dp-gridded so pow() ulp noise
    * cannot move a seat. */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.temperatureAllocation(
        Tables.documents(spark, dir), "source", budget = 100000L, alpha = 0.7)
      .orderBy(col("source"))

  /** t9 — PII detect + redact. The synthetic corpus carries no PII, so
    * the query PLANTS deterministic PII per doc (the oracle side builds
    * the identical string) and then counts + redacts it — exercising
    * the real operator (graft.ops.Pii) on text that actually contains
    * emails/phones/IPs. */
  def pii(spark: SparkSession, dir: String): DataFrame = {
    val injected = when(col("doc_id") % 4 === 0,
        concat(lit(" reach me at user"), col("doc_id"), lit("@example.com")))
      .when(col("doc_id") % 4 === 1, lit(" call 555-123-4567 now"))
      .when(col("doc_id") % 4 === 2,
        concat(lit(" from host 10.0."), col("doc_id") % 256, lit(".7")))
      .otherwise(lit(""))
    val base = Tables.documents(spark, dir)
      .withColumn("t2", concat(col("text"), injected))
    val withCounts = graft.ops.Pii.counts(col("t2"))
      .foldLeft(base) { case (d, (n, c)) => d.withColumn(n, c) }
    withCounts.select(
      col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
      graft.ops.Pii.redact(col("t2")).as("redacted"))
      .orderBy(col("doc_id"))
  }

  /** t12 — unigram-LM surprisal quality proxy: mean -log2 p(word)
    * under the corpus's own unigram distribution
    * (ops.TextAnalysis.unigramSurprisal). */
  def surprisal(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramSurprisal(Tables.documents(spark, dir), "doc_id", "text")
      .select(col("doc_id"), col("n_words"),
        exactRound(col("mean_surprisal"), 4).as("mean_surprisal"))
      .orderBy(col("doc_id"))

  /** t19 — bigram-LM surprisal: per-doc mean conditional surprisal
    * under the corpus's own bigram model
    * (ops.TextAnalysis.bigramSurprisal). */
  def bigramSurprisal(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramSurprisal(Tables.documents(spark, dir), "doc_id", "text")
      .select(col("doc_id"), col("n_bigrams"),
        exactRound(col("mean_surprisal"), 4).as("mean_surprisal"))
      .orderBy(col("doc_id"))

  /** t29 — PMI collocations (ops.TextAnalysis.collocations): the
    * top-20 bigrams by pointwise mutual information with count ≥ 5 —
    * phrase mining over the corpus. PMI ranks on its 4dp grid with a
    * bigram-text tie-break, so the top-k cut replays exactly. */
  def collocations(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.collocations(Tables.documents(spark, dir), "text")

  /** t20 — per-source boilerplate detection
    * (ops.TextAnalysis.boilerplateGrams). The corpus is synthetic
    * random words with no real boilerplate, so the query PLANTS a
    * per-source boilerplate sentence on every even doc_id (the same
    * planted-signal trick as t9's PII) and the detector must recover
    * exactly its trigrams: each planted trigram appears in ~half the
    * source's docs (≥ the 0.4 cut), while no natural trigram reaches
    * 0.4 at any tested scale. */
  def boilerplate(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables.documents(spark, dir)
      .withColumn("text2",
        when(col("doc_id") % 2 === 0,
          concat(col("text"), lit(" subscribe to "), col("source"),
            lit(" newsletter today")))
          .otherwise(col("text")))
    TextAnalysis.boilerplateGrams(planted, "doc_id", "source", "text2",
        n = 3, minFrac = 0.4)
      .select(col("source"), col("gram"), col("df_docs"), col("n_src_docs"),
        exactRound(col("doc_frac"), 4).as("doc_frac"))
      .orderBy(col("source"), col("gram"))
  }

  /** t21 — boilerplate STRIP (ops.TextAnalysis.stripBoilerplate):
    * detect per-source boilerplate trigrams (same planted signal as
    * t20), then remove each source's top gram (df desc, gram asc
    * tie-break) from every document and collapse the leftover
    * whitespace. The full detect→apply pair is the web-corpus
    * cleaning pass a training build runs before dedup. */
  def boilerplateStrip(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables.documents(spark, dir)
      .withColumn("text2",
        when(col("doc_id") % 2 === 0,
          concat(col("text"), lit(" subscribe to "), col("source"),
            lit(" newsletter today")))
          .otherwise(col("text")))
    val detected = TextAnalysis.boilerplateGrams(planted, "doc_id", "source",
      "text2", n = 3, minFrac = 0.4)
    TextAnalysis.stripBoilerplate(planted, "source", "text2", detected)
      .select(col("doc_id"), col("source"),
        length(col("text2")).as("n_clean_chars"),
        col("text2").as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** t13 — per-doc character Shannon entropy
    * (ops.TextAnalysis.charEntropy). */
  def charEntropy(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.charEntropy(Tables.documents(spark, dir), "doc_id", "text")
      .select(col("doc_id"), col("n_chars"),
        exactRound(col("entropy"), 4).as("entropy"))
      .orderBy(col("doc_id"))

  /** m2 — multimodal frame sampling: every-8th frame index for video
    * rows, generated columnar (ops.Multimodal.frameSample) and
    * exploded to (media_id, frame_idx) rows. */
  /** d12 — DSIR importance selection (ops.Sampling.dsirSelect): the
    * 100 raw documents whose hashed-unigram bags look most like the
    * English slice of the corpus. Weight sums are order-dependent
    * doubles → rounded to 4, same contract as t12's mean surprisal. */
  def dsirSelect(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.dsirSelect(Tables.documents(spark, dir),
        "doc_id", "text", col("lang") === "en", k = 100)
      .select(col("doc_id"), col("n_tokens"),
        exactRound(col("weight"), 4).as("weight"))
      .orderBy(col("weight").desc, col("doc_id"))

  /** t25 — Gopher-style rule-based quality filter: every signal and
    * per-rule verdict is kept in the output (auditability is the
    * operator's point — see ops.TextAnalysis.gopherRules), so the
    * oracle checks the full signal computation, not just the kept
    * set. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherRules(Tables.documents(spark, dir), "doc_id", "text")
      .select(col("doc_id"), col("word_count"),
        exactRound(col("mean_word_len"), 4).as("mean_word_len"),
        col("stopword_hits"),
        exactRound(col("alpha_ratio"), 4).as("alpha_ratio"),
        col("r_word_count"), col("r_mean_word_len"),
        col("r_stopwords"), col("r_alpha"), col("keep"))
      .orderBy(col("doc_id"))

  def frameSample(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal.frameSample(
      graft.ops.Multimodal.toMediaTable(Tables.documents(spark, dir)), 8)
      .filter(col("meta.kind") === "video")
      .select(col("media_id"), explode(col("sampled_frames")).as("frame_idx"))
      .orderBy(col("media_id"), col("frame_idx"))

  /** m3 — decode-batch scheduling (ops.Multimodal.decodeBatches): the
    * GPU-decode manifest, rolled up per batch — whole items, capacity-
    * bounded pixel loads, deterministic under retries. The oracle
    * replays shard hash, window sum and integer division; the batch
    * invariant (load <= capacity + max item) is spec-checked. */
  def decodeBatchPlan(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.ops.Multimodal.toMediaTable(Tables.documents(spark, dir))
    graft.ops.Multimodal.decodeBatches(media, capacity = 65536,
        buckets = graft.ops.Packing.sizedBuckets(media, 200))
      .groupBy(col("kind"), col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("pixels")).as("total_pixels"),
        min(col("media_id")).as("first_media"))
      .orderBy(col("kind"), col("bucket"), col("batch_id"))
  }

  /** t14 — per-domain quality sampling through the CUSTOM TopKPerGroup
    * operator: top-5 docs per source by composite quality score (the
    * training-data "best N per domain" selection shape — exactly the
    * large-k-per-group regime the custom operator exists for). Quality
    * is pure exactly-rounded IEEE arithmetic, so the unrounded ORDER
    * is engine-portable; doc_id breaks ties. */
  def topQualityPerSource(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q"))
    graft.ops.TopK.perGroup(base, Seq("source"),
      Seq(("q", true), ("doc_id", false)), k = 5, rankName = "rn")
      .select(col("source"), col("doc_id"),
        exactRound(col("q"), 4).as("quality_score"), col("rn"))
      .orderBy(col("source"), col("rn"))
  }

  /** t16 — PER-STRATUM weighted sampling: the Efraimidis–Spirakis race
    * (ops.Sampling.uniform01) pushed through the custom TopKPerGroup
    * Catalyst operator — 10 docs per source, length-proportional, in
    * one bounded-heap pass (partial top-k map-side, no global or
    * per-group full sort). The composition is the point: mixture
    * builds sample per domain, and the race key makes that a
    * deterministic top-k per group, which is exactly the operator the
    * engine already owns. */
  def weightedSamplePerSource(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("race",
        -log(graft.ops.Sampling.uniform01(col("doc_id"), "v1"))
          / greatest(col("n_chars"), lit(1)).cast("double"))
    graft.ops.TopK.perGroup(base, Seq("source"),
      Seq(("race", false), ("doc_id", false)), k = 10, rankName = "rn")
      .select(col("source"), col("doc_id"), col("n_chars"), col("rn"))
      .orderBy(col("source"), col("rn"))
  }

  /** m1 — multimodal media table plumbing: binary payload byte length,
    * content digest, and the deterministic typed metadata
    * (graft.ops.Multimodal.toMediaTable). */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal.toMediaTable(Tables.documents(spark, dir))
      .select(
        col("media_id"),
        col("meta.kind").as("kind"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("digest"))
      .orderBy(col("media_id"))

  /** m4 — the decode → resize chain END-TO-END: batched mapPartitions
    * decode (graft.ops.Multimodal.decodeBatched — the mapInPandas
    * shape: the stub codec sees whole Seq[bytes] batches, partitioning
    * preserved) into the pure-columnar nearest-neighbor resize to
    * 16×16, rolled up per media as an INTEGER byte-sum so the float
    * division in the stub cancels exactly (pixel = byte/255 → rint(
    * px·255) recovers the byte; integer sums are association-order-
    * free, so the hash gate has zero float risk). The oracle replays
    * the whole chain — metadata derivation, the resize index
    * arithmetic floor(floor(i/16)·h/16)·w + floor((i%16)·w/16), and
    * the stub's cyclic byte lookup (documents are ASCII at every sf,
    * so ord(substr(text, src % len + 1, 1)) IS the payload byte). */
  def resizePipeline(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.ops.Multimodal.toMediaTable(
      Tables.documents(spark, dir).filter(col("doc_id") < 120))
    val resized = graft.ops.Multimodal.resize(
      graft.ops.Multimodal.decodeBatched(media, batchSize = 16), 16, 16)
    resized.select(col("media_id"),
        size(col("pixels_resized")).as("n_px"),
        aggregate(
          transform(col("pixels_resized"), x => rint(x * lit(255.0d))),
          lit(0.0d), (a, x) => a + x).cast("long").as("byte_sum"))
      .orderBy(col("media_id"))
  }

  /** m5 — perceptual-hash image near-dup (ops.Multimodal
    * .imageNearDups): the multimodal face of the SimHash dedup family
    * — decode → 8×8 resize → all-integer aHash signature → 16-bit
    * band join with bit_count(XOR) verification. The oracle is the
    * BRUTE-FORCE Hamming scan over the same replayed signatures, so
    * byte-equality proves the band pigeonhole's complete recall on
    * real data (the d3 proof, repeated behind a codec). */
  def imageNearDups(spark: SparkSession, dir: String): DataFrame = {
    // derived fixture (the j13 pattern): natural docs carry no image
    // near-dups (near-dup TEXTS decode under different dims), so the
    // fixture plants them — an exact copy and a one-char-center
    // mutation of every base doc, under id offsets ≡ 0 (mod 64) so
    // width/height agree and the decoded tensors align. The mutation
    // keeps LENGTH (the cyclic byte indexing shifts under inserts),
    // flipping only the resize cells that sample the mutated byte —
    // a genuine small-Hamming population, not just distance 0.
    val d0 = Tables.documents(spark, dir).filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text"))
    val exactCopy = d0.select((col("doc_id") + 102400L).as("doc_id"),
      col("text"))
    val mutated = d0.selectExpr("doc_id + 204800 AS doc_id",
      """concat(substring(text, 1, length(text) div 2), 'q',
        |  substring(text, (length(text) div 2) + 2)) AS text""".stripMargin)
    val media = graft.ops.Multimodal.toMediaTable(
      d0.unionByName(exactCopy).unionByName(mutated))
    graft.ops.Multimodal.imageNearDups(media, maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** lr1 — distributed classifier training (ops.Logistic.fit): 3
    * full-batch GD steps of a logistic English-vs-rest model over four
    * cheap engine-exact text features (bias, scaled char/word counts,
    * chars-per-word). The oracle replays training step by step —
    * weights quantized to 1e-6 after each step make exp/ln's cross-
    * engine last-ulp noise vanish into the grid. */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val nw = size(split(col("text"), " "))
    val f = Tables.documents(spark, dir).select(
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
      lit(1.0).as("x0"),
      (col("n_chars") / lit(1000.0)).as("x1"),
      (nw / lit(100.0)).as("x2"),
      (col("n_chars") / nw.cast("double")).as("x3"))
    graft.ops.Logistic.fitSummary(f, "y", Seq("x0", "x1", "x2", "x3"))
  }

  /** t26 — BPE merge-candidate table (ops.Bpe.pairCounts): the top-30
    * corpus-weighted adjacent character pairs inside words — round 1
    * of tokenizer training, surfaced as a query so the oracle checks
    * the corpus-pass + vocab-weighting algebra that the full
    * [[graft.ops.Bpe.train]] loop (BpeSpec) builds on. Ties broken by
    * pair text; the limit rides TakeOrderedAndProject. */
  def bpePairs(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Bpe.pairCounts(Tables.documents(spark, dir), "text")
      .orderBy(col("n").desc, col("pair"))
      .limit(30)

  /** t30 — BPE tokenizer APPLY (ops.Bpe.encodedTokenCounts): the four
    * merges learned by [[graft.ops.Bpe.train]] applied back to the
    * corpus at vocab scale; per-doc word + BPE-token counts. The
    * oracle replays the ENTIRE training loop — all four pair-count +
    * argmax rounds — and the delimited-symbol replace-chain encode in
    * SQL, so the hash gate covers train AND apply end-to-end (t26
    * gates round 1's candidate table; this gates the loop). */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val merges = graft.ops.Bpe.train(docs, "text", numMerges = 4).map(_._1)
    graft.ops.Bpe.encodedTokenCounts(docs, "doc_id", "text", merges)
      .orderBy(col("doc_id"))
  }

  /** t28 — duplicate-aware split (ops.Sampling.leakageFreeSplit):
    * t5's deterministic split, but keyed on the near-dup COMPONENT
    * root (d6's verified MinHash components) so a test doc can never
    * have a near-copy in train. The oracle replays components
    * recursively in SQL, roots singletons at their own id, and applies
    * the identical PolyHash bucket rule — the hash match proves both
    * the grouping and the no-straddle property (same root ⇒ same
    * bucket ⇒ same split, by construction on both engines). */
  def leakageFreeSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val comps = graft.ops.Dedup.connectedComponents(
      graft.ops.Dedup.minHashNearDups(docs, "doc_id", "text", 0.8),
      "id_a", "id_b")
    graft.ops.Sampling.leakageFreeSplit(docs, "doc_id", comps,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "v1")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("in_dup_group").cast("long")).as("n_grouped"),
        sum(col("n_chars")).cast("long").as("total_chars"))
      .orderBy(col("split"))
  }

  /** t27 — CCNet-style perplexity tiers: every doc scored by the t12
    * unigram-LM surprisal, then split into equal-mass head/middle/tail
    * thirds by [[graft.ops.Sampling.exactNtile]] — the distributed
    * exact replay of `ntile(3) OVER (ORDER BY score, doc_id)` with no
    * corpus-sized global sort (the histogram trick; see the op's
    * scaladoc). Scores are rounded to 4 places BEFORE bucketing so the
    * total order itself is engine-portable. */
  /** t31 — winsorized per-source quality (ops.Sampling.winsorize over
    * t27's surprisal score): clamp to the exact 5%/95% ntile edges,
    * then per-source stats. The mean is computed as
    * `sum(w·10⁴) / (10⁴·n)` — the 4dp-gridded scores scale to exact
    * integers, so the sum (and the mean) is bit-deterministic under
    * ANY accumulation order: no output grid needed, the oracle matches
    * to the last bit by construction. */
  def winsorizedQuality(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = TextAnalysis.unigramSurprisal(docs, "doc_id", "text")
      .select(col("doc_id"), exactRound(col("mean_surprisal"), 4).as("score"))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    graft.ops.Sampling.winsorize(scored, "score", "doc_id", 20, "w")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("w") * lit(10000.0)) / (lit(10000.0) * count(lit(1))))
          .as("mean_w"),
        min(col("w")).as("min_w"),
        max(col("w")).as("max_w"))
      .orderBy(col("source"))
  }

  def perplexityBuckets(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis
      .unigramSurprisal(Tables.documents(spark, dir), "doc_id", "text")
      .select(col("doc_id"), col("n_words"),
        exactRound(col("mean_surprisal"), 4).as("score"))
    graft.ops.Sampling.exactNtile(scored, "score", "doc_id", 3)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"),
        sum(col("n_words")).as("total_words"))
      .orderBy(col("bucket"))
  }
}
