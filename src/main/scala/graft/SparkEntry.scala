package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.{CoreQueries, DedupQueries, MedallionQueries, NestedQueries, ProfileQueries, ScalarQueries, SketchQueries, SqlQueries, StreamQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers an exemplar
  * query here, with an equivalent DuckDB SQL oracle in [[oracleSql]].
  * Column names and row order are made to match exactly on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"    -> (CoreQueries.pricingSummary _),
    "q2_priority_pivot"     -> (CoreQueries.orderPriorityPivot _),
    "q3_region_rollup"      -> (CoreQueries.regionRollup _),
    "q4_revenue_by_month"   -> (CoreQueries.revenueByStatusMonth _),
    "q5_anti_join"          -> (CoreQueries.customersWithoutOrders _),
    "q6_semi_join"          -> (CoreQueries.customersWithOrders _),
    "q7_topk_per_group"     -> (CoreQueries.top3PerSupplier _),
    "q7b_topk_custom_op"    -> (CoreQueries.top3PerSupplierCustom _),
    "q8_running_total"      -> (CoreQueries.runningOrderTotal _),
    "w8_asof_join"          -> (CoreQueries.clickPriorView _),
    "w9_asof_forward"       -> (CoreQueries.clickNextView _),
    "w15_asof_tolerance"    -> (CoreQueries.clickFreshPriorView _),
    "w16_hopping_window"    -> (CoreQueries.hoppingWindowCounts _),
    "cdc2_scd2"             -> (CoreQueries.scd2History _),
    "w17_point_in_time"     -> (CoreQueries.pointInTimeRollup _),
    "w10_range_join"        -> (CoreQueries.purchaseWindowErrors _),
    "j8_bloom_prune"        -> (CoreQueries.bloomPrunedRevenue _),
    "j12_salted_join"       -> (CoreQueries.saltedSegmentRollup _),
    "z1_zorder_code"        -> (ScalarQueries.zorderCode _),
    "u2_funnel"             -> (CoreQueries.conversionFunnel _),
    "u5_window_funnel"      -> (CoreQueries.windowFunnelLevels _),
    "u3_cohort"             -> (CoreQueries.cohortRetention _),
    "q9_having"             -> (CoreQueries.bigSuppliers _),
    "q10_date_arith"        -> (CoreQueries.eventAgeHistogram _),
    "q11_percentiles"       -> (CoreQueries.quantitySummary _),
    "q13_rollup"            -> (CoreQueries.revenueRollup _),
    "q14_cube"              -> (CoreQueries.revenueCube _),
    "q20_grouping_sets"     -> (CoreQueries.groupingSets _),
    "t29_collocations"      -> (TextQueries.collocations _),
    "q15_unpivot"           -> (CoreQueries.priorityUnpivot _),
    "q16_rank_stats"        -> (CoreQueries.priceRankStats _),
    "q17_approx_distinct"   -> (SketchQueries.approxDistinct _),
    "q18_approx_median"     -> (SketchQueries.approxMedian _),
    "q19_heavy_hitters"     -> (SketchQueries.heavyHitters _),
    "q21_count_min"         -> (SketchQueries.countMinUsers _),
    "q23_hll_register_store" -> (SketchQueries.hllRegisterStore _),
    "q23b_hll64_register_store" -> (SketchQueries.hllRegisterStore64 _),
    "q24_hist_quantile_store" -> (SketchQueries.histQuantileStore _),
    "q25_kmv_store"         -> (SketchQueries.kmvStore _),
    "q27_cms_store"         -> (SketchQueries.countMinStore _),
    "q26_kmv_overlap"       -> (SketchQueries.kmvOverlap _),
    "q26b_kmv_delta"        -> (SketchQueries.kmvDelta _),
    "q26c_kmv_fine"         -> (SketchQueries.kmvFineOverlap _),
    "ov1_overlap_matrix"    -> (SketchQueries.kmvOverlapMatrix _),
    "ov1b_overlap_store"    -> (SketchQueries.kmvOverlapMatrixIncremental _),
    "ov2_overlap_sparse"    -> (SketchQueries.kmvOverlapMatrixSparse _),
    "ks1_drift"             -> (ProfileQueries.priceDrift _),
    "pf1_skew_profile"      -> (ProfileQueries.custkeySkewProfile _),
    "fp1_compaction_plan"   -> (ProfileQueries.eventCompactionPlan _),
    "cm1_corr_matrix"       -> (ProfileQueries.featureCorrMatrix _),
    "cm1b_corr_store"       -> (ProfileQueries.corrMatrixStore _),
    "seq1_pattern_match"    -> (ProfileQueries.sequencePatterns _),
    "knn1_graph"            -> (VectorQueries.knnGraph _),
    "knn1b_graph_store"     -> (VectorQueries.knnGraphIncremental _),
    "knn1c_graph_refresh"   -> (VectorQueries.knnGraphRefreshed _),
    "knn2_semantic_clusters" -> (VectorQueries.knnClusters _),
    "q12_lag_ntile"         -> (CoreQueries.orderGaps _),
    "j9_bucketed_join"      -> (CoreQueries.bucketedRevenue _),
    "j10_fuzzy_join"        -> (CoreQueries.fuzzyNameJoin _),
    "c4_entity_resolution"  -> (CoreQueries.entityResolution _),
    "cdc1_snapshot_diff"    -> (CoreQueries.snapshotDiff _),
    "pr1_pagerank"          -> (CoreQueries.pagerankTop _),
    "pr2_personalized"      -> (CoreQueries.personalizedPagerankTop _),
    "lp1_communities"       -> (CoreQueries.communities _),
    "tc1_triangles"         -> (CoreQueries.triangleCounts _),
    "tc2_triangle_store"    -> (CoreQueries.triangleCountsIncremental _),
    "tc2b_triangle_store_sparse" -> (CoreQueries.triangleCountsIncrementalSparse _),
    "w12_ewma"              -> (CoreQueries.userEwma _),
    "w13_throttle_dedup"    -> (CoreQueries.throttleDedup _),
    "w14_trailing_window"   -> (CoreQueries.trailingHourWindow _),
    "q22_correlated_agg"    -> (SqlQueries.richIdleCustomers _),
    "u4_multiset_ops"       -> (SqlQueries.multisetOps _),
    "gc1_kcore"             -> (CoreQueries.supplierKCore _),
    "mf1_als_rank1"         -> (CoreQueries.alsFactors _),
    "p1_word_filter"        -> (ScalarQueries.wordFilter _),
    "p3_range_filter"       -> (ScalarQueries.sourceRangeFilter _),
    "p4_type_classifier"    -> (ScalarQueries.typeClassifier _),
    "p5_null_guard"         -> (ScalarQueries.nullGuardedMetrics _),
    "f1_priority_parse"     -> (ScalarQueries.priorityParse _),
    "f3_key_extract"        -> (ScalarQueries.customerKeyParse _),
    "f5_text_projections"   -> (ScalarQueries.textProjections _),
    "f8_math"               -> (ScalarQueries.mathProjections _),
    "f10_json_extract"      -> (ScalarQueries.jsonExtract _),
    "f11_daily_rollup"      -> (ScalarQueries.dailyEventRollup _),
    "a1_weighted_vec_mean"  -> (VectorQueries.weightedMeanByLabel _),
    "v1_cosine_top5"        -> (VectorQueries.cosineTop5 _),
    "w4_centroid_rep"       -> (VectorQueries.centroidRepresentative _),
    "km1_kmeans"            -> (VectorQueries.kmeansSummary _),
    "svd1_power_iteration"  -> (VectorQueries.svdTop _),
    "mmr1_diversified"      -> (VectorQueries.mmrDiversified _),
    "a7_label_stats"        -> (VectorQueries.labelStats _),
    "g1_word_explode"       -> (NestedQueries.wordExplode _),
    "g2_ordered_reassembly" -> (NestedQueries.orderedReassembly _),
    "g3_transcript_flatten" -> (NestedQueries.transcriptFlatten _),
    "w1_event_index"        -> (NestedQueries.eventIndex _),
    "d1_exact_dedup"        -> (DedupQueries.exactDedup _),
    "d2_minhash_neardup"    -> (DedupQueries.minhashNearDups _),
    "d3b_simhash_wide"      -> (DedupQueries.simhashNearDupsWide _),
    "d3d_simhash_wide4"     -> (DedupQueries.simhashNearDupsWide4 _),
    "d3c_incremental_simhash" -> (DedupQueries.incrementalSimhashNearDups _),
    "d11b_incremental_semdedup" -> (DedupQueries.incrementalSemanticDedup _),
    "d3_simhash_neardup"    -> (DedupQueries.simhashNearDups _),
    "d4_ngram_jaccard"      -> (DedupQueries.ngramJaccard _),
    "j11_setsim_join"       -> (DedupQueries.setSimJoin _),
    "j13_containment_join"  -> (DedupQueries.containmentJoin _),
    "j11b_incr_setsim"      -> (DedupQueries.incrementalSetSimJoin _),
    "j11c_bucketed_setsim"  -> (DedupQueries.bucketedIncrementalSetSimJoin _),
    "d6_neardup_components" -> (DedupQueries.neardupComponents _),
    "d6b_incremental_components" -> (DedupQueries.incrementalComponents _),
    "d6c_bucketed_components" -> (DedupQueries.bucketedIncrementalComponents _),
    "d7b_incremental_survivors" -> (DedupQueries.incrementalSurvivors _),
    "d7_dedup_survivors"    -> (DedupQueries.dedupSurvivors _),
    "d8_duplicated_grams"   -> (DedupQueries.duplicatedGrams _),
    "d9_incremental_neardup" -> (DedupQueries.incrementalNearDups _),
    "del1_takedown_sigs"    -> (DedupQueries.takedownSignatures _),
    "del2_takedown_pairlog" -> (DedupQueries.takedownPairLog _),
    "del3_takedown_components" -> (DedupQueries.takedownComponents _),
    "d10_span_strip"        -> (DedupQueries.spanStrip _),
    "d11_semantic_dedup"    -> (DedupQueries.semanticDedup _),
    "d5_embedding_neardup"  -> (DedupQueries.embeddingNearDups _),
    "e1_hyperplane_neardup" -> (DedupQueries.hyperplaneEmbeddingNearDups _),
    "t1_lang_id"            -> (TextQueries.langId _),
    "t5_hash_split"         -> (TextQueries.hashSplit _),
    "t6_stratified_sample"  -> (TextQueries.stratifiedSample _),
    "t7_normalize"          -> (TextQueries.normalizeDocs _),
    "t8_repetition"         -> (TextQueries.repetition _),
    "t9_pii_redact"         -> (TextQueries.pii _),
    "t35_novelty"           -> (TextQueries.noveltyScores _),
    "r1_bm25_search"        -> (TextQueries.bm25Search _),
    "r1b_bm25_store"        -> (TextQueries.bm25FromStore _),
    "r1c_bm25_compacted"    -> (TextQueries.bm25FromCompactedStore _),
    "r3_phrase_search"      -> (TextQueries.phraseSearch _),
    "t34_chunk_overlap"     -> (TextQueries.overlappingChunks _),
    "r2_hybrid_rrf"         -> (TextQueries.hybridRrf _),
    "t10_oov_rate"          -> (TextQueries.oovRate _),
    "t11_mixture_rates"     -> (TextQueries.mixtureRates _),
    "t12_surprisal"         -> (TextQueries.surprisal _),
    "t14_topk_per_source"   -> (TextQueries.topQualityPerSource _),
    "t15_weighted_sample"   -> (TextQueries.weightedSample _),
    "t15b_weighted_sample_store" -> (TextQueries.weightedSampleFromStore _),
    "st23_stream_weighted_sample" -> (StreamQueries.streamWeightedSample _),
    "st24_stream_setsim"    -> (StreamQueries.streamSetSimJoin _),
    "st25_stream_fuzzy"     -> (StreamQueries.streamFuzzyJoin _),
    "st26_stream_takedown"  -> (StreamQueries.streamDedupTakedown _),
    "t16_weighted_per_src"  -> (TextQueries.weightedSamplePerSource _),
    "t17_chunking"          -> (TextQueries.chunkDocs _),
    "t18_sequence_pack"     -> (TextQueries.sequencePack _),
    "t13_char_entropy"      -> (TextQueries.charEntropy _),
    "t19_bigram_surprisal"  -> (TextQueries.bigramSurprisal _),
    "t20_boilerplate"       -> (TextQueries.boilerplate _),
    "t22_token_budget"      -> (TextQueries.tokenBudget _),
    "t23_shuffle_order"     -> (TextQueries.shuffleOrder _),
    "t21_boilerplate_strip" -> (TextQueries.boilerplateStrip _),
    "t26_bpe_pairs"         -> (TextQueries.bpePairs _),
    "t30_bpe_encode"        -> (TextQueries.bpeEncode _),
    "t31_winsorize"         -> (TextQueries.winsorizedQuality _),
    "t32_temperature_mix"   -> (TextQueries.temperatureMix _),
    "lr1_quality_classifier" -> (TextQueries.qualityClassifier _),
    "t27_perplexity_tiers"  -> (TextQueries.perplexityBuckets _),
    "t28_leakage_free_split" -> (TextQueries.leakageFreeSplit _),
    "m2_frame_sample"       -> (TextQueries.frameSample _),
    "m5_image_neardup"      -> (TextQueries.imageNearDups _),
    "m3_decode_batches"     -> (TextQueries.decodeBatchPlan _),
    "v2_quantized_cosine"   -> (VectorQueries.quantizedCosineTop5 _),
    "v3_hard_negatives"     -> (VectorQueries.hardNegatives _),
    "v3b_hard_neg_ann"      -> (VectorQueries.hardNegativesAnn _),
    "v3c_hard_neg_pq"       -> (VectorQueries.hardNegativesPq _),
    "c1_contamination"      -> (TextQueries.contamination _),
    "c2_corpus_build"       -> (TextQueries.corpusBuild _),
    "c3_training_mix"       -> (TextQueries.trainingMix _),
    "c3b_incremental_training_mix" -> (TextQueries.incrementalTrainingMix _),
    "t2_quality_score"      -> (TextQueries.quality _),
    "t3_token_count"        -> (TextQueries.tokenCount _),
    "t4_fingerprint"        -> (TextQueries.fingerprint _),
    "s1_ann_topk"           -> (VectorQueries.annTopK _),
    "s2_ivf_seeded"         -> (VectorQueries.ivfSeededTopK _),
    "s2b_ivf_trained"       -> (VectorQueries.ivfTrainedTopK _),
    "s3b_pq_trained"        -> (VectorQueries.pqTrainedTopK _),
    "s1b_ann_persisted"     -> (VectorQueries.annTopKPersisted _),
    "s1c_ann_incremental"   -> (VectorQueries.annTopKIncremental _),
    "s1b_build_index"       -> (VectorQueries.annIndexBuild _),
    "st1_hourly_window"     -> (StreamQueries.hourlyWindow _),
    "st10_stream_hopping"   -> (StreamQueries.hoppingWindow _),
    "st2_user_sessions"     -> (StreamQueries.userSessions _),
    "st3_stream_join"       -> (StreamQueries.clickViewPairs _),
    "st4_stream_semdedup"   -> (StreamQueries.streamSemanticDedup _),
    "st5_stream_minhash"    -> (StreamQueries.streamMinhashDedup _),
    "st6_stream_cdc"        -> (StreamQueries.streamSnapshotCdc _),
    "st7_stream_heavy_hitters" -> (StreamQueries.streamHeavyHitters _),
    "st8_stream_count_min"  -> (StreamQueries.streamCountMin _),
    "st9_stream_throttle"   -> (StreamQueries.streamThrottleDedup _),
    "st11_stream_asof"      -> (StreamQueries.streamToleranceAsOf _),
    "st12_stream_scd2"      -> (StreamQueries.streamScd2 _),
    "st13_stream_hll"       -> (StreamQueries.streamHllRegisters _),
    "st14_stream_hist"      -> (StreamQueries.streamHistQuantile _),
    "st15_stream_kmv"       -> (StreamQueries.streamKmvSketch _),
    "st16_stream_drift"     -> (StreamQueries.streamDrift _),
    "st17_stream_overlap"   -> (StreamQueries.streamOverlapMatrix _),
    "st18_stream_components" -> (StreamQueries.streamComponents _),
    "st19_stream_components_bucketed" -> (StreamQueries.streamComponentsBucketed _),
    "st20_stream_bm25_index" -> (StreamQueries.streamBm25Index _),
    "st21_stream_triangles" -> (StreamQueries.streamTriangleCounts _),
    "st22_stream_corr_moments" -> (StreamQueries.streamCorrMoments _),
    "m1_binary_meta"        -> (TextQueries.binaryMeta _),
    "m4_resize_pipeline"    -> (TextQueries.resizePipeline _),
    "t25_gopher_rules"      -> (TextQueries.gopherRules _),
    "d12_dsir_select"       -> (TextQueries.dsirSelect _),
    "s3_pq_adc"             -> (VectorQueries.pqAdcTopK _),
    "w11_sessionize"        -> (CoreQueries.sessionize _),
    "u1_set_ops"            -> (SqlQueries.setOps _),
    "a11_distinct"          -> (SqlQueries.distinctPairs _),
    "f4_ilike"              -> (SqlQueries.ilikeFilter _),
    "sql1_region_revenue"   -> (SqlQueries.regionRevenueSql _),
    "sql2_nation_profit"    -> (SqlQueries.nationProfitSql _),
    "md1_silver_case_summaries" -> (MedallionQueries.silverCaseSummariesQuery _),
    "md2_gold_speaker_analytics" -> (MedallionQueries.goldSpeakerAnalyticsQuery _),
    "md3_gold_oral_arguments" -> (MedallionQueries.goldOralArgumentsQuery _),
    "k6_xml"                -> (MedallionQueries.xmlSerializationQuery _),
  )

  /** Shared j11/st24 oracle: the full brute-force set-sim join. */
  private val setSimFullOracleSql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                   for i in range(1, len(ws) - 1)]) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 3)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  floor((len(list_intersect(a.s, b.s))::DOUBLE
      |         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))) * 10000 + 0.5) / 10000 AS jaccard
      |FROM sh a JOIN sh b ON b.doc_id > a.doc_id
      |WHERE len(list_intersect(a.s, b.s))::DOUBLE
      |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
      |ORDER BY id_a, id_b""".stripMargin

  /** Shared j10/st25 oracle: the quadratic all-pairs edit-distance
    * join (blocking-completeness proof for the batch face; stream
    * completeness for st25 — every pair surfaces when its later rep
    * arrives). */
  private val fuzzyAllPairsOracleSql: String =
    """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
      |  levenshtein(a.c_name, b.c_name) AS dist
      |FROM customer a JOIN customer b ON b.c_custkey > a.c_custkey
      |WHERE levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY id_a, id_b""".stripMargin

  /** Shared j11b/j11c oracle: brute force over delta-touching pairs. */
  private val setSimDeltaOracleSql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                   for i in range(1, len(ws) - 1)]) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 3)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  floor((len(list_intersect(a.s, b.s))::DOUBLE
      |         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))) * 10000 + 0.5) / 10000 AS jaccard
      |FROM sh a JOIN sh b ON b.doc_id > a.doc_id
      |WHERE (a.doc_id % 10 = 3 OR b.doc_id % 10 = 3)
      |  AND len(list_intersect(a.s, b.s))::DOUBLE
      |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.7
      |ORDER BY id_a, id_b""".stripMargin

  /** Shared q21/st8 oracle: the full count-min replay — hash rows
    * from the shared PolyHash fragment, constants read off
    * ops.Sketches so the engines cannot drift. */
  private lazy val cmOracleSql: String = {
    val h = polyHash64Sql("CAST(user_id AS VARCHAR)")
    val a = graft.ops.Sketches.CmA.take(4).mkString("[", ",", "]")
    val b = graft.ops.Sketches.CmB.take(4).mkString("[", ",", "]")
    val p = graft.ops.Sketches.CmP
    s"""WITH k AS (SELECT user_id, $h AS h
      |           FROM (SELECT DISTINCT user_id FROM events)),
      |pr AS (SELECT unnest([0,1,2,3]) AS j, unnest($a) AS a, unnest($b) AS b),
      |c AS (SELECT pr.j,
      |        ((k.h % $p) * pr.a + pr.b) % $p % 64 AS bucket, count(*) AS cnt
      |      FROM events e, k, pr WHERE e.user_id = k.user_id
      |      GROUP BY 1, 2),
      |q AS (SELECT k.user_id, pr.j,
      |        ((k.h % $p) * pr.a + pr.b) % $p % 64 AS bucket FROM k, pr),
      |est AS (SELECT q.user_id, min(c.cnt) AS est
      |        FROM q JOIN c ON c.j = q.j AND c.bucket = q.bucket GROUP BY 1),
      |ex AS (SELECT user_id, count(*) AS exact FROM events GROUP BY 1)
      |SELECT user_id, est, exact FROM est JOIN ex USING (user_id)
      |ORDER BY user_id""".stripMargin
  }

  /** Shared cdc2/st12/w17 CTE chain: the three deterministic customer
    * snapshots folded into the SCD2 interval table `scd` — the lag/
    * sum-window replay of ops.Scd.scd2 over actual VALUES (the Spark
    * side segments by null-discriminating digest; agreement proves the
    * digest exact). */
  private val scd2Ctes: String =
    """v0 AS (
      |  SELECT c_custkey, c_acctbal, c_mktsegment, 0 AS ver FROM customer),
      |v1 AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0
      |         ELSE c_acctbal END AS c_acctbal,
      |    c_mktsegment, 1 AS ver
      |  FROM customer WHERE c_custkey % 7 != 0
      |  UNION ALL
      |  SELECT c_custkey + 10000000, c_acctbal, c_mktsegment, 1 AS ver
      |  FROM customer WHERE c_custkey % 13 = 0),
      |v2 AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 50.0
      |         ELSE c_acctbal END AS c_acctbal,
      |    c_mktsegment, 2 AS ver
      |  FROM v1 WHERE c_custkey % 11 != 0),
      |u AS (
      |  SELECT * FROM v0 UNION ALL SELECT * FROM v1
      |  UNION ALL SELECT * FROM v2),
      |lg AS (
      |  SELECT *, lag(ver) OVER w AS pv, lag(c_acctbal) OVER w AS pb,
      |    lag(c_mktsegment) OVER w AS ps
      |  FROM u WINDOW w AS (PARTITION BY c_custkey ORDER BY ver)),
      |seg AS (
      |  SELECT *, CASE WHEN pv IS NULL OR pv != ver - 1
      |      OR pb != c_acctbal OR ps != c_mktsegment THEN 1 ELSE 0 END
      |    AS is_new
      |  FROM lg),
      |segid AS (
      |  SELECT *, SUM(is_new) OVER (PARTITION BY c_custkey ORDER BY ver
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
      |  FROM seg),
      |scd AS (
      |  SELECT c_custkey, min(c_acctbal) AS c_acctbal,
      |    min(c_mktsegment) AS c_mktsegment,
      |    min(ver) AS valid_from,
      |    CASE WHEN max(ver) = 2 THEN NULL ELSE max(ver) + 1 END AS valid_to
      |  FROM segid GROUP BY c_custkey, seg)""".stripMargin

  /** cdc2 + st12 oracle: the interval table itself. */
  private lazy val scd2OracleSql: String =
    s"""WITH $scd2Ctes
      |SELECT c_custkey, c_acctbal, c_mktsegment, valid_from, valid_to
      |FROM scd
      |ORDER BY c_custkey, valid_from""".stripMargin

  /** q23 oracle: the FULL-corpus HLL register build replayed in exact
    * integer SQL — PolyHash (shared fragment), bucket = h mod m,
    * rho = trailing-zeros + 1 of h div m via the same CASE ladder as
    * ops.Sketches.hllRho (constants read off Sketches so the engines
    * cannot drift). The incremental store + delta merge on the Spark
    * side must equal this full rebuild because the register merge is
    * lossless — agreement proves the incremental path exactly. The
    * float estimate is contract-checked (within_bound literal true). */
  private lazy val hllOracleSql: String = {
    val m = graft.ops.Sketches.HllM
    val cap = graft.ops.Sketches.HllRhoCap
    val a = graft.ops.Sketches.HllMixA
    val sh = graft.ops.Sketches.HllMixShift
    val h = polyHash64Sql("CAST(l_suppkey AS VARCHAR)")
    val ladder = (1 until cap)
      .map(j => s"WHEN s % ${1L << j} = ${1L << (j - 1)} THEN $j")
      .mkString(" ")
    s"""WITH k AS (SELECT l_returnflag, l_suppkey, $h AS h
      |  FROM (SELECT DISTINCT l_returnflag, l_suppkey FROM lineitem)),
      |m0 AS (SELECT l_returnflag,
      |         ((h // 1073741824) * ${a(0)} + h % 1073741824)
      |           % 2147483648 AS x FROM k),
      |m1 AS (SELECT l_returnflag,
      |         (xor(x, x >> ${sh(0)}) * ${a(1)}) % 2147483648 AS x FROM m0),
      |m2 AS (SELECT l_returnflag,
      |         (xor(x, x >> ${sh(1)}) * ${a(2)}) % 2147483648 AS x FROM m1),
      |mg AS (SELECT l_returnflag, xor(x, x >> ${sh(2)}) AS g FROM m2),
      |sfx AS (SELECT l_returnflag, g % $m AS bucket, g // $m AS s FROM mg),
      |r AS (SELECT l_returnflag, bucket,
      |        max(CASE WHEN s = 0 THEN $cap $ladder ELSE $cap END) AS reg
      |      FROM sfx GROUP BY 1, 2),
      |agg AS (SELECT l_returnflag, count(*) AS n_regs,
      |          CAST(sum(reg) AS BIGINT) AS sum_rho,
      |          CAST(max(reg) AS INTEGER) AS max_rho
      |        FROM r GROUP BY 1),
      |ex AS (SELECT l_returnflag,
      |         count(DISTINCT l_suppkey) AS exact_distinct
      |       FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, n_regs, sum_rho, max_rho, exact_distinct,
      |  true AS within_bound
      |FROM agg JOIN ex USING (l_returnflag)
      |ORDER BY l_returnflag""".stripMargin
  }

  /** q23b oracle: the two-limb 62-bit lane replayed end to end —
    * limb1's three mix rounds, the CHAINED second limb over
    * xor(h, limb1), the 2^31-weighted recombination, and the rho
    * ladder to 56. Every product stays < 2^62, so DuckDB BIGINT
    * arithmetic is exact throughout. */
  private lazy val hll64OracleSql: String = {
    val m = graft.ops.Sketches.HllM
    val cap = graft.ops.Sketches.HllRhoCap64
    val h = polyHash64Sql("CAST(l_suppkey AS VARCHAR)")
    val ladder = (1 until cap)
      .map(j => s"WHEN s % ${1L << j} = ${1L << (j - 1)} THEN $j")
      .mkString(" ")
    s"""WITH k AS (SELECT l_returnflag, $h AS h
      |  FROM (SELECT DISTINCT l_returnflag, l_suppkey FROM lineitem)),
      |${mix64ChainSql("l_returnflag")},
      |sfx AS (SELECT l_returnflag, g % $m AS bucket, g // $m AS s FROM mg),
      |r AS (SELECT l_returnflag, bucket,
      |        max(CASE WHEN s = 0 THEN $cap $ladder ELSE $cap END) AS reg
      |      FROM sfx GROUP BY 1, 2),
      |agg AS (SELECT l_returnflag, count(*) AS n_regs,
      |          CAST(sum(reg) AS BIGINT) AS sum_rho,
      |          CAST(max(reg) AS INTEGER) AS max_rho
      |        FROM r GROUP BY 1),
      |ex AS (SELECT l_returnflag,
      |         count(DISTINCT l_suppkey) AS exact_distinct
      |       FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, n_regs, sum_rho, max_rho, exact_distinct,
      |  true AS within_bound
      |FROM agg JOIN ex USING (l_returnflag)
      |ORDER BY l_returnflag""".stripMargin
  }

  /** The CTE chain of the 62-bit two-limb mix
    * (ops.Sketches.hllMix64) over a prepared `k(grp, h)` frame —
    * shared by the q25/st15 and q26 KMV oracles (q23b inlines the
    * same arithmetic; the constants come off Sketches either way).
    * Produces `mg(grp, g)`. */
  private def mix64ChainSql(grp: String): String = {
    val a = graft.ops.Sketches.HllMixA
    val sh = graft.ops.Sketches.HllMixShift
    s"""m0 AS (SELECT $grp, h,
      |         ((h // 1073741824) * ${a(0)} + h % 1073741824)
      |           % 2147483648 AS x FROM k),
      |m1 AS (SELECT $grp, h,
      |         (xor(x, x >> ${sh(0)}) * ${a(1)}) % 2147483648 AS x FROM m0),
      |m2 AS (SELECT $grp, h,
      |         (xor(x, x >> ${sh(1)}) * ${a(2)}) % 2147483648 AS x FROM m1),
      |g1 AS (SELECT $grp, h, xor(x, x >> ${sh(2)}) AS l1 FROM m2),
      |h2 AS (SELECT $grp, l1, xor(h, l1) AS hx FROM g1),
      |n0 AS (SELECT $grp, l1,
      |         ((hx // 1073741824) * ${a(0)} + hx % 1073741824)
      |           % 2147483648 AS y FROM h2),
      |n1 AS (SELECT $grp, l1,
      |         (xor(y, y >> ${sh(0)}) * ${a(1)}) % 2147483648 AS y FROM n0),
      |n2 AS (SELECT $grp, l1,
      |         (xor(y, y >> ${sh(1)}) * ${a(2)}) % 2147483648 AS y FROM n1),
      |mg AS (SELECT $grp,
      |         l1 * 2147483648 + xor(y, y >> ${sh(2)}) AS g FROM n2)""".stripMargin
  }

  /** Shared q25/st15 oracle: the full-corpus KMV bottom-k replayed in
    * exact integer SQL — the same 62-bit mix as the q23b lane, a
    * DISTINCT over mixed values (the aggregator dedups inside its
    * buffer), and the per-group rank ≤ k. The Spark side's
    * incremental store (q25) and streaming state (st15) must equal
    * this full rebuild because the minK merge is lossless. The float
    * estimate rides the within_bound contract (literal true). */
  private lazy val kmvOracleSql: String = {
    val k = graft.ops.Sketches.KmvK
    val h = polyHash64Sql("CAST(l_suppkey AS VARCHAR)")
    s"""WITH k AS (SELECT l_returnflag, $h AS h
      |  FROM (SELECT DISTINCT l_returnflag, l_suppkey FROM lineitem)),
      |${mix64ChainSql("l_returnflag")},
      |dg AS (SELECT DISTINCT l_returnflag, g FROM mg),
      |rk AS (SELECT l_returnflag, g, row_number() OVER
      |         (PARTITION BY l_returnflag ORDER BY g) AS r FROM dg),
      |sk AS (SELECT l_returnflag, g FROM rk WHERE r <= $k),
      |agg AS (SELECT l_returnflag, count(*) AS n_vals,
      |          min(g) AS min_h, max(g) AS max_h FROM sk GROUP BY 1),
      |ex AS (SELECT l_returnflag,
      |         count(DISTINCT l_suppkey) AS exact_distinct
      |       FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, n_vals, min_h, max_h, exact_distinct,
      |  true AS within_bound
      |FROM agg JOIN ex USING (l_returnflag)
      |ORDER BY l_returnflag""".stripMargin
  }

  /** q26 oracle: both side sketches, the union's bottom-k L, and the
    * L ∩ kmv(A) ∩ kmv(B) membership count replayed in exact integer
    * SQL; exact union/intersection from a distinct-key replay; the
    * Jaccard contract as literal true. */
  private lazy val kmvOverlapOracleSql: String = {
    val k = graft.ops.Sketches.KmvK
    val h = polyHash64Sql("CAST(l_partkey AS VARCHAR)")
    s"""WITH base AS (SELECT DISTINCT CAST(year(l_shipdate) AS BIGINT) AS s,
      |         l_partkey
      |       FROM lineitem WHERE year(l_shipdate) IN (1994, 1995)),
      |k AS (SELECT s, $h AS h FROM base),
      |${mix64ChainSql("s")},
      |dg AS (SELECT DISTINCT s, g FROM mg),
      |rk AS (SELECT s, g, row_number() OVER
      |         (PARTITION BY s ORDER BY g) AS r FROM dg),
      |ska AS (SELECT g FROM rk WHERE s = 1994 AND r <= $k),
      |skb AS (SELECT g FROM rk WHERE s = 1995 AND r <= $k),
      |lu AS (SELECT DISTINCT g FROM
      |        (SELECT g FROM ska UNION ALL SELECT g FROM skb)),
      |l AS (SELECT g FROM (SELECT g, row_number() OVER (ORDER BY g) AS r
      |                     FROM lu) WHERE r <= $k),
      |st AS (SELECT count(*) AS n_l, max(g) AS max_h_l,
      |         count(CASE WHEN g IN (SELECT g FROM ska)
      |                     AND g IN (SELECT g FROM skb) THEN 1 END)
      |           AS n_inter
      |       FROM l),
      |ex AS (SELECT count(*) AS exact_union,
      |         count(CASE WHEN ns = 2 THEN 1 END) AS exact_inter
      |       FROM (SELECT l_partkey, count(DISTINCT s) AS ns
      |             FROM base GROUP BY 1))
      |SELECT n_l, max_h_l, n_inter, exact_inter, exact_union,
      |  true AS within_bound
      |FROM st CROSS JOIN ex""".stripMargin
  }

  /** q26b oracle: [[kmvOverlapOracleSql]]'s sketches and union
    * bottom-k with ONE-SIDED membership counts, and exact a-only /
    * b-only sides from per-partkey year flags. */
  private lazy val kmvDeltaOracleSql: String = {
    val k = graft.ops.Sketches.KmvK
    val h = polyHash64Sql("CAST(l_partkey AS VARCHAR)")
    s"""WITH base AS (SELECT DISTINCT CAST(year(l_shipdate) AS BIGINT) AS s,
      |         l_partkey
      |       FROM lineitem WHERE year(l_shipdate) IN (1994, 1995)),
      |k AS (SELECT s, $h AS h FROM base),
      |${mix64ChainSql("s")},
      |dg AS (SELECT DISTINCT s, g FROM mg),
      |rk AS (SELECT s, g, row_number() OVER
      |         (PARTITION BY s ORDER BY g) AS r FROM dg),
      |ska AS (SELECT g FROM rk WHERE s = 1994 AND r <= $k),
      |skb AS (SELECT g FROM rk WHERE s = 1995 AND r <= $k),
      |lu AS (SELECT DISTINCT g FROM
      |        (SELECT g FROM ska UNION ALL SELECT g FROM skb)),
      |l AS (SELECT g FROM (SELECT g, row_number() OVER (ORDER BY g) AS r
      |                     FROM lu) WHERE r <= $k),
      |st AS (SELECT count(*) AS n_l, max(g) AS max_h_l,
      |         count(CASE WHEN g IN (SELECT g FROM ska)
      |                     AND g NOT IN (SELECT g FROM skb) THEN 1 END)
      |           AS n_a_only,
      |         count(CASE WHEN g IN (SELECT g FROM skb)
      |                     AND g NOT IN (SELECT g FROM ska) THEN 1 END)
      |           AS n_b_only
      |       FROM l),
      |ex AS (SELECT count(*) AS exact_union,
      |         count(CASE WHEN a = 1 AND b = 0 THEN 1 END) AS exact_a_only,
      |         count(CASE WHEN b = 1 AND a = 0 THEN 1 END) AS exact_b_only
      |       FROM (SELECT l_partkey,
      |               max(CASE WHEN s = 1994 THEN 1 ELSE 0 END) AS a,
      |               max(CASE WHEN s = 1995 THEN 1 ELSE 0 END) AS b
      |             FROM base GROUP BY 1))
      |SELECT n_l, max_h_l, n_a_only, n_b_only,
      |  exact_a_only, exact_b_only, exact_union,
      |  true AS within_bound
      |FROM st CROSS JOIN ex""".stripMargin
  }

  /** t15/t15b/st23 oracle: the Efraimidis–Spirakis race replayed in
    * exact arithmetic — the polyHash-derived uniform01 (quadratic
    * finalizer over the two 30-bit halves), the −ln(u)/w race, the
    * bottom-50 by (race, doc_id). */
  private lazy val weightedSampleOracleSql: String =
    s"""WITH hh AS (
       |  SELECT doc_id, source, n_chars, ${polyHash64Sql("w")} AS hv
       |  FROM (SELECT doc_id, source, n_chars,
       |          CAST(doc_id AS VARCHAR) || 'v1' AS w FROM documents)),
       |h AS (
       |  SELECT doc_id, source, n_chars,
       |    -ln((((hv & 1073741823) * (hv & 1073741823) + (hv >> 30))
       |           % 1073741789 + 0.5) / 1073741789.0)
       |      / greatest(n_chars, 1) AS race
       |  FROM hh)
       |SELECT doc_id, source, n_chars
       |FROM (SELECT doc_id, source, n_chars FROM h
       |      ORDER BY race, doc_id LIMIT 50)
       |ORDER BY doc_id""".stripMargin

  /** q26c oracle: the fine-regime (k = 256) overlap replay — three
    * key-space band slices of o_orderkey, per-slice bottom-k at BOTH
    * k = 256 and k = 32, per-pair union bottom-k with two-sided
    * membership counts, exact churn-band intersection from the
    * modulus directly. All integer except the contract (literal
    * true). */
  private lazy val kmvFineOracleSql: String = {
    val h = polyHash64Sql("CAST(o_orderkey AS VARCHAR)")
    s"""WITH mk AS (SELECT o_orderkey, o_orderkey % 1000 AS m FROM orders),
      |sl AS (SELECT 'a' AS s, o_orderkey FROM mk WHERE m < 550
      |  UNION ALL SELECT 'b10', o_orderkey FROM mk WHERE m >= 450
      |  UNION ALL SELECT 'b01', o_orderkey FROM mk WHERE m >= 540),
      |k AS (SELECT s, $h AS h FROM (SELECT DISTINCT s, o_orderkey FROM sl)),
      |${mix64ChainSql("s")},
      |dg AS (SELECT DISTINCT s, g FROM mg),
      |rk AS (SELECT s, g, row_number() OVER
      |         (PARTITION BY s ORDER BY g) AS r FROM dg),
      |pairs AS (SELECT 'snap_j10' AS pair, 'b10' AS sb
      |          UNION ALL SELECT 'snap_j01', 'b01'),
      |ska AS (SELECT g, r FROM rk WHERE s = 'a' AND r <= 256),
      |skb AS (SELECT pair, g, r FROM pairs p
      |        JOIN rk ON rk.s = p.sb WHERE r <= 256),
      |lu AS (SELECT DISTINCT pair, g FROM
      |        (SELECT pair, g FROM skb
      |         UNION ALL SELECT pair, g FROM pairs CROSS JOIN ska)),
      |l AS (SELECT pair, g FROM
      |       (SELECT pair, g, row_number() OVER
      |          (PARTITION BY pair ORDER BY g) AS r FROM lu) WHERE r <= 256),
      |st AS (SELECT l.pair, count(*) AS n_l, max(l.g) AS max_h_l,
      |         count(CASE WHEN ia.g IS NOT NULL AND ib.g IS NOT NULL
      |                    THEN 1 END) AS n_inter
      |       FROM l
      |       LEFT JOIN (SELECT g FROM ska) ia ON l.g = ia.g
      |       LEFT JOIN (SELECT pair, g FROM skb) ib
      |         ON l.pair = ib.pair AND l.g = ib.g
      |       GROUP BY 1),
      |lu32 AS (SELECT DISTINCT pair, g FROM
      |          (SELECT pair, g FROM skb WHERE r <= 32
      |           UNION ALL SELECT pair, g FROM pairs
      |             CROSS JOIN (SELECT g FROM ska WHERE r <= 32))),
      |l32 AS (SELECT pair, g FROM
      |         (SELECT pair, g, row_number() OVER
      |            (PARTITION BY pair ORDER BY g) AS r FROM lu32) WHERE r <= 32),
      |st32 AS (SELECT l32.pair, count(*) AS n_l32,
      |           count(CASE WHEN ia.g IS NOT NULL AND ib.g IS NOT NULL
      |                      THEN 1 END) AS n_inter32
      |         FROM l32
      |         LEFT JOIN (SELECT g FROM ska WHERE r <= 32) ia ON l32.g = ia.g
      |         LEFT JOIN (SELECT pair, g FROM skb WHERE r <= 32) ib
      |           ON l32.pair = ib.pair AND l32.g = ib.g
      |         GROUP BY 1),
      |ex AS (SELECT 'snap_j10' AS pair,
      |         count(DISTINCT o_orderkey) AS exact_union,
      |         count(DISTINCT CASE WHEN m >= 450 AND m < 550
      |                        THEN o_orderkey END) AS exact_inter FROM mk
      |  UNION ALL SELECT 'snap_j01', count(DISTINCT o_orderkey),
      |         count(DISTINCT CASE WHEN m >= 540 AND m < 550
      |                        THEN o_orderkey END) FROM mk)
      |SELECT pair, n_l, max_h_l, n_inter, n_l32, n_inter32,
      |  exact_inter, exact_union, true AS within_bound
      |FROM st JOIN st32 USING (pair) JOIN ex USING (pair)
      |ORDER BY pair""".stripMargin
  }

  /** ov1 oracle: the full matrix replayed — per-source distinct
    * word-3-shingles (the d4 fragment), the 62-bit mix, per-source
    * bottom-k, per-pair union bottom-k with membership flags, and the
    * exact pairwise intersection/union over shingle STRINGS. All
    * integer except the contract (literal true). */
  /** d7/d7b oracle: the recursive-CC components plus the keep-best
    * (n_chars desc, smallest id) survivorship readout. */
  private lazy val survivorsOracleSql: String =
    componentsCte +
      """,
        |ranked AS (
        |  SELECT c.component, d.doc_id,
        |    row_number() OVER (PARTITION BY c.component
        |                       ORDER BY d.n_chars DESC, d.doc_id) AS rn
        |  FROM documents d JOIN comp c ON d.doc_id = c.node)
        |SELECT component,
        |  min(CASE WHEN rn = 1 THEN doc_id END) AS keep_id,
        |  count(*) AS n_members
        |FROM ranked GROUP BY component ORDER BY component""".stripMargin

  /** tc1/tc2/st21 oracle: the triangle-count replay — ONE string so
    * the three "same oracle VERBATIM" registrations are identical by
    * construction. */
  private lazy val triangleOracleSql: String =
    s"""WITH $tradeEdgesCte,
      |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |        FROM e0 e1 JOIN e0 e2 ON e2.u = e1.v
      |                   JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v)
      |SELECT node, count(*) AS n_tri
      |FROM (SELECT unnest([a, b, c]) AS node FROM tri)
      |GROUP BY node ORDER BY n_tri DESC, node LIMIT 20""".stripMargin

  /** cm1b/st22 oracle: the moment replay — exact DECIMAL sums over
    * the full lineitem, then the IDENTICAL fixed-association double
    * formula (the moments cast to double once, `n*Sxy - Sx*Sy` over
    * `sqrt(va*vb)`), so both engines compute the same doubles from
    * the same exact inputs. */
  private lazy val corrMomentsOracleSql: String = {
    val cols = graft.analytics.ProfileQueries.CorrCols
    def dc(c: String) = s"CAST($c AS DECIMAL(18,2))"
    val sums = cols.map(c => s"sum(${dc(c)}) AS s_$c") ++
      (for { i <- cols.indices; j <- cols.indices if i <= j }
        yield s"sum(${dc(cols(i))} * ${dc(cols(j))}) AS q_${cols(i)}__${cols(j)}")
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j }
      yield (cols(i), cols(j))
    def d(x: String) = s"CAST($x AS DOUBLE)"
    val rows = pairs.map { case (a, b) =>
      val num = s"${d("n")} * ${d(s"q_${a}__$b")} - ${d(s"s_$a")} * ${d(s"s_$b")}"
      val va = s"${d("n")} * ${d(s"q_${a}__$a")} - ${d(s"s_$a")} * ${d(s"s_$a")}"
      val vb = s"${d("n")} * ${d(s"q_${b}__$b")} - ${d(s"s_$b")} * ${d(s"s_$b")}"
      s"SELECT '$a' AS col_a, '$b' AS col_b,\n" +
        s"    (($num) / sqrt(($va) * ($vb))) AS cr FROM m"
    }.mkString("\n  UNION ALL ")
    s"""WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |  ${sums.mkString(",\n  ")}
       |  FROM lineitem),
       |u AS (
       |  $rows)
       |SELECT col_a, col_b,
       |  floor(cr * 1000000 + 0.5) / 1000000 AS corr
       |FROM u ORDER BY col_a, col_b""".stripMargin
  }

  private lazy val kmvMatrixOracleSql: String = kmvMatrixOracle("")

  /** ov2's oracle = ov1's with the prescreen replayed as an EXISTS on
    * the pair CTE: only pairs whose bottom-k sketches share a hash. */
  private lazy val kmvMatrixSparseOracleSql: String = kmvMatrixOracle(
    """
      |          WHERE EXISTS (SELECT 1 FROM sk x JOIN sk y ON x.g = y.g
      |                        WHERE x.source = a.source
      |                          AND y.source = b.source)""".stripMargin)

  private def kmvMatrixOracle(pairFilter: String): String = {
    val k = graft.ops.Sketches.KmvK
    val h = polyHash64Sql("sh")
    s"""WITH sh0 AS (
      |  SELECT source,
      |    list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                   for i in range(1, len(ws) - 1)]) AS s
      |  FROM (SELECT source, string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 3),
      |d AS (SELECT DISTINCT source, unnest(s) AS sh FROM sh0),
      |k AS (SELECT source, $h AS h FROM d),
      |${mix64ChainSql("source")},
      |dg AS (SELECT DISTINCT source, g FROM mg),
      |rk AS (SELECT source, g, row_number() OVER
      |         (PARTITION BY source ORDER BY g) AS r FROM dg),
      |sk AS (SELECT source, g FROM rk WHERE r <= $k),
      |srcs AS (SELECT DISTINCT source FROM sk),
      |pairs AS (SELECT a.source AS src_a, b.source AS src_b
      |          FROM srcs a JOIN srcs b ON a.source < b.source$pairFilter),
      |u AS (SELECT p.src_a, p.src_b, s.g,
      |        max(CASE WHEN s.source = p.src_a THEN 1 ELSE 0 END) AS ina,
      |        max(CASE WHEN s.source = p.src_b THEN 1 ELSE 0 END) AS inb
      |      FROM pairs p JOIN sk s
      |        ON s.source = p.src_a OR s.source = p.src_b
      |      GROUP BY 1, 2, 3),
      |lk AS (SELECT src_a, src_b, g, ina, inb, row_number() OVER
      |         (PARTITION BY src_a, src_b ORDER BY g) AS r FROM u),
      |st AS (SELECT src_a, src_b, count(*) AS n_l, max(g) AS max_h_l,
      |         count(CASE WHEN ina = 1 AND inb = 1 THEN 1 END) AS n_inter
      |       FROM lk WHERE r <= $k GROUP BY 1, 2),
      |nx AS (SELECT source, count(*) AS n FROM d GROUP BY 1),
      |ix AS (SELECT a.source AS src_a, b.source AS src_b,
      |         count(*) AS exact_inter
      |       FROM d a JOIN d b ON a.sh = b.sh AND a.source < b.source
      |       GROUP BY 1, 2),
      |ex AS (SELECT p.src_a, p.src_b,
      |         coalesce(ix.exact_inter, 0) AS exact_inter,
      |         na.n + nb.n - coalesce(ix.exact_inter, 0) AS exact_union
      |       FROM pairs p
      |       LEFT JOIN ix ON ix.src_a = p.src_a AND ix.src_b = p.src_b
      |       JOIN nx na ON na.source = p.src_a
      |       JOIN nx nb ON nb.source = p.src_b)
      |SELECT st.src_a, st.src_b, n_l, max_h_l, n_inter,
      |  exact_inter, exact_union, true AS within_bound
      |FROM st JOIN ex ON ex.src_a = st.src_a AND ex.src_b = st.src_b
      |ORDER BY st.src_a, st.src_b""".stripMargin
  }

  /** Shared ks1/st16 oracle: binned drift replay — same fixed 20-bin
    * split (clamped at BOTH ends), eps clamp, explicit NULL-value
    * counts, cumulative KS and PSI (ln, not log10). Count sums CAST
    * to BIGINT (DuckDB sum widens to HUGEINT). The streaming face
    * gates on the same string because bin counts sum-merge
    * losslessly. */
  private lazy val driftOracleSql: String =
    """WITH b0 AS (
      |  SELECT o_totalprice AS v,
      |    CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
      |         THEN 1 ELSE 0 END AS in_a
      |  FROM orders),
      |nn AS (SELECT CAST(coalesce(sum(in_a), 0) AS BIGINT) AS n_null_a,
      |         CAST(coalesce(sum(1 - in_a), 0) AS BIGINT) AS n_null_b
      |       FROM b0 WHERE v IS NULL),
      |b AS (
      |  SELECT greatest(least(floor(v / 25000), 19), 0) AS bin, in_a
      |  FROM b0 WHERE v IS NOT NULL),
      |g AS (SELECT bin, CAST(sum(in_a) AS BIGINT) AS cnt_a,
      |        CAST(sum(1 - in_a) AS BIGINT) AS cnt_b
      |      FROM b GROUP BY bin),
      |t AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a,
      |        CAST(sum(cnt_b) AS BIGINT) AS n_b FROM g),
      |c AS (SELECT bin,
      |        greatest(CAST(cnt_a AS DOUBLE) / n_a, 0.000001) AS share_a,
      |        greatest(CAST(cnt_b AS DOUBLE) / n_b, 0.000001) AS share_b,
      |        CAST(sum(cnt_a) OVER (ORDER BY bin
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |          AS DOUBLE) / n_a AS cum_a,
      |        CAST(sum(cnt_b) OVER (ORDER BY bin
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |          AS DOUBLE) / n_b AS cum_b,
      |        n_a, n_b
      |      FROM g CROSS JOIN t)
      |SELECT min(n_a) AS n_a, min(n_b) AS n_b,
      |  floor(max(abs(cum_a - cum_b)) * 1000000 + 0.5) / 1000000 AS ks_stat,
      |  floor(sum((share_a - share_b) * ln(share_a / share_b))
      |    * 1000000 + 0.5) / 1000000 AS psi,
      |  min(n_null_a) AS n_null_a, min(n_null_b) AS n_null_b
      |FROM c CROSS JOIN nn""".stripMargin

  /** Shared q24/st14 oracle: the full-rebuild histogram + the same
    * integer window arithmetic as ops.Sketches.histMedianBin; the
    * bracket booleans are COMPUTED from raw rows on both engines, so
    * a store that drifted from the data fails even though bins and
    * readout agree with each other. */
  private lazy val histOracleSql: String =
    """WITH b AS (
      |  SELECT l_returnflag,
      |    CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS bin,
      |    count(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (
      |  SELECT l_returnflag, bin, cnt,
      |    sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(cnt) OVER (PARTITION BY l_returnflag) AS n
      |  FROM b),
      |m AS (
      |  SELECT l_returnflag, min(bin) AS median_bin,
      |    CAST(min(n) AS BIGINT) AS n, CAST(min((n + 1) // 2) AS BIGINT) AS k
      |  FROM c WHERE cum >= (n + 1) // 2 GROUP BY 1),
      |j AS (
      |  SELECT l.l_returnflag, l.l_extendedprice, m.median_bin, m.n, m.k,
      |    m.median_bin * 1000.0 AS bin_lo,
      |    (m.median_bin + 1) * 1000.0 AS bin_hi
      |  FROM lineitem l JOIN m USING (l_returnflag))
      |SELECT l_returnflag, min(median_bin) AS median_bin,
      |  min(bin_lo) AS bin_lo, min(bin_hi) AS bin_hi, min(n) AS n,
      |  (count(CASE WHEN l_extendedprice < bin_lo THEN 1 END) < min(k))
      |    AND (count(CASE WHEN l_extendedprice < bin_hi THEN 1 END) >= min(k))
      |    AS brackets_median
      |FROM j GROUP BY 1
      |ORDER BY l_returnflag""".stripMargin

  /** Shared tc1/gc1 graph CTEs: supplier co-occurrence pairs
    * sparsified to the top-20% by co-count (ties kept). The oracle's
    * ORDER BY/LIMIT threshold is semantically identical to the Spark
    * side's histogram read-off (thr = max v with |{n >= v}| >= k). */
  private val tradeEdgesCte: String =
    """sp AS (SELECT DISTINCT l_orderkey k, l_suppkey s FROM lineitem),
      |co AS MATERIALIZED (SELECT a.s AS u, b.s AS v, count(*) AS n
      |       FROM sp a JOIN sp b ON a.k = b.k AND a.s < b.s GROUP BY 1, 2),
      |thr AS (SELECT min(n) AS t FROM (SELECT n FROM co ORDER BY n DESC
      |        LIMIT (SELECT CAST(ceil(0.2 * count(*)) AS BIGINT) FROM co))),
      |e0 AS MATERIALIZED (SELECT u, v FROM co, thr WHERE n >= t)""".stripMargin

  /** DuckDB reproduction of graft.functions.PolyHash: polynomial fold
    * over code points, `(h * mult + cp) mod prime`. */
  private def polyHashSql(mult: Int, prime: Long, in: String = "w"): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, len($in)+1), i -> CAST(unicode(substr($in, i, 1)) AS BIGINT))), " +
      s"(h, c) -> (h * $mult + c) % $prime)"

  /** Full packed PolyHash of a SQL string expression. */
  private def polyHash64Sql(in: String): String =
    s"(${polyHashSql(31, 1073741789L, in)} * 1073741824 + ${polyHashSql(37, 1073741783L, in)})"

  /** DuckDB reproduction of graft.ops.Layout.mortonCode: the same
    * saturate + shift/mask/interleave arithmetic, term by term. */
  private def mortonSql(x: String, y: String, bits: Int = 16): String = {
    val cap = (1L << bits) - 1
    (0 until bits).flatMap { i =>
      Seq(s"(((least($x, $cap) >> $i) & 1) << ${2 * i})",
          s"(((least($y, $cap) >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(CAST(", " + ", " AS BIGINT))")
  }

  /** Brute-force word-3-shingle Jaccard pairs at ≥ 0.8 — the oracle
    * for BOTH the batch MinHash+LSH near-dup (d2) and its streaming
    * face (st5, single AvailableNow batch vs empty store): banding at
    * 32/8 has ~1-1e-6 recall at J ≥ 0.9 and the corpus's planted
    * near-dups sit at J ≥ 0.95 with a cliff to ≤ 0.1, so LSH+verify
    * equals brute force on this data. */
  private val minhashBruteOracleSql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                   for i in range(1, len(ws) - 1)]) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 3)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  floor((len(list_intersect(a.s, b.s))::DOUBLE
      |         / len(list_distinct(a.s || b.s))) * 10000 + 0.5) / 10000 AS jaccard
      |FROM sh a JOIN sh b ON b.doc_id > a.doc_id
      |WHERE len(list_intersect(a.s, b.s))::DOUBLE
      |      / len(list_distinct(a.s || b.s)) >= 0.8
      |ORDER BY id_a, id_b""".stripMargin

  /** Full SimHash pipeline in DuckDB SQL (signatures, 15-bit bands,
    * Hamming verify) — generated to keep the 60 vote columns in exact
    * lockstep with graft.ops.Dedup.simHashSignatures. */
  private lazy val simhashOracleSql: String = {
    val bits = graft.ops.Dedup.SimHashBits
    val votes = (0 until bits)
      .map(i => s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS v$i")
      .mkString(",\n    ")
    val sigTerms = (0 until bits)
      .map(i => s"CASE WHEN v$i > 0 THEN ${1L << i} ELSE 0 END")
      .mkString(" + ")
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
       |), hashed AS (
       |  SELECT doc_id,
       |    ${polyHashSql(31, 1073741789L)} * 1073741824
       |    + ${polyHashSql(37, 1073741783L)} AS h
       |  FROM words
       |), votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM hashed GROUP BY doc_id
       |), sigs AS (
       |  SELECT doc_id, CAST($sigTerms AS BIGINT) AS sig FROM votes
       |), banded AS (
       |  SELECT doc_id, sig, band, (sig >> (band * 15)) & 32767 AS band_val
       |  FROM sigs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) t
       |)
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
       |FROM banded a
       |JOIN banded b ON a.band = b.band AND a.band_val = b.band_val
       |  AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** WIDE SimHash oracle (d3b): two independent PolyHash lanes (120
    * vote columns), band width derived from the corpus count with the
    * same integer rule as graft.ops.Dedup.simHashBandWidthFor
    * (`least(30, length(bin(n - 1)) + 5)` — bin() is bit-identical in
    * Spark and DuckDB, no floating-point log), four bands at lane
    * offsets {0, w}, Hamming summed across lanes. */
  private lazy val simhashWideOracleSql: String = {
    val bits = graft.ops.Dedup.SimHashBits
    def votes(h: String, lane: Int) = (0 until bits)
      .map(i => s"sum(CASE WHEN ($h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS v${lane}_$i")
      .mkString(",\n    ")
    def sigTerms(lane: Int) = (0 until bits)
      .map(i => s"CASE WHEN v${lane}_$i > 0 THEN ${1L << i} ELSE 0 END")
      .mkString(" + ")
    s"""WITH nw AS (
       |  SELECT least(30, length(bin(count(*) - 1)) + 5) AS w FROM documents
       |), words AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
       |), hashed AS (
       |  SELECT doc_id,
       |    ${polyHashSql(31, 1073741789L)} * 1073741824
       |    + ${polyHashSql(37, 1073741783L)} AS h0,
       |    ${polyHashSql(41, 1073741741L)} * 1073741824
       |    + ${polyHashSql(43, 1073741723L)} AS h1
       |  FROM words
       |), votes AS (
       |  SELECT doc_id,
       |    ${votes("h0", 0)},
       |    ${votes("h1", 1)}
       |  FROM hashed GROUP BY doc_id
       |), sigs AS (
       |  SELECT doc_id, CAST(${sigTerms(0)} AS BIGINT) AS sig0,
       |    CAST(${sigTerms(1)} AS BIGINT) AS sig1 FROM votes
       |), banded AS (
       |  SELECT doc_id, sig0, sig1, band,
       |    CASE band
       |      WHEN 0 THEN sig0 & ((CAST(1 AS BIGINT) << w) - 1)
       |      WHEN 1 THEN (sig0 >> w) & ((CAST(1 AS BIGINT) << w) - 1)
       |      WHEN 2 THEN sig1 & ((CAST(1 AS BIGINT) << w) - 1)
       |      ELSE (sig1 >> w) & ((CAST(1 AS BIGINT) << w) - 1) END AS band_val
       |  FROM sigs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) t CROSS JOIN nw
       |)
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sig0, b.sig0))
       |    + bit_count(xor(a.sig1, b.sig1)) AS INTEGER) AS hamming
       |FROM banded a
       |JOIN banded b ON a.band = b.band AND a.band_val = b.band_val
       |  AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig0, b.sig0)) + bit_count(xor(a.sig1, b.sig1)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Incremental SimHash oracle (d3c): the full-corpus signature/band
    * replay of d3, restricted to delta-touching pairs — identical to
    * the store+delta band join because signatures are a pure function
    * of the text (the store just avoids recomputing them). */
  private lazy val simhashIncrementalOracleSql: String = {
    val bits = graft.ops.Dedup.SimHashBits
    val votes = (0 until bits)
      .map(i => s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS v$i")
      .mkString(",\n    ")
    val sigTerms = (0 until bits)
      .map(i => s"CASE WHEN v$i > 0 THEN ${1L << i} ELSE 0 END")
      .mkString(" + ")
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
       |), hashed AS (
       |  SELECT doc_id,
       |    ${polyHashSql(31, 1073741789L)} * 1073741824
       |    + ${polyHashSql(37, 1073741783L)} AS h
       |  FROM words
       |), votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM hashed GROUP BY doc_id
       |), sigs AS (
       |  SELECT doc_id, CAST($sigTerms AS BIGINT) AS sig FROM votes
       |), banded AS (
       |  SELECT doc_id, sig, band, (sig >> (band * 15)) & 32767 AS band_val
       |  FROM sigs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) t
       |)
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
       |FROM banded a
       |JOIN banded b ON a.band = b.band AND a.band_val = b.band_val
       |  AND a.doc_id < b.doc_id
       |WHERE (a.doc_id % 10 = 3 OR b.doc_id % 10 = 3)
       |  AND bit_count(xor(a.sig, b.sig)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Shared CTE prefix for the component oracles: d2's verified pair
    * set, symmetrized, transitively closed (recursive CTE), min-label
    * per node — the SQL mirror of Dedup.connectedComponents. */
  /** The del1/del2/del3 oracle transform: the SAME base oracle, with
    * the deleted docs (doc_id % 10 == 3) filtered out of the shingle
    * CTE — a full rebuild over corpus-minus-deleted. Anchored on the
    * shingle length guard so the base oracles can never silently
    * drift apart from their takedown variants. */
  private def withoutDeletedDocs(sql: String): String = {
    val anchor = "WHERE len(ws) >= 3"
    require(sql.contains(anchor),
      "takedown oracle: shingle filter anchor not found in base oracle")
    sql.replace(anchor, anchor + " AND doc_id % 10 <> 3")
  }

  /** c3 (and c3b verbatim): the four-family training-mix manifest
    * replayed end to end in SQL — Gopher gate, brute near-dup pairs,
    * recursive CC, survivorship, 60% budget, temperature
    * apportionment, PolyHash-ranked selection. */
  private lazy val c3OracleSql: String = {
    val selHash = polyHash64Sql("CAST(doc_id AS VARCHAR) || 'c3'")
    s"""WITH RECURSIVE g AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id,
        |      CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS wc,
        |      len(regexp_replace(text, '\\s', '', 'g'))::DOUBLE AS nonspace,
        |      len(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE AS alpha,
        |      len(list_intersect(list_distinct(regexp_split_to_array(trim(text), '\\s+')),
        |          ['the','of','and','to','in','a','is','that','for','it'])) AS swh
        |    FROM documents)
        |  WHERE (wc BETWEEN 30 AND 100000)
        |    AND (nonspace / nullif(wc::DOUBLE, 0.0) BETWEEN 4.0 AND 5.0)
        |    AND swh >= 2 AND alpha / nullif(nonspace, 0.0) >= 0.6),
        |p0 AS MATERIALIZED (SELECT d.* FROM documents d JOIN g USING (doc_id)),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |                   for i in range(1, len(ws) - 1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM p0)
        |  WHERE len(ws) >= 3),
        |prs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON b.doc_id > a.doc_id
        |  WHERE len(list_intersect(a.s, b.s))::DOUBLE
        |        / len(list_distinct(a.s || b.s)) >= 0.8),
        |undirected AS (
        |  SELECT id_a AS a, id_b AS b FROM prs
        |  UNION SELECT id_b, id_a FROM prs),
        |reach AS (
        |  SELECT a, a AS b FROM (SELECT DISTINCT a FROM undirected)
        |  UNION
        |  SELECT r.a, u.b FROM reach r JOIN undirected u ON r.b = u.a),
        |comp AS (SELECT a AS node, min(b) AS component FROM reach GROUP BY a),
        |mem AS (SELECT p0.doc_id AS node, p0.n_chars, c.component
        |        FROM p0 JOIN comp c ON p0.doc_id = c.node),
        |drops AS (SELECT node FROM (
        |    SELECT node, row_number() OVER (PARTITION BY component
        |      ORDER BY n_chars DESC, node) AS rn FROM mem) WHERE rn > 1),
        |pool AS MATERIALIZED (
        |  SELECT * FROM p0 WHERE doc_id NOT IN (SELECT node FROM drops)),
        |nb AS (SELECT count(*) * 6 // 10 AS budget FROM pool),
        |cts AS (SELECT source, count(*) AS n_docs FROM pool GROUP BY source),
        |z AS (SELECT sum(pow(n_docs, 0.7)) AS z FROM cts),
        |q AS (SELECT source, n_docs,
        |        floor((pow(n_docs, 0.7) / z * (SELECT budget FROM nb)) * 1000000 + 0.5) / 1000000 AS quota
        |      FROM cts, z),
        |f AS (SELECT source, n_docs, quota,
        |        CAST(floor(quota) AS BIGINT) AS fl, quota - floor(quota) AS fr
        |      FROM q),
        |l AS (SELECT (SELECT budget FROM nb) - sum(fl) AS lft FROM f),
        |aa AS (SELECT f.source, f.n_docs, f.quota, f.fl,
        |        (SELECT count(*) FROM f gg
        |         WHERE gg.fr > f.fr OR (gg.fr = f.fr AND gg.source < f.source)) AS ahead,
        |        (SELECT count(*) FROM f gg
        |         WHERE gg.fl >= 1 AND (gg.fr < f.fr OR (gg.fr = f.fr AND gg.source < f.source))) AS takr
        |      FROM f),
        |al AS (SELECT source, n_docs, quota,
        |        CASE WHEN (SELECT lft FROM l) >= 0
        |          THEN fl + CASE WHEN ahead < (SELECT lft FROM l) THEN 1 ELSE 0 END
        |          ELSE fl - CASE WHEN fl >= 1 AND takr < -(SELECT lft FROM l) THEN 1 ELSE 0 END
        |        END AS alloc
        |      FROM aa),
        |selr AS (SELECT doc_id, source,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY $selHash, doc_id) AS rn
        |      FROM pool),
        |sel AS (SELECT s.source, count(*) AS n_selected,
        |        CAST(sum(s.doc_id) AS BIGINT) AS sum_sel_ids
        |      FROM selr s JOIN al ON s.source = al.source AND s.rn <= al.alloc
        |      GROUP BY s.source)
      |SELECT al.source, al.n_docs AS n_pool, al.quota, al.alloc,
      |  coalesce(sel.n_selected, 0) AS n_selected,
      |  coalesce(sel.sum_sel_ids, 0) AS sum_sel_ids
      |FROM al LEFT JOIN sel ON al.source = sel.source
      |ORDER BY al.source""".stripMargin
  }

  private val componentsCte: String =
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id,
      |    list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                   for i in range(1, len(ws) - 1)]) AS s
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 3),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sh a JOIN sh b ON b.doc_id > a.doc_id
      |  WHERE len(list_intersect(a.s, b.s))::DOUBLE
      |        / len(list_distinct(a.s || b.s)) >= 0.8),
      |undirected AS (
      |  SELECT id_a AS a, id_b AS b FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |reach AS (
      |  SELECT a, a AS b FROM (SELECT DISTINCT a FROM undirected)
      |  UNION
      |  SELECT r.a, u.b FROM reach r JOIN undirected u ON r.b = u.a),
      |comp AS (SELECT a AS node, min(b) AS component FROM reach GROUP BY a)""".stripMargin

  /** Oracle for the approximate ANN query: the LSH is fully
    * deterministic (seeded hyperplanes), so the oracle reproduces the
    * exact signatures/probes/candidates by inlining the hyperplane
    * values as double literals (shortest-roundtrip representation —
    * DuckDB parses them to bit-identical doubles) and ranking with the
    * same dot-product arithmetic. */
  /** The seeded sign-random-projection signature of a DOUBLE[] column
    * `v`, as DuckDB SQL — hyperplanes inlined as shortest-roundtrip
    * double literals (parse to identical bits). */
  private def annSigExprSql(nBits: Int): String = {
    val lsh = new graft.ops.Similarity.SignRandomProjectionLsh(dim = 64, nBits = nBits)
    def vecLit(v: Array[Double]): String = v.mkString("[", ", ", "]")
    lsh.hyperplanes.zipWithIndex.map { case (h, i) =>
      s"(CASE WHEN list_dot_product(v, ${vecLit(h)}) > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString("(", "\n      + ", ")")
  }

  private def annOracleSqlFor(nBits: Int): String = {
    val sigExpr = annSigExprSql(nBits)
    val probeList = (Seq("sig") ++ (0 until nBits).map(i => s"xor(sig, ${1 << i})"))
      .mkString("[", ", ", "]")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), sigs AS (
       |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
       |    $sigExpr AS sig
       |  FROM e
       |), probes AS (
       |  SELECT vec_id AS query_id, v AS qv, nrm AS qn, unnest($probeList) AS psig
       |  FROM sigs WHERE vec_id < 20
       |), cand AS (
       |  SELECT DISTINCT p.query_id, s.vec_id AS cand_id, p.qv, p.qn, s.v AS cv, s.nrm AS cn
       |  FROM probes p JOIN sigs s ON p.psig = s.sig AND s.vec_id <> p.query_id
       |), sims AS (
       |  SELECT query_id, cand_id,
       |    list_dot_product(qv, cv) / nullif(qn * cn, 0.0) AS cosine
       |  FROM cand
       |), ranked AS (
       |  SELECT query_id, cand_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, cand_id) AS rank
       |  FROM sims)
       |SELECT query_id, cand_id,
       |  floor(cosine * 1000000 + 0.5) / 1000000 AS cosine,
       |  CAST(rank AS INTEGER) AS rank
       |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** Oracle for the approximate ANN query (in-memory s1, 10-bit). */
  private lazy val annOracleSql: String = annOracleSqlFor(10)
  /** Oracle for the persisted-index ANN query (s1b, 8-bit): identical
    * math — the index is a physical layout, not a semantic change. */
  private lazy val annPersistedOracleSql: String = annOracleSqlFor(8)

  /** Oracle for the s1b index BUILD: the written index's per-signature
    * bucket histogram must match the replayed signature math. */
  private lazy val annBuildOracleSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), sigs AS (
       |  SELECT CAST(${annSigExprSql(8)} AS INTEGER) AS sig FROM e)
       |SELECT sig, count(*) AS n_vectors
       |FROM sigs GROUP BY sig ORDER BY sig""".stripMargin

  /** t9 oracle: identical planted-PII string, identical regexes (the
    * graft.ops.Pii constants are RE2-and-Java-portable by design),
    * identical redaction order — and, like graft.ops.Pii.counts, each
    * kind counted on the text with earlier kinds already redacted, so
    * counts are exact redaction tallies. */
  private lazy val piiOracleSql: String = {
    import graft.ops.Pii.{EmailRe, PhoneRe, Ipv4Re}
    s"""WITH t AS (
       |  SELECT doc_id, text ||
       |    CASE WHEN doc_id % 4 = 0 THEN ' reach me at user' || doc_id || '@example.com'
       |         WHEN doc_id % 4 = 1 THEN ' call 555-123-4567 now'
       |         WHEN doc_id % 4 = 2 THEN ' from host 10.0.' || (doc_id % 256) || '.7'
       |         ELSE '' END AS t2
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, t2,
       |    regexp_replace(t2, '$EmailRe', '<EMAIL>', 'g') AS after_emails,
       |    regexp_replace(regexp_replace(t2, '$EmailRe', '<EMAIL>', 'g'),
       |      '$PhoneRe', '<PHONE>', 'g') AS after_phones
       |  FROM t)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t2, '$EmailRe')) AS INTEGER) AS n_emails,
       |  CAST(len(regexp_extract_all(after_emails, '$PhoneRe')) AS INTEGER) AS n_phones,
       |  CAST(len(regexp_extract_all(after_phones, '$Ipv4Re')) AS INTEGER) AS n_ips,
       |  regexp_replace(after_phones, '$Ipv4Re', '<IP>', 'g') AS redacted
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** r1 oracle: the BM25 pipeline reproduced in SQL. Every float
    * constant is interpolated from the Scala definition (round-trip
    * decimal representation → bit-identical doubles), every float op
    * is written in the same association order as the Spark
    * expressions, and the per-term scores are summed in the fixed
    * `BmTerms` order — so the only engine difference left is ln()'s
    * last ulp, absorbed by the 4-decimal exact round. */
  /** svd1 oracle: the full 3-round power iteration unrolled as CTEs —
    * each round computes s = x·v (list_dot_product against the
    * previous QUANTIZED iterate, bit-identical on both engines),
    * u = Σ s·x per dim, sign-flips on u[1] < 0, normalizes, and
    * quantizes to the 1e-6 grid exactly as graft.ops.Svd does. The
    * uniform 1/8 start is binary-exact. */
  private lazy val svdOracleSql: String = {
    val dim = 64
    val v0 = s"CAST([${Seq.fill(dim)("0.125").mkString(", ")}] AS DOUBLE[])"
    def round(t: Int, vexpr: String): String =
      s"""s$t AS (SELECT vec_id, list_dot_product(v, $vexpr) AS s FROM e),
         |u$t AS (
         |  SELECT dim, sum(s * val) AS uv FROM (
         |    SELECT s$t.s AS s, generate_subscripts(e.v, 1) AS dim,
         |           unnest(e.v) AS val
         |    FROM e JOIN s$t USING (vec_id))
         |  GROUP BY dim),
         |f$t AS (
         |  SELECT dim, CASE WHEN (SELECT uv FROM u$t WHERE dim = 1) < 0
         |                   THEN -uv ELSE uv END AS uv
         |  FROM u$t),
         |n$t AS (SELECT sqrt(sum(uv * uv)) AS nrm FROM f$t),
         |v$t AS (
         |  SELECT dim, floor(uv / nrm * 1000000 + 0.5) / 1000000 AS val
         |  FROM f$t CROSS JOIN n$t)""".stripMargin
    def prevList(t: Int): String = s"(SELECT list(val ORDER BY dim) FROM v$t)"
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |${round(1, v0)},
       |${round(2, prevList(1))},
       |${round(3, prevList(2))}
       |SELECT v3.dim, v3.val AS loading,
       |  (SELECT floor(nrm * 1000000 + 0.5) / 1000000 FROM n3) AS lambda
       |FROM v3 ORDER BY dim""".stripMargin
  }

  /** d3d oracle: the four-lane SimHash replayed — lane hashes from
    * SimHashSig's constant rows, votes/signature/banding identical to
    * the d3b oracle but with band = whole lane masked to
    * least(60, bitlen(n-1)+5). */
  private lazy val simhashWide4OracleSql: String = {
    import graft.functions.SimHashSig.{MultA, MultB, PrimeA, PrimeB}
    val bits = graft.ops.Dedup.SimHashBits
    def votes(h: String, lane: Int) = (0 until bits)
      .map(i => s"sum(CASE WHEN ($h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS v${lane}_$i")
      .mkString(",\n    ")
    def sigTerms(lane: Int) = (0 until bits)
      .map(i => s"CASE WHEN v${lane}_$i > 0 THEN ${1L << i} ELSE 0 END")
      .mkString(" + ")
    val lanes = 0 to 3
    val hashed = lanes.map(l =>
      s"${polyHashSql(MultA(l).toInt, PrimeA(l))} * 1073741824\n    + " +
      s"${polyHashSql(MultB(l).toInt, PrimeB(l))} AS h$l").mkString(",\n    ")
    val bandCases = lanes.map(l =>
      s"WHEN $l THEN sig$l & ((CAST(1 AS BIGINT) << w) - 1)").mkString("\n      ")
    val ham = lanes.map(l => s"bit_count(xor(a.sig$l, b.sig$l))").mkString("\n    + ")
    s"""WITH nw AS (
       |  SELECT least(60, length(bin(count(*) - 1)) + 5) AS w FROM documents
       |), words AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
       |), hashed AS (
       |  SELECT doc_id,
       |    $hashed
       |  FROM words
       |), votes AS (
       |  SELECT doc_id,
       |    ${lanes.map(l => votes(s"h$l", l)).mkString(",\n    ")}
       |  FROM hashed GROUP BY doc_id
       |), sigs AS (
       |  SELECT doc_id,
       |    ${lanes.map(l => s"CAST(${sigTerms(l)} AS BIGINT) AS sig$l").mkString(",\n    ")}
       |  FROM votes
       |), banded AS (
       |  SELECT doc_id, sig0, sig1, sig2, sig3, band,
       |    CASE band
       |      $bandCases
       |      END AS band_val
       |  FROM sigs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) t CROSS JOIN nw
       |)
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST($ham AS INTEGER) AS hamming
       |FROM banded a
       |JOIN banded b ON a.band = b.band AND a.band_val = b.band_val
       |  AND a.doc_id < b.doc_id
       |WHERE $ham <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** lr1 oracle: 3 GD steps unrolled. Each step's sigma/gradient is
    * written in the identical association order as ops.Logistic's
    * column expressions; weights quantize to the 1e-6 grid per step,
    * absorbing exp/ln last-ulp engine differences that enter through
    * the gradient sums. */
  private lazy val logisticOracleSql: String = {
    def sg(w: String) =
      s"1.0 / (1.0 + exp(-($w.w0 * x0 + $w.w1 * x1 + $w.w2 * x2 + $w.w3 * x3)))"
    def step(t: Int): String = {
      val p = s"w${t - 1}"
      val g = (0 to 3)
        .map(j => s"sum((${sg("w")} - y) * x$j) AS g$j").mkString(",\n    ")
      s"""g$t AS (
         |  SELECT $g
         |  FROM f CROSS JOIN $p w),
         |w$t AS (
         |  SELECT ${(0 to 3).map(j =>
              s"floor((w.w$j - 1.0 * (g.g$j / nn.n)) * 1000000 + 0.5) / 1000000 AS w$j")
              .mkString(",\n    ")}
         |  FROM g$t g CROSS JOIN $p w CROSS JOIN nn)""".stripMargin
    }
    s"""WITH f AS (
       |  SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
       |    1.0 AS x0,
       |    n_chars / 1000.0 AS x1,
       |    len(string_split(text, ' ')) / 100.0 AS x2,
       |    n_chars / CAST(len(string_split(text, ' ')) AS DOUBLE) AS x3
       |  FROM documents),
       |nn AS (SELECT count(*) AS n FROM f),
       |w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
       |${step(1)},
       |${step(2)},
       |${step(3)},
       |lsum AS (
       |  SELECT sum(-(y * ln(${sg("w")}) +
       |    (1.0 - y) * ln(1.0 - ${sg("w")}))) AS sl
       |  FROM f CROSS JOIN w3 w),
       |ls AS (
       |  SELECT floor((s.sl / nn.n) * 1000000 + 0.5) / 1000000 AS loss
       |  FROM lsum s CROSS JOIN nn)
       |${(0 to 3).map(j =>
            s"SELECT $j AS feature, w.w$j AS weight, l.loss FROM w3 w CROSS JOIN ls l")
            .mkString("\nUNION ALL\n")}
       |ORDER BY feature""".stripMargin
  }

  /** Shared km1/s2b centroid chain: seeds (vec_id<8), one assignment
    * round, per-dim means QUANTIZED to 1e-6 -> c1, the trained
    * centroids both the k-means summary and the trained IVF consume. */
  private lazy val kmeansCentroidCtes: String =
    """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |      FROM embeddings),
      |c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < 8),
      |a1 AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT e.vec_id, c0.cid,
      |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |        (list_dot_product(e.v, c0.c) /
      |         nullif(sqrt(list_dot_product(e.v, e.v)) *
      |                sqrt(list_dot_product(c0.c, c0.c)), 0.0))
      |        DESC NULLS LAST, c0.cid) AS rn
      |    FROM e CROSS JOIN c0)
      |  WHERE rn = 1),
      |m1 AS (
      |  SELECT cid, dim, floor(avg(val) * 1000000 + 0.5) / 1000000 AS val
      |  FROM (
      |    SELECT a1.cid, generate_subscripts(e.v, 1) AS dim,
      |           unnest(e.v) AS val
      |    FROM a1 JOIN e USING (vec_id))
      |  GROUP BY cid, dim),
      |c1 AS (
      |  SELECT c0.cid,
      |    CASE WHEN count(m1.val) = 0 THEN c0.c
      |         ELSE list(m1.val ORDER BY m1.dim) END AS c
      |  FROM c0 LEFT JOIN m1 ON c0.cid = m1.cid
      |  GROUP BY c0.cid, c0.c)""".stripMargin

  /** cdc1 AND st6 oracle: the batch diff by direct column compare —
    * the streaming face must emit the identical op log. */
  private lazy val cdcOracleSql: String =
      """WITH o AS (
        |  SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer),
        |n AS (
        |  SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0
        |         ELSE c_acctbal END AS c_acctbal,
        |    c_mktsegment
        |  FROM customer WHERE c_custkey % 7 != 0
        |  UNION ALL
        |  SELECT c_custkey + 10000000, c_name, c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 13 = 0)
        |SELECT c_custkey, op FROM (
        |  SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
        |    CASE WHEN o.c_custkey IS NULL THEN 'I'
        |         WHEN n.c_custkey IS NULL THEN 'D'
        |         WHEN o.c_name != n.c_name OR o.c_acctbal != n.c_acctbal
        |              OR o.c_mktsegment != n.c_mktsegment THEN 'U' END AS op
        |  FROM o FULL OUTER JOIN n ON o.c_custkey = n.c_custkey)
        |WHERE op IS NOT NULL
        |ORDER BY c_custkey""".stripMargin

  /** mmr1 oracle: all five greedy MMR selections unrolled. `(1.0-0.7)`
    * is written as the expression, NOT its shortest decimal 0.3 — both
    * engines must compute the same 0.30000000000000004 double for the
    * greedy scores to compare bit-identically. */
  private lazy val mmrOracleSql: String = {
    val cos = (x: String, y: String) =>
      s"list_dot_product($x, $y) / nullif(sqrt(list_dot_product($x, $x)) * " +
      s"sqrt(list_dot_product($y, $y)), 0.0)"
    def step(t: Int): String =
      s"""p$t AS (
         |  SELECT c.doc_id, c.rel,
         |    0.7 * c.rel - (1.0 - 0.7) * max(ps.sim) AS mmr
         |  FROM cand c JOIN ps ON ps.i = c.doc_id
         |  WHERE ps.j IN (SELECT doc_id FROM s${t - 1})
         |    AND c.doc_id NOT IN (SELECT doc_id FROM s${t - 1})
         |  GROUP BY c.doc_id, c.rel
         |  ORDER BY mmr DESC, c.doc_id LIMIT 1),
         |s$t AS (SELECT * FROM s${t - 1}
         |        UNION ALL SELECT $t, doc_id, rel, mmr FROM p$t)""".stripMargin
    s"""WITH e AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS v
       |           FROM embeddings),
       |pr AS (SELECT v AS pv FROM e WHERE doc_id = 0),
       |cand AS (
       |  SELECT e.doc_id, e.v,
       |    floor((${cos("pr.pv", "e.v")}) * 1000000 + 0.5) / 1000000 AS rel
       |  FROM e CROSS JOIN pr WHERE e.doc_id != 0
       |  ORDER BY rel DESC, doc_id LIMIT 50),
       |ps AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j,
       |    floor((${cos("a.v", "b.v")}) * 1000000 + 0.5) / 1000000 AS sim
       |  FROM cand a JOIN cand b ON a.doc_id != b.doc_id),
       |p1 AS (SELECT doc_id, rel, 0.7 * rel - (1.0 - 0.7) * 0.0 AS mmr
       |       FROM cand ORDER BY mmr DESC, doc_id LIMIT 1),
       |s1 AS (SELECT 1 AS sel_rank, doc_id, rel, mmr FROM p1),
       |${(2 to 5).map(step).mkString(",\n")}
       |SELECT CAST(sel_rank AS INTEGER) AS sel_rank, doc_id, rel,
       |  floor(mmr * 1000000 + 0.5) / 1000000 AS mmr
       |FROM s5 ORDER BY sel_rank""".stripMargin
  }

  /** pr1 oracle: the 3-round PageRank unrolled — same trade-graph
    * construction, same per-round 1e-9 rank quantization, same
    * dangling-mass formula written in the identical association order
    * as ops.PageRank's column expression. */
  /** w16/st10 shared oracle: hop assignment replayed as the two
    * epoch-aligned 30-min buckets at and before each event's own. */
  /** w15's tolerance as-of, shared VERBATIM by the st11 streaming face
    * (the st6/st8 shared-oracle pattern): the stream's per-user state
    * walk must reproduce the batch window's enrichment exactly. */
  private lazy val asofToleranceOracleSql: String =
    """WITH l AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'click'),
      |r AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
      |    event_id AS view_id, value AS view_value
      |  FROM events WHERE event_type = 'view')
      |SELECT l.user_id, l.event_id,
      |  CASE WHEN l.ts - r.ts <= INTERVAL 10 MINUTE THEN r.view_id END
      |    AS prior_view_id,
      |  CASE WHEN l.ts - r.ts <= INTERVAL 10 MINUTE THEN r.view_value END
      |    AS prior_view_value
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
      |ORDER BY l.user_id, l.event_id""".stripMargin

  private lazy val hoppingOracleSql: String =
    """WITH e AS (
      |  SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
      |h AS (
      |  SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
      |                 time_bucket(INTERVAL 30 MINUTE, ts)
      |                   - INTERVAL 30 MINUTE]) AS w_start,
      |    event_type, value
      |  FROM e)
      |SELECT w_start, w_start + INTERVAL 60 MINUTE AS w_end, event_type,
      |  count(*) AS n_events,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS sum_value
      |FROM h GROUP BY w_start, event_type
      |ORDER BY w_start, event_type""".stripMargin

  /** pr2 oracle: pr1's round structure with the personalized update —
    * restart and dangling mass go to the seed distribution s (1/m on
    * seeds present in the graph), (1.0 - 0.85) written as the
    * expression so both engines compute the identical double. */
  private lazy val pprOracleSql: String = {
    def round(t: Int): String = {
      val p = s"r${t - 1}"
      s"""c$t AS (
         |  SELECT ed.dst AS node, sum(r.rank / r.deg) AS in_mass
         |  FROM $p r JOIN ed ON r.node = ed.src
         |  WHERE r.deg > 0 GROUP BY ed.dst),
         |d$t AS (SELECT coalesce(sum(rank), 0.0) AS dmass
         |        FROM $p WHERE deg = 0),
         |r$t AS (
         |  SELECT p.node, p.deg, p.s,
         |    floor(((1.0 - 0.85) * p.s
         |           + 0.85 * (coalesce(c.in_mass, 0.0) + d.dmass * p.s))
         |      * 1000000000 + 0.5) / 1000000000 AS rank
         |  FROM (SELECT node, deg, s FROM $p) p
         |  LEFT JOIN c$t c ON p.node = c.node
         |  CROSS JOIN d$t d)""".stripMargin
    }
    s"""WITH pe AS (
       |  SELECT DISTINCT o.o_custkey AS c, 1000000 + l.l_suppkey AS s
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |ed AS (SELECT c AS src, s AS dst FROM pe
       |       UNION ALL SELECT s, c FROM pe),
       |nd AS (SELECT src AS node FROM ed UNION SELECT dst FROM ed),
       |dg AS (SELECT src AS node, count(*) AS deg FROM ed GROUP BY src),
       |b AS (SELECT nd.node, coalesce(dg.deg, 0) AS deg
       |      FROM nd LEFT JOIN dg USING (node)),
       |sd AS (SELECT DISTINCT c_custkey AS node FROM customer
       |       WHERE c_nationkey = 7),
       |ss AS (SELECT b.node FROM b JOIN sd USING (node)),
       |sm AS (SELECT count(*) AS m FROM ss),
       |r0 AS (
       |  SELECT b.node, b.deg,
       |    CASE WHEN ss.node IS NOT NULL
       |         THEN floor(1.0 / sm.m * 1000000000 + 0.5) / 1000000000
       |         ELSE 0.0 END AS s,
       |    CASE WHEN ss.node IS NOT NULL
       |         THEN floor(1.0 / sm.m * 1000000000 + 0.5) / 1000000000
       |         ELSE 0.0 END AS rank
       |  FROM b LEFT JOIN ss ON b.node = ss.node CROSS JOIN sm),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT node, rank FROM r3
       |ORDER BY rank DESC, node LIMIT 20""".stripMargin
  }

  private lazy val pagerankOracleSql: String = {
    def round(t: Int): String = {
      val p = s"r${t - 1}"
      s"""c$t AS (
         |  SELECT ed.dst AS node, sum(r.rank / r.deg) AS in_mass
         |  FROM $p r JOIN ed ON r.node = ed.src
         |  WHERE r.deg > 0 GROUP BY ed.dst),
         |d$t AS (SELECT coalesce(sum(rank), 0.0) AS dmass
         |        FROM $p WHERE deg = 0),
         |r$t AS (
         |  SELECT p.node, p.deg,
         |    floor(((1.0 - 0.85) / nn.n
         |           + 0.85 * (coalesce(c.in_mass, 0.0) + d.dmass / nn.n))
         |      * 1000000000 + 0.5) / 1000000000 AS rank
         |  FROM (SELECT node, deg FROM $p) p
         |  LEFT JOIN c$t c ON p.node = c.node
         |  CROSS JOIN d$t d CROSS JOIN nn)""".stripMargin
    }
    s"""WITH pe AS (
       |  SELECT DISTINCT o.o_custkey AS c, 1000000 + l.l_suppkey AS s
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |ed AS (SELECT c AS src, s AS dst FROM pe
       |       UNION ALL SELECT s, c FROM pe),
       |nd AS (SELECT src AS node FROM ed UNION SELECT dst FROM ed),
       |dg AS (SELECT src AS node, count(*) AS deg FROM ed GROUP BY src),
       |b AS (SELECT nd.node, coalesce(dg.deg, 0) AS deg
       |      FROM nd LEFT JOIN dg USING (node)),
       |nn AS (SELECT count(*) AS n FROM b),
       |r0 AS (SELECT node, deg,
       |         floor(1.0 / nn.n * 1000000000 + 0.5) / 1000000000 AS rank
       |       FROM b CROSS JOIN nn),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT node, rank FROM r3
       |ORDER BY rank DESC, node LIMIT 20""".stripMargin
  }

  /** Shared r1/r2 lexical-lane pieces: the CTE chain ending in `piv`
    * and the fixed-order per-term score sum over it. */
  private lazy val bm25Parts: (String, String) = {
    import graft.ops.Retrieval.{K1, B}
    val terms = TextQueries.BmTerms
    // terms interpolate into SQL string literals; pivot identifiers
    // derive from the term INDEX (s_0, s_1, ...), never the term text,
    // so no term can generate an invalid or colliding identifier. The
    // literal interpolation itself is guarded against quoting breakage.
    require(terms.forall(_.matches("[a-z0-9_]+")),
      s"BM25 oracle terms must be [a-z0-9_]+; got $terms")
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val pivots = terms.zipWithIndex
      .map { case (t, i) => s"sum(CASE WHEN w = '$t' THEN sco END) AS s_$i" }
      .mkString(",\n    ")
    val sumExpr = terms.indices.map(i => s"coalesce(s_$i, 0.0)").mkString(" + ")
    s"""WITH base AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
       |    string_split(text, ' ') AS ws
       |  FROM documents),
       |stats AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM base),
       |tok AS (SELECT doc_id, dl, unnest(ws) AS w FROM base),
       |tf AS (SELECT doc_id, dl, w, count(*) AS tf FROM tok
       |       WHERE w IN ($inList) GROUP BY 1, 2, 3),
       |df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
       |sc AS (
       |  SELECT t.doc_id, t.dl, t.w,
       |    ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1)
       |      * (t.tf * ${K1 + 1.0})
       |      / (t.tf + $K1 * (${1.0 - B} + $B * t.dl / (CAST(s.sumdl AS DOUBLE) / s.n))) AS sco
       |  FROM tf t JOIN df d USING (w) CROSS JOIN stats s),
       |piv AS (
       |  SELECT doc_id, dl,
       |    $pivots
       |  FROM sc GROUP BY doc_id, dl)""".stripMargin -> sumExpr
  }

  private lazy val bm25OracleSql: String = {
    val (ctes, sumExpr) = bm25Parts
    s"""$ctes
       |SELECT doc_id, CAST(dl AS INTEGER) AS dl,
       |  floor(($sumExpr) * 10000 + 0.5) / 10000 AS score
       |FROM piv
       |ORDER BY score DESC, doc_id
       |LIMIT 20""".stripMargin
  }

  /** r2 oracle: the r1 lexical lane and the v1-style dense cosine lane
    * each ranked on their ROUNDED score grids (4dp / 6dp — the same
    * grids the Spark side rounds on before ranking), cut to lane
    * top-50, full-outer fused by `1/(60+lrank) + 1/(60+drank)` in that
    * fixed order, top-20. RRF ordering uses the RAW fused double
    * (exact int divisions — bit-identical across engines); the final
    * 6dp round is the display grid only. */
  private lazy val hybridRrfOracleSql: String = {
    val (ctes, sumExpr) = bm25Parts
    s"""$ctes,
       |lexall AS (
       |  SELECT doc_id, floor(($sumExpr) * 10000 + 0.5) / 10000 AS lscore
       |  FROM piv),
       |lexcut AS (
       |  SELECT doc_id, lscore FROM lexall
       |  ORDER BY lscore DESC, doc_id LIMIT 50),
       |lex AS (
       |  SELECT doc_id, CAST(row_number() OVER
       |    (ORDER BY lscore DESC, doc_id) AS INTEGER) AS lrank
       |  FROM lexcut),
       |e AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS v
       |      FROM embeddings),
       |pr AS (SELECT v AS pv FROM e WHERE doc_id = 0),
       |densecut AS (
       |  SELECT e.doc_id,
       |    floor((list_dot_product(pr.pv, e.v) /
       |      nullif(sqrt(list_dot_product(pr.pv, pr.pv)) *
       |             sqrt(list_dot_product(e.v, e.v)), 0.0))
       |      * 1000000 + 0.5) / 1000000 AS dscore
       |  FROM e CROSS JOIN pr WHERE e.doc_id != 0
       |  ORDER BY dscore DESC, doc_id LIMIT 50),
       |dense AS (
       |  SELECT doc_id, CAST(row_number() OVER
       |    (ORDER BY dscore DESC, doc_id) AS INTEGER) AS drank
       |  FROM densecut),
       |fused AS (
       |  SELECT coalesce(l.doc_id, d.doc_id) AS doc_id, l.lrank, d.drank,
       |    coalesce(1.0 / (60.0 + l.lrank), 0.0) +
       |    coalesce(1.0 / (60.0 + d.drank), 0.0) AS rrf
       |  FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id),
       |cut AS (SELECT * FROM fused ORDER BY rrf DESC, doc_id LIMIT 20)
       |SELECT doc_id, lrank, drank,
       |  floor(rrf * 1000000 + 0.5) / 1000000 AS rrf,
       |  CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INTEGER) AS rn
       |FROM cut ORDER BY rn""".stripMargin
  }

  /** Shared CTE prefix for the t20/t21 boilerplate oracles: the planted
    * per-source boilerplate sentence, the per-doc DISTINCT trigram set,
    * and the (source, gram) document-frequency table — the SQL mirror
    * of TextQueries.boilerplate's planted fixture +
    * TextAnalysis.boilerplateGrams. */
  private val boilerplateCte: String =
    """WITH p AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 2 = 0
      |      THEN text || ' subscribe to ' || source || ' newsletter today'
      |      ELSE text END AS text2
      |  FROM documents),
      |g AS (
      |  SELECT DISTINCT doc_id, source, gram FROM (
      |    SELECT doc_id, source,
      |      unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |              for i in range(1, len(ws) - 1)]) AS gram
      |    FROM (SELECT doc_id, source, string_split(text2, ' ') AS ws FROM p)
      |    WHERE len(ws) >= 3)),
      |src_sizes AS (SELECT source, count(*) AS n_src_docs FROM p GROUP BY source),
      |det AS (
      |  SELECT g.source, g.gram, count(*) AS df_docs, any_value(s.n_src_docs) AS n_src_docs,
      |    count(*)::DOUBLE / any_value(s.n_src_docs) AS doc_frac
      |  FROM g JOIN src_sizes s USING (source)
      |  GROUP BY g.source, g.gram
      |  HAVING count(*)::DOUBLE / any_value(s.n_src_docs) >= 0.4)""".stripMargin

  /** Shared CTE prefix for the md1/md2/md3 medallion oracles: the
    * transcript-shaped fixtures (MedallionQueries.oaTextFixture /
    * transcriptEmbeddingsFixture, rebuilt column-for-column), the
    * bronze projections (P4 quirk, P5 duration guard, F10 speaker
    * count), and the whole silver_case_summaries model. */
  private val medallionCte: String =
    """WITH oa_raw AS (
      |  SELECT
      |    CAST(doc_id AS VARCHAR) AS utterance_id,
      |    'case_' || (doc_id % 20) AS case_id,
      |    'case_' || (doc_id % 20) || '_oa' || (doc_id % 2) AS oa_id,
      |    row_number() OVER (PARTITION BY doc_id % 20, doc_id % 2
      |                       ORDER BY doc_id) - 1 AS utterance_index,
      |    CASE WHEN doc_id % 17 = 0 THEN NULL
      |      ELSE ['JUSTICE BARRETT', 'CHIEF JUSTICE ROBERTS', 'Chief Scalia',
      |            'General Prelogar', 'Mr. Olson'][CAST(doc_id % 5 + 1 AS INT)]
      |      END AS speaker_name,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS word_count,
      |    len(regexp_extract_all(text,
      |      '[A-Za-z0-9_'']+|[^A-Za-z0-9_''\s]')) AS token_count,
      |    doc_id * 4000 AS start_time_ms,
      |    CASE WHEN doc_id % 11 = 0 THEN NULL
      |         ELSE doc_id * 4000 + (doc_id % 40) * 125 END AS end_time_ms
      |  FROM documents),
      |bronze_oa AS (
      |  SELECT *,
      |    CASE WHEN start_time_ms IS NOT NULL AND end_time_ms IS NOT NULL
      |      THEN (end_time_ms - start_time_ms) / 1000.0 END AS duration_seconds,
      |    CASE WHEN upper(speaker_name) LIKE '%JUSTICE%' THEN 'Justice'
      |         WHEN upper(speaker_name) LIKE '%CHIEF%' THEN 'Chief Justice'
      |         WHEN upper(speaker_name) LIKE '%GENERAL%' THEN 'Solicitor General'
      |         ELSE 'Attorney' END AS speaker_role
      |  FROM oa_raw),
      |te AS (
      |  SELECT
      |    'case_' || (doc_id % 20) AS case_id,
      |    'Case No. ' || (doc_id % 20) AS case_name,
      |    CAST(2000 + doc_id % 20 AS VARCHAR) AS term,
      |    length(text) AS text_length,
      |    CAST(coalesce(json_array_length(
      |      CASE WHEN doc_id % 5 = 0 THEN NULL
      |           ELSE ['[]', '["a"]', '["a","b"]',
      |                 '["a","b","c"]'][CAST(doc_id % 4 + 1 AS INT)] END), 0)
      |      AS INTEGER) AS speaker_count
      |  FROM documents),
      |us AS (
      |  SELECT case_id, oa_id,
      |    COUNT(DISTINCT utterance_id) AS total_utterances,
      |    COUNT(DISTINCT speaker_name) AS unique_speakers,
      |    CAST(SUM(word_count) AS BIGINT) AS total_words,
      |    CAST(SUM(token_count) AS BIGINT) AS total_tokens,
      |    AVG(duration_seconds) AS avg_utterance_duration,
      |    MAX(end_time_ms) / 1000.0 AS total_duration_seconds
      |  FROM bronze_oa GROUP BY case_id, oa_id),
      |sb AS (
      |  SELECT case_id, oa_id,
      |    COUNT(CASE WHEN speaker_role = 'Justice' THEN 1 END) AS justice_utterances,
      |    COUNT(CASE WHEN speaker_role = 'Chief Justice' THEN 1 END) AS chief_justice_utterances,
      |    COUNT(CASE WHEN speaker_role = 'Attorney' THEN 1 END) AS attorney_utterances,
      |    COUNT(CASE WHEN speaker_role = 'Solicitor General' THEN 1 END) AS solicitor_general_utterances
      |  FROM bronze_oa GROUP BY case_id, oa_id),
      |es AS (
      |  SELECT case_id, COUNT(*) AS total_embeddings,
      |    AVG(text_length) AS avg_embedding_text_length,
      |    MAX(speaker_count) AS max_speakers_in_embedding
      |  FROM te GROUP BY case_id),
      |silver AS (
      |  SELECT u.case_id, u.oa_id, u.total_utterances, u.unique_speakers,
      |    u.total_words, u.total_tokens, u.avg_utterance_duration,
      |    u.total_duration_seconds,
      |    u.total_duration_seconds / 60.0 AS total_duration_minutes,
      |    s.justice_utterances, s.chief_justice_utterances,
      |    s.attorney_utterances, s.solicitor_general_utterances,
      |    e.total_embeddings, e.avg_embedding_text_length,
      |    e.max_speakers_in_embedding
      |  FROM us u
      |  LEFT JOIN sb s ON u.case_id = s.case_id AND u.oa_id = s.oa_id
      |  LEFT JOIN es e ON u.case_id = e.case_id)""".stripMargin

  /** SemDeDup oracle (balanced √n seeds, nearest-centroid assignment,
    * within-cluster domination) — shared by d11 (batch operator) and
    * st4 (the STREAMING path, whose single AvailableNow batch freezes
    * the quantizer on the full corpus and therefore drops exactly the
    * batch operator's rows). */
  private lazy val semanticDedupOracle: String = {
    val cos = (a: String, b: String) =>
      s"list_dot_product($a, $b) / nullif(sqrt(list_dot_product($a, $a))" +
        s" * sqrt(list_dot_product($b, $b)), 0.0)"
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |st AS (SELECT greatest(CAST(ceil(sqrt(count(*))) AS BIGINT), 1) AS s FROM e),
       |seeds AS (SELECT vec_id AS list_id, v AS sv FROM e, st
       |          WHERE vec_id % st.s = 0),
       |ca AS (
       |  SELECT vec_id, v, list_id AS cluster_id, csim FROM (
       |    SELECT c.vec_id, c.v, s.list_id,
       |      ${cos("c.v", "s.sv")} AS csim,
       |      row_number() OVER (PARTITION BY c.vec_id
       |        ORDER BY ${cos("c.v", "s.sv")} DESC, s.list_id) AS ar
       |    FROM e c CROSS JOIN seeds s)
       |  WHERE ar = 1),
       |dom AS (
       |  SELECT DISTINCT x.vec_id
       |  FROM ca x JOIN ca y
       |    ON x.cluster_id = y.cluster_id AND x.vec_id != y.vec_id
       |  WHERE ${cos("x.v", "y.v")} >= 0.45
       |    AND (y.csim > x.csim OR (y.csim = x.csim AND y.vec_id < x.vec_id)))
       |SELECT ca.vec_id, ca.cluster_id,
       |  floor(ca.csim * 1000000 + 0.5) / 1000000 AS centroid_sim
       |FROM ca LEFT JOIN dom ON ca.vec_id = dom.vec_id
       |WHERE dom.vec_id IS NULL
       |ORDER BY ca.vec_id""".stripMargin
  }

  /** DuckDB equivalents, runnable on views named after the parquet tables. */
  def oracleSql: Map[String, String] = Map(
    "md1_silver_case_summaries" ->
      (medallionCte +
        """
          |SELECT case_id, oa_id, total_utterances, unique_speakers,
          |  total_words, total_tokens,
          |  floor(avg_utterance_duration * 10000 + 0.5) / 10000 AS avg_utterance_duration,
          |  floor(total_duration_seconds * 10000 + 0.5) / 10000 AS total_duration_seconds,
          |  floor(total_duration_minutes * 10000 + 0.5) / 10000 AS total_duration_minutes,
          |  justice_utterances, chief_justice_utterances, attorney_utterances,
          |  solicitor_general_utterances, total_embeddings,
          |  floor(avg_embedding_text_length * 10000 + 0.5) / 10000 AS avg_embedding_text_length,
          |  max_speakers_in_embedding
          |FROM silver ORDER BY case_id, oa_id""".stripMargin),
    "md2_gold_speaker_analytics" ->
      (medallionCte +
        """,
          |ss AS (
          |  SELECT speaker_name, speaker_role, case_id, oa_id,
          |    COUNT(*) AS total_utterances,
          |    CAST(SUM(word_count) AS BIGINT) AS total_words,
          |    CAST(SUM(token_count) AS BIGINT) AS total_tokens,
          |    AVG(word_count) AS avg_words_per_utterance,
          |    SUM(duration_seconds) AS total_speaking_time,
          |    AVG(duration_seconds) AS avg_utterance_duration,
          |    MIN(utterance_index) AS first_utterance_index,
          |    MAX(utterance_index) AS last_utterance_index
          |  FROM bronze_oa WHERE speaker_name IS NOT NULL
          |  GROUP BY speaker_name, speaker_role, case_id, oa_id),
          |cc AS (SELECT DISTINCT case_id, case_name, term FROM te)
          |SELECT ss.speaker_name, ss.speaker_role, ss.case_id, cc.case_name,
          |  cc.term, ss.oa_id, ss.total_utterances, ss.total_words, ss.total_tokens,
          |  floor(avg_words_per_utterance * 10000 + 0.5) / 10000 AS avg_words_per_utterance,
          |  floor((total_speaking_time / 60.0) * 100 + 0.5) / 100 AS total_speaking_minutes,
          |  floor(avg_utterance_duration * 10000 + 0.5) / 10000 AS avg_utterance_duration,
          |  (last_utterance_index - first_utterance_index + 1) AS utterance_span,
          |  CASE WHEN ss.total_utterances > 1
          |    THEN floor(((last_utterance_index - first_utterance_index)::DOUBLE
          |         / (ss.total_utterances - 1)) * 100 + 0.5) / 100
          |    ELSE 0.0 END AS avg_utterance_gap,
          |  CASE WHEN total_speaking_time > 0
          |    THEN floor((total_words::DOUBLE / (total_speaking_time / 60.0)) * 100 + 0.5) / 100
          |  END AS words_per_minute
          |FROM ss LEFT JOIN cc ON ss.case_id = cc.case_id
          |ORDER BY ss.total_utterances DESC, ss.speaker_name, ss.case_id, ss.oa_id""".stripMargin),
    "md3_gold_oral_arguments" ->
      (medallionCte +
        """,
          |ci AS (SELECT DISTINCT case_id, case_name, term FROM te
          |       WHERE case_name IS NOT NULL)
          |SELECT ci.case_id, ci.case_name, ci.term, s.oa_id,
          |  s.total_utterances, s.unique_speakers, s.total_words, s.total_tokens,
          |  floor(s.total_duration_minutes * 10000 + 0.5) / 10000 AS total_duration_minutes,
          |  floor(s.avg_utterance_duration * 10000 + 0.5) / 10000 AS avg_utterance_duration,
          |  floor((s.justice_utterances::DOUBLE / nullif(s.total_utterances, 0) * 100) * 100 + 0.5) / 100 AS justice_participation_pct,
          |  floor((s.attorney_utterances::DOUBLE / nullif(s.total_utterances, 0) * 100) * 100 + 0.5) / 100 AS attorney_participation_pct,
          |  floor((s.total_utterances::DOUBLE / nullif(s.total_duration_minutes, 0)) * 100 + 0.5) / 100 AS utterances_per_minute,
          |  floor((s.total_words::DOUBLE / nullif(s.total_duration_minutes, 0)) * 100 + 0.5) / 100 AS words_per_minute,
          |  s.total_embeddings,
          |  floor(s.avg_embedding_text_length * 10000 + 0.5) / 10000 AS avg_embedding_text_length
          |FROM ci JOIN silver s ON ci.case_id = s.case_id
          |ORDER BY ci.term DESC, ci.case_name, s.oa_id""".stripMargin),
    // k6: rebuild the exact single-line ElementTree document —
    // attr escaping & < > " (speaker defaults to 'Unknown'), text
    // escaping & < > only, utterances concatenated in index order.
    "k6_xml" ->
      """WITH oa AS (
        |  SELECT
        |    'case_' || (doc_id % 20) AS case_id,
        |    'case_' || (doc_id % 20) || '_oa' || (doc_id % 2) AS oa_id,
        |    row_number() OVER (PARTITION BY doc_id % 20, doc_id % 2
        |                       ORDER BY doc_id) - 1 AS utterance_index,
        |    CASE WHEN doc_id % 17 = 0 THEN NULL
        |      ELSE ['JUSTICE BARRETT', 'CHIEF JUSTICE ROBERTS', 'Chief Scalia',
        |            'General Prelogar', 'Mr. Olson'][CAST(doc_id % 5 + 1 AS INT)]
        |      END AS speaker_name,
        |    'spk' || (doc_id % 5) AS speaker_id,
        |    text
        |  FROM documents)
        |SELECT case_id, oa_id,
        |  '<transcript>' || string_agg(
        |    '<utterance speaker="' ||
        |      replace(replace(replace(replace(coalesce(speaker_name, 'Unknown'),
        |        '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '"', '&quot;') ||
        |    '" speaker_id="' || speaker_id || '">' ||
        |    replace(replace(replace(text,
        |      '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
        |    '</utterance>', '' ORDER BY utterance_index) || '</transcript>' AS xml
        |FROM oa GROUP BY case_id, oa_id
        |ORDER BY case_id, oa_id""".stripMargin,
    // t22: running token sum per source in (n_chars DESC, doc_id)
    // priority order; keep rows that START below the 20k budget (the
    // crossing doc is included).
    "t22_token_budget" ->
      """WITH d AS (
        |  SELECT * FROM (
        |    SELECT doc_id, source, n_chars,
        |      CAST(len(regexp_extract_all(text,
        |        '[A-Za-z0-9_'']+|[^A-Za-z0-9_''\s]')) AS BIGINT) AS n_tokens
        |    FROM documents)
        |  WHERE n_tokens >= 1),
        |sel AS (
        |  SELECT doc_id, source, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS cum_tokens
        |  FROM d)
        |SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
        |FROM sel WHERE cum_tokens - n_tokens < 20000
        |ORDER BY source, cum_tokens, doc_id""".stripMargin,
    // t23: shard = PolyHash(doc_id || salt) mod 16, position = rank by
    // (hash, id) within the shard.
    "t23_shuffle_order" ->
      s"""WITH h AS (
         |  SELECT doc_id, ${polyHash64Sql("w")} AS hh FROM (
         |    SELECT doc_id, CAST(doc_id AS VARCHAR) || 'epoch0' AS w
         |    FROM documents))
         |SELECT doc_id, CAST(hh % 16 AS INTEGER) AS shard,
         |  CAST(row_number() OVER (PARTITION BY hh % 16
         |    ORDER BY hh, doc_id) - 1 AS INTEGER) AS shard_pos
         |FROM h ORDER BY shard, shard_pos""".stripMargin,
    "t19_bigram_surprisal" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |  WHERE len(ws) >= 2),
        |g2 AS (SELECT doc_id, s, string_split(s, ' ')[1] AS w1 FROM g),
        |bgc AS (SELECT s, count(*) AS cbg FROM g2 GROUP BY s),
        |w1c AS (SELECT w1, count(*) AS c1 FROM g2 GROUP BY w1),
        |per AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |    avg(log2(c1) - log2(cbg)) AS ms
        |  FROM g2 JOIN bgc USING (s) JOIN w1c USING (w1)
        |  GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(per.n_bigrams, 0) AS n_bigrams,
        |  floor(ms * 10000 + 0.5) / 10000 AS mean_surprisal
        |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "t20_boilerplate" ->
      (boilerplateCte +
        """
          |SELECT source, gram, df_docs, n_src_docs,
          |  floor(doc_frac * 10000 + 0.5) / 10000 AS doc_frac
          |FROM det ORDER BY source, gram""".stripMargin),
    "t21_boilerplate_strip" ->
      (boilerplateCte +
        """,
          |top_gram AS (
          |  SELECT source, gram FROM (
          |    SELECT source, gram,
          |      row_number() OVER (PARTITION BY source
          |        ORDER BY df_docs DESC, gram) AS rn
          |    FROM det)
          |  WHERE rn = 1)
          |SELECT p.doc_id, p.source,
          |  length(cleaned) AS n_clean_chars, cleaned AS clean_text
          |FROM (
          |  SELECT p.doc_id, p.source,
          |    CASE WHEN t.gram IS NOT NULL
          |      THEN trim(regexp_replace(replace(p.text2, t.gram, ''), '\s+', ' ', 'g'))
          |      ELSE p.text2 END AS cleaned
          |  FROM p LEFT JOIN top_gram t USING (source)) p
          |ORDER BY p.doc_id""".stripMargin),
    "t9_pii_redact" -> piiOracleSql,
    "r1_bm25_search" -> bm25OracleSql,
    // r1b: the SAME oracle — doc postings are immutable and corpus
    // stats additive, so the incrementally-appended inverted index
    // must score identically to the in-flight corpus scan.
    "r1b_bm25_store" -> bm25OracleSql,
    // r1c: the SAME oracle again — compaction is row-preserving (one
    // scan, one write per bucket dir), so the folded index must score
    // identically to the append-accumulated one.
    "r1c_bm25_compacted" -> bm25OracleSql,
    // cm1b: the moment-replay oracle (exact decimal sums + the fixed
    // double formula); st22 the SAME oracle — decimal addition is
    // lossless, so the streamed moments equal the batch build.
    "cm1b_corr_store" -> corrMomentsOracleSql,
    "st22_stream_corr_moments" -> corrMomentsOracleSql,
    // st20: the SAME oracle once more — the streamed index is the
    // same idempotent append per micro-batch, so draining the stream
    // must leave an index that scores identically to the batch build.
    "st20_stream_bm25_index" -> bm25OracleSql,
    // r3: phrase adjacency replayed on the token arrays (1-based ws[i]
    // vs the engine's 0-based postings — first_pos = min(i) - 1)
    "r3_phrase_search" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |u AS (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM t),
        |m AS (SELECT doc_id, i FROM u
        |      WHERE i + 2 <= len(ws)
        |        AND ws[i] = 'key' AND ws[i+1] = 'scan' AND ws[i+2] = 'query')
        |SELECT doc_id, count(*) AS n_matches,
        |  CAST(min(i) - 1 AS BIGINT) AS first_pos
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // t34: chunk count = ceil(max(n - chunk, 0) / stride) + 1, offsets
    // pure arithmetic, content pinned by md5 of the substring
    "t34_chunk_overlap" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents
        |           WHERE doc_id < 300 AND length(text) >= 1),
        |k AS (SELECT doc_id, text, n,
        |        unnest(range(0, CAST(ceil(greatest(n - 180, 0) / 120.0) AS BIGINT) + 1)) AS chunk_id
        |      FROM d)
        |SELECT doc_id, chunk_id,
        |  CAST(chunk_id * 120 AS BIGINT) AS chunk_start,
        |  CAST(least(180, n - chunk_id * 120) AS BIGINT) AS chunk_len,
        |  md5(substr(text, CAST(chunk_id * 120 + 1 AS INT), 180)) AS chunk_digest
        |FROM k ORDER BY doc_id, chunk_id""".stripMargin,
    "r2_hybrid_rrf" -> hybridRrfOracleSql,
    "svd1_power_iteration" -> svdOracleSql,
    "pr1_pagerank" -> pagerankOracleSql,
    "pr2_personalized" -> pprOracleSql,
    // mf1: both ALS half-steps replayed — u1 = mean rating per user
    // (v0 = 1 exactly; integer-valued sums are order-exact), v1 =
    // Σ r·u / Σ u² per item, factors on the 1e-6 grid after each
    // half-step, squared error written as explicit multiplication
    // (never pow()) so both engines square identically.
    "mf1_als_rank1" ->
      """WITH r AS (
        |  SELECT l_suppkey AS u, l_partkey AS i,
        |    CAST(sum(l_quantity) AS DOUBLE) AS r
        |  FROM lineitem GROUP BY 1, 2),
        |u1 AS (
        |  SELECT u, floor((sum(r) / count(*)) * 1000000 + 0.5) / 1000000 AS uv
        |  FROM r GROUP BY u),
        |v1 AS (
        |  SELECT i, floor((sum(r.r * u1.uv) / sum(u1.uv * u1.uv))
        |    * 1000000 + 0.5) / 1000000 AS factor
        |  FROM r JOIN u1 USING (u) GROUP BY i),
        |ms AS (
        |  SELECT floor((sum((r.r - u1.uv * v1.factor)
        |                  * (r.r - u1.uv * v1.factor)) / count(*))
        |    * 1000000 + 0.5) / 1000000 AS mse
        |  FROM r JOIN u1 USING (u) JOIN v1 USING (i))
        |SELECT i AS item, factor, ms.mse
        |FROM v1 CROSS JOIN ms
        |ORDER BY factor DESC, i LIMIT 20""".stripMargin,
    // lp1: three synchronous neighbor-mode rounds, pure integer
    // arithmetic — the iteration replays with no grids or tolerances.
    "w14_trailing_window" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // q22: the above-average filter replayed multiplicatively —
    // bal·n > total in DECIMAL, division never runs on either engine.
    "q22_correlated_agg" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |             CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer),
        |s AS (SELECT sum(bal) AS tot, count(*) AS n FROM c WHERE bal > 0)
        |SELECT c_mktsegment, count(*) AS n_custs,
        |  CAST(sum(bal) AS DOUBLE) AS total_bal
        |FROM c, s
        |WHERE bal * n > tot
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "u4_multiset_ops" ->
      """WITH hi AS (SELECT o_orderstatus FROM orders
        |            WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
        |lo AS (SELECT o_orderstatus FROM orders
        |       WHERE o_orderpriority = '3-MEDIUM'),
        |ea AS (SELECT o_orderstatus, count(*) AS n_except_all
        |       FROM (SELECT * FROM hi EXCEPT ALL SELECT * FROM lo)
        |       GROUP BY 1),
        |ia AS (SELECT o_orderstatus, count(*) AS n_intersect_all
        |       FROM (SELECT * FROM hi INTERSECT ALL SELECT * FROM lo)
        |       GROUP BY 1)
        |SELECT o_orderstatus,
        |  coalesce(n_except_all, 0) AS n_except_all,
        |  coalesce(n_intersect_all, 0) AS n_intersect_all
        |FROM ea FULL OUTER JOIN ia USING (o_orderstatus)
        |ORDER BY o_orderstatus""".stripMargin,
    // st9: the streaming stateful face must reproduce the batch LAG
    // rule exactly — same oracle as w13.
    "st9_stream_throttle" ->
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
        |  FROM events)
        |SELECT event_type,
        |  count(CASE WHEN gap IS NULL OR gap > 3600000000 THEN 1 END) AS n_kept,
        |  count(CASE WHEN gap IS NOT NULL AND gap <= 3600000000 THEN 1 END) AS n_dropped
        |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin,
    "w13_throttle_dedup" ->
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
        |  FROM events)
        |SELECT event_type,
        |  count(CASE WHEN gap IS NULL OR gap > 3600000000 THEN 1 END) AS n_kept,
        |  count(CASE WHEN gap IS NOT NULL AND gap <= 3600000000 THEN 1 END) AS n_dropped
        |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin,
    // w12: decay coefficients are the SAME driver doubles Spark uses,
    // serialized at 17 significant digits (exact double round-trip) —
    // engine pow() never runs on either side.
    "w12_ewma" -> {
      val pows = graft.ops.Recency.decayPowers(0.25, 20)
        .map(d => f"$d%.17g").mkString("[", ", ", "]")
      s"""WITH r AS (
         |  SELECT user_id, value,
         |    row_number() OVER (PARTITION BY user_id
         |                       ORDER BY ts DESC, event_id DESC) AS i
         |  FROM events),
         |kk AS (SELECT user_id, value, i FROM r WHERE i <= 20),
         |m AS (SELECT user_id, count(*) AS m FROM kk GROUP BY 1),
         |p AS (SELECT $pows AS pw)
         |SELECT kk.user_id, max(m.m) AS n_recent,
         |  floor(sum(CASE WHEN kk.i = m.m THEN p.pw[m.m] * kk.value
         |                 ELSE 0.25 * p.pw[kk.i] * kk.value END)
         |        * 1000000 + 0.5) / 1000000 AS ewma
         |FROM kk, m, p WHERE kk.user_id = m.user_id
         |GROUP BY kk.user_id ORDER BY kk.user_id""".stripMargin
    },
    "tc1_triangles" -> triangleOracleSql,
    // st21: the SAME oracle as tc1/tc2 — per-batch increments sum to
    // the one-shot count (the tc2 identity applied batch by batch).
    "st21_stream_triangles" -> triangleOracleSql,
    // tc2: the SAME oracle — triangles(E ∪ D) = triangles(E) ⊎
    // {triangles with ≥1 D edge}, so the store's absorbed counts must
    // equal the full recount bit-for-bit.
    "tc2_triangle_store" -> triangleOracleSql,
    // tc2b: the SAME oracle — the sparse-regime adaptive read serves
    // the identical adjacency relation, and base ∪ delta = all edges
    "tc2b_triangle_store_sparse" -> triangleOracleSql,
    // gc1: data-adaptive k = max(2, ceil(0.7·avg-degree)), then 6
    // unrolled peel rounds — more than the data's cascade depth (4 at
    // sf0.01); post-fixpoint rounds are no-ops on both engines.
    "gc1_kcore" -> {
      // MATERIALIZED: every e_r is referenced three times (degree CTE
      // + two NOT INs); inlining would re-evaluate the whole peel
      // chain per reference — exponential replay cost in DuckDB.
      val rounds = (0 until 6).map { r =>
        s"""d$r AS MATERIALIZED (SELECT nd, count(*) AS d
           |        FROM (SELECT unnest([u, v]) AS nd FROM e$r) GROUP BY nd),
           |e${r + 1} AS MATERIALIZED (SELECT u, v FROM e$r
           |        WHERE u NOT IN (SELECT nd FROM d$r, kk WHERE d < k)
           |          AND v NOT IN (SELECT nd FROM d$r, kk WHERE d < k))""".stripMargin
      }.mkString(",\n")
      s"""WITH $tradeEdgesCte,
         |kk AS (SELECT greatest(2, CAST(ceil(0.7 * (2.0 * (SELECT count(*) FROM e0)
         |       / (SELECT count(DISTINCT nd)
         |          FROM (SELECT unnest([u, v]) AS nd FROM e0)))) AS BIGINT)) AS k),
         |$rounds
         |SELECT nd AS node, count(*) AS core_degree
         |FROM (SELECT unnest([u, v]) AS nd FROM e6)
         |GROUP BY nd ORDER BY node""".stripMargin
    },
    "lp1_communities" -> {
      def round(t: Int): String =
        s"""l$t AS (
           |  SELECT dst AS node, label FROM (
           |    SELECT e.dst, p.label, count(*) AS c,
           |      row_number() OVER (PARTITION BY e.dst
           |        ORDER BY count(*) DESC, p.label) AS rn
           |    FROM l${t - 1} p JOIN ed e ON p.node = e.src
           |    GROUP BY e.dst, p.label)
           |  WHERE rn = 1)""".stripMargin
      s"""WITH pe AS (
         |  SELECT DISTINCT o.o_custkey AS c, 1000000 + l.l_suppkey AS s
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |ed AS (SELECT c AS src, s AS dst FROM pe
         |       UNION SELECT s, c FROM pe),
         |l0 AS (SELECT DISTINCT src AS node, src AS label FROM ed),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT label, count(*) AS n_nodes FROM l3
         |GROUP BY label ORDER BY n_nodes DESC, label LIMIT 20""".stripMargin
    },
    "mmr1_diversified" -> mmrOracleSql,
    // km1: both Lloyd rounds replayed - assignment = argmax cosine
    // (ties to the SMALLEST centroid id: DESC NULLS LAST, cid - the
    // SQL mirror of NearestCentroid's strict-> ascending scan), update
    // = per-dim mean QUANTIZED to the 1e-6 grid before the next round,
    // empty clusters keep their previous centroid.
    "km1_kmeans" ->
      s"""WITH $kmeansCentroidCtes,
        |a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT e.vec_id, c1.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        (list_dot_product(e.v, c1.c) /
        |         nullif(sqrt(list_dot_product(e.v, e.v)) *
        |                sqrt(list_dot_product(c1.c, c1.c)), 0.0))
        |        DESC NULLS LAST, c1.cid) AS rn
        |    FROM e CROSS JOIN c1)
        |  WHERE rn = 1),
        |cnt AS (SELECT cid, count(*) AS n FROM a2 GROUP BY cid)
        |SELECT c1.cid AS cluster_id, coalesce(cnt.n, 0) AS n,
        |  floor(sqrt(list_dot_product(c1.c, c1.c)) * 1000000 + 0.5)
        |    / 1000000 AS cnorm
        |FROM c1 LEFT JOIN cnt ON c1.cid = cnt.cid
        |ORDER BY cluster_id""".stripMargin,
    // s2b: the SAME trained centroids become the IVF coarse quantizer;
    // assign every candidate to its argmax-cosine list, probe the top-2
    // lists per query, exact cosine + rank within the probed lists.
    "s2b_ivf_trained" ->
      s"""WITH $kmeansCentroidCtes,
        |ca AS (
        |  SELECT vec_id, v, cid AS list_id FROM (
        |    SELECT e.vec_id, e.v, c1.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        (list_dot_product(e.v, c1.c) /
        |         nullif(sqrt(list_dot_product(e.v, e.v)) *
        |                sqrt(list_dot_product(c1.c, c1.c)), 0.0))
        |        DESC NULLS LAST, c1.cid) AS ar
        |    FROM e CROSS JOIN c1)
        |  WHERE ar = 1),
        |qa AS (
        |  SELECT vec_id AS query_id, v AS qv, cid AS list_id FROM (
        |    SELECT q.vec_id, q.v, c1.cid,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        (list_dot_product(q.v, c1.c) /
        |         nullif(sqrt(list_dot_product(q.v, q.v)) *
        |                sqrt(list_dot_product(c1.c, c1.c)), 0.0))
        |        DESC NULLS LAST, c1.cid) AS ar
        |    FROM e q CROSS JOIN c1 WHERE q.vec_id < 5)
        |  WHERE ar <= 2),
        |sims AS (
        |  SELECT qa.query_id, ca.vec_id AS cand_id,
        |    list_dot_product(qa.qv, ca.v) /
        |      nullif(sqrt(list_dot_product(qa.qv, qa.qv)) *
        |             sqrt(list_dot_product(ca.v, ca.v)), 0.0) AS sim_raw
        |  FROM qa JOIN ca USING (list_id)
        |  WHERE ca.vec_id != qa.query_id)
        |SELECT query_id, cand_id,
        |  floor(sim_raw * 1000000 + 0.5) / 1000000 AS cosine,
        |  CAST(rank AS INTEGER) AS rank
        |FROM (SELECT query_id, cand_id, sim_raw,
        |        row_number() OVER (PARTITION BY query_id
        |          ORDER BY sim_raw DESC, cand_id) AS rank
        |      FROM sims)
        |WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    // st6 emits the IDENTICAL diff through the streaming face (one
    // AvailableNow full-snapshot batch vs the seeded store) — same
    // oracle, proving batch/stream agreement on real data.
    "cdc1_snapshot_diff" -> cdcOracleSql,
    // cdc2: the SCD2 segment logic replayed over actual VALUES (lag +
    // running-sum segment ids) while the engine segments by xxhash64
    // digest; v1 is cdc1's derived dump, v2 a further delete/bump pass
    // chained FROM v1. ver literals are INTEGER on both sides; the
    // running SUM feeds only GROUP BY, never output (HUGEINT-safe).
    "cdc2_scd2" -> scd2OracleSql,
    // st12 emits the IDENTICAL interval table through the streaming
    // face (three version-ordered micro-batches maintaining the store
    // incrementally) — same oracle, batch/stream agreement gated.
    "st12_stream_scd2" -> scd2OracleSql,
    "w17_point_in_time" ->
      s"""WITH $scd2Ctes,
        |f AS (SELECT o_orderkey, o_custkey AS c_custkey,
        |        CAST(o_orderkey % 3 AS INTEGER) AS ver FROM orders),
        |j AS (SELECT f.ver, d.c_mktsegment, d.c_acctbal
        |      FROM f LEFT JOIN scd d ON d.c_custkey = f.c_custkey
        |        AND d.valid_from <= f.ver
        |        AND (d.valid_to IS NULL OR f.ver < d.valid_to))
        |SELECT ver, coalesce(c_mktsegment, 'NONE') AS segment,
        |  count(*) AS n_orders,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
        |    AS sum_acctbal
        |FROM j GROUP BY 1, 2
        |ORDER BY ver, segment""".stripMargin,
    // st6 emits the IDENTICAL diff through the streaming face (one
    // AvailableNow full-snapshot batch vs the seeded store) — same
    // oracle, proving batch/stream agreement on real data.
    "st6_stream_cdc" -> cdcOracleSql,
    "t10_oov_rate" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |wc AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        |vocab AS (SELECT w FROM wc ORDER BY c DESC, w LIMIT 10),
        |per AS (
        |  SELECT t.doc_id, count(*) AS n_words,
        |    count(CASE WHEN v.w IS NULL THEN 1 END) AS n_oov
        |  FROM tok t LEFT JOIN vocab v ON t.w = v.w
        |  GROUP BY t.doc_id)
        |SELECT doc_id, n_words, n_oov,
        |  floor(CAST(n_oov AS DOUBLE) / n_words * 10000 + 0.5) / 10000 AS oov_frac
        |FROM per ORDER BY doc_id""".stripMargin,
    "t11_mixture_rates" ->
      """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |m AS (SELECT min(n_docs) AS mn FROM c)
        |SELECT lang, n_docs,
        |  floor(CAST(mn AS DOUBLE) / n_docs * 1000000 + 0.5) / 1000000 AS rate
        |FROM c CROSS JOIN m ORDER BY lang""".stripMargin,
    "v2_quantized_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (
        |  SELECT vec_id,
        |    CASE WHEN m = 0 THEN list_transform(v, x -> 0.0)
        |         ELSE list_transform(v, x ->
        |           greatest(-127.0, least(127.0, floor(x / (m / 127.0) + 0.5)))) END AS qv
        |  FROM (SELECT vec_id, v,
        |          list_max(list_transform(v, x -> abs(x))) AS m FROM e)),
        |sims AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |    list_dot_product(p.qv, c.qv) /
        |      nullif(sqrt(list_dot_product(p.qv, p.qv))
        |             * sqrt(list_dot_product(c.qv, c.qv)), 0.0) AS qsim_raw
        |  FROM q p JOIN q c ON c.vec_id != p.vec_id
        |  WHERE p.vec_id < 5)
        |SELECT probe_id, cand_id,
        |  floor(qsim_raw * 1000000 + 0.5) / 1000000 AS qsim, rn
        |FROM (SELECT probe_id, cand_id, qsim_raw,
        |        row_number() OVER (PARTITION BY probe_id
        |          ORDER BY qsim_raw DESC, cand_id) AS rn
        |      FROM sims)
        |WHERE rn <= 5
        |ORDER BY probe_id, rn""".stripMargin,
    "s1_ann_topk" -> annOracleSql,
    "s2_ivf_seeded" -> {
      val cos = (a: String, b: String) =>
        s"list_dot_product($a, $b) / nullif(sqrt(list_dot_product($a, $a))" +
          s" * sqrt(list_dot_product($b, $b)), 0.0)"
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |seeds AS (SELECT vec_id AS list_id, v AS sv FROM e
         |          WHERE vec_id IN (${graft.analytics.VectorQueries.IvfSeedIds.mkString(", ")})),
         |ca AS (
         |  SELECT vec_id, v, list_id FROM (
         |    SELECT c.vec_id, c.v, s.list_id,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY ${cos("c.v", "s.sv")} DESC, s.list_id) AS ar
         |    FROM e c CROSS JOIN seeds s)
         |  WHERE ar = 1),
         |qa AS (
         |  SELECT vec_id AS query_id, v AS qv, list_id FROM (
         |    SELECT q.vec_id, q.v, s.list_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cos("q.v", "s.sv")} DESC, s.list_id) AS ar
         |    FROM e q CROSS JOIN seeds s WHERE q.vec_id < 5)
         |  WHERE ar <= 2),
         |sims AS (
         |  SELECT qa.query_id, ca.vec_id AS cand_id,
         |    ${cos("qa.qv", "ca.v")} AS sim_raw
         |  FROM qa JOIN ca USING (list_id)
         |  WHERE ca.vec_id != qa.query_id)
         |SELECT query_id, cand_id,
         |  floor(sim_raw * 1000000 + 0.5) / 1000000 AS cosine,
         |  CAST(rank AS INTEGER) AS rank
         |FROM (SELECT query_id, cand_id, sim_raw,
         |        row_number() OVER (PARTITION BY query_id
         |          ORDER BY sim_raw DESC, cand_id) AS rank
         |      FROM sims)
         |WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin
    },
    "s1b_ann_persisted" -> annPersistedOracleSql,
    // s1c: append == rebuild by construction (partition scheme = the
    // signature), so the incremental index shares s1b's oracle verbatim
    "s1c_ann_incremental" -> annPersistedOracleSql,
    "s1b_build_index" -> annBuildOracleSql,
    // d11: replay the seeded assignment, then the within-cluster
    // domination rule (neighbor at cos >= tau closer to the centroid,
    // ties to the smaller id); survivors are the non-dominated rows.
    "d11_semantic_dedup" -> semanticDedupOracle,
    // st4 runs the STREAMING SemDeDup path (AvailableNow single batch
    // freezes the quantizer on the full corpus = the batch operator's
    // seeds), so the batch oracle replays its survivors exactly
    "st4_stream_semdedup" -> semanticDedupOracle,
    "c2_corpus_build" ->
      s"""WITH n AS (
         |  SELECT doc_id, source, n_chars, text,
         |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),
         |         '\\s+', ' ', 'g')) AS norm_text
         |  FROM documents),
         |surv AS (
         |  SELECT doc_id, source, n_chars, text FROM (
         |    SELECT doc_id, source, n_chars, text,
         |      min(doc_id) OVER (PARTITION BY norm_text) AS keep
         |    FROM n WHERE len(norm_text) > 0)
         |  WHERE doc_id = keep),
         |q AS (
         |  SELECT doc_id, source, n_chars,
         |    (len(list_filter(ws, w -> list_contains(
         |       ['the','a','of','and','to','el','la','de','y','en','der','die','das','und','zu'], w)))::DOUBLE
         |       / len(ws)) * 0.4
         |    + (1.0 - len(list_filter(ws, w -> length(w) <= 2))::DOUBLE / len(ws)) * 0.4
         |    + least(((length(text) - (len(ws) - 1))::DOUBLE / len(ws)) / 10.0, 1.0) * 0.2
         |      AS score
         |  FROM (SELECT doc_id, source, n_chars, text,
         |          string_split(text, ' ') AS ws FROM surv)),
         |h AS (
         |  SELECT doc_id, source, n_chars, ${polyHash64Sql("w")} % 10000 AS bucket
         |  FROM (SELECT doc_id, source, n_chars,
         |          CAST(doc_id AS VARCHAR) || 'c2' AS w
         |        FROM q WHERE score >= 0.5))
         |SELECT CASE WHEN bucket < 8000 THEN 'train'
         |            WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split,
         |  source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM h GROUP BY 1, 2 ORDER BY split, source""".stripMargin,
    "t5_hash_split" ->
      s"""WITH h AS (
         |  SELECT n_chars, ${polyHash64Sql("w")} % 10000 AS bucket
         |  FROM (SELECT n_chars, CAST(doc_id AS VARCHAR) || 'v1' AS w FROM documents))
         |SELECT CASE WHEN bucket < 8000 THEN 'train'
         |            WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split,
         |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM h GROUP BY 1 ORDER BY split""".stripMargin,
    "t15_weighted_sample" -> weightedSampleOracleSql,
    // t15b/st23: the SAME oracle — the race keys are deterministic in
    // (doc_id, n_chars, salt), so bottom-k(bottom-k(A) ∪ B) =
    // bottom-k(A ∪ B): the incremental store and the streamed fold
    // must both equal the one-shot draw row-for-row.
    "t15b_weighted_sample_store" -> weightedSampleOracleSql,
    "st23_stream_weighted_sample" -> weightedSampleOracleSql,
    "t17_chunking" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    greatest(1, CAST(ceil((length(text) - 40)::DOUBLE / 160) AS INTEGER)) AS n_chunks
        |  FROM documents WHERE doc_id < 100),
        |c AS (
        |  SELECT doc_id, text, n_chunks,
        |    unnest(range(0, n_chunks)) AS i
        |  FROM d)
        |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx, n_chunks,
        |  CAST(length(substr(text, CAST(i * 160 + 1 AS BIGINT), 200)) AS INTEGER) AS chunk_len,
        |  substr(text, CAST(i * 160 + 1 AS BIGINT), 200) AS chunk_text
        |FROM c
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "t18_sequence_pack" ->
      s"""WITH nb AS (
         |  SELECT CAST((count(*) + 63) // 64 AS BIGINT) AS b FROM documents),
         |h AS (
         |  SELECT doc_id, n_chars, ${polyHash64Sql("w")} % (SELECT b FROM nb) AS bucket
         |  FROM (SELECT doc_id, n_chars,
         |          CAST(doc_id AS VARCHAR) || 'p1' AS w FROM documents)),
         |s AS (
         |  SELECT doc_id, n_chars, bucket,
         |    CAST(sum(n_chars) OVER (PARTITION BY bucket ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS e
         |  FROM h),
         |spans AS (
         |  SELECT doc_id, bucket, e - n_chars AS st, e,
         |    CAST(floor((e - n_chars)::DOUBLE / 2048) AS BIGINT) AS fp,
         |    greatest(CAST(floor((e - n_chars)::DOUBLE / 2048) AS BIGINT),
         |             CAST(floor((e - 1)::DOUBLE / 2048) AS BIGINT)) AS lp
         |  FROM s),
         |x AS (
         |  SELECT doc_id, bucket, st, e,
         |    unnest(range(fp, lp + 1)) AS pack_id
         |  FROM spans)
         |SELECT bucket, pack_id, doc_id,
         |  greatest(pack_id * 2048, st) - st AS slice_start,
         |  least((pack_id + 1) * 2048, e) - greatest(pack_id * 2048, st) AS slice_len
         |FROM x
         |ORDER BY bucket, pack_id, doc_id""".stripMargin,
    "t16_weighted_per_src" ->
      s"""WITH hh AS (
         |  SELECT source, doc_id, n_chars, ${polyHash64Sql("w")} AS hv
         |  FROM (SELECT source, doc_id, n_chars,
         |          CAST(doc_id AS VARCHAR) || 'v1' AS w FROM documents)),
         |r AS (
         |  SELECT source, doc_id, n_chars,
         |    -ln((((hv & 1073741823) * (hv & 1073741823) + (hv >> 30))
         |           % 1073741789 + 0.5) / 1073741789.0)
         |      / greatest(n_chars, 1) AS race
         |  FROM hh)
         |SELECT source, doc_id, n_chars, rn
         |FROM (SELECT source, doc_id, n_chars,
         |        row_number() OVER (PARTITION BY source
         |          ORDER BY race, doc_id) AS rn
         |      FROM r)
         |WHERE rn <= 10
         |ORDER BY source, rn""".stripMargin,
    "t6_stratified_sample" ->
      s"""WITH h AS (
         |  SELECT doc_id, lang, ${polyHash64Sql("w")} % 10000 AS bucket
         |  FROM (SELECT doc_id, lang, CAST(doc_id AS VARCHAR) || 's1' AS w FROM documents))
         |SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_id
         |FROM h
         |WHERE bucket < CASE lang WHEN 'en' THEN 5000 WHEN 'es' THEN 2500
         |                         WHEN 'de' THEN 1000 WHEN 'fr' THEN 10000 ELSE 0 END
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "t7_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
        |       '\s+', ' ', 'g')) AS norm_text,
        |  CAST(len(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
        |      '\s+', ' ', 'g'))) AS INTEGER) AS n_norm_chars
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin,
    // t35: first-seen computed over shingle STRINGS here vs 64-bit
    // digests in the engine — agreement proves the digest-keyed
    // grouping exact. count(CASE ...) keeps both counts BIGINT.
    "t35_novelty" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |                   for i in range(1, len(ws) - 1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |  WHERE len(ws) >= 3),
        |e AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |fs AS (SELECT g, min(doc_id) AS first_doc FROM e GROUP BY g)
        |SELECT e.doc_id, count(*) AS n_shingles,
        |  count(CASE WHEN fs.first_doc = e.doc_id THEN 1 END) AS n_novel,
        |  floor(count(CASE WHEN fs.first_doc = e.doc_id THEN 1 END)::DOUBLE
        |        / count(*) * 10000 + 0.5) / 10000 AS novelty
        |FROM e JOIN fs ON e.g = fs.g
        |GROUP BY e.doc_id
        |ORDER BY e.doc_id""".stripMargin,
    "t8_repetition" ->
      """WITH g AS (
        |  SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1]
        |                         for i in range(1, len(ws))]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |  WHERE len(ws) >= 2),
        |pg AS (SELECT doc_id, s, count(*) AS c FROM g GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(max(c) AS BIGINT) AS top_gram_count,
        |  CAST(sum(c) AS BIGINT) AS n_grams,
        |  floor(CAST(max(c) AS DOUBLE) / sum(c) * 10000 + 0.5) / 10000 AS top_gram_frac
        |FROM pg GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "c1_contamination" ->
      s"""WITH grams AS (
         |  SELECT doc_id, ${polyHash64Sql("w")} AS g
         |  FROM (
         |    SELECT doc_id,
         |      unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
         |              || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7]
         |              for i in range(1, len(ws) - 6)]) AS w
         |    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
         |    WHERE len(ws) >= 8)),
         |tg AS (SELECT DISTINCT doc_id AS train_id, g FROM grams WHERE doc_id % 10 <> 7),
         |eg AS (SELECT DISTINCT doc_id AS eval_id, g FROM grams WHERE doc_id % 10 = 7)
         |SELECT train_id, eval_id, count(*) AS n_shared
         |FROM tg JOIN eg USING (g)
         |GROUP BY 1, 2 ORDER BY train_id, eval_id""".stripMargin,
    "d8_duplicated_grams" ->
      s"""WITH g AS (
         |  SELECT DISTINCT doc_id, ${polyHash64Sql("w")} AS g
         |  FROM (
         |    SELECT doc_id,
         |      unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
         |              || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7]
         |              for i in range(1, len(ws) - 6)]) AS w
         |    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
         |    WHERE len(ws) >= 8)),
         |gc AS (SELECT g, count(*) AS dc FROM g GROUP BY g),
         |per AS (
         |  SELECT doc_id, count(*) AS n_grams,
         |    count(CASE WHEN dc >= 2 THEN 1 END) AS n_dup_grams
         |  FROM g JOIN gc USING (g) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(per.n_grams, 0) AS n_grams,
         |  coalesce(per.n_dup_grams, 0) AS n_dup_grams,
         |  CASE WHEN per.n_grams > 0
         |    THEN floor(CAST(per.n_dup_grams AS DOUBLE) / per.n_grams * 10000 + 0.5) / 10000
         |  END AS dup_frac
         |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // d10: positioned 8-gram hashes; a token is removed when any gram
    // covering it occurs in >= 2 documents; kept tokens re-join in order.
    "d10_span_strip" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    unnest([i - 1 for i in range(1, len(ws) + 1)]) AS pos,
         |    unnest(ws) AS w
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
         |grams AS (
         |  SELECT doc_id, pos, ${polyHash64Sql("w")} AS g FROM (
         |    SELECT doc_id,
         |      unnest([i - 1 for i in range(1, len(ws) - 6)]) AS pos,
         |      unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
         |              || ' ' || ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7]
         |              for i in range(1, len(ws) - 6)]) AS w
         |    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
         |    WHERE len(ws) >= 8)),
         |dup AS (
         |  SELECT g FROM (SELECT DISTINCT doc_id, g FROM grams)
         |  GROUP BY g HAVING count(*) >= 2),
         |covered AS (
         |  SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS pos
         |  FROM grams JOIN dup USING (g)),
         |kept AS (
         |  SELECT t.doc_id, t.pos, t.w FROM toks t
         |  LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
         |  WHERE c.pos IS NULL),
         |agg AS (
         |  SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS stripped_text,
         |    count(*) AS n_kept
         |  FROM kept GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
         |  CAST(len(string_split(d.text, ' ')) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
         |  coalesce(a.stripped_text, '') AS stripped_text
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "d6_neardup_components" ->
      (componentsCte + "\nSELECT node, component FROM comp ORDER BY node"),
    // d6b: the SAME oracle — root contraction is an exact union-find
    // merge, so the incremental label table must equal the full
    // recursive-CC rebuild bit-for-bit.
    "d6b_incremental_components" ->
      (componentsCte + "\nSELECT node, component FROM comp ORDER BY node"),
    // st18: the SAME oracle — every pair is discovered exactly when
    // its later doc's micro-batch arrives, and the per-batch root
    // contraction is an exact union-find fold, so the streamed label
    // store must equal the one-shot batch CC bit-for-bit.
    "st18_stream_components" ->
      (componentsCte + "\nSELECT node, component FROM comp ORDER BY node"),
    // d6c/st19: the SAME oracle once more — the bucket-partitioned
    // store changes the WRITE layout (dynamic overwrite of touched
    // component buckets), never the fold, so the store read back must
    // still equal the one-shot batch CC bit-for-bit.
    "d6c_bucketed_components" ->
      (componentsCte + "\nSELECT node, component FROM comp ORDER BY node"),
    "st19_stream_components_bucketed" ->
      (componentsCte + "\nSELECT node, component FROM comp ORDER BY node"),
    // del3: the takedown verb on the component store — affected
    // components recomputed from the surviving pair log must equal
    // the full recursive-CC rebuild over corpus-minus-deleted
    // (deleting a doc is a pairwise-local event: it removes exactly
    // the pairs naming it, so the rebuild's pair set IS the surviving
    // log and the CC folds agree bit-for-bit).
    "del3_takedown_components" ->
      (withoutDeletedDocs(componentsCte) +
        "\nSELECT node, component FROM comp ORDER BY node"),
    "d7_dedup_survivors" -> survivorsOracleSql,
    // d7b: the SAME oracle — survivorship is a pure readout over the
    // label store (which equals the rebuild bit-for-bit, the d6c
    // contract) plus doc quality.
    "d7b_incremental_survivors" -> survivorsOracleSql,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
        |  floor((sum(l_quantity) / count(*)) * 10000 + 0.5) / 10000 AS avg_qty,
        |  floor((CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*)) * 10000 + 0.5) / 10000 AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_priority_pivot" ->
      """SELECT o_orderpriority,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS finished_count,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS open_count,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS pending_count,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q3_region_rollup" ->
      """SELECT r_name,
        |  count(*) AS n_customers,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,
    "q4_revenue_by_month" ->
      """SELECT o_orderstatus,
        |  date_trunc('month', o_orderdate) AS order_month,
        |  CAST(round(sum(revenue), 2) AS DOUBLE) AS sum_revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN (SELECT l_orderkey,
        |        sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS revenue
        |      FROM lineitem GROUP BY l_orderkey) li
        |  ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus, date_trunc('month', o_orderdate)
        |ORDER BY o_orderstatus, order_month""".stripMargin,
    "u2_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |a AS (SELECT *, min(CASE WHEN event_type = 'signup' THEN ts END)
        |        OVER (PARTITION BY user_id) AS s FROM e),
        |b AS (SELECT *, min(CASE WHEN event_type = 'view' AND ts >= s THEN ts END)
        |        OVER (PARTITION BY user_id) AS v FROM a),
        |c AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts >= v THEN ts END)
        |        OVER (PARTITION BY user_id) AS c FROM b),
        |d AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= c THEN ts END)
        |        OVER (PARTITION BY user_id) AS p FROM c)
        |SELECT
        |  count(DISTINCT CASE WHEN s IS NOT NULL THEN user_id END) AS n_signup,
        |  count(DISTINCT CASE WHEN v IS NOT NULL THEN user_id END) AS n_view,
        |  count(DISTINCT CASE WHEN c IS NOT NULL THEN user_id END) AS n_click,
        |  count(DISTINCT CASE WHEN p IS NOT NULL THEN user_id END) AS n_purchase
        |FROM d""".stripMargin,
    "u3_cohort" ->
      """WITH e AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |a AS (SELECT user_id, day,
        |        min(day) OVER (PARTITION BY user_id) AS cohort FROM e)
        |SELECT cohort, day - cohort AS day_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM a GROUP BY cohort, day_offset
        |ORDER BY cohort, day_offset""".stripMargin,
    "z1_zorder_code" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  ${mortonSql("l_partkey", "l_suppkey")} AS z
         |FROM lineitem WHERE l_orderkey < 200
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    // j12: salting is semantics-invisible, so the oracle is the plain
    // join — byte-equality proves the salt changed partitioning only.
    "j12_salted_join" ->
      """SELECT c_mktsegment,
        |  count(*) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        |    AS sum_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "j8_bloom_prune" ->
      """SELECT date_trunc('month', o_orderdate) AS order_month,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2)
        |    AS DOUBLE) AS sum_revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000.0
        |GROUP BY 1 ORDER BY order_month""".stripMargin,
    "j9_bucketed_join" ->
      """SELECT o_orderstatus, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "j10_fuzzy_join" -> fuzzyAllPairsOracleSql,
    "st25_stream_fuzzy" -> fuzzyAllPairsOracleSql,
    // c4: all three ER stages replayed — quadratic levenshtein pairs
    // (blocking-completeness proof), conjunctive attribute agreement,
    // recursive-CTE components, canonical fold. DECIMAL balance sum.
    "c4_entity_resolution" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        |  FROM customer a JOIN customer b ON b.c_custkey > a.c_custkey
        |  WHERE levenshtein(a.c_name, b.c_name) <= 1
        |    AND a.c_mktsegment = b.c_mktsegment
        |    AND a.c_nationkey = b.c_nationkey),
        |undirected AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT a, a AS b FROM (SELECT DISTINCT a FROM undirected)
        |  UNION
        |  SELECT r.a, u.b FROM reach r JOIN undirected u ON r.b = u.a),
        |comp AS (SELECT a AS node, min(b) AS component FROM reach GROUP BY a),
        |stats AS (
        |  SELECT comp.component AS entity_id, count(*) AS n_members,
        |    CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
        |      AS total_acctbal
        |  FROM comp JOIN customer c ON comp.node = c.c_custkey
        |  GROUP BY comp.component)
        |SELECT s.entity_id, c.c_name AS canonical_name, s.n_members,
        |  s.total_acctbal
        |FROM stats s JOIN customer c ON s.entity_id = c.c_custkey
        |ORDER BY s.entity_id""".stripMargin,
    "q5_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q6_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q7b_topk_custom_op" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn
        |FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q7_topk_per_group" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn
        |FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3
        |ORDER BY l_suppkey, rn""".stripMargin,
    "q8_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "w8_asof_join" ->
      """WITH l AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'click'),
        |r AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    event_id AS view_id, value AS view_value
        |  FROM events WHERE event_type = 'view')
        |SELECT l.user_id, l.event_id,
        |  r.view_id AS prior_view_id, r.view_value AS prior_view_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.user_id, l.event_id""".stripMargin,
    // w16: hop assignment replayed — each event belongs to exactly
    // the two epoch-aligned 30-min buckets at and 30 min before its
    // own (b ≤ ts < b+60min holds for both, never a third).
    "w16_hopping_window" -> hoppingOracleSql,
    // st10 runs the IDENTICAL hopping aggregate through the
    // streaming-shared transform (stream ≡ batch proven in
    // StreamingSpec) — same oracle, the st6/st8 pattern.
    "st10_stream_hopping" -> hoppingOracleSql,
    // u5: both funnel stages replayed as ASOF + freshness CASE (the
    // w15 argument, applied twice); ASOF winner ambiguity among
    // same-timestamp qualifying clicks cannot reach the output (only
    // existence and timing are consumed, never which click won).
    "u5_window_funnel" ->
      """WITH v AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS v_id
        |  FROM events WHERE event_type = 'view'),
        |c AS (
        |  SELECT user_id, event_id AS c_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, event_id AS p_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'purchase'),
        |qc AS (
        |  SELECT c.user_id, c.c_id, c.ts
        |  FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts
        |  WHERE v.v_id IS NOT NULL AND c.ts - v.ts <= INTERVAL 1 HOUR),
        |qp AS (
        |  SELECT p.user_id, p.p_id
        |  FROM p ASOF LEFT JOIN qc ON p.user_id = qc.user_id AND p.ts >= qc.ts
        |  WHERE qc.c_id IS NOT NULL AND p.ts - qc.ts <= INTERVAL 1 HOUR),
        |base AS (
        |  SELECT user_id,
        |    count(CASE WHEN event_type = 'view' THEN 1 END) AS n_views
        |  FROM events GROUP BY user_id),
        |nqc AS (SELECT user_id, count(*) AS n FROM qc GROUP BY user_id),
        |nqp AS (SELECT user_id, count(*) AS n FROM qp GROUP BY user_id)
        |SELECT b.user_id, b.n_views,
        |  coalesce(nqc.n, 0) AS n_qual_clicks,
        |  coalesce(nqp.n, 0) AS n_qual_purchases,
        |  CASE WHEN coalesce(nqp.n, 0) > 0 THEN 3
        |       WHEN coalesce(nqc.n, 0) > 0 THEN 2
        |       WHEN b.n_views > 0 THEN 1 ELSE 0 END AS funnel_level
        |FROM base b LEFT JOIN nqc USING (user_id)
        |LEFT JOIN nqp USING (user_id)
        |ORDER BY b.user_id""".stripMargin,
    // w15: ASOF winner post-filtered by a freshness CASE — exact
    // because any earlier right row is older still, so an out-of-
    // tolerance winner means the true answer is null.
    "w15_asof_tolerance" -> asofToleranceOracleSql,
    // st11 emits the IDENTICAL enrichment through the streaming face
    // (four time-sliced micro-batches, one open view per user in the
    // state store) — same oracle, proving batch/stream agreement.
    "st11_stream_asof" -> asofToleranceOracleSql,
    "w9_asof_forward" ->
      """WITH l AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'click'),
        |r AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    event_id AS view_id, value AS view_value
        |  FROM events WHERE event_type = 'view')
        |SELECT l.user_id, l.event_id,
        |  r.view_id AS next_view_id, r.view_value AS next_view_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
        |ORDER BY l.user_id, l.event_id""".stripMargin,
    "w10_range_join" ->
      """WITH anchors AS (
        |  SELECT event_id AS anchor_id,
        |    CAST(ts AS TIMESTAMP) AS w_start,
        |    CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE AS w_end
        |  FROM events WHERE event_type = 'purchase'
        |  ORDER BY value DESC NULLS LAST, event_id LIMIT 25)
        |SELECT a.anchor_id,
        |  count(e.event_id) AS n_errors,
        |  max(e.value) AS max_err_value
        |FROM anchors a
        |LEFT JOIN events e
        |  ON e.event_type = 'error'
        | AND CAST(e.ts AS TIMESTAMP) >= a.w_start
        | AND CAST(e.ts AS TIMESTAMP) < a.w_end
        |GROUP BY a.anchor_id
        |ORDER BY a.anchor_id""".stripMargin,
    "t14_topk_per_source" ->
      """WITH f AS (
        |  SELECT source, doc_id,
        |    len(list_filter(ws, w -> list_contains(
        |      ['the','a','of','and','to','el','la','de','y','en','der','die','das','und','zu'], w)))::DOUBLE
        |      / len(ws) * 0.4
        |    + (1.0 - len(list_filter(ws, w -> length(w) <= 2))::DOUBLE / len(ws)) * 0.4
        |    + least((length(text) - (len(ws) - 1))::DOUBLE / len(ws) / 10.0, 1.0) * 0.2 AS q
        |  FROM (SELECT source, doc_id, text, string_split(text, ' ') AS ws FROM documents))
        |SELECT source, doc_id,
        |  floor(q * 10000 + 0.5) / 10000 AS quality_score, rn
        |FROM (SELECT source, doc_id, q,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY q DESC, doc_id) AS rn
        |      FROM f)
        |WHERE rn <= 5
        |ORDER BY source, rn""".stripMargin,
    "q9_having" ->
      """SELECT l_suppkey, count(*) AS n_items,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
        |FROM lineitem
        |GROUP BY l_suppkey
        |HAVING count(*) > 620
        |ORDER BY l_suppkey""".stripMargin,
    "q10_date_arith" ->
      """SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since,
        |  count(*) AS n_events
        |FROM events
        |GROUP BY 1
        |ORDER BY days_since""".stripMargin,
    "q20_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INTEGER) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INTEGER) AS g_status,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), (l_linestatus))
        |ORDER BY g_flag, g_status,
        |  l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "t29_collocations" ->
      """WITH words AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |un AS (SELECT w, count(*) AS c FROM words GROUP BY w),
        |bgr AS (
        |  SELECT unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS s
        |  FROM (SELECT string_split(text, ' ') AS ws FROM documents)
        |  WHERE len(ws) >= 2),
        |bg AS (SELECT s, count(*) AS c12 FROM bgr GROUP BY s),
        |tot AS (
        |  SELECT (SELECT sum(c) FROM un) AS n, (SELECT sum(c12) FROM bg) AS b),
        |sc AS (
        |  SELECT string_split(bg.s, ' ')[1] AS w1, string_split(bg.s, ' ')[2] AS w2,
        |    bg.c12,
        |    floor(ln((CAST(bg.c12 AS DOUBLE) / t.b) /
        |      ((CAST(u1.c AS DOUBLE) / t.n) * (CAST(u2.c AS DOUBLE) / t.n)))
        |      * 10000 + 0.5) / 10000 AS pmi
        |  FROM bg
        |  JOIN un u1 ON u1.w = string_split(bg.s, ' ')[1]
        |  JOIN un u2 ON u2.w = string_split(bg.s, ' ')[2]
        |  CROSS JOIN tot t
        |  WHERE bg.c12 >= 5)
        |SELECT w1, w2, c12, pmi FROM sc
        |ORDER BY pmi DESC, w1, w2
        |LIMIT 20""".stripMargin,
    "q13_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q14_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q15_unpivot" ->
      """WITH wide AS (
        |  SELECT o_orderpriority,
        |    count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS finished,
        |    count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS open,
        |    count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS pending
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, 'finished' AS status_name, finished AS n FROM wide
        |UNION ALL
        |SELECT o_orderpriority, 'open', open FROM wide
        |UNION ALL
        |SELECT o_orderpriority, 'pending', pending FROM wide
        |ORDER BY o_orderpriority, status_name""".stripMargin,
    "q16_rank_stats" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drank
        |FROM lineitem
        |WHERE l_suppkey < 10
        |WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin,
    "q17_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS exact_distinct,
        |  true AS within_bound
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q18_approx_median" ->
      """SELECT l_returnflag, true AS within_bound
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // st7: under-k Misra-Gries is exact, so the streamed state-store
    // merge must reproduce plain GROUP BY counts bit-for-bit.
    "st7_stream_heavy_hitters" ->
      """SELECT o_orderpriority AS priority, o_orderstatus AS status,
        |  count(*) AS est
        |FROM orders GROUP BY 1, 2
        |ORDER BY priority, status""".stripMargin,
    "q19_heavy_hitters" ->
      """SELECT o_orderstatus, o_orderpriority AS priority,
        |  count(*) AS est
        |FROM orders
        |GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, priority""".stripMargin,
    // q21: the whole count-min sketch replayed — hash rows from the
    // shared PolyHash fragment, constants read off ops.Sketches so the
    // two engines cannot drift.
    // st8: the SAME oracle — the streamed state-store build must
    // produce the identical sketch, cell for cell, or the minima shift.
    "st8_stream_count_min" -> cmOracleSql,
    "q21_count_min" -> cmOracleSql,
    // q27: the SAME oracle — counter cells merge by ADDITION (linear),
    // so the store+delta table must equal the full rebuild bit-for-bit.
    "q27_cms_store" -> cmOracleSql,
    "q23_hll_register_store" -> hllOracleSql,
    "q23b_hll64_register_store" -> hll64OracleSql,
    "q25_kmv_store" -> kmvOracleSql,
    // st15: the SAME oracle — the streamed state-store bottom-k must
    // equal the batch sketch bit-for-bit (lossless minK merge).
    "st15_stream_kmv" -> kmvOracleSql,
    "q26_kmv_overlap" -> kmvOverlapOracleSql,
    // q26b: q26's replay with one-sided membership counts and the
    // per-partkey year-flag exact sides.
    "q26b_kmv_delta" -> kmvDeltaOracleSql,
    // q26c: the k=256 fine-regime replay with both membership counts
    "q26c_kmv_fine" -> kmvFineOracleSql,
    "ov1_overlap_matrix" -> kmvMatrixOracleSql,
    // ov1b: the SAME oracle — the store+delta min-k merge is lossless,
    // so the incrementally-maintained matrix must equal the
    // full-corpus rebuild bit-for-bit.
    "ov1b_overlap_store" -> kmvMatrixOracleSql,
    "ov2_overlap_sparse" -> kmvMatrixSparseOracleSql,
    // st17: the SAME oracle — streamed state-store sketches min-k-merge
    // losslessly, so the final matrix must equal the batch build.
    "st17_stream_overlap" -> kmvMatrixOracleSql,
    // st13: the SAME oracle — the streamed state-store register build
    // must equal the batch build bit-for-bit (lossless max-merge).
    "st13_stream_hll" -> hllOracleSql,
    // q24: full-rebuild histogram replay; the bracket booleans are
    // COMPUTED from raw rows on both engines, not asserted literals.
    // st14: the SAME oracle — the streamed state-store bin build must
    // equal the batch histogram bit-for-bit (lossless sum-merge).
    "st14_stream_hist" -> histOracleSql,
    "q24_hist_quantile_store" -> histOracleSql,
    "q11_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q12_lag_ntile" ->
      """SELECT o_custkey, o_orderkey,
        |  date_diff('day',
        |    CAST(lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS DATE),
        |    CAST(o_orderdate AS DATE)) AS days_since_prev,
        |  ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS value_quartile
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "p1_word_filter" ->
      """SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS n_words
        |FROM documents
        |WHERE len(regexp_split_to_array(trim(text), '\s+')) > 3
        |ORDER BY doc_id""".stripMargin,
    "p3_range_filter" ->
      """SELECT doc_id, source
        |FROM documents
        |WHERE source BETWEEN 'src2' AND 'src5'
        |ORDER BY doc_id""".stripMargin,
    "p4_type_classifier" ->
      """SELECT part_class, count(*) AS n_parts FROM (
        |  SELECT CASE
        |    WHEN upper(p_name) LIKE '%WIDGET%' THEN 'Widget'
        |    WHEN upper(p_name) LIKE '%RED WIDGET%' THEN 'RedWidget'
        |    WHEN upper(p_name) LIKE '%BOLT%' THEN 'Bolt'
        |    ELSE 'Other' END AS part_class
        |  FROM part)
        |GROUP BY part_class
        |ORDER BY part_class""".stripMargin,
    "p5_null_guard" ->
      """SELECT event_id,
        |  CASE WHEN value IS NOT NULL AND value > 100
        |    THEN floor(((value - 100.0) / 1000.0) * 1000000 + 0.5) / 1000000 END AS duration_s,
        |  floor((value / nullif(CAST(user_id AS DOUBLE), 0.0)) * 10000 + 0.5) / 10000 AS value_per_user
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "f1_priority_parse" ->
      """SELECT split_part(o_orderpriority, '-', 1) AS priority_code,
        |  replace(substring(o_orderpriority, position('-' IN o_orderpriority) + 1),
        |    ' ', '_') AS priority_name,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY priority_code""".stripMargin,
    "f3_key_extract" ->
      """SELECT c_custkey,
        |  CAST(regexp_extract(c_name, '#(\d+)', 1) AS BIGINT) AS name_key,
        |  CAST(regexp_extract(c_name, '#(\d+)', 1) AS BIGINT) = c_custkey AS key_matches
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "f5_text_projections" ->
      """SELECT doc_id, length(text) AS text_len,
        |  lang || ':' || source AS label,
        |  split_part(text, ' ', 1) AS first_word
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "f8_math" ->
      """SELECT p_partkey,
        |  floor(sqrt(p_retailprice) * 1000000 + 0.5) / 1000000 AS sqrt_price,
        |  floor((p_retailprice * p_retailprice) * 10000 + 0.5) / 10000 AS price_sq,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |  p_partkey % 7 AS key_mod7
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "f10_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0)) AS BIGINT) AS sum_k,
        |  count(*) AS n_events
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "f11_daily_rollup" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  count(*) AS n_events,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1
        |ORDER BY day""".stripMargin,
    "a1_weighted_vec_mean" ->
      """SELECT label, dim,
        |  floor((sum(x * w) / sum(w)) * 100000 + 0.5) / 100000 AS wmean_val
        |FROM (
        |  SELECT label,
        |    generate_subscripts(embedding, 1) AS dim,
        |    unnest(CAST(embedding AS DOUBLE[])) AS x,
        |    CAST(vec_id % 7 + 1 AS DOUBLE) AS w
        |  FROM embeddings)
        |GROUP BY label, dim
        |ORDER BY label, dim""".stripMargin,
    "v1_cosine_top5" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sims AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
        |    list_dot_product(p.v, c.v) /
        |      nullif(sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(c.v, c.v)), 0.0) AS sim_raw
        |  FROM e p JOIN e c ON c.vec_id != p.vec_id
        |  WHERE p.vec_id < 5)
        |SELECT probe_id, cand_id,
        |  floor(sim_raw * 1000000 + 0.5) / 1000000 AS sim, rn
        |FROM (
        |  SELECT probe_id, cand_id, sim_raw,
        |    row_number() OVER (PARTITION BY probe_id
        |      ORDER BY sim_raw DESC, cand_id) AS rn
        |  FROM sims)
        |WHERE rn <= 5
        |ORDER BY probe_id, rn""".stripMargin,
    "w4_centroid_rep" ->
      """WITH ex AS (
        |  SELECT label, vec_id,
        |    generate_subscripts(embedding, 1) AS dim,
        |    unnest(CAST(embedding AS DOUBLE[])) AS x
        |  FROM embeddings),
        |cent AS (SELECT label, dim, avg(x) AS c FROM ex GROUP BY label, dim),
        |dist AS (
        |  SELECT ex.label, vec_id, sum((x - c) * (x - c)) AS d
        |  FROM ex JOIN cent ON ex.label = cent.label AND ex.dim = cent.dim
        |  GROUP BY ex.label, vec_id)
        |SELECT label, vec_id, floor(d * 1000000 + 0.5) / 1000000 AS dist
        |FROM (SELECT label, vec_id, d,
        |        row_number() OVER (PARTITION BY label ORDER BY d, vec_id) AS rn
        |      FROM dist)
        |WHERE rn = 1
        |ORDER BY label""".stripMargin,
    "a7_label_stats" ->
      """SELECT label, count(*) AS cluster_size,
        |  floor(avg(CAST(embedding[1] AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS mean_x,
        |  floor(stddev_samp(CAST(embedding[1] AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS std_x
        |FROM embeddings
        |GROUP BY label
        |ORDER BY label""".stripMargin,
    "g1_word_explode" ->
      """SELECT doc_id,
        |  generate_subscripts(string_split(text, ' '), 1) AS word_pos,
        |  unnest(string_split(text, ' ')) AS word
        |FROM documents
        |WHERE doc_id < 100
        |ORDER BY doc_id, word_pos""".stripMargin,
    "g2_ordered_reassembly" ->
      """SELECT doc_id, count(*) AS n_words,
        |  min(word_pos) - 1 AS min_pos,
        |  max(word_pos) - 1 AS max_pos,
        |  string_agg(word, ' ' ORDER BY word_pos) = any_value(text) AS roundtrip_ok
        |FROM (
        |  SELECT doc_id, text,
        |    generate_subscripts(string_split(text, ' '), 1) AS word_pos,
        |    unnest(string_split(text, ' ')) AS word
        |  FROM documents WHERE doc_id < 100)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "g3_transcript_flatten" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
        |    unnest(string_split(text, ' ')) AS word
        |  FROM documents WHERE doc_id < 40),
        |blk AS (
        |  SELECT doc_id, pos // 4 AS blk,
        |    string_agg(word, ' ' ORDER BY pos) AS text,
        |    count(*) AS nw
        |  FROM w GROUP BY doc_id, pos // 4),
        |kept AS (
        |  SELECT doc_id, blk, text, nw,
        |    CAST(2000 + doc_id % 10 AS VARCHAR) || '_doc-' || doc_id AS case_id,
        |    blk // 6 AS section_id, (blk // 3) % 2 AS turn_idx,
        |    blk % 3 AS block_idx, blk // 3 AS turn_g
        |  FROM blk WHERE nw > 3),
        |idx AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY blk) - 1 AS utterance_index,
        |    coalesce(sum(length(text) + 1) OVER (PARTITION BY doc_id ORDER BY blk
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS char_start_offset
        |  FROM kept)
        |SELECT case_id, case_id || '.json' AS oa_id,
        |  CAST(section_id AS INTEGER) AS section_id,
        |  CAST(turn_idx AS INTEGER) AS turn_idx,
        |  CAST(block_idx AS INTEGER) AS block_idx,
        |  'spk' || (turn_g % 4) AS speaker_id,
        |  ['JUSTICE ALPHA', 'MR. BETA', 'MS. GAMMA',
        |   'GENERAL DELTA'][CAST(turn_g % 4 + 1 AS INT)] AS speaker_name,
        |  text, blk * 1500 AS start_time_ms, blk * 1500 + 1250 AS end_time_ms,
        |  CAST(utterance_index AS INTEGER) AS utterance_index,
        |  CAST(char_start_offset AS BIGINT) AS char_start_offset,
        |  CAST(char_start_offset + length(text) AS BIGINT) AS char_end_offset,
        |  CAST(nw AS INTEGER) AS word_count,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9_'']+|[^A-Za-z0-9_''\s]')) AS INTEGER) AS token_count,
        |  case_id || '_utterance_' || utterance_index AS id
        |FROM idx
        |ORDER BY case_id, utterance_index""".stripMargin,
    "w1_event_index" ->
      """SELECT user_id, event_id,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id) - 1 AS event_idx
        |FROM events
        |WHERE user_id < 20
        |ORDER BY user_id, event_idx""".stripMargin,
    "d1_exact_dedup" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 100)
        |GROUP BY text
        |HAVING count(*) > 1
        |ORDER BY keep_id""".stripMargin,
    "d2_minhash_neardup" -> minhashBruteOracleSql,
    // st5 runs the STREAMING MinHash dedup path (AvailableNow single
    // batch against an empty signature store) whose pair sink equals
    // the d2 batch result — same brute-force oracle replays it.
    "st5_stream_minhash" -> minhashBruteOracleSql,
    // del1/del2: the r16 takedown verb — the post-delete signature
    // store's pairs / pair log must equal the FULL-REBUILD brute-force
    // oracle over corpus-minus-deleted, verbatim (the d9 restriction
    // discipline in reverse: the engine deletes, the oracle rebuilds).
    "del1_takedown_sigs" -> withoutDeletedDocs(minhashBruteOracleSql),
    "del2_takedown_pairlog" -> withoutDeletedDocs(minhashBruteOracleSql),
    // st26: the takedown verb as a STREAM op — ingest batches then a
    // delete batch, the pair sink drained after both; the SAME
    // corpus-minus-deleted oracle replays it (pairs that formed before
    // the delete and name a deleted doc are removed in-stream; pairs
    // among survivors all present).
    "st26_stream_takedown" -> withoutDeletedDocs(minhashBruteOracleSql),
    "d3_simhash_neardup" -> simhashOracleSql,
    "d3b_simhash_wide" -> simhashWideOracleSql,
    "d3d_simhash_wide4" -> simhashWide4OracleSql,
    "d3c_incremental_simhash" -> simhashIncrementalOracleSql,
    // d11b: assignment of EVERY vector against the frozen corpus-derived
    // seeds replays the store build + the delta probe in one pass;
    // store neighbors (vec_id % 10 != 3) dominate unconditionally,
    // delta neighbors by the batch rule.
    "d11b_incremental_semdedup" -> {
      val cos = (a: String, b: String) =>
        s"list_dot_product($a, $b) / nullif(sqrt(list_dot_product($a, $a))" +
          s" * sqrt(list_dot_product($b, $b)), 0.0)"
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |corpus AS (SELECT * FROM e WHERE vec_id % 10 != 3),
         |st AS (SELECT greatest(CAST(ceil(sqrt(count(*))) AS BIGINT), 1) AS s FROM corpus),
         |seeds AS (SELECT vec_id AS list_id, v AS sv FROM corpus, st
         |          WHERE vec_id % st.s = 0),
         |ca AS (
         |  SELECT vec_id, v, list_id AS cluster_id, csim FROM (
         |    SELECT c.vec_id, c.v, s.list_id,
         |      ${cos("c.v", "s.sv")} AS csim,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY ${cos("c.v", "s.sv")} DESC, s.list_id) AS ar
         |    FROM e c CROSS JOIN seeds s)
         |  WHERE ar = 1),
         |dom AS (
         |  SELECT DISTINCT x.vec_id
         |  FROM ca x JOIN ca y
         |    ON x.cluster_id = y.cluster_id AND x.vec_id != y.vec_id
         |  WHERE x.vec_id % 10 = 3
         |    AND ${cos("x.v", "y.v")} >= 0.45
         |    AND (y.vec_id % 10 != 3
         |         OR y.csim > x.csim OR (y.csim = x.csim AND y.vec_id < x.vec_id)))
         |SELECT ca.vec_id, ca.cluster_id,
         |  floor(ca.csim * 1000000 + 0.5) / 1000000 AS centroid_sim
         |FROM ca LEFT JOIN dom ON ca.vec_id = dom.vec_id
         |WHERE ca.vec_id % 10 = 3 AND dom.vec_id IS NULL
         |ORDER BY ca.vec_id""".stripMargin
    },
    "d9_incremental_neardup" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |                   for i in range(1, len(ws) - 1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |  WHERE len(ws) >= 3)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  floor((len(list_intersect(a.s, b.s))::DOUBLE
        |         / len(list_distinct(a.s || b.s))) * 10000 + 0.5) / 10000 AS jaccard
        |FROM sh a JOIN sh b ON b.doc_id > a.doc_id
        |WHERE (a.doc_id % 10 = 3 OR b.doc_id % 10 = 3)
        |  AND len(list_intersect(a.s, b.s))::DOUBLE
        |      / len(list_distinct(a.s || b.s)) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    "t12_surprisal" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |wc AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        |tot AS (SELECT sum(c) AS total FROM wc),
        |per AS (
        |  SELECT doc_id, count(*) AS n_words,
        |    avg(log2(total) - log2(c)) AS mean_surprisal
        |  FROM tok JOIN wc USING (w) CROSS JOIN tot
        |  GROUP BY doc_id)
        |SELECT doc_id, n_words,
        |  floor(mean_surprisal * 10000 + 0.5) / 10000 AS mean_surprisal
        |FROM per ORDER BY doc_id""".stripMargin,
    "t13_char_entropy" ->
      """WITH c AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        |pc AS (SELECT doc_id, ch, count(*) AS cnt FROM c GROUP BY 1, 2),
        |per AS (
        |  SELECT doc_id, sum(cnt) AS n,
        |    sum(cnt * log2(cnt)) AS s
        |  FROM pc GROUP BY doc_id)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
        |  floor((log2(n) - s / n) * 10000 + 0.5) / 10000 AS entropy
        |FROM per ORDER BY doc_id""".stripMargin,
    "m2_frame_sample" ->
      """SELECT doc_id AS media_id,
        |  CAST(unnest(range(0, (doc_id % 30 + 1) * 24, 8)) AS INTEGER) AS frame_idx
        |FROM documents
        |WHERE doc_id % 3 = 2
        |ORDER BY media_id, frame_idx""".stripMargin,
    "d4_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |                   for i in range(1, len(ws) - 1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |        FROM documents WHERE doc_id < 300)
        |  WHERE len(ws) >= 3)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  floor((len(list_intersect(a.s, b.s))::DOUBLE
        |         / len(list_distinct(a.s || b.s))) * 10000 + 0.5) / 10000 AS jaccard
        |FROM sh a JOIN sh b ON b.doc_id > a.doc_id
        |WHERE len(list_intersect(a.s, b.s))::DOUBLE
        |      / len(list_distinct(a.s || b.s)) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    // j11b/j11c: brute force restricted to pairs touching the delta
    // split — the bucketed face must produce the identical result.
    "j11c_bucketed_setsim" -> setSimDeltaOracleSql,
    "j11b_incr_setsim" -> setSimDeltaOracleSql,
    // j13: DIRECTED containment brute-forced over the same derived
    // excerpt fixture (excerpt = first ceil(0.4 n) words, integer-exact
    // (2n+4)//5, min 3, id +100000).
    "j13_containment_join" ->
      """WITH d0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
        |e0 AS (SELECT doc_id + 100000 AS doc_id,
        |    array_to_string(
        |      list_slice(ws, 1, CAST(greatest((len(ws) * 2 + 4) // 5, 3) AS INT)),
        |      ' ') AS text
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM d0)),
        |u AS (SELECT * FROM d0 UNION ALL SELECT * FROM e0),
        |sh AS (SELECT doc_id,
        |    list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |                   for i in range(1, len(ws) - 1)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM u)
        |  WHERE len(ws) >= 3)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  floor(len(list_intersect(a.s, b.s))::DOUBLE / len(a.s) * 10000 + 0.5)
        |    / 10000 AS containment
        |FROM sh a JOIN sh b ON a.doc_id != b.doc_id
        |WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(a.s) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,
    "j11_setsim_join" -> setSimFullOracleSql,
    // st24: the streamed pair sink must equal the one-shot batch join
    // (every pair is found when its later doc arrives) — j11 verbatim
    "st24_stream_setsim" -> setSimFullOracleSql,
    // v3: per-anchor argmax under the non-duplicate constraint,
    // unrounded-cosine tie-break by id — the TopKPerGroup semantics.
    // Fixture = base + near-dup twin (excluded by the constraint) +
    // planted HARD negative at cosine ~0.95 (the argmax).
    "v3_hard_negatives" ->
      """WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id < 2000),
        |e AS (SELECT vec_id, v FROM e0
        |      UNION ALL
        |      SELECT vec_id + 1000000, [v[1] + 0.001] || v[2:] FROM e0
        |      UNION ALL
        |      SELECT vec_id + 2000000, [v[1] + 0.33] || v[2:] FROM e0),
        |p AS (SELECT a.vec_id, b.vec_id AS neg_id,
        |        list_dot_product(a.v, b.v) /
        |        nullif(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)), 0.0) AS cosine
        |      FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |f AS (SELECT vec_id, neg_id, cosine,
        |        row_number() OVER (PARTITION BY vec_id
        |                           ORDER BY cosine DESC, neg_id) AS rn
        |      FROM p WHERE cosine < 0.99)
        |SELECT vec_id, neg_id, floor(cosine * 1000000 + 0.5) / 1000000 AS cosine
        |FROM f WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    // v3b: the SHORTLIST path replayed end-to-end — seeded-IVF
    // assignment (nearest seed, ties to lower list), nProbe=5 probing,
    // the non-duplicate constraint, then the per-anchor argmax. Unlike
    // v3's brute-force oracle this gates the approximate algorithm
    // itself, so a probing or assignment drift fails the hash.
    "v3b_hard_neg_ann" -> {
      val cos = (a: String, b: String) =>
        s"list_dot_product($a, $b) / nullif(sqrt(list_dot_product($a, $a))" +
          s" * sqrt(list_dot_product($b, $b)), 0.0)"
      s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings WHERE vec_id < 2000),
         |e AS (SELECT vec_id, v FROM e0
         |      UNION ALL
         |      SELECT vec_id + 1000000, [v[1] + 0.001] || v[2:] FROM e0
         |      UNION ALL
         |      SELECT vec_id + 2000000, [v[1] + 0.33] || v[2:] FROM e0),
         |seeds AS (SELECT vec_id AS list_id, v AS sv FROM e
         |          WHERE vec_id IN (${graft.analytics.VectorQueries.IvfSeedIds.mkString(", ")})),
         |ca AS (
         |  SELECT vec_id, v, list_id FROM (
         |    SELECT c.vec_id, c.v, s.list_id,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY ${cos("c.v", "s.sv")} DESC, s.list_id) AS ar
         |    FROM e c CROSS JOIN seeds s)
         |  WHERE ar = 1),
         |qa AS (
         |  SELECT vec_id AS anchor_id, v AS qv, list_id FROM (
         |    SELECT q.vec_id, q.v, s.list_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cos("q.v", "s.sv")} DESC, s.list_id) AS ar
         |    FROM e q CROSS JOIN seeds s)
         |  WHERE ar <= 5),
         |sims AS (
         |  SELECT qa.anchor_id, ca.vec_id AS cand_id,
         |    ${cos("qa.qv", "ca.v")} AS sim_raw
         |  FROM qa JOIN ca USING (list_id)
         |  WHERE ca.vec_id != qa.anchor_id)
         |SELECT anchor_id AS vec_id, cand_id AS neg_id,
         |  floor(sim_raw * 1000000 + 0.5) / 1000000 AS cosine
         |FROM (SELECT anchor_id, cand_id, sim_raw,
         |        row_number() OVER (PARTITION BY anchor_id
         |          ORDER BY sim_raw DESC, cand_id) AS rn
         |      FROM sims WHERE sim_raw < 0.99)
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin
    },
    // knn1: the k-NN graph replayed exactly — same seeded assignment +
    // probing blocks as v3b (raw corpus, no fixture union), nProbe=3,
    // rank rn <= 5, no dup filter.
    "knn1_graph" -> knnGraphOracleSql,
    // knn1c: the SAME oracle — a refresh recomputes every anchor's
    // edges from the stored members through the frozen quantizer, so
    // a store that went build → append → refresh must equal the
    // from-scratch full-corpus build bit-for-bit.
    "knn1c_graph_refresh" -> knnGraphOracleSql,
  ) ++ oracleSqlPart2

  /** knn1/knn1c oracle: the k-NN graph replayed exactly over the full
    * corpus — seeded assignment (ar = 1), nProbe = 3 probing, top-5
    * rank — shared by the build and refresh faces. */
  private lazy val knnGraphOracleSql: String = {
    val cos = (a: String, b: String) =>
      s"list_dot_product($a, $b) / nullif(sqrt(list_dot_product($a, $a))" +
        s" * sqrt(list_dot_product($b, $b)), 0.0)"
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings),
         |seeds AS (SELECT vec_id AS list_id, v AS sv FROM e
         |          WHERE vec_id IN (${graft.analytics.VectorQueries.IvfSeedIds.mkString(", ")})),
         |ca AS (
         |  SELECT vec_id, v, list_id FROM (
         |    SELECT c.vec_id, c.v, s.list_id,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY ${cos("c.v", "s.sv")} DESC, s.list_id) AS ar
         |    FROM e c CROSS JOIN seeds s)
         |  WHERE ar = 1),
         |qa AS (
         |  SELECT vec_id AS anchor_id, v AS qv, list_id FROM (
         |    SELECT q.vec_id, q.v, s.list_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cos("q.v", "s.sv")} DESC, s.list_id) AS ar
         |    FROM e q CROSS JOIN seeds s)
         |  WHERE ar <= 3),
         |sims AS (
         |  SELECT qa.anchor_id, ca.vec_id AS cand_id,
         |    ${cos("qa.qv", "ca.v")} AS sim_raw
         |  FROM qa JOIN ca USING (list_id)
         |  WHERE ca.vec_id != qa.anchor_id)
         |SELECT anchor_id AS vec_id, cand_id AS nbr_id,
         |  floor(sim_raw * 1000000 + 0.5) / 1000000 AS cosine, rn AS rank
         |FROM (SELECT anchor_id, cand_id, sim_raw,
         |        row_number() OVER (PARTITION BY anchor_id
         |          ORDER BY sim_raw DESC, cand_id) AS rn
         |      FROM sims)
         |WHERE rn <= 5 ORDER BY vec_id, rank""".stripMargin
  }

  private lazy val oracleSqlPart2: Map[String, String] = Map(
    // knn2: knn1's graph build + the 4dp data-adaptive decile cut
    // (ORDER BY/LIMIT with ties ≡ the histogram read-off) + the
    // d6-style recursive-CTE components, with singleton clusters for
    // vectors whose every edge falls below the cut.
    "knn2_semantic_clusters" -> {
      val cos = (a: String, b: String) =>
        s"list_dot_product($a, $b) / nullif(sqrt(list_dot_product($a, $a))" +
          s" * sqrt(list_dot_product($b, $b)), 0.0)"
      s"""WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings),
         |seeds AS (SELECT vec_id AS list_id, v AS sv FROM e
         |          WHERE vec_id IN (${graft.analytics.VectorQueries.IvfSeedIds.mkString(", ")})),
         |ca AS (
         |  SELECT vec_id, v, list_id FROM (
         |    SELECT c.vec_id, c.v, s.list_id,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY ${cos("c.v", "s.sv")} DESC, s.list_id) AS ar
         |    FROM e c CROSS JOIN seeds s)
         |  WHERE ar = 1),
         |qa AS (
         |  SELECT vec_id AS anchor_id, v AS qv, list_id FROM (
         |    SELECT q.vec_id, q.v, s.list_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cos("q.v", "s.sv")} DESC, s.list_id) AS ar
         |    FROM e q CROSS JOIN seeds s)
         |  WHERE ar <= 3),
         |sims AS (
         |  SELECT qa.anchor_id, ca.vec_id AS cand_id,
         |    ${cos("qa.qv", "ca.v")} AS sim_raw
         |  FROM qa JOIN ca USING (list_id)
         |  WHERE ca.vec_id != qa.anchor_id),
         |edges AS MATERIALIZED (
         |  SELECT anchor_id, cand_id,
         |    floor(sim_raw * 10000 + 0.5) / 10000 AS h
         |  FROM (SELECT anchor_id, cand_id, sim_raw,
         |          row_number() OVER (PARTITION BY anchor_id
         |            ORDER BY sim_raw DESC, cand_id) AS rn
         |        FROM sims)
         |  WHERE rn <= 5),
         |thr AS (SELECT min(h) AS t FROM (SELECT h FROM edges ORDER BY h DESC
         |        LIMIT (SELECT CAST(ceil(0.1 * count(*)) AS BIGINT) FROM edges))),
         |und AS MATERIALIZED (
         |  SELECT anchor_id AS a, cand_id AS b FROM edges, thr WHERE h >= t
         |  UNION
         |  SELECT cand_id, anchor_id FROM edges, thr WHERE h >= t),
         |reach AS (
         |  SELECT a, a AS b FROM (SELECT DISTINCT a FROM und)
         |  UNION
         |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
         |comp AS (SELECT a AS node, min(b) AS component FROM reach GROUP BY a)
         |SELECT coalesce(c.component, e.vec_id) AS cluster,
         |  count(*) AS n_members, min(e.vec_id) AS keep_id
         |FROM e LEFT JOIN comp c ON e.vec_id = c.node
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // knn1b: the incremental graph store replayed as its TWO
    // generations — base anchors see base candidates (the build), delta
    // anchors see ALL candidates (the append runs after delta members
    // land) — one sims CTE with a generation predicate, since seeded
    // assignment is per-vector (a vector's list never depends on the
    // rest of the corpus).
    "knn1b_graph_store" -> {
      val cos = (a: String, b: String) =>
        s"list_dot_product($a, $b) / nullif(sqrt(list_dot_product($a, $a))" +
          s" * sqrt(list_dot_product($b, $b)), 0.0)"
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings),
         |seeds AS (SELECT vec_id AS list_id, v AS sv FROM e
         |          WHERE vec_id IN (${graft.analytics.VectorQueries.IvfSeedIds.mkString(", ")})),
         |ca AS (
         |  SELECT vec_id, v, list_id FROM (
         |    SELECT c.vec_id, c.v, s.list_id,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY ${cos("c.v", "s.sv")} DESC, s.list_id) AS ar
         |    FROM e c CROSS JOIN seeds s)
         |  WHERE ar = 1),
         |qa AS (
         |  SELECT vec_id AS anchor_id, v AS qv, list_id FROM (
         |    SELECT q.vec_id, q.v, s.list_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cos("q.v", "s.sv")} DESC, s.list_id) AS ar
         |    FROM e q CROSS JOIN seeds s)
         |  WHERE ar <= 3),
         |sims AS (
         |  SELECT qa.anchor_id, ca.vec_id AS cand_id,
         |    ${cos("qa.qv", "ca.v")} AS sim_raw
         |  FROM qa JOIN ca USING (list_id)
         |  WHERE ca.vec_id != qa.anchor_id
         |    AND (qa.anchor_id % 10 = 3 OR ca.vec_id % 10 != 3))
         |SELECT anchor_id AS vec_id, cand_id AS nbr_id,
         |  floor(sim_raw * 1000000 + 0.5) / 1000000 AS cosine, rn AS rank
         |FROM (SELECT anchor_id, cand_id, sim_raw,
         |        row_number() OVER (PARTITION BY anchor_id
         |          ORDER BY sim_raw DESC, cand_id) AS rn
         |      FROM sims)
         |WHERE rn <= 5 ORDER BY vec_id, rank""".stripMargin
    },
    // ks1: binned drift replay — same fixed 20-bin split (clamped at
    // BOTH ends), eps clamp, explicit NULL-value counts, cumulative KS
    // and PSI (ln, not log10). Count sums CAST to BIGINT (DuckDB sum
    // widens to HUGEINT).
    "ks1_drift" -> driftOracleSql,
    // st16: the SAME oracle — the streamed state-store bin build
    // sum-merges losslessly, so the final drift readout must equal
    // the batch monitor verbatim.
    "st16_stream_drift" -> driftOracleSql,
    // pf1: key-skew profile replay — groupBy-count key frame, ranked
    // by (count desc, key), summary over that frame. ln = natural log.
    "pf1_skew_profile" ->
      """WITH c AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS c
        |           FROM orders GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |        CAST(sum(c) AS BIGINT) AS n_rows FROM c),
        |r AS (SELECT k, c,
        |        row_number() OVER (ORDER BY c DESC, k) AS rnk FROM c)
        |SELECT min(n_keys) AS n_keys, min(n_rows) AS n_rows,
        |  min(CASE WHEN rnk = 1 THEN k END) AS hot_key,
        |  floor(CAST(max(c) AS DOUBLE) / min(n_rows)
        |    * 1000000 + 0.5) / 1000000 AS hot_share,
        |  floor(CAST(sum(CASE WHEN rnk <= 10 THEN c ELSE 0 END) AS DOUBLE)
        |    / min(n_rows) * 1000000 + 0.5) / 1000000 AS topn_share,
        |  floor(CASE WHEN min(n_keys) > 1 THEN
        |      (-sum((CAST(c AS DOUBLE) / n_rows)
        |        * ln(CAST(c AS DOUBLE) / n_rows))) / ln(min(n_keys))
        |    ELSE 0.0 END * 1000000 + 0.5) / 1000000 AS norm_entropy
        |FROM r CROSS JOIN t""".stripMargin,
    // fp1: compaction-plan replay — per-(event_type, day) file sizes,
    // exclusive prefix sum within event_type, bin = floor(prefix /
    // target). Spark's floor(double) returns LONG, so CAST the bin.
    "fp1_compaction_plan" ->
      """WITH f AS (
        |  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        |    CAST(count(*) AS BIGINT) AS size_rows
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT event_type, day, size_rows,
        |        CAST(sum(size_rows) OVER (PARTITION BY event_type
        |          ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cum
        |      FROM f)
        |SELECT event_type, day, size_rows,
        |  CAST(floor((cum - size_rows) / 300.0) AS BIGINT) AS bin
        |FROM p ORDER BY event_type, day""".stripMargin,
    // cm1: Pearson correlation screen — six corr aggregates over one
    // scan, unpivoted. Both engines compute corr over doubles; the
    // 1e-6 exactRound absorbs partial-aggregation order differences.
    "cm1_corr_matrix" ->
      """WITH a AS (SELECT
        |    corr(l_quantity, l_extendedprice) AS c1,
        |    corr(l_quantity, l_discount) AS c2,
        |    corr(l_quantity, l_tax) AS c3,
        |    corr(l_extendedprice, l_discount) AS c4,
        |    corr(l_extendedprice, l_tax) AS c5,
        |    corr(l_discount, l_tax) AS c6
        |  FROM lineitem),
        |u AS (
        |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, c1 AS cr FROM a
        |  UNION ALL SELECT 'l_quantity', 'l_discount', c2 FROM a
        |  UNION ALL SELECT 'l_quantity', 'l_tax', c3 FROM a
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount', c4 FROM a
        |  UNION ALL SELECT 'l_extendedprice', 'l_tax', c5 FROM a
        |  UNION ALL SELECT 'l_discount', 'l_tax', c6 FROM a)
        |SELECT col_a, col_b,
        |  floor(cr * 1000000 + 0.5) / 1000000 AS corr
        |FROM u ORDER BY col_a, col_b""".stripMargin,
    // seq1: per-user ordered code string via string_agg (ORDER BY ts,
    // event_id — the same total order as Spark's sort_array over
    // (ts, event_id, code) structs), then identical regex/substring
    // algebra. The bigram count (len - len(replace))/2 is exactly even
    // by construction, so the BIGINT cast is rounding-free.
    "seq1_pattern_match" ->
      """WITH s AS (
        |  SELECT user_id,
        |    string_agg(CASE event_type WHEN 'signup' THEN 'S'
        |      WHEN 'view' THEN 'V' WHEN 'click' THEN 'C'
        |      WHEN 'purchase' THEN 'P' ELSE 'E' END, ''
        |      ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(length(seq) AS INT) AS n_events,
        |  CASE WHEN regexp_matches(seq, 'V.*C.*P') THEN 1 ELSE 0 END
        |    AS matched_vcp,
        |  CAST((length(seq) - length(replace(seq, 'CP', ''))) / 2
        |    AS BIGINT) AS n_cp_bigrams
        |FROM s ORDER BY user_id""".stripMargin,
    // v3c: the COMPRESSED-index mining path replayed end-to-end —
    // seeded-IVF assignment + nProbe probing (v3b's blocks), PQ encode
    // against the seeded codebook + asymmetric-distance pre-rank (s3's
    // blocks), top-10 rerank shortlist, exact-cosine re-rank, the
    // non-duplicate constraint on the EXACT similarity, then the
    // per-anchor argmax. Gates the full approximate pipeline: an
    // encode, ADC, probing or rerank drift fails the hash. rerank=50
    // (the measured exact-recall knee, see PERFORMANCE.md).
    "v3c_hard_neg_pq" -> {
      val cos = (a: String, b: String) =>
        s"list_dot_product($a, $b) / nullif(sqrt(list_dot_product($a, $a))" +
          s" * sqrt(list_dot_product($b, $b)), 0.0)"
      s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings WHERE vec_id < 2000),
         |e AS (SELECT vec_id, v FROM e0
         |      UNION ALL
         |      SELECT vec_id + 1000000, [v[1] + 0.001] || v[2:] FROM e0
         |      UNION ALL
         |      SELECT vec_id + 2000000, [v[1] + 0.33] || v[2:] FROM e0),
         |iseeds AS (SELECT vec_id AS list_id, v AS sv FROM e
         |           WHERE vec_id IN (${graft.analytics.VectorQueries.IvfSeedIds.mkString(", ")})),
         |ca AS (
         |  SELECT vec_id, list_id FROM (
         |    SELECT c.vec_id, s.list_id,
         |      row_number() OVER (PARTITION BY c.vec_id
         |        ORDER BY ${cos("c.v", "s.sv")} DESC, s.list_id) AS ar
         |    FROM e c CROSS JOIN iseeds s)
         |  WHERE ar = 1),
         |qa AS (
         |  SELECT vec_id AS anchor_id, v AS qv, list_id FROM (
         |    SELECT q.vec_id, q.v, s.list_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cos("q.v", "s.sv")} DESC, s.list_id) AS ar
         |    FROM e q CROSS JOIN iseeds s)
         |  WHERE ar <= 5),
         |pseeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v AS sv
         |           FROM e WHERE vec_id IN (${graft.analytics.VectorQueries.PqSeedIds.mkString(", ")})),
         |slt AS (SELECT list(sv ORDER BY j) AS sl FROM pseeds),
         |enc AS (
         |  SELECT c.vec_id, g.mi, s.j,
         |    list_sum(list_transform(range(1, 9), d ->
         |      (c.v[CAST(g.mi * 8 + d AS INTEGER)]
         |       - s.sv[CAST(g.mi * 8 + d AS INTEGER)]) ^ 2)) AS dist
         |  FROM e c CROSS JOIN (SELECT unnest(range(0, 8)) AS mi) g
         |  CROSS JOIN pseeds s),
         |codes AS (
         |  SELECT vec_id, list(j ORDER BY mi) AS cl FROM (
         |    SELECT vec_id, mi, j,
         |      row_number() OVER (PARTITION BY vec_id, mi ORDER BY dist, j) AS rn
         |    FROM enc) WHERE rn = 1 GROUP BY vec_id),
         |adc AS (
         |  SELECT qa.anchor_id, ca.vec_id AS cand_id,
         |    list_sum(list_transform(range(1, 65), i ->
         |      (qa.qv[CAST(i AS INTEGER)]
         |       - t.sl[CAST(c.cl[CAST((i - 1) // 8 + 1 AS INTEGER)] + 1 AS INTEGER)]
         |              [CAST(i AS INTEGER)]) ^ 2)) AS adc_dist
         |  FROM qa JOIN ca USING (list_id)
         |  JOIN codes c ON c.vec_id = ca.vec_id
         |  CROSS JOIN slt t
         |  WHERE ca.vec_id != qa.anchor_id),
         |rr AS (
         |  SELECT anchor_id, cand_id FROM (
         |    SELECT anchor_id, cand_id,
         |      row_number() OVER (PARTITION BY anchor_id
         |        ORDER BY adc_dist, cand_id) AS r
         |    FROM adc) WHERE r <= 50),
         |ex AS (
         |  SELECT rr.anchor_id, rr.cand_id, ${cos("a.v", "b.v")} AS cosine
         |  FROM rr JOIN e a ON a.vec_id = rr.anchor_id
         |          JOIN e b ON b.vec_id = rr.cand_id)
         |SELECT anchor_id AS vec_id, cand_id AS neg_id,
         |  floor(cosine * 1000000 + 0.5) / 1000000 AS cosine
         |FROM (SELECT anchor_id, cand_id, cosine,
         |        row_number() OVER (PARTITION BY anchor_id
         |          ORDER BY cosine DESC, cand_id) AS rn
         |      FROM ex WHERE cosine < 0.99)
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin
    },
    // e1: brute force over the planted fixture — valid as the LSH
    // oracle by the recall argument in Dedup.hyperplaneNearDups
    // (miss < 1e-9/pair at the fixture's cosine margin).
    "e1_hyperplane_neardup" ->
      """WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |e AS (SELECT vec_id, v FROM e0
        |      UNION ALL
        |      SELECT vec_id + 1000000, [v[1] + 0.001] || v[2:] FROM e0)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  floor((list_dot_product(a.v, b.v) /
        |    nullif(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)), 0.0))
        |    * 1000000 + 0.5) / 1000000 AS cosine
        |FROM e a JOIN e b ON b.vec_id > a.vec_id
        |WHERE list_dot_product(a.v, b.v) /
        |    nullif(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)), 0.0) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,
    "d5_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE vec_id < 2000)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  floor((list_dot_product(a.v, b.v) /
        |    nullif(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)), 0.0))
        |    * 1000000 + 0.5) / 1000000 AS cosine
        |FROM e a JOIN e b ON b.vec_id > a.vec_id
        |WHERE list_dot_product(a.v, b.v) /
        |    nullif(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)), 0.0)
        |  >= 0.45
        |ORDER BY id_a, id_b""".stripMargin,
    "st1_hourly_window" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
        |  event_type, count(*) AS n_events,
        |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour_start, event_type""".stripMargin,
    "st3_stream_join" ->
      """SELECT c.event_id AS click_id, v.event_id AS view_id
        |FROM events c JOIN events v
        |  ON c.user_id = v.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND CAST(v.ts AS TIMESTAMP)
        |       BETWEEN CAST(c.ts AS TIMESTAMP) - INTERVAL 10 MINUTE
        |           AND CAST(c.ts AS TIMESTAMP)
        |ORDER BY click_id, view_id""".stripMargin,
    "st2_user_sessions" ->
      """WITH marked AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CASE WHEN CAST(ts AS TIMESTAMP)
        |           - lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
        |         >= INTERVAL 2 HOUR OR
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) IS NULL
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM marked)
        |SELECT user_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events
        |FROM sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
    "u1_set_ops" ->
      """(SELECT source FROM documents WHERE lang = 'en'
        | UNION
        | SELECT source FROM documents WHERE lang = 'es')
        |EXCEPT
        |SELECT source FROM documents WHERE lang = 'zh'
        |ORDER BY source""".stripMargin,
    "a11_distinct" ->
      """SELECT DISTINCT o_orderpriority, o_orderstatus
        |FROM orders
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    "f4_ilike" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE p_name ILIKE '%Red%'
        |ORDER BY p_partkey""".stripMargin,
    "sql1_region_revenue" -> SqlQueries.q5Sql,
    "sql2_nation_profit" -> SqlQueries.q9Sql,
    // m3: shard hash (PolyHash of id||'m3'), exclusive window pixel
    // sum, integer division — the whole schedule replayed. The window
    // sum is CAST to BIGINT at definition (sum(BIGINT) is HUGEINT in
    // DuckDB; uncast, batch_id inherits HUGEINT and the driver's
    // arrow/pandas canonicalization can widen it to float64, flipping
    // the value hash while rows/schema still match — the r8 red row).
    // t18 (the green twin) casts its window sum the same way.
    "m3_decode_batches" -> {
      val h = polyHash64Sql("CAST(doc_id AS VARCHAR) || 'm3'")
      s"""WITH nb AS (SELECT CAST((count(*) + 199) // 200 AS BIGINT) AS b FROM documents),
        |m AS (SELECT doc_id AS media_id,
        |    ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
        |    CAST((doc_id % 64 + 16) * ((doc_id * 7) % 64 + 16) AS BIGINT) AS pixels,
        |    $h % (SELECT b FROM nb) AS bucket
        |  FROM documents),
        |w AS (SELECT kind, bucket, media_id, pixels,
        |    CAST(coalesce(sum(pixels) OVER (PARTITION BY kind, bucket ORDER BY media_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pb
        |  FROM m)
        |SELECT kind, bucket, CAST(pb // 65536 AS BIGINT) AS batch_id,
        |  CAST(count(*) AS BIGINT) AS n_media, CAST(sum(pixels) AS BIGINT) AS total_pixels,
        |  min(media_id) AS first_media
        |FROM w GROUP BY 1, 2, 3
        |ORDER BY kind, bucket, batch_id""".stripMargin
    },
    // m4: decode -> resize chain replayed — metadata derivation, the
    // nearest-neighbor index arithmetic, and the stub codec's cyclic
    // byte lookup (ASCII corpus: ord(char) IS the utf-8 byte); the
    // integer byte-sum rollup makes the gate float-free.
    // m5: signatures replayed in all-integer algebra (byte recovery,
    // cross-multiplied mean compare, unrolled bit sums), then pairs
    // BRUTE-FORCED — byte-equality against the band join proves the
    // pigeonhole recall claim on real data.
    "m5_image_neardup" ->
      """WITH d0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        |ca AS (SELECT doc_id + 102400 AS doc_id, text FROM d0),
        |cb AS (SELECT doc_id + 204800 AS doc_id,
        |    substr(text, 1, length(text) // 2) || 'q'
        |      || substr(text, length(text) // 2 + 2) AS text
        |  FROM d0),
        |u AS (SELECT * FROM d0 UNION ALL SELECT * FROM ca
        |      UNION ALL SELECT * FROM cb),
        |m AS (SELECT doc_id AS media_id, text,
        |    CAST(doc_id % 64 + 16 AS INT) AS w,
        |    CAST((doc_id * 7) % 64 + 16 AS INT) AS h,
        |    length(text) AS blen
        |  FROM u),
        |b AS (SELECT media_id,
        |    [ord(substr(text,
        |       CAST(CAST(floor(floor(i / 8.0) * h / 8.0) * w
        |                 + floor((i % 8) * w / 8.0) AS BIGINT)
        |            % blen AS INT) + 1, 1))
        |     for i in range(0, 64)] AS bytes
        |  FROM m),
        |t AS (SELECT media_id, bytes, list_sum(bytes) AS tot FROM b),
        |s AS (SELECT media_id,
        |    CAST(list_sum([CASE WHEN 64 * bytes[i + 1] > tot
        |                        THEN 1 << i ELSE 0 END
        |                   for i in range(0, 16)]) AS INT) AS b0,
        |    CAST(list_sum([CASE WHEN 64 * bytes[i + 1] > tot
        |                        THEN 1 << (i - 16) ELSE 0 END
        |                   for i in range(16, 32)]) AS INT) AS b1,
        |    CAST(list_sum([CASE WHEN 64 * bytes[i + 1] > tot
        |                        THEN 1 << (i - 32) ELSE 0 END
        |                   for i in range(32, 48)]) AS INT) AS b2,
        |    CAST(list_sum([CASE WHEN 64 * bytes[i + 1] > tot
        |                        THEN 1 << (i - 48) ELSE 0 END
        |                   for i in range(48, 64)]) AS INT) AS b3
        |  FROM t)
        |SELECT a.media_id AS id_a, c.media_id AS id_b,
        |  CAST(bit_count(xor(a.b0, c.b0)) + bit_count(xor(a.b1, c.b1))
        |     + bit_count(xor(a.b2, c.b2)) + bit_count(xor(a.b3, c.b3))
        |    AS BIGINT) AS hamming
        |FROM s a JOIN s c ON c.media_id > a.media_id
        |WHERE bit_count(xor(a.b0, c.b0)) + bit_count(xor(a.b1, c.b1))
        |    + bit_count(xor(a.b2, c.b2)) + bit_count(xor(a.b3, c.b3)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    "m4_resize_pipeline" ->
      """WITH m AS (SELECT doc_id AS media_id, text,
        |    CAST(doc_id % 64 + 16 AS INT) AS w,
        |    CAST((doc_id * 7) % 64 + 16 AS INT) AS h,
        |    length(text) AS blen
        |  FROM documents WHERE doc_id < 120),
        |px AS (SELECT media_id, w, h, blen, text,
        |    unnest(range(0, 256)) AS i FROM m),
        |v AS (SELECT media_id,
        |    CAST(floor(floor(i / 16.0) * h / 16.0) * w
        |         + floor((i % 16) * w / 16.0) AS BIGINT) AS src,
        |    blen, text FROM px),
        |b AS (SELECT media_id,
        |    ord(substr(text, CAST(src % blen AS INT) + 1, 1)) AS byte
        |  FROM v)
        |SELECT media_id, CAST(256 AS INT) AS n_px,
        |  CAST(sum(byte) AS BIGINT) AS byte_sum
        |FROM b GROUP BY media_id ORDER BY media_id""".stripMargin,
    "m1_binary_meta" ->
      """SELECT doc_id AS media_id,
        |  ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
        |  CAST(doc_id % 64 + 16 AS INT) AS width,
        |  CAST((doc_id * 7) % 64 + 16 AS INT) AS height,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS digest
        |FROM documents
        |ORDER BY media_id""".stripMargin,
    "t1_lang_id" ->
      """WITH s AS (
        |  SELECT lang,
        |    len(list_filter(ws, w -> list_contains(['the','a','of','and','to'], w))) AS score_en,
        |    len(list_filter(ws, w -> list_contains(['el','la','de','y','en'], w))) AS score_es,
        |    len(list_filter(ws, w -> list_contains(['der','die','das','und','zu'], w))) AS score_de
        |  FROM (SELECT lang, string_split(text, ' ') AS ws FROM documents))
        |SELECT lang,
        |  CASE WHEN score_en >= score_es AND score_en >= score_de THEN 'en'
        |       WHEN score_es >= score_de THEN 'es'
        |       ELSE 'de' END AS predicted_lang,
        |  count(*) AS n_docs, CAST(sum(score_en) AS BIGINT) AS sum_score_en
        |FROM s
        |GROUP BY 1, 2
        |ORDER BY lang, predicted_lang""".stripMargin,
    "t2_quality_score" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    len(ws) AS n_words,
        |    length(text) AS n_chars,
        |    (length(text) - (len(ws) - 1))::DOUBLE / len(ws) AS avg_word_len,
        |    len(list_filter(ws, w -> list_contains(
        |      ['the','a','of','and','to','el','la','de','y','en','der','die','das','und','zu'], w)))::DOUBLE
        |      / len(ws) AS stopword_ratio,
        |    len(list_filter(ws, w -> length(w) <= 2))::DOUBLE / len(ws) AS short_word_ratio
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
        |        FROM documents WHERE doc_id < 200))
        |SELECT doc_id, n_words, n_chars,
        |  floor(avg_word_len * 10000 + 0.5) / 10000 AS avg_word_len,
        |  floor(stopword_ratio * 10000 + 0.5) / 10000 AS stopword_ratio,
        |  floor((stopword_ratio * 0.4 + (1.0 - short_word_ratio) * 0.4 +
        |         least(avg_word_len / 10.0, 1.0) * 0.2) * 10000 + 0.5) / 10000
        |    AS quality_score
        |FROM f
        |ORDER BY doc_id""".stripMargin,
    "t3_token_count" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text,
        |    '[A-Za-z0-9_'']+|[^A-Za-z0-9_''\s]')) AS n_tokens,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_words
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "t4_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ' '), w -> CAST(length(w) + 1 AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    // t28: recursive components (the d6 CTE) + the t5 PolyHash bucket
    // rule applied to the component root instead of the doc id
    "t28_leakage_free_split" ->
      (componentsCte + s""",
         |labeled AS (
         |  SELECT d.doc_id, d.n_chars,
         |    (c.node IS NOT NULL) AS in_group,
         |    coalesce(c.component, d.doc_id) AS root
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
         |h AS (
         |  SELECT in_group, n_chars, ${polyHash64Sql("w")} % 10000 AS bucket
         |  FROM (SELECT in_group, n_chars,
         |          CAST(root AS VARCHAR) || 'v1' AS w FROM labeled))
         |SELECT CASE WHEN bucket < 8000 THEN 'train'
         |            WHEN bucket < 9000 THEN 'val' ELSE 'test' END AS split,
         |  count(*) AS n_docs,
         |  CAST(sum(CASE WHEN in_group THEN 1 ELSE 0 END) AS BIGINT) AS n_grouped,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM h GROUP BY 1 ORDER BY split""".stripMargin),
    // t27: the oracle uses the WINDOW ntile the engine's exactNtile
    // replays distributively; the surprisal CTEs mirror t12's exactly
    // c3: four operator families replayed in ONE statement — the t25
    // predicate, the d2-pair + recursive-CC + survivor chain on the
    // gated pool, t32's apportionment over the deduped pool (budget =
    // pool·6 DIV 10, exact integers), and the PolyHash selection rank.
    // sum_sel_ids pins exactly WHICH docs ship.
    "c3_training_mix" -> c3OracleSql,
    // c3b: the SAME oracle VERBATIM — the incremental face's base
    // (doc_id % 10 <> 3) ∪ delta (== 3) IS the corpus, and the
    // store-composed refresh (incremental band probe → component-store
    // merge → survivorship readout → apportionment) is exact at every
    // stage, so the daily-delta manifest must equal the one-shot
    // rebuild bit-for-bit.
    "c3b_incremental_training_mix" -> c3OracleSql,
    // t32: largest-remainder apportionment replayed — floors, 6dp
    // quotas, and the remainder rank as a correlated count (the same
    // windowless formulation the engine plans).
    "t32_temperature_mix" ->
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        |z AS (SELECT sum(pow(n_docs, 0.7)) AS z FROM c),
        |q AS (SELECT source, n_docs,
        |        floor((pow(n_docs, 0.7) / z * 100000) * 1000000 + 0.5) / 1000000 AS quota
        |      FROM c, z),
        |f AS (SELECT source, n_docs, quota,
        |        CAST(floor(quota) AS BIGINT) AS fl, quota - floor(quota) AS fr
        |      FROM q),
        |l AS (SELECT 100000 - sum(fl) AS lft FROM f),
        |a AS (SELECT f.source, f.n_docs, f.quota, f.fl,
        |        (SELECT count(*) FROM f g
        |         WHERE g.fr > f.fr OR (g.fr = f.fr AND g.source < f.source)) AS ahead,
        |        (SELECT count(*) FROM f g
        |         WHERE g.fl >= 1 AND (g.fr < f.fr OR (g.fr = f.fr AND g.source < f.source))) AS takr
        |      FROM f)
        |SELECT source, n_docs, quota,
        |  CASE WHEN (SELECT lft FROM l) >= 0
        |    THEN fl + CASE WHEN ahead < (SELECT lft FROM l) THEN 1 ELSE 0 END
        |    ELSE fl - CASE WHEN fl >= 1 AND takr < -(SELECT lft FROM l) THEN 1 ELSE 0 END
        |  END AS alloc
        |FROM a ORDER BY source""".stripMargin,
    // t31: t27's score chain, 20-tile clamp bounds, integer-exact mean
    // (sum of score·10⁴ is an integer in double, order-independent).
    "t31_winsorize" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |wc AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        |tot AS (SELECT sum(c) AS total FROM wc),
        |per AS (
        |  SELECT doc_id, avg(log2(total) - log2(c)) AS ms
        |  FROM tok JOIN wc USING (w) CROSS JOIN tot
        |  GROUP BY doc_id),
        |scored AS (
        |  SELECT p.doc_id, d.source,
        |    floor(ms * 10000 + 0.5) / 10000 AS score
        |  FROM per p JOIN documents d USING (doc_id)),
        |b AS (
        |  SELECT doc_id, source, score,
        |    ntile(20) OVER (ORDER BY score, doc_id) AS bucket
        |  FROM scored),
        |bounds AS (
        |  SELECT max(CASE WHEN bucket = 1 THEN score END) AS lo,
        |         min(CASE WHEN bucket = 20 THEN score END) AS hi
        |  FROM b),
        |wz AS (SELECT source, least(greatest(score, lo), hi) AS w FROM b, bounds)
        |SELECT source, count(*) AS n_docs,
        |  sum(w * 10000.0) / (10000.0 * count(*)) AS mean_w,
        |  min(w) AS min_w, max(w) AS max_w
        |FROM wz GROUP BY source ORDER BY source""".stripMargin,
    "t27_perplexity_tiers" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |wc AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        |tot AS (SELECT sum(c) AS total FROM wc),
        |per AS (
        |  SELECT doc_id, count(*) AS n_words,
        |    avg(log2(total) - log2(c)) AS ms
        |  FROM tok JOIN wc USING (w) CROSS JOIN tot
        |  GROUP BY doc_id),
        |scored AS (
        |  SELECT doc_id, n_words,
        |    floor(ms * 10000 + 0.5) / 10000 AS score
        |  FROM per),
        |b AS (
        |  SELECT n_words, score,
        |    ntile(3) OVER (ORDER BY score, doc_id) AS bucket
        |  FROM scored)
        |SELECT bucket, count(*) AS n_docs,
        |  min(score) AS min_score, max(score) AS max_score,
        |  CAST(sum(n_words) AS BIGINT) AS total_words
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    // t26: direct per-instance pair counting — equal by algebra to the
    // engine's word-frequency-weighted two-phase form. The inner range
    // cap (32) only needs to exceed the corpus's max word length (8).
    "lr1_quality_classifier" -> logisticOracleSql,
    "t26_bpe_pairs" ->
      """WITH words AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |pairs AS (
        |  SELECT substr(w, i, 2) AS pair
        |  FROM words, (SELECT unnest(range(1, 32)) AS i)
        |  WHERE i <= len(w) - 1)
        |SELECT pair, count(*) AS n FROM pairs
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 30""".stripMargin,
    // t30: the full 4-round BPE training loop + vocab encode replayed.
    // Symbol sequences ride ops.Bpe.Sep's both-sides-wrapped delimited
    // form (every symbol = chr(1)||sym||chr(1)), so one literal
    // replace() per round/merge is the exact left-to-right
    // non-overlapping BPE apply on both engines; symbols come back via
    // string_split on the doubled chr(1) between neighbors after
    // trimming the outermost pair.
    "t30_bpe_encode" -> {
      val nM = 4
      // pattern chr(1)||a||chr(1)||chr(1)||b||chr(1) -> chr(1)||a||b||chr(1)
      def rep(s: String): String =
        s"replace($s, chr(1) || a || chr(1) || chr(1) || b || chr(1), " +
          "chr(1) || a || b || chr(1))"
      def pairsOf(v: String): String =
        s"""SELECT ws[i] AS a, ws[i + 1] AS b, sum(freq) AS n
           |      FROM (SELECT freq, ws, unnest(range(1, len(ws))) AS i
           |            FROM (SELECT freq,
           |                  string_split(trim(s, chr(1)), chr(1) || chr(1)) AS ws
           |                  FROM $v))
           |      GROUP BY 1, 2""".stripMargin
      // Mirror Bpe.train's minFreq=2 early stop: a round whose best
      // pair is sub-minFreq (or absent) yields the chr(2) SENTINEL
      // merge — chr(2) never occurs in the delimited symbol string, so
      // the round's replace() is a no-op, exactly like a training loop
      // that has already stopped (merges only shrink pair counts, so
      // once a round is a no-op every later round is too).
      val rounds = (0 until nM).map { r =>
        s"""b$r AS (SELECT a, b FROM (
           |      SELECT a, b, 0 AS pri FROM (
           |        SELECT a, b FROM (${pairsOf(s"v$r")})
           |        WHERE n >= 2 ORDER BY n DESC, a, b LIMIT 1)
           |      UNION ALL SELECT chr(2), chr(2), 1
           |    ) ORDER BY pri LIMIT 1),
           |v${r + 1} AS (SELECT word, freq, ${rep("s")} AS s FROM v$r, b$r)""".stripMargin
      }.mkString(",\n")
      val encs = (0 until nM).map { r =>
        s"e${r + 1} AS (SELECT word, ${rep("s")} AS s FROM e$r, b$r)"
      }.mkString(",\n")
      s"""WITH wf AS (
         |  SELECT word, count(*) AS freq
         |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         |  WHERE len(word) >= 2 GROUP BY word),
         |v0 AS (SELECT word, freq,
         |       regexp_replace(word, '(.)', concat(chr(1), '\\1', chr(1)), 'g') AS s FROM wf),
         |$rounds,
         |occ AS (SELECT doc_id, word
         |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         |        WHERE len(word) >= 1),
         |e0 AS (SELECT word, regexp_replace(word, '(.)', concat(chr(1), '\\1', chr(1)), 'g') AS s
         |       FROM (SELECT DISTINCT word FROM occ)),
         |$encs,
         |wt AS (SELECT word,
         |       CAST((len(s) - len(replace(s, chr(1), ''))) / 2 AS BIGINT) AS wtok FROM e$nM)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, CAST(sum(wtok) AS BIGINT) AS n_tokens
         |FROM occ JOIN wt USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "t25_gopher_rules" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS word_count,
        |    len(regexp_replace(text, '\s', '', 'g'))::DOUBLE AS nonspace,
        |    len(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE AS alpha,
        |    len(list_intersect(list_distinct(regexp_split_to_array(trim(text), '\s+')),
        |        ['the','of','and','to','in','a','is','that','for','it'])) AS stopword_hits
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, word_count, stopword_hits,
        |    nonspace / nullif(word_count::DOUBLE, 0.0) AS mwl,
        |    alpha / nullif(nonspace, 0.0) AS ar
        |  FROM s)
        |SELECT doc_id, word_count,
        |  floor(mwl * 10000 + 0.5) / 10000 AS mean_word_len,
        |  stopword_hits,
        |  floor(ar * 10000 + 0.5) / 10000 AS alpha_ratio,
        |  (word_count BETWEEN 30 AND 100000) AS r_word_count,
        |  (mwl BETWEEN 4.0 AND 5.0) AS r_mean_word_len,
        |  (stopword_hits >= 2) AS r_stopwords,
        |  (ar >= 0.6) AS r_alpha,
        |  ((word_count BETWEEN 30 AND 100000) AND (mwl BETWEEN 4.0 AND 5.0)
        |   AND (stopword_hits >= 2) AND (ar >= 0.6)) AS keep
        |FROM r ORDER BY doc_id""".stripMargin,
    "d12_dsir_select" -> {
      val b = s"${polyHash64Sql("w")} % 512"
      s"""WITH tok AS (
        |  SELECT doc_id, (lang = 'en') AS tgt,
        |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        |  FROM documents),
        |pb AS (SELECT doc_id, tgt, $b AS b FROM tok WHERE len(w) > 0),
        |pdb AS (SELECT doc_id, tgt, b, count(*) AS c FROM pb GROUP BY 1, 2, 3),
        |rawd AS (SELECT b, CAST(sum(c) AS BIGINT) AS rc FROM pdb GROUP BY b),
        |tgtd AS (SELECT b, CAST(sum(c) AS BIGINT) AS tc FROM pdb WHERE tgt GROUP BY b),
        |tot AS (SELECT (SELECT CAST(sum(rc) AS BIGINT) FROM rawd) AS rtot,
        |               (SELECT CAST(sum(tc) AS BIGINT) FROM tgtd) AS ttot),
        |sc AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    sum(c::DOUBLE * (ln((coalesce(tc, 0) + 1)::DOUBLE) - ln((rc + 1)::DOUBLE))) AS s
        |  FROM pdb JOIN rawd USING (b) LEFT JOIN tgtd USING (b)
        |  GROUP BY doc_id),
        |wt AS (
        |  SELECT doc_id, n_tokens,
        |    s - n_tokens::DOUBLE * (ln((ttot + 512)::DOUBLE) - ln((rtot + 512)::DOUBLE)) AS w
        |  FROM sc CROSS JOIN tot)
        |SELECT doc_id, n_tokens, floor(w * 10000 + 0.5) / 10000 AS weight
        |FROM wt ORDER BY w DESC, doc_id LIMIT 100""".stripMargin
    },
    // s3b: the COMPLETE trained-PQ pipeline replayed — per-subspace
    // k-means (assignment by the quadratic form c·c − 2·x·c, ties to
    // the smaller codeword; means on the 1e-6 grid; empty cells keep
    // their seed), then the same encode + ADC blocks as s3 against
    // the trained codeword lists.
    "s3b_pq_trained" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |g AS (SELECT unnest(range(0, 8)) AS mi),
        |sub AS (
        |  SELECT e.vec_id, g.mi,
        |    list_transform(range(1, 9), d ->
        |      e.v[CAST(g.mi * 8 + d AS INTEGER)]) AS sv
        |  FROM e CROSS JOIN g),
        |cw0 AS (SELECT mi, vec_id AS j, sv FROM sub WHERE vec_id < 8),
        |asg AS (
        |  SELECT vec_id, mi, j FROM (
        |    SELECT s.vec_id, s.mi, c.j,
        |      row_number() OVER (PARTITION BY s.vec_id, s.mi ORDER BY
        |        (list_dot_product(c.sv, c.sv)
        |         - 2.0 * list_dot_product(s.sv, c.sv)), c.j) AS rn
        |    FROM sub s JOIN cw0 c ON s.mi = c.mi)
        |  WHERE rn = 1),
        |mn AS (
        |  SELECT mi, j, dim, floor(avg(val) * 1000000 + 0.5) / 1000000 AS val
        |  FROM (
        |    SELECT a.mi, a.j, generate_subscripts(s.sv, 1) AS dim,
        |           unnest(s.sv) AS val
        |    FROM asg a JOIN sub s ON a.vec_id = s.vec_id AND a.mi = s.mi)
        |  GROUP BY mi, j, dim),
        |cw1 AS (
        |  SELECT c.mi, c.j,
        |    CASE WHEN count(m.val) = 0 THEN c.sv
        |         ELSE list(m.val ORDER BY m.dim) END AS sv
        |  FROM cw0 c LEFT JOIN mn m ON c.mi = m.mi AND c.j = m.j
        |  GROUP BY c.mi, c.j, c.sv),
        |enc AS (
        |  SELECT s.vec_id, s.mi, c.j,
        |    list_sum(list_transform(range(1, 9), d ->
        |      (s.sv[CAST(d AS INTEGER)] - c.sv[CAST(d AS INTEGER)]) ^ 2)) AS dist
        |  FROM sub s JOIN cw1 c ON s.mi = c.mi),
        |codes AS (
        |  SELECT vec_id, list(j ORDER BY mi) AS cl FROM (
        |    SELECT vec_id, mi, j,
        |      row_number() OVER (PARTITION BY vec_id, mi ORDER BY dist, j) AS rn
        |    FROM enc) WHERE rn = 1 GROUP BY vec_id),
        |pm AS (SELECT mi, list(sv ORDER BY j) AS cws FROM cw1 GROUP BY mi),
        |slt AS (SELECT list(cws ORDER BY mi) AS sl FROM pm),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        |ad AS (
        |  SELECT q.query_id, c.vec_id AS cand_id,
        |    list_sum(list_transform(range(1, 65), i ->
        |      (q.qv[CAST(i AS INTEGER)]
        |       - t.sl[CAST((i - 1) // 8 + 1 AS INTEGER)]
        |              [CAST(c.cl[CAST((i - 1) // 8 + 1 AS INTEGER)] + 1 AS INTEGER)]
        |              [CAST((i - 1) % 8 + 1 AS INTEGER)]) ^ 2)) AS dist
        |  FROM q CROSS JOIN codes c CROSS JOIN slt t),
        |rk AS (
        |  SELECT query_id, cand_id, dist,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY dist, cand_id) AS rank
        |  FROM ad)
        |SELECT query_id, cand_id,
        |  floor(dist * 1000000 + 0.5) / 1000000 AS adc_dist, rank
        |FROM rk WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "s3_pq_adc" -> {
      val seedList = graft.analytics.VectorQueries.PqSeedIds.mkString(", ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v AS sv
        |          FROM e WHERE vec_id IN ($seedList)),
        |slt AS (SELECT list(sv ORDER BY j) AS sl FROM seeds),
        |enc AS (
        |  SELECT c.vec_id, g.mi, s.j,
        |    list_sum(list_transform(range(1, 9), d ->
        |      (c.v[CAST(g.mi * 8 + d AS INTEGER)] - s.sv[CAST(g.mi * 8 + d AS INTEGER)]) ^ 2)) AS dist
        |  FROM e c CROSS JOIN (SELECT unnest(range(0, 8)) AS mi) g CROSS JOIN seeds s),
        |codes AS (
        |  SELECT vec_id, list(j ORDER BY mi) AS cl FROM (
        |    SELECT vec_id, mi, j,
        |      row_number() OVER (PARTITION BY vec_id, mi ORDER BY dist, j) AS rn
        |    FROM enc) WHERE rn = 1 GROUP BY vec_id),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        |ad AS (
        |  SELECT q.query_id, c.vec_id AS cand_id,
        |    list_sum(list_transform(range(1, 65), i ->
        |      (q.qv[CAST(i AS INTEGER)]
        |       - slt.sl[CAST(c.cl[CAST((i - 1) // 8 + 1 AS INTEGER)] + 1 AS INTEGER)]
        |               [CAST(i AS INTEGER)]) ^ 2)) AS dist
        |  FROM q CROSS JOIN codes c CROSS JOIN slt),
        |rk AS (
        |  SELECT query_id, cand_id, dist,
        |    row_number() OVER (PARTITION BY query_id ORDER BY dist, cand_id) AS rank
        |  FROM ad)
        |SELECT query_id, cand_id, floor(dist * 1000000 + 0.5) / 1000000 AS adc_dist, rank
        |FROM rk WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    },
    "w11_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts, us,
        |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, us,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM f)
        |SELECT user_id, session_idx,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events,
        |  CAST(max(us) - min(us) AS BIGINT) AS duration_us
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
  )
}
