package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — every implemented operator from SURVEY.md §2 is
  * registered here as a named query plus (where ANSI-SQL-expressible)
  * a DuckDB oracle returning the identical result.
  *
  * Cross-engine determinism rules (see operator scaladocs):
  *  - money sums go through DECIMAL (exact, order-independent), output
  *    as DOUBLE;
  *  - averages are exact-sum-cast-to-double / count (one IEEE divide);
  *  - doubles that reach the output are produced by the *same*
  *    operation sequence in both engines, so they are bit-identical
  *    and need no rounding;
  *  - content hashes are md5 hex (identical everywhere); the minhash /
  *    winnowing families are integer polynomial hashes mod 2^32 whose
  *    exact fold the oracle reproduces; every top-k ORDER BY carries a
  *    unique tiebreaker column;
  *  - every DuckDB integer `sum()` (incl. sum(CASE ...) conditional
  *    counts) in a final SELECT must be CAST(... AS BIGINT): DuckDB
  *    types them HUGEINT (INT128), Spark emits BIGINT, and the
  *    driver's hash is dtype-sensitive — values match, hashes don't
  *    (cost q129 three rounds of red). Enforced by
  *    tools/lint_oracle.py over the Verify oracle dump.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.revenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — relational surface (SURVEY §2.B) —
    "q01_pricing_summary" -> (Relational.pricingSummary(_, _)),
    "q02_join_broadcast" -> (Relational.revenueByBrand(_, _)),
    "q03_join_multi" -> (Relational.revenueByNation(_, _)),
    "q04_topk_orders" -> (Relational.topOrders(_, _)),
    "q05_anti_join" -> (Relational.customersWithoutOrders(_, _)),
    "q06_semi_join" -> (Relational.bulkParts(_, _)),
    "q07_set_except" -> (Relational.customerOnlyNations(_, _)),
    "q08_orders_by_month" -> (Relational.ordersByMonth(_, _)),
    "q09_event_type_stats" -> (Relational.eventTypeStats(_, _)),
    "q33_approx_distinct" -> (Relational.approxDistinctUsers(_, _)),
    "q35_rollup" -> (Relational.ordersRollup(_, _)),
    "q36_scalar_funcs" -> (Relational.partCatalog(_, _)),
    "q38_set_intersect" -> (Relational.sharedDebtNations(_, _)),
    "q39_pivot" -> (Relational.eventPivot(_, _)),
    "q41_cube" -> (Relational.lineitemCube(_, _)),
    "q42_union_all" -> (Relational.partyDirectory(_, _)),
    "q43_sql_frontend" -> (Relational.priorityCheck(_, _)),
    // — windows / event time / JSON (SURVEY §2.B) —
    "q10_window_latest" -> (EventOps.latestPerUser(_, _)),
    "q11_window_gaps" -> (EventOps.userGapStats(_, _)),
    "q12_sessionize" -> (EventOps.sessionize(_, _)),
    "q13_json_props" -> (EventOps.propsKeyStats(_, _)),
    "q14_hourly_buckets" -> (EventOps.hourlyBuckets(_, _)),
    "q15_flatten_props" -> (EventOps.flattenedProps(_, _)),
    "q40_running_total" -> (EventOps.runningTotals(_, _)),
    // — the reference pipeline (SURVEY §2.A, O2-O8) —
    "q16_reindex_scan" -> ((s, d) => Reindex.scanSlice(s, d, startId = "25")),
    "q17_reindex_chunks" -> ((s, d) => Reindex.chunked(s, d, chunkSize = 20)),
    "q18_enrich_broadcast" -> (Reindex.enriched(_, _)),
    // — dedup tier (SURVEY §2.C / LLM north star) —
    "q19_dedup_exact" -> (Dedup.exact(_, _)),
    "q20_dedup_fingerprint" -> (Dedup.fingerprint(_, _)),
    "q21_dedup_minhash" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "q22_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d, threshold = 0.8)),
    "q23_simhash" -> ((s, d) => Dedup.simhash(s, d, bits = 16)),
    "q44_winnowing" -> ((s, d) => Dedup.winnowing(s, d)),
    // the scale-path variant of q22: hot shingles (df>8) dropped before
    // the pair join, identically in the oracle — exact for the capped
    // definition (see SCALING.md)
    "q45_jaccard_capped" -> ((s, d) => Dedup.ngramJaccard(s, d, threshold = 0.5, maxShingleDf = Some(8))),
    // — similarity search tier —
    "q24_topk_cosine" -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    // the fixture plants no near-identical embeddings (max pair cosine
    // ≈0.51), so the demo threshold is 0.42 — high-similarity tail
    "q25_embed_neardup" -> ((s, d) => Similarity.thresholdPairs(s, d, threshold = 0.42)),
    "q26_ann_bucketed" -> ((s, d) => Similarity.bucketedAnn(s, d)),
    "q27_label_stats" -> (Similarity.labelStats(_, _)),
    "q37_topk_aggregator" -> ((s, d) => Similarity.topKAggregated(s, d)),
    // — text analysis tier —
    "q28_corpus_stats" -> (TextAnalysis.corpusStats(_, _)),
    "q29_token_freq" -> ((s, d) => TextAnalysis.tokenFrequency(s, d)),
    "q30_langid" -> (TextAnalysis.langIdConfusion(_, _)),
    "q31_quality" -> (TextAnalysis.qualityBySource(_, _)),
    // — multimodal tier —
    "q32_multimodal_meta" -> (Multimodal.metadata(_, _)),
    "q34_media_features" -> (Multimodal.featureSummary(_, _)),
    // — round-3 widening: as-of/range joins, skew path, exact moments,
    //   percentiles, grouping sets, edit distance, IVF ANN, UDTF —
    "q46_asof_join" -> (EventOps.asOfAttribution(_, _)),
    "q47_range_join" -> ((s, d) => EventOps.precedingCounts(s, d)),
    "q48_salted_join" -> (Relational.saltedRevenueByBrand(_, _)),
    "q49_corpus_diff" -> ((s, d) => Dedup.corpusDiff(s, d)),
    "q50_variance" -> (Relational.acctbalVariance(_, _)),
    "q51_percentile" -> (Relational.pricePercentiles(_, _)),
    "q52_grouping_sets" -> (Relational.orderGroupingSets(_, _)),
    "q53_edit_distance" -> (Relational.nameEditDistance(_, _)),
    "q54_ivf_ann" -> ((s, d) => Similarity.ivfAnn(s, d)),
    "q55_pos_tokens" -> ((s, d) => TextAnalysis.positionalTokens(s, d)),
    "q56_topk_per_group" -> ((s, d) => Relational.topOrdersPerPriority(s, d)),
    "q57_rank_funcs" -> (Relational.orderRankFunctions(_, _)),
    "q58_approx_quantile" -> (Relational.approxPricePercentiles(_, _)),
    "q59_collect_sets" -> (Relational.userEventProfile(_, _)),
    "q60_date_facets" -> (Relational.orderDateFacets(_, _)),
    "q61_corr_subquery" -> (Relational.premiumParts(_, _)),
    "q62_media_resize" -> ((s, d) => Multimodal.resizePayloads(s, d)),
    "q63_train_split" -> (TextAnalysis.trainSplit(_, _)),
    "q64_vocab_oov" -> ((s, d) => TextAnalysis.vocabCoverage(s, d)),
    // scale path of q51: two-pass global ranking, no low-cardinality
    // window bottleneck; shares q51's oracle (identical result)
    "q65_pctl_scale" -> ((s, d) => Relational.pricePercentilesScalable(s, d)),
    "q66_union_distinct" -> (Relational.distinctNationKeys(_, _)),
    "q67_session_window" -> ((s, d) => EventOps.sessionWindows(s, d)),
    "q68_repetition" -> (TextAnalysis.repetitionMetrics(_, _)),
    // — round-4 widening: training-data pipeline completers —
    "q69_contamination" -> (TextAnalysis.contamination(_, _)),
    "q70_mix_weights" -> (TextAnalysis.mixingWeights(_, _)),
    "q71_seq_packing" -> ((s, d) => TextAnalysis.sequencePacking(s, d)),
    "q72_dedup_clusters" -> (Dedup.dedupClusters(_, _)),
    // — round-5 widening: clustering, quality gate, weighted sampling —
    "q73_kmeans" -> ((s, d) => Similarity.kmeansCells(s, d)),
    "q74_qgate" -> ((s, d) => TextAnalysis.qualityGate(s, d)),
    "q75_sample" -> ((s, d) => TextAnalysis.stratifiedSample(s, d)),
    "q76_srcdups" -> (Dedup.sourceDupMatrix(_, _)),
    "q77_survivor" -> (Dedup.clusterSurvivors(_, _)),
    // — round-8 widening: simhash Hamming near-dup join, duplicated-
    //   span statistics, semantic dedup over the k-means cells —
    "q78_simhash_pairs" -> ((s, d) => Dedup.simhashNearDup(s, d)),
    "q79_dup_spans" -> ((s, d) => Dedup.dupSpanStats(s, d)),
    "q80_semdedup" -> ((s, d) => Similarity.semDedup(s, d)),
    // — round-9 widening: bloom-prefiltered incremental dedup (the
    //   100 TB shape of q49 — identical result, so it shares q49's
    //   exact oracle) —
    "q81_bloom_diff" -> ((s, d) => Dedup.corpusDiffBloom(s, d)),
    // — round-10 widening: TF-IDF salient terms per document, and an
    //   add-one-smoothed bigram-LM fluency score over the q63 splits;
    //   both logs go through graft_ln (libm parity, see GraftLn) —
    "q82_tfidf_terms" -> ((s, d) => TextAnalysis.tfidfTerms(s, d)),
    "q83_bigram_lm" -> ((s, d) => TextAnalysis.bigramFluency(s, d)),
    // — round-11 widening: corpus-unigram surprisal (CCNet-style
    //   quality signal) and the Zipf rank-frequency fit per source
    //   (bounded-heap top-M, never a vocab-sized window) —
    "q84_surprisal" -> ((s, d) => TextAnalysis.tokenSurprisal(s, d)),
    "q85_zipf" -> ((s, d) => TextAnalysis.zipfSlope(s, d)),
    // CDC merge: the nightly snapshot-maintenance join (upserts +
    // deletes applied in one full-outer equi-join, Reindex.cdcMerge)
    "q86_cdc_merge" -> ((s, d) => Reindex.cdcMerge(s, d)),
    // ANN recall audit: recall@k of the q26 LSH index vs the exact
    // q24 top-k over the same probes (Similarity.annRecall)
    "q87_ann_recall" -> ((s, d) => Similarity.annRecall(s, d)),
    // — round-11 widening, batch 2: BM25 query-by-example retrieval
    //   (the reference's Solr sink ranks with exactly this function),
    //   per-source KL drift, and the two product-analytics staples —
    "q88_bm25" -> ((s, d) => TextAnalysis.bm25Search(s, d)),
    "q89_source_drift" -> ((s, d) => TextAnalysis.sourceDrift(s, d)),
    "q90_funnel" -> ((s, d) => EventOps.funnel(s, d)),
    "q91_retention" -> ((s, d) => EventOps.retentionCohorts(s, d)),
    // — round-11 widening, batch 3: product-quantization ANN (the
    //   memory-bound scale path — search touches codes + codebooks,
    //   never raw vectors), robust MAD length gate, session paths —
    "q92_pq_ann" -> ((s, d) => Similarity.pqAnn(s, d)),
    "q93_mad_outliers" -> ((s, d) => TextAnalysis.madOutliers(s, d)),
    "q94_session_paths" -> ((s, d) => EventOps.sessionPaths(s, d)),
    // — round-11 widening, batch 4: the IVF-PQ composition (coarse
    //   cell equi-join + ADC-over-codes), shingle-level source
    //   overlap, PMI collocations, fixed-count stratified sample —
    "q95_ivfpq_ann" -> ((s, d) => Similarity.ivfPqAnn(s, d)),
    "q96_source_overlap" -> ((s, d) => Dedup.sourceOverlap(s, d)),
    "q97_pmi" -> ((s, d) => TextAnalysis.pmiCollocations(s, d)),
    "q98_fixed_sample" -> ((s, d) => TextAnalysis.fixedSample(s, d)),
    // — round-11 widening, batch 5: a true time-RANGE window frame
    //   and the TPC-H Q5 six-table join-order workout —
    "q99_rolling_24h" -> ((s, d) => EventOps.rolling24h(s, d)),
    "q100_tpch_q5" -> ((s, d) => Relational.localSupplierVolume(s, d)),
    // all-pairs sparse TF-IDF cosine through the inverted index —
    // the lexical twin of the dense ANN tier (Bayardo et al. 2007)
    "q101_sparse_sim" -> ((s, d) => TextAnalysis.sparseCosinePairs(s, d)),
    // — round-12 widening: information/chunking/bucketing text ops,
    //   time-series monitoring (anomaly z-scores, zero-filled
    //   resample, rolling DAU/WAU), market-basket lift over sessions,
    //   and the external clustering-quality audit —
    "q102_token_entropy" -> ((s, d) => TextAnalysis.tokenEntropy(s, d)),
    "q103_doc_chunks" -> ((s, d) => TextAnalysis.slidingChunks(s, d)),
    "q104_len_deciles" -> ((s, d) => TextAnalysis.lengthDeciles(s, d)),
    "q105_hourly_anomaly" -> ((s, d) => EventOps.hourlyAnomalies(s, d)),
    "q106_resample" -> ((s, d) => EventOps.hourlyResample(s, d)),
    "q107_cooccurrence" -> ((s, d) => EventOps.sessionCooccurrence(s, d)),
    "q108_rolling_dau" -> ((s, d) => EventOps.rollingActiveUsers(s, d)),
    "q109_cell_purity" -> ((s, d) => Similarity.cellPurity(s, d)),
    // — round-12 widening, batch 2: originality ratio, forward-fill
    //   imputation, cumulative user growth, next-token suggestions —
    "q110_originality" -> ((s, d) => Dedup.originality(s, d)),
    "q111_forward_fill" -> ((s, d) => EventOps.forwardFill(s, d)),
    "q112_user_growth" -> ((s, d) => EventOps.userGrowth(s, d)),
    "q113_next_token" -> ((s, d) => TextAnalysis.nextTokenSuggest(s, d)),
    // — round-12 widening, batch 3: feature scaling, class balancing,
    //   and the skyline operator in window form —
    "q114_feature_scale" -> ((s, d) => TextAnalysis.normalizedQuality(s, d)),
    "q115_class_balance" -> ((s, d) => Similarity.balancedSample(s, d)),
    "q116_pareto" -> ((s, d) => Relational.paretoFrontier(s, d)),
    // — round-12 widening, batch 4: the cross-split contamination
    //   audit and the exact-moments correlation —
    "q117_split_leakage" -> ((s, d) => Dedup.splitLeakage(s, d)),
    "q118_len_quality_corr" -> ((s, d) => TextAnalysis.lengthQualityCorr(s, d)),
    // — round-12 widening, batch 5: graph centrality over the
    //   near-dup graph —
    "q119_pagerank" -> ((s, d) => Dedup.pageRank(s, d)),
    // — round-12 widening, batch 6: the third sketch (CMS point
    //   frequencies) and the blocked fuzzy join —
    "q120_cms_heavy_hitters" -> ((s, d) => TextAnalysis.cmsHeavyHitters(s, d)),
    "q121_fuzzy_join" -> ((s, d) => Dedup.fuzzyNamePairs(s, d)),
    // — round-12 widening, batch 7: robust statistics (winsorized
    //   means) and the arrival-process fingerprint —
    "q122_winsorized" -> ((s, d) => TextAnalysis.winsorizedStats(s, d)),
    "q123_interarrival" -> ((s, d) => EventOps.interArrivalStats(s, d)),
    // — round-12 widening, batch 8: asymmetric containment (the
    //   subset-dup detector Jaccard misses) and embedding-cluster
    //   geometry —
    "q124_containment" -> ((s, d) => Dedup.containment(s, d)),
    "q125_centroid_sim" -> ((s, d) => Similarity.centroidSimilarity(s, d)),
    // — round-12 widening, batch 9: funnel timing and the Heaps'-law
    //   growth diagnostic —
    "q126_conversion_latency" -> ((s, d) => EventOps.conversionLatency(s, d)),
    "q127_vocab_growth" -> ((s, d) => TextAnalysis.vocabGrowth(s, d)),
    // — round-12 widening, batch 10: symmetric source divergence and
    //   behavioral predictability —
    "q128_source_hellinger" -> ((s, d) => TextAnalysis.sourceHellinger(s, d)),
    "q129_transition_entropy" -> ((s, d) => EventOps.transitionEntropy(s, d)),
    // — round-12 widening, batch 11: near-dup graph structure and
    //   corpus-balance concentration —
    "q130_triangles" -> ((s, d) => Dedup.triangles(s, d)),
    "q131_gini" -> ((s, d) => TextAnalysis.giniConcentration(s, d)),
    // — round-12 widening, batch 12: corpus-composition independence
    //   test and the production hybrid-retrieval stack —
    "q132_chi_square" -> ((s, d) => TextAnalysis.chiSquareIndependence(s, d)),
    "q133_hybrid_rrf" -> ((s, d) => Similarity.hybridRrf(s, d)),
    // — round-12 widening, batch 13: weighted sampling with an
    //   unbiased mass estimator and the distribution-shape test —
    "q134_priority_sample" -> ((s, d) => TextAnalysis.prioritySample(s, d)),
    "q135_ks_matrix" -> ((s, d) => TextAnalysis.ksMatrix(s, d)),
    // — round-12 widening, batch 14: sketch-vs-exact calibration at
    //   pair granularity and the boilerplate detector —
    "q136_minhash_calibration" -> ((s, d) => Dedup.minhashCalibration(s, d)),
    "q137_boilerplate" -> ((s, d) => Dedup.boilerplate(s, d)),
    // — round-12 widening, batch 15: censoring-aware survival and
    //   leakage-free categorical encoding —
    "q138_kaplan_meier" -> ((s, d) => EventOps.kaplanMeier(s, d)),
    "q139_loo_encoding" -> ((s, d) => Similarity.looEncoding(s, d)),
    // — round-12 widening, batch 16: diversity-aware re-ranking —
    "q140_mmr" -> ((s, d) => Similarity.mmrSelect(s, d)),
    // — round-12 widening, batch 17: signal eval and distribution
    //   alignment —
    "q141_roc_auc" -> ((s, d) => TextAnalysis.rocAuc(s, d)),
    "q142_quantile_norm" -> ((s, d) => TextAnalysis.quantileNormalize(s, d)),
    // — round-12 widening, batch 18: label-noise audit and
    //   reciprocal-neighbor precision filtering —
    "q143_knn_label_noise" -> ((s, d) => Similarity.knnLabelNoise(s, d)),
    "q144_mutual_knn" -> ((s, d) => Similarity.mutualKnn(s, d)),
    // — round-12 widening, batch 19: scale-native uncertainty and
    //   dup-graph topology —
    "q145_bootstrap_ci" -> ((s, d) => TextAnalysis.bootstrapCi(s, d)),
    "q146_assortativity" -> ((s, d) => Dedup.assortativity(s, d)),
    // — round-12 widening, batch 20: contrastive mining and
    //   vocabulary burstiness —
    "q147_hard_negatives" -> ((s, d) => Similarity.hardNegatives(s, d)),
    "q148_burstiness" -> ((s, d) => TextAnalysis.tokenBurstiness(s, d)),
    // — round-12 widening, batch 21: as-of attribution and
    //   chance-corrected label agreement —
    "q149_last_touch" -> ((s, d) => EventOps.lastTouchAttribution(s, d)),
    "q150_centroid_kappa" -> ((s, d) => Similarity.centroidKappa(s, d)),
    // — round-12 widening, batch 22: split-distribution audit and
    //   packing fragmentation —
    "q151_split_affinity" -> ((s, d) => TextAnalysis.splitAffinity(s, d)),
    "q152_packing_audit" -> ((s, d) => TextAnalysis.packingEfficiency(s, d)),
    // — round-12 widening, batch 23: tail diagnostics and behavioral
    //   cohorts —
    "q153_hill_tail" -> ((s, d) => TextAnalysis.hillTailIndex(s, d)),
    "q154_rfm" -> ((s, d) => EventOps.rfmSegments(s, d)),
    // — round-12 widening, batch 24: channel economics and dedup
    //   shardability —
    "q155_channel_revenue" -> ((s, d) => EventOps.channelRevenue(s, d)),
    "q156_modularity" -> ((s, d) => Dedup.sourceModularity(s, d)),
    // — round-12 widening, batch 25: LSH tuning and weighted-sample
    //   planning —
    "q157_band_curve" -> ((s, d) => Dedup.bandOperatingCurve(s, d)),
    "q158_ess" -> ((s, d) => TextAnalysis.effectiveSampleSize(s, d)),
    // — round-12 widening, batch 26: stream compaction and long-run
    //   behavior —
    "q159_run_lengths" -> ((s, d) => EventOps.runLengths(s, d)),
    "q160_stationary" -> ((s, d) => EventOps.stationaryDistribution(s, d)),
    // — round-12 widening, batch 27: probability calibration and
    //   targeting curves —
    "q161_calibration" -> ((s, d) => TextAnalysis.sourceCalibration(s, d)),
    "q162_gains" -> ((s, d) => TextAnalysis.gainsTable(s, d)),
    // — round-12 widening, batch 28: grouped-jackknife error bars and
    //   value forensics —
    "q163_jackknife" -> ((s, d) => TextAnalysis.jackknifeRatio(s, d)),
    "q164_benford" -> ((s, d) => EventOps.benfordAudit(s, d)),
    // — round-12 widening, batch 29: retrieval eval and dedup
    //   capacity planning —
    "q165_label_mrr" -> ((s, d) => Similarity.labelMrr(s, d)),
    "q166_cluster_sizes" -> ((s, d) => Dedup.clusterSizeHistogram(s, d)),
    // — round-12 widening, batch 30: token-weighted quantiles and
    //   ingestion-duplicate forensics —
    "q167_weighted_quantiles" -> ((s, d) => TextAnalysis.weightedLengthQuantiles(s, d)),
    "q168_event_dups" -> ((s, d) => EventOps.eventDupAudit(s, d)),
    // — round-12 widening, batch 31: rank association and the length
    //   prior regression —
    "q169_spearman" -> ((s, d) => TextAnalysis.spearmanCorr(s, d)),
    "q170_grouped_ols" -> ((s, d) => TextAnalysis.groupedOls(s, d)),
    // — round-12 widening, batch 32: do-sources-differ hypothesis
    //   tests (omnibus + flagship pair) —
    "q171_anova" -> ((s, d) => TextAnalysis.anovaLength(s, d)),
    "q172_welch" -> ((s, d) => TextAnalysis.welchTest(s, d)),
    // — round-12 widening, batch 33: time-series diagnostics on the
    //   zero-filled daily stream —
    "q173_autocorr" -> ((s, d) => EventOps.dailyAutocorrelation(s, d)),
    "q174_mann_kendall" -> ((s, d) => EventOps.mannKendall(s, d)),
    // — round-12 widening, batch 34: the reshape surface's missing
    //   half and a log-free diversity audit —
    "q175_unpivot" -> ((s, d) => Relational.monthlyMetricsLong(s, d)),
    "q176_token_hhi" -> ((s, d) => Relational.tokenHhi(s, d)),
    // — round-12 widening, batch 35: load-time data-quality audits —
    "q177_column_profile" -> ((s, d) => Relational.columnProfile(s, d)),
    "q178_integrity" -> ((s, d) => Relational.integrityAudit(s, d)),
    // — round-12 widening, batch 36: release-gate scrubbing census
    //   and exact outlier alarms —
    "q179_pii_scan" -> ((s, d) => TextAnalysis.piiScan(s, d)),
    "q180_value_outliers" -> ((s, d) => EventOps.valueOutliers(s, d)),
    // — round-12 widening, batch 37: the native Jaro-Winkler scalar
    //   and weekly shape —
    "q181_name_reconcile" -> ((s, d) => Dedup.nameReconcile(s, d)),
    "q182_weekday_index" -> ((s, d) => EventOps.weekdaySeasonality(s, d)),
    // — round-12 widening, batch 38: level-shift location and the
    //   mix-shift gate —
    "q183_cusum" -> ((s, d) => EventOps.cusumChangepoint(s, d)),
    "q184_prop_test" -> ((s, d) => EventOps.purchaseShiftTest(s, d)),
    // — round-12 widening, batch 39: behavioral implication mining
    //   and the smoothing baseline —
    "q185_assoc_rules" -> ((s, d) => EventOps.associationRules(s, d)),
    "q186_ewma" -> ((s, d) => EventOps.ewmaDaily(s, d)),
    // — round-12 widening, batch 40: the trained lang-id classifier
    //   (q30's twin) and position-sensitive retrieval quality —
    "q187_naive_bayes" -> ((s, d) => TextAnalysis.naiveBayesLang(s, d)),
    "q188_ndcg" -> ((s, d) => Similarity.labelNdcg(s, d)),
    // — round-12 widening, batch 41: the lead/lag detector (q173's
    //   bivariate twin) and the robust trend slope (q174's partner) —
    "q189_ccf" -> ((s, d) => EventOps.crossCorrelation(s, d)),
    "q190_theil_sen" -> ((s, d) => EventOps.theilSen(s, d)),
    // — round-12 widening, batch 42: TPC-H Q7's two-dimension join
    //   shape and the Fightin'-Words corpus comparison —
    "q191_tpch_q7" -> ((s, d) => Relational.nationVolume(s, d)),
    "q192_log_odds" -> ((s, d) => TextAnalysis.logOddsTerms(s, d)),
    // — round-12 widening, batch 43: trend-aware smoothing (q186's
    //   partner) and the Good-Turing frequency spectrum (q83's) —
    "q193_holt" -> ((s, d) => EventOps.holtDaily(s, d)),
    "q194_good_turing" -> ((s, d) => TextAnalysis.goodTuring(s, d)),
    // — round-12 widening, batch 44: the two remaining canonical
    //   TPC-H join workouts expressible on this schema — Q8's
    //   seven-table market share and Q10's returned-item top-k —
    "q195_tpch_q8" -> ((s, d) => Relational.marketShare(s, d)),
    "q196_tpch_q10" -> ((s, d) => Relational.returnedItemRevenue(s, d)),
    // — round-12 widening, batch 45: TPC-H Q13's outer-join histogram
    //   (the k = 0 bin needs the LEFT join) and Q14's promo share —
    "q197_tpch_q13" -> ((s, d) => Relational.customerOrderDistribution(s, d)),
    "q198_tpch_q14" -> ((s, d) => Relational.promoRevenueShare(s, d)),
    // — round-12 widening, batch 46: TPC-H Q3's segment-driven top-k
    //   and Q18's HAVING-driven large-volume semi-join —
    "q199_tpch_q3" -> ((s, d) => Relational.shippingPriority(s, d)),
    "q200_tpch_q18" -> ((s, d) => Relational.largeVolumeCustomers(s, d)),
    // — round-13 batch 47: TPC-H Q15's max-revenue supplier (the
    //   CREATE VIEW + scalar subquery collapsed to one aggregate +
    //   broadcast max-match) and Q6's scan-dominated what-if — both
    //   landed in r12's final snapshot unregistered (VERDICT r12 #2) —
    "q201_tpch_q15" -> ((s, d) => Relational.topSupplier(s, d)),
    "q202_tpch_q6" -> ((s, d) => Relational.forecastRevenueChange(s, d)),
    // — round-13 batch 48: the rest of the TPC-H relational muscle,
    //   schema-adapted (no partsupp / receipt dates / phone — each
    //   scaladoc states the stand-in): Q2's correlated min-cost
    //   supplier, Q11's scalar-subquery HAVING, Q16's distinct-count
    //   with blacklist anti-join, Q20's nested-aggregate semi-join,
    //   Q21's double-EXISTS sole-late-shipper, Q22's idle customers —
    "q203_tpch_q2" -> ((s, d) => Relational.minCostSupplier(s, d)),
    "q204_tpch_q11" -> ((s, d) => Relational.importantStock(s, d)),
    "q205_tpch_q16" -> ((s, d) => Relational.partSupplierCounts(s, d)),
    "q206_tpch_q20" -> ((s, d) => Relational.partPromotion(s, d)),
    "q207_tpch_q21" -> ((s, d) => Relational.soleLateShipper(s, d)),
    "q208_tpch_q22" -> ((s, d) => Relational.idleCustomers(s, d)),
    // — round-13 batch 49: recall gates for the ungated ANN tiers
    //   (VERDICT r12 #5) — q87 audits only the sign-LSH index; these
    //   give IVF (q54), PQ (q92) and IVF-PQ (q95) each their own
    //   recall@k row against the exact brute-force top-k —
    "q209_ivf_recall" -> ((s, d) => Similarity.ivfRecall(s, d)),
    "q210_pq_recall" -> ((s, d) => Similarity.pqRecall(s, d)),
    "q211_ivfpq_recall" -> ((s, d) => Similarity.ivfPqRecall(s, d)),
    // — round-13 batch 50: the last five TPC-H shapes — with these,
    //   all 22 TPC-H queries exist on this schema (each scaladoc
    //   states its stand-in where partsupp/shipmode/receipt dates are
    //   absent): Q4's EXISTS semi-join, Q9's five-table profit
    //   rollup, Q12's conditional-count pivot, Q17's correlated
    //   per-part average, Q19's OR-of-ANDs bracket join —
    "q212_tpch_q4" -> ((s, d) => Relational.priorityChecking(s, d)),
    "q213_tpch_q9" -> ((s, d) => Relational.productProfit(s, d)),
    "q214_tpch_q12" -> ((s, d) => Relational.latePriorityCounts(s, d)),
    "q215_tpch_q17" -> ((s, d) => Relational.smallQuantityRevenue(s, d)),
    "q216_tpch_q19" -> ((s, d) => Relational.discountedRevenue(s, d)),
    // — round-13 batch 51: embedding serving infra — the power-method
    //   principal direction (PCA whitening / anisotropy), the int8
    //   quantization error budget, and the deterministic shard
    //   assignment + balance audit every training export needs —
    "q217_principal_component" -> ((s, d) => Similarity.principalComponent(s, d)),
    "q218_quant_audit" -> ((s, d) => Similarity.quantizationAudit(s, d)),
    "q219_shard_balance" -> ((s, d) => TextAnalysis.shardBalance(s, d)),
    // — round-13 batch 52: the anisotropy audit composing q217's
    //   direction, and the tokenizer fertility profile —
    "q220_source_anisotropy" -> ((s, d) => Similarity.sourceAnisotropy(s, d)),
    "q221_token_fertility" -> ((s, d) => TextAnalysis.tokenizerFertility(s, d)),
    // — round-13 batch 53: interval-weighted time-series fairness —
    "q222_twap" -> ((s, d) => EventOps.twapDaily(s, d)),
    // — round-13 batch 54: the scale twin for q25's all-pairs
    //   baseline (within-Lloyd-cell pair mining, the q80
    //   architecture) + its measured pair-recall audit —
    "q223_cell_pairs" -> ((s, d) => Similarity.thresholdPairsCell(s, d)),
    "q224_pair_recall" -> ((s, d) => Similarity.thresholdPairRecall(s, d)),
    // — round-13 batch 55: execute q70's mixture plan (integer
    //   quotas, md5-priority fill) and audit the realized take —
    "q225_mixture_sample" -> ((s, d) => TextAnalysis.mixtureSample(s, d)),
    // — round-14: the streaming tier enters the hash gate — each runs
    //   a Structured Streaming plan to completion (AvailableNow) and
    //   returns the materialized result; quantized integer sums make
    //   the nondeterministic micro-batch accumulation order irrelevant —
    "q226_stream_windows" -> ((s, d) => streaming.StreamQueries.windowedTotals(s, d)),
    "q227_stream_sessions" -> ((s, d) => streaming.StreamQueries.sessionTotals(s, d)),
    "q228_stream_dedup" -> ((s, d) => streaming.StreamQueries.dedupReplayAudit(s, d)),
    "q229_stream_join" -> ((s, d) => streaming.StreamQueries.joinedPairs(s, d)),
    "q230_stream_ingest" -> ((s, d) => streaming.StreamQueries.ingestAudit(s, d)),
    // — round-14 batch 2: interchange formats + partitioned layout —
    //   each is a REAL write→read round-trip through a temp dir; the
    //   oracle on the original parquet certifies the whole path
    "q231_orc_roundtrip" -> ((s, d) => sources.FormatOps.orcRoundtrip(s, d)),
    "q232_csv_roundtrip" -> ((s, d) => sources.FormatOps.csvRoundtrip(s, d)),
    "q233_partition_prune" -> ((s, d) => sources.FormatOps.partitionPrune(s, d)),
    // — round-14 batch 3: warehouse-maintenance + model-fit patterns —
    "q234_ols_trend" -> (EventOps.trendByType(_, _)),
    "q235_incr_merge" -> (EventOps.incrementalMerge(_, _)),
    "q236_scd2" -> (EventOps.scd2Dimension(_, _)),
    // — round-14 batch 4: bucketed layout + deterministic PPS sampling —
    "q237_bucketed_join" -> (Bucketing.colocatedRevenue(_, _)),
    "q238_pps_sample" -> ((s, d) => TextAnalysis.ppsSample(s, d)),
    // — round-14 batch 5: arbitrary keyed streaming state + the
    //   NULL-semantics cross-engine parity audit —
    "q239_stream_state" -> ((s, d) => streaming.StreamQueries.statefulTotals(s, d)),
    "q240_null_semantics" -> (EventOps.nullSemantics(_, _)),
    // — round-14 batch 6: mergeable sketches, model fitting, ranking
    //   metrics, graph reach, recommenders, forecast skill —
    "q241_kmv_distinct" -> ((s, d) => TextAnalysis.kmvDistinct(s, d)),
    "q242_logreg" -> ((s, d) => TextAnalysis.logisticFit(s, d)),
    "q243_avg_precision" -> ((s, d) => TextAnalysis.averagePrecision(s, d)),
    "q244_bfs_hops" -> ((s, d) => Dedup.bfsHops(s, d)),
    "q245_item_cf" -> ((s, d) => EventOps.itemNeighbors(s, d)),
    "q246_mase" -> ((s, d) => EventOps.seasonalMase(s, d)),
    // — round-14 batch 7: exact sub-quadratic set-similarity join —
    //   q22's TRUE scale twin: same result set, prefix-filtered
    //   candidates (OperatorSpec asserts set equality vs q22)
    "q247_prefix_jaccard" -> ((s, d) => Dedup.prefixJaccard(s, d)),
    // z-order data-skipping audit, join-view IVM, FD discovery
    "q248_zorder" -> ((s, d) => Bucketing.zorderAudit(s, d)),
    "q249_join_ivm" -> ((s, d) => Relational.joinIvm(s, d)),
    "q250_fd_audit" -> (Relational.fdAudit(_, _)),
    // Markov removal-effect attribution + categorical tail collapse
    "q251_markov_attribution" -> ((s, d) => EventOps.markovAttribution(s, d)),
    "q252_tail_collapse" -> ((s, d) => TextAnalysis.tailCollapse(s, d)),
    // log-free feature selection + consistent-hashing churn audit
    "q253_gini_gain" -> (TextAnalysis.giniGain(_, _)),
    "q254_rebalance_churn" -> (TextAnalysis.rebalanceChurn(_, _)),
    // ranked-head drift metric + parquet schema-evolution audit
    "q255_rbo" -> ((s, d) => TextAnalysis.rboSourceSimilarity(s, d)),
    "q256_schema_evolution" -> ((s, d) => sources.FormatOps.schemaEvolution(s, d)),
    // planner-statistics audit: histogram join-size estimate vs truth
    "q257_join_estimate" -> ((s, d) => Relational.joinEstimate(s, d)),
    // graph density backbone + sampling-estimator closure
    "q258_kcore" -> ((s, d) => Dedup.kcorePeel(s, d)),
    "q259_ht_estimate" -> ((s, d) => TextAnalysis.htEstimate(s, d)),
    // multiset near-dup scoring + broken-stick regime selection
    "q260_weighted_jaccard" -> ((s, d) => Dedup.weightedJaccard(s, d)),
    "q261_segmented_trend" -> ((s, d) => EventOps.segmentedTrend(s, d)),
    // sketch set-algebra, shuffle-strategy audit, submodular selection
    "q262_kmv_pair_sim" -> ((s, d) => TextAnalysis.kmvPairSim(s, d)),
    "q263_skew_audit" -> ((s, d) => SkewJoin.skewAudit(s, d)),
    "q264_set_cover" -> ((s, d) => TextAnalysis.setCoverSources(s, d)),
    // dimensionality-reduction trust gate + experiment variance reduction
    "q265_jl_distortion" -> ((s, d) => Similarity.jlDistortion(s, d)),
    "q266_cuped" -> ((s, d) => EventOps.cupedReadout(s, d)),
    // survey-design allocation + non-monoid IVM parity
    "q267_neyman" -> ((s, d) => TextAnalysis.neymanAllocation(s, d)),
    "q268_session_merge" -> ((s, d) => EventOps.sessionMergeParity(s, d)),
    // monotone calibration by the declarative PAVA closed form
    "q269_isotonic" -> ((s, d) => TextAnalysis.isotonicCalibration(s, d)),
    // forecast-evaluation triple over the calibrated buckets
    "q270_brier" -> ((s, d) => TextAnalysis.brierDecomposition(s, d)),
    // early-termination top-k merge depth (threshold algorithm)
    "q271_ta_depth" -> ((s, d) => TextAnalysis.taDepthAudit(s, d))
  )

  // Incremental-dedup oracle shared by q49 (plain left_anti) and q81
  // (bloom-prefiltered): both compute exactly this set, so ONE
  // definition keeps the pair honest.
  private val CorpusDiffSql =
    """WITH fp AS (SELECT doc_id, source,
      |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
      |  FROM documents),
      |corp AS (SELECT DISTINCT fp FROM fp WHERE doc_id < 250)
      |SELECT f.doc_id, f.source FROM fp f WHERE f.fp NOT IN (SELECT fp FROM corp)""".stripMargin

  // Exact SQL mirror of TextFunctions.qualityScore (IEEE-sequence-
  // critical): TTR*0.5 + min(avgWordLen/10, 1)*0.5 — ONE definition
  // shared by q31 and q74 so the two oracle copies cannot drift.
  private val qualitySql =
    """(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |     / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.5
      |  + least((CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
      |     / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 10.0, 1.0) * 0.5""".stripMargin

  // Shared oracle fragments: shingle CTE (word 3-grams, distinct per
  // doc) exactly mirroring TextFunctions.shingles.
  private val shingleCte =
    """w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |  unnest([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) AS shingle
      |  FROM w WHERE len(w) >= 3)""".stripMargin

  // MinHash-LSH candidate pairs as a reusable CTE chain (ends in
  // mh_pairs) — the seeded-fold contract mirrored from
  // graft.plans.MinHashes; shared by q21 and q72's recursive closure.
  private val minhashPairsCte =
    s"""$shingleCte,
       |hs AS (SELECT doc_id,
       |  list_reduce(list_concat([CAST(0 AS BIGINT)],
       |    list_transform(range(1, length(shingle) + 1), j -> CAST(ascii(substr(shingle, j, 1)) AS BIGINT))),
       |    (a, b) -> (a * 31 + b) % 4294967296) AS f
       |  FROM sh),
       |mh AS (SELECT doc_id, seed,
       |  min(CAST((CAST((((2654435761 * (seed + 1)) % 4294967296) | 1) AS HUGEINT) * f + seed)
       |      % 4294967296 AS BIGINT)) AS mh
       |  FROM hs CROSS JOIN (SELECT unnest(range(0, 8)) AS seed) seeds
       |  GROUP BY doc_id, seed),
       |sig AS (SELECT doc_id, seed // 2 AS band, string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS sig
       |  FROM mh GROUP BY doc_id, seed // 2),
       |mh_pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)""".stripMargin

  // Recursive min-reachable-id closure over the minhash candidate
  // pairs, ending in `cc_labels(doc_id, cluster_id)` — the exact
  // oracle of Dedup.connectedComponents' fixpoint, ONE definition
  // shared by q72 and q77 so the two copies cannot drift.  Callers
  // must open with WITH RECURSIVE.
  private val closureCte =
    s"""$minhashPairsCte,
       |e AS (SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
       |      UNION SELECT doc_b, doc_a FROM mh_pairs),
       |r AS (SELECT src AS doc_id, dst AS peer FROM e
       |      UNION
       |      SELECT r.doc_id, e.dst FROM r JOIN e ON r.peer = e.src),
       |cc_labels AS (SELECT doc_id, CAST(least(doc_id, min(peer)) AS BIGINT) AS cluster_id
       |              FROM r GROUP BY doc_id)""".stripMargin

  // Norm CTE mirroring VectorFunctions: sequential left-fold sums via
  // list_reduce (bit-identical to Spark's aggregate() fold).
  private val normCte =
    """e AS (SELECT vec_id, embedding,
      |  sqrt(list_reduce(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
      |  FROM embeddings)""".stripMargin

  private def dotSql(aEmb: String, bEmb: String): String =
    s"""list_reduce(list_transform(range(1, len($aEmb) + 1),
       |  i -> CAST($aEmb[i] AS DOUBLE) * CAST($bEmb[i] AS DOUBLE)), (a, b) -> a + b)""".stripMargin

  /** Shared q149/q155 attribution chain: events in integer µs,
    * purchases, touches, and the per-purchase argmax-(tus, t_id)
    * strictly-earlier touch (j1).  Emits CTEs e / p / t / j / j1.
    */
  private val lastTouchCte =
    """e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      |  FROM events),
      |p AS (SELECT user_id, event_id AS purchase_id, us AS pus FROM e
      |      WHERE event_type = 'purchase'),
      |t AS (SELECT user_id, event_id AS t_id, event_type AS t_type, us AS tus
      |      FROM e WHERE event_type IN ('click', 'view')),
      |j AS (SELECT p.purchase_id, t.t_type, t.t_id, t.tus,
      |  row_number() OVER (PARTITION BY p.purchase_id
      |    ORDER BY t.tus DESC, t.t_id DESC) AS rk
      |  FROM p JOIN t ON t.user_id = p.user_id AND t.tus < p.pus),
      |j1 AS (SELECT * FROM j WHERE rk = 1)""".stripMargin

  /** One band-width row of the q157 operating curve: band keys by
    * seed-order string_agg (the q21 contract), bucket sizes, then
    * exact integer occupancy statistics.  Emits CTEs sw$w / bw$w /
    * st$w; assumes the `mh` CTE (doc_id, seed, mh) is in scope.
    */
  private def bandStatsCte(w: Int, numHashes: Int = 8): String =
    s"""sw$w AS (SELECT doc_id, seed // $w AS band,
       |  string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS sig
       |  FROM mh GROUP BY doc_id, seed // $w),
       |bw$w AS (SELECT band, sig, count(*) AS s FROM sw$w GROUP BY band, sig),
       |st$w AS (SELECT CAST($w AS INTEGER) AS rows_per_band,
       |  CAST(${numHashes / w} AS INTEGER) AS n_bands,
       |  count(*) AS n_buckets,
       |  CAST(sum(CASE WHEN s > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi_buckets,
       |  CAST(sum((s * (s - 1)) // 2) AS BIGINT) AS join_pairs,
       |  CAST(max(s) AS BIGINT) AS max_bucket FROM bw$w)""".stripMargin

  /** One q160 power iteration, mirroring
    * EventOps.stationaryDistribution: neighbor sums fold in prev
    * order (the q119 contract).  Emits CTE v$i referencing v${i-1}.
    */
  private def statIterCte(i: Int): String =
    s"""v$i AS (SELECT p.next AS state,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list(v.prob * p.p ORDER BY p.prev)), (a, b) -> a + b) AS prob
       |  FROM v${i - 1} v JOIN p ON p.prev = v.state GROUP BY p.next)""".stripMargin

  /** Bucketed all-vector kNN CTE chain (q143/q144), mirroring
    * Similarity.bucketedAllKnn: label-carrying norm frame, 6-bit
    * axis-sign buckets (the q26 rule), within-bucket cosine ranking,
    * rank ≤ k.  Emits CTEs el / ebk / bpairs / br / knn.
    */
  private def allKnnCte(k: Int): String =
    s"""el AS (SELECT vec_id, label, embedding,
       |  sqrt(list_reduce(list_transform(embedding,
       |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
       |  FROM embeddings),
       |ebk AS (SELECT *,
       |  (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
       | + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
       | + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
       | + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END
       | + CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END
       | + CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END) AS bucket FROM el),
       |bpairs AS (SELECT a.vec_id, a.label, c.vec_id AS neighbor_id,
       |    c.label AS n_label,
       |    ${dotSql("a.embedding", "c.embedding")} / (a.nrm * c.nrm) AS cos
       |  FROM ebk a JOIN ebk c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id),
       |br AS (SELECT *, row_number() OVER (PARTITION BY vec_id
       |  ORDER BY cos DESC, neighbor_id) AS rank FROM bpairs),
       |knn AS (SELECT * FROM br WHERE rank <= $k)""".stripMargin

  /** One Lloyd iteration (q54), mirroring Similarity.lloydCentroids:
    * assign sample vectors to argmax-dot centroid (ties → lowest cid),
    * recompute each centroid as the per-dim mean folded in vec_id order
    * and rounded back to float32; empty cells keep the previous
    * centroid.  `prev` is the previous centroid CTE name; emits CTEs
    * a$i/u$i/m$i and the new centroid CTE c$i.
    */
  private def lloydIterSql(prev: String, i: Int): String =
    s"""a$i AS (SELECT s.vec_id, s.embedding, c.cid,
       |  row_number() OVER (PARTITION BY s.vec_id ORDER BY
       |    ${dotSql("s.embedding", "c.c_emb")} DESC, c.cid) AS rk
       |  FROM smp s CROSS JOIN $prev c),
       |u$i AS (SELECT cid, list(embedding ORDER BY vec_id) AS embs
       |  FROM a$i WHERE rk = 1 GROUP BY cid),
       |m$i AS (SELECT cid, [CAST(list_reduce(list_transform(embs,
       |    x -> CAST(x[d] AS DOUBLE)), (a, b) -> a + b) / len(embs) AS REAL)
       |  FOR d IN range(1, 65)] AS c_emb FROM u$i),
       |c$i AS (SELECT p.cid, coalesce(m$i.c_emb, p.c_emb) AS c_emb
       |  FROM $prev p LEFT JOIN m$i USING (cid))""".stripMargin

  /** Per-subspace PQ codebook CTEs (q92), mirroring Similarity.pqAnn:
    * slice the embedding to subspace `s`, q54's Lloyd contract at
    * subDim dims (first-k init, bounded sample, ONE iteration,
    * argmax-dot ties→lowest-cid, vec_id-ordered mean fold, float32
    * round-back, empty cells keep previous), then the full-corpus code
    * assignment.  Emits CTEs sub$s/psmp$s/pc${s}0/pa$s/pu$s/pm$s/
    * pc${s}1 (the trained codebook) and pk$s (the code column).
    */
  private def pqSubspaceSql(s: Int, subDim: Int, k: Int, sampleN: Int): String = {
    val lo = s * subDim + 1
    val hi = (s + 1) * subDim
    s"""sub$s AS (SELECT vec_id, embedding[$lo:$hi] AS embedding FROM embeddings),
       |psmp$s AS (SELECT vec_id, embedding FROM sub$s WHERE vec_id < $sampleN),
       |pc${s}0 AS (SELECT vec_id AS cid, embedding AS c_emb FROM sub$s WHERE vec_id < $k),
       |pa$s AS (SELECT t.vec_id, t.embedding, c.cid,
       |  row_number() OVER (PARTITION BY t.vec_id ORDER BY
       |    ${dotSql("t.embedding", "c.c_emb")} DESC, c.cid) AS rk
       |  FROM psmp$s t CROSS JOIN pc${s}0 c),
       |pu$s AS (SELECT cid, list(embedding ORDER BY vec_id) AS embs
       |  FROM pa$s WHERE rk = 1 GROUP BY cid),
       |pm$s AS (SELECT cid, [CAST(list_reduce(list_transform(embs,
       |    x -> CAST(x[d] AS DOUBLE)), (a, b) -> a + b) / len(embs) AS REAL)
       |  FOR d IN range(1, ${subDim + 1})] AS c_emb FROM pu$s),
       |pc${s}1 AS (SELECT p.cid, coalesce(pm$s.c_emb, p.c_emb) AS c_emb
       |  FROM pc${s}0 p LEFT JOIN pm$s USING (cid)),
       |pk$s AS (SELECT vec_id, cid FROM (
       |  SELECT t.vec_id, c.cid, row_number() OVER (PARTITION BY t.vec_id ORDER BY
       |    ${dotSql("t.embedding", "c.c_emb")} DESC, c.cid) AS rk
       |  FROM sub$s t CROSS JOIN pc${s}1 c) z WHERE rk = 1)""".stripMargin
  }

  /** Tier-ANN oracle bodies, shared verbatim by the index queries
    * (q54/q92/q95) and their recall audits (q209-q211), so the audited
    * index and the audit can never drift apart.
    */
  /** The q54 trained-cell CTE prefix (c0..e: 2-iter Lloyd, full-corpus
    * assignment, norms), shared verbatim by the IVF index (q54) and
    * the cell-bounded threshold-pair twin + its recall audit
    * (q223/q224).
    */
  private def ivfCellsSql: String =
    s"""c0 AS (SELECT vec_id AS cid, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
       |smp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 256),
       |${lloydIterSql("c0", 1)},
       |${lloydIterSql("c1", 2)},
       |a AS (SELECT vec_id, embedding, cid,
       |  row_number() OVER (PARTITION BY vec_id
       |    ORDER BY ${dotSql("embedding", "c_emb")} DESC, cid) AS rk
       |  FROM embeddings CROSS JOIN c2),
       |asg AS (SELECT vec_id, embedding, cid FROM a WHERE rk = 1),
       |e AS (SELECT vec_id, embedding, cid,
       |  sqrt(list_reduce(list_transform(embedding,
       |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
       |  FROM asg)""".stripMargin

  private def ivfAnnSql: String =
    s"""WITH $ivfCellsSql,
       |pairs AS (SELECT p.vec_id AS probe_id, q.vec_id AS neighbor_id,
       |  ${dotSql("p.embedding", "q.embedding")} / (p.nrm * q.nrm) AS cos
       |  FROM e p JOIN e q ON p.cid = q.cid AND p.vec_id < 6 AND p.vec_id <> q.vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
       |  ORDER BY cos DESC, neighbor_id) AS rank FROM pairs)
       |SELECT probe_id, neighbor_id, cos AS cos_sim, CAST(rank AS INTEGER) AS rank
       |FROM r WHERE rank <= 3""".stripMargin

  /** Cell-bounded threshold pairs (q223), shared with its q224 recall
    * audit: q25's output contract restricted to same-cell candidates.
    */
  private def cellPairsSql: String =
    s"""WITH $ivfCellsSql,
       |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
       |  FROM e a JOIN e b ON a.cid = b.cid AND a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, cos AS cos_sim FROM p WHERE cos >= 0.42""".stripMargin

  /** q25's exact all-pairs oracle body, shared with q224. */
  private def thresholdPairsSql: String =
    s"""WITH $normCte,
       |pairs AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
       |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, cos AS cos_sim FROM pairs WHERE cos >= 0.42""".stripMargin

  private def pqAnnSql: String =
    s"""WITH ${(0 until 4).map(pqSubspaceSql(_, 16, 8, 256)).mkString(",\n")},
       |codes AS (SELECT pk0.vec_id, pk0.cid AS k0, pk1.cid AS k1,
       |    pk2.cid AS k2, pk3.cid AS k3
       |  FROM pk0 JOIN pk1 USING (vec_id) JOIN pk2 USING (vec_id)
       |  JOIN pk3 USING (vec_id)),
       |sc AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
       |  ${dotSql("p.embedding[1:16]", "z0.c_emb")}
       |  + ${dotSql("p.embedding[17:32]", "z1.c_emb")}
       |  + ${dotSql("p.embedding[33:48]", "z2.c_emb")}
       |  + ${dotSql("p.embedding[49:64]", "z3.c_emb")} AS adc
       |  FROM embeddings p JOIN codes c ON p.vec_id < 10 AND p.vec_id <> c.vec_id
       |  JOIN pc01 z0 ON z0.cid = c.k0
       |  JOIN pc11 z1 ON z1.cid = c.k1
       |  JOIN pc21 z2 ON z2.cid = c.k2
       |  JOIN pc31 z3 ON z3.cid = c.k3),
       |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
       |  ORDER BY adc DESC, neighbor_id) AS rank FROM sc)
       |SELECT probe_id, CAST(rank AS INTEGER) AS rank, neighbor_id, adc
       |FROM r WHERE rank <= 5""".stripMargin

  private def ivfPqAnnSql: String =
    s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
       |smp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 256),
       |${lloydIterSql("c0", 1)},
       |cellasg AS (SELECT vec_id, cid AS cell FROM (
       |  SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |    ${dotSql("e.embedding", "c.c_emb")} DESC, c.cid) AS rk
       |  FROM embeddings e CROSS JOIN c1 c) z WHERE rk = 1),
       |${(0 until 4).map(pqSubspaceSql(_, 16, 8, 256)).mkString(",\n")},
       |codes AS (SELECT pk0.vec_id, ca.cell, pk0.cid AS k0, pk1.cid AS k1,
       |    pk2.cid AS k2, pk3.cid AS k3
       |  FROM pk0 JOIN pk1 USING (vec_id) JOIN pk2 USING (vec_id)
       |  JOIN pk3 USING (vec_id) JOIN cellasg ca USING (vec_id)),
       |sc AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
       |  ${dotSql("p.embedding[1:16]", "z0.c_emb")}
       |  + ${dotSql("p.embedding[17:32]", "z1.c_emb")}
       |  + ${dotSql("p.embedding[33:48]", "z2.c_emb")}
       |  + ${dotSql("p.embedding[49:64]", "z3.c_emb")} AS adc
       |  FROM embeddings p JOIN cellasg pc ON pc.vec_id = p.vec_id
       |  JOIN codes c ON p.vec_id < 10 AND p.vec_id <> c.vec_id AND c.cell = pc.cell
       |  JOIN pc01 z0 ON z0.cid = c.k0
       |  JOIN pc11 z1 ON z1.cid = c.k1
       |  JOIN pc21 z2 ON z2.cid = c.k2
       |  JOIN pc31 z3 ON z3.cid = c.k3),
       |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
       |  ORDER BY adc DESC, neighbor_id) AS rank FROM sc)
       |SELECT probe_id, CAST(rank AS INTEGER) AS rank, neighbor_id, adc
       |FROM r WHERE rank <= 5""".stripMargin

  /** Recall@k audit around any tier's oracle body (q209-q211),
    * mirroring Similarity.recallAgainstExact: the exact brute-force
    * top-`kExact` over `nProbes` probes LEFT-joins the tier's
    * (probe, neighbor) set — which runs unchanged inside a subquery —
    * then per-probe hit counts and one exact-integer divide.
    */
  private def tierRecallSql(tierSql: String, nProbes: Int, kExact: Int): String =
    s"""WITH el AS (SELECT vec_id, embedding,
       |  sqrt(list_reduce(list_transform(embedding,
       |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
       |  FROM embeddings),
       |xp AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
       |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cos
       |  FROM el p JOIN el c ON p.vec_id < $nProbes AND p.vec_id <> c.vec_id),
       |xr AS (SELECT *, row_number() OVER (PARTITION BY probe_id
       |  ORDER BY cos DESC, neighbor_id) AS rank FROM xp),
       |exact AS (SELECT probe_id, neighbor_id FROM xr WHERE rank <= $kExact),
       |approx AS (SELECT probe_id, neighbor_id FROM (
       |$tierSql
       |) tier),
       |j AS (SELECT x.probe_id,
       |  CASE WHEN a.neighbor_id IS NULL THEN 0 ELSE 1 END AS hit
       |  FROM exact x LEFT JOIN approx a
       |    ON x.probe_id = a.probe_id AND x.neighbor_id = a.neighbor_id)
       |SELECT probe_id, count(*) AS n_exact, CAST(sum(hit) AS BIGINT) AS n_hits,
       |  CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
       |FROM j GROUP BY probe_id""".stripMargin

  /** One unrolled power-iteration step (q217), mirroring
    * Similarity.principalComponent: per-vector dot against v$prev
    * (0.0-seeded sequential fold — list_prepend replays Spark's
    * aggregate seed), per-dimension w_d via the quantize-then-exact-sum
    * scheme (floor(t·1e9 + 0.5) per term, summed as DECIMAL(38,0)
    * nano-units, one divide back — the DECIMAL(38,18)-cast-of-double
    * path measured 1-ulp cross-engine drift, see SCALING.md), the norm
    * folded over the d-ordered squares, and the normalized v$i list.
    * Emits CTEs dots$i/w$i/f$i/v$i.
    */
  private def powerIterSql(i: Int): String =
    s"""dots$i AS (SELECT e.vec_id, e.embedding,
       |  list_reduce(list_prepend(0.0e0,
       |    [CAST(e.embedding[j] AS DOUBLE) * vv.v[j] FOR j IN range(1, 65)]),
       |    (a, b) -> a + b) AS dt
       |  FROM embeddings e CROSS JOIN v${i - 1} vv),
       |w$i AS (SELECT d,
       |  CAST(sum(CAST(floor(CAST(embedding[d] AS DOUBLE) * dt * 1.0e9 + 0.5)
       |    AS DECIMAL(38,0))) AS DOUBLE) / 1.0e9 AS wd
       |  FROM dots$i, (SELECT unnest(range(1, 65)) AS d) dd GROUP BY d),
       |f$i AS (SELECT ws,
       |  sqrt(list_reduce(list_prepend(0.0e0, list_transform(ws, x -> x * x)),
       |    (a, b) -> a + b)) AS nrm
       |  FROM (SELECT list(wd ORDER BY d) AS ws FROM w$i) z),
       |v$i AS (SELECT list_transform(ws, x -> x / nrm) AS v FROM f$i)""".stripMargin

  /** Power-iteration oracle body (q217), shared verbatim with the
    * q220 anisotropy audit that projects onto the same direction.
    */
  private def principalComponentSql: String =
    s"""WITH v0 AS (SELECT list_transform(range(1, 65), i -> 0.125e0) AS v),
       |${powerIterSql(1)},
       |${powerIterSql(2)},
       |${powerIterSql(3)}
       |SELECT CAST(d AS INTEGER) AS d, ws[d] / nrm AS loading, nrm AS eigval
       |FROM f3, (SELECT unnest(range(1, 65)) AS d) dd""".stripMargin

  /** One unrolled MMR greedy iteration (q140), mirroring
    * Similarity.mmrSelect: anti-join the running selection u${i-1}
    * out of the candidate set, penalty = max pair-cos to any selected
    * doc, blend with the EXPLICIT double literal
    * 0.30000000000000004e0 — Catalyst folds (1.0 − 0.7) in binary
    * doubles to that value, but DuckDB parses bare decimal literals
    * as DECIMAL and folds (1.0 − 0.7) EXACTLY to 0.3, a DIFFERENT
    * double (measured: 1 ulp off on 9/50 rows); the e0 suffix forces
    * DuckDB's parser into DOUBLE and replays Java's fold.  Pick via
    * the q54 argmax contract.  Emits CTEs r$i/p$i/m$i/s$i/u$i.
    */
  private def mmrIterSql(i: Int): String = {
    val prev = s"u${i - 1}"
    s"""r$i AS (SELECT q.* FROM qs q WHERE NOT EXISTS (
       |  SELECT 1 FROM $prev s WHERE s.probe_id = q.probe_id AND s.doc_id = q.doc_id)),
       |p$i AS (SELECT pp.probe_id, pp.doc_a AS doc_id, max(pp.cos) AS pen
       |  FROM pp JOIN $prev s ON s.probe_id = pp.probe_id AND s.doc_id = pp.doc_b
       |  GROUP BY pp.probe_id, pp.doc_a),
       |m$i AS (SELECT r.probe_id, r.doc_id, r.rel,
       |    0.7 * r.rel - 0.30000000000000004e0 * p.pen AS mmr
       |  FROM r$i r JOIN p$i p ON p.probe_id = r.probe_id AND p.doc_id = r.doc_id),
       |s$i AS (SELECT probe_id, doc_id, rel, mmr AS mmr_score, $i AS sel_rank
       |  FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
       |    ORDER BY mmr DESC, doc_id) AS rk FROM m$i) z WHERE rk = 1),
       |u$i AS (SELECT * FROM $prev UNION ALL SELECT * FROM s$i)""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — one entry per query, no rows-only rows
    * left.  The two sketch queries (q33 HLL, q58 GK) are audit-form:
    * engine-specific sketch internals never reach the output; instead
    * Spark verifies the sketch's error contract against its own exact
    * recount and emits exact values + 0/1 flags that DuckDB's exact
    * SQL (with literal 1s) hash-matches.  (q34's stub decode became
    * oracle-able in round 11: the payload fixture is ASCII text, so
    * the byte math is pure SQL.)
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_join_broadcast" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "q03_join_multi" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q04_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '1998-01-01')""".stripMargin,
    "q06_semi_join" ->
      """SELECT p_partkey, p_name, p_brand FROM part p
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)""".stripMargin,
    "q07_set_except" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal < 0
        |EXCEPT
        |SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal < 0""".stripMargin,
    "q08_orders_by_month" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS order_month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_revenue
        |FROM orders GROUP BY 1""".stripMargin,
    "q09_event_type_stats" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type""".stripMargin,
    "q10_window_latest" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1""".stripMargin,
    "q11_window_gaps" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
        |  FROM events)
        |SELECT user_id, count(*) AS n_gaps,
        |  CAST(sum(gap_ms) AS DOUBLE) / count(*) AS avg_gap_ms,
        |  CAST(max(gap_ms) AS BIGINT) AS max_gap_ms
        |FROM g WHERE gap_ms IS NOT NULL GROUP BY user_id""".stripMargin,
    "q12_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
        |  FROM events),
        |f AS (SELECT *, CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
        |  THEN 1 ELSE 0 END AS new_session FROM e),
        |s AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_idx FROM f)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM s GROUP BY user_id, session_idx""".stripMargin,
    "q13_json_props" ->
      """SELECT event_type, count(k) AS n_with_k,
        |  CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |  CAST(NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1), '') AS INTEGER) AS k
        |  FROM events) t
        |GROUP BY event_type""".stripMargin,
    "q14_hourly_buckets" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour_bucket, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS bucket_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q15_flatten_props" ->
      """SELECT event_id, 'k_i' AS "key",
        |  NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1), '') AS "value"
        |FROM events
        |WHERE NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1), '') IS NOT NULL""".stripMargin,
    "q40_running_total" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
        |FROM events""".stripMargin,
    "q16_reindex_scan" ->
      """SELECT CAST(doc_id AS VARCHAR) AS id, CAST(doc_id AS VARCHAR) AS txn_id,
        |  source AS owner, text AS content
        |FROM documents WHERE CAST(doc_id AS VARCHAR) >= '25'""".stripMargin,
    "q17_reindex_chunks" ->
      """WITH s AS (SELECT CAST(doc_id AS VARCHAR) AS id, source AS owner FROM documents)
        |SELECT id, owner,
        |  CAST((row_number() OVER (ORDER BY id) - 1) // 20 AS BIGINT) AS chunk
        |FROM s""".stripMargin,
    "q18_enrich_broadcast" ->
      """SELECT doc_id, source, source_docs, source_max_chars FROM documents
        |JOIN (SELECT source, count(*) AS source_docs, max(n_chars) AS source_max_chars
        |      FROM documents GROUP BY source) s USING (source)""".stripMargin,
    "q19_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q20_dedup_fingerprint" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
        |  min(doc_id) AS keeper_id, count(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin,
    "q21_dedup_minhash" ->
      s"""WITH $minhashPairsCte
         |SELECT doc_a, doc_b FROM mh_pairs""".stripMargin,
    "q22_ngram_jaccard" ->
      s"""WITH $shingleCte,
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
         |FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
         |WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.8""".stripMargin,
    "q45_jaccard_capped" ->
      s"""WITH $shingleCte,
         |rare AS (SELECT shingle FROM (SELECT shingle, count(*) AS df FROM sh GROUP BY 1) t WHERE df <= 8),
         |shc AS (SELECT doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
         |sz AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
         |FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
         |WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.5""".stripMargin,
    "q23_simhash" ->
      """WITH wrd AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |bits AS (
        |  SELECT doc_id, b,
        |    CASE WHEN 2 * sum(((strpos('0123456789abcdef', substr(md5(word), CAST(b // 4 AS INTEGER) + 1, 1)) - 1)
        |      // (CASE WHEN b % 4 = 0 THEN 8 WHEN b % 4 = 1 THEN 4 WHEN b % 4 = 2 THEN 2 ELSE 1 END)) % 2)
        |      >= count(*) THEN 1 ELSE 0 END AS maj
        |  FROM wrd CROSS JOIN (SELECT unnest(range(0, 16)) AS b) bb
        |  GROUP BY doc_id, b)
        |SELECT doc_id, CAST(sum(maj * CAST(power(2, b) AS BIGINT)) AS BIGINT) AS simhash
        |FROM bits GROUP BY doc_id""".stripMargin,
    "q44_winnowing" ->
      """WITH h AS (SELECT doc_id,
        |  [list_reduce(list_transform(range(i, i+8), j -> CAST(ascii(substr(text, j, 1)) AS BIGINT)),
        |               (a, b) -> (a * 31 + b) % 4294967296) FOR i IN range(1, length(text) - 6)] AS hs
        |  FROM documents WHERE length(text) >= 8),
        |fp AS (SELECT DISTINCT doc_id,
        |         unnest([list_aggregate(hs[j:j+3], 'min') FOR j IN range(1, len(hs) - 2)]) AS fp
        |       FROM h WHERE len(hs) >= 4),
        |rare AS (SELECT fp FROM (SELECT fp, count(*) AS df FROM fp GROUP BY 1) t WHERE df <= 5),
        |fpr AS (SELECT doc_id, fp.fp FROM fp JOIN rare USING (fp)),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        |          FROM fpr a JOIN fpr b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, shared FROM pairs WHERE shared >= 10""".stripMargin,
    "q24_topk_cosine" ->
      s"""WITH $normCte,
         |pairs AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cos
         |  FROM e p JOIN e c ON p.vec_id < 3 AND p.vec_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |  ORDER BY cos DESC, neighbor_id) AS rank FROM pairs)
         |SELECT probe_id, neighbor_id, cos AS cos_sim, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 5""".stripMargin,
    "q25_embed_neardup" -> thresholdPairsSql,
    "q26_ann_bucketed" ->
      s"""WITH $normCte,
         |eb AS (SELECT *,
         |  (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
         | + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
         | + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
         | + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END
         | + CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END
         | + CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END) AS bucket FROM e),
         |pairs AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cos
         |  FROM eb p JOIN eb c ON p.bucket = c.bucket AND p.vec_id < 10 AND p.vec_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |  ORDER BY cos DESC, neighbor_id) AS rank FROM pairs)
         |SELECT probe_id, neighbor_id, cos AS cos_sim, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 3""".stripMargin,
    "q37_topk_aggregator" ->
      s"""WITH $normCte,
         |pairs AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cos
         |  FROM e p JOIN e c ON p.vec_id < 5 AND p.vec_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |  ORDER BY cos DESC, neighbor_id) AS rank FROM pairs)
         |SELECT probe_id, neighbor_id, cos AS cos_sim, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 4""".stripMargin,
    "q27_label_stats" ->
      """WITH el AS (SELECT label,
        |  sqrt(list_reduce(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
        |  FROM embeddings)
        |SELECT label, count(*) AS n_vecs, min(nrm) AS min_norm, max(nrm) AS max_norm
        |FROM el GROUP BY label""".stripMargin,
    "q28_corpus_stats" ->
      """WITH d AS (SELECT lang,
        |  len(string_split(text, ' ')) AS n_tok,
        |  len(list_distinct(string_split(text, ' '))) AS n_dist,
        |  length(text) AS n_char FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_dist) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE) AS distinct_ratio,
        |  CAST(sum(n_char) - sum(n_tok) + count(*) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE) AS avg_word_len
        |FROM d GROUP BY lang""".stripMargin,
    "q29_token_freq" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "q30_langid" ->
      """SELECT lang, CASE
        |  WHEN strpos(' ' || text || ' ', ' the ') > 0 OR strpos(' ' || text || ' ', ' a ') > 0 THEN 'en'
        |  WHEN strpos(' ' || text || ' ', ' el ') > 0 OR strpos(' ' || text || ' ', ' una ') > 0 THEN 'es'
        |  WHEN strpos(' ' || text || ' ', ' le ') > 0 OR strpos(' ' || text || ' ', ' une ') > 0 THEN 'fr'
        |  WHEN strpos(' ' || text || ' ', ' der ') > 0 OR strpos(' ' || text || ' ', ' und ') > 0 THEN 'de'
        |  ELSE 'und' END AS lang_pred, count(*) AS n_docs
        |FROM documents GROUP BY 1, 2""".stripMargin,
    "q31_quality" ->
      s"""WITH d AS (SELECT source,
        |  $qualitySql AS q,
        |  len(regexp_extract_all(text, '[a-z0-9]{1,4}')) AS n_sub
        |FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN q >= 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_quality,
        |  CAST(sum(n_sub) AS BIGINT) AS total_subwords
        |FROM d GROUP BY source""".stripMargin,
    "q35_rollup" ->
      """SELECT CASE WHEN GROUPING(order_year) = 1 THEN 'ALL'
        |       ELSE coalesce(order_year, 'NULL') END AS order_year,
        |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
        |       ELSE coalesce(o_orderpriority, 'NULL') END AS priority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM (SELECT strftime(o_orderdate, '%Y') AS order_year, o_orderpriority, o_totalprice
        |      FROM orders) t
        |GROUP BY ROLLUP(order_year, o_orderpriority)""".stripMargin,
    "q41_cube" ->
      """SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL'
        |       ELSE coalesce(l_returnflag, 'NULL') END AS returnflag,
        |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL'
        |       ELSE coalesce(l_linestatus, 'NULL') END AS linestatus,
        |  count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "q42_union_all" ->
      """SELECT c_name AS party_name, c_acctbal AS acctbal, 'customer' AS kind FROM customer
        |UNION ALL
        |SELECT s_name AS party_name, s_acctbal AS acctbal, 'supplier' AS kind FROM supplier""".stripMargin,
    "q43_sql_frontend" -> graft.operators.Relational.PriorityCheckSql,
    "q38_set_intersect" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal < 0
        |INTERSECT
        |SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal < 0""".stripMargin,
    "q39_pivot" ->
      """SELECT CAST(user_id % 10 AS BIGINT) AS cohort,
        |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |  count(*) FILTER (WHERE event_type = 'error') AS n_error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS n_view
        |FROM events GROUP BY 1""".stripMargin,
    "q36_scalar_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_uc,
        |  substr(p_name, 1, 8) AS name_prefix,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  regexp_replace(p_type, '[aeiou]', '_', 'g') AS type_masked,
        |  p_size % 5 AS size_mod,
        |  abs(p_size - 25) AS size_dist,
        |  CASE WHEN p_retailprice > 1500.0 THEN 'premium'
        |       WHEN p_retailprice > 1000.0 THEN 'standard'
        |       ELSE 'budget' END AS price_tier,
        |  p_brand || '#' || p_type AS brand_type
        |FROM part""".stripMargin,
    "q32_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
        |  md5(text) AS content_md5,
        |  CASE WHEN regexp_matches(substr(text, 1, 1), '[a-m]') THEN 'typeA' ELSE 'typeB' END AS sniffed_format
        |FROM documents""".stripMargin,
    // q33: HLL sketch internals are engine-specific, so the query is
    // audit-form — Spark computes approx AND exact and emits a 0/1
    // within-5σ flag; the oracle is the exact count plus a literal 1
    "q33_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  CAST(1 AS BIGINT) AS within_rsd
        |FROM events GROUP BY event_type""".stripMargin,
    "q46_asof_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS tag FROM events),
        |w AS (SELECT *,
        |  last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ms, tag, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr_event_id,
        |  last_value(CASE WHEN tag = 0 THEN ms END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ms, tag, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr_ms
        |  FROM e)
        |SELECT event_id, user_id, attr_event_id, ms - attr_ms AS gap_ms
        |FROM w WHERE tag = 1 AND attr_event_id IS NOT NULL""".stripMargin,
    "q47_range_join" ->
      """SELECT e.event_id, e.user_id, count(a.event_id) AS n_prev_24h
        |FROM (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events
        |      WHERE event_type = 'error') e
        |LEFT JOIN (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events) a
        |  ON a.user_id = e.user_id AND a.ms >= e.ms - 86400000 AND a.ms < e.ms
        |GROUP BY 1, 2""".stripMargin,
    "q48_salted_join" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "q49_corpus_diff" -> CorpusDiffSql,
    // identical result to q49 by bloom no-false-negatives — the oracle
    // IS q49's exact formulation (the bloom is a pure prefilter)
    "q81_bloom_diff" -> CorpusDiffSql,
    // TF-IDF mirror of TextAnalysis.tfidfTerms: tf/df are exact integer
    // counts; the score replays Spark's IEEE sequence (divide, ln,
    // multiply — GraftLn is libm `ln`, bit-identical to DuckDB's);
    // ties on equal tfidf break by token ASC in both engines.
    "q82_tfidf_terms" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |  CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS tfidf
        |  FROM tf JOIN df USING (token) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY tfidf DESC, token ASC) AS rank FROM s)
        |SELECT doc_id, CAST(rank AS INTEGER) AS rank, token, tf, df, tfidf
        |FROM r WHERE rank <= 3""".stripMargin,
    // Bigram-LM mirror of TextAnalysis.bigramFluency: q63's md5-bucket
    // split, q68's multiplicity-keeping bigram comprehension, add-one
    // smoothing ln((cb+1)/(cu+V)), and the document-order fold —
    // list(logp ORDER BY pos) + list_reduce replays Spark's
    // sort_array(collect_list(struct(pos, logp))) left fold exactly
    // (the fold's 0.0 seed is absorbed: 0.0 + x == x for every
    // finite nonzero logp, and logp < 0 always since cb+1 <= cu+V).
    "q83_bigram_lm" ->
      """WITH b AS (SELECT doc_id, text,
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100 AS bucket
        | FROM documents),
        |w AS (SELECT doc_id, bucket, string_split(text, ' ') AS w FROM b),
        |cb AS (SELECT bigram, count(*) AS cb FROM (
        |  SELECT unnest([array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]) AS bigram
        |  FROM w WHERE bucket < 80 AND len(w) >= 2) GROUP BY bigram),
        |cu AS (SELECT w1, count(*) AS cu FROM (
        |  SELECT unnest(w) AS w1 FROM w WHERE bucket < 80) GROUP BY w1),
        |v AS (SELECT count(*) AS v FROM cu),
        |t AS (SELECT doc_id,
        |  unnest(range(0, len(w) - 1)) AS pos,
        |  unnest([array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]) AS bigram
        |  FROM w WHERE bucket >= 90 AND len(w) >= 2),
        |s AS (SELECT t.doc_id, t.pos,
        |  ln(CAST(coalesce(cb.cb, 0) + 1 AS DOUBLE) / CAST(coalesce(cu.cu, 0) + v.v AS DOUBLE)) AS logp
        |  FROM t LEFT JOIN cb USING (bigram)
        |       LEFT JOIN cu ON cu.w1 = string_split(t.bigram, ' ')[1]
        |       CROSS JOIN v),
        |g AS (SELECT doc_id, count(*) AS n_bigrams,
        |  list_reduce(list(logp ORDER BY pos), (a, x) -> a + x) AS total_logp
        |  FROM s GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, total_logp,
        |  total_logp / CAST(n_bigrams AS DOUBLE) AS avg_logp
        |FROM g""".stripMargin,
    // Unigram-surprisal mirror of TextAnalysis.tokenSurprisal: exact
    // integer counts, one divide + libm ln per token, document-order
    // fold (list ORDER BY pos == Spark's sorted-struct fold), and the
    // final negate-after-divide in the same sequence.
    "q84_surprisal" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |tok AS (SELECT doc_id, unnest(range(0, len(w))) AS pos, unnest(w) AS token FROM w),
        |c AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
        |t AS (SELECT sum(c) AS t FROM c),
        |s AS (SELECT tok.doc_id, tok.pos,
        |  ln(CAST(c.c AS DOUBLE) / CAST(t.t AS DOUBLE)) AS logp
        |  FROM tok JOIN c USING (token) CROSS JOIN t),
        |g AS (SELECT doc_id, count(*) AS n_tokens,
        |  list_reduce(list(logp ORDER BY pos), (a, x) -> a + x) AS total_logp
        |  FROM s GROUP BY doc_id)
        |SELECT doc_id, n_tokens, total_logp,
        |  -(total_logp / CAST(n_tokens AS DOUBLE)) AS surprisal_nats
        |FROM g""".stripMargin,
    // Zipf-fit mirror of TextAnalysis.zipfSlope: ranks replay the
    // heap's total order (freq DESC, token ASC), each regression sum
    // is its own 0.0-seeded left fold in rank order
    // (list_prepend(0.0, ...) == Spark aggregate's lit(0.0) seed),
    // and the slope/intercept arithmetic is the same fixed sequence.
    "q85_zipf" ->
      """WITH tf AS (SELECT source, token, count(*) AS freq FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
        |  GROUP BY source, token),
        |r AS (SELECT source, freq,
        |  row_number() OVER (PARTITION BY source ORDER BY freq DESC, token ASC) AS rank
        |  FROM tf),
        |top AS (SELECT source, rank,
        |  ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
        |  FROM r WHERE rank <= 30),
        |g AS (SELECT source, count(*) AS n,
        |  list_reduce(list_prepend(0.0, list(x ORDER BY rank)), (a, b) -> a + b) AS sx,
        |  list_reduce(list_prepend(0.0, list(y ORDER BY rank)), (a, b) -> a + b) AS sy,
        |  list_reduce(list_prepend(0.0, list(x * y ORDER BY rank)), (a, b) -> a + b) AS sxy,
        |  list_reduce(list_prepend(0.0, list(x * x ORDER BY rank)), (a, b) -> a + b) AS sxx
        |  FROM top GROUP BY source),
        |g2 AS (SELECT source, n, sx, sy,
        |  (CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx) AS zipf_slope
        |  FROM g)
        |SELECT source, n AS n_terms, zipf_slope,
        |  (sy - zipf_slope * sx) / CAST(n AS DOUBLE) AS intercept
        |FROM g2""".stripMargin,
    // CDC-merge mirror of Reindex.cdcMerge: same deterministic
    // snapshot/change derivation, FULL JOIN + the same
    // kept/updated/inserted classification, deletes dropped last.
    "q86_cdc_merge" ->
      """WITH snap AS (SELECT doc_id, text, source FROM documents WHERE doc_id < 450),
        |ch AS (SELECT doc_id,
        |  CASE WHEN doc_id % 10 < 2 THEN 'delete' ELSE 'upsert' END AS op,
        |  text || ' v2' AS new_text
        |  FROM documents WHERE doc_id >= 400),
        |j AS (SELECT coalesce(s.doc_id, c.doc_id) AS doc_id,
        |  s.text AS old_text, c.op, c.new_text
        |  FROM snap s FULL JOIN ch c ON s.doc_id = c.doc_id)
        |SELECT doc_id, coalesce(new_text, old_text) AS text,
        |  CASE WHEN op IS NULL THEN 'kept'
        |       WHEN old_text IS NULL THEN 'inserted'
        |       ELSE 'updated' END AS action
        |FROM j WHERE op IS NULL OR op <> 'delete'""".stripMargin,
    // Recall-audit mirror of Similarity.annRecall: q24's exact top-k
    // and q26's bucketed top-k as CTEs over the SAME probe set (10
    // probes, k=3, 6-bit sign LSH), then one left join + count ratio
    // of exact integers.
    "q87_ann_recall" ->
      s"""WITH $normCte,
         |eb AS (SELECT *,
         |  (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
         | + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
         | + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
         | + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END
         | + CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END
         | + CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END) AS bucket FROM e),
         |xp AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cos
         |  FROM e p JOIN e c ON p.vec_id < 10 AND p.vec_id <> c.vec_id),
         |xr AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |  ORDER BY cos DESC, neighbor_id) AS rank FROM xp),
         |exact AS (SELECT probe_id, neighbor_id FROM xr WHERE rank <= 3),
         |ap AS (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cos
         |  FROM eb p JOIN eb c ON p.bucket = c.bucket AND p.vec_id < 10 AND p.vec_id <> c.vec_id),
         |ar AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |  ORDER BY cos DESC, neighbor_id) AS rank FROM ap),
         |approx AS (SELECT probe_id, neighbor_id FROM ar WHERE rank <= 3),
         |j AS (SELECT x.probe_id,
         |  CASE WHEN a.neighbor_id IS NULL THEN 0 ELSE 1 END AS hit
         |  FROM exact x LEFT JOIN approx a
         |    ON x.probe_id = a.probe_id AND x.neighbor_id = a.neighbor_id)
         |SELECT probe_id, count(*) AS n_exact, CAST(sum(hit) AS BIGINT) AS n_hits,
         |  CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
         |FROM j GROUP BY probe_id""".stripMargin,
    // BM25 mirror of TextAnalysis.bm25Search: q82's tf/df/tfidf CTEs
    // pick each probe's top-3 query terms; the Okapi score replays
    // Spark's IEEE sequence exactly — idf = ln((N-df+0.5)/(df+0.5))
    // (GraftLn is libm ln, bit-identical to DuckDB's), the length
    // norm's constants fold identically ((1.0-0.75) → 0.25, (1.2+1.0)
    // → 2.2 — the same two IEEE ops both engines), avgdl is ONE
    // divide of exact integers, and the per-(probe,doc) sum folds in
    // token order with a 0.0 seed (list_prepend == Spark's lit(0.0)
    // aggregate seed).  Ranking ties break on doc_id.
    "q88_bm25" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
        |st AS (SELECT count(*) AS n_docs,
        |  CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
        |ts AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |  CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS tfidf
        |  FROM tf JOIN df USING (token) CROSS JOIN n),
        |qr AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY tfidf DESC, token ASC) AS rank FROM ts),
        |probes AS (SELECT doc_id AS probe_id, token FROM qr
        |  WHERE rank <= 3 AND doc_id < 10),
        |terms AS (SELECT p.probe_id, tf.doc_id, tf.token,
        |  ln((CAST(st.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
        |     / (CAST(df.df AS DOUBLE) + 0.5))
        |  * ((CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
        |     / (CAST(tf.tf AS DOUBLE)
        |        + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl.dl AS DOUBLE) / st.avgdl)))) AS s
        |  FROM probes p JOIN tf ON p.token = tf.token
        |  JOIN df ON df.token = tf.token
        |  JOIN dl ON dl.doc_id = tf.doc_id
        |  CROSS JOIN st),
        |g AS (SELECT probe_id, doc_id, count(*) AS n_hits,
        |  list_reduce(list_prepend(0.0, list(s ORDER BY token)), (a, x) -> a + x) AS score
        |  FROM terms GROUP BY probe_id, doc_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
        |       ORDER BY score DESC, doc_id ASC) AS rank FROM g)
        |SELECT probe_id, CAST(rank AS INTEGER) AS rank, doc_id, n_hits, score
        |FROM r WHERE rank <= 5""".stripMargin,
    // KL-drift mirror of TextAnalysis.sourceDrift: corpus counts and
    // per-source totals RE-aggregate the (source, token) frame exactly
    // as Spark does (sum of cs, not a second scan); p, q, p/q are each
    // one divide; the per-source fold is token-ordered with the 0.0
    // seed.  n_tokens surfaces as BIGINT (DuckDB sum() is HUGEINT).
    "q89_source_drift" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |cs AS (SELECT source, token, count(*) AS cs FROM tok GROUP BY source, token),
        |c AS (SELECT token, CAST(sum(cs) AS BIGINT) AS c FROM cs GROUP BY token),
        |tsrc AS (SELECT source, CAST(sum(cs) AS BIGINT) AS t_src FROM cs GROUP BY source),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t_all FROM c),
        |s AS (SELECT cs.source, cs.token,
        |  CAST(cs.cs AS DOUBLE) / CAST(t_src AS DOUBLE) AS p,
        |  CAST(c.c AS DOUBLE) / CAST(t_all AS DOUBLE) AS q
        |  FROM cs JOIN c USING (token) JOIN tsrc USING (source) CROSS JOIN tot),
        |s2 AS (SELECT source, token, p * ln(p / q) AS contrib FROM s),
        |g AS (SELECT source, count(*) AS n_terms,
        |  list_reduce(list_prepend(0.0, list(contrib ORDER BY token)), (a, x) -> a + x) AS kl_nats
        |  FROM s2 GROUP BY source)
        |SELECT g.source, g.n_terms, tsrc.t_src AS n_tokens, g.kl_nats
        |FROM g JOIN tsrc ON g.source = tsrc.source""".stripMargin,
    // Funnel mirror of EventOps.funnel: the same min-after-previous
    // cascade in integer epoch-millis; strict > at each stage; the
    // only double is the final ratio.
    "q90_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |u1 AS (SELECT user_id, min(ms) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |u2 AS (SELECT e.user_id, min(e.ms) AS t2 FROM e JOIN u1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ms > u1.t1 GROUP BY e.user_id),
        |u3 AS (SELECT e.user_id, min(e.ms) AS t3 FROM e JOIN u2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ms > u2.t2 GROUP BY e.user_id),
        |c AS (SELECT 1 AS stage_idx, 'view' AS stage, count(*) AS n_users FROM u1
        |  UNION ALL SELECT 2, 'click', count(*) FROM u2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM u3),
        |f AS (SELECT count(*) AS n_first FROM u1)
        |SELECT stage_idx, stage, n_users,
        |  CAST(n_users AS DOUBLE) / CAST(n_first AS DOUBLE) AS pct_of_first
        |FROM c CROSS JOIN f""".stripMargin,
    // Retention mirror of EventOps.retentionCohorts: weeks are integer
    // epoch-ms // 604800000 (DuckDB's // == Spark's div on positive
    // BIGINTs); distinct (user, week), min-week cohorts, equi-join,
    // one final divide.
    "q91_retention" ->
      """WITH w AS (SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS week
        |  FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id),
        |s AS (SELECT cohort_week, count(*) AS cohort_size FROM f GROUP BY cohort_week),
        |a AS (SELECT f.cohort_week, w.week - f.cohort_week AS week_offset,
        |  count(*) AS n_active
        |  FROM w JOIN f ON w.user_id = f.user_id GROUP BY 1, 2)
        |SELECT a.cohort_week, a.week_offset, a.n_active, s.cohort_size,
        |  CAST(a.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) AS retention
        |FROM a JOIN s ON a.cohort_week = s.cohort_week""".stripMargin,
    // PQ-ANN mirror of Similarity.pqAnn: four independent subspace
    // codebooks (q54's Lloyd contract at 16 dims each), integer code
    // assignment (argmax dot, ties → lowest cid == assignCells'
    // max-struct rule), and ADC scoring — probe's EXACT subvector ·
    // assigned centroid, four sequential-fold dots added left to
    // right, the same IEEE sequence Spark's reduce(_ + _) emits.
    "q92_pq_ann" -> pqAnnSql,
    // MAD mirror of TextAnalysis.madOutliers: both medians are the
    // lower-median rn == ceil(0.5·n) row of a (value, doc_id) ranking
    // (q51's exact-percentile rule); the gate compares exact integers
    // through two exact int→double conversions; one final ratio.
    "q93_mad_outliers" ->
      """WITH d AS (SELECT source, doc_id, n_chars FROM documents),
        |r1 AS (SELECT source, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY source) AS n FROM d),
        |med AS (SELECT source, n_chars AS med_chars FROM r1
        |  WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)),
        |dv AS (SELECT d.source, d.doc_id, d.n_chars, med.med_chars,
        |  abs(d.n_chars - med.med_chars) AS dev FROM d JOIN med USING (source)),
        |r2 AS (SELECT source, doc_id, dev,
        |  row_number() OVER (PARTITION BY source ORDER BY dev, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY source) AS n FROM dv),
        |mad AS (SELECT source, dev AS mad_chars FROM r2
        |  WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)),
        |g AS (SELECT dv.source, count(*) AS n_docs,
        |  max(dv.med_chars) AS med_chars, max(mad.mad_chars) AS mad_chars,
        |  CAST(sum(CASE WHEN CAST(dv.dev AS DOUBLE) > 3.0 * CAST(mad.mad_chars AS DOUBLE)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |  FROM dv JOIN mad USING (source) GROUP BY dv.source)
        |SELECT source, n_docs, med_chars, mad_chars, n_outliers,
        |  CAST(n_outliers AS DOUBLE) / CAST(n_docs AS DOUBLE) AS outlier_pct
        |FROM g""".stripMargin,
    // Session-path mirror of EventOps.sessionPaths: q67's strict
    // >30-min-gap session rule computed on epoch MICROseconds (the
    // precision Tables.events normalizes to, so both engines order by
    // the identical integer key), per-session event-type lists in
    // (us, event_id) order, trigram comprehension, top-20 by
    // (count DESC, path ASC) — a total order, so LIMIT is exact.
    "q94_session_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        |l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us FROM e),
        |f AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |  THEN 1 ELSE 0 END AS new_session FROM l),
        |s AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id
        |  ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM f),
        |seq AS (SELECT user_id, sid, list(event_type ORDER BY us, event_id) AS evs
        |  FROM s GROUP BY user_id, sid),
        |p AS (SELECT unnest([array_to_string(evs[i:i+2], '->')
        |    FOR i IN range(1, len(evs) - 1)]) AS path
        |  FROM seq WHERE len(evs) >= 3)
        |SELECT path, count(*) AS n_paths FROM p GROUP BY path
        |ORDER BY n_paths DESC, path ASC LIMIT 20""".stripMargin,
    // IVF-PQ mirror of Similarity.ivfPqAnn: q54's coarse Lloyd at ONE
    // iteration assigns every vector a cell; q92's four subspace
    // codebooks encode it; candidates are same-cell only (equi-join),
    // scored by the identical fixed-sequence ADC sum.
    "q95_ivfpq_ann" -> ivfPqAnnSql,
    // Overlap mirror of Dedup.sourceOverlap: distinct (source,
    // trigram) frame (q69's comprehension), self-equi-join on the
    // shingle with src_a < src_b, per-source sizes, integer Jaccard
    // arithmetic up to one divide.
    "q96_source_overlap" ->
      """WITH w AS (SELECT source, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT source,
        |  unnest([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) AS shingle
        |  FROM w WHERE len(w) >= 3),
        |sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
        |inter AS (SELECT a.source AS source_x, b.source AS source_y, count(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT i.source_x, i.source_y, sa.n AS n_a, sb.n AS n_b, i.n_inter,
        |  CAST(i.n_inter AS DOUBLE) / CAST(sa.n + sb.n - i.n_inter AS DOUBLE) AS jaccard
        |FROM inter i JOIN sizes sa ON sa.source = i.source_x
        |JOIN sizes sb ON sb.source = i.source_y""".stripMargin,
    // PMI mirror of TextAnalysis.pmiCollocations: q83's
    // multiplicity-keeping bigram comprehension, exact counts, one
    // divide per probability, one multiply + one divide + libm ln per
    // score, (pmi DESC, bigram ASC) total order for the LIMIT.
    "q97_pmi" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |cb AS (SELECT bigram, count(*) AS cb FROM (
        |  SELECT unnest([array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]) AS bigram
        |  FROM w WHERE len(w) >= 2) GROUP BY bigram),
        |cu AS (SELECT w1, count(*) AS cu FROM (SELECT unnest(w) AS w1 FROM w) GROUP BY w1),
        |tot AS (SELECT (SELECT CAST(sum(cb) AS BIGINT) FROM cb) AS b_total,
        |               (SELECT CAST(sum(cu) AS BIGINT) FROM cu) AS t_total),
        |s AS (SELECT cb.bigram, cb.cb, c1.cu AS c1, c2.cu AS c2,
        |  CAST(cb.cb AS DOUBLE) / CAST(tot.b_total AS DOUBLE) AS p_ab,
        |  CAST(c1.cu AS DOUBLE) / CAST(tot.t_total AS DOUBLE) AS p_a,
        |  CAST(c2.cu AS DOUBLE) / CAST(tot.t_total AS DOUBLE) AS p_b
        |  FROM cb JOIN cu c1 ON c1.w1 = string_split(cb.bigram, ' ')[1]
        |  JOIN cu c2 ON c2.w1 = string_split(cb.bigram, ' ')[2]
        |  CROSS JOIN tot WHERE cb.cb >= 5)
        |SELECT bigram, cb, c1, c2, ln(p_ab / (p_a * p_b)) AS pmi
        |FROM s ORDER BY pmi DESC, bigram ASC LIMIT 20""".stripMargin,
    // Fixed-sample mirror of TextAnalysis.fixedSample: md5 hex digits
    // 9-12 as the integer priority (independent of q63's 1-4 and
    // q75's 5-8), (priority, doc_id) ranking, rank <= 10.
    "q98_fixed_sample" ->
      """WITH pr AS (SELECT source, doc_id, CAST(
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 9, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 10, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 11, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 12, 1)) - 1)) AS INTEGER) AS priority
        | FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |  ORDER BY priority, doc_id) AS rank FROM pr)
        |SELECT source, CAST(rank AS INTEGER) AS rank, doc_id, priority
        |FROM r WHERE rank <= 10""".stripMargin,
    // Rolling-window mirror of EventOps.rolling24h: the identical
    // RANGE frame over integer epoch-millis ([ms-86399999, ms], peers
    // included in both engines), DECIMAL(18,2) exact value sums
    // surfacing as DOUBLE.
    "q99_rolling_24h" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |  CAST(value AS DECIMAL(18,2)) AS v FROM events)
        |SELECT event_id, user_id, ms,
        |  count(*) OVER w AS n_24h,
        |  CAST(sum(v) OVER w AS DOUBLE) AS sum_24h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ms
        |  RANGE BETWEEN 86399999 PRECEDING AND CURRENT ROW)""".stripMargin,
    // TPC-H Q5 mirror of Relational.localSupplierVolume: same join
    // graph, date/region constants, and the house DECIMAL(18,4)
    // revenue sum; revenue doubles are bit-identical so the ORDER BY
    // is a shared total order (n_name tiebreak regardless).
    "q100_tpch_q5" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    // Sparse-cosine mirror of TextAnalysis.sparseCosinePairs: q82's
    // exact tf·ln(N/df) weights, token-ordered 0.0-seeded folds for
    // BOTH the norms (all tokens) and the pair dots (df-capped inverted
    // index, shared tokens only), one multiply + one divide per cosine,
    // (cos DESC, doc_a, doc_b) total order for the LIMIT.
    "q101_sparse_sim" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |w AS (SELECT tf.doc_id, tf.token, df.df,
        |  CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS w
        |  FROM tf JOIN df USING (token) CROSS JOIN n),
        |nr AS (SELECT doc_id,
        |  sqrt(list_reduce(list_prepend(0.0, list(w * w ORDER BY token)), (a, x) -> a + x)) AS nrm
        |  FROM w GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared,
        |  list_reduce(list_prepend(0.0, list(a.w * b.w ORDER BY a.token)), (a2, x) -> a2 + x) AS dot
        |  FROM w a JOIN w b ON a.token = b.token AND a.doc_id < b.doc_id
        |  WHERE a.df <= 50 AND b.df <= 50
        |  GROUP BY 1, 2),
        |c AS (SELECT p.doc_a, p.doc_b, p.n_shared,
        |  p.dot / (na.nrm * nb.nrm) AS cos
        |  FROM p JOIN nr na ON na.doc_id = p.doc_a
        |  JOIN nr nb ON nb.doc_id = p.doc_b)
        |SELECT doc_a, doc_b, n_shared, cos FROM c
        |ORDER BY cos DESC, doc_a, doc_b LIMIT 20""".stripMargin,
    // Stub-decode mirror of Multimodal.featureSummary: the payload is
    // the document's ASCII text, so every step is exact SQL — frame
    // count len//100 in [1, 4], 100-byte slices, integer byte sums,
    // ONE divide per mean, and floor(x·1e6 + 0.5)/1e6 for BOTH
    // roundings (JVM Math.round is floor(x+0.5); Spark's round() was
    // deliberately NOT used, its decimal-string HALF_UP has no DuckDB
    // twin).  The per-doc avg folds in frame order (a payload's frames
    // are consecutive rows of one partition, so Spark's partial sum is
    // frame-ordered; list(feature ORDER BY f) replays it).
    "q34_media_features" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
        |fr AS (SELECT doc_id, text, len,
        |  unnest(range(0, least(greatest(len // 100, 1), 4))) AS f FROM d),
        |sl AS (SELECT doc_id, f, substr(text, CAST(f * 100 + 1 AS INTEGER), 100) AS slice FROM fr),
        |ft AS (SELECT doc_id, f,
        |  floor((CAST(list_aggregate(list_transform(range(1, length(slice) + 1),
        |      i -> unicode(slice[i])), 'sum') AS DOUBLE)
        |    / CAST(length(slice) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS feature
        |  FROM sl),
        |g AS (SELECT doc_id, count(*) AS n_frames,
        |  list_reduce(list_prepend(0.0, list(feature ORDER BY f)), (a, b) -> a + b) AS s
        |  FROM ft GROUP BY doc_id)
        |SELECT doc_id, n_frames,
        |  floor((s / CAST(n_frames AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS mean_feature
        |FROM g""".stripMargin,
    "q50_variance" ->
      """WITH s AS (SELECT c_nationkey, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)) * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sxx
        |  FROM customer GROUP BY c_nationkey)
        |SELECT c_nationkey, n,
        |  (sxx - sx * sx / n) / (n - 1) AS var_acctbal,
        |  sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_acctbal
        |FROM s""".stripMargin,
    "q65_pctl_scale" -> // identical result to q51 via the two-pass path
      """WITH r AS (SELECT o_orderpriority, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
        |  count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority,
        |  max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN o_totalprice END) AS p50,
        |  max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN o_totalprice END) AS p90,
        |  max(n) AS n_orders
        |FROM r GROUP BY o_orderpriority""".stripMargin,
    "q51_percentile" ->
      """WITH r AS (SELECT o_orderpriority, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
        |  count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority,
        |  max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN o_totalprice END) AS p50,
        |  max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN o_totalprice END) AS p90,
        |  max(n) AS n_orders
        |FROM r GROUP BY o_orderpriority""".stripMargin,
    "q52_grouping_sets" ->
      """SELECT CASE WHEN GROUPING(order_year) = 1 THEN 'ALL'
        |       ELSE coalesce(order_year, 'NULL') END AS order_year,
        |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
        |       ELSE coalesce(o_orderpriority, 'NULL') END AS priority,
        |  count(*) AS n_orders
        |FROM (SELECT strftime(o_orderdate, '%Y') AS order_year, o_orderpriority FROM orders) t
        |GROUP BY GROUPING SETS ((order_year), (o_orderpriority), ())""".stripMargin,
    "q53_edit_distance" ->
      """SELECT p_partkey, substr(p_name, 1, 10) AS name_prefix, p_type,
        |  CAST(levenshtein(substr(p_name, 1, 10), p_type) AS INTEGER) AS edit_dist
        |FROM part""".stripMargin,
    "q54_ivf_ann" -> ivfAnnSql,
    "q55_pos_tokens" ->
      """SELECT doc_id, CAST(pos AS INTEGER) AS pos, token
        |FROM (SELECT doc_id, unnest(range(0, len(w))) AS pos, unnest(w) AS token
        |      FROM (SELECT doc_id, string_split(text, ' ') AS w
        |            FROM documents WHERE doc_id < 20) t) z""".stripMargin,
    "q56_topk_per_group" ->
      """SELECT o_orderpriority, CAST(rank AS INTEGER) AS rank, o_orderkey, o_totalprice
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_orderpriority
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |      FROM orders) t
        |WHERE rank <= 3""".stripMargin,
    "q57_rank_funcs" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drank,
        |  percent_rank() OVER w AS prank,
        |  cume_dist() OVER w AS cdist,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM orders WHERE o_totalprice > 400000.0
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,
    // q58: GK-sketch internals are engine-specific, so the query is
    // audit-form — Spark recounts the returned elements' exact rank
    // intervals and emits 0/1 contract flags; the oracle is the exact
    // count plus literal 1s (q51 stays the exact-value anchor)
    "q58_approx_quantile" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(1 AS BIGINT) AS p50_ok, CAST(1 AS BIGINT) AS p90_ok
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q59_collect_sets" ->
      """SELECT user_id,
        |  string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id""".stripMargin,
    "q60_date_facets" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |  CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_quarter,
        |  CAST(datediff('day', o_orderdate, DATE '1999-01-01') AS INTEGER) AS days_to_99
        |FROM orders WHERE o_orderkey % 20 = 0""".stripMargin,
    "q61_corr_subquery" -> graft.operators.Relational.PremiumPartsSql,
    "q66_union_distinct" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin,
    // session_window merges at MICROsecond precision and MERGES an
    // event landing exactly at prev+gap (verified against Spark 4.1.2:
    // the merge test is start2 <= end1, inclusive) → the oracle uses
    // epoch_us with a STRICT > gap new-session condition; a ms-floored
    // comparison would disagree by 1ms on straddling gaps.  end = last
    // ts + gap, floored to ms.
    "q67_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |f AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |  THEN 1 ELSE 0 END AS new_session FROM e),
        |s AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id
        |  ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM f)
        |SELECT user_id, min(us) // 1000 AS session_start_ms,
        |  (max(us) + 1800000000) // 1000 AS session_end_ms,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM s GROUP BY user_id, sid""".stripMargin,
    // the resize stub keeps every 2nd byte; text is ASCII so byte ==
    // char and DuckDB can rebuild the exact resized payload
    "q62_media_resize" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS orig_len,
        |  CAST((length(text) + 1) // 2 AS BIGINT) AS resized_len,
        |  md5(array_to_string([substr(text, i, 1) FOR i IN range(1, length(text) + 1, 2)], '')) AS resized_md5
        |FROM documents""".stripMargin,
    "q63_train_split" ->
      """WITH b AS (SELECT source, text,
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100 AS bucket
        | FROM documents)
        |SELECT source,
        |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |FROM b GROUP BY 1, 2""".stripMargin,
    "q68_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |bg AS (SELECT doc_id,
        |  unnest([array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]) AS bigram
        |  FROM w WHERE len(w) >= 2),
        |c AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
        |d AS (SELECT doc_id, sum(c) AS n_bigrams, count(*) AS n_distinct, max(c) AS top_count
        |      FROM c GROUP BY doc_id)
        |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
        |  CAST(n_bigrams - n_distinct AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS dup_bigram_frac,
        |  CAST(top_count AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS top_bigram_frac
        |FROM d""".stripMargin,
    "q69_contamination" ->
      """WITH b AS (SELECT doc_id, text,
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100 AS bucket
        | FROM documents),
        |w AS (SELECT doc_id, bucket, string_split(text, ' ') AS w FROM b),
        |sh AS (SELECT DISTINCT doc_id, bucket,
        |  unnest([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) AS shingle
        |  FROM w WHERE len(w) >= 3),
        |train AS (SELECT DISTINCT shingle FROM sh WHERE bucket < 80),
        |test AS (SELECT doc_id, shingle FROM sh WHERE bucket >= 90),
        |j AS (SELECT t.doc_id, CASE WHEN tr.shingle IS NULL THEN 0 ELSE 1 END AS hit
        |      FROM test t LEFT JOIN train tr USING (shingle))
        |SELECT doc_id, count(*) AS n_shingles,
        |  CAST(sum(hit) AS BIGINT) AS n_contaminated,
        |  CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS contamination_rate
        |FROM j GROUP BY doc_id""".stripMargin,
    "q70_mix_weights" ->
      """WITH per AS (SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT sum(n_tokens) AS total_tokens, count(*) AS n_sources FROM per)
        |SELECT source, n_docs, n_tokens,
        |  CASE WHEN n_tokens = 0 THEN NULL
        |       ELSE CAST(total_tokens AS DOUBLE) / CAST(n_sources * n_tokens AS DOUBLE)
        |  END AS weight
        |FROM per CROSS JOIN tot""".stripMargin,
    "q72_dedup_clusters" ->
      s"""WITH RECURSIVE $closureCte
         |SELECT doc_id, cluster_id FROM cc_labels""".stripMargin,
    "q71_seq_packing" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |  coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM t)
        |SELECT doc_id, n_tok, CAST(cum_before AS BIGINT) AS cum_before,
        |  CAST(cum_before // 2048 AS BIGINT) AS pack_id,
        |  CAST(cum_before % 2048 AS BIGINT) AS pack_offset
        |FROM c""".stripMargin,
    "q73_kmeans" ->
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
         |smp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 256),
         |${lloydIterSql("c0", 1)},
         |${lloydIterSql("c1", 2)},
         |a AS (SELECT vec_id, cid,
         |  row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${dotSql("embedding", "c_emb")} DESC, cid) AS rk
         |  FROM embeddings CROSS JOIN c2)
         |SELECT cid, count(*) AS n_vecs, min(vec_id) AS min_vec
         |FROM a WHERE rk = 1 GROUP BY cid""".stripMargin,
    "q74_qgate" ->
      s"""WITH d AS (SELECT source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  $qualitySql AS q
        |  FROM documents),
        |s AS (SELECT CAST(sum(n_tok) AS BIGINT) AS tot, count(*) AS n FROM d)
        |SELECT source, count(*) AS n_kept, CAST(sum(n_tok) AS BIGINT) AS kept_tokens
        |FROM d CROSS JOIN s
        |WHERE q >= 0.45 AND CAST(n_tok AS DOUBLE) > CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)
        |GROUP BY source""".stripMargin,
    "q75_sample" ->
      """WITH r AS (SELECT * FROM (VALUES ('src0', 100), ('src1', 75), ('src2', 25)) v(source, pct)),
        |d AS (SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 5, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 6, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 7, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 8, 1)) - 1)) % 100 AS b
        | FROM documents),
        |k AS (SELECT d.source, n_tok, b < coalesce(r.pct, 50) AS keep
        |      FROM d LEFT JOIN r USING (source))
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        |  CAST(sum(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT) AS sampled_tokens
        |FROM k GROUP BY source""".stripMargin,
    "q76_srcdups" ->
      s"""WITH $minhashPairsCte,
         |j AS (SELECT least(da.source, db.source) AS source_x,
         |             greatest(da.source, db.source) AS source_y
         |      FROM mh_pairs p
         |      JOIN documents da ON p.doc_a = da.doc_id
         |      JOIN documents db ON p.doc_b = db.doc_id)
         |SELECT source_x, source_y, count(*) AS n_pairs FROM j GROUP BY 1, 2""".stripMargin,
    "q77_survivor" ->
      s"""WITH RECURSIVE $closureCte,
         |qs AS (SELECT doc_id, $qualitySql AS q FROM documents),
         |j AS (SELECT l.cluster_id, l.doc_id, qs.q,
         |  row_number() OVER (PARTITION BY l.cluster_id ORDER BY qs.q DESC, l.doc_id) AS rk,
         |  count(*) OVER (PARTITION BY l.cluster_id) AS n_members
         |  FROM cc_labels l JOIN qs USING (doc_id))
         |SELECT cluster_id, doc_id AS survivor_id, q AS survivor_q,
         |  CAST(n_members AS BIGINT) AS n_members
         |FROM j WHERE rk = 1""".stripMargin,
    // 48-bit simhash over the shared 3-gram shingles (same bit-read
    // contract as q23: hex digit b/4 of md5, big-endian within the
    // digit), banded 4×12 for candidates, exact Hamming ≤ 3 filter
    "q78_simhash_pairs" ->
      s"""WITH $shingleCte,
         |bits AS (
         |  SELECT doc_id, b,
         |    CASE WHEN 2 * sum(((strpos('0123456789abcdef', substr(md5(shingle), CAST(b // 4 AS INTEGER) + 1, 1)) - 1)
         |      // (CASE WHEN b % 4 = 0 THEN 8 WHEN b % 4 = 1 THEN 4 WHEN b % 4 = 2 THEN 2 ELSE 1 END)) % 2)
         |      >= count(*) THEN 1 ELSE 0 END AS maj
         |  FROM sh CROSS JOIN (SELECT unnest(range(0, 48)) AS b) bb
         |  GROUP BY doc_id, b),
         |sg AS (SELECT doc_id, CAST(sum(maj * (CAST(1 AS BIGINT) << CAST(b AS INTEGER))) AS BIGINT) AS simhash
         |       FROM bits GROUP BY doc_id),
         |bands AS (SELECT doc_id, simhash, b, (simhash >> (12 * CAST(b AS INTEGER))) & 4095 AS slice
         |          FROM sg CROSS JOIN (SELECT unnest(range(0, 4)) AS b) t),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b, a.simhash AS sig_a, c.simhash AS sig_b
         |         FROM bands a JOIN bands c ON a.b = c.b AND a.slice = c.slice AND a.doc_id < c.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
         |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3""".stripMargin,
    "q79_dup_spans" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sp AS (SELECT DISTINCT doc_id,
        |  unnest([array_to_string(w[i:i+7], ' ') FOR i IN range(1, len(w) - 6)]) AS shingle
        |  FROM w WHERE len(w) >= 8),
        |df AS (SELECT shingle, count(*) AS df FROM sp GROUP BY shingle),
        |per AS (SELECT s.doc_id, count(*) AS n_spans,
        |        CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
        |        FROM sp s JOIN df d USING (shingle) GROUP BY s.doc_id)
        |SELECT doc_id, n_spans, n_dup_spans,
        |  CAST(n_dup_spans AS DOUBLE) / CAST(n_spans AS DOUBLE) AS dup_frac
        |FROM per WHERE n_dup_spans > 0""".stripMargin,
    // same trained-centroid chain as q54/q73; pairs only within a
    // cell, dropped = lower-id mate with cosine ≥ 0.40
    "q80_semdedup" ->
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
         |smp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 256),
         |${lloydIterSql("c0", 1)},
         |${lloydIterSql("c1", 2)},
         |a AS (SELECT vec_id, embedding, cid,
         |  row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${dotSql("embedding", "c_emb")} DESC, cid) AS rk
         |  FROM embeddings CROSS JOIN c2),
         |e AS (SELECT vec_id, embedding, cid,
         |  sqrt(list_reduce(list_transform(embedding,
         |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
         |  FROM a WHERE rk = 1),
         |pr AS (SELECT q.vec_id AS id_b
         |       FROM e p JOIN e q ON p.cid = q.cid AND p.vec_id < q.vec_id
         |       WHERE ${dotSql("p.embedding", "q.embedding")} / (p.nrm * q.nrm) >= 0.40),
         |dropped AS (SELECT DISTINCT id_b FROM pr)
         |SELECT e.cid, count(*) AS n_vecs,
         |  CAST(sum(CASE WHEN d.id_b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  CAST(count(*) - sum(CASE WHEN d.id_b IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM e LEFT JOIN dropped d ON e.vec_id = d.id_b
         |GROUP BY e.cid""".stripMargin,
    "q64_vocab_oov" ->
      """WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
        |vocab AS (SELECT token FROM (SELECT token, count(*) AS freq FROM toks GROUP BY 1
        |          ORDER BY freq DESC, token LIMIT 20)),
        |j AS (SELECT t.source, CASE WHEN v.token IS NULL THEN 0 ELSE 1 END AS in_vocab
        |      FROM toks t LEFT JOIN vocab v USING (token))
        |SELECT source, count(*) AS n_tokens,
        |  CAST(sum(in_vocab) AS BIGINT) AS n_in_vocab,
        |  CAST(count(*) - sum(in_vocab) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS oov_rate
        |FROM j GROUP BY source""".stripMargin,
    // — round-12 oracles —
    // entropy folds in token order, SUBTRACTING each p·ln p term (the
    // seed-prepend + a−b fold mirrors Spark's aggregate exactly and
    // keeps single-type docs at +0.0, never IEEE −0.0)
    "q102_token_entropy" ->
      """WITH tc AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT doc_id, token, count(*) AS c FROM tc GROUP BY doc_id, token),
        |d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok, count(*) AS n_types,
        |      list(c ORDER BY token) AS lst FROM c GROUP BY doc_id)
        |SELECT doc_id, n_tok, n_types,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(lst,
        |    c -> (CAST(c AS DOUBLE) / CAST(n_tok AS DOUBLE))
        |         * ln(CAST(c AS DOUBLE) / CAST(n_tok AS DOUBLE)))),
        |    (a, b) -> a - b) AS entropy
        |FROM d""".stripMargin,
    "q103_doc_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, w, len(w) AS n, unnest(range(0, len(w), 24)) AS start
        |      FROM t WHERE len(w) >= 1)
        |SELECT doc_id,
        |  CAST(start // 24 AS BIGINT) AS chunk_id,
        |  CAST(start AS BIGINT) AS start_tok,
        |  CAST(least(32, n - start) AS BIGINT) AS chunk_len,
        |  md5(array_to_string(w[start + 1 : start + 32], ' ')) AS chunk_md5
        |FROM s""".stripMargin,
    // the Spark side computes ntile arithmetically over a two-pass
    // global rank (no single-partition window); the declarative form
    // here is bucket-for-bucket identical by ntile's definition
    "q104_len_deciles" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS INTEGER) AS decile
        |  FROM documents)
        |SELECT decile, count(*) AS n_docs,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
        |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
        |FROM d GROUP BY decile""".stripMargin,
    "q105_hourly_anomaly" ->
      """WITH h AS (SELECT event_type,
        |  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
        |  count(*) AS c FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, count(*) AS n, CAST(sum(c) AS DOUBLE) AS sx,
        |      CAST(sum(c * c) AS DOUBLE) AS sxx FROM h GROUP BY event_type),
        |z AS (SELECT h.event_type, h.hour, h.c,
        |      (CAST(h.c AS DOUBLE) - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1)) AS z
        |      FROM h JOIN s ON h.event_type = s.event_type)
        |SELECT event_type, hour, c, z FROM z
        |ORDER BY abs(z) DESC, event_type, hour LIMIT 20""".stripMargin,
    "q106_resample" ->
      """WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0,
        |           date_trunc('hour', max(ts)) AS h1 FROM events),
        |spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |hc AS (SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS c
        |       FROM events GROUP BY 1, 2),
        |g AS (SELECT ty.event_type, spine.h, coalesce(hc.c, 0) AS n
        |      FROM spine CROSS JOIN ty
        |      LEFT JOIN hc ON hc.h = spine.h AND hc.event_type = ty.event_type)
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:00') AS hour,
        |  CAST(n AS BIGINT) AS n,
        |  CAST(sum(n) OVER (PARTITION BY event_type ORDER BY h
        |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n
        |FROM g""".stripMargin,
    // q12's exact session CTEs (ts+event_id order, strict >30 min)
    "q107_cooccurrence" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
        |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms,
        |    ts
        |  FROM events),
        |f AS (SELECT *, CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
        |  THEN 1 ELSE 0 END AS new_session FROM e),
        |s AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_idx FROM f),
        |st AS (SELECT DISTINCT user_id, session_idx, event_type FROM s),
        |tot AS (SELECT count(*) AS sn FROM (SELECT DISTINCT user_id, session_idx FROM st) q),
        |ct AS (SELECT event_type, count(*) AS c FROM st GROUP BY event_type),
        |p AS (SELECT a.event_type AS t_a, b.event_type AS t_b, count(*) AS n_ab
        |      FROM st a JOIN st b ON a.user_id = b.user_id
        |        AND a.session_idx = b.session_idx AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT p.t_a, p.t_b, p.n_ab,
        |  (CAST(p.n_ab AS DOUBLE) * CAST(tot.sn AS DOUBLE)) /
        |  (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)) AS lift
        |FROM p JOIN ct ca ON ca.event_type = p.t_a
        |  JOIN ct cb ON cb.event_type = p.t_b
        |  CROSS JOIN tot""".stripMargin,
    "q108_rolling_dau" ->
      """WITH du AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        |b AS (SELECT max(epoch_ms(ts)) // 86400000 AS d1 FROM events),
        |x AS (SELECT du.user_id, du.day + k.k AS t_day, k.k
        |      FROM du CROSS JOIN (SELECT unnest(range(0, 7)) AS k) k CROSS JOIN b
        |      WHERE du.day + k.k <= b.d1)
        |SELECT t_day AS day,
        |  CAST(DATE '1970-01-01' + CAST(t_day AS INTEGER) AS VARCHAR) AS day_date,
        |  count(DISTINCT CASE WHEN k = 0 THEN user_id END) AS dau,
        |  count(DISTINCT user_id) AS wau
        |FROM x GROUP BY t_day""".stripMargin,
    // q73's trained cells + a per-cell majority-label argmax (count
    // DESC, ties → lowest label — the house max-of-struct rule)
    "q109_cell_purity" ->
      s"""WITH c0 AS (SELECT vec_id AS cid, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
         |smp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 256),
         |${lloydIterSql("c0", 1)},
         |${lloydIterSql("c1", 2)},
         |a AS (SELECT vec_id, label, cid,
         |  row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${dotSql("embedding", "c_emb")} DESC, cid) AS rk
         |  FROM embeddings CROSS JOIN c2),
         |cl AS (SELECT cid, label, count(*) AS cl FROM a WHERE rk = 1 GROUP BY cid, label),
         |r AS (SELECT cid, label, cl,
         |      row_number() OVER (PARTITION BY cid ORDER BY cl DESC, label ASC) AS rk2,
         |      CAST(sum(cl) OVER (PARTITION BY cid) AS BIGINT) AS n_vecs
         |      FROM cl)
         |SELECT cid, n_vecs, CAST(label AS INTEGER) AS top_label, cl AS n_top,
         |  CAST(cl AS DOUBLE) / CAST(n_vecs AS DOUBLE) AS purity
         |FROM r WHERE rk2 = 1""".stripMargin,
    "q110_originality" ->
      s"""WITH $shingleCte,
         |df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
         |SELECT s.doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         |  CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS originality
         |FROM sh s JOIN df d USING (shingle) GROUP BY s.doc_id""".stripMargin,
    "q111_forward_fill" ->
      """WITH b AS (SELECT date_trunc('hour', min(ts)) AS h0,
        |           date_trunc('hour', max(ts)) AS h1 FROM events),
        |spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |hc AS (SELECT date_trunc('hour', ts) AS h, event_type,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_obs
        |       FROM events GROUP BY 1, 2),
        |g AS (SELECT ty.event_type, spine.h, hc.avg_obs
        |      FROM spine CROSS JOIN ty
        |      LEFT JOIN hc ON hc.h = spine.h AND hc.event_type = ty.event_type),
        |f AS (SELECT event_type, h, avg_obs,
        |      last_value(avg_obs IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |      FROM g)
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:00') AS hour,
        |  CAST(CASE WHEN avg_obs IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS has_data,
        |  coalesce(avg_obs, 0.0) AS hour_avg,
        |  coalesce(filled, 0.0) AS filled_avg
        |FROM f""".stripMargin,
    "q112_user_growth" ->
      """WITH f AS (SELECT user_id, min(epoch_ms(ts) // 86400000) AS day
        |           FROM events GROUP BY user_id),
        |g AS (SELECT day, count(*) AS new_users FROM f GROUP BY day)
        |SELECT day,
        |  CAST(DATE '1970-01-01' + CAST(day AS INTEGER) AS VARCHAR) AS day_date,
        |  new_users,
        |  CAST(sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        |FROM g""".stripMargin,
    // q97's bigram CTE re-read as an autocomplete table: top-20 heads
    // by continuation total, top-3 continuations per head
    "q113_next_token" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |bi AS (SELECT bigram, count(*) AS cnt FROM (
        |  SELECT unnest([array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]) AS bigram
        |  FROM w WHERE len(w) >= 2) GROUP BY bigram),
        |x AS (SELECT string_split(bigram, ' ')[1] AS head_tok,
        |             string_split(bigram, ' ')[2] AS next_tok, cnt FROM bi),
        |hd AS (SELECT head_tok, CAST(sum(cnt) AS BIGINT) AS tot FROM x GROUP BY head_tok
        |       ORDER BY tot DESC, head_tok ASC LIMIT 20),
        |r AS (SELECT x.head_tok, x.next_tok, x.cnt, hd.tot,
        |      row_number() OVER (PARTITION BY x.head_tok
        |        ORDER BY x.cnt DESC, x.next_tok ASC) AS rank
        |      FROM x JOIN hd USING (head_tok))
        |SELECT head_tok, CAST(rank AS INTEGER) AS rank, next_tok, cnt, tot,
        |  CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE) AS p_next
        |FROM r WHERE rank <= 3""".stripMargin,
    "q114_feature_scale" ->
      s"""WITH d AS (SELECT source, doc_id, $qualitySql AS q FROM documents),
         |s AS (SELECT source, min(q) AS qmin, max(q) AS qmax FROM d GROUP BY source)
         |SELECT d.source, d.doc_id, d.q,
         |  CASE WHEN s.qmax > s.qmin THEN (d.q - s.qmin) / (s.qmax - s.qmin)
         |       ELSE 0.5 END AS q_norm
         |FROM d JOIN s USING (source)""".stripMargin,
    // md5 hex digits 13-16 as the priority (the house digit registry:
    // q63 split 1-4, q75 rates 5-8, q98 fixed sample 9-12)
    "q115_class_balance" ->
      """WITH pr AS (SELECT vec_id, label, CAST(
        |  ((strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 13, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 14, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 15, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(vec_id AS VARCHAR)), 16, 1)) - 1)) AS INTEGER) AS priority
        | FROM embeddings),
        |mn AS (SELECT min(n) AS min_n FROM (SELECT label, count(*) AS n
        |       FROM embeddings GROUP BY label)),
        |r AS (SELECT label, vec_id, priority, row_number() OVER (
        |        PARTITION BY label ORDER BY priority, vec_id) AS rank FROM pr)
        |SELECT label, CAST(rank AS INTEGER) AS rank, vec_id, priority
        |FROM r CROSS JOIN mn WHERE rank <= min_n""".stripMargin,
    "q116_pareto" ->
      """WITH lvl AS (SELECT p_brand, p_retailprice, max(p_size) AS lvl_max
        |             FROM part GROUP BY 1, 2),
        |pre AS (SELECT p_brand, p_retailprice,
        |        max(lvl_max) OVER (PARTITION BY p_brand ORDER BY p_retailprice
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cheaper_max
        |        FROM lvl)
        |SELECT p.p_brand, p.p_partkey, p.p_retailprice, p.p_size
        |FROM part p JOIN pre USING (p_brand, p_retailprice)
        |WHERE cheaper_max IS NULL OR p.p_size > cheaper_max""".stripMargin,
    // q21's candidate pairs × q63's exact split buckets, oriented
    // train-side / eval-side
    "q117_split_leakage" ->
      s"""WITH $minhashPairsCte,
         |lab AS (SELECT doc_id,
         |  CASE WHEN bucket < 80 THEN 'train'
         |       WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split
         |  FROM (SELECT doc_id,
         |    ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
         |   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
         |   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
         |   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100 AS bucket
         |   FROM documents)),
         |j AS (SELECT p.doc_a, p.doc_b, la.split AS split_a, lb.split AS split_b
         |      FROM mh_pairs p JOIN lab la ON la.doc_id = p.doc_a
         |      JOIN lab lb ON lb.doc_id = p.doc_b)
         |SELECT CASE WHEN split_a = 'train' THEN doc_a ELSE doc_b END AS train_doc,
         |  CASE WHEN split_a = 'train' THEN doc_b ELSE doc_a END AS eval_doc,
         |  CASE WHEN split_a = 'train' THEN split_b ELSE split_a END AS eval_split
         |FROM j WHERE split_a <> split_b
         |  AND (split_a = 'train' OR split_b = 'train')""".stripMargin,
    // integer features (quality in millionths via the q34 floor
    // trick): every sum is a pure integer, so the only double
    // conversions are correctly-rounded int→double on both sides
    "q118_len_quality_corr" ->
      s"""WITH d AS (SELECT source,
         |  n_chars AS x,
         |  CAST(floor(($qualitySql) * 1000000.0 + 0.5) AS BIGINT) AS y
         |  FROM documents),
         |s AS (SELECT source, count(*) AS n_docs,
         |  CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         |  CAST(sum(x * y) AS DOUBLE) AS sxy,
         |  CAST(sum(x * x) AS DOUBLE) AS sxx,
         |  CAST(sum(y * y) AS DOUBLE) AS syy
         |  FROM d GROUP BY source)
         |SELECT source, n_docs,
         |  (n_docs * sxy - sx * sy) /
         |  (sqrt(n_docs * sxx - sx * sx) * sqrt(n_docs * syy - sy * sy)) AS pearson_r
         |FROM s""".stripMargin,
    // 4 unrolled power iterations over the symmetrized q21 pair
    // graph; each neighbor sum is a list_reduce in neighbor-id order
    // mirroring the Spark sorted fold, damping constants written as
    // the same literal arithmetic both sides so both engines fold
    // them to identical doubles
    "q119_pagerank" -> {
      val iterCte = (k: Int) =>
        s"""i$k AS (SELECT ed.dst AS id,
           |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |    list(r.r / ed.deg ORDER BY ed.src)), (a, b) -> a + b) AS s
           |  FROM ed JOIN r${k - 1} r ON r.id = ed.src GROUP BY ed.dst),
           |r$k AS (SELECT id,
           |  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n
           |    + CAST(0.85 AS DOUBLE) * s AS r FROM i$k, tot)""".stripMargin
      s"""WITH $minhashPairsCte,
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
         |      UNION ALL SELECT doc_b, doc_a FROM mh_pairs),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |ed AS (SELECT e.src, e.dst, d.deg FROM e JOIN deg d USING (src)),
         |tot AS (SELECT count(*) AS n FROM deg),
         |r0 AS (SELECT src AS id, CAST(1.0 AS DOUBLE) / n AS r FROM deg, tot),
         |${iterCte(1)},
         |${iterCte(2)},
         |${iterCte(3)},
         |${iterCte(4)}
         |SELECT id AS doc_id, r AS pagerank FROM r4""".stripMargin
    },
    // audit form (q33/q58 pattern): exact top-k token counts +
    // literal-1 error-contract flags; Spark computes the sketch AND
    // its own exact recount, so a broken estimate flips a flag and
    // fails the hash
    "q120_cms_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT token, count(*) AS exact_cnt FROM t GROUP BY token)
        |SELECT token, exact_cnt,
        |  CAST(1 AS BIGINT) AS never_under, CAST(1 AS BIGINT) AS within_eps
        |FROM c ORDER BY exact_cnt DESC, token LIMIT 20""".stripMargin,
    // the oracle runs the naive all-pairs comparison the blocked join
    // provably equals (symmetric-delete candidates are a superset of
    // the true dist-1 pairs; the exact filter removes the rest)
    "q121_fuzzy_join" ->
      """SELECT a.s_name AS name_a, b.s_name AS name_b
        |FROM supplier a JOIN supplier b
        |ON a.s_name < b.s_name AND levenshtein(a.s_name, b.s_name) = 1""".stripMargin,
    // exact-rank percentile cuts with PURE-INTEGER rank arithmetic
    // ((n+19)//20, (19n+19)//20) — float rank math is a cross-engine
    // trap for fractions with no exact binary form (see q104 ntile)
    "q122_winsorized" ->
      """WITH r AS (SELECT source, n_chars,
        |  row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY source) AS n FROM documents),
        |c AS (SELECT source,
        |  max(CASE WHEN rn = (n + 19) // 20 THEN n_chars END) AS p05,
        |  max(CASE WHEN rn = (19 * n + 19) // 20 THEN n_chars END) AS p95
        |  FROM r GROUP BY source)
        |SELECT d.source, count(*) AS n_docs, max(c.p05) AS p05, max(c.p95) AS p95,
        |  CAST(sum(greatest(least(d.n_chars, c.p95), c.p05)) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS win_mean,
        |  CAST(sum(d.n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS raw_mean
        |FROM documents d JOIN c ON d.source = c.source GROUP BY d.source""".stripMargin,
    // integer-µs gaps (epoch_us, the q94 convention), lower median at
    // (n+1)//2 and p90 at (9n+9)//10, ties by event_id — all BIGINT
    "q123_interarrival" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
        |g AS (SELECT user_id, event_id,
        |  us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap FROM e),
        |gg AS (SELECT user_id, gap, event_id FROM g WHERE gap IS NOT NULL),
        |rk AS (SELECT user_id, gap,
        |  row_number() OVER (PARTITION BY user_id ORDER BY gap, event_id) AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS n FROM gg)
        |SELECT user_id, max(n) AS n_gaps, min(gap) AS min_gap_us,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN gap END) AS median_gap_us,
        |  max(CASE WHEN rn = (9 * n + 9) // 10 THEN gap END) AS p90_gap_us,
        |  max(gap) AS max_gap_us
        |FROM rk GROUP BY user_id""".stripMargin,
    // two-stage mirror: rare-shingle candidates (df <= 8, the q45
    // rule), then EXACT intersection over the full shingle sets —
    // containment is true, not the capped undercount
    "q124_containment" ->
      s"""WITH $shingleCte,
         |dfc AS (SELECT shingle FROM (SELECT shingle, count(*) AS df FROM sh GROUP BY 1) t
         |        WHERE df <= 8),
         |shc AS (SELECT doc_id, sh.shingle FROM sh JOIN dfc USING (shingle)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
         |i AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
         |  FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
         |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
         |  GROUP BY 1, 2),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
         |SELECT i.doc_a, i.doc_b, inter, sa.n AS n_a, sb.n AS n_b,
         |  CAST(inter AS DOUBLE) / CAST(sa.n AS DOUBLE) AS containment_a,
         |  CAST(inter AS DOUBLE) / CAST(sb.n AS DOUBLE) AS containment_b
         |FROM i JOIN sz sa ON sa.doc_id = i.doc_a JOIN sz sb ON sb.doc_id = i.doc_b
         |WHERE greatest(CAST(inter AS DOUBLE) / CAST(sa.n AS DOUBLE),
         |               CAST(inter AS DOUBLE) / CAST(sb.n AS DOUBLE)) >= 0.9""".stripMargin,
    // centroid sums fold by vec_id, pair dot/norm sums fold by dim —
    // the zipped-unnest posexplode mirror + list_reduce ordered folds
    "q125_centroid_sim" ->
      """WITH ex AS (SELECT label, vec_id,
        |  unnest(range(0, len(embedding))) AS dim,
        |  CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
        |cent AS (SELECT label, dim,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(v ORDER BY vec_id)),
        |    (a, b) -> a + b) / count(*) AS m
        |  FROM ex GROUP BY label, dim)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(a.m * b.m ORDER BY a.dim)),
        |    (x, y) -> x + y)
        |  / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(a.m * a.m ORDER BY a.dim)),
        |       (x, y) -> x + y))
        |   * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(b.m * b.m ORDER BY a.dim)),
        |       (x, y) -> x + y))) AS cos_sim
        |FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
        |GROUP BY a.label, b.label""".stripMargin,
    // conditional-min firsts, integer-µs latencies, pure-integer
    // exact ranks over the converted-user set
    "q126_conversion_latency" ->
      """WITH f AS (SELECT user_id,
        |  min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS fv,
        |  min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS fp
        |  FROM events GROUP BY user_id),
        |l AS (SELECT user_id, fp - fv AS lat FROM f
        |      WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp >= fv),
        |r AS (SELECT lat, row_number() OVER (ORDER BY lat, user_id) AS rn,
        |      count(*) OVER () AS n FROM l)
        |SELECT max(n) AS n_converted,
        |  max(CASE WHEN rn = 1 THEN lat END) AS min_lat_us,
        |  max(CASE WHEN rn = (n + 3) // 4 THEN lat END) AS p25_lat_us,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN lat END) AS median_lat_us,
        |  max(CASE WHEN rn = (3 * n + 3) // 4 THEN lat END) AS p75_lat_us,
        |  max(CASE WHEN rn = (9 * n + 9) // 10 THEN lat END) AS p90_lat_us,
        |  max(CASE WHEN rn = n THEN lat END) AS max_lat_us
        |FROM r""".stripMargin,
    // first-occurrence construction of the cumulative-distinct curve
    // (min doc_id per token → per-doc new counts → running sums),
    // decile checkpoints at pure-integer ranks, q85's fold-ordered
    // least-squares over ln(T)/ln(V)
    "q127_vocab_growth" ->
      """WITH tk AS (SELECT source, doc_id,
        |    unnest(string_split(text, ' ')) AS token FROM documents),
        |fst AS (SELECT source, token, min(doc_id) AS doc_id FROM tk GROUP BY source, token),
        |nv AS (SELECT source, doc_id, count(*) AS nv FROM fst GROUP BY source, doc_id),
        |nt AS (SELECT source, doc_id, count(*) AS nt FROM tk GROUP BY source, doc_id),
        |pd AS (SELECT nt.source, nt.doc_id, nt.nt, coalesce(nv.nv, 0) AS nv
        |       FROM nt LEFT JOIN nv ON nv.source = nt.source AND nv.doc_id = nt.doc_id),
        |cur AS (SELECT source, doc_id,
        |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
        |  sum(nt) OVER (PARTITION BY source ORDER BY doc_id) AS tokens_seen,
        |  sum(nv) OVER (PARTITION BY source ORDER BY doc_id) AS vocab_seen,
        |  count(*) OVER (PARTITION BY source) AS n
        |  FROM pd),
        |cp AS (SELECT source, k.decile, rn AS docs_seen,
        |  CAST(tokens_seen AS BIGINT) AS tokens_seen, CAST(vocab_seen AS BIGINT) AS vocab_seen
        |  FROM cur CROSS JOIN (SELECT unnest(range(1, 11)) AS decile) k
        |  WHERE rn = (k.decile * n + 9) // 10),
        |pts AS (SELECT source, decile, tokens_seen, vocab_seen,
        |  ln(CAST(tokens_seen AS DOUBLE)) AS x, ln(CAST(vocab_seen AS DOUBLE)) AS y FROM cp),
        |g AS (SELECT source, count(*) AS np,
        |  list_reduce(list_prepend(0.0, list(x ORDER BY decile)), (a, b) -> a + b) AS sx,
        |  list_reduce(list_prepend(0.0, list(y ORDER BY decile)), (a, b) -> a + b) AS sy,
        |  list_reduce(list_prepend(0.0, list(x * y ORDER BY decile)), (a, b) -> a + b) AS sxy,
        |  list_reduce(list_prepend(0.0, list(x * x ORDER BY decile)), (a, b) -> a + b) AS sxx
        |  FROM pts GROUP BY source)
        |SELECT cp.source, CAST(cp.decile AS INTEGER) AS decile,
        |  CAST(cp.docs_seen AS BIGINT) AS docs_seen, cp.tokens_seen, cp.vocab_seen,
        |  (CAST(np AS DOUBLE) * sxy - sx * sy) / (CAST(np AS DOUBLE) * sxx - sx * sx) AS heaps_b
        |FROM cp JOIN g ON g.source = cp.source""".stripMargin,
    // inner self-join on token (one-sided tokens contribute 0 to
    // BC); every op is correctly rounded IEEE — sqrt, divides, one
    // multiply, order-pinned fold — so parity is by-standard, not
    // sampled (the ln-based JSD variant hash-failed on a measured
    // Math.log/glibc last-ulp split; see the operator scaladoc)
    "q128_source_hellinger" ->
      """WITH cs AS (SELECT source, token, count(*) AS c FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
        |  GROUP BY source, token),
        |ts AS (SELECT source, sum(c) AS t FROM cs GROUP BY source),
        |w AS (SELECT cs.source, token, CAST(c AS DOUBLE) / CAST(t AS DOUBLE) AS p
        |      FROM cs JOIN ts ON ts.source = cs.source),
        |g AS (SELECT a.source AS source_a, b.source AS source_b,
        |    count(*) AS n_shared_terms,
        |    list_reduce(list_prepend(0.0, list(sqrt(a.p * b.p) ORDER BY a.token)),
        |      (x, y) -> x + y) AS bc_affinity
        |  FROM w a JOIN w b ON a.token = b.token AND a.source < b.source
        |  GROUP BY a.source, b.source)
        |SELECT source_a, source_b, n_shared_terms, bc_affinity,
        |  sqrt(greatest(0.0, 1.0 - bc_affinity)) AS hellinger
        |FROM g""".stripMargin,
    // q94's ordered lag → exact transition counts → one divide per
    // probability, GraftLn, fold in (prev, next) order
    "q129_transition_entropy" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
        |tr AS (SELECT user_id, event_type AS next,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
        |  FROM e),
        |c AS (SELECT user_id, prev, next, count(*) AS c FROM tr
        |      WHERE prev IS NOT NULL GROUP BY user_id, prev, next),
        |t AS (SELECT user_id, prev, sum(c) AS t FROM c GROUP BY user_id, prev),
        |tt AS (SELECT user_id, sum(c) AS tt FROM c GROUP BY user_id),
        |sc AS (SELECT c.user_id, c.prev, c.next,
        |    -((CAST(c.c AS DOUBLE) / CAST(tt.tt AS DOUBLE))
        |      * ln(CAST(c.c AS DOUBLE) / CAST(t.t AS DOUBLE))) AS contrib, tt.tt
        |  FROM c JOIN t ON t.user_id = c.user_id AND t.prev = c.prev
        |  JOIN tt ON tt.user_id = c.user_id)
        |SELECT user_id, CAST(max(tt) AS BIGINT) AS n_transitions, count(*) AS n_patterns,
        |  list_reduce(list_prepend(0.0, list(contrib ORDER BY prev, next)), (a, b) -> a + b)
        |    AS entropy_nats
        |FROM sc GROUP BY user_id""".stripMargin,
    // degree-oriented triangle enumeration: each triangle generated
    // once from its minimum-(deg, id) corner; integer counts, one
    // mul + one divide for the coefficient — parity by-standard
    "q130_triangles" ->
      s"""WITH $minhashPairsCte,
         |deg AS (SELECT id, count(*) AS deg FROM (
         |    SELECT doc_a AS id FROM mh_pairs UNION ALL SELECT doc_b FROM mh_pairs)
         |  GROUP BY id),
         |e AS (SELECT
         |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND p.doc_a < p.doc_b)
         |         THEN p.doc_a ELSE p.doc_b END AS src,
         |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND p.doc_a < p.doc_b)
         |         THEN p.doc_b ELSE p.doc_a END AS dst
         |  FROM mh_pairs p
         |  JOIN deg da ON da.id = p.doc_a JOIN deg db ON db.id = p.doc_b),
         |f AS (SELECT e.src, e.dst, d.deg AS ddeg FROM e JOIN deg d ON d.id = e.dst),
         |tri AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
         |  FROM f e1 JOIN f e2 ON e2.src = e1.src
         |    AND (e1.ddeg < e2.ddeg OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst))
         |  JOIN f e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
         |tc AS (SELECT id, count(*) AS n_tri FROM (
         |    SELECT u AS id FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri)
         |  GROUP BY id)
         |SELECT d.id AS doc_id, d.deg AS degree,
         |  coalesce(tc.n_tri, 0) AS n_triangles,
         |  CASE WHEN d.deg >= 2
         |       THEN (2.0 * CAST(coalesce(tc.n_tri, 0) AS DOUBLE))
         |            / CAST(d.deg * (d.deg - 1) AS DOUBLE)
         |       ELSE 0.0 END AS clustering
         |FROM deg d LEFT JOIN tc ON tc.id = d.id""".stripMargin,
    // exact integer rank formula: HUGEINT sums mirror Spark's
    // DECIMAL(38,0); the only float ops are two int→double casts and
    // one divide
    "q131_gini" ->
      """WITH r AS (SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rank
        |  FROM documents),
        |g AS (SELECT source, count(*) AS n_docs,
        |    sum(CAST(n_chars AS HUGEINT)) AS sx,
        |    sum(CAST(rank AS HUGEINT) * CAST(n_chars AS HUGEINT)) AS rs
        |  FROM r GROUP BY source)
        |SELECT source, n_docs, CAST(sx AS BIGINT) AS total_chars,
        |  CAST(2 * rs - (CAST(n_docs AS HUGEINT) + 1) * sx AS DOUBLE)
        |    / CAST(CAST(n_docs AS HUGEINT) * sx AS DOUBLE) AS gini
        |FROM g""".stripMargin,
    // marginals RE-aggregate the observed cell frame (one corpus
    // scan, like Spark); expected is mul+div of int→double casts,
    // contrib sub+mul+div — per-cell, no cross-cell fold
    "q132_chi_square" ->
      """WITH o AS (SELECT source, lang, count(*) AS o FROM documents
        |  GROUP BY source, lang),
        |rt AS (SELECT source, CAST(sum(o) AS BIGINT) AS rt FROM o GROUP BY source),
        |ct AS (SELECT lang, CAST(sum(o) AS BIGINT) AS ct FROM o GROUP BY lang),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
        |c AS (SELECT o.source, o.lang, o.o,
        |  CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE) AS expected
        |  FROM o JOIN rt USING (source) JOIN ct USING (lang) CROSS JOIN n)
        |SELECT source, lang, o AS n_obs, expected,
        |  (CAST(o AS DOUBLE) - expected) * (CAST(o AS DOUBLE) - expected)
        |    / expected AS contrib
        |FROM c""".stripMargin,
    // the q88 BM25 chain (self-excluded, top-20) fused with the q24
    // dense-cosine chain (top-20) by reciprocal-rank fusion: each RRF
    // term is one int add + one divide, absent list → literal 0.0;
    // absent ranks surface as 0 ints, never NULL
    "q133_hybrid_rrf" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
         |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
         |nd AS (SELECT count(*) AS n_docs FROM documents),
         |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
         |st AS (SELECT count(*) AS n_docs,
         |  CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
         |ts AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
         |  CAST(tf.tf AS DOUBLE) * ln(CAST(nd.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS tfidf
         |  FROM tf JOIN df USING (token) CROSS JOIN nd),
         |qr AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY tfidf DESC, token ASC) AS trank FROM ts),
         |probes AS (SELECT doc_id AS probe_id, token FROM qr
         |  WHERE trank <= 3 AND doc_id < 10),
         |terms AS (SELECT p.probe_id, tf.doc_id, tf.token,
         |  ln((CAST(st.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
         |     / (CAST(df.df AS DOUBLE) + 0.5))
         |  * ((CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
         |     / (CAST(tf.tf AS DOUBLE)
         |        + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl.dl AS DOUBLE) / st.avgdl)))) AS s
         |  FROM probes p JOIN tf ON p.token = tf.token AND tf.doc_id <> p.probe_id
         |  JOIN df ON df.token = tf.token
         |  JOIN dl ON dl.doc_id = tf.doc_id
         |  CROSS JOIN st),
         |g AS (SELECT probe_id, doc_id,
         |  list_reduce(list_prepend(0.0, list(s ORDER BY token)), (a, x) -> a + x) AS score
         |  FROM terms GROUP BY probe_id, doc_id),
         |lr AS (SELECT probe_id, doc_id, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY score DESC, doc_id ASC) AS lex_rank FROM g),
         |lex AS (SELECT * FROM lr WHERE lex_rank <= 20),
         |$normCte,
         |dp AS (SELECT p.vec_id AS probe_id, c.vec_id AS doc_id,
         |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cos
         |  FROM e p JOIN e c ON p.vec_id < 10 AND p.vec_id <> c.vec_id),
         |dr AS (SELECT probe_id, doc_id, row_number() OVER (PARTITION BY probe_id
         |        ORDER BY cos DESC, doc_id ASC) AS dense_rank FROM dp),
         |den AS (SELECT * FROM dr WHERE dense_rank <= 20),
         |f AS (SELECT coalesce(l.probe_id, d.probe_id) AS probe_id,
         |    coalesce(l.doc_id, d.doc_id) AS doc_id,
         |    l.lex_rank, d.dense_rank,
         |    coalesce(1.0 / CAST(60 + l.lex_rank AS DOUBLE), 0.0)
         |      + coalesce(1.0 / CAST(60 + d.dense_rank AS DOUBLE), 0.0) AS rrf_score
         |  FROM lex l FULL OUTER JOIN den d
         |    ON l.probe_id = d.probe_id AND l.doc_id = d.doc_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |       ORDER BY rrf_score DESC, doc_id ASC) AS rank FROM f)
         |SELECT probe_id, CAST(rank AS INTEGER) AS rank, doc_id,
         |  CAST(coalesce(lex_rank, 0) AS INTEGER) AS lex_rank,
         |  CAST(coalesce(dense_rank, 0) AS INTEGER) AS dense_rank, rrf_score
         |FROM r WHERE rank <= 10""".stripMargin,
    // priority q = w/u is ONE divide (ES keys would need ln — parity
    // is sampled luck, measured 57/65536 mismatches on these md5
    // ratios); u from md5 hex digits 13-16, disjoint from the q63/q75
    // and q98 digits; τ = the 11th priority, ŵ = max(w, τ)
    "q134_priority_sample" ->
      """WITH pr AS (SELECT source, doc_id, n_chars, CAST(
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 13, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 14, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 15, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 16, 1)) - 1)) AS INTEGER) AS h
        | FROM documents),
        |p2 AS (SELECT source, doc_id, n_chars,
        |  CAST(n_chars AS DOUBLE) / (CAST(h + 1 AS DOUBLE) / 65537.0) AS priority
        |  FROM pr),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |  ORDER BY priority DESC, doc_id) AS rank FROM p2),
        |tau AS (SELECT source, priority AS tau FROM r WHERE rank = 11)
        |SELECT r.source, CAST(r.rank AS INTEGER) AS rank, r.doc_id,
        |  r.n_chars AS weight, r.priority,
        |  coalesce(tau.tau, 0.0) AS tau,
        |  greatest(CAST(r.n_chars AS DOUBLE), coalesce(tau.tau, 0.0)) AS w_est
        |FROM r LEFT JOIN tau USING (source) WHERE r.rank <= 10""".stripMargin,
    // exact ECDF sup over the union of step points; integer window
    // cums, one divide per ECDF value, abs + max — no fold, no
    // transcendental
    "q135_ks_matrix" ->
      """WITH cells AS (SELECT source, n_chars AS len, count(*) AS cnt
        |  FROM documents GROUP BY source, n_chars),
        |tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n FROM cells GROUP BY source),
        |srcs AS (SELECT source FROM tot),
        |lft AS (SELECT c.source AS s1, s.source AS s2, c.len,
        |    c.cnt AS c1, CAST(0 AS BIGINT) AS c2
        |  FROM cells c JOIN srcs s ON c.source < s.source),
        |rgt AS (SELECT s.source AS s1, c.source AS s2, c.len,
        |    CAST(0 AS BIGINT) AS c1, c.cnt AS c2
        |  FROM cells c JOIN srcs s ON s.source < c.source),
        |m AS (SELECT s1, s2, len, CAST(sum(c1) AS BIGINT) AS c1,
        |    CAST(sum(c2) AS BIGINT) AS c2
        |  FROM (SELECT * FROM lft UNION ALL SELECT * FROM rgt) u
        |  GROUP BY s1, s2, len),
        |cum AS (SELECT s1, s2, len,
        |  CAST(sum(c1) OVER (PARTITION BY s1, s2 ORDER BY len
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
        |  CAST(sum(c2) OVER (PARTITION BY s1, s2 ORDER BY len
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2
        |  FROM m),
        |g AS (SELECT cum.s1, cum.s2, max(ta.n) AS n_a, max(tb.n) AS n_b,
        |    count(*) AS n_steps,
        |    max(abs(CAST(cum1 AS DOUBLE) / CAST(ta.n AS DOUBLE)
        |          - CAST(cum2 AS DOUBLE) / CAST(tb.n AS DOUBLE))) AS ks_stat
        |  FROM cum JOIN tot ta ON ta.source = cum.s1
        |  JOIN tot tb ON tb.source = cum.s2
        |  GROUP BY cum.s1, cum.s2)
        |SELECT s1 AS source_a, s2 AS source_b, n_a, n_b, n_steps, ks_stat
        |FROM g""".stripMargin,
    // signature match count is an order-independent integer sum over
    // the 8 seeds; exact Jaccard is the q22 intersection/union; a
    // band collision without shared shingles left-joins to a 0 floor
    "q136_minhash_calibration" ->
      s"""WITH $minhashPairsCte,
         |m AS (SELECT p.doc_a, p.doc_b,
         |    CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_match
         |  FROM mh_pairs p
         |  JOIN mh a ON a.doc_id = p.doc_a
         |  JOIN mh b ON b.doc_id = p.doc_b AND b.seed = a.seed
         |  GROUP BY p.doc_a, p.doc_b),
         |ix AS (SELECT p.doc_a, p.doc_b, count(*) AS i
         |  FROM mh_pairs p
         |  JOIN sh sa ON sa.doc_id = p.doc_a
         |  JOIN sh sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
         |  GROUP BY p.doc_a, p.doc_b),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
         |SELECT m.doc_a, m.doc_b, m.n_match,
         |  CAST(m.n_match AS DOUBLE) / 8.0 AS est_jac,
         |  CAST(coalesce(ix.i, 0) AS DOUBLE)
         |    / CAST(na.n + nb.n - coalesce(ix.i, 0) AS DOUBLE) AS exact_jac,
         |  abs(CAST(m.n_match AS DOUBLE) / 8.0
         |    - CAST(coalesce(ix.i, 0) AS DOUBLE)
         |      / CAST(na.n + nb.n - coalesce(ix.i, 0) AS DOUBLE)) AS abs_err
         |FROM m LEFT JOIN ix ON ix.doc_a = m.doc_a AND ix.doc_b = m.doc_b
         |JOIN sz na ON na.doc_id = m.doc_a
         |JOIN sz nb ON nb.doc_id = m.doc_b""".stripMargin,
    // within-source document frequency over the DISTINCT shingle
    // frame; ties on shingle text; coverage one int->double divide
    "q137_boilerplate" ->
      s"""WITH $shingleCte,
         |bs AS (SELECT d.source, s.shingle, count(*) AS n_docs_with
         |  FROM sh s JOIN documents d ON d.doc_id = s.doc_id
         |  GROUP BY d.source, s.shingle),
         |nd AS (SELECT source, count(*) AS n_docs_source FROM documents
         |  GROUP BY source),
         |r AS (SELECT *, row_number() OVER (PARTITION BY source
         |  ORDER BY n_docs_with DESC, shingle ASC) AS rank FROM bs)
         |SELECT r.source, CAST(r.rank AS INTEGER) AS rank, r.shingle,
         |  r.n_docs_with, nd.n_docs_source,
         |  CAST(r.n_docs_with AS DOUBLE) / CAST(nd.n_docs_source AS DOUBLE) AS coverage
         |FROM r JOIN nd USING (source) WHERE r.rank <= 5""".stripMargin,
    // integer day durations (epoch-ms DIV, the q91 rule); each
    // survival factor one divide of exact integers; the running
    // product is the windowed list fold with a 1.0 seed (exact under
    // multiplication), day-ordered on both engines
    "q138_kaplan_meier" ->
      """WITH pu AS (SELECT user_id,
        |    min(epoch_ms(ts)) AS t0,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS tconv,
        |    max(epoch_ms(ts)) AS tlast
        |  FROM events GROUP BY user_id),
        |du AS (SELECT user_id,
        |    CASE WHEN tconv IS NOT NULL THEN 1 ELSE 0 END AS converted,
        |    (coalesce(tconv, tlast) - t0) // 86400000 AS dur_day
        |  FROM pu),
        |tot AS (SELECT count(*) AS n_total FROM du),
        |bd AS (SELECT dur_day, CAST(sum(converted) AS BIGINT) AS n_conv,
        |    CAST(sum(1 - converted) AS BIGINT) AS n_censor
        |  FROM du GROUP BY dur_day),
        |cr AS (SELECT dur_day, n_conv, n_censor,
        |    n_total - coalesce(CAST(sum(n_conv + n_censor) OVER (ORDER BY dur_day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS n_risk
        |  FROM bd CROSS JOIN tot),
        |f AS (SELECT *, CAST(n_risk - n_conv AS DOUBLE) / CAST(n_risk AS DOUBLE) AS factor
        |  FROM cr)
        |SELECT dur_day, n_risk, n_conv, n_censor,
        |  list_reduce(list_prepend(1.0, list(factor) OVER (ORDER BY dur_day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), (a, b) -> a * b) AS survival
        |FROM f""".stripMargin,
    // group sums/counts exact integers; one subtract + one divide;
    // singleton groups emit literal 0.0 behind the n > 1 guard
    "q139_loo_encoding" ->
      """WITH j AS (SELECT e.vec_id AS doc_id, d.source, e.label
        |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
        |g AS (SELECT source, CAST(sum(label) AS BIGINT) AS s, count(*) AS n
        |  FROM j GROUP BY source)
        |SELECT j.doc_id, j.source, j.label,
        |  CASE WHEN g.n > 1
        |       THEN CAST(g.s - j.label AS DOUBLE) / CAST(g.n - 1 AS DOUBLE)
        |       ELSE 0.0 END AS loo_mean
        |FROM j JOIN g USING (source)""".stripMargin,
    // unrolled greedy MMR: candidate top-10 per probe from the q24
    // chain, within-probe pair sims, then four mmrIterSql iterations
    // on top of the pure-relevance first pick
    "q140_mmr" ->
      s"""WITH $normCte,
         |qp AS (SELECT p.vec_id AS probe_id, c.vec_id AS doc_id,
         |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS rel
         |  FROM e p JOIN e c ON p.vec_id < 10 AND p.vec_id <> c.vec_id),
         |qs AS (SELECT probe_id, doc_id, rel FROM (
         |    SELECT *, row_number() OVER (PARTITION BY probe_id
         |      ORDER BY rel DESC, doc_id) AS rk FROM qp) z
         |  WHERE rk <= 10),
         |pp AS (SELECT a.probe_id, a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    ${dotSql("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm) AS cos
         |  FROM qs a JOIN qs b ON a.probe_id = b.probe_id AND a.doc_id <> b.doc_id
         |  JOIN e ea ON ea.vec_id = a.doc_id
         |  JOIN e eb ON eb.vec_id = b.doc_id),
         |s1 AS (SELECT probe_id, doc_id, rel, rel AS mmr_score, 1 AS sel_rank
         |  FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
         |    ORDER BY rel DESC, doc_id) AS rk FROM qs) z WHERE rk = 1),
         |u1 AS (SELECT * FROM s1),
         |${mmrIterSql(2)},
         |${mmrIterSql(3)},
         |${mmrIterSql(4)},
         |${mmrIterSql(5)}
         |SELECT probe_id, CAST(sel_rank AS INTEGER) AS sel_rank, doc_id,
         |  rel, mmr_score
         |FROM u5""".stripMargin,
    // tie-aware Mann-Whitney AUC from per-score class counts: all
    // integer until the single final divide; the half-tie term stays
    // integral by doubling (num2 / 2PN)
    "q141_roc_auc" ->
      """WITH cells AS (SELECT source, n_chars AS score,
        |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos,
        |  sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS neg
        |  FROM documents GROUP BY source, n_chars),
        |w AS (SELECT source, pos, neg,
        |  coalesce(sum(neg) OVER (PARTITION BY source ORDER BY score
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
        |  FROM cells),
        |s AS (SELECT source,
        |  CAST(sum(pos * (2 * cumneg + neg)) AS DOUBLE) AS num2,
        |  CAST(sum(pos) AS DOUBLE) AS p, CAST(sum(neg) AS DOUBLE) AS n
        |  FROM w GROUP BY source)
        |SELECT source, CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
        |  CASE WHEN p > 0 AND n > 0 THEN num2 / (2.0 * p * n) ELSE 0.5 END AS auc
        |FROM s""".stripMargin,
    // quantile mapping: within-source percent-rank as-of-joined onto
    // the pooled step table; both percent-ranks are single divides of
    // exact integers, the as-of pick argmax over distinct gp values
    "q142_quantile_norm" ->
      """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
        |r AS (SELECT doc_id, source, n_chars,
        |  rank() OVER (PARTITION BY source ORDER BY n_chars) AS rk,
        |  count(*) OVER (PARTITION BY source) AS ns
        |  FROM d),
        |p AS (SELECT doc_id, source, n_chars,
        |  CASE WHEN ns > 1 THEN CAST(rk - 1 AS DOUBLE) / CAST(ns - 1 AS DOUBLE)
        |       ELSE 0.0 END AS p
        |  FROM r),
        |cells AS (SELECT n_chars AS v, count(*) AS c FROM d GROUP BY n_chars),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tot FROM cells),
        |steps AS (SELECT v,
        |  CAST(coalesce(sum(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
        |    / CAST(n_tot - 1 AS DOUBLE) AS gp
        |  FROM cells, tot)
        |SELECT p.doc_id, p.source, p.n_chars, p.p AS src_pct,
        |  arg_max(s.v, s.gp) AS norm_chars
        |FROM p JOIN steps s ON s.gp <= p.p
        |GROUP BY p.doc_id, p.source, p.n_chars, p.p""".stripMargin,
    // per-label disagreement over the bucketed kNN frame; integer
    // counts, one final divide, argmax confusion with the
    // smaller-label tiebreak, (-1, 0) sentinel for clean labels
    "q143_knn_label_noise" ->
      s"""WITH ${allKnnCte(5)},
         |kd AS (SELECT *, CASE WHEN label <> n_label THEN 1 ELSE 0 END AS dis
         |  FROM knn),
         |pv AS (SELECT vec_id, label, count(*) AS nn, sum(dis) AS dis
         |  FROM kd GROUP BY vec_id, label),
         |pl AS (SELECT label, count(*) AS n_vecs,
         |    CAST(sum(nn) AS BIGINT) AS knn_rows,
         |    CAST(sum(dis) AS BIGINT) AS dis_total
         |  FROM pv GROUP BY label),
         |cf AS (SELECT label, n_label, count(*) AS cnt
         |  FROM kd WHERE dis = 1 GROUP BY label, n_label),
         |top AS (SELECT label, n_label AS top_confusion, cnt AS top_confusion_n
         |  FROM (SELECT *, row_number() OVER (PARTITION BY label
         |    ORDER BY cnt DESC, n_label) AS rk FROM cf) z WHERE rk = 1)
         |SELECT pl.label, pl.n_vecs, pl.knn_rows,
         |  CAST(pl.dis_total AS DOUBLE) / CAST(pl.knn_rows AS DOUBLE)
         |    AS disagree_frac,
         |  coalesce(top.top_confusion, -1) AS top_confusion,
         |  CAST(coalesce(top.top_confusion_n, 0) AS BIGINT) AS top_confusion_n
         |FROM pl LEFT JOIN top ON top.label = pl.label""".stripMargin,
    // reciprocity = equi-join of the kNN frame with itself on the
    // swapped id pair; cos is the identical dimension fold in both
    // directions so the a->b double is emitted
    "q144_mutual_knn" ->
      s"""WITH ${allKnnCte(5)}
         |SELECT f.vec_id AS vec_a, f.neighbor_id AS vec_b, f.cos AS cos_sim,
         |  CAST(f.rank AS INTEGER) AS rank_ab, CAST(r2.rank AS INTEGER) AS rank_ba
         |FROM knn f JOIN knn r2
         |  ON r2.vec_id = f.neighbor_id AND r2.neighbor_id = f.vec_id
         |WHERE f.vec_id < f.neighbor_id""".stripMargin,
    // Poisson bootstrap: per-(doc, replicate) inverse-CDF weight from
    // md5 digits 1-4 of "doc#rep"; per-replicate integer sums, one
    // divide per mean, order-statistic CI picks; every CDF threshold
    // e0-suffixed so DuckDB parses DOUBLE, not DECIMAL
    "q145_bootstrap_ci" ->
      """WITH reps AS (SELECT unnest(generate_series(1, 64)) AS b),
        |hh AS (SELECT d.n_chars, r.b, CAST(
        |   (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR) || '#' || CAST(r.b AS VARCHAR)), 1, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR) || '#' || CAST(r.b AS VARCHAR)), 2, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR) || '#' || CAST(r.b AS VARCHAR)), 3, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR) || '#' || CAST(r.b AS VARCHAR)), 4, 1)) - 1) AS INTEGER) AS h
        | FROM documents d CROSS JOIN reps r),
        |uu AS (SELECT b, n_chars,
        |  (CAST(h AS DOUBLE) + 0.5e0) / 65536.0e0 AS u FROM hh),
        |ww AS (SELECT b, n_chars, CASE
        |  WHEN u < 0.36787944117144233e0 THEN 0
        |  WHEN u < 0.7357588823428847e0 THEN 1
        |  WHEN u < 0.9196986029286058e0 THEN 2
        |  WHEN u < 0.9810118431238462e0 THEN 3
        |  WHEN u < 0.9963401531726563e0 THEN 4
        |  WHEN u < 0.9994058151824183e0 THEN 5
        |  ELSE 6 END AS w FROM uu),
        |m AS (SELECT b, CAST(sum(w) AS DOUBLE) AS sw,
        |  CAST(sum(w * n_chars) AS DOUBLE) AS swx FROM ww GROUP BY b),
        |m0 AS (SELECT b, CASE WHEN sw > 0 THEN swx / sw ELSE 0.0 END AS mn FROM m),
        |mm AS (SELECT b, mn, row_number() OVER (ORDER BY mn, b) AS rk FROM m0),
        |lo AS (SELECT mn AS ci_lo FROM mm WHERE rk = 2),
        |hi AS (SELECT mn AS ci_hi FROM mm WHERE rk = 63),
        |pt AS (SELECT count(*) AS n_docs,
        |  CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_chars
        |  FROM documents)
        |SELECT pt.n_docs, pt.mean_chars, lo.ci_lo, hi.ci_hi,
        |  CAST(64 AS INTEGER) AS b_reps
        |FROM pt CROSS JOIN lo CROSS JOIN hi""".stripMargin,
    // endpoint-degree Pearson over directed near-dup edges: exact
    // integer moments (the q118 rule), one fixed-order double
    // expression, zero-variance guard to 0.0
    "q146_assortativity" ->
      s"""WITH $minhashPairsCte,
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
         |      UNION ALL SELECT doc_b, doc_a FROM mh_pairs),
         |deg AS (SELECT src AS id, count(*) AS deg FROM e GROUP BY src),
         |ed AS (SELECT dx.deg AS dx, dy.deg AS dy FROM e
         |  JOIN deg dx ON dx.id = e.src JOIN deg dy ON dy.id = e.dst),
         |s AS (SELECT count(*) AS n,
         |  CAST(sum(dx) AS DOUBLE) AS sx, CAST(sum(dy) AS DOUBLE) AS sy,
         |  CAST(sum(dx * dy) AS DOUBLE) AS sxy,
         |  CAST(sum(dx * dx) AS DOUBLE) AS sxx,
         |  CAST(sum(dy * dy) AS DOUBLE) AS syy FROM ed)
         |SELECT CAST(CAST(n AS DOUBLE) / 2.0e0 AS BIGINT) AS n_edges,
         |  CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0
         |        AND CAST(n AS DOUBLE) * syy - sy * sy > 0
         |    THEN (CAST(n AS DOUBLE) * sxy - sx * sy) /
         |      (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
         |       sqrt(CAST(n AS DOUBLE) * syy - sy * sy))
         |    ELSE 0.0 END AS assortativity
         |FROM s""".stripMargin,
    // q24's probe scan with the label filter before ranking: top-k
    // most-similar DIFFERENT-label candidates per probe
    "q147_hard_negatives" ->
      s"""WITH el AS (SELECT vec_id, label, embedding,
         |  sqrt(list_reduce(list_transform(embedding,
         |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
         |  FROM embeddings),
         |pairs AS (SELECT p.vec_id AS probe_id, p.label AS probe_label,
         |    c.vec_id AS neighbor_id, c.label AS neg_label,
         |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cos
         |  FROM el p JOIN el c ON p.vec_id < 10 AND p.label <> c.label),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |  ORDER BY cos DESC, neighbor_id) AS rank FROM pairs)
         |SELECT probe_id, probe_label, neighbor_id, neg_label,
         |  cos AS cos_sim, CAST(rank AS INTEGER) AS rank
         |FROM r WHERE rank <= 5""".stripMargin,
    // index of dispersion from exact integer sums over containing
    // docs (zero cells cancel); minDf before the bounded cut
    "q148_burstiness" ->
      """WITH tc AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |c AS (SELECT doc_id, token, count(*) AS c FROM tc GROUP BY doc_id, token),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (SELECT token, count(*) AS df,
        |    CAST(sum(c) AS DOUBLE) AS sc, CAST(sum(c * c) AS DOUBLE) AS sc2
        |  FROM c GROUP BY token HAVING count(*) >= 5)
        |SELECT token, df, CAST(sc AS BIGINT) AS tf_total,
        |  (CAST(n_docs AS DOUBLE) * sc2 - sc * sc)
        |    / (CAST(n_docs AS DOUBLE) * sc) AS dispersion
        |FROM s, n ORDER BY dispersion DESC, token LIMIT 50""".stripMargin,
    // quadratic mirror of the union-window as-of: per purchase, the
    // max-(tus, t_id) strictly-earlier touch; ('none', -1, -1)
    // sentinel for untouched purchases
    "q149_last_touch" ->
      s"""WITH $lastTouchCte
         |SELECT p.purchase_id, p.user_id, p.pus AS purchase_us,
         |  coalesce(j1.t_type, 'none') AS touch_type,
         |  CAST(coalesce(j1.t_id, -1) AS BIGINT) AS touch_event_id,
         |  CAST(coalesce(p.pus - j1.tus, -1) AS BIGINT) AS gap_us
         |FROM p LEFT JOIN j1 ON j1.purchase_id = p.purchase_id""".stripMargin,
    // q125's centroid folds -> per-vec argmax assignment -> integer
    // confusion sums; kappa = (N*A - B)/(N^2 - B), one divide
    "q150_centroid_kappa" ->
      """WITH ex AS (SELECT label, vec_id,
        |  unnest(range(0, len(embedding))) AS dim,
        |  CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
        |cent AS (SELECT label AS label_c, dim,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(v ORDER BY vec_id)),
        |    (a, b) -> a + b) / count(*) AS m
        |  FROM ex GROUP BY label, dim),
        |cn AS (SELECT label_c, sqrt(list_reduce(
        |    list_prepend(CAST(0.0 AS DOUBLE), list(m * m ORDER BY dim)),
        |    (a, b) -> a + b)) AS nc
        |  FROM cent GROUP BY label_c),
        |vn AS (SELECT vec_id, sqrt(list_reduce(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nv
        |  FROM embeddings),
        |d AS (SELECT ex.vec_id, ex.label AS label_true, c.label_c,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(ex.v * c.m ORDER BY ex.dim)),
        |    (a, b) -> a + b) AS dot
        |  FROM ex JOIN cent c ON c.dim = ex.dim
        |  GROUP BY ex.vec_id, ex.label, c.label_c),
        |a1 AS (SELECT d.vec_id, d.label_true, d.label_c,
        |    d.dot / (vn.nv * cn.nc) AS cos
        |  FROM d JOIN vn ON vn.vec_id = d.vec_id JOIN cn ON cn.label_c = d.label_c),
        |asg AS (SELECT vec_id, label_true, label_c AS assigned FROM
        |  (SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY cos DESC, label_c) AS rk FROM a1) z WHERE rk = 1),
        |conf AS (SELECT label_true, assigned, count(*) AS c FROM asg
        |  GROUP BY label_true, assigned),
        |ag AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS a FROM conf
        |  WHERE label_true = assigned),
        |rk_ AS (SELECT label_true AS k, sum(c) AS rk FROM conf GROUP BY label_true),
        |ck_ AS (SELECT assigned AS k, sum(c) AS ck FROM conf GROUP BY assigned),
        |bb AS (SELECT CAST(coalesce(sum(coalesce(rk, 0) * coalesce(ck, 0)), 0) AS DOUBLE) AS b
        |  FROM rk_ FULL JOIN ck_ USING (k)),
        |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM conf)
        |SELECT nn.n AS n_vecs, ag.a AS agree,
        |  CAST(ag.a AS DOUBLE) / CAST(nn.n AS DOUBLE) AS po,
        |  bb.b / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)) AS pe,
        |  CASE WHEN CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE) - bb.b > 0
        |    THEN (CAST(nn.n AS DOUBLE) * CAST(ag.a AS DOUBLE) - bb.b) /
        |         (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE) - bb.b)
        |    ELSE 0.0 END AS kappa
        |FROM nn CROSS JOIN ag CROSS JOIN bb""".stripMargin,
    // q128's Bhattacharyya fold over the q63 split assignment: inner
    // join IS the statistic (missing tokens contribute exactly 0)
    "q151_split_affinity" ->
      """WITH b AS (SELECT text,
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100 AS bucket
        | FROM documents),
        |sp AS (SELECT CASE WHEN bucket < 80 THEN 'train'
        |    WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
        |  unnest(string_split(text, ' ')) AS token FROM b),
        |cs AS (SELECT split, token, count(*) AS c FROM sp GROUP BY split, token),
        |ts AS (SELECT split, sum(c) AS t FROM cs GROUP BY split),
        |w AS (SELECT cs.split, token,
        |    CAST(c AS DOUBLE) / CAST(t AS DOUBLE) AS p
        |  FROM cs JOIN ts ON ts.split = cs.split),
        |g AS (SELECT a.split AS split_a, b2.split AS split_b,
        |    count(*) AS n_shared_terms,
        |    list_reduce(list_prepend(0.0, list(sqrt(a.p * b2.p) ORDER BY a.token)),
        |      (x, y) -> x + y) AS bc_affinity
        |  FROM w a JOIN w b2 ON a.token = b2.token AND a.split < b2.split
        |  GROUP BY a.split, b2.split)
        |SELECT split_a, split_b, n_shared_terms, bc_affinity,
        |  sqrt(greatest(0.0, 1.0 - bc_affinity)) AS hellinger
        |FROM g""".stripMargin,
    // q71's exact integer offsets replayed with a plain global
    // window (quadratic-safe oracle mirror), then pure integer
    // crossing arithmetic and two final divides
    "q152_packing_audit" ->
      """WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok
        |  FROM documents),
        |c AS (SELECT doc_id, n_tok, CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |  FROM d),
        |x AS (SELECT n_tok,
        |  (cum_before + n_tok - 1) // 2048 - cum_before // 2048 AS crossings
        |  FROM c),
        |s AS (SELECT count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |  CAST(sum(CASE WHEN crossings > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing_docs,
        |  CAST(sum(crossings) AS BIGINT) AS total_crossings FROM x)
        |SELECT n_docs, total_tokens,
        |  (total_tokens + 2047) // 2048 AS n_packs,
        |  n_crossing_docs, total_crossings,
        |  CAST(n_crossing_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS crossing_rate,
        |  1.0e0 + CAST(total_crossings AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_fragments
        |FROM s""".stripMargin,
    // top-21 order statistics, ln on integer-valued doubles (away
    // from the q128 near-1 ulp region), rank-ordered fold, one
    // divide; alpha guards the all-tied case
    "q153_hill_tail" ->
      """WITH t AS (SELECT n_chars, doc_id FROM documents
        |  ORDER BY n_chars DESC, doc_id LIMIT 21),
        |r AS (SELECT n_chars, row_number() OVER
        |  (ORDER BY n_chars DESC, doc_id) AS rn FROM t),
        |k1 AS (SELECT n_chars AS x_k1 FROM r WHERE rn = 21),
        |h AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(ln(CAST(r.n_chars AS DOUBLE)) - ln(CAST(k1.x_k1 AS DOUBLE))
        |      ORDER BY r.rn)), (a, b) -> a + b) / 20.0e0 AS hill
        |  FROM r, k1 WHERE rn <= 20)
        |SELECT CAST(20 AS INTEGER) AS k, k1.x_k1, h.hill,
        |  CASE WHEN h.hill > 0 THEN 1.0e0 / h.hill ELSE 0.0 END AS alpha
        |FROM h, k1""".stripMargin,
    // q149's chain rolled up per channel with DECIMAL(18,2) money
    // sums and an exact integer gap mean over the attributed subset
    "q155_channel_revenue" ->
      s"""WITH $lastTouchCte,
         |att AS (SELECT p.purchase_id,
         |    coalesce(j1.t_type, 'none') AS touch_type,
         |    CAST(coalesce(p.pus - j1.tus, -1) AS BIGINT) AS gap_us
         |  FROM p LEFT JOIN j1 ON j1.purchase_id = p.purchase_id),
         |v AS (SELECT event_id AS purchase_id,
         |  CAST(value AS DECIMAL(18,2)) AS v FROM events)
         |SELECT touch_type, count(*) AS n_conversions,
         |  CAST(sum(v.v) AS DOUBLE) AS revenue,
         |  CAST(sum(CASE WHEN gap_us >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
         |  CASE WHEN sum(CASE WHEN gap_us >= 0 THEN 1 ELSE 0 END) > 0
         |    THEN CAST(sum(CASE WHEN gap_us >= 0 THEN gap_us ELSE 0 END) AS DOUBLE)
         |       / CAST(sum(CASE WHEN gap_us >= 0 THEN 1 ELSE 0 END) AS DOUBLE)
         |    ELSE 0.0 END AS mean_gap_us
         |FROM att JOIN v USING (purchase_id)
         |GROUP BY touch_type""".stripMargin,
    // fixed-community Newman modularity: e_cc, d_c, m exact integer
    // counts; per-source contribution one fixed divide/square/
    // subtract sequence, no cross-row double sum
    "q156_modularity" ->
      s"""WITH $minhashPairsCte,
         |tg AS (SELECT p.doc_a, p.doc_b, sa.source AS src_a, sb.source AS src_b
         |  FROM mh_pairs p JOIN documents sa ON sa.doc_id = p.doc_a
         |  JOIN documents sb ON sb.doc_id = p.doc_b),
         |mm AS (SELECT count(*) AS m FROM tg),
         |ein AS (SELECT src_a AS source, count(*) AS e_in FROM tg
         |  WHERE src_a = src_b GROUP BY src_a),
         |en AS (SELECT doc_a AS id, src_a AS source FROM tg
         |       UNION ALL SELECT doc_b, src_b FROM tg),
         |dg AS (SELECT source, count(*) AS deg_sum,
         |  count(DISTINCT id) AS n_nodes FROM en GROUP BY source)
         |SELECT dg.source, dg.n_nodes,
         |  CAST(coalesce(ein.e_in, 0) AS BIGINT) AS e_in, dg.deg_sum,
         |  CAST(coalesce(ein.e_in, 0) AS DOUBLE) / CAST(mm.m AS DOUBLE)
         |  - (CAST(dg.deg_sum AS DOUBLE) / (2.0e0 * CAST(mm.m AS DOUBLE)))
         |    * (CAST(dg.deg_sum AS DOUBLE) / (2.0e0 * CAST(mm.m AS DOUBLE))) AS contrib
         |FROM dg LEFT JOIN ein ON ein.source = dg.source CROSS JOIN mm""".stripMargin,
    // the q21 signature chain once, then one bucket-count pass per
    // band width; join_pairs = sum s(s-1)/2 IS the band-join row
    // count at that width
    "q157_band_curve" ->
      s"""WITH $minhashPairsCte,
         |${bandStatsCte(1)},
         |${bandStatsCte(2)},
         |${bandStatsCte(4)},
         |${bandStatsCte(8)}
         |SELECT * FROM st1 UNION ALL SELECT * FROM st2
         |UNION ALL SELECT * FROM st4 UNION ALL SELECT * FROM st8""".stripMargin,
    // Kish effective sample size from exact integer moment sums;
    // two divides at the end
    "q158_ess" ->
      """WITH s AS (SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS DOUBLE) AS sw,
        |  CAST(sum(n_chars * n_chars) AS DOUBLE) AS sw2
        |  FROM documents GROUP BY source)
        |SELECT source, n_docs, CAST(sw AS BIGINT) AS total_chars,
        |  sw * sw / sw2 AS ess,
        |  sw * sw / sw2 / CAST(n_docs AS DOUBLE) AS ess_ratio
        |FROM s""".stripMargin,
    // gaps-and-islands: island id = running sum of integer change
    // flags over the (us, event_id) total order
    "q159_run_lengths" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |f AS (SELECT user_id, event_type, us, event_id,
        |  CASE WHEN lag(event_type) OVER w IS NULL
        |    OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |r AS (SELECT user_id, event_type,
        |  sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        |  FROM f),
        |runs AS (SELECT user_id, run_id, event_type, count(*) AS len
        |  FROM r GROUP BY user_id, run_id, event_type)
        |SELECT event_type, count(*) AS n_runs,
        |  CAST(sum(len) AS BIGINT) AS total_events,
        |  CAST(max(len) AS BIGINT) AS max_run_len,
        |  CAST(sum(len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_run_len
        |FROM runs GROUP BY event_type""".stripMargin,
    // q129's transition counts -> row-normalized matrix -> 8 unrolled
    // v*P iterations, neighbor sums folded in prev order
    "q160_stationary" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
         |  FROM events),
         |tr0 AS (SELECT event_type AS next,
         |  lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
         |  FROM e),
         |c AS (SELECT prev, next, count(*) AS c FROM tr0
         |  WHERE prev IS NOT NULL GROUP BY prev, next),
         |t AS (SELECT prev, sum(c) AS t FROM c GROUP BY prev),
         |p AS (SELECT c.prev, c.next,
         |  CAST(c.c AS DOUBLE) / CAST(t.t AS DOUBLE) AS p
         |  FROM c JOIN t ON t.prev = c.prev),
         |kk AS (SELECT count(DISTINCT prev) AS k FROM p),
         |v0 AS (SELECT DISTINCT prev AS state,
         |  1.0e0 / CAST(k AS DOUBLE) AS prob FROM p, kk),
         |${statIterCte(1)},
         |${statIterCte(2)},
         |${statIterCte(3)},
         |${statIterCte(4)},
         |${statIterCte(5)},
         |${statIterCte(6)},
         |${statIterCte(7)},
         |${statIterCte(8)}
         |SELECT state AS event_type, prob AS stationary_prob FROM v8""".stripMargin,
    // binary Brier expanded to (p^2 n - 2pk + k)/n: exact-integer
    // counts, fixed-order double arithmetic, inner-join semantics
    "q161_calibration" ->
      """WITH b AS (SELECT source, lang,
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100 AS bucket
        | FROM documents),
        |c AS (SELECT source,
        |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'valid'
        |       ELSE 'test' END AS split,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS k
        |  FROM b GROUP BY source, 2),
        |tr AS (SELECT source, n AS train_n, k AS train_k FROM c WHERE split = 'train'),
        |te AS (SELECT source, n AS test_n, k AS test_k FROM c WHERE split = 'test'),
        |j AS (SELECT tr.source, train_n, test_n, train_k, test_k,
        |  CAST(train_k AS DOUBLE) / CAST(train_n AS DOUBLE) AS p
        |  FROM tr JOIN te ON te.source = tr.source
        |  WHERE train_n > 0 AND test_n > 0)
        |SELECT source, train_n, test_n, p AS p_train,
        |  CAST(test_k AS DOUBLE) / CAST(test_n AS DOUBLE) AS test_rate,
        |  (p * p * CAST(test_n AS DOUBLE) - 2.0e0 * p * CAST(test_k AS DOUBLE)
        |   + CAST(test_k AS DOUBLE)) / CAST(test_n AS DOUBLE) AS brier
        |FROM j""".stripMargin,
    // explicit decile formula ((rn-1)*10) div n + 1 (never engine
    // ntile), integer cums over the 10-row frame, single divides
    "q162_gains" ->
      """WITH d AS (SELECT doc_id, n_chars,
        |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
        |r AS (SELECT *, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn,
        |  count(*) OVER () AS n FROM d),
        |dc AS (SELECT CAST(((rn - 1) * 10) // n + 1 AS INTEGER) AS decile,
        |  count(*) AS n_docs, CAST(sum(y) AS BIGINT) AS n_pos
        |  FROM r GROUP BY 1),
        |g AS (SELECT *, CAST(sum(n_docs) OVER w AS BIGINT) AS cum_docs,
        |  CAST(sum(n_pos) OVER w AS BIGINT) AS cum_pos,
        |  CAST(sum(n_docs) OVER () AS BIGINT) AS tot_docs,
        |  CAST(sum(n_pos) OVER () AS BIGINT) AS tot_pos
        |  FROM dc WINDOW w AS (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT decile, n_docs, n_pos, cum_docs, cum_pos,
        |  CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE) AS capture_rate,
        |  (CAST(cum_pos AS DOUBLE) / CAST(cum_docs AS DOUBLE)) /
        |  (CAST(tot_pos AS DOUBLE) / CAST(tot_docs AS DOUBLE)) AS lift
        |FROM g""".stripMargin,
    // exact HUGEINT group sums, one divide per leave-one-out theta,
    // both cross-source reductions folded in source order
    "q163_jackknife" ->
      """WITH cells AS (SELECT source, sum(n_chars) AS cj,
        |  sum(len(string_split(text, ' '))) AS tj
        |  FROM documents GROUP BY source),
        |tot AS (SELECT sum(cj) AS ct, sum(tj) AS tt, count(*) AS j FROM cells),
        |th AS (SELECT source, CAST(ct AS DOUBLE) AS ct, CAST(tt AS DOUBLE) AS tt, j,
        |  CAST(ct - cj AS DOUBLE) / CAST(tt - tj AS DOUBLE) AS theta_j
        |  FROM cells, tot),
        |bar AS (SELECT j, ct, tt, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(theta_j ORDER BY source)), (a, b) -> a + b)
        |    / CAST(j AS DOUBLE) AS theta_bar
        |  FROM th GROUP BY j, ct, tt),
        |ss AS (SELECT th.j, th.ct, th.tt, bar.theta_bar,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list((theta_j - theta_bar) * (theta_j - theta_bar) ORDER BY source)),
        |    (a, b) -> a + b) AS ss
        |  FROM th, bar GROUP BY th.j, th.ct, th.tt, bar.theta_bar)
        |SELECT j AS n_sources, ct / tt AS theta, theta_bar,
        |  CAST(j - 1 AS DOUBLE) / CAST(j AS DOUBLE) * ss AS var_jack,
        |  sqrt(CAST(j - 1 AS DOUBLE) / CAST(j AS DOUBLE) * ss) AS se_jack
        |FROM ss""".stripMargin,
    // leading digit by string inspection of the scale-2 decimal (no
    // log10 in the comparison path); Benford rates stamped as the
    // identical literal doubles the plan uses
    "q164_benford" -> {
      val bfCase = graft.operators.EventOps.benfordRates
        .map { case (d, p) => s"WHEN digit = '$d' THEN ${p}e0" }
        .mkString(" ")
      s"""WITH v AS (SELECT CAST(value AS DECIMAL(18,2)) AS v FROM events
         |  WHERE CAST(value AS DECIMAL(18,2)) > 0),
         |d AS (SELECT regexp_extract(CAST(v AS VARCHAR), '[1-9]', 0) AS digit
         |  FROM v),
         |c AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit),
         |t AS (SELECT sum(n_obs) AS n FROM c)
         |SELECT digit, n_obs,
         |  CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE) AS obs_rate,
         |  CASE $bfCase END AS benford_rate,
         |  CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE) - CASE $bfCase END AS dev
         |FROM c, t""".stripMargin
    },
    // rank over all candidates, first same-label hit within top-20,
    // reciprocals folded in probe_id order, one divide per label
    "q165_label_mrr" ->
      s"""WITH el AS (SELECT vec_id, label, embedding,
         |  sqrt(list_reduce(list_transform(embedding,
         |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
         |  FROM embeddings),
         |pairs AS (SELECT p.vec_id AS probe_id, p.label AS probe_label,
         |    c.vec_id AS neighbor_id, c.label AS n_label,
         |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cos
         |  FROM el p JOIN el c ON p.vec_id < 50 AND p.vec_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |  ORDER BY cos DESC, neighbor_id) AS rank FROM pairs),
         |fh AS (SELECT probe_id, min(rank) AS first_rank FROM r
         |  WHERE rank <= 20 AND n_label = probe_label GROUP BY probe_id),
         |pr AS (SELECT vec_id AS probe_id, label AS probe_label
         |  FROM embeddings WHERE vec_id < 50),
         |rr AS (SELECT pr.probe_id, pr.probe_label,
         |  CASE WHEN fh.first_rank IS NOT NULL
         |    THEN 1.0e0 / CAST(fh.first_rank AS DOUBLE) ELSE 0.0 END AS rr
         |  FROM pr LEFT JOIN fh ON fh.probe_id = pr.probe_id)
         |SELECT probe_label, count(*) AS n_probes,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(rr ORDER BY probe_id)), (a, b) -> a + b)
         |    / CAST(count(*) AS DOUBLE) AS mrr
         |FROM rr GROUP BY probe_label""".stripMargin,
    // the q72 fixpoint reduced to its size histogram; shares are
    // single divides over broadcast totals
    "q166_cluster_sizes" ->
      s"""WITH RECURSIVE $closureCte,
         |sz AS (SELECT cluster_id, count(*) AS size FROM cc_labels
         |  GROUP BY cluster_id),
         |cells AS (SELECT size, count(*) AS n_clusters FROM sz GROUP BY size),
         |t AS (SELECT sum(size * n_clusters) AS ndt FROM cells)
         |SELECT size, n_clusters, size * n_clusters AS n_docs,
         |  CAST(size * n_clusters AS DOUBLE) / CAST(ndt AS DOUBLE) AS doc_share,
         |  (size - 1) * n_clusters AS n_removed
         |FROM cells, t""".stripMargin,
    // integer cumulative token weights over the (n_chars, doc_id)
    // order; quantile picks are integer comparisons, no division
    "q167_weighted_quantiles" ->
      """WITH d AS (SELECT source, doc_id, n_chars,
        |  len(string_split(text, ' ')) AS tok FROM documents),
        |w AS (SELECT source, n_chars,
        |  CAST(sum(tok) OVER (PARTITION BY source ORDER BY n_chars, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumw,
        |  CAST(sum(tok) OVER (PARTITION BY source) AS BIGINT) AS tot
        |  FROM d)
        |SELECT source, count(*) AS n_docs, max(tot) AS total_tokens,
        |  min(CASE WHEN 2 * cumw >= tot THEN n_chars END) AS w_median_chars,
        |  min(CASE WHEN 10 * cumw >= 9 * tot THEN n_chars END) AS w_p90_chars
        |FROM w GROUP BY source""".stripMargin,
    // exact-value grouping (the double is compared, never summed);
    // two-level keyed counts, one divide
    "q168_event_dups" ->
      """WITH g AS (SELECT user_id, epoch_us(ts) AS us, event_type, value,
        |  count(*) AS c FROM events GROUP BY user_id, us, event_type, value)
        |SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events,
        |  count(*) AS n_distinct,
        |  CAST(sum(c - 1) AS BIGINT) AS n_dup_events,
        |  CAST(sum(c - 1) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dup_rate
        |FROM g GROUP BY event_type""".stripMargin,
    // doubled midranks (2·rank + peers − 1, exact integers) so tied
    // runs carry their average rank without leaving the integer
    // domain; Pearson-on-ranks with the q118 integer-moment rule and
    // the identical fixed-order final formula
    "q169_spearman" ->
      s"""WITH d AS (SELECT source, n_chars AS x,
         |  CAST(floor(($qualitySql) * 1000000.0 + 0.5) AS BIGINT) AS y
         |  FROM documents),
         |r AS (SELECT source,
         |  2 * rank() OVER (PARTITION BY source ORDER BY x)
         |    + count(*) OVER (PARTITION BY source, x) - 1 AS rx2,
         |  2 * rank() OVER (PARTITION BY source ORDER BY y)
         |    + count(*) OVER (PARTITION BY source, y) - 1 AS ry2
         |  FROM d),
         |s AS (SELECT source, count(*) AS n_docs,
         |  CAST(sum(rx2) AS DOUBLE) AS sx, CAST(sum(ry2) AS DOUBLE) AS sy,
         |  CAST(sum(rx2 * ry2) AS DOUBLE) AS sxy,
         |  CAST(sum(rx2 * rx2) AS DOUBLE) AS sxx,
         |  CAST(sum(ry2 * ry2) AS DOUBLE) AS syy
         |  FROM r GROUP BY source)
         |SELECT source, n_docs,
         |  (n_docs * sxy - sx * sy) /
         |  (sqrt(n_docs * sxx - sx * sx) * sqrt(n_docs * syy - sy * sy)) AS spearman_rho
         |FROM s""".stripMargin,
    // support/confidence/lift as one-divide ratios of exact basket
    // counts, lift written as confidence/(n_b/U) in the same order
    "q185_assoc_rules" ->
      """WITH dt AS (SELECT DISTINCT user_id, event_type FROM events),
        |u AS (SELECT count(DISTINCT user_id) AS u FROM dt),
        |marg AS (SELECT event_type, count(*) AS n_t FROM dt GROUP BY event_type),
        |pairs AS (SELECT a.event_type AS antecedent, b.event_type AS consequent,
        |    count(*) AS n_both
        |  FROM dt a JOIN dt b ON a.user_id = b.user_id
        |    AND a.event_type <> b.event_type
        |  GROUP BY 1, 2)
        |SELECT antecedent, consequent, n_both,
        |  ma.n_t AS n_a, mb.n_t AS n_b,
        |  CAST(n_both AS DOUBLE) / CAST(u AS DOUBLE) AS support,
        |  CAST(n_both AS DOUBLE) / CAST(ma.n_t AS DOUBLE) AS confidence,
        |  (CAST(n_both AS DOUBLE) / CAST(ma.n_t AS DOUBLE))
        |    / (CAST(mb.n_t AS DOUBLE) / CAST(u AS DOUBLE)) AS lift
        |FROM pairs JOIN marg ma ON ma.event_type = antecedent
        |JOIN marg mb ON mb.event_type = consequent, u""".stripMargin,
    // the recursion folds the ordered prefix with the head as seed —
    // DuckDB list_reduce's implicit-init semantics, mirrored by the
    // Spark aggregate over the tail; only mult/add in the lambda
    "q186_ewma" ->
      """WITH d AS (SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS c
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
        |cal AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM b),
        |z AS (SELECT cal.day AS day, coalesce(d.c, 0) AS c
        |  FROM cal LEFT JOIN d ON d.day = cal.day),
        |arr AS (SELECT list(struct_pack(day := day, c := c) ORDER BY day) AS arr
        |  FROM z),
        |p AS (SELECT unnest(arr) AS e,
        |  unnest(generate_series(1, len(arr))) AS pos, arr FROM arr),
        |s AS (SELECT e.day AS day, e.c AS c,
        |  list_reduce(list_transform(arr[1:pos], x -> CAST(x.c AS DOUBLE)),
        |    (acc, x) -> 0.2 * x + (1.0 - 0.2) * acc) AS ewma
        |  FROM p)
        |SELECT day, c, ewma, CAST(c AS DOUBLE) - ewma AS residual FROM s""".stripMargin,
    // every probability is a ratio of exact integer counts; the
    // per-(doc, lang) log-likelihood folds in document order from a
    // 0.0 seed (q84's pinning); argmax tie-breaks (joint DESC, lang)
    "q187_naive_bayes" ->
      """WITH b AS (SELECT doc_id, lang, text,
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100 AS bucket
        | FROM documents),
        |tr AS (SELECT lang, text FROM b WHERE bucket < 80),
        |trtok AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM tr),
        |m AS (SELECT lang, token, count(*) AS ctl FROM trtok GROUP BY 1, 2),
        |cl AS (SELECT lang, sum(ctl) AS cl FROM m GROUP BY 1),
        |v AS (SELECT count(DISTINCT token) AS v FROM m),
        |pri AS (SELECT lang, count(*) AS nl FROM tr GROUP BY 1),
        |n AS (SELECT sum(nl) AS n FROM pri),
        |te AS (SELECT doc_id, lang AS true_lang, string_split(text, ' ') AS w
        |  FROM b WHERE bucket >= 90),
        |tok AS (SELECT doc_id, true_lang, unnest(range(0, len(w))) AS pos,
        |  unnest(w) AS token FROM te),
        |sc AS (SELECT t.doc_id, t.true_lang, t.pos, c.lang,
        |  ln(CAST(coalesce(x.ctl, 0) + 1 AS DOUBLE) / CAST(c.cl + v.v AS DOUBLE)) AS logp
        |  FROM tok t CROSS JOIN cl c CROSS JOIN v
        |  LEFT JOIN m x ON x.lang = c.lang AND x.token = t.token),
        |g AS (SELECT doc_id, true_lang, lang, count(*) AS n_tokens,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(logp ORDER BY pos)),
        |    (a, x) -> a + x) AS total_logp
        |  FROM sc GROUP BY 1, 2, 3),
        |j AS (SELECT g.doc_id, g.true_lang, g.lang, g.n_tokens,
        |  g.total_logp + ln(CAST(p.nl AS DOUBLE) / CAST(n.n AS DOUBLE)) AS joint
        |  FROM g JOIN pri p ON p.lang = g.lang CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |  ORDER BY joint DESC, lang) AS rk FROM j)
        |SELECT doc_id, true_lang, lang AS predicted, n_tokens, joint AS log_joint,
        |  CASE WHEN lang = true_lang THEN 1 ELSE 0 END AS is_correct
        |FROM r WHERE rk = 1""".stripMargin,
    // q173's deferred-divide centering on both series: the N² factors
    // cancel, numerator/denominators are HUGEINT-exact, and per lag
    // the only floating steps are two sqrts, one multiply, one divide
    "q189_ccf" ->
      """WITH e AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day FROM events
        |  WHERE event_type IN ('view', 'purchase')),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |cal AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM b),
        |cx AS (SELECT day, count(*) AS c FROM e WHERE event_type = 'view' GROUP BY 1),
        |cy AS (SELECT day, count(*) AS c FROM e WHERE event_type = 'purchase' GROUP BY 1),
        |sx AS (SELECT cal.day AS day, coalesce(cx.c, 0) AS c
        |  FROM cal LEFT JOIN cx ON cx.day = cal.day),
        |sy AS (SELECT cal.day AS day, coalesce(cy.c, 0) AS c
        |  FROM cal LEFT JOIN cy ON cy.day = cal.day),
        |tx AS (SELECT count(*) AS n, sum(c) AS s FROM sx),
        |ty AS (SELECT count(*) AS n, sum(c) AS s FROM sy),
        |x AS (SELECT day, CAST(tx.n AS HUGEINT) * c - CAST(tx.s AS HUGEINT) AS v
        |  FROM sx, tx),
        |y AS (SELECT day, CAST(ty.n AS HUGEINT) * c - CAST(ty.s AS HUGEINT) AS v
        |  FROM sy, ty),
        |dx AS (SELECT sum(v * v) AS dx FROM x),
        |dy AS (SELECT sum(v * v) AS dy, count(*) AS n_days FROM y),
        |lags AS (SELECT unnest(range(-7, 8)) AS lag),
        |num AS (SELECT lag, sum(x.v * y.v) AS num
        |  FROM x CROSS JOIN lags JOIN y ON y.day = x.day + lag
        |  GROUP BY lag)
        |SELECT lag, n_days, CAST(num AS DOUBLE)
        |  / (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE))) AS ccf
        |FROM num, dx, dy""".stripMargin,
    // each slope is one divide of exact integer differences; the
    // median is picked explicitly by rank (no engine median()),
    // and the even-count mean is one add+divide of two doubles
    "q190_theil_sen" ->
      """WITH d AS (SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS c
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
        |cal AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM b),
        |z AS (SELECT cal.day AS day, coalesce(d.c, 0) AS c
        |  FROM cal LEFT JOIN d ON d.day = cal.day),
        |nd AS (SELECT count(*) AS n_days FROM z),
        |p AS (SELECT CAST(bb.c - aa.c AS DOUBLE) / CAST(bb.day - aa.day AS DOUBLE) AS slope
        |  FROM z aa JOIN z bb ON bb.day > aa.day),
        |np AS (SELECT count(*) AS n_pairs FROM p),
        |r AS (SELECT slope, row_number() OVER (ORDER BY slope) AS rn FROM p),
        |mid AS (SELECT r.slope FROM r, np
        |  WHERE (n_pairs % 2 = 1 AND rn = (n_pairs + 1) // 2)
        |     OR (n_pairs % 2 = 0 AND (rn = n_pairs // 2 OR rn = n_pairs // 2 + 1))),
        |m AS (SELECT sum(slope) AS s, count(*) AS c FROM mid)
        |SELECT n_days, n_pairs, m.s / CAST(m.c AS DOUBLE) AS sen_slope
        |FROM nd, np, m""".stripMargin,
    // q100's decimal-revenue rule with the Q7 disjunctive nation pair;
    // the ship-year is integer extraction
    "q191_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3""".stripMargin,
    // α = 0.5 keeps every smoothed term exactly representable; the
    // δ and σ² chains run in ONE fixed operation order (two lns, one
    // subtract, two divides, one add, one sqrt), mirrored verbatim
    "q192_log_odds" ->
      """WITH st AS (SELECT source, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |c AS (SELECT source, token, count(*) AS y FROM st GROUP BY 1, 2),
        |tot AS (SELECT token, sum(y) AS yt FROM c GROUP BY 1),
        |ns AS (SELECT source, sum(y) AS ns FROM c GROUP BY 1),
        |nn AS (SELECT sum(y) AS n FROM c),
        |v AS (SELECT count(*) AS v FROM tot),
        |sc AS (SELECT c.source, c.token, c.y, tot.yt - c.y AS yr,
        |    ns.ns AS ns, nn.n - ns.ns AS nr
        |  FROM c JOIN tot USING (token) JOIN ns USING (source) CROSS JOIN nn
        |  WHERE c.y >= 5),
        |z AS (SELECT source, token, y,
        |  (ln((y + 0.5) / (ns + 0.5 * v - y - 0.5))
        |    - ln((yr + 0.5) / (nr + 0.5 * v - yr - 0.5)))
        |   / sqrt(1.0 / (y + 0.5) + 1.0 / (yr + 0.5)) AS z
        |  FROM sc CROSS JOIN v),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |  ORDER BY z DESC, token) AS rank FROM z)
        |SELECT source, rank, token, y AS y_source, z FROM r WHERE rank <= 10""".stripMargin,
    // q186's rule for floating recursions: both engines replay the
    // SAME scalar recursion with coefficients written as 1.0 - a (a
    // pre-simplified literal can differ in the last ulp) and the level
    // update duplicated in the trend line on BOTH sides.  The DuckDB
    // side is a RECURSIVE CTE, not a list_reduce: DuckDB 1.0's
    // list_reduce with a STRUCT accumulator mis-evaluates the lambda
    // (two fields holding the identical expression come back with
    // different values — reproduced on [364,339,333]); plain scalar
    // recursion evaluates correctly and bit-matches Spark's aggregate()
    "q193_holt" ->
      """WITH RECURSIVE d AS (SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS c
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
        |cal AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM b),
        |z AS (SELECT cal.day AS day, coalesce(d.c, 0) AS c
        |  FROM cal LEFT JOIN d ON d.day = cal.day),
        |va AS (SELECT list(day ORDER BY day) AS days,
        |  list(c ORDER BY day) AS cs,
        |  list(CAST(c AS DOUBLE) ORDER BY day) AS vals FROM z),
        |it(t, l, tr) AS (
        |  SELECT 1, vals[1], vals[2] - vals[1] FROM va
        |  UNION ALL
        |  SELECT t + 1,
        |    0.2 * vals[t + 1] + (1.0 - 0.2) * (l + tr),
        |    0.1 * (0.2 * vals[t + 1] + (1.0 - 0.2) * (l + tr) - l)
        |      + (1.0 - 0.1) * tr
        |  FROM it, va WHERE t < len(vals)),
        |s AS (SELECT cur.t AS t, prev.l AS pl, prev.tr AS pb,
        |    cur.l AS cl, cur.tr AS cb
        |  FROM it cur JOIN it prev ON prev.t = cur.t - 1)
        |SELECT days[t] AS day, cs[t] AS c, cl AS level, cb AS trend,
        |  pl + pb AS forecast,
        |  CAST(cs[t] AS DOUBLE) - (pl + pb) AS residual
        |FROM s, va""".stripMargin,
    // N_r, N, N1 are exact integers; r* is one cast-multiply-divide
    // chain and p0 a single divide; rows keep r <= 20 with N_{r+1}>0.
    // Counts are BIGRAM counts (q83's table) — the fixture vocabulary
    // is ~31 tokens so the unigram spectrum has no low-r mass at all
    "q194_good_turing" ->
      """WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
        |tok AS (SELECT unnest([array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]) AS token
        |  FROM w WHERE len(w) >= 2),
        |c AS (SELECT token, count(*) AS r FROM tok GROUP BY 1),
        |fof AS (SELECT r, count(*) AS n_r FROM c GROUP BY 1),
        |nt AS (SELECT sum(r) AS n FROM c),
        |n1 AS (SELECT coalesce(sum(CASE WHEN r = 1 THEN n_r END), 0) AS n_1 FROM fof),
        |nx AS (SELECT r - 1 AS r, n_r AS n_r1 FROM fof)
        |SELECT fof.r, fof.n_r, nx.n_r1,
        |  CAST(fof.r + 1 AS DOUBLE) * CAST(nx.n_r1 AS DOUBLE)
        |    / CAST(fof.n_r AS DOUBLE) AS r_star,
        |  CAST(n_1 AS DOUBLE) / CAST(n AS DOUBLE) AS p_unseen
        |FROM fof JOIN nx USING (r), nt, n1
        |WHERE fof.r <= 20""".stripMargin,
    // Q8's share: exact DECIMAL(18,4) sums on both sides, the divide
    // on doubles after both sums — never a decimal/decimal divide
    // (engines round those differently)
    "q195_tpch_q8" ->
      """SELECT year(o_orderdate) AS o_year,
        |  CAST(sum(CASE WHEN sn.n_name = 'NATION_1'
        |        THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS mkt_share,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total_volume,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,
    // Q10 top-20: revenue DESC with c_custkey tie-break makes the
    // LIMIT deterministic on both engines
    "q196_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name, c_acctbal,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY c_custkey, c_name, n_name, c_acctbal
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    // Q13: integer counts only — no float anywhere; the k=0 bin
    // comes from customers missing in the filtered orders frame
    "q197_tpch_q13" ->
      """WITH pc AS (SELECT o_custkey, count(*) AS c_count FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') GROUP BY 1)
        |SELECT coalesce(pc.c_count, 0) AS c_count, count(*) AS custdist
        |FROM customer LEFT JOIN pc ON c_custkey = o_custkey
        |GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    // Q14: numerator/denominator as exact DECIMAL sums; the single
    // 100*x/y divide on doubles after both
    "q198_tpch_q14" ->
      """SELECT
        |  100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS promo_pct,
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) END) AS DOUBLE)
        |    AS promo_revenue,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total_revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,
    // Q3: revenue is the house exact-DECIMAL sum; l_orderkey
    // tie-breaks the top-10
    "q199_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    // Q18: quantities are integral doubles, so the sum is exact in
    // any order and the BIGINT cast is lossless on both engines
    "q200_tpch_q18" ->
      """WITH big AS (SELECT l_orderkey,
        |    CAST(sum(l_quantity) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
        |  total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey""".stripMargin,
    // Q15: the max-match compares exact DECIMAL revenue (never the
    // double projection), so ties and the winner are bit-determined
    // on both engines; s_suppkey orders any ties
    "q201_tpch_q15" ->
      """WITH rev AS (SELECT l_suppkey,
        |    sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, s_nationkey,
        |  CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    // Q6: one exact DECIMAL sum over the fully-pushed-down predicate;
    // the double cast happens once, after the sum
    "q202_tpch_q6" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
        |    AS revenue_change,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    // Q2: the oracle keeps the canonical correlated-min form; the
    // derived cost (min unit price per part×supplier) is IEEE double
    // division + MIN — order-independent on both engines
    "q203_tpch_q2" ->
      """WITH nr AS (SELECT n_nationkey, n_name FROM nation
        |    JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'),
        |sup AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nr ON s_nationkey = n_nationkey),
        |ps AS (SELECT l_partkey, l_suppkey,
        |    min(l_extendedprice / l_quantity) AS supply_cost
        |  FROM lineitem GROUP BY 1, 2),
        |offers AS (SELECT p_partkey, p_name, s_acctbal, s_name, n_name, supply_cost
        |  FROM ps JOIN sup ON l_suppkey = s_suppkey
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_size <= 10 AND p_type = 'ECONOMY')
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
        |FROM offers o
        |WHERE supply_cost = (SELECT min(supply_cost) FROM offers i
        |  WHERE i.p_partkey = o.p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    // Q11: exact decimal part values; the fraction threshold compares
    // doubles both engines derive from the same exact sums
    "q204_tpch_q11" ->
      """WITH sup AS (SELECT s_suppkey FROM supplier
        |    JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3'),
        |v AS (SELECT l_partkey,
        |    sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS val
        |  FROM lineitem JOIN sup ON l_suppkey = s_suppkey GROUP BY 1)
        |SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
        |FROM v
        |WHERE CAST(val AS DOUBLE) > (SELECT CAST(sum(val) AS DOUBLE) FROM v) * 0.001
        |ORDER BY part_value DESC, l_partkey""".stripMargin,
    // Q16: all-integer output; negative s_acctbal stands in for the
    // complaints blacklist (no s_comment in this schema)
    "q205_tpch_q16" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        |  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
        |SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM pairs JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    // Q20: lifetime and windowed quantity as exact DECIMAL sums in one
    // grouped pass; the ½ comparison on doubles from those exact sums
    "q206_tpch_q20" ->
      """WITH fp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
        |sq AS (SELECT l_suppkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty,
        |    sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
        |          AND l_shipdate < TIMESTAMP '1997-01-01'
        |        THEN CAST(l_quantity AS DECIMAL(18,2))
        |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS win_qty
        |  FROM lineitem JOIN fp ON l_partkey = p_partkey
        |  GROUP BY l_suppkey, l_partkey)
        |SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (SELECT l_suppkey FROM sq
        |  WHERE CAST(total_qty AS DOUBLE) > 50
        |    AND CAST(win_qty AS DOUBLE) > 0.5 * CAST(total_qty AS DOUBLE))
        |ORDER BY s_suppkey""".stripMargin,
    // Q21: per-order distinct/late-distinct counts replace the
    // EXISTS/NOT EXISTS pair; numwait counts DISTINCT orders
    "q207_tpch_q21" ->
      """WITH lo AS (SELECT l_orderkey, l_suppkey,
        |    (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |per AS (SELECT l_orderkey, count(DISTINCT l_suppkey) AS nsupp,
        |    count(DISTINCT CASE WHEN late THEN l_suppkey END) AS nlate
        |  FROM lo GROUP BY 1),
        |sup AS (SELECT s_suppkey, s_name FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_9')
        |SELECT s_name, count(DISTINCT lo.l_orderkey) AS numwait
        |FROM lo JOIN per ON lo.l_orderkey = per.l_orderkey
        |JOIN sup ON lo.l_suppkey = s_suppkey
        |WHERE late AND nsupp > 1 AND nlate = 1
        |GROUP BY 1
        |ORDER BY numwait DESC, s_name""".stripMargin,
    // Q22: the average is exact-decimal sum / count cast once; the
    // balance compare is double > double, identical on both engines
    "q208_tpch_q22" ->
      """WITH cust AS (SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        |  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
        |ab AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*) AS avg_bal
        |  FROM cust WHERE c_acctbal > 0)
        |SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM cust, ab
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    // recall audits wrap each tier's oracle body unchanged in a
    // subquery (tierRecallSql), so index and audit share one SQL
    "q209_ivf_recall" -> tierRecallSql(ivfAnnSql, 6, 3),
    "q210_pq_recall" -> tierRecallSql(pqAnnSql, 10, 5),
    "q211_ivfpq_recall" -> tierRecallSql(ivfPqAnnSql, 10, 5),
    // Q4: all-integer counts; EXISTS keeps the per-order grain exact
    "q212_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // Q9: revenue and cost each cast DECIMAL(18,4) BEFORE the
    // subtract, summed exactly, one double cast at the end
    "q213_tpch_q9" ->
      """SELECT n_name, CAST(year(l_shipdate) AS INTEGER) AS o_year,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
        |    - CAST(0.6 * p_retailprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%gear%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2
        |ORDER BY n_name, o_year DESC""".stripMargin,
    // Q12: two conditional integer counts in one pass
    "q214_tpch_q12" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // Q17: per-part average = exact decimal sum / count, threshold on
    // doubles both engines derive identically; /7.0 once at the end
    "q215_tpch_q17" ->
      """WITH pa AS (SELECT l_partkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#1'
        |JOIN pa ON pa.l_partkey = lineitem.l_partkey
        |WHERE l_quantity < 0.5 * avg_qty""".stripMargin,
    // Q19: one disjunctive predicate post-join — the oracle keeps the
    // literal OR-of-ANDs form
    "q216_tpch_q19" ->
      """SELECT count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10 AND 35)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        |       AND l_quantity BETWEEN 20 AND 50)""".stripMargin,
    // power iteration: v0 = 1/sqrt(64) = 0.125 exactly; three
    // unrolled steps; w sums quantize-then-exact-sum; the final
    // loading/eigval come from the LAST step's w fold
    "q217_principal_component" -> principalComponentSql,
    // int8 audit: max|x| via 0.0-seeded greatest fold; the explicit
    // floor(x/scale + 0.5) half-up (round()'s tie rule differs across
    // engines); cross-row means quantize each term to femto-units
    // (floor(t·1e15 + 0.5)) and sum as exact DECIMAL(38,0) integers —
    // NOT DECIMAL(38,18) casts, which drift 1 ulp cross-engine
    "q218_quant_audit" ->
      """WITH q AS (SELECT label, vec_id, embedding,
        |  list_reduce(list_prepend(0.0e0,
        |    list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
        |    (a, b) -> greatest(a, b)) / 127.0 AS scale
        |  FROM embeddings),
        |m AS (SELECT label, vec_id, scale,
        |  CASE WHEN scale = 0.0 THEN 0.0 ELSE
        |    list_reduce(list_prepend(0.0e0, list_transform(embedding, x ->
        |      (CAST(x AS DOUBLE)
        |        - least(greatest(floor(CAST(x AS DOUBLE) / scale + 0.5), -127.0), 127.0) * scale)
        |      * (CAST(x AS DOUBLE)
        |        - least(greatest(floor(CAST(x AS DOUBLE) / scale + 0.5), -127.0), 127.0) * scale))),
        |      (a, b) -> a + b) / CAST(len(embedding) AS DOUBLE) END AS mse
        |  FROM q)
        |SELECT label, count(*) AS n_vecs,
        |  CAST(sum(CAST(floor(mse * 1.0e15 + 0.5) AS DECIMAL(38,0))) AS DOUBLE)
        |    / 1.0e15 / CAST(count(*) AS DOUBLE) AS mean_mse,
        |  max(mse) AS max_mse,
        |  CAST(sum(CAST(floor(scale * 1.0e15 + 0.5) AS DECIMAL(38,0))) AS DOUBLE)
        |    / 1.0e15 / CAST(count(*) AS DOUBLE) AS mean_scale
        |FROM m GROUP BY label
        |ORDER BY label""".stripMargin,
    // shard = md5 hex digits 17-20 mod 12 (independent of the
    // q63/q75/q98/q134 digit ranges); all-integer until the one skew
    // divide
    // anisotropy: the direction list re-assembles q217's output in d
    // order inside a subquery; projections fold with the 0.0 seed;
    // means follow the quantize-then-exact-sum rule at nano units
    "q220_source_anisotropy" ->
      s"""WITH pc AS (SELECT list(loading ORDER BY d) AS v FROM (
         |$principalComponentSql
         |) z),
         |pj AS (SELECT dd.source,
         |  list_reduce(list_prepend(0.0e0,
         |    [CAST(e.embedding[j] AS DOUBLE) * pc.v[j] FOR j IN range(1, 65)]),
         |    (a, b) -> a + b) AS proj
         |  FROM embeddings e
         |  JOIN documents dd ON e.vec_id = dd.doc_id
         |  CROSS JOIN pc)
         |SELECT source, count(*) AS n_vecs,
         |  CAST(sum(CAST(floor(proj * 1.0e9 + 0.5) AS DECIMAL(38,0))) AS DOUBLE)
         |    / 1.0e9 / CAST(count(*) AS DOUBLE) AS mean_proj,
         |  CAST(sum(CAST(floor(abs(proj) * 1.0e9 + 0.5) AS DECIMAL(38,0))) AS DOUBLE)
         |    / 1.0e9 / CAST(count(*) AS DOUBLE) AS mean_abs_proj
         |FROM pj GROUP BY source
         |ORDER BY source""".stripMargin,
    // fertility: exact integer sums, three final divides; strlen is
    // DuckDB's byte length (Spark octet_length)
    "q221_token_fertility" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  CAST(sum(strlen(text)) AS BIGINT) AS n_bytes,
        |  CAST(CAST(sum(length(text)) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS DOUBLE) AS chars_per_token,
        |  CAST(CAST(sum(strlen(text)) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS DOUBLE) AS bytes_per_token,
        |  CAST(CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS tokens_per_doc
        |FROM documents GROUP BY source
        |ORDER BY source""".stripMargin,
    // mixture execution: quotas are pure integer ceil-division; the
    // fill ranks md5 digits 21-24 (doc_id tiebreak); token sums exact
    "q225_mixture_sample" ->
      """WITH d AS (SELECT source, doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
        |per AS (SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM d GROUP BY source),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  count(*) AS n_sources FROM per),
        |pl AS (SELECT source, n_docs, n_tokens,
        |  CAST(floor(0.2 * CAST(total_tokens AS DOUBLE)
        |    / CAST(n_sources AS DOUBLE)) AS BIGINT) AS token_budget
        |  FROM per CROSS JOIN tot),
        |pq AS (SELECT *, (token_budget * n_docs + n_tokens - 1) // n_tokens
        |    AS quota_docs FROM pl),
        |pr AS (SELECT source, doc_id, n_tok, CAST(
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 21, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 22, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 23, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 24, 1)) - 1)) AS INTEGER) AS priority
        | FROM d),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |  ORDER BY priority, doc_id) AS rank FROM pr),
        |tk AS (SELECT r.source, count(*) AS taken_docs,
        |  CAST(sum(r.n_tok) AS BIGINT) AS taken_tokens
        |  FROM r JOIN pq ON r.source = pq.source AND r.rank <= pq.quota_docs
        |  GROUP BY r.source)
        |SELECT pq.source, pq.n_docs, pq.n_tokens, pq.token_budget, pq.quota_docs,
        |  tk.taken_docs, tk.taken_tokens,
        |  CAST(tk.taken_tokens AS DOUBLE) / CAST(pq.token_budget AS DOUBLE) AS budget_share
        |FROM pq JOIN tk ON pq.source = tk.source
        |ORDER BY pq.source""".stripMargin,
    // streaming tier (q226-q228): the oracle replays the BATCH
    // semantics the stream must converge to — epoch-hour windows,
    // gaps-and-islands sessions (new session only when the in-user
    // gap is STRICTLY > 30 min — Spark merges an event landing
    // exactly at the previous session's end, pinned by the
    // StreamBatchTwinSpec boundary test; end = last event + gap),
    // and plain aggregates the dedup-under-replay stream must
    // reproduce; all sums quantized-integer (order-independent)
    "q226_stream_windows" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS win_us, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 1.0e6 + 0.5) AS BIGINT)) AS BIGINT) AS value_units
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q227_stream_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us,
        |    CAST(floor(value * 1.0e6 + 0.5) AS BIGINT) AS v FROM events),
        |o AS (SELECT user_id, us, v,
        |  CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
        |       > 1800000000 THEN 1 ELSE 0 END AS brk FROM e),
        |g AS (SELECT user_id, us, v, sum(brk) OVER (PARTITION BY user_id
        |  ORDER BY us ROWS UNBOUNDED PRECEDING) AS grp FROM o),
        |s AS (SELECT user_id, min(us) AS session_start_us,
        |    max(us) + 1800000000 AS session_end_us,
        |    count(*) AS n_events, CAST(sum(v) AS BIGINT) AS value_units
        |  FROM g GROUP BY user_id, grp)
        |SELECT session_start_us, session_end_us, user_id, n_events, value_units
        |FROM s""".stripMargin,
    "q228_stream_dedup" ->
      """SELECT count(*) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum,
        |  CAST(sum(CAST(floor(value * 1.0e6 + 0.5) AS BIGINT)) AS BIGINT) AS value_units
        |FROM events""".stripMargin,
    "q229_stream_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id, v.event_id AS view_id,
        |  epoch_us(p.ts) AS p_us, epoch_us(v.ts) AS v_us
        |FROM events p JOIN events v
        |  ON p.event_type = 'purchase' AND v.event_type = 'view'
        |  AND v.user_id = p.user_id
        |  AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR""".stripMargin,
    // q230 ingest: the sink must hold exactly the global
    // min-id-per-fingerprint survivors (q20's fp expression) — the
    // oracle states the whole streamed store/dedup/sink pipeline as
    // one GROUP BY over the fixture
    "q230_stream_ingest" ->
      """WITH d AS (SELECT doc_id, source,
        |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
        |  FROM documents),
        |s AS (SELECT fp, min(doc_id) AS keeper FROM d GROUP BY fp),
        |k AS (SELECT d.source, d.doc_id FROM d
        |  JOIN s ON d.fp = s.fp AND d.doc_id = s.keeper)
        |SELECT source, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM k GROUP BY source""".stripMargin,
    // cell-bounded pairs share q54's trained-cell CTEs verbatim; the
    // recall audit wraps the exact and cell bodies unchanged
    "q223_cell_pairs" -> cellPairsSql,
    "q224_pair_recall" ->
      s"""WITH ex AS (SELECT vec_a, vec_b FROM (
         |$thresholdPairsSql
         |) x),
         |fnd AS (SELECT vec_a, vec_b FROM (
         |$cellPairsSql
         |) y),
         |j AS (SELECT ex.vec_a,
         |  CASE WHEN fnd.vec_a IS NULL THEN 0 ELSE 1 END AS hit
         |  FROM ex LEFT JOIN fnd
         |    ON ex.vec_a = fnd.vec_a AND ex.vec_b = fnd.vec_b)
         |SELECT count(*) AS n_exact, CAST(sum(hit) AS BIGINT) AS n_found,
         |  CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS pair_recall
         |FROM j""".stripMargin,
    // TWAP: hold durations are exact integer micros from the
    // (us, event_id)-ordered lead (last event holds to midnight);
    // DECIMAL(18,2)-value × BIGINT-micros products sum exactly; the
    // one divide by the exact integer span happens on doubles
    "q222_twap" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    epoch_us(ts) // 86400000000 AS day, value FROM events),
        |h AS (SELECT user_id, day, value,
        |  coalesce(lead(us) OVER (PARTITION BY user_id, day
        |      ORDER BY us, event_id),
        |    (day + 1) * 86400000000) - us AS hold_us
        |  FROM e)
        |SELECT user_id, day,
        |  CAST(DATE '1970-01-01' + CAST(day AS INTEGER) AS VARCHAR) AS day_date,
        |  count(*) AS n_events,
        |  CAST(sum(hold_us) AS BIGINT) AS span_us,
        |  CAST(sum(CAST(value AS DECIMAL(12,2)) * hold_us) AS DOUBLE)
        |    / CAST(CAST(sum(hold_us) AS BIGINT) AS DOUBLE) AS twap
        |FROM h GROUP BY user_id, day
        |ORDER BY user_id, day""".stripMargin,
    "q219_shard_balance" ->
      """WITH pr AS (SELECT doc_id, n_chars, CAST(
        |  ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 17, 1)) - 1) * 4096
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 18, 1)) - 1) * 256
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 19, 1)) - 1) * 16
        | + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 20, 1)) - 1)) % 12 AS INTEGER) AS shard
        | FROM documents),
        |s AS (SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
        |  FROM pr GROUP BY 1),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total_docs FROM s)
        |SELECT shard, n_docs, n_chars,
        |  CAST(n_docs AS DOUBLE) / (CAST(total_docs AS DOUBLE) / 12.0) AS doc_skew
        |FROM s, t
        |ORDER BY shard""".stripMargin,
    // discount terms ln(2)/ln(rank+1); DCG and ideal-DCG fold in rank
    // order from a 0.0 seed, the per-label mean in probe order (q165)
    "q188_ndcg" ->
      s"""WITH el AS (SELECT vec_id, label, embedding,
         |  sqrt(list_reduce(list_transform(embedding,
         |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
         |  FROM embeddings),
         |pairs AS (SELECT p.vec_id AS probe_id, p.label AS probe_label,
         |    c.vec_id AS neighbor_id, c.label AS n_label,
         |    ${dotSql("p.embedding", "c.embedding")} / (p.nrm * c.nrm) AS cos
         |  FROM el p JOIN el c ON p.vec_id < 50 AND p.vec_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
         |  ORDER BY cos DESC, neighbor_id) AS rank FROM pairs),
         |h AS (SELECT probe_id,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(list(rank ORDER BY rank),
         |      x -> ln(CAST(2.0 AS DOUBLE)) / ln(CAST(x + 1 AS DOUBLE)))),
         |    (a, b) -> a + b) AS dcg
         |  FROM r WHERE rank <= 20 AND n_label = probe_label GROUP BY probe_id),
         |ls AS (SELECT label, count(*) AS n_label FROM embeddings GROUP BY label),
         |pr AS (SELECT vec_id AS probe_id, label AS probe_label
         |  FROM embeddings WHERE vec_id < 50),
         |pp AS (SELECT pr.probe_id, pr.probe_label,
         |  least(ls.n_label - 1, 20) AS m, coalesce(h.dcg, 0.0) AS dcg
         |  FROM pr JOIN ls ON ls.label = pr.probe_label
         |  LEFT JOIN h ON h.probe_id = pr.probe_id),
         |nd AS (SELECT probe_id, probe_label, dcg,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(range(1, m + 1),
         |      i -> ln(CAST(2.0 AS DOUBLE)) / ln(CAST(i + 1 AS DOUBLE)))),
         |    (a, b) -> a + b) AS idcg
         |  FROM pp),
         |f AS (SELECT probe_id, probe_label,
         |  CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END AS ndcg FROM nd)
         |SELECT probe_label, count(*) AS n_probes,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(ndcg ORDER BY probe_id)),
         |    (a, b) -> a + b) / CAST(count(*) AS DOUBLE) AS mean_ndcg
         |FROM f GROUP BY probe_label""".stripMargin,
    // D_t = N·P_t − t·S stays integral (the deferred-/N trick), so
    // the argmax of |D| is an integer sort; one divide at the end
    "q183_cusum" ->
      """WITH d AS (SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS c
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
        |cal AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM b),
        |z AS (SELECT cal.day AS day, coalesce(d.c, 0) AS c
        |  FROM cal LEFT JOIN d ON d.day = cal.day),
        |t AS (SELECT count(*) AS n, sum(c) AS s FROM z),
        |p AS (SELECT day,
        |  row_number() OVER (ORDER BY day) AS t_idx,
        |  sum(c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS pf
        |  FROM z),
        |dv AS (SELECT day, n,
        |  CAST(n AS HUGEINT) * pf - CAST(t_idx AS HUGEINT) * s AS dev
        |  FROM p, t)
        |SELECT n AS n_days, day AS change_day,
        |  CAST(dev AS DOUBLE) / CAST(n AS DOUBLE) AS cusum_dev,
        |  CASE WHEN dev > 0 THEN 1 WHEN dev < 0 THEN -1 ELSE 0 END AS direction
        |FROM dv ORDER BY abs(dev) DESC, day ASC LIMIT 1""".stripMargin,
    // integer midpoint split ((d0+d1+1)//2); one conditional-count
    // agg; p-hat/z written in the Spark operation order
    "q184_prop_test" ->
      """WITH e AS (SELECT epoch_ms(ts) // 86400000 AS day, event_type FROM events),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |g AS (SELECT
        |  CAST(sum(CASE WHEN day < (d0 + d1 + 1) // 2 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |  CAST(sum(CASE WHEN day < (d0 + d1 + 1) // 2
        |    AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x1,
        |  CAST(sum(CASE WHEN day >= (d0 + d1 + 1) // 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |  CAST(sum(CASE WHEN day >= (d0 + d1 + 1) // 2
        |    AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x2
        |  FROM e, b)
        |SELECT n1, x1, n2, x2,
        |  CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
        |  CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2,
        |  (CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |    - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))
        |  / sqrt((CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
        |    * (1.0 - CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
        |    * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))) AS z_stat
        |FROM g""".stripMargin,
    // graft_jw is built to DuckDB's jaro_winkler_similarity contract
    // (fuzzed bit-identical; see StringExpressions scaladoc), so the
    // similarity column hash-matches; winner = rank-1 of the same
    // (jw DESC, name ASC) total order
    "q181_name_reconcile" ->
      """WITH names AS (SELECT p_name, count(*) AS n_parts FROM part GROUP BY p_name),
        |scored AS (SELECT a.p_name AS name_a, a.n_parts AS n_a,
        |    b.p_name AS name_b, b.n_parts AS n_b,
        |    jaro_winkler_similarity(a.p_name, b.p_name) AS jw,
        |    row_number() OVER (PARTITION BY a.p_name
        |      ORDER BY jaro_winkler_similarity(a.p_name, b.p_name) DESC,
        |        b.p_name ASC) AS rn
        |  FROM names a JOIN names b ON a.p_name <> b.p_name)
        |SELECT name_a, n_a, name_b AS best_match, n_b AS n_best, jw
        |FROM scored WHERE rn = 1""".stripMargin,
    // weekday by integer arithmetic only ((day+3) mod 7, 0=Monday);
    // the two-divide chains written in the Spark order
    "q182_weekday_index" ->
      """WITH d AS (SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS c
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
        |cal AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM b),
        |z AS (SELECT (cal.day + 3) % 7 AS dow, coalesce(d.c, 0) AS c
        |  FROM cal LEFT JOIN d ON d.day = cal.day),
        |t AS (SELECT count(*) AS n_all, sum(c) AS s_all FROM z),
        |g AS (SELECT dow, count(*) AS n_days, CAST(sum(c) AS BIGINT) AS n_events
        |  FROM z GROUP BY dow)
        |SELECT dow, n_days, n_events,
        |  CAST(n_events AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean_count,
        |  (CAST(n_events AS DOUBLE) / CAST(n_days AS DOUBLE))
        |    / (CAST(s_all AS DOUBLE) / CAST(n_all AS DOUBLE)) AS seasonal_index
        |FROM g, t""".stripMargin,
    // patterns restricted to the Java-regex/RE2 common subset
    // (literal classes + counted quantifiers) so match sets agree;
    // len(regexp_extract_all) mirrors Spark's size() count
    "q179_pii_scan" ->
      """WITH c AS (SELECT source,
        |  len(regexp_extract_all(text, '[a-z0-9]+@[a-z0-9]+\.[a-z]+')) AS em,
        |  len(regexp_extract_all(text, 'http[s]?://[a-z0-9./]+')) AS ur,
        |  len(regexp_extract_all(text, '[0-9]{7,}')) AS dg
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN em > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_email,
        |  CAST(sum(em) AS BIGINT) AS hits_email,
        |  CAST(sum(CASE WHEN ur > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_url,
        |  CAST(sum(ur) AS BIGINT) AS hits_url,
        |  CAST(sum(CASE WHEN dg > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_digits,
        |  CAST(sum(dg) AS BIGINT) AS hits_digits
        |FROM c GROUP BY source""".stripMargin,
    // the 3σ test as a pure integer comparison — (N·x−S)² vs
    // 9(N·Q−S²) in HUGEINT — so boundary events classify identically
    // by construction; mean converts exact sums with two divides
    "q180_value_outliers" ->
      """WITH e AS (SELECT event_type,
        |  CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS x FROM events),
        |m AS (SELECT event_type, count(*) AS n,
        |  sum(CAST(x AS HUGEINT)) AS s, sum(CAST(x AS HUGEINT) * x) AS q
        |  FROM e GROUP BY event_type)
        |SELECT e.event_type, max(n) AS n_events,
        |  CAST(sum(CASE WHEN (CAST(n AS HUGEINT) * x - s) * (CAST(n AS HUGEINT) * x - s)
        |      > 9 * (CAST(n AS HUGEINT) * q - s * s) THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  CAST(sum(CASE WHEN (CAST(n AS HUGEINT) * x - s) * (CAST(n AS HUGEINT) * x - s)
        |      > 9 * (CAST(n AS HUGEINT) * q - s * s) THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(max(n) AS DOUBLE) AS outlier_rate,
        |  (CAST(max(s) AS DOUBLE) / CAST(max(n) AS DOUBLE)) / 1000000.0 AS mean_value
        |FROM e JOIN m ON m.event_type = e.event_type
        |GROUP BY e.event_type""".stripMargin,
    // per-column null/distinct counts via UNION ALL — integer counts
    // only, no value formatting crosses the engine boundary
    "q177_column_profile" ->
      """SELECT 'o_orderkey' AS column_name,
        |  count(*) - count(o_orderkey) AS n_nulls,
        |  count(DISTINCT o_orderkey) AS n_distinct FROM orders
        |UNION ALL SELECT 'o_custkey', count(*) - count(o_custkey),
        |  count(DISTINCT o_custkey) FROM orders
        |UNION ALL SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
        |  count(DISTINCT o_orderstatus) FROM orders
        |UNION ALL SELECT 'o_totalprice', count(*) - count(o_totalprice),
        |  count(DISTINCT o_totalprice) FROM orders
        |UNION ALL SELECT 'o_orderdate', count(*) - count(o_orderdate),
        |  count(DISTINCT o_orderdate) FROM orders
        |UNION ALL SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
        |  count(DISTINCT o_orderpriority) FROM orders""".stripMargin,
    // FK orphans as NOT EXISTS (the anti-join), date violations as
    // one keyed join + predicate — all exact integer counts
    "q178_integrity" ->
      """SELECT 'lineitem_without_order' AS check_name,
        |  count(*) AS n_violations FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL SELECT 'order_without_customer', count(*) FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |UNION ALL SELECT 'order_without_lineitem', count(*) FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |UNION ALL SELECT 'ship_before_order', count(*)
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  WHERE l.l_shipdate < o.o_orderdate""".stripMargin,
    // melt as UNION ALL over the aggregated month frame — metric
    // names and the value arithmetic (exact decimal sum → one cast,
    // one divide for avg) mirror the Spark Expand branches
    "q175_unpivot" ->
      """WITH m AS (SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS order_month,
        |  count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
        |  max(o_totalprice) AS mx
        |  FROM orders GROUP BY 1)
        |SELECT order_month, 'n_orders' AS metric, CAST(n AS DOUBLE) AS value FROM m
        |UNION ALL SELECT order_month, 'revenue', rev FROM m
        |UNION ALL SELECT order_month, 'avg_price', rev / CAST(n AS DOUBLE) FROM m
        |UNION ALL SELECT order_month, 'max_price', mx FROM m""".stripMargin,
    // HHI = Σc²/T² — both HUGEINT-exact, ONE divide each for hhi /
    // eff_vocab / top_share; log-free by design (the q128 ulp rule)
    "q176_token_hhi" ->
      """WITH cs AS (SELECT source, token, count(*) AS c FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
        |  GROUP BY source, token)
        |SELECT source, count(*) AS vocab,
        |  CAST(sum(c) AS BIGINT) AS total_tokens,
        |  CAST(sum(c * c) AS DOUBLE) / CAST(sum(c) * sum(c) AS DOUBLE) AS hhi,
        |  1.0 / (CAST(sum(c * c) AS DOUBLE) / CAST(sum(c) * sum(c) AS DOUBLE)) AS eff_vocab,
        |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_share
        |FROM cs GROUP BY source""".stripMargin,
    // X_t = N·c_t − S keeps the ACF a ratio of exact integers (the
    // N² factors cancel); zero-filled calendar via range(); the lag
    // fan-out is the same day+k equi-join as the Spark plan
    "q173_autocorr" ->
      """WITH d AS (SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS c
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
        |cal AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM b),
        |z AS (SELECT cal.day AS day, coalesce(d.c, 0) AS c
        |  FROM cal LEFT JOIN d ON d.day = cal.day),
        |t AS (SELECT count(*) AS n, sum(c) AS s FROM z),
        |x AS (SELECT day, CAST(n AS HUGEINT) * c - CAST(s AS HUGEINT) AS x
        |  FROM z, t),
        |den AS (SELECT sum(x * x) AS den, count(*) AS n_days FROM x),
        |lags AS (SELECT unnest(range(1, 8)) AS lag),
        |num AS (SELECT lag, sum(a.x * bb.x) AS num
        |  FROM x a CROSS JOIN lags JOIN x bb ON bb.day = a.day + lag
        |  GROUP BY lag)
        |SELECT lag, n_days, CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS acf
        |FROM num, den""".stripMargin,
    // S and both variance terms are exact integer sums over the
    // calendar-bounded pair scan; one /18.0 and one sqrt at the end,
    // continuity-corrected z as the identical CASE
    "q174_mann_kendall" ->
      """WITH d AS (SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS c
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
        |cal AS (SELECT unnest(range(d0, d1 + 1)) AS day FROM b),
        |z AS (SELECT cal.day AS day, coalesce(d.c, 0) AS c
        |  FROM cal LEFT JOIN d ON d.day = cal.day),
        |s AS (SELECT CAST(sum(CASE WHEN bb.c > a.c THEN 1
        |  WHEN bb.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |  FROM z a JOIN z bb ON bb.day > a.day),
        |ties AS (SELECT CAST(coalesce(sum(CASE WHEN t > 1
        |  THEN t * (t - 1) * (2 * t + 5) END), 0) AS BIGINT) AS tie_term
        |  FROM (SELECT c, count(*) AS t FROM z GROUP BY c)),
        |n AS (SELECT count(*) AS n_days FROM z)
        |SELECT n_days, s_stat,
        |  CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS DOUBLE)
        |    / 18.0 AS var_s,
        |  CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
        |    / sqrt(CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS DOUBLE) / 18.0)
        |  WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
        |    / sqrt(CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS DOUBLE) / 18.0)
        |  ELSE 0.0 END AS z_stat
        |FROM s, ties, n""".stripMargin,
    // cross-group Σ(Σx)²/n_g folds in source order (the q119/q163
    // ordered-fold rule); every moment is HUGEINT-exact until ONE
    // cast per term, formulas written in the Spark operation order
    "q171_anova" ->
      """WITH cells AS (SELECT source, count(*) AS ng,
        |  sum(n_chars) AS sg, sum(n_chars * n_chars) AS qg
        |  FROM documents GROUP BY source),
        |tot AS (SELECT count(*) AS k, sum(ng) AS n,
        |  sum(sg) AS s, sum(qg) AS q FROM cells),
        |f AS (SELECT k, n, s, q,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(CAST(sg * sg AS DOUBLE) / CAST(ng AS DOUBLE) ORDER BY source)),
        |    (a, b) -> a + b) AS fold
        |  FROM cells, tot GROUP BY k, n, s, q)
        |SELECT k AS n_sources, CAST(n AS BIGINT) AS n_docs,
        |  fold - CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE) AS ss_between,
        |  CAST(q AS DOUBLE) - fold AS ss_within,
        |  ((fold - CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
        |    / ((CAST(q AS DOUBLE) - fold) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) AS f_stat,
        |  (fold - CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(q AS DOUBLE) - CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE)) AS eta_sq
        |FROM f""".stripMargin,
    // deterministic pair pick (n DESC, source ASC); v/n subterms
    // spelled identically everywhere so both engines share one IEEE
    // sequence for t, Welch-Satterthwaite df, and Cohen's d
    "q172_welch" ->
      """WITH cells AS (SELECT source, count(*) AS ng,
        |  sum(n_chars) AS sg, sum(n_chars * n_chars) AS qg
        |  FROM documents GROUP BY source),
        |r AS (SELECT *, row_number() OVER (ORDER BY ng DESC, source ASC) AS rn
        |  FROM cells),
        |p AS (SELECT
        |  max(CASE WHEN rn = 1 THEN source END) AS source_a,
        |  max(CASE WHEN rn = 2 THEN source END) AS source_b,
        |  max(CASE WHEN rn = 1 THEN ng END) AS na,
        |  max(CASE WHEN rn = 2 THEN ng END) AS nb,
        |  max(CASE WHEN rn = 1 THEN sg END) AS sa,
        |  max(CASE WHEN rn = 2 THEN sg END) AS sb,
        |  max(CASE WHEN rn = 1 THEN qg END) AS qa,
        |  max(CASE WHEN rn = 2 THEN qg END) AS qb
        |  FROM r WHERE rn <= 2),
        |v AS (SELECT source_a, source_b, na, nb,
        |  CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
        |  CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
        |  CAST(na * qa - sa * sa AS DOUBLE) / CAST(na * (na - 1) AS DOUBLE) AS va,
        |  CAST(nb * qb - sb * sb AS DOUBLE) / CAST(nb * (nb - 1) AS DOUBLE) AS vb
        |  FROM p)
        |SELECT source_a, source_b,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  ma AS mean_a, mb AS mean_b,
        |  (ma - mb) / sqrt(va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE)) AS t_stat,
        |  ((va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE))
        |    * (va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE)))
        |    / ((va / CAST(na AS DOUBLE)) * (va / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0)
        |      + (vb / CAST(nb AS DOUBLE)) * (vb / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0)) AS df_welch,
        |  (ma - mb) / sqrt(((CAST(na AS DOUBLE) - 1.0) * va
        |    + (CAST(nb AS DOUBLE) - 1.0) * vb)
        |    / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 2.0)) AS cohen_d
        |FROM v""".stripMargin,
    // q118's integer moments reused for the fit: slope/intercept/R²
    // written in the same operation order as the Spark select so both
    // engines perform the identical IEEE sequence
    "q170_grouped_ols" ->
      s"""WITH d AS (SELECT source, n_chars AS x,
         |  CAST(floor(($qualitySql) * 1000000.0 + 0.5) AS BIGINT) AS y
         |  FROM documents),
         |s AS (SELECT source, count(*) AS n_docs,
         |  CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         |  CAST(sum(x * y) AS DOUBLE) AS sxy,
         |  CAST(sum(x * x) AS DOUBLE) AS sxx,
         |  CAST(sum(y * y) AS DOUBLE) AS syy
         |  FROM d GROUP BY source)
         |SELECT source, n_docs,
         |  (n_docs * sxy - sx * sy) / (n_docs * sxx - sx * sx) AS slope,
         |  (sy - ((n_docs * sxy - sx * sy) / (n_docs * sxx - sx * sx)) * sx)
         |    / n_docs AS intercept,
         |  ((n_docs * sxy - sx * sy) * (n_docs * sxy - sx * sy)) /
         |  ((n_docs * sxx - sx * sx) * (n_docs * syy - sy * sy)) AS r2
         |FROM s""".stripMargin,
    // exact quartile cut values at ranks ceil(n/4)/ceil(n/2)/
    // ceil(3n/4), value-threshold scoring (ties share a score),
    // DECIMAL(18,2) money sums per the q09 rule
    "q154_rfm" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us,
        |  CAST(value AS DECIMAL(18,2)) AS v FROM events),
        |mx AS (SELECT max(us) AS ref FROM e),
        |u AS (SELECT user_id, max(us) AS last_us, count(*) AS f, sum(v) AS m
        |  FROM e GROUP BY user_id),
        |r AS (SELECT user_id, (ref - last_us) // 86400000000 AS r_days, f, m
        |  FROM u, mx),
        |rr AS (SELECT *,
        |  row_number() OVER (ORDER BY r_days, user_id) AS rn_r,
        |  row_number() OVER (ORDER BY f, user_id) AS rn_f,
        |  row_number() OVER (ORDER BY m, user_id) AS rn_m,
        |  count(*) OVER () AS n FROM r),
        |q AS (SELECT
        |  max(CASE WHEN rn_r = ceil(0.25 * n) THEN r_days END) AS r_q1,
        |  max(CASE WHEN rn_r = ceil(0.5 * n) THEN r_days END) AS r_q2,
        |  max(CASE WHEN rn_r = ceil(0.75 * n) THEN r_days END) AS r_q3,
        |  max(CASE WHEN rn_f = ceil(0.25 * n) THEN f END) AS f_q1,
        |  max(CASE WHEN rn_f = ceil(0.5 * n) THEN f END) AS f_q2,
        |  max(CASE WHEN rn_f = ceil(0.75 * n) THEN f END) AS f_q3,
        |  max(CASE WHEN rn_m = ceil(0.25 * n) THEN m END) AS m_q1,
        |  max(CASE WHEN rn_m = ceil(0.5 * n) THEN m END) AS m_q2,
        |  max(CASE WHEN rn_m = ceil(0.75 * n) THEN m END) AS m_q3
        |  FROM rr),
        |s AS (SELECT r.user_id, r.m,
        |  1 + (CASE WHEN r.r_days > q.r_q1 THEN 1 ELSE 0 END)
        |    + (CASE WHEN r.r_days > q.r_q2 THEN 1 ELSE 0 END)
        |    + (CASE WHEN r.r_days > q.r_q3 THEN 1 ELSE 0 END) AS r_score,
        |  1 + (CASE WHEN r.f > q.f_q1 THEN 1 ELSE 0 END)
        |    + (CASE WHEN r.f > q.f_q2 THEN 1 ELSE 0 END)
        |    + (CASE WHEN r.f > q.f_q3 THEN 1 ELSE 0 END) AS f_score,
        |  1 + (CASE WHEN r.m > q.m_q1 THEN 1 ELSE 0 END)
        |    + (CASE WHEN r.m > q.m_q2 THEN 1 ELSE 0 END)
        |    + (CASE WHEN r.m > q.m_q3 THEN 1 ELSE 0 END) AS m_score
        |  FROM r, q)
        |SELECT r_score, f_score, m_score, count(*) AS n_users,
        |  CAST(sum(m) AS DOUBLE) AS total_monetary
        |FROM s GROUP BY r_score, f_score, m_score""".stripMargin,
    // format tier (q231-q233): the Spark side writes the fixture
    // through ORC / CSV / date-partitioned parquet and aggregates the
    // READ-BACK; the oracle states the same aggregate over the
    // original parquet — value equality certifies the round-trip
    // lossless for every column type involved
    "q231_orc_roundtrip" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    // the CSV write normalizes price to DECIMAL(18,2) BEFORE the text
    // round-trip (fixed-point string, exact re-parse); the oracle
    // applies the identical normalization
    "q232_csv_roundtrip" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  strftime(max(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS last_order_date
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
        |GROUP BY o_orderpriority""".stripMargin,
    // the Spark side prunes day=… partition DIRECTORIES; the oracle
    // filters the same UTC calendar days out of the original events
    "q233_partition_prune" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT CAST(ts AS DATE)) AS n_days,
        |  CAST(sum(CAST(floor(value * 1.0e6 + 0.5) AS BIGINT)) AS BIGINT) AS value_units
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
        |GROUP BY event_type""".stripMargin,
    // q234: five exact moment sums (integer x from a FIXED origin,
    // 10^6-quantized y, DECIMAL(38,0) accumulation), then the
    // slope/intercept doubles in the identical literal operation order
    "q234_ols_trend" ->
      """WITH e AS (SELECT event_type,
        |    (epoch_us(ts) - 1704067200000000)
        |      // 3600000000 AS x,
        |    CAST(floor(value * 1.0e6 + 0.5) AS BIGINT) AS y
        |  FROM events),
        |s AS (SELECT event_type, count(*) AS n,
        |    sum(CAST(x AS DECIMAL(38,0))) AS sx,
        |    sum(CAST(y AS DECIMAL(38,0))) AS sy,
        |    sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
        |    sum(CAST(x * y AS DECIMAL(38,0))) AS sxy
        |  FROM e GROUP BY event_type)
        |SELECT event_type, n AS n_events,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    AS slope_units_per_hour,
        |  (CAST(sy AS DOUBLE)
        |    - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept_units
        |FROM s""".stripMargin,
    // q235: the oracle replays base/delta partials and the monoid
    // merge, so the flag is recomputed — not assumed — on both sides
    "q235_incr_merge" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us,
        |    CAST(floor(value * 1.0e6 + 0.5) AS BIGINT) AS units FROM events),
        |b AS (SELECT event_type, count(*) AS n_base, CAST(sum(units) AS BIGINT) AS u_base
        |  FROM e WHERE us < 1706572800000000 GROUP BY event_type),
        |d AS (SELECT event_type, count(*) AS n_delta, CAST(sum(units) AS BIGINT) AS u_delta
        |  FROM e WHERE us >= 1706572800000000 GROUP BY event_type),
        |f AS (SELECT event_type, count(*) AS n_full, CAST(sum(units) AS BIGINT) AS u_full
        |  FROM e GROUP BY event_type),
        |m AS (SELECT COALESCE(b.event_type, d.event_type) AS event_type,
        |    COALESCE(n_base, 0) AS n_base, COALESCE(n_delta, 0) AS n_delta,
        |    COALESCE(u_base, 0) AS u_base, COALESCE(u_delta, 0) AS u_delta
        |  FROM b FULL OUTER JOIN d ON b.event_type = d.event_type)
        |SELECT f.event_type, m.n_base, m.n_delta, f.n_full AS n_total,
        |  f.u_full AS value_units,
        |  CASE WHEN m.n_base + m.n_delta = f.n_full
        |    AND m.u_base + m.u_delta = f.u_full THEN 1 ELSE 0 END AS merge_matches_full
        |FROM f LEFT JOIN m ON f.event_type = m.event_type""".stripMargin,
    // q236: gaps-and-islands SCD2 — run breaks on event_type change per
    // user, runs close at the next run's start, open rows carry the
    // 9999-12-31 high-date sentinel
    "q236_scd2" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
        |  FROM events),
        |o AS (SELECT *, CASE WHEN lag(event_type) OVER
        |    (PARTITION BY user_id ORDER BY us, event_id) IS DISTINCT FROM event_type
        |    THEN 1 ELSE 0 END AS brk FROM e),
        |g AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id FROM o),
        |r AS (SELECT user_id, run_id, max(event_type) AS event_type,
        |    min(us) AS valid_from_us, count(*) AS n_events
        |  FROM g GROUP BY user_id, run_id)
        |SELECT user_id, event_type, valid_from_us,
        |  COALESCE(lead(valid_from_us) OVER (PARTITION BY user_id
        |    ORDER BY valid_from_us, run_id), 253402300799000000) AS valid_to_us,
        |  n_events
        |FROM r""".stripMargin,
    // q237: the oracle is the plain join+aggregate — the bucketed
    // layout changes the PLAN (zero-exchange join, pinned), never the
    // values
    "q237_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    // q238: the oracle states the per-source cumulative axis as one
    // plain window (the Spark side's two-pass prefix sum computes the
    // identical cum); integer boundary-crossing, k = 50 strata
    "q238_pps_sample" ->
      """WITH d AS (SELECT source, doc_id, CAST(n_chars AS BIGINT) AS w
        |  FROM documents),
        |c AS (SELECT source, doc_id, w,
        |    CAST(sum(w) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(sum(w) OVER (PARTITION BY source) AS BIGINT) AS wt
        |  FROM d)
        |SELECT source, doc_id, w AS n_chars, cum AS cum_chars,
        |  (cum * 50) // wt - ((cum - w) * 50) // wt AS strata_covered
        |FROM c
        |WHERE (cum * 50) // wt > ((cum - w) * 50) // wt""".stripMargin,
    // q239: the cross-batch keyed state must converge to the plain
    // per-user aggregate of the whole fixture
    "q239_stream_state" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 1.0e6 + 0.5) AS BIGINT)) AS BIGINT) AS value_units
        |FROM events GROUP BY user_id""".stripMargin,
    // q240: nulls synthesized the same way (k < 10 → NULL); avg is
    // written as the explicit sum/count(nonnull) divide; the ordered
    // head string spells NULLS FIRST because the engines' DEFAULTS
    // disagree (Spark ASC=NULLS FIRST, DuckDB ASC=NULLS LAST)
    "q240_null_semantics" ->
      """WITH e AS (SELECT event_type, event_id,
        |    CAST(NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1), '') AS BIGINT) AS k
        |  FROM events),
        |n AS (SELECT event_type, event_id,
        |    CASE WHEN k < 10 THEN NULL ELSE k END AS nk FROM e),
        |r AS (SELECT event_type, nk, row_number() OVER (PARTITION BY event_type
        |    ORDER BY nk ASC NULLS FIRST, event_id ASC) AS rn FROM n),
        |h AS (SELECT event_type,
        |    string_agg(CASE WHEN nk IS NULL THEN 'NULL' ELSE CAST(nk AS VARCHAR) END,
        |      ',' ORDER BY rn) AS head_nulls_first
        |  FROM r WHERE rn <= 3 GROUP BY event_type),
        |a AS (SELECT event_type, count(*) AS n_rows, count(nk) AS n_nonnull,
        |    count(DISTINCT nk) AS n_distinct, CAST(sum(nk) AS BIGINT) AS sum_nk,
        |    CAST(sum(nk) AS DOUBLE) / count(nk) AS avg_nk
        |  FROM n GROUP BY event_type)
        |SELECT a.event_type, a.n_rows, a.n_nonnull,
        |  a.n_rows - a.n_nonnull AS n_null, a.n_distinct, a.sum_nk, a.avg_nk,
        |  h.head_nulls_first
        |FROM a JOIN h ON a.event_type = h.event_type""".stripMargin,
    // q241: the oracle folds the same 15 hex digits of md5(token)
    // positionally to the same 60-bit BIGINT `conv` produces, and
    // replays the k smallest per source with a window (the exact
    // formulation the bounded-heap Aggregator implements at scale)
    "q241_kmv_distinct" ->
      """WITH tok AS (SELECT DISTINCT source, token FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE token <> ''),
        |hv0 AS (SELECT DISTINCT source,
        |    list_reduce(list_transform(range(1, 16),
        |      i -> CAST(strpos('0123456789abcdef', substring(md5(token), i, 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS hv
        |  FROM tok),
        |hv AS (SELECT source, hv FROM hv0
        |  UNION SELECT '__all__' AS source, hv FROM hv0),
        |r AS (SELECT source, hv,
        |    row_number() OVER (PARTITION BY source ORDER BY hv) AS rn FROM hv),
        |s AS (SELECT source, count(*) AS n_sketch, max(hv) AS kth_hv
        |  FROM r WHERE rn <= 64 GROUP BY source),
        |x AS (SELECT source, count(*) AS n_distinct FROM hv GROUP BY source),
        |e AS (SELECT x.source, n_distinct,
        |    CASE WHEN n_sketch < 64 THEN CAST(n_distinct AS DOUBLE)
        |      ELSE 63.0 / (CAST(kth_hv AS DOUBLE) / 1152921504606846976.0) END AS kmv_estimate
        |  FROM x JOIN s ON s.source = x.source)
        |SELECT source, n_distinct, kmv_estimate,
        |  abs(kmv_estimate - CAST(n_distinct AS DOUBLE)) / CAST(n_distinct AS DOUBLE) AS rel_err
        |FROM e ORDER BY source""".stripMargin,
    // q242: 3 unrolled GD passes, q119-style generated CTEs; the
    // algebraic sigmoid (only +,*,/,abs — no libm) and the
    // floor(·1e9+0.5) → DECIMAL(38,0) gradient sums keep every weight
    // bit-identical across engines and aggregation orders
    "q242_logreg" -> {
      val iterCte = (k: Int) =>
        s"""e$k AS (SELECT w0, w1, w2, x1, x2,
           |    0.5 * (1.0 + z / (1.0 + abs(z))) - y AS err
           |  FROM (SELECT w0, w1, w2, x1, x2, y,
           |      (w0 + w1 * x1) + w2 * x2 AS z FROM f, w${k - 1})),
           |g$k AS (SELECT w0, w1, w2, count(*) AS n,
           |    sum(CAST(floor(err * 1.0e9 + 0.5) AS DECIMAL(38,0))) AS g0,
           |    sum(CAST(floor(err * x1 * 1.0e9 + 0.5) AS DECIMAL(38,0))) AS g1,
           |    sum(CAST(floor(err * x2 * 1.0e9 + 0.5) AS DECIMAL(38,0))) AS g2
           |  FROM e$k GROUP BY w0, w1, w2),
           |w$k AS (SELECT
           |    w0 - 0.5 * (CAST(g0 AS DOUBLE) / 1.0e9 / CAST(n AS DOUBLE)) AS w0,
           |    w1 - 0.5 * (CAST(g1 AS DOUBLE) / 1.0e9 / CAST(n AS DOUBLE)) AS w1,
           |    w2 - 0.5 * (CAST(g2 AS DOUBLE) / 1.0e9 / CAST(n AS DOUBLE)) AS w2
           |  FROM g$k)""".stripMargin
      s"""WITH f AS (SELECT CAST(n_chars AS DOUBLE) / 1000.0 AS x1,
         |    CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0 AS x2,
         |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y FROM documents),
         |w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2),
         |${iterCte(1)},
         |${iterCte(2)},
         |${iterCte(3)},
         |p AS (SELECT w0, w1, w2,
         |    CASE WHEN (0.5 * (1.0 + z / (1.0 + abs(z))) >= 0.5) = (y = 1.0)
         |      THEN 1 ELSE 0 END AS ok
         |  FROM (SELECT w0, w1, w2, y,
         |      (w0 + w1 * x1) + w2 * x2 AS z FROM f, w3))
         |SELECT w0, w1, w2, count(*) AS n_docs,
         |  CAST(sum(ok) AS BIGINT) AS n_correct,
         |  CAST(CAST(sum(ok) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS accuracy
         |FROM p GROUP BY w0, w1, w2""".stripMargin
    },
    // q243: ranking and cumulative-relevance windows share one total
    // order (score desc, doc_id asc); the per-hit precision fold is
    // order-pinned by rank
    "q243_avg_precision" ->
      """WITH d AS (SELECT source, doc_id, n_chars AS score,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel FROM documents),
        |r AS (SELECT source, rel,
        |    row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id ASC) AS rk,
        |    sum(rel) OVER (PARTITION BY source ORDER BY score DESC, doc_id ASC
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d)
        |SELECT source, count(*) AS n_pos,
        |  list_reduce(list_prepend(0.0,
        |      list(CAST(cum AS DOUBLE) / CAST(rk AS DOUBLE) ORDER BY rk)),
        |    (a, b) -> a + b) / CAST(count(*) AS DOUBLE) AS avg_precision
        |FROM r WHERE rel = 1 GROUP BY source ORDER BY source""".stripMargin,
    // q244: unrolled frontier supersteps over the shared mh_pairs
    // edge set — dk = min-dist after k hops, exactly the Spark
    // frontier-join/min-agg rounds
    "q244_bfs_hops" -> {
      // AS MATERIALIZED on the multi-referenced frames (e feeds every
      // hop; each d feeds the next hop twice) — the q258 inlining rule
      val hopCte = (k: Int) =>
        s"""f$k AS (SELECT e.dst AS id, $k AS dist
           |  FROM e JOIN d${k - 1} d ON d.id = e.src AND d.dist = ${k - 1}),
           |d$k AS MATERIALIZED (SELECT id, min(dist) AS dist FROM (
           |    SELECT id, dist FROM d${k - 1}
           |    UNION ALL SELECT id, dist FROM f$k) u GROUP BY id)""".stripMargin
      s"""WITH $minhashPairsCte,
         |e AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
         |  UNION ALL SELECT doc_b, doc_a FROM mh_pairs),
         |n0 AS (SELECT DISTINCT src AS id FROM e),
         |d0 AS MATERIALIZED (SELECT id, 0 AS dist FROM n0 ORDER BY id LIMIT 8),
         |${hopCte(1)},
         |${hopCte(2)},
         |${hopCte(3)}
         |SELECT dist, count(*) AS n_nodes FROM d3 GROUP BY dist ORDER BY dist""".stripMargin
    },
    // q245: exact-integer dots/norms; the shrunk-similarity ranking
    // breaks ties on the (shrunk desc, neighbor asc) total order
    "q245_item_cf" ->
      """WITH r AS (SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY user_id, event_type),
        |norms AS (SELECT event_type, CAST(sum(c * c) AS BIGINT) AS ss
        |  FROM r GROUP BY event_type),
        |co AS (SELECT a.event_type AS item_a, b.event_type AS item_b,
        |    CAST(sum(a.c * b.c) AS BIGINT) AS dot, count(*) AS co_users
        |  FROM r a JOIN r b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2),
        |sim AS (SELECT item_a, item_b, co_users,
        |    CAST(dot AS DOUBLE) / (sqrt(CAST(na.ss AS DOUBLE)) * sqrt(CAST(nb.ss AS DOUBLE))) AS cosine
        |  FROM co JOIN norms na ON na.event_type = item_a
        |  JOIN norms nb ON nb.event_type = item_b),
        |s2 AS (SELECT item_a, item_b, co_users, cosine,
        |    cosine * (CAST(co_users AS DOUBLE) / (CAST(co_users AS DOUBLE) + 25.0)) AS shrunk_sim
        |  FROM sim),
        |b AS (SELECT item_a AS item, item_b AS neighbor, co_users, cosine, shrunk_sim FROM s2
        |  UNION ALL
        |  SELECT item_b AS item, item_a AS neighbor, co_users, cosine, shrunk_sim FROM s2),
        |rnk AS (SELECT item, neighbor, co_users, cosine, shrunk_sim,
        |    row_number() OVER (PARTITION BY item ORDER BY shrunk_sim DESC, neighbor ASC) AS rn
        |  FROM b)
        |SELECT item, CAST(rn AS INTEGER) AS rk, neighbor, co_users, cosine, shrunk_sim
        |FROM rnk WHERE rn <= 3 ORDER BY item, rk""".stripMargin,
    // q246: the daily spine is densified per type so the 1- and
    // 7-day lags are true calendar lags; all |diff| sums are exact
    // integers, the MASE ratio is the only double math
    "q246_mase" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
        |spine AS (SELECT event_type,
        |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM span),
        |y AS (SELECT s.event_type, s.day, COALESCE(d.n, 0) AS n
        |  FROM spine s LEFT JOIN daily d ON d.event_type = s.event_type AND d.day = s.day),
        |l AS (SELECT event_type, day, n,
        |    lag(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1,
        |    lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS ls
        |  FROM y)
        |SELECT event_type, count(*) AS n_days,
        |  CAST(sum(CASE WHEN ls IS NOT NULL THEN abs(n - ls) END) AS BIGINT) AS sae_seasonal,
        |  CAST(sum(CASE WHEN l1 IS NOT NULL THEN abs(n - l1) END) AS BIGINT) AS sae_naive,
        |  CASE WHEN CAST(sum(CASE WHEN l1 IS NOT NULL THEN abs(n - l1) END) AS BIGINT) = 0
        |    THEN NULL
        |    ELSE (CAST(sum(CASE WHEN ls IS NOT NULL THEN abs(n - ls) END) AS DOUBLE)
        |        / CAST(count(ls) AS DOUBLE))
        |      / (CAST(sum(CASE WHEN l1 IS NOT NULL THEN abs(n - l1) END) AS DOUBLE)
        |        / CAST(count(l1) AS DOUBLE))
        |  END AS mase
        |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q247: the prefix is pure integer math on the rational threshold
    // (⌈4n/5⌉ = (4n+4)//5 — a float ceil(0.8·n) rounds off-lattice);
    // the verify stage recomputes exact intersections, so the output
    // is q22's result set to the bit
    "q247_prefix_jaccard" ->
      s"""WITH $shingleCte,
         |shm AS MATERIALIZED (SELECT doc_id, shingle FROM sh),
         |w1 AS (SELECT doc_id, shingle,
         |    count(*) OVER (PARTITION BY shingle) AS df,
         |    count(*) OVER (PARTITION BY doc_id) AS n
         |  FROM shm),
         |p AS (SELECT doc_id, shingle FROM (
         |    SELECT doc_id, shingle, n,
         |      row_number() OVER (PARTITION BY doc_id ORDER BY df ASC, shingle ASC) AS rn
         |    FROM w1) t
         |  WHERE rn <= n - ((4 * n + 4) // 5) + 1),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM p a JOIN p b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
         |sz AS (SELECT doc_id, count(*) AS n FROM shm GROUP BY doc_id),
         |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
         |  FROM cand c JOIN shm sa ON sa.doc_id = c.doc_a
         |  JOIN shm sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
         |FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
         |WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.8""".stripMargin,
    // q248: the Morton interleave is generated as the same 20-term
    // integer expression both engines evaluate exactly; layouts,
    // min/max envelopes and pruning are all integer bit math
    "q248_zorder" -> {
      val inter = (0 until 10).map(i =>
        s"((ub >> $i) & 1) * ${1L << (2 * i)} + ((hb >> $i) & 1) * ${1L << (2 * i + 1)}")
        .mkString(" + ")
      s"""WITH e0 AS (SELECT user_id, epoch_us(ts) AS us FROM events),
         |hm AS (SELECT min(us // 3600000000) AS hmin FROM e0),
         |k AS (SELECT (user_id * 2654435761) % 1024 AS ub,
         |    (us // 3600000000 - hmin) % 1024 AS hb FROM e0, hm),
         |t AS (SELECT ub, hb, ($inter) AS z,
         |    CASE WHEN ub BETWEEN 256 AND 511 AND hb BETWEEN 96 AND 215
         |      THEN 1 ELSE 0 END AS rin
         |  FROM k),
         |x AS (SELECT ub, hb, rin, 'zorder' AS layout, z >> 14 AS file FROM t
         |  UNION ALL SELECT ub, hb, rin, 'linear' AS layout, hb >> 4 AS file FROM t),
         |pf AS (SELECT layout, file, count(*) AS n, CAST(sum(rin) AS BIGINT) AS rin,
         |    min(ub) AS minu, max(ub) AS maxu, min(hb) AS minh, max(hb) AS maxh
         |  FROM x GROUP BY layout, file)
         |SELECT layout, count(*) AS n_files, CAST(sum(n) AS BIGINT) AS rows_total,
         |  CAST(sum(rin) AS BIGINT) AS rows_in_rect,
         |  CAST(sum(CASE WHEN minu <= 511 AND maxu >= 256 AND minh <= 215 AND maxh >= 96
         |    THEN 1 ELSE 0 END) AS BIGINT) AS files_touched,
         |  CAST(sum(CASE WHEN minu <= 511 AND maxu >= 256 AND minh <= 215 AND maxh >= 96
         |    THEN n ELSE 0 END) AS BIGINT) AS rows_scanned,
         |  CASE WHEN CAST(sum(rin) AS BIGINT) = 0 THEN NULL
         |    ELSE CAST(sum(CASE WHEN minu <= 511 AND maxu >= 256 AND minh <= 215 AND maxh >= 96
         |        THEN n ELSE 0 END) AS DOUBLE) / CAST(sum(rin) AS DOUBLE)
         |  END AS scan_amplification
         |FROM pf GROUP BY layout ORDER BY layout""".stripMargin
    },
    // q249: the oracle replays the flagged-cell classification, the
    // monoid merge AND the independent full recompute — the flag is
    // recomputed on both engines, never assumed
    "q249_join_ivm" ->
      """WITH o AS (SELECT o_orderkey, o_orderpriority,
        |    o_orderdate < TIMESTAMP '1998-01-01' AS oold FROM orders),
        |l AS (SELECT l_orderkey, CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS qu,
        |    l_shipdate < TIMESTAMP '1998-01-01' AS lold FROM lineitem),
        |cells AS (SELECT o_orderpriority, oold, lold, count(*) AS n,
        |    CAST(sum(qu) AS BIGINT) AS qs
        |  FROM o JOIN l ON o_orderkey = l_orderkey GROUP BY 1, 2, 3),
        |m AS (SELECT o_orderpriority,
        |    CAST(sum(CASE WHEN oold AND lold THEN n ELSE 0 END) AS BIGINT) AS n_old,
        |    CAST(sum(CASE WHEN NOT oold AND lold THEN n ELSE 0 END) AS BIGINT) AS n_delta_orders,
        |    CAST(sum(CASE WHEN oold AND NOT lold THEN n ELSE 0 END) AS BIGINT) AS n_delta_lines,
        |    CAST(sum(CASE WHEN NOT oold AND NOT lold THEN n ELSE 0 END) AS BIGINT) AS n_delta_both,
        |    CAST(sum(n) AS BIGINT) AS n_merged, CAST(sum(qs) AS BIGINT) AS q_merged
        |  FROM cells GROUP BY 1),
        |f AS (SELECT o_orderpriority, count(*) AS n_full, CAST(sum(qu) AS BIGINT) AS qty_units
        |  FROM o JOIN l ON o_orderkey = l_orderkey GROUP BY 1)
        |SELECT f.o_orderpriority, n_old, n_delta_orders, n_delta_lines, n_delta_both,
        |  n_full, qty_units,
        |  CASE WHEN n_merged = n_full AND q_merged = qty_units THEN 1 ELSE 0 END
        |    AS ivm_matches_full
        |FROM f JOIN m ON m.o_orderpriority = f.o_orderpriority
        |ORDER BY f.o_orderpriority""".stripMargin,
    // q250: five generated candidate blocks, each one keyed
    // count-distinct rollup — all-integer except the final rate
    "q250_fd_audit" -> {
      def block(name: String, table: String, x: String, y: String) =
        s"""SELECT '$name' AS fd, count(*) AS n_groups,
           |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
           |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
           |    / CAST(count(*) AS DOUBLE) AS violation_rate,
           |  max(nd) AS max_rhs
           |FROM (SELECT $x AS x, count(DISTINCT $y) AS nd FROM $table GROUP BY $x) g""".stripMargin
      Seq(
        block("documents: source -> lang", "documents", "source", "lang"),
        block("documents: lang -> source", "documents", "lang", "source"),
        block("events: user_id -> event_type", "events", "user_id", "event_type"),
        block("lineitem: l_orderkey -> l_suppkey", "lineitem", "l_orderkey", "l_suppkey"),
        block("orders: o_custkey -> o_orderstatus", "orders", "o_custkey", "o_orderstatus")
      ).mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) u ORDER BY fd")
    },
    // q251: q119-style generated supersteps — the state vector and
    // CONV accumulator advance through 8 CTE rounds with the SAME
    // order-pinned src fold and literal accumulation order as the
    // Spark frames; removal chains delete a state's transitions
    // without renormalizing
    "q251_markov_attribution" -> {
      val stepCte = (k: Int) =>
        s"""s$k AS (SELECT t.chain, t.dst, v.state AS src, v.v * t.p AS term
           |  FROM v${k - 1} v JOIN tmc t ON t.chain = v.chain AND t.src = v.state),
           |n$k AS (SELECT chain, dst,
           |    list_reduce(list_prepend(0.0, list(term ORDER BY src)), (a, b) -> a + b) AS v
           |  FROM s$k GROUP BY chain, dst),
           |v$k AS (SELECT chain, dst AS state, v FROM n$k WHERE dst NOT IN ('CONV', 'END')),
           |a$k AS (SELECT a.chain, a.acc + COALESCE(c.v, 0.0) AS acc
           |  FROM a${k - 1} a LEFT JOIN (SELECT chain, v FROM n$k WHERE dst = 'CONV') c
           |    ON c.chain = a.chain)""".stripMargin
      s"""WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
         |o AS (SELECT *,
         |    lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS nxt,
         |    lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prv
         |  FROM ev),
         |ts0 AS (SELECT 'START' AS src,
         |    CASE WHEN event_type = 'purchase' THEN 'CONV' ELSE event_type END AS dst
         |  FROM o WHERE prv IS NULL OR prv = 'purchase'),
         |ts1 AS (SELECT event_type AS src,
         |    CASE WHEN nxt IS NULL THEN 'END'
         |      WHEN nxt = 'purchase' THEN 'CONV' ELSE nxt END AS dst
         |  FROM o WHERE event_type <> 'purchase'),
         |tc AS (SELECT src, dst, count(*) AS c
         |  FROM (SELECT * FROM ts0 UNION ALL SELECT * FROM ts1) u GROUP BY 1, 2),
         |tm AS (SELECT src, dst,
         |    CAST(c AS DOUBLE) / CAST(sum(c) OVER (PARTITION BY src) AS DOUBLE) AS p
         |  FROM tc),
         |ch AS (SELECT unnest(['full', 'click', 'view', 'signup', 'error']) AS chain),
         |tmc AS (SELECT chain, src, dst, p FROM tm, ch
         |  WHERE chain = 'full' OR (src <> chain AND dst <> chain)),
         |v0 AS (SELECT chain, 'START' AS state, CAST(1.0 AS DOUBLE) AS v FROM ch),
         |a0 AS (SELECT chain, CAST(0.0 AS DOUBLE) AS acc FROM ch),
         |${(1 to 8).map(stepCte).mkString(",\n")},
         |f AS (SELECT acc AS p_full FROM a8 WHERE chain = 'full'),
         |r AS (SELECT chain AS channel, acc AS removal_conv_prob FROM a8 WHERE chain <> 'full'),
         |e AS (SELECT channel, p_full AS full_conv_prob, removal_conv_prob,
         |    CASE WHEN p_full = 0.0 THEN NULL
         |      ELSE 1.0 - removal_conv_prob / p_full END AS removal_effect FROM r, f),
         |s AS (SELECT list_reduce(list_prepend(0.0,
         |    list(removal_effect ORDER BY channel)), (a, b) -> a + b) AS tot FROM e)
         |SELECT channel, full_conv_prob, removal_conv_prob, removal_effect,
         |  CASE WHEN tot = 0.0 OR tot IS NULL THEN NULL
         |    ELSE removal_effect / tot END AS attribution_share
         |FROM e, s ORDER BY channel""".stripMargin
    },
    // q252: ranking ties pinned (count desc, token asc); masses are
    // integer sums, the share one divide against the windowed total
    "q252_tail_collapse" ->
      """WITH counts AS (SELECT source, token, count(*) AS c FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE token <> '' GROUP BY source, token),
        |ranked AS (SELECT source, token, c,
        |    row_number() OVER (PARTITION BY source ORDER BY c DESC, token ASC) AS rn
        |  FROM counts),
        |rolled AS (SELECT source,
        |    CASE WHEN rn <= 10 THEN token ELSE '__OTHER__' END AS category,
        |    count(*) AS n_types, CAST(sum(c) AS BIGINT) AS n_tokens
        |  FROM ranked GROUP BY 1, 2)
        |SELECT source, category, n_types, n_tokens,
        |  CAST(n_tokens AS DOUBLE)
        |    / CAST(sum(n_tokens) OVER (PARTITION BY source) AS DOUBLE) AS share
        |FROM rolled ORDER BY source, n_tokens DESC, category""".stripMargin,
    // q253: generated per-feature blocks over ONE shared conditional
    // aggregate; all gini math is polynomial on exact integers (the
    // log-free rule)
    "q253_gini_gain" -> {
      def block(f: String) = {
        val (nt, pt) = (s"${f}_n", s"${f}_pos")
        s"""SELECT '$f' AS feature, $nt AS n_true, $pt AS pos_true,
           |  n - $nt AS n_false, pos - $pt AS pos_false,
           |  1.0 - CAST(pos * pos + (n - pos) * (n - pos) AS DOUBLE)
           |    / CAST(n * n AS DOUBLE) AS gini_parent,
           |  CASE WHEN $nt = 0 THEN 0.0 ELSE
           |    (CAST($nt AS DOUBLE) / CAST(n AS DOUBLE))
           |      * (1.0 - CAST($pt * $pt + ($nt - $pt) * ($nt - $pt) AS DOUBLE)
           |        / CAST($nt * $nt AS DOUBLE)) END
           |  + CASE WHEN n - $nt = 0 THEN 0.0 ELSE
           |    (CAST(n - $nt AS DOUBLE) / CAST(n AS DOUBLE))
           |      * (1.0 - CAST((pos - $pt) * (pos - $pt)
           |          + ((n - $nt) - (pos - $pt)) * ((n - $nt) - (pos - $pt)) AS DOUBLE)
           |        / CAST((n - $nt) * (n - $nt) AS DOUBLE)) END AS gini_split
           |FROM g""".stripMargin
      }
      val feats = Seq("f_len", "f_tok", "f_parity", "f_src")
      val sums = feats.map { f =>
        s"""CAST(sum(CASE WHEN $f THEN 1 ELSE 0 END) AS BIGINT) AS ${f}_n,
           |    CAST(sum(CASE WHEN $f THEN y ELSE 0 END) AS BIGINT) AS ${f}_pos""".stripMargin
      }.mkString(",\n    ")
      s"""WITH d AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         |    n_chars >= 300 AS f_len,
         |    len(string_split(text, ' ')) >= 60 AS f_tok,
         |    doc_id % 2 = 0 AS f_parity,
         |    source < 'src5' AS f_src
         |  FROM documents),
         |g AS (SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS pos,
         |    $sums
         |  FROM d)
         |SELECT feature, n_true, pos_true, n_false, pos_false,
         |  gini_parent, gini_split, gini_parent - gini_split AS gain
         |FROM (
         |${feats.map(block).mkString("\nUNION ALL\n")}
         |) u ORDER BY feature""".stripMargin
    },
    // q254: ring/mod ownership replayed with the q241 md5 fold; the
    // sorted point arrays come from 1-row aggregate subqueries, and
    // ownership is the first at-or-after point with wrap fallback
    "q254_rebalance_churn" ->
      """WITH keys AS (SELECT list_reduce(list_transform(range(1, 16),
        |    i -> CAST(strpos('0123456789abcdef',
        |      substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
        |    (a, b) -> a * 16 + b) AS kh FROM documents),
        |pts AS (SELECT i AS pid, list_reduce(list_transform(range(1, 16),
        |    j -> CAST(strpos('0123456789abcdef',
        |      substring(md5('shard:' || CAST(i AS VARCHAR)), j, 1)) - 1 AS BIGINT)),
        |    (a, b) -> a * 16 + b) AS ph
        |  FROM (SELECT unnest(range(0, 65)) AS i) t),
        |a64 AS (SELECT list_sort(list(ph)) AS p64 FROM pts WHERE pid < 64),
        |a65 AS (SELECT list_sort(list(ph)) AS p65 FROM pts),
        |f AS (SELECT
        |    CASE WHEN kh % 64 <> kh % 65 THEN 1 ELSE 0 END AS mv_mod,
        |    CASE WHEN COALESCE(list_filter(p64, x -> x >= kh)[1], p64[1])
        |      <> COALESCE(list_filter(p65, x -> x >= kh)[1], p65[1])
        |      THEN 1 ELSE 0 END AS mv_ring
        |  FROM keys, a64, a65),
        |s AS (SELECT count(*) AS n_keys, CAST(sum(mv_mod) AS BIGINT) AS mod_moved,
        |    CAST(sum(mv_ring) AS BIGINT) AS ring_moved FROM f)
        |SELECT * FROM (
        |  SELECT 'mod' AS scheme, n_keys, mod_moved AS n_moved,
        |    CAST(mod_moved AS DOUBLE) / CAST(n_keys AS DOUBLE) AS moved_frac FROM s
        |  UNION ALL
        |  SELECT 'ring' AS scheme, n_keys, ring_moved AS n_moved,
        |    CAST(ring_moved AS DOUBLE) / CAST(n_keys AS DOUBLE) AS moved_frac FROM s) u
        |ORDER BY scheme""".stripMargin,
    // q255: the k per-depth RBO weights are computed ONCE driver-side
    // and embedded as identical round-trip double literals in both
    // engines — pow never runs in either plan; per-pair sums use the
    // order-pinned token fold
    "q255_rbo" -> {
      val k = 20; val p = 0.9
      val weights = (1 to k).map(m =>
        (1.0 - p) * (m to k).map(d => math.pow(p, d - 1) / d).sum)
      // exponent-suffix each literal: a bare decimal is DECIMAL in
      // DuckDB and CAST(decimal AS DOUBLE) re-rounds THROUGH the
      // decimal (measured 1-ulp drift on 3 of the 20 weights); an
      // exponent literal parses straight to the nearest DOUBLE
      val wlist = weights.map { w =>
        val s = w.toString
        if (s.contains("E") || s.contains("e")) s else s + "e0"
      }.mkString("[", ", ", "]")
      s"""WITH counts AS (SELECT source, token, count(*) AS c FROM (
         |    SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
         |  WHERE token <> '' GROUP BY source, token),
         |tops AS (SELECT source, token, rn FROM (
         |    SELECT source, token,
         |      row_number() OVER (PARTITION BY source ORDER BY c DESC, token ASC) AS rn
         |    FROM counts) t WHERE rn <= $k),
         |m AS (SELECT a.source AS source_a, b.source AS source_b, a.token,
         |    CASE WHEN a.rn > b.rn THEN a.rn ELSE b.rn END AS m
         |  FROM tops a JOIN tops b ON a.token = b.token AND a.source < b.source),
         |r AS (SELECT source_a, source_b, count(*) AS n_overlap,
         |    list_reduce(list_prepend(0.0, list(($wlist)[m] ORDER BY token)),
         |      (x, y) -> x + y) AS rbo
         |  FROM m GROUP BY 1, 2),
         |s AS (SELECT DISTINCT source FROM tops),
         |g AS (SELECT a.source AS source_a, b.source AS source_b
         |  FROM s a JOIN s b ON a.source < b.source)
         |SELECT g.source_a, g.source_b,
         |  COALESCE(r.n_overlap, 0) AS n_overlap, COALESCE(r.rbo, 0.0) AS rbo
         |FROM g LEFT JOIN r ON r.source_a = g.source_a AND r.source_b = g.source_b
         |ORDER BY 1, 2""".stripMargin
    },
    // q256: the oracle replays the generation split (even/odd
    // event_id) on the original table — certifying that old-gen rows
    // read back as NULL units and new-gen sums survive the merge
    "q256_schema_evolution" ->
      """SELECT event_type, count(*) AS n_rows,
        |  count(CASE WHEN event_id % 2 = 1 THEN 1 END) AS n_evolved,
        |  CAST(sum(CASE WHEN event_id % 2 = 1
        |    THEN CAST(floor(value * 1.0e6 + 0.5) AS BIGINT) END) AS BIGINT) AS evolved_units,
        |  CAST(sum(CAST(floor(value * 1.0e6 + 0.5) AS BIGINT)) AS BIGINT) AS all_units
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q257: per-pair generated CTE chunks; the statistics and the
    // truth come from the same keyed count frames, and the four
    // estimate terms combine in one pinned double order
    "q257_join_estimate" -> {
      def ctes(q: String, ta: String, ka: String, tb: String, kb: String) =
        s"""${q}ca AS (SELECT $ka AS k, count(*) AS c FROM $ta GROUP BY 1),
           |${q}cb AS (SELECT $kb AS k, count(*) AS c FROM $tb GROUP BY 1),
           |${q}ha AS (SELECT k, c FROM ${q}ca ORDER BY c DESC, k ASC LIMIT 50),
           |${q}hb AS (SELECT k, c FROM ${q}cb ORDER BY c DESC, k ASC LIMIT 50),
           |${q}st AS (SELECT
           |  (SELECT count(*) FROM ${q}ca) AS d_a,
           |  (SELECT CAST(sum(c) AS BIGINT) FROM ${q}ca) AS n_a,
           |  (SELECT count(*) FROM ${q}cb) AS d_b,
           |  (SELECT CAST(sum(c) AS BIGINT) FROM ${q}cb) AS n_b,
           |  (SELECT count(*) FROM ${q}ha) AS h_a,
           |  (SELECT CAST(sum(c) AS BIGINT) FROM ${q}ha) AS nh_a,
           |  (SELECT count(*) FROM ${q}hb) AS h_b,
           |  (SELECT CAST(sum(c) AS BIGINT) FROM ${q}hb) AS nh_b,
           |  (SELECT COALESCE(CAST(sum(a.c * b.c) AS BIGINT), 0)
           |    FROM ${q}ha a JOIN ${q}hb b ON a.k = b.k) AS x_heavy,
           |  (SELECT COALESCE(CAST(sum(a.c) AS BIGINT), 0) FROM ${q}ha a
           |    WHERE NOT EXISTS (SELECT 1 FROM ${q}hb b WHERE b.k = a.k)) AS s_aonly,
           |  (SELECT COALESCE(CAST(sum(b.c) AS BIGINT), 0) FROM ${q}hb b
           |    WHERE NOT EXISTS (SELECT 1 FROM ${q}ha a WHERE a.k = b.k)) AS s_bonly,
           |  (SELECT COALESCE(CAST(sum(a.c * b.c) AS BIGINT), 0)
           |    FROM ${q}ca a JOIN ${q}cb b ON a.k = b.k) AS actual_rows)""".stripMargin
      def sel(q: String, name: String) =
        s"""SELECT '$name' AS join_name, d_a, d_b, actual_rows,
           |  CAST(x_heavy AS DOUBLE)
           |  + CASE WHEN d_b - h_b = 0 THEN 0.0 ELSE CAST(s_aonly AS DOUBLE)
           |      * (CAST(n_b - nh_b AS DOUBLE) / CAST(d_b - h_b AS DOUBLE)) END
           |  + CASE WHEN d_a - h_a = 0 THEN 0.0 ELSE CAST(s_bonly AS DOUBLE)
           |      * (CAST(n_a - nh_a AS DOUBLE) / CAST(d_a - h_a AS DOUBLE)) END
           |  + CASE WHEN d_a - h_a = 0 OR d_b - h_b = 0 THEN 0.0
           |      ELSE CAST(least(d_a - h_a, d_b - h_b) AS DOUBLE)
           |        * (CAST(n_a - nh_a AS DOUBLE) / CAST(d_a - h_a AS DOUBLE))
           |        * (CAST(n_b - nh_b AS DOUBLE) / CAST(d_b - h_b AS DOUBLE)) END
           |  AS est_rows
           |FROM ${q}st""".stripMargin
      s"""WITH ${ctes("p1", "orders", "o_orderkey", "lineitem", "l_orderkey")},
         |${ctes("p2", "customer", "c_custkey", "orders", "o_custkey")},
         |${ctes("p3", "part", "p_partkey", "lineitem", "l_partkey")}
         |SELECT join_name, d_a, d_b, actual_rows, est_rows,
         |  abs(est_rows - CAST(actual_rows AS DOUBLE))
         |    / CAST(actual_rows AS DOUBLE) AS rel_err
         |FROM (
         |${sel("p1", "orders_lineitem")}
         |UNION ALL
         |${sel("p2", "customer_orders")}
         |UNION ALL
         |${sel("p3", "part_lineitem")}
         |) u ORDER BY join_name""".stripMargin
    },
    // q258: unrolled peel rounds over the shared mh_pairs edges —
    // each round drops degree<2 endpoints and their edges, exactly
    // the Spark supersteps.  Every e$r is AS MATERIALIZED: each is
    // referenced 5× downstream and DuckDB's default CTE inlining
    // re-expands the whole chain (incl. the minhash CTE) 5^rounds
    // times — measured as a CPU-pinned never-finishing compare
    "q258_kcore" -> {
      val peel = (r: Int) =>
        s"""d$r AS (SELECT id, count(*) AS deg FROM (
           |    SELECT doc_a AS id FROM e${r - 1}
           |    UNION ALL SELECT doc_b AS id FROM e${r - 1}) u GROUP BY id),
           |k$r AS MATERIALIZED (SELECT id FROM d$r WHERE deg >= 2),
           |e$r AS MATERIALIZED (SELECT doc_a, doc_b FROM e${r - 1}
           |  WHERE doc_a IN (SELECT id FROM k$r)
           |    AND doc_b IN (SELECT id FROM k$r)),
           |s$r AS (SELECT $r AS round,
           |  (SELECT count(DISTINCT id) FROM (SELECT doc_a AS id FROM e$r
           |     UNION ALL SELECT doc_b AS id FROM e$r) x) AS n_nodes,
           |  (SELECT count(*) FROM e$r) AS n_edges)""".stripMargin
      s"""WITH $minhashPairsCte,
         |e0 AS MATERIALIZED (SELECT doc_a, doc_b FROM mh_pairs),
         |${(1 to 4).map(peel).mkString(",\n")}
         |SELECT round, n_nodes, n_edges FROM (
         |  SELECT * FROM s1 UNION ALL SELECT * FROM s2
         |  UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4) u
         |ORDER BY round""".stripMargin
    },
    // q259: the same boundary-crossing selection as q238, fed through
    // the HT estimator in exact k-units (max(k·w, W) BIGINT sums)
    "q259_ht_estimate" ->
      """WITH d AS (SELECT source, doc_id, CAST(n_chars AS BIGINT) AS w
        |  FROM documents),
        |c AS (SELECT source, doc_id, w,
        |    CAST(sum(w) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(sum(w) OVER (PARTITION BY source) AS BIGINT) AS wt
        |  FROM d),
        |sel AS (SELECT source, w, wt FROM c
        |  WHERE (cum * 50) // wt > ((cum - w) * 50) // wt),
        |h AS (SELECT source, count(*) AS n_sampled,
        |    CAST(sum(CASE WHEN 50 * w > wt THEN 50 * w ELSE wt END) AS BIGINT) AS smax,
        |    max(wt) AS total
        |  FROM sel GROUP BY source)
        |SELECT source, total AS total_chars, n_sampled,
        |  CAST(smax AS DOUBLE) / 50.0 AS ht_estimate,
        |  abs(CAST(smax AS DOUBLE) / 50.0 - CAST(total AS DOUBLE))
        |    / CAST(total AS DOUBLE) AS rel_err
        |FROM h ORDER BY source""".stripMargin,
    // q260: candidate-driven multiset scoring; Σmax folds to
    // n_a + n_b − Σmin by the multiset identity, so both scores are
    // single integer-ratio divides
    "q260_weighted_jaccard" ->
      s"""WITH $minhashPairsCte,
         |tok AS MATERIALIZED (SELECT doc_id, token, count(*) AS c FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
         |  WHERE token <> '' GROUP BY doc_id, token),
         |tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok, count(*) AS n_set
         |  FROM tok GROUP BY doc_id),
         |sh2 AS (SELECT p.doc_a, p.doc_b,
         |    CAST(sum(CASE WHEN a.c < b.c THEN a.c ELSE b.c END) AS BIGINT) AS smin,
         |    count(*) AS sset
         |  FROM mh_pairs p JOIN tok a ON a.doc_id = p.doc_a
         |  JOIN tok b ON b.doc_id = p.doc_b AND b.token = a.token
         |  GROUP BY 1, 2)
         |SELECT s.doc_a, s.doc_b, s.smin, s.sset,
         |  CAST(smin AS DOUBLE) / CAST(ta.n_tok + tb.n_tok - smin AS DOUBLE) AS weighted_jaccard,
         |  CAST(sset AS DOUBLE) / CAST(ta.n_set + tb.n_set - sset AS DOUBLE) AS set_jaccard
         |FROM sh2 s JOIN tot ta ON ta.doc_id = s.doc_a
         |JOIN tot tb ON tb.doc_id = s.doc_b
         |ORDER BY s.doc_a, s.doc_b""".stripMargin,
    // q261: shared centered-moments SSE template (one pinned double
    // order); the dense series y is MATERIALIZED (multi-referenced)
    "q261_segmented_trend" -> {
      def sseSql =
        """CASE WHEN CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(m AS DOUBLE) = 0.0
          |      THEN CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(m AS DOUBLE)
          |      ELSE (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(m AS DOUBLE))
          |        - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(m AS DOUBLE))
          |          * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(m AS DOUBLE))
          |          / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(m AS DOUBLE))
          |    END""".stripMargin
      s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
         |  FROM events GROUP BY 1, 2),
         |span AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
         |spine AS (SELECT event_type, d0,
         |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day FROM span),
         |y AS MATERIALIZED (SELECT s.event_type,
         |    CAST(date_diff('day', s.d0, s.day) AS BIGINT) AS x, COALESCE(d.n, 0) AS yv
         |  FROM spine s LEFT JOIN daily d ON d.event_type = s.event_type AND d.day = s.day),
         |np AS (SELECT event_type, max(x) + 1 AS nd FROM y GROUP BY 1),
         |cands AS (SELECT event_type, unnest(range(7, nd - 7 + 1)) AS b
         |  FROM np WHERE nd >= 14),
         |sides AS (SELECT y.event_type, c.b,
         |    CASE WHEN y.x < c.b THEN 0 ELSE 1 END AS side, y.x, y.yv
         |  FROM y JOIN cands c ON c.event_type = y.event_type),
         |mom AS (SELECT event_type, b, side, count(*) AS m,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * yv) AS BIGINT) AS sxy,
         |    CAST(sum(yv * yv) AS BIGINT) AS syy
         |  FROM sides GROUP BY 1, 2, 3),
         |es AS (SELECT event_type, b, side, $sseSql AS sse FROM mom),
         |sp AS (SELECT event_type, b,
         |    max(CASE WHEN side = 0 THEN sse END)
         |      + max(CASE WHEN side = 1 THEN sse END) AS sse_split
         |  FROM es GROUP BY 1, 2),
         |bst AS (SELECT event_type, b AS best_break, sse_split FROM (
         |    SELECT event_type, b, sse_split,
         |      row_number() OVER (PARTITION BY event_type
         |        ORDER BY sse_split ASC, b ASC) AS rn
         |    FROM sp) t WHERE rn = 1),
         |sm AS (SELECT event_type, count(*) AS m,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * yv) AS BIGINT) AS sxy,
         |    CAST(sum(yv * yv) AS BIGINT) AS syy
         |  FROM y GROUP BY 1),
         |ss AS (SELECT event_type, $sseSql AS sse_single FROM sm)
         |SELECT b.event_type, np.nd AS n_days,
         |  CAST(b.best_break AS INTEGER) AS best_break,
         |  ss.sse_single, b.sse_split,
         |  CASE WHEN ss.sse_single = 0.0 THEN NULL
         |    ELSE 1.0 - b.sse_split / ss.sse_single END AS improvement
         |FROM bst b JOIN ss ON ss.event_type = b.event_type
         |JOIN np ON np.event_type = b.event_type
         |ORDER BY b.event_type""".stripMargin
    },
    // q262: same 60-bit md5 fold as q241; the sketch side replays the
    // k-min windows, the union-combine and the membership counts the
    // array algebra computes on Spark; every double is an
    // exact-integer divide so parity is structural
    "q262_kmv_pair_sim" ->
      """WITH tok AS (SELECT DISTINCT source, token FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE token <> ''),
        |hv0 AS MATERIALIZED (SELECT DISTINCT source,
        |    list_reduce(list_transform(range(1, 16),
        |      i -> CAST(strpos('0123456789abcdef', substring(md5(token), i, 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS hv
        |  FROM tok),
        |r AS (SELECT source, hv,
        |    row_number() OVER (PARTITION BY source ORDER BY hv) AS rn FROM hv0),
        |sk AS MATERIALIZED (SELECT source, hv FROM r WHERE rn <= 64),
        |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM hv0 GROUP BY source),
        |pr AS (SELECT a.source AS sa, b.source AS sb, a.n AS n_a, b.n AS n_b
        |  FROM sz a JOIN sz b ON a.source < b.source),
        |uv AS (SELECT p.sa, p.sb, s.hv FROM pr p JOIN sk s ON s.source = p.sa
        |  UNION
        |  SELECT p.sa, p.sb, s.hv FROM pr p JOIN sk s ON s.source = p.sb),
        |us AS MATERIALIZED (SELECT sa, sb, hv FROM (
        |    SELECT sa, sb, hv,
        |      row_number() OVER (PARTITION BY sa, sb ORDER BY hv) AS rn FROM uv)
        |  WHERE rn <= 64),
        |ku AS (SELECT sa, sb, CAST(count(*) AS BIGINT) AS k_used FROM us GROUP BY 1, 2),
        |si AS (SELECT u.sa, u.sb, CAST(count(*) AS BIGINT) AS inter_sketch
        |  FROM us u JOIN sk x ON x.source = u.sa AND x.hv = u.hv
        |            JOIN sk y ON y.source = u.sb AND y.hv = u.hv
        |  GROUP BY 1, 2),
        |ie AS (SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS inter_exact
        |  FROM hv0 a JOIN hv0 b ON a.hv = b.hv AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT p.sa AS source_a, p.sb AS source_b, p.n_a, p.n_b,
        |  COALESCE(ie.inter_exact, 0) AS inter_exact,
        |  CAST(COALESCE(ie.inter_exact, 0) AS DOUBLE)
        |    / CAST(p.n_a + p.n_b - COALESCE(ie.inter_exact, 0) AS DOUBLE) AS jaccard_exact,
        |  ku.k_used,
        |  COALESCE(si.inter_sketch, 0) AS inter_sketch,
        |  CAST(COALESCE(si.inter_sketch, 0) AS DOUBLE)
        |    / CAST(ku.k_used AS DOUBLE) AS jaccard_est,
        |  abs(CAST(COALESCE(si.inter_sketch, 0) AS DOUBLE) / CAST(ku.k_used AS DOUBLE)
        |    - CAST(COALESCE(ie.inter_exact, 0) AS DOUBLE)
        |      / CAST(p.n_a + p.n_b - COALESCE(ie.inter_exact, 0) AS DOUBLE)) AS abs_err
        |FROM pr p JOIN ku ON ku.sa = p.sa AND ku.sb = p.sb
        |LEFT JOIN si ON si.sa = p.sa AND si.sb = p.sb
        |LEFT JOIN ie ON ie.sa = p.sa AND ie.sb = p.sb
        |ORDER BY source_a, source_b""".stripMargin,
    // q263: frequency moments (n, keys, max, Σc²) per type; the ceil
    // is exact integer arithmetic, the cv one double divide of a
    // sqrt of an integer — bit-identical both engines
    "q263_skew_audit" ->
      """WITH kc AS (SELECT event_type, user_id, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type,
        |    CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(max(c) AS BIGINT) AS max_key_rows,
        |    CAST(sum(c * c) AS BIGINT) AS sum_c2
        |  FROM kc GROUP BY 1)
        |SELECT event_type, n_rows, n_keys, max_key_rows,
        |  CAST(max_key_rows * n_keys AS DOUBLE) / CAST(n_rows AS DOUBLE) AS skew_factor,
        |  sqrt(CAST(greatest(0, n_keys * sum_c2 - n_rows * n_rows) AS DOUBLE))
        |    / CAST(n_rows AS DOUBLE) AS key_cv,
        |  greatest(1, (max_key_rows * 32 + n_rows - 1) // n_rows) AS salt_factor
        |FROM m ORDER BY event_type""".stripMargin,
    // q264: the greedy unrolled as generated superstep CTEs (the
    // q242/q244 pattern); a picked source has no uncovered tokens
    // left, so it drops out of every later g-stage by construction
    "q264_set_cover" -> {
      val roundCte = (k: Int) =>
        s"""g$k AS (SELECT t.source, CAST(count(*) AS BIGINT) AS gain FROM tok t
           |  WHERE NOT EXISTS (SELECT 1 FROM c${k - 1} c WHERE c.token = t.token)
           |  GROUP BY t.source),
           |p$k AS (SELECT source, gain FROM g$k ORDER BY gain DESC, source ASC LIMIT 1),
           |c$k AS MATERIALIZED (SELECT token FROM c${k - 1}
           |  UNION SELECT t.token FROM tok t JOIN p$k ON t.source = p$k.source)""".stripMargin
      val rounds = (1 to 5).map(roundCte).mkString(",\n")
      val selects = (1 to 5).map(k =>
        s"""SELECT $k AS round, source, gain AS marginal_gain,
           |  (SELECT CAST(count(*) AS BIGINT) FROM c$k) AS cum_covered FROM p$k""".stripMargin)
        .mkString("\n  UNION ALL\n  ")
      s"""WITH wrd AS (SELECT source, string_split(text, ' ') AS w FROM documents),
         |tok AS MATERIALIZED (SELECT DISTINCT source,
         |    unnest([array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]) AS token
         |  FROM wrd WHERE len(w) >= 3),
         |tot AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS t FROM tok),
         |c0 AS (SELECT token FROM tok WHERE 1 = 0),
         |$rounds,
         |sel AS (
         |  $selects
         |)
         |SELECT round, source, marginal_gain, cum_covered,
         |  CAST(cum_covered AS DOUBLE) / CAST(t AS DOUBLE) AS coverage_frac
         |FROM sel, tot ORDER BY round""".stripMargin
    },
    // q265: the same md5-parity ±1 sign matrix, projections and
    // distances as ordered folds (0.0-seeded left fold, d then j
    // ascending — the q217/q128 rule), so every double is
    // bit-identical; multiplication order s·e vs e·s is immaterial
    // (IEEE multiply is commutative bitwise)
    "q265_jl_distortion" ->
      """WITH sg AS (SELECT t1.range AS j, t2.range AS d,
        |    CASE WHEN strpos('01234567',
        |        substring(md5('jl:' || t1.range || ':' || t2.range), 1, 1)) > 0
        |      THEN 1.0 ELSE -1.0 END AS s
        |  FROM range(0, 16) t1, range(0, 64) t2),
        |ev AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
        |pj AS (SELECT ev.vec_id, sg.j,
        |    list_reduce(list_prepend(0.0,
        |      list(sg.s * CAST(ev.embedding[sg.d + 1] AS DOUBLE) ORDER BY sg.d)),
        |      (a, b) -> a + b) AS p
        |  FROM ev, sg GROUP BY ev.vec_id, sg.j),
        |pv AS MATERIALIZED (SELECT vec_id, list(p ORDER BY j) AS proj
        |  FROM pj GROUP BY vec_id),
        |pr AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b FROM ev a JOIN ev b
        |  ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 5),
        |dx AS (SELECT p.vec_a, p.vec_b,
        |    list_reduce(list_prepend(0.0,
        |      [(CAST(ea.embedding[i] AS DOUBLE) - CAST(eb.embedding[i] AS DOUBLE))
        |        * (CAST(ea.embedding[i] AS DOUBLE) - CAST(eb.embedding[i] AS DOUBLE))
        |        FOR i IN range(1, 65)]), (a, b) -> a + b) AS exact_d2,
        |    list_reduce(list_prepend(0.0,
        |      [(pa.proj[i] - pb.proj[i]) * (pa.proj[i] - pb.proj[i])
        |        FOR i IN range(1, 17)]), (a, b) -> a + b) AS proj_d2
        |  FROM pr p JOIN ev ea ON ea.vec_id = p.vec_a
        |  JOIN ev eb ON eb.vec_id = p.vec_b
        |  JOIN pv pa ON pa.vec_id = p.vec_a
        |  JOIN pv pb ON pb.vec_id = p.vec_b)
        |SELECT vec_a, vec_b, exact_d2, proj_d2,
        |  CASE WHEN exact_d2 = 0.0 THEN NULL
        |    ELSE proj_d2 / (16.0 * exact_d2) END AS ratio
        |FROM dx ORDER BY vec_a, vec_b""".stripMargin,
    // q266: per-user sums in lossless 1e-2 units, six exact integer
    // moment sums per variant + pooled, every output double one
    // pinned IEEE sequence; variant = q241's md5 fold mod 2
    "q266_cuped" ->
      """WITH u AS (SELECT user_id,
        |    CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
        |      THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
        |      THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY user_id),
        |uv AS MATERIALIZED (SELECT user_id, x, y,
        |    list_reduce(list_transform(range(1, 16),
        |      i -> CAST(strpos('0123456789abcdef',
        |        substring(md5(CAST(user_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) % 2 AS variant
        |  FROM u),
        |m AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM uv GROUP BY variant),
        |p AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM uv),
        |th AS (SELECT CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |    ELSE CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) END AS theta,
        |    (CAST(sx AS DOUBLE) / 100.0) / CAST(n AS DOUBLE) AS mean_pre_pooled
        |  FROM p),
        |v AS (SELECT m.variant, m.n AS n_users,
        |    (CAST(m.sx AS DOUBLE) / 100.0) / CAST(m.n AS DOUBLE) AS mean_pre,
        |    (CAST(m.sy AS DOUBLE) / 100.0) / CAST(m.n AS DOUBLE) AS mean_post,
        |    th.theta,
        |    (CAST(m.n * m.syy - m.sy * m.sy AS DOUBLE) / 10000.0)
        |      / CAST(m.n * m.n AS DOUBLE) AS var_post,
        |    (CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE) / 10000.0)
        |      / CAST(m.n * m.n AS DOUBLE) AS var_pre,
        |    (CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE) / 10000.0)
        |      / CAST(m.n * m.n AS DOUBLE) AS cov_pre_post,
        |    th.mean_pre_pooled
        |  FROM m, th)
        |SELECT variant, n_users, mean_pre, mean_post, theta,
        |  mean_post - theta * (mean_pre - mean_pre_pooled) AS mean_post_adj,
        |  var_post,
        |  (var_post - (2.0 * theta) * cov_pre_post)
        |    + (theta * theta) * var_pre AS var_post_adj,
        |  CASE WHEN var_post = 0.0 THEN NULL
        |    ELSE 1.0 - ((var_post - (2.0 * theta) * cov_pre_post)
        |      + (theta * theta) * var_pre) / var_post END AS var_reduction
        |FROM v ORDER BY variant""".stripMargin,
    // q267: exact-integer stratum moments, one sqrt, source-ordered
    // folds for the two cross-strata totals (strata are
    // dimension-bounded), pinned IEEE sequences for every share and
    // the two closed-form design variances
    "q267_neyman" ->
      """WITH st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM (SELECT source, CAST(n_chars AS BIGINT) AS y FROM documents)
        |  GROUP BY source),
        |sv AS (SELECT source, n_docs, sy,
        |    CAST(n_docs * syy - sy * sy AS DOUBLE)
        |      / CAST(n_docs * n_docs AS DOUBLE) AS var_y
        |  FROM st),
        |sw AS MATERIALIZED (SELECT source, n_docs, sy, var_y,
        |    sqrt(var_y) AS std_y,
        |    CAST(n_docs AS DOUBLE) * sqrt(var_y) AS ns,
        |    CAST(n_docs AS DOUBLE) * var_y AS nv
        |  FROM sv),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
        |    list_reduce(list_prepend(0.0, list(ns ORDER BY source)),
        |      (a, b) -> a + b) AS t_ns,
        |    list_reduce(list_prepend(0.0, list(nv ORDER BY source)),
        |      (a, b) -> a + b) AS t_nv
        |  FROM sw)
        |SELECT s.source, s.n_docs,
        |  CAST(s.sy AS DOUBLE) / CAST(s.n_docs AS DOUBLE) AS mean_chars,
        |  s.std_y AS std_chars,
        |  CASE WHEN t.t_ns = 0.0 THEN NULL ELSE s.ns / t.t_ns END AS neyman_share,
        |  CAST(s.n_docs AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS prop_share,
        |  (t.t_ns * t.t_ns) / 200.0 AS var_neyman,
        |  (CAST(t.n_total AS DOUBLE) / 200.0) * t.t_nv AS var_prop,
        |  CASE WHEN (CAST(t.n_total AS DOUBLE) / 200.0) * t.t_nv = 0.0 THEN NULL
        |    ELSE 1.0 - ((t.t_ns * t.t_ns) / 200.0)
        |      / ((CAST(t.n_total AS DOUBLE) / 200.0) * t.t_nv) END AS efficiency_gain
        |FROM sw s, tot t ORDER BY s.source""".stripMargin,
    // q268: q12's epoch-ms window recipe per chunk and on the full
    // data; the merge rule (fuse the one boundary pair iff gap <=
    // 30 min) is integer arithmetic on the chunk boundary rows
    "q268_session_merge" ->
      """WITH e AS (SELECT user_id, event_id, ts, epoch_ms(ts) AS ms,
        |    CAST(ts AS DATE) < DATE '2024-01-16' AS c1 FROM events),
        |s AS (SELECT user_id, c1, ms,
        |    CASE WHEN lag(ms) OVER (PARTITION BY user_id, c1 ORDER BY ts, event_id) IS NULL
        |      OR ms - lag(ms) OVER (PARTITION BY user_id, c1 ORDER BY ts, event_id) > 1800000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |g AS (SELECT user_id, c1, CAST(sum(new_s) AS BIGINT) AS n_sessions,
        |    min(ms) AS first_ms, max(ms) AS last_ms FROM s GROUP BY 1, 2),
        |a AS (SELECT user_id, n_sessions AS n1, last_ms AS end1 FROM g WHERE c1),
        |b AS (SELECT user_id, n_sessions AS n2, first_ms AS start2 FROM g WHERE NOT c1),
        |i AS (SELECT COALESCE(a.user_id, b.user_id) AS user_id,
        |    CAST(COALESCE(a.n1, 0) AS BIGINT) AS n_chunk1,
        |    CAST(COALESCE(b.n2, 0) AS BIGINT) AS n_chunk2,
        |    CAST(CASE WHEN a.end1 IS NOT NULL AND b.start2 IS NOT NULL
        |      AND b.start2 - a.end1 <= 1800000 THEN 1 ELSE 0 END AS BIGINT) AS merged
        |  FROM a FULL JOIN b ON a.user_id = b.user_id),
        |fs AS (SELECT user_id,
        |    CASE WHEN lag(ms) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      OR ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM e),
        |f AS (SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_full
        |  FROM fs GROUP BY 1)
        |SELECT f.user_id, f.n_full, i.n_chunk1, i.n_chunk2, i.merged,
        |  CAST(i.n_chunk1 + i.n_chunk2 - i.merged AS BIGINT) AS n_incr,
        |  CAST(i.n_chunk1 + i.n_chunk2 - i.merged = f.n_full AS INTEGER) AS ok
        |FROM f JOIN i ON i.user_id = f.user_id
        |ORDER BY f.user_id""".stripMargin,
    // q269: ntile(10) matches q104's integer-ntile parity; the minimax
    // closed form is three bounded joins over the bucket frame; every
    // interval mean one exact-integer divide, min/max of identical
    // doubles
    "q269_isotonic" ->
      s"""WITH $isotonicCtes
        |SELECT b.decile, b.n_docs, b.n_pos,
        |  CAST(b.n_pos AS DOUBLE) / CAST(b.n_docs AS DOUBLE) AS raw_rate,
        |  iso.iso_rate
        |FROM b JOIN iso ON iso.i = b.decile
        |ORDER BY b.decile""".stripMargin,
    // q270: Murphy decomposition over q269's buckets; every component
    // a decile-ordered fold of exact-integer-derived doubles
    "q270_brier" ->
      s"""WITH $isotonicCtes,
        |fin AS (SELECT b.decile, b.n_docs,
        |    CAST(b.n_pos AS DOUBLE) / CAST(b.n_docs AS DOUBLE) AS raw_rate,
        |    iso.iso_rate
        |  FROM b JOIN iso ON iso.i = b.decile),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n,
        |    CAST(sum(n_pos) AS BIGINT) AS pos FROM b)
        |SELECT t.n,
        |  CAST(t.pos AS DOUBLE) / CAST(t.n AS DOUBLE) AS p_bar,
        |  list_reduce(list_prepend(0.0, list(
        |    (CAST(f.n_docs AS DOUBLE) / CAST(t.n AS DOUBLE))
        |      * ((f.iso_rate * f.iso_rate - (2.0 * f.iso_rate) * f.raw_rate)
        |        + f.raw_rate) ORDER BY f.decile)), (a, b) -> a + b) AS brier,
        |  list_reduce(list_prepend(0.0, list(
        |    (CAST(f.n_docs AS DOUBLE) / CAST(t.n AS DOUBLE))
        |      * ((f.iso_rate - f.raw_rate) * (f.iso_rate - f.raw_rate))
        |    ORDER BY f.decile)), (a, b) -> a + b) AS reliability,
        |  list_reduce(list_prepend(0.0, list(
        |    (CAST(f.n_docs AS DOUBLE) / CAST(t.n AS DOUBLE))
        |      * ((f.raw_rate - CAST(t.pos AS DOUBLE) / CAST(t.n AS DOUBLE))
        |        * (f.raw_rate - CAST(t.pos AS DOUBLE) / CAST(t.n AS DOUBLE)))
        |    ORDER BY f.decile)), (a, b) -> a + b) AS resolution,
        |  (CAST(t.pos AS DOUBLE) / CAST(t.n AS DOUBLE))
        |    * (1.0 - CAST(t.pos AS DOUBLE) / CAST(t.n AS DOUBLE)) AS uncertainty
        |FROM fin f, t GROUP BY t.n, t.pos""".stripMargin,
    // q271: ranks, τ, depths all integers; the closed-form stop
    // search is one filtered min; scanned_frac one exact divide
    "q271_ta_depth" ->
      """WITH b AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS s1,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS s2 FROM documents),
        |r AS MATERIALIZED (SELECT doc_id, s1, s2,
        |    row_number() OVER (ORDER BY s1 DESC, doc_id) AS r1,
        |    row_number() OVER (ORDER BY s2 DESC, doc_id) AS r2,
        |    s1 + s2 AS f FROM b),
        |tk AS (SELECT CAST(min(f) AS BIGINT) AS kth_f,
        |    CAST(max(least(r1, r2)) AS BIGINT) AS d0
        |  FROM (SELECT f, r1, r2, doc_id FROM r ORDER BY f DESC, doc_id LIMIT 10)),
        |tau AS MATERIALIZED (SELECT a.r1 AS d, a.s1 + b2.s2 AS tau_d
        |  FROM r a JOIN r b2 ON b2.r2 = a.r1),
        |st AS (SELECT CAST(min(t.d) AS BIGINT) AS stop_depth FROM tau t, tk
        |  WHERE t.d >= tk.d0 AND t.tau_d <= tk.kth_f),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM b)
        |SELECT nn.n_docs, tk.kth_f, tk.d0, st.stop_depth,
        |  CAST(ts.tau_d AS BIGINT) AS tau_at_stop,
        |  CAST(st.stop_depth AS DOUBLE) / CAST(nn.n_docs AS DOUBLE) AS scanned_frac
        |FROM nn, tk, st JOIN tau ts ON ts.d = st.stop_depth""".stripMargin
  )

  // q269/q270's shared oracle chain: deciles → buckets → interval
  // means → the minimax isotonic fit
  private val isotonicCtes =
    """d AS (SELECT doc_id, n_chars,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
      |    ntile(10) OVER (ORDER BY n_chars, doc_id) AS decile
      |  FROM documents),
      |b AS MATERIALIZED (SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(pos) AS BIGINT) AS n_pos FROM d GROUP BY decile),
      |iv AS MATERIALIZED (SELECT a.decile AS j, c.decile AS kk,
      |    CAST(sum(m.n_pos) AS DOUBLE) / CAST(sum(m.n_docs) AS DOUBLE) AS avg_jk
      |  FROM b a JOIN b c ON a.decile <= c.decile
      |  JOIN b m ON m.decile BETWEEN a.decile AND c.decile
      |  GROUP BY 1, 2),
      |mn AS (SELECT i.decile AS i, v.j, min(v.avg_jk) AS mn
      |  FROM b i JOIN iv v ON v.j <= i.decile AND v.kk >= i.decile
      |  GROUP BY 1, 2),
      |iso AS (SELECT i, max(mn) AS iso_rate FROM mn GROUP BY i)""".stripMargin
}
