package graft

import graft.queries.{CoreQueries, LlmQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q01Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg" -> (CoreQueries.q01Agg(_, _)),
    "q02_join_topk" -> (CoreQueries.q02JoinTopk(_, _)),
    "q03_star_join" -> (CoreQueries.q03StarJoin(_, _)),
    "q04_window_rank" -> (CoreQueries.q04WindowRank(_, _)),
    "q05_events_hourly" -> (CoreQueries.q05EventsHourly(_, _)),
    "q06_sessionize" -> (CoreQueries.q06Sessionize(_, _)),
    "q10_compare_summary" -> (CoreQueries.q10CompareSummary(_, _)),
    "q11_compare_changed" -> (CoreQueries.q11CompareChanged(_, _)),
    "q12_schema_compare" -> (CoreQueries.q12SchemaCompare(_, _)),
    "q13_surrogate_key_string" -> (CoreQueries.q13SurrogateKeyString(_, _)),
    "q14_surrogate_key_hash" -> (CoreQueries.q14SurrogateKeyHash(_, _)),
    "q15_fk_broken" -> (CoreQueries.q15FkBroken(_, _)),
    "q16_latest_records" -> (CoreQueries.q16LatestRecords(_, _)),
    "q17_latest_conflicts" -> (CoreQueries.q17LatestConflicts(_, _)),
    "q18_pk_validate" -> (CoreQueries.q18PkValidate(_, _)),
    "q19_pk_combinations" -> (CoreQueries.q19PkCombinations(_, _)),
    "q20_dedup_exact" -> (LlmQueries.q20DedupExact(_, _)),
    "q21_dedup_minhash" -> (LlmQueries.q21DedupMinhash(_, _)),
    "q22_dedup_simhash" -> (LlmQueries.q22DedupSimhash(_, _)),
    "q23_dedup_ngram_jaccard" -> (LlmQueries.q23DedupNgramJaccard(_, _)),
    "q24_dedup_embedding" -> (LlmQueries.q24DedupEmbedding(_, _)),
    "q25_knn_brute" -> (LlmQueries.q25KnnBrute(_, _)),
    "q26_knn_lsh" -> (LlmQueries.q26KnnLsh(_, _)),
    "q27_lang_id" -> (LlmQueries.q27LangId(_, _)),
    "q28_text_quality" -> (LlmQueries.q28TextQuality(_, _)),
    "q29_token_count" -> (LlmQueries.q29TokenCount(_, _)),
    "q30_fingerprint" -> (LlmQueries.q30Fingerprint(_, _)),
    "q31_multimodal_meta" -> (LlmQueries.q31MultimodalMeta(_, _)),
    "q32_multimodal_features" -> (LlmQueries.q32MultimodalFeatures(_, _)),
    "q33_knn_ivf" -> (LlmQueries.q33KnnIvf(_, _)),
    "q34_asof_join" -> (CoreQueries.q34AsofJoin(_, _)),
    "q35_range_join" -> (CoreQueries.q35RangeJoin(_, _)),
    "q36_asof_native" -> (CoreQueries.q36AsofNative(_, _)),
    "q37_dedup_clusters" -> (LlmQueries.q37DedupClusters(_, _)),
    "q38_dq_rules" -> (CoreQueries.q38DqRules(_, _)),
    "q39_quantiles" -> (CoreQueries.q39Quantiles(_, _)),
    "q40_profile" -> (CoreQueries.q40Profile(_, _)),
    "q41_sample_stratified" -> (CoreQueries.q41SampleStratified(_, _)),
    "q42_scd2" -> (CoreQueries.q42Scd2(_, _)),
    "q43_top_tokens" -> (LlmQueries.q43TopTokens(_, _)),
    "q44_pii_scan" -> (LlmQueries.q44PiiScan(_, _)),
    "q45_split_assign" -> (LlmQueries.q45SplitAssign(_, _)),
    "q46_ttr" -> (LlmQueries.q46Ttr(_, _)),
    "q47_contamination" -> (LlmQueries.q47Contamination(_, _)),
    "q48_repetition" -> (LlmQueries.q48Repetition(_, _)),
    "q49_histogram" -> (CoreQueries.q49Histogram(_, _)),
    "q50_asof_forward" -> (CoreQueries.q50AsofForward(_, _)),
    "q51_fd_violations" -> (CoreQueries.q51FdViolations(_, _)),
    "q52_gopher_filters" -> (LlmQueries.q52GopherFilters(_, _)),
    "q53_cdc_upsert" -> (CoreQueries.q53CdcUpsert(_, _)),
    "q54_weighted_sample" -> (LlmQueries.q54WeightedSample(_, _)),
    "q55_iqr_outliers" -> (CoreQueries.q55IqrOutliers(_, _)),
    "q56_knn_multiprobe" -> (LlmQueries.q56KnnMultiprobe(_, _)),
    "q57_dedup_canonical" -> (LlmQueries.q57DedupCanonical(_, _)),
    "q58_profile_drift" -> (CoreQueries.q58ProfileDrift(_, _)),
    "q59_dq_rules_by_group" -> (CoreQueries.q59DqRulesByGroup(_, _)),
    "q60_mixture_report" -> (LlmQueries.q60MixtureReport(_, _)),
    "q61_rollup" -> (CoreQueries.q61Rollup(_, _)),
    "q62_pivot" -> (CoreQueries.q62Pivot(_, _)),
    "q63_resample" -> (CoreQueries.q63Resample(_, _)),
    "q64_ffill" -> (CoreQueries.q64Ffill(_, _)),
    "q65_moving_avg" -> (CoreQueries.q65MovingAvg(_, _)),
    "q66_reconcile" -> (CoreQueries.q66Reconcile(_, _)),
    "q67_bloom_join" -> (CoreQueries.q67BloomJoin(_, _)),
    "q68_dist_drift" -> (CoreQueries.q68DistDrift(_, _)),
    "q69_source_cap" -> (LlmQueries.q69SourceCap(_, _)),
    "q70_pack" -> (LlmQueries.q70Pack(_, _)),
    "q71_scd2_merge" -> (CoreQueries.q71Scd2Merge(_, _)),
    "q72_time_align" -> (CoreQueries.q72TimeAlign(_, _)),
    "q73_fuzzy_match" -> (CoreQueries.q73FuzzyMatch(_, _)),
    "q74_anomalies" -> (CoreQueries.q74Anomalies(_, _)),
    "q75_reconcile_repair" -> (CoreQueries.q75ReconcileRepair(_, _)),
    "q76_curation_pipeline" -> (LlmQueries.q76CurationPipeline(_, _)),
    "q77_span_stats" -> (LlmQueries.q77SpanStats(_, _)),
    "q78_span_rewrite" -> (LlmQueries.q78SpanRewrite(_, _)),
    "q79_json_flatten" -> (CoreQueries.q79JsonFlatten(_, _)),
    "q80_shards" -> (LlmQueries.q80Shards(_, _)),
    "q81_temperature_mix" -> (LlmQueries.q81TemperatureMix(_, _)),
    "q82_top_fraction" -> (LlmQueries.q82TopFraction(_, _)),
    "q83_knn_pq" -> (LlmQueries.q83KnnPq(_, _)),
    "q84_embedding_pipeline" -> (LlmQueries.q84EmbeddingPipeline(_, _)),
    "q85_knn_ivf_prebuilt" -> (LlmQueries.q85KnnIvfPrebuilt(_, _)),
    "q86_knn_ivfpq" -> (LlmQueries.q86KnnIvfPq(_, _)),
    "q87_temperature_dyadic" -> (LlmQueries.q87TemperatureMixDyadic(_, _)),
    // q88 packs under a CORPUS-TRAINED vocab via a token-count fixture the
    // oracle reads back — full hash gate (training/merging spec-gated)
    "q88_pack_bpe" -> (LlmQueries.q88PackBpe(_, _)),
    "q89_sliding_chunks" -> (LlmQueries.q89SlidingChunks(_, _)),
    "q90_csv_roundtrip" -> (CoreQueries.q90CsvRoundtrip(_, _)),
    "q91_jsonl_roundtrip" -> (CoreQueries.q91JsonlRoundtrip(_, _)),
    "q92_lm_score" -> (LlmQueries.q92LmScore(_, _)),
    "q93_cc_incremental" -> (LlmQueries.q93CcIncremental(_, _)),
    "q94_epoch_plan" -> (LlmQueries.q94EpochPlan(_, _)),
    "q95_epoch_expand" -> (LlmQueries.q95EpochExpand(_, _)),
    "q96_knn_ivfpq_prebuilt" -> (LlmQueries.q96KnnIvfPqPrebuilt(_, _)),
    "q97_cc_incremental_prebuilt" -> (LlmQueries.q97CcIncrementalPrebuilt(_, _)),
    "q98_bm25" -> (LlmQueries.q98Bm25(_, _)),
    "q99_bm25_prebuilt" -> (LlmQueries.q99Bm25Prebuilt(_, _)),
    "q100_hybrid_rrf" -> (LlmQueries.q100HybridRrf(_, _)),
    "q101_ks_drift" -> (CoreQueries.q101KsDrift(_, _)),
    "q102_semantic_dedup" -> (LlmQueries.q102SemanticDedup(_, _)),
    "q103_dsir_select" -> (LlmQueries.q103DsirSelect(_, _)),
    "q104_packed_sequences" -> (LlmQueries.q104PackedSequences(_, _)),
    "q105_line_dedup_scrub" -> (LlmQueries.q105LineDedupScrub(_, _)),
    "q106_dsir_prebuilt" -> (LlmQueries.q106DsirPrebuilt(_, _)),
    "q107_normalize_scrub" -> (LlmQueries.q107NormalizeScrub(_, _)),
    "q108_url_canonical" -> (LlmQueries.q108UrlCanonical(_, _)),
    "q109_training_order" -> (LlmQueries.q109TrainingOrder(_, _)),
    "q110_intradoc_repetition" -> (LlmQueries.q110IntraDocRepetition(_, _)),
    "q111_url_pipeline" -> (LlmQueries.q111UrlCurationPipeline(_, _)),
    "q112_tokenizer_fertility" -> (LlmQueries.q112TokenizerFertility(_, _)),
    "q113_cc_distributed" -> (LlmQueries.q113DedupClustersDistributed(_, _)),
    "q114_tokenizer_report" -> (LlmQueries.q114TokenizerReport(_, _)),
    "q115_perplexity_buckets" -> (LlmQueries.q115PerplexityBuckets(_, _)),
    "q116_html_extract" -> (LlmQueries.q116HtmlExtract(_, _)),
    "q117_domain_blocklist" -> (LlmQueries.q117DomainBlocklist(_, _)),
    "q118_decontamination_scrub" -> (LlmQueries.q118DecontaminationScrub(_, _)),
    "q119_curation_funnel" -> (LlmQueries.q119CurationFunnelV2(_, _)),
    "q120_intradoc_line_scrub" -> (LlmQueries.q120IntraDocLineScrub(_, _)),
    "q121_gopher_repetition" -> (LlmQueries.q121GopherRepetitionTable(_, _)),
    "q122_truncate_budget" -> (LlmQueries.q122TruncateBudget(_, _)),
    "q123_line_scrub_incremental" -> (LlmQueries.q123LineScrubIncremental(_, _)),
    "q124_exactsubstr" -> (LlmQueries.q124ExactSubstr(_, _)),
    "q125_quality_classifier" -> (LlmQueries.q125QualityClassifier(_, _)),
    "q126_image_neardup" -> (LlmQueries.q126ImageNearDup(_, _)),
    "q127_numeric_entities" -> (LlmQueries.q127NumericEntities(_, _)),
    "q128_hll_distinct" -> (CoreQueries.q128HllDistinct(_, _)),
    "q129_cms_top_tokens" -> (CoreQueries.q129CmsTopTokens(_, _)),
    "q130_orc_roundtrip" -> (CoreQueries.q130OrcRoundtrip(_, _)),
    "q131_salted_join" -> (CoreQueries.q131SaltedJoin(_, _)),
    "q132_pagerank" -> (CoreQueries.q132PageRank(_, _)),
    "q133_containment" -> (LlmQueries.q133Containment(_, _)),
    "q134_chat_template" -> (LlmQueries.q134ChatTemplate(_, _)),
    "q135_triangles" -> (CoreQueries.q135Triangles(_, _)),
    "q136_funnel" -> (CoreQueries.q136Funnel(_, _)),
    "q137_retention" -> (CoreQueries.q137Retention(_, _)),
    "q138_transitions" -> (CoreQueries.q138Transitions(_, _)),
    "q139_kcore" -> (CoreQueries.q139KCore(_, _)),
    "q140_asof_nearest" -> (CoreQueries.q140AsofNearest(_, _)),
    "q141_hopping_rollup" -> (CoreQueries.q141HoppingRollup(_, _)),
    "q142_sentences" -> (LlmQueries.q142Sentences(_, _)),
    "q143_retrieval_eval" -> (LlmQueries.q143RetrievalEval(_, _)),
    "q144_classifier_eval" -> (LlmQueries.q144ClassifierEval(_, _)),
    "q145_bpe_sampled" -> (LlmQueries.q145BpeSampled(_, _)),
    "q146_sentence_chunks" -> (LlmQueries.q146SentenceChunks(_, _)),
    "q147_pii_checksum" -> (LlmQueries.q147PiiChecksum(_, _)),
    "q148_hll_overlap" -> (CoreQueries.q148HllOverlap(_, _)),
    "q149_ndcg_eval" -> (LlmQueries.q149NdcgEval(_, _)),
    "q150_skew_profile" -> (CoreQueries.q150SkewProfile(_, _)),
    "q151_embedding_quality" -> (CoreQueries.q151EmbeddingQuality(_, _)),
    "q152_mad_outliers" -> (CoreQueries.q152MadOutliers(_, _)),
    "q153_harmonic" -> (CoreQueries.q153Harmonic(_, _)),
    "q154_quantile_sketch" -> (CoreQueries.q154QuantileSketch(_, _)),
    "q155_join_cardinality" -> (CoreQueries.q155JoinCardinality(_, _)),
    "q156_k_anonymity" -> (CoreQueries.q156KAnonymity(_, _)),
    "q157_temporal_split" -> (CoreQueries.q157TemporalSplit(_, _)),
    "q158_nfkc_keys" -> (CoreQueries.q158NfkcKeys(_, _)),
    "q159_debounce" -> (CoreQueries.q159Debounce(_, _)),
    "q160_line_lang_profile" -> (LlmQueries.q160LineLangProfile(_, _)),
    "q161_top_paths" -> (CoreQueries.q161TopPaths(_, _)),
    "q162_l_diversity" -> (CoreQueries.q162LDiversity(_, _)),
    "q163_calibration" -> (LlmQueries.q163Calibration(_, _)),
    "q164_centroid_drift" -> (CoreQueries.q164CentroidDrift(_, _)),
    "q165_personalized_pagerank" -> (CoreQueries.q165PersonalizedPagerank(_, _)),
    "q166_graph_ann_eval" -> (LlmQueries.q166GraphAnnEval(_, _)),
    "q167_graph_ann_fold" -> (LlmQueries.q167GraphAnnFold(_, _)),
    "q168_classifier_auc" -> (LlmQueries.q168ClassifierAuc(_, _)),
    "q169_t_closeness" -> (CoreQueries.q169TCloseness(_, _)),
    "q170_quantiles_bucketed" -> (CoreQueries.q170QuantilesBucketed(_, _)),
    "q171_winsorize" -> (CoreQueries.q171Winsorize(_, _)),
    "q172_chi_square_drift" -> (CoreQueries.q172ChiSquareDrift(_, _)),
    "q173_sorted_neighborhood" -> (LlmQueries.q173SortedNeighborhood(_, _)),
    "q174_graph_ann_layered" -> (LlmQueries.q174GraphAnnLayered(_, _)),
    "q175_sorted_neighborhood_fold" -> (LlmQueries.q175SortedNeighborhoodFold(_, _)),
    "q176_judge_kappa" -> (LlmQueries.q176JudgeKappa(_, _)),
    "q177_correlation" -> (CoreQueries.q177Correlation(_, _)),
    "q178_split_leakage" -> (LlmQueries.q178SplitLeakage(_, _)),
    "q179_bootstrap" -> (LlmQueries.q179Bootstrap(_, _)),
    "q180_cusum" -> (CoreQueries.q180Cusum(_, _)),
    "q181_benford" -> (CoreQueries.q181Benford(_, _)),
    "q182_bootstrap_by_source" -> (LlmQueries.q182BootstrapBySource(_, _)),
    "q183_generalize" -> (CoreQueries.q183Generalize(_, _)),
    "q184_readability" -> (LlmQueries.q184Readability(_, _)),
    "q185_correlation_matrix" -> (CoreQueries.q185CorrelationMatrix(_, _)),
    "q186_gini" -> (CoreQueries.q186Gini(_, _)),
    "q187_spearman" -> (CoreQueries.q187Spearman(_, _)),
    "q188_spearman_bucketed" -> (CoreQueries.q188SpearmanBucketed(_, _)),
    "q189_gini_bucketed" -> (CoreQueries.q189GiniBucketed(_, _)),
    "q190_winsorize_bucketed" -> (CoreQueries.q190WinsorizeBucketed(_, _)),
    "q191_spearman_sketch" -> (CoreQueries.q191SpearmanSketch(_, _)),
    "q192_spearman_matrix" -> (CoreQueries.q192SpearmanMatrix(_, _)),
    "q193_correlation_drift" -> (CoreQueries.q193CorrelationDrift(_, _)),
    "q194_split_leakage_fold" -> (LlmQueries.q194SplitLeakageFold(_, _)),
    "q195_edit_distance_pairs" -> (LlmQueries.q195EditDistancePairs(_, _)),
    "q196_simpson_diversity" -> (CoreQueries.q196SimpsonDiversity(_, _)),
    "q197_spearman_matrix_bucketed" -> (CoreQueries.q197SpearmanMatrixBucketed(_, _)),
    "q198_spearman_drift" -> (CoreQueries.q198SpearmanDrift(_, _)),
    "q199_rbo" -> (LlmQueries.q199Rbo(_, _)),
    "q200_association" -> (CoreQueries.q200Association(_, _)),
    "q201_mutual_information" -> (CoreQueries.q201MutualInformation(_, _)),
    "q202_token_entropy" -> (LlmQueries.q202TokenEntropy(_, _)),
    "q203_js_divergence" -> (CoreQueries.q203JsDivergence(_, _)),
    "q204_zipf" -> (LlmQueries.q204Zipf(_, _)),
    "q205_heaps" -> (LlmQueries.q205Heaps(_, _)),
    "q206_ewma" -> (CoreQueries.q206Ewma(_, _)),
    "q207_kendall" -> (CoreQueries.q207Kendall(_, _)),
    "q208_fellegi_sunter" -> (LlmQueries.q208FellegiSunter(_, _)),
    "q209_association_summary" -> (CoreQueries.q209AssociationSummary(_, _)),
    "q210_kendall_bucketed" -> (CoreQueries.q210KendallBucketed(_, _)),
    "q211_jaro_winkler" -> (LlmQueries.q211JaroWinkler(_, _)),
    "q212_collocations" -> (LlmQueries.q212Collocations(_, _)),
    "q213_rolling_correlation" -> (CoreQueries.q213RollingCorrelation(_, _)),
    "q214_acf" -> (CoreQueries.q214Acf(_, _)),
    "q215_kruskal_wallis" -> (CoreQueries.q215KruskalWallis(_, _)),
    "q216_mann_kendall" -> (CoreQueries.q216MannKendall(_, _)),
    "q217_theil_sen" -> (CoreQueries.q217TheilSen(_, _)),
    "q218_triangles" -> (LlmQueries.q218Triangles(_, _)),
    "q219_weighted_sample" -> (LlmQueries.q219WeightedSample(_, _)),
    "q220_theil_sen_bucketed" -> (CoreQueries.q220TheilSenBucketed(_, _)),
    "q221_mann_whitney" -> (CoreQueries.q221MannWhitney(_, _)),
    "q222_wasserstein_drift" -> (CoreQueries.q222WassersteinDrift(_, _)),
    "q223_seasonal_anomalies" -> (CoreQueries.q223SeasonalAnomalies(_, _)),
    "q224_cooccurrence" -> (LlmQueries.q224Cooccurrence(_, _)),
    "q225_regression" -> (CoreQueries.q225Regression(_, _)),
    "q226_changepoint" -> (CoreQueries.q226Changepoint(_, _)),
    "q227_waterfill" -> (CoreQueries.q227Waterfill(_, _)),
    "q228_apportion" -> (CoreQueries.q228Apportion(_, _)),
    "q229_two_proportion" -> (CoreQueries.q229TwoProportion(_, _)),
    "q230_vocab_profile" -> (LlmQueries.q230VocabProfile(_, _)),
    "q231_cluster_sizes" -> (LlmQueries.q231ClusterSizes(_, _)),
    "q232_hellinger_drift" -> (LlmQueries.q232HellingerDrift(_, _)),
    "q233_effective_sample_size" -> (LlmQueries.q233EffectiveSampleSize(_, _)),
    "q234_krippendorff" -> (LlmQueries.q234Krippendorff(_, _)),
    "q235_association_matrix" -> (CoreQueries.q235AssociationMatrix(_, _)),
    "q236_quantile_normalize" -> (CoreQueries.q236QuantileNormalize(_, _)),
    "q237_kfold" -> (LlmQueries.q237KFold(_, _)),
    "q238_allocated_sample" -> (LlmQueries.q238AllocatedSample(_, _)),
    "q239_threshold_sweep" -> (LlmQueries.q239ThresholdSweep(_, _)),
    "q240_vocab_churn" -> (LlmQueries.q240VocabChurn(_, _)),
    "q241_mad_bucketed" -> (CoreQueries.q241MadOutliersBucketed(_, _)),
    "q242_iqr_bucketed" -> (CoreQueries.q242IqrBucketed(_, _)),
    "q243_trimmed_mean" -> (CoreQueries.q243TrimmedMean(_, _)),
    "q244_gap_analysis" -> (CoreQueries.q244GapAnalysis(_, _)),
    "q245_cmh" -> (CoreQueries.q245Cmh(_, _)),
    "q246_changepoint_from_store" -> (CoreQueries.q246ChangepointFromStore(_, _)),
    "q247_vocab_profile_from_store" -> (LlmQueries.q247VocabProfileFromStore(_, _)),
    "q248_cluster_sizes_incremental" -> (LlmQueries.q248ClusterSizesIncremental(_, _)),
    "q249_cmh_from_store" -> (CoreQueries.q249CmhFromStore(_, _)),
    "q250_brown_forsythe" -> (CoreQueries.q250BrownForsythe(_, _)),
    "q251_bh_fdr" -> (CoreQueries.q251BhFdr(_, _)),
    "q252_vocab_richness" -> (LlmQueries.q252VocabRichness(_, _)),
    "q253_vocab_overlap" -> (LlmQueries.q253VocabOverlap(_, _)),
    "q254_mcnemar" -> (CoreQueries.q254Mcnemar(_, _)),
    "q255_runs_test" -> (CoreQueries.q255RunsTest(_, _)),
    "q256_kw_from_store" -> (CoreQueries.q256KwFromStore(_, _)),
    "q257_mw_from_store" -> (CoreQueries.q257MwFromStore(_, _)),
    "q258_bf_from_store" -> (CoreQueries.q258BfFromStore(_, _)),
    "q259_script_profile" -> (LlmQueries.q259ScriptProfile(_, _)),
    "q260_boilerplate_prefix" -> (LlmQueries.q260BoilerplatePrefix(_, _)),
    "q261_w1_from_store" -> (CoreQueries.q261W1FromStore(_, _)),
    "q262_hellinger_from_store" -> (LlmQueries.q262HellingerFromStore(_, _)),
    "q263_profile_cube" -> (CoreQueries.q263ProfileCube(_, _)),
    "q264_weighted_median" -> (CoreQueries.q264WeightedMedian(_, _)),
    "q265_embedding_audit" -> (LlmQueries.q265EmbeddingAudit(_, _)),
    "q266_neyman_allocation" -> (CoreQueries.q266NeymanAllocation(_, _)),
    "q267_quantile_shift" -> (CoreQueries.q267QuantileShift(_, _)),
    "q268_mixture_distance" -> (LlmQueries.q268MixtureDistance(_, _)),
    "q269_friedman" -> (LlmQueries.q269Friedman(_, _)),
    "q270_cronbach" -> (LlmQueries.q270Cronbach(_, _)),
    "q271_cohens_d" -> (CoreQueries.q271CohensD(_, _)),
    "q272_ks_from_store" -> (CoreQueries.q272KsFromStore(_, _)),
    "q273_quantile_shift_bucketed" -> (CoreQueries.q273QuantileShiftBucketed(_, _)),
    "q274_threshold_sweep_dist" -> (LlmQueries.q274ThresholdSweepDist(_, _)),
    "q275_auc_from_store" -> (LlmQueries.q275AucFromStore(_, _)),
    "q276_quantile_shift_from_store" -> (CoreQueries.q276QuantileShiftFromStore(_, _)),
    "q277_fleiss_kappa" -> (CoreQueries.q277FleissKappa(_, _)),
    "q278_anova_f" -> (CoreQueries.q278AnovaF(_, _)),
    "q279_welch_t" -> (CoreQueries.q279WelchT(_, _)),
    "q280_cvm_drift" -> (CoreQueries.q280CvmDrift(_, _)),
    "q281_weighted_median_from_store" -> (CoreQueries.q281WeightedMedianFromStore(_, _)),
    "q282_cvm_from_store" -> (CoreQueries.q282CvmFromStore(_, _)),
    "q283_holm_fwer" -> (CoreQueries.q283HolmFwer(_, _)),
    "q284_g_test_drift" -> (CoreQueries.q284GTestDrift(_, _)),
    "q285_kaplan_meier" -> (CoreQueries.q285KaplanMeier(_, _)),
    "q286_log_rank" -> (CoreQueries.q286LogRank(_, _)),
    "q287_km_from_store" -> (CoreQueries.q287KmFromStore(_, _)),
    "q288_nelson_aalen" -> (CoreQueries.q288NelsonAalen(_, _)),
    "q289_weighted_kappa" -> (CoreQueries.q289WeightedKappa(_, _)),
    "q290_yule_k" -> (CoreQueries.q290YuleK(_, _)),
    "q291_rmst" -> (CoreQueries.q291Rmst(_, _)),
    "q292_proportion_effects" -> (CoreQueries.q292ProportionEffects(_, _)),
    "q293_page_trend" -> (CoreQueries.q293PageTrend(_, _)),
    "q294_log_rank_from_store" -> (CoreQueries.q294LogRankFromStore(_, _)),
    "q295_rmst_from_store" -> (CoreQueries.q295RmstFromStore(_, _)),
    "q296_log_rank_stratified" -> (CoreQueries.q296LogRankStratified(_, _)),
    "q297_aalen_johansen" -> (CoreQueries.q297AalenJohansen(_, _)),
    "q298_cuped" -> (CoreQueries.q298Cuped(_, _)),
    "q299_msprt_two_prop" -> (CoreQueries.q299MsprtTwoProp(_, _)),
    "q300_msprt_mean" -> (CoreQueries.q300MsprtMean(_, _)),
    "q301_cif_from_store" -> (CoreQueries.q301CifFromStore(_, _)),
    "q302_median_survival" -> (CoreQueries.q302MedianSurvival(_, _)),
    "q303_anderson_darling" -> (CoreQueries.q303AndersonDarling(_, _)),
    "q304_ad_from_store" -> (CoreQueries.q304AdFromStore(_, _)),
    "q305_delta_ratio" -> (CoreQueries.q305DeltaRatio(_, _)),
    "q306_srm_check" -> (CoreQueries.q306SrmCheck(_, _)),
    "q307_cochran_q" -> (CoreQueries.q307CochranQ(_, _)),
    "q308_jonckheere" -> (CoreQueries.q308Jonckheere(_, _)),
    "q309_ece" -> (CoreQueries.q309Ece(_, _)),
    "q310_hosmer_lemeshow" -> (CoreQueries.q310HosmerLemeshow(_, _)),
    "q311_calibration_from_store" -> (CoreQueries.q311CalibrationFromStore(_, _)),
    "q312_concordance" -> (CoreQueries.q312Concordance(_, _)),
    "q313_concordance_from_store" -> (CoreQueries.q313ConcordanceFromStore(_, _)),
    "q314_always_valid_ci" -> (CoreQueries.q314AlwaysValidCi(_, _)),
    "q315_chapman" -> (CoreQueries.q315Chapman(_, _)),
    "q316_benjamini_yekutieli" -> (CoreQueries.q316BenjaminiYekutieli(_, _)),
    "q317_post_stratified" -> (CoreQueries.q317PostStratified(_, _)),
    "q318_cochran_armitage" -> (CoreQueries.q318CochranArmitage(_, _)),
    "q319_fleming_harrington" -> (CoreQueries.q319FlemingHarrington(_, _)),
    "q320_brunner_munzel" -> (CoreQueries.q320BrunnerMunzel(_, _)),
    "q321_mood_median" -> (CoreQueries.q321MoodMedian(_, _)),
    "q322_log_rank_trend" -> (CoreQueries.q322LogRankTrend(_, _)),
    "q323_av_ci_two_prop" -> (CoreQueries.q323AvCiTwoProp(_, _)),
    "q324_wilson_ci" -> (CoreQueries.q324WilsonCi(_, _)),
    "q325_icc_deff" -> (CoreQueries.q325IccDeff(_, _)),
    "q326_ab_dashboard" -> (CoreQueries.q326AbDashboard(_, _)),
    "q327_ab_dashboard_from_store" -> (CoreQueries.q327AbDashboardFromStore(_, _)),
    "q328_power_two_prop" -> (CoreQueries.q328PowerTwoProp(_, _)),
    "q329_power_mean" -> (CoreQueries.q329PowerMean(_, _)),
    "q330_group_seq_obf" -> (CoreQueries.q330GroupSeqObf(_, _)),
    "q331_group_seq_pocock" -> (CoreQueries.q331GroupSeqPocock(_, _)),
    "q332_group_seq_mean" -> (CoreQueries.q332GroupSeqMean(_, _)),
    "q333_srm_sequential" -> (CoreQueries.q333SrmSequential(_, _)),
    "q334_meta_effects" -> (CoreQueries.q334MetaEffects(_, _)),
    "q335_conditional_power" -> (CoreQueries.q335ConditionalPower(_, _)),
    "q336_survival_dashboard" -> (CoreQueries.q336SurvivalDashboard(_, _)),
    "q337_survival_dashboard_from_store" ->
      (CoreQueries.q337SurvivalDashboardFromStore(_, _)),
    "q338_data_card" -> (CoreQueries.q338DataCard(_, _)),
    "q339_rate_ratio" -> (CoreQueries.q339RateRatio(_, _)),
    "q340_diff_in_diff" -> (CoreQueries.q340DiffInDiff(_, _)),
    "q341_eb_shrinkage" -> (CoreQueries.q341EbShrinkage(_, _)),
    "q342_mh_rate_ratio" -> (CoreQueries.q342MhRateRatio(_, _)),
    "q343_drift_card" -> (CoreQueries.q343DriftCard(_, _)),
    "q344_drift_card_from_store" -> (CoreQueries.q344DriftCardFromStore(_, _)),
    "q345_ab_dashboard_karm" -> (CoreQueries.q345AbDashboardKArm(_, _)),
    "q346_scorecard" -> (CoreQueries.q346Scorecard(_, _)),
    "q347_cuped_multi" -> (CoreQueries.q347CupedMulti(_, _)),
    "q348_scorecard_from_store" -> (CoreQueries.q348ScorecardFromStore(_, _)),
    "q349_ab_karm_from_store" -> (CoreQueries.q349AbDashboardKArmFromStore(_, _)),
    "q350_qte" -> (CoreQueries.q350Qte(_, _)),
    "q351_yuen_t" -> (CoreQueries.q351YuenT(_, _)),
    "q352_paired_t" -> (CoreQueries.q352PairedT(_, _)),
    "q353_wilcoxon_signed_rank" -> (CoreQueries.q353WilcoxonSignedRank(_, _)),
    "q354_paired_t_from_store" -> (CoreQueries.q354PairedTFromStore(_, _)),
    "q355_wilcoxon_from_store" -> (CoreQueries.q355WilcoxonFromStore(_, _)),
    "q356_tost_equivalence" -> (CoreQueries.q356Tost(_, _)),
    "q357_tost_mean" -> (CoreQueries.q357TostMean(_, _)),
    "q358_hodges_lehmann" -> (CoreQueries.q358HodgesLehmann(_, _)),
    "q359_bayes_ab" -> (CoreQueries.q359BayesAb(_, _)),
    "q360_bayes_ab_from_store" -> (CoreQueries.q360BayesAbFromStore(_, _)),
    "q361_cox_ph" -> (CoreQueries.q361CoxPh(_, _)),
    "q362_cox_from_store" -> (CoreQueries.q362CoxFromStore(_, _)),
    "q363_hl_two_sample" -> (CoreQueries.q363HlTwoSample(_, _)),
    "q364_ab_karm_cuped2" -> (CoreQueries.q364AbKArmCuped2(_, _)),
    "q365_effect_heterogeneity" -> (CoreQueries.q365EffectHeterogeneity(_, _)),
    "q366_quantile_monitor" -> (CoreQueries.q366QuantileMonitor(_, _)),
    "q367_bayes_mean" -> (CoreQueries.q367BayesMean(_, _)),
    "q368_bayes_mean_from_store" -> (CoreQueries.q368BayesMeanFromStore(_, _)),
    "q369_ratio_delta" -> (CoreQueries.q369RatioDelta(_, _)),
    "q370_ratio_delta_from_store" -> (CoreQueries.q370RatioDeltaFromStore(_, _)),
    "q371_cox_ph2" -> (CoreQueries.q371CoxPh2(_, _)),
    "q372_cox2_from_store" -> (CoreQueries.q372Cox2FromStore(_, _)),
    "q373_cliffs_delta" -> (CoreQueries.q373CliffsDelta(_, _)),
    "q374_msprt_rate" -> (CoreQueries.q374MsprtRate(_, _)),
    "q375_av_ci_rate" -> (CoreQueries.q375AvCiRate(_, _)),
    "q376_isotonic_fit" -> (CoreQueries.q376IsotonicFit(_, _)),
    "q377_power_rate" -> (CoreQueries.q377PowerRate(_, _)),
    "q378_ratio_cuped" -> (CoreQueries.q378RatioCuped(_, _)),
    "q379_ratio_cuped_from_store" -> (CoreQueries.q379RatioCupedFromStore(_, _)),
    "q380_bayes_rate" -> (CoreQueries.q380BayesRate(_, _)),
    "q381_bayes_rate_from_store" -> (CoreQueries.q381BayesRateFromStore(_, _)),
    "q382_bayes_best" -> (CoreQueries.q382BayesBest(_, _))
  )

  /** DuckDB-compatible oracle SQL per query (same parquet tables). */
  /** The skew-safe ("bucketed") twins select the SAME exact statistics as
    * their windowed arms — rank selection has one right answer regardless
    * of layout — so they share the arm's oracle verbatim: a divergence is
    * a layout bug by definition.
    */
  def oracleSql: Map[String, String] = oracleBase ++ Map(
    "q188_spearman_bucketed" -> oracleBase("q187_spearman"),
    "q189_gini_bucketed" -> oracleBase("q186_gini"),
    "q190_winsorize_bucketed" -> oracleBase("q171_winsorize"),
    "q197_spearman_matrix_bucketed" -> oracleBase("q192_spearman_matrix"),
    "q241_mad_bucketed" -> oracleBase("q152_mad_outliers"),
    "q242_iqr_bucketed" -> oracleBase("q55_iqr_outliers"),
    "q243_trimmed_mean" -> trimmedMeanOracle,
    "q244_gap_analysis" -> gapAnalysisOracle,
    "q245_cmh" -> cmhOracle,
    "q214_acf" -> acfOracle,
    "q215_kruskal_wallis" -> kruskalWallisOracle,
    "q216_mann_kendall" -> mannKendallOracle,
    "q217_theil_sen" -> theilSenOracle,
    "q218_triangles" -> trianglesOracle,
    "q219_weighted_sample" -> weightedSampleOracle,
    "q220_theil_sen_bucketed" -> theilSenOracle,
    "q221_mann_whitney" -> mannWhitneyOracle,
    "q222_wasserstein_drift" -> wassersteinOracle,
    "q223_seasonal_anomalies" -> seasonalOracle,
    "q224_cooccurrence" -> cooccurrenceOracle,
    "q225_regression" -> regressionOracle,
    "q226_changepoint" -> changepointOracle,
    "q227_waterfill" -> waterfillOracle,
    "q228_apportion" -> apportionOracle,
    "q229_two_proportion" -> twoProportionOracle,
    "q230_vocab_profile" -> vocabProfileOracle,
    "q231_cluster_sizes" -> clusterSizesOracle,
    "q232_hellinger_drift" -> hellingerOracle,
    "q233_effective_sample_size" -> essOracle,
    "q234_krippendorff" -> krippendorffOracle,
    "q235_association_matrix" -> associationMatrixOracle,
    "q236_quantile_normalize" -> quantileNormalizeOracle,
    "q237_kfold" -> kFoldOracle,
    "q238_allocated_sample" -> allocatedSampleOracle,
    "q239_threshold_sweep" -> thresholdSweepOracle,
    "q240_vocab_churn" -> vocabChurnOracle,
    // from-STORE twins: a fold must equal the rebuild, so each shares
    // its batch arm's oracle verbatim — a divergence is a fold bug by
    // definition (the q188/q241 twin convention applied to state)
    "q246_changepoint_from_store" -> changepointOracle,
    "q247_vocab_profile_from_store" -> vocabProfileOracle,
    "q248_cluster_sizes_incremental" -> clusterSizesIncrementalOracle,
    "q249_cmh_from_store" -> cmhOracle,
    "q250_brown_forsythe" -> brownForsytheOracle,
    "q251_bh_fdr" -> bhFdrOracle,
    "q252_vocab_richness" -> vocabRichnessOracle,
    "q253_vocab_overlap" -> vocabOverlapOracle,
    "q254_mcnemar" -> mcnemarOracle,
    "q255_runs_test" -> runsTestOracle,
    // rank-family from-STORE twins: fold == rebuild, batch oracles verbatim
    "q256_kw_from_store" -> kruskalWallisOracle,
    "q257_mw_from_store" -> mannWhitneyOracle,
    "q258_bf_from_store" -> brownForsytheOracle,
    "q259_script_profile" -> scriptProfileOracle,
    "q260_boilerplate_prefix" -> boilerplatePrefixOracle,
    // drift-family from-STORE twins: fold == rebuild, batch oracles verbatim
    "q261_w1_from_store" -> wassersteinOracle,
    "q262_hellinger_from_store" -> hellingerOracle,
    "q263_profile_cube" ->
      """SELECT CAST(GROUPING(lang, source) AS BIGINT) AS gid, lang, source,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY CUBE(lang, source)
        |ORDER BY gid, lang, source""".stripMargin,
    "q264_weighted_median" -> weightedMedianOracle,
    "q265_embedding_audit" -> embeddingAuditOracle,
    "q266_neyman_allocation" -> neymanOracle,
    "q267_quantile_shift" -> quantileShiftOracle,
    "q268_mixture_distance" -> mixtureDistanceOracle,
    "q269_friedman" -> friedmanOracle,
    "q270_cronbach" -> cronbachOracle,
    "q271_cohens_d" -> cohensDOracle,
    "q272_ks_from_store" -> oracleBase("q101_ks_drift"),
    // the bucketed twin, the distributed-fallback arm and the two
    // standing-store reads select the SAME exact statistics as their
    // primary arms — each reuses the primary's oracle verbatim
    "q273_quantile_shift_bucketed" -> quantileShiftOracle,
    "q274_threshold_sweep_dist" -> thresholdSweepOracle,
    "q275_auc_from_store" -> oracleBase("q168_classifier_auc"),
    "q276_quantile_shift_from_store" -> quantileShiftOracle,
    "q277_fleiss_kappa" -> fleissKappaOracle,
    "q278_anova_f" -> anovaOracle,
    "q279_welch_t" -> welchTOracle,
    "q280_cvm_drift" -> cvmOracle,
    "q281_weighted_median_from_store" -> weightedMedianOracle,
    "q282_cvm_from_store" -> cvmOracle,
    "q283_holm_fwer" -> holmOracle,
    "q284_g_test_drift" -> gTestOracle,
    "q285_kaplan_meier" -> kaplanMeierOracle,
    "q286_log_rank" -> logRankOracle,
    "q287_km_from_store" -> kaplanMeierOracle,
    "q288_nelson_aalen" -> nelsonAalenOracle,
    "q289_weighted_kappa" -> weightedKappaOracle,
    "q290_yule_k" -> yuleKOracle,
    "q291_rmst" -> rmstOracle,
    "q292_proportion_effects" -> proportionEffectsOracle,
    "q293_page_trend" -> pageTrendOracle,
    // the from-store reads share their primary gate's oracle verbatim:
    // a fold that drifts from the rebuild is a state bug by definition
    "q294_log_rank_from_store" -> logRankOracle,
    "q295_rmst_from_store" -> rmstOracle,
    "q296_log_rank_stratified" -> logRankStratifiedOracle,
    "q297_aalen_johansen" -> aalenJohansenOracle,
    "q298_cuped" -> cupedOracle,
    "q299_msprt_two_prop" -> msprtTwoPropOracle,
    "q300_msprt_mean" -> msprtMeanOracle,
    "q301_cif_from_store" -> aalenJohansenOracle,
    "q302_median_survival" -> medianSurvivalOracle,
    "q303_anderson_darling" -> andersonDarlingOracle,
    "q304_ad_from_store" -> andersonDarlingOracle,
    "q305_delta_ratio" -> deltaRatioOracle,
    "q306_srm_check" -> srmOracle,
    "q307_cochran_q" -> cochranQOracle,
    "q308_jonckheere" -> jonckheereOracle,
    "q309_ece" -> eceOracle,
    "q310_hosmer_lemeshow" -> hosmerLemeshowOracle,
    "q311_calibration_from_store" -> eceOracle,
    "q312_concordance" -> concordanceOracle,
    "q313_concordance_from_store" -> concordanceOracle,
    "q314_always_valid_ci" -> alwaysValidCiOracle,
    "q315_chapman" -> chapmanOracle,
    "q316_benjamini_yekutieli" -> benjaminiYekutieliOracle,
    "q317_post_stratified" -> postStratifiedOracle,
    "q318_cochran_armitage" -> cochranArmitageOracle,
    "q319_fleming_harrington" -> flemingHarringtonOracle,
    "q320_brunner_munzel" -> brunnerMunzelOracle,
    "q321_mood_median" -> moodMedianOracle,
    "q322_log_rank_trend" -> logRankTrendOracle,
    "q323_av_ci_two_prop" -> avCiTwoPropOracle,
    "q324_wilson_ci" -> wilsonCiOracle,
    "q325_icc_deff" -> iccDeffOracle,
    "q326_ab_dashboard" -> abDashboardOracle,
    "q327_ab_dashboard_from_store" -> abDashboardOracle,
    "q328_power_two_prop" -> powerTwoPropOracle,
    "q329_power_mean" -> powerMeanOracle,
    "q330_group_seq_obf" -> gsOracle("obf"),
    "q331_group_seq_pocock" -> gsOracle("pocock"),
    "q332_group_seq_mean" -> gsMeanOracle,
    "q333_srm_sequential" -> srmSequentialOracle,
    "q334_meta_effects" -> metaEffectsOracle,
    "q335_conditional_power" -> conditionalPowerOracle,
    "q336_survival_dashboard" -> survivalDashboardOracle,
    "q337_survival_dashboard_from_store" -> survivalDashboardOracle,
    "q338_data_card" -> dataCardOracle,
    "q339_rate_ratio" -> rateRatioOracle,
    "q340_diff_in_diff" -> diffInDiffOracle,
    "q341_eb_shrinkage" -> ebShrinkageOracle,
    "q342_mh_rate_ratio" -> mhRateRatioOracle,
    "q343_drift_card" -> driftCardOracle,
    "q344_drift_card_from_store" -> driftCardOracle,
    "q345_ab_dashboard_karm" -> abDashboardKArmOracle,
    "q346_scorecard" -> scorecardOracle,
    "q347_cuped_multi" -> cupedMultiOracle,
    // the from-store twins fold to identical cells, so they share the
    // direct reads' oracles verbatim (fold == rebuild IS the gate)
    "q348_scorecard_from_store" -> scorecardOracle,
    "q349_ab_karm_from_store" -> abDashboardKArmOracle,
    "q350_qte" -> qteOracle,
    "q351_yuen_t" -> yuenTOracle,
    "q352_paired_t" -> pairedTOracle,
    "q353_wilcoxon_signed_rank" -> wilcoxonSignedRankOracle,
    // from-store twins: the three-batch diff-cell fold merges to the
    // identical cells, so they share the direct oracles verbatim
    "q354_paired_t_from_store" -> pairedTOracle,
    "q355_wilcoxon_from_store" -> wilcoxonSignedRankOracle,
    "q356_tost_equivalence" -> tostOracle,
    "q357_tost_mean" -> tostMeanOracle,
    "q358_hodges_lehmann" -> hodgesLehmannOracle,
    "q359_bayes_ab" -> bayesAbOracle,
    "q360_bayes_ab_from_store" -> bayesAbOracle,
    "q361_cox_ph" -> coxPhOracle,
    "q362_cox_from_store" -> coxPhOracle,
    "q363_hl_two_sample" -> hlTwoSampleOracle,
    "q364_ab_karm_cuped2" -> abKArm2Oracle,
    "q365_effect_heterogeneity" -> heterogeneityOracle,
    "q366_quantile_monitor" -> quantileMonitorOracle,
    "q367_bayes_mean" -> bayesMeanOracle,
    "q368_bayes_mean_from_store" -> bayesMeanOracle,
    "q369_ratio_delta" -> ratioDeltaOracle,
    "q370_ratio_delta_from_store" -> ratioDeltaOracle,
    "q371_cox_ph2" -> coxPh2Oracle,
    "q372_cox2_from_store" -> coxPh2Oracle,
    "q373_cliffs_delta" -> cliffsDeltaOracle,
    "q374_msprt_rate" -> msprtRateOracle,
    "q375_av_ci_rate" -> avCiRateOracle,
    "q376_isotonic_fit" -> isotonicOracle,
    "q377_power_rate" -> powerRateOracle,
    "q378_ratio_cuped" -> ratioCupedOracle,
    "q379_ratio_cuped_from_store" -> ratioCupedOracle,
    "q380_bayes_rate" -> bayesRateOracle,
    "q381_bayes_rate_from_store" -> bayesRateOracle,
    "q382_bayes_best" -> bayesBestOracle)

  // lazy: entries interpolate/reference shared SQL vals declared LATER in
  // this object (Bm25OracleSql, QualityRefitCtes, …) — a strict val here
  // would capture their pre-init nulls
  /** q206 oracle, generated: the EWMA truncated kernel is a fixed
    * 32-term dag (one lag column per k, integer weight 3^k·4^(31−k)),
    * so the SQL is mechanical — built here rather than hand-unrolled.
    * Mirrors TimeSeries.ewmaChart term for term (k = 0 is the row's own
    * n; the dense resample spine means n is never NULL, head lags are).
    */
  private lazy val ewmaOracle: String = {
    // 3^k by iterative Long multiplication — mirrors ewmaChart's exact
    // weight construction
    val pow3 = (1 until 32).scanLeft(1L)((a, _) => a * 3L).toIndexedSeq
    val weights = (0 until 32).map(k => pow3(k) * (1L << (2 * (31 - k))))
    def term(k: Int) = if (k == 0) "n" else s"lag(n, $k) OVER (PARTITION BY event_type ORDER BY slot)"
    val numTerms = weights.zipWithIndex.map { case (wt, k) =>
      s"CASE WHEN ${term(k)} IS NOT NULL THEN CAST($wt AS HUGEINT) * ${term(k)} ELSE CAST(0 AS HUGEINT) END"
    }.mkString(" +\n    ")
    val denTerms = weights.zipWithIndex.map { case (wt, k) =>
      s"CASE WHEN ${term(k)} IS NOT NULL THEN CAST($wt AS HUGEINT) ELSE CAST(0 AS HUGEINT) END"
    }.mkString(" +\n    ")
    s"""WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS slot FROM events),
       |c AS (SELECT event_type, slot, count(*) AS n FROM ev GROUP BY 1, 2),
       |b AS (SELECT event_type, min(slot) AS lo, max(slot) AS hi FROM ev GROUP BY 1),
       |spine AS (SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS slot FROM b),
       |x AS (SELECT s.event_type, s.slot, CAST(coalesce(c.n, 0) AS BIGINT) AS n
       |  FROM spine s LEFT JOIN c ON s.event_type = c.event_type AND s.slot = c.slot),
       |e AS (SELECT event_type, slot, n,
       |    ($numTerms) AS num,
       |    ($denTerms) AS den
       |  FROM x)
       |SELECT event_type, strftime(slot, '%Y-%m-%d %H:%M:%S') AS hr, n,
       |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 9) AS ewma,
       |  num > CAST(4 AS HUGEINT) * den AS breach_hi,
       |  num < CAST(2 AS HUGEINT) * den AS breach_lo
       |FROM e ORDER BY event_type, hr""".stripMargin
  }

  /** Shared dense hourly-count spine — the resampleCounts replay the
    * time-series oracles (q214/q216/q217) build on; q206 predates it and
    * inlines the same CTEs.
    */
  private val HourlySpineCtes: String =
    """ev AS (SELECT event_type, date_trunc('hour', ts) AS slot FROM events),
      |c AS (SELECT event_type, slot, count(*) AS n FROM ev GROUP BY 1, 2),
      |b AS (SELECT event_type, min(slot) AS lo, max(slot) AS hi FROM ev GROUP BY 1),
      |spine AS (SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS slot FROM b),
      |x AS (SELECT s.event_type, s.slot, CAST(coalesce(c.n, 0) AS BIGINT) AS n
      |  FROM spine s LEFT JOIN c ON s.event_type = c.event_type AND s.slot = c.slot)""".stripMargin

  /** q214 oracle, generated like [[ewmaOracle]]: per lag k the exact
    * integer numerator n²·Σx_t·x_{t+k} − n·S·(head+tail) + (n−k)·S² and
    * shared denominator n²·Σx² − n·S² in HUGEINT, r = one division, and
    * the Ljung–Box sum over 1e-15-scaled integer terms — term for term
    * the dag [[graft.operators.TimeSeries.acf]] evaluates.
    */
  private lazy val acfOracle: String = {
    val L = 6
    val lagCols = (1 to L).map(k => s"lag(n, $k) OVER w AS l$k").mkString(",\n    ")
    val aggCols = (1 to L).map { k =>
      s"""coalesce(sum(CASE WHEN l$k IS NOT NULL THEN CAST(n AS HUGEINT) * l$k END), 0) AS sxy$k,
         |    coalesce(sum(CASE WHEN l$k IS NOT NULL THEN CAST(l$k AS HUGEINT) END), 0) AS a$k,
         |    coalesce(sum(CASE WHEN l$k IS NOT NULL THEN CAST(n AS HUGEINT) END), 0) AS b$k""".stripMargin
    }.mkString(",\n    ")
    val numCols = (1 to L).map(k =>
      s"nn*nn*sxy$k - nn*s*(a$k + b$k) + (nn - $k)*s*s AS num$k").mkString(",\n    ")
    val rCols = (1 to L).map(k =>
      s"CASE WHEN nn > $k AND den > 0 THEN CAST(num$k AS DOUBLE) / CAST(den AS DOUBLE) END AS r$k")
      .mkString(",\n    ")
    val tCols = (1 to L).map(k =>
      s"CASE WHEN r$k IS NOT NULL THEN CAST(round(r$k * r$k / CAST(nn - $k AS DOUBLE) * 1e15) AS BIGINT) ELSE 0 END AS t$k")
      .mkString(",\n    ")
    val rows = (1 to L).map { k =>
      val cum = (1 to k).map(j => s"t$j").mkString(" + ")
      s"""SELECT event_type, $k AS lag, CAST(nn AS BIGINT) AS n, CAST(num$k AS VARCHAR) AS num,
         |  CAST(den AS VARCHAR) AS den, round(r$k, 9) AS r,
         |  CASE WHEN r$k IS NOT NULL THEN round(CAST(nn*(nn+2) AS DOUBLE) * (CAST($cum AS DOUBLE) / 1e15), 9) END AS lb_q
         |FROM t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $HourlySpineCtes,
       |l AS (SELECT event_type, n,
       |    $lagCols
       |  FROM x WINDOW w AS (PARTITION BY event_type ORDER BY slot)),
       |a AS (SELECT event_type,
       |    CAST(count(*) AS HUGEINT) AS nn,
       |    CAST(sum(CAST(n AS HUGEINT)) AS HUGEINT) AS s,
       |    CAST(sum(CAST(n AS HUGEINT) * n) AS HUGEINT) AS sxx,
       |    $aggCols
       |  FROM l GROUP BY 1),
       |d AS (SELECT *, nn*nn*sxx - nn*s*s AS den FROM a),
       |f AS (SELECT *,
       |    $numCols
       |  FROM d),
       |r AS (SELECT *,
       |    $rCols
       |  FROM f),
       |t AS (SELECT *,
       |    $tCols
       |  FROM r)
       |SELECT * FROM (
       |$rows
       |) ORDER BY event_type, lag""".stripMargin
  }

  /** q215 oracle: [[graft.quality.Association.kruskalWallis]] replayed —
    * cell counts, the one distinct-value cumulative window for doubled
    * ranks, per-group HUGEINT rank sums/deviations, the nano-scaled H
    * term dag in the operator's exact division order, and the tie-
    * corrected form's exact-integer guard.
    */
  private lazy val kruskalWallisOracle: String =
    """WITH ev AS (SELECT CAST(event_type AS VARCHAR) AS grp,
      |    CAST(round(value * 1000) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
      |cells AS (SELECT grp, v, count(*) AS c FROM ev GROUP BY 1, 2),
      |vals AS (SELECT v, sum(c) AS t FROM cells GROUP BY 1),
      |ranked AS (SELECT v, t,
      |    coalesce(sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM vals),
      |r2 AS (SELECT v, t, 2 * cum + t + 1 AS r2 FROM ranked),
      |tot AS (SELECT CAST(sum(t) AS BIGINT) AS n,
      |    sum(CAST(t AS HUGEINT) * t * t - t) AS ties FROM r2),
      |grp AS (SELECT cells.grp, CAST(sum(c) AS BIGINT) AS n_g,
      |    sum(CAST(c AS HUGEINT) * r2.r2) AS r2sum
      |  FROM cells JOIN r2 ON cells.v = r2.v GROUP BY 1),
      |f AS (SELECT grp.*, tot.n, tot.ties,
      |    r2sum - CAST(n_g AS HUGEINT) * (n + 1) AS d FROM grp, tot),
      |t9 AS (SELECT *, CAST(round(CAST(d AS DOUBLE) * CAST(d AS DOUBLE)
      |      / CAST(n_g AS DOUBLE) / CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) + 1.0)
      |      * 3.0 * 1e9) AS BIGINT) AS term9 FROM f),
      |h AS (SELECT *, CAST(sum(term9) OVER () AS DOUBLE) / 1e9 AS h FROM t9)
      |SELECT grp, n_g, CAST(r2sum AS VARCHAR) AS r2_sum, CAST(d AS VARCHAR) AS d, n,
      |  round(h, 9) AS h,
      |  CASE WHEN n > 1 AND ties < CAST(n AS HUGEINT) * n * n - n
      |    THEN round(h / (1.0 - CAST(ties AS DOUBLE) /
      |      CAST(CAST(n AS HUGEINT) * n * n - n AS DOUBLE)), 9) END AS h_tie
      |FROM h ORDER BY grp""".stripMargin

  /** q221 oracle: [[graft.quality.Association.mannWhitney]] replayed —
    * the KW cell/rank machinery restricted to two groups, the ≤2-label
    * pivot, 2·U₁ and the tie-corrected variance numerator in HUGEINT,
    * z the operator's exact two-division dag.
    */
  private lazy val mannWhitneyOracle: String =
    """WITH ev AS (SELECT CAST(event_type AS VARCHAR) AS grp,
      |    CAST(round(value * 1000) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
      |cells AS (SELECT grp, v, count(*) AS c FROM ev GROUP BY 1, 2),
      |vals AS (SELECT v, sum(c) AS t FROM cells GROUP BY 1),
      |ranked AS (SELECT v, t,
      |    coalesce(sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM vals),
      |r2 AS (SELECT v, t, 2 * cum + t + 1 AS r2 FROM ranked),
      |tot AS (SELECT CAST(sum(t) AS BIGINT) AS n,
      |    sum(CAST(t AS HUGEINT) * t * t - t) AS ties FROM r2),
      |ga AS (SELECT cells.grp, CAST(sum(c) AS BIGINT) AS ng,
      |    sum(CAST(c AS HUGEINT) * r2.r2) AS r2sum
      |  FROM cells JOIN r2 ON cells.v = r2.v GROUP BY 1),
      |lab AS (SELECT *, count(*) OVER () AS ngrps,
      |    min(grp) OVER () AS grp_lo, max(grp) OVER () AS grp_hi FROM ga),
      |wide AS (SELECT grp_lo, grp_hi, ngrps,
      |    max(CASE WHEN grp = grp_lo THEN ng END) AS ng_lo,
      |    max(CASE WHEN grp = grp_hi THEN ng END) AS ng_hi,
      |    max(CASE WHEN grp = grp_lo THEN r2sum END) AS r2sum
      |  FROM lab GROUP BY 1, 2, 3),
      |f AS (SELECT wide.*, tot.n, tot.ties,
      |    r2sum - CAST(ng_lo AS HUGEINT) * (ng_lo + 1) AS two_u1,
      |    CAST(ng_lo AS HUGEINT) * ng_hi * ((CAST(n AS HUGEINT) + 1) * n * (n - 1) - ties) AS var_num
      |  FROM wide, tot)
      |SELECT grp_lo, grp_hi, CAST(ngrps AS BIGINT) AS n_groups,
      |  CASE WHEN ngrps = 2 THEN ng_lo END AS n_lo,
      |  CASE WHEN ngrps = 2 THEN ng_hi END AS n_hi,
      |  CASE WHEN ngrps = 2 THEN CAST(two_u1 AS VARCHAR) END AS u2_lo,
      |  CASE WHEN ngrps = 2 THEN CAST(CAST(ng_lo AS HUGEINT) * ng_hi * 2 - two_u1 AS VARCHAR) END AS u2_hi,
      |  CASE WHEN ngrps = 2 THEN CAST(var_num AS VARCHAR) END AS var_num,
      |  CASE WHEN ngrps = 2 AND var_num > 0 THEN
      |    round(CAST(two_u1 - CAST(ng_lo AS HUGEINT) * ng_hi AS DOUBLE) /
      |      (2.0 * sqrt(CAST(var_num AS DOUBLE) /
      |        (12.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))), 9) END AS z,
      |  CASE WHEN ngrps = 2 AND ng_lo > 0 AND ng_hi > 0 THEN
      |    round(CAST(two_u1 - (CAST(ng_lo AS HUGEINT) * ng_hi * 2 - two_u1) AS DOUBLE) /
      |      (2.0 * CAST(ng_lo AS DOUBLE) * CAST(ng_hi AS DOUBLE)), 9) END AS cliffs_delta
      |FROM f ORDER BY grp_lo""".stripMargin

  /** q222 oracle: [[graft.quality.Profiler.wassersteinDrift]] replayed —
    * bucket counts per half, full-outer bucket join, both cumulative
    * CDFs, the |cum_A·n_B − cum_B·n_A|·gap HUGEINT sum, W₁ one division.
    */
  private lazy val wassersteinOracle: String =
    """WITH ev AS (SELECT event_id,
      |    CAST(round(value * 1000) AS BIGINT) // 5000 AS bkt
      |  FROM events WHERE value IS NOT NULL),
      |b AS (SELECT bkt AS bucket, count(*) AS cnt FROM ev WHERE event_id % 2 = 0 GROUP BY 1),
      |c AS (SELECT bkt AS bucket, count(*) AS cnt FROM ev WHERE event_id % 2 = 1 GROUP BY 1),
      |j AS (SELECT coalesce(b.bucket, c.bucket) AS bucket,
      |    coalesce(b.cnt, 0) AS nb, coalesce(c.cnt, 0) AS nc
      |  FROM b FULL OUTER JOIN c ON b.bucket = c.bucket),
      |w AS (SELECT bucket, nb, nc,
      |    sum(nb) OVER (ORDER BY bucket) AS cb,
      |    sum(nc) OVER (ORDER BY bucket) AS cc,
      |    lead(bucket) OVER (ORDER BY bucket) - bucket AS gap,
      |    sum(nb) OVER () AS tb, sum(nc) OVER () AS tc FROM j),
      |s AS (SELECT max(tb) AS tb, max(tc) AS tc,
      |    sum(CASE WHEN gap IS NOT NULL
      |      THEN abs(CAST(cb AS HUGEINT) * tc - CAST(cc AS HUGEINT) * tb) * gap
      |      ELSE CAST(0 AS HUGEINT) END) AS w1n FROM w)
      |SELECT CAST(tb AS BIGINT) AS n_base, CAST(tc AS BIGINT) AS n_cur,
      |  CAST(w1n AS VARCHAR) AS w1_num,
      |  CASE WHEN tb > 0 AND tc > 0 THEN
      |    round(CAST(w1n AS DOUBLE) / (CAST(tb AS DOUBLE) * CAST(tc AS DOUBLE)), 9)
      |  END AS w1
      |FROM s""".stripMargin

  /** q223 oracle: [[graft.operators.TimeSeries.seasonalAnomalies]]
    * replayed on the shared hourly spine — per (type, hour-of-day) the
    * HUGEINT count/sum/sum-of-squares, the pinned mean/deviation
    * divisions, and the exact (n·x−S)² > 9(nQ−S²) flag.
    */
  private lazy val seasonalOracle: String =
    s"""WITH $HourlySpineCtes,
       |p AS (SELECT event_type, slot, n,
       |    CAST(extract(hour FROM slot) AS INTEGER) AS ph FROM x),
       |a AS (SELECT event_type, ph, CAST(count(*) AS BIGINT) AS np,
       |    sum(CAST(n AS HUGEINT)) AS sp,
       |    sum(CAST(n AS HUGEINT) * n) AS qp
       |  FROM p GROUP BY 1, 2)
       |SELECT p.event_type, strftime(slot, '%Y-%m-%d %H:%M:%S') AS hr,
       |  n, p.ph, np AS n_phase,
       |  round(CAST(sp AS DOUBLE) / CAST(np AS DOUBLE), 9) AS phase_mean,
       |  round(CAST(CAST(np AS HUGEINT) * n - sp AS DOUBLE) / CAST(np AS DOUBLE), 9) AS dev,
       |  (CAST(np AS HUGEINT) * n - sp) * (CAST(np AS HUGEINT) * n - sp) >
       |    (CAST(np AS HUGEINT) * qp - sp * sp) * 9 AS is_anomaly
       |FROM p JOIN a ON p.event_type = a.event_type AND p.ph = a.ph
       |ORDER BY p.event_type, hr""".stripMargin

  /** q224 oracle: [[graft.text.Collocations.cooccurrence]] replayed —
    * one zip per distance d (with the SAME greatest(len−d, 0) guard the
    * engine uses: DuckDB's negative slice ends WRAP, so an unguarded
    * len−d on a short doc slices from the back and list_zip pads a
    * spurious NULL pair), least/greatest canonicalization, exact
    * counts, the pair-scale PMI dag.
    */
  private lazy val cooccurrenceOracle: String = {
    val zips = (1 to 3).map(d =>
      s"""SELECT unnest(list_zip(l[1:greatest(len(l) - $d, 0)],
         |    l[${1 + d}:len(l)])) AS z FROM t""".stripMargin)
      .mkString("\nUNION ALL ")
    s"""WITH t AS (SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |    x -> x <> '') AS l FROM documents WHERE text IS NOT NULL),
       |pr AS (
       |$zips),
       |pc AS (SELECT least(z[1], z[2]) AS w1, greatest(z[1], z[2]) AS w2,
       |    count(*) AS c_xy FROM pr GROUP BY 1, 2),
       |uc AS (SELECT unnest(l) AS w FROM t),
       |u AS (SELECT w, count(*) AS c FROM uc GROUP BY 1),
       |tot AS (SELECT (SELECT CAST(sum(c_xy) AS BIGINT) FROM pc) AS p_tot,
       |    (SELECT CAST(sum(c) AS BIGINT) FROM u) AS n_tot)
       |SELECT pc.w1, pc.w2, CAST(c_xy AS BIGINT) AS c_xy,
       |  CAST(ux.c AS BIGINT) AS c_x, CAST(uy.c AS BIGINT) AS c_y, p_tot, n_tot,
       |  round(ln((CAST(c_xy AS DOUBLE) / p_tot) /
       |    ((CAST(ux.c AS DOUBLE) / n_tot) * (CAST(uy.c AS DOUBLE) / n_tot))), 9) AS pmi
       |FROM pc JOIN u ux ON pc.w1 = ux.w JOIN u uy ON pc.w2 = uy.w, tot
       |WHERE c_xy >= 5
       |ORDER BY c_xy DESC, w1, w2 LIMIT 100""".stripMargin
  }

  /** q225 oracle: [[graft.quality.Profiler.regressionFromMoments]]
    * replayed — HUGEINT moments, the num/den/intercept rationals, R²'s
    * double-square dag.
    */
  private lazy val regressionOracle: String =
    """WITH li AS (SELECT l_returnflag AS rf,
      |    CAST(round(l_quantity) AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
      |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      |m AS (SELECT rf, CAST(count(*) AS HUGEINT) AS n,
      |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx, sum(CAST(x AS HUGEINT) * y) AS sxy,
      |    sum(CAST(y AS HUGEINT) * y) AS syy
      |  FROM li GROUP BY 1),
      |f AS (SELECT rf, n, n * sxy - sx * sy AS num, n * sxx - sx * sx AS den,
      |    sy * sxx - sx * sxy AS inum, n * syy - sy * sy AS dy FROM m)
      |SELECT rf AS l_returnflag, CAST(n AS BIGINT) AS n,
      |  CAST(num AS VARCHAR) AS num, CAST(den AS VARCHAR) AS den,
      |  CASE WHEN den > 0 THEN round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 9) END AS slope,
      |  CASE WHEN den > 0 THEN round(CAST(inum AS DOUBLE) / CAST(den AS DOUBLE), 9) END AS intercept,
      |  CASE WHEN den > 0 AND dy > 0 THEN
      |    round(CAST(num AS DOUBLE) * CAST(num AS DOUBLE) /
      |      (CAST(den AS DOUBLE) * CAST(dy AS DOUBLE)), 9) END AS r2
      |FROM f ORDER BY l_returnflag""".stripMargin

  /** q226 oracle: [[graft.operators.TimeSeries.changepoint]] replayed —
    * prefix/total sums over the hourly spine, D_t = n·S_t − t·S_n in
    * HUGEINT, the earliest-argmax pick, the bridge statistic, and the
    * 10⁶·D² ≷ 1844164·(nQ−S²)·n verdict.
    */
  private lazy val changepointOracle: String =
    s"""WITH $HourlySpineCtes,
       |o AS (SELECT event_type, slot, n,
       |    CAST(row_number() OVER w AS HUGEINT) AS t,
       |    sum(CAST(n AS HUGEINT)) OVER w AS st,
       |    CAST(count(*) OVER (PARTITION BY event_type) AS HUGEINT) AS nn,
       |    sum(CAST(n AS HUGEINT)) OVER (PARTITION BY event_type) AS sn,
       |    sum(CAST(n AS HUGEINT) * n) OVER (PARTITION BY event_type) AS q
       |  FROM x WINDOW w AS (PARTITION BY event_type ORDER BY slot)),
       |d AS (SELECT *, nn * st - t * sn AS dd FROM o WHERE t < nn),
       |r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY abs(dd) DESC, t) AS rk,
       |    nn * q - sn * sn AS varn FROM d)
       |SELECT event_type, strftime(slot, '%Y-%m-%d %H:%M:%S') AS cp_hr,
       |  CAST(t AS BIGINT) AS cp_t, CAST(nn AS BIGINT) AS n, CAST(dd AS VARCHAR) AS d,
       |  CASE WHEN varn > 0 THEN round(CAST(abs(dd) AS DOUBLE) /
       |    (sqrt(CAST(varn AS DOUBLE)) * sqrt(CAST(nn AS DOUBLE))), 9) END AS stat,
       |  CASE WHEN varn > 0 THEN dd * dd * 1000000 > varn * nn * 1844164 END AS changed
       |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin

  /** q227 oracle: [[graft.operators.Sampling.waterfillAllocation]]
    * replayed — ascending cumulative sums, the per-boundary floor-
    * division candidate, the first-valid pick via arg_min, max-n
    * fallback.
    */
  private lazy val waterfillOracle: String =
    """WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY 1, 2),
      |a AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n_docs) AS j,
      |    coalesce(sum(CAST(n_docs AS HUGEINT)) OVER (PARTITION BY lang ORDER BY n_docs
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum,
      |    count(*) OVER (PARTITION BY lang) AS k,
      |    max(n_docs) OVER (PARTITION BY lang) AS maxn
      |  FROM c),
      |cd AS (SELECT *, CAST((CAST(120 AS HUGEINT) - cum) // (k - j + 1) AS BIGINT) AS cand FROM a),
      |v AS (SELECT lang, arg_min(cand, j) AS cap FROM cd
      |  WHERE cand >= 0 AND cand < n_docs GROUP BY 1)
      |SELECT a.lang, a.source, a.n_docs,
      |  coalesce(v.cap, a.maxn) AS cap,
      |  least(a.n_docs, coalesce(v.cap, a.maxn)) AS alloc
      |FROM a LEFT JOIN v USING (lang) ORDER BY lang, source""".stripMargin

  /** q228 oracle: [[graft.operators.Sampling.apportion]] replayed —
    * HUGEINT floor-division quotas, exact remainders, largest-remainder
    * leftovers with the lang tie-break.
    */
  private lazy val apportionOracle: String =
    """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
      |t AS (SELECT CAST(sum(n_docs) AS HUGEINT) AS tot FROM c),
      |b AS (SELECT lang, n_docs,
      |    (CAST(1000 AS HUGEINT) * n_docs) // tot AS base,
      |    CAST(1000 AS HUGEINT) * n_docs - ((CAST(1000 AS HUGEINT) * n_docs) // tot) * tot AS rem
      |  FROM c, t),
      |l AS (SELECT *, 1000 - sum(base) OVER () AS leftover,
      |    row_number() OVER (ORDER BY rem DESC, lang) AS rk FROM b)
      |SELECT lang, n_docs, CAST(rem AS VARCHAR) AS remainder,
      |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS seats
      |FROM l ORDER BY lang""".stripMargin

  /** q229 oracle: [[graft.quality.Association.twoProportion]] replayed —
    * per-variant success/total counts, the ≤2-label pivot, the
    * s_lo·m_hi − s_hi·m_lo numerator in HUGEINT, z's three-√ dag.
    */
  private lazy val twoProportionOracle: String =
    """WITH ev AS (SELECT CAST(event_type AS VARCHAR) AS grp,
      |    CASE WHEN value >= 250 THEN 1 ELSE 0 END AS hi
      |  FROM events WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
      |ga AS (SELECT grp, CAST(count(*) AS BIGINT) AS m, CAST(sum(hi) AS BIGINT) AS s
      |  FROM ev GROUP BY 1),
      |lab AS (SELECT *, count(*) OVER () AS ngrps,
      |    min(grp) OVER () AS grp_lo, max(grp) OVER () AS grp_hi FROM ga),
      |wide AS (SELECT grp_lo, grp_hi, ngrps,
      |    max(CASE WHEN grp = grp_lo THEN m END) AS m_lo,
      |    max(CASE WHEN grp = grp_lo THEN s END) AS s_lo,
      |    max(CASE WHEN grp = grp_hi THEN m END) AS m_hi,
      |    max(CASE WHEN grp = grp_hi THEN s END) AS s_hi
      |  FROM lab GROUP BY 1, 2, 3),
      |f AS (SELECT *, CAST(s_lo AS HUGEINT) * m_hi - CAST(s_hi AS HUGEINT) * m_lo AS num,
      |    CAST(m_lo AS HUGEINT) + m_hi AS n, CAST(s_lo AS HUGEINT) + s_hi AS s FROM wide)
      |SELECT grp_lo, grp_hi, CAST(ngrps AS BIGINT) AS n_groups, m_lo, s_lo, m_hi, s_hi,
      |  CAST(num AS VARCHAR) AS num,
      |  CASE WHEN s * (n - s) > 0 THEN
      |    round(CAST(num AS DOUBLE) * sqrt(CAST(n AS DOUBLE)) /
      |      (sqrt(CAST(CAST(m_lo AS HUGEINT) * m_hi AS DOUBLE)) *
      |       sqrt(CAST(s * (n - s) AS DOUBLE))), 9) END AS z
      |FROM f ORDER BY grp_lo""".stripMargin

  /** q230 oracle: [[graft.text.CorpusLaws.vocabProfile]] replayed —
    * per-(lang, token) counts, the (cnt desc, token) head rank, exact
    * profile integers, pinned ratio divisions.
    */
  private lazy val vocabProfileOracle: String =
    """WITH t AS (SELECT lang,
      |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
      |  FROM documents WHERE text IS NOT NULL),
      |c AS (SELECT lang, token, count(*) AS cnt FROM t GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rk FROM c),
      |a AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_tokens,
      |    CAST(count(*) AS BIGINT) AS n_types,
      |    CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
      |    CAST(sum(CASE WHEN rk <= 100 THEN cnt ELSE 0 END) AS BIGINT) AS top_mass
      |  FROM r GROUP BY 1)
      |SELECT lang, n_tokens, n_types, hapax, top_mass,
      |  round(CAST(hapax AS DOUBLE) / CAST(n_types AS DOUBLE), 9) AS hapax_ratio,
      |  round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 9) AS type_token_ratio,
      |  round(CAST(top_mass AS DOUBLE) / CAST(n_tokens AS DOUBLE), 9) AS top_share
      |FROM a ORDER BY lang""".stripMargin

  /** q231 oracle: the q113 recursive-CTE component assignment
    * ([[CcClustersOracleSql]]'s CTE verbatim) folded to the size
    * histogram + duplication summary.
    */
  private lazy val clusterSizesOracle: String =
    CcClustersOracleSql.replace(
      "SELECT node, min(r) AS component FROM reach GROUP BY node ORDER BY node",
      """, assign AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
        |sz AS (SELECT component, count(*) AS size FROM assign GROUP BY 1),
        |h AS (SELECT size, count(*) AS n_clusters FROM sz GROUP BY 1),
        |f AS (SELECT size, n_clusters, size * n_clusters AS n_nodes,
        |    sum(size * n_clusters) OVER () AS total_nodes,
        |    sum(n_clusters) OVER () AS total_clusters FROM h)
        |SELECT CAST(size AS BIGINT) AS size, n_clusters,
        |  CAST(n_nodes AS BIGINT) AS n_nodes,
        |  CAST(total_nodes AS BIGINT) AS total_nodes,
        |  CAST(total_clusters AS BIGINT) AS total_clusters,
        |  round(CAST(total_nodes - total_clusters AS DOUBLE) /
        |    CAST(total_nodes AS DOUBLE), 9) AS dup_factor
        |FROM f ORDER BY size""".stripMargin)

  /** q248 oracle: the q93 from-scratch closure over old ∪ new edges
    * ([[CcIncrementalOracleSql]]'s CTEs verbatim) folded to the size
    * histogram + duplication summary — the [[clusterSizesOracle]]
    * suffix on the incremental edge set.
    */
  private lazy val clusterSizesIncrementalOracle: String =
    CcIncrementalOracleSql.replace(
      "SELECT node, min(r) AS component FROM reach GROUP BY node ORDER BY node",
      """, assign AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
        |sz AS (SELECT component, count(*) AS size FROM assign GROUP BY 1),
        |h AS (SELECT size, count(*) AS n_clusters FROM sz GROUP BY 1),
        |f AS (SELECT size, n_clusters, size * n_clusters AS n_nodes,
        |    sum(size * n_clusters) OVER () AS total_nodes,
        |    sum(n_clusters) OVER () AS total_clusters FROM h)
        |SELECT CAST(size AS BIGINT) AS size, n_clusters,
        |  CAST(n_nodes AS BIGINT) AS n_nodes,
        |  CAST(total_nodes AS BIGINT) AS total_nodes,
        |  CAST(total_clusters AS BIGINT) AS total_clusters,
        |  round(CAST(total_nodes - total_clusters AS DOUBLE) /
        |    CAST(total_nodes AS DOUBLE), 9) AS dup_factor
        |FROM f ORDER BY size""".stripMargin)

  /** q250 oracle: [[graft.quality.Association.brownForsythe]] replayed
    * — the per-group cumulative-cell lower median, exact z/S/Q
    * integers, the DECIMAL deviations D = N·S_g − n_g·S and
    * E = n_g·Q_g − S_g², nano between/within terms, W one fixed dag.
    */
  private lazy val brownForsytheOracle: String =
    """WITH d AS (SELECT event_type AS grp, CAST(round(value * 1000) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
      |c AS (SELECT grp, v, count(*) AS c FROM d GROUP BY 1, 2),
      |cum AS (SELECT *, coalesce(sum(c) OVER (PARTITION BY grp ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cm,
      |    sum(c) OVER (PARTITION BY grp) AS ng FROM c),
      |med AS (SELECT grp, v AS med FROM cum
      |  WHERE cm < (ng + 1) // 2 AND (ng + 1) // 2 <= cm + c),
      |z AS (SELECT cum.grp, cum.c, cum.ng, med.med,
      |    CAST(abs(cum.v - med.med) AS HUGEINT) AS zv
      |  FROM cum JOIN med ON cum.grp = med.grp),
      |ga AS (SELECT grp, CAST(max(ng) AS BIGINT) AS n_g, max(med) AS med,
      |    sum(CAST(c AS HUGEINT) * zv) AS s, sum(CAST(c AS HUGEINT) * zv * zv) AS q
      |  FROM z GROUP BY 1),
      |tot AS (SELECT *, sum(n_g) OVER () AS n, count(*) OVER () AS k,
      |    sum(s) OVER () AS stot FROM ga),
      |t9 AS (SELECT *,
      |    CAST(round(CAST(CAST(n AS HUGEINT) * s - CAST(n_g AS HUGEINT) * stot AS DOUBLE) *
      |      CAST(CAST(n AS HUGEINT) * s - CAST(n_g AS HUGEINT) * stot AS DOUBLE) /
      |      (CAST(n_g AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * 1e9) AS HUGEINT) AS b9,
      |    CAST(round(CAST(CAST(n_g AS HUGEINT) * q - s * s AS DOUBLE) /
      |      CAST(n_g AS DOUBLE) * 1e9) AS HUGEINT) AS w9
      |  FROM tot),
      |f AS (SELECT *, sum(b9) OVER () AS b9s, sum(w9) OVER () AS w9s FROM t9)
      |SELECT grp, n_g, CAST(med AS BIGINT) AS med, CAST(s AS VARCHAR) AS s_abs,
      |  CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
      |  CASE WHEN k >= 2 AND n > k AND w9s > 0 THEN
      |    round(CAST(n - k AS DOUBLE) / CAST(k - 1 AS DOUBLE) *
      |      (CAST(b9s AS DOUBLE) / CAST(w9s AS DOUBLE)), 9) END AS w
      |FROM f ORDER BY grp""".stripMargin

  /** q251 oracle: [[graft.quality.MultipleTesting.benjaminiHochberg]]
    * replayed — the md5-uniform nano p battery (the q95 60-bit fold,
    * mod 1e9), (p9, id) rank, the exact integer step inequality
    * p9·m·100 ≤ rank·5·1e9, and the step-up max-candidate closure.
    */
  private lazy val bhFdrOracle: String =
    """WITH ids AS (SELECT DISTINCT lang || ':' || source AS id FROM documents),
      |p AS (SELECT id,
      |    list_reduce(list_transform(range(1, 16), i ->
      |      CAST(strpos('0123456789abcdef', substring(md5(id), i, 1)) - 1 AS BIGINT)),
      |      (acc, x) -> acc * 16 + x) % 1000000000 AS p9
      |  FROM ids),
      |r AS (SELECT id, p9,
      |    sum(CASE WHEN p9 IS NULL THEN 1 ELSE 0 END) OVER () AS n_null,
      |    CAST(row_number() OVER (ORDER BY p9, id) AS BIGINT) AS rank,
      |    count(*) OVER () AS m FROM p),
      |c AS (SELECT *,
      |    CAST(p9 AS HUGEINT) * m * 100 <= CAST(rank AS HUGEINT) * 5 * 1000000000 AS is_candidate
      |  FROM r),
      |f AS (SELECT *, max(CASE WHEN is_candidate THEN rank ELSE 0 END) OVER () AS cut FROM c)
      |SELECT id, p9, rank, CAST(m AS BIGINT) AS m,
      |  coalesce(CAST(n_null AS BIGINT), 0) AS n_null, is_candidate,
      |  rank <= cut AS rejected
      |FROM f ORDER BY rank""".stripMargin

  /** q252 oracle: [[graft.text.CorpusLaws.vocabRichness]] replayed —
    * per-(lang, token) counts, exact type/mass/f1/f2 integers, the
    * bias-corrected Chao1 and Good–Turing coverage divisions.
    */
  private lazy val vocabRichnessOracle: String =
    """WITH t AS (SELECT lang,
      |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
      |  FROM documents WHERE text IS NOT NULL),
      |c AS (SELECT lang, token, count(*) AS cnt FROM t GROUP BY 1, 2),
      |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
      |    CAST(sum(cnt) AS BIGINT) AS mass,
      |    CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      |    CAST(sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      |  FROM c GROUP BY 1)
      |SELECT lang, n_types, mass, f1, f2,
      |  round(CAST(n_types AS DOUBLE) +
      |    CAST(f1 * (f1 - 1) AS DOUBLE) / (2.0 * CAST(f2 + 1 AS DOUBLE)), 9) AS chao1,
      |  CASE WHEN mass > 0 THEN
      |    round(CAST(f1 AS DOUBLE) / CAST(mass AS DOUBLE), 9) END AS gt_unseen_mass,
      |  CASE WHEN mass > 0 THEN
      |    round(1.0 - CAST(f1 AS DOUBLE) / CAST(mass AS DOUBLE), 9) END AS coverage
      |FROM a ORDER BY lang""".stripMargin

  /** q253 oracle: [[graft.text.CorpusLaws.vocabOverlap]] replayed —
    * distinct (source, token) membership, the token-keyed a<b
    * self-join, the full source-pair grid with zero-overlap fills, and
    * the four pinned coefficient divisions.
    */
  private lazy val vocabOverlapOracle: String =
    """WITH t AS (SELECT DISTINCT source AS src,
      |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
      |  FROM documents WHERE text IS NOT NULL),
      |sz AS (SELECT src, count(*) AS n_types FROM t GROUP BY 1),
      |inter AS (SELECT a.src AS source_a, b.src AS source_b, count(*) AS n_shared
      |  FROM t a JOIN t b ON a.token = b.token AND a.src < b.src GROUP BY 1, 2),
      |grid AS (SELECT a.src AS source_a, a.n_types AS types_a,
      |    b.src AS source_b, b.n_types AS types_b
      |  FROM sz a JOIN sz b ON a.src < b.src),
      |f AS (SELECT g.source_a, g.source_b, g.types_a, g.types_b,
      |    coalesce(i.n_shared, 0) AS n_shared
      |  FROM grid g LEFT JOIN inter i
      |    ON g.source_a = i.source_a AND g.source_b = i.source_b)
      |SELECT source_a, source_b, types_a, types_b, CAST(n_shared AS BIGINT) AS n_shared,
      |  round(CAST(n_shared AS DOUBLE) / CAST(types_a + types_b - n_shared AS DOUBLE), 9) AS jaccard,
      |  round(CAST(n_shared AS DOUBLE) / CAST(least(types_a, types_b) AS DOUBLE), 9) AS overlap,
      |  round(CAST(n_shared AS DOUBLE) / CAST(types_a AS DOUBLE), 9) AS containment_a,
      |  round(CAST(n_shared AS DOUBLE) / CAST(types_b AS DOUBLE), 9) AS containment_b
      |FROM f ORDER BY source_a, source_b""".stripMargin

  /** q254 oracle: [[graft.quality.Association.mcnemar]] replayed —
    * exact quadrant counts on the paired length/word-count gates, the
    * discordant statistic, the integer 3841459 verdict.
    */
  private lazy val mcnemarOracle: String =
    """WITH d AS (SELECT n_chars >= 256 AS a,
      |    len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) >= 40 AS b
      |  FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL),
      |q AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS both_pass,
      |    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS only_a,
      |    CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS only_b,
      |    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS neither
      |  FROM d)
      |SELECT n, both_pass, only_a, only_b, neither,
      |  CASE WHEN only_a + only_b > 0 THEN
      |    round(CAST((only_a - only_b) * (only_a - only_b) AS DOUBLE) /
      |      CAST(only_a + only_b AS DOUBLE), 9) END AS mcnemar,
      |  CASE WHEN only_a + only_b > 0 THEN
      |    (only_a - only_b) * (only_a - only_b) * 1000000 > (only_a + only_b) * 3841459
      |  END AS significant
      |FROM q""".stripMargin

  /** q255 oracle: [[graft.operators.TimeSeries.runsTest]] replayed on
    * the hourly spine — the (n, slot)-ranked lower median, the >= med
    * indicator, run counting via one lag, and the exact
    * 2n0n1(2n0n1−N) variance numerator under the z dag.
    */
  private lazy val runsTestOracle: String =
    s"""WITH $HourlySpineCtes,
       |rk AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY n, slot) AS rk,
       |    count(*) OVER (PARTITION BY event_type) AS cnt FROM x),
       |med AS (SELECT event_type, n AS med FROM rk WHERE rk = (cnt + 1) // 2),
       |fl AS (SELECT x.event_type, x.slot,
       |    CASE WHEN x.n >= med.med THEN 1 ELSE 0 END AS above
       |  FROM x JOIN med ON x.event_type = med.event_type),
       |lg AS (SELECT event_type, above,
       |    lag(above) OVER (PARTITION BY event_type ORDER BY slot) AS prev FROM fl),
       |ag AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN above = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
       |    CAST(sum(CASE WHEN above = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> above THEN 1 ELSE 0 END) + 1 AS BIGINT) AS r
       |  FROM lg GROUP BY 1),
       |v AS (SELECT *, CAST(2 AS HUGEINT) * n0 * n1 * (CAST(2 AS HUGEINT) * n0 * n1 - n) AS var_num
       |  FROM ag)
       |SELECT event_type, n, n0, n1, r, CAST(var_num AS VARCHAR) AS var_num,
       |  CASE WHEN n0 > 0 AND n1 > 0 AND n > 1 AND var_num > 0 THEN
       |    round((CAST(r AS DOUBLE) - (CAST(CAST(2 AS HUGEINT) * n0 * n1 AS DOUBLE) / CAST(n AS DOUBLE) + 1.0)) /
       |      sqrt(CAST(var_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 9)
       |  END AS z
       |FROM v ORDER BY event_type""".stripMargin

  /** q259 oracle: [[graft.text.TextAnalysis.scriptProfile]] replayed —
    * per-class regexp_replace lengths (RE2 needs the 'g' flag and
    * \x{…} where Java regex writes \uXXXX), exact sums, pinned ratios.
    */
  private lazy val scriptProfileOracle: String =
    """WITH c AS (SELECT lang, CAST(length(text) AS BIGINT) AS chars,
      |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS latin,
      |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS digit,
      |    CAST(length(regexp_replace(text, '[^\s]', '', 'g')) AS BIGINT) AS ws,
      |    CAST(length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS BIGINT) AS cjk,
      |    CAST(length(regexp_replace(text, '[^\x{0400}-\x{04ff}]', '', 'g')) AS BIGINT) AS cyr
      |  FROM documents WHERE text IS NOT NULL),
      |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(chars) AS BIGINT) AS chars, CAST(sum(latin) AS BIGINT) AS latin,
      |    CAST(sum(digit) AS BIGINT) AS digit, CAST(sum(ws) AS BIGINT) AS whitespace,
      |    CAST(sum(cjk) AS BIGINT) AS cjk, CAST(sum(cyr) AS BIGINT) AS cyrillic
      |  FROM c GROUP BY 1)
      |SELECT lang, n_docs, chars, latin, digit, whitespace, cjk, cyrillic,
      |  chars - latin - digit - whitespace - cjk - cyrillic AS other,
      |  CASE WHEN chars > 0 THEN round(CAST(latin AS DOUBLE) / CAST(chars AS DOUBLE), 9) END AS latin_ratio,
      |  CASE WHEN chars > 0 THEN round(CAST(cjk AS DOUBLE) / CAST(chars AS DOUBLE), 9) END AS cjk_ratio,
      |  CASE WHEN chars > 0 THEN round(
      |    CAST(chars - latin - digit - whitespace - cjk - cyrillic AS DOUBLE) /
      |      CAST(chars AS DOUBLE), 9) END AS other_ratio
      |FROM a ORDER BY lang""".stripMargin

  /** q260 oracle: [[graft.text.TextAnalysis.boilerplatePrefix]]
    * replayed — the first-8-token md5 prefix key, share counts, the
    * >= 3 flag.
    */
  private lazy val boilerplatePrefixOracle: String =
    """WITH t AS (SELECT doc_id,
      |    md5(array_to_string(list_slice(
      |      string_split_regex(trim(lower(text)), '\s+'), 1, 8), ' ')) AS prefix_key
      |  FROM documents WHERE text IS NOT NULL),
      |c AS (SELECT prefix_key, count(*) AS n_sharing FROM t GROUP BY 1)
      |SELECT t.doc_id, t.prefix_key, CAST(c.n_sharing AS BIGINT) AS n_sharing,
      |  c.n_sharing >= 3 AS is_boilerplate
      |FROM t JOIN c USING (prefix_key) ORDER BY doc_id""".stripMargin

  /** q264 oracle: [[graft.operators.Quantiles.weightedMedian]] replayed
    * — per-(flag, qty) price-weight cells, the exclusive cumulative,
    * the (W+1)//2 pin.
    */
  private lazy val weightedMedianOracle: String =
    """WITH li AS (SELECT l_returnflag AS rf, CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(floor(l_extendedprice) AS BIGINT) AS w
      |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      |    AND CAST(floor(l_extendedprice) AS BIGINT) > 0),
      |c AS (SELECT rf, qty, sum(w) AS w FROM li GROUP BY 1, 2),
      |cum AS (SELECT *, coalesce(sum(w) OVER (PARTITION BY rf ORDER BY qty
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cm,
      |    sum(w) OVER (PARTITION BY rf) AS tw FROM c)
      |SELECT rf AS l_returnflag, CAST(tw AS BIGINT) AS total_w,
      |  CAST((tw + 1) // 2 AS BIGINT) AS med_rank, qty AS median
      |FROM cum WHERE cm < (tw + 1) // 2 AND (tw + 1) // 2 <= cm + w
      |ORDER BY 1""".stripMargin

  /** q265 oracle: [[graft.similarity.EmbeddingAudit.audit]] replayed —
    * the prepend-0 left fold for each squared norm (same IEEE addition
    * order as Spark's `aggregate`), nano norms summed in HUGEINT,
    * order-free min/max.
    */
  private lazy val embeddingAuditOracle: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |r AS (SELECT vec_id, v IS NULL AS nullv,
      |    CASE WHEN v IS NOT NULL THEN len(v) END AS dim,
      |    CASE WHEN v IS NOT NULL THEN
      |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |        list_transform(v, x -> x * x)), (a, b) -> a + b) END AS ss
      |  FROM e),
      |f AS (SELECT *, ss IS NOT NULL AND NOT isnan(ss) AND NOT isinf(ss) AS finite FROM r),
      |n AS (SELECT *, CASE WHEN finite THEN sqrt(ss) END AS nrm,
      |    CASE WHEN finite THEN CAST(round(sqrt(ss) * 1e9) AS BIGINT) END AS n9 FROM f)
      |SELECT CAST(count(*) AS BIGINT) AS n_vecs,
      |  CAST(sum(CASE WHEN nullv THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |  CAST(min(dim) AS INTEGER) AS dim_min, CAST(max(dim) AS INTEGER) AS dim_max,
      |  CAST(count(DISTINCT dim) AS BIGINT) AS n_dims,
      |  CAST(sum(CASE WHEN NOT nullv AND NOT finite THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
      |  CAST(sum(CASE WHEN finite AND ss = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
      |  CAST(sum(CASE WHEN finite THEN 1 ELSE 0 END) AS BIGINT) AS n_normed,
      |  CAST(sum(CAST(n9 AS HUGEINT)) AS VARCHAR) AS norm9_sum,
      |  round(min(nrm), 9) AS norm_min, round(max(nrm), 9) AS norm_max,
      |  CASE WHEN sum(CASE WHEN finite THEN 1 ELSE 0 END) > 0 THEN
      |    round(CAST(sum(CAST(n9 AS HUGEINT)) AS DOUBLE) / 1e9 /
      |      CAST(sum(CASE WHEN finite THEN 1 ELSE 0 END) AS DOUBLE), 9) END AS norm_mean
      |FROM n""".stripMargin

  /** q266 oracle: [[graft.operators.Sampling.neymanAllocation]]
    * replayed — exact HUGEINT variance numerators, the micro-scaled √
    * weight, and the q228 Hamilton solver over those weights.
    */
  private lazy val neymanOracle: String =
    """WITH d AS (SELECT lang AS stratum, CAST(n_chars AS BIGINT) AS v
      |  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
      |g AS (SELECT stratum, CAST(count(*) AS BIGINT) AS n_h,
      |    sum(CAST(v AS HUGEINT)) AS s, sum(CAST(v AS HUGEINT) * v) AS ss
      |  FROM d GROUP BY 1),
      |a AS (SELECT *, CAST(n_h AS HUGEINT) * ss - s * s AS va FROM g),
      |w AS (SELECT *, CAST(round(sqrt(CAST(va AS DOUBLE)) * 1e6) AS BIGINT) AS w6 FROM a),
      |t AS (SELECT *, sum(CAST(w6 AS HUGEINT)) OVER () AS tot FROM w),
      |b AS (SELECT *, (CAST(200 AS HUGEINT) * w6) // tot AS b0 FROM t),
      |c AS (SELECT *,
      |    CASE WHEN CAST(200 AS HUGEINT) * w6 - b0 * tot < 0 THEN b0 - 1
      |         WHEN CAST(200 AS HUGEINT) * w6 - b0 * tot >= tot THEN b0 + 1
      |         ELSE b0 END AS bd FROM b),
      |r AS (SELECT *, CAST(200 AS HUGEINT) * w6 - bd * tot AS rem,
      |    sum(bd) OVER () AS sb FROM c),
      |k AS (SELECT *, row_number() OVER (ORDER BY rem DESC, stratum ASC) AS rk,
      |    200 - sb AS leftover FROM r)
      |SELECT stratum, n_h, CAST(va AS VARCHAR) AS var_num, w6,
      |  CAST(bd + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS seats
      |FROM k ORDER BY stratum""".stripMargin

  /** q267 oracle: [[graft.operators.Quantiles.quantileShift]] replayed
    * — per-half (v, tie) ranks, the clamped (p·(n+1))//100 selections,
    * the long-form pivot and one subtraction.
    */
  private lazy val quantileShiftOracle: String =
    """WITH ev AS (SELECT event_type AS g, event_id,
      |    CAST(round(value * 1000) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL),
      |r AS (SELECT g, event_id % 2 AS h, v,
      |    row_number() OVER (PARTITION BY g, event_id % 2 ORDER BY v, event_id) AS rn,
      |    count(*) OVER (PARTITION BY g, event_id % 2) AS n FROM ev),
      |ps(p) AS (VALUES (10), (25), (50), (75), (90)),
      |q AS (SELECT g, h, p, max(n) AS n,
      |    max(CASE WHEN rn = greatest(1, least(n, (p * (n + 1)) // 100)) THEN v END) AS qv
      |  FROM r CROSS JOIN ps GROUP BY 1, 2, 3)
      |SELECT b.g AS event_type, CAST(b.n AS BIGINT) AS n_base,
      |  CAST(c.n AS BIGINT) AS n_cur, b.p, b.qv AS v_base, c.qv AS v_cur,
      |  c.qv - b.qv AS shift
      |FROM q b JOIN q c ON b.g = c.g AND b.p = c.p AND b.h = 0 AND c.h = 1
      |ORDER BY 1, 4""".stripMargin

  /** q350 oracle: [[graft.operators.Quantiles.quantileTreatmentEffect]]
    * replayed — per-(event_type, user-parity arm) ranks, the clamped
    * (p·(n+1))//100 selections, the long-form pivot, qte = lo − hi
    * ('false' is the lexical-lo arm).
    */
  private lazy val qteOracle: String =
    """WITH ev AS (SELECT event_type AS g, user_id % 2 = 0 AS evn, event_id,
      |    CAST(round(value * 1000) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
      |r AS (SELECT g, evn, v,
      |    row_number() OVER (PARTITION BY g, evn ORDER BY v, event_id) AS rn,
      |    count(*) OVER (PARTITION BY g, evn) AS n FROM ev),
      |ps(p) AS (VALUES (10), (25), (50), (75), (90)),
      |q AS (SELECT g, evn, p, max(n) AS n,
      |    max(CASE WHEN rn = greatest(1, least(n, (p * (n + 1)) // 100)) THEN v END) AS qv
      |  FROM r CROSS JOIN ps GROUP BY 1, 2, 3)
      |SELECT lo.g AS event_type, CAST(lo.n AS BIGINT) AS n_lo,
      |  CAST(hi.n AS BIGINT) AS n_hi, lo.p, lo.qv AS v_lo, hi.qv AS v_hi,
      |  lo.qv - hi.qv AS qte
      |FROM q lo JOIN q hi ON lo.g = hi.g AND lo.p = hi.p
      |  AND lo.evn = false AND hi.evn = true
      |ORDER BY 1, 4""".stripMargin

  /** q268 oracle: [[graft.text.CorpusLaws.mixtureDistanceMatrix]]
    * replayed — per-source token counts, the a<b shared-token join
    * with per-pair nano JS terms, and the exact one-sided ½·ln 2 mass
    * closure over the full pair grid.
    */
  private lazy val mixtureDistanceOracle: String =
    """WITH t AS (SELECT source AS src,
      |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
      |  FROM documents WHERE text IS NOT NULL),
      |c AS (SELECT src, token, count(*) AS cnt FROM t GROUP BY 1, 2),
      |tot AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS mass,
      |    CAST(count(*) AS BIGINT) AS n_types FROM c GROUP BY 1),
      |sh AS (SELECT a.src AS source_a, b.src AS source_b,
      |    CAST(count(*) AS BIGINT) AS shared_types,
      |    CAST(sum(a.cnt) AS BIGINT) AS shared_mass_a,
      |    CAST(sum(b.cnt) AS BIGINT) AS shared_mass_b,
      |    sum(CAST(round((
      |      (a.cnt / CAST(ta.mass AS DOUBLE)) *
      |        ln((a.cnt / CAST(ta.mass AS DOUBLE)) /
      |          ((a.cnt / CAST(ta.mass AS DOUBLE) + b.cnt / CAST(tb.mass AS DOUBLE)) / 2)) / 2 +
      |      (b.cnt / CAST(tb.mass AS DOUBLE)) *
      |        ln((b.cnt / CAST(tb.mass AS DOUBLE)) /
      |          ((a.cnt / CAST(ta.mass AS DOUBLE) + b.cnt / CAST(tb.mass AS DOUBLE)) / 2)) / 2
      |      ) * 1e9) AS HUGEINT)) AS s9
      |  FROM c a JOIN c b ON a.token = b.token AND a.src < b.src
      |  JOIN tot ta ON ta.src = a.src JOIN tot tb ON tb.src = b.src
      |  GROUP BY 1, 2),
      |grid AS (SELECT a.src AS source_a, a.mass AS mass_a,
      |    b.src AS source_b, b.mass AS mass_b
      |  FROM tot a JOIN tot b ON a.src < b.src),
      |f AS (SELECT g.source_a, g.source_b, g.mass_a, g.mass_b,
      |    coalesce(s.shared_types, 0) AS shared_types,
      |    coalesce(s.shared_mass_a, 0) AS shared_mass_a,
      |    coalesce(s.shared_mass_b, 0) AS shared_mass_b,
      |    coalesce(CAST(s.s9 AS DOUBLE), 0) / 1e9 AS shared_js
      |  FROM grid g LEFT JOIN sh s
      |    ON g.source_a = s.source_a AND g.source_b = s.source_b)
      |SELECT source_a, source_b, mass_a, mass_b,
      |  CAST(shared_types AS BIGINT) AS shared_types,
      |  CAST(shared_mass_a AS BIGINT) AS shared_mass_a,
      |  CAST(shared_mass_b AS BIGINT) AS shared_mass_b,
      |  round(shared_js + 0.6931471805599453 / 2 *
      |    ((1.0 - shared_mass_a / CAST(mass_a AS DOUBLE)) +
      |     (1.0 - shared_mass_b / CAST(mass_b AS DOUBLE))), 9) AS js,
      |  round((shared_js + 0.6931471805599453 / 2 *
      |    ((1.0 - shared_mass_a / CAST(mass_a AS DOUBLE)) +
      |     (1.0 - shared_mass_b / CAST(mass_b AS DOUBLE)))) / 0.6931471805599453, 9) AS js_norm
      |FROM f ORDER BY source_a, source_b""".stripMargin

  /** q269 oracle: [[graft.quality.Association.friedman]] replayed —
    * the three-judge long frame, per-block doubled midranks, exact
    * HUGEINT rank sums/deviations, nano χ² terms, the tie correction
    * over b·(k³−k) = 24b, and W = χ²_tie/(2b). All blocks complete by
    * construction (k = 3 judges per document).
    */
  private lazy val friedmanOracle: String =
    """WITH d AS (SELECT doc_id, n_chars,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
      |  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
      |l AS (
      |  SELECT doc_id AS b, 'chars' AS j, CAST(n_chars AS BIGINT) AS v FROM d
      |  UNION ALL SELECT doc_id, 'tokens', CAST(len(toks) AS BIGINT) FROM d
      |  UNION ALL SELECT doc_id, 'types', CAST(len(list_distinct(toks)) AS BIGINT) FROM d),
      |r AS (SELECT b, j,
      |    2 * rank() OVER (PARTITION BY b ORDER BY v) +
      |      count(*) OVER (PARTITION BY b, v) - 1 AS r2 FROM l),
      |tv AS (SELECT b, v, count(*) AS tcnt FROM l GROUP BY 1, 2),
      |ties AS (SELECT coalesce(sum(CAST(tcnt AS HUGEINT) * tcnt * tcnt - tcnt), 0) AS tsum FROM tv),
      |pt AS (SELECT j, CAST(count(*) AS BIGINT) AS bb,
      |    sum(CAST(r2 AS HUGEINT)) AS r2sum FROM r GROUP BY 1),
      |wd AS (SELECT *, r2sum - CAST(bb AS HUGEINT) * 4 AS dd FROM pt),
      |t9 AS (SELECT *, CAST(round(CAST(dd AS DOUBLE) * CAST(dd AS DOUBLE) * 3 /
      |    (CAST(bb AS DOUBLE) * 3 * 4) * 1e9) AS HUGEINT) AS tt9 FROM wd),
      |ch AS (SELECT *, sum(tt9) OVER () AS chi9 FROM t9),
      |f AS (SELECT ch.*, ties.tsum,
      |    1.0 - CAST(ties.tsum AS DOUBLE) / (CAST(ch.bb AS DOUBLE) * 24) AS cfac
      |  FROM ch, ties)
      |SELECT j AS treatment, bb AS b, CAST(3 AS BIGINT) AS k,
      |  CAST(0 AS BIGINT) AS n_incomplete,
      |  CAST(r2sum AS VARCHAR) AS r2_sum, CAST(dd AS VARCHAR) AS d,
      |  round(CAST(chi9 AS DOUBLE) / 1e9, 9) AS chi2,
      |  CASE WHEN cfac > 0 THEN round(CAST(chi9 AS DOUBLE) / 1e9 / cfac, 9) END AS chi2_tie,
      |  CASE WHEN cfac > 0 THEN
      |    round(CAST(chi9 AS DOUBLE) / 1e9 / cfac / (CAST(bb AS DOUBLE) * 2), 9)
      |  END AS w
      |FROM f ORDER BY treatment""".stripMargin

  /** q270 oracle: [[graft.operators.RankEval.cronbachAlpha]] replayed —
    * the q269 judge trio, exact HUGEINT per-judge and total-score
    * variance numerators, α one fixed dag (all units complete by
    * construction).
    */
  private lazy val cronbachOracle: String =
    """WITH d AS (SELECT doc_id, n_chars,
      |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
      |  FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
      |l AS (
      |  SELECT doc_id AS u, 'chars' AS j, CAST(n_chars AS BIGINT) AS v FROM d
      |  UNION ALL SELECT doc_id, 'tokens', CAST(len(toks) AS BIGINT) FROM d
      |  UNION ALL SELECT doc_id, 'types', CAST(len(list_distinct(toks)) AS BIGINT) FROM d),
      |pj AS (SELECT j, CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(v AS HUGEINT)) AS s, sum(CAST(v AS HUGEINT) * v) AS q FROM l GROUP BY 1),
      |vj AS (SELECT max(n) AS n_units,
      |    sum(CAST(n AS HUGEINT) * q - s * s) AS sumvj FROM pj),
      |tu AS (SELECT u, sum(CAST(v AS HUGEINT)) AS tsc FROM l GROUP BY 1),
      |vt AS (SELECT CAST(count(*) AS HUGEINT) * sum(tsc * tsc) - sum(tsc) * sum(tsc) AS vtn FROM tu)
      |SELECT CAST(3 AS BIGINT) AS k, n_units, CAST(0 AS BIGINT) AS n_incomplete,
      |  CAST(sumvj AS VARCHAR) AS sum_var_num, CAST(vtn AS VARCHAR) AS total_var_num,
      |  CASE WHEN n_units >= 2 AND vtn > 0 THEN
      |    round(3.0 / 2.0 * (1.0 - CAST(sumvj AS DOUBLE) / CAST(vtn AS DOUBLE)), 9) END AS alpha
      |FROM vj, vt""".stripMargin

  /** q271 oracle: [[graft.quality.Association.cohensD]] replayed —
    * exact HUGEINT variance numerators and mean-diff cross product,
    * the pooled-s dag and the Hedges correction.
    */
  private lazy val cohensDOracle: String =
    """WITH ev AS (SELECT CAST(event_type AS VARCHAR) AS grp,
      |    CAST(round(value * 1000) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
      |ga AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(v AS HUGEINT)) AS s, sum(CAST(v AS HUGEINT) * v) AS q
      |  FROM ev GROUP BY 1),
      |lab AS (SELECT *, count(*) OVER () AS ngrps,
      |    min(grp) OVER () AS grp_lo, max(grp) OVER () AS grp_hi FROM ga),
      |wide AS (SELECT grp_lo, grp_hi, ngrps,
      |    max(CASE WHEN grp = grp_lo THEN n END) AS n1,
      |    max(CASE WHEN grp = grp_hi THEN n END) AS n2,
      |    max(CASE WHEN grp = grp_lo THEN s END) AS s1,
      |    max(CASE WHEN grp = grp_hi THEN s END) AS s2,
      |    max(CASE WHEN grp = grp_lo THEN q END) AS q1,
      |    max(CASE WHEN grp = grp_hi THEN q END) AS q2
      |  FROM lab GROUP BY 1, 2, 3),
      |f AS (SELECT *,
      |    CAST(n1 AS HUGEINT) * q1 - s1 * s1 AS v1,
      |    CAST(n2 AS HUGEINT) * q2 - s2 * s2 AS v2,
      |    s1 * CAST(n2 AS HUGEINT) - s2 * CAST(n1 AS HUGEINT) AS dnum
      |  FROM wide),
      |e AS (SELECT *,
      |    CAST(dnum AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) /
      |      sqrt((CAST(v1 AS DOUBLE) / CAST(n1 AS DOUBLE) +
      |            CAST(v2 AS DOUBLE) / CAST(n2 AS DOUBLE)) /
      |           (CAST(n1 + n2 AS DOUBLE) - 2.0)) AS dd,
      |    ngrps = 2 AND n1 > 0 AND n2 > 0 AND n1 + n2 > 2 AND v1 + v2 > 0 AS ok
      |  FROM f)
      |SELECT grp_lo, grp_hi, CAST(ngrps AS BIGINT) AS n_groups,
      |  CASE WHEN ngrps = 2 THEN n1 END AS n_lo,
      |  CASE WHEN ngrps = 2 THEN n2 END AS n_hi,
      |  CASE WHEN ngrps = 2 THEN CAST(dnum AS VARCHAR) END AS diff_num,
      |  CASE WHEN ngrps = 2 THEN CAST(v1 AS VARCHAR) END AS var_num_lo,
      |  CASE WHEN ngrps = 2 THEN CAST(v2 AS VARCHAR) END AS var_num_hi,
      |  CASE WHEN ok THEN round(dd, 9) END AS d,
      |  CASE WHEN ok THEN
      |    round(dd * (1.0 - 3.0 / (4.0 * CAST(n1 + n2 AS DOUBLE) - 9.0)), 9)
      |  END AS g_hedges
      |FROM e""".stripMargin

  /** q277 oracle: [[graft.operators.RankEval.fleissKappa]] replayed —
    * the 3+partial-4th judge panel, per-(doc, label) counts, the m = 3
    * completeness drop, exact A/B numerators, κ one division.
    */
  private lazy val fleissKappaOracle: String =
    """WITH d AS (SELECT doc_id, n_chars,
      |    len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS toks
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, CAST(n_chars >= 256 AS VARCHAR) AS label FROM d
      |  UNION ALL SELECT doc_id, CAST(toks >= 40 AS VARCHAR) FROM d
      |  UNION ALL SELECT doc_id, CAST(doc_id % 2 = 0 AS VARCHAR) FROM d
      |  UNION ALL SELECT doc_id, CAST(n_chars >= 512 AS VARCHAR) FROM d WHERE doc_id % 5 = 0),
      |c AS (SELECT doc_id, label, CAST(count(*) AS HUGEINT) AS n
      |  FROM r WHERE doc_id IS NOT NULL AND label IS NOT NULL GROUP BY 1, 2),
      |u AS (SELECT doc_id, sum(n) AS mu, sum(n * n) AS sq FROM c GROUP BY 1),
      |meta AS (SELECT CAST(sum(CASE WHEN mu = 3 THEN 0 ELSE 1 END) AS BIGINT) AS ninc FROM u),
      |kept AS (SELECT * FROM u WHERE mu = 3),
      |obs AS (SELECT CAST(count(*) AS BIGINT) AS n_units,
      |    coalesce(sum(sq), 0) AS sumsq FROM kept),
      |mar AS (SELECT coalesce(sum(cv * cv), 0) AS b FROM (
      |  SELECT c.label, sum(c.n) AS cv FROM c JOIN kept ON c.doc_id = kept.doc_id
      |  GROUP BY 1)),
      |k AS (SELECT n_units, sumsq - CAST(n_units AS HUGEINT) * 3 AS a,
      |    CAST(n_units AS HUGEINT) * 6 AS d1,
      |    CAST(n_units AS HUGEINT) * 3 * CAST(n_units AS HUGEINT) * 3 AS n2,
      |    b, ninc
      |  FROM obs CROSS JOIN mar CROSS JOIN meta)
      |SELECT n_units, CAST(3 AS BIGINT) AS m, ninc AS n_incomplete,
      |  CAST(a AS VARCHAR) AS p_num, CAST(b AS VARCHAR) AS pe_num,
      |  CASE WHEN n_units > 0 THEN round(CAST(a AS DOUBLE) / CAST(d1 AS DOUBLE), 9) END AS p_obs,
      |  CASE WHEN n_units > 0 THEN round(CAST(b AS DOUBLE) / CAST(n2 AS DOUBLE), 9) END AS p_exp,
      |  CASE WHEN n_units > 0 AND n2 <> b THEN
      |    round(CAST(a * n2 - b * d1 AS DOUBLE) / CAST(d1 * (n2 - b) AS DOUBLE), 9)
      |  END AS kappa
      |FROM k""".stripMargin

  /** q278 oracle: [[graft.quality.Association.oneWayAnova]] replayed —
    * exact per-group moments, DECIMAL deviations D = N·S_g − n_g·S and
    * E = n_g·Q_g − S_g², nano between/within terms, F one fixed dag
    * (the q250 Brown–Forsythe dag with z = x).
    */
  private lazy val anovaOracle: String =
    """WITH d AS (SELECT CAST(event_type AS VARCHAR) AS grp,
      |    CAST(round(value * 1000) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
      |ga AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_g,
      |    sum(CAST(v AS HUGEINT)) AS s, sum(CAST(v AS HUGEINT) * v) AS q
      |  FROM d GROUP BY 1),
      |tot AS (SELECT *, sum(n_g) OVER () AS n, count(*) OVER () AS k,
      |    sum(s) OVER () AS stot FROM ga),
      |t9 AS (SELECT *,
      |    CAST(round(CAST(CAST(n AS HUGEINT) * s - CAST(n_g AS HUGEINT) * stot AS DOUBLE) *
      |      CAST(CAST(n AS HUGEINT) * s - CAST(n_g AS HUGEINT) * stot AS DOUBLE) /
      |      (CAST(n_g AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * 1e9) AS HUGEINT) AS b9,
      |    CAST(round(CAST(CAST(n_g AS HUGEINT) * q - s * s AS DOUBLE) /
      |      CAST(n_g AS DOUBLE) * 1e9) AS HUGEINT) AS w9
      |  FROM tot),
      |f AS (SELECT *, sum(b9) OVER () AS b9s, sum(w9) OVER () AS w9s FROM t9)
      |SELECT grp, n_g, CAST(s AS VARCHAR) AS s, CAST(n AS BIGINT) AS n,
      |  CAST(k AS BIGINT) AS k,
      |  CASE WHEN k >= 2 AND n > k AND w9s > 0 THEN
      |    round(CAST(n - k AS DOUBLE) / CAST(k - 1 AS DOUBLE) *
      |      (CAST(b9s AS DOUBLE) / CAST(w9s AS DOUBLE)), 9)
      |  END AS f
      |FROM f ORDER BY grp""".stripMargin

  /** q351 oracle: [[graft.quality.Association.yuenT]] replayed —
    * per-arm (value, event_id) ranks, g = (20n)//100, exact HUGEINT
    * trimmed/winsorized sums with the g·(v_lo + v_hi) clamp mass, the
    * winsorized variance numerators, and the t / Welch–Satterthwaite
    * df dags in the Spark float order ('click' < 'view' = lo/hi).
    */
  private lazy val yuenTOracle: String =
    """WITH ev AS (SELECT CAST(event_type AS VARCHAR) AS grp, event_id,
      |    CAST(round(value * 1000) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
      |r AS (SELECT grp, v,
      |    row_number() OVER (PARTITION BY grp ORDER BY v, event_id) AS rn,
      |    count(*) OVER (PARTITION BY grp) AS n FROM ev),
      |r2 AS (SELECT *, (20 * n) // 100 AS gg FROM r),
      |ga AS (SELECT grp, CAST(max(n) AS BIGINT) AS n,
      |    CAST(max(gg) AS BIGINT) AS gg,
      |    sum(CASE WHEN rn > gg AND rn <= n - gg
      |      THEN CAST(v AS HUGEINT) ELSE 0 END) AS ts,
      |    sum(CASE WHEN rn > gg AND rn <= n - gg
      |      THEN CAST(v AS HUGEINT) * v ELSE 0 END) AS tq,
      |    max(CASE WHEN rn = gg + 1 THEN v END) AS vlo,
      |    max(CASE WHEN rn = n - gg THEN v END) AS vhi
      |  FROM r2 GROUP BY 1),
      |gb AS (SELECT *, n - 2 * gg AS h,
      |    ts + CAST(gg AS HUGEINT) * (CAST(vlo AS HUGEINT) + vhi) AS ws,
      |    tq + CAST(gg AS HUGEINT) *
      |      (CAST(vlo AS HUGEINT) * vlo + CAST(vhi AS HUGEINT) * vhi) AS wq
      |  FROM ga),
      |lab AS (SELECT *, count(*) OVER () AS ngrps,
      |    min(grp) OVER () AS grp_lo, max(grp) OVER () AS grp_hi FROM gb),
      |wide AS (SELECT grp_lo, grp_hi, ngrps,
      |    max(CASE WHEN grp = grp_lo THEN n END) AS n1,
      |    max(CASE WHEN grp = grp_lo THEN gg END) AS g1,
      |    max(CASE WHEN grp = grp_lo THEN h END) AS h1,
      |    max(CASE WHEN grp = grp_lo THEN ts END) AS t1,
      |    max(CASE WHEN grp = grp_lo THEN ws END) AS ws1,
      |    max(CASE WHEN grp = grp_lo THEN wq END) AS wq1,
      |    max(CASE WHEN grp = grp_hi THEN n END) AS n2,
      |    max(CASE WHEN grp = grp_hi THEN gg END) AS g2,
      |    max(CASE WHEN grp = grp_hi THEN h END) AS h2,
      |    max(CASE WHEN grp = grp_hi THEN ts END) AS t2,
      |    max(CASE WHEN grp = grp_hi THEN ws END) AS ws2,
      |    max(CASE WHEN grp = grp_hi THEN wq END) AS wq2
      |  FROM lab GROUP BY 1, 2, 3),
      |f AS (SELECT *,
      |    CAST(n1 AS HUGEINT) * wq1 - ws1 * ws1 AS vw1,
      |    CAST(n2 AS HUGEINT) * wq2 - ws2 * ws2 AS vw2,
      |    t1 * h2 - t2 * h1 AS diffnum
      |  FROM wide),
      |k AS (SELECT *,
      |    CAST(vw1 AS DOUBLE) / CAST(n1 AS DOUBLE) /
      |      (CAST(h1 AS DOUBLE) * (CAST(h1 AS DOUBLE) - 1.0)) AS se1,
      |    CAST(vw2 AS DOUBLE) / CAST(n2 AS DOUBLE) /
      |      (CAST(h2 AS DOUBLE) * (CAST(h2 AS DOUBLE) - 1.0)) AS se2
      |  FROM f),
      |-- the operator's guard branches, mirrored: ok needs two groups,
      |-- h >= 2 each side, and a live pooled winsorized variance
      |z AS (SELECT *, se1 + se2 AS se,
      |    ngrps = 2 AND h1 >= 2 AND h2 >= 2 AND (vw1 + vw2) > 0 AS ok
      |  FROM k)
      |SELECT grp_lo, grp_hi, CAST(ngrps AS BIGINT) AS n_groups,
      |  CASE WHEN ngrps = 2 THEN n1 END AS n_lo,
      |  CASE WHEN ngrps = 2 THEN n2 END AS n_hi,
      |  CASE WHEN ngrps = 2 THEN g1 END AS g_lo,
      |  CASE WHEN ngrps = 2 THEN g2 END AS g_hi,
      |  CASE WHEN ngrps = 2 THEN h1 END AS h_lo,
      |  CASE WHEN ngrps = 2 THEN h2 END AS h_hi,
      |  CASE WHEN ngrps = 2 AND h1 > 0 THEN
      |    round(CAST(t1 AS DOUBLE) / CAST(h1 AS DOUBLE), 9) END AS mean_trim_lo,
      |  CASE WHEN ngrps = 2 AND h2 > 0 THEN
      |    round(CAST(t2 AS DOUBLE) / CAST(h2 AS DOUBLE), 9) END AS mean_trim_hi,
      |  CASE WHEN ngrps = 2 AND h1 > 0 AND h2 > 0 THEN
      |    round(CAST(diffnum AS DOUBLE) /
      |      (CAST(h1 AS DOUBLE) * CAST(h2 AS DOUBLE)), 9) END AS effect_trim,
      |  CASE WHEN ok THEN round(CAST(diffnum AS DOUBLE) /
      |    (CAST(h1 AS DOUBLE) * CAST(h2 AS DOUBLE)) / sqrt(se), 9) END AS t,
      |  CASE WHEN ok THEN
      |    round(se * se / (se1 * se1 / (CAST(h1 AS DOUBLE) - 1.0) +
      |      se2 * se2 / (CAST(h2 AS DOUBLE) - 1.0)), 9) END AS df
      |FROM z""".stripMargin

  /** q356 oracle: [[graft.quality.Association.tostTwoProportion]]
    * replayed — per-user conversion, the two splits unioned, exact
    * counts/cross-product delta, the unpooled Wald se, both one-sided
    * z's, Φ through the SHARED phiSqlFragment (bitwise-equal to the
    * operator's phiCol dag), and the pinned nano verdict compare.
    */
  private lazy val tostOracle: String = {
    val phiL = graft.quality.GroupSequential.phiSqlFragment("zl")
    val phiU = graft.quality.GroupSequential.phiSqlFragment("zu")
    s"""WITH pu AS (SELECT user_id,
      |    CASE WHEN max(CASE WHEN value >= 250 THEN 1 ELSE 0 END) > 0
      |      THEN 1 ELSE 0 END AS hit
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |b AS (SELECT 'parity' AS split,
      |    CAST(user_id % 2 = 0 AS VARCHAR) AS arm, hit FROM pu
      |  UNION ALL SELECT 'third',
      |    CAST(user_id % 3 = 0 AS VARCHAR), hit FROM pu),
      |c AS (SELECT split, arm, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(hit) AS BIGINT) AS s
      |  FROM b GROUP BY 1, 2),
      |lab AS (SELECT *, count(*) OVER (PARTITION BY split) AS ngrps,
      |    min(arm) OVER (PARTITION BY split) AS grp_lo,
      |    max(arm) OVER (PARTITION BY split) AS grp_hi FROM c),
      |w AS (SELECT split, grp_lo, grp_hi, ngrps,
      |    max(CASE WHEN arm = grp_lo THEN n END) AS n1,
      |    max(CASE WHEN arm = grp_lo THEN s END) AS s1,
      |    max(CASE WHEN arm = grp_hi THEN n END) AS n2,
      |    max(CASE WHEN arm = grp_hi THEN s END) AS s2
      |  FROM lab GROUP BY 1, 2, 3, 4),
      |f AS (SELECT *,
      |    CAST(CAST(s1 AS HUGEINT) * n2 - CAST(s2 AS HUGEINT) * n1 AS DOUBLE) /
      |      (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS delta,
      |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
      |    CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2
      |  FROM w),
      |k AS (SELECT *, sqrt(p1 * (1.0 - p1) / CAST(n1 AS DOUBLE) +
      |    p2 * (1.0 - p2) / CAST(n2 AS DOUBLE)) AS se FROM f),
      |z AS (SELECT *, (delta + 0.15) / se AS zl, (0.15 - delta) / se AS zu
      |  FROM k),
      |-- the operator's guard branches, mirrored: live iff some arm's
      |-- conversions sit strictly inside (0, n) (se > 0), ok gates every
      |-- statistic so the oracle survives a degenerate fixture drift
      |p AS (SELECT *, 1.0 - $phiL AS pl, 1.0 - $phiU AS pu2,
      |    ngrps = 2 AND n1 > 0 AND n2 > 0 AND
      |      ((s1 > 0 AND s1 < n1) OR (s2 > 0 AND s2 < n2)) AS ok
      |  FROM z)
      |SELECT split, grp_lo, grp_hi, CAST(ngrps AS BIGINT) AS n_groups,
      |  CASE WHEN ngrps = 2 THEN n1 END AS n_lo,
      |  CASE WHEN ngrps = 2 THEN s1 END AS s_lo,
      |  CASE WHEN ngrps = 2 THEN n2 END AS n_hi,
      |  CASE WHEN ngrps = 2 THEN s2 END AS s_hi,
      |  CASE WHEN ngrps = 2 AND n1 > 0 AND n2 > 0 THEN round(delta, 9) END
      |    AS delta,
      |  CASE WHEN ok THEN round(se, 9) END AS se,
      |  CASE WHEN ok THEN round(zl, 9) END AS z_lower,
      |  CASE WHEN ok THEN round(zu, 9) END AS z_upper,
      |  CASE WHEN ok THEN round(greatest(pl, pu2), 9) END AS p_tost,
      |  CASE WHEN ok THEN
      |    CAST(round(least(zl, zu) * 1e9) AS BIGINT) >= 1644854000 END
      |    AS equivalent
      |FROM p ORDER BY split""".stripMargin
  }

  /** q357 oracle: [[graft.quality.Association.tostMean]] replayed —
    * the two splits unioned, exact HUGEINT moments per (split, arm),
    * the welchT variance numerators and cross-product delta, the
    * unpooled se, both one-sided z's, Φ via phiSqlFragment, the
    * pinned nano verdict.
    */
  private lazy val tostMeanOracle: String = {
    val phiL = graft.quality.GroupSequential.phiSqlFragment("zl")
    val phiU = graft.quality.GroupSequential.phiSqlFragment("zu")
    s"""WITH ev AS (SELECT event_type, event_id,
      |    CAST(round(value * 1000) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL),
      |b AS (SELECT 'parity' AS split,
      |    CAST(event_id % 2 = 0 AS VARCHAR) AS arm, v FROM ev
      |  UNION ALL SELECT 'type', CAST(event_type AS VARCHAR), v FROM ev
      |    WHERE event_type IN ('click', 'view')),
      |m AS (SELECT split, arm, CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(v AS HUGEINT)) AS s, sum(CAST(v AS HUGEINT) * v) AS q
      |  FROM b GROUP BY 1, 2),
      |lab AS (SELECT *, count(*) OVER (PARTITION BY split) AS ngrps,
      |    min(arm) OVER (PARTITION BY split) AS grp_lo,
      |    max(arm) OVER (PARTITION BY split) AS grp_hi FROM m),
      |w AS (SELECT split, grp_lo, grp_hi, ngrps,
      |    max(CASE WHEN arm = grp_lo THEN n END) AS n1,
      |    max(CASE WHEN arm = grp_lo THEN s END) AS s1,
      |    max(CASE WHEN arm = grp_lo THEN q END) AS q1,
      |    max(CASE WHEN arm = grp_hi THEN n END) AS n2,
      |    max(CASE WHEN arm = grp_hi THEN s END) AS s2,
      |    max(CASE WHEN arm = grp_hi THEN q END) AS q2
      |  FROM lab GROUP BY 1, 2, 3, 4),
      |f AS (SELECT *,
      |    CAST(n1 AS HUGEINT) * q1 - s1 * s1 AS v1,
      |    CAST(n2 AS HUGEINT) * q2 - s2 * s2 AS v2,
      |    CAST(s1 * n2 - s2 * n1 AS DOUBLE) /
      |      (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS delta
      |  FROM w),
      |k AS (SELECT *, sqrt(CAST(v1 AS DOUBLE) /
      |    (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) +
      |    CAST(v2 AS DOUBLE) /
      |    (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)))
      |    AS se FROM f),
      |z AS (SELECT *, (delta + 4000.0) / se AS zl, (4000.0 - delta) / se AS zu
      |  FROM k),
      |-- the operator's guard branches, mirrored: ok needs two groups,
      |-- n >= 2 each side, and a live pooled variance
      |p AS (SELECT *, 1.0 - $phiL AS pl, 1.0 - $phiU AS pu2,
      |    ngrps = 2 AND n1 >= 2 AND n2 >= 2 AND (v1 + v2) > 0 AS ok
      |  FROM z)
      |SELECT split, grp_lo, grp_hi, CAST(ngrps AS BIGINT) AS n_groups,
      |  CASE WHEN ngrps = 2 THEN n1 END AS n_lo,
      |  CASE WHEN ngrps = 2 THEN n2 END AS n_hi,
      |  CASE WHEN ngrps = 2 AND n1 > 0 AND n2 > 0 THEN round(delta, 9) END
      |    AS delta,
      |  CASE WHEN ok THEN round(se, 9) END AS se,
      |  CASE WHEN ok THEN round(zl, 9) END AS z_lower,
      |  CASE WHEN ok THEN round(zu, 9) END AS z_upper,
      |  CASE WHEN ok THEN round(greatest(pl, pu2), 9) END AS p_tost,
      |  CASE WHEN ok THEN
      |    CAST(round(least(zl, zu) * 1e9) AS BIGINT) >= 1644854000 END
      |    AS equivalent
      |FROM p ORDER BY split""".stripMargin
  }

  /** q358 oracle: [[graft.quality.Association.hodgesLehmann]] replayed
    * — the q352 difference CTE, diff cells, the a ≤ b cell-pair grid
    * with doubled HUGEINT weights (diagonal c(c+1), off-diagonal
    * 2·c_a·c_b), per-s₂ sums, and the doubled lower-median rank
    * selection 2·cum₂ ≥ T₂.
    */
  private lazy val hodgesLehmannOracle: String =
    """WITH pu AS (SELECT user_id,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) -
      |    CAST(sum(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |cells AS (SELECT d, CAST(count(*) AS BIGINT) AS c FROM pu GROUP BY 1),
      |pr AS (SELECT a.d AS da, a.c AS ca, b.d AS db, b.c AS cb
      |  FROM cells a JOIN cells b ON a.d <= b.d),
      |s AS (SELECT da + db AS s2,
      |    sum(CASE WHEN da = db THEN CAST(ca AS HUGEINT) * (ca + 1)
      |      ELSE 2 * CAST(ca AS HUGEINT) * cb END) AS w2s
      |  FROM pr GROUP BY 1),
      |r AS (SELECT *, sum(w2s) OVER (ORDER BY s2
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
      |    sum(w2s) OVER () AS t2 FROM s)
      |SELECT CAST(max(t2) AS VARCHAR) AS n_pairs2,
      |  CAST(min(CASE WHEN 2 * cum2 >= t2 THEN s2 END) AS VARCHAR) AS hl2,
      |  round(CAST(min(CASE WHEN 2 * cum2 >= t2 THEN s2 END) AS DOUBLE) / 2.0, 9)
      |    AS hl
      |FROM r""".stripMargin

  /** q359/q360 oracle: [[graft.quality.BayesAb.bayesAbKArmFromCells]]
    * replayed END TO END from raw events — the q345 per-user/cell/spine
    * /cumulative CTEs (counts only), then the full deterministic
    * integration: the 2¹³ midpoint grid, the shared atanh-series ln
    * fragment (bitwise-equal to the operator's lnOdd2N dag), the
    * 1e12 ln landing, exact HUGEINT log-kernels with the max-shift,
    * the 1e13-quantized pdf kernel, integer cumulative windows, the
    * exact-integer CI rank selections (cum·200 ≥ W·5 / W·195), and the
    * O(N) cumulative identities for P(beat) and both expected losses.
    */
  /** q367/q368 oracle: [[graft.quality.BayesMean.bayesMeanKArmFromCells]]
    * replayed from raw events — the capped-value per-user fixture, the
    * exact HUGEINT outcome moments per (arm, peek), the spine +
    * cumulative window, then the closed-form normal-posterior chain in
    * the operator's float order: the welchT variance dags, Δ's exact
    * cross product, Φ via the shared Chebyshev-erfc fragment, φ as one
    * engine exp over √(2π)'s correctly-rounded double, the two
    * normal-loss integrals.
    */
  private lazy val bayesMeanOracle: String = {
    val phiD = graft.quality.GroupSequential.phiSqlFragment("(d)")
    val phiNegD = graft.quality.GroupSequential.phiSqlFragment("(-1.0 * d)")
    s"""WITH ev AS (SELECT user_id, event_id, value,
      |    CASE WHEN user_id % 20 < 8 THEN 'A'
      |      WHEN user_id % 20 < 14 THEN 'B'
      |      WHEN user_id % 20 < 18 THEN 'C'
      |      WHEN user_id % 20 < 19 THEN 'D' ELSE 'E' END AS arm
      |  FROM events WHERE user_id IS NOT NULL),
      |pu AS (SELECT user_id, arm, CAST(user_id % 6 AS BIGINT) AS peek,
      |    coalesce(sum(CASE WHEN value IS NOT NULL THEN
      |      least(CAST(floor(value) AS BIGINT),
      |        CASE WHEN arm = 'B' THEN 20 WHEN arm = 'D' THEN 200
      |          ELSE 60 END) END), 0) AS y
      |  FROM ev GROUP BY user_id, arm),
      |cells AS (SELECT arm, peek, CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(y AS HUGEINT)) AS sy,
      |    sum(CAST(y AS HUGEINT) * y) AS syy
      |  FROM pu WHERE arm IN ('A','B','C','D') GROUP BY 1, 2),
      |spine AS (SELECT a.arm, p.peek
      |  FROM (VALUES ('A'), ('B'), ('C'), ('D')) a(arm)
      |  CROSS JOIN (SELECT DISTINCT peek FROM cells) p),
      |cum AS (SELECT arm, peek,
      |    CAST(sum(coalesce(c.n, 0)) OVER w AS BIGINT) AS n,
      |    CAST(sum(coalesce(c.sy, 0)) OVER w AS HUGEINT) AS sy,
      |    CAST(sum(coalesce(c.syy, 0)) OVER w AS HUGEINT) AS syy
      |  FROM spine sp LEFT JOIN cells c USING (arm, peek)
      |  WINDOW w AS (PARTITION BY arm ORDER BY peek
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |st AS (SELECT arm, peek, n, sy,
      |    CASE WHEN n > 0 THEN CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) END
      |      AS m,
      |    CAST(n AS HUGEINT) * syy - sy * sy AS v
      |  FROM cum),
      |st2 AS (SELECT *,
      |    CASE WHEN n >= 2 THEN CAST(v AS DOUBLE) /
      |      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) *
      |        (CAST(n AS DOUBLE) - 1.0)) END AS se2
      |  FROM st),
      |st3 AS (SELECT *, sqrt(se2) AS se FROM st2),
      |j AS (SELECT t.arm, t.peek,
      |    t.n AS nt, t.sy AS syt, t.m AS mt, t.se2 AS se2t, t.se AS set_,
      |    c.n AS nc, c.sy AS syc, c.m AS mc, c.se2 AS se2c, c.se AS sec,
      |    CASE WHEN t.n > 0 AND c.n > 0 THEN
      |      CAST(t.sy * CAST(c.n AS HUGEINT) -
      |        c.sy * CAST(t.n AS HUGEINT) AS DOUBLE) /
      |      (CAST(t.n AS DOUBLE) * CAST(c.n AS DOUBLE)) END AS delta,
      |    CASE WHEN t.n >= 2 AND c.n >= 2 THEN sqrt(t.se2 + c.se2) END
      |      AS sed
      |  FROM st3 t JOIN st3 c ON t.peek = c.peek
      |    AND t.arm <> 'A' AND c.arm = 'A'),
      |j2 AS (SELECT *,
      |    CASE WHEN sed > 0 THEN delta / sed END AS d,
      |    nt >= 2 AND nc >= 2 AND sed > 0 AS ok
      |  FROM j),
      |j3 AS (SELECT *,
      |    exp(-0.5 * d * d) / 2.5066282746310002 AS pdf
      |  FROM j2)
      |SELECT peek, arm, nt AS n_arm,
      |  round(mt, 9) AS mean_arm, round(set_, 9) AS se_arm,
      |  round(mt - 1.959964 * set_, 9) AS cred_lo_arm,
      |  round(mt + 1.959964 * set_, 9) AS cred_hi_arm,
      |  nc AS n_ctl,
      |  round(mc, 9) AS mean_ctl, round(sec, 9) AS se_ctl,
      |  round(mc - 1.959964 * sec, 9) AS cred_lo_ctl,
      |  round(mc + 1.959964 * sec, 9) AS cred_hi_ctl,
      |  round(delta, 9) AS delta,
      |  CASE WHEN ok THEN round(sed, 9) END AS se_delta,
      |  CASE WHEN ok THEN round($phiD, 9) END AS p_beat_ctl,
      |  CASE WHEN ok THEN round(sed * pdf - delta * $phiNegD, 9) END
      |    AS exp_loss_arm,
      |  CASE WHEN ok THEN round(sed * pdf + delta * $phiD, 9) END
      |    AS exp_loss_ctl,
      |  ok
      |FROM j3 ORDER BY peek, arm""".stripMargin
  }

  /** q369/q370 oracle:
    * [[graft.quality.RatioMetric.ratioDeltaKArmFromCells]] replayed
    * from raw events — the arm-dependent-numerator per-user fixture,
    * the exact HUGEINT (y, x) moment set per (arm, peek), spine +
    * cumulative window, then the delta-method chain in the operator's
    * float order: the PSD quadratic form (clamped at 0 — DuckDB's sqrt
    * errors on the −1e-16 rounding at true zero variance where Spark
    * yields NaN), Δ's exact cross product, z, the Φ two-sided p, the
    * pinned-z CI.
    */
  private lazy val ratioDeltaOracle: String = {
    val phiAbsZ = graft.quality.GroupSequential.phiSqlFragment("(abs(z))")
    s"""WITH ev AS (SELECT user_id, event_type, value,
      |    CASE WHEN user_id % 20 < 8 THEN 'A'
      |      WHEN user_id % 20 < 14 THEN 'B'
      |      WHEN user_id % 20 < 18 THEN 'C'
      |      WHEN user_id % 20 < 19 THEN 'D' ELSE 'E' END AS arm
      |  FROM events WHERE user_id IS NOT NULL),
      |pu AS (SELECT user_id, arm, CAST(user_id % 6 AS BIGINT) AS peek,
      |    CAST(sum(CASE WHEN (CASE
      |      WHEN arm = 'B' THEN event_type = 'click' AND value >= 30.0
      |      WHEN arm = 'D' THEN event_type IN ('click', 'purchase')
      |      ELSE event_type = 'click' END) THEN 1 ELSE 0 END) AS BIGINT)
      |      AS y,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x
      |  FROM ev GROUP BY user_id, arm),
      |cells AS (SELECT arm, peek, CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(y AS HUGEINT) * y) AS syy,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy
      |  FROM pu WHERE arm IN ('A','B','C','D') GROUP BY 1, 2),
      |spine AS (SELECT a.arm, p.peek
      |  FROM (VALUES ('A'), ('B'), ('C'), ('D')) a(arm)
      |  CROSS JOIN (SELECT DISTINCT peek FROM cells) p),
      |cum AS (SELECT arm, peek,
      |    CAST(sum(coalesce(c.n, 0)) OVER w AS BIGINT) AS n,
      |    CAST(sum(coalesce(c.sx, 0)) OVER w AS HUGEINT) AS sx,
      |    CAST(sum(coalesce(c.sy, 0)) OVER w AS HUGEINT) AS sy,
      |    CAST(sum(coalesce(c.sxx, 0)) OVER w AS HUGEINT) AS sxx,
      |    CAST(sum(coalesce(c.syy, 0)) OVER w AS HUGEINT) AS syy,
      |    CAST(sum(coalesce(c.sxy, 0)) OVER w AS HUGEINT) AS sxy
      |  FROM spine sp LEFT JOIN cells c USING (arm, peek)
      |  WINDOW w AS (PARTITION BY arm ORDER BY peek
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |st AS (SELECT arm, peek, n, sx, sy,
      |    CASE WHEN sx <> 0 THEN CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE)
      |      END AS r,
      |    CAST(n AS HUGEINT) * syy - sy * sy AS vyy,
      |    CAST(n AS HUGEINT) * sxx - sx * sx AS vxx,
      |    CAST(n AS HUGEINT) * sxy - sy * sx AS vxy
      |  FROM cum),
      |st2 AS (SELECT *,
      |    CASE WHEN n >= 2 AND sx <> 0 THEN greatest(
      |      (CAST(vyy AS DOUBLE) - 2.0 * r * CAST(vxy AS DOUBLE) +
      |        r * r * CAST(vxx AS DOUBLE)) /
      |      ((CAST(n AS DOUBLE) - 1.0) * CAST(sx * sx AS DOUBLE)), 0.0)
      |      END AS var
      |  FROM st),
      |j AS (SELECT t.arm, t.peek,
      |    t.n AS nt, t.r AS rt, t.var AS vart, sqrt(t.var) AS set_,
      |    c.n AS nc, c.r AS rc, c.var AS varc, sqrt(c.var) AS sec,
      |    CASE WHEN t.sx <> 0 AND c.sx <> 0 THEN
      |      CAST(t.sy * c.sx - c.sy * t.sx AS DOUBLE) /
      |      (CAST(t.sx AS DOUBLE) * CAST(c.sx AS DOUBLE)) END AS delta,
      |    CASE WHEN t.var IS NOT NULL AND c.var IS NOT NULL THEN
      |      sqrt(t.var + c.var) END AS sed
      |  FROM st2 t JOIN st2 c ON t.peek = c.peek
      |    AND t.arm <> 'A' AND c.arm = 'A'),
      |j2 AS (SELECT *,
      |    CASE WHEN sed > 0 THEN delta / sed END AS z,
      |    coalesce(nt >= 2 AND nc >= 2 AND sed > 0, false) AS ok
      |  FROM j)
      |SELECT peek, arm, nt AS n_arm,
      |  round(rt, 9) AS ratio_arm, round(set_, 9) AS se_arm,
      |  nc AS n_ctl, round(rc, 9) AS ratio_ctl, round(sec, 9) AS se_ctl,
      |  round(delta, 9) AS delta,
      |  CASE WHEN ok THEN round(sed, 9) END AS se_delta,
      |  CASE WHEN ok THEN round(z, 9) END AS z,
      |  CASE WHEN ok THEN round(2.0 * (1.0 - $phiAbsZ), 9) END AS p_value,
      |  CASE WHEN ok THEN round(delta - 1.959964 * sed, 9) END AS ci_lo,
      |  CASE WHEN ok THEN round(delta + 1.959964 * sed, 9) END AS ci_hi,
      |  ok
      |FROM j2 ORDER BY peek, arm""".stripMargin
  }

  /** q382 oracle: [[graft.quality.BayesAb.bayesBestKArmFromCells]]
    * replayed — the q359 grid CTEs verbatim, then the k-wide (peek, i)
    * pivot, the fixed-order half-tie cdf products, integer-rounded
    * terms summed order-free, one division per arm.
    */
  private lazy val bayesBestOracle: String = {
    val gridCtes = bayesAbOracle.substring(0,
      bayesAbOracle.indexOf(",\nst AS"))
    def cdf(a: String) =
      s"(CAST(2 * c$a + q$a AS DOUBLE) / CAST(2 * w$a AS DOUBLE))"
    def pivArm(a: String) =
      s"""max(CASE WHEN arm = '$a' THEN q END) AS q$a,
        |    max(CASE WHEN arm = '$a' THEN cumlt END) AS c$a,
        |    max(CASE WHEN arm = '$a' THEN w END) AS w$a""".stripMargin
    def term(t: String) = {
      val prod = Seq("A", "B", "C", "D").filter(_ != t).map(cdf)
        .mkString(" * ")
      s"""sum(CAST(round(CAST(q$t AS DOUBLE) * ($prod)) AS HUGEINT))
        |      AS s$t, max(w$t) AS wm$t""".stripMargin
    }
    gridCtes + s""",
      |piv AS (SELECT peek, i,
      |    ${pivArm("A")},
      |    ${pivArm("B")},
      |    ${pivArm("C")},
      |    ${pivArm("D")}
      |  FROM cs GROUP BY 1, 2),
      |ag AS (SELECT peek,
      |    ${term("A")},
      |    ${term("B")},
      |    ${term("C")},
      |    ${term("D")}
      |  FROM piv GROUP BY 1),
      |un AS (
      |  SELECT peek, 'A' AS arm,
      |    CAST(sA AS DOUBLE) / CAST(wmA AS DOUBLE) AS p_best FROM ag
      |  UNION ALL SELECT peek, 'B',
      |    CAST(sB AS DOUBLE) / CAST(wmB AS DOUBLE) FROM ag
      |  UNION ALL SELECT peek, 'C',
      |    CAST(sC AS DOUBLE) / CAST(wmC AS DOUBLE) FROM ag
      |  UNION ALL SELECT peek, 'D',
      |    CAST(sD AS DOUBLE) / CAST(wmD AS DOUBLE) FROM ag)
      |SELECT c.peek, u.arm, c.n, c.s_hit,
      |  round(CAST(1 + c.s_hit AS DOUBLE) / CAST(2 + c.n AS DOUBLE), 9)
      |    AS post_mean,
      |  round(u.p_best, 9) AS p_best
      |FROM un u JOIN cum c ON c.peek = u.peek AND c.arm = u.arm
      |ORDER BY c.peek, u.arm""".stripMargin
  }

  private lazy val bayesAbOracle: String = {
    val lnx = graft.quality.BayesAb.lnOdd2NSqlFragment("u1")
    val lnm = graft.quality.BayesAb.lnOdd2NSqlFragment("u2")
    s"""WITH pu0 AS (SELECT user_id,
      |    CASE WHEN user_id % 20 < 8 THEN 'A'
      |      WHEN user_id % 20 < 14 THEN 'B'
      |      WHEN user_id % 20 < 18 THEN 'C'
      |      WHEN user_id % 20 < 19 THEN 'D' ELSE 'E' END AS arm,
      |    CAST(user_id % 6 AS BIGINT) AS peek,
      |    max(value) AS maxv
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |pu AS (SELECT arm, peek,
      |    CASE WHEN coalesce(maxv >= CASE WHEN arm = 'B' THEN 200.0
      |      WHEN arm = 'D' THEN 300.0 ELSE 250.0 END, false)
      |      THEN 1 ELSE 0 END AS hit
      |  FROM pu0 WHERE arm IN ('A','B','C','D')),
      |cells AS (SELECT arm, peek, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(hit) AS BIGINT) AS s_hit
      |  FROM pu GROUP BY 1, 2),
      |spine AS (SELECT a.arm, p.peek
      |  FROM (VALUES ('A'), ('B'), ('C'), ('D')) a(arm)
      |  CROSS JOIN (SELECT DISTINCT peek FROM cells) p),
      |cum AS (SELECT arm, peek,
      |    CAST(sum(coalesce(c.n, 0)) OVER w AS BIGINT) AS n,
      |    CAST(sum(coalesce(c.s_hit, 0)) OVER w AS BIGINT) AS s_hit
      |  FROM spine sp LEFT JOIN cells c USING (arm, peek)
      |  WINDOW w AS (PARTITION BY arm ORDER BY peek
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |gr AS (SELECT c.arm, c.peek, c.n, c.s_hit, CAST(g.i AS BIGINT) AS i,
      |    CAST(2 * g.i + 1 AS BIGINT) AS u1,
      |    CAST(16384 - (2 * g.i + 1) AS BIGINT) AS u2,
      |    c.s_hit AS am1, c.n - c.s_hit AS bm1
      |  FROM cum c CROSS JOIN generate_series(0, 8191) g(i)),
      |l AS (SELECT *,
      |    CAST(round($lnx * 1e12) AS BIGINT) AS lnx12,
      |    CAST(round($lnm * 1e12) AS BIGINT) AS lnm12
      |  FROM gr),
      |k AS (SELECT *, CAST(am1 AS HUGEINT) * lnx12 +
      |    CAST(bm1 AS HUGEINT) * lnm12 AS lnw FROM l),
      |k2 AS (SELECT *, lnw - max(lnw) OVER (PARTITION BY arm, peek) AS rel
      |  FROM k),
      |qq AS (SELECT *, CASE WHEN rel < -40000000000000 THEN 0
      |    ELSE CAST(round(exp(CAST(rel AS DOUBLE) / 1e12) * 1e13) AS BIGINT)
      |    END AS q FROM k2),
      |cs AS (SELECT *,
      |    CAST(coalesce(sum(q) OVER lt, 0) AS BIGINT) AS cumlt,
      |    CAST(coalesce(sum(CAST(i AS HUGEINT) * q) OVER lt, 0) AS HUGEINT)
      |      AS cumiq,
      |    CAST(sum(q) OVER (PARTITION BY arm, peek) AS BIGINT) AS w
      |  FROM qq
      |  WINDOW lt AS (PARTITION BY arm, peek ORDER BY i
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |st AS (SELECT arm, peek, max(n) AS n, max(s_hit) AS s_hit,
      |    min(CASE WHEN CAST(cumlt + q AS HUGEINT) * 200 >=
      |      CAST(w AS HUGEINT) * 5
      |      THEN CAST(2 * i + 1 AS DOUBLE) / 16384.0 END) AS ci_lo,
      |    min(CASE WHEN CAST(cumlt + q AS HUGEINT) * 200 >=
      |      CAST(w AS HUGEINT) * 195
      |      THEN CAST(2 * i + 1 AS DOUBLE) / 16384.0 END) AS ci_hi
      |  FROM cs GROUP BY 1, 2),
      |cmp AS (SELECT t.arm, t.peek,
      |    sum(CAST(t.q AS HUGEINT) * (2 * CAST(c.cumlt AS HUGEINT) + c.q))
      |      AS pb2,
      |    sum(CAST(c.q AS HUGEINT) *
      |      (CAST(t.i AS HUGEINT) * t.cumlt - t.cumiq)) AS lt2,
      |    sum(CAST(t.q AS HUGEINT) *
      |      (CAST(c.i AS HUGEINT) * c.cumlt - c.cumiq)) AS lc2,
      |    max(t.w) AS wt, max(c.w) AS wc
      |  FROM cs t JOIN cs c ON t.peek = c.peek AND t.i = c.i
      |    AND t.arm <> 'A' AND c.arm = 'A'
      |  GROUP BY 1, 2)
      |SELECT t.peek, t.arm,
      |  t.n AS n_arm, t.s_hit AS s_arm,
      |  CAST(1 + t.s_hit AS BIGINT) AS a_arm,
      |  CAST(1 + t.n - t.s_hit AS BIGINT) AS b_arm,
      |  round(CAST(1 + t.s_hit AS DOUBLE) /
      |    CAST((1 + t.s_hit) + (1 + t.n - t.s_hit) AS DOUBLE), 9)
      |    AS post_mean_arm,
      |  round(t.ci_lo, 9) AS ci_lo_arm, round(t.ci_hi, 9) AS ci_hi_arm,
      |  c.n AS n_ctl, c.s_hit AS s_ctl,
      |  CAST(1 + c.s_hit AS BIGINT) AS a_ctl,
      |  CAST(1 + c.n - c.s_hit AS BIGINT) AS b_ctl,
      |  round(CAST(1 + c.s_hit AS DOUBLE) /
      |    CAST((1 + c.s_hit) + (1 + c.n - c.s_hit) AS DOUBLE), 9)
      |    AS post_mean_ctl,
      |  round(c.ci_lo, 9) AS ci_lo_ctl, round(c.ci_hi, 9) AS ci_hi_ctl,
      |  round(CAST(m.pb2 AS DOUBLE) /
      |    (2.0 * CAST(m.wt AS DOUBLE) * CAST(m.wc AS DOUBLE)), 9)
      |    AS p_beat_ctl,
      |  round(CAST(m.lt2 AS DOUBLE) /
      |    (CAST(m.wt AS DOUBLE) * CAST(m.wc AS DOUBLE) * 8192.0), 9)
      |    AS exp_loss_arm,
      |  round(CAST(m.lc2 AS DOUBLE) /
      |    (CAST(m.wt AS DOUBLE) * CAST(m.wc AS DOUBLE) * 8192.0), 9)
      |    AS exp_loss_ctl
      |FROM st t
      |JOIN st c ON t.peek = c.peek AND c.arm = 'A' AND t.arm <> 'A'
      |JOIN cmp m ON m.arm = t.arm AND m.peek = t.peek
      |ORDER BY t.peek, t.arm""".stripMargin
  }

  /** q361/q362 oracle: [[graft.operators.Survival.coxPh]] replayed —
    * the q285 subject CTE extended with the bucketed click covariate,
    * covariate-keyed lifetime cells, the completed (z × t) risk grid
    * with suffix n_risk and the shift z' = z − min z, then ALL NINE
    * passes (8 Newton updates + the final evaluation) generated
    * mechanically: per pass the 1e9-landed e^{βz'} kernel, exact
    * HUGEINT S₀/S₁/S₂ sums, nano-landed per-event-time U/I terms
    * (HAVING d > 0), the β update with the bad/I-positivity guards —
    * every float op in the Spark dag's order.
    */
  /** q373 oracle: [[graft.quality.Association.cliffsDeltaFromCells]]
    * replayed — value cells, the exact HUGEINT dominance and tie sums
    * off one cumulative window, the 1e9-landed (d_v − δ)² deviation
    * terms (the Brown–Forsythe split), Cliff's consistent variance and
    * the asymmetric CI transformation in the operator's float order.
    */
  private lazy val cliffsDeltaOracle: String =
    """WITH ev AS (SELECT CAST(event_type AS VARCHAR) AS grp,
      |    CAST(floor(value) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL
      |    AND event_type IN ('click', 'view')),
      |cells AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c
      |  FROM ev GROUP BY 1, 2),
      |lab AS (SELECT min(grp) AS grp_lo, max(grp) AS grp_hi,
      |    CAST(count(DISTINCT grp) AS BIGINT) AS ngrps FROM cells),
      |vals AS (SELECT l.grp_lo, l.grp_hi, l.ngrps, v,
      |    CAST(sum(CASE WHEN grp = l.grp_lo THEN c ELSE 0 END) AS BIGINT)
      |      AS tlo,
      |    CAST(sum(CASE WHEN grp <> l.grp_lo THEN c ELSE 0 END) AS BIGINT)
      |      AS thi
      |  FROM cells CROSS JOIN lab l GROUP BY 1, 2, 3, 4),
      |cum AS (SELECT *,
      |    CAST(coalesce(sum(thi) OVER wlt, 0) AS BIGINT) AS hilt,
      |    CAST(coalesce(sum(tlo) OVER wlt, 0) AS BIGINT) AS lolt,
      |    CAST(sum(tlo) OVER () AS BIGINT) AS n1,
      |    CAST(sum(thi) OVER () AS BIGINT) AS n2
      |  FROM vals
      |  WINDOW wlt AS (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |cum2 AS (SELECT *, n2 - hilt - thi AS higt, n1 - lolt - tlo AS logt
      |  FROM cum),
      |ds AS (SELECT *,
      |    sum(CAST(tlo AS HUGEINT) * (hilt - higt)) OVER () AS D
      |  FROM cum2),
      |tm AS (SELECT *,
      |    CASE WHEN n1 > 0 AND n2 > 0 THEN
      |      CAST(CAST(hilt - higt AS HUGEINT) * n1 - D AS DOUBLE) /
      |      CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE) END AS qlo,
      |    CASE WHEN n1 > 0 AND n2 > 0 THEN
      |      CAST(CAST(logt - lolt AS HUGEINT) * n2 - D AS DOUBLE) /
      |      CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE) END AS qhi
      |  FROM ds),
      |agg AS (SELECT max(grp_lo) AS grp_lo, max(grp_hi) AS grp_hi,
      |    max(ngrps) AS ngrps, max(n1) AS n1, max(n2) AS n2, max(D) AS D,
      |    sum(CAST(tlo AS HUGEINT) * thi) AS T,
      |    sum(CAST(round(CAST(tlo AS DOUBLE) * (qlo * qlo) * 1e9)
      |      AS HUGEINT)) AS s1_9,
      |    sum(CAST(round(CAST(thi AS DOUBLE) * (qhi * qhi) * 1e9)
      |      AS HUGEINT)) AS s2_9
      |  FROM tm),
      |fx AS (SELECT *,
      |    CASE WHEN n1 > 0 AND n2 > 0 THEN
      |      CAST(D AS DOUBLE) / CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE)
      |      END AS delta0,
      |    CAST(s1_9 AS DOUBLE) / 1e9 AS s1,
      |    CAST(s2_9 AS DOUBLE) / 1e9 AS s2,
      |    CAST(CAST(n1 AS HUGEINT) * n2 AS DOUBLE) AS kf,
      |    ngrps = 2 AND n1 >= 2 AND n2 >= 2 AS ok
      |  FROM agg),
      |fy AS (SELECT *,
      |    CASE WHEN ok THEN delta0 END AS delta,
      |    CASE WHEN ok THEN greatest(
      |      (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE) * s1 +
      |       CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE) * s2 -
      |       (kf - CAST(T AS DOUBLE) - kf * (delta0 * delta0))) /
      |      (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) *
      |       (CAST(n1 AS DOUBLE) - 1.0) * (CAST(n2 AS DOUBLE) - 1.0)),
      |      0.0) END AS var
      |  FROM fx),
      |fz AS (SELECT *, sqrt(var) AS sd,
      |    (1.0 - delta * delta) + (1.959964 * 1.959964) * var AS den,
      |    sqrt(greatest(1.0 - 2.0 * (delta * delta) +
      |      (delta * delta) * (delta * delta) +
      |      (1.959964 * 1.959964) * var, 0.0)) AS rad
      |  FROM fy)
      |SELECT grp_lo, grp_hi, ngrps AS n_groups,
      |  CASE WHEN ngrps = 2 THEN n1 END AS n_lo,
      |  CASE WHEN ngrps = 2 THEN n2 END AS n_hi,
      |  CASE WHEN ngrps = 2 THEN CAST(D AS VARCHAR) END AS num_d,
      |  CASE WHEN ngrps = 2 THEN CAST(T AS VARCHAR) END AS n_tied_pairs,
      |  round(delta, 9) AS cliffs_delta,
      |  CASE WHEN ok THEN round((delta + 1.0) / 2.0, 9) END AS cles,
      |  round(var, 9) AS var_delta,
      |  CASE WHEN ok THEN round(CASE WHEN den > 0 THEN
      |    (delta - delta * delta * delta - 1.959964 * sd * rad) / den
      |    ELSE delta END, 9) END AS ci_lo,
      |  CASE WHEN ok THEN round(CASE WHEN den > 0 THEN
      |    (delta - delta * delta * delta + 1.959964 * sd * rad) / den
      |    ELSE delta END, 9) END AS ci_hi
      |FROM fz""".stripMargin

  /** q371/q372 oracle: [[graft.operators.Survival.coxPh2FromCells]]
    * replayed — the q361 chain widened to two covariates: the
    * ((z, z2) PAIR × t) completed grid, per pass the six exact-HUGEINT
    * risk sums, the six nano-landed U/I terms, the EXACT 2×2
    * determinant/step numerators and one division each (the Cramer
    * algebra, mechanically generated for all nine passes), and the 2-df
    * score χ² in the operator's float order.
    */
  private lazy val coxPh2Oracle: String = {
    val header =
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |pu AS (SELECT user_id, min(h) AS f,
        |    min(CASE WHEN event_type = 'purchase' THEN h END) AS p,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v
        |  FROM e GROUP BY 1),
        |subj AS (SELECT user_id,
        |    CASE WHEN p IS NOT NULL AND p - f + 1 <= 96 THEN p - f + 1
        |      ELSE 96 END AS t,
        |    CASE WHEN p IS NOT NULL AND p - f + 1 <= 96 THEN 1 ELSE 0 END AS ev,
        |    least(CAST(floor(k / 5.0) AS BIGINT), 6) AS za,
        |    least(CAST(floor(v / 10.0) AS BIGINT), 3) AS zb
        |  FROM pu),
        |cells AS (SELECT za, zb, t, CAST(sum(ev) AS BIGINT) AS d,
        |    CAST(sum(1 - ev) AS BIGINT) AS c
        |  FROM subj GROUP BY 1, 2, 3),
        |zs AS (SELECT DISTINCT za, zb FROM cells),
        |tsd AS (SELECT DISTINCT t FROM cells),
        |fullg AS (SELECT g.za, g.zb, g.t, coalesce(cc.d, 0) AS d,
        |    coalesce(cc.c, 0) AS c
        |  FROM (SELECT za, zb, t FROM zs CROSS JOIN tsd) g
        |  LEFT JOIN cells cc USING (za, zb, t)),
        |risk AS (SELECT *,
        |    CAST(sum(d + c) OVER (PARTITION BY za, zb ORDER BY t
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS r,
        |    za - min(za) OVER () AS zap, zb - min(zb) OVER () AS zbp,
        |    min(za) OVER () AS zamin, min(zb) OVER () AS zbmin
        |  FROM fullg),
        |tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n,
        |    CAST(sum(d) AS BIGINT) AS n_events,
        |    min(za) AS cov1_min, min(zb) AS cov2_min FROM cells)""".stripMargin
    // one pass at the (ba, bb) carried by CTE `src`: kernel -> per-t
    // terms -> the U/I fold -> exact det/step numerators
    def pass(k: Int, src: String): String = {
      val bz = "(ba * CAST(zap AS DOUBLE) + bb * CAST(zbp AS DOUBLE))"
      val r1a = "(CAST(s1a AS DOUBLE) / CAST(s0 AS DOUBLE))"
      val r1b = "(CAST(s1b AS DOUBLE) / CAST(s0 AS DOUBLE))"
      val r2aa = "(CAST(s2aa AS DOUBLE) / CAST(s0 AS DOUBLE))"
      val r2ab = "(CAST(s2ab AS DOUBLE) / CAST(s0 AS DOUBLE))"
      val r2bb = "(CAST(s2bb AS DOUBLE) / CAST(s0 AS DOUBLE))"
      s"""jt$k AS (SELECT r.*, b.ba, b.bb,
        |    CASE WHEN $bz <= 30.0
        |      THEN CAST(round(exp($bz) * 1e9) AS HUGEINT) END AS ez9,
        |    CASE WHEN $bz > 30.0 THEN 1 ELSE 0 END AS ov
        |  FROM risk r CROSS JOIN $src b),
        |pt$k AS (SELECT t, max(ba) AS ba, max(bb) AS bb,
        |    CAST(sum(d) AS BIGINT) AS dt,
        |    sum(CAST(zap AS HUGEINT) * d) AS s1at,
        |    sum(CAST(zbp AS HUGEINT) * d) AS s1bt,
        |    sum(CAST(r AS HUGEINT) * ez9) AS s0,
        |    sum((CAST(r AS HUGEINT) * zap) * ez9) AS s1a,
        |    sum((CAST(r AS HUGEINT) * zbp) * ez9) AS s1b,
        |    sum(((CAST(r AS HUGEINT) * zap) * zap) * ez9) AS s2aa,
        |    sum(((CAST(r AS HUGEINT) * zap) * zbp) * ez9) AS s2ab,
        |    sum(((CAST(r AS HUGEINT) * zbp) * zbp) * ez9) AS s2bb,
        |    CAST(sum(ov) AS BIGINT) AS bad
        |  FROM jt$k GROUP BY 1 HAVING CAST(sum(d) AS BIGINT) > 0),
        |ag$k AS (SELECT max(ba) AS ba, max(bb) AS bb,
        |    sum(CAST(round((CAST(s1at AS DOUBLE) -
        |      CAST(dt AS DOUBLE) * $r1a) * 1e9) AS HUGEINT)) AS ua9,
        |    sum(CAST(round((CAST(s1bt AS DOUBLE) -
        |      CAST(dt AS DOUBLE) * $r1b) * 1e9) AS HUGEINT)) AS ub9,
        |    sum(CAST(round((CAST(dt AS DOUBLE) *
        |      ($r2aa - $r1a * $r1a)) * 1e9) AS HUGEINT)) AS iaa9,
        |    sum(CAST(round((CAST(dt AS DOUBLE) *
        |      ($r2ab - $r1a * $r1b)) * 1e9) AS HUGEINT)) AS iab9,
        |    sum(CAST(round((CAST(dt AS DOUBLE) *
        |      ($r2bb - $r1b * $r1b)) * 1e9) AS HUGEINT)) AS ibb9,
        |    CAST(sum(bad) AS BIGINT) AS bad
        |  FROM pt$k),
        |dt$k AS (SELECT *,
        |    iaa9 * ibb9 - iab9 * iab9 AS det9,
        |    ibb9 * ua9 - iab9 * ub9 AS na,
        |    iaa9 * ub9 - iab9 * ua9 AS nb
        |  FROM ag$k)""".stripMargin
    }
    def step(k: Int): String =
      s"""st$k AS (SELECT
        |    CASE WHEN bad = 0 AND det9 > 0 AND iaa9 > 0
        |      THEN ba + CAST(na AS DOUBLE) / CAST(det9 AS DOUBLE) END AS ba,
        |    CASE WHEN bad = 0 AND det9 > 0 AND iaa9 > 0
        |      THEN bb + CAST(nb AS DOUBLE) / CAST(det9 AS DOUBLE) END AS bb,
        |    CASE WHEN bad = 0 AND det9 > 0 AND iaa9 > 0
        |      THEN CAST(na AS DOUBLE) / CAST(det9 AS DOUBLE) END AS stepa,
        |    CASE WHEN bad = 0 AND det9 > 0 AND iaa9 > 0
        |      THEN CAST(nb AS DOUBLE) / CAST(det9 AS DOUBLE) END AS stepb
        |  FROM dt$k)""".stripMargin
    val iters = 8
    val blocks = new StringBuilder
    blocks.append(",\nb0 AS (SELECT 0.0 AS ba, 0.0 AS bb),\n")
    blocks.append(pass(1, "b0")).append(",\n").append(step(1))
    for (k <- 2 to iters)
      blocks.append(",\n").append(pass(k, s"st${k - 1}"))
        .append(",\n").append(step(k))
    blocks.append(",\n").append(pass(iters + 1, s"st$iters"))
    header + blocks.toString +
      s""",
      |fin AS (SELECT d.ba AS baf, d.bb AS bbf,
      |    d.iaa9 AS fiaa9, d.ibb9 AS fibb9, d.det9 AS fdet9,
      |    d.bad AS badf, s.stepa AS lstepa, s.stepb AS lstepb
      |  FROM dt${iters + 1} d CROSS JOIN st$iters s),
      |fin2 AS (SELECT *,
      |    badf = 0 AND fdet9 > 0 AND fiaa9 > 0 AND baf IS NOT NULL AS okf,
      |    CAST(round(lstepa * 1e9) AS BIGINT) AS lsa9,
      |    CAST(round(lstepb * 1e9) AS BIGINT) AS lsb9 FROM fin)
      |SELECT tot.n, tot.n_events, tot.cov1_min, tot.cov2_min,
      |  CAST(dt1.ua9 AS VARCHAR) AS u0a_9, CAST(dt1.ub9 AS VARCHAR) AS u0b_9,
      |  CAST(dt1.det9 AS VARCHAR) AS det0_9,
      |  CASE WHEN dt1.det9 > 0 AND dt1.iaa9 > 0 THEN
      |    round((CAST(dt1.ua9 AS DOUBLE) * CAST(dt1.na AS DOUBLE) +
      |      CAST(dt1.ub9 AS DOUBLE) * CAST(dt1.nb AS DOUBLE)) /
      |      CAST(dt1.det9 AS DOUBLE) / 1e9, 9) END AS score_chi2,
      |  CASE WHEN okf THEN round(baf, 9) END AS beta1,
      |  CASE WHEN okf THEN round(sqrt(CAST(fibb9 AS DOUBLE) * 1e9 /
      |    CAST(fdet9 AS DOUBLE)), 9) END AS se_beta1,
      |  CASE WHEN okf THEN round(exp(baf), 9) END AS hr1,
      |  CASE WHEN okf THEN round(bbf, 9) END AS beta2,
      |  CASE WHEN okf THEN round(sqrt(CAST(fiaa9 AS DOUBLE) * 1e9 /
      |    CAST(fdet9 AS DOUBLE)), 9) END AS se_beta2,
      |  CASE WHEN okf THEN round(exp(bbf), 9) END AS hr2,
      |  CASE WHEN okf THEN lsa9 END AS last_step_a9,
      |  CASE WHEN okf THEN lsb9 END AS last_step_b9,
      |  CASE WHEN okf THEN lsa9 = 0 AND lsb9 = 0 ELSE false END AS converged,
      |  CAST($iters AS INT) AS n_iter
      |FROM tot CROSS JOIN dt1 CROSS JOIN fin2""".stripMargin
  }

  private lazy val coxPhOracle: String = {
    val header =
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h
        |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |pu AS (SELECT user_id, min(h) AS f,
        |    min(CASE WHEN event_type = 'purchase' THEN h END) AS p,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k
        |  FROM e GROUP BY 1),
        |subj AS (SELECT user_id,
        |    CASE WHEN p IS NOT NULL AND p - f + 1 <= 96 THEN p - f + 1
        |      ELSE 96 END AS t,
        |    CASE WHEN p IS NOT NULL AND p - f + 1 <= 96 THEN 1 ELSE 0 END AS ev,
        |    least(CAST(floor(k / 5.0) AS BIGINT), 6) AS z
        |  FROM pu),
        |cells AS (SELECT z, t, CAST(sum(ev) AS BIGINT) AS d,
        |    CAST(sum(1 - ev) AS BIGINT) AS c
        |  FROM subj GROUP BY 1, 2),
        |zs AS (SELECT DISTINCT z FROM cells),
        |tsd AS (SELECT DISTINCT t FROM cells),
        |fullg AS (SELECT g.z, g.t, coalesce(cc.d, 0) AS d,
        |    coalesce(cc.c, 0) AS c
        |  FROM (SELECT z, t FROM zs CROSS JOIN tsd) g
        |  LEFT JOIN cells cc USING (z, t)),
        |risk AS (SELECT *,
        |    CAST(sum(d + c) OVER (PARTITION BY z ORDER BY t
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS r,
        |    min(z) OVER () AS zmin, z - min(z) OVER () AS zp
        |  FROM fullg),
        |tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n,
        |    CAST(sum(d) AS BIGINT) AS n_events,
        |    min(z) AS cov_min FROM cells)""".stripMargin
    // one pass at the beta carried by CTE `src` (columns: beta):
    // kernel -> per-event-time terms -> the U/I fold
    def pass(k: Int, src: String): String = {
      val bz = "(beta * CAST(zp AS DOUBLE))"
      s"""jt$k AS (SELECT r.*, b.beta,
        |    CASE WHEN $bz <= 30.0
        |      THEN CAST(round(exp($bz) * 1e9) AS HUGEINT) END AS ez9,
        |    CASE WHEN $bz > 30.0 THEN 1 ELSE 0 END AS ov
        |  FROM risk r CROSS JOIN $src b),
        |pt$k AS (SELECT t, max(beta) AS beta,
        |    CAST(sum(d) AS BIGINT) AS dt,
        |    sum(CAST(z AS HUGEINT) * d) AS s1t,
        |    sum(CAST(zmin AS HUGEINT) * d) AS sm1t,
        |    sum(CAST(r AS HUGEINT) * ez9) AS s0,
        |    sum((CAST(r AS HUGEINT) * zp) * ez9) AS s1,
        |    sum(((CAST(r AS HUGEINT) * zp) * zp) * ez9) AS s2,
        |    CAST(sum(ov) AS BIGINT) AS bad
        |  FROM jt$k GROUP BY 1 HAVING CAST(sum(d) AS BIGINT) > 0),
        |ag$k AS (SELECT max(beta) AS beta,
        |    sum(CAST(round((CAST(s1t - sm1t AS DOUBLE) -
        |      CAST(dt AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE)))
        |      * 1e9) AS HUGEINT)) AS u9,
        |    sum(CAST(round((CAST(dt AS DOUBLE) *
        |      (CAST(s2 AS DOUBLE) / CAST(s0 AS DOUBLE) -
        |       (CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE)) *
        |       (CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE)))) * 1e9) AS HUGEINT))
        |      AS i9,
        |    CAST(sum(bad) AS BIGINT) AS bad
        |  FROM pt$k)""".stripMargin
    }
    def step(k: Int): String =
      s"""st$k AS (SELECT
        |    CASE WHEN bad = 0 AND i9 > 0
        |      THEN beta + CAST(u9 AS DOUBLE) / CAST(i9 AS DOUBLE) END AS beta,
        |    CASE WHEN bad = 0 AND i9 > 0
        |      THEN CAST(u9 AS DOUBLE) / CAST(i9 AS DOUBLE) END AS step
        |  FROM ag$k)""".stripMargin
    val iters = 8
    val blocks = new StringBuilder
    blocks.append(",\nb0 AS (SELECT 0.0 AS beta),\n")
    blocks.append(pass(1, "b0")).append(",\n").append(step(1))
    for (k <- 2 to iters)
      blocks.append(",\n").append(pass(k, s"st${k - 1}"))
        .append(",\n").append(step(k))
    // pass 9 = the evaluation at beta-hat (no update)
    blocks.append(",\n").append(pass(iters + 1, s"st$iters"))
    header + blocks.toString +
      s""",
      |fin AS (SELECT ag${iters + 1}.beta AS betaf, ag${iters + 1}.i9 AS if9,
      |    ag${iters + 1}.bad AS badf, st$iters.step AS lstep
      |  FROM ag${iters + 1} CROSS JOIN st$iters),
      |fin2 AS (SELECT *,
      |    badf = 0 AND if9 > 0 AND betaf IS NOT NULL AS okf,
      |    CAST(round(lstep * 1e9) AS BIGINT) AS ls9 FROM fin)
      |SELECT tot.n, tot.n_events, tot.cov_min,
      |  CAST(ag1.u9 AS VARCHAR) AS u0_9, CAST(ag1.i9 AS VARCHAR) AS i0_9,
      |  CASE WHEN ag1.i9 > 0 THEN round(CAST(ag1.u9 AS DOUBLE) / 1e9 /
      |    sqrt(CAST(ag1.i9 AS DOUBLE) / 1e9), 9) END AS z_score,
      |  CASE WHEN okf THEN round(betaf, 9) END AS beta,
      |  CASE WHEN okf THEN round(1.0 / sqrt(CAST(if9 AS DOUBLE) / 1e9), 9) END
      |    AS se_beta,
      |  CASE WHEN okf THEN round(exp(betaf), 9) END AS hr,
      |  CASE WHEN okf THEN ls9 END AS last_step9,
      |  CASE WHEN okf THEN ls9 = 0 ELSE false END AS converged,
      |  CAST($iters AS INT) AS n_iter
      |FROM tot CROSS JOIN ag1 CROSS JOIN fin2""".stripMargin
  }

  /** q363 oracle: [[graft.quality.Association.hodgesLehmannTwoSample]]
    * replayed — integer value cells per arm, the (lo x hi) cell-pair
    * difference grid with exact HUGEINT weights, ONE cumulative window,
    * the lower-median selection 2*cum >= mn, the large-sample inversion
    * rank k (the one float dag, Spark order), and the two CI order
    * statistics cum >= k+1 / cum >= mn-k.
    */
  private lazy val hlTwoSampleOracle: String =
    """WITH ev AS (SELECT CAST(event_type AS VARCHAR) AS grp,
      |    CAST(floor(value) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
      |cells AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c
      |  FROM ev GROUP BY 1, 2),
      |lab AS (SELECT *, count(DISTINCT grp) OVER () AS ngrps,
      |    min(grp) OVER () AS grp_lo, max(grp) OVER () AS grp_hi FROM cells),
      |meta AS (SELECT grp_lo, grp_hi, CAST(max(ngrps) AS BIGINT) AS ngrps,
      |    CAST(sum(CASE WHEN grp = grp_lo THEN c ELSE 0 END) AS BIGINT) AS m,
      |    CAST(sum(CASE WHEN grp <> grp_lo THEN c ELSE 0 END) AS BIGINT) AS n
      |  FROM lab GROUP BY 1, 2),
      |pairs AS (SELECT a.v - b.v AS d,
      |    sum(CAST(a.c AS HUGEINT) * b.c) AS w
      |  FROM lab a JOIN lab b ON a.grp = a.grp_lo AND b.grp = b.grp_hi
      |    AND b.ngrps = 2
      |  GROUP BY 1),
      |ranked AS (SELECT *, sum(w) OVER (ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM pairs),
      |j AS (SELECT r.*, m.m, m.n, CAST(m.m AS HUGEINT) * m.n AS mn,
      |    greatest(0, CAST(floor(CAST(m.m AS DOUBLE) * CAST(m.n AS DOUBLE)
      |      / 2.0 - 1.959964 * sqrt(CAST(m.m AS DOUBLE) * CAST(m.n AS DOUBLE)
      |      * (CAST(m.m AS DOUBLE) + CAST(m.n AS DOUBLE) + 1.0) / 12.0))
      |      AS BIGINT)) AS k
      |  FROM ranked r CROSS JOIN meta m),
      |sel AS (SELECT max(mn) AS mn, max(k) AS ka,
      |    min(CASE WHEN 2 * cum >= mn THEN d END) AS hl,
      |    min(CASE WHEN cum >= k + 1 THEN d END) AS cilo,
      |    min(CASE WHEN cum >= mn - k THEN d END) AS cihi
      |  FROM j)
      |SELECT m.grp_lo, m.grp_hi, m.ngrps AS n_groups,
      |  CASE WHEN m.ngrps = 2 AND m.m > 0 AND m.n > 0 THEN m.m END AS n_lo,
      |  CASE WHEN m.ngrps = 2 AND m.m > 0 AND m.n > 0 THEN m.n END AS n_hi,
      |  CASE WHEN m.ngrps = 2 AND m.m > 0 AND m.n > 0
      |    THEN CAST(s.mn AS VARCHAR) END AS n_pairs,
      |  CASE WHEN m.ngrps = 2 AND m.m > 0 AND m.n > 0 THEN s.ka END AS k_alpha,
      |  CASE WHEN m.ngrps = 2 AND m.m > 0 AND m.n > 0
      |    THEN round(CAST(s.hl AS DOUBLE), 9) END AS hl,
      |  CASE WHEN m.ngrps = 2 AND m.m > 0 AND m.n > 0
      |    THEN round(CAST(s.cilo AS DOUBLE), 9) END AS ci_lo,
      |  CASE WHEN m.ngrps = 2 AND m.m > 0 AND m.n > 0
      |    THEN round(CAST(s.cihi AS DOUBLE), 9) END AS ci_hi
      |FROM meta m CROSS JOIN sel s""".stripMargin

  /** q352 oracle: [[graft.quality.Association.pairedT]] replayed —
    * per-user exact even−odd differences, HUGEINT Σd/Σd², the
    * t = Σd·√(n−1)/√(nΣd²−(Σd)²) dag in the Spark float order.
    */
  private lazy val pairedTOracle: String =
    """WITH pu AS (SELECT user_id,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) -
      |    CAST(sum(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(d) AS HUGEINT) AS sd,
      |    CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS sdd FROM pu),
      |f AS (SELECT *, CAST(n AS HUGEINT) * sdd - sd * sd AS varnum FROM a)
      |SELECT n,
      |  round(CAST(sd AS DOUBLE) / CAST(n AS DOUBLE), 9) AS mean_diff,
      |  CAST(varnum AS VARCHAR) AS var_num,
      |  CASE WHEN n >= 2 AND varnum > 0 THEN
      |    round(CAST(sd AS DOUBLE) * sqrt(CAST(n AS DOUBLE) - 1.0) /
      |      sqrt(CAST(varnum AS DOUBLE)), 9) END AS t,
      |  CASE WHEN n >= 2 AND varnum > 0 THEN
      |    round(CAST(n AS DOUBLE) - 1.0, 9) END AS df
      |FROM f""".stripMargin

  /** q353 oracle: [[graft.quality.Association.wilcoxonSignedRank]]
    * replayed — the q352 difference CTE, zero drops counted, doubled
    * average ranks over distinct |d| (cum window), exact HUGEINT
    * 2W⁺ / tie / variance pieces, the quadrupled z form.
    */
  private lazy val wilcoxonSignedRankOracle: String =
    """WITH pu AS (SELECT user_id,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) -
      |    CAST(sum(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |z0 AS (SELECT coalesce(CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT), 0) AS n_zero FROM pu),
      |nz AS (SELECT d, abs(d) AS ad FROM pu WHERE d <> 0),
      |vals AS (SELECT ad, CAST(count(*) AS BIGINT) AS t,
      |    CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS tpos
      |  FROM nz GROUP BY 1),
      |rk AS (SELECT *, coalesce(sum(t) OVER (ORDER BY ad
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM vals),
      |r2 AS (SELECT *, 2 * cum + t + 1 AS rr FROM rk),
      |-- the operator coalesces the degenerate (all-zero diffs) to
      |-- n = 0 / w2 = 0 / ties = 0; mirror it so the gate survives
      |-- fixture drift into the degenerate rather than NULL-diverging
      |tot AS (SELECT coalesce(CAST(sum(t) AS BIGINT), 0) AS n,
      |    coalesce(sum(CAST(tpos AS HUGEINT) * rr), 0) AS w2,
      |    coalesce(sum(CAST(t AS HUGEINT) * t * t - t), 0) AS ties
      |  FROM r2),
      |f AS (SELECT *,
      |    2 * CAST(n AS HUGEINT) * (n + 1) * (2 * n + 1) - ties AS varnum,
      |    2 * w2 - CAST(n AS HUGEINT) * (n + 1) AS znum FROM tot)
      |SELECT n, (SELECT n_zero FROM z0) AS n_zero,
      |  CAST(w2 AS VARCHAR) AS w2_plus, CAST(varnum AS VARCHAR) AS var_num,
      |  CASE WHEN n > 0 AND varnum > 0 THEN
      |    round(CAST(znum AS DOUBLE) / sqrt(CAST(varnum AS DOUBLE) / 3.0), 9)
      |  END AS z
      |FROM f""".stripMargin

  /** q279 oracle: [[graft.quality.Association.welchT]] replayed — the
    * q271 moments/pivot CTEs, v_i/n_i fixed dags, t and the
    * Welch–Satterthwaite df.
    */
  private lazy val welchTOracle: String =
    """WITH ev AS (SELECT CAST(event_type AS VARCHAR) AS grp,
      |    CAST(round(value * 1000) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL AND event_type IN ('click', 'view')),
      |ga AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(v AS HUGEINT)) AS s, sum(CAST(v AS HUGEINT) * v) AS q
      |  FROM ev GROUP BY 1),
      |lab AS (SELECT *, count(*) OVER () AS ngrps,
      |    min(grp) OVER () AS grp_lo, max(grp) OVER () AS grp_hi FROM ga),
      |wide AS (SELECT grp_lo, grp_hi, ngrps,
      |    max(CASE WHEN grp = grp_lo THEN n END) AS n1,
      |    max(CASE WHEN grp = grp_hi THEN n END) AS n2,
      |    max(CASE WHEN grp = grp_lo THEN s END) AS s1,
      |    max(CASE WHEN grp = grp_hi THEN s END) AS s2,
      |    max(CASE WHEN grp = grp_lo THEN q END) AS q1,
      |    max(CASE WHEN grp = grp_hi THEN q END) AS q2
      |  FROM lab GROUP BY 1, 2, 3),
      |f AS (SELECT *,
      |    CAST(n1 AS HUGEINT) * q1 - s1 * s1 AS v1,
      |    CAST(n2 AS HUGEINT) * q2 - s2 * s2 AS v2,
      |    s1 * CAST(n2 AS HUGEINT) - s2 * CAST(n1 AS HUGEINT) AS dnum
      |  FROM wide),
      |e AS (SELECT *,
      |    CAST(v1 AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE) *
      |      (CAST(n1 AS DOUBLE) - 1.0)) AS se1,
      |    CAST(v2 AS DOUBLE) / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE) *
      |      (CAST(n2 AS DOUBLE) - 1.0)) AS se2,
      |    ngrps = 2 AND n1 >= 2 AND n2 >= 2 AND v1 + v2 > 0 AS ok
      |  FROM f)
      |SELECT grp_lo, grp_hi, CAST(ngrps AS BIGINT) AS n_groups,
      |  CASE WHEN ngrps = 2 THEN n1 END AS n_lo,
      |  CASE WHEN ngrps = 2 THEN n2 END AS n_hi,
      |  CASE WHEN ngrps = 2 THEN CAST(dnum AS VARCHAR) END AS diff_num,
      |  CASE WHEN ngrps = 2 THEN CAST(v1 AS VARCHAR) END AS var_num_lo,
      |  CASE WHEN ngrps = 2 THEN CAST(v2 AS VARCHAR) END AS var_num_hi,
      |  CASE WHEN ok THEN
      |    round(CAST(dnum AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) /
      |      sqrt(se1 + se2), 9) END AS t,
      |  CASE WHEN ok THEN
      |    round((se1 + se2) * (se1 + se2) /
      |      (se1 * se1 / (CAST(n1 AS DOUBLE) - 1.0) +
      |       se2 * se2 / (CAST(n2 AS DOUBLE) - 1.0)), 9) END AS df
      |FROM e""".stripMargin

  /** q280 oracle: [[graft.quality.Profiler.cvmFromHistograms]] replayed
    * — the q101 bucket CTEs with the SIGNED cross-multiplied gap and
    * the per-bucket combined mass.
    */
  private lazy val cvmOracle: String =
    """WITH b AS (SELECT CASE WHEN value < 0.0 THEN -1 WHEN value >= 100.0 THEN 10
      |    ELSE CAST(floor((value - 0.0) / 10.0) AS BIGINT) END AS bucket, count(*) AS n
      |  FROM events WHERE user_id % 2 = 0 AND value IS NOT NULL GROUP BY 1),
      |c AS (SELECT CASE WHEN value < 0.0 THEN -1 WHEN value >= 100.0 THEN 10
      |    ELSE CAST(floor((value - 0.0) / 10.0) AS BIGINT) END AS bucket, count(*) AS n
      |  FROM events WHERE user_id % 2 = 1 AND value IS NOT NULL GROUP BY 1),
      |j AS (SELECT coalesce(b.bucket, c.bucket) AS bucket,
      |    CAST(coalesce(b.n, 0) AS BIGINT) AS n_base,
      |    CAST(coalesce(c.n, 0) AS BIGINT) AS n_cur
      |  FROM b FULL OUTER JOIN c ON b.bucket = c.bucket),
      |k AS (SELECT bucket, n_base, n_cur,
      |    CAST(sum(n_base) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_base,
      |    CAST(sum(n_cur) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cur,
      |    CAST(sum(n_base) OVER () AS BIGINT) AS tot_base,
      |    CAST(sum(n_cur) OVER () AS BIGINT) AS tot_cur
      |  FROM j)
      |SELECT bucket, n_base, n_cur, cum_base, cum_cur,
      |    CAST(cum_base * tot_cur - cum_cur * tot_base AS BIGINT) AS gap_num,
      |    n_base + n_cur AS cell_tot
      |FROM k ORDER BY bucket""".stripMargin

  /** q303/q304 oracle: [[graft.quality.Profiler.andersonDarling]]
    * replayed — the q280 histogram CTEs, then each bucket's nano AD
    * term l·gapFrac²·B·C/(B_j(N−B_j)) in the exact float order of the
    * Spark dag (trailing B_j = N block excluded), A² one division.
    * q304's three-batch fold merges to the identical histograms, so the
    * from-store read shares this oracle verbatim.
    */
  private lazy val andersonDarlingOracle: String =
    """WITH b AS (SELECT CASE WHEN value < 0.0 THEN -1 WHEN value >= 100.0 THEN 10
      |    ELSE CAST(floor((value - 0.0) / 10.0) AS BIGINT) END AS bucket, count(*) AS n
      |  FROM events WHERE user_id % 2 = 0 AND value IS NOT NULL GROUP BY 1),
      |c AS (SELECT CASE WHEN value < 0.0 THEN -1 WHEN value >= 100.0 THEN 10
      |    ELSE CAST(floor((value - 0.0) / 10.0) AS BIGINT) END AS bucket, count(*) AS n
      |  FROM events WHERE user_id % 2 = 1 AND value IS NOT NULL GROUP BY 1),
      |j AS (SELECT coalesce(b.bucket, c.bucket) AS bucket,
      |    CAST(coalesce(b.n, 0) AS BIGINT) AS n_base,
      |    CAST(coalesce(c.n, 0) AS BIGINT) AS n_cur
      |  FROM b FULL OUTER JOIN c ON b.bucket = c.bucket),
      |k AS (SELECT bucket, n_base, n_cur,
      |    CAST(sum(n_base) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_base,
      |    CAST(sum(n_cur) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cur,
      |    CAST(sum(n_base) OVER () AS BIGINT) AS tot_base,
      |    CAST(sum(n_cur) OVER () AS BIGINT) AS tot_cur
      |  FROM j),
      |t AS (SELECT *,
      |    CASE WHEN n_base + n_cur = 0 OR cum_base + cum_cur = tot_base + tot_cur
      |      THEN CAST(0 AS BIGINT)
      |      ELSE CAST(round(CAST(n_base + n_cur AS DOUBLE) *
      |        (CAST(cum_base * tot_cur - cum_cur * tot_base AS DOUBLE) /
      |          (CAST(tot_base AS DOUBLE) * CAST(tot_cur AS DOUBLE))) *
      |        (CAST(cum_base * tot_cur - cum_cur * tot_base AS DOUBLE) /
      |          (CAST(tot_base AS DOUBLE) * CAST(tot_cur AS DOUBLE))) *
      |        CAST(tot_base AS DOUBLE) * CAST(tot_cur AS DOUBLE) /
      |        (CAST(cum_base + cum_cur AS DOUBLE) *
      |          ((CAST(tot_base AS DOUBLE) + CAST(tot_cur AS DOUBLE)) -
      |            CAST(cum_base + cum_cur AS DOUBLE))) * 1e9) AS BIGINT)
      |    END AS t9 FROM k)
      |SELECT CAST(max(tot_base) AS BIGINT) AS n_base,
      |  CAST(max(tot_cur) AS BIGINT) AS n_cur,
      |  CAST(sum(CASE WHEN n_base + n_cur > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bins,
      |  round(CAST(sum(t9) AS DOUBLE) / 1e9, 9) AS a2
      |FROM t""".stripMargin

  /** q305 oracle: [[graft.quality.Association.deltaRatio]] replayed —
    * per-user click/event totals, exact per-arm moments, each arm's
    * ratio and delta-method variance in the Spark dag's float order,
    * effect + CI.
    */
  private lazy val deltaRatioOracle: String =
    """WITH pu AS (SELECT
      |    CAST(user_id % 2 = 0 AS VARCHAR) AS arm,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |g AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      |  FROM pu GROUP BY 1),
      |lab AS (SELECT *, min(arm) OVER () AS grp_lo, max(arm) OVER () AS grp_hi
      |  FROM g),
      |wide AS (SELECT grp_lo, grp_hi,
      |    max(CASE WHEN arm = grp_lo THEN n END) AS n1,
      |    max(CASE WHEN arm = grp_lo THEN sx END) AS sx1,
      |    max(CASE WHEN arm = grp_lo THEN sy END) AS sy1,
      |    max(CASE WHEN arm = grp_lo THEN sxx END) AS sxx1,
      |    max(CASE WHEN arm = grp_lo THEN syy END) AS syy1,
      |    max(CASE WHEN arm = grp_lo THEN sxy END) AS sxy1,
      |    max(CASE WHEN arm = grp_hi THEN n END) AS n2,
      |    max(CASE WHEN arm = grp_hi THEN sx END) AS sx2,
      |    max(CASE WHEN arm = grp_hi THEN sy END) AS sy2,
      |    max(CASE WHEN arm = grp_hi THEN sxx END) AS sxx2,
      |    max(CASE WHEN arm = grp_hi THEN syy END) AS syy2,
      |    max(CASE WHEN arm = grp_hi THEN sxy END) AS sxy2
      |  FROM lab GROUP BY 1, 2),
      |c1 AS (SELECT *,
      |    CAST(sx1 AS DOUBLE) / CAST(sy1 AS DOUBLE) AS r1,
      |    CAST(sx2 AS DOUBLE) / CAST(sy2 AS DOUBLE) AS r2
      |  FROM wide),
      |c2 AS (SELECT *,
      |    (CAST(n1 * sxx1 - sx1 * sx1 AS DOUBLE) -
      |      2 * r1 * CAST(n1 * sxy1 - sx1 * sy1 AS DOUBLE) +
      |      r1 * r1 * CAST(n1 * syy1 - sy1 * sy1 AS DOUBLE)) /
      |      (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) /
      |      (CAST(n1 AS DOUBLE) * (CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)) *
      |        (CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE))) AS v1,
      |    (CAST(n2 * sxx2 - sx2 * sx2 AS DOUBLE) -
      |      2 * r2 * CAST(n2 * sxy2 - sx2 * sy2 AS DOUBLE) +
      |      r2 * r2 * CAST(n2 * syy2 - sy2 * sy2 AS DOUBLE)) /
      |      (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)) /
      |      (CAST(n2 AS DOUBLE) * (CAST(sy2 AS DOUBLE) / CAST(n2 AS DOUBLE)) *
      |        (CAST(sy2 AS DOUBLE) / CAST(n2 AS DOUBLE))) AS v2
      |  FROM c1),
      |c3 AS (SELECT *, r1 - r2 AS eff, sqrt(v1 + v2) AS se FROM c2)
      |SELECT grp_lo, grp_hi, CAST(2 AS BIGINT) AS n_groups, n1 AS n_lo, n2 AS n_hi,
      |  round(r1, 9) AS ratio_lo, round(r2, 9) AS ratio_hi,
      |  round(eff, 9) AS effect, round(se, 9) AS se,
      |  round(eff - 1.959964 * se, 9) AS ci_lo,
      |  round(eff + 1.959964 * se, 9) AS ci_hi
      |FROM c3""".stripMargin

  /** q306 oracle: [[graft.quality.Association.srmCheck]] replayed —
    * exact arm counts over the broken decile split, the designed-arm
    * total, per-arm nano χ² terms in the Spark dag's float order, and
    * the off-design traffic count.
    */
  private lazy val srmOracle: String =
    """WITH e AS (SELECT CASE WHEN user_id % 10 < 5 THEN 'A'
      |    WHEN user_id % 10 < 9 THEN 'B' ELSE 'C' END AS arm
      |  FROM events WHERE user_id IS NOT NULL),
      |cnt AS (SELECT
      |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
      |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
      |    CAST(sum(CASE WHEN arm = 'C' THEN 1 ELSE 0 END) AS BIGINT) AS nc
      |  FROM e),
      |t AS (SELECT *, na + nb AS nt,
      |    CAST(round((CAST(na AS DOUBLE) - CAST(na + nb AS DOUBLE) * 0.5) *
      |      (CAST(na AS DOUBLE) - CAST(na + nb AS DOUBLE) * 0.5) /
      |      (CAST(na + nb AS DOUBLE) * 0.5) * 1e9) AS BIGINT) +
      |    CAST(round((CAST(nb AS DOUBLE) - CAST(na + nb AS DOUBLE) * 0.5) *
      |      (CAST(nb AS DOUBLE) - CAST(na + nb AS DOUBLE) * 0.5) /
      |      (CAST(na + nb AS DOUBLE) * 0.5) * 1e9) AS BIGINT) AS chi9
      |  FROM cnt)
      |SELECT CAST(nt AS BIGINT) AS n_total, CAST(2 AS BIGINT) AS n_arms,
      |  nc AS n_unexpected, CAST(1 AS BIGINT) AS df,
      |  round(CAST(chi9 AS DOUBLE) / 1e9, 9) AS chi2
      |FROM t""".stripMargin

  /** q307 oracle: [[graft.quality.Association.cochranQ]] replayed —
    * the three filters stacked long-form, complete-unit row/column
    * totals as exact integers, Q the one rational.
    */
  private lazy val cochranQOracle: String =
    """WITH d AS (SELECT doc_id, n_chars, text, lang FROM documents),
      |obs AS (
      |  SELECT doc_id AS u, 'len180' AS t, CASE WHEN n_chars >= 180 THEN 1 ELSE 0 END AS y
      |    FROM d WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
      |  UNION ALL SELECT doc_id, 'digit', CASE WHEN regexp_matches(text, '[0-9]') THEN 1 ELSE 0 END
      |    FROM d WHERE doc_id IS NOT NULL AND text IS NOT NULL
      |  UNION ALL SELECT doc_id, 'is_en', CASE WHEN lang = 'en' THEN 1 ELSE 0 END
      |    FROM d WHERE doc_id IS NOT NULL AND lang IS NOT NULL),
      |units AS (SELECT u, CAST(count(DISTINCT t) AS BIGINT) AS kd,
      |    CAST(count(*) AS BIGINT) AS cnt, CAST(sum(y) AS BIGINT) AS r
      |  FROM obs GROUP BY 1),
      |meta AS (SELECT
      |    CAST(3 AS BIGINT) AS k,
      |    CAST(sum(CASE WHEN kd = 3 AND cnt = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_units,
      |    CAST(sum(CASE WHEN kd = 3 AND cnt = 3 THEN 0 ELSE 1 END) AS BIGINT) AS n_incomplete,
      |    CAST(sum(CASE WHEN kd = 3 AND cnt = 3 THEN r ELSE 0 END) AS HUGEINT) AS tt,
      |    CAST(sum(CASE WHEN kd = 3 AND cnt = 3 THEN r * r ELSE 0 END) AS HUGEINT) AS rr
      |  FROM units),
      |perT AS (SELECT o.t AS treatment, CAST(sum(o.y) AS BIGINT) AS flagged_n
      |  FROM obs o JOIN units ut ON o.u = ut.u AND ut.kd = 3 AND ut.cnt = 3
      |  GROUP BY 1),
      |cc AS (SELECT sum(CAST(flagged_n AS HUGEINT) * flagged_n) AS c2 FROM perT)
      |SELECT p.treatment, p.flagged_n, m.n_units, m.k, m.n_incomplete,
      |  round(CAST((m.k - 1) * (m.k * cc.c2 - m.tt * m.tt) AS DOUBLE) /
      |    CAST(m.k * m.tt - m.rr AS DOUBLE), 9) AS q,
      |  CAST(m.k - 1 AS BIGINT) AS df
      |FROM perT p, meta m, cc
      |ORDER BY p.treatment""".stripMargin

  /** q308 oracle: [[graft.quality.Association.jonckheereTerpstra]]
    * replayed — (priority, price-bucket) cells, 2J over ordered cell
    * pairs as an exact integer, the three tie-corrected variance pieces
    * in the Spark dag's float order, z one division.
    */
  private lazy val jonckheereOracle: String =
    """WITH o AS (SELECT o_orderpriority AS grp,
      |    CAST(floor(o_totalprice / 10000.0) AS BIGINT) AS v
      |  FROM orders WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
      |cells AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c FROM o GROUP BY 1, 2),
      |j AS (SELECT coalesce(sum(CAST(a.c AS HUGEINT) * b.c *
      |    (CASE WHEN a.v < b.v THEN 2 ELSE 1 END)), 0) AS j2
      |  FROM cells a JOIN cells b ON a.grp < b.grp AND a.v <= b.v),
      |gs AS (SELECT grp, CAST(sum(c) AS HUGEINT) AS n FROM cells GROUP BY 1),
      |ga AS (SELECT CAST(count(*) AS BIGINT) AS k, sum(n) AS nt,
      |    sum(n * n) AS sn2,
      |    sum(n * (n - 1) * (n * 2 + 5)) AS sn125,
      |    sum(n * (n - 1) * (n - 2)) AS sn12,
      |    sum(n * (n - 1)) AS sn1
      |  FROM gs),
      |ts AS (SELECT v, CAST(sum(c) AS HUGEINT) AS t FROM cells GROUP BY 1),
      |ta AS (SELECT
      |    sum(t * (t - 1) * (t * 2 + 5)) AS st125,
      |    sum(t * (t - 1) * (t - 2)) AS st12,
      |    sum(t * (t - 1)) AS st1
      |  FROM ts),
      |vv AS (SELECT ga.*, ta.*, j.j2,
      |    ga.nt * ga.nt - ga.sn2 AS ej4,
      |    CAST(ga.nt * (ga.nt - 1) * (ga.nt * 2 + 5) - ga.sn125 - ta.st125 AS DOUBLE)
      |      / 72.0 +
      |    CAST(ga.sn12 AS DOUBLE) * CAST(ta.st12 AS DOUBLE) /
      |      (36.0 * CAST(ga.nt AS DOUBLE) * (CAST(ga.nt AS DOUBLE) - 1.0) *
      |        (CAST(ga.nt AS DOUBLE) - 2.0)) +
      |    CAST(ga.sn1 AS DOUBLE) * CAST(ta.st1 AS DOUBLE) /
      |      (8.0 * CAST(ga.nt AS DOUBLE) * (CAST(ga.nt AS DOUBLE) - 1.0)) AS varj
      |  FROM ga, ta, j)
      |SELECT k AS n_groups, CAST(nt AS BIGINT) AS n_total,
      |  CAST(j2 AS VARCHAR) AS j2, CAST(ej4 AS VARCHAR) AS ej4,
      |  round(CAST(2 * j2 - ej4 AS DOUBLE) / (4.0 * sqrt(varj)), 9) AS z
      |FROM vv""".stripMargin

  /** Shared CTEs for q309/q310/q311: the calibration cell state
    * replayed — value/100 probability score, the deterministic label,
    * the 10-bucket histogram-convention binning, exact n/n_pos and the
    * nano score sums.
    */
  private lazy val CalibCellCtes: String =
    """WITH e AS (SELECT value / 100.0 AS sc,
      |    CASE WHEN (user_id + CAST(floor(value) AS BIGINT)) % 5 < 2
      |      THEN 1 ELSE 0 END AS y
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
      |bk AS (SELECT CASE WHEN sc < 0.0 THEN -1 WHEN sc >= 1.0 THEN 10
      |    ELSE CAST(floor((sc - 0.0) / 0.1) AS BIGINT) END AS bucket, sc, y
      |  FROM e),
      |cells AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(y) AS BIGINT) AS np,
      |    CAST(sum(CAST(round(sc * 1e9) AS BIGINT)) AS HUGEINT) AS s9
      |  FROM bk GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(np) AS BIGINT) AS pt,
      |    CAST(count(*) AS BIGINT) AS nb FROM cells),
      |g AS (SELECT c.*, t.nt, t.pt, t.nb,
      |    CAST(c.np AS HUGEINT) * 1000000000 - c.s9 AS gap9
      |  FROM cells c, tot t)""".stripMargin

  /** q376 oracle: [[graft.operators.RankEval.isotonicCalibration]]
    * replayed — the shared calibration cell CTEs, the occupied-bucket
    * cumulative frame, the (j ≤ i ≤ k) triple minimax (every candidate
    * average the same double division of the same exact integers), and
    * the 1e9-landed pooled flag.
    */
  private lazy val isotonicOracle: String =
    CalibCellCtes + """,
      |occ AS (SELECT bucket, n, np, s9 FROM cells WHERE n > 0),
      |cm AS (SELECT *,
      |    CAST(sum(n) OVER w AS BIGINT) AS cn,
      |    CAST(sum(np) OVER w AS BIGINT) AS cp
      |  FROM occ
      |  WINDOW w AS (ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |tri AS (SELECT i.bucket AS bi, i.n, i.np, i.s9, j.bucket AS bj,
      |    CAST(k.cp - (j.cp - j.np) AS DOUBLE) /
      |      CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS avgjk
      |  FROM cm i
      |  JOIN cm j ON j.bucket <= i.bucket
      |  JOIN cm k ON k.bucket >= i.bucket),
      |mj AS (SELECT bi, n, np, s9, bj, min(avgjk) AS m
      |  FROM tri GROUP BY 1, 2, 3, 4, 5),
      |fit AS (SELECT bi, n, np, s9, max(m) AS rate_iso
      |  FROM mj GROUP BY 1, 2, 3, 4)
      |SELECT bi AS bucket, n, np AS n_pos,
      |  round(CAST(s9 AS DOUBLE) / 1e9 / CAST(n AS DOUBLE), 9) AS conf,
      |  round(CAST(np AS DOUBLE) / CAST(n AS DOUBLE), 9) AS rate_raw,
      |  round(rate_iso, 9) AS rate_iso,
      |  CAST(round(rate_iso * 1e9) AS BIGINT) <>
      |    CAST(round(CAST(np AS DOUBLE) / CAST(n AS DOUBLE) * 1e9) AS BIGINT)
      |    AS pooled
      |FROM fit ORDER BY bucket""".stripMargin

  /** q309/q311 oracle: [[graft.operators.RankEval.expectedCalibrationError]]
    * replayed — exact |gap9| sums for ECE, per-bucket nano REL/RES terms
    * in the Spark dag's float order, the Murphy decomposition. q311's
    * three-batch fold merges to the identical cells, sharing this
    * verbatim.
    */
  private lazy val eceOracle: String =
    CalibCellCtes + """,
      |terms AS (SELECT *,
      |    abs(gap9) AS ag,
      |    CAST(round((CAST(gap9 AS DOUBLE) / 1e9) * (CAST(gap9 AS DOUBLE) / 1e9) /
      |      CAST(n AS DOUBLE) * 1e9) AS BIGINT) AS rel9,
      |    CAST(round(CAST(n AS DOUBLE) *
      |      (CAST(CAST(np AS HUGEINT) * nt - CAST(n AS HUGEINT) * pt AS DOUBLE) /
      |        (CAST(n AS DOUBLE) * CAST(nt AS DOUBLE))) *
      |      (CAST(CAST(np AS HUGEINT) * nt - CAST(n AS HUGEINT) * pt AS DOUBLE) /
      |        (CAST(n AS DOUBLE) * CAST(nt AS DOUBLE))) * 1e9) AS BIGINT) AS res9,
      |    abs(CAST(gap9 AS DOUBLE)) / (CAST(n AS DOUBLE) * 1e9) AS mceb
      |  FROM g),
      |s AS (SELECT max(nt) AS n_total, max(pt) AS n_pos, max(nb) AS n_bins,
      |    sum(ag) AS ecenum, max(mceb) AS mce,
      |    sum(CAST(rel9 AS HUGEINT)) AS rel, sum(CAST(res9 AS HUGEINT)) AS res
      |  FROM terms),
      |f AS (SELECT *,
      |    CAST(rel AS DOUBLE) / 1e9 / CAST(n_total AS DOUBLE) AS brier_rel,
      |    CAST(res AS DOUBLE) / 1e9 / CAST(n_total AS DOUBLE) AS brier_res,
      |    CAST(n_pos AS DOUBLE) * CAST(n_total - n_pos AS DOUBLE) /
      |      (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)) AS brier_unc
      |  FROM s)
      |SELECT n_total, n_pos, n_bins,
      |  round(CAST(ecenum AS DOUBLE) / (CAST(n_total AS DOUBLE) * 1e9), 9) AS ece,
      |  round(mce, 9) AS mce,
      |  round(brier_rel, 9) AS brier_rel, round(brier_res, 9) AS brier_res,
      |  round(brier_unc, 9) AS brier_unc,
      |  round(brier_rel - brier_res + brier_unc, 9) AS brier_binned
      |FROM f""".stripMargin

  /** q310 oracle: [[graft.operators.RankEval.hosmerLemeshow]] replayed —
    * per-bucket (O−E)²·n/(E(n−E)) nano terms over the same cells,
    * degenerate buckets skipped and counted.
    */
  private lazy val hosmerLemeshowOracle: String =
    CalibCellCtes + """,
      |terms AS (SELECT *,
      |    CASE WHEN s9 > 0 AND s9 < CAST(n AS HUGEINT) * 1000000000
      |      THEN 1 ELSE 0 END AS usable,
      |    CASE WHEN s9 > 0 AND s9 < CAST(n AS HUGEINT) * 1000000000
      |      THEN CAST(round((CAST(gap9 AS DOUBLE) / 1e9) *
      |        (CAST(gap9 AS DOUBLE) / 1e9) * CAST(n AS DOUBLE) /
      |        ((CAST(s9 AS DOUBLE) / 1e9) *
      |          (CAST(n AS DOUBLE) - CAST(s9 AS DOUBLE) / 1e9)) * 1e9) AS BIGINT)
      |      ELSE CAST(0 AS BIGINT) END AS t9
      |  FROM g),
      |s AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
      |    CAST(sum(usable) AS BIGINT) AS n_bins_used,
      |    CAST(sum(1 - usable) AS BIGINT) AS n_degenerate,
      |    sum(CAST(t9 AS HUGEINT)) AS chi9
      |  FROM terms)
      |SELECT n_total, n_bins_used, n_degenerate,
      |  CASE WHEN n_bins_used >= 3 THEN n_bins_used - 2 END AS df,
      |  CASE WHEN n_bins_used >= 3
      |    THEN round(CAST(chi9 AS DOUBLE) / 1e9, 9) END AS chi2
      |FROM s""".stripMargin

  /** q312/q313 oracle: [[graft.operators.Survival.concordanceFromCells]]
    * replayed — the survival subjects, 16-bucket risk cells, the dense
    * (score × duration) grid with the duration-suffix "outlived" window
    * and the score-prefix dominance split, exact HUGEINT pair counts, C
    * one division. q313's fold merges to identical cells (shared
    * verbatim).
    */
  private lazy val concordanceOracle: String =
    s"""$SurvivalSubjCte,
      |cc AS (SELECT user_id % 16 AS s, t,
      |    CAST(sum(ev) AS BIGINT) AS d, CAST(sum(1 - ev) AS BIGINT) AS c
      |  FROM subj GROUP BY 1, 2),
      |su AS (SELECT DISTINCT s FROM cc),
      |tu AS (SELECT DISTINCT t FROM cc),
      |f AS (SELECT su.s, tu.t, coalesce(cc.d, 0) AS d, coalesce(cc.c, 0) AS c
      |  FROM su CROSS JOIN tu LEFT JOIN cc ON su.s = cc.s AND tu.t = cc.t),
      |o AS (SELECT *, coalesce(sum(d + c) OVER (PARTITION BY s ORDER BY t
      |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) + c AS outl
      |  FROM f),
      |sp AS (SELECT *,
      |    coalesce(sum(outl) OVER (PARTITION BY t ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lowr,
      |    sum(outl) OVER (PARTITION BY t) AS tot
      |  FROM o),
      |ag AS (SELECT
      |    sum(CAST(d AS HUGEINT) * lowr) AS conc,
      |    sum(CAST(d AS HUGEINT) * (tot - lowr - outl)) AS disc,
      |    sum(CAST(d AS HUGEINT) * outl) AS tied
      |  FROM sp)
      |SELECT CAST(conc AS VARCHAR) AS concordant,
      |  CAST(disc AS VARCHAR) AS discordant,
      |  CAST(tied AS VARCHAR) AS tied_score,
      |  CAST(conc + disc + tied AS VARCHAR) AS n_comparable,
      |  CASE WHEN conc + disc + tied > 0 THEN
      |    round(CAST(2 * conc + tied AS DOUBLE) /
      |      CAST(2 * (conc + disc + tied) AS DOUBLE), 9) END AS c_index
      |FROM ag""".stripMargin

  /** q293 oracle: [[graft.quality.Association.pageTrend]] replayed —
    * the three planted scorer versions, per-block doubled midranks,
    * exact L2 = Σ j·R2_j, the classical E/Var and one-sided z.
    */
  private lazy val pageTrendOracle: String =
    """WITH d AS (SELECT doc_id, n_chars FROM documents WHERE n_chars IS NOT NULL),
      |obs AS (
      |  SELECT doc_id AS b, CAST(0 AS BIGINT) AS t, n_chars AS v FROM d
      |  UNION ALL SELECT doc_id, 1, n_chars + 1 * (doc_id % 7) FROM d
      |  UNION ALL SELECT doc_id, 2, n_chars + 2 * (doc_id % 7) FROM d),
      |r AS (SELECT *,
      |    2 * rank() OVER (PARTITION BY b ORDER BY v) +
      |      count(*) OVER (PARTITION BY b, v) - 1 AS r2
      |  FROM obs),
      |pt AS (SELECT t, CAST(count(*) AS BIGINT) AS nb,
      |    sum(CAST(r2 AS HUGEINT)) AS r2sum FROM r GROUP BY 1),
      |pj AS (SELECT *, CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS j,
      |    count(*) OVER () AS k FROM pt),
      |l AS (SELECT *, sum(CAST(j AS HUGEINT) * r2sum) OVER () AS l2 FROM pj)
      |SELECT t AS treatment, j, nb AS b, CAST(r2sum AS VARCHAR) AS r2_sum,
      |  CAST(k AS BIGINT) AS k, CAST(0 AS BIGINT) AS n_incomplete,
      |  CAST(l2 AS VARCHAR) AS l2,
      |  CASE WHEN k >= 2 AND nb > 0 THEN round(
      |    (CAST(l2 AS DOUBLE) / 2.0 -
      |      CAST(nb AS DOUBLE) * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0) *
      |        (CAST(k AS DOUBLE) + 1.0) / 4.0) /
      |    sqrt(CAST(nb AS DOUBLE) *
      |      (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - CAST(k AS DOUBLE)) *
      |      (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - CAST(k AS DOUBLE)) /
      |      (144.0 * (CAST(k AS DOUBLE) - 1.0))), 9)
      |  END AS z
      |FROM l ORDER BY treatment""".stripMargin

  /** q292 oracle: [[graft.quality.Association.proportionEffects]]
    * replayed — the q229 variant counts, the 2-label pivot, exact risk
    * cross product, Woolf ln-CI and arcsine h fixed dags.
    */
  private lazy val proportionEffectsOracle: String =
    """WITH ev AS (SELECT CAST(event_type AS VARCHAR) AS grp,
      |    CASE WHEN value >= 250 THEN 1 ELSE 0 END AS hi
      |  FROM events WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
      |ga AS (SELECT grp, CAST(count(*) AS BIGINT) AS m,
      |    CAST(sum(hi) AS BIGINT) AS s FROM ev GROUP BY 1),
      |lab AS (SELECT *, count(*) OVER () AS ngrps,
      |    min(grp) OVER () AS grp_lo, max(grp) OVER () AS grp_hi FROM ga),
      |wide AS (SELECT grp_lo, grp_hi, ngrps,
      |    max(CASE WHEN grp = grp_lo THEN m END) AS m1,
      |    max(CASE WHEN grp = grp_lo THEN s END) AS s1,
      |    max(CASE WHEN grp = grp_hi THEN m END) AS m2,
      |    max(CASE WHEN grp = grp_hi THEN s END) AS s2
      |  FROM lab GROUP BY 1, 2, 3),
      |f AS (SELECT *,
      |    s1 AS a, m1 - s1 AS b, s2 AS c, m2 - s2 AS d,
      |    CAST(s1 AS HUGEINT) * m2 - CAST(s2 AS HUGEINT) * m1 AS rdnum,
      |    (CASE WHEN s1 = 0 THEN 1 ELSE 0 END + CASE WHEN m1 - s1 = 0 THEN 1 ELSE 0 END +
      |     CASE WHEN s2 = 0 THEN 1 ELSE 0 END + CASE WHEN m2 - s2 = 0 THEN 1 ELSE 0 END)
      |      AS zc
      |  FROM wide),
      |e AS (SELECT *,
      |    ln((CAST(a AS DOUBLE) * CAST(d AS DOUBLE)) /
      |       (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))) AS lnor,
      |    sqrt(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE) +
      |         1.0 / CAST(c AS DOUBLE) + 1.0 / CAST(d AS DOUBLE)) AS seln,
      |    ngrps = 2 AND m1 > 0 AND m2 > 0 AS okb
      |  FROM f)
      |SELECT grp_lo, grp_hi, CAST(ngrps AS BIGINT) AS n_groups,
      |  CASE WHEN ngrps = 2 THEN m1 END AS m_lo,
      |  CASE WHEN ngrps = 2 THEN s1 END AS s_lo,
      |  CASE WHEN ngrps = 2 THEN m2 END AS m_hi,
      |  CASE WHEN ngrps = 2 THEN s2 END AS s_hi,
      |  CASE WHEN ngrps = 2 THEN CAST(rdnum AS VARCHAR) END AS rd_num,
      |  CASE WHEN okb THEN round(CAST(rdnum AS DOUBLE) /
      |    (CAST(m1 AS DOUBLE) * CAST(m2 AS DOUBLE)), 9) END AS risk_diff,
      |  CASE WHEN okb AND c > 0 THEN round(
      |    (CAST(a AS DOUBLE) * CAST(m2 AS DOUBLE)) /
      |    (CAST(c AS DOUBLE) * CAST(m1 AS DOUBLE)), 9) END AS risk_ratio,
      |  CASE WHEN ngrps = 2 THEN CAST(zc AS BIGINT) END AS n_zero_cells,
      |  CASE WHEN okb AND zc = 0 THEN round(
      |    (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)) /
      |    (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)), 9) END AS odds_ratio,
      |  CASE WHEN okb AND zc = 0 THEN round(exp(lnor - 1.959964 * seln), 9)
      |  END AS or_ci_lo,
      |  CASE WHEN okb AND zc = 0 THEN round(exp(lnor + 1.959964 * seln), 9)
      |  END AS or_ci_hi,
      |  CASE WHEN okb THEN round(
      |    2.0 * asin(sqrt(CAST(a AS DOUBLE) / CAST(m1 AS DOUBLE))) -
      |    2.0 * asin(sqrt(CAST(c AS DOUBLE) / CAST(m2 AS DOUBLE))), 9)
      |  END AS cohens_h
      |FROM e""".stripMargin

  /** q290 oracle: [[graft.text.CorpusLaws.yuleK]] replayed — per-lang
    * token counts, exact Σcnt², K = 10⁴·(Σcnt² − N)/N².
    */
  private lazy val yuleKOracle: String =
    """WITH t AS (SELECT lang,
      |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
      |  FROM documents WHERE text IS NOT NULL),
      |c AS (SELECT lang, token, count(*) AS cnt FROM t GROUP BY 1, 2),
      |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
      |    CAST(sum(cnt) AS BIGINT) AS mass,
      |    sum(CAST(cnt AS HUGEINT) * cnt) AS s2
      |  FROM c GROUP BY 1)
      |SELECT lang, n_types, mass, CAST(s2 AS VARCHAR) AS s2,
      |  CASE WHEN mass > 0 THEN round(
      |    1e4 * CAST(s2 - mass AS DOUBLE) /
      |      (CAST(mass AS DOUBLE) * CAST(mass AS DOUBLE)), 9)
      |  END AS yule_k
      |FROM a ORDER BY lang""".stripMargin

  /** Shared oracle CTE for the survival family: the
    * [[graft.queries.CoreQueries]] `survivalSubjects` fixture — hours
    * to first purchase inside a 96 h administrative window from the
    * user's first event, else right-censored at 96. `subj` columns:
    * user_id, t, ev.
    */
  private lazy val SurvivalSubjCte: String =
    """WITH e AS (SELECT user_id, event_type,
      |    CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h
      |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
      |pu AS (SELECT user_id, min(h) AS f,
      |    min(CASE WHEN event_type = 'purchase' THEN h END) AS p
      |  FROM e GROUP BY 1),
      |subj AS (SELECT user_id,
      |    CASE WHEN p IS NOT NULL AND p - f + 1 <= 96 THEN p - f + 1 ELSE 96 END AS t,
      |    CASE WHEN p IS NOT NULL AND p - f + 1 <= 96 THEN 1 ELSE 0 END AS ev
      |  FROM pu)""".stripMargin

  /** q291 oracle: [[graft.operators.Survival.rmst]] replayed — the q285
    * KM chain with UNROUNDED survivals, τ-truncated steps, nano-landed
    * step survivals × integer widths, one division.
    */
  private lazy val rmstOracle: String =
    s"""$SurvivalSubjCte,
      |cells AS (SELECT t,
      |    CAST(sum(ev) AS BIGINT) AS n_event,
      |    CAST(sum(1 - ev) AS BIGINT) AS n_censored
      |  FROM subj GROUP BY 1),
      |risk AS (SELECT *,
      |    CAST(sum(n_event + n_censored) OVER (ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
      |  FROM cells),
      |terms AS (SELECT *,
      |    CASE WHEN n_event = 0 THEN 0
      |         WHEN n_event < n_risk THEN CAST(round(ln(
      |           (CAST(n_risk AS DOUBLE) - CAST(n_event AS DOUBLE)) /
      |             CAST(n_risk AS DOUBLE)) * 1e9) AS BIGINT) END AS ln9
      |  FROM risk),
      |acc AS (SELECT *,
      |    max(CASE WHEN n_event = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 AS dead,
      |    sum(ln9) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lnsum9
      |  FROM terms),
      |km AS (SELECT t,
      |    CASE WHEN dead THEN 0.0 ELSE exp(CAST(lnsum9 AS DOUBLE) / 1e9) END AS s
      |  FROM acc WHERE t <= 48),
      |steps AS (SELECT t, s,
      |    lag(s, 1, 1.0) OVER (ORDER BY t) AS prev_s,
      |    lag(t, 1, 0) OVER (ORDER BY t) AS prev_t,
      |    row_number() OVER (ORDER BY t DESC) = 1 AS is_last
      |  FROM km),
      |seg AS (SELECT
      |    CAST(round(prev_s * 1e9) AS HUGEINT) * (t - prev_t) +
      |      CASE WHEN is_last THEN CAST(round(s * 1e9) AS HUGEINT) * (48 - t)
      |           ELSE 0 END AS seg9,
      |    CASE WHEN is_last THEN t END AS tl
      |  FROM steps)
      |SELECT CAST(48 AS BIGINT) AS tau,
      |  coalesce(CAST(max(tl) AS BIGINT), 0) AS t_last,
      |  coalesce(round(CAST(sum(seg9) AS DOUBLE) / 1e9, 9), 48.0) AS rmst
      |FROM seg""".stripMargin

  /** q288 oracle: [[graft.operators.Survival.nelsonAalen]] replayed —
    * the q285 cells, reverse-cumulative at-risk, nano d/n and d/n²
    * terms, cumulative H/variance, e^(−H).
    */
  private lazy val nelsonAalenOracle: String =
    s"""$SurvivalSubjCte,
      |cells AS (SELECT t,
      |    CAST(sum(ev) AS BIGINT) AS n_event,
      |    CAST(sum(1 - ev) AS BIGINT) AS n_censored
      |  FROM subj GROUP BY 1),
      |risk AS (SELECT *,
      |    CAST(sum(n_event + n_censored) OVER (ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
      |  FROM cells),
      |terms AS (SELECT *,
      |    CASE WHEN n_event = 0 THEN 0 ELSE CAST(round(
      |      CAST(n_event AS DOUBLE) / CAST(n_risk AS DOUBLE) * 1e9) AS BIGINT)
      |    END AS h9,
      |    CASE WHEN n_event = 0 THEN 0 ELSE CAST(round(
      |      CAST(n_event AS DOUBLE) /
      |        (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)) * 1e9) AS BIGINT)
      |    END AS v9
      |  FROM risk),
      |acc AS (SELECT *,
      |    sum(h9) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hsum9,
      |    sum(v9) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vsum9
      |  FROM terms)
      |SELECT t, n_risk, n_event, n_censored,
      |  round(CAST(hsum9 AS DOUBLE) / 1e9, 9) AS hazard,
      |  round(sqrt(CAST(vsum9 AS DOUBLE) / 1e9), 9) AS se_hazard,
      |  round(exp(-(CAST(hsum9 AS DOUBLE) / 1e9)), 9) AS surv_fh
      |FROM acc ORDER BY t""".stripMargin

  /** q289 oracle: [[graft.operators.RankEval.weightedKappa]] replayed
    * — ordinal tercile judges, quadratic (a−b)² weights on the
    * observed contingency and the marginal grid, κ_w one division.
    */
  private lazy val weightedKappaOracle: String =
    """WITH d AS (SELECT least(n_chars // 512, 2) AS a,
      |    least(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
      |      x -> x <> '')) // 40, 2) AS b
      |  FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL),
      |cnt AS (SELECT a, b, CAST(count(*) AS HUGEINT) AS n FROM d GROUP BY 1, 2),
      |rt AS (SELECT a, sum(n) AS ra FROM cnt GROUP BY 1),
      |ct AS (SELECT b, sum(n) AS cb FROM cnt GROUP BY 1),
      |wo AS (SELECT CAST(sum(n) AS BIGINT) AS n_items,
      |    coalesce(sum(CAST((a - b) * (a - b) AS HUGEINT) * n), 0) AS w_obs
      |  FROM cnt),
      |we AS (SELECT coalesce(sum(CAST((rt.a - ct.b) * (rt.a - ct.b) AS HUGEINT) *
      |    rt.ra * ct.cb), 0) AS we_num FROM rt CROSS JOIN ct)
      |SELECT n_items,
      |  CAST(w_obs * n_items AS VARCHAR) AS wo_num,
      |  CAST(we_num AS VARCHAR) AS we_num,
      |  CASE WHEN we_num > 0 THEN
      |    round(1.0 - CAST(w_obs * n_items AS DOUBLE) / CAST(we_num AS DOUBLE), 9)
      |  END AS kappa_w
      |FROM wo CROSS JOIN we""".stripMargin

  /** q286 oracle: [[graft.operators.Survival.logRank]] replayed — the
    * q285 subjects split by user parity, per-(cohort, t) cells on the
    * pooled spine, reverse-cumulative at-risk, nano hypergeometric
    * E/V terms, z/χ² dags. E accumulates at EVERY event time (the
    * R-survdiff n = 1 convention); only V carries the n > 1 guard.
    */
  private lazy val logRankOracle: String =
    s"""$SurvivalSubjCte,
      |cells AS (SELECT CAST(user_id % 2 = 0 AS VARCHAR) AS grp, t,
      |    CAST(sum(ev) AS BIGINT) AS d, CAST(sum(1 - ev) AS BIGINT) AS c
      |  FROM subj GROUP BY 1, 2),
      |lab AS (SELECT *, min(grp) OVER () AS grp_lo, max(grp) OVER () AS grp_hi
      |  FROM cells),
      |spine AS (SELECT grp_lo, grp_hi, t,
      |    CAST(sum(CASE WHEN grp = grp_lo THEN d ELSE 0 END) AS BIGINT) AS d1,
      |    CAST(sum(CASE WHEN grp = grp_lo THEN c ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN grp <> grp_lo THEN d ELSE 0 END) AS BIGINT) AS d2,
      |    CAST(sum(CASE WHEN grp <> grp_lo THEN c ELSE 0 END) AS BIGINT) AS c2
      |  FROM lab GROUP BY 1, 2, 3),
      |risk AS (SELECT *,
      |    CAST(sum(d1 + c1) OVER (ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n1,
      |    CAST(sum(d2 + c2) OVER (ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n2
      |  FROM spine),
      |terms AS (SELECT *,
      |    CASE WHEN d1 + d2 > 0 THEN CAST(round(
      |      CAST(d1 + d2 AS DOUBLE) * CAST(n1 AS DOUBLE) /
      |        (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) * 1e9) AS BIGINT)
      |    ELSE 0 END AS e9,
      |    CASE WHEN d1 + d2 > 0 AND n1 + n2 > 1 THEN CAST(round(
      |      CAST(d1 + d2 AS DOUBLE) *
      |        (CAST(n1 AS DOUBLE) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))) *
      |        (CAST(n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))) *
      |        ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - CAST(d1 + d2 AS DOUBLE)) /
      |        ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - 1.0) * 1e9) AS BIGINT)
      |    ELSE 0 END AS v9
      |  FROM risk),
      |s AS (SELECT grp_lo, grp_hi,
      |    CAST(sum(d1) AS BIGINT) AS o_lo,
      |    CAST(sum(d1 + c1) AS BIGINT) AS n_lo,
      |    CAST(sum(d2 + c2) AS BIGINT) AS n_hi,
      |    sum(CAST(e9 AS HUGEINT)) AS e9s, sum(CAST(v9 AS HUGEINT)) AS v9s
      |  FROM terms GROUP BY 1, 2)
      |SELECT grp_lo, grp_hi, CAST(2 AS BIGINT) AS n_groups, n_lo, n_hi, o_lo,
      |  CAST(e9s AS VARCHAR) AS e_lo_9, CAST(v9s AS VARCHAR) AS v_9,
      |  CASE WHEN v9s > 0 THEN round((CAST(o_lo AS DOUBLE) - CAST(e9s AS DOUBLE) / 1e9) /
      |    sqrt(CAST(v9s AS DOUBLE) / 1e9), 9) END AS z,
      |  CASE WHEN v9s > 0 THEN round(
      |    ((CAST(o_lo AS DOUBLE) - CAST(e9s AS DOUBLE) / 1e9) /
      |      sqrt(CAST(v9s AS DOUBLE) / 1e9)) *
      |    ((CAST(o_lo AS DOUBLE) - CAST(e9s AS DOUBLE) / 1e9) /
      |      sqrt(CAST(v9s AS DOUBLE) / 1e9)), 9) END AS chi2
      |FROM s""".stripMargin

  /** q296 oracle: [[graft.operators.Survival.logRankStratified]]
    * replayed — the q286 cells keyed additionally by user_id mod 3,
    * per-stratum reverse-cumulative at-risk + nano hypergeometric
    * terms (the q286 n = 1 convention), pooled over strata in HUGEINT.
    */
  private lazy val logRankStratifiedOracle: String =
    s"""$SurvivalSubjCte,
      |cells AS (SELECT CAST(user_id % 3 AS VARCHAR) AS st,
      |    CAST(user_id % 2 = 0 AS VARCHAR) AS grp, t,
      |    CAST(sum(ev) AS BIGINT) AS d, CAST(sum(1 - ev) AS BIGINT) AS c
      |  FROM subj GROUP BY 1, 2, 3),
      |lab AS (SELECT *, min(grp) OVER () AS grp_lo, max(grp) OVER () AS grp_hi
      |  FROM cells),
      |spine AS (SELECT grp_lo, grp_hi, st, t,
      |    CAST(sum(CASE WHEN grp = grp_lo THEN d ELSE 0 END) AS BIGINT) AS d1,
      |    CAST(sum(CASE WHEN grp = grp_lo THEN c ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN grp <> grp_lo THEN d ELSE 0 END) AS BIGINT) AS d2,
      |    CAST(sum(CASE WHEN grp <> grp_lo THEN c ELSE 0 END) AS BIGINT) AS c2
      |  FROM lab GROUP BY 1, 2, 3, 4),
      |risk AS (SELECT *,
      |    CAST(sum(d1 + c1) OVER (PARTITION BY st ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n1,
      |    CAST(sum(d2 + c2) OVER (PARTITION BY st ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n2
      |  FROM spine),
      |terms AS (SELECT *,
      |    CASE WHEN d1 + d2 > 0 THEN CAST(round(
      |      CAST(d1 + d2 AS DOUBLE) * CAST(n1 AS DOUBLE) /
      |        (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) * 1e9) AS BIGINT)
      |    ELSE 0 END AS e9,
      |    CASE WHEN d1 + d2 > 0 AND n1 + n2 > 1 THEN CAST(round(
      |      CAST(d1 + d2 AS DOUBLE) *
      |        (CAST(n1 AS DOUBLE) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))) *
      |        (CAST(n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))) *
      |        ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - CAST(d1 + d2 AS DOUBLE)) /
      |        ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - 1.0) * 1e9) AS BIGINT)
      |    ELSE 0 END AS v9
      |  FROM risk),
      |s AS (SELECT grp_lo, grp_hi,
      |    CAST(count(DISTINCT st) AS BIGINT) AS n_strata,
      |    CAST(sum(d1) AS BIGINT) AS o_lo,
      |    CAST(sum(d1 + c1) AS BIGINT) AS n_lo,
      |    CAST(sum(d2 + c2) AS BIGINT) AS n_hi,
      |    sum(CAST(e9 AS HUGEINT)) AS e9s, sum(CAST(v9 AS HUGEINT)) AS v9s
      |  FROM terms GROUP BY 1, 2)
      |SELECT grp_lo, grp_hi, CAST(2 AS BIGINT) AS n_groups, n_strata,
      |  n_lo, n_hi, o_lo,
      |  CAST(e9s AS VARCHAR) AS e_lo_9, CAST(v9s AS VARCHAR) AS v_9,
      |  CASE WHEN v9s > 0 THEN round((CAST(o_lo AS DOUBLE) - CAST(e9s AS DOUBLE) / 1e9) /
      |    sqrt(CAST(v9s AS DOUBLE) / 1e9), 9) END AS z,
      |  CASE WHEN v9s > 0 THEN round(
      |    ((CAST(o_lo AS DOUBLE) - CAST(e9s AS DOUBLE) / 1e9) /
      |      sqrt(CAST(v9s AS DOUBLE) / 1e9)) *
      |    ((CAST(o_lo AS DOUBLE) - CAST(e9s AS DOUBLE) / 1e9) /
      |      sqrt(CAST(v9s AS DOUBLE) / 1e9)), 9) END AS chi2
      |FROM s""".stripMargin

  /** q297/q301 oracle: [[graft.operators.Survival.aalenJohansen]]
    * replayed — the purchase-vs-error race inside the 96 h window
    * (cause 1 = purchase first, 2 = error first, tie → purchase;
    * neither → censored at 96), all-cause KM chain for S(t⁻)
    * (nano-landed), per-(t, cause) nano d_k/n, CIF as the cumulative
    * HUGEINT sum of 10⁻¹⁸ products over the (t × cause) grid.
    */
  private lazy val aalenJohansenOracle: String =
    """WITH e AS (SELECT user_id, event_type,
      |    CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h
      |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
      |pu AS (SELECT user_id, min(h) AS f,
      |    min(CASE WHEN event_type = 'purchase' THEN h END) AS p,
      |    min(CASE WHEN event_type = 'error' THEN h END) AS er
      |  FROM e GROUP BY 1),
      |d0 AS (SELECT user_id, p - f + 1 AS tp, er - f + 1 AS te,
      |    least(coalesce(p - f + 1, 97), coalesce(er - f + 1, 97)) AS tm
      |  FROM pu),
      |subj AS (SELECT user_id,
      |    CASE WHEN tm <= 96 THEN tm ELSE 96 END AS t,
      |    CASE WHEN tm > 96 THEN 0
      |         WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te) THEN 1
      |         ELSE 2 END AS cause
      |  FROM d0),
      |cells AS (SELECT t, cause, CAST(count(*) AS BIGINT) AS n
      |  FROM subj GROUP BY 1, 2),
      |spine AS (SELECT t,
      |    CAST(sum(CASE WHEN cause <> 0 THEN n ELSE 0 END) AS BIGINT) AS d,
      |    CAST(sum(CASE WHEN cause = 0 THEN n ELSE 0 END) AS BIGINT) AS c
      |  FROM cells GROUP BY 1),
      |risk AS (SELECT *,
      |    CAST(sum(d + c) OVER (ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
      |  FROM spine),
      |terms AS (SELECT *,
      |    CASE WHEN d = 0 THEN 0
      |         WHEN d < n_risk THEN CAST(round(ln(
      |           (CAST(n_risk AS DOUBLE) - CAST(d AS DOUBLE)) /
      |             CAST(n_risk AS DOUBLE)) * 1e9) AS BIGINT) END AS ln9
      |  FROM risk),
      |acc AS (SELECT *,
      |    max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 AS dead,
      |    coalesce(max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) = 1 AS dead_prev,
      |    sum(ln9) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lnsum9,
      |    coalesce(sum(ln9) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lnprev9
      |  FROM terms),
      |sg AS (SELECT *,
      |    CASE WHEN dead THEN 0.0
      |         ELSE exp(CAST(lnsum9 AS DOUBLE) / 1e9) END AS survival,
      |    CASE WHEN dead_prev THEN 0
      |         ELSE CAST(round(exp(CAST(lnprev9 AS DOUBLE) / 1e9) * 1e9) AS BIGINT)
      |    END AS sprev9
      |  FROM acc),
      |ks AS (SELECT DISTINCT CAST(cause AS BIGINT) AS ev_type
      |  FROM subj WHERE cause <> 0),
      |grid AS (SELECT g.*, k.ev_type FROM sg g CROSS JOIN ks k),
      |typed AS (SELECT t, CAST(cause AS BIGINT) AS ev_type, n AS dk
      |  FROM cells WHERE cause <> 0),
      |j AS (SELECT grid.*, coalesce(typed.dk, 0) AS n_event,
      |    CASE WHEN coalesce(typed.dk, 0) = 0 THEN 0
      |         ELSE CAST(round(CAST(typed.dk AS DOUBLE) /
      |           CAST(grid.n_risk AS DOUBLE) * 1e9) AS BIGINT) END AS hk9
      |  FROM grid LEFT JOIN typed
      |    ON grid.t = typed.t AND grid.ev_type = typed.ev_type),
      |cum AS (SELECT *,
      |    sum(CAST(sprev9 AS HUGEINT) * hk9) OVER (PARTITION BY ev_type
      |      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t18
      |  FROM j)
      |SELECT t, ev_type, n_risk, n_event,
      |  round(survival, 9) AS survival,
      |  round(CAST(t18 AS DOUBLE) / 1e18, 9) AS cif
      |FROM cum ORDER BY t, ev_type""".stripMargin

  /** q302 oracle: [[graft.operators.Survival.medianSurvival]] replayed
    * — the q285 KM chain per parity cohort, smallest t with S ≤ 1/2
    * (the nano ln-sum integer spacing keeps the crossing off any float
    * boundary), NULL when the curve never crosses.
    */
  private lazy val medianSurvivalOracle: String =
    s"""$SurvivalSubjCte,
      |cells AS (SELECT CAST(user_id % 2 = 0 AS VARCHAR) AS cohort, t,
      |    CAST(sum(ev) AS BIGINT) AS n_event,
      |    CAST(sum(1 - ev) AS BIGINT) AS n_censored
      |  FROM subj GROUP BY 1, 2),
      |risk AS (SELECT *,
      |    CAST(sum(n_event + n_censored) OVER (PARTITION BY cohort ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
      |  FROM cells),
      |terms AS (SELECT *,
      |    CASE WHEN n_event = 0 THEN 0
      |         WHEN n_event < n_risk THEN CAST(round(ln(
      |           (CAST(n_risk AS DOUBLE) - CAST(n_event AS DOUBLE)) /
      |             CAST(n_risk AS DOUBLE)) * 1e9) AS BIGINT) END AS ln9
      |  FROM risk),
      |acc AS (SELECT *,
      |    max(CASE WHEN n_event = n_risk THEN 1 ELSE 0 END) OVER (
      |      PARTITION BY cohort ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 AS dead,
      |    sum(ln9) OVER (PARTITION BY cohort ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lnsum9
      |  FROM terms),
      |km AS (SELECT cohort, t,
      |    CASE WHEN dead THEN 0.0
      |         ELSE exp(CAST(lnsum9 AS DOUBLE) / 1e9) END AS s
      |  FROM acc)
      |SELECT cohort, min(CASE WHEN s <= 0.5 THEN t END) AS median_survival
      |FROM km GROUP BY 1 ORDER BY 1""".stripMargin

  /** q298 oracle: [[graft.quality.Association.cuped]] replayed — exact
    * HUGEINT moments per parity arm over the per-user even/odd event
    * counts, pooled θ one division, the adjusted-effect / variance /
    * CI dags term for term.
    */
  private lazy val cupedOracle: String =
    """WITH pu AS (SELECT
      |    CAST(user_id % 2 = 0 AS VARCHAR) AS arm,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS y
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |g AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      |  FROM pu GROUP BY 1),
      |lab AS (SELECT *, min(arm) OVER () AS grp_lo, max(arm) OVER () AS grp_hi
      |  FROM g),
      |wide AS (SELECT grp_lo, grp_hi,
      |    max(CASE WHEN arm = grp_lo THEN n END) AS n1,
      |    max(CASE WHEN arm = grp_lo THEN sx END) AS sx1,
      |    max(CASE WHEN arm = grp_lo THEN sy END) AS sy1,
      |    max(CASE WHEN arm = grp_lo THEN sxx END) AS sxx1,
      |    max(CASE WHEN arm = grp_lo THEN syy END) AS syy1,
      |    max(CASE WHEN arm = grp_lo THEN sxy END) AS sxy1,
      |    max(CASE WHEN arm = grp_hi THEN n END) AS n2,
      |    max(CASE WHEN arm = grp_hi THEN sx END) AS sx2,
      |    max(CASE WHEN arm = grp_hi THEN sy END) AS sy2,
      |    max(CASE WHEN arm = grp_hi THEN sxx END) AS sxx2,
      |    max(CASE WHEN arm = grp_hi THEN syy END) AS syy2,
      |    max(CASE WHEN arm = grp_hi THEN sxy END) AS sxy2
      |  FROM lab GROUP BY 1, 2),
      |c1 AS (SELECT *,
      |    CAST(n1 + n2 AS HUGEINT) AS nt,
      |    sx1 + sx2 AS sxt, sy1 + sy2 AS syt,
      |    sxx1 + sxx2 AS sxxt, syy1 + syy2 AS syyt, sxy1 + sxy2 AS sxyt
      |  FROM wide),
      |c2 AS (SELECT *,
      |    nt * sxyt - sxt * syt AS covnum,
      |    nt * sxxt - sxt * sxt AS varxnum,
      |    nt * syyt - syt * syt AS varynum
      |  FROM c1),
      |c3 AS (SELECT *,
      |    CAST(covnum AS DOUBLE) / CAST(varxnum AS DOUBLE) AS theta,
      |    CAST(sy1 * n2 - sy2 * n1 AS DOUBLE) /
      |      (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS raweff,
      |    CAST(sx1 * n2 - sx2 * n1 AS DOUBLE) AS xcross
      |  FROM c2),
      |c4 AS (SELECT *,
      |    raweff - theta * xcross / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS adjeff,
      |    (CAST(n1 AS DOUBLE) * (CAST(syy1 AS DOUBLE) - 2 * theta * CAST(sxy1 AS DOUBLE) +
      |        theta * theta * CAST(sxx1 AS DOUBLE)) -
      |      (CAST(sy1 AS DOUBLE) - theta * CAST(sx1 AS DOUBLE)) *
      |      (CAST(sy1 AS DOUBLE) - theta * CAST(sx1 AS DOUBLE))) /
      |      (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) AS v1,
      |    (CAST(n2 AS DOUBLE) * (CAST(syy2 AS DOUBLE) - 2 * theta * CAST(sxy2 AS DOUBLE) +
      |        theta * theta * CAST(sxx2 AS DOUBLE)) -
      |      (CAST(sy2 AS DOUBLE) - theta * CAST(sx2 AS DOUBLE)) *
      |      (CAST(sy2 AS DOUBLE) - theta * CAST(sx2 AS DOUBLE))) /
      |      (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)) AS v2,
      |    CAST(covnum AS DOUBLE) * CAST(covnum AS DOUBLE) /
      |      (CAST(varxnum AS DOUBLE) * CAST(varynum AS DOUBLE)) AS rho2
      |  FROM c3),
      |c5 AS (SELECT *, sqrt(v1 + v2) AS se FROM c4)
      |SELECT grp_lo, grp_hi, CAST(2 AS BIGINT) AS n_groups, n1 AS n_lo, n2 AS n_hi,
      |  round(theta, 9) AS theta, round(rho2, 9) AS rho2,
      |  round(raweff, 9) AS effect_raw, round(adjeff, 9) AS effect_cuped,
      |  round(se, 9) AS se_cuped,
      |  round(adjeff - 1.959964 * se, 9) AS ci_lo,
      |  round(adjeff + 1.959964 * se, 9) AS ci_hi
      |FROM c5""".stripMargin

  /** q299 oracle: [[graft.quality.SequentialTests.msprtTwoProportion]]
    * replayed — cumulative exact counts over the 12 peeks, the pooled-p
    * variance, the nano mixture-LR dag (τ² = 2⁻¹²), the running-best
    * integer max, and the ln(20)-nano reject boundary 2995732274.
    */
  private lazy val msprtTwoPropOracle: String =
    """WITH ev AS (SELECT event_id % 12 AS peek,
      |    user_id % 2 = 0 AS ev_even,
      |    CASE WHEN value >= 250 THEN 1 ELSE 0 END AS hit
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
      |incr AS (SELECT peek,
      |    CAST(sum(CASE WHEN ev_even THEN 1 ELSE 0 END) AS BIGINT) AS bn1,
      |    CAST(sum(CASE WHEN ev_even THEN hit ELSE 0 END) AS BIGINT) AS bs1,
      |    CAST(sum(CASE WHEN NOT ev_even THEN 1 ELSE 0 END) AS BIGINT) AS bn2,
      |    CAST(sum(CASE WHEN NOT ev_even THEN hit ELSE 0 END) AS BIGINT) AS bs2
      |  FROM ev GROUP BY 1),
      |cum AS (SELECT peek,
      |    CAST(sum(bn1) OVER w AS BIGINT) AS n_lo,
      |    CAST(sum(bs1) OVER w AS BIGINT) AS s_lo,
      |    CAST(sum(bn2) OVER w AS BIGINT) AS n_hi,
      |    CAST(sum(bs2) OVER w AS BIGINT) AS s_hi
      |  FROM incr
      |  WINDOW w AS (ORDER BY peek ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |t AS (SELECT *,
      |    CAST(CAST(s_lo AS HUGEINT) * n_hi - CAST(s_hi AS HUGEINT) * n_lo AS DOUBLE) /
      |      (CAST(n_lo AS DOUBLE) * CAST(n_hi AS DOUBLE)) AS delta,
      |    (CAST(s_lo AS DOUBLE) + CAST(s_hi AS DOUBLE)) /
      |      (CAST(n_lo AS DOUBLE) + CAST(n_hi AS DOUBLE)) AS pp,
      |    n_lo > 0 AND n_hi > 0 AND (s_lo + s_hi) > 0 AND
      |      (s_lo + s_hi) < (n_lo + n_hi) AS usable
      |  FROM cum),
      |v AS (SELECT *,
      |    pp * (1 - pp) * (1.0 / CAST(n_lo AS DOUBLE) + 1.0 / CAST(n_hi AS DOUBLE)) AS vv
      |  FROM t),
      |l AS (SELECT *,
      |    CASE WHEN usable THEN CAST(round((0.5 * ln(vv / (vv + 0.000244140625)) +
      |      delta * delta * 0.000244140625 /
      |        (2 * vv * (vv + 0.000244140625))) * 1e9) AS BIGINT) END AS ln_lr9
      |  FROM v),
      |b AS (SELECT *, max(ln_lr9) OVER (ORDER BY peek
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS best9 FROM l)
      |SELECT peek, n_lo, s_lo, n_hi, s_hi,
      |  CASE WHEN usable THEN round(delta, 9) END AS delta, ln_lr9,
      |  round(CASE WHEN best9 IS NULL OR best9 <= 0 THEN 1.0
      |    ELSE exp(-CAST(best9 AS DOUBLE) / 1e9) END, 9) AS p_always_valid,
      |  coalesce(best9 >= 2995732274, false) AS reject
      |FROM b ORDER BY peek""".stripMargin

  /** q300 oracle: [[graft.quality.SequentialTests.msprtMean]] replayed
    * — cumulative exact moment sums of floor(value) per arm, the Welch
    * plug-in variance from HUGEINT numerators, the nano mixture-LR dag
    * (τ² = 1), running-best max, the same ln(20) boundary.
    */
  private lazy val msprtMeanOracle: String =
    """WITH ev AS (SELECT event_id % 12 AS peek,
      |    user_id % 2 = 0 AS ev_even,
      |    CAST(floor(value) AS BIGINT) AS m
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
      |incr AS (SELECT peek,
      |    CAST(sum(CASE WHEN ev_even THEN 1 ELSE 0 END) AS BIGINT) AS bn1,
      |    CAST(sum(CASE WHEN ev_even THEN m ELSE 0 END) AS HUGEINT) AS bs1,
      |    CAST(sum(CASE WHEN ev_even THEN m * m ELSE 0 END) AS HUGEINT) AS bq1,
      |    CAST(sum(CASE WHEN NOT ev_even THEN 1 ELSE 0 END) AS BIGINT) AS bn2,
      |    CAST(sum(CASE WHEN NOT ev_even THEN m ELSE 0 END) AS HUGEINT) AS bs2,
      |    CAST(sum(CASE WHEN NOT ev_even THEN m * m ELSE 0 END) AS HUGEINT) AS bq2
      |  FROM ev GROUP BY 1),
      |cum AS (SELECT peek,
      |    CAST(sum(bn1) OVER w AS BIGINT) AS n_lo,
      |    CAST(sum(bs1) OVER w AS HUGEINT) AS s1,
      |    CAST(sum(bq1) OVER w AS HUGEINT) AS q1,
      |    CAST(sum(bn2) OVER w AS BIGINT) AS n_hi,
      |    CAST(sum(bs2) OVER w AS HUGEINT) AS s2,
      |    CAST(sum(bq2) OVER w AS HUGEINT) AS q2
      |  FROM incr
      |  WINDOW w AS (ORDER BY peek ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |t AS (SELECT *,
      |    n_lo * q1 - s1 * s1 AS v1n, n_hi * q2 - s2 * s2 AS v2n,
      |    CAST(s1 * n_hi - s2 * n_lo AS DOUBLE) /
      |      (CAST(n_lo AS DOUBLE) * CAST(n_hi AS DOUBLE)) AS delta
      |  FROM cum),
      |v AS (SELECT *,
      |    CAST(v1n AS DOUBLE) / (CAST(n_lo AS DOUBLE) * CAST(n_lo AS DOUBLE) *
      |      (CAST(n_lo AS DOUBLE) - 1.0)) +
      |    CAST(v2n AS DOUBLE) / (CAST(n_hi AS DOUBLE) * CAST(n_hi AS DOUBLE) *
      |      (CAST(n_hi AS DOUBLE) - 1.0)) AS vv,
      |    n_lo >= 2 AND n_hi >= 2 AND (v1n + v2n) > 0 AS usable
      |  FROM t),
      |l AS (SELECT *,
      |    CASE WHEN usable THEN CAST(round((0.5 * ln(vv / (vv + 1.0)) +
      |      delta * delta * 1.0 / (2 * vv * (vv + 1.0))) * 1e9) AS BIGINT)
      |    END AS ln_lr9
      |  FROM v),
      |b AS (SELECT *, max(ln_lr9) OVER (ORDER BY peek
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS best9 FROM l)
      |SELECT peek, n_lo, CAST(s1 AS VARCHAR) AS sum_lo,
      |  n_hi, CAST(s2 AS VARCHAR) AS sum_hi,
      |  CASE WHEN usable THEN round(delta, 9) END AS delta, ln_lr9,
      |  round(CASE WHEN best9 IS NULL OR best9 <= 0 THEN 1.0
      |    ELSE exp(-CAST(best9 AS DOUBLE) / 1e9) END, 9) AS p_always_valid,
      |  coalesce(best9 >= 2995732274, false) AS reject
      |FROM b ORDER BY peek""".stripMargin

  /** q314 oracle: [[graft.quality.SequentialTests.alwaysValidCiMean]]
    * replayed — the q300 cumulative moment CTEs, then the CI radius
    * √(V(V+τ²)/τ²·ln((V+τ²)/(α²V))) in the Spark dag's float order
    * (τ² = 1, α = 0.05).
    */
  private lazy val alwaysValidCiOracle: String =
    """WITH ev AS (SELECT event_id % 12 AS peek,
      |    user_id % 2 = 0 AS ev_even,
      |    CAST(floor(value) AS BIGINT) AS m
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
      |incr AS (SELECT peek,
      |    CAST(sum(CASE WHEN ev_even THEN 1 ELSE 0 END) AS BIGINT) AS bn1,
      |    CAST(sum(CASE WHEN ev_even THEN m ELSE 0 END) AS HUGEINT) AS bs1,
      |    CAST(sum(CASE WHEN ev_even THEN m * m ELSE 0 END) AS HUGEINT) AS bq1,
      |    CAST(sum(CASE WHEN NOT ev_even THEN 1 ELSE 0 END) AS BIGINT) AS bn2,
      |    CAST(sum(CASE WHEN NOT ev_even THEN m ELSE 0 END) AS HUGEINT) AS bs2,
      |    CAST(sum(CASE WHEN NOT ev_even THEN m * m ELSE 0 END) AS HUGEINT) AS bq2
      |  FROM ev GROUP BY 1),
      |cum AS (SELECT peek,
      |    CAST(sum(bn1) OVER w AS BIGINT) AS n_lo,
      |    CAST(sum(bs1) OVER w AS HUGEINT) AS s1,
      |    CAST(sum(bq1) OVER w AS HUGEINT) AS q1,
      |    CAST(sum(bn2) OVER w AS BIGINT) AS n_hi,
      |    CAST(sum(bs2) OVER w AS HUGEINT) AS s2,
      |    CAST(sum(bq2) OVER w AS HUGEINT) AS q2
      |  FROM incr
      |  WINDOW w AS (ORDER BY peek ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |t AS (SELECT *,
      |    n_lo * q1 - s1 * s1 AS v1n, n_hi * q2 - s2 * s2 AS v2n,
      |    CAST(s1 * n_hi - s2 * n_lo AS DOUBLE) /
      |      (CAST(n_lo AS DOUBLE) * CAST(n_hi AS DOUBLE)) AS delta
      |  FROM cum),
      |v AS (SELECT *,
      |    CAST(v1n AS DOUBLE) / (CAST(n_lo AS DOUBLE) * CAST(n_lo AS DOUBLE) *
      |      (CAST(n_lo AS DOUBLE) - 1.0)) +
      |    CAST(v2n AS DOUBLE) / (CAST(n_hi AS DOUBLE) * CAST(n_hi AS DOUBLE) *
      |      (CAST(n_hi AS DOUBLE) - 1.0)) AS vv,
      |    n_lo >= 2 AND n_hi >= 2 AND (v1n + v2n) > 0 AS usable
      |  FROM t),
      |r AS (SELECT *,
      |    sqrt(vv * (vv + 1.0) / 1.0 * ln((vv + 1.0) / (0.05 * 0.05 * vv))) AS radius
      |  FROM v)
      |SELECT peek, n_lo, n_hi,
      |  CASE WHEN usable THEN round(delta, 9) END AS delta,
      |  CASE WHEN usable THEN round(radius, 9) END AS radius,
      |  CASE WHEN usable THEN round(delta - radius, 9) END AS ci_lo,
      |  CASE WHEN usable THEN round(delta + radius, 9) END AS ci_hi
      |FROM r ORDER BY peek""".stripMargin

  /** q315 oracle: [[graft.quality.Profiler.chapmanEstimate]] replayed —
    * exact detector quadrant counts, the bias-corrected N̂ and variance
    * single divisions.
    */
  private lazy val chapmanOracle: String =
    """WITH d AS (SELECT
      |    n_chars % 3 = 0 AS fa,
      |    regexp_matches(text, '[0-9]') AS fb
      |  FROM documents),
      |c AS (SELECT
      |    CAST(sum(CASE WHEN fa THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN fb THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN fa AND fb THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
      |    CAST(sum(CASE WHEN fa OR fb THEN 1 ELSE 0 END) AS BIGINT) AS n_either
      |  FROM d WHERE fa IS NOT NULL AND fb IS NOT NULL),
      |e AS (SELECT *,
      |    CAST(CAST(n_a + 1 AS HUGEINT) * (n_b + 1) AS DOUBLE) /
      |      CAST(n_both + 1 AS DOUBLE) - 1.0 AS n_hat,
      |    sqrt(CAST(CAST(n_a + 1 AS HUGEINT) * (n_b + 1) * (n_a - n_both) *
      |        (n_b - n_both) AS DOUBLE) /
      |      CAST(CAST(n_both + 1 AS HUGEINT) * (n_both + 1) * (n_both + 2)
      |        AS DOUBLE)) AS se_hat
      |  FROM c)
      |SELECT n_a, n_b, n_both, n_either,
      |  round(n_hat, 9) AS n_hat, round(se_hat, 9) AS se_hat,
      |  round(n_hat - CAST(n_either AS DOUBLE), 9) AS missed_hat
      |FROM e""".stripMargin

  /** q316 oracle: [[graft.quality.MultipleTesting.benjaminiYekutieli]]
    * replayed — the q283 md5 battery, the once-per-battery harmonic
    * constant c18 = Σ round(10¹⁸/i), the step-up closure under the
    * shrunk boundary as exact HUGEINT cross-products.
    */
  private lazy val benjaminiYekutieliOracle: String =
    """WITH ids AS (SELECT DISTINCT lang || ':' || source AS id FROM documents),
      |p AS (SELECT id,
      |    list_reduce(list_transform(range(1, 16), i ->
      |      CAST(strpos('0123456789abcdef', substring(md5(id), i, 1)) - 1 AS BIGINT)),
      |      (acc, x) -> acc * 16 + x) % 1000000000 AS p9
      |  FROM ids),
      |r AS (SELECT id, p9,
      |    sum(CASE WHEN p9 IS NULL THEN 1 ELSE 0 END) OVER () AS n_null,
      |    CAST(row_number() OVER (ORDER BY p9, id) AS BIGINT) AS rank,
      |    count(*) OVER () AS m FROM p),
      |h AS (SELECT *,
      |    sum(CAST(round(1e18 / CAST(rank AS DOUBLE)) AS HUGEINT)) OVER () AS c18
      |  FROM r),
      |c AS (SELECT *,
      |    CAST(p9 AS HUGEINT) * m * 100 * c18 <=
      |      CAST(rank AS HUGEINT) * 5 * 1000000000 * 1000000000000000000
      |      AS is_candidate
      |  FROM h),
      |f AS (SELECT *, max(CASE WHEN is_candidate THEN rank ELSE 0 END) OVER () AS cut
      |  FROM c)
      |SELECT id, p9, rank, CAST(m AS BIGINT) AS m,
      |  coalesce(CAST(n_null AS BIGINT), 0) AS n_null,
      |  CAST(c18 AS VARCHAR) AS c18, is_candidate,
      |  rank <= cut AS rejected
      |FROM f ORDER BY rank""".stripMargin

  /** q317 oracle: [[graft.operators.Sampling.postStratified]] replayed
    * — per-language exact moments, the literal weight normalization in
    * the same partial-sum order, nano W·ȳ / W²s²/n terms, the
    * off-design zh count.
    */
  private lazy val postStratifiedOracle: String =
    """WITH d AS (SELECT lang, CAST(n_chars AS BIGINT) AS y FROM documents
      |  WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
      |m AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      |  FROM d GROUP BY 1),
      |w AS (SELECT * FROM (VALUES ('en', 0.5), ('de', 0.15), ('es', 0.15),
      |    ('fr', 0.1)) AS t(lang, wr)),
      |j AS (SELECT w.lang, w.wr / (0.5 + 0.15 + 0.15 + 0.1) AS ww,
      |    coalesce(m.n, 0) AS n, m.sy, m.syy
      |  FROM w LEFT JOIN m ON w.lang = m.lang),
      |t AS (SELECT *,
      |    CAST(round(ww * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9)
      |      AS BIGINT) AS t9,
      |    CAST(round(ww * ww *
      |      (CAST(n * syy - sy * sy AS DOUBLE) /
      |        (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) /
      |      CAST(n AS DOUBLE) * 1e9) AS BIGINT) AS v9
      |  FROM j),
      |off AS (SELECT coalesce(sum(n), 0) AS noff FROM m
      |  WHERE lang NOT IN ('en', 'de', 'es', 'fr')),
      |s AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
      |    CAST(count(*) AS BIGINT) AS n_strata,
      |    CAST(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_strata,
      |    sum(sy) AS syt,
      |    sum(CAST(t9 AS HUGEINT)) AS est9, sum(CAST(v9 AS HUGEINT)) AS var9
      |  FROM t)
      |SELECT s.n_total, s.n_strata, s.n_empty_strata,
      |  CAST(off.noff AS BIGINT) AS n_off_design,
      |  round(CAST(s.syt AS DOUBLE) / CAST(s.n_total AS DOUBLE), 9) AS mean_raw,
      |  round(CAST(s.est9 AS DOUBLE) / 1e9, 9) AS mean_post,
      |  round(sqrt(CAST(s.var9 AS DOUBLE) / 1e9), 9) AS se_post
      |FROM s, off""".stripMargin

  /** q318 oracle: [[graft.quality.Association.cochranArmitage]]
    * replayed — per-priority exact pass counts, rank scores 1..k by
    * label order, the exact-integer trend numerator and variance, z
    * one division.
    */
  private lazy val cochranArmitageOracle: String =
    """WITH o AS (SELECT o_orderpriority AS grp,
      |    CASE WHEN o_totalprice >= 150000 THEN 1 ELSE 0 END AS hit
      |  FROM orders WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
      |pg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n, CAST(sum(hit) AS BIGINT) AS r
      |  FROM o GROUP BY 1),
      |sc AS (SELECT *, CAST(row_number() OVER (ORDER BY grp) AS HUGEINT) AS w
      |  FROM pg),
      |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
      |    CAST(sum(n) AS HUGEINT) AS nt, CAST(sum(r) AS HUGEINT) AS rt,
      |    sum(w * n) AS wn, sum(w * r) AS wr, sum(w * w * n) AS wwn
      |  FROM sc),
      |f AS (SELECT *, nt * wr - rt * wn AS num,
      |    rt * (nt - rt) * (nt * wwn - wn * wn) AS varnum
      |  FROM ag)
      |SELECT n_groups, CAST(nt AS BIGINT) AS n_total, CAST(rt AS BIGINT) AS n_pass,
      |  CAST(num AS VARCHAR) AS trend_num,
      |  CASE WHEN n_groups >= 2 AND rt > 0 AND rt < nt AND varnum > 0 THEN
      |    round(CAST(num AS DOUBLE) /
      |      sqrt(CAST(varnum AS DOUBLE) / CAST(nt AS DOUBLE)), 9) END AS z
      |FROM f""".stripMargin

  /** q319 oracle: [[graft.operators.Survival.logRankWeighted]] G(0,1)
    * replayed — the q286 spine + reverse-cumulative at-risk, the pooled
    * KM left-limit nano chain, w = 1 − Ŝ(t⁻), weighted deviation and
    * w²·V nano terms in the Spark dag's float order.
    */
  private lazy val flemingHarringtonOracle: String =
    s"""$SurvivalSubjCte,
      |cells AS (SELECT CAST(user_id % 2 = 0 AS VARCHAR) AS grp, t,
      |    CAST(sum(ev) AS BIGINT) AS d, CAST(sum(1 - ev) AS BIGINT) AS c
      |  FROM subj GROUP BY 1, 2),
      |lab AS (SELECT *, min(grp) OVER () AS grp_lo, max(grp) OVER () AS grp_hi
      |  FROM cells),
      |spine AS (SELECT grp_lo, grp_hi, t,
      |    CAST(sum(CASE WHEN grp = grp_lo THEN d ELSE 0 END) AS BIGINT) AS d1,
      |    CAST(sum(CASE WHEN grp = grp_lo THEN c ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN grp <> grp_lo THEN d ELSE 0 END) AS BIGINT) AS d2,
      |    CAST(sum(CASE WHEN grp <> grp_lo THEN c ELSE 0 END) AS BIGINT) AS c2
      |  FROM lab GROUP BY 1, 2, 3),
      |risk AS (SELECT *,
      |    CAST(sum(d1 + c1) OVER (ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n1,
      |    CAST(sum(d2 + c2) OVER (ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n2
      |  FROM spine),
      |lnc AS (SELECT *,
      |    CASE WHEN d1 + d2 = 0 THEN CAST(0 AS BIGINT)
      |      WHEN d1 + d2 < n1 + n2 THEN CAST(round(ln(
      |        ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - CAST(d1 + d2 AS DOUBLE)) /
      |          (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))) * 1e9) AS BIGINT)
      |    END AS ln9
      |  FROM risk),
      |sp AS (SELECT *,
      |    coalesce(max(CASE WHEN d1 + d2 = n1 + n2 THEN 1 ELSE 0 END)
      |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS deadprev,
      |    coalesce(sum(ln9) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lnprev
      |  FROM lnc),
      |wgt AS (SELECT *,
      |    CASE WHEN deadprev = 1 THEN CAST(0 AS BIGINT)
      |      ELSE CAST(round(exp(CAST(lnprev AS DOUBLE) / 1e9) * 1e9) AS BIGINT)
      |    END AS sprev9
      |  FROM sp),
      |terms AS (SELECT *,
      |    1.0 * (1.0 - CAST(sprev9 AS DOUBLE) / 1e9) AS w,
      |    CASE WHEN d1 + d2 > 0 THEN CAST(round(
      |      (1.0 * (1.0 - CAST(sprev9 AS DOUBLE) / 1e9)) *
      |      (CAST(d1 AS DOUBLE) - CAST(d1 + d2 AS DOUBLE) * CAST(n1 AS DOUBLE) /
      |        (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))) * 1e9) AS BIGINT)
      |    ELSE 0 END AS t9,
      |    CASE WHEN d1 + d2 > 0 AND n1 + n2 > 1 THEN CAST(round(
      |      (1.0 * (1.0 - CAST(sprev9 AS DOUBLE) / 1e9)) *
      |      (1.0 * (1.0 - CAST(sprev9 AS DOUBLE) / 1e9)) *
      |      (CAST(d1 + d2 AS DOUBLE) *
      |        (CAST(n1 AS DOUBLE) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))) *
      |        (CAST(n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))) *
      |        ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - CAST(d1 + d2 AS DOUBLE)) /
      |        ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - 1.0)) * 1e9) AS BIGINT)
      |    ELSE 0 END AS v9
      |  FROM wgt),
      |s AS (SELECT grp_lo, grp_hi,
      |    CAST(sum(d1 + c1) AS BIGINT) AS n_lo,
      |    CAST(sum(d2 + c2) AS BIGINT) AS n_hi,
      |    sum(CAST(t9 AS HUGEINT)) AS t9s, sum(CAST(v9 AS HUGEINT)) AS v9s
      |  FROM terms GROUP BY 1, 2)
      |SELECT grp_lo, grp_hi, CAST(2 AS BIGINT) AS n_groups,
      |  CAST(0 AS BIGINT) AS rho, CAST(1 AS BIGINT) AS gamma, n_lo, n_hi,
      |  CAST(t9s AS VARCHAR) AS wdev_9, CAST(v9s AS VARCHAR) AS wvar_9,
      |  CASE WHEN v9s > 0 THEN round((CAST(t9s AS DOUBLE) / 1e9) /
      |    sqrt(CAST(v9s AS DOUBLE) / 1e9), 9) END AS z,
      |  CASE WHEN v9s > 0 THEN round(
      |    ((CAST(t9s AS DOUBLE) / 1e9) / sqrt(CAST(v9s AS DOUBLE) / 1e9)) *
      |    ((CAST(t9s AS DOUBLE) / 1e9) / sqrt(CAST(v9s AS DOUBLE) / 1e9)), 9)
      |  END AS chi2
      |FROM s""".stripMargin

  /** q320 oracle: [[graft.quality.Association.brunnerMunzel]] replayed
    * — pooled + within-group doubled midranks, the exact A_i variance
    * numerators, BM/df/p̂ in the Spark dag's float order.
    */
  private lazy val brunnerMunzelOracle: String =
    """WITH e AS (SELECT event_type AS grp, CAST(round(value * 1000) AS BIGINT) AS v
      |  FROM events WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
      |cells AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
      |vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY 1),
      |rk AS (SELECT v, 2 * coalesce(sum(t) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS r2
      |  FROM vals),
      |wq AS (SELECT cells.grp, cells.v, cells.c,
      |    2 * coalesce(sum(cells.c) OVER (PARTITION BY cells.grp ORDER BY cells.v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cells.c + 1 AS r2i,
      |    rk.r2
      |  FROM cells JOIN rk ON cells.v = rk.v),
      |wg AS (SELECT *,
      |    CAST(sum(c) OVER (PARTITION BY grp) AS BIGINT) AS ng,
      |    sum(CAST(c AS HUGEINT) * (r2 - r2i)) OVER (PARTITION BY grp) AS t2
      |  FROM wq),
      |ga AS (SELECT grp, max(ng) AS n,
      |    sum(CAST(c AS HUGEINT) * r2) AS r2sum,
      |    sum(CAST(c AS HUGEINT) *
      |      (CAST(ng AS HUGEINT) * (r2 - r2i) - t2) *
      |      (CAST(ng AS HUGEINT) * (r2 - r2i) - t2)) AS a
      |  FROM wg GROUP BY 1),
      |wide AS (SELECT
      |    max(CASE WHEN grp = 'click' THEN n END) AS n1,
      |    max(CASE WHEN grp = 'click' THEN r2sum END) AS rs1,
      |    max(CASE WHEN grp = 'click' THEN a END) AS a1,
      |    max(CASE WHEN grp = 'view' THEN n END) AS n2,
      |    max(CASE WHEN grp = 'view' THEN r2sum END) AS rs2,
      |    max(CASE WHEN grp = 'view' THEN a END) AS a2
      |  FROM ga),
      |f AS (SELECT *,
      |    CAST(a1 AS DOUBLE) / (4.0 * CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0))
      |      AS ns1,
      |    CAST(a2 AS DOUBLE) / (4.0 * CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0))
      |      AS ns2,
      |    CAST(n1 AS HUGEINT) * rs2 - CAST(n2 AS HUGEINT) * rs1 AS num
      |  FROM wide)
      |SELECT 'click' AS grp_lo, 'view' AS grp_hi, CAST(2 AS BIGINT) AS n_groups,
      |  n1 AS n_lo, n2 AS n_hi,
      |  round(CAST(rs2 - CAST(n2 AS HUGEINT) * (n2 + 1) AS DOUBLE) /
      |    (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 9) AS p_hat,
      |  CAST(a1 AS VARCHAR) AS a_lo, CAST(a2 AS VARCHAR) AS a_hi,
      |  round((CAST(num AS DOUBLE) / 2) /
      |    ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) * sqrt(ns1 + ns2)), 9) AS bm,
      |  round((ns1 + ns2) * (ns1 + ns2) /
      |    (ns1 * ns1 / (CAST(n1 AS DOUBLE) - 1.0) +
      |     ns2 * ns2 / (CAST(n2 AS DOUBLE) - 1.0)), 9) AS df
      |FROM f""".stripMargin

  /** q321 oracle: [[graft.quality.Association.moodMedian]] replayed —
    * exact lower-median selection on the value cells, per-type
    * above/≤ counts, nano χ² terms.
    */
  private lazy val moodMedianOracle: String =
    """WITH e AS (SELECT event_type AS grp, CAST(round(value * 1000) AS BIGINT) AS v
      |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
      |cells AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
      |vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY 1),
      |cm AS (SELECT v, sum(t) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(t) OVER () AS nt FROM vals),
      |med AS (SELECT min(CASE WHEN 2 * cum >= nt THEN v END) AS median FROM cm),
      |pg AS (SELECT grp, med.median, CAST(sum(c) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN v > med.median THEN c ELSE 0 END) AS BIGINT) AS n_above
      |  FROM cells, med GROUP BY 1, 2),
      |t AS (SELECT *, CAST(count(*) OVER () AS BIGINT) AS k,
      |    CAST(sum(n) OVER () AS BIGINT) AS nt,
      |    CAST(sum(n_above) OVER () AS BIGINT) AS at FROM pg),
      |u AS (SELECT *,
      |    CASE WHEN at > 0 AND at < nt THEN CAST(round(
      |      ((CAST(n_above AS DOUBLE) -
      |          CAST(n AS DOUBLE) * CAST(at AS DOUBLE) / CAST(nt AS DOUBLE)) *
      |        (CAST(n_above AS DOUBLE) -
      |          CAST(n AS DOUBLE) * CAST(at AS DOUBLE) / CAST(nt AS DOUBLE)) /
      |        (CAST(n AS DOUBLE) * CAST(at AS DOUBLE) / CAST(nt AS DOUBLE)) +
      |       (CAST(n - n_above AS DOUBLE) -
      |          CAST(n AS DOUBLE) * (CAST(nt AS DOUBLE) - CAST(at AS DOUBLE)) /
      |            CAST(nt AS DOUBLE)) *
      |        (CAST(n - n_above AS DOUBLE) -
      |          CAST(n AS DOUBLE) * (CAST(nt AS DOUBLE) - CAST(at AS DOUBLE)) /
      |            CAST(nt AS DOUBLE)) /
      |        (CAST(n AS DOUBLE) * (CAST(nt AS DOUBLE) - CAST(at AS DOUBLE)) /
      |          CAST(nt AS DOUBLE))) * 1e9) AS BIGINT)
      |    ELSE 0 END AS t9
      |  FROM t),
      |w AS (SELECT *, sum(CAST(t9 AS HUGEINT)) OVER () AS chi9 FROM u)
      |SELECT grp, median, n, n_above,
      |  CASE WHEN k >= 2 AND at > 0 AND at < nt
      |    THEN round(CAST(chi9 AS DOUBLE) / 1e9, 9) END AS chi2,
      |  CASE WHEN k >= 2 THEN k - 1 END AS df
      |FROM w ORDER BY grp""".stripMargin

  /** q322 oracle: [[graft.operators.Survival.logRankTrend]] replayed —
    * the mod-3 cohorts, row_number scores, the dense (t × cohort) grid
    * with reverse-cumulative at-risk, per-time nano deviation and
    * score-variance terms in the Spark dag's float order.
    */
  private lazy val logRankTrendOracle: String =
    s"""$SurvivalSubjCte,
      |cells AS (SELECT CAST(user_id % 3 AS VARCHAR) AS grp, t,
      |    CAST(sum(ev) AS BIGINT) AS d, CAST(sum(1 - ev) AS BIGINT) AS c
      |  FROM subj GROUP BY 1, 2),
      |grps AS (SELECT grp, CAST(row_number() OVER (ORDER BY grp) AS BIGINT) AS sc
      |  FROM (SELECT DISTINCT grp FROM cells)),
      |tu AS (SELECT DISTINCT t FROM cells),
      |dense AS (SELECT g.grp, g.sc, tu.t,
      |    coalesce(cells.d, 0) AS d, coalesce(cells.c, 0) AS c
      |  FROM grps g CROSS JOIN tu
      |  LEFT JOIN cells ON g.grp = cells.grp AND tu.t = cells.t),
      |risk AS (SELECT *,
      |    CAST(sum(d + c) OVER (PARTITION BY grp ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS ng
      |  FROM dense),
      |pt AS (SELECT t, CAST(sum(d) AS BIGINT) AS dt, CAST(sum(ng) AS BIGINT) AS nt,
      |    CAST(sum(CAST(sc AS HUGEINT) * d) AS HUGEINT) AS cd,
      |    CAST(sum(CAST(sc AS HUGEINT) * ng) AS HUGEINT) AS cn,
      |    CAST(sum(CAST(sc AS HUGEINT) * sc * ng) AS HUGEINT) AS ccn
      |  FROM risk GROUP BY 1),
      |terms AS (SELECT *,
      |    CASE WHEN dt > 0 THEN CAST(round((CAST(cd AS DOUBLE) -
      |      CAST(dt AS DOUBLE) * CAST(cn AS DOUBLE) / CAST(nt AS DOUBLE)) * 1e9)
      |      AS BIGINT) ELSE 0 END AS t9,
      |    CASE WHEN dt > 0 AND nt > 1 THEN CAST(round(
      |      CAST(dt AS DOUBLE) * (CAST(nt AS DOUBLE) - CAST(dt AS DOUBLE)) /
      |        (CAST(nt AS DOUBLE) - 1.0) *
      |      (CAST(ccn AS DOUBLE) / CAST(nt AS DOUBLE) -
      |        (CAST(cn AS DOUBLE) / CAST(nt AS DOUBLE)) *
      |        (CAST(cn AS DOUBLE) / CAST(nt AS DOUBLE))) * 1e9) AS BIGINT)
      |    ELSE 0 END AS v9
      |  FROM pt),
      |s AS (SELECT CAST(max(nt) AS BIGINT) AS n_total,
      |    sum(CAST(t9 AS HUGEINT)) AS t9s, sum(CAST(v9 AS HUGEINT)) AS v9s
      |  FROM terms)
      |SELECT CAST(3 AS BIGINT) AS n_groups, n_total,
      |  CAST(t9s AS VARCHAR) AS tdev_9, CAST(v9s AS VARCHAR) AS tvar_9,
      |  CASE WHEN v9s > 0 THEN round((CAST(t9s AS DOUBLE) / 1e9) /
      |    sqrt(CAST(v9s AS DOUBLE) / 1e9), 9) END AS z,
      |  CASE WHEN v9s > 0 THEN round(
      |    ((CAST(t9s AS DOUBLE) / 1e9) / sqrt(CAST(v9s AS DOUBLE) / 1e9)) *
      |    ((CAST(t9s AS DOUBLE) / 1e9) / sqrt(CAST(v9s AS DOUBLE) / 1e9)), 9)
      |  END AS chi2
      |FROM s""".stripMargin

  /** q323 oracle: [[graft.quality.SequentialTests.alwaysValidCiTwoProportion]]
    * replayed — the q299 cumulative count CTEs, the pooled-p variance,
    * the CI radius in the Spark dag's float order (τ² = 2⁻¹²,
    * α = 0.05).
    */
  private lazy val avCiTwoPropOracle: String =
    """WITH ev AS (SELECT event_id % 12 AS peek,
      |    user_id % 2 = 0 AS ev_even,
      |    CASE WHEN value >= 250 THEN 1 ELSE 0 END AS hit
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
      |incr AS (SELECT peek,
      |    CAST(sum(CASE WHEN ev_even THEN 1 ELSE 0 END) AS BIGINT) AS bn1,
      |    CAST(sum(CASE WHEN ev_even THEN hit ELSE 0 END) AS BIGINT) AS bs1,
      |    CAST(sum(CASE WHEN NOT ev_even THEN 1 ELSE 0 END) AS BIGINT) AS bn2,
      |    CAST(sum(CASE WHEN NOT ev_even THEN hit ELSE 0 END) AS BIGINT) AS bs2
      |  FROM ev GROUP BY 1),
      |cum AS (SELECT peek,
      |    CAST(sum(bn1) OVER w AS BIGINT) AS n_lo,
      |    CAST(sum(bs1) OVER w AS BIGINT) AS s_lo,
      |    CAST(sum(bn2) OVER w AS BIGINT) AS n_hi,
      |    CAST(sum(bs2) OVER w AS BIGINT) AS s_hi
      |  FROM incr
      |  WINDOW w AS (ORDER BY peek ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |t AS (SELECT *,
      |    CAST(CAST(s_lo AS HUGEINT) * n_hi - CAST(s_hi AS HUGEINT) * n_lo AS DOUBLE) /
      |      (CAST(n_lo AS DOUBLE) * CAST(n_hi AS DOUBLE)) AS delta,
      |    (CAST(s_lo + s_hi AS DOUBLE) / CAST(n_lo + n_hi AS DOUBLE)) *
      |      (1.0 - CAST(s_lo + s_hi AS DOUBLE) / CAST(n_lo + n_hi AS DOUBLE)) *
      |      (1.0 / CAST(n_lo AS DOUBLE) + 1.0 / CAST(n_hi AS DOUBLE)) AS vv,
      |    n_lo > 0 AND n_hi > 0 AND s_lo + s_hi > 0 AND s_lo + s_hi < n_lo + n_hi
      |      AS usable
      |  FROM cum),
      |r AS (SELECT *,
      |    sqrt(vv * (vv + 0.000244140625) / 0.000244140625 *
      |      ln((vv + 0.000244140625) / (0.05 * 0.05 * vv))) AS radius
      |  FROM t)
      |SELECT peek, n_lo, s_lo, n_hi, s_hi,
      |  CASE WHEN usable THEN round(delta, 9) END AS delta,
      |  CASE WHEN usable THEN round(radius, 9) END AS radius,
      |  CASE WHEN usable THEN round(delta - radius, 9) END AS ci_lo,
      |  CASE WHEN usable THEN round(delta + radius, 9) END AS ci_hi
      |FROM r ORDER BY peek""".stripMargin

  /** q374 oracle: [[graft.quality.SequentialTests.msprtTwoRate]]
    * replayed — arm-dependent incident thresholds, cumulative
    * exposure/count sums, the exact-cross-product rate difference, the
    * pooled-λ Poisson plug-in variance, the nano mixture-LR dag,
    * running best, the exact ln(20) boundary.
    */
  private lazy val msprtRateOracle: String =
    """WITH ev AS (SELECT event_id % 12 AS peek,
      |    user_id % 2 = 0 AS ev_even, value
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
      |incr AS (SELECT peek,
      |    CAST(sum(CASE WHEN ev_even THEN 1 ELSE 0 END) AS BIGINT) AS be1,
      |    CAST(sum(CASE WHEN ev_even AND value >= 150 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS bc1,
      |    CAST(sum(CASE WHEN NOT ev_even THEN 1 ELSE 0 END) AS BIGINT) AS be2,
      |    CAST(sum(CASE WHEN NOT ev_even AND value >= 170 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS bc2
      |  FROM ev GROUP BY 1),
      |cum AS (SELECT peek,
      |    CAST(sum(be1) OVER w AS BIGINT) AS e_lo,
      |    CAST(sum(bc1) OVER w AS BIGINT) AS c_lo,
      |    CAST(sum(be2) OVER w AS BIGINT) AS e_hi,
      |    CAST(sum(bc2) OVER w AS BIGINT) AS c_hi
      |  FROM incr
      |  WINDOW w AS (ORDER BY peek ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |t AS (SELECT *,
      |    CAST(CAST(c_lo AS HUGEINT) * e_hi - CAST(c_hi AS HUGEINT) * e_lo AS DOUBLE) /
      |      (CAST(e_lo AS DOUBLE) * CAST(e_hi AS DOUBLE)) AS delta,
      |    (CAST(c_lo AS DOUBLE) + CAST(c_hi AS DOUBLE)) /
      |      (CAST(e_lo AS DOUBLE) + CAST(e_hi AS DOUBLE)) AS lam,
      |    e_lo > 0 AND e_hi > 0 AND (c_lo + c_hi) > 0 AS usable
      |  FROM cum),
      |v AS (SELECT *,
      |    lam * (1.0 / CAST(e_lo AS DOUBLE) + 1.0 / CAST(e_hi AS DOUBLE)) AS vv
      |  FROM t),
      |l AS (SELECT *,
      |    CASE WHEN usable THEN CAST(round((0.5 * ln(vv / (vv + 0.000244140625)) +
      |      delta * delta * 0.000244140625 /
      |        (2 * vv * (vv + 0.000244140625))) * 1e9) AS BIGINT) END AS ln_lr9
      |  FROM v),
      |b AS (SELECT *, max(ln_lr9) OVER (ORDER BY peek
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS best9 FROM l)
      |SELECT peek, e_lo, c_lo, e_hi, c_hi,
      |  CASE WHEN usable THEN round(delta, 9) END AS delta, ln_lr9,
      |  round(CASE WHEN best9 IS NULL OR best9 <= 0 THEN 1.0
      |    ELSE exp(-CAST(best9 AS DOUBLE) / 1e9) END, 9) AS p_always_valid,
      |  coalesce(best9 >= 2995732274, false) AS reject
      |FROM b ORDER BY peek""".stripMargin

  /** q375 oracle: [[graft.quality.SequentialTests.alwaysValidCiTwoRate]]
    * replayed — the q374 state and variance with the inversion radius
    * (the q323 dag on the pooled-λ plug-in).
    */
  private lazy val avCiRateOracle: String =
    """WITH ev AS (SELECT event_id % 12 AS peek,
      |    user_id % 2 = 0 AS ev_even, value
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
      |incr AS (SELECT peek,
      |    CAST(sum(CASE WHEN ev_even THEN 1 ELSE 0 END) AS BIGINT) AS be1,
      |    CAST(sum(CASE WHEN ev_even AND value >= 150 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS bc1,
      |    CAST(sum(CASE WHEN NOT ev_even THEN 1 ELSE 0 END) AS BIGINT) AS be2,
      |    CAST(sum(CASE WHEN NOT ev_even AND value >= 170 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS bc2
      |  FROM ev GROUP BY 1),
      |cum AS (SELECT peek,
      |    CAST(sum(be1) OVER w AS BIGINT) AS e_lo,
      |    CAST(sum(bc1) OVER w AS BIGINT) AS c_lo,
      |    CAST(sum(be2) OVER w AS BIGINT) AS e_hi,
      |    CAST(sum(bc2) OVER w AS BIGINT) AS c_hi
      |  FROM incr
      |  WINDOW w AS (ORDER BY peek ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |t AS (SELECT *,
      |    CAST(CAST(c_lo AS HUGEINT) * e_hi - CAST(c_hi AS HUGEINT) * e_lo AS DOUBLE) /
      |      (CAST(e_lo AS DOUBLE) * CAST(e_hi AS DOUBLE)) AS delta,
      |    (CAST(c_lo AS DOUBLE) + CAST(c_hi AS DOUBLE)) /
      |      (CAST(e_lo AS DOUBLE) + CAST(e_hi AS DOUBLE)) AS lam,
      |    e_lo > 0 AND e_hi > 0 AND (c_lo + c_hi) > 0 AS usable
      |  FROM cum),
      |v AS (SELECT *,
      |    lam * (1.0 / CAST(e_lo AS DOUBLE) + 1.0 / CAST(e_hi AS DOUBLE)) AS vv
      |  FROM t),
      |r AS (SELECT *,
      |    sqrt(vv * (vv + 0.000244140625) / 0.000244140625 *
      |      ln((vv + 0.000244140625) / (0.05 * 0.05 * vv))) AS radius
      |  FROM v)
      |SELECT peek, e_lo, c_lo, e_hi, c_hi,
      |  CASE WHEN usable THEN round(delta, 9) END AS delta,
      |  CASE WHEN usable THEN round(radius, 9) END AS radius,
      |  CASE WHEN usable THEN round(delta - radius, 9) END AS ci_lo,
      |  CASE WHEN usable THEN round(delta + radius, 9) END AS ci_hi
      |FROM r ORDER BY peek""".stripMargin

  /** q324 oracle: [[graft.quality.Association.wilsonInterval]] replayed
    * — exact per-type pass counts, the score-interval center/half in
    * the Spark dag's float order (z = 1.959964).
    */
  private lazy val wilsonCiOracle: String =
    """WITH e AS (SELECT event_type AS grp,
      |    CASE WHEN value >= 250 THEN 1 ELSE 0 END AS hit
      |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
      |c AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(hit) AS BIGINT) AS np FROM e GROUP BY 1),
      |f AS (SELECT *,
      |    CAST(np AS DOUBLE) / CAST(n AS DOUBLE) AS p,
      |    1.0 + (1.959964 * 1.959964) / CAST(n AS DOUBLE) AS dn
      |  FROM c),
      |g AS (SELECT *,
      |    (p + (1.959964 * 1.959964) / (2.0 * CAST(n AS DOUBLE))) / dn AS center,
      |    1.959964 * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE) +
      |      (1.959964 * 1.959964) /
      |        (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / dn AS half
      |  FROM f)
      |SELECT grp, n, np AS n_pass, round(p, 9) AS p_hat,
      |  round(center - half, 9) AS ci_lo, round(center + half, 9) AS ci_hi
      |FROM g ORDER BY grp""".stripMargin

  /** q325 oracle: [[graft.quality.Association.iccDesignEffect]]
    * replayed — per-user exact moments, nano S²/n terms, the one-way
    * ANOVA components and Kish deff in the Spark dag's float order.
    */
  private lazy val iccDeffOracle: String =
    """WITH e AS (SELECT user_id AS cl, CAST(floor(value) AS BIGINT) AS v
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
      |pc AS (SELECT cl, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(v) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS syy
      |  FROM e GROUP BY 1),
      |t AS (SELECT *, CAST(round(CAST(sy * sy AS DOUBLE) / CAST(n AS DOUBLE)
      |    * 1e9) AS BIGINT) AS sn9 FROM pc),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nt,
      |    sum(sy) AS syt, sum(syy) AS syyt,
      |    sum(CAST(n AS HUGEINT) * n) AS nn,
      |    sum(CAST(sn9 AS HUGEINT)) AS sn9t
      |  FROM t),
      |f AS (SELECT *, CAST(sn9t AS DOUBLE) / 1e9 AS snt,
      |    CAST(syt * syt AS DOUBLE) / CAST(nt AS DOUBLE) AS grand
      |  FROM a),
      |g AS (SELECT *,
      |    (snt - grand) / (CAST(k AS DOUBLE) - 1.0) AS msb,
      |    (CAST(syyt AS DOUBLE) - snt) /
      |      (CAST(nt AS DOUBLE) - CAST(k AS DOUBLE)) AS msw,
      |    (CAST(nt AS DOUBLE) - CAST(nn AS DOUBLE) / CAST(nt AS DOUBLE)) /
      |      (CAST(k AS DOUBLE) - 1.0) AS n0
      |  FROM f),
      |h AS (SELECT *, (msb - msw) / (msb + (n0 - 1.0) * msw) AS icc FROM g),
      |i AS (SELECT *,
      |    1.0 + (CAST(nt AS DOUBLE) / CAST(k AS DOUBLE) - 1.0) * icc AS deff
      |  FROM h)
      |SELECT nt AS n_total, k AS n_clusters, round(icc, 9) AS icc,
      |  round(deff, 9) AS deff,
      |  round(CAST(nt AS DOUBLE) / deff, 9) AS n_effective
      |FROM i""".stripMargin

  /** q326/q327 oracle: the ENTIRE composed A/B dashboard chain replayed
    * from raw events — per-user units (x/y even/odd event counts,
    * any-value≥250 conversion, the q306 broken decile split, 6 peeks),
    * per-(arm, peek) HUGEINT moment cells, the (arm × peek) spine,
    * cumulative windows per arm, then every stage in its gated dag's
    * float order: the q306 SRM nano χ² on cumulative designed counts +
    * off-design traffic, the q298 CUPED θ/effect/variance pivot on
    * cumulative moments, the q324 Wilson center/half per arm, and the
    * q299 mSPRT recursion (τ² = 2⁻¹², nano ln Λ, running-best max,
    * the ln(20) nano boundary 2995732274) on the per-peek increments.
    * q327's three-batch fold merges to identical cells, so the
    * from-store read shares this oracle verbatim.
    */
  private lazy val abDashboardOracle: String =
    """WITH pu AS (SELECT user_id,
      |    CASE WHEN user_id % 10 < 5 THEN 'A'
      |      WHEN user_id % 10 < 9 THEN 'B' ELSE 'C' END AS arm,
      |    CAST(user_id % 6 AS BIGINT) AS peek,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS y,
      |    CASE WHEN max(CASE WHEN value >= 250 THEN 1 ELSE 0 END) > 0
      |      THEN 1 ELSE 0 END AS hit
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |cells AS (SELECT arm, peek, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(hit) AS BIGINT) AS s_hit,
      |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      |  FROM pu GROUP BY 1, 2),
      |spine AS (SELECT a.arm, p.peek
      |  FROM (SELECT DISTINCT arm FROM cells) a
      |  CROSS JOIN (SELECT DISTINCT peek FROM cells) p),
      |fullc AS (SELECT sp.arm, sp.peek,
      |    coalesce(c.n, 0) AS n, coalesce(c.s_hit, 0) AS s_hit,
      |    coalesce(c.sx, 0) AS sx, coalesce(c.sy, 0) AS sy,
      |    coalesce(c.sxx, 0) AS sxx, coalesce(c.syy, 0) AS syy,
      |    coalesce(c.sxy, 0) AS sxy
      |  FROM spine sp LEFT JOIN cells c ON sp.arm = c.arm AND sp.peek = c.peek),
      |cum AS (SELECT arm, peek,
      |    CAST(sum(n) OVER w AS BIGINT) AS n,
      |    CAST(sum(s_hit) OVER w AS BIGINT) AS s_hit,
      |    CAST(sum(sx) OVER w AS HUGEINT) AS sx,
      |    CAST(sum(sy) OVER w AS HUGEINT) AS sy,
      |    CAST(sum(sxx) OVER w AS HUGEINT) AS sxx,
      |    CAST(sum(syy) OVER w AS HUGEINT) AS syy,
      |    CAST(sum(sxy) OVER w AS HUGEINT) AS sxy
      |  FROM fullc
      |  WINDOW w AS (PARTITION BY arm ORDER BY peek
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |srm AS (SELECT peek,
      |    CAST(sum(CASE WHEN arm NOT IN ('A','B') THEN n ELSE 0 END) AS BIGINT)
      |      AS n_unexpected,
      |    CAST(sum(CASE WHEN arm = 'A' THEN n ELSE 0 END) AS BIGINT) AS na,
      |    CAST(sum(CASE WHEN arm = 'B' THEN n ELSE 0 END) AS BIGINT) AS nb
      |  FROM cum GROUP BY 1),
      |srm2 AS (SELECT peek, n_unexpected,
      |    CAST(round((CAST(na AS DOUBLE) - CAST(na + nb AS DOUBLE) * 0.5) *
      |      (CAST(na AS DOUBLE) - CAST(na + nb AS DOUBLE) * 0.5) /
      |      (CAST(na + nb AS DOUBLE) * 0.5) * 1e9) AS BIGINT) +
      |    CAST(round((CAST(nb AS DOUBLE) - CAST(na + nb AS DOUBLE) * 0.5) *
      |      (CAST(nb AS DOUBLE) - CAST(na + nb AS DOUBLE) * 0.5) /
      |      (CAST(na + nb AS DOUBLE) * 0.5) * 1e9) AS BIGINT) AS chi9
      |  FROM srm),
      |wide AS (SELECT peek,
      |    max(CASE WHEN arm = 'A' THEN n END) AS n1,
      |    max(CASE WHEN arm = 'A' THEN sx END) AS sx1,
      |    max(CASE WHEN arm = 'A' THEN sy END) AS sy1,
      |    max(CASE WHEN arm = 'A' THEN sxx END) AS sxx1,
      |    max(CASE WHEN arm = 'A' THEN syy END) AS syy1,
      |    max(CASE WHEN arm = 'A' THEN sxy END) AS sxy1,
      |    max(CASE WHEN arm = 'B' THEN n END) AS n2,
      |    max(CASE WHEN arm = 'B' THEN sx END) AS sx2,
      |    max(CASE WHEN arm = 'B' THEN sy END) AS sy2,
      |    max(CASE WHEN arm = 'B' THEN sxx END) AS sxx2,
      |    max(CASE WHEN arm = 'B' THEN syy END) AS syy2,
      |    max(CASE WHEN arm = 'B' THEN sxy END) AS sxy2
      |  FROM cum WHERE arm IN ('A','B') GROUP BY 1),
      |c1 AS (SELECT *, CAST(n1 + n2 AS HUGEINT) AS nt,
      |    sx1 + sx2 AS sxt, sy1 + sy2 AS syt,
      |    sxx1 + sxx2 AS sxxt, syy1 + syy2 AS syyt, sxy1 + sxy2 AS sxyt
      |  FROM wide),
      |c2 AS (SELECT *,
      |    nt * sxyt - sxt * syt AS covnum,
      |    nt * sxxt - sxt * sxt AS varxnum,
      |    nt * syyt - syt * syt AS varynum
      |  FROM c1),
      |c3 AS (SELECT *,
      |    CAST(covnum AS DOUBLE) / CAST(varxnum AS DOUBLE) AS theta,
      |    CAST(sy1 * n2 - sy2 * n1 AS DOUBLE) /
      |      (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS raweff,
      |    CAST(sx1 * n2 - sx2 * n1 AS DOUBLE) AS xcross
      |  FROM c2),
      |c4 AS (SELECT *,
      |    raweff - theta * xcross / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS adjeff,
      |    (CAST(n1 AS DOUBLE) * (CAST(syy1 AS DOUBLE) - 2 * theta * CAST(sxy1 AS DOUBLE) +
      |        theta * theta * CAST(sxx1 AS DOUBLE)) -
      |      (CAST(sy1 AS DOUBLE) - theta * CAST(sx1 AS DOUBLE)) *
      |      (CAST(sy1 AS DOUBLE) - theta * CAST(sx1 AS DOUBLE))) /
      |      (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) AS v1,
      |    (CAST(n2 AS DOUBLE) * (CAST(syy2 AS DOUBLE) - 2 * theta * CAST(sxy2 AS DOUBLE) +
      |        theta * theta * CAST(sxx2 AS DOUBLE)) -
      |      (CAST(sy2 AS DOUBLE) - theta * CAST(sx2 AS DOUBLE)) *
      |      (CAST(sy2 AS DOUBLE) - theta * CAST(sx2 AS DOUBLE))) /
      |      (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)) AS v2,
      |    CAST(covnum AS DOUBLE) * CAST(covnum AS DOUBLE) /
      |      (CAST(varxnum AS DOUBLE) * CAST(varynum AS DOUBLE)) AS rho2
      |  FROM c3),
      |cup AS (SELECT *, sqrt(v1 + v2) AS se FROM c4),
      |wil AS (SELECT peek, arm, n, s_hit,
      |    CAST(s_hit AS DOUBLE) / CAST(n AS DOUBLE) AS p,
      |    1.0 + (1.959964 * 1.959964) / CAST(n AS DOUBLE) AS dn
      |  FROM cum WHERE arm IN ('A','B')),
      |wil2 AS (SELECT *,
      |    (p + (1.959964 * 1.959964) / (2.0 * CAST(n AS DOUBLE))) / dn AS center,
      |    1.959964 * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE) +
      |      (1.959964 * 1.959964) /
      |        (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / dn AS half
      |  FROM wil),
      |wilw AS (SELECT peek,
      |    max(CASE WHEN arm = 'A' THEN p END) AS p_lo,
      |    max(CASE WHEN arm = 'A' THEN center - half END) AS wlo_lo,
      |    max(CASE WHEN arm = 'A' THEN center + half END) AS wlo_hi,
      |    max(CASE WHEN arm = 'B' THEN p END) AS p_hi,
      |    max(CASE WHEN arm = 'B' THEN center - half END) AS whi_lo,
      |    max(CASE WHEN arm = 'B' THEN center + half END) AS whi_hi
      |  FROM wil2 GROUP BY 1),
      |mincr AS (SELECT peek,
      |    CAST(sum(CASE WHEN arm = 'A' THEN n ELSE 0 END) AS BIGINT) AS bn1,
      |    CAST(sum(CASE WHEN arm = 'A' THEN s_hit ELSE 0 END) AS BIGINT) AS bs1,
      |    CAST(sum(CASE WHEN arm = 'B' THEN n ELSE 0 END) AS BIGINT) AS bn2,
      |    CAST(sum(CASE WHEN arm = 'B' THEN s_hit ELSE 0 END) AS BIGINT) AS bs2
      |  FROM fullc WHERE arm IN ('A','B') GROUP BY 1),
      |mt AS (SELECT peek,
      |    CAST(sum(bn1) OVER w AS BIGINT) AS n_lo,
      |    CAST(sum(bs1) OVER w AS BIGINT) AS s_lo,
      |    CAST(sum(bn2) OVER w AS BIGINT) AS n_hi,
      |    CAST(sum(bs2) OVER w AS BIGINT) AS s_hi
      |  FROM mincr
      |  WINDOW w AS (ORDER BY peek ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |mv AS (SELECT *,
      |    CAST(CAST(s_lo AS HUGEINT) * n_hi - CAST(s_hi AS HUGEINT) * n_lo AS DOUBLE) /
      |      (CAST(n_lo AS DOUBLE) * CAST(n_hi AS DOUBLE)) AS delta,
      |    (CAST(s_lo AS DOUBLE) + CAST(s_hi AS DOUBLE)) /
      |      (CAST(n_lo AS DOUBLE) + CAST(n_hi AS DOUBLE)) AS pp,
      |    n_lo > 0 AND n_hi > 0 AND (s_lo + s_hi) > 0 AND
      |      (s_lo + s_hi) < (n_lo + n_hi) AS usable
      |  FROM mt),
      |ml AS (SELECT *,
      |    pp * (1 - pp) * (1.0 / CAST(n_lo AS DOUBLE) + 1.0 / CAST(n_hi AS DOUBLE)) AS vv
      |  FROM mv),
      |mr AS (SELECT *,
      |    CASE WHEN usable THEN CAST(round((0.5 * ln(vv / (vv + 0.000244140625)) +
      |      delta * delta * 0.000244140625 /
      |        (2 * vv * (vv + 0.000244140625))) * 1e9) AS BIGINT) END AS ln_lr9
      |  FROM ml),
      |mb AS (SELECT *, max(ln_lr9) OVER (ORDER BY peek
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS best9 FROM mr)
      |SELECT m.peek, m.n_lo, m.s_lo, m.n_hi, m.s_hi,
      |  s.n_unexpected,
      |  round(CAST(s.chi9 AS DOUBLE) / 1e9, 9) AS srm_chi2,
      |  round(c.theta, 9) AS theta, round(c.rho2, 9) AS rho2,
      |  round(c.raweff, 9) AS effect_raw, round(c.adjeff, 9) AS effect_cuped,
      |  round(c.se, 9) AS se_cuped,
      |  round(c.adjeff - 1.959964 * c.se, 9) AS cuped_ci_lo,
      |  round(c.adjeff + 1.959964 * c.se, 9) AS cuped_ci_hi,
      |  round(w.p_lo, 9) AS p_lo,
      |  round(w.wlo_lo, 9) AS wilson_lo_lo, round(w.wlo_hi, 9) AS wilson_lo_hi,
      |  round(w.p_hi, 9) AS p_hi,
      |  round(w.whi_lo, 9) AS wilson_hi_lo, round(w.whi_hi, 9) AS wilson_hi_hi,
      |  CASE WHEN m.usable THEN round(m.delta, 9) END AS delta, m.ln_lr9,
      |  round(CASE WHEN m.best9 IS NULL OR m.best9 <= 0 THEN 1.0
      |    ELSE exp(-CAST(m.best9 AS DOUBLE) / 1e9) END, 9) AS p_always_valid,
      |  coalesce(m.best9 >= 2995732274, false) AS reject
      |FROM mb m
      |JOIN srm2 s ON m.peek = s.peek
      |JOIN cup c ON m.peek = c.peek
      |JOIN wilw w ON m.peek = w.peek
      |ORDER BY m.peek""".stripMargin

  /** q364 oracle: the vector-CUPED k-arm dashboard replayed from raw
    * events — the q345 chain (per-user units, two-covariate moment
    * cells, spine, cumulative windows, k-arm SRM, Wilson, per-cmp
    * mSPRT, BH) with the CUPED stage replaced by the q347 exact-Cramer
    * two-covariate solve per (cmp, peek), guards included (cok needs
    * det > 0 and both n ≥ 2).
    */
  private lazy val abKArm2Oracle: String =
    """WITH pu0 AS (SELECT user_id,
      |    CASE WHEN user_id % 20 < 8 THEN 'A'
      |      WHEN user_id % 20 < 14 THEN 'B'
      |      WHEN user_id % 20 < 18 THEN 'C'
      |      WHEN user_id % 20 < 19 THEN 'D' ELSE 'E' END AS arm,
      |    CAST(user_id % 6 AS BIGINT) AS peek,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS x1,
      |    CAST(sum(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS y,
      |    CAST(count(DISTINCT CASE WHEN ts IS NOT NULL
      |      THEN CAST(floor(epoch(ts) / 3600) AS BIGINT) END) AS BIGINT) AS x2,
      |    max(value) AS maxv
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |pu AS (SELECT arm, peek, x1, x2, y,
      |    CASE WHEN coalesce(maxv >= CASE WHEN arm = 'B' THEN 200.0
      |      WHEN arm = 'D' THEN 300.0 ELSE 250.0 END, false)
      |      THEN 1 ELSE 0 END AS hit
      |  FROM pu0),
      |cells AS (SELECT arm, peek, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(hit) AS BIGINT) AS s_hit,
      |    CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
      |    CAST(sum(x1) AS HUGEINT) AS sx1, CAST(sum(x2) AS HUGEINT) AS sx2,
      |    CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS sx1x1,
      |    CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS sx2x2,
      |    CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS sx1x2,
      |    CAST(sum(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS sx1y,
      |    CAST(sum(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS sx2y
      |  FROM pu GROUP BY 1, 2),
      |spine AS (SELECT a.arm, p.peek
      |  FROM (SELECT DISTINCT arm FROM cells) a
      |  CROSS JOIN (SELECT DISTINCT peek FROM cells) p),
      |fullc AS (SELECT sp.arm, sp.peek,
      |    coalesce(c.n, 0) AS n, coalesce(c.s_hit, 0) AS s_hit,
      |    coalesce(c.sy, 0) AS sy, coalesce(c.syy, 0) AS syy,
      |    coalesce(c.sx1, 0) AS sx1, coalesce(c.sx2, 0) AS sx2,
      |    coalesce(c.sx1x1, 0) AS sx1x1, coalesce(c.sx2x2, 0) AS sx2x2,
      |    coalesce(c.sx1x2, 0) AS sx1x2,
      |    coalesce(c.sx1y, 0) AS sx1y, coalesce(c.sx2y, 0) AS sx2y
      |  FROM spine sp LEFT JOIN cells c ON sp.arm = c.arm AND sp.peek = c.peek),
      |cum AS (SELECT arm, peek,
      |    CAST(sum(n) OVER w AS BIGINT) AS n,
      |    CAST(sum(s_hit) OVER w AS BIGINT) AS s_hit,
      |    CAST(sum(sy) OVER w AS HUGEINT) AS sy,
      |    CAST(sum(syy) OVER w AS HUGEINT) AS syy,
      |    CAST(sum(sx1) OVER w AS HUGEINT) AS sx1,
      |    CAST(sum(sx2) OVER w AS HUGEINT) AS sx2,
      |    CAST(sum(sx1x1) OVER w AS HUGEINT) AS sx1x1,
      |    CAST(sum(sx2x2) OVER w AS HUGEINT) AS sx2x2,
      |    CAST(sum(sx1x2) OVER w AS HUGEINT) AS sx1x2,
      |    CAST(sum(sx1y) OVER w AS HUGEINT) AS sx1y,
      |    CAST(sum(sx2y) OVER w AS HUGEINT) AS sx2y
      |  FROM fullc
      |  WINDOW w AS (PARTITION BY arm ORDER BY peek
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |srm AS (SELECT peek,
      |    CAST(sum(CASE WHEN arm NOT IN ('A','B','C','D') THEN n ELSE 0 END)
      |      AS BIGINT) AS n_unexpected,
      |    CAST(sum(CASE WHEN arm IN ('A','B','C','D') THEN n ELSE 0 END)
      |      AS DOUBLE) AS nd,
      |    max(CASE WHEN arm = 'A' THEN n END) AS na,
      |    max(CASE WHEN arm = 'B' THEN n END) AS nb,
      |    max(CASE WHEN arm = 'C' THEN n END) AS nc,
      |    max(CASE WHEN arm = 'D' THEN n END) AS ndd
      |  FROM cum GROUP BY 1),
      |srm2 AS (SELECT peek, n_unexpected,
      |    CAST(round((CAST(na AS DOUBLE) - nd * 0.4) *
      |      (CAST(na AS DOUBLE) - nd * 0.4) / (nd * 0.4) * 1e9) AS BIGINT) +
      |    CAST(round((CAST(nb AS DOUBLE) - nd * 0.3) *
      |      (CAST(nb AS DOUBLE) - nd * 0.3) / (nd * 0.3) * 1e9) AS BIGINT) +
      |    CAST(round((CAST(nc AS DOUBLE) - nd * 0.2) *
      |      (CAST(nc AS DOUBLE) - nd * 0.2) / (nd * 0.2) * 1e9) AS BIGINT) +
      |    CAST(round((CAST(ndd AS DOUBLE) - nd * 0.1) *
      |      (CAST(ndd AS DOUBLE) - nd * 0.1) / (nd * 0.1) * 1e9) AS BIGINT) AS chi9
      |  FROM srm),
      |cmpm AS (SELECT * FROM (VALUES ('B'), ('C'), ('D')) t(cmp)),
      |wide AS (SELECT m.cmp, c.peek,
      |    max(CASE WHEN c.arm = 'A' THEN c.n END) AS n1,
      |    max(CASE WHEN c.arm = 'A' THEN c.sy END) AS sy1,
      |    max(CASE WHEN c.arm = 'A' THEN c.syy END) AS syy1,
      |    max(CASE WHEN c.arm = 'A' THEN c.sx1 END) AS sx11,
      |    max(CASE WHEN c.arm = 'A' THEN c.sx2 END) AS sx21,
      |    max(CASE WHEN c.arm = 'A' THEN c.sx1x1 END) AS sx1x11,
      |    max(CASE WHEN c.arm = 'A' THEN c.sx2x2 END) AS sx2x21,
      |    max(CASE WHEN c.arm = 'A' THEN c.sx1x2 END) AS sx1x21,
      |    max(CASE WHEN c.arm = 'A' THEN c.sx1y END) AS sx1y1,
      |    max(CASE WHEN c.arm = 'A' THEN c.sx2y END) AS sx2y1,
      |    max(CASE WHEN c.arm <> 'A' THEN c.n END) AS n2,
      |    max(CASE WHEN c.arm <> 'A' THEN c.sy END) AS sy2,
      |    max(CASE WHEN c.arm <> 'A' THEN c.syy END) AS syy2,
      |    max(CASE WHEN c.arm <> 'A' THEN c.sx1 END) AS sx12,
      |    max(CASE WHEN c.arm <> 'A' THEN c.sx2 END) AS sx22,
      |    max(CASE WHEN c.arm <> 'A' THEN c.sx1x1 END) AS sx1x12,
      |    max(CASE WHEN c.arm <> 'A' THEN c.sx2x2 END) AS sx2x22,
      |    max(CASE WHEN c.arm <> 'A' THEN c.sx1x2 END) AS sx1x22,
      |    max(CASE WHEN c.arm <> 'A' THEN c.sx1y END) AS sx1y2,
      |    max(CASE WHEN c.arm <> 'A' THEN c.sx2y END) AS sx2y2
      |  FROM cum c JOIN cmpm m ON c.arm = m.cmp OR c.arm = 'A'
      |  GROUP BY 1, 2),
      |c1 AS (SELECT *, CAST(n1 + n2 AS HUGEINT) AS nt,
      |    sy1 + sy2 AS syt, syy1 + syy2 AS syyt,
      |    sx11 + sx12 AS sx1t, sx21 + sx22 AS sx2t,
      |    sx1x11 + sx1x12 AS sx1x1t, sx2x21 + sx2x22 AS sx2x2t,
      |    sx1x21 + sx1x22 AS sx1x2t,
      |    sx1y1 + sx1y2 AS sx1yt, sx2y1 + sx2y2 AS sx2yt
      |  FROM wide),
      |c2 AS (SELECT *,
      |    nt * sx1x1t - sx1t * sx1t AS a11,
      |    nt * sx2x2t - sx2t * sx2t AS a22,
      |    nt * sx1x2t - sx1t * sx2t AS a12,
      |    nt * sx1yt - sx1t * syt AS b1,
      |    nt * sx2yt - sx2t * syt AS b2,
      |    nt * syyt - syt * syt AS varynum
      |  FROM c1),
      |c3 AS (SELECT *,
      |    CAST(a11 AS DOUBLE) * CAST(a22 AS DOUBLE) -
      |      CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE) AS det
      |  FROM c2),
      |c4 AS (SELECT *,
      |    (CAST(a22 AS DOUBLE) * CAST(b1 AS DOUBLE) -
      |      CAST(a12 AS DOUBLE) * CAST(b2 AS DOUBLE)) / det AS theta1,
      |    (CAST(a11 AS DOUBLE) * CAST(b2 AS DOUBLE) -
      |      CAST(a12 AS DOUBLE) * CAST(b1 AS DOUBLE)) / det AS theta2,
      |    CAST(sy1 * n2 - sy2 * n1 AS DOUBLE) /
      |      (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS rawy,
      |    CAST(sx11 * n2 - sx12 * n1 AS DOUBLE) /
      |      (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS rawx1,
      |    CAST(sx21 * n2 - sx22 * n1 AS DOUBLE) /
      |      (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS rawx2
      |  FROM c3),
      |c5 AS (SELECT *,
      |    rawy - theta1 * rawx1 - theta2 * rawx2 AS adjeff,
      |    CAST(syy1 AS DOUBLE) + theta1 * theta1 * CAST(sx1x11 AS DOUBLE) +
      |      theta2 * theta2 * CAST(sx2x21 AS DOUBLE) +
      |      2 * theta1 * theta2 * CAST(sx1x21 AS DOUBLE) -
      |      2 * theta1 * CAST(sx1y1 AS DOUBLE) -
      |      2 * theta2 * CAST(sx2y1 AS DOUBLE) AS szz1,
      |    CAST(sy1 AS DOUBLE) - theta1 * CAST(sx11 AS DOUBLE) -
      |      theta2 * CAST(sx21 AS DOUBLE) AS sz1,
      |    CAST(syy2 AS DOUBLE) + theta1 * theta1 * CAST(sx1x12 AS DOUBLE) +
      |      theta2 * theta2 * CAST(sx2x22 AS DOUBLE) +
      |      2 * theta1 * theta2 * CAST(sx1x22 AS DOUBLE) -
      |      2 * theta1 * CAST(sx1y2 AS DOUBLE) -
      |      2 * theta2 * CAST(sx2y2 AS DOUBLE) AS szz2,
      |    CAST(sy2 AS DOUBLE) - theta1 * CAST(sx12 AS DOUBLE) -
      |      theta2 * CAST(sx22 AS DOUBLE) AS sz2
      |  FROM c4),
      |c6 AS (SELECT *,
      |    (CAST(n1 AS DOUBLE) * szz1 - sz1 * sz1) /
      |      (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) +
      |    (CAST(n2 AS DOUBLE) * szz2 - sz2 * sz2) /
      |      (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0))
      |      AS sev
      |  FROM c5),
      |cup AS (SELECT *, sqrt(sev) AS se,
      |    (theta1 * CAST(b1 AS DOUBLE) + theta2 * CAST(b2 AS DOUBLE)) /
      |      CAST(varynum AS DOUBLE) AS rho2,
      |    n1 >= 2 AND n2 >= 2 AND det > 0 AS cok,
      |    n1 > 0 AND n2 > 0 AS bothlive
      |  FROM c6),
      |wil AS (SELECT peek, arm, n, s_hit,
      |    CAST(s_hit AS DOUBLE) / CAST(n AS DOUBLE) AS p,
      |    1.0 + (1.959964 * 1.959964) / CAST(n AS DOUBLE) AS dn
      |  FROM cum WHERE arm IN ('A','B','C','D')),
      |wil2 AS (SELECT *,
      |    (p + (1.959964 * 1.959964) / (2.0 * CAST(n AS DOUBLE))) / dn AS center,
      |    1.959964 * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE) +
      |      (1.959964 * 1.959964) /
      |        (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / dn AS half
      |  FROM wil),
      |mincr AS (SELECT m.cmp, f.peek,
      |    CAST(sum(CASE WHEN f.arm = 'A' THEN f.n ELSE 0 END) AS BIGINT) AS bn1,
      |    CAST(sum(CASE WHEN f.arm = 'A' THEN f.s_hit ELSE 0 END) AS BIGINT) AS bs1,
      |    CAST(sum(CASE WHEN f.arm = m.cmp THEN f.n ELSE 0 END) AS BIGINT) AS bn2,
      |    CAST(sum(CASE WHEN f.arm = m.cmp THEN f.s_hit ELSE 0 END) AS BIGINT) AS bs2
      |  FROM fullc f JOIN cmpm m ON f.arm = m.cmp OR f.arm = 'A'
      |  GROUP BY 1, 2),
      |mt AS (SELECT cmp, peek,
      |    CAST(sum(bn1) OVER w AS BIGINT) AS n_lo,
      |    CAST(sum(bs1) OVER w AS BIGINT) AS s_lo,
      |    CAST(sum(bn2) OVER w AS BIGINT) AS n_hi,
      |    CAST(sum(bs2) OVER w AS BIGINT) AS s_hi
      |  FROM mincr
      |  WINDOW w AS (PARTITION BY cmp ORDER BY peek
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |mv AS (SELECT *,
      |    CAST(CAST(s_lo AS HUGEINT) * n_hi - CAST(s_hi AS HUGEINT) * n_lo AS DOUBLE) /
      |      (CAST(n_lo AS DOUBLE) * CAST(n_hi AS DOUBLE)) AS delta,
      |    (CAST(s_lo AS DOUBLE) + CAST(s_hi AS DOUBLE)) /
      |      (CAST(n_lo AS DOUBLE) + CAST(n_hi AS DOUBLE)) AS pp,
      |    n_lo > 0 AND n_hi > 0 AND (s_lo + s_hi) > 0 AND
      |      (s_lo + s_hi) < (n_lo + n_hi) AS usable
      |  FROM mt),
      |ml AS (SELECT *,
      |    pp * (1 - pp) * (1.0 / CAST(n_lo AS DOUBLE) + 1.0 / CAST(n_hi AS DOUBLE)) AS vv
      |  FROM mv),
      |mr AS (SELECT *,
      |    CASE WHEN usable THEN CAST(round((0.5 * ln(vv / (vv + 0.000244140625)) +
      |      delta * delta * 0.000244140625 /
      |        (2 * vv * (vv + 0.000244140625))) * 1e9) AS BIGINT) END AS ln_lr9
      |  FROM ml),
      |mb AS (SELECT *, max(ln_lr9) OVER (PARTITION BY cmp ORDER BY peek
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS best9 FROM mr),
      |mp AS (SELECT *,
      |    CASE WHEN best9 IS NULL OR best9 <= 0 THEN 1.0
      |      ELSE exp(-CAST(best9 AS DOUBLE) / 1e9) END AS p_av
      |  FROM mb),
      |bh AS (SELECT *, CAST(round(p_av * 1e9) AS BIGINT) AS p9 FROM mp),
      |bh2 AS (SELECT *,
      |    CAST(row_number() OVER (PARTITION BY peek ORDER BY p9, cmp) AS BIGINT)
      |      AS bh_rank,
      |    CAST(count(*) OVER (PARTITION BY peek) AS BIGINT) AS bh_m
      |  FROM bh),
      |bh3 AS (SELECT *,
      |    CAST(p9 AS HUGEINT) * bh_m * 100 <=
      |      CAST(bh_rank AS HUGEINT) * 5 * 1000000000 AS is_cand
      |  FROM bh2),
      |bh4 AS (SELECT *, max(CASE WHEN is_cand THEN bh_rank ELSE 0 END)
      |    OVER (PARTITION BY peek) AS cut
      |  FROM bh3)
      |SELECT m.peek, m.cmp AS arm, 'A' AS grp_lo, m.cmp AS grp_hi,
      |  CAST(4 AS BIGINT) AS n_arms, s.n_unexpected,
      |  round(CAST(s.chi9 AS DOUBLE) / 1e9, 9) AS srm_chi2,
      |  m.n_lo, m.s_lo, m.n_hi, m.s_hi,
      |  CASE WHEN c.cok THEN round(c.theta1, 9) END AS theta1,
      |  CASE WHEN c.cok THEN round(c.theta2, 9) END AS theta2,
      |  CASE WHEN c.cok AND c.varynum > 0 THEN round(c.rho2, 9) END AS rho2,
      |  CASE WHEN c.bothlive THEN round(c.rawy, 9) END AS effect_raw,
      |  CASE WHEN c.cok THEN round(c.adjeff, 9) END AS effect_cuped,
      |  CASE WHEN c.cok THEN round(c.se, 9) END AS se_cuped,
      |  CASE WHEN c.cok THEN round(c.adjeff - 1.959964 * c.se, 9) END AS cuped_ci_lo,
      |  CASE WHEN c.cok THEN round(c.adjeff + 1.959964 * c.se, 9) END AS cuped_ci_hi,
      |  round(wc.p, 9) AS p_ctl,
      |  round(wc.center - wc.half, 9) + 0.0 AS wilson_ctl_lo,
      |  round(wc.center + wc.half, 9) AS wilson_ctl_hi,
      |  round(wa.p, 9) AS p_arm,
      |  round(wa.center - wa.half, 9) + 0.0 AS wilson_arm_lo,
      |  round(wa.center + wa.half, 9) AS wilson_arm_hi,
      |  CASE WHEN m.usable THEN round(m.delta, 9) END AS delta, m.ln_lr9,
      |  round(m.p_av, 9) AS p_always_valid,
      |  coalesce(m.best9 >= 2995732274, false) AS reject,
      |  m.p9, m.bh_rank, m.bh_m, m.bh_rank <= m.cut AS reject_fdr
      |FROM bh4 m
      |JOIN srm2 s ON m.peek = s.peek
      |JOIN cup c ON m.cmp = c.cmp AND m.peek = c.peek
      |JOIN wil2 wa ON m.cmp = wa.arm AND m.peek = wa.peek
      |JOIN wil2 wc ON wc.arm = 'A' AND m.peek = wc.peek
      |ORDER BY m.peek, m.cmp""".stripMargin

  /** q365 oracle: [[graft.quality.Association.heterogeneityCard]]
    * replayed — per-user units with the arm-and-segment conversion
    * threshold, per-(segment, arm) exact HUGEINT moments, the q298
    * CUPED dag PER SEGMENT (theta/raw/adjusted/v1/v2 in the Spark
    * float order, cok guards), then the q334 meta-analysis windows
    * (segment-ordered cumulative float folds) and the per-segment
    * join-back with the replicated panel.
    */
  private lazy val heterogeneityOracle: String =
    """WITH pu AS (SELECT user_id,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |    max(value) AS maxv,
      |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
      |    CAST((user_id // 2) % 4 AS VARCHAR) AS segment
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |pu2 AS (SELECT segment, arm, x,
      |    coalesce(CAST(maxv >= CASE WHEN arm = 'B' AND
      |      CAST(segment AS BIGINT) < 2 THEN 200.0 ELSE 250.0 END
      |      AS BIGINT), 0) AS y
      |  FROM pu),
      |m AS (SELECT segment, arm, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      |  FROM pu2 GROUP BY 1, 2),
      |wide AS (SELECT segment,
      |    max(CASE WHEN arm = 'A' THEN n END) AS n1,
      |    max(CASE WHEN arm = 'A' THEN sx END) AS sx1,
      |    max(CASE WHEN arm = 'A' THEN sy END) AS sy1,
      |    max(CASE WHEN arm = 'A' THEN sxx END) AS sxx1,
      |    max(CASE WHEN arm = 'A' THEN syy END) AS syy1,
      |    max(CASE WHEN arm = 'A' THEN sxy END) AS sxy1,
      |    max(CASE WHEN arm = 'B' THEN n END) AS n2,
      |    max(CASE WHEN arm = 'B' THEN sx END) AS sx2,
      |    max(CASE WHEN arm = 'B' THEN sy END) AS sy2,
      |    max(CASE WHEN arm = 'B' THEN sxx END) AS sxx2,
      |    max(CASE WHEN arm = 'B' THEN syy END) AS syy2,
      |    max(CASE WHEN arm = 'B' THEN sxy END) AS sxy2
      |  FROM m GROUP BY 1),
      |c1 AS (SELECT *, CAST(n1 + n2 AS HUGEINT) AS nt,
      |    sx1 + sx2 AS sxt, sy1 + sy2 AS syt,
      |    sxx1 + sxx2 AS sxxt, syy1 + syy2 AS syyt, sxy1 + sxy2 AS sxyt
      |  FROM wide),
      |c2 AS (SELECT *,
      |    nt * sxyt - sxt * syt AS covnum,
      |    nt * sxxt - sxt * sxt AS varxnum
      |  FROM c1),
      |c3 AS (SELECT *,
      |    CAST(covnum AS DOUBLE) / CAST(varxnum AS DOUBLE) AS theta,
      |    CAST(sy1 * n2 - sy2 * n1 AS DOUBLE) /
      |      (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS raweff,
      |    CAST(sx1 * n2 - sx2 * n1 AS DOUBLE) AS xcross
      |  FROM c2),
      |c4 AS (SELECT *,
      |    raweff - theta * xcross / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS adjeff,
      |    (CAST(n1 AS DOUBLE) * (CAST(syy1 AS DOUBLE) - 2 * theta * CAST(sxy1 AS DOUBLE) +
      |        theta * theta * CAST(sxx1 AS DOUBLE)) -
      |      (CAST(sy1 AS DOUBLE) - theta * CAST(sx1 AS DOUBLE)) *
      |      (CAST(sy1 AS DOUBLE) - theta * CAST(sx1 AS DOUBLE))) /
      |      (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) AS v1,
      |    (CAST(n2 AS DOUBLE) * (CAST(syy2 AS DOUBLE) - 2 * theta * CAST(sxy2 AS DOUBLE) +
      |        theta * theta * CAST(sxx2 AS DOUBLE)) -
      |      (CAST(sy2 AS DOUBLE) - theta * CAST(sx2 AS DOUBLE)) *
      |      (CAST(sy2 AS DOUBLE) - theta * CAST(sx2 AS DOUBLE))) /
      |      (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)) AS v2,
      |    n1 >= 2 AND n2 >= 2 AND varxnum > 0 AS cok
      |  FROM c3),
      |eff AS (SELECT segment,
      |    CASE WHEN cok THEN adjeff END AS e,
      |    CASE WHEN cok THEN sqrt(v1 + v2) END AS se
      |  FROM c4),
      |p1 AS (SELECT segment, e, se,
      |    sum(1.0 / (se * se)) OVER wo AS sw,
      |    sum(1.0 / (se * se) * e) OVER wo AS swe,
      |    sum(1.0 / (se * se) * e * e) OVER wo AS swe2,
      |    sum((1.0 / (se * se)) * (1.0 / (se * se))) OVER wo AS sww,
      |    CAST(count(*) OVER () AS BIGINT) AS k,
      |    CAST(row_number() OVER (ORDER BY segment) AS BIGINT) AS rn
      |  FROM eff WHERE se IS NOT NULL AND se > 0 AND e IS NOT NULL
      |  WINDOW wo AS (ORDER BY segment ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |s1g AS (SELECT * FROM p1 WHERE rn = k),
      |s2g AS (SELECT *,
      |    swe / sw AS eff_f, sqrt(1.0 / sw) AS se_f,
      |    swe2 - swe * swe / sw AS q, CAST(k AS DOUBLE) - 1.0 AS dfq
      |  FROM s1g),
      |s3g AS (SELECT *,
      |    CASE WHEN q > dfq THEN (q - dfq) / q ELSE 0.0 END AS i2,
      |    CASE WHEN q > dfq AND (sw - sww / sw) > 0
      |      THEN (q - dfq) / (sw - sww / sw) ELSE 0.0 END AS tau2
      |  FROM s2g),
      |p2 AS (SELECT f.segment, f.e,
      |    sum(1.0 / (f.se * f.se + g.tau2)) OVER wo AS swr,
      |    sum(1.0 / (f.se * f.se + g.tau2) * f.e) OVER wo AS swre,
      |    CAST(count(*) OVER () AS BIGINT) AS k2,
      |    CAST(row_number() OVER (ORDER BY f.segment) AS BIGINT) AS rn
      |  FROM eff f CROSS JOIN s3g g
      |  WHERE f.se IS NOT NULL AND f.se > 0 AND f.e IS NOT NULL
      |  WINDOW wo AS (ORDER BY f.segment ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |rnd AS (SELECT swre / swr AS eff_r, sqrt(1.0 / swr) AS se_r
      |  FROM p2 WHERE rn = k2),
      |drp AS (SELECT CAST(sum(CASE WHEN se IS NOT NULL AND se > 0 AND
      |    e IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped FROM eff)
      |SELECT f.segment,
      |  round(f.e, 9) AS effect_seg, round(f.se, 9) AS se_seg,
      |  CASE WHEN f.se IS NOT NULL AND f.se > 0 AND f.e IS NOT NULL
      |    THEN round(f.e - 1.959964 * f.se, 9) END AS seg_ci_lo,
      |  CASE WHEN f.se IS NOT NULL AND f.se > 0 AND f.e IS NOT NULL
      |    THEN round(f.e + 1.959964 * f.se, 9) END AS seg_ci_hi,
      |  coalesce(f.se IS NOT NULL AND f.se > 0 AND f.e IS NOT NULL, false)
      |    AS included,
      |  g.k AS n_strata, d.n_dropped,
      |  round(g.eff_f, 9) AS effect_fixed, round(g.se_f, 9) AS se_fixed,
      |  round(g.eff_f - 1.959964 * g.se_f, 9) AS ci_fixed_lo,
      |  round(g.eff_f + 1.959964 * g.se_f, 9) AS ci_fixed_hi,
      |  round(g.q, 9) AS q, CAST(g.dfq AS BIGINT) AS df,
      |  round(g.i2, 9) AS i2, round(g.tau2, 9) AS tau2_dl,
      |  round(r.eff_r, 9) AS effect_random, round(r.se_r, 9) AS se_random,
      |  round(r.eff_r - 1.959964 * r.se_r, 9) AS ci_random_lo,
      |  round(r.eff_r + 1.959964 * r.se_r, 9) AS ci_random_hi
      |FROM eff f CROSS JOIN s3g g CROSS JOIN rnd r CROSS JOIN drp d
      |ORDER BY f.segment""".stripMargin

  /** q366 oracle:
    * [[graft.quality.SequentialTests.quantileThresholdMonitor]]
    * replayed — per-peek value cells, exceedance increments, cumulative
    * counts, the q333 one-proportion mSPRT dag at p₀ = 0.05 (NOTE the
    * variance constant is written (0.05 * (1.0 - 0.05)) — the
    * operator's driver-side p₀(1−p₀) float op, NOT a 0.95 literal),
    * the running-best evidence with the ln(20) nano boundary, and the
    * exact clamped-rank threshold read.
    */
  private lazy val quantileMonitorOracle: String =
    """WITH ev AS (SELECT CAST(floor(value) AS BIGINT) AS v,
      |    CAST(event_id % 5 AS BIGINT) AS peek
      |  FROM events WHERE value IS NOT NULL),
      |cells AS (SELECT peek, v, CAST(count(*) AS BIGINT) AS w
      |  FROM ev GROUP BY 1, 2),
      |incr AS (SELECT peek, CAST(sum(w) AS BIGINT) AS bn,
      |    CAST(sum(CASE WHEN v > 400 THEN w ELSE 0 END) AS BIGINT) AS bs
      |  FROM cells GROUP BY 1),
      |cum AS (SELECT peek,
      |    CAST(sum(bn) OVER w AS BIGINT) AS n,
      |    CAST(sum(bs) OVER w AS BIGINT) AS s
      |  FROM incr
      |  WINDOW w AS (ORDER BY peek ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |d AS (SELECT *,
      |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) - 0.05 AS delta,
      |    (0.05 * (1.0 - 0.05)) / CAST(n AS DOUBLE) AS vv,
      |    n > 0 AS usable
      |  FROM cum),
      |r1 AS (SELECT *,
      |    CASE WHEN usable THEN CAST(round((0.5 * ln(vv / (vv + 0.0625)) +
      |      delta * delta * 0.0625 / (2 * vv * (vv + 0.0625))) * 1e9) AS BIGINT)
      |    END AS ln_lr9
      |  FROM d),
      |b AS (SELECT *, max(ln_lr9) OVER (ORDER BY peek
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS best9 FROM r1),
      |rk AS (SELECT *,
      |    greatest(1, least(n, (95 * (n + 1)) // 100)) AS pr FROM b)
      |SELECT peek, n, s,
      |  CASE WHEN usable THEN round(delta, 9) END AS delta, ln_lr9,
      |  round(CASE WHEN best9 IS NULL OR best9 <= 0 THEN 1.0
      |    ELSE exp(-CAST(best9 AS DOUBLE) / 1e9) END, 9) AS p_always_valid,
      |  coalesce(best9 >= 2995732274, false) AS reject,
      |  CAST(400 AS BIGINT) AS threshold,
      |  CASE WHEN n > 0 THEN pr END AS p_rank,
      |  CASE WHEN n > 0 THEN s > n - pr END AS q_above_threshold
      |FROM rk ORDER BY peek""".stripMargin

  /** q345 oracle: the ENTIRE k-arm dashboard chain replayed from raw
    * events — per-user units on the 5-way user_id mod 20 split with the
    * arm-dependent conversion threshold, per-(arm, peek) HUGEINT moment
    * cells, the (arm × peek) spine, cumulative windows per arm, then:
    * the k-arm q306 SRM (four nano χ² terms against the 40/30/20/10
    * design, E surfaced as unexpected), the q298 CUPED pivot PER
    * COMPARISON (B/C/D each against control A — A is the lexical min,
    * so lo = control in every battery), the q324 Wilson dags per arm,
    * the q299 mSPRT recursion per comparison on per-peek increments,
    * and the q320 BH step-up across the 3 monitor p-values per peek
    * (nano p9 grid, exact HUGEINT step inequality, cmp tie-break).
    */
  private lazy val abDashboardKArmOracle: String =
    """WITH pu0 AS (SELECT user_id,
      |    CASE WHEN user_id % 20 < 8 THEN 'A'
      |      WHEN user_id % 20 < 14 THEN 'B'
      |      WHEN user_id % 20 < 18 THEN 'C'
      |      WHEN user_id % 20 < 19 THEN 'D' ELSE 'E' END AS arm,
      |    CAST(user_id % 6 AS BIGINT) AS peek,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS y,
      |    max(value) AS maxv
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |pu AS (SELECT arm, peek, x, y,
      |    CASE WHEN coalesce(maxv >= CASE WHEN arm = 'B' THEN 200.0
      |      WHEN arm = 'D' THEN 300.0 ELSE 250.0 END, false)
      |      THEN 1 ELSE 0 END AS hit
      |  FROM pu0),
      |cells AS (SELECT arm, peek, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(hit) AS BIGINT) AS s_hit,
      |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      |  FROM pu GROUP BY 1, 2),
      |spine AS (SELECT a.arm, p.peek
      |  FROM (SELECT DISTINCT arm FROM cells) a
      |  CROSS JOIN (SELECT DISTINCT peek FROM cells) p),
      |fullc AS (SELECT sp.arm, sp.peek,
      |    coalesce(c.n, 0) AS n, coalesce(c.s_hit, 0) AS s_hit,
      |    coalesce(c.sx, 0) AS sx, coalesce(c.sy, 0) AS sy,
      |    coalesce(c.sxx, 0) AS sxx, coalesce(c.syy, 0) AS syy,
      |    coalesce(c.sxy, 0) AS sxy
      |  FROM spine sp LEFT JOIN cells c ON sp.arm = c.arm AND sp.peek = c.peek),
      |cum AS (SELECT arm, peek,
      |    CAST(sum(n) OVER w AS BIGINT) AS n,
      |    CAST(sum(s_hit) OVER w AS BIGINT) AS s_hit,
      |    CAST(sum(sx) OVER w AS HUGEINT) AS sx,
      |    CAST(sum(sy) OVER w AS HUGEINT) AS sy,
      |    CAST(sum(sxx) OVER w AS HUGEINT) AS sxx,
      |    CAST(sum(syy) OVER w AS HUGEINT) AS syy,
      |    CAST(sum(sxy) OVER w AS HUGEINT) AS sxy
      |  FROM fullc
      |  WINDOW w AS (PARTITION BY arm ORDER BY peek
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |srm AS (SELECT peek,
      |    CAST(sum(CASE WHEN arm NOT IN ('A','B','C','D') THEN n ELSE 0 END)
      |      AS BIGINT) AS n_unexpected,
      |    CAST(sum(CASE WHEN arm IN ('A','B','C','D') THEN n ELSE 0 END)
      |      AS DOUBLE) AS nd,
      |    max(CASE WHEN arm = 'A' THEN n END) AS na,
      |    max(CASE WHEN arm = 'B' THEN n END) AS nb,
      |    max(CASE WHEN arm = 'C' THEN n END) AS nc,
      |    max(CASE WHEN arm = 'D' THEN n END) AS ndd
      |  FROM cum GROUP BY 1),
      |srm2 AS (SELECT peek, n_unexpected,
      |    CAST(round((CAST(na AS DOUBLE) - nd * 0.4) *
      |      (CAST(na AS DOUBLE) - nd * 0.4) / (nd * 0.4) * 1e9) AS BIGINT) +
      |    CAST(round((CAST(nb AS DOUBLE) - nd * 0.3) *
      |      (CAST(nb AS DOUBLE) - nd * 0.3) / (nd * 0.3) * 1e9) AS BIGINT) +
      |    CAST(round((CAST(nc AS DOUBLE) - nd * 0.2) *
      |      (CAST(nc AS DOUBLE) - nd * 0.2) / (nd * 0.2) * 1e9) AS BIGINT) +
      |    CAST(round((CAST(ndd AS DOUBLE) - nd * 0.1) *
      |      (CAST(ndd AS DOUBLE) - nd * 0.1) / (nd * 0.1) * 1e9) AS BIGINT) AS chi9
      |  FROM srm),
      |cmpm AS (SELECT * FROM (VALUES ('B'), ('C'), ('D')) t(cmp)),
      |wide AS (SELECT m.cmp, c.peek,
      |    max(CASE WHEN c.arm = 'A' THEN c.n END) AS n1,
      |    max(CASE WHEN c.arm = 'A' THEN c.sx END) AS sx1,
      |    max(CASE WHEN c.arm = 'A' THEN c.sy END) AS sy1,
      |    max(CASE WHEN c.arm = 'A' THEN c.sxx END) AS sxx1,
      |    max(CASE WHEN c.arm = 'A' THEN c.syy END) AS syy1,
      |    max(CASE WHEN c.arm = 'A' THEN c.sxy END) AS sxy1,
      |    max(CASE WHEN c.arm <> 'A' THEN c.n END) AS n2,
      |    max(CASE WHEN c.arm <> 'A' THEN c.sx END) AS sx2,
      |    max(CASE WHEN c.arm <> 'A' THEN c.sy END) AS sy2,
      |    max(CASE WHEN c.arm <> 'A' THEN c.sxx END) AS sxx2,
      |    max(CASE WHEN c.arm <> 'A' THEN c.syy END) AS syy2,
      |    max(CASE WHEN c.arm <> 'A' THEN c.sxy END) AS sxy2
      |  FROM cum c JOIN cmpm m ON c.arm = m.cmp OR c.arm = 'A'
      |  GROUP BY 1, 2),
      |c1 AS (SELECT *, CAST(n1 + n2 AS HUGEINT) AS nt,
      |    sx1 + sx2 AS sxt, sy1 + sy2 AS syt,
      |    sxx1 + sxx2 AS sxxt, syy1 + syy2 AS syyt, sxy1 + sxy2 AS sxyt
      |  FROM wide),
      |c2 AS (SELECT *,
      |    nt * sxyt - sxt * syt AS covnum,
      |    nt * sxxt - sxt * sxt AS varxnum,
      |    nt * syyt - syt * syt AS varynum
      |  FROM c1),
      |c3 AS (SELECT *,
      |    CAST(covnum AS DOUBLE) / CAST(varxnum AS DOUBLE) AS theta,
      |    CAST(sy1 * n2 - sy2 * n1 AS DOUBLE) /
      |      (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS raweff,
      |    CAST(sx1 * n2 - sx2 * n1 AS DOUBLE) AS xcross
      |  FROM c2),
      |c4 AS (SELECT *,
      |    raweff - theta * xcross / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS adjeff,
      |    (CAST(n1 AS DOUBLE) * (CAST(syy1 AS DOUBLE) - 2 * theta * CAST(sxy1 AS DOUBLE) +
      |        theta * theta * CAST(sxx1 AS DOUBLE)) -
      |      (CAST(sy1 AS DOUBLE) - theta * CAST(sx1 AS DOUBLE)) *
      |      (CAST(sy1 AS DOUBLE) - theta * CAST(sx1 AS DOUBLE))) /
      |      (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) AS v1,
      |    (CAST(n2 AS DOUBLE) * (CAST(syy2 AS DOUBLE) - 2 * theta * CAST(sxy2 AS DOUBLE) +
      |        theta * theta * CAST(sxx2 AS DOUBLE)) -
      |      (CAST(sy2 AS DOUBLE) - theta * CAST(sx2 AS DOUBLE)) *
      |      (CAST(sy2 AS DOUBLE) - theta * CAST(sx2 AS DOUBLE))) /
      |      (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0)) AS v2,
      |    CAST(covnum AS DOUBLE) * CAST(covnum AS DOUBLE) /
      |      (CAST(varxnum AS DOUBLE) * CAST(varynum AS DOUBLE)) AS rho2,
      |    n1 >= 2 AND n2 >= 2 AND varxnum > 0 AS cok,
      |    n1 > 0 AND n2 > 0 AS bothlive
      |  FROM c3),
      |cup AS (SELECT *, sqrt(v1 + v2) AS se FROM c4),
      |wil AS (SELECT peek, arm, n, s_hit,
      |    CAST(s_hit AS DOUBLE) / CAST(n AS DOUBLE) AS p,
      |    1.0 + (1.959964 * 1.959964) / CAST(n AS DOUBLE) AS dn
      |  FROM cum WHERE arm IN ('A','B','C','D')),
      |wil2 AS (SELECT *,
      |    (p + (1.959964 * 1.959964) / (2.0 * CAST(n AS DOUBLE))) / dn AS center,
      |    1.959964 * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE) +
      |      (1.959964 * 1.959964) /
      |        (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / dn AS half
      |  FROM wil),
      |mincr AS (SELECT m.cmp, f.peek,
      |    CAST(sum(CASE WHEN f.arm = 'A' THEN f.n ELSE 0 END) AS BIGINT) AS bn1,
      |    CAST(sum(CASE WHEN f.arm = 'A' THEN f.s_hit ELSE 0 END) AS BIGINT) AS bs1,
      |    CAST(sum(CASE WHEN f.arm = m.cmp THEN f.n ELSE 0 END) AS BIGINT) AS bn2,
      |    CAST(sum(CASE WHEN f.arm = m.cmp THEN f.s_hit ELSE 0 END) AS BIGINT) AS bs2
      |  FROM fullc f JOIN cmpm m ON f.arm = m.cmp OR f.arm = 'A'
      |  GROUP BY 1, 2),
      |mt AS (SELECT cmp, peek,
      |    CAST(sum(bn1) OVER w AS BIGINT) AS n_lo,
      |    CAST(sum(bs1) OVER w AS BIGINT) AS s_lo,
      |    CAST(sum(bn2) OVER w AS BIGINT) AS n_hi,
      |    CAST(sum(bs2) OVER w AS BIGINT) AS s_hi
      |  FROM mincr
      |  WINDOW w AS (PARTITION BY cmp ORDER BY peek
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |mv AS (SELECT *,
      |    CAST(CAST(s_lo AS HUGEINT) * n_hi - CAST(s_hi AS HUGEINT) * n_lo AS DOUBLE) /
      |      (CAST(n_lo AS DOUBLE) * CAST(n_hi AS DOUBLE)) AS delta,
      |    (CAST(s_lo AS DOUBLE) + CAST(s_hi AS DOUBLE)) /
      |      (CAST(n_lo AS DOUBLE) + CAST(n_hi AS DOUBLE)) AS pp,
      |    n_lo > 0 AND n_hi > 0 AND (s_lo + s_hi) > 0 AND
      |      (s_lo + s_hi) < (n_lo + n_hi) AS usable
      |  FROM mt),
      |ml AS (SELECT *,
      |    pp * (1 - pp) * (1.0 / CAST(n_lo AS DOUBLE) + 1.0 / CAST(n_hi AS DOUBLE)) AS vv
      |  FROM mv),
      |mr AS (SELECT *,
      |    CASE WHEN usable THEN CAST(round((0.5 * ln(vv / (vv + 0.000244140625)) +
      |      delta * delta * 0.000244140625 /
      |        (2 * vv * (vv + 0.000244140625))) * 1e9) AS BIGINT) END AS ln_lr9
      |  FROM ml),
      |mb AS (SELECT *, max(ln_lr9) OVER (PARTITION BY cmp ORDER BY peek
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS best9 FROM mr),
      |mp AS (SELECT *,
      |    CASE WHEN best9 IS NULL OR best9 <= 0 THEN 1.0
      |      ELSE exp(-CAST(best9 AS DOUBLE) / 1e9) END AS p_av
      |  FROM mb),
      |bh AS (SELECT *, CAST(round(p_av * 1e9) AS BIGINT) AS p9 FROM mp),
      |bh2 AS (SELECT *,
      |    CAST(row_number() OVER (PARTITION BY peek ORDER BY p9, cmp) AS BIGINT)
      |      AS bh_rank,
      |    CAST(count(*) OVER (PARTITION BY peek) AS BIGINT) AS bh_m
      |  FROM bh),
      |bh3 AS (SELECT *,
      |    CAST(p9 AS HUGEINT) * bh_m * 100 <=
      |      CAST(bh_rank AS HUGEINT) * 5 * 1000000000 AS is_cand
      |  FROM bh2),
      |bh4 AS (SELECT *, max(CASE WHEN is_cand THEN bh_rank ELSE 0 END)
      |    OVER (PARTITION BY peek) AS cut
      |  FROM bh3)
      |SELECT m.peek, m.cmp AS arm, 'A' AS grp_lo, m.cmp AS grp_hi,
      |  CAST(4 AS BIGINT) AS n_arms, s.n_unexpected,
      |  round(CAST(s.chi9 AS DOUBLE) / 1e9, 9) AS srm_chi2,
      |  m.n_lo, m.s_lo, m.n_hi, m.s_hi,
      |  CASE WHEN c.cok THEN round(c.theta, 9) END AS theta,
      |  CASE WHEN c.cok AND c.varynum > 0 THEN round(c.rho2, 9) END AS rho2,
      |  CASE WHEN c.bothlive THEN round(c.raweff, 9) END AS effect_raw,
      |  CASE WHEN c.cok THEN round(c.adjeff, 9) END AS effect_cuped,
      |  CASE WHEN c.cok THEN round(c.se, 9) END AS se_cuped,
      |  CASE WHEN c.cok THEN round(c.adjeff - 1.959964 * c.se, 9) END AS cuped_ci_lo,
      |  CASE WHEN c.cok THEN round(c.adjeff + 1.959964 * c.se, 9) END AS cuped_ci_hi,
      |  round(wc.p, 9) AS p_ctl,
      |  round(wc.center - wc.half, 9) + 0.0 AS wilson_ctl_lo,
      |  round(wc.center + wc.half, 9) AS wilson_ctl_hi,
      |  round(wa.p, 9) AS p_arm,
      |  round(wa.center - wa.half, 9) + 0.0 AS wilson_arm_lo,
      |  round(wa.center + wa.half, 9) AS wilson_arm_hi,
      |  CASE WHEN m.usable THEN round(m.delta, 9) END AS delta, m.ln_lr9,
      |  round(m.p_av, 9) AS p_always_valid,
      |  coalesce(m.best9 >= 2995732274, false) AS reject,
      |  m.p9, m.bh_rank, m.bh_m, m.bh_rank <= m.cut AS reject_fdr
      |FROM bh4 m
      |JOIN srm2 s ON m.peek = s.peek
      |JOIN cup c ON m.cmp = c.cmp AND m.peek = c.peek
      |JOIN wil2 wa ON m.cmp = wa.arm AND m.peek = wa.peek
      |JOIN wil2 wc ON wc.arm = 'A' AND m.peek = wc.peek
      |ORDER BY m.peek, m.cmp""".stripMargin

  /** q346 oracle: the multi-metric scorecard replayed from raw events —
    * per-user metric booleans (two arm-shifted thresholds, three
    * symmetric), ONE wide per-(arm, peek) counting pass, the metric
    * unpivot on the bounded cell frame, the (metric × arm × peek)
    * spine, the q299 mSPRT recursion per metric on per-peek increments,
    * and the q320 BH step-up across the 5 monitor p-values per peek
    * (nano p9 grid, exact HUGEINT step inequality, metric tie-break).
    */
  private lazy val scorecardOracle: String =
    """WITH pu AS (SELECT user_id,
      |    CAST(count(*) AS BIGINT) AS n_ev,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS y,
      |    max(value) AS maxv,
      |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
      |    CAST(user_id % 6 AS BIGINT) AS peek
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |pm AS (SELECT arm, peek,
      |    CASE WHEN coalesce(maxv >= 250.0, false) THEN 1 ELSE 0 END AS h_conv,
      |    CASE WHEN coalesce(maxv >= CASE WHEN arm = 'A' THEN 450.0
      |      ELSE 250.0 END, false) THEN 1 ELSE 0 END AS h_conv_shift,
      |    CASE WHEN x >= 3 THEN 1 ELSE 0 END AS h_even,
      |    CASE WHEN y >= CASE WHEN arm = 'A' THEN 2 ELSE 3 END
      |      THEN 1 ELSE 0 END AS h_odd_shift,
      |    CASE WHEN n_ev >= 5 THEN 1 ELSE 0 END AS h_active
      |  FROM pu),
      |wide AS (SELECT arm, peek, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(h_active) AS BIGINT) AS s_active,
      |    CAST(sum(h_conv) AS BIGINT) AS s_conv,
      |    CAST(sum(h_conv_shift) AS BIGINT) AS s_conv_shift,
      |    CAST(sum(h_even) AS BIGINT) AS s_even,
      |    CAST(sum(h_odd_shift) AS BIGINT) AS s_odd_shift
      |  FROM pm GROUP BY 1, 2),
      |cells AS (
      |  SELECT 'm_active' AS metric, arm, peek, n, s_active AS s_hit FROM wide
      |  UNION ALL SELECT 'm_conv', arm, peek, n, s_conv FROM wide
      |  UNION ALL SELECT 'm_conv_shift', arm, peek, n, s_conv_shift FROM wide
      |  UNION ALL SELECT 'm_even', arm, peek, n, s_even FROM wide
      |  UNION ALL SELECT 'm_odd_shift', arm, peek, n, s_odd_shift FROM wide),
      |spine AS (SELECT m.metric, a.arm, p.peek
      |  FROM (SELECT DISTINCT metric FROM cells) m
      |  CROSS JOIN (SELECT DISTINCT peek FROM cells) p
      |  CROSS JOIN (SELECT * FROM (VALUES ('A'), ('B')) t(arm)) a),
      |fullc AS (SELECT sp.metric, sp.arm, sp.peek,
      |    coalesce(c.n, 0) AS n, coalesce(c.s_hit, 0) AS s_hit
      |  FROM spine sp LEFT JOIN cells c
      |  ON sp.metric = c.metric AND sp.arm = c.arm AND sp.peek = c.peek),
      |mincr AS (SELECT metric, peek,
      |    CAST(sum(CASE WHEN arm = 'A' THEN n ELSE 0 END) AS BIGINT) AS bn1,
      |    CAST(sum(CASE WHEN arm = 'A' THEN s_hit ELSE 0 END) AS BIGINT) AS bs1,
      |    CAST(sum(CASE WHEN arm = 'B' THEN n ELSE 0 END) AS BIGINT) AS bn2,
      |    CAST(sum(CASE WHEN arm = 'B' THEN s_hit ELSE 0 END) AS BIGINT) AS bs2
      |  FROM fullc GROUP BY 1, 2),
      |mt AS (SELECT metric, peek,
      |    CAST(sum(bn1) OVER w AS BIGINT) AS n_lo,
      |    CAST(sum(bs1) OVER w AS BIGINT) AS s_lo,
      |    CAST(sum(bn2) OVER w AS BIGINT) AS n_hi,
      |    CAST(sum(bs2) OVER w AS BIGINT) AS s_hi
      |  FROM mincr
      |  WINDOW w AS (PARTITION BY metric ORDER BY peek
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |mv AS (SELECT *,
      |    CAST(CAST(s_lo AS HUGEINT) * n_hi - CAST(s_hi AS HUGEINT) * n_lo AS DOUBLE) /
      |      (CAST(n_lo AS DOUBLE) * CAST(n_hi AS DOUBLE)) AS delta,
      |    (CAST(s_lo AS DOUBLE) + CAST(s_hi AS DOUBLE)) /
      |      (CAST(n_lo AS DOUBLE) + CAST(n_hi AS DOUBLE)) AS pp,
      |    n_lo > 0 AND n_hi > 0 AND (s_lo + s_hi) > 0 AND
      |      (s_lo + s_hi) < (n_lo + n_hi) AS usable
      |  FROM mt),
      |ml AS (SELECT *,
      |    pp * (1 - pp) * (1.0 / CAST(n_lo AS DOUBLE) + 1.0 / CAST(n_hi AS DOUBLE)) AS vv
      |  FROM mv),
      |mr AS (SELECT *,
      |    CASE WHEN usable THEN CAST(round((0.5 * ln(vv / (vv + 0.0625)) +
      |      delta * delta * 0.0625 /
      |        (2 * vv * (vv + 0.0625))) * 1e9) AS BIGINT) END AS ln_lr9
      |  FROM ml),
      |mb AS (SELECT *, max(ln_lr9) OVER (PARTITION BY metric ORDER BY peek
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS best9 FROM mr),
      |mp AS (SELECT *,
      |    CASE WHEN best9 IS NULL OR best9 <= 0 THEN 1.0
      |      ELSE exp(-CAST(best9 AS DOUBLE) / 1e9) END AS p_av
      |  FROM mb),
      |bh AS (SELECT *, CAST(round(p_av * 1e9) AS BIGINT) AS p9 FROM mp),
      |bh2 AS (SELECT *,
      |    CAST(row_number() OVER (PARTITION BY peek ORDER BY p9, metric) AS BIGINT)
      |      AS bh_rank,
      |    CAST(count(*) OVER (PARTITION BY peek) AS BIGINT) AS n_metrics
      |  FROM bh),
      |bh3 AS (SELECT *,
      |    CAST(p9 AS HUGEINT) * n_metrics * 100 <=
      |      CAST(bh_rank AS HUGEINT) * 5 * 1000000000 AS is_cand
      |  FROM bh2),
      |bh4 AS (SELECT *, max(CASE WHEN is_cand THEN bh_rank ELSE 0 END)
      |    OVER (PARTITION BY peek) AS cut
      |  FROM bh3)
      |SELECT peek, metric, n_lo, s_lo, n_hi, s_hi,
      |  CASE WHEN usable THEN round(delta, 9) END AS delta, ln_lr9,
      |  round(p_av, 9) AS p_always_valid,
      |  coalesce(best9 >= 2995732274, false) AS reject,
      |  p9, bh_rank, n_metrics, bh_rank <= cut AS reject_fdr
      |FROM bh4
      |ORDER BY peek, metric""".stripMargin

  /** q347 oracle: [[graft.quality.Association.cupedMulti]]'s
    * two-covariate dag replayed — the per-user (x1, y, x2) CTE, per-arm
    * HUGEINT moments from one pass, pooled central cross-products
    * (exact), the Cramer solve and every downstream statistic in the
    * Spark dag's float order (A/b cast double once, det/thetas/raw
    * effects/Szz/Sz/variances as literal left-assoc chains).
    */
  private lazy val cupedMultiOracle: String =
    """WITH pu AS (SELECT user_id,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS x1,
      |    CAST(sum(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS y,
      |    CAST(count(DISTINCT CAST(floor(epoch(ts) / 3600) AS BIGINT)) AS BIGINT)
      |      AS x2,
      |    CAST(user_id % 2 = 0 AS VARCHAR) AS arm
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |  GROUP BY user_id),
      |m AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
      |    CAST(sum(x1) AS HUGEINT) AS sx1, CAST(sum(x2) AS HUGEINT) AS sx2,
      |    CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS sx1x1,
      |    CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS sx2x2,
      |    CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS sx1x2,
      |    CAST(sum(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS sx1y,
      |    CAST(sum(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS sx2y
      |  FROM pu GROUP BY 1),
      |w AS (SELECT
      |    max(CASE WHEN arm = 'false' THEN n END) AS n1,
      |    max(CASE WHEN arm = 'false' THEN sy END) AS sy1,
      |    max(CASE WHEN arm = 'false' THEN syy END) AS syy1,
      |    max(CASE WHEN arm = 'false' THEN sx1 END) AS sx11,
      |    max(CASE WHEN arm = 'false' THEN sx2 END) AS sx21,
      |    max(CASE WHEN arm = 'false' THEN sx1x1 END) AS sx1x11,
      |    max(CASE WHEN arm = 'false' THEN sx2x2 END) AS sx2x21,
      |    max(CASE WHEN arm = 'false' THEN sx1x2 END) AS sx1x21,
      |    max(CASE WHEN arm = 'false' THEN sx1y END) AS sx1y1,
      |    max(CASE WHEN arm = 'false' THEN sx2y END) AS sx2y1,
      |    max(CASE WHEN arm = 'true' THEN n END) AS n2,
      |    max(CASE WHEN arm = 'true' THEN sy END) AS sy2,
      |    max(CASE WHEN arm = 'true' THEN syy END) AS syy2,
      |    max(CASE WHEN arm = 'true' THEN sx1 END) AS sx12,
      |    max(CASE WHEN arm = 'true' THEN sx2 END) AS sx22,
      |    max(CASE WHEN arm = 'true' THEN sx1x1 END) AS sx1x12,
      |    max(CASE WHEN arm = 'true' THEN sx2x2 END) AS sx2x22,
      |    max(CASE WHEN arm = 'true' THEN sx1x2 END) AS sx1x22,
      |    max(CASE WHEN arm = 'true' THEN sx1y END) AS sx1y2,
      |    max(CASE WHEN arm = 'true' THEN sx2y END) AS sx2y2
      |  FROM m),
      |c1 AS (SELECT *, CAST(n1 + n2 AS HUGEINT) AS nt,
      |    sy1 + sy2 AS syt, syy1 + syy2 AS syyt,
      |    sx11 + sx12 AS sx1t, sx21 + sx22 AS sx2t,
      |    sx1x11 + sx1x12 AS sx1x1t, sx2x21 + sx2x22 AS sx2x2t,
      |    sx1x21 + sx1x22 AS sx1x2t,
      |    sx1y1 + sx1y2 AS sx1yt, sx2y1 + sx2y2 AS sx2yt
      |  FROM w),
      |c2 AS (SELECT *,
      |    nt * sx1x1t - sx1t * sx1t AS a11,
      |    nt * sx2x2t - sx2t * sx2t AS a22,
      |    nt * sx1x2t - sx1t * sx2t AS a12,
      |    nt * sx1yt - sx1t * syt AS b1,
      |    nt * sx2yt - sx2t * syt AS b2,
      |    nt * syyt - syt * syt AS varynum
      |  FROM c1),
      |c3 AS (SELECT *,
      |    CAST(a11 AS DOUBLE) * CAST(a22 AS DOUBLE) -
      |      CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE) AS det
      |  FROM c2),
      |c4 AS (SELECT *,
      |    (CAST(a22 AS DOUBLE) * CAST(b1 AS DOUBLE) -
      |      CAST(a12 AS DOUBLE) * CAST(b2 AS DOUBLE)) / det AS theta1,
      |    (CAST(a11 AS DOUBLE) * CAST(b2 AS DOUBLE) -
      |      CAST(a12 AS DOUBLE) * CAST(b1 AS DOUBLE)) / det AS theta2,
      |    CAST(sy1 * n2 - sy2 * n1 AS DOUBLE) /
      |      (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS rawy,
      |    CAST(sx11 * n2 - sx12 * n1 AS DOUBLE) /
      |      (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS rawx1,
      |    CAST(sx21 * n2 - sx22 * n1 AS DOUBLE) /
      |      (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS rawx2
      |  FROM c3),
      |c5 AS (SELECT *,
      |    rawy - theta1 * rawx1 - theta2 * rawx2 AS adjeff,
      |    CAST(syy1 AS DOUBLE) + theta1 * theta1 * CAST(sx1x11 AS DOUBLE) +
      |      theta2 * theta2 * CAST(sx2x21 AS DOUBLE) +
      |      2 * theta1 * theta2 * CAST(sx1x21 AS DOUBLE) -
      |      2 * theta1 * CAST(sx1y1 AS DOUBLE) -
      |      2 * theta2 * CAST(sx2y1 AS DOUBLE) AS szz1,
      |    CAST(sy1 AS DOUBLE) - theta1 * CAST(sx11 AS DOUBLE) -
      |      theta2 * CAST(sx21 AS DOUBLE) AS sz1,
      |    CAST(syy2 AS DOUBLE) + theta1 * theta1 * CAST(sx1x12 AS DOUBLE) +
      |      theta2 * theta2 * CAST(sx2x22 AS DOUBLE) +
      |      2 * theta1 * theta2 * CAST(sx1x22 AS DOUBLE) -
      |      2 * theta1 * CAST(sx1y2 AS DOUBLE) -
      |      2 * theta2 * CAST(sx2y2 AS DOUBLE) AS szz2,
      |    CAST(sy2 AS DOUBLE) - theta1 * CAST(sx12 AS DOUBLE) -
      |      theta2 * CAST(sx22 AS DOUBLE) AS sz2
      |  FROM c4),
      |c6 AS (SELECT *,
      |    (CAST(n1 AS DOUBLE) * szz1 - sz1 * sz1) /
      |      (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) +
      |    (CAST(n2 AS DOUBLE) * szz2 - sz2 * sz2) /
      |      (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0))
      |      AS sev
      |  FROM c5),
      |c7 AS (SELECT *, sqrt(sev) AS se,
      |    (theta1 * CAST(b1 AS DOUBLE) + theta2 * CAST(b2 AS DOUBLE)) /
      |      CAST(varynum AS DOUBLE) AS rho2
      |  FROM c6)
      |SELECT 'false' AS grp_lo, 'true' AS grp_hi, CAST(2 AS BIGINT) AS n_groups,
      |  n1 AS n_lo, n2 AS n_hi,
      |  round(theta1, 9) AS theta1, round(theta2, 9) AS theta2,
      |  round(rho2, 9) AS rho2, round(rawy, 9) AS effect_raw,
      |  round(adjeff, 9) AS effect_cuped, round(se, 9) AS se_cuped,
      |  round(adjeff - 1.959964 * se, 9) AS ci_lo,
      |  round(adjeff + 1.959964 * se, 9) AS ci_hi
      |FROM c7""".stripMargin

  /** q330/q331 oracle, generated per spending shape: the q299 cumulative
    * count CTEs, z = Δ̂/√V in the Spark dag's float order, the nano |z|
    * landing, then the boundary comparison against the SAME pinned
    * Lan–DeMets constants the operator broadcasts (full-precision
    * Double.toString round-trips — the solver is spec-anchored to the
    * published tables, so the oracle replays the data path and the
    * constants are the design). The crossed flag is the running max.
    */
  private def gsOracle(spending: String): String = {
    val vals = graft.quality.GroupSequential.boundaries(12, 0.05d, spending)
      .map(b => s"(${b.look}, ${b.t}, ${b.alphaSpent}, ${b.z}, " +
        s"${math.round(b.z * 1e9d)})")
      .mkString(",\n      |    ")
    s"""WITH ev AS (SELECT event_id % 12 AS peek,
      |    user_id % 2 = 0 AS ev_even,
      |    CASE WHEN value >= 250 THEN 1 ELSE 0 END AS hit
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
      |incr AS (SELECT peek,
      |    CAST(sum(CASE WHEN ev_even THEN 1 ELSE 0 END) AS BIGINT) AS bn1,
      |    CAST(sum(CASE WHEN ev_even THEN hit ELSE 0 END) AS BIGINT) AS bs1,
      |    CAST(sum(CASE WHEN NOT ev_even THEN 1 ELSE 0 END) AS BIGINT) AS bn2,
      |    CAST(sum(CASE WHEN NOT ev_even THEN hit ELSE 0 END) AS BIGINT) AS bs2
      |  FROM ev GROUP BY 1),
      |cum AS (SELECT peek,
      |    CAST(row_number() OVER (ORDER BY peek) AS INT) AS look,
      |    CAST(sum(bn1) OVER w AS BIGINT) AS n_lo,
      |    CAST(sum(bs1) OVER w AS BIGINT) AS s_lo,
      |    CAST(sum(bn2) OVER w AS BIGINT) AS n_hi,
      |    CAST(sum(bs2) OVER w AS BIGINT) AS s_hi
      |  FROM incr
      |  WINDOW w AS (ORDER BY peek ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |t AS (SELECT *,
      |    CAST(CAST(s_lo AS HUGEINT) * n_hi - CAST(s_hi AS HUGEINT) * n_lo AS DOUBLE) /
      |      (CAST(n_lo AS DOUBLE) * CAST(n_hi AS DOUBLE)) AS delta,
      |    (CAST(s_lo AS DOUBLE) + CAST(s_hi AS DOUBLE)) /
      |      (CAST(n_lo AS DOUBLE) + CAST(n_hi AS DOUBLE)) AS pp,
      |    n_lo > 0 AND n_hi > 0 AND (s_lo + s_hi) > 0 AND
      |      (s_lo + s_hi) < (n_lo + n_hi) AS usable
      |  FROM cum),
      |v AS (SELECT *,
      |    delta / sqrt(pp * (1 - pp) *
      |      (1.0 / CAST(n_lo AS DOUBLE) + 1.0 / CAST(n_hi AS DOUBLE))) AS z
      |  FROM t),
      |zz AS (SELECT *,
      |    CASE WHEN usable THEN CAST(round(abs(z) * 1e9) AS BIGINT) END AS z9
      |  FROM v),
      |b(look, t_frac, alpha_spent, z_bound, zb9) AS (VALUES
      |    $vals),
      |j AS (SELECT zz.*, b.t_frac, b.alpha_spent, b.z_bound, b.zb9,
      |    CASE WHEN zz.z9 IS NOT NULL THEN zz.z9 >= b.zb9 END AS reject_at
      |  FROM zz JOIN b ON zz.look = b.look)
      |SELECT peek, look, round(t_frac, 9) AS t_frac, n_lo, s_lo, n_hi, s_hi,
      |  CASE WHEN usable THEN round(z, 9) END AS z,
      |  round(alpha_spent, 9) AS alpha_spent, round(z_bound, 9) AS z_bound,
      |  reject_at,
      |  coalesce(max(CASE WHEN reject_at THEN 1 ELSE 0 END)
      |    OVER (ORDER BY peek ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 0,
      |    false) AS crossed
      |FROM j ORDER BY peek""".stripMargin
  }

  /** q332 oracle: [[graft.quality.GroupSequential.groupSequentialMean]]
    * replayed — the q300 cumulative HUGEINT moment CTEs, the Welch
    * plug-in z in the Spark dag's float order, the nano |z| landing,
    * the same pinned OBF K = 12 constants as q330.
    */
  private lazy val gsMeanOracle: String = {
    val vals = graft.quality.GroupSequential.boundaries(12, 0.05d, "obf")
      .map(b => s"(${b.look}, ${b.t}, ${b.alphaSpent}, ${b.z}, " +
        s"${math.round(b.z * 1e9d)})")
      .mkString(",\n      |    ")
    s"""WITH ev AS (SELECT event_id % 12 AS peek,
      |    user_id % 2 = 0 AS ev_even,
      |    CAST(floor(value) AS BIGINT) AS m
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
      |incr AS (SELECT peek,
      |    CAST(sum(CASE WHEN ev_even THEN 1 ELSE 0 END) AS BIGINT) AS bn1,
      |    CAST(sum(CASE WHEN ev_even THEN m ELSE 0 END) AS HUGEINT) AS bs1,
      |    CAST(sum(CASE WHEN ev_even THEN m * m ELSE 0 END) AS HUGEINT) AS bq1,
      |    CAST(sum(CASE WHEN NOT ev_even THEN 1 ELSE 0 END) AS BIGINT) AS bn2,
      |    CAST(sum(CASE WHEN NOT ev_even THEN m ELSE 0 END) AS HUGEINT) AS bs2,
      |    CAST(sum(CASE WHEN NOT ev_even THEN m * m ELSE 0 END) AS HUGEINT) AS bq2
      |  FROM ev GROUP BY 1),
      |cum AS (SELECT peek,
      |    CAST(row_number() OVER (ORDER BY peek) AS INT) AS look,
      |    CAST(sum(bn1) OVER w AS BIGINT) AS n_lo,
      |    CAST(sum(bs1) OVER w AS HUGEINT) AS s1,
      |    CAST(sum(bq1) OVER w AS HUGEINT) AS q1,
      |    CAST(sum(bn2) OVER w AS BIGINT) AS n_hi,
      |    CAST(sum(bs2) OVER w AS HUGEINT) AS s2,
      |    CAST(sum(bq2) OVER w AS HUGEINT) AS q2
      |  FROM incr
      |  WINDOW w AS (ORDER BY peek ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |t AS (SELECT *,
      |    n_lo * q1 - s1 * s1 AS v1n, n_hi * q2 - s2 * s2 AS v2n,
      |    CAST(s1 * n_hi - s2 * n_lo AS DOUBLE) /
      |      (CAST(n_lo AS DOUBLE) * CAST(n_hi AS DOUBLE)) AS delta
      |  FROM cum),
      |v AS (SELECT *,
      |    CAST(v1n AS DOUBLE) / (CAST(n_lo AS DOUBLE) * CAST(n_lo AS DOUBLE) *
      |      (CAST(n_lo AS DOUBLE) - 1.0)) +
      |    CAST(v2n AS DOUBLE) / (CAST(n_hi AS DOUBLE) * CAST(n_hi AS DOUBLE) *
      |      (CAST(n_hi AS DOUBLE) - 1.0)) AS vv,
      |    n_lo >= 2 AND n_hi >= 2 AND (v1n + v2n) > 0 AS usable
      |  FROM t),
      |zz AS (SELECT *,
      |    CASE WHEN usable THEN delta / sqrt(vv) END AS z,
      |    CASE WHEN usable THEN
      |      CAST(round(abs(delta / sqrt(vv)) * 1e9) AS BIGINT) END AS z9
      |  FROM v),
      |b(look, t_frac, alpha_spent, z_bound, zb9) AS (VALUES
      |    $vals),
      |j AS (SELECT zz.*, b.t_frac, b.alpha_spent, b.z_bound, b.zb9,
      |    CASE WHEN zz.z9 IS NOT NULL THEN zz.z9 >= b.zb9 END AS reject_at
      |  FROM zz JOIN b ON zz.look = b.look)
      |SELECT peek, look, round(t_frac, 9) AS t_frac,
      |  n_lo, CAST(s1 AS VARCHAR) AS sum_lo,
      |  n_hi, CAST(s2 AS VARCHAR) AS sum_hi,
      |  CASE WHEN usable THEN round(z, 9) END AS z,
      |  round(alpha_spent, 9) AS alpha_spent, round(z_bound, 9) AS z_bound,
      |  reject_at,
      |  coalesce(max(CASE WHEN reject_at THEN 1 ELSE 0 END)
      |    OVER (ORDER BY peek ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 0,
      |    false) AS crossed
      |FROM j ORDER BY peek""".stripMargin
  }

  /** q333 oracle: [[graft.quality.SequentialTests.msprtOneProportion]]
    * replayed — the q326 per-user arm CTE, designed-unit increments per
    * peek, cumulative counts, Δ̂ = p̂ − 0.5 with the H₀-exact variance
    * 0.25/N, the nano mixture-LR dag (τ² = 2⁻¹²), running-best max,
    * the ln(20) boundary.
    */
  private lazy val srmSequentialOracle: String =
    """WITH pu AS (SELECT DISTINCT user_id,
      |    CASE WHEN user_id % 10 < 5 THEN 'A'
      |      WHEN user_id % 10 < 9 THEN 'B' ELSE 'C' END AS arm,
      |    CAST(user_id % 6 AS BIGINT) AS peek
      |  FROM events WHERE user_id IS NOT NULL),
      |incr AS (SELECT peek, CAST(count(*) AS BIGINT) AS bn,
      |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS bs
      |  FROM pu WHERE arm IN ('A','B') GROUP BY 1),
      |cum AS (SELECT peek,
      |    CAST(sum(bn) OVER w AS BIGINT) AS n,
      |    CAST(sum(bs) OVER w AS BIGINT) AS s
      |  FROM incr
      |  WINDOW w AS (ORDER BY peek ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |t AS (SELECT *,
      |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) - 0.5 AS delta,
      |    (0.5 * (1.0 - 0.5)) / CAST(n AS DOUBLE) AS vv,
      |    n > 0 AS usable
      |  FROM cum),
      |l AS (SELECT *,
      |    CASE WHEN usable THEN CAST(round((0.5 * ln(vv / (vv + 0.000244140625)) +
      |      delta * delta * 0.000244140625 /
      |        (2 * vv * (vv + 0.000244140625))) * 1e9) AS BIGINT) END AS ln_lr9
      |  FROM t),
      |b AS (SELECT *, max(ln_lr9) OVER (ORDER BY peek
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS best9 FROM l)
      |SELECT peek, n, s,
      |  CASE WHEN usable THEN round(delta, 9) END AS delta, ln_lr9,
      |  round(CASE WHEN best9 IS NULL OR best9 <= 0 THEN 1.0
      |    ELSE exp(-CAST(best9 AS DOUBLE) / 1e9) END, 9) AS p_always_valid,
      |  coalesce(best9 >= 2995732274, false) AS reject
      |FROM b ORDER BY peek""".stripMargin

  /** q335 oracle: [[graft.quality.GroupSequential.conditionalPowerTwoProportion]]
    * replayed — the q299 cumulative count CTEs, z/B(t) in the Spark
    * dag's float order, then the three CP conventions with Φ rendered
    * by the SAME NR-Chebyshev fragment the operator evaluates in-engine
    * ([[graft.quality.GroupSequential.phiSqlFragment]] — one source of
    * truth for both float dags).
    */
  private lazy val conditionalPowerOracle: String = {
    import graft.quality.GroupSequential.phiSqlFragment
    def cp(theta: String): String =
      "1.0 - " + phiSqlFragment(
        s"((1.959964 - b - $theta * (1.0 - t_frac)) / sqrt(1.0 - t_frac))")
    s"""WITH ev AS (SELECT event_id % 12 AS peek,
      |    user_id % 2 = 0 AS ev_even,
      |    CASE WHEN value >= 250 THEN 1 ELSE 0 END AS hit
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
      |incr AS (SELECT peek,
      |    CAST(sum(CASE WHEN ev_even THEN 1 ELSE 0 END) AS BIGINT) AS bn1,
      |    CAST(sum(CASE WHEN ev_even THEN hit ELSE 0 END) AS BIGINT) AS bs1,
      |    CAST(sum(CASE WHEN NOT ev_even THEN 1 ELSE 0 END) AS BIGINT) AS bn2,
      |    CAST(sum(CASE WHEN NOT ev_even THEN hit ELSE 0 END) AS BIGINT) AS bs2
      |  FROM ev GROUP BY 1),
      |cum AS (SELECT peek,
      |    CAST(row_number() OVER (ORDER BY peek) AS INT) AS look,
      |    CAST(sum(bn1) OVER w AS BIGINT) AS n_lo,
      |    CAST(sum(bs1) OVER w AS BIGINT) AS s_lo,
      |    CAST(sum(bn2) OVER w AS BIGINT) AS n_hi,
      |    CAST(sum(bs2) OVER w AS BIGINT) AS s_hi
      |  FROM incr
      |  WINDOW w AS (ORDER BY peek ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |t AS (SELECT *,
      |    CAST(look AS DOUBLE) / 12.0 AS t_frac,
      |    CAST(CAST(s_lo AS HUGEINT) * n_hi - CAST(s_hi AS HUGEINT) * n_lo AS DOUBLE) /
      |      (CAST(n_lo AS DOUBLE) * CAST(n_hi AS DOUBLE)) AS delta,
      |    (CAST(s_lo AS DOUBLE) + CAST(s_hi AS DOUBLE)) /
      |      (CAST(n_lo AS DOUBLE) + CAST(n_hi AS DOUBLE)) AS pp,
      |    n_lo > 0 AND n_hi > 0 AND (s_lo + s_hi) > 0 AND
      |      (s_lo + s_hi) < (n_lo + n_hi) AS usable
      |  FROM cum),
      |v AS (SELECT *,
      |    pp * (1 - pp) * (1.0 / CAST(n_lo AS DOUBLE) + 1.0 / CAST(n_hi AS DOUBLE)) AS vv
      |  FROM t),
      |zb AS (SELECT *,
      |    delta / sqrt(vv) AS z,
      |    delta / sqrt(vv) * sqrt(t_frac) AS b,
      |    usable AND look < 12 AS interim
      |  FROM v)
      |SELECT peek, look, round(t_frac, 9) AS t_frac, n_lo, s_lo, n_hi, s_hi,
      |  CASE WHEN usable THEN round(z, 9) END AS z,
      |  CASE WHEN interim THEN round(${cp("0.0")}, 9) END AS cp_null,
      |  CASE WHEN interim THEN round(${cp("(b / t_frac)")}, 9) END AS cp_trend,
      |  CASE WHEN interim THEN
      |    round(${cp("(0.02 / (sqrt(vv) * sqrt(t_frac)))")}, 9) END AS cp_design
      |FROM zb ORDER BY peek""".stripMargin
  }

  /** q336/q337 oracle: the ENTIRE composed survival dashboard replayed
    * from raw events — the shared subject CTE split by cohort, per-
    * cohort KM chains (nano ln terms, exhaustion rule), medians (min t
    * with S ≤ 0.5), τ = 48 RMST segments (UNROUNDED survivals into the
    * nano segment products, the q291 dag), per-cohort event totals, and
    * the q286 log-rank chain — pivoted onto (grp_lo, grp_hi) with the
    * RMST difference from the unrounded values. q337's three-batch fold
    * merges to identical cells, so the from-store read shares this
    * oracle verbatim.
    */
  private lazy val survivalDashboardOracle: String =
    s"""$SurvivalSubjCte,
      |sc AS (SELECT CAST(user_id % 2 = 0 AS VARCHAR) AS grp, t,
      |    CAST(sum(ev) AS BIGINT) AS d, CAST(sum(1 - ev) AS BIGINT) AS c
      |  FROM subj GROUP BY 1, 2),
      |riskk AS (SELECT *,
      |    CAST(sum(d + c) OVER (PARTITION BY grp ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
      |  FROM sc),
      |termsk AS (SELECT *,
      |    CASE WHEN d = 0 THEN 0
      |         WHEN d < n_risk THEN CAST(round(ln(
      |           (CAST(n_risk AS DOUBLE) - CAST(d AS DOUBLE)) /
      |             CAST(n_risk AS DOUBLE)) * 1e9) AS BIGINT) END AS ln9
      |  FROM riskk),
      |acck AS (SELECT *,
      |    max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (PARTITION BY grp
      |      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 AS dead,
      |    sum(ln9) OVER (PARTITION BY grp ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lnsum9
      |  FROM termsk),
      |kmx AS (SELECT grp, t,
      |    CASE WHEN dead THEN 0.0 ELSE exp(CAST(lnsum9 AS DOUBLE) / 1e9) END AS s
      |  FROM acck),
      |med AS (SELECT grp, min(CASE WHEN s <= 0.5 THEN t END) AS med FROM kmx GROUP BY 1),
      |stepsr AS (SELECT grp, t, s,
      |    lag(s, 1, 1.0) OVER (PARTITION BY grp ORDER BY t) AS prev_s,
      |    lag(t, 1, 0) OVER (PARTITION BY grp ORDER BY t) AS prev_t,
      |    row_number() OVER (PARTITION BY grp ORDER BY t DESC) = 1 AS is_last
      |  FROM kmx WHERE t <= 48),
      |segr AS (SELECT grp,
      |    CAST(round(prev_s * 1e9) AS HUGEINT) * (t - prev_t) +
      |      CASE WHEN is_last THEN CAST(round(s * 1e9) AS HUGEINT) * (48 - t)
      |           ELSE 0 END AS seg9
      |  FROM stepsr),
      |rmu AS (SELECT u.grp,
      |    coalesce(CAST(q.s9 AS DOUBLE) / 1e9, 48.0) AS rmst
      |  FROM (SELECT DISTINCT grp FROM kmx) u
      |  LEFT JOIN (SELECT grp, sum(seg9) AS s9 FROM segr GROUP BY 1) q
      |    ON u.grp = q.grp),
      |ec AS (SELECT grp, CAST(sum(d) AS BIGINT) AS events FROM sc GROUP BY 1),
      |lab AS (SELECT *, min(grp) OVER () AS grp_lo, max(grp) OVER () AS grp_hi
      |  FROM sc),
      |spine AS (SELECT grp_lo, grp_hi, t,
      |    CAST(sum(CASE WHEN grp = grp_lo THEN d ELSE 0 END) AS BIGINT) AS d1,
      |    CAST(sum(CASE WHEN grp = grp_lo THEN c ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN grp <> grp_lo THEN d ELSE 0 END) AS BIGINT) AS d2,
      |    CAST(sum(CASE WHEN grp <> grp_lo THEN c ELSE 0 END) AS BIGINT) AS c2
      |  FROM lab GROUP BY 1, 2, 3),
      |riskl AS (SELECT *,
      |    CAST(sum(d1 + c1) OVER (ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n1,
      |    CAST(sum(d2 + c2) OVER (ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n2
      |  FROM spine),
      |termsl AS (SELECT *,
      |    CASE WHEN d1 + d2 > 0 THEN CAST(round(
      |      CAST(d1 + d2 AS DOUBLE) * CAST(n1 AS DOUBLE) /
      |        (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) * 1e9) AS BIGINT)
      |    ELSE 0 END AS e9,
      |    CASE WHEN d1 + d2 > 0 AND n1 + n2 > 1 THEN CAST(round(
      |      CAST(d1 + d2 AS DOUBLE) *
      |        (CAST(n1 AS DOUBLE) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))) *
      |        (CAST(n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))) *
      |        ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - CAST(d1 + d2 AS DOUBLE)) /
      |        ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - 1.0) * 1e9) AS BIGINT)
      |    ELSE 0 END AS v9
      |  FROM riskl),
      |lrs AS (SELECT grp_lo, grp_hi,
      |    CAST(sum(d1) AS BIGINT) AS o_lo,
      |    CAST(sum(d1 + c1) AS BIGINT) AS n_lo,
      |    CAST(sum(d2 + c2) AS BIGINT) AS n_hi,
      |    sum(CAST(e9 AS HUGEINT)) AS e9s, sum(CAST(v9 AS HUGEINT)) AS v9s
      |  FROM termsl GROUP BY 1, 2),
      |per AS (SELECT e.grp, e.events, m.med, r.rmst
      |  FROM ec e JOIN med m ON e.grp = m.grp JOIN rmu r ON e.grp = r.grp),
      |piv AS (SELECT
      |    max(CASE WHEN p.grp = l.grp_lo THEN p.events END) AS events_lo,
      |    max(CASE WHEN p.grp = l.grp_hi THEN p.events END) AS events_hi,
      |    max(CASE WHEN p.grp = l.grp_lo THEN p.med END) AS median_lo,
      |    max(CASE WHEN p.grp = l.grp_hi THEN p.med END) AS median_hi,
      |    max(CASE WHEN p.grp = l.grp_lo THEN p.rmst END) AS rmst_lo,
      |    max(CASE WHEN p.grp = l.grp_hi THEN p.rmst END) AS rmst_hi
      |  FROM per p CROSS JOIN (SELECT DISTINCT grp_lo, grp_hi FROM lab) l)
      |SELECT s.grp_lo, s.grp_hi, CAST(2 AS BIGINT) AS n_groups,
      |  s.n_lo, s.n_hi, p.events_lo, p.events_hi,
      |  CAST(p.median_lo AS BIGINT) AS median_lo,
      |  CAST(p.median_hi AS BIGINT) AS median_hi,
      |  CAST(48 AS BIGINT) AS tau,
      |  round(p.rmst_lo, 9) AS rmst_lo, round(p.rmst_hi, 9) AS rmst_hi,
      |  round(p.rmst_lo - p.rmst_hi, 9) AS rmst_diff,
      |  s.o_lo, CAST(s.e9s AS VARCHAR) AS e_lo_9, CAST(s.v9s AS VARCHAR) AS v_9,
      |  CASE WHEN s.v9s > 0 THEN round((CAST(s.o_lo AS DOUBLE) -
      |    CAST(s.e9s AS DOUBLE) / 1e9) / sqrt(CAST(s.v9s AS DOUBLE) / 1e9), 9)
      |  END AS z,
      |  CASE WHEN s.v9s > 0 THEN round(
      |    ((CAST(s.o_lo AS DOUBLE) - CAST(s.e9s AS DOUBLE) / 1e9) /
      |      sqrt(CAST(s.v9s AS DOUBLE) / 1e9)) *
      |    ((CAST(s.o_lo AS DOUBLE) - CAST(s.e9s AS DOUBLE) / 1e9) /
      |      sqrt(CAST(s.v9s AS DOUBLE) / 1e9)), 9) END AS chi2
      |FROM lrs s CROSS JOIN piv p""".stripMargin

  /** q338 oracle: the corpus data card replayed — md5 digests for the
    * exact-dup surplus, the q289 whitespace-token split, the
    * exactQuantiles rank rules ((n+1) div 2, (9n+9) div 10 on
    * (n_chars, doc_id) order), and the count-desc/lang-asc top-language
    * selection, all per source.
    */
  private lazy val dataCardOracle: String =
    """WITH d AS (SELECT doc_id, text, lang, source, n_chars
      |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
      |    AND lang IS NOT NULL AND source IS NOT NULL AND n_chars IS NOT NULL),
      |base AS (SELECT source,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(count(DISTINCT md5(text)) AS BIGINT) AS uniq,
      |    CAST(sum(len(list_filter(regexp_split_to_array(text, '\s+'),
      |      x -> x <> ''))) AS BIGINT) AS total_tokens,
      |    CAST(sum(n_chars) AS BIGINT) AS chars,
      |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      |  FROM d GROUP BY 1),
      |rk AS (SELECT source, n_chars,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
      |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
      |  FROM d),
      |qs AS (SELECT source,
      |    max(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS p50_chars,
      |    max(CASE WHEN rn = (9 * n + 9) // 10 THEN n_chars END) AS p90_chars
      |  FROM rk GROUP BY 1),
      |lc AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1, 2),
      |top AS (SELECT source, lang AS top_lang, c AS topc FROM (
      |    SELECT *, row_number() OVER (PARTITION BY source
      |      ORDER BY c DESC, lang) AS rn FROM lc) WHERE rn = 1)
      |SELECT b.source, b.n_docs,
      |  b.n_docs - b.uniq AS n_exact_dups,
      |  round(CAST(b.n_docs - b.uniq AS DOUBLE) / CAST(b.n_docs AS DOUBLE), 9)
      |    AS dup_rate,
      |  b.total_tokens,
      |  round(CAST(b.chars AS DOUBLE) / CAST(b.n_docs AS DOUBLE), 9) AS mean_chars,
      |  q.p50_chars, q.p90_chars, b.n_langs, t.top_lang,
      |  round(CAST(t.topc AS DOUBLE) / CAST(b.n_docs AS DOUBLE), 9)
      |    AS top_lang_share
      |FROM base b JOIN qs q ON b.source = q.source
      |JOIN top t ON b.source = t.source
      |ORDER BY b.source""".stripMargin

  /** q341 oracle: [[graft.quality.Association.ebShrinkRates]] replayed
    * — per-type exact counts, the ORDERED cumulative moment fold over
    * the segment frame (last_value carries the full left-to-right sum
    * back, exactly the operator's window trick), the method-of-moments
    * α/β and posterior-mean dags in the Spark float order.
    */
  private lazy val ebShrinkageOracle: String =
    """WITH e AS (SELECT event_type AS grp,
      |    CASE WHEN value >= 250 THEN 1 ELSE 0 END AS hit
      |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
      |c AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(hit) AS BIGINT) AS n_pass FROM e GROUP BY 1),
      |m AS (SELECT *,
      |    CAST(n_pass AS DOUBLE) / CAST(n AS DOUBLE) AS p,
      |    CAST(count(*) OVER () AS BIGINT) AS k
      |  FROM c WHERE n > 0),
      |m2 AS (SELECT grp, n, n_pass, p, k,
      |    last_value(sp) OVER (ORDER BY grp
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS spt,
      |    last_value(sp2) OVER (ORDER BY grp
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS sp2t
      |  FROM (SELECT *,
      |      sum(p) OVER wo AS sp, sum(p * p) OVER wo AS sp2 FROM m
      |    WINDOW wo AS (ORDER BY grp
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))),
      |f AS (SELECT *,
      |    spt / CAST(k AS DOUBLE) AS m1,
      |    sp2t / CAST(k AS DOUBLE) -
      |      (spt / CAST(k AS DOUBLE)) * (spt / CAST(k AS DOUBLE)) AS v
      |  FROM m2),
      |g AS (SELECT *,
      |    (m1 * (1.0 - m1) - v) / v AS ab
      |  FROM f),
      |h AS (SELECT *,
      |    m1 * ab AS alpha, ab - m1 * ab AS beta,
      |    k >= 2 AND v > 0 AND m1 * (1.0 - m1) > v AS ok
      |  FROM g)
      |SELECT grp, n, n_pass, round(p, 9) AS p_raw,
      |  CASE WHEN ok THEN round(alpha, 9) END AS alpha,
      |  CASE WHEN ok THEN round(beta, 9) END AS beta,
      |  CASE WHEN ok THEN round((CAST(n_pass AS DOUBLE) + alpha) /
      |    (CAST(n AS DOUBLE) + ab), 9) END AS p_shrunk
      |FROM h ORDER BY grp""".stripMargin

  /** q342 oracle: [[graft.quality.Association.mhRateRatioFromCounts]]
    * replayed — the q339 per-user CTE keyed additionally by user_id
    * mod 3, per-(stratum, arm) exact sums, per-stratum nano MH
    * numerator/denominator/variance terms in the Spark float order,
    * HUGEINT pooling, the ln-RR CI dags.
    */
  private lazy val mhRateRatioOracle: String =
    """WITH pu AS (SELECT user_id,
      |    CAST(count(*) AS BIGINT) AS ev,
      |    CAST(count(DISTINCT CAST(floor(epoch(ts) / 3600) AS BIGINT)) AS BIGINT)
      |      AS hours,
      |    CAST(user_id % 2 = 0 AS VARCHAR) AS arm,
      |    CAST(user_id % 3 AS VARCHAR) AS st
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |  GROUP BY user_id),
      |c AS (SELECT st,
      |    CAST(sum(CASE WHEN arm = 'false' THEN ev ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN arm = 'false' THEN hours ELSE 0 END) AS BIGINT) AS t1,
      |    CAST(sum(CASE WHEN arm = 'true' THEN ev ELSE 0 END) AS BIGINT) AS c2,
      |    CAST(sum(CASE WHEN arm = 'true' THEN hours ELSE 0 END) AS BIGINT) AS t2
      |  FROM pu GROUP BY 1),
      |t AS (SELECT *,
      |    (c1 > 0 AND t1 = 0) OR (c2 > 0 AND t2 = 0) AS bad,
      |    CASE WHEN t1 + t2 = 0 THEN 0 ELSE CAST(round(
      |      CAST(c1 AS DOUBLE) * CAST(t2 AS DOUBLE) /
      |        CAST(t1 + t2 AS DOUBLE) * 1e9) AS BIGINT) END AS n9,
      |    CASE WHEN t1 + t2 = 0 THEN 0 ELSE CAST(round(
      |      CAST(c2 AS DOUBLE) * CAST(t1 AS DOUBLE) /
      |        CAST(t1 + t2 AS DOUBLE) * 1e9) AS BIGINT) END AS d9,
      |    CASE WHEN t1 + t2 = 0 THEN 0 ELSE CAST(round(
      |      CAST(c1 + c2 AS DOUBLE) * CAST(t1 AS DOUBLE) * CAST(t2 AS DOUBLE) /
      |        (CAST(t1 + t2 AS DOUBLE) * CAST(t1 + t2 AS DOUBLE)) * 1e9) AS BIGINT)
      |    END AS v9
      |  FROM c),
      |s AS (SELECT
      |    CAST(sum(CASE WHEN bad THEN 0 ELSE 1 END) AS BIGINT) AS n_strata,
      |    CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_strata_dropped,
      |    CAST(sum(CASE WHEN bad THEN 0 ELSE c1 END) AS BIGINT) AS events_lo,
      |    CAST(sum(CASE WHEN bad THEN 0 ELSE t1 END) AS BIGINT) AS exposure_lo,
      |    CAST(sum(CASE WHEN bad THEN 0 ELSE c2 END) AS BIGINT) AS events_hi,
      |    CAST(sum(CASE WHEN bad THEN 0 ELSE t2 END) AS BIGINT) AS exposure_hi,
      |    sum(CAST(CASE WHEN bad THEN 0 ELSE n9 END AS HUGEINT)) AS num9,
      |    sum(CAST(CASE WHEN bad THEN 0 ELSE d9 END AS HUGEINT)) AS den9,
      |    sum(CAST(CASE WHEN bad THEN 0 ELSE v9 END AS HUGEINT)) AS var9
      |  FROM t),
      |f AS (SELECT *,
      |    CAST(num9 AS DOUBLE) / 1e9 AS numd,
      |    CAST(den9 AS DOUBLE) / 1e9 AS dend
      |  FROM s),
      |g AS (SELECT *,
      |    numd / dend AS rr,
      |    sqrt(CAST(var9 AS DOUBLE) / 1e9 / (numd * dend)) AS se
      |  FROM f)
      |SELECT 'false' AS grp_lo, 'true' AS grp_hi, CAST(2 AS BIGINT) AS n_groups,
      |  n_strata, n_strata_dropped,
      |  events_lo, exposure_lo, events_hi, exposure_hi,
      |  round(rr, 9) AS rate_ratio_mh, round(se, 9) AS se_ln_rr,
      |  round(exp(ln(rr) - 1.959964 * se), 9) AS ci_lo,
      |  round(exp(ln(rr) + 1.959964 * se), 9) AS ci_hi
      |FROM g""".stripMargin

  /** q339 oracle: [[graft.quality.Association.rateRatio]] replayed —
    * per-user exact event counts + distinct-active-hour exposure, arm
    * sums, the rate/ln-RR/exp-CI dags in the Spark float order.
    */
  private lazy val rateRatioOracle: String =
    """WITH pu AS (SELECT user_id,
      |    CAST(count(*) AS BIGINT) AS ev,
      |    CAST(count(DISTINCT CAST(floor(epoch(ts) / 3600) AS BIGINT)) AS BIGINT)
      |      AS hours,
      |    CAST(user_id % 2 = 0 AS VARCHAR) AS arm
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |  GROUP BY user_id),
      |c AS (SELECT
      |    CAST(sum(CASE WHEN arm = 'false' THEN ev ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN arm = 'false' THEN hours ELSE 0 END) AS BIGINT) AS t1,
      |    CAST(sum(CASE WHEN arm = 'true' THEN ev ELSE 0 END) AS BIGINT) AS c2,
      |    CAST(sum(CASE WHEN arm = 'true' THEN hours ELSE 0 END) AS BIGINT) AS t2
      |  FROM pu),
      |f AS (SELECT *,
      |    CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE) AS r1,
      |    CAST(c2 AS DOUBLE) / CAST(t2 AS DOUBLE) AS r2,
      |    sqrt(1.0 / CAST(c1 AS DOUBLE) + 1.0 / CAST(c2 AS DOUBLE)) AS se
      |  FROM c)
      |SELECT 'false' AS grp_lo, 'true' AS grp_hi, CAST(2 AS BIGINT) AS n_groups,
      |  c1 AS events_lo, t1 AS exposure_lo, c2 AS events_hi, t2 AS exposure_hi,
      |  round(r1, 9) AS rate_lo, round(r2, 9) AS rate_hi,
      |  round(r1 / r2, 9) AS rate_ratio, round(se, 9) AS se_ln_rr,
      |  round(exp(ln(r1 / r2) - 1.959964 * se), 9) AS ci_lo,
      |  round(exp(ln(r1 / r2) + 1.959964 * se), 9) AS ci_hi
      |FROM f""".stripMargin

  /** q340 oracle: [[graft.quality.Association.diffInDiff]] replayed —
    * the 2×2 (parity group × hour-parity period) exact HUGEINT moment
    * cells, per-cell means and sample variances, the DiD and four-cell
    * se dags in the Spark float order.
    */
  private lazy val diffInDiffOracle: String =
    """WITH ev AS (SELECT
      |    CAST(user_id % 2 = 0 AS VARCHAR) AS grp,
      |    CASE WHEN CAST(floor(epoch(ts) / 3600) AS BIGINT) % 2 = 0
      |      THEN 'p0_pre' ELSE 'p1_post' END AS per,
      |    CAST(floor(value) AS BIGINT) AS y
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |    AND value IS NOT NULL),
      |cells AS (SELECT grp, per, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(y) AS HUGEINT) AS s,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS q
      |  FROM ev GROUP BY 1, 2),
      |w AS (SELECT
      |    max(CASE WHEN grp = 'false' AND per = 'p0_pre' THEN n END) AS n_cl,
      |    max(CASE WHEN grp = 'false' AND per = 'p0_pre' THEN s END) AS s_cl,
      |    max(CASE WHEN grp = 'false' AND per = 'p0_pre' THEN q END) AS q_cl,
      |    max(CASE WHEN grp = 'false' AND per = 'p1_post' THEN n END) AS n_ch,
      |    max(CASE WHEN grp = 'false' AND per = 'p1_post' THEN s END) AS s_ch,
      |    max(CASE WHEN grp = 'false' AND per = 'p1_post' THEN q END) AS q_ch,
      |    max(CASE WHEN grp = 'true' AND per = 'p0_pre' THEN n END) AS n_tl,
      |    max(CASE WHEN grp = 'true' AND per = 'p0_pre' THEN s END) AS s_tl,
      |    max(CASE WHEN grp = 'true' AND per = 'p0_pre' THEN q END) AS q_tl,
      |    max(CASE WHEN grp = 'true' AND per = 'p1_post' THEN n END) AS n_th,
      |    max(CASE WHEN grp = 'true' AND per = 'p1_post' THEN s END) AS s_th,
      |    max(CASE WHEN grp = 'true' AND per = 'p1_post' THEN q END) AS q_th
      |  FROM cells),
      |f AS (SELECT *,
      |    (CAST(s_th AS DOUBLE) / CAST(n_th AS DOUBLE) -
      |     CAST(s_tl AS DOUBLE) / CAST(n_tl AS DOUBLE)) -
      |    (CAST(s_ch AS DOUBLE) / CAST(n_ch AS DOUBLE) -
      |     CAST(s_cl AS DOUBLE) / CAST(n_cl AS DOUBLE)) AS did,
      |    sqrt(
      |      CAST(n_th * q_th - s_th * s_th AS DOUBLE) /
      |        (CAST(n_th AS DOUBLE) * CAST(n_th AS DOUBLE) * (CAST(n_th AS DOUBLE) - 1.0)) +
      |      CAST(n_tl * q_tl - s_tl * s_tl AS DOUBLE) /
      |        (CAST(n_tl AS DOUBLE) * CAST(n_tl AS DOUBLE) * (CAST(n_tl AS DOUBLE) - 1.0)) +
      |      CAST(n_ch * q_ch - s_ch * s_ch AS DOUBLE) /
      |        (CAST(n_ch AS DOUBLE) * CAST(n_ch AS DOUBLE) * (CAST(n_ch AS DOUBLE) - 1.0)) +
      |      CAST(n_cl * q_cl - s_cl * s_cl AS DOUBLE) /
      |        (CAST(n_cl AS DOUBLE) * CAST(n_cl AS DOUBLE) * (CAST(n_cl AS DOUBLE) - 1.0))
      |    ) AS se
      |  FROM w)
      |SELECT 'false' AS grp_lo, 'true' AS grp_hi,
      |  'p0_pre' AS per_lo, 'p1_post' AS per_hi,
      |  CAST(2 AS BIGINT) AS n_groups, CAST(2 AS BIGINT) AS n_periods,
      |  round(CAST(s_cl AS DOUBLE) / CAST(n_cl AS DOUBLE), 9) AS mean_ctrl_pre,
      |  round(CAST(s_ch AS DOUBLE) / CAST(n_ch AS DOUBLE), 9) AS mean_ctrl_post,
      |  round(CAST(s_tl AS DOUBLE) / CAST(n_tl AS DOUBLE), 9) AS mean_treat_pre,
      |  round(CAST(s_th AS DOUBLE) / CAST(n_th AS DOUBLE), 9) AS mean_treat_post,
      |  round(did, 9) AS did, round(se, 9) AS se_did,
      |  round(did - 1.959964 * se, 9) AS ci_lo,
      |  round(did + 1.959964 * se, 9) AS ci_hi
      |FROM f""".stripMargin

  /** q334 oracle: [[graft.quality.Association.metaAnalysis]] replayed —
    * per-event-type exact counts, the Wald risk-difference effect/se in
    * the Spark dag's float order, then the two ORDERED cumulative
    * window passes (binary stratum order, left-to-right double fold —
    * exactly the operator's summation order) for the fixed pool, Q/I²,
    * DL τ², and the random pool.
    */
  private lazy val metaEffectsOracle: String =
    """WITH ev AS (SELECT event_type AS stratum,
      |    user_id % 2 = 0 AS ev_even,
      |    CASE WHEN value >= 250 THEN 1 ELSE 0 END AS hit
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
      |    AND event_type IS NOT NULL),
      |cells AS (SELECT stratum,
      |    CAST(sum(CASE WHEN ev_even THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN ev_even THEN hit ELSE 0 END) AS BIGINT) AS s1,
      |    CAST(sum(CASE WHEN NOT ev_even THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(sum(CASE WHEN NOT ev_even THEN hit ELSE 0 END) AS BIGINT) AS s2
      |  FROM ev GROUP BY 1),
      |eff AS (SELECT stratum,
      |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
      |      CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS e,
      |    sqrt(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) *
      |        (1.0 - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / CAST(n1 AS DOUBLE) +
      |      CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) *
      |        (1.0 - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) / CAST(n2 AS DOUBLE))
      |      AS se
      |  FROM cells),
      |p1 AS (SELECT stratum, e, se, 1.0 / (se * se) AS w,
      |    sum(1.0 / (se * se)) OVER wo AS sw,
      |    sum(1.0 / (se * se) * e) OVER wo AS swe,
      |    sum(1.0 / (se * se) * e * e) OVER wo AS swe2,
      |    sum((1.0 / (se * se)) * (1.0 / (se * se))) OVER wo AS sww,
      |    CAST(count(*) OVER () AS BIGINT) AS k,
      |    CAST(row_number() OVER (ORDER BY stratum) AS BIGINT) AS rn
      |  FROM eff WHERE se > 0 AND e IS NOT NULL
      |  WINDOW wo AS (ORDER BY stratum ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |s1g AS (SELECT * FROM p1 WHERE rn = k),
      |s2g AS (SELECT *,
      |    swe / sw AS eff_f, sqrt(1.0 / sw) AS se_f,
      |    swe2 - swe * swe / sw AS q, CAST(k AS DOUBLE) - 1.0 AS dfq
      |  FROM s1g),
      |s3g AS (SELECT *,
      |    CASE WHEN q > dfq THEN (q - dfq) / q ELSE 0.0 END AS i2,
      |    CASE WHEN q > dfq AND (sw - sww / sw) > 0
      |      THEN (q - dfq) / (sw - sww / sw) ELSE 0.0 END AS tau2
      |  FROM s2g),
      |p2 AS (SELECT f.stratum, f.e,
      |    1.0 / (f.se * f.se + g.tau2) AS wr,
      |    sum(1.0 / (f.se * f.se + g.tau2)) OVER wo AS swr,
      |    sum(1.0 / (f.se * f.se + g.tau2) * f.e) OVER wo AS swre,
      |    CAST(count(*) OVER () AS BIGINT) AS k2,
      |    CAST(row_number() OVER (ORDER BY f.stratum) AS BIGINT) AS rn
      |  FROM eff f CROSS JOIN s3g g WHERE f.se > 0 AND f.e IS NOT NULL
      |  WINDOW wo AS (ORDER BY f.stratum ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |rnd AS (SELECT swre / swr AS eff_r, sqrt(1.0 / swr) AS se_r
      |  FROM p2 WHERE rn = k2),
      |drp AS (SELECT CAST(sum(CASE WHEN se > 0 AND e IS NOT NULL THEN 0 ELSE 1 END)
      |    AS BIGINT) AS n_dropped FROM eff)
      |SELECT g.k AS n_strata, d.n_dropped,
      |  round(g.eff_f, 9) AS effect_fixed, round(g.se_f, 9) AS se_fixed,
      |  round(g.eff_f - 1.959964 * g.se_f, 9) AS ci_fixed_lo,
      |  round(g.eff_f + 1.959964 * g.se_f, 9) AS ci_fixed_hi,
      |  round(g.q, 9) AS q, CAST(g.dfq AS BIGINT) AS df,
      |  round(g.i2, 9) AS i2, round(g.tau2, 9) AS tau2_dl,
      |  round(r.eff_r, 9) AS effect_random, round(r.se_r, 9) AS se_random,
      |  round(r.eff_r - 1.959964 * r.se_r, 9) AS ci_random_lo,
      |  round(r.eff_r + 1.959964 * r.se_r, 9) AS ci_random_hi
      |FROM s3g g CROSS JOIN rnd r CROSS JOIN drp d""".stripMargin

  /** q328 oracle: [[graft.quality.Association.powerTwoProportionFromCounts]]
    * replayed — the q326 per-user CTE, designed-arm exact counts, pooled
    * p̄, the pinned-z MDE/required-n closed forms with the z-sum and
    * squares formed as literal additions/multiplications (the engines'
    * doubles then agree bit-for-bit).
    */
  private lazy val powerTwoPropOracle: String =
    """WITH pu AS (SELECT user_id,
      |    CASE WHEN user_id % 10 < 5 THEN 'A'
      |      WHEN user_id % 10 < 9 THEN 'B' ELSE 'C' END AS arm,
      |    CASE WHEN max(CASE WHEN value >= 250 THEN 1 ELSE 0 END) > 0
      |      THEN 1 ELSE 0 END AS hit
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |c AS (SELECT
      |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN arm = 'A' THEN hit ELSE 0 END) AS BIGINT) AS s1,
      |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(sum(CASE WHEN arm = 'B' THEN hit ELSE 0 END) AS BIGINT) AS s2
      |  FROM pu WHERE arm IN ('A','B')),
      |f AS (SELECT *,
      |    CAST(s1 + s2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) AS pp
      |  FROM c),
      |g AS (SELECT *,
      |    (1.959964 + 0.841621) *
      |      sqrt(pp * (1.0 - pp) * (1.0 / CAST(n1 AS DOUBLE) +
      |        1.0 / CAST(n2 AS DOUBLE))) AS mde
      |  FROM f)
      |SELECT 'A' AS grp_lo, 'B' AS grp_hi, CAST(2 AS BIGINT) AS n_groups,
      |  n1 AS n_lo, n2 AS n_hi, round(pp, 9) AS p_pool,
      |  round(mde, 9) AS mde_abs, round(mde / pp, 9) AS mde_rel,
      |  CAST(ceil(2.0 * (pp * (1.0 - pp)) *
      |    ((1.959964 + 0.841621) * (1.959964 + 0.841621)) /
      |    (0.05 * 0.05)) AS BIGINT) AS n_required_per_arm
      |FROM g""".stripMargin

  /** q380/q381 oracle: [[graft.quality.BayesRate.bayesRateKArmFromCells]]
    * replayed — the k-arm increment state, the conjugate integer
    * posteriors, the landed-log term series (both α-variants on one
    * j-frame), the 1e15-quantized terms, the three NB tail sums, and
    * the loss dags in the operator's float order.
    */
  private lazy val bayesRateOracle: String =
    """WITH ev AS (SELECT user_id, value,
      |    CASE WHEN user_id % 20 < 8 THEN 'A'
      |      WHEN user_id % 20 < 14 THEN 'B'
      |      WHEN user_id % 20 < 18 THEN 'C'
      |      WHEN user_id % 20 < 19 THEN 'D' ELSE 'E' END AS arm
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
      |inc AS (SELECT arm, CAST(user_id % 6 AS BIGINT) AS peek,
      |    CAST(count(*) AS BIGINT) AS e,
      |    CAST(sum(CASE WHEN value >= (CASE WHEN arm = 'B' THEN 170.0
      |      WHEN arm = 'D' THEN 130.0 ELSE 150.0 END) THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c
      |  FROM ev WHERE arm IN ('A','B','C','D') GROUP BY 1, 2),
      |spine AS (SELECT a.arm, p.peek
      |  FROM (VALUES ('A'), ('B'), ('C'), ('D')) a(arm)
      |  CROSS JOIN (SELECT DISTINCT peek FROM inc) p),
      |cum AS (SELECT arm, peek,
      |    CAST(sum(coalesce(i.e, 0)) OVER w AS BIGINT) AS e,
      |    CAST(sum(coalesce(i.c, 0)) OVER w AS BIGINT) AS c
      |  FROM spine sp LEFT JOIN inc i USING (arm, peek)
      |  WINDOW w AS (PARTITION BY arm ORDER BY peek
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |post AS (SELECT *, 1 + c AS a_post, 1 + e AS b_post FROM cum),
      |pair AS (SELECT t.arm, t.peek,
      |    t.e AS e_arm, t.c AS c_arm, t.a_post AS at, t.b_post AS bt,
      |    c.e AS e_ctl, c.c AS c_ctl, c.a_post AS ac, c.b_post AS bc
      |  FROM post t JOIN post c ON t.peek = c.peek
      |    AND t.arm <> 'A' AND c.arm = 'A'),
      |base AS (SELECT *,
      |    CAST(round(ln(CAST(bt AS DOUBLE) / CAST(bt + bc AS DOUBLE)) * 1e12)
      |      AS BIGINT) AS lnp12,
      |    CAST(round(ln(CAST(bc AS DOUBLE) / CAST(bt + bc AS DOUBLE)) * 1e12)
      |      AS BIGINT) AS lnq12
      |  FROM pair),
      |jf AS (SELECT *, unnest(range(0, at + 1)) AS j FROM base),
      |lr AS (SELECT *,
      |    CASE WHEN j = 0 THEN 0 ELSE
      |      CAST(round(ln((CAST(ac AS DOUBLE) + CAST(j AS DOUBLE) - 1.0) /
      |        CAST(j AS DOUBLE)) * 1e12) AS BIGINT) END AS lra12,
      |    CASE WHEN j = 0 THEN 0 ELSE
      |      CAST(round(ln((CAST(ac AS DOUBLE) + CAST(j AS DOUBLE)) /
      |        CAST(j AS DOUBLE)) * 1e12) AS BIGINT) END AS lrb12
      |  FROM jf),
      |wl AS (SELECT *,
      |    sum(lra12 + lnp12) OVER wj - lnp12 + ac * lnq12 AS la12,
      |    sum(lrb12 + lnp12) OVER wj - lnp12 + (ac + 1) * lnq12 AS lb12
      |  FROM lr
      |  WINDOW wj AS (PARTITION BY arm, peek ORDER BY j
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |tm AS (SELECT *,
      |    CASE WHEN la12 < -80000000000000 THEN 0 ELSE
      |      CAST(round(exp(CAST(la12 AS DOUBLE) / 1e12) * 1e15) AS BIGINT)
      |      END AS ta15,
      |    CASE WHEN lb12 < -80000000000000 THEN 0 ELSE
      |      CAST(round(exp(CAST(lb12 AS DOUBLE) / 1e12) * 1e15) AS BIGINT)
      |      END AS tb15
      |  FROM wl),
      |agg AS (SELECT arm, peek, max(e_arm) AS e_arm, max(c_arm) AS c_arm,
      |    max(at) AS at, max(bt) AS bt,
      |    max(e_ctl) AS e_ctl, max(c_ctl) AS c_ctl,
      |    max(ac) AS ac, max(bc) AS bc,
      |    sum(CAST(CASE WHEN j < at THEN ta15 ELSE 0 END AS HUGEINT)) AS s0,
      |    sum(CAST(ta15 AS HUGEINT)) AS s1,
      |    sum(CAST(CASE WHEN j < at THEN tb15 ELSE 0 END AS HUGEINT)) AS s2
      |  FROM tm GROUP BY 1, 2),
      |fin AS (SELECT *,
      |    CAST(s0 AS DOUBLE) / 1e15 AS p0,
      |    CAST(s1 AS DOUBLE) / 1e15 AS p1,
      |    CAST(s2 AS DOUBLE) / 1e15 AS p2,
      |    CAST(at AS DOUBLE) / CAST(bt AS DOUBLE) AS mt,
      |    CAST(ac AS DOUBLE) / CAST(bc AS DOUBLE) AS mc,
      |    sqrt(CAST(at AS DOUBLE)) / CAST(bt AS DOUBLE) AS sdt,
      |    sqrt(CAST(ac AS DOUBLE)) / CAST(bc AS DOUBLE) AS sdc
      |  FROM agg)
      |SELECT peek, arm, e_arm, c_arm,
      |  at AS a_arm, bt AS b_arm,
      |  round(mt, 9) AS post_mean_arm, round(sdt, 9) AS post_sd_arm,
      |  round(mt - 1.959964 * sdt, 9) AS cred_lo_arm,
      |  round(mt + 1.959964 * sdt, 9) AS cred_hi_arm,
      |  e_ctl, c_ctl, ac AS a_ctl, bc AS b_ctl,
      |  round(mc, 9) AS post_mean_ctl, round(sdc, 9) AS post_sd_ctl,
      |  round(mc - 1.959964 * sdc, 9) AS cred_lo_ctl,
      |  round(mc + 1.959964 * sdc, 9) AS cred_hi_ctl,
      |  round(p0, 9) AS p_beat_ctl,
      |  round(mc * (1.0 - p2) - mt * (1.0 - p1), 9) AS exp_loss_arm,
      |  round(mt * p1 - mc * p2, 9) AS exp_loss_ctl
      |FROM fin ORDER BY peek, arm""".stripMargin

  /** q378/q379 oracle: [[graft.quality.RatioMetric.ratioCupedFromCells]]
    * replayed — the split-period per-user fixture, the 14-moment
    * HUGEINT cells per (cmp, arm), the 2-label pivot, then the
    * delta-method linearization pieces, the within-arm pooled θ, and
    * the optimal-θ variance identity in the operator's float order
    * (V-terms generated mechanically).
    */
  private lazy val ratioCupedOracle: String = {
    // V_ab for side s: CAST(n AS HUGEINT)*sab - sa*sb (exact)
    def v(ab: String, a: String, b: String, s: String) =
      s"(CAST(n$s AS HUGEINT) * $ab$s - $a$s * $b$s)"
    def armPieces(s: String): String =
      s"""    CASE WHEN sx$s <> 0 THEN CAST(sy$s AS DOUBLE) /
        |      CAST(sx$s AS DOUBLE) END AS r$s,
        |    CASE WHEN sq$s <> 0 THEN CAST(sp$s AS DOUBLE) /
        |      CAST(sq$s AS DOUBLE) END AS rp$s""".stripMargin
    def armStats(s: String): String = {
      val live = s"n$s >= 2 AND sx$s <> 0 AND sq$s <> 0"
      s"""    CASE WHEN $live THEN greatest(
        |      (CAST(${v("syy", "sy", "sy", s)} AS DOUBLE) -
        |        2.0 * r$s * CAST(${v("sxy", "sy", "sx", s)} AS DOUBLE) +
        |        r$s * r$s * CAST(${v("sxx", "sx", "sx", s)} AS DOUBLE)) /
        |      ((CAST(n$s AS DOUBLE) - 1.0) *
        |        CAST(sx$s * sx$s AS DOUBLE)), 0.0) END AS v$s,
        |    CASE WHEN $live THEN greatest(
        |      (CAST(${v("spp", "sp", "sp", s)} AS DOUBLE) -
        |        2.0 * rp$s * CAST(${v("sqp", "sp", "sq", s)} AS DOUBLE) +
        |        rp$s * rp$s * CAST(${v("sqq", "sq", "sq", s)} AS DOUBLE)) /
        |      ((CAST(n$s AS DOUBLE) - 1.0) *
        |        CAST(sq$s * sq$s AS DOUBLE)), 0.0) END AS vp$s,
        |    CASE WHEN $live THEN
        |      (CAST(${v("syp", "sy", "sp", s)} AS DOUBLE) -
        |        rp$s * CAST(${v("syq", "sy", "sq", s)} AS DOUBLE) -
        |        r$s * CAST(${v("sxp", "sx", "sp", s)} AS DOUBLE) +
        |        r$s * rp$s * CAST(${v("sxq", "sx", "sq", s)} AS DOUBLE)) /
        |      ((CAST(n$s AS DOUBLE) - 1.0) *
        |        CAST(sx$s * sq$s AS DOUBLE)) END AS cv$s""".stripMargin
    }
    val moms = Seq("n", "sy", "sx", "sp", "sq", "syy", "sxx", "sxy",
      "spp", "sqq", "sqp", "syp", "syq", "sxp", "sxq")
    def side(s: String, lbl: String) = moms.map(m =>
      s"max(CASE WHEN grp = l.$lbl THEN $m END) AS $m$s").mkString(",\n|    ")
    s"""WITH ev AS (SELECT user_id, event_id, event_type, value,
      |    CASE WHEN user_id % 20 < 8 THEN 'A'
      |      WHEN user_id % 20 < 14 THEN 'B'
      |      WHEN user_id % 20 < 18 THEN 'C'
      |      WHEN user_id % 20 < 19 THEN 'D' ELSE 'E' END AS arm
      |  FROM events WHERE user_id IS NOT NULL),
      |pu AS (SELECT user_id, arm,
      |    CAST(sum(CASE WHEN event_id % 2 <> 0 AND ((CASE
      |      WHEN arm = 'B' THEN event_type = 'click' AND value >= 30.0
      |      WHEN arm = 'D' THEN event_type IN ('click', 'purchase')
      |      ELSE event_type = 'click' END) OR (user_id % 7 < 2 AND
      |      event_type = 'purchase')) THEN 1 ELSE 0 END) AS BIGINT) AS y,
      |    CAST(sum(CASE WHEN event_id % 2 <> 0 AND event_type = 'view'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 AND (event_type = 'click'
      |      OR (user_id % 7 < 2 AND event_type = 'purchase'))
      |      THEN 1 ELSE 0 END) AS BIGINT) AS p,
      |    CAST(sum(CASE WHEN event_id % 2 = 0 AND event_type = 'view'
      |      THEN 1 ELSE 0 END) AS BIGINT) AS q
      |  FROM ev GROUP BY 1, 2),
      |un AS (SELECT 'AB' AS cmp, arm AS grp, y, x, p, q FROM pu
      |    WHERE arm IN ('A', 'B')
      |  UNION ALL SELECT 'AD', arm, y, x, p, q FROM pu
      |    WHERE arm IN ('A', 'D')),
      |cells AS (SELECT cmp, grp, CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(y AS HUGEINT)) AS sy, sum(CAST(x AS HUGEINT)) AS sx,
      |    sum(CAST(p AS HUGEINT)) AS sp, sum(CAST(q AS HUGEINT)) AS sq,
      |    sum(CAST(y AS HUGEINT) * y) AS syy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy,
      |    sum(CAST(p AS HUGEINT) * p) AS spp,
      |    sum(CAST(q AS HUGEINT) * q) AS sqq,
      |    sum(CAST(q AS HUGEINT) * p) AS sqp,
      |    sum(CAST(y AS HUGEINT) * p) AS syp,
      |    sum(CAST(y AS HUGEINT) * q) AS syq,
      |    sum(CAST(x AS HUGEINT) * p) AS sxp,
      |    sum(CAST(x AS HUGEINT) * q) AS sxq
      |  FROM un GROUP BY 1, 2),
      |lab AS (SELECT cmp, min(grp) AS grp_lo, max(grp) AS grp_hi,
      |    CAST(count(*) AS BIGINT) AS ngrps FROM cells GROUP BY 1),
      |wide AS (SELECT c.cmp, l.grp_lo, l.grp_hi, l.ngrps,
      |    ${side("1", "grp_lo")},
      |    ${side("2", "grp_hi")}
      |  FROM cells c JOIN lab l ON c.cmp = l.cmp
      |  GROUP BY 1, 2, 3, 4),
      |st0 AS (SELECT *,
      |${armPieces("1")},
      |${armPieces("2")}
      |  FROM wide),
      |st1 AS (SELECT *,
      |${armStats("1")},
      |${armStats("2")}
      |  FROM st0),
      |st2 AS (SELECT *,
      |    CASE WHEN sx1 <> 0 AND sx2 <> 0 THEN
      |      CAST(sy1 * sx2 - sy2 * sx1 AS DOUBLE) /
      |      (CAST(sx1 AS DOUBLE) * CAST(sx2 AS DOUBLE)) END AS draw,
      |    CASE WHEN sq1 <> 0 AND sq2 <> 0 THEN
      |      CAST(sp1 * sq2 - sp2 * sq1 AS DOUBLE) /
      |      (CAST(sq1 AS DOUBLE) * CAST(sq2 AS DOUBLE)) END AS dpre,
      |    v1 + v2 AS vr, vp1 + vp2 AS vpre, cv1 + cv2 AS cov
      |  FROM st1),
      |st3 AS (SELECT *,
      |    CASE WHEN vpre > 0 THEN cov / vpre END AS theta
      |  FROM st2),
      |st4 AS (SELECT *,
      |    greatest(vr - cov * theta, 0.0) AS varc,
      |    ngrps = 2 AND n1 >= 2 AND n2 >= 2 AND vpre > 0 AND
      |      vr IS NOT NULL AND cov IS NOT NULL AS ok
      |  FROM st3)
      |SELECT cmp, grp_lo, grp_hi, ngrps AS n_groups,
      |  CASE WHEN ngrps = 2 THEN n1 END AS n_lo,
      |  CASE WHEN ngrps = 2 THEN n2 END AS n_hi,
      |  CASE WHEN ngrps = 2 THEN round(r1, 9) END AS ratio_lo,
      |  CASE WHEN ngrps = 2 THEN round(r2, 9) END AS ratio_hi,
      |  CASE WHEN ngrps = 2 THEN round(draw, 9) END AS delta_raw,
      |  CASE WHEN ngrps = 2 AND vr IS NOT NULL THEN round(sqrt(vr), 9) END
      |    AS se_raw,
      |  CASE WHEN ok THEN round(theta, 9) END AS theta,
      |  CASE WHEN ok AND vr > 0 THEN
      |    round((cov * cov) / (vpre * vr), 9) END AS rho2,
      |  CASE WHEN ok THEN round(draw - theta * dpre, 9) END AS delta_cuped,
      |  CASE WHEN ok THEN round(sqrt(varc), 9) END AS se_cuped,
      |  CASE WHEN ok THEN
      |    round(draw - theta * dpre - 1.959964 * sqrt(varc), 9) END AS ci_lo,
      |  CASE WHEN ok THEN
      |    round(draw - theta * dpre + 1.959964 * sqrt(varc), 9) END AS ci_hi
      |FROM st4 ORDER BY cmp""".stripMargin
  }

  /** q377 oracle: [[graft.quality.Association.powerRateFromCounts]]
    * replayed — parity-arm exposure/incident counts, the pooled-λ
    * Poisson MDE and required-exposure dags at the pinned z literals.
    */
  private lazy val powerRateOracle: String =
    """WITH c AS (SELECT
      |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS e1,
      |    CAST(sum(CASE WHEN user_id % 2 = 0 AND value >= 150 THEN 1
      |      ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS e2,
      |    CAST(sum(CASE WHEN user_id % 2 <> 0 AND value >= 150 THEN 1
      |      ELSE 0 END) AS BIGINT) AS c2
      |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
      |f AS (SELECT *,
      |    CAST(c1 + c2 AS DOUBLE) / CAST(e1 + e2 AS DOUBLE) AS lam
      |  FROM c),
      |g AS (SELECT *,
      |    (1.959964 + 0.841621) * sqrt(lam * (1.0 / CAST(e1 AS DOUBLE) +
      |      1.0 / CAST(e2 AS DOUBLE))) AS mde
      |  FROM f)
      |SELECT 'even' AS grp_lo, 'odd' AS grp_hi, CAST(2 AS BIGINT) AS n_groups,
      |  e1 AS e_lo, e2 AS e_hi, round(lam, 9) AS lambda_pool,
      |  round(mde, 9) AS mde_abs, round(mde / lam, 9) AS mde_rel,
      |  CAST(ceil(2.0 * lam *
      |    ((1.959964 + 0.841621) * (1.959964 + 0.841621)) /
      |    (0.005 * 0.005)) AS BIGINT) AS e_required_per_arm
      |FROM g""".stripMargin

  /** q329 oracle: [[graft.quality.Association.powerMeanFromMoments]]
    * replayed — the q326 per-user outcome y, designed-arm exact HUGEINT
    * moments, the (V₁/n₁ + V₂/n₂)/(n₁+n₂−2) pooled variance and the
    * pinned-z MDE/required-n dags.
    */
  private lazy val powerMeanOracle: String =
    """WITH pu AS (SELECT user_id,
      |    CASE WHEN user_id % 10 < 5 THEN 'A'
      |      WHEN user_id % 10 < 9 THEN 'B' ELSE 'C' END AS arm,
      |    CAST(sum(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS y
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |c AS (SELECT
      |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN arm = 'A' THEN y ELSE 0 END) AS HUGEINT) AS sy1,
      |    CAST(sum(CASE WHEN arm = 'A' THEN CAST(y AS HUGEINT) * y ELSE 0 END)
      |      AS HUGEINT) AS syy1,
      |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(sum(CASE WHEN arm = 'B' THEN y ELSE 0 END) AS HUGEINT) AS sy2,
      |    CAST(sum(CASE WHEN arm = 'B' THEN CAST(y AS HUGEINT) * y ELSE 0 END)
      |      AS HUGEINT) AS syy2
      |  FROM pu WHERE arm IN ('A','B')),
      |f AS (SELECT *,
      |    CAST(n1 * syy1 - sy1 * sy1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS v1,
      |    CAST(n2 * syy2 - sy2 * sy2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS v2
      |  FROM c),
      |g AS (SELECT *,
      |    (v1 + v2) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0) AS sig2
      |  FROM f)
      |SELECT 'A' AS grp_lo, 'B' AS grp_hi, CAST(2 AS BIGINT) AS n_groups,
      |  n1 AS n_lo, n2 AS n_hi, round(sig2, 9) AS sigma2_pool,
      |  round((1.959964 + 0.841621) *
      |    sqrt(sig2 * (1.0 / CAST(n1 AS DOUBLE) +
      |      1.0 / CAST(n2 AS DOUBLE))), 9) AS mde_abs,
      |  CAST(ceil(2.0 * sig2 *
      |    ((1.959964 + 0.841621) * (1.959964 + 0.841621)) /
      |    (1.0 * 1.0)) AS BIGINT) AS n_required_per_arm
      |FROM g""".stripMargin

  /** q343/q344 oracle: [[graft.quality.Profiler.edfDriftCard]] replayed
    * — the q303 histogram CTEs, then all three EDF statistics from the
    * shared gap frame in the Spark dags' float order: the KS max-gap
    * and its Smirnov critical value, the nano-landed CvM sum scaled
    * B·C/N², the corrected AD term, and the three nano-integer
    * verdicts. q344's fold merges to identical histograms — same
    * oracle verbatim.
    */
  private lazy val driftCardOracle: String =
    """WITH b AS (SELECT CASE WHEN value < 0.0 THEN -1 WHEN value >= 100.0 THEN 10
      |    ELSE CAST(floor((value - 0.0) / 10.0) AS BIGINT) END AS bucket, count(*) AS n
      |  FROM events WHERE user_id % 2 = 0 AND value IS NOT NULL GROUP BY 1),
      |c AS (SELECT CASE WHEN value < 0.0 THEN -1 WHEN value >= 100.0 THEN 10
      |    ELSE CAST(floor((value - 0.0) / 10.0) AS BIGINT) END AS bucket, count(*) AS n
      |  FROM events WHERE user_id % 2 = 1 AND value IS NOT NULL GROUP BY 1),
      |j AS (SELECT coalesce(b.bucket, c.bucket) AS bucket,
      |    CAST(coalesce(b.n, 0) AS BIGINT) AS n_base,
      |    CAST(coalesce(c.n, 0) AS BIGINT) AS n_cur
      |  FROM b FULL OUTER JOIN c ON b.bucket = c.bucket),
      |k AS (SELECT bucket, n_base, n_cur,
      |    CAST(sum(n_base) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_base,
      |    CAST(sum(n_cur) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cur,
      |    CAST(sum(n_base) OVER () AS BIGINT) AS tb,
      |    CAST(sum(n_cur) OVER () AS BIGINT) AS tc
      |  FROM j),
      |t AS (SELECT *,
      |    CAST(cum_base * tot2 - cum_cur * tot1 AS HUGEINT) AS gap_num,
      |    n_base + n_cur AS cell_tot
      |  FROM (SELECT k.*, tb AS tot1, tc AS tot2 FROM k)),
      |terms AS (SELECT *,
      |    CASE WHEN tot1 = 0 OR tot2 = 0 OR cell_tot = 0 THEN CAST(0 AS BIGINT)
      |      ELSE CAST(round(CAST(cell_tot AS DOUBLE) *
      |        (CAST(gap_num AS DOUBLE) / (CAST(tot1 AS DOUBLE) * CAST(tot2 AS DOUBLE))) *
      |        (CAST(gap_num AS DOUBLE) / (CAST(tot1 AS DOUBLE) * CAST(tot2 AS DOUBLE))) *
      |        1e9) AS BIGINT) END AS cvm9,
      |    CASE WHEN cell_tot = 0 OR cum_base + cum_cur = tot1 + tot2
      |      THEN CAST(0 AS BIGINT)
      |      ELSE CAST(round(CAST(cell_tot AS DOUBLE) *
      |        (CAST(gap_num AS DOUBLE) / (CAST(tot1 AS DOUBLE) * CAST(tot2 AS DOUBLE))) *
      |        (CAST(gap_num AS DOUBLE) / (CAST(tot1 AS DOUBLE) * CAST(tot2 AS DOUBLE))) *
      |        CAST(tot1 AS DOUBLE) * CAST(tot2 AS DOUBLE) /
      |        (CAST(cum_base + cum_cur AS DOUBLE) *
      |          ((CAST(tot1 AS DOUBLE) + CAST(tot2 AS DOUBLE)) -
      |            CAST(cum_base + cum_cur AS DOUBLE))) * 1e9) AS BIGINT)
      |    END AS ad9
      |  FROM t),
      |agg AS (SELECT max(tot1) AS n_base, max(tot2) AS n_cur,
      |    CAST(sum(CASE WHEN cell_tot > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bins,
      |    max(abs(gap_num)) AS ksnum,
      |    sum(CAST(cvm9 AS HUGEINT)) AS cvm9s,
      |    sum(CAST(ad9 AS HUGEINT)) AS ad9s
      |  FROM terms),
      |f AS (SELECT *,
      |    CAST(ksnum AS DOUBLE) / (CAST(n_base AS DOUBLE) * CAST(n_cur AS DOUBLE)) AS ks,
      |    1.358 * sqrt((CAST(n_base AS DOUBLE) + CAST(n_cur AS DOUBLE)) /
      |      (CAST(n_base AS DOUBLE) * CAST(n_cur AS DOUBLE))) AS ks_crit,
      |    CAST(cvm9s AS DOUBLE) / 1e9 * CAST(n_base AS DOUBLE) * CAST(n_cur AS DOUBLE) /
      |      ((CAST(n_base AS DOUBLE) + CAST(n_cur AS DOUBLE)) *
      |       (CAST(n_base AS DOUBLE) + CAST(n_cur AS DOUBLE))) AS cvm_t,
      |    CAST(ad9s AS DOUBLE) / 1e9 AS a2
      |  FROM agg)
      |SELECT n_base, n_cur, n_bins,
      |  round(ks, 9) AS ks, round(ks_crit, 9) AS ks_crit,
      |  CAST(round(ks * 1e9) AS BIGINT) >= CAST(round(ks_crit * 1e9) AS BIGINT)
      |    AS ks_reject,
      |  round(cvm_t, 9) AS cvm_t,
      |  CAST(round(cvm_t * 1e9) AS BIGINT) >= 461000000 AS cvm_reject,
      |  round(a2, 9) AS a2,
      |  CAST(round(a2 * 1e9) AS BIGINT) >= 2492000000 AS ad_reject
      |FROM f""".stripMargin

  /** q285 oracle: [[graft.operators.Survival.kaplanMeier]] replayed —
    * time-to-first-purchase + the 96 h window rule, (duration) cells,
    * reverse-cumulative at-risk counts, duration-ordered nano
    * ln(1 − d/n) and Greenwood sums, exp/√ fixed dags; d = n pins
    * survival to exactly 0.
    */
  private lazy val kaplanMeierOracle: String =
    s"""$SurvivalSubjCte,
      |cells AS (SELECT t,
      |    CAST(sum(ev) AS BIGINT) AS n_event,
      |    CAST(sum(1 - ev) AS BIGINT) AS n_censored
      |  FROM subj GROUP BY 1),
      |risk AS (SELECT *,
      |    CAST(sum(n_event + n_censored) OVER (ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
      |  FROM cells),
      |terms AS (SELECT *,
      |    CASE WHEN n_event = 0 THEN 0
      |         WHEN n_event < n_risk THEN CAST(round(ln(
      |           (CAST(n_risk AS DOUBLE) - CAST(n_event AS DOUBLE)) /
      |             CAST(n_risk AS DOUBLE)) * 1e9) AS BIGINT) END AS ln9,
      |    CASE WHEN n_event = 0 THEN 0
      |         WHEN n_event < n_risk THEN CAST(round(
      |           CAST(n_event AS DOUBLE) / (CAST(n_risk AS DOUBLE) *
      |             (CAST(n_risk AS DOUBLE) - CAST(n_event AS DOUBLE))) * 1e9) AS BIGINT)
      |    END AS gw9
      |  FROM risk),
      |acc AS (SELECT *,
      |    max(CASE WHEN n_event = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 AS dead,
      |    sum(ln9) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lnsum9,
      |    sum(gw9) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gwsum9
      |  FROM terms)
      |SELECT t, n_risk, n_event, n_censored,
      |  round(CASE WHEN dead THEN 0.0
      |    ELSE exp(CAST(lnsum9 AS DOUBLE) / 1e9) END, 9) AS survival,
      |  CASE WHEN NOT dead THEN round(
      |    exp(CAST(lnsum9 AS DOUBLE) / 1e9) *
      |      sqrt(CAST(gwsum9 AS DOUBLE) / 1e9), 9) END AS se_greenwood
      |FROM acc ORDER BY t""".stripMargin

  /** q283 oracle: [[graft.quality.MultipleTesting.holmBonferroni]]
    * replayed — the q251 md5-uniform battery, the step-down integer
    * inequality p9·(m−rank+1)·100 ≤ 5·1e9, and the first-failure stop.
    */
  private lazy val holmOracle: String =
    """WITH ids AS (SELECT DISTINCT lang || ':' || source AS id FROM documents),
      |p AS (SELECT id,
      |    list_reduce(list_transform(range(1, 16), i ->
      |      CAST(strpos('0123456789abcdef', substring(md5(id), i, 1)) - 1 AS BIGINT)),
      |      (acc, x) -> acc * 16 + x) % 1000000000 AS p9
      |  FROM ids),
      |r AS (SELECT id, p9,
      |    sum(CASE WHEN p9 IS NULL THEN 1 ELSE 0 END) OVER () AS n_null,
      |    CAST(row_number() OVER (ORDER BY p9, id) AS BIGINT) AS rank,
      |    count(*) OVER () AS m FROM p),
      |c AS (SELECT *,
      |    CAST(p9 AS HUGEINT) * (m - rank + 1) * 100 <= CAST(5 AS HUGEINT) * 1000000000
      |      AS is_candidate
      |  FROM r),
      |f AS (SELECT *, min(CASE WHEN NOT is_candidate THEN rank END) OVER () AS stop
      |  FROM c)
      |SELECT id, p9, rank, CAST(m AS BIGINT) AS m,
      |  coalesce(CAST(n_null AS BIGINT), 0) AS n_null, is_candidate,
      |  rank < coalesce(stop, m + 1) AS rejected
      |FROM f ORDER BY rank""".stripMargin

  /** q284 oracle: [[graft.quality.Profiler.gTestFromCounts]] replayed
    * — the q172 halves, per-value expected counts from the margins,
    * nano 2·O·ln(O/E) terms (0·ln 0 ≡ 0; one-sided values keep their
    * full term).
    */
  private lazy val gTestOracle: String =
    """WITH b AS (SELECT CAST(o_orderpriority AS VARCHAR) AS value, count(*) AS n
      |  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
      |c AS (SELECT CAST(o_orderpriority AS VARCHAR) AS value, count(*) AS n
      |  FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1),
      |j AS (SELECT coalesce(b.value, c.value) AS value,
      |    CAST(coalesce(b.n, 0) AS BIGINT) AS n_base,
      |    CAST(coalesce(c.n, 0) AS BIGINT) AS n_cur
      |  FROM b FULL OUTER JOIN c ON b.value IS NOT DISTINCT FROM c.value),
      |t AS (SELECT *, CAST(sum(n_base) OVER () AS DOUBLE) AS tb,
      |    CAST(sum(n_cur) OVER () AS DOUBLE) AS tc FROM j)
      |SELECT value, n_base, n_cur,
      |  CAST(round((
      |    CASE WHEN n_base > 0 THEN CAST(n_base AS DOUBLE) *
      |      ln(CAST(n_base AS DOUBLE) * (tb + tc) /
      |         (tb * CAST(n_base + n_cur AS DOUBLE))) ELSE 0 END +
      |    CASE WHEN n_cur > 0 THEN CAST(n_cur AS DOUBLE) *
      |      ln(CAST(n_cur AS DOUBLE) * (tb + tc) /
      |         (tc * CAST(n_base + n_cur AS DOUBLE))) ELSE 0 END
      |  ) * 2 * 1e9) AS BIGINT) AS g_term_n9
      |FROM t ORDER BY value""".stripMargin

  /** q232 oracle: [[graft.quality.Profiler.hellingerFromCounts]]
    * replayed — per-half bucket histograms, the full-outer value join,
    * nano √(p·q) cell terms, the H²/H dag.
    */
  private lazy val hellingerOracle: String =
    """WITH ev AS (SELECT event_id,
      |    CAST(CAST(round(value * 1000) AS BIGINT) // 5000 AS VARCHAR) AS bkt
      |  FROM events WHERE value IS NOT NULL),
      |b AS (SELECT bkt AS v, count(*) AS nb FROM ev WHERE event_id % 2 = 0 GROUP BY 1),
      |c AS (SELECT bkt AS v, count(*) AS nc FROM ev WHERE event_id % 2 = 1 GROUP BY 1),
      |j AS (SELECT coalesce(b.v, c.v) AS v, coalesce(nb, 0) AS nb, coalesce(nc, 0) AS nc
      |  FROM b FULL OUTER JOIN c ON b.v = c.v),
      |w AS (SELECT *, sum(nb) OVER () AS tb, sum(nc) OVER () AS tc FROM j),
      |t AS (SELECT *, CAST(round(sqrt((CAST(nb AS DOUBLE) / tb) *
      |    (CAST(nc AS DOUBLE) / tc)) * 1e9) AS BIGINT) AS bc9 FROM w)
      |SELECT CAST(max(tb) AS BIGINT) AS n_base, CAST(max(tc) AS BIGINT) AS n_cur,
      |  CAST(sum(bc9) AS BIGINT) AS bc9,
      |  round(1.0 - CAST(sum(bc9) AS DOUBLE) / 1e9, 9) AS h2,
      |  round(sqrt(greatest(1.0 - CAST(sum(bc9) AS DOUBLE) / 1e9, 0.0)), 9) AS hellinger
      |FROM t""".stripMargin

  /** q233 oracle: [[graft.operators.Sampling.effectiveSampleSize]]
    * replayed — HUGEINT weight sums, the double-square ESS dag.
    */
  private lazy val essOracle: String =
    """WITH d AS (SELECT lang, CAST(n_chars AS HUGEINT) AS w FROM documents
      |  WHERE n_chars IS NOT NULL AND n_chars >= 0),
      |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n, sum(w) AS sw, sum(w * w) AS sww
      |  FROM d GROUP BY 1)
      |SELECT lang, n, CAST(sw AS VARCHAR) AS sw, CAST(sww AS VARCHAR) AS sww,
      |  CASE WHEN sww > 0 THEN
      |    round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sww AS DOUBLE), 9) END AS ess,
      |  CASE WHEN sww > 0 THEN
      |    round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sww AS DOUBLE) / CAST(n AS DOUBLE), 9) END AS ess_ratio
      |FROM a ORDER BY lang""".stripMargin

  /** q234 oracle: [[graft.operators.RankEval.krippendorffAlpha]]
    * replayed — the three-judge long form, m ≥ 2 unit filter, per-unit
    * nano disagreement terms, kept-unit margins, the α dag.
    */
  private lazy val krippendorffOracle: String =
    """WITH d AS (SELECT doc_id, n_chars, text FROM documents),
      |r AS (
      |  SELECT doc_id, CAST(n_chars >= 256 AS VARCHAR) AS label FROM d
      |  UNION ALL SELECT doc_id,
      |    CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) >= 40 AS VARCHAR)
      |    FROM d WHERE text IS NOT NULL
      |  UNION ALL SELECT doc_id, CAST(doc_id % 2 = 0 AS VARCHAR) FROM d WHERE doc_id % 4 <> 1),
      |cells AS (SELECT doc_id, label, count(*) AS n FROM r WHERE label IS NOT NULL GROUP BY 1, 2),
      |u AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS m,
      |    sum(CAST(n AS HUGEINT) * n) AS sq
      |  FROM cells GROUP BY 1 HAVING sum(n) >= 2),
      |o AS (SELECT CAST(count(*) AS BIGINT) AS n_units,
      |    CAST(sum(m) AS BIGINT) AS n_pairable,
      |    sum(CAST(round(CAST(CAST(m AS HUGEINT) * m - sq AS DOUBLE) /
      |      (CAST(m AS DOUBLE) - 1.0) * 1e9) AS HUGEINT)) AS obs9 FROM u),
      |mg AS (SELECT sum(CAST(nv AS HUGEINT) * nv) AS sqv FROM (
      |  SELECT cells.label, CAST(sum(cells.n) AS BIGINT) AS nv
      |  FROM cells JOIN u ON cells.doc_id = u.doc_id GROUP BY 1)),
      |f AS (SELECT n_units, n_pairable, obs9,
      |    CAST(n_pairable AS HUGEINT) * n_pairable - sqv AS den,
      |    CAST(obs9 AS DOUBLE) / 1e9 / CAST(n_pairable AS DOUBLE) AS d_obs,
      |    CAST(CAST(n_pairable AS HUGEINT) * n_pairable - sqv AS DOUBLE) /
      |      CAST(CAST(n_pairable AS HUGEINT) * (CAST(n_pairable AS HUGEINT) - 1) AS DOUBLE) AS d_exp
      |  FROM o, mg)
      |SELECT n_units, n_pairable, CAST(obs9 AS VARCHAR) AS obs9,
      |  CAST(den AS VARCHAR) AS de_num,
      |  round(d_obs, 9) AS d_obs, round(d_exp, 9) AS d_exp,
      |  CASE WHEN den > 0 AND n_pairable > 1 THEN round(1.0 - d_obs / d_exp, 9) END AS alpha
      |FROM f""".stripMargin

  /** q235 oracle: [[graft.quality.Association.associationMatrix]]
    * replayed — the three-pair long form, then the q209 summary math
    * keyed by the pair label (chi terms N-scaled before the nano round,
    * the round-11 rule).
    */
  private lazy val associationMatrixOracle: String =
    """WITH d AS (SELECT CAST(lang AS VARCHAR) AS c0, CAST(source AS VARCHAR) AS c1,
      |    CAST(n_chars // 512 AS VARCHAR) AS c2 FROM documents),
      |lg AS (
      |  SELECT 'lang|source' AS pair, c0 AS x, c1 AS y FROM d
      |  UNION ALL SELECT 'lang|len_b', c0, c2 FROM d
      |  UNION ALL SELECT 'source|len_b', c1, c2 FROM d),
      |c AS (SELECT pair, x, y, count(*) AS n FROM lg GROUP BY 1, 2, 3),
      |m AS (SELECT pair, x, y, CAST(n AS BIGINT) AS n,
      |    CAST(sum(n) OVER (PARTITION BY pair, x) AS BIGINT) AS row_tot,
      |    CAST(sum(n) OVER (PARTITION BY pair, y) AS BIGINT) AS col_tot,
      |    CAST(sum(n) OVER (PARTITION BY pair) AS BIGINT) AS n_tot FROM c),
      |base AS (SELECT pair, CAST(count(DISTINCT x) AS BIGINT) AS n_x,
      |    CAST(count(DISTINCT y) AS BIGINT) AS n_y, CAST(max(n_tot) AS BIGINT) AS n,
      |    sum(CAST(round(CAST(n_tot AS DOUBLE) * n * n /
      |      (CAST(row_tot AS DOUBLE) * col_tot) * 1e9) AS HUGEINT)) AS chi9,
      |    CAST(sum(CAST(round((CAST(n AS DOUBLE) / n_tot) *
      |      ln(CAST(n AS DOUBLE) * n_tot / (CAST(row_tot AS DOUBLE) * col_tot)) * 1e9) AS BIGINT)) AS BIGINT) AS mi9
      |  FROM m GROUP BY 1),
      |hx AS (SELECT pair, CAST(sum(CAST(round(-(CAST(row_tot AS DOUBLE) / n_tot) *
      |      ln(CAST(row_tot AS DOUBLE) / n_tot) * 1e9) AS BIGINT)) AS BIGINT) AS hx9
      |  FROM (SELECT DISTINCT pair, x, row_tot, n_tot FROM m) GROUP BY 1),
      |hy AS (SELECT pair, CAST(sum(CAST(round(-(CAST(col_tot AS DOUBLE) / n_tot) *
      |      ln(CAST(col_tot AS DOUBLE) / n_tot) * 1e9) AS BIGINT)) AS BIGINT) AS hy9
      |  FROM (SELECT DISTINCT pair, y, col_tot, n_tot FROM m) GROUP BY 1)
      |SELECT b.pair, n_x, n_y, n,
      |  round(CAST(chi9 AS DOUBLE) / 1e9 - n, 9) AS chi2,
      |  CASE WHEN least(n_x, n_y) > 1 AND n > 0 THEN
      |    round(sqrt(greatest(CAST(chi9 AS DOUBLE) / 1e9 - n, 0) /
      |      (CAST(n AS DOUBLE) * (least(n_x, n_y) - 1))), 9) END AS cramers_v,
      |  CAST(mi9 AS DOUBLE) / 1e9 AS mi,
      |  CAST(hx9 AS DOUBLE) / 1e9 AS h_x, CAST(hy9 AS DOUBLE) / 1e9 AS h_y,
      |  CASE WHEN hx9 > 0 THEN round(CAST(mi9 AS DOUBLE) / hx9, 9) END AS theil_u_x,
      |  CASE WHEN hy9 > 0 THEN round(CAST(mi9 AS DOUBLE) / hy9, 9) END AS theil_u_y
      |FROM base b JOIN hx USING (pair) JOIN hy USING (pair)
      |ORDER BY pair""".stripMargin

  /** q236 oracle: [[graft.operators.Quantiles.quantileNormalize]]
    * replayed — per-source (value, id) ranks, the exact ⌈r·m/n⌉ via
    * HUGEINT floor division, the reference CDF interval join.
    */
  private lazy val quantileNormalizeOracle: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents WHERE n_chars IS NOT NULL),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rank,
      |    count(*) OVER (PARTITION BY source) AS n FROM d),
      |ref AS (SELECT CAST(n_chars AS BIGINT) AS bucket, count(*) AS cnt FROM d GROUP BY 1),
      |rc AS (SELECT bucket AS norm,
      |    sum(cnt) OVER (ORDER BY bucket) - cnt + 1 AS lo,
      |    sum(cnt) OVER (ORDER BY bucket) AS hi FROM ref),
      |m AS (SELECT CAST(sum(cnt) AS HUGEINT) AS mm FROM ref),
      |w AS (SELECT rk.*, (CAST(rank AS HUGEINT) * mm + n - 1) // n AS t FROM rk, m)
      |SELECT doc_id, source, n_chars, CAST(rank AS BIGINT) AS rank,
      |  CAST(n AS BIGINT) AS n, CAST(t AS BIGINT) AS ref_pos, norm
      |FROM w JOIN rc ON t >= lo AND t <= hi ORDER BY doc_id""".stripMargin

  /** q237 oracle: [[graft.operators.Sampling.kFoldAssign]] replayed —
    * md5 rank per language, fold = (rank−1)·k // n in HUGEINT.
    */
  private lazy val kFoldOracle: String =
    """WITH d AS (SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
      |r AS (SELECT lang, doc_id,
      |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS rank,
      |    count(*) OVER (PARTITION BY lang) AS n FROM d)
      |SELECT lang, doc_id, rank,
      |  CAST((CAST(rank - 1 AS HUGEINT) * 5) // n AS INTEGER) AS fold
      |FROM r ORDER BY lang, rank""".stripMargin

  /** q238 oracle: the q228 apportionment CTE (seats = 100) composed
    * with the q219 A-ES race, joined and cut at each language's quota.
    */
  private lazy val allocatedSampleOracle: String =
    """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
      |t AS (SELECT CAST(sum(n_docs) AS HUGEINT) AS tot FROM c),
      |b AS (SELECT lang, n_docs,
      |    (CAST(100 AS HUGEINT) * n_docs) // tot AS base,
      |    CAST(100 AS HUGEINT) * n_docs - ((CAST(100 AS HUGEINT) * n_docs) // tot) * tot AS rem
      |  FROM c, t),
      |l AS (SELECT *, 100 - sum(base) OVER () AS leftover,
      |    row_number() OVER (ORDER BY rem DESC, lang) AS rk FROM b),
      |st AS (SELECT lang,
      |    CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS seats FROM l),
      |w AS (SELECT lang, doc_id, n_chars,
      |    list_reduce(list_transform(range(1, 16), i ->
      |      CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
      |      (acc, x) -> acc * 16 + x) AS m
      |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
      |l9t AS (SELECT lang, doc_id, n_chars,
      |    CAST(round(ln((m + 1) / 1152921504606846976.0) * 1e9) AS BIGINT) AS l9 FROM w),
      |r AS (SELECT *, row_number() OVER (PARTITION BY lang
      |    ORDER BY CAST(l9 AS DOUBLE) / CAST(n_chars AS DOUBLE) DESC, doc_id) AS rank FROM l9t)
      |SELECT r.lang, doc_id, n_chars, l9, CAST(rank AS INTEGER) AS rank, seats
      |FROM r JOIN st ON r.lang = st.lang WHERE rank <= seats
      |ORDER BY r.lang, rank""".stripMargin

  /** q239 oracle, generated: the q195 blocked-pair CTE with the dist
    * column retained, then per threshold t ∈ 0..6 its own symmetrized
    * recursive-CTE component assignment and summary row — 7 generated
    * blocks, one UNION.
    */
  private lazy val thresholdSweepOracle: String = {
    val perT = (0 to 6).map { t =>
      s"""sym$t AS (SELECT id_a AS src, id_b AS dst FROM ed WHERE dist <= $t
         |  UNION SELECT id_b, id_a FROM ed WHERE dist <= $t),
         |nodes$t AS (SELECT DISTINCT src AS node FROM sym$t),
         |reach$t AS (
         |  SELECT node, node AS r FROM nodes$t
         |  UNION
         |  SELECT s.dst AS node, reach$t.r FROM reach$t JOIN sym$t s ON s.src = reach$t.node),
         |asg$t AS (SELECT node, min(r) AS component FROM reach$t GROUP BY node)""".stripMargin
    }.mkString(",\n")
    val rows = (0 to 6).map { t =>
      s"""SELECT $t AS threshold,
         |  (SELECT count(*) FROM (SELECT DISTINCT id_a, id_b FROM ed WHERE dist <= $t)) AS n_pairs,
         |  (SELECT count(*) FROM asg$t) AS n_nodes,
         |  (SELECT count(DISTINCT component) FROM asg$t) AS n_clusters,
         |  CASE WHEN (SELECT count(*) FROM asg$t) > 0 THEN
         |    round(CAST((SELECT count(*) FROM asg$t) - (SELECT count(DISTINCT component) FROM asg$t) AS DOUBLE) /
         |      CAST((SELECT count(*) FROM asg$t) AS DOUBLE), 9)
         |  ELSE 0.0 END AS dup_factor""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH RECURSIVE b AS (SELECT doc_id AS id,
       |    lang || ':' || substring(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), 1, 24) AS k
       |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
       |r0 AS (SELECT id, k, row_number() OVER (ORDER BY k, id) AS rank FROM b),
       |p AS (SELECT a.id AS id_a, c.id AS id_b, a.k AS key_a, c.k AS key_b
       |  FROM r0 a JOIN r0 c ON c.rank > a.rank AND c.rank < a.rank + 4),
       |ed AS (SELECT id_a, id_b, CAST(levenshtein(key_a, key_b) AS INT) AS dist
       |  FROM p WHERE levenshtein(key_a, key_b) <= 6),
       |$perT
       |SELECT * FROM (
       |$rows
       |) ORDER BY threshold""".stripMargin
  }

  /** q240 oracle: [[graft.text.CorpusLaws.vocabChurn]] replayed —
    * per-half token counts, the full-outer vocabulary join, exact
    * type/mass churn sums, pinned rate divisions.
    */
  private lazy val vocabChurnOracle: String =
    """WITH tb AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
      |    x -> x <> '')) AS token FROM documents WHERE doc_id % 2 = 0 AND text IS NOT NULL),
      |tc AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
      |    x -> x <> '')) AS token FROM documents WHERE doc_id % 2 = 1 AND text IS NOT NULL),
      |b AS (SELECT token, count(*) AS cnt FROM tb GROUP BY 1),
      |c AS (SELECT token, count(*) AS cnt FROM tc GROUP BY 1),
      |j AS (SELECT coalesce(b.cnt, 0) AS nb, coalesce(c.cnt, 0) AS nc
      |  FROM b FULL OUTER JOIN c ON b.token = c.token),
      |a AS (SELECT
      |    CAST(sum(CASE WHEN nb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS types_base,
      |    CAST(sum(CASE WHEN nc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS types_cur,
      |    CAST(sum(CASE WHEN nb > 0 AND nc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS types_shared,
      |    CAST(sum(CASE WHEN nb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS types_new,
      |    CAST(sum(CASE WHEN nc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS types_dropped,
      |    CAST(sum(nb) AS BIGINT) AS mass_base,
      |    CAST(sum(nc) AS BIGINT) AS mass_cur,
      |    CAST(sum(CASE WHEN nb > 0 THEN nc ELSE 0 END) AS BIGINT) AS cur_mass_in_base
      |  FROM j)
      |SELECT *,
      |  CASE WHEN mass_cur > 0 THEN
      |    round(CAST(mass_cur - cur_mass_in_base AS DOUBLE) / CAST(mass_cur AS DOUBLE), 9) END AS oov_rate,
      |  CASE WHEN types_cur > 0 THEN
      |    round(CAST(types_new AS DOUBLE) / CAST(types_cur AS DOUBLE), 9) END AS new_type_rate
      |FROM a""".stripMargin

  /** q243 oracle: [[graft.operators.Quantiles.trimmedMean]] replayed —
    * (value, tie) ranks, the (n·pct) div 100 cut, the HUGEINT kept sum
    * and its one division.
    */
  private lazy val trimmedMeanOracle: String =
    """WITH li AS (SELECT l_returnflag AS rf, CAST(l_quantity AS BIGINT) AS qty,
      |    l_orderkey || ':' || l_linenumber AS tb
      |  FROM lineitem WHERE l_quantity IS NOT NULL),
      |r AS (SELECT rf, qty,
      |    row_number() OVER (PARTITION BY rf ORDER BY qty, tb) AS rk,
      |    count(*) OVER (PARTITION BY rf) AS n FROM li),
      |d AS (SELECT *, (n * 10) // 100 AS dd FROM r)
      |SELECT rf AS l_returnflag, CAST(max(n) AS BIGINT) AS n,
      |  CAST(max(dd) AS BIGINT) AS n_trimmed_each_side,
      |  CAST(sum(CASE WHEN rk > dd AND rk <= n - dd THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN rk > dd AND rk <= n - dd THEN CAST(qty AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS VARCHAR) AS sum_kept,
      |  round(CAST(sum(CASE WHEN rk > dd AND rk <= n - dd THEN CAST(qty AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS DOUBLE) /
      |    CAST(sum(CASE WHEN rk > dd AND rk <= n - dd THEN 1 ELSE 0 END) AS DOUBLE), 9) AS trimmed_mean
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  /** q244 oracle: [[graft.operators.TimeSeries.gapAnalysis]] replayed —
    * the 15-minute epoch-floored spine (floor(epoch/900)·900 — Spark's
    * window() truncation, NOT DuckDB's rounding double→int cast), the
    * two-rank run grouping, and the (len desc, start) longest-run pick.
    */
  private lazy val gapAnalysisOracle: String =
    """WITH ev AS (SELECT event_type,
      |    to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // 900) * 900) AS slot
      |  FROM events),
      |c AS (SELECT event_type, slot, count(*) AS n FROM ev GROUP BY 1, 2),
      |bb AS (SELECT event_type, min(slot) AS lo, max(slot) AS hi FROM ev GROUP BY 1),
      |spine AS (SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS slot FROM bb),
      |x AS (SELECT s.event_type, s.slot, CAST(coalesce(c.n, 0) AS BIGINT) AS n
      |  FROM spine s LEFT JOIN c ON s.event_type = c.event_type AND s.slot = c.slot),
      |r AS (SELECT *, (n = 0) AS z,
      |    row_number() OVER (PARTITION BY event_type ORDER BY slot) AS t,
      |    row_number() OVER (PARTITION BY event_type, (n = 0) ORDER BY slot) AS tf,
      |    count(*) OVER (PARTITION BY event_type) AS ns FROM x),
      |runs AS (SELECT event_type, z, t - tf AS rid, max(ns) AS ns,
      |    CAST(count(*) AS BIGINT) AS len, min(slot) AS strt, max(t) AS endt
      |  FROM r GROUP BY 1, 2, 3),
      |a AS (SELECT event_type, CAST(max(ns) AS BIGINT) AS n_slots,
      |    CAST(sum(CASE WHEN z THEN len ELSE 0 END) AS BIGINT) AS zero_slots,
      |    CAST(sum(CASE WHEN z THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_runs,
      |    CAST(max(CASE WHEN z AND endt = ns THEN len ELSE 0 END) AS BIGINT) AS trailing_gap
      |  FROM runs GROUP BY 1),
      |best AS (SELECT event_type, len AS longest_zero_run, strt FROM (
      |    SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY len DESC, strt) AS rk
      |    FROM runs WHERE z) WHERE rk = 1)
      |SELECT a.event_type, n_slots, zero_slots, n_zero_runs,
      |  coalesce(best.longest_zero_run, 0) AS longest_zero_run, trailing_gap,
      |  strftime(best.strt, '%Y-%m-%d %H:%M:%S') AS longest_run_start
      |FROM a LEFT JOIN best USING (event_type)
      |ORDER BY a.event_type""".stripMargin

  /** q245 oracle: [[graft.quality.Association.cmh]] replayed — the
    * per-stratum 2×2 pivot, nano E/Var terms in the operator's exact
    * dag order, HUGEINT sums, the pooled statistic.
    */
  private lazy val cmhOracle: String =
    """WITH d AS (SELECT lang AS s,
      |    CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END AS grp,
      |    CASE WHEN n_chars >= 256 THEN 1 ELSE 0 END AS hit
      |  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
      |c AS (SELECT s, grp, hit, count(*) AS n FROM d GROUP BY 1, 2, 3),
      |g AS (SELECT s, count(DISTINCT grp) AS ng FROM c GROUP BY 1),
      |l AS (SELECT c.*, g.ng, min(grp) OVER (PARTITION BY c.s) AS grp_lo
      |  FROM c JOIN g ON c.s = g.s),
      |w AS (SELECT s, max(ng) AS ng,
      |    CAST(sum(CASE WHEN grp = grp_lo AND hit = 1 THEN n ELSE 0 END) AS BIGINT) AS a,
      |    CAST(sum(CASE WHEN grp = grp_lo AND hit = 0 THEN n ELSE 0 END) AS BIGINT) AS b,
      |    CAST(sum(CASE WHEN grp <> grp_lo AND hit = 1 THEN n ELSE 0 END) AS BIGINT) AS c2_,
      |    CAST(sum(CASE WHEN grp <> grp_lo AND hit = 0 THEN n ELSE 0 END) AS BIGINT) AS d2_
      |  FROM l GROUP BY 1),
      |t AS (SELECT *, CAST(a + b + c2_ + d2_ AS DOUBLE) AS nn,
      |    CAST(a + b AS DOUBLE) AS r1, CAST(c2_ + d2_ AS DOUBLE) AS r2,
      |    CAST(a + c2_ AS DOUBLE) AS cc1, CAST(b + d2_ AS DOUBLE) AS cc2,
      |    (ng = 2 AND a + b + c2_ + d2_ >= 2 AND a + b > 0 AND c2_ + d2_ > 0
      |      AND a + c2_ > 0 AND b + d2_ > 0) AS ok FROM w),
      |e AS (SELECT *,
      |    CASE WHEN ok THEN CAST(round(r1 * cc1 / nn * 1e9) AS BIGINT) ELSE 0 END AS e9,
      |    CASE WHEN ok THEN CAST(round(r1 * r2 * cc1 * cc2 / (nn * nn * (nn - 1)) * 1e9) AS BIGINT) ELSE 0 END AS v9,
      |    CASE WHEN ok THEN CAST(round(CAST(a AS DOUBLE) * CAST(d2_ AS DOUBLE) / nn * 1e9) AS BIGINT) ELSE 0 END AS on9,
      |    CASE WHEN ok THEN CAST(round(CAST(b AS DOUBLE) * CAST(c2_ AS DOUBLE) / nn * 1e9) AS BIGINT) ELSE 0 END AS od9
      |  FROM t)
      |SELECT CAST(count(*) AS BIGINT) AS n_strata,
      |  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_used,
      |  CAST(sum(CASE WHEN ng > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi,
      |  CAST(sum(CASE WHEN ok THEN a ELSE 0 END) AS BIGINT) AS sum_a,
      |  CAST(sum(CAST(e9 AS HUGEINT)) AS VARCHAR) AS e_sum9,
      |  CAST(sum(CAST(v9 AS HUGEINT)) AS VARCHAR) AS var_sum9,
      |  CASE WHEN sum(CAST(v9 AS HUGEINT)) > 0 THEN round(
      |    (CAST(sum(CASE WHEN ok THEN a ELSE 0 END) AS DOUBLE) - CAST(sum(CAST(e9 AS HUGEINT)) AS DOUBLE) / 1e9) *
      |    (CAST(sum(CASE WHEN ok THEN a ELSE 0 END) AS DOUBLE) - CAST(sum(CAST(e9 AS HUGEINT)) AS DOUBLE) / 1e9) /
      |    (CAST(sum(CAST(v9 AS HUGEINT)) AS DOUBLE) / 1e9), 9) END AS cmh,
      |  CASE WHEN sum(CAST(od9 AS HUGEINT)) > 0 THEN round(
      |    CAST(sum(CAST(on9 AS HUGEINT)) AS DOUBLE) /
      |    CAST(sum(CAST(od9 AS HUGEINT)) AS DOUBLE), 9) END AS or_mh
      |FROM e""".stripMargin

  /** q216 oracle: [[graft.operators.TimeSeries.mannKendall]] replayed on
    * the shared hourly spine — the full t_a < t_b sign-pair sum (exact
    * HUGEINT), tie-corrected 18·Var(S), the (S∓1)/√(var/18) z, and the
    * exact-integer α = 0.05 verdict (S∓1)²·180000 ≷ 38416·var18.
    */
  private lazy val mannKendallOracle: String =
    s"""WITH $HourlySpineCtes,
       |pr AS (SELECT a.event_type,
       |    CASE WHEN bb.n > a.n THEN 1 WHEN bb.n < a.n THEN -1 ELSE 0 END AS sg
       |  FROM x a JOIN x bb ON a.event_type = bb.event_type AND a.slot < bb.slot),
       |sA AS (SELECT event_type, sum(CAST(sg AS HUGEINT)) AS s FROM pr GROUP BY 1),
       |tv AS (SELECT event_type, n AS y, count(*) AS t FROM x GROUP BY 1, 2),
       |tieA AS (SELECT event_type, CAST(sum(t) AS BIGINT) AS n,
       |    sum(CAST(t AS HUGEINT) * (t - 1) * (t * 2 + 5)) AS tsum FROM tv GROUP BY 1),
       |f AS (SELECT tieA.event_type, tieA.n, coalesce(sA.s, 0) AS s,
       |    CAST(tieA.n AS HUGEINT) * (tieA.n - 1) * (tieA.n * 2 + 5) - tsum AS var18
       |  FROM tieA LEFT JOIN sA ON tieA.event_type = sA.event_type)
       |SELECT event_type, n, CAST(s AS VARCHAR) AS s, CAST(var18 AS VARCHAR) AS var18,
       |  CASE WHEN var18 > 0 THEN round(
       |    CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
       |         WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
       |         ELSE 0.0 END, 9) END AS z,
       |  CASE WHEN var18 <= 0 THEN NULL
       |       WHEN s > 1 AND (s - 1) * (s - 1) * 180000 > var18 * 38416 THEN 'increasing'
       |       WHEN s < -1 AND (s + 1) * (s + 1) * 180000 > var18 * 38416 THEN 'decreasing'
       |       ELSE 'none' END AS trend
       |FROM f ORDER BY event_type""".stripMargin

  /** q217 oracle: [[graft.operators.TimeSeries.theilSen]] replayed — the
    * full t_a < t_b pair enumeration over the hourly spine, the median
    * pair selected by the operator's exact (key, dy, dx, ta, tb) pin at
    * rank ⌊(m+1)/2⌋, and the lower-median residual intercept under the
    * selected slope.
    */
  private lazy val theilSenOracle: String =
    s"""WITH $HourlySpineCtes,
       |xx AS (SELECT event_type, CAST(epoch(slot) AS BIGINT) AS t, n AS y FROM x),
       |p AS (SELECT a.event_type, a.t AS ta, a.y AS ya, bb.t AS tb, bb.y AS yb,
       |    bb.y - a.y AS dy, bb.t - a.t AS dx
       |  FROM xx a JOIN xx bb ON a.event_type = bb.event_type AND a.t < bb.t
       |  WHERE bb.t - a.t > 0),
       |k AS (SELECT *, CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) AS key,
       |    row_number() OVER (PARTITION BY event_type ORDER BY CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE), dy, dx, ta, tb) AS rk,
       |    count(*) OVER (PARTITION BY event_type) AS m
       |  FROM p),
       |med AS (SELECT event_type, m, dy, dx, key AS slope FROM k
       |  WHERE rk = CAST(floor((m + 1) / 2.0) AS BIGINT)),
       |res AS (SELECT xx.event_type, med.m, med.dy, med.dx, med.slope,
       |    CAST(xx.y AS DOUBLE) - med.slope * CAST(xx.t AS DOUBLE) AS r, xx.t,
       |    row_number() OVER (PARTITION BY xx.event_type
       |      ORDER BY CAST(xx.y AS DOUBLE) - med.slope * CAST(xx.t AS DOUBLE), xx.t) AS rk,
       |    count(*) OVER (PARTITION BY xx.event_type) AS nn
       |  FROM xx JOIN med ON xx.event_type = med.event_type)
       |SELECT event_type, m, CAST(dy AS VARCHAR) AS dy, CAST(dx AS VARCHAR) AS dx,
       |  round(slope * 3600.0, 9) AS slope_hr, round(r, 9) AS intercept
       |FROM res WHERE rk = CAST(floor((nn + 1) / 2.0) AS BIGINT)
       |ORDER BY event_type""".stripMargin

  /** q218 oracle: the q195 sorted-neighborhood + Levenshtein edge
    * generation replayed verbatim, then [[graft.graph.Triangles
    * .triangleCounts]]'s canonical edge set, degree aggregation, and
    * id-ordered a<b<c triple join (the triangle SET is orientation-
    * independent, so the plain id ordering here hash-matches the
    * engine's degree-ordered enumeration), and the one pinned coeff
    * division.
    */
  private lazy val trianglesOracle: String =
    """WITH b AS (SELECT doc_id AS id,
      |    lang || ':' || substring(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 24) AS k
      |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
      |r AS (SELECT id, k, row_number() OVER (ORDER BY k, id) AS rank FROM b),
      |p AS (SELECT a.id AS id_a, c.id AS id_b, a.k AS key_a, c.k AS key_b
      |  FROM r a JOIN r c ON c.rank > a.rank AND c.rank < a.rank + 4),
      |ed AS (SELECT id_a, id_b FROM p WHERE levenshtein(key_a, key_b) <= 6),
      |e0 AS (SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
      |  FROM ed WHERE id_a IS NOT NULL AND id_b IS NOT NULL AND id_a <> id_b),
      |deg AS (SELECT node, count(*) AS deg FROM (
      |    SELECT u AS node FROM e0 UNION ALL SELECT v AS node FROM e0) GROUP BY 1),
      |w AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM e0 e1 JOIN e0 e2 ON e1.v = e2.u),
      |tri0 AS (SELECT w.a, w.b, w.c FROM w JOIN e0 ON e0.u = w.a AND e0.v = w.c),
      |nt AS (SELECT node, count(*) AS tri FROM (SELECT unnest([a, b, c]) AS node FROM tri0) GROUP BY 1)
      |SELECT deg.node, deg.deg, coalesce(nt.tri, 0) AS tri,
      |  CASE WHEN deg.deg > 1 THEN
      |    round(2.0 * coalesce(nt.tri, 0) / (CAST(deg.deg AS DOUBLE) * (deg.deg - 1)), 9) END AS coeff
      |FROM deg LEFT JOIN nt USING (node) ORDER BY node""".stripMargin

  /** q219 oracle: [[graft.operators.Sampling.weightedSampleWithoutReplacement]]
    * replayed — md5(doc_id) → 60-bit uniform (the q54 idiom), the
    * nano-pinned ln, the l9/w descending race with the id tie-break,
    * top-50 per language.
    */
  private lazy val weightedSampleOracle: String =
    """WITH t AS (SELECT lang, doc_id, n_chars,
      |    list_reduce(list_transform(range(1, 16), i ->
      |      CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
      |      (acc, x) -> acc * 16 + x) AS m
      |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
      |l AS (SELECT lang, doc_id, n_chars,
      |    CAST(round(ln((m + 1) / 1152921504606846976.0) * 1e9) AS BIGINT) AS l9 FROM t),
      |r AS (SELECT *, row_number() OVER (PARTITION BY lang
      |    ORDER BY CAST(l9 AS DOUBLE) / CAST(n_chars AS DOUBLE) DESC, doc_id) AS rank FROM l)
      |SELECT lang, doc_id, n_chars, l9, CAST(rank AS INTEGER) AS rank
      |FROM r WHERE rank <= 50 ORDER BY lang, rank""".stripMargin

  private lazy val oracleBase: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_join_topk" ->
      """SELECT l_orderkey, o_orderdate, CAST(revenue_dec AS DOUBLE) AS revenue FROM (
        |  SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS revenue_dec
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment = 'BUILDING'
        |  GROUP BY 1, 2
        |  ORDER BY revenue_dec DESC, o_orderdate, l_orderkey
        |  LIMIT 10)""".stripMargin,
    "q03_star_join" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q04_window_rank" ->
      """SELECT o_custkey, o_orderkey, rnk, run_spend FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend
        |  FROM orders)
        |WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin,
    "q05_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hr, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  min(value) AS min_value,
        |  max(value) AS max_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hr, event_type""".stripMargin,
    "q06_sessionize" ->
      """WITH ev AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events),
        |m AS (SELECT user_id, event_id, ts_sec,
        |  CASE WHEN lag(ts_sec) OVER w IS NULL THEN 1
        |       WHEN ts_sec - lag(ts_sec) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
        |s AS (SELECT user_id, ts_sec,
        |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM m)
        |SELECT user_id, session_seq, count(*) AS n_events, min(ts_sec) AS start_sec, max(ts_sec) AS end_sec
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "q10_compare_summary" ->
      """WITH df1 AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 0),
        |df2 AS (SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |  o_totalprice, o_orderdate,
        |  CASE WHEN o_orderkey % 13 = 0 THEN 'X-' || o_orderpriority ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 11 <> 0),
        |j AS (SELECT
        |  CASE WHEN df1.o_orderkey IS NULL THEN 'added'
        |       WHEN df2.o_orderkey IS NULL THEN 'removed'
        |       WHEN NOT(df1.o_custkey IS NOT DISTINCT FROM df2.o_custkey)
        |         OR NOT(df1.o_orderstatus IS NOT DISTINCT FROM df2.o_orderstatus)
        |         OR NOT(df1.o_totalprice IS NOT DISTINCT FROM df2.o_totalprice)
        |         OR NOT(df1.o_orderdate IS NOT DISTINCT FROM df2.o_orderdate)
        |         OR NOT(df1.o_orderpriority IS NOT DISTINCT FROM df2.o_orderpriority)
        |       THEN 'changed' ELSE 'not_changed' END AS category
        |  FROM df1 FULL OUTER JOIN df2 ON df1.o_orderkey = df2.o_orderkey)
        |SELECT category, count(*) AS cnt FROM j GROUP BY category ORDER BY category""".stripMargin,
    "q11_compare_changed" ->
      """WITH df1 AS (SELECT * FROM orders WHERE o_orderkey % 7 <> 0),
        |df2 AS (SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |  o_totalprice, o_orderdate,
        |  CASE WHEN o_orderkey % 13 = 0 THEN 'X-' || o_orderpriority ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 11 <> 0),
        |sel AS (SELECT d1.o_orderkey AS o_orderkey,
        |  d1.o_custkey c1, d2.o_custkey c2,
        |  d1.o_orderstatus s1, d2.o_orderstatus s2,
        |  d1.o_totalprice p1, d2.o_totalprice p2,
        |  d1.o_orderdate t1, d2.o_orderdate t2,
        |  d1.o_orderpriority r1, d2.o_orderpriority r2
        |  FROM df1 d1 JOIN df2 d2 USING (o_orderkey))
        |SELECT * FROM (
        |  SELECT o_orderkey, 'o_custkey' AS column_name, CAST(c1 AS VARCHAR) AS before, CAST(c2 AS VARCHAR) AS after FROM sel WHERE NOT (c1 IS NOT DISTINCT FROM c2)
        |  UNION ALL
        |  SELECT o_orderkey, 'o_orderstatus', CAST(s1 AS VARCHAR), CAST(s2 AS VARCHAR) FROM sel WHERE NOT (s1 IS NOT DISTINCT FROM s2)
        |  UNION ALL
        |  SELECT o_orderkey, 'o_totalprice', CAST(p1 AS VARCHAR), CAST(p2 AS VARCHAR) FROM sel WHERE NOT (p1 IS NOT DISTINCT FROM p2)
        |  UNION ALL
        |  SELECT o_orderkey, 'o_orderdate', CAST(t1 AS VARCHAR), CAST(t2 AS VARCHAR) FROM sel WHERE NOT (t1 IS NOT DISTINCT FROM t2)
        |  UNION ALL
        |  SELECT o_orderkey, 'o_orderpriority', CAST(r1 AS VARCHAR), CAST(r2 AS VARCHAR) FROM sel WHERE NOT (r1 IS NOT DISTINCT FROM r2)
        |) ORDER BY o_orderkey, column_name""".stripMargin,
    "q13_surrogate_key_string" ->
      """SELECT c_custkey,
        |  '[' || coalesce(rtrim(upper(CAST(c_custkey AS VARCHAR))), '@~<null>~@')
        |  || ', ' || coalesce(rtrim(upper(c_name)), '@~<null>~@')
        |  || ', ' || coalesce(rtrim(upper(c_mktsegment)), '@~<null>~@') || ']' AS sk
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q14_surrogate_key_hash" ->
      """SELECT c_custkey,
        |  substring(sha256(
        |    '[' || coalesce(rtrim(upper(CAST(c_custkey AS VARCHAR))), '@~<null>~@')
        |    || ', ' || coalesce(rtrim(upper(c_name)), '@~<null>~@')
        |    || ', ' || coalesce(rtrim(upper(c_mktsegment)), '@~<null>~@') || ']'
        |  ), 1, 40) AS sk_hash
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q15_fk_broken" ->
      """SELECT DISTINCT l_suppkey FROM lineitem
        |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 3 <> 0)
        |ORDER BY l_suppkey""".stripMargin,
    "q16_latest_records" ->
      """WITH ev AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts_sec DESC, event_id DESC) AS rn FROM ev)
        |SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str, event_type, value, props
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q17_latest_conflicts" ->
      """WITH d AS (SELECT DISTINCT user_id, event_type, CAST(floor(value) AS BIGINT) AS v, props FROM events),
        |x AS (SELECT *, max(v) OVER (PARTITION BY user_id, event_type) AS mv FROM d),
        |y AS (SELECT user_id, event_type, v, props, count(*) OVER (PARTITION BY user_id, event_type) AS cnt FROM x WHERE v = mv)
        |SELECT user_id, event_type, v, props, cnt > 1 AS __has_pk_conflict FROM y
        |ORDER BY user_id, event_type, props""".stripMargin,
    "q18_pk_validate" ->
      """SELECT * FROM (
        |  SELECT 'l_orderkey' AS combination, count(*) AS duplicate_groups, CAST(coalesce(sum(cnt), 0) AS BIGINT) AS duplicate_records
        |    FROM (SELECT count(*) AS cnt FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1)
        |  UNION ALL
        |  SELECT 'l_orderkey,l_linenumber', count(*), CAST(coalesce(sum(cnt), 0) AS BIGINT)
        |    FROM (SELECT count(*) AS cnt FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
        |  UNION ALL
        |  SELECT 'l_partkey,l_suppkey', count(*), CAST(coalesce(sum(cnt), 0) AS BIGINT)
        |    FROM (SELECT count(*) AS cnt FROM lineitem GROUP BY l_partkey, l_suppkey HAVING count(*) > 1)
        |  UNION ALL
        |  SELECT 'l_orderkey,l_partkey', count(*), CAST(coalesce(sum(cnt), 0) AS BIGINT)
        |    FROM (SELECT count(*) AS cnt FROM lineitem GROUP BY l_orderkey, l_partkey HAVING count(*) > 1)
        |) ORDER BY combination""".stripMargin,
    "q19_pk_combinations" ->
      """WITH v AS (SELECT
        |  (SELECT count(*) = count(DISTINCT l_orderkey) FROM lineitem) AS v_o,
        |  (SELECT count(*) = count(DISTINCT l_partkey) FROM lineitem) AS v_p,
        |  (SELECT count(*) = count(DISTINCT l_suppkey) FROM lineitem) AS v_s,
        |  (SELECT count(*) = count(DISTINCT (l_orderkey, l_partkey)) FROM lineitem) AS v_op,
        |  (SELECT count(*) = count(DISTINCT (l_orderkey, l_suppkey)) FROM lineitem) AS v_os,
        |  (SELECT count(*) = count(DISTINCT (l_partkey, l_suppkey)) FROM lineitem) AS v_ps,
        |  (SELECT count(*) = count(DISTINCT (l_orderkey, l_partkey, l_suppkey)) FROM lineitem) AS v_ops)
        |SELECT combination FROM (
        |  SELECT 'l_orderkey' AS combination FROM v WHERE v_o
        |  UNION ALL SELECT 'l_partkey' FROM v WHERE v_p
        |  UNION ALL SELECT 'l_suppkey' FROM v WHERE v_s
        |  UNION ALL SELECT 'l_orderkey,l_partkey' FROM v WHERE v_op AND NOT v_o AND NOT v_p
        |  UNION ALL SELECT 'l_orderkey,l_suppkey' FROM v WHERE v_os AND NOT v_o AND NOT v_s
        |  UNION ALL SELECT 'l_partkey,l_suppkey' FROM v WHERE v_ps AND NOT v_p AND NOT v_s
        |  UNION ALL SELECT 'l_orderkey,l_partkey,l_suppkey' FROM v
        |    WHERE v_ops AND NOT v_op AND NOT v_os AND NOT v_ps AND NOT v_o AND NOT v_p AND NOT v_s
        |) ORDER BY combination""".stripMargin,
    "q20_dedup_exact" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)
        |SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM docs GROUP BY text ORDER BY doc_id""".stripMargin,
    "q21_dedup_minhash" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text || ' zyx wvu' FROM documents WHERE doc_id % 10 = 0),
        |toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM docs),
        |grams AS (SELECT doc_id,
        |  list_distinct(CASE WHEN len(w) >= 3
        |    THEN list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |    ELSE [] END) AS g
        |  FROM toks),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    len(list_intersect(a.g, b.g)) / len(list_distinct(a.g || b.g)) AS jaccard
        |  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
        |  WHERE len(a.g) > 0 AND len(b.g) > 0)
        |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin,
    "q22_dedup_simhash" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text || ' zyx wvu' FROM documents WHERE doc_id % 10 = 0),
        |toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM docs
        |  WHERE len(string_split_regex(trim(lower(text)), '\s+')) > 0),
        |th AS (SELECT doc_id, unnest(list_transform(w, t ->
        |    list_reduce(list_transform(range(18, 33), i ->
        |      CAST(strpos('0123456789abcdef', substring(md5(t), i, 1)) - 1 AS BIGINT)),
        |      (acc, x) -> acc * 16 + x))) AS h FROM toks),
        |votes AS (SELECT doc_id, i.i AS bit,
        |    sum(CASE WHEN (h >> i.i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        |  FROM th, range(60) i(i) GROUP BY doc_id, i.i),
        |fp AS (SELECT doc_id,
        |    CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM votes GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    bit_count(xor(a.simhash, b.simhash)) AS hamming
        |  FROM fp a JOIN fp b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3 ORDER BY id_a, id_b""".stripMargin,
    "q23_dedup_ngram_jaccard" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text || ' zyx wvu' FROM documents WHERE doc_id % 10 = 0),
        |toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM docs),
        |grams AS (SELECT doc_id,
        |  list_distinct(CASE WHEN len(w) >= 3
        |    THEN list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |    ELSE [] END) AS g
        |  FROM toks),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    len(list_intersect(a.g, b.g)) / len(list_distinct(a.g || b.g)) AS jaccard
        |  FROM grams a JOIN grams b ON b.doc_id = a.doc_id + 1000000
        |  WHERE a.doc_id % 10 = 0 AND len(a.g) > 0 AND len(b.g) > 0)
        |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5 ORDER BY id_a""".stripMargin,
    "q24_dedup_embedding" ->
      """WITH twins AS (SELECT vec_id AS id_a, vec_id + 1000000 AS id_b,
        |  embedding::DOUBLE[] AS v1,
        |  (CASE WHEN (vec_id + 1000000) % 2 = 0 THEN embedding
        |        ELSE list_transform(embedding, x -> -x) END)::DOUBLE[] AS v2
        |  FROM embeddings)
        |SELECT id_a, id_b FROM twins
        |WHERE list_cosine_similarity(v1, v2) >= 0.99 ORDER BY id_a""".stripMargin,
    "q25_knn_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT query_id, id, list_cosine_similarity(v, qv) AS score FROM c, q WHERE id <> query_id),
        |r AS (SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM s)
        |SELECT query_id, rank, id AS neighbor_id FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    // Replays lshTopK's bucketing exactly: the hyperplanes are plan
    // literals, so the oracle is generated from the same constants.
    "q26_knn_lsh" -> {
      val planeRows = graft.similarity.Knn.hyperplanes(8, 64, 7L).zipWithIndex
        .map { case (p, j) => s"($j, [${p.mkString(", ")}]::DOUBLE[])" }
        .mkString(",\n  ")
      s"""WITH planes(j, pl) AS (VALUES
         |  $planeRows),
         |v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |vb AS (SELECT id, CAST(sum(CASE WHEN list_dot_product(v.v, p.pl) >= 0
         |    THEN (CAST(1 AS BIGINT) << p.j) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM v, planes p GROUP BY id),
         |vv AS (SELECT v.id, v.v, vb.bucket FROM v JOIN vb USING (id)),
         |q AS (SELECT id AS query_id, v AS qv, bucket FROM vv WHERE id < 10),
         |s AS (SELECT q.query_id, c.id, list_cosine_similarity(c.v, q.qv) AS score
         |  FROM vv c JOIN q ON c.bucket = q.bucket AND c.id <> q.query_id),
         |r AS (SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM s)
         |SELECT query_id, rank, id AS neighbor_id FROM r WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin
    },
    // nprobe = nlist probes every IVF cell, so the index must reproduce
    // flat search exactly — the oracle is the brute-force ground truth.
    "q33_knn_ivf" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT query_id, id, list_cosine_similarity(v, qv) AS score FROM c, q WHERE id <> query_id),
        |r AS (SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM s)
        |SELECT query_id, rank, id AS neighbor_id FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "q28_text_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |  length(text) AS len_chars,
        |  len(string_split_regex(trim(lower(text)), '\s+')) AS n_words,
        |  length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha,
        |  length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS n_punct,
        |  length(regexp_replace(text, '\s', '', 'g')) AS n_nonspace,
        |  len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
        |      x -> list_contains(['the','a','of','and','to','in','is','that','it','for','with','as','was','on'], x))) AS n_stop
        |  FROM documents),
        |f AS (SELECT doc_id, len_chars, n_words,
        |  n_alpha / greatest(len_chars, 1) AS alpha_ratio,
        |  n_punct / greatest(len_chars, 1) AS punct_ratio,
        |  n_nonspace / greatest(n_words, 1) AS avg_word_len,
        |  n_stop / greatest(n_words, 1) AS stop_ratio_en
        |  FROM t)
        |SELECT doc_id, len_chars, n_words, alpha_ratio, punct_ratio, avg_word_len, stop_ratio_en,
        |  alpha_ratio * 0.5 + least(stop_ratio_en * 2.0, 1.0) * 0.3
        |    + CASE WHEN avg_word_len BETWEEN 3.0 AND 10.0 THEN 0.2 ELSE 0.0 END AS quality_score
        |FROM f ORDER BY doc_id""".stripMargin,
    "q29_token_count" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(lower(text)), '\s+')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q30_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q31_multimodal_meta" ->
      """WITH b AS (SELECT doc_id, encode(text) AS payload FROM documents)
        |SELECT doc_id,
        |  CASE WHEN lower(substring(hex(payload), 1, 16)) LIKE 'ffd8ff%' THEN 'image/jpeg'
        |       WHEN lower(substring(hex(payload), 1, 16)) LIKE '89504e47%' THEN 'image/png'
        |       WHEN lower(substring(hex(payload), 1, 16)) LIKE '52494646%' THEN 'audio/wav'
        |       WHEN lower(substring(hex(payload), 1, 16)) LIKE '494433%' THEN 'audio/mpeg'
        |       ELSE 'application/octet-stream' END AS mime,
        |  octet_length(payload) AS n_bytes,
        |  lower(substring(hex(payload), 1, 16)) AS magic_hex
        |FROM b ORDER BY doc_id""".stripMargin,
    "q12_schema_compare" ->
      """SELECT * FROM (VALUES
        |  ('o_orderpriority', 'added', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
        |  ('o_comment', 'removed', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
        |  ('o_totalprice', 'changed', 'double', 'decimal(18,2)'),
        |  ('o_custkey', 'not_changed', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
        |  ('o_orderdate', 'not_changed', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
        |  ('o_orderkey', 'not_changed', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
        |  ('o_orderstatus', 'not_changed', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR))
        |) t(column_name, status, before, after)""".stripMargin,
    "q27_lang_id" ->
      """WITH t AS (SELECT doc_id, text, string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
        |s AS (SELECT doc_id, text,
        |  len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','that','it','for','with','as','was','on'], x))) AS h_en,
        |  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','mit','ein','eine','zu','den','von','für'], x))) AS h_de,
        |  len(list_filter(toks, x -> list_contains(['le','la','les','et','est','un','une','de','des','que','pas','pour','dans'], x))) AS h_fr,
        |  len(list_filter(toks, x -> list_contains(['el','la','los','las','y','es','un','una','de','que','no','por','para','con'], x))) AS h_es,
        |  length(regexp_replace(text, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS cjk,
        |  length(text) AS n
        |  FROM t),
        |p AS (SELECT CASE
        |  WHEN n > 0 AND cjk * 1.0 / n > 0.2 THEN 'zh'
        |  WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
        |  WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
        |  WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
        |  WHEN h_fr >= h_es THEN 'fr'
        |  ELSE 'es' END AS lang_pred FROM s)
        |SELECT lang_pred, count(*) AS n FROM p GROUP BY lang_pred ORDER BY lang_pred""".stripMargin,
    "q32_multimodal_features" ->
      "SELECT doc_id, 16 AS dim FROM documents ORDER BY doc_id",
    "q34_asof_join" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, event_type, value FROM events),
        |l AS (SELECT event_id, user_id, ts_sec FROM ev),
        |r AS (SELECT user_id, ts_sec, max(value) AS profile_value FROM ev WHERE event_type = 'signup' GROUP BY user_id, ts_sec)
        |SELECT l.event_id, l.user_id, l.ts_sec, r.profile_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_sec >= r.ts_sec
        |ORDER BY event_id""".stripMargin,
    "q36_asof_native" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, event_type, value FROM events),
        |l AS (SELECT event_id, user_id, ts_sec FROM ev),
        |r AS (SELECT user_id, ts_sec, max(value) AS profile_value FROM ev WHERE event_type = 'signup' GROUP BY user_id, ts_sec)
        |SELECT l.event_id, l.user_id, l.ts_sec, r.profile_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_sec >= r.ts_sec
        |ORDER BY event_id""".stripMargin,
    "q35_range_join" ->
      """WITH p AS (SELECT event_id, CAST(floor(value) AS BIGINT) AS v FROM events),
        |iv AS (SELECT n_nationkey, CAST(n_nationkey * 8 AS BIGINT) AS lo, CAST(n_nationkey * 8 + 12 AS BIGINT) AS hi FROM nation)
        |SELECT n_nationkey, count(*) AS n_pts
        |FROM p JOIN iv ON p.v BETWEEN iv.lo AND iv.hi
        |GROUP BY n_nationkey ORDER BY n_nationkey""".stripMargin,
    "q37_dedup_clusters" -> CcClustersOracleSql,
    // the distributed pointer-jumping twin must produce IDENTICAL
    // components (q113 runs with localEdgeThreshold = 0)
    "q113_cc_distributed" -> CcClustersOracleSql,
    "q38_dq_rules" ->
      """WITH t AS (SELECT count(*) AS n_rows,
        |  sum(CASE WHEN NOT coalesce(l_quantity > 0, FALSE) THEN 1 ELSE 0 END) AS positive_qty,
        |  sum(CASE WHEN NOT coalesce(l_quantity <= 45, FALSE) THEN 1 ELSE 0 END) AS qty_le_45,
        |  sum(CASE WHEN NOT coalesce(l_discount BETWEEN 0 AND 0.1, FALSE) THEN 1 ELSE 0 END) AS discount_range,
        |  sum(CASE WHEN NOT coalesce(l_returnflag IN ('A', 'N', 'R'), FALSE) THEN 1 ELSE 0 END) AS returnflag_known,
        |  sum(CASE WHEN NOT coalesce(l_extendedprice < 90000, FALSE) THEN 1 ELSE 0 END) AS price_under_90k,
        |  sum(CASE WHEN NOT coalesce(l_shipdate < TIMESTAMP '1999-01-01', FALSE) THEN 1 ELSE 0 END) AS ship_before_1999
        |  FROM lineitem)
        |SELECT rule, n_rows, CAST(n_failed AS BIGINT) AS n_failed FROM (
        |  SELECT 'positive_qty' AS rule, n_rows, positive_qty AS n_failed FROM t
        |  UNION ALL SELECT 'qty_le_45', n_rows, qty_le_45 FROM t
        |  UNION ALL SELECT 'discount_range', n_rows, discount_range FROM t
        |  UNION ALL SELECT 'returnflag_known', n_rows, returnflag_known FROM t
        |  UNION ALL SELECT 'price_under_90k', n_rows, price_under_90k FROM t
        |  UNION ALL SELECT 'ship_before_1999', n_rows, ship_before_1999 FROM t
        |) ORDER BY rule""".stripMargin,
    "q39_quantiles" ->
      """WITH r AS (SELECT event_type, event_id, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type, max(n) AS n,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50,
        |  max(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS p90
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q40_profile" ->
      """WITH d AS (SELECT o_custkey, o_orderstatus, o_orderpriority,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_str FROM orders),
        |a AS (SELECT
        |  CAST(count(o_custkey) AS VARCHAR) AS c1_nn, CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS VARCHAR) AS c1_nu,
        |  CAST(count(DISTINCT o_custkey) AS VARCHAR) AS c1_di, CAST(min(o_custkey) AS VARCHAR) AS c1_mi, CAST(max(o_custkey) AS VARCHAR) AS c1_ma,
        |  CAST(count(o_orderstatus) AS VARCHAR) AS c2_nn, CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS VARCHAR) AS c2_nu,
        |  CAST(count(DISTINCT o_orderstatus) AS VARCHAR) AS c2_di, CAST(min(o_orderstatus) AS VARCHAR) AS c2_mi, CAST(max(o_orderstatus) AS VARCHAR) AS c2_ma,
        |  CAST(count(o_orderpriority) AS VARCHAR) AS c3_nn, CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS VARCHAR) AS c3_nu,
        |  CAST(count(DISTINCT o_orderpriority) AS VARCHAR) AS c3_di, CAST(min(o_orderpriority) AS VARCHAR) AS c3_mi, CAST(max(o_orderpriority) AS VARCHAR) AS c3_ma,
        |  CAST(count(o_orderdate_str) AS VARCHAR) AS c4_nn, CAST(sum(CASE WHEN o_orderdate_str IS NULL THEN 1 ELSE 0 END) AS VARCHAR) AS c4_nu,
        |  CAST(count(DISTINCT o_orderdate_str) AS VARCHAR) AS c4_di, CAST(min(o_orderdate_str) AS VARCHAR) AS c4_mi, CAST(max(o_orderdate_str) AS VARCHAR) AS c4_ma
        |FROM d)
        |SELECT "column", metric, value FROM (
        |  SELECT 'o_custkey' AS "column", 'non_nulls' AS metric, c1_nn AS value FROM a
        |  UNION ALL SELECT 'o_custkey', 'nulls', c1_nu FROM a
        |  UNION ALL SELECT 'o_custkey', 'distinct', c1_di FROM a
        |  UNION ALL SELECT 'o_custkey', 'min', c1_mi FROM a
        |  UNION ALL SELECT 'o_custkey', 'max', c1_ma FROM a
        |  UNION ALL SELECT 'o_orderstatus', 'non_nulls', c2_nn FROM a
        |  UNION ALL SELECT 'o_orderstatus', 'nulls', c2_nu FROM a
        |  UNION ALL SELECT 'o_orderstatus', 'distinct', c2_di FROM a
        |  UNION ALL SELECT 'o_orderstatus', 'min', c2_mi FROM a
        |  UNION ALL SELECT 'o_orderstatus', 'max', c2_ma FROM a
        |  UNION ALL SELECT 'o_orderpriority', 'non_nulls', c3_nn FROM a
        |  UNION ALL SELECT 'o_orderpriority', 'nulls', c3_nu FROM a
        |  UNION ALL SELECT 'o_orderpriority', 'distinct', c3_di FROM a
        |  UNION ALL SELECT 'o_orderpriority', 'min', c3_mi FROM a
        |  UNION ALL SELECT 'o_orderpriority', 'max', c3_ma FROM a
        |  UNION ALL SELECT 'o_orderdate_str', 'non_nulls', c4_nn FROM a
        |  UNION ALL SELECT 'o_orderdate_str', 'nulls', c4_nu FROM a
        |  UNION ALL SELECT 'o_orderdate_str', 'distinct', c4_di FROM a
        |  UNION ALL SELECT 'o_orderdate_str', 'min', c4_mi FROM a
        |  UNION ALL SELECT 'o_orderdate_str', 'max', c4_ma FROM a)
        |ORDER BY "column", metric""".stripMargin,
    "q41_sample_stratified" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
        |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15) <
        |  CASE o_orderpriority
        |    WHEN '1-URGENT' THEN '800000000000000'
        |    WHEN '2-HIGH'   THEN '400000000000000'
        |    WHEN '3-MEDIUM' THEN '200000000000000'
        |    ELSE NULL END
        |ORDER BY o_orderkey""".stripMargin,
    "q42_scd2" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events),
        |m AS (SELECT user_id, event_id, event_type, ts_sec,
        |  lag(event_type) OVER w AS prev,
        |  row_number() OVER w AS rn
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
        |v AS (SELECT user_id, event_type, ts_sec, event_id FROM m
        |  WHERE rn = 1 OR NOT (prev IS NOT DISTINCT FROM event_type))
        |SELECT user_id, event_type,
        |  ts_sec AS valid_from,
        |  lead(ts_sec) OVER w2 AS valid_to,
        |  lead(ts_sec) OVER w2 IS NULL AS is_current
        |FROM v WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
        |ORDER BY user_id, valid_from""".stripMargin,
    "q43_top_tokens" ->
      """SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS token FROM documents)
        |WHERE token <> ''
        |GROUP BY token
        |ORDER BY cnt DESC, token
        |LIMIT 20""".stripMargin,
    "q44_pii_scan" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(CAST(regexp_matches(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}') AS BIGINT)) AS BIGINT) AS n_email,
        |  CAST(sum(CAST(regexp_matches(text, '\+?[0-9][0-9 ()-]{7,}[0-9]') AS BIGINT)) AS BIGINT) AS n_phone,
        |  CAST(sum(CAST(regexp_matches(text, 'https?://[^ ]+') AS BIGINT)) AS BIGINT) AS n_url,
        |  CAST(sum(CAST(regexp_matches(text, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b') AS BIGINT)) AS BIGINT) AS n_ip
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    "q45_split_assign" ->
      """SELECT CASE
        |  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) < 'c00000000000000' THEN 'train'
        |  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) < 'e00000000000000' THEN 'val'
        |  ELSE 'test' END AS split,
        |  lang, count(*) AS n_docs
        |FROM documents
        |GROUP BY 1, 2
        |ORDER BY split, lang""".stripMargin,
    "q46_ttr" ->
      """WITH t AS (SELECT doc_id,
        |  regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        |  CASE WHEN len(toks) > 0
        |       THEN CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
        |       ELSE 0.0 END AS ttr
        |FROM t
        |ORDER BY doc_id""".stripMargin,
    "q47_contamination" ->
      """WITH s AS (SELECT doc_id, text, CASE
        |  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) < 'c00000000000000' THEN 'train'
        |  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) < 'e00000000000000' THEN 'val'
        |  ELSE 'test' END AS split
        |  FROM documents),
        |toks AS (SELECT doc_id, split, string_split_regex(trim(lower(text)), '\s+') AS w FROM s),
        |grams AS (SELECT doc_id, split,
        |  list_distinct(CASE WHEN len(w) >= 5
        |    THEN list_transform(range(1, len(w) - 3),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])
        |    ELSE [] END) AS g
        |  FROM toks),
        |tg AS (SELECT DISTINCT unnest(g) AS gram FROM grams WHERE split = 'train'),
        |te AS (SELECT doc_id, unnest(g) AS gram FROM grams WHERE split = 'test')
        |SELECT doc_id, count(*) AS n_shared
        |FROM te JOIN tg USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q48_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
        |grams AS (SELECT doc_id, list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS g
        |  FROM toks WHERE len(w) >= 2),
        |x AS (SELECT doc_id, unnest(g) AS gram FROM grams),
        |c AS (SELECT doc_id, gram, count(*) AS cnt FROM x GROUP BY doc_id, gram)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams,
        |  CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS top_frac
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q49_histogram" ->
      """WITH v AS (SELECT CAST(value AS DOUBLE) AS x FROM events WHERE value IS NOT NULL),
        |b AS (SELECT CASE WHEN x < 0.0 THEN CAST(-1 AS BIGINT)
        |  WHEN x >= 100.0 THEN CAST(20 AS BIGINT)
        |  ELSE CAST(floor((x - 0.0) / 5.0) AS BIGINT) END AS bucket FROM v)
        |SELECT bucket,
        |  CASE WHEN bucket = -1 THEN CAST('-infinity' AS DOUBLE) ELSE 0.0 + bucket * 5.0 END AS lo,
        |  CASE WHEN bucket = 20 THEN CAST('infinity' AS DOUBLE) ELSE 0.0 + (bucket + 1) * 5.0 END AS hi,
        |  count(*) AS cnt
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q50_asof_forward" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, event_type, value FROM events),
        |l AS (SELECT event_id, user_id, ts_sec FROM ev),
        |r AS (SELECT user_id, ts_sec, max(value) AS profile_value FROM ev WHERE event_type = 'signup' GROUP BY user_id, ts_sec)
        |SELECT l.event_id, l.user_id, l.ts_sec,
        |  CASE WHEN r.ts_sec - l.ts_sec <= 3600 THEN r.profile_value END AS profile_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_sec <= r.ts_sec
        |ORDER BY event_id""".stripMargin,
    "q51_fd_violations" ->
      """SELECT l_partkey, count(DISTINCT l_suppkey) AS n_dependent_values
        |FROM lineitem
        |GROUP BY l_partkey
        |HAVING count(DISTINCT l_suppkey) > 1
        |ORDER BY l_partkey""".stripMargin,
    "q52_gopher_filters" ->
      """WITH t AS (SELECT doc_id,
        |  len(string_split_regex(trim(lower(text)), '\s+')) AS n_words,
        |  length(regexp_replace(text, '\s', '', 'g')) AS n_nonspace,
        |  len(regexp_extract_all(text, '#|\.\.\.|…')) AS n_sym,
        |  len(regexp_extract_all(' ' || lower(text), '\s[^\s]*[a-z]')) AS n_alpha_words,
        |  len(regexp_extract_all(lower(text), '\b(the|be|to|of|and|that|have|with)\b')) AS n_stop,
        |  len(regexp_extract_all(text, chr(10))) + 1 AS n_lines,
        |  len(regexp_extract_all(chr(10) || text, chr(10) || '[ ' || chr(9) || ']*[-*•]')) AS n_bullet,
        |  len(regexp_extract_all(text || chr(10), '(\.\.\.|…)[ ' || chr(9) || ']*' || chr(10))) AS n_ellipsis
        |  FROM documents),
        |f AS (SELECT doc_id, n_words,
        |  n_nonspace / greatest(n_words, 1) AS mean_word_len,
        |  n_sym / greatest(n_words, 1) AS symbol_ratio,
        |  n_alpha_words / greatest(n_words, 1) AS alpha_word_frac,
        |  CAST(n_stop AS BIGINT) AS n_stopwords,
        |  n_bullet / n_lines AS bullet_line_frac,
        |  n_ellipsis / n_lines AS ellipsis_line_frac
        |  FROM t)
        |SELECT *,
        |  (n_words BETWEEN 30 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
        |  AND symbol_ratio < 0.1 AND alpha_word_frac >= 0.8 AND n_stopwords >= 2
        |  AND bullet_line_frac < 0.9 AND ellipsis_line_frac < 0.3 AS passes
        |FROM f ORDER BY doc_id""".stripMargin,
    "q53_cdc_upsert" ->
      """WITH ch AS (SELECT o_custkey AS k, o_orderkey AS seq,
        |  CASE WHEN o_orderkey % 20 = 0 THEN 'D' ELSE 'U' END AS op,
        |  'c#' || CAST(o_custkey AS VARCHAR) AS name_new,
        |  o_totalprice AS bal_new FROM orders),
        |latest AS (SELECT * FROM (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn FROM ch) WHERE rn = 1),
        |m AS (SELECT coalesce(s.c_custkey, l.k) AS c_custkey,
        |  CASE WHEN l.k IS NOT NULL THEN l.name_new ELSE s.c_name END AS c_name,
        |  CASE WHEN l.k IS NOT NULL THEN l.bal_new ELSE s.c_acctbal END AS c_acctbal,
        |  l.op AS op
        |  FROM customer s FULL OUTER JOIN latest l ON s.c_custkey = l.k)
        |SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
        |FROM m WHERE op IS NULL OR op <> 'D' ORDER BY c_custkey""".stripMargin,
    "q54_weighted_sample" ->
      """WITH t AS (SELECT doc_id, n_chars,
        |  list_reduce(list_transform(range(1, 16), i ->
        |    CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
        |    (acc, x) -> acc * 16 + x) / 1152921504606846976.0 AS u
        |  FROM documents)
        |SELECT doc_id, n_chars FROM t
        |WHERE u < least(1.0, n_chars / 400.0) ORDER BY doc_id""".stripMargin,
    "q55_iqr_outliers" ->
      """WITH r AS (SELECT event_type, event_id, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |q AS (SELECT *,
        |  max(CASE WHEN rn = (n + 3) // 4 THEN value END) OVER (PARTITION BY event_type) AS q1,
        |  max(CASE WHEN rn = (3 * n + 3) // 4 THEN value END) OVER (PARTITION BY event_type) AS q3
        |  FROM r),
        |b AS (SELECT event_type, event_id, value,
        |  q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM q)
        |SELECT event_type, event_id, value, lo, hi FROM b
        |WHERE value < lo OR value > hi ORDER BY event_id""".stripMargin,
    "q56_knn_multiprobe" -> {
      val planeRows = graft.similarity.Knn.hyperplanes(8, 64, 7L).zipWithIndex
        .map { case (p, j) => s"($j, [${p.mkString(", ")}]::DOUBLE[])" }
        .mkString(",\n  ")
      val maskRows = graft.similarity.Knn.probeMasks(8, 1)
        .map(m => s"($m)").mkString(", ")
      s"""WITH planes(j, pl) AS (VALUES
         |  $planeRows),
         |masks(m) AS (VALUES $maskRows),
         |v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |vb AS (SELECT id, CAST(sum(CASE WHEN list_dot_product(v.v, p.pl) >= 0
         |    THEN (CAST(1 AS BIGINT) << p.j) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM v, planes p GROUP BY id),
         |vv AS (SELECT v.id, v.v, vb.bucket FROM v JOIN vb USING (id)),
         |q AS (SELECT id AS query_id, v AS qv, xor(bucket, m.m) AS bucket
         |  FROM vv, masks m WHERE id < 10),
         |s AS (SELECT q.query_id, c.id, list_cosine_similarity(c.v, q.qv) AS score
         |  FROM vv c JOIN q ON c.bucket = q.bucket AND c.id <> q.query_id),
         |r AS (SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM s)
         |SELECT query_id, rank, id AS neighbor_id FROM r WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin
    },
    "q57_dedup_canonical" ->
      """WITH RECURSIVE e0 AS (
        |  SELECT d.doc_id AS src, d.doc_id + 1 AS dst FROM documents d
        |  JOIN documents d2 ON d2.doc_id = d.doc_id + 1
        |  WHERE d.doc_id % 10 <= 1),
        |sym AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |nodes AS (SELECT DISTINCT src AS node FROM sym),
        |reach AS (
        |  SELECT node, node AS r FROM nodes
        |  UNION
        |  SELECT s.dst AS node, reach.r FROM reach JOIN sym s ON s.src = reach.node
        |),
        |comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
        |wc AS (SELECT d.doc_id, d.n_chars, coalesce(c.component, d.doc_id) AS component
        |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
        |reps AS (SELECT component, doc_id AS canonical_id FROM (
        |  SELECT component, doc_id,
        |    row_number() OVER (PARTITION BY component ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM wc) WHERE rn = 1)
        |SELECT wc.doc_id, wc.component, r.canonical_id,
        |  wc.doc_id = r.canonical_id AS is_kept
        |FROM wc JOIN reps r USING (component) ORDER BY wc.doc_id""".stripMargin,
    "q58_profile_drift" ->
      """WITH base AS (SELECT o_custkey, o_orderpriority FROM orders),
        |thin AS (SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderkey % 10 <> 0),
        |pb AS (
        |  SELECT 'o_custkey' AS "column", 'non_nulls' AS metric, CAST(count(o_custkey) AS VARCHAR) AS v FROM base
        |  UNION ALL SELECT 'o_custkey', 'nulls', CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS VARCHAR) FROM base
        |  UNION ALL SELECT 'o_custkey', 'distinct', CAST(count(DISTINCT o_custkey) AS VARCHAR) FROM base
        |  UNION ALL SELECT 'o_custkey', 'min', CAST(min(o_custkey) AS VARCHAR) FROM base
        |  UNION ALL SELECT 'o_custkey', 'max', CAST(max(o_custkey) AS VARCHAR) FROM base
        |  UNION ALL SELECT 'o_orderpriority', 'non_nulls', CAST(count(o_orderpriority) AS VARCHAR) FROM base
        |  UNION ALL SELECT 'o_orderpriority', 'nulls', CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS VARCHAR) FROM base
        |  UNION ALL SELECT 'o_orderpriority', 'distinct', CAST(count(DISTINCT o_orderpriority) AS VARCHAR) FROM base
        |  UNION ALL SELECT 'o_orderpriority', 'min', min(o_orderpriority) FROM base
        |  UNION ALL SELECT 'o_orderpriority', 'max', max(o_orderpriority) FROM base),
        |pa AS (
        |  SELECT 'o_custkey' AS "column", 'non_nulls' AS metric, CAST(count(o_custkey) AS VARCHAR) AS v FROM thin
        |  UNION ALL SELECT 'o_custkey', 'nulls', CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS VARCHAR) FROM thin
        |  UNION ALL SELECT 'o_custkey', 'distinct', CAST(count(DISTINCT o_custkey) AS VARCHAR) FROM thin
        |  UNION ALL SELECT 'o_custkey', 'min', CAST(min(o_custkey) AS VARCHAR) FROM thin
        |  UNION ALL SELECT 'o_custkey', 'max', CAST(max(o_custkey) AS VARCHAR) FROM thin
        |  UNION ALL SELECT 'o_orderpriority', 'non_nulls', CAST(count(o_orderpriority) AS VARCHAR) FROM thin
        |  UNION ALL SELECT 'o_orderpriority', 'nulls', CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS VARCHAR) FROM thin
        |  UNION ALL SELECT 'o_orderpriority', 'distinct', CAST(count(DISTINCT o_orderpriority) AS VARCHAR) FROM thin
        |  UNION ALL SELECT 'o_orderpriority', 'min', min(o_orderpriority) FROM thin
        |  UNION ALL SELECT 'o_orderpriority', 'max', max(o_orderpriority) FROM thin),
        |d AS (SELECT b."column", b.metric, b.v AS value_before, a.v AS value_after,
        |  CASE WHEN try_cast(b.v AS DOUBLE) IS NOT NULL AND try_cast(a.v AS DOUBLE) IS NOT NULL
        |    THEN abs(try_cast(a.v AS DOUBLE) - try_cast(b.v AS DOUBLE))
        |      / greatest(abs(try_cast(b.v AS DOUBLE)), 1e-12) END AS rel_delta
        |  FROM pb b JOIN pa a ON b."column" = a."column" AND b.metric = a.metric)
        |SELECT "column", metric, value_before, value_after, rel_delta,
        |  CASE WHEN rel_delta IS NOT NULL THEN rel_delta > 0.05
        |       ELSE value_before IS DISTINCT FROM value_after END AS drifted
        |FROM d ORDER BY "column", metric""".stripMargin,
    "q59_dq_rules_by_group" ->
      """WITH t AS (SELECT l_returnflag, count(*) AS n_rows,
        |  sum(CASE WHEN NOT coalesce(l_quantity <= 45, FALSE) THEN 1 ELSE 0 END) AS r_qty,
        |  sum(CASE WHEN NOT coalesce(l_discount BETWEEN 0 AND 0.1, FALSE) THEN 1 ELSE 0 END) AS r_disc,
        |  sum(CASE WHEN NOT coalesce(l_extendedprice < 90000, FALSE) THEN 1 ELSE 0 END) AS r_price
        |  FROM lineitem GROUP BY l_returnflag),
        |u AS (
        |  SELECT l_returnflag, 'qty_le_45' AS rule, n_rows, r_qty AS n_failed FROM t
        |  UNION ALL SELECT l_returnflag, 'discount_range', n_rows, r_disc FROM t
        |  UNION ALL SELECT l_returnflag, 'price_under_90k', n_rows, r_price FROM t)
        |SELECT l_returnflag, rule, n_rows, CAST(n_failed AS BIGINT) AS n_failed,
        |  CAST(n_failed AS BIGINT) / n_rows AS failure_rate
        |FROM u ORDER BY l_returnflag, rule""".stripMargin,
    "q60_mixture_report" ->
      """WITH a AS (SELECT doc_id, lang,
        |  CASE
        |    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) < 'c00000000000000' THEN 'train'
        |    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) < 'e00000000000000' THEN 'val'
        |    ELSE 'test' END AS split,
        |  len(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |g AS (SELECT split, lang, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens
        |  FROM a GROUP BY split, lang)
        |SELECT split, lang, n_docs, n_tokens,
        |  n_tokens / CAST(sum(n_tokens) OVER (PARTITION BY split) AS BIGINT) AS token_share
        |FROM g ORDER BY split, lang""".stripMargin,
    "q61_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS INT) AS g_status,
        |  count(*) AS n,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, l_returnflag, l_linestatus""".stripMargin,
    "q62_pivot" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS DOUBLE) AS qty_f,
        |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS DOUBLE) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q63_resample" ->
      """WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS slot FROM events),
        |c AS (SELECT event_type, slot, count(*) AS n FROM ev GROUP BY 1, 2),
        |b AS (SELECT event_type, min(slot) AS lo, max(slot) AS hi FROM ev GROUP BY 1),
        |spine AS (SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS slot FROM b)
        |SELECT s.event_type, strftime(s.slot, '%Y-%m-%d %H:%M:%S') AS hr,
        |  CAST(coalesce(c.n, 0) AS BIGINT) AS n
        |FROM spine s LEFT JOIN c ON s.event_type = c.event_type AND s.slot = c.slot
        |ORDER BY s.event_type, hr""".stripMargin,
    "q64_ffill" ->
      """WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS slot, value FROM events),
        |c AS (SELECT event_type, slot, max(value) AS v0 FROM ev GROUP BY 1, 2),
        |b AS (SELECT event_type, min(slot) AS lo, max(slot) AS hi FROM ev GROUP BY 1),
        |spine AS (SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS slot FROM b),
        |j AS (SELECT s.event_type, s.slot, c.v0
        |  FROM spine s LEFT JOIN c ON s.event_type = c.event_type AND s.slot = c.slot),
        |f AS (SELECT event_type, slot,
        |  last_value(v0 IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY slot
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
        |  FROM j)
        |SELECT event_type, strftime(slot, '%Y-%m-%d %H:%M:%S') AS hr, v
        |FROM f ORDER BY event_type, hr""".stripMargin,
    "q65_moving_avg" ->
      """WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS slot FROM events),
        |c AS (SELECT event_type, slot, count(*) AS n FROM ev GROUP BY 1, 2),
        |b AS (SELECT event_type, min(slot) AS lo, max(slot) AS hi FROM ev GROUP BY 1),
        |spine AS (SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS slot FROM b),
        |g AS (SELECT s.event_type, s.slot, CAST(coalesce(c.n, 0) AS BIGINT) AS n
        |  FROM spine s LEFT JOIN c ON s.event_type = c.event_type AND s.slot = c.slot),
        |m AS (SELECT event_type, slot, n,
        |  avg(n) OVER (PARTITION BY event_type ORDER BY slot
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS ma
        |  FROM g)
        |SELECT event_type, strftime(slot, '%Y-%m-%d %H:%M:%S') AS hr, n, ma
        |FROM m ORDER BY event_type, hr""".stripMargin,
    "q66_reconcile" ->
      """WITH b0 AS (SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 1000 = 0 THEN '9-TAMPERED' ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders WHERE o_orderkey <> 7),
        |ah AS (SELECT o_orderkey // 500 AS bucket,
        |  list_reduce(list_transform(range(1, 16), i ->
        |    CAST(strpos('0123456789abcdef', substring(md5(
        |      CAST(o_orderkey AS VARCHAR) || chr(1) || CAST(o_custkey AS VARCHAR) || chr(1) || o_orderpriority
        |    ), i, 1)) - 1 AS BIGINT)), (acc, x) -> acc * 16 + x) AS h
        |  FROM orders),
        |bh AS (SELECT o_orderkey // 500 AS bucket,
        |  list_reduce(list_transform(range(1, 16), i ->
        |    CAST(strpos('0123456789abcdef', substring(md5(
        |      CAST(o_orderkey AS VARCHAR) || chr(1) || CAST(o_custkey AS VARCHAR) || chr(1) || o_orderpriority
        |    ), i, 1)) - 1 AS BIGINT)), (acc, x) -> acc * 16 + x) AS h
        |  FROM b0),
        |ad AS (SELECT bucket, count(*) AS n_a, bit_xor(h) AS digest_a FROM ah GROUP BY bucket),
        |bd AS (SELECT bucket, count(*) AS n_b, bit_xor(h) AS digest_b FROM bh GROUP BY bucket)
        |SELECT coalesce(ad.bucket, bd.bucket) AS bucket,
        |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, digest_a, digest_b
        |FROM ad FULL OUTER JOIN bd ON ad.bucket = bd.bucket
        |WHERE n_a IS DISTINCT FROM n_b OR digest_a IS DISTINCT FROM digest_b
        |ORDER BY bucket""".stripMargin,
    "q67_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q68_dist_drift" ->
      """WITH b AS (SELECT CASE WHEN value < 0.0 THEN -1 WHEN value >= 100.0 THEN 10
        |    ELSE CAST(floor((value - 0.0) / 10.0) AS BIGINT) END AS bucket, count(*) AS n
        |  FROM events WHERE user_id % 2 = 0 AND value IS NOT NULL GROUP BY 1),
        |c AS (SELECT CASE WHEN value < 0.0 THEN -1 WHEN value >= 100.0 THEN 10
        |    ELSE CAST(floor((value - 0.0) / 10.0) AS BIGINT) END AS bucket, count(*) AS n
        |  FROM events WHERE user_id % 2 = 1 AND value IS NOT NULL GROUP BY 1),
        |j AS (SELECT coalesce(b.bucket, c.bucket) AS bucket,
        |    CAST(coalesce(b.n, 0) AS BIGINT) AS n_base,
        |    CAST(coalesce(c.n, 0) AS BIGINT) AS n_cur
        |  FROM b FULL OUTER JOIN c ON b.bucket = c.bucket),
        |t AS (SELECT bucket, n_base, n_cur,
        |    (n_base + 0.5) / (CAST(sum(n_base) OVER () AS BIGINT) + 6.0) AS pb,
        |    (n_cur + 0.5) / (CAST(sum(n_cur) OVER () AS BIGINT) + 6.0) AS pc
        |  FROM j)
        |SELECT bucket, n_base, n_cur, (pc - pb) * (pc - pb) / pb AS chi2_term
        |FROM t ORDER BY bucket""".stripMargin,
    // KS drift: same binning CTEs as q68, then integer cumulative sums and
    // the cross-multiplied numerator — every output column exact
    "q101_ks_drift" ->
      """WITH b AS (SELECT CASE WHEN value < 0.0 THEN -1 WHEN value >= 100.0 THEN 10
        |    ELSE CAST(floor((value - 0.0) / 10.0) AS BIGINT) END AS bucket, count(*) AS n
        |  FROM events WHERE user_id % 2 = 0 AND value IS NOT NULL GROUP BY 1),
        |c AS (SELECT CASE WHEN value < 0.0 THEN -1 WHEN value >= 100.0 THEN 10
        |    ELSE CAST(floor((value - 0.0) / 10.0) AS BIGINT) END AS bucket, count(*) AS n
        |  FROM events WHERE user_id % 2 = 1 AND value IS NOT NULL GROUP BY 1),
        |j AS (SELECT coalesce(b.bucket, c.bucket) AS bucket,
        |    CAST(coalesce(b.n, 0) AS BIGINT) AS n_base,
        |    CAST(coalesce(c.n, 0) AS BIGINT) AS n_cur
        |  FROM b FULL OUTER JOIN c ON b.bucket = c.bucket),
        |k AS (SELECT bucket, n_base, n_cur,
        |    CAST(sum(n_base) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_base,
        |    CAST(sum(n_cur) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cur,
        |    CAST(sum(n_base) OVER () AS BIGINT) AS tot_base,
        |    CAST(sum(n_cur) OVER () AS BIGINT) AS tot_cur
        |  FROM j)
        |SELECT bucket, n_base, n_cur, cum_base, cum_cur,
        |    CAST(abs(cum_base * tot_cur - cum_cur * tot_base) AS BIGINT) AS ks_num
        |FROM k ORDER BY bucket""".stripMargin,
    // Global line dedup + scrub: first-occurrence by the same integer
    // (id << 20) + pos encoding, reassembly via ordered string_agg; a
    // fully-scrubbed doc is '' on both engines (coalesce)
    "q105_line_dedup_scrub" ->
      """WITH d0 AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
        |d AS (SELECT doc_id,
        |    'shared boilerplate header' || coalesce(chr(10) || text, '') || chr(10) || 'shared boilerplate footer' AS text
        |  FROM d0),
        |l AS (SELECT doc_id, i - 1 AS pos, string_split(text, chr(10))[i] AS line
        |  FROM d, LATERAL (SELECT unnest(range(1, len(string_split(text, chr(10))) + 1)) AS i) r),
        |f AS (SELECT md5(line) AS k, min(doc_id * 1048576 + pos) AS first_code
        |  FROM l WHERE length(line) >= 1 GROUP BY 1),
        |kk AS (SELECT l.doc_id, l.pos, l.line,
        |    (length(l.line) < 1 OR (l.doc_id * 1048576 + l.pos) = f.first_code) AS keep
        |  FROM l LEFT JOIN f ON md5(l.line) = f.k)
        |SELECT doc_id,
        |  md5(coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), '')) AS clean_md5,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM kk GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Packed-sequence emission: the oracle reads the SAME token-stream
    // parquet (the greedy merges are the unreplayable part) and replays
    // the q70-style packing window + per-token position arithmetic
    "q104_packed_sequences" ->
      """WITH t AS (SELECT doc_id, lang, toks FROM read_parquet('__GRAFT_FIXTURE:bpe_tokens__/*.parquet')),
        |a AS (SELECT doc_id, lang, toks,
        |    CAST(len(toks) AS BIGINT) AS n,
        |    CAST(sum(len(toks)) OVER (PARTITION BY lang
        |      ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 15), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM t),
        |b AS (SELECT doc_id, lang, toks, cum - n AS start_offset,
        |    CAST((cum - n) // 512 AS BIGINT) AS bin FROM a)
        |SELECT lang, bin, doc_id,
        |  CAST(start_offset + i - 1 AS BIGINT) AS gpos, toks[i] AS token
        |FROM b, LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) r
        |ORDER BY lang, gpos""".stripMargin,
    // Normalization scrub: nfc_normalize + the IDENTICAL regexp chain
    // (character classes + fixed alternatives only — no group refs, no
    // lookaround — so RE2 and Java regex agree); messy suffix built from
    // the same chr() code points the Spark query embeds as \u escapes
    "q107_normalize_scrub" ->
      """WITH m AS (SELECT doc_id,
        |    '  ' || text || chr(13) || chr(10) || 'line with' || chr(9) || 'tabs' || chr(9) || 'and   runs   ' ||
        |    chr(13) || 'lone cr line' || chr(10) || chr(10) || chr(10) || chr(10) ||
        |    'cafe' || chr(769) || ' vs caf' || chr(233) ||
        |    ' zero' || chr(8203) || 'width' || chr(173) || 'soft' ||
        |    'ctrl' || chr(1) || chr(2) || 'chars' ||
        |    chr(10) || ' end ' AS text
        |  FROM documents),
        |n AS (SELECT doc_id, text,
        |    trim(
        |     regexp_replace(
        |      regexp_replace(
        |       regexp_replace(
        |        regexp_replace(
        |         regexp_replace(
        |          nfc_normalize(regexp_replace(
        |           nfc_normalize(text),
        |           '[\x{200B}-\x{200D}\x{2060}\x{FEFF}\x{00AD}]', '', 'g')),
        |          '\r\n?', chr(10), 'g'),
        |         '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
        |        '[ \t]+', ' ', 'g'),
        |       ' ?\n ?', chr(10), 'g'),
        |      '\n{3,}', chr(10) || chr(10), 'g'),
        |     ' ' || chr(10)) AS text_norm
        |  FROM m)
        |SELECT doc_id, md5(text_norm) AS norm_md5,
        |  CAST(length(text) AS BIGINT) AS n_chars_raw,
        |  CAST(length(text_norm) AS BIGINT) AS n_chars_norm,
        |  text_norm <> text AS changed
        |FROM n ORDER BY doc_id""".stripMargin,
    // URL canonicalization: same synthesized messy URLs, same regexp
    // chain (character classes + fixed/non-capturing alternatives only)
    "q108_url_canonical" ->
      """WITH d AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' WHEN doc_id % 3 = 1 THEN 'http' ELSE 'https' END) ||
        |    '://' ||
        |    (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END) ||
        |    'ExAmple' || CAST(doc_id % 7 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '.CO.UK' ELSE '.COM' END) ||
        |    (CASE WHEN doc_id % 4 = 0 THEN ':443' WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END) ||
        |    (CASE WHEN doc_id % 6 = 0 THEN '' ELSE '/Path/' || CAST(doc_id % 13 AS VARCHAR) END) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=news&id=' || CAST(doc_id AS VARCHAR) || '&utm_campaign=x'
        |          WHEN doc_id % 5 = 1 THEN '?id=' || CAST(doc_id AS VARCHAR) ELSE '' END) ||
        |    (CASE WHEN doc_id % 3 = 2 THEN '#Sec' ELSE '' END) AS url
        |  FROM documents),
        |p AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS u0 FROM d),
        |q AS (SELECT doc_id, url,
        |    lower(regexp_extract(u0, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    regexp_extract(u0, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS hostport,
        |    regexp_extract(u0, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
        |    regexp_replace(regexp_replace(regexp_extract(u0, '\?(.*)', 1),
        |      '(^|&)(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|ref)=[^&]*', '', 'g'), '^&+', '') AS cq
        |  FROM p),
        |r AS (SELECT doc_id, url, scheme,
        |    lower(regexp_replace(hostport, ':[0-9]*$', '')) AS host,
        |    regexp_extract(hostport, ':([0-9]+)$', 1) AS port, pth, cq
        |  FROM q),
        |t AS (SELECT *,
        |    regexp_extract(host, '([^.]+\.(?:co|com|net|org|gov|ac|edu)\.[a-z][a-z]|[^.]+\.[^.]+)$', 1) AS dom
        |  FROM r)
        |SELECT doc_id, url, scheme, host,
        |  CASE WHEN dom = '' THEN host ELSE dom END AS domain,
        |  scheme || '://' || host ||
        |  (CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80') OR (scheme = 'https' AND port = '443'))
        |    THEN ':' || port ELSE '' END) ||
        |  (CASE WHEN pth = '' THEN '/' ELSE pth END) ||
        |  (CASE WHEN cq = '' THEN '' ELSE '?' || cq END) AS canonical
        |FROM t ORDER BY doc_id""".stripMargin,
    // Training-order interleave: stride scheduling replayed — md5
    // shuffle ranks per source, floor((2r-1)*scale/2w) integer keys
    // (DuckDB // is integer floor division), (key, source, rank) order
    "q109_training_order" ->
      """WITH t AS (SELECT doc_id, source,
        |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS h FROM documents),
        |w AS (SELECT source, CAST(length(source)*7 % 5 + 1 AS BIGINT) AS weight
        |  FROM (SELECT DISTINCT source FROM documents)),
        |r AS (SELECT doc_id, source, h,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS src_rank
        |  FROM t),
        |k AS (SELECT r.doc_id, r.source, w.weight, r.src_rank,
        |    CAST(((2*r.src_rank - 1) * 1000000000) // (2*w.weight) AS BIGINT) AS order_key
        |  FROM r JOIN w USING (source))
        |SELECT CAST(row_number() OVER (ORDER BY order_key, source, src_rank) AS BIGINT) AS pos,
        |  doc_id, source, weight, src_rank, order_key
        |FROM k ORDER BY pos""".stripMargin,
    // Intra-doc repetition: same synthesis, same unit splits (LF /
    // blank-line runs, empties dropped), integer counts, fractions as
    // single divisions of exact longs
    "q110_intradoc_repetition" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0 THEN text || chr(10) || 'repeat me' || chr(10) || 'repeat me' || chr(10) || 'repeat me'
        |         WHEN doc_id % 4 = 1 THEN text || chr(10) || chr(10) || 'quoted para' || chr(10) || chr(10) || 'quoted para'
        |         ELSE text END AS text FROM documents),
        |l AS (SELECT doc_id, u FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS u FROM d) WHERE u <> ''),
        |lc AS (SELECT doc_id, u, count(*) AS c FROM l GROUP BY 1, 2),
        |lm AS (SELECT doc_id,
        |    CAST(sum(c) AS BIGINT) AS n_lines,
        |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) / CAST(sum(c) AS DOUBLE) AS dup_line_frac,
        |    sum(CASE WHEN c > 1 THEN c * length(u) ELSE 0 END) / CAST(sum(c * length(u)) AS DOUBLE) AS dup_line_char_frac
        |  FROM lc GROUP BY 1),
        |p AS (SELECT doc_id, u FROM (SELECT doc_id, unnest(string_split_regex(text, '\n{2,}')) AS u FROM d) WHERE u <> ''),
        |pc AS (SELECT doc_id, u, count(*) AS c FROM p GROUP BY 1, 2),
        |pm AS (SELECT doc_id,
        |    CAST(sum(c) AS BIGINT) AS n_paras,
        |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) / CAST(sum(c) AS DOUBLE) AS dup_para_frac,
        |    sum(CASE WHEN c > 1 THEN c * length(u) ELSE 0 END) / CAST(sum(c * length(u)) AS DOUBLE) AS dup_para_char_frac
        |  FROM pc GROUP BY 1)
        |SELECT lm.doc_id, lm.n_lines, lm.dup_line_frac, lm.dup_line_char_frac,
        |  pm.n_paras, pm.dup_para_frac, pm.dup_para_char_frac,
        |  (dup_line_frac <= 0.3 AND dup_para_frac <= 0.3
        |    AND dup_line_char_frac <= 0.2 AND dup_para_char_frac <= 0.2) AS passes_repetition
        |FROM lm JOIN pm ON lm.doc_id = pm.doc_id ORDER BY lm.doc_id""".stripMargin,
    // URL curation pipeline: the oracle derives canonicals
    // INDEPENDENTLY (arithmetic construction — https always, www by
    // id%3, :443 always dropped, utm query always stripped, fragment
    // dropped) then replays dedup, the md5-order cap, and the report
    "q111_url_pipeline" ->
      """WITH d AS (SELECT doc_id,
        |    'https://' || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) ||
        |    'site' || CAST(doc_id % 20 AS VARCHAR) || '.com' ||
        |    '/p/' || CAST(doc_id % 40 AS VARCHAR) AS canonical,
        |    'site' || CAST(doc_id % 20 AS VARCHAR) || '.com' AS domain
        |  FROM documents),
        |f AS (SELECT canonical, min(doc_id) AS doc_id, min(domain) AS domain
        |  FROM d GROUP BY 1),
        |c AS (SELECT doc_id, domain FROM (
        |    SELECT doc_id, domain, row_number() OVER (PARTITION BY domain
        |      ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 15), doc_id) AS rn
        |    FROM f) WHERE rn <= 2)
        |SELECT c.domain, CAST(count(*) AS BIGINT) AS n_pages,
        |  CAST(sum(doc.n_chars) AS BIGINT) AS chars_kept
        |FROM c JOIN documents doc ON c.doc_id = doc.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Tokenizer fertility: same fixture parquet as q104; list folds +
    // integer floor division (// in DuckDB), one float division of
    // exact longs
    "q112_tokenizer_fertility" ->
      """WITH t AS (SELECT doc_id, lang, toks
        |  FROM read_parquet('__GRAFT_FIXTURE:bpe_tokens__/*.parquet')),
        |a AS (SELECT doc_id, lang,
        |    CAST(len(toks) AS BIGINT) AS n_toks,
        |    CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS n_chars,
        |    CAST(len(list_filter(toks, x -> length(x) = 1)) AS BIGINT) AS n_single
        |  FROM t)
        |SELECT doc_id, lang, n_toks, n_chars, n_single,
        |  CAST((n_toks * 1000000) // n_chars AS BIGINT) AS toks_per_mchar,
        |  n_single / CAST(n_toks AS DOUBLE) AS single_tok_frac
        |FROM a WHERE n_toks > 0 AND n_chars > 0 ORDER BY doc_id""".stripMargin,
    // Unified tokenizer dashboard: fertility + packing + mixture per
    // language in one pass over the q104 token-stream fixture; DuckDB
    // replays the folds, the integer ceil/floor idioms (// is floor
    // division), and the share divisions of exact longs
    "q114_tokenizer_report" ->
      """WITH t AS (SELECT doc_id, lang, toks
        |  FROM read_parquet('__GRAFT_FIXTURE:bpe_tokens__/*.parquet')),
        |d AS (SELECT lang,
        |    CAST(len(toks) AS BIGINT) AS n_toks,
        |    CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS n_chars,
        |    CAST(len(list_filter(toks, x -> length(x) = 1)) AS BIGINT) AS n_single
        |  FROM t WHERE len(toks) > 0
        |    AND list_sum(list_transform(toks, x -> length(x))) > 0),
        |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_toks) AS BIGINT) AS n_toks,
        |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |    CAST(sum(n_single) AS BIGINT) AS n_single
        |  FROM d GROUP BY 1)
        |SELECT lang, n_docs, n_toks, n_chars, n_single,
        |  CAST((n_toks * 1000000) // n_chars AS BIGINT) AS toks_per_mchar,
        |  n_single / CAST(n_toks AS DOUBLE) AS single_tok_frac,
        |  CAST((n_toks + 511) // 512 AS BIGINT) AS n_chunks,
        |  n_toks / CAST(((n_toks + 511) // 512) * 512 AS DOUBLE) AS fill_frac,
        |  n_toks / CAST((SELECT sum(n_toks) FROM a) AS DOUBLE) AS mixture_frac
        |FROM a ORDER BY lang""".stripMargin,
    // HTML extraction: same synthesized page, same regexp chain ((?is)
    // inline flags + non-greedy spans behave identically in Java regex
    // and RE2); named entities via fixed-string replace (equivalent to
    // the Spark side's literal-pattern regexp_replace), &amp; decoded
    // LAST so '&amp;lt;' yields the literal '&lt;'
    "q116_html_extract" ->
      """WITH d AS (SELECT doc_id,
        |    '<!DOCTYPE html><html><head><title>T' || CAST(doc_id AS VARCHAR) ||
        |    '</title><style>p { color: red; }</style>' ||
        |    '<script type="text/javascript">var x = 1 < 2;</script></head><body>' ||
        |    '<!-- comment ' || CAST(doc_id AS VARCHAR) || ' -->' ||
        |    '<h1 class="hd">Heading ' || CAST(doc_id % 7 AS VARCHAR) || '</h1>' ||
        |    '<p>' || text || '</p>' ||
        |    (CASE WHEN doc_id % 3 = 0
        |      THEN '<p>first &amp; second &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>'
        |      ELSE '<div>plain<b>bold</b>tail</div>' END) ||
        |    '<ul><li>item a</li><li>item b</li></ul></body></html>' AS html
        |  FROM documents),
        |s AS (SELECT doc_id, html,
        |    regexp_replace(
        |     regexp_replace(
        |      regexp_replace(
        |       regexp_replace(html, '(?s)<!--.*?-->', '', 'g'),
        |       '(?is)<(?:script|style|noscript)[^>]*>.*?</(?:script|style|noscript)\s*>', '', 'g'),
        |      '(?i)<(?:br|hr|/p|/div|/h[1-6]|/li|/tr|/ul|/ol|/table|/blockquote|/pre|/section|/article|/header|/footer)[^>]*>', chr(10), 'g'),
        |     '<[^>]*>', ' ', 'g') AS t3
        |  FROM d),
        |e AS (SELECT doc_id, html,
        |    replace(replace(replace(replace(replace(replace(
        |      t3, '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
        |      '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&') AS text
        |  FROM s)
        |SELECT doc_id, md5(text) AS text_md5,
        |  CAST(len(regexp_extract_all(html, '<[^>]*>')) AS BIGINT) AS n_tags,
        |  CAST(length(html) AS BIGINT) AS n_chars_html,
        |  CAST(length(text) AS BIGINT) AS n_chars_text
        |FROM e ORDER BY doc_id""".stripMargin,
    // Incremental line scrub: store membership by line string, batch
    // firsts by the (id<<20)+pos min-code rule (1048576 = 2^20 =
    // LineDedup.PosBits), blank lines always kept, ordered reassembly;
    // string_agg skips scrubbed (NULL) lines, coalesce handles the
    // fully-scrubbed doc
    "q123_line_scrub_incremental" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'shared header line' || chr(10) || text
        |         WHEN doc_id % 3 = 1 THEN text || chr(10) || 'shared footer line'
        |         ELSE text END AS text
        |  FROM documents),
        |t AS (SELECT doc_id, string_split(text, chr(10)) AS w FROM d),
        |l AS (SELECT doc_id, i - 1 AS pos, w[i] AS line
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) r),
        |stl AS (SELECT DISTINCT line FROM l WHERE doc_id < 250 AND length(line) >= 1),
        |bl AS (SELECT * FROM l WHERE doc_id >= 250),
        |bf AS (SELECT line, min(doc_id * 1048576 + pos) AS fc
        |  FROM bl WHERE length(line) >= 1 GROUP BY 1),
        |k AS (SELECT bl.doc_id, bl.pos, bl.line,
        |    (length(bl.line) < 1 OR (stl.line IS NULL AND bl.doc_id * 1048576 + bl.pos = bf.fc)) AS keep
        |  FROM bl LEFT JOIN stl ON bl.line = stl.line
        |  LEFT JOIN bf ON bl.line = bf.line)
        |SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), '') AS text_clean,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Quality classifier: the oracle refits the NBSVM-style model —
    // hexdigit-fold buckets mod 1024 (the q103 idiom), per-bucket
    // weight floor(2e6·p·N/(p·N+n·P)) − 1e6 in HUGEINT (numerator
    // non-negative, so // matches Spark's pmod floor-div) — then
    // replays every doc's margin and the avg-margin ≥ 0 gate
    "q125_quality_classifier" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
        |g AS (SELECT doc_id,
        |    list_concat(w, list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gs
        |  FROM tok),
        |b AS (SELECT doc_id,
        |    list_reduce(list_transform(range(1, 16), i ->
        |      CAST(strpos('0123456789abcdef', substring(md5(u.gram), i, 1)) - 1 AS BIGINT)),
        |      (acc, x) -> acc * 16 + x) % 1024 AS bucket
        |  FROM g, unnest(gs) AS u(gram)),
        |cnt AS (SELECT bucket,
        |    sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS cnt_p,
        |    sum(CASE WHEN doc_id % 5 = 3 THEN 1 ELSE 0 END) AS cnt_n
        |  FROM b WHERE doc_id % 5 = 0 OR doc_id % 5 = 3 GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt_p) AS HUGEINT) AS pt, CAST(sum(cnt_n) AS HUGEINT) AS nt FROM cnt),
        |wt AS (SELECT bucket,
        |    CAST((2 * 1000000 * CAST(cnt_p AS HUGEINT) * nt) //
        |      (CAST(cnt_p AS HUGEINT) * nt + CAST(cnt_n AS HUGEINT) * pt) - 1000000 AS BIGINT) AS w
        |  FROM cnt, tot),
        |sig AS (SELECT b.doc_id, count(*) AS n_grams, sum(coalesce(wt.w, 0)) AS margin
        |  FROM b LEFT JOIN wt USING (bucket) GROUP BY 1)
        |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
        |  CAST(margin AS BIGINT) AS margin, margin >= 0 AS keep
        |FROM sig ORDER BY doc_id""".stripMargin,
    // Perceptual image near-dup: ALL-PAIRS hamming over the same dHash
    // fixture parquet the query read — banded blocking must reproduce
    // the exhaustive answer exactly (recall misses fail the gate)
    "q126_image_neardup" ->
      """WITH h AS (SELECT doc_id, ph
        |    FROM read_parquet('__GRAFT_FIXTURE:image_phash__/*.parquet')
        |    WHERE ph IS NOT NULL),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    bit_count(xor(a.ph, b.ph)) AS hamming
        |  FROM h a JOIN h b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    // Numeric entity decode: the oracle CONSTRUCTS the expected decoded
    // text via chr() on the same arithmetic codepoints (19968 = 0x4E00,
    // 128512 = 0x1F600) — it never replays the kernel's parse, so the
    // decode logic is independently cross-checked; malformed/out-of-
    // range/unknown-named entities appear verbatim in the expectation
    "q127_numeric_entities" ->
      """WITH e AS (SELECT doc_id,
        |    ' a ' || chr(CAST(160 + doc_id % 400 AS INTEGER)) ||
        |    ' b ' || chr(CAST(19968 + doc_id % 256 AS INTEGER)) ||
        |    ' c' || chr(10) || ' d ' || chr(CAST(128512 + doc_id % 16 AS INTEGER)) ||
        |    ' bad &#zz; over &#1234567; amp & mid  copy &copy; end' || chr(10) AS text
        |  FROM documents)
        |SELECT doc_id, md5(text) AS text_md5,
        |  CAST(length(text) AS BIGINT) AS n_chars
        |FROM e ORDER BY doc_id""".stripMargin,
    // Exact-substring dedup: overlapping 8-token gram keys (60-bit md5
    // prefixes, 1-based inclusive list slices), duplicate = freq > 1
    // gram whose (doc_id<<20)+pos code is not the corpus min; coverage
    // by EXPANDING each duplicated position to its 8 covered token
    // indices (the engine merges islands instead — same set); ordered
    // token re-aggregation; fully-covered docs keep an empty string
    "q124_exactsubstr" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'alpha beta gamma delta epsilon zeta eta theta ' || text
        |         WHEN doc_id % 3 = 1 THEN text || ' omega psi chi phi upsilon tau sigma rho'
        |         ELSE text END AS text
        |  FROM documents),
        |t AS (SELECT doc_id, string_split(text, ' ') AS w FROM d),
        |g AS (SELECT doc_id, i - 1 AS pos,
        |    substr(md5(array_to_string(w[i:i+7], ' ')), 1, 15) AS h
        |  FROM t, LATERAL (SELECT unnest(range(1, greatest(len(w) - 7, 0) + 1)) AS i) r),
        |f AS (SELECT h, count(*) AS c, min(doc_id * 1048576 + pos) AS fc FROM g GROUP BY h),
        |dup AS (SELECT g.doc_id, g.pos FROM g JOIN f USING (h)
        |  WHERE f.c > 1 AND g.doc_id * 1048576 + g.pos <> f.fc),
        |cov AS (SELECT DISTINCT doc_id, pos + j AS tp
        |  FROM dup, LATERAL (SELECT unnest(range(0, 8)) AS j) e),
        |tok AS (SELECT doc_id, i - 1 AS tp, w[i] AS tokw
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) r),
        |res AS (SELECT tok.doc_id,
        |    string_agg(CASE WHEN cov.tp IS NULL THEN tok.tokw END, ' ' ORDER BY tok.tp) AS text_clean,
        |    count(*) AS n_tokens,
        |    sum(CASE WHEN cov.tp IS NULL THEN 0 ELSE 1 END) AS n_removed
        |  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.tp = cov.tp
        |  GROUP BY tok.doc_id)
        |SELECT doc_id, md5(coalesce(text_clean, '')) AS text_md5,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_removed AS BIGINT) AS n_removed
        |FROM res ORDER BY doc_id""".stripMargin,
    // Token-budget truncation: same regex split, slice + single-space
    // rejoin on the long branch, original bytes on the short branch
    "q122_truncate_budget" ->
      """WITH t AS (SELECT doc_id, text, string_split_regex(text, '\s+') AS w FROM documents)
        |SELECT doc_id,
        |  CASE WHEN len(w) > 64 THEN array_to_string(w[1:64], ' ') ELSE text END AS text,
        |  CAST(len(w) AS BIGINT) AS n_tokens_raw,
        |  CAST(least(len(w), 64) AS BIGINT) AS n_tokens,
        |  len(w) > 64 AS truncated
        |FROM t ORDER BY doc_id""".stripMargin,
    // Full Gopher repetition table: see GopherRepetitionOracleSql
    "q121_gopher_repetition" -> GopherRepetitionOracleSql,
    // Within-doc line scrub: per-(doc, line) first-position window +
    // ordered re-aggregation replays the narrow HOF fold; blank lines
    // (length < 1) always survive, including duplicates
    "q120_intradoc_line_scrub" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN text || chr(10) || 'Subscribe now!' || chr(10) || 'More content here indeed' || chr(10) || 'Subscribe now!' || chr(10) || 'Subscribe now!'
        |         WHEN doc_id % 3 = 1 THEN text || chr(10) || chr(10) || 'Cookie banner' || chr(10) || chr(10) || 'Cookie banner'
        |         ELSE text END AS text
        |  FROM documents),
        |t AS (SELECT doc_id, string_split(text, chr(10)) AS w FROM d),
        |l AS (SELECT doc_id, i AS pos, w[i] AS line
        |  FROM t, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) r),
        |k AS (SELECT *, row_number() OVER (PARTITION BY doc_id, line ORDER BY pos) AS rn FROM l),
        |kept AS (SELECT doc_id, pos, line FROM k WHERE length(line) < 1 OR rn = 1),
        |agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_clean,
        |    CAST(count(*) AS BIGINT) AS n_kept FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_lines FROM t)
        |SELECT tot.doc_id AS doc_id, agg.text_clean, tot.n_lines, agg.n_kept
        |FROM tot JOIN agg ON tot.doc_id = agg.doc_id
        |ORDER BY doc_id""".stripMargin,
    // Curation funnel v2: the q116 strip chain + the q107 normalize
    // chain replayed verbatim; canonicals/domains derived ARITHMETICALLY
    // (the q111 cross-check pattern); min-doc-id-per-canonical carries
    // its own normalized text into the per-domain report
    "q119_curation_funnel" ->
      """WITH d AS (SELECT doc_id,
        |    '<html><head><style>b { color: blue }</style></head><body>' ||
        |    '<!-- crawler ' || CAST(doc_id AS VARCHAR) || ' -->' ||
        |    '<p>' || text || '</p>' ||
        |    '<script>track();</script></body></html>' AS html,
        |    'https://' || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) ||
        |    'site' || CAST(doc_id % 20 AS VARCHAR) || '.com' ||
        |    '/p/' || CAST(doc_id % 40 AS VARCHAR) AS canonical,
        |    'site' || CAST(doc_id % 20 AS VARCHAR) || '.com' AS dom
        |  FROM documents),
        |x AS (SELECT doc_id, canonical, dom,
        |    replace(replace(replace(replace(replace(replace(
        |     regexp_replace(
        |      regexp_replace(
        |       regexp_replace(
        |        regexp_replace(html, '(?s)<!--.*?-->', '', 'g'),
        |        '(?is)<(?:script|style|noscript)[^>]*>.*?</(?:script|style|noscript)\s*>', '', 'g'),
        |       '(?i)<(?:br|hr|/p|/div|/h[1-6]|/li|/tr|/ul|/ol|/table|/blockquote|/pre|/section|/article|/header|/footer)[^>]*>', chr(10), 'g'),
        |      '<[^>]*>', ' ', 'g'),
        |     '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&') AS text_x
        |  FROM d),
        |n AS (SELECT doc_id, canonical, dom,
        |    trim(
        |     regexp_replace(
        |      regexp_replace(
        |       regexp_replace(
        |        regexp_replace(
        |         regexp_replace(
        |          nfc_normalize(regexp_replace(
        |           nfc_normalize(text_x),
        |           '[\x{200B}-\x{200D}\x{2060}\x{FEFF}\x{00AD}]', '', 'g')),
        |          '\r\n?', chr(10), 'g'),
        |         '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
        |        '[ \t]+', ' ', 'g'),
        |       ' ?\n ?', chr(10), 'g'),
        |      '\n{3,}', chr(10) || chr(10), 'g'),
        |     ' ' || chr(10)) AS text_n
        |  FROM x),
        |f AS (SELECT * FROM n WHERE length(text_n) >= 100),
        |fp AS (SELECT doc_id, canonical, dom, text_n FROM (
        |    SELECT *, row_number() OVER (PARTITION BY canonical ORDER BY doc_id) AS rn
        |    FROM f) WHERE rn = 1),
        |bl AS (SELECT * FROM fp WHERE dom NOT IN ('site4.com', 'site11.com'))
        |SELECT dom AS domain, CAST(count(*) AS BIGINT) AS n_pages,
        |  CAST(sum(length(text_n)) AS BIGINT) AS chars_kept
        |FROM bl GROUP BY 1 ORDER BY 1""".stripMargin,
    // Decontamination scrub: overlapping eval grams (range(n-k+1)),
    // non-overlapping train spans (the q78 chop), 60-bit md5 keys,
    // anti-join via LEFT JOIN + NULL test (string_agg skips NULLs so
    // hit spans vanish), ordered reassembly + sub-span tail
    "q118_decontamination_scrub" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ev AS (SELECT doc_id, w FROM toks WHERE doc_id % 17 = 0),
        |evg AS (SELECT DISTINCT substr(md5(array_to_string(w[i+1 : i+8], ' ')), 1, 15) AS h
        |  FROM ev, LATERAL (SELECT unnest(range(len(w) - 8 + 1)) AS i) r),
        |sp AS (SELECT doc_id, unnest(list_transform(range(CAST(floor(len(w)/8) AS BIGINT)),
        |    i -> {'span_idx': i, 'span': array_to_string(w[i*8+1 : i*8+8], ' ')})) AS s
        |  FROM toks),
        |spf AS (SELECT doc_id, s.span_idx AS span_idx, s.span AS span,
        |        substr(md5(s.span), 1, 15) AS h FROM sp),
        |tagged AS (SELECT spf.doc_id, spf.span_idx, spf.span,
        |    evg.h IS NOT NULL AS hit
        |  FROM spf LEFT JOIN evg ON spf.h = evg.h),
        |agg AS (SELECT doc_id,
        |    CAST(count(*) AS BIGINT) AS n_spans,
        |    CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_scrubbed,
        |    string_agg(CASE WHEN NOT hit THEN span END, ' ' ORDER BY span_idx) AS k
        |  FROM tagged GROUP BY doc_id),
        |tails AS (
        |  SELECT doc_id, array_to_string(w[CAST(floor(len(w)/8) AS BIGINT)*8+1 : len(w)], ' ') AS tail
        |  FROM toks)
        |SELECT d.doc_id AS doc_id,
        |  concat_ws(' ', nullif(agg.k, ''), nullif(tails.tail, '')) AS text,
        |  CAST(coalesce(agg.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(coalesce(agg.n_scrubbed, 0) AS BIGINT) AS n_scrubbed
        |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        |JOIN tails ON d.doc_id = tails.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // Domain blocklist: the oracle derives registered domains by
    // arithmetic construction (never the host/PSL chain) and replays
    // NOT IN — two blocklist entries hit, two are inert (site7/site12
    // pair with the other suffix by the id arithmetic), so both
    // filtering and no-false-positive behavior are cross-checked
    "q117_domain_blocklist" ->
      """WITH d AS (SELECT doc_id,
        |    'https://' || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) ||
        |    'site' || CAST(doc_id % 20 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 4 = 0 THEN '.co.uk' ELSE '.com' END) ||
        |    '/p/' || CAST(doc_id % 40 AS VARCHAR) AS url,
        |    'site' || CAST(doc_id % 20 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 4 = 0 THEN '.co.uk' ELSE '.com' END) AS dom
        |  FROM documents)
        |SELECT doc_id, url FROM d
        |WHERE dom NOT IN ('site3.com', 'site7.co.uk', 'site12.com', 'site16.co.uk')
        |ORDER BY doc_id""".stripMargin,
    // CCNet perplexity triage: replays n-gram model fitting (the q92
    // pattern over ALL docs), the integer attested-mass key, the
    // per-language (key DESC, id) rank, the tercile arithmetic
    // (((rnk-1)*3) // n), and the md5 hex-threshold keep rule
    // (hexThreshold(0.5) = 8e14 hex, 0.25 = 4e14 hex; head keeps all)
    "q115_perplexity_buckets" ->
      """WITH tok AS (SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
        |ref AS (SELECT * FROM tok WHERE doc_id % 10 < 8),
        |uni AS (SELECT u.tok AS token, count(*) AS cnt
        |  FROM ref, unnest(w) AS u(tok) GROUP BY 1 HAVING count(*) >= 2),
        |rbi AS (SELECT w[i] AS w1, w[i+1] AS w2, count(*) AS cnt
        |  FROM ref, LATERAL (SELECT unnest(range(1, len(w))) AS i) r
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |su AS (SELECT doc_id, u.tok AS token FROM tok, unnest(w) AS u(tok)),
        |sustats AS (SELECT doc_id, count(*) AS n_tokens,
        |  sum(CASE WHEN uni.token IS NULL THEN 1 ELSE 0 END) AS n_oov
        |  FROM su LEFT JOIN uni ON su.token = uni.token GROUP BY doc_id),
        |sb AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        |  FROM tok, LATERAL (SELECT unnest(range(1, len(w))) AS i) r),
        |sbstats AS (SELECT doc_id, count(*) AS n_bigrams,
        |  sum(CASE WHEN rbi.w1 IS NULL THEN 0 ELSE 1 END) AS n_bigram_hits
        |  FROM sb LEFT JOIN rbi ON sb.w1 = rbi.w1 AND sb.w2 = rbi.w2 GROUP BY doc_id),
        |sig AS (SELECT t.doc_id, t.lang,
        |    CAST(s.n_tokens AS BIGINT) AS n_tokens,
        |    CAST(s.n_oov AS BIGINT) AS n_oov,
        |    CAST(coalesce(b.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |    CAST(coalesce(b.n_bigram_hits, 0) AS BIGINT) AS n_bigram_hits
        |  FROM tok t JOIN sustats s ON t.doc_id = s.doc_id
        |  LEFT JOIN sbstats b ON t.doc_id = b.doc_id),
        |k AS (SELECT *, CASE WHEN n_tokens + n_bigrams = 0 THEN CAST(-1 AS BIGINT)
        |    ELSE CAST(((n_tokens - n_oov + n_bigram_hits) * 1000000000) // (n_tokens + n_bigrams) AS BIGINT)
        |    END AS lm_key FROM sig),
        |r AS (SELECT *,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY lm_key DESC, doc_id) AS BIGINT) AS q_rank,
        |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n FROM k),
        |b AS (SELECT *, CAST(((q_rank - 1) * 3) // n AS BIGINT) AS bucket FROM r)
        |SELECT doc_id, lang, n_tokens, n_oov, n_bigrams, n_bigram_hits, lm_key, q_rank, bucket
        |FROM b
        |WHERE bucket = 0
        |   OR (bucket = 1 AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) < '800000000000000')
        |   OR (bucket = 2 AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) < '400000000000000')
        |ORDER BY doc_id""".stripMargin,
    // DSIR: replays hashed-gram model fitting (md5 hexdigit-fold buckets,
    // the q80 trick), integer evidence masses, the cross-multiplied
    // HUGEINT key, and the grouped top-fraction window — all integer
    "q103_dsir_select" -> DsirOracleSql,
    // prebuilt-models twin must produce IDENTICAL output — the oracle
    // refits in SQL, so it also re-verifies the fixtures' content
    "q106_dsir_prebuilt" -> DsirOracleSql,
    // SemDeDup: the oracle reads the SAME (id, v, cell) assignment parquet
    // the Spark query read (cell assignment is ingest-time corpus state),
    // then replays within-cell pair generation, the recursive-CTE
    // component closure, and the min-id keep policy wholly in SQL
    "q102_semantic_dedup" ->
      """WITH RECURSIVE a AS (
        |  SELECT id, v, cell FROM read_parquet('__GRAFT_FIXTURE:semdedup_assign__/*.parquet')),
        |p AS (SELECT x.id AS src, y.id AS dst FROM a x JOIN a y
        |    ON x.cell = y.cell AND x.id < y.id
        |  WHERE x.cell >= 0 AND list_cosine_similarity(x.v, y.v) >= 0.99),
        |sym AS (SELECT src, dst FROM p UNION SELECT dst, src FROM p),
        |nodes AS (SELECT DISTINCT src AS node FROM sym),
        |reach AS (
        |  SELECT node, node AS r FROM nodes
        |  UNION
        |  SELECT s.dst AS node, reach.r FROM reach JOIN sym s ON s.src = reach.node),
        |comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
        |SELECT a.id, coalesce(c.component, a.id) AS component,
        |  coalesce(c.component, a.id) = a.id AS keep
        |FROM a LEFT JOIN comp c ON c.node = a.id
        |ORDER BY a.id""".stripMargin,
    "q69_source_cap" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 15), doc_id) AS rn
        |  FROM documents) WHERE rn <= 15 ORDER BY doc_id""".stripMargin,
    "q70_pack" ->
      """WITH d AS (SELECT lang, doc_id,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS toks
        |  FROM documents),
        |o AS (SELECT lang, doc_id, toks,
        |    sum(toks) OVER (PARTITION BY lang
        |      ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 15), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT lang, CAST((cum - toks) // 512 AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS tok_sum
        |FROM o GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,
    // the incremental-merge gate: oracle is the FULL from-scratch rebuild
    "q71_scd2_merge" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events),
        |m AS (SELECT user_id, event_id, event_type, ts_sec,
        |  lag(event_type) OVER w AS prev,
        |  row_number() OVER w AS rn
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
        |v AS (SELECT user_id, event_type, ts_sec, event_id FROM m
        |  WHERE rn = 1 OR NOT (prev IS NOT DISTINCT FROM event_type))
        |SELECT user_id, event_type,
        |  ts_sec AS valid_from,
        |  lead(ts_sec) OVER w2 AS valid_to,
        |  lead(ts_sec) OVER w2 IS NULL AS is_current
        |FROM v WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
        |ORDER BY user_id, valid_from""".stripMargin,
    "q72_time_align" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |    CAST(floor("value" / 100) AS BIGINT) AS vband,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events),
        |mt AS (SELECT user_id, event_type, ts_sec, event_id,
        |    lag(event_type) OVER w AS prev, row_number() OVER w AS rn
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
        |vt AS (SELECT user_id, event_type, ts_sec, event_id FROM mt
        |  WHERE rn = 1 OR NOT (prev IS NOT DISTINCT FROM event_type)),
        |ht AS (SELECT user_id, event_type, ts_sec AS a_from,
        |    coalesce(lead(ts_sec) OVER w2, 9223372036854775807) AS a_to
        |  FROM vt WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
        |mb AS (SELECT user_id, vband, ts_sec, event_id,
        |    lag(vband) OVER w AS prev, row_number() OVER w AS rn
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
        |vb AS (SELECT user_id, vband, ts_sec, event_id FROM mb
        |  WHERE rn = 1 OR NOT (prev IS NOT DISTINCT FROM vband)),
        |hb AS (SELECT user_id, vband, ts_sec AS b_from,
        |    coalesce(lead(ts_sec) OVER w2, 9223372036854775807) AS b_to
        |  FROM vb WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
        |SELECT ht.user_id, event_type, vband,
        |  greatest(a_from, b_from) AS seg_from,
        |  NULLIF(least(a_to, b_to), 9223372036854775807) AS seg_to
        |FROM ht JOIN hb ON ht.user_id = hb.user_id
        |  AND a_from < b_to AND b_from < a_to
        |ORDER BY ht.user_id, seg_from""".stripMargin,
    "q73_fuzzy_match" ->
      """WITH base AS (SELECT c_custkey AS id, c_name AS name FROM customer),
        |var AS (SELECT id + 1000000 AS id,
        |    substr(name, 1, CAST(id % 6 AS INT)) || 'X' ||
        |    substr(name, CAST(id % 6 AS INT) + 2, 1000) AS name
        |  FROM base),
        |b AS (SELECT id, name, substr(name, length(name) - 5, 6) AS blk
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM var))
        |SELECT x.id AS id_a, y.id AS id_b,
        |  CAST(levenshtein(x.name, y.name) AS INT) AS dist
        |FROM b x JOIN b y ON x.blk = y.blk AND x.id < y.id
        |WHERE levenshtein(x.name, y.name) <= 2
        |ORDER BY id_a, id_b""".stripMargin,
    // trailing-24h 3-sigma breach, evaluated in pure integer arithmetic
    "q74_anomalies" ->
      """WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS slot FROM events),
        |c AS (SELECT event_type, slot, count(*) AS n FROM ev GROUP BY 1, 2),
        |b AS (SELECT event_type, min(slot) AS lo, max(slot) AS hi FROM ev GROUP BY 1),
        |spine AS (SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS slot FROM b),
        |g AS (SELECT s.event_type, s.slot, CAST(coalesce(c.n, 0) AS BIGINT) AS n
        |  FROM spine s LEFT JOIN c ON s.event_type = c.event_type AND s.slot = c.slot),
        |w AS (SELECT event_type, slot, n,
        |  CAST(count(n) OVER tw AS BIGINT) AS w_n,
        |  CAST(sum(n) OVER tw AS BIGINT) AS w_sum,
        |  CAST(sum(n * n) OVER tw AS BIGINT) AS w_sumsq
        |  FROM g WINDOW tw AS (PARTITION BY event_type ORDER BY slot
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, strftime(slot, '%Y-%m-%d %H:%M:%S') AS hr, n, w_sum, w_sumsq
        |FROM w
        |WHERE w_n = 24
        |  AND (w_n - 1) * (n * w_n - w_sum) * (n * w_n - w_sum)
        |      > 9 * w_n * (w_n * w_sumsq - w_sum * w_sum)
        |ORDER BY event_type, hr""".stripMargin,
    // targeted bucket repair must equal the FULL unrestricted diff
    "q75_reconcile_repair" ->
      """WITH a AS (SELECT o_orderkey, o_custkey, o_orderpriority FROM orders),
        |b AS (SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 1000 = 0 THEN '9-TAMPERED' ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders WHERE o_orderkey <> 7),
        |sel AS (SELECT a.o_orderkey,
        |    a.o_custkey c1, b.o_custkey c2,
        |    a.o_orderpriority r1, b.o_orderpriority r2
        |  FROM a JOIN b USING (o_orderkey))
        |SELECT * FROM (
        |  SELECT o_orderkey, 'o_custkey' AS column_name,
        |    CAST(c1 AS VARCHAR) AS before, CAST(c2 AS VARCHAR) AS after
        |  FROM sel WHERE NOT (c1 IS NOT DISTINCT FROM c2)
        |  UNION ALL
        |  SELECT o_orderkey, 'o_orderpriority', CAST(r1 AS VARCHAR), CAST(r2 AS VARCHAR)
        |  FROM sel WHERE NOT (r1 IS NOT DISTINCT FROM r2)
        |) ORDER BY o_orderkey, column_name""".stripMargin,
    // the full curation pipeline replayed end-to-end:
    // gate -> dedup -> cap -> split -> mixture
    "q76_curation_pipeline" ->
      """WITH docs AS (SELECT doc_id, text, lang, source FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text, lang, source FROM documents WHERE doc_id % 10 = 0),
        |t AS (SELECT doc_id,
        |  len(string_split_regex(trim(lower(text)), '\s+')) AS n_words,
        |  length(regexp_replace(text, '\s', '', 'g')) AS n_nonspace,
        |  len(regexp_extract_all(text, '#|\.\.\.|…')) AS n_sym,
        |  len(regexp_extract_all(' ' || lower(text), '\s[^\s]*[a-z]')) AS n_alpha_words,
        |  len(regexp_extract_all(lower(text), '\b(the|be|to|of|and|that|have|with)\b')) AS n_stop,
        |  len(regexp_extract_all(text, chr(10))) + 1 AS n_lines,
        |  len(regexp_extract_all(chr(10) || text, chr(10) || '[ ' || chr(9) || ']*[-*•]')) AS n_bullet,
        |  len(regexp_extract_all(text || chr(10), '(\.\.\.|…)[ ' || chr(9) || ']*' || chr(10))) AS n_ellipsis
        |  FROM docs),
        |g AS (SELECT doc_id FROM t WHERE
        |  (n_words BETWEEN 30 AND 100000)
        |  AND (n_nonspace / greatest(n_words, 1) BETWEEN 3.0 AND 10.0)
        |  AND n_sym / greatest(n_words, 1) < 0.1
        |  AND n_alpha_words / greatest(n_words, 1) >= 0.8
        |  AND n_stop >= 2
        |  AND n_bullet / n_lines < 0.9
        |  AND n_ellipsis / n_lines < 0.3),
        |gated AS (SELECT d.* FROM docs d JOIN g USING (doc_id)),
        |keep AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY text),
        |kept AS (SELECT g2.* FROM gated g2 JOIN keep USING (doc_id)),
        |capped AS (SELECT * FROM (
        |  SELECT k.*, row_number() OVER (PARTITION BY source
        |    ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 15), doc_id) AS rn
        |  FROM kept k) WHERE rn <= 20),
        |sp AS (SELECT *, CASE
        |    WHEN substring(md5(source), 1, 15) < 'c00000000000000' THEN 'train'
        |    WHEN substring(md5(source), 1, 15) < 'e00000000000000' THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM capped)
        |SELECT split, lang, count(*) AS n_docs,
        |  CAST(sum(len(string_split_regex(trim(lower(text)), '\s+'))) AS BIGINT) AS n_tokens
        |FROM sp GROUP BY split, lang ORDER BY split, lang""".stripMargin,
    // sub-document (C4-style) span dedup: 60-bit md5 span keys are
    // engine-portable, so DuckDB replays the exact chop/count/rewrite
    "q77_span_stats" ->
      """WITH docs AS (
        |  SELECT doc_id, CASE WHEN doc_id % 3 = 0
        |    THEN 'graft corpus boilerplate header alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu ' || text
        |    ELSE text END AS text
        |  FROM documents),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs),
        |sp AS (
        |  SELECT doc_id, unnest(list_transform(range(CAST(floor(len(w)/8) AS BIGINT)),
        |    i -> {'span_idx': i, 'h': substr(md5(array_to_string(w[i*8+1 : i*8+8], ' ')), 1, 15)})) AS s
        |  FROM toks),
        |spf AS (SELECT doc_id, s.span_idx AS span_idx, s.h AS h FROM sp),
        |freq AS (SELECT h, count(*) AS freq FROM spf GROUP BY h)
        |SELECT spf.doc_id AS doc_id, count(*) AS n_spans,
        |  CAST(sum(CASE WHEN freq > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
        |  CAST(sum(CASE WHEN freq > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_fraction
        |FROM spf JOIN freq USING (h)
        |GROUP BY spf.doc_id ORDER BY doc_id""".stripMargin,
    "q78_span_rewrite" ->
      """WITH docs AS (
        |  SELECT doc_id, CASE WHEN doc_id % 3 = 0
        |    THEN 'graft corpus boilerplate header alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu ' || text
        |    ELSE text END AS text
        |  FROM documents),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs),
        |sp AS (
        |  SELECT doc_id, unnest(list_transform(range(CAST(floor(len(w)/8) AS BIGINT)),
        |    i -> {'span_idx': i, 'span': array_to_string(w[i*8+1 : i*8+8], ' ')})) AS s
        |  FROM toks),
        |spf AS (SELECT doc_id, s.span_idx AS span_idx, s.span AS span,
        |        substr(md5(s.span), 1, 15) AS h FROM sp),
        |firsts AS (
        |  SELECT h, doc_id AS oid, span_idx AS oidx FROM (
        |    SELECT h, doc_id, span_idx,
        |           row_number() OVER (PARTITION BY h ORDER BY doc_id, span_idx) AS rn
        |    FROM spf) WHERE rn = 1),
        |kept AS (
        |  SELECT spf.doc_id AS doc_id, string_agg(span, ' ' ORDER BY span_idx) AS k
        |  FROM spf JOIN firsts ON spf.h = firsts.h AND spf.doc_id = firsts.oid AND spf.span_idx = firsts.oidx
        |  GROUP BY spf.doc_id),
        |tails AS (
        |  SELECT doc_id, array_to_string(w[CAST(floor(len(w)/8) AS BIGINT)*8+1 : len(w)], ' ') AS tail
        |  FROM toks)
        |SELECT d.doc_id AS doc_id,
        |  concat_ws(' ', nullif(kept.k, ''), nullif(tails.tail, '')) AS text
        |FROM docs d LEFT JOIN kept ON d.doc_id = kept.doc_id JOIN tails ON d.doc_id = tails.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // flatten replays as direct json_extract (the Spark side must round-trip
    // the payload losslessly); corrupted rows are known -> NULL inline
    "q79_json_flatten" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 100 = 0 THEN NULL
        |       ELSE CAST(json_extract(props, '$.k') AS BIGINT) END AS p_k,
        |  event_type AS j_et, value AS j_v
        |FROM events WHERE event_id % 20 = 0 ORDER BY event_id""".stripMargin,
    // 60-bit md5 prefix as integer (same list_reduce idiom as q54) mod 16
    "q80_shards" ->
      """SELECT
        |  list_reduce(list_transform(range(1, 16), i ->
        |    CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
        |    (acc, x) -> acc * 16 + x) % 16 AS shard,
        |  count(*) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS weight
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // sqrt(n_min/n_g) is an exact integer ratio under a correctly-rounded
    // sqrt -> per-group probabilities are bit-identical across engines
    "q81_temperature_mix" ->
      """WITH c AS (SELECT lang, count(*) AS ng FROM documents GROUP BY lang),
        |m AS (SELECT min(ng) AS nmin FROM c),
        |p AS (SELECT lang, ng, sqrt(CAST(nmin AS DOUBLE) / CAST(ng AS DOUBLE)) AS pr FROM c, m),
        |kept AS (
        |  SELECT d.lang FROM documents d JOIN p USING (lang)
        |  WHERE list_reduce(list_transform(range(1, 16), i ->
        |      CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
        |      (acc, x) -> acc * 16 + x) / 1152921504606846976.0 < pr)
        |SELECT p.lang AS lang, CAST(p.ng AS BIGINT) AS n_before, CAST(k.n AS BIGINT) AS n_after
        |FROM p JOIN (SELECT lang, count(*) AS n FROM kept GROUP BY lang) k USING (lang)
        |ORDER BY lang""".stripMargin,
    "q82_top_fraction" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |WHERE rn <= ceil(n * 0.25) ORDER BY doc_id""".stripMargin,
    // full-shortlist PQ == flat search: same oracle as q33's full-probe IVF
    "q83_knn_pq" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT query_id, id, list_cosine_similarity(v, qv) AS score FROM c, q WHERE id <> query_id),
        |r AS (SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM s)
        |SELECT query_id, rank, id AS neighbor_id FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    // embedding pipeline replayed: twin pairs via exact cosine, clusters
    // ARE the pairs (verified generally by q37/q57), canonical keeps the
    // lower id, then md5-mod-8 shard counts of the kept set
    "q84_embedding_pipeline" ->
      """WITH pairs AS (
        |  SELECT vec_id AS id_a, vec_id + 1000000 AS id_b FROM embeddings
        |  WHERE list_cosine_similarity(embedding::DOUBLE[],
        |    (CASE WHEN (vec_id + 1000000) % 2 = 0 THEN embedding
        |          ELSE list_transform(embedding, x -> -x) END)::DOUBLE[]) >= 0.99),
        |corpus AS (SELECT vec_id FROM embeddings
        |  UNION ALL SELECT vec_id + 1000000 FROM embeddings),
        |kept AS (SELECT vec_id FROM corpus
        |  WHERE vec_id NOT IN (SELECT id_b FROM pairs))
        |SELECT
        |  list_reduce(list_transform(range(1, 16), i ->
        |    CAST(strpos('0123456789abcdef', substring(md5(CAST(vec_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
        |    (acc, x) -> acc * 16 + x) % 8 AS shard,
        |  count(*) AS n_rows
        |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin,
    // q85/q86 probe every cell (and q86 opens the shortlist), so both must
    // reproduce flat search exactly — same brute-force oracle as q33/q83
    "q85_knn_ivf_prebuilt" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT query_id, id, list_cosine_similarity(v, qv) AS score FROM c, q WHERE id <> query_id),
        |r AS (SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM s)
        |SELECT query_id, rank, id AS neighbor_id FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "q86_knn_ivfpq" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT query_id, id, list_cosine_similarity(v, qv) AS score FROM c, q WHERE id <> query_id),
        |r AS (SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM s)
        |SELECT query_id, rank, id AS neighbor_id FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    // alpha = 3/8 ⇒ p = r^(5/8) = sqrt(r)·sqrt(sqrt(sqrt(r))) — the oracle
    // replays the pinned sqrt/multiply chain literally (bit-identical IEEE)
    "q87_temperature_dyadic" ->
      """WITH c AS (SELECT lang, count(*) AS ng FROM documents GROUP BY lang),
        |m AS (SELECT min(ng) AS nmin FROM c),
        |p AS (SELECT lang, ng,
        |  sqrt(CAST(nmin AS DOUBLE) / CAST(ng AS DOUBLE)) *
        |  sqrt(sqrt(sqrt(CAST(nmin AS DOUBLE) / CAST(ng AS DOUBLE)))) AS pr FROM c, m),
        |kept AS (
        |  SELECT d.lang FROM documents d JOIN p USING (lang)
        |  WHERE list_reduce(list_transform(range(1, 16), i ->
        |      CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
        |      (acc, x) -> acc * 16 + x) / 1152921504606846976.0 < pr)
        |SELECT p.lang AS lang, CAST(p.ng AS BIGINT) AS n_before, CAST(k.n AS BIGINT) AS n_after
        |FROM p JOIN (SELECT lang, count(*) AS n FROM kept GROUP BY lang) k USING (lang)
        |ORDER BY lang""".stripMargin,
    // the oracle reads the SAME trained-vocab token-count fixture parquet
    // the query packed (path spliced by Verify) and replays the packing
    // arithmetic — training/greedy merging stay spec-gated upstream of the
    // materialized counts, packing is hash-gated downstream of them
    "q88_pack_bpe" ->
      """WITH d AS (SELECT lang, doc_id, toks
        |    FROM read_parquet('__GRAFT_FIXTURE:bpe_counts__/*.parquet')),
        |o AS (SELECT lang, doc_id, toks,
        |    sum(toks) OVER (PARTITION BY lang
        |      ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 15), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT lang, CAST((cum - toks) // 1024 AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS tok_sum
        |FROM o GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,
    // chunk geometry replayed from the same single-space split: n<=64 -> 1
    // chunk, else ceil((n-64)/48)+1, windows of 64 every 48, md5 the text
    "q89_sliding_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE text IS NOT NULL),
        |n AS (SELECT doc_id, w,
        |  CASE WHEN len(w) <= 64 THEN 1 ELSE CAST((len(w) - 64 + 47) // 48 AS BIGINT) + 1 END AS nc
        |  FROM t),
        |c AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |  array_to_string(w[(i*48 + 1):(i*48 + 64)], ' ') AS chunk
        |  FROM n, LATERAL (SELECT unnest(range(0, nc)) AS i) r)
        |SELECT doc_id, chunk_idx,
        |  CAST(len(string_split(chunk, ' ')) AS INT) AS n_chunk_tokens,
        |  md5(chunk) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    // the oracle aggregates the ORIGINAL parquet — the Spark side must
    // survive parquet -> CSV -> explicit-schema read bit-exactly to match
    "q90_csv_roundtrip" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_ship,
        |  CAST(0 AS BIGINT) AS n_corrupt
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q91_jsonl_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
        |  CAST(0 AS BIGINT) AS n_corrupt
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // bigram-LM signals replayed: train unigram/bigram counts (minCount 2)
    // on doc_id % 10 < 8, score the held-out rest — all-integer outputs
    "q92_lm_score" ->
      """WITH tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
        |ref AS (SELECT * FROM tok WHERE doc_id % 10 < 8),
        |scored AS (SELECT * FROM tok WHERE doc_id % 10 >= 8),
        |uni AS (SELECT u.tok AS token, count(*) AS cnt
        |  FROM ref, unnest(w) AS u(tok) GROUP BY 1 HAVING count(*) >= 2),
        |rbi AS (SELECT w[i] AS w1, w[i+1] AS w2, count(*) AS cnt
        |  FROM ref, LATERAL (SELECT unnest(range(1, len(w))) AS i) r
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |su AS (SELECT doc_id, u.tok AS token FROM scored, unnest(w) AS u(tok)),
        |sustats AS (SELECT doc_id, count(*) AS n_tokens,
        |  sum(CASE WHEN uni.token IS NULL THEN 1 ELSE 0 END) AS n_oov
        |  FROM su LEFT JOIN uni ON su.token = uni.token GROUP BY doc_id),
        |sb AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        |  FROM scored, LATERAL (SELECT unnest(range(1, len(w))) AS i) r),
        |sbstats AS (SELECT doc_id, count(*) AS n_bigrams,
        |  sum(CASE WHEN rbi.w1 IS NULL THEN 0 ELSE 1 END) AS n_bigram_hits
        |  FROM sb LEFT JOIN rbi ON sb.w1 = rbi.w1 AND sb.w2 = rbi.w2 GROUP BY doc_id)
        |SELECT s.doc_id AS doc_id,
        |  CAST(s.n_tokens AS BIGINT) AS n_tokens,
        |  CAST(s.n_oov AS BIGINT) AS n_oov,
        |  CAST(coalesce(b.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  CAST(coalesce(b.n_bigram_hits, 0) AS BIGINT) AS n_bigram_hits
        |FROM sustats s LEFT JOIN sbstats b ON s.doc_id = b.doc_id
        |ORDER BY doc_id""".stripMargin,
    // incremental-equals-rebuild: the oracle closes over old AND new edges
    // from scratch (same recursive CTE as q37)
    "q93_cc_incremental" -> CcIncrementalOracleSql,
    // exact floor arithmetic replayed: target = (budget*w)//sumw,
    // epochs = target//tokens, remainder = target % tokens
    "q94_epoch_plan" ->
      """WITH d AS (SELECT doc_id, lang,
        |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS toks FROM documents),
        |g AS (SELECT lang, count(*) AS n_docs, sum(toks) AS tokens FROM d GROUP BY lang),
        |w(lang, weight) AS (VALUES ('en', 1), ('de', 3), ('es', 2), ('fr', 4), ('zh', 2)),
        |sw AS (SELECT sum(weight) AS sumw FROM w)
        |SELECT g.lang AS lang, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(tokens AS BIGINT) AS tokens, CAST(weight AS BIGINT) AS weight,
        |  CAST((2000000 * weight) // sumw AS BIGINT) AS target_tokens,
        |  CAST(CASE WHEN tokens > 0 THEN ((2000000 * weight) // sumw) // tokens ELSE 0 END AS BIGINT) AS full_epochs,
        |  CAST(CASE WHEN tokens > 0 THEN ((2000000 * weight) // sumw) % tokens ELSE 0 END AS BIGINT) AS remainder_tokens
        |FROM g JOIN w ON g.lang = w.lang CROSS JOIN sw ORDER BY lang""".stripMargin,
    // partial-epoch membership = shared md5 uniform vs remainder/tokens,
    // both sides replay the identical double divisions
    "q95_epoch_expand" ->
      """WITH d AS (SELECT doc_id, lang,
        |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS toks FROM documents),
        |g AS (SELECT lang, count(*) AS n_docs, sum(toks) AS tokens FROM d GROUP BY lang),
        |w(lang, weight) AS (VALUES ('en', 1), ('de', 3), ('es', 2), ('fr', 4), ('zh', 2)),
        |sw AS (SELECT sum(weight) AS sumw FROM w),
        |p AS (SELECT g.lang, CAST(tokens AS BIGINT) AS tokens,
        |  CAST(CASE WHEN tokens > 0 THEN ((2000000 * weight) // sumw) // tokens ELSE 0 END AS BIGINT) AS full_epochs,
        |  CAST(CASE WHEN tokens > 0 THEN ((2000000 * weight) // sumw) % tokens ELSE 0 END AS BIGINT) AS remainder_tokens
        |  FROM g JOIN w ON g.lang = w.lang CROSS JOIN sw),
        |m AS (SELECT d.doc_id, d.lang, d.toks, p.full_epochs +
        |  (CASE WHEN list_reduce(list_transform(range(1, 16), i ->
        |      CAST(strpos('0123456789abcdef', substring(md5(CAST(d.doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
        |      (acc, x) -> acc * 16 + x) / 1152921504606846976.0 <
        |    CAST(p.remainder_tokens AS DOUBLE) / CAST(p.tokens AS DOUBLE)
        |    THEN 1 ELSE 0 END) AS n_epochs
        |  FROM d JOIN p ON d.lang = p.lang),
        |e AS (SELECT doc_id, lang, toks, CAST(i AS INT) AS epoch
        |  FROM m, LATERAL (SELECT unnest(range(1, n_epochs + 1)) AS i) r)
        |SELECT lang, epoch, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS epoch_tokens
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // full probe + full shortlist through the PREBUILT roundtripped
    // codes: must equal flat search, same oracle as q86
    "q96_knn_ivfpq_prebuilt" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT query_id, id, list_cosine_similarity(v, qv) AS score FROM c, q WHERE id <> query_id),
        |r AS (SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM s)
        |SELECT query_id, rank, id AS neighbor_id FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    // incremental fold against the PREBUILT roundtripped base assignment
    // must STILL equal the from-scratch rebuild — same oracle as q93
    "q97_cc_incremental_prebuilt" -> CcIncrementalOracleSql,
    "q98_bm25" -> Bm25OracleSql,
    // prebuilt inverted-index probe must equal the scan path bit-for-bit
    // — same oracle as q98 (the q33/q85 pattern applied to lexical search)
    "q99_bm25_prebuilt" -> Bm25OracleSql,
    // replays BOTH retrievers (BM25 CTEs + q25's cosine shape for query
    // vec 0) and the fixed-order RRF arithmetic: integer ranks through
    // 1.0/(60+rank) and a two-term add are bit-reproducible cross-engine
    "q100_hybrid_rrf" ->
      s"""WITH $Bm25Ctes,
        |lexr AS (SELECT doc_id, rank FROM (
        |  SELECT doc_id, row_number() OVER (ORDER BY CAST(score AS DECIMAL(18,6)) DESC, doc_id) AS rank
        |  FROM sc WHERE CAST(score AS DECIMAL(18,6)) > 0) WHERE rank <= 100),
        |qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |c AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        |ds AS (SELECT id, list_cosine_similarity(v, qv) AS score FROM c, qv WHERE id <> 0),
        |denr AS (SELECT id AS doc_id, rank FROM (
        |  SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank FROM ds) WHERE rank <= 100),
        |f AS (SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
        |    coalesce(1.0 / (60 + l.rank), 0.0) + coalesce(1.0 / (60 + d.rank), 0.0) AS rrf
        |  FROM lexr l FULL OUTER JOIN denr d ON l.doc_id = d.doc_id),
        |rk AS (SELECT row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank, doc_id,
        |    CAST(CAST(rrf AS DECIMAL(18,9)) AS DOUBLE) AS rrf_score FROM f)
        |SELECT rank, doc_id, rrf_score FROM rk WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // HLL registers replayed nibble-for-nibble: 60-bit md5 hash, p=8
    // buckets, rank = 53 - highest-bit(remainder), harmonic denominator
    // as an exact BIGINT sum of powers of two, ONE pinned division for
    // the estimate (IEEE-exact on both engines). sum(BIGINT) is HUGEINT
    // in DuckDB -> cast back before output/division.
    "q128_hll_distinct" ->
      """WITH h AS (SELECT event_type,
        |    list_reduce(list_transform(range(1, 16), i ->
        |      CAST(strpos('0123456789abcdef', substring(md5(CAST(user_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, hv & 255 AS bucket,
        |    CASE WHEN (hv >> 8) = 0 THEN 53
        |         ELSE 53 - length(bin(hv >> 8)) END AS rank
        |  FROM h),
        |regs AS (SELECT event_type, bucket, max(rank) AS r FROM r GROUP BY 1, 2),
        |agg AS (SELECT event_type, count(*) AS present,
        |    CAST(sum(CAST(1 AS BIGINT) << (53 - r)) AS BIGINT) AS dpresent
        |  FROM regs GROUP BY 1),
        |ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact
        |  FROM events GROUP BY 1)
        |SELECT a.event_type, CAST(256 AS BIGINT) AS m,
        |  CAST(256 - present AS BIGINT) AS v0,
        |  dpresent + (256 - present) * (CAST(1 AS BIGINT) << 53) AS dhll,
        |  4.2399330249068963e+20 /
        |    CAST(dpresent + (256 - present) * (CAST(1 AS BIGINT) << 53) AS DOUBLE) AS est,
        |  exact
        |FROM agg a JOIN ex USING (event_type) ORDER BY event_type""".stripMargin,
    // Count-Min counters replayed cell-for-cell: depth-4 salted md5
    // bucket hashes ("j:token", first 2 nibbles), counter = sum of the
    // cell's token counts, estimate = min over the 4 rows — one-sided,
    // est >= exact by construction for every probed token
    "q129_cms_top_tokens" ->
      """WITH toks AS (SELECT u.tok AS token
        |  FROM documents, unnest(string_split_regex(trim(lower(text)), '\s+')) AS u(tok)
        |  WHERE u.tok <> ''),
        |cnt AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
        |cells AS (SELECT j.j AS j, token, c,
        |    CAST(strpos('0123456789abcdef', substring(md5(j.j || ':' || token), 1, 1)) - 1 AS BIGINT) * 16 +
        |    CAST(strpos('0123456789abcdef', substring(md5(j.j || ':' || token), 2, 1)) - 1 AS BIGINT) AS bucket
        |  FROM cnt, range(4) j(j)),
        |counters AS (SELECT j, bucket, CAST(sum(c) AS BIGINT) AS cc
        |  FROM cells GROUP BY 1, 2),
        |top AS (SELECT token, CAST(c AS BIGINT) AS exact FROM cnt
        |  ORDER BY c DESC, token LIMIT 20),
        |probe AS (SELECT t.token, t.exact, min(co.cc) AS est
        |  FROM top t JOIN cells pc ON pc.token = t.token
        |  JOIN counters co ON co.j = pc.j AND co.bucket = pc.bucket
        |  GROUP BY t.token, t.exact)
        |SELECT token, exact, est FROM probe ORDER BY exact DESC, token""".stripMargin,
    // ORC round-trip: the oracle aggregates the parquet directly — a
    // hash match proves the ORC writer/reader preserved every value
    "q130_orc_roundtrip" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_rows,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Salted join vs the plain SQL join — salting must be invisible in
    // the result
    "q131_salted_join" ->
      """SELECT c_mktsegment, o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
        |FROM orders JOIN customer ON c_custkey = o_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Integer PageRank, all 5 iterations unrolled: damping 85/100,
    // scale 10^6, base = 150000, truncating division (all operands
    // non-negative so trunc == floor on both engines), dangling nodes
    // keep the base share. sum() is HUGEINT in DuckDB -> cast per iter.
    "q132_pagerank" -> {
      val head =
        """WITH e0 AS (SELECT DISTINCT CAST(-l_suppkey - 1 AS BIGINT) AS src,
          |    CAST(l_partkey AS BIGINT) AS dst FROM lineitem),
          |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
          |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
          |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          |it0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n)""".stripMargin
      val iters = (1 to 5).map { i =>
        s"""c$i AS (SELECT e.dst AS node, CAST(sum((p.r * 85) // (100 * deg.d)) AS BIGINT) AS s
           |  FROM e JOIN it${i - 1} p ON p.node = e.src JOIN deg ON deg.src = e.src
           |  GROUP BY e.dst),
           |it$i AS (SELECT n.node, 150000 + coalesce(c$i.s, 0) AS r
           |  FROM n LEFT JOIN c$i ON c$i.node = n.node)""".stripMargin
      }.mkString(",\n", ",\n", "")
      head + iters + "\nSELECT node, CAST(r AS BIGINT) AS r FROM it5 ORDER BY node"
    },
    // Containment dedup vs the ALL-PAIRS oracle: fragment docs (first
    // 60% of tokens of every 10th doc) are contained in their source —
    // jaccard-blind pairs; any prefix-filter blocking recall miss makes
    // the hash differ. Containments are single int divisions.
    "q133_containment" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |toks0 AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM base),
        |frags AS (SELECT doc_id + 2000000 AS doc_id,
        |    array_to_string(w[1:CAST(floor(len(w) * 0.6) AS INT)], ' ') AS text
        |  FROM toks0 WHERE doc_id % 10 = 0),
        |docs AS (SELECT doc_id, text FROM base UNION ALL SELECT doc_id, text FROM frags),
        |toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM docs),
        |grams AS (SELECT doc_id,
        |  list_distinct(CASE WHEN len(w) >= 3
        |    THEN list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        |    ELSE [] END) AS g
        |  FROM toks),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    len(list_intersect(a.g, b.g)) AS ni, len(a.g) AS na, len(b.g) AS nb
        |  FROM grams a JOIN grams b ON a.doc_id < b.doc_id
        |  WHERE len(a.g) > 0 AND len(b.g) > 0)
        |SELECT id_a, id_b, ni / na AS c_a_in_b, ni / nb AS c_b_in_a,
        |  greatest(ni / na, ni / nb) AS containment
        |FROM p WHERE greatest(ni / na, ni / nb) >= 0.9 ORDER BY id_a, id_b""".stripMargin,
    // ChatML render + assistant loss-mask spans reconstructed
    // independently: piece length = 12 (<|im_start|>) + len(role) + 1
    // (\n) + len(content) + 11 (<|im_end|>\n); span start = prefix
    // pieces + the turn's own header; all integer arithmetic
    "q134_chat_template" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(coalesce(text, ''))), '\s+') AS w FROM documents),
        |c AS (SELECT doc_id,
        |    'you are a helpful assistant' AS sys,
        |    coalesce(array_to_string(w[1:10], ' '), '') AS u1,
        |    coalesce(array_to_string(w[11:20], ' '), '') AS a1,
        |    coalesce(array_to_string(w[21:25], ' '), '') AS u2,
        |    coalesce(array_to_string(w[26:30], ' '), '') AS a2
        |  FROM t),
        |r AS (SELECT doc_id,
        |    '<|im_start|>system' || chr(10) || sys || '<|im_end|>' || chr(10) ||
        |    '<|im_start|>user' || chr(10) || u1 || '<|im_end|>' || chr(10) ||
        |    '<|im_start|>assistant' || chr(10) || a1 || '<|im_end|>' || chr(10) ||
        |    '<|im_start|>user' || chr(10) || u2 || '<|im_end|>' || chr(10) ||
        |    '<|im_start|>assistant' || chr(10) || a2 || '<|im_end|>' || chr(10) AS text,
        |    12 + 6 + 1 + length(sys) + 11 AS p1,
        |    12 + 4 + 1 + length(u1) + 11 AS p2,
        |    12 + 9 + 1 + length(a1) + 11 AS p3,
        |    12 + 4 + 1 + length(u2) + 11 AS p4,
        |    length(a1) AS la1, length(a2) AS la2
        |  FROM c),
        |sp AS (SELECT doc_id, text,
        |    CAST(p1 + p2 + 22 AS BIGINT) AS s1,
        |    CAST(p1 + p2 + 22 + la1 AS BIGINT) AS e1,
        |    CAST(p1 + p2 + p3 + p4 + 22 AS BIGINT) AS s2,
        |    CAST(p1 + p2 + p3 + p4 + 22 + la2 AS BIGINT) AS e2
        |  FROM r)
        |SELECT doc_id, md5(text) AS text_md5,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  s1 || ':' || e1 || ',' || s2 || ':' || e2 AS spans
        |FROM sp ORDER BY doc_id""".stripMargin,
    // triangle counting replayed: canonical (a<b) STRING-ordered edges
    // (both engines compare UTF8 lexicographically), wedge join on the
    // middle node, closure against the edge set, per-node fold
    "q135_triangles" ->
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
        |sup AS (SELECT x.l_partkey AS pa, y.l_partkey AS pb
        |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
        |  WHERE x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e0 AS (SELECT DISTINCT
        |    least(CAST(pa AS VARCHAR), CAST(pb AS VARCHAR)) AS a,
        |    greatest(CAST(pa AS VARCHAR), CAST(pb AS VARCHAR)) AS b
        |  FROM sup),
        |w AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
        |  FROM e0 e1 JOIN e0 e2 ON e1.b = e2.a),
        |tri AS (SELECT w.a, w.b, w.c FROM w JOIN e0 ON e0.a = w.a AND e0.b = w.c),
        |n AS (SELECT u.node AS node FROM tri, unnest([a, b, c]) AS u(node))
        |SELECT CAST(node AS BIGINT) AS node, count(*) AS n_triangles
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin,
    // Funnel greedy match re-derived via stepwise packed-code minimums:
    // code = ts_sec * 2^20 + event_id gives the fold's (ts, id) total
    // order as ONE integer; step i+1's code is the min qualifying code
    // strictly after step i's, within 7 days (second precision) of
    // step 1. Different formulation than the engine's sorted fold —
    // deliberate cross-check.
    // NOTE: `code` packs the (ts_sec, event_id) total order as
    // ts_sec * 2^20 + event_id, which preserves ordering parity with
    // the engine's exact struct sort ONLY while event_id < 2^20
    // (~1.05M); the asserted CTE fails the oracle loudly if the fixture
    // ever outgrows that. (ts_sec * 2^20 stays < 2^60 for the engine's
    // own 2^40 ts budget, so the product can't overflow BIGINT.)
    "q136_funnel" ->
      """WITH guard AS (SELECT CASE WHEN max(event_id) >= 1048576
        |      THEN error('q136 oracle: event_id >= 2^20 breaks packed-code ordering')
        |      ELSE 1 END AS ok FROM events),
        |ev AS (SELECT user_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) * 1048576 + event_id AS code,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        |s1 AS (SELECT user_id, min(code) AS c1 FROM ev WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(code) AS c2
        |  FROM ev e JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.code > s1.c1
        |    AND e.ts_sec - (s1.c1 // 1048576) <= 604800
        |  GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(code) AS c3
        |  FROM ev e JOIN s2 ON s2.user_id = e.user_id
        |  JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.code > s2.c2
        |    AND e.ts_sec - (s1.c1 // 1048576) <= 604800
        |  GROUP BY 1),
        |counts AS (
        |  SELECT 1 AS step_idx, 'view' AS step_name, count(*) AS n_users FROM s1
        |  UNION ALL SELECT 2, 'click', count(*) FROM s2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
        |SELECT step_idx, step_name, CAST(n_users AS BIGINT) AS n_users
        |FROM counts, guard WHERE guard.ok = 1 ORDER BY step_idx""".stripMargin,
    // weekly cohort retention: cohort = week of first event, offsets in
    // whole weeks — both engines truncate weeks to Monday
    "q137_retention" ->
      """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cw FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events),
        |j AS (SELECT a.user_id, strftime(f.cw, '%Y-%m-%d') AS cohort_week,
        |    CAST(date_diff('day', CAST(f.cw AS DATE), CAST(a.aw AS DATE)) // 7 AS BIGINT) AS week_offset
        |  FROM a JOIN f USING (user_id))
        |SELECT cohort_week, week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // first-order transition matrix: per-user lag in (ts_sec, event_id)
    // order; p = one division of exact longs
    "q138_transitions" ->
      """WITH ev AS (SELECT user_id, event_type, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events),
        |pr AS (SELECT user_id, event_type AS to_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS from_type
        |  FROM ev),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM pr
        |  WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
        |  CAST(n AS BIGINT) / CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    // 12 unrolled peel rounds of the 3-core: each round recomputes
    // degrees among survivors and drops nodes under 3; final degrees
    // over the surviving set
    "q139_kcore" -> {
      val head =
        """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
          |sup AS (SELECT x.l_partkey AS pa, y.l_partkey AS pb
          |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
          |  WHERE x.l_partkey < y.l_partkey
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |sym AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM sup UNION SELECT pb, pa FROM sup),
          |n0 AS (SELECT DISTINCT src AS n FROM sym)""".stripMargin
      // every round CTE is MATERIALIZED: each d_i references n_{i-1}
      // TWICE, so inlining (DuckDB's default) would expand the chain
      // 2^12-fold — the oracle-side twin of the engine-side
      // lineage-doubling trap this operator's loop checkpoints against
      val rounds = (1 to 12).map { i =>
        s"""d$i AS MATERIALIZED (SELECT s.src AS n, count(*) AS d FROM sym s
           |  JOIN n${i - 1} x ON s.src = x.n JOIN n${i - 1} y ON s.dst = y.n
           |  GROUP BY 1),
           |n$i AS MATERIALIZED (SELECT n FROM d$i WHERE d >= 3)""".stripMargin
      }.mkString(",\n", ",\n", "")
      head + rounds + """,
        |fin AS (SELECT s.src AS n, count(*) AS d FROM sym s
        |  JOIN n12 x ON s.src = x.n JOIN n12 y ON s.dst = y.n GROUP BY 1)
        |SELECT CAST(f.n AS BIGINT) AS node, CAST(f.d AS BIGINT) AS core_degree
        |FROM fin f JOIN n12 z ON f.n = z.n ORDER BY node""".stripMargin
    },
    // nearest as-of: BOTH DuckDB ASOF directions + the choice rule
    // (smaller |Δ| wins, tie -> backward, 1h tolerance each side)
    "q140_asof_nearest" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, event_type, value FROM events),
        |l AS (SELECT event_id, user_id, ts_sec FROM ev),
        |r AS (SELECT user_id, ts_sec, max(value) AS profile_value FROM ev WHERE event_type = 'signup' GROUP BY user_id, ts_sec),
        |b AS (SELECT l.event_id, r.ts_sec AS bts, r.profile_value AS bval
        |  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_sec >= r.ts_sec),
        |f AS (SELECT l.event_id, r.ts_sec AS fts, r.profile_value AS fval
        |  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_sec <= r.ts_sec),
        |j AS (SELECT l.event_id, l.user_id, l.ts_sec, b.bts, b.bval, f.fts, f.fval,
        |    (b.bts IS NOT NULL AND l.ts_sec - b.bts <= 3600) AS bvalid,
        |    (f.fts IS NOT NULL AND f.fts - l.ts_sec <= 3600) AS fvalid
        |  FROM l JOIN b USING (event_id) JOIN f USING (event_id))
        |SELECT event_id, user_id, ts_sec,
        |  CASE WHEN bvalid AND (NOT fvalid OR ts_sec - bts <= fts - ts_sec) THEN bval
        |       WHEN fvalid THEN fval END AS profile_value
        |FROM j ORDER BY event_id""".stripMargin,
    // hopping windows expanded arithmetically: epoch//900 grid minus
    // j*900, j in 0..3 — every event in its 4 overlapping windows;
    // make_timestamp keeps the window start naive (UTC-agnostic)
    "q141_hopping_rollup" ->
      """WITH ev AS (SELECT event_type, value,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events),
        |w AS (SELECT event_type, value,
        |    (ts_sec // 900) * 900 - j.j * 900 AS ws FROM ev, range(4) j(j))
        |SELECT strftime(make_timestamp(ws * 1000000), '%Y-%m-%d %H:%M:%S') AS w_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // sentence segmentation: decorated text re-derived independently
    // (1-based list_transform mirrors the 0-based engine indexes), then
    // the boundary rule replayed — mark runs of .!? + whitespace with a
    // US separator (regexp_replace needs the 'g' flag in DuckDB), split,
    // trim, drop empties; seg_md5 gates exact boundaries
    "q142_sentences" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(coalesce(text, ''))), '\s+') AS w FROM documents),
        |dec AS (SELECT doc_id, list_reduce(
        |    list_prepend('', list_transform(range(1, len(w) + 1), i -> w[i] ||
        |      CASE WHEN (i - 1) % 11 = 10 THEN '!?' || chr(10)
        |           WHEN (i - 1) % 7 = 6 THEN '.  '
        |           ELSE ' ' END)),
        |    (a, x) -> a || x) AS text
        |  FROM t),
        |seg AS (SELECT doc_id,
        |    list_filter(list_transform(
        |      string_split(regexp_replace(text, '([.!?]+)[ ' || chr(9) || chr(13) || chr(10) || ']+', '\1' || chr(31), 'g'), chr(31)),
        |      s -> trim(s)), s -> s <> '') AS ss
        |  FROM dec)
        |SELECT doc_id,
        |  CAST(len(ss) AS BIGINT) AS n_sentences,
        |  CAST(coalesce(list_sum(list_transform(ss, s -> length(s))), 0) AS BIGINT) AS sentence_chars,
        |  md5(array_to_string(ss, chr(31))) AS seg_md5
        |FROM seg ORDER BY doc_id""".stripMargin,
    // retrieval eval: BOTH retrievers replayed (the q26 LSH bucketing
    // and the q25 brute-force truth), then the metric joins — integer
    // hits/ranks only; queries with empty result lists keep their row
    "q143_retrieval_eval" -> {
      val planeRows = graft.similarity.Knn.hyperplanes(8, 64, 7L).zipWithIndex
        .map { case (p, j) => s"($j, [${p.mkString(", ")}]::DOUBLE[])" }
        .mkString(",\n  ")
      s"""WITH planes(j, pl) AS (VALUES
         |  $planeRows),
         |v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |vb AS (SELECT id, CAST(sum(CASE WHEN list_dot_product(v.v, p.pl) >= 0
         |    THEN (CAST(1 AS BIGINT) << p.j) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM v, planes p GROUP BY id),
         |vv AS (SELECT v.id, v.v, vb.bucket FROM v JOIN vb USING (id)),
         |q AS (SELECT id AS query_id, v AS qv, bucket FROM vv WHERE id < 10),
         |ls AS (SELECT q.query_id, c.id, list_cosine_similarity(c.v, q.qv) AS score
         |  FROM vv c JOIN q ON c.bucket = q.bucket AND c.id <> q.query_id),
         |lr AS (SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM ls),
         |bs AS (SELECT q.query_id, c.id, list_cosine_similarity(c.v, q.qv) AS score
         |  FROM vv c, q WHERE c.id <> q.query_id),
         |tr AS (SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM bs),
         |res AS (SELECT query_id, id AS neighbor_id, rank FROM lr WHERE rank <= 5),
         |tru AS (SELECT query_id, id AS neighbor_id FROM tr WHERE rank <= 5),
         |j AS (SELECT res.query_id, res.rank,
         |    CASE WHEN tru.neighbor_id IS NOT NULL THEN 1 END AS hit
         |  FROM res LEFT JOIN tru ON res.query_id = tru.query_id AND res.neighbor_id = tru.neighbor_id),
         |pq AS (SELECT query_id, count(*) AS n_results,
         |    CAST(sum(coalesce(hit, 0)) AS BIGINT) AS hits_at_k,
         |    CAST(min(CASE WHEN hit = 1 THEN rank END) AS BIGINT) AS first_hit_rank
         |  FROM j GROUP BY 1),
         |tc AS (SELECT query_id, count(*) AS n_truth FROM tru GROUP BY 1)
         |SELECT coalesce(tc.query_id, pq.query_id) AS query_id,
         |  CAST(coalesce(pq.n_results, 0) AS BIGINT) AS n_results,
         |  CAST(coalesce(tc.n_truth, 0) AS BIGINT) AS n_truth,
         |  CAST(coalesce(pq.hits_at_k, 0) AS BIGINT) AS hits_at_k,
         |  pq.first_hit_rank
         |FROM tc FULL OUTER JOIN pq ON tc.query_id = pq.query_id
         |ORDER BY 1""".stripMargin
    },
    // classifier confusion counts: the q125 refit + margin replay with
    // a confusion-aggregation tail over the labeled subset
    "q144_classifier_eval" ->
      s"""WITH $QualityRefitCtes
        |SELECT
        |  CAST(sum(CASE WHEN margin >= 0 AND label THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |  CAST(sum(CASE WHEN margin >= 0 AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |  CAST(sum(CASE WHEN margin < 0 AND label THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |  CAST(sum(CASE WHEN margin < 0 AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM sig JOIN lab USING (doc_id)""".stripMargin,
    // sample-trained BPE token streams: greedy merging is spec-gated
    // (iterative training can't be replayed in SQL); the oracle replays
    // everything downstream of the materialized stream fixture — the
    // q88/q104 replayability-line pattern
    "q145_bpe_sampled" ->
      """SELECT doc_id, lang,
        |  CAST(len(toks) AS BIGINT) AS n_toks,
        |  CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT) AS n_chars,
        |  toks[1] AS first_token,
        |  toks[-1] AS last_token
        |FROM read_parquet('__GRAFT_FIXTURE:bpe_sampled_tokens__/*.parquet')
        |ORDER BY doc_id""".stripMargin,
    // sentence-aligned chunking: q142's decoration + segmentation CTEs,
    // then the greedy ≤5-token fill replayed as a RECURSIVE CTE carrying
    // (last_chunk, cur_tokens) running state per doc — a different
    // derivation than the engine's array fold; oversized sentences
    // expand into budget-sized window pieces via a lateral range unnest
    "q146_sentence_chunks" ->
      """WITH RECURSIVE t AS (SELECT doc_id, string_split_regex(trim(lower(coalesce(text, ''))), '\s+') AS w FROM documents),
        |dec AS (SELECT doc_id, list_reduce(
        |    list_prepend('', list_transform(range(1, len(w) + 1), i -> w[i] ||
        |      CASE WHEN (i - 1) % 11 = 10 THEN '!?' || chr(10)
        |           WHEN (i - 1) % 7 = 6 THEN '.  '
        |           ELSE ' ' END)),
        |    (a, x) -> a || x) AS text
        |  FROM t),
        |seg AS (SELECT doc_id,
        |    list_filter(list_transform(
        |      string_split(regexp_replace(text, '([.!?]+)[ ' || chr(9) || chr(13) || chr(10) || ']+', '\1' || chr(31), 'g'), chr(31)),
        |      s -> trim(s)), s -> s <> '') AS ss
        |  FROM dec),
        |sent AS (SELECT doc_id, u.i AS i, ss[u.i] AS s,
        |    CAST(len(string_split(ss[u.i], ' ')) AS BIGINT) AS t
        |  FROM seg, unnest(range(1, len(ss) + 1)) AS u(i)),
        |fill AS (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS i, CAST(-1 AS BIGINT) AS last_chunk,
        |      CAST(-1 AS BIGINT) AS cur, CAST(NULL AS BIGINT) AS sent_chunk,
        |      FALSE AS oversized, CAST(0 AS BIGINT) AS t
        |    FROM seg WHERE len(ss) > 0
        |  UNION ALL
        |  SELECT f.doc_id, f.i + 1,
        |    CASE WHEN s.t > 5 THEN f.last_chunk + ((s.t + 4) // 5)
        |         WHEN f.cur >= 0 AND f.cur + s.t <= 5 THEN f.last_chunk
        |         ELSE f.last_chunk + 1 END,
        |    CASE WHEN s.t > 5 THEN CAST(-1 AS BIGINT)
        |         WHEN f.cur >= 0 AND f.cur + s.t <= 5 THEN f.cur + s.t
        |         ELSE s.t END,
        |    CASE WHEN s.t <= 5 AND f.cur >= 0 AND f.cur + s.t <= 5 THEN f.last_chunk
        |         ELSE f.last_chunk + 1 END,
        |    s.t > 5,
        |    s.t
        |  FROM fill f JOIN sent s ON s.doc_id = f.doc_id AND s.i = f.i + 1),
        |norm AS (
        |  SELECT f.doc_id, f.sent_chunk AS chunk_idx,
        |    string_agg(s.s, ' ' ORDER BY f.i) AS chunk,
        |    count(*) AS n_sentences, CAST(sum(s.t) AS BIGINT) AS n_tokens
        |  FROM fill f JOIN sent s ON s.doc_id = f.doc_id AND s.i = f.i
        |  WHERE f.i >= 1 AND NOT f.oversized
        |  GROUP BY 1, 2),
        |ov AS (
        |  SELECT f.doc_id, f.sent_chunk + p.j AS chunk_idx,
        |    array_to_string(list_slice(string_split(s.s, ' '), p.j * 5 + 1, p.j * 5 + 5), ' ') AS chunk,
        |    CAST(1 AS BIGINT) AS n_sentences,
        |    CAST(len(list_slice(string_split(s.s, ' '), p.j * 5 + 1, p.j * 5 + 5)) AS BIGINT) AS n_tokens
        |  FROM fill f, sent s, unnest(range(0, (f.t + 4) // 5)) AS p(j)
        |  WHERE s.doc_id = f.doc_id AND s.i = f.i AND f.i >= 1 AND f.oversized)
        |SELECT doc_id, chunk_idx, n_sentences, n_tokens AS n_chunk_tokens, md5(chunk) AS chunk_md5
        |FROM (SELECT * FROM norm UNION ALL SELECT * FROM ov)
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    // checksum-validated ids: the oracle recomputes EVERY Luhn mod-10
    // and IBAN mod-97 checksum digit-for-digit (exact integer folds —
    // the streaming mod-97 form keeps every intermediate < 970, so
    // 64-bit on both engines); match order preserved via index unnest
    "q147_pii_checksum" ->
      """WITH aug AS (SELECT doc_id,
        |    coalesce(text, '') || ' pay ' ||
        |    substring(c16, 1, 4) || ' ' || substring(c16, 5, 4) || ' ' ||
        |    substring(c16, 9, 4) || ' ' || substring(c16, 13, 4) ||
        |    ' acct DE' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
        |    lpad(CAST((doc_id * 37) % 10000000000 AS VARCHAR), 10, '0') ||
        |    ' ref ' || c16 AS text
        |  FROM (SELECT doc_id, text,
        |      '4' || lpad(CAST((doc_id * 7919) % 1000000000000000 AS VARCHAR), 15, '0') AS c16
        |    FROM documents)),
        |cl AS (SELECT doc_id,
        |    list_transform(regexp_extract_all(text, '\b[0-9][0-9 -]{11,21}[0-9]\b'),
        |      x -> regexp_replace(x, '[ -]', '', 'g')) AS l
        |  FROM aug),
        |cc AS (SELECT doc_id, o.idx AS idx, l[o.idx] AS d
        |  FROM cl, unnest(range(1, len(l) + 1)) AS o(idx)),
        |cok AS (SELECT doc_id, idx, d FROM cc
        |  WHERE length(d) BETWEEN 13 AND 19 AND
        |    list_sum(list_transform(range(1, length(d) + 1), i ->
        |      CASE WHEN (i - 1) % 2 = 0 THEN CAST(substring(reverse(d), i, 1) AS BIGINT)
        |           WHEN CAST(substring(reverse(d), i, 1) AS BIGINT) > 4
        |             THEN CAST(substring(reverse(d), i, 1) AS BIGINT) * 2 - 9
        |           ELSE CAST(substring(reverse(d), i, 1) AS BIGINT) * 2 END)) % 10 = 0),
        |cagg AS (SELECT doc_id, string_agg(d, ',' ORDER BY idx) AS cards,
        |    count(*) AS n_c FROM cok GROUP BY 1),
        |il AS (SELECT doc_id, regexp_extract_all(text, '\b[A-Z]{2}[0-9]{2}[A-Z0-9]{8,30}\b') AS l
        |  FROM aug),
        |ic AS (SELECT doc_id, o.idx AS idx, l[o.idx] AS c
        |  FROM il, unnest(range(1, len(l) + 1)) AS o(idx)),
        |iex AS (SELECT doc_id, idx, c,
        |    array_to_string(list_transform(range(1, length(rot) + 1), i ->
        |      CASE WHEN substring(rot, i, 1) BETWEEN '0' AND '9' THEN substring(rot, i, 1)
        |           ELSE CAST(ascii(substring(rot, i, 1)) - 55 AS VARCHAR) END), '') AS ex
        |  FROM (SELECT doc_id, idx, c, substring(c, 5) || substring(c, 1, 4) AS rot FROM ic)),
        |iok AS (SELECT doc_id, idx, c FROM iex
        |  WHERE length(c) >= 12 AND list_reduce(
        |    list_transform(range(1, length(ex) + 1), j -> CAST(substring(ex, j, 1) AS BIGINT)),
        |    (acc, x) -> (acc * 10 + x) % 97) = 1),
        |iagg AS (SELECT doc_id, string_agg(c, ',' ORDER BY idx) AS ibans,
        |    count(*) AS n_i FROM iok GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(cagg.n_c, 0) AS BIGINT) AS n_cards_valid,
        |  CAST(coalesce(iagg.n_i, 0) AS BIGINT) AS n_ibans_valid,
        |  coalesce(cagg.cards, '') AS cards,
        |  coalesce(iagg.ibans, '') AS ibans
        |FROM documents d
        |LEFT JOIN cagg ON d.doc_id = cagg.doc_id
        |LEFT JOIN iagg ON d.doc_id = iagg.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // HLL overlap: registers of both halves replayed (the q128 hash/rank
    // pipeline), union = max-merge of the two register tables, then
    // inclusion-exclusion in the pinned association order
    // (est_a + est_b) - est_union; every term is one pinned division of
    // the alpha numerator by an exact BIGINT denominator
    "q148_hll_overlap" ->
      """WITH toks AS (SELECT lang, doc_id, u.tok AS w
        |  FROM documents, unnest(string_split_regex(trim(lower(text)), '\s+')) AS u(tok)
        |  WHERE text IS NOT NULL AND u.tok <> ''),
        |ha AS (SELECT lang,
        |    list_reduce(list_transform(range(1, 16), i ->
        |      CAST(strpos('0123456789abcdef', substring(md5(w), i, 1)) - 1 AS BIGINT)),
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM toks WHERE doc_id % 2 = 0),
        |hb AS (SELECT lang,
        |    list_reduce(list_transform(range(1, 16), i ->
        |      CAST(strpos('0123456789abcdef', substring(md5(w), i, 1)) - 1 AS BIGINT)),
        |      (acc, x) -> acc * 16 + x) AS hv
        |  FROM toks WHERE doc_id % 2 = 1),
        |ra AS (SELECT lang, hv & 255 AS bucket,
        |    max(CASE WHEN (hv >> 8) = 0 THEN 53 ELSE 53 - length(bin(hv >> 8)) END) AS r
        |  FROM ha GROUP BY 1, 2),
        |rb AS (SELECT lang, hv & 255 AS bucket,
        |    max(CASE WHEN (hv >> 8) = 0 THEN 53 ELSE 53 - length(bin(hv >> 8)) END) AS r
        |  FROM hb GROUP BY 1, 2),
        |ru AS (SELECT lang, bucket, max(r) AS r
        |  FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY 1, 2),
        |ea AS (SELECT lang, 4.2399330249068963e+20 / CAST(
        |    CAST(sum(CAST(1 AS BIGINT) << (53 - r)) AS BIGINT) +
        |    (256 - count(*)) * (CAST(1 AS BIGINT) << 53) AS DOUBLE) AS est_a
        |  FROM ra GROUP BY 1),
        |eb AS (SELECT lang, 4.2399330249068963e+20 / CAST(
        |    CAST(sum(CAST(1 AS BIGINT) << (53 - r)) AS BIGINT) +
        |    (256 - count(*)) * (CAST(1 AS BIGINT) << 53) AS DOUBLE) AS est_b
        |  FROM rb GROUP BY 1),
        |eu AS (SELECT lang, 4.2399330249068963e+20 / CAST(
        |    CAST(sum(CAST(1 AS BIGINT) << (53 - r)) AS BIGINT) +
        |    (256 - count(*)) * (CAST(1 AS BIGINT) << 53) AS DOUBLE) AS est_union
        |  FROM ru GROUP BY 1),
        |ex AS (SELECT lang, CAST(count(*) AS BIGINT) AS exact_overlap FROM (
        |    SELECT DISTINCT lang, w FROM toks WHERE doc_id % 2 = 0
        |    INTERSECT
        |    SELECT DISTINCT lang, w FROM toks WHERE doc_id % 2 = 1) GROUP BY 1)
        |SELECT lang, est_a, est_b, est_union,
        |  (est_a + est_b) - est_union AS est_overlap, exact_overlap
        |FROM ea JOIN eb USING (lang) JOIN eu USING (lang) JOIN ex USING (lang)
        |ORDER BY lang""".stripMargin,
    // graded retrieval (nDCG@5): both retrievers replayed (the q143
    // CTEs), grades pinned by truth rank, and the log2 discounts spliced
    // as the SAME StrictMath-computed integers the engine uses — no
    // logarithm is evaluated by either engine (the ln rule)
    "q149_ndcg_eval" -> {
      val planeRows = graft.similarity.Knn.hyperplanes(8, 64, 7L).zipWithIndex
        .map { case (p, j) => s"($j, [${p.mkString(", ")}]::DOUBLE[])" }
        .mkString(",\n  ")
      val discRows = graft.operators.RankEval.ndcgDiscounts.take(5).zipWithIndex
        .map { case (d, i) => s"(${i + 1}, CAST($d AS BIGINT))" }
        .mkString(",\n  ")
      s"""WITH planes(j, pl) AS (VALUES
         |  $planeRows),
         |disc(i, d) AS (VALUES
         |  $discRows),
         |v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
         |vb AS (SELECT id, CAST(sum(CASE WHEN list_dot_product(v.v, p.pl) >= 0
         |    THEN (CAST(1 AS BIGINT) << p.j) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM v, planes p GROUP BY id),
         |vv AS (SELECT v.id, v.v, vb.bucket FROM v JOIN vb USING (id)),
         |q AS (SELECT id AS query_id, v AS qv, bucket FROM vv WHERE id < 10),
         |ls AS (SELECT q.query_id, c.id, list_cosine_similarity(c.v, q.qv) AS score
         |  FROM vv c JOIN q ON c.bucket = q.bucket AND c.id <> q.query_id),
         |lr AS (SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM ls),
         |bs AS (SELECT q.query_id, c.id, list_cosine_similarity(c.v, q.qv) AS score
         |  FROM vv c, q WHERE c.id <> q.query_id),
         |tr AS (SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM bs),
         |res AS (SELECT query_id, id AS neighbor_id, rank FROM lr WHERE rank <= 5),
         |g AS (SELECT query_id, id AS neighbor_id,
         |    CASE WHEN rank = 1 THEN 3 WHEN rank <= 3 THEN 2 ELSE 1 END AS rel
         |  FROM tr WHERE rank <= 5),
         |dcg AS (SELECT res.query_id,
         |    CAST(sum(coalesce(g.rel, 0) * d.d) AS BIGINT) AS dcg_scaled
         |  FROM res
         |  LEFT JOIN g ON res.query_id = g.query_id AND res.neighbor_id = g.neighbor_id
         |  JOIN disc d ON d.i = res.rank GROUP BY 1),
         |ideal AS (SELECT query_id, CAST(sum(rel * d.d) AS BIGINT) AS idcg_scaled FROM (
         |    SELECT query_id, rel,
         |      row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, neighbor_id) AS ir
         |    FROM g) x
         |  JOIN disc d ON d.i = x.ir WHERE x.ir <= 5 GROUP BY 1)
         |SELECT query_id,
         |  CAST(coalesce(dcg.dcg_scaled, 0) AS BIGINT) AS dcg_scaled,
         |  idcg_scaled,
         |  CASE WHEN idcg_scaled > 0
         |    THEN CAST(coalesce(dcg.dcg_scaled, 0) AS DOUBLE) / CAST(idcg_scaled AS DOUBLE) END AS ndcg
         |FROM ideal FULL JOIN dcg USING (query_id)
         |ORDER BY query_id""".stripMargin
    },
    // skew decision report: exact counts, integer div for ppm share and
    // the ceil-div salt recommendation (float-division floor could
    // round across the boundary — integer div on both engines)
    "q150_skew_profile" ->
      """WITH c AS (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
        |top AS (SELECT o_custkey, CAST(cnt AS BIGINT) AS cnt FROM c
        |  ORDER BY cnt DESC, o_custkey LIMIT 5)
        |SELECT o_custkey, cnt,
        |  (cnt * 1000000) // total AS share_ppm,
        |  greatest(CAST(1 AS BIGINT), (cnt + 9) // 10) AS recommended_salt
        |FROM top, t ORDER BY cnt DESC, o_custkey""".stripMargin,
    // embedding DQ: injected NULL / wrong-dim / NaN / zero rows must
    // count exactly once each; norm-squared is a left fold with pinned
    // association (list_prepend 0.0 mirrors the engine's aggregate init)
    "q151_embedding_quality" ->
      """WITH base AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |  UNION ALL SELECT -1, NULL
        |  UNION ALL SELECT -2, [1.0, 2.0]::DOUBLE[]
        |  UNION ALL SELECT -3, list_transform(range(64), x -> 'NaN'::DOUBLE)
        |  UNION ALL SELECT -4, list_transform(range(64), x -> 0.0::DOUBLE)
        |  UNION ALL SELECT -5, list_prepend(NULL::DOUBLE, list_transform(range(63), x -> 1.0::DOUBLE))),
        |m AS (SELECT
        |    v IS NULL AS is_nl,
        |    coalesce(v IS NOT NULL AND len(v) <> 64, FALSE) AS is_bad,
        |    coalesce(v IS NOT NULL AND len(list_filter(v, x -> x IS NULL)) > 0, FALSE) AS has_ne,
        |    coalesce(v IS NOT NULL AND len(list_filter(v, x -> coalesce(isnan(x), FALSE))) > 0, FALSE) AS has_nan,
        |    CASE WHEN v IS NOT NULL
        |      THEN list_reduce(list_prepend(0.0, v), (a, x) -> a + x * x) END AS n2
        |  FROM base),
        |f AS (SELECT *, NOT is_nl AND NOT is_bad AND NOT has_ne AND NOT has_nan AS clean FROM m)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN is_nl THEN 1 ELSE 0 END) AS BIGINT) AS n_null_vec,
        |  CAST(sum(CASE WHEN is_bad THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_dim,
        |  CAST(sum(CASE WHEN has_ne THEN 1 ELSE 0 END) AS BIGINT) AS n_null_elem,
        |  CAST(sum(CASE WHEN has_nan THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
        |  CAST(sum(CASE WHEN clean AND n2 = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  min(CASE WHEN clean THEN n2 END) AS min_norm2,
        |  max(CASE WHEN clean THEN n2 END) AS max_norm2
        |FROM f""".stripMargin,
    // median/MAD outliers: both centers are LOWER-MEDIAN rank selections
    // (actual data values, no interpolation), deviations exact integer
    // subtractions; planted +500 spikes on every 997th order key
    "q152_mad_outliers" ->
      """WITH li AS (SELECT l_returnflag,
        |    CAST(l_quantity AS BIGINT) +
        |      CASE WHEN l_orderkey % 997 = 0 THEN 500 ELSE 0 END AS qty,
        |    l_orderkey || ':' || l_linenumber AS tb
        |  FROM lineitem),
        |med AS (SELECT l_returnflag,
        |    max(CASE WHEN rn = (n + 1) // 2 THEN qty END) AS med FROM (
        |    SELECT l_returnflag, qty,
        |      row_number() OVER (PARTITION BY l_returnflag ORDER BY qty, tb) AS rn,
        |      count(*) OVER (PARTITION BY l_returnflag) AS n
        |    FROM li) GROUP BY 1),
        |dv AS (SELECT li.l_returnflag, abs(qty - med) AS dev, tb, med
        |  FROM li JOIN med USING (l_returnflag)),
        |w1 AS (SELECT l_returnflag, med, dev,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY dev, tb) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM dv),
        |w2 AS (SELECT *, max(CASE WHEN rn = (n + 1) // 2 THEN dev END)
        |    OVER (PARTITION BY l_returnflag) AS mad FROM w1)
        |SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n,
        |  CAST(max(med) AS BIGINT) AS med,
        |  CAST(max(mad) AS BIGINT) AS mad,
        |  CAST(sum(CASE WHEN dev > 3.0 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM w2 GROUP BY 1 ORDER BY 1""".stripMargin,
    // sampled harmonic centrality: the three BFS rounds unrolled as
    // MATERIALIZED CTEs (the q139 2^rounds inlining lesson), distances
    // exact integers, 1/d as 1000000 // d — no float anywhere
    "q153_harmonic" ->
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
        |sup AS MATERIALIZED (SELECT x.l_partkey AS pa, y.l_partkey AS pb
        |  FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
        |  WHERE x.l_partkey < y.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS MATERIALIZED (SELECT pa AS src, pb AS dst FROM sup
        |  UNION SELECT pb AS src, pa AS dst FROM sup),
        |srcs AS MATERIALIZED (SELECT src AS node FROM (SELECT DISTINCT src FROM e)
        |  ORDER BY md5(CAST(src AS VARCHAR)), src LIMIT 8),
        |v0 AS MATERIALIZED (SELECT node AS s, node, 0 AS d FROM srcs),
        |f1 AS MATERIALIZED (SELECT DISTINCT r.s, e.dst AS node
        |  FROM v0 r JOIN e ON e.src = r.node),
        |n1 AS MATERIALIZED (SELECT f1.s, f1.node, 1 AS d FROM f1
        |  LEFT JOIN v0 ON v0.s = f1.s AND v0.node = f1.node WHERE v0.node IS NULL),
        |v1 AS MATERIALIZED (SELECT * FROM v0 UNION ALL SELECT * FROM n1),
        |f2 AS MATERIALIZED (SELECT DISTINCT r.s, e.dst AS node
        |  FROM n1 r JOIN e ON e.src = r.node),
        |n2 AS MATERIALIZED (SELECT f2.s, f2.node, 2 AS d FROM f2
        |  LEFT JOIN v1 ON v1.s = f2.s AND v1.node = f2.node WHERE v1.node IS NULL),
        |v2 AS MATERIALIZED (SELECT * FROM v1 UNION ALL SELECT * FROM n2),
        |f3 AS MATERIALIZED (SELECT DISTINCT r.s, e.dst AS node
        |  FROM n2 r JOIN e ON e.src = r.node),
        |n3 AS MATERIALIZED (SELECT f3.s, f3.node, 3 AS d FROM f3
        |  LEFT JOIN v2 ON v2.s = f3.s AND v2.node = f3.node WHERE v2.node IS NULL),
        |v3 AS (SELECT * FROM v2 UNION ALL SELECT * FROM n3)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_sources_reached,
        |  CAST(sum(1000000 // d) AS BIGINT) AS harmonic_scaled
        |FROM v3 WHERE d > 0 GROUP BY 1 ORDER BY 1""".stripMargin,
    // bottom-k quantile sketch: the md5 row-identity order, the k-cut,
    // and the rank selections all replayed; chr(1) is the keyHash
    // column separator
    "q154_quantile_sketch" ->
      """WITH li AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
        |    md5(CAST(l_orderkey AS VARCHAR) || chr(1) || CAST(l_linenumber AS VARCHAR)) AS h,
        |    l_orderkey || ':' || l_linenumber AS tb
        |  FROM lineitem WHERE l_quantity IS NOT NULL),
        |sk AS (SELECT l_returnflag, h, qty FROM (
        |    SELECT l_returnflag, h, qty,
        |      row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
        |    FROM li) WHERE rn <= 200),
        |rep AS (SELECT l_returnflag, CAST(max(n) AS BIGINT) AS n_sample,
        |    max(CASE WHEN rn = (n + 1) // 2 THEN qty END) AS p50,
        |    max(CASE WHEN rn = (9 * n + 9) // 10 THEN qty END) AS p90
        |  FROM (SELECT l_returnflag, qty,
        |      row_number() OVER (PARTITION BY l_returnflag ORDER BY qty, h) AS rn,
        |      count(*) OVER (PARTITION BY l_returnflag) AS n
        |    FROM sk) GROUP BY 1),
        |ex AS (SELECT l_returnflag,
        |    max(CASE WHEN rn = (n + 1) // 2 THEN qty END) AS exact_p50,
        |    max(CASE WHEN rn = (9 * n + 9) // 10 THEN qty END) AS exact_p90
        |  FROM (SELECT l_returnflag, qty,
        |      row_number() OVER (PARTITION BY l_returnflag ORDER BY qty, tb) AS rn,
        |      count(*) OVER (PARTITION BY l_returnflag) AS n
        |    FROM li) GROUP BY 1)
        |SELECT r.l_returnflag, n_sample,
        |  CAST(p50 AS BIGINT) AS p50, CAST(p90 AS BIGINT) AS p90,
        |  CAST(exact_p50 AS BIGINT) AS exact_p50, CAST(exact_p90 AS BIGINT) AS exact_p90
        |FROM rep r JOIN ex USING (l_returnflag) ORDER BY 1""".stripMargin,
    // join-cardinality forecast: sum/max of per-key count products,
    // plus the real join's count proving forecast == actual
    "q155_join_cardinality" ->
      """WITH ca AS (SELECT l_orderkey AS k, count(*) AS ca FROM lineitem GROUP BY 1),
        |cb AS (SELECT o_orderkey AS k, count(*) AS cb FROM orders GROUP BY 1),
        |p AS (SELECT ca.ca * cb.cb AS prod FROM ca JOIN cb USING (k)),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS n_matching_keys,
        |    CAST(coalesce(sum(prod), 0) AS BIGINT) AS join_rows,
        |    CAST(coalesce(max(prod), 0) AS BIGINT) AS max_key_rows FROM p),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS actual_rows
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT * FROM f, a""".stripMargin,
    // k-anonymity: exact quasi-identifier group counts, sub-k listing
    "q156_k_anonymity" ->
      """WITH c AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket
        |  FROM customer),
        |g AS (SELECT c_nationkey, c_mktsegment, bal_bucket, count(*) AS cnt
        |  FROM c GROUP BY 1, 2, 3)
        |SELECT c_nationkey, c_mktsegment, bal_bucket, CAST(cnt AS BIGINT) AS cnt
        |FROM g WHERE cnt < 5
        |ORDER BY cnt, c_nationkey, c_mktsegment, bal_bucket""".stripMargin,
    // temporal embargo split: second-truncated comparisons, the 2-day
    // gap before the cutoff excluded from both sides
    "q157_temporal_split" ->
      """WITH e AS (SELECT ts, CAST(floor(epoch(ts)) AS BIGINT) AS tsec FROM events),
        |s AS (SELECT CASE WHEN tsec < 1705881600 - 172800 THEN 'train'
        |         WHEN tsec >= 1705881600 THEN 'test' END AS split, ts
        |  FROM e)
        |SELECT split, CAST(count(*) AS BIGINT) AS n_rows,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS min_ts,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts
        |FROM s WHERE split IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,
    // NFKC keys: the expansions are PINNED literals (Unicode stability
    // policy fixes them for assigned chars); the oracle never
    // normalizes — it constructs the expected output directly, so a
    // kernel that folds wrong, folds extra, or touches the ASCII base
    // fails the hash
    "q158_nfkc_keys" ->
      """WITH aug AS (SELECT doc_id,
        |    text || ' ' || CASE CAST(doc_id % 5 AS INT)
        |      WHEN 0 THEN 'ﬁle' WHEN 1 THEN '②nd' WHEN 2 THEN '5㎞'
        |      WHEN 3 THEN 'Ｈi' ELSE '½' END AS raw,
        |    text || ' ' || CASE CAST(doc_id % 5 AS INT)
        |      WHEN 0 THEN 'file' WHEN 1 THEN '2nd' WHEN 2 THEN '5km'
        |      WHEN 3 THEN 'Hi' ELSE '1⁄2' END AS expected
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id, CAST(length(raw) AS BIGINT) AS n_chars_raw,
        |  CAST(length(expected) AS BIGINT) AS n_chars_norm,
        |  md5(expected) AS norm_md5
        |FROM aug ORDER BY doc_id""".stripMargin,
    // debounce: the lag window and every gap comparison replayed; the
    // id checksum is order-free so the hash doesn't depend on row order
    "q159_debounce" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec FROM events),
        |l AS (SELECT *, lag(tsec) OVER (
        |    PARTITION BY user_id, event_type ORDER BY tsec, event_id) AS prev
        |  FROM e),
        |k AS (SELECT * FROM l WHERE prev IS NULL OR tsec - prev >= 3600)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(event_id) AS BIGINT) AS id_checksum
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,
    // per-line language profile: the q27 rule replayed on every LINE of
    // the injected multilingual text; dominant = first max in the fixed
    // en/de/fr/es/zh/und order; foreign_ppm by integer div
    "q160_line_lang_profile" ->
      """WITH aug AS (SELECT doc_id, text ||
        |    CASE CAST(doc_id % 3 AS INT)
        |      WHEN 1 THEN chr(10) || 'le chat est sur la table et il est pas pour dans'
        |      WHEN 2 THEN chr(10) || 'le chat est sur la table et il est pas pour dans' ||
        |        chr(10) || 'der hund ist nicht mit der katze und das ist ein haus'
        |      ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN chr(10) || '这是一个中文句子测试' ELSE '' END AS text
        |  FROM documents WHERE text IS NOT NULL),
        |ln AS (SELECT doc_id, u.l AS line FROM aug, unnest(string_split(text, chr(10))) AS u(l)
        |  WHERE trim(u.l) <> ''),
        |s AS (SELECT doc_id, line,
        |  len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','that','it','for','with','as','was','on'], x))) AS h_en,
        |  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','mit','ein','eine','zu','den','von','für'], x))) AS h_de,
        |  len(list_filter(toks, x -> list_contains(['le','la','les','et','est','un','une','de','des','que','pas','pour','dans'], x))) AS h_fr,
        |  len(list_filter(toks, x -> list_contains(['el','la','los','las','y','es','un','una','de','que','no','por','para','con'], x))) AS h_es,
        |  length(regexp_replace(line, '[^\x{4e00}-\x{9fff}]', '', 'g')) AS cjk,
        |  length(line) AS n
        |  FROM (SELECT doc_id, line, string_split_regex(trim(lower(line)), '\s+') AS toks FROM ln)),
        |p AS (SELECT doc_id, CASE
        |  WHEN n > 0 AND cjk * 1.0 / n > 0.2 THEN 'zh'
        |  WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
        |  WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
        |  WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
        |  WHEN h_fr >= h_es THEN 'fr'
        |  ELSE 'es' END AS lp FROM s),
        |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN lp = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
        |  CAST(sum(CASE WHEN lp = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
        |  CAST(sum(CASE WHEN lp = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
        |  CAST(sum(CASE WHEN lp = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es,
        |  CAST(sum(CASE WHEN lp = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS n_zh,
        |  CAST(sum(CASE WHEN lp = 'und' THEN 1 ELSE 0 END) AS BIGINT) AS n_und
        |  FROM p GROUP BY 1)
        |SELECT a.doc_id,
        |  coalesce(n_lines, 0) AS n_lines,
        |  coalesce(n_en, 0) AS n_en, coalesce(n_de, 0) AS n_de,
        |  coalesce(n_fr, 0) AS n_fr, coalesce(n_es, 0) AS n_es,
        |  coalesce(n_zh, 0) AS n_zh, coalesce(n_und, 0) AS n_und,
        |  CASE WHEN coalesce(n_lines, 0) = 0 THEN 'und'
        |    WHEN n_en = greatest(n_en, n_de, n_fr, n_es, n_zh, n_und) THEN 'en'
        |    WHEN n_de = greatest(n_en, n_de, n_fr, n_es, n_zh, n_und) THEN 'de'
        |    WHEN n_fr = greatest(n_en, n_de, n_fr, n_es, n_zh, n_und) THEN 'fr'
        |    WHEN n_es = greatest(n_en, n_de, n_fr, n_es, n_zh, n_und) THEN 'es'
        |    WHEN n_zh = greatest(n_en, n_de, n_fr, n_es, n_zh, n_und) THEN 'zh'
        |    ELSE 'und' END AS dominant_lang,
        |  CASE WHEN coalesce(n_lines, 0) > 0
        |    THEN (n_lines - greatest(n_en, n_de, n_fr, n_es, n_zh, n_und)) * 1000000 // n_lines
        |    ELSE 0 END AS foreign_ppm
        |FROM aug a LEFT JOIN cnt ON a.doc_id = cnt.doc_id
        |ORDER BY a.doc_id""".stripMargin,
    // top paths: both lags over the same per-user (ts, id) order, full
    // windows only, pinned (count desc, path) top-10
    "q161_top_paths" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec FROM events
        |  WHERE event_type IS NOT NULL),
        |l AS (SELECT user_id, event_type,
        |    lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY tsec, event_id) AS l2,
        |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY tsec, event_id) AS l1
        |  FROM e),
        |p AS (SELECT l2 || '>' || l1 || '>' || event_type AS path FROM l WHERE l2 IS NOT NULL)
        |SELECT path, CAST(count(*) AS BIGINT) AS n
        |FROM p GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin,
    // l-diversity: exact distinct-sensitive counts per quasi group
    "q162_l_diversity" ->
      """WITH c AS (SELECT c_nationkey,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
        |    c_mktsegment
        |  FROM customer),
        |g AS (SELECT c_nationkey, bal_bucket, count(*) AS cnt,
        |    count(DISTINCT c_mktsegment) AS n_sensitive
        |  FROM c GROUP BY 1, 2)
        |SELECT c_nationkey, bal_bucket, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(n_sensitive AS BIGINT) AS n_sensitive
        |FROM g WHERE n_sensitive < 4
        |ORDER BY c_nationkey, bal_bucket""".stripMargin,
    // calibration: the q144 refit + margin replay, then EXPLICIT
    // integer bucket edges ((rank-1)*10 // n + 1 — not ntile, whose
    // remainder rule is an engine detail)
    "q163_calibration" ->
      s"""WITH $QualityRefitCtes,
        |j AS (SELECT s.doc_id, CAST(s.margin AS BIGINT) AS margin, l.label
        |  FROM sig s JOIN lab l USING (doc_id)),
        |r AS (SELECT *, row_number() OVER (ORDER BY margin, doc_id) AS rn,
        |    count(*) OVER () AS n FROM j),
        |bk AS (SELECT (CAST(rn AS BIGINT) - 1) * 10 // n + 1 AS bucket, margin, label FROM r)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  min(margin) AS min_score, max(margin) AS max_score
        |FROM bk GROUP BY 1 ORDER BY 1""".stripMargin,
    // centroid drift: floor(x * 2^20) is exact (power-of-two scaling),
    // BIGINT sums are partition-order-free, the cross-multiplied mean
    // difference keeps the n_a*n_b denominator implicit — no float
    "q164_centroid_drift" ->
      """WITH q AS (SELECT vec_id, u.i AS dim,
        |    CAST(floor(v[u.i + 1] * 1048576) AS BIGINT) AS qv
        |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |        WHERE embedding IS NOT NULL
        |          AND len(list_filter(embedding::DOUBLE[], x -> coalesce(isnan(x), FALSE))) = 0),
        |    unnest(range(0, len(v))) AS u(i)),
        |a AS (SELECT dim, CAST(sum(qv) AS BIGINT) AS sum_a,
        |    CAST(count(*) AS BIGINT) AS n_a FROM q WHERE vec_id % 2 = 0 GROUP BY 1),
        |b AS (SELECT dim, CAST(sum(qv) AS BIGINT) AS sum_b,
        |    CAST(count(*) AS BIGINT) AS n_b FROM q WHERE vec_id % 2 = 1 GROUP BY 1)
        |SELECT CAST(dim AS INT) AS dim, sum_a, n_a, sum_b, n_b,
        |  sum_a * n_b - sum_b * n_a AS diff_scaled
        |FROM a JOIN b USING (dim) ORDER BY dim""".stripMargin,
    // personalized PageRank: the q132 unroll with a seed-conditional
    // base — seeds (md5-earliest 4 of the symmetrized node set) start
    // at scale and keep the damped base; non-seeds start at 0
    "q165_personalized_pagerank" -> {
      val head =
        """WITH e0 AS (SELECT DISTINCT CAST(-l_suppkey - 1 AS BIGINT) AS src,
          |    CAST(l_partkey AS BIGINT) AS dst FROM lineitem),
          |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
          |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
          |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          |seeds AS (SELECT node FROM n ORDER BY md5(CAST(node AS VARCHAR)), node LIMIT 4),
          |sn AS (SELECT n.node, seeds.node IS NOT NULL AS s
          |  FROM n LEFT JOIN seeds ON n.node = seeds.node),
          |it0 AS (SELECT node, CASE WHEN s THEN CAST(1000000 AS BIGINT)
          |  ELSE CAST(0 AS BIGINT) END AS r FROM sn)""".stripMargin
      val iters = (1 to 5).map { i =>
        s"""c$i AS (SELECT e.dst AS node, CAST(sum((p.r * 85) // (100 * deg.d)) AS BIGINT) AS s2
           |  FROM e JOIN it${i - 1} p ON p.node = e.src JOIN deg ON deg.src = e.src
           |  GROUP BY e.dst),
           |it$i AS (SELECT sn.node,
           |    CASE WHEN sn.s THEN 150000 ELSE 0 END + coalesce(c$i.s2, 0) AS r
           |  FROM sn LEFT JOIN c$i ON c$i.node = sn.node)""".stripMargin
      }.mkString(",\n", ",\n", "")
      head + iters + "\nSELECT node, CAST(r AS BIGINT) AS r FROM it5 ORDER BY node"
    },
    // graph-ANN eval: search results from the fixture (greedy walks
    // don't replay in SQL), exact brute truth + metric joins replayed —
    // the same evaluation tail as q143
    "q166_graph_ann_eval" ->
      """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT id AS query_id, v AS qv FROM v WHERE id < 10),
        |bs AS (SELECT q.query_id, c.id, list_cosine_similarity(c.v, q.qv) AS score
        |  FROM v c, q WHERE c.id <> q.query_id),
        |tr AS (SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM bs),
        |res AS (SELECT query_id, neighbor_id, rank
        |  FROM read_parquet('__GRAFT_FIXTURE:nsw_topk__/*.parquet') WHERE rank <= 5),
        |tru AS (SELECT query_id, id AS neighbor_id FROM tr WHERE rank <= 5),
        |j AS (SELECT res.query_id, res.rank,
        |    CASE WHEN tru.neighbor_id IS NOT NULL THEN 1 END AS hit
        |  FROM res LEFT JOIN tru ON res.query_id = tru.query_id AND res.neighbor_id = tru.neighbor_id),
        |pq AS (SELECT query_id, count(*) AS n_results,
        |    CAST(sum(coalesce(hit, 0)) AS BIGINT) AS hits_at_k,
        |    CAST(min(CASE WHEN hit = 1 THEN rank END) AS BIGINT) AS first_hit_rank
        |  FROM j GROUP BY 1),
        |tc AS (SELECT query_id, count(*) AS n_truth FROM tru GROUP BY 1)
        |SELECT coalesce(tc.query_id, pq.query_id) AS query_id,
        |  CAST(coalesce(pq.n_results, 0) AS BIGINT) AS n_results,
        |  CAST(coalesce(tc.n_truth, 0) AS BIGINT) AS n_truth,
        |  CAST(coalesce(pq.hits_at_k, 0) AS BIGINT) AS hits_at_k,
        |  pq.first_hit_rank
        |FROM tc FULL OUTER JOIN pq ON tc.query_id = pq.query_id
        |ORDER BY 1""".stripMargin,
    // incremental graph-ANN: the folded graph's search results from the
    // fixture (the q166 replayability line), brute truth + metric joins
    // replayed in full
    "q167_graph_ann_fold" ->
      """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT id AS query_id, v AS qv FROM v WHERE id < 10),
        |bs AS (SELECT q.query_id, c.id, list_cosine_similarity(c.v, q.qv) AS score
        |  FROM v c, q WHERE c.id <> q.query_id),
        |tr AS (SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM bs),
        |res AS (SELECT query_id, neighbor_id, rank
        |  FROM read_parquet('__GRAFT_FIXTURE:nsw_fold_topk__/*.parquet') WHERE rank <= 5),
        |tru AS (SELECT query_id, id AS neighbor_id FROM tr WHERE rank <= 5),
        |j AS (SELECT res.query_id, res.rank,
        |    CASE WHEN tru.neighbor_id IS NOT NULL THEN 1 END AS hit
        |  FROM res LEFT JOIN tru ON res.query_id = tru.query_id AND res.neighbor_id = tru.neighbor_id),
        |pq AS (SELECT query_id, count(*) AS n_results,
        |    CAST(sum(coalesce(hit, 0)) AS BIGINT) AS hits_at_k,
        |    CAST(min(CASE WHEN hit = 1 THEN rank END) AS BIGINT) AS first_hit_rank
        |  FROM j GROUP BY 1),
        |tc AS (SELECT query_id, count(*) AS n_truth FROM tru GROUP BY 1)
        |SELECT coalesce(tc.query_id, pq.query_id) AS query_id,
        |  CAST(coalesce(pq.n_results, 0) AS BIGINT) AS n_results,
        |  CAST(coalesce(tc.n_truth, 0) AS BIGINT) AS n_truth,
        |  CAST(coalesce(pq.hits_at_k, 0) AS BIGINT) AS hits_at_k,
        |  pq.first_hit_rank
        |FROM tc FULL OUTER JOIN pq ON tc.query_id = pq.query_id
        |ORDER BY 1""".stripMargin,
    // exact ROC-AUC: the q144 refit + margin replay, then Mann–Whitney
    // pair counting from per-distinct-margin cumulative sums — every
    // pair count an exact BIGINT, auc ONE division of exact integers
    "q168_classifier_auc" ->
      s"""WITH $QualityRefitCtes,
        |j AS (SELECT s.doc_id, CAST(s.margin AS BIGINT) AS margin, l.label
        |  FROM sig s JOIN lab l USING (doc_id)),
        |ps AS (SELECT margin,
        |    CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS np,
        |    CAST(sum(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS nn
        |  FROM j GROUP BY 1),
        |cum AS (SELECT np, nn,
        |    CAST(coalesce(sum(nn) OVER (ORDER BY margin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS neg_below
        |  FROM ps),
        |a AS (SELECT
        |    CAST(coalesce(sum(np), 0) AS BIGINT) AS n_pos,
        |    CAST(coalesce(sum(nn), 0) AS BIGINT) AS n_neg,
        |    CAST(coalesce(sum(np * neg_below), 0) AS BIGINT) AS concordant,
        |    CAST(coalesce(sum(np * nn), 0) AS BIGINT) AS tied
        |  FROM cum)
        |SELECT n_pos, n_neg, concordant, tied,
        |  n_pos * n_neg - concordant - tied AS discordant,
        |  CASE WHEN n_pos > 0 AND n_neg > 0
        |    THEN CAST(2 * concordant + tied AS DOUBLE) / CAST(2 * n_pos * n_neg AS DOUBLE) END AS auc
        |FROM a""".stripMargin,
    // t-closeness: exact cross-multiplied TVD gap per (group × value)
    // cell with zero-count completion; the threshold compare runs in
    // HUGEINT (mirroring the engine's decimal(38,0)) so no float ever
    // decides the boundary; tvd is one division of exact integers
    "q169_t_closeness" ->
      """WITH c AS (SELECT c_nationkey,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket, c_mktsegment
        |  FROM customer WHERE c_mktsegment IS NOT NULL),
        |gc AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cv_all FROM c GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM c),
        |grp AS (SELECT c_nationkey, bal_bucket, CAST(count(*) AS BIGINT) AS cnt FROM c GROUP BY 1, 2),
        |gv AS (SELECT c_nationkey, bal_bucket, c_mktsegment, CAST(count(*) AS BIGINT) AS cv
        |  FROM c GROUP BY 1, 2, 3),
        |cell AS (SELECT grp.c_nationkey, grp.bal_bucket, grp.cnt,
        |    abs(coalesce(gv.cv, 0) * tot.n_all - gc.cv_all * grp.cnt) AS term
        |  FROM grp CROSS JOIN gc CROSS JOIN tot
        |  LEFT JOIN gv ON gv.c_nationkey = grp.c_nationkey
        |    AND gv.bal_bucket = grp.bal_bucket AND gv.c_mktsegment = gc.c_mktsegment),
        |d AS (SELECT c_nationkey, bal_bucket, cnt, CAST(sum(term) AS BIGINT) AS dist_num
        |  FROM cell GROUP BY 1, 2, 3)
        |SELECT c_nationkey, bal_bucket, cnt, dist_num,
        |  CAST(dist_num AS DOUBLE) / CAST(2 * cnt * n_all AS DOUBLE) AS tvd
        |FROM d CROSS JOIN tot
        |WHERE CAST(dist_num AS HUGEINT) * 1000000 > CAST(2 AS HUGEINT) * 300000 * cnt * n_all
        |ORDER BY c_nationkey, bal_bucket""".stripMargin,
    // skew-safe bucketed rank selection must pick the SAME values as the
    // plain rank replay — the oracle is layout-independent by design
    "q170_quantiles_bucketed" ->
      """WITH r AS (SELECT event_type, event_id, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type, max(n) AS n,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50,
        |  max(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS p90
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    // winsorize: exact-rank bounds at (p*(n+1)) div 100 clamped to [1,n],
    // applied row-by-row -- every clamp decision hashes
    "q171_winsorize" ->
      """WITH r AS (SELECT event_type, event_id, value,
        |  row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events WHERE value IS NOT NULL),
        |b AS (SELECT event_type,
        |  max(CASE WHEN rn = greatest(1, least(n, (5 * (n + 1)) // 100)) THEN value END) AS lo,
        |  max(CASE WHEN rn = greatest(1, least(n, (95 * (n + 1)) // 100)) THEN value END) AS hi
        |  FROM r GROUP BY event_type)
        |SELECT r.event_type, r.event_id, r.value, b.lo, b.hi,
        |  greatest(b.lo, least(b.hi, r.value)) AS v_wins
        |FROM r JOIN b USING (event_type)
        |ORDER BY r.event_type, r.event_id""".stripMargin,
    // categorical chi-square drift: exact cross-multiplied numerators,
    // zero-filled full-outer value frame, division deferred off-gate
    "q172_chi_square_drift" ->
      """WITH b AS (SELECT o_orderpriority AS value, count(*) AS n_base
        |  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
        |c AS (SELECT o_orderpriority AS value, count(*) AS n_cur
        |  FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1),
        |j AS (SELECT coalesce(b.value, c.value) AS value,
        |    CAST(coalesce(n_base, 0) AS BIGINT) AS n_base,
        |    CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur
        |  FROM b FULL JOIN c ON b.value = c.value),
        |t AS (SELECT CAST(sum(n_base) AS HUGEINT) AS bt, CAST(sum(n_cur) AS HUGEINT) AS ct FROM j)
        |SELECT value, n_base, n_cur,
        |  CAST((n_base * ct - n_cur * bt) * (n_base * ct - n_cur * bt) AS VARCHAR) AS chi_num,
        |  n_base + n_cur AS cell_tot
        |FROM j CROSS JOIN t
        |ORDER BY value""".stripMargin,
    // sorted-neighborhood pairs: rank self-join over the (key, id) total
    // order -- the layout-independent definition of the window pair set
    "q173_sorted_neighborhood" ->
      """WITH b AS (SELECT doc_id AS id,
        |    lang || ':' || substring(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 24) AS k
        |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
        |r AS (SELECT id, k, row_number() OVER (ORDER BY k, id) AS rank FROM b)
        |SELECT a.id AS id_a, c.id AS id_b, a.k AS key_a, c.k AS key_b
        |FROM r a JOIN r c ON c.rank > a.rank AND c.rank < a.rank + 4
        |ORDER BY id_a, id_b""".stripMargin,
    // incremental sorted neighborhood: oracle re-ranks the WHOLE union
    // and keeps pairs touching the batch -- the fold must match exactly
    "q175_sorted_neighborhood_fold" ->
      """WITH b AS (SELECT doc_id AS id, doc_id % 7 = 3 AS is_batch,
        |    lang || ':' || substring(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 24) AS k
        |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
        |r AS (SELECT id, k, is_batch, row_number() OVER (ORDER BY k, id) AS rank FROM b)
        |SELECT a.id AS id_a, c.id AS id_b, a.k AS key_a, c.k AS key_b
        |FROM r a JOIN r c ON c.rank > a.rank AND c.rank < a.rank + 4
        |WHERE a.is_batch OR c.is_batch
        |ORDER BY id_a, id_b""".stripMargin,
    // Cohen's kappa between the refit classifier judge and the length
    // heuristic: contingency, marginal pe join, one division
    "q176_judge_kappa" ->
      s"""WITH $QualityRefitCtes,
        |j AS (SELECT s.doc_id, s.margin >= 0 AS a, d.n_chars >= 256 AS b
        |  FROM sig s JOIN documents d USING (doc_id)),
        |c AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM j GROUP BY 1, 2),
        |r AS (SELECT a, CAST(sum(n) AS BIGINT) AS ra FROM c GROUP BY 1),
        |cc AS (SELECT b, CAST(sum(n) AS BIGINT) AS cb FROM c GROUP BY 1),
        |pe AS (SELECT CAST(coalesce(sum(CAST(ra AS HUGEINT) * cb), 0) AS HUGEINT) AS pe_num
        |  FROM r JOIN cc ON r.a = cc.b),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_items,
        |    CAST(sum(CASE WHEN a = b THEN n ELSE 0 END) AS BIGINT) AS n_agree FROM c)
        |SELECT n_items, n_agree, CAST(pe_num AS BIGINT) AS pe_num,
        |  (n_agree * 1000000) // n_items AS agree_ppm,
        |  CASE WHEN CAST(n_items AS HUGEINT) * n_items <> pe_num THEN
        |    CAST(CAST(n_items AS HUGEINT) * n_agree - pe_num AS DOUBLE) /
        |      CAST(CAST(n_items AS HUGEINT) * n_items - pe_num AS DOUBLE) END AS kappa
        |FROM t CROSS JOIN pe""".stripMargin,
    // Pearson from exact HUGEINT moments; r a fixed IEEE dag
    "q177_correlation" ->
      """WITH s AS (SELECT l_returnflag,
        |    CAST(round(l_quantity * 100) AS HUGEINT) AS x,
        |    CAST(round(l_extendedprice * 100) AS HUGEINT) AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM s GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CAST(sx AS DOUBLE) AS sum_x, CAST(sy AS DOUBLE) AS sum_y,
        |  CASE WHEN CAST(n AS HUGEINT) * sxx - sx * sx > 0
        |        AND CAST(n AS HUGEINT) * syy - sy * sy > 0 THEN
        |    greatest(-1.0, least(1.0,
        |      CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) /
        |        (sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)) *
        |         sqrt(CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE))))) END AS r
        |FROM m ORDER BY l_returnflag""".stripMargin,
    // split leakage: SNM pairs x hash split -> unordered split matrix
    "q178_split_leakage" ->
      """WITH b AS (SELECT doc_id AS id,
        |    lang || ':' || substring(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 24) AS k
        |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
        |r AS (SELECT id, k, row_number() OVER (ORDER BY k, id) AS rank FROM b),
        |p AS (SELECT a.id AS id_a, c.id AS id_b
        |  FROM r a JOIN r c ON c.rank > a.rank AND c.rank < a.rank + 4),
        |sp AS (SELECT doc_id AS id, CASE
        |  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) < 'c00000000000000' THEN 'train'
        |  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) < 'e00000000000000' THEN 'val'
        |  ELSE 'test' END AS split FROM documents),
        |j AS (SELECT least(coalesce(sa.split, '(unassigned)'), coalesce(sb.split, '(unassigned)')) AS split_lo,
        |    greatest(coalesce(sa.split, '(unassigned)'), coalesce(sb.split, '(unassigned)')) AS split_hi
        |  FROM p LEFT JOIN sp sa ON p.id_a = sa.id LEFT JOIN sp sb ON p.id_b = sb.id)
        |SELECT split_lo, split_hi, count(*) AS n_pairs
        |FROM j GROUP BY 1, 2 ORDER BY split_lo, split_hi""".stripMargin,
    // Poisson bootstrap: per-(doc, replicate) md5 uniform -> pinned
    // inverse-CDF weight -> exact HUGEINT replicate sums, one division
    "q179_bootstrap" ->
      """WITH x AS (SELECT doc_id, n_chars, b
        |  FROM documents CROSS JOIN (SELECT unnest(range(0, 32)) AS b)
        |  WHERE n_chars IS NOT NULL),
        |u AS (SELECT b, n_chars, list_reduce(list_transform(range(1, 16), i ->
        |    CAST(strpos('0123456789abcdef', substring(
        |      md5(CAST(doc_id AS VARCHAR) || chr(1) || CAST(b AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
        |    (acc, v) -> acc * 16 + v) / 1152921504606846976.0 AS u
        |  FROM x),
        |w AS (SELECT b, n_chars, CASE
        |    WHEN u < 0.36787944117144233 THEN 0
        |    WHEN u < 0.7357588823428847 THEN 1
        |    WHEN u < 0.9196986029286058 THEN 2
        |    WHEN u < 0.9810118431238463 THEN 3
        |    WHEN u < 0.9963401531726563 THEN 4
        |    WHEN u < 0.9994058151824183 THEN 5
        |    WHEN u < 0.999916758850712 THEN 6
        |    WHEN u < 0.9999897508033253 THEN 7
        |    WHEN u < 0.999998874797402 THEN 8
        |    WHEN u < 0.9999998885745216 THEN 9
        |    ELSE 10 END AS w
        |  FROM u)
        |SELECT CAST(b AS INTEGER) AS b,
        |  CAST(sum(w) AS BIGINT) AS n_drawn,
        |  CAST(sum(CAST(w AS HUGEINT) * n_chars) AS BIGINT) AS sum_v,
        |  CASE WHEN sum(w) > 0 THEN
        |    CAST(sum(CAST(w AS HUGEINT) * n_chars) AS DOUBLE) / CAST(sum(w) AS DOUBLE) END AS mean
        |FROM w GROUP BY b ORDER BY b""".stripMargin,
    // CUSUM: prefix sum + running extrema over (ts, event_id) order --
    // the recursive chart unrolled into windows, all integer-exact
    "q180_cusum" ->
      """WITH e AS (SELECT event_type, ts, event_id,
        |    CAST(round(value * 1000) AS BIGINT) AS v_milli
        |  FROM events WHERE value IS NOT NULL),
        |pp AS (SELECT event_type, ts, event_id, v_milli,
        |    sum(v_milli - 50000) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        |  FROM e),
        |x AS (SELECT event_type, event_id, v_milli, p,
        |    min(p) OVER w2 AS pmin, max(p) OVER w2 AS pmax
        |  FROM pp
        |  WINDOW w2 AS (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type, event_id, v_milli,
        |  CAST(p - least(0, pmin) AS BIGINT) AS cusum_hi,
        |  CAST(greatest(0, pmax) - p AS BIGINT) AS cusum_lo,
        |  p - least(0, pmin) > 2000000 AS breach_hi,
        |  greatest(0, pmax) - p > 2000000 AS breach_lo
        |FROM x ORDER BY event_type, event_id""".stripMargin,
    // Benford: exact digit counts vs pinned log10(1+1/d) ppm targets
    "q181_benford" ->
      """WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS x
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |    AND CAST(round(l_extendedprice * 100) AS BIGINT) <> 0),
        |c AS (SELECT CAST(substring(CAST(abs(x) AS VARCHAR), 1, 1) AS INTEGER) AS digit,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM v GROUP BY 1),
        |exp AS (SELECT * FROM (VALUES (1, 301029), (2, 176091), (3, 124938),
        |    (4, 96910), (5, 79181), (6, 66946), (7, 57991), (8, 51152),
        |    (9, 45757)) AS t(digit, expected_ppm)),
        |j AS (SELECT exp.digit, CAST(coalesce(c.n, 0) AS BIGINT) AS n,
        |    CAST(expected_ppm AS BIGINT) AS expected_ppm
        |  FROM exp LEFT JOIN c USING (digit)),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM j)
        |SELECT digit, n,
        |  CASE WHEN nn > 0 THEN (n * 1000000) // nn END AS actual_ppm,
        |  expected_ppm,
        |  CAST(abs(CAST(n AS HUGEINT) * 1000000 - CAST(nn AS HUGEINT) * expected_ppm) AS BIGINT) AS dev_num
        |FROM j CROSS JOIN t ORDER BY digit""".stripMargin,
    // grouped Poisson bootstrap: same per-(doc, b) draw, group roll-up
    "q182_bootstrap_by_source" ->
      """WITH x AS (SELECT source, doc_id, n_chars, b
        |  FROM documents CROSS JOIN (SELECT unnest(range(0, 16)) AS b)
        |  WHERE n_chars IS NOT NULL),
        |u AS (SELECT source, b, n_chars, list_reduce(list_transform(range(1, 16), i ->
        |    CAST(strpos('0123456789abcdef', substring(
        |      md5(CAST(doc_id AS VARCHAR) || chr(1) || CAST(b AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
        |    (acc, v) -> acc * 16 + v) / 1152921504606846976.0 AS u
        |  FROM x),
        |w AS (SELECT source, b, n_chars, CASE
        |    WHEN u < 0.36787944117144233 THEN 0
        |    WHEN u < 0.7357588823428847 THEN 1
        |    WHEN u < 0.9196986029286058 THEN 2
        |    WHEN u < 0.9810118431238463 THEN 3
        |    WHEN u < 0.9963401531726563 THEN 4
        |    WHEN u < 0.9994058151824183 THEN 5
        |    WHEN u < 0.999916758850712 THEN 6
        |    WHEN u < 0.9999897508033253 THEN 7
        |    WHEN u < 0.999998874797402 THEN 8
        |    WHEN u < 0.9999998885745216 THEN 9
        |    ELSE 10 END AS w
        |  FROM u)
        |SELECT source, CAST(b AS INTEGER) AS b,
        |  CAST(sum(w) AS BIGINT) AS n_drawn,
        |  CAST(sum(CAST(w AS HUGEINT) * n_chars) AS BIGINT) AS sum_v,
        |  CASE WHEN sum(w) > 0 THEN
        |    CAST(sum(CAST(w AS HUGEINT) * n_chars) AS DOUBLE) / CAST(sum(w) AS DOUBLE) END AS mean
        |FROM w GROUP BY source, b ORDER BY source, b""".stripMargin,
    // global recoding: the oracle re-checks every ladder rung's min
    // group size, picks the first passing level, re-groups
    "q183_generalize" ->
      """WITH m0 AS (SELECT min(cnt) AS m FROM (SELECT count(*) AS cnt FROM customer
        |    GROUP BY c_nationkey, CAST(floor(c_acctbal / 100) AS BIGINT))),
        |m1 AS (SELECT min(cnt) AS m FROM (SELECT count(*) AS cnt FROM customer
        |    GROUP BY c_nationkey, CAST(floor(c_acctbal / 1000) AS BIGINT))),
        |m2 AS (SELECT min(cnt) AS m FROM (SELECT count(*) AS cnt FROM customer
        |    GROUP BY c_nationkey, CAST(floor(c_acctbal / 10000) AS BIGINT))),
        |lvl AS (SELECT CASE WHEN coalesce((SELECT m FROM m0), 9223372036854775807) >= 5 THEN 0
        |    WHEN coalesce((SELECT m FROM m1), 9223372036854775807) >= 5 THEN 1
        |    WHEN coalesce((SELECT m FROM m2), 9223372036854775807) >= 5 THEN 2 ELSE 3 END AS lv),
        |g AS (
        |  SELECT c_nationkey, CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_bucket, 0 AS gen_level
        |    FROM customer WHERE (SELECT lv FROM lvl) = 0
        |  UNION ALL
        |  SELECT c_nationkey, CAST(floor(c_acctbal / 1000) AS BIGINT), 1
        |    FROM customer WHERE (SELECT lv FROM lvl) = 1
        |  UNION ALL
        |  SELECT c_nationkey, CAST(floor(c_acctbal / 10000) AS BIGINT), 2
        |    FROM customer WHERE (SELECT lv FROM lvl) = 2
        |  UNION ALL
        |  SELECT c_nationkey, CAST(NULL AS BIGINT), 3
        |    FROM customer WHERE (SELECT lv FROM lvl) = 3)
        |SELECT c_nationkey, bal_bucket, CAST(gen_level AS INTEGER) AS gen_level,
        |  count(*) AS cnt
        |FROM g GROUP BY 1, 2, 3 ORDER BY c_nationkey, bal_bucket""".stripMargin,
    // Flesch: three regexp counts + the pinned-coefficient IEEE formula
    "q184_readability" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_words,
        |  CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS n_sentences,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables,
        |  CASE WHEN len(regexp_split_to_array(trim(lower(text)), '\s+')) > 0 THEN
        |    206.835
        |    - 1.015 * (CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS DOUBLE)
        |        / CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS DOUBLE))
        |    - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)
        |        / CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS DOUBLE)) END AS flesch
        |FROM documents WHERE text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,
    // all-pairs Pearson from one HUGEINT moments pass, listwise NULLs
    "q185_correlation_matrix" ->
      """WITH s AS (SELECT l_returnflag,
        |    CAST(round(l_quantity * 100) AS HUGEINT) AS qty_c,
        |    CAST(round(l_extendedprice * 100) AS HUGEINT) AS price_c,
        |    CAST(round(l_discount * 1000) AS HUGEINT) AS disc_m
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
        |m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    sum(qty_c) AS sq, sum(price_c) AS sp, sum(disc_m) AS sd,
        |    sum(qty_c * qty_c) AS sqq, sum(price_c * price_c) AS spp,
        |    sum(disc_m * disc_m) AS sdd,
        |    sum(qty_c * price_c) AS sqp, sum(qty_c * disc_m) AS sqd,
        |    sum(price_c * disc_m) AS spd
        |  FROM s GROUP BY 1),
        |p AS (
        |  SELECT l_returnflag, 'qty_c' AS col_x, 'price_c' AS col_y, n,
        |    CAST(n AS HUGEINT) * sqp - sq * sp AS num,
        |    CAST(n AS HUGEINT) * sqq - sq * sq AS dx,
        |    CAST(n AS HUGEINT) * spp - sp * sp AS dy FROM m
        |  UNION ALL
        |  SELECT l_returnflag, 'qty_c', 'disc_m', n,
        |    CAST(n AS HUGEINT) * sqd - sq * sd,
        |    CAST(n AS HUGEINT) * sqq - sq * sq,
        |    CAST(n AS HUGEINT) * sdd - sd * sd FROM m
        |  UNION ALL
        |  SELECT l_returnflag, 'price_c', 'disc_m', n,
        |    CAST(n AS HUGEINT) * spd - sp * sd,
        |    CAST(n AS HUGEINT) * spp - sp * sp,
        |    CAST(n AS HUGEINT) * sdd - sd * sd FROM m)
        |SELECT l_returnflag, col_x, col_y, n,
        |  CASE WHEN dx > 0 AND dy > 0 THEN
        |    greatest(-1.0, least(1.0, CAST(num AS DOUBLE) /
        |      (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE))))) END AS r
        |FROM p ORDER BY l_returnflag, col_x, col_y""".stripMargin,
    // sketch-path Spearman: replay the bottom-k row-identity cut, the
    // sample's doubled average-tie ranks + moments (rho_est), AND the
    // full-corpus exact rho (rho_exact) — the q154 honesty chain
    "q191_spearman_sketch" ->
      """WITH li AS (SELECT l_returnflag,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS x,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
        |    md5(CAST(l_orderkey AS VARCHAR) || chr(1) || CAST(l_linenumber AS VARCHAR)) AS h
        |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |sk AS (SELECT l_returnflag, x, y FROM (
        |    SELECT l_returnflag, x, y,
        |      row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
        |    FROM li) WHERE rn <= 200),
        |rs AS (SELECT l_returnflag,
        |    CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY x)
        |      + count(*) OVER (PARTITION BY l_returnflag, x) - 1 AS HUGEINT) AS rx2,
        |    CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY y)
        |      + count(*) OVER (PARTITION BY l_returnflag, y) - 1 AS HUGEINT) AS ry2
        |  FROM sk),
        |ms AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    sum(rx2) AS sx, sum(ry2) AS sy, sum(rx2 * ry2) AS sxy,
        |    sum(rx2 * rx2) AS sxx, sum(ry2 * ry2) AS syy
        |  FROM rs GROUP BY 1),
        |rf AS (SELECT l_returnflag,
        |    CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY x)
        |      + count(*) OVER (PARTITION BY l_returnflag, x) - 1 AS HUGEINT) AS rx2,
        |    CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY y)
        |      + count(*) OVER (PARTITION BY l_returnflag, y) - 1 AS HUGEINT) AS ry2
        |  FROM li),
        |mf AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    sum(rx2) AS sx, sum(ry2) AS sy, sum(rx2 * ry2) AS sxy,
        |    sum(rx2 * rx2) AS sxx, sum(ry2 * ry2) AS syy
        |  FROM rf GROUP BY 1)
        |SELECT ms.l_returnflag, ms.n AS n_sample,
        |  CASE WHEN CAST(ms.n AS HUGEINT) * ms.sxx - ms.sx * ms.sx > 0
        |        AND CAST(ms.n AS HUGEINT) * ms.syy - ms.sy * ms.sy > 0 THEN
        |    greatest(-1.0, least(1.0,
        |      CAST(CAST(ms.n AS HUGEINT) * ms.sxy - ms.sx * ms.sy AS DOUBLE) /
        |        (sqrt(CAST(CAST(ms.n AS HUGEINT) * ms.sxx - ms.sx * ms.sx AS DOUBLE)) *
        |         sqrt(CAST(CAST(ms.n AS HUGEINT) * ms.syy - ms.sy * ms.sy AS DOUBLE))))) END AS rho_est,
        |  CASE WHEN CAST(mf.n AS HUGEINT) * mf.sxx - mf.sx * mf.sx > 0
        |        AND CAST(mf.n AS HUGEINT) * mf.syy - mf.sy * mf.sy > 0 THEN
        |    greatest(-1.0, least(1.0,
        |      CAST(CAST(mf.n AS HUGEINT) * mf.sxy - mf.sx * mf.sy AS DOUBLE) /
        |        (sqrt(CAST(CAST(mf.n AS HUGEINT) * mf.sxx - mf.sx * mf.sx AS DOUBLE)) *
        |         sqrt(CAST(CAST(mf.n AS HUGEINT) * mf.syy - mf.sy * mf.sy AS DOUBLE))))) END AS rho_exact
        |FROM ms JOIN mf ON ms.l_returnflag = mf.l_returnflag
        |ORDER BY 1""".stripMargin,
    // Spearman matrix: every column re-ranked (doubled average ties),
    // then the q185 moments/pair replay over the ranks
    "q192_spearman_matrix" ->
      """WITH s AS (SELECT l_returnflag,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
        |    CAST(round(l_discount * 1000) AS BIGINT) AS disc_m
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
        |r AS (SELECT l_returnflag,
        |    CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY qty_c)
        |      + count(*) OVER (PARTITION BY l_returnflag, qty_c) - 1 AS HUGEINT) AS rq,
        |    CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY price_c)
        |      + count(*) OVER (PARTITION BY l_returnflag, price_c) - 1 AS HUGEINT) AS rp,
        |    CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY disc_m)
        |      + count(*) OVER (PARTITION BY l_returnflag, disc_m) - 1 AS HUGEINT) AS rd
        |  FROM s),
        |m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    sum(rq) AS sq, sum(rp) AS sp, sum(rd) AS sd,
        |    sum(rq * rq) AS sqq, sum(rp * rp) AS spp, sum(rd * rd) AS sdd,
        |    sum(rq * rp) AS sqp, sum(rq * rd) AS sqd, sum(rp * rd) AS spd
        |  FROM r GROUP BY 1),
        |p AS (
        |  SELECT l_returnflag, 'qty_c' AS col_x, 'price_c' AS col_y, n,
        |    CAST(n AS HUGEINT) * sqp - sq * sp AS num,
        |    CAST(n AS HUGEINT) * sqq - sq * sq AS dx,
        |    CAST(n AS HUGEINT) * spp - sp * sp AS dy FROM m
        |  UNION ALL
        |  SELECT l_returnflag, 'qty_c', 'disc_m', n,
        |    CAST(n AS HUGEINT) * sqd - sq * sd,
        |    CAST(n AS HUGEINT) * sqq - sq * sq,
        |    CAST(n AS HUGEINT) * sdd - sd * sd FROM m
        |  UNION ALL
        |  SELECT l_returnflag, 'price_c', 'disc_m', n,
        |    CAST(n AS HUGEINT) * spd - sp * sd,
        |    CAST(n AS HUGEINT) * spp - sp * sp,
        |    CAST(n AS HUGEINT) * sdd - sd * sd FROM m)
        |SELECT l_returnflag, col_x, col_y, n,
        |  CASE WHEN dx > 0 AND dy > 0 THEN
        |    greatest(-1.0, least(1.0, CAST(num AS DOUBLE) /
        |      (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE))))) END AS rho
        |FROM p ORDER BY l_returnflag, col_x, col_y""".stripMargin,
    // correlation-matrix drift: both halves' exact moments + clamped r,
    // drift = one IEEE subtraction of two bit-identical doubles
    "q193_correlation_drift" ->
      """WITH s AS (SELECT l_orderkey % 2 AS half, l_returnflag,
        |    CAST(round(l_quantity * 100) AS HUGEINT) AS qty_c,
        |    CAST(round(l_extendedprice * 100) AS HUGEINT) AS price_c,
        |    CAST(round(l_discount * 1000) AS HUGEINT) AS disc_m
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
        |m AS (SELECT half, l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    sum(qty_c) AS sq, sum(price_c) AS sp, sum(disc_m) AS sd,
        |    sum(qty_c * qty_c) AS sqq, sum(price_c * price_c) AS spp,
        |    sum(disc_m * disc_m) AS sdd,
        |    sum(qty_c * price_c) AS sqp, sum(qty_c * disc_m) AS sqd,
        |    sum(price_c * disc_m) AS spd
        |  FROM s GROUP BY 1, 2),
        |p AS (
        |  SELECT half, l_returnflag, 'qty_c' AS col_x, 'price_c' AS col_y, n,
        |    CAST(n AS HUGEINT) * sqp - sq * sp AS num,
        |    CAST(n AS HUGEINT) * sqq - sq * sq AS dx,
        |    CAST(n AS HUGEINT) * spp - sp * sp AS dy FROM m
        |  UNION ALL
        |  SELECT half, l_returnflag, 'qty_c', 'disc_m', n,
        |    CAST(n AS HUGEINT) * sqd - sq * sd,
        |    CAST(n AS HUGEINT) * sqq - sq * sq,
        |    CAST(n AS HUGEINT) * sdd - sd * sd FROM m
        |  UNION ALL
        |  SELECT half, l_returnflag, 'price_c', 'disc_m', n,
        |    CAST(n AS HUGEINT) * spd - sp * sd,
        |    CAST(n AS HUGEINT) * spp - sp * sp,
        |    CAST(n AS HUGEINT) * sdd - sd * sd FROM m),
        |r AS (SELECT half, l_returnflag, col_x, col_y, n,
        |  CASE WHEN dx > 0 AND dy > 0 THEN
        |    greatest(-1.0, least(1.0, CAST(num AS DOUBLE) /
        |      (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE))))) END AS r
        |  FROM p)
        |SELECT coalesce(a.l_returnflag, b.l_returnflag) AS l_returnflag,
        |  coalesce(a.col_x, b.col_x) AS col_x,
        |  coalesce(a.col_y, b.col_y) AS col_y,
        |  a.n AS n_base, b.n AS n_cur, a.r AS r_base, b.r AS r_cur,
        |  b.r - a.r AS drift
        |FROM (SELECT * FROM r WHERE half = 0) a
        |FULL JOIN (SELECT * FROM r WHERE half = 1) b
        |  ON a.l_returnflag = b.l_returnflag AND a.col_x = b.col_x AND a.col_y = b.col_y
        |ORDER BY l_returnflag, col_x, col_y""".stripMargin,
    // RBO: both retrievers' top-20 replayed (the q100 CTEs), pinned
    // 0.9^d weight table (RankEval.RboPPow verbatim), fixed-order
    // prepend-0 left fold over the d-sorted terms — bit-identical to
    // Spark's aggregate(sort_array(...)) fold
    "q199_rbo" ->
      s"""WITH $Bm25Ctes,
        |lexr AS (SELECT doc_id, rank FROM (
        |  SELECT doc_id, row_number() OVER (ORDER BY CAST(score AS DECIMAL(18,6)) DESC, doc_id) AS rank
        |  FROM sc WHERE CAST(score AS DECIMAL(18,6)) > 0) WHERE rank <= 20),
        |qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |c AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        |ds AS (SELECT id, list_cosine_similarity(v, qv) AS score FROM c, qv WHERE id <> 0),
        |denr AS (SELECT id AS doc_id, rank FROM (
        |  SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank FROM ds) WHERE rank <= 20),
        |mm AS (SELECT greatest(l.rank, d.rank) AS m
        |  FROM lexr l JOIN denr d ON l.doc_id = d.doc_id),
        |w(d, wt) AS (VALUES
        |  (1, 1.0e0), (2, 0.9e0), (3, 0.81e0), (4, 0.7290000000000001e0),
        |  (5, 0.6561000000000001e0), (6, 0.5904900000000002e0),
        |  (7, 0.5314410000000002e0), (8, 0.47829690000000014e0),
        |  (9, 0.43046721000000016e0), (10, 0.38742048900000015e0),
        |  (11, 0.34867844010000015e0), (12, 0.31381059609000017e0),
        |  (13, 0.28242953648100017e0), (14, 0.25418658283290013e0),
        |  (15, 0.22876792454961012e0), (16, 0.2058911320946491e0),
        |  (17, 0.1853020188851842e0), (18, 0.16677181699666577e0),
        |  (19, 0.1500946352969992e0), (20, 0.13508517176729928e0)),
        |rx AS (SELECT w.d, w.wt, CAST(count(mm.m) AS BIGINT) AS xd
        |  FROM w LEFT JOIN mm ON mm.m <= w.d GROUP BY 1, 2),
        |rt AS (SELECT d, xd, wt * (CAST(xd AS DOUBLE) / CAST(d AS DOUBLE)) AS term FROM rx),
        |f AS (SELECT
        |    list_reduce(
        |      list_prepend(0.0,
        |        list_transform(list_sort(list(struct_pack(d := d, term := term))),
        |          s -> s.term)),
        |      (acc, e2) -> acc + e2) AS ssum,
        |    max(CASE WHEN d = 20 THEN xd END) AS overlap_k
        |  FROM rt)
        |SELECT 20 AS k, overlap_k, 0.1e0 * ssum AS rbo_base,
        |  0.1e0 * ssum + 0.12157665459056936e0 * (CAST(overlap_k AS DOUBLE) / 20.0e0) AS rbo_ext
        |FROM f""".stripMargin,
    // spearman drift: both halves re-ranked WITHIN their snapshot, then
    // the q193 moments/rho/subtraction replay
    "q198_spearman_drift" ->
      """WITH s AS (SELECT l_orderkey % 2 AS half, l_returnflag,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
        |    CAST(round(l_discount * 1000) AS BIGINT) AS disc_m
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
        |r AS (SELECT half, l_returnflag,
        |    CAST(2 * rank() OVER (PARTITION BY half, l_returnflag ORDER BY qty_c)
        |      + count(*) OVER (PARTITION BY half, l_returnflag, qty_c) - 1 AS HUGEINT) AS rq,
        |    CAST(2 * rank() OVER (PARTITION BY half, l_returnflag ORDER BY price_c)
        |      + count(*) OVER (PARTITION BY half, l_returnflag, price_c) - 1 AS HUGEINT) AS rp,
        |    CAST(2 * rank() OVER (PARTITION BY half, l_returnflag ORDER BY disc_m)
        |      + count(*) OVER (PARTITION BY half, l_returnflag, disc_m) - 1 AS HUGEINT) AS rd
        |  FROM s),
        |m AS (SELECT half, l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    sum(rq) AS sq, sum(rp) AS sp, sum(rd) AS sd,
        |    sum(rq * rq) AS sqq, sum(rp * rp) AS spp, sum(rd * rd) AS sdd,
        |    sum(rq * rp) AS sqp, sum(rq * rd) AS sqd, sum(rp * rd) AS spd
        |  FROM r GROUP BY 1, 2),
        |p AS (
        |  SELECT half, l_returnflag, 'qty_c' AS col_x, 'price_c' AS col_y, n,
        |    CAST(n AS HUGEINT) * sqp - sq * sp AS num,
        |    CAST(n AS HUGEINT) * sqq - sq * sq AS dx,
        |    CAST(n AS HUGEINT) * spp - sp * sp AS dy FROM m
        |  UNION ALL
        |  SELECT half, l_returnflag, 'qty_c', 'disc_m', n,
        |    CAST(n AS HUGEINT) * sqd - sq * sd,
        |    CAST(n AS HUGEINT) * sqq - sq * sq,
        |    CAST(n AS HUGEINT) * sdd - sd * sd FROM m
        |  UNION ALL
        |  SELECT half, l_returnflag, 'price_c', 'disc_m', n,
        |    CAST(n AS HUGEINT) * spd - sp * sd,
        |    CAST(n AS HUGEINT) * spp - sp * sp,
        |    CAST(n AS HUGEINT) * sdd - sd * sd FROM m),
        |rr AS (SELECT half, l_returnflag, col_x, col_y, n,
        |  CASE WHEN dx > 0 AND dy > 0 THEN
        |    greatest(-1.0, least(1.0, CAST(num AS DOUBLE) /
        |      (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE))))) END AS rho
        |  FROM p)
        |SELECT coalesce(a.l_returnflag, b.l_returnflag) AS l_returnflag,
        |  coalesce(a.col_x, b.col_x) AS col_x,
        |  coalesce(a.col_y, b.col_y) AS col_y,
        |  a.n AS n_base, b.n AS n_cur,
        |  round(a.rho, 9) AS rho_base, round(b.rho, 9) AS rho_cur,
        |  round(b.rho - a.rho, 9) AS drift
        |FROM (SELECT * FROM rr WHERE half = 0) a
        |FULL JOIN (SELECT * FROM rr WHERE half = 1) b
        |  ON a.l_returnflag = b.l_returnflag AND a.col_x = b.col_x AND a.col_y = b.col_y
        |ORDER BY l_returnflag, col_x, col_y""".stripMargin,
    // blocked edit-distance verify: the q173 rank self-join + integer
    // Levenshtein (definitionally identical in both engines)
    "q195_edit_distance_pairs" ->
      """WITH b AS (SELECT doc_id AS id,
        |    lang || ':' || substring(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 24) AS k
        |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
        |r AS (SELECT id, k, row_number() OVER (ORDER BY k, id) AS rank FROM b),
        |p AS (SELECT a.id AS id_a, c.id AS id_b, a.k AS key_a, c.k AS key_b
        |  FROM r a JOIN r c ON c.rank > a.rank AND c.rank < a.rank + 4)
        |SELECT id_a, id_b, key_a, key_b,
        |  CAST(levenshtein(key_a, key_b) AS INT) AS dist
        |FROM p WHERE levenshtein(key_a, key_b) <= 6
        |ORDER BY id_a, id_b""".stripMargin,
    // Simpson diversity: exact pair-count numerator, lambda/diversity
    // one pinned division each
    "q196_simpson_diversity" ->
      """WITH c AS (SELECT lang, CAST(source AS VARCHAR) AS cat, count(*) AS n
        |  FROM documents GROUP BY 1, 2),
        |g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_cats,
        |    CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(CAST(n AS HUGEINT) * (n - 1)) AS HUGEINT) AS num
        |  FROM c GROUP BY 1)
        |SELECT lang, n_cats, n, CAST(num AS DOUBLE) AS simpson_num,
        |  CASE WHEN n > 1 THEN
        |    CAST(num AS DOUBLE) / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE) END AS lambda,
        |  1.0 - CASE WHEN n > 1 THEN
        |    CAST(num AS DOUBLE) / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE) END AS diversity
        |FROM g ORDER BY lang""".stripMargin,
    // batch-admission leakage: the rebuild's window pairs restricted to
    // >=1 batch side (the SNM incremental law) through the q178 split
    // matrix
    "q194_split_leakage_fold" ->
      """WITH b AS (SELECT doc_id AS id, doc_id % 7 = 3 AS is_batch,
        |    lang || ':' || substring(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 24) AS k
        |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
        |r AS (SELECT id, k, is_batch, row_number() OVER (ORDER BY k, id) AS rank FROM b),
        |p AS (SELECT a.id AS id_a, c.id AS id_b
        |  FROM r a JOIN r c ON c.rank > a.rank AND c.rank < a.rank + 4
        |  WHERE a.is_batch OR c.is_batch),
        |sp AS (SELECT doc_id AS id, CASE
        |  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) < 'c00000000000000' THEN 'train'
        |  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) < 'e00000000000000' THEN 'val'
        |  ELSE 'test' END AS split FROM documents),
        |j AS (SELECT least(coalesce(sa.split, '(unassigned)'), coalesce(sb.split, '(unassigned)')) AS split_lo,
        |    greatest(coalesce(sa.split, '(unassigned)'), coalesce(sb.split, '(unassigned)')) AS split_hi
        |  FROM p LEFT JOIN sp sa ON p.id_a = sa.id LEFT JOIN sp sb ON p.id_b = sb.id)
        |SELECT split_lo, split_hi, count(*) AS n_pairs
        |FROM j GROUP BY 1, 2 ORDER BY split_lo, split_hi""".stripMargin,
    // Gini: rank-weighted exact numerator, one terminal division
    "q186_gini" ->
      """WITH r AS (SELECT source, n_chars, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM documents WHERE n_chars IS NOT NULL),
        |g AS (SELECT source, CAST(max(n) AS BIGINT) AS n,
        |    CAST(sum(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS sum_v,
        |    CAST(sum((2 * CAST(rn AS HUGEINT) - n - 1) * n_chars) AS HUGEINT) AS gini_num
        |  FROM r GROUP BY 1)
        |SELECT source, n, CAST(sum_v AS BIGINT) AS sum_v,
        |  CAST(gini_num AS BIGINT) AS gini_num,
        |  CASE WHEN sum_v > 0 THEN
        |    CAST(gini_num AS DOUBLE) / CAST(CAST(n AS HUGEINT) * sum_v AS DOUBLE) END AS gini
        |FROM g ORDER BY source""".stripMargin,
    // Spearman: doubled average-tie ranks (2*rank + tiecount - 1), then
    // the exact-moment Pearson with the same clamp
    "q187_spearman" ->
      """WITH s AS (SELECT l_returnflag,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS x,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |r AS (SELECT l_returnflag,
        |    CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY x)
        |      + count(*) OVER (PARTITION BY l_returnflag, x) - 1 AS HUGEINT) AS rx2,
        |    CAST(2 * rank() OVER (PARTITION BY l_returnflag ORDER BY y)
        |      + count(*) OVER (PARTITION BY l_returnflag, y) - 1 AS HUGEINT) AS ry2
        |  FROM s),
        |m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    sum(rx2) AS sx, sum(ry2) AS sy, sum(rx2 * ry2) AS sxy,
        |    sum(rx2 * rx2) AS sxx, sum(ry2 * ry2) AS syy
        |  FROM r GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CAST(sx AS BIGINT) AS sum_rx2, CAST(sy AS BIGINT) AS sum_ry2,
        |  CASE WHEN CAST(n AS HUGEINT) * sxx - sx * sx > 0
        |        AND CAST(n AS HUGEINT) * syy - sy * sy > 0 THEN
        |    greatest(-1.0, least(1.0,
        |      CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) /
        |        (sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)) *
        |         sqrt(CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE))))) END AS rho
        |FROM m ORDER BY l_returnflag""".stripMargin,
    // hierarchical graph-ANN: brute truth + metric joins replayed over
    // the layered-descent fixture (the q166/q167 replayability line)
    "q174_graph_ann_layered" ->
      """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT id AS query_id, v AS qv FROM v WHERE id < 10),
        |bs AS (SELECT q.query_id, c.id, list_cosine_similarity(c.v, q.qv) AS score
        |  FROM v c, q WHERE c.id <> q.query_id),
        |tr AS (SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM bs),
        |res AS (SELECT query_id, neighbor_id, rank
        |  FROM read_parquet('__GRAFT_FIXTURE:nsw_layered_topk__/*.parquet') WHERE rank <= 5),
        |tru AS (SELECT query_id, id AS neighbor_id FROM tr WHERE rank <= 5),
        |j AS (SELECT res.query_id, res.rank,
        |    CASE WHEN tru.neighbor_id IS NOT NULL THEN 1 END AS hit
        |  FROM res LEFT JOIN tru ON res.query_id = tru.query_id AND res.neighbor_id = tru.neighbor_id),
        |pq AS (SELECT query_id, count(*) AS n_results,
        |    CAST(sum(coalesce(hit, 0)) AS BIGINT) AS hits_at_k,
        |    CAST(min(CASE WHEN hit = 1 THEN rank END) AS BIGINT) AS first_hit_rank
        |  FROM j GROUP BY 1),
        |tc AS (SELECT query_id, count(*) AS n_truth FROM tru GROUP BY 1)
        |SELECT coalesce(tc.query_id, pq.query_id) AS query_id,
        |  CAST(coalesce(pq.n_results, 0) AS BIGINT) AS n_results,
        |  CAST(coalesce(tc.n_truth, 0) AS BIGINT) AS n_truth,
        |  CAST(coalesce(pq.hits_at_k, 0) AS BIGINT) AS hits_at_k,
        |  pq.first_hit_rank
        |FROM tc FULL OUTER JOIN pq ON tc.query_id = pq.query_id
        |ORDER BY 1""".stripMargin,
    // categorical association cells: exact counts/marginals, chi-square
    // numerator as digit string, MI term nano-scaled before any sum
    "q200_association" ->
      """WITH c AS (SELECT CAST(lang AS VARCHAR) AS x, CAST(source AS VARCHAR) AS y,
        |    count(*) AS n FROM documents GROUP BY 1, 2),
        |m AS (SELECT x, y, CAST(n AS BIGINT) AS n,
        |    CAST(sum(n) OVER (PARTITION BY x) AS BIGINT) AS row_tot,
        |    CAST(sum(n) OVER (PARTITION BY y) AS BIGINT) AS col_tot,
        |    CAST(sum(n) OVER () AS BIGINT) AS n_tot FROM c),
        |g AS (SELECT x, y, n, row_tot, col_tot, n_tot,
        |    CAST(n AS HUGEINT) * n_tot - CAST(row_tot AS HUGEINT) * col_tot AS gap FROM m)
        |SELECT x, y, n, row_tot, col_tot, n_tot,
        |  CAST(gap * gap AS VARCHAR) AS chi_num,
        |  CAST(round((CAST(n AS DOUBLE) / n_tot) *
        |    ln(CAST(n AS DOUBLE) * n_tot / (CAST(row_tot AS DOUBLE) * col_tot)) * 1e9) AS BIGINT) AS mi_term_n9
        |FROM g ORDER BY x, y""".stripMargin,
    // per-source MI between language and length bucket: nano-int sum,
    // one pinned division; normalized form at 9 decimals
    "q201_mutual_information" ->
      """WITH d AS (SELECT source, CAST(lang AS VARCHAR) AS x,
        |    CAST(n_chars // 512 AS VARCHAR) AS y FROM documents),
        |c AS (SELECT source, x, y, count(*) AS n FROM d GROUP BY 1, 2, 3),
        |m AS (SELECT source, x, y, CAST(n AS BIGINT) AS n,
        |    CAST(sum(n) OVER (PARTITION BY source, x) AS BIGINT) AS row_tot,
        |    CAST(sum(n) OVER (PARTITION BY source, y) AS BIGINT) AS col_tot,
        |    CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS n_tot FROM c),
        |t AS (SELECT source, x, y, n, n_tot,
        |    CAST(round((CAST(n AS DOUBLE) / n_tot) *
        |      ln(CAST(n AS DOUBLE) * n_tot / (CAST(row_tot AS DOUBLE) * col_tot)) * 1e9) AS BIGINT) AS mi9
        |  FROM m),
        |g AS (SELECT source, CAST(count(DISTINCT x) AS BIGINT) AS n_x,
        |    CAST(count(DISTINCT y) AS BIGINT) AS n_y,
        |    CAST(max(n_tot) AS BIGINT) AS n, CAST(sum(mi9) AS BIGINT) AS s9
        |  FROM t GROUP BY 1)
        |SELECT source, n_x, n_y, n, CAST(s9 AS DOUBLE) / 1e9 AS mi,
        |  CASE WHEN least(n_x, n_y) > 1 THEN
        |    round((CAST(s9 AS DOUBLE) / 1e9) / ln(CAST(least(n_x, n_y) AS DOUBLE)), 9) END AS mi_norm
        |FROM g ORDER BY source""".stripMargin,
    // per-language token entropy: -p ln p nano-scaled per term, integer
    // sum, one division
    "q202_token_entropy" ->
      """WITH t AS (SELECT lang, unnest(regexp_split_to_array(lower(text), '\s+')) AS cat
        |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
        |c AS (SELECT lang, cat, count(*) AS n FROM t WHERE cat <> '' GROUP BY 1, 2),
        |w AS (SELECT lang, n, CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS tot FROM c),
        |h AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_cats, CAST(max(tot) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(-(CAST(n AS DOUBLE) / tot) *
        |      ln(CAST(n AS DOUBLE) / tot) * 1e9) AS BIGINT)) AS BIGINT) AS s9
        |  FROM w GROUP BY 1)
        |SELECT lang, n_cats, n, CAST(s9 AS DOUBLE) / 1e9 AS entropy,
        |  CASE WHEN n_cats > 1 THEN
        |    round((CAST(s9 AS DOUBLE) / 1e9) / ln(CAST(n_cats AS DOUBLE)), 9) END AS entropy_norm
        |FROM h ORDER BY lang""".stripMargin,
    // Jensen-Shannon token drift: per-token nano term, 0*ln 0 = 0 on
    // one-sided values, NULL-free after the token filter
    "q203_js_divergence" ->
      """WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS token
        |  FROM documents WHERE text IS NOT NULL),
        |tk AS (SELECT doc_id, token FROM t WHERE token <> ''),
        |hb AS (SELECT token AS vb, count(*) AS n_base FROM tk WHERE doc_id % 2 = 0 GROUP BY 1),
        |hc AS (SELECT token AS vc, count(*) AS n_cur FROM tk WHERE doc_id % 2 = 1 GROUP BY 1),
        |j AS (SELECT coalesce(vb, vc) AS value,
        |    CAST(coalesce(n_base, 0) AS BIGINT) AS n_base,
        |    CAST(coalesce(n_cur, 0) AS BIGINT) AS n_cur
        |  FROM hb FULL JOIN hc ON vb = vc),
        |w AS (SELECT value, n_base, n_cur,
        |    CAST(sum(n_base) OVER () AS BIGINT) AS tb,
        |    CAST(sum(n_cur) OVER () AS BIGINT) AS tc FROM j)
        |SELECT value, n_base, n_cur,
        |  CAST(round((CASE WHEN n_base > 0 THEN
        |      (CAST(n_base AS DOUBLE) / tb) * ln((CAST(n_base AS DOUBLE) / tb) /
        |        ((CAST(n_base AS DOUBLE) / tb + CAST(n_cur AS DOUBLE) / tc) / 2)) / 2
        |    ELSE 0 END +
        |    CASE WHEN n_cur > 0 THEN
        |      (CAST(n_cur AS DOUBLE) / tc) * ln((CAST(n_cur AS DOUBLE) / tc) /
        |        ((CAST(n_base AS DOUBLE) / tb + CAST(n_cur AS DOUBLE) / tc) / 2)) / 2
        |    ELSE 0 END) * 1e9) AS BIGINT) AS js_term_n9
        |FROM w ORDER BY value""".stripMargin,
    // Zipf OLS over top-1000 tokens: nano-int normal equations in
    // HUGEINT, slope/intercept one division each
    "q204_zipf" ->
      """WITH t AS (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS token
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT token, count(*) AS cnt FROM t WHERE token <> '' GROUP BY 1),
        |top AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 1000),
        |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rank FROM top),
        |l AS (SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1e9) AS BIGINT) AS lr,
        |    CAST(round(ln(CAST(cnt AS DOUBLE)) * 1e9) AS BIGINT) AS lc FROM r),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_points,
        |    CAST(sum(CAST(lr AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(lc AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(lr AS HUGEINT) * lc) AS HUGEINT) AS sxy,
        |    CAST(sum(CAST(lr AS HUGEINT) * lr) AS HUGEINT) AS sxx FROM l),
        |f AS (SELECT n_points, sx, sy,
        |    CAST(n_points AS HUGEINT) * sxy - sx * sy AS num,
        |    CAST(n_points AS HUGEINT) * sxx - sx * sx AS den FROM s)
        |SELECT n_points, CAST(num AS VARCHAR) AS ols_num, CAST(den AS VARCHAR) AS ols_den,
        |  CASE WHEN den > 0 THEN round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 9) END AS slope,
        |  round((CAST(sy AS DOUBLE) -
        |    (CASE WHEN den > 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END) * CAST(sx AS DOUBLE)) /
        |    (CAST(n_points AS DOUBLE) * 1e9), 9) AS intercept
        |FROM f""".stripMargin,
    // Heaps checkpoints: all-integer prefix totals from first-occurrence
    // doc ids — lossless
    "q205_heaps" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |t AS (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS token FROM d),
        |tk AS (SELECT doc_id, token FROM t WHERE token <> ''),
        |fd AS (SELECT token, min(doc_id) AS first_doc FROM tk GROUP BY 1),
        |dt AS (SELECT doc_id, count(*) AS n_tok FROM tk GROUP BY 1),
        |mx AS (SELECT max(doc_id) AS m FROM d),
        |cks AS (SELECT (CAST(1 AS BIGINT) << k) AS ck
        |  FROM (SELECT unnest(generate_series(0, 62)) AS k), mx
        |  WHERE (CAST(1 AS BIGINT) << k) >= 64 AND (CAST(1 AS BIGINT) << k) <= m),
        |v AS (SELECT ck, CAST(count(*) AS BIGINT) AS vocab_cum
        |  FROM cks JOIN fd ON first_doc <= ck GROUP BY 1),
        |tt AS (SELECT ck, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS tokens_cum
        |  FROM cks JOIN dt ON doc_id <= ck GROUP BY 1)
        |SELECT tt.ck, tt.n_docs, tt.tokens_cum,
        |  CAST(coalesce(v.vocab_cum, 0) AS BIGINT) AS vocab_cum
        |FROM tt LEFT JOIN v ON tt.ck = v.ck ORDER BY tt.ck""".stripMargin,
    "q206_ewma" -> ewmaOracle,
    // exact Kendall tau-b from distinct-value cells: every pair class an
    // exact HUGEINT, tau one fixed dag at 9 decimals
    "q207_kendall" ->
      """WITH s AS (SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT) AS x,
        |    CAST(round(l_discount * 1000) AS BIGINT) AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
        |c AS (SELECT l_returnflag, x, y, count(*) AS n FROM s GROUP BY 1, 2, 3),
        |p AS (SELECT a.l_returnflag,
        |    CAST(sum(CASE WHEN a.x < b.x AND a.y < b.y THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS HUGEINT) AS c_pairs,
        |    CAST(sum(CASE WHEN a.x < b.x AND a.y > b.y THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS HUGEINT) AS d_pairs,
        |    CAST(sum(CASE WHEN a.x = b.x AND a.y < b.y THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS HUGEINT) AS t_x,
        |    CAST(sum(CASE WHEN a.x < b.x AND a.y = b.y THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS HUGEINT) AS t_y
        |  FROM c a JOIN c b ON a.l_returnflag = b.l_returnflag
        |    AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
        |  GROUP BY 1),
        |g AS (SELECT l_returnflag, CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(CAST(n AS HUGEINT) * (n - 1)) / 2 AS HUGEINT) AS t_xy FROM c GROUP BY 1)
        |SELECT g.l_returnflag, g.n,
        |  CAST(coalesce(p.c_pairs, 0) AS VARCHAR) AS c_pairs,
        |  CAST(coalesce(p.d_pairs, 0) AS VARCHAR) AS d_pairs,
        |  CAST(coalesce(p.t_x, 0) AS VARCHAR) AS t_x,
        |  CAST(coalesce(p.t_y, 0) AS VARCHAR) AS t_y,
        |  CAST(g.t_xy AS VARCHAR) AS t_xy,
        |  CASE WHEN coalesce(p.c_pairs, 0) + coalesce(p.d_pairs, 0) + coalesce(p.t_x, 0) > 0
        |      AND coalesce(p.c_pairs, 0) + coalesce(p.d_pairs, 0) + coalesce(p.t_y, 0) > 0 THEN
        |    round(CAST(coalesce(p.c_pairs, 0) - coalesce(p.d_pairs, 0) AS DOUBLE) /
        |      (sqrt(CAST(coalesce(p.c_pairs, 0) + coalesce(p.d_pairs, 0) + coalesce(p.t_x, 0) AS DOUBLE)) *
        |       sqrt(CAST(coalesce(p.c_pairs, 0) + coalesce(p.d_pairs, 0) + coalesce(p.t_y, 0) AS DOUBLE))), 9) END AS tau_b
        |FROM g LEFT JOIN p ON g.l_returnflag = p.l_returnflag
        |ORDER BY g.l_returnflag""".stripMargin,
    // Fellegi-Sunter over the q195 blocking: u from exact collision
    // counts (clamped), weights nano-scaled, decision an integer compare
    "q208_fellegi_sunter" ->
      """WITH b AS (SELECT doc_id AS id,
        |    lang || ':' || substring(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 24) AS k,
        |    CAST(lang AS VARCHAR) AS f_lang, CAST(n_chars // 256 AS VARCHAR) AS f_len,
        |    CAST(source AS VARCHAR) AS f_src
        |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
        |r AS (SELECT id, k, f_lang, f_len, f_src, row_number() OVER (ORDER BY k, id) AS rank
        |  FROM b WHERE k IS NOT NULL),
        |p AS (SELECT a.id AS id_a, c.id AS id_b,
        |    a.f_lang AS al, c.f_lang AS bl, a.f_len AS an, c.f_len AS bn,
        |    a.f_src AS asr, c.f_src AS bsr
        |  FROM r a JOIN r c ON c.rank > a.rank AND c.rank < a.rank + 4),
        |u1 AS (SELECT CAST(least(greatest(sum(CAST(c AS HUGEINT) * (c - 1)), 1),
        |      CAST(sum(c) AS HUGEINT) * (sum(c) - 1) - 1) AS HUGEINT) AS num,
        |    CAST(CAST(sum(c) AS HUGEINT) * (sum(c) - 1) AS HUGEINT) AS den
        |  FROM (SELECT count(*) AS c FROM b GROUP BY f_lang)),
        |u2 AS (SELECT CAST(least(greatest(sum(CAST(c AS HUGEINT) * (c - 1)), 1),
        |      CAST(sum(c) AS HUGEINT) * (sum(c) - 1) - 1) AS HUGEINT) AS num,
        |    CAST(CAST(sum(c) AS HUGEINT) * (sum(c) - 1) AS HUGEINT) AS den
        |  FROM (SELECT count(*) AS c FROM b GROUP BY f_len)),
        |u3 AS (SELECT CAST(least(greatest(sum(CAST(c AS HUGEINT) * (c - 1)), 1),
        |      CAST(sum(c) AS HUGEINT) * (sum(c) - 1) - 1) AS HUGEINT) AS num,
        |    CAST(CAST(sum(c) AS HUGEINT) * (sum(c) - 1) AS HUGEINT) AS den
        |  FROM (SELECT count(*) AS c FROM b GROUP BY f_src)),
        |w AS (SELECT
        |    CAST(round(ln(0.95 * CAST(u1.den AS DOUBLE) / CAST(u1.num AS DOUBLE)) * 1e9) AS BIGINT) AS wa1,
        |    CAST(round(ln((1.0 - 0.95) * CAST(u1.den AS DOUBLE) / CAST(u1.den - u1.num AS DOUBLE)) * 1e9) AS BIGINT) AS wd1,
        |    CAST(round(ln(0.95 * CAST(u2.den AS DOUBLE) / CAST(u2.num AS DOUBLE)) * 1e9) AS BIGINT) AS wa2,
        |    CAST(round(ln((1.0 - 0.95) * CAST(u2.den AS DOUBLE) / CAST(u2.den - u2.num AS DOUBLE)) * 1e9) AS BIGINT) AS wd2,
        |    CAST(round(ln(0.95 * CAST(u3.den AS DOUBLE) / CAST(u3.num AS DOUBLE)) * 1e9) AS BIGINT) AS wa3,
        |    CAST(round(ln((1.0 - 0.95) * CAST(u3.den AS DOUBLE) / CAST(u3.den - u3.num AS DOUBLE)) * 1e9) AS BIGINT) AS wd3
        |  FROM u1, u2, u3),
        |sc AS (SELECT id_a, id_b,
        |    (al IS NOT DISTINCT FROM bl) AS agree_lang,
        |    (an IS NOT DISTINCT FROM bn) AS agree_len_b,
        |    (asr IS NOT DISTINCT FROM bsr) AS agree_source,
        |    (CASE WHEN al IS NOT DISTINCT FROM bl THEN wa1 ELSE wd1 END +
        |     CASE WHEN an IS NOT DISTINCT FROM bn THEN wa2 ELSE wd2 END +
        |     CASE WHEN asr IS NOT DISTINCT FROM bsr THEN wa3 ELSE wd3 END) AS s9
        |  FROM p, w)
        |SELECT id_a, id_b, agree_lang, agree_len_b, agree_source,
        |  CAST(s9 AS DOUBLE) / 1e9 AS score,
        |  CASE WHEN s9 >= 4000000000 THEN 'link'
        |       WHEN s9 <= -4000000000 THEN 'non_link'
        |       ELSE 'possible' END AS decision
        |FROM sc ORDER BY id_a, id_b""".stripMargin,
    // association summary: chi2/V/MI/H/Theil U per group, every surface
    // a fixed dag over nano-int sums
    "q209_association_summary" ->
      """WITH d AS (SELECT source, CAST(lang AS VARCHAR) AS x,
        |    CAST(n_chars // 512 AS VARCHAR) AS y FROM documents),
        |c AS (SELECT source, x, y, count(*) AS n FROM d GROUP BY 1, 2, 3),
        |m AS (SELECT source, x, y, CAST(n AS BIGINT) AS n,
        |    CAST(sum(n) OVER (PARTITION BY source, x) AS BIGINT) AS row_tot,
        |    CAST(sum(n) OVER (PARTITION BY source, y) AS BIGINT) AS col_tot,
        |    CAST(sum(n) OVER (PARTITION BY source) AS BIGINT) AS n_tot FROM c),
        |base AS (SELECT source, CAST(count(DISTINCT x) AS BIGINT) AS n_x,
        |    CAST(count(DISTINCT y) AS BIGINT) AS n_y, CAST(max(n_tot) AS BIGINT) AS n,
        |    sum(CAST(round(CAST(n_tot AS DOUBLE) * n * n /
        |      (CAST(row_tot AS DOUBLE) * col_tot) * 1e9) AS HUGEINT)) AS chi9,
        |    CAST(sum(CAST(round((CAST(n AS DOUBLE) / n_tot) *
        |      ln(CAST(n AS DOUBLE) * n_tot / (CAST(row_tot AS DOUBLE) * col_tot)) * 1e9) AS BIGINT)) AS BIGINT) AS mi9
        |  FROM m GROUP BY 1),
        |hx AS (SELECT source, CAST(sum(CAST(round(-(CAST(row_tot AS DOUBLE) / n_tot) *
        |      ln(CAST(row_tot AS DOUBLE) / n_tot) * 1e9) AS BIGINT)) AS BIGINT) AS hx9
        |  FROM (SELECT DISTINCT source, x, row_tot, n_tot FROM m) GROUP BY 1),
        |hy AS (SELECT source, CAST(sum(CAST(round(-(CAST(col_tot AS DOUBLE) / n_tot) *
        |      ln(CAST(col_tot AS DOUBLE) / n_tot) * 1e9) AS BIGINT)) AS BIGINT) AS hy9
        |  FROM (SELECT DISTINCT source, y, col_tot, n_tot FROM m) GROUP BY 1)
        |SELECT b.source, n_x, n_y, n,
        |  round(CAST(chi9 AS DOUBLE) / 1e9 - n, 9) AS chi2,
        |  CASE WHEN least(n_x, n_y) > 1 AND n > 0 THEN
        |    round(sqrt(greatest(CAST(chi9 AS DOUBLE) / 1e9 - n, 0) /
        |      (CAST(n AS DOUBLE) * (least(n_x, n_y) - 1))), 9) END AS cramers_v,
        |  CAST(mi9 AS DOUBLE) / 1e9 AS mi,
        |  CAST(hx9 AS DOUBLE) / 1e9 AS h_x, CAST(hy9 AS DOUBLE) / 1e9 AS h_y,
        |  CASE WHEN hx9 > 0 THEN round(CAST(mi9 AS DOUBLE) / hx9, 9) END AS theil_u_x,
        |  CASE WHEN hy9 > 0 THEN round(CAST(mi9 AS DOUBLE) / hy9, 9) END AS theil_u_y
        |FROM base b JOIN hx USING (source) JOIN hy USING (source)
        |ORDER BY source""".stripMargin,
    // bucketed-continuous Kendall: the q207 replay over $1000 price
    // buckets
    "q210_kendall_bucketed" ->
      """WITH s AS (SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) // 100000 AS x,
        |    CAST(round(l_quantity) AS BIGINT) AS y
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL),
        |c AS (SELECT l_returnflag, x, y, count(*) AS n FROM s GROUP BY 1, 2, 3),
        |p AS (SELECT a.l_returnflag,
        |    CAST(sum(CASE WHEN a.x < b.x AND a.y < b.y THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS HUGEINT) AS c_pairs,
        |    CAST(sum(CASE WHEN a.x < b.x AND a.y > b.y THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS HUGEINT) AS d_pairs,
        |    CAST(sum(CASE WHEN a.x = b.x AND a.y < b.y THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS HUGEINT) AS t_x,
        |    CAST(sum(CASE WHEN a.x < b.x AND a.y = b.y THEN CAST(a.n AS HUGEINT) * b.n ELSE 0 END) AS HUGEINT) AS t_y
        |  FROM c a JOIN c b ON a.l_returnflag = b.l_returnflag
        |    AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
        |  GROUP BY 1),
        |g AS (SELECT l_returnflag, CAST(sum(n) AS BIGINT) AS n,
        |    CAST(sum(CAST(n AS HUGEINT) * (n - 1)) / 2 AS HUGEINT) AS t_xy FROM c GROUP BY 1)
        |SELECT g.l_returnflag, g.n,
        |  CAST(coalesce(p.c_pairs, 0) AS VARCHAR) AS c_pairs,
        |  CAST(coalesce(p.d_pairs, 0) AS VARCHAR) AS d_pairs,
        |  CAST(coalesce(p.t_x, 0) AS VARCHAR) AS t_x,
        |  CAST(coalesce(p.t_y, 0) AS VARCHAR) AS t_y,
        |  CAST(g.t_xy AS VARCHAR) AS t_xy,
        |  CASE WHEN coalesce(p.c_pairs, 0) + coalesce(p.d_pairs, 0) + coalesce(p.t_x, 0) > 0
        |      AND coalesce(p.c_pairs, 0) + coalesce(p.d_pairs, 0) + coalesce(p.t_y, 0) > 0 THEN
        |    round(CAST(coalesce(p.c_pairs, 0) - coalesce(p.d_pairs, 0) AS DOUBLE) /
        |      (sqrt(CAST(coalesce(p.c_pairs, 0) + coalesce(p.d_pairs, 0) + coalesce(p.t_x, 0) AS DOUBLE)) *
        |       sqrt(CAST(coalesce(p.c_pairs, 0) + coalesce(p.d_pairs, 0) + coalesce(p.t_y, 0) AS DOUBLE))), 9) END AS tau_b
        |FROM g LEFT JOIN p ON g.l_returnflag = p.l_returnflag
        |ORDER BY g.l_returnflag""".stripMargin,
    // Jaro/Jaro-Winkler over the q195 blocking: DuckDB's own builtins
    // ARE the oracle for the native expression
    "q211_jaro_winkler" ->
      """WITH b AS (SELECT doc_id AS id,
        |    lang || ':' || substring(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 24) AS k
        |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
        |r AS (SELECT id, k, row_number() OVER (ORDER BY k, id) AS rank FROM b),
        |p AS (SELECT a.id AS id_a, c.id AS id_b, a.k AS ka, c.k AS kb
        |  FROM r a JOIN r c ON c.rank > a.rank AND c.rank < a.rank + 4)
        |SELECT id_a, id_b,
        |  round(jaro_similarity(ka, kb), 9) AS jaro,
        |  round(jaro_winkler_similarity(ka, kb), 9) AS jw
        |FROM p ORDER BY id_a, id_b""".stripMargin,
    // collocations: filtered-token bigram stream, PMI + probability-form
    // Dunning LLR with nano terms
    "q212_collocations" ->
      """WITH t AS (SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
        |    x -> x <> '') AS l FROM documents WHERE text IS NOT NULL),
        |bg0 AS (SELECT unnest(list_zip(l[1:len(l) - 1], l[2:len(l)])) AS z FROM t),
        |bc AS (SELECT z[1] AS w1, z[2] AS w2, count(*) AS c_xy
        |  FROM bg0 GROUP BY 1, 2),
        |uc AS (SELECT unnest(l) AS w FROM t),
        |u AS (SELECT w, count(*) AS c FROM uc GROUP BY 1),
        |tot AS (SELECT (SELECT CAST(sum(c_xy) AS BIGINT) FROM bc) AS b_tot,
        |    (SELECT CAST(sum(c) AS BIGINT) FROM u) AS n_tot),
        |lm AS (SELECT w1, CAST(sum(c_xy) AS BIGINT) AS c_x_b FROM bc GROUP BY 1),
        |rm AS (SELECT w2, CAST(sum(c_xy) AS BIGINT) AS c_y_b FROM bc GROUP BY 1),
        |j AS (SELECT bc.w1, bc.w2, CAST(c_xy AS BIGINT) AS c_xy,
        |    CAST(ux.c AS BIGINT) AS c_x, CAST(uy.c AS BIGINT) AS c_y,
        |    c_x_b, c_y_b, b_tot, n_tot
        |  FROM bc JOIN u ux ON bc.w1 = ux.w JOIN u uy ON bc.w2 = uy.w
        |    JOIN lm ON bc.w1 = lm.w1 JOIN rm ON bc.w2 = rm.w2, tot
        |  WHERE c_xy >= 5),
        |k AS (SELECT *, c_xy AS k11,
        |    c_x_b - c_xy AS k12, c_y_b - c_xy AS k21,
        |    b_tot - c_x_b - c_y_b + c_xy AS k22 FROM j),
        |s AS (SELECT *, c_x_b AS r1, b_tot - c_x_b AS r2,
        |    c_y_b AS c1, b_tot - c_y_b AS c2 FROM k),
        |f AS (SELECT w1, w2, c_xy, c_x, c_y, b_tot, n_tot,
        |  ln((CAST(c_xy AS DOUBLE) / b_tot) /
        |    ((CAST(c_x AS DOUBLE) / n_tot) * (CAST(c_y AS DOUBLE) / n_tot))) AS pmi,
        |  (CASE WHEN k11 > 0 THEN CAST(round((CAST(k11 AS DOUBLE) / b_tot) *
        |      ln((CAST(k11 AS DOUBLE) / b_tot) /
        |        ((CAST(r1 AS DOUBLE) / b_tot) * (CAST(c1 AS DOUBLE) / b_tot))) * 1e9) AS BIGINT) ELSE 0 END +
        |   CASE WHEN k12 > 0 THEN CAST(round((CAST(k12 AS DOUBLE) / b_tot) *
        |      ln((CAST(k12 AS DOUBLE) / b_tot) /
        |        ((CAST(r1 AS DOUBLE) / b_tot) * (CAST(c2 AS DOUBLE) / b_tot))) * 1e9) AS BIGINT) ELSE 0 END +
        |   CASE WHEN k21 > 0 THEN CAST(round((CAST(k21 AS DOUBLE) / b_tot) *
        |      ln((CAST(k21 AS DOUBLE) / b_tot) /
        |        ((CAST(r2 AS DOUBLE) / b_tot) * (CAST(c1 AS DOUBLE) / b_tot))) * 1e9) AS BIGINT) ELSE 0 END +
        |   CASE WHEN k22 > 0 THEN CAST(round((CAST(k22 AS DOUBLE) / b_tot) *
        |      ln((CAST(k22 AS DOUBLE) / b_tot) /
        |        ((CAST(r2 AS DOUBLE) / b_tot) * (CAST(c2 AS DOUBLE) / b_tot))) * 1e9) AS BIGINT) ELSE 0 END) AS s9
        |  FROM s)
        |SELECT w1, w2, c_xy, c_x, c_y, b_tot, n_tot,
        |  round(pmi, 9) AS pmi,
        |  round(2.0 * CAST(b_tot AS DOUBLE) * (CAST(s9 AS DOUBLE) / 1e9), 9) AS llr
        |FROM f ORDER BY c_xy DESC, w1, w2 LIMIT 100""".stripMargin,
    // rolling 24h exact-moment correlation between two hourly series
    "q213_rolling_correlation" ->
      """WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS hr,
        |    CAST(round(value * 1000) AS BIGINT) AS v_m FROM events),
        |c AS (SELECT hr, CAST(sum(v_m) AS BIGINT) AS x_m FROM ev
        |  WHERE event_type = 'click' GROUP BY 1),
        |v AS (SELECT hr, CAST(sum(v_m) AS BIGINT) AS y_m FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |j AS (SELECT c.hr, x_m, y_m FROM c JOIN v ON c.hr = v.hr
        |  WHERE x_m IS NOT NULL AND y_m IS NOT NULL),
        |w AS (SELECT hr, x_m, y_m,
        |    CAST(count(*) OVER win AS BIGINT) AS w_n,
        |    sum(CAST(x_m AS HUGEINT)) OVER win AS sx,
        |    sum(CAST(y_m AS HUGEINT)) OVER win AS sy,
        |    sum(CAST(x_m AS HUGEINT) * y_m) OVER win AS sxy,
        |    sum(CAST(x_m AS HUGEINT) * x_m) OVER win AS sxx,
        |    sum(CAST(y_m AS HUGEINT) * y_m) OVER win AS syy
        |  FROM j WINDOW win AS (ORDER BY hr ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
        |r AS (SELECT hr, x_m, y_m, w_n,
        |    CAST(w_n AS HUGEINT) * sxy - sx * sy AS num,
        |    CAST(w_n AS HUGEINT) * sxx - sx * sx AS dx,
        |    CAST(w_n AS HUGEINT) * syy - sy * sy AS dy FROM w)
        |SELECT strftime(hr, '%Y-%m-%d %H:%M:%S') AS hr, x_m, y_m, w_n,
        |  CASE WHEN dx > 0 AND dy > 0 THEN
        |    round(greatest(-1.0, least(1.0, CAST(num AS DOUBLE) /
        |      (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE))))), 9) END AS r
        |FROM r ORDER BY hr""".stripMargin
  )

  /** Shared BM25 replay CTEs (terms spark/window/merge = tf0/tf1/tf2,
    * k1 = 1.2, b = 0.75): tokenization matches the Spark side
    * (`split(trim(lower(text)), '\\s+')`), and the score expression
    * mirrors [[graft.text.Bm25]]'s fold ASSOCIATION ORDER exactly —
    * every op except `ln` is IEEE correctly-rounded in both engines, and
    * gates rank on the DECIMAL(18,6) score where the idf ulp can't flip
    * an order.
    */
  /** Shared q125-model refit CTEs (q144 confusion, q163 calibration,
    * q168 AUC): hashed uni+bigram buckets, integer NBSVM weights
    * (HUGEINT cross-multiplication — no float in the fit), per-doc
    * margin replay, and the labeled split. One definition so the three
    * evaluation gates provably score the SAME model.
    */
  private val QualityRefitCtes: String =
    """tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
      |g AS (SELECT doc_id,
      |    list_concat(w, list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gs
      |  FROM tok),
      |b AS (SELECT doc_id,
      |    list_reduce(list_transform(range(1, 16), i ->
      |      CAST(strpos('0123456789abcdef', substring(md5(u.gram), i, 1)) - 1 AS BIGINT)),
      |      (acc, x) -> acc * 16 + x) % 1024 AS bucket
      |  FROM g, unnest(gs) AS u(gram)),
      |cnt AS (SELECT bucket,
      |    sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS cnt_p,
      |    sum(CASE WHEN doc_id % 5 = 3 THEN 1 ELSE 0 END) AS cnt_n
      |  FROM b WHERE doc_id % 5 = 0 OR doc_id % 5 = 3 GROUP BY 1),
      |tot AS (SELECT CAST(sum(cnt_p) AS HUGEINT) AS pt, CAST(sum(cnt_n) AS HUGEINT) AS nt FROM cnt),
      |wt AS (SELECT bucket,
      |    CAST((2 * 1000000 * CAST(cnt_p AS HUGEINT) * nt) //
      |      (CAST(cnt_p AS HUGEINT) * nt + CAST(cnt_n AS HUGEINT) * pt) - 1000000 AS BIGINT) AS w
      |  FROM cnt, tot),
      |sig AS (SELECT b.doc_id, sum(coalesce(wt.w, 0)) AS margin
      |  FROM b LEFT JOIN wt USING (bucket) GROUP BY 1),
      |lab AS (SELECT doc_id, doc_id % 5 = 0 AS label FROM documents
      |  WHERE doc_id % 5 = 0 OR doc_id % 5 = 3)""".stripMargin

  private val Bm25Ctes: String =
    """t AS (SELECT doc_id, len(toks) AS dl,
      |    len(list_filter(toks, x -> x = 'spark')) AS tf0,
      |    len(list_filter(toks, x -> x = 'window')) AS tf1,
      |    len(list_filter(toks, x -> x = 'merge')) AS tf2
      |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      |        FROM documents WHERE text IS NOT NULL)),
      |st AS (SELECT count(*) AS n, avg(dl) AS avgdl,
      |    sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
      |    sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
      |    sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
      |  FROM t),
      |sc AS (SELECT doc_id,
      |    ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * (tf0 * (1.2 + 1.0)) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
      |  + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * (tf1 * (1.2 + 1.0)) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
      |  + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * (tf2 * (1.2 + 1.0)) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS score
      |  FROM t, st)""".stripMargin

  /** Shared by q103 (in-query model fit) and q106 (prebuilt-model
    * fixtures): the oracle refits both hashed-gram models in SQL, so for
    * q106 it also re-verifies the fixtures' content.
    */
  /** The q121 oracle, generated: nine structurally identical per-n
    * chains (gram explode → counts → top-gram select / dup filter →
    * covered-position DISTINCT → char mass), differing only in n and in
    * top-vs-dup qualification — generation keeps the nine chains
    * provably uniform. Fractions are single divisions of exact longs;
    * the top-gram tie-break (count DESC, length DESC, gram ASC) matches
    * the kernel's (count, char mass, string) order because char mass =
    * length − (n−1) at fixed n.
    */
  private val GopherRepetitionOracleSql: String = {
    val topNs = Seq(2, 3, 4)
    val dupNs = Seq(5, 6, 7, 8, 9, 10)
    val thresholds = Map(2 -> "0.20", 3 -> "0.18", 4 -> "0.16", 5 -> "0.15",
      6 -> "0.14", 7 -> "0.13", 8 -> "0.12", 9 -> "0.11", 10 -> "0.10")
    def fracName(n: Int) = if (n <= 4) s"top_${n}gram_char_frac" else s"dup_${n}gram_char_frac"
    def chain(n: Int): Seq[String] = {
      val base = Seq(
        s"g$n AS (SELECT doc_id, i, array_to_string(w[i+1:i+$n], ' ') AS g FROM t, LATERAL (SELECT unnest(range(len(w) - $n + 1)) AS i) r$n)",
        s"c$n AS (SELECT doc_id, g, count(*) AS c FROM g$n GROUP BY 1, 2)")
      val cover =
        if (n <= 4) Seq(
          s"s$n AS (SELECT doc_id, g FROM (SELECT doc_id, g, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, length(g) DESC, g) AS rn FROM c$n) WHERE rn = 1)",
          s"p$n AS (SELECT DISTINCT g$n.doc_id AS doc_id, p FROM g$n JOIN s$n ON g$n.doc_id = s$n.doc_id AND g$n.g = s$n.g, LATERAL (SELECT unnest(range(i, i + $n)) AS p) rr$n)")
        else Seq(
          s"p$n AS (SELECT DISTINCT g$n.doc_id AS doc_id, p FROM g$n JOIN c$n ON g$n.doc_id = c$n.doc_id AND g$n.g = c$n.g AND c$n.c >= 2, LATERAL (SELECT unnest(range(i, i + $n)) AS p) rr$n)")
      base ++ cover :+
        s"m$n AS (SELECT p$n.doc_id, sum(length(t.w[p+1])) AS mass FROM p$n JOIN t ON p$n.doc_id = t.doc_id GROUP BY 1)"
    }
    val ns = topNs ++ dupNs
    val fracExprs = ns.map(n =>
      s"  CASE WHEN tc.n_chars > 0 THEN coalesce(m$n.mass, 0) / CAST(tc.n_chars AS DOUBLE) ELSE 0.0 END AS ${fracName(n)}")
    val joins = ns.map(n => s"LEFT JOIN m$n ON tc.doc_id = m$n.doc_id")
    val passes = ns.map(n => s"${fracName(n)} <= ${thresholds(n)}").mkString(" AND ")
    (Seq(
      "WITH d AS (SELECT doc_id,",
      "    CASE WHEN doc_id % 4 = 0 THEN text || ' click here to subscribe click here to subscribe click here to subscribe'",
      "         WHEN doc_id % 4 = 1 THEN text || ' the quick brown fox jumped over the lazy dog and then the quick brown fox jumped over the lazy dog'",
      "         ELSE text END AS text",
      "  FROM documents),",
      "t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM d),",
      "tc AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS n_chars FROM t),") ++
      ns.flatMap(n => chain(n).map(_ + ",")).dropRight(1) ++ Seq(ns.flatMap(chain).last) ++
      Seq(
        ", f AS (SELECT tc.doc_id, tc.n_tokens, tc.n_chars,",
        fracExprs.mkString(",\n"),
        s"  FROM tc ${joins.mkString(" ")})",
        s"SELECT *, ($passes) AS passes_repetition FROM f ORDER BY doc_id"))
      .mkString("\n")
  }

  /** Shared by q37 (driver union-find fast path at gate scale) and q113
    * (forced distributed pointer jumping) — identical expected output.
    */
  private val CcClustersOracleSql: String =
    """WITH RECURSIVE e0 AS (
      |  SELECT d.doc_id AS src, d.doc_id + 1 AS dst FROM documents d
      |  JOIN documents d2 ON d2.doc_id = d.doc_id + 1
      |  WHERE d.doc_id % 10 <= 1),
      |sym AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      |nodes AS (SELECT DISTINCT src AS node FROM sym),
      |reach AS (
      |  SELECT node, node AS r FROM nodes
      |  UNION
      |  SELECT s.dst AS node, reach.r FROM reach JOIN sym s ON s.src = reach.node
      |)
      |SELECT node, min(r) AS component FROM reach GROUP BY node ORDER BY node""".stripMargin

  /** Shared by q93/q97 (incremental folds must equal the from-scratch
    * closure over old ∪ new edges) and — histogram-suffixed — q248.
    */
  private val CcIncrementalOracleSql: String =
    """WITH RECURSIVE e0 AS (
      |  SELECT d.doc_id AS src, d.doc_id + 1 AS dst FROM documents d
      |  JOIN documents d2 ON d2.doc_id = d.doc_id + 1
      |  WHERE d.doc_id % 10 <= 1
      |  UNION ALL
      |  SELECT d.doc_id AS src, d.doc_id + 10 AS dst FROM documents d
      |  JOIN documents d2 ON d2.doc_id = d.doc_id + 10
      |  WHERE d.doc_id % 20 = 0
      |  UNION ALL
      |  SELECT d.doc_id AS src, d.doc_id + 1 AS dst FROM documents d
      |  JOIN documents d2 ON d2.doc_id = d.doc_id + 1
      |  WHERE d.doc_id % 10 = 5),
      |sym AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      |nodes AS (SELECT DISTINCT src AS node FROM sym),
      |reach AS (
      |  SELECT node, node AS r FROM nodes
      |  UNION
      |  SELECT s.dst AS node, reach.r FROM reach JOIN sym s ON s.src = reach.node
      |)
      |SELECT node, min(r) AS component FROM reach GROUP BY node ORDER BY node""".stripMargin

  private val DsirOracleSql: String =
    """WITH tok AS (SELECT doc_id, lang, string_split_regex(trim(lower(text)), '\s+') AS w FROM documents),
      |g AS (SELECT doc_id, lang,
      |    list_concat(w, list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gs
      |  FROM tok),
      |b AS (SELECT doc_id, lang,
      |    list_reduce(list_transform(range(1, 16), i ->
      |      CAST(strpos('0123456789abcdef', substring(md5(u.gram), i, 1)) - 1 AS BIGINT)),
      |      (acc, x) -> acc * 16 + x) % 1024 AS bucket
      |  FROM g, unnest(gs) AS u(gram)),
      |tm AS (SELECT bucket, count(*) AS cnt FROM b WHERE lang = 'en' AND doc_id % 2 = 0 GROUP BY 1),
      |rm AS (SELECT bucket, count(*) AS cnt FROM b GROUP BY 1),
      |tt AS (SELECT CAST(coalesce(sum(cnt), 0) AS HUGEINT) AS t_tot FROM tm),
      |rt AS (SELECT CAST(coalesce(sum(cnt), 0) AS HUGEINT) AS r_tot FROM rm),
      |sig AS (SELECT doc_id, lang, count(*) AS n_grams,
      |    sum(coalesce(tm.cnt, 0)) AS target_mass,
      |    sum(coalesce(rm.cnt, 0)) AS raw_mass
      |  FROM b LEFT JOIN tm USING (bucket) LEFT JOIN rm USING (bucket)
      |  GROUP BY doc_id, lang),
      |k AS (SELECT doc_id, lang, n_grams, target_mass, raw_mass,
      |    CASE WHEN CAST(target_mass AS HUGEINT) * r_tot + CAST(raw_mass AS HUGEINT) * t_tot = 0 THEN -1
      |      ELSE CAST((CAST(target_mass AS HUGEINT) * r_tot * 1000000000) //
      |        (CAST(target_mass AS HUGEINT) * r_tot + CAST(raw_mass AS HUGEINT) * t_tot) AS BIGINT) END AS dsir_key
      |  FROM sig, tt, rt),
      |sel AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY dsir_key DESC, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY lang) AS n FROM k)
      |SELECT doc_id, lang, CAST(n_grams AS BIGINT) AS n_grams,
      |  CAST(target_mass AS BIGINT) AS target_mass,
      |  CAST(raw_mass AS BIGINT) AS raw_mass, dsir_key
      |FROM sel WHERE rn <= ceil(n * 0.25) ORDER BY doc_id""".stripMargin

  private val Bm25OracleSql: String =
    s"""WITH $Bm25Ctes,
      |r AS (SELECT doc_id, CAST(score AS DECIMAL(18,6)) AS bm25 FROM sc
      |  WHERE CAST(score AS DECIMAL(18,6)) > 0),
      |rk AS (SELECT row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank, doc_id, bm25 FROM r)
      |SELECT rank, doc_id, CAST(bm25 AS DOUBLE) AS bm25 FROM rk WHERE rank <= 20 ORDER BY rank""".stripMargin
}
