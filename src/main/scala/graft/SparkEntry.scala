package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Dedup, Fulltext, Hybrid, MetricQueries, MultiVector, Relational, Similarity, TextAnalysis, UsearchOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry has a matching `oracleSql` (DuckDB) unless the
  * operator is not SQL-expressible; column names are aligned on both
  * sides because the driver's compare hashes values under sorted column
  * names.
  */
object SparkEntry {

  /** Flagship: engine-path BM25 top-k over sf0.001 documents. */
  def entry(spark: SparkSession): DataFrame =
    Fulltext.engBm25TopK(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational / Catalyst coverage
    "q1_agg" -> Relational.q1Agg _,
    "q3_top_revenue" -> Relational.q3TopRevenue _,
    "q_window_topn" -> Relational.qWindowTopN _,
    "q_events_daily" -> Relational.qEventsDaily _,
    // the same code path Structured Streaming runs with a watermark
    // (StreamingWindowSpec proves stream ≡ batch), executed on the batch
    // events table for the oracle
    "q_events_window" -> ((s: SparkSession, d: String) =>
      graft.streaming.StreamingWindow
        .eventStats(s.read.parquet(s"$d/events.parquet"))
        .orderBy("win_start", "event_type")),
    // fulltext build stages (declarative)
    "ft_tf" -> Fulltext.tfTable _,
    "ft_df" -> Fulltext.dfTable _,
    "ft_stats" -> Fulltext.corpusStats _,
    // BM25 top-k: declarative plan, filtered variant, and the engine
    // (segments + block-max WAND) against the same SQL oracle
    "ft_bm25_topk" -> ((s: SparkSession, d: String) => Fulltext.bm25TopK(s, d)),
    "ft_bm25_filtered" -> ((s: SparkSession, d: String) =>
      Fulltext.bm25TopK(s, d, langFilter = Some("en"))),
    "eng_bm25_topk" -> Fulltext.engBm25TopK _,
    "eng_bm25_exact" -> Fulltext.engBm25Exact _,
    "eng_bm25_hot" -> Fulltext.engBm25Hot _,
    "eng_more_like_this" -> ((s: SparkSession, d: String) => Fulltext.engMoreLikeThis(s, d)),
    "eng_more_like_this_many" -> ((s: SparkSession, d: String) => Fulltext.engMoreLikeThisMany(s, d)),
    "eng_bm25_multigen" -> Fulltext.engBm25MultiGen _,
    "eng_bm25_many" -> Fulltext.engBm25Many _,
    "eng_bm25_many_multigen" -> Fulltext.engBm25ManyMultiGen _,
    "eng_bm25_many_filtered" -> Fulltext.engBm25ManyFiltered _,
    "eng_stats" -> Fulltext.engStats _,
    "eng_levels_stats" -> Fulltext.engLevelsStats _,
    "eng_phrase" -> Fulltext.engPhrase _,
    "eng_proximity" -> Fulltext.engProximity _,
    "eng_bm25_and_many" -> Fulltext.engBm25AndMany _,
    "eng_prefix_search" -> Fulltext.engPrefixSearch _,
    "eng_manifest" -> Fulltext.engManifest _,
    "eng_snippet" -> Fulltext.engSnippet _,
    "eng_bm25_and_multigen" -> Fulltext.engBm25AndMultiGen _,
    "eng_proximity_multigen" -> Fulltext.engProximityMultiGen _,
    "eng_fuzzy_search" -> Fulltext.engFuzzySearch _,
    "eng_bm25_not" -> Fulltext.engBm25Not _,
    "eng_bool_query" -> Fulltext.engBoolQuery _,
    "eng_explain" -> Fulltext.engExplain _,
    "eng_search_after" -> Fulltext.engSearchAfter _,
    "eng_term_vector" -> Fulltext.engTermVector _,
    "eng_facets" -> Fulltext.engFacets _,
    "eng_synonym_search" -> Fulltext.engSynonymSearch _,
    "eng_percolate" -> Fulltext.engPercolate _,
    "eng_suggest" -> Fulltext.engSuggest _,
    "eng_collocations" -> Fulltext.engCollocations _,
    "eng_significant_terms" -> Fulltext.engSignificantTerms _,
    "eng_fsck" -> Fulltext.engFsck _,
    "eng_wildcard_search" -> Fulltext.engWildcardSearch _,
    "eng_regexp_search" -> Fulltext.engRegexpSearch _,
    "eng_boosted_query" -> Fulltext.engBoostedQuery _,
    "eng_bm25_min_match" -> Fulltext.engBm25MinMatch _,
    "eng_span_ordered" -> Fulltext.engSpanOrdered _,
    "eng_span_ordered_multigen" -> Fulltext.engSpanOrderedMultiGen _,
    "eng_count_query" -> Fulltext.engCountQuery _,
    "eng_sort_by_len" -> Fulltext.engSortByLen _,
    "eng_dismax" -> Fulltext.engDisMax _,
    "eng_phrase_prefix" -> Fulltext.engPhrasePrefix _,
    "eng_count_multigen" -> Fulltext.engCountMultiGen _,
    "eng_terms_enum" -> Fulltext.engTermsEnum _,
    "eng_len_percentiles" -> Fulltext.engLenPercentiles _,
    "eng_rescore" -> Fulltext.engRescore _,
    "ft_hll_card" -> Fulltext.ftHllCard _,
    "sim_pq_knn" -> ((s: SparkSession, d: String) => Similarity.pqKnn(s, d)),
    "sim_pq_knn_refine" -> ((s: SparkSession, d: String) => Similarity.pqKnnRefine(s, d)),
    "sim_recall_pq" -> Similarity.pqRecall _,
    "sim_recall_pq_refine" -> Similarity.pqRecallRefine _,
    "eng_hybrid_rrf" -> Hybrid.engHybridRrf _,
    "eng_hybrid_rrf_many" -> Hybrid.engHybridRrfMany _,
    "eng_hybrid_rrf_ann" -> Hybrid.engHybridRrfAnn _,
    // usearch key-API analogs
    "u_contains" -> UsearchOps.contains _,
    "u_count_key" -> UsearchOps.countKey _,
    "u_get" -> UsearchOps.get _,
    "u_export_keys" -> UsearchOps.exportKeys _,
    "u_stats" -> UsearchOps.stats _,
    "u_remove" -> UsearchOps.removeTombstones _,
    "u_rename" -> UsearchOps.rename _,
    "u_get_dequantized" -> ((s: SparkSession, d: String) => Similarity.getDequantized(s, d)),
    // similarity search over embeddings
    "sim_knn_exact" -> ((s: SparkSession, d: String) => Similarity.knnExact(s, d)),
    "sim_knn_filtered" -> ((s: SparkSession, d: String) =>
      Similarity.knnExact(s, d, labelFilter = Some(3))),
    "sim_knn_batch" -> ((s: SparkSession, d: String) => Similarity.knnExactMany(s, d)),
    "sim_knn_i8" -> ((s: SparkSession, d: String) => Similarity.knnI8(s, d)),
    "sim_recall_i8" -> Similarity.recallI8 _,
    "sim_knn_b1" -> ((s: SparkSession, d: String) => Similarity.knnB1(s, d)),
    "sim_recall_b1" -> Similarity.recallB1 _,
    "sim_knn_b1_refine" -> ((s: SparkSession, d: String) => Similarity.knnB1Refine(s, d)),
    "sim_recall_b1_refine" -> Similarity.recallB1Refine _,
    "sim_ndcg_b1" -> Similarity.ndcgB1 _,
    "sim_knn_f16" -> ((s: SparkSession, d: String) => Similarity.knnF16(s, d)),
    "sim_recall_f16" -> Similarity.recallF16 _,
    "sim_knn_bf16" -> ((s: SparkSession, d: String) => Similarity.knnBf16(s, d)),
    "sim_recall_bf16" -> Similarity.recallBf16 _,
    // the rest of the metric surface, driver-oracled
    "sim_knn_ip" -> ((s: SparkSession, d: String) => MetricQueries.knnIp(s, d)),
    "sim_knn_l2sq" -> ((s: SparkSession, d: String) => MetricQueries.knnL2sq(s, d)),
    "sim_pearson" -> MetricQueries.pearsonPairs _,
    "sim_divergence" -> MetricQueries.divergencePairs _,
    "sim_haversine" -> MetricQueries.haversinePairs _,
    "sim_tanimoto_b1" -> MetricQueries.tanimotoB1 _,
    "sim_sorensen_b1" -> MetricQueries.sorensenB1 _,
    "sim_knn_metric" -> ((s: SparkSession, d: String) =>
      Similarity.knnWithMetric(s, d, graft.functions.Metric.Cos)),
    "mv_count" -> MultiVector.mvCount _,
    "mv_distance" -> MultiVector.mvDistance _,
    "mv_knn" -> ((s: SparkSession, d: String) => MultiVector.mvKnn(s, d)),
    "sim_pairwise" -> Similarity.pairwiseDistance _,
    "sim_cluster_assign" -> Similarity.clusterAssign _,
    "sim_emb_neardup" -> ((s: SparkSession, d: String) => Similarity.embNearDup(s, d)),
    // IVF ANN: the nprobe=nlist configuration probes every cell, so the
    // full IVF machinery (kmeans partition → probe → rank) must reproduce
    // brute-force exactly — checked against the same SQL oracle; the
    // approximate configuration's recall is measured in IvfSpec
    "sim_ivf_knn" -> ((s: SparkSession, d: String) =>
      Similarity.ivfKnn(s, d, k = 10, nlist = 8, nprobe = 8)),
    "sim_ivf_knn_batch" -> ((s: SparkSession, d: String) =>
      Similarity.ivfKnnMany(s, d, nQueries = 5, k = 10, nlist = 8, nprobe = 8)),
    "sim_ivf_knn_filtered" -> ((s: SparkSession, d: String) =>
      Similarity.ivfKnn(s, d, k = 10, nlist = 8, nprobe = 8, labelFilter = Some(3))),
    "sim_ivf_add" -> ((s: SparkSession, d: String) => Similarity.ivfAddKnn(s, d)),
    // recall-vs-nprobe curve at nlist=64 — the reference's per-config
    // recall table; the oracle replays the ENTIRE index (k-means fit,
    // cell ranking, partial-probe top-k) in SQL, so partial-probe
    // points are hash-checked too, not just the exact endpoint
    "sim_ivf_recall_curve" -> ((s: SparkSession, d: String) =>
      Similarity.ivfRecallCurve(s, d)),
    // engine clustering + stable-marriage join, both with FULL SQL
    // oracles (the determinism discipline makes the iterations
    // expressible: unrolled CTEs / a recursive CTE)
    "eng_kmeans" -> Similarity.kmeansAssign _,
    "eng_semantic_join" -> Similarity.semanticJoin _,
    // the scale path: preference lists from IVF-cell candidates (the
    // reference's ANN-search-per-free-man design) — deterministic, so
    // the approximate algorithm itself has an exact SQL twin
    "eng_semantic_join_ann" -> Similarity.semanticJoinAnn _,
    // batch cluster API (merge-smallest-k refinement + chain resolution)
    "sim_batch_cluster" -> ((s: SparkSession, d: String) => ops.BatchCluster.cluster(s, d)),
    // dedup suite
    "dd_exact" -> Dedup.exact _,
    "dd_ngram_jaccard" -> ((s: SparkSession, d: String) => Dedup.ngramJaccard(s, d)),
    "dd_minhash_lsh" -> ((s: SparkSession, d: String) => Dedup.minhashLsh(s, d)),
    "dd_neardup_groups" -> ((s: SparkSession, d: String) => Dedup.neardupGroups(s, d)),
    "dd_simhash" -> Dedup.simhash _,
    "dd_simhash_hamming" -> ((s: SparkSession, d: String) => Dedup.simhashHamming(s, d)),
    // multimodal binary-column plumbing
    "mm_byte_stats" -> graft.multimodal.Multimodal.byteStats _,
    "mm_frame_hist" -> ((s: SparkSession, d: String) =>
      graft.multimodal.Multimodal.frameHist(s, d)),
    // text analysis
    "ta_tokcount" -> TextAnalysis.tokenCount _,
    "ta_quality" -> TextAnalysis.quality _,
    "ta_langid" -> TextAnalysis.langId _,
    "ta_fingerprint" -> TextAnalysis.fingerprint _,
    "ta_levenshtein" -> TextAnalysis.levenshteinPairs _,
    "ta_levenshtein_bounded" -> ((s: SparkSession, d: String) =>
      TextAnalysis.levenshteinBoundedPairs(s, d)),
    "ta_hamming_str" -> TextAnalysis.hammingStrPairs _,
    "ta_levenshtein_bytes" -> TextAnalysis.levenshteinBytesPairs _,
    "ta_hamming_bytes" -> TextAnalysis.hammingBytesPairs _,
    // ranked string-metric search (top-k nearest strings by levenshtein)
    "ta_string_knn" -> ((s: SparkSession, d: String) => TextAnalysis.stringKnn(s, d)),
    // composite training-data curation: lang filter ∧ dedup rep ∧ quality
    "ta_curate" -> ((s: SparkSession, d: String) => TextAnalysis.curate(s, d)),
    "ta_contamination" -> ((s: SparkSession, d: String) => TextAnalysis.contamination(s, d)),
    "ta_sample_stratified" -> ((s: SparkSession, d: String) => TextAnalysis.sampleStratified(s, d)),
    "ta_token_budget" -> ((s: SparkSession, d: String) => TextAnalysis.tokenBudget(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1AggSql,
    "q3_top_revenue" -> Relational.q3TopRevenueSql,
    "q_window_topn" -> Relational.qWindowTopNSql,
    "q_events_daily" -> Relational.qEventsDailySql,
    "q_events_window" -> graft.streaming.StreamingWindow.eventStatsSql,
    "ft_tf" -> Fulltext.tfTableSql,
    "ft_df" -> Fulltext.dfTableSql,
    "ft_stats" -> Fulltext.corpusStatsSql,
    "ft_bm25_topk" -> Fulltext.bm25TopKSql(),
    "ft_bm25_filtered" -> Fulltext.bm25TopKSql(langFilter = Some("en")),
    "eng_bm25_topk" -> Fulltext.bm25TopKSql(),
    "eng_bm25_exact" -> Fulltext.bm25TopKSql(),
    "eng_bm25_hot" -> Fulltext.bm25TopKSql(),
    "eng_more_like_this" -> Fulltext.engMoreLikeThisSql(),
    "eng_more_like_this_many" -> Fulltext.engMoreLikeThisManySql(),
    "eng_bm25_multigen" -> Fulltext.bm25TopKSql(),
    "eng_bm25_many" -> Fulltext.bm25TopKManySql(),
    "eng_bm25_many_multigen" -> Fulltext.bm25TopKManySql(),
    "eng_bm25_many_filtered" -> Fulltext.bm25TopKManySql(docFilterSql = "tf.doc_id % 3 = 0"),
    "eng_stats" -> Fulltext.engStatsSql,
    "eng_levels_stats" -> Fulltext.engLevelsStatsSql,
    "eng_phrase" -> Fulltext.engPhraseSql(),
    "eng_proximity" -> Fulltext.engProximitySql(),
    "eng_bm25_and_many" -> Fulltext.bm25AndTopKManySql(),
    "eng_prefix_search" -> Fulltext.prefixSearchSql(),
    "eng_manifest" -> Fulltext.engManifestSql,
    "eng_snippet" -> Fulltext.engSnippetSql(),
    "eng_bm25_and_multigen" -> Fulltext.bm25AndTopKManySql(),
    "eng_proximity_multigen" -> Fulltext.engProximitySql(),
    "eng_fuzzy_search" -> Fulltext.fuzzySearchSql(),
    "eng_bm25_not" -> Fulltext.bm25NotSql(),
    "eng_bool_query" -> Fulltext.boolQuerySql(),
    "eng_explain" -> Fulltext.explainSql(),
    "eng_search_after" -> Fulltext.searchAfterSql(),
    "eng_term_vector" -> Fulltext.termVectorSql(),
    "eng_facets" -> Fulltext.facetsSql(),
    "eng_synonym_search" -> Fulltext.synonymSearchSql(),
    "eng_percolate" -> Fulltext.percolateSql(),
    "eng_suggest" -> Fulltext.suggestSql(),
    "eng_collocations" -> Fulltext.collocationsSql(),
    "eng_significant_terms" -> Fulltext.significantTermsSql(),
    "eng_fsck" -> Fulltext.engFsckSql,
    "eng_wildcard_search" -> Fulltext.wildcardSearchSql(),
    "eng_regexp_search" -> Fulltext.regexpSearchSql(),
    "eng_boosted_query" -> Fulltext.boostedQuerySql(),
    "eng_bm25_min_match" -> Fulltext.bm25MinMatchManySql(),
    "eng_span_ordered" -> Fulltext.spanOrderedSql(),
    "eng_span_ordered_multigen" -> Fulltext.spanOrderedSql(),
    "eng_count_query" -> Fulltext.countQuerySql(),
    "eng_sort_by_len" -> Fulltext.sortByLenSql(),
    "eng_dismax" -> Fulltext.disMaxSql(),
    "eng_phrase_prefix" -> Fulltext.phrasePrefixSql(),
    "eng_count_multigen" -> Fulltext.countQuerySql(),
    "eng_terms_enum" -> Fulltext.termsEnumSql(),
    "eng_len_percentiles" -> Fulltext.lenPercentilesSql(),
    "eng_rescore" -> Fulltext.rescoreSql(),
    "ft_hll_card" -> Fulltext.ftHllCardSql(),
    "sim_pq_knn" -> Similarity.pqKnnSql(),
    "sim_pq_knn_refine" -> Similarity.pqKnnRefineSql(),
    "sim_recall_pq" -> Similarity.pqRecallSql(),
    "sim_recall_pq_refine" -> Similarity.pqRecallRefineSql(),
    "eng_hybrid_rrf" -> Hybrid.hybridRrfSql(),
    "eng_hybrid_rrf_many" -> Hybrid.hybridRrfManySql(),
    "eng_hybrid_rrf_ann" -> Hybrid.hybridRrfManySql(),
    "u_contains" -> UsearchOps.containsSql,
    "u_count_key" -> UsearchOps.countKeySql,
    "u_get" -> UsearchOps.getSql,
    "u_export_keys" -> UsearchOps.exportKeysSql,
    "u_stats" -> UsearchOps.statsSql,
    "u_remove" -> UsearchOps.removeTombstonesSql,
    "u_rename" -> UsearchOps.renameSql,
    "u_get_dequantized" -> Similarity.getDequantizedSql(),
    "sim_knn_exact" -> Similarity.knnExactSql(),
    "sim_knn_filtered" -> Similarity.knnExactSql(labelFilter = Some(3)),
    "sim_pairwise" -> Similarity.pairwiseDistanceSql,
    "sim_cluster_assign" -> Similarity.clusterAssignSql,
    "sim_emb_neardup" -> Similarity.embNearDupSql(),
    "sim_ivf_knn" -> Similarity.knnExactSql(),
    "sim_ivf_knn_batch" -> Similarity.knnExactManySql(),
    "sim_ivf_knn_filtered" -> Similarity.knnExactSql(labelFilter = Some(3)),
    "sim_ivf_add" -> Similarity.knnExactSql(queryVecId = 450L),
    "sim_ivf_recall_curve" -> Similarity.ivfRecallCurveSql(),
    "eng_kmeans" -> Similarity.kmeansAssignSql,
    "eng_semantic_join" -> Similarity.semanticJoinSql,
    "eng_semantic_join_ann" -> Similarity.semanticJoinAnnSql,
    "sim_batch_cluster" -> ops.BatchCluster.clusterSql(),
    "sim_knn_batch" -> Similarity.knnExactManySql(),
    "sim_knn_i8" -> Similarity.knnI8Sql(),
    "sim_recall_i8" -> Similarity.recallI8Sql,
    "sim_knn_b1" -> Similarity.knnB1Sql(),
    "sim_recall_b1" -> Similarity.recallB1Sql,
    "sim_knn_b1_refine" -> Similarity.knnB1RefineSql(),
    "sim_recall_b1_refine" -> Similarity.recallB1RefineSql,
    "sim_ndcg_b1" -> Similarity.ndcgB1Sql,
    "sim_knn_f16" -> Similarity.knnF16Sql(),
    "sim_recall_f16" -> Similarity.recallF16Sql,
    "sim_knn_bf16" -> Similarity.knnBf16Sql(),
    "sim_recall_bf16" -> Similarity.recallBf16Sql,
    "sim_knn_ip" -> MetricQueries.knnIpSql(),
    "sim_knn_l2sq" -> MetricQueries.knnL2sqSql(),
    "sim_pearson" -> MetricQueries.pearsonPairsSql,
    "sim_divergence" -> MetricQueries.divergencePairsSql,
    "sim_haversine" -> MetricQueries.haversinePairsSql,
    "sim_tanimoto_b1" -> MetricQueries.tanimotoB1Sql,
    "sim_sorensen_b1" -> MetricQueries.sorensenB1Sql,
    "sim_knn_metric" -> Similarity.knnWithMetricCosSql(),
    "mv_count" -> MultiVector.mvCountSql,
    "mv_distance" -> MultiVector.mvDistanceSql,
    "mv_knn" -> MultiVector.mvKnnSql(),
    "dd_exact" -> Dedup.exactSql,
    "dd_ngram_jaccard" -> Dedup.ngramJaccardSql(),
    "dd_minhash_lsh" -> Dedup.minhashLshSql(),
    "dd_neardup_groups" -> Dedup.neardupGroupsSql(),
    "dd_simhash" -> Dedup.simhashSql,
    "dd_simhash_hamming" -> Dedup.simhashHammingSql(),
    "mm_byte_stats" -> graft.multimodal.Multimodal.byteStatsSql,
    "mm_frame_hist" -> graft.multimodal.Multimodal.frameHistSql(),
    "ta_tokcount" -> TextAnalysis.tokenCountSql,
    "ta_quality" -> TextAnalysis.qualitySql,
    "ta_langid" -> TextAnalysis.langIdSql,
    "ta_fingerprint" -> TextAnalysis.fingerprintSql,
    "ta_levenshtein" -> TextAnalysis.levenshteinPairsSql,
    "ta_levenshtein_bounded" -> TextAnalysis.levenshteinBoundedPairsSql(),
    "ta_hamming_str" -> TextAnalysis.hammingStrPairsSql,
    "ta_levenshtein_bytes" -> TextAnalysis.levenshteinBytesPairsSql,
    "ta_hamming_bytes" -> TextAnalysis.hammingBytesPairsSql,
    "ta_string_knn" -> TextAnalysis.stringKnnSql(),
    "ta_curate" -> TextAnalysis.curateSql(),
    "ta_contamination" -> TextAnalysis.contaminationSql(),
    "ta_sample_stratified" -> TextAnalysis.sampleStratifiedSql(),
    "ta_token_budget" -> TextAnalysis.tokenBudgetSql(),
  )
}
