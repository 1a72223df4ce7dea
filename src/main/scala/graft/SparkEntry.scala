package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Clustering, Curation, Dedup, EtlQueries, Graph, Multimodal, Relational, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` (in [[OracleSql]]) holds the DuckDB twin for every
  * SQL-expressible query.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * 5-way join + aggregate — exercises scans, broadcast joins, and shuffle
    * aggregation in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.q04_join5_agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_agg" -> (Relational.q01_scan_agg _),
    "q02_filter_project" -> (Relational.q02_filter_project _),
    "q03_join_agg" -> (Relational.q03_join_agg _),
    "q04_join5_agg" -> (Relational.q04_join5_agg _),
    "q05_topk" -> (Relational.q05_topk _),
    "q06_distinct_on" -> (Relational.q06_distinct_on _),
    "q07_window" -> (Relational.q07_window _),
    "q08_union" -> (Relational.q08_union _),
    "q09_semi_join" -> (Relational.q09_semi_join _),
    "q10_anti_join" -> (Relational.q10_anti_join _),
    "q11_overlay" -> (EtlQueries.q11_overlay _),
    "q12_spine_merge" -> (EtlQueries.q12_spine_merge _),
    "q13_fk_remap" -> (EtlQueries.q13_fk_remap _),
    "q14_constants" -> (Relational.q14_constants _),
    "q15_values_cast" -> (Relational.q15_values_cast _),
    "q16_range_join" -> (Relational.q16_range_join _),
    "q26_asof_join" -> (Relational.q26_asof_join _),
    "q17_string_funcs" -> (Relational.q17_string_funcs _),
    "q18_case_expr" -> (Relational.q18_case_expr _),
    "q19_date_extract" -> (Relational.q19_date_extract _),
    "q20_in_subquery" -> (Relational.q20_in_subquery _),
    "q21_agg_having" -> (Relational.q21_agg_having _),
    "q22_scalar_subquery" -> (Relational.q22_scalar_subquery _),
    "q23_events_window" -> (Relational.q23_events_window _),
    "q24_sessionize" -> (Relational.q24_sessionize _),
    "q25_theta_join" -> (Relational.q25_theta_join _),
    "q27_count_distinct" -> (Relational.q27_count_distinct _),
    "q28_rollup" -> (Relational.q28_rollup _),
    "q29_pivot" -> (Relational.q29_pivot _),
    "q30_percentile" -> (Relational.q30_percentile _),
    "q31_full_outer" -> (Relational.q31_full_outer _),
    "q32_lead_lag" -> (Relational.q32_lead_lag _),
    "q33_intersect_except" -> (Relational.q33_intersect_except _),
    "q34_listagg" -> (Relational.q34_listagg _),
    "q35_json" -> (Relational.q35_json _),
    "q36_cube" -> (Relational.q36_cube _),
    "ev_anomaly" -> (Relational.ev_anomaly _),
    "ev_hll" -> (Relational.ev_hll _),
    "q37_lateral" -> (Relational.q37_lateral _),
    "q38_range_frame" -> (Relational.q38_range_frame _),
    "q39_unpivot" -> (Relational.q39_unpivot _),
    "q40_recursive" -> (Relational.q40_recursive _),
    "q41_grouping_sets" -> (Relational.q41_grouping_sets _),
    "q42_locf" -> (Relational.q42_locf _),
    "q43_interp" -> (Relational.q43_interp _),
    // LLM-data-pipeline operators (builder brief; SURVEY.md §7.7)
    "dd_exact" -> (Dedup.dd_exact _),
    "dd_fingerprint" -> (Dedup.dd_fingerprint _),
    "dd_minhash" -> ((s, d) => Dedup.dd_minhash(s, d)),
    "dd_simhash" -> ((s, d) => Dedup.dd_simhash(s, d)),
    "dd_ngram_jaccard" -> ((s, d) => Dedup.dd_ngram_jaccard(s, d)),
    "dd_embed_cosine" -> ((s, d) => Dedup.dd_embed_cosine(s, d)),
    "dd_embed_lsh" -> ((s, d) => Dedup.dd_embed_lsh(s, d)),
    "dd_semdedup" -> ((s, d) => Dedup.dd_semdedup(s, d)),
    "ann_bruteforce" -> ((s, d) => Similarity.ann_bruteforce(s, d)),
    "ann_radius" -> ((s, d) => Similarity.ann_radius(s, d)),
    "ann_lsh" -> ((s, d) => Similarity.ann_lsh(s, d)),
    "ann_ivf" -> ((s, d) => Similarity.ann_ivf(s, d)),
    "ann_pq" -> ((s, d) => Similarity.ann_pq(s, d)),
    "ann_ivfpq" -> ((s, d) => Similarity.ann_ivfpq(s, d)),
    // index lifecycle report (no_oracle: deterministic build + planted
    // drift; contract pinned by PipelineSpec)
    "idx_health" -> (Similarity.idx_health _),
    "tx_stats" -> (TextAnalysis.tx_stats _),
    "tx_tokens" -> (TextAnalysis.tx_tokens _),
    "tx_quality" -> (TextAnalysis.tx_quality _),
    "tx_langid" -> (TextAnalysis.tx_langid _),
    "tx_langid_eval" -> (TextAnalysis.tx_langid_eval _),
    "tx_langid2" -> ((s, d) => TextAnalysis.tx_langid2(s, d)),
    "tx_langid2_eval" -> ((s, d) => TextAnalysis.tx_langid2_eval(s, d)),
    "mm_pipeline" -> (Multimodal.mm_pipeline _),
    "mm_dedup" -> (Multimodal.mm_dedup _),
    // planted-re-encode form: self-verifying rows (one pair per plant)
    "mm_phash" -> ((s, d) => Multimodal.mm_phash_reenc(s, d)),
    // the exact fingerprint half, under full DuckDB oracle
    "mm_phash_fp" -> (Multimodal.mm_phash_fp _),
    "mm_semdedup" -> ((s, d) => Multimodal.mm_semdedup(s, d)),
    "dd_cluster" -> ((s, d) => Dedup.dd_cluster(s, d)),
    "dd_cluster_jaccard" -> ((s, d) => Dedup.dd_cluster_jaccard(s, d)),
    "tx_ngrams" -> ((s, d) => TextAnalysis.tx_ngrams(s, d)),
    "tx_fingerprint" -> ((s, d) => TextAnalysis.tx_fingerprint(s, d)),
    "embed_centroids" -> (TextAnalysis.embed_centroids _),
    "tx_norm" -> (TextAnalysis.tx_norm _),
    "tx_repetition" -> ((s, d) => TextAnalysis.tx_repetition(s, d)),
    "dd_para" -> ((s, d) => Curation.dd_para(s, d)),
    "samp_stratified" -> ((s, d) => Curation.samp_stratified(s, d)),
    "samp_reservoir" -> ((s, d) => Curation.samp_reservoir(s, d)),
    "samp_balanced" -> ((s, d) => Curation.samp_balanced(s, d)),
    "samp_split" -> (Curation.samp_split _),
    "decon_ngram" -> ((s, d) => Curation.decon_ngram(s, d)),
    "decon_jaccard" -> ((s, d) => Curation.decon_jaccard(s, d)),
    "pipeline_curate" -> (Curation.pipeline_curate _),
    "pipeline_train" -> ((s, d) => Curation.pipeline_train(s, d)),
    "tx_gopher" -> ((s, d) => TextAnalysis.tx_gopher(s, d)),
    "tx_salient" -> ((s, d) => TextAnalysis.tx_salient(s, d)),
    "embed_quantize" -> (TextAnalysis.embed_quantize _),
    "tx_heavy" -> ((s, d) => TextAnalysis.tx_heavy(s, d)),
    "tx_blocklist" -> ((s, d) => TextAnalysis.tx_blocklist(s, d)),
    "q44_regex" -> (Relational.q44_regex _),
    "embed_kmeans_assign" -> ((s, d) => Clustering.embed_kmeans_assign(s, d)),
    "embed_kmeans" -> ((s, d) => Clustering.embed_kmeans(s, d)),
    "embed_pq" -> ((s, d) => Clustering.embed_pq(s, d)),
    "ev_quantile" -> (Relational.ev_quantile _),
    "tx_vocab" -> ((s, d) => TextAnalysis.tx_vocab(s, d)),
    "q45_nulls" -> (Relational.q45_nulls _),
    "samp_pack" -> ((s, d) => Curation.samp_pack(s, d)),
    "samp_temperature" -> (Curation.samp_temperature _),
    "q46_session_native" -> (Relational.q46_session_native _),
    "q47_corr_subquery" -> (Relational.q47_corr_subquery _),
    "ev_funnel" -> (Relational.ev_funnel _),
    "ev_retention" -> (Relational.ev_retention _),
    "tx_surprisal" -> (TextAnalysis.tx_surprisal _),
    "tx_perplexity" -> (TextAnalysis.tx_perplexity _),
    "tx_colloc" -> ((s, d) => TextAnalysis.tx_colloc(s, d)),
    "tx_bm25" -> ((s, d) => TextAnalysis.tx_bm25(s, d)),
    "tx_pii" -> (TextAnalysis.tx_pii _),
    // raw-web boilerplate extraction over planted HTML pages
    "tx_extract" -> ((s, d) => TextAnalysis.tx_extract(s, d)),
    // URL family: parse+blocklist gate, URL-level dedup, host census
    "tx_url" -> (TextAnalysis.tx_url _),
    "tx_url_dedup" -> (TextAnalysis.tx_url_dedup _),
    "tx_url_hosts" -> (TextAnalysis.tx_url_hosts _),
    // fasttext-style learned quality scorer over hashed bigram features
    "tx_score" -> (TextAnalysis.tx_score _),
    "dd_spans" -> ((s, d) => Dedup.dd_spans(s, d)),
    "dd_incremental" -> ((s, d) => Dedup.dd_incremental(s, d)),
    "q48_upsert" -> (Relational.q48_upsert _),
    "dd_spans_trim" -> ((s, d) => Dedup.dd_spans_trim(s, d)),
    "pipeline_incremental" -> (Curation.pipeline_incremental _),
    "q49_scd2" -> (Relational.q49_scd2 _),
    "tx_compress" -> (TextAnalysis.tx_compress _),
    "tx_bpe" -> ((s, d) => TextAnalysis.tx_bpe(s, d)),
    "tx_bpe_encode" -> ((s, d) => TextAnalysis.tx_bpe_encode(s, d)),
    "pipeline_card" -> (Curation.pipeline_card _),
    "q50_gapfill" -> (Relational.q50_gapfill _),
    "dd_exact_best" -> ((s, d) => Dedup.dd_exact_best(s, d)),
    "ann_ivfpq_refined" -> ((s, d) => Similarity.ann_ivfpq_refined(s, d)),
    "dd_containment" -> ((s, d) => Dedup.dd_containment(s, d)),
    "decon_embed" -> ((s, d) => Curation.decon_embed(s, d)),
    "ann_sq" -> ((s, d) => Similarity.ann_sq(s, d)),
    "samp_mixture" -> (Curation.samp_mixture _),
    "samp_mixture_train" -> ((s, d) => Curation.samp_mixture_train(s, d)),
    "samp_mixture_train_excess" -> ((s, d) => Curation.samp_mixture_train_excess(s, d)),
    "samp_mixture_trained_excess" -> ((s, d) => Curation.samp_mixture_trained_excess(s, d)),
    "samp_mixture_trained" -> ((s, d) => Curation.samp_mixture_trained(s, d)),
    "q51_histogram" -> (Relational.q51_histogram _),
    "q52_rank_stats" -> (Relational.q52_rank_stats _),
    "src_jsonl" -> (graft.sources.Jsonl.src_jsonl _),
    "pipeline_release" -> (Curation.pipeline_release _),
    "samp_upsample" -> (Curation.samp_upsample _),
    "q53_time_range_frame" -> (Relational.q53_time_range_frame _),
    "q54_filtered_agg" -> (Relational.q54_filtered_agg _),
    "src_orc" -> (graft.sources.Orc.src_orc _),
    "q55_sliding_window" -> (Relational.q55_sliding_window _),
    "profile_table" -> (Curation.profile_table _),
    "ev_transitions" -> (Relational.ev_transitions _),
    "tx_entropy" -> (TextAnalysis.tx_entropy _),
    "q56_mode" -> (Relational.q56_mode _),
    "tx_readability" -> (TextAnalysis.tx_readability _),
    "samp_importance" -> ((s, d) => Curation.samp_importance(s, d)),
    // published-form DSIR: exact-integer log-ratio weights + Gumbel top-k
    "samp_dsir" -> ((s, d) => Curation.samp_dsir(s, d)),
    "ev_dwell" -> (Relational.ev_dwell _),
    "ev_reach" -> (Relational.ev_reach _),
    // corpus-level line dedup with rewrite (C4's repeated-line pass)
    "dd_lines" -> ((s, d) => Curation.dd_lines(s, d)),
    // top first-k journey-path census
    "ev_paths" -> ((s, d) => Relational.ev_paths(s, d)),
    // release-to-release snapshot diff census
    "rel_diff" -> (Curation.rel_diff _),
    "profile_drift" -> (Curation.profile_drift _),
    // signed random projection over the shared int8 codes
    "embed_rp" -> ((s, d) => Clustering.embed_rp(s, d)),
    // greedy k-center coreset selection (farthest-point traversal)
    "samp_kcenter" -> ((s, d) => Clustering.samp_kcenter(s, d)),
    "samp_kcenter_fast" -> ((s, d) => Clustering.samp_kcenter_fast(s, d)),
    "samp_kcenter_sharded" -> ((s, d) => Clustering.samp_kcenter_sharded(s, d)),
    "samp_kcenter_assign" -> ((s, d) => Clustering.samp_kcenter_assign(s, d)),
    // coverage-weighted curriculum: phases by the assign frame's d2_fp
    "samp_curriculum_coverage" ->
      ((s, d) => Clustering.samp_curriculum_coverage(s, d)),
    // composed coverage x quality schedule (lexicographic 16 phases)
    "samp_curriculum_mixed" ->
      ((s, d) => Clustering.samp_curriculum_mixed(s, d)),
    // CSV round trip certified against the parquet originals
    "src_csv" -> (graft.sources.Csv.src_csv _),
    // link-graph centrality over the planted citation graph
    "graph_pagerank" -> ((s, d) => Graph.graph_pagerank(s, d)),
    "graph_hits" -> ((s, d) => Graph.graph_hits(s, d)),
    // citation-island census via alternating large-star/small-star CC
    "graph_cc" -> ((s, d) => Graph.graph_cc(s, d)),
    // the per-document label frame behind the census (memoized artifact)
    "graph_cc_labels" -> ((s, d) => Graph.ccLabels(s, d).orderBy("doc_id")),
    "graph_degrees" -> (Graph.graph_degrees _),
    // last-touch revenue attribution per channel
    "ev_attribution" -> (Relational.ev_attribution _),
    // URL-provenance decontamination (the decon family's third screen)
    "decon_url" -> ((s, d) => Curation.decon_url(s, d)),
    "decon_bm25" -> ((s, d) => Curation.decon_bm25(s, d)),
    "decon_spans" -> ((s, d) => Curation.decon_spans(s, d)),
    "decon_spans_trim" -> ((s, d) => Curation.decon_spans_trim(s, d)),
    "samp_split_leakfree" -> ((s, d) => Curation.samp_split_leakfree(s, d)),
    // the graph face: split anchors from link components (ccLabels)
    "samp_split_leakfree_graph" ->
      ((s, d) => Curation.samp_split_leakfree_graph(s, d)),
    "pipeline_decon" -> ((s, d) => Curation.pipeline_decon(s, d)),
    "ev_coverage" -> (Relational.ev_coverage _),
    "ev_ewma" -> ((s, d) => Relational.ev_ewma(s, d)),
    "samp_curriculum" -> ((s, d) => Curation.samp_curriculum(s, d)),
    "graph_domains" -> ((s, d) => Graph.graph_domains(s, d)),
    "tx_score_train" -> ((s, d) => TextAnalysis.tx_score_train(s, d)),
    "tx_score_trained" -> ((s, d) => TextAnalysis.tx_score_trained(s, d)),
    // reproducible sharded training-order shuffle
    "samp_shuffle" -> ((s, d) => Curation.samp_shuffle(s, d)),
    // embeddings-table audit (profile_table's vector-side sibling)
    "profile_embeddings" -> (Curation.profile_embeddings _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] = OracleSql.sql
}
