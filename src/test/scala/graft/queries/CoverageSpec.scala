package graft.queries

import graft.{SparkEntry, SparkSuite}

/** Every declared query must run green on sf0.001 and the ones with known
  * non-empty semantics must return rows — catches silent empty results that
  * would trivially "hash-match" a broken oracle.
  */
class CoverageSpec extends SparkSuite {

  // queries where an empty result at sf0.001 would itself be a bug
  private val mustBeNonEmpty = Set(
    "q01_agg_sum", "q02_filter_dates", "q03_join_agg", "q04_window_rank",
    "q05_union_distinct", "q06_gap_detect", "q07_scalar_kitchen",
    "q08_map_replace", "q10_predicate_suite", "q11_topk_per_group",
    "q12_sort_limit", "q14_right_join", "q15_composite_join",
    "q16_global_numbering", "q17_distinct_pairs", "q18_first_per_group",
    "q19_minmax_avg", "q20_conditional_agg", "q21_distinct_values",
    "q22_json_extract", "q23_explode_tokens", "q24_array_ops",
    "q25_upsert_merge", "q26_text_stats", "q27_lang_id", "q28_dedup_exact",
    "q29_ngram_jaccard", "q30_minhash_pairs", "q31_simhash_pairs",
    "q32_multimodal_meta", "q33_vec_stats", "q34_cosine_topk",
    "q35_cosine_lsh", "q36_invoice_pipeline", "q37_time_buckets",
    "q38_session_gaps", "q39_session_counts", "q40_salted_join",
    "q41_text_quality", "q42_cosine_ivf", "q43_embedding_neardup",
    "q44_rollup", "q45_sql_api", "q46_customer_map", "q47_dedup_groups",
    "q48_dedup_corpus", "q49_contamination", "q50_stratified_sample",
    "q51_quantize_int8", "q52_repetition", "q53_pii_scrub", "q54_asof_join",
    "q55_range_join", "q56_multimodal_decode", "q57_kmv_distinct",
    "q58_topk_custom", "q59_pivot", "q60_percentiles", "q61_window_suite",
    "q62_tfidf_top", "q63_vocabulary", "q64_sequence_pack",
    "q65_passage_dedup", "q66_mixture", "q67_quality_filter",
    "q68_hash_split", "q69_incremental_dedup", "q70_zorder_keys",
    "q71_stream_upsert", "q72_ivf_recall", "q73_jpeg_decode",
    "q75_mulaw_decode", "q76_quality_deciles",
    "q77_token_chunks", "q78_lsh_recall", "q79_image_resize",
    "q80_frame_sample", "q81_bloom_decontam", "q82_weighted_sample",
    "q83_semantic_dedup", "q84_stream_interval_join",
    "q85_heavy_hitters", "q86_range_frame",
    "q87_phrase_search", "q88_stream_state_agg", "q89_bucketed_join",
    "q90_stream_dedup", "q91_ngram_novelty", "q92_stream_windowed_agg",
    "q93_stream_sessionize", "q94_compaction", "q95_sparse_retrieval",
    "q96_upsert_changelog", "q97_time_travel", "q98_hybrid_retrieval",
    "q99_quantile_sketch",
    "q100_corpus_build",
    "q101_incremental_agg",
    "q102_snapshot_diff",
    "q103_cdc_agg",
    "q104_grouping_sets",
    "q105_interval_merge",
    "q106_unpivot",
    "q107_stream_static_join",
    "q108_column_profile",
    "q109_funnel",
    "q110_cohort_retention",
    "q111_cube",
    "q112_epoch_shuffle",
    "q113_scd2",
    "q114_copurchase_pairs",
    "q115_copurchase_rank",
    "q116_feature_hash",
    "q117_mad_anomaly",
    "q118_golden_record",
    "q119_gap_fill",
    "q120_session_transitions",
    "q121_key_skew",
    "q122_rfm",
    "q123_pareto_abc",
    "q189_mp3_walk", "q190_h264_walk", "q191_k_anonymity",
    "q192_event_pattern", "q193_variant_extract", "q194_xml_roundtrip",
    "q195_stream_tws", "q197_domain_cap", "q198_wilson_sources",
    "q199_skyline", "q200_cusum", "q201_gif_decode", "q202_theil_sen",
    "q203_benford_audit", "q204_stream_timer_sessions",
    "q205_incremental_view", "q206_bloom_join", "q207_dynamic_overwrite",
    "q208_stream_full_outer", "q209_decay_weights", "q210_char_entropy",
    "q211_logreg_quality", "q212_statestore_read", "q213_dedup_bounded",
    "q214_winnowing", "q215_label_propagation", "q216_bfs_hops",
    "q217_assoc_rules", "q218_embed_standardize", "q219_image_neardup",
    "q220_kcore", "q221_multi_publish", "q222_quantile_norm",
    "q223_geometric_median", "q224_itemset_triples", "q225_ivf_incremental",
    "q226_ivf_retrain_trigger", "q227_cdc_exactly_once", "q228_writer_fence")
  // q74 may legitimately find 0 pairs at sf0.001; q196's n12 ≥ 5 floor can
  // be empty on the 50-doc fixture — both consciously absent above

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val n = fn(spark, sf).count()
      if (mustBeNonEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("docs state the actual query count") {
    // every "N queries" claim in the README must match SparkEntry (the
    // round-6 verdict caught stale 70/71 counts drifting in comments)
    val n = SparkEntry.queries.size
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val counts = """(\d+) queries""".r.findAllMatchIn(readme).map(_.group(1).toInt).toSeq
    assert(counts.nonEmpty, "README should describe the query set")
    counts.foreach(c => assert(c == n, s"README says '$c queries' but SparkEntry has $n"))
    // every query has an oracle (or is consciously absent from both maps)
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }
}
