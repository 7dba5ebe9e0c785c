package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{PipelineQueries => P, WarehouseQueries => W}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every SURVEY.md §2 row registers a query here; every ANSI-SQL-
  * expressible row also registers a DuckDB oracle with identical column
  * names (the driver's compare sorts columns by name before hashing).
  * Hash-based ops (q21, q22, q31) have no oracle by design → rows-only
  * checks.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    W.q10DashboardRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_clean_filter"            -> (W.q01CleanFilter _),
    "q02_derived_measures"        -> (W.q02DerivedMeasures _),
    "q03_date_dim"                -> (W.q03DateDim _),
    "q04_scd2_build"              -> (W.q04Scd2Build _),
    "q05_scd_point_in_time_join"  -> (W.q05PointInTimeJoin _),
    "q06_remove_one_day_changes"  -> (W.q06RemoveOneDayChanges _),
    "q07_star_flatten"            -> (W.q07StarFlatten _),
    "q08_unknown_member"          -> (W.q08UnknownMember _),
    "q09_static_dim"              -> (W.q09StaticDim _),
    "q10_dashboard_revenue"       -> (W.q10DashboardRevenue _),
    "q11_dashboard_topn"          -> (W.q11DashboardTopN _),
    "q12_incremental_delta"       -> (W.q12IncrementalDelta _),
    "q13_scd_merge"               -> (W.q13ScdMerge _),
    "q14_dedup_natural_key"       -> (W.q14DedupNaturalKey _),
    "q15_full_measures"           -> (W.q15FullMeasures _),
    "q16_lookup_backfill"         -> (W.q16LookupBackfill _),
    "q17_typed_ingest"            -> (W.q17TypedIngest _),
    "q18_sessionize"              -> (W.q18Sessionize _),
    "q19_rollup_dashboard"        -> (W.q19RollupDashboard _),
    "q60_pivot_dashboard"         -> (W.q60PivotDashboard _),
    "q61_column_profile"          -> (W.q61ColumnProfile _),
    "q65_skew_join"               -> (W.q65SkewJoin _),
    "q69_moving_avg"              -> (W.q69MovingAvg _),
    "q70_cohort_retention"        -> (W.q70CohortRetention _),
    "q74_histogram"               -> (W.q74Histogram _),
    "q75_json_extract"            -> (W.q75JsonExtract _),
    "q76_funnel"                  -> (W.q76Funnel _),
    "q77_surrogate_star"          -> (W.q77SurrogateStar _),
    "q78_date_unknown_member"     -> (W.q78DateUnknownMember _),
    "q79_asof_join"               -> (W.q79AsofJoin _),
    "q80_interval_join"           -> (W.q80IntervalJoin _),
    "q20_dedup_exact"             -> (P.q20DedupExact _),
    "q21_dedup_minhash"           -> (P.q21DedupMinHash _),
    "q22_dedup_simhash"           -> (P.q22DedupSimHash _),
    "q23_dedup_ngram_jaccard"     -> (P.q23NgramJaccard _),
    "q24_dedup_embedding"         -> (P.q24DedupEmbedding _),
    "q25_dedup_embedding_lsh"     -> (P.q25DedupEmbeddingLsh _),
    "q26_dedup_clusters"          -> (P.q26DedupClusters _),
    "q27_stratified_sample"       -> (P.q27StratifiedSample _),
    "q28_token_budget"            -> (P.q28TokenBudget _),
    "q29_dataset_card"            -> (P.q29DatasetCard _),
    "q52_sequence_pack"           -> (P.q52SequencePack _),
    "q68_chunk_spans"             -> (P.q68ChunkSpans _),
    "q72_split_assign"            -> (P.q72SplitAssign _),
    "q30_ann_bruteforce"          -> (P.q30AnnBruteForce _),
    "q31_ann_lsh"                 -> (P.q31AnnLsh _),
    "q32_ann_ivf"                 -> (P.q32AnnIvf _),
    "q66_ann_pq"                  -> (P.q66AnnPq _),
    "q67_filtered_ann"            -> (P.q67FilteredAnn _),
    "q40_text_langid"             -> (P.q40TextLangId _),
    "q41_text_quality"            -> (P.q41TextQuality _),
    "q42_token_count"             -> (P.q42TokenCount _),
    "q43_text_fingerprint"        -> (P.q43TextFingerprint _),
    "q44_rolling_fingerprint"     -> (P.q44RollingFingerprint _),
    "q45_pii_scrub"               -> (P.q45PiiScrub _),
    "q46_quality_filter"          -> (P.q46QualityFilter _),
    "q47_repetition"              -> (P.q47Repetition _),
    "q48_decontaminate"           -> (P.q48Decontaminate _),
    "q49_common_grams"            -> (P.q49CommonGrams _),
    "q71_vocabulary"              -> (P.q71Vocabulary _),
    "q73_tfidf_keywords"          -> (P.q73TfidfKeywords _),
    "q62_quantile_cutoff"         -> (P.q62QuantileCutoff _),
    "q63_substring_dup"           -> (P.q63SubstringDup _),
    "q64_incremental_dedup"       -> (P.q64IncrementalDedup _),
    "q50_multimodal_meta"         -> (P.q50MultimodalMeta _),
    "q81_image_meta"              -> (P.q81ImageMeta _),
    "q82_audio_meta"              -> (P.q82AudioMeta _),
    "q51_multimodal_frame_dedup"  -> (P.q51MultimodalFrameDedup _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (q21 MinHash, q22 SimHash, q31 LSH) → rows-only checks. */
  def oracleSql: Map[String, String] = Map(
    "q01_clean_filter"            -> W.q01Oracle,
    "q02_derived_measures"        -> W.q02Oracle,
    "q03_date_dim"                -> W.q03Oracle,
    "q04_scd2_build"              -> W.q04Oracle,
    "q05_scd_point_in_time_join"  -> W.q05Oracle,
    "q06_remove_one_day_changes"  -> W.q06Oracle,
    "q07_star_flatten"            -> W.q07Oracle,
    "q08_unknown_member"          -> W.q08Oracle,
    "q09_static_dim"              -> W.q09Oracle,
    "q10_dashboard_revenue"       -> W.q10Oracle,
    "q11_dashboard_topn"          -> W.q11Oracle,
    "q12_incremental_delta"       -> W.q12Oracle,
    "q13_scd_merge"               -> W.q13Oracle,
    "q14_dedup_natural_key"       -> W.q14Oracle,
    "q15_full_measures"           -> W.q15Oracle,
    "q16_lookup_backfill"         -> W.q16Oracle,
    "q17_typed_ingest"            -> W.q17Oracle,
    "q18_sessionize"              -> W.q18Oracle,
    "q19_rollup_dashboard"        -> W.q19Oracle,
    "q60_pivot_dashboard"         -> W.q60Oracle,
    "q61_column_profile"          -> W.q61Oracle,
    "q65_skew_join"               -> W.q65Oracle,
    "q69_moving_avg"              -> W.q69Oracle,
    "q70_cohort_retention"        -> W.q70Oracle,
    "q74_histogram"               -> W.q74Oracle,
    "q75_json_extract"            -> W.q75Oracle,
    "q76_funnel"                  -> W.q76Oracle,
    "q77_surrogate_star"          -> W.q77Oracle,
    "q78_date_unknown_member"     -> W.q78Oracle,
    "q79_asof_join"               -> W.q79Oracle,
    "q80_interval_join"           -> W.q80Oracle,
    "q20_dedup_exact"             -> P.q20Oracle,
    "q23_dedup_ngram_jaccard"     -> P.q23Oracle,
    "q24_dedup_embedding"         -> P.q24Oracle,
    "q26_dedup_clusters"          -> P.q26Oracle,
    "q27_stratified_sample"       -> P.q27Oracle,
    "q28_token_budget"            -> P.q28Oracle,
    "q29_dataset_card"            -> P.q29Oracle,
    "q52_sequence_pack"           -> P.q52Oracle,
    "q68_chunk_spans"             -> P.q68Oracle,
    "q72_split_assign"            -> P.q72Oracle,
    "q30_ann_bruteforce"          -> P.q30Oracle,
    "q67_filtered_ann"            -> P.q67Oracle,
    "q40_text_langid"             -> P.q40Oracle,
    "q41_text_quality"            -> P.q41Oracle,
    "q42_token_count"             -> P.q42Oracle,
    "q43_text_fingerprint"        -> P.q43Oracle,
    "q44_rolling_fingerprint"     -> P.q44Oracle,
    "q45_pii_scrub"               -> P.q45Oracle,
    "q46_quality_filter"          -> P.q46Oracle,
    "q47_repetition"              -> P.q47Oracle,
    "q48_decontaminate"           -> P.q48Oracle,
    "q49_common_grams"            -> P.q49Oracle,
    "q71_vocabulary"              -> P.q71Oracle,
    "q73_tfidf_keywords"          -> P.q73Oracle,
    "q62_quantile_cutoff"         -> P.q62Oracle,
    "q63_substring_dup"           -> P.q63Oracle,
    "q64_incremental_dedup"       -> P.q64Oracle,
    "q50_multimodal_meta"         -> P.q50Oracle,
    "q81_image_meta"              -> P.q81Oracle,
    "q82_audio_meta"              -> P.q82Oracle
  )
}
