package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.{Cdc, Discovery, Materialize, Monitoring, Quality}
import graft.analytics.{Relational, SketchGates, Sketches}
import graft.text.TextFunctions
import graft.dedup.Dedup
import graft.similarity.Ann
import graft.multimodal.{Binary, Video}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every query is `(spark, sfDir) => DataFrame` with a deterministic sort
  * and column names that match its `oracleSql` entry exactly. Sums run on
  * DECIMAL inputs (exact, order-independent) so Spark and DuckDB agree.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── CDC core ─────────────────────────────────────────────────────
    "cdc_op_normalize" -> ((s, d) =>
      Cdc.changelog(s, d)
        .groupBy(col("op"), Cdc.normalizeOp(col("op")).as("event_class"))
        .agg(count(lit(1)).as("n"))
        .orderBy("op")),
    "cdc_unwrap" -> ((s, d) =>
      Cdc.unwrap(Cdc.parseEnvelope(Cdc.toWire(s, d)))
        .orderBy("user_id", "__source_ts_ms", "__op", "value")),
    "cdc_parse_envelope" -> ((s, d) =>
      Cdc.parseEnvelope(Cdc.toWire(s, d))
        .select(
          col("offset"), col("server_name"), col("schema_name"), col("table_name"),
          Cdc.normalizeOp(col("op")).as("event_class"), col("ts_ms"),
          coalesce(col("after.user_id"), col("before.user_id")).as("payload_user_id"),
          coalesce(col("after.value"), col("before.value")).as("payload_value"))
        .orderBy("offset")),
    "cdc_materialize_latest" -> ((s, d) =>
      Materialize.latestSnapshot(Cdc.changelog(s, d)).orderBy("user_id")),
    "cdc_fanout_apply" -> ((s, d) =>
      Materialize.fanoutApply(Cdc.parseEnvelope(Cdc.toWire(s, d)))
        .orderBy("table_name", "user_id")),
    "cdc_scd2_history" -> ((s, d) =>
      Materialize.scd2(Cdc.changelog(s, d)).orderBy("user_id", "valid_from", "seq")),
    "cdc_append_audit" -> ((s, d) =>
      Materialize.appendAudit(Cdc.changelog(s, d)).orderBy("run_seq")),
    "cdc_dedup_replay" -> ((s, d) => Materialize.dedupReplay(Cdc.changelog(s, d))),
    "cdc_snapshot_chunked" -> ((s, d) => Materialize.snapshotChunked(s, d)),
    "cdc_event_counts" -> ((s, d) => Monitoring.eventCounts(Cdc.changelog(s, d))),
    "cdc_events_per_minute" -> ((s, d) => Monitoring.eventsPerMinute(Cdc.changelog(s, d))),
    "cdc_throughput" -> ((s, d) => Monitoring.throughput(Cdc.changelog(s, d))),
    "cdc_lag_trend" -> ((s, d) => Monitoring.lagTrend(Cdc.changelog(s, d))),
    "cdc_alert_eval" -> ((s, d) => Monitoring.alertEval(s, Cdc.changelog(s, d))),
    "cdc_delete_ratio" -> ((s, d) => Monitoring.deleteRatio(Cdc.changelog(s, d))),
    "cdc_topic_route" -> ((s, d) => Monitoring.topicRoute(Cdc.toWire(s, d))),
    "cdc_status_board" -> ((s, d) => Monitoring.statusBoard(s, d)),
    "cdc_op_transitions" -> ((s, d) => Monitoring.opTransitions(Cdc.changelog(s, d))),
    "cdc_health_score" -> ((s, d) => Monitoring.healthScore(Cdc.changelog(s, d))),
    "cdc_alert_suppress" -> ((s, d) => Monitoring.alertSuppress(Cdc.changelog(s, d))),
    "cdc_alert_dispatch" -> ((s, d) => Monitoring.alertDispatch(s, Cdc.changelog(s, d))),
    "cdc_incremental_agg" -> ((s, d) =>
      Monitoring.incrementalAgg(Cdc.changelog(s, d), cutoverSeq = 5000L)),
    "cdc_compact" -> ((s, d) =>
      Materialize.compact(Cdc.changelog(s, d)).orderBy("user_id", "rn")),
    "cdc_tombstone_gc" -> ((s, d) =>
      Materialize.tombstoneGc(Cdc.changelog(s, d)).orderBy("user_id")),
    "cdc_disorder_stats" -> ((s, d) => Monitoring.disorderStats(Cdc.changelog(s, d))),
    "cdc_heartbeat_gap" -> ((s, d) => Monitoring.heartbeatGaps(Cdc.changelog(s, d))),
    "cdc_partition_skew" -> ((s, d) => Monitoring.partitionSkew(Cdc.changelog(s, d))),
    "cdc_outbox_route" -> ((s, d) => Monitoring.outboxRoute(Cdc.toWire(s, d))),
    "cdc_dlq_route" -> ((s, d) => Cdc.dlqRoute(Cdc.toWire(s, d))),
    "cdc_snapshot_progress" -> ((s, d) => Materialize.snapshotProgress(s, d)),
    "cdc_lag_percentiles" -> ((s, d) => Monitoring.lagPercentiles(Cdc.changelog(s, d))),
    "cdc_mask_policy" -> ((s, d) => graft.governance.Masking.maskedCustomers(s, d)),
    "cdc_snapshot_handoff" -> ((s, d) =>
      Materialize.snapshotHandoff(Cdc.changelog(s, d), cutoverSeq = 500L).orderBy("user_id")),
    "cdc_schema_evolve" -> ((s, d) => Quality.schemaEvolve(s, d)),
    "cdc_rowcount_validate" -> ((s, d) => Quality.rowcountValidate(s, d)),
    "cdc_integrity_stats" -> ((s, d) => Quality.integrityStats(s, d)),
    "cdc_schema_drift" -> ((s, d) => Quality.schemaDrift(s, d)),
    "cdc_schema_compat" -> ((s, d) => Quality.schemaCompat(s, d)),
    // ── Relational analytics ─────────────────────────────────────────
    "q1_agg" -> ((s, d) => Relational.q1Agg(s, d)),
    "q3_topk" -> ((s, d) => Relational.q3TopK(s, d)),
    "q5_multijoin" -> ((s, d) => Relational.q5MultiJoin(s, d)),
    "q_window_rank" -> ((s, d) => Relational.windowRank(s, d)),
    "q_semi_anti" -> ((s, d) => Relational.semiAnti(s, d)),
    "q_agg_stats" -> ((s, d) => Relational.aggStats(s, d)),
    "q_rollup" -> ((s, d) => Relational.rollupAgg(s, d)),
    "q_json_extract" -> ((s, d) => Relational.jsonExtract(s, d)),
    "q_pivot" -> ((s, d) => Relational.pivotSegments(s, d)),
    "q_exists" -> ((s, d) => Relational.existsLateShip(s, d)),
    "q_scalar_subquery" -> ((s, d) => Relational.scalarSubquery(s, d)),
    "q_setops" -> ((s, d) => Relational.setOps(s, d)),
    "q_sessionize" -> ((s, d) => Relational.sessionize(s, d)),
    "q_order_gaps" -> ((s, d) => Relational.orderGaps(s, d)),
    "q_rfm" -> ((s, d) => Relational.rfm(s, d)),
    "q_mode" -> ((s, d) => Relational.modeReturnflag(s, d)),
    "q_first_last" -> ((s, d) => Relational.firstLast(s, d)),
    "q_salted_join" -> ((s, d) => Relational.saltedJoin(s, d)),
    "q_asof_join" -> ((s, d) => graft.operators.TemporalJoins.asofJoin(s, d)),
    "q_asof_join_native" -> ((s, d) => graft.operators.TemporalJoins.asofJoinNative(s, d)),
    "q_asof_join_composed" -> ((s, d) => graft.operators.TemporalJoins.asofJoinComposed(s, d)),
    "q_asof_join_tolerance" -> ((s, d) => graft.operators.TemporalJoins.asofJoinTolerance(s, d)),
    "q_asof_join_tolerance_composed" -> ((s, d) => graft.operators.TemporalJoins.asofJoinToleranceComposed(s, d)),
    "q_range_join" -> ((s, d) => graft.operators.TemporalJoins.rangeJoin(s, d)),
    "q_grouping_sets" -> ((s, d) => Relational.groupingSets(s, d)),
    "q_moving_avg" -> ((s, d) => Relational.movingAvg(s, d)),
    // ── Text analysis ────────────────────────────────────────────────
    "text_tokens" -> ((s, d) => TextFunctions.tokens(s, d)),
    "text_sentence_stats" -> ((s, d) => TextFunctions.sentenceStats(s, d)),
    "text_hapax" -> ((s, d) => TextFunctions.hapax(s, d)),
    "text_readability" -> ((s, d) => TextFunctions.readability(s, d)),
    "pipe_quality_by_lang" -> ((s, d) => TextFunctions.qualityByLang(s, d)),
    "text_quality" -> ((s, d) => TextFunctions.quality(s, d)),
    "text_langid" -> ((s, d) => TextFunctions.langId(s, d)),
    "text_lang_confusion" -> ((s, d) => TextFunctions.langConfusion(s, d)),
    "text_fingerprint" -> ((s, d) => TextFunctions.fingerprint(s, d)),
    "text_ngrams" -> ((s, d) => TextFunctions.ngrams(s, d)),
    "text_source_stats" -> ((s, d) => TextFunctions.sourceStats(s, d)),
    "pipe_train_split" -> ((s, d) => TextFunctions.trainSplit(s, d)),
    "pipe_epoch_shuffle" -> ((s, d) => TextFunctions.epochShuffle(s, d)),
    "text_quality_bins" -> ((s, d) => TextFunctions.qualityBins(s, d)),
    "pipe_corpus_filter" -> ((s, d) => TextFunctions.corpusFilter(s, d)),
    "text_doc_freq" -> ((s, d) => TextFunctions.termDocFreq(s, d)),
    // ── Dedup ────────────────────────────────────────────────────────
    "dedup_exact" -> ((s, d) => Dedup.exact(s, d)),
    "dedup_exact_prefix" -> ((s, d) => Dedup.exactPrefix(s, d)),
    "dedup_substring" -> ((s, d) => Dedup.substringDup(s, d)),
    "dedup_paragraph" -> ((s, d) => Dedup.paragraphDedup(s, d)),
    "dedup_paragraph_rewrite" -> ((s, d) => Dedup.paragraphRewrite(s, d)),
    "dedup_chunk_hist" -> ((s, d) => Dedup.chunkDupHist(s, d)),
    "text_novelty" -> ((s, d) => TextFunctions.novelty(s, d)),
    "text_dup_gram_share" -> ((s, d) => TextFunctions.dupGramShare(s, d)),
    "text_unigram_surprisal" -> ((s, d) => TextFunctions.unigramSurprisal(s, d)),
    "pipe_tokenizer_fertility" -> ((s, d) => TextFunctions.tokenizerFertility(s, d)),
    "pipe_token_histogram" -> ((s, d) => TextFunctions.tokenHistogram(s, d)),
    "pipe_vocab_growth" -> ((s, d) => TextFunctions.vocabGrowth(s, d)),
    "text_char_diversity" -> ((s, d) => TextFunctions.charDiversity(s, d)),
    "emb_norm_stats" -> ((s, d) => Ann.normStats(s, d)),
    "emb_dim_variance" -> ((s, d) => Ann.dimVariance(s, d)),
    "emb_dim_quantiles" -> ((s, d) => Ann.dimQuantiles(s, d)),
    "emb_pca_power" -> ((s, d) => Ann.pcaPower(s, d)),
    "ann_nndescent_round" -> ((s, d) => Ann.nnDescentRound(s, d)),
    "ann_nndescent_converge" -> ((s, d) => Ann.nnDescentConverge(s, d)),
    "emb_outlier_share" -> ((s, d) => Ann.outlierShare(s, d)),
    "dedup_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.simhash(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_embedding_cosine" -> ((s, d) => Ann.embeddingDup(s, d)),
    "dedup_containment" -> ((s, d) => Dedup.containment(s, d)),
    "dedup_semantic" -> ((s, d) => Ann.semanticDedup(s, d)),
    "pipe_dedup_keep_best" -> ((s, d) => Dedup.keepBest(s, d)),
    "text_repetition" -> ((s, d) => TextFunctions.repetition(s, d)),
    "text_tfidf" -> ((s, d) => TextFunctions.tfidf(s, d)),
    // ── Similarity search ────────────────────────────────────────────
    "ann_bruteforce_topk" -> ((s, d) => Ann.bruteForceTopK(s, d)),
    "ann_lsh_topk" -> ((s, d) => Ann.lshTopK(s, d)),
    "ann_multiprobe_topk" -> ((s, d) => Ann.multiprobeTopK(s, d)),
    "dedup_cluster" -> ((s, d) => Dedup.cluster(s, d)),
    "ann_ivf_topk" -> ((s, d) => Ann.ivfTopK(s, d)),
    "ann_range_search" -> ((s, d) => Ann.rangeSearch(s, d)),
    "mm_semantic_join" -> ((s, d) => Ann.semanticJoin(s, d)),
    // ── Multimodal ───────────────────────────────────────────────────
    "mm_binary_meta" -> ((s, d) => Video.binaryMeta(s, d)),
    "mm_frame_sample" -> ((s, d) => Video.frameSample(s, d)),
    "mm_video_decode" -> ((s, d) => Video.videoDecode(s, d)),
    "mm_video_resize" -> ((s, d) => Video.videoResize(s, d)),
    "mm_scene_detect" -> ((s, d) => Video.sceneDetect(s, d)),
    "mm_modality_stats" -> ((s, d) => Binary.modalityStats(s, d)),
    "mm_image_decode" -> ((s, d) => Binary.imageDecode(s, d)),
    "mm_image_resize" -> ((s, d) => Binary.imageResize(s, d)),
    "mm_audio_resample" -> ((s, d) => Binary.audioResample(s, d)),
    "pipe_dataset_diff" -> ((s, d) => TextFunctions.datasetDiff(s, d)),
    "mm_audio_decode" -> ((s, d) => Binary.audioDecode(s, d)),
    "mm_audio_stats" -> ((s, d) => Binary.audioStats(s, d)),
    "mm_image_stats" -> ((s, d) => Binary.imageStats(s, d)),
    "mm_image_phash" -> ((s, d) => Binary.imagePhash(s, d)),
    // ── Round-2b batch ───────────────────────────────────────────────
    "cdc_update_diff" -> ((s, d) => Monitoring.updateDiff(Cdc.changelog(s, d))),
    "cdc_txn_group" -> ((s, d) => Monitoring.txnGroup(Cdc.changelog(s, d))),
    "cdc_offset_gaps" -> ((s, d) => Monitoring.offsetGaps(Cdc.toWire(s, d))),
    "cdc_consumer_lag" -> ((s, d) => Monitoring.consumerLag(s, d)),
    "cdc_replay_plan" -> ((s, d) => Monitoring.replayPlan(s, d)),
    "cdc_slot_retention" -> ((s, d) => Monitoring.slotRetention(s, d)),
    "cdc_checkpoint_browse" -> ((s, d) => Monitoring.checkpointBrowse(s, d)),
    "cdc_log_browse" -> ((s, d) => Monitoring.logBrowse(s, d)),
    "cdc_log_browse_seek" -> ((s, d) => Monitoring.logBrowseSeek(s, d)),
    "cdc_log_levels" -> ((s, d) => Monitoring.logLevels(s, d)),
    "cdc_event_browse" -> ((s, d) => Monitoring.eventBrowse(s, d)),
    "cdc_event_browse_seek" -> ((s, d) => Monitoring.eventBrowseSeek(s, d)),
    "cdc_audit_browse_seek" -> ((s, d) => Monitoring.auditBrowseSeek(s, d)),
    "cdc_salt_advisor" -> ((s, d) => Monitoring.saltAdvisor(s, d)),
    "mm_audio_fp_dedup" -> ((s, d) => Binary.audioFingerprintDedup(s, d)),
    "cdc_audit_browse" -> ((s, d) => Monitoring.auditBrowse(s, d)),
    "cdc_audit_facets" -> ((s, d) => Monitoring.auditFacets(s, d)),
    "cdc_dml_mix_trend" -> ((s, d) => Monitoring.dmlMixTrend(s, d)),
    "mm_audio_silence" -> ((s, d) => Binary.audioSilence(s, d)),
    "mm_audio_clipping" -> ((s, d) => Binary.audioClipping(s, d)),
    "text_redundancy_curve" -> ((s, d) => TextFunctions.redundancyCurve(s, d)),
    "cdc_event_size_pcts" -> ((s, d) => Monitoring.eventSizePercentiles(s, d)),
    "cdc_hot_key_share" -> ((s, d) => Monitoring.hotKeyShare(s, d)),
    "q_cumulative_uniques" -> ((s, d) => Relational.cumulativeUniques(s, d)),
    "q_event_attribution" -> ((s, d) => Relational.eventAttribution(s, d)),
    "cdc_table_activity" -> ((s, d) => Monitoring.tableActivity(s, d)),
    "dedup_lsh_tune" -> ((s, d) => Dedup.lshTune(s, d)),
    "ann_recall_curve" -> ((s, d) => Ann.recallCurve(s, d)),
    "q_streaks" -> ((s, d) => Relational.streaks(s, d)),
    "text_burstiness" -> ((s, d) => TextFunctions.burstiness(s, d)),
    "ann_nlist_elbow" -> ((s, d) => Ann.nlistElbow(s, d)),
    "text_source_divergence" -> ((s, d) => TextFunctions.sourceDivergence(s, d)),
    "ann_pq_m_sweep" -> ((s, d) => Ann.pqMSweep(s, d)),
    "ann_binary_topk" -> ((s, d) => Ann.binaryTopK(s, d)),
    "ann_binary_recall" -> ((s, d) => Ann.binaryRecall(s, d)),
    "q_session_paths" -> ((s, d) => Relational.sessionPaths(s, d)),
    "dedup_winnowing" -> ((s, d) => Dedup.winnowing(s, d)),
    "cdc_payload_profile" -> ((s, d) => Monitoring.payloadProfile(s, d)),
    "q_benford_audit" -> ((s, d) => Relational.benfordAudit(s, d)),
    "cdc_value_drift" -> ((s, d) => Monitoring.valueDrift(s, d)),
    "q_runs_test" -> ((s, d) => Relational.runsTest(s, d)),
    "emb_label_purity" -> ((s, d) => Ann.labelPurity(s, d)),
    "q_new_vs_repeat" -> ((s, d) => Relational.newVsRepeat(s, d)),
    "emb_hubness" -> ((s, d) => Ann.hubness(s, d)),
    "q_priority_shipping" -> ((s, d) => Relational.priorityShipping(s, d)),
    "cdc_table_staleness" -> ((s, d) => Monitoring.tableStaleness(s, d)),
    "q_rolling_retention" -> ((s, d) => Relational.rollingRetention(s, d)),
    "q_revenue_concentration" -> ((s, d) => Relational.revenueConcentration(s, d)),
    "q6_forecast_revenue" -> ((s, d) => Relational.q6ForecastRevenue(s, d)),
    "q4_priority_late" -> ((s, d) => Relational.q4PriorityLate(s, d)),
    "q8_market_share" -> ((s, d) => Relational.q8MarketShare(s, d)),
    "q14_promo_share" -> ((s, d) => Relational.q14PromoShare(s, d)),
    "q17_small_qty" -> ((s, d) => Relational.q17SmallQty(s, d)),
    "q15_top_supplier" -> ((s, d) => Relational.q15TopSupplier(s, d)),
    "q16_supplier_variety" -> ((s, d) => Relational.q16SupplierVariety(s, d)),
    "q18_large_orders" -> ((s, d) => Relational.q18LargeOrders(s, d)),
    "q19_disjunctive" -> ((s, d) => Relational.q19Disjunctive(s, d)),
    "q9_product_profit" -> ((s, d) => Relational.q9ProductProfit(s, d)),
    "q21_late_supplier" -> ((s, d) => Relational.q21LateSupplier(s, d)),
    "q22_idle_balance" -> ((s, d) => Relational.q22IdleBalance(s, d)),
    "q2_min_cost_supplier" -> ((s, d) => Relational.q2MinCostSupplier(s, d)),
    "q11_important_parts" -> ((s, d) => Relational.q11ImportantParts(s, d)),
    "q12_late_priority_mix" -> ((s, d) => Relational.q12LatePriorityMix(s, d)),
    "q20_excess_supply" -> ((s, d) => Relational.q20ExcessSupply(s, d)),
    "q13_customer_distribution" -> ((s, d) => Relational.q13CustomerDistribution(s, d)),
    "q_discount_mix" -> ((s, d) => Relational.discountMix(s, d)),
    "q_basket_size_hist" -> ((s, d) => Relational.basketSizeHist(s, d)),
    "cdc_load_calendar" -> ((s, d) => Monitoring.loadCalendar(s, d)),
    "q_product_growth" -> ((s, d) => Relational.productGrowth(s, d)),
    "pipe_length_cut_curve" -> ((s, d) => TextFunctions.lengthCutCurve(s, d)),
    "q_value_migration" -> ((s, d) => Relational.valueMigration(s, d)),
    "mm_image_colorfulness" -> ((s, d) => Binary.imageColorfulness(s, d)),
    "pipe_context_fit" -> ((s, d) => TextFunctions.contextFit(s, d)),
    "cdc_uptime_report" -> ((s, d) => Monitoring.uptimeReport(s, d)),
    "emb_norm_length_corr" -> ((s, d) => Ann.normLengthCorr(s, d)),
    "q_part_supplier_breadth" -> ((s, d) => Relational.partSupplierBreadth(s, d)),
    "q_supplier_hhi" -> ((s, d) => Relational.supplierHhi(s, d)),
    "pipe_mix_balance" -> ((s, d) => TextFunctions.mixBalance(s, d)),
    "emb_twonn_ratio" -> ((s, d) => Ann.twonnRatio(s, d)),
    "mm_video_motion" -> ((s, d) => Video.videoMotion(s, d)),
    "dedup_bloom_fpr" -> ((s, d) => Dedup.bloomFpr(s, d)),
    "cdc_cold_keys" -> ((s, d) => Monitoring.coldKeys(s, d)),
    "mm_image_blur" -> ((s, d) => Binary.imageBlur(s, d)),
    "text_simpson_diversity" -> ((s, d) => TextFunctions.simpsonDiversity(s, d)),
    "q_trade_matrix" -> ((s, d) => Relational.tradeMatrix(s, d)),
    "cdc_arrival_jitter" -> ((s, d) => Monitoring.arrivalJitter(s, d)),
    "text_word_length_hist" -> ((s, d) => TextFunctions.wordLengthHist(s, d)),
    "mm_phash_hamming_hist" -> ((s, d) => Binary.phashHammingHist(s, d)),
    "pipe_quality_length_grid" -> ((s, d) => TextFunctions.qualityLengthGrid(s, d)),
    "emb_anisotropy" -> ((s, d) => Ann.anisotropy(s, d)),
    "q_orders_per_customer_hist" -> ((s, d) => Relational.ordersPerCustomerHist(s, d)),
    "text_vocab_coverage_curve" -> ((s, d) => TextFunctions.vocabCoverageCurve(s, d)),
    "ann_filtered_topk" -> ((s, d) => Ann.filteredTopK(s, d)),
    "q_trade_balance" -> ((s, d) => Relational.tradeBalance(s, d)),
    "q_dow_anova" -> ((s, d) => Relational.dowAnova(s, d)),
    "cdc_volume_percentiles" -> ((s, d) => Monitoring.volumePercentiles(s, d)),
    "dedup_band_config_sweep" -> ((s, d) => Dedup.bandConfigSweep(s, d)),
    "dedup_shingle_df_hist" -> ((s, d) => Dedup.shingleDfHist(s, d)),
    "dedup_blocking_health" -> ((s, d) => Dedup.blockingHealth(s, d)),
    "cdc_partition_watermark_skew" -> ((s, d) => Monitoring.partitionWatermarkSkew(s, d)),
    "q_ship_delay_hist" -> ((s, d) => Relational.shipDelayHist(s, d)),
    "q_repeat_purchase_rate" -> ((s, d) => Relational.repeatPurchaseRate(s, d)),
    "mm_video_luma_range" -> ((s, d) => Video.videoLumaRange(s, d)),
    "emb_pair_sim_hist" -> ((s, d) => Ann.pairSimHist(s, d)),
    "mm_audio_crest" -> ((s, d) => Binary.audioCrest(s, d)),
    "mm_image_aspect_hist" -> ((s, d) => Binary.imageAspectHist(s, d)),
    "emb_norm_hist" -> ((s, d) => Ann.normHist(s, d)),
    "cdc_sync_stats" -> ((s, d) => Monitoring.syncStats(s, d)),
    "cdc_size_estimate" -> ((s, d) => Discovery.sizeEstimate(s, d)),
    "cdc_load_order" -> ((s, d) => Discovery.loadOrder(s, d)),
    "cdc_table_preview" -> ((s, d) => Discovery.preview(s, d, "events", 50)),
    "cdc_lsn_latency_trend" -> ((s, d) => Monitoring.lsnLatencyTrend(s, d)),
    "cdc_time_travel" -> ((s, d) =>
      Materialize.timeTravel(Cdc.changelog(s, d)).orderBy("user_id")),
    "q_cube" -> ((s, d) => Relational.cubeAgg(s, d)),
    "q_percentile_cont" -> ((s, d) => Relational.percentileCont(s, d)),
    "q_cume_ntile" -> ((s, d) => Relational.cumeNtile(s, d)),
    "ann_knn_join" -> ((s, d) => Ann.knnJoin(s, d)),
    "text_pii_scan" -> ((s, d) => TextFunctions.piiScan(s, d)),
    "text_pii_redact" -> ((s, d) => TextFunctions.piiRedact(s, d)),
    "pipe_lang_coverage" -> ((s, d) => TextFunctions.langCoverage(s, d)),
    "pipe_chunk_documents" -> ((s, d) => TextFunctions.chunkDocuments(s, d)),
    "pipe_sample_stratified" -> ((s, d) => TextFunctions.sampleStratified(s, d)),
    "pipe_token_budget" -> ((s, d) => TextFunctions.tokenBudget(s, d)),
    "pipe_domain_mix" -> ((s, d) => TextFunctions.domainMix(s, d)),
    "pipe_epochs_plan" -> ((s, d) => TextFunctions.epochsPlan(s, d)),
    "pipe_curriculum" -> ((s, d) => TextFunctions.curriculum(s, d)),
    "ann_probe_sweep" -> ((s, d) => Ann.probeSweep(s, d)),
    "cdc_watermark_advise" -> ((s, d) => Monitoring.watermarkAdvise(Cdc.changelog(s, d))),
    "q_string_agg" -> ((s, d) => Relational.stringAgg(s, d)),
    "cdc_sample_compare" -> ((s, d) => Quality.sampleCompare(s, d)),
    "ann_recall_eval" -> ((s, d) => Ann.recallEval(s, d)),
    "pipe_interleave" -> ((s, d) => TextFunctions.interleave(s, d)),
    "q7_volume" -> ((s, d) => Relational.q7Volume(s, d)),
    "q10_returns" -> ((s, d) => Relational.q10Returns(s, d)),
    "mm_frame_dedup" -> ((s, d) => Video.frameDedup(s, d)),
    "pipe_contamination" -> ((s, d) => Dedup.contamination(s, d)),
    "pipe_decontaminate" -> ((s, d) => Dedup.decontaminate(s, d)),
    "emb_matryoshka_recall" -> ((s, d) => Ann.matryoshkaRecall(s, d)),
    "emb_whitening_effect" -> ((s, d) => Ann.whiteningEffect(s, d)),
    // skew path through the same oracle: provably equal to the plain form
    "cdc_materialize_salted" -> ((s, d) =>
      Materialize.latestSnapshotSalted(Cdc.changelog(s, d)).orderBy("user_id")),
    "cdc_materialize_advised" -> ((s, d) =>
      Materialize.latestSnapshotAdvised(Cdc.changelog(s, d)).orderBy("user_id")),
    "cdc_burst_detect" -> ((s, d) => Monitoring.burstDetect(Cdc.changelog(s, d))),
    "cdc_robust_anomaly" -> ((s, d) => Monitoring.robustAnomaly(Cdc.changelog(s, d))),
    "cdc_lag_sla" -> ((s, d) => Monitoring.lagSla(Cdc.changelog(s, d))),
    "cdc_error_budget" -> ((s, d) => Monitoring.errorBudget(Cdc.changelog(s, d))),
    "text_gopher_rules" -> ((s, d) => TextFunctions.gopherRules(s, d)),
    "pipe_contamination_semantic" -> ((s, d) => Ann.contaminationSemantic(s, d)),
    "cdc_gdpr_erasure" -> ((s, d) => Quality.gdprErasure(s, d)),
    "pipe_dataset_card" -> ((s, d) => TextFunctions.datasetCard(s, d)),
    "q_range_frame" -> ((s, d) => Relational.rangeFrame(s, d)),
    "q_skyline" -> ((s, d) => Relational.skyline(s, d)),
    // composite-key upsert through the generic materializer: lineitem as a
    // (suppkey, partkey)-keyed changelog, returnflag 'R' acting as delete.
    // r19 (guide §2.3 "project before the exchange"): spread AFTER the
    // 7-column projection — the round-robin guard exchange previously
    // carried all 16 lineitem columns. Interleaved A/B: 2.46 → 2.17 s
    // median (serial, no spread at all, was worse: 2.58 s — the struct-max
    // partial aggregate is heavy enough to want the parallelism).
    "cdc_materialize_composite" -> ((s, d) => {
      val li = graft.Tables.spread(graft.Tables.load(s, d, "lineitem")
        .select("l_returnflag", "l_suppkey", "l_partkey", "l_shipdate",
          "l_orderkey", "l_linenumber", "l_extendedprice")).select(
        when(col("l_returnflag") === "R", "d").otherwise("u").as("op"),
        col("l_suppkey"), col("l_partkey"),
        col("l_shipdate"), col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        dec(col("l_extendedprice"), 18, 2).cast("double").as("price"))
      Materialize.latestSnapshotKeyed(li,
          keyCols = Seq("l_suppkey", "l_partkey"),
          orderCols = Seq("l_shipdate", "l_orderkey", "l_linenumber"),
          opCol = "op",
          payloadCols = Seq("price"))
        .orderBy("l_suppkey", "l_partkey")
    }),
    "cdc_scd3" -> ((s, d) => Materialize.scd3(Cdc.changelog(s, d)).orderBy("user_id")),
    "ann_ivf_build" -> ((s, d) => Ann.ivfBuild(s, d)),
    "ann_kmeans_refine" -> ((s, d) => Ann.kmeansRefine(s, d)),
    "ann_kmeans_converge" -> ((s, d) => Ann.kmeansConverge(s, d)),
    "q_unpivot" -> ((s, d) => Relational.unpivotMeasures(s, d)),
    "cdc_audit_chain" -> ((s, d) => Monitoring.auditChain(Cdc.changelog(s, d))),
    "q_gap_fill" -> ((s, d) => Relational.gapFill(s, d)),
    "cdc_conflict_resolve" -> ((s, d) => Materialize.conflictResolve(Cdc.changelog(s, d))),
    "q_histogram" -> ((s, d) => Relational.histogram(s, d)),
    "text_cooccurrence" -> ((s, d) => TextFunctions.cooccurrence(s, d)),
    "q_cohort_retention" -> ((s, d) => Relational.cohortRetention(s, d)),
    "q_funnel" -> ((s, d) => Relational.funnel(s, d)),
    "pipe_shard_plan" -> ((s, d) => TextFunctions.shardPlan(s, d)),
    "cdc_backfill_ranges" -> ((s, d) => Monitoring.backfillRanges(Cdc.toWire(s, d))),
    "pipe_quality_drift" -> ((s, d) => TextFunctions.qualityDrift(s, d)),
    "pipe_pack_sequences" -> ((s, d) => TextFunctions.packSequences(s, d)),
    "pipe_pack_efficiency" -> ((s, d) => TextFunctions.packEfficiency(s, d)),
    "text_zipf_check" -> ((s, d) => TextFunctions.zipfCheck(s, d)),
    "q_interval_overlap" -> ((s, d) => Relational.intervalOverlap(s, d)),
    "q_yoy_growth" -> ((s, d) => Relational.yoyGrowth(s, d)),
    "cdc_state_size" -> ((s, d) => Monitoring.stateSize(Cdc.changelog(s, d))),
    "q_market_basket" -> ((s, d) => Relational.marketBasket(s, d)),
    "cdc_table_checksum" -> ((s, d) => Quality.tableChecksum(s, d)),
    "cdc_order_violations" -> ((s, d) => Monitoring.orderViolations(Cdc.changelog(s, d))),
    "text_char_stats" -> ((s, d) => TextFunctions.charStats(s, d)),
    "cdc_trigger_advise" -> ((s, d) => Monitoring.triggerAdvise(Cdc.changelog(s, d))),
    "q_lapse_cohorts" -> ((s, d) => Relational.lapseCohorts(s, d)),
    "cdc_volume_forecast" -> ((s, d) => Monitoring.volumeForecast(Cdc.changelog(s, d))),
    "q_percent_of_total" -> ((s, d) => Relational.percentOfTotal(s, d)),
    "cdc_key_lifecycle" -> ((s, d) => Monitoring.keyLifecycle(Cdc.changelog(s, d))),
    "dedup_minhash_accuracy" -> ((s, d) => Dedup.minhashAccuracy(s, d)),
    "q_dow_seasonality" -> ((s, d) => Relational.dowSeasonality(s, d)),
    "pipe_dup_rate_by_source" -> ((s, d) => TextFunctions.dupRateBySource(s, d)),
    "cdc_retention_impact" -> ((s, d) => Monitoring.retentionImpact(Cdc.changelog(s, d))),
    "mm_frame_stats" -> ((s, d) => Video.frameStats(s, d)),
    "q_corr_ols" -> ((s, d) => Relational.corrOls(s, d)),
    "q_mad" -> ((s, d) => Relational.madByFlag(s, d)),
    // sketch twins of the two exact-percentile hot spots — the 100 TB
    // drop-ins their exact docstrings promise, registered first-class.
    // No oracleSql: approx_percentile's rank pick is engine-specific
    // (driver records the rows-only check); the accuracy contracts vs
    // the exact twins are pinned in SketchesSpec.
    "q_mad_approx" -> ((s, d) => Sketches.approxMad(s, d)),
    "cdc_lag_percentiles_approx" ->
      ((s, d) => Sketches.approxLagPercentiles(Cdc.changelog(s, d))),
    // r13: the remaining exact-percentile operators' documented drop-ins,
    // same rows-only + SketchesSpec-contract pattern
    "emb_dim_quantiles_approx" -> ((s, d) => Sketches.approxDimQuantiles(s, d)),
    "cdc_event_size_pcts_approx" ->
      ((s, d) => Sketches.approxEventSizePercentiles(s, d)),
    "cdc_watermark_advise_approx" ->
      ((s, d) => Sketches.approxWatermarkAdvise(Cdc.changelog(s, d))),
    // r15: the last two unwired sketches get their operators (CMS for the
    // heavy-key/head-term tails, HLL union for the distinct-to-date curve)
    // — same rows-only + SketchesSpec-contract pattern
    "cdc_hot_key_share_approx" -> ((s, d) => Sketches.approxHotKeyShare(s, d)),
    "text_doc_freq_approx" -> ((s, d) => Sketches.approxDocFreqHead(s, d)),
    "q_cumulative_uniques_approx" ->
      ((s, d) => Sketches.approxCumulativeUniques(s, d)),
    // r17: in-query contract gates for the 8 rows-only sketch twins —
    // each runs its sketch twin against its exact twin in ONE plan and
    // outputs exact-side values + BIGINT contract verdicts whose DuckDB
    // oracle pins the verdicts to 1, putting the SketchesSpec accuracy
    // contracts under the driver's independent hash gate
    "q_mad_approx_gate" -> ((s, d) => SketchGates.madGate(s, d)),
    "cdc_lag_percentiles_approx_gate" ->
      ((s, d) => SketchGates.lagPercentilesGate(Cdc.changelog(s, d))),
    "cdc_event_size_pcts_approx_gate" -> ((s, d) => SketchGates.eventSizeGate(s, d)),
    "cdc_watermark_advise_approx_gate" ->
      ((s, d) => SketchGates.watermarkAdviseGate(Cdc.changelog(s, d))),
    "emb_dim_quantiles_approx_gate" -> ((s, d) => SketchGates.dimQuantilesGate(s, d)),
    "cdc_hot_key_share_approx_gate" -> ((s, d) => SketchGates.hotKeyShareGate(s, d)),
    "text_doc_freq_approx_gate" -> ((s, d) => SketchGates.docFreqGate(s, d)),
    "q_cumulative_uniques_approx_gate" ->
      ((s, d) => SketchGates.cumulativeUniquesGate(s, d)),
    // r17: the deployment CMS topology under the driver's gate — the
    // ≤ depth×width cell build + broadcast probe, verdict-gated
    "cdc_hot_key_share_cms" -> ((s, d) => SketchGates.hotKeyShareCms(s, d)),
    "ann_pq_topk" -> ((s, d) => Ann.pqTopK(s, d)),
    "dedup_incremental" -> ((s, d) => Dedup.incremental(s, d)),
    "pipe_cross_source_dup" -> ((s, d) => Dedup.crossSourceDup(s, d)),
    "pipe_source_overlap" -> ((s, d) => TextFunctions.sourceOverlap(s, d)),
    "pipe_contamination_ngram" -> ((s, d) => Dedup.contaminationNgram(s, d)),
    "pipe_mix_drift" -> ((s, d) => TextFunctions.mixDrift(s, d)),
    "pipe_mix_anneal" -> ((s, d) => TextFunctions.mixAnneal(s, d)),
    "dedup_threshold_curve" -> ((s, d) => Dedup.thresholdCurve(s, d)),
    "dedup_cluster_lss" -> ((s, d) => Dedup.clusterLargeStar(s, d)),
    "dedup_pair_degree" -> ((s, d) => Dedup.pairDegree(s, d)),
    "dedup_component_stats" -> ((s, d) => Dedup.componentStats(s, d)),
    "dedup_band_occupancy" -> ((s, d) => Dedup.bandOccupancy(s, d)),
    "dedup_simhash_tables" -> ((s, d) => Dedup.simhashTableStats(s, d)),
    "dedup_simhash_dist_hist" -> ((s, d) => Dedup.simhashDistanceHist(s, d)),
    "pipe_dedup_waterfall" -> ((s, d) => Dedup.dedupWaterfall(s, d)),
    "dedup_semantic_incremental" -> ((s, d) => Ann.semanticIncremental(s, d)),
    "text_rarity" -> ((s, d) => TextFunctions.rarity(s, d)),
    "text_bigram_coherence" -> ((s, d) => TextFunctions.bigramCoherence(s, d)),
    "ann_pq_recall" -> ((s, d) => Ann.pqRecall(s, d)),
    "ann_pq_rerank" -> ((s, d) => Ann.pqRerank(s, d)),
    "ann_ivfpq_topk" -> ((s, d) => Ann.ivfpqTopK(s, d)),
    "ann_index_menu" -> ((s, d) => Ann.indexMenu(s, d)),
    "ann_sq8_topk" -> ((s, d) => Ann.sq8TopK(s, d)),
    "ann_sq8_recall" -> ((s, d) => Ann.sq8Recall(s, d)),
    "ann_ivf_occupancy" -> ((s, d) => Ann.ivfOccupancy(s, d)),
    "ann_lsh_occupancy" -> ((s, d) => Ann.lshOccupancy(s, d)),
    "emb_exact_dup" -> ((s, d) => Ann.exactDupVectors(s, d)),
    "ann_sq8_build" -> ((s, d) => Ann.sq8Build(s, d)),
    "ann_centroid_separation" -> ((s, d) => Ann.centroidSeparation(s, d)),
    "text_bpe_pairs" -> ((s, d) => TextFunctions.bpePairs(s, d)),
    "emb_centroid_drift" -> ((s, d) => Ann.centroidDrift(s, d)),
    "pipe_temperature_mix" -> ((s, d) => TextFunctions.temperatureMix(s, d)),
  )

  /** DuckDB-dialect oracle SQL per query (same tables, same column names). */
  def oracleSql: Map[String, String] = {
    val cl = Cdc.changelogSql
    Map(
      "cdc_op_normalize" ->
        s"""$cl
           |SELECT op,
           |       CASE op WHEN 'c' THEN 'insert' WHEN 'r' THEN 'insert' WHEN 'u' THEN 'update'
           |               WHEN 'd' THEN 'delete' WHEN 't' THEN 'truncate' ELSE 'unknown' END AS event_class,
           |       count(*) AS n
           |FROM changelog GROUP BY op, event_class ORDER BY op""".stripMargin,
      "cdc_unwrap" ->
        """SELECT user_id, event_type, value,
          |       CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd' ELSE 'u' END AS __op,
          |       epoch_ms(ts) AS __source_ts_ms,
          |       event_type = 'error' AS __deleted
          |FROM events ORDER BY user_id, __source_ts_ms, __op, value""".stripMargin,
      "cdc_parse_envelope" ->
        """SELECT event_id AS "offset", 'graft' AS server_name, 'public' AS schema_name,
          |       event_type AS table_name,
          |       CASE event_type WHEN 'signup' THEN 'insert' WHEN 'error' THEN 'delete' ELSE 'update' END AS event_class,
          |       epoch_ms(ts) AS ts_ms, user_id AS payload_user_id, value AS payload_value
          |FROM events ORDER BY "offset"""".stripMargin,
      "cdc_materialize_latest" ->
        s"""$cl, ranked AS (
           |  SELECT pk, op, value, ts,
           |         row_number() OVER (PARTITION BY pk ORDER BY ts DESC, seq DESC) AS rn,
           |         count(*) OVER (PARTITION BY pk) AS n_changes
           |  FROM changelog)
           |SELECT pk AS user_id, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value, ts AS updated_at, n_changes
           |FROM ranked WHERE rn = 1 AND op <> 'd' ORDER BY user_id""".stripMargin,
      "cdc_fanout_apply" ->
        """WITH ranked AS (
          |  SELECT event_type AS table_name, user_id AS pk, value,
          |         epoch_ms(epoch_ms(ts)) AS ts_trunc, event_id AS seq,
          |         CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd' ELSE 'u' END AS op,
          |         row_number() OVER (PARTITION BY event_type, user_id
          |                            ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn,
          |         count(*) OVER (PARTITION BY event_type, user_id) AS n_changes
          |  FROM events)
          |SELECT table_name, pk AS user_id, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value,
          |       ts_trunc AS updated_at, n_changes
          |FROM ranked WHERE rn = 1 AND op <> 'd'
          |ORDER BY table_name, user_id""".stripMargin,
      "cdc_scd2_history" ->
        s"""$cl, v AS (
           |  SELECT pk, op, value, ts, seq,
           |         lead(ts) OVER (PARTITION BY pk ORDER BY ts, seq) AS valid_to
           |  FROM changelog)
           |SELECT pk AS user_id, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value, ts AS valid_from,
           |       valid_to, valid_to IS NULL AS is_current, seq
           |FROM v WHERE op <> 'd' ORDER BY user_id, valid_from, seq""".stripMargin,
      "cdc_append_audit" ->
        s"""$cl
           |SELECT seq AS run_seq, 'CDC' AS run_type,
           |       CASE op WHEN 'c' THEN 'insert' WHEN 'd' THEN 'delete' ELSE 'update' END AS event_type,
           |       'completed' AS status, ts AS started_at,
           |       CAST(1 AS BIGINT) AS rows_processed, 'events' AS table_name
           |FROM changelog ORDER BY run_seq""".stripMargin,
      "cdc_dedup_replay" ->
        s"""$cl, delivered AS (
           |  SELECT * FROM changelog
           |  UNION ALL SELECT * FROM changelog WHERE seq % 10 = 0),
           |uniq AS (
           |  SELECT seq, count(*) AS deliveries,
           |         min(CASE op WHEN 'c' THEN 'insert' WHEN 'd' THEN 'delete' ELSE 'update' END) AS event_class
           |  FROM delivered GROUP BY seq)
           |SELECT event_class, count(*) AS unique_events,
           |       CAST(sum(deliveries) AS BIGINT) AS total_deliveries
           |FROM uniq GROUP BY event_class ORDER BY event_class""".stripMargin,
      "cdc_snapshot_chunked" ->
        """SELECT o_orderkey % 8 AS chunk_id, count(*) AS n_rows,
          |       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
          |       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) AS chunk_total
          |FROM orders GROUP BY chunk_id ORDER BY chunk_id""".stripMargin,
      "cdc_event_counts" ->
        s"""$cl
           |SELECT CASE op WHEN 'c' THEN 'insert' WHEN 'd' THEN 'delete' ELSE 'update' END AS event_class,
           |       count(*) AS n_events, count(DISTINCT pk) AS n_keys,
           |       CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) AS total_value
           |FROM changelog GROUP BY event_class ORDER BY event_class""".stripMargin,
      "cdc_events_per_minute" ->
        s"""$cl
           |SELECT date_trunc('minute', ts) AS bucket, count(*) AS n_events,
           |       CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) AS sum_value
           |FROM changelog GROUP BY bucket ORDER BY bucket""".stripMargin,
      "cdc_throughput" ->
        s"""$cl
           |SELECT date_trunc('hour', ts) AS bucket, count(*) AS n_events,
           |       CAST(count(*) AS DOUBLE) / 3600.0 AS events_per_sec
           |FROM changelog GROUP BY bucket ORDER BY bucket""".stripMargin,
      "cdc_lag_trend" ->
        s"""$cl, hwm AS (SELECT max(ts) AS hwm FROM changelog)
           |SELECT date_trunc('hour', ts) AS bucket, count(*) AS n_events,
           |       CAST(sum(epoch_ms(hwm) - epoch_ms(ts)) AS BIGINT) AS total_lag_ms,
           |       max(epoch_ms(hwm) - epoch_ms(ts)) AS max_lag_ms,
           |       CAST(CAST(sum(epoch_ms(hwm) - epoch_ms(ts)) AS BIGINT) AS DOUBLE) / count(*) AS avg_lag_ms
           |FROM changelog CROSS JOIN hwm GROUP BY bucket ORDER BY bucket""".stripMargin,
      "cdc_alert_eval" ->
        """WITH m AS (
          |  SELECT date_trunc('hour', ts) AS bucket,
          |         CAST(count(*) AS DOUBLE) AS event_count,
          |         CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS DOUBLE) AS delete_count
          |  FROM events GROUP BY bucket),
          |s AS (
          |  SELECT bucket, 'event_count' AS metric, event_count AS metric_value FROM m
          |  UNION ALL SELECT bucket, 'delete_count', delete_count FROM m
          |  UNION ALL SELECT bucket, 'error_count', delete_count FROM m),
          |r(rule_id, metric, threshold, condition, severity) AS (VALUES
          |  ('r_error_burst', 'error_count', 10.0, 'gt', 'critical'),
          |  ('r_low_volume', 'event_count', 100.0, 'lt', 'warning'),
          |  ('r_delete_storm', 'delete_count', 25.0, 'gt', 'warning'))
          |SELECT rule_id, bucket, s.metric, metric_value, threshold, severity
          |FROM s JOIN r ON s.metric = r.metric
          |WHERE (condition = 'gt' AND metric_value > threshold)
          |   OR (condition = 'lt' AND metric_value < threshold)
          |ORDER BY rule_id, bucket""".stripMargin,
      "cdc_alert_dispatch" ->
        """WITH m AS (
          |  SELECT date_trunc('hour', ts) AS bucket,
          |         CAST(count(*) AS DOUBLE) AS event_count,
          |         CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS DOUBLE) AS delete_count
          |  FROM events GROUP BY bucket),
          |s AS (
          |  SELECT bucket, 'event_count' AS metric, event_count AS metric_value FROM m
          |  UNION ALL SELECT bucket, 'delete_count', delete_count FROM m
          |  UNION ALL SELECT bucket, 'error_count', delete_count FROM m),
          |r(rule_id, metric, threshold, condition, severity) AS (VALUES
          |  ('r_error_burst', 'error_count', 10.0, 'gt', 'critical'),
          |  ('r_low_volume', 'event_count', 100.0, 'lt', 'warning'),
          |  ('r_delete_storm', 'delete_count', 25.0, 'gt', 'warning')),
          |a AS (
          |  SELECT rule_id, bucket, s.metric, metric_value, threshold, condition, severity
          |  FROM s JOIN r ON s.metric = r.metric
          |  WHERE (condition = 'gt' AND metric_value > threshold)
          |     OR (condition = 'lt' AND metric_value < threshold)),
          |c(rule_id, channel) AS (VALUES
          |  ('r_error_burst', 'email'), ('r_error_burst', 'slack'), ('r_error_burst', 'pager'),
          |  ('r_low_volume', 'webhook'),
          |  ('r_delete_storm', 'slack'), ('r_delete_storm', 'webhook'))
          |SELECT a.rule_id, bucket, channel, severity,
          |       CASE WHEN channel IN ('email', 'webhook', 'slack')
          |            THEN 'sent' ELSE 'unknown_channel' END AS delivery,
          |       a.rule_id || ': ' || a.metric || ' (' ||
          |         CAST(CAST(metric_value AS BIGINT) AS VARCHAR) || ') ' ||
          |         condition || ' ' || CAST(CAST(threshold AS BIGINT) AS VARCHAR) AS message
          |FROM a JOIN c ON a.rule_id = c.rule_id
          |ORDER BY a.rule_id, bucket, channel""".stripMargin,
      "cdc_delete_ratio" ->
        s"""$cl
           |SELECT pk % 10 AS cohort, count(*) AS n_events,
           |       count(CASE WHEN op = 'd' THEN 1 END) AS n_deletes,
           |       count(CASE WHEN op = 'c' THEN 1 END) AS n_inserts,
           |       CAST(count(CASE WHEN op = 'd' THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS delete_ratio
           |FROM changelog GROUP BY cohort ORDER BY cohort""".stripMargin,
      "cdc_topic_route" ->
        """SELECT 'graft' AS server_name, 'public' AS schema_name, event_type AS table_name,
          |       count(*) AS n_messages
          |FROM events GROUP BY table_name ORDER BY server_name, schema_name, table_name""".stripMargin,
      "cdc_snapshot_handoff" ->
        s"""$cl, ranked AS (
           |  SELECT pk, op, value, ts,
           |         row_number() OVER (PARTITION BY pk ORDER BY ts DESC, seq DESC) AS rn
           |  FROM changelog)
           |SELECT pk AS user_id, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value, ts AS updated_at
           |FROM ranked WHERE rn = 1 AND op <> 'd' ORDER BY user_id""".stripMargin,
      "cdc_schema_evolve" ->
        """WITH unioned AS (
          |  SELECT o_orderkey, o_totalprice, NULL AS o_channel FROM orders WHERE o_orderkey % 2 = 0
          |  UNION ALL
          |  SELECT o_orderkey, o_totalprice, 'chan_' || CAST(o_orderkey % 3 AS VARCHAR) FROM orders WHERE o_orderkey % 2 = 1)
          |SELECT coalesce(o_channel, '(pre-evolution)') AS o_channel, count(*) AS n_orders,
          |       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) AS total_price
          |FROM unioned GROUP BY 1 ORDER BY o_channel""".stripMargin,
      "cdc_alert_suppress" ->
        // greedy debounce against the last FIRED alert = a recursive
        // fired-chain (next fired = first candidate past the cooldown of
        // the previous fired); RECURSIVE must ride the shared WITH prefix
        s"""${cl.replaceFirst("WITH ", "WITH RECURSIVE ")}, m AS (
           |  SELECT date_trunc('hour', ts) AS bucket,
           |         count(CASE WHEN op = 'd' THEN 1 END) AS n_errors
           |  FROM changelog GROUP BY bucket),
           |a AS (SELECT 'r_error_burst' AS rule_id, bucket, n_errors FROM m WHERE n_errors > 2),
           |fired AS (
           |  SELECT rule_id, min(bucket) AS bucket FROM a GROUP BY rule_id
           |  UNION ALL
           |  SELECT f.rule_id,
           |         (SELECT min(c.bucket) FROM a c
           |          WHERE c.rule_id = f.rule_id
           |            AND epoch_ms(c.bucket) - epoch_ms(f.bucket) > ${6 * 3600000L}) AS bucket
           |  FROM fired f
           |  WHERE (SELECT min(c.bucket) FROM a c
           |         WHERE c.rule_id = f.rule_id
           |           AND epoch_ms(c.bucket) - epoch_ms(f.bucket) > ${6 * 3600000L}) IS NOT NULL)
           |SELECT a.rule_id, a.bucket, a.n_errors, (fired.bucket IS NULL) AS suppressed
           |FROM a LEFT JOIN fired ON a.rule_id = fired.rule_id AND a.bucket = fired.bucket
           |ORDER BY a.bucket""".stripMargin,
      "cdc_incremental_agg" ->
        s"""$cl
           |SELECT date_trunc('minute', ts) AS bucket, count(*) AS n_events,
           |       CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) AS sum_value
           |FROM changelog GROUP BY bucket ORDER BY bucket""".stripMargin,
      "cdc_compact" ->
        s"""$cl, ranked AS (
           |  SELECT pk, op, value, ts, seq,
           |         row_number() OVER (PARTITION BY pk ORDER BY ts DESC, seq DESC) AS rn
           |  FROM changelog)
           |SELECT pk AS user_id, op, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value, ts, seq, CAST(rn AS BIGINT) AS rn
           |FROM ranked WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,
      "cdc_tombstone_gc" ->
        s"""$cl, hwm AS (SELECT max(ts) AS hwm FROM changelog),
           |ranked AS (
           |  SELECT pk, op, value, ts, seq,
           |         row_number() OVER (PARTITION BY pk ORDER BY ts DESC, seq DESC) AS rn
           |  FROM changelog)
           |SELECT pk AS user_id, op, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value, ts, seq
           |FROM ranked CROSS JOIN hwm
           |WHERE rn = 1 AND (op <> 'd' OR epoch_ms(hwm) - epoch_ms(ts) <= ${7L * 24 * 3600 * 1000})
           |ORDER BY user_id""".stripMargin,
      "cdc_disorder_stats" ->
        s"""$cl, d AS (
           |  SELECT pk % 10 AS cohort, seq, epoch_ms(ts) AS ms,
           |         max(epoch_ms(ts)) OVER (PARTITION BY pk % 10 ORDER BY seq
           |                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_ms
           |  FROM changelog),
           |r AS (
           |  SELECT cohort,
           |         CASE WHEN prev_max_ms IS NULL THEN 0
           |              ELSE greatest(prev_max_ms - ms, 0) END AS regress_ms
           |  FROM d)
           |SELECT cohort, count(*) AS n_events,
           |       count(CASE WHEN regress_ms > 0 THEN 1 END) AS n_late,
           |       max(regress_ms) AS max_regress_ms,
           |       CAST(count(CASE WHEN regress_ms > 0 THEN 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS late_ratio
           |FROM r GROUP BY cohort ORDER BY cohort""".stripMargin,
      "cdc_health_score" ->
        s"""$cl
           |SELECT date_trunc('hour', ts) AS bucket, count(*) AS n_events,
           |       count(CASE WHEN op = 'd' THEN 1 END) AS n_errors,
           |       CASE WHEN count(CASE WHEN op = 'd' THEN 1 END) > 10 THEN 'critical'
           |            WHEN count(CASE WHEN op = 'd' THEN 1 END) > 5 THEN 'degraded'
           |            WHEN count(*) < 50 THEN 'idle' ELSE 'healthy' END AS status
           |FROM changelog GROUP BY bucket ORDER BY bucket""".stripMargin,
      "cdc_lag_percentiles" ->
        s"""$cl, hwm AS (SELECT max(ts) AS hwm FROM changelog),
           |lags AS (
           |  SELECT pk % 10 AS cohort, epoch_ms(hwm) - epoch_ms(ts) AS lag_ms
           |  FROM changelog CROSS JOIN hwm),
           |o AS (
           |  SELECT cohort, lag_ms,
           |         row_number() OVER (PARTITION BY cohort ORDER BY lag_ms) AS rn,
           |         count(*) OVER (PARTITION BY cohort) AS n
           |  FROM lags)
           |SELECT cohort,
           |       max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN lag_ms END) AS p50_ms,
           |       max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN lag_ms END) AS p90_ms,
           |       max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN lag_ms END) AS p99_ms,
           |       max(lag_ms) AS max_ms
           |FROM o GROUP BY cohort ORDER BY cohort""".stripMargin,
      "cdc_mask_policy" -> graft.governance.Masking.maskedCustomersSql,
      "cdc_heartbeat_gap" -> Monitoring.heartbeatGapsSql(cl),
      "cdc_partition_skew" -> Monitoring.partitionSkewSql(cl),
      "cdc_outbox_route" -> Monitoring.outboxRouteSql,
      "cdc_dlq_route" -> Cdc.dlqRouteSql,
      "cdc_snapshot_progress" -> Materialize.snapshotProgressSql(),
      "q_sessionize" ->
        """WITH g AS (
          |  SELECT user_id, ts, event_id,
          |         CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
          |                OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000 THEN 1 ELSE 0 END AS new_s
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |s AS (
          |  SELECT user_id, ts,
          |         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          |  FROM g)
          |SELECT user_id, session_id, count(*) AS n_events,
          |       min(ts) AS t_start, max(ts) AS t_end
          |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
      "q_asof_join" -> graft.operators.TemporalJoins.asofJoinSql,
      "q_asof_join_native" -> graft.operators.TemporalJoins.asofJoinSql,
      "q_asof_join_composed" -> graft.operators.TemporalJoins.asofJoinSql,
      "q_asof_join_tolerance" -> graft.operators.TemporalJoins.asofJoinToleranceSql(),
      "q_asof_join_tolerance_composed" -> graft.operators.TemporalJoins.asofJoinToleranceSql(),
      "q_range_join" -> graft.operators.TemporalJoins.rangeJoinSql,
      "q_grouping_sets" -> Relational.groupingSetsSql,
      "q_order_gaps" -> Relational.orderGapsSql,
      "q_rfm" -> Relational.rfmSql,
      "q_mode" -> Relational.modeReturnflagSql,
      "q_first_last" -> Relational.firstLastSql,
      "q_salted_join" -> Relational.saltedJoinSql,
      "q_moving_avg" -> Relational.movingAvgSql,
      "cdc_rowcount_validate" ->
        s"""$cl, last_op AS (
           |  SELECT pk, row_number() OVER (PARTITION BY pk ORDER BY ts DESC, seq DESC) AS rn, op
           |  FROM changelog),
           |counts AS (
           |  SELECT 'events_keys' AS table_name,
           |         (SELECT count(*) FROM last_op WHERE rn = 1 AND op <> 'd') AS source_rows,
           |         (SELECT count(*) FROM last_op WHERE rn = 1 AND op <> 'd') AS target_rows
           |  UNION ALL SELECT 'orders', count(*), count(DISTINCT o_orderkey) FROM orders
           |  UNION ALL SELECT 'customer', count(*), count(DISTINCT c_custkey) FROM customer
           |  UNION ALL SELECT 'part', count(*), count(DISTINCT p_partkey) FROM part)
           |SELECT table_name, source_rows, target_rows,
           |       source_rows - target_rows AS diff, source_rows = target_rows AS "match"
           |FROM counts ORDER BY table_name""".stripMargin,
      "cdc_integrity_stats" ->
        """WITH s AS (
          |  SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
          |         count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_nulls,
          |         count(DISTINCT o_orderkey) AS n_distinct,
          |         CAST(CAST(sum(CAST(o_orderkey AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) AS sum_value FROM orders
          |  UNION ALL
          |  SELECT 'o_custkey', count(*), count(CASE WHEN o_custkey IS NULL THEN 1 END),
          |         count(DISTINCT o_custkey), CAST(CAST(sum(CAST(o_custkey AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) FROM orders
          |  UNION ALL
          |  SELECT 'o_orderstatus', count(*), count(CASE WHEN o_orderstatus IS NULL THEN 1 END),
          |         count(DISTINCT o_orderstatus), CAST(NULL AS DOUBLE) FROM orders
          |  UNION ALL
          |  SELECT 'o_totalprice', count(*), count(CASE WHEN o_totalprice IS NULL THEN 1 END),
          |         count(DISTINCT o_totalprice), CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) FROM orders
          |  UNION ALL
          |  SELECT 'o_orderpriority', count(*), count(CASE WHEN o_orderpriority IS NULL THEN 1 END),
          |         count(DISTINCT o_orderpriority), CAST(NULL AS DOUBLE) FROM orders)
          |SELECT * FROM s ORDER BY column_name""".stripMargin,
      "cdc_schema_drift" ->
        """WITH src AS (
          |  SELECT column_name,
          |         CASE WHEN column_type LIKE 'TIMESTAMP%' THEN 'timestamp'
          |              WHEN column_type = 'BIGINT' THEN 'bigint'
          |              WHEN column_type = 'INTEGER' THEN 'int'
          |              WHEN column_type = 'DOUBLE' THEN 'double'
          |              WHEN column_type = 'VARCHAR' THEN 'string' END AS t
          |  FROM (DESCRIBE SELECT * FROM orders)),
          |tgt AS (
          |  SELECT column_name,
          |         CASE WHEN column_type LIKE 'TIMESTAMP%' THEN 'timestamp'
          |              WHEN column_type = 'BIGINT' THEN 'bigint'
          |              WHEN column_type = 'INTEGER' THEN 'int'
          |              WHEN column_type = 'DOUBLE' THEN 'double'
          |              WHEN column_type = 'VARCHAR' THEN 'string' END AS t
          |  FROM (DESCRIBE SELECT o_orderkey, o_custkey, o_orderstatus,
          |               CAST(o_totalprice AS VARCHAR) AS o_totalprice, o_orderdate,
          |               o_orderdate AS o_sync_ts FROM orders))
          |SELECT coalesce(src.column_name, tgt.column_name) AS column_name,
          |       src.t AS source_type, tgt.t AS target_type,
          |       CASE WHEN src.t IS NOT NULL AND tgt.t IS NOT NULL AND src.t = tgt.t THEN 'ok'
          |            WHEN src.t IS NOT NULL AND tgt.t IS NOT NULL THEN 'type_changed'
          |            WHEN tgt.t IS NULL THEN 'removed_in_target'
          |            ELSE 'added_in_target' END AS status
          |FROM src FULL OUTER JOIN tgt ON src.column_name = tgt.column_name
          |ORDER BY column_name""".stripMargin,
      "cdc_schema_compat" -> Quality.schemaCompatSql,
      // ── Relational analytics ───────────────────────────────────────
      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus,
          |       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) AS sum_qty,
          |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) AS sum_base_price,
          |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(30,4)) AS DOUBLE) AS sum_disc_price,
          |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DECIMAL(32,6)) AS DOUBLE) AS sum_charge,
          |       count(*) AS count_order,
          |       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) / count(*) AS avg_qty,
          |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) / count(*) AS avg_price
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
          |GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin,
      "q3_topk" ->
        """SELECT l_orderkey, o_orderdate, o_orderpriority,
          |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(30,4)) AS DOUBLE) AS revenue
          |FROM customer, orders, lineitem
          |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          |  AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
          |GROUP BY l_orderkey, o_orderdate, o_orderpriority
          |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
      "q5_multijoin" ->
        """SELECT n_name,
          |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(30,4)) AS DOUBLE) AS revenue
          |FROM customer, orders, lineitem, supplier, nation, region
          |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
          |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
          |  AND n_regionkey = r_regionkey AND r_name = 'ASIA'
          |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
          |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
      "q_window_rank" ->
        """SELECT c_mktsegment, rnk, o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
          |FROM (
          |  SELECT c_mktsegment, o_orderkey, o_totalprice,
          |         rank() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          |  FROM orders JOIN customer ON o_custkey = c_custkey)
          |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk, o_orderkey""".stripMargin,
      "q_semi_anti" ->
        """WITH f AS (
          |  SELECT c_mktsegment,
          |         EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_o
          |  FROM customer)
          |SELECT c_mktsegment,
          |       count(CASE WHEN has_o THEN 1 END) AS n_with_orders,
          |       count(CASE WHEN NOT has_o THEN 1 END) AS n_without_orders
          |FROM f GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
      "q_agg_stats" ->
        """SELECT o_orderstatus, count(*) AS n_orders, count(DISTINCT o_custkey) AS n_customers,
          |       min(o_orderdate) AS first_order, max(o_orderdate) AS last_order,
          |       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) AS total_price,
          |       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) / count(*) AS avg_price
          |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
      "q_rollup" ->
        """SELECT r_name, n_name, count(*) AS n_customers,
          |       CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) AS total_acctbal
          |FROM customer
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP (r_name, n_name)
          |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
      "q_json_extract" ->
        """SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS INTEGER) / 10) AS INTEGER) AS k_bucket,
          |       count(*) AS n_events,
          |       CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) AS sum_value
          |FROM events GROUP BY k_bucket ORDER BY k_bucket""".stripMargin,
      "q_pivot" ->
        """SELECT r_name,
          |       CAST(count(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 END) AS BIGINT) AS "AUTOMOBILE",
          |       CAST(count(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) AS BIGINT) AS "BUILDING",
          |       CAST(count(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 END) AS BIGINT) AS "FURNITURE",
          |       CAST(count(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 END) AS BIGINT) AS "HOUSEHOLD",
          |       CAST(count(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 END) AS BIGINT) AS "MACHINERY"
          |FROM customer
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name ORDER BY r_name""".stripMargin,
      "q_exists" ->
        """SELECT o_orderpriority, count(*) AS n_orders
          |FROM orders
          |WHERE EXISTS (SELECT 1 FROM lineitem
          |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      "q_scalar_subquery" ->
        """WITH pa AS (
          |  SELECT l_partkey AS p_key,
          |         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) / count(*) AS avg_qty
          |  FROM lineitem GROUP BY l_partkey)
          |SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(28,2)) AS DOUBLE) AS total_price,
          |       count(*) AS n_items
          |FROM lineitem JOIN pa ON l_partkey = p_key
          |WHERE l_quantity < avg_qty * 0.5""".stripMargin,
      "q_setops" ->
        """WITH a96 AS (SELECT DISTINCT o_custkey FROM orders
          |             WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
          |a97 AS (SELECT DISTINCT o_custkey FROM orders
          |        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
          |SELECT 'both_years' AS cohort, (SELECT count(*) FROM (SELECT * FROM a96 INTERSECT SELECT * FROM a97)) AS n_customers
          |UNION ALL SELECT 'only_1996', (SELECT count(*) FROM (SELECT * FROM a96 EXCEPT SELECT * FROM a97))
          |UNION ALL SELECT 'only_1997', (SELECT count(*) FROM (SELECT * FROM a97 EXCEPT SELECT * FROM a96))
          |ORDER BY cohort""".stripMargin,
      // ── Text analysis ──────────────────────────────────────────────
      "text_tokens" ->
        """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_actual,
          |       CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
          |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens
          |FROM documents ORDER BY doc_id""".stripMargin,
      "text_quality" ->
        s"""WITH f AS (
           |  SELECT doc_id,
           |         string_split_regex(lower(trim(text)), '\\s+') AS words,
           |         CAST(length(text) AS DOUBLE) AS nchars,
           |         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) AS npunct,
           |         CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS ndigit
           |  FROM documents),
           |g AS (
           |  SELECT doc_id, nchars, npunct, ndigit,
           |         CAST(len(words) AS DOUBLE) AS nwords,
           |         CAST(len(list_filter(words, w -> w IN (${TextFunctions.stopwords.map("'" + _ + "'").mkString(",")}))) AS DOUBLE) AS nstop
           |  FROM f)
           |SELECT doc_id, CAST(nchars AS BIGINT) AS n_chars_actual, CAST(nwords AS BIGINT) AS n_words,
           |       npunct / nchars AS punct_ratio,
           |       ndigit / nchars AS digit_ratio,
           |       nstop / nwords AS stopword_ratio,
           |       (nstop / nwords) * 2.0 - (npunct / nchars) * 0.5 +
           |         CASE WHEN nwords >= 10.0 THEN 1.0 ELSE 0.0 END AS quality_score
           |FROM g ORDER BY doc_id""".stripMargin,
      "text_langid" ->
        """WITH f AS (
          |  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS words FROM documents),
          |h AS (
          |  SELECT doc_id, lang,
          |         CAST(len(list_filter(words, w -> w IN ('the','and','of','to','is','in','a'))) AS BIGINT) AS en_hits,
          |         CAST(len(list_filter(words, w -> w IN ('el','la','de','y','es','en','un'))) AS BIGINT) AS es_hits,
          |         CAST(len(list_filter(words, w -> w IN ('der','die','das','und','ist','ein','zu'))) AS BIGINT) AS de_hits,
          |         CAST(len(list_filter(words, w -> w IN ('le','la','de','et','est','un','une'))) AS BIGINT) AS fr_hits
          |  FROM f)
          |SELECT doc_id, en_hits, es_hits, de_hits, fr_hits,
          |       CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
          |            WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
          |            WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS pred_lang,
          |       lang AS labeled_lang,
          |       (CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
          |             WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
          |             WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END) = lang AS agrees
          |FROM h ORDER BY doc_id""".stripMargin,
      "text_lang_confusion" -> TextFunctions.langConfusionSql,
      "text_fingerprint" ->
        """WITH n AS (
          |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents)
          |SELECT doc_id, md5(t) AS full_md5,
          |       list_min(list_transform(generate_series(1, greatest(length(t) - 15, 1)),
          |                               i -> md5(substr(t, i, 16)))) AS min_window_md5
          |FROM n ORDER BY doc_id""".stripMargin,
      "text_ngrams" ->
        """WITH n AS (
          |  SELECT trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents),
          |w AS (SELECT string_split(t, ' ') AS words FROM n),
          |b AS (
          |  SELECT unnest(CASE WHEN len(words) >= 2
          |    THEN list_transform(generate_series(1, len(words) - 1), i -> words[i] || ' ' || words[i+1])
          |    ELSE CAST([] AS VARCHAR[]) END) AS bigram
          |  FROM w)
          |SELECT bigram, count(*) AS n FROM b GROUP BY bigram
          |ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
      "text_source_stats" ->
        """WITH f AS (
          |  SELECT source, lang,
          |         CAST(length(text) AS BIGINT) AS n,
          |         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS w
          |  FROM documents)
          |SELECT source, count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
          |       CAST(sum(n) AS BIGINT) AS total_chars, CAST(sum(w) AS BIGINT) AS total_words,
          |       CAST(CAST(sum(n) AS BIGINT) AS DOUBLE) / count(*) AS avg_chars
          |FROM f GROUP BY source ORDER BY source""".stripMargin,
      "pipe_train_split" -> TextFunctions.trainSplitSql,
      "pipe_epoch_shuffle" -> TextFunctions.epochShuffleSql(),
      "text_quality_bins" ->
        s"""WITH f AS (
           |  SELECT doc_id,
           |         string_split_regex(lower(trim(text)), '\\s+') AS words,
           |         CAST(length(text) AS DOUBLE) AS nchars,
           |         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) AS npunct
           |  FROM documents),
           |g AS (
           |  SELECT doc_id, nchars, npunct,
           |         CAST(len(words) AS DOUBLE) AS nwords,
           |         CAST(len(list_filter(words, w -> w IN (${TextFunctions.stopwords.map("'" + _ + "'").mkString(",")}))) AS DOUBLE) AS nstop
           |  FROM f),
           |s AS (
           |  SELECT doc_id,
           |         (nstop / nwords) * 2.0 - (npunct / nchars) * 0.5 +
           |           CASE WHEN nwords >= 10.0 THEN 1.0 ELSE 0.0 END AS quality_score
           |  FROM g),
           |d AS (
           |  SELECT doc_id, quality_score,
           |         CAST(ntile(10) OVER (ORDER BY quality_score, doc_id) AS BIGINT) AS decile
           |  FROM s)
           |SELECT decile, count(*) AS n_docs,
           |       min(quality_score) AS min_score, max(quality_score) AS max_score
           |FROM d GROUP BY decile ORDER BY decile""".stripMargin,
      "pipe_corpus_filter" ->
        s"""WITH scored AS (
           |  SELECT doc_id, source,
           |         CAST(length(text) AS DOUBLE) AS n_chars_d,
           |         CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
           |                w -> w IN (${TextFunctions.stopwords.map("'" + _ + "'").mkString(",")}))) AS DOUBLE)
           |           / CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) AS stop_ratio,
           |         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS sig
           |  FROM documents),
           |canonical AS (SELECT sig, min(doc_id) AS keep_id FROM scored GROUP BY sig)
           |SELECT source,
           |       CASE WHEN n_chars_d < 50.0 THEN 'too_short'
           |            WHEN n_chars_d > 100000.0 THEN 'too_long'
           |            WHEN stop_ratio < 0.01 THEN 'low_signal'
           |            WHEN doc_id <> keep_id THEN 'duplicate'
           |            ELSE 'keep' END AS decision,
           |       count(*) AS n_docs
           |FROM scored JOIN canonical USING (sig)
           |GROUP BY source, decision ORDER BY source, decision""".stripMargin,
      // ── Dedup ──────────────────────────────────────────────────────
      "dedup_exact" ->
        s"""${Dedup.corpusSql},
           |sigs AS (
           |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS sig FROM corpus)
           |SELECT sig, count(*) AS n_copies, min(doc_id) AS canonical_id, max(doc_id) AS max_id
           |FROM sigs GROUP BY sig HAVING count(*) > 1 ORDER BY sig""".stripMargin,
      "dedup_exact_prefix" -> Dedup.exactPrefixSql(),
      "dedup_substring" -> Dedup.substringDupSql(),
      "dedup_paragraph" -> Dedup.paragraphDedupSql,
      "dedup_paragraph_rewrite" -> Dedup.paragraphRewriteSql,
      "dedup_chunk_hist" -> Dedup.chunkDupHistSql,
      "text_novelty" -> TextFunctions.noveltySql,
      "text_dup_gram_share" -> TextFunctions.dupGramShareSql,
      "text_unigram_surprisal" -> TextFunctions.unigramSurprisalSql,
      "pipe_tokenizer_fertility" -> TextFunctions.tokenizerFertilitySql,
      "pipe_token_histogram" -> TextFunctions.tokenHistogramSql,
      "pipe_vocab_growth" -> TextFunctions.vocabGrowthSql,
      "text_char_diversity" -> TextFunctions.charDiversitySql,
      "emb_norm_stats" -> Ann.normStatsSql,
      "emb_dim_variance" -> Ann.dimVarianceSql,
      "emb_dim_quantiles" -> Ann.dimQuantilesSql,
      "emb_pca_power" -> Ann.pcaPowerSql,
      "ann_nndescent_round" -> Ann.nnDescentRoundSql(),
      "ann_nndescent_converge" -> Ann.nnDescentConvergeSql(),
      "emb_outlier_share" -> Ann.outlierShareSql,
      "dedup_minhash_lsh" -> Dedup.minhashLshSql,
      "dedup_simhash" -> Dedup.simhashSql,
      "dedup_ngram_jaccard" -> Dedup.ngramJaccardSql,
      "dedup_embedding_cosine" -> Ann.embeddingDupSql,
      "dedup_containment" -> Dedup.containmentSql,
      "dedup_semantic" -> Ann.semanticDedupSql(),
      "pipe_dedup_keep_best" -> Dedup.keepBestSql,
      "text_repetition" -> TextFunctions.repetitionSql,
      "text_tfidf" -> TextFunctions.tfidfSql(),
      "text_doc_freq" -> TextFunctions.termDocFreqSql,
      // ── Similarity search ──────────────────────────────────────────
      "ann_bruteforce_topk" -> Ann.bruteForceSql,
      "ann_lsh_topk" -> Ann.lshTopKSql,
      "ann_multiprobe_topk" -> Ann.multiprobeTopKSql,
      "dedup_cluster" -> Dedup.clusterSql,
      // the large-star/small-star form must produce the SAME components
      // as min-label propagation on this corpus — shared oracle proves it
      "dedup_cluster_lss" -> Dedup.clusterSql,
      "ann_ivf_topk" -> Ann.ivfTopKSql,
      "ann_range_search" -> Ann.rangeSearchSql,
      "mm_semantic_join" -> Ann.semanticJoinSql,
      // ── Multimodal ─────────────────────────────────────────────────
      "mm_binary_meta" -> Video.binaryMetaSql,
      "mm_frame_sample" -> Video.frameSampleSql,
      "mm_video_decode" -> Video.videoDecodeSql,
      "mm_video_resize" -> Video.videoResizeSql,
      "mm_scene_detect" -> Video.sceneDetectSql,
      "mm_modality_stats" -> Binary.modalityStatsSql,
      "mm_image_decode" -> Binary.imageDecodeSql,
      "mm_image_resize" -> Binary.imageResizeSql,
      "mm_audio_resample" -> Binary.audioResampleSql,
      "pipe_dataset_diff" -> TextFunctions.datasetDiffSql,
      "mm_audio_decode" -> Binary.audioDecodeSql,
      "mm_audio_stats" -> Binary.audioStatsSql,
      "mm_image_stats" -> Binary.imageStatsSql,
      "mm_image_phash" -> Binary.imagePhashSql,
      "cdc_update_diff" -> Monitoring.updateDiffSql(cl),
      "cdc_txn_group" -> Monitoring.txnGroupSql(cl),
      "cdc_offset_gaps" -> Monitoring.offsetGapsSql,
      "cdc_consumer_lag" -> Monitoring.consumerLagSql(),
      "cdc_replay_plan" -> Monitoring.replayPlanSql(),
      "cdc_slot_retention" -> Monitoring.slotRetentionSql(),
      "cdc_checkpoint_browse" -> Monitoring.checkpointBrowseSql,
      "cdc_log_browse" -> Monitoring.logBrowseSql(),
      "cdc_log_browse_seek" -> Monitoring.logBrowseSeekSql(),
      "cdc_log_levels" -> Monitoring.logLevelsSql,
      "cdc_event_browse" -> Monitoring.eventBrowseSql(),
      "cdc_event_browse_seek" -> Monitoring.eventBrowseSeekSql(),
      "cdc_audit_browse_seek" -> Monitoring.auditBrowseSeekSql(),
      "cdc_salt_advisor" -> Monitoring.saltAdvisorSql(),
      "mm_audio_fp_dedup" -> Binary.audioFingerprintDedupSql,
      "cdc_audit_browse" -> Monitoring.auditBrowseSql(),
      "cdc_audit_facets" -> Monitoring.auditFacetsSql,
      "cdc_dml_mix_trend" -> Monitoring.dmlMixTrendSql,
      "mm_audio_silence" -> Binary.audioSilenceSql(),
      "mm_audio_clipping" -> Binary.audioClippingSql(),
      "text_redundancy_curve" -> TextFunctions.redundancyCurveSql,
      "cdc_event_size_pcts" -> Monitoring.eventSizePercentilesSql(),
      "cdc_hot_key_share" -> Monitoring.hotKeyShareSql,
      "q_cumulative_uniques" -> Relational.cumulativeUniquesSql,
      "q_event_attribution" -> Relational.eventAttributionSql,
      "cdc_table_activity" -> Monitoring.tableActivitySql(),
      "dedup_lsh_tune" -> Dedup.lshTuneSql(),
      "ann_recall_curve" -> Ann.recallCurveSql(),
      "q_streaks" -> Relational.streaksSql,
      "text_burstiness" -> TextFunctions.burstinessSql,
      "ann_nlist_elbow" -> Ann.nlistElbowSql,
      "text_source_divergence" -> TextFunctions.sourceDivergenceSql,
      "ann_pq_m_sweep" -> Ann.pqMSweepSql,
      "ann_binary_topk" -> Ann.binaryTopKSql(),
      "ann_binary_recall" -> Ann.binaryRecallSql(),
      "q_session_paths" -> Relational.sessionPathsSql,
      "dedup_winnowing" -> Dedup.winnowingSql,
      "cdc_payload_profile" -> Monitoring.payloadProfileSql,
      "q_benford_audit" -> Relational.benfordAuditSql,
      "cdc_value_drift" -> Monitoring.valueDriftSql,
      "q_runs_test" -> Relational.runsTestSql,
      "emb_label_purity" -> Ann.labelPuritySql(),
      "q_new_vs_repeat" -> Relational.newVsRepeatSql,
      "emb_hubness" -> Ann.hubnessSql(),
      "q_priority_shipping" -> Relational.priorityShippingSql,
      "cdc_table_staleness" -> Monitoring.tableStalenessSql,
      "q_rolling_retention" -> Relational.rollingRetentionSql,
      "q_revenue_concentration" -> Relational.revenueConcentrationSql,
      "q6_forecast_revenue" -> Relational.q6ForecastRevenueSql,
      "q4_priority_late" -> Relational.q4PriorityLateSql,
      "q8_market_share" -> Relational.q8MarketShareSql,
      "q14_promo_share" -> Relational.q14PromoShareSql,
      "q17_small_qty" -> Relational.q17SmallQtySql,
      "q15_top_supplier" -> Relational.q15TopSupplierSql,
      "q16_supplier_variety" -> Relational.q16SupplierVarietySql,
      "q18_large_orders" -> Relational.q18LargeOrdersSql,
      "q19_disjunctive" -> Relational.q19DisjunctiveSql,
      "q9_product_profit" -> Relational.q9ProductProfitSql,
      "q21_late_supplier" -> Relational.q21LateSupplierSql,
      "q22_idle_balance" -> Relational.q22IdleBalanceSql,
      "q2_min_cost_supplier" -> Relational.q2MinCostSupplierSql,
      "q11_important_parts" -> Relational.q11ImportantPartsSql,
      "q12_late_priority_mix" -> Relational.q12LatePriorityMixSql,
      "q13_customer_distribution" -> Relational.q13CustomerDistributionSql,
      "q20_excess_supply" -> Relational.q20ExcessSupplySql,
      "q_discount_mix" -> Relational.discountMixSql,
      "q_basket_size_hist" -> Relational.basketSizeHistSql,
      "cdc_load_calendar" -> Monitoring.loadCalendarSql,
      "q_product_growth" -> Relational.productGrowthSql(),
      "pipe_length_cut_curve" -> TextFunctions.lengthCutCurveSql,
      "q_value_migration" -> Relational.valueMigrationSql,
      "mm_image_colorfulness" -> Binary.imageColorfulnessSql,
      "pipe_context_fit" -> TextFunctions.contextFitSql,
      "cdc_uptime_report" -> Monitoring.uptimeReportSql,
      "emb_norm_length_corr" -> Ann.normLengthCorrSql,
      "q_part_supplier_breadth" -> Relational.partSupplierBreadthSql,
      "q_supplier_hhi" -> Relational.supplierHhiSql,
      "pipe_mix_balance" -> TextFunctions.mixBalanceSql,
      "emb_twonn_ratio" -> Ann.twonnRatioSql,
      "mm_video_motion" -> Video.videoMotionSql,
      "dedup_bloom_fpr" -> Dedup.bloomFprSql,
      "cdc_cold_keys" -> Monitoring.coldKeysSql,
      "mm_image_blur" -> Binary.imageBlurSql,
      "text_simpson_diversity" -> TextFunctions.simpsonDiversitySql,
      "q_trade_matrix" -> Relational.tradeMatrixSql,
      "cdc_arrival_jitter" -> Monitoring.arrivalJitterSql,
      "text_word_length_hist" -> TextFunctions.wordLengthHistSql,
      "mm_phash_hamming_hist" -> Binary.phashHammingHistSql,
      "pipe_quality_length_grid" -> TextFunctions.qualityLengthGridSql,
      "emb_anisotropy" -> Ann.anisotropySql,
      "q_orders_per_customer_hist" -> Relational.ordersPerCustomerHistSql,
      "text_vocab_coverage_curve" -> TextFunctions.vocabCoverageCurveSql,
      "ann_filtered_topk" -> Ann.filteredTopKSql(),
      "q_trade_balance" -> Relational.tradeBalanceSql,
      "q_dow_anova" -> Relational.dowAnovaSql,
      "cdc_volume_percentiles" -> Monitoring.volumePercentilesSql,
      "dedup_band_config_sweep" -> Dedup.bandConfigSweepSql,
      "dedup_shingle_df_hist" -> Dedup.shingleDfHistSql,
      "dedup_blocking_health" -> Dedup.blockingHealthSql,
      "cdc_partition_watermark_skew" -> Monitoring.partitionWatermarkSkewSql(),
      "q_ship_delay_hist" -> Relational.shipDelayHistSql,
      "q_repeat_purchase_rate" -> Relational.repeatPurchaseRateSql(),
      "mm_video_luma_range" -> Video.videoLumaRangeSql,
      "emb_pair_sim_hist" -> Ann.pairSimHistSql,
      "mm_audio_crest" -> Binary.audioCrestSql,
      "mm_image_aspect_hist" -> Binary.imageAspectHistSql,
      "emb_norm_hist" -> Ann.normHistSql,
      "cdc_sync_stats" -> Monitoring.syncStatsSql,
      "cdc_size_estimate" -> Discovery.sizeEstimateSql,
      "cdc_load_order" -> Discovery.loadOrderSql,
      "cdc_table_preview" -> Discovery.previewSql("events", 50),
      "cdc_lsn_latency_trend" -> Monitoring.lsnLatencyTrendSql(),
      "cdc_time_travel" -> Materialize.timeTravelSql(cl),
      "q_cube" -> Relational.cubeAggSql,
      "q_percentile_cont" -> Relational.percentileContSql,
      "q_cume_ntile" -> Relational.cumeNtileSql,
      "ann_knn_join" -> Ann.knnJoinSql(),
      "text_pii_scan" -> TextFunctions.piiScanSql,
      "text_pii_redact" -> TextFunctions.piiRedactSql,
      "pipe_lang_coverage" -> TextFunctions.langCoverageSql,
      "pipe_chunk_documents" -> TextFunctions.chunkDocumentsSql(),
      "pipe_sample_stratified" -> TextFunctions.sampleStratifiedSql,
      "pipe_token_budget" -> TextFunctions.tokenBudgetSql(),
      "pipe_domain_mix" -> TextFunctions.domainMixSql,
      "pipe_epochs_plan" -> TextFunctions.epochsPlanSql(),
      "pipe_curriculum" -> TextFunctions.curriculumSql,
      "ann_probe_sweep" -> Ann.probeSweepSql(),
      "cdc_watermark_advise" -> Monitoring.watermarkAdviseSql(cl),
      "q_string_agg" -> Relational.stringAggSql,
      "cdc_sample_compare" -> Quality.sampleCompareSql(cl),
      "ann_recall_eval" -> Ann.recallEvalSql(),
      "pipe_interleave" -> TextFunctions.interleaveSql,
      "q7_volume" -> Relational.q7VolumeSql,
      "q10_returns" -> Relational.q10ReturnsSql,
      "mm_frame_dedup" -> Video.frameDedupSql,
      "pipe_contamination" -> Dedup.contaminationSql,
      "pipe_decontaminate" -> Dedup.decontaminateSql(),
      "emb_matryoshka_recall" -> Ann.matryoshkaRecallSql(),
      "emb_whitening_effect" -> Ann.whiteningEffectSql,
      // same oracle as cdc_materialize_latest: the salted two-phase
      // aggregation must be bit-identical to the plain one
      "cdc_materialize_salted" ->
        s"""$cl, ranked AS (
           |  SELECT pk, op, value, ts,
           |         row_number() OVER (PARTITION BY pk ORDER BY ts DESC, seq DESC) AS rn,
           |         count(*) OVER (PARTITION BY pk) AS n_changes
           |  FROM changelog)
           |SELECT pk AS user_id, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value, ts AS updated_at, n_changes
           |FROM ranked WHERE rn = 1 AND op <> 'd' ORDER BY user_id""".stripMargin,
      // advisor-wired apply: the result is provably salt-independent, so
      // the oracle is the same window form regardless of which topology
      // the advisor picked on this corpus
      "cdc_materialize_advised" ->
        s"""$cl, ranked AS (
           |  SELECT pk, op, value, ts,
           |         row_number() OVER (PARTITION BY pk ORDER BY ts DESC, seq DESC) AS rn,
           |         count(*) OVER (PARTITION BY pk) AS n_changes
           |  FROM changelog)
           |SELECT pk AS user_id, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value, ts AS updated_at, n_changes
           |FROM ranked WHERE rn = 1 AND op <> 'd' ORDER BY user_id""".stripMargin,
      "cdc_burst_detect" -> Monitoring.burstDetectSql(cl),
      "cdc_robust_anomaly" -> Monitoring.robustAnomalySql(cl),
      "cdc_lag_sla" -> Monitoring.lagSlaSql(cl),
      "cdc_status_board" -> Monitoring.statusBoardSql,
      "cdc_op_transitions" -> Monitoring.opTransitionsSql(cl),
      "cdc_error_budget" -> Monitoring.errorBudgetSql(cl),
      "text_gopher_rules" -> TextFunctions.gopherRulesSql,
      "pipe_contamination_semantic" -> Ann.contaminationSemanticSql,
      "cdc_gdpr_erasure" -> Quality.gdprErasureSql(cl),
      "pipe_dataset_card" -> TextFunctions.datasetCardSql,
      "q_range_frame" -> Relational.rangeFrameSql,
      "q_skyline" -> Relational.skylineSql,
      "cdc_materialize_composite" ->
        """WITH ranked AS (
          |  SELECT l_suppkey, l_partkey,
          |         CASE WHEN l_returnflag = 'R' THEN 'd' ELSE 'u' END AS op,
          |         l_shipdate, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
          |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
          |         row_number() OVER (PARTITION BY l_suppkey, l_partkey
          |                            ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rn,
          |         count(*) OVER (PARTITION BY l_suppkey, l_partkey) AS n_changes
          |  FROM lineitem)
          |SELECT l_suppkey, l_partkey, price, l_shipdate, l_orderkey, l_linenumber, n_changes
          |FROM ranked WHERE rn = 1 AND op <> 'd'
          |ORDER BY l_suppkey, l_partkey""".stripMargin,
      "cdc_scd3" -> Materialize.scd3Sql(cl),
      "ann_ivf_build" -> Ann.ivfBuildSql,
      "ann_kmeans_refine" -> Ann.kmeansRefineSql,
      "ann_kmeans_converge" -> Ann.kmeansConvergeSql(),
      "q_unpivot" -> Relational.unpivotMeasuresSql,
      "cdc_audit_chain" -> Monitoring.auditChainSql(cl),
      "q_gap_fill" -> Relational.gapFillSql,
      "cdc_conflict_resolve" -> Materialize.conflictResolveSql(cl),
      "q_histogram" -> Relational.histogramSql(),
      "text_cooccurrence" -> TextFunctions.cooccurrenceSql(),
      "q_cohort_retention" -> Relational.cohortRetentionSql,
      "q_funnel" -> Relational.funnelSql,
      "pipe_shard_plan" -> TextFunctions.shardPlanSql(),
      "cdc_backfill_ranges" -> Monitoring.backfillRangesSql,
      "pipe_quality_drift" -> TextFunctions.qualityDriftSql,
      "pipe_pack_sequences" -> TextFunctions.packSequencesSql(),
      "pipe_pack_efficiency" -> TextFunctions.packEfficiencySql(),
      "text_zipf_check" -> TextFunctions.zipfCheckSql(),
      "text_sentence_stats" -> TextFunctions.sentenceStatsSql,
      "text_hapax" -> TextFunctions.hapaxSql,
      "text_readability" -> TextFunctions.readabilitySql,
      "pipe_quality_by_lang" -> TextFunctions.qualityByLangSql,
      "q_interval_overlap" -> Relational.intervalOverlapSql,
      "q_yoy_growth" -> Relational.yoyGrowthSql,
      "cdc_state_size" -> Monitoring.stateSizeSql(cl),
      "q_market_basket" -> Relational.marketBasketSql(),
      "cdc_table_checksum" -> Quality.tableChecksumSql,
      "cdc_order_violations" -> Monitoring.orderViolationsSql(cl),
      "text_char_stats" -> TextFunctions.charStatsSql,
      "cdc_trigger_advise" -> Monitoring.triggerAdviseSql(cl),
      "q_lapse_cohorts" -> Relational.lapseCohortsSql,
      "cdc_volume_forecast" -> Monitoring.volumeForecastSql(cl),
      "q_percent_of_total" -> Relational.percentOfTotalSql,
      "cdc_key_lifecycle" -> Monitoring.keyLifecycleSql(cl),
      "dedup_minhash_accuracy" -> Dedup.minhashAccuracySql,
      "q_dow_seasonality" -> Relational.dowSeasonalitySql,
      "pipe_dup_rate_by_source" -> TextFunctions.dupRateBySourceSql,
      "cdc_retention_impact" -> Monitoring.retentionImpactSql(cl),
      "mm_frame_stats" -> Video.frameStatsSql,
      "q_corr_ols" -> Relational.corrOlsSql,
      "q_mad" -> Relational.madByFlagSql,
      // r17 sketch-contract gates: the oracle recomputes the exact-side
      // columns and pins every contract verdict column to literal 1
      "q_mad_approx_gate" -> SketchGates.madGateSql,
      "cdc_lag_percentiles_approx_gate" -> SketchGates.lagPercentilesGateSql(cl),
      "cdc_event_size_pcts_approx_gate" -> SketchGates.eventSizeGateSql(),
      "cdc_watermark_advise_approx_gate" -> SketchGates.watermarkAdviseGateSql(cl),
      "emb_dim_quantiles_approx_gate" -> SketchGates.dimQuantilesGateSql,
      "cdc_hot_key_share_approx_gate" -> SketchGates.hotKeyShareGateSql,
      "text_doc_freq_approx_gate" -> SketchGates.docFreqGateSql,
      "q_cumulative_uniques_approx_gate" -> SketchGates.cumulativeUniquesGateSql,
      "cdc_hot_key_share_cms" -> SketchGates.hotKeyShareCmsSql,
      "ann_pq_topk" -> Ann.pqTopKSql(),
      "dedup_incremental" -> Dedup.incrementalSql(),
      "pipe_cross_source_dup" -> Dedup.crossSourceDupSql,
      "pipe_source_overlap" -> TextFunctions.sourceOverlapSql,
      "pipe_contamination_ngram" -> Dedup.contaminationNgramSql(),
      "pipe_mix_drift" -> TextFunctions.mixDriftSql,
      "pipe_mix_anneal" -> TextFunctions.mixAnnealSql,
      "dedup_threshold_curve" -> Dedup.thresholdCurveSql,
      "dedup_pair_degree" -> Dedup.pairDegreeSql,
      "dedup_component_stats" -> Dedup.componentStatsSql,
      "dedup_band_occupancy" -> Dedup.bandOccupancySql,
      "dedup_simhash_tables" -> Dedup.simhashTableStatsSql,
      "dedup_simhash_dist_hist" -> Dedup.simhashDistanceHistSql,
      "pipe_dedup_waterfall" -> Dedup.dedupWaterfallSql,
      "dedup_semantic_incremental" -> Ann.semanticIncrementalSql(),
      "text_rarity" -> TextFunctions.raritySql,
      "text_bigram_coherence" -> TextFunctions.bigramCoherenceSql,
      "ann_pq_recall" -> Ann.pqRecallSql(),
      "ann_pq_rerank" -> Ann.pqRerankSql(),
      "ann_ivfpq_topk" -> Ann.ivfpqTopKSql(),
      "ann_index_menu" -> Ann.indexMenuSql(),
      "ann_sq8_topk" -> Ann.sq8TopKSql(),
      "ann_sq8_recall" -> Ann.sq8RecallSql(),
      "ann_ivf_occupancy" -> Ann.ivfOccupancySql,
      "ann_lsh_occupancy" -> Ann.lshOccupancySql,
      "emb_exact_dup" -> Ann.exactDupVectorsSql,
      "ann_sq8_build" -> Ann.sq8BuildSql,
      "ann_centroid_separation" -> Ann.centroidSeparationSql,
      "text_bpe_pairs" -> TextFunctions.bpePairsSql(),
      "emb_centroid_drift" -> Ann.centroidDriftSql,
      "pipe_temperature_mix" -> TextFunctions.temperatureMixSql,
    )
  }
}
