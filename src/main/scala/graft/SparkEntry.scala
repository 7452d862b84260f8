package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.geo.GeoQueries
import graft.operators.{Ann, Dedup, Multimodal, Relational, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every query ends in a total order and uses the deterministic
  * arithmetic scheme of SURVEY.md §5; `oracleSql` entries are the
  * DuckDB twins, validated locally before commit.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // geo / reference surface
    "g1_tile_parse"           -> GeoQueries.tileParse _,
    "g2_region_filter"        -> GeoQueries.regionFilter _,
    "g3_grid_expand"          -> GeoQueries.gridExpandQ _,
    "g4_elevation_stats"      -> GeoQueries.elevationStats _,
    "g5_ingest_manifest"      -> GeoQueries.ingestManifest _,
    "g6_region_elevation_join" -> GeoQueries.regionElevation _,
    "g7_raster_ingest"        -> GeoQueries.rasterIngest _,
    "g8_listing_manifest"     -> GeoQueries.listingManifest _,
    "g9_raster_tiff"          -> GeoQueries.rasterIngestTiff _,
    "g10_raster_tiff_deflate" -> GeoQueries.rasterIngestTiffDeflate _,
    "g13_raster_tiff_nodata"  -> GeoQueries.rasterIngestTiffNodata _,
    "g11_partition_prune"     -> GeoQueries.tiledRegionQuery _,
    "g12_raster_tiff_i16"     -> GeoQueries.rasterIngestTiffI16 _,
    "g14_slope_aspect"        -> GeoQueries.slopeAspect _,
    "g15_flow_dir"            -> GeoQueries.flowDir _,
    "g16_zorder"              -> GeoQueries.zorderLayout _,
    "g17_overviews"           -> GeoQueries.overviews _,
    "g18_hillshade"           -> GeoQueries.hillshade _,
    "g19_flow_accum"          -> GeoQueries.flowAccum _,
    "g20_halo_slope"          -> GeoQueries.haloSlope _,
    "g21_compaction_plan"     -> ((s: SparkSession, d: String) =>
      GeoQueries.compactionPlan(s, d)),
    "g34_compaction_apply"    -> ((s: SparkSession, d: String) =>
      GeoQueries.compactionApply(s, d)),
    "g35_raster_tiff_zstdbig" -> GeoQueries.rasterIngestTiffZstdBig _,
    "g36_snapshot_commit"     -> GeoQueries.snapshotCommit _,
    "g37_raster_tiff_jpeg"    -> GeoQueries.rasterIngestTiffJpeg _,
    "g38_warp_resample"       -> GeoQueries.warpResample _,
    "g42_warp_average"        -> GeoQueries.warpAverage _,
    "g43_warp_bilinear"       -> GeoQueries.warpBilinear _,
    "g45_warp_mercator"       -> GeoQueries.warpMercator _,
    "g46_warp_upsample"       -> GeoQueries.warpUpsample _,
    "g44_stats_prune"         -> GeoQueries.statsPrune _,
    "g39_snapshot_merge"      -> GeoQueries.snapshotMerge _,
    "g40_snapshot_changes"    -> GeoQueries.snapshotChanges _,
    "g41_incremental_agg"     -> GeoQueries.incrementalAgg _,
    "g22_watersheds"          -> GeoQueries.watersheds _,
    "g23_hypsometry"          -> GeoQueries.hypsometry _,
    "g24_ruggedness"          -> ((s: SparkSession, d: String) =>
      GeoQueries.ruggedness(s, d)),
    "g25_polygon_filter"      -> GeoQueries.polygonFilter _,
    "g26_geotags"             -> GeoQueries.geotags _,
    "g27_raster_packbits"     -> GeoQueries.rasterIngestTiffPackbits _,
    "g28_contours"            -> GeoQueries.contourCensus _,
    "g29_path_profile"        -> GeoQueries.pathProfile _,
    "g30_line_of_sight"       -> GeoQueries.lineOfSight _,
    "g31_flow_length"         -> GeoQueries.flowLength _,
    "g32_tpi"                 -> ((s: SparkSession, d: String) =>
      GeoQueries.tpi(s, d)),
    "g33_basin_stats"         -> GeoQueries.basinStats _,
    // relational core
    "q1_agg"                  -> Relational.q1Agg _,
    "q2_topk"                 -> Relational.q2Topk _,
    "q3_join"                 -> Relational.q3Join _,
    "q4_priority_late"        -> Relational.q4PriorityLate _,
    "q5_multijoin"            -> Relational.q5Multijoin _,
    "q35_fk_reconcile"        -> Relational.q35FkReconcile _,
    "q6_filter"               -> Relational.q6Filter _,
    "q7_semi"                 -> Relational.q7Semi _,
    "q8_anti"                 -> Relational.q8Anti _,
    "q9_window"               -> Relational.q9Window _,
    "q10_rollup"              -> Relational.q10Rollup _,
    "q11_distinct"            -> Relational.q11Distinct _,
    "q12_events_window"       -> Relational.q12EventsWindow _,
    "q13_sessionize"          -> Relational.q13Sessionize _,
    "q14_asof_join"           -> Relational.q14AsofJoin _,
    "q32_asof_forward"        -> Relational.q32AsofForward _,
    "q33_asof_nearest"        -> Relational.q33AsofNearest _,
    "q34_funnel"              -> Relational.q34Funnel _,
    "q36_concurrency"         -> ((s, d) => Relational.q36Concurrency(s, d)),
    "q38_delta_agg"           -> Relational.q38DeltaAgg _,
    "q39_setops_all"          -> Relational.q39SetopsAll _,
    "q40_range_frame"         -> Relational.q40RangeFrame _,
    "q41_session_window"      -> Relational.q41SessionWindow _,
    "q42_analyze_stats"       -> Relational.q42AnalyzeStats _,
    "q43_cube"                -> Relational.q43Cube _,
    "q44_not_in_null"         -> Relational.q44NotInNull _,
    "q45_rank_dist"           -> Relational.q45RankDist _,
    "q46_waiting_orders"      -> Relational.q46WaitingOrders _,
    "q47_asof_tolerance"      -> ((s, d) => Relational.q47AsofTolerance(s, d)),
    "q48_table_stats"         -> ((s, d) => Relational.q48TableStats(s, d)),
    "q49_group_mode"          -> Relational.q49GroupMode _,
    "q50_sketch_rollup"       -> Relational.q50SketchRollup _,
    "q51_sketch_overlap"      -> Relational.q51SketchOverlap _,
    "q52_twap"                -> Relational.q52Twap _,
    "q54_changepoint"         -> Relational.q54Changepoint _,
    "q55_skyline"             -> Relational.q55Skyline _,
    "q56_weighted_median"     -> Relational.q56WeightedMedian _,
    "q57_interval_union"      -> Relational.q57IntervalUnion _,
    "q58_growth_accounting"   -> Relational.q58GrowthAccounting _,
    "q59_period_balance"      -> Relational.q59PeriodBalance _,
    "q60_mad"                 -> Relational.q60Mad _,
    "q61_benford"             -> Relational.q61Benford _,
    "q62_basket"              -> Relational.q62Basket _,
    "q63_global_customers"    -> Relational.q63GlobalCustomers _,
    "q64_rfm"                 -> Relational.q64Rfm _,
    "q65_interarrival"        -> Relational.q65Interarrival _,
    "q66_bilateral_volume"    -> Relational.q66BilateralVolume _,
    "q67_returned_topk"       -> ((s: SparkSession, d: String) =>
      Relational.q67ReturnedTopK(s, d)),
    "q68_abc_classes"         -> Relational.q68AbcClasses _,
    "q69_skew_join"           -> ((s: SparkSession, d: String) =>
      Relational.q69SkewJoin(s, d)),
    "q70_attribution"         -> ((s: SparkSession, d: String) =>
      Relational.q70Attribution(s, d)),
    "q71_variant"             -> Relational.q71Variant _,
    "q72_pagerank"            -> ((s: SparkSession, d: String) =>
      Relational.q72Pagerank(s, d)),
    "q73_group_topn"          -> ((s: SparkSession, d: String) =>
      Relational.q73GroupTopn(s, d)),
    "q74_hierarchy"           -> Relational.q74Hierarchy _,
    "q75_dpp"                 -> Relational.q75Dpp _,
    "q76_bloom_join"          -> Relational.q76BloomJoin _,
    "q77_lateral"             -> Relational.q77Lateral _,
    "q53_transitions"         -> Relational.q53Transitions _,
    "q37_retention"           -> Relational.q37Retention _,
    "q15_json"                -> Relational.q15Json _,
    "q16_approx_distinct"     -> Relational.q16ApproxDistinct _,
    "q17_quantiles"           -> Relational.q17Quantiles _,
    "q18_correlated"          -> Relational.q18Correlated _,
    "q19_setops"              -> Relational.q19Setops _,
    "q20_range_join"          -> Relational.q20RangeJoin _,
    "q21_outer"               -> Relational.q21Outer _,
    "q22_fullouter"           -> Relational.q22FullOuter _,
    "q23_merge"               -> Relational.q23Merge _,
    "q24_grouping_sets"       -> Relational.q24GroupingSets _,
    "q25_approx_quantiles"    -> Relational.q25ApproxQuantiles _,
    "q26_dq_audit"            -> ((s: SparkSession, d: String) =>
      graft.operators.Quality.dqAudit(s, d)),
    "q27_pivot"               -> Relational.q27Pivot _,
    "q28_gapfill"             -> Relational.q28Gapfill _,
    "q29_unpivot"             -> Relational.q29Unpivot _,
    "q30_sliding"             -> Relational.q30Sliding _,
    "q31_ntile"               -> Relational.q31Ntile _,
    // text analysis
    "t1_token_count"          -> TextAnalysis.tokenCounts _,
    "t2_quality"              -> TextAnalysis.qualityScores _,
    "t3_langid"               -> TextAnalysis.langId _,
    "t4_fingerprint"          -> TextAnalysis.fingerprints _,
    "t5_top_terms"            -> ((s: SparkSession, d: String) => TextAnalysis.topTerms(s, d)),
    "t6_tfidf"                -> ((s: SparkSession, d: String) => TextAnalysis.tfidfTerms(s, d)),
    "t7_pii_redact"           -> TextAnalysis.piiRedact _,
    "t8_heavy_hitters"        -> ((s: SparkSession, d: String) =>
      TextAnalysis.heavyHitters(s, d)),
    "t9_rep_signals"          -> TextAnalysis.repSignals _,
    "t10_domain_stats"        -> TextAnalysis.domainStats _,
    "t11_quality_model"       -> ((s: SparkSession, d: String) =>
      TextAnalysis.qualityModel(s, d)),
    "t12_gopher_gate"         -> TextAnalysis.gopherGate _,
    "t13_oov_rate"            -> ((s: SparkSession, d: String) =>
      TextAnalysis.oovRate(s, d)),
    "t14_ngram_novelty"       -> TextAnalysis.ngramNovelty _,
    "t15_lang_confusion"      -> TextAnalysis.langConfusion _,
    "t17_lm_fluency"          -> ((s: SparkSession, d: String) =>
      TextAnalysis.lmFluency(s, d)),
    "t18_readability"         -> ((s: SparkSession, d: String) =>
      TextAnalysis.readability(s, d)),
    "t19_script_mix"          -> ((s: SparkSession, d: String) =>
      TextAnalysis.scriptMix(s, d)),
    "t20_vocab_census"        -> ((s: SparkSession, d: String) =>
      TextAnalysis.vocabCensus(s, d)),
    "t21_burstiness"          -> ((s: SparkSession, d: String) =>
      TextAnalysis.termBurstiness(s, d)),
    "t22_effective_size"      -> ((s: SparkSession, d: String) =>
      TextAnalysis.effectiveSize(s, d)),
    "t23_zipf"                -> ((s: SparkSession, d: String) =>
      TextAnalysis.zipfCensus(s, d)),
    "t16_bigram_coverage"     -> ((s: SparkSession, d: String) =>
      TextAnalysis.bigramCoverage(s, d)),
    // dedup
    "d1_exact_dedup"          -> Dedup.exact _,
    "d10_url_dedup"           -> graft.operators.Curation.urlDedup _,
    "d11_line_dedup"          -> ((s: SparkSession, d: String) => Dedup.lineDedup(s, d)),
    "d12_containment"         -> ((s: SparkSession, d: String) => Dedup.containment(s, d)),
    "d2_minhash_lsh"          -> ((s: SparkSession, d: String) => Dedup.minhashLsh(s, d)),
    "d13_triangles"           -> Dedup.graphTriangles _,
    "d16_cluster_histogram"   -> Dedup.clusterSizeHistogram _,
    "d17_source_dup_rates"    -> Dedup.sourceDupRates _,
    "d14_source_overlap"      -> Dedup.sourceOverlapMatrix _,
    "d15_cluster_purity"      -> Dedup.clusterPurity _,
    "d18_sim_histogram"       -> Dedup.similarityHistogram _,
    "d3_simhash"              -> ((s: SparkSession, d: String) => Dedup.simhashPairs(s, d)),
    "d8_dup_clusters"         -> Dedup.dupClusters _,
    "d4_ngram_jaccard"        -> ((s: SparkSession, d: String) => Dedup.ngramJaccard(s, d)),
    "d5_embed_neardup"        -> ((s: SparkSession, d: String) => Dedup.embedNearDup(s, d)),
    // approximate by construction (cluster-bounded) → no SQL oracle;
    // recall vs d5's exact pairs + precision 1.0 asserted in DedupSpec
    "d9_semdedup"             -> ((s: SparkSession, d: String) => Dedup.semDedup(s, d)),
    "d6_repeated_spans"       -> ((s: SparkSession, d: String) =>
      graft.operators.Curation.repeatedSpans(s, d)),
    "d7_decontaminate"        -> ((s: SparkSession, d: String) =>
      graft.operators.Curation.decontaminate(s, d)),
    "p2_stratified_sample"    -> ((s: SparkSession, d: String) =>
      graft.operators.Curation.stratifiedSample(s, d)),
    "p3_pack_manifest"        -> ((s: SparkSession, d: String) =>
      graft.operators.Curation.packManifest(s, d)),
    "p4_pps_sample"           -> ((s: SparkSession, d: String) =>
      graft.operators.Curation.ppsSample(s, d)),
    "p5_temperature_mix"      -> ((s: SparkSession, d: String) =>
      graft.operators.Curation.temperatureMixQuery(s, d)),
    "p6_fixed_sample"         -> ((s: SparkSession, d: String) =>
      graft.operators.Curation.fixedSample(s, d)),
    "p7_dsir_select"          -> ((s: SparkSession, d: String) =>
      graft.operators.Curation.dsirSelect(s, d)),
    "p11_epoch_mix"           -> ((s: SparkSession, d: String) =>
      graft.operators.Curation.epochMixQuery(s, d)),
    "p12_soft_dedup"          -> ((s: SparkSession, d: String) =>
      graft.operators.Curation.softDedup(s, d)),
    "p13_curriculum"          -> ((s: SparkSession, d: String) =>
      graft.operators.Curation.curriculumPhases(s, d)),
    // similarity search
    "s1_ann_bruteforce"       -> ((s: SparkSession, d: String) => Ann.bruteForceTopK(s, d)),
    "s10_range_search"        -> ((s: SparkSession, d: String) => Ann.rangeSearch(s, d)),
    "s11_knn_classify"        -> ((s: SparkSession, d: String) => Ann.knnClassify(s, d)),
    "s12_pair_rescore"        -> ((s: SparkSession, d: String) => Ann.pairRescore(s, d)),
    "s13_hybrid_rrf"          -> ((s: SparkSession, d: String) => Ann.hybridRrf(s, d)),
    "s14_cos_calibration"     -> ((s: SparkSession, d: String) => Ann.cosCalibration(s, d)),
    // rows-only by declared design (audits the approximate indexes,
    // which have no SQL twin); AnnSpec asserts JVM identity + floors
    "s15_recall_audit"        -> ((s: SparkSession, d: String) => Ann.recallAudit(s, d)),
    "s9_mips_bruteforce"      -> ((s: SparkSession, d: String) => Ann.mipsTopK(s, d)),
    "s2_ann_lsh"              -> ((s: SparkSession, d: String) => Ann.lshTopK(s, d)),
    "s3_ann_ivf"              -> ((s: SparkSession, d: String) => Ann.ivfTopKAuto(s, d)),
    "s4_ann_pq"               -> ((s: SparkSession, d: String) => Ann.pqTopK(s, d)),
    "s6_ann_filtered"         -> ((s: SparkSession, d: String) => Ann.filteredIvfTopK(s, d)),
    "s7_knn_join"             -> ((s: SparkSession, d: String) => Ann.knnJoin(s, d)),
    "s8_ann_graph"            -> ((s: SparkSession, d: String) => Ann.graphSearchTopKAuto(s, d)),
    // approximate by construction (coarse-quantizer pruning + PQ codes)
    // → no SQL oracle; recall + exact-re-rank score identity in AnnSpec
    "s5_ann_ivfpq"            -> ((s: SparkSession, d: String) => Ann.ivfPqTopK(s, d)),
    // multimodal
    "m1_mm_manifest"          -> Multimodal.manifest _,
    "m4_frame_neardup"        -> ((s: SparkSession, d: String) =>
      Multimodal.frameNearDup(s, d)),
    "m7_scene_cuts"           -> ((s: SparkSession, d: String) =>
      Multimodal.sceneCuts(s, d)),
    "m9_visual_search"        -> ((s: SparkSession, d: String) =>
      Multimodal.visualSearch(s, d)),
    "m10_thumb_manifest"      -> ((s: SparkSession, d: String) =>
      Multimodal.thumbManifest(s, d)),
    "m2_frame_manifest"       -> ((s: SparkSession, d: String) =>
      Multimodal.frameManifest(s, d)),
    "m3_audio_manifest"       -> ((s: SparkSession, d: String) =>
      graft.operators.Audio.manifest(s, d)),
    "m8_vad_segments"         -> ((s: SparkSession, d: String) =>
      graft.operators.Audio.vadSegments(s, d)),
    "m11_clipping_audit"      -> ((s: SparkSession, d: String) =>
      graft.operators.Audio.clippingAudit(s, d)),
    "m13_pixel_stats"         -> ((s: SparkSession, d: String) =>
      Multimodal.pixelStats(s, d)),
    "m12_decode_audit"        -> ((s: SparkSession, d: String) =>
      Multimodal.decodeAudit(s, d)),
    "m5_audio_neardup"        -> ((s: SparkSession, d: String) =>
      graft.operators.Audio.audioNearDup(s, d)),
    "m6_image_neardup"        -> ((s: SparkSession, d: String) =>
      Multimodal.imageNearDup(s, d)),
    // ingest sources (file-format parse + quarantine audit)
    "j1_jsonl_ingest"         -> graft.operators.IngestQueries.jsonlIngest _,
    "j2_csv_ingest"           -> graft.operators.IngestQueries.csvIngest _,
    "j3_schema_evolution"     -> graft.operators.IngestQueries.schemaEvolution _,
    "j4_orc_ingest"           -> graft.operators.IngestQueries.orcIngest _,
    "j5_xml_ingest"           -> graft.operators.IngestQueries.xmlIngest _,
    "j6_gzip_ingest"          -> graft.operators.IngestQueries.gzipIngest _,
    "j7_warc_ingest"          -> graft.operators.IngestQueries.warcIngest _,
    "j8_json_array_ingest"    -> graft.operators.IngestQueries.jsonArrayIngest _,
    "j9_avro_ingest"          -> graft.operators.IngestQueries.avroIngest _,
    "j10_delta_read"          -> graft.operators.IngestQueries.deltaRead _,
    "j11_iceberg_read"        -> graft.operators.IngestQueries.icebergRead _,
    "j12_delta_changes"       -> graft.operators.IngestQueries.deltaChanges _,
    "j13_iceberg_v2"          -> graft.operators.IngestQueries.icebergV2Read _,
    "j14_delta_dv"            -> graft.operators.IngestQueries.deltaDvRead _,
    "j15_iceberg_eqdel"       -> graft.operators.IngestQueries.icebergEqRead _,
    "j16_delta_dv_cdc"        -> graft.operators.IngestQueries.deltaDvChanges _,
    "j17_delta_skipping"      -> graft.operators.IngestQueries.deltaSkippingRead _,
    "j18_delta_v2cp"          -> graft.operators.IngestQueries.deltaV2cpRead _,
    "j19_iceberg_skipping"    -> graft.operators.IngestQueries.icebergSkippingRead _,
    "j20_delta_cm_id"         -> graft.operators.IngestQueries.deltaCmIdRead _,
    "j21_delta_export"        -> graft.operators.IngestQueries.deltaExportRead _,
    "j22_iceberg_export"      -> graft.operators.IngestQueries.icebergExportRead _,
    "j23_delta_log_export"    -> graft.operators.IngestQueries.deltaLogExportRead _,
    // composed pipelines
    "p1_curate"               -> ((s: SparkSession, d: String) =>
      graft.operators.Pipelines.curate(s, d)),
    "p8_web_pipeline"         -> ((s: SparkSession, d: String) =>
      graft.operators.Pipelines.webPipeline(s, d)),
    "p9_cluster_select"       -> ((s: SparkSession, d: String) =>
      graft.operators.Pipelines.clusterSelect(s, d)),
    "p10_split_check"         -> ((s: SparkSession, d: String) =>
      graft.operators.Pipelines.splitCheck(s, d)))

  // ---- oracle fragments shared across queries -----------------------

  /** Canonical text normalization — DuckDB twin of TextFns.normalize. */
  private val Nrm = raw"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"

  /** Tile universe CTE — DuckDB twin of Geo.tiles (SURVEY.md §3). */
  private val TilesCte = raw"""
    |tiles AS (
    |  SELECT p_partkey AS tile_id,
    |         ((p_partkey*37)%181)-90 AS lat0,
    |         ((p_partkey*73)%361)-180 AS lon0,
    |         ((p_partkey*2654435761)%10000000)+1000000 AS size_bytes
    |  FROM part),
    |keyed AS (
    |  SELECT *, printf('ALPSMLC30_%s%03d%s%03d_DSM',
    |    CASE WHEN lat0>=0 THEN 'N' ELSE 'S' END, abs(lat0),
    |    CASE WHEN lon0>=0 THEN 'E' ELSE 'W' END, abs(lon0)) AS tile_key
    |  FROM tiles)""".stripMargin

  /** Expanded-grid CTE — DuckDB twin of Geo.gridExpand (8×8, step 1/8). */
  private val GridCte = TilesCte + raw""",
    |grid AS (
    |  SELECT tile_id, tile_key, lat0, lon0,
    |         (lon0 + xs.x*(0.125::DOUBLE))::DOUBLE AS lon,
    |         (lat0 - ys.y*(0.125::DOUBLE))::DOUBLE AS lat,
    |         ((tile_id*131 + xs.x*17 + ys.y*29)%8848)::INT AS elevation
    |  FROM keyed, generate_series(0,7) ys(y), generate_series(0,7) xs(x))""".stripMargin

  /** Word-3-shingle CTE over documents — twin of TextFns.wordShingles. */
  private val ShingleCte = raw"""
    |d AS (SELECT doc_id, string_split($Nrm, ' ') AS w FROM documents),
    |sh AS (SELECT doc_id,
    |  CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
    |       ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)])
    |  END AS s
    |  FROM d)""".stripMargin

  /** Char-4-gram CTE — twin of TextFns.charGrams. */
  private val GramCte = raw"""
    |d AS (SELECT doc_id, $Nrm AS nrm FROM documents),
    |gr AS (SELECT doc_id,
    |  CASE WHEN length(nrm) < 4 THEN [nrm]
    |       ELSE list_distinct([nrm[i:i+3] for i in range(1, length(nrm)-2)])
    |  END AS g
    |  FROM d)""".stripMargin

  /** Normed double-embedding CTE — twin of VecFns. */
  private val VecCte = raw"""
    |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for the inherently
    * approximate/engine-specific ops (q16 HLL, q25 sketch quantiles,
    * s2/s3 ANN) → rows-only check. m1's oracle regenerates the PNG
    * fixture image's pixels (integer formulas of doc_id, x, y) and
    * folds them with HUGEINT wrapping arithmetic — exact because PNG
    * is lossless, so the real ImageIO decode on the Spark side
    * reproduces the formula pixels bit-for-bit.
    */
  def oracleSql: Map[String, String] = Map(
    // g17: every overview cell re-derived from the elevation formula
    // (tile universe < 50 mirrors the raster fixture); integer block
    // sums + min/max, r6 mean
    "g17_overviews" -> raw"""
      |WITH $TilesCte,
      |cells AS (SELECT tile_id, tile_key, l.level::BIGINT AS level, (1 << l.level) AS f,
      |    ox.ox AS ox, oy.oy AS oy
      |  FROM keyed, (SELECT unnest([1, 2]) AS level) l,
      |       generate_series(0, 3) ox(ox), generate_series(0, 3) oy(oy)
      |  WHERE tile_id < 50 AND ox.ox < 8 // (1 << l.level)
      |    AND oy.oy < 8 // (1 << l.level)),
      |ks AS (SELECT *, unnest(range(0, f * f)) AS k FROM cells),
      |px AS (SELECT tile_id, tile_key, level, f, ox, oy,
      |  (tile_id * 131 + (ox * f + k % f) * 17 + (oy * f + k // f) * 29) % 8848 AS v
      |  FROM ks),
      |agg AS (SELECT tile_id, tile_key, level, ox, oy,
      |  count(*)::BIGINT AS n_px, sum(v)::BIGINT AS block_sum,
      |  min(v)::BIGINT AS block_min, max(v)::BIGINT AS block_max
      |  FROM px GROUP BY tile_id, tile_key, level, ox, oy)
      |SELECT tile_id, tile_key, level, ox, oy, n_px, block_sum, block_min,
      |  block_max, floor(block_sum::DOUBLE / n_px * 1e6 + 0.5)::BIGINT AS avg_elev_e6
      |FROM agg ORDER BY tile_id, level, oy, ox""".stripMargin,
    // g42: area-average warp — exact integer overlap weights on the
    // common 1/5 grid (w = least(5s+5,8t+8) − greatest(5s,8t) per
    // axis), weight mass 64 per cell; elevations from the fixture
    // formula per SOURCE pixel, folded with the same weights
    "g42_warp_average" -> raw"""
      |WITH $TilesCte,
      |t AS (SELECT tile_id, tile_key, lat0, lon0, tys.ty, txs.tx
      |      FROM keyed, generate_series(0,4) tys(ty), generate_series(0,4) txs(tx)
      |      WHERE tile_id < 50),
      |w AS (SELECT tile_id, tile_key, lat0, lon0, ty, tx,
      |        (least(5*sxs.sx+5, 8*tx+8) - greatest(5*sxs.sx, 8*tx)) *
      |        (least(5*sys.sy+5, 8*ty+8) - greatest(5*sys.sy, 8*ty)) AS wt,
      |        ((tile_id*131 + sxs.sx*17 + sys.sy*29) % 8848) AS v
      |      FROM t, generate_series(0,7) sys(sy), generate_series(0,7) sxs(sx)
      |      WHERE 5*sxs.sx < 8*tx+8 AND 5*sxs.sx+5 > 8*tx
      |        AND 5*sys.sy < 8*ty+8 AND 5*sys.sy+5 > 8*ty)
      |SELECT tile_id, tile_key, ty::BIGINT AS ty, tx::BIGINT AS tx,
      |       (lon0*1000000 + (2*tx + 1)*100000)::BIGINT AS lon_e6,
      |       (lat0*1000000 - (2*ty + 1)*100000)::BIGINT AS lat_e6,
      |       sum(wt*v)::BIGINT AS wsum,
      |       floor(sum(wt*v)::DOUBLE / 64 * 1e6 + 0.5)::BIGINT AS avg_e6
      |FROM w GROUP BY tile_id, tile_key, ty, tx, lat0, lon0
      |ORDER BY tile_id, ty, tx""".stripMargin,
    // g43: bilinear warp — GDAL's pixel-center inverse map is exact
    // in tenths at 8→5 (X = 16t+3, x0 = X//10, fx = X%10), and the
    // four-corner fold is one integer numerator with mass 100;
    // elevations from the fixture formula per corner pixel
    "g43_warp_bilinear" -> raw"""
      |WITH $TilesCte,
      |t AS (SELECT tile_id, tile_key, lat0, lon0, tys.ty, txs.tx
      |      FROM keyed, generate_series(0,4) tys(ty), generate_series(0,4) txs(tx)
      |      WHERE tile_id < 50),
      |c AS (SELECT *, (16*tx + 3)//10 AS x0, (16*tx + 3)%10 AS fx,
      |             (16*ty + 3)//10 AS y0, (16*ty + 3)%10 AS fy
      |      FROM t),
      |b AS (SELECT tile_id, tile_key, lat0, lon0, ty, tx,
      |        (10 - fy) * ((10 - fx) * ((tile_id*131 + x0*17     + y0*29)     % 8848)
      |                   + fx        * ((tile_id*131 + (x0+1)*17 + y0*29)     % 8848))
      |      + fy        * ((10 - fx) * ((tile_id*131 + x0*17     + (y0+1)*29) % 8848)
      |                   + fx        * ((tile_id*131 + (x0+1)*17 + (y0+1)*29) % 8848)) AS bsum
      |      FROM c)
      |SELECT tile_id, tile_key, ty::BIGINT AS ty, tx::BIGINT AS tx,
      |       (lon0*1000000 + (2*tx + 1)*100000)::BIGINT AS lon_e6,
      |       (lat0*1000000 - (2*ty + 1)*100000)::BIGINT AS lat_e6,
      |       bsum::BIGINT AS bsum,
      |       floor(bsum::DOUBLE / 100 * 1e6 + 0.5)::BIGINT AS interp_e6
      |FROM b ORDER BY tile_id, ty, tx""".stripMargin,
    // g44: the grid census for the probed tile range, straight from
    // the generating formulas — file skipping must be invisible to
    // the rows (the pruned scan is a superset, the query's own
    // predicate decides membership); a skipped qualifying file
    // diverges every aggregate
    "g44_stats_prune" -> raw"""
      |WITH $GridCte
      |SELECT count(*) AS n_rows,
      |       sum(elevation)::BIGINT AS sum_elev,
      |       min(tile_id)::BIGINT AS min_tile,
      |       max(tile_id)::BIGINT AS max_tile,
      |       count(DISTINCT tile_id) AS n_tiles
      |FROM grid WHERE tile_id BETWEEN 100 AND 149""".stripMargin,
    // g16: Morton interleave re-derived term-by-term with shifts; the
    // span/n_cells columns ARE the layout proof (≤7 and 1 on every row)
    "g16_zorder" -> raw"""
      |WITH $TilesCte,
      |z AS (SELECT tile_id, lat0, lon0,
      |  list_sum([(((lat0 + 90) >> i) & 1) * (1::BIGINT << (2*i)) +
      |            (((lon0 + 180) >> i) & 1) * (1::BIGINT << (2*i+1))
      |            for i in range(0, 9)]) AS zcode
      |  FROM tiles)
      |SELECT (zcode // 64)::BIGINT AS zblock, count(*)::BIGINT AS n_tiles,
      |  min(lat0) AS lat_min, max(lat0) AS lat_max,
      |  min(lon0) AS lon_min, max(lon0) AS lon_max,
      |  max(lat0) - min(lat0) AS lat_span,
      |  max(lon0) - min(lon0) AS lon_span,
      |  count(DISTINCT ((lat0 + 90) // 8) * 1000 + ((lon0 + 180) // 8))::BIGINT AS n_cells
      |FROM z GROUP BY zblock ORDER BY zblock""".stripMargin,
    "g1_tile_parse" -> raw"""
      |WITH $TilesCte
      |SELECT tile_id, tile_key, lat0, lon0,
      |  CASE WHEN regexp_extract(tile_key, 'ALPSMLC30_([NS])(\d{3})([EW])(\d{3})_DSM', 1) = 'N'
      |       THEN regexp_extract(tile_key, 'ALPSMLC30_([NS])(\d{3})([EW])(\d{3})_DSM', 2)::INT
      |       ELSE -(regexp_extract(tile_key, 'ALPSMLC30_([NS])(\d{3})([EW])(\d{3})_DSM', 2)::INT)
      |  END AS parsed_lat,
      |  CASE WHEN regexp_extract(tile_key, 'ALPSMLC30_([NS])(\d{3})([EW])(\d{3})_DSM', 3) = 'E'
      |       THEN regexp_extract(tile_key, 'ALPSMLC30_([NS])(\d{3})([EW])(\d{3})_DSM', 4)::INT
      |       ELSE -(regexp_extract(tile_key, 'ALPSMLC30_([NS])(\d{3})([EW])(\d{3})_DSM', 4)::INT)
      |  END AS parsed_lon,
      |  (parsed_lat = lat0 AND parsed_lon = lon0) AS roundtrip_ok
      |FROM keyed ORDER BY tile_id""".stripMargin,
    "g2_region_filter" -> raw"""
      |WITH t AS (SELECT ((l_orderkey*10 + l_linenumber)*37)%181 - 90 AS lat,
      |                  ((l_orderkey*10 + l_linenumber)*73)%361 - 180 AS lon
      |           FROM lineitem)
      |SELECT
      |  sum(CASE WHEN lat BETWEEN 50 AND 53 AND lon BETWEEN 3 AND 7 THEN 1 ELSE 0 END)::BIGINT AS netherlands_tiles,
      |  sum(CASE WHEN lat BETWEEN 42 AND 51 AND lon BETWEEN -6 AND 9 THEN 1 ELSE 0 END)::BIGINT AS france_tiles,
      |  sum(CASE WHEN lat BETWEEN 23 AND 80 AND lon BETWEEN -25 AND 49 THEN 1 ELSE 0 END)::BIGINT AS europe_tiles,
      |  count(*) AS world_tiles
      |FROM t""".stripMargin,
    "g3_grid_expand" -> raw"""
      |WITH $GridCte
      |SELECT tile_id, tile_key, lon, lat, elevation
      |FROM grid WHERE tile_id < 20 ORDER BY tile_id, lat, lon""".stripMargin,
    "g4_elevation_stats" -> raw"""
      |WITH $GridCte
      |SELECT tile_key, count(*) AS n_pixels, min(elevation) AS min_elev,
      |       max(elevation) AS max_elev, floor(avg(elevation) * 1e6 + 0.5)::BIGINT AS avg_elev_e6
      |FROM grid GROUP BY 1 ORDER BY 1""".stripMargin,
    "g5_ingest_manifest" -> raw"""
      |WITH $TilesCte,
      |local AS (SELECT tile_key,
      |            size_bytes - (CASE WHEN tile_id%5 = 0 THEN 1 ELSE 0 END) AS size_bytes
      |          FROM keyed WHERE tile_id%3 = 0)
      |SELECT tile_id, tile_key, size_bytes FROM keyed r
      |WHERE NOT EXISTS (SELECT 1 FROM local l
      |                  WHERE l.tile_key = r.tile_key AND l.size_bytes = r.size_bytes)
      |ORDER BY tile_id""".stripMargin,
    "g6_region_elevation_join" -> raw"""
      |WITH $GridCte,
      |m AS (
      |  SELECT 'netherlands' AS set_name, elevation FROM grid
      |    WHERE lat0 BETWEEN 50 AND 53 AND lon0 BETWEEN 3 AND 7
      |  UNION ALL
      |  SELECT 'france', elevation FROM grid
      |    WHERE lat0 BETWEEN 42 AND 51 AND lon0 BETWEEN -6 AND 9
      |  UNION ALL
      |  SELECT 'europe', elevation FROM grid
      |    WHERE lat0 BETWEEN 23 AND 80 AND lon0 BETWEEN -25 AND 49
      |  UNION ALL
      |  SELECT 'world', elevation FROM grid)
      |SELECT set_name, count(*) AS n_pixels, floor(avg(elevation) * 1e6 + 0.5)::BIGINT AS avg_elev_e6,
      |       max(elevation) AS max_elev
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "g7_raster_ingest" -> raw"""
      |WITH $GridCte
      |SELECT tile_id, tile_key, lat0, lon0, TRUE AS key_matches_header,
      |       count(*) AS n_pixels, min(elevation) AS min_elev, max(elevation) AS max_elev,
      |       floor(avg(elevation) * 1e6 + 0.5)::BIGINT AS avg_elev_e6, sum(elevation)::BIGINT AS sum_elev
      |FROM grid WHERE tile_id < 50
      |GROUP BY 1, 2, 3, 4 ORDER BY tile_id""".stripMargin,
    "g9_raster_tiff" -> raw"""
      |WITH $GridCte
      |SELECT tile_id, tile_key, lat0, lon0, TRUE AS dims_ok,
      |       count(*) AS n_pixels, min(elevation) AS min_elev, max(elevation) AS max_elev,
      |       floor(avg(elevation) * 1e6 + 0.5)::BIGINT AS avg_elev_e6, sum(elevation)::BIGINT AS sum_elev
      |FROM grid WHERE tile_id < 50
      |GROUP BY 1, 2, 3, 4 ORDER BY tile_id""".stripMargin,
    // g37: the block-constant formula (per-8x8-MCU, mod 251) — the
    // lossy codec roundtrips it exactly at quality 1.0
    // g39: both versions' censuses from the generating formulas —
    // v0 must read UNCHANGED after the merge (snapshot isolation),
    // v1 = base with [100,150) updated and [400,450) inserted
    // g41: the oracle states the FINAL view once and projects it as
    // both column pairs — maintained ≡ recomputed is the query's
    // claim, so any drift between them diverges the hash
    "g41_incremental_agg" -> raw"""
      |WITH $GridCte,
      |v2 AS (
      |  SELECT tile_id,
      |    (elevation + CASE WHEN tile_id >= 100 AND tile_id < 150
      |                      THEN 1000 ELSE 0 END)::BIGINT AS elev
      |  FROM grid WHERE tile_id >= 50 AND tile_id < 400
      |  UNION ALL
      |  SELECT tile_id, elevation::BIGINT FROM grid
      |  WHERE tile_id >= 400 AND tile_id < 450)
      |SELECT (tile_id // 50)::BIGINT AS bucket, count(*)::BIGINT AS n_rows,
      |  sum(elev)::BIGINT AS sum_elev, count(*)::BIGINT AS n_rows_full,
      |  sum(elev)::BIGINT AS sum_elev_full
      |FROM v2 GROUP BY 1 ORDER BY bucket""".stripMargin,
    // g40: the four change groups from the generating formulas —
    // update images carry [100,150) pre/post, insert [400,450),
    // delete the v2-replaced [0,50) at their v1 (unmerged) values
    "g40_snapshot_changes" -> raw"""
      |WITH $GridCte,
      |ch AS (
      |  SELECT 1 AS version, 'update_preimage' AS change_type, tile_id,
      |         elevation::BIGINT AS elev, 0::BIGINT AS gen
      |  FROM grid WHERE tile_id >= 100 AND tile_id < 150
      |  UNION ALL
      |  SELECT 1, 'update_postimage', tile_id, (elevation + 1000)::BIGINT, 1
      |  FROM grid WHERE tile_id >= 100 AND tile_id < 150
      |  UNION ALL
      |  SELECT 1, 'insert', tile_id, elevation::BIGINT, 1
      |  FROM grid WHERE tile_id >= 400 AND tile_id < 450
      |  UNION ALL
      |  SELECT 2, 'delete', tile_id, elevation::BIGINT, 0
      |  FROM grid WHERE tile_id < 50)
      |SELECT version::BIGINT AS version, change_type,
      |       count(*)::BIGINT AS n_rows, sum(elev)::BIGINT AS sum_elev,
      |       sum(gen)::BIGINT AS n_gen1, min(tile_id)::BIGINT AS min_tile,
      |       max(tile_id)::BIGINT AS max_tile
      |FROM ch GROUP BY 1, 2 ORDER BY version, change_type""".stripMargin,
    "g39_snapshot_merge" -> raw"""
      |WITH $GridCte,
      |v0 AS (SELECT tile_id, elevation::BIGINT AS elev, 0 AS gen
      |       FROM grid WHERE tile_id < 400),
      |v1 AS (SELECT tile_id,
      |         (elevation + CASE WHEN tile_id >= 100 AND tile_id < 150
      |                           THEN 1000 ELSE 0 END)::BIGINT AS elev,
      |         CASE WHEN tile_id >= 100 AND tile_id < 150 THEN 1 ELSE 0 END AS gen
      |       FROM grid WHERE tile_id < 400
      |       UNION ALL
      |       SELECT tile_id, elevation::BIGINT, 1 FROM grid
      |       WHERE tile_id >= 400 AND tile_id < 450)
      |SELECT 0::BIGINT AS version, count(*) AS n_rows, sum(elev)::BIGINT AS sum_elev,
      |       sum(gen)::BIGINT AS n_gen1, max(tile_id)::BIGINT AS max_tile FROM v0
      |UNION ALL
      |SELECT 1::BIGINT, count(*), sum(elev)::BIGINT, sum(gen)::BIGINT,
      |       max(tile_id)::BIGINT FROM v1
      |ORDER BY version""".stripMargin,
    // g38: inverse-map each 5×5 target center to its source pixel;
    // // ≡ Spark div on the non-negative operands; georeferencing
    // and elevation re-derived from the generating formulas
    // g46: the clamped inverse map re-derived in SQL — P = 16t−5 in
    // 1/26ths, clamped into [0, 26·7], corners clamped into the grid,
    // integer four-corner fold with mass 676; georeferencing is the
    // exact 1/26°-unit numerator, so nothing rounds
    "g46_warp_upsample" -> raw"""
      |WITH $TilesCte,
      |t AS (SELECT tile_id, tile_key, lat0, lon0, tys.ty, txs.tx,
      |        least(greatest(16*txs.tx - 5, 0), 182) AS px,
      |        least(greatest(16*tys.ty - 5, 0), 182) AS py
      |      FROM keyed, generate_series(0,12) tys(ty), generate_series(0,12) txs(tx)
      |      WHERE tile_id < 50),
      |m AS (SELECT *, px // 26 AS x0, least(px // 26 + 1, 7) AS x1, px % 26 AS fx,
      |        py // 26 AS y0, least(py // 26 + 1, 7) AS y1, py % 26 AS fy
      |      FROM t)
      |SELECT tile_id, tile_key, ty::BIGINT AS ty, tx::BIGINT AS tx,
      |       (lon0*26 + 2*tx + 1)::BIGINT AS lon_num26,
      |       (lat0*26 - 2*ty - 1)::BIGINT AS lat_num26,
      |       ((26-fy) * ((26-fx) * ((tile_id*131 + x0*17 + y0*29) % 8848)
      |                   + fx    * ((tile_id*131 + x1*17 + y0*29) % 8848))
      |        + fy   * ((26-fx) * ((tile_id*131 + x0*17 + y1*29) % 8848)
      |                   + fx    * ((tile_id*131 + x1*17 + y1*29) % 8848)))::BIGINT AS bsum,
      |       floor(((26-fy) * ((26-fx) * ((tile_id*131 + x0*17 + y0*29) % 8848)
      |                   + fx    * ((tile_id*131 + x1*17 + y0*29) % 8848))
      |        + fy   * ((26-fx) * ((tile_id*131 + x0*17 + y1*29) % 8848)
      |                   + fx    * ((tile_id*131 + x1*17 + y1*29) % 8848)))
      |             / 676.0 * 1e6 + 0.5)::BIGINT AS interp_e6
      |FROM m ORDER BY tile_id, ty, tx""".stripMargin,
    // g45: the fixed-point Mercator spec replayed move-for-move —
    // recursive CTEs carry the sin/atanh fold states; every DIV sees
    // non-negative operands, so DuckDB's floor `//` equals Spark's
    // truncating DIV and the boundary comparisons match bit-for-bit
    "g45_warp_mercator" -> raw"""
      |WITH RECURSIVE $TilesCte,
      |bnd AS (
      |  SELECT tile_id, tile_key, lat0, lon0, bs.b,
      |         lat0*1000000 - bs.b*125000 AS l,
      |         (abs(lat0*1000000 - bs.b*125000) * 1745329252) // 100000000 AS phi
      |  FROM keyed, generate_series(0,8) bs(b)
      |  WHERE tile_id < 50 AND lat0 BETWEEN -59 AND 60),
      |sinr AS (
      |  SELECT tile_id, b, (phi*phi) // 1000000000 AS p2, 0 AS k, phi AS u, phi AS acc
      |  FROM bnd
      |  UNION ALL
      |  SELECT tile_id, b, p2, k+1,
      |         (u*p2) // ((2*(k+1)) * (2*(k+1)+1) * 1000000000::BIGINT),
      |         acc + (CASE WHEN (k+1) % 2 = 1 THEN -1 ELSE 1 END) *
      |               ((u*p2) // ((2*(k+1)) * (2*(k+1)+1) * 1000000000::BIGINT))
      |  FROM sinr WHERE k < 7),
      |sins AS (SELECT tile_id, b, acc AS s FROM sinr WHERE k = 7),
      |atr AS (
      |  SELECT tile_id, b, (s*s) // 1000000000 AS q2, 0 AS k, s AS v, s AS acc
      |  FROM sins
      |  UNION ALL
      |  SELECT tile_id, b, q2, k+1, (v*q2) // 1000000000,
      |         acc + ((v*q2) // 1000000000) // (2*(k+1)+1)
      |  FROM atr WHERE k < 75),
      |yb AS (SELECT a.tile_id, a.b,
      |              CASE WHEN bnd.l < 0 THEN -a.acc ELSE a.acc END AS y
      |       FROM atr a JOIN bnd ON bnd.tile_id = a.tile_id AND bnd.b = a.b
      |       WHERE a.k = 75),
      |ym AS (
      |  SELECT k.tile_id, k.tile_key, k.lat0, k.lon0, tys.ty,
      |         y0.y - (2*tys.ty + 1) * (y0.y - y8.y) // 512 AS y_merc
      |  FROM keyed k
      |  JOIN yb y0 ON y0.tile_id = k.tile_id AND y0.b = 0
      |  JOIN yb y8 ON y8.tile_id = k.tile_id AND y8.b = 8
      |  CROSS JOIN generate_series(0,255) tys(ty)
      |  WHERE k.tile_id < 50 AND k.lat0 BETWEEN -59 AND 60),
      |rws AS (
      |  SELECT ym.*, (SELECT count(*) FROM yb
      |                WHERE yb.tile_id = ym.tile_id AND yb.b BETWEEN 1 AND 8
      |                  AND ym.y_merc <= yb.y) AS sy
      |  FROM ym)
      |SELECT tile_id, tile_key, ty::BIGINT AS ty, txs.tx::BIGINT AS tx,
      |       (lon0*1000000 + (2*txs.tx + 1)*62500)::BIGINT AS lon_e6,
      |       y_merc::BIGINT AS y_merc_nano,
      |       sy::BIGINT AS src_row,
      |       ((tile_id*131 + txs.tx*17 + sy*29) % 8848)::BIGINT AS elevation
      |FROM rws, generate_series(0,7) txs(tx)
      |ORDER BY tile_id, ty, tx""".stripMargin,
    "g38_warp_resample" -> raw"""
      |WITH $TilesCte,
      |t AS (SELECT tile_id, tile_key, lat0, lon0, tys.ty, txs.tx,
      |        ((2*txs.tx + 1) * 8) // 10 AS src_x,
      |        ((2*tys.ty + 1) * 8) // 10 AS src_y
      |      FROM keyed, generate_series(0,4) tys(ty), generate_series(0,4) txs(tx)
      |      WHERE tile_id < 50)
      |SELECT tile_id, tile_key, ty::BIGINT AS ty, tx::BIGINT AS tx,
      |       src_x::BIGINT AS src_x, src_y::BIGINT AS src_y,
      |       (lon0*1000000 + (2*tx + 1)*100000)::BIGINT AS lon_e6,
      |       (lat0*1000000 - (2*ty + 1)*100000)::BIGINT AS lat_e6,
      |       ((tile_id*131 + src_x*17 + src_y*29) % 8848)::BIGINT AS elevation
      |FROM t ORDER BY tile_id, ty, tx""".stripMargin,
    "g37_raster_tiff_jpeg" -> raw"""
      |WITH $TilesCte,
      |grid2 AS (
      |  SELECT tile_id, tile_key, lat0, lon0,
      |         ((tile_id*131 + (xs.x // 8)*17 + (ys.y // 8)*29) % 251)::INT AS elevation
      |  FROM keyed, generate_series(0,23) ys(y), generate_series(0,23) xs(x))
      |SELECT tile_id, tile_key, lat0, lon0, TRUE AS dims_ok,
      |       count(*) AS n_pixels, min(elevation) AS min_elev, max(elevation) AS max_elev,
      |       floor(avg(elevation) * 1e6 + 0.5)::BIGINT AS avg_elev_e6, sum(elevation)::BIGINT AS sum_elev
      |FROM grid2 WHERE tile_id < 50
      |GROUP BY 1, 2, 3, 4 ORDER BY tile_id""".stripMargin,
    // g36: each version's census recomputed from the generating
    // formulas — v0 append (<200), v1 append (<400), v2 replace (even)
    "g36_snapshot_commit" -> raw"""
      |WITH $GridCte,
      |v AS (SELECT 0::BIGINT AS version, tile_id, elevation FROM grid WHERE tile_id < 200
      |      UNION ALL
      |      SELECT 1::BIGINT, tile_id, elevation FROM grid WHERE tile_id < 400
      |      UNION ALL
      |      SELECT 2::BIGINT, tile_id, elevation FROM grid
      |      WHERE tile_id < 400 AND tile_id % 2 = 0)
      |SELECT version, count(*)::BIGINT AS n_rows, sum(elevation)::BIGINT AS sum_elev,
      |  min(tile_id) AS min_tile, max(tile_id) AS max_tile
      |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    // g35: same formula recomputation as g10 — the five ZSTD/BigTIFF
    // layouts must decode to the identical pixel census
    "g35_raster_tiff_zstdbig" -> raw"""
      |WITH $TilesCte,
      |grid2 AS (
      |  SELECT tile_id, tile_key, lat0, lon0,
      |         ((tile_id*131 + xs.x*17 + ys.y*29)%8848)::INT AS elevation
      |  FROM keyed, generate_series(0,23) ys(y), generate_series(0,23) xs(x))
      |SELECT tile_id, tile_key, lat0, lon0, TRUE AS dims_ok,
      |       count(*) AS n_pixels, min(elevation) AS min_elev, max(elevation) AS max_elev,
      |       floor(avg(elevation) * 1e6 + 0.5)::BIGINT AS avg_elev_e6, sum(elevation)::BIGINT AS sum_elev
      |FROM grid2 WHERE tile_id < 50
      |GROUP BY 1, 2, 3, 4 ORDER BY tile_id""".stripMargin,
    "g10_raster_tiff_deflate" -> raw"""
      |WITH $TilesCte,
      |grid2 AS (
      |  SELECT tile_id, tile_key, lat0, lon0,
      |         ((tile_id*131 + xs.x*17 + ys.y*29)%8848)::INT AS elevation
      |  FROM keyed, generate_series(0,23) ys(y), generate_series(0,23) xs(x))
      |SELECT tile_id, tile_key, lat0, lon0, TRUE AS dims_ok,
      |       count(*) AS n_pixels, min(elevation) AS min_elev, max(elevation) AS max_elev,
      |       floor(avg(elevation) * 1e6 + 0.5)::BIGINT AS avg_elev_e6, sum(elevation)::BIGINT AS sum_elev
      |FROM grid2 WHERE tile_id < 50
      |GROUP BY 1, 2, 3, 4 ORDER BY tile_id""".stripMargin,
    // g14: neighbors re-derived from the congruential pixel formula
    // (all operands non-negative, so % agrees across engines);
    // dzdx/dzdy/tan2 are INTEGER Horn numerators — no float trig in
    // the hash (libm atan is not bit-identical across engines)
    // g25: the identical 6-term integer crossing-number expression,
    // generated from the same polygon constant (no division, no
    // floats — inequality direction folded into each edge's winding)
    // g28: crossings re-derived by neighbor self-joins over the
    // formula grid; every comparison integer
    // g30: g29's CTE chain + one-division slopes; each slope is a
    // single IEEE divide of exact ints — bit-identical in any engine
    "g30_line_of_sight" -> raw"""
      |WITH $TilesCte,
      |uni AS (SELECT lat0, lon0, min(tile_id) AS tile_id
      |        FROM keyed GROUP BY 1, 2),
      |ep AS (SELECT
      |    min(CASE WHEN tile_id = 1 THEN (lon0+180)*8 END)::BIGINT AS ax,
      |    min(CASE WHEN tile_id = 1 THEN (90-lat0)*8 END)::BIGINT AS ay,
      |    min(CASE WHEN tile_id = 2 THEN (lon0+180)*8 END)::BIGINT AS bx,
      |    min(CASE WHEN tile_id = 2 THEN (90-lat0)*8 END)::BIGINT AS by
      |  FROM keyed WHERE tile_id IN (1, 2)),
      |p0 AS (SELECT ax, ay, bx-ax AS dx, by-ay AS dy,
      |         greatest(abs(bx-ax), abs(by-ay), 1) AS n FROM ep),
      |st AS (SELECT ax, ay, dx, dy, n,
      |         unnest(generate_series(0, n)) AS step FROM p0),
      |path AS (SELECT step,
      |    ax + (CASE WHEN dx < 0 THEN -1 ELSE 1 END)*((step*abs(dx))//n) AS gx,
      |    ay + (CASE WHEN dy < 0 THEN -1 ELSE 1 END)*((step*abs(dy))//n) AS gy
      |  FROM st),
      |cells AS (SELECT step, gx, gy, gx//8 - 180 AS lon0,
      |    90 - gy//8 AS lat0, gx%8 AS x, gy%8 AS y FROM path),
      |sel AS (SELECT c.step, c.gx, c.gy,
      |    CASE WHEN u.tile_id IS NULL THEN NULL
      |         ELSE ((u.tile_id*131 + c.x*17 + c.y*29)%8848) END::INT AS elevation
      |  FROM cells c LEFT JOIN uni u ON c.lat0 = u.lat0 AND c.lon0 = u.lon0),
      |s0 AS (SELECT *, first_value(elevation) OVER (ORDER BY step) AS e0 FROM sel),
      |sl AS (SELECT *, CASE WHEN step > 0 AND elevation IS NOT NULL
      |         THEN (elevation - e0)::DOUBLE / step END AS slope FROM s0),
      |pm AS (SELECT *, max(slope) OVER (ORDER BY step
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      |       FROM sl)
      |SELECT step, gx, gy, elevation,
      |  floor(slope*1e6 + 0.5)::BIGINT AS slope_e6,
      |  (CASE WHEN step = 0 THEN elevation IS NOT NULL
      |        ELSE elevation IS NOT NULL
      |         AND (prev_max IS NULL OR slope > prev_max) END) AS visible
      |FROM pm ORDER BY step""".stripMargin,
    // g29: same integer DDA; non-negative operands make // ≡ div
    "g29_path_profile" -> raw"""
      |WITH $TilesCte,
      |uni AS (SELECT lat0, lon0, min(tile_id) AS tile_id
      |        FROM keyed GROUP BY 1, 2),
      |ep AS (SELECT
      |    min(CASE WHEN tile_id = 1 THEN (lon0+180)*8 END)::BIGINT AS ax,
      |    min(CASE WHEN tile_id = 1 THEN (90-lat0)*8 END)::BIGINT AS ay,
      |    min(CASE WHEN tile_id = 2 THEN (lon0+180)*8 END)::BIGINT AS bx,
      |    min(CASE WHEN tile_id = 2 THEN (90-lat0)*8 END)::BIGINT AS by
      |  FROM keyed WHERE tile_id IN (1, 2)),
      |p0 AS (SELECT ax, ay, bx-ax AS dx, by-ay AS dy,
      |         greatest(abs(bx-ax), abs(by-ay), 1) AS n FROM ep),
      |st AS (SELECT ax, ay, dx, dy, n,
      |         unnest(generate_series(0, n)) AS step FROM p0),
      |path AS (SELECT step,
      |    ax + (CASE WHEN dx < 0 THEN -1 ELSE 1 END)*((step*abs(dx))//n) AS gx,
      |    ay + (CASE WHEN dy < 0 THEN -1 ELSE 1 END)*((step*abs(dy))//n) AS gy
      |  FROM st),
      |cells AS (SELECT step, gx, gy, gx//8 - 180 AS lon0,
      |    90 - gy//8 AS lat0, gx%8 AS x, gy%8 AS y FROM path)
      |SELECT c.step, c.gx, c.gy, k.tile_key,
      |  CASE WHEN u.tile_id IS NULL THEN NULL
      |       ELSE ((u.tile_id*131 + c.x*17 + c.y*29)%8848) END::INT AS elevation
      |FROM cells c
      |LEFT JOIN uni u ON c.lat0 = u.lat0 AND c.lon0 = u.lon0
      |LEFT JOIN keyed k ON u.tile_id = k.tile_id
      |ORDER BY c.step""".stripMargin,
    "g28_contours" -> raw"""
      |WITH $TilesCte,
      |g AS (SELECT tile_id, tile_key, xs.x AS x, ys.y AS y,
      |        ((tile_id*131 + xs.x*17 + ys.y*29)%8848)::BIGINT AS e
      |      FROM keyed, generate_series(0,7) ys(y), generate_series(0,7) xs(x)
      |      WHERE tile_id < 50),
      |lv AS (SELECT unnest([1000,2000,3000,4000,5000,6000,7000,8000])::BIGINT AS level),
      |h AS (SELECT a.tile_id, l.level, count(*)::BIGINT AS ch
      |      FROM g a JOIN g b ON a.tile_id = b.tile_id AND b.x = a.x + 1 AND b.y = a.y, lv l
      |      WHERE (a.e < l.level) <> (b.e < l.level) GROUP BY 1, 2),
      |v AS (SELECT a.tile_id, l.level, count(*)::BIGINT AS cv
      |      FROM g a JOIN g b ON a.tile_id = b.tile_id AND b.x = a.x AND b.y = a.y + 1, lv l
      |      WHERE (a.e < l.level) <> (b.e < l.level) GROUP BY 1, 2),
      |bl AS (SELECT tile_id, level, count(*)::BIGINT AS nb
      |       FROM g, lv WHERE e < level GROUP BY 1, 2),
      |base AS (SELECT DISTINCT tile_id, tile_key FROM g),
      |x AS (SELECT base.tile_id, base.tile_key, lv.level FROM base, lv)
      |SELECT x.tile_id, x.tile_key, x.level,
      |  (coalesce(h.ch, 0) + coalesce(v.cv, 0))::BIGINT AS n_cross,
      |  coalesce(bl.nb, 0)::BIGINT AS n_below
      |FROM x LEFT JOIN h USING (tile_id, level) LEFT JOIN v USING (tile_id, level)
      |       LEFT JOIN bl USING (tile_id, level)
      |ORDER BY x.tile_id, x.level""".stripMargin,
    // g27: identical grid CTE to g10 — the PackBits/Float32 layouts
    // carry the same integer pixel formula (float bands hold
    // integer-valued floats, exact in IEEE)
    "g27_raster_packbits" -> raw"""
      |WITH $TilesCte,
      |grid2 AS (
      |  SELECT tile_id, tile_key, lat0, lon0,
      |         ((tile_id*131 + xs.x*17 + ys.y*29)%8848)::INT AS elevation
      |  FROM keyed, generate_series(0,23) ys(y), generate_series(0,23) xs(x))
      |SELECT tile_id, tile_key, lat0, lon0, TRUE AS dims_ok,
      |       count(*) AS n_pixels, min(elevation) AS min_elev, max(elevation) AS max_elev,
      |       floor(avg(elevation) * 1e6 + 0.5)::BIGINT AS avg_elev_e6, sum(elevation)::BIGINT AS sum_elev
      |FROM grid2 WHERE tile_id < 50
      |GROUP BY 1, 2, 3, 4 ORDER BY tile_id""".stripMargin,
    // g26: fixture geotags re-derived from the tile_id population
    // rules (mismatch %7==3 wins over absent %11==5); transform
    // coefficients by the identical IEEE floor(x*1e6+0.5) tree over
    // exactly-representable doubles
    "g26_geotags" -> raw"""
      |WITH $TilesCte
      |SELECT tile_id, tile_key,
      |  (tile_id % 7 = 3 OR tile_id % 11 <> 5) AS has_geotags,
      |  CASE WHEN tile_id % 7 = 3 THEN FALSE
      |       WHEN tile_id % 11 = 5 THEN NULL
      |       ELSE TRUE END AS tag_matches_key,
      |  CASE WHEN tile_id % 7 = 3
      |         THEN floor((lon0 + 0.25) * 1e6 + 0.5)::BIGINT
      |       WHEN tile_id % 11 = 5 THEN NULL
      |       ELSE floor(lon0 * 1e6 + 0.5)::BIGINT END AS gt0_e6,
      |  CASE WHEN tile_id % 7 <> 3 AND tile_id % 11 = 5 THEN NULL
      |       ELSE 125000::BIGINT END AS gt1_e6,
      |  CASE WHEN tile_id % 7 <> 3 AND tile_id % 11 = 5 THEN NULL
      |       ELSE floor(lat0 * 1e6 + 0.5)::BIGINT END AS gt3_e6,
      |  CASE WHEN tile_id % 7 <> 3 AND tile_id % 11 = 5 THEN NULL
      |       ELSE (-125000)::BIGINT END AS gt5_e6
      |FROM keyed WHERE tile_id < 50 ORDER BY tile_id""".stripMargin,
    "g25_polygon_filter" -> (raw"""
      |WITH $TilesCte,
      |f AS (SELECT ((""" + {
      val pts = GeoQueries.FrancePoly
      pts.indices.map { i =>
        val (y1, x1) = pts(i); val (y2, x2) = pts((i + 1) % pts.size)
        val cross = s"(${x2 - x1}) * (lat0 - ($y1)) - (lon0 - ($x1)) * (${y2 - y1})"
        val hit = if (y2 > y1) s"$cross > 0" else s"$cross < 0"
        s"(CASE WHEN (($y1 > lat0) != ($y2 > lat0)) AND ($hit) THEN 1 ELSE 0 END)"
      }.mkString(" + ")
    } + raw""") % 2 = 1) AS in_poly,
      |        (lat0 BETWEEN 42 AND 51 AND lon0 BETWEEN -5 AND 8) AS in_bbox
      |      FROM keyed)
      |SELECT sum(CASE WHEN in_poly THEN 1 ELSE 0 END)::BIGINT AS n_polygon,
      |  sum(CASE WHEN in_bbox THEN 1 ELSE 0 END)::BIGINT AS n_bbox,
      |  sum(CASE WHEN in_bbox AND NOT in_poly THEN 1 ELSE 0 END)::BIGINT AS n_bbox_only,
      |  count(*) AS n_tiles FROM f""").stripMargin,
    // g24: TRI — 8 squared neighbor differences per interior pixel,
    // re-derived from the raster fixture formula; all integer, sums
    // cast ::BIGINT (DuckDB sum is HUGEINT)
    "g24_ruggedness" -> (raw"""
      |WITH $TilesCte,
      |px AS (
      |  SELECT tile_id, tile_key, xs.x::INT AS x, ys.y::INT AS y
      |  FROM keyed, generate_series(1,6) ys(y), generate_series(1,6) xs(x)
      |  WHERE tile_id < 50),
      |zz AS (
      |  SELECT tile_id, tile_key,
      |    (tile_id*131 + x*17 + y*29) % 8848 AS zc,
      |    (tile_id*131 + (x+1)*17 + (y-1)*29) % 8848 AS ze_n,
      |    (tile_id*131 + (x+1)*17 + (y  )*29) % 8848 AS ze,
      |    (tile_id*131 + (x+1)*17 + (y+1)*29) % 8848 AS ze_s,
      |    (tile_id*131 + (x-1)*17 + (y-1)*29) % 8848 AS zw_n,
      |    (tile_id*131 + (x-1)*17 + (y  )*29) % 8848 AS zw,
      |    (tile_id*131 + (x-1)*17 + (y+1)*29) % 8848 AS zw_s,
      |    (tile_id*131 + (x  )*17 + (y-1)*29) % 8848 AS zn,
      |    (tile_id*131 + (x  )*17 + (y+1)*29) % 8848 AS zs
      |  FROM px),
      |t AS (
      |  SELECT tile_id, tile_key,
      |    (ze_n-zc)*(ze_n-zc) + (ze-zc)*(ze-zc) + (ze_s-zc)*(ze_s-zc) +
      |    (zw_n-zc)*(zw_n-zc) + (zw-zc)*(zw-zc) + (zw_s-zc)*(zw_s-zc) +
      |    (zn-zc)*(zn-zc) + (zs-zc)*(zs-zc) AS tri2
      |  FROM zz)
      |SELECT tile_id, tile_key, count(*) AS n_px,
      |       sum(tri2)::BIGINT AS tri2_sum,
      |       max(tri2)::BIGINT AS tri2_max,
      |       sum(CASE WHEN tri2 > 100000000 THEN 1 ELSE 0 END)::BIGINT AS rugged_px
      |FROM t GROUP BY 1, 2 ORDER BY tile_id""").stripMargin,
    // g32: same fixture-formula pixel frame as g24 with the STATED
    // planted ±500 micro-relief stripes; threshold cross-multiplied
    // (|num| vs 8·125) so the /8 never happens
    "g32_tpi" -> (raw"""
      |WITH $TilesCte,
      |px AS (
      |  SELECT tile_id, tile_key, xs.x::INT AS x, ys.y::INT AS y
      |  FROM keyed, generate_series(1,6) ys(y), generate_series(1,6) xs(x)
      |  WHERE tile_id < 50),
      |nb AS (
      |  SELECT tile_id, tile_key, x, y, dxs.dx::INT AS dx, dys.dy::INT AS dy
      |  FROM px, generate_series(-1,1) dxs(dx), generate_series(-1,1) dys(dy)),
      |zz AS (
      |  SELECT tile_id, tile_key, x, y, dx, dy,
      |    (tile_id*131 + (x+dx)*17 + (y+dy)*29) % 8848
      |    + CASE ((x+dx) + 3*(y+dy) + tile_id) % 5
      |        WHEN 0 THEN 500 WHEN 2 THEN -500 ELSE 0 END AS z
      |  FROM nb),
      |t AS (
      |  SELECT tile_id, tile_key, x, y,
      |    sum(CASE WHEN dx = 0 AND dy = 0 THEN 8*z ELSE -z END)::BIGINT AS num
      |  FROM zz GROUP BY 1, 2, 3, 4)
      |SELECT tile_id, tile_key, count(*) AS n_px,
      |       sum(num)::BIGINT AS tpi_sum,
      |       max(num)::BIGINT AS tpi_max,
      |       min(num)::BIGINT AS tpi_min,
      |       sum(CASE WHEN num >  1000 THEN 1 ELSE 0 END)::BIGINT AS n_ridge,
      |       sum(CASE WHEN num < -1000 THEN 1 ELSE 0 END)::BIGINT AS n_valley,
      |       sum(CASE WHEN num BETWEEN -1000 AND 1000 THEN 1 ELSE 0 END)::BIGINT AS n_flat
      |FROM t GROUP BY 1, 2 ORDER BY tile_id""").stripMargin,
    "g14_slope_aspect" -> (raw"""
      |WITH $TilesCte,
      |px AS (
      |  SELECT tile_id, tile_key, xs.x::INT AS x, ys.y::INT AS y
      |  FROM keyed, generate_series(1,6) ys(y), generate_series(1,6) xs(x)
      |  WHERE tile_id < 50),
      |zz AS (
      |  SELECT *,
      |    (tile_id*131 + (x+1)*17 + (y-1)*29) % 8848 AS ze_n,
      |    (tile_id*131 + (x+1)*17 + (y  )*29) % 8848 AS ze,
      |    (tile_id*131 + (x+1)*17 + (y+1)*29) % 8848 AS ze_s,
      |    (tile_id*131 + (x-1)*17 + (y-1)*29) % 8848 AS zw_n,
      |    (tile_id*131 + (x-1)*17 + (y  )*29) % 8848 AS zw,
      |    (tile_id*131 + (x-1)*17 + (y+1)*29) % 8848 AS zw_s,
      |    (tile_id*131 + (x  )*17 + (y-1)*29) % 8848 AS zn,
      |    (tile_id*131 + (x  )*17 + (y+1)*29) % 8848 AS zs
      |  FROM px),
      |h AS (
      |  SELECT tile_id, tile_key, x, y,
      |    (ze_n + 2*ze + ze_s - zw_n - 2*zw - zw_s)::BIGINT AS dzdx_num,
      |    (zw_s + 2*zs + ze_s - zw_n - 2*zn - ze_n)::BIGINT AS dzdy_num
      |  FROM zz)
      |SELECT tile_id, tile_key, x, y, dzdx_num, dzdy_num,
      |  (dzdx_num*dzdx_num + dzdy_num*dzdy_num)::BIGINT AS tan2_num,
      |  CASE WHEN dzdx_num = 0 AND dzdy_num = 0 THEN 'flat'
      |       WHEN abs(dzdx_num) > abs(dzdy_num) THEN
      |         CASE WHEN dzdx_num > 0 THEN 'E' ELSE 'W' END
      |       WHEN abs(dzdy_num) > abs(dzdx_num) THEN
      |         CASE WHEN dzdy_num > 0 THEN 'S' ELSE 'N' END
      |       ELSE CASE WHEN dzdx_num > 0 AND dzdy_num > 0 THEN 'SE'
      |                 WHEN dzdx_num > 0 THEN 'NE'
      |                 WHEN dzdy_num > 0 THEN 'SW'
      |                 ELSE 'NW' END
      |  END AS grad_octant
      |FROM h ORDER BY tile_id, y, x""").stripMargin,
    // g18: the same integer Horn numerators as g14, then the IDENTICAL
    // IEEE expression tree (cast, ·, /, sqrt are all correctly rounded
    // → bit-identical doubles across engines); shade rounds via
    // floor(x + 0.5), never round-half-even
    "g18_hillshade" -> (raw"""
      |WITH $TilesCte,
      |px AS (
      |  SELECT tile_id, tile_key, xs.x::INT AS x, ys.y::INT AS y
      |  FROM keyed, generate_series(1,6) ys(y), generate_series(1,6) xs(x)
      |  WHERE tile_id < 50),
      |zz AS (
      |  SELECT *,
      |    (tile_id*131 + (x+1)*17 + (y-1)*29) % 8848 AS ze_n,
      |    (tile_id*131 + (x+1)*17 + (y  )*29) % 8848 AS ze,
      |    (tile_id*131 + (x+1)*17 + (y+1)*29) % 8848 AS ze_s,
      |    (tile_id*131 + (x-1)*17 + (y-1)*29) % 8848 AS zw_n,
      |    (tile_id*131 + (x-1)*17 + (y  )*29) % 8848 AS zw,
      |    (tile_id*131 + (x-1)*17 + (y+1)*29) % 8848 AS zw_s,
      |    (tile_id*131 + (x  )*17 + (y-1)*29) % 8848 AS zn,
      |    (tile_id*131 + (x  )*17 + (y+1)*29) % 8848 AS zs
      |  FROM px),
      |h AS (
      |  SELECT tile_id, tile_key, x, y,
      |    (ze_n + 2*ze + ze_s - zw_n - 2*zw - zw_s)::BIGINT AS dzdx_num,
      |    (zw_s + 2*zs + ze_s - zw_n - 2*zn - ze_n)::BIGINT AS dzdy_num
      |  FROM zz),
      |f AS (
      |  SELECT *, dzdx_num / 240.0 AS p, dzdy_num / 240.0 AS sg FROM h),
      |c AS (
      |  SELECT *, (0.5 * p + 0.5 * sg + sqrt(0.5)) /
      |            sqrt(1.0 + p * p + sg * sg) AS cang FROM f)
      |SELECT tile_id, tile_key, x, y, dzdx_num, dzdy_num,
      |  floor(cang * 1e6 + 0.5)::BIGINT AS cang_e6,
      |  (CASE WHEN cang <= 0 THEN 1 ELSE floor(cang * 254 + 1.5) END)::BIGINT AS shade
      |FROM c ORDER BY tile_id, y, x""").stripMargin,
    // g19: succ = g15's argmax (row_number mirror), then a recursive
    // CTE walks every cell's flow path; acc(c) = COUNT of (source,
    // reached) pairs landing on c — each pair occurs at most once
    // because the path is deterministic and strictly descends
    "g19_flow_accum" -> (raw"""
      |WITH RECURSIVE $TilesCte,
      |px AS (
      |  SELECT tile_id, tile_key, xs.x::INT AS x, ys.y::INT AS y
      |  FROM keyed, generate_series(1,6) ys(y), generate_series(1,6) xs(x)
      |  WHERE tile_id < 50),
      |zz AS (
      |  SELECT *,
      |    (tile_id*131 + (x  )*17 + (y  )*29) % 8848 AS z0,
      |    (tile_id*131 + (x+1)*17 + (y-1)*29) % 8848 AS ze_n,
      |    (tile_id*131 + (x+1)*17 + (y  )*29) % 8848 AS ze,
      |    (tile_id*131 + (x+1)*17 + (y+1)*29) % 8848 AS ze_s,
      |    (tile_id*131 + (x-1)*17 + (y-1)*29) % 8848 AS zw_n,
      |    (tile_id*131 + (x-1)*17 + (y  )*29) % 8848 AS zw,
      |    (tile_id*131 + (x-1)*17 + (y+1)*29) % 8848 AS zw_s,
      |    (tile_id*131 + (x  )*17 + (y-1)*29) % 8848 AS zn,
      |    (tile_id*131 + (x  )*17 + (y+1)*29) % 8848 AS zs
      |  FROM px),
      |cand AS (
      |  SELECT tile_id, x, y, unnest([
      |    struct_pack(dx :=  1, dy :=  0, pr := 1, drop := z0 - ze,   diag := false),
      |    struct_pack(dx :=  1, dy :=  1, pr := 2, drop := z0 - ze_s, diag := true),
      |    struct_pack(dx :=  0, dy :=  1, pr := 3, drop := z0 - zs,   diag := false),
      |    struct_pack(dx := -1, dy :=  1, pr := 4, drop := z0 - zw_s, diag := true),
      |    struct_pack(dx := -1, dy :=  0, pr := 5, drop := z0 - zw,   diag := false),
      |    struct_pack(dx := -1, dy := -1, pr := 6, drop := z0 - zw_n, diag := true),
      |    struct_pack(dx :=  0, dy := -1, pr := 7, drop := z0 - zn,   diag := false),
      |    struct_pack(dx :=  1, dy := -1, pr := 8, drop := z0 - ze_n, diag := true)
      |  ]) AS f FROM zz),
      |ranked AS (
      |  SELECT tile_id, x, y, x + f.dx AS tx, y + f.dy AS ty,
      |         row_number() OVER (PARTITION BY tile_id, x, y
      |           ORDER BY f.drop*f.drop*(CASE WHEN f.diag THEN 1 ELSE 2 END) DESC,
      |                    f.pr ASC) AS rn
      |  FROM cand WHERE f.drop > 0),
      |succ AS (SELECT tile_id, x, y, tx, ty FROM ranked WHERE rn = 1),
      |reach AS (
      |  SELECT tile_id, x AS sx, y AS sy, tx AS cx, ty AS cy FROM succ
      |  UNION ALL
      |  SELECT r.tile_id, r.sx, r.sy, s.tx, s.ty
      |  FROM reach r JOIN succ s
      |    ON s.tile_id = r.tile_id AND s.x = r.cx AND s.y = r.cy),
      |allpx AS (
      |  SELECT tile_id, tile_key, xs.x::INT AS x, ys.y::INT AS y
      |  FROM keyed, generate_series(0,7) ys(y), generate_series(0,7) xs(x)
      |  WHERE tile_id < 50),
      |a AS (SELECT tile_id, cx AS x, cy AS y, count(*)::BIGINT AS acc
      |      FROM reach GROUP BY 1, 2, 3)
      |SELECT p.tile_id, p.tile_key, p.x, p.y, coalesce(a.acc, 0)::BIGINT AS acc
      |FROM allpx p LEFT JOIN a USING (tile_id, x, y)
      |ORDER BY p.tile_id, p.y, p.x""").stripMargin,
    // g20: the mosaic's ONE global pixel formula makes every window —
    // including boundary-straddling ones — directly evaluable; the
    // coverage condition (all 9 global pixels inside the mosaic) is
    // exactly the Spark side's null-strip filter on a solid rectangle
    // g23: g6's membership CTE bucketed to integer elevation deciles
    "g23_hypsometry" -> (raw"""
      |WITH $GridCte,
      |m AS (
      |  SELECT 'netherlands' AS set_name, elevation FROM grid
      |    WHERE lat0 BETWEEN 50 AND 53 AND lon0 BETWEEN 3 AND 7
      |  UNION ALL
      |  SELECT 'france', elevation FROM grid
      |    WHERE lat0 BETWEEN 42 AND 51 AND lon0 BETWEEN -6 AND 9
      |  UNION ALL
      |  SELECT 'europe', elevation FROM grid
      |    WHERE lat0 BETWEEN 23 AND 80 AND lon0 BETWEEN -25 AND 49
      |  UNION ALL
      |  SELECT 'world', elevation FROM grid)
      |SELECT set_name, (elevation * 10 // 8848)::INT AS decile,
      |       count(*) AS n_pixels, sum(elevation)::BIGINT AS elev_sum
      |FROM m GROUP BY 1, 2 ORDER BY 1, 2""").stripMargin,
    // g22: g19's succ CTE, then a recursive walk from every cell to
    // its terminal (no-successor) cell — the basin label
    // g31: g22's recursive walk with a hop counter; the terminal
    // row's depth IS the flow-path length
    "g31_flow_length" -> (raw"""
      |WITH RECURSIVE $TilesCte,
      |px AS (
      |  SELECT tile_id, tile_key, xs.x::INT AS x, ys.y::INT AS y
      |  FROM keyed, generate_series(1,6) ys(y), generate_series(1,6) xs(x)
      |  WHERE tile_id < 50),
      |zz AS (
      |  SELECT *,
      |    (tile_id*131 + (x  )*17 + (y  )*29) % 8848 AS z0,
      |    (tile_id*131 + (x+1)*17 + (y-1)*29) % 8848 AS ze_n,
      |    (tile_id*131 + (x+1)*17 + (y  )*29) % 8848 AS ze,
      |    (tile_id*131 + (x+1)*17 + (y+1)*29) % 8848 AS ze_s,
      |    (tile_id*131 + (x-1)*17 + (y-1)*29) % 8848 AS zw_n,
      |    (tile_id*131 + (x-1)*17 + (y  )*29) % 8848 AS zw,
      |    (tile_id*131 + (x-1)*17 + (y+1)*29) % 8848 AS zw_s,
      |    (tile_id*131 + (x  )*17 + (y-1)*29) % 8848 AS zn,
      |    (tile_id*131 + (x  )*17 + (y+1)*29) % 8848 AS zs
      |  FROM px),
      |cand AS (
      |  SELECT tile_id, x, y, unnest([
      |    struct_pack(dx :=  1, dy :=  0, pr := 1, drop := z0 - ze,   diag := false),
      |    struct_pack(dx :=  1, dy :=  1, pr := 2, drop := z0 - ze_s, diag := true),
      |    struct_pack(dx :=  0, dy :=  1, pr := 3, drop := z0 - zs,   diag := false),
      |    struct_pack(dx := -1, dy :=  1, pr := 4, drop := z0 - zw_s, diag := true),
      |    struct_pack(dx := -1, dy :=  0, pr := 5, drop := z0 - zw,   diag := false),
      |    struct_pack(dx := -1, dy := -1, pr := 6, drop := z0 - zw_n, diag := true),
      |    struct_pack(dx :=  0, dy := -1, pr := 7, drop := z0 - zn,   diag := false),
      |    struct_pack(dx :=  1, dy := -1, pr := 8, drop := z0 - ze_n, diag := true)
      |  ]) AS f FROM zz),
      |ranked AS (
      |  SELECT tile_id, x, y, x + f.dx AS tx, y + f.dy AS ty,
      |         row_number() OVER (PARTITION BY tile_id, x, y
      |           ORDER BY f.drop*f.drop*(CASE WHEN f.diag THEN 1 ELSE 2 END) DESC,
      |                    f.pr ASC) AS rn
      |  FROM cand WHERE f.drop > 0),
      |succ AS (SELECT tile_id, x, y, tx, ty FROM ranked WHERE rn = 1),
      |allpx AS (
      |  SELECT tile_id, tile_key, xs.x::INT AS x, ys.y::INT AS y
      |  FROM keyed, generate_series(0,7) ys(y), generate_series(0,7) xs(x)
      |  WHERE tile_id < 50),
      |w AS (
      |  SELECT tile_id, x AS sx, y AS sy, x AS cx, y AS cy, 0 AS d FROM allpx
      |  UNION ALL
      |  SELECT w.tile_id, w.sx, w.sy, s.tx, s.ty, w.d + 1
      |  FROM w JOIN succ s ON s.tile_id = w.tile_id AND s.x = w.cx AND s.y = w.cy),
      |term AS (
      |  SELECT * FROM w
      |  WHERE NOT EXISTS (SELECT 1 FROM succ s
      |                    WHERE s.tile_id = w.tile_id AND s.x = w.cx AND s.y = w.cy))
      |SELECT p.tile_id, p.tile_key, p.x, p.y, t.d::BIGINT AS flow_len
      |FROM allpx p JOIN term t
      |  ON t.tile_id = p.tile_id AND t.sx = p.x AND t.sy = p.y
      |ORDER BY p.tile_id, p.y, p.x""").stripMargin,
    // g33: g22's recursive walk verbatim, rolled up per basin with
    // elevations recomputed from the fixture formula; outlet_z is a
    // function of the (cx, cy) group keys
    "g33_basin_stats" -> (raw"""
      |WITH RECURSIVE $TilesCte,
      |px AS (
      |  SELECT tile_id, tile_key, xs.x::INT AS x, ys.y::INT AS y
      |  FROM keyed, generate_series(1,6) ys(y), generate_series(1,6) xs(x)
      |  WHERE tile_id < 50),
      |zz AS (
      |  SELECT *,
      |    (tile_id*131 + (x  )*17 + (y  )*29) % 8848 AS z0,
      |    (tile_id*131 + (x+1)*17 + (y-1)*29) % 8848 AS ze_n,
      |    (tile_id*131 + (x+1)*17 + (y  )*29) % 8848 AS ze,
      |    (tile_id*131 + (x+1)*17 + (y+1)*29) % 8848 AS ze_s,
      |    (tile_id*131 + (x-1)*17 + (y-1)*29) % 8848 AS zw_n,
      |    (tile_id*131 + (x-1)*17 + (y  )*29) % 8848 AS zw,
      |    (tile_id*131 + (x-1)*17 + (y+1)*29) % 8848 AS zw_s,
      |    (tile_id*131 + (x  )*17 + (y-1)*29) % 8848 AS zn,
      |    (tile_id*131 + (x  )*17 + (y+1)*29) % 8848 AS zs
      |  FROM px),
      |cand AS (
      |  SELECT tile_id, x, y, unnest([
      |    struct_pack(dx :=  1, dy :=  0, pr := 1, drop := z0 - ze,   diag := false),
      |    struct_pack(dx :=  1, dy :=  1, pr := 2, drop := z0 - ze_s, diag := true),
      |    struct_pack(dx :=  0, dy :=  1, pr := 3, drop := z0 - zs,   diag := false),
      |    struct_pack(dx := -1, dy :=  1, pr := 4, drop := z0 - zw_s, diag := true),
      |    struct_pack(dx := -1, dy :=  0, pr := 5, drop := z0 - zw,   diag := false),
      |    struct_pack(dx := -1, dy := -1, pr := 6, drop := z0 - zw_n, diag := true),
      |    struct_pack(dx :=  0, dy := -1, pr := 7, drop := z0 - zn,   diag := false),
      |    struct_pack(dx :=  1, dy := -1, pr := 8, drop := z0 - ze_n, diag := true)
      |  ]) AS f FROM zz),
      |ranked AS (
      |  SELECT tile_id, x, y, x + f.dx AS tx, y + f.dy AS ty,
      |         row_number() OVER (PARTITION BY tile_id, x, y
      |           ORDER BY f.drop*f.drop*(CASE WHEN f.diag THEN 1 ELSE 2 END) DESC,
      |                    f.pr ASC) AS rn
      |  FROM cand WHERE f.drop > 0),
      |succ AS (SELECT tile_id, x, y, tx, ty FROM ranked WHERE rn = 1),
      |allpx AS (
      |  SELECT tile_id, tile_key, xs.x::INT AS x, ys.y::INT AS y
      |  FROM keyed, generate_series(0,7) ys(y), generate_series(0,7) xs(x)
      |  WHERE tile_id < 50),
      |w AS (
      |  SELECT tile_id, x AS sx, y AS sy, x AS cx, y AS cy FROM allpx
      |  UNION ALL
      |  SELECT w.tile_id, w.sx, w.sy, s.tx, s.ty
      |  FROM w JOIN succ s ON s.tile_id = w.tile_id AND s.x = w.cx AND s.y = w.cy),
      |term AS (
      |  SELECT * FROM w
      |  WHERE NOT EXISTS (SELECT 1 FROM succ s
      |                    WHERE s.tile_id = w.tile_id AND s.x = w.cx AND s.y = w.cy))
      |SELECT p.tile_id, p.tile_key, (t.cy * 8 + t.cx)::BIGINT AS basin_pos,
      |       count(*)::BIGINT AS n_px,
      |       sum((p.tile_id*131 + p.x*17 + p.y*29) % 8848)::BIGINT AS z_sum,
      |       min((p.tile_id*131 + p.x*17 + p.y*29) % 8848)::BIGINT AS z_min,
      |       max((p.tile_id*131 + p.x*17 + p.y*29) % 8848)::BIGINT AS z_max,
      |       ((p.tile_id*131 + t.cx*17 + t.cy*29) % 8848)::BIGINT AS outlet_z
      |FROM allpx p JOIN term t
      |  ON t.tile_id = p.tile_id AND t.sx = p.x AND t.sy = p.y
      |GROUP BY p.tile_id, p.tile_key, t.cx, t.cy
      |ORDER BY p.tile_id, basin_pos""").stripMargin,
    "g22_watersheds" -> (raw"""
      |WITH RECURSIVE $TilesCte,
      |px AS (
      |  SELECT tile_id, tile_key, xs.x::INT AS x, ys.y::INT AS y
      |  FROM keyed, generate_series(1,6) ys(y), generate_series(1,6) xs(x)
      |  WHERE tile_id < 50),
      |zz AS (
      |  SELECT *,
      |    (tile_id*131 + (x  )*17 + (y  )*29) % 8848 AS z0,
      |    (tile_id*131 + (x+1)*17 + (y-1)*29) % 8848 AS ze_n,
      |    (tile_id*131 + (x+1)*17 + (y  )*29) % 8848 AS ze,
      |    (tile_id*131 + (x+1)*17 + (y+1)*29) % 8848 AS ze_s,
      |    (tile_id*131 + (x-1)*17 + (y-1)*29) % 8848 AS zw_n,
      |    (tile_id*131 + (x-1)*17 + (y  )*29) % 8848 AS zw,
      |    (tile_id*131 + (x-1)*17 + (y+1)*29) % 8848 AS zw_s,
      |    (tile_id*131 + (x  )*17 + (y-1)*29) % 8848 AS zn,
      |    (tile_id*131 + (x  )*17 + (y+1)*29) % 8848 AS zs
      |  FROM px),
      |cand AS (
      |  SELECT tile_id, x, y, unnest([
      |    struct_pack(dx :=  1, dy :=  0, pr := 1, drop := z0 - ze,   diag := false),
      |    struct_pack(dx :=  1, dy :=  1, pr := 2, drop := z0 - ze_s, diag := true),
      |    struct_pack(dx :=  0, dy :=  1, pr := 3, drop := z0 - zs,   diag := false),
      |    struct_pack(dx := -1, dy :=  1, pr := 4, drop := z0 - zw_s, diag := true),
      |    struct_pack(dx := -1, dy :=  0, pr := 5, drop := z0 - zw,   diag := false),
      |    struct_pack(dx := -1, dy := -1, pr := 6, drop := z0 - zw_n, diag := true),
      |    struct_pack(dx :=  0, dy := -1, pr := 7, drop := z0 - zn,   diag := false),
      |    struct_pack(dx :=  1, dy := -1, pr := 8, drop := z0 - ze_n, diag := true)
      |  ]) AS f FROM zz),
      |ranked AS (
      |  SELECT tile_id, x, y, x + f.dx AS tx, y + f.dy AS ty,
      |         row_number() OVER (PARTITION BY tile_id, x, y
      |           ORDER BY f.drop*f.drop*(CASE WHEN f.diag THEN 1 ELSE 2 END) DESC,
      |                    f.pr ASC) AS rn
      |  FROM cand WHERE f.drop > 0),
      |succ AS (SELECT tile_id, x, y, tx, ty FROM ranked WHERE rn = 1),
      |allpx AS (
      |  SELECT tile_id, tile_key, xs.x::INT AS x, ys.y::INT AS y
      |  FROM keyed, generate_series(0,7) ys(y), generate_series(0,7) xs(x)
      |  WHERE tile_id < 50),
      |w AS (
      |  SELECT tile_id, x AS sx, y AS sy, x AS cx, y AS cy FROM allpx
      |  UNION ALL
      |  SELECT w.tile_id, w.sx, w.sy, s.tx, s.ty
      |  FROM w JOIN succ s ON s.tile_id = w.tile_id AND s.x = w.cx AND s.y = w.cy),
      |term AS (
      |  SELECT * FROM w
      |  WHERE NOT EXISTS (SELECT 1 FROM succ s
      |                    WHERE s.tile_id = w.tile_id AND s.x = w.cx AND s.y = w.cy))
      |SELECT p.tile_id, p.tile_key, p.x, p.y,
      |       (t.cy * 8 + t.cx)::BIGINT AS basin_pos,
      |       t.cx::INT AS basin_x, t.cy::INT AS basin_y,
      |       (t.cx = p.x AND t.cy = p.y) AS is_root
      |FROM allpx p JOIN term t
      |  ON t.tile_id = p.tile_id AND t.sx = p.x AND t.sy = p.y
      |ORDER BY p.tile_id, p.y, p.x""").stripMargin,
    // g21: the oracle is the naive global running window over the
    // cumulative-size line; the engine's sharded prefix must agree
    "g21_compaction_plan" -> (raw"""
      |WITH $TilesCte,
      |c AS (SELECT tile_id, size_bytes,
      |        sum(size_bytes) OVER (ORDER BY tile_id ROWS UNBOUNDED PRECEDING) AS cum
      |      FROM keyed)
      |SELECT ((cum - size_bytes) // 67108864)::BIGINT AS bin_id,
      |       count(*) AS n_files, sum(size_bytes)::BIGINT AS bin_bytes,
      |       sum(CASE WHEN size_bytes < 4000000 THEN 1 ELSE 0 END)::BIGINT AS n_small,
      |       min(tile_id) AS min_tile, max(tile_id) AS max_tile
      |FROM c GROUP BY 1 ORDER BY 1""").stripMargin,
    // g34: the plan side over the sink's tile universe (tile_id < 500)
    // joined to a generating-formula recomputation of the rows the
    // compacted bytes must hold — a rewrite that loses or duplicates
    // rows diverges n_rows/sum_elev here
    "g34_compaction_apply" -> (raw"""
      |WITH $TilesCte,
      |c AS (SELECT tile_id, size_bytes,
      |        sum(size_bytes) OVER (ORDER BY tile_id ROWS UNBOUNDED PRECEDING) AS cum
      |      FROM keyed WHERE tile_id < 500),
      |b AS (SELECT tile_id, size_bytes,
      |        ((cum - size_bytes) // 67108864)::BIGINT AS bin_id FROM c),
      |f AS (SELECT bin_id, count(*)::BIGINT AS n_files_before,
      |        sum(size_bytes)::BIGINT AS bin_bytes,
      |        min(tile_id) AS min_tile, max(tile_id) AS max_tile
      |      FROM b GROUP BY 1),
      |g AS (SELECT k.tile_id,
      |        ((k.tile_id*131 + xs.x*17 + ys.y*29)%8848)::BIGINT AS elevation
      |      FROM keyed k, generate_series(0,7) ys(y), generate_series(0,7) xs(x)
      |      WHERE k.tile_id < 500),
      |r AS (SELECT bin_id, count(*)::BIGINT AS n_rows,
      |        sum(elevation)::BIGINT AS sum_elev
      |      FROM g JOIN b USING (tile_id) GROUP BY 1)
      |SELECT bin_id, n_files_before, bin_bytes, n_rows, sum_elev, min_tile, max_tile
      |FROM f JOIN r USING (bin_id) ORDER BY bin_id""").stripMargin,
    "g20_halo_slope" -> (raw"""
      |WITH t AS (SELECT la.lat0 AS lat0, lo.lon0 AS lon0
      |  FROM generate_series(10,17) la(lat0), generate_series(20,27) lo(lon0)),
      |rim AS (SELECT lat0, lon0, xs.x::INT AS x, ys.y::INT AS y,
      |  (lon0 - 20) * 8 + xs.x AS gx, (17 - lat0) * 8 + ys.y AS gy
      |  FROM t, generate_series(0,7) ys(y), generate_series(0,7) xs(x)
      |  WHERE xs.x = 0 OR xs.x = 7 OR ys.y = 0 OR ys.y = 7),
      |cov AS (SELECT * FROM rim
      |  WHERE gx BETWEEN 1 AND 62 AND gy BETWEEN 1 AND 62),
      |zz AS (SELECT lat0, lon0, x, y,
      |  ((gx+1)*17 + (gy-1)*29 + ((gx+1)*(gy-1)) % 97) % 8848 AS ze_n,
      |  ((gx+1)*17 + (gy  )*29 + ((gx+1)*(gy  )) % 97) % 8848 AS ze,
      |  ((gx+1)*17 + (gy+1)*29 + ((gx+1)*(gy+1)) % 97) % 8848 AS ze_s,
      |  ((gx-1)*17 + (gy-1)*29 + ((gx-1)*(gy-1)) % 97) % 8848 AS zw_n,
      |  ((gx-1)*17 + (gy  )*29 + ((gx-1)*(gy  )) % 97) % 8848 AS zw,
      |  ((gx-1)*17 + (gy+1)*29 + ((gx-1)*(gy+1)) % 97) % 8848 AS zw_s,
      |  ((gx  )*17 + (gy-1)*29 + ((gx  )*(gy-1)) % 97) % 8848 AS zn,
      |  ((gx  )*17 + (gy+1)*29 + ((gx  )*(gy+1)) % 97) % 8848 AS zs
      |  FROM cov),
      |h AS (SELECT lat0::INT AS lat0, lon0::INT AS lon0, x, y,
      |  (ze_n + 2*ze + ze_s - zw_n - 2*zw - zw_s)::BIGINT AS dzdx_num,
      |  (zw_s + 2*zs + ze_s - zw_n - 2*zn - ze_n)::BIGINT AS dzdy_num
      |  FROM zz)
      |SELECT lat0, lon0, x, y, dzdx_num, dzdy_num,
      |  (dzdx_num*dzdx_num + dzdy_num*dzdy_num)::BIGINT AS tan2_num
      |FROM h ORDER BY lat0, lon0, y, x""").stripMargin,
    // g15: same neighbor re-derivation as g14; the argmax mirrors the
    // Spark side's lexicographic (score, priority) struct max — and
    // cardinal/diagonal score ties are impossible in integers
    // (2a² = b² ⇒ a = b = 0), so the winner is unambiguous
    "g15_flow_dir" -> (raw"""
      |WITH $TilesCte,
      |px AS (
      |  SELECT tile_id, tile_key, xs.x::INT AS x, ys.y::INT AS y
      |  FROM keyed, generate_series(1,6) ys(y), generate_series(1,6) xs(x)
      |  WHERE tile_id < 50),
      |zz AS (
      |  SELECT *,
      |    (tile_id*131 + (x  )*17 + (y  )*29) % 8848 AS z0,
      |    (tile_id*131 + (x+1)*17 + (y-1)*29) % 8848 AS ze_n,
      |    (tile_id*131 + (x+1)*17 + (y  )*29) % 8848 AS ze,
      |    (tile_id*131 + (x+1)*17 + (y+1)*29) % 8848 AS ze_s,
      |    (tile_id*131 + (x-1)*17 + (y-1)*29) % 8848 AS zw_n,
      |    (tile_id*131 + (x-1)*17 + (y  )*29) % 8848 AS zw,
      |    (tile_id*131 + (x-1)*17 + (y+1)*29) % 8848 AS zw_s,
      |    (tile_id*131 + (x  )*17 + (y-1)*29) % 8848 AS zn,
      |    (tile_id*131 + (x  )*17 + (y+1)*29) % 8848 AS zs
      |  FROM px),
      |cand AS (
      |  SELECT tile_id, x, y, unnest([
      |    struct_pack(code :=   1, pr := 1, drop := z0 - ze,   diag := false),
      |    struct_pack(code :=   2, pr := 2, drop := z0 - ze_s, diag := true),
      |    struct_pack(code :=   4, pr := 3, drop := z0 - zs,   diag := false),
      |    struct_pack(code :=   8, pr := 4, drop := z0 - zw_s, diag := true),
      |    struct_pack(code :=  16, pr := 5, drop := z0 - zw,   diag := false),
      |    struct_pack(code :=  32, pr := 6, drop := z0 - zw_n, diag := true),
      |    struct_pack(code :=  64, pr := 7, drop := z0 - zn,   diag := false),
      |    struct_pack(code := 128, pr := 8, drop := z0 - ze_n, diag := true)
      |  ]) AS f FROM zz),
      |best AS (
      |  SELECT tile_id, x, y, f.code AS code, f.drop AS drop, f.diag AS diag,
      |         row_number() OVER (PARTITION BY tile_id, x, y
      |           ORDER BY f.drop*f.drop*(CASE WHEN f.diag THEN 1 ELSE 2 END) DESC,
      |                    f.pr ASC) AS rn
      |  FROM cand WHERE f.drop > 0)
      |SELECT px.tile_id, px.tile_key, px.x, px.y,
      |       coalesce(b.code, 0)::INT AS flow_dir,
      |       coalesce(b.drop, 0)::BIGINT AS drop_num,
      |       coalesce(b.diag, false) AS diag
      |FROM px LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
      |  USING (tile_id, x, y)
      |ORDER BY px.tile_id, px.y, px.x""").stripMargin,
    "g12_raster_tiff_i16" -> raw"""
      |WITH $TilesCte,
      |grid2 AS (
      |  SELECT tile_id, tile_key, lat0, lon0,
      |         ((tile_id*131 + xs.x*17 + ys.y*29)%8848)::INT AS elevation
      |  FROM keyed, generate_series(0,23) ys(y), generate_series(0,23) xs(x))
      |SELECT tile_id, tile_key, lat0, lon0, TRUE AS dims_ok,
      |       count(*) AS n_pixels, min(elevation) AS min_elev, max(elevation) AS max_elev,
      |       floor(avg(elevation) * 1e6 + 0.5)::BIGINT AS avg_elev_e6, sum(elevation)::BIGINT AS sum_elev
      |FROM grid2 WHERE tile_id < 50
      |GROUP BY 1, 2, 3, 4 ORDER BY tile_id""".stripMargin,
    // g13: the oracle re-derives the NoData mask from the same
    // (tile, x, y) arithmetic the fixture writer plants it with, maps
    // sentinels to NULL, and aggregates valid pixels — NULL-skipping
    // aggregate semantics match Spark's
    "g13_raster_tiff_nodata" -> raw"""
      |WITH $TilesCte,
      |grid2 AS (
      |  SELECT tile_id, tile_key, lat0, lon0,
      |         CASE WHEN (xs.x*13 + ys.y*7 + tile_id) % 89 = 0 THEN NULL
      |              ELSE ((tile_id*131 + xs.x*17 + ys.y*29)%8848)::INT END AS elev
      |  FROM keyed, generate_series(0,23) ys(y), generate_series(0,23) xs(x))
      |SELECT tile_id, tile_key, lat0, lon0, TRUE AS dims_ok, -9999 AS nodata,
      |       count(*) AS n_pixels,
      |       count(*) FILTER (WHERE elev IS NULL) AS n_nodata,
      |       min(elev) AS min_elev, max(elev) AS max_elev,
      |       floor(avg(elev) * 1e6 + 0.5)::BIGINT AS avg_elev_e6, sum(elev)::BIGINT AS sum_elev
      |FROM grid2 WHERE tile_id < 50
      |GROUP BY 1, 2, 3, 4 ORDER BY tile_id""".stripMargin,
    // j4: no tearing (ORC writes binary-whole); the audit is the
    // byte-exact round-trip fold over the full slice
    // j6: identical content contract as j1 (same torn rule) — the gz
    // codec must be invisible to the audit; n_files pins the 4-shard
    // layout the fixture writes
    // j8: j1's audit partition; n_files pins the whole-file-array
    // parallelism story (4 shards = 4 tasks, stated)
    "j8_json_array_ingest" -> raw"""
      |SELECT count(*) FILTER (WHERE doc_id % 7 != 3) AS n_clean,
      |       count(*) FILTER (WHERE doc_id % 7 = 3) AS n_quarantine,
      |       (sum(doc_id) FILTER (WHERE doc_id % 7 != 3))::BIGINT AS sum_doc_id,
      |       (sum(n_chars) FILTER (WHERE doc_id % 7 != 3))::BIGINT AS sum_n_chars,
      |       (sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                         for i in range(1, 9)], (a, b) -> a*16 + b))
      |        FILTER (WHERE doc_id % 7 != 3))::BIGINT AS text_fold,
      |       4::BIGINT AS n_files
      |FROM documents WHERE doc_id < 400""".stripMargin,
    // j7: j1's audit partition; sum_n_chars states length(text)
    // directly (the payload IS the text — n_chars never rides a
    // header), and the torn rule surfaces as the Content-Length lie
    "j7_warc_ingest" -> raw"""
      |SELECT count(*) FILTER (WHERE doc_id % 7 != 3) AS n_clean,
      |       count(*) FILTER (WHERE doc_id % 7 = 3) AS n_quarantine,
      |       (sum(doc_id) FILTER (WHERE doc_id % 7 != 3))::BIGINT AS sum_doc_id,
      |       (sum(length(text)) FILTER (WHERE doc_id % 7 != 3))::BIGINT AS sum_n_chars,
      |       (sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                         for i in range(1, 9)], (a, b) -> a*16 + b))
      |        FILTER (WHERE doc_id % 7 != 3))::BIGINT AS text_fold,
      |       4::BIGINT AS n_files
      |FROM documents WHERE doc_id < 400""".stripMargin,
    "j6_gzip_ingest" -> raw"""
      |SELECT count(*) FILTER (WHERE doc_id % 7 != 3) AS n_clean,
      |       count(*) FILTER (WHERE doc_id % 7 = 3) AS n_quarantine,
      |       (sum(doc_id) FILTER (WHERE doc_id % 7 != 3))::BIGINT AS sum_doc_id,
      |       (sum(n_chars) FILTER (WHERE doc_id % 7 != 3))::BIGINT AS sum_n_chars,
      |       (sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                         for i in range(1, 9)], (a, b) -> a*16 + b))
      |        FILTER (WHERE doc_id % 7 != 3))::BIGINT AS text_fold,
      |       4::BIGINT AS n_files
      |FROM documents WHERE doc_id < 400""".stripMargin,
    // j10: the oracle recomputes the v2 snapshot from the generating
    // rules — base corpus (each doc once, shard-1 rewrite included
    // exactly once) plus the reinserted torn-rule copies at
    // +1000000; n_files pins the 5-file active set (3 surviving v0
    // shards + v1 insert + v2 rewrite) and snapshot_version the
    // replayed latest
    "j10_delta_read" -> raw"""
      |WITH base AS (SELECT doc_id, text, n_chars FROM documents
      |              WHERE doc_id < 400),
      |snap AS (SELECT doc_id, text, n_chars FROM base
      |         UNION ALL
      |         SELECT doc_id + 1000000, text, n_chars FROM base
      |         WHERE doc_id % 7 = 3)
      |SELECT 2::BIGINT AS snapshot_version,
      |       count(*) AS n_rows,
      |       sum(doc_id)::BIGINT AS sum_doc_id,
      |       sum(n_chars)::BIGINT AS sum_n_chars,
      |       sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                        for i in range(1, 9)], (a, b) -> a*16 + b))::BIGINT AS text_fold,
      |       5::BIGINT AS n_files
      |FROM snap""".stripMargin,
    // j12: the four change classes from the generating rules — the
    // byte-identical shard-1 carries must CANCEL (they appear in no
    // class), deletes/updates/inserts each recomputed from the same
    // doc_id arithmetic the fixture planted
    "j12_delta_changes" -> raw"""
      |WITH base AS (SELECT doc_id, text, n_chars FROM documents
      |              WHERE doc_id < 400),
      |s1 AS (SELECT * FROM base WHERE doc_id % 4 = 1),
      |up AS (SELECT doc_id, n_chars FROM s1
      |       WHERE doc_id % 7 != 3 AND doc_id % 5 = 0),
      |ch AS (
      |  SELECT 'delete' AS change_type, doc_id, n_chars
      |  FROM s1 WHERE doc_id % 7 = 3
      |  UNION ALL SELECT 'update_preimage', doc_id, n_chars FROM up
      |  UNION ALL SELECT 'update_postimage', doc_id, n_chars + 100 FROM up
      |  UNION ALL SELECT 'insert', doc_id + 1000000, n_chars
      |  FROM base WHERE doc_id % 7 = 3)
      |SELECT 1::BIGINT AS version, change_type,
      |       count(*) AS n_rows,
      |       sum(doc_id)::BIGINT AS sum_doc_id,
      |       sum(n_chars)::BIGINT AS sum_n_chars
      |FROM ch GROUP BY change_type ORDER BY change_type""".stripMargin,
    // j13: positions by the per-shard row_number discipline (shards
    // are doc_id-ascending, so ridx IS the parquet row ordinal);
    // n_files stays the FULL shard count — row-grain deletion, the
    // j11 file-grain contrast
    "j13_iceberg_v2" -> raw"""
      |WITH d AS (SELECT doc_id, text, n_chars,
      |             row_number() OVER (PARTITION BY doc_id % 4
      |                                ORDER BY doc_id) - 1 AS ridx
      |           FROM documents WHERE doc_id < 400),
      |c AS (SELECT * FROM d WHERE ridx % 5 != 2)
      |SELECT 2::BIGINT AS snapshot_id,
      |       count(*) AS n_rows,
      |       sum(doc_id)::BIGINT AS sum_doc_id,
      |       sum(n_chars)::BIGINT AS sum_n_chars,
      |       sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                        for i in range(1, 9)], (a, b) -> a*16 + b))::BIGINT AS text_fold,
      |       4::BIGINT AS n_files
      |FROM c""".stripMargin,
    // j14: deletion-vector positions by the same per-shard
    // row_number discipline as j13 — shards 0/2 drop ridx%5==2,
    // shard 1 drops ridx%7==3 (inline DV), shard 3 untouched;
    // n_files pins the FULL shard count (row-grain deletion)
    "j14_delta_dv" -> raw"""
      |WITH d AS (SELECT doc_id, text, n_chars,
      |             row_number() OVER (PARTITION BY doc_id % 4
      |                                ORDER BY doc_id) - 1 AS ridx
      |           FROM documents WHERE doc_id < 400),
      |c AS (SELECT * FROM d
      |      WHERE NOT ((doc_id % 4 IN (0, 2) AND ridx % 5 = 2)
      |              OR (doc_id % 4 = 1 AND ridx % 7 = 3)))
      |SELECT 1::BIGINT AS snapshot_version,
      |       count(*) AS n_rows,
      |       sum(doc_id)::BIGINT AS sum_doc_id,
      |       sum(n_chars)::BIGINT AS sum_n_chars,
      |       sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                        for i in range(1, 9)], (a, b) -> a*16 + b))::BIGINT AS text_fold,
      |       4::BIGINT AS n_files
      |FROM c""".stripMargin,
    // j15: equality deletes by the generating rules — torn-rule keys
    // deleted from the seq-1 shards but SURVIVING as the seq-2
    // re-inserts (n_chars+1000): an unscoped delete diverges by
    // exactly those rows; n_files pins all 5 data files live
    "j15_iceberg_eqdel" -> raw"""
      |WITH base AS (SELECT doc_id, text, n_chars FROM documents
      |              WHERE doc_id < 400),
      |snap AS (SELECT doc_id, text, n_chars FROM base WHERE doc_id % 7 != 3
      |         UNION ALL
      |         SELECT doc_id, text, n_chars + 1000 FROM base
      |         WHERE doc_id % 7 = 3)
      |SELECT 2::BIGINT AS snapshot_id,
      |       count(*) AS n_rows,
      |       sum(doc_id)::BIGINT AS sum_doc_id,
      |       sum(n_chars)::BIGINT AS sum_n_chars,
      |       sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                        for i in range(1, 9)], (a, b) -> a*16 + b))::BIGINT AS text_fold,
      |       5::BIGINT AS n_files
      |FROM snap""".stripMargin,
    // j16: DV-aware CDC by the ordinal rules — v1 emits each shard's
    // first-generation deletions, v2 emits ONLY shard 0's bitmap
    // growth (%3==1 minus the already-deleted %5==2); everything is
    // a delete (DVs only remove rows)
    "j16_delta_dv_cdc" -> raw"""
      |WITH d AS (SELECT doc_id, n_chars, doc_id % 4 AS shard,
      |             row_number() OVER (PARTITION BY doc_id % 4
      |                                ORDER BY doc_id) - 1 AS ridx
      |           FROM documents WHERE doc_id < 400),
      |ch AS (
      |  SELECT 1 AS version, 'delete' AS change_type, doc_id, n_chars
      |  FROM d WHERE (shard IN (0, 2) AND ridx % 5 = 2)
      |           OR (shard = 1 AND ridx % 7 = 3)
      |  UNION ALL
      |  SELECT 2, 'delete', doc_id, n_chars
      |  FROM d WHERE shard = 0 AND ridx % 3 = 1 AND ridx % 5 != 2)
      |SELECT version::BIGINT AS version, change_type,
      |       count(*) AS n_rows,
      |       sum(doc_id)::BIGINT AS sum_doc_id,
      |       sum(n_chars)::BIGINT AS sum_n_chars
      |FROM ch GROUP BY version, change_type
      |ORDER BY version, change_type""".stripMargin,
    // j17: data skipping is a SUPERSET scan + the caller's predicate,
    // so the oracle is simply the range aggregate — a wrong prune
    // LOSES rows and diverges; the opened-file set is spec territory
    "j17_delta_skipping" -> raw"""
      |SELECT count(*) AS n_rows,
      |       sum(doc_id)::BIGINT AS sum_doc_id,
      |       sum(n_chars)::BIGINT AS sum_n_chars,
      |       sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                        for i in range(1, 9)], (a, b) -> a*16 + b))::BIGINT AS text_fold
      |FROM documents WHERE doc_id BETWEEN 20 AND 70""".stripMargin,
    // j19: the Iceberg twin of j17 — same superset-scan-plus-predicate
    // contract, so the oracle is the same range aggregate; the
    // opened-file set is spec territory (IngestSpec pins prunedFiles
    // for two probes)
    "j19_iceberg_skipping" -> raw"""
      |SELECT count(*) AS n_rows,
      |       sum(doc_id)::BIGINT AS sum_doc_id,
      |       sum(n_chars)::BIGINT AS sum_n_chars,
      |       sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                        for i in range(1, 9)], (a, b) -> a*16 + b))::BIGINT AS text_fold
      |FROM documents WHERE doc_id BETWEEN 20 AND 70""".stripMargin,
    // j21: the exported Delta table holds exactly the snapshot's
    // doc_id<400 corpus in 4 range-split files — the round trip must
    // reproduce the source census bit-exactly
    "j21_delta_export" -> raw"""
      |SELECT count(*) AS n_rows,
      |       sum(doc_id)::BIGINT AS sum_doc_id,
      |       sum(n_chars)::BIGINT AS sum_n_chars,
      |       sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                        for i in range(1, 9)], (a, b) -> a*16 + b))::BIGINT AS text_fold,
      |       4::BIGINT AS n_files
      |FROM documents WHERE doc_id < 400""".stripMargin,
    // j23: the exported LOG's derived change feed must reproduce the
    // snapshot history's change classes — v1 appended the odd docs
    // (inserts), v2 replaced keeping doc_id < 200 (deletes of the
    // rest, carried rows cancel)
    "j23_delta_log_export" -> raw"""
      |WITH base AS (SELECT doc_id, text, n_chars FROM documents
      |              WHERE doc_id < 400),
      |ch AS (
      |  SELECT 1::BIGINT AS version, 'insert' AS change_type,
      |         doc_id, text, n_chars
      |  FROM base WHERE doc_id % 2 = 1
      |  UNION ALL
      |  SELECT 2::BIGINT, 'delete', doc_id, text, n_chars
      |  FROM base WHERE doc_id >= 200)
      |SELECT version, change_type, count(*) AS n_rows,
      |       sum(doc_id)::BIGINT AS sum_doc_id,
      |       sum(n_chars)::BIGINT AS sum_n_chars,
      |       sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                        for i in range(1, 9)], (a, b) -> a*16 + b))::BIGINT AS text_fold
      |FROM ch GROUP BY version, change_type
      |ORDER BY version, change_type""".stripMargin,
    // j22: identical census contract to j21 — the second format's
    // round trip must reproduce the same source corpus bit-exactly
    "j22_iceberg_export" -> raw"""
      |SELECT count(*) AS n_rows,
      |       sum(doc_id)::BIGINT AS sum_doc_id,
      |       sum(n_chars)::BIGINT AS sum_n_chars,
      |       sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                        for i in range(1, 9)], (a, b) -> a*16 + b))::BIGINT AS text_fold,
      |       4::BIGINT AS n_files
      |FROM documents WHERE doc_id < 400""".stripMargin,
    // j20: the id-mode table holds the doc_id<400 corpus one file per
    // lang — column identity comes from field ids and the partition
    // column from physical-name-keyed partitionValues, but the VALUES
    // are the plain generating rules, so the oracle is a per-lang
    // census of the same slice
    "j20_delta_cm_id" -> raw"""
      |SELECT lang, count(*) AS n_rows,
      |       sum(doc_id)::BIGINT AS sum_doc_id,
      |       sum(n_chars)::BIGINT AS sum_n_chars,
      |       sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                        for i in range(1, 9)], (a, b) -> a*16 + b))::BIGINT AS text_fold,
      |       sum(list_reduce([strpos('0123456789abcdef', substr(md5(source), i, 1)) - 1
      |                        for i in range(1, 9)], (a, b) -> a*16 + b))::BIGINT AS source_fold
      |FROM documents WHERE doc_id < 400
      |GROUP BY lang ORDER BY lang""".stripMargin,
    // j18: same generating rules as j10 (the logical history is
    // identical; only the checkpoint ENCODING differs) — full corpus
    // + reinserted torn copies, 5 live files, replayed version 2
    "j18_delta_v2cp" -> raw"""
      |WITH base AS (SELECT doc_id, text, n_chars FROM documents
      |              WHERE doc_id < 400),
      |snap AS (SELECT doc_id, text, n_chars FROM base
      |         UNION ALL
      |         SELECT doc_id + 1000000, text, n_chars FROM base
      |         WHERE doc_id % 7 = 3)
      |SELECT 2::BIGINT AS snapshot_version,
      |       count(*) AS n_rows,
      |       sum(doc_id)::BIGINT AS sum_doc_id,
      |       sum(n_chars)::BIGINT AS sum_n_chars,
      |       sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                        for i in range(1, 9)], (a, b) -> a*16 + b))::BIGINT AS text_fold,
      |       5::BIGINT AS n_files
      |FROM snap""".stripMargin,
    // j11: the s2 snapshot by its generating rules — surviving shards
    // (doc_id % 4 != 1) plus the reinserted torn-rule copies from the
    // FULL base corpus; n_files pins the 4-file active set (3
    // EXISTING shards + 1 ADDED insert; the DELETED shard must not
    // read) and snapshot_id the version-hint resolution
    "j11_iceberg_read" -> raw"""
      |WITH base AS (SELECT doc_id, text, n_chars FROM documents
      |              WHERE doc_id < 400),
      |snap AS (SELECT doc_id, text, n_chars FROM base WHERE doc_id % 4 != 1
      |         UNION ALL
      |         SELECT doc_id + 1000000, text, n_chars FROM base
      |         WHERE doc_id % 7 = 3)
      |SELECT 2::BIGINT AS snapshot_id,
      |       count(*) AS n_rows,
      |       sum(doc_id)::BIGINT AS sum_doc_id,
      |       sum(n_chars)::BIGINT AS sum_n_chars,
      |       sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                        for i in range(1, 9)], (a, b) -> a*16 + b))::BIGINT AS text_fold,
      |       4::BIGINT AS n_files
      |FROM snap""".stripMargin,
    // j9: the corrupt-block rule by position — shard 2's block 1 =
    // within-shard rows [16, 32) at 16 records per forced block; the
    // oracle recomputes the clean complement, so a reader that loses
    // any OTHER block's records (or resurrects the corrupt one)
    // diverges the hash. n_bad_blocks is the planted constant.
    "j9_avro_ingest" -> raw"""
      |WITH d AS (SELECT doc_id, text, n_chars,
      |             row_number() OVER (PARTITION BY doc_id % 4
      |                                ORDER BY doc_id) - 1 AS ridx
      |           FROM documents WHERE doc_id < 400),
      |c AS (SELECT * FROM d
      |      WHERE NOT (doc_id % 4 = 2 AND ridx BETWEEN 16 AND 31))
      |SELECT count(*) AS n_clean, 1::BIGINT AS n_bad_blocks,
      |       sum(doc_id)::BIGINT AS sum_doc_id,
      |       sum(n_chars)::BIGINT AS sum_n_chars,
      |       sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                        for i in range(1, 9)], (a, b) -> a*16 + b))::BIGINT AS text_fold,
      |       4::BIGINT AS n_files
      |FROM c""".stripMargin,
    "j4_orc_ingest" -> raw"""
      |SELECT count(*) AS n_rows,
      |       sum(doc_id)::BIGINT AS sum_doc_id,
      |       sum(n_chars)::BIGINT AS sum_n_chars,
      |       sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                        for i in range(1, 9)], (a, b) -> a*16 + b))::BIGINT AS text_fold
      |FROM documents WHERE doc_id < 400""".stripMargin,
    // j5: identical audit + torn-rule as j1 (type-mismatched doc_id)
    "j5_xml_ingest" -> raw"""
      |SELECT count(*) FILTER (WHERE doc_id % 7 != 3) AS n_clean,
      |       count(*) FILTER (WHERE doc_id % 7 = 3) AS n_quarantine,
      |       (sum(doc_id) FILTER (WHERE doc_id % 7 != 3))::BIGINT AS sum_doc_id,
      |       (sum(n_chars) FILTER (WHERE doc_id % 7 != 3))::BIGINT AS sum_n_chars,
      |       (sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                         for i in range(1, 9)], (a, b) -> a*16 + b))
      |        FILTER (WHERE doc_id % 7 != 3))::BIGINT AS text_fold
      |FROM documents WHERE doc_id < 400""".stripMargin,
    "j1_jsonl_ingest" -> raw"""
      |SELECT count(*) FILTER (WHERE doc_id % 7 != 3) AS n_clean,
      |       count(*) FILTER (WHERE doc_id % 7 = 3) AS n_quarantine,
      |       (sum(doc_id) FILTER (WHERE doc_id % 7 != 3))::BIGINT AS sum_doc_id,
      |       (sum(n_chars) FILTER (WHERE doc_id % 7 != 3))::BIGINT AS sum_n_chars,
      |       (sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                         for i in range(1, 9)], (a, b) -> a*16 + b))
      |        FILTER (WHERE doc_id % 7 != 3))::BIGINT AS text_fold
      |FROM documents WHERE doc_id < 400""".stripMargin,
    "j2_csv_ingest" -> raw"""
      |SELECT count(*) FILTER (WHERE doc_id % 7 != 3) AS n_clean,
      |       count(*) FILTER (WHERE doc_id % 7 = 3) AS n_quarantine,
      |       (sum(doc_id) FILTER (WHERE doc_id % 7 != 3))::BIGINT AS sum_doc_id,
      |       (sum(n_chars) FILTER (WHERE doc_id % 7 != 3))::BIGINT AS sum_n_chars,
      |       (sum(list_reduce([strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
      |                         for i in range(1, 9)], (a, b) -> a*16 + b))
      |        FILTER (WHERE doc_id % 7 != 3))::BIGINT AS text_fold
      |FROM documents WHERE doc_id < 400""".stripMargin,
    // j3: generation = doc_id mod 2; batch-0 rows predate the quality
    // column (all null), batch-1 quality = doc_id·7 mod 100
    "j3_schema_evolution" -> raw"""
      |WITH d AS (SELECT doc_id, n_chars, (doc_id % 2)::INT AS batch
      |           FROM documents WHERE doc_id < 400)
      |SELECT batch, count(*) AS n_rows,
      |       count(*) FILTER (WHERE batch = 0) AS n_null_quality,
      |       coalesce(sum(doc_id * 7 % 100) FILTER (WHERE batch = 1), 0)::BIGINT
      |         AS sum_quality,
      |       sum(n_chars)::BIGINT AS sum_n_chars
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "g11_partition_prune" -> raw"""
      |WITH $GridCte
      |SELECT tile_key, min(tile_id) AS first_tile_id, count(*) AS n_pixels,
      |       min(elevation) AS min_elev, max(elevation) AS max_elev,
      |       floor(avg(elevation) * 1e6 + 0.5)::BIGINT AS avg_elev_e6, sum(elevation)::BIGINT AS sum_elev
      |FROM grid
      |WHERE tile_id < 500 AND lat0 BETWEEN 23 AND 80 AND lon0 BETWEEN -25 AND 49
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "g8_listing_manifest" -> raw"""
      |WITH $TilesCte,
      |r AS (SELECT tile_id, tile_key, (tile_id*131)%4096 + 64 AS size_bytes
      |      FROM keyed WHERE tile_id < 500),
      |l AS (SELECT tile_key, size_bytes - (CASE WHEN tile_id%7 = 0 THEN 1 ELSE 0 END) AS size_bytes
      |      FROM r WHERE tile_id%3 = 0)
      |SELECT tile_id, tile_key, size_bytes FROM r
      |WHERE NOT EXISTS (SELECT 1 FROM l WHERE l.tile_key = r.tile_key AND l.size_bytes = r.size_bytes)
      |ORDER BY tile_id""".stripMargin,
    "q1_agg" -> raw"""
      |SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity)::BIGINT AS sum_qty,
      |  sum(round(l_extendedprice*100)::BIGINT)::BIGINT AS sum_base_cents,
      |  sum(round(l_extendedprice*(1-l_discount)*100)::BIGINT)::BIGINT AS sum_disc_cents,
      |  sum(round(l_extendedprice*(1-l_discount)*(1+l_tax)*100)::BIGINT)::BIGINT AS sum_charge_cents,
      |  floor(sum(l_quantity)/count(*) * 1e6 + 0.5)::BIGINT AS avg_qty_e6,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_topk" -> raw"""
      |WITH rev AS (SELECT o_custkey, sum(round(o_totalprice*100)::BIGINT)::BIGINT AS revenue_cents,
      |                    count(*) AS n_orders
      |             FROM orders GROUP BY 1)
      |SELECT c_custkey, c_name, revenue_cents, n_orders
      |FROM rev JOIN customer ON o_custkey = c_custkey
      |ORDER BY revenue_cents DESC, c_custkey LIMIT 10""".stripMargin,
    "q3_join" -> raw"""
      |SELECT l_orderkey, strftime(od, '%Y-%m-%d') AS o_orderdate, revenue_cents FROM (
      |  SELECT l_orderkey, o_orderdate AS od,
      |         sum(round(l_extendedprice*(1-l_discount)*100)::BIGINT)::BIGINT AS revenue_cents
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |       JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment = 'BUILDING'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |    AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY 1, 2)
      |ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin,
    // q4: EXISTS with the planted 60-day lateness rule
    "q4_priority_late" -> raw"""
      |SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE o_orderdate >= DATE '1995-07-01'
      |  AND o_orderdate < DATE '1995-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q35: per-line cents rounded BEFORE summing; headers without
    // lines reconcile against 0
    "q35_fk_reconcile" -> raw"""
      |WITH lc AS (SELECT l_orderkey AS o_orderkey,
      |    sum(round(l_extendedprice*(1-l_discount)*(1+l_tax)*100)::BIGINT)::BIGINT
      |      AS lines_cents
      |  FROM lineitem GROUP BY 1),
      |d AS (SELECT o.o_orderstatus,
      |    round(o.o_totalprice*100)::BIGINT
      |      - coalesce(lc.lines_cents, 0) AS diff
      |  FROM orders o LEFT JOIN lc USING (o_orderkey))
      |SELECT o_orderstatus, count(*) AS n_orders,
      |  count(*) FILTER (WHERE diff = 0) AS n_matched,
      |  count(*) FILTER (WHERE diff != 0) AS n_mismatched,
      |  sum(abs(diff))::BIGINT AS sum_absdiff_cents
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q5_multijoin" -> raw"""
      |SELECT n_name, sum(round(l_extendedprice*(1-l_discount)*100)::BIGINT)::BIGINT AS revenue_cents
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |     JOIN supplier ON l_suppkey = s_suppkey
      |     JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |     JOIN nation ON s_nationkey = n_nationkey
      |     JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1 ORDER BY revenue_cents DESC, n_name""".stripMargin,
    "q6_filter" -> raw"""
      |SELECT sum(round(l_extendedprice*l_discount*100)::BIGINT)::BIGINT AS revenue_cents,
      |       count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q7_semi" -> raw"""
      |SELECT n_name, count(*) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |              AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q8_anti" -> raw"""
      |SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_window" -> raw"""
      |SELECT c_custkey, c_nationkey, acctbal_cents, rank_in_nation, running_cents FROM (
      |  SELECT c_custkey, c_nationkey, round(c_acctbal*100)::BIGINT AS acctbal_cents,
      |         (row_number() OVER w)::INT AS rank_in_nation,
      |         (sum(round(c_acctbal*100)::BIGINT) OVER (w ROWS UNBOUNDED PRECEDING))::BIGINT AS running_cents
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey))
      |WHERE rank_in_nation <= 3 ORDER BY c_nationkey, rank_in_nation""".stripMargin,
    "q10_rollup" -> raw"""
      |SELECT coalesce(r_name, '(all)') AS region, coalesce(n_name, '(all)') AS nation,
      |       count(*) AS n_customers, sum(round(c_acctbal*100)::BIGINT)::BIGINT AS acctbal_cents
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |     JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name) ORDER BY 1, 2""".stripMargin,
    "q11_distinct" -> raw"""
      |SELECT (SELECT count(DISTINCT l_partkey) FROM lineitem) AS n_parts,
      |       (SELECT count(DISTINCT l_suppkey) FROM lineitem) AS n_supps,
      |       (SELECT count(*) FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)) AS n_part_supp,
      |       (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS n_orders""".stripMargin,
    "q12_events_window" -> raw"""
      |SELECT floor(epoch(date_trunc('hour', ts)))::BIGINT AS hour_epoch, event_type,
      |       count(*) AS n_events, sum(round(value*100)::BIGINT)::BIGINT AS value_cents
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q13_sessionize" -> raw"""
      |WITH x AS (
      |  SELECT user_id, event_id, ts, value,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |y AS (SELECT *, CASE WHEN prev_ts IS NULL
      |                       OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800
      |                     THEN 1 ELSE 0 END AS new_session FROM x),
      |z AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                       ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id FROM y)
      |SELECT user_id, session_id, count(*) AS n_events,
      |       floor(epoch(min(ts)))::BIGINT AS start_epoch,
      |       floor(epoch(max(ts)))::BIGINT AS end_epoch,
      |       sum(round(value*100)::BIGINT)::BIGINT AS value_cents
      |FROM z GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q14_asof_join" -> raw"""
      |WITH ord AS (SELECT o_custkey AS uid, o_orderdate AS t, max(o_orderkey) AS o_orderkey
      |             FROM orders GROUP BY 1, 2),
      |u AS (SELECT uid, t, o_orderkey, NULL::BIGINT AS event_id, 0 AS kind FROM ord
      |      UNION ALL
      |      SELECT user_id, ts, NULL::BIGINT, event_id, 1 FROM events
      |      WHERE event_type = 'purchase'),
      |w AS (SELECT *, last_value(o_orderkey IGNORE NULLS)
      |        OVER (PARTITION BY uid ORDER BY t, kind ROWS UNBOUNDED PRECEDING) AS asof_orderkey
      |      FROM u)
      |SELECT event_id, uid AS user_id, floor(epoch(t))::BIGINT AS ts_epoch, asof_orderkey
      |FROM w WHERE kind = 1 ORDER BY event_id""".stripMargin,
    // q47: q14's window form over clicks, carrying the matched
    // click's TIME too, nulled past the 1-hour horizon
    "q47_asof_tolerance" -> raw"""
      |WITH cl AS (SELECT user_id AS uid, ts AS t, max(event_id) AS click_id
      |            FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |u AS (SELECT uid, t, click_id, NULL::BIGINT AS event_id, 0 AS kind FROM cl
      |      UNION ALL
      |      SELECT user_id, ts, NULL::BIGINT, event_id, 1 FROM events
      |      WHERE event_type = 'purchase'),
      |w AS (SELECT *,
      |        last_value(click_id IGNORE NULLS)
      |          OVER (PARTITION BY uid ORDER BY t, kind ROWS UNBOUNDED PRECEDING) AS ck,
      |        last_value(CASE WHEN kind = 0 THEN t END IGNORE NULLS)
      |          OVER (PARTITION BY uid ORDER BY t, kind ROWS UNBOUNDED PRECEDING) AS ct
      |      FROM u)
      |SELECT event_id, uid AS user_id, floor(epoch(t))::BIGINT AS ts_epoch,
      |  CASE WHEN ck IS NOT NULL
      |        AND floor(epoch(t)) - floor(epoch(ct)) <= 3600
      |       THEN ck END AS attr_click_id
      |FROM w WHERE kind = 1 ORDER BY event_id""".stripMargin,
    // q32: events sort BEFORE orders at equal t (kind 0 < 1), so a
    // same-timestamp order falls inside the CURRENT ROW..FOLLOWING
    // frame — the inclusive rt >= lt forward semantic
    "q32_asof_forward" -> raw"""
      |WITH ord AS (SELECT o_custkey AS uid, o_orderdate AS t, max(o_orderkey) AS o_orderkey
      |             FROM orders GROUP BY 1, 2),
      |u AS (SELECT uid, t, o_orderkey, NULL::BIGINT AS event_id, 1 AS kind FROM ord
      |      UNION ALL
      |      SELECT user_id, ts, NULL::BIGINT, event_id, 0 FROM events
      |      WHERE event_type = 'purchase'),
      |w AS (SELECT *, first_value(o_orderkey IGNORE NULLS)
      |        OVER (PARTITION BY uid ORDER BY t, kind
      |              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_orderkey
      |      FROM u)
      |SELECT event_id, uid AS user_id, floor(epoch(t))::BIGINT AS ts_epoch, next_orderkey
      |FROM w WHERE kind = 0 ORDER BY event_id""".stripMargin,
    // q33: the oracle ranks ALL same-key orders by (|Δt| in integer
    // microseconds, backward-first) — an independent formulation of
    // the two-directional composition
    // q34: same fixed-depth stage chain, stage times as epoch micros
    "q34_funnel" -> raw"""
      |WITH e AS (SELECT user_id, event_type, epoch_us(ts)::BIGINT AS us FROM events),
      |s1 AS (SELECT user_id, min(us) AS t_signup FROM e
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(us) AS t_view FROM e JOIN s1 USING (user_id)
      |  WHERE event_type = 'view' AND us >= t_signup GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(us) AS t_click FROM e JOIN s2 USING (user_id)
      |  WHERE event_type = 'click' AND us >= t_view GROUP BY e.user_id),
      |s4 AS (SELECT e.user_id, min(us) AS t_purchase FROM e JOIN s3 USING (user_id)
      |  WHERE event_type = 'purchase' AND us >= t_click GROUP BY e.user_id)
      |SELECT u.user_id, t_signup, t_view, t_click, t_purchase,
      |  CASE WHEN t_purchase IS NOT NULL THEN 4
      |       WHEN t_click IS NOT NULL THEN 3
      |       WHEN t_view IS NOT NULL THEN 2
      |       WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END AS stage_reached
      |FROM (SELECT DISTINCT user_id FROM e) u
      |LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
      |LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id)
      |ORDER BY u.user_id""".stripMargin,
    // q49: mode with the smallest-value tie rule — the oracle ranks
    // (cnt DESC, value ASC), identical to min(struct(-cnt, value))
    "q49_group_mode" -> raw"""
      |WITH c AS (SELECT c.c_mktsegment, o.o_orderpriority, count(*) AS cnt
      |           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |           GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
      |        ORDER BY cnt DESC, o_orderpriority) AS rn,
      |        sum(cnt) OVER (PARTITION BY c_mktsegment)::BIGINT AS n_orders
      |      FROM c)
      |SELECT c_mktsegment, o_orderpriority AS modal_priority,
      |       cnt::BIGINT AS modal_cnt, n_orders,
      |       (cnt * 1000 // n_orders)::BIGINT AS modal_pm
      |FROM r WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin,
    // q48: equi-depth histogram boundary = value at rank ceil(n*b/8)
    // of the sorted non-null multiset; all-integer (money as cents),
    // deterministic under ties
    "q48_table_stats" -> raw"""
      |WITH u AS (
      |  SELECT 'l_orderkey' AS col_name, l_orderkey::BIGINT AS vn, NULL::VARCHAR AS vs FROM lineitem
      |  UNION ALL
      |  SELECT 'l_quantity', l_quantity::BIGINT, NULL::VARCHAR FROM lineitem
      |  UNION ALL
      |  SELECT 'l_extendedprice', round(l_extendedprice*100)::BIGINT, NULL::VARCHAR FROM lineitem
      |  UNION ALL
      |  SELECT 'l_shipdate', (l_shipdate::DATE - DATE '1970-01-01')::BIGINT, NULL::VARCHAR FROM lineitem
      |  UNION ALL
      |  SELECT 'l_returnflag', NULL::BIGINT, l_returnflag FROM lineitem),
      |st AS (SELECT col_name, count(*) AS n_rows,
      |         sum(CASE WHEN vn IS NOT NULL OR vs IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_vals
      |       FROM u GROUP BY 1),
      |vals AS (SELECT col_name, vn, vs, count(*) AS cnt FROM u
      |         WHERE vn IS NOT NULL OR vs IS NOT NULL GROUP BY 1, 2, 3),
      |cum AS (SELECT *, sum(cnt) OVER (PARTITION BY col_name ORDER BY vn, vs
      |          ROWS UNBOUNDED PRECEDING)::BIGINT AS cum FROM vals),
      |nd AS (SELECT col_name, count(*)::BIGINT AS ndv,
      |              min(vn) AS min_num, max(vn) AS max_num,
      |              min(vs) AS min_str, max(vs) AS max_str FROM vals GROUP BY 1),
      |x AS (SELECT c.col_name, b.b AS bucket, c.vn, c.vs, c.cum,
      |             c.cum - c.cnt AS cum_prev, s.n_vals, s.n_rows
      |      FROM cum c JOIN st s USING (col_name), generate_series(1,8) b(b)
      |      WHERE (s.n_vals * b.b + 7) // 8 > c.cum - c.cnt
      |        AND (s.n_vals * b.b + 7) // 8 <= c.cum)
      |SELECT x.col_name, x.bucket::INT AS bucket, x.vn AS hi_num, x.vs AS hi_str,
      |       nd.ndv, (x.n_rows - x.n_vals)::BIGINT AS n_nulls,
      |       nd.min_num, nd.max_num, nd.min_str, nd.max_str
      |FROM x JOIN nd USING (col_name) ORDER BY x.col_name, x.bucket""".stripMargin,
    // q46: sole-blame lateness — EXISTS other supplier, NOT EXISTS
    // other LATE supplier, over the collapsed (order, supplier) flags
    "q46_waiting_orders" -> raw"""
      |WITH j AS (SELECT l_orderkey, l_suppkey,
      |    max(CASE WHEN date_diff('day', o_orderdate::DATE, l_shipdate::DATE) > 60
      |             THEN 1 ELSE 0 END) AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2),
      |cand AS (SELECT * FROM j WHERE late = 1)
      |SELECT c.l_suppkey, count(*) AS numwait FROM cand c
      |WHERE EXISTS (SELECT 1 FROM j o
      |              WHERE o.l_orderkey = c.l_orderkey AND o.l_suppkey <> c.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM cand x
      |                  WHERE x.l_orderkey = c.l_orderkey AND x.l_suppkey <> c.l_suppkey)
      |GROUP BY 1 ORDER BY numwait DESC, l_suppkey LIMIT 20""".stripMargin,
    // q45: identical normalized-rank definitions in both engines;
    // unique order key makes them deterministic
    // q45: integer numerators recovered from the native window
    // functions (pr·(n−1), cd·n) — a 6dp-rounded double is not
    // cross-engine stable on decimal ties (r8 sf0.1 sweep finding)
    // q53: consecutive (from,to) type pairs per user, per-from
    // integer per-mille row probabilities
    // q54: cumulative-deviation argmax in pure integers; tie to the
    // earliest hour
    "q54_changepoint" -> raw"""
      |WITH h AS (SELECT event_type, floor(epoch(ts))::BIGINT // 3600 AS hr,
      |             count(*)::BIGINT AS c
      |           FROM events GROUP BY 1, 2),
      |w AS (SELECT event_type, hr, c,
      |        sum(c) OVER (PARTITION BY event_type ORDER BY hr
      |          ROWS UNBOUNDED PRECEDING)::BIGINT AS si,
      |        row_number() OVER (PARTITION BY event_type ORDER BY hr)::BIGINT AS i
      |      FROM h),
      |t AS (SELECT event_type, sum(c)::BIGINT AS s_tot, count(*)::BIGINT AS h_tot
      |      FROM h GROUP BY 1),
      |d AS (SELECT w.event_type, w.hr, w.si, w.i, t.s_tot, t.h_tot,
      |        abs(w.si * t.h_tot - w.i * t.s_tot)::BIGINT AS dev,
      |        row_number() OVER (PARTITION BY w.event_type
      |          ORDER BY abs(w.si * t.h_tot - w.i * t.s_tot) DESC, w.hr) AS rk
      |      FROM w JOIN t USING (event_type))
      |SELECT event_type, hr AS cp_hour, dev AS dev_num, si AS n_before,
      |  i AS h_before, s_tot AS n_total, h_tot AS h_total
      |FROM d WHERE rk = 1 ORDER BY event_type""".stripMargin,
    // q55: the oracle states dominance DIRECTLY (NOT EXISTS a
    // dominating row) — a deliberately different algorithm from the
    // engine's prefix-maxima form, so the compare proves the
    // reduction, not just the arithmetic. Quadratic in DuckDB: fine
    // at sf0.01 gate scale (part = 2k rows).
    "q55_skyline" -> raw"""
      |WITH p AS (SELECT p_partkey, p_size,
      |             round(p_retailprice*100)::BIGINT AS price_c FROM part)
      |SELECT p_partkey, price_c, p_size FROM p a
      |WHERE NOT EXISTS (SELECT 1 FROM p o
      |  WHERE o.price_c <= a.price_c AND o.p_size >= a.p_size
      |    AND (o.price_c < a.price_c OR o.p_size > a.p_size))
      |ORDER BY p_partkey""".stripMargin,
    // q56: same lower-weighted-median definition stated over a plain
    // per-group window prefix — one crossing row per group
    "q56_weighted_median" -> raw"""
      |WITH li AS (SELECT l_returnflag AS grp,
      |              round(l_extendedprice*100)::BIGINT AS v,
      |              l_quantity::BIGINT AS w FROM lineitem),
      |a AS (SELECT grp, v, sum(w)::BIGINT AS w FROM li GROUP BY 1, 2),
      |c AS (SELECT grp, v, w,
      |        sum(w) OVER (PARTITION BY grp ORDER BY v)::BIGINT AS cum,
      |        sum(w) OVER (PARTITION BY grp)::BIGINT AS tot FROM a)
      |SELECT grp, v AS median_cents, cum AS w_at, tot AS w_total
      |FROM c WHERE 2*cum >= tot AND 2*(cum - w) < tot
      |ORDER BY grp""".stripMargin,
    // q59: last-in-month by (t DESC, event_id DESC) row_number — the
    // twin of the engine's max(struct(t, event_id, cents))
    // q60: both medians are LOWER weighted medians (first crossing),
    // stated as the same window-crossing predicate twice
    "q60_mad" -> raw"""
      |WITH li AS (SELECT l_returnflag AS grp,
      |              round(l_extendedprice*100)::BIGINT AS v FROM lineitem),
      |a AS (SELECT grp, v, count(*)::BIGINT AS w FROM li GROUP BY 1, 2),
      |c AS (SELECT grp, v, w,
      |        sum(w) OVER (PARTITION BY grp ORDER BY v)::BIGINT AS cum,
      |        sum(w) OVER (PARTITION BY grp)::BIGINT AS tot FROM a),
      |m AS (SELECT grp, v AS med, tot FROM c
      |      WHERE 2*cum >= tot AND 2*(cum - w) < tot),
      |d AS (SELECT a.grp, abs(a.v - m.med) AS dv, sum(a.w)::BIGINT AS w
      |      FROM a JOIN m USING (grp) GROUP BY 1, 2),
      |dc AS (SELECT grp, dv, w,
      |         sum(w) OVER (PARTITION BY grp ORDER BY dv)::BIGINT AS cum,
      |         sum(w) OVER (PARTITION BY grp)::BIGINT AS tot FROM d)
      |SELECT dc.grp, m.med AS median_cents, dc.dv AS mad_cents,
      |  dc.tot AS n_rows
      |FROM dc JOIN m ON dc.grp = m.grp
      |WHERE 2*dc.cum >= dc.tot AND 2*(dc.cum - dc.w) < dc.tot
      |ORDER BY dc.grp""".stripMargin,
    // q61: expected ppm is the published Benford constant table,
    // written literally on both sides — no runtime log anywhere
    "q61_benford" -> raw"""
      |WITH li AS (SELECT substr(round(l_extendedprice*100)::BIGINT::VARCHAR, 1, 1)::BIGINT
      |              AS digit FROM lineitem),
      |t AS (SELECT count(*)::BIGINT AS total FROM li),
      |e AS (SELECT unnest([1,2,3,4,5,6,7,8,9])::BIGINT AS digit,
      |             unnest([301030,176091,124939,96910,79181,66947,57992,51153,45757])::BIGINT AS exp_ppm),
      |o AS (SELECT digit, count(*)::BIGINT AS n FROM li GROUP BY 1)
      |SELECT o.digit, o.n, (o.n * 1000000) // t.total AS obs_ppm,
      |  e.exp_ppm, (o.n * 1000000) // t.total - e.exp_ppm AS dev_ppm
      |FROM o, t, e WHERE e.digit = o.digit ORDER BY o.digit""".stripMargin,
    // q62: pair/single/total counts all from the SAME distinct
    // (order, brand) frame; lift via HUGEINT so the 128-bit product
    // is exact (the engine side uses DECIMAL(38,0))
    "q62_basket" -> raw"""
      |WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
      |            FROM lineitem JOIN part ON l_partkey = p_partkey),
      |s AS (SELECT brand, count(*)::BIGINT AS n FROM ob GROUP BY 1),
      |t AS (SELECT count(DISTINCT ok)::BIGINT AS n_orders FROM ob),
      |p AS (SELECT a.brand AS brand_a, b.brand AS brand_b, count(*)::BIGINT AS n_ab
      |      FROM ob a JOIN ob b ON a.ok = b.ok AND a.brand < b.brand GROUP BY 1, 2)
      |SELECT brand_a, brand_b, n_ab, sa.n AS n_a, sb.n AS n_b, t.n_orders,
      |  (n_ab * 1000000) // t.n_orders AS support_ppm,
      |  (n_ab * 1000000) // sa.n AS conf_ppm,
      |  ((n_ab::HUGEINT * t.n_orders * 1000000) // (sa.n::HUGEINT * sb.n))::BIGINT AS lift_ppm
      |FROM p JOIN s sa ON sa.brand = p.brand_a
      |       JOIN s sb ON sb.brand = p.brand_b, t
      |ORDER BY brand_a, brand_b""".stripMargin,
    // q64: bucket = (exclusive-prefix-count · 5) div N over per-VALUE
    // counts — the engine's valueQuantile stated as a window; a value
    // run lands in one bucket in both forms by construction
    "q64_rfm" -> raw"""
      |WITH base AS (SELECT o_custkey AS ck,
      |    datediff('day', max(o_orderdate), DATE '1998-08-02')::BIGINT AS rec,
      |    count(*)::BIGINT AS freq,
      |    sum(round(o_totalprice*100)::BIGINT)::BIGINT AS mon
      |  FROM orders GROUP BY 1),
      |n AS (SELECT count(*)::BIGINT AS nt FROM base),
      |rv AS (SELECT rec AS v, count(*)::BIGINT AS cnt FROM base GROUP BY 1),
      |rq AS (SELECT v, (((sum(cnt) OVER (ORDER BY v) - cnt) * 5) // n.nt)::BIGINT AS q FROM rv, n),
      |fv AS (SELECT freq AS v, count(*)::BIGINT AS cnt FROM base GROUP BY 1),
      |fq AS (SELECT v, (((sum(cnt) OVER (ORDER BY v) - cnt) * 5) // n.nt)::BIGINT AS q FROM fv, n),
      |mv AS (SELECT mon AS v, count(*)::BIGINT AS cnt FROM base GROUP BY 1),
      |mq AS (SELECT v, (((sum(cnt) OVER (ORDER BY v) - cnt) * 5) // n.nt)::BIGINT AS q FROM mv, n)
      |SELECT rq.q AS r_q, fq.q AS f_q, mq.q AS m_q,
      |  count(*)::BIGINT AS n_cust, sum(base.mon)::BIGINT AS mon_cents_sum,
      |  sum(base.freq)::BIGINT AS n_orders
      |FROM base JOIN rq ON base.rec = rq.v
      |          JOIN fq ON base.freq = fq.v
      |          JOIN mq ON base.mon = mq.v
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // q70: linear multi-touch split; remainder to the most recent
    // click (c_ep DESC, click_id DESC) — per-purchase cents conserve
    "q70_attribution" -> raw"""
      |WITH c AS (SELECT event_id AS click_id, user_id, floor(epoch(ts))::BIGINT AS c_ep
      |           FROM events WHERE event_type = 'click'),
      |p AS (SELECT event_id AS purchase_id, user_id, floor(epoch(ts))::BIGINT AS p_ep,
      |        round(value*100)::BIGINT AS p_cents
      |      FROM events WHERE event_type = 'purchase'),
      |j AS (SELECT click_id, purchase_id, c_ep, p_cents
      |      FROM p JOIN c USING (user_id)
      |      WHERE c_ep <= p_ep AND p_ep - c_ep <= 86400),
      |r AS (SELECT *, count(*) OVER (PARTITION BY purchase_id)::BIGINT AS k,
      |        row_number() OVER (PARTITION BY purchase_id
      |          ORDER BY c_ep DESC, click_id DESC)::BIGINT AS rnk FROM j)
      |SELECT click_id, count(*)::BIGINT AS n_purchases,
      |  sum(p_cents // k + CASE WHEN rnk = 1 THEN p_cents % k ELSE 0 END)::BIGINT
      |    AS attr_cents
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    // q73: unique (cents DESC, orderkey) order key makes ranks
    // engine-deterministic; Spark must reproduce them through the
    // WindowGroupLimit-optimized plan
    "q73_group_topn" -> raw"""
      |WITH j AS (SELECT c_mktsegment, o_orderkey,
      |             round(o_totalprice*100)::BIGINT AS cents
      |           FROM orders JOIN customer ON o_custkey = c_custkey),
      |r AS (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
      |                  ORDER BY cents DESC, o_orderkey) AS rnk FROM j)
      |SELECT c_mktsegment, o_orderkey, cents, rnk::BIGINT AS rnk
      |FROM r WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin,
    // q71: the oracle states the aggregate from k directly — the
    // Spark side must reproduce it THROUGH the variant encoding
    // (parse_json → variant_get paths); n_bad_cast states the
    // try_variant_get null-on-cast contract as a constant 0
    "q71_variant" -> raw"""
      |WITH e AS (SELECT event_type,
      |             json_extract_string(props, '$$.k')::BIGINT AS k FROM events)
      |SELECT event_type, count(*) AS n,
      |       sum(k)::BIGINT AS sum_val,
      |       sum(CASE WHEN k % 3 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_arr,
      |       sum(CASE WHEN k % 3 = 1 THEN k + 1 ELSE NULL END)::BIGINT AS sum_arr1,
      |       sum(CASE WHEN k % 3 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_tag,
      |       0::BIGINT AS n_bad_cast
      |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    // q72: 3 unrolled damped iterations in e12 integer units; // is
    // floor-div ≡ Spark's truncating div on the non-negative operands
    // q75: the oracle recomputes the quarter-1 census straight from
    // orders — the Spark side must reproduce it THROUGH the pruned
    // partitioned scan, so a dropped directory diverges the hash
    "q75_dpp" -> raw"""
      |WITH o AS (SELECT (year(o_orderdate)*100 + month(o_orderdate)) AS m,
      |             o_totalprice FROM orders)
      |SELECT m::BIGINT AS o_month, count(*) AS n_orders,
      |       sum(round(o_totalprice*100)::BIGINT)::BIGINT AS revenue_cents
      |FROM o WHERE (m % 100 - 1) // 3 + 1 = 1
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q76: the oracle recomputes the dim⋈fact census exactly — the
    // Spark side must reproduce it THROUGH the bloom-pruned scan, so
    // the filter dropping a TRUE match diverges the hash (false
    // positives are killed by the real join on both engines)
    // q77: the identical correlated LATERAL — DuckDB decorrelates it
    // with the same algebra, and the o_orderkey tiebreak makes the
    // LIMIT 2 prefix a total order in both engines
    "q77_lateral" -> raw"""
      |SELECT c.c_custkey, t.o_orderkey, t.price_cents
      |FROM customer c,
      |LATERAL (SELECT o_orderkey,
      |                round(o_totalprice * 100)::BIGINT AS price_cents
      |         FROM orders o WHERE o.o_custkey = c.c_custkey
      |         ORDER BY price_cents DESC, o_orderkey LIMIT 2) t
      |ORDER BY 1, 3 DESC, 2""".stripMargin,
    "q76_bloom_join" -> raw"""
      |SELECT l.l_returnflag, count(*) AS n_items,
      |       sum(l.l_quantity)::BIGINT AS sum_qty,
      |       sum(round(l.l_extendedprice*100)::BIGINT)::BIGINT AS revenue_cents
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderstatus = 'P' AND o.o_orderpriority = '1-URGENT'
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q74: identical WITH RECURSIVE text modulo div spelling — the
    // planted parent(k) = k div 10 is strictly decreasing, so both
    // engines run the same finite recursion; all-integer surfaces
    "q74_hierarchy" -> raw"""
      |WITH RECURSIVE
      |c AS (SELECT c_custkey AS k, round(c_acctbal * 100)::BIGINT AS cents
      |      FROM customer),
      |h AS (
      |  SELECT k, k AS root, 0 AS depth, cents AS path_cents
      |  FROM c WHERE NOT EXISTS
      |    (SELECT 1 FROM c p WHERE p.k = c.k // 10 AND p.k <> c.k)
      |  UNION ALL
      |  SELECT c.k, h.root, h.depth + 1, h.path_cents + c.cents
      |  FROM c JOIN h ON c.k // 10 = h.k AND c.k <> h.k
      |)
      |SELECT depth::BIGINT AS depth, count(*)::BIGINT AS n_nodes,
      |  count(DISTINCT root)::BIGINT AS n_roots,
      |  sum(path_cents)::BIGINT AS sum_path_cents,
      |  min(k)::BIGINT AS min_key, max(k)::BIGINT AS max_key
      |FROM h GROUP BY depth ORDER BY depth""".stripMargin,
    "q72_pagerank" -> raw"""
      |WITH e AS (SELECT DISTINCT (doc_id % 97) % 37 AS src,
      |             CASE WHEN (doc_id*31 + 7) % 37 = (doc_id % 97) % 37
      |                  THEN ((doc_id*31 + 7) % 37 + 1) % 37
      |                  ELSE (doc_id*31 + 7) % 37 END AS dst
      |           FROM documents),
      |h AS (SELECT DISTINCT hid FROM (SELECT src AS hid FROM e
      |                                UNION SELECT dst FROM e)),
      |n AS (SELECT count(*)::BIGINT AS nh FROM h),
      |od AS (SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY 1),
      |r0 AS (SELECT hid, 1000000000000 // nh AS r FROM h CROSS JOIN n),
      |c1 AS (SELECT e.dst AS hid, sum((85*r0.r) // (100*od.outdeg)) AS cin
      |       FROM e JOIN od USING (src) JOIN r0 ON r0.hid = e.src GROUP BY 1),
      |r1 AS (SELECT h.hid, (15*1000000000000) // (100*nh) + coalesce(cin, 0) AS r
      |       FROM h CROSS JOIN n LEFT JOIN c1 ON c1.hid = h.hid),
      |c2 AS (SELECT e.dst AS hid, sum((85*r1.r) // (100*od.outdeg)) AS cin
      |       FROM e JOIN od USING (src) JOIN r1 ON r1.hid = e.src GROUP BY 1),
      |r2 AS (SELECT h.hid, (15*1000000000000) // (100*nh) + coalesce(cin, 0) AS r
      |       FROM h CROSS JOIN n LEFT JOIN c2 ON c2.hid = h.hid),
      |c3 AS (SELECT e.dst AS hid, sum((85*r2.r) // (100*od.outdeg)) AS cin
      |       FROM e JOIN od USING (src) JOIN r2 ON r2.hid = e.src GROUP BY 1),
      |r3 AS (SELECT h.hid, (15*1000000000000) // (100*nh) + coalesce(cin, 0) AS r
      |       FROM h CROSS JOIN n LEFT JOIN c3 ON c3.hid = h.hid),
      |ind AS (SELECT dst AS hid, count(*)::BIGINT AS in_deg FROM e GROUP BY 1)
      |SELECT r3.hid::BIGINT AS hid, r3.r::BIGINT AS rank_e12,
      |       coalesce(od.outdeg, 0)::BIGINT AS out_deg,
      |       coalesce(ind.in_deg, 0)::BIGINT AS in_deg
      |FROM r3 LEFT JOIN od ON od.src = r3.hid
      |        LEFT JOIN ind ON ind.hid = r3.hid
      |ORDER BY rank_e12 DESC, hid""".stripMargin,
    // q69: the ORACLE is the plain equi-join — the salted execution
    // must be row-identical to it, which is the whole point
    "q69_skew_join" -> raw"""
      |WITH f AS (SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 0
      |                       ELSE l_suppkey END AS sk,
      |    round(l_extendedprice*(1-l_discount)*100)::BIGINT AS cents
      |  FROM lineitem),
      |d AS (SELECT s_suppkey AS sk, s_nationkey AS nk FROM supplier
      |      UNION ALL SELECT 0, -1)
      |SELECT nk::BIGINT AS nation_key, sum(cents)::BIGINT AS revenue_cents,
      |  count(*)::BIGINT AS n_lines
      |FROM f JOIN d USING (sk) GROUP BY 1 ORDER BY 1""".stripMargin,
    // q68: cumulative line over value-collapsed revenue DESC; class
    // boundaries cross-multiplied; share via HUGEINT
    "q68_abc_classes" -> raw"""
      |WITH pr AS (SELECT l_partkey,
      |    sum(round(l_extendedprice*(1-l_discount)*100)::BIGINT)::BIGINT AS rev
      |  FROM lineitem GROUP BY 1),
      |v AS (SELECT rev, count(*)::BIGINT AS cnt,
      |        (rev * count(*))::BIGINT AS vsum FROM pr GROUP BY 1),
      |c AS (SELECT rev,
      |        sum(vsum) OVER (ORDER BY rev DESC)::BIGINT AS cum,
      |        sum(vsum) OVER ()::BIGINT AS tot FROM v),
      |k AS (SELECT rev, tot,
      |        CASE WHEN cum::HUGEINT*5 <= tot::HUGEINT*4 THEN 'A'
      |             WHEN cum::HUGEINT*20 <= tot::HUGEINT*19 THEN 'B' ELSE 'C' END AS abc FROM c)
      |SELECT abc, count(*)::BIGINT AS n_parts, sum(pr.rev)::BIGINT AS rev_cents,
      |  ((sum(pr.rev)::HUGEINT * 1000000) // max(tot))::BIGINT AS share_ppm
      |FROM pr JOIN k USING (rev) GROUP BY 1 ORDER BY 1""".stripMargin,
    // q67: the bounded-heap tie rule (lost_cents DESC, ck ASC) stated
    // as row_number; cents sums are exact doubles below 2^53 so the
    // heap's double score cannot reorder ties
    "q67_returned_topk" -> raw"""
      |WITH l AS (SELECT o_custkey AS ck,
      |    sum(round(l_extendedprice*(1-l_discount)*100)::BIGINT)::BIGINT AS lost_cents,
      |    count(*)::BIGINT AS n_lines
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R' GROUP BY 1),
      |r AS (SELECT ck, lost_cents, n_lines,
      |        row_number() OVER (ORDER BY lost_cents DESC, ck)::BIGINT AS rank FROM l)
      |SELECT rank, ck AS custkey, c_name, n_name AS nation, lost_cents, n_lines
      |FROM r JOIN customer ON ck = c_custkey
      |       JOIN nation ON c_nationkey = n_nationkey
      |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // q66: per-line cents rounding stated on both sides; only
    // cross-nation pairs survive
    "q66_bilateral_volume" -> raw"""
      |SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
      |  year(l_shipdate)::BIGINT AS ship_year,
      |  sum(round(l_extendedprice*(1-l_discount)*100)::BIGINT)::BIGINT AS revenue_cents,
      |  count(*)::BIGINT AS n_lines
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ns ON s_nationkey = ns.n_nationkey
      |JOIN nation nc ON c_nationkey = nc.n_nationkey
      |WHERE ns.n_name != nc.n_name
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // q65: gaps are differences of the per-customer sorted date
    // multiset — tie order cannot move the bucketed rollup
    "q65_interarrival" -> raw"""
      |WITH o AS (SELECT o_custkey AS ck, o_orderkey AS ok,
      |    datediff('day', DATE '1992-01-01', o_orderdate)::BIGINT AS d FROM orders),
      |g AS (SELECT d - lag(d) OVER (PARTITION BY ck ORDER BY d, ok) AS gap FROM o)
      |SELECT (gap // 30)::BIGINT AS bucket, count(*)::BIGINT AS n_gaps,
      |  min(gap)::BIGINT AS gap_min, max(gap)::BIGINT AS gap_max,
      |  sum(gap)::BIGINT AS gap_sum
      |FROM g WHERE gap IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,
    // q63: the global average never materializes — bal·n_pos > sum_pos
    // on both sides; dormancy is NOT EXISTS over recent orders
    "q63_global_customers" -> raw"""
      |WITH c AS (SELECT c_custkey, c_nationkey,
      |             round(c_acctbal*100)::BIGINT AS bal FROM customer),
      |g AS (SELECT sum(bal)::BIGINT AS sum_pos, count(*)::BIGINT AS n_pos
      |      FROM c WHERE bal > 0),
      |k AS (SELECT c.c_custkey, c.c_nationkey, c.bal,
      |        CASE WHEN EXISTS (SELECT 1 FROM orders o
      |                          WHERE o.o_custkey = c.c_custkey
      |                            AND o.o_orderdate >= DATE '1998-01-01'
      |                            AND o.o_orderkey % 2 != 0)
      |             THEN 0 ELSE 1 END AS dormant
      |      FROM c, g WHERE c.bal * g.n_pos > g.sum_pos)
      |SELECT n_name AS nation, count(*)::BIGINT AS n_above,
      |  sum(dormant)::BIGINT AS n_dormant, sum(bal)::BIGINT AS bal_cents_sum
      |FROM k JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q59_period_balance" -> raw"""
      |WITH e AS (SELECT user_id, (year(ts)*12 + month(ts))::BIGINT AS mo,
      |             floor(epoch(ts))::BIGINT AS t, event_id,
      |             round(value*100)::BIGINT AS cents FROM events),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, mo
      |        ORDER BY t DESC, event_id DESC) AS rn FROM e)
      |SELECT mo, count(*)::BIGINT AS n_users,
      |  sum(cents)::BIGINT AS sum_end_cents
      |FROM r WHERE rn = 1 GROUP BY mo ORDER BY mo""".stripMargin,
    // q58: same lag/lead ledger; churn clamped to the observed
    // horizon; full outer keeps churn-only months
    "q58_growth_accounting" -> raw"""
      |WITH am AS (SELECT DISTINCT user_id,
      |              (year(ts)*12 + month(ts))::BIGINT AS mo FROM events),
      |w AS (SELECT user_id, mo,
      |        lag(mo) OVER (PARTITION BY user_id ORDER BY mo) AS pmo,
      |        lead(mo) OVER (PARTITION BY user_id ORDER BY mo) AS nmo FROM am),
      |mx AS (SELECT max(mo) AS mxmo FROM am),
      |st AS (SELECT mo,
      |    count(*) FILTER (WHERE pmo IS NULL)::BIGINT AS n_new,
      |    count(*) FILTER (WHERE pmo = mo - 1)::BIGINT AS n_retained,
      |    count(*) FILTER (WHERE pmo IS NOT NULL AND pmo < mo - 1)::BIGINT
      |      AS n_resurrected,
      |    count(*)::BIGINT AS n_active
      |  FROM w GROUP BY mo),
      |ch AS (SELECT w.mo + 1 AS mo, count(*)::BIGINT AS n_churned
      |       FROM w, mx
      |       WHERE (nmo IS NULL OR nmo > mo + 1) AND mo + 1 <= mx.mxmo
      |       GROUP BY 1)
      |SELECT coalesce(st.mo, ch.mo) AS mo,
      |  coalesce(n_new, 0)::BIGINT AS n_new,
      |  coalesce(n_retained, 0)::BIGINT AS n_retained,
      |  coalesce(n_resurrected, 0)::BIGINT AS n_resurrected,
      |  coalesce(n_churned, 0)::BIGINT AS n_churned,
      |  coalesce(n_active, 0)::BIGINT AS n_active
      |FROM st FULL OUTER JOIN ch ON st.mo = ch.mo
      |ORDER BY 1""".stripMargin,
    // q57: identical sweep stated in SQL windows; tied (st,en) rows
    // are interchangeable so tie order cannot move the result
    "q57_interval_union" -> raw"""
      |WITH iv AS (SELECT l_suppkey AS k,
      |    date_diff('day', DATE '1992-01-01', l_shipdate)::BIGINT AS st,
      |    (date_diff('day', DATE '1992-01-01', l_shipdate)
      |       + l_quantity)::BIGINT AS en
      |  FROM lineitem),
      |m AS (SELECT k, st, en,
      |    max(en) OVER (PARTITION BY k ORDER BY st, en
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mp FROM iv),
      |mk AS (SELECT k, st, en,
      |    CASE WHEN mp IS NULL OR st > mp THEN 1 ELSE 0 END AS ni FROM m),
      |il AS (SELECT k, st, en,
      |    sum(ni) OVER (PARTITION BY k ORDER BY st, en
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM mk),
      |g AS (SELECT k, island, min(st) AS ist, max(en) AS ien,
      |        count(*)::BIGINT AS n FROM il GROUP BY 1, 2)
      |SELECT k AS l_suppkey, sum(n)::BIGINT AS n_intervals,
      |  count(*)::BIGINT AS n_islands,
      |  sum(ien - ist)::BIGINT AS covered_days
      |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q53_transitions" -> raw"""
      |WITH e AS (SELECT user_id, event_id, event_type,
      |             floor(epoch(ts))::BIGINT AS t FROM events),
      |h AS (SELECT event_type AS from_type,
      |        lead(event_type) OVER (PARTITION BY user_id
      |          ORDER BY t, event_id) AS to_type
      |      FROM e),
      |m AS (SELECT from_type, to_type, count(*) AS n_trans FROM h
      |      WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |f AS (SELECT from_type, sum(n_trans)::BIGINT AS n_from FROM m GROUP BY 1)
      |SELECT m.from_type, m.to_type, m.n_trans, f.n_from,
      |       ((m.n_trans * 1000) // f.n_from)::BIGINT AS trans_pm
      |FROM m JOIN f USING (from_type)
      |ORDER BY m.from_type, m.to_type""".stripMargin,
    // q52: held-interval weights — lead over (t, event_id) per user,
    // last event holds nothing; integer cents·seconds numerators
    "q52_twap" -> raw"""
      |WITH e AS (SELECT user_id, event_id, event_type,
      |             floor(epoch(ts))::BIGINT AS t,
      |             round(value*100)::BIGINT AS cents
      |           FROM events),
      |h AS (SELECT *, lead(t) OVER (PARTITION BY user_id
      |        ORDER BY t, event_id) AS t_next FROM e)
      |SELECT event_type, count(*) AS n_held,
      |  sum(cents * (t_next - t))::BIGINT AS twap_num,
      |  sum(t_next - t)::BIGINT AS twap_den,
      |  (CASE WHEN sum(t_next - t) = 0 THEN 0
      |        ELSE sum(cents * (t_next - t)) // sum(t_next - t) END)::BIGINT AS twap_cents
      |FROM h WHERE t_next IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q45_rank_dist" -> raw"""
      |WITH c AS (SELECT c_custkey, c_nationkey,
      |             round(c_acctbal*100)::BIGINT AS bal_cents FROM customer)
      |SELECT c_custkey, c_nationkey, bal_cents,
      |  (count(*) OVER (PARTITION BY c_nationkey))::BIGINT AS n_part,
      |  round(percent_rank() OVER (PARTITION BY c_nationkey
      |          ORDER BY bal_cents, c_custkey)
      |        * (count(*) OVER (PARTITION BY c_nationkey) - 1))::BIGINT AS pr_k,
      |  round(cume_dist() OVER (PARTITION BY c_nationkey
      |          ORDER BY bal_cents, c_custkey)
      |        * count(*) OVER (PARTITION BY c_nationkey))::BIGINT AS cd_k
      |FROM c ORDER BY c_custkey""".stripMargin,
    // q44: the same three-valued NOT IN in DuckDB — unguarded must be 0
    "q44_not_in_null" -> raw"""
      |SELECT 'guarded' AS variant, count(*) AS n FROM customer
      |WHERE c_custkey NOT IN
      |  (SELECT CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_custkey END
      |   FROM orders WHERE year(o_orderdate) = 1996
      |     AND (CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_custkey END) IS NOT NULL)
      |UNION ALL
      |SELECT 'unguarded', count(*) FROM customer
      |WHERE c_custkey NOT IN
      |  (SELECT CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_custkey END
      |   FROM orders WHERE year(o_orderdate) = 1996)
      |ORDER BY variant""".stripMargin,
    // q43: the full CUBE lattice, null keys to '(all)' as in q10
    "q43_cube" -> raw"""
      |SELECT coalesce(r_name, '(all)') AS region,
      |       coalesce(o_orderpriority, '(all)') AS priority,
      |       count(*) AS n_orders,
      |       sum(round(o_totalprice*100)::BIGINT)::BIGINT AS total_cents
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY CUBE (r_name, o_orderpriority)
      |ORDER BY region, priority""".stripMargin,
    // q42: one row per (table, column) — counts recomputed per column
    "q42_analyze_stats" -> raw"""
      |WITH s AS (
      |  SELECT 'orders' AS t, 'o_orderkey' AS c, count(*) AS n,
      |         count(*) - count(o_orderkey) AS z, count(DISTINCT o_orderkey) AS d FROM orders
      |  UNION ALL SELECT 'orders', 'o_custkey', count(*), count(*) - count(o_custkey),
      |         count(DISTINCT o_custkey) FROM orders
      |  UNION ALL SELECT 'orders', 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
      |         count(DISTINCT o_orderstatus) FROM orders
      |  UNION ALL SELECT 'orders', 'o_totalprice', count(*), count(*) - count(o_totalprice),
      |         count(DISTINCT o_totalprice) FROM orders
      |  UNION ALL SELECT 'orders', 'o_orderdate', count(*), count(*) - count(o_orderdate),
      |         count(DISTINCT o_orderdate) FROM orders
      |  UNION ALL SELECT 'orders', 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
      |         count(DISTINCT o_orderpriority) FROM orders
      |  UNION ALL SELECT 'events', 'event_id', count(*), count(*) - count(event_id),
      |         count(DISTINCT event_id) FROM events
      |  UNION ALL SELECT 'events', 'ts', count(*), count(*) - count(ts),
      |         count(DISTINCT ts) FROM events
      |  UNION ALL SELECT 'events', 'user_id', count(*), count(*) - count(user_id),
      |         count(DISTINCT user_id) FROM events
      |  UNION ALL SELECT 'events', 'event_type', count(*), count(*) - count(event_type),
      |         count(DISTINCT event_type) FROM events
      |  UNION ALL SELECT 'events', 'value', count(*), count(*) - count(value),
      |         count(DISTINCT value) FROM events
      |  UNION ALL SELECT 'events', 'props', count(*), count(*) - count(props),
      |         count(DISTINCT props) FROM events)
      |SELECT t AS table_name, c AS column_name, n::BIGINT AS n_rows,
      |       z::BIGINT AS n_nulls, d::BIGINT AS n_distinct
      |FROM s ORDER BY table_name, column_name""".stripMargin,
    // q41: q13's manual construction with SPARK's merge rule (a new
    // session starts when the gap is >= 30 min in integer MICROS —
    // session_window merges on strict overlap), window.end = last+gap
    "q41_session_window" -> raw"""
      |WITH x AS (
      |  SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |  FROM events),
      |y AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
      |                     THEN 1 ELSE 0 END AS ns FROM x),
      |z AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                              ROWS UNBOUNDED PRECEDING) AS sid FROM y)
      |SELECT user_id, floor(epoch(min(ts)))::BIGINT AS start_epoch,
      |       floor(epoch(max(ts)))::BIGINT + 1800 AS end_epoch,
      |       count(*) AS n_events,
      |       sum(round(value*100)::BIGINT)::BIGINT AS value_cents
      |FROM z GROUP BY user_id, sid ORDER BY user_id, start_epoch""".stripMargin,
    // q40: the same RANGE frame over integer epoch seconds — peers
    // (same customer, same date) share a frame, no tiebreaker needed
    "q40_range_frame" -> raw"""
      |WITH o AS (SELECT o_orderkey, o_custkey,
      |             floor(epoch(o_orderdate))::BIGINT AS t,
      |             round(o_totalprice*100)::BIGINT AS c FROM orders)
      |SELECT o_orderkey, o_custkey, t AS t_epoch,
      |  sum(c) OVER (PARTITION BY o_custkey ORDER BY t
      |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)::BIGINT AS spend_30d_cents,
      |  count(*) OVER (PARTITION BY o_custkey ORDER BY t
      |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)::BIGINT AS n_30d
      |FROM o ORDER BY o_orderkey""".stripMargin,
    // q39: the same bag operators in DuckDB, folded to counts
    "q39_setops_all" -> raw"""
      |WITH a AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997),
      |b AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
      |ia AS (SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b),
      |ea AS (SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b)
      |SELECT 'intersect_all' AS op, o_custkey AS custkey, count(*) AS n
      |FROM ia GROUP BY 2
      |UNION ALL
      |SELECT 'except_all', o_custkey, count(*) FROM ea GROUP BY 2
      |ORDER BY 1, 2""".stripMargin,
    // q38: the oracle is the FULL recompute over (base ∖ deletes) ∪
    // inserts — the maintained mv must equal it exactly
    "q38_delta_agg" -> raw"""
      |WITH base AS (SELECT * FROM orders WHERE o_orderdate < DATE '1997-01-01'),
      |kept AS (SELECT * FROM base WHERE o_orderkey % 50 <> 0),
      |ins AS (SELECT * FROM orders WHERE o_orderdate >= DATE '1997-01-01'),
      |u AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
      |SELECT o_orderpriority, count(*) AS n_orders,
      |       sum(round(o_totalprice*100)::BIGINT)::BIGINT AS total_cents
      |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    // q36: sweep-line concurrency — the oracle is the naive global
    // running window over per-second nets; the engine's sharded
    // two-pass prefix must agree exactly
    "q36_concurrency" -> raw"""
      |WITH x AS (
      |  SELECT user_id, event_id, ts,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |y AS (SELECT *, CASE WHEN prev_ts IS NULL
      |                       OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800
      |                     THEN 1 ELSE 0 END AS new_session FROM x),
      |z AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                       ROWS UNBOUNDED PRECEDING) AS session_id FROM y),
      |sess AS (SELECT user_id, session_id,
      |                floor(epoch(min(ts)))::BIGINT AS st,
      |                floor(epoch(max(ts)))::BIGINT AS en
      |         FROM z GROUP BY 1, 2),
      |d AS (SELECT st AS t, 1 AS dd FROM sess
      |      UNION ALL SELECT en + 1, -1 FROM sess),
      |n AS (SELECT t, sum(dd)::BIGINT AS net FROM d GROUP BY 1),
      |r AS (SELECT t, sum(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)::BIGINT AS conc,
      |             lead(t) OVER (ORDER BY t) AS t_next
      |      FROM n),
      |iv AS (SELECT conc, t // 3600 AS h0,
      |              (coalesce(t_next, t + 1) - 1) // 3600 AS h1 FROM r),
      |c AS (SELECT conc, h0, unnest(generate_series(h0, h1)) AS hour FROM iv)
      |SELECT hour, max(conc)::BIGINT AS peak_concurrent,
      |       sum(CASE WHEN hour = h0 THEN 1 ELSE 0 END)::BIGINT AS n_changes
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // q37: cohort retention — integer week buckets (floor-epoch div
    // 604800 on both engines), cells from already-distinct (user,
    // week) pairs so count(*) ≡ distinct users, per-mille integer rate
    "q37_retention" -> raw"""
      |WITH uw AS (SELECT DISTINCT user_id,
      |              floor(epoch(ts))::BIGINT // 604800 AS week FROM events),
      |f AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1),
      |cells AS (SELECT f.cohort_week, uw.week - f.cohort_week AS week_offset,
      |                 count(*) AS n_active
      |          FROM uw JOIN f USING (user_id) GROUP BY 1, 2),
      |sz AS (SELECT cohort_week, n_active AS cohort_size FROM cells WHERE week_offset = 0)
      |SELECT c.cohort_week, c.week_offset, c.n_active, s.cohort_size,
      |       (c.n_active * 1000) // s.cohort_size AS retained_pm
      |FROM cells c JOIN sz s USING (cohort_week)
      |ORDER BY 1, 2""".stripMargin,
    "q33_asof_nearest" -> raw"""
      |WITH ord AS (SELECT o_custkey AS uid, o_orderdate AS t, max(o_orderkey) AS o_orderkey
      |             FROM orders GROUP BY 1, 2),
      |e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |cand AS (
      |  SELECT e.event_id, o.o_orderkey,
      |         row_number() OVER (PARTITION BY e.event_id
      |           ORDER BY abs(epoch_us(o.t::TIMESTAMP) - epoch_us(e.ts)),
      |                    CASE WHEN o.t::TIMESTAMP <= e.ts THEN 0 ELSE 1 END) AS rn
      |  FROM e JOIN ord o ON o.uid = e.user_id)
      |SELECT e.event_id, e.user_id, floor(epoch(e.ts))::BIGINT AS ts_epoch,
      |       c.o_orderkey AS nearest_orderkey
      |FROM e LEFT JOIN cand c ON c.event_id = e.event_id AND c.rn = 1
      |ORDER BY e.event_id""".stripMargin,
    "q15_json" -> raw"""
      |SELECT event_type, count(*) AS n,
      |       sum(json_extract_string(props, '$$.k')::BIGINT)::BIGINT AS sum_k,
      |       max(json_extract_string(props, '$$.k')::BIGINT) AS max_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q17_quantiles" -> raw"""
      |WITH c AS (SELECT o_orderpriority, round(o_totalprice*100)::BIGINT AS c FROM orders)
      |SELECT o_orderpriority,
      |       quantile_cont(c, 0.25) AS q25_cents,
      |       quantile_cont(c, 0.5)  AS q50_cents,
      |       quantile_cont(c, 0.75) AS q75_cents,
      |       count(*) AS n_orders
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_correlated" -> raw"""
      |SELECT sum(round(l_extendedprice*100)::BIGINT)::BIGINT AS below_avg_revenue_cents,
      |       count(*) AS n_rows
      |FROM lineitem l
      |WHERE l_quantity < 0.2 * (SELECT sum(l2.l_quantity)/count(*) FROM lineitem l2
      |                          WHERE l2.l_partkey = l.l_partkey)""".stripMargin,
    "q19_setops" -> raw"""
      |WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      |recent AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
      |           WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'),
      |both_s AS (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM recent),
      |only_b AS (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM recent)
      |SELECT (SELECT count(*) FROM both_s) AS n_intersect,
      |       (SELECT min(c_custkey) FROM both_s) AS min_common,
      |       (SELECT max(c_custkey) FROM both_s) AS max_common,
      |       (SELECT count(*) FROM only_b) AS n_building_only""".stripMargin,
    "q20_range_join" -> raw"""
      |WITH bands AS (SELECT n_name, n_nationkey*(20.0::DOUBLE) AS lo,
      |                      n_nationkey*(20.0::DOUBLE) + (19.99::DOUBLE) AS hi
      |               FROM nation)
      |SELECT n_name, count(*) AS n_events, sum(round(value*100)::BIGINT)::BIGINT AS value_cents
      |FROM events JOIN bands ON value >= lo AND value <= hi
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q21_outer" -> raw"""
      |WITH recent AS (
      |  SELECT o_custkey, count(*) AS n,
      |         sum(round(o_totalprice*100)::BIGINT)::BIGINT AS rc
      |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00' GROUP BY 1)
      |SELECT c_custkey, c_mktsegment, o_custkey IS NOT NULL AS has_recent,
      |       coalesce(n, 0)::BIGINT AS n_recent_orders,
      |       coalesce(rc, 0)::BIGINT AS recent_cents
      |FROM customer LEFT JOIN recent ON c_custkey = o_custkey
      |ORDER BY c_custkey""".stripMargin,
    "q22_fullouter" -> raw"""
      |WITH od AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS d_o, count(*) AS n_orders,
      |              sum(round(o_totalprice*100)::BIGINT)::BIGINT AS oc
      |            FROM orders GROUP BY 1),
      |ed AS (SELECT strftime(ts, '%Y-%m-%d') AS d_e, count(*) AS n_events,
      |         sum(round(value*100)::BIGINT)::BIGINT AS ec
      |       FROM events GROUP BY 1)
      |SELECT coalesce(d_o, d_e) AS day,
      |       d_o IS NOT NULL AS has_orders, d_e IS NOT NULL AS has_events,
      |       coalesce(n_orders, 0)::BIGINT AS n_orders,
      |       coalesce(oc, 0)::BIGINT AS order_cents,
      |       coalesce(n_events, 0)::BIGINT AS n_events,
      |       coalesce(ec, 0)::BIGINT AS event_cents
      |FROM od FULL OUTER JOIN ed ON d_o = d_e
      |ORDER BY day""".stripMargin,
    "q26_dq_audit" -> raw"""
      |WITH li AS (SELECT count(*) AS n_rows,
      |    sum(CASE WHEN coalesce(l_quantity BETWEEN 1 AND 50, FALSE) THEN 0 ELSE 1 END)::BIGINT AS quantity_range,
      |    sum(CASE WHEN coalesce(l_extendedprice > 0, FALSE) THEN 0 ELSE 1 END)::BIGINT AS price_positive,
      |    sum(CASE WHEN coalesce(l_discount BETWEEN 0.0 AND 0.1, FALSE) THEN 0 ELSE 1 END)::BIGINT AS discount_domain,
      |    sum(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END)::BIGINT AS shipdate_not_null
      |  FROM lineitem),
      |o AS (SELECT count(*) AS n_rows,
      |    sum(CASE WHEN coalesce(o_totalprice > 0, FALSE) THEN 0 ELSE 1 END)::BIGINT AS totalprice_positive,
      |    sum(CASE WHEN coalesce(o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'), FALSE) THEN 0 ELSE 1 END)::BIGINT AS priority_domain
      |  FROM orders),
      |fk1 AS (SELECT (SELECT count(*) FROM orders o1 WHERE NOT EXISTS
      |                 (SELECT 1 FROM customer WHERE c_custkey = o1.o_custkey))::BIGINT AS n_violations,
      |               (SELECT count(*) FROM orders) AS n_rows),
      |fk2 AS (SELECT (SELECT count(*) FROM customer c1 WHERE NOT EXISTS
      |                 (SELECT 1 FROM nation WHERE n_nationkey = c1.c_nationkey))::BIGINT AS n_violations,
      |               (SELECT count(*) FROM customer) AS n_rows),
      |u AS (
      |  SELECT 'lineitem' AS tbl, 'quantity_range' AS "check", quantity_range AS n_violations, n_rows FROM li
      |  UNION ALL SELECT 'lineitem', 'price_positive', price_positive, n_rows FROM li
      |  UNION ALL SELECT 'lineitem', 'discount_domain', discount_domain, n_rows FROM li
      |  UNION ALL SELECT 'lineitem', 'shipdate_not_null', shipdate_not_null, n_rows FROM li
      |  UNION ALL SELECT 'orders', 'totalprice_positive', totalprice_positive, n_rows FROM o
      |  UNION ALL SELECT 'orders', 'priority_domain', priority_domain, n_rows FROM o
      |  UNION ALL SELECT 'orders', 'custkey_fk', n_violations, n_rows FROM fk1
      |  UNION ALL SELECT 'customer', 'nationkey_fk', n_violations, n_rows FROM fk2)
      |SELECT tbl, "check", n_violations, n_rows, n_violations = 0 AS pass
      |FROM u ORDER BY tbl, "check"""".stripMargin,
    "q23_merge" -> raw"""
      |WITH snap AS (SELECT c_custkey, c_mktsegment,
      |                     round(c_acctbal*100)::BIGINT AS cents FROM customer),
      |chg AS (
      |  SELECT c_custkey AS k, 'D' AS op, NULL::BIGINT AS new_cents
      |  FROM customer WHERE c_custkey%17 = 0
      |  UNION ALL
      |  SELECT c_custkey, 'U', (c_custkey*7)::BIGINT
      |  FROM customer WHERE c_custkey%10 = 0 AND c_custkey%17 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 10000000, 'I', ((c_custkey%100000)*3)::BIGINT
      |  FROM customer WHERE c_custkey%23 = 0)
      |SELECT coalesce(c_custkey, k) AS custkey,
      |       coalesce(c_mktsegment, 'NEW') AS segment,
      |       CASE WHEN op IN ('U','I') THEN new_cents ELSE cents END AS acctbal_cents,
      |       CASE WHEN op = 'U' THEN 'updated' WHEN op = 'I' THEN 'inserted'
      |            ELSE 'kept' END AS origin
      |FROM snap FULL OUTER JOIN chg ON c_custkey = k
      |WHERE op IS NULL OR op <> 'D'
      |ORDER BY custkey""".stripMargin,
    "q24_grouping_sets" -> raw"""
      |SELECT coalesce(r_name, '(all)') AS region, coalesce(n_name, '(all)') AS nation,
      |       count(*) AS n_customers, sum(round(c_acctbal*100)::BIGINT)::BIGINT AS acctbal_cents
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |     JOIN region ON n_regionkey = r_regionkey
      |GROUP BY GROUPING SETS ((r_name, n_name), (r_name), (n_name), ())
      |ORDER BY region, nation""".stripMargin,
    "q27_pivot" -> raw"""
      |SELECT year(o_orderdate)::INT AS yr,
      |  coalesce(sum(CASE WHEN o_orderpriority = '1-URGENT'
      |               THEN round(o_totalprice*100)::BIGINT END), 0)::BIGINT AS urgent_cents,
      |  coalesce(sum(CASE WHEN o_orderpriority = '2-HIGH'
      |               THEN round(o_totalprice*100)::BIGINT END), 0)::BIGINT AS high_cents,
      |  coalesce(sum(CASE WHEN o_orderpriority = '3-MEDIUM'
      |               THEN round(o_totalprice*100)::BIGINT END), 0)::BIGINT AS medium_cents,
      |  coalesce(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
      |               THEN round(o_totalprice*100)::BIGINT END), 0)::BIGINT AS notspec_cents,
      |  coalesce(sum(CASE WHEN o_orderpriority = '5-LOW'
      |               THEN round(o_totalprice*100)::BIGINT END), 0)::BIGINT AS low_cents
      |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,
    "q28_gapfill" -> raw"""
      |WITH h AS (SELECT floor(epoch(date_trunc('hour', ts)))::BIGINT AS hour_epoch,
      |                  event_type, count(*) AS n_events
      |           FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type AS et, min(hour_epoch) AS lo, max(hour_epoch) AS hi
      |      FROM h GROUP BY 1),
      |spine AS (SELECT et, unnest(range(lo, hi + 3600, 3600)) AS hour_epoch FROM r)
      |SELECT s.hour_epoch, s.et AS event_type,
      |       coalesce(h.n_events, 0)::BIGINT AS n_events,
      |       h.n_events IS NULL AS filled
      |FROM spine s LEFT JOIN h ON s.et = h.event_type AND s.hour_epoch = h.hour_epoch
      |ORDER BY event_type, s.hour_epoch""".stripMargin,
    "t1_token_count" -> raw"""
      |SELECT doc_id,
      |  len(string_split($Nrm, ' '))::INT AS n_words,
      |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))::INT AS n_tokens
      |FROM documents ORDER BY doc_id""".stripMargin,
    "t2_quality" -> raw"""
      |WITH d AS (SELECT doc_id, $Nrm AS nrm, string_split($Nrm, ' ') AS w FROM documents)
      |SELECT doc_id, length(nrm)::INT AS n_chars_norm, len(w)::INT AS n_words,
      |  floor((length(nrm) - (len(w) - 1))::DOUBLE / len(w) * 1e6 + 0.5)::BIGINT AS avg_word_len_e6,
      |  floor(len([x for x in w if list_contains(['the','a','and','of','to','in'], x)])::DOUBLE
      |        / len(w) * 1e6 + 0.5)::BIGINT AS stopword_ratio_e6,
      |  floor(len(list_distinct(w))::DOUBLE / len(w) * 1e6 + 0.5)::BIGINT AS type_token_ratio_e6
      |FROM d ORDER BY doc_id""".stripMargin,
    "t3_langid" -> raw"""
      |WITH d AS (SELECT doc_id, lang, string_split($Nrm, ' ') AS w FROM documents),
      |sc AS (SELECT doc_id, lang,
      |  len([x for x in w if list_contains(['window','group','merge'], x)])::INT AS s_de,
      |  len([x for x in w if list_contains(['the','data','query'], x)])::INT AS s_en,
      |  len([x for x in w if list_contains(['table','row','scan'], x)])::INT AS s_es,
      |  len([x for x in w if list_contains(['join','filter','sort'], x)])::INT AS s_fr,
      |  len([x for x in w if list_contains(['spark','batch','stream'], x)])::INT AS s_zh
      |  FROM d),
      |p AS (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS g FROM sc)
      |SELECT doc_id, lang, s_de, s_en, s_es, s_fr, s_zh,
      |  CASE WHEN s_de = g THEN 'de' WHEN s_en = g THEN 'en' WHEN s_es = g THEN 'es'
      |       WHEN s_fr = g THEN 'fr' ELSE 'zh' END AS pred_lang,
      |  (CASE WHEN s_de = g THEN 'de' WHEN s_en = g THEN 'en' WHEN s_es = g THEN 'es'
      |        WHEN s_fr = g THEN 'fr' ELSE 'zh' END = lang) AS correct
      |FROM p ORDER BY doc_id""".stripMargin,
    "t4_fingerprint" -> raw"""
      |SELECT doc_id, md5($Nrm) AS fp_md5,
      |  list_reduce([strpos('0123456789abcdef', substr(md5($Nrm), i, 1)) - 1
      |               for i in range(1, 16)], (a, b) -> a*16 + b)::BIGINT AS fp64
      |FROM documents ORDER BY doc_id""".stripMargin,
    "q29_unpivot" -> raw"""
      |WITH a AS (SELECT l_returnflag,
      |  sum(l_quantity)::BIGINT AS qty_sum,
      |  sum(round(l_extendedprice*100)::BIGINT)::BIGINT AS extprice_cents,
      |  sum(round(l_extendedprice*(1-l_discount)*100)::BIGINT)::BIGINT AS disc_cents
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, 'qty_sum' AS metric, qty_sum AS value FROM a
      |UNION ALL SELECT l_returnflag, 'extprice_cents', extprice_cents FROM a
      |UNION ALL SELECT l_returnflag, 'disc_cents', disc_cents FROM a
      |ORDER BY l_returnflag, metric""".stripMargin,
    "q30_sliding" -> raw"""
      |SELECT l_suppkey, l_orderkey, l_linenumber,
      |  l_quantity::BIGINT AS qty,
      |  CAST(sum(l_quantity::BIGINT) OVER (
      |    PARTITION BY l_suppkey
      |    ORDER BY l_orderkey, l_linenumber, l_quantity::BIGINT
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS qty_4row
      |FROM lineitem WHERE l_suppkey < 20
      |ORDER BY l_suppkey, l_orderkey, l_linenumber, qty, qty_4row""".stripMargin,
    "q31_ntile" -> raw"""
      |SELECT c_custkey, c_nationkey,
      |  round(c_acctbal*100)::BIGINT AS acctbal_cents,
      |  CAST(ntile(4) OVER (
      |    PARTITION BY c_nationkey
      |    ORDER BY round(c_acctbal*100)::BIGINT DESC, c_custkey) AS INTEGER) AS quartile
      |FROM customer
      |ORDER BY c_nationkey, quartile, c_custkey""".stripMargin,
    "t6_tfidf" -> raw"""
      |WITH w AS (SELECT doc_id, unnest(string_split($Nrm, ' ')) AS w FROM documents),
      |tf AS (SELECT doc_id, w, count(*) AS tf FROM w GROUP BY 1, 2),
      |df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*)::DOUBLE AS n FROM documents),
      |s AS (SELECT tf.doc_id, tf.w,
      |        tf.tf::DOUBLE * (n.n - df.df + 0.5) / (df.df::DOUBLE + 0.5) AS score
      |      FROM tf JOIN df USING (w) CROSS JOIN n),
      |r AS (SELECT doc_id, w, score,
      |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rnk
      |      FROM s)
      |SELECT doc_id, rnk::INT AS rank, w AS term,
      |  floor(score * 1e6 + 0.5)::BIGINT AS score_e6
      |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "t5_top_terms" -> raw"""
      |WITH d AS (SELECT doc_id, lang, unnest(list_distinct(string_split($Nrm, ' '))) AS w
      |           FROM documents),
      |f AS (SELECT lang, w, count(*) AS df FROM d GROUP BY 1, 2),
      |r AS (SELECT lang, w, df,
      |        row_number() OVER (PARTITION BY lang ORDER BY df DESC, w) AS rnk
      |      FROM f)
      |SELECT lang, rnk::INT AS rank, w AS term, df::BIGINT AS doc_freq
      |FROM r WHERE rnk <= 10 ORDER BY lang, rnk""".stripMargin,
    "d3_simhash" -> raw"""
      |WITH d AS (SELECT doc_id, list_distinct(string_split($Nrm, ' ')) AS dw FROM documents),
      |h AS (SELECT doc_id, len(dw) AS n,
      |  [list_reduce([strpos('0123456789abcdef', substr(md5(x), i, 1)) - 1
      |                for i in range(1, 9)], (a, b) -> a*16 + b) for x in dw] AS his,
      |  [list_reduce([strpos('0123456789abcdef', substr(md5(x), i, 1)) - 1
      |                for i in range(9, 17)], (a, b) -> a*16 + b) for x in dw] AS los
      |  FROM d),
      |s AS (SELECT doc_id,
      |  list_sum([CASE WHEN 2*len([x for x in his if (x >> i) & 1 = 1]) > n
      |                 THEN (1::BIGINT << i) ELSE 0 END for i in range(0, 32)])::BIGINT AS hi,
      |  list_sum([CASE WHEN 2*len([x for x in los if (x >> i) & 1 = 1]) > n
      |                 THEN (1::BIGINT << i) ELSE 0 END for i in range(0, 32)])::BIGINT AS lo
      |  FROM h)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  (bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)))::INT AS hamming
      |FROM s a JOIN s b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
      |ORDER BY id_a, id_b""".stripMargin,
    // m12: health is a pure function of the planted beheading rule —
    // the census recomputes from documents alone
    "m12_decode_audit" -> raw"""
      |SELECT m AS modality, count(*) AS n_total,
      |  count(*) FILTER (WHERE doc_id % 13 != 5) AS n_ok,
      |  count(*) FILTER (WHERE doc_id % 13 = 5) AS n_corrupt,
      |  (sum(doc_id) FILTER (WHERE doc_id % 13 = 5))::BIGINT AS sum_corrupt_ids
      |FROM documents, unnest(['image', 'audio', 'video']) AS t(m)
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    // m11: the m3 fixture formula, folded to |sample| stats — all
    // divisions non-negative so // ≡ the JVM's truncating /
    "m11_clipping_audit" -> raw"""
      |WITH d AS (SELECT doc_id, (doc_id % 1200 + 400)::INT AS n FROM documents),
      |p AS (SELECT doc_id, n,
      |  [abs((doc_id * 131 + i * 17) % 65536 - 32768) for i in range(0, n)] AS ab
      |  FROM d),
      |h AS (SELECT doc_id, n, list_max(ab)::INT AS peak,
      |        len(list_filter(ab, x -> x >= 32700))::BIGINT AS n_clipped,
      |        list_sum(ab)::BIGINT AS sum_abs FROM p)
      |SELECT doc_id, n AS n_samples, peak, n_clipped, sum_abs,
      |  (sum_abs * 1000 // n)::BIGINT AS mean_abs_x1000,
      |  ((32768 - peak) * 1000 // 32768)::BIGINT AS headroom_pm,
      |  (n_clipped * 1000 // n)::BIGINT AS clip_pm
      |FROM h ORDER BY doc_id""".stripMargin,
    "m3_audio_manifest" -> raw"""
      |WITH d AS (SELECT doc_id, (doc_id % 1200 + 400)::INT AS n FROM documents),
      |p AS (SELECT doc_id, n,
      |  [(doc_id * 131 + i * 17) % 65536 for i in range(0, n)] AS sm FROM d),
      |h AS (SELECT doc_id, n,
      |  list_reduce(list_prepend(1125899906842597::HUGEINT,
      |    [((x + 32768) % 65536)::HUGEINT for x in sm]),
      |    (acc, c) -> (acc * 31 + c) % 18446744073709551616::HUGEINT) AS hu,
      |  list_sum([(x - 32768) * (x - 32768) for x in sm])::BIGINT AS energy
      |  FROM p)
      |SELECT doc_id, n AS n_samples, 8000 AS sample_rate, 1 AS channels,
      |  (n // 8)::INT AS duration_ms, energy,
      |  (CASE WHEN hu >= 9223372036854775808::HUGEINT
      |        THEN hu - 18446744073709551616::HUGEINT ELSE hu END)::BIGINT AS ahash
      |FROM h ORDER BY doc_id""".stripMargin,
    "t7_pii_redact" -> raw"""
      |WITH t AS (SELECT doc_id, text ||
      |  (CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@mail-'
      |        || (doc_id % 7) || '.example.com' ELSE '' END) ||
      |  (CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || (doc_id % 256) || '.0.'
      |        || (doc_id % 100) ELSE '' END) ||
      |  (CASE WHEN doc_id % 7 = 0 THEN ' call 555-'
      |        || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END) AS t2
      |  FROM documents),
      |r AS (SELECT doc_id, t2,
      |  regexp_replace(regexp_replace(regexp_replace(t2,
      |    '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
      |    '${TextAnalysis.Ipv4Re}', '<IP>', 'g'),
      |    '${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS red
      |  FROM t)
      |SELECT doc_id,
      |  len(regexp_extract_all(t2, '${TextAnalysis.EmailRe}'))::INT AS n_email,
      |  len(regexp_extract_all(t2, '${TextAnalysis.Ipv4Re}'))::INT AS n_ip,
      |  len(regexp_extract_all(t2, '${TextAnalysis.PhoneRe}'))::INT AS n_phone,
      |  length(red)::INT AS redacted_len, md5(red) AS redacted_md5
      |FROM r ORDER BY doc_id""".stripMargin,
    // t8: the oracle recomputes heavy hitters the EXACT way (full
    // groupBy + integer threshold) — the MG sketch path must land on
    // the identical set because pass 2 is exact over a candidate
    // superset (see TextAnalysis.heavyHitters)
    "t8_heavy_hitters" -> raw"""
      |WITH w AS (SELECT unnest(string_split($Nrm, ' ')) AS w FROM documents),
      |c AS (SELECT w, count(*)::BIGINT AS cnt FROM w GROUP BY 1),
      |t AS (SELECT sum(cnt) AS n FROM c)
      |SELECT w AS term, cnt FROM c, t WHERE cnt * 256 >= n
      |ORDER BY cnt DESC, term""".stripMargin,
    // t9: the oracle recomputes the repetition numerators from first
    // principles — unnest all word n-grams (n ∈ 2,3,5), count per
    // (doc, n, gram), pick the top gram by (cnt, clen) and sum the
    // duplicated char mass; integer numerators keep the hash compare
    // independent of float formatting (fractions are round(…, 6) on
    // both engines)
    // t10: host and URL identity re-derived from the generating
    // formulas (doc_id % 97 drives the canonical identity), so the
    // Spark side's real string-extraction chain is independently
    // re-proven against pure arithmetic
    "t10_domain_stats" -> raw"""
      |WITH d AS (SELECT doc_id, text, lang, n_chars, doc_id % 97 AS h FROM documents)
      |SELECT 'site' || h % 37 || '.example.com' AS host,
      |       count(*) AS n_docs,
      |       count(DISTINCT h) AS n_urls,
      |       count(DISTINCT lang) AS n_langs,
      |       sum(len(string_split(text, ' ')))::BIGINT AS tok_sum,
      |       floor(avg(n_chars) * 1e6 + 0.5)::BIGINT AS avg_chars_e6
      |FROM d GROUP BY 1 ORDER BY host""".stripMargin,
    "t9_rep_signals" -> raw"""
      |WITH d AS (SELECT doc_id, $Nrm AS nrm, string_split($Nrm, ' ') AS w FROM documents),
      |base AS (SELECT doc_id, len(w)::INT AS n_words,
      |  (length(nrm) - (len(w) - 1))::BIGINT AS n_chars, w FROM d),
      |g AS (SELECT doc_id, n, unnest(CASE WHEN len(w) >= n
      |    THEN [array_to_string(w[i:i+n-1], ' ') for i in range(1, len(w)-n+2)]
      |    ELSE [] END) AS gram
      |  FROM base, (SELECT unnest([2,3,5]) AS n) ns),
      |c AS (SELECT doc_id, n, gram, count(*)::BIGINT AS cnt,
      |  (length(gram) - (n - 1))::BIGINT AS clen FROM g GROUP BY doc_id, n, gram),
      |top AS (SELECT doc_id, n, cnt * clen AS num,
      |  row_number() OVER (PARTITION BY doc_id, n ORDER BY cnt DESC, clen DESC, gram) AS rn
      |  FROM c),
      |dup AS (SELECT doc_id, n, coalesce(sum(CASE WHEN cnt >= 2 THEN cnt * clen END), 0)::BIGINT AS num
      |  FROM c GROUP BY doc_id, n)
      |SELECT b.doc_id, b.n_words, b.n_chars,
      |  coalesce(t2.num, 0) AS top2_num,
      |  coalesce(t3.num, 0) AS top3_num,
      |  coalesce(d5.num, 0) AS dup5_num,
      |  CASE WHEN b.n_chars > 0 THEN floor(coalesce(t2.num, 0)::DOUBLE / b.n_chars * 1e6 + 0.5)::BIGINT ELSE 0 END AS top2_cfrac_e6,
      |  CASE WHEN b.n_chars > 0 THEN floor(coalesce(t3.num, 0)::DOUBLE / b.n_chars * 1e6 + 0.5)::BIGINT ELSE 0 END AS top3_cfrac_e6,
      |  CASE WHEN b.n_chars > 0 THEN floor(coalesce(d5.num, 0)::DOUBLE / b.n_chars * 1e6 + 0.5)::BIGINT ELSE 0 END AS dup5_cfrac_e6
      |FROM base b
      |LEFT JOIN top t2 ON b.doc_id = t2.doc_id AND t2.n = 2 AND t2.rn = 1
      |LEFT JOIN top t3 ON b.doc_id = t3.doc_id AND t3.n = 3 AND t3.rn = 1
      |LEFT JOIN dup d5 ON b.doc_id = d5.doc_id AND d5.n = 5
      |ORDER BY b.doc_id""".stripMargin,
    // t11: weights re-derived per bigram from the same md5-hex fold
    // p2 established; LEFT JOIN keeps feature-less (<2-word) docs at
    // score 0 / keep false
    "t11_quality_model" -> raw"""
      |WITH d AS (SELECT doc_id, string_split($Nrm, ' ') AS w FROM documents),
      |g AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 2
      |    THEN [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]
      |    ELSE [] END) AS gram FROM d),
      |s AS (SELECT doc_id,
      |  (list_reduce([strpos('0123456789abcdef', substr(md5('qm' || gram), i, 1)) - 1
      |     for i in range(1, 9)], (a, b) -> a*16 + b) % 4096) % 401 - 200 AS wgt
      |  FROM g),
      |a AS (SELECT doc_id, count(*)::BIGINT AS n_feats, sum(wgt)::BIGINT AS score
      |  FROM s GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(a.n_feats, 0)::BIGINT AS n_feats,
      |  coalesce(a.score, 0)::BIGINT AS score,
      |  coalesce(a.score, 0) > 0 AS keep,
      |  CASE WHEN coalesce(a.n_feats, 0) > 0
      |       THEN floor(a.score::DOUBLE / a.n_feats * 1e6 + 0.5)::BIGINT ELSE 0 END AS score_per_feat_e6
      |FROM d LEFT JOIN a USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // t15: t3's argmax re-derived, aggregated to the confusion matrix
    "t15_lang_confusion" -> raw"""
      |WITH d AS (SELECT doc_id, lang, string_split($Nrm, ' ') AS w FROM documents),
      |sc AS (SELECT doc_id, lang,
      |  len([x for x in w if list_contains(['window','group','merge'], x)])::INT AS s_de,
      |  len([x for x in w if list_contains(['the','data','query'], x)])::INT AS s_en,
      |  len([x for x in w if list_contains(['table','row','scan'], x)])::INT AS s_es,
      |  len([x for x in w if list_contains(['join','filter','sort'], x)])::INT AS s_fr,
      |  len([x for x in w if list_contains(['spark','batch','stream'], x)])::INT AS s_zh
      |  FROM d),
      |p AS (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS g FROM sc),
      |pr AS (SELECT lang,
      |  CASE WHEN s_de = g THEN 'de' WHEN s_en = g THEN 'en' WHEN s_es = g THEN 'es'
      |       WHEN s_fr = g THEN 'fr' ELSE 'zh' END AS pred_lang FROM p),
      |cells AS (SELECT lang, pred_lang, count(*) AS n FROM pr GROUP BY 1, 2),
      |marg AS (SELECT lang, sum(n)::BIGINT AS n_label FROM cells GROUP BY 1)
      |SELECT c.lang, c.pred_lang, c.n, m.n_label,
      |       (c.n * 1000) // m.n_label AS rate_pm
      |FROM cells c JOIN marg m USING (lang)
      |ORDER BY c.lang, c.pred_lang""".stripMargin,
    // t14: first-occurrence attribution on the shingle strings —
    // engine-side hash attribution is identical absent xxhash64
    // collisions, which this compare itself polices
    "t14_ngram_novelty" -> raw"""
      |WITH $ShingleCte,
      |u AS (SELECT doc_id, unnest(s) AS g FROM sh),
      |f AS (SELECT g, min(doc_id) AS first_doc FROM u GROUP BY g)
      |SELECT u.doc_id, count(*) AS n_shingles,
      |  sum(CASE WHEN f.first_doc = u.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_novel,
      |  floor(sum(CASE WHEN f.first_doc = u.doc_id THEN 1 ELSE 0 END)::DOUBLE
      |        / count(*) * 1e6 + 0.5)::BIGINT AS novelty_e6
      |FROM u JOIN f USING (g) GROUP BY u.doc_id ORDER BY u.doc_id""".stripMargin,
    // t16: bigram coverage against the corpus-common bigram table
    // (count >= 5); the engine counts xxhash64 of the bigram, the
    // oracle counts the strings — identical short of a 64-bit
    // collision (t14's argument)
    // t19: counts over pure-ASCII residues after complement-stripping;
    // other = total − the three stripped classes
    // t20: Simpson ratio ships as (num, den) ints; ppm via 128-bit
    // integer division on both sides (HUGEINT / DECIMAL(38,0))
    "t20_vocab_census" -> raw"""
      |WITH d AS (SELECT lang, source, unnest(string_split($Nrm, ' ')) AS tok
      |           FROM documents),
      |c AS (SELECT lang, source, tok, count(*)::BIGINT AS n FROM d GROUP BY 1, 2, 3),
      |a AS (SELECT lang, source, sum(n)::BIGINT AS n_tokens,
      |        count(*)::BIGINT AS n_types,
      |        sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
      |        max(n)::BIGINT AS top_token_n,
      |        sum(n::HUGEINT*(n-1)) AS simpson_hug
      |      FROM c GROUP BY 1, 2)
      |SELECT lang, source, n_tokens, n_types, n_hapax, top_token_n,
      |  simpson_hug::BIGINT AS simpson_num,
      |  (n_tokens::HUGEINT*(n_tokens-1))::BIGINT AS simpson_den,
      |  ((n_types::HUGEINT * 1000000) // n_tokens)::BIGINT AS ttr_ppm,
      |  CASE WHEN n_tokens <= 1 THEN 0::BIGINT
      |       ELSE ((simpson_hug * 1000000)
      |             // (n_tokens::HUGEINT * (n_tokens-1)))::BIGINT
      |  END AS simpson_ppm
      |FROM a ORDER BY lang, source""".stripMargin,
    // t22: token-grain soft-dedup effective size; families by
    // md5(normalized text) exactly as d1; ppm via DECIMAL/HUGEINT
    // t23: top-100 by (cf DESC, term ASC) — the TopKLabeled tie rule;
    // zipf_ppm through HUGEINT ≡ the Spark side's DECIMAL(38,0)
    "t23_zipf" -> raw"""
      |WITH w AS (SELECT unnest(string_split($Nrm, ' ')) AS w FROM documents),
      |f AS (SELECT w, count(*)::BIGINT AS cf FROM w GROUP BY 1),
      |r AS (SELECT w, cf, row_number() OVER (ORDER BY cf DESC, w)::BIGINT AS rank
      |      FROM f),
      |t AS (SELECT rank, w AS term, cf FROM r WHERE rank <= 100),
      |one AS (SELECT cf AS cf1 FROM t WHERE rank = 1)
      |SELECT rank, term, cf, (rank * cf)::BIGINT AS zipf_prod,
      |       ((rank::HUGEINT * cf * 1000000) // cf1)::BIGINT AS zipf_ppm
      |FROM t CROSS JOIN one ORDER BY rank""".stripMargin,
    "t22_effective_size" -> raw"""
      |WITH d AS (SELECT doc_id, source, md5($Nrm) AS content_hash,
      |        len(string_split($Nrm, ' '))::BIGINT AS n_toks
      |      FROM documents),
      |f AS (SELECT content_hash, count(*)::BIGINT AS f FROM d GROUP BY 1),
      |a AS (SELECT source, count(*)::BIGINT AS n_docs,
      |        sum(n_toks)::BIGINT AS raw_tokens,
      |        sum((n_toks * 1000) // f.f)::BIGINT AS eff_tokens_pm
      |      FROM d JOIN f USING (content_hash) GROUP BY 1)
      |SELECT source, n_docs, raw_tokens, eff_tokens_pm,
      |  (((raw_tokens::HUGEINT * 1000 - eff_tokens_pm) * 1000000)
      |    // (raw_tokens::HUGEINT * 1000))::BIGINT AS savings_ppm
      |FROM a ORDER BY source""".stripMargin,
    // t21: top-50 by (cf DESC, term ASC) — the TopKLabeled tie rule
    // stated as row_number; both ratios exact integer division
    "t21_burstiness" -> raw"""
      |WITH d AS (SELECT doc_id, unnest(string_split($Nrm, ' ')) AS w FROM documents),
      |dt AS (SELECT doc_id, w, count(*)::BIGINT AS n FROM d GROUP BY 1, 2),
      |t AS (SELECT w, sum(n)::BIGINT AS cf, count(*)::BIGINT AS df FROM dt GROUP BY 1),
      |nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
      |r AS (SELECT w, cf, df,
      |        row_number() OVER (ORDER BY cf DESC, w)::BIGINT AS rank FROM t)
      |SELECT rank, w AS term, cf, df,
      |  ((cf::HUGEINT * 1000000) // df)::BIGINT AS burst_ppm,
      |  ((df::HUGEINT * 1000000) // nd.n_docs)::BIGINT AS coverage_ppm
      |FROM r, nd WHERE rank <= 50 ORDER BY rank""".stripMargin,
    "t19_script_mix" -> raw"""
      |WITH c AS (SELECT doc_id, length(text)::BIGINT AS n_chars_total,
      |    length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::BIGINT AS n_letter,
      |    length(regexp_replace(text, '[^0-9]', '', 'g'))::BIGINT AS n_digit,
      |    length(regexp_replace(text, '[^ \t\n\r]', '', 'g'))::BIGINT AS n_space
      |  FROM documents)
      |SELECT doc_id, n_chars_total, n_letter, n_digit, n_space,
      |  (n_chars_total - n_letter - n_digit - n_space)::BIGINT AS n_other,
      |  (CASE WHEN n_chars_total = 0 THEN 0
      |        ELSE (n_letter * 1000) // n_chars_total END)::BIGINT AS letter_pm,
      |  (CASE WHEN n_chars_total = 0 THEN 0
      |        ELSE ((n_chars_total - n_letter - n_digit - n_space) * 1000)
      |             // n_chars_total END)::BIGINT AS other_pm
      |FROM c ORDER BY doc_id""".stripMargin,
    // t18: non-overlapping regex-run counts + integer-div composites —
    // Java and RE2 agree on these character-class-run patterns
    "t18_readability" -> raw"""
      |WITH c AS (SELECT doc_id,
      |    len(regexp_extract_all(lower(text), '[.!?]+'))::BIGINT AS n_sentences,
      |    len(regexp_extract_all(lower(text), '[a-z]+'))::BIGINT AS n_words,
      |    len(regexp_extract_all(lower(text), '[a-z]{7,}'))::BIGINT AS n_long_words,
      |    len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS n_vowel_groups
      |  FROM documents)
      |SELECT doc_id, n_sentences, n_words, n_long_words, n_vowel_groups,
      |  (CASE WHEN n_sentences = 0 THEN 0
      |        ELSE (n_words * 100) // n_sentences END)::BIGINT AS wps_x100,
      |  (CASE WHEN n_words = 0 THEN 0
      |        ELSE (n_long_words * 1000) // n_words END)::BIGINT AS longword_pm,
      |  (CASE WHEN n_words = 0 THEN 0
      |        ELSE (n_vowel_groups * 1000) // n_words END)::BIGINT AS syllable_pm
      |FROM c ORDER BY doc_id""".stripMargin,
    // t17: conditional probabilities as exact rationals; min is
    // order-free; weak test cross-multiplied — no log, no float
    "t17_lm_fluency" -> raw"""
      |WITH d AS (SELECT doc_id, string_split($Nrm, ' ') AS w FROM documents),
      |b AS (SELECT doc_id,
      |        unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
      |      FROM d),
      |b2 AS (SELECT doc_id, g, string_split(g, ' ')[1] AS u FROM b),
      |cbg AS (SELECT g, count(*) AS cnt_bg FROM b2 GROUP BY g),
      |cug AS (SELECT u, count(*) AS cnt_ug FROM b2 GROUP BY u),
      |j AS (SELECT doc_id, count(*) AS nb,
      |        min((cnt_bg * 1000000) // cnt_ug)::BIGINT AS mp,
      |        sum(CASE WHEN cnt_bg * 100 < cnt_ug THEN 1 ELSE 0 END)::BIGINT AS nw
      |      FROM b2 JOIN cbg USING (g) JOIN cug USING (u) GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(j.nb, 0)::BIGINT AS n_bigrams,
      |  coalesce(j.mp, 1000000)::BIGINT AS min_ppm,
      |  coalesce(j.nw, 0)::BIGINT AS n_weak
      |FROM d LEFT JOIN j USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    "t16_bigram_coverage" -> raw"""
      |WITH d AS (SELECT doc_id, string_split($Nrm, ' ') AS w FROM documents),
      |b AS (SELECT doc_id,
      |        unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
      |      FROM d),
      |c AS (SELECT g, count(*) AS cnt FROM b GROUP BY g),
      |j AS (SELECT doc_id, count(*) AS nb,
      |        sum(CASE WHEN c.cnt >= 5 THEN 1 ELSE 0 END)::BIGINT AS nc
      |      FROM b JOIN c USING (g) GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(j.nb, 0)::BIGINT AS n_bigrams,
      |  coalesce(j.nc, 0)::BIGINT AS n_common,
      |  (CASE WHEN coalesce(j.nb, 0) = 0 THEN 0
      |        ELSE (j.nc * 1000) // j.nb END)::BIGINT AS cover_pm
      |FROM d LEFT JOIN j USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // t13: vocab = t8's exact heavy-hitter rule (cnt·256 ≥ N), per-doc
    // OOV mass + integer per-mille rate
    "t13_oov_rate" -> raw"""
      |WITH d AS (SELECT doc_id, string_split($Nrm, ' ') AS w FROM documents),
      |tok AS (SELECT doc_id, unnest(w) AS word FROM d),
      |n AS (SELECT count(*) AS total FROM tok),
      |v AS (SELECT word FROM tok, n GROUP BY word, total
      |      HAVING count(*) * 256 >= total),
      |iv AS (SELECT doc_id, count(*) AS n_iv FROM tok JOIN v USING (word)
      |       GROUP BY doc_id)
      |SELECT d.doc_id, len(d.w)::BIGINT AS n_words,
      |  (len(d.w) - coalesce(iv.n_iv, 0))::BIGINT AS n_oov,
      |  (CASE WHEN len(d.w) > 0
      |        THEN ((len(d.w) - coalesce(iv.n_iv, 0)) * 1000) // len(d.w)
      |        ELSE 0 END)::BIGINT AS oov_pm
      |FROM d LEFT JOIN iv USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // t12: symbol words planted by doc_id arithmetic (doc_id mod 13
    // literal '#' words appended in both engines); every rule an
    // integer cross-multiplied comparison
    "t12_gopher_gate" -> raw"""
      |WITH d AS (SELECT doc_id,
      |    string_split($Nrm, ' ') || ['#' for i in range(doc_id % 13)] AS w
      |  FROM documents),
      |n AS (SELECT doc_id, len(w)::INT AS n_words,
      |    list_sum(list_transform(w, x -> length(x)))::BIGINT AS sum_chars,
      |    len([x for x in w if regexp_matches(x, '[a-z]')])::INT AS n_alpha,
      |    len([x for x in w if contains(x, '#')])::INT AS n_symbol,
      |    len(list_intersect(list_distinct(w),
      |        ['the','a','and','of','to','in']))::INT AS n_stop
      |  FROM d)
      |SELECT doc_id, n_words, sum_chars, n_alpha, n_symbol, n_stop,
      |  n_words >= 50 AND n_words <= 100000 AS wc_ok,
      |  sum_chars >= n_words * 3 AND sum_chars <= n_words * 10 AS mwl_ok,
      |  n_alpha * 10 >= n_words * 8 AS alpha_ok,
      |  n_symbol * 10 <= n_words AS sym_ok,
      |  n_stop >= 2 AS stop_ok,
      |  (n_words >= 50 AND n_words <= 100000)
      |    AND (sum_chars >= n_words * 3 AND sum_chars <= n_words * 10)
      |    AND (n_alpha * 10 >= n_words * 8) AND (n_symbol * 10 <= n_words)
      |    AND (n_stop >= 2) AS gopher_pass
      |FROM n ORDER BY doc_id""".stripMargin,
    // m13: per-pixel BT.601 integer luma recomputed from the fixture
    // formula (PNG is lossless RGB, the m1 argument); bins by // 64
    "m13_pixel_stats" -> raw"""
      |WITH d AS (SELECT doc_id, (doc_id % 24 + 8)::INT AS w, (doc_id % 17 + 8)::INT AS h
      |  FROM documents),
      |p AS (SELECT doc_id, w, h,
      |  [(299*((doc_id * 31 + (i % w) * 7 + (i // w) * 13) % 256)
      |   + 587*((doc_id * 17 + (i % w) * 3 + (i // w) * 5) % 256)
      |   + 114*((doc_id * 7 + (i % w) * 11 + (i // w) * 3) % 256)) // 1000
      |   for i in range(0, w * h)] AS lums
      |  FROM d)
      |SELECT doc_id, (w * h)::BIGINT AS n_px,
      |  list_sum(lums)::BIGINT AS lum_sum,
      |  list_min(lums)::BIGINT AS lum_min,
      |  list_max(lums)::BIGINT AS lum_max,
      |  len(list_filter(lums, x -> x < 64))::BIGINT AS b_dark,
      |  len(list_filter(lums, x -> x >= 64 AND x < 128))::BIGINT AS b_shadow,
      |  len(list_filter(lums, x -> x >= 128 AND x < 192))::BIGINT AS b_light,
      |  len(list_filter(lums, x -> x >= 192))::BIGINT AS b_bright
      |FROM p ORDER BY doc_id""".stripMargin,
    "m1_mm_manifest" -> raw"""
      |WITH d AS (SELECT doc_id, (doc_id % 24 + 8)::INT AS w, (doc_id % 17 + 8)::INT AS h
      |  FROM documents),
      |p AS (SELECT doc_id, w, h,
      |  list_reduce(list_prepend(1125899906842597::HUGEINT,
      |    [(((doc_id * 31 + (i % w) * 7 + (i // w) * 13) % 256) * 65536
      |    + ((doc_id * 17 + (i % w) * 3 + (i // w) * 5) % 256) * 256
      |    + ((doc_id * 7 + (i % w) * 11 + (i // w) * 3) % 256))::HUGEINT
      |     for i in range(0, w * h)]),
      |    (acc, c) -> (acc * 31 + c) % 18446744073709551616::HUGEINT) AS hu
      |  FROM d)
      |SELECT doc_id, (w * h * 3)::INT AS n_bytes, w AS width, h AS height, 3 AS channels,
      |  (CASE WHEN hu >= 9223372036854775808::HUGEINT
      |        THEN hu - 18446744073709551616::HUGEINT ELSE hu END)::BIGINT AS phash
      |FROM p ORDER BY doc_id""".stripMargin,
    "m2_frame_manifest" -> raw"""
      |WITH d AS (SELECT doc_id, (doc_id % 24 + 8)::INT AS w, (doc_id % 17 + 8)::INT AS h,
      |  (doc_id % 5 + 2)::INT AS n FROM documents),
      |f AS (SELECT doc_id, w, h, n, unnest(range(0, n, 2)) AS fi FROM d),
      |p AS (SELECT doc_id, fi, n, w, h,
      |  list_reduce(list_prepend(1125899906842597::HUGEINT,
      |    [(((doc_id * 31 + fi * 101 + (i % w) * 7 + (i // w) * 13) % 256) * 65793)::HUGEINT
      |     for i in range(0, w * h)]),
      |    (acc, c) -> (acc * 31 + c) % 18446744073709551616::HUGEINT) AS hu
      |  FROM f)
      |SELECT doc_id, fi::INT AS frame_idx, n AS n_frames, w AS width, h AS height,
      |  (CASE WHEN hu >= 9223372036854775808::HUGEINT
      |        THEN hu - 18446744073709551616::HUGEINT ELSE hu END)::BIGINT AS fhash
      |FROM p ORDER BY doc_id, frame_idx""".stripMargin,
    // m4: the oracle recomputes each frame's 64-bit average-hash from
    // the fixture pixel formula with the SAME integer threshold rule
    // (blockSum·totalPixels > totalSum·blockPixels, MSB-first fold)
    // and brute-forces the Hamming join — the Spark side must land on
    // the identical pair set through real GIF decode + chunk blocking
    // m10: thumb pixel (tx,ty) = source (tx·w div 8, ty·h div 8) —
    // integer index mapping over the m1 formulas, same HUGEINT fold
    "m10_thumb_manifest" -> raw"""
      |WITH d AS (SELECT doc_id, (doc_id % 24 + 8)::INT AS w, (doc_id % 17 + 8)::INT AS h
      |  FROM documents),
      |p AS (SELECT doc_id,
      |  list_reduce(list_prepend(1125899906842597::HUGEINT,
      |    [(((doc_id * 31 + ((i % 8) * w // 8) * 7 + ((i // 8) * h // 8) * 13) % 256) * 65536
      |    + ((doc_id * 17 + ((i % 8) * w // 8) * 3 + ((i // 8) * h // 8) * 5) % 256) * 256
      |    + ((doc_id * 7 + ((i % 8) * w // 8) * 11 + ((i // 8) * h // 8) * 3) % 256))::HUGEINT
      |     for i in range(0, 64)]),
      |    (acc, c) -> (acc * 31 + c) % 18446744073709551616::HUGEINT) AS hu
      |  FROM d)
      |SELECT doc_id, 8 AS twidth, 8 AS theight,
      |  (CASE WHEN hu >= 9223372036854775808::HUGEINT
      |        THEN hu - 18446744073709551616::HUGEINT ELSE hu END)::BIGINT AS thash
      |FROM p ORDER BY doc_id""".stripMargin,
    // m9: signatures re-derived from the family-pixel formulas, exact
    // integer-in-double cosine (< 2^53 throughout), window ranking
    "m9_visual_search" -> raw"""
      |WITH d AS (SELECT doc_id, ((doc_id // 25) % 24 + 8)::INT AS w,
      |             ((doc_id // 25) % 17 + 8)::INT AS h,
      |             (doc_id // 25) AS fam FROM documents),
      |sg AS (SELECT doc_id,
      |  [ list_sum([ CASE WHEN i = (doc_id * 131) % (w*h)
      |      THEN ((fam * 40503 + i*i*13933 + i*7919) % 256 + (doc_id % 7) * 37) % 256
      |      ELSE (fam * 40503 + i*i*13933 + i*7919) % 256 END
      |      for i in range(0, w*h)
      |      if (i % w) >= (b % 8) * w // 8 AND (i % w) < ((b % 8) + 1) * w // 8
      |        AND (i // w) >= (b // 8) * h // 8 AND (i // w) < ((b // 8) + 1) * h // 8 ])
      |    for b in range(0, 64) ]::DOUBLE[] AS v
      |  FROM d),
      |n AS (SELECT doc_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM sg),
      |c AS (SELECT q.doc_id AS q_id, x.doc_id AS vec_id,
      |        list_dot_product(q.v, x.v) / (q.nrm * x.nrm) AS cos_raw
      |      FROM n q JOIN n x ON q.doc_id < 20 AND x.doc_id <> q.doc_id),
      |r AS (SELECT q_id, vec_id, cos_raw,
      |        row_number() OVER (PARTITION BY q_id
      |          ORDER BY cos_raw DESC, vec_id ASC) AS rnk
      |      FROM c)
      |SELECT q_id, rnk::INT AS rank, vec_id AS neighbor_id,
      |  floor(cos_raw * 1e6 + 0.5)::BIGINT AS cosine_e6
      |FROM r WHERE rnk <= 10 ORDER BY q_id, rank""".stripMargin,
    // m7: m4's signature CTE at stride 1, joined to the NEXT frame of
    // the same video — hamming > 40 bits flipped = scene cut
    "m7_scene_cuts" -> raw"""
      |WITH d AS (SELECT doc_id, (doc_id % 24 + 8)::INT AS w, (doc_id % 17 + 8)::INT AS h,
      |  (doc_id % 5 + 2)::INT AS n FROM documents),
      |f AS (SELECT doc_id, w, h, unnest(range(0, n)) AS fi FROM d),
      |s AS (SELECT doc_id, fi, w, h,
      |  list_sum([(doc_id * 31 + fi * 101 + (i % w) * 7 + (i // w) * 13) % 256
      |            for i in range(0, w * h)])::BIGINT AS total FROM f),
      |sg AS (SELECT doc_id, fi,
      |  list_reduce(list_prepend(0::HUGEINT, [
      |    (CASE WHEN
      |      (list_sum([(doc_id * 31 + fi * 101 + (i % w) * 7 + (i // w) * 13) % 256
      |        for i in range(0, w * h)
      |        if (i % w) >= (b % 8) * w // 8 AND (i % w) < ((b % 8) + 1) * w // 8
      |          AND (i // w) >= (b // 8) * h // 8 AND (i // w) < ((b // 8) + 1) * h // 8
      |       ]))::BIGINT * (w * h)
      |      > total * ((((b % 8) + 1) * w // 8 - (b % 8) * w // 8)
      |               * (((b // 8) + 1) * h // 8 - (b // 8) * h // 8))
      |     THEN 1 ELSE 0 END)::HUGEINT
      |    for b in range(0, 64)]),
      |    (acc, bit) -> acc * 2 + bit) AS hu
      |  FROM s),
      |sig AS (SELECT doc_id, fi::INT AS fi,
      |  (CASE WHEN hu >= 9223372036854775808::HUGEINT
      |        THEN hu - 18446744073709551616::HUGEINT ELSE hu END)::BIGINT AS sig
      |  FROM sg)
      |SELECT a.doc_id, b.fi AS frame_idx,
      |       bit_count(xor(a.sig, b.sig))::INT AS hamming,
      |       bit_count(xor(a.sig, b.sig)) > 40 AS is_cut
      |FROM sig a JOIN sig b ON b.doc_id = a.doc_id AND b.fi = a.fi + 1
      |ORDER BY a.doc_id, frame_idx""".stripMargin,
    "m4_frame_neardup" -> raw"""
      |WITH d AS (SELECT doc_id, (doc_id % 24 + 8)::INT AS w, (doc_id % 17 + 8)::INT AS h,
      |  (doc_id % 5 + 2)::INT AS n FROM documents),
      |f AS (SELECT doc_id, w, h, unnest(range(0, n, 2)) AS fi FROM d),
      |s AS (SELECT doc_id, fi, w, h,
      |  list_sum([(doc_id * 31 + fi * 101 + (i % w) * 7 + (i // w) * 13) % 256
      |            for i in range(0, w * h)])::BIGINT AS total FROM f),
      |sg AS (SELECT doc_id, fi,
      |  list_reduce(list_prepend(0::HUGEINT, [
      |    (CASE WHEN
      |      (list_sum([(doc_id * 31 + fi * 101 + (i % w) * 7 + (i // w) * 13) % 256
      |        for i in range(0, w * h)
      |        if (i % w) >= (b % 8) * w // 8 AND (i % w) < ((b % 8) + 1) * w // 8
      |          AND (i // w) >= (b // 8) * h // 8 AND (i // w) < ((b // 8) + 1) * h // 8
      |       ]))::BIGINT * (w * h)
      |      > total * ((((b % 8) + 1) * w // 8 - (b % 8) * w // 8)
      |               * (((b // 8) + 1) * h // 8 - (b // 8) * h // 8))
      |     THEN 1 ELSE 0 END)::HUGEINT
      |    for b in range(0, 64)]),
      |    (acc, bit) -> acc * 2 + bit) AS hu
      |  FROM s),
      |sig AS (SELECT doc_id, fi::INT AS fi,
      |  (CASE WHEN hu >= 9223372036854775808::HUGEINT
      |        THEN hu - 18446744073709551616::HUGEINT ELSE hu END)::BIGINT AS sig
      |  FROM sg)
      |SELECT a.doc_id AS doc_a, a.fi AS frame_a, b.doc_id AS doc_b, b.fi AS frame_b,
      |       bit_count(xor(a.sig, b.sig))::INT AS hamming
      |FROM sig a JOIN sig b
      |  ON (a.doc_id < b.doc_id OR (a.doc_id = b.doc_id AND a.fi < b.fi))
      |WHERE bit_count(xor(a.sig, b.sig)) <= 3
      |ORDER BY doc_a, frame_a, doc_b, frame_b""".stripMargin,
    // m6: signatures re-derived from the family-corpus formulas (the
    // m4 HUGEINT fold, single image per doc, spike folded in via the
    // same explicit mod-256 wrap the fixture writes); pairs brute-forced
    "m6_image_neardup" -> raw"""
      |WITH d AS (SELECT doc_id, doc_id // 25 AS fam FROM documents),
      |p AS (SELECT doc_id, fam, (fam % 24 + 8)::INT AS w, (fam % 17 + 8)::INT AS h,
      |  (doc_id * 131) % ((fam % 24 + 8) * (fam % 17 + 8)) AS spike,
      |  (doc_id % 7) * 37 AS amp FROM d),
      |s AS (SELECT doc_id, fam, w, h, spike, amp,
      |  list_sum([CASE WHEN i = spike
      |            THEN ((fam*40503 + i*i*13933 + i*7919) % 256 + amp) % 256
      |            ELSE (fam*40503 + i*i*13933 + i*7919) % 256 END
      |            for i in range(0, w * h)])::BIGINT AS total FROM p),
      |sg AS (SELECT doc_id,
      |  list_reduce(list_prepend(0::HUGEINT, [
      |    (CASE WHEN
      |      (list_sum([CASE WHEN i = spike
      |          THEN ((fam*40503 + i*i*13933 + i*7919) % 256 + amp) % 256
      |          ELSE (fam*40503 + i*i*13933 + i*7919) % 256 END
      |        for i in range(0, w * h)
      |        if (i % w) >= (b % 8) * w // 8 AND (i % w) < ((b % 8) + 1) * w // 8
      |          AND (i // w) >= (b // 8) * h // 8 AND (i // w) < ((b // 8) + 1) * h // 8
      |       ]))::BIGINT * (w * h)
      |      > total * ((((b % 8) + 1) * w // 8 - (b % 8) * w // 8)
      |               * (((b // 8) + 1) * h // 8 - (b // 8) * h // 8))
      |     THEN 1 ELSE 0 END)::HUGEINT
      |    for b in range(0, 64)]),
      |    (acc, bit) -> acc * 2 + bit) AS hu
      |  FROM s),
      |sig AS (SELECT doc_id,
      |  (CASE WHEN hu >= 9223372036854775808::HUGEINT
      |        THEN hu - 18446744073709551616::HUGEINT ELSE hu END)::BIGINT AS sig
      |  FROM sg)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       bit_count(xor(a.sig, b.sig))::INT AS hamming
      |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.sig, b.sig)) <= 3
      |ORDER BY doc_a, doc_b""".stripMargin,
    // m5: fingerprints re-derived row-wise (unnest samples → segment
    // group-by → ordered-list fold); 63 bits fit plain BIGINT
    // m8: per-frame integer loudness from the fixture formula (muted
    // frames are planted zeros), segments rebuilt by gaps-and-islands
    "m8_vad_segments" -> raw"""
      |WITH d AS (SELECT doc_id, (doc_id % 1200 + 400)::INT AS n FROM documents),
      |f AS (SELECT doc_id, unnest(range(0, n // 160)) AS fr FROM d),
      |e AS (SELECT doc_id, fr,
      |  CASE WHEN (fr + doc_id) % 4 = 0 THEN 0
      |       ELSE list_sum([abs((doc_id * 131 + i * 17) % 65536 - 32768)
      |                      for i in range(fr * 160, fr * 160 + 160)])
      |  END::BIGINT AS sum_abs
      |  FROM f),
      |c AS (SELECT doc_id, fr, sum_abs, sum_abs < 160 * 256 AS sil FROM e),
      |g AS (SELECT *, fr - row_number() OVER (PARTITION BY doc_id, sil ORDER BY fr) AS grp
      |      FROM c),
      |seg AS (SELECT doc_id, sil, min(fr) AS sf, count(*) AS nf, sum(sum_abs) AS sa
      |        FROM g GROUP BY doc_id, sil, grp)
      |SELECT doc_id,
      |       (row_number() OVER (PARTITION BY doc_id ORDER BY sf) - 1)::INT AS seg_idx,
      |       sil AS is_silence, sf::INT AS start_frame, nf::INT AS n_frames,
      |       sa::BIGINT AS sum_abs
      |FROM seg ORDER BY doc_id, seg_idx""".stripMargin,
    "m5_audio_neardup" -> raw"""
      |WITH d AS (SELECT doc_id, doc_id // 25 AS fam FROM documents),
      |p AS (SELECT doc_id, fam, (fam % 1200 + 400) AS n,
      |  (doc_id * 131) % (fam % 1200 + 400) AS spike FROM d),
      |s AS (SELECT doc_id, fam, n, spike, unnest(range(0, n)) AS i FROM p),
      |v AS (SELECT doc_id, (i * 64 // n) AS b,
      |  abs(CASE WHEN i = spike THEN 32767
      |      ELSE (fam * 40503 + i * i * 13933 + i * 7919) % 65536 - 32768 END) AS av
      |  FROM s),
      |seg AS (SELECT doc_id, b, sum(av)::BIGINT AS sv, count(*)::BIGINT AS cn
      |  FROM v GROUP BY doc_id, b),
      |l AS (SELECT doc_id, list(sv ORDER BY b) AS svs, list(cn ORDER BY b) AS cns
      |  FROM seg GROUP BY doc_id),
      |sig AS (SELECT doc_id,
      |  list_reduce([(CASE WHEN svs[b+1] * cns[b+2] > svs[b+2] * cns[b+1]
      |                THEN 1 ELSE 0 END)::BIGINT for b in range(0, 63)],
      |    (acc, bit) -> acc * 2 + bit) AS sig
      |  FROM l)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       bit_count(xor(a.sig, b.sig))::INT AS hamming
      |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.sig, b.sig)) <= 3
      |ORDER BY doc_a, doc_b""".stripMargin,
    "d1_exact_dedup" -> raw"""
      |SELECT md5($Nrm) AS content_hash, min(doc_id) AS canonical_id, count(*) AS n_dups
      |FROM documents GROUP BY 1 ORDER BY canonical_id""".stripMargin,
    // d10: the oracle re-derives the raw URL from the same doc_id
    // arithmetic, then runs the identical canonicalization chain in
    // DuckDB string/list functions — byte-exact both sides
    "d10_url_dedup" -> raw"""
      |WITH r AS (
      |  SELECT doc_id,
      |    'HTTPS://WWW.Site' || (doc_id % 97) % 37 || '.Example.COM:443/News/' ||
      |    (doc_id % 97) % 11 || '/Item' || (doc_id % 97) % 101 || '/?id=' ||
      |    (doc_id % 97) % 13 || '&utm_source=s' || doc_id % 5 || '&Lang=' ||
      |    (doc_id % 97) % 3 || '&ref=tw' || '&utm_campaign=c' || doc_id % 7 AS url
      |  FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://' ||
      |    regexp_replace(regexp_replace(
      |      lower(regexp_extract(url, '^[A-Za-z]+://([^/?]+)', 1)), '^www\.', ''), ':443$$', '') ||
      |    regexp_replace(regexp_extract(url, '^[A-Za-z]+://[^/?]+([^?]*)', 1), '/+$$', '') ||
      |    CASE WHEN len(p) > 0 THEN '?' || array_to_string(p, '&') ELSE '' END AS canonical_url
      |  FROM (SELECT doc_id, url,
      |    list_sort([lower(split_part(q, '=', 1)) || '=' || split_part(q, '=', 2)
      |      for q in string_split(regexp_extract(url, '\?(.*)$$', 1), '&')
      |      if q <> '' and not starts_with(q, 'utm_')
      |        and not regexp_matches(q, '^[Rr]ef=')]) AS p
      |    FROM r))
      |SELECT canonical_url, count(*) AS n_docs, min(doc_id) AS keeper,
      |       sum(doc_id)::BIGINT AS id_sum
      |FROM c GROUP BY 1 ORDER BY canonical_url""".stripMargin,
    // d11: the oracle re-segments each doc into the same 8-word
    // windows with list slicing, counts corpus frequency per line,
    // and reconstructs kept text — byte-exact both sides
    // d12: brute-force exact containment over the same distinct
    // shingle sets (both directions emitted; integer threshold)
    "d12_containment" -> raw"""
      |WITH $ShingleCte,
      |f AS (SELECT doc_id, s, len(s)::BIGINT AS sz FROM sh)
      |SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
      |  a.sz AS sz_contained, b.sz AS sz_container,
      |  len(list_intersect(a.s, b.s))::BIGINT AS inter_sz
      |FROM f a JOIN f b ON a.doc_id <> b.doc_id
      |WHERE a.sz >= 5 AND len(list_intersect(a.s, b.s)) * 10 >= a.sz * 9
      |ORDER BY contained_id, container_id""".stripMargin,
    "d11_line_dedup" -> raw"""
      |WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |ln AS (
      |  SELECT doc_id,
      |         unnest(range(CAST(ceil(len(ws) / 8.0) AS BIGINT))) AS line_no,
      |         ws
      |  FROM w),
      |ln2 AS (
      |  SELECT doc_id, line_no,
      |         array_to_string(ws[(line_no*8 + 1):(line_no*8 + 8)], ' ') AS line
      |  FROM ln),
      |hot AS (
      |  SELECT md5(line) AS h FROM ln2
      |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3)
      |SELECT l.doc_id,
      |       count(*) AS n_lines,
      |       count(h.h) AS n_dup_lines,
      |       length(coalesce(string_agg(CASE WHEN h.h IS NULL THEN l.line END,
      |         ' ' ORDER BY l.line_no), ''))::BIGINT AS kept_chars,
      |       coalesce(string_agg(CASE WHEN h.h IS NULL THEN l.line END,
      |         ' ' ORDER BY l.line_no), '') AS kept_text
      |FROM ln2 l LEFT JOIN hot h ON md5(l.line) = h.h
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "d2_minhash_lsh" -> raw"""
      |WITH $ShingleCte
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  len(list_intersect(a.s, b.s))::BIGINT AS inter_sz,
      |  len(list_distinct(a.s || b.s))::BIGINT AS union_sz
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE 10 * len(list_intersect(a.s, b.s)) >= 8 * len(list_distinct(a.s || b.s))
      |ORDER BY id_a, id_b""".stripMargin,
    // d14: d2's quadratic pair oracle + source attachment; pairs and
    // distinct-docs per canonically-ordered source pair
    "d14_source_overlap" -> raw"""
      |WITH $ShingleCte,
      |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |       FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |       WHERE 10 * len(list_intersect(a.s, b.s))
      |          >= 8 * len(list_distinct(a.s || b.s))),
      |m AS (SELECT least(da.source, db.source) AS source_lo,
      |        greatest(da.source, db.source) AS source_hi, id_a, id_b
      |      FROM pr JOIN documents da ON pr.id_a = da.doc_id
      |              JOIN documents db ON pr.id_b = db.doc_id),
      |np AS (SELECT source_lo, source_hi, count(*)::BIGINT AS n_pairs
      |       FROM m GROUP BY 1, 2),
      |nd AS (SELECT source_lo, source_hi, count(DISTINCT d)::BIGINT AS n_docs
      |       FROM (SELECT source_lo, source_hi, unnest([id_a, id_b]) AS d
      |             FROM m) GROUP BY 1, 2)
      |SELECT np.source_lo, np.source_hi, np.n_pairs, nd.n_docs
      |FROM np JOIN nd USING (source_lo, source_hi)
      |ORDER BY 1, 2""".stripMargin,
    // d17: d1's exact key, counted corpus-wide, rolled up per source
    // d18: same quadratic pair CTE as d2's oracle, binned with the
    // identical IEEE floor(j*20) on the identical 6dp-rounded doubles
    "d18_sim_histogram" -> raw"""
      |WITH $ShingleCte,
      |p AS (SELECT (20 * len(list_intersect(a.s, b.s)))
      |              // len(list_distinct(a.s || b.s)) AS bin
      |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |      WHERE 10 * len(list_intersect(a.s, b.s)) >= 8 * len(list_distinct(a.s || b.s)))
      |SELECT bin::INT AS bin, count(*) AS n_pairs, bin / 20.0 AS bin_lo
      |FROM p GROUP BY 1, 3 ORDER BY 1""".stripMargin,
    "d17_source_dup_rates" -> raw"""
      |WITH k AS (SELECT doc_id, source, md5($Nrm) AS k FROM documents),
      |c AS (SELECT k, count(*) AS kn FROM k GROUP BY 1)
      |SELECT source, count(*) AS n_docs,
      |  sum(CASE WHEN c.kn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
      |  ((sum(CASE WHEN c.kn > 1 THEN 1 ELSE 0 END) * 1000) // count(*))::BIGINT AS dup_pm
      |FROM k JOIN c USING (k)
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    // d16: d8's closure folded to the family-size histogram
    "d16_cluster_histogram" -> raw"""
      |WITH RECURSIVE $ShingleCte,
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |      WHERE 10 * len(list_intersect(a.s, b.s)) >= 8 * len(list_distinct(a.s || b.s))),
      |e AS (SELECT id_a AS src, id_b AS dst FROM p
      |      UNION ALL SELECT id_b, id_a FROM p),
      |verts AS (SELECT DISTINCT src AS v FROM e),
      |cc(v, lbl) AS (
      |  SELECT v, v FROM verts
      |  UNION
      |  SELECT e.dst, cc.lbl FROM cc JOIN e ON cc.v = e.src),
      |comp AS (SELECT v, min(lbl) AS cluster_id FROM cc GROUP BY v),
      |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1)
      |SELECT cluster_size, count(*) AS n_clusters,
      |       (cluster_size * count(*))::BIGINT AS n_docs
      |FROM sz GROUP BY 1 ORDER BY 1""".stripMargin,
    // p12: d8's closure re-derived, every cluster member weighted
    // 1000 div k per-mille, per-source mass rollup (floor twice —
    // identical integer arithmetic both engines)
    // p13: phase of a length-run = (docs-before · K) div N — runs
    // never split, so no per-doc rank exists on either side
    "p13_curriculum" -> raw"""
      |WITH t AS (SELECT doc_id,
      |    len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))::BIGINT AS n_tok
      |  FROM documents),
      |a AS (SELECT n_tok, count(*)::BIGINT AS cnt FROM t GROUP BY 1),
      |c AS (SELECT n_tok, cnt,
      |        (sum(cnt) OVER (ORDER BY n_tok) - cnt)::BIGINT AS cum_before,
      |        sum(cnt) OVER ()::BIGINT AS n FROM a)
      |SELECT ((cum_before * 5) // n)::BIGINT AS phase,
      |  sum(cnt)::BIGINT AS n_docs,
      |  sum(n_tok * cnt)::BIGINT AS n_tokens,
      |  min(n_tok)::BIGINT AS tok_min, max(n_tok)::BIGINT AS tok_max
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "p12_soft_dedup" -> raw"""
      |WITH RECURSIVE $ShingleCte,
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |      WHERE 10 * len(list_intersect(a.s, b.s)) >= 8 * len(list_distinct(a.s || b.s))),
      |e AS (SELECT id_a AS src, id_b AS dst FROM p
      |      UNION ALL SELECT id_b, id_a FROM p),
      |verts AS (SELECT DISTINCT src AS v FROM e),
      |cc(v, lbl) AS (
      |  SELECT v, v FROM verts
      |  UNION
      |  SELECT e.dst, cc.lbl FROM cc JOIN e ON cc.v = e.src),
      |comp AS (SELECT v, min(lbl) AS cluster_id FROM cc GROUP BY v),
      |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1),
      |kk AS (SELECT comp.v AS doc_id, sz.cluster_size FROM comp
      |       JOIN sz USING (cluster_id))
      |SELECT d.source, count(*) AS n_docs,
      |  sum(CASE WHEN coalesce(kk.cluster_size, 1) > 1 THEN 1 ELSE 0 END)::BIGINT AS n_clustered,
      |  sum(d.n_chars)::BIGINT AS raw_chars,
      |  sum((d.n_chars * (1000 // coalesce(kk.cluster_size, 1))) // 1000)::BIGINT AS eff_chars
      |FROM documents d LEFT JOIN kk ON d.doc_id = kk.doc_id
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    // p10: p2's md5-bucket rule decides the split; the exact pair
    // predicate finds cross-split leaks
    "p10_split_check" -> raw"""
      |WITH $ShingleCte,
      |fl AS (SELECT doc_id,
      |  (list_reduce([strpos('0123456789abcdef',
      |      substr(md5('splt' || doc_id::VARCHAR), i, 1)) - 1
      |    for i in range(1, 9)], (a, b) -> a*16 + b) % 100) < 10 AS is_eval
      |  FROM documents),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |        len(list_intersect(a.s, b.s))::BIGINT AS inter_sz,
      |        len(list_distinct(a.s || b.s))::BIGINT AS union_sz
      |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |      WHERE 10 * len(list_intersect(a.s, b.s)) >= 8 * len(list_distinct(a.s || b.s)))
      |SELECT CASE WHEN fa.is_eval THEN p.id_a ELSE p.id_b END AS eval_doc,
      |       CASE WHEN fa.is_eval THEN p.id_b ELSE p.id_a END AS train_dup,
      |       p.inter_sz, p.union_sz
      |FROM p JOIN fl fa ON fa.doc_id = p.id_a
      |       JOIN fl fb ON fb.doc_id = p.id_b
      |WHERE fa.is_eval <> fb.is_eval
      |ORDER BY eval_doc, train_dup""".stripMargin,
    // d13: 3-way self-join over the same exact pair predicate
    "d13_triangles" -> raw"""
      |WITH $ShingleCte,
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |      WHERE 10 * len(list_intersect(a.s, b.s)) >= 8 * len(list_distinct(a.s || b.s)))
      |SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
      |FROM p e1 JOIN p e2 ON e2.id_a = e1.id_a AND e2.id_b > e1.id_b
      |JOIN p e3 ON e3.id_a = e1.id_b AND e3.id_b = e2.id_b
      |ORDER BY a, b, c""".stripMargin,
    // d15: d8's recursive-CC oracle + metadata attachment; majority
    // lang by (count desc, lang) row_number — same tie rule as the
    // engine's min(struct(−cnt, lang))
    "d15_cluster_purity" -> raw"""
      |WITH RECURSIVE $ShingleCte,
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |      WHERE 10 * len(list_intersect(a.s, b.s)) >= 8 * len(list_distinct(a.s || b.s))),
      |e AS (SELECT id_a AS src, id_b AS dst FROM p
      |      UNION ALL SELECT id_b, id_a FROM p),
      |verts AS (SELECT DISTINCT src AS v FROM e),
      |cc(v, lbl) AS (
      |  SELECT v, v FROM verts
      |  UNION
      |  SELECT e.dst, cc.lbl FROM cc JOIN e ON cc.v = e.src),
      |comp AS (SELECT v, min(lbl) AS cluster_id FROM cc GROUP BY v),
      |m AS (SELECT comp.v AS doc_id, comp.cluster_id, d.lang, d.source
      |      FROM comp JOIN documents d ON comp.v = d.doc_id),
      |bl AS (SELECT cluster_id, lang, count(*)::BIGINT AS c FROM m GROUP BY 1, 2),
      |r AS (SELECT cluster_id, lang AS top_lang, c AS top_lang_docs,
      |        row_number() OVER (PARTITION BY cluster_id
      |          ORDER BY c DESC, lang) AS rn FROM bl),
      |agg AS (SELECT cluster_id, count(*)::BIGINT AS n_langs,
      |          sum(c)::BIGINT AS n_docs FROM bl GROUP BY 1),
      |srcs AS (SELECT cluster_id, count(DISTINCT source)::BIGINT AS n_sources
      |         FROM m GROUP BY 1)
      |SELECT a.cluster_id, a.n_docs, a.n_langs, r.top_lang, r.top_lang_docs,
      |  srcs.n_sources, ((r.top_lang_docs * 1000) // a.n_docs)::BIGINT AS purity_pm
      |FROM agg a
      |JOIN r ON a.cluster_id = r.cluster_id AND r.rn = 1
      |JOIN srcs ON a.cluster_id = srcs.cluster_id
      |ORDER BY a.cluster_id""".stripMargin,
    "d8_dup_clusters" -> raw"""
      |WITH RECURSIVE $ShingleCte,
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |      WHERE 10 * len(list_intersect(a.s, b.s)) >= 8 * len(list_distinct(a.s || b.s))),
      |e AS (SELECT id_a AS src, id_b AS dst FROM p
      |      UNION ALL SELECT id_b, id_a FROM p),
      |verts AS (SELECT DISTINCT src AS v FROM e),
      |cc(v, lbl) AS (
      |  SELECT v, v FROM verts
      |  UNION
      |  SELECT e.dst, cc.lbl FROM cc JOIN e ON cc.v = e.src),
      |comp AS (SELECT v, min(lbl) AS cluster_id FROM cc GROUP BY v),
      |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1)
      |SELECT comp.v AS doc_id, comp.cluster_id, sz.cluster_size
      |FROM comp JOIN sz USING (cluster_id) ORDER BY doc_id""".stripMargin,
    // p9: d8's closure + a window argmax (n_words desc, doc_id asc) —
    // the engine's map-side struct-max must agree exactly
    "p9_cluster_select" -> raw"""
      |WITH RECURSIVE $ShingleCte,
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |      WHERE 10 * len(list_intersect(a.s, b.s)) >= 8 * len(list_distinct(a.s || b.s))),
      |e AS (SELECT id_a AS src, id_b AS dst FROM p
      |      UNION ALL SELECT id_b, id_a FROM p),
      |verts AS (SELECT DISTINCT src AS v FROM e),
      |cc(v, lbl) AS (
      |  SELECT v, v FROM verts
      |  UNION
      |  SELECT e.dst, cc.lbl FROM cc JOIN e ON cc.v = e.src),
      |comp AS (SELECT v, min(lbl) AS cluster_id FROM cc GROUP BY v),
      |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1),
      |nw AS (SELECT doc_id, len(w)::BIGINT AS n_words FROM d),
      |m AS (SELECT comp.cluster_id, sz.cluster_size, comp.v, nw.n_words,
      |        row_number() OVER (PARTITION BY comp.cluster_id
      |                           ORDER BY nw.n_words DESC, comp.v ASC) AS rn
      |      FROM comp JOIN sz USING (cluster_id) JOIN nw ON nw.doc_id = comp.v)
      |SELECT cluster_id, cluster_size, v AS keep_id, n_words AS keep_n_words,
      |       cluster_size - 1 AS n_dropped
      |FROM m WHERE rn = 1 ORDER BY cluster_id""".stripMargin,
    "d4_ngram_jaccard" -> raw"""
      |WITH $GramCte
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  len(list_intersect(a.g, b.g))::BIGINT AS inter_sz,
      |  len(list_distinct(a.g || b.g))::BIGINT AS union_sz
      |FROM gr a JOIN gr b ON a.doc_id < b.doc_id
      |WHERE 10 * len(list_intersect(a.g, b.g)) >= 7 * len(list_distinct(a.g || b.g))
      |ORDER BY id_a, id_b""".stripMargin,
    "d5_embed_neardup" -> raw"""
      |WITH $VecCte
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  floor(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) * 1e6 + 0.5)::BIGINT AS cosine_e6
      |FROM n a JOIN n b ON a.vec_id < b.vec_id
      |WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
      |ORDER BY id_a, id_b""".stripMargin,
    "d6_repeated_spans" -> raw"""
      |WITH d AS (SELECT doc_id, $Nrm AS nrm FROM documents),
      |w AS (SELECT doc_id, unnest(list_distinct([nrm[i:i+49] for i in range(1, length(nrm)-48)])) AS span
      |      FROM d WHERE length(nrm) >= 50)
      |SELECT span, count(*) AS n_docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM w GROUP BY 1 HAVING count(*) >= 2 ORDER BY span""".stripMargin,
    "d7_decontaminate" -> raw"""
      |WITH $ShingleCte,
      |pool AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
      |tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0)
      |SELECT doc_id, count(*) AS n_shared, count(*) >= 5 AS flagged
      |FROM tr JOIN pool USING (g)
      |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p2_stratified_sample" -> raw"""
      |WITH k AS (SELECT doc_id, lang,
      |  list_reduce([strpos('0123456789abcdef', substr(md5('smpl' || doc_id::VARCHAR), i, 1)) - 1
      |               for i in range(1, 9)], (a, b) -> a*16 + b) % 100 AS bucket
      |  FROM documents)
      |SELECT doc_id, lang, bucket FROM k
      |WHERE bucket < CASE lang WHEN 'de' THEN 20 WHEN 'en' THEN 50 WHEN 'es' THEN 30
      |                         WHEN 'fr' THEN 10 ELSE 40 END
      |ORDER BY doc_id""".stripMargin,
    "p3_pack_manifest" -> raw"""
      |WITH c AS (SELECT doc_id, lang,
      |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))::BIGINT AS n_tokens
      |  FROM documents),
      |w AS (SELECT *, sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |                                    ROWS UNBOUNDED PRECEDING) - n_tokens AS start
      |      FROM c)
      |SELECT doc_id, lang, n_tokens, (start // 2048)::BIGINT AS seq_id,
      |       (start % 2048)::BIGINT AS seq_offset
      |FROM w ORDER BY doc_id""".stripMargin,
    // p4: pure integer arithmetic end to end (cumulative sums, `//`
    // integer division) — the draw reproduces bit-exactly across
    // engines, same discipline as p2's md5 buckets
    "p4_pps_sample" -> raw"""
      |WITH d AS (SELECT doc_id, len(string_split($Nrm, ' '))::BIGINT AS w
      |           FROM documents),
      |c AS (SELECT doc_id, w, sum(w) OVER (ORDER BY doc_id
      |        ROWS UNBOUNDED PRECEDING) AS cum FROM d),
      |t AS (SELECT greatest(sum(w) // 500, 1) AS stride FROM d)
      |SELECT doc_id, w, cum::BIGINT AS cum,
      |       (cum // stride - (cum - w) // stride)::BIGINT AS n_hits
      |FROM c, t WHERE cum // stride > (cum - w) // stride
      |ORDER BY doc_id""".stripMargin,
    // p5: α=1/2 temperature mixing stays integer because sqrt is the
    // one correctly-rounded IEEE power — floor(sqrt(n)) and the
    // nested integer divisions reproduce bit-exactly across engines
    "p5_temperature_mix" -> raw"""
      |WITH d AS (SELECT doc_id,
      |  CASE WHEN doc_id % 64 < 32 THEN 0 WHEN doc_id % 64 < 48 THEN 1
      |       WHEN doc_id % 64 < 56 THEN 2 WHEN doc_id % 64 < 60 THEN 3
      |       ELSE 4 END AS mix_src,
      |  list_reduce([strpos('0123456789abcdef', substr(md5('tmix' || doc_id::VARCHAR), i, 1)) - 1
      |               for i in range(1, 9)], (a, b) -> a*16 + b) % 100000 AS bucket
      |  FROM documents),
      |c AS (SELECT mix_src, count(*)::BIGINT AS n_s,
      |             floor(sqrt(count(*)))::BIGINT AS w_s FROM d GROUP BY 1),
      |t AS (SELECT sum(w_s)::BIGINT AS w_tot FROM c),
      |th AS (SELECT mix_src, least(((100000 * 300 * w_s) // w_tot) // n_s, 100000) AS t_s
      |       FROM c, t)
      |SELECT d.doc_id, d.mix_src, d.bucket FROM d JOIN th USING (mix_src)
      |WHERE d.bucket < th.t_s ORDER BY doc_id""".stripMargin,
    // p11: water-filling with epoch caps — the one float is the
    // cap/weight sort ratio (IEEE divide, identical both engines);
    // every comparison is cross-multiplied integers, allocations are
    // integer floor division
    "p11_epoch_mix" -> raw"""
      |WITH per AS (SELECT source, sum(n_chars)::BIGINT AS c_s,
      |               (substring(source, 4)::BIGINT % 5) + 1 AS w_s
      |             FROM documents GROUP BY source),
      |tot AS (SELECT sum(c_s)::BIGINT AS c_tot, sum(w_s)::BIGINT AS w_tot FROM per),
      |b AS (SELECT per.*, c_tot * 2 AS budget, c_s * 3 AS cap_tokens, w_tot
      |      FROM per, tot),
      |o AS (SELECT *,
      |        cap_tokens::DOUBLE / w_s AS rk,
      |        coalesce(sum(cap_tokens) OVER (ORDER BY cap_tokens::DOUBLE / w_s, source
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cumE,
      |        coalesce(sum(w_s) OVER (ORDER BY cap_tokens::DOUBLE / w_s, source
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cumW
      |      FROM b),
      |cap AS (SELECT *,
      |          min(CASE WHEN cap_tokens * (w_tot - cumW) <= (budget - cumE) * w_s
      |                   THEN 1 ELSE 0 END)
      |            OVER (ORDER BY rk, source ROWS UNBOUNDED PRECEDING) = 1 AS capped
      |        FROM o),
      |r AS (SELECT sum(CASE WHEN capped THEN cap_tokens ELSE 0 END)::BIGINT AS cape,
      |             sum(CASE WHEN capped THEN 0 ELSE w_s END)::BIGINT AS w_u FROM cap)
      |SELECT source, c_s AS n_tokens, w_s, cap_tokens, capped,
      |  (CASE WHEN capped THEN cap_tokens
      |        ELSE ((budget - cape) * w_s) // w_u END)::BIGINT AS alloc_tokens,
      |  ((CASE WHEN capped THEN cap_tokens
      |         ELSE ((budget - cape) * w_s) // w_u END) * 1000 // c_s)::BIGINT AS epochs_pm
      |FROM cap, r ORDER BY source""".stripMargin,
    // p6: ties on the 32-bit draw break by doc_id in both engines
    // (heap order (score desc, id asc) ≡ ORDER BY bucket, doc_id)
    "p6_fixed_sample" -> raw"""
      |WITH b AS (SELECT doc_id, lang,
      |  list_reduce([strpos('0123456789abcdef', substr(md5('fix' || doc_id::VARCHAR), i, 1)) - 1
      |               for i in range(1, 9)], (a, b) -> a*16 + b) AS bucket
      |  FROM documents),
      |r AS (SELECT lang, doc_id, bucket,
      |        row_number() OVER (PARTITION BY lang ORDER BY bucket, doc_id) AS rnk
      |      FROM b)
      |SELECT lang, rnk::INT AS rank, doc_id, bucket::BIGINT AS bucket
      |FROM r WHERE rnk <= 50 ORDER BY lang, rnk""".stripMargin,
    // p7: importance re-derived from scratch — token buckets via the
    // md5-hex fold, integer smoothed target/raw ratio, top-k with the
    // same (importance DESC, doc_id) tie-break
    "p7_dsir_select" -> raw"""
      |WITH t AS (SELECT doc_id, lang, unnest(string_split($Nrm, ' ')) AS w
      |  FROM documents),
      |b AS (SELECT doc_id, lang,
      |  list_reduce([strpos('0123456789abcdef', substr(md5('dsir' || w), i, 1)) - 1
      |               for i in range(1, 9)], (a, b) -> a*16 + b) % 8192 AS bucket
      |  FROM t),
      |pairs AS (SELECT doc_id, lang, bucket, count(*)::BIGINT AS cnt
      |  FROM b GROUP BY doc_id, lang, bucket),
      |bk AS (SELECT bucket, sum(cnt)::BIGINT AS raw_cnt,
      |  coalesce(sum(cnt) FILTER (WHERE lang = 'en'), 0)::BIGINT AS tgt_cnt
      |  FROM pairs GROUP BY bucket),
      |sc AS (SELECT bucket, (tgt_cnt + 1) * 1000000 // (raw_cnt + 1) AS score FROM bk),
      |imp AS (SELECT p.doc_id, p.lang, sum(p.cnt)::BIGINT AS n_words,
      |  sum(p.cnt * sc.score)::BIGINT AS importance
      |  FROM pairs p JOIN sc USING (bucket) GROUP BY p.doc_id, p.lang)
      |SELECT doc_id, lang, n_words, importance FROM imp
      |ORDER BY importance DESC, doc_id LIMIT 300""".stripMargin,
    // p8: the oracle re-runs the whole funnel independently — the
    // canonical-URL partition is (doc_id % 97) by the generating
    // formula (d10 proves the string chain realizes exactly that
    // partition), content keys are md5 of the shared normalization,
    // repetition numerators are t9's CTEs, and stage flags fold with
    // window minimums; every threshold is an integer comparison
    "p8_web_pipeline" -> raw"""
      |WITH d AS (SELECT doc_id, (doc_id % 97) AS ugrp, md5($Nrm) AS chash,
      |  $Nrm AS nrm, string_split($Nrm, ' ') AS w FROM documents),
      |b AS (SELECT doc_id, ugrp, chash, len(w)::BIGINT AS n_words,
      |  len(list_distinct(w))::BIGINT AS n_distinct,
      |  (length(nrm) - (len(w) - 1))::BIGINT AS n_chars, w FROM d),
      |g AS (SELECT doc_id, n, unnest(CASE WHEN len(w) >= n
      |    THEN [array_to_string(w[i:i+n-1], ' ') for i in range(1, len(w)-n+2)]
      |    ELSE [] END) AS gram
      |  FROM b, (SELECT unnest([2,5]) AS n) ns),
      |c AS (SELECT doc_id, n, gram, count(*)::BIGINT AS cnt,
      |  (length(gram) - (n - 1))::BIGINT AS clen FROM g GROUP BY doc_id, n, gram),
      |top AS (SELECT doc_id, cnt * clen AS num,
      |  row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, clen DESC, gram) AS rn
      |  FROM c WHERE n = 2),
      |dup AS (SELECT doc_id, coalesce(sum(CASE WHEN cnt >= 2 THEN cnt * clen END), 0)::BIGINT AS num
      |  FROM c WHERE n = 5 GROUP BY doc_id),
      |f0 AS (SELECT b.*, coalesce(t.num, 0) AS top2_num, coalesce(dp.num, 0) AS dup5_num
      |  FROM b LEFT JOIN (SELECT * FROM top WHERE rn = 1) t USING (doc_id)
      |  LEFT JOIN dup dp USING (doc_id)),
      |f1 AS (SELECT *, doc_id = min(doc_id) OVER (PARTITION BY ugrp) AS k1 FROM f0),
      |f2 AS (SELECT *, k1 AND doc_id = min(CASE WHEN k1 THEN doc_id END)
      |  OVER (PARTITION BY chash) AS k2 FROM f1),
      |f AS (SELECT *,
      |  k2 AND n_words >= 10 AND n_distinct * 10 >= n_words * 3 AS k3,
      |  k2 AND n_words >= 10 AND n_distinct * 10 >= n_words * 3
      |    AND top2_num * 5 <= n_chars AND dup5_num * 10 <= n_chars * 3 AS k4
      |  FROM f2),
      |a AS (SELECT
      |  count(*)::BIGINT AS d0, coalesce(sum(n_words), 0)::BIGINT AS w0,
      |  sum(CASE WHEN k1 THEN 1 ELSE 0 END)::BIGINT AS d1,
      |  coalesce(sum(CASE WHEN k1 THEN n_words END), 0)::BIGINT AS w1,
      |  sum(CASE WHEN k2 THEN 1 ELSE 0 END)::BIGINT AS d2,
      |  coalesce(sum(CASE WHEN k2 THEN n_words END), 0)::BIGINT AS w2,
      |  sum(CASE WHEN k3 THEN 1 ELSE 0 END)::BIGINT AS d3,
      |  coalesce(sum(CASE WHEN k3 THEN n_words END), 0)::BIGINT AS w3,
      |  sum(CASE WHEN k4 THEN 1 ELSE 0 END)::BIGINT AS d4,
      |  coalesce(sum(CASE WHEN k4 THEN n_words END), 0)::BIGINT AS w4
      |  FROM f)
      |SELECT * FROM (
      |  SELECT 0 AS stage_idx, 'raw' AS stage, d0 AS n_docs, w0 AS n_words,
      |         0::BIGINT AS n_dropped FROM a
      |  UNION ALL SELECT 1, 'url_dedup', d1, w1, d0 - d1 FROM a
      |  UNION ALL SELECT 2, 'exact_dedup', d2, w2, d1 - d2 FROM a
      |  UNION ALL SELECT 3, 'quality_gate', d3, w3, d2 - d3 FROM a
      |  UNION ALL SELECT 4, 'repetition_gate', d4, w4, d3 - d4 FROM a)
      |ORDER BY stage_idx""".stripMargin,
    "p1_curate" -> raw"""
      |WITH base AS (
      |  SELECT doc_id, lang, text,
      |         len(string_split($Nrm, ' '))::INT AS n_words,
      |         len(list_distinct(string_split($Nrm, ' ')))::DOUBLE
      |           / len(string_split($Nrm, ' ')) AS ttr
      |  FROM documents),
      |q AS (SELECT * FROM base WHERE n_words >= 10 AND ttr >= 0.3),
      |w AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w FROM q),
      |sh AS (SELECT doc_id,
      |  CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
      |       ELSE list_distinct([array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)])
      |  END AS s
      |  FROM w),
      |dup AS (SELECT DISTINCT b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |        WHERE 10 * len(list_intersect(a.s, b.s)) >= 8 * len(list_distinct(a.s || b.s)))
      |SELECT doc_id, lang, n_words, floor(ttr * 1e6 + 0.5)::BIGINT AS ttr_e6
      |FROM q WHERE doc_id NOT IN (SELECT doc_id FROM dup)
      |ORDER BY doc_id""".stripMargin,
    // s9: pure dot-product rank (no norms) — the raw score orders,
    // e6 micro-units at the surface, ties break by vec_id like s1
    "s9_mips_bruteforce" -> raw"""
      |WITH $VecCte,
      |q AS (SELECT vec_id AS q_id, v AS q_v FROM n WHERE vec_id < 20),
      |c AS (SELECT q_id, vec_id, list_dot_product(q_v, v) AS d
      |      FROM q JOIN n ON q_id != vec_id),
      |r AS (SELECT q_id, vec_id, d,
      |        row_number() OVER (PARTITION BY q_id ORDER BY d DESC, vec_id)::INT AS rank
      |      FROM c)
      |SELECT q_id, rank, vec_id AS neighbor_id,
      |  floor(d * 1e6 + 0.5)::BIGINT AS dot_e6
      |FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    // s11: s1's exact-neighbor CTE + majority vote with the q49
    // smallest-label tie rule
    // s12: d2's pair CTE × the s1 cosine twin — lexical ppm and
    // embedding e6 side by side per candidate pair
    // s14: the p2 md5-bucket panel rule on vec_id, s1's one-division
    // cosine, e6 twin floor(x*1e6+0.5); bins by integer division
    "s14_cos_calibration" -> raw"""
      |WITH $VecCte,
      |p AS (SELECT vec_id, v, nrm FROM n
      |      WHERE list_reduce([strpos('0123456789abcdef',
      |              substr(md5('cal' || vec_id::VARCHAR), i, 1)) - 1
      |              for i in range(1, 9)], (a, b) -> a*16 + b) % 8 = 0),
      |c AS (SELECT floor(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) * 1e6 + 0.5)::BIGINT AS cos_e6
      |      FROM p a JOIN p b ON a.vec_id < b.vec_id)
      |SELECT ((cos_e6 + 1000000) // 100000)::BIGINT AS bin, count(*)::BIGINT AS n_pairs,
      |  min(cos_e6)::BIGINT AS cos_min_e6, max(cos_e6)::BIGINT AS cos_max_e6
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "s12_pair_rescore" -> raw"""
      |WITH $ShingleCte,
      |$VecCte,
      |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |         len(list_intersect(a.s, b.s))::BIGINT AS inter,
      |         len(list_distinct(a.s || b.s))::BIGINT AS uni
      |       FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |       WHERE 10 * len(list_intersect(a.s, b.s))
      |          >= 8 * len(list_distinct(a.s || b.s)))
      |SELECT pr.id_a, pr.id_b,
      |  ((inter * 1000000) // uni)::BIGINT AS jaccard_ppm,
      |  floor(list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) * 1e6 + 0.5)::BIGINT
      |    AS cosine_e6
      |FROM pr
      |JOIN n na ON pr.id_a = na.vec_id
      |JOIN n nb ON pr.id_b = nb.vec_id
      |ORDER BY 1, 2""".stripMargin,
    "s11_knn_classify" -> raw"""
      |WITH $VecCte,
      |lab AS (SELECT vec_id, label FROM embeddings),
      |q AS (SELECT vec_id AS q_id, v AS q_v, nrm AS q_nrm FROM n WHERE vec_id < 20),
      |c AS (SELECT q_id, vec_id, list_dot_product(q_v, v) / (q_nrm * nrm) AS cos_raw
      |      FROM q JOIN n ON q_id != vec_id),
      |r AS (SELECT q_id, vec_id,
      |        row_number() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, vec_id) AS rnk
      |      FROM c),
      |v AS (SELECT r.q_id, lab.label, count(*) AS votes
      |      FROM r JOIN lab ON r.vec_id = lab.vec_id WHERE rnk <= 10 GROUP BY 1, 2),
      |p AS (SELECT q_id, label AS pred_label, votes,
      |        row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, label) AS pr
      |      FROM v)
      |SELECT p.q_id, p.pred_label, p.votes::BIGINT AS n_votes,
      |  lab.label AS true_label, p.pred_label = lab.label AS correct
      |FROM p JOIN lab ON p.q_id = lab.vec_id WHERE p.pr = 1
      |ORDER BY p.q_id""".stripMargin,
    "s10_range_search" -> raw"""
      |WITH $VecCte,
      |q AS (SELECT vec_id AS q_id, v AS q_v, nrm AS q_nrm FROM n WHERE vec_id < 20)
      |SELECT q_id, vec_id AS neighbor_id,
      |  floor(list_dot_product(q_v, v) / (q_nrm * nrm) * 1e6 + 0.5)::BIGINT AS cosine_e6
      |FROM q JOIN n ON q_id != vec_id
      |WHERE list_dot_product(q_v, v) / (q_nrm * nrm) >= 0.4
      |ORDER BY q_id, neighbor_id""".stripMargin,
    // s13: both lists restated as row_number over the same total
    // orders (score DESC, id ASC); fusion all-integer so no float
    // is ever hash-compared
    "s13_hybrid_rrf" -> raw"""
      |WITH $VecCte,
      |qv AS (SELECT vec_id AS q_id, v AS q_v, nrm AS q_nrm FROM n WHERE vec_id < 20),
      |cv AS (SELECT q_id, vec_id, list_dot_product(q_v, v) / (q_nrm * nrm) AS cos_raw
      |       FROM qv JOIN n ON q_id != vec_id),
      |vr AS (SELECT q_id, vec_id AS doc_id,
      |         row_number() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, vec_id)::BIGINT AS vec_rank
      |       FROM cv QUALIFY vec_rank <= 20),
      |dt AS (SELECT doc_id, list_distinct(string_split($Nrm, ' ')) AS tset FROM documents),
      |qt AS (SELECT doc_id AS q_id, tset AS q_tset FROM dt WHERE doc_id < 20),
      |lp AS (SELECT q_id, doc_id,
      |         len(list_intersect(q_tset, tset))::BIGINT AS inter,
      |         (len(q_tset) + len(tset) - len(list_intersect(q_tset, tset)))::BIGINT AS uni
      |       FROM qt JOIN dt ON q_id != doc_id),
      |lr AS (SELECT q_id, doc_id,
      |         row_number() OVER (PARTITION BY q_id
      |           ORDER BY (inter * 1000000) // uni DESC, doc_id)::BIGINT AS lex_rank
      |       FROM lp QUALIFY lex_rank <= 20),
      |f AS (SELECT coalesce(lr.q_id, vr.q_id) AS q_id,
      |        coalesce(lr.doc_id, vr.doc_id) AS doc_id, lr.lex_rank, vr.vec_rank
      |      FROM lr FULL OUTER JOIN vr
      |        ON lr.q_id = vr.q_id AND lr.doc_id = vr.doc_id),
      |sc AS (SELECT q_id, doc_id, lex_rank, vec_rank,
      |         (coalesce(1000000 // (60 + lex_rank), 0) +
      |          coalesce(1000000 // (60 + vec_rank), 0))::BIGINT AS rrf_ppm
      |       FROM f)
      |SELECT q_id,
      |  row_number() OVER (PARTITION BY q_id ORDER BY rrf_ppm DESC, doc_id)::BIGINT AS rank,
      |  doc_id, rrf_ppm, lex_rank, vec_rank
      |FROM sc QUALIFY rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "s1_ann_bruteforce" -> raw"""
      |WITH $VecCte,
      |q AS (SELECT vec_id AS q_id, v AS q_v, nrm AS q_nrm FROM n WHERE vec_id < 20),
      |c AS (SELECT q_id, vec_id, list_dot_product(q_v, v) / (q_nrm * nrm) AS cos_raw
      |      FROM q JOIN n ON q_id != vec_id),
      |r AS (SELECT q_id, vec_id, cos_raw,
      |        row_number() OVER (PARTITION BY q_id ORDER BY cos_raw DESC, vec_id)::INT AS rank
      |      FROM c)
      |SELECT q_id, rank, vec_id AS neighbor_id,
      |  floor(cos_raw * 1e6 + 0.5)::BIGINT AS cosine_e6
      |FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin)
}
