package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each entry pairs a Spark query (graft.Queries) with DuckDB oracle SQL
  * (graft.Oracle); names and column aliases match exactly. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The pipeline's A2 accounting surface: route fan-out → per-sink counts. */
  def entry(spark: SparkSession): DataFrame =
    Queries.qSinkCounts(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + training-data ops. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Queries.q1Agg _),
    "q_parse_extract" -> (Queries.qParseExtract _),
    "q_parse_json" -> (Queries.qParseJson _),
    "q_normalize_coalesce" -> (Queries.qNormalizeCoalesce _),
    "q_map_filter" -> (Queries.qMapFilter _),
    "q_dedup_apply" -> (Queries.qDedupApply _),
    "q_truncate_guard" -> (Queries.qTruncateGuard _),
    "q_enrich_broadcast" -> (Queries.qEnrichBroadcast _),
    "q_route_explode" -> (Queries.qRouteExplode _),
    "q_sink_counts" -> (Queries.qSinkCounts _),
    "q_source_sink_counts" -> (Queries.qSourceSinkCounts _),
    "q_fanin_union" -> (Queries.qFaninUnion _),
    "q_deadletter" -> (Queries.qDeadletter _),
    "q_window_hourly" -> (Queries.qWindowHourly _),
    "q_topk_users" -> (Queries.qTopkUsers _),
    "q_distinct" -> (Queries.qDistinct _),
    "q_semi_join" -> (Queries.qSemiJoin _),
    "q_anti_join" -> (Queries.qAntiJoin _),
    "q_window_rank" -> (Queries.qWindowRank _),
    "q_rollup" -> (Queries.qRollup _),
    "q_join_agg" -> (Queries.qJoinAgg _),
    "q_dedup_exact" -> (Queries.qDedupExact _),
    "q_dedup_minhash" -> (Queries.qDedupMinhash _),
    "q_dedup_simhash" -> (Queries.qDedupSimhash _),
    "q_dedup_simhash_near" -> (Queries.qDedupSimhashNear _),
    "q_dedup_image" -> (Queries.qDedupImage _),
    "q_dedup_ngram" -> (Queries.qDedupNgram _),
    "q_dedup_embed" -> (Queries.qDedupEmbed _),
    "q_dedup_embed_lsh" -> (Queries.qDedupEmbedLsh _),
    "q_dedup_near_apply" -> (Queries.qDedupNearApply _),
    "q_dedup_components" -> (Queries.qDedupComponents _),
    "q_sessionize" -> (Queries.qSessionize _),
    "q_ann_cosine" -> (Queries.qAnnCosine _),
    "q_ann_lsh" -> (Queries.qAnnLsh _),
    "q_ann_ivf" -> (Queries.qAnnIvf _),
    "q_parse_syslog" -> (Queries.qParseSyslog _),
    "q_grok_extract" -> (Queries.qGrokExtract _),
    "q_grok_httpd" -> (Queries.qGrokHttpd _),
    "q_grok_syslog5424" -> (Queries.qGrokSyslog5424 _),
    "q_grok_haproxy" -> (Queries.qGrokHaproxy _),
    "q_grok_postgres" -> (Queries.qGrokPostgres _),
    "q_grok_multiline" -> (Queries.qGrokMultiline _),
    "q_journald_fields" -> (Queries.qJournaldFields _),
    "q_lang_id" -> (Queries.qLangId _),
    "q_quality" -> (Queries.qQuality _),
    "q_quality_score" -> (Queries.qQualityScore _),
    "q_token_count" -> (Queries.qTokenCount _),
    "q_fingerprint" -> (Queries.qFingerprint _),
    "q_pii_redact" -> (Queries.qPiiRedact _),
    "q_url_canonical" -> (Queries.qUrlCanonical _),
    "q_url_dedup" -> (Queries.qUrlDedup _),
    "q_repetition" -> (Queries.qRepetition _),
    "q_paragraph_dedup" -> (Queries.qParagraphDedup _),
    "q_paragraph_apply" -> (Queries.qParagraphApply _),
    "q_tfidf" -> (Queries.qTfidf _),
    "q_corpus_assemble" -> (Queries.qCorpusAssemble _),
    "q_sample_stratified" -> (Queries.qSampleStratified _),
    "q_pack_shards" -> (Queries.qPackShards _),
    "q_bpe_encode" -> (Queries.qBpeEncode _),
    "q_token_shards" -> (Queries.qTokenShards _),
    "q_pack_sequences" -> (Queries.qPackSequences _),
    "q_dup_spans" -> (Queries.qDupSpans _),
    "q_dup_spans_apply" -> (Queries.qDupSpansApply _),
    "q_decontaminate" -> (Queries.qDecontaminate _),
    "q_multimodal" -> (Queries.qMultimodal _),
    "q_multimodal_image" -> (Queries.qMultimodalImage _),
    "q_multimodal_audio" -> (Queries.qMultimodalAudio _),
    "q_multimodal_video" -> (Queries.qMultimodalVideo _),
    "q_corpus_clean" -> (Queries.qCorpusClean _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracle.sql
}
