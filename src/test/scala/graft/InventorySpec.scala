package graft

import org.apache.spark.sql.types._

/** Whole-inventory structural checks. Analysis (schema resolution) runs the
  * full Catalyst analyzer on every declared query without executing — cheap
  * and catches wiring/typo/type bugs across all ~70 queries. */
class InventorySpec extends SparkSpec {

  test("query names are unique and oracle keys ⊆ query keys") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size === names.size, "duplicate query names")
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
  }

  test("inventory covers every SURVEY §2 family") {
    val names = SparkEntry.queries.keySet
    val mustHave = Seq(
      "scan_parquet", "scan_prune", "scan_csv_json", "sink_parquet",
      "proj_expr", "filter_conj", "filter_null", "filter_range_ts",
      "join_inner_eq", "join_left", "join_right", "join_full", "join_semi",
      "join_anti", "join_broadcast", "join_theta", "join_range", "join_asof",
      "join_cross",
      "agg_hash", "agg_distinct", "agg_approx_distinct", "agg_stats",
      "agg_grouping_sets", "agg_collect_sorted", "agg_having",
      "agg_median", "agg_pivot", "agg_approx_pctile", "lc_features",
      "lc_periods", "join_sky", "join_skew_salted", "set_intersect_all",
      "sim_ivf", "scan_csv", "sink_bucketed", "fn_bitwise", "win_first_last",
      "stream_custom_state", "scan_frames", "dedup_cluster", "text_tfidf",
      "mm_framesample", "sink_partitioned", "mm_resize", "stream_join", "dedup_keep",
      "agg_sketch_reagg", "filter_sample", "filter_subquery", "join_sky_nn", "lc_fold",
      "join_dpp", "scan_schema_merge", "fn_struct",
      "win_rank", "win_lag_lead", "win_frame_rows", "win_frame_range",
      "win_topk_group", "win_ntile_cume", "sort_multi", "topk_limit",
      "set_union_all", "set_union_distinct", "set_intersect", "set_except",
      "fn_string", "fn_date", "fn_math", "fn_cond", "fn_array", "fn_map_json",
      "fn_cast",
      "text_stats", "text_tf", "text_tokens", "text_langid", "text_quality",
      "text_fingerprint",
      "dedup_exact", "dedup_minhash", "dedup_simhash", "dedup_ngram",
      "dedup_embed",
      "sim_cosine", "sim_knn_topk", "sim_ann_lsh", "multimodal_join",
      "stream_tumbling", "stream_sliding", "stream_session",
      "stream_stateful_dedup", "stream_watermark", "stream_foreachbatch",
      "udf_scalar", "udaf_typed", "udtf_gen", "mm_decode",
      "scan_text", "sink_zorder", "join_bloom", "lc_ensemble",
      "lc_variability", "text_chunk", "text_pii", "text_heavyhitters",
      "sim_centroid", "agg_bitmap_distinct", "text_domains", "mm_audio",
      "pipeline_curate", "graph_cc", "sim_multiprobe", "sim_pq",
      "text_perplexity", "text_bpe", "dedup_spans",
      "quality_classifier", "lc_structfunc", "dedup_semantic", "pipeline_pack",
      "lc_smooth", "stream_topk", "pipeline_lightcurve",
      "dedup_index_probe", "sim_ivfpq", "sim_index_probe",
      "sim_index_maintain", "sim_refine", "table_stats")
    val missing = mustHave.filterNot(names)
    assert(missing.isEmpty, s"missing: $missing")
  }

  // Queries whose QDef fn executes eagerly on CONSTRUCTION (sink writes, full
  // Structured Streaming runs) — the "analysis only" premise doesn't hold for
  // them; they are covered by Verify/StreamingSpec.
  private val eager = Set("stream_watermark", "stream_foreachbatch",
    "sink_parquet", "sink_bucketed", "sink_partitioned", "sink_custom_v2",
    "join_dpp",
    "scan_schema_merge", "scan_orc", "scan_text", "sink_zorder",
    "stream_custom_state", "stream_topk", "stream_exactly_once",
    "stream_changefeed", // full two-pass streaming run on construction
    "stream_custom_state_tws", // full transformWithState run on construction
    "stream_tws_timers", // full event-time-timer tws run on construction
    "scan_v2_stream", // full micro-batch drain of the connector on construction
    "sink_v2_stream", // full streaming write into the log table on construction
    "sink_v2_log", // three log-committed V2 writes on construction
    "dedup_index_probe", // writes the bucketed band index on construction
    "dedup_index_refit", // build + append + atomic replace commits on construction
    "sim_index_probe", "sim_index_maintain", // write the IVF index on construction
    "sim_graph_ann_persist", // commits the graph index artifact on construction
    "sim_graph_ann_maintain", // day-0 build + day-1 append commits on construction
    "sim_graph_ann_refit", // build + append + atomic replace commits on construction
    "sim_index_delete", // commits codes + DV sidecar + optimize + vacuum on construction
    "stream_index_maintain", // full log-tailing stream runs on construction
    "stream_dedup_maintain", // full log-tailing stream runs on construction
    "dedup_autotune", // tunes, applies, and require-verifies on construction
    "sim_autotune", // same: fused tuning pass + standalone apply on construction
    "pipeline_dataloader", // manifest localCheckpoint + loader-law requires on construction
    "dedup_cluster", "dedup_keep", // localCheckpoint materializes edges on construction
    "graph_pagerank", "graph_cc",  // localCheckpoint per iteration
    "table_wap",                   // stages, audits, and publishes on construction
    "table_txn_multi",             // drives the full two-phase txn on construction
    "table_matview_join",          // three refresh cycles commit on construction
    "stream_transient",            // full association stream run on construction
    "stream_transient_watermark")  // two-phase eviction/resurrection stream run

  test("every batch query analyzes (schema resolves) against the fixtures") {
    val skip = eager
    SparkEntry.all.filterNot(q => skip(q.name)).foreach { q =>
      val schema = q.fn(spark, sf).schema // forces full analysis
      assert(schema.nonEmpty, s"${q.name}: empty schema")
      // Declared outputs stick to oracle-comparable types.
      schema.fields.foreach { f =>
        assert(
          Seq(IntegerType, LongType, DoubleType, StringType, BooleanType,
            TimestampType, TimestampNTZType, DateType, FloatType).contains(f.dataType) ||
            f.dataType.isInstanceOf[ArrayType],
          s"${q.name}.${f.name}: unexpected type ${f.dataType}")
      }
    }
  }

  test("no declared output column is FloatType or DecimalType (oracle parity)") {
    val skip = eager
    SparkEntry.all.filterNot(q => skip(q.name)).foreach { q =>
      q.fn(spark, sf).schema.fields.foreach { f =>
        assert(f.dataType != FloatType, s"${q.name}.${f.name} is FLOAT")
        assert(!f.dataType.isInstanceOf[DecimalType],
          s"${q.name}.${f.name} is DECIMAL (DuckDB comparisons drift)")
      }
    }
  }

  test("flagship entry returns rows at sf0.001 (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // The README/SKILL query counts have been hand-bumped every round; this
  // pins them to the one source of truth (SparkEntry.all) so a missed bump
  // fails the build instead of shipping stale docs. sbt runs tests with
  // cwd = the repo root, so relative paths resolve.
  test("README/SKILL query counts match the declared inventory") {
    val total = SparkEntry.all.size
    val oracled = SparkEntry.all.count(_.oracle.isDefined)
    def read(p: String) = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
    val readme = read("README.md")
    assert(readme.contains(s"$total declared queries"),
      s"README.md layout row must read '$total declared queries'")
    assert(readme.contains(s"All $oracled oracle-bearing queries"),
      s"README.md verify section must read 'All $oracled oracle-bearing queries'")
    assert(readme.contains(s"${total - oracled} streaming/approx ops"),
      s"README.md must count ${total - oracled} rows-only ops")
    val skill = read(".claude/skills/verify/SKILL.md")
    assert(skill.contains(s"$total queries, $oracled oracled"),
      s"verify SKILL.md must read '$total queries, $oracled oracled'")
  }
}
