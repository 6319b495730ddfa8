"""Regenerate PLANS.md: the formatted physical plan of every bench headline
query at sf0.001 — the artifact for reviewing shuffle/broadcast/pushdown
shapes without re-running anything.

Usage: python tools/dump_plans.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    import __spark_entry__ as entrymod
    from bench import HEADLINE  # the bench's own query list — single source
    from bossarrowstorageengine_spark.session import build_session

    spark = build_session()
    qs = entrymod.queries()
    extra = ["q_text_tfidf", "q_funnel_conversion", "q_tpch_q7", "q_hof_array",
             "q_ann_lsh", "q_dedup_embedding", "q_arrowipc_partitioned",
             "q_join_bloom", "q_sample_weighted", "q_pack_chunks",
             # round 3: decorrelation-heavy TPC-H, exact IVF, curation filters
             "q_tpch_q2", "q_tpch_q21", "q_ann_ivf", "q_text_repetition",
             "q_dataset_mixture", "q_bpe_pairs",
             # round 4: kNN graph / semantic dedup, banded overlap join,
             # rate-capped domains
             "q_knn_graph", "q_semdedup", "q_join_interval_overlap",
             "q_domain_cap",
             # round 4 (late): chunking, entropy, MAD, running distinct,
             # mode, profiler, streaks, interpolation, entity CC, triangles
             "q_doc_chunk_overlap", "q_text_entropy", "q_outlier_mad",
             "q_win_running_distinct", "q_agg_mode", "q_schema_profile",
             "q_user_streaks", "q_rollup_interpolate", "q_corpus_summary",
             "q_text_readability", "q_graph_triangles",
             # round 4 (final): integrity audit, tokenize, cogroup,
             # as-of tolerance, BOSS-dialect compilations
             "q_integrity_audit", "q_tokenize_apply", "q_cogroup_apply",
             "q_join_asof_tolerance", "q_boss_select_project",
             "q_boss_group_join", "q_dedup_boilerplate",
             "q_langid_confusion", "q_session_paths", "q_embedding_drift",
             # round 4 (close): novelty, churn, sampling, balancing,
             # storage faces, windowed dedup
             "q_ngram_novelty", "q_churn_cohorts",
             "q_sample_topk_stratum", "q_lang_temperature_weights",
             "q_scan_merge_schema", "q_scan_dictionary",
             "q_dedup_within_window",
             # round 5: retrieval, sampling, dedup, skyline, graph entropy,
             # embedding profile, attribution, real-codec decode
             "q_text_bm25", "q_sample_reservoir", "q_dedup_url",
             "q_skyline_pareto", "q_markov_entropy", "q_embedding_dim_stats",
             "q_event_attribution", "q_multimodal_decode",
             # round 5 (batch 3): rollup tree, anomaly, ratio share, bands,
             # lateral, arrow UDF, power iteration, arrow cogroup
             "q_rollup_multi_grain", "q_event_anomaly", "q_win_ratio_share",
             "q_price_bands", "q_lateral_topk", "q_udf_arrow",
             "q_embedding_power_iter", "q_cogroup_arrow",
             # round 5 (batch 4): containment, PQ, label shift, freshness
             "q_dedup_containment", "q_ann_pq", "q_label_shift",
             "q_data_freshness",
             # round 5 (batch 5): Spark-4-native surfaces
             "q_scan_xml", "q_json_variant", "q_pipe_syntax",
             # round 5 (batch 6): BI classics
             "q_abc_analysis", "q_customer_rfm", "q_trend_linreg",
             # round 5 (batch 7): storage-mutation surface completion
             "q_storage_update", "q_storage_compact",
             "q_storage_timetravel_diff",
             # round 6: composed IVF-PQ, perplexity gate, BPE iteration 1,
             # materialized changefeed, schema-drift census
             "q_ann_ivfpq", "q_text_perplexity", "q_bpe_merge",
             "q_storage_changefeed", "q_schema_drift",
             # round 6 (batch 2): storage audit/rollback, quantified
             # patterns, sliding-span dedup, deflation, decontamination,
             # 2-iteration BPE trainer
             "q_storage_history", "q_storage_restore",
             "q_event_pattern_alt", "q_dedup_span_sliding",
             "q_embedding_deflation", "q_split_decontaminated",
             "q_bpe_train", "q_multimodal_audio_stats",
             "q_text_perplexity_backoff", "q_join_asof_nearest",
             "q_graph_communities",
             # round 8: N-iteration BPE trainer (weighted distinct-word
             # stream + checkpointed rules — final plan is corpus-free),
             # stream-stream interval join's batch face, interpolated
             # trigram LM
             "q_bpe_train_n", "q_stream_interval_join",
             "q_text_perplexity_interp", "q_storage_vacuum",
             "q_dedup_chunk_cdc",
             # round 9: end-to-end dedup decision pipeline
             "q_dedup_pipeline", "q_dedup_apply", "q_unigram_train", "q_unigram_prune",
             "q_dedup_chunk_incremental",
             # round 10: unigram EM schedule, chunk-grain apply,
             # session-gap window
             "q_unigram_em", "q_dedup_chunk_apply", "q_win_session_gap",
             "q_changefeed_consume", "q_unigram_hard_em",
             # round 11: chained hard-EM schedule, multi-probe LSH,
             # skew-safe hot-key window
             "q_unigram_hard_em_n", "q_ann_lsh_multiprobe", "q_win_salted",
             "q_ann_recall_report",
             # round 12: MV maintenance, feed schema evolution, persisted
             # ANN index maintained under mutations
             "q_mv_maintain", "q_changefeed_evolve",
             "q_ann_index_maintain",
             # round 12 late: feed checkpoint compaction, MV restore
             "q_feed_compact", "q_mv_restore",
             # round 13: feed retention vacuum, search over the maintained
             # LSM index, purge propagation, multi-MV fanout, vocab drift,
             # reworked linkage pair generator
             "q_feed_vacuum", "q_ann_lsh_maintained", "q_purge_propagate",
             "q_mv_fanout", "q_vocab_drift", "q_entity_components",
             # round 13 late: purge x restore guard, chained drift,
             # document-space purge
             "q_purge_restore_guard", "q_vocab_drift_n", "q_purge_text",
             # round 14: trained-family index maintenance, derived-face
             # purge (pack + fanout ledgers), changefeed consumer groups
             "q_ann_ivf_maintained", "q_purge_derived",
             "q_feed_consumer_groups",
             # round 15: full trained-family (IVF-PQ) maintenance with
             # delta-encoded codes, batch timestampAsOf face
             "q_ann_ivfpq_maintained", "q_timetravel_asof",
             "q_ann_generations",
             # round 16: payload-carrying generation roll, consumer-
             # position time travel
             "q_ann_generations_payload", "q_positions_asof"]
    out = [
        "# PLANS — physical plans of the bench headline queries",
        "",
        "Also includes selected non-headline plans (TF-IDF, funnel, Q7, "
        "array HOFs).",
        "",
        "Generated by `python tools/dump_plans.py` (sf0.001). Read for: "
        "`PushedFilters`/`ReadSchema` on scans, `BroadcastHashJoin` on dim "
        "joins, partial→final `HashAggregate` pairs, `TakeOrderedAndProject` "
        "for top-k, and how few `Exchange`s each plan carries.",
        "",
    ]
    # dict.fromkeys: keys listed in both HEADLINE and extra dump once
    for name in dict.fromkeys(list(HEADLINE) + extra):
        df = qs[name](spark, SF_DIR)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        out += [f"## {name}", "", "```", plan.rstrip(), "```", ""]
    (REPO / "PLANS.md").write_text("\n".join(out))
    print(f"wrote PLANS.md "
          f"({len(dict.fromkeys(list(HEADLINE) + extra))} plans)")


if __name__ == "__main__":
    main()
