"""Operator surface (SURVEY.md §2 Part B) — importing this package populates
the query/oracle registries in ``registry``."""

from __future__ import annotations

import importlib

from bossarrowstorageengine_spark.operators.registry import ORACLES, QUERIES

#: Operator-family modules; each registers its queries on import.
_MODULES = [
    "aggregates",
    "boss",
    "curation",
    "event_time",
    "filters",
    "graph",
    "joins",
    "llm_pipeline",
    "multimodal",
    "reshape",
    "scalar_funcs",
    "scans",
    "setops",
    "sorts",
    "subqueries",
    "training_data",
    "udfs",
    "windows",
]

for _m in _MODULES:
    importlib.import_module(f"bossarrowstorageengine_spark.operators.{_m}")

#: The driver's correctness gate checks the FIRST 50 keys of ``queries()``
#: in dict order, so this window is re-curated each round (the rotation
#: POLICY is documented in SURVEY.md §5 and ENFORCED by
#: ``tests/test_driver_window.py``):
#:
#:   1. every key with no driver-green row in any committed
#:      CORRECTNESS_r*.json (new operators + never-sampled backlog);
#:   2. every key in ``_MODIFIED_UNATTESTED`` below (implementation changed
#:      after its newest green row — the row attests stale behavior);
#:   3. remaining slots rotate through already-green keys, OLDEST green
#:      round first (alphabetical within a round) — so long-unverified
#:      greens are re-attested opportunistically, ~20 per round once the
#:      backlog clears (full re-attestation cycle ≈ surface/20 rounds).
#:
#: Keys absent from this list follow in registration order.
_DRIVER_WINDOW = [
    # -- 1. never driver-sampled: 29 new round-5 operators + the 14-key
    #       backlog round 4 left outside its window.  (43 + the 7 modified
    #       keys below fill all 50 slots — no rotation fill this round.)
    "q_abc_analysis",
    "q_customer_rfm",
    "q_trend_linreg",
    "q_scan_xml",
    "q_json_variant",
    "q_pipe_syntax",
    "q_dedup_containment",
    "q_ann_pq",
    "q_label_shift",
    "q_data_freshness",
    "q_rollup_multi_grain",
    "q_event_anomaly",
    "q_win_ratio_share",
    "q_price_bands",
    "q_lateral_topk",
    "q_udf_arrow",
    "q_embedding_power_iter",
    "q_cogroup_arrow",
    "q_boss_group_join",
    "q_boss_select_project",
    "q_churn_cohorts",
    "q_dedup_boilerplate",
    "q_dedup_url",
    "q_dedup_within_window",
    "q_embedding_dim_stats",
    "q_embedding_drift",
    "q_event_attribution",
    "q_join_asof_tolerance",
    "q_lang_temperature_weights",
    "q_langid_confusion",
    "q_markov_entropy",
    "q_multimodal_decode",
    "q_ngram_novelty",
    "q_sample_reservoir",
    "q_sample_topk_stratum",
    "q_scan_dictionary",
    "q_scan_merge_schema",
    "q_session_paths",
    "q_skyline_pareto",
    "q_text_bm25",
    "q_storage_update",
    "q_storage_compact",
    "q_storage_timetravel_diff",
    # -- 2. green row exists but predates the current implementation.
    "q_sim_search",
    "q_scan_arrow_roundtrip",
    "q_dedup_embedding",
    "q_entity_components",
    "q_corpus_summary",
    "q_storage_delete",
    "q_storage_merge",
]

#: Keys whose CURRENT implementation postdates their newest driver-green
#: row (re-curated each round; drives window priority 2 above).  Round 5:
#: q_sim_search / q_scan_arrow_roundtrip / q_dedup_embedding were rewritten
#: in r3-r4 after their r2 rows; q_entity_components grew a ``converged``
#: column, q_corpus_summary moved to the groupingSets API, and the
#: q_storage_* pair sits on the reworked CoW rewrite path (repartition +
#: fileListPath planning) this round.
_MODIFIED_UNATTESTED = [
    "q_sim_search",
    "q_scan_arrow_roundtrip",
    "q_dedup_embedding",
    "q_entity_components",
    "q_corpus_summary",
    "q_storage_delete",
    "q_storage_merge",
]


def _reorder_registry() -> None:
    missing = [k for k in _DRIVER_WINDOW if k not in QUERIES]
    if missing:
        raise ValueError(f"_DRIVER_WINDOW keys not registered: {missing}")
    ordered = {k: QUERIES[k] for k in _DRIVER_WINDOW}
    ordered.update({k: v for k, v in QUERIES.items() if k not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)
    oracles = {k: ORACLES[k] for k in ordered if k in ORACLES}
    ORACLES.clear()
    ORACLES.update(oracles)


_reorder_registry()

__all__ = ["QUERIES", "ORACLES"]
