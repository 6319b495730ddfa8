"""Partitioning-determinism tests (SURVEY.md §5.4): every declared query
must return identical values regardless of shuffle width — the property
that makes results reproducible when the same code moves from local[32] to
a 1000-executor cluster.

A representative query per family runs under two very different
``spark.sql.shuffle.partitions`` settings; canonicalized results must be
identical (not just approximately — the §8 rounding discipline is what
makes this exact)."""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.01"
QUERIES = entrymod.queries()

#: One query per operator family, weighted toward shuffle-heavy shapes.
REPRESENTATIVE = [
    "q_agg_basic",        # partial+final hash aggregate
    "q_join_multiway",    # fact⋈fact shuffle + broadcasts
    "q_join_asof",        # union + window (single wide shuffle)
    "q_win_rank",         # window with tiebreak discipline
    "q_sort_multi",       # global top-k
    "q_dedup_near",       # minhash-LSH (hash-bucketed self pairs)
    "q_sim_search",       # broadcast + per-probe top-k
    "q_stream_session",   # session windows
    "q_pivot",            # pivoted aggregate
    "q_tpch_q10",         # composite join+agg+top-k
    # round 5: the new fixed-point / rounding-discipline shapes
    "q_markov_entropy",        # truncated-term entropy sums
    "q_embedding_power_iter",  # integer Gramian-free PCA step
    "q_dedup_containment",     # inverted-index directed pairs
    "q_win_ratio_share",       # integer-ppm windowed shares
    "q_text_bm25",             # float scoring + rounded top-k ordering
    "q_customer_rfm",          # quartile-boundary integer scoring
    # round 5 (storage): full CoW scenario — write→update→delete→diff; the
    # rewrite's repartition(K) and the diff join must not leak partitioning
    # into results.
    "q_storage_timetravel_diff",
]


def _rows(spark, name: str, shuffle_partitions: int):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        rows = QUERIES[name](spark, SF).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

    def canon_cell(v):
        if isinstance(v, float):
            return round(v, 9) if math.isfinite(v) else repr(v)
        return v

    return sorted(tuple(canon_cell(c) for c in row) for row in rows)


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_result_invariant_to_shuffle_width(spark, name):
    assert _rows(spark, name, 5) == _rows(spark, name, 32), (
        f"{name} result depends on shuffle partitioning")
