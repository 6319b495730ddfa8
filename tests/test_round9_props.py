"""Round-9 behavioral tests: invariants of the end-to-end dedup decision
pipeline (q_dedup_pipeline) that the EXACT oracle replay cannot attest on
its own terms — the keeper/accounting CONTRACT, independent of whether
both engines agree on the bytes."""

from __future__ import annotations

from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
QUERIES = entrymod.queries()


def _pipeline_rows(spark):
    return QUERIES["q_dedup_pipeline"](spark, SF).collect()


def test_dedup_pipeline_keeper_is_cluster_minimal(spark):
    """Every cluster keeps EXACTLY ONE member, the keeper is the cluster
    minimum doc_id, and cluster_id IS that keeper — the determinism a
    re-run of the pipeline on re-sharded data must preserve."""
    rows = _pipeline_rows(spark)
    assert rows, "pipeline found no duplicate clusters at sf0.001"
    clusters = defaultdict(list)
    for r in rows:
        clusters[r.cluster_id].append(r)
    for cid, members in clusters.items():
        ids = sorted(m.doc_id for m in members)
        keeps = [m for m in members if m.action == "keep"]
        drops = [m for m in members if m.action == "drop"]
        assert len(members) >= 2, f"singleton cluster {cid} in output"
        assert len(keeps) == 1, f"cluster {cid}: {len(keeps)} keepers"
        assert keeps[0].doc_id == cid == ids[0], (
            f"cluster {cid}: keeper {keeps[0].doc_id} != min {ids[0]}")
        assert len(keeps) + len(drops) == len(members)


def test_dedup_pipeline_reclaimed_accounting(spark):
    """reclaimed_chars is the SAME value on every member row of a cluster
    and equals the sum of the DROPPED members' n_chars (the keeper's
    bytes are retained, never counted as reclaimed)."""
    rows = _pipeline_rows(spark)
    clusters = defaultdict(list)
    for r in rows:
        clusters[r.cluster_id].append(r)
    for cid, members in clusters.items():
        vals = {m.reclaimed_chars for m in members}
        assert len(vals) == 1, f"cluster {cid}: inconsistent reclaimed"
        expect = sum(m.n_chars for m in members if m.action == "drop")
        assert vals.pop() == expect, f"cluster {cid}: wrong reclaimed sum"


def test_dedup_pipeline_verify_rejects_lsh_false_positives(spark):
    """The permissive 8x2 LSH candidate set must be a STRICT superset of
    the verified pairs — the verification stage exists because 2-row
    bands collide on weak similarity; if every candidate survived, the
    pipeline would silently degrade to rubber-stamping LSH."""
    from pyspark.sql import functions as F

    from bossarrowstorageengine_spark.catalog import load_table
    from bossarrowstorageengine_spark.operators.llm_pipeline import (
        _PIPE_NPERM,
        _PIPE_ROWS_PER_BAND,
        _band_signatures,
        _minhash_table,
    )

    sf = "/root/testdata/sf0.01"  # sf0.001 has too few false positives
    d = load_table(spark, sf, "documents")
    bands_long = _band_signatures(
        _minhash_table(d, _PIPE_NPERM),
        _PIPE_NPERM, _PIPE_NPERM // _PIPE_ROWS_PER_BAND)
    n_cand = (
        bands_long.alias("a")
        .join(bands_long.alias("b"),
              (F.col("a.sig") == F.col("b.sig"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select("a.doc_id", "b.doc_id").distinct().count()
    )
    out = QUERIES["q_dedup_pipeline"](spark, sf)
    # verified EDGES <= verified member pairs; compare against kept pairs
    # via cluster membership: n verified pairs >= members - clusters.
    agg = out.groupBy("cluster_id").count().collect()
    n_members = sum(r["count"] for r in agg)
    n_clusters = len(agg)
    # spanning-tree lower bound on verified edges
    min_edges = n_members - n_clusters
    assert n_cand > min_edges, (
        f"LSH candidates ({n_cand}) do not exceed the verified spanning "
        f"bound ({min_edges}) — verification appears to reject nothing")
