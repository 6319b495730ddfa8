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
    from bossarrowstorageengine_spark.catalog import load_table
    from bossarrowstorageengine_spark.operators.llm_pipeline import (
        _pipeline_edges,
    )

    sf = "/root/testdata/sf0.01"  # sf0.001 has too few false positives
    cand, edges = _pipeline_edges(load_table(spark, sf, "documents"))
    n_cand, n_edges = cand.count(), edges.count()
    assert n_edges > 0, "verification rejected every candidate"
    assert n_cand > n_edges, (
        f"LSH produced {n_cand} candidates but verification kept all "
        f"{n_edges} — the tau gate appears to reject nothing (a "
        "spanning-bound version of this assertion was vacuous; compare "
        "the ACTUAL edge count)")


def test_dedup_apply_accounting_closes(spark):
    """The APPLY rollup must conserve the corpus: per (lang, source),
    kept + dropped docs == all docs and kept + reclaimed chars == all
    chars — the acceptance report can never lose or invent bytes."""
    rows = QUERIES["q_dedup_apply"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_kept + r.n_dropped == r.n_docs, (r.lang, r.source)
        assert r.n_kept >= 1 or r.n_docs == r.n_dropped
    import duckdb
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')")
    total_docs, total_chars = con.execute(
        "SELECT count(*), sum(n_chars) FROM documents").fetchone()
    assert sum(r.n_docs for r in rows) == total_docs
    assert sum(r.chars_kept + r.chars_reclaimed for r in rows) == total_chars
