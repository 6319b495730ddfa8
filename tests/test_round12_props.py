"""Round-12 behavioral tests: the MV maintainer's version-history
invariants and the evolved feed's old-reader guarantee — the contracts
an EXACT oracle replay cannot attest on its own terms."""

from __future__ import annotations

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
QUERIES = entrymod.queries()


def test_mv_maintain_versions_consistent_and_nonvacuous(spark):
    """Every persisted MV version must equal the direct aggregate of its
    SAME-version source snapshot (consistent=True is engine-computed per
    row — the maintenance invariant at every point of the history, not a
    constant), and the history must be non-trivial: version 2 moves some
    lang's chars (the update commit) and version 3 drops docs somewhere
    (the delete commit)."""
    rows = QUERIES["q_mv_maintain"](spark, SF).collect()
    assert rows
    assert all(r.consistent for r in rows)
    by_ver = {k: {r.lang: r for r in rows if r.mv_version == k}
              for k in (1, 2, 3)}
    # the MV table carries exactly one row per (version, lang), with the
    # same lang set at every version (deletes zero a lang, never drop it)
    assert len(rows) == sum(len(v) for v in by_ver.values())
    assert set(by_ver[1]) == set(by_ver[2]) == set(by_ver[3])
    assert any(by_ver[2][lg].chars != by_ver[1][lg].chars
               for lg in by_ver[1]), "no lang saw the update — vacuous"
    assert any(by_ver[3][lg].docs < by_ver[2][lg].docs
               for lg in by_ver[2]), "no lang saw the delete — vacuous"
    # the update commit never changes doc counts
    assert all(by_ver[2][lg].docs == by_ver[1][lg].docs
               for lg in by_ver[1])


def test_changefeed_evolve_old_schema_consumer_still_reads(spark):
    """After the producer adds a column, a consumer deployed with the
    PRE-evolution schema must keep reading the whole feed — both the old
    commit and the new one (projecting the added column away) — with no
    rewrite of either: adding a column never strands a deployed reader."""
    import os

    from pyspark.sql import functions as F

    from bossarrowstorageengine_spark.operators.scans import _SCRATCH_ROOT

    # materialize the evolved feed (the query rebuilds it from scratch;
    # _scratch wipes on call, so derive the path instead of re-calling it)
    rows = QUERIES["q_changefeed_evolve"](spark, SF).collect()
    assert {r.reason for r in rows} == {"unspecified", "short_doc_purge"}
    feed = os.path.join(_SCRATCH_ROOT, os.path.basename(SF), "cf_evolve")
    old = (spark.read.format("arrowipc")
           .option("columns", "doc_id,lang,delta,change,commit_seq")
           .schema("doc_id long, lang string, delta long, change string, "
                   "commit_seq long")
           .load(feed))
    assert old.columns == ["doc_id", "lang", "delta", "change",
                           "commit_seq"]
    got = {r.commit_seq: r.n for r in
           old.groupBy("commit_seq").agg(
               F.count(F.lit(1)).alias("n")).collect()}
    want = {r.commit_seq: 0 for r in rows}
    for r in rows:
        want[r.commit_seq] += r.n_rows
    assert got == want and set(got) == {1, 2}


def test_ann_recall_report_trained_methods(spark):
    """The folded-in trained methods (VERDICT r11 item 3) must show the
    index trade honestly: every trained method's total recall@3 is at
    least single-probe LSH's (the bar the VERDICT set); IVF actually
    PRUNES (scans a strict subset of brute's candidates) while beating
    both LSH variants here; PQ scans every candidate (its saving is
    compression, not pruning — the count must equal brute's); IVF-PQ's
    ADC set is bounded by nprobe/K of the corpus plus the probed lists'
    skew, strictly under brute."""
    rows = QUERIES["q_ann_recall_report"](spark, SF).collect()
    by = {(r.method, r.probe_id): r for r in rows}
    methods = {m for m, _ in by}
    assert methods == {"brute", "lsh", "lsh_multiprobe",
                       "ivf", "pq", "ivfpq"}
    brute = {p: r for (m, p), r in by.items() if m == "brute"}

    def total(m):
        return sum(r.hits for (mm, _), r in by.items() if mm == m)

    lsh_total = total("lsh")
    for m in ("ivf", "pq", "ivfpq"):
        # every trained method reports all three probes (no empty sets)
        assert {p for (mm, p) in by if mm == m} == set(brute), m
        assert total(m) >= lsh_total, m
    # the coarse quantizer prunes AND wins on this corpus
    assert all(by[("ivf", p)].n_candidates < brute[p].n_candidates
               for p in brute)
    assert total("ivf") >= total("lsh_multiprobe")
    # PQ is compression, not pruning: full scan, cheap per candidate
    assert all(by[("pq", p)].n_candidates == brute[p].n_candidates
               for p in brute)
    # IVF-PQ's ADC candidate set stays under the full scan
    assert all(by[("ivfpq", p)].n_candidates < brute[p].n_candidates
               for p in brute)


def test_survey_total_line_matches_registry():
    """SURVEY.md's 'Total declared surface' line must equal the live
    registry count (ADVICE r11: the line sat stale at 252 for six
    rounds; now it cannot drift)."""
    import re
    from pathlib import Path

    text = (Path(__file__).resolve().parents[1] / "SURVEY.md").read_text()
    m = re.search(r"Total declared surface: (\d+) queries", text)
    assert m, "SURVEY.md total-surface line missing"
    assert int(m.group(1)) == len(QUERIES), (
        f"SURVEY.md says {m.group(1)} queries; registry has "
        f"{len(QUERIES)} — update the §2 total line")


def test_ann_index_maintain_consistent_and_nonvacuous(spark):
    """The incrementally maintained LSH index must equal the from-scratch
    re-bucketing on EVERY bucket (consistent is engine-computed), and the
    scenario must be non-trivial: the negation update re-buckets every
    updated vector (all 8 projection signs flip), the delete removes
    rows, and the predicates overlap so some vectors re-bucket at commit
    1 AND die at commit 2 (the last-wins application path)."""
    from bossarrowstorageengine_spark.catalog import load_table

    rows = QUERIES["q_ann_index_maintain"](spark, SF).collect()
    assert rows
    assert all(r.consistent for r in rows)
    n_total = sum(r.n_vecs for r in rows)
    e = load_table(spark, SF, "embeddings")
    n_corpus = e.count()
    n_deleted = e.filter("vec_id % 5 = 0").count()
    assert n_total == n_corpus - n_deleted  # deletes really left the index
    assert n_deleted > 0
    # overlap: at least one vector matched BOTH mutation predicates
    assert e.filter("vec_id % 7 = 3 AND vec_id % 5 = 0").count() > 0
