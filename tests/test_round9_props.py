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


def test_lsh_hot_bucket_cap_star_splits_boilerplate_bucket(spark):
    """Adversarial all-identical corpus (round-9 verdict finding 2,
    round-10 verdict item 4): N identical documents put every doc behind
    ONE band signature per band; above _LSH_BUCKET_CAP that bucket must
    be STAR-SPLIT — every member pairs with the bucket minimum only
    (linear, not quadratic), so the mega-cluster still reaches verify +
    connected components instead of silently vanishing from dedup.
    Small duplicate groups (under the cap) must still pair normally."""
    from pyspark.sql import functions as F

    from bossarrowstorageengine_spark.operators.llm_pipeline import (
        _LSH_BUCKET_CAP,
        _band_signatures,
        _lsh_candidate_pairs,
        _minhash_table,
        _pipeline_edges,
    )

    boiler = "the same legal footer text repeated on every page of site"
    n_hot = _LSH_BUCKET_CAP + 10
    hot = spark.createDataFrame(
        [(i, boiler) for i in range(n_hot)], "doc_id long, text string")

    def cands(docs):
        bl = _band_signatures(_minhash_table(docs, 16), 16, 4)
        return _lsh_candidate_pairs(bl)

    got = {(r.doc_a, r.doc_b) for r in cands(hot).collect()}
    assert got == {(0, i) for i in range(1, n_hot)}, (
        "hot bucket above the cap must produce exactly the star pairs "
        "(min-id representative × every other member)")
    # the full pipeline front-end sees the same star pairs, verifies
    # them (identical docs: Jaccard 1 >= tau), and CC collapses the
    # whole mega-cluster into ONE component through the representative
    pc, pe = _pipeline_edges(hot)
    assert pc.count() == n_hot - 1 and pe.count() == n_hot - 1

    # a small duplicate group (below the cap) still pairs: recall intact
    small = spark.createDataFrame(
        [(i, boiler) for i in range(5)]
        + [(100 + i, f"unique filler document number {i} about topic {i}")
           for i in range(5)],
        "doc_id long, text string")
    got = {(r.doc_a, r.doc_b) for r in cands(small).collect()}
    expect = {(a, b) for a in range(5) for b in range(5) if a < b}
    assert expect <= got
    # at exactly the cap the bucket is still expanded (boundary is <=)
    at_cap = spark.createDataFrame(
        [(i, boiler) for i in range(_LSH_BUCKET_CAP)],
        "doc_id long, text string")
    n_pairs = cands(at_cap).count()
    assert n_pairs == _LSH_BUCKET_CAP * (_LSH_BUCKET_CAP - 1) // 2


def test_dedup_apply_accounting_closes(spark):
    """The APPLY rollup must conserve the corpus: per (lang, source),
    kept + dropped docs == all docs and kept + reclaimed chars == all
    chars — the acceptance report can never lose or invent bytes."""
    rows = QUERIES["q_dedup_apply"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_kept + r.n_dropped == r.n_docs, (r.lang, r.source)
    # cross-check the drop totals against the decision table itself:
    # every 'drop' row in q_dedup_pipeline must surface in the rollup,
    # and something must survive globally (a rollup that drops the whole
    # corpus would satisfy per-row accounting).
    pipeline = QUERIES["q_dedup_pipeline"](spark, SF).collect()
    n_drops = sum(1 for p in pipeline if p.action == "drop")
    assert sum(r.n_dropped for r in rows) == n_drops
    assert sum(r.n_kept for r in rows) >= 1
    import duckdb
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')")
    total_docs, total_chars = con.execute(
        "SELECT count(*), sum(n_chars) FROM documents").fetchone()
    assert sum(r.n_docs for r in rows) == total_docs
    assert sum(r.chars_kept + r.chars_reclaimed for r in rows) == total_chars


def test_unigram_train_matches_python_viterbi(spark):
    """q_unigram_train vs an independent pure-Python reference: rebuild
    the weighted word table and the scored vocab from the parquet with
    plain Python, run a dict-based Viterbi DP (same packed
    score*64 - n_pieces objective), and compare corpus NLL, corpus piece
    count, and every per-piece loss delta — the whole-algorithm check an
    engine-vs-engine EXACT replay cannot provide (both engines could
    share a bug)."""
    import math
    from collections import Counter

    import duckdb

    rows = QUERIES["q_unigram_train"](spark, SF).collect()
    assert rows
    from bossarrowstorageengine_spark.operators.curation import (
        _UNI_KMULTI,
        _UNI_MAXLEN,
        _UNI_MAX_WORD,
        _UNI_NP_BASE,
    )

    con = duckdb.connect()
    texts = con.execute(
        f"SELECT text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    words = Counter()
    for (t,) in texts:
        for w in t.split(" "):
            if 0 < len(w) < _UNI_MAX_WORD:
                words[w] += 1

    cand = Counter()
    for w, c in words.items():
        for s in range(len(w)):
            for k in range(1, min(_UNI_MAXLEN, len(w) - s) + 1):
                cand[w[s:s + k]] += c
    chars = {p: f for p, f in cand.items() if len(p) == 1}
    multi = sorted(
        ((p, f) for p, f in cand.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]))[:_UNI_KMULTI]
    vocab = dict(chars)
    vocab.update(dict(multi))
    S = sum(vocab.values())
    # Python round() is round-half-even; Spark/DuckDB round() is
    # half-away-from-zero — match THEIR semantics explicitly.
    import decimal

    def r0(x: float) -> int:
        return int(decimal.Decimal(x).quantize(
            0, rounding=decimal.ROUND_HALF_UP))

    logp = {p: r0(1_000_000 * math.log(f / S)) for p, f in vocab.items()}

    def viterbi_comb(w: str, excl: str | None) -> int:
        best = [0] + [None] * len(w)
        for i in range(1, len(w) + 1):
            b = None
            for k in range(1, min(_UNI_MAXLEN, i) + 1):
                p = w[i - k:i]
                if p == excl or p not in logp or best[i - k] is None:
                    continue
                v = best[i - k] + logp[p] * _UNI_NP_BASE - 1
                b = v if b is None else max(b, v)
            best[i] = b
        return best[len(w)]

    def corpus_nll(excl: str | None) -> tuple[int, int]:
        nll = pieces = 0
        for w, c in words.items():
            comb = viterbi_comb(w, excl)
            np_ = (-comb) % _UNI_NP_BASE
            score = (comb + np_) // _UNI_NP_BASE
            nll += c * -score
            pieces += c * np_
        return nll, pieces

    ref_nll, ref_pieces = corpus_nll(None)
    got = {r.piece: r for r in rows}
    assert set(got) == set(vocab)
    any_row = rows[0]
    assert any_row.corpus_nll_micro == ref_nll
    assert any_row.corpus_pieces == ref_pieces
    for p, r in got.items():
        assert r.freq == vocab[p]
        assert r.logp_micro == logp[p]
        if len(p) == 1:
            assert r.loss_delta_micro is None
        else:
            ref_delta = corpus_nll(p)[0] - ref_nll
            assert r.loss_delta_micro == ref_delta, p
            assert r.loss_delta_micro >= 0, p  # removal never helps
    # training must be non-degenerate: some multi-char piece carries
    # real corpus cost (the vocab is actually used by the segmenter)
    assert any(r.loss_delta_micro and r.loss_delta_micro > 0
               for r in rows if r.loss_delta_micro is not None)


def test_unigram_prune_drops_cheapest_pieces_and_renormalizes(spark):
    """The prune round must drop exactly the bottom-k multi-char pieces
    by q_unigram_train's own loss deltas (tie -> piece asc), never a
    single char, and the after-metrics must equal an independent Python
    Viterbi over the renormalized survivor model.  (NLL direction is NOT
    asserted: renormalizing over the shrunken frequency total raises
    every survivor's probability, so the after-NLL can legitimately be
    lower — only the FIXED-score deltas are one-sided.)"""
    import decimal
    import math

    from bossarrowstorageengine_spark.operators.curation import (
        _UNI_MAXLEN,
        _UNI_NP_BASE,
        _UNI_PRUNE_K,
    )

    train = {r.piece: r for r in
             QUERIES["q_unigram_train"](spark, SF).collect()}
    prune = QUERIES["q_unigram_prune"](spark, SF).collect()
    assert {r.piece for r in prune} == set(train)

    dropped = {r.piece for r in prune if not r.kept}
    assert len(dropped) == _UNI_PRUNE_K
    assert all(len(p) > 1 for p in dropped), "a single char was pruned"
    expect = {p for p, _ in sorted(
        ((p, r.loss_delta_micro) for p, r in train.items()
         if r.loss_delta_micro is not None),
        key=lambda x: (x[1], x[0]))[:_UNI_PRUNE_K]}
    assert dropped == expect

    any_row = prune[0]
    assert any_row.nll_before_micro == train[next(iter(train))].corpus_nll_micro
    # survivors renormalize UP (smaller total -> higher probability)...
    for r in prune:
        if r.kept:
            assert r.logp_after_micro >= train[r.piece].logp_micro

    # ...and the after-metrics replay exactly in Python: rebuild the
    # survivor model (half-away-from-zero rounding, Spark/DuckDB
    # semantics) and run the packed-long Viterbi over the word table.
    def r0(x: float) -> int:
        return int(decimal.Decimal(x).quantize(
            0, rounding=decimal.ROUND_HALF_UP))

    freqs = {r.piece: train[r.piece].freq for r in prune if r.kept}
    s2 = sum(freqs.values())
    logp2 = {p: r0(1_000_000 * math.log(f / s2)) for p, f in freqs.items()}

    import duckdb
    con = duckdb.connect()
    words = con.execute(
        "SELECT w, count(*) FROM (SELECT unnest(string_split(text, ' ')) "
        f"AS w FROM read_parquet('{SF}/documents.parquet')) "
        "WHERE len(w) > 0 AND len(w) < 16 GROUP BY w").fetchall()

    def comb(word: str) -> int:
        best = [0] + [None] * len(word)
        for i in range(1, len(word) + 1):
            b = None
            for k in range(1, min(_UNI_MAXLEN, i) + 1):
                p = word[i - k:i]
                if p not in logp2 or best[i - k] is None:
                    continue
                v = best[i - k] + logp2[p] * _UNI_NP_BASE - 1
                b = v if b is None else max(b, v)
            best[i] = b
        return best[len(word)]

    ref_nll = ref_pieces = 0
    for w, c in words:
        cb = comb(w)
        np_ = (-cb) % _UNI_NP_BASE
        ref_nll += c * -((cb + np_) // _UNI_NP_BASE)
        ref_pieces += c * np_
    assert any_row.nll_after_micro == ref_nll
    assert any_row.pieces_after == ref_pieces


def test_chunk_incremental_batch_face_matches_streaming(spark):
    """The oracle-gated batch face (q_dedup_chunk_incremental) must emit
    the SAME per-(batch, doc) report the streaming chunk_dedup_batch
    path writes for the identical doc_id % 2 split — the differential
    that makes the driver's DuckDB gate meaningful for the stream."""
    import os
    import shutil
    import uuid as _uuid

    from pyspark.sql import functions as F

    from bossarrowstorageengine_spark.streaming.chunk_dedup import (
        chunk_dedup_batch,
    )

    base = f"/tmp/spark_graft_stream/{_uuid.uuid4().hex}"
    idx, rep = f"{base}/index", f"{base}/report"
    os.makedirs(idx, exist_ok=True)
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text")
    try:
        chunk_dedup_batch(docs.filter(F.col("doc_id") % 2 == 0), 0, idx, rep)
        chunk_dedup_batch(docs.filter(F.col("doc_id") % 2 == 1), 1, idx, rep)
        stream_rows = {
            (r.batch_id, r.doc_id): (r.n_chunks, r.n_dup_chunks, r.dup_tokens)
            for r in spark.read.parquet(rep).collect()}
        batch_rows = {
            (r.batch_id, r.doc_id): (r.n_chunks, r.n_dup_chunks, r.dup_tokens)
            for r in QUERIES["q_dedup_chunk_incremental"](spark, SF).collect()}
        assert batch_rows == stream_rows
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_cc_min_label_matches_union_find(spark):
    """The shared connected-components core (_cc_min_label, now driving
    keep/drop decisions in two keys) vs an independent union-find over
    randomized edge lists — including chain graphs near the round cap
    and graphs ABOVE it (which must RAISE, never return split labels)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pytest as _pytest

    from bossarrowstorageengine_spark.operators.llm_pipeline import (
        _cc_min_label,
    )

    def uf_components(edges):
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        out = {}
        for n in parent:
            out[n] = find(n)
        # normalize: label = component min (find with path order can
        # already give it since we always parent toward the min root)
        return out

    from bossarrowstorageengine_spark.functions.components import (
        cc_min_label,
    )

    @settings(max_examples=8, deadline=None)
    @given(edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=30),
                  st.integers(min_value=0, max_value=30))
        .filter(lambda p: p[0] != p[1]),
        min_size=1, max_size=40))
    def check(edges):
        df = spark.createDataFrame(
            [(int(a), int(b)) for a, b in edges], ["doc_a", "doc_b"])
        got = {r.doc_id: r.cluster_id
               for r in _cc_min_label(df, max_rounds=40).collect()}
        assert got == uf_components(edges)
        # FLAG mode of the consolidated core (q_entity_components' face)
        # must produce the identical labels and report converged=True
        labels, conv = cc_min_label(df, max_rounds=40, strict=False)
        assert conv is True
        assert {r.node: r.label for r in labels.collect()} == got

    check()

    # a 5-node chain needs ~4 rounds; with max_rounds=2 the strict guard
    # must RAISE (split labels driving keep/drop silently would be the
    # bug) while flag mode reports converged=False for the same input
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], ["doc_a", "doc_b"])
    with _pytest.raises(RuntimeError, match="did not converge"):
        _cc_min_label(chain, max_rounds=2)
    _, conv = cc_min_label(chain, max_rounds=2, strict=False)
    assert conv is False
    # a budget exactly one past the fixpoint round still converges: a
    # 6-node path reaches its fixpoint at round 5 — detectable only by
    # round 6's no-change pass, so max_rounds=6 must accept it (the
    # every-round probe never needs slack; check_every was removed r17).
    labels, conv = cc_min_label(chain, max_rounds=20)
    assert conv is True
    assert {r.node: r.label for r in labels.collect()} == \
        {i: 0 for i in range(6)}
    path6 = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], ["doc_a", "doc_b"])
    labels, conv = cc_min_label(path6, max_rounds=6)
    assert conv is True
    assert {r.label for r in labels.collect()} == {0}
