"""Round-10 behavioral tests: cross-key differentials and pure-Python
references for the new keys — the contracts an EXACT oracle replay
cannot attest on its own terms."""

from __future__ import annotations

from collections import defaultdict

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
QUERIES = entrymod.queries()


def test_win_session_gap_islands_match_sessionize(spark):
    """The per-event gaps-and-islands annotation must roll up to EXACTLY
    q_sessionize's per-session table (same 30-min strict-> boundary):
    identical session set, event counts, and durations — two
    implementations of the same island rule can never disagree."""
    per_event = QUERIES["q_win_session_gap"](spark, SF).collect()
    sessions = {(r.user_id, r.session_seq): (r.n_events, r.duration_ms)
                for r in QUERIES["q_sessionize"](spark, SF).collect()}

    rolled = defaultdict(list)
    for r in per_event:
        rolled[(r.user_id, r.session_seq)].append(r)
    assert set(rolled) == set(sessions)
    for key, members in rolled.items():
        n_events, duration_ms = sessions[key]
        assert len(members) == n_events, key
        # every member row agrees on the island aggregates
        assert {m.session_events for m in members} == {n_events}, key
        assert {m.session_ms for m in members} == {duration_ms}, key
        # positions are a permutation of 1..n
        assert sorted(m.pos_in_session for m in members) == \
            list(range(1, n_events + 1)), key


def test_win_session_gap_gap_and_burst_invariants(spark):
    """Within-island gaps are <= 30 min, the first event of every island
    has a NULL gap or one > 30 min, and n_burst_5min is at least 1 (the
    RANGE frame always includes the current row) and never exceeds the
    event's position count within its user."""
    rows = QUERIES["q_win_session_gap"](spark, SF).collect()
    assert rows
    by_island = defaultdict(list)
    for r in rows:
        by_island[(r.user_id, r.session_seq)].append(r)
    for key, members in by_island.items():
        members.sort(key=lambda m: m.pos_in_session)
        first, rest = members[0], members[1:]
        assert first.gap_ms is None or first.gap_ms > 30 * 60 * 1000, key
        for m in rest:
            assert m.gap_ms is not None and m.gap_ms <= 30 * 60 * 1000, key
    for r in rows:
        assert r.n_burst_5min >= 1


def test_unigram_em_matches_python_em(spark):
    """q_unigram_em vs an independent pure-Python EM reference: rebuild
    the weighted word table and seed vocab from the parquet, then run
    the SAME shrink schedule (Viterbi-evaluate → bottom-k prune by loss
    delta with the piece tiebreak → renormalize → repeat) in plain
    Python and compare EVERY trace row — vocab sizes, corpus NLL, and
    piece counts per round.  A whole-algorithm check neither the EXACT
    oracle replay (both engines could share a bug) nor the single-round
    prune test can provide."""
    import decimal
    import math
    from collections import Counter

    import duckdb

    from bossarrowstorageengine_spark.operators.curation import (
        _UNI_EM_ROUNDS,
        _UNI_KMULTI,
        _UNI_MAXLEN,
        _UNI_MAX_WORD,
        _UNI_NP_BASE,
        _UNI_PRUNE_K,
    )

    got = sorted(QUERIES["q_unigram_em"](spark, SF).collect(),
                 key=lambda r: r.round)
    assert [r.round for r in got] == list(range(_UNI_EM_ROUNDS + 1))

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
    vocab = {p: f for p, f in cand.items() if len(p) == 1}
    vocab.update(dict(sorted(
        ((p, f) for p, f in cand.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]))[:_UNI_KMULTI]))

    def r0(x: float) -> int:
        # Spark/DuckDB round() is half-away-from-zero, not banker's
        return int(decimal.Decimal(x).quantize(
            0, rounding=decimal.ROUND_HALF_UP))

    def normalize(freqs: dict) -> dict:
        s = sum(freqs.values())
        return {p: r0(1_000_000 * math.log(f / s)) for p, f in freqs.items()}

    def viterbi_comb(w: str, logp: dict, excl: str | None) -> int:
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

    def corpus_eval(logp: dict, excl: str | None) -> tuple[int, int]:
        nll = pieces = 0
        for w, c in words.items():
            comb = viterbi_comb(w, logp, excl)
            np_ = (-comb) % _UNI_NP_BASE
            nll += c * -((comb + np_) // _UNI_NP_BASE)
            pieces += c * np_
        return nll, pieces

    freqs = dict(vocab)
    for r in range(_UNI_EM_ROUNDS + 1):
        logp = normalize(freqs)
        nll, pieces = corpus_eval(logp, None)
        row = got[r]
        assert row.n_pieces == len(freqs), r
        assert row.n_multi == sum(1 for p in freqs if len(p) > 1), r
        assert row.corpus_nll_micro == nll, r
        assert row.corpus_pieces == pieces, r
        if r < _UNI_EM_ROUNDS:
            deltas = {p: corpus_eval(logp, p)[0] - nll
                      for p in freqs if len(p) > 1}
            drop = {p for p, _ in sorted(
                deltas.items(), key=lambda x: (x[1], x[0]))[:_UNI_PRUNE_K]}
            freqs = {p: f for p, f in freqs.items() if p not in drop}
    # the schedule must actually shrink the multi-char vocabulary
    assert got[-1].n_multi == \
        got[0].n_multi - _UNI_EM_ROUNDS * _UNI_PRUNE_K


def test_chunk_apply_matches_streaming_report(spark):
    """q_dedup_chunk_apply's decisions computed from the STREAMING face's
    actual report parquet (chunk_dedup_batch over the same doc_id % 2
    split) must equal the key's output — the apply step is pinned to the
    report the stream really writes, not just to its batch twin."""
    import os
    import shutil
    import uuid as _uuid

    from pyspark.sql import functions as F

    from bossarrowstorageengine_spark.operators.llm_pipeline import (
        _CHUNK_APPLY_REWRITE_PERMILLE,
    )
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
        ref: dict = {}
        for r in spark.read.parquet(rep).collect():
            if r.n_dup_chunks == r.n_chunks:
                action = "drop"
            elif r.n_dup_chunks * 1000 // r.n_chunks >= \
                    _CHUNK_APPLY_REWRITE_PERMILLE:
                action = "rewrite"
            else:
                action = "keep"
            n, ct, cd, tr = ref.get((r.batch_id, action), (0, 0, 0, 0))
            ref[(r.batch_id, action)] = (
                n + 1, ct + r.n_chunks, cd + r.n_dup_chunks,
                tr + (r.dup_tokens if action != "keep" else 0))
        got = {(r.batch_id, r.action):
               (r.n_docs, r.chunks_total, r.chunks_dup, r.tokens_reclaimed)
               for r in QUERIES["q_dedup_chunk_apply"](spark, SF).collect()}
        assert got == ref
        # the corpus must exercise every decision branch or the test is
        # rubber-stamping a constant
        assert {a for _, a in got} == {"keep", "rewrite", "drop"}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_changefeed_consume_is_consistent_and_nonvacuous(spark):
    """The incremental consumer's maintained state must equal the direct
    aggregate on EVERY lang (consistent=True is engine-computed, so this
    is the maintenance invariant, not a constant), and the scenario must
    actually exercise both commits: some lang's chars move at commit 1
    (the update) and some lang loses docs at commit 2 (the delete)."""
    rows = QUERIES["q_changefeed_consume"](spark, SF).collect()
    assert rows
    assert all(r.consistent for r in rows)
    assert any(r.chars_after_c1 != r.chars_base for r in rows), \
        "no lang saw the update commit — vacuous"
    assert any(r.docs_final != r.docs_base for r in rows), \
        "no lang saw the delete commit — vacuous"
    assert all(r.docs_final <= r.docs_base for r in rows)


def test_cc_large_small_star_matches_min_label_and_union_find(spark):
    """The O(log² n) large/small-star algorithm behind
    cc_min_label(algorithm="large_small_star") must produce EXACTLY the
    min-label core's labels (and union-find's) on randomized graphs —
    same contract, drop-in — and must converge on a chain far deeper
    than min-label's round budget (the long-diameter case it exists
    for: O(log) alternations vs O(diameter) propagation rounds)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bossarrowstorageengine_spark.functions.components import (
        cc_min_label,
    )

    def uf(edges):
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    @settings(max_examples=6, deadline=None)
    @given(edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=24),
                  st.integers(min_value=0, max_value=24))
        .filter(lambda p: p[0] != p[1]),
        min_size=1, max_size=30))
    def check(edges):
        df = spark.createDataFrame(
            [(int(a), int(b)) for a, b in edges], ["doc_a", "doc_b"])
        lss, conv = cc_min_label(df, algorithm="large_small_star")
        assert conv is True
        got = {r.node: r.label for r in lss.collect()}
        assert got == uf(edges)
        ml, _ = cc_min_label(df)
        assert got == {r.node: r.label for r in ml.collect()}

    check()

    # a node whose ONLY incident edges are self-loops must still be
    # labeled (contract parity with min-label; code-review regression)
    loop = spark.createDataFrame([(5, 5), (1, 2)], ["doc_a", "doc_b"])
    for algo in ("min_label", "large_small_star"):
        labels, conv = cc_min_label(loop, algorithm=algo)
        assert conv is True
        assert {r.node: r.label for r in labels.collect()} == \
            {5: 5, 1: 1, 2: 1}, algo

    # 65-node chain: diameter 64 >> min-label's 20-round default, but
    # large/small-star star-collapses it within the same budget.
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], ["doc_a", "doc_b"])
    labels, conv = cc_min_label(
        chain, max_rounds=20, algorithm="large_small_star")
    assert conv is True
    assert {r.label for r in labels.collect()} == {0}
    assert labels.count() == 65


def test_unigram_hard_em_matches_python_reference(spark):
    """q_unigram_hard_em vs an independent pure-Python reference of the
    ENTIRE step: canonical Viterbi (best[] DP + smallest-last-piece
    backtrack), weighted hard counts, add-one M-step renormalization,
    and the re-segmented corpus NLL — pinning the deterministic-argmax
    contract both engines must share (path, not just value)."""
    import decimal
    import math
    from collections import Counter

    import duckdb

    from bossarrowstorageengine_spark.operators.curation import (
        _UNI_KMULTI,
        _UNI_MAXLEN,
        _UNI_MAX_WORD,
        _UNI_NP_BASE,
    )

    rows = QUERIES["q_unigram_hard_em"](spark, SF).collect()
    assert rows
    got = {r.piece: r for r in rows}
    any_row = rows[0]

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
    vocab = {p: f for p, f in cand.items() if len(p) == 1}
    vocab.update(dict(sorted(
        ((p, f) for p, f in cand.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]))[:_UNI_KMULTI]))

    def r0(x: float) -> int:
        return int(decimal.Decimal(x).quantize(
            0, rounding=decimal.ROUND_HALF_UP))

    def normalize(freqs):
        s = sum(freqs.values())
        return {p: r0(1_000_000 * math.log(f / s)) for p, f in freqs.items()}

    logp = normalize(vocab)

    def best_array(w, lp):
        best = [0] + [None] * len(w)
        for i in range(1, len(w) + 1):
            b = None
            for k in range(1, min(_UNI_MAXLEN, i) + 1):
                p = w[i - k:i]
                if p not in lp or best[i - k] is None:
                    continue
                v = best[i - k] + lp[p] * _UNI_NP_BASE - 1
                b = v if b is None else max(b, v)
            best[i] = b
        return best

    def canonical_path(w, lp, best):
        pos, pieces = len(w), []
        while pos > 0:
            for k in range(1, min(_UNI_MAXLEN, pos) + 1):
                p = w[pos - k:pos]
                if (p in lp and best[pos - k] is not None
                        and best[pos - k] + lp[p] * _UNI_NP_BASE - 1
                        == best[pos]):
                    pieces.append(p)
                    pos -= k
                    break
            else:
                raise AssertionError(f"no backtrack step at {w}:{pos}")
        return pieces

    # E-step: weighted hard counts + before metrics
    ref_counts: Counter = Counter()
    nll_before = pieces_before = 0
    for w, c in words.items():
        best = best_array(w, logp)
        comb = best[len(w)]
        np_ = (-comb) % _UNI_NP_BASE
        nll_before += c * -((comb + np_) // _UNI_NP_BASE)
        pieces_before += c * np_
        for p in canonical_path(w, logp, best):
            ref_counts[p] += c

    assert any_row.nll_before_micro == nll_before
    assert any_row.pieces_before == pieces_before
    for p, r in got.items():
        assert r.viterbi_count == ref_counts.get(p, 0), p
    # counts conserve the corpus piece total
    assert sum(r.viterbi_count for r in rows) == pieces_before
    # the E-step must be non-trivial: some piece unused, some heavy
    assert any(r.viterbi_count == 0 for r in rows)
    assert any(r.viterbi_count > 0 for r in rows)

    # M-step: add-one renormalize, re-segment
    logp2 = normalize({p: ref_counts.get(p, 0) + 1 for p in vocab})
    for p, r in got.items():
        assert r.logp_em == logp2[p], p
    nll_after = pieces_after = 0
    for w, c in words.items():
        best = best_array(w, logp2)
        comb = best[len(w)]
        np_ = (-comb) % _UNI_NP_BASE
        nll_after += c * -((comb + np_) // _UNI_NP_BASE)
        pieces_after += c * np_
    assert any_row.nll_after_micro == nll_after
    assert any_row.pieces_after == pieces_after
