"""Property tests for round-8 components: the N-iteration BPE trainer's
merge table vs a textbook pure-Python greedy trainer (N COMPOUNDING
rules — the r6 'done' criterion the 2-iteration test did not cover),
including corpus-exhaustion behavior on both the Spark side and the
generated DuckDB oracle."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bossarrowstorageengine_spark.operators.curation import (
    _bpe_train_n_frame,
    _bpe_train_n_oracle,
)


def _reference_train_simple(
        texts: list[str], n: int) -> list[tuple[int, str, int]]:
    """Textbook greedy BPE trainer over a word-frequency dict: per
    iteration, count ALL adjacent symbol pairs (overlapping windows, like
    ``substring(mt, i, 2)``), pick the (count DESC, pair ASC) winner, and
    apply it with Python ``str.replace`` — leftmost non-overlapping, the
    exact semantic ``replace()`` has in Spark and DuckDB.  Sentinels
    chr(1)..chr(k) stand for merged units; rendering expands them in
    reverse index order.  Returns (merge_idx, 'left|right', count) rows;
    stops early when no pair remains (exhaustion)."""
    words: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            words[w] = words.get(w, 0) + 1
    rules: list[str] = []
    out: list[tuple[int, str, int]] = []
    for k in range(1, n + 1):
        counts: dict[str, int] = {}
        for w, c in words.items():
            for i in range(len(w) - 1):
                p = w[i:i + 2]
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        praw, c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append(praw)

        def render(half: str) -> str:
            for j in range(len(rules) - 1, -1, -1):
                half = half.replace(chr(j + 1), rules[j])
            return half

        out.append((k, f"{render(praw[0])}|{render(praw[1])}", c))
        nxt: dict[str, int] = {}
        for w, cnt in words.items():
            w2 = w.replace(praw, chr(k))
            nxt[w2] = nxt.get(w2, 0) + cnt
        words = nxt
    return out


def _spark_train(spark, texts: list[str], n: int) -> list[tuple]:
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    return [
        (r.merge_idx, r.merge_rule, r.n_occurrences)
        for r in _bpe_train_n_frame(docs, n).collect()
    ]


def _duck_train(texts: list[str], n: int) -> list[tuple]:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)",
                    [(t,) for t in texts])
    return [tuple(r) for r in con.execute(_bpe_train_n_oracle(n)).fetchall()]


# Corpus alphabet mirrors the real documents table: letters only, no
# control characters (the sentinel space chr(1)..chr(8) must stay free).
_word = st.text(alphabet="abcde", min_size=1, max_size=6)
_corpus = st.lists(
    st.lists(_word, min_size=1, max_size=8).map(" ".join),
    min_size=1, max_size=6)


@settings(max_examples=25, deadline=None)
@given(corpus=_corpus, n=st.integers(min_value=1, max_value=8))
def test_bpe_train_n_matches_reference_trainer(spark, corpus, n):
    """N compounding merges: the Spark trainer's merge table (indices,
    RENDERED rules, counts) equals the pure-Python textbook trainer on
    arbitrary small corpora — including ones that exhaust before N."""
    assert _spark_train(spark, corpus, n) == \
        _reference_train_simple(corpus, n)


@settings(max_examples=15, deadline=None)
@given(corpus=_corpus, n=st.integers(min_value=1, max_value=6))
def test_bpe_train_n_oracle_matches_reference_trainer(corpus, n):
    """The generated DuckDB oracle replays the same trainer — in
    particular it must keep rules discovered BEFORE pair exhaustion
    (ADVICE r7: the old N-way cross join emptied the whole table)."""
    assert _duck_train(corpus, n) == _reference_train_simple(corpus, n)


def test_bpe_train_n_exhaustion_keeps_prefix(spark):
    """Deterministic exhaustion case from ADVICE r7: corpus 'ab ab'
    sustains exactly one merge ('ab' -> chr(1), count 2); both engines
    must return that single rule, not an empty table."""
    expect = [(1, "a|b", 2)]
    assert _spark_train(spark, ["ab ab"], 8) == expect
    assert _duck_train(["ab ab"], 8) == expect


def test_bpe_train_n_final_plan_is_corpus_free(spark):
    """Plan-shape pin for the r7 45.7s regression: every top-1 rule is
    eagerly localCheckpoint-ed, so the FINAL merge-table plan must not
    re-reference the corpus scan (pre-fix, the union re-derived the
    whole replace chain per rule — exponential in N)."""
    docs = spark.createDataFrame(
        [("aa bb aa cc",), ("aa bb",)], "text string")
    out = _bpe_train_n_frame(docs, 4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # A createDataFrame corpus shows up as LocalTableScan; with every
    # rule checkpointed, the final plan reads ONLY materialized RDDs —
    # the corpus source and the per-iteration pair recounts are gone.
    assert "LocalTableScan" not in plan, plan
    assert "Scan ExistingRDD" in plan, plan


# ---------------------------------------------------------------------------
# Discrimination tests (VERDICT r6 item 8): an EXACT replay oracle proves
# Spark == DuckDB, not that the sketch discriminates — the r6 all-zero
# PQ-codebook incident is the documented reason these exist.
# ---------------------------------------------------------------------------

def _hamming32(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_simhash_near_duplicates_score_closer_than_random(spark):
    """SimHash must put word-level near-duplicates at much smaller
    Hamming distance than unrelated documents: for each base document,
    a 2-token-edited copy must land within a few bits while a random
    other document's distance concentrates around 16 (of 32)."""
    import random

    from bossarrowstorageengine_spark.operators.llm_pipeline import (
        _simhash_frame,
    )

    rng = random.Random(8)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    n_base = 8
    for i in range(n_base):
        toks = [rng.choice(vocab) for _ in range(60)]
        near = list(toks)
        near[5] = "changed"
        near[40] = "tokens"
        rows.append((i, " ".join(toks)))            # base: doc_id i
        rows.append((100 + i, " ".join(near)))      # near-dup: 100+i
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {r.doc_id: r.simhash32
          for r in _simhash_frame(spark, docs).collect()}

    near_d = [_hamming32(sh[i], sh[100 + i]) for i in range(n_base)]
    far_d = [_hamming32(sh[i], sh[j])
             for i in range(n_base) for j in range(n_base) if i != j]
    assert max(near_d) <= 10, near_d
    assert sum(near_d) / len(near_d) < sum(far_d) / len(far_d) / 2, (
        near_d, far_d)


def test_fingerprint_bag_catches_permutations_and_discriminates(spark):
    """fp_bag must be IDENTICAL for token permutations of one document
    (the near-dup class it exists to catch) while fp_raw differs; both
    must differ across genuinely different documents."""
    from bossarrowstorageengine_spark.functions import text as TX
    from pyspark.sql import functions as F

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "delta gamma beta alpha"),      # permutation of 1
        (3, "alpha beta gamma epsilon"),    # one token differs
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.fp_raw, r.fp_bag) for r in docs.select(
        "doc_id",
        TX.fingerprint_raw(F.col("text")).alias("fp_raw"),
        TX.fingerprint_bag(F.col("text")).alias("fp_bag"),
    ).collect()}
    assert out[1][1] == out[2][1]          # bag: permutation-invariant
    assert out[1][0] != out[2][0]          # raw: order-sensitive
    assert out[1][1] != out[3][1]          # bag: content-sensitive
    assert out[1][0] != out[3][0]


def test_cdc_chunking_is_shift_robust(spark):
    """The defining CDC property: an insertion near the start of a
    document must leave MOST chunk hashes intact, because boundaries
    derive from local content, not absolute offsets.  (Fixed 8-token
    segmentation — q_dedup_segment's scheme — would change essentially
    every segment after the edit.)"""
    import random

    from bossarrowstorageengine_spark.operators.llm_pipeline import (
        _cdc_chunks,
    )

    rng = random.Random(88)
    vocab = [f"w{i}" for i in range(300)]
    base = [rng.choice(vocab) for _ in range(200)]
    edited = base[:5] + ["INSERTED"] + base[5:]
    docs = spark.createDataFrame(
        [(1, " ".join(base)), (2, " ".join(edited))],
        "doc_id long, text string")
    ch = _cdc_chunks(docs).collect()
    h1 = {r.chunk_hash for r in ch if r.doc_id == 1}
    h2 = {r.chunk_hash for r in ch if r.doc_id == 2}
    shared = len(h1 & h2) / max(1, len(h1))
    assert shared >= 0.5, (
        f"only {shared:.0%} of chunks survived a 1-token insertion "
        f"({len(h1)} vs {len(h2)} chunks)")
    # And the edit is not invisible either: at least one chunk differs.
    assert h1 != h2
