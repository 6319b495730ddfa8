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
