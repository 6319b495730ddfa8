"""Driver-window hygiene (VERDICT r3 item 7).

The driver's correctness gate samples only the FIRST 50 keys of
``__spark_entry__.queries()`` per round, so any key without a green
(rows+schema+hash) row in a committed ``CORRECTNESS_r*.json`` must sit in the
current window or it can never earn driver verification.  This test makes
window curation impossible to forget: adding a query without placing it in
``_DRIVER_WINDOW`` turns the suite red.
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
WINDOW_SIZE = 50


def _green_union() -> set[str]:
    """Keys with at least one fully-green row across committed driver runs."""
    green: set[str] = set()
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rows = json.loads(path.read_text())
        for key, row in rows.items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                green.add(key)
    return green


def test_window_covers_unverified_keys():
    from __spark_entry__ import queries

    ordered = list(queries())
    window = ordered[:WINDOW_SIZE]
    needed = set(ordered) - _green_union()

    if len(needed) <= WINDOW_SIZE:
        missing = needed - set(window)
        assert not missing, (
            f"{len(missing)} keys lack a driver-green row but are outside the "
            f"first {WINDOW_SIZE} queries() keys: {sorted(missing)}. "
            "Re-curate _DRIVER_WINDOW in bossarrowstorageengine_spark/"
            "operators/__init__.py."
        )
    else:
        # Backlog exceeds one window: every slot must go to an unverified key.
        wasted = [k for k in window if k not in needed]
        assert not wasted, (
            f"{len(needed)} keys need driver rows (> {WINDOW_SIZE}) but the "
            f"window spends slots on already-green keys: {wasted}"
        )


def test_window_keys_are_registered():
    from bossarrowstorageengine_spark.operators import (
        _DRIVER_WINDOW,
        ORACLES,
        QUERIES,
    )

    assert len(_DRIVER_WINDOW) == WINDOW_SIZE
    assert len(set(_DRIVER_WINDOW)) == WINDOW_SIZE, "duplicate window keys"
    unknown = [k for k in _DRIVER_WINDOW if k not in QUERIES]
    assert not unknown, f"window keys not registered: {unknown}"
    # Window keys must carry EXACT oracles — a no-oracle key in the window
    # burns a slot on the weaker rows-only check.
    no_oracle = [k for k in _DRIVER_WINDOW if k not in ORACLES]
    assert not no_oracle, f"window keys without oracle SQL: {no_oracle}"
