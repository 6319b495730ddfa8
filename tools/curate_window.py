"""Regenerate ``_DRIVER_WINDOW`` and the shared-module staleness hashes.

The driver samples only the FIRST 50 ``queries()`` keys per round, so the
window must be re-curated whenever the surface or the attestation record
changes.  Policy (SURVEY.md §5, enforced by tests/test_driver_window.py):

  1. every key with no driver-green row in any committed CORRECTNESS file
     (new operators + never-sampled backlog) — mandatory;
  2. every key in ``_MODIFIED_UNATTESTED`` — mandatory;
  3. remaining slots: already-green keys, OLDEST green round first
     (alphabetical within a round).

Overflow rule (added r15, VERDICT r14 item 1): every green key must be
re-attested within FRESHNESS_HORIZON rounds of its newest green row, or the
attestation record rots silently (by r14, 35 keys' newest green predated r8
because two consecutive arrowipc reworks filled the window with their
dependent families).  When never-green + modified + rotation-due keys exceed
the window, slots go (a) never-green — the driver can never attest them
otherwise — then (b) rotation-due greens (they have NO other tripwire; a
carried modified key stays tracked in ``_MODIFIED_UNATTESTED``), then (c) the
longest PREFIX of ``_MODIFIED_UNATTESTED`` that fits — the list order is the
curator's priority ranking (keys most exercised by the diff first).  The
carried suffix spills to the next round's window and MUST be verified
locally via ``tools/check.py`` in the meantime (SURVEY §7 records the run).

This tool computes that window, rewrites the generated block in
``operators/__init__.py``, and re-records the sha256 of every shared module
in ``operators/_staleness.py`` (run it AFTER curating
``_MODIFIED_UNATTESTED`` for any shared-module diff — the test suite stays
red until both halves agree).

Usage:
    python tools/curate_window.py            # rewrite both files
    python tools/curate_window.py --check    # print, exit 1 on drift
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

WINDOW_SIZE = 50
#: A green key whose newest attestation is more than this many rounds old is
#: "rotation-due": it outranks modified-key re-attestation under overflow
#: (the modified key keeps its _MODIFIED_UNATTESTED tripwire; the aging
#: green has nothing).
FRESHNESS_HORIZON = 7
INIT_PATH = REPO / "bossarrowstorageengine_spark" / "operators" / "__init__.py"
STALE_PATH = REPO / "bossarrowstorageengine_spark" / "operators" / "_staleness.py"


def green_latest() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(path.stem.split("_r")[1])
        for key, row in json.loads(path.read_text()).items():
            if (isinstance(row, dict) and row.get("rows_match")
                    and row.get("schema_match") and row.get("hash_match")
                    and not row.get("err")):
                latest[key] = max(latest.get(key, 0), rnd)
    return latest


def next_round() -> int:
    rounds = [int(p.stem.split("_r")[1])
              for p in REPO.glob("CORRECTNESS_r*.json")]
    return (max(rounds) + 1) if rounds else 1


def compute_window() -> list[str]:
    from bossarrowstorageengine_spark.operators import (
        _MODIFIED_UNATTESTED,
        QUERIES,
    )
    from bossarrowstorageengine_spark.operators._staleness import (
        stale_modules,
    )

    pending = sorted({k for deps in stale_modules().values() for k in deps})
    missing = [k for k in pending if k not in _MODIFIED_UNATTESTED]
    if missing:
        sys.exit(
            "shared modules changed but their dependents are not in "
            f"_MODIFIED_UNATTESTED: {missing}\nAdd them (operators/"
            "__init__.py) before regenerating — the recorded hashes only "
            "advance once every dependent is scheduled for re-attestation."
        )

    latest = green_latest()
    ordered = list(QUERIES)
    never = [k for k in ordered if k not in latest]
    modified = [k for k in _MODIFIED_UNATTESTED if k in latest and
                k not in never]
    horizon = next_round() - FRESHNESS_HORIZON - 1
    due = sorted(
        (k for k in ordered
         if k in latest and latest[k] <= horizon and k not in set(modified)),
        key=lambda k: (latest[k], k),
    )
    if len(never) + len(modified) + len(due) > WINDOW_SIZE:
        # Overflow: never-green, then rotation-due, then the priority
        # PREFIX of _MODIFIED_UNATTESTED; the suffix is carried to the
        # next window (it stays in the list, so the tripwire holds).
        n_mod = WINDOW_SIZE - len(never) - len(due)
        if n_mod < 0:
            print(f"WARNING: {len(never)} never-green + {len(due)} "
                  "rotation-due keys alone exceed the window; truncating "
                  "rotation-due oldest-first.", file=sys.stderr)
            return (never + due)[:WINDOW_SIZE]
        prefix = modified[:n_mod]
        carried = modified[n_mod:]
        print(f"overflow: carrying {len(carried)} modified keys to the "
              f"next window: {' '.join(carried)}", file=sys.stderr)
        return never + due + prefix
    mandatory = never + sorted(modified)
    n_fill = WINDOW_SIZE - len(mandatory)
    fill = sorted(
        (k for k in ordered if k in latest and k not in set(mandatory)),
        key=lambda k: (latest[k], k),
    )[:n_fill]
    return mandatory + fill


def render_window(window: list[str]) -> str:
    body = "\n".join(f'    "{k}",' for k in window)
    return (
        "# BEGIN _DRIVER_WINDOW (generated)\n"
        f"_DRIVER_WINDOW = [\n{body}\n]\n"
        "# END _DRIVER_WINDOW (generated)"
    )


def render_hashes() -> str:
    from bossarrowstorageengine_spark.operators._staleness import (
        SHARED_MODULE_DEPS,
        module_hash,
    )

    body = "\n".join(
        f'    "{rel}":\n        "{module_hash(rel)}",'
        for rel in sorted(SHARED_MODULE_DEPS)
    )
    return (
        "SHARED_MODULE_HASHES: dict[str, str] = {\n" + body + "\n}"
    )


WINDOW_RE = re.compile(
    r"# BEGIN _DRIVER_WINDOW \(generated\).*?# END _DRIVER_WINDOW \(generated\)",
    re.S,
)
HASHES_RE = re.compile(
    r"SHARED_MODULE_HASHES: dict\[str, str\] = \{[^}]*\}", re.S,
)


def main() -> None:
    check = "--check" in sys.argv
    window = compute_window()
    new_init, n_win = WINDOW_RE.subn(render_window(window),
                                     INIT_PATH.read_text())
    new_stale, n_hash = HASHES_RE.subn(render_hashes(),
                                       STALE_PATH.read_text())
    if n_win != 1 or n_hash != 1:
        # A broken/removed generated-block marker would otherwise make
        # sub() a silent no-op and print a false "already current".
        sys.exit(
            f"generated-block markers not found exactly once "
            f"(window={n_win}, hashes={n_hash}) — restore the "
            f"'# BEGIN _DRIVER_WINDOW (generated)' block in "
            f"{INIT_PATH.name} / the SHARED_MODULE_HASHES literal in "
            f"{STALE_PATH.name} before regenerating."
        )
    drift = (new_init != INIT_PATH.read_text()
             or new_stale != STALE_PATH.read_text())
    print(f"window ({len(window)}): " + " ".join(window))
    if check:
        sys.exit(1 if drift else 0)
    if drift:
        INIT_PATH.write_text(new_init)
        STALE_PATH.write_text(new_stale)
        print("rewrote", INIT_PATH.name, "and", STALE_PATH.name)
    else:
        print("already current")


if __name__ == "__main__":
    main()
