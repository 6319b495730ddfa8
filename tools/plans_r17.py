"""Capture .explain("formatted") for bench headline keys into plans/r17/.

Usage:
    python tools/plans_r17.py before            # all headline keys
    python tools/plans_r17.py after q_agg_basic q_filter_basic ...
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from bossarrowstorageengine_spark.session import build_session

    # Positional arg 1 is the TAG; validate it so a key passed first
    # isn't silently treated as a tag capturing ALL keys (ADVICE r16).
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    if tag not in ("before", "after"):
        raise SystemExit(
            f"usage: plans_r17.py before|after [keys...] (got tag {tag!r})")
    keys = sys.argv[2:] or HEADLINE
    unknown = [k for k in keys if k not in HEADLINE]
    if unknown:
        raise SystemExit(f"not headline keys: {unknown}")
    outdir = REPO / "plans" / "r17"
    outdir.mkdir(parents=True, exist_ok=True)

    spark = build_session("plans-r17")
    qs = entrymod.queries()
    for name in keys:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (outdir / f"{name}_{tag}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{tag}.txt ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
