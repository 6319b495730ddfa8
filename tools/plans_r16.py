"""Capture .explain("formatted") for bench headline keys into plans/r16/.

Usage:
    python tools/plans_r16.py before            # all headline keys
    python tools/plans_r16.py after q_agg_basic q_filter_basic ...
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

    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    keys = sys.argv[2:] or HEADLINE
    outdir = REPO / "plans" / "r16"
    outdir.mkdir(parents=True, exist_ok=True)

    spark = build_session("plans-r16")
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
