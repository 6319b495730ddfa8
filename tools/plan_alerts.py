"""Plan-regression alerts: compare each headline query's CURRENT physical
plan against the committed PLANS.md fingerprint and flag the regression
classes that silently destroy scale:

- more data shuffles (standalone ``Exchange`` nodes; broadcasts excluded)
- a ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` where the baseline
  had none (the all-pairs trap — q_dedup_chunk_cdc's fan_out class)
- a Python eval node (``BatchEvalPython``/``ArrowEvalPython``) appearing
  in a plan that used to be pure JVM

PLANS.md stays the human-reviewed baseline; this tool makes drifting from
it loud instead of something a reviewer must diff by eye.  Exit 1 on any
alert.  Usage:

    python tools/plan_alerts.py             # all keys present in PLANS.md
    python tools/plan_alerts.py q_tpch_q3   # subset
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"

#: regression classes: (label, regex, alert-on) where alert-on is
#: "increase" (count may not grow) or "appear" (baseline 0 must stay 0).
CLASSES = [
    ("shuffle", re.compile(r"(?<![A-Za-z])Exchange(?![A-Za-z])"), "increase"),
    ("cartesian", re.compile(r"CartesianProduct"), "appear"),
    ("bnlj", re.compile(r"BroadcastNestedLoopJoin"), "appear"),
    ("python-eval", re.compile(r"(?:Batch|Arrow)EvalPython"), "appear"),
]


def parse_baseline() -> dict[str, str]:
    text = (REPO / "PLANS.md").read_text()
    plans: dict[str, str] = {}
    for m in re.finditer(r"^## (\S+)\n\n```\n(.*?)\n```", text,
                         re.S | re.M):
        plans[m.group(1)] = m.group(2)
    return plans


def fingerprint(plan: str) -> dict[str, int]:
    return {label: len(rx.findall(plan)) for label, rx, _ in CLASSES}


def main() -> None:
    from bossarrowstorageengine_spark.session import build_session

    import __spark_entry__ as entrymod

    baseline = parse_baseline()
    keys = sys.argv[1:] or list(baseline)
    missing = [k for k in keys if k not in baseline]
    if missing:
        sys.exit(f"not in PLANS.md: {missing} — regenerate it first "
                 "(python tools/dump_plans.py)")

    spark = build_session("plan-alerts")
    qs = entrymod.queries()
    alerts: list[str] = []
    for name in keys:
        df = qs[name](spark, SF_DIR)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        base, cur = fingerprint(baseline[name]), fingerprint(plan)
        for label, _, mode in CLASSES:
            b, c = base[label], cur[label]
            if (mode == "increase" and c > b) or \
                    (mode == "appear" and b == 0 and c > 0):
                alerts.append(f"{name}: {label} {b} -> {c}")
    if alerts:
        print("PLAN REGRESSIONS vs committed PLANS.md:")
        for a in alerts:
            print("  " + a)
        sys.exit(1)
    print(f"{len(keys)} plans checked, no regressions vs PLANS.md")


if __name__ == "__main__":
    main()
