"""Core-count scaling demonstration at a scale where parallelism is
visible (r17, VERDICT r16 item 5).

The sf0.1 bench is floor-dominated: every 8-vs-32-core ratio sits at
~1.0, so it proves per-action floor-cutting, not scale-safety.  This
tool builds a DETERMINISTIC ~30x replication of the sf0.1 fixture
(pure pyarrow, no RNG: replica i offsets every join key by i * the
key's original span, so join cardinalities scale linearly and no key
collides) and times six data-heavy headline shapes at 8 and 32 cores
— scan+agg, pushdown filter, multiway broadcast join, global sort,
grouped window top-k, and the unigram perplexity trainer.

The fixture lives under /tmp (never /root/testdata, which is
read-only driver data) and is rebuilt from the parquet inputs on
every `gen` — nothing is cached across runs.

Usage:
    python tools/core_scaling.py run            # gen + both legs + table
    python tools/core_scaling.py gen [factor]
    python tools/core_scaling.py leg <cpus>     # one timing leg (JSON)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SRC = "/root/testdata/sf0.1"
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "30"))
BIG = f"/tmp/spark_graft_scale/sf{FACTOR}x"

#: join-key columns to offset per replica, per table (span = max+1 of
#: the ORIGINAL column, so replica key ranges are disjoint and replica
#: i of lineitem joins exactly replica i of orders/customer/...).
OFFSETS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}
#: copied once, unreplicated: dimension tables (joins stay broadcast)
#: and embeddings (the ANN fixtures are not part of this demo).
COPY_ONLY = ["nation", "region", "embeddings"]

KEYS = ["q_agg_basic", "q_filter_basic", "q_join_multiway",
        "q_sort_multi", "q_win_topk_group", "q_text_perplexity"]


def gen(factor: int = FACTOR) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(BIG, exist_ok=True)
    # Span must be shared across tables per logical key family so both
    # sides of a join shift identically.
    spans: dict[str, int] = {}

    def span_of(col: str, table: pa.Table) -> int:
        fam = {"l_orderkey": "ok", "o_orderkey": "ok",
               "l_partkey": "pk", "p_partkey": "pk",
               "l_suppkey": "sk", "s_suppkey": "sk",
               "o_custkey": "ck", "c_custkey": "ck"}.get(col, col)
        if fam not in spans:
            spans[fam] = int(pc.max(table[col]).as_py()) + 1
        return spans[fam]

    # Pre-seed shared spans from the table that OWNS each key family so
    # order of processing cannot matter.
    for tbl, col in (("orders", "o_orderkey"), ("part", "p_partkey"),
                     ("supplier", "s_suppkey"), ("customer", "c_custkey")):
        t = pq.read_table(os.path.join(SRC, f"{tbl}.parquet"),
                          columns=[col])
        span_of(col, t)

    for name in COPY_ONLY:
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        pq.write_table(t, os.path.join(BIG, f"{name}.parquet"))
    for name, cols in OFFSETS.items():
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        # One parquet FILE PER REPLICA inside a `<table>.parquet/`
        # directory (spark.read.parquet takes the dir transparently):
        # a single 250 MB file yields only ~2 scan splits at the 128 MB
        # default, which caps scan parallelism at 2 tasks and makes the
        # 8-vs-32-core comparison measure nothing — many files is also
        # what a real big table looks like.
        ddir = os.path.join(BIG, f"{name}.parquet")
        import shutil

        shutil.rmtree(ddir, ignore_errors=True)
        os.makedirs(ddir, exist_ok=True)
        n_rows = 0
        for i in range(factor):
            r = t
            for col in cols:
                off = i * span_of(col, t)
                idx = r.schema.get_field_index(col)
                shifted = pc.add(r[col], pa.scalar(
                    off, type=r.schema.field(col).type))
                r = r.set_column(idx, r.schema.field(col), shifted)
            pq.write_table(r, os.path.join(ddir, f"part-{i:03d}.parquet"),
                           row_group_size=1 << 18)
            n_rows += r.num_rows
        print(f"gen {name}: {t.num_rows} -> {n_rows} rows ({factor} files)")


def leg(cpus: int) -> None:
    import __spark_entry__ as entrymod
    from bossarrowstorageengine_spark.session import build_session

    # Scaled data needs a real heap (the default 1g local-mode driver OOMs
    # on the 18M-row shuffles); this is the demo harness's own session,
    # not the bench's, so the bump is demo-scoped.
    spark = build_session(
        f"core-scaling-{cpus}", master=f"local[{cpus}]",
        extra_conf={"spark.driver.memory": "16g"})
    qs = entrymod.queries()

    def noop(df):
        # Time the COMPUTATION, not the driver's result ingest (guide
        # §1.4): a collect() of a 30x-scaled result set serializes
        # single-threaded through the driver and would swamp the
        # cluster-side scaling this demo exists to show.  The bench's
        # own contract (collect) is untouched — this is a separate
        # harness at a separate scale.
        df.write.format("noop").mode("overwrite").save()

    # warmup: touch each table + one run of each key (codegen, workers)
    for k in KEYS:
        noop(qs[k](spark, BIG))
    out = {}
    for k in KEYS:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            noop(qs[k](spark, BIG))
            best = min(best, time.perf_counter() - t0)
        out[k] = round(best, 3)
    print(json.dumps({"cpus": cpus, "queries": out}))


def run() -> None:
    if not os.path.isdir(BIG) or len(os.listdir(BIG)) < 10:
        gen()
    results = {}
    for cpus in (32, 8):
        p = subprocess.run(
            [sys.executable, __file__, "leg", str(cpus)],
            capture_output=True, text=True, cwd=str(REPO))
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith('{"cpus"')]
        if not line:
            print(p.stdout[-2000:], p.stderr[-2000:])
            raise SystemExit(f"leg {cpus} produced no JSON")
        results[cpus] = json.loads(line[-1])["queries"]
        print(line[-1])
    print(f"\n| key | 32-core s | 8-core s | ratio (8/32) |")
    print("| --- | --- | --- | --- |")
    for k in KEYS:
        r = results[8][k] / results[32][k] if results[32][k] else 0
        print(f"| {k} | {results[32][k]:.2f} | {results[8][k]:.2f} "
              f"| {r:.2f}x |")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    if cmd == "gen":
        gen(int(sys.argv[2]) if len(sys.argv) > 2 else FACTOR)
    elif cmd == "leg":
        leg(int(sys.argv[2]))
    elif cmd == "run":
        run()
    else:
        raise SystemExit("usage: core_scaling.py [run|gen [factor]|leg <cpus>]")
