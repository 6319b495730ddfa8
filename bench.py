"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set: one query per operator class that dominates real workloads
(scan+agg, multiway join, window top-k, global sort, pushdown filter,
arrowipc round-trip, dedup, vector search, windowed event aggregation,
explode) — the shapes whose plans must hold at 100 TB.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "q_agg_basic",
    "q_filter_basic",
    "q_join_multiway",
    "q_join_asof",
    "q_win_topk_group",
    "q_sort_multi",
    "q_set_union_all",
    "q_scan_arrow_roundtrip",
    "q_dedup_exact",
    "q_dedup_near",
    "q_sim_search",
    "q_stream_tumbling",
    "q_explode",
    "q_udf_pandas",
    # Copy-on-write storage mutation (flagship capability — tracked so
    # regressions in the CoW scan/rewrite/commit path show up per round).
    "q_storage_delete",
    "q_storage_merge",
    # Round-5 storage surface (VERDICT r5 item 8): among the most
    # expensive queries in SCALING.md, so round-over-round comparison
    # must see them.  The 16 keys above keep their order for
    # comparability with BENCH_r01..r05.
    "q_storage_update",
    "q_storage_compact",
    "q_storage_timetravel_diff",
    # Round-6 flagship additions.
    "q_ann_ivfpq",
    "q_text_perplexity",
    # Round-8 (VERDICT r6 item 7): the most expensive declared query in
    # SCALING.md (~4.8s) was invisible round-over-round until now.
    "q_storage_changefeed",
    # Round-10 flagship additions (the 22 keys above keep their order
    # for comparability with BENCH_r01..r09).
    "q_unigram_em",
    "q_dedup_chunk_apply",
    "q_win_session_gap",
    # Round-11 flagship addition (the 25 keys above keep their order
    # for comparability with BENCH_r01..r10).
    "q_unigram_hard_em_n",
    # Round-12 flagship addition (the 26 keys above keep their order for
    # comparability with BENCH_r01..r11): the six-family ANN trade-off
    # table — the round's headline capability.  The two CDC keys
    # (q_mv_maintain, q_changefeed_evolve) stay out like
    # q_changefeed_consume: Python-datasource fixed floor, tracked in
    # SCALING.md instead.
    "q_ann_recall_report",
    # Round-13 flagship addition (the 27 keys above keep their order for
    # comparability with BENCH_r01..r12): the piece-level vocab drift
    # report — two trainer-grade seed passes + a vocab-sized diff.  The
    # round's CDC/purge keys stay out like the rest of the storage
    # family: Python-datasource fixed floor, tracked in SCALING.md.
    "q_vocab_drift",
    # Round 14 adds NO headline key (first round since r9): its four new
    # keys (q_ann_ivf_maintained, q_purge_derived, q_feed_consumer_groups
    # + the bucketed-index read path) are all datasource-floor-dominated
    # storage/CDC compositions — the documented rule keeps that family in
    # SCALING.md so the 28-key bench stays round-over-round comparable.
    # Round 15 likewise adds none: q_ann_ivfpq_maintained and
    # q_timetravel_asof are storage/CDC mutation fixtures (same rule),
    # tracked in SCALING.md and gated by tools/plan_alerts.py.
]


def main() -> None:
    from bossarrowstorageengine_spark.session import build_session

    import __spark_entry__ as entrymod

    # Load guard (VERDICT r10 item 6): two rounds of bench confusion were
    # pure machine noise (r7's phantom 1.41×; r10's first run at load ~1.8
    # showing uniform 1.5-3× elevation, worst on untouched cheap keys).
    # Stamp the 1-minute load average before warmup and after the timed
    # runs into the JSON so every consumer can judge whether the numbers
    # are comparable, and warn loudly when the machine is already busy.
    # r15 (VERDICT r14 item 8): don't just warn — WAIT for the box to go
    # idle (bounded), and stamp a machine-readable contamination flag so
    # BENCH_rN.json deltas are interpretable without a manual interleaved
    # A/B.  r14's 13% phantom regression ran at loadavg 4.11.
    # r16 (VERDICT r15 item 4): loadavg cannot see hypervisor STEAL —
    # r15's contaminated legs ran at loadavg ≈ 0 while /proc/stat showed
    # nonzero steal ticks.  Stamp the cumulative steal-tick delta across
    # the whole run (warmup + timed legs) so a "clean" loadavg with a
    # large steal delta is machine-readably suspect.
    def steal_ticks() -> int | None:
        try:
            with open("/proc/stat") as fh:
                fields = fh.readline().split()
            # cpu  user nice system idle iowait irq softirq steal ...
            return int(fields[8]) if fields[0] == "cpu" else None
        except (OSError, IndexError, ValueError):
            return None

    floor = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_FLOOR", "0.5"))
    wait_budget = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_WAIT", "180"))
    waited = 0.0
    while os.getloadavg()[0] > floor and waited < wait_budget:
        time.sleep(10)
        waited += 10
    load_before = round(os.getloadavg()[0], 2)
    contaminated = load_before > floor
    if contaminated:
        print(f"WARNING: 1-min load average {load_before} > {floor} "
              f"after waiting {waited:.0f}s - timings will be inflated "
              "by background load; treat this run's deltas as suspect "
              "(load_contaminated=true in the JSON)", file=sys.stderr)

    steal_start = steal_ticks()
    run_t0 = time.perf_counter()

    spark = build_session("bench", master=f"local[{CPUS}]")
    queries = entrymod.queries()

    # Warm up once (not counted): JVM codegen, parquet reader machinery,
    # the pandas-UDF worker pool, and the Python data source workers —
    # fixed engine startup cost, not query cost.
    import shutil

    from bossarrowstorageengine_spark.catalog import load_table
    from bossarrowstorageengine_spark.sources import register_arrowipc

    register_arrowipc(spark)
    region = load_table(spark, SF_DIR, "region")
    region.collect()
    spark.range(1000).toPandas()
    # First touch of each input table: parquet footer decode + OS page cache
    # + codegen for the scan — engine/IO startup, identical for any engine
    # measured warm, and not a per-query cost.
    for tbl in ("lineitem", "orders", "customer", "supplier", "nation",
                "part", "events", "documents", "embeddings"):
        load_table(spark, SF_DIR, tbl).count()
    # Exercise each operator family once on the 5/25-row dim tables: first
    # keyed hash-aggregate, broadcast join, window and sort each JIT their
    # codegen/infra paths — engine startup, not per-query cost.
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    nation = load_table(spark, SF_DIR, "nation")
    nation.groupBy("n_regionkey").agg(
        F.count(F.lit(1)), F.sum("n_nationkey")).collect()
    nation.join(F.broadcast(region),
                nation.n_regionkey == region.r_regionkey).count()
    nation.withColumn("rn", F.row_number().over(
        Window.partitionBy("n_regionkey").orderBy("n_nationkey"))).collect()
    nation.orderBy("n_name").limit(5).collect()
    warm_dir = "/tmp/spark_graft_bench_warm"
    shutil.rmtree(warm_dir, ignore_errors=True)
    region.write.format("arrowipc").mode("append").save(warm_dir)
    spark.read.format("arrowipc").load(warm_dir).collect()

    # Best-of-2 per key (VERDICT r8 item 9): r7's uniform 1.41× "regression"
    # was machine noise — two back-to-back runs on unchanged code reproduced
    # r6-era numbers.  The min of two runs absorbs transient load spikes, so
    # round-over-round deltas track CODE, not environment.  Both runs are
    # fully independent (storage-mutation keys rebuild their scratch
    # tables each time), so the min is a legitimate same-work sample.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    steal_end = steal_ticks()
    sf_tag = os.path.basename(os.path.normpath(SF_DIR)).replace("sf", "")
    try:
        sf = float(sf_tag)
    except ValueError:
        sf = sf_tag
    print(json.dumps({
        "metric": "headline_queries_total_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # methodology: per-key wall time is the BEST OF 2 independent runs
        # (post-warmup) — see the comment at the timing loop.
        "runs_per_key": 2,
        "per_key_agg": "min",
        # 1-min load average before warmup / after the timed runs: >0.5
        # before warmup means the numbers are contaminated by background
        # load (see the guard at the top of main).
        "loadavg_before": load_before,
        "loadavg_after": round(os.getloadavg()[0], 2),
        # True = the box never went idle inside the wait budget; this
        # run's deltas vs other rounds are NOT comparable (r15 guard).
        "load_contaminated": contaminated,
        "idle_wait_sec": round(waited, 1),
        # Cumulative /proc/stat steal-tick delta over the run (warmup +
        # timed legs) and the wall it was measured over.  Steal is
        # hypervisor CPU confiscation that loadavg CANNOT see (r15: the
        # worst per-key "regressions" were on legs with loadavg ≈ 0 but
        # nonzero steal); ticks are USER_HZ (100/s) summed across CPUs,
        # so e.g. 3200 ticks over 60 s on 32 CPUs ≈ 1.7% stolen.  null =
        # /proc/stat unavailable.
        "steal_ticks": (None if steal_start is None or steal_end is None
                        else steal_end - steal_start),
        "steal_window_sec": round(time.perf_counter() - run_t0, 1),
        # r17 (VERDICT r16 item 6): machine-readable adjudication of the
        # steal stamp — True when the hypervisor confiscated more than 1%
        # of this run's CPU time (steal ticks are USER_HZ=100/s summed
        # across all CPUs, so the denominator is window * 100 * n_cpus).
        # A leg with steal_contaminated=true is NOT comparable round-over-
        # round; use the other leg / re-run (the r15/r16 phantom-
        # regression class self-adjudicates from this flag).  The
        # denominator uses the MACHINE cpu count (/proc/stat aggregates
        # every host CPU), not $SPARK_GRAFT_CPUS.
        "steal_contaminated": (
            None if steal_start is None or steal_end is None else bool(
                (steal_end - steal_start)
                > 0.01 * (time.perf_counter() - run_t0) * 100
                * (os.cpu_count() or 32))),
    }))


if __name__ == "__main__":
    main()
