#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # flagship rollup + aggregation
    "mq_sum_rate_by",
    # heavy per-series rollups
    "mq_quantile_over_time",
    "mq_increase",
    "mq_avg_over_time",
    # cross-series aggregate + ranking
    "mq_quantile_sumot_by",
    "mq_topk_max",
    # join layer
    "mq_binop_ratio",
    # storage layout: same rate() from flat scan vs bucketed table
    "mq_rate",
    "mq_rate_bucketed",
    # wide-window fine-step (1d window @ 15m step → two-level plan)
    "mq_rate_fine_step",
    # ---- widened set (r13): non-MetricsQL paths so a LogsQL/Graphite/
    # dedup plan regression shows up in the round bench, not just in
    # correctness.  Baseline band recorded in BENCH_r13.json onward.
    # LogsQL stats pipeline over documents (len_pipe + stats by)
    "rel_len_stats",
    # Graphite render (summarize() over the events-backed target set)
    "gr_summarize",
    # LLM-pipeline dedup flagship (MinHash + banded LSH over documents)
    "op_doc_minhash_lsh",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    import __spark_entry__ as entry_mod
    from victoriametrics_spark.session import get_spark

    spark = get_spark("vm-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    total = 0.0
    # warm the JVM + parquet footer cache once (not counted); the bucketed
    # gate's first call also materializes the bucketed table so the timed
    # run below measures the scan path, not the one-time write
    qs["mq_sum_rate_by"](spark, sf_dir).count()
    qs["mq_rate_bucketed"](spark, sf_dir).count()
    # n repeats per query, report the MIN: a single-shot number conflates
    # the query with JIT/GC/CPU-contention noise (the r4→r5 "24% uniform
    # regression" was exactly that); min-of-3 is the standard defensible
    # estimator for a deterministic workload on a noisy host
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    # with the engine-level plan LRU (engine/plancache.py) runs 2..n hit
    # the cached logical plan, so min/n measures the repeated-dashboard-
    # query cost (VM's parse cache serves its bench identically) while
    # first_run includes cold plan construction — report BOTH so
    # round-over-round comparisons stay unambiguous
    from victoriametrics_spark.engine.plancache import GLOBAL_PLAN_CACHE

    first_runs: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        best, first, n = float("inf"), -1.0, -1
        for i in range(repeats):
            if i == 0:
                # genuinely cold plan for the first run (the JVM warm-up
                # above may have primed the LRU for some queries)
                GLOBAL_PLAN_CACHE.clear()
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            dt = time.time() - t0
            if i == 0:
                first = dt
            best = min(best, dt)
        timings[name] = round(best, 3)
        first_runs[name] = round(first, 3)
        total += best
        print(
            f"# {name}: {best:.2f}s min/{repeats}, {first:.2f}s cold "
            f"({n} rows)",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "vm_spark_bench_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "first_run": first_runs,
                "first_run_total": round(sum(first_runs.values()), 3),
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
