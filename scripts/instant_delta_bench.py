#!/usr/bin/env python
"""Micro-bench for the instant-query delta fast path (evalInstantRollup
analog, engine/cache.py InstantValuesCache): a moving-@t dashboard
refresh of a 24h-window instant rollup should cost two 5m boundary
windows instead of a full 24h re-scan.

Usage: python scripts/instant_delta_bench.py [sf_dir]
Prints one JSON line: {"cold": s, "adjusted": s, "speedup": x, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from victoriametrics_spark import EvalConfig
    from victoriametrics_spark.engine.cache import RollupResultCache
    from victoriametrics_spark.session import get_spark
    from victoriametrics_spark.sources.events import events_as_samples

    spark = get_spark("instant-bench")
    spark.sparkContext.setLogLevel("ERROR")
    samples = events_as_samples(spark, sf_dir)
    t_end = samples.agg({"ts": "max"}).first()[0]
    q = "sum_over_time(events_value[24h])"
    with tempfile.TemporaryDirectory() as d:
        cache = RollupResultCache(spark, d)
        # warm JVM + parquet footers (uncounted)
        cfg0 = EvalConfig(start=t_end - 7_200_000, end=t_end - 7_200_000, step=300_000)
        cache.evaluate(q, samples, cfg0).count()

        t1 = t_end - 3_600_000
        cfg1 = EvalConfig(start=t1, end=t1, step=300_000)
        t0 = time.time()
        cache.evaluate(q, samples, cfg1).count()  # cold: populates cache
        cold = time.time() - t0

        # moving-@t refresh 5 minutes later → delta adjustment
        best = float("inf")
        for k in range(1, 4):
            cfg2 = EvalConfig(
                start=t1 + k * 300_000, end=t1 + k * 300_000, step=300_000
            )
            t0 = time.time()
            cache.evaluate(q, samples, cfg2).count()
            best = min(best, time.time() - t0)
        inst = cache.leaf_cache().instant_values()
        print(
            json.dumps(
                {
                    "query": q,
                    "sf_dir": sf_dir,
                    "cold_sec": round(cold, 3),
                    "adjusted_sec": round(best, 3),
                    "speedup": round(cold / best, 2) if best else None,
                    "instant_stats": inst.stats,
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
