#!/usr/bin/env python
"""Micro-bench for the storage maintenance tiers (round 9): after a
small append to ONE day of a month-wide table, compare

- full-table rewrite (the pre-round-9 compaction),
- partition-scoped compaction (rewrites only the appended day),
- size-tiered small-part merge (rewrites only the appended FILES).

The point is the scaling LAW, not the absolute numbers: at 100 TB the
full rewrite is proportional to the table, the partition compact to one
day, the tiered merge to the freshly-appended bytes.

Usage: python scripts/maintenance_bench.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import functions as F

    from victoriametrics_spark.session import get_spark
    from victoriametrics_spark.sources.events import events_as_samples
    from victoriametrics_spark.storage import (
        append_samples,
        compact_samples_table,
        drop_samples_table,
        merge_small_parts,
        write_samples_table,
    )

    spark = get_spark("maintenance-bench")
    spark.sparkContext.setLogLevel("ERROR")
    samples = events_as_samples(spark, sf_dir)
    day0 = samples.select(
        F.min(F.to_date(F.timestamp_millis("ts")))
    ).first()[0]
    one_day = samples.filter(
        F.to_date(F.timestamp_millis("ts")) == F.lit(day0)
    ).limit(20)

    def sizes(table: str) -> dict:
        out = {}
        for uri in spark.table(table).inputFiles():
            p = uri[7:] if uri.startswith("file://") else uri
            out[p] = os.stat(p).st_size
        return out

    def build(table: str) -> int:
        """Returns a size threshold that separates the appended small
        files from the base day files (at tiny SFs their sizes are
        close; at real scale a day file is orders of magnitude larger)."""
        drop_samples_table(spark, table)
        write_samples_table(samples, table, n_buckets=16)
        base = sizes(table)
        append_samples(one_day, table, n_buckets=16)
        append_samples(one_day, table, n_buckets=16)
        appended = {p: s for p, s in sizes(table).items() if p not in base}
        return (min(base.values()) + max(appended.values())) // 2

    out: dict = {"sf_dir": sf_dir}
    n_rows = samples.count()
    out["rows"] = n_rows

    build("mb_full")
    t0 = time.time()
    compact_samples_table(spark, "mb_full", n_buckets=16, full=True)
    out["full_rewrite_sec"] = round(time.time() - t0, 3)
    drop_samples_table(spark, "mb_full")

    build("mb_part")
    t0 = time.time()
    compact_samples_table(spark, "mb_part", n_buckets=16)
    out["partition_compact_sec"] = round(time.time() - t0, 3)
    drop_samples_table(spark, "mb_part")

    threshold = build("mb_tier")
    t0 = time.time()
    merged = merge_small_parts(spark, "mb_tier", max_small_bytes=threshold)
    out["tiered_merge_sec"] = round(time.time() - t0, 3)
    out["tiered_merged_files"] = merged
    drop_samples_table(spark, "mb_tier")

    out["speedup_partition_vs_full"] = round(
        out["full_rewrite_sec"] / max(out["partition_compact_sec"], 1e-9), 2
    )
    out["speedup_tiered_vs_full"] = round(
        out["full_rewrite_sec"] / max(out["tiered_merge_sec"], 1e-9), 2
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
