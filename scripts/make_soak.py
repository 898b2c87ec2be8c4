#!/usr/bin/env python
"""Deterministic 10x soak dataset builder (the BENCH_r*_soak recipe,
pinned in-tree per the round-10 verdict so the soak number stops being
archaeology).

Replicates sf0.1 events 10x with a distinct event_type suffix per
replica — 1,000,000 rows, 50 event_types x 10 user buckets = 500
series, ~2000 samples/series — and copies the other tables through
unchanged. The output is bit-deterministic in CONTENT (row order within
parquet files is not significant to any bench query).

Usage:
    python scripts/make_soak.py [src_sf_dir] [dst_dir] [factor]
    # defaults: /root/testdata/sf0.1  /tmp/soak_sf1.0  10

Then:
    SPARK_GRAFT_SF_DIR=/tmp/soak_sf1.0 python bench.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from victoriametrics_spark.session import get_spark  # noqa: E402
from victoriametrics_spark.sources.tables import TABLES, load_table  # noqa: E402


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/soak_sf1.0"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark("vm-spark-make-soak")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    ev = load_table(spark, src, "events")
    reps = spark.range(factor).withColumnRenamed("id", "__r")
    out = ev.crossJoin(F.broadcast(reps)).select(
        (F.col("event_id") * factor + F.col("__r")).alias("event_id"),
        F.col("ts"),
        F.col("user_id"),
        F.concat(
            F.col("event_type"), F.lit("_"), F.col("__r").cast("string")
        ).alias("event_type"),
        F.col("value"),
        F.col("props"),
    )
    out.repartition(32).write.mode("overwrite").parquet(
        f"{dst}/events.parquet"
    )
    n = spark.read.parquet(f"{dst}/events.parquet").count()
    for t in TABLES:
        if t == "events":
            continue
        s = f"{src}/{t}.parquet"
        d = f"{dst}/{t}.parquet"
        if not os.path.exists(s):
            continue
        if os.path.isdir(s):
            if os.path.isdir(d):
                shutil.rmtree(d)
            shutil.copytree(s, d)
        else:
            shutil.copyfile(s, d)
    print(
        f"soak dataset at {dst}: events x{factor} = {n} rows; "
        "other tables copied through"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
