"""SparkSession factory tuned for this engine.

Pinned decisions (see SURVEY.md §1.4, §4):
- UTC session timezone — the reference stores int64 unix-ms timestamps and
  evaluates all date functions in UTC (lib/storage/raw_row.go:34); DuckDB
  oracle comparison also requires UTC.
- AQE on — runtime re-planning stands in for the reference's adaptive
  search/merge machinery at 100TB scale (skew joins, coalesced shuffles).
- Arrow on — every Python-side escape hatch is a vectorized pandas UDF.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        return int(cpus)
    return os.cpu_count() or 8


def get_spark(app_name: str = "victoriametrics-spark") -> SparkSession:
    """Build (or fetch) the session.

    On a real cluster the master/deploy settings come from spark-submit;
    everything configured here is cluster-size independent except
    ``shuffle.partitions``, which AQE coalesces downward at runtime anyway.
    """
    n = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # duplicate label names in one ingested line keep the last value
        # instead of failing the job (the reference tolerates
        # `{label="a", label="a"}` — apptest issues/172)
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.sql.parquet.filterPushdown", "true")
        # driver testdata uses TIMESTAMP(NANOS) which vanilla Spark rejects;
        # read as long (ns) and convert in the table loader
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # MapType/timestamp-safe Arrow fallback instead of hard error.
        .config("spark.sql.execution.arrow.pyspark.fallback.enabled", "true")
        # skip per-DataFrame-op Python call-site capture (PySpark 4 debug
        # aid): the span/eligibility plans build thousands of Column ops,
        # and the capture doubles driver-side plan-construction latency
        # (measured 1.40s → 0.65s for sum(rate(m[1d])) by (k) cold build)
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
        # bucketed sample tables (storage/layout.py) live here; on a real
        # cluster this is an object-store path from spark-submit conf
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/vmspark_warehouse"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if not os.environ.get("SPARK_MASTER") and "local" not in os.environ.get(
        "MASTER", ""
    ):
        builder = builder.master(f"local[{n}]")
        # local-mode-only tuning (measured ~7% on the bench suite):
        # shuffle blocks never cross a network here, so compression is
        # pure CPU cost, and locality waits are meaningless with one
        # executor. A real cluster (spark-submit master) must NOT get
        # these — compressed shuffles and locality waits are the right
        # defaults when blocks move between hosts.
        builder = (
            builder.config("spark.shuffle.compress", "false")
            .config("spark.shuffle.spill.compress", "false")
            .config("spark.locality.wait", "0s")
        )
    return builder.getOrCreate()
