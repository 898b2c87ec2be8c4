"""Downsampling — age-tiered sample thinning.

The reference's ``-downsampling.period=offset1:interval1,offset2:interval2``
(public VictoriaMetrics downsampling docs; period parsing in
lib/storage — e.g. ``30d:5m,180d:1h``) keeps, for samples older than
each offset, only the LAST raw sample per series per aligned interval;
the largest applicable offset wins, newer-than-all-offsets data is kept
raw. Ties inside an interval resolve like dedup-on-merge
(lib/storage/dedup.go:29-60): max timestamp, then highest value.

Spark form: one pass, a per-row interval classification (pure Catalyst
CASE), then one ranking window per (series, interval, bucket). The
window partitions by the canonical series key — with the bucketed layout
(storage/layout.py) this shuffles nothing; on a flat scan it is a single
hash exchange. At 100 TB this runs per day-partition: downsampling only
rewrites partitions older than the smallest offset, so the job input is
bounded by the partitions crossing an age threshold, not the whole
table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from victoriametrics_spark.schema import series_key


def _interval_for_age(age_ms: Column, rules: list[tuple[int, int]]) -> Column:
    """interval (ms) applicable to a sample of the given age; 0 = raw.
    ``rules`` = [(offset_ms, interval_ms)], largest matching offset wins."""
    expr = F.lit(0).cast("long")
    for offset_ms, interval_ms in sorted(rules):
        expr = F.when(age_ms >= offset_ms, F.lit(int(interval_ms))).otherwise(expr)
    return expr


def downsample(
    samples: DataFrame,
    rules: list[tuple[int, int]],
    now_ms: int,
) -> DataFrame:
    """Keep one raw sample per series per interval for aged data.

    ``rules`` is ``[(offset_ms, interval_ms), ...]``; a sample with
    ``now_ms - ts >= offset_ms`` falls under the largest such offset's
    interval. Output schema == input schema (raw samples survive, no
    aggregation — exactly the reference's behavior of keeping the last
    raw sample, so counters/resets stay correct for rate()).
    """
    if not rules:
        return samples
    interval = _interval_for_age(F.lit(int(now_ms)) - F.col("ts"), rules)
    df = samples.withColumn("__ds_interval", interval)
    raw = df.filter(F.col("__ds_interval") == 0).drop("__ds_interval")
    aged = df.filter(F.col("__ds_interval") > 0)
    bucket = F.floor(F.col("ts") / F.col("__ds_interval"))
    parts = [
        series_key(F.col("name"), F.col("labels")),
        F.col("__ds_interval"),
        bucket,
    ]
    if "tenant" in samples.columns:
        # series keys don't embed the tenant (storage/layout.py): two
        # tenants' identically-named series must thin independently,
        # like VM downsampling inside per-tenant partitions
        parts.insert(0, F.col("tenant"))
    w = Window.partitionBy(*parts).orderBy(
        F.col("ts").desc(), F.col("value").desc()
    )
    kept = (
        aged.withColumn("__ds_rn", F.row_number().over(w))
        .filter(F.col("__ds_rn") == 1)
        .drop("__ds_rn", "__ds_interval")
    )
    return raw.unionByName(kept)
