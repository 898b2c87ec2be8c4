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


def rule_groups(rules) -> "list[tuple[str | None, list[tuple[int, int]]]]":
    """Normalize a rules argument into filter groups, in flag order.

    Accepted shapes (mixable):
    - ``(offset_ms, interval_ms)``            — match-all level;
    - ``(selector, offset_ms, interval_ms)``  — selector-scoped level
      (the -downsampling.period=filter:offset:interval syntax,
      docs/victoriametrics/README.md §Downsampling: a series is
      downsampled by the FIRST matching filter's levels only; series
      matching no filter are not downsampled when filters are used).

    Levels with the same selector merge into one group; groups keep
    FLAG ORDER (first-match-wins), so a bare match-all level placed
    before a filter shadows it — same as listing a catch-all filter
    first in the reference."""
    groups: list[tuple[str | None, list[tuple[int, int]]]] = []
    for r in rules:
        if len(r) == 2:
            sel, off, itv = None, int(r[0]), int(r[1])
        else:
            sel, off, itv = r[0], int(r[1]), int(r[2])
        for g in groups:
            if g[0] == sel:
                g[1].append((off, itv))
                break
        else:
            groups.append((sel, [(off, itv)]))
    return groups


def rule_offsets(rules) -> list[int]:
    """Every offset across all groups — the partition-age arming test
    (a partition is a candidate once it crossed ANY offset)."""
    return [off for _, levels in rule_groups(rules) for off, _ in levels]


def rules_signature(rules) -> str:
    """Stable identity of a rules argument for maintenance-state
    stamping (selector-aware; order of groups is significant because
    first-match wins)."""
    return repr(
        [(sel, sorted(levels)) for sel, levels in rule_groups(rules)]
    )


def parse_downsampling_periods(flags: list[str]) -> list[tuple]:
    """Parse ``-downsampling.period`` flag values: ``offset:interval``
    or ``{selector}:offset:interval`` (durations like 30d, 5m). Returns
    rules in flag order for :func:`downsample`."""
    from victoriametrics_spark.metricsql import parse as _mql_parse
    from victoriametrics_spark.metricsql.ast import DurationExpr, MetricExpr

    def parse_duration_ms(txt: str) -> int:
        return DurationExpr(text=txt.strip()).ms(0)

    out: list[tuple] = []
    for flag in flags:
        s = flag.strip()
        sel = None
        if s.startswith("{"):
            # quote-aware brace scan: label values may legally contain
            # '}' or ':' inside quoted strings ({env="a}b"}:10h:1h)
            depth = 0
            in_str = False
            i = 0
            while i < len(s):
                ch = s[i]
                if in_str:
                    if ch == "\\":
                        i += 2
                        continue
                    if ch == '"':
                        in_str = False
                elif ch == '"':
                    in_str = True
                elif ch == "{":
                    depth += 1
                elif ch == "}":
                    depth -= 1
                    if depth == 0:
                        sel = s[: i + 1]
                        s = s[i + 1:].lstrip(":")
                        break
                i += 1
            if sel is None:
                raise ValueError(f"unbalanced selector in {flag!r}")
            if not isinstance(_mql_parse(sel), MetricExpr):
                raise ValueError(f"{sel!r} is not a series selector")
        parts = s.split(":")
        if len(parts) != 2:
            raise ValueError(
                f"invalid -downsampling.period {flag!r}: want "
                "[filter:]offset:interval"
            )
        off = parse_duration_ms(parts[0])
        itv = parse_duration_ms(parts[1])
        out.append((sel, off, itv) if sel is not None else (off, itv))
    return out


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
    groups = rule_groups(rules)
    age = F.lit(int(now_ms)) - F.col("ts")
    if len(groups) == 1 and groups[0][0] is None:
        interval = _interval_for_age(age, groups[0][1])
    else:
        # selector-scoped rules (filter:offset:interval): classify each
        # row by the FIRST matching filter (flag order), apply only that
        # group's levels; rows matching no filter stay raw (docs:
        # "If the time series doesn't match any filter, then it isn't
        # downsampled"). A 0s:0s level → interval 0 → raw, the
        # documented exclusion idiom.
        from victoriametrics_spark.engine.planner import selector_predicate
        from victoriametrics_spark.metricsql import parse as _mql_parse

        interval = F.lit(0).cast("long")
        matched = F.lit(False)
        for sel, levels in groups:
            pred = (
                F.lit(True)
                if sel is None
                else selector_predicate(_mql_parse(sel))
            )
            take = ~matched & pred
            interval = F.when(
                take, _interval_for_age(age, levels)
            ).otherwise(interval)
            matched = matched | pred
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
