"""Pins for the round-10 session-3 code-review findings over the
graphite engine — each case encodes reference behavior
(transform.go / render_api.go) in a corner the golden corpus misses."""

from __future__ import annotations

import math

import pytest

from victoriametrics_spark.graphite import render
from victoriametrics_spark.graphite.evaluator import (
    GraphiteEvalError,
    parse_interval,
)

S, E, ST = 120000, 210000, 30000


@pytest.fixture(scope="module")
def empty(spark):
    return spark.createDataFrame([], "name string, ts long, value double")


def rows(spark, empty, target, samples=None):
    df = render(spark, target, samples if samples is not None else empty,
                S, E, ST)
    out = {}
    for r in df.collect():
        out.setdefault(r["name"], {})[r["ts"]] = r["value"]
    return out


def test_multi_target_render_unions_heterogeneous_frames(spark, empty):
    """render() with several targets whose frames carry different
    passenger columns (fetch has __path, aggregates don't) must union
    cleanly."""
    samples = spark.createDataFrame(
        [("web.a.cpu", t, 1.0) for t in range(S, E, ST)],
        "name string, ts long, value double",
    )
    df = render(
        spark,
        ["web.a.cpu", "sumSeries(web.*.cpu)", "time('t', 30)"],
        samples, S, E, ST,
    )
    names = {r["name"] for r in df.collect()}
    assert {"web.a.cpu", "sumSeries(web.*.cpu)", "t"} <= names


def test_moving_average_emits_final_inclusive_point(spark, empty):
    """movingWindow emits tsEnd through the range end INCLUSIVE
    (transform.go:2794-2811 `for tsEnd <= ecCopy.endTime`)."""
    out = rows(spark, empty, "movingAverage(time('a', 30), 2)")
    s = out["movingAverage(a,2)"]
    # output grid: 120000..210000 step 30000, all four points
    assert sorted(s) == [120000, 150000, 180000, 210000]
    # at 210000 the window [150000, 210000) holds values 150, 180
    assert s[210000] == pytest.approx(165.0)


def test_moving_sum_interval_window_off_grid(spark, empty):
    """An interval window that is not a step multiple anchors the output
    grid at innerStart+window — off the series' own points, exactly like
    the reference."""
    out = rows(spark, empty, "movingSum(time('a', 60), '90s')")
    s = out["movingSum(a,'90s')"]
    # innerStart = 120000-90000 = 30000; output grid starts at
    # innerStart+window = 120000 and steps by the series' 60s step
    assert sorted(s) == [120000, 180000]
    # window [30000, 120000) holds the inner points 30000 (30) and
    # 90000 (90) → 120
    assert s[120000] == pytest.approx(120.0)


def test_count_series_counts_non_nan_per_point(spark):
    """aggrCount skips NaN per point (aggr.go:169-177): a series that
    stops mid-range stops counting there."""
    samples = spark.createDataFrame(
        [("web.a.cpu", t, 1.0) for t in range(S, E, ST)]
        + [("web.b.cpu", S, 2.0)],  # b covers only the first point
        "name string, ts long, value double",
    )
    out = rows(spark, None, "countSeries(web.*.cpu)", samples)
    s = out["countSeries(web.*.cpu)"]
    assert s[S] == 2.0
    assert s[S + ST] == 1.0


def test_ema_nan_poisons_tail(spark):
    """transformExponentialMovingAverage has no NaN guard
    (transform.go:1568-1571): after a hole the EMA stays NaN."""
    samples = spark.createDataFrame(
        [("m", t, float(t)) for t in range(S, E, ST) if t != 150000],
        "name string, ts long, value double",
    )
    out = rows(spark, None, "exponentialMovingAverage(m, 2)", samples)
    s = out["exponentialMovingAverage(m,2)"]
    ts_sorted = sorted(s)
    # the first point before the hole is finite, everything after NaN
    assert s[ts_sorted[0]] is not None and not math.isnan(s[ts_sorted[0]])
    for t in ts_sorted:
        if t >= 150000:
            assert s[t] is None or math.isnan(s[t]), t


def test_hitcount_empty_bucket_gets_carry(spark):
    """An empty bucket with a later sample earns the carry
    vPrev·(t_next − bucket_start)/1e3 (transformHitcount:2086-2091).
    The render uses a 10s storage step so fetch-consolidation leaves the
    sample timestamps untouched."""
    samples = spark.createDataFrame(
        [("m", 120000, 10.0), ("m", 180000, 20.0), ("m", 190000, 30.0)],
        "name string, ts long, value double",
    )
    df = render(spark, "hitcount(m, '30s')", samples, S, E, 10000)
    s = {r["ts"]: r["value"] for r in df.collect()}
    # bucket [150000,180000) is empty; carry = 10 * (180000-150000)/1000
    assert s[150000] == pytest.approx(300.0)
    # bucket [180000,210000): first point at the bucket start adds 0,
    # then 30 * (190000-180000)/1e3
    assert s[180000] == pytest.approx(300.0)
    # bucket [120000,150000): only its own point at the start → 0 → NaN
    assert s[120000] is None or math.isnan(s[120000])


def test_clamp_min_nan_bound_keeps_values(spark):
    """clamp_min with a NaN bound must not rewrite values (Go's v < NaN
    is false; Spark's NaN-is-greatest ordering would say true)."""
    from victoriametrics_spark import EvalConfig, evaluate
    from victoriametrics_spark.schema import SAMPLE_SCHEMA

    cfg = EvalConfig(start=1_000_000, end=2_000_000, step=200_000)
    df = spark.createDataFrame(
        [("m", {}, ts, 5.0, False) for ts in range(1_000_000, 2_000_001, 200_000)],
        SAMPLE_SCHEMA,
    )
    out = evaluate(spark, "clamp_min(m, NaN)", df, cfg)
    vals = [r["value"] for r in out.collect()]
    assert vals and all(v == 5.0 for v in vals)


def test_zero_divisor_yields_inf_not_null(spark):
    """Go float division: x/0 is ±Inf, 0/0 is NaN
    (transformDivideSeries / asPercent never guard)."""
    samples = spark.createDataFrame(
        [("num.a", S, 5.0), ("num.a", S + ST, -5.0),
         ("den.a", S, 0.0), ("den.a", S + ST, 0.0)],
        "name string, ts long, value double",
    )
    out = rows(spark, None, "divideSeries(num.a, den.a)", samples)
    s = next(iter(out.values()))
    assert s[S] == math.inf
    assert s[S + ST] == -math.inf


def test_parse_interval_single_prefix_reference_rules():
    """parseInterval (render_api.go:208-252): ONE numeric prefix, the
    suffix matched case-sensitively by prefix, trailing text ignored."""
    assert parse_interval("1h30m") == 3_600_000  # NOT 1h + 30min
    assert parse_interval("2mo") == 2 * 30 * 86_400_000
    assert parse_interval("1min") == 60_000
    with pytest.raises(GraphiteEvalError):
        parse_interval("1H")  # case-sensitive


def test_aggregate_trims_series_suffix(spark, empty):
    out = rows(
        spark, empty,
        "aggregate(group(time('a',30),time('b',30)), 'sumSeries')",
    )
    assert set(out) == {"sumSeries(a,b)"}


def test_smart_summarize_align_weeks_to_monday(spark, empty):
    """alignTimeUnit aligns weeks to ISO Monday, not the epoch Thursday
    (transform.go:5033-5041); unknown units error."""
    from victoriametrics_spark.graphite.functions import _align_time_unit

    # 1970-01-01 is a Thursday; aligning 120000 ms to 'weeks' goes back
    # to Monday 1969-12-29
    got = _align_time_unit(120000, "weeks")
    assert got == -3 * 86_400_000
    with pytest.raises(GraphiteEvalError):
        _align_time_unit(120000, "fortnights")
