"""Transform-function fidelity cases pinned by the round-10 transform
review — each encodes a behavior verified line-by-line against the
reference's transform.go, in corners the golden corpus does not cover."""

from __future__ import annotations

import math

import pytest

from victoriametrics_spark import EvalConfig, evaluate
from victoriametrics_spark.schema import SAMPLE_SCHEMA

# transform parity sweep: slow tier — excluded from the default (driver-window) run;
# opt in with `pytest -m slow` (see pytest.ini)
pytestmark = pytest.mark.slow


CFG = EvalConfig(start=1_000_000, end=2_000_000, step=200_000)
GRID = list(range(1_000_000, 2_000_001, 200_000))


@pytest.fixture(scope="module")
def m_df(spark):
    rows = []
    for i, ts in enumerate(GRID):
        rows.append(("m", {"job": "a", "xx": "123"}, ts, float(i * 3), False))
        rows.append(("m", {"job": "b"}, ts, float(20 - i), False))
    return spark.createDataFrame(rows, SAMPLE_SCHEMA)


def _rows(df):
    return sorted(
        (r["name"], tuple(sorted((r["labels"] or {}).items())), r["ts"],
         r["value"])
        for r in df.collect()
    )


# ---------------------------------------------------------------- absent

def test_absent_copies_plain_eq_filters(spark, m_df):
    """getAbsentTimeseries (transform.go:239-263): absent() of a plain
    selector carries its non-regexp non-negative `=` filters as result
    labels — absent(nosuch{job="x",re=~"y.*",neg!="z"}) → {job="x"} 1."""
    out = evaluate(
        spark, 'absent(nosuch{job="x", re=~"y.*", neg!="z"})', m_df, CFG
    )
    rows = _rows(out)
    assert len(rows) == len(GRID)
    for name, labels, _ts, value in rows:
        assert name == ""
        assert labels == (("job", "x"),)
        assert value == 1.0


def test_absent_or_group_selector_copies_nothing(spark, m_df):
    """With more than one OR filter group VM copies no labels
    (transform.go:247-250 len(tfss) != 1)."""
    out = evaluate(
        spark, 'absent(nosuch{job="x" or env="p"})', m_df, CFG
    )
    rows = _rows(out)
    assert len(rows) == len(GRID)
    assert all(labels == () for _n, labels, _t, _v in rows)


def test_absent_partial_coverage(spark):
    rows = [("m", {"job": "a"}, ts, 1.0, False) for ts in GRID[:3]]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    out = evaluate(spark, 'absent(m{job="a"})', df, CFG)
    got = _rows(out)
    # the last sample (at GRID[2]) still covers GRID[3] through the
    # default 5m staleness lookback — VM's arg evaluation does the same
    assert [(ts, v) for _n, _l, ts, v in got] == [
        (ts, 1.0) for ts in GRID[4:]
    ]
    assert all(labels == (("job", "a"),) for _n, labels, _t, _v in got)


# ---------------------------------------------------------------- scalar

def test_scalar_checks_series_count_globally(spark):
    """transformScalar (transform.go:2405-2412): len(arg) != 1 makes the
    WHOLE result NaN — even at instants where only one of the series has
    a value."""
    rows = [("m", {"j": "a"}, ts, 1.0, False) for ts in GRID]
    # series b covers only the first grid instant → at GRID[1:] exactly
    # one series has a point, but the series COUNT is still 2
    rows.append(("m", {"j": "b"}, GRID[0], 2.0, False))
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    out = evaluate(spark, "scalar(m)", df, CFG)
    assert out.count() == 0
    # exactly one series → values pass through with reset identity
    one = evaluate(spark, 'scalar(m{j="a"})', df, CFG)
    got = _rows(one)
    assert len(got) == len(GRID)
    assert all(n == "" and labels == () for n, labels, _t, _v in got)


# ----------------------------------------------------- metric-name resets

def test_running_and_range_name_semantics(spark, m_df):
    """newTransformFuncRunning resets the metric group unconditionally
    (transform.go:1335) — running_* and range_sum/avg/min/max lose the
    name; the standalone range fns (first/last/quantile/stddev/stdvar/
    mad, trim_*, zscore, normalize) only rewrite values and KEEP it."""
    reset = ["running_avg(m)", "running_min(m)", "range_avg(m)",
             "range_min(m)", "range_sum(m)"]
    keep = ["range_first(m)", "range_last(m)", "range_stddev(m)",
            "range_mad(m)", "range_quantile(0.5, m)", "range_zscore(m)",
            "range_trim_spikes(0.2, m)", "range_trim_zscore(3, m)",
            "range_trim_outliers(5, m)"]
    for q in reset:
        names = {r["name"] for r in evaluate(spark, q, m_df, CFG).collect()}
        assert names == {""}, q
    for q in keep:
        names = {r["name"] for r in evaluate(spark, q, m_df, CFG).collect()}
        assert names == {"m"}, q


def test_label_value_resets_metric_group(spark, m_df):
    out = evaluate(spark, 'label_value(m, "xx")', m_df, CFG)
    rows = _rows(out)
    assert rows, "series with xx label must survive"
    assert all(n == "" for n, _l, _t, _v in rows)
    assert all(v == 123.0 for _n, _l, _t, v in rows)


# ---------------------------------------------------------------- clamp

def test_clamp_min_greater_than_max_follows_vm_order(spark, m_df):
    """transformClamp applies v > max FIRST, then v < min
    (transform.go:282-289): with min=10 > max=2, v<=2 → 10 and v>2 → 2
    (never the raw value)."""
    out = evaluate(spark, 'clamp(m{job="a"}, 10, 2)', m_df, CFG)
    vals = [v for _n, _l, _t, v in _rows(out)]
    # m{job=a} = 0,3,6,9,12,15 → 0<=2 → 10; rest >2 → 2
    assert vals.count(10.0) == 1 and vals.count(2.0) == 5


def test_clamp_max_nan_bound_leaves_values(spark, m_df):
    """A NaN bound never matches the Go comparison → values unchanged
    (getScalar NaN rows; v > NaN is false). Spark's NaN-is-greatest
    ordering must not leak through."""
    out = evaluate(spark, 'clamp_max(m{job="a"}, NaN)', m_df, CFG)
    vals = sorted(v for _n, _l, _t, v in _rows(out))
    assert vals == [0.0, 3.0, 6.0, 9.0, 12.0, 15.0]


# --------------------------------------------------------------- bitmap

def test_bitmap_mask_is_per_step_scalar(spark):
    """The second arg is a getScalar vector — bitmap_and(m, time()-based)
    varies the mask across the grid (newTransformBitmap ns[i])."""
    rows = [("m", {}, ts, 7.0, False) for ts in GRID]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    out = evaluate(spark, "bitmap_and(m, time()/100 % 4)", df, CFG)
    got = {ts: v for _n, _l, ts, v in _rows(out)}
    for ts in GRID:
        mask = int((ts / 1000) / 100 % 4)
        assert got[ts] == float(7 & mask), ts


# ------------------------------------------------------ smooth_exponential

def test_smooth_exponential_nan_sf_means_one(spark, m_df):
    out = evaluate(spark, 'smooth_exponential(m{job="a"}, NaN)', m_df, CFG)
    vals = [v for _n, _l, _t, v in _rows(out)]
    assert vals == [0.0, 3.0, 6.0, 9.0, 12.0, 15.0]


def test_smooth_exponential_inf_handling(spark):
    """Leading ±Inf points pass through unchanged; the first finite value
    seeds the average; interior Inf emits the current average without
    updating it (transformSmoothExponential transform.go:1660-1695)."""
    inf = float("inf")
    vals_in = [inf, inf, 4.0, inf, 8.0, 10.0]
    rows = [("m", {}, ts, v, False) for ts, v in zip(GRID, vals_in)]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    out = evaluate(spark, "smooth_exponential(m, 0.5)", df, CFG)
    got = [v for _n, _l, _t, v in _rows(out)]
    assert got == [inf, inf, 4.0, 4.0, 6.0, 8.0]


# --------------------------------------------------------- range_normalize

def test_range_normalize_drops_series_with_infinite_spread(spark):
    """vMax - vMin == ±Inf drops the whole series
    (transform.go:1383-1385) — finite points must not survive as 0."""
    inf = float("inf")
    rows = [("m", {"j": "a"}, GRID[0], 1.0, False),
            ("m", {"j": "a"}, GRID[1], inf, False),
            ("m", {"j": "b"}, GRID[0], 1.0, False),
            ("m", {"j": "b"}, GRID[1], 3.0, False)]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    out = evaluate(spark, "range_normalize(m)", df, CFG)
    got = _rows(out)
    assert all(labels == (("j", "b"),) for _n, labels, _t, _v in got)
    # b on the grid is [1, 3, 3] (staleness lookback carries the last
    # sample one step) → normalized [0, 1, 1]
    assert sorted(v for _n, _l, _t, v in got) == [0.0, 1.0, 1.0]


# ------------------------------------------------------------ buckets_limit

def test_buckets_limit_nonpositive_limit_errors(spark, m_df):
    with pytest.raises(Exception, match="greater than 0"):
        evaluate(spark, "buckets_limit(0, m)", m_df, CFG).collect()


def test_absent_over_time_or_groups_copy_nothing(spark, m_df):
    out = evaluate(
        spark, 'absent_over_time(nosuch{a="1" or b="2"}[5m])', m_df, CFG
    )
    rows = _rows(out)
    assert rows and all(labels == () for _n, labels, _t, _v in rows)
