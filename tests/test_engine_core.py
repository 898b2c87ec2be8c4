"""Engine-core tests on tiny hand-built sample DataFrames.

Grid mirrors the reference's golden harness (exec_test.go:53-56):
start=1000e3, end=2000e3, step=200e3 → 6 points.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from victoriametrics_spark import EvalConfig, evaluate
from victoriametrics_spark.schema import SAMPLE_SCHEMA

CFG = EvalConfig(start=1_000_000, end=2_000_000, step=200_000)
GRID = CFG.grid()


def mk_samples(spark, rows):
    return spark.createDataFrame(rows, SAMPLE_SCHEMA)


@pytest.fixture(scope="module")
def counter_df(spark):
    # one counter series, 100s interval, +10 per sample, reset at t=1_500_000
    rows = []
    v = 0.0
    for i, ts in enumerate(range(0, 2_100_000, 100_000)):
        if ts == 1_500_000:
            v = 5.0  # counter reset
        else:
            v += 10.0
        rows.append(("http_requests_total", {"job": "api"}, ts, v, False))
    return mk_samples(spark, rows)


@pytest.fixture(scope="module")
def gauges_df(spark):
    # two gauge series, samples exactly at grid points
    rows = []
    for ts in range(0, 2_100_000, 200_000):
        rows.append(("temp", {"room": "a"}, ts, float(ts) / 1e5, False))
        rows.append(("temp", {"room": "b"}, ts, 2.0 * ts / 1e5, False))
    return mk_samples(spark, rows)


def as_map(df):
    out = {}
    for row in df.collect():
        key = (row["name"], tuple(sorted((row["labels"] or {}).items())))
        out.setdefault(key, {})[row["ts"]] = row["value"]
    return out


def test_last_over_time(spark, gauges_df):
    res = evaluate(spark, "last_over_time(temp[200s])", gauges_df, CFG)
    m = as_map(res)
    key_a = ("temp", (("room", "a"),))
    assert key_a in m
    assert m[key_a][1_000_000] == 10.0
    assert m[key_a][2_000_000] == 20.0


def test_default_rollup_selector(spark, gauges_df):
    res = evaluate(spark, 'temp{room="a"}', gauges_df, CFG)
    m = as_map(res)
    assert len(m) == 1
    ((_, labels),) = m.keys()
    assert labels == (("room", "a"),)


def test_avg_over_time(spark, gauges_df):
    res = evaluate(spark, "avg_over_time(temp[400s])", gauges_df, CFG)
    m = as_map(res)
    # window (600e3, 1000e3]: samples at 800e3 (8.0) and 1000e3 (10.0)
    assert m[("temp", (("room", "a"),))][1_000_000] == pytest.approx(9.0)


def test_rate_counter_with_reset(spark, counter_df):
    res = evaluate(spark, "rate(http_requests_total[500s])", counter_df, CFG)
    m = as_map(res)
    vals = m[("", (("job", "api"),))]
    # steady +10/100s = 0.1/s away from the reset
    assert vals[1_000_000] == pytest.approx(0.1)
    # window (1500e3,2000e3]: deltas at 1.6..2.0 all +10 → 50/500 = 0.1;
    # reset at 1.5 not in window
    assert vals[2_000_000] == pytest.approx(0.1)
    # window (900e3,1400e3]: includes reset sample at 1_500_000? no —
    # at 1_400_000 grid: samples 1.0..1.4, no reset → 0.1
    assert vals[1_400_000] == pytest.approx(0.1)
    # grid 1_600_000, window (1100e3,1600e3]: deltas 1.2,1.3,1.4 = +10 each,
    # reset sample at 1.5 contributes +5 (value after reset), 1.6 contributes +10
    assert vals[1_600_000] == pytest.approx((10 * 4 + 5) / 500.0)


def test_increase(spark, counter_df):
    res = evaluate(spark, "increase(http_requests_total[500s])", counter_df, CFG)
    m = as_map(res)
    vals = m[("", (("job", "api"),))]
    assert vals[1_000_000] == pytest.approx(50.0)


def test_sum_rate_by(spark, gauges_df):
    res = evaluate(
        spark, "sum(last_over_time(temp[200s])) by (room)", gauges_df, CFG
    )
    m = as_map(res)
    assert m[("", (("room", "a"),))][1_000_000] == 10.0
    assert m[("", (("room", "b"),))][1_000_000] == 20.0


def test_sum_all(spark, gauges_df):
    res = evaluate(spark, "sum(last_over_time(temp[200s]))", gauges_df, CFG)
    m = as_map(res)
    assert m[("", ())][1_000_000] == 30.0
    assert m[("", ())][2_000_000] == 60.0


def test_binop_series_scalar(spark, gauges_df):
    res = evaluate(spark, 'temp{room="a"} * 2', gauges_df, CFG)
    m = as_map(res)
    assert m[("", (("room", "a"),))][1_000_000] == 20.0


def test_binop_series_series(spark, gauges_df):
    res = evaluate(
        spark,
        'temp{room="a"} + on() temp{room="b"}',
        gauges_df,
        CFG,
    )
    m = as_map(res)
    assert m[("", ())][1_000_000] == 30.0


def test_comparison_filter(spark, gauges_df):
    res = evaluate(spark, "temp > 25", gauges_df, CFG)
    m = as_map(res)
    # only room=b values above 25 (28 at 1.4e6 … 40 at 2e6)
    key_b = ("temp", (("room", "b"),))
    assert key_b in m
    assert all(v > 25 for v in m[key_b].values())
    assert ("temp", (("room", "a"),)) not in m


def test_comparison_bool(spark, gauges_df):
    res = evaluate(spark, 'temp{room="a"} >bool 15', gauges_df, CFG)
    m = as_map(res)
    vals = m[("", (("room", "a"),))]
    assert vals[1_000_000] == 0.0
    assert vals[2_000_000] == 1.0


def test_scalar_expr(spark, gauges_df):
    res = evaluate(spark, "2 + 3 * 4", gauges_df, CFG)
    rows = res.collect()
    assert len(rows) == 6
    assert all(r["value"] == 14.0 for r in rows)


def test_time_func(spark, gauges_df):
    res = evaluate(spark, "time()", gauges_df, CFG)
    m = {r["ts"]: r["value"] for r in res.collect()}
    assert m[1_000_000] == 1000.0
    assert m[2_000_000] == 2000.0


def test_abs_transform(spark, gauges_df):
    res = evaluate(spark, 'abs(temp{room="a"} - 15)', gauges_df, CFG)
    m = as_map(res)
    vals = m[("", (("room", "a"),))]
    assert vals[1_000_000] == 5.0
    assert vals[2_000_000] == 5.0


def test_quantile_over_time(spark, gauges_df):
    res = evaluate(
        spark, "quantile_over_time(0.5, temp[400s])", gauges_df, CFG
    )
    m = as_map(res)
    assert m[("temp", (("room", "a"),))][1_000_000] == pytest.approx(9.0)


def test_count_and_changes(spark, counter_df):
    res = evaluate(spark, "changes(http_requests_total[500s])", counter_df, CFG)
    m = as_map(res)
    vals = m[("", (("job", "api"),))]
    assert vals[1_000_000] == 5.0  # 5 in-window samples, all changed


def test_topk(spark, gauges_df):
    res = evaluate(spark, "topk(1, temp)", gauges_df, CFG)
    m = as_map(res)
    assert ("temp", (("room", "b"),)) in m
    assert ("temp", (("room", "a"),)) not in m


def test_or_union(spark, gauges_df):
    res = evaluate(
        spark, 'temp{room="a"} or temp{room="b"}', gauges_df, CFG
    )
    m = as_map(res)
    assert len(m) == 2


def test_absent(spark, gauges_df):
    res = evaluate(spark, "absent(no_such_metric)", gauges_df, CFG)
    rows = res.collect()
    assert len(rows) == 6
    assert all(r["value"] == 1.0 for r in rows)


def test_subquery_max_of_rate(spark, counter_df):
    res = evaluate(
        spark,
        "max_over_time(rate(http_requests_total[200s])[400s:200s])",
        counter_df,
        CFG,
    )
    m = as_map(res)
    vals = m[("", (("job", "api"),))]
    assert vals[1_000_000] == pytest.approx(0.1)


def test_sort_and_sort_desc_order(spark, gauges_df):
    res = evaluate(spark, "sort_desc(last_over_time(temp[200s]))", gauges_df, CFG)
    rows = res.collect()
    # room=b (2x values) must come before room=a in presentation order
    first_room = rows[0]["labels"]["room"]
    assert first_room == "b"
    res_asc = evaluate(spark, "sort(last_over_time(temp[200s]))", gauges_df, CFG)
    assert res_asc.collect()[0]["labels"]["room"] == "a"
    # row SET unchanged
    assert res.count() == res_asc.count() == 12


def test_sort_by_label(spark, gauges_df):
    res = evaluate(
        spark, 'sort_by_label_desc(last_over_time(temp[200s]), "room")',
        gauges_df, CFG,
    )
    assert res.collect()[0]["labels"]["room"] == "b"


def test_aggr_limit_modifier(spark, gauges_df):
    # two groups (room=a, room=b); limit 1 keeps only the first in
    # canonical group-key order (room=a)
    res = evaluate(
        spark, "sum(last_over_time(temp[200s])) by (room) limit 1",
        gauges_df, CFG,
    )
    rooms = {r["labels"]["room"] for r in res.collect()}
    assert rooms == {"a"}


def test_binop_duplicate_series_error(spark):
    # two series collapse to the same match key via ignoring(room) → the
    # one-to-one join must raise (VM ensureSingleTimeseries)
    rows = []
    for ts in range(0, 2_100_000, 200_000):
        rows.append(("m", {"room": "a"}, ts, 1.0, False))
        rows.append(("m", {"room": "b"}, ts, 2.0, False))
        rows.append(("n", {}, ts, 5.0, False))
    df = mk_samples(spark, rows)
    q = (
        "last_over_time(m[200s]) + ignoring(room) last_over_time(n[200s])"
    )
    with pytest.raises(Exception, match="duplicate time series"):
        evaluate(spark, q, df, CFG).collect()


def test_binop_group_left_ok(spark):
    rows = []
    for ts in range(0, 2_100_000, 200_000):
        rows.append(("m", {"room": "a"}, ts, 1.0, False))
        rows.append(("m", {"room": "b"}, ts, 2.0, False))
        rows.append(("n", {}, ts, 5.0, False))
    df = mk_samples(spark, rows)
    q = (
        "last_over_time(m[200s]) * on() group_left() last_over_time(n[200s])"
    )
    res = evaluate(spark, q, df, CFG)
    vals = {r["value"] for r in res.collect()}
    assert vals == {5.0, 10.0}


def test_scalar_set_op_or(spark, gauges_df):
    # vector or scalar: scalar materializes as an empty-label series, so it
    # unions in (labels never collide with the vector's)
    res = evaluate(spark, "last_over_time(temp[200s]) or 7", gauges_df, CFG)
    m = as_map(res)
    key_scalar = ("", ())
    assert key_scalar in m
    assert all(v == 7.0 for v in m[key_scalar].values())
    assert len(m) == 3


def test_rand_family_deterministic_and_distributed(spark, gauges_df):
    for fn in ("rand(1)", "rand_normal(1)", "rand_exponential(1)"):
        a = evaluate(spark, fn, gauges_df, CFG).collect()
        b = evaluate(spark, fn, gauges_df, CFG).collect()
        assert sorted(r["value"] for r in a) == sorted(r["value"] for r in b)
        assert len(a) == 6
    u = [r["value"] for r in evaluate(spark, "rand(7)", gauges_df, CFG).collect()]
    assert all(0.0 <= v < 1.0 for v in u)
    assert len(set(u)) > 1  # not constant
    e = [
        r["value"]
        for r in evaluate(spark, "rand_exponential(7)", gauges_df, CFG).collect()
    ]
    assert all(v >= 0.0 for v in e)
    # different seeds → different streams
    u2 = [r["value"] for r in evaluate(spark, "rand(8)", gauges_df, CFG).collect()]
    assert u != u2


def test_label_map(spark):
    rows = [
        ("m", {"dc": "east"}, 1_000_000, 1.0, False),
        ("m", {"dc": "west"}, 1_000_000, 2.0, False),
        ("m", {"dc": "other"}, 1_000_000, 3.0, False),
    ]
    df = mk_samples(spark, rows)
    cfg = EvalConfig(start=1_000_000, end=1_000_000, step=200_000)
    out = evaluate(
        spark,
        'label_map(last_over_time(m[200s]), "dc", "east", "E", "west", "")',
        df, cfg,
    )
    got = {r["value"]: dict(r["labels"] or {}) for r in out.collect()}
    assert got[1.0] == {"dc": "E"}
    assert got[2.0] == {}  # empty mapping removes the label
    assert got[3.0] == {"dc": "other"}  # unmapped → unchanged


def test_label_graphite_group(spark):
    rows = [("a.b.c.d", {}, 1_000_000, 1.0, False)]
    df = mk_samples(spark, rows)
    cfg = EvalConfig(start=1_000_000, end=1_000_000, step=200_000)
    out = evaluate(
        spark,
        "label_graphite_group(last_over_time({__name__='a.b.c.d'}[200s]), 0, 2)",
        df, cfg,
    )
    assert [r["name"] for r in out.collect()] == ["a.c"]


def test_range_mad_and_trim_spikes(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 100.0, 5.0]
    rows = [
        ("m", {"s": "x"}, 1_000_000 + i * 200_000, v, False)
        for i, v in enumerate(vals)
    ]
    df = mk_samples(spark, rows)
    out = evaluate(spark, "range_mad(last_over_time(m[200s]))", df, CFG)
    got = {r["value"] for r in out.collect()}
    # median = 3.5; deviations |v-3.5| = [2.5,1.5,.5,.5,96.5,1.5] → median 1.5
    assert got == {1.5}

    trimmed = evaluate(
        spark, "range_trim_spikes(0.4, last_over_time(m[200s]))", df, CFG
    )
    kept = sorted(r["value"] for r in trimmed.collect())
    # phi/2 = 0.2 trimmed at each end: 100 (top) and 1 (bottom) dropped
    assert 100.0 not in kept and 1.0 not in kept
    assert len(kept) == 4


def test_graphite_selector_glob(spark):
    rows = [
        ("web.srv1.cpu", {}, 1_000_000, 1.0, False),
        ("web.srv2.cpu", {}, 1_000_000, 2.0, False),
        ("web.srv1.mem", {}, 1_000_000, 3.0, False),
        ("db.srv1.cpu", {}, 1_000_000, 4.0, False),
    ]
    df = mk_samples(spark, rows)
    cfg = EvalConfig(start=1_000_000, end=1_000_000, step=200_000)

    def names(q):
        return sorted(
            r["value"]
            for r in evaluate(spark, q, df, cfg).collect()
        )

    assert names('last_over_time({__graphite__="web.*.cpu"}[200s])') == [1.0, 2.0]
    assert names('last_over_time({__graphite__="web.srv?.{cpu,mem}"}[200s])') == [
        1.0, 2.0, 3.0,
    ]
    # * must not cross dot groups
    assert names('last_over_time({__graphite__="web.*"}[200s])') == []
    assert names('last_over_time({__graphite__!="web.*.cpu"}[200s])') == [3.0, 4.0]


def test_enforced_extra_filters(spark, gauges_df):
    cfg = EvalConfig(
        start=1_000_000,
        end=2_000_000,
        step=200_000,
        enforced_filters=(("room", "=", "a"),),
    )
    out = evaluate(spark, "last_over_time(temp[200s])", gauges_df, cfg).collect()
    assert out and all(r["labels"]["room"] == "a" for r in out)
    # the enforced filter survives even a selector with its own filters
    out2 = evaluate(
        spark, 'last_over_time(temp{room=~".+"}[200s])', gauges_df, cfg
    ).collect()
    assert out2 and all(r["labels"]["room"] == "a" for r in out2)


def test_at_modifier_multi_series_errors_without_collect(
    spark, gauges_df, monkeypatch
):
    """A multi-series `@` argument must fail the single-series check
    via a scalar aggregate, never by shipping the expression's rows to
    the driver (eval.go:905-932; the round-9 version collected the
    whole frame first). The spy caps every driver materialization at
    2 rows — the cardinality probe and the limit-1 value fetch pass,
    a full-frame collect would trip it."""
    from pyspark.sql import DataFrame

    real_collect = DataFrame.collect

    def capped_collect(self):
        rows = real_collect(self)
        assert len(rows) <= 2, (
            f"@-modifier resolution collected {len(rows)} rows "
            "driver-side; it must probe cardinality executor-side"
        )
        return rows

    monkeypatch.setattr(DataFrame, "collect", capped_collect)
    with pytest.raises(Exception, match="must return a single series"):
        evaluate(spark, "temp @ temp", gauges_df, CFG)
    # the error carries the actual series count like the reference
    try:
        evaluate(spark, "temp @ temp", gauges_df, CFG)
    except Exception as e:
        assert "2 series" in str(e)


def test_at_modifier_single_series_value(spark, gauges_df, monkeypatch):
    """Single-series `@` resolves to the first non-NaN value with only
    bounded driver materializations (scalar probe + limit-1 fetch)."""
    from pyspark.sql import DataFrame

    real_collect = DataFrame.collect

    def capped_collect(self):
        rows = real_collect(self)
        assert len(rows) <= 10
        return rows

    monkeypatch.setattr(DataFrame, "collect", capped_collect)
    res = evaluate(spark, 'temp @ (temp{room="a"})', gauges_df, CFG)
    out = as_map(res)
    # temp{room="a"}'s first non-NaN grid value is 10.0 → both rooms
    # evaluated at t=10s, where samples exist at t=0
    assert len(out) == 2
    for pts in out.values():
        assert len(set(pts.values())) == 1  # @-pinned: constant series
