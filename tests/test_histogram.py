"""Histogram bucket math tests — expected values hand-derived from the
reference semantics (transform.go:511-1105) and its exec_test.go golden
cases (e.g. histogram_quantile(single-value-valid-le) → 120)."""

from __future__ import annotations

import pytest

from victoriametrics_spark import EvalConfig, evaluate
from victoriametrics_spark.schema import SAMPLE_SCHEMA

CFG = EvalConfig(start=1_000_000, end=1_000_000, step=200_000)


@pytest.fixture(scope="module")
def empty(spark):
    return spark.createDataFrame([], SAMPLE_SCHEMA)


def rows(spark, empty, q):
    df = evaluate(spark, q, empty, CFG)
    return sorted(
        (r["name"], tuple(sorted((r["labels"] or {}).items())), r["ts"], r["value"])
        for r in df.collect()
    )


BUCKETS = (
    'union(label_set(10, "le", "100", "h", "x"), '
    'label_set(40, "le", "200", "h", "x"), '
    'label_set(50, "le", "+Inf", "h", "x"))'
)


def test_histogram_quantile_single_le(spark, empty):
    # exec_test.go `histogram_quantile(single-value-valid-le)`: 0.6*100=60
    # within (0,200] from 0 → 200*60/100 = 120
    out = rows(spark, empty, 'histogram_quantile(0.6, label_set(100, "le", "200"))')
    assert out == [("", (), 1_000_000, 120.0)]


def test_histogram_quantile_interpolation(spark, empty):
    # vreq=25 lands in (100,200]: 100 + 100*(25-10)/(40-10) = 150
    out = rows(spark, empty, f"histogram_quantile(0.5, {BUCKETS})")
    assert out == [("", (("h", "x"),), 1_000_000, 150.0)]


def test_histogram_quantile_inf_bucket(spark, empty):
    # vreq=0.99*50=49.5 > 40 → +Inf bucket → largest finite le = 200
    out = rows(spark, empty, f"histogram_quantile(0.99, {BUCKETS})")
    assert out == [("", (("h", "x"),), 1_000_000, 200.0)]


def test_histogram_quantile_bounds(spark, empty):
    out = rows(spark, empty, f'histogram_quantile(0.5, {BUCKETS}, "b")')
    by_tag = {lbls: v for _, lbls, _, v in out}
    assert by_tag[(("b", "lower"), ("h", "x"))] == 100.0
    assert by_tag[(("b", "upper"), ("h", "x"))] == 200.0
    assert by_tag[(("h", "x"),)] == 150.0


def test_histogram_share(spark, empty):
    # le=150: lower=10/50; q = 0.2 + (40-10)/50 * 50/100 = 0.5
    out = rows(spark, empty, f"histogram_share(150, {BUCKETS})")
    assert out == [("", (("h", "x"),), 1_000_000, 0.5)]


def test_histogram_avg_stddev(spark, empty):
    # weights: (0,100]=10 @50, (100,200]=30 @150 → avg 125
    out = rows(spark, empty, f"histogram_avg({BUCKETS})")
    assert out == [("", (("h", "x"),), 1_000_000, 125.0)]
    # stdvar = (50²·10 + 150²·30)/40 − 125² = 17500−15625 = 1875
    out = rows(spark, empty, f"histogram_stdvar({BUCKETS})")
    assert out == [("", (("h", "x"),), 1_000_000, 1875.0)]


def test_prometheus_buckets_gap_fill(spark, empty):
    q = (
        'prometheus_buckets(union('
        'label_set(10, "vmrange", "1.000e+00...1.136e+00", "h", "x"), '
        'label_set(20, "vmrange", "4.084e+00...4.642e+00", "h", "x")))'
    )
    out = rows(spark, empty, q)
    got = {dict(lbls)["le"]: v for _, lbls, _, v in out}
    assert got == {
        "1.000e+00": 0.0,
        "1.136e+00": 10.0,
        "4.084e+00": 10.0,
        "4.642e+00": 30.0,
        "+Inf": 30.0,
    }


def test_histogram_quantiles_multi(spark, empty):
    out = rows(
        spark, empty, f'histogram_quantiles("phi", 0.5, 0.99, {BUCKETS})'
    )
    by_phi = {dict(lbls)["phi"]: v for _, lbls, _, v in out}
    assert by_phi == {"0.5": 150.0, "0.99": 200.0}


def test_buckets_limit(spark, empty):
    q = (
        "buckets_limit(3, union("
        'label_set(10, "le", "100", "h", "x"), '
        'label_set(12, "le", "200", "h", "x"), '
        'label_set(40, "le", "300", "h", "x"), '
        'label_set(50, "le", "+Inf", "h", "x")))'
    )
    out = rows(spark, empty, q)
    les = {dict(lbls)["le"] for _, lbls, _, v in out}
    # merges the min-hit adjacent pair while keeping first & last buckets
    assert len(les) == 3
    assert "100" in les and "+Inf" in les


@pytest.mark.slow
def test_vm_histogram_aggregate_roundtrip(spark, empty):
    # histogram() aggregate emits vmrange buckets that prometheus_buckets
    # can parse back into cumulative le buckets
    q = (
        "prometheus_buckets(histogram(union("
        'label_set(1.05, "h", "x"), label_set(4.3, "h", "y"), '
        'label_set(4.5, "h", "z"))))'
    )
    out = rows(spark, empty, q)
    got = {dict(lbls)["le"]: v for _, lbls, _, v in out}
    assert got.get("+Inf") == 3.0
