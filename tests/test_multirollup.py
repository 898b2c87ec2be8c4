"""Multi-output rollups, @ modifier, sequential-state functions —
expected values hand-derived from rollup.go:440-520 (preFunc family),
rollup.go:2206-2280 (candlestick), rollup.go:1030-1076 (holt_winters),
transform.go (smooth_exponential / remove_resets)."""

from __future__ import annotations

import pytest

from victoriametrics_spark import EvalConfig, evaluate
from victoriametrics_spark.schema import SAMPLE_SCHEMA

CFG = EvalConfig(start=1_000_000, end=2_000_000, step=200_000)


@pytest.fixture(scope="module")
def series_df(spark):
    # +10/100s counter, reset to 5 at t=1_500_000
    rows, v = [], 0.0
    for ts in range(0, 2_100_000, 100_000):
        v += 10.0
        if ts == 1_500_000:
            v = 5.0
        rows.append(("m", {"job": "x"}, ts, v, False))
    return spark.createDataFrame(rows, SAMPLE_SCHEMA)


def at_ts(spark, q, df, ts):
    out = evaluate(spark, q, df, CFG)
    return {
        tuple(sorted((r["labels"] or {}).items())): r["value"]
        for r in out.collect()
        if r["ts"] == ts
    }


def test_rollup_candlestick(spark, series_df):
    # candle at 1.2e6 covers [1.2e6, 1.4e6): samples v=130 (1.2e6), 140 (1.3e6)
    got = at_ts(spark, "rollup_candlestick(m[200s])", series_df, 1_200_000)
    assert got[(("job", "x"), ("rollup", "open"))] == 130.0
    assert got[(("job", "x"), ("rollup", "close"))] == 140.0
    assert got[(("job", "x"), ("rollup", "low"))] == 130.0
    assert got[(("job", "x"), ("rollup", "high"))] == 140.0


def test_rollup_minmaxavg(spark, series_df):
    got = at_ts(spark, "rollup(m[200s])", series_df, 1_200_000)
    assert got[(("job", "x"), ("rollup", "min"))] == 120.0
    assert got[(("job", "x"), ("rollup", "max"))] == 130.0
    assert got[(("job", "x"), ("rollup", "avg"))] == 125.0


def test_rollup_delta_and_increase(spark, series_df):
    got = at_ts(spark, "rollup_delta(m[400s])", series_df, 1_600_000)
    # forward deltas of samples in (1.2e6, 1.6e6]: at 1.3→+10, 1.4→+10,
    # 1.5(reset to 5)→+10, 1.6→+10 ... delta at 1.4 is 5-150=-145
    assert got[(("job", "x"), ("rollup", "min"))] == -145.0
    got_i = at_ts(spark, "rollup_increase(m[400s])", series_df, 1_600_000)
    # reset-adjusted: the drop counts as +5 (restart from ~0)
    assert got_i[(("job", "x"), ("rollup", "min"))] == 5.0
    assert got_i[(("job", "x"), ("rollup", "max"))] == 10.0


def test_rollup_single_tag(spark, series_df):
    got = at_ts(spark, 'rollup(m[200s], "avg")', series_df, 1_200_000)
    # explicit flavor selection returns the bare series — no rollup tag
    # (appendRollupConfigs tagValue "", rollup.go:415-433)
    assert list(got) == [(("job", "x"),)]


def test_quantiles_over_time(spark, series_df):
    got = at_ts(
        spark, 'quantiles_over_time("phi", 0.25, 0.75, m[400s])',
        series_df, 1_200_000,
    )
    # window values 100,110,120,130 → q25=107.5, q75=122.5
    assert got[(("job", "x"), ("phi", "0.25"))] == 107.5
    assert got[(("job", "x"), ("phi", "0.75"))] == 122.5


def test_count_values_over_time(spark, series_df):
    got = at_ts(spark, 'count_values_over_time("v", m[400s])', series_df, 1_200_000)
    assert got == {
        (("job", "x"), ("v", "100")): 1.0,
        (("job", "x"), ("v", "110")): 1.0,
        (("job", "x"), ("v", "120")): 1.0,
        (("job", "x"), ("v", "130")): 1.0,
    }


def test_aggr_over_time(spark, series_df):
    got = at_ts(
        spark,
        'aggr_over_time(("min_over_time", "max_over_time"), m[400s])',
        series_df, 1_200_000,
    )
    assert got[(("job", "x"), ("rollup", "min_over_time"))] == 100.0
    assert got[(("job", "x"), ("rollup", "max_over_time"))] == 130.0


def test_holt_winters(spark, series_df):
    # s0=prev(110); b0=10; two steps on 120,130 → 130
    got = at_ts(spark, "holt_winters(m[200s], 0.5, 0.5)", series_df, 1_200_000)
    assert got[(("job", "x"),)] == 130.0


def test_at_modifier_broadcast(spark, series_df):
    out = evaluate(spark, "last_over_time(m[200s] @ 1000)", series_df, CFG)
    rows = out.collect()
    assert len(rows) == CFG.num_points
    assert {r["value"] for r in rows} == {110.0}


def test_smooth_exponential(spark, series_df):
    got = at_ts(
        spark, "smooth_exponential(last_over_time(m[200s]), 0.5)",
        series_df, 1_400_000,
    )
    # grid lasts 110,130,150 → 110, 120, 135
    assert got[(("job", "x"),)] == 135.0


def test_remove_resets(spark, series_df):
    got = at_ts(spark, "remove_resets(last_over_time(m[200s]))", series_df, 2_000_000)
    # lasts: 110,130,150,15,35,55 → corr 150 after reset → 205
    assert got[(("job", "x"),)] == 205.0


def test_stale_samples_over_time(spark):
    rows = [
        ("m", {"job": "x"}, 1_100_000, 1.0, False),
        ("m", {"job": "x"}, 1_150_000, 2.0, True),
        ("m", {"job": "x"}, 1_180_000, 3.0, True),
    ]
    import pytest as _p

    spark_df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    out = evaluate(spark, "stale_samples_over_time(m[200s])", spark_df, CFG)
    got = {r["ts"]: r["value"] for r in out.collect()}
    assert got[1_200_000] == 2.0
