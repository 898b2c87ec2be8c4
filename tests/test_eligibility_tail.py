"""Irregular-series tests for the round-8 non-span rollup tail —
changes / resets / lifetime / lag / scrape_interval ride the span plan's
eligibility-gated prevValue (rollup.go:780-785), and the
rollupFuncsCanAdjustWindow members default_rollup / rate_over_sum /
timestamp widen implicit windows to the per-series
max(step, maxPrevInterval) (rollup.go:747-756). Regular scrapes never
exercise these paths (the golden corpus is green either way); each test
here builds the irregular shape that distinguishes VM's semantics from
the previous fixed-window behavior, with expected values computed by
hand from the reference functions (rollup.go rollupChanges:2139,
rollupResets, rollupLifetime, rollupLag, rollupScrapeInterval,
rollupDefault).
"""

from __future__ import annotations

import pytest

from victoriametrics_spark import EvalConfig, evaluate
from victoriametrics_spark.schema import SAMPLE_SCHEMA

MIN = 60_000
T0 = 1704067200000  # grid-aligned base


def _mk(spark, points, name="c"):
    rows = [(name, {"s": "a"}, ts, float(v), False) for ts, v in points]
    return spark.createDataFrame(rows, SAMPLE_SCHEMA)


def _vals(df):
    return {r["ts"]: r["value"] for r in df.collect()}


def test_changes_new_series_counts_appearance(spark):
    """A series with NO sample before the window counts its appearance
    as one change (rollupChanges: n++ on values[0])."""
    pts = [(T0 + i * MIN, v) for i, v in enumerate([5.0, 5.0, 7.0, 3.0], 1)]
    cfg = EvalConfig(start=T0 + 4 * MIN, end=T0 + 4 * MIN, step=10 * MIN)
    out = _vals(evaluate(spark, "changes(c[10m])", _mk(spark, pts), cfg))
    # appearance (1) + 5→7 + 7→3 = 3
    assert out[T0 + 4 * MIN] == 3.0


def test_changes_ineligible_anchor_uses_real_prev(spark):
    """An anchor inside the FETCH range but outside maxPrevInterval
    still seeds the change count via realPrevValue ('assume the value
    didn't change during the gap', rollupChanges) — no appearance
    increment."""
    # anchor at T0-4.5m: fetched (fetch_lo = start-4m-5m = T0-5m,
    # inclusive) but ineligible (threshold g-W-mpi = T0-4m with the
    # instant mpi = step = 4m)
    pts = [(T0 - 270_000, 5.0)]
    pts += [(T0 + i * MIN, v) for i, v in enumerate([5.0, 5.0, 7.0, 3.0], 1)]
    # realPrevValue = 5 seeds the count: 5→5 no, 5→5 no, 5→7 yes,
    # 7→3 yes = 2 (an appearance increment would make it 3)
    cfg = EvalConfig(start=T0 + 4 * MIN, end=T0 + 4 * MIN, step=4 * MIN)
    out = _vals(evaluate(spark, "changes(c[4m])", _mk(spark, pts), cfg))
    assert out[T0 + 4 * MIN] == 2.0


def test_changes_empty_window_eligible_anchor_zero(spark):
    """Empty MID-GAP window + eligible anchor → 0 while the anchor stays
    within maxPrevInterval of the window start; the series' resumed
    sample (inside the fetched range) satisfies the i < len(timestamps)
    successor gate."""
    pts = [(T0 - i * MIN, 10.0) for i in range(0, 21)][::-1]
    pts += [(T0 + 4 * MIN, 11.0), (T0 + 5 * MIN, 11.0)]
    cfg = EvalConfig(start=T0, end=T0 + 5 * MIN, step=1 * MIN)
    out = _vals(evaluate(spark, "changes(c[1m])", _mk(spark, pts), cfg))
    # gaps: 19×60s + one 240s → q(0.6) = 60s → mpi = 67.5s
    # T0+1m/(+2m): empty window, anchor T0 within 1m+67.5s of the window
    # start, successor exists → 0; T0+3m: anchor too old → stale
    assert out[T0 + 1 * MIN] == 0.0
    assert out[T0 + 2 * MIN] == 0.0
    assert T0 + 3 * MIN not in out
    # resumed window at T0+4m: realPrev anchor T0 (ineligible) seeds the
    # count → 10→11 = 1 change
    assert out[T0 + 4 * MIN] == 1.0
    # T0+5m: anchor T0+4m eligible; 11→11 → 0 changes
    assert out[T0 + 5 * MIN] == 0.0


def test_resets_ineligible_anchor_counts_from_first(spark):
    """resets has NO realPrevValue fallback: an ineligible anchor means
    the count starts from the first in-window sample."""
    pts = [(T0 - 50 * MIN, 9.0)]  # would add a 9→5 reset if consulted
    pts += [(T0 + i * MIN, v) for i, v in enumerate([5.0, 5.0, 7.0, 3.0], 1)]
    cfg = EvalConfig(start=T0 + 4 * MIN, end=T0 + 4 * MIN, step=4 * MIN)
    out = _vals(evaluate(spark, "resets(c[4m])", _mk(spark, pts), cfg))
    # from values[0]=5: 5→5 no, 5→7 no, 7→3 RESET = 1
    assert out[T0 + 4 * MIN] == 1.0


def test_resets_eligible_anchor_counts_boundary(spark):
    pts = [(T0, 9.0)]
    pts += [(T0 + i * MIN, v) for i, v in enumerate([5.0, 7.0, 3.0], 1)]
    # instant mpi = 3m; anchor T0 > (T0+3m)-3m-3m ✓ eligible →
    # 9→5 RESET, 5→7 no, 7→3 RESET = 2
    cfg = EvalConfig(start=T0 + 3 * MIN, end=T0 + 3 * MIN, step=3 * MIN)
    out = _vals(evaluate(spark, "resets(c[3m])", _mk(spark, pts), cfg))
    assert out[T0 + 3 * MIN] == 2.0


def test_lifetime_extends_to_eligible_anchor(spark):
    """lifetime = l_ts − prevTimestamp when the anchor is eligible
    (rollupLifetime), not l_ts − first-in-window."""
    pts = [(T0 + 2 * MIN, 1.0), (T0 + 3 * MIN, 2.0), (T0 + 4 * MIN, 3.0)]
    cfg = EvalConfig(start=T0 + 4 * MIN, end=T0 + 4 * MIN, step=4 * MIN)
    out = _vals(evaluate(spark, "lifetime(c[2m])", _mk(spark, pts), cfg))
    # window (T0+2m, T0+4m] holds T0+3m, T0+4m; anchor T0+2m within
    # mpi=step=4m of the window start → lifetime = (T0+4m − T0+2m) = 120s
    assert out[T0 + 4 * MIN] == 120.0


def test_lag_empty_window_reports_anchor_age(spark):
    """An empty window with an eligible anchor reports the anchor's age
    (rollupLag: currTimestamp − prevTimestamp), then goes stale."""
    pts = [(T0 - i * MIN, 10.0) for i in range(0, 21)][::-1]
    pts += [(T0 + 4 * MIN, 11.0), (T0 + 5 * MIN, 12.0)]
    cfg = EvalConfig(start=T0, end=T0 + 5 * MIN, step=1 * MIN)
    out = _vals(evaluate(spark, "lag(c[1m])", _mk(spark, pts), cfg))
    # 1m gaps → mpi = 60000 + 7500 = 67.5s
    assert out[T0] == 0.0  # window holds the T0 sample
    # T0+1m: empty window, anchor T0 eligible (threshold T0-67.5s) → 60
    assert out[T0 + 1 * MIN] == 60.0
    # T0+2m: threshold T0-7.5s, anchor T0 still eligible → 120
    assert out[T0 + 2 * MIN] == 120.0
    # T0+3m: threshold T0+52.5s → anchor too old → stale
    assert T0 + 3 * MIN not in out
    assert out[T0 + 4 * MIN] == 0.0  # series resumed


def test_scrape_interval_uses_anchor_span(spark):
    """scrape_interval divides the anchor-to-last span by n when the
    anchor is eligible (rollupScrapeInterval)."""
    pts = [
        (T0, 1.0),
        (T0 + 2 * MIN, 2.0),
        (T0 + 150_000, 3.0),  # T0+2.5m
        (T0 + 4 * MIN, 4.0),
    ]
    cfg = EvalConfig(start=T0 + 4 * MIN, end=T0 + 4 * MIN, step=3 * MIN)
    out = _vals(evaluate(spark, "scrape_interval(c[3m])", _mk(spark, pts), cfg))
    # window (T0+1m, T0+4m] holds 3 samples; anchor T0 eligible
    # (threshold T0+4m-3m-3m = T0-2m) → (240s − 0s)/3 = 80
    # (the ineligible-anchor fallback would give (240−120)/2 = 60)
    assert out[T0 + 4 * MIN] == pytest.approx(80.0, rel=1e-12)


def test_default_rollup_per_series_lookback(spark):
    """default_rollup's implicit window widens to the per-series
    max(step, maxPrevInterval) — a 6m-cadence series queried at 1m step
    keeps reporting (window 6.75m), and goes stale once the last sample
    ages past that window (the old constant max(step, 300s) lookback
    would punch holes between 5m and 6m after each scrape)."""
    pts = [(T0 - i * 6 * MIN, float(100 - i)) for i in range(21)][::-1]
    cfg = EvalConfig(start=T0, end=T0 + 8 * MIN, step=1 * MIN)
    out = _vals(evaluate(spark, "c", _mk(spark, pts), cfg))
    # gaps 360s → tier >32s → mpi = 360000 + 45000 = 405s = 6.75m
    # last sample at T0 (value 100): grid points T0..T0+6m all covered
    for k in range(0, 7):
        assert out[T0 + k * MIN] == 100.0, f"missing at +{k}m"
    # T0+7m: window (T0+0.25m, T0+7m] no longer holds the T0 sample
    assert T0 + 7 * MIN not in out


def test_rate_over_sum_divides_by_widened_window(spark):
    """Implicit-window rate_over_sum divides by the ADJUSTED window
    (rfa.window after widening), not the nominal step."""
    pts = [(T0 - i * 4 * MIN, 6.0) for i in range(21)][::-1]
    cfg = EvalConfig(start=T0, end=T0 + 2 * MIN, step=1 * MIN)
    out = _vals(evaluate(spark, "rate_over_sum(c)", _mk(spark, pts), cfg))
    # gaps 240s → mpi = 240000 + 30000 = 270s → window 4.5m; each window
    # (g−4.5m, g] holds exactly one or two 4m-cadence samples
    # at T0: window (T0-4.5m, T0] holds T0-4m and T0 → 12/270s
    assert out[T0] == pytest.approx(12.0 / 270.0, rel=1e-12)
    # at T0+1m: window (T0-3.5m, T0+1m] holds T0 only → 6/270s
    assert out[T0 + 1 * MIN] == pytest.approx(6.0 / 270.0, rel=1e-12)
