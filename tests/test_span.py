"""Unit tests for the span-normalized rate/deriv family
(victoriametrics_spark/engine/span.py) on hand-built IRREGULAR series —
the cases the dense golden grid never exercises: anchor eligibility,
empty-window ghost points, partial counter resets, implicit-window
widening, and the per-series scrape-interval estimate. Expected values
are computed by hand from the reference semantics
(app/vmselect/promql/rollup.go:871-919, 922-958, 1954-1990, 747-756).
"""

from __future__ import annotations

import pytest

from victoriametrics_spark import EvalConfig, evaluate
from victoriametrics_spark.schema import SAMPLE_SCHEMA

MIN = 60_000


def _mk(spark, points, name="c"):
    rows = [(name, {"s": "a"}, ts, float(v), False) for ts, v in points]
    return spark.createDataFrame(rows, SAMPLE_SCHEMA)


def _vals(df):
    return {r["ts"]: r["value"] for r in df.collect()}


T0 = 1704067200000  # grid-aligned base


def test_rate_span_denominator(spark):
    """rate uses the ACTUAL span (tLast − tAnchor), not the window:
    samples 2 min apart inside a 5m window."""
    pts = [(T0 - 2 * MIN, 10.0), (T0, 16.0), (T0 + 2 * MIN, 28.0)]
    cfg = EvalConfig(start=T0 + 2 * MIN, end=T0 + 2 * MIN, step=5 * MIN)
    # instant query → maxPrevInterval = step (5m) → anchor (T0-2m) is
    # within 5m of the window start (T0-3m) → eligible.
    # S_all = (16-10) + (28-16) = 18 over span (T0+2m − (T0−2m)) = 240s
    out = _vals(evaluate(spark, "rate(c[5m])", _mk(spark, pts), cfg))
    assert out[T0 + 2 * MIN] == pytest.approx(18.0 / 240.0, rel=1e-12)


def test_rate_ineligible_anchor_falls_back_to_first(spark):
    """A prev sample FAR before the window start is not an eligible
    anchor: the first in-window sample anchors instead and its delta is
    excluded from the numerator."""
    # regular 1m cadence long ago, then a 50m gap, then two samples
    pts = [(T0 - (50 + i) * MIN, float(i)) for i in range(21)]
    pts += [(T0 + 1 * MIN, 100.0), (T0 + 3 * MIN, 160.0)]
    cfg = EvalConfig(start=T0 + 4 * MIN, end=T0 + 4 * MIN, step=4 * MIN)
    # instant → mpi = step = 4m; anchor = T0-50m, window start T0;
    # T0-50m <= T0-4m → ineligible → rate = (160-100)/(120s)
    out = _vals(evaluate(spark, "rate(c[4m])", _mk(spark, pts), cfg))
    assert out[T0 + 4 * MIN] == pytest.approx(60.0 / 120.0, rel=1e-12)


def test_rate_single_sample_no_anchor_yields_nothing(spark):
    pts = [(T0 + 1 * MIN, 100.0)]
    cfg = EvalConfig(start=T0 + 4 * MIN, end=T0 + 4 * MIN, step=4 * MIN)
    out = _vals(evaluate(spark, "rate(c[4m])", _mk(spark, pts), cfg))
    assert out == {}


def test_rate_stopped_scrape_goes_stale(spark):
    """A series whose last sample precedes every window start emits NO
    points (rollup.go:781: prevValue requires a fetched sample after the
    window start — `i < len(timestamps)`). A stopped scrape must go
    stale, not show rate()=0 forever."""
    pts = [(T0 - i * MIN, 100.0 - i) for i in range(1, 22)][::-1]
    samples = _mk(spark, pts)
    cfg = EvalConfig(start=T0, end=T0 + 10 * MIN, step=1 * MIN)
    out = _vals(evaluate(spark, "rate(c[1m])", samples, cfg))
    # last sample is AT T0-1m; every grid window (g-1m, g] for g >= T0
    # is empty AND no fetched sample lies after any window start → the
    # anchor is never eligible → no ghost points anywhere
    assert out == {}


def test_rate_empty_window_ghost_zero_mid_gap(spark):
    """An empty window INSIDE a live series (gap in the middle) emits 0
    while the anchor stays within maxPrevInterval of the window start —
    here the i < len(timestamps) gate holds because the series resumes."""
    # 1m cadence, a 4-minute hole after T0, then the series resumes.
    # gaps 60s → tier >32s: mpi = 60000 + 7500 = 67.5s
    pts = [(T0 - i * MIN, 100.0 - i) for i in range(0, 21)][::-1]
    pts += [(T0 + 4 * MIN, 104.0), (T0 + 5 * MIN, 105.0)]
    samples = _mk(spark, pts)
    cfg = EvalConfig(start=T0, end=T0 + 5 * MIN, step=1 * MIN)
    out = _vals(evaluate(spark, "rate(c[1m])", samples, cfg))
    # at T0+1m: window (T0, T0+1m] empty; anchor = T0 sample; eligible
    # iff T0 > T0+1m-1m-67.5s = T0-67.5s ✓ and a later sample exists ✓
    assert out[T0 + 1 * MIN] == 0.0
    # at T0+2m: threshold T0+2m-1m-67.5s = T0-7.5s; T0 > T0-7.5s ✓ → 0
    assert out[T0 + 2 * MIN] == 0.0
    # at T0+3m: threshold T0+52.5s — the T0 anchor is too old → stale
    assert T0 + 3 * MIN not in out
    # at T0+4m the window holds ONE resumed sample with an ineligible
    # anchor → no point (rate needs n≥2 without an anchor)
    assert T0 + 4 * MIN not in out
    # at T0+5m: anchor = T0+4m (eligible), span = 60s, adjusted Δ = 1
    assert out[T0 + 5 * MIN] == pytest.approx(1.0 / 60.0, rel=1e-12)


def test_partial_counter_reset(spark):
    """Drops smaller than 1/8 of the previous value are partial resets
    (adjusted delta 0); bigger drops restart the counter
    (removeCounterResets, rollup.go:922-958)."""
    pts = [
        (T0 + 0 * MIN, 1000.0),
        (T0 + 1 * MIN, 990.0),  # -10 < 1000/8 → partial → +0
        (T0 + 2 * MIN, 1010.0),  # +20
        (T0 + 3 * MIN, 100.0),  # -910 > 1010/8 → full reset → +100
        (T0 + 4 * MIN, 150.0),  # +50
    ]
    cfg = EvalConfig(start=T0 + 4 * MIN, end=T0 + 4 * MIN, step=4 * MIN)
    out = _vals(evaluate(spark, "increase(c[10m])", _mk(spark, pts), cfg))
    # no anchor before the window; heuristic: |v0|=1000 >= 10*(|d|+1)
    # with d = adjusted second delta = 0 → 10 → drop first sample:
    # increase = tail adjusted sum = 0 + 20 + 100 + 50 = 170
    assert out[T0 + 4 * MIN] == pytest.approx(170.0, rel=1e-12)


def test_implicit_window_widening(spark):
    """rate(m) without [d] widens the window to the per-series
    maxPrevInterval so coarse scrapes still produce points at a fine
    step (rollup.go:747-756)."""
    # 4m cadence, queried at 1m step: nominal window (=step 1m) would
    # see a sample only every 4th grid point
    pts = [(T0 + i * 4 * MIN, float(10 * i)) for i in range(22)]
    cfg = EvalConfig(
        start=T0 + 40 * MIN, end=T0 + 50 * MIN, step=1 * MIN
    )
    out = _vals(evaluate(spark, "rate(c)", _mk(spark, pts), cfg))
    # gaps 240s → tier >32s → mpi = 240000 + 30000 = 270s → window 4.5m
    # ⇒ every grid point's window holds ≥1 sample and the anchor is the
    # previous scrape → rate = 10 / 240s everywhere
    assert len(out) == 11
    for v in out.values():
        assert v == pytest.approx(10.0 / 240.0, rel=1e-12)


def test_irate_and_idelta_eligibility(spark):
    pts = [
        (T0 - 30 * MIN, 5.0),  # far-away prev
        (T0 + 1 * MIN, 50.0),
    ]
    cfg = EvalConfig(start=T0 + 2 * MIN, end=T0 + 2 * MIN, step=2 * MIN)
    samples = _mk(spark, pts)
    # instant → mpi = 2m; anchor T0-30m vs window start T0 → ineligible
    # irate n==1 ineligible → no point
    assert _vals(evaluate(spark, "irate(c[2m])", samples, cfg)) == {}
    # idelta n==1 ineligible → lastValue itself (assume prev was 0)
    out = _vals(evaluate(spark, "idelta(c[2m])", samples, cfg))
    assert out[T0 + 2 * MIN] == 50.0


def test_scrape_interval_estimate_quantile(spark):
    """The estimate is the 0.6-quantile of the last ≤20 gaps with VM's
    φ·(n−1) interpolation — mixed cadence picks the interpolated gap."""
    # 10 gaps of 1m then 10 gaps of 3m (most recent): sorted gaps have
    # q(0.6) = rank 0.6*19 = 11.4 → between the 12th (3m) and 13th (3m)
    # → 180s → mpi = 180000+22500 = 202.5s
    pts = []
    ts = T0 - 40 * MIN
    for i in range(10):
        pts.append((ts, float(i)))
        ts += 1 * MIN
    for j in range(11):
        pts.append((ts, float(100 + j)))
        ts += 3 * MIN
    last_ts = pts[-1][0]
    samples = _mk(spark, pts)
    # range query so the estimate path (not the instant shortcut) runs
    cfg = EvalConfig(start=last_ts, end=last_ts + 2 * MIN, step=2 * MIN)
    # empty window at last_ts+2m: window (last_ts+1m? no: (g-1m, g]) —
    # use window 1m: ghost 0 exists while anchor within 1m + 202.5s
    out = _vals(evaluate(spark, "rate(c[1m])", samples, cfg))
    # at g = last_ts: window (last_ts-1m, last_ts] holds the last sample,
    # anchor = previous (3m ago) — 3m > 1m + 202.5s? 180s < 262.5s ✓
    # eligible → rate = adjusted delta / span = 1/180s
    assert out[last_ts] == pytest.approx(1.0 / 180.0, rel=1e-12)
    # at g = last_ts+2m: empty window; anchor = last sample — but no
    # fetched sample exists after the window start (the series stopped)
    # → ineligible (rollup.go:781) → stale, no ghost 0
    assert last_ts + 2 * MIN not in out
