"""Verify a candidate rngCooked table against the rand streams pinned by
the reference tests (app/vmselect/promql/exec_test.go)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def _round_to(v: float, nearest: float) -> float:
    # VM round(v, nearest): transform.go transformRound — including the
    # trunc(v*p10)/p10 float artifacts (0.29*100 -> 28.999... -> 0.28)
    import math

    e = round(math.log10(nearest))  # decimal.FromFloat exponent (n = 10^e)
    p10 = 10.0 ** (-e)
    v += 0.5 * math.copysign(nearest, v)
    v -= math.fmod(v, nearest)
    v = math.trunc(v * p10)
    return v / p10


def verify(cooked) -> None:
    from victoriametrics_spark.engine.gorand import GoRand

    r = GoRand(0, cooked=cooked)
    got = [_round_to(r.float64(), 0.01) for _ in range(6)]
    want = [0.95, 0.24, 0.66, 0.05, 0.37, 0.28]
    assert all(abs(a - b) < 1e-9 for a, b in zip(got, want)), (
        f"rand(0) mismatch: {got} != {want}"
    )

    r = GoRand(0, cooked=cooked)
    got = [_round_to(r.norm_float64(), 0.01) for _ in range(6)]
    want = [-0.28, 0.57, -1.69, 0.2, 1.92, 0.9]
    assert all(abs(a - b) < 1e-9 for a, b in zip(got, want)), (
        f"rand_normal(0) mismatch: {got} != {want}"
    )

    r = GoRand(0, cooked=cooked)
    got = [_round_to(r.exp_float64(), 0.01) for _ in range(6)]
    want = [4.67, 0.16, 3.05, 0.06, 1.86, 0.78]
    assert all(abs(a - b) < 1e-9 for a, b in zip(got, want)), (
        f"rand_exponential(0) mismatch: {got} != {want}"
    )

    # bitmap_and(round(rand(1) > 0.5, 1), 1) = [1 1 1 NaN NaN 1]
    r = GoRand(1, cooked=cooked)
    got = [r.float64() > 0.5 for _ in range(6)]
    want = [True, True, True, False, False, True]
    assert got == want, f"rand(1)>0.5 mismatch: {got} != {want}"
    print("all reference-pinned rand streams verified")
