"""Go %g float formatting (gofmt.py) — pinned against
fmt.Sprintf("%g", v) outputs (strconv 'g', precision -1: shortest
round-trip digits, scientific iff decimal exponent < -4 or >= 6)."""

from __future__ import annotations

import math

import pytest

from victoriametrics_spark.gofmt import go_g

CASES = [
    (0.0, "0"),
    (-0.0, "-0"),
    (1.0, "1"),
    (120.0, "120"),
    (0.5, "0.5"),
    (100000.0, "100000"),
    (999999.5, "999999.5"),
    (1234567.0, "1.234567e+06"),
    (1e6, "1e+06"),
    (123456.7, "123456.7"),
    (0.0001, "0.0001"),
    (0.00001, "1e-05"),
    (1.2799358208e22, "1.2799358208e+22"),
    (-3.75, "-3.75"),
    (2e20, "2e+20"),
    (5e-7, "5e-07"),
    (1e100, "1e+100"),
    (1.7976931348623157e308, "1.7976931348623157e+308"),
    (float("nan"), "NaN"),
    (float("inf"), "+Inf"),
    (float("-inf"), "-Inf"),
    (0.123456789, "0.123456789"),
    (3.0, "3"),
    (250.0, "250"),
    (math.pi, "3.141592653589793"),
    (99999.9, "99999.9"),
    (5e-324, "5e-324"),  # min subnormal
    (123456789.123, "1.23456789123e+08"),
    (-1e-10, "-1e-10"),
    (7.0 / 3.0, "2.3333333333333335"),
]


@pytest.mark.parametrize("v,want", CASES, ids=[w for _, w in CASES])
def test_go_g(v, want):
    assert go_g(v) == want


def test_go_g_roundtrip():
    # shortest-repr property: parsing the output returns the input bits
    for v, _ in CASES:
        if math.isnan(v):
            continue
        if abs(v) < 1e6 or math.isinf(v):
            continue
        assert float(go_g(v)) == v
