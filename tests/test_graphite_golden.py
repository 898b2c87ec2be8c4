"""Frozen graphite render golden corpus — machine-ported from
the reference's TestExecExprSuccess (app/vmselect/graphite/eval_test.go)
by scripts/port_graphite_golden.py — ALL 246 non-empty success blocks, replayed through render() on the
reference evalConfig (start=120e3, end=210e3, storageStep=30e3).

Comparison: exact series-name set, exact timestamps, values to 1e-9
relative (reference NaN == engine NULL). Tags are not modeled
separately (the engine carries graphite tags inline in names).

Round-13 closure: case 20 aggregateLine(...,"multiply") was never a
fold-order delta — the product is bit-exact; JDK 17's
Double.toString is not shortest-round-trip (JDK-4511638), so the
%g-formatted NAME carried 1.2799358207999999e+22.  gofmt.go_g now
formats names with Go's exact shortest-%g rules; 246/246 run.
"""

from __future__ import annotations

import json
import math
import os

import pytest

from victoriametrics_spark.graphite import render

# graphite golden sweep: slow tier — excluded from the default (driver-window) run;
# opt in with `pytest -m slow` (see pytest.ini)
pytestmark = pytest.mark.slow


S, E, ST = 120000, 210000, 30000

CASES = json.load(
    open(os.path.join(os.path.dirname(__file__), "graphite_golden_cases.json"))
)



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
