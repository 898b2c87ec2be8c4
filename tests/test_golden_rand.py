"""Golden corpus — the Go-rand-dependent subtests of the reference's
TestExecSuccess (app/vmselect/promql/exec_test.go), extracted verbatim by
scripts/extract_rand_goldens.py into rand_golden_cases.json.

Excluded from the golden suites until round 13: they require Go's exact
seeded math/rand bit stream.  engine/gorand.py now reproduces it
(rngSource lagged-Fibonacci + rngCooked jump-ahead reconstruction +
ziggurat normal/exponential), so all 42 cases run un-skipped — covering
rand/rand_normal/rand_exponential through subqueries, histogram_over_time,
share/count/sum_*_over_time, zscore, hoeffding bounds, aggr_over_time and
rollup_candlestick.
"""

from __future__ import annotations

import json
import os

import pytest

from victoriametrics_spark import evaluate
from victoriametrics_spark.schema import SAMPLE_SCHEMA

from tests.test_golden import CFG, TSS, _norm_result

# Go-rand parity sweep: slow tier — excluded from the default (driver-window) run;
# opt in with `pytest -m slow` (see pytest.ini)
pytestmark = pytest.mark.slow


_CASES_PATH = os.path.join(os.path.dirname(__file__), "rand_golden_cases.json")
with open(_CASES_PATH) as f:
    CASES = json.load(f)


@pytest.fixture(scope="module")
def empty_samples(spark):
    return spark.createDataFrame([], SAMPLE_SCHEMA)


def _norm_expected(expected):
    out: dict[tuple, dict[int, float]] = {}
    for name, labels, values in expected:
        key = (name, tuple(sorted(labels.items())))
        vals = {ts: v for ts, v in zip(TSS, values) if v is not None}
        if vals:  # all-NaN series are absent in the row model
            out[key] = vals
    return out


@pytest.mark.parametrize(
    "case", CASES, ids=[c["q"].replace("\n", " ")[:60] for c in CASES]
)
def test_golden_rand(spark, empty_samples, case):
    got = _norm_result(evaluate(spark, case["q"], empty_samples, CFG))
    want = _norm_expected(case["expected"])
    assert set(got) == set(want), (
        f"series sets differ: {set(got)} vs {set(want)}"
    )
    for key in want:
        gv, wv = got[key], want[key]
        assert set(gv) == set(wv), (
            f"{key}: point sets {sorted(gv)} vs {sorted(wv)}"
        )
        for ts in wv:
            assert gv[ts] == pytest.approx(wv[ts], rel=1e-10, abs=1e-10), (
                f"{key} @ {ts}: {gv[ts]} != {wv[ts]}"
            )
